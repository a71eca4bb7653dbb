package graft.functions

/** Icosahedral aperture-7 hexagonal cell index — the same geometry class
  * as H3 (gnomonic projection onto an icosahedron face, hexagonal lattice
  * rounding, √7 refinement with the aperture-7 lattice rotation), built
  * from first principles.
  *
  * WHY NOT BIT-COMPATIBLE H3 (reference:
  * /root/reference/pipelines/gold_pipeline.py:47,75-84 uses the `h3` pip
  * package): canonical H3 cell IDs additionally depend on (a) the
  * Dymaxion-style orientation of the icosahedron relative to Earth chosen
  * so vertices fall in oceans, and (b) the 122-base-cell numbering and
  * face-rotation lookup tables. Those constants are published data, not
  * derivable math — and this environment has no network egress and no
  * vendored copy, so a from-memory reproduction could not be verified
  * against a single authoritative test vector. An unverifiable pseudo-H3
  * would be strictly worse than an honest sibling: every structural
  * property downstream code uses (fixed 64-bit key, resolution field,
  * equal-area-ish hex cells, ~7× refinement per resolution, locality)
  * holds here and is property-tested in IcoHexSpec; only the cell
  * *numbering* differs from canonical H3.
  *
  * Geometry, all derived:
  *  - icosahedron vertices = normalized cyclic permutations of
  *    (0, ±1, ±φ); the 20 faces are recovered as the vertex triples at
  *    mutual edge distance (no face table).
  *  - face of a point = argmax dot product with the 20 face centers
  *    (ties broken by face index ⇒ total function).
  *  - gnomonic projection onto the tangent plane at the face center, in a
  *    deterministic orthonormal basis (first face vertex defines e1).
  *  - aperture-7: resolution r scales the lattice by √7^r and rotates it
  *    by r·arctan(√3/5) — the angle of the index-7 hex sublattice
  *    generator (2,1), exactly H3's Class II/III alternation folded into
  *    a cumulative rotation.
  *  - hex rounding = standard cube-coordinate rounding.
  *
  * Index layout (64-bit, always positive):
  *   bit 59 = mode (1, mirroring H3's cell mode bit)
  *   bits 52-55 = resolution (0..12)
  *   bits 40-44 = face (0..19)
  *   bits 20-39 = i + 2^19 (axial q, offset-binary)
  *   bits  0-19 = j + 2^19 (axial r, offset-binary)
  * Res ≤ 12 keeps |i|,|j| < 2^19 (max lattice coord ≈ 1.16·√7^res).
  */
object IcoHex {

  final val MaxRes = 12

  // ---------------------------------------------------------- icosahedron
  private val phi = (1.0 + math.sqrt(5.0)) / 2.0

  /** 12 unit vertices: cyclic permutations of (0, ±1, ±φ). */
  private val vertices: Array[Array[Double]] = {
    val raw = for {
      s1 <- Seq(-1.0, 1.0); s2 <- Seq(-1.0, 1.0)
      perm <- Seq(
        Array(0.0, s1 * 1.0, s2 * phi),
        Array(s1 * 1.0, s2 * phi, 0.0),
        Array(s2 * phi, 0.0, s1 * 1.0))
    } yield perm
    val n = math.sqrt(1.0 + phi * phi)
    raw.distinct.map(v => v.map(_ / n)).toArray
  }

  /** 20 faces: vertex triples at mutual (minimal) edge distance,
    * discovered rather than tabulated. */
  private val faces: Array[Array[Int]] = {
    def d2(a: Array[Double], b: Array[Double]) =
      (0 to 2).map(k => (a(k) - b(k)) * (a(k) - b(k))).sum
    val n = vertices.length
    val edge = (for (i <- 0 until n; j <- i + 1 until n) yield d2(vertices(i), vertices(j))).min
    val eps = 1e-9
    (for {
      i <- 0 until n; j <- i + 1 until n; k <- j + 1 until n
      if math.abs(d2(vertices(i), vertices(j)) - edge) < eps
      if math.abs(d2(vertices(j), vertices(k)) - edge) < eps
      if math.abs(d2(vertices(i), vertices(k)) - edge) < eps
    } yield Array(i, j, k)).toArray
  }
  require(faces.length == 20, s"icosahedron construction: ${faces.length} faces")

  private def normalize(v: Array[Double]): Array[Double] = {
    val n = math.sqrt(v(0) * v(0) + v(1) * v(1) + v(2) * v(2))
    Array(v(0) / n, v(1) / n, v(2) / n)
  }
  private def dot(a: Array[Double], b: Array[Double]) =
    a(0) * b(0) + a(1) * b(1) + a(2) * b(2)
  private def cross(a: Array[Double], b: Array[Double]) = Array(
    a(1) * b(2) - a(2) * b(1), a(2) * b(0) - a(0) * b(2), a(0) * b(1) - a(1) * b(0))

  private val faceCenter: Array[Array[Double]] = faces.map { f =>
    normalize(Array(
      vertices(f(0))(0) + vertices(f(1))(0) + vertices(f(2))(0),
      vertices(f(0))(1) + vertices(f(1))(1) + vertices(f(2))(1),
      vertices(f(0))(2) + vertices(f(1))(2) + vertices(f(2))(2)))
  }

  /** Tangent-plane basis per face: e1 toward the face's first vertex. */
  private val faceE1: Array[Array[Double]] = faces.zipWithIndex.map { case (f, fi) =>
    val c = faceCenter(fi)
    val v = vertices(f(0))
    val d = dot(v, c)
    normalize(Array(v(0) - d * c(0), v(1) - d * c(1), v(2) - d * c(2)))
  }
  private val faceE2: Array[Array[Double]] =
    faceCenter.zip(faceE1).map { case (c, e1) => cross(c, e1) }

  // gnomonic circumradius of a face (center→vertex in the tangent plane)
  private val faceR: Double = {
    val c = faceCenter(0); val v = vertices(faces(0)(0))
    math.tan(math.acos(math.min(1.0, dot(c, v))))
  }

  /** Aperture-7 sublattice rotation: angle of hex-lattice vector (2,1). */
  private val alpha = math.atan(math.sqrt(3.0) / 5.0)
  private val sqrt7 = math.sqrt(7.0)

  // ------------------------------------------------------------- encoding

  private def toXyz(latDeg: Double, lonDeg: Double): Array[Double] = {
    val lat = math.toRadians(latDeg); val lon = math.toRadians(lonDeg)
    Array(math.cos(lat) * math.cos(lon), math.cos(lat) * math.sin(lon), math.sin(lat))
  }

  private def bestFace(p: Array[Double]): Int = {
    var best = 0; var bestDot = dot(p, faceCenter(0))
    var f = 1
    while (f < 20) {
      val d = dot(p, faceCenter(f))
      if (d > bestDot) { best = f; bestDot = d }
      f += 1
    }
    best
  }

  /** Cube-round fractional axial (q, r) to the containing hex. */
  private def hexRound(q: Double, r: Double): (Long, Long) = {
    val x = q; val z = r; val y = -x - z
    var rx = math.round(x).toDouble; var ry = math.round(y).toDouble; var rz = math.round(z).toDouble
    val dx = math.abs(rx - x); val dy = math.abs(ry - y); val dz = math.abs(rz - z)
    if (dx > dy && dx > dz) rx = -ry - rz
    else if (dy > dz) ry = -rx - rz
    else rz = -rx - ry
    (rx.toLong, rz.toLong)
  }

  /** lat/lon (degrees) → cell index at `res`. Total and deterministic. */
  def latLngToCell(latDeg: Double, lonDeg: Double, res: Int): Long = {
    require(res >= 0 && res <= MaxRes, s"res must be in [0,$MaxRes], got $res")
    val p = toXyz(latDeg, lonDeg)
    val f = bestFace(p)
    val c = faceCenter(f)
    val t = dot(p, c) // > cos(~37°) by construction of argmax
    // gnomonic: scale the point to the tangent plane, coordinates in (e1,e2)
    val gx = (p(0) / t - c(0)) * 1.0
    val gy = (p(1) / t - c(1)) * 1.0
    val gz = (p(2) / t - c(2)) * 1.0
    val g = Array(gx, gy, gz)
    var x = dot(g, faceE1(f))
    var y = dot(g, faceE2(f))
    // fold the per-resolution aperture-7 rotation into the frame
    val rot = res * alpha
    val cs = math.cos(rot); val sn = math.sin(rot)
    val xr = x * cs + y * sn
    val yr = -x * sn + y * cs
    x = xr; y = yr
    // pointy-top axial coordinates; res-0 cell size = face circumradius
    val size = faceR / math.pow(sqrt7, res)
    val qf = (math.sqrt(3.0) / 3.0 * x - y / 3.0) / size
    val rf = (2.0 / 3.0 * y) / size
    val (i, j) = hexRound(qf, rf)
    pack(res, f, i, j)
  }

  private final val Off = 1L << 19
  private def pack(res: Int, face: Int, i: Long, j: Long): Long = {
    require(i > -Off && i < Off && j > -Off && j < Off,
      s"lattice coordinate out of range at res=$res: ($i,$j)")
    (1L << 59) | (res.toLong << 52) | (face.toLong << 40) |
      ((i + Off) << 20) | (j + Off)
  }

  def resolution(cell: Long): Int = ((cell >> 52) & 0xF).toInt
  def face(cell: Long): Int = ((cell >> 40) & 0x1F).toInt
  def ij(cell: Long): (Long, Long) =
    (((cell >> 20) & 0xFFFFF) - Off, (cell & 0xFFFFF) - Off)
  def isValid(cell: Long): Boolean =
    ((cell >> 59) & 1) == 1 && resolution(cell) <= MaxRes && face(cell) < 20

  /** Cell center, inverse of [[latLngToCell]] up to hex rounding:
    * (lat, lon) in degrees. */
  def cellCenter(cell: Long): (Double, Double) = {
    val res = resolution(cell); val f = face(cell); val (i, j) = ij(cell)
    val size = faceR / math.pow(sqrt7, res)
    // axial → planar (pointy-top), then undo the aperture rotation
    val x0 = size * math.sqrt(3.0) * (i + j / 2.0)
    val y0 = size * 1.5 * j
    val rot = res * alpha
    val cs = math.cos(rot); val sn = math.sin(rot)
    val x = x0 * cs - y0 * sn
    val y = x0 * sn + y0 * cs
    val c = faceCenter(f); val e1 = faceE1(f); val e2 = faceE2(f)
    val p = normalize(Array(
      c(0) + x * e1(0) + y * e2(0),
      c(1) + x * e1(1) + y * e2(1),
      c(2) + x * e1(2) + y * e2(2)))
    (math.toDegrees(math.asin(math.max(-1.0, math.min(1.0, p(2))))),
      math.toDegrees(math.atan2(p(1), p(0))))
  }

  /** Parent cell: the cell at `res-1` containing this cell's center
    * (aperture-7 children straddle parents, exactly like real H3). */
  def parent(cell: Long): Long = {
    val res = resolution(cell)
    require(res > 0, "res-0 cell has no parent")
    val (lat, lon) = cellCenter(cell)
    latLngToCell(lat, lon, res - 1)
  }

  /** Great-circle upper bound on center→point distance (radians) at a
    * resolution: the res-0 circumradius shrinks by √7 per level; the
    * gnomonic distortion toward face edges is bounded by 1/cos²(37.4°)
    * ≈ 1.6, folded into the constant. */
  def maxCellRadiusRad(res: Int): Double =
    1.6 * math.atan(faceR) / math.pow(sqrt7, res)

  /** The six adjacent cells in the same face lattice — the probe set for
    * cell+ring spatial joins ("candidates within ~one cell radius" =
    * join on cell ∈ {self} ∪ neighbors, then exact-distance filter).
    * Seam caveat, documented: across an icosahedron edge the adjacent
    * area belongs to the OTHER face's lattice, so ring probes have
    * face-boundary misses (~perimeter/area of a face, shrinking √7× per
    * resolution) — the standard trade of any face-projected index
    * without cross-face unfolding tables. */
  def neighbors(cell: Long): Seq[Long] = {
    val res = resolution(cell); val f = face(cell); val (i, j) = ij(cell)
    Seq((i + 1, j), (i - 1, j), (i, j + 1), (i, j - 1), (i + 1, j - 1), (i - 1, j + 1))
      .map { case (ni, nj) => pack(res, f, ni, nj) }
  }

  val functionName = "icohex_cell"

  import org.apache.spark.sql.catalyst.FunctionIdentifier
  import org.apache.spark.sql.catalyst.expressions.{Cast, Expression, ExpressionInfo}
  import org.apache.spark.sql.types.{DoubleType, IntegerType}

  private def builder(children: Seq[Expression]): Expression = {
    require(children.size == 3, s"$functionName expects (lat, lon, res)")
    IcoHexCell(Cast(children(0), DoubleType), Cast(children(1), DoubleType),
      Cast(children(2), IntegerType))
  }

  /** Register on an existing session (tests, notebooks). */
  def register(spark: org.apache.spark.sql.SparkSession): Unit =
    spark.sessionState.functionRegistry.registerFunction(
      FunctionIdentifier(functionName),
      new ExpressionInfo(classOf[IcoHexCell].getName, functionName),
      builder(_))

  /** For `spark.sql.extensions`-based deployment. */
  def inject(ext: org.apache.spark.sql.SparkSessionExtensions): Unit =
    ext.injectFunction((FunctionIdentifier(functionName),
      new ExpressionInfo(classOf[IcoHexCell].getName, functionName),
      builder))
}

/** Native codegen expression `icohex_cell(lat, lon, res)` → BIGINT cell —
  * same tier as [[GeohashEncode]]: a single static call per row inside
  * whole-stage codegen, no UDF black-box. */
case class IcoHexCell(
    first: org.apache.spark.sql.catalyst.expressions.Expression,
    second: org.apache.spark.sql.catalyst.expressions.Expression,
    third: org.apache.spark.sql.catalyst.expressions.Expression)
    extends org.apache.spark.sql.catalyst.expressions.TernaryExpression {
  import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
  import org.apache.spark.sql.catalyst.expressions.Expression
  import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
  import org.apache.spark.sql.types.{DataType, DoubleType, IntegerType, LongType}

  override def checkInputDataTypes(): TypeCheckResult = {
    val expected = Seq(DoubleType, DoubleType, IntegerType)
    val actual = children.map(_.dataType)
    if (actual == expected) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"$prettyName expects (DOUBLE, DOUBLE, INT), got ${actual.mkString(", ")}")
  }
  override def dataType: DataType = LongType
  override def prettyName: String = IcoHex.functionName

  override def nullSafeEval(lat: Any, lon: Any, res: Any): Any =
    IcoHex.latLngToCell(lat.asInstanceOf[Double], lon.asInstanceOf[Double],
      res.asInstanceOf[Int])

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (lat, lon, r) =>
      s"graft.functions.IcoHex.latLngToCell($lat, $lon, $r)")

  override protected def withNewChildrenInternal(
      newFirst: Expression, newSecond: Expression, newThird: Expression): Expression =
    copy(first = newFirst, second = newSecond, third = newThird)
}
