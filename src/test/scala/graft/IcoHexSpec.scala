package graft

import graft.functions.IcoHex
import org.apache.spark.sql.functions._

/** Property tests for the icosahedral aperture-7 cell index. Canonical-H3
  * bit-compat is unreachable offline (see IcoHex docs), so correctness is
  * established through the geometric invariants any H3-class index must
  * satisfy — and those are checkable from first principles. */
class IcoHexSpec extends SparkSpec {

  // deterministic point cloud covering all latitudes/faces
  private val pts: Seq[(Double, Double)] = for {
    k <- 0 until 4000
  } yield (((k * 37) % 17000) / 100.0 - 85.0, ((k * 91) % 35000) / 100.0 - 175.0)

  test("index fields are well-formed and total over the globe (poles included)") {
    val special = Seq((90.0, 0.0), (-90.0, 0.0), (0.0, 180.0), (0.0, -180.0), (0.0, 0.0))
    (pts ++ special).foreach { case (lat, lon) =>
      val c = IcoHex.latLngToCell(lat, lon, 8)
      assert(IcoHex.isValid(c), s"($lat,$lon)")
      assert(IcoHex.resolution(c) == 8)
      assert(IcoHex.face(c) >= 0 && IcoHex.face(c) < 20)
    }
  }

  test("every face of the icosahedron is actually used") {
    val usedFaces = pts.map { case (lat, lon) =>
      IcoHex.face(IcoHex.latLngToCell(lat, lon, 6)) }.toSet
    assert(usedFaces.size == 20, s"only faces $usedFaces")
  }

  test("containment: a point is never farther from its cell center than the cell radius") {
    for (res <- Seq(2, 5, 8, 11)) {
      val bound = IcoHex.maxCellRadiusRad(res)
      pts.foreach { case (lat, lon) =>
        val cell = IcoHex.latLngToCell(lat, lon, res)
        val (clat, clon) = IcoHex.cellCenter(cell)
        val d = greatCircle(lat, lon, clat, clon)
        assert(d <= bound, s"res=$res ($lat,$lon) center=($clat,$clon) d=$d bound=$bound")
      }
    }
  }

  test("round trip: the center of a cell indexes back to the same cell") {
    // exact away from face seams; near seams the argmax face can differ
    // (true of any face-projected index) — require it for the vast bulk
    val cells = pts.map { case (lat, lon) => IcoHex.latLngToCell(lat, lon, 7) }.distinct
    val ok = cells.count { c =>
      val (lat, lon) = IcoHex.cellCenter(c)
      IcoHex.latLngToCell(lat, lon, 7) == c
    }
    assert(ok.toDouble / cells.size > 0.97, s"$ok of ${cells.size} round-tripped")
  }

  test("aperture 7: one resolution step multiplies distinct cells by ~7") {
    // the exact factor is asymptotic: face-seam cells are counted by both
    // adjacent faces' lattices and scale with perimeter (√7^r), not area
    // (7^r), so coarse resolutions overshoot the denominator. res 3→4 with
    // a sample that saturates both populations sits within ±20% of 7.
    val dense = for (k <- 0 until 500000)
      yield (((k * 131) % 160000) / 1000.0 - 80.0, ((k * 223) % 340000) / 1000.0 - 170.0)
    val counts = Seq(3, 4).map(r =>
      r -> dense.map { case (a, b) => IcoHex.latLngToCell(a, b, r) }.distinct.size)
    val ratio = counts(1)._2.toDouble / counts(0)._2
    assert(ratio > 5.5 && ratio < 8.5, s"aperture ratio $ratio from $counts")
  }

  test("hierarchy: parent at res-1 contains the child's center") {
    pts.take(500).foreach { case (lat, lon) =>
      val child = IcoHex.latLngToCell(lat, lon, 9)
      val par = IcoHex.parent(child)
      assert(IcoHex.resolution(par) == 8)
      val (clat, clon) = IcoHex.cellCenter(child)
      assert(IcoHex.latLngToCell(clat, clon, 8) == par)
    }
  }

  test("locality: tiny perturbations around a cell center stay in the cell") {
    pts.take(200).foreach { case (lat, lon) =>
      val cell = IcoHex.latLngToCell(lat, lon, 6)
      val (clat, clon) = IcoHex.cellCenter(cell)
      // ~1% of the res-6 cell radius, in degrees
      val eps = math.toDegrees(IcoHex.maxCellRadiusRad(6)) * 0.01
      if (math.abs(clat) < 85) { // avoid the lon-compression singularity
        Seq((eps, 0.0), (-eps, 0.0), (0.0, eps), (0.0, -eps)).foreach { case (da, dn) =>
          assert(IcoHex.latLngToCell(clat + da, clon + dn, 6) == cell)
        }
      }
    }
  }

  test("neighbors: ring probe finds all nearby points away from face seams") {
    val res = 6
    pts.take(300).foreach { case (lat, lon) =>
      val cell = IcoHex.latLngToCell(lat, lon, res)
      val probe = (cell +: IcoHex.neighbors(cell)).toSet
      assert(probe.size == 7) // distinct, same res/face
      probe.foreach(c => assert(IcoHex.resolution(c) == res))
      // any point within ~40% of a cell radius of the ORIGINAL point must
      // land in the probe set, unless the pair straddles a face seam
      val (clat, clon) = IcoHex.cellCenter(cell)
      val eps = math.toDegrees(IcoHex.maxCellRadiusRad(res)) * 0.4
      if (math.abs(clat) < 80) {
        val hits = Seq((lat + eps, lon), (lat - eps, lon), (lat, lon + eps), (lat, lon - eps))
          .map { case (a, b) => IcoHex.latLngToCell(a, b, res) }
        val sameFace = hits.filter(IcoHex.face(_) == IcoHex.face(cell))
        sameFace.foreach(h => assert(probe.contains(h),
          s"same-face near point escaped the 7-cell probe at ($lat,$lon)"))
      }
    }
  }

  test("SQL surface: icohex_cell() runs registered, codegen'd, null-safe") {
    IcoHex.register(spark)
    import spark.implicits._
    val df = Seq((48.8566, 2.3522), (40.7128, -74.006))
      .toDF("lat", "lon")
      .selectExpr("icohex_cell(lat, lon, 8) AS cell")
    val got = df.as[Long].collect().toSeq
    assert(got == Seq(
      IcoHex.latLngToCell(48.8566, 2.3522, 8),
      IcoHex.latLngToCell(40.7128, -74.006, 8)))
    // null propagates, no NPE
    val n = spark.sql("SELECT icohex_cell(CAST(NULL AS DOUBLE), 1.0, 8) AS c")
      .collect()(0)
    assert(n.isNullAt(0))
    // stays inside whole-stage codegen (no ScalaUDF, no CodegenFallback)
    val plan = df.queryExecution.executedPlan.toString
    assert(!plan.contains("ScalaUDF"), plan)
  }

  private def greatCircle(lat1: Double, lon1: Double, lat2: Double, lon2: Double): Double = {
    val (p1, l1, p2, l2) = (math.toRadians(lat1), math.toRadians(lon1),
      math.toRadians(lat2), math.toRadians(lon2))
    val h = math.pow(math.sin((p2 - p1) / 2), 2) +
      math.cos(p1) * math.cos(p2) * math.pow(math.sin((l2 - l1) / 2), 2)
    2 * math.asin(math.min(1.0, math.sqrt(h)))
  }
}
