package graft.sources

import org.apache.spark.sql.Column
import org.apache.spark.sql.GraftSqlShim
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Iceberg hidden partitioning: the spec's partition transforms
  * (identity, bucket[N], truncate[W], year/month/day/hour) as Spark
  * column expressions, plus the predicate→partition mapping that lets a
  * scan prune data files from manifest partition tuples WITHOUT reading
  * them — the feature that makes a 100 TB Iceberg table queryable (a
  * time-range query touches only its day partitions, a key lookup only
  * its bucket).
  *
  * Reference behavior: the reference pipelines partition their largest
  * tables by ingest date and bucket hot keys; this reproduces the same
  * capability on the PUBLIC Iceberg table spec (v1/v2, "Partitioning"
  * and Appendix B "32-bit Hash Requirements").
  *
  * The bucket hash is the spec's murmur3_x86_32 (seed 0) over the
  * value's canonical byte form: int/long/date/timestamp hash the
  * little-endian 8-byte long, strings their UTF-8 bytes — so buckets
  * agree with any conforming Iceberg writer and `bucket(v) = bucket(34)`
  * prunes files written by foreign engines too.
  */
object IcebergPartition {

  // ------------------------------------------------------------- murmur3

  /** murmur3_x86_32, seed 0 — the spec's required hash. Pure function,
    * public algorithm (Appleby, public domain). */
  def murmur3(data: Array[Byte]): Int = {
    val c1 = 0xcc9e2d51
    val c2 = 0x1b873593
    var h = 0 // seed
    val tail = data.length - (data.length % 4)
    var i = 0
    while (i < tail) {
      var k = (data(i) & 0xff) | ((data(i + 1) & 0xff) << 8) |
        ((data(i + 2) & 0xff) << 16) | ((data(i + 3) & 0xff) << 24)
      k *= c1; k = Integer.rotateLeft(k, 15); k *= c2
      h ^= k; h = Integer.rotateLeft(h, 13); h = h * 5 + 0xe6546b64
      i += 4
    }
    var k = 0
    (data.length % 4) match {
      case 3 =>
        k ^= (data(tail + 2) & 0xff) << 16
        k ^= (data(tail + 1) & 0xff) << 8
        k ^= data(tail) & 0xff
      case 2 =>
        k ^= (data(tail + 1) & 0xff) << 8
        k ^= data(tail) & 0xff
      case 1 =>
        k ^= data(tail) & 0xff
      case _ =>
    }
    if (data.length % 4 != 0) {
      k *= c1; k = Integer.rotateLeft(k, 15); k *= c2; h ^= k
    }
    h ^= data.length
    h ^= h >>> 16; h *= 0x85ebca6b
    h ^= h >>> 13; h *= 0xc2b2ae35
    h ^= h >>> 16
    h
  }

  /** Spec: int, long, date, time, timestamp all hash as the
    * little-endian 8-byte long (so `bucket(34: int) = bucket(34L)`). */
  def hashLong(v: Long): Int = {
    val b = new Array[Byte](8)
    var i = 0
    while (i < 8) { b(i) = ((v >>> (8 * i)) & 0xff).toByte; i += 1 }
    murmur3(b)
  }

  def hashUtf8(v: UTF8String): Int = murmur3(v.getBytes)

  /** `(hash & Int.MaxValue) % n` — the spec's bucket index. */
  def bucketOf(hash: Int, n: Int): Int = (hash & Integer.MAX_VALUE) % n

  // ----------------------------------------------------------- transforms

  sealed trait Transform { def name: String }
  case object Identity extends Transform { val name = "identity" }
  final case class Bucket(n: Int) extends Transform { def name = s"bucket[$n]" }
  final case class Truncate(w: Int) extends Transform { def name = s"truncate[$w]" }
  case object Year extends Transform { val name = "year" }
  case object Month extends Transform { val name = "month" }
  case object Day extends Transform { val name = "day" }
  case object Hour extends Transform { val name = "hour" }

  private val BucketRe = """bucket\[(\d+)\]""".r
  private val TruncRe = """truncate\[(\d+)\]""".r

  def parseTransform(s: String): Transform = s.trim match {
    case "identity" => Identity
    case BucketRe(n) => Bucket(n.toInt)
    case TruncRe(w) => Truncate(w.toInt)
    case "year" => Year
    case "month" => Month
    case "day" => Day
    case "hour" => Hour
    case other => sys.error(s"unsupported Iceberg partition transform: $other")
  }

  /** One spec field: transform over a named source column. The partition
    * field name follows Iceberg's convention (`src_bucket`, `src_day`,
    * plain `src` for identity). */
  final case class Field(source: String, transform: Transform) {
    def name: String = transform match {
      case Identity => source
      case Bucket(_) => s"${source}_bucket"
      case Truncate(_) => s"${source}_trunc"
      case t => s"${source}_${t.name}"
    }
  }

  private def isTime(dt: DataType): Boolean =
    dt == TimestampType || dt == TimestampNTZType
  private val MicrosPerHour = 3600L * 1000 * 1000

  /** Result type of a transform applied to `src` (what the manifest
    * partition tuple stores). */
  def resultType(t: Transform, src: DataType): DataType = t match {
    case Identity => src match {
      case IntegerType | LongType | StringType => src
      case other => sys.error(
        s"identity partitioning supports int/long/string, got $other")
    }
    case Bucket(_) =>
      require(src == IntegerType || src == LongType || src == StringType ||
        src == DateType || isTime(src),
        s"bucket transform unsupported on $src")
      IntegerType
    case Truncate(_) => src match {
      case IntegerType | LongType | StringType => src
      case other => sys.error(s"truncate transform unsupported on $other")
    }
    case Year | Month | Day | Hour =>
      require(src == DateType || isTime(src),
        s"${t.name} transform needs a date/timestamp source, got $src")
      require(!(t == Hour && src == DateType), "hour transform needs a timestamp")
      IntegerType
  }

  /** The transform as a Spark column over the source column — evaluated
    * DISTRIBUTED on the write path (and on literals during pruning). */
  def column(t: Transform, src: Column, srcType: DataType): Column = t match {
    case Identity => src
    case Bucket(n) =>
      val hash = GraftSqlShim.column(
        IcebergBucketHash(GraftSqlShim.expression(src)))
      (hash.bitwiseAND(lit(Integer.MAX_VALUE)) % n).cast("int")
    case Truncate(w) => srcType match {
      // floor-mod truncation: works for negatives (spec: -1 trunc 10 = -10)
      case IntegerType | LongType => src - pmod(src, lit(w))
      case StringType => substring(src, 1, w)
      case other => sys.error(s"truncate on $other")
    }
    case Year => (year(src) - 1970).cast("int")
    case Month => ((year(src) - 1970) * 12 + month(src) - 1).cast("int")
    case Day =>
      datediff(src.cast("date"), to_date(lit("1970-01-01"))).cast("int")
    case Hour =>
      // NTZ casts value-preserving under the engine's UTC session
      val us = unix_micros(src.cast("timestamp"))
      ((us - pmod(us, lit(MicrosPerHour))) / MicrosPerHour).cast("int")
  }

  /** Transform applied to one LITERAL source value on the driver (for
    * predicate mapping). `v` is the external Scala value. */
  def applyLiteral(t: Transform, v: Any, srcType: DataType): Any = t match {
    case Identity => v
    case Bucket(n) =>
      val h = (v, srcType) match {
        case (i: Int, _) => hashLong(i.toLong)
        case (l: Long, _) => hashLong(l)
        case (s: String, _) => murmur3(s.getBytes("UTF-8"))
        case (d: java.sql.Date, _) => hashLong(d.toLocalDate.toEpochDay)
        case (d: java.time.LocalDate, _) => hashLong(d.toEpochDay)
        case (i: java.time.Instant, _) =>
          hashLong(i.getEpochSecond * 1000000L + i.getNano / 1000)
        case (ts: java.sql.Timestamp, _) =>
          val i = ts.toInstant
          hashLong(i.getEpochSecond * 1000000L + i.getNano / 1000)
        case (ldt: java.time.LocalDateTime, _) =>
          val i = ldt.toInstant(java.time.ZoneOffset.UTC)
          hashLong(i.getEpochSecond * 1000000L + i.getNano / 1000)
        case other => sys.error(s"bucket literal unsupported: $other")
      }
      bucketOf(h, n)
    case Truncate(w) => v match {
      case i: Int => i - java.lang.Math.floorMod(i, w)
      case l: Long => l - java.lang.Math.floorMod(l, w.toLong)
      case s: String => s.substring(0, math.min(w, s.length))
      case other => sys.error(s"truncate literal unsupported: $other")
    }
    case Year | Month | Day | Hour =>
      val ld: Either[java.time.LocalDate, java.time.Instant] = v match {
        case d: java.sql.Date => Left(d.toLocalDate)
        case d: java.time.LocalDate => Left(d)
        case ts: java.sql.Timestamp => Right(ts.toInstant)
        case i: java.time.Instant => Right(i)
        case ldt: java.time.LocalDateTime =>
          Right(ldt.toInstant(java.time.ZoneOffset.UTC))
        case other => sys.error(s"time-transform literal unsupported: $other")
      }
      val utc = ld.fold(identity,
        i => java.time.LocalDateTime.ofInstant(i, java.time.ZoneOffset.UTC).toLocalDate)
      t match {
        case Year => utc.getYear - 1970
        case Month => (utc.getYear - 1970) * 12 + utc.getMonthValue - 1
        case Day => utc.toEpochDay.toInt
        case Hour =>
          val i = ld.toOption.getOrElse(sys.error("hour needs a timestamp"))
          java.lang.Math.floorDiv(i.getEpochSecond, 3600L).toInt
      }
  }

  // ------------------------------------------------- predicate → pruning

  /** Comparison atoms the pruner understands, extracted from a predicate
    * over SOURCE columns. */
  sealed trait Atom { def source: String }
  final case class Eq(source: String, value: Any) extends Atom
  final case class InList(source: String, values: Seq[Any]) extends Atom
  final case class Cmp(source: String, op: String, value: Any) extends Atom // < <= > >=
  final case class NullCheck(source: String, isNull: Boolean) extends Atom

  /** Split a predicate into its handled atoms; anything unhandled is
    * simply not used for pruning (the residual filter still applies). */
  def atoms(pred: Expression): Seq[Atom] = {
    import org.apache.spark.sql.catalyst.expressions._
    def attr(e: Expression): Option[String] = e match {
      case a: Attribute => Some(a.name)
      case u: org.apache.spark.sql.catalyst.analysis.UnresolvedAttribute =>
        Some(u.name)
      case _ => None
    }
    def litVal(e: Expression): Option[Any] = e match {
      case Literal(v, dt) => Option(externalize(v, dt))
      // analysis-time type coercion wraps literals in casts (e.g. an int
      // literal against a long column); fold them here
      case c: Cast if c.child.isInstanceOf[Literal] && c.foldable =>
        Option(externalize(c.eval(null), c.dataType))
      case _ => None
    }
    def walk(e: Expression): Seq[Atom] = e match {
      case And(l, r) => walk(l) ++ walk(r)
      case EqualTo(a, v) => (attr(a), litVal(v)) match {
        case (Some(n), Some(x)) => Seq(Eq(n, x))
        case _ => (attr(v), litVal(a)) match {
          case (Some(n), Some(x)) => Seq(Eq(n, x))
          case _ => Seq.empty
        }
      }
      case In(a, vs) if vs.forall(_.isInstanceOf[Literal]) =>
        attr(a).toSeq.flatMap { n =>
          val ext = vs.flatMap(litVal)
          if (ext.size == vs.size) Seq(InList(n, ext)) else Seq.empty
        }
      case GreaterThan(a, v) => cmp(attr(a), litVal(v), ">") ++ cmp(attr(v), litVal(a), "<")
      case GreaterThanOrEqual(a, v) => cmp(attr(a), litVal(v), ">=") ++ cmp(attr(v), litVal(a), "<=")
      case LessThan(a, v) => cmp(attr(a), litVal(v), "<") ++ cmp(attr(v), litVal(a), ">")
      case LessThanOrEqual(a, v) => cmp(attr(a), litVal(v), "<=") ++ cmp(attr(v), litVal(a), ">=")
      case IsNull(a) => attr(a).toSeq.map(NullCheck(_, isNull = true))
      case IsNotNull(a) => attr(a).toSeq.map(NullCheck(_, isNull = false))
      case _ => Seq.empty
    }
    def cmp(n: Option[String], v: Option[Any], op: String): Seq[Atom] =
      (n, v) match {
        case (Some(name), Some(value)) => Seq(Cmp(name, op, value))
        case _ => Seq.empty
      }
    walk(pred)
  }

  /** Catalyst internal literal → external Scala value. */
  private def externalize(v: Any, dt: DataType): Any = (v, dt) match {
    case (null, _) => null
    case (u: UTF8String, StringType) => u.toString
    case (days: Int, DateType) => java.time.LocalDate.ofEpochDay(days.toLong)
    case (us: Long, TimestampType) =>
      java.time.Instant.ofEpochSecond(
        java.lang.Math.floorDiv(us, 1000000L),
        java.lang.Math.floorMod(us, 1000000L) * 1000)
    case (us: Long, TimestampNTZType) =>
      java.time.LocalDateTime.ofEpochSecond(
        java.lang.Math.floorDiv(us, 1000000L),
        (java.lang.Math.floorMod(us, 1000000L) * 1000).toInt,
        java.time.ZoneOffset.UTC)
    case (x, _) => x
  }

  /** Can the file with partition value `pv` (for `field`) possibly hold a
    * row satisfying `atom`? False ⇒ prune. `pv` is the manifest tuple
    * value (Int/Long/String as written); null pv means the source column
    * was null for every row in the file. */
  def mightMatch(field: Field, srcType: DataType, pv: Any, atom: Atom): Boolean = {
    if (atom.source != field.source) return true
    def tv(x: Any): Any = applyLiteral(field.transform, x, srcType)
    // None = incomparable: the caller keeps the file (never prunes blind)
    def cmpNum(a: Any, b: Any): Option[Int] = (a, b) match {
      case (x: Int, y: Int) => Some(java.lang.Integer.compare(x, y))
      case (x: Long, y: Long) => Some(java.lang.Long.compare(x, y))
      case (x: Int, y: Long) => Some(java.lang.Long.compare(x.toLong, y))
      case (x: Long, y: Int) => Some(java.lang.Long.compare(x, y.toLong))
      case (x: String, y: String) => Some(x.compareTo(y))
      case _ => None
    }
    (atom, field.transform) match {
      // every transform here null-propagates, so a null partition value
      // ⟺ the source column is null on EVERY row of the file
      case (NullCheck(_, true), _) => pv == null
      case (NullCheck(_, false), _) => pv != null
      case (Eq(_, null), _) => false // `= NULL` matches nothing
      case (Eq(_, v), _) =>
        if (pv == null) false else pv == norm(tv(v))
      case (InList(_, vs), _) =>
        if (pv == null) false
        else vs.filter(_ != null).map(x => norm(tv(x))).contains(pv)
      // ordered transforms: value order survives the transform, so a
      // range on the source maps to a (widened) range on the partition
      case (Cmp(_, op, v), Identity | Truncate(_) | Year | Month | Day | Hour) =>
        if (pv == null || v == null) false
        else {
          val t = norm(tv(v))
          op match {
            // v > X ⇒ partition ≥ transform(X) (the transform floors)
            case ">" | ">=" => cmpNum(pv, t).forall(_ >= 0)
            case "<" | "<=" => cmpNum(pv, t).forall(_ <= 0)
            case _ => true
          }
        }
      // bucket is not order-preserving: ranges cannot prune
      case (Cmp(_, _, _), Bucket(_)) => true
    }
  }

  /** Manifest tuples store int/long/string; align literal-side types. */
  private def norm(x: Any): Any = x match {
    case d: java.time.LocalDate => d // identity-date compares as LocalDate
    case other => other
  }
}

/** Native codegen expression: the Iceberg spec's murmur3_x86_32 single-value
  * hash (Appendix B) of the child. Sits on the write hot path — one static
  * call per row, no boxing beyond the byte scratch. */
case class IcebergBucketHash(child: Expression) extends UnaryExpression {
  import org.apache.spark.sql.types._

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case IntegerType | LongType | DateType | TimestampType | TimestampNTZType |
         StringType | BinaryType => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"$prettyName cannot hash type $t")
  }
  override def dataType: DataType = IntegerType
  override def prettyName: String = "iceberg_bucket_hash"

  private lazy val kind: Int = child.dataType match {
    case IntegerType | DateType => 0 // int-backed: widen to long
    case LongType | TimestampType | TimestampNTZType => 1
    case StringType => 2
    case BinaryType => 3
    case other => sys.error(s"unreachable: $other")
  }

  override def nullSafeEval(input: Any): Any = kind match {
    case 0 => IcebergPartition.hashLong(input.asInstanceOf[Int].toLong)
    case 1 => IcebergPartition.hashLong(input.asInstanceOf[Long])
    case 2 => IcebergPartition.hashUtf8(input.asInstanceOf[UTF8String])
    case _ => IcebergPartition.murmur3(input.asInstanceOf[Array[Byte]])
  }

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, in => kind match {
      case 0 => s"graft.sources.IcebergPartition.hashLong((long) $in)"
      case 1 => s"graft.sources.IcebergPartition.hashLong($in)"
      case 2 => s"graft.sources.IcebergPartition.hashUtf8($in)"
      case _ => s"graft.sources.IcebergPartition.murmur3($in)"
    })

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** Iceberg per-file column bounds (`lower_bounds`/`upper_bounds`,
  * manifest field-ids 125/128): the format's zone maps. Values use the
  * spec's single-value binary serialization (Appendix D) — little-endian
  * fixed-width numerics, raw UTF-8 for strings — so bounds written here
  * read back in any conforming engine and vice versa.
  *
  * String bounds are only written when the value fits
  * [[IcebergBounds.MaxStringBound]] bytes: truncating a LOWER bound is
  * safe but an upper bound would need the increment-last-codepoint
  * adjustment; omitting the bound keeps the file unprunable on that
  * column instead of silently wrong.
  */
object IcebergBounds {
  import java.nio.{ByteBuffer, ByteOrder}
  import org.apache.spark.sql.types._

  val MaxStringBound = 16

  private def le(n: Int)(fill: ByteBuffer => Unit): Array[Byte] = {
    val b = ByteBuffer.allocate(n).order(ByteOrder.LITTLE_ENDIAN)
    fill(b); b.array()
  }

  /** External Scala value → spec bytes; None when the type (or this
    * particular value, e.g. a long string) has no safe encoding. */
  def encode(v: Any, dt: DataType): Option[Array[Byte]] = (v, dt) match {
    case (null, _) => None
    case (x: Int, IntegerType) => Some(le(4)(_.putInt(x)))
    case (x: Long, LongType) => Some(le(8)(_.putLong(x)))
    case (x: Float, FloatType) => Some(le(4)(_.putFloat(x)))
    case (x: Double, DoubleType) => Some(le(8)(_.putDouble(x)))
    case (x: Boolean, BooleanType) => Some(Array(if (x) 1.toByte else 0.toByte))
    case (s: String, StringType) =>
      val b = s.getBytes("UTF-8")
      if (b.length <= MaxStringBound) Some(b) else None
    case (d: java.sql.Date, DateType) =>
      Some(le(4)(_.putInt(d.toLocalDate.toEpochDay.toInt)))
    case (d: java.time.LocalDate, DateType) =>
      Some(le(4)(_.putInt(d.toEpochDay.toInt)))
    case (t: java.sql.Timestamp, TimestampType | TimestampNTZType) =>
      val i = t.toInstant
      Some(le(8)(_.putLong(i.getEpochSecond * 1000000L + i.getNano / 1000)))
    case (i: java.time.Instant, TimestampType) =>
      Some(le(8)(_.putLong(i.getEpochSecond * 1000000L + i.getNano / 1000)))
    case (l: java.time.LocalDateTime, TimestampNTZType) =>
      val i = l.toInstant(java.time.ZoneOffset.UTC)
      Some(le(8)(_.putLong(i.getEpochSecond * 1000000L + i.getNano / 1000)))
    case _ => None
  }

  /** Spec bytes → the SAME external types [[IcebergPartition.atoms]]
    * produces for literals, so bound/literal comparisons are type-aligned. */
  def decode(bytes: Array[Byte], dt: DataType): Option[Any] = {
    val b = ByteBuffer.wrap(bytes).order(ByteOrder.LITTLE_ENDIAN)
    dt match {
      case IntegerType if bytes.length == 4 => Some(b.getInt)
      case LongType if bytes.length == 8 => Some(b.getLong)
      case FloatType if bytes.length == 4 => Some(b.getFloat)
      case DoubleType if bytes.length == 8 => Some(b.getDouble)
      case BooleanType if bytes.length == 1 => Some(bytes(0) != 0)
      case StringType => Some(new String(bytes, "UTF-8"))
      case DateType if bytes.length == 4 =>
        Some(java.time.LocalDate.ofEpochDay(b.getInt.toLong))
      case TimestampType if bytes.length == 8 =>
        val us = b.getLong
        Some(java.time.Instant.ofEpochSecond(
          java.lang.Math.floorDiv(us, 1000000L),
          java.lang.Math.floorMod(us, 1000000L) * 1000))
      case TimestampNTZType if bytes.length == 8 =>
        val us = b.getLong
        Some(java.time.LocalDateTime.ofEpochSecond(
          java.lang.Math.floorDiv(us, 1000000L),
          (java.lang.Math.floorMod(us, 1000000L) * 1000).toInt,
          java.time.ZoneOffset.UTC))
      case _ => None
    }
  }

  private def cmp(a: Any, b: Any): Option[Int] = (a, b) match {
    case (x: Int, y: Int) => Some(Integer.compare(x, y))
    case (x: Long, y: Long) => Some(java.lang.Long.compare(x, y))
    case (x: Int, y: Long) => Some(java.lang.Long.compare(x.toLong, y))
    case (x: Long, y: Int) => Some(java.lang.Long.compare(x, y.toLong))
    case (x: Float, y: Float) => Some(java.lang.Float.compare(x, y))
    case (x: Double, y: Double) => Some(java.lang.Double.compare(x, y))
    case (x: Float, y: Double) => Some(java.lang.Double.compare(x.toDouble, y))
    case (x: Double, y: Float) => Some(java.lang.Double.compare(x, y.toDouble))
    case (x: String, y: String) => Some(x.compareTo(y))
    case (x: java.time.LocalDate, y: java.time.LocalDate) => Some(x.compareTo(y))
    case (x: java.time.Instant, y: java.time.Instant) => Some(x.compareTo(y))
    case (x: java.time.LocalDateTime, y: java.time.LocalDateTime) => Some(x.compareTo(y))
    case _ => None
  }

  /** Can a file with [lo, hi] on the atom's column hold a matching row?
    * `lo`/`hi` may independently be absent (None ⇒ that side unbounded).
    * Incomparable values keep the file — never prune blind. String LOWER
    * bounds may be truncated by a foreign writer, which only WIDENS the
    * interval, so the check stays sound. */
  def mightMatch(atom: IcebergPartition.Atom,
      lo: Option[Any], hi: Option[Any]): Boolean = {
    import IcebergPartition.{Eq, InList, Cmp}
    def geLo(v: Any) = lo.forall(l => cmp(v, l).forall(_ >= 0))
    def leHi(v: Any) = hi.forall(h => cmp(v, h).forall(_ <= 0))
    def gtLo(v: Any) = lo.forall(l => cmp(v, l).forall(_ > 0))
    def ltHi(v: Any) = hi.forall(h => cmp(v, h).forall(_ < 0))
    atom match {
      case Eq(_, null) => false
      case Eq(_, v) => geLo(v) && leHi(v)
      case InList(_, vs) => vs.filter(_ != null).exists(v => geLo(v) && leHi(v))
      case Cmp(_, ">", v) => v == null || ltHi(v) // some row value > v ⇔ hi > v
      case Cmp(_, ">=", v) => v == null || leHi(v)
      case Cmp(_, "<", v) => v == null || gtLo(v)
      case Cmp(_, "<=", v) => v == null || geLo(v)
      case _ => true
    }
  }
}
