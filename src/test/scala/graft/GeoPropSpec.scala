package graft

import graft.functions.{IcoHex, ZOrderKey}
import org.scalacheck.{Gen, Prop, Test => SCTest}
import org.scalacheck.rng.Seed

/** Property checks on GENERATED coordinates for the geo/clustering
  * primitives — random inputs hit cells, faces, and bit patterns no
  * fixed-vector table covers.
  */
class GeoPropSpec extends SparkSpec {
  import spark.implicits._

  // Gen.choose, not chooseNum: chooseNum over-samples the special values
  // (exact poles, the ±180 antimeridian, 0.0), which are precisely the
  // measure-zero seam set where face-projected indexes are legitimately
  // inexact — uniform sampling matches the containment guarantee
  private val genLat = Gen.choose(-90.0, 90.0)
  private val genLon = Gen.choose(-180.0, 180.0)

  // fixed seed everywhere: the icohex round-trip check is a statistical
  // bound and the sampled point sets feed exact assertions — both must be
  // reproducible across runs, not a fresh draw per CI invocation
  private def params(n: Int) =
    SCTest.Parameters.default.withMinSuccessfulTests(n)
      .withInitialSeed(Seed(0x6EA9_5EEDL))

  private def sample[A](g: Gen[A], seed: Long): A =
    g.pureApply(Gen.Parameters.default, Seed(seed))

  // interleave's documented domain is the 65k grid ([0, 65535] per axis)
  private val genCell = Gen.chooseNum(0L, 65535L)

  test("zorder_key: coordinatewise dominance implies key ordering (Morton property)") {
    // if a1 <= a2 AND b1 <= b2 then interleave(a1,b1) <= interleave(a2,b2) —
    // the property that makes min/max zone maps work for Z-ordered files
    val prop = Prop.forAll(genCell, genCell, genCell, genCell) { (a1, b1, da, db) =>
      val (a2, b2) = (math.min(a1 + da, 65535L), math.min(b1 + db, 65535L))
      ZOrderKey.interleave(a1, b1) <= ZOrderKey.interleave(a2, b2)
    }
    val res = SCTest.check(params(200), prop)
    assert(res.passed, res.status.toString)
  }

  test("zorder_key: interleave is injective (de-interleaving recovers both inputs)") {
    def deinterleave(z: Long): (Long, Long) = {
      var a = 0L; var b = 0L
      var i = 0
      while (i < 16) {
        a |= ((z >> (2 * i + 1)) & 1L) << i
        b |= ((z >> (2 * i)) & 1L) << i
        i += 1
      }
      (a, b)
    }
    val prop = Prop.forAll(genCell, genCell) { (a, b) =>
      deinterleave(ZOrderKey.interleave(a, b)) == ((a, b))
    }
    val res = SCTest.check(params(200), prop)
    assert(res.passed, res.status.toString)
  }

  test("geohash native expression equals a reference bit-interleave encoder on random points") {
    // independent reference implementation: classic geohash via repeated
    // bisection (textbook algorithm, not the expression's arithmetic)
    val base32 = "0123456789bcdefghjkmnpqrstuvwxyz"
    def refGeohash(lat: Double, lon: Double, precision: Int): String = {
      var (latLo, latHi, lonLo, lonHi) = (-90.0, 90.0, -180.0, 180.0)
      var even = true
      val sb = new StringBuilder
      var bits = 0; var ch = 0
      while (sb.length < precision) {
        if (even) {
          val mid = (lonLo + lonHi) / 2
          if (lon >= mid) { ch = (ch << 1) | 1; lonLo = mid } else { ch = ch << 1; lonHi = mid }
        } else {
          val mid = (latLo + latHi) / 2
          if (lat >= mid) { ch = (ch << 1) | 1; latLo = mid } else { ch = ch << 1; latHi = mid }
        }
        even = !even
        bits += 1
        if (bits == 5) { sb.append(base32(ch)); bits = 0; ch = 0 }
      }
      sb.toString
    }
    val pts = sample(Gen.listOfN(64, Gen.zip(genLat, genLon)), 64L)
    val got = pts.toDF("lat", "lon")
      .select(functions.Geo.geohash("lat", "lon", 8).as("g"))
      .as[String].collect()
    pts.zip(got).foreach { case ((lat, lon), g) =>
      assert(g == refGeohash(lat, lon, 8), s"($lat, $lon)")
    }
  }

  test("icohex: random points index to valid cells; centers round-trip away from seams") {
    // validity and declared resolution are EXACT properties; the
    // center→cell round trip is exact only away from icosahedron face
    // seams (the argmax face can flip there — inherent to any
    // face-projected index), so that part is a statistical bound, same
    // as IcoHexSpec's fixed-grid version.
    val pts = sample(Gen.listOfN(400, Gen.zip(genLat, genLon)), 400L)
    val cells = pts.map { case (lat, lon) =>
      val cell = IcoHex.latLngToCell(lat, lon, 6)
      assert(IcoHex.isValid(cell) && IcoHex.resolution(cell) == 6, s"($lat, $lon)")
      cell
    }.distinct
    val ok = cells.count { c =>
      val (clat, clon) = IcoHex.cellCenter(c)
      IcoHex.latLngToCell(clat, clon, 6) == c
    }
    assert(ok.toDouble / cells.size > 0.97, s"$ok of ${cells.size} round-tripped")
  }
}
