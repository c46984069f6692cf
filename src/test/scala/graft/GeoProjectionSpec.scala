package graft

import org.apache.spark.sql.functions._
import graft.operators.{GeoMath, GeoProjection}

class GeoProjectionSpec extends SpecBase {

  test("forward/inverse TM round-trips to sub-millimeter over Israel's extent") {
    val pts = Seq((31.0, 34.5), (32.5, 35.2), (33.2, 35.6), (29.6, 34.9), (31.734394, 35.204517))
    for ((lat, lon) <- pts) {
      val (e, n) = GeoMath.forward(lat, lon)
      val (lat2, lon2) = GeoMath.inverse(e, n)
      assert(math.abs(lat2 - lat) < 1e-9, s"lat roundtrip $lat -> $lat2")
      assert(math.abs(lon2 - lon) < 1e-9, s"lon roundtrip $lon -> $lon2")
    }
  }

  test("the ITM false origin maps to the published natural origin") {
    val (lat, lon) = GeoMath.inverse(219529.584, 626907.390)
    assert(math.abs(lat - (31.0 + 44.0 / 60 + 3.817 / 3600)) < 1e-9)
    assert(math.abs(lon - (35.0 + 12.0 / 60 + 16.261 / 3600)) < 1e-9)
  }

  test("datum shift moves coordinates by the expected ~1-2 arc-seconds") {
    val Array(lon, lat) = GeoMath.itmToWgs84(219529.584, 626907.390)
    val dLat = lat - (31.0 + 44.0 / 60 + 3.817 / 3600)
    val dLon = lon - (35.0 + 12.0 / 60 + 16.261 / 3600)
    // ~50m shift at most, but not zero
    assert(math.abs(dLat) < 0.001 && math.abs(dLon) < 0.001)
    assert(math.abs(dLat) > 1e-5 || math.abs(dLon) > 1e-5)
  }

  test("tel aviv area ITM coordinates land in the right WGS84 neighborhood") {
    // Approximate landmark anchor (coarse public pairing, ~km tolerance —
    // the exact checks above are the round-trip and the published origin).
    val Array(lon, lat) = GeoMath.itmToWgs84(179254.0, 664694.0)
    assert(math.abs(lat - 32.074) < 0.03, s"lat $lat")
    assert(math.abs(lon - 34.792) < 0.03, s"lon $lon")
  }

  test("withWgs84 projects a DataFrame column pair distributedly") {
    import spark.implicits._
    val df = Seq((1L, 179254.0, 664694.0), (2L, 219529.584, 626907.390))
      .toDF("id", "easting", "northing")
    val out = GeoProjection.withWgs84(spark, df, "easting", "northing").orderBy("id").collect()
    val geom = out.head.getSeq[Double](3)
    assert(geom.length == 2 && geom(1) > 31.9 && geom(1) < 32.2)
    // geometry validation from the reference (helpers.py:69): lon 33-37, lat 29.3-33.3
    assert(geom(0) > 33 && geom(0) < 37)
  }
}
