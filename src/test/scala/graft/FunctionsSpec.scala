package graft

import org.apache.spark.sql.functions._

/** Regression lock on the scalar surface — especially the cross-engine
  * determinism pieces (portable rounding, md5-derived hashing).
  */
class FunctionsSpec extends SparkSpec {

  import spark.implicits._

  private def eval1[T](c: org.apache.spark.sql.Column): T =
    Seq(1).toDF("x").select(c.as("r")).head().getAs[T]("r")

  test("roundHalfUp: decimal .5 boundaries round like floor(x*10^k + 0.5)") {
    // 16.0675 is the regression case: Spark round() gives 16.068 (decimal
    // string HALF_UP) while binary-value engines see 16.067499999... and
    // round down — roundHalfUp must agree with the binary engines
    assert(eval1[Double](Functions.roundHalfUp(lit(16.0675), 3)) == 16.067)
    assert(eval1[Double](Functions.roundHalfUp(lit(2.5), 0)) == 3.0)
    assert(eval1[Double](Functions.roundHalfUp(lit(0.34375), 4)) == 0.3438) // binary-exact .5 up
    assert(eval1[Double](Functions.roundHalfUp(lit(1.23449), 3)) == 1.234)
  }

  test("seq_ratio registers for SQL use") {
    Functions.register(spark)
    val r = spark.sql("SELECT seq_ratio('burnet rd/braker ln', 'burnet/braker') AS r")
      .as[Double].head()
    assert(r == 0.8125)
  }

  test("guidWithDashes formats 8-4-4-4-12") {
    assert(eval1[String](Functions.guidWithDashes(lit("0123456789abcdef0123456789abcdef")))
      == "01234567-89ab-cdef-0123-456789abcdef")
  }

  test("timeBin15 floors to the quarter hour") {
    assert(eval1[String](Functions.timeBin15(lit("2020-01-01 09:44:59").cast("timestamp")))
      == "09:30")
    assert(eval1[String](Functions.timeBin15(lit("2020-01-01 00:00:00").cast("timestamp")))
      == "00:00")
  }

  test("dayOfWeekSun0: Sunday is 0") {
    assert(eval1[Int](Functions.dayOfWeekSun0(lit("2024-01-07").cast("date"))) == 0) // Sunday
    assert(eval1[Int](Functions.dayOfWeekSun0(lit("2024-01-08").cast("date"))) == 1) // Monday
  }

  test("md5Bits yields the md5-prefix integer") {
    // md5("a") = 0cc175b9c0f1b6a831c399e269772661 → first 8 hex = 0x0cc175b9
    assert(eval1[Long](Functions.md5Bits(lit("a"), 32)) == 0x0cc175b9L)
  }

  test("levRatio: bounded, 1.0 on equal and on two empties") {
    assert(eval1[Double](Functions.levRatio(lit("abc"), lit("abc"))) == 1.0)
    assert(eval1[Double](Functions.levRatio(lit(""), lit(""))) == 1.0)
    assert(eval1[Double](Functions.levRatio(lit("abc"), lit("axc"))) == 1.0 - 1.0 / 3.0)
  }

  test("haversineFeet: Austin capitol to UT tower ≈ 1.0 mile") {
    val d = eval1[Double](Functions.haversineFeet(
      lit(30.2747), lit(-97.7404), lit(30.2862), lit(-97.7394)))
    assert(d > 4000 && d < 4600, s"got $d ft")
  }

  test("tileX/tileY match the OSM slippy-tilenames formula; intersectionId is stable md5") {
    // independent reference implementation of the published OSM formula
    def deg2num(lat: Double, lon: Double, z: Int): (Long, Long) = {
      val n = math.pow(2.0, z)
      val x = math.floor((lon + 180.0) / 360.0 * n).toLong
      val y = math.floor(
        (1.0 - math.log(math.tan(math.toRadians(lat)) +
          1.0 / math.cos(math.toRadians(lat))) / math.Pi) / 2.0 * n).toLong
      (x, y)
    }
    val pts = Seq( // (lat, lon, zoom): the sharedstreets.md example, a
      // N-hemisphere and S-hemisphere point, near-antimeridian, zoom 0
      (30.23, -97.77, 12), (47.4707, 10.2, 17), (-33.8688, 151.2093, 12),
      (64.15, -179.99, 8), (30.23, -97.77, 0))
    for (((la, lo, z), i) <- pts.zipWithIndex) {
      val (ex, ey) = deg2num(la, lo, z)
      val r = spark.range(1).select(
        Functions.tileX(lit(lo), z).as("x"), Functions.tileY(lit(la), z).as("y")).head()
      assert((r.getLong(0), r.getLong(1)) == ((ex, ey)), s"point $i ($la, $lo, z=$z)")
    }
    // the doc's own example point at its recommended zoom 12
    assert(deg2num(30.23, -97.77, 12) == ((935L, 1686L)))
    // intersection key: full 32-hex md5 of the typed lon-lat message
    val id = eval1[String](Functions.intersectionId(lit(-97.77), lit(30.23)))
    val exp = java.security.MessageDigest.getInstance("MD5")
      .digest("Intersection -97.77000 30.23000".getBytes("UTF-8"))
      .map("%02x".format(_)).mkString
    assert(id == exp && id.length == 32)
    // deterministic join key: same coordinates ⇒ same id, regardless of source
    assert(eval1[String](Functions.intersectionId(lit(-97.77), lit(30.23))) == id)
    assert(eval1[String](Functions.intersectionId(lit(-97.771), lit(30.23))) != id)
  }

  test("tileY: poles and past-Mercator latitudes clamp to edge rows, never NULL; NULL stays NULL") {
    // at lat = -90, tan φ + sec φ is exactly 0.0 in doubles and log() would
    // return NULL — the row would silently vanish from a tile equi-join
    val z = 4
    val n = 1L << z
    val r = spark.range(1).select(
      Functions.tileY(lit(-90.0), z).as("s"),
      Functions.tileY(lit(90.0), z).as("no"),
      Functions.tileY(lit(-89.999), z).as("s2"),
      Functions.tileY(lit(86.5), z).as("n2"),
      Functions.tileY(lit(null).cast("double"), z).as("nl")).head()
    assert(r.getLong(0) == n - 1, "south pole lands in the south edge row")
    assert(r.getLong(1) == 0L, "north pole lands in the north edge row")
    assert(r.getLong(2) == n - 1)
    assert(r.getLong(3) == 0L)
    assert(r.isNullAt(4), "NULL latitude stays NULL (least/greatest must not coerce)")
    // in-range latitudes are untouched by the clamp (exact OSM formula)
    val mid = spark.range(1).select(Functions.tileY(lit(30.23), 12).as("y")).head()
    assert(mid.getLong(0) == 1686L)
  }

  test("parseTimestampFlexible: format list, ISO fallback, epoch fallback, null on garbage") {
    val df = Seq(
      "01/15/2020 08:30:00 AM", // bt format
      "2020-01-15 08:30:00", // wt format / ISO-ish
      "1579077000", // epoch seconds for 2020-01-15 08:30:00 UTC
      "not a time").toDF("s")
    val parsed = df.select(
      Functions.parseTimestampFlexible(col("s"),
        Seq("M/d/yyyy h:mm:ss a", "yyyy-MM-dd HH:mm:ss")).cast("string").as("t"))
      .as[String].collect().toSeq
    assert(parsed(0) == "2020-01-15 08:30:00")
    assert(parsed(1) == "2020-01-15 08:30:00")
    assert(parsed(2) == "2020-01-15 08:30:00")
    assert(parsed(3) == null)
  }
}
