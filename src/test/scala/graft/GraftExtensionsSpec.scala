package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.unsafe.types.UTF8String

import graft.expressions.{SequenceRatio, Utf16Length}
import graft.plans.SequenceRatioLengthBound

/** The config-driven Catalyst injection surface
  * (`spark.sql.extensions=graft.GraftExtensions`): every custom expression
  * as a native SQL function, plus the [[SequenceRatioLengthBound]]
  * optimizer rule — and the rule's soundness on exactly the edges where a
  * naive length bound would diverge from difflib (both-empty pairs under a
  * strict threshold, supplementary-plane characters where code-point and
  * UTF-16 lengths differ, nulls).
  */
class GraftExtensionsSpec extends SparkSpec {

  /** Run `body` with a FRESH SparkSession carrying [[GraftExtensions]]
    * through the builder's injection hook (same SparkContext), restoring
    * the suite session after. `spark.sql.extensions=graft.GraftExtensions`
    * goes through the exact same `SparkSessionExtensions` application at
    * context start-up, but it is a STATIC conf — unreachable from a test
    * that must reuse the suite's running context — so the spec exercises
    * the injection class via `withExtensions`, which is the same code path
    * minus the class-name reflection.
    */
  private def withExtensionsSession[A](body: SparkSession => A): A = {
    val orig = spark // force the lazy shared session first
    SparkSession.clearActiveSession()
    SparkSession.clearDefaultSession()
    try {
      val s = SparkSession.builder()
        .withExtensions(new GraftExtensions)
        .getOrCreate()
      assert(s ne orig, "injection path must yield a fresh session")
      body(s)
    } finally {
      SparkSession.setDefaultSession(orig)
      SparkSession.setActiveSession(orig)
    }
  }

  test("config-driven session exposes every function as native SQL") {
    withExtensionsSession { s =>
      val row = s.sql(
        """SELECT seq_ratio('lamar blvd', 'lamar') AS r,
          |  vec_dot(array(1d, 2d), array(3d, 4d)) AS d,
          |  vec_cosine(array(1d, 0d), array(1d, 0d)) AS c,
          |  vec_sqdist(array(0d, 0d), array(3d, 4d)) AS sq,
          |  vec_norm(array(3d, 4d)) AS nrm,
          |  vec_normalize(array(3d, 4d))[0] AS nx,
          |  unicode_nfc('café') AS nfc,
          |  unicode_nfkc('ﬁn') AS nfkc,
          |  utf16_length('a🎉') AS ul,
          |  lcs_len(array('a','b','c'), array('b','c')) AS lcs,
          |  token_edit_distance(array('a','b'), array('a','x')) AS ted,
          |  size(regex_spans('a1b22', '\\d+')) AS nsp
          |""".stripMargin).head()
      assert(math.abs(row.getDouble(0) - SequenceRatio.ratio("lamar blvd", "lamar")) < 1e-15)
      assert(row.getDouble(1) == 11.0)
      assert(row.getDouble(2) == 1.0)
      assert(row.getDouble(3) == 25.0)
      assert(row.getDouble(4) == 5.0)
      assert(math.abs(row.getDouble(5) - 0.6) < 1e-15)
      assert(row.getString(6) == "café")
      assert(row.getString(7) == "fin")
      assert(row.getInt(8) == 3) // 1 BMP char + 1 supplementary = 3 UTF-16 units
      assert(row.getInt(9) == 2 && row.getInt(10) == 1 && row.getInt(11) == 2)
    }
  }

  test("geo family is SQL-native: tile_x/tile_y/intersection_id/haversine_feet") {
    withExtensionsSession { s =>
      val row = s.sql(
        """SELECT tile_x(-97.77d, 12) AS x, tile_y(30.23d, 12) AS y,
          |  tile_x(-97.77d, 1 + 11) AS xf,
          |  intersection_id(-97.77d, 30.23d) AS iid,
          |  haversine_feet(30.2747d, -97.7404d, 30.2862d, -97.7394d) AS hv
          |""".stripMargin).head()
      assert(row.getLong(0) == 935L && row.getLong(1) == 1686L)
      assert(row.getLong(2) == 935L) // foldable zoom expressions are fine
      val exp = java.security.MessageDigest.getInstance("MD5")
        .digest("Intersection -97.77000 30.23000".getBytes("UTF-8"))
        .map("%02x".format(_)).mkString
      assert(row.getString(3) == exp)
      assert(row.getDouble(4) > 4000 && row.getDouble(4) < 4600)
      // non-constant zoom refused with a proper AnalysisException
      val err = intercept[org.apache.spark.sql.AnalysisException] {
        s.sql("SELECT tile_x(lon, CAST(rand() * 10 AS INT)) FROM VALUES (1.0d) AS t(lon)")
          .collect()
      }
      assert(err.getMessage.contains("tile_x"))
      // a LONG zoom that truncates into range via intValue() (2^32 -> 0)
      // must be refused at long width, not silently accepted as zoom 0
      val wrap = intercept[org.apache.spark.sql.AnalysisException] {
        s.sql("SELECT tile_y(lat, 4294967296) FROM VALUES (1.0d) AS t(lat)").collect()
      }
      assert(wrap.getMessage.contains("tile_y"))
      // valid long-typed foldables still work
      assert(s.sql("SELECT tile_y(30.23d, CAST(12 AS BIGINT)) AS y").head().getLong(0) == 1686L)
    }
  }

  test("config-driven session runs the length-bound rule (plan contains the bound)") {
    withExtensionsSession { s =>
      // non-constant columns — literals would constant-fold the whole
      // predicate before the rule could be observed
      s.createDataFrame(
        s.sparkContext.parallelize(Seq(("abcdef", "abcdez"), ("abc", "zzz")), 2))
        .toDF("a", "b")
        .createOrReplaceTempView("ext_pairs")
      val df = s.sql("SELECT * FROM ext_pairs WHERE seq_ratio(a, b) >= 0.9")
      val optimized = df.queryExecution.optimizedPlan
      assert(optimized.exists(_.expressions.exists(
        _.exists(_.isInstanceOf[Utf16Length]))),
        s"expected Utf16Length bound in:\n$optimized")
    }
  }

  test("Functions.register installs the same surface on the programmatic path") {
    // the shared suite session goes through GraftSession.local →
    // Functions.register + extraOptimizations
    val r = spark.sql("SELECT utf16_length('🎉'), seq_ratio('ab', 'ab')").head()
    assert(r.getInt(0) == 2 && r.getDouble(1) == 1.0)
    assert(spark.experimental.extraOptimizations.contains(SequenceRatioLengthBound))
  }

  // ---- rule soundness ------------------------------------------------

  /** Edge fixture: empties, one-sided empties, supplementary-plane strings
    * (UTF-16 length ≠ code-point length), exact-boundary ratios, nulls,
    * and badly length-mismatched pairs (the ones the bound prunes).
    */
  private def edgePairs: DataFrame = {
    val rows: Seq[(Int, String, String)] = Seq(
      (1, "", ""),                             // ratio 1.0; strict bound needs the escape
      (2, "", "abc"),                          // ratio 0.0
      (3, "abc", "abc"),
      (4, "abcd", "abcz"),                     // 0.75
      (5, "🎉🎉", "🎉🎉"), // emoji, ratio 1.0
      (6, "🎉", "x"),                // supplementary vs BMP
      (7, "ab", "ab🎉"),             // 2*2/(2+4) = 0.666...
      (8, null, "abc"),                        // null → filter drops
      (9, "abc", null),
      (10, "a", "aaaaaaaaaaaaaaaaaaaaaaaa"),   // length-pruned
      (11, "abcdefgh", "abcdefgh"),
      (12, "aaaa", "aa"))                      // 2*2/(4+2) = 0.666...
    // RDD-backed (NOT a LocalRelation): ConvertToLocalRelation would fold
    // the filter away at optimize time and the rule would never be visible
    spark.createDataFrame(spark.sparkContext.parallelize(rows, 2))
      .toDF("id", "a", "b")
  }

  private def expectedKeep(t: Double, strict: Boolean): Set[Int] =
    edgePairs.collect().flatMap { r =>
      val (a, b) = (r.getAs[String]("a"), r.getAs[String]("b"))
      if (a == null || b == null) None
      else {
        val ratio = SequenceRatio.ratio(a, b)
        if (if (strict) ratio > t else ratio >= t) Some(r.getInt(0)) else None
      }
    }.toSet

  test("rule-on filter ≡ difflib recompute on every edge (>=, >, several thresholds)") {
    for (t <- Seq(0.5, 2.0 / 3.0, 0.75, 0.9, 1.0); strict <- Seq(false, true)) {
      val cond =
        if (strict) Functions.seqRatio(col("a"), col("b")) > lit(t)
        else Functions.seqRatio(col("a"), col("b")) >= lit(t)
      val got = edgePairs.filter(cond).select("id").collect().map(_.getInt(0)).toSet
      assert(got == expectedKeep(t, strict), s"t=$t strict=$strict")
    }
  }

  test("rule-on ≡ rule-off row sets (direct A/B on the same session)") {
    val conds = Seq(
      Functions.seqRatio(col("a"), col("b")) >= lit(0.75),
      Functions.seqRatio(col("a"), col("b")) > lit(0.9),
      greatest(
        Functions.seqRatio(col("a"), col("b")),
        Functions.seqRatio(col("a"), concat(col("b"), lit("x")))) >= lit(2.0 / 3.0))
    conds.foreach { cond =>
      val withRule = edgePairs.filter(cond).select("id").collect().map(_.getInt(0)).toSet
      val saved = spark.experimental.extraOptimizations
      spark.experimental.extraOptimizations =
        saved.filterNot(_ eq SequenceRatioLengthBound)
      try {
        val without = edgePairs.filter(cond).select("id").collect().map(_.getInt(0)).toSet
        assert(withRule == without, s"cond=$cond")
      } finally spark.experimental.extraOptimizations = saved
    }
  }

  test("greatest-of-ratios threshold gets an OR-of-bounds (DeviceResolution shape)") {
    val df = edgePairs.filter(
      greatest(
        Functions.seqRatio(col("a"), col("b")),
        Functions.seqRatio(col("b"), col("a"))) >= lit(0.85))
    val optimized = df.queryExecution.optimizedPlan
    val nBounds = optimized.collect { case f: org.apache.spark.sql.catalyst.plans.logical.Filter =>
      f.condition.collect { case u: Utf16Length => u }.size
    }.sum
    assert(nBounds >= 4, s"expected per-pair bounds in:\n$optimized")
  }

  test("cross-join threshold (the real DeviceResolution shape) gets the bound in the JOIN condition") {
    val left = spark.createDataFrame(
      spark.sparkContext.parallelize(Seq((1, "lamar blvd/justin ln"), (2, "burnet rd/braker ln")), 2))
      .toDF("sid", "sname")
    val right = spark.createDataFrame(
      spark.sparkContext.parallelize(Seq((10, "lamar/justin"), (11, "wholly unrelated xxxxxxxxxxxxxxxxxxxxxx")), 2))
      .toDF("did", "dname")
    val df = left.crossJoin(right)
      .withColumn("ratio", greatest(
        Functions.seqRatio(col("sname"), col("dname")),
        Functions.seqRatio(col("dname"), col("sname"))))
      .filter(col("ratio") >= lit(0.7))
    val optimized = df.queryExecution.optimizedPlan
    val joinCondBounds = optimized.collect {
      case j: org.apache.spark.sql.catalyst.plans.logical.Join =>
        j.condition.toSeq.flatMap(_.collect { case u: Utf16Length => u }).size
    }.sum
    assert(joinCondBounds >= 4, s"expected bounds inside the join condition:\n$optimized")
    // and the results are exactly the difflib recompute
    val kept = df.select("sid", "did").collect().map(r => (r.getInt(0), r.getInt(1))).toSet
    val expected = (for {
      (s1, n1) <- Seq((1, "lamar blvd/justin ln"), (2, "burnet rd/braker ln"))
      (d1, n2) <- Seq((10, "lamar/justin"), (11, "wholly unrelated xxxxxxxxxxxxxxxxxxxxxx"))
      if math.max(SequenceRatio.ratio(n1, n2), SequenceRatio.ratio(n2, n1)) >= 0.7
    } yield (s1, d1)).toSet
    assert(kept == expected)
  }

  test("rule is idempotent and skips non-literal / non-positive thresholds") {
    val plan = edgePairs
      .filter(Functions.seqRatio(col("a"), col("b")) >= lit(0.8))
      .queryExecution.optimizedPlan // rule already applied once here
    assert(SequenceRatioLengthBound(plan).canonicalized == plan.canonicalized)

    // non-positive and column thresholds: untouched
    val noBound = edgePairs
      .filter(Functions.seqRatio(col("a"), col("b")) >= lit(0.0))
      .queryExecution.optimizedPlan
    assert(!noBound.exists(_.expressions.exists(_.exists(_.isInstanceOf[Utf16Length]))))

    // non-deterministic ratio inputs: untouched (the bound would re-evaluate
    // them with different values and could drop rows the predicate keeps).
    // The analyzer's PullOutNondeterministic normally protects Filter, so
    // exercise the rule directly on a raw plan the way another rule or a
    // manual caller could hand it one.
    {
      import org.apache.spark.sql.catalyst.dsl.expressions._
      import org.apache.spark.sql.catalyst.expressions.{GreaterThanOrEqual, If, LessThan, Literal, Rand}
      import org.apache.spark.sql.catalyst.plans.logical.LocalRelation
      import graft.expressions.SequenceRatio
      val rel = LocalRelation($"a".string, $"b".string)
      val nondetCond = GreaterThanOrEqual(
        SequenceRatio(If(LessThan(Rand(7), Literal(0.5)), $"a", $"b"), $"b"),
        Literal(0.8))
      val plan = org.apache.spark.sql.catalyst.plans.logical.Filter(nondetCond, rel)
      assert(SequenceRatioLengthBound(plan) eq plan,
        "non-deterministic threshold conjunct must not get a length bound")
    }
  }

  // ---- Utf16Length ---------------------------------------------------

  // ---- RegexSpans ------------------------------------------------------

  test("regex_spans: offsets, multiple matches, UTF-16 units, SQL surface") {
    import org.apache.spark.unsafe.types.UTF8String
    val p = java.util.regex.Pattern.compile("\\d+")
    def spansOf(s: String): Seq[(Int, Int)] = {
      val a = graft.expressions.RegexSpans.spans(UTF8String.fromString(s), p)
      (0 until a.numElements()).map { i =>
        val r = a.getStruct(i, 2); (r.getInt(0), r.getInt(1))
      }
    }
    assert(spansOf("a12b345c") == Seq((1, 3), (4, 7)))
    assert(spansOf("none") == Seq.empty)
    // supplementary-plane prefix costs TWO UTF-16 units (Java Matcher
    // semantics — the offsets a JVM consumer slices with)
    assert(spansOf("🎉a7") == Seq((3, 4)))
    // zero-width-capable pattern terminates (Matcher.find self-advances)
    val z = java.util.regex.Pattern.compile("x*")
    val za = graft.expressions.RegexSpans.spans(UTF8String.fromString("axa"), z)
    assert(za.numElements() > 0)
    // SQL surface via the shared builder table
    val viaSql = spark.sql(
      "SELECT regex_spans('a12b345c', '\\\\d+')").head()
      .getSeq[org.apache.spark.sql.Row](0)
      .map(r => (r.getInt(0), r.getInt(1)))
    assert(viaSql == Seq((1, 3), (4, 7)))
    // foldable (but non-literal) patterns are fine — constant at plan time
    val folded = spark.sql("SELECT regex_spans('a12b345c', concat('\\\\d', '+'))").head()
      .getSeq[org.apache.spark.sql.Row](0)
      .map(r => (r.getInt(0), r.getInt(1)))
    assert(folded == Seq((1, 3), (4, 7)))
    val castLit = spark.sql("SELECT size(regex_spans('a1b2', CAST('\\\\d' AS STRING)))").head().getInt(0)
    assert(castLit == 2)
    // non-constant pattern is refused with a proper AnalysisException
    val err = intercept[org.apache.spark.sql.AnalysisException] {
      spark.sql("SELECT regex_spans(c, c) FROM VALUES ('a') AS t(c)").collect()
    }
    assert(err.getMessage.contains("regex_spans") && err.getMessage.contains("foldable"))
    // null pattern refused too
    val errNull = intercept[org.apache.spark.sql.AnalysisException] {
      spark.sql("SELECT regex_spans('a', CAST(NULL AS STRING))").collect()
    }
    assert(errNull.getMessage.contains("null"))
  }

  test("piiSpans: kinds, offsets, and exact scrub-coverage of a crafted doc") {
    import spark.implicits._
    val text = "see http://x.io and mail a@b.co at 10.0.0.1 end"
    val got = graft.ops.TextAnalysis.piiSpans(
      Seq((1L, text)).toDF("id", "text"), "id", "text")
      .collect()
      .map(r => (r.getString(1), r.getLong(2).toInt, r.getLong(3).toInt)).toSet
    assert(got == Set(
      ("url", text.indexOf("http"), text.indexOf("http") + "http://x.io".length),
      ("email", text.indexOf("a@b.co"), text.indexOf("a@b.co") + "a@b.co".length),
      ("ip", text.indexOf("10.0"), text.indexOf("10.0") + "10.0.0.1".length)))
    // the spans slice back to exactly the sensitive text
    got.foreach { case (kind, s, e) =>
      val sliced = text.substring(s, e)
      kind match {
        case "url" => assert(sliced == "http://x.io")
        case "email" => assert(sliced == "a@b.co")
        case "ip" => assert(sliced == "10.0.0.1")
      }
    }
  }

  test("utf16_length equals Java String.length on valid strings") {
    val samples = Seq("", "abc", "café", "🎉", "a🎉b",
      "🎉😀", "日本語", "á̈", "�", "￿")
    samples.foreach { s =>
      assert(Utf16Length.lengthUTF8(UTF8String.fromString(s)) == s.length, s"'$s'")
    }
  }

  test("utf16_length falls back to toString.length on malformed UTF-8") {
    val malformed = Seq(
      Array[Byte](0x80.toByte),                        // stray continuation
      Array[Byte](0xC2.toByte),                        // truncated 2-byte
      Array[Byte](0xE0.toByte, 0x80.toByte, 0x80.toByte), // overlong
      Array[Byte](0xED.toByte, 0xA0.toByte, 0x80.toByte), // surrogate range
      Array[Byte](0xF4.toByte, 0x90.toByte, 0x80.toByte, 0x80.toByte), // > U+10FFFF
      Array[Byte](0xF5.toByte, 0x80.toByte, 0x80.toByte, 0x80.toByte), // invalid lead
      Array[Byte]('a', 0xC0.toByte, 'b'))              // overlong lead C0
    malformed.foreach { bytes =>
      val u = UTF8String.fromBytes(bytes)
      assert(Utf16Length.lengthUTF8(u) == u.toString.length,
        bytes.map(b => f"${b & 0xFF}%02X").mkString(" "))
    }
  }
}
