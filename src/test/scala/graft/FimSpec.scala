package graft

import org.apache.spark.sql.functions._

import graft.ops.Fim

class FimSpec extends SparkSpec {

  private lazy val docs = Tables(spark, "/root/testdata/sf0.001", "documents")

  private def originals: Map[Long, String] =
    docs.select(col("doc_id"), coalesce(col("text"), lit("")).as("t"))
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap

  test("PSM/SPM outputs reconstruct the original document exactly") {
    val orig = originals
    val out = Fim.transform(docs, "doc_id", "text")
      .select("doc_id", "format", "out_text").collect()
    assert(out.map(_.getString(1)).toSet.subsetOf(Set("psm", "spm", "none")))
    // with ~60 docs and rates 0.5/0.5 all three formats should appear
    assert(out.map(_.getString(1)).distinct.length == 3)
    out.foreach { r =>
      val (id, fmt, s) = (r.getLong(0), r.getString(1), r.getString(2))
      def cut1(str: String, sep: String): (String, String) = {
        val i = str.indexOf(sep)
        assert(i >= 0, s"missing $sep in: $str")
        (str.substring(0, i), str.substring(i + sep.length))
      }
      fmt match {
        case "none" => assert(s == orig(id))
        case "psm" =>
          // <PRE>pre<SUF>suf<MID>mid  →  pre + mid + suf == original
          assert(s.startsWith("<PRE>"), s"psm must start with <PRE>: $s")
          val (pre, rest) = cut1(s.stripPrefix("<PRE>"), "<SUF>")
          val (suf, mid) = cut1(rest, "<MID>")
          assert(pre + mid + suf == orig(id), s"psm doc $id does not reconstruct")
        case "spm" =>
          assert(s.startsWith("<SUF>"), s"spm must start with <SUF>: $s")
          val (suf, rest) = cut1(s.stripPrefix("<SUF>"), "<PRE>")
          val (pre, mid) = cut1(rest, "<MID>")
          assert(pre + mid + suf == orig(id), s"spm doc $id does not reconstruct")
      }
    }
  }

  test("deterministic and partition-independent") {
    val a = Fim.transform(docs.repartition(1), "doc_id", "text")
      .select("doc_id", "format", "out_text").collect()
      .map(r => (r.getLong(0), r.getString(1), r.getString(2))).toSet
    val b = Fim.transform(docs.repartition(7), "doc_id", "text")
      .select("doc_id", "format", "out_text").collect()
      .map(r => (r.getLong(0), r.getString(1), r.getString(2))).toSet
    assert(a == b)
  }

  test("fimRate 0 passes everything through; fimRate 1 + spmRate 0 is all-PSM") {
    val none = Fim.transform(docs, "doc_id", "text", fimRate = 0.0)
      .select("format").distinct().collect().map(_.getString(0)).toSeq
    assert(none == Seq("none"))
    val allPsm = Fim.transform(docs, "doc_id", "text", fimRate = 1.0, spmRate = 0.0)
      .select("format").distinct().collect().map(_.getString(0)).toSeq
    assert(allPsm == Seq("psm"))
  }

  test("custom sentinels are honored; empty document serializes to bare sentinels") {
    import spark.implicits._
    val tiny = Seq((1L, ""), (2L, "ab")).toDF("doc_id", "text")
    val out = Fim.transform(tiny, "doc_id", "text", fimRate = 1.0, spmRate = 0.0,
        preTok = "[P]", sufTok = "[S]", midTok = "[M]")
      .select("doc_id", "out_text").collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(out(1L) == "[P][S][M]")
    assert(out(2L).startsWith("[P]"))
    assert(out(2L).contains("[S]") && out(2L).contains("[M]"))
    assert(out(2L).replace("[P]", "").replace("[S]", "").replace("[M]", "").length == 2)
  }
  test("spanCorrupt: exact block/span construction, round trip, short-doc passthrough") {
    import spark.implicits._
    // recompute the md5 offset the operator derives, driver-side
    def off(id: Long, blk: Long): Long = {
      val h = java.security.MessageDigest.getInstance("MD5")
        .digest(s"t5:$id:$blk".getBytes("UTF-8"))
      val bits = ((h(0) & 0xffL) << 24) | ((h(1) & 0xffL) << 16) |
        ((h(2) & 0xffL) << 8) | (h(3) & 0xffL)
      bits % 3 // blockTokens - spanTokens + 1 = 3
    }
    val tokens = (0 until 10).map(i => s"t$i")
    val docs = Seq(
      (1L, tokens.mkString(" ")),   // 10 tokens: blocks [0..3],[4..7], tail [8,9]
      (2L, "a b"),                  // shorter than a block: passthrough
      (3L, ""),                     // empty
      (4L, null.asInstanceOf[String]))
      .toDF("doc_id", "text")
    val got = graft.ops.Fim.spanCorrupt(docs, "doc_id", "text",
        blockTokens = 4, spanTokens = 2)
      .collect().map(r => r.getLong(0) -> ((r.getLong(1), r.getString(2), r.getString(3))))
      .toMap

    // hand-build doc 1's expectation from the recomputed offsets
    val (o0, o1) = (off(1L, 0L), off(1L, 1L))
    val in1 = (tokens.take(4).patch(o0.toInt, Seq("<extra_id_0>"), 2) ++
      tokens.slice(4, 8).patch(o1.toInt, Seq("<extra_id_1>"), 2) ++
      tokens.drop(8)).mkString(" ")
    val tgt1 = (Seq("<extra_id_0>") ++ tokens.slice(o0.toInt, o0.toInt + 2) ++
      Seq("<extra_id_1>") ++ tokens.slice(4 + o1.toInt, 4 + o1.toInt + 2) ++
      Seq("<extra_id_2>")).mkString(" ")
    assert(got(1L) == ((10L, in1, tgt1)))

    assert(got(2L) == ((2L, "a b", "<extra_id_0>")), "short doc passes through")
    // a NULL doc id has no per-doc randomness: the doc must pass through
    // uncorrupted, not lose its full-block tokens to null propagation
    val nullId = graft.ops.Fim.spanCorrupt(
        Seq((Option.empty[Long], tokens.mkString(" "))).toDF("doc_id", "text"),
        "doc_id", "text", blockTokens = 4, spanTokens = 2)
      .collect().head
    assert(nullId.getString(2) == tokens.mkString(" "))
    assert(nullId.getString(3) == "<extra_id_2>")
    assert(got(3L) == ((0L, "", "<extra_id_0>")))
    assert(got(4L) == ((0L, "", "<extra_id_0>")))

    // round trip: substituting each target span back over its sentinel
    // reconstructs the original token stream
    val spans = tgt1.split("<extra_id_[0-9]+>").map(_.trim).filter(_.nonEmpty)
    var recon = in1
    spans.zipWithIndex.foreach { case (sp, i) =>
      recon = recon.replace(s"<extra_id_$i>", sp)
    }
    assert(recon == tokens.mkString(" "), s"round trip failed: $recon")
  }
  test("ul2Mix: every doc routed exactly once, rates track, S arm reconstructs") {
    import spark.implicits._
    val docs = (0L until 400L).map(i =>
      (i, (0 until 24).map(j => s"w${i}_$j").mkString(" "))).toDF("doc_id", "text")
    val rows = graft.ops.Fim.ul2Mix(docs, "doc_id", "text").collect()
    assert(rows.length == 400, "every doc emitted exactly once (no arm overlap)")
    val got = rows.map(r => r.getLong(0) ->
      ((r.getString(1), r.getString(3), r.getString(4)))).toMap
    assert(got.size == 400)
    val byDen = got.values.groupBy(_._1).view.mapValues(_.size).toMap
    assert(math.abs(byDen("r") - 200) < 60, s"r rate ~0.5: $byDen")
    assert(math.abs(byDen("x") - 100) < 50, s"x rate ~0.25: $byDen")
    assert(math.abs(byDen("s") - 100) < 50, s"s rate ~0.25: $byDen")
    // S arm: prefix + suffix reassemble the original exactly
    got.collect { case (id, ("s", in, tgt)) =>
      val prefix = in.stripSuffix("<extra_id_0>").trim
      val suffix = tgt.stripPrefix("<extra_id_0>").stripSuffix("<extra_id_1>").trim
      val orig = (0 until 24).map(j => s"w${id}_$j").mkString(" ")
      assert(Seq(prefix, suffix).filter(_.nonEmpty).mkString(" ") == orig,
        s"S round trip failed for $id")
    }
    // X corrupts more than R: average sentinel-stripped input is shorter
    def kept(in: String) = in.split(" ").count(!_.startsWith("<extra_id_"))
    val rKept = got.values.collect { case ("r", in, _) => kept(in) }
    val xKept = got.values.collect { case ("x", in, _) => kept(in) }
    assert(xKept.sum.toDouble / xKept.size < rKept.sum.toDouble / rKept.size,
      "extreme denoiser must remove more tokens")
    // deterministic
    // NULL id: draws -1 -> R arm -> uncorrupted passthrough, never dropped
    val nullRow = graft.ops.Fim.ul2Mix(
        Seq((Option.empty[Long], "alpha beta gamma")).toDF("doc_id", "text"),
        "doc_id", "text")
      .collect()
    assert(nullRow.length == 1 && nullRow.head.getString(1) == "r")
    assert(nullRow.head.getString(3) == "alpha beta gamma")
    val again = graft.ops.Fim.ul2Mix(docs, "doc_id", "text")
      .collect().map(r => r.getLong(0) ->
        ((r.getString(1), r.getString(3), r.getString(4)))).toMap
    assert(again == got)
  }
}
