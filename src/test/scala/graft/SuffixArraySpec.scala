package graft

import graft.ops.SuffixArray

/** Prefix-doubling suffix ranks and LCP-derived longest repeats against
  * hand-computed fixtures.
  */
class SuffixArraySpec extends SparkSpec {

  import spark.implicits._

  test("banana: ranks are the classic suffix order") {
    val out = SuffixArray.ranks(Seq((1L, "banana")).toDF("doc_id", "text"), "doc_id", "text")
      .as[(Long, Long, Long)].collect().map(r => r._2 -> r._3).toMap
    // sorted suffixes: a(5) ana(3) anana(1) banana(0) na(4) nana(2)
    assert(out == Map(5L -> 1L, 3L -> 2L, 1L -> 3L, 0L -> 4L, 4L -> 5L, 2L -> 6L),
      s"got $out")
  }

  test("ranks: multiple docs independent; empty and null docs emit nothing") {
    val df = Seq((1L, "ab"), (2L, "ba"), (3L, ""), (4L, null))
      .toDF("doc_id", "text")
    val out = SuffixArray.ranks(df, "doc_id", "text")
      .as[(Long, Long, Long)].collect().groupBy(_._1)
    assert(out.keySet == Set(1L, 2L))
    assert(out(1L).map(r => r._2 -> r._3).toMap == Map(0L -> 1L, 1L -> 2L)) // ab < b
    assert(out(2L).map(r => r._2 -> r._3).toMap == Map(1L -> 1L, 0L -> 2L)) // a < ba
  }

  test("ranks: partition-invariant (integer algorithm)") {
    val docs = (1L to 20L).map(i => (i, s"doc $i " * 4 + s"tail$i"))
    val a = SuffixArray.ranks(docs.toDF("doc_id", "text").repartition(1), "doc_id", "text")
      .as[(Long, Long, Long)].collect().toSet
    val b = SuffixArray.ranks(docs.toDF("doc_id", "text").repartition(13), "doc_id", "text")
      .as[(Long, Long, Long)].collect().toSet
    assert(a == b)
  }

  test("ranksGlobal: identical to ranks on a mixed corpus (zero per-doc windows)") {
    val docs = ((1L to 30L).map(i => (i, s"doc $i body " * (i % 5 + 1).toInt + s"tail$i")) ++
      Seq((31L, "banana"), (32L, "a"), (33L, ""), (34L, null)))
      .toDF("doc_id", "text")
    val viaWindow = SuffixArray.ranks(docs, "doc_id", "text")
      .as[(Long, Long, Long)].collect().toSet
    val viaGlobal = SuffixArray.ranksGlobal(docs, "doc_id", "text")
      .as[(Long, Long, Long)].collect().toSet
    assert(viaGlobal == viaWindow)
  }

  test("ranksGlobal: one giant doc among small ones — ranks still exact") {
    // the exact case the per-doc window variant serializes: one document
    // 100x the length of its neighbors; correctness checked against a
    // driver-side direct suffix sort (independent of BOTH variants)
    val giant = (1 to 100).map(i => s"chunk $i of the long doc ").mkString
    val docs = (Seq((1L, giant)) ++ (2L to 10L).map(i => (i, s"small doc $i")))
      .toDF("doc_id", "text")
    val out = SuffixArray.ranksGlobal(docs, "doc_id", "text")
      .as[(Long, Long, Long)].collect()
      .groupBy(_._1).map { case (id, rs) => id -> rs.map(r => r._2 -> r._3).toMap }
    val texts = Map(1L -> giant) ++ (2L to 10L).map(i => i -> s"small doc $i").toMap
    texts.foreach { case (id, t) =>
      val expect = t.indices.sortBy(t.substring(_)).zipWithIndex
        .map { case (pos, r) => pos.toLong -> (r + 1L) }.toMap
      assert(out(id) == expect, s"doc $id rank table diverges from direct sort")
    }
  }

  test("ranksGlobal: partition-invariant") {
    val docs = (1L to 20L).map(i => (i, s"doc $i " * 4 + s"tail$i"))
    val a = SuffixArray.ranksGlobal(docs.toDF("doc_id", "text").repartition(1), "doc_id", "text")
      .as[(Long, Long, Long)].collect().toSet
    val b = SuffixArray.ranksGlobal(docs.toDF("doc_id", "text").repartition(13), "doc_id", "text")
      .as[(Long, Long, Long)].collect().toSet
    assert(a == b)
  }

  test("corpusRanks: one lexicographic order across docs; identical suffixes share a bucket") {
    val docs = Seq((1L, "banana"), (2L, "banana"), (3L, "xyz"))
      .toDF("doc_id", "text")
    val out = SuffixArray.corpusRanks(docs, "doc_id", "text")
      .as[(Long, Long, Long)].collect()
    // direct truth: sort ALL suffixes; a bucket rank = 1 + count of
    // strictly smaller suffix strings
    val all = Seq(1L -> "banana", 2L -> "banana", 3L -> "xyz").flatMap {
      case (id, t) => t.indices.map(p => (id, p.toLong, t.substring(p)))
    }
    val expected = all.map { case (id, p, s) =>
      (id, p) -> (1L + all.count(_._3 < s))
    }.toMap
    assert(out.map(r => (r._1, r._2) -> r._3).toMap == expected)
    // docs 1 and 2 are identical: every suffix pair shares its bucket
    val byDoc = out.groupBy(_._1).map { case (d, rs) => d -> rs.map(r => r._2 -> r._3).toMap }
    assert(byDoc(1L) == byDoc(2L))
  }

  test("crossDocRepeat: shared runs found, disjoint-alphabet doc reports 0, cap flags") {
    val docs = Seq(
      (1L, "the quick brown fox jumps"),
      (2L, "a quick brown fox leaps"), // shares " quick brown fox " → with doc 1
      (3L, "zzzqqqvvv")) // shares nothing with 1 or 2
      .toDF("doc_id", "text")
    val out = SuffixArray.crossDocRepeat(docs, "doc_id", "text")
      .as[(Long, Long, Boolean)].collect()
      .map(r => r._1 -> ((r._2, r._3))).toMap
    // longest shared substring of docs 1/2 is " quick brown fox " minus
    // the differing tails: "quick brown fox " + first shared char of the
    // next word? jumps vs leaps share nothing at that offset — the run is
    // " quick brown fox " (17 with both spaces) — compute directly:
    def lcs(a: String, b: String): Int = {
      var best = 0
      for (i <- a.indices; j <- b.indices) {
        var l = 0
        while (i + l < a.length && j + l < b.length && a(i + l) == b(j + l)) l += 1
        if (l > best) best = l
      }
      best
    }
    val t1 = "the quick brown fox jumps"; val t2 = "a quick brown fox leaps"
    val t3 = "zzzqqqvvv"
    val expected12 = lcs(t1, t2).toLong
    assert(out(1L) == ((expected12, false)), s"doc1 got ${out(1L)}, want $expected12")
    assert(out(2L) == ((expected12, false)))
    // doc 3 still shares single characters ('q' with "quick") — the
    // driver-side LCS is the ground truth, not intuition
    val expected3 = math.max(lcs(t3, t1), lcs(t3, t2)).toLong
    assert(out(3L) == ((expected3, false)), s"doc3 got ${out(3L)}, want $expected3")

    // cap: identical 100-char docs with maxLcp 16 → capped, report 16
    val twins = Seq((1L, "b" + "ab" * 50), (2L, "b" + "ab" * 50)).toDF("doc_id", "text")
    val capped = SuffixArray.crossDocRepeat(twins, "doc_id", "text", maxLcp = 16)
      .as[(Long, Long, Boolean)].collect().map(r => r._1 -> ((r._2, r._3))).toMap
    assert(capped(1L) == ((16L, true)) && capped(2L) == ((16L, true)), s"got $capped")
  }

  test("crossDocRepeat: equals driver-side brute-force LCS over a seeded random corpus") {
    val rnd = new scala.util.Random(42)
    val vocab = Vector("alpha", "beta", "gamma", "delta", "epsilon", "zeta")
    val texts: Map[Long, String] = (1L to 12L).map { i =>
      val t = Seq.fill(6 + rnd.nextInt(6))(vocab(rnd.nextInt(vocab.size))).mkString(" ")
      // docs 3 and 9 additionally share a guaranteed multi-word run
      i -> (if (i == 3L || i == 9L) t + " shared run of words here" else t)
    }.toMap
    def lcs(a: String, b: String): Int = {
      var best = 0
      for (i <- a.indices; j <- b.indices) {
        var l = 0
        while (i + l < a.length && j + l < b.length && a(i + l) == b(j + l)) l += 1
        if (l > best) best = l
      }
      best
    }
    val out = SuffixArray.crossDocRepeat(
      texts.toSeq.toDF("doc_id", "text"), "doc_id", "text", maxLcp = 256)
      .as[(Long, Long, Boolean)].collect().map(r => r._1 -> ((r._2, r._3))).toMap
    texts.keys.foreach { i =>
      val expected = texts.keys.filter(_ != i)
        .map(j => lcs(texts(i), texts(j))).max.toLong
      assert(out(i) == ((expected, false)),
        s"doc $i: got ${out(i)}, brute-force LCS says $expected")
    }
  }

  test("crossDocRepeat: cap-aware ranking — seed-tied fixture exact with ZERO doubling rounds") {
    // two docs share a 300-char pseudo-random run (>> the 128-char seed),
    // embedded mid-document so remainders exceed the cap on both sides;
    // a third doc shares a short 20-char run with doc 1; a fourth (digits
    // only vs letters elsewhere... still shares single spaces) is covered
    // by the brute-force truth. With maxLcp = 64 < seedK the doubling
    // loop must not run at all — the seed buckets stay TIED (proved via
    // corpusRanksResolved's resolved flag below) yet the capped report is
    // exact: intra-bucket pairs all report the cap, bucket-boundary LCPs
    // are seed-determined.
    val rnd = new scala.util.Random(7)
    val letters = "abcdefghijklmnopqrstuvwxyz "
    val run = (1 to 300).map(_ => letters(rnd.nextInt(letters.length))).mkString
    val short = "twenty char run here"
    val texts: Map[Long, String] = Map(
      1L -> (s"doc one starts $run and then doc one ends with $short"),
      2L -> (s"two begins differently $run two closes"),
      3L -> (s"third text containing $short plus an unrelated tail"),
      4L -> "9081726354 4523198076 1029384756")
    val docs = texts.toSeq.toDF("doc_id", "text")
    def lcs(a: String, b: String): Int = {
      var best = 0
      for (i <- a.indices; j <- b.indices) {
        var l = 0
        while (i + l < a.length && j + l < b.length && a(i + l) == b(j + l)) l += 1
        if (l > best) best = l
      }
      best
    }
    val cap = 64
    val out = SuffixArray.crossDocRepeat(docs, "doc_id", "text", maxLcp = cap)
      .as[(Long, Long, Boolean)].collect().map(r => r._1 -> ((r._2, r._3))).toMap
    texts.keys.foreach { i =>
      val truth = texts.keys.filter(_ != i).map(j => lcs(texts(i), texts(j))).max
      val expectLen = math.min(truth, cap).toLong
      val expectCap = truth > cap
      assert(out(i) == ((expectLen, expectCap)),
        s"doc $i: got ${out(i)}, brute LCS says $truth -> ($expectLen, $expectCap)")
    }
    // the cap-aware path really did SKIP resolution: the 300-char shared
    // run leaves seed buckets tied in the capped rank table, while the
    // default full resolution clears every non-identical tie
    import org.apache.spark.sql.functions.col
    val cappedTies = SuffixArray.corpusRanksResolved(docs, "doc_id", "text", resolveLcp = cap)
      .filter(!col("resolved")).count()
    val fullTies = SuffixArray.corpusRanksResolved(docs, "doc_id", "text")
      .filter(!col("resolved")).count()
    assert(cappedTies > 0L, "seed-tied fixture must leave ties under the cap")
    assert(fullTies < cappedTies,
      s"full resolution should clear seed ties ($fullTies vs $cappedTies)")
  }

  test("longestRepeat: banana has 'ana' (3); unique-char docs report 0; none capped") {
    val out = SuffixArray.longestRepeat(
      Seq((1L, "banana"), (2L, "abcdef"), (3L, "x")).toDF("doc_id", "text"),
      "doc_id", "text")
      .as[(Long, Long, Boolean)].collect().map(r => r._1 -> ((r._2, r._3))).toMap
    assert(out == Map(1L -> ((3L, false)), 2L -> ((0L, false)), 3L -> ((0L, false))),
      s"got $out")
  }

  test("longestRepeat: maxLcp caps a longer repeat at the cap AND flags it") {
    val df = Seq((1L, "abcdefgh abcdefgh")).toDF("doc_id", "text")
    val full = SuffixArray.longestRepeat(df, "doc_id", "text")
      .as[(Long, Long, Boolean)].collect().map(r => r._1 -> ((r._2, r._3))).toMap
    assert(full(1L) == ((8L, false)), s"true LRS is 'abcdefgh' (8), uncapped, got $full")
    val capped = SuffixArray.longestRepeat(df, "doc_id", "text", maxLcp = 3)
      .as[(Long, Long, Boolean)].collect().map(r => r._1 -> ((r._2, r._3))).toMap
    assert(capped(1L) == ((3L, true)), s"cap must bound the report and flag it, got $capped")
  }

  test("longestRepeat: capped=false when the report EQUALS the cap exactly") {
    // repeat 'abc' (3) with maxLcp = 3: the shorter suffix exhausts at the
    // cap boundary — 'abc abc': suffix at 4 has remainder exactly 3, all
    // matched, so the true LRS IS 3; no truncation happened
    val out = SuffixArray.longestRepeat(
      Seq((1L, "abc abc")).toDF("doc_id", "text"), "doc_id", "text", maxLcp = 3)
      .as[(Long, Long, Boolean)].collect().map(r => r._1 -> ((r._2, r._3))).toMap
    assert(out(1L) == ((3L, false)),
      s"shorter-suffix exhaustion at the cap is exact, not truncated: $out")
  }
}
