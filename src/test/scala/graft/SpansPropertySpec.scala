package graft

import graft.ops.Dedup

/** Randomized cross-validation of the repeated-span family against an
  * independent in-memory reference implementation: small alphabets force
  * heavy window collisions, so random corpora exercise island merging,
  * multi-doc thresholds, and boundary cases far beyond the fixed fixtures
  * (the ConnectedComponents 30-random-graph regression pattern).
  */
class SpansPropertySpec extends SparkSpec {

  import spark.implicits._

  /** Brute-force reference: token-tuple windows (no hashing — collisions
    * are impossible by construction, which independently checks that the
    * production md5-of-joined-tokens key never aliases), distinct-doc
    * counting, and a simple linear island merge.
    */
  private def reference(
      docs: Seq[(Long, String)],
      w: Int,
      minDocs: Int): Set[(Long, Int, Int)] = {
    val toks = docs.map { case (id, t) =>
      id -> t.trim.toLowerCase.split("\\s+").filter(_.nonEmpty).toSeq
    }
    val windows = toks.flatMap { case (id, ts) =>
      if (ts.length < w) Seq.empty
      else (0 to ts.length - w).map(i => (id, i, ts.slice(i, i + w)))
    }
    val byKey = windows.groupBy(_._3).view.mapValues(_.map(_._1).distinct.size).toMap
    val flagged = windows.filter { case (_, _, key) => byKey(key) >= minDocs }
    flagged.groupBy(_._1).toSeq.flatMap { case (id, hits) =>
      val starts = hits.map(_._2).distinct.sorted
      val spans = scala.collection.mutable.ArrayBuffer.empty[(Int, Int)]
      starts.foreach { s =>
        if (spans.nonEmpty && s <= spans.last._2) {
          val (a, _) = spans.remove(spans.length - 1); spans += ((a, s + w))
        } else spans += ((s, s + w))
      }
      spans.map { case (a, b) => (id, a, b) }
    }.toSet
  }

  test("repeatedSpans equals the brute-force reference on 25 random collision-heavy corpora") {
    val rnd = new scala.util.Random(20260813L)
    val alphabet = Seq("a", "b", "c", "d", "e", "f")
    (1 to 25).foreach { trial =>
      val w = 2 + rnd.nextInt(3)       // windows of 2..4 tokens
      val minDocs = 2 + rnd.nextInt(2) // threshold 2 or 3
      val docs = (0 until 6).map { id =>
        val n = rnd.nextInt(18)
        (id.toLong, (0 until n).map(_ => alphabet(rnd.nextInt(alphabet.size))).mkString(" "))
      }
      val got = Dedup.repeatedSpans(docs.toDF("doc_id", "text"), "doc_id", "text",
          windowTokens = w, minDocs = minDocs)
        .collect().map(r => (r.getLong(0), r.getInt(1), r.getInt(2))).toSet
      val want = reference(docs, w, minDocs)
      assert(got === want, s"trial $trial (w=$w minDocs=$minDocs) docs=$docs")
    }
  }

  test("incremental == batch partition identity on random corpora") {
    val rnd = new scala.util.Random(4242L)
    val alphabet = Seq("x", "y", "z", "w")
    (1 to 10).foreach { trial =>
      val docs = (0 until 8).map { id =>
        val n = rnd.nextInt(14)
        (id.toLong, (0 until n).map(_ => alphabet(rnd.nextInt(alphabet.size))).mkString(" "))
      }
      val (hist, batch) = docs.partition(_._1 % 2 == 0)
      val histHashes = Dedup.windowRows(hist.toDF("doc_id", "text"), "doc_id", "text", 2)
        .select("win_hash").distinct()
      val got = Dedup.repeatedSpansAgainstHistory(
          batch.toDF("doc_id", "text"), histHashes, "doc_id", "text", windowTokens = 2)
        .collect().map(r => (r.getLong(0), r.getInt(1), r.getInt(2))).toSet
      // reference: batch spans flagged by (history windows ∪ batch dups).
      // Model history as one pseudo-doc per window occurrence — a window in
      // history makes any single batch occurrence cross-doc.
      val histWins = hist.flatMap { case (_, t) =>
        val ts = t.trim.toLowerCase.split("\\s+").filter(_.nonEmpty).toSeq
        if (ts.length < 2) Seq.empty else (0 to ts.length - 2).map(i => ts.slice(i, i + 2))
      }.toSet
      val batchToks = batch.map { case (id, t) =>
        id -> t.trim.toLowerCase.split("\\s+").filter(_.nonEmpty).toSeq
      }
      val batchWins = batchToks.flatMap { case (id, ts) =>
        if (ts.length < 2) Seq.empty else (0 to ts.length - 2).map(i => (id, i, ts.slice(i, i + 2)))
      }
      val byKey = batchWins.groupBy(_._3).view.mapValues(_.map(_._1).distinct.size).toMap
      val flagged = batchWins.filter { case (_, _, k) => histWins(k) || byKey(k) >= 2 }
      val want = flagged.groupBy(_._1).toSeq.flatMap { case (id, hits) =>
        val starts = hits.map(_._2).distinct.sorted
        val spans = scala.collection.mutable.ArrayBuffer.empty[(Int, Int)]
        starts.foreach { s =>
          if (spans.nonEmpty && s <= spans.last._2) {
            val (a, _) = spans.remove(spans.length - 1); spans += ((a, s + 2))
          } else spans += ((s, s + 2))
        }
        spans.map { case (a, b) => (id, a, b) }
      }.toSet
      assert(got === want, s"trial $trial docs=$docs")
    }
  }

  test("sub-window: a 30-token duplicate invisible at windowTokens=50 is found exactly") {
    // a shared 30-token run inside two longer documents, plus a 30-token
    // document that IS the run (shorter than the indexing window — the
    // fixed-window explode skips it outright)
    val run = (0 until 30).map(i => s"r$i")
    val docA = ((0 until 20).map(i => s"a$i") ++ run ++ (0 until 20).map(i => s"za$i")).mkString(" ")
    val docB = ((0 until 15).map(i => s"b$i") ++ run ++ (0 until 25).map(i => s"zb$i")).mkString(" ")
    val docC = run.mkString(" ")
    val docs = Seq((1L, docA), (2L, docB), (3L, docC)).toDF("doc_id", "text")
    // the fixed 50-token indexing window is structurally blind to all of it
    assert(Dedup.repeatedSpans(docs, "doc_id", "text", windowTokens = 50).count() === 0L)
    // threshold-grain detection finds every occurrence with exact extents
    val got = Dedup.repeatedSpansExact(docs, "doc_id", "text", minMatchTokens = 30)
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getInt(2))).toSet
    assert(got === Set((1L, 20, 50), (2L, 15, 45), (3L, 0, 30)))
    // ...and nothing below the threshold: at minMatch=31 the 30-token run
    // must vanish again (no 31-token window fits inside it)
    assert(Dedup.repeatedSpansExact(docs, "doc_id", "text", minMatchTokens = 31).count() === 0L)
  }

  test("repeatedSpansExact == repeatedSpans == reference at equal grain (15 random corpora)") {
    val rnd = new scala.util.Random(77L)
    val alphabet = Seq("a", "b", "c", "d", "e")
    (1 to 15).foreach { trial =>
      val w = 2 + rnd.nextInt(3)
      val minDocs = 2 + rnd.nextInt(2)
      val docs = (0 until 6).map { id =>
        val n = rnd.nextInt(16)
        (id.toLong, (0 until n).map(_ => alphabet(rnd.nextInt(alphabet.size))).mkString(" "))
      }
      val df = docs.toDF("doc_id", "text")
      val exactSpans = Dedup.repeatedSpansExact(df, "doc_id", "text", w, minDocs)
        .collect().map(r => (r.getLong(0), r.getInt(1), r.getInt(2))).toSet
      val want = reference(docs, w, minDocs)
      assert(exactSpans === want,
        s"trial $trial (w=$w minDocs=$minDocs) docs=$docs")
    }
  }
}
