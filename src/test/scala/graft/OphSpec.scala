package graft

import org.apache.spark.sql.functions._

import graft.ops.Dedup

/** One-permutation MinHash ([[Dedup.ophSignatures]]/[[Dedup.ophLshPairs]]):
  * the signature arithmetic is re-derived on the driver from first
  * principles (shingle → one 32-bit md5 → bucket min → rotation
  * densification) and compared slot-for-slot against the column-expression
  * implementation over the real sf0.001 corpus, so the array-expression
  * pipeline and the published scheme can only agree by computing the same
  * thing. Edge behavior (short docs, NULL text, identical docs) is pinned
  * separately.
  */
class OphSpec extends SparkSpec {

  import spark.implicits._

  private val K = 8

  private def md5Long32(s: String): Long =
    java.lang.Long.parseLong(
      java.security.MessageDigest.getInstance("MD5")
        .digest(s.getBytes(java.nio.charset.StandardCharsets.UTF_8))
        .take(4).map("%02x".format(_)).mkString,
      16)

  /** Independent driver-side OPH: distinct shingles, one hash each, bucket
    * minima, circular-right borrow with +distance shift.
    */
  private def expectedSlots(text: String): Seq[Option[Long]] = {
    val hs = Dedup.shinglesOf(text, 3).distinct.map(md5Long32)
    val mins = (0 until K).map(j => hs.filter(_ % K == j) match {
      case Nil => None
      case xs  => Some(xs.min)
    })
    (0 until K).map { j =>
      (0 until K).iterator
        .map(off => mins((j + off) % K).map(_ + off))
        .collectFirst { case Some(v) => v }
    }
  }

  test("ophSignatures ≡ first-principles recomputation over the sf0.001 corpus") {
    val docs = spark.read.parquet(sf("documents"))
    val got = Dedup.ophSignatures(docs, "doc_id", "text", K)
      .collect()
      .map(r => r.getLong(0) ->
        (1 to K).map(i => if (r.isNullAt(i)) None else Some(r.getLong(i))))
      .toMap
    val texts = docs.select("doc_id", "text").as[(Long, String)].collect()
    assert(texts.nonEmpty)
    texts.foreach { case (id, text) =>
      assert(got(id) == expectedSlots(text), s"doc $id signature diverged")
    }
  }

  test("short document: borrowed slots are non-null and carry the +distance shift") {
    val df = Seq((1L, "alpha beta")).toDF("doc_id", "text")
    val row = Dedup.ophSignatures(df, "doc_id", "text", K).head()
    val slots = (1 to K).map(row.getLong)
    // one shingle → exactly one native bucket; every other slot borrows it
    val h = md5Long32("alpha beta")
    val native = (h % K).toInt
    (0 until K).foreach { j =>
      val dist = (native - j + K) % K
      assert(slots(j) == h + dist, s"slot $j: expected borrow distance $dist")
    }
  }

  test("NULL text yields NULL slots in signatures and is excluded from pairs") {
    val df = Seq((1L, Option.empty[String]), (2L, Some("a b c d e f g h")))
      .toDF("doc_id", "text")
    val sig = Dedup.ophSignatures(df, "doc_id", "text", K)
      .filter(col("doc_id") === 1L).head()
    (1 to K).foreach(i => assert(sig.isNullAt(i), s"slot ${i - 1} should be NULL"))
    assert(Dedup.ophLshPairs(df, "doc_id", "text", K, bands = 2).count() == 0L)
  }

  test("identical docs collide on every band; disjoint docs never pair") {
    val df = Seq(
      (1L, "the quick brown fox jumps over the lazy dog again and again"),
      (2L, "the quick brown fox jumps over the lazy dog again and again"),
      (3L, "completely different content with other words entirely here now"))
      .toDF("doc_id", "text")
    val pairs = Dedup.ophLshPairs(df, "doc_id", "text", K, bands = 2)
      .as[(Long, Long)].collect().toSet
    assert(pairs == Set((1L, 2L)))
  }
}
