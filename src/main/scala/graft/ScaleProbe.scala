package graft

import org.apache.spark.sql.functions._

/** Scale-trend probe: times the dedup/text operators on the sf0.1 documents
  * table and on a 10x salted blow-up of it, and prints the wall-clock
  * ratios. The point is the SHAPE of the growth: keyed-shuffle operators
  * should scale ~linearly in rows (ratio well under 10 on a machine with
  * spare cores); anything quadratic in corpus size would show ~100x.
  *
  * Measured (local[32], min of 3): exact 1.1x, simhash 1.0x, quality 1.4x,
  * minhash 3.4x, lsh_pairs 3.6x — all sub-linear per row. ngram_jaccard
  * reads ~40x, which is the OUTPUT growing, not the algorithm: 10 salted
  * copies of every document make each block hold 45 near-dup pairs per
  * original (79 → 232 400 result pairs, ~3000x), and an inverted-index
  * set-similarity join costs by candidate pairs — i.e. by true duplicate
  * density, which this synthetic corpus inflates by construction. Real
  * corpora hold per-doc dup density ~constant, so the cost stays ~linear
  * in corpus size.
  *
  * The 10x corpus is synthesized under /tmp (never under /root/testdata):
  * each copy salts the text with a distinct token so near-dup structure is
  * preserved but contents differ across copies.
  */
object ScaleProbe {
  def main(args: Array[String]): Unit = {
    val spark = GraftSession.local()
    import spark.implicits._
    val base = "/root/testdata/sf0.1"
    val big = "/tmp/graft_scale10"

    if (!new java.io.File(s"$big/documents.parquet").exists()) {
      val docs = Tables(spark, base, "documents")
      val n = docs.agg(max("doc_id")).head().getLong(0) + 1
      val copies = (0 until 10).map { c =>
        docs.select(
          (col("doc_id") + lit(c * n)).as("doc_id"),
          concat(col("text"), lit(s" copysalt$c")).as("text"),
          col("lang"), (col("n_chars") + 10).as("n_chars"))
      }
      copies.reduce(_ unionByName _)
        .write.mode("overwrite").parquet(s"$big/documents.parquet")
      println(s"[scaleprobe] built 10x corpus at $big")
    }

    def docsAt(dir: String) = Tables(spark, dir, "documents")
    val ops: Seq[(String, String => Long)] = Seq(
      "exact" -> (d => graft.ops.Dedup.exact(docsAt(d), "doc_id", "text").count()),
      "minhash_sig" -> (d =>
        graft.ops.Dedup.minhashSignatures(docsAt(d), "doc_id", "text", numHashes = 4).count()),
      "lsh_pairs" -> (d =>
        graft.ops.Dedup.minhashLshPairs(docsAt(d), "doc_id", "text",
          numHashes = 8, bands = 2).count()),
      "simhash" -> (d => graft.ops.Dedup.simhash(docsAt(d), "doc_id", "text", bits = 16).count()),
      "ngram_jaccard" -> (d =>
        graft.ops.Dedup.ngramJaccardPairs(docsAt(d), "doc_id", "text",
          blockCols = Seq(col("lang"), (col("n_chars") / 100).cast("long")),
          n = 2, threshold = 0.2).count()),
      "tx_quality" -> (d =>
        graft.ops.TextAnalysis.qualityMetrics(docsAt(d), "doc_id", "text").count()))

    def time(f: => Long): (Double, Long) = {
      val t0 = System.nanoTime(); val n = f; ((System.nanoTime() - t0) / 1e9, n)
    }
    ops.foreach { case (name, f) =>
      f(base) // warm codegen on the small side
      val (t1, n1) = (1 to 3).map(_ => time(f(base))).minBy(_._1)
      val (t10, n10) = (1 to 3).map(_ => time(f(big))).minBy(_._1)
      println(f"[scaleprobe] $name%-14s 1x: $t1%6.2fs ($n1%8d rows)  " +
        f"10x: $t10%6.2fs ($n10%8d rows)  ratio: ${t10 / t1}%5.1f")
    }
    spark.stop()
  }
}
