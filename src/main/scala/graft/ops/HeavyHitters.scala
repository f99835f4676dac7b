package graft.ops

import scala.collection.mutable

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._

/** Heavy hitters (frequent items) with EXACT counts in bounded memory:
  * per-partition Misra-Gries summaries, then an exact recount of the
  * candidate union.
  *
  * Why not `groupBy(item).count().filter(...)`: at 100 TB of tokens the full
  * groupBy shuffles ONE ROW PER DISTINCT ITEM — a web-scale vocabulary is
  * billions of keys, almost all of which are below any useful threshold.
  * Misra-Gries bounds each task's state to `k` counters and the shuffle to
  * `numPartitions × k` candidate rows, after which only the (tiny) candidate
  * set is recounted exactly.
  *
  * Correctness of the candidate set: a per-partition Misra-Gries summary
  * with `k` counters retains every item whose partition count exceeds
  * `n_p / k`. An item with global count > `n / k = Σ n_p / k` must exceed
  * `n_p / k` in at least one partition, so it survives in that partition's
  * summary — the union is a SUPERSET of the true heavy hitters. The recount
  * pass restores exact counts (MG counts alone are lower bounds), and the
  * final `count · k > n` filter makes the output independent of
  * partitioning: exactly the items with frequency > 1/k, exact counts.
  */
object HeavyHitters {

  /** Per-partition Misra-Gries candidate emission over a Dataset of items. */
  private def candidates(items: Dataset[String], k: Int): DataFrame = {
    import items.sparkSession.implicits._
    items.mapPartitions { it =>
      val counters = mutable.HashMap.empty[String, Long]
      it.foreach { item =>
        counters.get(item) match {
          case Some(c) => counters.update(item, c + 1)
          case None if counters.size < k => counters.update(item, 1L)
          case None =>
            // decrement-all; O(k) amortized against the k increments it undoes
            val dead = mutable.ArrayBuffer.empty[String]
            counters.foreach { case (t, c) =>
              if (c == 1L) dead += t else counters.update(t, c - 1)
            }
            dead.foreach(counters.remove)
        }
      }
      counters.keysIterator
    }.toDF("item").distinct()
  }

  /** Items of `itemCol` with frequency strictly greater than `1/k` of all
    * NON-NULL items, with their EXACT counts: `(item, cnt)`. NULLs are
    * excluded on both sides of the ratio — they can't ride the semi-join or
    * the MG counters, and counting them in `n` alone would silently inflate
    * the threshold against every real item. Deterministic — the result does
    * not depend on partitioning (see class doc).
    */
  def frequent(df: DataFrame, itemCol: String, k: Int): DataFrame = {
    require(k >= 2, s"k must be >= 2, got $k")
    import df.sparkSession.implicits._
    val items = df.select(col(itemCol).cast("string"))
      .filter(col(itemCol).isNotNull).as[String]
    val n = items.count()
    val cand = candidates(items, k)
    items.toDF("item")
      .join(broadcast(cand), Seq("item"), "left_semi")
      .groupBy("item")
      .agg(count(lit(1)).as("cnt"))
      .filter(col("cnt") * k > n)
  }

  /** Whitespace-token heavy hitters over a text column — the corpus-level
    * "which tokens dominate" report at bounded memory. Same tokenization as
    * [[TextAnalysis.topTokensPerGroup]] (trim, lower, split on `\s+`, drop
    * empties).
    */
  def frequentTokens(df: DataFrame, textCol: String, k: Int): DataFrame =
    frequent(
      df.select(explode(split(trim(lower(col(textCol))), "\\s+")).as("token"))
        .filter(col("token") =!= ""),
      "token", k)
      .withColumnRenamed("item", "token")
}
