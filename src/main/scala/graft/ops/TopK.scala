package graft.ops

import scala.collection.mutable

import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Exact per-group top-k WITHOUT a per-group sort: the scale path for
  * "the k best rows of each group" when groups are large.
  *
  * The window formulation (`row_number() over (partition by g order by v)
  * <= k` — q_o7_topk's shape) sorts EVERY group's rows inside the
  * exchange; at 100 TB that is a full shuffle-and-sort of the fact table
  * to keep k rows per group. Here, per-partition bounded heaps (the
  * [[HeavyHitters]]/[[Kmv]] discipline) reduce each task to ≤ groups × k
  * candidate tuples, the global winners are selected from that bounded
  * candidate relation, and ONE broadcast-semi join recovers the full
  * original rows — the fact table is scanned twice but never sorted and
  * never shuffled.
  *
  * Exactness: a group's global top-k rows are each in their partition's
  * top-k (anything that beats them globally beats them locally), so the
  * candidate union is a superset of the answer; the final window runs
  * over ≤ partitions × k rows per group. `tiebreakCol` must be unique
  * within a group (an id) — it makes the answer deterministic AND keys
  * the semi-join. Rows with NULL order values are excluded, matching
  * `ORDER BY v DESC ... LIMIT k` semantics on the engines the oracle runs.
  *
  * Ordering compares the order column as DOUBLE (exact for integers up to
  * 2^53) descending when `descending`, ties to the LEAST tiebreak.
  */
object TopK {

  /** @param broadcastWinners true (default) broadcasts the winner-key set
    *   into the recovery join — right for the usual "bounded groups" case
    *   (winners = groups × k rows). Set false when the group domain itself
    *   is huge and the winner set would not fit a broadcast; the recovery
    *   then runs as a keyed semi-join.
    */
  def groupTopK(
      df: DataFrame,
      groupCol: String,
      orderCol: String,
      tiebreakCol: String,
      k: Int,
      descending: Boolean = true,
      broadcastWinners: Boolean = true): DataFrame = {
    require(k >= 1, s"k must be >= 1, got $k")
    val spark = df.sparkSession
    import spark.implicits._

    val sign = if (descending) -1.0 else 1.0
    // `+ 0.0` canonicalizes -0.0 to +0.0: Spark SQL treats them as EQUAL in
    // the final window's sort while a raw JVM total ordering would not — a
    // (0.0 vs -0.0) tie must resolve by tiebreak identically in the heap
    // and in the window or the heap could evict the window's pick.
    val slim = df
      .filter(col(groupCol).isNotNull && col(orderCol).isNotNull &&
        col(tiebreakCol).isNotNull)
      .select(
        col(groupCol).cast("string").as("g"),
        (col(orderCol).cast("double") * sign + lit(0.0)).as("v"),
        col(tiebreakCol).cast("string").as("tb"))
      .as[(String, Double, String)]

    // per-partition bounded heaps: worst element on top, evict on overflow.
    // The heap MUST use the same ordering the final window applies:
    // TotalOrdering for doubles (NaN greatest, matching Spark's sort), and
    // UTF-8 BINARY order for the tiebreak (Spark compares UTF8String bytes;
    // Java String.compareTo is UTF-16 code-unit order, which disagrees once
    // supplementary-plane characters meet U+E000..U+FFFF).
    // tiebreaks are encoded to UTF-8 ONCE at insertion and compared as
    // bytes in the heap — both to match Spark's binary string order and to
    // avoid re-encoding on every sift comparison
    val byteOrd: Ordering[Array[Byte]] =
      (a: Array[Byte], b: Array[Byte]) => java.util.Arrays.compareUnsigned(a, b)
    val candidates = slim.mapPartitions { it =>
      val ord = Ordering.Tuple2(Ordering.Double.TotalOrdering, byteOrd)
      val heaps =
        mutable.HashMap.empty[String, mutable.PriorityQueue[(Double, Array[Byte])]]
      it.foreach { case (g, v, tb) =>
        val h = heaps.getOrElseUpdate(
          g, mutable.PriorityQueue.empty[(Double, Array[Byte])](ord))
        val e = (v, tb.getBytes(java.nio.charset.StandardCharsets.UTF_8))
        if (h.size < k) h.enqueue(e)
        else if (ord.lt(e, h.head)) { h.dequeue(); h.enqueue(e) }
      }
      heaps.iterator.flatMap { case (g, h) =>
        h.iterator.map { case (v, tb) =>
          (g, v, new String(tb, java.nio.charset.StandardCharsets.UTF_8))
        }
      }
    }.toDF("g", "v", "tb")

    val w = Window.partitionBy(col("g")).orderBy(col("v"), col("tb"))
    val winners = candidates
      .withColumn("_rn", row_number().over(w))
      .filter(col("_rn") <= k)
      .select(col("g").as("_tk_g"), col("tb").as("_tk_tb"))

    val right = if (broadcastWinners) broadcast(winners) else winners
    df.join(
      right,
      col(groupCol).cast("string") === col("_tk_g") &&
        col(tiebreakCol).cast("string") === col("_tk_tb"),
      "left_semi")
  }
}
