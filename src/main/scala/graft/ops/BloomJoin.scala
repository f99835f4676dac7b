package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.catalyst.expressions.{BloomFilterMightContain, Literal, XxHash64}
import org.apache.spark.sql.catalyst.expressions.aggregate.BloomFilterAggregate
import org.apache.spark.sql.functions._
import org.apache.spark.sql.graft.ColumnBridge
import org.apache.spark.sql.types.BinaryType

/** Bloom-filter join pruning: drop fact rows whose key cannot exist on the
  * dimension side BEFORE the join's shuffle moves them.
  *
  * This is Spark's own runtime-filter pattern (`InjectRuntimeFilter` builds
  * exactly this `BloomFilterAggregate` → `BloomFilterMightContain` pair for
  * selective broadcast joins) made explicit, so it applies when the
  * optimizer won't inject it: a non-broadcast dim, a pre-shuffled fact, a
  * fact reused across several prunes. At 100 TB the exchange is the cost
  * center — a 1% -selective dim key means ~99% of fact bytes shuffled into
  * the join are dropped on arrival; the bloom drops them at the scan, and
  * the sketch itself is a few MB broadcast as a plan literal.
  *
  * Exactness: a Bloom filter has false positives but NO false negatives, so
  * pre-filtering never loses a matching row, and the join's own equi-
  * condition re-verifies survivors — the result is row-for-row identical to
  * the unfiltered join. Both sides hash with `XxHash64`, matching what the
  * aggregate stored.
  */
object BloomJoin {

  /** Serialized Bloom sketch over `key` of `dim` (one tiny aggregate job —
    * the "build" side; reusable across many [[prefilter]] calls).
    */
  def buildFilter(dim: DataFrame, key: String, expectedItems: Long, numBits: Long): Array[Byte] = {
    val agg = new BloomFilterAggregate(
      new XxHash64(Seq(ColumnBridge.expression(col(key)))),
      Literal(expectedItems), Literal(numBits))
    dim.select(ColumnBridge.column(agg.toAggregateExpression()).as("bf"))
      .head().getAs[Array[Byte]](0)
  }

  /** `might_contain(bloom, xxhash64(key))` as a filter column. */
  def mightContain(bloom: Array[Byte], key: Column): Column =
    ColumnBridge.column(BloomFilterMightContain(
      Literal(bloom, BinaryType),
      new XxHash64(Seq(ColumnBridge.expression(key)))))

  /** `fact` reduced to rows whose `factKey` is probably in `dim.dimKey` —
    * a lossless pre-shuffle semi-join approximation (false positives pass
    * through; the downstream join removes them).
    */
  def prefilter(
      fact: DataFrame,
      dim: DataFrame,
      factKey: String,
      dimKey: String,
      expectedItems: Long = 1000000L,
      numBits: Long = 8388608L): DataFrame =
    fact.filter(mightContain(buildFilter(dim, dimKey, expectedItems, numBits), col(factKey)))

  /** Inner equi-join with the fact side bloom-pruned before the shuffle.
    * Result is identical to `fact.join(dim, factKey === dimKey)`.
    */
  def prefilteredJoin(
      fact: DataFrame,
      dim: DataFrame,
      factKey: String,
      dimKey: String,
      expectedItems: Long = 1000000L,
      numBits: Long = 8388608L): DataFrame =
    prefilter(fact, dim, factKey, dimKey, expectedItems, numBits)
      .join(dim, col(factKey) === col(dimKey), "inner")
}
