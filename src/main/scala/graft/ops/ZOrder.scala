package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Z-order (Morton-curve) clustering for multi-dimension data skipping.
  *
  * A lake sorted linearly on one column skips files only for predicates on
  * THAT column — every file still spans the full range of every other
  * column. Writing in Z-order interleaves the bits of several columns'
  * quantized ranks, so each output file covers a small hyper-rectangle and
  * file-level min/max stats ([[graft.sources.DataSkipping]]) prune scans on
  * ANY of the clustered columns. This is the standard lakehouse OPTIMIZE
  * ZORDER BY, built from plain column expressions.
  *
  * Everything is codegen-friendly arithmetic (shift/and/sum — no UDF). The
  * quantization needs each column's [min, max], computed in one small
  * aggregate; the write is one range repartition on the z-key — a single
  * shuffle, the same cost as any global sort, paid once at write time.
  */
object ZOrder {

  /** Quantize `c` to an integer rank in [0, 2^bits): scale by the column's
    * [lo, hi] span, clamp, floor. Constant columns (hi == lo) rank 0.
    */
  private def quantize(c: Column, lo: Double, hi: Double, bits: Int): Column = {
    val buckets = (1L << bits) - 1
    if (hi <= lo) lit(0L)
    else least(
      greatest(
        floor((c.cast("double") - lit(lo)) / lit(hi - lo) * lit(buckets.toDouble)).cast("long"),
        lit(0L)),
      lit(buckets))
  }

  /** Interleave the low `bits` bits of the quantized columns round-robin —
    * column j's bit i lands at position `i * n + (n - 1 - j)` so the most
    * significant bits of all dimensions lead the key. `bits * n` must fit a
    * long (≤ 63).
    */
  def zkey(quantized: Seq[Column], bits: Int): Column = {
    val n = quantized.size
    require(n >= 1, "need at least one column")
    require(bits * n <= 63, s"bits * cols = ${bits * n} exceeds a long")
    val terms =
      for {
        (q, j) <- quantized.zipWithIndex
        i <- 0 until bits
      } yield shiftleft(shiftright(q, i).bitwiseAND(lit(1L)), i * n + (n - 1 - j))
    terms.reduce(_ + _)
  }

  /** Compute the z-key for `cols` of `df` (numeric), quantized to `bits`
    * bits each against their observed [min, max]. One tiny driver-side
    * aggregate for the spans; the key itself is pure row-local arithmetic.
    */
  def withZKey(df: DataFrame, cols: Seq[String], bits: Int = 8): DataFrame = {
    val aggs = cols.flatMap(c =>
      Seq(min(col(c).cast("double")).as(s"min_$c"), max(col(c).cast("double")).as(s"max_$c")))
    val spans = df.agg(aggs.head, aggs.tail: _*).head()
    val quantized = cols.zipWithIndex.map { case (c, j) =>
      // empty input or an all-NULL column has no span — name the culprit
      // instead of surfacing a bare NPE from the driver
      require(!spans.isNullAt(2 * j) && !spans.isNullAt(2 * j + 1),
        s"cannot z-order on '$c': no non-null values (empty input or all-NULL column)")
      quantize(col(c), spans.getDouble(2 * j), spans.getDouble(2 * j + 1), bits)
    }
    df.withColumn("__zkey", zkey(quantized, bits))
  }

  /** Write `df` as `nFiles` z-ordered parquet files: range-repartition on
    * the z-key (each file = one contiguous z-range = one small
    * hyper-rectangle over `cols`), sort within partitions for row-group
    * locality, drop the key.
    */
  def writeZOrdered(
      df: DataFrame,
      cols: Seq[String],
      path: String,
      nFiles: Int,
      bits: Int = 8): Unit = {
    require(nFiles > 0, s"nFiles must be positive, got $nFiles")
    withZKey(df, cols, bits)
      .repartitionByRange(nFiles, col("__zkey"))
      .sortWithinPartitions("__zkey")
      .drop("__zkey")
      .write.mode("overwrite").parquet(path)
  }
}
