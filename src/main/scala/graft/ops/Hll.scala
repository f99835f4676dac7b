package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** HyperLogLog distinct counting (Flajolet et al. 2007) built from
  * deterministic relational pieces, so unlike the engine-internal
  * `approx_count_distinct` the whole sketch — registers AND estimate — is
  * hash-exact across engines and DuckDB-oracle-checkable
  * (q_hll_registers / q_hll_estimate; the grouped form
  * [[estimateByGroup]] replaces `approx_count_distinct` in
  * q_x_approx_distinct, turning the last HLL-adjacent rows-only oracle
  * row into a full hash match).
  *
  * Reference analog: the reference counts distinct devices per day with a
  * full distinct pass (`/root/reference/atd_data_lake/perfmet.py`); this
  * is the bounded-memory sketch replacement whose registers stream and
  * merge.
  *
  * Construction (width 60: the md5-prefix hash the KMV sketch already
  * uses — 15 hex chars never overflow a signed 64-bit):
  *
  *   - `bucket = h >> (60 - p)` — the top p bits;
  *   - `rank   = (60-p) − msb(rest) + 1` where `rest` is the low
  *     `60-p` bits and `msb` via `length(ltrim(bin(rest), '0'))` — pure
  *     integer/string ops, so no float-rounding hazard at power-of-two
  *     boundaries (`bin` pads differently across engines; `ltrim('0')`
  *     normalizes both);
  *   - estimate: `α_m · m² / Σ 2^−M_j`. The sum is the classic
  *     order-dependency trap — each term is an exact power of two, but
  *     their DOUBLE sum needs up to `60 + log₂(m)` bits of window. It is
  *     instead summed as `Σ 2^(60−M_j)` in DECIMAL(38,0) — every term
  *     exact, the sum exact, fold order irrelevant — and the single final
  *     division happens in DOUBLE. Linear counting below 2.5m with empty
  *     registers present, per the paper. (The 2^60-scale large-range
  *     correction is out of scope at this hash width — documented, not
  *     guarded.)
  *
  * Scale shape: registers are ONE map-side-combinable hash aggregate
  * (max per bucket) — 2^p rows out regardless of input size; the
  * estimate adds a broadcast-spine left join over 2^p rows. Registers
  * MERGE by per-bucket max, which is what makes the sketch streamable
  * ([[mergeRegisters]] + the StreamingSpec twin — the CMS pattern).
  */
object Hll {

  private val Width = 60

  private def hash60(c: Column): Column =
    conv(substring(md5(concat(lit("hll:"), c.cast("string"))), 1, 15), 16, 10)
      .cast("long")

  /** The register table: `(bucket, m_rank)` — one row per NON-EMPTY
    * bucket (≤ 2^p rows), `m_rank` the maximum leading-zero rank observed.
    * NULL values are excluded (a NULL is not an element).
    */
  def registers(df: DataFrame, valueCol: String, p: Int): DataFrame = {
    require(p >= 4 && p <= 16, s"p must be in [4,16], got $p")
    val rest = Width - p
    val h = hash60(col(valueCol))
    val restBits = h.bitwiseAND(lit((1L << rest) - 1L))
    val msb = length(ltrim(bin(restBits), "0"))
    df.filter(col(valueCol).isNotNull)
      .select(
        shiftright(h, rest).as("bucket"),
        (lit(rest) - msb + 1).cast("long").as("_rank"))
      .groupBy("bucket")
      .agg(max(col("_rank")).as("m_rank"))
  }

  /** Merge two register tables (per-bucket max) — the sketch's union. */
  def mergeRegisters(a: DataFrame, b: DataFrame): DataFrame =
    a.unionByName(b).groupBy("bucket").agg(max(col("m_rank")).as("m_rank"))

  /** Cardinality estimate from a register table: one row
    * `(n_buckets, v_empty, est)`. `p` must match [[registers]]'. */
  def estimateFromRegisters(regs: DataFrame, p: Int): DataFrame = {
    require(p >= 4 && p <= 16, s"p must be in [4,16], got $p")
    val spark = regs.sparkSession
    val m = 1 << p
    val alpha =
      if (m >= 128) 0.7213 / (1.0 + 1.079 / m)
      else if (m == 64) 0.709
      else if (m == 32) 0.697
      else 0.673
    val spine = spark.range(m).select(col("id").as("bucket"))
    spine.join(regs, Seq("bucket"), "left")
      .select(coalesce(col("m_rank"), lit(0L)).as("mr"))
      .agg(
        count(lit(1)).as("n_buckets"),
        sum((col("mr") === 0L).cast("long")).as("v_empty"),
        // Σ 2^(60 − M_j): every term an exact power of two, summed in
        // DECIMAL(38,0) (max 2^60·m ≈ 3e20 ≪ 1e38) — order-free exact
        sum(pow(lit(2.0), lit(Width.toDouble) - col("mr").cast("double"))
          .cast("decimal(38,0)")).as("s"))
      .select(col("n_buckets"), col("v_empty"),
        floor(
          when(
            lit(alpha) * lit(m.toDouble * m) * lit(math.pow(2.0, Width)) /
              col("s").cast("double") <= lit(2.5 * m) && col("v_empty") > 0L,
            lit(m.toDouble) * log(lit(m.toDouble) / col("v_empty").cast("double")))
            .otherwise(
              lit(alpha) * lit(m.toDouble * m) * lit(math.pow(2.0, Width)) /
                col("s").cast("double"))
            + lit(0.5)).cast("long").as("est"))
  }

  /** [[registers]] + [[estimateFromRegisters]] in one call. */
  def estimate(df: DataFrame, valueCol: String, p: Int): DataFrame =
    estimateFromRegisters(registers(df, valueCol, p), p)

  /** Grouped register table: `(groupCol, bucket, m_rank)` — one row per
    * (group, non-empty bucket), ≤ groups·2^p rows. NULL groups and NULL
    * values are excluded. Same one map-side-combinable aggregate shape as
    * [[registers]], keyed on (group, bucket).
    */
  def registersByGroup(
      df: DataFrame, groupCol: String, valueCol: String, p: Int): DataFrame = {
    require(p >= 4 && p <= 16, s"p must be in [4,16], got $p")
    val rest = Width - p
    val h = hash60(col(valueCol))
    val restBits = h.bitwiseAND(lit((1L << rest) - 1L))
    val msb = length(ltrim(bin(restBits), "0"))
    df.filter(col(valueCol).isNotNull && col(groupCol).isNotNull)
      .select(
        col(groupCol),
        shiftright(h, rest).as("bucket"),
        (lit(rest) - msb + 1).cast("long").as("_rank"))
      .groupBy(col(groupCol), col("bucket"))
      .agg(max(col("_rank")).as("m_rank"))
  }

  /** Per-group cardinality estimate — the fully-oracled replacement for
    * `groupBy(g).agg(approx_count_distinct(v))` (whose HLL++ registers an
    * external engine cannot reproduce). One row per group:
    * `(groupCol, n_buckets, v_empty, est)`. The empty-bucket spine is
    * `distinct groups × 2^p` — group-bounded, never corpus-bounded; the
    * estimate arithmetic is identical to [[estimateFromRegisters]]
    * (DECIMAL-exact register sum, one final double divide, linear
    * counting below 2.5m). A group whose every value is NULL emits
    * NOTHING (the spine derives from non-empty registers) — unlike the
    * engine-internal `approx_count_distinct`, which would report 0; a
    * caller needing the zero rows left-joins this against its group
    * dimension.
    */
  def estimateByGroup(
      df: DataFrame, groupCol: String, valueCol: String, p: Int): DataFrame = {
    require(p >= 4 && p <= 16, s"p must be in [4,16], got $p")
    val spark = df.sparkSession
    val m = 1 << p
    val alpha =
      if (m >= 128) 0.7213 / (1.0 + 1.079 / m)
      else if (m == 64) 0.709
      else if (m == 32) 0.697
      else 0.673
    val regs = registersByGroup(df, groupCol, valueCol, p)
    val spine = regs.select(col(groupCol)).distinct()
      .crossJoin(spark.range(m).select(col("id").as("bucket")))
    spine.join(regs, Seq(groupCol, "bucket"), "left")
      .select(col(groupCol), coalesce(col("m_rank"), lit(0L)).as("mr"))
      .groupBy(col(groupCol))
      .agg(
        count(lit(1)).as("n_buckets"),
        sum((col("mr") === 0L).cast("long")).as("v_empty"),
        sum(pow(lit(2.0), lit(Width.toDouble) - col("mr").cast("double"))
          .cast("decimal(38,0)")).as("s"))
      .select(col(groupCol), col("n_buckets"), col("v_empty"),
        floor(
          when(
            lit(alpha) * lit(m.toDouble * m) * lit(math.pow(2.0, Width)) /
              col("s").cast("double") <= lit(2.5 * m) && col("v_empty") > 0L,
            lit(m.toDouble) * log(lit(m.toDouble) / col("v_empty").cast("double")))
            .otherwise(
              lit(alpha) * lit(m.toDouble * m) * lit(math.pow(2.0, Width)) /
                col("s").cast("double"))
            + lit(0.5)).cast("long").as("est"))
  }
}
