package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import graft.Functions

/** Deterministic sampling and dataset splitting for training-data pipelines.
  *
  * Everything here derives from `md5(key)` — not `rand()` — so results are
  * identical across runs, partitionings, engines, and cluster sizes: a
  * sampled corpus can be reproduced bit-for-bit from the raw data, and a
  * train/validation split never leaks rows when the pipeline reruns
  * (the same property the engine's publish keys rely on,
  * `Functions.recordId`). All operators are stateless per-row filters /
  * projections — no shuffle, no driver state, embarrassingly parallel at
  * any scale.
  */
object Sampling {

  /** md5-derived uniform value in [0, 1) for a key column. 32 bits of
    * hash → granularity 2^-32, exact in DOUBLE.
    */
  def hashUniform(key: Column, salt: String = ""): Column =
    Functions.md5Bits(concat(lit(salt), key.cast("string")), 32) / lit(4294967296.0)

  /** The module's single rate-rounding contract: half-up to 9 decimals, so
    * every derived keep rate compares bit-identically in the SQL oracles.
    * A precision change must happen HERE, nowhere else.
    */
  private def round9(x: Double): Double = math.floor(x * 1e9 + 0.5) / 1e9

  /** Keep each row with probability `rate`, deterministically by key. The
    * same key always makes the same decision — resampling a grown corpus
    * keeps every previously selected row (important for incremental
    * training-set builds).
    */
  def hashSample(df: DataFrame, keyCol: String, rate: Double, salt: String = ""): DataFrame = {
    require(rate >= 0.0 && rate <= 1.0)
    df.filter(hashUniform(col(keyCol), salt) < rate)
  }

  /** Per-stratum sampling rates (the deterministic `sampleBy`): rows keep
    * their stratum's rate, unknown strata use `defaultRate`. Used for data
    * mixing — re-weighting sources/languages/quality buckets into a
    * training mix.
    */
  def stratifiedSample(
      df: DataFrame,
      strataCol: String,
      keyCol: String,
      rates: Map[String, Double],
      defaultRate: Double = 0.0,
      salt: String = ""): DataFrame = {
    val rate = rates.foldLeft(lit(defaultRate)) { case (acc, (stratum, r)) =>
      when(col(strataCol) === stratum, lit(r)).otherwise(acc)
    }
    df.filter(hashUniform(col(keyCol), salt) < rate)
  }

  /** Weight-proportional Bernoulli sampling: each row keeps with
    * probability `targetRate · w / w_max` — quality-weighted corpus
    * thinning where a document twice as good is twice as likely to stay,
    * and the best row keeps at exactly `targetRate`. `w_max` is one
    * bounded scalar aggregate turned into a plan-time literal (rounded
    * half-up to 9 so SQL oracles reproduce the comparison); non-positive
    * weights never keep. Deterministic per key, like every decision here.
    */
  def weightedSample(
      df: DataFrame,
      keyCol: String,
      weightCol: String,
      targetRate: Double,
      salt: String = ""): DataFrame = {
    require(targetRate > 0.0 && targetRate <= 1.0, "need 0 < targetRate <= 1")
    val wMaxRow = df.agg(max(col(weightCol).cast("double"))).head()
    // empty input / all-null weights: fail with the contract's message, not
    // an unboxing NPE
    require(!wMaxRow.isNullAt(0), "max weight must be positive (empty or all-null weights)")
    val wMax = wMaxRow.getDouble(0)
    require(wMax > 0.0, "max weight must be positive")
    val scale = round9(targetRate / wMax)
    // huge weights (byte sizes, popularity counts) can push targetRate/wMax
    // below the 9-decimal grid — fail loudly rather than sample nothing
    require(scale > 0.0,
      s"targetRate/$targetRate over max weight $wMax underflows 9-decimal " +
        "rounding; rescale the weight column (e.g. divide by its max) first")
    df.filter(
      col(weightCol).cast("double") > 0.0 &&
        hashUniform(col(keyCol), salt) < col(weightCol).cast("double") * scale)
  }

  /** Temperature-based mixture sampling (the multilingual-corpus mixing
    * rule: sample stratum i with probability ∝ nᵢ^α, α ∈ (0, 1] — α < 1
    * upweights low-resource strata). Down-sampling only: the smallest
    * stratum keeps rate 1.0 and stratum i keeps `(nᵢ/n_min)^(α−1)`, so no
    * row ever needs duplicating. Stratum counts are one bounded aggregate
    * collected to the driver (k strata — languages/sources, dozens not
    * millions: the [[graft.ops.Quantize.fitBounds]] contract) and become
    * plan-time literal rates, keeping the per-row filter a pure codegen'd
    * hash compare with no join. Rates are rounded half-up to 9 decimals so
    * SQL oracles reproduce the comparison bit-for-bit.
    */
  def temperatureMix(
      df: DataFrame,
      strataCol: String,
      keyCol: String,
      alpha: Double,
      salt: String = ""): DataFrame = {
    require(alpha > 0.0 && alpha <= 1.0, "need 0 < alpha <= 1")
    // null strata fall through to stratifiedSample's defaultRate (0.0):
    // a null never equals any rate key, so it is dropped — same contract
    // as an unknown stratum — rather than NPE'ing the count pass
    val counts = df.groupBy(strataCol).count()
      .collect().flatMap(r => Option(r.get(0)).map(s => s.toString -> r.getLong(1)))
    require(counts.nonEmpty, "input has no non-null strata")
    val nMin = counts.map(_._2).min.toDouble
    val rates = counts.map { case (s, n) =>
      s -> round9(math.pow(n / nMin, alpha - 1.0))
    }.toMap
    stratifiedSample(df, strataCol, keyCol, rates, defaultRate = 0.0, salt)
  }

  /** Token-budget mixture: sample each stratum (source/language/quality
    * band) down so the mix approaches `budget` weighted units (tokens,
    * bytes, docs) at the caller's target `proportions` — the "assemble a
    * T-token training mix at these source weights" step. Per-stratum keep
    * rate = min(1, budget·p_s / weight_s), rounded half-up to 9 decimals
    * like [[temperatureMix]]; a stratum too small to fill its share is
    * kept whole (the standard under-supply behavior — the result then
    * lands under budget rather than distorting other sources; the w → 0
    * limit keeps rate 1, so a targeted stratum with only zero/null weights
    * is kept whole, contributing nothing). A targeted proportion of 0
    * drops its stratum. Strata
    * absent from `proportions` drop (rate 0). Decisions are md5-keyed, so
    * the mix is rerun-stable and monotone in budget: growing T only ever
    * ADDS documents, never swaps them — an incremental training-set build
    * keeps every earlier row.
    *
    * Scale shape: one map-side-combinable (stratum × weight) aggregate,
    * collected at stratum cardinality (the [[temperatureMix]] contract),
    * rates applied as a per-row filter — no join, no second shuffle.
    */
  def budgetMix(
      df: DataFrame,
      strataCol: String,
      keyCol: String,
      weightCol: String,
      budget: Double,
      proportions: Map[String, Double],
      salt: String = ""): DataFrame = {
    require(budget > 0.0, "need budget > 0")
    require(proportions.nonEmpty && proportions.values.forall(_ >= 0.0) &&
      math.abs(proportions.values.sum - 1.0) < 1e-9,
      "proportions must be non-negative and sum to 1")
    val totals = df.groupBy(strataCol)
      .agg(sum(col(weightCol).cast("double")).as("w"))
      .collect()
      .flatMap(r => Option(r.get(0)).map(s =>
        // an all-null weight column sums to NULL — treat as total 0 (the
        // under-supply limit below), not an unboxing NPE
        s.toString -> (if (r.isNullAt(1)) 0.0 else r.getDouble(1))))
      .toMap
    val rates = proportions.flatMap { case (s, p) =>
      totals.get(s).map { w =>
        // p = 0 drops; w → 0 with p > 0 is the under-supply LIMIT of
        // min(1, budget·p/w) → kept whole (matches IEEE x/0 = ∞ in the
        // SQL twin), never a silent drop of a targeted stratum
        val r =
          if (p <= 0.0) 0.0
          else if (w <= 0.0) 1.0
          else math.min(1.0, budget * p / w)
        s -> round9(r)
      }
    }
    stratifiedSample(df, strataCol, keyCol, rates, defaultRate = 0.0, salt)
  }

  /** Deterministic upsampling with repetition — the rate ≥ 1 half of data
    * mixing that [[stratifiedSample]]/[[budgetMix]] (rates capped at 1)
    * cannot express: emit each row `⌊rate⌋` or `⌈rate⌉` times so a stratum
    * at rate 2.5 contributes every document twice plus a deterministic
    * md5-chosen half again — the "epochs per domain" knob of LLM data
    * recipes (e.g. Wikipedia seen 3.4× per epoch in GPT-3's mix, Brown et
    * al. 2020 Table 2.2). Copies carry an `epoch` column (0-based) so
    * downstream shuffling ([[epochShuffle]]) can permute each repetition
    * independently and packing can tell copies apart; the extra fractional
    * copy takes the HIGHEST epoch index, so epoch e is always a superset
    * of epoch e+1's documents and rate growth is monotone: raising a rate
    * only ever ADDS (row, epoch) pairs.
    *
    * Rates below 1 degenerate to [[stratifiedSample]] semantics with the
    * copy tagged epoch 0 (the same md5 decision — `hashUniform(key) <
    * frac`), so one operator covers the whole mixing range.
    *
    * Scale shape: zero shuffles, zero joins — rates enter as a plan-time
    * literal when-chain, the copy count is a per-row expression, and the
    * replication is a generator (`explode(sequence(...))`), so output
    * volume is exactly the mixed corpus size and nothing is buffered.
    * `sequence` is guarded by a `copies > 0` filter — Spark's `sequence(0,
    * -1)` would emit a descending phantom range, the [[Pack.packTokenIds]]
    * lesson.
    */
  def upsample(
      df: DataFrame,
      strataCol: String,
      keyCol: String,
      rates: Map[String, Double],
      defaultRate: Double = 0.0,
      salt: String = ""): DataFrame = {
    require(rates.values.forall(r => r >= 0.0 && r <= 64.0),
      "per-stratum rates must be in [0, 64] — a larger rate is almost surely a bug")
    require(defaultRate >= 0.0 && defaultRate <= 64.0, "defaultRate out of [0, 64]")
    val whole = rates.foldLeft(lit(math.floor(defaultRate))) {
      case (acc, (stratum, r)) =>
        when(col(strataCol) === stratum, lit(math.floor(r))).otherwise(acc)
    }
    val frac = rates.foldLeft(lit(round9(defaultRate - math.floor(defaultRate)))) {
      case (acc, (stratum, r)) =>
        when(col(strataCol) === stratum, lit(round9(r - math.floor(r)))).otherwise(acc)
    }
    val copies = (whole +
      when(hashUniform(col(keyCol), salt) < frac, lit(1.0)).otherwise(lit(0.0)))
      .cast("long")
    // NULL keys drop — the module-wide convention (stratifiedSample,
    // weightedPerStratumSample): a NULL key has no uniform, so the
    // fractional copy would silently never fire and the row would
    // replicate floor(rate) times, a behavior nobody asked for
    df.filter(col(keyCol).isNotNull)
      .withColumn("_copies", copies)
      .where(col("_copies") > 0L)
      .withColumn("epoch", explode(sequence(lit(0L), col("_copies") - 1L)))
      .drop("_copies")
  }

  /** Exactly min(k, |stratum|) rows per stratum: the k rows with the
    * smallest md5-uniform per stratum — a deterministic reservoir sample
    * (min-wise sampling: each key's uniform is fixed, so growing a stratum
    * only ever evicts the largest, and reruns pick identical rows). One
    * window shuffle keyed by stratum; a pathologically hot stratum
    * serializes its own partition — for that shape use
    * [[graft.ops.Publish]]'s two-level bucket-rank pattern with a salt on
    * the stratum key.
    */
  def perStratumSample(
      df: DataFrame,
      strataCol: String,
      keyCol: String,
      k: Int,
      salt: String = ""): DataFrame = {
    require(k >= 1)
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col(strataCol))
      .orderBy(hashUniform(col(keyCol), salt), col(keyCol))
    df
      // null keys have a null uniform, which sorts FIRST and would crowd
      // every stratum's sample with rows no other operator here would keep
      // — drop them, the module-wide null-key rule
      .filter(col(keyCol).isNotNull)
      .withColumn("_rn", org.apache.spark.sql.functions.row_number().over(w))
      .filter(col("_rn") <= k)
      .drop("_rn")
  }

  /** Weighted reservoir sampling without replacement, exactly
    * `min(k, positive-weight rows)` per stratum (Efraimidis & Spirakis
    * 2006): rank rows by the exponential key `−ln(u)/w` (equivalent to
    * their `u^(1/w)` maximization) and keep each stratum's k smallest —
    * a doc with twice the weight is (asymptotically) twice as likely to
    * make the sample, the quality-weighted version of
    * [[perStratumSample]]. The uniform is md5-derived on the OPEN-ZERO
    * grid `(bits+1)/2³²` so `ln` never sees 0; non-positive/NULL weights
    * never sample (the [[weightedSample]] convention) and NULL keys drop
    * (the module-wide rule). Scores compare rounded half-up 9 with a key
    * tiebreak, so selection is deterministic and the SQL oracle
    * (q_sm_wreservoir) reproduces it. Raising a row's weight can only
    * keep it selected (its key is decreasing in w) — monotone, spec'd.
    *
    * Scale shape: one keyed window ranking per stratum, the
    * [[perStratumSample]] plan exactly.
    */
  def weightedPerStratumSample(
      df: DataFrame,
      strataCol: String,
      keyCol: String,
      weightCol: String,
      k: Int,
      salt: String = ""): DataFrame = {
    require(k >= 1)
    val u = (Functions.md5Bits(concat(lit(salt), col(keyCol).cast("string")), 32) + 1L) /
      lit(4294967296.0)
    val wgt = col(weightCol).cast("double")
    val score = Functions.roundHalfUp(-log(u) / wgt, 9)
    val win = org.apache.spark.sql.expressions.Window
      .partitionBy(col(strataCol))
      .orderBy(score, col(keyCol))
    df
      .filter(col(keyCol).isNotNull && wgt > 0.0)
      .withColumn("_rn", org.apache.spark.sql.functions.row_number().over(win))
      .filter(col("_rn") <= k)
      .drop("_rn")
  }

  /** Assign each row a split label by hash band: `fractions` are
    * (label, weight) pairs; bands partition [0, 1) in the given order.
    * Deterministic, disjoint, exhaustive — a row can never change split
    * between runs or land in two splits. NULL keys (whose hash uniform is
    * null and would otherwise fall through every band into the LAST label —
    * typically the small eval split) are routed explicitly to the FIRST
    * label, the largest band by convention; filter them beforehand if they
    * should not participate at all.
    */
  def split(
      df: DataFrame,
      keyCol: String,
      fractions: Seq[(String, Double)],
      salt: String = ""): DataFrame = {
    require(fractions.nonEmpty && math.abs(fractions.map(_._2).sum - 1.0) < 1e-9,
      "split fractions must sum to 1")
    val u = hashUniform(col(keyCol), salt)
    val cumulative = fractions.scanLeft(0.0) { case (acc, (_, w)) => acc + w }.tail
    val label = fractions.zip(cumulative).init.foldRight(
      lit(fractions.last._1)) { case (((name, _), hi), acc) =>
      when(u < hi, lit(name)).otherwise(acc)
    }
    df.withColumn("split",
      when(col(keyCol).isNull, lit(fractions.head._1)).otherwise(label))
  }

  /** Deterministic global shuffle for training-epoch ordering: every row
    * gets a reproducible position 0..n-1 by sorting on
    * `md5(salt ⊕ epoch ⊕ ':' ⊕ key)` — a different but fixed permutation per
    * epoch, identical across runs, partitionings, and engines (the property
    * `rand()`-based shuffles lack: a crashed epoch resumes mid-order
    * instead of reshuffling).
    *
    * Scale shape: positions are two-level, not one global window — a
    * bucket-local `row_number` (the bucket is the sort key's leading byte,
    * so bucket order IS hash order) plus cumulative bucket offsets, the
    * [[Publish.firstSeenCounter]] pattern. The widest window partition is
    * one of 256 hash buckets (~n/256 rows, uniform by construction — md5
    * leading bytes don't skew), never the whole dataset.
    */
  def epochShuffle(
      df: DataFrame, keyCol: String, epoch: Long, salt: String = ""): DataFrame =
    tieredShuffle(df, Seq.empty, keyCol, epoch, salt)

  /** Curriculum ordering: a reproducible global position that visits
    * `tierCols` in ascending order (quality band, difficulty, sequence
    * length — the curriculum-learning schedule) while shuffling
    * deterministically WITHIN each tier, per epoch. With no tiers this IS
    * [[epochShuffle]]. Same two-level scale shape: the widest window
    * partition is one (tier × hash-bucket) slice; the cumulative offsets
    * window runs over tiers×256 rows, never data. Rows with a NULL in any
    * tier column drop with the null keys (the module rule) — route them to
    * an explicit tier first if they should participate.
    */
  def tieredShuffle(
      df: DataFrame,
      tierCols: Seq[String],
      keyCol: String,
      epoch: Long,
      salt: String = ""): DataFrame = {
    val sk = md5(concat(lit(salt), lit(epoch.toString), lit(":"), col(keyCol).cast("string")))
    val tiers = tierCols.map(col)
    val nonNull = (col(keyCol) +: tiers).map(_.isNotNull).reduce(_ && _)
    val local = df
      .filter(nonNull) // module-wide null-key rule
      .withColumn("_sk", sk)
      .withColumn("_b", substring(col("_sk"), 1, 2))
      .withColumn("_lr", row_number().over(
        org.apache.spark.sql.expressions.Window
          .partitionBy(tiers :+ col("_b"): _*).orderBy(col("_sk"), col(keyCol))))
    // global order = (tiers asc, _sk asc): the bucket is the sort key's
    // leading byte, so cumulative (tier, bucket) offsets reproduce it
    val offsetW = org.apache.spark.sql.expressions.Window
      .orderBy(tiers :+ col("_b"): _*).rowsBetween(
        org.apache.spark.sql.expressions.Window.unboundedPreceding, -1)
    // bucket sizes come from the windowed side (max local rank ≡ bucket
    // count). Exchange reuse does NOT fire here (verified in the physical
    // plan): column pruning narrows this branch to (key, _sk, _b) while the
    // result branch carries the payload, so the exchanges canonicalize
    // differently. That is the cheap side of the trade — the duplicated
    // work is one extra scan + md5 + ~25-byte/row shuffle; the
    // payload-carrying exchange happens exactly once, and checkpointing
    // `local` to force reuse would materialize the payload instead.
    // ≤ tiers×256 rows after the aggregate: the single-partition cumulative
    // window is over (tier, bucket) cells, not data
    val joinKeys = tierCols :+ "_b"
    val offsets = local.groupBy(joinKeys.map(col): _*)
      .agg(max(col("_lr")).cast("long").as("_n"))
      .withColumn("_off", coalesce(sum(col("_n")).over(offsetW), lit(0L)))
      .select((joinKeys.map(col) :+ col("_off")): _*)
    local
      .join(offsets.hint("SHUFFLE_HASH"), joinKeys)
      .withColumn("pos", col("_off") + col("_lr") - 1)
      .drop("_sk", "_b", "_lr", "_off")
  }

  /** DoReMi-style domain reweighting (Xie et al. 2023, simplified to its
    * one-step multiplicative update): given per-document losses under the
    * CURRENT proxy model and a REFERENCE model, each domain's new mixture
    * weight is
    *
    *   w'(d) ∝ w(d) · exp(η · excess(d)),   excess(d) = mean(cur − ref)
    *
    * normalized to sum 1. Domains where the proxy lags the reference
    * (high excess loss) get up-weighted — the data-mixture tuning step of
    * a large pretraining run.
    *
    * Determinism: the per-domain mean uses DECIMAL(28,12) sums over
    * 12-decimal quantized losses (order-free exact, the TrafficAgg moment
    * discipline); exp/normalize run per DOMAIN row (bounded), with the
    * output half-up at 9 decimals — fully oracle-replayable. Scale: one
    * map-side-partial aggregate keyed on domain + a broadcast one-row
    * total; no corpus-keyed joins.
    *
    * Output: `(domainCol, n_docs, excess, weight)` — `excess` half-up 6.
    */
  def domainReweight(
      df: DataFrame,
      domainCol: String,
      curLossCol: String,
      refLossCol: String,
      baseWeights: Map[String, Double] = Map.empty,
      eta: Double = 1.0): DataFrame = {
    require(eta > 0.0, s"eta must be positive, got $eta")
    val q = (c: String) => col(c).cast("decimal(28,12)")
    val perDomain = df
      .filter(col(domainCol).isNotNull &&
        col(curLossCol).isNotNull && col(refLossCol).isNotNull)
      .groupBy(col(domainCol))
      .agg(
        count(lit(1)).as("n_docs"),
        sum(q(curLossCol) - q(refLossCol)).as("_d"))
      .select(
        col(domainCol), col("n_docs"),
        Functions.roundHalfUp(
          col("_d").cast("double") / col("n_docs").cast("double"), 6)
          .as("excess"))
    val base = baseWeights.foldLeft(lit(1.0)) { case (acc, (d, w)) =>
      when(col(domainCol) === d, lit(w)).otherwise(acc)
    }
    // unnormalized weights quantized to integer nano-units BEFORE the
    // normalizing sum — a double sum over domains would be fold-order
    // dependent; a long sum is order-free and oracle-exact
    val unnorm = perDomain
      .select(col(domainCol), col("n_docs"), col("excess"),
        floor(base * exp(lit(eta) * col("excess")) * 1e9 + 0.5)
          .cast("long").as("_u9"))
    val total = unnorm.agg(sum(col("_u9")).as("_t9"))
    unnorm
      .crossJoin(broadcast(total))
      .select(
        col(domainCol), col("n_docs"), col("excess"),
        Functions.roundHalfUp(
          col("_u9").cast("double") / col("_t9").cast("double"), 9).as("weight"))
  }

  /** Temporal train/test split with an embargo gap — the leakage guard
    * hash-band [[split]] cannot express: when labels depend on the future
    * (forecasting, recsys, dedup-against-history evaluation), a random
    * split trains on events AFTER the test window. Cutoff = the earliest
    * time whose cumulative row count reaches `ceil(frac·n)` (the explicit
    * percentile_disc definition, evaluated with the same IEEE `ceil(n·frac)`
    * in both engines); rows at/after the cutoff are `test`, rows strictly
    * before `cutoff − embargoSeconds` are `train`, and the gap between is
    * labeled `embargo` — excluded from both sides so near-boundary
    * autocorrelation (a doc and its near-dup seconds apart) cannot leak.
    * Ties at the cutoff all land in `test`, so `train` never exceeds the
    * requested fraction. NULL-time rows are dropped — unplaceable.
    *
    * Scale shape: the cutoff derives from a DISTINCT-time count table —
    * bounded by time grain × range, not corpus rows — one cumulative
    * window over that bounded relation, then a broadcast one-row cutoff
    * against a per-row labeling projection. The corpus itself never
    * sorts and never shuffles.
    */
  def temporalSplitEmbargo(
      df: DataFrame,
      timeCol: String,
      frac: Double,
      embargoSeconds: Long): DataFrame = {
    require(frac > 0.0 && frac < 1.0, s"frac=$frac must be in (0, 1)")
    require(embargoSeconds >= 0L, s"embargoSeconds=$embargoSeconds must be >= 0")
    val rows = df.filter(col(timeCol).isNotNull)
    val counts = rows.groupBy(col(timeCol)).agg(count(lit(1)).as("_c"))
    val w = org.apache.spark.sql.expressions.Window
      .orderBy(col(timeCol))
      .rowsBetween(org.apache.spark.sql.expressions.Window.unboundedPreceding, 0)
    val cutoff = counts
      .withColumn("_cum", sum(col("_c")).over(w))
      .crossJoin(broadcast(counts.agg(sum(col("_c")).as("_n"))))
      .filter(col("_cum") >= ceil(col("_n") * lit(frac)))
      .agg(min(col(timeCol)).as("_cutoff"))
    val trainEdge = col("_cutoff") - expr(s"INTERVAL '$embargoSeconds' SECOND")
    rows
      .crossJoin(broadcast(cutoff))
      .select(df.columns.map(col) :+
        when(col(timeCol) >= col("_cutoff"), lit("test"))
          .when(col(timeCol) < trainEdge, lit("train"))
          .otherwise(lit("embargo")).as("split"): _*)
  }

  /** UniMax budget allocation (Chung et al. 2023, "UniMax: Fairer and More
    * Effective Language Sampling"): spread `budget` rows as UNIFORMLY as
    * possible across strata, capping each stratum at `maxEpochs × its
    * size` — the anti-oversampling alternative to temperature mixing
    * ([[temperatureMix]]), which still lets a huge corpus starve small
    * ones and repeats tiny ones without bound. Integer water-filling:
    * strata ascend by cap (ties by name); each takes `min(cap,
    * remaining budget div remaining strata)` — a capped stratum's unused
    * share flows to the larger strata after it. Truncation from the
    * integer division can leave a few rows of budget unspent; the budget
    * is an upper bound, never exceeded.
    *
    * Returns `(stratum, n_rows, cap, quota)`. Driver math over the
    * bounded stratum list ([[budgetMix]]'s collect precedent); the oracle
    * replays the sequential fill as a recursive CTE, so the loop itself
    * is verified, not just its inputs. NULL strata drop (module rule).
    */
  def unimaxAllocation(
      df: DataFrame,
      strataCol: String,
      budget: Long,
      maxEpochs: Double): DataFrame = {
    require(budget >= 0L, s"budget=$budget must be >= 0")
    require(maxEpochs > 0.0, s"maxEpochs=$maxEpochs must be positive")
    val sizes = df
      .filter(col(strataCol).isNotNull)
      .groupBy(col(strataCol).cast("string").as("_s"))
      .agg(count(lit(1)).as("_n"))
      .collect()
      .map(r => r.getString(0) -> r.getLong(1))
    val ordered = sizes
      .map { case (s, n) => (s, n, math.floor(n * maxEpochs).toLong) }
      .sortBy { case (s, _, cap) => (cap, s) }
    var remaining = budget
    val rows = ordered.zipWithIndex.map { case ((s, n, cap), i) =>
      val fair = remaining / (ordered.length - i)
      val quota = math.min(cap, fair)
      remaining -= quota
      (s, n, cap, quota)
    }
    val spark = df.sparkSession
    import spark.implicits._
    rows.toSeq.toDF(strataCol, "n_rows", "cap", "quota")
  }

  /** Apply a per-stratum quota map deterministically: each stratum keeps
    * its `quota` smallest rows by md5-uniform ([[perStratumSample]]'s
    * selection, per-stratum k) — composed with [[unimaxAllocation]] this
    * is the full UniMax mix. Strata absent from the map drop; NULL keys
    * drop (module rule).
    *
    * Scale shape: quotas enter as a plan-time literal when-chain, the
    * ranking is one keyed window per stratum — the [[perStratumSample]]
    * plan exactly, no join.
    */
  def takeQuotas(
      df: DataFrame,
      strataCol: String,
      keyCol: String,
      quotas: Map[String, Long],
      salt: String = ""): DataFrame = {
    require(quotas.nonEmpty, "need at least one stratum quota")
    require(quotas.values.forall(_ >= 0L), "quotas must be non-negative")
    val quotaExpr = quotas.foldLeft(lit(-1L)) { case (acc, (s, q)) =>
      when(col(strataCol) === s, lit(q)).otherwise(acc)
    }
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col(strataCol))
      .orderBy(hashUniform(col(keyCol), salt), col(keyCol))
    df
      .filter(col(keyCol).isNotNull && col(strataCol).isNotNull)
      .withColumn("_q", quotaExpr)
      .filter(col("_q") >= 0L)
      .withColumn("_rn", org.apache.spark.sql.functions.row_number().over(w))
      .filter(col("_rn") <= col("_q"))
      .drop("_rn", "_q")
  }

  /** [[unimaxAllocation]] + [[takeQuotas]] in one call: the self-contained
    * UniMax mixing operator (allocation collected driver-side — strata are
    * bounded — then applied as literal quotas).
    */
  def unimaxMix(
      df: DataFrame,
      strataCol: String,
      keyCol: String,
      budget: Long,
      maxEpochs: Double,
      salt: String = ""): DataFrame = {
    val quotas = unimaxAllocation(df, strataCol, budget, maxEpochs)
      .collect()
      .map(r => r.getString(0) -> r.getLong(3))
      .toMap
    takeQuotas(df, strataCol, keyCol, quotas, salt)
  }

  /** Keep each group's top `frac` fraction by score — the stratified
    * quality cut ("top 30% by classifier score PER DOMAIN") that a global
    * threshold gets wrong whenever score distributions differ across
    * domains (a global cut empties the hard domains and keeps the easy
    * ones wholesale; LLaMA/CCNet filter per language bucket for exactly
    * this reason).
    *
    * Exactly `ceil(frac · n_g)` rows per group survive: rank by
    * `(score DESC, key ASC)` — the deterministic tie canon — against the
    * group's total count, both from windows over ONE exchange on the
    * group key. The cutoff count is one IEEE multiply + ceil of an exact
    * integer-valued double, identical in any engine. NULL keys drop (the
    * module-wide rule); NULL/NaN scores drop (unusable as quality
    * evidence, and NaN would poison the ordering differently per engine).
    *
    * Scale shape: the [[perStratumSample]] plan — one keyed window sort
    * per group, no second exchange for the count (same partitioning).
    */
  def topFractionPerGroup(
      df: DataFrame,
      groupCol: String,
      keyCol: String,
      scoreCol: String,
      frac: Double): DataFrame = {
    require(frac > 0.0 && frac <= 1.0, s"frac must be in (0, 1], got $frac")
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col(groupCol))
      .orderBy(col(scoreCol).cast("double").desc, col(keyCol))
    val cw = org.apache.spark.sql.expressions.Window.partitionBy(col(groupCol))
    df
      .filter(col(keyCol).isNotNull && col(scoreCol).isNotNull &&
        !isnan(col(scoreCol).cast("double")))
      .withColumn("_rn", row_number().over(w))
      .withColumn("_n", count(lit(1)).over(cw))
      .filter(col("_rn") <= ceil(lit(frac) * col("_n").cast("double")).cast("long"))
      .drop("_rn", "_n")
  }
}
