package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** The composed corpus-curation pipeline — the training-data twin of the
  * GRIDSMART ready chain ([[graft.apps.GsReady]]): one declarative decision
  * per document combining every curation signal this engine implements.
  *
  * Per-document flags, ANDed into `keep`:
  *   - `quality_ok`      — [[TextAnalysis.qualityMetrics]] composite ≥ `minQuality`
  *   - `lang_ok`         — [[TextAnalysis.langId]] guess ∈ `acceptLangs`
  *   - `exact_canonical` — the document is its content hash's canonical
  *                         (minimum) id ([[Dedup.exact]])
  *   - `near_canonical`  — the document is its near-dup CLUSTER's canonical:
  *                         [[Dedup.minhashLshPairs]] pairs, clustered by
  *                         [[ConnectedComponents.assign]]
  *   - `sampled`         — deterministic md5 sampling at `sampleRate`
  *                         ([[Sampling.hashUniform]])
  *
  * Flags are computed independently over the full corpus and surfaced per
  * document (not pre-filtered away) so downstream audits can ask "why was
  * this dropped" — observability over destructive filtering, the same call
  * the device cascade makes with `resolution_stage`.
  *
  * Scale shape: quality/lang/sampling are per-row projections (zero
  * shuffle); the exact-canonical flag is one map-side-combinable hash
  * aggregate plus a keyed join on the content hash; the near-dup flag costs
  * the LSH pair generation + star-contraction rounds — every shuffle keyed,
  * nothing quadratic, nothing driver-side.
  *
  * NOT lazily composable: unless `precomputedClusters` is supplied, calling
  * `decide` runs [[ConnectedComponents.assign]]'s iterative star-contraction
  * loop (localCheckpoint actions) at composition time — Spark jobs launch
  * before the caller executes the returned DataFrame (same eager contract as
  * [[Sampling.temperatureMix]]'s count pass). Pass a precomputed assignment
  * to keep composition lazy and to reuse a cluster map across calls.
  *
  * Null `textCol` values are treated as the empty string for every flag
  * (hash, quality, language), so a null-text document still appears in the
  * output with its drop reasons — the observability contract says flags are
  * surfaced, never silently vanished.
  */
object Curate {

  def decide(
      docs: DataFrame,
      idCol: String,
      textCol: String,
      minQuality: Double = 0.5,
      acceptLangs: Seq[String] = Seq("en", "und"),
      sampleRate: Double = 1.0,
      sampleSalt: String = "",
      lshNumHashes: Int = 8,
      lshBands: Int = 2,
      langMarkers: Seq[(String, Seq[String])] = TextAnalysis.LangMarkers,
      precomputedClusters: Option[DataFrame] = None,
      // opt-in boilerplate gate: documents whose [[Dedup.spanCoverage]]
      // dup_ratio (cross-document repeated spans at `dupWindowTokens`)
      // exceeds the limit get dup_ok = false ANDed into keep. None (the
      // default) skips the span pass entirely and leaves the output
      // schema unchanged.
      maxDupRatio: Option[Double] = None,
      dupWindowTokens: Int = 8): DataFrame = {
    val id = col(idCol)
    // null text ⇒ '' everywhere: md5(null) would null the content hash and
    // the inner joins below would silently drop the document
    val safe = docs.withColumn(textCol, coalesce(col(textCol), lit("")))
    val base = safe.select(
      id,
      TextAnalysis.langId(col(textCol), langMarkers).as("_lang"),
      md5(trim(lower(col(textCol)))).as("_ch"),
      (Sampling.hashUniform(id, sampleSalt) < sampleRate).as("sampled"))
    val quality = TextAnalysis.qualityMetrics(safe, idCol, textCol)
      .select(id, (col("quality_score") >= minQuality).as("quality_ok"))
    val exact = Dedup.exact(safe, idCol, textCol)
      .select(col("content_hash").as("_ch"), col("canonical_id"))
    val clusters = precomputedClusters.getOrElse(ConnectedComponents.assign(
      safe.select(id), idCol,
      Dedup.minhashLshPairs(safe, idCol, textCol, lshNumHashes, lshBands),
      "id_a", "id_b"))
    base
      .join(quality, Seq(idCol))
      .join(exact, Seq("_ch"))
      // LEFT join + self-default: a caller-supplied cluster map may not
      // cover documents ingested after it was built, and an inner join
      // would silently drop them — absent ids default to their own cluster,
      // exactly how assign() labels never-paired vertices
      .join(clusters, Seq(idCol), "left")
      .withColumn("cluster_id", coalesce(col("cluster_id"), id))
      .select(
        id,
        col("quality_ok"),
        col("_lang").isin(acceptLangs: _*).as("lang_ok"),
        (id === col("canonical_id")).as("exact_canonical"),
        (id === col("cluster_id")).as("near_canonical"),
        col("sampled"))
      .withColumn(
        "keep",
        col("quality_ok") && col("lang_ok") && col("exact_canonical") &&
          col("near_canonical") && col("sampled"))
      .transform { flagged =>
        maxDupRatio match {
          case None => flagged
          case Some(limit) =>
            val cov = Dedup.spanCoverage(safe,
                Dedup.repeatedSpans(safe, idCol, textCol, dupWindowTokens),
                idCol, textCol)
              .select(id, (col("dup_ratio") <= limit).as("dup_ok"))
            flagged.join(cov, Seq(idCol))
              .withColumn("keep", col("keep") && col("dup_ok"))
        }
      }
  }

  // ---- streaming ----------------------------------------------------------

  /** Per-document curation flags on a live stream. */
  case class StreamFlags(
      docId: Long,
      qualityOk: Boolean,
      langOk: Boolean,
      firstSeen: Boolean,
      sampled: Boolean,
      keep: Boolean)

  /** Streaming twin of [[decide]] for live ingest: quality, language, and
    * sampling are pure per-row twins of the batch column expressions (SQL
    * trim/lower/split semantics via [[Dedup.sqlTrim]] — the same
    * bit-compatibility contract as [[Dedup.minhashSignaturesStream]]);
    * exact dedup is stateful per content hash, so `firstSeen` mirrors the
    * batch `exact_canonical` (within one micro-batch the minimum docId
    * wins, matching the batch canonical rule; across batches first arrival
    * wins — the streaming-order semantics [[Dedup.firstSeenStream]]
    * defines). Replays are idempotent: the state remembers the canonical
    * docId, so a replayed canonical re-emits `firstSeen = true` and a
    * replayed duplicate re-emits `false`. The near-dup cluster flag is
    * batch-only (star contraction is iterative); run [[decide]] over the
    * accumulated lake for the full conjunction.
    */
  def decideStream(
      docs: org.apache.spark.sql.Dataset[Dedup.DocChunk],
      minQuality: Double = 0.5,
      acceptLangs: Seq[String] = Seq("en", "und"),
      sampleRate: Double = 1.0,
      sampleSalt: String = "",
      langMarkers: Seq[(String, Seq[String])] = TextAnalysis.LangMarkers)
      : org.apache.spark.sql.Dataset[StreamFlags] = {
    import docs.sparkSession.implicits._
    import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

    def flagsOf(d: Dedup.DocChunk, first: Boolean): StreamFlags = {
      val toks = Dedup.sqlTrim(Dedup.sqlLower(d.text)).split("\\s+", -1).toSeq
      val hits = langMarkers.map { case (lang, ms) =>
        (lang, toks.count(ms.contains))
      }
      val best = hits.map(_._2).max
      val guess =
        if (best <= 0) "und"
        else hits.find(_._2 == best).get._1 // table order breaks ties, as in batch
      val wordCnt = toks.length
      val stopRatio =
        if (wordCnt == 0) 0.0
        else toks.count(TextAnalysis.QualityStopwords.contains).toDouble / wordCnt
      val score =
        (if (wordCnt >= 20 && wordCnt <= 400) 0.5 else 0.0) +
          (if (stopRatio >= 0.01 && stopRatio <= 0.5) 0.5 else 0.0)
      val sampled =
        SimilaritySearch.md5Bits32(s"$sampleSalt${d.docId}") / 4294967296.0 < sampleRate
      val qualityOk = score >= minQuality
      val langOk = acceptLangs.contains(guess)
      StreamFlags(d.docId, qualityOk, langOk, first, sampled,
        qualityOk && langOk && first && sampled)
    }

    docs
      // batch-contract parity: decide() coalesces null text to '' — the
      // stream twin must flag the doc, not NPE inside contentKey/flagsOf
      .map(d => if (d.text == null) d.copy(text = "") else d)
      .groupByKey(d => Dedup.contentKey(d.text))
      .flatMapGroupsWithState(OutputMode.Append(), GroupStateTimeout.NoTimeout())(
        (hash: String, it: Iterator[Dedup.DocChunk], state: GroupState[Long]) => {
          val items = it.toSeq.sortBy(_.docId)
          val canonical =
            if (state.exists) state.get
            else { val c = items.head.docId; state.update(c); c }
          items.iterator.map(d => flagsOf(d, d.docId == canonical))
        })
  }

  /** The published WEB-curation composition — the FineWeb/RefinedWeb recipe
    * assembled from this engine's cited gates, each individually
    * oracle-verified (q_tx_gopher, q_tx_c4, q_tx_repetition, q_dd_exact):
    *
    *   - `gopher_ok` — [[TextAnalysis.gopherRules]]' rule set
    *   - `c4_ok`     — [[TextAnalysis.c4Clean]]'s line/page gates
    *   - `rep_ok`    — [[TextAnalysis.repetitionMetrics]] ratios under the
    *                   Gopher repetition thresholds (dup-line ≤ 0.3 and
    *                   the token-grain ratios below their caps)
    *   - `exact_canonical` — the doc is its content hash's minimum id
    *
    * ANDed into `keep`; flags surfaced per document (observability over
    * destructive filtering, the [[decide]] contract). Scale shape: the
    * three heuristic gates are ONE shared per-row projection (the
    * expression builders compose — no flag-join fan-out); the only
    * shuffles are the exact-dedup hash aggregate and its keyed join back.
    */
  def decideWeb(
      docs: DataFrame,
      idCol: String,
      textCol: String,
      maxDupLineRatio: Double = 0.3,
      maxDupTokenRatio: Double = 0.3,
      maxTopTokenRatio: Double = 0.2): DataFrame = {
    val id = col(idCol)
    val safe = docs.withColumn(textCol, coalesce(col(textCol), lit("")))
    val gopherKeep = TextAnalysis
      .gopherExprs(textCol, 50, 100000, 3.0, 10.0, 0.1, 0.9, 0.3, 0.8, 2)
      .toMap.apply("keep")
    val c4Keep = TextAnalysis.c4Exprs(textCol, 3, 3).toMap.apply("keep")
    val rep = TextAnalysis.repetitionExprs(textCol, "\n").toMap
    val repOk = rep("dup_line_ratio") <= maxDupLineRatio &&
      rep("dup_token_ratio") <= maxDupTokenRatio &&
      rep("top_token_ratio") <= maxTopTokenRatio
    val flagged = safe.select(
      id,
      md5(trim(lower(col(textCol)))).as("_ch"),
      gopherKeep.as("gopher_ok"),
      c4Keep.as("c4_ok"),
      repOk.as("rep_ok"))
    val exact = Dedup.exact(safe, idCol, textCol)
      .select(col("content_hash").as("_ch"), col("canonical_id"))
    flagged.join(exact, Seq("_ch"))
      .select(id, col("gopher_ok"), col("c4_ok"), col("rep_ok"),
        (id === col("canonical_id")).as("exact_canonical"))
      .withColumn("keep",
        col("gopher_ok") && col("c4_ok") && col("rep_ok") && col("exact_canonical"))
  }

  /** Per-document web-curation stream flags — [[decideWeb]]'s streaming
    * shape. */
  case class WebStreamFlags(
      docId: Long,
      gopherOk: Boolean,
      c4Ok: Boolean,
      repOk: Boolean,
      exactCanonical: Boolean,
      keep: Boolean)

  /** Intermediate gate row of [[decideWebStream]] — public because Spark's
    * generated deserializer cannot access a private case class. */
  case class WebGateRow(
      docId: Long, ch: String, gopherOk: Boolean, c4Ok: Boolean, repOk: Boolean)

  /** Streaming twin of [[decideWeb]] for live web ingest. The three
    * heuristic gates are the SAME column-expression builders the batch
    * operator composes (`gopherExprs`/`c4Exprs`/`repetitionExprs` — pure
    * per-row projections, so they run unchanged on an unbounded stream and
    * can never drift from batch); only `exact_canonical` is stateful, the
    * [[decideStream]] per-content-hash rule: within one micro-batch the
    * minimum docId wins (the batch canonical rule), across batches first
    * arrival wins, and replays are idempotent because the state remembers
    * the canonical docId.
    */
  def decideWebStream(
      docs: org.apache.spark.sql.Dataset[Dedup.DocChunk],
      maxDupLineRatio: Double = 0.3,
      maxDupTokenRatio: Double = 0.3,
      maxTopTokenRatio: Double = 0.2)
      : org.apache.spark.sql.Dataset[WebStreamFlags] = {
    import docs.sparkSession.implicits._
    import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}
    val gopherKeep = TextAnalysis
      .gopherExprs("text", 50, 100000, 3.0, 10.0, 0.1, 0.9, 0.3, 0.8, 2)
      .toMap.apply("keep")
    val c4Keep = TextAnalysis.c4Exprs("text", 3, 3).toMap.apply("keep")
    val rep = TextAnalysis.repetitionExprs("text", "\n").toMap
    val repOk = rep("dup_line_ratio") <= maxDupLineRatio &&
      rep("dup_token_ratio") <= maxDupTokenRatio &&
      rep("top_token_ratio") <= maxTopTokenRatio
    docs
      // batch-contract parity: decideWeb coalesces null text to ''
      .map(d => if (d.text == null) d.copy(text = "") else d)
      .select(
        col("docId"),
        md5(trim(lower(col("text")))).as("ch"),
        gopherKeep.as("gopherOk"),
        c4Keep.as("c4Ok"),
        repOk.as("repOk"))
      .as[WebGateRow]
      .groupByKey(_.ch)
      .flatMapGroupsWithState(OutputMode.Append(), GroupStateTimeout.NoTimeout())(
        (_: String, it: Iterator[WebGateRow], state: GroupState[Long]) => {
          val items = it.toSeq.sortBy(_.docId)
          val canonical =
            if (state.exists) state.get
            else { val c = items.head.docId; state.update(c); c }
          items.iterator.map { g =>
            val first = g.docId == canonical
            WebStreamFlags(g.docId, g.gopherOk, g.c4Ok, g.repOk, first,
              g.gopherOk && g.c4Ok && g.repOk && first)
          }
        })
  }

  /** One micro-batch of the INCREMENTAL web-curation chain — the
    * streaming/lake form of the q_e2e_curate gate/dedup stages, against
    * two persisted KEPT-history artifacts:
    *   - `historyHashes` — distinct `(content_hash)` of every doc kept so
    *     far (the [[Dedup.exact]] md5 key);
    *   - `historyBands`  — distinct `(band, sig)` of every kept doc (the
    *     [[Dedup.lshBandRows]] collision index: two docs are LSH
    *     candidates iff they share a row here).
    *
    * Per-batch-doc flags, surfaced unfiltered (the [[decide]]
    * observability contract): `gopher_ok`/`c4_ok`/`rep_ok` (the
    * [[decideWeb]] per-row gates), `exact_canonical` (batch-local min id
    * per content hash), `exact_new` (hash unseen in history),
    * `near_canonical`/`near_new` (NULL for docs the earlier stages already
    * rejected — near-dup runs over gate survivors only, mirroring the
    * batch chain's stage order), and `keep` = the full conjunction.
    *
    * Streaming-order semantics: within one batch the minimum id wins
    * (matching the batch canonical rule); across batches first arrival
    * wins. The composition over ALL waves equals the one-shot batch chain
    * (decideWeb keep → LSH clusters → keep canonical) whenever duplicate
    * clusters are band-cliques whose minimum id arrives no later than the
    * other members — transitive chains split across waves can differ,
    * exactly as [[decideStream]] documents for exact dedup. Replays are
    * idempotent: flags are a pure function of (batch, history artifacts).
    *
    * Scale shape: the history sides are NEVER reshuffled — each is
    * semi-pruned map-side against its (broadcast) batch key set, and only
    * the pruned survivors (bounded by the batch's own collision footprint)
    * join back. Gates are per-row; within-batch near-dup pairs cost LSH +
    * star contraction over the batch alone.
    */
  def decideWebAgainstHistory(
      batch: DataFrame,
      historyHashes: DataFrame,
      historyBands: DataFrame,
      idCol: String,
      textCol: String,
      numHashes: Int = 8,
      bands: Int = 2,
      shingle: Int = 3): DataFrame = {
    val id = col(idCol)
    val web = decideWeb(batch, idCol, textCol)
      .select(id, col("gopher_ok"), col("c4_ok"), col("rep_ok"),
        col("exact_canonical"))
    // exact vs history: prune history map-side against the broadcast batch
    // hash set, then flag batch docs against the (small) intersection
    val batchHashes = batch.select(id,
      md5(trim(lower(coalesce(col(textCol), lit(""))))).as("_ch"))
    val histHit = historyHashes.select(col("content_hash").as("_ch"))
      .join(broadcast(batchHashes.select(col("_ch")).distinct()), Seq("_ch"),
        "left_semi")
    val exactNew = batchHashes.join(histHit, Seq("_ch"), "left_anti")
      .select(id).withColumn("_en", lit(true))
    val gated = web.join(exactNew, Seq(idCol), "left")
      .select(id, col("gopher_ok"), col("c4_ok"), col("rep_ok"),
        col("exact_canonical"), coalesce(col("_en"), lit(false)).as("exact_new"))
    // near-dup over gate+exact survivors only (the batch chain's order)
    val survivors = batch.join(
      gated.filter(col("gopher_ok") && col("c4_ok") && col("rep_ok") &&
        col("exact_canonical") && col("exact_new")).select(id),
      Seq(idCol))
    val bandRows = Dedup.lshBandRows(
      survivors, idCol, textCol, numHashes, bands, shingle)
    val histBandHit = historyBands.select(col("band"), col("sig"))
      .join(broadcast(bandRows.select(col("band"), col("sig")).distinct()),
        Seq("band", "sig"), "left_semi")
    val nearOld = bandRows.join(histBandHit, Seq("band", "sig"), "left_semi")
      .select(id).distinct().withColumn("_nold", lit(true))
    val clusters = ConnectedComponents.assign(
      survivors.select(id), idCol,
      Dedup.minhashLshPairs(survivors, idCol, textCol, numHashes, bands, shingle),
      "id_a", "id_b")
    val near = clusters
      .join(nearOld, Seq(idCol), "left")
      .select(id,
        (id === col("cluster_id")).as("near_canonical"),
        (coalesce(col("_nold"), lit(false)) === false).as("near_new"))
    gated.join(near, Seq(idCol), "left")
      .select(id, col("gopher_ok"), col("c4_ok"), col("rep_ok"),
        col("exact_canonical"), col("exact_new"),
        col("near_canonical"), col("near_new"))
      .withColumn("keep",
        col("gopher_ok") && col("c4_ok") && col("rep_ok") &&
          col("exact_canonical") && col("exact_new") &&
          coalesce(col("near_canonical"), lit(false)) &&
          coalesce(col("near_new"), lit(false)))
  }

  /** Cluster representative selection: instead of keeping each duplicate
    * cluster's MINIMUM id (the [[ConnectedComponents]] default), keep its
    * best-scoring member — real pipelines keep the longest / highest-quality
    * variant of a near-dup group, not an arbitrary one. `scored` carries one
    * row per doc with `clusterCol` and `scoreCol`; ties break to the lowest
    * id (deterministic total order, the same rule as every argmax here).
    * One window keyed by cluster — the only shuffle.
    */
  /** Leakage-safe train/val/test split: near-duplicate documents must land
    * on the SAME side, or evaluation silently scores memorized training
    * text (the contamination failure Lee et al. 2022 measure). The split
    * decision is keyed on the duplicate-CLUSTER id (minimum member id,
    * [[ConnectedComponents.assign]] over the caller's dup pairs) instead
    * of the document id, so whole clusters move together; singleton
    * documents key on themselves, degenerating to [[Sampling.split]]
    * exactly. Output keeps `cluster_id` and adds `split` — the same
    * md5-deterministic, rerun-stable decision every sampler here makes.
    *
    * Scale shape: the pair clustering is the O(log n)-round star
    * contraction already spec'd scale-safe; the split itself is a per-row
    * hash compare. Nothing new shuffles.
    */
  def leakageSafeSplit(
      docs: DataFrame,
      idCol: String,
      pairs: DataFrame,
      aCol: String,
      bCol: String,
      fractions: Seq[(String, Double)],
      salt: String = ""): DataFrame = {
    val clusters = ConnectedComponents.assign(
      docs.select(col(idCol)), idCol, pairs, aCol, bCol)
    val keyed = docs.join(clusters, Seq(idCol), "left")
      .withColumn("_split_key", coalesce(col("cluster_id"), col(idCol).cast("long")))
    Sampling.split(keyed, "_split_key", fractions, salt).drop("_split_key")
  }

  def representatives(
      scored: DataFrame,
      idCol: String,
      clusterCol: String,
      scoreCol: String): DataFrame = {
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col(clusterCol))
      .orderBy(col(scoreCol).desc, col(idCol))
    scored
      .withColumn("_rn", org.apache.spark.sql.functions.row_number().over(w))
      .filter(col("_rn") === 1)
      .select(
        col(clusterCol),
        col(idCol).as("representative_id"),
        col(scoreCol).as("representative_score"))
  }
}
