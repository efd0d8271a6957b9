package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Deterministic hash-based sampling & splitting — the dataset-assembly
  * primitives of a training pipeline (reference A-surface has only
  * engine-side TABLESAMPLE, which is seed-dependent and not reproducible
  * across engines; these are).
  *
  * Every decision derives from an md5 over `id:salt` — a function of the
  * ROW, not of partitioning, ordering, executor count, or engine. That
  * buys three properties TABLESAMPLE cannot give at 100 TB:
  * reproducibility (same corpus + salt ⇒ same split, on any cluster
  * size), stability under incremental growth (a document's assignment
  * never changes when other documents arrive), and auditability (any
  * other engine can recompute membership — the DuckDB oracle does
  * exactly that).
  *
  * Scale shape: pure narrow projections/filters — no shuffle, no sort,
  * no RNG state; whole-stage-codegen'd hash arithmetic at scan speed.
  */
object Sampling {

  val Buckets = 10000

  /** Uniform bucket in [0, 10000) from the first 8 hex chars of
    * md5(id:salt) — enough entropy (32 bits) that bucket skew is
    * negligible, cheap enough to codegen. Distinct salts give
    * independent assignments (resampling = pick a new salt). */
  def hashBucket(id: Column, salt: String): Column =
    pmod(conv(substring(md5(concat(id.cast("string"), lit(":" + salt))), 1, 8),
      16, 10).cast("long"), lit(Buckets))

  /** Reproducible train/val/test assignment: buckets [0, train) → train,
    * [train, train+val) → val, rest → test, in 1/10000ths. */
  def split(df: DataFrame, idCol: String, salt: String,
            trainPerMyriad: Int = 8000, valPerMyriad: Int = 1000): DataFrame = {
    require(trainPerMyriad >= 0 && valPerMyriad >= 0 &&
      trainPerMyriad + valPerMyriad <= Buckets, "split fractions must fit in [0, 10000]")
    val b = hashBucket(col(idCol), salt)
    df.withColumn("bucket", b)
      .withColumn("split",
        when(col("bucket") < trainPerMyriad, "train")
          .when(col("bucket") < trainPerMyriad + valPerMyriad, "val")
          .otherwise("test"))
  }

  /** Temperature-flattened mixture weights (α = 1/2): the standard
    * multi-source sampling schedule w_i ∝ n_i^α that upweights small
    * sources relative to proportional sampling (α = 1) without the
    * uniform extreme (α = 0) — the multilingual/multi-domain mixing rule
    * (e.g. mBERT/XLM-R exponential smoothing). α is fixed at 1/2 so the
    * only irrational step is `sqrt`, which IEEE 754 requires correctly
    * rounded — any engine reproduces the weights bit-exactly (a general
    * `pow` carries no such guarantee, SURVEY §7 risk 5).
    *
    * Everything else is integer: sqrt(n_i) lands in exact micro-units,
    * the normalizer is an integer SUM of those (no FP accumulation-order
    * hazard), and each weight is one division rounded to micro-units.
    *
    * Scale shape: one partial-aggregated count per stratum (map-side
    * combine; output rows = |strata|, a handful), then a broadcast of the
    * single-row total back onto the strata — no corpus re-scan, no
    * unpartitioned window. Output: (stratum, n_docs, sqrt_e6, weight_e6). */
  def temperatureWeights(df: DataFrame, stratumCol: String): DataFrame = {
    val counts = df.groupBy(col(stratumCol))
      .agg(count(lit(1)).as("n_docs"))
      .withColumn("sqrt_e6", floor(sqrt(col("n_docs").cast("double")) * 1e6 + 0.5).cast("long"))
    val total = counts.agg(sum(col("sqrt_e6")).as("__tot"))
    counts.join(broadcast(total))
      .select(col(stratumCol), col("n_docs"), col("sqrt_e6"),
        floor(col("sqrt_e6").cast("double") / col("__tot").cast("double") * 1e6 + 0.5)
          .cast("long").as("weight_e6"))
  }

  /** Close the mixing loop: turn [[temperatureWeights]] into per-stratum
    * keep RATES against a document budget and apply them row-wise — the
    * end-to-end "sample the corpus to a B-doc mixture at α = 1/2" pass.
    * Stratum s targets budget·w_s docs, so its per-myriad rate is
    * floor(budget·weight_e6 / (100·n_s) + 0.5), capped at 10000 (a
    * stratum smaller than its target keeps everything — the cap is why
    * small sources can't be oversampled without replication). The
    * integer product budget·weight_e6 is exact, then ONE IEEE division
    * and a floor — any engine replays every rate, and [[hashBucket]]
    * makes each row's verdict a pure function of (id, salt).
    *
    * Scale shape: the weights/rates frame is |strata| rows → broadcast
    * onto the corpus scan; the corpus is touched twice (stratum counts,
    * then the filter pass) — two narrow scans beat persisting anything
    * corpus-sized. No shuffle crosses a corpus-sized frame. */
  def mixtureSample(df: DataFrame, idCol: String, stratumCol: String,
                    budgetDocs: Long, salt: String): DataFrame =
    applyMixtureRates(df, mixtureRates(df, stratumCol, budgetDocs),
      idCol, stratumCol, salt)

  /** The offline half of [[mixtureSample]]: per-stratum per-myriad keep
    * rates from a reference corpus. Split out so an ingest stream can
    * apply rates computed from the PREVIOUS snapshot
    * ([[graft.streaming.Streams.mixtureSampleStream]]) — production's
    * actual shape: rates are a batch artifact, application is row-local. */
  def mixtureRates(df: DataFrame, stratumCol: String,
                   budgetDocs: Long): DataFrame = {
    require(budgetDocs > 0, "budgetDocs must be positive")
    temperatureWeights(df, stratumCol)
      .select(col(stratumCol),
        least(lit(Buckets.toLong),
          floor((lit(budgetDocs) * col("weight_e6")).cast("double") /
              (lit(100.0) * col("n_docs").cast("double")) + 0.5)
            .cast("long")).as("rate_per_myriad"))
  }

  /** The row-local half: broadcast the |strata|-row rate frame onto any
    * (batch or streaming) frame and keep rows whose bucket clears their
    * stratum's rate. A stratum ABSENT from the rate frame — a source
    * that appeared after the rates were computed, the normal state of a
    * streaming ingest — keeps `defaultPerMyriad` (default: everything).
    * An inner join here would silently discard entire new sources with
    * no verdict and no signal; keep-by-default is the conservative
    * miss mode for a destructive filter, and the next rate recompute
    * folds the new source into the schedule. */
  def applyMixtureRates(df: DataFrame, rates: DataFrame, idCol: String,
                        stratumCol: String, salt: String,
                        defaultPerMyriad: Int = Buckets): DataFrame = {
    require(defaultPerMyriad >= 0 && defaultPerMyriad <= Buckets,
      "defaultPerMyriad is per-myriad: [0, 10000]")
    df.join(broadcast(rates), Seq(stratumCol), "left")
      .withColumn("rate_per_myriad",
        coalesce(col("rate_per_myriad"), lit(defaultPerMyriad.toLong)))
      .withColumn("bucket", hashBucket(col(idCol), salt))
      .filter(col("bucket") < col("rate_per_myriad"))
      .select(col(idCol), col(stratumCol), col("bucket"), col("rate_per_myriad"))
  }

  /** Stratified downsampling for dataset mixing: keep a row iff its
    * bucket falls below its stratum's rate (in 1/10000ths); strata
    * absent from `rates` keep `defaultPerMyriad`. The per-stratum rates
    * are exact in expectation and deterministic per row — the standard
    * way to hit a target source mix without a shuffle or a count pass. */
  def stratifiedSample(df: DataFrame, idCol: String, stratumCol: String,
                       rates: Map[String, Int], defaultPerMyriad: Int,
                       salt: String): DataFrame = {
    require((defaultPerMyriad +: rates.values.toSeq).forall(r => r >= 0 && r <= Buckets),
      "rates are per-myriad: [0, 10000]")
    val rate = rates.toSeq.sortBy(_._1).foldLeft(lit(defaultPerMyriad)) {
      case (acc, (s, r)) => when(col(stratumCol) === s, lit(r)).otherwise(acc)
    }
    df.withColumn("bucket", hashBucket(col(idCol), salt))
      .filter(col("bucket") < rate)
  }

  /** Per-group document cap — the per-domain cap of web-crawl curation
    * (Common Crawl pipelines cap documents per registrable domain so no
    * single mirror-heavy site dominates the mixture): keep at most `k`
    * rows per group, preferring the best under `rankBy`. `rankBy` must
    * be a TOTAL order within every group (end it with a unique id) or
    * the cut at rank k is nondeterministic.
    *
    * Scale shape: `row_number ≤ k` is the pattern Spark's optimizer
    * rewrites to WindowGroupLimit — each map task keeps only its local
    * top-k per group BEFORE the exchange, so the shuffle carries
    * O(groups × k), not the corpus. The group key partitions the
    * window; no global sort, no unpartitioned window. */
  def groupCap(df: DataFrame, groupCol: String, k: Int,
               rankBy: Seq[Column]): DataFrame = {
    require(k > 0, "k must be positive")
    require(rankBy.nonEmpty, "rankBy must order rows within each group")
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy(col(groupCol)).orderBy(rankBy: _*)
    df.withColumn("cap_rank", row_number().over(w))
      .filter(col("cap_rank") <= k)
  }

  /** Token-budget-bounded deterministic sampling: keep, per group, the
    * prefix of the md5(id:salt) permutation whose running token total
    * stays within `budgetTokens` — "give me ~N tokens per source,
    * uniformly at random, reproducibly" — the selection step of
    * assembling a fixed-token-budget training mixture. The permutation
    * is the [[hashBucket]] discipline (pure function of id+salt), so
    * the sample is engine/cluster-independent and auditable.
    *
    * Scale shape: a naive `sum() OVER (PARTITION BY group ORDER BY key)`
    * sorts EVERY row of a group in one task — with ~20 sources over
    * 100 TB that is a guaranteed straggler. Instead the [[GlobalSort]]
    * trick applied to a window: the key's first two hex chars split
    * each group's permutation into 256 ORDER-ALIGNED coarse buckets;
    * per-(group, bucket) token subtotals (a map-side-combined agg,
    * |groups|×256 output rows) prefix-sum into bucket OFFSETS on that
    * tiny frame; the offsets broadcast back, and the running total is
    * offset + a window partitioned by (group, bucket) — per-task state
    * is one bucket (~group/256), never the group. Buckets past the
    * budget are pruned BEFORE the window sort by the cheap guard
    * `offset < budget` (their every row's running total exceeds the
    * budget already). */
  def budgetSample(df: DataFrame, idCol: String, groupCol: String,
                   tokenCol: String, budgetTokens: Long, salt: String): DataFrame = {
    require(budgetTokens > 0, "budgetTokens must be positive")
    import org.apache.spark.sql.expressions.Window
    val keyed = df.select(col(idCol), col(groupCol), col(tokenCol))
      .withColumn("__k", md5(concat(col(idCol).cast("string"), lit(":" + salt))))
      .withColumn("__b", conv(substring(col("__k"), 1, 2), 16, 10).cast("int"))
    val offsets = keyed.groupBy(col(groupCol), col("__b"))
      .agg(sum(col(tokenCol)).cast("long").as("__bt"))
      .withColumn("__off",
        coalesce(sum(col("__bt")).over(
          Window.partitionBy(col(groupCol)).orderBy(col("__b"))
            .rowsBetween(Window.unboundedPreceding, -1)), lit(0L)))
      .filter(col("__off") <= budgetTokens) // whole-bucket prune past the cut
      // (<=, not <: a zero-token row sitting exactly at the budget line
      // still qualifies; anything with __off > budget provably cannot)
      .select(col(groupCol), col("__b"), col("__off"))
    keyed.join(broadcast(offsets), Seq(groupCol, "__b"))
      .withColumn("cum_tokens",
        (col("__off") + sum(col(tokenCol)).over(
          Window.partitionBy(col(groupCol), col("__b")).orderBy(col("__k"), col(idCol))
            .rowsBetween(Window.unboundedPreceding, Window.currentRow))).cast("long"))
      .filter(col("cum_tokens") <= budgetTokens)
      .select(col(idCol), col(groupCol), col(tokenCol), col("cum_tokens"))
  }

  /** PRIORITY-ordered token-budget selection: keep the best-first
    * prefix — rows ordered by (priority DESC, md5(id:salt), id) — whose
    * running token total stays within `budgetTokens`. The selection
    * step of targeted data curation: score docs (e.g.
    * [[TextAnalysis.domainAffinity]]'s milli score), then take the
    * highest-scoring slice that fits the training budget; ties broken
    * uniformly (the hash permutation) so a fat tie class at the cut is
    * sampled, not truncated by id order.
    *
    * CONTRACT: `priorityCol` must be a non-null integral in
    * [0, priorityMax] (milli/micro-scaled scores — the repo's integer
    * discipline already produces these).
    *
    * Scale shape: the [[budgetSample]] trick with the priority as the
    * leading coarse key — order-aligned buckets are (priorityMax −
    * priority, first 2 hex of the hash), so per-(priority, sub-bucket)
    * subtotals (≤ (priorityMax+1)×256 rows) prefix-sum into offsets on
    * a tiny frame, offsets broadcast back, and the running total's
    * window holds one sub-bucket — a fat tie class (every doc scoring
    * 0) splits 256 ways instead of sorting in one task. Buckets wholly
    * past the budget are pruned before any window sort. */
  def priorityBudgetSample(df: DataFrame, idCol: String, priorityCol: String,
                           tokenCol: String, budgetTokens: Long, salt: String,
                           priorityMax: Long = 1000L): DataFrame = {
    require(budgetTokens > 0, "budgetTokens must be positive")
    import org.apache.spark.sql.expressions.Window
    val keyed = df.select(col(idCol), col(priorityCol), col(tokenCol))
      .withColumn("__p", lit(priorityMax) - col(priorityCol))
      .withColumn("__k", md5(concat(col(idCol).cast("string"), lit(":" + salt))))
      .withColumn("__b", conv(substring(col("__k"), 1, 2), 16, 10).cast("int"))
    val offsets = keyed.groupBy(col("__p"), col("__b"))
      .agg(sum(col(tokenCol)).cast("long").as("__bt"))
      .withColumn("__off",
        coalesce(sum(col("__bt")).over(
          Window.orderBy(col("__p"), col("__b"))
            .rowsBetween(Window.unboundedPreceding, -1)), lit(0L)))
      .filter(col("__off") <= budgetTokens)
      .select(col("__p"), col("__b"), col("__off"))
    keyed.join(broadcast(offsets), Seq("__p", "__b"))
      .withColumn("cum_tokens",
        (col("__off") + sum(col(tokenCol)).over(
          Window.partitionBy(col("__p"), col("__b"))
            .orderBy(col("__k"), col(idCol))
            .rowsBetween(Window.unboundedPreceding, Window.currentRow))).cast("long"))
      .filter(col("cum_tokens") <= budgetTokens)
      .select(col(idCol), col(priorityCol), col(tokenCol), col("cum_tokens"))
  }

  /** Fixed-SIZE uniform sample per group — "exactly n docs per source,
    * reproducibly" (the per-rate [[stratifiedSample]] fixes the
    * FRACTION; evaluation sets and per-domain probes need the COUNT).
    * The sample is the bottom-k of the md5(id:salt) permutation per
    * group: deterministic, engine-independent, stable membership under
    * corpus growth only for the surviving ranks (an arriving doc with a
    * smaller hash displaces exactly one row — the bottom-k contract).
    *
    * Scale shape: rides [[graft.functions.TopKBy]] ('asc' on the hash),
    * so each map task ships at most n rows per group into the exchange
    * and nothing sorts a partition — the window-row_number form this
    * replaces shuffles the whole corpus. */
  def groupSample(df: DataFrame, idCol: String, groupCol: String,
                  n: Int, salt: String): DataFrame = {
    require(n > 0, "n must be positive")
    graft.sql.GraftExtensions.ensureRegistered(df.sparkSession)
    val keyed = df.withColumn("__k",
      md5(concat(col(idCol).cast("string"), lit(":" + salt))))
    val payload = struct(keyed.columns.map(col).toSeq: _*)
    keyed.groupBy(col(groupCol))
      .agg(call_function("top_k_by",
        struct(col("__k"), col(idCol)), payload, lit(n), lit("asc")).as("__t"))
      .select(explode(col("__t.item")).as("__row"))
      .select(col("__row.*"))
      .withColumnRenamed("__k", "sample_key")
  }

  /** Deterministic global training-order shuffle + shard assignment:
    * order the corpus by md5(id:salt), number it globally, and cut the
    * order into fixed-size shards — the "shuffle once, shard, then
    * stream shards sequentially" layout every large-scale training run
    * wants, reproducible on any engine/cluster because the permutation
    * is a pure function of (id, salt), never of partitioning or RNG
    * state (a new salt is a fresh epoch-independent permutation).
    *
    * Scale shape: the hash key is uniform, so the range-partitioned
    * global sort ([[graft.operators.GlobalSort]] — the one unavoidable
    * shuffle) gets perfectly balanced partitions by construction — no
    * skew, no straggler; numbering is zipWithIndex (narrow), never an
    * unpartitioned window; shard id/position are pure arithmetic on the
    * row number. Writing `shard` as the partition key afterward gives
    * the sequential-read layout directly. */
  def shuffleShards(df: DataFrame, idCol: String, salt: String,
                    shardSize: Long): DataFrame = {
    require(shardSize > 0, "shardSize must be positive")
    val keyed = df.withColumn("shuffle_key",
      md5(concat(col(idCol).cast("string"), lit(":" + salt))))
    GlobalSort.withRowNumber(keyed, "rn", col("shuffle_key"), col(idCol))
      .select(col(idCol), col("shuffle_key"),
        floor((col("rn") - 1) / lit(shardSize)).cast("long").as("shard"),
        pmod(col("rn") - 1, lit(shardSize)).as("shard_pos"))
  }

  /** Weighted SYSTEMATIC sampling (stochastic universal sampling,
    * Baker '87): k picks at equally-spaced positions p_i =
    * (2i+1)·W div 2k along the cumulative-weight axis of the
    * md5(id:salt)-permuted corpus — "k draws proportional to weight,
    * reproducibly", the low-variance alternative to k independent
    * weighted draws (every row with w ≥ W/k is GUARANTEED picks, no
    * lottery; the md5 permutation supplies the randomness, so the
    * design stays a randomized sampler while staying a pure function
    * of (ids, weights, salt)). Rows heavier than the stride are picked
    * multiple times — `n_picks` is the exact multiplicity, and
    * Σ n_picks = k ALWAYS (the midpoint positions all land in [0, W)).
    *
    * Exactness: no floats anywhere — the number of pick positions
    * below x is cnt(x) = min(k, (2kx + W − 1) div 2W) (all operands
    * non-negative, so trunc and floor division agree across engines),
    * and a row's multiplicity is cnt(cum + w) − cnt(cum). The oracle
    * replays the permutation, the prefix sum, and the closed form.
    *
    * Scale shape: the [[budgetSample]] two-level prefix sum — 256
    * order-aligned coarse buckets from the key's first byte, per-bucket
    * subtotals prefix-summed on a 256-row frame, offsets broadcast
    * back, running total windowed per bucket (per-task state is
    * corpus/256, never the corpus). One extra 1-row aggregate fetches
    * W for the overflow guard (2k·W must stay in a long — at larger
    * k·W, pre-scale the weights). */
  def systematicSample(df: DataFrame, idCol: String, wCol: String,
                       k: Int, salt: String): DataFrame = {
    require(k > 0, "k must be positive")
    import org.apache.spark.sql.expressions.Window
    val keyed = df.select(col(idCol), col(wCol).cast("long").as("w"))
      .filter(col("w") > 0) // zero/negative mass can never be picked
      .withColumn("__k", md5(concat(col(idCol).cast("string"), lit(":" + salt))))
      .withColumn("__b", conv(substring(col("__k"), 1, 2), 16, 10).cast("int"))
    val offsets = keyed.groupBy(col("__b"))
      .agg(sum(col("w")).as("__bt"))
      .withColumn("__off",
        coalesce(sum(col("__bt")).over(
          Window.orderBy(col("__b"))
            .rowsBetween(Window.unboundedPreceding, -1)), lit(0L)))
      .select(col("__b"), col("__off"))
    val totRow = keyed.agg(sum(col("w"))).collect()(0) // 1-row: W + guard
    if (totRow.isNullAt(0))
      return keyed.select(col(idCol), col("w"), col("w").as("cum_prev"),
        col("w").as("n_picks")).limit(0)
    val wTotal = totRow.getLong(0)
    require(wTotal <= (Long.MaxValue - wTotal) / (2L * k),
      s"2k*W overflows a long (W=$wTotal, k=$k): pre-scale the weights")
    val cnt = (x: String) =>
      s"least(CAST($k AS BIGINT), (2 * $k * ($x) + $wTotal - 1) DIV (2 * $wTotal))"
    keyed.join(broadcast(offsets), "__b")
      .withColumn("cum_prev",
        col("__off") + coalesce(sum(col("w")).over(
          Window.partitionBy(col("__b")).orderBy(col("__k"), col(idCol))
            .rowsBetween(Window.unboundedPreceding, -1)), lit(0L)))
      .withColumn("n_picks",
        expr(s"${cnt("cum_prev + w")} - ${cnt("cum_prev")}"))
      .filter(col("n_picks") > 0)
      .select(col(idCol), col("w"), col("cum_prev"), col("n_picks"))
  }
}
