package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Text-analysis operators for training-data pipelines: token counting,
  * quality scoring, marker-based language ID. Pure narrow column
  * expressions — no shuffle, no UDF; every function whole-stage-codegens
  * and runs at scan speed over 100 TB.
  */
object TextAnalysis {

  private def words(textCol: Column): Column = split(trim(textCol), "\\s+")

  /** English-ish function words used by quality scoring + language ID.
    * Marker sets per language (tiny on purpose — the heuristic's value is
    * its determinism and zero cost, not linguistic depth). */
  val langMarkers: Seq[(String, Seq[String])] = Seq(
    "de" -> Seq("der", "die", "das", "und", "ist"),
    "en" -> Seq("the", "a", "and", "of", "is"),
    "es" -> Seq("el", "los", "las", "es", "y"),
    "fr" -> Seq("le", "la", "les", "et", "est"))

  /** Per-document stats: whitespace token count, a BPE-ish subword
    * estimate (runs of letters / digits / single other chars), average
    * token length, stopword ratio, and a composite quality score. */
  def stats(docs: DataFrame, idCol: String, textCol: String): DataFrame = {
    val w = words(col(textCol))
    val stop = typedlit(langMarkers.flatMap(_._2).distinct.sorted)
    docs.select(
      col(idCol).as("doc_id"),
      size(w).as("n_tokens"),
      length(col(textCol)).as("n_chars_measured"),
      size(expr(s"regexp_extract_all($textCol, '[a-z]+|[0-9]+|[^a-z0-9\\\\s]', 0)"))
        .as("n_subword_tokens"),
      round(aggregate(transform(w, t => length(t).cast("double")),
        lit(0.0d), (acc, x) => acc + x) / size(w), 6).as("avg_token_len"),
      round(size(filter(w, t => array_contains(stop, t))).cast("double") / size(w), 6)
        .as("stopword_ratio"))
      // quality: long-enough docs with moderate stopword density
      .withColumn("quality_score", round(
        least(col("n_tokens").cast("double") / 64d, lit(1.0d)) *
          (lit(1.0d) - col("stopword_ratio")), 6))
  }

  /** Exact top-k vocabulary: whitespace tokens ranked by occurrence count
    * (ties by token, so the cut is total and reproducible) with document
    * frequency alongside — the vocab-building / heavy-hitters pass of a
    * training pipeline.
    *
    * Scale shape: one hash aggregation with map-side partial combine
    * (token cardinality ≪ token occurrences), then a TakeOrdered top-k —
    * no global sort, no single-partition window. */
  def vocabTopK(docs: DataFrame, idCol: String, textCol: String, k: Int): DataFrame =
    docs.select(col(idCol).as("doc_id"), explode(words(col(textCol))).as("token"))
      .filter(col("token") =!= "")
      .groupBy(col("token"))
      .agg(count(lit(1)).as("n_occurrences"), count_distinct(col("doc_id")).as("n_docs"))
      .orderBy(col("n_occurrences").desc, col("token"))
      .limit(k)

  /** EXACT heavy hitters over an UNBOUNDED item domain — every item
    * whose frequency exceeds n/(k+1) of the n total items, with its
    * exact count. The classic sketch-then-recount two-pass:
    *
    *   1. one [[graft.functions.MisraGries]] aggregation (≤ k counters
    *      per partial, map-side combined — the shuffle carries ≤ k
    *      entries per map task) yields a candidate array that PROVABLY
    *      contains every true heavy hitter (undercount ≤ n/(k+1),
    *      Agarwal et al. PODS'12), alongside the exact total n;
    *   2. a second scan recounts ONLY candidate-matching rows — the
    *      single-row (candidates, n) frame broadcasts, the candidate
    *      explode is ≤ k rows, the recount's group state is ≤ k keys —
    *      and the exact filter `cnt · (k+1) > n` keeps precisely the
    *      true heavy hitters.
    *
    * The output is therefore EXACT and deterministic even though the
    * intermediate candidate set is partition-order-dependent (the LSH
    * candidates discipline: a nondeterministic superset, a deterministic
    * final answer). Contrast with [[vocabTopK]]'s plain count aggregate,
    * whose hash state is one counter per DISTINCT item: right for a
    * bounded vocabulary, a job-killer over URLs / n-grams / session ids
    * at 100 TB, where this operator's state stays k counters regardless
    * of domain size. Two narrow scans beat persisting the exploded item
    * stream (strictly larger than the input — the [[vocabCoverage]]
    * discipline). Nulls are excluded from both n and the candidates.
    * Output: (item, cnt, n_items). */
  def heavyHitters(items: DataFrame, itemCol: Column, k: Int): DataFrame = {
    require(k > 0, "k must be positive")
    val spark = items.sparkSession
    graft.sql.GraftExtensions.ensureRegistered(spark)
    val it = items.select(itemCol.as("item")).filter(col("item").isNotNull)
    val sketch = it.agg(
      expr(s"misra_gries(item, $k)").as("cands"),
      count(lit(1)).as("n_items"))
    heavyHittersRecount(it, sketch, k)
  }

  /** WEIGHTED [[heavyHitters]]: every item whose total WEIGHT exceeds
    * W/(k+1) of the total weight W, with its exact weight sum — the
    * value-weighted census (bytes per domain, spend per account,
    * compute per tenant) where counting occurrences answers the wrong
    * question. Same two-pass exactness argument with mass in place of
    * count: the weighted Misra-Gries undercount is ≤ W/(k+1) (each
    * reduction retires (k+1)·δ mass), so the candidate array is a
    * provable superset and the exact re-sum restricted to the broadcast
    * candidates yields precisely the true heavy items. Weights must be
    * positive longs (pre-scale money/bytes to integer units — the
    * fixed-point discipline); zero/negative/null-weight rows are
    * excluded from both W and the candidates, as are null items.
    * Output: (item, w_sum, w_total). */
  def weightedHeavyHitters(items: DataFrame, itemCol: Column,
                           weightCol: Column, k: Int): DataFrame = {
    require(k > 0, "k must be positive")
    graft.sql.GraftExtensions.ensureRegistered(items.sparkSession)
    val it = items.select(itemCol.as("item"), weightCol.as("w"))
      .filter(col("item").isNotNull && col("w").isNotNull && col("w") > 0)
    val sketch = it.agg(
      expr(s"misra_gries_weighted(item, w, $k)").as("cands"),
      sum(col("w")).as("w_total"))
    val cands = sketch.select(explode(col("cands")).as("item"), col("w_total"))
    it.join(broadcast(cands), "item")
      .groupBy(col("item"), col("w_total"))
      .agg(sum(col("w")).as("w_sum"))
      .filter(col("w_sum") * (k + 1) > col("w_total"))
      .select(col("item"), col("w_sum"), col("w_total"))
  }

  /** [[heavyHitters]] PER GROUP: every item exceeding its own group's
    * n_g/(k+1) frequency threshold — per-language stopwords, per-domain
    * boilerplate, per-feed hot keys. Same two-pass exactness argument,
    * applied group-locally: the sketch aggregation keys on the group
    * (state ≤ k counters PER GROUP, map-side combined), the candidate
    * table is ≤ |groups|·k rows, and the recount joins on
    * (group, item) equality.
    *
    * The candidate broadcast is the load-bearing scale choice: it is
    * what lets the item stream pass ONE shuffle-free scan instead of
    * being shuffled onto the candidates (corpus-sized exchange). It
    * requires |groups|·k rows to fit a broadcast — languages, sources,
    * feeds all do; for an unbounded group domain, shard the group space
    * and run per-shard (the [[packSequences]] bucketing discipline).
    * Rows with a NULL group key are EXCLUDED (like null items): a null
    * group would be sketched but could never equi-join back through the
    * recount — silent loss; callers who want an "unknown" group must
    * coalesce to a sentinel first. Output: (groupCol, item, cnt,
    * n_items) with n_items = the GROUP's total. */
  def heavyHittersPerGroup(items: DataFrame, groupCol: String,
                           itemCol: Column, k: Int): DataFrame = {
    require(k > 0, "k must be positive")
    graft.sql.GraftExtensions.ensureRegistered(items.sparkSession)
    val it = items.select(col(groupCol), itemCol.as("item"))
      .filter(col("item").isNotNull && col(groupCol).isNotNull)
    val sk = it.groupBy(col(groupCol)).agg(
      expr(s"misra_gries(item, $k)").as("cands"),
      count(lit(1)).as("n_items"))
    val cands = sk.select(col(groupCol), explode(col("cands")).as("item"),
      col("n_items"))
    it.join(broadcast(cands), Seq(groupCol, "item"))
      .groupBy(col(groupCol), col("item"), col("n_items"))
      .agg(count(lit(1)).as("cnt"))
      .filter(col("cnt") * (k + 1) > col("n_items"))
      .select(col(groupCol), col("item"), col("cnt"), col("n_items"))
  }

  /** The exact-recount second pass of [[heavyHitters]], separable so a
    * STREAMING sketch (st36: the Misra-Gries aggregate running in a
    * Complete-mode streaming query) can be certified by the same batch
    * verification. `sketch` is the single-row (cands array<string>,
    * n_items long) frame; `items` must be (a re-derivation of) the
    * stream the sketch summarized, with the item column named `item`. */
  def heavyHittersRecount(items: DataFrame, sketch: DataFrame, k: Int): DataFrame = {
    val cands = sketch.select(explode(col("cands")).as("item"), col("n_items"))
    items.select(col("item")).filter(col("item").isNotNull)
      .join(broadcast(cands), "item")
      .groupBy(col("item"), col("n_items"))
      .agg(count(lit(1)).as("cnt"))
      .filter(col("cnt") * (k + 1) > col("n_items"))
      .select(col("item"), col("cnt"), col("n_items"))
  }

  /** Blocklist filter (the C4 bad-words pass): per document, how many
    * DISTINCT blocklist terms its lowercased tokens contain, and the
    * keep verdict (zero hits). The blocklist is a plan-time literal
    * array, so the whole operator is a shuffle-free, codegen'd
    * projection that runs at scan speed — the correct shape for a
    * term-list filter at 100 TB (a join against a blocklist TABLE is
    * only warranted when the list outgrows a broadcast, ~millions of
    * terms).
    *
    * Term matching is exact whole-token (the C4 convention), so
    * "assassin" does not trip a "ass" entry — substring matching is a
    * policy choice, not a default. */
  def blocklistFilter(docs: DataFrame, idCol: String, textCol: String,
                      terms: Seq[String]): DataFrame = {
    require(terms.nonEmpty, "blocklist must not be empty")
    val list = typedlit(terms.map(_.toLowerCase).distinct.sorted)
    val toks = array_distinct(filter(words(lower(col(textCol))), t => t =!= ""))
    docs.select(col(idCol).as("doc_id"),
        size(array_intersect(toks, list)).cast("long").as("n_blocked_terms"))
      .withColumn("keep", col("n_blocked_terms") === 0)
  }

  /** First BPE training iteration (Sennrich et al. ACL'16): count every
    * adjacent CHARACTER pair inside whitespace tokens, corpus-wide, and
    * return the top-k merge candidates — the inner loop of training a
    * tokenizer over the corpus the engine curates. Exact integer counts
    * with a total (count DESC, pair) tie order, so the merge table is
    * reproducible across engines and runs.
    *
    * Scale shape: token explode → per-token pair explode (both narrow,
    * re-derived from the scan — the [[freqScore]] discipline: the pair
    * stream is strictly larger than the text, so persisting it would
    * spill more than the dataset) → pair-keyed count with map-side
    * combine (state = distinct pairs ≈ alphabet², tiny) → TakeOrdered
    * top-k, no global sort. */
  def bpePairs(docs: DataFrame, idCol: String, textCol: String,
               k: Int = 50): DataFrame =
    docs.select(explode(filter(words(col(textCol)), t => t =!= "")).as("w"))
      .filter(length(col("w")) >= 2)
      .select(explode(transform(sequence(lit(1), length(col("w")) - 1),
        i => col("w").substr(i, lit(2)))).as("pair"))
      .groupBy(col("pair"))
      .agg(count(lit(1)).as("n_occurrences"))
      .orderBy(col("n_occurrences").desc, col("pair"))
      .limit(k)

  /** Iterative BPE TRAINING (Sennrich et al., "Neural Machine Translation
    * of Rare Words with Subword Units", ACL'16) — the full merge loop
    * [[bpePairs]] is iteration 1 of. Returns the learned merge table:
    * one row per iteration (iteration, lhs, rhs, merged, n_occurrences),
    * where each iteration's (lhs, rhs) is the globally most frequent
    * adjacent symbol pair (count DESC, then lhs, rhs — a total order) in
    * the CURRENT segmentation, weighted by word frequency, and the merge
    * is applied left-to-right non-overlapping before the next count.
    *
    * Trains on the word DICTIONARY, not the corpus: one corpus pass
    * builds (word-type, freq) — dictionary size is sublinear in corpus
    * size, so at 100 TB every later iteration runs over the (small)
    * vocab frame, never re-reading the corpus. This is how production
    * BPE trainers are shaped. Word universe: lowercase `[a-z0-9]+`
    * types (the normalization makes symbol strings delimiter-safe; see
    * below).
    *
    * Segmentation representation: each word is a wrapped symbol string
    * `|s1 |s2 ... ` — every symbol prefixed `|` and suffixed ` `, both
    * impossible INSIDE a symbol (alphanumeric alphabet). A merge of
    * (a, b) is then exactly `replace(s, "|a |b ", "|ab ")`: the wrapper
    * makes partial-symbol matches impossible, and string replace's
    * left-to-right non-overlapping semantics are BPE's merge semantics
    * — and replay verbatim in the DuckDB oracle's `replace`, which is
    * what lets the whole training loop value-oracle as an unrolled CTE.
    *
    * Driver-side state: ONE row per iteration (the argmax pair) +
    * `iters` merge rows — bounded by the iteration budget, never by
    * data. Each iteration's vocab frame is localCheckpoint-materialized
    * and the previous round's blocks freed (the connected-components
    * discipline); the merge table itself is a driver-built literal
    * frame, so nothing references the final checkpoint either. */
  def bpeTrain(docs: DataFrame, idCol: String, textCol: String,
               iters: Int): DataFrame = {
    require(iters >= 1 && iters <= 64, "bpeTrain: iters must be in [1, 64]")
    val spark = docs.sparkSession
    val vocab0 = docs
      .select(explode(filter(words(col(textCol)), t => t =!= "")).as("w0"))
      .select(lower(col("w0")).as("w"))
      .filter(col("w").rlike("^[a-z0-9]+$"))
      .groupBy(col("w")).agg(count(lit(1)).as("freq"))
      .select(regexp_replace(col("w"), "(.)", "|$1 ").as("s"), col("freq"))
    def materialize(df: DataFrame): (DataFrame, DataFrame) = {
      val cp = df.localCheckpoint(true)
      (cp.sparkSession.createDataFrame(cp.rdd, cp.schema), cp)
    }
    var (v, vCp) = materialize(vocab0)
    val merges = scala.collection.mutable.ArrayBuffer.empty[(Int, String, String, String, Long)]
    var it = 1
    var exhausted = false
    while (it <= iters && !exhausted) {
      val syms = transform(
        filter(split(col("s"), " "), x => x =!= ""),
        x => x.substr(lit(2), length(x) - 1))
      val top = v
        .select(col("freq"), syms.as("y"))
        .filter(size(col("y")) >= 2)
        .select(col("freq"), explode(transform(
          sequence(lit(1), size(col("y")) - 1),
          i => struct(element_at(col("y"), i).as("a"),
            element_at(col("y"), i + 1).as("b")))).as("p"))
        .groupBy(col("p.a").as("a"), col("p.b").as("b"))
        .agg(sum(col("freq")).as("cnt"))
        .orderBy(col("cnt").desc, col("a"), col("b"))
        .limit(1).collect()
      if (top.isEmpty) exhausted = true
      else {
        val (a, b, cnt) = (top(0).getString(0), top(0).getString(1), top(0).getLong(2))
        merges += ((it, a, b, a + b, cnt))
        val (nv, nCp) = materialize(v.select(
          org.apache.spark.sql.functions.replace(
            col("s"), lit(s"|$a |$b "), lit(s"|$a$b ")).as("s"),
          col("freq")))
        graft.util.Caching.freeCheckpoint(vCp)
        v = nv; vCp = nCp
        it += 1
      }
    }
    graft.util.Caching.freeCheckpoint(vCp)
    import spark.implicits._
    merges.toSeq.toDF("iteration", "lhs", "rhs", "merged", "n_occurrences")
  }

  /** APPLY the learned BPE merges — the tokenizer-training story closed:
    * [[bpeTrain]] on the dictionary, then segment every document with
    * the learned merge list and report per-document subword statistics
    * (n_words, n_subwords, subwords-per-word in milli — the
    * "how much does my tokenizer fragment this corpus" signal that
    * drives vocab-size decisions and flags out-of-domain text, the
    * subword analog of [[vocabCoverage]]).
    *
    * Segmentation is a pure function of the word: the wrapped-symbol
    * string with the k merges applied IN TRAINING ORDER — here as k
    * chained codegen'd `replace` calls in ONE narrow projection over
    * the exploded words. No join against a segmentation table, no
    * shuffle before the per-doc aggregate (map-side combinable): at
    * 100 TB the apply pass is a single linear scan. Subword count =
    * `|` occurrences in the segmented string (each symbol carries
    * exactly one marker).
    *
    * Driver-side state: the k merge rows [[bpeTrain]] already collects
    * — bounded by the iteration budget. */
  def bpeSegment(docs: DataFrame, idCol: String, textCol: String,
                 iters: Int): DataFrame = {
    val merges = bpeTrain(docs, idCol, textCol, iters).collect()
      .sortBy(_.getInt(0))
      .map(r => (r.getString(1), r.getString(2))).toSeq
    bpeSegmentApply(docs, idCol, textCol, merges)
  }

  /** The APPLY half of [[bpeSegment]] with an explicit merge list —
    * fully ROW-LOCAL: words split, filtered, and segmented inside
    * higher-order-function lambdas, subword counts folded with
    * `aggregate` — ZERO shuffle, so the same projection runs unchanged
    * on a STREAMING frame (st49: segment at ingest, stateless Append —
    * the st18 model-rides-the-plan shape, with the merge list as the
    * model). Documents with no qualifying word are dropped (the
    * exploded batch twin's semantics). */
  def bpeSegmentApply(docs: DataFrame, idCol: String, textCol: String,
                      merges: Seq[(String, String)]): DataFrame = {
    val ws = filter(
      transform(filter(words(col(textCol)), t => t =!= ""), w => lower(w)),
      w => w.rlike("^[a-z0-9]+$"))
    def segmented(w: Column): Column = {
      val wrapped = regexp_replace(w, "(.)", "|$1 ")
      merges.foldLeft(wrapped) { case (c, (a, b)) =>
        org.apache.spark.sql.functions.replace(c, lit(s"|$a |$b "), lit(s"|$a$b "))
      }
    }
    val subCounts = transform(ws, { w =>
      val s = segmented(w)
      (length(s) - length(regexp_replace(s, "\\|", ""))).cast("long")
    })
    docs
      .select(col(idCol).as("doc_id"),
        size(ws).cast("long").as("n_words"),
        aggregate(subCounts, lit(0L), (acc, x) => acc + x).as("n_subwords"))
      .filter(col("n_words") > 0)
      .select(col("doc_id"), col("n_words"), col("n_subwords"),
        floor(col("n_subwords").cast("double") / col("n_words").cast("double") * 1000 + 0.5)
          .cast("long").as("subwords_per_word_milli"))
  }

  /** Iterative WordPiece TRAINING (Schuster & Nakajima, ICASSP'12; the
    * BERT tokenizer's trainer) — [[bpeTrain]]'s loop with the LIKELIHOOD
    * selection rule: each iteration merges the pair maximizing
    * count(ab) / (count(a) · count(b)) over the current segmentation
    * (the unigram-LM likelihood gain of the merge), not the raw pair
    * count. Returns one row per iteration
    * (iteration, lhs, rhs, merged, n_occurrences, score_e9).
    *
    * The score is exact FIXED-POINT: `cnt · 10⁹ div (cnt_a · cnt_b)`
    * in pure BIGINT arithmetic, so the argmax total order
    * (score_e9 DESC, lhs, rhs) is bit-identical cross-engine — the same
    * discipline that lets [[bpeTrain]] value-oracle as an unrolled CTE.
    * The 10⁹ scale bounds the weighted pair count at ~9·10⁹ before the
    * multiply overflows a long — far above any fixture; a 100 TB train
    * run shrinks the constant (the score only needs ORDER, not
    * precision).
    *
    * Same representation and scale shape as [[bpeTrain]]: wrapped-symbol
    * dictionary (sublinear in corpus), merge = non-overlapping string
    * `replace`, one argmax row per iteration of driver traffic,
    * checkpoint-materialized rounds with previous blocks freed. */
  def wordpieceTrain(docs: DataFrame, idCol: String, textCol: String,
                     iters: Int): DataFrame = {
    require(iters >= 1 && iters <= 64, "wordpieceTrain: iters must be in [1, 64]")
    val spark = docs.sparkSession
    val vocab0 = docs
      .select(explode(filter(words(col(textCol)), t => t =!= "")).as("w0"))
      .select(lower(col("w0")).as("w"))
      .filter(col("w").rlike("^[a-z0-9]+$"))
      .groupBy(col("w")).agg(count(lit(1)).as("freq"))
      .select(regexp_replace(col("w"), "(.)", "|$1 ").as("s"), col("freq"))
    def materialize(df: DataFrame): (DataFrame, DataFrame) = {
      val cp = df.localCheckpoint(true)
      (cp.sparkSession.createDataFrame(cp.rdd, cp.schema), cp)
    }
    var (v, vCp) = materialize(vocab0)
    val merges = scala.collection.mutable.ArrayBuffer
      .empty[(Int, String, String, String, Long, Long)]
    var it = 1
    var exhausted = false
    while (it <= iters && !exhausted) {
      val syms = transform(
        filter(split(col("s"), " "), x => x =!= ""),
        x => x.substr(lit(2), length(x) - 1))
      val uni = v.select(col("freq"), explode(syms).as("sym"))
        .groupBy(col("sym")).agg(sum(col("freq")).as("ucnt"))
      val pairs = v
        .select(col("freq"), syms.as("y"))
        .filter(size(col("y")) >= 2)
        .select(col("freq"), explode(transform(
          sequence(lit(1), size(col("y")) - 1),
          i => struct(element_at(col("y"), i).as("a"),
            element_at(col("y"), i + 1).as("b")))).as("p"))
        .groupBy(col("p.a").as("a"), col("p.b").as("b"))
        .agg(sum(col("freq")).as("cnt"))
      val top = pairs
        .join(uni.select(col("sym").as("__ua"), col("ucnt").as("ua_cnt")),
          col("a") === col("__ua"))
        .join(uni.select(col("sym").as("__ub"), col("ucnt").as("ub_cnt")),
          col("b") === col("__ub"))
        .select(col("a"), col("b"), col("cnt"),
          expr("cnt * 1000000000L div (ua_cnt * ub_cnt)").as("score_e9"))
        .orderBy(col("score_e9").desc, col("a"), col("b"))
        .limit(1).collect()
      if (top.isEmpty) exhausted = true
      else {
        val (a, b, cnt, sc) = (top(0).getString(0), top(0).getString(1),
          top(0).getLong(2), top(0).getLong(3))
        merges += ((it, a, b, a + b, cnt, sc))
        val (nv, nCp) = materialize(v.select(
          org.apache.spark.sql.functions.replace(
            col("s"), lit(s"|$a |$b "), lit(s"|$a$b ")).as("s"),
          col("freq")))
        graft.util.Caching.freeCheckpoint(vCp)
        v = nv; vCp = nCp
        it += 1
      }
    }
    graft.util.Caching.freeCheckpoint(vCp)
    import spark.implicits._
    merges.toSeq.toDF("iteration", "lhs", "rhs", "merged",
      "n_occurrences", "score_e9")
  }

  /** Train→apply for WordPiece: [[wordpieceTrain]]'s merge list fed to
    * the SAME row-local apply pass as BPE ([[bpeSegmentApply]]) —
    * applying the k merges in training order reproduces the trainer's
    * final segmentation exactly, so the per-doc fragmentation report is
    * value-oracle-able against the unrolled training CTEs. (BERT's
    * greedy longest-match-first INFERENCE tokenizer is a different,
    * lossier apply rule — the training-order replay is the one the
    * trainer's own vocab state defines.) */
  def wordpieceSegment(docs: DataFrame, idCol: String, textCol: String,
                       iters: Int): DataFrame = {
    val merges = wordpieceTrain(docs, idCol, textCol, iters).collect()
      .sortBy(_.getInt(0))
      .map(r => (r.getString(1), r.getString(2))).toSeq
    bpeSegmentApply(docs, idCol, textCol, merges)
  }

  /** Tokenizer-vocabulary coverage: per-document OOV rate against the
    * corpus' own top-`k` vocabulary ([[vocabTopK]]) — the "how much of
    * this document would an in-domain tokenizer actually cover" signal
    * that decides vocab size / flags out-of-domain documents.
    *
    * Scale shape: the vocab is k rows → BROADCAST to the token stream;
    * the token explode is scanned twice (once to build the vocab, once
    * to score) — at 100 TB two passes over a narrow projection beat
    * persisting the exploded tokens, which are strictly larger than the
    * input text. Per-doc agg is map-side combinable. */
  def vocabCoverage(docs: DataFrame, idCol: String, textCol: String,
                    k: Int): DataFrame = {
    val toks = docs
      .select(col(idCol).as("doc_id"), explode(words(col(textCol))).as("token"))
      .filter(col("token") =!= "")
    val vocab = vocabTopK(docs, idCol, textCol, k)
      .select(col("token"), lit(1).as("__iv"))
    toks.join(broadcast(vocab), Seq("token"), "left")
      .groupBy(col("doc_id"))
      .agg(count(lit(1)).as("n_tokens"),
        sum(when(col("__iv").isNull, 1L).otherwise(0L)).as("n_oov"))
      .select(col("doc_id"), col("n_tokens"), col("n_oov"),
        floor(col("n_oov").cast("double") / col("n_tokens").cast("double") * 1e6 + 0.5)
          .cast("long").as("oov_e6"))
  }

  /** Fixed-window token chunking with stride — the pretraining chunking
    * pass: each document becomes overlapping windows of `chunkTokens`
    * whitespace tokens starting every `stride` tokens (stride <
    * chunkTokens ⇒ overlap). A window starts at every multiple of
    * `stride` below the token count, so trailing partial windows are
    * kept (they carry the document tail) and an empty document yields no
    * chunks.
    *
    * Pure generate/projection — no shuffle, no UDF; the explode runs at
    * scan speed and downstream repartitioning is the consumer's choice. */
  def chunkTokens(docs: DataFrame, idCol: String, textCol: String,
                  chunkTokens: Int, stride: Int): DataFrame = {
    require(chunkTokens > 0 && stride > 0, "chunkTokens and stride must be positive")
    val toks = filter(words(col(textCol)), t => t =!= "")
    val starts = filter(
      sequence(lit(0), greatest(size(toks) - 1, lit(0)), lit(stride)),
      s => s < size(toks))
    docs.select(col(idCol).as("doc_id"), toks.as("__t"), starts.as("__s"))
      .select(col("doc_id"),
        posexplode(transform(col("__s"), s => slice(col("__t"), s + 1, lit(chunkTokens)))))
      .select(col("doc_id"), col("pos").cast("int").as("chunk_idx"),
        size(col("col")).as("n_chunk_tokens"),
        concat_ws(" ", col("col")).as("chunk_text"))
  }

  /** Gopher/C4-style document quality rules: repetition and structure
    * signals plus a keep/drop verdict. Signals: word count, duplicate-word
    * fraction (1 − distinct/total), duplicate-bigram fraction (the
    * classic repetition filter — boilerplate and degenerate generations
    * repeat n-grams far more than natural text), mean word length.
    *
    * All ratios are emitted as exact-micro integers
    * (`floor(x·1e6 + 0.5)`) and the keep verdict compares in that integer
    * space — IEEE division is correctly rounded in every engine, so the
    * numbers (and the verdict) are bit-identical cross-engine; comparing
    * raw doubles against a threshold would be boundary-fragile.
    *
    * Pure narrow projection — no shuffle, no UDF; runs at scan speed,
    * which is the only acceptable cost class for a filter that sees every
    * document of a 100 TB corpus. */
  def qualityRules(docs: DataFrame, idCol: String, textCol: String,
                   minWords: Int = 30, maxWords: Int = 100000,
                   maxDupWordFrac: Double = 0.5,
                   maxDupBigramFrac: Double = 0.1,
                   minMeanWordLen: Double = 3.0,
                   maxMeanWordLen: Double = 10.0,
                   carry: Seq[String] = Nil): DataFrame = {
    def e6(x: Double): Long = math.floor(x * 1e6 + 0.5).toLong
    // Stage the tokenization ONCE per row: inlining `w` into every signal
    // would re-run the regex split ~15× per document (each column and its
    // guards re-evaluates the chain — measured 14× slower at sf0.1).
    // CollapseProject keeps the stage because a non-cheap expression
    // consumed multiple times is never re-inlined (SPARK-36718).
    // `carry` columns ride along untouched (a consumer like
    // [[corpusReport]] needs the source label without a corpus-sized
    // join back on doc_id).
    val staged = docs.select(col(idCol).as("doc_id") +:
      filter(words(col(textCol)), t => t =!= "").as("__w") +:
      carry.map(col): _*)
    val w = col("__w")
    val n = size(w)
    val nd = size(array_distinct(w))
    val bigrams = when(n >= 2,
      transform(sequence(lit(1), n - 1),
        i => concat(element_at(w, i), lit(" "), element_at(w, i + 1))))
      .otherwise(array().cast("array<string>"))
    val ndb = size(array_distinct(bigrams))
    val nb = greatest(n - 1, lit(0))
    val sumLen = aggregate(w, lit(0L), (acc, t) => acc + length(t))
    def microRatio(num: Column, den: Column): Column =
      when(den > 0, floor(num.cast("double") / den.cast("double") * 1e6 + 0.5))
        .otherwise(0L).cast("long")
    staged.select(
        col("doc_id") +: n.as("n_words") +:
        microRatio(n - nd, n).as("dup_word_frac_e6") +:
        microRatio(nb - ndb, nb).as("dup_bigram_frac_e6") +:
        microRatio(sumLen, n).as("mean_word_len_e6") +:
        carry.map(col): _*)
      .withColumn("keep",
        col("n_words").between(minWords, maxWords) &&
          col("dup_word_frac_e6") <= e6(maxDupWordFrac) &&
          col("dup_bigram_frac_e6") <= e6(maxDupBigramFrac) &&
          col("mean_word_len_e6").between(e6(minMeanWordLen), e6(maxMeanWordLen)))
  }

  /** Per-source corpus data card — the health report a corpus ships
    * with: document/token counts, the [[qualityRules]] keep rate, and
    * the CORPUS-WIDE exact-duplicate rate (a doc counts as duplicated
    * if its normalized fingerprint appears anywhere in the corpus, so
    * cross-source copies show up in BOTH sources' rows — the signal
    * that tells you which source is a mirror of which).
    *
    * Scale shape: one narrow per-doc projection (quality signals with
    * the source label and fingerprint carried — no corpus-sized join
    * back on doc_id), leased across its two consumers; a
    * fingerprint-keyed count with map-side combine; one equality join
    * on the fingerprint; a per-source rollup whose state is one row per
    * source. Ratios are micro-floored after integer sums — exactly
    * replayable. */
  def corpusReport(docs: DataFrame, idCol: String, textCol: String,
                   sourceCol: String): DataFrame = {
    val per = qualityRules(
        docs.withColumn("__fp", graft.operators.Dedup.fingerprintCol(col(textCol))),
        idCol, textCol, carry = Seq(sourceCol, "__fp"))
      .select(col(sourceCol), col("__fp"), col("n_words"), col("keep"))
    graft.util.Caching.leased(per) {
      val fpCounts = per.groupBy(col("__fp")).agg(count(lit(1)).as("__nc"))
      def ratioE6(num: Column, den: Column): Column =
        floor(num.cast("double") / den.cast("double") * 1e6 + 0.5).cast("long")
      per.join(fpCounts, "__fp")
        .groupBy(col(sourceCol).as("source"))
        .agg(count(lit(1)).as("n_docs"),
          sum(col("n_words")).as("n_tokens"),
          sum(when(col("keep"), 1L).otherwise(0L)).as("n_quality_keep"),
          sum(when(col("__nc") > 1, 1L).otherwise(0L)).as("n_exact_dup"))
        .select(col("source"), col("n_docs"), col("n_tokens"),
          col("n_quality_keep"), col("n_exact_dup"),
          ratioE6(col("n_tokens"), col("n_docs")).as("mean_tokens_e6"),
          ratioE6(col("n_exact_dup"), col("n_docs")).as("dup_frac_e6"))
    }
  }

  /** Cross-source content-overlap matrix — the pairwise companion of
    * [[corpusReport]]'s per-source dup rate: for every source pair, how
    * many distinct normalized fingerprints they SHARE, plus each side's
    * distinct count and the Jaccard of the two fingerprint sets. This is
    * the report that tells you source B is a mirror of source A before
    * you pay to dedup them document by document.
    *
    * Scale shape: corpus → distinct (source, fingerprint) pairs (one
    * hash-keyed aggregation, map-side combined — output ≤ corpus,
    * usually ≪); the pair matrix comes from a fingerprint-keyed
    * SELF-JOIN of that distinct frame — cost ∝ Σ_fp (#sources sharing
    * fp)², bounded by sources² per fingerprint, never documents²; the
    * per-source distinct counts are |sources| rows broadcast back on.
    * Jaccard is micro-floored after integer counts — exactly
    * replayable. */
  def sourceOverlap(docs: DataFrame, idCol: String, textCol: String,
                    sourceCol: String): DataFrame = {
    val fp = docs.select(col(sourceCol).as("source"),
        graft.operators.Dedup.fingerprintCol(col(textCol)).as("fp"))
      .distinct()
    graft.util.Caching.leased(fp) {
      val sizes = fp.groupBy(col("source")).agg(count(lit(1)).as("n_fp"))
      val l = fp.as("l"); val r = fp.as("r")
      l.join(r, col("l.fp") === col("r.fp") && col("l.source") < col("r.source"))
        .groupBy(col("l.source").as("source_a"), col("r.source").as("source_b"))
        .agg(count(lit(1)).as("n_shared"))
        .join(broadcast(sizes.select(col("source").as("source_a"), col("n_fp").as("n_a"))), "source_a")
        .join(broadcast(sizes.select(col("source").as("source_b"), col("n_fp").as("n_b"))), "source_b")
        .select(col("source_a"), col("source_b"), col("n_shared"),
          col("n_a"), col("n_b"),
          floor(col("n_shared").cast("double") /
              (col("n_a") + col("n_b") - col("n_shared")).cast("double") * 1e6 + 0.5)
            .cast("long").as("jaccard_e6"))
    }
  }

  /** Per-document distinctive top-k terms — the tf-idf-shaped keyword
    * pass of a curation pipeline, with a fully INTEGER ranking: terms
    * order by (term frequency DESC, corpus document frequency ASC, token)
    * — most frequent in the doc, rarest in the corpus — so the cut is
    * total, reproducible, and free of cross-engine float/log drift (a
    * floating `tf·ln(N/df)` score can differ in the last ulp between libm
    * implementations and flip ranks at ties).
    *
    * Scale shape: one (doc, token) hash aggregation with map-side
    * combine, a token-keyed aggregation for document frequency (rows per
    * token ≤ corpus doc count — the heavy-hitter key "the" is one row
    * out, so no reduce-side hot spot), a token-keyed shuffle join back
    * (AQE splits skewed token partitions), then a per-doc top-k window
    * over ≤ distinct-terms-per-doc rows. No global sort, no collect. */
  def topTerms(docs: DataFrame, idCol: String, textCol: String, k: Int = 3): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val tf = docs.select(col(idCol).as("doc_id"),
        explode(filter(words(col(textCol)), t => t =!= "")).as("token"))
      .groupBy(col("doc_id"), col("token"))
      .agg(count(lit(1)).as("tf"))
    graft.util.Caching.leased(tf) {
      val dfreq = tf.groupBy(col("token")).agg(count(lit(1)).as("df"))
      tf.join(dfreq, "token")
        .withColumn("rnk", row_number().over(Window.partitionBy(col("doc_id"))
          .orderBy(col("tf").desc, col("df").asc, col("token").asc)))
        .filter(col("rnk") <= k)
        .select(col("doc_id"), col("token"), col("tf"), col("df"), col("rnk"))
    }
  }

  /** Sparse lexical TF-IDF retrieval: the top-k corpus documents per
    * query document, scored by the inverted-index dot product
    * Σ_t tf_q(t) · tf_d(t) · idf(t) — similarity search with no learned
    * embedding, the BM25-family baseline every retrieval stack starts
    * from. idf is the raw rarity ratio N/df floored to micro-units
    * (`floor(1e6·N/df + 0.5)`): one correctly-rounded IEEE division per
    * TERM (not per row), then every per-pair contribution and the final
    * score are exact INTEGER products/sums — no ln(), no float
    * accumulation, so any engine replays the ranking bit-for-bit.
    * Ranks break ties by doc_id, making the top-k cut total.
    *
    * Scale shape: everything narrows to the query vocabulary BEFORE it
    * touches corpus-sized data — df is counted only for query tokens
    * (semi-restricted by a broadcast of the tiny query-token set, never
    * a vocab-wide aggregate-and-join), the corpus doc count is a
    * broadcast single row, and the probe is ONE broadcast hash join of
    * the per-(query, token) weight table against the corpus
    * term-frequency stream. The corpus tf table is built once with
    * map-side combine and leased across its three consumers (df, N,
    * probe — the [[topTerms]] discipline). The query side is tiny by
    * construction (queries ≪ corpus — the
    * [[graft.operators.Similarity.cosineTopK]] regime); the per-query
    * top-k is a rank-filtered window that plans as WindowGroupLimit —
    * partial limits before the shuffle, never a global sort. Long
    * arithmetic is overflow-safe while tf_q·tf_d·1e6·N/df < 2^63 — at
    * web scale rare terms (large N/df) have tf ≈ 1, and ANSI mode turns
    * any residual overflow into an error rather than a silent wrap.
    *
    * The probe's cost is the inverted-index bound Σ_q Σ_t df(t) over
    * scored terms — and with NO term pruning a stopword shared by
    * every query and every document makes that corpus × queries
    * (measured: 54× wall time at 10× data, graft.ScaleCheck round 6).
    * So each query scores only its `maxQueryTerms` RAREST corpus terms
    * (df asc, token asc — deterministic), the classic query-term
    * pruning of retrieval engines and the same rarest-first discipline
    * as [[graft.operators.Dedup.containmentPairs]]'s prefix filter:
    * rare terms carry the idf mass AND have short postings, so the
    * fan-out collapses while the ranking keeps its discriminative
    * terms. The prune ranks the query-vocab-sized frame, never the
    * corpus.
    *
    * BEHAVIOR CHANGE (round 6): `maxQueryTerms = 16` is a SEMANTIC
    * default, not just a cost cap — a query carrying more than 16
    * distinct corpus terms is ranked on its 16 rarest only, which can
    * reorder results versus the unpruned operator. Callers who need
    * full-vocabulary scoring must opt out explicitly by passing
    * `maxQueryTerms` at least their longest query's distinct-term
    * count (e.g. `Int.MaxValue`); there is deliberately no unpruned
    * default, because the unpruned probe is the measured 54×-at-10×
    * scale hazard above. */
  def tfidfTopK(corpus: DataFrame, queries: DataFrame, idCol: String,
                textCol: String, k: Int = 5, maxQueryTerms: Int = 16): DataFrame = {
    require(k > 0, "k must be positive")
    require(maxQueryTerms > 0, "maxQueryTerms must be positive")
    import org.apache.spark.sql.expressions.Window
    def tf(df: DataFrame, out: String, cnt: String) =
      df.select(col(idCol).as(out),
          explode(filter(words(col(textCol)), t => t =!= "")).as("token"))
        .groupBy(col(out), col("token")).agg(count(lit(1)).as(cnt))
    val tfC = tf(corpus, "doc_id", "tf_d")
    val tfQ = tf(queries, "q_id", "tf_q")
    graft.util.Caching.leased(tfC) {
      val qTokens = tfQ.select(col("token")).distinct()
      val dfreq = tfC.join(broadcast(qTokens), "token")
        .groupBy(col("token")).agg(count(lit(1)).as("df"))
      val nDocs = tfC.agg(countDistinct(col("doc_id")).as("n_docs"))
      // per-(query, token) weight over the query's rarest corpus terms
      // only — query-vocab-sized, ranked before anything corpus-sized
      val qSel = tfQ.join(dfreq, "token")
        .withColumn("trnk", row_number().over(Window.partitionBy(col("q_id"))
          .orderBy(col("df").asc, col("token").asc)))
        .filter(col("trnk") <= maxQueryTerms)
      val qWeights = qSel.crossJoin(broadcast(nDocs))
        .select(col("token"), col("q_id"),
          (col("tf_q") *
            floor(lit(1e6) * col("n_docs").cast("double") / col("df").cast("double") + 0.5)
              .cast("long")).as("w_e6"))
      tfC.join(broadcast(qWeights), "token")
        .groupBy(col("q_id"), col("doc_id"))
        .agg(sum(col("tf_d") * col("w_e6")).as("score_e6"),
          count(lit(1)).as("n_terms"))
        .withColumn("rnk", row_number().over(Window.partitionBy(col("q_id"))
          .orderBy(col("score_e6").desc, col("doc_id").asc)))
        .filter(col("rnk") <= k)
        .select(col("q_id"), col("doc_id"), col("score_e6"), col("n_terms"), col("rnk"))
    }
  }

  /** BM25 top-k retrieval (Robertson & Walker, SIGIR'94; the Okapi
    * scoring every lexical retrieval stack actually ships) — [[tfidfTopK]]
    * plus the two BM25 ingredients it lacks: TERM-FREQUENCY SATURATION
    * (tf·(k1+1)/(tf+k1·…): the 50th occurrence of a term adds almost
    * nothing) and LENGTH NORMALIZATION (b·dl/avgdl: long documents stop
    * winning by repetition). k1 = 1.2, b = 0.75, the standard constants.
    *
    * Engine-exact arithmetic (the [[tfidfTopK]] discipline, extended):
    *   - idf is the Robertson ratio (N−df+0.5)/(df+0.5) WITHOUT the ln —
    *     ln is not bit-replayable across engines; the ratio is spelled
    *     exactly as the integer (2(N−df)+1)·1000 div (2df+1), milli-units
    *   - the denominator tf + k1(1−b) + k1·b·dl·N/AD is scaled to
    *     micro-units: tf·1e6 + 3e5 + floor(9e5·(dl·N)/AD + 0.5) — dl·N is
    *     an exact integer product, then ONE correctly-rounded IEEE
    *     division (the idf_e6 rule), so both engines land the same long
    *   - each per-(query,doc,term) contribution is one integer floor
    *     division (idf_e3·22·tf_d·tf_q·1e6 div den_e6, ≈ score·1e4), and
    *     the final score an exact integer SUM — no float accumulation,
    *     total (score desc, doc_id) rank order.
    * Overflow bound: the numerator needs idf_e3·tf_d·tf_q < 2^63/22e6 ≈
    * 4.2e11, and idf_e3 ≤ ~667·N (df = 1), so the envelope is
    * N·tf_d·tf_q < 6.3e8 — e.g. N ≤ 6e4 docs at tf ≤ 100, N ≤ 6e6 at
    * tf ≤ 10. ANSI mode (Spark 4 default) errors loudly beyond it. At
    * larger corpora, cap the tf inputs (saturation makes counts beyond
    * ~2^6 carry almost no score anyway — the standard quantized-tf
    * practice) and/or drop the idf scale a decade; both constants are
    * in one place here and in the oracle.
    *
    * Scale shape: identical probe to [[tfidfTopK]] — everything narrows
    * to the query vocabulary before touching corpus-sized data; the ONE
    * new corpus-sized frame is per-doc length dl (a reuse of the leased
    * tf table, map-side combined), joined doc-keyed AFTER the broadcast
    * token probe has already narrowed the stream to candidate rows (AQE
    * broadcasts the candidate side). Same `maxQueryTerms` rarest-term
    * pruning, same SEMANTIC-default caveat. */
  def bm25TopK(corpus: DataFrame, queries: DataFrame, idCol: String,
               textCol: String, k: Int = 5, maxQueryTerms: Int = 16): DataFrame = {
    require(k > 0, "k must be positive")
    require(maxQueryTerms > 0, "maxQueryTerms must be positive")
    import org.apache.spark.sql.expressions.Window
    def tf(df: DataFrame, out: String, cnt: String) =
      df.select(col(idCol).as(out),
          explode(filter(words(col(textCol)), t => t =!= "")).as("token"))
        .groupBy(col(out), col("token")).agg(count(lit(1)).as(cnt))
    val tfC = tf(corpus, "doc_id", "tf_d")
    val tfQ = tf(queries, "q_id", "tf_q")
    graft.util.Caching.leased(tfC) {
      val qTokens = tfQ.select(col("token")).distinct()
      val dfreq = tfC.join(broadcast(qTokens), "token")
        .groupBy(col("token")).agg(count(lit(1)).as("df"))
      // one row: corpus doc count N and total token count AD (avgdl = AD/N)
      val stats = tfC.agg(countDistinct(col("doc_id")).as("n_docs"),
        sum(col("tf_d")).as("total_tokens"))
      val dls = tfC.groupBy(col("doc_id")).agg(sum(col("tf_d")).as("dl"))
      val qSel = tfQ.join(dfreq, "token")
        .withColumn("trnk", row_number().over(Window.partitionBy(col("q_id"))
          .orderBy(col("df").asc, col("token").asc)))
        .filter(col("trnk") <= maxQueryTerms)
      val qWeights = qSel.crossJoin(broadcast(stats))
        .select(col("token"), col("q_id"), col("tf_q"),
          expr("((2 * (n_docs - df) + 1) * 1000) div (2 * df + 1)").as("idf_e3"),
          col("n_docs"), col("total_tokens"))
      tfC.join(broadcast(qWeights), "token")
        .join(dls, "doc_id")
        .withColumn("den_e6",
          col("tf_d") * lit(1000000L) + lit(300000L) +
            floor(lit(9e5) * (col("dl") * col("n_docs")).cast("double") /
              col("total_tokens").cast("double") + 0.5).cast("long"))
        .withColumn("contrib_e4",
          expr("(idf_e3 * 22 * tf_d * tf_q * 1000000) div den_e6"))
        .groupBy(col("q_id"), col("doc_id"))
        .agg(sum(col("contrib_e4")).as("score_e4"), count(lit(1)).as("n_terms"))
        .withColumn("rnk", row_number().over(Window.partitionBy(col("q_id"))
          .orderBy(col("score_e4").desc, col("doc_id").asc)))
        .filter(col("rnk") <= k)
        .select(col("q_id"), col("doc_id"), col("score_e4"), col("n_terms"), col("rnk"))
    }
  }

  /** Persisted lexical (inverted) index — the ETL-time half of indexed
    * retrieval. [[tfidfTopK]]/[[bm25TopK]] re-derive term frequencies,
    * document frequencies and lengths from the raw corpus on EVERY
    * query, which is corpus-linear (measured ~3x at 10x data, ~7x at
    * 30x — ScaleCheck rounds 12); at 100 TB a retrieval query must
    * probe a stored index instead. This writes the classic structure
    * once, as three parquet tables under `out`:
    *
    *   - `postings/` — (token, doc_id, tf_d, dl), HASH-PARTITIONED into
    *     `buckets` directories by `tb = pmod(xxhash64(token), buckets)`
    *     and sorted by token within each file. A probe restricted to a
    *     token set filters on the `tb` partition column, so Spark's
    *     partition pruning opens only the matching directories — the
    *     posting-list seek of a retrieval engine, expressed as file
    *     layout. Doc length `dl` is DENORMALIZED into each posting (the
    *     standard impact-file trick) so BM25 scoring never joins a
    *     corpus-sized doc-length table at query time.
    *   - `df/` — (token, df): vocabulary-sized document frequencies.
    *   - `stats/` — one row (n_docs, total_tokens, n_buckets): the
    *     scalar corpus statistics plus the bucket count the probe needs
    *     to reproduce the build's partitioning hash.
    *
    * Build cost is one tokenize + tf aggregation (map-side combined),
    * a doc-keyed equality join for dl, and a token-bucket shuffle —
    * ~linear in the corpus, paid at ETL time (run it via
    * [[graft.script.LexicalIndexJob]], the AnnIndexJob pattern).
    * The tf intermediate is persisted across its four consumers and
    * released before return. */
  def writeLexicalIndex(corpus: DataFrame, idCol: String, textCol: String,
                        out: String, buckets: Int = 64,
                        filesPerBucket: Int = 8): Unit = {
    require(buckets > 0, "buckets must be positive")
    require(filesPerBucket > 0, "filesPerBucket must be positive")
    val tf = corpus.select(col(idCol).as("doc_id"),
        explode(filter(words(col(textCol)), t => t =!= "")).as("token"))
      .groupBy(col("doc_id"), col("token")).agg(count(lit(1)).as("tf_d"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    try {
      val dls = tf.groupBy(col("doc_id")).agg(sum(col("tf_d")).as("dl"))
      tf.join(dls, "doc_id")
        .select(col("token"), col("doc_id"), col("tf_d"), col("dl"),
          pmod(xxhash64(col("token")), lit(buckets.toLong)).cast("int").as("tb"))
        // distribute by (tb, doc_id-slice) so each bucket directory
        // holds ~filesPerBucket files, written in small row groups:
        // probe-side SCAN PARALLELISM lives in the layout. One file
        // per bucket makes the scoring join's row expansion run on
        // #buckets skewed tasks no matter the cluster size (measured:
        // the 30x warm panel probe read 40% OVER its direct twin until
        // this split — the round-9 ext98 one-row-group finding class);
        // a real 100 TB index is many files per bucket by nature, and
        // this keeps the fixture-scale layout the same shape.
        .repartition(col("tb"), pmod(col("doc_id"), lit(filesPerBucket.toLong)))
        .sortWithinPartitions(col("tb"), col("token"), col("doc_id"))
        .write.mode("overwrite")
        .option("parquet.block.size", (4 * 1024 * 1024).toString)
        .partitionBy("tb").parquet(s"$out/postings")
      tf.groupBy(col("token")).agg(count(lit(1)).as("df"))
        .write.mode("overwrite").parquet(s"$out/df")
      tf.agg(countDistinct(col("doc_id")).as("n_docs"),
          sum(col("tf_d")).as("total_tokens"))
        .withColumn("n_buckets", lit(buckets))
        .write.mode("overwrite").parquet(s"$out/stats")
    } finally tf.unpersist(blocking = false): Unit
  }

  /** INCREMENTAL index maintenance — the [[graft.queries]] ext148
    * (persisted-IVF delta) discipline applied to the lexical index: a
    * corpus APPEND of NEW documents updates the index from the delta
    * alone, never re-tokenizing the indexed base. Delta postings
    * append as one new file per touched bucket directory (the base
    * posting files are NOT rewritten — delta-proportional bytes); the
    * vocabulary-sized df table and one-row stats rewrite via a staged
    * temp-dir swap (they are the only corpus-independent frames).
    * Cost: tokenize(delta) + a bucket shuffle of delta postings + a
    * vocab-sized merge — at 100 TB a 0.1% daily append costs 0.1%,
    * not a rebuild.
    *
    * CONTRACT: `delta` holds documents whose ids are NOT in the index
    * (the CDC-append shape — feed it from
    * [[graft.streaming.Streams.drainVersionedChanges]]); re-appending
    * an indexed id would double its postings, and checking would scan
    * the corpus-sized postings — exactly the cost this op exists to
    * avoid. Single-writer maintenance op: a probe racing the append
    * can see fresh postings against the old df for a moment (torn
    * scores, never torn files); crash mid-append leaves a rebuildable
    * index (rebuild = [[writeLexicalIndex]], the fingerprint-cache
    * rule). */
  def appendToLexicalIndex(delta: DataFrame, idCol: String, textCol: String,
                           indexDir: String): Unit = {
    val spark = delta.sparkSession
    import org.apache.hadoop.fs.Path
    val statsRow = spark.read.parquet(s"$indexDir/stats").collect() match {
      case Array(one) => one
      case other => sys.error(
        s"lexical index at $indexDir: stats must hold exactly one row, found ${other.length}")
    }
    val buckets = statsRow.getAs[Int]("n_buckets")
    val tf = delta.select(col(idCol).as("doc_id"),
        explode(filter(words(col(textCol)), t => t =!= "")).as("token"))
      .groupBy(col("doc_id"), col("token")).agg(count(lit(1)).as("tf_d"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    try {
      val dls = tf.groupBy(col("doc_id")).agg(sum(col("tf_d")).as("dl"))
      tf.join(dls, "doc_id")
        .select(col("token"), col("doc_id"), col("tf_d"), col("dl"),
          pmod(xxhash64(col("token")), lit(buckets.toLong)).cast("int").as("tb"))
        .repartition(col("tb"))
        .sortWithinPartitions(col("tb"), col("token"), col("doc_id"))
        .write.mode("append")
        .option("parquet.block.size", (4 * 1024 * 1024).toString)
        .partitionBy("tb").parquet(s"$indexDir/postings")
      val deltaStats = tf.agg(countDistinct(col("doc_id")).as("n"),
        sum(col("tf_d")).as("t")).collect().head
      val dDf = tf.groupBy(col("token")).agg(count(lit(1)).as("df"))
      val mergedDf = spark.read.parquet(s"$indexDir/df")
        .withColumnRenamed("df", "df_base")
        .join(dDf.withColumnRenamed("df", "df_delta"), Seq("token"), "full_outer")
        .select(col("token"),
          (coalesce(col("df_base"), lit(0L)) +
            coalesce(col("df_delta"), lit(0L))).as("df"))
      // staged swap (Spark refuses overwrite-while-reading, and a swap
      // keeps the torn window to a namespace instant, never a partial
      // table): write aside, delete, rename
      val fs = new Path(indexDir).getFileSystem(spark.sparkContext.hadoopConfiguration)
      def swapIn(name: String)(write: String => Unit): Unit = {
        val tmp = s"$indexDir/.$name.__staging__"
        fs.delete(new Path(tmp), true)
        write(tmp)
        fs.delete(new Path(s"$indexDir/$name"), true)
        if (!fs.rename(new Path(tmp), new Path(s"$indexDir/$name")))
          throw new java.io.IOException(
            s"lexical index append: swap of $name at $indexDir failed")
      }
      swapIn("df")(tmp => mergedDf.write.parquet(tmp))
      val newDocs = statsRow.getAs[Long]("n_docs") + deltaStats.getAs[Long]("n")
      val newTokens = statsRow.getAs[Long]("total_tokens") +
        Option(deltaStats.get(1)).map(_.asInstanceOf[Long]).getOrElse(0L)
      swapIn("stats") { tmp =>
        import spark.implicits._
        Seq((newDocs, newTokens, buckets))
          .toDF("n_docs", "total_tokens", "n_buckets").coalesce(1)
          .write.parquet(tmp)
      }
    } finally tf.unpersist(blocking = false): Unit
  }

  /** Probe-side scaffolding shared by [[tfidfTopKIndexed]] and
    * [[bm25TopKIndexed]]: tokenize the query panel, rank each query's
    * terms by corpus rarity against the index's vocabulary-sized df
    * table (the same `maxQueryTerms` rarest-term pruning and
    * (df asc, token asc) tie rule as the direct operators), and open
    * ONLY the posting partitions those terms hash to.
    *
    * Returns (stats row, selected per-(query, token) frame, pruned
    * postings scan). The selected (token, bucket) pairs are collected
    * to the driver to become literal pushdown filters — bounded by
    * |queries| × maxQueryTerms by construction (the probe regime is
    * queries ≪ corpus, the [[graft.operators.Similarity.cosineTopK]]
    * contract; the collect is the same bounded class as the k-row
    * centroid collects in [[graft.operators.Similarity.ivfTopKIndexed]]).
    * The `tb` IN-filter prunes partitions at planning time — a
    * narrow-query probe opens a handful of directories out of
    * `n_buckets` no matter how large the corpus — and the residual
    * token IN-filter lands on token-sorted row groups. */
  private def lexicalProbe(spark: org.apache.spark.sql.SparkSession,
                           indexDir: String, queries: DataFrame,
                           idCol: String, textCol: String,
                           maxQueryTerms: Int): (org.apache.spark.sql.Row, DataFrame, DataFrame) = {
    import org.apache.spark.sql.expressions.Window
    val stats = spark.read.parquet(s"$indexDir/stats").collect() match {
      case Array(one) => one
      case other => sys.error(
        s"lexical index at $indexDir: stats must hold exactly one row, found ${other.length}")
    }
    val nBuckets = stats.getAs[Int]("n_buckets")
    val dfreq = spark.read.parquet(s"$indexDir/df")
    val tfQ = queries.select(col(idCol).as("q_id"),
        explode(filter(words(col(textCol)), t => t =!= "")).as("token"))
      .groupBy(col("q_id"), col("token")).agg(count(lit(1)).as("tf_q"))
    // tfQ feeds two plans (the vocab restriction + the selection join);
    // both consume EAGERLY inside this block (the localCheckpoint is
    // the materializing action), so a plain persist/finally releases
    // at exactly the right moment — no deferred lease needed
    tfQ.persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK): Unit
    val (qSel, selRows) = try {
      // restrict the vocabulary-sized df table to the tiny query vocab,
      // then the query-vocab-sized result broadcasts back onto tfQ
      val qdf = dfreq.join(broadcast(tfQ.select(col("token")).distinct()), "token")
      // PINNED (localCheckpoint, query-panel-sized ≤ |queries| × query
      // vocab): both consumers — the bounded collect below and the
      // caller's scoring join — read the pinned selection, so neither
      // re-derives the tokenization after the tfQ lease releases
      val sel = tfQ.join(broadcast(qdf), "token")
        .withColumn("trnk", row_number().over(Window.partitionBy(col("q_id"))
          .orderBy(col("df").asc, col("token").asc)))
        .filter(col("trnk") <= maxQueryTerms)
        .localCheckpoint()
      // bounded collect (≤ |queries|·maxQueryTerms rows — see scaladoc):
      // the selected tokens and their build-hash buckets become literals
      val rows = sel.select(col("token"),
        pmod(xxhash64(col("token")), lit(nBuckets.toLong)).cast("int").as("tb"))
        .distinct().collect()
      (sel, rows)
    } finally tfQ.unpersist(blocking = false): Unit
    val selTokens: Seq[Any] = selRows.map(_.getString(0)).toSeq
    val selBuckets: Seq[Any] = selRows.map(r => Int.box(r.getInt(1))).distinct.toSeq
    val postings = spark.read.parquet(s"$indexDir/postings")
      .filter(col("tb").isin(selBuckets: _*) && col("token").isin(selTokens: _*))
    (stats, qSel, postings)
  }

  /** [[tfidfTopK]] against a persisted [[writeLexicalIndex]] index:
    * identical arithmetic (the same one-IEEE-division-per-term idf_e6,
    * integer score sum, (score desc, doc_id) rank) and therefore
    * identical output, but the query touches NO corpus-sized frame —
    * the df lookup is a vocabulary-sized column-pruned scan, the
    * corpus doc count a stored scalar, and the postings read is
    * partition-pruned to the selected terms' buckets. Tokenize + df
    * recompute — the corpus-linear terms of the direct operator — are
    * paid once at index-build time. */
  def tfidfTopKIndexed(spark: org.apache.spark.sql.SparkSession,
                       indexDir: String, queries: DataFrame,
                       idCol: String, textCol: String,
                       k: Int = 5, maxQueryTerms: Int = 16): DataFrame = {
    require(k > 0, "k must be positive")
    require(maxQueryTerms > 0, "maxQueryTerms must be positive")
    import org.apache.spark.sql.expressions.Window
    val (stats, qSel, postings) =
      lexicalProbe(spark, indexDir, queries, idCol, textCol, maxQueryTerms)
    val nDocs = stats.getAs[Long]("n_docs")
    val qWeights = qSel.select(col("token"), col("q_id"),
      (col("tf_q") *
        floor(lit(1e6) * lit(nDocs).cast("double") / col("df").cast("double") + 0.5)
          .cast("long")).as("w_e6"))
    postings.join(broadcast(qWeights), "token")
      .groupBy(col("q_id"), col("doc_id"))
      .agg(sum(col("tf_d") * col("w_e6")).as("score_e6"),
        count(lit(1)).as("n_terms"))
      .withColumn("rnk", row_number().over(Window.partitionBy(col("q_id"))
        .orderBy(col("score_e6").desc, col("doc_id").asc)))
      .filter(col("rnk") <= k)
      .select(col("q_id"), col("doc_id"), col("score_e6"), col("n_terms"), col("rnk"))
  }

  /** [[bm25TopK]] against a persisted [[writeLexicalIndex]] index —
    * the same milli/micro-unit integer Okapi arithmetic, so the output
    * is identical to the direct operator; the doc length each posting
    * carries replaces the corpus-sized dl join, and N / total-token
    * statistics come from the stored one-row stats table. Same
    * overflow envelope as [[bm25TopK]] (N·tf_d·tf_q < 6.3e8; ANSI mode
    * errors loudly beyond it). */
  def bm25TopKIndexed(spark: org.apache.spark.sql.SparkSession,
                      indexDir: String, queries: DataFrame,
                      idCol: String, textCol: String,
                      k: Int = 5, maxQueryTerms: Int = 16): DataFrame = {
    require(k > 0, "k must be positive")
    require(maxQueryTerms > 0, "maxQueryTerms must be positive")
    import org.apache.spark.sql.expressions.Window
    val (stats, qSel, postings) =
      lexicalProbe(spark, indexDir, queries, idCol, textCol, maxQueryTerms)
    val nDocs = stats.getAs[Long]("n_docs")
    val totalTokens = stats.getAs[Long]("total_tokens")
    val qWeights = qSel.select(col("token"), col("q_id"), col("tf_q"),
      expr(s"((2 * (${nDocs}L - df) + 1) * 1000) div (2 * df + 1)").as("idf_e3"))
    postings.join(broadcast(qWeights), "token")
      .withColumn("den_e6",
        col("tf_d") * lit(1000000L) + lit(300000L) +
          floor(lit(9e5) * (col("dl") * lit(nDocs)).cast("double") /
            lit(totalTokens).cast("double") + 0.5).cast("long"))
      .withColumn("contrib_e4",
        expr("(idf_e3 * 22 * tf_d * tf_q * 1000000) div den_e6"))
      .groupBy(col("q_id"), col("doc_id"))
      .agg(sum(col("contrib_e4")).as("score_e4"), count(lit(1)).as("n_terms"))
      .withColumn("rnk", row_number().over(Window.partitionBy(col("q_id"))
        .orderBy(col("score_e4").desc, col("doc_id").asc)))
      .filter(col("rnk") <= k)
      .select(col("q_id"), col("doc_id"), col("score_e4"), col("n_terms"), col("rnk"))
  }

  /** Pretraining sequence packing: assign every document a position in a
    * fixed-size token-sequence layout (`seqTokens` tokens per training
    * sequence, documents packed back-to-back in doc_id order, split
    * across sequence boundaries exactly as a packed pretraining shard
    * is). The layout is the RUNNING TOTAL of token counts: a document
    * starts at global offset `cum − n`, so its sequence is
    * `(cum − n) div seqTokens` and its offset within it the remainder —
    * integer arithmetic end-to-end (no float, overflow-safe `div` on
    * longs at any corpus size).
    *
    * Scale shape: packing is inherently sequential, so the corpus is
    * sharded into `buckets` INDEPENDENT packing domains (by doc_id mod —
    * deterministic and engine-independent) and the running total is a
    * per-bucket window: `buckets` parallel sorts of corpus/buckets rows
    * each, no global sort, no single-partition window. Each bucket
    * yields its own sequence namespace (bucket, seq_id) — exactly how a
    * multi-worker tokenizer writes shards. */
  def packSequences(docs: DataFrame, idCol: String, textCol: String,
                    seqTokens: Int, buckets: Int = 64): DataFrame = {
    require(seqTokens > 0 && buckets > 0, "seqTokens and buckets must be positive")
    import org.apache.spark.sql.expressions.Window
    val staged = docs.select(col(idCol).as("doc_id"),
        size(filter(words(col(textCol)), t => t =!= "")).as("n_tokens"))
      .filter(col("n_tokens") > 0)
      .withColumn("bucket", pmod(col("doc_id"), lit(buckets)))
    val w = Window.partitionBy(col("bucket")).orderBy(col("doc_id"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    staged.withColumn("cum", sum(col("n_tokens")).over(w))
      .select(col("doc_id"), col("n_tokens"), col("bucket"),
        expr(s"(cum - n_tokens) div $seqTokens").as("seq_id"),
        ((col("cum") - col("n_tokens")) % seqTokens).as("seq_offset"))
  }

  /** Corpus-frequency document score — the model-free stand-in for a
    * perplexity filter: documents whose tokens are rare in the corpus
    * (OCR noise, mojibake, boilerplate IDs) score low, documents made of
    * common words score high. Emits per document the token count, the sum
    * and minimum of each token's corpus occurrence count, and their mean
    * — all exact integers except the final single IEEE division, rounded
    * to 6 dp, so the output is engine-reproducible (no log/exp drift, the
    * reason this uses raw frequencies rather than a log-prob score).
    *
    * Scale shape: two passes over the token stream. Pass one is a
    * token-keyed count with map-side partial combine (output = vocabulary
    * size, ≪ token occurrences). Pass two joins occurrences back to that
    * count table on the token key — AQE splits the skewed heavy-hitter
    * tokens — then aggregates per document with map-side combine. No
    * collect, no global sort; the corpus is scanned twice (re-tokenizing
    * beats persisting a corpus-sized exploded intermediate at 100 TB). */
  def freqScore(docs: DataFrame, idCol: String, textCol: String): DataFrame = {
    val toks = docs.select(col(idCol).as("doc_id"),
      explode(filter(words(col(textCol)), t => t =!= "")).as("token"))
    val counts = toks.groupBy(col("token")).agg(count(lit(1)).as("corpus_freq"))
    toks.join(counts, "token")
      .groupBy(col("doc_id"))
      .agg(count(lit(1)).as("n_tokens"),
        sum(col("corpus_freq")).as("sum_freq"),
        min(col("corpus_freq")).as("min_freq"))
      .withColumn("mean_freq",
        round(col("sum_freq").cast("double") / col("n_tokens"), 6))
  }

  /** Top-k adjacent-bigram collocations ranked by a PMI-shaped lift
    * ratio: count(w1 w2) · N / (count(w1) · count(w2)) — how much more
    * often the pair occurs than independence predicts. The ratio is
    * monotone in PMI (PMI = ln of it), so ranking by the ratio avoids the
    * cross-engine libm drift of ln while ordering identically; every
    * operand is cast to double first so both engines run the same four
    * correctly-rounded IEEE ops. Ties at the cut break by (w1, w2), so
    * the top-k boundary is total and reproducible.
    *
    * Scale shape: a bigram-keyed count and a token-keyed count, both with
    * map-side partial combine; the scalar corpus token total joins in as
    * a broadcast single row; two token-keyed joins attach unigram counts
    * (AQE splits heavy-hitter tokens); TakeOrdered top-k — no global
    * sort. The `minCount` floor prunes the hapax bigram tail before the
    * joins, which at 100 TB is most of the bigram table. */
  def collocations(docs: DataFrame, idCol: String, textCol: String,
                   k: Int = 50, minCount: Int = 5): DataFrame = {
    // Stage the tokenization ONCE per row (same lesson as qualityRules /
    // SPARK-36718): inlined, the split+filter re-evaluates for every of
    // its ~4 uses inside the bigram builder — measured 5.7s → 1.0s at
    // sf0.1 from this one projection barrier.
    val staged = docs.select(
      filter(words(col(textCol)), t => t =!= "").as("__w"))
    val w = col("__w")
    val bigrams = staged.select(explode(when(size(w) >= 2,
        transform(sequence(lit(1), size(w) - 1),
          i => struct(element_at(w, i).as("w1"), element_at(w, i + 1).as("w2"))))
        .otherwise(array().cast("array<struct<w1:string,w2:string>>"))).as("b"))
      .select(col("b.w1").as("w1"), col("b.w2").as("w2"))
      .groupBy(col("w1"), col("w2")).agg(count(lit(1)).as("n_pair"))
      .filter(col("n_pair") >= minCount)
    val uni = staged.select(explode(w).as("token"))
      .groupBy(col("token")).agg(count(lit(1)).as("n_tok"))
    val total = uni.agg(sum(col("n_tok")).as("n_total"))
    bigrams
      .join(uni.select(col("token").as("w1"), col("n_tok").as("n_w1")), "w1")
      .join(uni.select(col("token").as("w2"), col("n_tok").as("n_w2")), "w2")
      .crossJoin(broadcast(total))
      .select(col("w1"), col("w2"), col("n_pair"),
        round(col("n_pair").cast("double") * col("n_total").cast("double") /
          (col("n_w1").cast("double") * col("n_w2").cast("double")), 6).as("lift"))
      .orderBy(col("lift").desc, col("w1"), col("w2"))
      .limit(k)
  }

  /** TextRank keyword extraction (Mihalcea & Tarau, EMNLP'04): PageRank
    * over the corpus-level word co-occurrence graph, top-k words by
    * rank — the unsupervised keyword signal curation pipelines use for
    * topic tagging and stopword discovery where ext44's TF-IDF needs a
    * query and [[collocations]] ranks PAIRS.
    *
    * Graph: one node per word, one UNDIRECTED edge per ADJACENT bigram
    * INSTANCE (window 2, the [[collocations]] tokenization), restricted
    * to bigrams whose directed count ≥ `minCount` (noise gate; applied
    * to directed counts, so the gate itself is replayable). The counts
    * stay GROUPED as (src, dst, n) and feed
    * [[graft.operators.Graph.pageRankWeighted]] — provably equal to
    * running unweighted PageRank on the instance multiset, but each of
    * the `iters` join+agg rounds touches a dictionary-scale frame
    * (≤ min(instances, vocab²) rows, gated smaller) instead of the
    * TOKEN-scale bigram stream. One corpus-scale pass total: the count.
    *
    * PageRank runs on dense long ids ([[Graph.pageRank]] is long-keyed):
    * ids are row_number over the sorted surviving vocabulary — a
    * vocab-sized single-partition window, bounded by the minCount gate
    * (the q19-style top-k argument does not apply; at 100 TB the gate
    * is what keeps the vocab to dictionary size, and a hash id would
    * trade exactness for it). Determinism end-to-end: integer PageRank
    * (micro-units, trunc division on non-negative operands), sign-free,
    * final order (pr_e6 desc, word asc) — the oracle replays tokenize →
    * gate → weighted iterations → top-k exactly. */
  def textRank(docs: DataFrame, idCol: String, textCol: String,
               k: Int = 50, minCount: Int = 5, iters: Int = 10): DataFrame = {
    val staged = docs.select(
      filter(words(col(textCol)), t => t =!= "").as("__w"))
    val w = col("__w")
    val big = staged.select(explode(when(size(w) >= 2,
        transform(sequence(lit(1), size(w) - 1),
          i => struct(element_at(w, i).as("w1"), element_at(w, i + 1).as("w2"))))
        .otherwise(array().cast("array<struct<w1:string,w2:string>>"))).as("b"))
      .select(col("b.w1").as("w1"), col("b.w2").as("w2"))
    // ONE corpus-scale pass: the gated count. Everything downstream
    // (vocab window, expansion, id joins, final word join) references
    // `kept` 5+ times across the edges and result plans — uncheckpointed
    // that re-runs the tokenize+count shuffle per reference (measured
    // 7.9 s → 3.4 s at sf0.1 from this one materialization). Gated, so
    // the frame is vocab²-bounded — dictionary-sized, not corpus-sized.
    val kept = big.groupBy(col("w1"), col("w2")).agg(count(lit(1)).as("n_pair"))
      .filter(col("n_pair") >= minCount)
      .localCheckpoint(true)
    val vocab = kept.select(col("w1").as("word"))
      .unionByName(kept.select(col("w2").as("word"))).distinct()
      .withColumn("wid", row_number().over(
        org.apache.spark.sql.expressions.Window.orderBy(col("word"))).cast("long"))
    val ids = kept
      .join(vocab.select(col("word").as("w1"), col("wid").as("ia")), "w1")
      .join(vocab.select(col("word").as("w2"), col("wid").as("ib")), "w2")
    // both directions in ONE pass over ids (an explode of the two
    // orientations), not a self-union that evaluates the join twice;
    // weights stay GROUPED — pageRankWeighted's multiplicity semantics
    // make expansion to the token-scale instance multiset unnecessary
    val edges = ids.select(explode(array(
        struct(col("ia").as("src"), col("ib").as("dst"), col("n_pair").as("n")),
        struct(col("ib").as("src"), col("ia").as("dst"), col("n_pair").as("n")))).as("e"))
      .select(col("e.src"), col("e.dst"), col("e.n"))
    val pr = graft.operators.Graph.pageRankWeighted(edges, "src", "dst", "n", iters)
    // materialize the ≤ k-row result, then free the internal
    // checkpoints deterministically (the Graph.pageRank discipline:
    // checkpointed blocks cannot recompute, so free only AFTER the
    // flat multi-use-safe result exists)
    val result = pr.join(vocab, pr("node") === vocab("wid"))
      .select(col("word"), col("pr_e6"))
      .withColumn("rnk", row_number().over(
        org.apache.spark.sql.expressions.Window
          .orderBy(col("pr_e6").desc, col("word"))))
      .filter(col("rnk") <= k)
      .select(col("rnk").cast("long").as("rnk"), col("word"), col("pr_e6"))
      .localCheckpoint(true)
    graft.util.Caching.freeCheckpoint(kept)
    graft.util.Caching.freeCheckpoint(pr)
    result
  }

  /** DOCUMENT-LEVEL co-occurrence pair mining (the market-basket
    * frequent-pairs pass; contrast [[collocations]], which counts
    * ADJACENT bigrams): every unordered token pair contained together
    * in at least ⌈n_docs/supportDenom⌉ documents, with exact document
    * frequencies and the integer lift ratio. The vocabulary-correlation
    * signal a tokenizer/stopword/topic pipeline wants at corpus scale.
    *
    * A-priori pruning (Agrawal & Srikant, VLDB'94), which is LOSSLESS:
    * a pair in ≥ n/denom docs has both members in ≥ n/denom docs, so
    * restricting the pair build to frequent tokens drops no qualifying
    * pair. The remaining blowup — a doc holding f frequent tokens emits
    * C(f,2) pairs — is bounded by `maxPerDoc` (kept tokens per doc =
    * the top-`maxPerDoc` by global df, ties broken by token — a total,
    * engine-replayable order): C(64,2) ≈ 2k rows per doc worst case,
    * the [[Dedup.minhashLshCapped]] honesty discipline (the cap is part
    * of the operator's SEMANTICS and replays in the oracle; it only
    * bites on docs whose frequent-token count exceeds it).
    *
    * Scale shape: one distinct-(doc, token) projection; the df count is
    * a bounded-domain aggregate (one counter per distinct WORD — the
    * [[vocabTopK]] argument; for unbounded item domains run the
    * [[heavyHitters]] sketch first and mine among its candidates); the
    * df table joins back token-keyed (broadcast at word-vocab sizes);
    * pair emission is a per-doc sorted-array transform (no self-join,
    * no second shuffle) followed by ONE map-side-combined pair count.
    * All thresholds are RELATIVE (support·denom ≥ n_docs), so the same
    * query is scale-invariant across fixtures.
    *
    * milli_lift = ⌊1000 · pair_df · n_docs / (df_a · df_b)⌋ in exact
    * integer arithmetic (> 1000 ⇒ positively correlated); the envelope
    * 1000·pair·n < 2^63 holds to n ≈ 3·10⁹ docs per partition-run —
    * beyond that, mine per shard and merge.
    *
    * Output: (tok_a, tok_b, pair_df, df_a, df_b, n_docs, milli_lift),
    * tok_a < tok_b lexicographically. */
  def frequentPairs(docs: DataFrame, idCol: String, textCol: String,
                    supportDenom: Int = 10, maxPerDoc: Int = 64): DataFrame = {
    require(supportDenom > 0 && maxPerDoc > 1, "bad thresholds")
    val toks = docs.select(col(idCol).as("doc_id"),
        explode(array_distinct(filter(words(col(textCol)), t => t =!= "")))
          .as("token"))
    val nDocs = docs.select(countDistinct(col(idCol)).as("n_docs"))
    // a-priori: document frequency per token, kept iff df*denom >= n
    val df = toks.groupBy(col("token")).agg(count(lit(1)).as("df"))
      .crossJoin(broadcast(nDocs))
      .filter(col("df") * supportDenom >= col("n_docs"))
    val kept = toks.join(broadcast(df.select(col("token"), col("df"))), "token")
      .withColumn("rk", row_number().over(
        org.apache.spark.sql.expressions.Window.partitionBy(col("doc_id"))
          .orderBy(col("df").desc, col("token"))))
      .filter(col("rk") <= maxPerDoc)
    // per-doc sorted token array -> all i<j pairs in one codegen'd
    // transform (pair order = lexicographic, from sort_array)
    val arr = kept.groupBy(col("doc_id"))
      .agg(sort_array(collect_list(col("token"))).as("ts"))
    val pairs = arr.select(explode(flatten(transform(col("ts"),
        (x, i) => transform(slice(col("ts"), i + 2, size(col("ts"))),
          y => struct(x.as("a"), y.as("b")))))).as("p"))
      .select(col("p.a").as("tok_a"), col("p.b").as("tok_b"))
      .groupBy(col("tok_a"), col("tok_b")).agg(count(lit(1)).as("pair_df"))
      .crossJoin(broadcast(nDocs))
      .filter(col("pair_df") * supportDenom >= col("n_docs"))
    pairs
      .join(broadcast(df.select(col("token").as("tok_a"), col("df").as("df_a"))), "tok_a")
      .join(broadcast(df.select(col("token").as("tok_b"), col("df").as("df_b"))), "tok_b")
      .select(col("tok_a"), col("tok_b"), col("pair_df"),
        col("df_a"), col("df_b"), col("n_docs"),
        expr("CAST((1000 * pair_df * n_docs) DIV (df_a * df_b) AS BIGINT)")
          .as("milli_lift"))
  }

  /** Feature-hashing document vector (the hashing trick — Weinberger et
    * al., ICML'09): every token hashes to one of `dims` buckets and the
    * document's vector is the bucket-count histogram. The model-free way
    * to give every document a fixed-width lexical vector — the bridge
    * from the text tier into the similarity tier (cosine/ANN/clustering
    * operators run on these when no learned embedding exists, e.g. the
    * sf0.1 corpus where most docs carry none).
    *
    * The bucket hash is md5-derived (the [[Sampling.split]] recipe) so
    * any engine replays it; counts are exact integers, so the dense
    * vector (comma-joined — the gate's hasher cannot canonicalize array
    * cells) is bit-identical cross-engine.
    *
    * Scale shape: token explode → (doc, bucket)-keyed count with
    * map-side combine → one per-doc aggregation reassembling a
    * `dims`-entry map into the dense csv. No joins, no window; state per
    * doc is the dims-bounded map. */
  def hashEmbed(docs: DataFrame, idCol: String, textCol: String,
                dims: Int = 64): DataFrame = {
    require(dims > 0, "dims must be positive")
    val toks = docs.select(col(idCol).as("doc_id"),
      explode(filter(words(col(textCol)), t => t =!= "")).as("token"))
    toks.select(col("doc_id"), bucketOf(col("token"), dims).as("b"))
      .groupBy(col("doc_id"), col("b")).agg(count(lit(1)).as("c"))
      .groupBy(col("doc_id"))
      .agg(map_from_entries(collect_list(struct(col("b"), col("c")))).as("__m"),
        sum(col("c")).as("n_tokens"))
      .select(col("doc_id"), size(col("__m")).as("n_nonzero"), col("n_tokens"),
        array_join(transform(sequence(lit(0), lit(dims - 1)),
          j => coalesce(element_at(col("__m"), j), lit(0L)).cast("string")), ",")
          .as("vec_csv"))
  }

  /** Per-source token-length distribution — exact p25/p50/p90/p99 plus
    * mean and count: the length panel of a curation dashboard (length
    * cutoffs for [[qualityRules]], chunk/pack sizing for
    * [[chunkTokens]]/[[packSequences]] are read off these quantiles).
    * EXACT percentiles are right here because per-doc token counts are
    * bounded-cardinality (thousands of distinct values): Spark's
    * `percentile` aggregates a value→count map per group, so state is
    * O(distinct lengths), not O(docs), and that holds at 100 TB — the
    * q35 argument. Mean is an exact integer sum with one micro-floored
    * IEEE division; quantiles share DuckDB's linear-interpolation
    * definition, so the whole report replays cross-engine. */
  def lengthQuantiles(docs: DataFrame, idCol: String, textCol: String,
                      sourceCol: String): DataFrame =
    docs.select(col(sourceCol).as("source"),
        size(filter(words(col(textCol)), t => t =!= "")).as("n"))
      .groupBy(col("source"))
      .agg(count(lit(1)).as("n_docs"),
        sum(col("n")).cast("long").as("n_tokens"),
        expr("percentile(n, 0.25)").as("__p25"),
        expr("percentile(n, 0.5)").as("__p50"),
        expr("percentile(n, 0.9)").as("__p90"),
        expr("percentile(n, 0.99)").as("__p99"))
      .select(col("source"), col("n_docs"), col("n_tokens"),
        floor(col("n_tokens").cast("double") / col("n_docs") * 1e6 + 0.5)
          .cast("long").as("mean_e6"),
        floor(col("__p25") * 1e6 + 0.5).cast("long").as("p25_e6"),
        floor(col("__p50") * 1e6 + 0.5).cast("long").as("p50_e6"),
        floor(col("__p90") * 1e6 + 0.5).cast("long").as("p90_e6"),
        floor(col("__p99") * 1e6 + 0.5).cast("long").as("p99_e6"))

  /** Importance weighting for domain-targeted data selection — the
    * DSIR shape (Xie et al., NeurIPS'23): score every raw-corpus
    * document by how TARGET-like its hashed token-feature distribution
    * is, so sampling by score shifts the training mixture toward the
    * target domain with no trained classifier at all. Two distributions
    * over `dims` md5 buckets (target side, raw side; add-one smoothed);
    * each bucket's weight is the centered posterior that a token came
    * from the target under equal priors — p_b = t_b/(t_b+r_b) — and a
    * document's importance is the sum of its tokens' weights. The
    * posterior is the drift-free stand-in for DSIR's log-ratio: it
    * ranks identically per token (monotone in the ratio), but costs ONE
    * IEEE division per BUCKET, micro-floored, where ln would drag libm
    * drift into every engine comparison.
    *
    * Scale shape: one narrow (doc, bucket) token projection; two
    * map-side-combined aggregations whose outputs are dims-sized (the
    * model is 64 rows, not a table); the weight frame broadcasts back
    * onto the token stream; one per-doc aggregation. Nothing
    * corpus-sized shuffles. Integer products stay in long range while
    * target·raw token counts stay under ~9e12 pairs-per-bucket — at
    * larger corpora, compute the weights on a bounded sample (the IVF
    * training discipline). */
  def importanceWeight(docs: DataFrame, idCol: String, textCol: String,
                       isTarget: Column, dims: Int = 64): DataFrame = {
    require(dims > 0, "dims must be positive")
    val tokens = docs.select(col(idCol).as("doc_id"), isTarget.as("__t"),
      explode(filter(words(col(textCol)), t => t =!= "")).as("token"))
      .select(col("doc_id"), col("__t"), bucketOf(col("token"), dims).as("b"))
    tokens.filter(!col("__t"))
      .join(broadcast(importanceWeights(docs, textCol, isTarget, dims)), "b")
      .groupBy(col("doc_id"))
      .agg(count(lit(1)).as("n_tokens"), sum(col("w_e6")).as("imp_e6"))
      .withColumn("imp_mean_e6",
        floor(col("imp_e6").cast("double") / col("n_tokens") + 0.5).cast("long"))
  }

  /** The dims-row bucket-weight MODEL of [[importanceWeight]], exposed
    * on its own: (b, w_e6) per bucket. Streaming ingest collects these
    * dims rows once and bakes them into the plan as a literal map (the
    * PQ-codebook / LSH-plane discipline — a model artifact measured in
    * bytes rides the plan, not a join). */
  def importanceWeights(docs: DataFrame, textCol: String,
                        isTarget: Column, dims: Int = 64): DataFrame = {
    require(dims > 0, "dims must be positive")
    val toks = docs.select(isTarget.as("__t"),
      explode(filter(words(col(textCol)), t => t =!= "")).as("token"))
      .select(col("__t"), bucketOf(col("token"), dims).as("b"))
    val counts = toks.groupBy(col("b"))
      .agg(sum(when(col("__t"), 1L).otherwise(0L)).as("tc"),
        sum(when(col("__t"), 0L).otherwise(1L)).as("rc"))
    val tot = counts.agg(sum(col("tc")).as("tN"), sum(col("rc")).as("rN"))
    // every bucket gets a weight, not just the observed ones — a
    // streaming applier must be able to score tokens the reference
    // corpus never hashed there (they take the pure-smoothing weight)
    val filled = docs.sparkSession.range(dims)
      .select(col("id").cast("int").as("b"))
      .join(counts, Seq("b"), "left")
      .select(col("b"), coalesce(col("tc"), lit(0L)).as("tc"),
        coalesce(col("rc"), lit(0L)).as("rc"))
    val num = (col("tc") + 1L) * (col("rN") + lit(dims.toLong))
    val den = num + (col("rc") + 1L) * (col("tN") + lit(dims.toLong))
    // divide FIRST, then scale to micros: num and den stay exact longs
    // (headroom to ~9e18 bucket-pair products, i.e. hundreds of TB of
    // tokens), and both engines convert the same exact integers to
    // double before one IEEE division — multiplying num by 1e6 in long
    // space would wrap 6 orders of magnitude earlier, silently in
    // Spark's non-ANSI arithmetic and loudly in DuckDB's
    filled.crossJoin(broadcast(tot))
      .select(col("b"),
        (floor(num.cast("double") / den.cast("double") * 1000000d + 0.5)
          .cast("long") - 500000L).as("w_e6"))
  }

  /** md5 token bucket shared by [[hashEmbed]], [[classifierScore]] and
    * the importance-weighting pair — one definition so the feature
    * space cannot diverge between the model builder and its appliers. */
  private[graft] def bucketOf(token: Column, dims: Int): Column =
    pmod(conv(substring(md5(token), 1, 8), 16, 10).cast("long"),
      lit(dims)).cast("int")

  /** md5-derived per-bucket weight in [-1000, 1000] micro-units — the
    * hashed linear model's entire parameterization, shared by
    * [[classifierScore]] and its streaming twin so the model cannot
    * diverge between batch and ingest scoring. */
  private[graft] def tokenWeight(token: Column, dims: Int): Column =
    pmod(conv(substring(md5(concat(lit("w:"),
      bucketOf(token, dims).cast("string"))), 1, 8),
      16, 10).cast("long"), lit(2001L)) - lit(1000L)

  /** Text canonicalization — the pass that runs BEFORE any exact-match
    * operator (hash dedup, line dedup, vocab counts, blocklists) so
    * byte-different spellings of the same text stop counting as
    * different: Unicode NFC (native [[graft.functions.NfcNormalize]] —
    * composed/decomposed glyphs unify; ligatures and full-width forms
    * deliberately keep their identity, NFKC folding is a separate
    * policy), control characters stripped, whitespace runs collapsed to
    * one space, ends trimmed. Emits the normalized text plus a changed
    * flag and before/after code-point counts, so the caller can measure
    * how dirty a source is without a second pass.
    *
    * Scale shape: shuffle-free codegen'd projection at scan speed; the
    * NFC fast path returns already-normal rows (the overwhelming norm)
    * without allocating. */
  def normalizeText(docs: DataFrame, idCol: String, textCol: String): DataFrame = {
    graft.sql.GraftExtensions.ensureRegistered(docs.sparkSession)
    val nfc = call_function("nfc_normalize", col(textCol))
    val stripped = regexp_replace(nfc, "[\\x01-\\x08\\x0B\\x0C\\x0E-\\x1F\\x7F]", "")
    val collapsed = trim(regexp_replace(stripped, "\\s+", " "))
    docs.select(
      col(idCol).as("doc_id"),
      collapsed.as("text_norm"),
      (collapsed =!= col(textCol)).as("changed"),
      length(col(textCol)).cast("long").as("n_chars_raw"),
      length(collapsed).cast("long").as("n_chars_norm"))
  }

  /** Hashed linear text classifier at scan speed — the fastText-shaped
    * model-scoring pass (quality filter, domain router, language
    * gate) applied the only way that works at 100 TB: the model rides
    * the PLAN, not a table. Tokens hash into `dims` buckets with the
    * same md5 bucket function as [[hashEmbed]]; the model is one weight
    * per bucket plus a bias; a document's logit is Σ w(bucket(t)) over
    * its tokens plus the bias, and the verdict is logit ≥ 0 (the sign
    * of the logit IS the sigmoid-at-0.5 decision — no exp, no libm).
    *
    * The weight lookup is an EXPRESSION on the bucket id — never a join
    * against a weights table, never a corpus-side broadcast — so the
    * whole pass is one narrow projection plus one map-side-combined
    * per-doc aggregation; weights in exact micro units keep every sum
    * an integer both engines replay. Weights here derive per bucket
    * from md5 (any engine can regenerate them); a production model
    * swaps in its trained literal array, same plan shape.
    *
    * Docs with no tokens survive with n_tokens = 0 and logit = bias
    * (explode_outer — a filter pass must issue a verdict for EVERY
    * row, or empty documents silently bypass it). */
  def classifierScore(docs: DataFrame, idCol: String, textCol: String,
                      dims: Int = 64, biasE6: Long = 0L): DataFrame = {
    require(dims > 0, "dims must be positive")
    val toks = docs.select(col(idCol).as("doc_id"),
      explode_outer(filter(words(col(textCol)), t => t =!= "")).as("token"))
    toks
      .select(col("doc_id"),
        when(col("token").isNull, lit(0L))
          .otherwise(tokenWeight(col("token"), dims)).as("w"),
        col("token"))
      .groupBy(col("doc_id"))
      .agg(count(col("token")).as("n_tokens"),
        (sum(col("w")) + lit(biasE6)).as("logit_e6"))
      .select(col("doc_id"), col("n_tokens"), col("logit_e6"),
        (col("logit_e6") >= 0L).as("keep"))
  }

  /** Bigram language-model document score — the next step up from
    * [[freqScore]]'s unigram proxy toward the KenLM-style perplexity
    * filter: each adjacent bigram (w1, w2) scores its corpus conditional
    * probability count(w1 w2) / count(w1 ·), and a document reports the
    * count, sum and mean of those scores. Natural text built from the
    * corpus' own transition structure scores high; shuffled/generated/
    * OCR-damaged text scores low even when its unigrams are common —
    * exactly the failure mode a unigram filter misses.
    *
    * Determinism contract: each conditional probability is ONE correctly-
    * rounded IEEE division floored to micro units; documents then sum
    * and average INTEGERS — no float accumulation order anywhere, so the
    * oracle replays it exactly (no ln/exp: the geometric-mean form of
    * perplexity would drag in libm drift, and the arithmetic mean orders
    * documents just as well for filtering).
    *
    * Scale shape: the [[freqScore]] multi-pass discipline — bigram-keyed
    * and first-word-keyed counts, both map-side combined to vocabulary-
    * sized tables; equality joins back (AQE splits hot function-word
    * keys); one map-side-combined per-doc aggregation. The staged bigram
    * projection is re-derived from the scan for each of its three
    * consumers, NOT persisted: it is token-count-sized (larger than the
    * input text), and at 100 TB re-reading beats spilling a corpus-sized
    * intermediate. */
  def bigramLmScore(docs: DataFrame, idCol: String, textCol: String): DataFrame = {
    val staged = docs.select(col(idCol).as("doc_id"),
      filter(words(col(textCol)), t => t =!= "").as("__w"))
    val w = col("__w")
    val pairs = staged.filter(size(w) >= 2).select(col("doc_id"),
        explode(transform(sequence(lit(1), size(w) - 1),
          i => struct(
            concat(element_at(w, i), lit(" "), element_at(w, i + 1)).as("bg"),
            element_at(w, i).as("w1")))).as("b"))
      .select(col("doc_id"), col("b.bg").as("bg"), col("b.w1").as("w1"))
    val c2 = pairs.groupBy(col("bg")).agg(count(lit(1)).as("n2"))
    val c1 = pairs.groupBy(col("w1")).agg(count(lit(1)).as("n1"))
    pairs.join(c2, "bg").join(c1, "w1")
      .select(col("doc_id"),
        floor(col("n2").cast("double") / col("n1") * 1e6 + 0.5).cast("long").as("p_e6"))
      .groupBy(col("doc_id"))
      .agg(count(lit(1)).as("n_bigrams"), sum(col("p_e6")).as("sum_cond_e6"))
      .withColumn("mean_cond_e6",
        floor(col("sum_cond_e6").cast("double") / col("n_bigrams") + 0.5).cast("long"))
  }

  /** N-gram novelty: the fraction of a document's distinct word
    * n-grams that appear in NO other document — low novelty means the
    * text is assembled from phrases the corpus already contains
    * (boilerplate, templates, spun content), the signal between exact
    * line-dedup and whole-doc near-dedup. Output is exact-integer
    * (n_shingles, n_shared) plus a micro-int ratio, engine-reproducible.
    * Documents under n words carry no n-grams and are absent, matching
    * the shingle-based dedup family.
    *
    * Scale shape: shingles come from the native zero-shuffle
    * [[graft.functions.ShingleHashes]] projection (a hand-built string
    * form was 20× slower: predicate pushdown substitutes the staged
    * array into the Generate's inferred filter, and higher-order-function
    * lambdas evaluate INTERPRETED with no common-subexpression
    * elimination, so the tokenizer re-ran per trigram position — the
    * single native expression survives pushdown at one evaluation).
    * Counting hashes instead of strings matches the whole shingle-dedup
    * family's oracle strategy: distinct-hash counts equal distinct-
    * string counts absent a 64-bit collision (ext03's exact-Jaccard
    * verify rests on the same identity). The n-gram-keyed count
    * map-side combines to one row per distinct corpus n-gram; the join
    * back is equality-keyed (AQE splits hot boilerplate n-grams); the
    * per-doc aggregation map-side combines — the [[freqScore]] two-pass
    * shape. */
  def ngramNovelty(docs: DataFrame, idCol: String, textCol: String,
                   n: Int = 3): DataFrame = {
    val ex = Dedup.shingleSets(docs, idCol, textCol, n)
      .select(col("doc_id"), explode(col("hs")).as("g"))
    val counts = ex.groupBy(col("g")).agg(count(lit(1)).as("c"))
    ex.join(counts, "g")
      .groupBy(col("doc_id"))
      .agg(count(lit(1)).as("n_shingles"),
        sum(when(col("c") > 1, 1L).otherwise(0L)).as("n_shared"))
      .withColumn("novelty_e6",
        floor((col("n_shingles") - col("n_shared")).cast("double") /
          col("n_shingles") * 1e6 + 0.5).cast("long"))
  }

  /** PII pattern sets for [[redactPii]]: applied in order, counts taken
    * against the ORIGINAL text (so they are independent of replacement
    * order). Patterns stay inside the Java-regex ∩ RE2 common subset —
    * classes, bounded repetition, `\b`, non-backtracking-safe — so the
    * same pattern string means the same thing to Spark and any
    * RE2-based engine checking the output. */
  val piiPatterns: Seq[(String, String, String)] = Seq(
    ("email", """[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}""", "<EMAIL>"),
    ("ip", """\b(\d{1,3}\.){3}\d{1,3}\b""", "<IP>"),
    ("phone", """\b\d{3}[-.]\d{3}[-.]\d{4}\b""", "<PHONE>"),
    ("longnum", """\b\d{9,}\b""", "<NUM>"))

  /** PII scrubbing — the redaction pass every training-data pipeline
    * runs before text leaves curation: emails, IPv4 addresses, phone
    * numbers, and long digit runs (account/ID numbers) masked with typed
    * placeholder tokens, plus a per-document count of each hit type.
    *
    * Scale shape: a pure narrow projection — four codegen'd regex
    * replaces and four extract-alls per row, no shuffle, no UDF; runs at
    * scan speed and pipelines into whatever sink follows. */
  def redactPii(docs: DataFrame, idCol: String, textCol: String): DataFrame = {
    val redacted = piiPatterns.foldLeft(col(textCol)) {
      case (acc, (_, pat, repl)) => regexp_replace(acc, pat, repl)
    }
    docs.select(
      Seq(col(idCol).as("doc_id"), redacted.as("text_redacted")) ++
        piiPatterns.map { case (name, pat, _) =>
          size(regexp_extract_all(col(textCol), lit(pat), lit(0)))
            .cast("long").as(s"n_$name")
        }: _*)
  }

  /** Marker-count language ID: score each language by how many of the
    * document's tokens are that language's marker words; predict the
    * highest scorer (ties broken alphabetically — deterministic), or
    * 'und' when no marker appears at all. */
  def langId(docs: DataFrame, idCol: String, textCol: String): DataFrame = {
    val w = words(col(textCol))
    val scored = docs.select(
      Seq(col(idCol).as("doc_id"), col("lang").as("lang_actual")) ++
        langMarkers.map { case (lang, markers) =>
          size(filter(w, t => array_contains(typedlit(markers), t))).as(s"score_$lang")
        }: _*)
    // argmax via a struct-max: (score, reversed-lang) so the HIGHEST score
    // wins and ties pick the alphabetically-first language.
    val best = greatest(langMarkers.map { case (lang, _) =>
      struct(col(s"score_$lang").as("score"), lit(langInv(lang)).as("inv"))
    }: _*)
    scored
      .withColumn("pred_lang",
        when(best.getField("score") === 0, lit("und"))
          .otherwise(langFromInv(best.getField("inv"))))
      .select(col("doc_id"), col("lang_actual"), col("pred_lang"),
        (col("pred_lang") === col("lang_actual")).as("is_match"))
  }

  // lexicographically invert the language code so that inside greatest()
  // a score tie resolves to the alphabetically FIRST language
  private def langInv(lang: String): String = lang.map(c => ('z' - c + 'a').toChar)
  private def langFromInv(inv: Column): Column = {
    val pairs = langMarkers.map(_._1)
    pairs.foldLeft(lit("und")) { case (acc, lang) =>
      when(inv === langInv(lang), lit(lang)).otherwise(acc)
    }
  }

  /** Content-defined chunking — the rolling-hash/gear-hash cut rule of
    * FastCDC and the rsync/LBFS lineage, re-expressed relationally over
    * token streams: cut AFTER any position p whose trailing
    * `window`-token gram hashes to 0 mod `divisor`. Because every cut
    * decision depends only on the `window` tokens ENDING at it, an
    * insertion or deletion re-chunks O(1) neighboring chunks instead of
    * shifting every fixed-stride boundary downstream — the property
    * that makes chunk-hash dedup survive edits, and the reason CDC (not
    * [[chunkTokens]]'s fixed stride) is the dedup-tier chunker.
    * Expected chunk length ≈ `divisor` tokens; no min/max clamps (those
    * are policy knobs layered on the same rule, not mechanism).
    *
    * The gram hash is the engine-replayable md5 32-bit prefix (the
    * [[Sampling.hashBucket]] discipline, NOT the native xxhash
    * shingles) because the BOUNDARY PREDICATE — not just gram equality —
    * must reproduce in any engine for the output to be auditable.
    *
    * Scale shape: one shuffle-free generate-and-project pass — tokens,
    * boundary positions, and chunk ranges are all per-row array
    * arithmetic inside whole-stage codegen; no window function, no
    * join, no shuffle. Per-row cost is O(tokens × window) hashing, the
    * same work any CDC scanner does. Output: one row per chunk with a
    * content hash ready for [[Dedup.exact]]-shaped chunk dedup. */
  def cdcChunks(docs: DataFrame, idCol: String, textCol: String,
                window: Int = 4, divisor: Int = 8): DataFrame = {
    require(window > 0 && divisor > 0, "window and divisor must be positive")
    val gear = (g: Column) =>
      pmod(conv(substring(md5(g), 1, 8), 16, 10).cast("long"), lit(divisor.toLong))
    docs.select(col(idCol).as("doc_id"),
        filter(words(col(textCol)), t => t =!= "").as("__t"))
      .filter(size(col("__t")) > 0)
      // cut positions: p in [window, n-1] with gear(tokens[p-window+1 .. p]) == 0
      // (a cut after the last token would open an empty chunk — excluded);
      // Spark's sequence() DESCENDS when stop < start, so guard the range
      .withColumn("__b",
        when(size(col("__t")) - 1 >= window,
          filter(sequence(lit(window), size(col("__t")) - 1), p =>
            gear(concat_ws(" ", slice(col("__t"), p - lit(window) + 1, lit(window)))) === 0L))
          .otherwise(array().cast("array<int>")))
      .withColumn("__starts",
        concat(array(lit(1)), transform(col("__b"), b => b + 1)))
      .select(col("doc_id"),
        posexplode(transform(col("__starts"), (st, i) =>
          struct(st.as("s"),
            when(i < size(col("__b")), element_at(col("__b"), i + 1))
              .otherwise(size(col("__t"))).as("e"),
            concat_ws(" ", slice(col("__t"), st,
              when(i < size(col("__b")), element_at(col("__b"), i + 1))
                .otherwise(size(col("__t"))) - st + 1)).as("txt")))))
      .select(col("doc_id"), (col("pos") + 1).as("chunk_idx"),
        col("col.s").as("start_pos"),
        (col("col.e") - col("col.s") + 1).as("n_chunk_tokens"),
        md5(col("col.txt")).as("chunk_hash"),
        col("col.txt").as("chunk_text"))
  }

  /** Robust per-group length-outlier flagging — median/MAD, the
    * scale-and-contamination-proof alternative to mean/stddev (one
    * pathological 10 GB document drags a mean arbitrarily far; it moves
    * the median by at most one rank). A document is an outlier when
    * |n − median| > c · MAD, the standard robust z-score rule
    * (Hampel/Leys et al.); with MAD = 0 (degenerate uniform group) any
    * deviation flags, the rule's standard limit.
    *
    * Exactness discipline: medians of integer token counts land on
    * halves, so everything is carried in doubled units — med2 = 2·median,
    * d2 = |2n − med2|, mad4 = 2·median(d2) = 4·MAD — and the verdict
    * 2·d2 > c·mad4 is pure integer arithmetic any engine replays
    * bit-exactly (no float compare at the boundary).
    *
    * Scale shape: two map-side-combined percentile aggregations whose
    * state is O(distinct lengths) per group (the q35/ext60
    * bounded-cardinality argument), each output |groups| rows and
    * broadcast back onto a narrow (id, group, n) projection re-derived
    * from the scan — nothing corpus-sized persists or shuffles. */
  def lengthOutliers(docs: DataFrame, idCol: String, textCol: String,
                     groupCol: String, c: Int = 3): DataFrame = {
    require(c > 0, "c must be positive")
    val base = docs.select(col(idCol).as("doc_id"), col(groupCol).as("__g"),
      size(filter(words(col(textCol)), t => t =!= "")).cast("long").as("n_tokens"))
    val med = base.groupBy(col("__g"))
      .agg(floor(expr("percentile(n_tokens, 0.5)") * 2 + 0.5).cast("long").as("med2"))
    val dev = base.join(broadcast(med), "__g")
      .withColumn("__d2", abs(col("n_tokens") * 2 - col("med2")))
    val mad = dev.groupBy(col("__g"))
      .agg(floor(expr("percentile(__d2, 0.5)") * 2 + 0.5).cast("long").as("mad4"))
    dev.join(broadcast(mad), "__g")
      .select(col("doc_id"), col("__g").as(groupCol), col("n_tokens"),
        col("med2"), col("mad4"),
        (col("__d2") * 2 > lit(c.toLong) * col("mad4")).as("is_outlier"))
  }

  /** Gopher-style repetition signals — the quality-filter family that
    * catches degenerate/boilerplate text exact-dedup can't see (a page
    * repeating one phrase 200 times is unique as a whole document):
    * per doc, the most frequent unigram's token share, the most frequent
    * word-2-gram's CHARACTER share, and the share of 3-gram occurrences
    * that are duplicated within the doc.
    *
    * Mode selection is a SORT + one run-length fold per gram family
    * (O(n log n) per doc), not the naive O(distinct·n) count-each-
    * distinct scan — 11.4s → ~1s at sf0.1, and the gap widens with doc
    * length. Over an ascending sort, "replace best when the finished
    * run's count ≥ best" yields exactly the (count desc, gram desc) tie
    * rule, so the selected gram — not just its count — is reproducible.
    *
    * Scale shape: pure per-row array expressions over the doc's own
    * tokens — no explode, no shuffle, no state; the classic map-side
    * quality-gate that runs at scan speed over 100 TB and feeds a
    * downstream filter. */
  def repetitionSignals(docs: DataFrame, idCol: String, textCol: String): DataFrame = {
    val w = col("w")
    def grams(n: Int): Column = transform(sequence(lit(1), size(w) - (n - 1)),
      i => concat_ws(" ", (0 until n).map(o => element_at(w, i + o)): _*))
    // (mode count, mode gram) over a SORTED array via one run-length
    // fold. State (bg,bc,cg,cc) = best/current run; `cc >= bc` replace
    // means the latest (= lexicographically greatest) max-count run wins.
    def mode(arr: Column): Column = {
      val st = aggregate(array_sort(arr),
        struct(lit("").as("bg"), lit(0L).as("bc"), lit("").as("cg"), lit(0L).as("cc")),
        (s, g) => {
          val cc = when(g === s.getField("cg"), s.getField("cc") + 1L).otherwise(1L)
          val best = cc >= s.getField("bc")
          struct(when(best, g).otherwise(s.getField("bg")).as("bg"),
            when(best, cc).otherwise(s.getField("bc")).as("bc"),
            g.as("cg"), cc.as("cc"))
        })
      struct(st.getField("bc").as("c"), st.getField("bg").as("g"))
    }
    // total occurrences sitting in runs of length >= 2 over a sorted array
    def dupOcc(arr: Column): Column = aggregate(array_sort(arr),
      struct(lit(0L).as("dup"), lit("").as("cg"), lit(0L).as("cc")),
      (s, g) => {
        val cont = g === s.getField("cg")
        val cc = when(cont, s.getField("cc") + 1L).otherwise(1L)
        val dup = s.getField("dup") +
          when(cont, when(cc === 2L, 2L).otherwise(1L)).otherwise(0L)
        struct(dup.as("dup"), g.as("cg"), cc.as("cc"))
      }).getField("dup")
    def e6(num: Column, den: Column): Column =
      floor(num * lit(1000000.0) / den + 0.5).cast("long")
    docs
      .select(col(idCol).as("doc_id"), length(trim(col(textCol))).as("n_chars_t"),
        filter(words(col(textCol)), t => t =!= "").as("w"))
      .filter(size(w) >= 3)
      .withColumn("t1", mode(w))
      .withColumn("t2", mode(grams(2)))
      .withColumn("tri", grams(3))
      .select(col("doc_id"), size(w).cast("long").as("n_tokens"),
        col("t1").getField("g").as("top_token"),
        e6(col("t1").getField("c"), size(w)).as("top1_e6"),
        col("t2").getField("g").as("top_bigram"),
        e6(col("t2").getField("c") * length(col("t2").getField("g")),
          col("n_chars_t")).as("top2_char_e6"),
        e6(dupOcc(col("tri")), size(col("tri"))).as("dup3_e6"))
  }

  /** Subword tokenization by greedy longest-match against a fixed piece
    * vocabulary — WordPiece inference (see
    * [[graft.functions.GreedyPieces]] for the algorithm and the
    * native-expression rationale). The vocabulary is a static artifact
    * exactly like a tokenizer's vocab file: it rides the plan as a
    * literal, compiled once into a match table on the driver.
    *
    * Output per document: piece and `<unk>` counts plus `pieces_sig`,
    * the md5 of the space-joined piece sequence — so a checker must
    * reproduce the ENTIRE segmentation, not just its length. Pure
    * narrow projection: no shuffle, no UDF, scan speed at 100 TB. */
  def wordpiece(docs: DataFrame, idCol: String, textCol: String,
                vocab: Seq[String]): DataFrame = {
    graft.sql.GraftExtensions.ensureRegistered(docs.sparkSession)
    val pieces = call_function("greedy_pieces", col(textCol), typedlit(vocab))
    docs
      .select(col(idCol).as("doc_id"), pieces.as("ps"))
      .select(col("doc_id"),
        size(col("ps")).cast("long").as("n_pieces"),
        size(filter(col("ps"), p => p === "<unk>")).cast("long").as("n_unk"),
        md5(array_join(col("ps"), " ")).as("pieces_sig"))
  }

  /** Query-parameter names that carry tracking state, not content
    * identity — dropped during URL canonicalization (each entry is a
    * full regex matched against the parameter NAME). */
  val trackingParams: Seq[String] = Seq("utm_[^=]*", "gclid", "fbclid", "ref")

  /** URL extraction + canonicalization — the Common-Crawl curation key:
    * web-scale corpora dedup and cap BY CANONICAL URL before any
    * content pass, because the same page arrives under dozens of
    * surface forms (scheme/host case, default ports, tracking params,
    * fragments, trailing slashes). One row per extracted URL:
    * `(doc_id, url_pos, url_raw, canonical_url, host, n_dropped_params)`.
    *
    * Canonical form (deterministic, engine-replayable — every step is a
    * plain string function, no URL library):
    *   1. strip one trailing run of prose punctuation from the match;
    *   2. cut the fragment (first `#`) and the query (first `?`);
    *   3. lowercase scheme and host; drop `:80` (http) / `:443` (https);
    *   4. trim trailing `/` runs from the path;
    *   5. drop query params whose NAME matches [[trackingParams]],
    *      keeping the survivors' original order.
    *
    * Scale shape: a pure narrow projection + per-row explode of the
    * match array — no shuffle, no UDF; the downstream dedup/cap by
    * `canonical_url` is the [[graft.operators.Dedup.exact]] /
    * [[Sampling.groupCap]] shape on the canonical key. */
  def urlCanon(docs: DataFrame, idCol: String, textCol: String): DataFrame = {
    // raw match: scheme://non-space run, case-insensitive scheme, then
    // shed the trailing punctuation a sentence contributes ("...end).",)
    val matches = regexp_extract_all(col(textCol),
      lit("(?i)\\bhttps?://\\S+"), lit(0))
    val dePunct = (u: Column) => regexp_replace(u, "[.,;:!?)\\]'\"]+$", "")
    val noFrag = (u: Column) => substring_index(u, "#", 1)
    val exploded = docs
      .select(col(idCol).as("doc_id"), posexplode(matches).as(Seq("url_pos", "m")))
      .withColumn("url_raw", dePunct(col("m")))
      // base = scheme://host[:port]/path, q = raw query (after FIRST ?)
      .withColumn("nf", noFrag(col("url_raw")))
      .withColumn("base", substring_index(col("nf"), "?", 1))
      .withColumn("q", when(col("nf").contains("?"),
        expr("substring(nf, length(base) + 2)")).otherwise(lit("")))
      .withColumn("scheme", lower(substring_index(col("base"), "://", 1)))
      .withColumn("rest", expr("substring(base, length(scheme) + 4)"))
      .withColumn("hostport", substring_index(col("rest"), "/", 1))
      .withColumn("path",
        regexp_replace(expr("substring(rest, length(hostport) + 1)"), "/+$", ""))
      .withColumn("host", lower(substring_index(col("hostport"), ":", 1)))
      .withColumn("port", when(col("hostport").contains(":"),
        expr("substring(hostport, length(host) + 2)")).otherwise(lit("")))
      .withColumn("port", when(
        (col("scheme") === "http" && col("port") === "80") ||
        (col("scheme") === "https" && col("port") === "443"), lit(""))
        .otherwise(col("port")))
    val isTracking = (p: Column) => trackingParams
      .map(re => regexp_like(substring_index(p, "=", 1), lit(s"^($re)$$")))
      .reduce(_ || _)
    exploded
      .withColumn("params", filter(split(col("q"), "&"), p => p =!= ""))
      .withColumn("kept", filter(col("params"), p => !isTracking(p)))
      .select(col("doc_id"), col("url_pos").cast("long").as("url_pos"),
        col("url_raw"),
        concat(col("scheme"), lit("://"), col("host"),
          when(col("port") =!= "", concat(lit(":"), col("port"))).otherwise(lit("")),
          col("path"),
          when(size(col("kept")) > 0,
            concat(lit("?"), array_join(col("kept"), "&"))).otherwise(lit("")))
          .as("canonical_url"),
        col("host"),
        (size(col("params")) - size(col("kept"))).cast("long").as("n_dropped_params"))
  }

  /** Pairwise distribution divergence between corpus slices (languages,
    * sources, time windows): for each unordered slice pair, the EXACT
    * total-variation distance between their unigram frequency
    * distributions, in replayable fixed-point micro-units. TV rather
    * than KL by design: KL needs a transcendental log whose floating
    * evaluation drifts across engines, while TV is pure integer
    * arithmetic once probabilities are fixed-point —
    * p_micro(t) = 1e6·count(t) DIV total — and the identity
    * Σ|p−q| = (Σp + Σq) − 2·Σ min(p, q) keeps the pair join INNER
    * (a token absent from one slice contributes min = 0), so the only
    * shuffled pair frame is the SHARED vocabulary.
    *
    * Scale shape: one token explode into a map-side-combined
    * (slice, token) count, a slice-count-sized totals broadcast, and a
    * vocabulary self-join keyed on token. Slices are enumerable
    * (languages, sources) — pair fan-out per token is C(slices, 2),
    * never row-quadratic; the divergence report is C(slices, 2) rows.
    *
    * Output: (slice_a, slice_b, n_common_tokens, s_a_micro, s_b_micro,
    * min_overlap_micro, tv2_micro); TV = tv2_micro / 2e6 ∈ [0, 1].
    * A pair sharing ZERO tokens emits no row (its TV is trivially 1);
    * s_*_micro carry the per-slice Σp (≈1e6 minus floor loss) so the
    * caller can normalize exactly.
    */
  def unigramDivergence(docs: DataFrame, sliceCol: String,
                        textCol: String): DataFrame = {
    val toks = docs.filter(col(sliceCol).isNotNull && col(textCol).isNotNull)
      .select(col(sliceCol).as("slice"),
        explode(filter(words(col(textCol)), t => t =!= "")).as("token"))
    val cnt = toks.groupBy(col("slice"), col("token")).agg(count(lit(1)).as("c"))
    val tot = cnt.groupBy(col("slice")).agg(sum(col("c")).as("tot"))
    val p = cnt.join(broadcast(tot), "slice")
      .select(col("slice"), col("token"),
        expr("CAST((1000000 * c) DIV tot AS BIGINT)").as("p_micro"))
    val sums = p.groupBy(col("slice"))
      .agg(sum(col("p_micro")).as("s_micro"))
    val pa = p.select(col("slice").as("slice_a"), col("token"),
      col("p_micro").as("pa"))
    val pb = p.select(col("slice").as("slice_b"), col("token"),
      col("p_micro").as("pb"))
    val ov = pa.join(pb, Seq("token"))
      .filter(col("slice_a") < col("slice_b"))
      .groupBy(col("slice_a"), col("slice_b"))
      .agg(count(lit(1)).as("n_common_tokens"),
        sum(least(col("pa"), col("pb"))).as("min_overlap_micro"))
    ov.join(broadcast(sums.select(col("slice").as("slice_a"),
        col("s_micro").as("s_a_micro"))), "slice_a")
      .join(broadcast(sums.select(col("slice").as("slice_b"),
        col("s_micro").as("s_b_micro"))), "slice_b")
      .select(col("slice_a"), col("slice_b"), col("n_common_tokens"),
        col("s_a_micro"), col("s_b_micro"), col("min_overlap_micro"),
        (col("s_a_micro") + col("s_b_micro")
          - lit(2L) * col("min_overlap_micro")).as("tv2_micro"))
  }

  /** Per-slice vocabulary census: total tokens, distinct types, hapax
    * legomena (types occurring exactly once in the slice), and the two
    * derived integer-milli ratios — type/token (lexical diversity: low
    * TTR flags templated/machine-generated slices) and hapax/type
    * (productive-vocabulary share: collapsing hapax share flags
    * boilerplate floods; both are standard corpus-linguistics QA
    * signals alongside [[unigramDivergence]]'s cross-slice view).
    * Two map-side-combined aggregations ((slice, token) then slice),
    * everything exact integers. */
  def vocabCensus(docs: DataFrame, sliceCol: String,
                  textCol: String): DataFrame =
    vocabCensusFromCounts(
      docs.filter(col(sliceCol).isNotNull && col(textCol).isNotNull)
        .select(col(sliceCol).as("slice"),
          explode(filter(words(col(textCol)), t => t =!= "")).as("token"))
        .groupBy(col("slice"), col("token")).agg(count(lit(1)).as("c")))

  /** [[vocabCensus]] from pre-aggregated (slice, token, c) counts — the
    * one definition of the census math, shared with the streaming twin
    * (st45 collapses an Update-mode count changelog to this frame, the
    * [[driftAttributionFromCounts]] discipline). */
  def vocabCensusFromCounts(cnt: DataFrame): DataFrame =
    cnt.groupBy(col("slice"))
      .agg(sum(col("c")).as("n_tokens"),
        count(lit(1)).as("n_types"),
        sum(when(col("c") === 1, 1L).otherwise(0L)).as("n_hapax"))
      .select(col("slice"), col("n_tokens"), col("n_types"), col("n_hapax"),
        expr("CAST((1000 * n_types) DIV n_tokens AS BIGINT)").as("ttr_milli"),
        expr("CAST((1000 * n_hapax) DIV n_types AS BIGINT)").as("hapax_milli"))

  /** Token-level drift ATTRIBUTION between two named corpus slices —
    * the follow-up question to [[unigramDivergence]]'s scalar verdict
    * ("these snapshots drifted"): WHICH tokens carry the drift. Exact
    * integer unigram probabilities (the ext109 micro-unit form,
    * p = 1e6·c div total per slice), full-outer joined on token (a
    * token absent from a slice contributes its whole mass on the other
    * side), ranked by |Δp| with the (desc, token) total order, top-k.
    *
    * Scale shape: two map-side-combined counts + a vocab-sized join;
    * the only non-linear structure is the top-k window, which
    * WindowGroupLimit bounds before the exchange. Both slice totals
    * ride a broadcast (2 rows). */
  def driftAttribution(docs: DataFrame, sliceCol: String, textCol: String,
                       sliceA: String, sliceB: String, k: Int): DataFrame = {
    val toks = docs
      .filter(col(sliceCol).isin(sliceA, sliceB) && col(textCol).isNotNull)
      .select(col(sliceCol).as("slice"),
        explode(filter(words(col(textCol)), t => t =!= "")).as("token"))
    driftAttributionFromCounts(
      toks.groupBy(col("slice"), col("token")).agg(count(lit(1)).as("c")),
      sliceA, sliceB, k)
  }

  /** [[driftAttribution]] from pre-aggregated (slice, token, c) counts —
    * the entry the STREAMING twin uses (st44 collapses an Update-mode
    * count changelog to the same frame), kept as the one definition of
    * the probability/ranking math so batch and stream can't fork. */
  def driftAttributionFromCounts(cnt: DataFrame, sliceA: String,
                                 sliceB: String, k: Int): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val tot = cnt.groupBy(col("slice")).agg(sum(col("c")).as("tot"))
    val p = cnt.join(broadcast(tot), "slice")
      .select(col("slice"), col("token"),
        expr("CAST((1000000 * c) DIV tot AS BIGINT)").as("p_micro"))
    val pa = p.filter(col("slice") === sliceA)
      .select(col("token"), col("p_micro").as("pa"))
    val pb = p.filter(col("slice") === sliceB)
      .select(col("token"), col("p_micro").as("pb"))
    pa.join(pb, Seq("token"), "full_outer")
      .select(col("token"),
        coalesce(col("pa"), lit(0L)).as("p_a_micro"),
        coalesce(col("pb"), lit(0L)).as("p_b_micro"))
      .withColumn("delta_micro", col("p_a_micro") - col("p_b_micro"))
      .withColumn("rnk", row_number().over(
        Window.orderBy(abs(col("delta_micro")).desc, col("token"))))
      .filter(col("rnk") <= k)
      .select(col("rnk").cast("long").as("rnk"), col("token"),
        col("p_a_micro"), col("p_b_micro"), col("delta_micro"))
  }

  /** Domain-affinity scoring for TARGETED data selection — the
    * DISTRIBUTION-level companion to [[importanceWeight]] (ext58's
    * per-token target-posterior sum, the DSIR weight analog): given a
    * small in-domain `target` sample, score every corpus doc by how
    * closely its hashed-unigram DISTRIBUTION matches the target's —
    * HISTOGRAM INTERSECTION in integer milli. Where ext58 rewards every
    * target-like token independently (a doc spamming one in-domain word
    * scores high), the intersection is capped per bucket by the
    * target's own mass, so over-concentration cannot buy affinity; the
    * [0, 1000] bound also makes it directly usable as a selection
    * priority ([[Sampling.priorityBudgetSample]]). Exactly replayable
    * cross-engine:
    *
    *   affinity_milli(d) = 1000·Σ_b min(c_d(b)·N_t, c_t(b)·N_d)
    *                       DIV (N_d · N_t)
    *
    * over md5-hashed token buckets b (Sampling.hashBucket's 10000-way
    * hash — the cross-min is the common-denominator form of
    * Σ_b min(p_d(b), p_t(b)), all in longs; bounds: N_d ≤ ~1e6 tokens
    * per doc, N_t ≤ ~1e9 target tokens keep 1000·Σ within long range —
    * a target SAMPLE is small by construction).
    *
    * Scale shape: target histogram is ≤10000 rows — ONE broadcast; the
    * corpus side is a token explode + per-(doc,bucket) map-side-combined
    * count + per-doc agg: work ∝ corpus tokens, no corpus shuffle wider
    * than (doc,bucket), no driver traffic beyond the broadcast. */
  def domainAffinity(corpus: DataFrame, target: DataFrame, idCol: String,
                     textCol: String, salt: String = "da"): DataFrame =
    domainAffinityFromCounts(
      tokenBuckets(corpus, Seq(col(idCol).as("doc_id")), textCol, salt)
        .groupBy(col("doc_id"), col("__b"))
        .agg(count(lit(1)).as("cd")),
      targetHistogram(target, textCol, salt))

  /** md5-bucketed token explode — ONE definition shared by the batch
    * scorer and the streaming feeder (st50) so both provably bucket
    * identically. */
  private[graft] def tokenBuckets(df: DataFrame, keep: Seq[Column],
                                  textCol: String, salt: String): DataFrame =
    df.select(keep :+ explode(filter(words(col(textCol)), t => t =!= ""))
      .as("__t"): _*)
      .withColumn("__b", Sampling.hashBucket(col("__t"), salt))

  /** The target side of [[domainAffinity]]: (__b, ct, nt) — per-bucket
    * counts with the total riding every row (a windowed sum over the
    * ≤10000-row histogram, bounded by construction), ready to
    * broadcast. */
  def targetHistogram(target: DataFrame, textCol: String,
                      salt: String = "da"): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    tokenBuckets(target, Nil, textCol, salt)
      .groupBy(col("__b")).agg(count(lit(1)).as("ct"))
      .withColumn("nt", sum(col("ct")).over(Window.partitionBy()))
  }

  /** [[domainAffinity]] from pre-aggregated per-(doc_id, __b) counts
    * `cd` — the entry the STREAMING twin uses (st50 collapses an
    * Update-mode count changelog to the same frame), kept as the one
    * definition of the intersection math so batch and stream can't
    * fork. N_d is a window sum whose doc_id partitioning also satisfies
    * the final grouping: the counts frame pays one exchange here. */
  def domainAffinityFromCounts(docBuckets: DataFrame,
                               tgtHist: DataFrame): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val withNd = docBuckets
      .withColumn("nd", sum(col("cd")).over(Window.partitionBy(col("doc_id"))))
    // left join: a doc whose buckets never hit the target keeps its row
    // (affinity 0); docs with NO tokens are absent by explode semantics
    withNd.join(broadcast(tgtHist), Seq("__b"), "left")
      .groupBy(col("doc_id"), col("nd"))
      .agg(sum(least(col("cd") * col("nt"), col("ct") * col("nd"))).as("num"),
        max(col("nt")).as("nt"))
      .select(col("doc_id"), col("nd").as("n_tokens"),
        coalesce(col("num"), lit(0L)).as("overlap_num"),
        when(col("num").isNull, lit(0L))
          .otherwise(expr("CAST((1000 * num) DIV (nd * nt) AS BIGINT)"))
          .as("affinity_milli"))
  }

  /** MULTINOMIAL NAIVE BAYES training — the oracle-replayable analog of
    * the fastText-style corpus classifier every curation pipeline ends
    * up training (cc_net quality buckets, domain routing, source
    * attribution probes). Add-one smoothing; scores in integer
    * MILLI-NATS (floor(1000·ln + 0.5) — the cosine-6dp cross-engine
    * discipline applied to ln: a flip needs the double within 5e-13 of
    * a boundary).
    *
    * Returns (model, classMeta): model = (label, token, log_milli) for
    * every token SEEN in the class — vocab×classes rows, token-keyed
    * (the score join's equality key; never broadcast: vocab grows with
    * the corpus); classMeta = one row per class (label, prior_milli,
    * default_milli) where default covers in-vocab tokens unseen in that
    * class — the k-row frame [[nbClassify]] collects (bounded: the
    * class count).
    *
    * Scale shape: two map-side-combined counts (per (class, token), per
    * class) + one distinct-count for |V|; no shuffle wider than the
    * (class, token) aggregation. */
  def nbTrain(train: DataFrame, textCol: String, labelCol: String)
      : (DataFrame, DataFrame) = {
    val tok = train.select(col(labelCol).as("label"),
      explode(words(col(textCol))).as("token"))
    val vocabV = tok.select("token").distinct().count()
    val classTok = tok.groupBy("label", "token").agg(count(lit(1)).as("n"))
    val classTotals = tok.groupBy("label").agg(count(lit(1)).as("n_class"))
    val docTotals = train.groupBy(col(labelCol).as("label"))
      .agg(count(lit(1)).as("n_docs"))
    val totalDocs = train.count()
    val model = classTok.join(classTotals, "label")
      .select(col("label"), col("token"),
        floor(lit(1000.0) * log((col("n") + 1).cast("double") /
          (col("n_class") + vocabV).cast("double")) + 0.5).cast("long")
          .as("log_milli"))
    val meta = docTotals.join(classTotals, "label")
      .select(col("label"),
        floor(lit(1000.0) * log(col("n_docs").cast("double") / totalDocs) + 0.5)
          .cast("long").as("prior_milli"),
        floor(lit(1000.0) * log(lit(1.0) /
          (col("n_class") + vocabV).cast("double")) + 0.5)
          .cast("long").as("default_milli"))
    (model, meta)
  }

  /** Train on `train`, classify `score`: per held-out doc the argmax-
    * posterior class (score = prior + Σ token-count · log-prob, integer
    * milli-nats; unseen-in-class tokens take the class default; ties
    * break to the alphabetically FIRST label — the langId discipline).
    * Output (doc_id, label_actual, pred_label, is_match, margin_milli)
    * where margin = best − runner-up, the classifier-confidence signal
    * a selection pipeline thresholds on.
    *
    * Scale shape: the model pivots to one row per token (classes are
    * COLUMNS — k is small by contract, the collected classMeta bound),
    * the doc-token counts join it token-equality-keyed, and the
    * per-doc score is one map-side-combinable weighted sum per class.
    * No per-doc vocab scan, no cross join, nothing all-pairs. */
  def nbClassify(train: DataFrame, score: DataFrame, idCol: String,
                 textCol: String, labelCol: String): DataFrame = {
    val (model, meta) = nbTrain(train, textCol, labelCol)
    val classes = nbClasses(meta)
    val docTok = score.select(col(idCol).as("doc_id"),
        col(labelCol).as("label_actual"),
        explode(words(col(textCol))).as("token"))
      .groupBy(col("doc_id"), col("label_actual"), col("token"))
      .agg(count(lit(1)).as("cnt"))
    nbVerdictFromScores(nbScoreSums(docTok, nbPivotModel(model, classes), classes), classes)
  }

  /** The collected per-class meta — k rows, the documented bound (class
    * count, not corpus size). */
  def nbClasses(meta: DataFrame): Seq[(String, Long, Long)] = {
    val classes = meta.collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
      .sortBy(_._1).toSeq
    require(classes.nonEmpty, "nbClassify: training set has no labels")
    classes
  }

  /** Model rows pivoted to one row per token with classes as COLUMNS —
    * the score join's right side (token-equality-keyed; never a
    * broadcast: vocab grows with the corpus). */
  def nbPivotModel(model: DataFrame, classes: Seq[(String, Long, Long)]): DataFrame =
    model.groupBy("token")
      .pivot("label", classes.map(_._1)).agg(first(col("log_milli")))

  /** ONE definition of the per-doc score sums — batch ([[nbClassify]])
    * and the streaming twin (st52) both pass their (doc_id,
    * label_actual, token, cnt) counts here, so the smoothing/prior
    * arithmetic can never fork between them. One equality join + one
    * map-side-combinable weighted sum per class. */
  def nbScoreSums(docTok: DataFrame, pivoted: DataFrame,
                  classes: Seq[(String, Long, Long)]): DataFrame = {
    val scoreCols = classes.map { case (label, prior, default) =>
      (sum(col("cnt") * coalesce(col(s"`$label`"), lit(default))) + prior)
        .as(s"score_$label")
    }
    docTok.join(pivoted, Seq("token"), "left")
      .groupBy(col("doc_id"), col("label_actual"))
      .agg(scoreCols.head, scoreCols.tail: _*)
  }

  /** Shared argmax tail: min-label tie-break via struct (score,
    * k − index) — a greater preference value means an alphabetically
    * earlier label — plus the best − runner-up margin. */
  def nbVerdictFromScores(scored: DataFrame,
                          classes: Seq[(String, Long, Long)]): DataFrame = {
    val k = classes.size
    val entries = classes.zipWithIndex.map { case ((label, _, _), i) =>
      struct(col(s"score_$label").as("s"), lit((k - i).toLong).as("pref"))
    }
    val best = if (k == 1) entries.head else greatest(entries: _*)
    val runnerUp = array_max(filter(array(entries: _*),
      s => !(s.getField("s") === best.getField("s") &&
        s.getField("pref") === best.getField("pref"))))
    val predLabel = classes.zipWithIndex.foldLeft(lit("?")) {
      case (acc, ((label, _, _), i)) =>
        when(best.getField("pref") === (k - i).toLong, lit(label)).otherwise(acc)
    }
    scored.select(col("doc_id"), col("label_actual"),
      predLabel.as("pred_label"),
      (predLabel === col("label_actual")).as("is_match"),
      (best.getField("s") -
        coalesce(runnerUp.getField("s"), best.getField("s"))).as("margin_milli"))
  }

  /** PER-SOURCE CORPUS REPORT — the "data card" table a training-data
    * release ships: one row per slice with volume (docs, tokens, chars
    * per doc), exact-duplication rates (the [[graft.operators.Dedup
    * .dupRateBySlice]] family math), and the majority language with its
    * share (count DESC, lang ASC tie rule). The composition deliverable:
    * the curation engine's own operators aggregated into the artifact a
    * human signs off on.
    *
    * Scale shape: three independent map-side-combined aggregations over
    * one corpus scan each (volume, dup families, language counts) joined
    * on the |slices|-sized result frames; the language argmax is a
    * window over the (slice, lang) count frame — |slices|·|langs| rows,
    * never the corpus. */
  def corpusReport(docs: DataFrame, idCol: String, textCol: String,
                   sliceCol: String, langCol: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val volume = docs.groupBy(col(sliceCol).as("source"))
      .agg(count(lit(1)).as("n_docs"),
        sum(size(words(col(textCol))).cast("long")).as("n_tokens"),
        sum(length(col(textCol)).cast("long")).as("n_chars"))
      .select(col("source"), col("n_docs"), col("n_tokens"),
        expr("CAST((1000 * n_tokens) DIV n_docs AS BIGINT)").as("tokens_per_doc_milli"),
        expr("CAST((1000 * n_chars) DIV n_docs AS BIGINT)").as("chars_per_doc_milli"))
    val dup = graft.operators.Dedup.dupRateBySlice(docs, idCol, textCol, sliceCol)
      .select(col("slice").as("source"), col("dup_milli"), col("redundant_milli"))
    val lang = docs.groupBy(col(sliceCol).as("source"), col(langCol).as("lang"))
      .agg(count(lit(1)).as("cnt"))
      .withColumn("rk", row_number().over(
        Window.partitionBy(col("source"))
          .orderBy(col("cnt").desc, col("lang"))))
      .filter(col("rk") === 1)
      .select(col("source"), col("lang").as("top_lang"), col("cnt").as("top_lang_n"))
    volume.join(dup, "source").join(lang, "source")
      .withColumn("top_lang_milli",
        expr("CAST((1000 * top_lang_n) DIV n_docs AS BIGINT)"))
      .drop("top_lang_n")
  }

  // ------------------------------------------------- unigram LM tokenizer

  /** UNIGRAM-LM TOKENIZER TRAINING (the SentencePiece model family —
    * Kudo ACL'18 — as deterministic hard-EM), completing the trainer
    * trio beside BPE (merge-frequency) and WordPiece (likelihood): seed
    * the piece inventory with every ≤`maxPieceLen` substring of the
    * word dictionary (frequency-weighted, overlapping), then `iters`
    * hard E-M rounds — Viterbi-segment every dictionary word under the
    * current milli-nat scores (ties prefer the LONGEST piece, i.e. the
    * smallest start), recount pieces by usage, floor single characters
    * at count 1 (segmentability can never be pruned away), keep the top
    * `vocabSize` multi-character pieces (count DESC, piece) plus all
    * characters. Scores are integer MILLI-NATS (floor(1000·ln + 0.5),
    * the NB/cosine cross-engine discipline).
    *
    * Dictionary-bound like [[bpeTrain]]: ONE corpus pass builds the
    * word-type dictionary; training runs over the top-`topWords` types
    * by (freq DESC, word) collected to the driver — the bounded-collect
    * contract (production unigram trainers subsample their input the
    * same way: SentencePiece's input_sentence_size), and word types
    * longer than `maxWordLen` are excluded from BOTH training and
    * scoring (documented universe, like the `[a-z0-9]+` normalization).
    * Returns (piece, n_count, log_milli). */
  def unigramTrain(docs: DataFrame, idCol: String, textCol: String,
                   vocabSize: Int, iters: Int, topWords: Int = 4096,
                   maxPieceLen: Int = 4, maxWordLen: Int = 12): DataFrame = {
    val spark = docs.sparkSession
    import spark.implicits._
    unigramFit(unigramDict(docs, textCol, topWords, maxWordLen),
      vocabSize, iters, maxPieceLen)
      .toDF("piece", "n_count", "log_milli")
  }

  /** The bounded training dictionary: top word types by (freq DESC, w). */
  private def unigramDict(docs: DataFrame, textCol: String, topWords: Int,
                          maxWordLen: Int): Seq[(String, Long)] =
    docs.select(explode(words(col(textCol))).as("w0"))
      .select(lower(col("w0")).as("w"))
      .filter(col("w").rlike("^[a-z0-9]+$") && length(col("w")) <= maxWordLen)
      .groupBy(col("w")).agg(count(lit(1)).as("freq"))
      .orderBy(col("freq").desc, col("w")).limit(topWords)
      .collect().map(r => (r.getString(0), r.getLong(1))).toSeq

  private def lnMilli(num: Double, den: Double): Long =
    math.floor(1000.0 * math.log(num / den) + 0.5).toLong

  /** chars always survive; multi-char pieces: top vocabSize by
    * (count DESC, piece). */
  private def unigramPrune(counts: Map[String, Long],
                           vocabSize: Int): Map[String, Long] = {
    val multi = counts.iterator.filter(_._1.length > 1).toSeq
      .sortBy { case (p, c) => (-c, p) }.take(vocabSize)
    (counts.iterator.filter(_._1.length == 1) ++ multi).toMap
  }

  /** Viterbi best segmentation of `w` under `scores` — maximizes the
    * summed milli-nat score; on ties the SMALLEST start (longest piece)
    * wins (first-candidate-wins with ascending starts). Every single
    * char is in the training vocab, so the DP never dead-ends. */
  private def unigramViterbi(w: String, scores: Map[String, Long],
                             maxPieceLen: Int): (Long, List[String]) = {
    val best = new Array[(Long, List[String])](w.length + 1)
    best(0) = (0L, Nil)
    var i = 1
    while (i <= w.length) {
      var cand: (Long, List[String]) = null
      var j = math.max(1, i - maxPieceLen + 1)
      while (j <= i) {
        val piece = w.substring(j - 1, i)
        scores.get(piece) match {
          case Some(s) if best(j - 1) != null =>
            val tot = best(j - 1)._1 + s
            if (cand == null || tot > cand._1)
              cand = (tot, piece :: best(j - 1)._2)
          case _ => ()
        }
        j += 1
      }
      best(i) = cand
      i += 1
    }
    val (tot, rev) = best(w.length)
    (tot, rev.reverse)
  }

  /** The hard-EM fit over the collected dictionary. Returns
    * (piece, count, log_milli) sorted by piece. */
  private def unigramFit(dict: Seq[(String, Long)], vocabSize: Int,
                         iters: Int, maxPieceLen: Int)
      : Seq[(String, Long, Long)] = {
    require(iters >= 0 && iters <= 8, "unigramTrain: iters must be in [0, 8]")
    require(dict.nonEmpty, "unigramTrain: empty word dictionary")
    var counts: Map[String, Long] = unigramPrune(
      dict.flatMap { case (w, f) =>
        for {
          i <- 0 until w.length
          l <- 1 to math.min(maxPieceLen, w.length - i)
        } yield (w.substring(i, i + l), f)
      }.groupMapReduce(_._1)(_._2)(_ + _), vocabSize)
    val chars = dict.flatMap(_._1.toSeq).distinct.map(_.toString)
    for (_ <- 1 to iters) {
      val total = counts.values.sum
      val scores = counts.map { case (p, c) => p -> lnMilli(c.toDouble, total.toDouble) }
      val usage = dict.flatMap { case (w, f) =>
        unigramViterbi(w, scores, maxPieceLen)._2.map(p => (p, f))
      }.groupMapReduce(_._1)(_._2)(_ + _)
      counts = unigramPrune(
        (usage.keySet ++ chars).iterator.map { p =>
          val u = usage.getOrElse(p, 0L)
          p -> (if (p.length == 1 && u == 0L) 1L else u)
        }.filter(_._2 > 0L).toMap, vocabSize)
    }
    val total = counts.values.sum
    counts.toSeq.sortBy(_._1).map { case (p, c) =>
      (p, c, lnMilli(c.toDouble, total.toDouble)) }
  }

  /** SEGMENT the corpus with the trained unigram LM and report per-doc
    * subword statistics PLUS the document log-likelihood — the
    * tokenizer-fragmentation signal beside [[bpeSegment]]/
    * [[wordpieceSegment]], and the CCNet-style LM-score filter
    * (perplexity filtering with an exactly-replayable model instead of
    * a KenLM binary): low `ll` per subword flags text the in-domain
    * unigram model finds surprising. Out-of-vocabulary CHARACTERS (the
    * only way a word can dead-end) take an UNK score of
    * floor(1000·ln(1/total)+0.5) — the NB default discipline.
    *
    * Scale shape: the model rides the plan as a MAP LITERAL (vocab ≤
    * vocabSize + alphabet — the st42 bounded-model contract) and the
    * Viterbi DP — one aggregate() expression — runs ONCE PER DISTINCT
    * WORD TYPE, not per occurrence: higher-order functions are
    * CodegenFallback, so a per-occurrence DP pays interpreted eval on
    * every token (measured 6.9× at 10× before this shape; 10× corpora
    * grow tokens ~10× but types barely), while the type-level DP is a
    * vocabulary-sized frame the occurrence stream equality-joins
    * (Spark broadcasts it while it fits, shuffle-joins beyond — the NB
    * score-join shape). The per-doc sum stays map-side combinable. */
  def unigramSegment(docs: DataFrame, idCol: String, textCol: String,
                     vocabSize: Int, iters: Int, topWords: Int = 4096,
                     maxPieceLen: Int = 4, maxWordLen: Int = 12): DataFrame = {
    val wstats = unigramWordStats(docs, textCol, vocabSize, iters,
      topWords, maxPieceLen, maxWordLen)
    val occurrences = docs
      .select(col(idCol).as("doc_id"), explode(words(col(textCol))).as("w0"))
      .select(col("doc_id"), lower(col("w0")).as("w"))
    occurrences.join(wstats, Seq("w"))
      .groupBy(col("doc_id"))
      .agg(count(lit(1)).as("n_words"),
        sum(col("c")).as("n_subwords"),
        sum(col("b")).as("ll_milli"))
      .withColumn("subwords_per_word_milli",
        expr("CAST((1000 * n_subwords) DIV n_words AS BIGINT)"))
  }

  /** The per-word-TYPE Viterbi results `(w, b = ll_milli, c = pieces)`
    * — ONE definition for the batch apply ([[unigramSegment]]) and the
    * streaming twin (st53 joins a doc stream against this frame
    * stream-static), so the DP/tie/UNK semantics can never fork. */
  def unigramWordStats(docs: DataFrame, textCol: String,
                       vocabSize: Int, iters: Int, topWords: Int = 4096,
                       maxPieceLen: Int = 4, maxWordLen: Int = 12): DataFrame = {
    val fit = unigramFit(unigramDict(docs, textCol, topWords, maxWordLen),
      vocabSize, iters, maxPieceLen)
    val total = fit.map(_._2).sum
    val unk = lnMilli(1.0, total.toDouble)
    val scores = fit.map { case (p, _, m) => (p, m) }
    val m = map(scores.flatMap { case (p, s) => Seq(lit(p), lit(s)) }: _*)
    val w = col("w")
    // DP state per position: struct(b = best milli total, nj = -start
    // of the winning piece (tie: longest piece wins), c = piece count)
    val dp = aggregate(
      sequence(lit(1), length(w)),
      array(struct(lit(0L).as("b"), lit(0L).as("nj"), lit(0L).as("c"))),
      (acc: Column, i: Column) => concat(acc, array(
        array_max(filter(
          transform(sequence(greatest(lit(1), i - (maxPieceLen - 1)), i),
            j => {
              val piece = w.substr(j, i - j + lit(1))
              val sc = when(j === i,
                coalesce(element_at(m, piece), lit(unk)))
                .otherwise(element_at(m, piece))
              when(sc.isNotNull, struct(
                (element_at(acc, j).getField("b") + sc).as("b"),
                (-j).cast("long").as("nj"),
                (element_at(acc, j).getField("c") + 1L).as("c")))
            }),
          x => x.isNotNull)))))
    val fin = element_at(dp, length(w) + 1)
    docs
      .select(explode(words(col(textCol))).as("w0"))
      .select(lower(col("w0")).as("w"))
      .filter(col("w").rlike("^[a-z0-9]+$") && length(col("w")) <= maxWordLen)
      .distinct()
      .select(col("w"), fin.getField("b").as("b"), fin.getField("c").as("c"))
  }

  /** Per-class evaluation report over [[nbClassify]]-shaped verdicts —
    * the confusion-derived metrics a curation pipeline gates a
    * classifier on before trusting its selections: support, predicted
    * count, correct count, integer-milli precision / recall / F1
    * (truncating DIV — cross-engine exact; a class never predicted
    * reports precision 0, never F1-divide-by-zero). Two map-side
    * aggregates over the verdict frame, joined on the k class labels. */
  def nbEvaluate(verdicts: DataFrame): DataFrame = {
    val byActual = verdicts.groupBy(col("label_actual").as("label"))
      .agg(count(lit(1)).as("n_actual"),
        sum(when(col("is_match"), 1L).otherwise(0L)).as("n_correct"))
    val byPred = verdicts.groupBy(col("pred_label").as("label"))
      .agg(count(lit(1)).as("n_pred"))
    byActual.join(byPred, Seq("label"), "full")
      .select(col("label"),
        coalesce(col("n_actual"), lit(0L)).as("n_actual"),
        coalesce(col("n_pred"), lit(0L)).as("n_pred"),
        coalesce(col("n_correct"), lit(0L)).as("n_correct"))
      .withColumn("precision_milli",
        when(col("n_pred") === 0, 0L)
          .otherwise(expr("CAST((1000 * n_correct) DIV n_pred AS BIGINT)")))
      .withColumn("recall_milli",
        when(col("n_actual") === 0, 0L)
          .otherwise(expr("CAST((1000 * n_correct) DIV n_actual AS BIGINT)")))
      .withColumn("f1_milli",
        when(col("precision_milli") + col("recall_milli") === 0, 0L)
          .otherwise(expr(
            "CAST((2 * precision_milli * recall_milli) DIV (precision_milli + recall_milli) AS BIGINT)")))
  }
}
