package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.operators.{CountMin, Dedup, Graph, Multimodal, Sampling, Similarity, TextAnalysis}

/** LLM-data-pipeline tier over the `documents` / `embeddings` fixtures:
  * dedup (exact, fingerprint, MinHash-LSH, SimHash), similarity search
  * (exact + LSH-bucketed ANN), text analysis, multimodal plumbing.
  *
  * Oracle strategy: everything with engine-independent semantics gets a
  * DuckDB oracle (exact dedup, exact Jaccard pairs, exact cosine top-k,
  * text stats, lang id, multimodal byte features). The LSH *candidate
  * generation* is algorithm-specific, but the fixtures' planted near-dups
  * (3-gram Jaccard ≥ 0.97 vs < 0.3 for everything else) separate so
  * cleanly that banded MinHash at 32×4 has miss probability < 1e-30 —
  * so the post-verification output equals the all-pairs answer and IS
  * oracle-checkable. Genuinely approximate outputs (SimHash distances,
  * ANN) stay rows-only here and get bound assertions in ScalaTest.
  */
object Extensions {

  private def docs(s: SparkSession, d: String): DataFrame =
    s.read.parquet(s"$d/documents.parquet")
  private def emb(s: SparkSession, d: String): DataFrame =
    s.read.parquet(s"$d/embeddings.parquet")

  /** Shared DuckDB fragment: the ext134 domain-affinity computation as
    * CTE blocks ending in `aff(doc_id, n_tokens, overlap_num,
    * affinity_milli)` — ONE definition for the scorer and every
    * selection query composed on top (the BoilerSentence discipline:
    * a formula change is one edit, not N coordinated ones). Target =
    * doc_id % 10 = 0, corpus = the rest, salt 'da'. */
  private[queries] val DomainAffinityCte: String =
    """tok AS (
      |  SELECT doc_id,
      |         ('0x' || substr(md5(t || ':da'), 1, 8))::BIGINT % 10000 AS b
      |  FROM (SELECT doc_id,
      |               unnest(list_filter(regexp_split_to_array(trim(text), '\s+'), x -> x <> '')) AS t
      |        FROM documents)
      |),
      |tgt AS (SELECT b, count(*) AS ct FROM tok WHERE doc_id % 10 = 0 GROUP BY b),
      |nt AS (SELECT count(*) AS n FROM tok WHERE doc_id % 10 = 0),
      |db AS (SELECT doc_id, b, count(*) AS cd FROM tok WHERE doc_id % 10 <> 0 GROUP BY 1, 2),
      |dn AS (SELECT doc_id, sum(cd) AS nd FROM db GROUP BY doc_id),
      |num AS (
      |  SELECT db.doc_id, sum(least(db.cd * nt.n, tgt.ct * dn.nd)) AS num
      |  FROM db JOIN dn USING (doc_id) JOIN tgt USING (b) CROSS JOIN nt
      |  GROUP BY db.doc_id
      |),
      |aff AS (
      |  SELECT dn.doc_id, CAST(dn.nd AS BIGINT) AS n_tokens,
      |         CAST(coalesce(num.num, 0) AS BIGINT) AS overlap_num,
      |         CAST(CASE WHEN num.num IS NULL THEN 0
      |                   ELSE (1000 * num.num) // (dn.nd * (SELECT n FROM nt))
      |              END AS BIGINT) AS affinity_milli
      |  FROM dn LEFT JOIN num USING (doc_id)
      |)""".stripMargin

  /** ext78's piece vocabulary — a static artifact (a tokenizer vocab
    * file), shared verbatim between the Spark plan and the oracle SQL.
    * Multi-char pieces segment the fixture's vocabulary words; the
    * single letters are the char-level fallback tier (so only
    * non-ASCII-letter input reaches `<unk>`). */
  private val pieceVocab: Seq[String] = Seq(
    "tab", "le", "win", "dow", "spark", "str", "eam", "qu", "ery",
    "cus", "tom", "er", "val", "ue", "gr", "oup", "ord", "data",
    "jo", "in", "sm", "all", "fil", "ter", "ve", "ctor", "ba", "tch",
    "sc", "an", "so", "rt", "li", "ne", "co", "lumn", "ha", "sh",
    "me", "rge", "ro", "ke", "the", "ag", "par", "fa", "slo", "big",
    "row", "key") ++ ('a' to 'z').map(_.toString)

  private val base: Seq[(String, Q)] = Seq(

    // Perceptual (decoded-pixel) media dedup — closes the round-6 gap
    // that dedupBySignature hashes BYTES, so re-encodings of the same
    // image never collapsed. Three byte-distinct encodings are planted
    // per sampled doc (base PNG / same-pixels BMP / +1-brightness PNG,
    // Multimodal.encodePngVariants); aHash and dHash over the DECODED
    // pixels must see ONE image (shift-invariant integer hashes) while
    // the md5 byte signature sees three payloads. The oracle states the
    // planting contract in closed form per doc — any decode failure,
    // non-invariant hash bit, or signature collision breaks a value.
    "ext87_perceptual_dedup" -> Q(
      (s, d) => {
        val sample = docs(s, d).filter(col("doc_id") % 20 === 0)
        Multimodal.perceptualHashes(
            Multimodal.encodePngVariants(sample, "doc_id")).toDF()
          .groupBy(col("doc_id"))
          .agg(count(lit(1)).as("n_variants"),
               countDistinct(col("ahash")).as("n_phash"),
               countDistinct(col("dhash")).as("n_dhash"),
               countDistinct(col("byte_sig")).as("n_bytesig"))
      },
      Some("""SELECT doc_id,
             |       CAST(3 AS BIGINT) AS n_variants,
             |       CAST(1 AS BIGINT) AS n_phash,
             |       CAST(1 AS BIGINT) AS n_dhash,
             |       CAST(3 AS BIGINT) AS n_bytesig
             |FROM documents WHERE doc_id % 20 = 0""".stripMargin)),

    // JPEG re-encode robustness — the r7 verdict's perceptual upgrade
    // pinned end-to-end: four planted encodings per doc (base PNG /
    // same-pixels BMP / +1-brightness PNG / REAL JPEG q0.75 re-encode
    // of a 64×64 dithered two-tone, Multimodal.encodeJpegVariants).
    // The area-average luma hash must see ONE image across all four
    // (JPEG's block-aligned quantization erases the dither but not the
    // cell means), while the retained nearest-sample hash provably
    // splits the JPEG (its 8-strided samples sit on the dither, which
    // decode smooths across the mean) — n_phash_nearest = 2 IS the
    // measured fragility the upgrade removes, validated exhaustively
    // over the id range (501/501 docs both ways). Byte sigs see four.
    "ext94_jpeg_robustness" -> Q(
      (s, d) => {
        // the encode pass (4 codecs/doc incl. JPEG compression) feeds
        // BOTH hash branches of one joined plan — persist it once, with
        // the lease watching the joined output (the contaminatedBloom
        // discipline; Caching.leased watches DataFrames, and the typed
        // frame's plan is the same plan its toDF wraps)
        val media = Multimodal.encodeJpegVariants(
          docs(s, d).filter(col("doc_id") % 20 === 0), "doc_id")
          .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
        val area = Multimodal.perceptualHashes(media).toDF()
          .groupBy(col("doc_id"))
          .agg(count(lit(1)).as("n_variants"),
               countDistinct(col("ahash"), col("dhash")).as("n_phash_area"),
               countDistinct(col("byte_sig")).as("n_bytesig"))
        val nearest = Multimodal.nearestSampleHashes(media).toDF()
          .groupBy(col("doc_id"))
          .agg(countDistinct(col("ahash"), col("dhash")).as("n_phash_nearest"))
        val out = area.join(nearest, "doc_id")
          .select(col("doc_id"), col("n_variants"), col("n_phash_area"),
            col("n_phash_nearest"), col("n_bytesig"))
        graft.util.Caching.releaseOnConsumed(out, Seq(media.toDF())) { () =>
          media.unpersist(blocking = false)
        }
      },
      Some("""SELECT doc_id, CAST(4 AS BIGINT) AS n_variants,
             |       CAST(1 AS BIGINT) AS n_phash_area,
             |       CAST(2 AS BIGINT) AS n_phash_nearest,
             |       CAST(4 AS BIGINT) AS n_bytesig
             |FROM documents WHERE doc_id % 20 = 0""".stripMargin)),

    // SimHash family-explosion guard (the ext89 discipline on the chunk
    // join): a planted 40-copy family shares its whole 64-bit signature,
    // so it lands intact in every chunk bucket and the uncapped join
    // would emit 780 pairs; capped, it routes whole to the report.
    // maxHamming = 0 on purpose: full-signature buckets make natural
    // collisions a 64-bit event (the fixture's exact-dup families are
    // size ≤ 2, far below the cap), so the report is closed-form without
    // knowing any hash VALUE — at wider maxHamming the narrow chunks
    // collide naturally (~n/2^width per bucket) and the planted bucket
    // size would be fixture-sensitive (the cap-calibration note on
    // simhashPairsCapped). Output: the per-member report + the pinned
    // zero count of family-touching pairs; a NATURAL doc in the report
    // would surface with the self-describing UNEXPECTED kind.
    "ext95_simhash_capped" -> Q(
      (s, d) => {
        import s.implicits._
        val boiler = "all rights reserved unauthorized reproduction of this " +
          "material is strictly prohibited by the publisher"
        val planted = (1 to 40).map(i => (-i.toLong, boiler)).toDF("doc_id", "text")
        val corpus = docs(s, d).select(col("doc_id"), col("text")).unionByName(planted)
        val (pairs, families) = Dedup.simhashPairsCapped(
          corpus, "doc_id", "text", n = 3, maxHamming = 0, maxBucket = 16)
        families.select(
            when(col("doc_id") < 0, "capped")
              .otherwise("UNEXPECTED_natural_bucket_over_cap").as("kind"),
            col("doc_id"), col("n_capped_chunks"),
            col("max_bucket_size"), col("family_rep"))
          .unionByName(
            pairs.filter(col("doc_a") < 0 || col("doc_b") < 0)
              .agg(count(lit(1)).as("doc_id"))
              .select(lit("family_pairs").as("kind"), col("doc_id"),
                lit(0L).as("n_capped_chunks"), lit(0L).as("max_bucket_size"),
                lit(0L).as("family_rep")))
      },
      Some("""SELECT 'capped' AS kind, -CAST(i AS BIGINT) AS doc_id,
             |       CAST(1 AS BIGINT) AS n_capped_chunks,
             |       CAST(40 AS BIGINT) AS max_bucket_size,
             |       CAST(-40 AS BIGINT) AS family_rep
             |FROM range(1, 41) r(i)
             |UNION ALL
             |SELECT 'family_pairs', CAST(0 AS BIGINT), CAST(0 AS BIGINT),
             |       CAST(0 AS BIGINT), CAST(0 AS BIGINT)""".stripMargin)),

    // Prefix-filter family guard (the ext89 discipline on the EXACT
    // AllPairs/PPJoin path): a 40-copy planted family orders its
    // identical sets identically, so all members carry the same prefix
    // tokens and each token's posting list is the whole family — the
    // exact join is as quadratic under a viral family as the sketches.
    // Planted boiler = 16 unique words → 14 distinct trigrams → prefix
    // length 14 − ceil(0.8·14) + 1 = 3, every one capped at posting 40
    // > 16 → zero family pairs, report (doc, 3 tokens, bucket 40) per
    // member, closed-form. Natural pairs are untouched (no natural
    // posting near the cap) and replay against the inverted-index
    // truth; a natural doc in the report would surface UNEXPECTED.
    "ext96_jaccard_capped" -> Q(
      (s, d) => {
        import s.implicits._
        val boiler = "winter harbor lanterns drift above quiet meadows " +
          "while copper windmills turn beneath amber twilight skies tonight"
        val planted = (1 to 40).map(i => (-i.toLong, boiler)).toDF("doc_id", "text")
        val corpus = docs(s, d).select(col("doc_id"), col("text")).unionByName(planted)
        val (pairs, families) = Dedup.jaccardPairsCapped(
          corpus, "doc_id", "text", n = 3, threshold = 0.8, maxBucket = 16)
        pairs.select(lit("pair").as("kind"), col("doc_a"), col("doc_b"), col("jaccard"))
          .unionByName(families.select(
            when(col("doc_id") < 0, "capped")
              .otherwise("UNEXPECTED_natural_posting_over_cap").as("kind"),
            col("doc_id").as("doc_a"),
            col("n_capped_tokens").cast("long").as("doc_b"),
            col("max_bucket_size").cast("double").as("jaccard")))
      },
      Some(raw"""WITH w AS (
             |  SELECT doc_id, list_filter(regexp_split_to_array(text, '\s+'), t -> t <> '') AS w FROM documents
             |), sh AS (
             |  SELECT doc_id, list_distinct(list_transform(range(1, len(w) - 1),
             |           i -> w[i] || ' ' || w[i+1] || ' ' || w[i+2])) AS s
             |  FROM w WHERE len(w) >= 3
${OracleSql.InvIndex}
             |)
             |SELECT 'pair' AS kind, ix.doc_a, ix.doc_b,
             |       round(i::DOUBLE / (sa.n + sb.n - i), 6) AS jaccard
             |FROM (SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, count(*) AS i
             |      FROM inv a JOIN inv b ON a.g = b.g AND a.doc_id < b.doc_id
             |      GROUP BY 1, 2) ix
             |JOIN sz sa ON sa.doc_id = ix.doc_a
             |JOIN sz sb ON sb.doc_id = ix.doc_b
             |WHERE i::DOUBLE / (sa.n + sb.n - i) >= 0.8
             |UNION ALL
             |SELECT 'capped', -CAST(i AS BIGINT), CAST(3 AS BIGINT),
             |       CAST(40 AS DOUBLE)
             |FROM range(1, 41) r(i)""".stripMargin)),

    // Containment-join family guard (ext96's discipline on the ordered
    // near-subset join, with its ONE-ENDED coverage contract: a missed
    // qualifying pair always has its CONTAINED side in the report — the
    // doc the drop-the-contained policy acts on). Same 40-copy planting
    // with a 17-word boiler → 15 distinct trigrams; at threshold 0.9
    // the prefix is 15 − ceil(0.9·15) + 1 = 15 − 14 + 1 = 2 tokens,
    // each with restricted posting 40 > 16 → zero family pairs, report
    // (doc, 2 tokens, bucket 40) per member, closed-form; natural
    // ordered pairs replay against the inverted-index truth.
    // EXACT heavy hitters over an unbounded domain (token BIGRAMS,
    // ~930 distinct — genuinely above the sketch's 96 counters, so the
    // Misra-Gries pass really overflows and merges). Every 2nd doc is
    // rewritten to a 13-word boilerplate, making its 12 bigrams the
    // planted heavy family (250 occurrences each at sf0.01, 2500 at
    // sf0.1) against a ~10-per-bigram natural background. The sketch
    // candidates are partition-order-dependent, but the exact-recount
    // second pass (cnt·(k+1) > n, the PODS'12 guarantee) makes the
    // OUTPUT exact — the oracle recomputes it as a plain
    // GROUP BY ... HAVING.
    "ext98_heavy_hitters" -> Q(
      (s, d) => TextAnalysis.heavyHitters(
        Tables.boilerBigrams(docs(s, d)), col("item"), k = 96),
      Some(OracleSql.HeavyHittersBigrams)),

    // WEIGHTED heavy hitters: accounts by total SPEND (integer cents)
    // over the events stream — the value-weighted census where
    // occurrence counting answers the wrong question. Three whale
    // accounts are planted by rewriting every 7th user's id (each
    // whale then carries ~4.8% of total mass vs the 1/(k+1) ≈ 1.03%
    // threshold); ~1290 natural accounts at sf0.1 keep the 96-counter
    // sketch genuinely overflowing. Exact by the weighted two-pass
    // (undercount ≤ W/(k+1) ⇒ candidate superset ⇒ exact re-sum).
    "ext102_weighted_heavy_hitters" -> Q(
      (s, d) => {
        val ev = Tables.events(s, d).select(
          when(col("user_id") % 7 === 0,
            concat(lit("whale_"), (col("user_id") % 3).cast("string")))
            .otherwise(concat(lit("u"), col("user_id").cast("string"))).as("item"),
          floor(col("value") * 100 + 0.5).cast("long").as("w"))
        TextAnalysis.weightedHeavyHitters(ev, col("item"), col("w"), k = 96)
      },
      Some("""WITH it AS (
             |  SELECT CASE WHEN user_id % 7 = 0 THEN 'whale_' || (user_id % 3)
             |              ELSE 'u' || user_id END AS item,
             |         CAST(floor(value * 100 + 0.5) AS BIGINT) AS w
             |  FROM events
             |), p AS (
             |  SELECT * FROM it WHERE item IS NOT NULL AND w IS NOT NULL AND w > 0
             |), tot AS (SELECT CAST(sum(w) AS BIGINT) AS w_total FROM p)
             |SELECT item, CAST(sum(w) AS BIGINT) AS w_sum, tot.w_total
             |FROM p, tot
             |GROUP BY item, tot.w_total
             |HAVING sum(w) * 97 > tot.w_total""".stripMargin)),

    // heavy hitters PER GROUP (per-language here — per-domain
    // boilerplate and per-feed hot keys are the same shape): each
    // language's own n_g/(k+1) threshold, sketch state ≤ k counters
    // per group, candidates ≤ |groups|·k rows broadcast onto ONE
    // shuffle-free recount scan. The planted boilerplate spans every
    // language (the rewrite ignores lang), so each lang's heavy set is
    // exactly the 12 planted bigrams — but with per-lang counts and
    // thresholds the oracle recomputes group-locally.
    "ext101_group_heavy_hitters" -> Q(
      (s, d) => TextAnalysis.heavyHittersPerGroup(
        Tables.boilerBigrams(docs(s, d), keep = Seq("lang")),
        "lang", col("item"), k = 96),
      Some(raw"""WITH rw AS (
             |  SELECT lang,
             |         CASE WHEN doc_id % 2 = 0
             |              THEN 'granite lighthouses hum beneath amber fog while copper gulls spiral over quiet breakwaters'
             |              ELSE text END AS text
             |  FROM documents
             |), t AS (
             |  SELECT lang, list_filter(regexp_split_to_array(text, '\s+'), x -> x <> '') AS w FROM rw
             |), bi AS (
             |  SELECT lang, unnest(list_transform(range(1, len(w)), i -> w[i] || ' ' || w[i+1])) AS item
             |  FROM t WHERE len(w) >= 2
             |), tot AS (SELECT lang, count(*) AS n_items FROM bi GROUP BY lang)
             |SELECT bi.lang, item, CAST(count(*) AS BIGINT) AS cnt, tot.n_items
             |FROM bi JOIN tot USING (lang)
             |GROUP BY bi.lang, item, tot.n_items
             |HAVING count(*) * 97 > tot.n_items""".stripMargin)),

    // Count-Min point-frequency estimates, certified: the sketch tier's
    // "how often does THIS item occur" complement to the Misra-Gries
    // census (ext98). The sketch is a ≤ d·w-row (r, bucket, cnt) TABLE
    // (d=4, w=2048 — 8K counters summarizing the whole bigram stream);
    // probes are the distinct bigrams of a deterministic 1/97 document
    // sample (the "estimate corpus frequency of a sample's n-grams"
    // importance-weighting shape) plus three planted absent strings.
    // Everything — md5 bucket hashes, cell counts, the min over d rows,
    // the exact certification counts — replays in DuckDB, so the
    // ESTIMATES themselves are value-oracled, and the CMS deterministic
    // guarantee est ≥ cnt shows up as overcount ≥ 0 in both engines.
    "ext103_countmin" -> Q(
      (s, d) => CountMin.estimates(
        Tables.boilerBigrams(docs(s, d)), col("item"),
        Tables.countMinProbes(docs(s, d)), col("item"), d = 4, w = 2048),
      Some(OracleSql.CountMinBigrams)),

    // WEIGHTED Count-Min: spend-per-account estimates (integer cents)
    // from a 4×1024 sketch, certified against the exact re-sum — the
    // point-query complement of ext102's weighted census, on the same
    // whale-account fixture. Probes: every 1/41 user's account (whale
    // renames included) plus one absent account.
    "ext106_countmin_weighted" -> Q(
      (s, d) => {
        val ev = Tables.events(s, d).select(
          when(col("user_id") % 7 === 0,
            concat(lit("whale_"), (col("user_id") % 3).cast("string")))
            .otherwise(concat(lit("u"), col("user_id").cast("string"))).as("item"),
          floor(col("value") * 100 + 0.5).cast("long").as("wt"),
          col("user_id"))
        val probes = ev.filter(col("user_id") % 41 === 5).select(col("item"))
          .unionByName(s.range(1).select(lit("absent_account").as("item")))
        CountMin.estimatesWeighted(ev, col("item"), col("wt"),
          probes, col("item"), d = 4, w = 1024)
      },
      Some("""WITH it AS (
             |  SELECT CASE WHEN user_id % 7 = 0 THEN 'whale_' || (user_id % 3)
             |              ELSE 'u' || user_id END AS item,
             |         CAST(floor(value * 100 + 0.5) AS BIGINT) AS wt, user_id
             |  FROM events
             |), p0 AS (
             |  SELECT item, wt FROM it
             |  WHERE item IS NOT NULL AND wt IS NOT NULL AND wt > 0
             |), pr AS (
             |  SELECT DISTINCT item FROM (
             |    SELECT item FROM it WHERE user_id % 41 = 5
             |    UNION ALL SELECT 'absent_account')
             |), rows_ AS (SELECT unnest(range(4)) AS r
             |), sk AS (
             |  SELECT r, ('0x' || substr(md5('cm' || r || ':' || item), 1, 8))::BIGINT % 1024 AS bucket,
             |         sum(wt) AS cnt
             |  FROM p0, rows_ GROUP BY 1, 2
             |), cells AS (
             |  SELECT item, r, ('0x' || substr(md5('cm' || r || ':' || item), 1, 8))::BIGINT % 1024 AS bucket
             |  FROM pr, rows_
             |), est AS (
             |  SELECT c.item, min(coalesce(sk.cnt, 0)) AS e
             |  FROM cells c LEFT JOIN sk USING (r, bucket) GROUP BY c.item
             |), exact AS (
             |  SELECT item, sum(wt) AS s FROM p0
             |  WHERE item IN (SELECT item FROM pr) GROUP BY item
             |)
             |SELECT est.item, CAST(est.e AS BIGINT) AS est_w,
             |       CAST(coalesce(exact.s, 0) AS BIGINT) AS w_sum,
             |       CAST(est.e - coalesce(exact.s, 0) AS BIGINT) AS overcount
             |FROM est LEFT JOIN exact USING (item)""".stripMargin)),

    // Pairwise language-drift dashboard: exact total-variation distance
    // between per-lang unigram distributions in fixed-point micro-units
    // (TV, not KL — no transcendental log to drift across engines; the
    // Σ|p−q| = Σp + Σq − 2·Σ min identity keeps the vocabulary join
    // INNER). One explode + map-side-combined counts; the pair frame is
    // C(5 langs, 2) per shared token.
    "ext109_corpus_divergence" -> Q(
      (s, d) => TextAnalysis.unigramDivergence(docs(s, d), "lang", "text"),
      Some(raw"""WITH tk AS (
             |  SELECT lang AS slice,
             |         unnest(list_filter(regexp_split_to_array(trim(text), '\s+'), x -> x <> '')) AS token
             |  FROM documents WHERE lang IS NOT NULL AND text IS NOT NULL
             |), c AS (SELECT slice, token, count(*) AS c FROM tk GROUP BY 1, 2
             |), t AS (SELECT slice, sum(c) AS tot FROM c GROUP BY 1
             |), p AS (
             |  SELECT c.slice, token, (1000000 * c.c) // t.tot AS p_micro
             |  FROM c JOIN t USING (slice)
             |), s AS (SELECT slice, sum(p_micro) AS s_micro FROM p GROUP BY 1
             |), ov AS (
             |  SELECT a.slice AS slice_a, b.slice AS slice_b,
             |         count(*) AS n_common_tokens,
             |         sum(least(a.p_micro, b.p_micro)) AS min_overlap_micro
             |  FROM p a JOIN p b ON a.token = b.token AND a.slice < b.slice
             |  GROUP BY 1, 2
             |)
             |SELECT slice_a, slice_b,
             |       CAST(n_common_tokens AS BIGINT) AS n_common_tokens,
             |       CAST(sa.s_micro AS BIGINT) AS s_a_micro,
             |       CAST(sb.s_micro AS BIGINT) AS s_b_micro,
             |       CAST(min_overlap_micro AS BIGINT) AS min_overlap_micro,
             |       CAST(sa.s_micro + sb.s_micro - 2 * min_overlap_micro AS BIGINT) AS tv2_micro
             |FROM ov JOIN s sa ON sa.slice = ov.slice_a
             |        JOIN s sb ON sb.slice = ov.slice_b""".stripMargin)),

    // Token-level drift attribution: WHICH tokens carry the en↔de
    // distribution shift — exact integer unigram probs per slice,
    // full-outer joined (absent side = 0), top-40 by |delta| with the
    // (desc, token) total order. ext109 answers "drifted?"; this
    // answers "by what".
    "ext122_drift_attribution" -> Q(
      (s, d) => TextAnalysis.driftAttribution(docs(s, d), "lang", "text",
        "en", "de", k = 40),
      Some(raw"""WITH tk AS (
             |  SELECT lang AS slice,
             |         unnest(list_filter(regexp_split_to_array(trim(text), '\s+'), x -> x <> '')) AS token
             |  FROM documents WHERE lang IN ('en', 'de') AND text IS NOT NULL
             |), c AS (SELECT slice, token, count(*) AS c FROM tk GROUP BY 1, 2
             |), t AS (SELECT slice, sum(c) AS tot FROM c GROUP BY 1
             |), p AS (
             |  SELECT c.slice, token, (1000000 * c.c) // t.tot AS p_micro
             |  FROM c JOIN t USING (slice)
             |), j AS (
             |  SELECT token,
             |         CAST(coalesce(a.p_micro, 0) AS BIGINT) AS p_a_micro,
             |         CAST(coalesce(b.p_micro, 0) AS BIGINT) AS p_b_micro
             |  FROM (SELECT token, p_micro FROM p WHERE slice = 'en') a
             |  FULL OUTER JOIN (SELECT token, p_micro FROM p WHERE slice = 'de') b
             |    USING (token)
             |)
             |SELECT CAST(rnk AS BIGINT) AS rnk, token, p_a_micro, p_b_micro,
             |       CAST(p_a_micro - p_b_micro AS BIGINT) AS delta_micro
             |FROM (SELECT token, p_a_micro, p_b_micro,
             |             row_number() OVER (ORDER BY abs(p_a_micro - p_b_micro) DESC, token) AS rnk
             |      FROM j)
             |WHERE rnk <= 40""".stripMargin)),

    // Embedding second-moment (Gram) matrix for whitening/PCA prep:
    // integer-quantized exact sums over every dimension pair. The pair
    // expansion happens INSIDE a projection (native gram_cells over the
    // row's own vector — d(d+1)/2 = 2080 structs per row, no self-join),
    // and the groupBy has ≤ 2080 keys, so partial aggregation collapses
    // each partition to one matrix before the shuffle — the map-side-
    // combine shape that makes n·d² explode rows cost zero network.
    // r15: the cell generator is the native [[graft.functions.GramCells]]
    // expression (one primitive loop per row) replacing a nested
    // flatten/transform/transform HOF whose lambdas the interpreted
    // evaluator ran once per cell — value-identical incl. null elements.
    // cov_num = n·Sxy − Sx·Sy is the exact integer covariance numerator
    // (divide by n² offline for the sample covariance).
    "ext110_gram_matrix" -> Q(
      (s, d) => {
        graft.sql.GraftExtensions.ensureRegistered(s)
        val q = s.read.parquet(s"$d/embeddings.parquet")
          .filter(col("embedding").isNotNull && size(col("embedding")) > 0)
          .select(expr(
            "transform(embedding, x -> CAST(floor(x * 64 + 0.5) AS BIGINT))").as("q"))
        val cells = q.select(explode(call_function("gram_cells", col("q"))).as("c"))
          .select(col("c.i"), col("c.j"), col("c.xy"), col("c.x"), col("c.y"))
        cells.groupBy(col("i"), col("j"))
          .agg(count(lit(1)).as("n"), sum(col("xy")).as("sxy"),
            sum(col("x")).as("sx"), sum(col("y")).as("sy"))
          .select(col("i"), col("j"), col("n"), col("sxy"), col("sx"), col("sy"),
            (col("n") * col("sxy") - col("sx") * col("sy")).as("cov_num"))
      },
      Some("""WITH q AS (
             |  SELECT list_transform(embedding, x -> CAST(floor(x * 64 + 0.5) AS BIGINT)) AS q
             |  FROM embeddings WHERE embedding IS NOT NULL AND len(embedding) > 0
             |), u AS (
             |  SELECT q, unnest(generate_series(1, len(q))) AS ii FROM q
             |), cells AS (
             |  SELECT ii - 1 AS i, unnest(generate_series(ii, len(q))) - 1 AS j, q, ii
             |  FROM u
             |), v AS (
             |  SELECT i, j, q[i + 1] * q[j + 1] AS xy, q[i + 1] AS x, q[j + 1] AS y
             |  FROM cells
             |)
             |SELECT CAST(i AS INT) AS i, CAST(j AS INT) AS j,
             |       CAST(count(*) AS BIGINT) AS n,
             |       CAST(sum(xy) AS BIGINT) AS sxy,
             |       CAST(sum(x) AS BIGINT) AS sx,
             |       CAST(sum(y) AS BIGINT) AS sy,
             |       CAST(count(*) * sum(xy) - sum(x) * sum(y) AS BIGINT) AS cov_num
             |FROM v GROUP BY 1, 2""".stripMargin)),

    // End-to-end entity resolution: SNM blocking (ext111's O(n·window)
    // candidates + exact Jaccard verify) feeding min-label connected
    // components and keeper election — the full blocking→verify→
    // cluster→survivorship pipeline as ONE query. The oracle replays
    // components as a transitive min-id closure (recursive CTE;
    // closure cost is per-component quadratic, bounded here by the
    // SNM window's chain components). Singletons keep themselves.
    "ext113_er_pipeline" -> Q(
      (s, d) => {
        val corpus = docs(s, d)
        val pairs = Dedup.sortedNeighborhood(corpus, "doc_id", "text",
          window = 8, thresholdMilli = 800)
        Dedup.clusters(corpus, "doc_id", pairs)
      },
      Some(raw"""WITH RECURSIVE t AS (
             |  SELECT doc_id,
             |         substr(regexp_replace(lower(trim(text)), '\s+', ' ', 'g'), 1, 32) AS k,
             |         list_distinct(list_filter(regexp_split_to_array(trim(text), '\s+'), x -> x <> '')) AS w
             |  FROM documents WHERE doc_id IS NOT NULL AND text IS NOT NULL
             |), n AS (
             |  SELECT doc_id, w, row_number() OVER (ORDER BY k, doc_id) AS rn FROM t
             |), c AS (
             |  SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
             |         len(list_intersect(a.w, b.w)) AS i,
             |         len(list_distinct(list_concat(a.w, b.w))) AS u
             |  FROM n a JOIN n b ON b.rn > a.rn AND b.rn <= a.rn + 8
             |), p AS (SELECT doc_a, doc_b FROM c WHERE u > 0 AND 1000 * i >= 800 * u
             |), e AS (
             |  SELECT doc_a AS a, doc_b AS b FROM p
             |  UNION SELECT doc_b, doc_a FROM p
             |), r AS (
             |  SELECT a AS node, a AS label FROM e
             |  UNION
             |  SELECT e.b, r.label FROM r JOIN e ON e.a = r.node
             |), lab AS (
             |  SELECT node, min(label) AS cluster_id FROM r GROUP BY 1
             |), sz AS (
             |  SELECT cluster_id, count(*) AS sz FROM lab GROUP BY 1
             |)
             |SELECT d.doc_id,
             |       coalesce(lab.cluster_id, d.doc_id) AS cluster_id,
             |       CAST(coalesce(sz.sz, 1) AS BIGINT) AS cluster_size,
             |       coalesce(lab.cluster_id, d.doc_id) = d.doc_id AS is_keeper
             |FROM documents d
             |LEFT JOIN lab ON lab.node = d.doc_id
             |LEFT JOIN sz ON sz.cluster_id = coalesce(lab.cluster_id, d.doc_id)""".stripMargin)),

    // Weak-supervision label propagation: docs with doc_id % 7 == 3 are
    // treated as UNLABELED; each gets the majority language among
    // labeled docs sharing a 3-gram shingle, votes weighted by shared
    // distinct shingles, ties broken by lexicographic lang. The shingle
    // inverted index is df-pruned on BOTH ends (df = 1 matches nothing
    // — lossless; df > 64 drops viral boilerplate shingles — the
    // documented hub guard, replayed by the oracle), so no shingle key
    // can explode the join at scale. Output carries the held-out truth
    // and a hit flag, so the query doubles as the accuracy report.
    "ext112_label_propagation" -> Q(
      (s, d) => {
        val tk = docs(s, d)
          .filter(col("doc_id").isNotNull && col("text").isNotNull)
          .select(col("doc_id"), col("lang"),
            filter(split(trim(col("text")), "\\s+"), t => t =!= "").as("w"))
        val sh = tk.filter(size(col("w")) >= 3)
          .select(col("doc_id"), col("lang"), explode(array_distinct(expr(
            "transform(sequence(0, size(w) - 3), i -> concat(w[i], ' ', w[i+1], ' ', w[i+2]))")))
            .as("g"))
        val dfq = sh.groupBy(col("g")).agg(count(lit(1)).as("df"))
          .filter(col("df") >= 2 && col("df") <= 64)
        val kept = sh.join(dfq.select(col("g")), "g")
        val votes = kept.filter(col("doc_id") % 7 === 3)
          .select(col("doc_id"), col("g"))
          .join(kept.filter(col("doc_id") % 7 =!= 3)
            .select(col("g"), col("lang").as("pred_lang"),
              col("doc_id").as("l_doc")), "g")
          .groupBy(col("doc_id"), col("pred_lang"))
          .agg(count(lit(1)).as("votes"),
            countDistinct(col("l_doc")).as("n_voters"))
        val best = votes
          .groupBy(col("doc_id"))
          .agg(min(struct((-col("votes")).as("nv"), col("pred_lang"),
            col("votes"), col("n_voters"))).as("b"))
          .select(col("doc_id"), col("b.pred_lang").as("pred_lang"),
            col("b.votes").as("votes"), col("b.n_voters").as("n_voters"))
        best.join(docs(s, d).select(col("doc_id"), col("lang").as("actual_lang")),
            "doc_id")
          .select(col("doc_id"), col("pred_lang"), col("votes"), col("n_voters"),
            col("actual_lang"),
            when(col("pred_lang") === col("actual_lang"), 1).otherwise(0)
              .cast("int").as("hit"))
      },
      Some(raw"""WITH tk AS (
             |  SELECT doc_id, lang,
             |         list_filter(regexp_split_to_array(trim(text), '\s+'), x -> x <> '') AS w
             |  FROM documents WHERE doc_id IS NOT NULL AND text IS NOT NULL
             |), sh AS (
             |  SELECT doc_id, lang,
             |         unnest(list_distinct(list_transform(range(1, len(w) - 1),
             |           i -> w[i] || ' ' || w[i+1] || ' ' || w[i+2]))) AS g
             |  FROM tk WHERE len(w) >= 3
             |), dfq AS (
             |  SELECT g FROM (SELECT g, count(*) AS df FROM sh GROUP BY 1)
             |  WHERE df BETWEEN 2 AND 64
             |), kept AS (SELECT sh.* FROM sh JOIN dfq USING (g)
             |), v AS (
             |  SELECT u.doc_id AS doc_id, l.lang AS pred_lang,
             |         count(*) AS votes, count(DISTINCT l.doc_id) AS n_voters
             |  FROM kept u JOIN kept l ON u.g = l.g
             |  WHERE u.doc_id % 7 = 3 AND l.doc_id % 7 <> 3
             |  GROUP BY 1, 2
             |), r AS (
             |  SELECT *, row_number() OVER (PARTITION BY doc_id
             |            ORDER BY votes DESC, pred_lang) AS rk FROM v
             |)
             |SELECT r.doc_id, r.pred_lang, CAST(r.votes AS BIGINT) AS votes,
             |       CAST(r.n_voters AS BIGINT) AS n_voters,
             |       d.lang AS actual_lang,
             |       CAST(CASE WHEN r.pred_lang = d.lang THEN 1 ELSE 0 END AS INT) AS hit
             |FROM r JOIN documents d ON d.doc_id = r.doc_id
             |WHERE rk = 1""".stripMargin)),

    // Sorted-neighborhood (SNM) near-dup blocking: O(n·window) candidate
    // pairs by CONSTRUCTION (rn-bucket equality join over a distributed
    // range-partitioned row numbering — no viral family can explode a
    // bucket, the trade being prefix-locality recall). Exact distinct-
    // token Jaccard verify; the oracle replays the identical sort,
    // window probe, and integer threshold.
    // Multi-pass SNM (Hernández & Stolfo SIGMOD'95): prefix-key pass ∪
    // suffix-key pass, canonical (least, greatest) pair union, ONE
    // Jaccard verify — restores the suffix-agreeing pairs the prefix
    // sort can never compare, each pass still O(n·window) by
    // construction. The oracle replays both sorts, both window probes,
    // the canonical union, and the verify.
    "ext114_multipass_snm" -> Q(
      (s, d) => Dedup.sortedNeighborhoodMultiPass(docs(s, d), "doc_id",
        "text", window = 8, thresholdMilli = 800),
      Some(raw"""WITH t AS (
             |  SELECT doc_id,
             |         regexp_replace(lower(trim(text)), '\s+', ' ', 'g') AS nrm,
             |         list_distinct(list_filter(regexp_split_to_array(trim(text), '\s+'), x -> x <> '')) AS w
             |  FROM documents WHERE doc_id IS NOT NULL AND text IS NOT NULL
             |), n1 AS (
             |  SELECT doc_id, row_number() OVER (ORDER BY substr(nrm, 1, 32), doc_id) AS rn FROM t
             |), n2 AS (
             |  SELECT doc_id, row_number() OVER (ORDER BY substr(reverse(nrm), 1, 32), doc_id) AS rn FROM t
             |), c AS (
             |  SELECT least(a.doc_id, b.doc_id) AS doc_a, greatest(a.doc_id, b.doc_id) AS doc_b
             |  FROM n1 a JOIN n1 b ON b.rn > a.rn AND b.rn <= a.rn + 8
             |  UNION
             |  SELECT least(a.doc_id, b.doc_id), greatest(a.doc_id, b.doc_id)
             |  FROM n2 a JOIN n2 b ON b.rn > a.rn AND b.rn <= a.rn + 8
             |), v AS (
             |  SELECT doc_a, doc_b,
             |         len(list_intersect(ta.w, tb.w)) AS i,
             |         len(list_distinct(list_concat(ta.w, tb.w))) AS u
             |  FROM c JOIN t ta ON ta.doc_id = c.doc_a
             |         JOIN t tb ON tb.doc_id = c.doc_b
             |)
             |SELECT doc_a, doc_b, CAST((1000 * i) // u AS BIGINT) AS jaccard_milli
             |FROM v WHERE u > 0 AND 1000 * i >= 800 * u""".stripMargin)),

    "ext111_sorted_neighborhood" -> Q(
      (s, d) => Dedup.sortedNeighborhood(docs(s, d), "doc_id", "text",
        window = 8, thresholdMilli = 800),
      Some(raw"""WITH t AS (
             |  SELECT doc_id,
             |         substr(regexp_replace(lower(trim(text)), '\s+', ' ', 'g'), 1, 32) AS k,
             |         list_distinct(list_filter(regexp_split_to_array(trim(text), '\s+'), x -> x <> '')) AS w
             |  FROM documents WHERE doc_id IS NOT NULL AND text IS NOT NULL
             |), n AS (
             |  SELECT doc_id, w, row_number() OVER (ORDER BY k, doc_id) AS rn FROM t
             |), c AS (
             |  SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
             |         len(list_intersect(a.w, b.w)) AS i,
             |         len(list_distinct(list_concat(a.w, b.w))) AS u
             |  FROM n a JOIN n b ON b.rn > a.rn AND b.rn <= a.rn + 8
             |)
             |SELECT doc_a, doc_b, CAST((1000 * i) // u AS BIGINT) AS jaccard_milli
             |FROM c WHERE u > 0 AND 1000 * i >= 800 * u""".stripMargin)),

    // Multi-source BFS blast radius over the part↔supplier bipartite
    // graph (distinct lineitem pairs; suppliers negated to share the
    // node space): from a deterministic compromised-supplier seed set,
    // the EXACT shortest hop distance of every node within 3 hops —
    // hop 1 = parts they supply, hop 2 = co-suppliers of those parts,
    // hop 3 = the co-suppliers' other parts. Level-synchronous frontier
    // expansion: each round is one frontier-sized equality join plus an
    // anti-join against the settled set (never a pair explosion); the
    // oracle replays it as a bounded recursive CTE with min-hop
    // aggregation.
    "ext108_bfs_radius" -> Q(
      (s, d) => {
        val li = s.read.parquet(s"$d/lineitem.parquet")
          .select(col("l_partkey").as("a"), (-col("l_suppkey")).as("b"))
        val seeds = s.read.parquet(s"$d/supplier.parquet")
          .filter(col("s_suppkey") % 97 === 7)
          .select((-col("s_suppkey")).as("node"))
        Graph.bfsHops(li, "a", "b", seeds, "node", maxHops = 3)
      },
      Some("""WITH RECURSIVE e AS (
             |  SELECT DISTINCT l_partkey AS a, -l_suppkey AS b FROM lineitem
             |), ee AS (SELECT a, b FROM e UNION ALL SELECT b, a FROM e
             |), seeds AS (
             |  SELECT DISTINCT -s_suppkey AS node FROM supplier WHERE s_suppkey % 97 = 7
             |), r(node, hops) AS (
             |  SELECT node, 0 FROM seeds
             |  UNION
             |  SELECT ee.b, r.hops + 1 FROM r JOIN ee ON ee.a = r.node WHERE r.hops < 3
             |)
             |SELECT node, CAST(min(hops) AS INT) AS hops FROM r GROUP BY 1""".stripMargin)),

    // Corpus-overlap rate WITHOUT a corpus join: deterministic bottom-64
    // hash sketches of the training corpus vs a drifted benchmark copy
    // (every 5th doc; half exact, half suffix-perturbed), the KMV
    // resemblance estimate beside the exact certification — the
    // "how contaminated are we" dashboard number at sketch cost. The
    // md5 60-bit hashes make sketch contents, tau, and the estimate
    // itself value-oracled (unlike HLL's rows-only q14b).
    "ext107_corpus_overlap" -> Q(
      (s, d) => {
        val bench = docs(s, d).filter(col("doc_id") % 5 === 0)
          .select(when(col("doc_id") % 10 === 0, col("text"))
            .otherwise(concat(col("text"), lit(" bench-drift"))).as("text"))
        Dedup.corpusOverlap(docs(s, d), col("text"), bench, col("text"),
          k = 64)
      },
      Some("""WITH ta AS (
             |  SELECT DISTINCT ('0x' || substr(md5(text), 1, 15))::BIGINT AS h
             |  FROM documents WHERE text IS NOT NULL
             |), tbsrc AS (
             |  SELECT CASE WHEN doc_id % 10 = 0 THEN text ELSE text || ' bench-drift' END AS text
             |  FROM documents WHERE doc_id % 5 = 0
             |), tb AS (
             |  SELECT DISTINCT ('0x' || substr(md5(text), 1, 15))::BIGINT AS h
             |  FROM tbsrc WHERE text IS NOT NULL
             |), ba AS (SELECT h FROM ta ORDER BY h LIMIT 64
             |), bb AS (SELECT h FROM tb ORDER BY h LIMIT 64
             |), un AS (
             |  SELECT DISTINCT h FROM (SELECT h FROM ba UNION ALL SELECT h FROM bb)
             |  ORDER BY h LIMIT 64
             |), sk AS (
             |  SELECT count(*) AS k_used,
             |         sum(CASE WHEN a.h IS NOT NULL AND b.h IS NOT NULL THEN 1 ELSE 0 END) AS n_shared,
             |         max(un.h) AS tau
             |  FROM un LEFT JOIN ba a ON un.h = a.h LEFT JOIN bb b ON un.h = b.h
             |), cn AS (
             |  SELECT (SELECT count(*) FROM ta) AS n_a,
             |         (SELECT count(*) FROM tb) AS n_b,
             |         (SELECT count(*) FROM ta JOIN tb USING (h)) AS exact_inter
             |)
             |SELECT CAST(64 AS BIGINT) AS k, CAST(n_a AS BIGINT) AS n_a,
             |       CAST(n_b AS BIGINT) AS n_b, CAST(n_shared AS BIGINT) AS n_shared,
             |       tau, CAST(exact_inter AS BIGINT) AS exact_inter,
             |       CAST(n_a + n_b - exact_inter AS BIGINT) AS exact_union,
             |       CAST((1000 * n_shared) // k_used AS BIGINT) AS est_jaccard_milli,
             |       CAST((1000 * exact_inter) // (n_a + n_b - exact_inter) AS BIGINT) AS exact_jaccard_milli
             |FROM sk, cn""".stripMargin)),

    // Document-level co-occurrence pair mining (market-basket frequent
    // pairs, a-priori pruned — LOSSLESS pruning, unlike the LSH caps):
    // every unordered token pair sharing >= n_docs/10 documents, with
    // exact document frequencies and the integer milli-lift. Relative
    // thresholds make the query scale-invariant across fixtures; the
    // per-doc pair fan-out is bounded by the replayable top-64-by-df
    // cap (inert on this corpus: max 30 frequent tokens per doc).
    "ext104_frequent_pairs" -> Q(
      (s, d) => TextAnalysis.frequentPairs(docs(s, d), "doc_id", "text",
        supportDenom = 10, maxPerDoc = 64),
      Some(raw"""WITH t AS (
             |  SELECT doc_id, list_distinct(list_filter(regexp_split_to_array(text, '\s+'), x -> x <> '')) AS w
             |  FROM documents
             |), u AS (
             |  SELECT doc_id, unnest(w) AS token FROM t
             |), n AS (SELECT count(DISTINCT doc_id) AS n_docs FROM documents
             |), df AS (
             |  SELECT token, count(*) AS df FROM u GROUP BY 1
             |), fi AS (
             |  SELECT token, df FROM df, n WHERE df * 10 >= n.n_docs
             |), kept AS (
             |  SELECT doc_id, token FROM (
             |    SELECT u.doc_id, u.token,
             |           row_number() OVER (PARTITION BY u.doc_id ORDER BY fi.df DESC, u.token) AS rk
             |    FROM u JOIN fi ON u.token = fi.token)
             |  WHERE rk <= 64
             |), p AS (
             |  SELECT a.token AS tok_a, b.token AS tok_b, count(*) AS pair_df
             |  FROM kept a JOIN kept b ON a.doc_id = b.doc_id AND a.token < b.token
             |  GROUP BY 1, 2
             |)
             |SELECT tok_a, tok_b, CAST(pair_df AS BIGINT) AS pair_df,
             |       CAST(fa.df AS BIGINT) AS df_a, CAST(fb.df AS BIGINT) AS df_b,
             |       CAST(n.n_docs AS BIGINT) AS n_docs,
             |       CAST((1000 * pair_df * n.n_docs) // (fa.df * fb.df) AS BIGINT) AS milli_lift
             |FROM p JOIN fi fa ON p.tok_a = fa.token
             |       JOIN fi fb ON p.tok_b = fb.token, n
             |WHERE pair_df * 10 >= n.n_docs""".stripMargin)),

    // EXACT triangle census over the co-order part graph (parts sharing
    // an order — the basket graph; ~116k edges / 414k triangles at
    // sf0.01): per-part triangle participation, degree, and C(deg,2),
    // so local clustering coefficients and the global count are exact
    // integer ratios. The degree-oriented compact-forward join bounds
    // wedge output at O(m^1.5) regardless of hub degree — the id-
    // oriented naive form goes quadratic on one bestseller part. The
    // edge build itself is an equality join on l_orderkey with per-order
    // fan-out bounded by lines-per-order².
    "ext105_triangles" -> Q(
      (s, d) => {
        val li = s.read.parquet(s"$d/lineitem.parquet")
          .select(col("l_orderkey"), col("l_partkey"))
        val e = li.as("x").join(li.as("y"),
            col("x.l_orderkey") === col("y.l_orderkey") &&
              col("x.l_partkey") < col("y.l_partkey"))
          .select(col("x.l_partkey").as("a"), col("y.l_partkey").as("b"))
        graft.operators.Graph.triangles(e, "a", "b")
      },
      Some("""WITH e0 AS (
             |  SELECT DISTINCT a.l_partkey AS a, b.l_partkey AS b
             |  FROM lineitem a JOIN lineitem b
             |    ON a.l_orderkey = b.l_orderkey AND a.l_partkey < b.l_partkey
             |), deg AS (
             |  SELECT node, count(*) AS deg FROM (
             |    SELECT a AS node FROM e0 UNION ALL SELECT b FROM e0) GROUP BY 1
             |), dir AS (
             |  SELECT CASE WHEN da.deg < db.deg OR (da.deg = db.deg AND a < b) THEN a ELSE b END AS u,
             |         CASE WHEN da.deg < db.deg OR (da.deg = db.deg AND a < b) THEN b ELSE a END AS v,
             |         CASE WHEN da.deg < db.deg OR (da.deg = db.deg AND a < b) THEN db.deg ELSE da.deg END AS deg_v
             |  FROM e0 JOIN deg da ON da.node = e0.a JOIN deg db ON db.node = e0.b
             |), tri AS (
             |  SELECT e1.u AS x, e1.v AS y, e2.v AS z
             |  FROM dir e1 JOIN dir e2 ON e1.u = e2.u
             |    AND (e1.deg_v < e2.deg_v OR (e1.deg_v = e2.deg_v AND e1.v < e2.v))
             |  JOIN dir e3 ON e3.u = e1.v AND e3.v = e2.v
             |), pern AS (
             |  SELECT node, count(*) AS tri FROM (
             |    SELECT x AS node FROM tri UNION ALL
             |    SELECT y FROM tri UNION ALL SELECT z FROM tri) GROUP BY 1
             |)
             |SELECT deg.node, CAST(deg.deg AS BIGINT) AS deg,
             |       CAST(coalesce(p.tri, 0) AS BIGINT) AS tri,
             |       CAST(deg.deg * (deg.deg - 1) // 2 AS BIGINT) AS max_wedges
             |FROM deg LEFT JOIN pern p USING (node)""".stripMargin)),

    "ext97_containment_capped" -> Q(
      (s, d) => {
        import s.implicits._
        val boiler = "violet comets trace slow arcs over frozen orchards " +
          "while distant beacons pulse along the basalt shoreline cliffs"
        val planted = (1 to 40).map(i => (-i.toLong, boiler)).toDF("doc_id", "text")
        val corpus = docs(s, d).select(col("doc_id"), col("text")).unionByName(planted)
        val (pairs, families) = Dedup.containmentPairsCapped(
          corpus, "doc_id", "text", n = 3, threshold = 0.9, maxBucket = 16)
        pairs.select(lit("pair").as("kind"), col("doc_a"), col("doc_b"),
            col("containment"))
          .unionByName(families.select(
            when(col("doc_id") < 0, "capped")
              .otherwise("UNEXPECTED_natural_posting_over_cap").as("kind"),
            col("doc_id").as("doc_a"),
            col("n_capped_tokens").cast("long").as("doc_b"),
            col("max_bucket_size").cast("double").as("containment")))
      },
      Some(raw"""WITH w AS (
             |  SELECT doc_id, list_filter(regexp_split_to_array(text, '\s+'), t -> t <> '') AS w FROM documents
             |), sh AS (
             |  SELECT doc_id, list_distinct(list_transform(range(1, len(w) - 1),
             |           i -> w[i] || ' ' || w[i+1] || ' ' || w[i+2])) AS s
             |  FROM w WHERE len(w) >= 3
${OracleSql.InvIndex}
             |)
             |SELECT 'pair' AS kind, ix.doc_a, ix.doc_b,
             |       round(i::DOUBLE / sa.n, 6) AS containment
             |FROM (SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, count(*) AS i
             |      FROM inv a JOIN inv b ON a.g = b.g AND a.doc_id <> b.doc_id
             |      GROUP BY 1, 2) ix
             |JOIN sz sa ON sa.doc_id = ix.doc_a
             |WHERE i::DOUBLE / sa.n >= 0.9
             |UNION ALL
             |SELECT 'capped', -CAST(i AS BIGINT), CAST(2 AS BIGINT),
             |       CAST(40 AS DOUBLE)
             |FROM range(1, 41) r(i)""".stripMargin)),

    // Mixed-schema JSON corpus ingested through the YAML A1 path into
    // quality scoring — the VARIANT tier driven end-to-end by the
    // ENGINE, not a hand-held DataFrame: stage documents as drifting
    // JSON lines (three shapes: text+nested meta.lang / text+flat lang
    // / body with NO lang), read them back as a raw `text` input table,
    // and let the pipeline SQL absorb the drift with
    // parse_json/variant_get typed paths before computing the quality
    // gate. A static from_json schema cannot express this input; the
    // oracle recomputes every output from the original parquet.
    "ext88_variant_ingest" -> Q(
      (s, d) => {
        val base = s"/tmp/graft-ext/${d.replaceAll("[^A-Za-z0-9]", "_")}/variant_ingest"
        Tables.stageDriftingJsonl(s, d, base)
        val job = graft.config.ConfigParser.parse(
          s"""job:
             |  name: ext-variant-ingest
             |  type: spark-sql
             |input_tables:
             |  - name: raw_crawl
             |    source: s3
             |    location: $base/corpus_jsonl
             |    format: text
             |    schema: "value STRING"
             |output_table:
             |  name: variant_quality
             |  target: s3
             |  location: $base/out
             |  format: parquet
             |sql: >
             |  SELECT variant_get(v, '$$.doc_id', 'bigint') AS doc_id,
             |         coalesce(variant_get(v, '$$.meta.lang', 'string'),
             |                  variant_get(v, '$$.lang', 'string'), 'und') AS lang,
             |         length(coalesce(variant_get(v, '$$.text', 'string'),
             |                         variant_get(v, '$$.body', 'string'))) AS n_chars,
             |         size(split(trim(coalesce(variant_get(v, '$$.text', 'string'),
             |                                  variant_get(v, '$$.body', 'string'))), '\\\\s+')) AS n_tokens,
             |         (size(split(trim(coalesce(variant_get(v, '$$.text', 'string'),
             |                                   variant_get(v, '$$.body', 'string'))), '\\\\s+')) >= 5
             |          AND coalesce(variant_get(v, '$$.meta.lang', 'string'),
             |                       variant_get(v, '$$.lang', 'string'), 'und') <> 'und') AS is_quality
             |  FROM (SELECT parse_json(value) AS v FROM raw_crawl)
             |""".stripMargin)
        graft.engine.Engine.runSparkSqlJob(s, job, "default", Map.empty)
        s.read.parquet(s"$base/out")
      },
      Some("""SELECT doc_id,
             |       CASE WHEN doc_id % 3 = 2 THEN 'und' ELSE lang END AS lang,
             |       CAST(length(text) AS INT) AS n_chars,
             |       CAST(len(regexp_split_to_array(trim(text), '\s+')) AS INT) AS n_tokens,
             |       (len(regexp_split_to_array(trim(text), '\s+')) >= 5
             |        AND doc_id % 3 <> 2) AS is_quality
             |FROM documents""".stripMargin)),

    // MinHash-LSH with the family-explosion guard: a 60-copy viral
    // boilerplate family is planted next to the corpus. Uncapped LSH
    // would emit its 60·59/2 = 1770 pairs (the ~quadratic-per-family
    // output ScaleCheck measured as the 100 TB job-killer); with
    // maxBucket = 16 every one of the family's band buckets is capped,
    // so the pair output is EXACTLY ext03's (the guard provably changes
    // nothing below the cap) and each planted doc is routed to the
    // family report instead — 32 capped buckets (every band), family
    // size 60. No silent caps: the report accounts for every capped
    // membership, and the oracle states both halves in closed form.
    // PRECONDITION the oracle encodes: no NATURAL fixture bucket exceeds
    // 16 members (max exact-dup family is 2 at sf0.1; verified at both
    // SFs). If a future fixture breaks that, this query goes red with
    // extra kind='capped' rows carrying NON-NEGATIVE doc_ids — that
    // signature means "fixture grew a >16 near-dup family", not a guard
    // bug; raise maxBucket or extend the oracle's capped side.
    "ext89_minhash_capped" -> Q(
      (s, d) => {
        import s.implicits._
        val boiler = "terms of service apply to all visitors cookies are " +
          "required to continue reading this site content is provided as is"
        val planted = (1 to 60).map(i => (-i.toLong, boiler)).toDF("doc_id", "text")
        val corpus = docs(s, d).select(col("doc_id"), col("text")).unionByName(planted)
        val (pairs, families) = Dedup.minhashLshCapped(
          corpus, "doc_id", "text", n = 3, k = 128, bands = 32,
          threshold = 0.8, maxBucket = 16)
        pairs.select(lit("pair").as("kind"), col("doc_a"), col("doc_b"), col("jaccard"))
          .unionByName(families.select(
            // the NAMED drift signal (ADVICE r7): a natural (non-planted)
            // doc in the capped report means the fixture grew a >16
            // near-dup family — fail with a self-describing kind, not a
            // mystery value mismatch
            when(col("doc_id") < 0, "capped")
              .otherwise("UNEXPECTED_natural_bucket_over_cap").as("kind"),
            col("doc_id").as("doc_a"),
            col("n_capped_buckets").cast("long").as("doc_b"),
            col("max_bucket_size").cast("double").as("jaccard")))
      },
      Some(raw"""WITH sh AS (
             |  SELECT doc_id, list_distinct(list_transform(range(1, len(w) - 1),
             |           i -> w[i] || ' ' || w[i+1] || ' ' || w[i+2])) AS s
             |  FROM (SELECT doc_id, list_filter(regexp_split_to_array(text, '\s+'), t -> t <> '') AS w FROM documents)
             |  WHERE len(w) >= 3
${OracleSql.InvIndex}
             |), pairs AS (
             |  -- inverted-index exact form (r8): any pair with jaccard > 0
             |  -- shares a shingle, so the shingle-keyed equi-join enumerates
             |  -- every such pair with its exact intersection count; rows with
             |  -- i = 0 are absent but can never pass a positive threshold.
             |  -- Same rows as the all-pairs join at index cost, not n².
             |  SELECT ix.doc_a, ix.doc_b, ix.i, sa.n AS la, sb.n AS lb
             |  FROM (SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, count(*) AS i
             |        FROM inv a JOIN inv b ON a.g = b.g AND a.doc_id < b.doc_id
             |        GROUP BY 1, 2) ix
             |  JOIN sz sa ON sa.doc_id = ix.doc_a
             |  JOIN sz sb ON sb.doc_id = ix.doc_b
             |)
             |SELECT 'pair' AS kind, doc_a, doc_b,
             |       round(i::DOUBLE / (la + lb - i), 6) AS jaccard
             |FROM pairs WHERE i::DOUBLE / (la + lb - i) >= 0.8
             |UNION ALL
             |SELECT 'capped', -CAST(i AS BIGINT), CAST(32 AS BIGINT), CAST(60 AS DOUBLE)
             |FROM range(1, 61) r(i)""".stripMargin)),

    // The whole-family ACTION the capped report enables — a corpus-wide
    // keep/drop VERDICT where viral families (capped buckets) elect ONE
    // keeper via the report's family_rep while ordinary near-dup
    // clusters go through connected components as usual: the complete
    // dedup decision a 100 TB pipeline executes, with the quadratic
    // family never materializing as pairs. Subset corpus (doc_id%10=0)
    // keeps the oracle's all-pairs + recursive-CTE replay tractable;
    // the planted 40-copy family is capped in every band, elects -40.
    "ext90_family_verdict" -> Q(
      (s, d) => {
        import s.implicits._
        val boiler = "subscribe to our newsletter for updates terms and " +
          "conditions apply to every visitor of this site"
        val planted = (1 to 40).map(i => (-i.toLong, boiler)).toDF("doc_id", "text")
        val corpus = docs(s, d).filter(col("doc_id") % 10 === 0)
          .select(col("doc_id"), col("text")).unionByName(planted)
        val (pairs, families) = Dedup.minhashLshCapped(
          corpus, "doc_id", "text", n = 3, k = 128, bands = 32,
          threshold = 0.8, maxBucket = 16)
        val cl = Dedup.clusters(corpus, "doc_id",
          pairs.select(col("doc_a"), col("doc_b")))
        cl.join(families.select(col("doc_id"), col("family_rep")), Seq("doc_id"), "left")
          .select(col("doc_id"),
            // named drift signal (ADVICE r7): a natural doc in the capped
            // report = fixture grew an over-cap family — self-describing
            when(col("family_rep").isNotNull && col("doc_id") >= 0,
              "UNEXPECTED_natural_bucket_over_cap")
            .when(col("family_rep").isNotNull && col("doc_id") === col("family_rep"),
              "family_keeper")
            .when(col("family_rep").isNotNull, "family_dup")
            .when(col("cluster_size") > 1 && col("is_keeper"), "cluster_keeper")
            .when(col("cluster_size") > 1, "cluster_dup")
            .otherwise("unique").as("verdict"),
            coalesce(col("family_rep"), col("cluster_id")).as("keeper_id"))
      },
      Some(raw"""WITH RECURSIVE sub AS (
             |  SELECT doc_id, text FROM documents WHERE doc_id % 10 = 0
             |), sh AS MATERIALIZED (
             |  SELECT doc_id, list_distinct(list_transform(range(1, len(w) - 1),
             |           i -> w[i] || ' ' || w[i+1] || ' ' || w[i+2])) AS s
             |  FROM (SELECT doc_id, list_filter(regexp_split_to_array(text, '\s+'), t -> t <> '') AS w FROM sub)
             |  WHERE len(w) >= 3
${OracleSql.InvIndex}
${OracleSql.Components}
             |), clusters AS (
             |  SELECT s.doc_id, coalesce(c.cluster_id, s.doc_id) AS cluster_id
             |  FROM sub s LEFT JOIN comp c USING (doc_id)
             |), sizes AS (
             |  SELECT cluster_id, count(*) AS n FROM clusters GROUP BY cluster_id
             |)
             |SELECT c.doc_id,
             |       CASE WHEN z.n > 1 AND c.doc_id = c.cluster_id THEN 'cluster_keeper'
             |            WHEN z.n > 1 THEN 'cluster_dup'
             |            ELSE 'unique' END AS verdict,
             |       c.cluster_id AS keeper_id
             |FROM clusters c JOIN sizes z USING (cluster_id)
             |UNION ALL
             |SELECT -CAST(i AS BIGINT),
             |       CASE WHEN i = 40 THEN 'family_keeper' ELSE 'family_dup' END,
             |       CAST(-40 AS BIGINT)
             |FROM range(1, 41) r(i)""".stripMargin)),

    // Bloom-prefiltered exact decontamination: benchmark = the docs
    // with doc_id % 13 = 0 (an eval set drawn from the corpus, so hits
    // are guaranteed); the corpus membership scan happens against the
    // broadcast Bloom sketch, and the exact verify join removes the fpp
    // false positives. No false negatives ⇒ the output provably equals
    // the plain corpus⋈benchmark text join, which IS the oracle — the
    // bloom's contribution is the 100 TB plan shape (corpus never
    // shuffles; the verify probe is candidate-sized), pinned value-exact.
    "ext92_bloom_decontamination" -> Q(
      (s, d) => Dedup.contaminatedBloom(
        docs(s, d), docs(s, d).filter(col("doc_id") % 13 === 0),
        "doc_id", "text"),
      Some("""SELECT c.doc_id, b.doc_id AS bench_id
             |FROM documents c
             |JOIN documents b ON b.doc_id % 13 = 0 AND c.text = b.text""".stripMargin)),

    // Capped decontamination under a planted CROSS-SIDE viral family —
    // the 100 TB failure mode the ext16 cap guards against, exercised
    // end-to-end: 30 train + 3 bench copies of one boilerplate text
    // form a 33-member family (> cap 16) sharing every band bucket, so
    // ZERO family pairs are emitted (the |family|² blowup never runs)
    // and every planted train doc is instead FLAGGED via the capped
    // report with bench_hit_id = the smallest bench family member
    // (-1003). Natural cross-side pairs are untouched (capped ==
    // uncapped below the cap — ext16's output); a NATURAL doc in the
    // report would surface with the self-describing UNEXPECTED kind.
    // Oracle: the inverted-index cross-side truth UNION the closed-form
    // planted verdicts.
    "ext93_capped_contamination" -> Q(
      (s, d) => {
        import s.implicits._
        val boiler = "click here to accept cookies and continue to the " +
          "article text provided by the syndication network partner"
        val all = docs(s, d)
        val train = all.filter(col("doc_id") % 10 =!= 0)
          .select(col("doc_id"), col("text"))
          .unionByName((1 to 30).map(i => (-i.toLong, boiler)).toDF("doc_id", "text"))
        val bench = all.filter(col("doc_id") % 10 === 0)
          .select(col("doc_id"), col("text"))
          .unionByName((1001 to 1003).map(i => (-i.toLong, boiler)).toDF("doc_id", "text"))
        val (pairs, report) = Dedup.contaminatedNearCapped(
          train, bench, "doc_id", "text", n = 3, k = 128, bands = 32,
          threshold = 0.8, maxBucket = 16)
        pairs.select(lit("pair").as("kind"), col("doc_id"),
            col("matched_bench_id"), col("jaccard"))
          .unionByName(report
            .filter(col("side") === "t" && col("bench_hit_id").isNotNull)
            .select(
              when(col("doc_id") < 0, "flagged")
                .otherwise("UNEXPECTED_natural_bucket_over_cap").as("kind"),
              col("doc_id"), col("bench_hit_id").as("matched_bench_id"),
              lit(null).cast("double").as("jaccard")))
      },
      Some(raw"""WITH w AS (
             |  SELECT doc_id, list_filter(regexp_split_to_array(text, '\s+'), t -> t <> '') AS w FROM documents
             |), sh AS (
             |  SELECT doc_id, list_distinct(list_transform(range(1, len(w) - 1),
             |           i -> w[i] || ' ' || w[i+1] || ' ' || w[i+2])) AS s
             |  FROM w WHERE len(w) >= 3
${OracleSql.InvIndex}
             |)
             |SELECT 'pair' AS kind, ix.doc_id, ix.matched_bench_id,
             |       round(i::DOUBLE / (st.n + sb.n - i), 6) AS jaccard
             |FROM (SELECT t.doc_id, b.doc_id AS matched_bench_id, count(*) AS i
             |      FROM inv t JOIN inv b
             |        ON t.g = b.g AND t.doc_id % 10 <> 0 AND b.doc_id % 10 = 0
             |      GROUP BY 1, 2) ix
             |JOIN sz st ON st.doc_id = ix.doc_id
             |JOIN sz sb ON sb.doc_id = ix.matched_bench_id
             |WHERE i::DOUBLE / (st.n + sb.n - i) >= 0.8
             |UNION ALL
             |SELECT 'flagged', -CAST(i AS BIGINT), CAST(-1003 AS BIGINT),
             |       CAST(NULL AS DOUBLE)
             |FROM range(1, 31) r(i)""".stripMargin)),

    "ext01_exact_dedup" -> Q(
      (s, d) => Dedup.exact(docs(s, d), "doc_id", "text"),
      Some("""SELECT md5(text) AS content_hash,
             |       min(doc_id) AS keeper_id,
             |       count(*) AS n_copies
             |FROM documents GROUP BY md5(text)""".stripMargin)),

    // WHERE duplication concentrates (ext01 says which docs): per-source
    // share of docs in a cross-corpus dup family + redundant copies
    // beyond each family's keeper, integer-milli rates.
    "ext128_dup_rate" -> Q(
      (s, d) => Dedup.dupRateBySlice(docs(s, d), "doc_id", "text", "source"),
      Some("""WITH h AS (
             |  SELECT source AS slice, doc_id, md5(text) AS h FROM documents
             |), fam AS (
             |  SELECT h, count(*) AS n_copies, min(doc_id) AS keeper_id
             |  FROM h GROUP BY 1
             |)
             |SELECT slice, CAST(count(*) AS BIGINT) AS n_docs,
             |       CAST(sum(CASE WHEN n_copies > 1 THEN 1 ELSE 0 END) AS BIGINT) AS n_in_dup_family,
             |       CAST(sum(CASE WHEN doc_id <> keeper_id THEN 1 ELSE 0 END) AS BIGINT) AS n_redundant,
             |       CAST((1000 * sum(CASE WHEN n_copies > 1 THEN 1 ELSE 0 END)) // count(*) AS BIGINT) AS dup_milli,
             |       CAST((1000 * sum(CASE WHEN doc_id <> keeper_id THEN 1 ELSE 0 END)) // count(*) AS BIGINT) AS redundant_milli
             |FROM h JOIN fam USING (h)
             |GROUP BY slice""".stripMargin)),

    "ext02_fingerprint_dedup" -> Q(
      (s, d) => Dedup.fingerprint(docs(s, d), "doc_id", "text"),
      Some("""SELECT md5(trim(regexp_replace(regexp_replace(lower(text), '[^a-z0-9\s]', '', 'g'), '\s+', ' ', 'g'))) AS fingerprint,
             |       min(doc_id) AS keeper_id,
             |       count(*) AS n_copies
             |FROM documents GROUP BY 1""".stripMargin)),

    // MinHash → 32×4 banding → bucket join → exact-Jaccard ≥ 0.8: equals
    // the all-pairs answer on this fixture (see scaladoc above).
    "ext03_minhash_lsh" -> Q(
      (s, d) => Dedup.minhashLsh(docs(s, d), "doc_id", "text",
        n = 3, k = 128, bands = 32, threshold = 0.8),
      Some(raw"""WITH sh AS (
             |  SELECT doc_id, list_distinct(list_transform(range(1, len(w) - 1),
             |           i -> w[i] || ' ' || w[i+1] || ' ' || w[i+2])) AS s
             |  FROM (SELECT doc_id, list_filter(regexp_split_to_array(text, '\s+'), t -> t <> '') AS w FROM documents)
             |  WHERE len(w) >= 3
${OracleSql.InvIndex}
             |), pairs AS (
             |  -- inverted-index exact form (r8): any pair with jaccard > 0
             |  -- shares a shingle, so the shingle-keyed equi-join enumerates
             |  -- every such pair with its exact intersection count; rows with
             |  -- i = 0 are absent but can never pass a positive threshold.
             |  -- Same rows as the all-pairs join at index cost, not n².
             |  SELECT ix.doc_a, ix.doc_b, ix.i, sa.n AS la, sb.n AS lb
             |  FROM (SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, count(*) AS i
             |        FROM inv a JOIN inv b ON a.g = b.g AND a.doc_id < b.doc_id
             |        GROUP BY 1, 2) ix
             |  JOIN sz sa ON sa.doc_id = ix.doc_a
             |  JOIN sz sb ON sb.doc_id = ix.doc_b
             |)
             |SELECT doc_a, doc_b, round(i::DOUBLE / (la + lb - i), 6) AS jaccard
             |FROM pairs WHERE i::DOUBLE / (la + lb - i) >= 0.8""".stripMargin)),

    // near-dup pairs verified by edit distance on a 512-char prefix:
    // CAPPED banded MinHash candidates (ext03's machinery + the ext89
    // bucket guard — per-pair Levenshtein inside a viral family is
    // exactly the |family|² work the cap skips) each pay one banded
    // Levenshtein ≤ 6 — the character-level verify Jaccard can't
    // express (reordered text keeps Jaccard high but edit distance
    // large; the fixture's ed=8 pair proves the filter discriminates).
    // Capped-family members would surface as NULL-marked (rep, member)
    // rows; none exist on this fixture (cap 64 > any natural bucket),
    // so such a row is the loud fixture-drift signal.
    "ext68_edit_dedup" -> Q(
      (s, d) => {
        val (pairs, families) = Dedup.editDistancePairsCapped(
          docs(s, d), "doc_id", "text",
          n = 3, k = 128, bands = 32, threshold = 0.8,
          maxDist = 6, prefixChars = 512, maxBucket = 64)
        pairs.unionByName(families
          .filter(col("doc_id") =!= col("family_rep"))
          .select(col("family_rep").as("doc_a"), col("doc_id").as("doc_b"),
            lit(null).cast("double").as("jaccard"),
            lit(null).cast("int").as("edit_dist")))
      },
      Some(raw"""WITH sh AS (
             |  SELECT doc_id, list_distinct(list_transform(range(1, len(w) - 1),
             |           i -> w[i] || ' ' || w[i+1] || ' ' || w[i+2])) AS s,
             |         substr(text, 1, 512) AS t
             |  FROM (SELECT doc_id, text, list_filter(regexp_split_to_array(text, '\s+'), x -> x <> '') AS w FROM documents)
             |  WHERE len(w) >= 3
${OracleSql.InvIndex}
             |), jp AS (
             |  -- inverted-index exact form (r8): any pair with jaccard > 0
             |  -- shares a shingle; same rows as the all-pairs join at index
             |  -- cost, not n² (i = 0 pairs absent, can't pass the threshold).
             |  SELECT ix.doc_a, ix.doc_b,
             |         round(i::DOUBLE / (sa.n + sb.n - i), 6) AS jaccard
             |  FROM (SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, count(*) AS i
             |        FROM inv a JOIN inv b ON a.g = b.g AND a.doc_id < b.doc_id
             |        GROUP BY 1, 2) ix
             |  JOIN sz sa ON sa.doc_id = ix.doc_a
             |  JOIN sz sb ON sb.doc_id = ix.doc_b
             |  WHERE i::DOUBLE / (sa.n + sb.n - i) >= 0.8
             |)
             |-- levenshtein only on the (tiny) jaccard-qualifying pair set
             |SELECT jp.doc_a, jp.doc_b, jp.jaccard,
             |       levenshtein(ta.t, tb.t) AS edit_dist
             |FROM jp JOIN sh ta ON ta.doc_id = jp.doc_a
             |        JOIN sh tb ON tb.doc_id = jp.doc_b
             |WHERE levenshtein(ta.t, tb.t) <= 6""".stripMargin)),

    // SEMANTIC contamination: train×bench cosine ≥ 0.45 — the
    // embedding-space complement of ext16's n-gram decontamination
    // (paraphrased leakage shares no 8-gram but sits close in embedding
    // space). Bench side = vec_id % 10 == 0, broadcast.
    "ext70_semantic_contamination" -> Q(
      (s, d) => {
        val e = emb(s, d)
        Similarity.contaminatedSemantic(
          e.filter(col("vec_id") % 10 =!= 0), e.filter(col("vec_id") % 10 === 0),
          "vec_id", "embedding", 0.45)
      },
      Some("""SELECT a.vec_id AS train_id, b.vec_id AS bench_id,
             |       round(list_cosine_similarity(a.embedding::DOUBLE[], b.embedding::DOUBLE[]), 6) AS cosine
             |FROM embeddings a JOIN embeddings b
             |  ON a.vec_id % 10 <> 0 AND b.vec_id % 10 = 0
             | AND list_cosine_similarity(a.embedding::DOUBLE[], b.embedding::DOUBLE[]) >= 0.45""".stripMargin)),

    // template/boilerplate hubs: degree ≥ 2 in the near-dup graph —
    // pairwise dedup keeps one copy per pair, but a template near-dups
    // against MANY documents; its degree is the drop-the-family signal.
    // Oracle: degree count over the all-pairs Jaccard truth.
    // The capped form: a capped-family member IS a hub by construction
    // (≥ maxBucket band-mates) and surfaces via the family report with
    // its residual sub-cap verified degree as the degree column (null
    // for identical-content families, whose every bucket is over-cap —
    // ADVICE r8: the residual is carried, not dropped); none exist on
    // this fixture (cap 64), so the loud-drift rule applies.
    "ext69_dup_hubs" -> Q(
      (s, d) => {
        val (hubs, families) = Dedup.dupHubsCapped(docs(s, d), "doc_id", "text",
          n = 3, k = 128, bands = 32, threshold = 0.8, minDegree = 2,
          maxBucket = 64)
        hubs.unionByName(families.select(col("doc_id"),
          col("sub_cap_degree").as("degree")))
      },
      Some(raw"""WITH sh AS (
             |  SELECT doc_id, list_distinct(list_transform(range(1, len(w) - 1),
             |           i -> w[i] || ' ' || w[i+1] || ' ' || w[i+2])) AS s
             |  FROM (SELECT doc_id, list_filter(regexp_split_to_array(text, '\s+'), x -> x <> '') AS w FROM documents)
             |  WHERE len(w) >= 3
${OracleSql.InvIndex}
             |), pairs AS (
             |  -- inverted-index exact form (r8): any pair with jaccard > 0
             |  -- shares a shingle; same rows as the all-pairs join at index
             |  -- cost, not n² (i = 0 pairs absent, can't pass the threshold).
             |  SELECT ix.doc_a, ix.doc_b
             |  FROM (SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, count(*) AS i
             |        FROM inv a JOIN inv b ON a.g = b.g AND a.doc_id < b.doc_id
             |        GROUP BY 1, 2) ix
             |  JOIN sz sa ON sa.doc_id = ix.doc_a
             |  JOIN sz sb ON sb.doc_id = ix.doc_b
             |  WHERE i::DOUBLE / (sa.n + sb.n - i) >= 0.8
             |)
             |SELECT doc_id, CAST(count(*) AS BIGINT) AS degree
             |FROM (SELECT doc_a AS doc_id FROM pairs
             |      UNION ALL SELECT doc_b FROM pairs)
             |GROUP BY doc_id HAVING count(*) >= 2""".stripMargin)),

    // SimHash hamming pairs: distance values are hash-algorithm-specific
    // → rows-only here; SimHashSpec asserts the planted pairs are found.
    "ext04_simhash" -> Q(
      (s, d) => Dedup.simhashPairs(docs(s, d), "doc_id", "text",
        n = 3, maxHamming = 8)),

    // winnowing (MOSS) fingerprint dedup: fingerprint-overlap ≥ 0.7
    // selects EXACTLY the planted near-dup pairs on this fixture
    // (planted overlap = 1.0, unrelated ≤ 0.43 measured) — so the
    // behavioral oracle is the same all-pairs 3-gram-Jaccard truth.
    "ext12_winnow_dedup" -> Q(
      (s, d) => Dedup.winnowPairs(docs(s, d), "doc_id", "text",
        k = 12, w = 8, overlap = 0.7),
      Some(raw"""WITH sh AS (
             |  SELECT doc_id, list_distinct(list_transform(range(1, len(w) - 1),
             |           i -> w[i] || ' ' || w[i+1] || ' ' || w[i+2])) AS s
             |  FROM (SELECT doc_id, list_filter(regexp_split_to_array(text, '\s+'), t -> t <> '') AS w FROM documents)
             |  WHERE len(w) >= 3
${OracleSql.InvIndex}
             |)
             |-- inverted-index exact form (r8): same rows as the all-pairs
             |-- join at index cost, not n² (see ext03's oracle note)
             |SELECT ix.doc_a, ix.doc_b
             |FROM (SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, count(*) AS i
             |      FROM inv a JOIN inv b ON a.g = b.g AND a.doc_id < b.doc_id
             |      GROUP BY 1, 2) ix
             |JOIN sz sa ON sa.doc_id = ix.doc_a
             |JOIN sz sb ON sb.doc_id = ix.doc_b
             |WHERE i::DOUBLE / (sa.n + sb.n - i) >= 0.8""".stripMargin)),

    // Hard-negative mining: per anchor, the top-3 highest-cosine
    // DIFFERENT-label vectors — the near-but-wrong negatives that move
    // a contrastive loss (ext84's random negatives go easy at scale).
    // Broadcast anchor batch, one corpus scan, WindowGroupLimit top-k,
    // the ext05 tie discipline.
    "ext117_hard_negatives" -> Q(
      (s, d) => {
        val e = emb(s, d)
        Similarity.hardNegatives(e, e.filter(col("vec_id") < 20),
          "vec_id", "embedding", "label", 3)
      },
      Some("""WITH sim AS (
             |  SELECT q.vec_id AS qid, e.vec_id AS nid, e.label AS nlbl,
             |         round(list_cosine_similarity(q.embedding::DOUBLE[], e.embedding::DOUBLE[]), 6) AS cosine
             |  FROM embeddings q JOIN embeddings e
             |    ON q.vec_id < 20 AND e.label <> q.label
             |)
             |SELECT qid, CAST(rnk AS BIGINT) AS rnk, nid, nlbl, cosine FROM (
             |  SELECT qid, nid, nlbl, cosine,
             |         row_number() OVER (PARTITION BY qid ORDER BY cosine DESC, nid) AS rnk
             |  FROM sim) WHERE rnk <= 3""".stripMargin)),

    // TextRank keyword extraction: integer PageRank over the adjacent-
    // bigram co-occurrence graph (directed-count >= 5 noise gate, the
    // surviving bigram stream as the weighted edge multiset), top-50
    // words. The oracle replays tokenize -> gate -> all 10 weighted
    // iterations (grouped (src,dst,n) form — provably equal to the
    // parallel-edge multiset) -> (pr desc, word) top-k.
    "ext119_textrank" -> Q(
      (s, d) => TextAnalysis.textRank(docs(s, d), "doc_id", "text",
        k = 50, minCount = 5, iters = 10),
      Some(textRankOracle(iters = 10, k = 50, minCount = 5))),

    // Top principal direction of the embedding cloud (uncentered PCA)
    // via exact fixed-point power iteration over the integer Gram
    // matrix — the anisotropy/top-component-removal primitive. One
    // linear Gram pass; the d×d iteration is bounded driver work; the
    // oracle replays all 8 integer iterations as unrolled CTEs (the
    // pageRank oracle discipline).
    "ext118_pca_power" -> Q(
      (s, d) => Similarity.pcaTopComponent(emb(s, d), "embedding",
        quant = 64, iters = 8),
      Some(pcaPowerOracle(iters = 8))),

    "ext05_cosine_topk" -> Q(
      (s, d) => {
        val e = emb(s, d)
        Similarity.cosineTopK(e, e.filter(col("vec_id") < 10), "vec_id", "embedding", 5)
      },
      Some("""WITH sim AS (
             |  SELECT q.vec_id AS qid, e.vec_id AS nid,
             |         round(list_cosine_similarity(q.embedding::DOUBLE[], e.embedding::DOUBLE[]), 6) AS cosine
             |  FROM embeddings q JOIN embeddings e ON q.vec_id < 10 AND e.vec_id <> q.vec_id
             |)
             |SELECT qid, CAST(rnk AS BIGINT) AS rnk, nid, cosine FROM (
             |  SELECT qid, nid, cosine,
             |         row_number() OVER (PARTITION BY qid ORDER BY cosine DESC, nid) AS rnk
             |  FROM sim) WHERE rnk <= 5""".stripMargin)),

    // bucketed ANN is approximate by design → rows-only; AnnSpec asserts
    // recall against the exact top-k.
    "ext06_ann_topk" -> Q(
      (s, d) => {
        val e = emb(s, d)
        Similarity.annTopK(e, e.filter(col("vec_id") < 10), "vec_id", "embedding",
          k = 5, nPlanes = 4)
      }),

    // IVF variant of ANN (k-means cells + multi-probe) — approximate by
    // design → rows-only; SimilaritySpec asserts recall vs exact top-k.
    "ext11_ann_ivf" -> Q(
      (s, d) => {
        val e = emb(s, d)
        Similarity.ivfTopK(e, e.filter(col("vec_id") < 10), "vec_id", "embedding",
          k = 5, nLists = 16, nProbe = 4)
      }),

    "ext07_text_stats" -> Q(
      (s, d) => TextAnalysis.stats(docs(s, d), "doc_id", "text"),
      Some("""SELECT doc_id,
             |       len(regexp_split_to_array(trim(text), '\s+')) AS n_tokens,
             |       CAST(length(text) AS INT) AS n_chars_measured,
             |       len(regexp_extract_all(text, '[a-z]+|[0-9]+|[^a-z0-9\s]')) AS n_subword_tokens,
             |       round(list_sum(list_transform(regexp_split_to_array(trim(text), '\s+'), t -> length(t)))::DOUBLE
             |             / len(regexp_split_to_array(trim(text), '\s+')), 6) AS avg_token_len,
             |       round(len(list_filter(regexp_split_to_array(trim(text), '\s+'),
             |               t -> list_contains(['a','and','das','der','die','el','es','est','et','is','ist','la','las','le','les','los','of','the','und','y'], t)))::DOUBLE
             |             / len(regexp_split_to_array(trim(text), '\s+')), 6) AS stopword_ratio,
             |       round(least(len(regexp_split_to_array(trim(text), '\s+'))::DOUBLE / 64, 1.0) *
             |             (1.0 - round(len(list_filter(regexp_split_to_array(trim(text), '\s+'),
             |               t -> list_contains(['a','and','das','der','die','el','es','est','et','is','ist','la','las','le','les','los','of','the','und','y'], t)))::DOUBLE
             |             / len(regexp_split_to_array(trim(text), '\s+')), 6)), 6) AS quality_score
             |FROM documents""".stripMargin)),

    "ext08_lang_id" -> Q(
      (s, d) => TextAnalysis.langId(docs(s, d), "doc_id", "text"),
      Some("""WITH scored AS (
             |  SELECT doc_id, lang AS lang_actual,
             |         len(list_filter(w, t -> list_contains(['der','die','das','und','ist'], t))) AS s_de,
             |         len(list_filter(w, t -> list_contains(['the','a','and','of','is'], t))) AS s_en,
             |         len(list_filter(w, t -> list_contains(['el','los','las','es','y'], t))) AS s_es,
             |         len(list_filter(w, t -> list_contains(['le','la','les','et','est'], t))) AS s_fr
             |  FROM (SELECT doc_id, lang, regexp_split_to_array(trim(text), '\s+') AS w FROM documents)
             |)
             |SELECT doc_id, lang_actual,
             |       CASE WHEN greatest(s_de, s_en, s_es, s_fr) = 0 THEN 'und'
             |            WHEN s_de >= s_en AND s_de >= s_es AND s_de >= s_fr THEN 'de'
             |            WHEN s_en >= s_es AND s_en >= s_fr THEN 'en'
             |            WHEN s_es >= s_fr THEN 'es'
             |            ELSE 'fr' END AS pred_lang,
             |       (CASE WHEN greatest(s_de, s_en, s_es, s_fr) = 0 THEN 'und'
             |            WHEN s_de >= s_en AND s_de >= s_es AND s_de >= s_fr THEN 'de'
             |            WHEN s_en >= s_es AND s_en >= s_fr THEN 'en'
             |            WHEN s_es >= s_fr THEN 'es'
             |            ELSE 'fr' END = lang_actual) AS is_match
             |FROM scored""".stripMargin)),

    // embedding-cosine near-dup, EXACT via the blocked triangle grid:
    // every pair meets in exactly one equality-keyed cell (no corpus
    // broadcast, no nested loop, no dedup shuffle), so the output equals
    // the all-pairs DuckDB oracle by construction. Threshold 0.45 sits at
    // θ ≈ 63°, where hyperplane-LSH candidates exceed brute force (the
    // 12×1-band attempt benched 42× SLOWER than exact at sf0.1) — the LSH
    // path (Similarity.cosinePairsLsh) is for real near-dup thresholds
    // ≥ ~0.8, spec-proven == exact on a planted 0.9 fixture.
    "ext10_embed_dedup" -> Q(
      (s, d) => Similarity.cosinePairsBlocked(emb(s, d), "vec_id", "embedding", 0.45),
      Some("""SELECT a.vec_id AS vec_a, b.vec_id AS vec_b,
             |       round(list_cosine_similarity(a.embedding::DOUBLE[], b.embedding::DOUBLE[]), 6) AS cosine
             |FROM embeddings a JOIN embeddings b ON a.vec_id < b.vec_id
             |WHERE list_cosine_similarity(a.embedding::DOUBLE[], b.embedding::DOUBLE[]) >= 0.45""".stripMargin)),

    // pretraining chunking: 64-token windows every 32 tokens (50%
    // overlap), trailing partials kept; chunk_idx = start/stride in both
    // engines, so the oracle hash-matches text and counts exactly.
    "ext17_chunking" -> Q(
      (s, d) => TextAnalysis.chunkTokens(docs(s, d), "doc_id", "text",
        chunkTokens = 64, stride = 32),
      Some("""WITH t AS (
             |  SELECT doc_id,
             |         list_filter(regexp_split_to_array(trim(text), '\s+'), x -> x <> '') AS toks
             |  FROM documents
             |), st AS (
             |  SELECT doc_id, toks, unnest(range(0, len(toks), 32)) AS s
             |  FROM t WHERE len(toks) > 0
             |)
             |SELECT doc_id,
             |       CAST(s // 32 AS INT) AS chunk_idx,
             |       CAST(len(list_slice(toks, s + 1, s + 64)) AS INT) AS n_chunk_tokens,
             |       array_to_string(list_slice(toks, s + 1, s + 64), ' ') AS chunk_text
             |FROM st""".stripMargin)),

    // Gopher/C4-style quality rules: repetition + structure signals and
    // a keep/drop verdict, all in exact-micro integer space so the
    // verdict itself is oracle-checkable (raw-double threshold compares
    // would be boundary-fragile cross-engine).
    "ext18_quality_rules" -> Q(
      (s, d) => TextAnalysis.qualityRules(docs(s, d), "doc_id", "text"),
      Some("""WITH w AS (
             |  SELECT doc_id, list_filter(regexp_split_to_array(trim(text), '\s+'), t -> t <> '') AS ws
             |  FROM documents
             |), m AS (
             |  SELECT doc_id, len(ws) AS n, len(list_distinct(ws)) AS nd,
             |         CASE WHEN len(ws) >= 2 THEN len(ws) - 1 ELSE 0 END AS nb,
             |         CASE WHEN len(ws) >= 2
             |              THEN len(list_distinct(list_transform(range(1, len(ws)), i -> ws[i] || ' ' || ws[i+1])))
             |              ELSE 0 END AS ndb,
             |         list_sum(list_transform(ws, t -> len(t))) AS sl
             |  FROM w
             |), e AS (
             |  SELECT doc_id, n AS n_words,
             |         CASE WHEN n > 0 THEN CAST(floor((n - nd)::DOUBLE / n * 1000000 + 0.5) AS BIGINT) ELSE 0 END AS dup_word_frac_e6,
             |         CASE WHEN nb > 0 THEN CAST(floor((nb - ndb)::DOUBLE / nb * 1000000 + 0.5) AS BIGINT) ELSE 0 END AS dup_bigram_frac_e6,
             |         CASE WHEN n > 0 THEN CAST(floor(sl::DOUBLE / n * 1000000 + 0.5) AS BIGINT) ELSE 0 END AS mean_word_len_e6
             |  FROM m
             |)
             |SELECT doc_id, n_words, dup_word_frac_e6, dup_bigram_frac_e6, mean_word_len_e6,
             |       (n_words BETWEEN 30 AND 100000
             |        AND dup_word_frac_e6 <= 500000
             |        AND dup_bigram_frac_e6 <= 100000
             |        AND mean_word_len_e6 BETWEEN 3000000 AND 10000000) AS keep
             |FROM e""".stripMargin)),

    // per-doc distinctive top-3 terms: tf-idf-shaped keyword extraction
    // with a fully integer (tf DESC, df ASC, token) ranking — no float
    // or ln() in the order, so the cut is total and cross-engine exact.
    "ext19_top_terms" -> Q(
      (s, d) => TextAnalysis.topTerms(docs(s, d), "doc_id", "text", 3),
      Some("""WITH tf AS (
             |  SELECT doc_id, w AS token, count(*) AS tf
             |  FROM (SELECT doc_id, unnest(list_filter(regexp_split_to_array(trim(text), '\s+'), t -> t <> '')) AS w
             |        FROM documents)
             |  GROUP BY doc_id, w
             |), d AS (
             |  SELECT token, count(*) AS df FROM tf GROUP BY token
             |), r AS (
             |  SELECT tf.doc_id, tf.token, tf.tf, d.df,
             |         row_number() OVER (PARTITION BY tf.doc_id
             |                            ORDER BY tf.tf DESC, d.df ASC, tf.token) AS rnk
             |  FROM tf JOIN d USING (token)
             |)
             |SELECT doc_id, token, tf, df, rnk FROM r WHERE rnk <= 3""".stripMargin)),

    // EXACT n-gram-Jaccard near-dup pairs via prefix filtering
    // (AllPairs/PPJoin) — same truth as ext03's sketch, zero miss
    // probability by construction; the oracle is the all-pairs answer.
    "ext20_jaccard_join" -> Q(
      (s, d) => Dedup.jaccardPairs(docs(s, d), "doc_id", "text",
        n = 3, threshold = 0.8),
      Some(raw"""WITH sh AS (
             |  SELECT doc_id, list_distinct(list_transform(range(1, len(w) - 1),
             |           i -> w[i] || ' ' || w[i+1] || ' ' || w[i+2])) AS s
             |  FROM (SELECT doc_id, list_filter(regexp_split_to_array(text, '\s+'), t -> t <> '') AS w FROM documents)
             |  WHERE len(w) >= 3
${OracleSql.InvIndex}
             |), pairs AS (
             |  -- inverted-index exact form (r8): any pair with jaccard > 0
             |  -- shares a shingle, so the shingle-keyed equi-join enumerates
             |  -- every such pair with its exact intersection count; rows with
             |  -- i = 0 are absent but can never pass a positive threshold.
             |  -- Same rows as the all-pairs join at index cost, not n².
             |  SELECT ix.doc_a, ix.doc_b, ix.i, sa.n AS la, sb.n AS lb
             |  FROM (SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, count(*) AS i
             |        FROM inv a JOIN inv b ON a.g = b.g AND a.doc_id < b.doc_id
             |        GROUP BY 1, 2) ix
             |  JOIN sz sa ON sa.doc_id = ix.doc_a
             |  JOIN sz sb ON sb.doc_id = ix.doc_b
             |)
             |SELECT doc_a, doc_b, round(i::DOUBLE / (la + lb - i), 6) AS jaccard
             |FROM pairs WHERE i::DOUBLE / (la + lb - i) >= 0.8""".stripMargin)),

    // deterministic hash split: md5(id:salt)-bucketed train/val/test
    // assignment — reproducible on any engine/cluster (the oracle
    // recomputes membership from scratch), stable under corpus growth,
    // unlike seed-dependent TABLESAMPLE (q33, rows-only).
    "ext21_hash_split" -> Q(
      (s, d) => Sampling.split(docs(s, d), "doc_id", "r5", 8000, 1000)
        .select(col("doc_id"), col("source"), col("bucket"), col("split")),
      Some("""WITH b AS (
             |  SELECT doc_id, source,
             |         ('0x' || substr(md5(doc_id::VARCHAR || ':r5'), 1, 8))::BIGINT % 10000 AS bucket
             |  FROM documents)
             |SELECT doc_id, source, bucket,
             |       CASE WHEN bucket < 8000 THEN 'train'
             |            WHEN bucket < 9000 THEN 'val'
             |            ELSE 'test' END AS split
             |FROM b""".stripMargin)),

    // stratified mixing: per-source keep rates (1/10000ths) off the same
    // deterministic bucket — the no-shuffle way to hit a target source
    // mix; sources outside the map fall to the default rate.
    "ext22_stratified_sample" -> Q(
      (s, d) => Sampling.stratifiedSample(docs(s, d), "doc_id", "source",
          Map("src0" -> 10000, "src1" -> 5000, "src2" -> 2500), 1000, "mix1")
        .select(col("doc_id"), col("source"), col("bucket")),
      Some("""WITH b AS (
             |  SELECT doc_id, source,
             |         ('0x' || substr(md5(doc_id::VARCHAR || ':mix1'), 1, 8))::BIGINT % 10000 AS bucket
             |  FROM documents)
             |SELECT doc_id, source, bucket FROM b
             |WHERE bucket < CASE source WHEN 'src0' THEN 10000
             |                           WHEN 'src1' THEN 5000
             |                           WHEN 'src2' THEN 2500
             |                           ELSE 1000 END""".stripMargin)),

    // flagship composition: the full curation pipeline in ONE Catalyst
    // plan — quality filter → exact-dedup keepers → deterministic hash
    // split → per-(source, split) stats. Each stage is an already-oracled
    // operator; this proves they CHAIN (one narrow quality projection,
    // one dedup aggregation, broadcastable keeper join, shuffle-free
    // split, final partial-aggregated rollup — no barrier materializes
    // between stages).
    "ext23_curation_pipeline" -> Q(
      (s, d) => {
        val base = docs(s, d)
        val quality = TextAnalysis.qualityRules(base, "doc_id", "text")
          .filter(col("keep"))
        val keepers = Dedup.exact(base, "doc_id", "text")
          .select(col("keeper_id").as("doc_id"))
        val split = Sampling.split(base, "doc_id", "r5", 8000, 1000)
          .select(col("doc_id"), col("source"), col("split"))
        quality.join(keepers, "doc_id").join(split, "doc_id")
          .groupBy(col("source"), col("split"))
          .agg(count(lit(1)).as("n_docs"), sum(col("n_words")).as("sum_words"))
      },
      Some("""WITH w AS (
             |  SELECT doc_id, source, list_filter(regexp_split_to_array(trim(text), '\s+'), t -> t <> '') AS ws
             |  FROM documents
             |), m AS (
             |  SELECT doc_id, source, len(ws) AS n, len(list_distinct(ws)) AS nd,
             |         CASE WHEN len(ws) >= 2 THEN len(ws) - 1 ELSE 0 END AS nb,
             |         CASE WHEN len(ws) >= 2
             |              THEN len(list_distinct(list_transform(range(1, len(ws)), i -> ws[i] || ' ' || ws[i+1])))
             |              ELSE 0 END AS ndb,
             |         list_sum(list_transform(ws, t -> len(t))) AS sl
             |  FROM w
             |), q AS (
             |  SELECT doc_id, source, n AS n_words
             |  FROM m
             |  WHERE n BETWEEN 30 AND 100000
             |    AND (CASE WHEN n > 0 THEN CAST(floor((n - nd)::DOUBLE / n * 1000000 + 0.5) AS BIGINT) ELSE 0 END) <= 500000
             |    AND (CASE WHEN nb > 0 THEN CAST(floor((nb - ndb)::DOUBLE / nb * 1000000 + 0.5) AS BIGINT) ELSE 0 END) <= 100000
             |    AND (CASE WHEN n > 0 THEN CAST(floor(sl::DOUBLE / n * 1000000 + 0.5) AS BIGINT) ELSE 0 END) BETWEEN 3000000 AND 10000000
             |), k AS (
             |  SELECT min(doc_id) AS doc_id FROM documents GROUP BY md5(text)
             |), b AS (
             |  SELECT doc_id,
             |         CASE WHEN bkt < 8000 THEN 'train' WHEN bkt < 9000 THEN 'val' ELSE 'test' END AS split
             |  FROM (SELECT doc_id,
             |               ('0x' || substr(md5(doc_id::VARCHAR || ':r5'), 1, 8))::BIGINT % 10000 AS bkt
             |        FROM documents)
             |)
             |SELECT q.source, b.split, count(*) AS n_docs, CAST(sum(q.n_words) AS BIGINT) AS sum_words
             |FROM q JOIN k USING (doc_id) JOIN b USING (doc_id)
             |GROUP BY q.source, b.split""".stripMargin)),

    // line-level cross-corpus dedup (C4/CCNet): the fixture text has no
    // newlines, so documents are first segmented into 12-token
    // "paragraphs" (deterministic, identical arithmetic in both engines);
    // each distinct segment survives only at its corpus-wide first
    // occurrence (min (doc_id, pos)) and documents are reassembled from
    // their surviving segments.
    "ext25_line_dedup" -> Q(
      (s, d) => {
        val toks = filter(split(trim(col("text")), "\\s+"), t => t =!= "")
        val lines = transform(
          sequence(lit(0), ((size(toks) + lit(11)) / lit(12)).cast("int") - 1),
          g => array_join(slice(toks, g * 12 + 1, lit(12)), " "))
        Dedup.dedupLines(
          docs(s, d).filter(size(toks) > 0).withColumn("__lines", lines),
          "doc_id", col("__lines"), joinWith = " ")
      },
      Some("""WITH t AS (
             |  SELECT doc_id,
             |         list_filter(regexp_split_to_array(trim(text), '\s+'), x -> x <> '') AS toks
             |  FROM documents
             |), seg AS (
             |  SELECT t.doc_id, u.g,
             |         array_to_string(t.toks[u.g*12+1 : u.g*12+12], ' ') AS line
             |  FROM t JOIN (SELECT unnest(range(0, (SELECT max((len(toks) + 11) // 12) FROM t))) AS g) u
             |    ON u.g < (len(t.toks) + 11) // 12
             |), ranked AS (
             |  SELECT doc_id, g, line,
             |         row_number() OVER (PARTITION BY line ORDER BY doc_id, g) AS rk
             |  FROM seg
             |)
             |SELECT doc_id, count(*) AS n_lines_kept,
             |       string_agg(line, ' ' ORDER BY g) AS text
             |FROM ranked WHERE rk = 1 GROUP BY doc_id""".stripMargin)),

    // pretraining sequence packing: documents packed back-to-back into
    // 512-token sequences inside 16 independent hash buckets (parallel
    // packing domains); integer running-total arithmetic in both engines.
    "ext24_sequence_packing" -> Q(
      (s, d) => TextAnalysis.packSequences(docs(s, d), "doc_id", "text",
        seqTokens = 512, buckets = 16),
      Some("""WITH t AS (
             |  SELECT doc_id,
             |         len(list_filter(regexp_split_to_array(trim(text), '\s+'), x -> x <> '')) AS n_tokens
             |  FROM documents
             |), b AS (
             |  SELECT doc_id, n_tokens, doc_id % 16 AS bucket FROM t WHERE n_tokens > 0
             |), c AS (
             |  SELECT doc_id, n_tokens, bucket,
             |         sum(n_tokens) OVER (PARTITION BY bucket ORDER BY doc_id
             |                             ROWS UNBOUNDED PRECEDING) AS cum
             |  FROM b
             |)
             |SELECT doc_id, n_tokens, bucket,
             |       CAST((cum - n_tokens) // 512 AS BIGINT) AS seq_id,
             |       CAST((cum - n_tokens) % 512 AS BIGINT) AS seq_offset
             |FROM c""".stripMargin)),

    // corpus-frequency quality score: rare-token documents score low —
    // the model-free perplexity-filter analog. Integer counts end-to-end;
    // the mean is one IEEE division rounded to 6 dp in both engines.
    "ext26_freq_score" -> Q(
      (s, d) => TextAnalysis.freqScore(docs(s, d), "doc_id", "text"),
      Some("""WITH toks AS (
             |  SELECT doc_id,
             |         unnest(list_filter(regexp_split_to_array(trim(text), '\s+'), t -> t <> '')) AS token
             |  FROM documents
             |), counts AS (
             |  SELECT token, count(*) AS corpus_freq FROM toks GROUP BY 1
             |)
             |SELECT doc_id, count(*) AS n_tokens,
             |       CAST(sum(corpus_freq) AS BIGINT) AS sum_freq,
             |       min(corpus_freq) AS min_freq,
             |       round(CAST(sum(corpus_freq) AS DOUBLE) / count(*), 6) AS mean_freq
             |FROM toks JOIN counts USING (token)
             |GROUP BY doc_id""".stripMargin)),

    // near-dup transitive closure: minhash pairs (== all-pairs truth on
    // this fixture, see ext03) → connected components → one cluster id +
    // keeper verdict per document. The oracle recomputes components via
    // a recursive reachability CTE over the same exact pair graph.
    // Edges come from the CAPPED machinery: sub-cap verified pairs plus
    // one (rep, member) star edge per capped-family member, so a viral
    // family enters the component graph linearly — for identical-content
    // families (which share every band) the components, and therefore
    // every output column, equal the uncapped truth exactly (DedupSpec
    // pins it); no natural bucket here exceeds the cap.
    // LEAKAGE-FREE train/val/test split: the naive md5(doc_id) split
    // (ext21's shape) puts near-copies of one document on BOTH sides of
    // the train/test boundary — the canonical eval-contamination bug.
    // Here the split key is the near-dup CLUSTER id (capped LSH pairs +
    // star edges → components, ext27's discipline), so every member of
    // a cluster lands in the SAME split by construction. The oracle
    // recomputes components recursively and replays the identical
    // md5(cluster_id:salt) bucketing.
    "ext100_cluster_split" -> Q(
      (s, d) => {
        val dd = docs(s, d)
        val (pairs, families) = Dedup.minhashLshCapped(dd, "doc_id",
          "text", n = 3, k = 128, bands = 32, threshold = 0.8, maxBucket = 64)
        val cl = Dedup.clusters(dd, "doc_id", Dedup.cappedEdges(pairs, families))
        Sampling.split(cl, "cluster_id", "r9", 8000, 1000)
          .select(col("doc_id"), col("cluster_id"), col("bucket"), col("split"))
      },
      Some(raw"""WITH RECURSIVE sh AS MATERIALIZED (
             |  SELECT doc_id, list_distinct(list_transform(range(1, len(w) - 1),
             |           i -> w[i] || ' ' || w[i+1] || ' ' || w[i+2])) AS s
             |  FROM (SELECT doc_id, list_filter(regexp_split_to_array(text, '\s+'), t -> t <> '') AS w FROM documents)
             |  WHERE len(w) >= 3
${OracleSql.InvIndex}
${OracleSql.Components}
             |), lab AS (
             |  SELECT d.doc_id, coalesce(c.cluster_id, d.doc_id) AS cluster_id
             |  FROM documents d LEFT JOIN comp c ON d.doc_id = c.doc_id
             |), b AS (
             |  SELECT doc_id, cluster_id,
             |         CAST(('0x' || substr(md5(cluster_id::VARCHAR || ':r9'), 1, 8))::BIGINT % 10000 AS BIGINT) AS bucket
             |  FROM lab
             |)
             |SELECT doc_id, cluster_id, bucket,
             |       CASE WHEN bucket < 8000 THEN 'train'
             |            WHEN bucket < 9000 THEN 'val'
             |            ELSE 'test' END AS split
             |FROM b""".stripMargin)),

    "ext27_dedup_clusters" -> Q(
      (s, d) => {
        val (pairs, families) = Dedup.minhashLshCapped(docs(s, d), "doc_id",
          "text", n = 3, k = 128, bands = 32, threshold = 0.8, maxBucket = 64)
        Dedup.clusters(docs(s, d), "doc_id", Dedup.cappedEdges(pairs, families))
      },
      Some(raw"""WITH RECURSIVE sh AS MATERIALIZED (
             |  SELECT doc_id, list_distinct(list_transform(range(1, len(w) - 1),
             |           i -> w[i] || ' ' || w[i+1] || ' ' || w[i+2])) AS s
             |  FROM (SELECT doc_id, list_filter(regexp_split_to_array(text, '\s+'), t -> t <> '') AS w FROM documents)
             |  WHERE len(w) >= 3
${OracleSql.InvIndex}
${OracleSql.Components}
             |), sizes AS (
             |  SELECT cluster_id, count(*) AS cluster_size FROM comp GROUP BY 1
             |)
             |SELECT d.doc_id,
             |       coalesce(c.cluster_id, d.doc_id) AS cluster_id,
             |       CAST(coalesce(s.cluster_size, 1) AS BIGINT) AS cluster_size,
             |       d.doc_id = coalesce(c.cluster_id, d.doc_id) AS is_keeper
             |FROM documents d
             |LEFT JOIN comp c ON d.doc_id = c.doc_id
             |LEFT JOIN sizes s ON coalesce(c.cluster_id, d.doc_id) = s.cluster_id""".stripMargin)),

    // Incremental components: yesterday's labels (docs with even ids)
    // re-enter as star edges; today's batch (odd ids) contributes only
    // the pairs that TOUCH an arrival — provably the same partition and
    // min-id labels as the full recompute, which is what the full-truth
    // oracle checks.
    "ext127_incremental_clusters" -> Q(
      (s, d) => {
        val all = docs(s, d)
        val old = all.filter(col("doc_id") % 2 === 0)
        // r14 optimization pass (guide §1.2 — don't compute things
        // twice): the r13 form ran the full LSH derivation TWICE (once
        // over the even-id corpus, once over everything). One pass
        // suffices, provably: signatures are per-doc projections
        // (corpus-independent), and band buckets emit ALL pairs within
        // the bucket, so the even-only run's pair set is EXACTLY the
        // full run's pairs restricted to even endpoints — filter
        // commutes with the bucket self-join. Pair-sized persist,
        // consumed by both (eager) component runs, released below.
        val lshAll = Dedup.minhashLsh(all, "doc_id", "text", n = 3,
            k = 128, bands = 32, threshold = 0.8)
          .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
        val oldLabels = Dedup.clusters(old, "doc_id",
          lshAll.filter(col("doc_a") % 2 === 0 && col("doc_b") % 2 === 0))
        val newTouching = lshAll
          .filter(col("doc_a") % 2 === 1 || col("doc_b") % 2 === 1)
        val out = Dedup.clustersIncremental(all, "doc_id", oldLabels, newTouching)
        // both component runs are eager, so the pair frame is fully
        // consumed by the time clustersIncremental returns
        lshAll.unpersist(blocking = false)
        out
      },
      Some(raw"""WITH RECURSIVE sh AS MATERIALIZED (
             |  SELECT doc_id, list_distinct(list_transform(range(1, len(w) - 1),
             |           i -> w[i] || ' ' || w[i+1] || ' ' || w[i+2])) AS s
             |  FROM (SELECT doc_id, list_filter(regexp_split_to_array(text, '\s+'), t -> t <> '') AS w FROM documents)
             |  WHERE len(w) >= 3
${OracleSql.InvIndex}
${OracleSql.Components}
             |), sizes AS (
             |  SELECT cluster_id, count(*) AS cluster_size FROM comp GROUP BY 1
             |)
             |SELECT d.doc_id,
             |       coalesce(c.cluster_id, d.doc_id) AS cluster_id,
             |       CAST(coalesce(s.cluster_size, 1) AS BIGINT) AS cluster_size,
             |       d.doc_id = coalesce(c.cluster_id, d.doc_id) AS is_keeper
             |FROM documents d
             |LEFT JOIN comp c ON d.doc_id = c.doc_id
             |LEFT JOIN sizes s ON coalesce(c.cluster_id, d.doc_id) = s.cluster_id""".stripMargin)),

    // Consensus templates of near-dup families: the tokens present in
    // EVERY member of each ext27 cluster — WHAT the family repeats (the
    // blocklist/strip-rule input). Membership counting, not per-family
    // set folds; the oracle re-derives the components truth and counts
    // per (family, token).
    "ext123_family_templates" -> Q(
      (s, d) => {
        val (pairs, families) = Dedup.minhashLshCapped(docs(s, d), "doc_id",
          "text", n = 3, k = 128, bands = 32, threshold = 0.8, maxBucket = 64)
        Dedup.familyTemplates(docs(s, d), "doc_id", "text",
          Dedup.clusters(docs(s, d), "doc_id",
            Dedup.cappedEdges(pairs, families)))
      },
      Some(raw"""WITH RECURSIVE sh AS MATERIALIZED (
             |  SELECT doc_id, list_distinct(list_transform(range(1, len(w) - 1),
             |           i -> w[i] || ' ' || w[i+1] || ' ' || w[i+2])) AS s
             |  FROM (SELECT doc_id, list_filter(regexp_split_to_array(text, '\s+'), t -> t <> '') AS w FROM documents)
             |  WHERE len(w) >= 3
${OracleSql.InvIndex}
${OracleSql.Components}
             |), sizes AS (
             |  SELECT cluster_id, count(*) AS cluster_size FROM comp GROUP BY 1
             |), tk AS (
             |  SELECT c.doc_id, c.cluster_id,
             |         unnest(list_distinct(list_filter(regexp_split_to_array(trim(d.text), '\s+'), x -> x <> ''))) AS token
             |  FROM comp c JOIN documents d USING (doc_id)
             |)
             |SELECT t.cluster_id, t.token, CAST(s.cluster_size AS BIGINT) AS n_members
             |FROM tk t JOIN sizes s USING (cluster_id)
             |GROUP BY t.cluster_id, t.token, s.cluster_size
             |HAVING count(*) = s.cluster_size""".stripMargin)),

    // top-50 adjacent-bigram collocations by PMI-shaped lift ratio —
    // rank by the ratio (monotone in PMI) instead of ln(ratio) so both
    // engines run the same four IEEE double ops; cut ties by (w1, w2).
    "ext28_collocations" -> Q(
      (s, d) => TextAnalysis.collocations(docs(s, d), "doc_id", "text",
        k = 50, minCount = 5),
      Some("""WITH t AS (
             |  SELECT list_filter(regexp_split_to_array(trim(text), '\s+'), x -> x <> '') AS w
             |  FROM documents
             |), bi AS (
             |  SELECT unnest(w[1:len(w)-1]) AS w1, unnest(w[2:len(w)]) AS w2
             |  FROM t WHERE len(w) >= 2
             |), bc AS (
             |  SELECT w1, w2, count(*) AS n_pair FROM bi GROUP BY 1, 2
             |  HAVING count(*) >= 5
             |), u AS (
             |  SELECT unnest(w) AS token FROM t
             |), uc AS (
             |  SELECT token, count(*) AS c FROM u GROUP BY 1
             |), tot AS (
             |  SELECT count(*) AS n FROM u
             |)
             |SELECT w1, w2, CAST(n_pair AS BIGINT) AS n_pair,
             |       round(n_pair::DOUBLE * (SELECT n FROM tot)::DOUBLE /
             |             (a.c::DOUBLE * b.c::DOUBLE), 6) AS lift
             |FROM bc JOIN uc a ON bc.w1 = a.token JOIN uc b ON bc.w2 = b.token
             |ORDER BY lift DESC, w1, w2 LIMIT 50""".stripMargin)),

    // PII scrubbing. The fixture corpus contains no PII, so three planted
    // rows are unioned into BOTH dialects — the oracle exercises every
    // mask pattern for real, and the 500 fixture rows pin the no-op path
    // (any regex-dialect divergence on real text would break the hash).
    "ext29_pii_redact" -> Q(
      (s, d) => {
        import s.implicits._
        val planted = Seq(
          (-1L, "contact john.doe@example.com or jane@sub.example.org today"),
          (-2L, "server at 192.168.0.1 and 10.0.0.255 responded fine"),
          (-3L, "call 555-123-4567 or 555.987.6543 ref 1234567890")
        ).toDF("doc_id", "text")
        TextAnalysis.redactPii(
          docs(s, d).select(col("doc_id"), col("text")).unionByName(planted),
          "doc_id", "text")
      },
      Some("""WITH corpus AS (
             |  SELECT doc_id, text FROM documents
             |  UNION ALL
             |  SELECT * FROM (VALUES
             |    (CAST(-1 AS BIGINT), 'contact john.doe@example.com or jane@sub.example.org today'),
             |    (CAST(-2 AS BIGINT), 'server at 192.168.0.1 and 10.0.0.255 responded fine'),
             |    (CAST(-3 AS BIGINT), 'call 555-123-4567 or 555.987.6543 ref 1234567890')
             |  ) v(doc_id, text)
             |)
             |SELECT doc_id,
             |  regexp_replace(regexp_replace(regexp_replace(regexp_replace(text,
             |    '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}', '<EMAIL>', 'g'),
             |    '\b(\d{1,3}\.){3}\d{1,3}\b', '<IP>', 'g'),
             |    '\b\d{3}[-.]\d{3}[-.]\d{4}\b', '<PHONE>', 'g'),
             |    '\b\d{9,}\b', '<NUM>', 'g') AS text_redacted,
             |  CAST(len(regexp_extract_all(text, '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}')) AS BIGINT) AS n_email,
             |  CAST(len(regexp_extract_all(text, '\b(\d{1,3}\.){3}\d{1,3}\b')) AS BIGINT) AS n_ip,
             |  CAST(len(regexp_extract_all(text, '\b\d{3}[-.]\d{3}[-.]\d{4}\b')) AS BIGINT) AS n_phone,
             |  CAST(len(regexp_extract_all(text, '\b\d{9,}\b')) AS BIGINT) AS n_longnum
             |FROM corpus""".stripMargin)),

    // exact top-100 vocabulary (heavy hitters + document frequency) —
    // the vocab-building pass; ties at the cut are broken by token in
    // BOTH engines so the boundary is total and reproducible.
    "ext15_vocab_topk" -> Q(
      (s, d) => TextAnalysis.vocabTopK(docs(s, d), "doc_id", "text", 100),
      Some("""SELECT w AS token, count(*) AS n_occurrences,
             |       count(DISTINCT doc_id) AS n_docs
             |FROM (SELECT doc_id, unnest(list_filter(regexp_split_to_array(trim(text), '\s+'), t -> t <> '')) AS w
             |      FROM documents)
             |GROUP BY w ORDER BY n_occurrences DESC, token LIMIT 100""".stripMargin)),

    // tokenizer-vocab coverage: per-doc OOV rate against the corpus' own
    // top-100 vocabulary — integer counts + one micro-int ratio; the
    // vocab cut reuses ext15's total (count desc, token) tie order.
    "ext35_vocab_coverage" -> Q(
      (s, d) => TextAnalysis.vocabCoverage(docs(s, d), "doc_id", "text", 100),
      Some("""WITH toks AS (
             |  SELECT doc_id, unnest(list_filter(regexp_split_to_array(trim(text), '\s+'), t -> t <> '')) AS token
             |  FROM documents
             |), v AS (
             |  SELECT token FROM (
             |    SELECT token, count(*) AS c FROM toks GROUP BY 1
             |    ORDER BY c DESC, token LIMIT 100)
             |)
             |SELECT t.doc_id, count(*) AS n_tokens,
             |       CAST(sum(CASE WHEN v.token IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_oov,
             |       CAST(floor(sum(CASE WHEN v.token IS NULL THEN 1 ELSE 0 END)::DOUBLE
             |                  / count(*) * 1000000 + 0.5) AS BIGINT) AS oov_e6
             |FROM toks t LEFT JOIN v ON t.token = v.token
             |GROUP BY t.doc_id""".stripMargin)),

    // near-dup benchmark decontamination: train = doc_id % 10 <> 0,
    // benchmark = doc_id % 10 = 0; flag train docs with >= 0.8 3-gram
    // Jaccard against any benchmark doc. Candidates come banded from the
    // CAPPED minhash machinery (never all-pairs, and a viral boilerplate
    // family spanning both sides can never emit |family|² pairs): train
    // docs sharing an over-cap bucket with benchmark text surface as
    // escalation rows with NULL jaccard (family-flagged, per-pair verify
    // deliberately skipped). No natural bucket on this fixture exceeds
    // the cap, so any such row IS the loud fixture-drift signal and the
    // oracle is the plain cross-side all-pairs truth.
    "ext16_contamination" -> Q(
      (s, d) => {
        val all = docs(s, d)
        val (pairs, report) = Dedup.contaminatedNearCapped(
          all.filter(col("doc_id") % 10 =!= 0),
          all.filter(col("doc_id") % 10 === 0),
          "doc_id", "text", n = 3, k = 128, bands = 32, threshold = 0.8,
          maxBucket = 64)
        pairs.unionByName(report
          .filter(col("side") === "t" && col("bench_hit_id").isNotNull)
          .select(col("doc_id"), col("bench_hit_id").as("matched_bench_id"),
            lit(null).cast("double").as("jaccard")))
      },
      Some(raw"""WITH sh AS (
             |  SELECT doc_id, list_distinct(list_transform(range(1, len(w) - 1),
             |           i -> w[i] || ' ' || w[i+1] || ' ' || w[i+2])) AS s
             |  FROM (SELECT doc_id, list_filter(regexp_split_to_array(text, '\s+'), t -> t <> '') AS w FROM documents)
             |  WHERE len(w) >= 3
${OracleSql.InvIndex}
             |)
             |-- inverted-index exact form (r8): cross-side jaccard > 0 needs a
             |-- shared shingle; same rows as all-pairs at index cost, not n²
             |SELECT ix.doc_id, ix.matched_bench_id,
             |       round(i::DOUBLE / (st.n + sb.n - i), 6) AS jaccard
             |FROM (SELECT t.doc_id, b.doc_id AS matched_bench_id, count(*) AS i
             |      FROM inv t JOIN inv b
             |        ON t.g = b.g AND t.doc_id % 10 <> 0 AND b.doc_id % 10 = 0
             |      GROUP BY 1, 2) ix
             |JOIN sz st ON st.doc_id = ix.doc_id
             |JOIN sz sb ON sb.doc_id = ix.matched_bench_id
             |WHERE i::DOUBLE / (st.n + sb.n - i) >= 0.8""".stripMargin)),

    // symmetric per-vector int8 quantization (float32 -> int8 = 4x
    // storage cut): scale = max|x|, q_i = floor(x_i/scale*127 + 0.5) —
    // exact-IEEE in both engines, so the oracle hash-matches including
    // the int arrays.
    "ext14_embed_quantize" -> Q(
      // The gate emits q as a comma-joined STRING, not array<int>: the
      // driver's hasher (pandas sort_values) cannot canonicalize array
      // cells ("unhashable type: numpy.ndarray" — r4), so an array column
      // silently voids the oracle. The operator itself keeps the typed
      // array output; only this verification projection flattens it.
      (s, d) => Similarity.quantizeInt8(emb(s, d), "vec_id", "embedding")
        .select(col("vec_id"), col("scale_e6"),
          array_join(transform(col("q"), _.cast("string")), ",").as("q_csv")),
      Some("""WITH p AS (
             |  SELECT vec_id, embedding::DOUBLE[] AS e,
             |         list_max(list_transform(embedding::DOUBLE[], x -> abs(x))) AS s
             |  FROM embeddings)
             |SELECT vec_id,
             |       CAST(floor(s * 1000000 + 0.5) AS BIGINT) AS scale_e6,
             |       array_to_string(CASE WHEN s = 0 THEN list_transform(e, x -> 0)
             |            ELSE list_transform(e, x -> CAST(floor(x / s * 127 + 0.5) AS INT))
             |       END, ',') AS q_csv
             |FROM p""".stripMargin)),

    // embedding sanity audit: the fixture has no broken vectors, so
    // nine planted rows are unioned into BOTH dialects — NaN, Inf, zero
    // vector, wrong dims, off-sphere norm, NULL vector, sub-resolution
    // tiny, a NULL ELEMENT (truncated encode), and an fp16-max component
    // (beyond the quantization-safe bound 379 = floor(sqrt(9e18/64)/1e6))
    // — exercising every verdict for real; the 500 fixture rows pin the
    // all-keep path. Norm bounds [0.81e12, 1.21e12] = the unit sphere
    // ±10% in micro-int space.
    "ext55_embed_audit" -> Q(
      (s, d) => {
        import s.implicits._
        val planted = Seq(
          (-101L, Some(Seq.tabulate(64)(i => if (i == 3) Some(Float.NaN) else Some(0.5f)))),
          (-102L, Some(Seq.tabulate(64)(i => if (i == 0) Some(Float.PositiveInfinity) else Some(0.125f)))),
          (-103L, Some(Seq.fill(64)(Some(0f): Option[Float]))),
          (-104L, Some(Seq.fill(32)(Some(0.17675f): Option[Float]))),
          (-105L, Some(Seq.fill(64)(Some(100f): Option[Float]))),
          (-106L, Option.empty[Seq[Option[Float]]]),
          (-107L, Some(Seq.fill(64)(Some(1e-7f): Option[Float]))),
          // the truncated-encode class: a NULL ELEMENT inside the vector
          (-108L, Some(Seq.tabulate(64)(i => if (i == 5) Option.empty[Float] else Some(0.5f)))),
          // the fp16-overflow class: a component too large to quantize
          (-109L, Some(Seq.tabulate(64)(i => if (i == 0) Some(65504f) else Some(0.125f))))
        ).toDF("vec_id", "embedding")
        Similarity.embedAudit(
          emb(s, d).select(col("vec_id"), col("embedding")).unionByName(planted),
          "vec_id", "embedding", dims = 64,
          normLoE12 = 810000000000L, normHiE12 = 1210000000000L)
      },
      Some("""WITH planted(vec_id, embedding) AS (VALUES
             |  (-101, list_transform(range(64), i -> CASE WHEN i = 3 THEN 'nan'::FLOAT ELSE 0.5::FLOAT END)),
             |  (-102, list_transform(range(64), i -> CASE WHEN i = 0 THEN 'inf'::FLOAT ELSE 0.125::FLOAT END)),
             |  (-103, list_transform(range(64), i -> 0.0::FLOAT)),
             |  (-104, list_transform(range(32), i -> 0.17675::FLOAT)),
             |  (-105, list_transform(range(64), i -> 100.0::FLOAT)),
             |  (-106, NULL),
             |  (-107, list_transform(range(64), i -> 0.0000001::FLOAT)),
             |  (-108, list_transform(range(64), i -> CASE WHEN i = 5 THEN NULL ELSE 0.5::FLOAT END)),
             |  (-109, list_transform(range(64), i -> CASE WHEN i = 0 THEN 65504.0::FLOAT ELSE 0.125::FLOAT END))
             |), corpus AS (
             |  SELECT vec_id, embedding FROM embeddings
             |  UNION ALL SELECT vec_id, embedding FROM planted
             |), sig AS (
             |  SELECT vec_id, embedding,
             |         embedding IS NULL AS is_null,
             |         CAST(CASE WHEN embedding IS NULL THEN 0 ELSE len(embedding) END AS INT) AS n_dims,
             |         CASE WHEN embedding IS NULL THEN FALSE
             |              ELSE len(list_filter(embedding,
             |                     x -> x IS NULL OR NOT isfinite(x) OR abs(x) > 379)) = 0 END AS all_finite
             |  FROM corpus
             |), n AS (
             |  SELECT vec_id, n_dims, is_null, all_finite,
             |         CASE WHEN NOT all_finite THEN CAST(-1 AS BIGINT)
             |              ELSE CAST(list_sum(list_transform(embedding::DOUBLE[],
             |                     x -> CAST(floor(x * 1000000 + 0.5) AS BIGINT)
             |                        * CAST(floor(x * 1000000 + 0.5) AS BIGINT))) AS BIGINT)
             |         END AS norm2_e12
             |  FROM sig
             |)
             |SELECT vec_id, n_dims, is_null, all_finite, norm2_e12,
             |       n_dims = 64 AS dim_ok,
             |       all_finite AND norm2_e12 BETWEEN 810000000000 AND 1210000000000 AS norm_ok,
             |       n_dims = 64
             |         AND (all_finite AND norm2_e12 BETWEEN 810000000000 AND 1210000000000)
             |         AND norm2_e12 > 0 AS keep
             |FROM n""".stripMargin)),

    // C4-style blocklist filter: distinct-term hit count + keep verdict
    // as a shuffle-free plan-literal projection; whole-token matching.
    "ext50_blocklist" -> Q(
      (s, d) => TextAnalysis.blocklistFilter(docs(s, d), "doc_id", "text",
        Seq("slow", "broken", "spill", "skew")),
      Some("""SELECT doc_id,
             |       CAST(len(list_intersect(
             |         list_distinct(list_filter(regexp_split_to_array(trim(lower(text)), '\s+'), x -> x <> '')),
             |         ['broken', 'skew', 'slow', 'spill'])) AS BIGINT) AS n_blocked_terms,
             |       len(list_intersect(
             |         list_distinct(list_filter(regexp_split_to_array(trim(lower(text)), '\s+'), x -> x <> '')),
             |         ['broken', 'skew', 'slow', 'spill'])) = 0 AS keep
             |FROM documents""".stripMargin)),

    // first BPE training iteration: corpus-wide adjacent-character-pair
    // counts inside tokens, top-50 merge candidates with a total
    // (count DESC, pair) tie order — the tokenizer-training inner loop.
    "ext47_bpe_pairs" -> Q(
      (s, d) => TextAnalysis.bpePairs(docs(s, d), "doc_id", "text", k = 50),
      Some("""WITH tk AS (
             |  SELECT unnest(list_filter(regexp_split_to_array(trim(text), '\s+'), x -> x <> '')) AS w
             |  FROM documents
             |), pr AS (
             |  SELECT unnest(list_transform(range(1, len(w)), i -> substr(w, i, 2))) AS pair
             |  FROM tk WHERE len(w) >= 2
             |)
             |SELECT pair, count(*) AS n_occurrences
             |FROM pr GROUP BY pair
             |ORDER BY n_occurrences DESC, pair LIMIT 50""".stripMargin)),

    // corpus snapshot diff: v2 is derived deterministically from the
    // fixture (drop %17, edit %13, add %19 under shifted ids); the diff
    // reports added/removed/changed by normalized fingerprint — the
    // audit before re-training on a refreshed crawl.
    "ext48_corpus_diff" -> Q(
      (s, d) => {
        val v1 = docs(s, d).select(col("doc_id"), col("text"))
        val v2 = v1.filter(col("doc_id") % 17 =!= 0)
          .select(col("doc_id"),
            when(col("doc_id") % 13 === 0, concat(col("text"), lit(" v2edit")))
              .otherwise(col("text")).as("text"))
          .unionByName(v1.filter(col("doc_id") % 19 === 0)
            .select((col("doc_id") + 1000000).as("doc_id"),
              concat(lit("new "), col("text")).as("text")))
        Dedup.corpusDiff(v1, v2, "doc_id", "text")
      },
      Some("""WITH v1 AS (
             |  SELECT doc_id, text FROM documents
             |), v2 AS (
             |  SELECT doc_id,
             |         CASE WHEN doc_id % 13 = 0 THEN text || ' v2edit' ELSE text END AS text
             |  FROM documents WHERE doc_id % 17 <> 0
             |  UNION ALL
             |  SELECT doc_id + 1000000, 'new ' || text FROM documents WHERE doc_id % 19 = 0
             |), f1 AS (
             |  SELECT doc_id, md5(trim(regexp_replace(regexp_replace(lower(text), '[^a-z0-9\s]', '', 'g'), '\s+', ' ', 'g'))) AS fo
             |  FROM v1
             |), f2 AS (
             |  SELECT doc_id, md5(trim(regexp_replace(regexp_replace(lower(text), '[^a-z0-9\s]', '', 'g'), '\s+', ' ', 'g'))) AS fn
             |  FROM v2
             |)
             |SELECT COALESCE(f1.doc_id, f2.doc_id) AS doc_id,
             |       CASE WHEN f1.doc_id IS NULL THEN 'added'
             |            WHEN f2.doc_id IS NULL THEN 'removed'
             |            ELSE 'changed' END AS status
             |FROM f1 FULL JOIN f2 ON f1.doc_id = f2.doc_id
             |WHERE f1.doc_id IS NULL OR f2.doc_id IS NULL OR f1.fo <> f2.fn""".stripMargin)),

    // incremental feature recompute: corpusDiff picks the delta
    // (added/changed docs of the v2 snapshot), and ONLY those flow
    // through quality scoring — the pattern that makes a refreshed
    // 100 TB crawl a delta-sized job instead of a full re-featurize.
    // One Catalyst plan: 40 B/doc diff join → id semi-join → narrow
    // quality projection.
    "ext51_incremental_curation" -> Q(
      (s, d) => {
        val v1 = docs(s, d).select(col("doc_id"), col("text"))
        val v2 = v1.filter(col("doc_id") % 17 =!= 0)
          .select(col("doc_id"),
            when(col("doc_id") % 13 === 0, concat(col("text"), lit(" v2edit")))
              .otherwise(col("text")).as("text"))
          .unionByName(v1.filter(col("doc_id") % 19 === 0)
            .select((col("doc_id") + 1000000).as("doc_id"),
              concat(lit("new "), col("text")).as("text")))
        val delta = Dedup.corpusDiff(v1, v2, "doc_id", "text")
          .filter(col("status") =!= "removed")
        val todo = v2.join(delta.select(col("doc_id"), col("status")), "doc_id")
        TextAnalysis.qualityRules(todo, "doc_id", "text", carry = Seq("status"))
          .select(col("doc_id"), col("status"), col("n_words"), col("keep"))
      },
      Some("""WITH v1 AS (
             |  SELECT doc_id, text FROM documents
             |), v2 AS (
             |  SELECT doc_id,
             |         CASE WHEN doc_id % 13 = 0 THEN text || ' v2edit' ELSE text END AS text
             |  FROM documents WHERE doc_id % 17 <> 0
             |  UNION ALL
             |  SELECT doc_id + 1000000, 'new ' || text FROM documents WHERE doc_id % 19 = 0
             |), f1 AS (
             |  SELECT doc_id, md5(trim(regexp_replace(regexp_replace(lower(text), '[^a-z0-9\s]', '', 'g'), '\s+', ' ', 'g'))) AS fo
             |  FROM v1
             |), f2 AS (
             |  SELECT doc_id, md5(trim(regexp_replace(regexp_replace(lower(text), '[^a-z0-9\s]', '', 'g'), '\s+', ' ', 'g'))) AS fn
             |  FROM v2
             |), delta AS (
             |  SELECT f2.doc_id,
             |         CASE WHEN f1.doc_id IS NULL THEN 'added' ELSE 'changed' END AS status
             |  FROM f2 LEFT JOIN f1 ON f1.doc_id = f2.doc_id
             |  WHERE f1.doc_id IS NULL OR f1.fo <> f2.fn
             |), w AS (
             |  SELECT v2.doc_id, delta.status,
             |         list_filter(regexp_split_to_array(trim(v2.text), '\s+'), t -> t <> '') AS ws
             |  FROM v2 JOIN delta ON v2.doc_id = delta.doc_id
             |), m AS (
             |  SELECT doc_id, status, len(ws) AS n, len(list_distinct(ws)) AS nd,
             |         CASE WHEN len(ws) >= 2 THEN len(ws) - 1 ELSE 0 END AS nb,
             |         CASE WHEN len(ws) >= 2
             |              THEN len(list_distinct(list_transform(range(1, len(ws)), i -> ws[i] || ' ' || ws[i+1])))
             |              ELSE 0 END AS ndb,
             |         list_sum(list_transform(ws, t -> len(t))) AS sl
             |  FROM w
             |)
             |SELECT doc_id, status, n AS n_words,
             |       (n BETWEEN 30 AND 100000
             |        AND (CASE WHEN n > 0 THEN CAST(floor((n - nd)::DOUBLE / n * 1000000 + 0.5) AS BIGINT) ELSE 0 END) <= 500000
             |        AND (CASE WHEN nb > 0 THEN CAST(floor((nb - ndb)::DOUBLE / nb * 1000000 + 0.5) AS BIGINT) ELSE 0 END) <= 100000
             |        AND (CASE WHEN n > 0 THEN CAST(floor(sl::DOUBLE / n * 1000000 + 0.5) AS BIGINT) ELSE 0 END)
             |            BETWEEN 3000000 AND 10000000) AS keep
             |FROM m""".stripMargin)),

    // per-source corpus data card: doc/token counts, quality keep rate,
    // corpus-WIDE exact-dup rate (cross-source copies flag both rows) —
    // the report a shipped corpus carries; every ratio micro-floored
    // after integer sums.
    "ext45_corpus_report" -> Q(
      (s, d) => TextAnalysis.corpusReport(docs(s, d), "doc_id", "text", "source"),
      Some("""WITH w AS (
             |  SELECT doc_id, source,
             |         md5(trim(regexp_replace(regexp_replace(lower(text), '[^a-z0-9\s]', '', 'g'), '\s+', ' ', 'g'))) AS fp,
             |         list_filter(regexp_split_to_array(trim(text), '\s+'), t -> t <> '') AS ws
             |  FROM documents
             |), m AS (
             |  SELECT doc_id, source, fp, len(ws) AS n, len(list_distinct(ws)) AS nd,
             |         CASE WHEN len(ws) >= 2 THEN len(ws) - 1 ELSE 0 END AS nb,
             |         CASE WHEN len(ws) >= 2
             |              THEN len(list_distinct(list_transform(range(1, len(ws)), i -> ws[i] || ' ' || ws[i+1])))
             |              ELSE 0 END AS ndb,
             |         list_sum(list_transform(ws, t -> len(t))) AS sl
             |  FROM w
             |), k AS (
             |  SELECT doc_id, source, fp, n AS n_words,
             |         (n BETWEEN 30 AND 100000
             |          AND (CASE WHEN n > 0 THEN CAST(floor((n - nd)::DOUBLE / n * 1000000 + 0.5) AS BIGINT) ELSE 0 END) <= 500000
             |          AND (CASE WHEN nb > 0 THEN CAST(floor((nb - ndb)::DOUBLE / nb * 1000000 + 0.5) AS BIGINT) ELSE 0 END) <= 100000
             |          AND (CASE WHEN n > 0 THEN CAST(floor(sl::DOUBLE / n * 1000000 + 0.5) AS BIGINT) ELSE 0 END)
             |              BETWEEN 3000000 AND 10000000) AS keep
             |  FROM m
             |), fc AS (
             |  SELECT fp, count(*) AS nc FROM k GROUP BY fp
             |)
             |SELECT source, count(*) AS n_docs,
             |       CAST(sum(n_words) AS BIGINT) AS n_tokens,
             |       CAST(sum(CASE WHEN keep THEN 1 ELSE 0 END) AS BIGINT) AS n_quality_keep,
             |       CAST(sum(CASE WHEN nc > 1 THEN 1 ELSE 0 END) AS BIGINT) AS n_exact_dup,
             |       CAST(floor(sum(n_words)::DOUBLE / count(*) * 1000000 + 0.5) AS BIGINT) AS mean_tokens_e6,
             |       CAST(floor(sum(CASE WHEN nc > 1 THEN 1 ELSE 0 END)::DOUBLE / count(*) * 1000000 + 0.5) AS BIGINT) AS dup_frac_e6
             |FROM k JOIN fc USING (fp)
             |GROUP BY source""".stripMargin)),

    // cross-source overlap matrix: a planted 'mirror' source (every
    // doc_id % 25 == 0, re-labeled) shares fingerprints with each real
    // source — the report that spots mirrored sources before paying for
    // doc-level dedup. Pairwise counts + micro-floored Jaccard.
    "ext54_source_overlap" -> Q(
      (s, d) => {
        val base = docs(s, d)
        val planted = base.select(col("doc_id"), col("text"), col("source"))
          .unionByName(base.filter(col("doc_id") % 25 === 0)
            .select((col("doc_id") + 500000).as("doc_id"), col("text"),
              lit("mirror").as("source")))
        TextAnalysis.sourceOverlap(planted, "doc_id", "text", "source")
      },
      Some("""WITH all_docs AS (
             |  SELECT doc_id, text, source FROM documents
             |  UNION ALL
             |  SELECT doc_id + 500000, text, 'mirror' FROM documents WHERE doc_id % 25 = 0
             |), f AS (
             |  SELECT DISTINCT source,
             |         md5(trim(regexp_replace(regexp_replace(lower(text), '[^a-z0-9\s]', '', 'g'), '\s+', ' ', 'g'))) AS fp
             |  FROM all_docs
             |), sz AS (
             |  SELECT source, count(*) AS n_fp FROM f GROUP BY source
             |), sh AS (
             |  SELECT l.source AS source_a, r.source AS source_b, count(*) AS n_shared
             |  FROM f l JOIN f r ON l.fp = r.fp AND l.source < r.source
             |  GROUP BY 1, 2
             |)
             |SELECT source_a, source_b, n_shared,
             |       a.n_fp AS n_a, b.n_fp AS n_b,
             |       CAST(floor(n_shared::DOUBLE / (a.n_fp + b.n_fp - n_shared) * 1000000 + 0.5) AS BIGINT) AS jaccard_e6
             |FROM sh JOIN sz a ON a.source = sh.source_a
             |        JOIN sz b ON b.source = sh.source_b""".stripMargin)),

    // hybrid retrieval: reciprocal-rank fusion of the lexical TF-IDF
    // top-20 (ext44's machinery) with the embedding cosine top-20
    // (ext05's) — the standard two-tower search stack. Queries without
    // an embedding (most docs at sf0.1) fuse the lexical list alone;
    // every contribution is a micro-floored integer, so the fused
    // ranking replays exactly.
    "ext46_hybrid_retrieval" -> Q(
      (s, d) => {
        val dd = docs(s, d); val ee = emb(s, d)
        val lex = TextAnalysis.tfidfTopK(
          dd.filter(col("doc_id") % 50 =!= 0), dd.filter(col("doc_id") % 50 === 0),
          "doc_id", "text", k = 20)
          .select(col("q_id"), col("doc_id"), col("rnk"))
        val sem = Similarity.cosineTopK(
          ee.filter(col("vec_id") % 50 =!= 0), ee.filter(col("vec_id") % 50 === 0),
          "vec_id", "embedding", k = 20)
          .select(col("qid").as("q_id"), col("nid").as("doc_id"), col("rnk"))
        Similarity.rrfFuse(Seq(lex, sem), "q_id", "doc_id", "rnk", k = 10)
      },
      Some("""WITH tk AS (
             |  SELECT doc_id, unnest(list_filter(regexp_split_to_array(trim(text), '\s+'), x -> x <> '')) AS token
             |  FROM documents
             |), tf AS (
             |  SELECT doc_id, token, count(*) AS c FROM tk GROUP BY 1, 2
             |), cc AS (
             |  SELECT * FROM tf WHERE doc_id % 50 <> 0
             |), qq AS (
             |  SELECT doc_id AS q_id, token, c AS tf_q FROM tf WHERE doc_id % 50 = 0
             |), dfreq AS (
             |  SELECT token, count(*) AS df FROM cc GROUP BY token
             |), n AS (
             |  SELECT count(DISTINCT doc_id) AS n_docs FROM cc
             |), idf AS (
             |  SELECT token, CAST(floor(1000000.0 * n.n_docs / df + 0.5) AS BIGINT) AS idf_e6
             |  FROM dfreq CROSS JOIN n
             |), qsel AS (
             |  SELECT q_id, token, tf_q FROM (
             |    SELECT qq.q_id, qq.token, qq.tf_q,
             |           row_number() OVER (PARTITION BY qq.q_id
             |             ORDER BY d.df ASC, qq.token ASC) AS trnk
             |    FROM qq JOIN dfreq d USING (token))
             |  WHERE trnk <= 16
             |), lexsc AS (
             |  SELECT qsel.q_id, cc.doc_id,
             |         CAST(sum(qsel.tf_q * cc.c * idf.idf_e6) AS BIGINT) AS score_e6
             |  FROM qsel JOIN cc USING (token) JOIN idf ON idf.token = qsel.token
             |  GROUP BY 1, 2
             |), lexr AS (
             |  SELECT q_id, doc_id, row_number() OVER (PARTITION BY q_id
             |           ORDER BY score_e6 DESC, doc_id) AS rnk
             |  FROM lexsc
             |), sim AS (
             |  SELECT q.vec_id AS q_id, e.vec_id AS doc_id,
             |         round(list_cosine_similarity(q.embedding::DOUBLE[], e.embedding::DOUBLE[]), 6) AS cosine
             |  FROM embeddings q JOIN embeddings e
             |    ON q.vec_id % 50 = 0 AND e.vec_id % 50 <> 0
             |), semr AS (
             |  SELECT q_id, doc_id, row_number() OVER (PARTITION BY q_id
             |           ORDER BY cosine DESC, doc_id) AS rnk
             |  FROM sim
             |), uni AS (
             |  SELECT q_id, doc_id,
             |         CAST(floor(1000000.0 / (60 + rnk) + 0.5) AS BIGINT) AS contrib
             |  FROM lexr WHERE rnk <= 20
             |  UNION ALL
             |  SELECT q_id, doc_id,
             |         CAST(floor(1000000.0 / (60 + rnk) + 0.5) AS BIGINT)
             |  FROM semr WHERE rnk <= 20
             |), fused AS (
             |  SELECT q_id, doc_id, CAST(sum(contrib) AS BIGINT) AS rrf_e6,
             |         count(*) AS n_lists
             |  FROM uni GROUP BY 1, 2
             |)
             |SELECT q_id, doc_id, rrf_e6, n_lists, rnk FROM (
             |  SELECT *, row_number() OVER (PARTITION BY q_id
             |           ORDER BY rrf_e6 DESC, doc_id) AS rnk
             |  FROM fused) WHERE rnk <= 10""".stripMargin)),

    // feature-hashing document vectors: md5-bucketed token histograms —
    // the model-free lexical embedding every doc gets; exact integer
    // counts, dense csv, fully oracle-replayable.
    "ext43_hash_embed" -> Q(
      (s, d) => TextAnalysis.hashEmbed(docs(s, d), "doc_id", "text", dims = 64),
      Some("""WITH tk AS (
             |  SELECT doc_id, unnest(list_filter(regexp_split_to_array(trim(text), '\s+'), x -> x <> '')) AS token
             |  FROM documents
             |), bk AS (
             |  SELECT doc_id, CAST(('0x' || substr(md5(token), 1, 8))::BIGINT % 64 AS INT) AS b
             |  FROM tk
             |), ag AS (
             |  SELECT doc_id, b, count(*) AS c FROM bk GROUP BY 1, 2
             |), grid AS (
             |  SELECT d.doc_id, r.j FROM (SELECT DISTINCT doc_id FROM bk) d
             |  CROSS JOIN range(64) r(j)
             |), filled AS (
             |  SELECT g.doc_id, g.j, coalesce(ag.c, 0) AS c
             |  FROM grid g LEFT JOIN ag ON ag.doc_id = g.doc_id AND ag.b = g.j
             |)
             |SELECT doc_id,
             |       CAST(sum(CASE WHEN c > 0 THEN 1 ELSE 0 END) AS BIGINT) AS n_nonzero,
             |       CAST(sum(c) AS BIGINT) AS n_tokens,
             |       string_agg(CAST(c AS VARCHAR), ',' ORDER BY j) AS vec_csv
             |FROM filled GROUP BY doc_id""".stripMargin)),

    // per-source token-length distribution: exact quantiles (bounded
    // length cardinality -> O(distinct) agg state, the q35 argument),
    // integer-exact mean; both engines share the linear-interpolation
    // quantile definition.
    "ext60_length_quantiles" -> Q(
      (s, d) => TextAnalysis.lengthQuantiles(docs(s, d), "doc_id", "text", "source"),
      Some("""WITH n AS (
             |  SELECT source,
             |         len(list_filter(regexp_split_to_array(trim(text), '\s+'), x -> x <> '')) AS n
             |  FROM documents
             |)
             |SELECT source, CAST(count(*) AS BIGINT) AS n_docs,
             |       CAST(sum(n) AS BIGINT) AS n_tokens,
             |       CAST(floor(sum(n)::DOUBLE / count(*) * 1000000 + 0.5) AS BIGINT) AS mean_e6,
             |       CAST(floor(quantile_cont(n, 0.25) * 1000000 + 0.5) AS BIGINT) AS p25_e6,
             |       CAST(floor(quantile_cont(n, 0.5) * 1000000 + 0.5) AS BIGINT) AS p50_e6,
             |       CAST(floor(quantile_cont(n, 0.9) * 1000000 + 0.5) AS BIGINT) AS p90_e6,
             |       CAST(floor(quantile_cont(n, 0.99) * 1000000 + 0.5) AS BIGINT) AS p99_e6
             |FROM n GROUP BY source""".stripMargin)),

    // DSIR-shaped importance weighting: src0 is the target domain, the
    // other 19 sources are the raw pool; both dialects rebuild the
    // 64-bucket model and replay every document's integer importance.
    "ext58_importance_weight" -> Q(
      (s, d) => TextAnalysis.importanceWeight(docs(s, d), "doc_id", "text",
        isTarget = col("source") === "src0", dims = 64),
      Some("""WITH tk AS (
             |  SELECT doc_id, source = 'src0' AS t,
             |         CAST(('0x' || substr(md5(token), 1, 8))::BIGINT % 64 AS INT) AS b
             |  FROM (SELECT doc_id, source,
             |               unnest(list_filter(regexp_split_to_array(trim(text), '\s+'), x -> x <> '')) AS token
             |        FROM documents)
             |), c AS (
             |  SELECT b, sum(CASE WHEN t THEN 1 ELSE 0 END) AS tc,
             |         sum(CASE WHEN t THEN 0 ELSE 1 END) AS rc
             |  FROM tk GROUP BY b
             |), tot AS (SELECT sum(tc) AS tN, sum(rc) AS rN FROM c
             |), w AS (
             |  SELECT b,
             |         CAST(floor(((tc + 1) * (rN + 64))::DOUBLE
             |                    / ((tc + 1) * (rN + 64) + (rc + 1) * (tN + 64))::DOUBLE
             |                    * 1000000 + 0.5) AS BIGINT)
             |           - 500000 AS w_e6
             |  FROM c, tot
             |)
             |SELECT doc_id, CAST(count(*) AS BIGINT) AS n_tokens,
             |       CAST(sum(w_e6) AS BIGINT) AS imp_e6,
             |       CAST(floor(sum(w_e6)::DOUBLE / count(*) + 0.5) AS BIGINT) AS imp_mean_e6
             |FROM tk JOIN w USING (b)
             |WHERE NOT t
             |GROUP BY doc_id""".stripMargin)),

    // text canonicalization: the fixture is clean ASCII, so five planted
    // rows — decomposed NFC target, whitespace runs, control chars, a
    // ligature and a full-width form that NFC must NOT fold — exercise
    // every branch in BOTH dialects (Spark's JDK normalizer vs DuckDB's
    // utf8proc implement the same Unicode spec; the oracle proves it).
    "ext57_normalize_text" -> Q(
      (s, d) => {
        import s.implicits._
        val planted = Seq(
          (-1L, "cafe\u0301 menu"),         // e + combining acute -> e-acute
          (-2L, "  runs\t of \n whitespace  "),
          (-3L, "ctrl\u0001chars\u0007here"),
          (-4L, "ﬁle ligature stays"),               // ﬁ survives NFC
          (-5L, "Ｆull-width stays")                  // Ｆ survives NFC
        ).toDF("doc_id", "text")
        TextAnalysis.normalizeText(
          docs(s, d).select(col("doc_id"), col("text")).unionByName(planted),
          "doc_id", "text")
      },
      Some("""WITH corpus AS (
             |  SELECT doc_id, text FROM documents
             |  UNION ALL
             |  SELECT * FROM (VALUES
             |    (CAST(-1 AS BIGINT), 'cafe' || chr(769) || ' menu'),
             |    (CAST(-2 AS BIGINT), '  runs' || chr(9) || ' of ' || chr(10) || ' whitespace  '),
             |    (CAST(-3 AS BIGINT), 'ctrl' || chr(1) || 'chars' || chr(7) || 'here'),
             |    (CAST(-4 AS BIGINT), chr(64257) || 'le ligature stays'),
             |    (CAST(-5 AS BIGINT), chr(65318) || 'ull-width stays')
             |  ) v(doc_id, text)
             |), n AS (
             |  SELECT doc_id, text,
             |         trim(regexp_replace(regexp_replace(nfc_normalize(text),
             |           '[\x01-\x08\x0B\x0C\x0E-\x1F\x7F]', '', 'g'), '\s+', ' ', 'g')) AS t
             |  FROM corpus
             |)
             |SELECT doc_id, t AS text_norm, t <> text AS changed,
             |       CAST(len(text) AS BIGINT) AS n_chars_raw,
             |       CAST(len(t) AS BIGINT) AS n_chars_norm
             |FROM n""".stripMargin)),

    // hashed linear classifier: the model (weight per md5 bucket + bias)
    // rides the plan as an expression — no weights table, no join; both
    // dialects regenerate the weights from md5 and replay the integer
    // logit exactly. Bias 0.25 in micro units so the verdict boundary
    // is exercised off-center.
    "ext56_classifier_score" -> Q(
      (s, d) => TextAnalysis.classifierScore(docs(s, d), "doc_id", "text",
        dims = 64, biasE6 = 250000L),
      Some("""WITH tk AS (
             |  SELECT doc_id, unnest(list_filter(regexp_split_to_array(trim(text), '\s+'), x -> x <> '')) AS token
             |  FROM documents
             |), wt AS (
             |  SELECT doc_id,
             |         ('0x' || substr(md5('w:' || CAST(CAST(('0x' || substr(md5(token), 1, 8))::BIGINT % 64 AS INT) AS VARCHAR)), 1, 8))::BIGINT % 2001 - 1000 AS w
             |  FROM tk
             |), ag AS (
             |  SELECT doc_id, CAST(count(*) AS BIGINT) AS n_tokens,
             |         CAST(sum(w) + 250000 AS BIGINT) AS logit_e6
             |  FROM wt GROUP BY doc_id
             |)
             |SELECT d.doc_id,
             |       coalesce(ag.n_tokens, 0) AS n_tokens,
             |       coalesce(ag.logit_e6, 250000) AS logit_e6,
             |       coalesce(ag.logit_e6, 250000) >= 0 AS keep
             |FROM (SELECT DISTINCT doc_id FROM documents) d
             |LEFT JOIN ag ON ag.doc_id = d.doc_id""".stripMargin)),

    // sparse lexical TF-IDF retrieval: top-5 corpus docs per query doc
    // (queries = doc_id % 50 = 0, corpus = the rest) by the inverted-
    // index dot product with micro-floored integer idf — similarity
    // search with no learned embedding, exactly replayable cross-engine.
    "ext44_tfidf_topk" -> Q(
      (s, d) => {
        val all = docs(s, d)
        TextAnalysis.tfidfTopK(
          all.filter(col("doc_id") % 50 =!= 0),
          all.filter(col("doc_id") % 50 === 0),
          "doc_id", "text", k = 5)
      },
      Some("""WITH tk AS (
             |  SELECT doc_id, unnest(list_filter(regexp_split_to_array(trim(text), '\s+'), x -> x <> '')) AS token
             |  FROM documents
             |), tf AS (
             |  SELECT doc_id, token, count(*) AS c FROM tk GROUP BY 1, 2
             |), cc AS (
             |  SELECT * FROM tf WHERE doc_id % 50 <> 0
             |), qq AS (
             |  SELECT doc_id AS q_id, token, c AS tf_q FROM tf WHERE doc_id % 50 = 0
             |), dfreq AS (
             |  SELECT token, count(*) AS df FROM cc GROUP BY token
             |), n AS (
             |  SELECT count(DISTINCT doc_id) AS n_docs FROM cc
             |), idf AS (
             |  SELECT token, CAST(floor(1000000.0 * n.n_docs / df + 0.5) AS BIGINT) AS idf_e6
             |  FROM dfreq CROSS JOIN n
             |), qsel AS (
             |  SELECT q_id, token, tf_q FROM (
             |    SELECT qq.q_id, qq.token, qq.tf_q,
             |           row_number() OVER (PARTITION BY qq.q_id
             |             ORDER BY d.df ASC, qq.token ASC) AS trnk
             |    FROM qq JOIN dfreq d USING (token))
             |  WHERE trnk <= 16
             |), sc AS (
             |  SELECT qsel.q_id, cc.doc_id,
             |         CAST(sum(qsel.tf_q * cc.c * idf.idf_e6) AS BIGINT) AS score_e6,
             |         count(*) AS n_terms
             |  FROM qsel JOIN cc USING (token) JOIN idf ON idf.token = qsel.token
             |  GROUP BY 1, 2
             |), r AS (
             |  SELECT *, row_number() OVER (PARTITION BY q_id
             |                               ORDER BY score_e6 DESC, doc_id) AS rnk
             |  FROM sc
             |)
             |SELECT q_id, doc_id, score_e6, n_terms, rnk FROM r WHERE rnk <= 5""".stripMargin)),

    // BM25 retrieval (the Okapi scorer lexical stacks actually ship):
    // ext44's inverted-index probe plus tf saturation and length
    // normalization, all in engine-exact integer arithmetic (ratio idf
    // in milli-units, micro-scaled denominator with ONE correctly-
    // rounded IEEE division for dl·N/AD, integer floor-div per term,
    // integer sum) — the oracle replays every step with `//`.
    "ext99_bm25_topk" -> Q(
      (s, d) => {
        val all = docs(s, d)
        TextAnalysis.bm25TopK(
          all.filter(col("doc_id") % 50 =!= 0),
          all.filter(col("doc_id") % 50 === 0),
          "doc_id", "text", k = 5)
      },
      Some("""WITH tk AS (
             |  SELECT doc_id, unnest(list_filter(regexp_split_to_array(trim(text), '\s+'), x -> x <> '')) AS token
             |  FROM documents
             |), tf AS (
             |  SELECT doc_id, token, count(*) AS c FROM tk GROUP BY 1, 2
             |), cc AS (
             |  SELECT * FROM tf WHERE doc_id % 50 <> 0
             |), qq AS (
             |  SELECT doc_id AS q_id, token, c AS tf_q FROM tf WHERE doc_id % 50 = 0
             |), dfreq AS (
             |  SELECT token, count(*) AS df FROM cc GROUP BY token
             |), st AS (
             |  SELECT count(DISTINCT doc_id) AS n_docs, sum(c) AS total_tokens FROM cc
             |), dls AS (
             |  SELECT doc_id, sum(c) AS dl FROM cc GROUP BY doc_id
             |), idf AS (
             |  SELECT token, df,
             |         ((2 * (st.n_docs - df) + 1) * 1000) // (2 * df + 1) AS idf_e3
             |  FROM dfreq CROSS JOIN st
             |), qsel AS (
             |  SELECT q_id, token, tf_q FROM (
             |    SELECT qq.q_id, qq.token, qq.tf_q,
             |           row_number() OVER (PARTITION BY qq.q_id
             |             ORDER BY d.df ASC, qq.token ASC) AS trnk
             |    FROM qq JOIN dfreq d USING (token))
             |  WHERE trnk <= 16
             |), sc AS (
             |  SELECT qsel.q_id, cc.doc_id,
             |         CAST(sum((idf.idf_e3 * 22 * cc.c * qsel.tf_q * 1000000)
             |           // (cc.c * 1000000 + 300000 +
             |              CAST(floor(900000.0 * (dls.dl * st.n_docs)::DOUBLE / st.total_tokens + 0.5) AS BIGINT))) AS BIGINT) AS score_e4,
             |         count(*) AS n_terms
             |  FROM qsel
             |  JOIN cc USING (token)
             |  JOIN idf ON idf.token = qsel.token
             |  JOIN dls ON dls.doc_id = cc.doc_id
             |  CROSS JOIN st
             |  GROUP BY 1, 2
             |), r AS (
             |  SELECT *, row_number() OVER (PARTITION BY q_id
             |                               ORDER BY score_e4 DESC, doc_id) AS rnk
             |  FROM sc
             |)
             |SELECT q_id, doc_id, score_e4, n_terms, rnk FROM r WHERE rnk <= 5""".stripMargin)),

    // bigram-LM document score (KenLM-filter analog): mean corpus
    // conditional probability of the doc's adjacent bigrams — per-bigram
    // IEEE division floored to micros, then integer sum/mean, so the
    // oracle replays it exactly (no ln/exp drift).
    "ext42_bigram_lm" -> Q(
      (s, d) => TextAnalysis.bigramLmScore(docs(s, d), "doc_id", "text"),
      Some("""WITH t AS (
             |  SELECT doc_id, list_filter(regexp_split_to_array(trim(text), '\s+'), x -> x <> '') AS w
             |  FROM documents
             |), b AS (
             |  SELECT doc_id,
             |         unnest(list_transform(range(1, len(w)), i -> w[i] || ' ' || w[i+1])) AS bg,
             |         unnest(list_transform(range(1, len(w)), i -> w[i])) AS w1
             |  FROM t WHERE len(w) >= 2
             |), c2 AS (
             |  SELECT bg, count(*) AS n2 FROM b GROUP BY 1
             |), c1 AS (
             |  SELECT w1, count(*) AS n1 FROM b GROUP BY 1
             |), j AS (
             |  SELECT doc_id,
             |         CAST(floor(n2::DOUBLE / n1 * 1000000 + 0.5) AS BIGINT) AS p_e6
             |  FROM b JOIN c2 USING (bg) JOIN c1 USING (w1)
             |)
             |SELECT doc_id, count(*) AS n_bigrams,
             |       CAST(sum(p_e6) AS BIGINT) AS sum_cond_e6,
             |       CAST(floor(sum(p_e6)::DOUBLE / count(*) + 0.5) AS BIGINT) AS mean_cond_e6
             |FROM j GROUP BY doc_id""".stripMargin)),

    // n-gram novelty: fraction of a doc's distinct trigrams unique to it
    // corpus-wide — the boilerplate signal between line dedup and
    // whole-doc near-dedup; exact integers + one micro-int ratio.
    "ext32_ngram_novelty" -> Q(
      (s, d) => TextAnalysis.ngramNovelty(docs(s, d), "doc_id", "text", n = 3),
      Some("""WITH sh AS (
             |  SELECT doc_id, list_distinct(list_transform(range(1, len(w) - 1),
             |           i -> w[i] || ' ' || w[i+1] || ' ' || w[i+2])) AS s
             |  FROM (SELECT doc_id, list_filter(regexp_split_to_array(text, '\s+'), t -> t <> '') AS w FROM documents)
             |  WHERE len(w) >= 3
             |), ex AS (
             |  SELECT doc_id, unnest(s) AS g FROM sh
             |), cnt AS (
             |  SELECT g, count(*) AS c FROM ex GROUP BY 1
             |)
             |SELECT doc_id, count(*) AS n_shingles,
             |       CAST(sum(CASE WHEN c > 1 THEN 1 ELSE 0 END) AS BIGINT) AS n_shared,
             |       CAST(floor((count(*) - sum(CASE WHEN c > 1 THEN 1 ELSE 0 END))::DOUBLE
             |                  / count(*) * 1000000 + 0.5) AS BIGINT) AS novelty_e6
             |FROM ex JOIN cnt USING (g)
             |GROUP BY doc_id""".stripMargin)),

    // SemDeDup-style semantic dedup: within each coarse cluster (the
    // fixture's label column; an IVF cell id at scale) a vector is
    // dropped iff an earlier cluster-mate sits within cosine 0.45 — the
    // embedding analog of first-occurrence-wins. One verdict per vector.
    "ext33_semantic_dedup" -> Q(
      (s, d) => Similarity.semanticDedup(emb(s, d), "vec_id", "embedding",
        "label", threshold = 0.45),
      Some("""WITH p AS (
             |  SELECT a.vec_id AS id, count(*) AS n
             |  FROM embeddings a JOIN embeddings b
             |    ON a.label = b.label AND b.vec_id < a.vec_id
             |   AND list_cosine_similarity(b.embedding::DOUBLE[], a.embedding::DOUBLE[]) >= 0.45
             |  GROUP BY 1
             |)
             |SELECT e.vec_id, e.label,
             |       CAST(coalesce(p.n, 0) AS BIGINT) AS n_earlier_dups,
             |       p.id IS NULL AS is_kept
             |FROM embeddings e LEFT JOIN p ON e.vec_id = p.id""".stripMargin)),

    // temperature-flattened source mixing (α = 1/2): per-source sampling
    // weights w ∝ sqrt(n), integer-exact except the required-correctly-
    // rounded sqrt and one final division to micro-units.
    "ext34_mixture_weights" -> Q(
      (s, d) => Sampling.temperatureWeights(docs(s, d), "source"),
      Some("""WITH c AS (
             |  SELECT source, count(*) AS n_docs FROM documents GROUP BY 1
             |), sq AS (
             |  SELECT source, n_docs,
             |         CAST(floor(sqrt(n_docs::DOUBLE) * 1000000 + 0.5) AS BIGINT) AS sqrt_e6
             |  FROM c
             |), t AS (
             |  SELECT CAST(sum(sqrt_e6) AS BIGINT) AS tot FROM sq
             |)
             |SELECT source, n_docs, sqrt_e6,
             |       CAST(floor(sqrt_e6::DOUBLE / tot::DOUBLE * 1000000 + 0.5) AS BIGINT) AS weight_e6
             |FROM sq, t""".stripMargin)),

    // mixture sampling applied: temperature weights -> per-source keep
    // rates against a 200-doc budget -> row-wise md5-bucket verdicts;
    // the end-to-end α=1/2 corpus mixing pass, every rate and verdict
    // replayed by the oracle.
    "ext52_mixture_sample" -> Q(
      (s, d) => Sampling.mixtureSample(docs(s, d), "doc_id", "source",
        budgetDocs = 200L, salt = "mix"),
      Some("""WITH c AS (
             |  SELECT source, count(*) AS n_docs FROM documents GROUP BY 1
             |), sq AS (
             |  SELECT source, n_docs,
             |         CAST(floor(sqrt(n_docs::DOUBLE) * 1000000 + 0.5) AS BIGINT) AS sqrt_e6
             |  FROM c
             |), t AS (
             |  SELECT CAST(sum(sqrt_e6) AS BIGINT) AS tot FROM sq
             |), w AS (
             |  SELECT source, n_docs,
             |         CAST(floor(sqrt_e6::DOUBLE / tot::DOUBLE * 1000000 + 0.5) AS BIGINT) AS weight_e6
             |  FROM sq, t
             |), r AS (
             |  SELECT source,
             |         least(10000, CAST(floor((200 * weight_e6)::DOUBLE / (100.0 * n_docs) + 0.5) AS BIGINT)) AS rate_per_myriad
             |  FROM w
             |), b AS (
             |  SELECT d.doc_id, d.source, r.rate_per_myriad,
             |         CAST(('0x' || substr(md5(d.doc_id || ':mix'), 1, 8))::BIGINT % 10000 AS BIGINT) AS bucket
             |  FROM documents d JOIN r USING (source)
             |)
             |SELECT doc_id, source, bucket, rate_per_myriad
             |FROM b WHERE bucket < rate_per_myriad""".stripMargin)),

    // best-of-cluster curation: near-dup clusters keep their LONGEST
    // member (ties → lowest id) instead of the structural min-id keeper —
    // clusters ∘ keepBest, one row per cluster.
    "ext31_best_keeper" -> Q(
      (s, d) => {
        val dd = docs(s, d)
        // capped machinery + star edges: ext27's discipline — identical
        // components (and keeper election) to uncapped truth for
        // identical-content families, linear in family size
        val (pairs, families) = Dedup.minhashLshCapped(dd, "doc_id", "text",
          n = 3, k = 128, bands = 32, threshold = 0.8, maxBucket = 64)
        val cl = Dedup.clusters(dd, "doc_id", Dedup.cappedEdges(pairs, families))
        val scores = dd.select(col("doc_id"),
          size(filter(split(trim(col("text")), "\\s+"), t => t =!= ""))
            .cast("long").as("n_words"))
        Dedup.keepBest(cl.select(col("doc_id"), col("cluster_id")), scores, "n_words")
      },
      Some(raw"""WITH RECURSIVE sh AS MATERIALIZED (
             |  SELECT doc_id, list_distinct(list_transform(range(1, len(w) - 1),
             |           i -> w[i] || ' ' || w[i+1] || ' ' || w[i+2])) AS s
             |  FROM (SELECT doc_id, list_filter(regexp_split_to_array(text, '\s+'), t -> t <> '') AS w FROM documents)
             |  WHERE len(w) >= 3
${OracleSql.InvIndex}
${OracleSql.Components}
             |), fl AS (
             |  SELECT d.doc_id, coalesce(c.cluster_id, d.doc_id) AS cluster_id,
             |         len(list_filter(regexp_split_to_array(trim(d.text), '\s+'), t -> t <> '')) AS n_words
             |  FROM documents d LEFT JOIN comp c ON d.doc_id = c.doc_id
             |), ranked AS (
             |  SELECT cluster_id, doc_id, n_words,
             |         row_number() OVER (PARTITION BY cluster_id ORDER BY n_words DESC, doc_id) AS rk,
             |         count(*) OVER (PARTITION BY cluster_id) AS cluster_size
             |  FROM fl
             |)
             |SELECT cluster_id, doc_id AS keeper_id,
             |       CAST(n_words AS BIGINT) AS keeper_n_words,
             |       CAST(cluster_size AS BIGINT) AS cluster_size
             |FROM ranked WHERE rk = 1""".stripMargin)),

    // per-label centroid of int8-quantized embeddings: quantize-first
    // keeps sums exact integers; one IEEE division per component, scaled
    // to micro-ints and comma-joined (array cells void the gate's hasher).
    "ext30_label_centroids" -> Q(
      (s, d) => Similarity.centroidInt8(emb(s, d), "label", "embedding"),
      Some("""WITH p AS (
             |  SELECT label, embedding::DOUBLE[] AS e,
             |         list_max(list_transform(embedding::DOUBLE[], x -> abs(x))) AS s
             |  FROM embeddings
             |), q AS (
             |  SELECT label, CASE WHEN s = 0 THEN list_transform(e, x -> 0)
             |       ELSE list_transform(e, x -> CAST(floor(x / s * 127 + 0.5) AS INT)) END AS qv
             |  FROM p
             |), ex AS (
             |  SELECT label, unnest(range(0, len(qv))) AS pos, unnest(qv) AS v FROM q
             |), ag AS (
             |  SELECT label, pos, sum(v) AS sv, count(*) AS n FROM ex GROUP BY 1, 2
             |)
             |SELECT label, CAST(max(n) AS BIGINT) AS n_vectors,
             |       string_agg(CAST(CAST(floor(sv::DOUBLE / n * 1000000 + 0.5) AS BIGINT) AS VARCHAR), ',' ORDER BY pos) AS centroid_e6_csv
             |FROM ag GROUP BY label""".stripMargin)),

    // hybrid dedup decision table: a document is dropped if it has an
    // EARLIER near-duplicate lexically (banded minhash pairs == all-pairs
    // truth here, ext03) OR semantically (within-label cosine, ext33) —
    // the union rule production curation applies when only a subset of
    // the corpus carries embeddings (at sf0.1, 2000 of 5000 docs do;
    // missing vectors mean "no semantic signal", never "drop").
    "ext37_hybrid_dedup" -> Q(
      (s, d) => {
        val dd = docs(s, d)
        // "has an EARLIER lexical near-dup" from the capped machinery:
        // doc_b of sub-cap pairs ∪ capped-family members above their rep
        // (rep = family min for identical-content families, so the
        // verdict equals the uncapped truth — ext27's discipline)
        val (lexPairs, lexFams) = Dedup.minhashLshCapped(dd, "doc_id", "text",
          n = 3, k = 128, bands = 32, threshold = 0.8, maxBucket = 64)
        val lex = lexPairs.select(col("doc_b").as("doc_id"))
          .unionByName(lexFams.filter(col("doc_id") > col("family_rep"))
            .select(col("doc_id")))
          .distinct()
          .withColumn("__lex", lit(true))
        val sem = Similarity.semanticDedup(emb(s, d), "vec_id", "embedding",
            "label", threshold = 0.45)
          .select(col("vec_id").as("doc_id"), (!col("is_kept")).as("__sem"))
        dd.select(col("doc_id"))
          .join(lex, Seq("doc_id"), "left")
          .join(sem, Seq("doc_id"), "left")
          .select(col("doc_id"),
            coalesce(col("__lex"), lit(false)).as("lex_dup"),
            col("__sem").isNotNull.as("has_embedding"),
            coalesce(col("__sem"), lit(false)).as("sem_dup"),
            (!(coalesce(col("__lex"), lit(false)) || coalesce(col("__sem"), lit(false))))
              .as("keep"))
      },
      Some(raw"""WITH sh AS (
             |  SELECT doc_id, list_distinct(list_transform(range(1, len(w) - 1),
             |           i -> w[i] || ' ' || w[i+1] || ' ' || w[i+2])) AS s
             |  FROM (SELECT doc_id, list_filter(regexp_split_to_array(text, '\s+'), t -> t <> '') AS w FROM documents)
             |  WHERE len(w) >= 3
${OracleSql.InvIndex}
             |), lex AS (
             |  -- inverted-index exact form (r8): any pair with jaccard > 0
             |  -- shares a shingle; same rows as the all-pairs join at index
             |  -- cost, not n² (i = 0 pairs absent, can't pass the threshold).
             |  SELECT DISTINCT ix.doc_b AS doc_id
             |  FROM (SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, count(*) AS i
             |        FROM inv a JOIN inv b ON a.g = b.g AND a.doc_id < b.doc_id
             |        GROUP BY 1, 2) ix
             |  JOIN sz sa ON sa.doc_id = ix.doc_a
             |  JOIN sz sb ON sb.doc_id = ix.doc_b
             |  WHERE i::DOUBLE / (sa.n + sb.n - i) >= 0.8
             |), sem AS (
             |  SELECT e.vec_id AS doc_id,
             |         EXISTS (SELECT 1 FROM embeddings p
             |                 WHERE p.label = e.label AND p.vec_id < e.vec_id
             |                   AND list_cosine_similarity(p.embedding::DOUBLE[], e.embedding::DOUBLE[]) >= 0.45) AS sem_dup
             |  FROM embeddings e
             |)
             |SELECT d.doc_id,
             |       l.doc_id IS NOT NULL AS lex_dup,
             |       s.doc_id IS NOT NULL AS has_embedding,
             |       coalesce(s.sem_dup, FALSE) AS sem_dup,
             |       NOT (l.doc_id IS NOT NULL OR coalesce(s.sem_dup, FALSE)) AS keep
             |FROM documents d
             |LEFT JOIN lex l ON d.doc_id = l.doc_id
             |LEFT JOIN sem s ON d.doc_id = s.doc_id""".stripMargin)),

    // flagship composition for the EMBEDDING tier (ext23 is the text
    // one): semantic-dedup keepers feed per-label int8 centroids in ONE
    // Catalyst plan — cluster-keyed pair join → verdict anti-join →
    // quantize-first centroid agg, no barrier between stages.
    "ext36_embed_pipeline" -> Q(
      (s, d) => {
        val e = emb(s, d)
        val keepers = Similarity.semanticDedup(e, "vec_id", "embedding",
            "label", threshold = 0.45)
          .filter(col("is_kept")).select(col("vec_id"))
        Similarity.centroidInt8(e.join(keepers, "vec_id"), "label", "embedding")
      },
      Some("""WITH kept AS (
             |  SELECT e.vec_id, e.label, e.embedding FROM embeddings e
             |  WHERE NOT EXISTS (
             |    SELECT 1 FROM embeddings p
             |    WHERE p.label = e.label AND p.vec_id < e.vec_id
             |      AND list_cosine_similarity(p.embedding::DOUBLE[], e.embedding::DOUBLE[]) >= 0.45)
             |), pr AS (
             |  SELECT label, embedding::DOUBLE[] AS e,
             |         list_max(list_transform(embedding::DOUBLE[], x -> abs(x))) AS s
             |  FROM kept
             |), q AS (
             |  SELECT label, CASE WHEN s = 0 THEN list_transform(e, x -> 0)
             |       ELSE list_transform(e, x -> CAST(floor(x / s * 127 + 0.5) AS INT)) END AS qv
             |  FROM pr
             |), ex AS (
             |  SELECT label, unnest(range(0, len(qv))) AS pos, unnest(qv) AS v FROM q
             |), ag AS (
             |  SELECT label, pos, sum(v) AS sv, count(*) AS n FROM ex GROUP BY 1, 2
             |)
             |SELECT label, CAST(max(n) AS BIGINT) AS n_vectors,
             |       string_agg(CAST(CAST(floor(sv::DOUBLE / n * 1000000 + 0.5) AS BIGINT) AS VARCHAR), ',' ORDER BY pos) AS centroid_e6_csv
             |FROM ag GROUP BY label""".stripMargin)),

    // duplicated-span detection (substring-dedup analog): maximal token
    // ranges covered by corpus-repeated 8-gram windows, merged via
    // gaps-and-islands — all integers, the oracle replays the span
    // arithmetic over string 8-grams (hash == string counts absent a
    // 64-bit collision, the ext03/ext32 identity).
    "ext38_dup_spans" -> Q(
      (s, d) => Dedup.dupSpans(docs(s, d), "doc_id", "text", n = 8),
      Some("""WITH t AS (
             |  SELECT doc_id, list_filter(regexp_split_to_array(text, '\s+'), x -> x <> '') AS w
             |  FROM documents
             |), g AS (
             |  SELECT doc_id, CAST(unnest(range(1, greatest(len(w) - 6, 1))) AS INT) AS pos, w
             |  FROM t
             |), kg AS (
             |  SELECT doc_id, pos, array_to_string(list_slice(w, pos, pos + 7), ' ') AS k
             |  FROM g
             |), cnt AS (
             |  SELECT k, count(*) AS c FROM kg GROUP BY 1
             |), d AS (
             |  SELECT doc_id, pos FROM kg JOIN cnt USING (k) WHERE c > 1
             |), isl AS (
             |  SELECT doc_id, pos,
             |         pos - row_number() OVER (PARTITION BY doc_id ORDER BY pos) AS grp
             |  FROM d
             |)
             |SELECT doc_id, CAST(min(pos) AS INT) AS span_start,
             |       count(*) AS n_windows, count(*) + 7 AS span_tokens
             |FROM isl GROUP BY doc_id, grp""".stripMargin)),

    // apply the duplicated spans: scrub every covered token from each
    // doc — the emit side of substring dedup; the oracle rebuilds the
    // scrubbed text from string 8-grams.
    // span-level decontamination: train docs (doc_id % 10 != 0) lose
    // exactly the tokens covered by an 8-gram that also occurs in the
    // benchmark side (doc_id % 10 = 0) — the keep-the-document policy
    // next to ext16's flag-the-document report. The oracle rebuilds the
    // scrubbed text from string 8-grams.
    "ext59_contamination_scrub" -> Q(
      (s, d) => {
        val all = docs(s, d)
        Dedup.scrubContaminated(
          all.filter(col("doc_id") % 10 =!= 0),
          all.filter(col("doc_id") % 10 === 0),
          "doc_id", "text", n = 8)
      },
      Some("""WITH t AS (
             |  SELECT doc_id, list_filter(regexp_split_to_array(text, '\s+'), x -> x <> '') AS w
             |  FROM documents WHERE doc_id % 10 <> 0
             |), bt AS (
             |  SELECT doc_id, list_filter(regexp_split_to_array(text, '\s+'), x -> x <> '') AS w
             |  FROM documents WHERE doc_id % 10 = 0
             |), kg AS (
             |  SELECT doc_id, pos, array_to_string(list_slice(w, pos, pos + 7), ' ') AS k
             |  FROM (SELECT doc_id, CAST(unnest(range(1, greatest(len(w) - 6, 1))) AS INT) AS pos, w FROM t)
             |), bk AS (
             |  SELECT DISTINCT array_to_string(list_slice(w, pos, pos + 7), ' ') AS k
             |  FROM (SELECT doc_id, CAST(unnest(range(1, greatest(len(w) - 6, 1))) AS INT) AS pos, w FROM bt)
             |), dd AS (
             |  SELECT doc_id, pos FROM kg WHERE k IN (SELECT k FROM bk)
             |), cov AS (
             |  SELECT DISTINCT doc_id, CAST(unnest(range(pos, pos + 8)) AS INT) AS pos FROM dd
             |), tok AS (
             |  SELECT doc_id, pos, w[pos] AS token
             |  FROM (SELECT doc_id, CAST(unnest(range(1, len(w) + 1)) AS INT) AS pos, w FROM t)
             |), kept AS (
             |  SELECT tok.doc_id, tok.pos, tok.token
             |  FROM tok LEFT JOIN cov ON tok.doc_id = cov.doc_id AND tok.pos = cov.pos
             |  WHERE cov.doc_id IS NULL
             |), ag AS (
             |  SELECT doc_id, string_agg(token, ' ' ORDER BY pos) AS scrubbed_text,
             |         count(*) AS n_tokens_kept
             |  FROM kept GROUP BY doc_id
             |), tot AS (
             |  SELECT doc_id, CAST(len(w) AS BIGINT) AS n FROM t
             |)
             |SELECT tot.doc_id,
             |       coalesce(ag.scrubbed_text, '') AS scrubbed_text,
             |       CAST(coalesce(ag.n_tokens_kept, 0) AS BIGINT) AS n_tokens_kept,
             |       CAST(tot.n - coalesce(ag.n_tokens_kept, 0) AS BIGINT) AS n_tokens_removed
             |FROM tot LEFT JOIN ag USING (doc_id)""".stripMargin)),

    "ext53_span_scrub" -> Q(
      (s, d) => Dedup.scrubDupSpans(docs(s, d), "doc_id", "text", n = 8),
      Some("""WITH t AS (
             |  SELECT doc_id, list_filter(regexp_split_to_array(text, '\s+'), x -> x <> '') AS w
             |  FROM documents
             |), g AS (
             |  SELECT doc_id, CAST(unnest(range(1, greatest(len(w) - 6, 1))) AS INT) AS pos, w
             |  FROM t
             |), kg AS (
             |  SELECT doc_id, pos, array_to_string(list_slice(w, pos, pos + 7), ' ') AS k
             |  FROM g
             |), cnt AS (
             |  SELECT k, count(*) AS c FROM kg GROUP BY 1
             |), dd AS (
             |  SELECT doc_id, pos FROM kg JOIN cnt USING (k) WHERE c > 1
             |), cov AS (
             |  SELECT DISTINCT doc_id, CAST(unnest(range(pos, pos + 8)) AS INT) AS pos FROM dd
             |), tk AS (
             |  SELECT doc_id, CAST(unnest(range(1, len(w) + 1)) AS INT) AS pos, w FROM t
             |), tok AS (
             |  SELECT doc_id, pos, w[pos] AS token FROM tk
             |), kept AS (
             |  SELECT tok.doc_id, tok.pos, tok.token
             |  FROM tok LEFT JOIN cov ON tok.doc_id = cov.doc_id AND tok.pos = cov.pos
             |  WHERE cov.doc_id IS NULL
             |), ag AS (
             |  SELECT doc_id, string_agg(token, ' ' ORDER BY pos) AS scrubbed_text,
             |         count(*) AS n_tokens_kept
             |  FROM kept GROUP BY doc_id
             |), tot AS (
             |  SELECT doc_id, CAST(len(w) AS BIGINT) AS n FROM t
             |)
             |SELECT tot.doc_id,
             |       coalesce(ag.scrubbed_text, '') AS scrubbed_text,
             |       CAST(coalesce(ag.n_tokens_kept, 0) AS BIGINT) AS n_tokens_kept,
             |       CAST(tot.n - coalesce(ag.n_tokens_kept, 0) AS BIGINT) AS n_tokens_removed
             |FROM tot LEFT JOIN ag USING (doc_id)""".stripMargin)),

    // signed-random-projection sketch: 64-dim float embeddings → 16
    // integer-micro components (JL dim reduction for the ANN tier).
    // Micro-quantize first so every projection is an exact INTEGER sum —
    // order-independent, so the oracle regenerates matrix and sketch from
    // scratch (md5-parity signs; the fixture's dim is 64 at every SF).
    "ext39_srp_sketch" -> Q(
      (s, d) => Similarity.srpSketch(emb(s, d), "vec_id", "embedding",
        outDim = 16, salt = "srp1"),
      Some("""WITH m AS (
             |  SELECT i, j,
             |         CASE WHEN ('0x' || substr(md5(i::VARCHAR || ':' || j::VARCHAR || ':srp1'), 1, 1))::BIGINT % 2 = 0
             |              THEN 1 ELSE -1 END AS s
             |  FROM range(16) r1(i), range(64) r2(j)
             |), e AS (
             |  SELECT vec_id,
             |         unnest(range(0, len(embedding))) AS j,
             |         CAST(floor(unnest(embedding::DOUBLE[]) * 1000000 + 0.5) AS BIGINT) AS xe6
             |  FROM embeddings
             |), p AS (
             |  SELECT vec_id, i, sum(xe6 * s) AS c
             |  FROM e JOIN m USING (j)
             |  GROUP BY vec_id, i
             |)
             |SELECT vec_id,
             |       string_agg(CAST(c AS VARCHAR), ',' ORDER BY i) AS sketch_e6_csv
             |FROM p GROUP BY vec_id""".stripMargin)),

    // product-quantization ADC top-k: 4-bit×8 codes + per-query lookup
    // tables — the FAISS-style compressed ANN scan. Approximate by
    // construction (learned codebooks have no cross-engine oracle):
    // rows-only here; SimilaritySpec pins determinism, code ranges, and
    // recall against the exact L2 ranking.
    "ext41_pq_topk" -> Q(
      (s, d) => {
        val e = emb(s, d)
        val model = Similarity.pqTrain(e, "vec_id", "embedding", m = 8, k = 16)
        Similarity.pqTopK(e, e.filter(col("vec_id") < 10), "vec_id", "embedding",
          kNN = 5, model = model)
      }),

    // exact containment (asymmetric-Jaccard) join: ordered near-subset
    // pairs |A∩B|/|A| ≥ 0.9 via one-sided prefix filtering; the oracle is
    // the all-pairs containment truth.
    "ext40_containment" -> Q(
      (s, d) => Dedup.containmentPairs(docs(s, d), "doc_id", "text",
        n = 3, threshold = 0.9),
      Some(raw"""WITH sh AS (
             |  SELECT doc_id, list_distinct(list_transform(range(1, len(w) - 1),
             |           i -> w[i] || ' ' || w[i+1] || ' ' || w[i+2])) AS s
             |  FROM (SELECT doc_id, list_filter(regexp_split_to_array(text, '\s+'), t -> t <> '') AS w FROM documents)
             |  WHERE len(w) >= 3
${OracleSql.InvIndex}
             |)
             |-- inverted-index exact form (r8): containment > 0 requires a
             |-- shared shingle; ordered pairs via a.doc_id <> b.doc_id.
             |-- Same rows as the all-pairs join at index cost, not n².
             |SELECT ix.doc_a, ix.doc_b, round(i::DOUBLE / sa.n, 6) AS containment
             |FROM (SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, count(*) AS i
             |      FROM inv a JOIN inv b ON a.g = b.g AND a.doc_id <> b.doc_id
             |      GROUP BY 1, 2) ix
             |JOIN sz sa ON sa.doc_id = ix.doc_a
             |WHERE i::DOUBLE / sa.n >= 0.9""".stripMargin)),

    // resize (keep every 3rd byte) then frame-sample (4-byte frames,
    // every 2nd) through the typed multimodal pipeline; the oracle
    // recomputes the same strided byte selection arithmetically.
    "ext13_multimodal_frames" -> Q(
      (s, d) => {
        import org.apache.spark.sql.Encoders
        val frames = Multimodal.frameSampleStub(
          Multimodal.resizeStub(
            Multimodal.toMedia(docs(s, d), "doc_id", "text", "source"), 3),
          frameBytes = 4, stride = 2)
        frames.map { f =>
          (f.doc_id, f.frame.map(b => (b & 0xff).toLong).sum)
        }(Encoders.tuple(Encoders.scalaLong, Encoders.scalaLong))
          .toDF("doc_id", "fsum")
          .groupBy(col("doc_id"))
          .agg(count(lit(1)).as("n_frames"), sum(col("fsum")).as("frame_byte_sum"))
      },
      Some("""WITH rs AS (
             |  SELECT doc_id,
             |         list_filter(list_transform(range(1, length(text) + 1),
             |           i -> CASE WHEN (i - 1) % 3 = 0 THEN ord(substr(text, i, 1)) END),
             |           x -> x IS NOT NULL) AS bytes
             |  FROM documents)
             |SELECT doc_id,
             |       CAST(((len(bytes) + 3) // 4 + 1) // 2 AS BIGINT) AS n_frames,
             |       CAST(list_sum(list_filter(list_transform(range(1, len(bytes) + 1),
             |         j -> CASE WHEN ((j - 1) // 4) % 2 = 0 THEN bytes[j] END),
             |         x -> x IS NOT NULL)) AS BIGINT) AS frame_byte_sum
             |FROM rs""".stripMargin)),

    // media dedup by downsampled-payload signature (thumbnail-hash
    // shape): plant byte-identical copies (doc_id % 25 re-labeled), keep
    // every 3rd byte via the resize stub, md5 the result — planted
    // copies collapse to one group (n_copies 2), everything else stays
    // singleton. The oracle rebuilds the downsampled string per doc.
    "ext49_media_dedup" -> Q(
      (s, d) => {
        val base = docs(s, d)
        val planted = base.select(col("doc_id"), col("text"), col("source"))
          .unionByName(base.filter(col("doc_id") % 25 === 0)
            .select((col("doc_id") + 500000).as("doc_id"), col("text"), col("source")))
        Multimodal.dedupBySignature(
          Multimodal.resizeStub(
            Multimodal.toMedia(planted, "doc_id", "text", "source"), 3))
      },
      Some("""WITH all_docs AS (
             |  SELECT doc_id, text FROM documents
             |  UNION ALL
             |  SELECT doc_id + 500000, text FROM documents WHERE doc_id % 25 = 0
             |), ds AS (
             |  SELECT doc_id,
             |         md5(array_to_string(list_filter(list_transform(range(1, length(text) + 1),
             |             i -> CASE WHEN (i - 1) % 3 = 0 THEN substr(text, i, 1) END),
             |           x -> x IS NOT NULL), '')) AS payload_sig
             |  FROM all_docs
             |)
             |SELECT payload_sig, min(doc_id) AS keeper_id, count(*) AS n_copies
             |FROM ds GROUP BY payload_sig""".stripMargin)),

    "ext09_multimodal" -> Q(
      (s, d) => Multimodal.featuresBySource(docs(s, d), "doc_id", "text", "source"),
      Some("""SELECT source, count(*) AS n_docs,
             |       CAST(sum(length(text)) AS BIGINT) AS total_bytes,
             |       CAST(sum(list_sum(list_transform(range(1, length(text) + 1),
             |              i -> ord(substr(text, i, 1))))) AS BIGINT) AS total_byte_sum
             |FROM documents GROUP BY source""".stripMargin)),

    // REAL image codec round-trip: plant an actual PNG per document
    // (geometry + two-tone red fill closed-form in doc_id), decode it
    // back through javax.imageio, and let the oracle recompute every
    // decoded property from the planting formula. The bytes cross a
    // genuine PNG encoder AND decoder — width/height/pixel sums can only
    // match if both ends actually work.
    "ext74_image_codec" -> Q(
      (s, d) => Multimodal.decodeImages(
          Multimodal.encodePng(docs(s, d), "doc_id", "source")).toDF()
        .select(col("doc_id"), col("width"), col("height"), col("n_pixels"),
          col("sum_red"), col("px_first_red"), col("px_last_red")),
      Some("""WITH p AS (
             |  SELECT doc_id,
             |         1 + doc_id % 16 AS w, 1 + doc_id % 8 AS h,
             |         doc_id % 256 AS a, (doc_id * 7 + 3) % 256 AS b,
             |         (1 + doc_id % 16) // 2 AS s
             |  FROM documents
             |)
             |SELECT doc_id,
             |       CAST(w AS INT) AS width, CAST(h AS INT) AS height,
             |       CAST(w * h AS BIGINT) AS n_pixels,
             |       CAST(h * (s * a + (w - s) * b) AS BIGINT) AS sum_red,
             |       CAST(CASE WHEN s > 0 THEN a ELSE b END AS INT) AS px_first_red,
             |       CAST(b AS INT) AS px_last_red
             |FROM p""".stripMargin)),

    // REAL audio codec round-trip: plant an actual WAV (RIFF/PCM 16-bit
    // mono) per document with every sample closed-form in doc_id, decode
    // it back through javax.sound.sampled, and let the oracle recompute
    // the container header fields and sample-level folds from the
    // planting formula — a genuine encoder AND parser must both work.
    "ext75_audio_codec" -> Q(
      (s, d) => Multimodal.decodeWav(
          Multimodal.encodeWav(docs(s, d), "doc_id", "source")).toDF()
        .select(col("doc_id"), col("sample_rate"), col("channels"),
          col("n_samples"), col("sum_samples"), col("peak_abs")),
      Some("""WITH p AS (
             |  SELECT doc_id, 100 + doc_id % 400 AS n FROM documents
             |)
             |SELECT doc_id,
             |       CAST(8000 AS INT) AS sample_rate,
             |       CAST(1 AS INT) AS channels,
             |       CAST(n AS BIGINT) AS n_samples,
             |       CAST(list_sum(list_transform(range(0, CAST(n AS BIGINT)),
             |              i -> ((doc_id * 31 + i * 7919) % 65536) - 32768)) AS BIGINT) AS sum_samples,
             |       CAST(list_max(list_transform(range(0, CAST(n AS BIGINT)),
             |              i -> abs(((doc_id * 31 + i * 7919) % 65536) - 32768))) AS INT) AS peak_abs
             |FROM p""".stripMargin)),

    // REAL multi-frame (video-analog) codec round-trip: plant an actual
    // animated GIF per document (frame count, geometry and each frame's
    // gray fill closed-form in doc_id; exact 256-gray palette so the
    // 8-bit indexed round-trip has NO quantization), then frame-sample
    // every 2nd frame through the genuine container parser — skipped
    // frames are never rasterized, which is the point of frame sampling.
    "ext76_frame_codec" -> Q(
      (s, d) => Multimodal.sampleGifFrames(
          Multimodal.encodeGif(docs(s, d), "doc_id", "source"), stride = 2).toDF()
        .select(col("doc_id"), col("frame_idx"), col("width"), col("height"),
          col("gray")),
      Some("""WITH p AS (
             |  SELECT doc_id, 2 + doc_id % 6 AS nf,
             |         CAST(1 + doc_id % 8 AS INT) AS w,
             |         CAST(1 + doc_id % 4 AS INT) AS h
             |  FROM documents
             |), f AS (
             |  SELECT doc_id, w, h, unnest(range(0, nf)) AS fi FROM p
             |)
             |SELECT doc_id, CAST(fi AS INT) AS frame_idx, w AS width, h AS height,
             |       CAST((doc_id * 17 + fi * 29) % 256 AS INT) AS gray
             |FROM f WHERE fi % 2 = 0""".stripMargin)),

    // VIDEO-level perceptual dedup: two clips are copies when their
    // SAMPLED-FRAME fingerprint sequences match — the multi-frame
    // extension of ext87's single-image perceptual dedup, and the
    // standard video-fingerprint shape (per-frame hash → ordered
    // signature → hash-keyed collapse). The signature is built from
    // frames DECODED by the real JDK GIF codec (stride-2 sampling
    // never rasterizes skipped frames), ordered by frame index, and
    // only the 32-char md5 crosses the shuffle — never pixels. Planted
    // copies at doc_id + 768·10⁴ are VISUALLY identical by the
    // generator's arithmetic (768 = lcm of the 256-gray, nf, w, h
    // cycles), so they collapse under the decoded-pixel signature
    // while remaining distinct ids; the oracle replays the whole
    // pipeline closed-form (frame grays from the planting formula,
    // the identical ordered string, the same md5).
    "ext115_video_dedup" -> Q(
      (s, d) => {
        val base = docs(s, d).select(col("doc_id"), col("source"))
        val planted = base.filter(col("doc_id") % 9 === 0)
          .select((col("doc_id") + 7680000L).as("doc_id"), col("source"))
        val media = Multimodal.encodeGif(
          base.unionByName(planted), "doc_id", "source")
        val frames = Multimodal.sampleGifFrames(media, stride = 2).toDF()
        val sigs = frames.groupBy(col("doc_id"))
          .agg(md5(concat_ws("|", expr(
            """transform(array_sort(collect_list(struct(frame_idx, width, height, gray))),
              |  x -> concat(x.frame_idx, ':', x.width, ':', x.height, ':', x.gray))"""
              .stripMargin))).as("payload_sig"))
        sigs.groupBy(col("payload_sig"))
          .agg(min(col("doc_id")).as("keeper_id"),
            count(lit(1)).as("n_copies"))
      },
      Some("""WITH ids AS (
             |  SELECT doc_id FROM documents
             |  UNION ALL
             |  SELECT doc_id + 7680000 FROM documents WHERE doc_id % 9 = 0
             |), p AS (
             |  SELECT doc_id, 2 + doc_id % 6 AS nf,
             |         1 + doc_id % 8 AS w, 1 + doc_id % 4 AS h
             |  FROM ids
             |), f AS (
             |  SELECT doc_id, w, h, unnest(range(0, nf)) AS fi FROM p
             |), s AS (
             |  SELECT doc_id,
             |         md5(string_agg(fi || ':' || w || ':' || h || ':' ||
             |               ((doc_id * 17 + fi * 29) % 256), '|' ORDER BY fi)) AS payload_sig
             |  FROM f WHERE fi % 2 = 0 GROUP BY doc_id
             |)
             |SELECT payload_sig, CAST(min(doc_id) AS BIGINT) AS keeper_id,
             |       CAST(count(*) AS BIGINT) AS n_copies
             |FROM s GROUP BY payload_sig""".stripMargin)),

    // Robust per-group outlier census via MAD (median absolute
    // deviation): the dispersion measure that outliers cannot poison —
    // mean/stddev z-scores move WITH the contamination they are meant
    // to find; the median and MAD have 50% breakdown. Composes the q86
    // sketch-bracketed exact-selection machinery TWICE (per-group
    // median of cents, then per-group median of |c − med|) — exact
    // order statistics with no global sort and no per-distinct-value
    // aggregate state, so the same plan shape holds on 100 TB of
    // prices/latencies. All arithmetic integer-exact (cents; the lower-
    // median rank floor(q·(n−1))+1 replays in the oracle); the final
    // census is one map-side-combined aggregate keyed on the group.
    "ext116_mad_outliers" -> Q(
      (s, d) => {
        val v = Tables.events(s, d)
          .filter(col("event_type").isNotNull && col("value").isNotNull)
          .select(col("event_type"),
            expr("CAST(floor(value * 100 + 0.5) AS BIGINT)").as("c"))
        val med = graft.operators.GlobalSort
          .exactPercentilesByGroup(v, "event_type", col("c"), Seq(0.5))
          .select(col("event_type"), col("value").cast("long").as("med_cents"))
        val dev = v.join(med, "event_type")
          .select(col("event_type"), abs(col("c") - col("med_cents")).as("ad"))
        val mad = graft.operators.GlobalSort
          .exactPercentilesByGroup(dev, "event_type", col("ad"), Seq(0.5))
          .select(col("event_type"), col("value").cast("long").as("mad_cents"))
        v.join(med, "event_type").join(mad, "event_type")
          .groupBy(col("event_type"), col("med_cents"), col("mad_cents"))
          .agg(count(lit(1)).as("n"),
            sum(when(abs(col("c") - col("med_cents")) > lit(3L) * col("mad_cents"),
              1L).otherwise(0L)).as("n_outliers"))
          .select(col("event_type"), col("med_cents"), col("mad_cents"),
            col("n"), col("n_outliers"))
      },
      Some("""WITH v AS (
             |  SELECT event_type, CAST(floor(value * 100 + 0.5) AS BIGINT) AS c
             |  FROM events WHERE event_type IS NOT NULL AND value IS NOT NULL
             |), n1 AS (
             |  SELECT event_type, count(*) AS n FROM v GROUP BY 1
             |), s1 AS (
             |  SELECT event_type, c,
             |         row_number() OVER (PARTITION BY event_type ORDER BY c) AS rn
             |  FROM v
             |), med AS (
             |  SELECT s1.event_type, s1.c AS med_cents
             |  FROM s1 JOIN n1 USING (event_type)
             |  WHERE rn = CAST(floor(0.5 * (n - 1)) AS BIGINT) + 1
             |), dv AS (
             |  SELECT v.event_type, abs(v.c - med.med_cents) AS ad
             |  FROM v JOIN med USING (event_type)
             |), s2 AS (
             |  SELECT event_type, ad,
             |         row_number() OVER (PARTITION BY event_type ORDER BY ad) AS rn
             |  FROM dv
             |), mad AS (
             |  SELECT s2.event_type, s2.ad AS mad_cents
             |  FROM s2 JOIN n1 USING (event_type)
             |  WHERE rn = CAST(floor(0.5 * (n - 1)) AS BIGINT) + 1
             |)
             |SELECT v.event_type, med.med_cents, mad.mad_cents,
             |       CAST(count(*) AS BIGINT) AS n,
             |       CAST(sum(CASE WHEN abs(v.c - med.med_cents) > 3 * mad.mad_cents
             |                     THEN 1 ELSE 0 END) AS BIGINT) AS n_outliers
             |FROM v JOIN med USING (event_type) JOIN mad USING (event_type)
             |GROUP BY 1, 2, 3""".stripMargin)),

    // URL canonicalization — the Common-Crawl dedup/cap key. Planted
    // rows (the ext29 discipline) exercise every canonical rule: case
    // folding, default vs explicit ports, tracking params, fragments,
    // trailing slashes, prose punctuation; the corpus rides through the
    // same extraction scan (zero matches — vocabulary text). The oracle
    // replays the entire string pipeline step for step in DuckDB.
    "ext77_url_canon" -> Q(
      (s, d) => {
        import s.implicits._
        val planted = Seq(
          (-1L, "see HTTPS://Example.COM:443/Path/To/Page/?utm_source=x&id=9#frag " +
            "and http://foo.bar:8080/a?x=1&utm_campaign=z&y=2."),
          (-2L, "plain http://example.com/ then http://example.com " +
            "and dup HTTP://EXAMPLE.com/?fbclid=abc"),
          (-3L, "no links in this row at all"),
          (-4L, "mid http://a.b/c/d/?ref=h, tail http://a.b/c/d")
        ).toDF("doc_id", "text")
        TextAnalysis.urlCanon(
          docs(s, d).select(col("doc_id"), col("text")).unionByName(planted),
          "doc_id", "text")
      },
      Some("""WITH corpus AS (
             |  SELECT doc_id, text FROM documents
             |  UNION ALL
             |  SELECT * FROM (VALUES
             |    (CAST(-1 AS BIGINT), 'see HTTPS://Example.COM:443/Path/To/Page/?utm_source=x&id=9#frag and http://foo.bar:8080/a?x=1&utm_campaign=z&y=2.'),
             |    (CAST(-2 AS BIGINT), 'plain http://example.com/ then http://example.com and dup HTTP://EXAMPLE.com/?fbclid=abc'),
             |    (CAST(-3 AS BIGINT), 'no links in this row at all'),
             |    (CAST(-4 AS BIGINT), 'mid http://a.b/c/d/?ref=h, tail http://a.b/c/d')
             |  ) v(doc_id, text)
             |), arrs AS (
             |  SELECT doc_id, regexp_extract_all(text, '(?i)\bhttps?://\S+') AS us
             |  FROM corpus
             |), m AS (
             |  SELECT doc_id, unnest(list_transform(range(1, len(us) + 1),
             |    i -> {'p': i - 1, 'u': us[i]})) AS z
             |  FROM arrs
             |), r AS (
             |  SELECT doc_id, CAST(z.p AS BIGINT) AS url_pos,
             |         regexp_replace(z.u, '[.,;:!?)\]''"]+$', '') AS url_raw
             |  FROM m
             |), parts AS (
             |  SELECT doc_id, url_pos, url_raw,
             |         split_part(url_raw, '#', 1) AS nf
             |  FROM r
             |), pq AS (
             |  SELECT *, split_part(nf, '?', 1) AS base,
             |         CASE WHEN strpos(nf, '?') > 0
             |              THEN substring(nf, length(split_part(nf, '?', 1)) + 2)
             |              ELSE '' END AS q
             |  FROM parts
             |), host AS (
             |  SELECT *, lower(split_part(base, '://', 1)) AS scheme,
             |         substring(base, length(split_part(base, '://', 1)) + 4) AS rest
             |  FROM pq
             |), hp AS (
             |  SELECT *, split_part(rest, '/', 1) AS hostport,
             |         regexp_replace(substring(rest, length(split_part(rest, '/', 1)) + 1), '/+$', '') AS path
             |  FROM host
             |), prt AS (
             |  SELECT *, lower(split_part(hostport, ':', 1)) AS h,
             |         CASE WHEN strpos(hostport, ':') > 0
             |              THEN substring(hostport, length(split_part(hostport, ':', 1)) + 2)
             |              ELSE '' END AS port0
             |  FROM hp
             |), prt2 AS (
             |  SELECT *, CASE WHEN (scheme = 'http' AND port0 = '80')
             |                   OR (scheme = 'https' AND port0 = '443')
             |                 THEN '' ELSE port0 END AS port
             |  FROM prt
             |), qp AS (
             |  SELECT *, list_filter(string_split(q, '&'), p -> p <> '') AS params
             |  FROM prt2
             |), qk AS (
             |  SELECT *, list_filter(params, p -> NOT regexp_matches(
             |           split_part(p, '=', 1), '^(utm_[^=]*|gclid|fbclid|ref)$')) AS kept
             |  FROM qp
             |)
             |SELECT doc_id, url_pos, url_raw,
             |       scheme || '://' || h ||
             |       (CASE WHEN port <> '' THEN ':' || port ELSE '' END) ||
             |       path ||
             |       (CASE WHEN len(kept) > 0 THEN '?' || array_to_string(kept, '&') ELSE '' END)
             |         AS canonical_url,
             |       h AS host,
             |       CAST(len(params) - len(kept) AS BIGINT) AS n_dropped_params
             |FROM qk""".stripMargin)),

    // PageRank centrality over the within-label kNN similarity graph
    // (the ext67 edge set) — power iteration in exact micro-unit integer
    // arithmetic, so the oracle replays all 10 iterations bit-for-bit
    // (each unrolled as one chained CTE: recursive terms can't aggregate).
    // Every sum is CAST-pinned to BIGINT (the ext24 discipline).
    "ext79_pagerank" -> Q(
      (s, d) => graft.operators.Graph.pageRank(
        Similarity.knnGraph(emb(s, d), "vec_id", "embedding", "label", 3),
        "src", "nid", iters = 10),
      Some(pageRankOracle(iters = 10))),

    // ext79's SCALE PATH, end-to-end oracled: the within-label kNN edge
    // build is the quadratic piece (ScaleCheck: ~19× at 10× data as
    // label populations grow) — here the edge list comes from the
    // SRP-LSH ANN instead (ext83's fully-replayable hash family, corpus
    // as its own query side: equality-keyed bucket join, never
    // all-pairs), and the SAME integer PageRank runs over it. The plane
    // count is CORPUS-ADAPTIVE — smallest p in [4, 16] with
    // 32·2^p ≥ n, i.e. mean bucket occupancy held at ≤ 32 — because a
    // FIXED plane count is itself a scale bug: the first ext91 ran 6
    // planes at every size and ScaleCheck measured 35× at 10× data as
    // 64 buckets concentrated (pure integer sizing, so both engines
    // pick the same p; the one count() it costs is an index-build-time
    // decision). Bucket ids, probes, candidate ranking AND all 10 power
    // iterations replay in SQL, so the scale path keeps the full value
    // oracle at every corpus size.
    "ext91_pagerank_lsh" -> Q(
      (s, d) => {
        val e = emb(s, d)
        val planes = Similarity.srpPlanesFor(e.count())
        val edges = Similarity.annTopKSrp(e, e, "vec_id", "embedding",
            k = 3, nPlanes = planes, salt = "pr1")
          .select(col("qid").as("src"), col("nid"))
        graft.operators.Graph.pageRank(edges, "src", "nid", iters = 10)
      },
      Some(pageRankLshOracle(iters = 10))),

    // WordPiece inference (greedy longest-match subword tokenization)
    // over the corpus with a fixed piece vocabulary — the native
    // `greedy_pieces` expression. `pieces_sig` pins the md5 of each
    // document's ENTIRE piece sequence, so the oracle (a recursive CTE
    // replaying the greedy matcher per distinct word, reassembled per
    // doc) must reproduce every segmentation decision, not just counts.
    // Planted rows exercise the `<unk>` code-point fallback (uppercase,
    // accents, digits are outside the vocabulary).
    "ext78_wordpiece" -> Q(
      (s, d) => {
        import s.implicits._
        val planted = Seq(
          (-1L, "naïve café 123"),
          (-2L, "TableTABLE tablet")
        ).toDF("doc_id", "text")
        TextAnalysis.wordpiece(
          docs(s, d).select(col("doc_id"), col("text")).unionByName(planted),
          "doc_id", "text", pieceVocab)
      },
      Some(s"""WITH RECURSIVE corpus AS (
             |  SELECT doc_id, text FROM documents
             |  UNION ALL
             |  SELECT * FROM (VALUES
             |    (CAST(-1 AS BIGINT), 'naïve café 123'),
             |    (CAST(-2 AS BIGINT), 'TableTABLE tablet')
             |  ) v(doc_id, text)
             |), vocab(piece) AS (
             |  VALUES ${pieceVocab.map(p => s"('$p')").mkString(", ")}
             |), dw AS (
             |  SELECT doc_id, unnest(list_transform(range(1, len(ws) + 1),
             |    i -> {'i': i, 'w': ws[i]})) AS z
             |  FROM (SELECT doc_id,
             |          list_filter(regexp_split_to_array(trim(text), '\\s+'), x -> x <> '') AS ws
             |        FROM corpus)
             |), dwf AS (
             |  SELECT doc_id, CAST(z.i AS BIGINT) AS widx, z.w AS word FROM dw
             |), words AS (SELECT DISTINCT word FROM dwf
             |), wpos AS (
             |  SELECT word, unnest(range(1, length(word) + 1)) AS pos FROM words
             |), lmax AS (
             |  SELECT w.word, w.pos, max(length(v.piece)) AS l
             |  FROM wpos w JOIN vocab v
             |    ON substring(w.word, CAST(w.pos AS INT), length(v.piece)) = v.piece
             |  GROUP BY w.word, w.pos
             |), lall AS (
             |  SELECT w.word, w.pos, coalesce(l.l, 0) AS l
             |  FROM wpos w LEFT JOIN lmax l ON w.word = l.word AND w.pos = l.pos
             |), seg AS (
             |  SELECT word, CAST(1 AS BIGINT) AS pos, 0 AS np, 0 AS nu, '' AS acc
             |  FROM words
             |  UNION ALL
             |  SELECT s.word, s.pos + (CASE WHEN la.l > 0 THEN la.l ELSE 1 END),
             |         s.np + 1, s.nu + (CASE WHEN la.l > 0 THEN 0 ELSE 1 END),
             |         s.acc || (CASE WHEN s.acc = '' THEN '' ELSE ' ' END) ||
             |           (CASE WHEN la.l > 0
             |                 THEN substring(s.word, CAST(s.pos AS INT), la.l)
             |                 ELSE '<unk>' END)
             |  FROM seg s JOIN lall la ON la.word = s.word AND la.pos = s.pos
             |  WHERE s.pos <= length(s.word)
             |), wordseg AS (
             |  SELECT word, np, nu, acc FROM seg WHERE pos = length(word) + 1
             |)
             |SELECT d.doc_id, CAST(sum(ws.np) AS BIGINT) AS n_pieces,
             |       CAST(sum(ws.nu) AS BIGINT) AS n_unk,
             |       md5(string_agg(ws.acc, ' ' ORDER BY d.widx)) AS pieces_sig
             |FROM dwf d JOIN wordseg ws ON ws.word = d.word
             |GROUP BY d.doc_id""".stripMargin)),

    // content-defined chunking: the DuckDB side replays tokenization, the
    // md5-prefix gear hash, every cut decision, and each chunk's
    // reassembled text + content hash — the full boundary arithmetic,
    // not just row counts.
    "ext61_cdc_chunks" -> Q(
      (s, d) => TextAnalysis.cdcChunks(docs(s, d), "doc_id", "text",
        window = 4, divisor = 8),
      Some("""WITH t AS (
             |  SELECT doc_id,
             |         list_filter(regexp_split_to_array(trim(text), '\s+'), x -> x <> '') AS tk
             |  FROM documents
             |), nz AS (
             |  SELECT doc_id, tk, len(tk) AS n FROM t WHERE len(tk) > 0
             |), b AS (
             |  SELECT doc_id, tk, n,
             |         list_filter(range(4, n), p ->
             |           ('0x' || substr(md5(array_to_string(tk[p-3:p], ' ')), 1, 8))::BIGINT % 8 = 0) AS bp
             |  FROM nz
             |), st AS (
             |  SELECT doc_id, tk, n, bp,
             |         list_prepend(1, list_transform(bp, x -> x + 1)) AS starts
             |  FROM b
             |), ch AS (
             |  SELECT doc_id, tk, n, bp, starts,
             |         unnest(range(1, len(starts) + 1)) AS i
             |  FROM st
             |)
             |SELECT doc_id, CAST(i AS INT) AS chunk_idx,
             |       CAST(starts[i] AS INT) AS start_pos,
             |       CAST((CASE WHEN i <= len(bp) THEN bp[i] ELSE n END) - starts[i] + 1 AS INT) AS n_chunk_tokens,
             |       md5(array_to_string(tk[starts[i]:(CASE WHEN i <= len(bp) THEN bp[i] ELSE n END)], ' ')) AS chunk_hash,
             |       array_to_string(tk[starts[i]:(CASE WHEN i <= len(bp) THEN bp[i] ELSE n END)], ' ') AS chunk_text
             |FROM ch""".stripMargin)),

    // per-domain cap: rank inside each source by (n_chars DESC, doc_id)
    // — a total order — and keep the top 20; the oracle replays the
    // rank, not just membership.
    "ext62_domain_cap" -> Q(
      (s, d) => Sampling.groupCap(docs(s, d), "source", 20,
          Seq(col("n_chars").desc, col("doc_id")))
        .select(col("doc_id"), col("source"), col("n_chars"), col("cap_rank")),
      Some("""SELECT doc_id, source, n_chars, CAST(cap_rank AS INT) AS cap_rank FROM (
             |  SELECT doc_id, source, n_chars,
             |         row_number() OVER (PARTITION BY source
             |                            ORDER BY n_chars DESC, doc_id) AS cap_rank
             |  FROM documents)
             |WHERE cap_rank <= 20""".stripMargin)),

    // deterministic training shuffle: the oracle replays the md5
    // permutation, the global row number, and the shard arithmetic.
    "ext63_corpus_shuffle" -> Q(
      (s, d) => Sampling.shuffleShards(docs(s, d), "doc_id",
        salt = "epoch0", shardSize = 64L),
      Some("""WITH r AS (
             |  SELECT doc_id,
             |         md5(CAST(doc_id AS VARCHAR) || ':epoch0') AS shuffle_key,
             |         row_number() OVER (
             |           ORDER BY md5(CAST(doc_id AS VARCHAR) || ':epoch0'), doc_id) AS rn
             |  FROM documents
             |)
             |SELECT doc_id, shuffle_key,
             |       CAST((rn - 1) // 64 AS BIGINT) AS shard,
             |       CAST((rn - 1) % 64 AS BIGINT) AS shard_pos
             |FROM r""".stripMargin)),

    // exact MIPS top-k (dot-product retrieval): the oracle replays the
    // inner product per pair and the (dot DESC, nid) ranking.
    "ext66_mips_topk" -> Q(
      (s, d) => {
        val e = emb(s, d)
        Similarity.mipsTopK(e, e.filter(col("vec_id") < 10), "vec_id", "embedding", 5)
      },
      Some("""WITH sim AS (
             |  SELECT q.vec_id AS qid, e.vec_id AS nid,
             |         round(list_inner_product(q.embedding::DOUBLE[], e.embedding::DOUBLE[]), 6) AS dot
             |  FROM embeddings q JOIN embeddings e ON q.vec_id < 10 AND e.vec_id <> q.vec_id
             |)
             |SELECT qid, CAST(rnk AS BIGINT) AS rnk, nid, dot FROM (
             |  SELECT qid, nid, dot,
             |         row_number() OVER (PARTITION BY qid ORDER BY dot DESC, nid) AS rnk
             |  FROM sim) WHERE rnk <= 5""".stripMargin)),

    // within-cluster exact kNN graph: the oracle replays every in-label
    // pair's cosine and the (cosine DESC, nid) edge ranking.
    "ext67_knn_graph" -> Q(
      (s, d) => Similarity.knnGraph(emb(s, d), "vec_id", "embedding", "label", 3),
      Some("""WITH sim AS (
             |  SELECT a.vec_id AS src, b.vec_id AS nid,
             |         round(list_cosine_similarity(a.embedding::DOUBLE[], b.embedding::DOUBLE[]), 6) AS cosine
             |  FROM embeddings a JOIN embeddings b
             |    ON a.label = b.label AND a.vec_id <> b.vec_id
             |)
             |SELECT src, CAST(rnk AS BIGINT) AS rnk, nid, cosine FROM (
             |  SELECT src, nid, cosine,
             |         row_number() OVER (PARTITION BY src ORDER BY cosine DESC, nid) AS rnk
             |  FROM sim) WHERE rnk <= 3""".stripMargin)),

    // Mutual (reciprocal) kNN pairs: the hub-resistant edge filter over
    // ext67's within-label top-3 graph — a pair survives only if each
    // endpoint ranks the other. The oracle ranks both directions and
    // keeps pairs present both ways.
    "ext121_mutual_knn" -> Q(
      (s, d) => Similarity.mutualKnn(emb(s, d), "vec_id", "embedding",
        "label", 3),
      Some("""WITH sim AS (
             |  SELECT a.vec_id AS src, b.vec_id AS nid,
             |         round(list_cosine_similarity(a.embedding::DOUBLE[], b.embedding::DOUBLE[]), 6) AS cosine
             |  FROM embeddings a JOIN embeddings b
             |    ON a.label = b.label AND a.vec_id <> b.vec_id
             |), g AS (
             |  SELECT src, nid, cosine FROM (
             |    SELECT src, nid, cosine,
             |           row_number() OVER (PARTITION BY src ORDER BY cosine DESC, nid) AS rnk
             |    FROM sim) WHERE rnk <= 3
             |)
             |SELECT a.src AS doc_a, a.nid AS doc_b, a.cosine
             |FROM g a JOIN g b ON a.src = b.nid AND a.nid = b.src
             |WHERE a.src < a.nid""".stripMargin)),

    // Mutual kNN with the ext89 bucket-cap discipline applied to CELLS
    // (r11 verdict #2: ext121's per-cell quadratic read 54.7x at 10x
    // with no guard): the planted 300-vector cell exceeds the 256 cap
    // and is never pair-joined (300² scorings avoided) — its members
    // return in the capped report with exact accounting; natural cells
    // pass the cap and their mutual pairs are IDENTICAL to ext121's on
    // that corpus (SimilaritySpec pins the below-cap equality). A
    // NATURAL cell over the cap gets the self-describing UNEXPECTED
    // kind (the ext89 fixture-drift discipline), not a silent skip.
    "ext154_mutual_knn_capped" -> Q(
      (s, d) => {
        import s.implicits._
        val planted = (1 to 300).map(i =>
          (-i.toLong, Array.fill(64)(0.5f), -1)).toDF("vec_id", "embedding", "label")
        val corpus = emb(s, d).unionByName(planted)
        val (pairs, capped) = Similarity.mutualKnnCapped(
          corpus, "vec_id", "embedding", "label", 3, maxCell = 256)
        pairs.select(lit("pair").as("kind"), col("doc_a"), col("doc_b"), col("cosine"))
          .unionByName(capped.select(
            when(col("cell") < 0, "capped")
              .otherwise("UNEXPECTED_natural_cell_over_cap").as("kind"),
            col("id").as("doc_a"),
            col("cell_size").as("doc_b"),
            col("cell").cast("double").as("cosine")))
      },
      Some("""WITH cells AS (
             |  SELECT label, count(*) AS cs FROM embeddings
             |  WHERE label IS NOT NULL GROUP BY 1
             |), sim AS (
             |  SELECT a.vec_id AS src, b.vec_id AS nid,
             |         round(list_cosine_similarity(a.embedding::DOUBLE[], b.embedding::DOUBLE[]), 6) AS cosine
             |  FROM embeddings a JOIN embeddings b
             |    ON a.label = b.label AND a.vec_id <> b.vec_id
             |  JOIN cells c ON c.label = a.label AND c.cs <= 256
             |), g AS (
             |  SELECT src, nid, cosine FROM (
             |    SELECT src, nid, cosine,
             |           row_number() OVER (PARTITION BY src ORDER BY cosine DESC, nid) AS rnk
             |    FROM sim) WHERE rnk <= 3
             |)
             |SELECT 'pair' AS kind, a.src AS doc_a, a.nid AS doc_b, a.cosine
             |FROM g a JOIN g b ON a.src = b.nid AND a.nid = b.src
             |WHERE a.src < a.nid
             |UNION ALL
             |SELECT 'capped', -CAST(i AS BIGINT), CAST(300 AS BIGINT), CAST(-1 AS DOUBLE)
             |FROM range(1, 301) r(i)""".stripMargin)),

    // Embedding-space drift: pairwise distances between per-label mean
    // embeddings — the geometric complement to ext122's token drift.
    // One µ-quantized sum pass; mean rounds once; pairwise squared L2 /
    // dot over the rounded micro means are exact longs.
    "ext129_embedding_drift" -> Q(
      (s, d) => Similarity.embeddingDrift(emb(s, d), "label", "embedding"),
      Some("""WITH ex AS (
             |  SELECT CAST(label AS VARCHAR) AS slice,
             |         unnest(range(0, len(embedding))) AS pos,
             |         CAST(floor(unnest(embedding::DOUBLE[]) * 1000000 + 0.5) AS BIGINT) AS v
             |  FROM embeddings
             |  WHERE label IS NOT NULL AND embedding IS NOT NULL AND len(embedding) > 0
             |), m AS (
             |  SELECT slice, pos,
             |         CAST(floor(sum(v)::DOUBLE / count(*) + 0.5) AS BIGINT) AS m,
             |         count(*) AS n
             |  FROM ex GROUP BY 1, 2
             |), nn AS (SELECT slice, max(n) AS n FROM m GROUP BY 1
             |), pairs AS (
             |  SELECT a.slice AS slice_a, b.slice AS slice_b FROM nn a, nn b
             |  WHERE a.slice < b.slice
             |), dims AS (
             |  -- union of the two slices' dimension sets (a dimension held
             |  -- by one side only contributes its full mass — the Spark
             |  -- side's getOrElse-0 semantics; an inner join would drop it)
             |  SELECT p.slice_a, p.slice_b, d.pos FROM pairs p
             |  JOIN (SELECT DISTINCT slice, pos FROM m) d
             |    ON d.slice = p.slice_a OR d.slice = p.slice_b
             |  GROUP BY 1, 2, 3
             |)
             |SELECT d.slice_a, d.slice_b,
             |       CAST(na.n AS BIGINT) AS n_a, CAST(nb.n AS BIGINT) AS n_b,
             |       CAST(sum((coalesce(a.m, 0) - coalesce(b.m, 0)) * (coalesce(a.m, 0) - coalesce(b.m, 0))) AS BIGINT) AS dist2_e12,
             |       CAST(sum(coalesce(a.m, 0) * coalesce(b.m, 0)) AS BIGINT) AS dot_e12
             |FROM dims d
             |LEFT JOIN m a ON a.slice = d.slice_a AND a.pos = d.pos
             |LEFT JOIN m b ON b.slice = d.slice_b AND b.pos = d.pos
             |JOIN nn na ON na.slice = d.slice_a
             |JOIN nn nb ON nb.slice = d.slice_b
             |GROUP BY 1, 2, 3, 4""".stripMargin)),

    // DynamicFrame "choice"-type resolution over VARIANT (closes SURVEY
    // "what's missing" #3): a field that drifts number/string/absent per
    // record, collapsed with the public Glue strategy set — make_cols
    // (actual-type split), cast:long (+conflict flag for the quarantine
    // pass), project:string (actual type, not castability). The JSON is
    // synthesized closed-form from events (the st31 discipline) so the
    // oracle re-derives every output without parsing anything.
    "ext132_choice_resolution" -> Q(
      (s, d) => {
        val drifted = Tables.events(s, d).selectExpr(
          "event_id",
          """CASE CAST(event_id % 3 AS INT)
               WHEN 0 THEN concat('{"id":', CAST(event_id AS STRING),
                                  ',"v":', CAST(CAST(floor(value * 100 + 0.5) AS BIGINT) AS STRING), '}')
               WHEN 1 THEN concat('{"id":', CAST(event_id AS STRING),
                                  ',"v":"', event_type, '"}')
               ELSE concat('{"id":', CAST(event_id AS STRING), '}')
             END AS j""")
          .select(col("event_id"), parse_json(col("j")).as("var"))
        val mc = graft.sources.ChoiceResolver.makeCols(
          drifted, "var", "v", Seq("long", "string"))
        val ct = graft.sources.ChoiceResolver.castTo(mc, "var", "v", "long")
          .withColumnRenamed("v", "cast_long")
          .withColumnRenamed("v_conflict", "cast_conflict")
        graft.sources.ChoiceResolver.project(ct, "var", "v", "string")
          .withColumnRenamed("v", "proj_string")
          .select(col("event_id"), col("v_long"), col("v_string"),
            col("cast_long"), col("cast_conflict"), col("proj_string"))
      },
      Some("""SELECT event_id,
             |       CASE WHEN event_id % 3 = 0 THEN CAST(floor(value * 100 + 0.5) AS BIGINT) END AS v_long,
             |       CASE WHEN event_id % 3 = 1 THEN event_type END AS v_string,
             |       CASE WHEN event_id % 3 = 0 THEN CAST(floor(value * 100 + 0.5) AS BIGINT) END AS cast_long,
             |       (event_id % 3 = 1) AS cast_conflict,
             |       CASE WHEN event_id % 3 = 1 THEN event_type END AS proj_string
             |FROM events""".stripMargin)),

    // Iterative BPE training (8 merge rounds over the word dictionary)
    // — completes the tokenizer-training story ext47 opens (ext47 IS
    // iteration 1). The oracle unrolls all 8 count→argmax→merge rounds
    // as CTE blocks; the wrapped-symbol string representation makes
    // each merge a plain `replace`, identical in both engines.
    "ext130_bpe_train" -> Q(
      (s, d) => TextAnalysis.bpeTrain(docs(s, d), "doc_id", "text", iters = 8),
      Some(bpeTrainOracle(8))),

    // train -> APPLY: segment every document with the 8 learned merges
    // (k chained codegen'd replaces in one narrow projection — the
    // 100 TB apply pass is a single linear scan) and report per-doc
    // subword fragmentation, the vocab-size / out-of-domain signal.
    "ext131_bpe_segment" -> Q(
      (s, d) => TextAnalysis.bpeSegment(docs(s, d), "doc_id", "text", iters = 8),
      Some(bpeSegmentOracle(8))),

    // CDC-driven incremental dedup: the versioned documents table gets a
    // v2 append; the consumer reads ONLY the appended rows
    // (changesBetween — file-level metadata, no table rescan) and flags
    // each arrival whose content fingerprint already exists in the v1
    // snapshot. The 100 TB daily-fold shape: the arrival slice comes
    // straight off the commit log (work ∝ arrivals on the read side),
    // and the probe is an equality join on the 16-byte fingerprint —
    // shuffle ∝ fingerprints, AQE broadcasts when the day is small.
    "ext133_cdc_dedup" -> Q(
      (s, d) => {
        val base = s"/tmp/graft-fw/${d.replaceAll("[^A-Za-z0-9]", "_")}/ext133"
        val root = new org.apache.hadoop.fs.Path(base)
        val fs = root.getFileSystem(s.sparkContext.hadoopConfiguration)
        if (fs.exists(root)) fs.delete(root, true)
        val all = docs(s, d).select(col("doc_id"), col("text"))
        graft.sinks.VersionedTable.commit(s, base,
          all.filter(col("doc_id") % 2 === 0), "overwrite")
        graft.sinks.VersionedTable.commit(s, base,
          all.filter(col("doc_id") % 2 === 1), "append")
        val known = graft.sinks.VersionedTable.read(s, base, asOf = Some(1L))
          .select(md5(col("text")).as("f")).distinct()
        val arrivals = graft.sinks.VersionedTable.changesBetween(s, base, 1L, 2L)
          .select(col("doc_id"), md5(col("text")).as("f"))
        arrivals.join(known.withColumn("__k", lit(1)), Seq("f"), "left")
          .select(col("doc_id"), col("__k").isNotNull.as("is_known_dup"))
      },
      Some("""WITH known AS (
             |  SELECT DISTINCT md5(text) AS f FROM documents WHERE doc_id % 2 = 0
             |)
             |SELECT d.doc_id,
             |       (k.f IS NOT NULL) AS is_known_dup
             |FROM documents d LEFT JOIN known k ON md5(d.text) = k.f
             |WHERE d.doc_id % 2 = 1""".stripMargin)),

    // Targeted data selection (the DSIR move, integer-exact): score
    // every out-of-domain doc by hashed-unigram histogram intersection
    // with the in-domain sample (doc_id % 10 = 0). 1000 = identical
    // token distribution, 0 = disjoint. The target histogram (<=10000
    // buckets) broadcasts; the corpus side is explode + two
    // doc-partitioned exchanges — work linear in corpus tokens.
    "ext134_domain_affinity" -> Q(
      (s, d) => {
        val all = docs(s, d)
        TextAnalysis.domainAffinity(
          all.filter(col("doc_id") % 10 =!= 0),
          all.filter(col("doc_id") % 10 === 0),
          "doc_id", "text")
      },
      Some(s"""WITH $DomainAffinityCte
             |SELECT doc_id, n_tokens, overlap_num, affinity_milli
             |FROM aff""".stripMargin)),

    // The SELECTION step on top of ext134: the best-first token-budget
    // prefix — order by (affinity DESC, md5 permutation, doc_id), keep
    // rows while the running token total fits the 5000-token budget.
    // Ties at the cut are sampled uniformly (the hash), not truncated
    // by id. Scale: priorityBudgetSample's (priority, hash-sub-bucket)
    // prefix-sum machinery — per-task window state is one sub-bucket,
    // never the corpus; whole buckets past the budget pruned pre-sort.
    "ext135_affinity_select" -> Q(
      (s, d) => {
        val all = docs(s, d)
        val scored = TextAnalysis.domainAffinity(
          all.filter(col("doc_id") % 10 =!= 0),
          all.filter(col("doc_id") % 10 === 0),
          "doc_id", "text")
        Sampling.priorityBudgetSample(scored, "doc_id", "affinity_milli",
          "n_tokens", budgetTokens = 5000L, salt = "sel")
      },
      Some(s"""WITH $DomainAffinityCte,
             |sel AS (
             |  SELECT doc_id, affinity_milli, n_tokens,
             |         sum(n_tokens) OVER (
             |           ORDER BY affinity_milli DESC,
             |                    md5(doc_id::VARCHAR || ':sel'), doc_id
             |           ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum
             |  FROM aff
             |)
             |SELECT doc_id, CAST(affinity_milli AS BIGINT) AS affinity_milli,
             |       CAST(n_tokens AS BIGINT) AS n_tokens,
             |       CAST(cum AS BIGINT) AS cum_tokens
             |FROM sel WHERE cum <= 5000""".stripMargin)),

    // The data-mixing REPORT the affinity family feeds: per source —
    // corpus share, token mass, mean affinity to the target domain, and
    // how many docs the ext135 budget selection actually took. The
    // per-source mean-affinity column is the signal that drives source
    // REWEIGHTING (lift high-affinity sources); the n_selected column
    // audits what the budget cut actually did to the mixture. All
    // integer (DIV mean), |sources|-row output.
    "ext136_affinity_mixture" -> Q(
      (s, d) => {
        val all = docs(s, d)
        val scored = TextAnalysis.domainAffinity(
          all.filter(col("doc_id") % 10 =!= 0),
          all.filter(col("doc_id") % 10 === 0),
          "doc_id", "text")
        val sel = Sampling.priorityBudgetSample(scored, "doc_id",
            "affinity_milli", "n_tokens", budgetTokens = 5000L, salt = "sel")
          .select(col("doc_id"), lit(1).as("__sel"))
        scored
          .join(all.select(col("doc_id"), col("source")), "doc_id")
          .join(sel, Seq("doc_id"), "left")
          .groupBy(col("source"))
          .agg(count(lit(1)).as("n_docs"),
            sum(col("n_tokens")).as("n_tokens"),
            expr("CAST(sum(affinity_milli) DIV count(1) AS BIGINT)")
              .as("mean_affinity_milli"),
            sum(when(col("__sel").isNotNull, 1L).otherwise(0L)).as("n_selected"))
      },
      Some(s"""WITH ${DomainAffinityCte},
             |sel AS (
             |  SELECT doc_id,
             |         sum(n_tokens) OVER (
             |           ORDER BY affinity_milli DESC,
             |                    md5(doc_id::VARCHAR || ':sel'), doc_id
             |           ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum
             |  FROM aff
             |)
             |SELECT d.source, count(*) AS n_docs,
             |       CAST(sum(aff.n_tokens) AS BIGINT) AS n_tokens,
             |       CAST(sum(aff.affinity_milli) // count(*) AS BIGINT) AS mean_affinity_milli,
             |       CAST(sum(CASE WHEN sel.cum <= 5000 THEN 1 ELSE 0 END) AS BIGINT) AS n_selected
             |FROM aff
             |JOIN documents d ON aff.doc_id = d.doc_id
             |LEFT JOIN sel ON aff.doc_id = sel.doc_id
             |GROUP BY d.source""".stripMargin)),

    // WordPiece training (Schuster & Nakajima ICASSP'12, the BERT
    // tokenizer trainer): BPE's merge loop with the LIKELIHOOD selection
    // rule — merge the pair maximizing count(ab)/(count(a)·count(b)).
    // The score is exact fixed-point (cnt·10⁹ div ua·ub in BIGINT), so
    // the argmax order is bit-identical cross-engine; the oracle unrolls
    // all 8 count→score→argmax→merge rounds with the same wrapped-symbol
    // replace representation ext130 proves.
    "ext137_wordpiece_train" -> Q(
      (s, d) => TextAnalysis.wordpieceTrain(docs(s, d), "doc_id", "text", iters = 8),
      Some(wordpieceTrainOracle(8))),

    // WordPiece train -> APPLY: the learned 8 merges replayed in training
    // order as one row-local projection (the ext131 apply pass with the
    // WordPiece merge list) — per-doc fragmentation report against the
    // likelihood-trained vocab.
    "ext138_wordpiece_segment" -> Q(
      (s, d) => TextAnalysis.wordpieceSegment(docs(s, d), "doc_id", "text", iters = 8),
      Some(wordpieceSegmentOracle(8))),

    // MMR diverse selection (Carbonell & Goldstein SIGIR'98): greedy
    // relevance-minus-max-similarity reranking of the top-64 window —
    // the diversity-aware selection move for retrieval AND for "diverse
    // exemplars" curation. Exact integer milli dot products, so the 8
    // greedy rounds value-oracle as unrolled argmax CTEs.
    "ext139_mmr_select" -> Q(
      (s, d) => Similarity.mmrSelect(emb(s, d), "vec_id", "embedding",
        anchorId = 0L, poolSize = 64, k = 8),
      Some(mmrSelectOracle(poolSize = 64, k = 8))),

    // Multi-resolution DEDUP HIERARCHY: near-dup component labels at
    // three Jaccard thresholds (0.7 / 0.8 / 0.9) side by side — the
    // dendrogram cut-level report: tighter thresholds REFINE looser ones
    // (pairs at ≥0.9 ⊆ pairs at ≥0.8 ⊆ ≥0.7), so curation can pick its
    // aggressiveness per source with the family structure visible at
    // every level. Cost = three component runs, each the ext27 shape.
    "ext147_dedup_hierarchy" -> Q(
      (s, d) => {
        val all = docs(s, d)
        // r14 optimization pass. (1) The three tiers share ONE
        // shingle→signature→band→verify pass: the threshold is only the
        // final filter on the exact per-pair Jaccard, so the r13 form
        // recomputed the whole corpus-linear LSH derivation three times
        // for provably identical upstream results
        // (minhashLshCappedMulti — per-tier pairs value-identical to
        // the independent runs, DedupSpec pins it). (2) The three
        // component loops are independent EAGER pipelines over the
        // capped pipeline (the ext27 scale discipline: verdicts
        // provably equal the uncapped ones below the cap, and a viral
        // family can never explode the pair output) — run them
        // concurrently (guide §2.6) instead of back to back.
        val (tiers, families) = Dedup.minhashLshCappedMulti(all, "doc_id",
          "text", n = 3, k = 128, bands = 32,
          thresholds = Seq(0.7, 0.8, 0.9), maxBucket = 64)
        def famAt(pairs: DataFrame, out: String)(): DataFrame =
          Dedup.clusters(all, "doc_id", Dedup.cappedEdges(pairs, families))
            .select(col("doc_id"), col("cluster_id").as(out))
        val Seq(f70, f80, f90) = graft.util.Par.run(Seq(
          famAt(tiers(0), "fam70") _,
          famAt(tiers(1), "fam80") _,
          famAt(tiers(2), "fam90") _))
        f70.join(f80, "doc_id").join(f90, "doc_id")
      },
      Some(dedupHierarchyOracle(Seq(0.7, 0.8, 0.9)))),

    // LSH quality CERTIFICATE: the analytic detection-probability curve
    // of ext03's banded MinHash (b=32 bands × r=4 rows) — P(detect |
    // similarity s) = 1 − (1 − s^r)^b, tabulated at s = 0.05..0.95.
    // The "never silent" contract as a queryable artifact: a dedup run
    // ships the curve that says exactly what miss rate it accepted at
    // each similarity level. All arithmetic is plain IEEE multiply
    // chains (s^4 left-assoc, (1−x)^32 via five squarings) — identical
    // in both engines, so even the float curve value-oracles at e6.
    "ext146_lsh_certificate" -> Q(
      (s, d) => {
        val sCol = col("id") / 20.0
        val x = sCol * sCol * sCol * sCol
        val y = lit(1.0) - x
        val y2 = y * y; val y4 = y2 * y2; val y8 = y4 * y4
        val y16 = y8 * y8; val y32 = y16 * y16
        s.range(1, 20).select(
          (col("id") * 50).cast("long").as("s_milli"),
          lit(32L).as("bands"), lit(4L).as("rows_per_band"),
          floor((lit(1.0) - y32) * 1e6 + 0.5).cast("long").as("p_detect_e6"))
      },
      Some("""SELECT CAST(i * 50 AS BIGINT) AS s_milli,
             |       CAST(32 AS BIGINT) AS bands, CAST(4 AS BIGINT) AS rows_per_band,
             |       CAST(floor((1.0 - y32) * 1e6 + 0.5) AS BIGINT) AS p_detect_e6
             |FROM (
             |  SELECT i, y16 * y16 AS y32 FROM (
             |    SELECT i, y8 * y8 AS y16 FROM (
             |      SELECT i, y4 * y4 AS y8 FROM (
             |        SELECT i, y2 * y2 AS y4 FROM (
             |          SELECT i, y * y AS y2 FROM (
             |            SELECT i, 1.0 - (s * s * s * s) AS y FROM (
             |              SELECT i, i / 20.0 AS s FROM range(1, 20) r(i)))))))) t""".stripMargin)),

    // Keyed-hash PSEUDONYMIZATION (GDPR-style tokenization): direct
    // identifiers become stable salted-hash tokens — the same input
    // always maps to the same token, so analytic JOINS and GROUP BYs
    // keep working on the pseudonymized release while the identifier
    // never leaves. Complements the PII scrub (ext29: destroy) and the
    // k-anonymity audit (ext141: measure) with the third governance
    // move: tokenize. Deterministic sha2, zero-shuffle projection.
    "ext145_pseudonymize" -> Q(
      (s, d) => {
        val cust = s.read.parquet(s"$d/customer.parquet")
          .select(
            expr("substring(sha2(concat('graft-pseud-v1:', c_name), 256), 1, 16)")
              .as("pseudonym"),
            col("c_custkey"), col("c_mktsegment"))
        val orders = s.read.parquet(s"$d/orders.parquet")
        cust.join(orders, col("c_custkey") === col("o_custkey"), "left")
          .groupBy(col("pseudonym"), col("c_mktsegment"))
          .agg(count(col("o_orderkey")).as("n_orders"),
            coalesce(sum(expr("CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT)")),
              lit(0L)).as("total_cents"))
      },
      Some("""SELECT substring(sha256('graft-pseud-v1:' || c_name), 1, 16) AS pseudonym,
             |       c_mktsegment,
             |       count(o_orderkey) AS n_orders,
             |       CAST(coalesce(sum(CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT)), 0) AS BIGINT) AS total_cents
             |FROM customer LEFT JOIN orders ON c_custkey = o_custkey
             |GROUP BY pseudonym, c_mktsegment""".stripMargin)),

    // Retrieval-metric agreement: how much does the SCORING choice
    // (cosine vs inner product) change what top-k retrieval returns?
    // Per query: recall@5 overlap between the two exact rankings and
    // the MRR (milli) of the cosine-best item inside the MIPS list —
    // the metric-selection report a retrieval stack needs before
    // normalizing (or not) its embeddings. Both rankings are exact and
    // deterministic (score DESC, id), so the whole report value-oracles.
    "ext144_ranking_agreement" -> Q(
      (s, d) => {
        val e = emb(s, d)
        val q = e.filter(col("vec_id") < 10)
        val cos = Similarity.cosineTopK(e, q, "vec_id", "embedding", 5)
          .select(col("qid"), col("rnk"), col("nid"))
        val mips = Similarity.mipsTopK(e, q, "vec_id", "embedding", 5)
          .select(col("qid").as("m_qid"), col("rnk").as("m_rnk"),
            col("nid").as("m_nid"))
        val overlap = cos
          .join(mips, col("qid") === col("m_qid") && col("nid") === col("m_nid"),
            "left")
          .groupBy(col("qid"))
          .agg(sum(when(col("m_nid").isNotNull, 1L).otherwise(0L)).as("n_overlap"))
        val mrr = cos.filter(col("rnk") === 1)
          .join(mips, col("qid") === col("m_qid") && col("nid") === col("m_nid"),
            "left")
          .select(col("qid"),
            coalesce(expr("1000 div m_rnk"), lit(0L)).as("mrr_milli"))
        overlap.join(mrr, "qid")
      },
      Some("""WITH cos AS (
             |  SELECT qid, nid, row_number() OVER (PARTITION BY qid ORDER BY c DESC, nid) AS rnk
             |  FROM (SELECT q.vec_id AS qid, e.vec_id AS nid,
             |               round(list_cosine_similarity(q.embedding::DOUBLE[], e.embedding::DOUBLE[]), 6) AS c
             |        FROM embeddings q JOIN embeddings e ON q.vec_id < 10 AND e.vec_id <> q.vec_id)
             |  QUALIFY rnk <= 5
             |), mips AS (
             |  SELECT qid, nid, row_number() OVER (PARTITION BY qid ORDER BY dot DESC, nid) AS rnk
             |  FROM (SELECT q.vec_id AS qid, e.vec_id AS nid,
             |               round(list_inner_product(q.embedding::DOUBLE[], e.embedding::DOUBLE[]), 6) AS dot
             |        FROM embeddings q JOIN embeddings e ON q.vec_id < 10 AND e.vec_id <> q.vec_id)
             |  QUALIFY rnk <= 5
             |)
             |SELECT c.qid,
             |       CAST(sum(CASE WHEN m.nid IS NOT NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_overlap,
             |       CAST(coalesce(max(CASE WHEN c.rnk = 1 THEN coalesce(1000 // m.rnk, 0) END), 0) AS BIGINT) AS mrr_milli
             |FROM cos c LEFT JOIN mips m ON m.qid = c.qid AND m.nid = c.nid
             |GROUP BY c.qid""".stripMargin)),

    // Tokenizer BAKEOFF: BPE vs WordPiece fertility per source — the
    // "which tokenizer fragments my corpus less" report that drives the
    // vocab decision. Aggregate fertility is exact integer
    // (sum(subwords)·1000 div sum(words)); both 8-round trainings replay
    // in the oracle as independent nested-WITH subqueries.
    "ext143_tokenizer_bakeoff" -> Q(
      (s, d) => {
        val all = docs(s, d)
        // r14 optimization pass (guide §2.6): the three trainers are
        // independent EAGER training loops (per-merge/per-iteration
        // driver rounds); run them concurrently so one trainer's tiny
        // per-round jobs back-fill the cores the others leave idle.
        // r11 verdict #5: the THIRD trainer joins the bakeoff — unigram
        // fertility over ITS OWN segmentable-word denominator (each
        // model's fertility is per-model; bpe/wp share a word filter by
        // construction, unigram's apply join defines its own)
        val Seq(bpe, wp, ug) = graft.util.Par.run(Seq(
          () => TextAnalysis.bpeSegment(all, "doc_id", "text", iters = 8)
            .select(col("doc_id"), col("n_words"),
              col("n_subwords").as("bpe_subwords")),
          () => TextAnalysis.wordpieceSegment(all, "doc_id", "text", iters = 8)
            .select(col("doc_id"), col("n_subwords").as("wp_subwords")),
          () => TextAnalysis.unigramSegment(all, "doc_id", "text",
              vocabSize = 64, iters = 1)
            .select(col("doc_id"), col("n_words").as("ug_words"),
              col("n_subwords").as("ug_subwords"))))
        bpe.join(wp, "doc_id").join(ug, "doc_id")
          .join(all.select(col("doc_id"), col("source")), "doc_id")
          .groupBy(col("source"))
          .agg(
            expr("CAST(sum(bpe_subwords) * 1000 DIV sum(n_words) AS BIGINT)")
              .as("bpe_fert_milli"),
            expr("CAST(sum(wp_subwords) * 1000 DIV sum(n_words) AS BIGINT)")
              .as("wp_fert_milli"),
            expr("CAST(sum(ug_subwords) * 1000 DIV sum(ug_words) AS BIGINT)")
              .as("ug_fert_milli"))
          .withColumn("winner",
            // argmin with alphabetical tie-break: bpe beats both on
            // ties, unigram beats wordpiece
            when(col("bpe_fert_milli") <= col("ug_fert_milli") &&
                 col("bpe_fert_milli") <= col("wp_fert_milli"), "bpe")
              .when(col("ug_fert_milli") <= col("wp_fert_milli"), "unigram")
              .otherwise("wordpiece"))
      },
      Some(s"""SELECT a.source, a.fert AS bpe_fert_milli, b.fert AS wp_fert_milli,
             |  c.fert AS ug_fert_milli,
             |  CASE WHEN a.fert <= c.fert AND a.fert <= b.fert THEN 'bpe'
             |       WHEN c.fert <= b.fert THEN 'unigram'
             |       ELSE 'wordpiece' END AS winner
             |FROM (
             |  ${bpeCtes(8)}, dw AS (
             |    SELECT doc_id, w FROM (
             |      SELECT doc_id, lower(x) AS w FROM (
             |        SELECT doc_id, unnest(list_filter(regexp_split_to_array(trim(text), '\\s+'), z -> z <> '')) AS x
             |        FROM documents))
             |    WHERE regexp_full_match(w, '[a-z0-9]+')
             |  ), seg AS (
             |    SELECT w, CAST(len(s) - len(replace(s, '|', '')) AS BIGINT) AS n_sub FROM v8
             |  )
             |  SELECT doc.source,
             |         CAST(sum(g.n_sub) * 1000 // count(*) AS BIGINT) AS fert
             |  FROM dw d JOIN seg g ON g.w = d.w
             |  JOIN documents doc ON doc.doc_id = d.doc_id
             |  GROUP BY doc.source
             |) a JOIN (
             |  ${wordpieceCtes(8)}, dw AS (
             |    SELECT doc_id, w FROM (
             |      SELECT doc_id, lower(x) AS w FROM (
             |        SELECT doc_id, unnest(list_filter(regexp_split_to_array(trim(text), '\\s+'), z -> z <> '')) AS x
             |        FROM documents))
             |    WHERE regexp_full_match(w, '[a-z0-9]+')
             |  ), seg AS (
             |    SELECT w, CAST(len(s) - len(replace(s, '|', '')) AS BIGINT) AS n_sub FROM v8
             |  )
             |  SELECT doc.source,
             |         CAST(sum(g.n_sub) * 1000 // count(*) AS BIGINT) AS fert
             |  FROM dw d JOIN seg g ON g.w = d.w
             |  JOIN documents doc ON doc.doc_id = d.doc_id
             |  GROUP BY doc.source
             |) b ON a.source = b.source
             |JOIN (
             |  ${unigramTrainCtes(64, 1, 4096, 4, 12)},
             |  ${unigramApplyCtes(1, 4, 12)}, dw AS (
             |    SELECT doc_id, lower(unnest(regexp_split_to_array(trim(text), '\\s+'))) AS w
             |    FROM documents
             |  )
             |  SELECT doc.source,
             |         CAST(sum(g.c) * 1000 // count(*) AS BIGINT) AS fert
             |  FROM dw d JOIN wstats g ON g.w = d.w
             |  JOIN documents doc ON doc.doc_id = d.doc_id
             |  GROUP BY doc.source
             |) c ON a.source = c.source""".stripMargin)),

    // Greedy k-center / farthest-point selection (Sener & Savarese
    // ICLR'18 coresets): ext139's max-min counterpart — each of 8
    // rounds is a FULL distributed scan picking the point farthest
    // (min squared L2) from the selected set. Exact integer milli
    // arithmetic; 8 unrolled argmax CTEs in the oracle.
    "ext140_kcenter_select" -> Q(
      (s, d) => Similarity.kcenterSelect(emb(s, d), "vec_id", "embedding", k = 8),
      Some(kcenterSelectOracle(8))),

    // k-anonymity / l-diversity audit (Sweeney '02; Machanavajjhala et
    // al. '07): per quasi-identifier equivalence class, its size and its
    // distinct-sensitive-value count — the privacy-release governance
    // report beside the PII scrub (ext29) and lineage (ext/fw reports).
    // QI = (nation, market segment); sensitive = account-balance bucket.
    "ext141_k_anonymity" -> Q(
      (s, d) => graft.sinks.DataQuality.kAnonymityReport(
        s.read.parquet(s"$d/customer.parquet")
          .withColumn("bal_bucket",
            expr("CAST(floor(c_acctbal / 1000) AS BIGINT)")),
        Seq("c_nationkey", "c_mktsegment"), "bal_bucket", k = 12, l = 8),
      Some("""SELECT c_nationkey, c_mktsegment,
             |  count(*) AS class_size,
             |  count(DISTINCT CAST(floor(c_acctbal / 1000) AS BIGINT)) AS l_distinct,
             |  count(*) >= 12 AS meets_k,
             |  count(DISTINCT CAST(floor(c_acctbal / 1000) AS BIGINT)) >= 8 AS meets_l
             |FROM customer GROUP BY c_nationkey, c_mktsegment""".stripMargin)),

    // Generalization ladder — the FIX side of ext141: per finest QI
    // class, the minimal generalization level reaching k=150 members
    // (0 = (region,nation,segment), 1 = drop segment, 2 = region only,
    // 3 = suppress). One scan builds the finest classes; coarser levels
    // aggregate the bounded class table.
    "ext142_k_anon_ladder" -> Q(
      (s, d) => {
        val cx = s.read.parquet(s"$d/customer.parquet")
          .join(broadcast(s.read.parquet(s"$d/nation.parquet")),
            col("c_nationkey") === col("n_nationkey"))
          .join(broadcast(s.read.parquet(s"$d/region.parquet")),
            col("n_regionkey") === col("r_regionkey"))
        graft.sinks.DataQuality.generalizationLadder(
          cx, Seq("r_name", "c_nationkey", "c_mktsegment"), k = 150)
      },
      Some("""WITH cx AS (
             |  SELECT c.*, r_name FROM customer c
             |  JOIN nation n ON c_nationkey = n_nationkey
             |  JOIN region r ON n_regionkey = r_regionkey),
             |l0 AS (SELECT r_name, c_nationkey, c_mktsegment, count(*) AS size_l0
             |       FROM cx GROUP BY r_name, c_nationkey, c_mktsegment),
             |l1 AS (SELECT r_name, c_nationkey, CAST(sum(size_l0) AS BIGINT) AS size_l1
             |       FROM l0 GROUP BY r_name, c_nationkey),
             |l2 AS (SELECT r_name, CAST(sum(size_l0) AS BIGINT) AS size_l2
             |       FROM l0 GROUP BY r_name)
             |SELECT l0.r_name, c_nationkey, c_mktsegment, size_l0, size_l1, size_l2,
             |  CASE WHEN size_l0 >= 150 THEN 0 WHEN size_l1 >= 150 THEN 1
             |       WHEN size_l2 >= 150 THEN 2 ELSE 3 END AS gen_level
             |FROM l0 JOIN l1 USING (r_name, c_nationkey) JOIN l2 USING (r_name)""".stripMargin)),

    // Mutual kNN's SCALE path: the reciprocal filter over the
    // SRP-bucketed approximate top-3 graph (adaptive plane count) —
    // the ext91 edge-build trade; the oracle replays SRP buckets,
    // multi-probe, ranking, and the both-ways filter.
    "ext126_mutual_knn_srp" -> Q(
      (s, d) => {
        val e = emb(s, d)
        Similarity.mutualKnnSrp(e, "vec_id", "embedding", k = 3,
          nPlanes = Similarity.srpPlanesFor(e.count()), salt = "mk1")
      },
      Some(mutualKnnSrpOracle)),

    // token-budget sampling: the oracle replays the md5 permutation and
    // the per-source running total directly (the bucketed two-phase
    // window is invisible to semantics — that's the point).
    "ext65_token_budget" -> Q(
      (s, d) => Sampling.budgetSample(
        docs(s, d).withColumn("n_tokens",
          size(filter(split(trim(col("text")), "\\s+"), t => t =!= "")).cast("long")),
        "doc_id", "source", "n_tokens", budgetTokens = 5000L, salt = "mix1"),
      Some("""WITH n AS (
             |  SELECT doc_id, source,
             |         CAST(len(list_filter(regexp_split_to_array(trim(text), '\s+'), x -> x <> '')) AS BIGINT) AS n_tokens,
             |         md5(CAST(doc_id AS VARCHAR) || ':mix1') AS k
             |  FROM documents
             |), r AS (
             |  SELECT doc_id, source, n_tokens,
             |         CAST(sum(n_tokens) OVER (PARTITION BY source ORDER BY k, doc_id
             |           ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS cum_tokens
             |  FROM n
             |)
             |SELECT doc_id, source, n_tokens, cum_tokens
             |FROM r WHERE cum_tokens <= 5000""".stripMargin)),

    // Weighted systematic sampling (stochastic universal sampling):
    // 100 token-weighted picks along the md5-permuted cumulative axis,
    // exact integer multiplicities (n_picks sums to k by construction).
    // The oracle replays the permutation, the prefix sum, and the
    // closed-form pick count cnt(x) = min(k, (2kx + W - 1) // 2W).
    "ext120_systematic_sample" -> Q(
      (s, d) => Sampling.systematicSample(
        docs(s, d).withColumn("n_tokens",
          size(filter(split(trim(col("text")), "\\s+"), t => t =!= "")).cast("long")),
        "doc_id", "n_tokens", k = 100, salt = "sus1"),
      Some("""WITH n AS (
             |  SELECT doc_id,
             |         CAST(len(list_filter(regexp_split_to_array(trim(text), '\s+'), x -> x <> '')) AS BIGINT) AS w,
             |         md5(CAST(doc_id AS VARCHAR) || ':sus1') AS k
             |  FROM documents
             |), p AS (SELECT doc_id, w, k FROM n WHERE w > 0
             |), c AS (
             |  SELECT doc_id, w,
             |         CAST(coalesce(sum(w) OVER (ORDER BY k, doc_id
             |           ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS BIGINT) AS cum_prev
             |  FROM p
             |), t AS (SELECT sum(w) AS wt FROM p)
             |SELECT doc_id, w, cum_prev,
             |       CAST(least(100, (200 * (cum_prev + w) + wt - 1) // (2 * wt))
             |          - least(100, (200 * cum_prev + wt - 1) // (2 * wt)) AS BIGINT) AS n_picks
             |FROM c, t
             |WHERE least(100, (200 * (cum_prev + w) + wt - 1) // (2 * wt))
             |    > least(100, (200 * cum_prev + wt - 1) // (2 * wt))""".stripMargin)),

    // Vocabulary census per source: tokens, types, hapax legomena, and
    // the integer-milli TTR / hapax-share ratios — the lexical-diversity
    // QA signals (low TTR = templated slice; collapsing hapax share =
    // boilerplate flood).
    "ext125_vocab_census" -> Q(
      (s, d) => TextAnalysis.vocabCensus(docs(s, d), "source", "text"),
      Some(raw"""WITH tk AS (
             |  SELECT source AS slice,
             |         unnest(list_filter(regexp_split_to_array(trim(text), '\s+'), x -> x <> '')) AS token
             |  FROM documents WHERE source IS NOT NULL AND text IS NOT NULL
             |), c AS (SELECT slice, token, count(*) AS c FROM tk GROUP BY 1, 2)
             |SELECT slice, CAST(sum(c) AS BIGINT) AS n_tokens,
             |       CAST(count(*) AS BIGINT) AS n_types,
             |       CAST(sum(CASE WHEN c = 1 THEN 1 ELSE 0 END) AS BIGINT) AS n_hapax,
             |       CAST((1000 * count(*)) // sum(c) AS BIGINT) AS ttr_milli,
             |       CAST((1000 * sum(CASE WHEN c = 1 THEN 1 ELSE 0 END)) // count(*) AS BIGINT) AS hapax_milli
             |FROM c GROUP BY slice""".stripMargin)),

    // Exact inter-decile mean of per-doc token counts per source —
    // robust location trimmed by the exact p10/p90 VALUES (rank
    // r = floor(q·(n−1))+1), so ties are unobservable and the oracle
    // replays both thresholds as order statistics.
    "ext124_interdecile_mean" -> Q(
      (s, d) => graft.operators.GlobalSort.interdecileMeanByGroup(
        docs(s, d).filter(col("text").isNotNull),
        "source",
        size(filter(split(trim(col("text")), "\\s+"), t => t =!= ""))),
      Some(raw"""WITH v AS (
             |  SELECT source AS g,
             |         CAST(len(list_filter(regexp_split_to_array(trim(text), '\s+'), x -> x <> '')) AS BIGINT) AS v
             |  FROM documents WHERE source IS NOT NULL AND text IS NOT NULL
             |), n AS (SELECT g, count(*) AS n FROM v GROUP BY 1
             |), s AS (
             |  SELECT g, v, row_number() OVER (PARTITION BY g ORDER BY v) AS rn FROM v
             |), b AS (
             |  SELECT s.g,
             |         max(CASE WHEN rn = CAST(floor(0.1 * (n - 1)) AS BIGINT) + 1 THEN v END) AS v10,
             |         max(CASE WHEN rn = CAST(floor(0.9 * (n - 1)) AS BIGINT) + 1 THEN v END) AS v90
             |  FROM s JOIN n USING (g) GROUP BY s.g
             |)
             |SELECT v.g AS source, CAST(n.n AS BIGINT) AS n,
             |       CAST(b.v10 AS BIGINT) AS v10, CAST(b.v90 AS BIGINT) AS v90,
             |       CAST(sum(CASE WHEN v.v BETWEEN b.v10 AND b.v90 THEN 1 ELSE 0 END) AS BIGINT) AS n_kept,
             |       CAST((1000 * sum(CASE WHEN v.v BETWEEN b.v10 AND b.v90 THEN v.v ELSE 0 END))
             |            // sum(CASE WHEN v.v BETWEEN b.v10 AND b.v90 THEN 1 ELSE 0 END) AS BIGINT) AS mean_milli
             |FROM v JOIN b USING (g) JOIN n USING (g)
             |GROUP BY v.g, n.n, b.v10, b.v90""".stripMargin)),

    // median/MAD robust outliers: every verdict is integer arithmetic in
    // doubled units; the oracle replays both medians and the 2·d2 > c·mad4
    // compare per document.
    "ext64_length_outliers" -> Q(
      (s, d) => TextAnalysis.lengthOutliers(docs(s, d), "doc_id", "text",
        "source", c = 3),
      Some("""WITH n AS (
             |  SELECT doc_id, source,
             |         CAST(len(list_filter(regexp_split_to_array(trim(text), '\s+'), x -> x <> '')) AS BIGINT) AS n_tokens
             |  FROM documents
             |), m AS (
             |  SELECT source, CAST(floor(quantile_cont(n_tokens, 0.5) * 2 + 0.5) AS BIGINT) AS med2
             |  FROM n GROUP BY source
             |), d AS (
             |  SELECT n.doc_id, n.source, n.n_tokens, m.med2,
             |         abs(n.n_tokens * 2 - m.med2) AS d2
             |  FROM n JOIN m USING (source)
             |), md AS (
             |  SELECT source, CAST(floor(quantile_cont(d2, 0.5) * 2 + 0.5) AS BIGINT) AS mad4
             |  FROM d GROUP BY source
             |)
             |SELECT d.doc_id, d.source, d.n_tokens, d.med2, md.mad4,
             |       d.d2 * 2 > 3 * md.mad4 AS is_outlier
             |FROM d JOIN md USING (source)""".stripMargin)),

    // Unsupervised k-means clustering in EXACT integer space (micro-int
    // vectors, bigint distances, floor(sum/cnt + 0.5) centroid updates)
    // — every Lloyd's step is bit-reproducible across engines, so the
    // full iterative fit is oracle-checked, not just smoke-tested. The
    // oracle replays the same 3 unrolled iterations from the same
    // lowest-8-id seeds. Scale shape: see graft.operators.Clustering.
    "ext71_kmeans" -> Q(
      (s, d) => graft.operators.Clustering.kmeans(
        emb(s, d), "vec_id", "embedding", k = 8, iters = 3),
      Some(kmeansOracle(k = 8, iters = 3, dims = 64))),

    // Gopher-style repetition quality signals: top-unigram token share,
    // top-2-gram character share, duplicated-3-gram occurrence share —
    // per-doc array expressions, no shuffle (operator scaladoc).
    // SemDeDup (Abbas et al. 2023): k-means blocks + within-cluster
    // cosine dominance dedup — learned blocking instead of hashed; the
    // pair join is equality-keyed on the cluster id, never all-pairs.
    // Threshold 0.45 matches ext10's fixture geometry (planted near-dups
    // separate cleanly; the ext10 unrounded-compare discipline).
    "ext73_semdedup" -> Q(
      (s, d) => graft.operators.Clustering.semDedup(
        emb(s, d), "vec_id", "embedding", k = 8, iters = 3, threshold = 0.45),
      Some(semDedupOracle(k = 8, iters = 3, dims = 64, threshold = 0.45))),

    "ext72_repetition" -> Q(
      (s, d) => TextAnalysis.repetitionSignals(docs(s, d), "doc_id", "text"),
      Some("""WITH t AS (
             |  SELECT doc_id, len(trim(text)) AS n_chars_t,
             |         list_filter(regexp_split_to_array(trim(text), '\s+'), x -> x <> '') AS w
             |  FROM documents
             |), base AS (
             |  SELECT doc_id, n_chars_t, w, len(w) AS n_tokens FROM t WHERE len(w) >= 3
             |), uni AS (
             |  SELECT doc_id, tok, count(*) AS c FROM (SELECT doc_id, unnest(w) AS tok FROM base) GROUP BY 1, 2
             |), top1 AS (
             |  SELECT doc_id, tok, c FROM (
             |    SELECT doc_id, tok, c, row_number() OVER (PARTITION BY doc_id ORDER BY c DESC, tok DESC) AS rk FROM uni)
             |  WHERE rk = 1
             |), bi AS (
             |  SELECT doc_id, g, count(*) AS c FROM (
             |    SELECT doc_id, unnest(list_transform(range(1, len(w)), i -> w[i] || ' ' || w[i+1])) AS g FROM base)
             |  GROUP BY 1, 2
             |), top2 AS (
             |  SELECT doc_id, g, c FROM (
             |    SELECT doc_id, g, c, row_number() OVER (PARTITION BY doc_id ORDER BY c DESC, g DESC) AS rk FROM bi)
             |  WHERE rk = 1
             |), tri AS (
             |  SELECT doc_id, g, count(*) AS c FROM (
             |    SELECT doc_id, unnest(list_transform(range(1, len(w)-1), i -> w[i] || ' ' || w[i+1] || ' ' || w[i+2])) AS g FROM base)
             |  GROUP BY 1, 2
             |), dup3 AS (
             |  SELECT doc_id, sum(CASE WHEN c > 1 THEN c ELSE 0 END) AS dup_occ, sum(c) AS tot_occ
             |  FROM tri GROUP BY 1
             |)
             |SELECT b.doc_id, CAST(b.n_tokens AS BIGINT) AS n_tokens,
             |       t1.tok AS top_token,
             |       CAST(floor(t1.c * 1000000.0 / b.n_tokens + 0.5) AS BIGINT) AS top1_e6,
             |       t2.g AS top_bigram,
             |       CAST(floor(t2.c * len(t2.g) * 1000000.0 / b.n_chars_t + 0.5) AS BIGINT) AS top2_char_e6,
             |       CAST(floor(d.dup_occ * 1000000.0 / d.tot_occ + 0.5) AS BIGINT) AS dup3_e6
             |FROM base b JOIN top1 t1 USING (doc_id) JOIN top2 t2 USING (doc_id) JOIN dup3 d USING (doc_id)""".stripMargin)),

    // Deterministic cardinality estimation: the KMV sketch
    // (functions/KmvSketch.scala, a mergeable TypedImperativeAggregate)
    // over an explicit 60-bit md5 hash — unlike HLL (q14b, rows-only by
    // design), the k minima and the single-division estimate are pure
    // functions of the input set, so DuckDB replays the ESTIMATE
    // exactly. Per-source distinct-token counts: groups under k=128
    // distinct hashes report exactly; larger ones estimate via
    // floor(127·2^60 / kth_min + 0.5) — one IEEE division, both
    // engines round identically.
    "ext80_kmv_distinct" -> Q(
      (s, d) => {
        graft.sql.GraftExtensions.ensureRegistered(s)
        val toks = docs(s, d)
          .select(col("source"), explode(split(trim(col("text")), "\\s+")).as("tok"))
          .filter(col("tok") =!= "")
        val hashed = toks.select(col("source"),
          expr("CAST(conv(substring(md5(tok), 1, 15), 16, 10) AS BIGINT)").as("hv"))
        hashed.groupBy(col("source"))
          .agg(expr("kmv_sketch(hv, 128)").as("ks"))
          .select(col("source"),
            size(col("ks")).cast("long").as("n_kept"),
            when(size(col("ks")) < 128, size(col("ks")).cast("long"))
              .otherwise(floor(lit(127.0) * pow(lit(2.0), lit(60.0)) /
                element_at(col("ks"), 128) + lit(0.5)).cast("long"))
              .as("est_distinct"))
      },
      Some("""WITH tok AS (
             |  SELECT DISTINCT source, t
             |  FROM (SELECT source, unnest(list_filter(regexp_split_to_array(trim(text), '\s+'), x -> x <> '')) AS t
             |        FROM documents)
             |), h AS (
             |  SELECT DISTINCT source, CAST(('0x' || substr(md5(t), 1, 15))::BIGINT AS BIGINT) AS hv
             |  FROM tok
             |), r AS (
             |  SELECT source, hv,
             |         row_number() OVER (PARTITION BY source ORDER BY hv) AS rn,
             |         count(*) OVER (PARTITION BY source) AS cnt
             |  FROM h
             |)
             |SELECT source,
             |       CAST(least(cnt, 128) AS BIGINT) AS n_kept,
             |       CAST(CASE WHEN cnt < 128 THEN cnt
             |                 ELSE floor(127.0 * power(2.0, 60.0) / max(CASE WHEN rn = 128 THEN hv END) + 0.5)
             |            END AS BIGINT) AS est_distinct
             |FROM r
             |GROUP BY source, cnt""".stripMargin)),

    // IVF search against a PERSISTED index built through the YAML
    // engine: a script job (A17 carrying a real maintenance workload —
    // script/AnnIndexJob.scala) fits exact integer k-means and stores
    // the centroid table; the probe (Similarity.ivfTopKIndexed) assigns
    // the corpus to stored cells and scans only each query's nProbe=2
    // nearest cells. Because the index is integer Lloyd's, the WHOLE
    // lifecycle — fit, stored centroids, cell assignment, probe choice,
    // final cosine ranking — replays in DuckDB: the oracled ANN variant
    // next to ext11's rows-only MLlib form.
    // Diversity selection: one representative per k-means cluster (the
    // vector nearest its final centroid, ties to the lowest id) — the
    // deterministic bucketed stand-in for greedy k-center. The oracle
    // replays the ext71 fit, re-derives every vector's (distance,
    // cluster) against the final centroids, and picks the argmin.
    "ext86_cluster_reps" -> Q(
      (s, d) => graft.operators.Clustering.clusterRepresentatives(
        emb(s, d), "vec_id", "embedding", k = 8, iters = 3),
      Some(kmeansCtes(8, 3, 64) + """
           |, dist AS (
           |  SELECT v.id, c.cid,
           |         list_sum(list_transform(range(1, len(v.m)+1), j -> (v.m[j]-c.c[j])*(v.m[j]-c.c[j]))) AS sd
           |  FROM m v CROSS JOIN c3 c
           |), best AS (
           |  SELECT id, cid, sd FROM (
           |    SELECT id, cid, sd,
           |           row_number() OVER (PARTITION BY id ORDER BY sd, cid) AS rk
           |    FROM dist) WHERE rk = 1
           |)
           |SELECT CAST(p.cid AS INT) AS cluster, p.id AS rep_id,
           |       CAST(p.sd AS BIGINT) AS sq_dist,
           |       CAST(n.n AS BIGINT) AS cluster_size
           |FROM (SELECT cid, id, sd,
           |             row_number() OVER (PARTITION BY cid ORDER BY sd, id) AS prk
           |      FROM best) p
           |JOIN (SELECT cid, count(*) AS n FROM best GROUP BY cid) n ON n.cid = p.cid
           |WHERE p.prk = 1""".stripMargin)),

    // Per-source boilerplate stripping (C4-style template cleaning):
    // 12-token pseudo-lines appearing in >30% of a source's documents
    // are deleted from EVERY document of that source (dedupLines keeps
    // a first copy; boilerplate is content nowhere). Twelve planted
    // docs share a header line that must vanish while their unique
    // bodies survive; the oracle replays segmentation, per-source line
    // document-frequency, the permille threshold, and reassembly.
    "ext85_boilerplate" -> Q(
      (s, d) => {
        import s.implicits._
        val header = "HEADER NAV COOKIE BANNER TERMS APPLY SITE MENU LOGIN SEARCH HELP HOME"
        val planted = (1 to 12).map(i =>
          (-i.toLong, s"$header alpha$i beta$i gamma$i", "plantsrc"))
          .toDF("doc_id", "text", "source")
        val corpus = docs(s, d).select(col("doc_id"), col("text"), col("source"))
          .unionByName(planted)
        val toks = filter(split(trim(col("text")), "\\s+"), t => t =!= "")
        val lines = transform(
          sequence(lit(0), ((size(toks) + lit(11)) / lit(12)).cast("int") - 1),
          g => array_join(slice(toks, g * 12 + 1, lit(12)), " "))
        Dedup.stripBoilerplate(
          corpus.filter(size(toks) > 0).withColumn("__lines", lines),
          "doc_id", "source", col("__lines"), maxDocPermille = 300, joinWith = " ")
      },
      Some("""WITH corpus AS (
             |  SELECT doc_id, text, source FROM documents
             |  UNION ALL
             |  SELECT -CAST(i AS BIGINT),
             |         concat('HEADER NAV COOKIE BANNER TERMS APPLY SITE MENU LOGIN SEARCH HELP HOME',
             |                ' alpha', i, ' beta', i, ' gamma', i),
             |         'plantsrc'
             |  FROM range(1, 13) r(i)
             |), t AS (
             |  SELECT doc_id, source,
             |         list_filter(regexp_split_to_array(trim(text), '\s+'), x -> x <> '') AS toks
             |  FROM corpus
             |), seg AS (
             |  SELECT t.doc_id, t.source, u.g,
             |         array_to_string(t.toks[u.g*12+1 : u.g*12+12], ' ') AS line
             |  FROM t JOIN (SELECT unnest(range(0, (SELECT max((len(toks) + 11) // 12) FROM t))) AS g) u
             |    ON u.g < (len(t.toks) + 11) // 12
             |  WHERE len(t.toks) > 0
             |), nd AS (
             |  SELECT source, count(DISTINCT doc_id) AS n_docs FROM seg GROUP BY source
             |), df AS (
             |  SELECT source, line, count(DISTINCT doc_id) AS line_docs
             |  FROM seg GROUP BY source, line
             |), b AS (
             |  SELECT df.source, df.line
             |  FROM df JOIN nd USING (source)
             |  WHERE df.line_docs * 1000 > nd.n_docs * 300
             |), k AS (
             |  SELECT s.doc_id, s.source, s.g, s.line,
             |         (b.line IS NOT NULL) AS boiler
             |  FROM seg s LEFT JOIN b ON b.source = s.source AND b.line = s.line
             |)
             |SELECT doc_id, source,
             |       CAST(sum(CASE WHEN boiler THEN 0 ELSE 1 END) AS BIGINT) AS n_lines_kept,
             |       CAST(sum(CASE WHEN boiler THEN 1 ELSE 0 END) AS BIGINT) AS n_lines_removed,
             |       coalesce(string_agg(CASE WHEN boiler THEN NULL ELSE line END, ' ' ORDER BY g), '') AS text
             |FROM k GROUP BY doc_id, source""".stripMargin)),

    // Contrastive triplet mining for embedding-model training: positive
    // = nearest in-label neighbor (the ext67 edge), negative = a
    // deterministic md5-permutation draw from a rotating other label —
    // all integer arithmetic, so the full triplet set replays in SQL.
    "ext84_contrastive_pairs" -> Q(
      (s, d) => Similarity.contrastivePairs(
        emb(s, d), "vec_id", "embedding", "label", salt = "neg1"),
      Some("""WITH sim AS (
             |  SELECT a.vec_id AS anchor_id, b.vec_id AS nid,
             |         round(list_cosine_similarity(a.embedding::DOUBLE[], b.embedding::DOUBLE[]), 6) AS cosine
             |  FROM embeddings a JOIN embeddings b
             |    ON a.label = b.label AND a.vec_id <> b.vec_id
             |), pos AS (
             |  SELECT anchor_id, nid AS pos_id, cosine AS pos_cosine FROM (
             |    SELECT anchor_id, nid, cosine,
             |           row_number() OVER (PARTITION BY anchor_id ORDER BY cosine DESC, nid) AS rnk
             |    FROM sim) WHERE rnk = 1
             |), ranked AS (
             |  SELECT vec_id AS id, label AS lbl,
             |         row_number() OVER (PARTITION BY label
             |           ORDER BY md5(CAST(vec_id AS VARCHAR) || ':neg1'), vec_id) AS lrnk
             |  FROM embeddings
             |), dir AS (
             |  SELECT lbl, count(*) AS lsz,
             |         row_number() OVER (ORDER BY lbl) - 1 AS lidx
             |  FROM (SELECT label AS lbl FROM embeddings) GROUP BY lbl
             |), nl AS (SELECT count(*) AS nl FROM dir
             |), anchors AS (
             |  SELECT e.vec_id AS anchor_id,
             |         (d.lidx + 1 + e.vec_id % (nl.nl - 1)) % nl.nl AS nidx
             |  FROM embeddings e JOIN dir d ON d.lbl = e.label CROSS JOIN nl
             |  WHERE nl.nl > 1
             |), withneg AS (
             |  SELECT a.anchor_id, d2.lbl AS neg_lbl,
             |         (a.anchor_id % d2.lsz) + 1 AS neg_rank
             |  FROM anchors a JOIN dir d2 ON d2.lidx = a.nidx
             |)
             |SELECT p.anchor_id, p.pos_id, p.pos_cosine, r.id AS neg_id, w.neg_lbl
             |FROM pos p
             |JOIN withneg w USING (anchor_id)
             |JOIN ranked r ON r.lbl = w.neg_lbl AND r.lrnk = w.neg_rank""".stripMargin)),

    // Hash-family ANN with a FULL value oracle (the LSH twin of
    // ext81's partition-family IVF): md5-parity ±1 planes, integer
    // micro projections — bucket ids, hamming-1 probe sets, candidates
    // and the cosine ranking all replay in SQL. ext06 (float-plane LSH)
    // stays rows-only precisely because ITS sign bits are
    // accumulation-order-dependent; this variant is why that's a
    // property of the plane family, not of LSH.
    "ext83_ann_srp" -> Q(
      (s, d) => {
        val e = emb(s, d)
        Similarity.annTopKSrp(e, e.filter(col("vec_id") % 50 === 0),
          "vec_id", "embedding", k = 5, nPlanes = 6, salt = "ann1")
      },
      Some("""WITH m AS (
             |  SELECT i, j,
             |         CASE WHEN ('0x' || substr(md5(i::VARCHAR || ':' || j::VARCHAR || ':ann1'), 1, 1))::BIGINT % 2 = 0
             |              THEN 1 ELSE -1 END AS s
             |  FROM range(6) r1(i), range(64) r2(j)
             |), e AS (
             |  SELECT vec_id,
             |         unnest(range(0, len(embedding))) AS j,
             |         CAST(floor(unnest(embedding::DOUBLE[]) * 1000000 + 0.5) AS BIGINT) AS xe6
             |  FROM embeddings
             |), p AS (
             |  SELECT vec_id, i, sum(xe6 * s) AS c
             |  FROM e JOIN m USING (j)
             |  GROUP BY vec_id, i
             |), b AS (
             |  SELECT vec_id,
             |         CAST(sum(CASE WHEN c > 0 THEN (CAST(1 AS BIGINT) << (5 - i)) ELSE 0 END) AS BIGINT) AS bucket
             |  FROM p GROUP BY vec_id
             |), qb AS (
             |  SELECT vec_id AS qid, bucket FROM b WHERE vec_id % 50 = 0
             |), probes AS (
             |  SELECT qid, bucket FROM qb
             |  UNION ALL
             |  SELECT qid, xor(bucket, CAST(1 AS BIGINT) << pos)
             |  FROM qb, range(6) r(pos)
             |), cand AS (
             |  SELECT pr.qid, cb.vec_id AS nid,
             |         round(list_cosine_similarity(qe.embedding::DOUBLE[], ne.embedding::DOUBLE[]), 6) AS cosine
             |  FROM probes pr
             |  JOIN b cb USING (bucket)
             |  JOIN embeddings qe ON qe.vec_id = pr.qid
             |  JOIN embeddings ne ON ne.vec_id = cb.vec_id
             |  WHERE cb.vec_id <> pr.qid
             |)
             |SELECT qid, CAST(rnk AS BIGINT) AS rnk, nid, cosine FROM (
             |  SELECT qid, nid, cosine,
             |         row_number() OVER (PARTITION BY qid ORDER BY cosine DESC, nid) AS rnk
             |  FROM cand)
             |WHERE rnk <= 5""".stripMargin)),

    // Fixed-size per-source uniform sample (exactly 20 docs per source)
    // via bottom-k of the md5(id:salt) permutation, collected by the
    // bounded-heap aggregate — ≤ 20 rows per (source, map task) cross
    // the shuffle where the window form moves the corpus. The oracle is
    // that window form.
    "ext82_group_sample" -> Q(
      (s, d) => graft.operators.Sampling.groupSample(
          docs(s, d).select(col("doc_id"), col("source")),
          "doc_id", "source", n = 20, salt = "eval")
        .select(col("doc_id"), col("source"), col("sample_key")),
      Some("""SELECT doc_id, source, k AS sample_key FROM (
             |  SELECT doc_id, source, md5(doc_id || ':eval') AS k,
             |         row_number() OVER (PARTITION BY source
             |           ORDER BY md5(doc_id || ':eval'), doc_id) AS rn
             |  FROM documents)
             |WHERE rn <= 20""".stripMargin)),

    "ext81_ivf_indexed" -> Q(
      (s, d) => {
        val base = s"/tmp/graft-fw/${d.replaceAll("[^A-Za-z0-9]", "_")}/annindex"
        val p = new org.apache.hadoop.fs.Path(base)
        val fs = p.getFileSystem(s.sparkContext.hadoopConfiguration)
        if (fs.exists(p)) fs.delete(p, true)
        val yaml =
          s"""job:
             |  name: ann-index
             |  type: python-script
             |variables:
             |  default:
             |    in: $d/embeddings.parquet
             |    out: $base/index
             |    k: "8"
             |    iters: "3"
             |script_class: graft.script.AnnIndexJob
             |""".stripMargin
        graft.engine.Engine.run(s, graft.config.ConfigParser.parse(yaml), "default")
        val index = s.read.parquet(s"$base/index")
        val all = emb(s, d)
        Similarity.ivfTopKIndexed(all, all.filter(col("vec_id") % 50 === 0),
          index, "vec_id", "embedding", k = 5, nProbe = 2)
      },
      Some(ivfIndexedOracle(k = 8, iters = 3, dims = 64, nProbe = 2, topK = 5))),

    // Incremental IVF index maintenance (r10 verdict #6): ext81's
    // persisted index refit from scratch on every arrival batch; here
    // the index is fit ONCE on v1 of a versioned corpus, a v2 append's
    // delta (changesBetween — reads only the appended files) is
    // assigned to the EXISTING cells, and the fold is asserted
    // identical (two-sided except) to reassigning the whole corpus —
    // the ext127 star-edge discipline on the ANN index: a 0.1% daily
    // append costs a delta projection, never a corpus refit. The drift
    // trigger is exercised both ways: the in-distribution delta stays
    // under threshold (incremental path), a 7x+3-shifted copy reads
    // ~49x drift and REFUSES the incremental path. Oracle: fit on the
    // v1 subset (fitWhere), assign all — the oracle never sees which
    // path built the table, the requires pin that.
    "ext148_ivf_incremental" -> Q(
      (s, d) => {
        val base = s"/tmp/graft-fw/${d.replaceAll("[^A-Za-z0-9]", "_")}/ivfinc"
        val p = new org.apache.hadoop.fs.Path(base)
        val fs = p.getFileSystem(s.sparkContext.hadoopConfiguration)
        if (fs.exists(p)) fs.delete(p, true)
        val all = emb(s, d)
        val corpusLoc = s"$base/corpus"
        graft.sinks.VersionedTable.commit(s, corpusLoc,
          all.filter(col("vec_id") % 5 =!= 0), "overwrite")
        val v1 = graft.sinks.VersionedTable.read(s, corpusLoc)
        graft.operators.Clustering.kmeansCentroids(v1, "vec_id", "embedding", k = 8, iters = 3)
          .write.mode("overwrite").parquet(s"$base/index")
        val index = s.read.parquet(s"$base/index")
        val fitAssign = graft.operators.Clustering.ivfAssign(v1, "vec_id", "embedding", index)
        val baseline = graft.operators.Clustering.meanSqDist(fitAssign)
        graft.sinks.VersionedTable.commit(s, corpusLoc,
          all.filter(col("vec_id") % 5 === 0), "append")
        val delta = graft.sinks.VersionedTable
          .changesBetween(s, corpusLoc, 1L, 2L)
          .select("vec_id", "embedding")
        val inc = graft.operators.Clustering.ivfMaintainIncremental(
          delta, "vec_id", "embedding", index, baseline, maxDriftMilli = 2000)
        require(!inc.refitNeeded,
          s"ext148: in-distribution delta must sit under the drift threshold, read ${inc.driftMilli}")
        // (r15 negative result, kept for the record: eagerly
        // localCheckpoint-ing `folded` and `full` to dedup their lazy
        // re-executions measured WORSE — focused median-of-5 5.24 s →
        // 7.57 s — the two extra SERIAL materialization jobs cost more
        // than the duplicate in-job evaluations they saved on these
        // cheap nodes-sized frames. Reverted; do not retry.)
        val folded = fitAssign.unionByName(inc.assignments)
        // the fold == reassigning the whole corpus (exact integer space)
        val full = graft.operators.Clustering.ivfAssign(
          graft.sinks.VersionedTable.read(s, corpusLoc),
          "vec_id", "embedding", index)
        // one action instead of two: both directions empty ⟺ their
        // union is empty (r14 optimization pass — same check, one job)
        require(folded.exceptAll(full).unionAll(full.exceptAll(folded)).isEmpty,
          "ext148: incremental fold must equal the full reassignment below the drift threshold")
        // the honesty valve: a shifted distribution must demand a refit
        val shifted = delta.select(col("vec_id"),
          transform(col("embedding"),
            x => (x.cast("double") * lit(7.0) + lit(3.0)).cast("float")).as("embedding"))
        val hot = graft.operators.Clustering.ivfMaintainIncremental(
          shifted, "vec_id", "embedding", index, baseline, maxDriftMilli = 2000)
        require(hot.refitNeeded,
          s"ext148: a 7x+3-shifted delta must trip the drift trigger, read ${hot.driftMilli}")
        val sizes = folded.groupBy("cluster")
          .agg(count(lit(1)).as("cluster_size"))
        folded.join(broadcast(sizes), "cluster")
          .select(col("vec_id"), col("cluster"), col("cluster_size"))
      },
      Some(kmeansCtes(8, 3, 64, fitWhere = "id % 5 <> 0") + """
        |SELECT f.id AS vec_id, CAST(f.cid AS INT) AS cluster,
        |       CAST(s.n AS BIGINT) AS cluster_size
        |FROM fin f JOIN (SELECT cid, count(*) AS n FROM fin GROUP BY cid) s USING (cid)""".stripMargin)),

    // Multinomial Naive Bayes corpus classifier (train on 80%, classify
    // the held-out 20% by source) — the oracle-replayable analog of the
    // fastText-style quality/domain classifier curation pipelines train
    // (cc_net buckets, domain routing). Add-one smoothing, integer
    // milli-nat scores (the cosine-6dp cross-engine discipline applied
    // to ln), alphabetical tie-break, margin = best − runner-up (the
    // confidence a selection threshold cuts on). Scale: two map-side
    // counts + a token-equality-keyed score join; classes are COLUMNS
    // (k-row collected meta is the documented bound).
    "ext149_nb_classifier" -> Q(
      (s, d) => {
        val all = docs(s, d)
        TextAnalysis.nbClassify(
          all.filter(col("doc_id") % 5 =!= 0),
          all.filter(col("doc_id") % 5 === 0),
          "doc_id", "text", "source")
      },
      Some(NbVerdictCtes + """
             |SELECT doc_id, label_actual, pred_label, is_match, margin_milli
             |FROM verdict""".stripMargin)),

    // The evaluation report over ext149's verdicts — support, predicted
    // count, correct count, integer-milli precision/recall/F1 per class:
    // the confusion-derived gate a curation pipeline applies before
    // trusting a classifier's selections. Two map-side aggregates over
    // the verdict frame, full-joined on the k labels (a never-predicted
    // class reports precision 0, not a divide-by-zero).
    "ext150_nb_eval" -> Q(
      (s, d) => {
        val all = docs(s, d)
        TextAnalysis.nbEvaluate(TextAnalysis.nbClassify(
          all.filter(col("doc_id") % 5 =!= 0),
          all.filter(col("doc_id") % 5 === 0),
          "doc_id", "text", "source"))
      },
      Some(NbVerdictCtes + """
             |, ba AS (SELECT label_actual AS label, count(*) AS n_actual,
             |                sum(CASE WHEN is_match THEN 1 ELSE 0 END) AS n_correct
             |         FROM verdict GROUP BY 1),
             |bp AS (SELECT pred_label AS label, count(*) AS n_pred FROM verdict GROUP BY 1),
             |m AS (SELECT coalesce(ba.label, bp.label) AS label,
             |             coalesce(n_actual, 0) AS n_actual,
             |             coalesce(n_pred, 0) AS n_pred,
             |             coalesce(n_correct, 0) AS n_correct
             |      FROM ba FULL JOIN bp ON ba.label = bp.label),
             |pr AS (SELECT label, CAST(n_actual AS BIGINT) AS n_actual,
             |              CAST(n_pred AS BIGINT) AS n_pred,
             |              CAST(n_correct AS BIGINT) AS n_correct,
             |              CASE WHEN n_pred = 0 THEN 0
             |                   ELSE (1000 * n_correct) // n_pred END AS precision_milli,
             |              CASE WHEN n_actual = 0 THEN 0
             |                   ELSE (1000 * n_correct) // n_actual END AS recall_milli
             |       FROM m)
             |SELECT label, n_actual, n_pred, n_correct,
             |       CAST(precision_milli AS BIGINT) AS precision_milli,
             |       CAST(recall_milli AS BIGINT) AS recall_milli,
             |       CAST(CASE WHEN precision_milli + recall_milli = 0 THEN 0
             |            ELSE (2 * precision_milli * recall_milli) // (precision_milli + recall_milli)
             |            END AS BIGINT) AS f1_milli
             |FROM pr""".stripMargin)),

    // Unigram-LM tokenizer training (SentencePiece's model family as
    // deterministic hard-EM — Kudo ACL'18), completing the trainer trio
    // beside BPE (ext130) and WordPiece (ext137): substring-seeded
    // piece inventory → Viterbi E-step (longest-piece tie rule, the
    // chosen segmentation carried as a string so usage recounts without
    // backtracking) → usage M-step with the single-char floor →
    // top-vocabSize prune. Integer milli-nat scores; the oracle unrolls
    // the whole loop (seed + per-position forward DP CTEs + recount).
    "ext151_unigram_train" -> Q(
      (s, d) => TextAnalysis.unigramTrain(docs(s, d), "doc_id", "text",
        vocabSize = 64, iters = 1),
      Some(unigramTrainCtes(64, 1, 4096, 4, 12) + """
        |SELECT piece, CAST(cnt AS BIGINT) AS n_count,
        |       CAST(floor(1000 * ln(cnt::DOUBLE /
        |         (SELECT sum(cnt) FROM v1)) + 0.5) AS BIGINT) AS log_milli
        |FROM v1""".stripMargin)),

    // Unigram DEPTH (r11 verdict #5): a SECOND hard-EM iteration under
    // PRUNING PRESSURE — vocabSize 32 halves the multi-char inventory,
    // so the iteration-2 recount re-ranks against a genuinely pruned
    // piece set (scores from v1's survivors, Viterbi re-segmentation,
    // recount, re-prune). The oracle unrolls BOTH EM loops as forward-DP
    // CTE chains (the generator parameterizes depth); the tiny-vocab
    // floor/survival laws are pinned in TextAnalysisSpec.
    "ext157_unigram_train2" -> Q(
      (s, d) => TextAnalysis.unigramTrain(docs(s, d), "doc_id", "text",
        vocabSize = 32, iters = 2),
      Some(unigramTrainCtes(32, 2, 4096, 4, 12) + """
        |SELECT piece, CAST(cnt AS BIGINT) AS n_count,
        |       CAST(floor(1000 * ln(cnt::DOUBLE /
        |         (SELECT sum(cnt) FROM v2)) + 0.5) AS BIGINT) AS log_milli
        |FROM v2""".stripMargin)),

    // The apply pass + the CCNet-style LM-score filter: every document
    // Viterbi-segmented under the trained unigram model (the model a
    // MAP LITERAL in the plan, the whole DP one narrow aggregate()
    // expression — no join, no shuffle before the per-doc sum), with
    // per-doc subword fragmentation AND the unigram log-likelihood
    // (exactly-replayable perplexity filtering, no KenLM binary).
    // OOV characters take the UNK score ln(1/total).
    "ext152_unigram_segment" -> Q(
      (s, d) => TextAnalysis.unigramSegment(docs(s, d), "doc_id", "text",
        vocabSize = 64, iters = 1),
      Some(UnigramSegmentOracle)),

    // The "data card" table a training-data release ships — one row per
    // source composing the engine's own curation operators: volume
    // (docs, tokens/doc, chars/doc), the ext128 exact-dup family rates,
    // and the majority language with its share (count DESC, lang tie
    // rule). Three map-side aggregations joined on |slices|-row frames.
    "ext153_corpus_report" -> Q(
      (s, d) => TextAnalysis.corpusReport(docs(s, d), "doc_id", "text",
        "source", "lang"),
      Some("""WITH vol AS (
             |  SELECT source, count(*) AS n_docs,
             |         sum(len(regexp_split_to_array(trim(text), '\s+'))) AS n_tokens,
             |         sum(length(text)) AS n_chars
             |  FROM documents GROUP BY 1
             |), h AS (
             |  SELECT source, doc_id, md5(text) AS h FROM documents
             |), fam AS (
             |  SELECT h, count(*) AS n_copies, min(doc_id) AS keeper_id
             |  FROM h GROUP BY 1
             |), dup AS (
             |  SELECT source,
             |         (1000 * sum(CASE WHEN n_copies > 1 THEN 1 ELSE 0 END)) // count(*) AS dup_milli,
             |         (1000 * sum(CASE WHEN doc_id <> keeper_id THEN 1 ELSE 0 END)) // count(*) AS redundant_milli
             |  FROM h JOIN fam USING (h) GROUP BY source
             |), lg AS (
             |  SELECT source, lang AS top_lang, cnt AS top_lang_n FROM (
             |    SELECT source, lang, count(*) AS cnt,
             |           row_number() OVER (PARTITION BY source
             |             ORDER BY count(*) DESC, lang) AS rk
             |    FROM documents GROUP BY source, lang) WHERE rk = 1
             |)
             |SELECT v.source, CAST(v.n_docs AS BIGINT) AS n_docs,
             |       CAST(v.n_tokens AS BIGINT) AS n_tokens,
             |       CAST((1000 * v.n_tokens) // v.n_docs AS BIGINT) AS tokens_per_doc_milli,
             |       CAST((1000 * v.n_chars) // v.n_docs AS BIGINT) AS chars_per_doc_milli,
             |       CAST(d.dup_milli AS BIGINT) AS dup_milli,
             |       CAST(d.redundant_milli AS BIGINT) AS redundant_milli,
             |       l.top_lang,
             |       CAST((1000 * l.top_lang_n) // v.n_docs AS BIGINT) AS top_lang_milli
             |FROM vol v JOIN dup d USING (source) JOIN lg l USING (source)""".stripMargin))
  )

  /** FIXED-QUERY-PANEL twins of ext44/ext99 (r11 verdict #3): retrieval
    * serving a PINNED query panel while the corpus grows — the workload
    * shape the BASELINE note previously ARGUED reads ~flat (ext44/ext99
    * grow queries ×10 AND postings ×10, so their ~19× 10× readings are
    * linear-in-grown-workload, not quadratic; this pair MEASURES the
    * panel-pinned claim). The `doc_id < 10000000` bound is a no-op at
    * every oracle SF (all base doc_ids sit below it) — the twins share
    * ext44/ext99's oracles verbatim — but under the ScaleCheck
    * generator's +i·10M id shift it pins the panel to the base copy
    * while the corpus side still grows ×10. */
  private def fixedPanelTwins: Seq[(String, Q)] = {
    def oracleOf(name: String): Option[String] =
      base.collectFirst { case (n, q) if n == name => q }.flatMap(_.oracle)
    def panel(scorer: (DataFrame, DataFrame) => DataFrame)
        : (SparkSession, String) => DataFrame = (s, d) => {
      val all = docs(s, d)
      scorer(all.filter(col("doc_id") % 50 =!= 0),
        all.filter(col("doc_id") % 50 === 0 && col("doc_id") < 10000000L))
    }
    Seq(
      "ext155_tfidf_fixed_panel" -> Q(
        panel(TextAnalysis.tfidfTopK(_, _, "doc_id", "text", k = 5)),
        oracleOf("ext44_tfidf_topk")),
      "ext156_bm25_fixed_panel" -> Q(
        panel(TextAnalysis.bm25TopK(_, _, "doc_id", "text", k = 5)),
        oracleOf("ext99_bm25_topk")))
  }

  /** INDEXED twins of ext155/ext156 (r12 verdict #1 — the round-12
    * weak mark): the same pinned query panel, but the probe reads a
    * PERSISTED posting-list/df/stats index
    * ([[graft.operators.TextAnalysis.writeLexicalIndex]]) instead of
    * re-tokenizing the corpus — built once per corpus-file fingerprint
    * through the A17 script-job surface
    * ([[graft.script.LexicalIndexJob]], the ext81 persisted-IVF
    * pattern) and reused until the corpus file changes (length+mtime
    * key). Output is identical to the direct operators, so the pair
    * shares ext44/ext99's oracles verbatim like ext155/ext156 do; the
    * scale claim (probe sheds the corpus-linear tokenize+df terms) is
    * measured in ScaleCheck with the index present — the build cost is
    * the ETL-time line, not the query-time one. */
  /** Build-if-absent of the panel corpus' lexical index (corpus =
    * `doc_id % 50 <> 0`, the ext44/ext155 split), fingerprint-keyed on
    * the corpus file's (length, mtime) so a regenerated fixture
    * rebuilds and an unchanged one probes the existing index — the
    * persisted-index lifecycle ext158–ext161 share. */
  private def ensureLexIndex(s: SparkSession, d: String): String = {
    val src = new org.apache.hadoop.fs.Path(s"$d/documents.parquet")
    val fs = src.getFileSystem(s.sparkContext.hadoopConfiguration)
    val st = fs.getFileStatus(src)
    val loc = s"/tmp/graft-fw/${d.replaceAll("[^A-Za-z0-9]", "_")}" +
      s"/lexindex/${st.getLen}_${st.getModificationTime}"
    // layout-versioned marker (the ScaleCheck _SCALE_DONE_v2 rule): an
    // index built by an older writer rebuilds instead of silently
    // re-measuring the superseded one-file-per-bucket layout
    val done = new org.apache.hadoop.fs.Path(s"$loc/_INDEX_DONE_v2")
    if (!fs.exists(done)) {
      val p = new org.apache.hadoop.fs.Path(loc)
      if (fs.exists(p)) fs.delete(p, true)
      val yaml =
        s"""job:
           |  name: lexical-index
           |  type: python-script
           |variables:
           |  default:
           |    in: $d/documents.parquet
           |    out: $loc
           |    where: "doc_id % 50 <> 0"
           |script_class: graft.script.LexicalIndexJob
           |""".stripMargin
      graft.engine.Engine.run(s, graft.config.ConfigParser.parse(yaml), "default")
      fs.create(done).close()
    }
    loc
  }

  private def indexedPanelTwins: Seq[(String, Q)] = {
    def oracleOf(name: String): Option[String] =
      base.collectFirst { case (n, q) if n == name => q }.flatMap(_.oracle)
    def panel(s: SparkSession, d: String): DataFrame =
      docs(s, d).filter(col("doc_id") % 50 === 0 && col("doc_id") < 10000000L)
    Seq(
      "ext158_tfidf_indexed" -> Q(
        (s, d) => TextAnalysis.tfidfTopKIndexed(s, ensureLexIndex(s, d),
          panel(s, d), "doc_id", "text", k = 5),
        oracleOf("ext44_tfidf_topk")),
      "ext159_bm25_indexed" -> Q(
        (s, d) => TextAnalysis.bm25TopKIndexed(s, ensureLexIndex(s, d),
          panel(s, d), "doc_id", "text", k = 5),
        oracleOf("ext99_bm25_topk")))
  }

  /** SEEK-workload pair (r13): the ~flat reading the PANEL twins cannot
    * provide on this fixture. The synthetic corpus has 31 token types
    * and every one but `dup` (df 242 at sf0.1, ~5% of docs) appears in
    * ~77% of documents — a panel probe therefore selects the ENTIRE
    * vocabulary and its exact scoring join is corpus×queries on ANY
    * index layout (the all-stopwords worst case; measured in BASELINE
    * r13). This pair pins a LITERAL two-query workload on the one rare
    * token: the direct operator still pays the corpus-linear
    * tokenize+df derivation just to serve it, while the indexed probe
    * opens one posting bucket (partition-pruned) and scores df(`dup`)
    * rows — the persisted index's actual read path, and the workload
    * class where ~flat is semantically possible. Both are value-oracled
    * with the SAME SQL (output-equality by shared oracle, the
    * ext158/ext155 discipline); the literal queries are perfectly
    * pinned under the ScaleCheck id shift. */
  /** The literal seek workload shared by ext160/ext161/ext162: tf_q=2
    * on the one rare token, plus an out-of-vocabulary token that must
    * drop identically on every path. */
  private def seekQ(s: SparkSession): DataFrame = {
    import s.implicits._
    Seq((1L, "dup dup"), (2L, "dup missingtoken")).toDF("doc_id", "text")
  }

  /** The seek-pair oracle (a def — shared fragments must not be object
    * vals): the full-corpus truth of the seek workload, used verbatim
    * by the direct, indexed, and CDC-maintained probes. */
  private def seekOracle: Option[String] = Some("""WITH tk AS (
      |  SELECT doc_id, unnest(list_filter(regexp_split_to_array(trim(text), '\s+'), x -> x <> '')) AS token
      |  FROM documents
      |), tf AS (
      |  SELECT doc_id, token, count(*) AS c FROM tk GROUP BY 1, 2
      |), cc AS (
      |  SELECT * FROM tf WHERE doc_id % 50 <> 0
      |), qq AS (
      |  SELECT CAST(q AS BIGINT) AS q_id, tok AS token, CAST(tfq AS BIGINT) AS tf_q
      |  FROM (VALUES (1, 'dup', 2), (2, 'dup', 1)) t(q, tok, tfq)
      |), dfreq AS (
      |  SELECT token, count(*) AS df FROM cc GROUP BY token
      |), n AS (
      |  SELECT count(DISTINCT doc_id) AS n_docs FROM cc
      |), idf AS (
      |  SELECT token, CAST(floor(1000000.0 * n.n_docs / df + 0.5) AS BIGINT) AS idf_e6
      |  FROM dfreq CROSS JOIN n
      |), qsel AS (
      |  SELECT q_id, token, tf_q FROM (
      |    SELECT qq.q_id, qq.token, qq.tf_q,
      |           row_number() OVER (PARTITION BY qq.q_id
      |             ORDER BY d.df ASC, qq.token ASC) AS trnk
      |    FROM qq JOIN dfreq d USING (token))
      |  WHERE trnk <= 16
      |), sc AS (
      |  SELECT qsel.q_id, cc.doc_id,
      |         CAST(sum(qsel.tf_q * cc.c * idf.idf_e6) AS BIGINT) AS score_e6,
      |         count(*) AS n_terms
      |  FROM qsel JOIN cc USING (token) JOIN idf ON idf.token = qsel.token
      |  GROUP BY 1, 2
      |), r AS (
      |  SELECT *, row_number() OVER (PARTITION BY q_id
      |                               ORDER BY score_e6 DESC, doc_id) AS rnk
      |  FROM sc
      |)
      |SELECT q_id, doc_id, score_e6, n_terms, rnk FROM r WHERE rnk <= 5""".stripMargin)

  private def seekTwins: Seq[(String, Q)] =
    Seq(
      "ext160_lexseek_direct" -> Q(
        (s, d) => TextAnalysis.tfidfTopK(
          docs(s, d).filter(col("doc_id") % 50 =!= 0), seekQ(s),
          "doc_id", "text", k = 5),
        seekOracle),
      "ext161_lexseek_indexed" -> Q(
        (s, d) => TextAnalysis.tfidfTopKIndexed(s, ensureLexIndex(s, d),
          seekQ(s), "doc_id", "text", k = 5),
        seekOracle),

      // CDC-FED INDEX MAINTENANCE driven end-to-end (r13 verdict #3):
      // the lifecycle ext148 pins for the IVF index, on the lexical
      // index through the VERIFY surface — a versioned corpus table's
      // bootstrap drain builds the base index, its append commit's
      // delta drain feeds appendToLexicalIndex (base posting files
      // REQUIREd to survive BY NAME — the append writes ∝ delta, never
      // re-tokenizing the base), and the maintained index serves the
      // seek probe against the SAME full-corpus oracle as the
      // from-scratch-indexed twin ext161 — equality-to-rebuild by
      // shared oracle, the ext158/ext155 discipline. The delta is the
      // PINNED id slice (doc_id < 10^7, stable under the ScaleCheck id
      // shift), so at 10x/30x the base grows while the maintained
      // delta stays fixed — the decomposition behind the
      // delta-proportional claim.
      "ext162_lexindex_cdc" -> Q(
        (s, d) => {
          val base = s"/tmp/graft-fw/${d.replaceAll("[^A-Za-z0-9]", "_")}/lexcdc"
          val p = new org.apache.hadoop.fs.Path(base)
          val fs = p.getFileSystem(s.sparkContext.hadoopConfiguration)
          if (fs.exists(p)) fs.delete(p, true)
          val tbl = s"$base/tbl"; val ckpt = s"$base/ckpt"; val idx = s"$base/idx"
          val corpus = docs(s, d).filter(col("doc_id") % 50 =!= 0)
            .select(col("doc_id"), col("text"))
          val isDelta = col("doc_id") % 7 === 3 && col("doc_id") < 10000000L
          graft.sinks.VersionedTable.commit(s, tbl, corpus.filter(!isDelta),
            "overwrite")
          val r1 = graft.streaming.Streams.drainVersionedChanges(s, tbl, ckpt) {
            (df, _, _) => TextAnalysis.writeLexicalIndex(
              df.select(col("doc_id"), col("text")), "doc_id", "text", idx)
          }
          require(r1.contains((0L, 1L)),
            s"ext162: the bootstrap drain must build from v1, got $r1")
          val basePostings = fs.globStatus(
            new org.apache.hadoop.fs.Path(s"$idx/postings/tb=*/part-*"))
            .map(_.getPath.toString).toSet
          graft.sinks.VersionedTable.commit(s, tbl, corpus.filter(isDelta),
            "append")
          val r2 = graft.streaming.Streams.drainVersionedChanges(s, tbl, ckpt) {
            (df, _, _) => TextAnalysis.appendToLexicalIndex(
              df.select(col("doc_id"), col("text")), "doc_id", "text", idx)
          }
          require(r2.contains((1L, 2L)),
            s"ext162: the delta drain must cover exactly the append commit, got $r2")
          val afterPostings = fs.globStatus(
            new org.apache.hadoop.fs.Path(s"$idx/postings/tb=*/part-*"))
            .map(_.getPath.toString).toSet
          require(basePostings.subsetOf(afterPostings) &&
            afterPostings.size > basePostings.size,
            "ext162: the delta append must add posting files without " +
              "rewriting a base file (delta-proportional bytes)")
          TextAnalysis.tfidfTopKIndexed(s, idx, seekQ(s), "doc_id", "text", k = 5)
        },
        seekOracle))

  /** Persisted MinHash-LSH index lifecycle (r14): the third persisted
    * index tier (IVF ext81/ext148, lexical ext158–ext162, now LSH) —
    * the shingle→signature→band derivation every [[Dedup.minhashLsh]]
    * run re-pays is built once from a versioned corpus table's
    * bootstrap CDC drain, the un-indexed delta is PROBED against it
    * (new-vs-corpus candidates from the signature-sized bands table,
    * Jaccard verification partition-pruned to the candidates' doc
    * buckets — the corpus is never re-shingled), the delta drain then
    * maintains the index in place (base files REQUIREd to survive by
    * name), and the maintained index's full self-dedup shares ext03's
    * exact all-pairs oracle verbatim — rebuild equality by shared
    * oracle, the ext162 discipline. The probe is REQUIREd equal to
    * the cross slice (exactly one endpoint in the delta) of the full
    * truth. */
  private def minhashIndexLifecycle: Seq[(String, Q)] = {
    def oracleOf(name: String): Option[String] =
      base.collectFirst { case (n, q) if n == name => q }.flatMap(_.oracle)
    Seq(
      "ext163_minhash_cdc" -> Q(
        (s, d) => {
          val root = s"/tmp/graft-fw/${d.replaceAll("[^A-Za-z0-9]", "_")}/mhcdc"
          val p = new org.apache.hadoop.fs.Path(root)
          val fs = p.getFileSystem(s.sparkContext.hadoopConfiguration)
          if (fs.exists(p)) fs.delete(p, true)
          val tbl = s"$root/tbl"; val ckpt = s"$root/ckpt"; val idx = s"$root/idx"
          val corpus = docs(s, d).select(col("doc_id"), col("text"))
          val isDelta = col("doc_id") % 5 === 2
          graft.sinks.VersionedTable.commit(s, tbl, corpus.filter(!isDelta),
            "overwrite")
          val r1 = graft.streaming.Streams.drainVersionedChanges(s, tbl, ckpt) {
            (df, _, _) => Dedup.writeMinHashIndex(
              df.select(col("doc_id"), col("text")), "doc_id", "text", idx)
          }
          require(r1.contains((0L, 1L)),
            s"ext163: the bootstrap drain must build from v1, got $r1")
          val baseFiles = fs.globStatus(
            new org.apache.hadoop.fs.Path(s"$idx/bands/band_idx=*/part-*"))
            .map(_.getPath.toString).toSet
          // probe the UN-INDEXED delta against the indexed base —
          // PINNED before the append mutates the index under the plan
          val probed = Dedup.probeMinHashIndex(s, idx,
              corpus.filter(isDelta), "doc_id", "text", threshold = 0.8)
            .select(least(col("doc_a"), col("doc_b")).as("doc_a"),
              greatest(col("doc_a"), col("doc_b")).as("doc_b"),
              col("jaccard"))
            .localCheckpoint()
          graft.sinks.VersionedTable.commit(s, tbl, corpus.filter(isDelta),
            "append")
          val r2 = graft.streaming.Streams.drainVersionedChanges(s, tbl, ckpt) {
            (df, _, _) => Dedup.appendToMinHashIndex(
              df.select(col("doc_id"), col("text")), "doc_id", "text", idx)
          }
          require(r2.contains((1L, 2L)),
            s"ext163: the delta drain must cover exactly the append commit, got $r2")
          val afterFiles = fs.globStatus(
            new org.apache.hadoop.fs.Path(s"$idx/bands/band_idx=*/part-*"))
            .map(_.getPath.toString).toSet
          require(baseFiles.subsetOf(afterFiles) &&
            afterFiles.size > baseFiles.size,
            "ext163: the delta append must add band files without " +
              "rewriting a base file (delta-proportional bytes)")
          // r15 (guide §1.2 — don't compute things three times): the
          // full self-dedup fed BOTH sides of the equality REQUIRE (two
          // executions inside the one union job) and was then returned
          // as the query output (a third). One pairs-sized eager
          // checkpoint; the REQUIRE and the returned plan read it.
          val full = Dedup.lshPairsIndexed(s, idx, threshold = 0.8)
            .localCheckpoint()
          // the probe is exactly the cross slice of the full truth
          val cross = full.filter(
            (col("doc_a") % 5 === 2) =!= (col("doc_b") % 5 === 2))
          // one action instead of two: both directions empty ⟺ their
          // union is empty (r14 optimization pass — same check, one job)
          require(probed.exceptAll(cross).unionAll(cross.exceptAll(probed)).isEmpty,
            "ext163: the pre-append probe must equal the cross slice of " +
              "the maintained index's full self-dedup")
          full
        },
        oracleOf("ext03_minhash_lsh")))
  }

  val all: Seq[(String, Q)] =
    base ++ fixedPanelTwins ++ indexedPanelTwins ++ seekTwins ++
      minhashIndexLifecycle

  /** ext152's full train+apply oracle — shared verbatim with the
    * streaming twin st53 (a def: referenced from the Seq above). */
  private[queries] def UnigramSegmentOracle: String =
    unigramTrainCtes(64, 1, 4096, 4, 12) + ",\n" +
      unigramApplyCtes(1, 4, 12) + """
        |, dw AS (
        |  SELECT doc_id, lower(unnest(regexp_split_to_array(trim(text), '\s+'))) AS w
        |  FROM documents)
        |SELECT doc_id,
        |       CAST(count(*) AS BIGINT) AS n_words,
        |       CAST(sum(c) AS BIGINT) AS n_subwords,
        |       CAST(sum(b) AS BIGINT) AS ll_milli,
        |       CAST((1000 * sum(c)) // count(*) AS BIGINT) AS subwords_per_word_milli
        |FROM dw JOIN wstats USING (w)
        |GROUP BY doc_id""".stripMargin

  /** The DuckDB replay of the full NB train+score lifecycle (ext149 /
    * ext150 / st52 — ONE definition, the BoilerSentence discipline),
    * ending in `verdict(doc_id, label_actual, pred_label, is_match,
    * margin_milli)`. Tokenize = the Scala `words` split; smoothing,
    * milli-nat floor(1000·ln + 0.5), (score DESC, label) argmax and the
    * rk=2 runner-up margin all mirror `TextAnalysis.nbClassify`. */
  /** DuckDB replay of [[graft.operators.TextAnalysis.unigramTrain]] —
    * the hard-EM loop as unrolled CTEs (the kmeans/pagerank/BPE
    * discipline): seed substring counts → per-iteration scores →
    * Viterbi forward DP over word positions 1..maxWordLen (each
    * position one CTE; the winning candidate by (total DESC, start) —
    * the longest-piece tie rule; the chosen SEGMENTATION rides along
    * as a '|'-joined string so usage recounting needs no backtracking)
    * → usage + char floor + top-vocabSize prune. Ends in
    * `v{iters}(piece, cnt)` and keeps `dict0`/`dict`/`chars` visible
    * for the apply replay. Every multiply-referenced CTE is pinned
    * MATERIALIZED (the round-8 wordpiece inlining lesson). */
  private def unigramTrainCtes(vocabSize: Int, iters: Int, topWords: Int,
                               maxPieceLen: Int, maxWordLen: Int): String = {
    def prune(src: String): String =
      s"""SELECT piece, cnt FROM (
         |    SELECT piece, cnt, row_number() OVER (ORDER BY cnt DESC, piece) AS rk
         |    FROM $src WHERE length(piece) > 1) WHERE rk <= $vocabSize
         |  UNION ALL
         |  SELECT piece, cnt FROM $src WHERE length(piece) = 1""".stripMargin
    val head =
      s"""WITH dict0 AS MATERIALIZED (
         |  SELECT w, count(*) AS freq FROM (
         |    SELECT lower(unnest(regexp_split_to_array(trim(text), '\\s+'))) AS w
         |    FROM documents) t
         |  WHERE regexp_full_match(w, '[a-z0-9]+') AND length(w) <= $maxWordLen
         |  GROUP BY w),
         |dict AS MATERIALIZED (
         |  SELECT w, freq FROM dict0 ORDER BY freq DESC, w LIMIT $topWords),
         |vsrc0 AS MATERIALIZED (
         |  SELECT piece, sum(freq) AS cnt FROM (
         |    SELECT substr(d.w, ss.i, ll.l) AS piece, d.freq
         |    FROM dict d,
         |         (SELECT unnest(range(1, ${maxWordLen + 1})) AS i) ss,
         |         (SELECT unnest(range(1, ${maxPieceLen + 1})) AS l) ll
         |    WHERE ss.i + ll.l - 1 <= length(d.w))
         |  GROUP BY piece),
         |v0 AS MATERIALIZED (
         |  ${prune("vsrc0")}),
         |chars AS MATERIALIZED (
         |  SELECT DISTINCT substr(w, ii.i, 1) AS piece
         |  FROM dict, (SELECT unnest(range(1, ${maxWordLen + 1})) AS i) ii
         |  WHERE ii.i <= length(w))""".stripMargin
    val iterations = (1 to iters).map { t =>
      val dp = (1 to maxWordLen).map { i =>
        val lo = math.max(1, i - maxPieceLen + 1)
        s"""f${t}_$i AS (
           |  SELECT w, freq, $i AS pos, b, seg FROM (
           |    SELECT d.w, d.freq, fa.b + v.milli AS b,
           |           fa.seg || '|' || substr(d.w, jj.j, $i - jj.j + 1) AS seg,
           |           row_number() OVER (PARTITION BY d.w
           |             ORDER BY fa.b + v.milli DESC, jj.j) AS rn
           |    FROM dict d
           |    CROSS JOIN (SELECT unnest(range($lo, ${i + 1})) AS j) jj
           |    JOIN fa${t}_${i - 1} fa ON fa.w = d.w AND fa.pos = jj.j - 1
           |    JOIN s$t v ON v.piece = substr(d.w, jj.j, $i - jj.j + 1)
           |    WHERE length(d.w) >= $i
           |  ) WHERE rn = 1),
           |fa${t}_$i AS MATERIALIZED (
           |  SELECT * FROM fa${t}_${i - 1} UNION ALL SELECT * FROM f${t}_$i)""".stripMargin
      }.mkString(",\n")
      s"""s$t AS MATERIALIZED (
         |  SELECT piece, CAST(floor(1000 * ln(cnt::DOUBLE /
         |    (SELECT sum(cnt) FROM v${t - 1})) + 0.5) AS BIGINT) AS milli
         |  FROM v${t - 1}),
         |fa${t}_0 AS (
         |  SELECT w, freq, 0 AS pos, CAST(0 AS BIGINT) AS b, '' AS seg FROM dict),
         |$dp,
         |u$t AS (
         |  SELECT piece, sum(freq) AS cnt FROM (
         |    SELECT unnest(string_split(substr(seg, 2), '|')) AS piece, freq
         |    FROM fa${t}_$maxWordLen WHERE pos = length(w))
         |  GROUP BY piece),
         |vsrc$t AS MATERIALIZED (
         |  SELECT coalesce(u.piece, c.piece) AS piece,
         |         CASE WHEN length(coalesce(u.piece, c.piece)) = 1
         |              THEN greatest(coalesce(u.cnt, 0), 1) ELSE u.cnt END AS cnt
         |  FROM u$t u FULL JOIN chars c ON u.piece = c.piece
         |  WHERE coalesce(u.cnt, 0) > 0 OR length(coalesce(u.piece, c.piece)) = 1),
         |v$t AS MATERIALIZED (
         |  ${prune(s"vsrc$t")})""".stripMargin
    }
    (head +: iterations).mkString(",\n")
  }

  /** Apply-side replay ([[graft.operators.TextAnalysis.unigramSegment]]):
    * the same forward DP over the FULL word-type universe (`dict0`),
    * with the UNK single-char fallback (LEFT JOIN + coalesce — exactly
    * the Spark expression's `coalesce(m[char], unk)`), ending in
    * `wstats(w, b, c)`. */
  private def unigramApplyCtes(iters: Int, maxPieceLen: Int,
                               maxWordLen: Int): String = {
    val dp = (1 to maxWordLen).map { i =>
      val lo = math.max(1, i - maxPieceLen + 1)
      s"""g_$i AS (
         |  SELECT w, $i AS pos, b, c FROM (
         |    SELECT d.w, ga.b + coalesce(v.milli, uu.milli) AS b, ga.c + 1 AS c,
         |           row_number() OVER (PARTITION BY d.w
         |             ORDER BY ga.b + coalesce(v.milli, uu.milli) DESC, jj.j) AS rn
         |    FROM wt d
         |    CROSS JOIN (SELECT unnest(range($lo, ${i + 1})) AS j) jj
         |    JOIN ga_${i - 1} ga ON ga.w = d.w AND ga.pos = jj.j - 1
         |    LEFT JOIN sfin v ON v.piece = substr(d.w, jj.j, $i - jj.j + 1)
         |    CROSS JOIN unk uu
         |    WHERE length(d.w) >= $i AND (v.milli IS NOT NULL OR jj.j = $i)
         |  ) WHERE rn = 1),
         |ga_$i AS MATERIALIZED (
         |  SELECT * FROM ga_${i - 1} UNION ALL SELECT * FROM g_$i)""".stripMargin
    }.mkString(",\n")
    s"""total AS MATERIALIZED (SELECT sum(cnt) AS tot FROM v$iters),
       |sfin AS MATERIALIZED (
       |  SELECT piece, CAST(floor(1000 * ln(cnt::DOUBLE /
       |    (SELECT tot FROM total)) + 0.5) AS BIGINT) AS milli
       |  FROM v$iters),
       |unk AS MATERIALIZED (
       |  SELECT CAST(floor(1000 * ln(1.0 / tot) + 0.5) AS BIGINT) AS milli FROM total),
       |wt AS MATERIALIZED (SELECT w FROM dict0),
       |ga_0 AS (SELECT w, 0 AS pos, CAST(0 AS BIGINT) AS b, CAST(0 AS BIGINT) AS c FROM wt),
       |$dp,
       |wstats AS MATERIALIZED (
       |  SELECT w, b, c FROM ga_$maxWordLen WHERE pos = length(w))""".stripMargin
  }

  // a def, not a val: referenced from the query Seq above, which would
  // otherwise observe a not-yet-initialized field at object init
  private[queries] def NbVerdictCtes: String =
    """WITH tr AS (SELECT doc_id, source, text FROM documents WHERE doc_id % 5 <> 0),
      |sc AS (SELECT doc_id, source, text FROM documents WHERE doc_id % 5 = 0),
      |tok AS (SELECT source AS label, unnest(regexp_split_to_array(trim(text), '\s+')) AS token FROM tr),
      |v AS (SELECT count(DISTINCT token) AS vocab FROM tok),
      |ct AS (SELECT label, token, count(*) AS n FROM tok GROUP BY 1, 2),
      |tot AS (SELECT label, count(*) AS n_class FROM tok GROUP BY 1),
      |dtot AS (SELECT source AS label, count(*) AS n_docs FROM tr GROUP BY 1),
      |atot AS (SELECT count(*) AS nd FROM tr),
      |meta AS (
      |  SELECT t.label,
      |         CAST(floor(1000 * ln(d.n_docs::DOUBLE / a.nd) + 0.5) AS BIGINT) AS prior_milli,
      |         CAST(floor(1000 * ln(1.0 / (t.n_class + v.vocab)) + 0.5) AS BIGINT) AS default_milli
      |  FROM tot t JOIN dtot d USING (label), atot a, v),
      |model AS (
      |  SELECT c.label, c.token,
      |         CAST(floor(1000 * ln((c.n + 1)::DOUBLE / (t.n_class + v.vocab)) + 0.5) AS BIGINT) AS log_milli
      |  FROM ct c JOIN tot t USING (label), v),
      |dt AS (SELECT doc_id, label_actual, token, count(*) AS cnt FROM (
      |         SELECT doc_id, source AS label_actual,
      |                unnest(regexp_split_to_array(trim(text), '\s+')) AS token
      |         FROM sc)
      |       GROUP BY 1, 2, 3),
      |contrib AS (
      |  SELECT d.doc_id, d.label_actual, m.label,
      |         sum(d.cnt * coalesce(mo.log_milli, m.default_milli)) + max(m.prior_milli) AS score
      |  FROM dt d CROSS JOIN meta m
      |  LEFT JOIN model mo ON mo.label = m.label AND mo.token = d.token
      |  GROUP BY 1, 2, 3),
      |ranked AS (
      |  SELECT doc_id, label_actual, label, score,
      |         row_number() OVER (PARTITION BY doc_id ORDER BY score DESC, label) AS rk
      |  FROM contrib),
      |verdict AS (
      |  SELECT r1.doc_id, r1.label_actual, r1.label AS pred_label,
      |         (r1.label = r1.label_actual) AS is_match,
      |         CAST(r1.score - coalesce(r2.score, r1.score) AS BIGINT) AS margin_milli
      |  FROM ranked r1 LEFT JOIN ranked r2 ON r2.doc_id = r1.doc_id AND r2.rk = 2
      |  WHERE r1.rk = 1)""".stripMargin

  /** ext81's oracle: replay the k-means fit (the ext71 CTE machinery),
    * assign the corpus to final cells (`fin`), pick each query's nProbe
    * nearest cells by the same integer metric, and cosine-rank the
    * probed candidates — the full persisted-index IVF lifecycle in SQL. */
  private def ivfIndexedOracle(k: Int, iters: Int, dims: Int,
                               nProbe: Int, topK: Int): String = {
    val dist =
      "list_sum(list_transform(range(1, len(v.m)+1), j -> (v.m[j]-c.c[j])*(v.m[j]-c.c[j])))"
    kmeansCtes(k, iters, dims) + s"""
       |, qcells AS (
       |  SELECT id AS qid, cid FROM (
       |    SELECT v.id, c.cid,
       |           row_number() OVER (PARTITION BY v.id ORDER BY $dist, c.cid) AS rk
       |    FROM m v CROSS JOIN c$iters c
       |    WHERE v.id % 50 = 0) WHERE rk <= $nProbe
       |), probe AS (
       |  SELECT q.qid, f.id AS nid,
       |         round(list_cosine_similarity(qe.embedding::DOUBLE[], ne.embedding::DOUBLE[]), 6) AS cosine
       |  FROM qcells q JOIN fin f USING (cid)
       |  JOIN embeddings qe ON qe.vec_id = q.qid
       |  JOIN embeddings ne ON ne.vec_id = f.id
       |  WHERE f.id <> q.qid
       |)
       |SELECT qid, CAST(rnk AS BIGINT) AS rnk, nid, cosine FROM (
       |  SELECT qid, nid, cosine,
       |         row_number() OVER (PARTITION BY qid ORDER BY cosine DESC, nid) AS rnk
       |  FROM probe)
       |WHERE rnk <= $topK""".stripMargin
  }

  /** DuckDB replay of [[graft.operators.Clustering.kmeans]]: the same
    * lowest-id seeds and `iters` unrolled exact-integer Lloyd's
    * iterations (argmin ties to the lowest cluster id; elementwise
    * floor(sum/cnt + 0.5) centroid update). */
  /** `fitWhere` (over `id`) restricts which vectors the FIT sees —
    * seeds and every Lloyd's iteration run on `mf`; the final `fin`
    * assignment still covers ALL of `m` (ext148's incremental-
    * maintenance oracle: fit on v1, assign the whole corpus). The
    * default "true" keeps every earlier caller byte-identical in
    * results (mf == m). */
  private def kmeansCtes(k: Int, iters: Int, dims: Int,
                         fitWhere: String = "true"): String = {
    val dist =
      "list_sum(list_transform(range(1, len(v.m)+1), j -> (v.m[j]-c.c[j])*(v.m[j]-c.c[j])))"
    def iterCte(i: Int): String = s"""
      |, a$i AS (
      |  SELECT id, m, cid FROM (
      |    SELECT v.id, v.m, c.cid,
      |           row_number() OVER (PARTITION BY v.id ORDER BY $dist, c.cid) AS rk
      |    FROM mf v CROSS JOIN c${i - 1} c) WHERE rk = 1
      |), c$i AS (
      |  SELECT cid, list(s ORDER BY pos) AS c FROM (
      |    SELECT a$i.cid, p.pos, CAST(floor(sum(a$i.m[p.pos])::DOUBLE / count(*) + 0.5) AS BIGINT) AS s
      |    FROM a$i, (SELECT unnest(range(1, ${dims + 1})) AS pos) p
      |    GROUP BY a$i.cid, p.pos
      |  ) GROUP BY cid
      |)""".stripMargin
    s"""WITH m AS (
       |  SELECT vec_id AS id, list_transform(embedding::DOUBLE[], x -> CAST(floor(x*1000000 + 0.5) AS BIGINT)) AS m
       |  FROM embeddings
       |), mf AS (
       |  SELECT id, m FROM m WHERE $fitWhere
       |), c0 AS (
       |  SELECT row_number() OVER (ORDER BY id) - 1 AS cid, m AS c
       |  FROM (SELECT id, m FROM mf ORDER BY id LIMIT $k)
       |)""".stripMargin +
      (1 to iters).map(iterCte).mkString +
      s"""
       |, fin AS (
       |  SELECT id, cid FROM (
       |    SELECT v.id, c.cid,
       |           row_number() OVER (PARTITION BY v.id ORDER BY $dist, c.cid) AS rk
       |    FROM m v CROSS JOIN c$iters c) WHERE rk = 1
       |)""".stripMargin
  }

  private def kmeansOracle(k: Int, iters: Int, dims: Int): String =
    kmeansCtes(k, iters, dims) + """
      |SELECT f.id AS vec_id, CAST(f.cid AS INT) AS cluster,
      |       CAST(s.n AS BIGINT) AS cluster_size
      |FROM fin f JOIN (SELECT cid, count(*) AS n FROM fin GROUP BY cid) s USING (cid)""".stripMargin

  /** ext91's oracle: the ext83 SRP-LSH edge set (corpus as its own
    * query side, k = 3, salt 'pr1', CORPUS-ADAPTIVE plane count:
    * smallest p in [4, 16] with 32·2^p ≥ n — pure integer sizing, so
    * it replays exactly), then the same unrolled PageRank chain as
    * [[pageRankOracle]]. DuckDB's range() rejects lateral column args,
    * so plane/probe enumerations range over the max (16) and filter
    * i < np. */
  /** ext126's oracle: the ext91/ext83 SRP replay (adaptive plane count,
    * integer-µ projections, multi-probe) building the top-3 graph, then
    * the reciprocal filter — a pair survives iff present both ways. */
  private def mutualKnnSrpOracle: String = // def: the `all` map initializes first
    s"""WITH params AS (
       |  SELECT coalesce((SELECT min(p) FROM range(4, 17) t(p)
       |          WHERE 32 * (1 << p) >= (SELECT count(*) FROM embeddings)), 16) AS np
       |), m AS (
       |  SELECT i, j,
       |         CASE WHEN ('0x' || substr(md5(i::VARCHAR || ':' || j::VARCHAR || ':mk1'), 1, 1))::BIGINT % 2 = 0
       |              THEN 1 ELSE -1 END AS s
       |  FROM range(16) r1(i), range(64) r2(j), params
       |  WHERE i < params.np
       |), ex AS (
       |  SELECT vec_id,
       |         unnest(range(0, len(embedding))) AS j,
       |         CAST(floor(unnest(embedding::DOUBLE[]) * 1000000 + 0.5) AS BIGINT) AS xe6
       |  FROM embeddings
       |), p0 AS (
       |  SELECT vec_id, i, sum(xe6 * s) AS c
       |  FROM ex JOIN m USING (j)
       |  GROUP BY vec_id, i
       |), b AS (
       |  SELECT vec_id,
       |         CAST(sum(CASE WHEN c > 0 THEN (CAST(1 AS BIGINT) << (params.np - 1 - i)) ELSE 0 END) AS BIGINT) AS bucket
       |  FROM p0, params GROUP BY vec_id
       |), probes AS (
       |  SELECT vec_id AS qid, bucket FROM b
       |  UNION ALL
       |  SELECT vec_id, xor(bucket, CAST(1 AS BIGINT) << pos)
       |  FROM b, range(16) r(pos), params
       |  WHERE pos < params.np
       |), cand AS (
       |  SELECT pr.qid, cb.vec_id AS nid,
       |         round(list_cosine_similarity(qe.embedding::DOUBLE[], ne.embedding::DOUBLE[]), 6) AS cosine
       |  FROM probes pr
       |  JOIN b cb USING (bucket)
       |  JOIN embeddings qe ON qe.vec_id = pr.qid
       |  JOIN embeddings ne ON ne.vec_id = cb.vec_id
       |  WHERE cb.vec_id <> pr.qid
       |), eg AS (
       |  SELECT qid, nid, cosine FROM (
       |    SELECT qid, nid, cosine, row_number() OVER (PARTITION BY qid ORDER BY cosine DESC, nid) AS rnk
       |    FROM (SELECT DISTINCT qid, nid, cosine FROM cand))
       |  WHERE rnk <= 3
       |)
       |SELECT a.qid AS doc_a, a.nid AS doc_b, a.cosine
       |FROM eg a JOIN eg b ON a.qid = b.nid AND a.nid = b.qid
       |WHERE a.qid < a.nid""".stripMargin

  private def pageRankLshOracle(iters: Int): String = {
    val steps = (1 to iters).map { i =>
      s"""pr$i AS (
         |  SELECT n.node,
         |         CAST(150000 + 85 * coalesce(c.s, 0) // 100 AS BIGINT) AS r
         |  FROM nodes n LEFT JOIN (
         |    SELECT eg.dst AS node, CAST(sum(p.r // o.od) AS BIGINT) AS s
         |    FROM eg JOIN odeg o ON eg.src = o.src
         |           JOIN pr${i - 1} p ON p.node = eg.src
         |    GROUP BY eg.dst) c ON n.node = c.node
         |)""".stripMargin
    }.mkString(", ")
    s"""WITH params AS (
       |  -- coalesce mirrors the Spark side's getOrElse(16): past
       |  -- 32*2^16 vectors both engines cap at 16 planes
       |  SELECT coalesce((SELECT min(p) FROM range(4, 17) t(p)
       |          WHERE 32 * (1 << p) >= (SELECT count(*) FROM embeddings)), 16) AS np
       |), m AS (
       |  SELECT i, j,
       |         CASE WHEN ('0x' || substr(md5(i::VARCHAR || ':' || j::VARCHAR || ':pr1'), 1, 1))::BIGINT % 2 = 0
       |              THEN 1 ELSE -1 END AS s
       |  FROM range(16) r1(i), range(64) r2(j), params
       |  WHERE i < params.np
       |), ex AS (
       |  SELECT vec_id,
       |         unnest(range(0, len(embedding))) AS j,
       |         CAST(floor(unnest(embedding::DOUBLE[]) * 1000000 + 0.5) AS BIGINT) AS xe6
       |  FROM embeddings
       |), p0 AS (
       |  SELECT vec_id, i, sum(xe6 * s) AS c
       |  FROM ex JOIN m USING (j)
       |  GROUP BY vec_id, i
       |), b AS (
       |  SELECT vec_id,
       |         CAST(sum(CASE WHEN c > 0 THEN (CAST(1 AS BIGINT) << (params.np - 1 - i)) ELSE 0 END) AS BIGINT) AS bucket
       |  FROM p0, params GROUP BY vec_id
       |), probes AS (
       |  SELECT vec_id AS qid, bucket FROM b
       |  UNION ALL
       |  SELECT vec_id, xor(bucket, CAST(1 AS BIGINT) << pos)
       |  FROM b, range(16) r(pos), params
       |  WHERE pos < params.np
       |), cand AS (
       |  SELECT pr.qid, cb.vec_id AS nid,
       |         round(list_cosine_similarity(qe.embedding::DOUBLE[], ne.embedding::DOUBLE[]), 6) AS cosine
       |  FROM probes pr
       |  JOIN b cb USING (bucket)
       |  JOIN embeddings qe ON qe.vec_id = pr.qid
       |  JOIN embeddings ne ON ne.vec_id = cb.vec_id
       |  WHERE cb.vec_id <> pr.qid
       |), eg AS (
       |  SELECT qid AS src, nid AS dst FROM (
       |    SELECT qid, nid, row_number() OVER (PARTITION BY qid ORDER BY cosine DESC, nid) AS rnk
       |    FROM (SELECT DISTINCT qid, nid, cosine FROM cand))
       |  WHERE rnk <= 3
       |), odeg AS (SELECT src, count(*) AS od FROM eg GROUP BY src
       |), ideg AS (SELECT dst, count(*) AS idg FROM eg GROUP BY dst
       |), nodes AS (
       |  SELECT DISTINCT node FROM (SELECT src AS node FROM eg UNION ALL SELECT dst FROM eg)
       |), pr0 AS (SELECT node, CAST(1000000 AS BIGINT) AS r FROM nodes
       |), $steps
       |SELECT n.node, p.r AS pr_e6,
       |       coalesce(o.od, 0) AS out_deg, coalesce(i.idg, 0) AS in_deg
       |FROM nodes n JOIN pr$iters p ON p.node = n.node
       |LEFT JOIN odeg o ON o.src = n.node
       |LEFT JOIN ideg i ON i.dst = n.node""".stripMargin
  }

  /** ext79's oracle: the ext67 kNN edge set, then `iters` PageRank
    * power iterations unrolled as chained CTEs (pr0 → pr1 → …) in the
    * same micro-unit integer arithmetic as
    * [[graft.operators.Graph.pageRank]]. Unrolled rather than
    * recursive because the recursive term would need a GROUP BY. */
  /** ext119's oracle: the ext28 tokenization and adjacent-bigram build,
    * the directed-count ≥ minCount gate, then `iters` weighted PageRank
    * rounds unrolled as chained CTEs. Weighted form over grouped
    * (src, dst, n) edges — od = Σn per src, contribution n·(r div od) —
    * which is term-for-term the parallel-edge multiset
    * [[graft.operators.Graph.pageRank]] consumes on the Spark side. */
  private def textRankOracle(iters: Int, k: Int, minCount: Int): String = {
    val steps = (1 to iters).map { i =>
      s"""pr$i AS (
         |  SELECT n.node,
         |         CAST(150000 + 85 * coalesce(c.s, 0) // 100 AS BIGINT) AS r
         |  FROM nodes n LEFT JOIN (
         |    SELECT e.dst AS node, CAST(sum((p.r // o.od) * e.n) AS BIGINT) AS s
         |    FROM e JOIN odeg o ON e.src = o.src
         |           JOIN pr${i - 1} p ON p.node = e.src
         |    GROUP BY e.dst) c ON n.node = c.node
         |)""".stripMargin
    }.mkString(", ")
    s"""WITH t AS (
       |  SELECT list_filter(regexp_split_to_array(trim(text), '\\s+'), x -> x <> '') AS w
       |  FROM documents
       |), bi AS (
       |  SELECT unnest(w[1:len(w)-1]) AS w1, unnest(w[2:len(w)]) AS w2
       |  FROM t WHERE len(w) >= 2
       |), bc AS (
       |  SELECT w1, w2, count(*) AS n FROM bi GROUP BY 1, 2
       |  HAVING count(*) >= $minCount
       |), e AS (
       |  SELECT w1 AS src, w2 AS dst, n FROM bc
       |  UNION ALL SELECT w2, w1, n FROM bc
       |), odeg AS (SELECT src, CAST(sum(n) AS BIGINT) AS od FROM e GROUP BY 1
       |), nodes AS (
       |  SELECT DISTINCT node FROM (SELECT src AS node FROM e UNION ALL SELECT dst FROM e)
       |), pr0 AS (SELECT node, CAST(1000000 AS BIGINT) AS r FROM nodes
       |), $steps
       |SELECT CAST(rnk AS BIGINT) AS rnk, word, pr_e6 FROM (
       |  SELECT node AS word, r AS pr_e6,
       |         row_number() OVER (ORDER BY r DESC, node) AS rnk
       |  FROM pr$iters)
       |WHERE rnk <= $k""".stripMargin
  }

  /** ext118's oracle: quantized full Gram matrix, integer rescale by
    * s = max(1, max|G| div 1e6), then `iters` power-iteration rounds
    * unrolled as chained CTEs (w1/m1/v1 → …) in the same trunc-division-
    * on-non-negative fixed-point arithmetic as
    * [[graft.operators.Similarity.pcaTopComponent]]. Intermediate sums
    * ride HUGEINT; every OUTPUT column is CAST BIGINT/INT
    * (hugeint_audit discipline). */
  private def pcaPowerOracle(iters: Int): String = {
    val steps = (1 to iters).map { t =>
      s"""w$t AS (
         |  SELECT gn.i AS idx, sum(gn.gn * p.v) AS w
         |  FROM gn JOIN v${t - 1} p ON p.idx = gn.j GROUP BY 1
         |), m$t AS (SELECT greatest(max(abs(w)), 1) AS m FROM w$t
         |), v$t AS (
         |  SELECT idx,
         |         CASE WHEN w < 0 THEN -(((-w) * 1000000) // m.m)
         |              ELSE (w * 1000000) // m.m END AS v
         |  FROM w$t, m$t m
         |)""".stripMargin
    }.mkString(", ")
    s"""WITH q AS (
       |  SELECT list_transform(embedding, x -> CAST(floor(x * 64 + 0.5) AS BIGINT)) AS q
       |  FROM embeddings WHERE embedding IS NOT NULL AND len(embedding) > 0
       |), u AS (
       |  SELECT q, unnest(generate_series(1, len(q))) AS ii FROM q
       |), cells AS (
       |  SELECT ii - 1 AS i, unnest(generate_series(1, len(q))) - 1 AS j, q, ii FROM u
       |), xy AS (
       |  SELECT i, j, q[i + 1] * q[j + 1] AS xy FROM cells
       |), g AS (
       |  SELECT i, j, CAST(sum(xy) AS BIGINT) AS g FROM xy GROUP BY 1, 2
       |), s AS (SELECT greatest(1, max(abs(g)) // 1000000) AS s FROM g
       |), gn AS (
       |  SELECT i, j, CASE WHEN g < 0 THEN -((-g) // s.s) ELSE g // s.s END AS gn
       |  FROM g, s
       |), v0 AS (
       |  SELECT DISTINCT i AS idx, CAST(1000000 AS BIGINT) AS v FROM g
       |), $steps
       |SELECT CAST(f.idx AS INT) AS idx, CAST(f.v AS BIGINT) AS v_e6,
       |       dg.g AS g_diag
       |FROM v$iters f JOIN (SELECT i, g FROM g WHERE i = j) dg ON dg.i = f.idx""".stripMargin
  }

  private def pageRankOracle(iters: Int): String = {
    val steps = (1 to iters).map { i =>
      s"""pr$i AS (
         |  SELECT n.node,
         |         CAST(150000 + 85 * coalesce(c.s, 0) // 100 AS BIGINT) AS r
         |  FROM nodes n LEFT JOIN (
         |    SELECT e.dst AS node, CAST(sum(p.r // o.od) AS BIGINT) AS s
         |    FROM e JOIN odeg o ON e.src = o.src
         |           JOIN pr${i - 1} p ON p.node = e.src
         |    GROUP BY e.dst) c ON n.node = c.node
         |)""".stripMargin
    }.mkString(", ")
    s"""WITH sim AS (
       |  SELECT a.vec_id AS src, b.vec_id AS nid,
       |         round(list_cosine_similarity(a.embedding::DOUBLE[], b.embedding::DOUBLE[]), 6) AS cosine
       |  FROM embeddings a JOIN embeddings b
       |    ON a.label = b.label AND a.vec_id <> b.vec_id
       |), e AS (
       |  SELECT src, nid AS dst FROM (
       |    SELECT src, nid, row_number() OVER (PARTITION BY src ORDER BY cosine DESC, nid) AS rnk
       |    FROM sim) WHERE rnk <= 3
       |), odeg AS (SELECT src, count(*) AS od FROM e GROUP BY src
       |), ideg AS (SELECT dst, count(*) AS idg FROM e GROUP BY dst
       |), nodes AS (
       |  SELECT DISTINCT node FROM (SELECT src AS node FROM e UNION ALL SELECT dst FROM e)
       |), pr0 AS (SELECT node, CAST(1000000 AS BIGINT) AS r FROM nodes
       |), $steps
       |SELECT n.node, p.r AS pr_e6,
       |       coalesce(o.od, 0) AS out_deg, coalesce(i.idg, 0) AS in_deg
       |FROM nodes n JOIN pr$iters p ON p.node = n.node
       |LEFT JOIN odeg o ON o.src = n.node
       |LEFT JOIN ideg i ON i.dst = n.node""".stripMargin
  }

  /** Unrolled BPE training oracle: `iters` count→argmax→merge rounds as
    * CTE blocks over the wrapped-symbol vocabulary (the
    * [[graft.operators.TextAnalysis.bpeTrain]] representation — each
    * symbol `|`-prefixed and space-suffixed, so a merge is a plain
    * non-overlapping `replace`, semantically identical in DuckDB and
    * Spark). sum(BIGINT) is HUGEINT in DuckDB — every published count
    * casts back. */
  /** The shared CTE body: vocab build, wrapped-symbol v0, and `iters`
    * count→argmax→merge rounds. Each vN carries the word key `w` so the
    * segment oracle can join documents back to their final form. */
  private def bpeCtes(iters: Int): String = {
    val rounds = (1 to iters).map { n =>
      val prev = s"v${n - 1}"
      s"""p$n AS (
         |  SELECT a, b, sum(freq) AS cnt FROM (
         |    SELECT substr(pr[1], 2) AS a, substr(pr[2], 2) AS b, freq FROM (
         |      SELECT unnest(list_transform(range(1, len(y)), i -> [y[i], y[i+1]])) AS pr, freq
         |      FROM (SELECT list_filter(string_split(s, ' '), z -> z <> '') AS y, freq FROM $prev)
         |      WHERE len(y) >= 2))
         |  GROUP BY a, b
         |), m$n AS (SELECT a, b, cnt FROM p$n ORDER BY cnt DESC, a, b LIMIT 1
         |), v$n AS (
         |  SELECT w, replace(s, '|' || m.a || ' |' || m.b || ' ', '|' || m.a || m.b || ' ') AS s, freq
         |  FROM $prev, m$n m
         |)""".stripMargin
    }.mkString(", ")
    s"""WITH vocab AS (
       |  SELECT w, CAST(count(*) AS BIGINT) AS freq FROM (
       |    SELECT lower(x) AS w FROM (
       |      SELECT unnest(list_filter(regexp_split_to_array(trim(text), '\\s+'), x -> x <> '')) AS x
       |      FROM documents))
       |  WHERE regexp_full_match(w, '[a-z0-9]+')
       |  GROUP BY w
       |), v0 AS (
       |  SELECT w, regexp_replace(w, '(.)', '|\\1 ', 'g') AS s, freq FROM vocab
       |), $rounds""".stripMargin
  }

  private def bpeTrainOracle(iters: Int): String = {
    val rows = (1 to iters).map { n =>
      s"SELECT $n AS iteration, a AS lhs, b AS rhs, a || b AS merged, CAST(cnt AS BIGINT) AS n_occurrences FROM m$n"
    }.mkString("\nUNION ALL ")
    s"""${bpeCtes(iters)}
       |SELECT * FROM (
       |$rows
       |) ORDER BY iteration""".stripMargin
  }

  /** The train→apply replay: the final vocab segmentation v{iters}
    * joined back to every document word occurrence. Shared with the
    * streaming twin (st49). */
  private[queries] def bpeSegmentOracle(iters: Int): String =
    s"""${bpeCtes(iters)}, dw AS (
       |  SELECT doc_id, w FROM (
       |    SELECT doc_id, lower(x) AS w FROM (
       |      SELECT doc_id, unnest(list_filter(regexp_split_to_array(trim(text), '\\s+'), z -> z <> '')) AS x
       |      FROM documents))
       |  WHERE regexp_full_match(w, '[a-z0-9]+')
       |), seg AS (
       |  SELECT w, CAST(len(s) - len(replace(s, '|', '')) AS BIGINT) AS n_sub FROM v$iters
       |)
       |SELECT d.doc_id, CAST(count(*) AS BIGINT) AS n_words,
       |       CAST(sum(g.n_sub) AS BIGINT) AS n_subwords,
       |       CAST(floor(sum(g.n_sub)::DOUBLE / count(*) * 1000 + 0.5) AS BIGINT) AS subwords_per_word_milli
       |FROM dw d JOIN seg g ON g.w = d.w
       |GROUP BY d.doc_id""".stripMargin

  /** Multi-threshold component oracle: one shared shingle index, then
    * per threshold the [[OracleSql.Components]] pattern (inverted-index
    * exact pairs → recursive reachability → min-id labels), suffixed by
    * the threshold's e2 form (t70/t80/t90). */
  private def dedupHierarchyOracle(thresholds: Seq[Double]): String = {
    val blocks = thresholds.map { t =>
      val s = (t * 100).round.toInt
      raw"""pairs$s AS (
           |  SELECT ix.doc_a, ix.doc_b
           |  FROM (SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, count(*) AS i
           |        FROM inv a JOIN inv b ON a.g = b.g AND a.doc_id < b.doc_id
           |        GROUP BY 1, 2) ix
           |  JOIN sz sa ON sa.doc_id = ix.doc_a
           |  JOIN sz sb ON sb.doc_id = ix.doc_b
           |  WHERE i::DOUBLE / (sa.n + sb.n - i) >= $t
           |), edges$s AS MATERIALIZED (
           |  SELECT doc_a AS st, doc_b AS d FROM pairs$s
           |  UNION SELECT doc_b, doc_a FROM pairs$s
           |), reach$s(src, dst) AS (
           |  SELECT st, d FROM edges$s
           |  UNION
           |  SELECT r.src, e.d FROM reach$s r JOIN edges$s e ON r.dst = e.st
           |), comp$s AS (
           |  SELECT src AS doc_id, least(src, min(dst)) AS cluster_id
           |  FROM reach$s GROUP BY src
           |)""".stripMargin
    }.mkString(", ")
    val sels = thresholds.map { t =>
      val s = (t * 100).round.toInt
      s"coalesce(c$s.cluster_id, d.doc_id) AS fam$s"
    }.mkString(",\n       ")
    val joins = thresholds.map { t =>
      val s = (t * 100).round.toInt
      s"LEFT JOIN comp$s c$s ON d.doc_id = c$s.doc_id"
    }.mkString("\n")
    raw"""WITH RECURSIVE sh AS MATERIALIZED (
         |  SELECT doc_id, list_distinct(list_transform(range(1, len(w) - 1),
         |           i -> w[i] || ' ' || w[i+1] || ' ' || w[i+2])) AS s
         |  FROM (SELECT doc_id, list_filter(regexp_split_to_array(text, '\s+'), t -> t <> '') AS w FROM documents)
         |  WHERE len(w) >= 3
         |), sz AS MATERIALIZED (
         |  SELECT doc_id, len(s) AS n FROM sh
         |), inv AS MATERIALIZED (
         |  SELECT doc_id, unnest(s) AS g FROM sh
         |), $blocks
         |SELECT d.doc_id,
         |       $sels
         |FROM documents d
         |$joins""".stripMargin
  }

  /** WordPiece CTE body: [[bpeCtes]]' vocab/v0 plus `iters` rounds of
    * unigram-count → pair-count → fixed-point likelihood score → argmax
    * → merge. Score arithmetic is BIGINT end-to-end (`//` = Spark `div`
    * on positives); DuckDB sums are HUGEINT so the score cell casts. */
  private def wordpieceCtes(iters: Int): String = {
    val rounds = (1 to iters).map { n =>
      val prev = s"v${n - 1}"
      s"""u$n AS (
         |  SELECT substr(sym, 2) AS sym, sum(freq) AS ucnt FROM (
         |    SELECT unnest(list_filter(string_split(s, ' '), z -> z <> '')) AS sym, freq
         |    FROM $prev)
         |  GROUP BY sym
         |), p$n AS (
         |  SELECT a, b, sum(freq) AS cnt FROM (
         |    SELECT substr(pr[1], 2) AS a, substr(pr[2], 2) AS b, freq FROM (
         |      SELECT unnest(list_transform(range(1, len(y)), i -> [y[i], y[i+1]])) AS pr, freq
         |      FROM (SELECT list_filter(string_split(s, ' '), z -> z <> '') AS y, freq FROM $prev)
         |      WHERE len(y) >= 2))
         |  GROUP BY a, b
         |), m$n AS (
         |  SELECT p.a, p.b, p.cnt,
         |         CAST(p.cnt * 1000000000 // (ua.ucnt * ub.ucnt) AS BIGINT) AS score_e9
         |  FROM p$n p JOIN u$n ua ON ua.sym = p.a JOIN u$n ub ON ub.sym = p.b
         |  ORDER BY score_e9 DESC, p.a, p.b LIMIT 1
         |), v$n AS MATERIALIZED (
         |  SELECT w, replace(s, '|' || m.a || ' |' || m.b || ' ', '|' || m.a || m.b || ' ') AS s, freq
         |  FROM $prev, m$n m
         |)""".stripMargin
    }.mkString(", ")
    // v$n is referenced THREE times per round (u, p, next v): without
    // MATERIALIZED DuckDB inlines the chain 3^iters-fold and dies
    // re-opening documents.parquet (bpeCtes survives at 2 refs/round;
    // this one must pin each round's vocab).
    s"""WITH vocab AS (
       |  SELECT w, CAST(count(*) AS BIGINT) AS freq FROM (
       |    SELECT lower(x) AS w FROM (
       |      SELECT unnest(list_filter(regexp_split_to_array(trim(text), '\\s+'), x -> x <> '')) AS x
       |      FROM documents))
       |  WHERE regexp_full_match(w, '[a-z0-9]+')
       |  GROUP BY w
       |), v0 AS MATERIALIZED (
       |  SELECT w, regexp_replace(w, '(.)', '|\\1 ', 'g') AS s, freq FROM vocab
       |), $rounds""".stripMargin
  }

  private def wordpieceTrainOracle(iters: Int): String = {
    val rows = (1 to iters).map { n =>
      s"SELECT $n AS iteration, a AS lhs, b AS rhs, a || b AS merged, " +
        s"CAST(cnt AS BIGINT) AS n_occurrences, score_e9 FROM m$n"
    }.mkString("\nUNION ALL ")
    s"""${wordpieceCtes(iters)}
       |SELECT * FROM (
       |$rows
       |) ORDER BY iteration""".stripMargin
  }

  /** The WordPiece train→apply replay: v{iters}' segmentation joined
    * back to every document word occurrence (the [[bpeSegmentOracle]]
    * report over the likelihood-trained vocab). */
  private def wordpieceSegmentOracle(iters: Int): String =
    s"""${wordpieceCtes(iters)}, dw AS (
       |  SELECT doc_id, w FROM (
       |    SELECT doc_id, lower(x) AS w FROM (
       |      SELECT doc_id, unnest(list_filter(regexp_split_to_array(trim(text), '\\s+'), z -> z <> '')) AS x
       |      FROM documents))
       |  WHERE regexp_full_match(w, '[a-z0-9]+')
       |), seg AS (
       |  SELECT w, CAST(len(s) - len(replace(s, '|', '')) AS BIGINT) AS n_sub FROM v$iters
       |)
       |SELECT d.doc_id, CAST(count(*) AS BIGINT) AS n_words,
       |       CAST(sum(g.n_sub) AS BIGINT) AS n_subwords,
       |       CAST(floor(sum(g.n_sub)::DOUBLE / count(*) * 1000 + 0.5) AS BIGINT) AS subwords_per_word_milli
       |FROM dw d JOIN seg g ON g.w = d.w
       |GROUP BY d.doc_id""".stripMargin

  /** MMR greedy selection, unrolled: milli-quantized vectors, integer
    * dot products (exact in DuckDB's double list_dot_product at fixture
    * magnitudes), top-`poolSize` rerank window, then k argmax rounds
    * s1..sk — each pinned MATERIALIZED (referenced 3×/round; the
    * wordpiece inlining lesson). Anchor = vec_id 0. */
  private def mmrSelectOracle(poolSize: Int, k: Int): String = {
    val rounds = (2 to k).map { n =>
      val prev = s"s${n - 1}"
      s"""s$n AS MATERIALIZED (
         |  SELECT * FROM $prev
         |  UNION ALL
         |  SELECT $n AS sel_rank, p.id, p.v, p.rel, t.mmr FROM (
         |    SELECT c.id, c.rel - max(CAST(list_dot_product(c.v::DOUBLE[], s.v::DOUBLE[]) AS BIGINT)) AS mmr
         |    FROM pool c, $prev s
         |    WHERE c.id NOT IN (SELECT id FROM $prev)
         |    GROUP BY c.id, c.rel
         |    ORDER BY mmr DESC, c.id LIMIT 1) t JOIN pool p ON p.id = t.id
         |)""".stripMargin
    }.mkString(", ")
    s"""WITH milli AS MATERIALIZED (
       |  SELECT vec_id AS id,
       |         list_transform(embedding::DOUBLE[], x -> CAST(floor(x * 1000 + 0.5) AS BIGINT)) AS v
       |  FROM embeddings
       |), anchor AS MATERIALIZED (SELECT v FROM milli WHERE id = 0
       |), pool AS MATERIALIZED (
       |  SELECT id, v, rel FROM (
       |    SELECT m.id, m.v,
       |           CAST(list_dot_product(m.v::DOUBLE[], a.v::DOUBLE[]) AS BIGINT) AS rel,
       |           row_number() OVER (
       |             ORDER BY CAST(list_dot_product(m.v::DOUBLE[], a.v::DOUBLE[]) AS BIGINT) DESC, m.id) AS rn
       |    FROM milli m, anchor a WHERE m.id <> 0)
       |  WHERE rn <= $poolSize
       |), s1 AS MATERIALIZED (
       |  SELECT 1 AS sel_rank, id, v, rel, rel AS mmr FROM pool ORDER BY rel DESC, id LIMIT 1
       |), $rounds
       |SELECT CAST(sel_rank AS INT) AS sel_rank, id AS vec_id,
       |       rel AS rel_milli2, mmr AS mmr_milli2
       |FROM s$k""".stripMargin
  }

  /** k-center farthest-point traversal, unrolled: milli vectors, exact
    * integer squared L2 (list_zip + numeric struct index — DuckDB's
    * unnamed zip structs reject string keys), seed = lowest id, k−1
    * MATERIALIZED argmax rounds. */
  private def kcenterSelectOracle(k: Int): String = {
    val rounds = (2 to k).map { n =>
      val prev = s"c${n - 1}"
      s"""c$n AS MATERIALIZED (
         |  SELECT * FROM $prev
         |  UNION ALL
         |  SELECT $n AS sel_rank, p.id, p.v, t.mind FROM (
         |    SELECT m.id,
         |           min(CAST(list_sum(list_transform(list_zip(m.v, s.v),
         |                 z -> (z[1] - z[2]) * (z[1] - z[2]))) AS BIGINT)) AS mind
         |    FROM milli m, $prev s
         |    WHERE m.id NOT IN (SELECT id FROM $prev)
         |    GROUP BY m.id
         |    ORDER BY mind DESC, m.id LIMIT 1) t JOIN milli p ON p.id = t.id
         |)""".stripMargin
    }.mkString(", ")
    s"""WITH milli AS MATERIALIZED (
       |  SELECT vec_id AS id,
       |         list_transform(embedding::DOUBLE[], x -> CAST(floor(x * 1000 + 0.5) AS BIGINT)) AS v
       |  FROM embeddings
       |), c1 AS MATERIALIZED (
       |  SELECT 1 AS sel_rank, id, v, CAST(0 AS BIGINT) AS mind FROM milli ORDER BY id LIMIT 1
       |), $rounds
       |SELECT CAST(sel_rank AS INT) AS sel_rank, id AS vec_id, mind AS min_dist_milli2
       |FROM c$k""".stripMargin
  }

  /** [[kmeansCtes]] + the SemDeDup dominance rule: drop an id iff a
    * lower id in its own cluster is within the cosine threshold. */
  private def semDedupOracle(k: Int, iters: Int, dims: Int, threshold: Double): String =
    kmeansCtes(k, iters, dims) + s"""
      |, e AS (
      |  SELECT f.id, f.cid, emb.embedding::DOUBLE[] AS v
      |  FROM fin f JOIN embeddings emb ON emb.vec_id = f.id
      |), dropped AS (
      |  SELECT DISTINCT b.id FROM e a JOIN e b ON a.cid = b.cid AND a.id < b.id
      |  WHERE list_cosine_similarity(a.v, b.v) >= $threshold
      |)
      |SELECT e.id AS vec_id, CAST(e.cid AS INT) AS cluster,
      |       (d.id IS NULL) AS keep
      |FROM e LEFT JOIN dropped d ON e.id = d.id""".stripMargin
}
