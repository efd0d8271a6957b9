package graft.queries

import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.OutputMode
import graft.operators.TextAnalysis
import graft.streaming.Streams

/** Streaming-tier proof queries: each runs a real Structured Streaming
  * query to completion (Trigger.AvailableNow — the bounded-drain mode)
  * and returns the result, so the DuckDB oracle certifies the streaming
  * pipeline computes exactly what the equivalent batch SQL computes. */
object StreamingQueries {

  private def scratch(s: org.apache.spark.sql.SparkSession, d: String,
                      name: String): String = {
    val base = s"/tmp/graft-st/${d.replaceAll("[^A-Za-z0-9]", "_")}/$name"
    val p = new org.apache.hadoop.fs.Path(base)
    val fs = p.getFileSystem(s.sparkContext.hadoopConfiguration)
    if (fs.exists(p)) fs.delete(p, true)
    base
  }

  val all: Seq[(String, Q)] = Seq(

    // Schema-drifting JSON AT INGEST (the Kafka-raw-crawl shape): each
    // arriving event carries one of three JSON shapes (nested meta /
    // flat / missing fields); parse_json + variant_get typed paths
    // absorb the drift row-locally — stateless, no watermark, the
    // VARIANT tier (q76/ext88) proven on a live stream. The JSON text
    // is synthesized closed-form from the event columns so the batch
    // oracle re-derives every output without parsing anything.
    "st31_stream_variant" -> Q(
      (s, d) => {
        val drifted = Streams.readEventsStream(s, d).selectExpr(
          "event_id",
          """CASE CAST(event_id % 3 AS INT)
               WHEN 0 THEN concat('{"event_id":', CAST(event_id AS STRING),
                                  ',"v_cents":', CAST(CAST(floor(value * 100 + 0.5) AS BIGINT) AS STRING),
                                  ',"meta":{"et":"', event_type, '"}}')
               WHEN 1 THEN concat('{"event_id":', CAST(event_id AS STRING),
                                  ',"v_cents":', CAST(CAST(floor(value * 100 + 0.5) AS BIGINT) AS STRING),
                                  ',"et":"', event_type, '"}')
               ELSE concat('{"event_id":', CAST(event_id AS STRING), '}')
             END AS j""")
        val extracted = drifted.selectExpr(
          "event_id",
          "try_variant_get(parse_json(j), '$.v_cents', 'bigint') AS v_cents",
          """coalesce(variant_get(parse_json(j), '$.meta.et', 'string'),
                      variant_get(parse_json(j), '$.et', 'string'),
                      'unknown') AS et""",
          "try_variant_get(parse_json(j), '$.v_cents', 'bigint') IS NOT NULL AS has_value")
        Streams.runToMemory(s, extracted, "st31_variant", OutputMode.Append())
      },
      Some("""SELECT event_id,
             |       CASE WHEN event_id % 3 = 2 THEN NULL
             |            ELSE CAST(floor(value * 100 + 0.5) AS BIGINT) END AS v_cents,
             |       CASE WHEN event_id % 3 = 2 THEN 'unknown' ELSE event_type END AS et,
             |       (event_id % 3 <> 2) AS has_value
             |FROM events""".stripMargin)),

    // Perceptual media dedup AT INGEST: the ext87 planted-variant
    // stream (base PNG / same-pixels BMP / +1-brightness PNG per doc)
    // decoded and hashed INSIDE the stream (typed mapPartitions is
    // stateless — codecs run per micro-batch), then a Complete-mode
    // aggregation groups by the perceptual key. The oracle recomputes
    // BOTH hashes closed-form from the planting geometry — r8's
    // AREA-AVERAGE integer-milliluma cells (floor-mean of 299·R over
    // each grid range, row-independent because the two-tone varies only
    // in x), the integer v*64 > sum aHash bit, the neighbor-gradient
    // dHash bit, the flat-image tone key — so every hash VALUE is
    // pinned cross-engine, not just group counts (the strongest oracle
    // the perceptual tier has).
    "st32_stream_media_dedup" -> Q(
      (s, d) => {
        val sample = Streams.readDocumentsStream(s, d)
          .filter(col("doc_id") % 20 === 0)
        // the BATCH operator unchanged on a streaming frame: the decode
        // is stateless, the grouped aggregation runs in Complete mode
        val grouped = graft.operators.Multimodal.dedupPerceptual(
          graft.operators.Multimodal.encodePngVariants(sample, "doc_id"))
        Streams.runToMemory(s, grouped, "st32_media", OutputMode.Complete())
      },
      Some("""WITH d0 AS (
             |  SELECT doc_id FROM documents WHERE doc_id % 20 = 0
             |), v AS (
             |  SELECT doc_id, s.variant, s.shift
             |  FROM d0, (VALUES (0, 0), (1, 0), (2, 1)) s(variant, shift)
             |), geo AS (
             |  SELECT doc_id, variant, shift,
             |         1 + doc_id % 16 AS w,
             |         doc_id % 128 AS a, (doc_id * 7 + 3) % 128 AS b
             |  FROM v
             |), -- area floor-mean milliluma cells (299·red; g = b = 0): the
             |   -- cell x-range is [i*w//g, max(i*w//g + 1, (i+1)*w//g)); the
             |   -- two-tone varies only in x, so any y-range shares the value
             |   -- ((k*ny) // (nx*ny) = k // nx exactly) and one row of cells
             |   -- describes the whole 8-row grid. nxl = a-tone pixels.
             |c8 AS (
             |  SELECT doc_id, variant, i,
             |         (nxl * 299 * (a + shift) + (nx - nxl) * 299 * (b + shift)) // nx AS val
             |  FROM (
             |    SELECT geo.doc_id, geo.variant, geo.a, geo.b, geo.shift, r.i,
             |           greatest((r.i * geo.w) // 8 + 1, ((r.i + 1) * geo.w) // 8)
             |             - (r.i * geo.w) // 8 AS nx,
             |           greatest(0, least(
             |             greatest((r.i * geo.w) // 8 + 1, ((r.i + 1) * geo.w) // 8),
             |             geo.w // 2) - (r.i * geo.w) // 8) AS nxl
             |    FROM geo, range(8) r(i))
             |), c9 AS (
             |  SELECT doc_id, variant, i,
             |         (nxl * 299 * (a + shift) + (nx - nxl) * 299 * (b + shift)) // nx AS val
             |  FROM (
             |    SELECT geo.doc_id, geo.variant, geo.a, geo.b, geo.shift, r.i,
             |           greatest((r.i * geo.w) // 9 + 1, ((r.i + 1) * geo.w) // 9)
             |             - (r.i * geo.w) // 9 AS nx,
             |           greatest(0, least(
             |             greatest((r.i * geo.w) // 9 + 1, ((r.i + 1) * geo.w) // 9),
             |             geo.w // 2) - (r.i * geo.w) // 9) AS nxl
             |    FROM geo, range(9) r(i))
             |), t8 AS (
             |  SELECT doc_id, variant, 8 * sum(val) AS total,
             |         (min(val) = max(val)) AS flat,
             |         CAST(8 * sum(val) AS BIGINT) AS gsum
             |  FROM c8 GROUP BY doc_id, variant
             |), ah AS (
             |  -- bit 63 spelled as its two's-complement value: DuckDB refuses
             |  -- 1<<63, and disjoint bit contributions sum to the same
             |  -- signed long Spark's `ah |= 1L << 63` produces
             |  SELECT c.doc_id, c.variant,
             |         CAST(coalesce(sum(CASE WHEN c.val * 64 > t.total
             |           THEN (CASE WHEN ry.j * 8 + c.i = 63 THEN CAST(-9223372036854775808 AS BIGINT)
             |                      ELSE CAST(1 AS BIGINT) << (ry.j * 8 + c.i) END) ELSE 0 END), 0) AS BIGINT) AS ahash
             |  FROM c8 c JOIN t8 t USING (doc_id, variant), range(8) ry(j)
             |  GROUP BY c.doc_id, c.variant
             |), dh AS (
             |  SELECT l.doc_id, l.variant,
             |         CAST(coalesce(sum(CASE WHEN l.val > r.val
             |           THEN (CASE WHEN ry.j * 8 + l.i = 63 THEN CAST(-9223372036854775808 AS BIGINT)
             |                      ELSE CAST(1 AS BIGINT) << (ry.j * 8 + l.i) END) ELSE 0 END), 0) AS BIGINT) AS dhash
             |  FROM c9 l JOIN c9 r
             |    ON r.doc_id = l.doc_id AND r.variant = l.variant AND r.i = l.i + 1,
             |       range(8) ry(j)
             |  WHERE l.i < 8
             |  GROUP BY l.doc_id, l.variant
             |), keyed AS (
             |  SELECT v.doc_id, ah.ahash, dh.dhash,
             |         CASE WHEN t8.flat THEN t8.gsum ELSE CAST(-1 AS BIGINT) END AS flat_sum
             |  FROM v
             |  JOIN ah ON ah.doc_id = v.doc_id AND ah.variant = v.variant
             |  JOIN dh ON dh.doc_id = v.doc_id AND dh.variant = v.variant
             |  JOIN t8 ON t8.doc_id = v.doc_id AND t8.variant = v.variant
             |)
             |SELECT ahash, dhash, flat_sum,
             |       min(doc_id) AS keeper_id, count(*) AS n_copies
             |FROM keyed GROUP BY ahash, dhash, flat_sum""".stripMargin)),

    // JPEG re-encode robustness AT INGEST (ext94's streaming twin):
    // the four-variant planting — base PNG / BMP / +1 PNG / REAL JPEG
    // q0.75 — is encoded and hashed inside the stream; the area-average
    // luma hash must collapse all four per doc (JPEG erases the planted
    // dither but not the cell means) while byte signatures see four.
    // Streaming joins of two aggregates are not expressible, so the
    // nearest-sample CONTRAST lives in batch ext94; here the collapse
    // itself is the pinned claim.
    "st34_stream_jpeg_robustness" -> Q(
      (s, d) => {
        val sample = Streams.readDocumentsStream(s, d)
          .filter(col("doc_id") % 20 === 0)
        val media = graft.operators.Multimodal.encodeJpegVariants(sample, "doc_id")
        // countDistinct is not a supported streaming aggregate —
        // size(collect_set(...)) computes the same exact distinct count
        // (bounded here: ≤ 4 elements per group by construction)
        val grouped = graft.operators.Multimodal.perceptualHashes(media).toDF()
          .groupBy(col("doc_id"))
          .agg(count(lit(1)).as("n_variants"),
               size(collect_set(struct(col("ahash"), col("dhash"))))
                 .cast("long").as("n_phash_area"),
               size(collect_set(col("byte_sig"))).cast("long").as("n_bytesig"))
        Streams.runToMemory(s, grouped, "st34_jpeg", OutputMode.Complete())
      },
      Some("""SELECT doc_id, CAST(4 AS BIGINT) AS n_variants,
             |       CAST(1 AS BIGINT) AS n_phash_area,
             |       CAST(4 AS BIGINT) AS n_bytesig
             |FROM documents WHERE doc_id % 20 = 0""".stripMargin)),

    // Capped contamination AT INGEST (st07 + the ext93 family guard):
    // the static benchmark index carries a PLANTED 20-copy viral family
    // (near-identical benchmark items — the common real case), its
    // buckets are sized at index-build time, and every arriving doc
    // whose text is rewritten to the family boiler (doc_id % 7 = 0 on
    // the train side) probes only the bucket's ONE collapsed row and is
    // FLAGGED with the family's smallest bench id and NULL jaccard —
    // the per-pair verify the cap skips. Natural arrivals verify
    // exactly as st07 over the sub-cap index; the oracle replays both
    // legs (pairs over the same rewritten corpus, flags closed-form).
    "st35_stream_capped_contamination" -> Q(
      (s, d) => {
        import s.implicits._
        val boiler = "please verify you are human before continuing to " +
          "the requested benchmark item page now"
        // the caller composes whole frames (the batch capped operators'
        // contract): benchmark = natural split + the planted family,
        // stream = natural arrivals with every 7th text rewritten
        val bench = s.read.parquet(s"$d/documents.parquet")
          .filter(col("doc_id") % 10 === 0).select(col("doc_id"), col("text"))
          .unionByName((1001 to 1020).map(i => (-i.toLong, boiler))
            .toDF("doc_id", "text"))
        val stream = Streams.readDocumentsStream(s, d)
          .filter(col("doc_id") % 10 =!= 0)
          .withColumn("text",
            when(col("doc_id") % 7 === 0, lit(boiler)).otherwise(col("text")))
        val (out, releaseIndex) = Streams.contaminationStreamCapped(s, d,
          n = 3, k = 128, bands = 32, threshold = 0.8, maxBucket = 16,
          bench = Some(bench), stream = Some(stream))
        // runToMemory drains the query synchronously — the persisted
        // index is released as soon as the stream is done with it,
        // INCLUDING when the drain throws (ADVICE r8: the explicit-handle
        // path bypasses Caching's action-count backstop, so a failed
        // drain would otherwise leak the MEMORY_AND_DISK index for the
        // session)
        try Streams.runToMemory(s, out, "st35_capped", OutputMode.Append())
        finally releaseIndex()
      },
      Some(raw"""WITH rw AS (
             |  SELECT doc_id,
             |         CASE WHEN doc_id % 10 <> 0 AND doc_id % 7 = 0
             |              THEN 'please verify you are human before continuing to the requested benchmark item page now'
             |              ELSE text END AS text
             |  FROM documents
             |), w AS (
             |  SELECT doc_id, list_filter(regexp_split_to_array(text, '\s+'), t -> t <> '') AS w FROM rw
             |), sh AS (
             |  SELECT doc_id, list_distinct(list_transform(range(1, len(w) - 1),
             |           i -> w[i] || ' ' || w[i+1] || ' ' || w[i+2])) AS s
             |  FROM w WHERE len(w) >= 3
${OracleSql.InvIndex}
             |)
             |SELECT ix.doc_id, ix.matched_bench_id,
             |       round(i::DOUBLE / (st.n + sb.n - i), 6) AS jaccard,
             |       'verified' AS kind
             |FROM (SELECT t.doc_id, b.doc_id AS matched_bench_id, count(*) AS i
             |      FROM inv t JOIN inv b
             |        ON t.g = b.g AND t.doc_id % 10 <> 0 AND b.doc_id % 10 = 0
             |      GROUP BY 1, 2) ix
             |JOIN sz st ON st.doc_id = ix.doc_id
             |JOIN sz sb ON sb.doc_id = ix.matched_bench_id
             |WHERE i::DOUBLE / (st.n + sb.n - i) >= 0.8
             |UNION ALL
             |SELECT doc_id, CAST(-1020 AS BIGINT), CAST(NULL AS DOUBLE),
             |       'family_flag'
             |FROM documents WHERE doc_id % 10 <> 0 AND doc_id % 7 = 0""".stripMargin)),

    // Bloom decontamination AT INGEST (ext92's streaming twin, and the
    // exact-match complement of st07's LSH near-dup probe): the
    // benchmark Bloom sketch is built ONCE at query start (index-build
    // time) and broadcast; each arriving doc passes a row-local
    // membership test — no state, no watermark — and only candidates
    // reach the stream-static exact verify join against the (broadcast-
    // sized) benchmark. No false negatives ⇒ the drained output equals
    // the batch corpus⋈benchmark join, which is the oracle.
    "st33_stream_bloom_decontam" -> Q(
      (s, d) => {
        graft.sql.GraftExtensions.ensureRegistered(s)
        val bench = s.read.parquet(s"$d/documents.parquet")
          .filter(col("doc_id") % 13 === 0)
          .select(col("doc_id").as("bench_id"), col("text").as("__btext"))
          .filter(col("__btext").isNotNull)
        val bf = bench.stat.bloomFilter("__btext", math.max(1L, bench.count()), 0.01)
        // native codegen'd membership probe (ext92's scan discipline):
        // the per-batch scan stays whole-stage codegen, no typed lambda
        val sketch = { val bos = new java.io.ByteArrayOutputStream()
                       bf.writeTo(bos); bos.toByteArray }
        val cand = Streams.readDocumentsStream(s, d)
          .select(col("doc_id"), col("text").as("__text"))
          .filter(col("__text").isNotNull &&
            call_function("bloom_might_contain", lit(sketch), col("__text")))
        val verified = cand.join(bench, cand("__text") === bench("__btext"))
          .select(col("doc_id"), col("bench_id"))
        Streams.runToMemory(s, verified, "st33_bloom", OutputMode.Append())
      },
      Some("""SELECT c.doc_id, b.doc_id AS bench_id
             |FROM documents c
             |JOIN documents b ON b.doc_id % 13 = 0 AND c.text = b.text""".stripMargin)),

    // decontamination-at-ingest: streaming docs LSH-probe a static
    // benchmark index; banding at 32×4 provably finds every pair on this
    // fixture (see Extensions scaladoc), so the streamed output equals
    // the cross-side all-pairs truth — the same oracle as batch ext16.
    // mixture sampling at ingest: rates are the batch artifact, each
    // arriving row's verdict is row-local — streamed output equals the
    // batch ext52 answer, and the oracle replays both halves.
    "st11_stream_mixture" -> Q(
      (s, d) => {
        val sampled = Streams.mixtureSampleStream(s, d, budgetDocs = 200L, salt = "mix")
        Streams.runToMemory(s, sampled, "st11_mixture", OutputMode.Append())
      },
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

    // PII scrubbing at ingest: the redaction operator is a stateless
    // narrow projection, so the SAME function runs unchanged on the
    // stream — no watermark, no state store; masked rows materialize
    // as they arrive. The ext29 planted rows ride the staged input so
    // every mask pattern fires on a real stream; oracle = ext29's SQL.
    "st12_stream_pii" -> Q(
      (s, d) => {
        import s.implicits._
        val base = scratch(s, d, "pii")
        val planted = Seq(
          (-1L, "contact john.doe@example.com or jane@sub.example.org today"),
          (-2L, "server at 192.168.0.1 and 10.0.0.255 responded fine"),
          (-3L, "call 555-123-4567 or 555.987.6543 ref 1234567890")
        ).toDF("doc_id", "text")
        s.read.parquet(s"$d/documents.parquet")
          .select(col("doc_id"), col("text")).unionByName(planted)
          .write.parquet(s"$base/in")
        val stream = s.readStream
          .schema("doc_id BIGINT, text STRING").parquet(s"$base/in")
        val red = graft.operators.TextAnalysis.redactPii(stream, "doc_id", "text")
        Streams.runToMemory(s, red, "st12_pii", OutputMode.Append())
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

    // importance scoring at ingest: the DSIR bucket-weight model is the
    // batch artifact; each arriving doc scores itself with a per-row
    // integer fold (model as a plan-literal map — no join, no state).
    // Oracle = ext58's replay: streamed scores equal the batch scores.
    "st14_stream_importance" -> Q(
      (s, d) => Streams.runToMemory(s,
        Streams.importanceStream(s, d, targetSource = "src0", dims = 64),
        "st14_importance", OutputMode.Append()),
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

    // content-defined chunking at ingest: cdcChunks is a stateless
    // shuffle-free generate pass, so it runs UNCHANGED on the unbounded
    // stream — no watermark, no state store; each arriving doc chunks
    // itself. Oracle: the same full boundary replay as ext61.
    // VERSIONED TABLE AS A STREAM (r11 verdict #4): three engine
    // commits drained by repeated CDC drains keyed by the checkpoint's
    // last-seen version. Drain 1 = the initial-snapshot bootstrap
    // (tagged v1); drain 2 = changesBetween(1, 3) with per-commit tags;
    // drain 3 = REQUIREd empty (up-to-date checkpoint drains nothing).
    // The accumulated union is REQUIREd equal to the snapshot +
    // changesBetween fold, and the oracle replays it closed-form from
    // customer (%3 slice -> version & commit). Crash replay-skip and
    // the non-append refusal are pinned in VersionedTableSpec.
    "st54_stream_cdc_source" -> Q(
      (s, d) => {
        val base = scratch(s, d, "cdc_source")
        val loc = s"$base/tbl"; val ckpt = s"$base/ckpt"
        import graft.sinks.VersionedTable
        val cust = s.read.parquet(s"$d/customer.parquet")
          .select(col("c_custkey"),
            expr("CAST(floor(c_acctbal * 100 + 0.5) AS BIGINT)").as("cents"))
        VersionedTable.commit(s, loc,
          cust.filter(col("c_custkey") % 3 === 0).withColumn("version", lit("v1")),
          "overwrite")
        val drains = scala.collection.mutable.ArrayBuffer
          .empty[org.apache.spark.sql.DataFrame]
        val d1 = Streams.drainVersionedChanges(s, loc, ckpt)((df, _, _) => drains += df)
        require(d1.contains((0L, 1L)),
          s"st54: bootstrap drain must cover (0,1], got $d1")
        VersionedTable.commit(s, loc,
          cust.filter(col("c_custkey") % 3 === 1).withColumn("version", lit("v2")),
          "append")
        VersionedTable.commit(s, loc,
          cust.filter(col("c_custkey") % 3 === 2).withColumn("version", lit("v3")),
          "append")
        val d2 = Streams.drainVersionedChanges(s, loc, ckpt)((df, _, _) => drains += df)
        require(d2.contains((1L, 3L)),
          s"st54: incremental drain must cover (1,3], got $d2")
        val d3 = Streams.drainVersionedChanges(s, loc, ckpt)((df, _, _) => drains += df)
        require(d3.isEmpty, "st54: an up-to-date checkpoint must drain nothing")
        val acc = drains.reduce(_ unionByName _)
        // the drained union IS the changesBetween fold — asserted, not argued
        val fold = VersionedTable.read(s, loc, Some(1L))
          .withColumn("_commit_version", lit(1L))
          .unionByName(VersionedTable.changesBetween(s, loc, 1L, 3L))
        require(acc.exceptAll(fold).isEmpty && fold.exceptAll(acc).isEmpty,
          "st54: drains must equal the snapshot + changesBetween fold")
        acc
      },
      Some("""SELECT c_custkey,
             |       CAST(floor(c_acctbal * 100 + 0.5) AS BIGINT) AS cents,
             |       CASE CAST(c_custkey % 3 AS INT) WHEN 0 THEN 'v1'
             |            WHEN 1 THEN 'v2' ELSE 'v3' END AS version,
             |       CAST(c_custkey % 3 + 1 AS BIGINT) AS _commit_version
             |FROM customer""".stripMargin)),

    // RATE-LIMITED CDC drains (r12 verdict #4): the same three-commit
    // lifecycle as st54, but the checkpoint catches up through
    // maxVersionsPerDrain=1 batches via the availableNow-style
    // quiescence loop — bounded bootstrap (snapshot AT v1, not the
    // head), one commit per batch, and the bounded drains REQUIREd to
    // fold to the identical snapshot+changes truth. Because every
    // batch advances exactly one commit, each row's _commit_version is
    // its true commit — the oracle is st54's, derived independently.
    "st55_stream_cdc_bounded" -> Q(
      (s, d) => {
        val base = scratch(s, d, "cdc_bounded")
        val loc = s"$base/tbl"; val ckpt = s"$base/ckpt"
        import graft.sinks.VersionedTable
        val cust = s.read.parquet(s"$d/customer.parquet")
          .select(col("c_custkey"),
            expr("CAST(floor(c_acctbal * 100 + 0.5) AS BIGINT)").as("cents"))
        VersionedTable.commit(s, loc,
          cust.filter(col("c_custkey") % 3 === 0).withColumn("version", lit("v1")),
          "overwrite")
        VersionedTable.commit(s, loc,
          cust.filter(col("c_custkey") % 3 === 1).withColumn("version", lit("v2")),
          "append")
        VersionedTable.commit(s, loc,
          cust.filter(col("c_custkey") % 3 === 2).withColumn("version", lit("v3")),
          "append")
        val drains = scala.collection.mutable.ArrayBuffer
          .empty[org.apache.spark.sql.DataFrame]
        val ranges = Streams.drainVersionedToQuiescence(s, loc, ckpt,
          maxVersionsPerDrain = Some(1))((df, _, _) => drains += df)
        require(ranges == Seq((0L, 1L), (1L, 2L), (2L, 3L)),
          s"st55: rate-limited catch-up must advance one commit per batch, got $ranges")
        require(Streams.drainVersionedChanges(s, loc, ckpt,
            maxVersionsPerDrain = Some(1))((_, _, _) => ()).isEmpty,
          "st55: an up-to-date checkpoint must drain nothing")
        val acc = drains.reduce(_ unionByName _)
        // bounded drains fold to the SAME truth as one unbounded drain
        val fold = VersionedTable.read(s, loc, Some(1L))
          .withColumn("_commit_version", lit(1L))
          .unionByName(VersionedTable.changesBetween(s, loc, 1L, 3L))
        require(acc.exceptAll(fold).isEmpty && fold.exceptAll(acc).isEmpty,
          "st55: bounded drains must equal the snapshot + changesBetween fold")
        acc
      },
      Some("""SELECT c_custkey,
             |       CAST(floor(c_acctbal * 100 + 0.5) AS BIGINT) AS cents,
             |       CASE CAST(c_custkey % 3 AS INT) WHEN 0 THEN 'v1'
             |            WHEN 1 THEN 'v2' ELSE 'v3' END AS version,
             |       CAST(c_custkey % 3 + 1 AS BIGINT) AS _commit_version
             |FROM customer""".stripMargin)),

    // BYTES-bounded CDC drains (r13 verdict #6): an UNEVEN three-commit
    // history (40% / 50% / 10% key slices) drained under a
    // maxBytesPerDrain budget derived from the table's OWN manifest
    // byte totals (= the v2+v3 appended bytes, ~60%): the bootstrap
    // stops at v1 (40% fits the budget; +v2's 50% does not), then
    // v2+v3 fold into ONE batch — REQUIREd, so the head really is
    // budget-chosen, not count-chosen (a count bound of 1 would split
    // them; no count bound would drain everything at once).
    // changesBetween tags each drained row its true commit, so the
    // fold equals the snapshot+changes truth and the oracle derives
    // independently (closed form over the key slices).
    "st56_stream_cdc_bytes" -> Q(
      (s, d) => {
        val base = scratch(s, d, "cdc_bytes")
        val loc = s"$base/tbl"; val ckpt = s"$base/ckpt"
        import graft.sinks.VersionedTable
        val cust = s.read.parquet(s"$d/customer.parquet")
          .select(col("c_custkey"),
            expr("CAST(floor(c_acctbal * 100 + 0.5) AS BIGINT)").as("cents"))
        val slice = col("c_custkey") % 10
        VersionedTable.commit(s, loc,
          cust.filter(slice <= 3).withColumn("version", lit("v1")),
          "overwrite")
        VersionedTable.commit(s, loc,
          cust.filter(slice >= 4 && slice <= 8).withColumn("version", lit("v2")),
          "append")
        VersionedTable.commit(s, loc,
          cust.filter(slice === 9).withColumn("version", lit("v3")),
          "append")
        val bytes = VersionedTable.history(s, loc).collect()
          .map(r => (r.getAs[Long]("version"), r.getAs[Long]("total_bytes"))).toMap
        val budget = bytes(3L) - bytes(1L) // the v2+v3 appended bytes
        require(bytes(1L) <= budget && bytes(2L) > budget,
          s"st56: the 40/50/10 slices must keep v1 <= budget < v1+v2, got $bytes")
        val drains = scala.collection.mutable.ArrayBuffer
          .empty[org.apache.spark.sql.DataFrame]
        val ranges = Streams.drainVersionedToQuiescence(s, loc, ckpt,
          maxBytesPerDrain = Some(budget))((df, _, _) => drains += df)
        require(ranges == Seq((0L, 1L), (1L, 3L)),
          s"st56: the budget must stop the bootstrap at v1 then fold " +
            s"v2+v3 into one batch, got $ranges")
        val acc = drains.reduce(_ unionByName _)
        val fold = VersionedTable.read(s, loc, Some(1L))
          .withColumn("_commit_version", lit(1L))
          .unionByName(VersionedTable.changesBetween(s, loc, 1L, 3L))
        require(acc.exceptAll(fold).isEmpty && fold.exceptAll(acc).isEmpty,
          "st56: bytes-bounded drains must equal the snapshot + changesBetween fold")
        acc
      },
      Some("""SELECT c_custkey,
             |       CAST(floor(c_acctbal * 100 + 0.5) AS BIGINT) AS cents,
             |       CASE WHEN c_custkey % 10 <= 3 THEN 'v1'
             |            WHEN c_custkey % 10 <= 8 THEN 'v2'
             |            ELSE 'v3' END AS version,
             |       CAST(CASE WHEN c_custkey % 10 <= 3 THEN 1
             |                 WHEN c_custkey % 10 <= 8 THEN 2
             |                 ELSE 3 END AS BIGINT) AS _commit_version
             |FROM customer""".stripMargin)),

    "st15_stream_cdc" -> Q(
      (s, d) => Streams.runToMemory(s,
        graft.operators.TextAnalysis.cdcChunks(
          Streams.readDocumentsStream(s, d), "doc_id", "text",
          window = 4, divisor = 8),
        "st15_cdc", OutputMode.Append()),
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

    // band join at ingest: the static interval side explodes onto grid
    // cells once; each arriving event maps to ONE cell and the
    // stream-static equi-join is stateless — no watermark, no state
    // store, no nested loop (the plan a raw BETWEEN stream join can't
    // have). Bands derive from the nation fixture; oracle = plain
    // BETWEEN join.
    "st16_stream_band_join" -> Q(
      (s, d) => {
        val bands = s.read.parquet(s"$d/nation.parquet")
          .select(col("n_nationkey").as("band_id"),
            (col("n_nationkey") * 4.0).as("lo"),
            (col("n_nationkey") * 4.0 + 6.0).as("hi"))
        val ev = Streams.readEventsStream(s, d)
          .select(col("event_id"), col("value"))
        Streams.runToMemory(s,
          graft.operators.RangeJoin.bandJoin(ev, bands, "value", "lo", "hi",
              bucket = 5.0)
            .select(col("event_id"), col("band_id"),
              floor(col("value") * 1000000 + 0.5).cast("long").as("value_e6")),
          "st16_bands", OutputMode.Append())
      },
      Some("""SELECT e.event_id, n.n_nationkey AS band_id,
             |       CAST(floor(e.value * 1000000 + 0.5) AS BIGINT) AS value_e6
             |FROM events e JOIN nation n
             |  ON e.value >= n.n_nationkey * 4.0 AND e.value <= n.n_nationkey * 4.0 + 6.0""".stripMargin)),

    // deterministic train/val/test split at ingest: md5 bucketing is a
    // stateless projection, so the stream plan IS the batch plan — no
    // watermark, no state store; every engine (and every epoch of the
    // same stream) reproduces the same membership. Oracle = ext21's
    // replay on the events table.
    "st17_stream_split" -> Q(
      (s, d) => {
        val ev = Streams.readEventsStream(s, d).select(col("event_id"))
        Streams.runToMemory(s,
          graft.operators.Sampling.split(ev, "event_id", "st17", 8000, 1000),
          "st17_split", OutputMode.Append())
      },
      Some("""WITH b AS (
             |  SELECT event_id,
             |         ('0x' || substr(md5(event_id::VARCHAR || ':st17'), 1, 8))::BIGINT % 10000 AS bucket
             |  FROM events)
             |SELECT event_id, bucket,
             |       CASE WHEN bucket < 8000 THEN 'train'
             |            WHEN bucket < 9000 THEN 'val'
             |            ELSE 'test' END AS split
             |FROM b""".stripMargin)),

    // classifier quality gate at ingest: the md5-hashed linear model
    // rides the plan (no side artifact), each doc scores itself with a
    // per-row fold — stateless. Oracle = ext56's model replay (the
    // batch and stream paths share TextAnalysis.tokenWeight, so the
    // logits are identical by construction; the oracle proves it).
    "st18_stream_classifier" -> Q(
      (s, d) => Streams.runToMemory(s,
        Streams.classifierStream(s, d, dims = 64, biasE6 = 250000L),
        "st18_classifier", OutputMode.Append()),
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

    // left-outer stream-stream join: clicks with no error in their
    // window must STILL come out, with a NULL error_id — and only when
    // the watermark proves the window is closed (Spark holds the
    // unmatched click in the join state store until then). The fixture
    // is a bounded
    // replay, so the last 30 minutes could never prove themselves
    // closed — the heartbeat source (readEventsStreamWithHeartbeat)
    // advances the watermark past the tail, exactly as a production
    // idle-source progress event would; the heartbeat's own user_id=-1
    // rows are filtered back out ON THE SINK SIDE — a pre-sink stream
    // filter gets pushed below the withWatermark operators (the join's
    // equality constraint infers it onto BOTH inputs), un-counting the
    // heartbeat from watermark accounting and re-stranding the tail.
    // The oracle is the plain batch LEFT JOIN — watermark bookkeeping
    // must not change the answer, only when it materializes.
    "st19_stream_left_join" -> Q(
      (s, d) => Streams.runToMemory(s,
        Streams.clicksWithRecentErrors(
          Streams.readEventsStreamWithHeartbeat(s, d), 30,
          joinType = "left_outer"),
        "st19_result", OutputMode.Append())
        .filter(col("user_id") =!= -1L),
      Some("""SELECT c.user_id, c.event_id AS click_id, e.event_id AS error_id
             |FROM events c LEFT JOIN events e
             |  ON e.event_type = 'error' AND c.user_id = e.user_id
             | AND e.ts >= c.ts - INTERVAL 30 MINUTE AND e.ts <= c.ts
             |WHERE c.event_type = 'click'""".stripMargin)),

    "st07_stream_contamination" -> Q(
      (s, d) => {
        val flagged = Streams.contaminationStream(s, d,
          n = 3, k = 128, bands = 32, threshold = 0.8)
        Streams.runToMemory(s, flagged, "st07_contamination", OutputMode.Append())
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

    // The PERSISTED-index probe on a stream (r14, the ext163 tier's
    // streaming twin): the index is ETL-built once from the %5<>2
    // corpus slice (writeMinHashIndex — bands + doc-bucketed sets +
    // stats), then the %5=2 document stream probes it via the
    // stream-static band join, never re-shingling the corpus. Oracle =
    // st07's inverted-index exact cross-Jaccard with the %5 split —
    // the same all-pairs truth restricted to (stream doc, indexed doc).
    "st57_stream_minhash_probe" -> Q(
      (s, d) => {
        val root = scratch(s, d, "mh_probe")
        val idx = s"$root/idx"
        graft.operators.Dedup.writeMinHashIndex(
          s.read.parquet(s"$d/documents.parquet")
            .filter(col("doc_id") % 5 =!= 2)
            .select(col("doc_id"), col("text")),
          "doc_id", "text", idx, n = 3, k = 128, bands = 32)
        val probed = Streams.minhashIndexProbeStream(s, idx,
          Streams.readDocumentsStream(s, d).filter(col("doc_id") % 5 === 2),
          "doc_id", "text", threshold = 0.8)
        Streams.runToMemory(s, probed, "st57_mh_probe", OutputMode.Append())
      },
      Some(raw"""WITH sh AS (
             |  SELECT doc_id, list_distinct(list_transform(range(1, len(w) - 1),
             |           i -> w[i] || ' ' || w[i+1] || ' ' || w[i+2])) AS s
             |  FROM (SELECT doc_id, list_filter(regexp_split_to_array(text, '\s+'), t -> t <> '') AS w FROM documents)
             |  WHERE len(w) >= 3
${OracleSql.InvIndex}
             |)
             |SELECT ix.doc_id, ix.matched_bench_id,
             |       round(i::DOUBLE / (st.n + sb.n - i), 6) AS jaccard
             |FROM (SELECT t.doc_id, b.doc_id AS matched_bench_id, count(*) AS i
             |      FROM inv t JOIN inv b
             |        ON t.g = b.g AND t.doc_id % 5 = 2 AND b.doc_id % 5 <> 2
             |      GROUP BY 1, 2) ix
             |JOIN sz st ON st.doc_id = ix.doc_id
             |JOIN sz sb ON sb.doc_id = ix.matched_bench_id
             |WHERE i::DOUBLE / (st.n + sb.n - i) >= 0.8""".stripMargin)),

    // curation-on-a-stream: the quality-rules operator is a pure narrow
    // projection, so the SAME function runs unchanged on a streaming
    // frame — each surviving document is emitted row-for-row as it
    // streams past (stateless: no watermark, no state store). Oracle =
    // the batch quality filter (ext18's SQL with the keep predicate).
    "st06_stream_curation" -> Q(
      (s, d) => {
        val kept = graft.operators.TextAnalysis
          .qualityRules(Streams.readDocumentsStream(s, d), "doc_id", "text")
          .filter(col("keep"))
        Streams.runToMemory(s, kept, "st06_quality", OutputMode.Append())
      },
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
             |SELECT doc_id, n_words, dup_word_frac_e6, dup_bigram_frac_e6, mean_word_len_e6, TRUE AS keep
             |FROM e
             |WHERE n_words BETWEEN 30 AND 100000
             |  AND dup_word_frac_e6 <= 500000
             |  AND dup_bigram_frac_e6 <= 100000
             |  AND mean_word_len_e6 BETWEEN 3000000 AND 10000000""".stripMargin)),

    // streaming materialized state → upsert sink: an unwatermarked
    // Update-mode aggregation (latest click + running count per user)
    // drained through foreachBatch into a refresh:upsert file target on
    // user_id — every emission replaces the user's row, so the sink holds
    // exactly the final state; the argmax is an order-independent
    // max-struct, so the oracle is the batch window replay.
    "st10_stream_upsert_state" -> Q(
      (s, d) => {
        val base = scratch(s, d, "upstate")
        Streams.runToSink(s,
          Streams.lastClickState(Streams.readEventsStream(s, d)),
          graft.config.OutputTable(
            name = "st10_out",
            target = graft.config.TargetSpec.File(s"$base/out"),
            refresh = graft.config.Refresh.Upsert,
            mergeKeys = Seq("user_id")),
          s"$base/ckpt", OutputMode.Update())
        s.read.parquet(s"$base/out")
          .select("user_id", "n_clicks", "last_click_id", "last_click_cents")
      },
      Some("""WITH c AS (
             |  SELECT user_id, event_id,
             |         CAST(floor(value * 100 + 0.5) AS BIGINT) AS cents,
             |         epoch_ns(ts) // 1000 AS us
             |  FROM events WHERE event_type = 'click'
             |), r AS (
             |  SELECT user_id, event_id, cents,
             |         row_number() OVER (PARTITION BY user_id
             |                            ORDER BY us DESC, event_id DESC) AS rk,
             |         count(*) OVER (PARTITION BY user_id) AS n_clicks
             |  FROM c
             |)
             |SELECT user_id, CAST(n_clicks AS BIGINT) AS n_clicks,
             |       event_id AS last_click_id, cents AS last_click_cents
             |FROM r WHERE rk = 1""".stripMargin)),

    // streaming composed with the BATCH sink machinery: foreachBatch
    // routes each micro-batch through Sinks.write (partitioned append),
    // read back from the partitioned parquet output; oracle = the same
    // projection in batch SQL.
    "st05_stream_to_sink" -> Q(
      (s, d) => {
        val base = scratch(s, d, "tosink")
        Streams.runToSink(s,
          Streams.readEventsStream(s, d)
            .select(col("event_id"), col("user_id"), col("event_type"),
              floor(col("value") * 100 + 0.5).cast("long").as("value_cents")),
          graft.config.OutputTable(
            name = "st05_out",
            target = graft.config.TargetSpec.File(s"$base/out"),
            refresh = graft.config.Refresh.Incremental,
            partitionKeys = Seq("event_type")),
          s"$base/ckpt")
        s.read.parquet(s"$base/out")
          .select("event_id", "user_id", "event_type", "value_cents")
      },
      Some("""SELECT event_id, user_id, event_type,
             |       CAST(floor(value * 100 + 0.5) AS BIGINT) AS value_cents
             |FROM events""".stripMargin)),

    "st01_stream_window" -> Q(
      (s, d) => Streams.runToMemory(s,
        Streams.windowedCounts(Streams.readEventsStream(s, d)),
        "st01_result", OutputMode.Complete()),
      Some("""SELECT date_trunc('hour', ts) AS window_start,
             |       date_trunc('hour', ts) + INTERVAL 1 HOUR AS window_end,
             |       event_type,
             |       count(*) AS n_events,
             |       CAST(sum(floor(value * 100 + 0.5)) AS BIGINT) AS value_cents
             |FROM events GROUP BY 1, 2, 3""".stripMargin)),

    // stream-stream interval join (clicks ⋈ same-user errors in the
    // preceding 30 min), state bounded by both-side watermarks; oracle =
    // the identical batch interval self-join.
    "st04_stream_join" -> Q(
      (s, d) => Streams.runToMemory(s,
        Streams.clicksWithRecentErrors(Streams.readEventsStream(s, d), 30),
        "st04_result", OutputMode.Append()),
      Some("""SELECT c.user_id, c.event_id AS click_id, e.event_id AS error_id
             |FROM events c JOIN events e
             |  ON c.event_type = 'click' AND e.event_type = 'error'
             | AND c.user_id = e.user_id
             | AND e.ts >= c.ts - INTERVAL 30 MINUTE AND e.ts <= c.ts""".stripMargin)),

    // exactly-once dedup under at-least-once delivery: the fixture is
    // staged TWICE into the stream source; dropDuplicatesWithinWatermark
    // must collapse it back to single-copy counts — the oracle is the
    // plain batch aggregate over the ORIGINAL (single) events table.
    "st03_stream_dedup" -> Q(
      (s, d) => {
        val deduped = Streams.runToMemory(s,
          Streams.dedupEvents(Streams.readEventsStreamDoubled(s, d)),
          "st03_deduped", OutputMode.Append())
        deduped.groupBy(col("event_type"))
          .agg(count(lit(1)).as("n_events"),
            sum(floor(col("value") * 100 + 0.5)).cast("long").as("value_cents"))
      },
      Some("""SELECT event_type, count(*) AS n_events,
             |       CAST(sum(floor(value * 100 + 0.5)) AS BIGINT) AS value_cents
             |FROM events GROUP BY event_type""".stripMargin)),

    // Append-mode windows: emitted exactly once when the watermark passes
    // the window end — the oracle replays Spark's watermark arithmetic
    // (final watermark = max event-time ms − delay; a window is emitted
    // iff its end ≤ that). The fixture's max ts sits off the hour
    // boundary at every SF, so `<` vs `≤` eviction strictness cannot
    // flip the answer. The two trailing open windows are the semantic
    // difference vs st01's Complete mode — both are pinned by oracles.
    "st09_stream_window_append" -> Q(
      (s, d) => Streams.runToMemory(s,
        Streams.windowedCountsAppend(Streams.readEventsStream(s, d), "1 hour"),
        "st09_result", OutputMode.Append()),
      Some("""WITH mx AS (
             |  SELECT (epoch_ns(max(ts)) // 1000000) - 3600000 AS wm_ms FROM events
             |)
             |SELECT date_trunc('hour', ts) AS window_start,
             |       date_trunc('hour', ts) + INTERVAL 1 HOUR AS window_end,
             |       event_type, count(*) AS n_events,
             |       CAST(sum(floor(value * 100 + 0.5)) AS BIGINT) AS value_cents
             |FROM events, mx
             |WHERE (epoch_ns(date_trunc('hour', ts) + INTERVAL 1 HOUR) // 1000000) <= wm_ms
             |GROUP BY 1, 2, 3""".stripMargin)),

    // Exact cosine top-3 retrieval at ingest: every arriving embedding
    // scores against a static BOUNDED reference (vec_id % 7 == 0 AND
    // vec_id < 500 — fixed by construction, NOT a corpus fraction: a
    // fraction grows with the corpus and ScaleCheck read the resulting
    // quadratic at 41×/10×) baked into the plan as a literal; per-row
    // top-k inside array expressions — stateless, no join fan-out, no
    // state store. Oracle = the ext05 cross-engine cosine discipline
    // over the same reference subset.
    "st42_stream_ann" -> Q(
      (s, d) => Streams.runToMemory(s,
        Streams.annProbeStream(s, d, k = 3),
        "st42_ann", OutputMode.Append()),
      Some("""WITH sim AS (
             |  SELECT q.vec_id AS qid, e.vec_id AS nid,
             |         round(list_cosine_similarity(q.embedding::DOUBLE[], e.embedding::DOUBLE[]), 6) AS cosine
             |  FROM embeddings q JOIN embeddings e
             |    ON e.vec_id % 7 = 0 AND e.vec_id < 500 AND e.vec_id <> q.vec_id
             |  WHERE q.embedding IS NOT NULL AND len(q.embedding) > 0
             |    AND e.embedding IS NOT NULL AND len(e.embedding) > 0
             |)
             |SELECT qid, CAST(rnk AS BIGINT) AS rnk, nid, cosine FROM (
             |  SELECT qid, nid, cosine,
             |         row_number() OVER (PARTITION BY qid ORDER BY cosine DESC, nid) AS rnk
             |  FROM sim) WHERE rnk <= 3""".stripMargin)),

    // SLIDING windows (1 h window, 15 min slide): every event counts in
    // exactly 4 overlapping epoch-aligned windows; append emission =
    // the st09 watermark arithmetic. The oracle expands each event into
    // its 4 window starts (floor-to-15-min minus k·15 min, k = 0..3)
    // and keeps watermark-closed windows — integer-ms replay of Spark's
    // sliding-window assignment.
    "st41_stream_sliding" -> Q(
      (s, d) => Streams.runToMemory(s,
        Streams.slidingCounts(Streams.readEventsStream(s, d), "1 hour"),
        "st41_sliding", OutputMode.Append()),
      Some("""WITH mx AS (
             |  SELECT (epoch_ns(max(ts)) // 1000000) - 3600000 AS wm_ms FROM events
             |), e AS (
             |  SELECT (epoch_ns(ts) // 1000000) AS ts_ms, event_type, value FROM events
             |), x AS (
             |  SELECT ts_ms // 900000 * 900000 - k.k * 900000 AS ws_ms, event_type, value
             |  FROM e, (SELECT unnest(range(4)) AS k) k
             |), g AS (
             |  SELECT ws_ms, event_type, count(*) AS n_events,
             |         CAST(sum(floor(value * 100 + 0.5)) AS BIGINT) AS value_cents
             |  FROM x GROUP BY 1, 2
             |)
             |SELECT make_timestamp(ws_ms * 1000) AS window_start,
             |       make_timestamp((ws_ms + 3600000) * 1000) AS window_end,
             |       event_type, n_events, value_cents
             |FROM g, mx WHERE ws_ms + 3600000 <= wm_ms""".stripMargin)),

    // Streaming top-k leaderboard per closed hour window via the
    // bounded-heap top_k_by aggregate — constant state per (window,
    // type) where row_number-over-window is unsupported on streams.
    // The oracle is the batch window form restricted to windows the
    // final watermark closed (the st09 emission arithmetic).
    "st28_stream_topk" -> Q(
      (s, d) => Streams.runToMemory(s,
        Streams.windowedTopK(Streams.readEventsStream(s, d), k = 3),
        "st28_topk", OutputMode.Append()),
      Some("""WITH mx AS (
             |  SELECT (epoch_ns(max(ts)) // 1000000) - 3600000 AS wm_ms FROM events
             |),
             |ranked AS (
             |  SELECT date_trunc('hour', ts) AS window_start,
             |         event_type, event_id,
             |         CAST(floor(value * 100 + 0.5) AS BIGINT) AS cents,
             |         row_number() OVER (PARTITION BY date_trunc('hour', ts), event_type
             |           ORDER BY CAST(floor(value * 100 + 0.5) AS BIGINT) DESC,
             |                    event_id DESC) AS rn
             |  FROM events
             |)
             |SELECT window_start, event_type, event_id, cents
             |FROM ranked, mx
             |WHERE rn <= 3
             |  AND (epoch_ns(window_start + INTERVAL 1 HOUR) // 1000000) <= wm_ms""".stripMargin)),

    // Malformed-row quarantine AT INGEST (fw_quarantine's streaming
    // twin): staged nation csv + planted bad lines drain through ONE
    // streaming query whose every micro-batch appends parsed rows to
    // the main table and raw rejects to the quarantine table. The
    // result unions both sides so the oracle checks the exact split.
    "st30_stream_quarantine" -> Q(
      (s, d) => {
        val base = scratch(s, d, "quarantine")
        s.read.parquet(s"$d/nation.parquet")
          .select(col("n_nationkey"), col("n_name"), col("n_regionkey"))
          .write.option("sep", "|").csv(s"$base/in")
        val junk = new java.io.FileOutputStream(s"$base/in/part-badlines.csv")
        junk.write("999|TOOFEW\n998|BADTYPE|notanint\n997|ok|3|extra\n".getBytes("UTF-8"))
        junk.close()
        Streams.quarantineStream(s, s"$base/in",
          "n_nationkey INT, n_name STRING, n_regionkey INT",
          Map("separator" -> "|"), s"$base/out", s"$base/quarantined", s"$base/ckpt")
        s.read.parquet(s"$base/out")
          .select(col("n_nationkey"), col("n_name"), col("n_regionkey"))
          .unionByName(
            s.read.parquet(s"$base/quarantined")
              .select(lit(-1).cast("int").as("n_nationkey"),
                col("raw_record").as("n_name"),
                lit(-1).cast("int").as("n_regionkey")))
      },
      Some("""SELECT n_nationkey, n_name, n_regionkey FROM nation
             |UNION ALL
             |SELECT CAST(-1 AS INT), v.raw, CAST(-1 AS INT) FROM (VALUES
             |  ('999|TOOFEW'), ('998|BADTYPE|notanint'), ('997|ok|3|extra')) v(raw)""".stripMargin)),

    // Distinct-user cardinality AT INGEST via the KMV sketch (ext80's
    // streaming twin): state per event_type is k=64 longs no matter how
    // many events stream through, the sketch unions across micro-batches
    // through the aggregate's merge path, and — unlike HLL — the drained
    // estimate is a pure function of the input set, so the batch oracle
    // replays it to the digit. Complete+memory for the bounded drain;
    // production shape is Update mode into an upsert sink (st10's path).
    "st29_stream_kmv" -> Q(
      (s, d) => {
        graft.sql.GraftExtensions.ensureRegistered(s)
        val hashed = Streams.readEventsStream(s, d)
          .select(col("event_type"),
            expr("CAST(conv(substring(md5(CAST(user_id AS STRING)), 1, 15), 16, 10) AS BIGINT)").as("hv"))
        val sketched = hashed.groupBy(col("event_type"))
          .agg(expr("kmv_sketch(hv, 64)").as("ks"))
          .select(col("event_type"),
            size(col("ks")).cast("long").as("n_kept"),
            when(size(col("ks")) < 64, size(col("ks")).cast("long"))
              .otherwise(floor(lit(63.0) * pow(lit(2.0), lit(60.0)) /
                element_at(col("ks"), 64) + lit(0.5)).cast("long"))
              .as("est_users"))
        Streams.runToMemory(s, sketched, "st29_kmv", OutputMode.Complete())
      },
      Some("""WITH h AS (
             |  SELECT DISTINCT event_type,
             |         CAST(('0x' || substr(md5(CAST(user_id AS VARCHAR)), 1, 15))::BIGINT AS BIGINT) AS hv
             |  FROM events
             |), r AS (
             |  SELECT event_type, hv,
             |         row_number() OVER (PARTITION BY event_type ORDER BY hv) AS rn,
             |         count(*) OVER (PARTITION BY event_type) AS cnt
             |  FROM h
             |)
             |SELECT event_type,
             |       CAST(least(cnt, 64) AS BIGINT) AS n_kept,
             |       CAST(CASE WHEN cnt < 64 THEN cnt
             |                 ELSE floor(63.0 * power(2.0, 60.0) / max(CASE WHEN rn = 64 THEN hv END) + 0.5)
             |            END AS BIGINT) AS est_users
             |FROM r
             |GROUP BY event_type, cnt""".stripMargin)),

    // exact-dedup AT INGEST: the streaming twin of ext01 — a stateful
    // aggregation keyed on the content hash, so every arriving copy
    // updates one state row (keeper = min doc_id, copy count) and the
    // drained result equals the batch dedup exactly (aggregation output
    // is arrival-order-independent, unlike row-pick dedup). State is one
    // narrow row per DISTINCT hash; at 100 TB that runs Update mode into
    // an upsert sink (Sinks.write) with the RocksDB state store —
    // Complete+memory here only because the gate reads one bounded drain.
    "st08_stream_exact_dedup" -> Q(
      (s, d) => Streams.runToMemory(s,
        Streams.readDocumentsStream(s, d)
          .select(col("doc_id"), md5(col("text")).as("content_hash"))
          .groupBy(col("content_hash"))
          .agg(min(col("doc_id")).as("keeper_id"),
            count(lit(1)).as("n_copies")),
        "st08_dedup", OutputMode.Complete()),
      Some("""SELECT md5(text) AS content_hash,
             |       min(doc_id) AS keeper_id,
             |       count(*) AS n_copies
             |FROM documents GROUP BY md5(text)""".stripMargin)),

    // Closed sessions only — deterministic, so it gets a real oracle:
    // a session is emitted iff it is not the user's last, OR its
    // event-time timeout fired by the final watermark (max_ts_ms −
    // delay); gap = delay = 30 min. The SQL mirrors the engine's
    // arithmetic exactly: ns→µs floor division for event times (Spark
    // reads `ts div 1000`), µs→ms floor for the timeout compare
    // (setTimeoutTimestamp takes ms), the sessionize clamp
    // max(end_ms + gap, watermark_at_set + 1) — 0 + 1 here, all data
    // arrives in the first micro-batch — and Spark's STRICT
    // `timeoutTimestamp < watermark` firing condition
    // (FlatMapGroupsWithStateExec): at exact ms equality the session
    // stays OPEN. StreamingSpec proves the same equality against the
    // batch lag/gap-sum sessionization in Spark.
    // gap-sessionization via the BUILT-IN session_window aggregation —
    // the declarative path next to st02's flatMapGroupsWithState (use
    // the built-in when per-session output is an aggregate; custom
    // state only when session content matters). Append mode: a session
    // emits iff the final watermark (max ts − 1h, ms precision) passed
    // its end (last event + 30m gap); the oracle replays the gap
    // sessions AND that emission arithmetic.
    "st13_stream_session_window" -> Q(
      (s, d) => Streams.runToMemory(s,
        Streams.sessionWindows(Streams.readEventsStream(s, d), 30, "1 hour"),
        "st13_sessions", OutputMode.Append()),
      Some("""WITH e AS (
             |  SELECT user_id, epoch_ns(ts) // 1000 AS us,
             |         floor(value * 100 + 0.5) AS cents
             |  FROM events
             |),
             |marked AS (
             |  SELECT user_id, us, cents,
             |         CASE WHEN lag(us) OVER w IS NULL
             |                OR us - lag(us) OVER w > 1800000000 THEN 1 ELSE 0 END AS new_s
             |  FROM e WINDOW w AS (PARTITION BY user_id ORDER BY us)
             |),
             |sess AS (
             |  SELECT user_id, us, cents,
             |         sum(new_s) OVER (PARTITION BY user_id ORDER BY us ROWS UNBOUNDED PRECEDING) AS sid
             |  FROM marked
             |),
             |agg AS (
             |  SELECT user_id, min(us) AS session_start_us,
             |         max(us) + 1800000000 AS session_end_us,
             |         CAST(count(*) AS BIGINT) AS n_events,
             |         CAST(sum(cents) AS BIGINT) AS value_cents
             |  FROM sess GROUP BY user_id, sid
             |),
             |mx AS (SELECT (epoch_ns(max(ts)) // 1000000) - 3600000 AS wm_ms FROM events)
             |SELECT user_id, session_start_us, session_end_us, n_events, value_cents
             |FROM agg, mx
             |WHERE (session_end_us // 1000) <= wm_ms""".stripMargin)),

    // multi-micro-batch replay: the SAME sessionization as st02, but the
    // fixture arrives as four time-ordered shards with
    // maxFilesPerTrigger=1 — four micro-batches, watermark advancing
    // between them, so flatMapGroupsWithState must carry open sessions
    // ACROSS batch boundaries and emit each closed session in whichever
    // batch its timeout fires. Same oracle as st02: how the data is
    // micro-batched must not change the answer.
    "st20_stream_session_replay" -> Q(
      (s, d) => {
        val sessions = Streams.runToMemory(s,
          Streams.sessionize(Streams.readEventsStreamSharded(s, d, 4), 30).toDF(),
          "st20_sessions", OutputMode.Append())
        sessions
          .groupBy(col("user_id"))
          .agg(count(lit(1)).as("n_sessions"), sum(col("n_events")).as("n_events"))
      },
      Some("""WITH e AS (
             |  SELECT user_id, epoch_ns(ts) // 1000 AS us FROM events
             |),
             |marked AS (
             |  SELECT user_id, us,
             |         CASE WHEN lag(us) OVER w IS NULL
             |                OR us - lag(us) OVER w > 1800000000 THEN 1 ELSE 0 END AS new_s
             |  FROM e WINDOW w AS (PARTITION BY user_id ORDER BY us)
             |),
             |sess AS (
             |  SELECT user_id, us,
             |         sum(new_s) OVER (PARTITION BY user_id ORDER BY us ROWS UNBOUNDED PRECEDING) AS sid
             |  FROM marked
             |),
             |agg AS (
             |  SELECT user_id, sid, max(us) AS end_us, count(*) AS n_events
             |  FROM sess GROUP BY user_id, sid
             |),
             |mx AS (SELECT max(us) AS max_us FROM e),
             |ranked AS (
             |  SELECT user_id, sid, n_events, end_us,
             |         row_number() OVER (PARTITION BY user_id ORDER BY sid DESC) AS rk
             |  FROM agg
             |)
             |SELECT user_id, count(*) AS n_sessions, CAST(sum(n_events) AS BIGINT) AS n_events
             |FROM ranked, mx
             |WHERE rk > 1 OR greatest((end_us // 1000) + 1800000, 1) < (max_us // 1000) - 1800000
             |GROUP BY user_id""".stripMargin)),

    // full-outer stream-stream join: BOTH dangling sides surface —
    // unmatched clicks with NULL error_id once the error watermark
    // closes their window (as st19), and unmatched errors with NULL
    // click_id once the click watermark passes their own reach
    // (e_ts + 30min). Same heartbeat source; same sink-side filter.
    "st21_stream_full_join" -> Q(
      (s, d) => Streams.runToMemory(s,
        Streams.clicksWithRecentErrors(
          Streams.readEventsStreamWithHeartbeat(s, d), 30,
          joinType = "full_outer"),
        "st21_result", OutputMode.Append())
        .filter(col("user_id") =!= -1L),
      Some("""SELECT coalesce(c.user_id, e.user_id) AS user_id,
             |       c.event_id AS click_id, e.event_id AS error_id
             |FROM (SELECT * FROM events WHERE event_type = 'click') c
             |FULL JOIN (SELECT * FROM events WHERE event_type = 'error') e
             |  ON c.user_id = e.user_id
             | AND e.ts >= c.ts - INTERVAL 30 MINUTE AND e.ts <= c.ts""".stripMargin)),

    // The SAME sessionization on Spark 4's arbitrary-state API v2
    // (transformWithState: ValueState + explicit event-time timers on
    // the RocksDB state store). One oracle delta vs st02: TWS timers
    // fire INCLUSIVELY (timer <= watermark, TimerStateImpl) where
    // flatMapGroupsWithState fires strictly — so the emission predicate
    // is <= here and < in st02. No clamp arithmetic either:
    // registerTimer accepts past timestamps.
    "st22_stream_sessionize_tws" -> Q(
      (s, d) => {
        val key = "spark.sql.streaming.stateStore.providerClass"
        val saved = s.conf.getOption(key)
        s.conf.set(key,
          "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
        try {
          val sessions = Streams.runToMemory(s,
            Streams.sessionizeTws(Streams.readEventsStream(s, d), 30).toDF(),
            "st22_sessions", OutputMode.Append())
          sessions
            .groupBy(col("user_id"))
            .agg(count(lit(1)).as("n_sessions"), sum(col("n_events")).as("n_events"))
        } finally saved match {
          case Some(v) => s.conf.set(key, v)
          case None => s.conf.unset(key)
        }
      },
      Some("""WITH e AS (
             |  SELECT user_id, epoch_ns(ts) // 1000 AS us FROM events
             |),
             |marked AS (
             |  SELECT user_id, us,
             |         CASE WHEN lag(us) OVER w IS NULL
             |                OR us - lag(us) OVER w > 1800000000 THEN 1 ELSE 0 END AS new_s
             |  FROM e WINDOW w AS (PARTITION BY user_id ORDER BY us)
             |),
             |sess AS (
             |  SELECT user_id, us,
             |         sum(new_s) OVER (PARTITION BY user_id ORDER BY us ROWS UNBOUNDED PRECEDING) AS sid
             |  FROM marked
             |),
             |agg AS (
             |  SELECT user_id, sid, max(us) AS end_us, count(*) AS n_events
             |  FROM sess GROUP BY user_id, sid
             |),
             |mx AS (SELECT max(us) AS max_us FROM e),
             |ranked AS (
             |  SELECT user_id, sid, n_events, end_us,
             |         row_number() OVER (PARTITION BY user_id ORDER BY sid DESC) AS rk
             |  FROM agg
             |)
             |SELECT user_id, count(*) AS n_sessions, CAST(sum(n_events) AS BIGINT) AS n_events
             |FROM ranked, mx
             |WHERE rk > 1 OR (end_us // 1000) + 1800000 <= (max_us // 1000) - 1800000
             |GROUP BY user_id""".stripMargin)),

    // Streaming AS-OF enrichment: each event reaches BACK to the latest
    // rate posting at or before its event time (sparse 3-hourly dim) —
    // stream-static candidate join (stateless, broadcast) + event-keyed
    // argmax whose state the watermark frees. Append emits once the
    // watermark passes the event's own time, so the oracle replays both
    // the as-of pick and that emission arithmetic.
    // streaming → AVRO sink → avro read-back: the graft FileFormat
    // (sources/AvroFormat.scala) under the streaming batch-sink machinery
    // — every micro-batch appends avro container files through
    // foreachBatch → Sinks.write, and the batch read decodes them. The
    // oracle recomputes from the raw events, so any avro encode/decode
    // drift (values, timestamp logical type, partition restore) fails
    // the hash.
    "st27_stream_avro_sink" -> Q(
      (s, d) => {
        val base = scratch(s, d, "avrosink")
        Streams.runToSink(s,
          Streams.readEventsStream(s, d)
            .select(col("event_id"), col("user_id"), col("event_type"),
              col("ts"),
              floor(col("value") * 100 + 0.5).cast("long").as("value_cents")),
          graft.config.OutputTable(
            name = "st27_out",
            target = graft.config.TargetSpec.File(s"$base/out"),
            format = "avro",
            refresh = graft.config.Refresh.Incremental,
            partitionKeys = Seq("event_type")),
          s"$base/ckpt")
        s.read.format("avro").load(s"$base/out")
          .select("event_id", "user_id", "event_type", "ts", "value_cents")
      },
      Some("""SELECT event_id, user_id, event_type, ts,
             |       CAST(floor(value * 100 + 0.5) AS BIGINT) AS value_cents
             |FROM events""".stripMargin)),

    "st26_stream_asof" -> Q(
      (s, d) => Streams.runToMemory(s,
        Streams.asofEnrichStream(
          Streams.readEventsStream(s, d)
            .withColumn("user_band", pmod(col("user_id"), lit(4)).cast("int")),
          Streams.rateDim(s, d, bands = 4)),
        "st26_result", OutputMode.Append()),
      Some("""WITH e AS (
             |  SELECT event_id, ts, CAST(user_id % 4 AS INT) AS band FROM events
             |), mx AS (
             |  SELECT max(ts) AS mts, date_trunc('hour', min(ts)) AS lo,
             |         date_trunc('hour', max(ts)) AS hi
             |  FROM events
             |), dim AS (
             |  SELECT b.band, g.posted_ts,
             |         ('0x' || substr(md5(b.band || ':' || CAST(epoch(g.posted_ts) AS BIGINT)), 1, 8))::BIGINT % 1000000 AS rate_e6
             |  FROM (SELECT unnest(range(0, 4)) AS band) b
             |  CROSS JOIN (SELECT unnest(generate_series(lo - INTERVAL 3 HOUR, hi, INTERVAL 3 HOUR)) AS posted_ts FROM mx) g
             |), cand AS (
             |  SELECT e.event_id, e.ts, d.posted_ts, d.rate_e6
             |  FROM e JOIN dim d ON d.band = e.band
             |   AND d.posted_ts <= e.ts AND d.posted_ts > e.ts - INTERVAL 6 HOUR
             |), agg AS (
             |  SELECT event_id, ts, arg_max(rate_e6, posted_ts) AS rate_e6,
             |         max(posted_ts) AS rate_ts
             |  FROM cand GROUP BY event_id, ts
             |)
             |SELECT a.event_id, a.ts, CAST(a.rate_e6 AS BIGINT) AS rate_e6, a.rate_ts
             |FROM agg a, mx
             |WHERE epoch_ns(a.ts) // 1000000 < (epoch_ns(mx.mts) // 1000000) - 3600000""".stripMargin)),

    // Ingestion drift monitor: per-source L1 distance between the
    // arriving token-bucket histogram and the reference corpus' — the
    // at-ingest data-quality alarm. Cross-multiplied integer L1; the
    // only float op is the final micro-scaling (engine-replayable).
    "st25_stream_drift" -> Q(
      (s, d) => Streams.driftReport(
        Streams.runToMemory(s,
          Streams.driftHistogramStream(s, d, refSource = "src0", dims = 64),
          "st25_drift", OutputMode.Complete()),
        s, d, refSource = "src0", dims = 64),
      Some("""WITH tk AS (
             |  SELECT source, CAST(('0x' || substr(md5(token), 1, 8))::BIGINT % 64 AS INT) AS b
             |  FROM (SELECT source, unnest(list_filter(regexp_split_to_array(trim(text), '\s+'), x -> x <> '')) AS token
             |        FROM documents)
             |), ref AS (
             |  SELECT b, count(*) AS rc FROM tk WHERE source = 'src0' GROUP BY b
             |), refn AS (SELECT sum(rc) AS rn FROM ref
             |), obs AS (
             |  SELECT source, b, count(*) AS oc FROM tk WHERE source <> 'src0' GROUP BY source, b
             |), obsn AS (
             |  SELECT source, sum(oc) AS onn FROM obs GROUP BY source
             |), nd AS (
             |  SELECT source, count(*) AS n_docs FROM documents WHERE source <> 'src0' GROUP BY source
             |), grid AS (
             |  SELECT s.source, g.b, coalesce(o.oc, 0) AS oc, coalesce(r.rc, 0) AS rc
             |  FROM (SELECT DISTINCT source FROM documents WHERE source <> 'src0') s
             |  CROSS JOIN (SELECT unnest(range(0, 64)) AS b) g
             |  LEFT JOIN obs o ON o.source = s.source AND o.b = g.b
             |  LEFT JOIN ref r ON r.b = g.b
             |), l1 AS (
             |  SELECT grid.source, sum(abs(oc * refn.rn - rc * obsn.onn)) AS dist
             |  FROM grid, refn
             |  JOIN obsn ON obsn.source = grid.source
             |  GROUP BY grid.source
             |)
             |SELECT nd.source, nd.n_docs, CAST(obsn.onn AS BIGINT) AS n_tokens,
             |       CAST(floor(l1.dist * 1000000.0 / (obsn.onn * (SELECT rn FROM refn)) + 0.5) AS BIGINT) AS drift_e6
             |FROM nd JOIN obsn ON obsn.source = nd.source
             |JOIN l1 ON l1.source = nd.source""".stripMargin)),

    // Stream-stream LEFT SEMI interval join — the streaming EXISTS: a
    // click emits ONCE if any error hit its trailing window; negatives
    // are never emitted (dropped on watermark advance), so no heartbeat
    // tail flush is needed, unlike st19/st21's outer forms.
    "st24_stream_semi_join" -> Q(
      (s, d) => Streams.runToMemory(s,
        Streams.clicksSeenWithErrors(Streams.readEventsStream(s, d), 30),
        "st24_result", OutputMode.Append()),
      Some("""SELECT c.user_id, c.event_id AS click_id
             |FROM events c
             |WHERE c.event_type = 'click' AND EXISTS (
             |  SELECT 1 FROM events e
             |  WHERE e.event_type = 'error' AND e.user_id = c.user_id
             |    AND e.ts >= c.ts - INTERVAL 30 MINUTE AND e.ts <= c.ts)""".stripMargin)),

    // CHAINED stateful operators: dedup-within-watermark feeding the
    // append-mode windowed aggregation over the DOUBLED (at-least-once)
    // source — one query, two state stores, one watermark. The drained
    // result equals st09's single-copy truth: every duplicate is either
    // deduped in-state or dropped as late (already counted either way).
    "st23_stream_dedup_window" -> Q(
      (s, d) => Streams.runToMemory(s,
        Streams.dedupedWindowedCounts(Streams.readEventsStreamDoubled(s, d)),
        "st23_result", OutputMode.Append()),
      Some("""WITH mx AS (
             |  SELECT (epoch_ns(max(ts)) // 1000000) - 3600000 AS wm_ms FROM events
             |)
             |SELECT date_trunc('hour', ts) AS window_start,
             |       date_trunc('hour', ts) + INTERVAL 1 HOUR AS window_end,
             |       event_type, count(*) AS n_events,
             |       CAST(sum(floor(value * 100 + 0.5)) AS BIGINT) AS value_cents
             |FROM events, mx
             |WHERE (epoch_ns(date_trunc('hour', ts) + INTERVAL 1 HOUR) // 1000000) <= wm_ms
             |GROUP BY 1, 2, 3""".stripMargin)),

    "st02_stream_sessionize" -> Q(
      (s, d) => {
        val sessions = Streams.runToMemory(s,
          Streams.sessionize(Streams.readEventsStream(s, d), 30).toDF(),
          "st02_sessions", OutputMode.Append())
        sessions
          .groupBy(col("user_id"))
          .agg(count(lit(1)).as("n_sessions"), sum(col("n_events")).as("n_events"))
      },
      Some("""WITH e AS (
             |  SELECT user_id, epoch_ns(ts) // 1000 AS us FROM events
             |),
             |marked AS (
             |  SELECT user_id, us,
             |         CASE WHEN lag(us) OVER w IS NULL
             |                OR us - lag(us) OVER w > 1800000000 THEN 1 ELSE 0 END AS new_s
             |  FROM e WINDOW w AS (PARTITION BY user_id ORDER BY us)
             |),
             |sess AS (
             |  SELECT user_id, us,
             |         sum(new_s) OVER (PARTITION BY user_id ORDER BY us ROWS UNBOUNDED PRECEDING) AS sid
             |  FROM marked
             |),
             |agg AS (
             |  SELECT user_id, sid, max(us) AS end_us, count(*) AS n_events
             |  FROM sess GROUP BY user_id, sid
             |),
             |mx AS (SELECT max(us) AS max_us FROM e),
             |ranked AS (
             |  SELECT user_id, sid, n_events, end_us,
             |         row_number() OVER (PARTITION BY user_id ORDER BY sid DESC) AS rk
             |  FROM agg
             |)
             |SELECT user_id, count(*) AS n_sessions, CAST(sum(n_events) AS BIGINT) AS n_events
             |FROM ranked, mx
             |WHERE rk > 1 OR greatest((end_us // 1000) + 1800000, 1) < (max_us // 1000) - 1800000
             |GROUP BY user_id""".stripMargin)),

    // Heavy hitters AT INGEST: the streaming twin of ext98. The
    // Misra-Gries sketch runs as the STREAMING pass — a Complete-mode
    // global aggregate whose state is ≤ k counters plus one long no
    // matter how long the stream runs (contrast a groupBy(item) count,
    // whose state grows with the item domain) — and the exact-recount
    // certification runs BATCH-side over the drained single-row sketch,
    // the production shape: sketch online, certify offline. The PODS'12
    // superset guarantee survives the state-store merge sequence, so
    // the certified output is exact and shares ext98's oracle verbatim
    // (Tables.boilerBigrams is the one fixture definition).
    "st36_stream_heavy_hitters" -> Q(
      (s, d) => {
        graft.sql.GraftExtensions.ensureRegistered(s)
        val sketched = Tables.boilerBigrams(Streams.readDocumentsStream(s, d))
          .agg(expr("misra_gries(item, 96)").as("cands"),
               count(lit(1)).as("n_items"))
        val sk = Streams.runToMemory(s, sketched, "st36_hh", OutputMode.Complete())
        graft.operators.TextAnalysis.heavyHittersRecount(
          Tables.boilerBigrams(s.read.parquet(s"$d/documents.parquet")), sk, k = 96)
      },
      Some(OracleSql.HeavyHittersBigrams)),

    // EXACT percentiles with the sketch AT INGEST: q85's two-phase
    // selection, but the expensive pass — the GK bracket sketch over
    // every arriving value — runs as a Complete-mode STREAMING
    // aggregate (fixed-size state, the st29/st36 discipline), and only
    // the offline certification (one offset count + the ~6n/accuracy
    // bracket slivers) touches the batch store. Mergeable-summaries
    // guarantees the state-store-merged sketch brackets exactly like a
    // batch one, so the certified output is EXACT — the oracle picks
    // the same ranks off a plain row_number, knowing nothing of either
    // sketch.
    "st37_stream_percentiles" -> Q(
      (s, d) => {
        import graft.operators.GlobalSort
        val qs = Seq(0.5, 0.9, 0.99)
        val acc = 10000
        val aggCols = GlobalSort.sketchAgg(qs, acc)
        val sketched = Streams.readEventsStream(s, d)
          .select(col("value").cast("double").as("v"))
          .filter(col("v").isNotNull)
          .agg(aggCols.head, aggCols.tail: _*)
        val sk = Streams.runToMemory(s, sketched, "st37_pct", OutputMode.Complete())
        val row = sk.head()
        val v = Tables.events(s, d)
          .select(col("value").cast("double").as("v"))
          .filter(col("v").isNotNull)
        GlobalSort.selectPercentiles(v, qs, acc,
          row.getLong(0), row.getSeq[Double](1))
      },
      Some("""WITH v AS (
             |  SELECT value AS v FROM events WHERE value IS NOT NULL
             |), n AS (SELECT count(*) AS n FROM v
             |), r AS (
             |  SELECT CAST(q AS DOUBLE) AS q,
             |         CAST(floor(CAST(q AS DOUBLE) * (n - 1)) AS BIGINT) + 1 AS rank
             |  FROM n, (VALUES (0.5), (0.9), (0.99)) t(q)
             |), s AS (
             |  SELECT v, row_number() OVER (ORDER BY v) AS rn FROM v
             |)
             |SELECT r.q, s.v AS value, r.rank
             |FROM r JOIN s ON s.rn = r.rank""".stripMargin)),

    // Count-Min AT INGEST: ext103's sketch build — already a plain
    // groupBy(r, bucket).count — runs as a Complete-mode STREAMING
    // aggregate over the arriving bigram stream, state bounded at
    // d·w = 8192 rows forever (CMS merges ARE cell-wise sums, so the
    // state-store merge is the sketch merge); the drained sketch then
    // answers the same probe estimates offline and the exact
    // certification replays on the batch store (the st36/st37 "sketch
    // online, certify offline" discipline). Same oracle as ext103
    // verbatim: a streamed CMS must equal the batch one cell for cell.
    "st38_stream_countmin" -> Q(
      (s, d) => {
        val stream = Tables.boilerBigrams(Streams.readDocumentsStream(s, d))
        val sketched = graft.operators.CountMin
          .bucketRows(stream, col("item"), d = 4, w = 2048)
          .groupBy(col("r"), col("bucket"))
          .agg(count(lit(1)).as("cnt"))
        val sk = Streams.runToMemory(s, sketched, "st38_cm", OutputMode.Complete())
        val batchDocs = s.read.parquet(s"$d/documents.parquet")
        graft.operators.CountMin.certifyWith(sk,
          Tables.boilerBigrams(batchDocs), col("item"),
          Tables.countMinProbes(batchDocs), col("item"), d = 4, w = 2048)
      },
      Some(OracleSql.CountMinBigrams)),

    // Markov transitions AT INGEST: q90's per-user lead() as streaming
    // state — one LastEvent struct per user, each arriving event emits
    // its (from, to) pair and replaces the state; the drained pairs
    // then aggregate to the same transition matrix. The sharded replay
    // delivers each user's events in (ts, event_id) order across
    // micro-batches (the operator's documented ordering contract), so
    // the streamed pairs equal the batch window's pairs EXACTLY —
    // oracle is q90's SQL verbatim.
    "st39_stream_transitions" -> Q(
      (s, d) => {
        val pairs = Streams.runToMemory(s,
          Streams.transitionsStream(
            Streams.readEventsStreamSharded(s, d)).toDF(),
          "st39_transitions", OutputMode.Append())
        val counts = pairs.groupBy(col("from_type"), col("to_type"))
          .agg(count(lit(1)).as("n"))
        counts
          .withColumn("from_total",
            sum(col("n")).over(org.apache.spark.sql.expressions.Window
              .partitionBy(col("from_type"))))
          .select(col("from_type"), col("to_type"), col("n"),
            col("from_total"),
            expr("CAST((1000 * n) DIV from_total AS BIGINT)").as("p_milli"))
      },
      Some("""WITH p AS (
             |  SELECT event_type AS from_type,
             |         lead(event_type) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS to_type
             |  FROM events WHERE user_id IS NOT NULL AND ts IS NOT NULL
             |), c AS (
             |  SELECT from_type, to_type, count(*) AS n FROM p
             |  WHERE to_type IS NOT NULL GROUP BY 1, 2
             |)
             |SELECT from_type, to_type, CAST(n AS BIGINT) AS n,
             |       CAST(sum(n) OVER (PARTITION BY from_type) AS BIGINT) AS from_total,
             |       CAST((1000 * n) // sum(n) OVER (PARTITION BY from_type) AS BIGINT) AS p_milli
             |FROM c""".stripMargin)),

    // Cohort retention AT INGEST: q88's first-touch cohort assignment
    // as one ValueState long per user — each arriving event emits its
    // (cohort_day, day_offset, user_id) hit, and the retention matrix
    // aggregates the drained hits offline (countDistinct is not a
    // streaming aggregate; the hits ARE streaming-exact under the
    // sharded replay's ordering contract). Oracle = q88's SQL verbatim.
    "st40_stream_retention" -> Q(
      (s, d) => {
        val hits = Streams.runToMemory(s,
          Streams.retentionStream(
            Streams.readEventsStreamSharded(s, d)).toDF(),
          "st40_retention", OutputMode.Append())
        // both aggregates derive from the SAME memory-sink plan — rename
        // the join key on one side so the self-join attributes can't clash
        val sizes = hits.filter(col("day_offset") === 0)
          .groupBy(col("cohort_day").as("cd"))
          .agg(countDistinct(col("user_id")).as("cohort_size"))
        hits.groupBy(col("cohort_day"), col("day_offset"))
          .agg(countDistinct(col("user_id")).as("n_active"))
          .join(sizes, col("cohort_day") === col("cd"))
          .select(col("cohort_day"), col("day_offset"), col("n_active"),
            col("cohort_size"),
            expr("CAST((1000 * n_active) DIV cohort_size AS BIGINT)")
              .as("retention_milli"))
      },
      Some("""WITH ev AS (
             |  SELECT user_id, (epoch_ns(ts) // 1000) // 86400000000 AS day
             |  FROM events WHERE user_id IS NOT NULL AND ts IS NOT NULL
             |), first AS (
             |  SELECT user_id, min(day) AS cohort_day FROM ev GROUP BY 1
             |), cs AS (
             |  SELECT cohort_day, count(DISTINCT user_id) AS cohort_size
             |  FROM first GROUP BY 1
             |), act AS (
             |  SELECT f.cohort_day, ev.day - f.cohort_day AS day_offset,
             |         count(DISTINCT ev.user_id) AS n_active
             |  FROM ev JOIN first f USING (user_id) GROUP BY 1, 2
             |)
             |SELECT a.cohort_day, a.day_offset,
             |       CAST(a.n_active AS BIGINT) AS n_active,
             |       CAST(cs.cohort_size AS BIGINT) AS cohort_size,
             |       CAST((1000 * a.n_active) // cs.cohort_size AS BIGINT) AS retention_milli
             |FROM act a JOIN cs USING (cohort_day)""".stripMargin)),

    // Streaming first-touch funnel: q89's per-user conditional mins as
    // one Update-mode aggregation (min is commutative+idempotent — NO
    // ordering contract, any batching converges); the drained changelog
    // collapses by re-minning per user, then the q89 stage/rollup math
    // runs in batch. Oracle: q89's, verbatim — the stream must land on
    // the batch truth exactly.
    "st43_stream_funnel" -> Q(
      (s, d) => {
        val mins = Streams.runToMemory(s,
          Streams.funnelStageMins(Streams.readEventsStream(s, d)),
          "st43_funnel", OutputMode.Update())
        val m = mins.groupBy(col("user_id"))
          .agg(min(col("t1")).as("t1"), min(col("t2")).as("t2"),
            min(col("t3")).as("t3"), min(col("t4")).as("t4"))
        val reached = m.select(
          when(col("t1").isNull, 0L)
            .when(col("t2").isNull || col("t2") <= col("t1"), 1L)
            .when(col("t3").isNull || col("t3") <= col("t2"), 2L)
            .when(col("t4").isNull || col("t4") <= col("t3"), 3L)
            .otherwise(4L).as("reached"))
        reached.agg(
          count(lit(1)).as("n_users"),
          sum(when(col("reached") >= 1, 1L).otherwise(0L)).as("n_signup"),
          sum(when(col("reached") >= 2, 1L).otherwise(0L)).as("n_view"),
          sum(when(col("reached") >= 3, 1L).otherwise(0L)).as("n_click"),
          sum(when(col("reached") >= 4, 1L).otherwise(0L)).as("n_purchase"))
          .select(col("n_users"), col("n_signup"), col("n_view"),
            col("n_click"), col("n_purchase"),
            expr("CAST(CASE WHEN n_signup = 0 THEN NULL ELSE (1000 * n_purchase) DIV n_signup END AS BIGINT)")
              .as("conv_milli"))
      },
      Some("""WITH m AS (
             |  SELECT user_id,
             |         min(CASE WHEN event_type = 'signup' THEN epoch_ns(ts) // 1000 END) AS t1,
             |         min(CASE WHEN event_type = 'view' THEN epoch_ns(ts) // 1000 END) AS t2,
             |         min(CASE WHEN event_type = 'click' THEN epoch_ns(ts) // 1000 END) AS t3,
             |         min(CASE WHEN event_type = 'purchase' THEN epoch_ns(ts) // 1000 END) AS t4
             |  FROM events WHERE user_id IS NOT NULL AND ts IS NOT NULL
             |  GROUP BY user_id
             |), r AS (
             |  SELECT CASE WHEN t1 IS NULL THEN 0
             |              WHEN t2 IS NULL OR t2 <= t1 THEN 1
             |              WHEN t3 IS NULL OR t3 <= t2 THEN 2
             |              WHEN t4 IS NULL OR t4 <= t3 THEN 3
             |              ELSE 4 END AS reached
             |  FROM m
             |)
             |SELECT CAST(count(*) AS BIGINT) AS n_users,
             |       CAST(sum(CASE WHEN reached >= 1 THEN 1 ELSE 0 END) AS BIGINT) AS n_signup,
             |       CAST(sum(CASE WHEN reached >= 2 THEN 1 ELSE 0 END) AS BIGINT) AS n_view,
             |       CAST(sum(CASE WHEN reached >= 3 THEN 1 ELSE 0 END) AS BIGINT) AS n_click,
             |       CAST(sum(CASE WHEN reached >= 4 THEN 1 ELSE 0 END) AS BIGINT) AS n_purchase,
             |       CAST(CASE WHEN sum(CASE WHEN reached >= 1 THEN 1 ELSE 0 END) = 0 THEN NULL
             |            ELSE (1000 * sum(CASE WHEN reached >= 4 THEN 1 ELSE 0 END))
             |                 // sum(CASE WHEN reached >= 1 THEN 1 ELSE 0 END) END AS BIGINT) AS conv_milli
             |FROM r""".stripMargin)),

    // Streaming drift attribution: per-(slice, token) counts as one
    // Update-mode aggregation (counts only grow — MAX collapses the
    // changelog under any batching, the st43 order-free discipline),
    // then ext122's probability/ranking math runs in batch over the
    // collapsed counts via the SHARED driftAttributionFromCounts.
    // Oracle: ext122's, verbatim.
    "st44_stream_drift_attribution" -> Q(
      (s, d) => {
        val drained = Streams.runToMemory(s,
          Streams.tokenCountsStream(
            Streams.readDocumentsStream(s, d), "lang", "text", "en", "de"),
          "st44_drift", OutputMode.Update())
        // re-alias: driftAttributionFromCounts self-joins its input
        // (counts vs per-slice totals), and the memory-sink view's
        // attributes don't dedup across the two references (the st40
        // rename discipline) — toDF mints fresh expression ids
        TextAnalysis.driftAttributionFromCounts(
          drained.groupBy(col("slice"), col("token"))
            .agg(max(col("c")).as("c"))
            .toDF("slice", "token", "c"),
          "en", "de", k = 40)
      },
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

    // Streaming dup rate: per-(slice, hash) copy counts + min doc id on
    // the stream (count collapses by MAX, keeper id by MIN — BOTH
    // order-free), then ext128's family/attribution math in batch.
    // Oracle: ext128's, verbatim.
    "st48_stream_dup_rate" -> Q(
      (s, d) => {
        val drained = Streams.runToMemory(s,
          Streams.dupCountsStream(
            Streams.readDocumentsStream(s, d), "doc_id", "text", "source"),
          "st48_dup", OutputMode.Update())
        val c = drained.groupBy(col("slice"), col("h"))
          .agg(max(col("c")).as("c"), min(col("min_id")).as("min_id"))
          .toDF("slice", "h", "c", "min_id") // fresh ids: memory-sink self-join
        val fam = c.groupBy(col("h"))
          .agg(sum(col("c")).as("n_copies"), min(col("min_id")).as("keeper_id"))
        c.join(fam, "h")
          .groupBy(col("slice"))
          .agg(sum(col("c")).as("n_docs"),
            sum(when(col("n_copies") > 1, col("c")).otherwise(0L))
              .as("n_in_dup_family"),
            sum(col("c") - when(col("min_id") === col("keeper_id"), 1L)
              .otherwise(0L)).as("n_redundant"))
          .select(col("slice"), col("n_docs"), col("n_in_dup_family"),
            col("n_redundant"),
            expr("CAST((1000 * n_in_dup_family) DIV n_docs AS BIGINT)")
              .as("dup_milli"),
            expr("CAST((1000 * n_redundant) DIV n_docs AS BIGINT)")
              .as("redundant_milli"))
      },
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

    // BPE segmentation AT INGEST: the 8 merges train BATCH-side on the
    // same fixture (deterministic), then ride the streaming plan as
    // chained codegen'd replaces inside row-local lambdas — stateless
    // Append, zero state (the st18 model-rides-the-plan shape with the
    // merge list as the model). Oracle: ext131's train->apply replay.
    "st49_stream_bpe_segment" -> Q(
      (s, d) => {
        val merges = TextAnalysis.bpeTrain(
            s.read.parquet(s"$d/documents.parquet"), "doc_id", "text", iters = 8)
          .collect().sortBy(_.getInt(0))
          .map(r => (r.getString(1), r.getString(2))).toSeq
        Streams.runToMemory(s,
          TextAnalysis.bpeSegmentApply(
            Streams.readDocumentsStream(s, d), "doc_id", "text", merges),
          "st49_bpe", OutputMode.Append())
      },
      Some(Extensions.bpeSegmentOracle(8))),

    // Domain affinity AT INGEST: per-(doc, bucket) token counts as one
    // Update-mode aggregation (MAX-collapse changelog, the st43/st44
    // order-free discipline; bucketing is the batch scorer's OWN
    // tokenBuckets), then ext134's intersection math runs in batch over
    // the collapsed counts via the SHARED domainAffinityFromCounts —
    // the target histogram is a static batch frame. Oracle: ext134's
    // shared CTE, verbatim.
    "st50_stream_affinity" -> Q(
      (s, d) => {
        val drained = Streams.runToMemory(s,
          Streams.docBucketCountsStream(
            Streams.readDocumentsStream(s, d)
              .filter(col("doc_id") % 10 =!= 0), "doc_id", "text", "da"),
          "st50_aff", OutputMode.Update())
        TextAnalysis.domainAffinityFromCounts(
          drained.groupBy(col("doc_id"), col("__b"))
            .agg(max(col("cd")).as("cd"))
            .toDF("doc_id", "__b", "cd"),
          TextAnalysis.targetHistogram(
            s.read.parquet(s"$d/documents.parquet")
              .filter(col("doc_id") % 10 === 0), "text", "da"))
      },
      Some(s"""WITH ${Extensions.DomainAffinityCte}
             |SELECT doc_id, n_tokens, overlap_num, affinity_milli
             |FROM aff""".stripMargin)),

    // Streaming k-anonymity monitor — ext141's governance audit AT
    // INGEST: per QI class (event type × user cohort), running size and
    // distinct-sensitive-bucket count as a Complete-mode aggregate.
    // State is bounded by the QI domain product × the bucket-set size
    // (the quantity the audit measures) — the st29/st36 fixed-state
    // discipline; countDistinct is not a streaming aggregate, so the
    // exact replacement is size(collect_set) (the round-8 rule).
    "st51_stream_k_anonymity" -> Q(
      (s, d) => {
        val classes = Streams.readEventsStream(s, d)
          .select(col("event_type"), expr("user_id % 64").as("cohort"),
            expr("CAST(floor(value / 50) AS BIGINT)").as("vbucket"))
          .groupBy(col("event_type"), col("cohort"))
          .agg(count(lit(1)).as("class_size"),
            size(collect_set(col("vbucket"))).cast("long").as("l_distinct"))
        Streams.runToMemory(s, classes, "st51_kanon", OutputMode.Complete())
          .withColumn("meets_k", col("class_size") >= 25)
          .withColumn("meets_l", col("l_distinct") >= 8)
      },
      Some("""SELECT event_type, user_id % 64 AS cohort, count(*) AS class_size,
             |  count(DISTINCT CAST(floor(value / 50) AS BIGINT)) AS l_distinct,
             |  count(*) >= 25 AS meets_k,
             |  count(DISTINCT CAST(floor(value / 50) AS BIGINT)) >= 8 AS meets_l
             |FROM events GROUP BY event_type, user_id % 64""".stripMargin)),

    // Streaming session PATHS: q92's capped '>'-joined paths emitted by
    // Streaming NB classification at ingest — ext149's batch-trained
    // model scored over the arriving held-out split: per-row token
    // counts are computed ROW-LOCALLY (one struct per distinct token —
    // a doc is one stream row, so no (doc, token) pre-aggregation and
    // therefore only ONE stateful operator), the vocab-sized model
    // joins stream-STATIC (stateless), and the per-doc score sums are
    // the single Update-mode aggregate (state = k longs per doc seen —
    // corpus-doc-bounded like st08's seen-set; TTL/Bloom-front it in
    // production). Argmax/margin run in batch over the collapsed
    // changelog through the SHARED nbVerdictFromScores, so streamed ==
    // batch by construction. Oracle = ext149's verdict CTEs verbatim.
    "st52_stream_nb" -> Q(
      (s, d) => {
        val all = s.read.parquet(s"$d/documents.parquet")
        val (model, meta) = TextAnalysis.nbTrain(
          all.filter(col("doc_id") % 5 =!= 0), "text", "source")
        val classes = TextAnalysis.nbClasses(meta)
        val pivoted = TextAnalysis.nbPivotModel(model, classes)
        val stream = Streams.readDocumentsStream(s, d)
          .filter(col("doc_id") % 5 === 0)
        val w = split(trim(col("text")), "\\s+")
        val docTok = stream.select(col("doc_id"),
            col("source").as("label_actual"),
            explode(transform(array_distinct(w), t => struct(t.as("token"),
              size(filter(w, x => x === t)).cast("long").as("cnt")))).as("tc"))
          .select(col("doc_id"), col("label_actual"),
            col("tc.token").as("token"), col("tc.cnt").as("cnt"))
        val drained = Streams.runToMemory(s,
          TextAnalysis.nbScoreSums(docTok, pivoted, classes),
          "st52_nb", OutputMode.Update())
        // one update row per doc (a doc is one input row); max-collapse
        // is the st50 order-free changelog discipline
        val collapsed = drained.groupBy(col("doc_id"), col("label_actual"))
          .agg(max(col(s"score_${classes.head._1}")).as(s"score_${classes.head._1}"),
            classes.tail.map { case (l, _, _) =>
              max(col(s"score_$l")).as(s"score_$l") }: _*)
        TextAnalysis.nbVerdictFromScores(collapsed, classes)
      },
      Some(Extensions.NbVerdictCtes + """
             |SELECT doc_id, label_actual, pred_label, is_match, margin_milli
             |FROM verdict""".stripMargin)),

    // Streaming unigram-LM scoring at ingest — the perplexity-style
    // filter live: the batch-trained per-word-type Viterbi stats
    // (SHARED unigramWordStats — the DP/tie/UNK semantics cannot fork)
    // join the arriving docs' exploded words stream-STATIC (stateless),
    // and the per-doc (n_words, n_subwords, ll) sums are the single
    // Update-mode aggregate (st52's corpus-doc-bounded-state
    // discipline). The fragmentation ratio computes in batch over the
    // collapsed changelog. Oracle = ext152's train+apply CTEs verbatim.
    "st53_stream_unigram" -> Q(
      (s, d) => {
        val all = s.read.parquet(s"$d/documents.parquet")
        val wstats = TextAnalysis.unigramWordStats(all, "text",
          vocabSize = 64, iters = 1)
        val occurrences = Streams.readDocumentsStream(s, d)
          .select(col("doc_id"),
            explode(split(trim(col("text")), "\\s+")).as("w0"))
          .select(col("doc_id"), lower(col("w0")).as("w"))
        val sums = occurrences.join(wstats, Seq("w"))
          .groupBy(col("doc_id"))
          .agg(count(lit(1)).as("n_words"),
            sum(col("c")).as("n_subwords"),
            sum(col("b")).as("ll_milli"))
        Streams.runToMemory(s, sums, "st53_unigram", OutputMode.Update())
          .groupBy(col("doc_id"))
          .agg(max(col("n_words")).as("n_words"),
            max(col("n_subwords")).as("n_subwords"),
            max(col("ll_milli")).as("ll_milli"))
          .withColumn("subwords_per_word_milli",
            expr("CAST((1000 * n_subwords) DIV n_words AS BIGINT)"))
      },
      Some(Extensions.UnigramSegmentOracle)),

    // the gap/timeout sessionizer (path state bounded at 8 types per
    // user); top-20 over CLOSED sessions, with st02's watermark
    // condition deciding which trailing sessions provably timed out.
    "st47_stream_session_paths" -> Q(
      (s, d) => {
        val sessions = Streams.runToMemory(s,
          Streams.pathSessionize(
            Streams.readEventsStreamSharded(s, d), 30).toDF(),
          "st47_paths", OutputMode.Append())
        sessions.groupBy(col("path")).agg(count(lit(1)).as("n_sessions"))
          .withColumn("rnk", row_number().over(
            org.apache.spark.sql.expressions.Window
              .orderBy(col("n_sessions").desc, col("path"))))
          .filter(col("rnk") <= 20)
          .select(col("rnk").cast("long").as("rnk"), col("path"),
            col("n_sessions"))
      },
      Some("""WITH ev AS (
             |  SELECT user_id, event_id, event_type, epoch_ns(ts) // 1000 AS us
             |  FROM events WHERE user_id IS NOT NULL AND ts IS NOT NULL
             |), f AS (
             |  SELECT *, CASE WHEN lag(us) OVER w IS NULL
             |                 OR us - lag(us) OVER w > 1800000000 THEN 1 ELSE 0 END AS new_s
             |  FROM ev WINDOW w AS (PARTITION BY user_id ORDER BY us, event_id)
             |), s AS (
             |  SELECT *, sum(new_s) OVER (PARTITION BY user_id ORDER BY us, event_id
             |              ROWS UNBOUNDED PRECEDING) AS sess
             |  FROM f
             |), agg AS (
             |  SELECT user_id, sess, max(us) AS end_us,
             |         array_to_string((list(event_type ORDER BY us, event_id))[1:8], '>') AS path
             |  FROM s GROUP BY 1, 2
             |), mx AS (SELECT max(us) AS max_us FROM ev
             |), ranked AS (
             |  SELECT user_id, sess, path, end_us,
             |         row_number() OVER (PARTITION BY user_id ORDER BY sess DESC) AS rk
             |  FROM agg
             |), closed AS (
             |  SELECT path FROM ranked, mx
             |  WHERE rk > 1 OR greatest((end_us // 1000) + 1800000, 1) < (max_us // 1000) - 1800000
             |), c AS (SELECT path, count(*) AS n_sessions FROM closed GROUP BY 1)
             |SELECT CAST(rnk AS BIGINT) AS rnk, path, CAST(n_sessions AS BIGINT) AS n_sessions
             |FROM (SELECT path, n_sessions,
             |             row_number() OVER (ORDER BY n_sessions DESC, path) AS rnk
             |      FROM c)
             |WHERE rnk <= 20""".stripMargin)),

    // Streaming last-touch attribution: per-user ValueState carries the
    // latest non-purchase touch (the transitionsStream ordering
    // contract); drained per-purchase channels aggregate to q94's
    // report. Oracle: q94's, verbatim.
    "st46_stream_attribution" -> Q(
      (s, d) => {
        val hits = Streams.runToMemory(s,
          Streams.attributionStream(
            Streams.readEventsStreamSharded(s, d)).toDF(),
          "st46_attr", OutputMode.Append())
        hits.groupBy(col("channel")).agg(count(lit(1)).as("n_purchases"))
          .select(col("channel"), col("n_purchases"),
            expr("CAST((1000 * n_purchases) DIV sum(n_purchases) OVER () AS BIGINT)")
              .as("share_milli"))
      },
      Some("""WITH ev AS (
             |  SELECT user_id, event_id, event_type, epoch_ns(ts) // 1000 AS us
             |  FROM events WHERE user_id IS NOT NULL AND ts IS NOT NULL
             |), p AS (
             |  SELECT user_id, us, event_type,
             |         last_value(CASE WHEN event_type <> 'purchase' THEN us END IGNORE NULLS)
             |           OVER (PARTITION BY user_id ORDER BY us, event_id
             |                 ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS pus,
             |         last_value(CASE WHEN event_type <> 'purchase' THEN event_type END IGNORE NULLS)
             |           OVER (PARTITION BY user_id ORDER BY us, event_id
             |                 ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS ptype
             |  FROM ev
             |), a AS (
             |  SELECT CASE WHEN pus IS NOT NULL AND pus >= us - 604800000000
             |              THEN ptype ELSE 'direct' END AS channel
             |  FROM p WHERE event_type = 'purchase'
             |), c AS (SELECT channel, count(*) AS n_purchases FROM a GROUP BY 1)
             |SELECT channel, CAST(n_purchases AS BIGINT) AS n_purchases,
             |       CAST((1000 * n_purchases) // sum(n_purchases) OVER () AS BIGINT) AS share_milli
             |FROM c""".stripMargin)),

    // Streaming vocabulary census: whole-corpus per-(source, token)
    // counts on the stream (Update mode, MAX-collapse — the st43/st44
    // order-free changelog discipline), then ext125's census math via
    // the shared vocabCensusFromCounts. Oracle: ext125's, verbatim.
    "st45_stream_vocab_census" -> Q(
      (s, d) => {
        val drained = Streams.runToMemory(s,
          Streams.tokenCountsStreamAll(
            Streams.readDocumentsStream(s, d), "source", "text"),
          "st45_census", OutputMode.Update())
        TextAnalysis.vocabCensusFromCounts(
          drained.groupBy(col("slice"), col("token"))
            .agg(max(col("c")).as("c"))
            .toDF("slice", "token", "c")) // fresh ids: memory-sink reuse
      },
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
             |FROM c GROUP BY slice""".stripMargin))
  )
}
