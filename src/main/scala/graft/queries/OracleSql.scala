package graft.queries

/** Shared DuckDB oracle SQL fragments (r8 review: the inverted-index
  * rewrite landed the same CTE block verbatim in every pair-truth
  * oracle — one definition keeps a future change to the pattern from
  * having to find a dozen copies).
  *
  * [[InvIndex]] is the EXACT inverted-index tail interpolated into a
  * pipe-margined oracle immediately after its `sh` CTE's closing
  * SELECT; the enclosing `.stripMargin` handles the pipes. The
  * exactness argument, once: any pair with a positive shingle
  * similarity shares at least one shingle, so a shingle-keyed
  * equi-join enumerates every qualifying pair with its exact
  * intersection count — the same rows as an all-pairs join at inverted
  * index cost, not n² (zero-intersection pairs are absent but can
  * never pass a positive threshold). */
private[queries] object OracleSql {
  val InvIndex: String =
    "             |), sz AS MATERIALIZED (\n" +
    "             |  SELECT doc_id, len(s) AS n FROM sh\n" +
    "             |), inv AS MATERIALIZED (\n" +
    "             |  SELECT doc_id, unnest(s) AS g FROM sh"

  /** The exact near-dup COMPONENT derivation shared by the cluster
    * queries (ext27 / ext31 / ext100): inverted-index exact pairs at
    * 3-gram Jaccard ≥ 0.8 → undirected edges → recursive reachability →
    * min-id component labels (`comp(doc_id, cluster_id)`; singletons
    * absent — callers coalesce). Interpolated immediately after
    * [[InvIndex]]; the enclosing WITH must be RECURSIVE. */
  val Components: String =
    raw"""             |), pairs AS (
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
             |), edges AS MATERIALIZED (
             |  SELECT doc_a AS s, doc_b AS d FROM pairs
             |  UNION SELECT doc_b, doc_a FROM pairs
             |), reach(src, dst) AS (
             |  SELECT s, d FROM edges
             |  UNION
             |  SELECT r.src, e.d FROM reach r JOIN edges e ON r.dst = e.s
             |), comp AS (
             |  SELECT src AS doc_id, least(src, min(dst)) AS cluster_id
             |  FROM reach GROUP BY src"""

  /** Shared COMPLETE oracle for the heavy-hitters twins (ext98 batch,
    * st36 streaming): the exact GROUP BY ... HAVING truth the two-pass
    * sketch+recount operator must equal — every bigram of the
    * boilerplate-rewritten corpus with count · (k+1) > n, k = 96. */
  val HeavyHittersBigrams: String =
    raw"""WITH rw AS (
         |  SELECT CASE WHEN doc_id % 2 = 0
         |              THEN '${Tables.BoilerSentence}'
         |              ELSE text END AS text
         |  FROM documents
         |), t AS (
         |  SELECT list_filter(regexp_split_to_array(text, '\s+'), x -> x <> '') AS w FROM rw
         |), bi AS (
         |  SELECT unnest(list_transform(range(1, len(w)), i -> w[i] || ' ' || w[i+1])) AS item
         |  FROM t WHERE len(w) >= 2
         |), tot AS (SELECT count(*) AS n_items FROM bi)
         |SELECT item, CAST(count(*) AS BIGINT) AS cnt, tot.n_items
         |FROM bi, tot
         |GROUP BY item, tot.n_items
         |HAVING count(*) * 97 > tot.n_items""".stripMargin

  /** Shared COMPLETE oracle for the Count-Min twins (ext103 batch, st38
    * streaming): replays the d=4, w=2048 md5-bucket sketch, the min-
    * over-rows estimate for every probe, and the exact certification
    * counts — the estimates are deterministic VALUES in both engines. */
  val CountMinBigrams: String =
    raw"""WITH rw AS (
         |  SELECT doc_id, CASE WHEN doc_id % 2 = 0
         |              THEN '${Tables.BoilerSentence}'
         |              ELSE text END AS text
         |  FROM documents
         |), t AS (
         |  SELECT doc_id, list_filter(regexp_split_to_array(text, '\s+'), x -> x <> '') AS w FROM rw
         |), bi AS (
         |  SELECT doc_id, unnest(list_transform(range(1, len(w)), i -> w[i] || ' ' || w[i+1])) AS item
         |  FROM t WHERE len(w) >= 2
         |), pr AS (
         |  SELECT DISTINCT item FROM (
         |    SELECT item FROM bi WHERE doc_id % 97 = 3
         |    UNION ALL
         |    SELECT * FROM (VALUES ('absent probe alpha'), ('absent probe beta'), ('absent probe gamma')) v(item))
         |), rows_ AS (SELECT unnest(range(4)) AS r
         |), sk AS (
         |  SELECT r, ('0x' || substr(md5('cm' || r || ':' || item), 1, 8))::BIGINT % 2048 AS bucket,
         |         count(*) AS cnt
         |  FROM bi, rows_ GROUP BY 1, 2
         |), cells AS (
         |  SELECT item, r, ('0x' || substr(md5('cm' || r || ':' || item), 1, 8))::BIGINT % 2048 AS bucket
         |  FROM pr, rows_
         |), est AS (
         |  SELECT c.item, min(coalesce(sk.cnt, 0)) AS e
         |  FROM cells c LEFT JOIN sk USING (r, bucket) GROUP BY c.item
         |), exact AS (
         |  SELECT item, count(*) AS cnt FROM bi
         |  WHERE item IN (SELECT item FROM pr) GROUP BY item
         |)
         |SELECT est.item, CAST(est.e AS BIGINT) AS est,
         |       CAST(coalesce(exact.cnt, 0) AS BIGINT) AS cnt,
         |       CAST(est.e - coalesce(exact.cnt, 0) AS BIGINT) AS overcount
         |FROM est LEFT JOIN exact USING (item)""".stripMargin
}
