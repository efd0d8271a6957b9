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

  /** Shared COMPLETE oracle for the heavy-hitters twins (ext98 batch,
    * st36 streaming): the exact GROUP BY ... HAVING truth the two-pass
    * sketch+recount operator must equal — every bigram of the
    * boilerplate-rewritten corpus with count · (k+1) > n, k = 96. */
  val HeavyHittersBigrams: String =
    raw"""WITH rw AS (
         |  SELECT CASE WHEN doc_id % 2 = 0
         |              THEN 'granite lighthouses hum beneath amber fog while copper gulls spiral over quiet breakwaters'
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
}
