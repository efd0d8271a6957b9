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
}
