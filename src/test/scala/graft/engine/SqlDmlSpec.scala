package graft.engine

import graft.SparkSpec
import graft.config.{ConfigError, ConfigParser}

/** The SQL DML router's contract: supported shapes route to the
  * versioned table ops (pinned by fw_merge_sql / fw_dml_sql oracles);
  * everything else errors BY NAME — a DML statement must never be
  * silently approximated. */
class SqlDmlSpec extends SparkSpec {
  import spark.implicits._

  private def tmp(name: String) =
    java.nio.file.Files.createTempDirectory("dml-spec").toString + s"/$name"

  private def table(): String = {
    val loc = tmp("t")
    graft.sinks.VersionedTable.commit(spark, loc,
      Seq((1, 10L, "a"), (2, 20L, "b"), (3, 30L, "a")).toDF("k", "cents", "seg"),
      "overwrite")
    loc
  }

  private def job(loc: String, sql: String, versioned: Boolean = true,
                  withOutput: Boolean = false) = {
    val out = if (withOutput)
      s"""output_table:
         |  name: o
         |  target: s3
         |  location: $loc-out
         |""".stripMargin else ""
    ConfigParser.parse(
      s"""job: {name: j, type: spark-sql}
         |input_tables:
         |  - name: t
         |    source: s3
         |    location: $loc
         |${if (versioned) "    versioned: \"true\"" else ""}
         |$out
         |sql: >
         |  ${sql.replace("\n", " ")}
         |""".stripMargin)
  }

  private def runSql(loc: String, sql: String): org.apache.spark.sql.DataFrame =
    Engine.runSparkSqlJob(spark, job(loc, sql), "default")

  test("DELETE/UPDATE/MERGE route to versioned ops and return the new snapshot") {
    val loc = table()
    val afterDelete = runSql(loc, "DELETE FROM t WHERE seg = 'b'")
    assert(afterDelete.count() == 2)
    val afterUpdate = runSql(loc, "UPDATE t SET cents = cents * 2 WHERE k = 1")
    assert(afterUpdate.filter($"k" === 1).head().getAs[Long]("cents") == 20L)
    // MERGE: replace k=3, insert k=9
    spark.createDataFrame(Seq((3, 99L, "z"), (9, 90L, "z")))
      .toDF("k", "cents", "seg").createOrReplaceTempView("arrivals")
    val afterMerge = runSql(loc,
      """MERGE INTO t USING (SELECT * FROM arrivals) s ON t.k = s.k
        |WHEN MATCHED THEN UPDATE SET * WHEN NOT MATCHED THEN INSERT *""".stripMargin)
    assert(afterMerge.collect().map(r => (r.getInt(0), r.getLong(1))).toSet ==
      Set((1, 20L), (3, 99L), (9, 90L)))
    assert(graft.sinks.VersionedTable.versions(spark, loc) == (1L to 4L))
  }

  test("named errors: every unsupported DML variant is rejected loudly") {
    val loc = table()
    def err(sql: String, versioned: Boolean = true, withOutput: Boolean = false): String =
      intercept[ConfigError](Engine.runSparkSqlJob(
        spark, job(loc, sql, versioned, withOutput), "default")).getMessage
    // target must be a declared versioned input
    assert(err("DELETE FROM t WHERE k = 1", versioned = false)
      .contains("versioned"))
    assert(err("DELETE FROM nope WHERE k = 1")
      .contains("not a declared input_tables entry"))
    // DML jobs write in place — output_table is a config error
    assert(err("DELETE FROM t WHERE k = 1", withOutput = true)
      .contains("output_table"))
    // ON must be same-named equi keys
    assert(err(
      """MERGE INTO t USING (SELECT 1 AS kk, CAST(2 AS BIGINT) AS cents, 'x' AS seg) s
        |ON t.k = s.kk WHEN MATCHED THEN UPDATE SET *
        |WHEN NOT MATCHED THEN INSERT *""".stripMargin)
      .contains("same-named equality"))
    assert(err(
      """MERGE INTO t USING (SELECT 1 AS k, CAST(2 AS BIGINT) AS cents, 'x' AS seg) s
        |ON t.k < s.k WHEN MATCHED THEN UPDATE SET *
        |WHEN NOT MATCHED THEN INSERT *""".stripMargin)
      .contains("same-named equality"))
    // a malformed statement is a ConfigError, not a raw ParseException
    assert(err("DELETE FRM t WHERE k = 1").contains("failed to parse"))
    // ANSI scope violations error by name (r13: the conditional action
    // surface ROUTES now — what remains rejected is what ANSI rejects)
    val src = "(SELECT 1 AS k, CAST(2 AS BIGINT) AS cents, 'x' AS seg) s"
    assert(err(
      s"""MERGE INTO t USING $src ON t.k = s.k
         |WHEN NOT MATCHED AND t.seg = 'a' THEN INSERT *""".stripMargin)
      .contains("insert actions see the source row only"))
    assert(err(
      s"""MERGE INTO t USING $src ON t.k = s.k
         |WHEN NOT MATCHED BY SOURCE AND s.seg = 'x' THEN DELETE""".stripMargin)
      .contains("no source row"))
    // unqualified ambiguity (cents exists on both sides of a matched action)
    assert(err(
      s"""MERGE INTO t USING $src ON t.k = s.k
         |WHEN MATCHED AND cents > 0 THEN DELETE""".stripMargin)
      .contains("qualify"))
    // assignment targets must be known target columns
    assert(err(
      s"""MERGE INTO t USING $src ON t.k = s.k
         |WHEN MATCHED THEN UPDATE SET nope = 1""".stripMargin)
      .contains("unknown target column"))
    // an action after an unconditional action never fires — Spark's own
    // parser enforces this, surfaced as the router's parse ConfigError
    assert(err(
      s"""MERGE INTO t USING $src ON t.k = s.k
         |WHEN MATCHED THEN DELETE
         |WHEN MATCHED AND s.cents > 0 THEN UPDATE SET *""".stripMargin)
      .contains("NON_LAST_MATCHED_CLAUSE_OMIT_CONDITION"))
    // ANSI cardinality: a key-duplicated source is order-dependent
    assert(err(
      """MERGE INTO t USING (SELECT 3 AS k, CAST(2 AS BIGINT) AS cents, 'x' AS seg
        |UNION ALL SELECT 3, CAST(4 AS BIGINT), 'y') s ON t.k = s.k
        |WHEN MATCHED AND s.cents > t.cents THEN DELETE""".stripMargin)
      .contains("key-unique"))
  }

  test("conditional MERGE actions route: AND-conditions, DELETE, column SET, NOT MATCHED BY SOURCE") {
    val loc = table() // rows: (1, 10, a), (2, 20, b), (3, 30, a)
    spark.createDataFrame(Seq((1, 100L, "z"), (2, 5L, "z"), (7, 70L, "n"), (8, 80L, "x")))
      .toDF("k", "cents", "seg").createOrReplaceTempView("condarr")
    val after = runSql(loc,
      """MERGE INTO t USING (SELECT * FROM condarr) s ON t.k = s.k
        |WHEN MATCHED AND s.cents > t.cents THEN UPDATE SET cents = s.cents + t.cents
        |WHEN MATCHED THEN DELETE
        |WHEN NOT MATCHED AND s.seg = 'n' THEN INSERT *
        |WHEN NOT MATCHED BY SOURCE AND t.seg = 'a' THEN UPDATE SET seg = 'stale'""".stripMargin)
    val rows = after.collect()
      .map(r => (r.getInt(0), r.getLong(1), r.getString(2))).toSet
    assert(rows == Set(
      (1, 110L, "a"),   // matched, 100 > 10 → cents = s + t, seg untouched
      // k=2 matched, 5 > 20 false → second action DELETE
      (3, 30L, "stale"), // no source row, seg = a → BY SOURCE update
      (7, 70L, "n")      // unmatched arrival, seg = n → INSERT *
      // k=8 unmatched arrival, seg = x → no insert action claims it
    ), rows.toString)
    // INSERT (cols) VALUES: unassigned target columns insert NULL
    spark.createDataFrame(Seq((11, 1L)))
      .toDF("k", "cents").createOrReplaceTempView("condarr2")
    val after2 = runSql(loc,
      """MERGE INTO t USING (SELECT * FROM condarr2) s ON t.k = s.k
        |WHEN NOT MATCHED THEN INSERT (k, cents) VALUES (s.k, s.cents * 3)""".stripMargin)
    val r11 = after2.filter($"k" === 11).head()
    assert(r11.getAs[Long]("cents") == 3L && r11.isNullAt(r11.fieldIndex("seg")))
    // BY SOURCE DELETE: rows absent from the source drop when claimed
    spark.createDataFrame(Seq((1, 0L, "q")))
      .toDF("k", "cents", "seg").createOrReplaceTempView("condarr3")
    val after3 = runSql(loc,
      """MERGE INTO t USING (SELECT * FROM condarr3) s ON t.k = s.k
        |WHEN NOT MATCHED BY SOURCE AND t.cents < 50 THEN DELETE""".stripMargin)
    // k=1 matched (no matched action → kept); k=3/7/11 unmatched with
    // cents 30/70/3 → 30 and 3 drop, 70 stays
    assert(after3.collect().map(_.getInt(0)).toSet == Set(1, 7), after3.collect().toSeq.toString)
  }

  test("MERGE ON binding: self-comparisons and unknown qualifiers reject; duplicate keys dedupe") {
    val loc = table()
    def err(sql: String): String =
      intercept[ConfigError](runSql(loc, sql)).getMessage
    spark.createDataFrame(Seq((3, 99L, "z")))
      .toDF("k", "cents", "seg").createOrReplaceTempView("arrivals2")
    // degenerate ON t.k = t.k: both sides the target — previously
    // accepted because the merge is name-keyed; now a named error
    val e1 = err(
      """MERGE INTO t USING (SELECT * FROM arrivals2) s ON t.k = t.k
        |WHEN MATCHED THEN UPDATE SET * WHEN NOT MATCHED THEN INSERT *""".stripMargin)
    assert(e1.contains("compares the target to itself"), e1)
    val e2 = err(
      """MERGE INTO t USING (SELECT * FROM arrivals2) s ON s.k = s.k
        |WHEN MATCHED THEN UPDATE SET * WHEN NOT MATCHED THEN INSERT *""".stripMargin)
    assert(e2.contains("compares the source to itself"), e2)
    // a qualifier naming neither side is a typo, not a key
    val e3 = err(
      """MERGE INTO t USING (SELECT * FROM arrivals2) s ON t.k = x.k
        |WHEN MATCHED THEN UPDATE SET * WHEN NOT MATCHED THEN INSERT *""".stripMargin)
    assert(e3.contains("unknown qualifier 'x'"), e3)
    // qualifiers resolve CASE-INSENSITIVELY, like Spark's own analyzer
    val upper = runSql(loc,
      """MERGE INTO t USING (SELECT * FROM arrivals2) s ON T.k = S.k
        |WHEN MATCHED THEN UPDATE SET * WHEN NOT MATCHED THEN INSERT *""".stripMargin)
    assert(upper.filter($"k" === 3).head().getAs[Long]("cents") == 99L)
    // duplicated conjuncts dedupe: the merge keys on k once
    val after = runSql(loc,
      """MERGE INTO t USING (SELECT * FROM arrivals2) s
        |ON t.k = s.k AND t.k = s.k
        |WHEN MATCHED THEN UPDATE SET * WHEN NOT MATCHED THEN INSERT *""".stripMargin)
    assert(after.filter($"k" === 3).head().getAs[Long]("cents") == 99L)
  }

  test("conditional MERGE: zone-pruned insert-only batch routes through the insert chain; SET targets resolve case-insensitively") {
    // stats-tracked table so the zone maps actually prune: every
    // arrival key beyond max(k) -> touched is EMPTY and the merge runs
    // the insert-only evaluator path (the review-found analysis crash)
    val loc = tmp("t-zones")
    graft.sinks.VersionedTable.commit(spark, loc,
      Seq((1, 10L, "a"), (2, 20L, "b")).toDF("k", "cents", "seg"),
      "overwrite", statsColumns = Seq("k"))
    spark.createDataFrame(Seq((50, 5L, "n"), (60, 6L, "x")))
      .toDF("k", "cents", "seg").createOrReplaceTempView("freshArr")
    val after = runSql(loc,
      """MERGE INTO t USING (SELECT * FROM freshArr) s ON t.k = s.k
        |WHEN MATCHED AND s.cents > t.cents THEN DELETE
        |WHEN NOT MATCHED AND s.seg = 'n' THEN INSERT *""".stripMargin)
    assert(after.collect().map(r => (r.getInt(0), r.getLong(1), r.getString(2))).toSet ==
      Set((1, 10L, "a"), (2, 20L, "b"), (50, 5L, "n")))
    // Spark resolves identifiers case-insensitively by default — an
    // upper-case SET target must UPDATE, never silently no-op
    val after2 = runSql(loc,
      """MERGE INTO t USING (SELECT 1 AS k, CAST(7 AS BIGINT) AS cents, 'z' AS seg) s
        |ON t.k = s.k WHEN MATCHED THEN UPDATE SET CENTS = s.cents""".stripMargin)
    assert(after2.filter($"k" === 1).head().getAs[Long]("cents") == 7L,
      "case-mismatched SET target must still update the column")
  }

  test("insert-only MERGE accepts a key-duplicated source (ANSI: only a multi-MATCH is ambiguous)") {
    val loc = table() // rows: (1, 10, a), (2, 20, b), (3, 30, a)
    // key 3 duplicated (matches target: both copies skip — no matched
    // action), key 7 duplicated (not matched: BOTH insert, ANSI bag
    // semantics); the r13 over-rejection made this a hard error
    val after = runSql(loc,
      """MERGE INTO t USING (SELECT 3 AS k, CAST(2 AS BIGINT) AS cents, 'x' AS seg
        |UNION ALL SELECT 3, CAST(4 AS BIGINT), 'y'
        |UNION ALL SELECT 7, CAST(70 AS BIGINT), 'n'
        |UNION ALL SELECT 7, CAST(71 AS BIGINT), 'n') s ON t.k = s.k
        |WHEN NOT MATCHED THEN INSERT *""".stripMargin)
    val got = after.collect().map(r => (r.getInt(0), r.getLong(1))).toSet
    assert(got == Set((1, 10L), (2, 20L), (3, 30L), (7, 70L), (7, 71L)), got.toString)
    // the OTHER direction stands: any matched action + duplicate keys
    // still errors by name (the evaluator join would be order-dependent)
    val e = intercept[ConfigError](runSql(loc,
      """MERGE INTO t USING (SELECT 3 AS k, CAST(2 AS BIGINT) AS cents, 'x' AS seg
        |UNION ALL SELECT 3, CAST(4 AS BIGINT), 'y') s ON t.k = s.k
        |WHEN MATCHED THEN UPDATE SET cents = s.cents
        |WHEN NOT MATCHED THEN INSERT *""".stripMargin))
    assert(e.getMessage.contains("key-unique"), e.getMessage)
  }

  test("qualified unknown columns in MERGE actions error by name, not as raw analysis failures") {
    val loc = table()
    def err(sql: String): String =
      intercept[ConfigError](runSql(loc, sql)).getMessage
    val src = "(SELECT 1 AS k, CAST(2 AS BIGINT) AS cents, 'x' AS seg) s"
    // a QUALIFIED typo must hit the same named error as an unqualified
    // one — not a raw AnalysisException against the evaluator's structs
    val e1 = err(
      s"""MERGE INTO t USING $src ON t.k = s.k
         |WHEN MATCHED AND s.nonexistent > 0 THEN DELETE""".stripMargin)
    assert(e1.contains("unknown column 'nonexistent' on the source"), e1)
    val e2 = err(
      s"""MERGE INTO t USING $src ON t.k = s.k
         |WHEN MATCHED AND t.nope = 'x' THEN DELETE""".stripMargin)
    assert(e2.contains("unknown column 'nope' on the target"), e2)
    val e3 = err(
      s"""MERGE INTO t USING $src ON t.k = s.k
         |WHEN MATCHED THEN UPDATE SET cents = t.missing + 1""".stripMargin)
    assert(e3.contains("unknown column 'missing' on the target"), e3)
  }

  test("isDml: leading comments and whitespace do not bypass the router") {
    assert(SqlDml.isDml("DELETE FROM t WHERE k = 1"))
    assert(SqlDml.isDml("  \n-- rollback bad rows\nDELETE FROM t WHERE k = 1"))
    assert(SqlDml.isDml("/* audit\n   ticket-123 */ MERGE INTO t USING s ON t.k = s.k " +
      "WHEN MATCHED THEN UPDATE SET * WHEN NOT MATCHED THEN INSERT *"))
    assert(!SqlDml.isDml("SELECT * FROM t"))
    assert(!SqlDml.isDml("-- DELETE is mentioned here\nSELECT 1"))
    // the comment-routed statement also EXECUTES correctly (a block
    // comment: YAML `sql: >` folding would swallow a -- line comment)
    val loc = table()
    val after = runSql(loc, "/* purge segment b */ DELETE FROM t WHERE seg = 'b'")
    assert(after.count() == 2)
  }

  test("a pinned (as_of) target refuses DML") {
    val loc = table()
    val j = ConfigParser.parse(
      s"""job: {name: j, type: spark-sql}
         |input_tables:
         |  - name: t
         |    source: s3
         |    location: $loc
         |    versioned: "true"
         |    as_of_version: "1"
         |sql: DELETE FROM t WHERE k = 1
         |""".stripMargin)
    val e = intercept[ConfigError](Engine.runSparkSqlJob(spark, j, "default"))
    assert(e.getMessage.contains("as_of"))
  }
}
