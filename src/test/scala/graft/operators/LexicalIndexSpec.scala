package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** The indexed-retrieval contract (r12 verdict #1): probing a persisted
  * [[TextAnalysis.writeLexicalIndex]] index must return EXACTLY what the
  * direct corpus-scanning operators return — same integer arithmetic,
  * same tie rules, same edge handling — while the postings read is
  * partition-pruned to the query terms' hash buckets. */
class LexicalIndexSpec extends SparkSpec {
  import spark.implicits._

  private def tmp(name: String): String = {
    val d = s"/tmp/graft-test-lexindex/$name"
    val p = new org.apache.hadoop.fs.Path(d)
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (fs.exists(p)) fs.delete(p, true)
    d
  }

  // Edge-bearing corpus: repeated terms (tf saturation), a stopword in
  // every doc (df = N), a rare tie pair ("xq"/"xr" both df=1 — the
  // (df asc, token asc) rule must pick deterministically), a doc that
  // is pure whitespace (zero tokens — excluded from N and dl), and
  // multi-space separators (the words() trim/split contract).
  private val corpus: DataFrame = Seq(
    (1L, "the cat sat on the mat"),
    (2L, "the dog  ate the cat food"),
    (3L, "xq the zebra zebra zebra"),
    (4L, "xr mat food zebra"),
    (5L, "   "),
    (6L, "the the the the")
  ).toDF("doc_id", "text")

  // Queries: a long one (> maxQueryTerms when pruned tight), one with
  // an out-of-vocabulary token ("plutonium" — must be dropped exactly
  // like the direct operator drops it), one that IS only a stopword,
  // and one with zero corpus terms at all (must vanish from output).
  private val queries: DataFrame = Seq(
    (101L, "cat mat zebra the dog"),
    (102L, "plutonium zebra"),
    (103L, "the"),
    (104L, "plutonium uranium")
  ).toDF("doc_id", "text")

  private lazy val indexDir: String = {
    val d = tmp("eq")
    TextAnalysis.writeLexicalIndex(corpus, "doc_id", "text", d, buckets = 16)
    d
  }

  private def sortedRows(df: DataFrame): Seq[String] =
    df.collect().map(_.toString).sorted.toSeq

  test("tfidfTopKIndexed equals tfidfTopK exactly (edges included)") {
    for (mqt <- Seq(2, 16)) {
      val direct = TextAnalysis.tfidfTopK(corpus, queries, "doc_id", "text",
        k = 3, maxQueryTerms = mqt)
      val indexed = TextAnalysis.tfidfTopKIndexed(spark, indexDir, queries,
        "doc_id", "text", k = 3, maxQueryTerms = mqt)
      assert(indexed.columns.toSeq === direct.columns.toSeq)
      assert(sortedRows(indexed) === sortedRows(direct), s"maxQueryTerms=$mqt")
    }
  }

  test("bm25TopKIndexed equals bm25TopK exactly (edges included)") {
    for (mqt <- Seq(2, 16)) {
      val direct = TextAnalysis.bm25TopK(corpus, queries, "doc_id", "text",
        k = 3, maxQueryTerms = mqt)
      val indexed = TextAnalysis.bm25TopKIndexed(spark, indexDir, queries,
        "doc_id", "text", k = 3, maxQueryTerms = mqt)
      assert(indexed.columns.toSeq === direct.columns.toSeq)
      assert(sortedRows(indexed) === sortedRows(direct), s"maxQueryTerms=$mqt")
    }
  }

  test("query with no corpus terms returns no rows (both paths)") {
    val noHit = Seq((201L, "plutonium uranium")).toDF("doc_id", "text")
    assert(TextAnalysis.tfidfTopKIndexed(spark, indexDir, noHit,
      "doc_id", "text", k = 3).count() === 0L)
    assert(TextAnalysis.tfidfTopK(corpus, noHit, "doc_id", "text", k = 3)
      .count() === 0L)
  }

  test("index layout: stats scalars, vocabulary df, per-posting dl") {
    val stats = spark.read.parquet(s"$indexDir/stats").collect()
    assert(stats.length === 1)
    // doc 5 is whitespace-only: excluded from N; total tokens counted
    // over the remaining 5 docs
    assert(stats.head.getAs[Long]("n_docs") === 5L)
    assert(stats.head.getAs[Long]("total_tokens") === 25L)
    assert(stats.head.getAs[Int]("n_buckets") === 16)
    val dfreq = spark.read.parquet(s"$indexDir/df")
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(dfreq("the") === 4L) // docs 1, 2, 3, 6
    assert(dfreq("zebra") === 2L) // docs 3, 4 (tf 3 in doc 3 — df counts docs)
    assert(dfreq("xq") === 1L)
    // every posting carries its document's length (the denormalized dl)
    val p6 = spark.read.parquet(s"$indexDir/postings")
      .filter(col("doc_id") === 6L).collect()
    assert(p6.map(_.getAs[Long]("dl")).toSet === Set(4L))
    assert(p6.map(_.getAs[Long]("tf_d")).toSet === Set(4L))
  }

  test("probe prunes posting partitions to the query terms' buckets") {
    // one-term query: the probe's postings scan must carry a tb
    // partition filter and open only that bucket's file(s)
    val one = Seq((301L, "xq")).toDF("doc_id", "text")
    val probe = TextAnalysis.tfidfTopKIndexed(spark, indexDir, one,
      "doc_id", "text", k = 3)
    assert(probe.collect().length === 1) // xq hits doc 3 only
    val plan = probe.queryExecution.executedPlan.toString
    assert(plan.contains("PartitionFilters") && plan.contains("tb"),
      s"expected a tb partition filter in the postings scan:\n$plan")
    // measured: the pruned scan reads strictly fewer files than the
    // index holds (the input_file_name discipline, SinksSpec z-order)
    val allFiles = spark.read.parquet(s"$indexDir/postings")
      .select(input_file_name()).distinct().count()
    val sel = Seq("xq").map(t => t: Any)
    val bucket = spark.range(1).select(
      pmod(xxhash64(lit("xq")), lit(16L)).cast("int")).collect().head.getInt(0)
    val prunedFiles = spark.read.parquet(s"$indexDir/postings")
      .filter(col("tb") === bucket && col("token").isin(sel: _*))
      .select(input_file_name()).distinct().count()
    assert(prunedFiles < allFiles,
      s"pruned probe read $prunedFiles of $allFiles posting files")
  }

  test("appendToLexicalIndex: delta-only maintenance equals a from-scratch rebuild; base posting files untouched") {
    val inc = tmp("inc-base")
    TextAnalysis.writeLexicalIndex(corpus, "doc_id", "text", inc, buckets = 16)
    def postingFiles(dir: String): Set[String] = {
      def walk(f: java.io.File): Seq[java.io.File] =
        if (f.isDirectory) f.listFiles().toSeq.flatMap(walk) else Seq(f)
      walk(new java.io.File(s"$dir/postings"))
        .filter(_.getName.endsWith(".parquet")).map(_.getPath).toSet
    }
    val preFiles = postingFiles(inc)
    // delta: new doc ids only — shared tokens (df merge), a brand-new
    // token (df insert), and a whitespace-only doc (no postings)
    val delta = Seq(
      (7L, "zebra cat newtoken"),
      (8L, "newtoken newtoken the"),
      (9L, "  ")
    ).toDF("doc_id", "text")
    TextAnalysis.appendToLexicalIndex(delta, "doc_id", "text", inc)
    // delta-proportional by construction: every pre-append posting
    // file survives byte-identical under its original name
    assert(preFiles.subsetOf(postingFiles(inc)),
      "the append must never rewrite base posting files")
    // the maintained index IS the from-scratch index
    val rebuilt = tmp("inc-rebuilt")
    TextAnalysis.writeLexicalIndex(corpus.unionByName(delta),
      "doc_id", "text", rebuilt, buckets = 16)
    def dfTable(dir: String) = spark.read.parquet(s"$dir/df").collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(dfTable(inc) === dfTable(rebuilt))
    assert(spark.read.parquet(s"$inc/stats").collect().map(_.toString).toSeq ===
      spark.read.parquet(s"$rebuilt/stats").collect().map(_.toString).toSeq)
    // and the probes agree with each other AND the direct operator
    for ((probe, direct) <- Seq(
      (TextAnalysis.tfidfTopKIndexed(spark, inc, queries, "doc_id", "text", k = 3),
        TextAnalysis.tfidfTopK(corpus.unionByName(delta), queries, "doc_id", "text", k = 3)),
      (TextAnalysis.bm25TopKIndexed(spark, inc, queries, "doc_id", "text", k = 3),
        TextAnalysis.bm25TopK(corpus.unionByName(delta), queries, "doc_id", "text", k = 3)))) {
      assert(sortedRows(probe) === sortedRows(direct))
    }
  }

  test("LexicalIndexJob builds through the YAML script-job surface with where") {
    val src = tmp("job-src"); val out = tmp("job-out")
    corpus.write.parquet(src)
    val yaml =
      s"""job:
         |  name: lex-index-test
         |  type: python-script
         |variables:
         |  default:
         |    in: $src
         |    out: $out
         |    where: "doc_id <> 6"
         |    buckets: "8"
         |script_class: graft.script.LexicalIndexJob
         |""".stripMargin
    graft.engine.Engine.run(spark, graft.config.ConfigParser.parse(yaml), "default")
    val stats = spark.read.parquet(s"$out/stats").collect().head
    assert(stats.getAs[Long]("n_docs") === 4L) // doc 6 filtered, doc 5 tokenless
    assert(stats.getAs[Int]("n_buckets") === 8)
    // probing the filtered index must equal the direct operator on the
    // filtered corpus — the where clause IS the corpus definition
    val direct = TextAnalysis.bm25TopK(corpus.filter(col("doc_id") =!= 6L),
      queries, "doc_id", "text", k = 3)
    val indexed = TextAnalysis.bm25TopKIndexed(spark, out, queries,
      "doc_id", "text", k = 3)
    assert(sortedRows(indexed) === sortedRows(direct))
  }
}
