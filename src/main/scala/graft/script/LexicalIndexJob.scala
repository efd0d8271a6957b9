package graft.script

import org.apache.spark.sql.SparkSession

/** YAML-driven lexical (inverted) index BUILD — the retrieval twin of
  * [[AnnIndexJob]] on the A17 script-job surface: reads a document
  * table, tokenizes once, and persists the posting lists, document
  * frequencies and corpus statistics via
  * [[graft.operators.TextAnalysis.writeLexicalIndex]] — build once as
  * an ETL job, probe many times with
  * [[graft.operators.TextAnalysis.tfidfTopKIndexed]] /
  * [[graft.operators.TextAnalysis.bm25TopKIndexed]]. Vars: `in`
  * (parquet path), `out` (index path), optional `id`/`text` column
  * names, `where` (SQL predicate selecting the corpus subset to
  * index), `buckets` (posting partition count). */
class LexicalIndexJob extends ScriptJob {
  override def run(spark: SparkSession, vars: Map[String, String]): Unit = {
    val in = vars.getOrElse("in", sys.error("LexicalIndexJob needs var 'in'"))
    val out = vars.getOrElse("out", sys.error("LexicalIndexJob needs var 'out'"))
    val full = spark.read.parquet(in)
    val corpus = vars.get("where").map(_.trim).filter(_.nonEmpty)
      .map(full.filter).getOrElse(full)
    graft.operators.TextAnalysis.writeLexicalIndex(corpus,
      vars.getOrElse("id", "doc_id"), vars.getOrElse("text", "text"),
      out, buckets = vars.getOrElse("buckets", "64").toInt)
  }
}
