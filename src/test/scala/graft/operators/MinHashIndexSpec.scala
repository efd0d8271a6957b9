package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** The persisted MinHash-LSH index tier (r14): build == direct,
  * append-maintained == from-scratch rebuild, probe == the cross slice
  * — the LexicalIndexSpec discipline on the dedup index. */
class MinHashIndexSpec extends SparkSpec {
  import spark.implicits._

  private def tmp(name: String) =
    java.nio.file.Files.createTempDirectory("mhidx-spec").toString + s"/$name"

  // near-dup families crossing the %5==2 delta split: 1/2/7 share a
  // family (7 is the delta member), 3 is a near-dup of them, 4/9 are
  // loners, 5 has too few words for 3-shingles (dropped everywhere)
  private def fixture = Seq(
    (1L, "the quick brown fox jumps over the lazy dog tonight again"),
    (2L, "the quick brown fox jumps over the lazy dog tonight again"),
    (3L, "the quick brown fox jumps over the lazy dog tonight"),
    (4L, "a completely different document about versioned parquet tables"),
    (5L, "two words"),
    (7L, "the quick brown fox jumps over the lazy dog tonight again"),
    (9L, "yet another unrelated text concerning deletion vectors and manifests"),
    (12L, "a completely different document about versioned parquet files")
  ).toDF("doc_id", "text")

  private def pairs(df: org.apache.spark.sql.DataFrame): Set[(Long, Long, Double)] =
    df.collect().map(r => (r.getAs[Long]("doc_a"), r.getAs[Long]("doc_b"),
      r.getAs[Double]("jaccard"))).toSet

  test("indexed self-dedup equals the direct operator exactly") {
    val idx = tmp("direct")
    Dedup.writeMinHashIndex(fixture, "doc_id", "text", idx,
      n = 3, k = 64, bands = 16, docBuckets = 8)
    val direct = Dedup.minhashLsh(fixture, "doc_id", "text",
      n = 3, k = 64, bands = 16, threshold = 0.5)
    val indexed = Dedup.lshPairsIndexed(spark, idx, threshold = 0.5)
    assert(pairs(indexed) == pairs(direct) && pairs(direct).nonEmpty,
      s"indexed=${pairs(indexed)} direct=${pairs(direct)}")
  }

  test("append-maintained index equals a from-scratch rebuild; base files survive by name") {
    val maintained = tmp("maint"); val rebuilt = tmp("rebuild")
    val isDelta = col("doc_id") % 5 === 2
    Dedup.writeMinHashIndex(fixture.filter(!isDelta), "doc_id", "text",
      maintained, n = 3, k = 64, bands = 16, docBuckets = 8)
    val fs = new org.apache.hadoop.fs.Path(maintained)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    def bandFiles(root: String) = fs.globStatus(
      new org.apache.hadoop.fs.Path(s"$root/bands/band_idx=*/part-*"))
      .map(_.getPath.toString).toSet
    val base = bandFiles(maintained)
    Dedup.appendToMinHashIndex(fixture.filter(isDelta), "doc_id", "text",
      maintained)
    assert(base.subsetOf(bandFiles(maintained)) &&
      bandFiles(maintained).size > base.size,
      "append must add band files, never rewrite a base file")
    Dedup.writeMinHashIndex(fixture, "doc_id", "text", rebuilt,
      n = 3, k = 64, bands = 16, docBuckets = 8)
    assert(pairs(Dedup.lshPairsIndexed(spark, maintained, 0.5)) ==
      pairs(Dedup.lshPairsIndexed(spark, rebuilt, 0.5)))
    // stats fold: maintained n_docs == rebuilt n_docs (shingled docs
    // only — the two-word doc is absent from both)
    def nDocs(root: String) = spark.read.parquet(s"$root/stats")
      .head().getAs[Long]("n_docs")
    assert(nDocs(maintained) == nDocs(rebuilt) && nDocs(rebuilt) == 7L)
  }

  test("probe finds exactly the cross pairs without re-shingling the corpus") {
    val idx = tmp("probe")
    val isDelta = col("doc_id") % 5 === 2
    Dedup.writeMinHashIndex(fixture.filter(!isDelta), "doc_id", "text",
      idx, n = 3, k = 64, bands = 16, docBuckets = 8)
    val probed = Dedup.probeMinHashIndex(spark, idx, fixture.filter(isDelta),
        "doc_id", "text", threshold = 0.5)
      .select(least(col("doc_a"), col("doc_b")).as("doc_a"),
        greatest(col("doc_a"), col("doc_b")).as("doc_b"), col("jaccard"))
    val cross = Dedup.minhashLsh(fixture, "doc_id", "text",
        n = 3, k = 64, bands = 16, threshold = 0.5)
      .filter((col("doc_a") % 5 === 2) =!= (col("doc_b") % 5 === 2))
    // doc 7 (delta) pairs with 1, 2 (jaccard 1.0) and 3 — and 12
    // (delta) with 4; delta-internal pairs are out of probe scope by
    // contract and absent from the cross slice too
    assert(pairs(probed) == pairs(cross) && pairs(cross).size >= 3,
      s"probed=${pairs(probed)} cross=${pairs(cross)}")
  }

  test("named error on a malformed stats table") {
    val idx = tmp("bad")
    // two stats rows -> loud, never a silent mis-parameterized probe
    Seq((1L, 3, 64, 16, 8), (2L, 3, 64, 16, 8))
      .toDF("n_docs", "n", "k", "bands", "doc_buckets")
      .write.parquet(s"$idx/stats")
    val e = intercept[RuntimeException] {
      Dedup.probeMinHashIndex(spark, idx, fixture, "doc_id", "text")
    }
    assert(e.getMessage.contains("stats must hold exactly one row"))
  }
}
