package graft.operators

import graft.SparkSpec

class MultimodalSpec extends SparkSpec {
  import spark.implicits._

  test("payload bytes survive the typed encoder boundary intact") {
    val df = Seq((1L, "abc", "s1"), (2L, "zz", "s2")).toDF("doc_id", "text", "source")
    val media = Multimodal.toMedia(df, "doc_id", "text", "source").collect()
      .map(m => m.doc_id -> m).toMap
    assert(media(1L).payload.toSeq == "abc".getBytes("UTF-8").toSeq)
    assert(media(1L).meta == Multimodal.MediaMeta("text/plain", 3L, "s1"))
  }

  test("decode stub streams partitions and computes exact byte features") {
    val df = Seq((1L, "abc", "s1"), (2L, "zz", "s2")).toDF("doc_id", "text", "source")
    val feats = Multimodal.decodeStub(
        Multimodal.toMedia(df, "doc_id", "text", "source"))
      .collect().map(f => f.doc_id -> f).toMap
    assert(feats(1L).byte_sum == 'a'.toLong + 'b' + 'c')
    assert(feats(1L).n_bytes == 3L)
    assert(feats(2L).byte_sum == 2L * 'z')
  }

  test("resize stub downsamples payloads and keeps meta consistent") {
    val df = Seq((1L, "abcdefghij", "s")).toDF("doc_id", "text", "source")
    val r = Multimodal.resizeStub(
        Multimodal.toMedia(df, "doc_id", "text", "source"), 3)
      .collect().head
    assert(new String(r.payload, "UTF-8") == "adgj")
    assert(r.meta.n_bytes == 4L)
  }

  test("frame sampling fans one doc into strided binary frames") {
    val df = Seq((1L, "aabbccddee", "s")).toDF("doc_id", "text", "source")
    val frames = Multimodal.frameSampleStub(
        Multimodal.toMedia(df, "doc_id", "text", "source"), frameBytes = 2, stride = 2)
      .collect().sortBy(_.frame_idx)
    assert(frames.map(_.frame_idx).toSeq == Seq(0, 2, 4))
    assert(frames.map(f => new String(f.frame, "UTF-8")).toSeq == Seq("aa", "cc", "ee"))
  }

  test("per-source rollup aggregates all docs") {
    val df = Seq((1L, "a", "s"), (2L, "b", "s"), (3L, "c", "t"))
      .toDF("doc_id", "text", "source")
    val r = Multimodal.featuresBySource(df, "doc_id", "text", "source")
      .collect().map(x => x.getString(0) -> (x.getLong(1), x.getLong(2), x.getLong(3))).toMap
    assert(r("s") == ((2L, 2L, ('a'.toLong + 'b'))))
    assert(r("t") == ((1L, 1L, 'c'.toLong)))
  }

  test("dedupBySignature groups identical-after-downsample payloads") {
    // factor 2 keeps chars at even indices: "abcdef" -> "ace",
    // "axcxex" -> "ace" (same!), "zzzzzz" -> "zzz"
    val df = Seq((1L, "abcdef", "s"), (2L, "axcxex", "s"), (3L, "zzzzzz", "s"))
      .toDF("doc_id", "text", "source")
    val r = Multimodal.dedupBySignature(
        Multimodal.resizeStub(Multimodal.toMedia(df, "doc_id", "text", "source"), 2))
      .collect().map(x => x.getLong(1) -> x.getLong(2)).toMap
    assert(r == Map(1L -> 2L, 3L -> 1L)) // docs 1+2 collapse, keeper = min id
  }
}
