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

  test("png encode/decode round-trips geometry and pixel values") {
    val df = Seq((0L, "x", "s"), (5L, "y", "s"), (300L, "z", "t"))
      .toDF("doc_id", "text", "source")
    val media = Multimodal.encodePng(df, "doc_id", "source").collect()
    // payloads are genuine PNG containers (magic bytes)
    media.foreach { m =>
      assert((m.payload(0) & 0xff) == 0x89 && new String(m.payload.slice(1, 4)) == "PNG")
      assert(m.meta.format == "image/png" && m.meta.n_bytes == m.payload.length)
    }
    val feats = Multimodal.decodeImages(
        Multimodal.encodePng(df, "doc_id", "source"))
      .collect().map(f => f.doc_id -> f).toMap
    // id=5: w=6 h=6, a=5 b=38, split=3 -> sum_red = 6*(3*5 + 3*38) = 774
    assert(feats(5L).width == 6 && feats(5L).height == 6)
    assert(feats(5L).sum_red == 774L)
    assert(feats(5L).px_first_red == 5 && feats(5L).px_last_red == 38)
    // id=0: w=1 h=1, split=0 -> everything is b = 3
    assert(feats(0L).width == 1 && feats(0L).n_pixels == 1L && feats(0L).sum_red == 3L)
    // id=300: w=1+300%16=13, h=1+300%8=5, a=44, b=(2103)%256=55, s=6
    assert(feats(300L).width == 13 && feats(300L).height == 5)
    assert(feats(300L).sum_red == 5L * (6 * 44 + 7 * 55))
    // corrupt payload fails fast, not silently
    val bad = Seq(Multimodal.MediaDoc(9L, Array[Byte](1, 2, 3),
      Multimodal.MediaMeta("image/png", 3L, "s")))
    val ds = spark.createDataset(bad)(
      org.apache.spark.sql.Encoders.product[Multimodal.MediaDoc])
    intercept[org.apache.spark.SparkException](Multimodal.decodeImages(ds).collect())
  }

  test("wav encode/decode round-trips header fields and sample values") {
    val df = Seq((0L, "x", "s"), (97L, "y", "s")).toDF("doc_id", "text", "source")
    val media = Multimodal.encodeWav(df, "doc_id", "source").collect()
    media.foreach { m =>
      // genuine RIFF/WAVE container magic
      assert(new String(m.payload.slice(0, 4)) == "RIFF")
      assert(new String(m.payload.slice(8, 12)) == "WAVE")
      assert(m.meta.format == "audio/wav")
    }
    val feats = Multimodal.decodeWav(
        Multimodal.encodeWav(df, "doc_id", "source"))
      .collect().map(f => f.doc_id -> f).toMap
    // id=97: n=197; fold replayed in the spec's own loop
    var sum = 0L; var peak = 0
    for (i <- 0 until 197) {
      val s = (((97L * 31 + i.toLong * 7919) % 65536) - 32768).toInt
      sum += s; peak = math.max(peak, math.abs(s))
    }
    assert(feats(97L).sample_rate == 8000 && feats(97L).channels == 1)
    assert(feats(97L).n_samples == 197L)
    assert(feats(97L).sum_samples == sum && feats(97L).peak_abs == peak)
    // id=0: n=100, every sample = (0 % 65536) - 32768 + i*7919 folds
    assert(feats(0L).n_samples == 100L)
    // corrupt payload fails fast
    val bad = Seq(Multimodal.MediaDoc(9L, Array[Byte](1, 2, 3),
      Multimodal.MediaMeta("audio/wav", 3L, "s")))
    val ds = spark.createDataset(bad)(
      org.apache.spark.sql.Encoders.product[Multimodal.MediaDoc])
    intercept[org.apache.spark.SparkException](Multimodal.decodeWav(ds).collect())
  }

  test("gif encode/frame-sample round-trips multi-frame geometry and pixels") {
    val df = Seq((0L, "x", "s"), (13L, "y", "s")).toDF("doc_id", "text", "source")
    val media = Multimodal.encodeGif(df, "doc_id", "source").collect()
    media.foreach { m =>
      assert(new String(m.payload.slice(0, 6)) == "GIF89a" ||
             new String(m.payload.slice(0, 6)) == "GIF87a")
      assert(m.meta.format == "image/gif")
    }
    // id=13: nf = 2+13%6 = 3, w = 1+13%8 = 6, h = 1+13%4 = 2,
    // gray(f) = (13*17 + f*29) % 256 = (221 + 29f) % 256
    val all = Multimodal.sampleGifFrames(
        Multimodal.encodeGif(df, "doc_id", "source"), stride = 1)
      .collect().filter(_.doc_id == 13L).sortBy(_.frame_idx)
    assert(all.map(_.frame_idx).toSeq == Seq(0, 1, 2))
    assert(all.forall(f => f.width == 6 && f.height == 2))
    assert(all.map(_.gray).toSeq == Seq(221, 250, (221 + 58) % 256))
    // stride 2 keeps frames 0 and 2 only
    val strided = Multimodal.sampleGifFrames(
        Multimodal.encodeGif(df, "doc_id", "source"), stride = 2)
      .collect().filter(_.doc_id == 13L).map(_.frame_idx).sorted.toSeq
    assert(strided == Seq(0, 2))
  }

  test("perceptual hashes collapse re-encodings, byte sigs do not, and distinct images separate") {
    // ids 5 and 77: id 5 has a<b (5<38, ascending at the tone boundary →
    // no dHash bit fires), id 77 has a>b (77>30, descending → the
    // boundary bit fires) — the two dHashes MUST differ.
    val df = Seq(5L, 77L).toDF("doc_id")
    val hs = Multimodal.perceptualHashes(
        Multimodal.encodePngVariants(df.toDF(), "doc_id")).collect()
    assert(hs.length == 6)
    for (id <- Seq(5L, 77L)) {
      val vs = hs.filter(_.doc_id == id)
      assert(vs.map(_.ahash).distinct.length == 1, s"aHash not invariant for $id")
      assert(vs.map(_.dhash).distinct.length == 1, s"dHash not invariant for $id")
      assert(vs.map(_.byte_sig).distinct.length == 3, s"byte sigs collided for $id")
    }
    val d5 = hs.find(_.doc_id == 5L).get.dhash
    val d77 = hs.find(_.doc_id == 77L).get.dhash
    assert(d5 != d77, "opposite-gradient images must have different dHash")
    // dedupPerceptual keeps min id per pixel-identical group
    val groups = Multimodal.dedupPerceptual(
        Multimodal.encodePngVariants(df.toDF(), "doc_id"))
      .select("keeper_id", "n_copies")
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(groups == Map(5L -> 3L, 77L -> 3L))
  }

  test("area-average hash survives a real JPEG re-encode; nearest sampling does not") {
    val df = Seq(20L, 140L, 260L).toDF("doc_id")
    val media = Multimodal.encodeJpegVariants(df, "doc_id")
    val area = Multimodal.perceptualHashes(media).collect()
    val near = Multimodal.nearestSampleHashes(media).collect()
    for (id <- Seq(20L, 140L, 260L)) {
      val a = area.filter(_.doc_id == id)
      assert(a.length == 4 && a.map(h => (h.ahash, h.dhash)).distinct.length == 1,
        s"area hash did not collapse all four variants for $id")
      assert(a.map(_.byte_sig).distinct.length == 4, s"byte sigs collided for $id")
      val n = near.filter(_.doc_id == id)
      val jpeg = n.find(_.variant == 3).get
      val lossless = n.filter(_.variant != 3)
      assert(lossless.map(h => (h.ahash, h.dhash)).distinct.length == 1,
        s"nearest hash split the lossless variants for $id")
      assert((jpeg.ahash, jpeg.dhash) != (lossless.head.ahash, lossless.head.dhash),
        s"nearest hash unexpectedly survived the JPEG for $id — the contrast is vacuous")
    }
  }

  test("flat images dedup by exact tone, not by the degenerate zero hash") {
    // ids 80 and 160: w = 1 (id%16 == 0) makes every pixel the b tone —
    // uniform images whose aHash and dHash are both 0 for ANY color.
    // b(80) = 51, b(160) = 99: visually distinct solid tiles that a
    // hash-only key would falsely merge.
    val df = Seq(80L, 160L).toDF("doc_id")
    val hs = Multimodal.perceptualHashes(
        Multimodal.encodePngVariants(df.toDF(), "doc_id")).collect()
    assert(hs.forall(h => h.flat && h.ahash == 0L && h.dhash == 0L))
    // per id: PNG+BMP of the same tone collapse (identical pixels); the
    // +1-brightness flat variant stays separate (no texture evidence);
    // and 80 never merges with 160
    val groups = Multimodal.dedupPerceptual(
        Multimodal.encodePngVariants(df.toDF(), "doc_id"))
      .select("keeper_id", "n_copies")
      .collect().map(r => (r.getLong(0), r.getLong(1))).sorted.toSeq
    assert(groups == Seq((80L, 1L), (80L, 2L), (160L, 1L), (160L, 2L)))
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
