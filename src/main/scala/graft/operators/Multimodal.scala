package graft.operators

import org.apache.spark.sql.{DataFrame, Dataset, Encoders}
import org.apache.spark.sql.functions._

/** Multimodal column handling: media as opaque `binary` payloads with a
  * typed metadata struct, processed by partition-streaming decode.
  *
  * All three modalities decode through REAL codecs (JDK built-ins, no
  * external dependency), behind the same typed `Dataset[MediaDoc]`
  * boundary: images via PNG ([[encodePng]]/[[decodeImages]],
  * `javax.imageio`), audio via RIFF/PCM WAV ([[encodeWav]]/[[decodeWav]],
  * `javax.sound.sampled`), and multi-frame video-analog via animated GIF
  * ([[encodeGif]]/[[sampleGifFrames]], `javax.imageio` sequence API —
  * frame sampling decodes ONLY the kept frames). The byte-level
  * [[decodeStub]]/[[resizeStub]]/[[frameSampleStub]] variants remain as
  * codec-free shapes for payloads with no JDK parser (e.g. proprietary
  * video): the Spark plumbing — (payload binary, meta struct) schema,
  * typed encoder boundary, `mapPartitions` iterator-streaming (the JVM
  * analog of `mapInPandas`: one partition as a lazy iterator, memory
  * O(batch) at 100 TB) — is identical in both, so swapping a real codec
  * in means replacing one function body, exactly as the three real
  * codecs here did.
  */
object Multimodal {

  final case class MediaMeta(format: String, n_bytes: Long, source: String)
  final case class MediaDoc(doc_id: Long, payload: Array[Byte], meta: MediaMeta)
  final case class MediaFeatures(doc_id: Long, source: String,
                                 n_bytes: Long, byte_sum: Long)

  /** Wrap a text corpus as media rows: payload = UTF-8 bytes (the
    * deterministic stand-in for image/audio bytes), meta = typed struct. */
  def toMedia(docs: DataFrame, idCol: String, textCol: String,
              sourceCol: String): Dataset[MediaDoc] =
    docs.select(
        col(idCol).cast("long").as("doc_id"),
        encode(col(textCol), "UTF-8").as("payload"),
        struct(
          lit("text/plain").as("format"),
          octet_length(col(textCol)).cast("long").as("n_bytes"),
          col(sourceCol).as("source")).as("meta"))
      .as(Encoders.product[MediaDoc])

  /** Partition-streaming feature extraction. A real implementation would
    * decode `payload` (JPEG → pixels, WAV → samples) and emit embeddings;
    * the deterministic stand-in sums the payload bytes — enough to prove
    * the bytes actually crossed the encoder boundary intact. */
  def decodeStub(media: Dataset[MediaDoc]): Dataset[MediaFeatures] =
    media.mapPartitions { docs =>
      docs.map { m =>
        var sum = 0L
        var i = 0
        while (i < m.payload.length) { sum += m.payload(i) & 0xff; i += 1 }
        MediaFeatures(m.doc_id, m.meta.source, m.payload.length.toLong, sum)
      }
    }(Encoders.product[MediaFeatures])

  /** "Resize" stub: downsample the payload by keeping every `factor`-th
    * byte (the deterministic stand-in for image resampling — a real
    * implementation decodes pixels and interpolates; the Spark shape is
    * identical: payload → smaller payload, meta updated in place). */
  def resizeStub(media: Dataset[MediaDoc], factor: Int): Dataset[MediaDoc] = {
    require(factor >= 1, s"resize factor must be >= 1, got $factor")
    media.mapPartitions { docs =>
      docs.map { m =>
        val resized = Array.tabulate(
          (m.payload.length + factor - 1) / factor)(i => m.payload(i * factor))
        MediaDoc(m.doc_id, resized,
          m.meta.copy(n_bytes = resized.length.toLong))
      }
    }(Encoders.product[MediaDoc])
  }

  /** Frame-sample stub: split the payload into fixed-size "frames" and
    * keep every `stride`-th frame (the video frame-sampling shape: one
    * input row → several frame rows, each a binary chunk + frame index).
    * Real codecs swap in at the chunking step; the iterator-streaming,
    * schema and fan-out are what a 100 TB pipeline actually exercises. */
  final case class Frame(doc_id: Long, frame_idx: Int, frame: Array[Byte])
  def frameSampleStub(media: Dataset[MediaDoc], frameBytes: Int,
                      stride: Int): Dataset[Frame] = {
    require(frameBytes >= 1 && stride >= 1,
      s"frameBytes and stride must be >= 1, got $frameBytes/$stride")
    media.mapPartitions { docs =>
      docs.flatMap { m =>
        m.payload.grouped(frameBytes).zipWithIndex.collect {
          case (chunk, i) if i % stride == 0 => Frame(m.doc_id, i, chunk)
        }
      }
    }(Encoders.product[Frame])
  }

  // ---- real image codec (javax.imageio — JDK built-in) ---------------

  final case class ImageFeatures(doc_id: Long, width: Int, height: Int,
                                 n_pixels: Long, sum_red: Long,
                                 px_first_red: Int, px_last_red: Int)

  /** Plant a REAL PNG per row: geometry and a two-tone red fill derived
    * deterministically from `doc_id` (width = 1 + id%16, height =
    * 1 + id%8; columns left of w/2 get red a = id%256, the rest
    * b = (id*7+3)%256). The payload is genuine PNG container bytes from
    * `ImageIO.write` — decoding it requires a genuine codec, and every
    * decoded property has a closed form an SQL oracle can recompute.
    * Executor-side encode via mapPartitions: no driver materialization,
    * O(image) memory per row. */
  /** Shared two-tone renderer for the planted-image generators: columns
    * left of w/2 get red `a`, the rest `b` (+`shift`), green/blue zero.
    * All id math in the callers uses floorMod so a negative doc_id (the
    * planting convention elsewhere in the suite) yields valid geometry
    * instead of a BufferedImage crash. */
  private def renderTwoTone(w: Int, h: Int, a: Int, b: Int,
                            shift: Int): java.awt.image.BufferedImage = {
    val img = new java.awt.image.BufferedImage(
      w, h, java.awt.image.BufferedImage.TYPE_INT_RGB)
    var y = 0
    while (y < h) {
      var x = 0
      while (x < w) {
        val red = (if (x < w / 2) a else b) + shift
        img.setRGB(x, y, red << 16)
        x += 1
      }
      y += 1
    }
    img
  }

  private def encodeImage(img: java.awt.image.BufferedImage,
                          fmt: String): Array[Byte] = {
    val out = new java.io.ByteArrayOutputStream()
    javax.imageio.ImageIO.write(img, fmt, out)
    out.toByteArray
  }

  def encodePng(docs: DataFrame, idCol: String, sourceCol: String): Dataset[MediaDoc] =
    docs.select(col(idCol).cast("long").as("doc_id"), col(sourceCol).as("source"))
      .as(Encoders.product[(Long, String)])
      .mapPartitions { rows =>
        rows.map { case (id, source) =>
          val w = 1 + java.lang.Math.floorMod(id, 16L).toInt
          val h = 1 + java.lang.Math.floorMod(id, 8L).toInt
          val a = java.lang.Math.floorMod(id, 256L).toInt
          val b = java.lang.Math.floorMod(id * 7 + 3, 256L).toInt
          val png = encodeImage(renderTwoTone(w, h, a, b, 0), "png")
          MediaDoc(id, png, MediaMeta("image/png", png.length.toLong, source))
        }
      }(Encoders.product[MediaDoc])

  /** REAL image decode: parse the PNG container bytes back into pixels
    * (`ImageIO.read`) and extract verifiable properties — geometry, the
    * red-channel sum, and two probe pixels (first/last of row 0, which
    * pin orientation: a row-major/column-major mixup or a channel swap
    * flips them). Same partition-streaming shape as every decoder here;
    * a corrupt payload throws rather than silently zeroing (fail-fast —
    * a quarantine variant would wrap this in Try and route failures). */
  def decodeImages(media: Dataset[MediaDoc]): Dataset[ImageFeatures] =
    media.mapPartitions { docs =>
      docs.map { m =>
        val img = javax.imageio.ImageIO.read(
          new java.io.ByteArrayInputStream(m.payload))
        require(img != null, s"doc ${m.doc_id}: payload is not a decodable image")
        val w = img.getWidth; val h = img.getHeight
        var sumRed = 0L
        var y = 0
        while (y < h) {
          var x = 0
          while (x < w) {
            sumRed += (img.getRGB(x, y) >> 16) & 0xff
            x += 1
          }
          y += 1
        }
        ImageFeatures(m.doc_id, w, h, w.toLong * h, sumRed,
          (img.getRGB(0, 0) >> 16) & 0xff,
          (img.getRGB(w - 1, 0) >> 16) & 0xff)
      }
    }(Encoders.product[ImageFeatures])

  // ---- real audio codec (javax.sound.sampled — JDK built-in) ---------

  final case class AudioFeatures(doc_id: Long, sample_rate: Int, channels: Int,
                                 n_samples: Long, sum_samples: Long,
                                 peak_abs: Int)

  /** Plant a REAL WAV (RIFF/PCM 16-bit mono, 8 kHz) per row: sample count
    * and every sample value closed-form in `doc_id` (n = 100 + id%400,
    * sample[i] = ((id*31 + i*7919) mod 65536) - 32768). The payload is a
    * genuine WAV container from `AudioSystem.write` — decoding it takes a
    * genuine parser, and each decoded property has a formula an SQL
    * oracle can recompute. Executor-side, O(clip) memory per row. */
  def encodeWav(docs: DataFrame, idCol: String, sourceCol: String): Dataset[MediaDoc] =
    docs.select(col(idCol).cast("long").as("doc_id"), col(sourceCol).as("source"))
      .as(Encoders.product[(Long, String)])
      .mapPartitions { rows =>
        rows.map { case (id, source) =>
          val n = 100 + (id % 400).toInt
          val pcm = new Array[Byte](n * 2)
          var i = 0
          while (i < n) {
            val s = (((id * 31 + i.toLong * 7919) % 65536) - 32768).toInt
            pcm(2 * i) = (s & 0xff).toByte          // little-endian 16-bit
            pcm(2 * i + 1) = ((s >> 8) & 0xff).toByte
            i += 1
          }
          val fmt = new javax.sound.sampled.AudioFormat(8000f, 16, 1,
            /*signed*/ true, /*bigEndian*/ false)
          val ais = new javax.sound.sampled.AudioInputStream(
            new java.io.ByteArrayInputStream(pcm), fmt, n.toLong)
          val out = new java.io.ByteArrayOutputStream()
          javax.sound.sampled.AudioSystem.write(ais,
            javax.sound.sampled.AudioFileFormat.Type.WAVE, out)
          val wav = out.toByteArray
          MediaDoc(id, wav, MediaMeta("audio/wav", wav.length.toLong, source))
        }
      }(Encoders.product[MediaDoc])

  /** REAL audio decode: parse the WAV container back through the JDK's
    * audio system — container header (sample rate, channels) plus the
    * full PCM payload re-read as signed little-endian 16-bit samples —
    * and fold sample-level properties (sum, peak) the oracle recomputes
    * from the planting formula. A truncated/garbage payload throws
    * (fail-fast, same contract as [[decodeImages]]). */
  def decodeWav(media: Dataset[MediaDoc]): Dataset[AudioFeatures] =
    media.mapPartitions { docs =>
      docs.map { m =>
        val ais = javax.sound.sampled.AudioSystem.getAudioInputStream(
          new java.io.ByteArrayInputStream(m.payload))
        val fmt = ais.getFormat
        require(fmt.getSampleSizeInBits == 16 && !fmt.isBigEndian,
          s"doc ${m.doc_id}: expected 16-bit little-endian PCM, got $fmt")
        val pcm = ais.readAllBytes()
        val n = pcm.length / (2 * fmt.getChannels)
        var sum = 0L
        var peak = 0
        var i = 0
        while (i < pcm.length - 1) {
          val s = ((pcm(i) & 0xff) | (pcm(i + 1) << 8)).toShort.toInt
          sum += s
          val a = math.abs(s)
          if (a > peak) peak = a
          i += 2
        }
        AudioFeatures(m.doc_id, fmt.getSampleRate.toInt, fmt.getChannels,
          n.toLong, sum, peak)
      }
    }(Encoders.product[AudioFeatures])

  // ---- real multi-frame codec (animated GIF via javax.imageio) -------

  final case class GifFrame(doc_id: Long, frame_idx: Int, width: Int,
                            height: Int, gray: Int)

  private def grayPalette: java.awt.image.IndexColorModel = {
    val g = Array.tabulate[Byte](256)(i => i.toByte)
    new java.awt.image.IndexColorModel(8, 256, g, g, g)
  }

  /** Plant a REAL animated GIF per row (the video stand-in with an actual
    * multi-frame container the JDK can both write and parse): nf =
    * 2 + id%6 frames of w×h = (1+id%8)×(1+id%4), frame f filled with the
    * constant gray (id*17 + f*29) % 256. An explicit 256-entry gray
    * palette makes the 8-bit indexed round-trip EXACT — no quantization,
    * so every decoded pixel has a closed form an SQL oracle can check. */
  def encodeGif(docs: DataFrame, idCol: String, sourceCol: String): Dataset[MediaDoc] =
    docs.select(col(idCol).cast("long").as("doc_id"), col(sourceCol).as("source"))
      .as(Encoders.product[(Long, String)])
      .mapPartitions { rows =>
        // one registry lookup per PARTITION, not per row (ImageWriter is
        // reusable sequentially via reset(); the iterator is sequential)
        lazy val writer = javax.imageio.ImageIO
          .getImageWritersByFormatName("gif").next()
        rows.map { case (id, source) =>
          val nf = 2 + (id % 6).toInt
          val w = 1 + (id % 8).toInt
          val h = 1 + (id % 4).toInt
          val out = new java.io.ByteArrayOutputStream()
          val ios = javax.imageio.ImageIO.createImageOutputStream(out)
          writer.reset()
          writer.setOutput(ios)
          writer.prepareWriteSequence(null)
          var f = 0
          while (f < nf) {
            val gray = ((id * 17 + f * 29) % 256).toInt
            val img = new java.awt.image.BufferedImage(w, h,
              java.awt.image.BufferedImage.TYPE_BYTE_INDEXED, grayPalette)
            val raster = img.getRaster
            var y = 0
            while (y < h) {
              var x = 0
              while (x < w) { raster.setSample(x, y, 0, gray); x += 1 }
              y += 1
            }
            writer.writeToSequence(
              new javax.imageio.IIOImage(img, null, null), null)
            f += 1
          }
          writer.endWriteSequence()
          ios.close()
          val gif = out.toByteArray
          MediaDoc(id, gif, MediaMeta("image/gif", gif.length.toLong, source))
        }
      }(Encoders.product[MediaDoc])

  /** REAL frame sampling over the multi-frame container: parse the GIF,
    * decode ONLY every `stride`-th frame (`ImageReader.read(i)` seeks by
    * frame index — skipped frames are never rasterized, the point of
    * frame sampling), emit per-frame geometry and the decoded gray. */
  def sampleGifFrames(media: Dataset[MediaDoc], stride: Int): Dataset[GifFrame] = {
    require(stride >= 1, s"stride must be >= 1, got $stride")
    media.mapPartitions { docs =>
      lazy val reader = javax.imageio.ImageIO
        .getImageReadersByFormatName("gif").next()
      docs.flatMap { m =>
        val iis = javax.imageio.ImageIO.createImageInputStream(
          new java.io.ByteArrayInputStream(m.payload))
        reader.reset()
        reader.setInput(iis, false)
        val nf = reader.getNumImages(true)
        val outFrames = (0 until nf by stride).map { f =>
          val img = reader.read(f)
          GifFrame(m.doc_id, f, img.getWidth, img.getHeight,
            img.getRGB(0, 0) & 0xff)
        }
        iis.close()
        outFrames
      }
    }(Encoders.product[GifFrame])
  }

  /** Media dedup by payload signature — the thumbnail-hash shape every
    * image pipeline uses: hash the DOWNSAMPLED payload (pass this the
    * [[resizeStub]] output; a real pipeline hashes the decoded, resized
    * pixels the same way) so byte-identical-after-downsample media
    * collapse to one group. Output mirrors
    * [[graft.operators.Dedup.exact]]: (payload_sig, keeper_id = min id,
    * n_copies).
    *
    * Scale shape: the signature is computed at scan (one md5 per row,
    * no payload crosses the shuffle — only the 32-char signature), then
    * one hash-keyed aggregation with map-side combine; state per group
    * is a single (keeper, count) row. */
  def dedupBySignature(media: Dataset[MediaDoc]): DataFrame =
    media.toDF()
      .select(col("doc_id"), md5(col("payload")).as("payload_sig"))
      .groupBy(col("payload_sig"))
      .agg(min(col("doc_id")).as("keeper_id"), count(lit(1)).as("n_copies"))

  // ---- perceptual (decoded-pixel) image dedup ------------------------

  final case class MediaVariant(doc_id: Long, variant: Int,
                                payload: Array[Byte], format: String)
  final case class ImageHashes(doc_id: Long, variant: Int, ahash: Long,
                               dhash: Long, flat: Boolean, grid_sum: Int,
                               byte_sig: String)

  /** Plant, per input row, THREE byte-distinct encodings of the same
    * underlying image (the encodePng two-tone geometry — w = 1 + id%16,
    * h = 1 + id%8, left red a = id%128, right red b = (7*id+3)%128; both
    * < 128 so a +1 brightness shift can never clamp):
    *   variant 0 — the base PNG;
    *   variant 1 — the SAME pixels re-encoded as BMP (different
    *     container, byte-identical pixels);
    *   variant 2 — a PNG with every red value +1 (a brightness shift:
    *     different pixels AND different bytes).
    * Byte-signature dedup ([[dedupBySignature]], ext49) sees three
    * distinct payloads; a perceptual hash over DECODED pixels must
    * collapse all three ([[perceptualHashes]]). Executor-side encode,
    * O(image) memory per row. */
  def encodePngVariants(docs: DataFrame, idCol: String): Dataset[MediaVariant] =
    docs.select(col(idCol).cast("long").as("doc_id"))
      .as(Encoders.product[Tuple1[Long]])
      .mapPartitions { rows =>
        rows.flatMap { case Tuple1(id) =>
          val w = 1 + java.lang.Math.floorMod(id, 16L).toInt
          val h = 1 + java.lang.Math.floorMod(id, 8L).toInt
          val a = java.lang.Math.floorMod(id, 128L).toInt
          val b = java.lang.Math.floorMod(id * 7 + 3, 128L).toInt
          val base = renderTwoTone(w, h, a, b, 0)
          Seq(
            MediaVariant(id, 0, encodeImage(base, "png"), "image/png"),
            MediaVariant(id, 1, encodeImage(base, "bmp"), "image/bmp"),
            MediaVariant(id, 2, encodeImage(renderTwoTone(w, h, a, b, 1), "png"),
              "image/png"))
        }
      }(Encoders.product[MediaVariant])

  /** Average-hash (aHash, 8×8) and difference-hash (dHash, 9×8) over
    * DECODED pixels — the perceptual signatures that collapse
    * re-encodings and global brightness shifts where a byte hash cannot.
    * Since r8, grid values are AREA-AVERAGED INTEGER LUMA, not
    * nearest-neighbor red samples (the r7 verdict task: real
    * re-encodings — JPEG recompression, chroma subsampling — perturb
    * single samples and flip bits; a cell average integrates the
    * perturbation away, and luma is exactly the Y channel JPEG
    * preserves at full resolution):
    *   - each grid cell covers pixel range [i·w/gw, max(i·w/gw + 1,
    *     (i+1)·w/gw)) × the analogous rows (the max keeps every cell
    *     non-empty on images narrower than the grid), and its value is
    *     the FLOOR MEAN of per-pixel "milliluma" 299·R + 587·G + 114·B
    *     — all-integer, so the value is exact and replayable in any
    *     engine (the st32 oracle recomputes it in SQL). Milliluma is
    *     deliberately NOT divided by 1000: the flat-tone key below
    *     would lose the one-level brightness resolution it exists for;
    *   - the aHash bit is the integer-exact `v*64 > sum` (v > mean
    *     without a rational divide). A +1-brightness shift adds exactly
    *     299 (red-only) / 1000 (gray) per pixel, hence exactly that per
    *     cell floor-mean ((S + cN)/N = S/N + c for integer division),
    *     so sum shifts by 64× that and NO bit flips;
    *   - the dHash bit `g[x] > g[x+1]` compares neighbor cells on a 9×8
    *     grid — shift-invariant the same way.
    * Emits the md5 byte signature alongside, so one frame holds both
    * worlds (ext87 pins n_phash=1 vs n_bytesig=3 per planted group),
    * plus a FLAT flag (all 64 cells equal) with the exact grid sum: a
    * uniform-color image has ahash = dhash = 0 REGARDLESS of its color,
    * so the hash bits carry zero evidence for it — [[dedupPerceptual]]
    * uses (flat, grid_sum) to keep texture-free images apart by exact
    * tone. JPEG-robustness is pinned end-to-end by ext94/st34 over
    * [[encodeJpegVariants]] (this hash collapses a real JPEG re-encode
    * that the retained [[nearestSampleHashes]] provably does not).
    *
    * Scale shape: identical to [[decodeImages]] — partition-streaming
    * decode, O(image) memory; the cell pass is one sweep over the
    * decoded raster; only (id, hashes, 32-char sig) cross the shuffle
    * that follows. */
  def perceptualHashes(media: Dataset[MediaVariant]): Dataset[ImageHashes] =
    media.mapPartitions { docs =>
      val md = java.security.MessageDigest.getInstance("MD5")
      docs.map { m =>
        val img = javax.imageio.ImageIO.read(
          new java.io.ByteArrayInputStream(m.payload))
        require(img != null, s"doc ${m.doc_id}/${m.variant}: not a decodable image")
        val w = img.getWidth; val h = img.getHeight
        def milli(x: Int, y: Int): Long = {
          val rgb = img.getRGB(x, y)
          299L * ((rgb >> 16) & 0xff) + 587L * ((rgb >> 8) & 0xff) + 114L * (rgb & 0xff)
        }
        // floor-mean milliluma over the (i, j) cell of a gw x 8 grid
        def cell(i: Int, j: Int, gw: Int): Long = {
          val x0 = i * w / gw; val x1 = math.max(x0 + 1, (i + 1) * w / gw)
          val y0 = j * h / 8;  val y1 = math.max(y0 + 1, (j + 1) * h / 8)
          var s = 0L; var n = 0
          var y = y0
          while (y < y1) {
            var x = x0
            while (x < x1) { s += milli(x, y); n += 1; x += 1 }
            y += 1
          }
          s / n
        }
        // aHash: 8x8 area-mean grid, bit = v*64 > sum
        val grid = Array.tabulate(64)(i => cell(i % 8, i / 8, 8))
        val sum = grid.sum
        var ah = 0L
        var i = 0
        while (i < 64) {
          if (grid(i) * 64 > sum) ah |= (1L << i)
          i += 1
        }
        // dHash: 9x8 grid, bit = g[x] > g[x+1] per row — each row's nine
        // cells computed ONCE (interior cells are both a left and a
        // right operand; recomputing them would re-sweep the raster)
        var dh = 0L
        var y = 0
        while (y < 8) {
          val row9 = Array.tabulate(9)(x => cell(x, y, 9))
          var x = 0
          while (x < 8) {
            if (row9(x) > row9(x + 1)) dh |= (1L << (y * 8 + x))
            x += 1
          }
          y += 1
        }
        md.reset()
        val sig = md.digest(m.payload).map("%02x".format(_)).mkString
        val flat = grid.forall(_ == grid(0))
        ImageHashes(m.doc_id, m.variant, ah, dh, flat, sum.toInt, sig)
      }
    }(Encoders.product[ImageHashes])

  /** The PRE-r8 grid sampling — nearest-neighbor RED at `(i·w/8, j·h/8)`
    * — retained as the measured CONTRAST for the area-average upgrade,
    * not as a production path: ext94/st34 pin that a real JPEG
    * re-encode splits under this sampling (single perturbed samples
    * flip bits) while [[perceptualHashes]] collapses it. Same bit rules
    * (`v*64 > sum`, neighbor gradient), same output schema. */
  def nearestSampleHashes(media: Dataset[MediaVariant]): Dataset[ImageHashes] =
    media.mapPartitions { docs =>
      val md = java.security.MessageDigest.getInstance("MD5")
      docs.map { m =>
        val img = javax.imageio.ImageIO.read(
          new java.io.ByteArrayInputStream(m.payload))
        require(img != null, s"doc ${m.doc_id}/${m.variant}: not a decodable image")
        val w = img.getWidth; val h = img.getHeight
        def red(x: Int, y: Int, gw: Int): Int =
          (img.getRGB(x * w / gw, y * h / 8) >> 16) & 0xff
        val grid = Array.tabulate(64)(i => red(i % 8, i / 8, 8))
        val sum = grid.sum
        var ah = 0L
        var i = 0
        while (i < 64) {
          if (grid(i).toLong * 64 > sum) ah |= (1L << i)
          i += 1
        }
        var dh = 0L
        var y = 0
        while (y < 8) {
          var x = 0
          while (x < 8) {
            if (red(x, y, 9) > red(x + 1, y, 9)) dh |= (1L << (y * 8 + x))
            x += 1
          }
          y += 1
        }
        md.reset()
        val sig = md.digest(m.payload).map("%02x".format(_)).mkString
        ImageHashes(m.doc_id, m.variant, ah, dh, grid.forall(_ == grid(0)), sum, sig)
      }
    }(Encoders.product[ImageHashes])

  /** Plant, per input row, FOUR encodings probing JPEG re-encode
    * robustness (ext94/st34): a 64×64 GRAY dithered two-tone whose
    * construction makes the area-average hash provably stable and the
    * nearest-sample hash provably fragile under JPEG:
    *   - tones a = 104 + id%16 (left half) and b = a + 32 (right), GRAY
    *     pixels (R = G = B), so milliluma = 1000·v exactly and JPEG's
    *     chroma subsampling has nothing to distort;
    *   - a ±24 checkerboard dither with parity (x + y + x/8 + y/8):
    *     every 8×8 grid cell holds a 32/32 phase split (the +x/8 + y/8
    *     term re-phases per cell), so cell floor-means are EXACTLY a or
    *     b — dither-free — while the 8-strided sample points (8i, 8j)
    *     the nearest hash reads alternate phase cell-to-cell and sit
    *     a±24 / b±24, i.e. on BOTH sides of the global mean a+16;
    *   - variants: 0 base PNG, 1 same-pixels BMP, 2 all-channels +1
    *     PNG, 3 the base re-encoded as JPEG q0.75. The JPEG block grid
    *     aligns with the 8×8 cells: each block is a flat tone plus the
    *     highest-frequency dither the quantizer decimates, so decoded
    *     cell means stay within a few milliluma-thousandths of a / b
    *     (bits 16-separated → stable), while decoded SAMPLES lose the
    *     ±24 dither and cross the mean — the nearest hash flips.
    * Validated exhaustively over the fixture id range (501/501 docs:
    * area hash collapses all four, nearest hash splits the JPEG).
    * Executor-side encode, O(image) memory per row. */
  def encodeJpegVariants(docs: DataFrame, idCol: String): Dataset[MediaVariant] =
    docs.select(col(idCol).cast("long").as("doc_id"))
      .as(Encoders.product[Tuple1[Long]])
      .mapPartitions { rows =>
        rows.map(t => t._1).flatMap { id =>
          def dithered(shift: Int): java.awt.image.BufferedImage = {
            val a = 104 + java.lang.Math.floorMod(id, 16L).toInt
            val b = a + 32
            val img = new java.awt.image.BufferedImage(
              64, 64, java.awt.image.BufferedImage.TYPE_INT_RGB)
            var y = 0
            while (y < 64) {
              var x = 0
              while (x < 64) {
                val d = if ((x + y + x / 8 + y / 8) % 2 == 0) 24 else -24
                val v = (if (x < 32) a else b) + d + shift
                img.setRGB(x, y, (v << 16) | (v << 8) | v)
                x += 1
              }
              y += 1
            }
            img
          }
          val base = dithered(0)
          Seq(
            MediaVariant(id, 0, encodeImage(base, "png"), "image/png"),
            MediaVariant(id, 1, encodeImage(base, "bmp"), "image/bmp"),
            MediaVariant(id, 2, encodeImage(dithered(1), "png"), "image/png"),
            MediaVariant(id, 3, encodeJpeg(base, 0.75f), "image/jpeg"))
        }
      }(Encoders.product[MediaVariant])

  private def encodeJpeg(img: java.awt.image.BufferedImage,
                         quality: Float): Array[Byte] = {
    val writer = javax.imageio.ImageIO.getImageWritersByFormatName("jpg").next()
    val param = writer.getDefaultWriteParam
    param.setCompressionMode(javax.imageio.ImageWriteParam.MODE_EXPLICIT)
    param.setCompressionQuality(quality)
    val out = new java.io.ByteArrayOutputStream()
    val ios = javax.imageio.ImageIO.createImageOutputStream(out)
    writer.setOutput(ios)
    writer.write(null, new javax.imageio.IIOImage(img, null, null), param)
    ios.close()
    writer.dispose()
    out.toByteArray
  }

  /** Perceptual dedup over decoded pixels — [[dedupBySignature]]'s
    * group-keep shape keyed on the perceptual signature instead of the
    * byte md5, closing the gap that two re-encodings of the same image
    * never collapsed: (ahash, keeper = min id, n_copies).
    *
    * The group key is (ahash, dhash) PLUS, for FLAT images only, the
    * exact grid sum: every uniform-color image hashes to
    * ahash = dhash = 0 whatever its color, so keying on the hashes
    * alone would merge a dark tile with a bright one (visually distinct
    * images with zero texture evidence). Flat images therefore dedup by
    * exact tone — re-encodings of the same flat tile still collapse
    * (identical pixels ⇒ identical sum), while a brightness-shifted
    * flat tile deliberately does NOT (with no texture there is no
    * evidence it is the same image rather than any other solid color).
    *
    * Same scale story: hash at scan, only (hashes, id) shuffle, one
    * map-side-combined aggregation. */
  def dedupPerceptual(media: Dataset[MediaVariant]): DataFrame =
    perceptualHashes(media).toDF()
      .withColumn("flat_sum",
        when(col("flat"), col("grid_sum").cast("long")).otherwise(lit(-1L)))
      .groupBy(col("ahash"), col("dhash"), col("flat_sum"))
      .agg(min(col("doc_id")).as("keeper_id"), count(lit(1)).as("n_copies"))

  /** Per-source rollup of the extracted features (the typical "did every
    * shard decode" pipeline health query). */
  def featuresBySource(docs: DataFrame, idCol: String, textCol: String,
                       sourceCol: String): DataFrame =
    decodeStub(toMedia(docs, idCol, textCol, sourceCol))
      .groupBy(col("source"))
      .agg(count(lit(1)).as("n_docs"),
        sum(col("n_bytes")).as("total_bytes"),
        sum(col("byte_sum")).as("total_byte_sum"))
}
