package graft.operators

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkTestSession
import graft.core.MediaCore

class MultimodalSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  import spark.implicits._

  lazy val docs = spark.read.parquet(s"${SparkTestSession.sf0001}/documents.parquet")

  test("synthesized media has the contract schema") {
    val m = Multimodal.synthesizeMedia(docs)
    assert(m.schema("payload").dataType.typeName == "binary")
    assert(m.schema("meta").dataType.typeName == "struct")
    val kinds = m.select("kind").distinct().collect().map(_.getString(0)).toSet
    assert(kinds == Set("image", "audio", "video"))
  }

  test("feature histogram sums to 1 and matches the core kernel") {
    val m = Multimodal.synthesizeMedia(docs)
    val rows = m.select($"payload", Multimodal.media_features($"payload").as("f")).limit(20).collect()
    rows.foreach { r =>
      val f = r.getSeq[Double](1)
      assert(math.abs(f.sum - 1.0) < 1e-9)
      assert(f == MediaCore.byteHistogram(r.getAs[Array[Byte]](0)).toSeq)
    }
  }

  test("frame checksums cover the payload in order") {
    val payload = "abcdefgh".getBytes("UTF-8")
    val fps = MediaCore.frameChecksums(payload, 4)
    assert(fps.length == 4)
    assert(fps(0) == ('a' + 'b') % 65521)
    assert(fps(3) == ('g' + 'h') % 65521)
    // empty payload: all frames empty, checksum 0
    assert(MediaCore.frameChecksums(Array.emptyByteArray, 4).forall(_ == 0L))
  }

  test("nearest-neighbor resize samples the expected grid positions") {
    // 4x4 source 0..15, downsample to 2x2: picks (0,0) (0,2) (2,0) (2,2)
    val src = Array.tabulate(16)(_.toByte)
    assert(MediaCore.resizeNearest(src, 4, 4, 2, 2).toSeq == Seq[Byte](0, 2, 8, 10))
    // upsample 2x2 -> 4x4 repeats each pixel in 2x2 blocks
    val up = MediaCore.resizeNearest(Array[Byte](1, 2, 3, 4), 2, 2, 4, 4)
    assert(up.toSeq == Seq[Byte](1, 1, 2, 2, 1, 1, 2, 2, 3, 3, 4, 4, 3, 3, 4, 4))
    // positions past the payload end read as 0 (short synthetic payloads)
    val short = MediaCore.resizeNearest(Array[Byte](9), 4, 4, 2, 2)
    assert(short.toSeq == Seq[Byte](9, 0, 0, 0))
    // expression path agrees with the kernel
    val viaExpr = Multimodal.synthesizeMedia(docs)
      .select($"doc_id", Multimodal.media_resize($"payload", 64, 64, 8, 8).as("r"),
        $"payload")
      .collect()
    viaExpr.foreach { r =>
      val want = MediaCore.resizeNearest(r.getAs[Array[Byte]]("payload"), 64, 64, 8, 8)
      assert(r.getAs[Array[Byte]]("r").toSeq == want.toSeq)
    }
  }

  test("aHash: bit rule matches the kernel; identical payloads collide") {
    val bytes = "the quick brown fox jumps over the lazy dog " * 40
    val sig = MediaCore.aHash64(bytes.getBytes("UTF-8"), 64, 64)
    val grid = MediaCore.resizeNearest(bytes.getBytes("UTF-8"), 64, 64, 8, 8)
    val sum = grid.map(_ & 0xff).map(_.toLong).sum
    (0 until 64).foreach { i =>
      val bit = ((sig >>> i) & 1L) == 1L
      assert(bit == ((grid(i) & 0xff).toLong * 64L > sum), s"bit $i")
    }
    assert(MediaCore.aHash64(bytes.getBytes("UTF-8"), 64, 64) == sig)
  }

  test("perceptual near-dups match a brute-force pair scan") {
    val media = Multimodal.synthesizeMedia(docs).where($"kind" === "image")
    val banded = Multimodal.perceptualNearDups(media, maxHamming = 3)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val sigs = media.select($"doc_id", Multimodal.ahash64($"payload", 64, 64).as("sig"))
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    val brute = (for {
      (i, si) <- sigs; (j, sj) <- sigs
      if i < j && java.lang.Long.bitCount(si ^ sj) <= 3
    } yield (i, j)).toSet
    assert(banded == brute, "4x16 banding must have perfect recall at hamming <= 3")
  }

  test("PNG round-trip: the JDK codec reproduces the pattern pixels exactly") {
    Seq(0L, 1L, 7L, 250L, 251L, 123456789L, -3L).foreach { id =>
      val png = MediaCore.encodePatternPng(id)
      // genuinely PNG: magic bytes present, and bigger than the raw
      // pixels' entropy floor would be if this were a fake passthrough
      assert((png(0) & 0xff) == 0x89 && png(1) == 'P' && png(2) == 'N' && png(3) == 'G')
      val st = MediaCore.pngStats(png)
      assert(st(0) == MediaCore.PatW && st(1) == MediaCore.PatH)
      // decode → resize → hash must equal the stub kernel applied
      // directly to the pattern pixels (the codec is the only new step)
      val direct = MediaCore.aHash64(MediaCore.patternGray(id), MediaCore.PatW, MediaCore.PatH)
      assert(st(3) == direct, s"id=$id: decoded hash ${st(3)} != direct $direct")
    }
  }

  test("variant twins are near-duplicates; distinct docs are not trivially close") {
    val hams = (0L until 20L).map { d =>
      val s0 = MediaCore.pngStats(MediaCore.encodePatternPng(d * 2))(3)
      val s1 = MediaCore.pngStats(MediaCore.encodePatternPng(d * 2 + 1))(3)
      java.lang.Long.bitCount(s0 ^ s1)
    }
    // one perturbed pixel: the bumped cell plus the few cells the
    // shifted mean re-classifies — always a small Hamming distance
    assert(hams.forall(_ <= 10), hams.mkString(","))
    assert(hams.exists(_ <= 3), hams.mkString(","))
  }

  test("png_stats rejects non-image payloads loudly") {
    intercept[Exception] {
      MediaCore.pngStats("definitely not a png".getBytes("UTF-8"))
    }
  }

  test("RGB round-trip: per-channel grid sums and luma hash match the pattern formula") {
    Seq(0L, 1L, 7L, 250L, 251L, 123456789L, -3L).foreach { id =>
      val png = MediaCore.encodePatternRgbPng(id)
      assert((png(0) & 0xff) == 0x89 && png(1) == 'P' && png(2) == 'N' && png(3) == 'G')
      val st = MediaCore.pngRgbStats(png)
      assert(st(0) == MediaCore.PatW && st(1) == MediaCore.PatH)
      // formula-side recompute: grid cell t samples (3·(t%8), 2·(t//8))
      val chans = MediaCore.patternRgb(id)
      def cell(c: Int, t: Int): Int =
        chans(c)((t / 8 * 2) * MediaCore.PatW + (t % 8) * 3) & 0xff
      for (c <- 0 until 3)
        assert(st(2 + c) == (0 until 64).map(cell(c, _)).sum.toLong,
          s"id=$id channel $c grid sum")
      val lumas = (0 until 64).map(t =>
        (299 * cell(0, t) + 587 * cell(1, t) + 114 * cell(2, t)) / 1000)
      val lsum = lumas.sum
      val wantSig = (0 until 64).foldLeft(0L) { (acc, t) =>
        if (lumas(t).toLong * 64L > lsum) acc | (1L << t) else acc
      }
      assert(st(5) == wantSig, s"id=$id luma hash")
    }
  }

  test("png_rgb_stats rejects grayscale payloads loudly (band mismatch)") {
    val gray = MediaCore.encodePatternPng(4L)
    val e = intercept[Exception] { MediaCore.pngRgbStats(gray) }
    assert(e.getMessage.contains("band"), e.getMessage)
    // and the gray kernel likewise refuses the RGB payload — the two
    // boundaries stay loud in both directions
    val rgb = MediaCore.encodePatternRgbPng(4L)
    intercept[Exception] { MediaCore.pngStats(rgb) }
  }

  test("palette round-trip: index expansion through the PLTE matches the formulas") {
    Seq(0L, 1L, 7L, 250L, 251L, 123456789L, -3L).foreach { id =>
      val png = MediaCore.encodePatternPalettePng(id)
      assert((png(0) & 0xff) == 0x89 && png(1) == 'P' && png(2) == 'N' && png(3) == 'G')
      // genuinely colour type 3 (palette) — byte 25 of the IHDR
      assert((png(25) & 0xff) == 3, s"id=$id: colour type ${png(25) & 0xff}")
      val st = MediaCore.pngPaletteStats(png)
      assert(st(0) == MediaCore.PatW && st(1) == MediaCore.PatH)
      assert(st(2) == MediaCore.PaletteSize.toLong)
      // formula-side recompute: grid cell t samples index pattern at
      // (3·(t%8), 2·(t//8)), channels via the palette formulas
      val idxPlane = MediaCore.patternGray(id)
      def idx(t: Int): Int = idxPlane((t / 8 * 2) * MediaCore.PatW + (t % 8) * 3) & 0xff
      val chans: Seq[Int => Int] =
        Seq(MediaCore.paletteR _, MediaCore.paletteG _, MediaCore.paletteB _)
      for (c <- 0 until 3)
        assert(st(3 + c) == (0 until 64).map(t => chans(c)(idx(t))).sum.toLong,
          s"id=$id channel $c grid sum")
      val lumas = (0 until 64).map { t =>
        val i = idx(t)
        (299 * MediaCore.paletteR(i) + 587 * MediaCore.paletteG(i) +
          114 * MediaCore.paletteB(i)) / 1000
      }
      val lsum = lumas.sum
      val wantSig = (0 until 64).foldLeft(0L) { (acc, t) =>
        if (lumas(t).toLong * 64L > lsum) acc | (1L << t) else acc
      }
      assert(st(6) == wantSig, s"id=$id luma hash")
    }
  }

  test("png_palette_stats rejects gray and RGB payloads loudly (no silent index pass-through)") {
    val e1 = intercept[Exception] { MediaCore.pngPaletteStats(MediaCore.encodePatternPng(4L)) }
    assert(e1.getMessage.contains("palette") || e1.getMessage.contains("indexed"), e1.getMessage)
    val e2 = intercept[Exception] { MediaCore.pngPaletteStats(MediaCore.encodePatternRgbPng(4L)) }
    assert(e2.getMessage.contains("palette") || e2.getMessage.contains("indexed"), e2.getMessage)
    // and the gray/RGB kernels refuse the palette payload in return
    val pal = MediaCore.encodePatternPalettePng(4L)
    intercept[Exception] { MediaCore.pngStats(pal) }
    intercept[Exception] { MediaCore.pngRgbStats(pal) }
  }

  test("RGB variant twins stay luminance near-duplicates") {
    val hams = (0L until 20L).map { d =>
      val s0 = MediaCore.pngRgbStats(MediaCore.encodePatternRgbPng(d * 2))(5)
      val s1 = MediaCore.pngRgbStats(MediaCore.encodePatternRgbPng(d * 2 + 1))(5)
      java.lang.Long.bitCount(s0 ^ s1)
    }
    assert(hams.forall(_ <= 10), hams.mkString(","))
    assert(hams.exists(_ <= 3), hams.mkString(","))
  }

  test("batched mapPartitions decode agrees with the expression path") {
    val m = Multimodal.synthesizeMedia(docs)
    val viaExpr = m.select($"doc_id", element_at(Multimodal.media_features($"payload"), 1).as("f0"))
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    val viaBatch = Multimodal.decodeBatched(m, batchSize = 7)
      .select($"doc_id", $"f0").collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    assert(viaBatch == viaExpr)
  }

  test("WAV round-trip: decoded features match the waveform formula exactly") {
    Seq(0L, 1L, 6L, 7L, 129L, 4000L, 123456789L).foreach { id =>
      val wav = MediaCore.encodePatternWav(id)
      // a real RIFF container, not bare PCM
      assert(wav(0) == 'R' && wav(1) == 'I' && wav(2) == 'F' && wav(3) == 'F')
      val st = MediaCore.wavStats(wav)
      val pcm = MediaCore.patternPcm(id)
      assert(st(0) == pcm.length && st(1) == MediaCore.WavRate)
      assert(st(2) == pcm.map(v => math.abs(v.toLong)).max)
      assert(st(3) == pcm.map(v => math.abs(v.toLong)).sum)
      assert(st(4) == pcm.map(v => v.toLong * v).sum)
      val zc = pcm.toSeq.sliding(2).count { case Seq(a, b) => (a < 0) != (b < 0) }
      assert(st(5) == zc, s"id=$id zero crossings ${st(5)} != $zc")
    }
  }

  test("wav_stats rejects non-WAV and non-16-bit-mono payloads loudly") {
    intercept[Exception] {
      MediaCore.wavStats("definitely not a wav".getBytes("UTF-8"))
    }
    // a PNG is not an audio stream either
    intercept[Exception] {
      MediaCore.wavStats(MediaCore.encodePatternPng(1L))
    }
    // stereo 16-bit: container valid, shape contract violated
    def wavOf(fmt: javax.sound.sampled.AudioFormat, frames: Int): Array[Byte] = {
      val bytes = new Array[Byte](frames * fmt.getFrameSize)
      val ais = new javax.sound.sampled.AudioInputStream(
        new java.io.ByteArrayInputStream(bytes), fmt, frames.toLong)
      val bos = new java.io.ByteArrayOutputStream()
      javax.sound.sampled.AudioSystem.write(
        ais, javax.sound.sampled.AudioFileFormat.Type.WAVE, bos)
      bos.toByteArray
    }
    val stereo = intercept[IllegalArgumentException] {
      MediaCore.wavStats(wavOf(
        new javax.sound.sampled.AudioFormat(8000f, 16, 2, true, false), 16))
    }
    assert(stereo.getMessage.contains("channel"), stereo.getMessage)
    // 8-bit WAV is canonically UNSIGNED in the container, so the JDK
    // round-trips it as PCM_UNSIGNED and the encoding check fires first
    val eightBit = intercept[IllegalArgumentException] {
      MediaCore.wavStats(wavOf(
        new javax.sound.sampled.AudioFormat(8000f, 8, 1, true, false), 16))
    }
    assert(eightBit.getMessage.contains("PCM_SIGNED"), eightBit.getMessage)
  }

  /** The lossy-codec contract: every decoded 8×8-block sum lands within
    * the documented band of the pattern formula, AND at least one block
    * decodes inexactly — if the codec ever became bit-faithful on these
    * fixtures, the band would be vacuous and this spec flags it. */
  test("JPEG round-trip: block sums within the band; decode genuinely lossy") {
    var sawLoss = false
    (0L until 200L).foreach { id =>
      val jpg = MediaCore.encodePatternJpeg(id)
      assert((jpg(0) & 0xff) == 0xff && (jpg(1) & 0xff) == 0xd8, "missing SOI")
      val st = MediaCore.jpegBlockStats(jpg)
      assert(st(0) == MediaCore.PatW && st(1) == MediaCore.PatH)
      assert(st(2) == 3 && st(3) == 2)
      val pat = MediaCore.patternGray(id)
      for (by <- 0 until 2; bx <- 0 until 3) {
        var exp = 0L
        for (dy <- 0 until 8; dx <- 0 until 8)
          exp += pat((by * 8 + dy) * MediaCore.PatW + bx * 8 + dx) & 0xff
        val err = math.abs(st(4 + by * 3 + bx) - exp)
        assert(err <= MediaCore.JpegBlockSumTol,
          s"id=$id block ($bx,$by) err $err exceeds band ${MediaCore.JpegBlockSumTol}")
        if (err > 0) sawLoss = true
      }
    }
    assert(sawLoss,
      "JPEG decode was bit-exact on every fixture — the tolerance band is vacuous")
  }

  test("jpeg_block_stats rejects non-JPEG payloads loudly (no format sniffing)") {
    // ImageIO.read would happily sniff and decode a PNG; the SOI check
    // must refuse it before that can silently succeed
    val png = intercept[IllegalArgumentException] {
      MediaCore.jpegBlockStats(MediaCore.encodePatternPng(1L))
    }
    assert(png.getMessage.contains("SOI"), png.getMessage)
    intercept[Exception] {
      MediaCore.jpegBlockStats("not an image".getBytes("UTF-8"))
    }
  }
}
