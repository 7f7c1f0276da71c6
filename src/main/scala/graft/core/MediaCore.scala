package graft.core

/**
 * Byte-level "feature extraction" kernels for the multimodal pipeline.
 *
 * STUB BOUNDARY: real image/audio decoding (JPEG/PNG/WAV/frame
 * extraction) needs native codec libraries that are not in this
 * environment. These kernels implement the *pipeline contract* — opaque
 * binary in, fixed-width feature vector / per-frame values out,
 * deterministic, allocation-bounded — over raw bytes instead of decoded
 * pixels/samples. Swapping in a real decoder changes only the body of
 * these functions; every Spark-side concern (schema, partitioning,
 * codegen, batch shape) is exercised for real.
 */
object MediaCore {

  /** Number of coarse byte-range buckets in the stub feature vector. */
  final val FeatureBuckets = 4

  /**
   * Fraction of payload bytes in each of 4 ranges: [0x20,0x40), [0x40,
   * 0x60), [0x60,0x80), everything else. (A real implementation would
   * return e.g. a pooled embedding of decoded content.)
   */
  def byteHistogram(bytes: Array[Byte]): Array[Double] = {
    val counts = new Array[Long](FeatureBuckets)
    var i = 0
    while (i < bytes.length) {
      val b = bytes(i) & 0xff
      val bucket =
        if (b >= 0x20 && b < 0x40) 0
        else if (b >= 0x40 && b < 0x60) 1
        else if (b >= 0x60 && b < 0x80) 2
        else 3
      counts(bucket) += 1
      i += 1
    }
    val n = if (bytes.length == 0) 1.0 else bytes.length.toDouble
    Array(counts(0) / n, counts(1) / n, counts(2) / n, counts(3) / n)
  }

  /**
   * Nearest-neighbor "resize": treat the payload as a row-major
   * `srcW`×`srcH` single-channel image (positions past the payload end
   * read as 0 — synthetic payloads aren't exactly w*h bytes) and sample
   * it down/up to `dstW`×`dstH`. Stands in for a real image resize: a
   * decoder would replace the byte indexing, the grid arithmetic is the
   * real thing.
   */
  def resizeNearest(bytes: Array[Byte], srcW: Int, srcH: Int,
                    dstW: Int, dstH: Int): Array[Byte] = {
    val out = new Array[Byte](dstW * dstH)
    var y = 0
    while (y < dstH) {
      val sy = y.toLong * srcH / dstH
      var x = 0
      while (x < dstW) {
        val sx = x.toLong * srcW / dstW
        val idx = sy * srcW + sx
        out(y * dstW + x) = if (idx < bytes.length) bytes(idx.toInt) else 0
        x += 1
      }
      y += 1
    }
    out
  }

  /**
   * Average-hash (aHash) perceptual signature: resize the payload-as-
   * image to an 8×8 grid ([[resizeNearest]] — the stub decode), then
   * one bit per cell, set iff the cell is strictly above the grid mean.
   * The mean compare is `v·64 > sum` in integer arithmetic — no
   * division, so an independent SQL recompute matches bit-for-bit.
   * A real pipeline computes the same 64-bit signature from decoded
   * luma; only the resize body changes at the stub boundary.
   */
  def aHash64(bytes: Array[Byte], srcW: Int, srcH: Int): Long =
    gridSumSig(bytes, srcW, srcH)._2

  /** ONE encoding of the 8×8 grid-sum + v·64 > sum threshold fold —
    * shared by the stub ([[aHash64]]) and real-codec ([[pngStats]])
    * paths, whose bit-for-bit oracle contracts must never drift. */
  private def gridSumSig(src: Array[Byte], w: Int, h: Int): (Long, Long) = {
    val g = resizeNearest(src, w, h, 8, 8)
    var sum = 0L
    var i = 0
    while (i < 64) { sum += (g(i) & 0xff); i += 1 }
    var sig = 0L
    i = 0
    while (i < 64) {
      if ((g(i) & 0xff).toLong * 64L > sum) sig |= (1L << i)
      i += 1
    }
    (sum, sig)
  }

  // ---------------------------------------------------------------------
  // REAL-CODEC PATH (the stub boundary's other side): the JDK ships an
  // actual PNG codec (javax.imageio — zlib inflate + scanline
  // unfiltering), so the m56 fixture set exercises genuine decode: a
  // deterministic gray pattern is PNG-ENCODED at ingest, stored as an
  // opaque binary column, and the query-side kernel PNG-DECODES it back
  // to pixels before hashing. The oracle recomputes the expected hash
  // from the pattern formula alone, so a decoder that didn't faithfully
  // reproduce the encoded pixels would hash-mismatch. The byte-level
  // stub kernels above remain the path for synthesized payloads.
  // ---------------------------------------------------------------------

  /** Fixture pattern dimensions (both divide 8 exactly, so the aHash
    * resize grid samples at (3x, 2y) with no rounding). */
  final val PatW = 24
  final val PatH = 16

  /** Deterministic gray pattern for fixture image `imgId` = doc_id·2 +
    * variant: v(x,y) = (floorMod(doc_id·31, 251) + 7x + 13y) mod 251,
    * with variant 1 additionally bumping the (0,0) pixel by 120 — a
    * one-pixel perturbation, so each doc's two variants are perceptual
    * near-duplicates (small aHash Hamming distance) while distinct docs
    * are not. All terms are non-negative before the final mod, so
    * DuckDB's truncated `%` recomputes the same values. */
  def patternGray(imgId: Long): Array[Byte] = {
    val docId = java.lang.Math.floorDiv(imgId, 2L)
    val variant = java.lang.Math.floorMod(imgId, 2L)
    val base = java.lang.Math.floorMod(docId * 31L, 251L)
    val out = new Array[Byte](PatW * PatH)
    var y = 0
    while (y < PatH) {
      var x = 0
      while (x < PatW) {
        val bump = if (x == 0 && y == 0) 120L * variant else 0L
        out(y * PatW + x) = ((base + x * 7L + y * 13L + bump) % 251L).toByte
        x += 1
      }
      y += 1
    }
    out
  }

  /** Real PNG encode of the imgId's fixture pattern (8-bit grayscale). */
  def encodePatternPng(id: Long): Array[Byte] = {
    val img = new java.awt.image.BufferedImage(
      PatW, PatH, java.awt.image.BufferedImage.TYPE_BYTE_GRAY)
    val g = patternGray(id)
    var y = 0
    while (y < PatH) {
      var x = 0
      while (x < PatW) {
        img.getRaster.setSample(x, y, 0, g(y * PatW + x) & 0xff)
        x += 1
      }
      y += 1
    }
    val bos = new java.io.ByteArrayOutputStream()
    // write returns FALSE (no throw) when no writer claims the format —
    // an empty fixture payload here would only surface as a misleading
    // decode failure queries later
    require(javax.imageio.ImageIO.write(img, "png", bos),
      "no PNG writer registered in this JVM")
    bos.toByteArray
  }

  /**
   * Real PNG decode → (width, height, 8x8-grid sum, aHash64). The
   * decoded raster's gray samples feed the SAME resize + average-hash
   * kernel as the stub path ([[aHash64]] body) — only the "bytes are
   * pixels" assumption is replaced by actual decoding. Throws on
   * undecodable payloads (a silent fallback would defeat the fixture's
   * purpose: proving the codec reproduced the encoded pixels).
   */
  def pngStats(png: Array[Byte]): Array[Long] = {
    // memory-cached image input: the default ImageIO.read(InputStream)
    // path spools through a temp FILE per call — disk I/O per row in a
    // scan expression, and a hard failure on a full/unwritable tmpdir
    // even though the payload is already in memory
    val iis = new javax.imageio.stream.MemoryCacheImageInputStream(
      new java.io.ByteArrayInputStream(png))
    // ImageIO.read(ImageInputStream) closes the stream itself in a
    // finally on BOTH the success and throw paths; only the
    // null-return path (no reader claimed the format) leaves it open.
    // The guarded close below covers that path — and swallows the
    // "closed" IOException the double-close raises on the others
    val img =
      try javax.imageio.ImageIO.read(iis)
      finally { try iis.close() catch { case _: java.io.IOException => () } }
    require(img != null, "payload is not a decodable image")
    val w = img.getWidth
    val h = img.getHeight
    // decoder-controlled dims: bound before allocating (a crafted
    // header would otherwise drive an overflow or a multi-GB per-row
    // allocation), and reject anything but 8-bit single-band gray —
    // silently truncating 16-bit or hashing only the red band would
    // surface as a distant oracle mismatch instead of failing here
    require(w > 0 && h > 0 && w.toLong * h <= (1L << 22),
      s"image dimensions out of bounds: ${w}x$h")
    // an indexed image also presents 1 band of 8-bit samples — but they
    // are palette INDICES, not gray values; hashing them here would be
    // a silent wrong answer, so route it to pngPaletteStats loudly
    require(!img.getColorModel.isInstanceOf[java.awt.image.IndexColorModel],
      "payload is an indexed (palette) image — use png_palette_stats")
    require(img.getRaster.getNumBands == 1 &&
        img.getColorModel.getComponentSize(0) == 8,
      s"expected 8-bit grayscale, got ${img.getRaster.getNumBands} band(s) " +
        s"of ${img.getColorModel.getComponentSize(0)} bits")
    val gray = new Array[Byte](w * h)
    val raster = img.getRaster
    var y = 0
    while (y < h) {
      var x = 0
      while (x < w) {
        gray(y * w + x) = raster.getSample(x, y, 0).toByte
        x += 1
      }
      y += 1
    }
    val (sum, sig) = gridSumSig(gray, w, h)
    Array(w.toLong, h.toLong, sum, sig)
  }

  // ---------------------------------------------------------------------
  // RGB extension of the real-codec boundary: 8-bit three-channel PNGs,
  // per-channel grid sums + an aHash over integer BT.601 luminance. The
  // gray path above is untouched (bit-stable); the two share the ONE
  // grid-sum/threshold kernel (gridSumSig).
  // ---------------------------------------------------------------------

  /** Per-channel terms of the RGB fixture pattern: channel c of pixel
    * (x,y) is `(base + add(c) + dx(c)·x + dy(c)·y + bump) mod 251` with
    * base = floorMod(doc_id·31, 251) and bump = 120·variant at (0,0) on
    * EVERY channel (so the two variants stay perceptual near-dups in
    * luminance). Red reuses the gray formula's coefficients exactly.
    * All terms are non-negative before the final mod — DuckDB's
    * truncated `%` recomputes the same values. */
  private val ChanAdd = Array(0L, 89L, 178L)
  private val ChanDx = Array(7L, 11L, 5L)
  private val ChanDy = Array(13L, 3L, 17L)

  /** Deterministic RGB pattern for fixture image `imgId` — three
    * row-major channel planes (r, g, b). */
  def patternRgb(imgId: Long): Array[Array[Byte]] = {
    val docId = java.lang.Math.floorDiv(imgId, 2L)
    val variant = java.lang.Math.floorMod(imgId, 2L)
    val base = java.lang.Math.floorMod(docId * 31L, 251L)
    val out = Array.ofDim[Byte](3, PatW * PatH)
    var c = 0
    while (c < 3) {
      var y = 0
      while (y < PatH) {
        var x = 0
        while (x < PatW) {
          val bump = if (x == 0 && y == 0) 120L * variant else 0L
          out(c)(y * PatW + x) =
            ((base + ChanAdd(c) + ChanDx(c) * x + ChanDy(c) * y + bump) % 251L).toByte
          x += 1
        }
        y += 1
      }
      c += 1
    }
    out
  }

  /** Real PNG encode of the imgId's RGB fixture pattern (8-bit/chan). */
  def encodePatternRgbPng(id: Long): Array[Byte] = {
    val img = new java.awt.image.BufferedImage(
      PatW, PatH, java.awt.image.BufferedImage.TYPE_3BYTE_BGR)
    val chans = patternRgb(id)
    var y = 0
    while (y < PatH) {
      var x = 0
      while (x < PatW) {
        var c = 0
        while (c < 3) {
          img.getRaster.setSample(x, y, c, chans(c)(y * PatW + x) & 0xff)
          c += 1
        }
        x += 1
      }
      y += 1
    }
    val bos = new java.io.ByteArrayOutputStream()
    require(javax.imageio.ImageIO.write(img, "png", bos),
      "no PNG writer registered in this JVM") // see encodePatternPng
    bos.toByteArray
  }

  /**
   * Real RGB PNG decode → (width, height, r/g/b 8x8-grid sums,
   * luminance aHash64). Per-channel grid sums reuse the shared
   * [[gridSumSig]] kernel; the perceptual hash is computed over
   * integer BT.601 luminance `(299r + 587g + 114b) / 1000` (truncating
   * division — exactly reproducible in SQL). Validation mirrors
   * [[pngStats]]: bounded decoder-controlled dimensions, and anything
   * but 8-bit three-band color is rejected loudly (silently hashing a
   * gray or 16-bit payload would surface as a distant oracle mismatch).
   */
  def pngRgbStats(png: Array[Byte]): Array[Long] = {
    val iis = new javax.imageio.stream.MemoryCacheImageInputStream(
      new java.io.ByteArrayInputStream(png)) // memory-cached: see pngStats
    val img =
      try javax.imageio.ImageIO.read(iis)
      finally { try iis.close() catch { case _: java.io.IOException => () } }
    require(img != null, "payload is not a decodable image")
    val w = img.getWidth
    val h = img.getHeight
    require(w > 0 && h > 0 && w.toLong * h <= (1L << 22),
      s"image dimensions out of bounds: ${w}x$h")
    val raster = img.getRaster
    require(raster.getNumBands == 3 &&
        (0 until 3).forall(img.getColorModel.getComponentSize(_) == 8),
      s"expected 8-bit RGB, got ${raster.getNumBands} band(s)")
    val r = new Array[Byte](w * h)
    val g = new Array[Byte](w * h)
    val b = new Array[Byte](w * h)
    val luma = new Array[Byte](w * h)
    var y = 0
    while (y < h) {
      var x = 0
      while (x < w) {
        val i = y * w + x
        val rv = raster.getSample(x, y, 0)
        val gv = raster.getSample(x, y, 1)
        val bv = raster.getSample(x, y, 2)
        r(i) = rv.toByte; g(i) = gv.toByte; b(i) = bv.toByte
        luma(i) = ((299 * rv + 587 * gv + 114 * bv) / 1000).toByte
        x += 1
      }
      y += 1
    }
    Array(w.toLong, h.toLong,
      gridSumSig(r, w, h)._1, gridSumSig(g, w, h)._1, gridSumSig(b, w, h)._1,
      gridSumSig(luma, w, h)._2)
  }

  // ---------------------------------------------------------------------
  // PALETTE (indexed-colour) extension of the real-codec boundary: PNG
  // colour type 3 — pixels are 8-bit indices into a 256-entry PLTE
  // chunk. Decoding therefore has an extra step the gray/RGB paths do
  // not: expanding indices through the palette. A decoder that handed
  // raw indices back as gray values, or used a wrong/truncated palette,
  // produces different channel sums — and the oracle knows only the
  // index-pattern and palette formulas, so it would hash-mismatch.
  // The gray and RGB paths are untouched (bit-stable); all three share
  // the ONE grid-sum/threshold kernel (gridSumSig).
  // ---------------------------------------------------------------------

  /** Deterministic 256-entry fixture palette: entry i = ((73i+11)%256,
    * (101i+29)%256, (137i+43)%256). Multipliers are odd and coprime to
    * 256, so each channel permutes the byte range — every palette slot
    * is distinct and the mapping is trivially SQL-reproducible. */
  final val PaletteSize = 256
  def paletteR(i: Int): Int = (i * 73 + 11) % 256
  def paletteG(i: Int): Int = (i * 101 + 29) % 256
  def paletteB(i: Int): Int = (i * 137 + 43) % 256

  /** Real indexed-PNG encode: the imgId's gray fixture pattern REUSED
    * as the palette-index plane (values < 251 < 256, so every pixel is
    * a valid index), written as an actual colour-type-3 PNG with the
    * deterministic 256-entry palette. Verified: the JDK codec writes
    * the full PLTE and round-trips both indices and palette exactly. */
  def encodePatternPalettePng(id: Long): Array[Byte] = {
    val r = new Array[Byte](PaletteSize)
    val g = new Array[Byte](PaletteSize)
    val b = new Array[Byte](PaletteSize)
    var i = 0
    while (i < PaletteSize) {
      r(i) = paletteR(i).toByte; g(i) = paletteG(i).toByte; b(i) = paletteB(i).toByte
      i += 1
    }
    val cm = new java.awt.image.IndexColorModel(8, PaletteSize, r, g, b)
    val img = new java.awt.image.BufferedImage(
      PatW, PatH, java.awt.image.BufferedImage.TYPE_BYTE_INDEXED, cm)
    val idx = patternGray(id)
    var y = 0
    while (y < PatH) {
      var x = 0
      while (x < PatW) {
        img.getRaster.setSample(x, y, 0, idx(y * PatW + x) & 0xff)
        x += 1
      }
      y += 1
    }
    val bos = new java.io.ByteArrayOutputStream()
    require(javax.imageio.ImageIO.write(img, "png", bos),
      "no PNG writer registered in this JVM") // see encodePatternPng
    bos.toByteArray
  }

  /**
   * Real palette-PNG decode → (width, height, palette size, r/g/b
   * 8x8-grid sums, luminance aHash64). The decoder hands back 8-bit
   * palette INDICES plus an IndexColorModel; this kernel performs the
   * palette expansion itself (index → PLTE entry per channel), then
   * feeds the same per-channel grid sums + integer-BT.601 luminance
   * hash as [[pngRgbStats]]. Validation mirrors the other decode
   * kernels: bounded decoder-controlled dimensions, and anything but
   * an 8-bit single-band indexed image is rejected loudly.
   */
  def pngPaletteStats(png: Array[Byte]): Array[Long] = {
    val iis = new javax.imageio.stream.MemoryCacheImageInputStream(
      new java.io.ByteArrayInputStream(png)) // memory-cached: see pngStats
    val img =
      try javax.imageio.ImageIO.read(iis)
      finally { try iis.close() catch { case _: java.io.IOException => () } }
    require(img != null, "payload is not a decodable image")
    val w = img.getWidth
    val h = img.getHeight
    require(w > 0 && h > 0 && w.toLong * h <= (1L << 22),
      s"image dimensions out of bounds: ${w}x$h")
    val icm = img.getColorModel match {
      case m: java.awt.image.IndexColorModel if m.getPixelSize == 8 => m
      case m => throw new IllegalArgumentException(
        s"expected an 8-bit indexed (palette) image, got ${m.getClass.getSimpleName} " +
          s"with ${img.getRaster.getNumBands} band(s)")
    }
    require(img.getRaster.getNumBands == 1,
      s"expected 1 index band, got ${img.getRaster.getNumBands}")
    val raster = img.getRaster
    val mapSize = icm.getMapSize
    val r = new Array[Byte](w * h)
    val g = new Array[Byte](w * h)
    val b = new Array[Byte](w * h)
    val luma = new Array[Byte](w * h)
    var y = 0
    while (y < h) {
      var x = 0
      while (x < w) {
        val i = y * w + x
        val idx = raster.getSample(x, y, 0)
        // an 8-bit sample can legally exceed a short PLTE (the JDK
        // reader sizes the color model to the PLTE and does not
        // validate samples) — fail with a diagnosable message instead
        // of an out-of-context ArrayIndexOutOfBounds from getRed
        require(idx >= 0 && idx < mapSize,
          s"palette index $idx out of range (PLTE has $mapSize entries)")
        val rv = icm.getRed(idx)
        val gv = icm.getGreen(idx)
        val bv = icm.getBlue(idx)
        r(i) = rv.toByte; g(i) = gv.toByte; b(i) = bv.toByte
        luma(i) = ((299 * rv + 587 * gv + 114 * bv) / 1000).toByte
        x += 1
      }
      y += 1
    }
    Array(w.toLong, h.toLong, icm.getMapSize.toLong,
      gridSumSig(r, w, h)._1, gridSumSig(g, w, h)._1, gridSumSig(b, w, h)._1,
      gridSumSig(luma, w, h)._2)
  }

  // ---------------------------------------------------------------------
  // Audio extension of the real-codec boundary: RIFF/WAVE 16-bit PCM
  // through the JDK's ACTUAL audio codec (javax.sound.sampled — the
  // ImageIO analogue: AudioSystem.write builds the RIFF container,
  // getAudioInputStream walks its chunks and parses the fmt header).
  // The image paths above are untouched.
  // ---------------------------------------------------------------------

  /** Fixture sample rate (Hz). */
  val WavRate = 8000

  /** Deterministic 16-bit PCM fixture waveform for `audio_id`:
    * s(i) = ((base + 17·i) mod 4001) − 2000 with
    * base = floorMod(id·31, 4001), over n = 800 + (id mod 7)·160
    * samples — a full-range ±2000 sawtooth whose phase and length vary
    * by id, so peak/energy/zero-crossing features separate ids. All
    * terms are non-negative before the mod, so DuckDB's truncated `%`
    * recomputes the same values; every feature is exact integer
    * arithmetic (energy ≤ 1760·2000² ≈ 7·10⁹ — fits BIGINT). */
  def patternPcm(audioId: Long): Array[Short] = {
    val n = (800 + java.lang.Math.floorMod(audioId, 7L) * 160).toInt
    val base = java.lang.Math.floorMod(audioId * 31L, 4001L)
    val out = new Array[Short](n)
    var i = 0
    while (i < n) {
      out(i) = (((base + i * 17L) % 4001L) - 2000L).toShort
      i += 1
    }
    out
  }

  /** Real WAV encode of the id's fixture waveform: 16-bit little-endian
    * signed mono PCM at [[WavRate]], containerized by the JDK's RIFF
    * writer (AudioSystem.write). */
  def encodePatternWav(audioId: Long): Array[Byte] = {
    val pcm = patternPcm(audioId)
    val bytes = new Array[Byte](pcm.length * 2)
    var i = 0
    while (i < pcm.length) {
      bytes(2 * i) = (pcm(i) & 0xff).toByte
      bytes(2 * i + 1) = ((pcm(i) >> 8) & 0xff).toByte
      i += 1
    }
    val fmt = new javax.sound.sampled.AudioFormat(WavRate.toFloat, 16, 1, true, false)
    val ais = new javax.sound.sampled.AudioInputStream(
      new java.io.ByteArrayInputStream(bytes), fmt, pcm.length.toLong)
    val bos = new java.io.ByteArrayOutputStream()
    val written = javax.sound.sampled.AudioSystem.write(
      ais, javax.sound.sampled.AudioFileFormat.Type.WAVE, bos)
    require(written > 0, "no WAVE writer registered in this JVM")
    bos.toByteArray
  }

  /**
   * Real WAV decode → [n_samples, sample_rate, peak, sum_abs, energy,
   * zero_crossings]: the JDK audio codec walks the RIFF chunks and
   * parses the fmt header; the decoded little-endian PCM samples feed
   * exact integer features (peak |s|, Σ|s|, Σs², sign-change count with
   * 0 counted non-negative). Throws on undecodable or non-16-bit-mono-
   * PCM payloads — a silent fallback would defeat the fixture's purpose
   * (proving the codec reproduced the encoded samples), and truncating
   * 24-bit or averaging stereo here would surface as a distant oracle
   * mismatch instead of failing loudly.
   */
  def wavStats(wav: Array[Byte]): Array[Long] = {
    val ais =
      try javax.sound.sampled.AudioSystem.getAudioInputStream(
        new java.io.ByteArrayInputStream(wav))
      catch {
        case e: javax.sound.sampled.UnsupportedAudioFileException =>
          throw new IllegalArgumentException(
            "payload is not a decodable RIFF/WAVE stream", e)
      }
    try {
      val fmt = ais.getFormat
      require(fmt.getEncoding == javax.sound.sampled.AudioFormat.Encoding.PCM_SIGNED,
        s"expected PCM_SIGNED samples, got ${fmt.getEncoding}")
      require(fmt.getChannels == 1 && fmt.getSampleSizeInBits == 16 && !fmt.isBigEndian,
        s"expected 16-bit little-endian mono PCM, got ${fmt.getChannels} channel(s) " +
          s"of ${fmt.getSampleSizeInBits} bits" +
          (if (fmt.isBigEndian) " (big-endian)" else ""))
      // decoder-controlled length: bound before allocating (as pngStats
      // bounds decoder-controlled dimensions)
      val frames = ais.getFrameLength
      require(frames > 0 && frames <= (1L << 22), s"frame count out of bounds: $frames")
      val n = frames.toInt
      val data = ais.readNBytes(n * 2)
      require(data.length == n * 2,
        s"truncated PCM payload: ${data.length} of ${n * 2} bytes")
      var peak = 0L
      var sumAbs = 0L
      var energy = 0L
      var zc = 0L
      var prevNeg = false
      var i = 0
      while (i < n) {
        val v = ((data(2 * i) & 0xff) | (data(2 * i + 1) << 8)).toShort.toLong
        val a = math.abs(v)
        if (a > peak) peak = a
        sumAbs += a
        energy += v * v
        val neg = v < 0
        if (i > 0 && neg != prevNeg) zc += 1
        prevNeg = neg
        i += 1
      }
      Array(n.toLong, fmt.getSampleRate.toLong, peak, sumAbs, energy, zc)
    } finally ais.close()
  }

  // ---------------------------------------------------------------------
  // LOSSY extension of the real-codec boundary: baseline JPEG through
  // the JDK's actual DCT codec (com.sun.imageio JPEG plugin via
  // ImageIO). Unlike every PNG/WAV path above, decode is NOT
  // bit-faithful — quantized AC coefficients ring at the pattern's
  // mod-251 wrap edges (measured per-PIXEL error up to 34 levels) — so
  // the oracle contract changes shape: features are asserted within a
  // DOCUMENTED TOLERANCE BAND rather than recomputed exactly.
  //
  // Band: |decoded 8×8-block sample sum − pattern block sum| ≤
  // [[JpegBlockSumTol]] = 128 (an average of 2 gray levels per pixel).
  // Measured worst case over the full 200-image fixture set with the
  // JDK encoder at default quality: 56. The band is load-bearing —
  // MultimodalSpec pins BOTH that every block lands inside it AND that
  // at least one block decodes inexactly (if decode were exact, the
  // fixture would silently stop exercising the lossy boundary).
  // ---------------------------------------------------------------------

  /** Per-block tolerance on the 64-sample sum (see section comment). */
  final val JpegBlockSumTol = 128L

  /** Real baseline-JPEG encode of the imgId's gray fixture pattern
    * (the SAME [[patternGray]] plane the PNG fixtures encode — the
    * mod-251 sawtooth's wrap edges give the DCT genuine AC content,
    * so the codec is exercised in its lossy regime). Default encoder
    * quality; the band above was measured against exactly this call. */
  def encodePatternJpeg(id: Long): Array[Byte] = {
    val img = new java.awt.image.BufferedImage(
      PatW, PatH, java.awt.image.BufferedImage.TYPE_BYTE_GRAY)
    val g = patternGray(id)
    var y = 0
    while (y < PatH) {
      var x = 0
      while (x < PatW) {
        img.getRaster.setSample(x, y, 0, g(y * PatW + x) & 0xff)
        x += 1
      }
      y += 1
    }
    val bos = new java.io.ByteArrayOutputStream()
    require(javax.imageio.ImageIO.write(img, "jpg", bos),
      "no JPEG writer registered in this JVM") // see encodePatternPng
    bos.toByteArray
  }

  /**
   * Real JPEG decode → [width, height, blocks_x, blocks_y,
   * block-sum(0,0), block-sum(1,0), ...] — the exact integer sum of the
   * decoded samples of each full 8×8 block, row-major. Block sums (not
   * per-pixel values) are the right lossy-codec feature: the DC
   * coefficient dominates them, so they are stable within a small band
   * while individual pixels ring by dozens of levels. The caller
   * compares them against the pattern formula within
   * [[JpegBlockSumTol]]; this kernel itself never sees the expected
   * values. Validation mirrors [[pngStats]] — bounded
   * decoder-controlled dimensions, loud rejection of anything but
   * 8-bit single-band gray — plus a JPEG SOI-marker check up front:
   * ImageIO.read sniffs formats, so without it a PNG payload would
   * silently decode here and defeat the fixture's purpose.
   */
  def jpegBlockStats(jpeg: Array[Byte]): Array[Long] = {
    require(jpeg.length >= 2 && (jpeg(0) & 0xff) == 0xff && (jpeg(1) & 0xff) == 0xd8,
      "payload is not a JPEG stream (missing SOI marker)")
    val iis = new javax.imageio.stream.MemoryCacheImageInputStream(
      new java.io.ByteArrayInputStream(jpeg)) // memory-cached: see pngStats
    val img =
      try javax.imageio.ImageIO.read(iis)
      finally { try iis.close() catch { case _: java.io.IOException => () } }
    require(img != null, "payload is not a decodable image")
    val w = img.getWidth
    val h = img.getHeight
    require(w >= 8 && h >= 8 && w.toLong * h <= (1L << 22),
      s"image dimensions out of bounds: ${w}x$h")
    require(img.getRaster.getNumBands == 1 &&
        img.getColorModel.getComponentSize(0) == 8,
      s"expected 8-bit grayscale, got ${img.getRaster.getNumBands} band(s) " +
        s"of ${img.getColorModel.getComponentSize(0)} bits")
    val raster = img.getRaster
    val nbx = w / 8
    val nby = h / 8
    val out = new Array[Long](4 + nbx * nby)
    out(0) = w.toLong; out(1) = h.toLong; out(2) = nbx.toLong; out(3) = nby.toLong
    var by = 0
    while (by < nby) {
      var bx = 0
      while (bx < nbx) {
        var sum = 0L
        var y = by * 8
        while (y < by * 8 + 8) {
          var x = bx * 8
          while (x < bx * 8 + 8) { sum += raster.getSample(x, y, 0); x += 1 }
          y += 1
        }
        out(4 + by * nbx + bx) = sum
        bx += 1
      }
      by += 1
    }
    out
  }

  /**
   * Per-frame checksums: split the payload into `nFrames` contiguous
   * chunks (boundaries `k*len/nFrames`, integer division) and Adler-style
   * checksum each (sum of bytes mod 65521). Stands in for frame-sampled
   * video features.
   */
  def frameChecksums(bytes: Array[Byte], nFrames: Int): Array[Long] = {
    val out = new Array[Long](nFrames)
    val n = bytes.length
    var k = 0
    while (k < nFrames) {
      val start = k.toLong * n / nFrames
      val end = (k + 1).toLong * n / nFrames
      var h = 0L
      var i = start.toInt
      while (i < end) { h += (bytes(i) & 0xff); i += 1 }
      out(k) = h % 65521
      k += 1
    }
    out
  }
}
