package graft.operators

import org.apache.spark.sql.{Column, DataFrame, Dataset}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpectsInputTypes, UnaryExpression}
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.functions._
import org.apache.spark.sql.graft.Bridge
import org.apache.spark.sql.types._

import graft.core.MediaCore

/**
 * Multimodal-column plumbing: image/audio/video as opaque `binary`
 * payloads plus typed metadata, with decode/feature-extract implemented
 * against the [[MediaCore]] stub kernels (see its scaladoc for the STUB
 * boundary — codecs aren't available here; the Spark-side schema,
 * expressions, partitioning and batch shape are real).
 *
 * Two execution paths, both provided on purpose:
 *  - native Catalyst expressions ([[MediaFeatures]], [[FrameChecksums]])
 *    — scan-fused, the 100 TB path;
 *  - a `mapPartitions` batch path ([[decodeBatched]]) demonstrating the
 *    vectorized-UDF shape (iterator of batches in, iterator out) that a
 *    real codec (or an external model server) would plug into.
 */
object Multimodal {

  /** media row: (doc_id, kind, payload, meta{width,height,sample_rate,n_frames}) */
  val mediaSchema: StructType = StructType(Seq(
    StructField("doc_id", LongType, nullable = false),
    StructField("kind", StringType, nullable = false),
    StructField("payload", BinaryType, nullable = false),
    StructField("meta", StructType(Seq(
      StructField("width", IntegerType),
      StructField("height", IntegerType),
      StructField("sample_rate", IntegerType),
      StructField("n_frames", IntegerType))))))

  /**
   * Deterministic synthetic media table derived from `documents`: payload
   * = UTF-8 bytes of the text (a stand-in for real encoded media), kind
   * cycles image/audio/video by doc_id.
   */
  def synthesizeMedia(documents: DataFrame): DataFrame =
    documents.select(
      col("doc_id"),
      element_at(array(lit("image"), lit("audio"), lit("video")),
        (pmod(col("doc_id"), lit(3)) + 1).cast("int")).as("kind"),
      encode(col("text"), "UTF-8").as("payload"),
      struct(
        lit(64).as("width"), lit(64).as("height"),
        lit(16000).as("sample_rate"), lit(4).as("n_frames")).as("meta"))

  // ------------------------------------------------- expression path

  def media_features(payload: Column): Column =
    Bridge.column(MediaFeatures(Bridge.expression(payload)))

  def frame_checksums(payload: Column, nFrames: Int): Column =
    Bridge.column(FrameChecksums(Bridge.expression(payload), nFrames))

  def media_resize(payload: Column, srcW: Int, srcH: Int, dstW: Int, dstH: Int): Column =
    Bridge.column(MediaResize(Bridge.expression(payload), srcW, srcH, dstW, dstH))

  def ahash64(payload: Column, srcW: Int, srcH: Int): Column =
    Bridge.column(AHash64(Bridge.expression(payload), srcW, srcH))

  /** Real-codec encode: the id's deterministic gray pattern as actual
    * PNG bytes (JDK ImageIO — see [[MediaCore.encodePatternPng]]). */
  def png_encode_pattern(id: Column): Column =
    Bridge.column(PngEncodePattern(Bridge.expression(id)))

  /** Real-codec decode: PNG payload → [width, height, 8x8-grid sum,
    * aHash64] via the JDK's actual PNG decoder. */
  def png_stats(payload: Column): Column =
    Bridge.column(PngStats(Bridge.expression(payload)))

  /** Real-codec encode of the id's deterministic RGB fixture pattern. */
  def png_encode_rgb_pattern(id: Column): Column =
    Bridge.column(PngEncodeRgbPattern(Bridge.expression(id)))

  /** Real-codec RGB decode: PNG payload → [width, height, r/g/b
    * 8x8-grid sums, luminance aHash64]. */
  def png_rgb_stats(payload: Column): Column =
    Bridge.column(PngRgbStats(Bridge.expression(payload)))

  /** Real-codec encode of the id's fixture pattern as an INDEXED
    * (palette, PNG colour type 3) image. */
  def png_encode_palette_pattern(id: Column): Column =
    Bridge.column(PngEncodePalettePattern(Bridge.expression(id)))

  /** Real-codec palette decode: indexed-PNG payload → [width, height,
    * palette size, r/g/b grid sums, luminance aHash64] — the kernel
    * expands indices through the PLTE itself. */
  def png_palette_stats(payload: Column): Column =
    Bridge.column(PngPaletteStats(Bridge.expression(payload)))

  /** Real-codec audio encode: the id's deterministic PCM waveform as an
    * actual RIFF/WAVE container (JDK javax.sound —
    * [[MediaCore.encodePatternWav]]). */
  def wav_encode_pattern(id: Column): Column =
    Bridge.column(WavEncodePattern(Bridge.expression(id)))

  /** Real-codec audio decode: WAV payload → [n_samples, sample_rate,
    * peak, sum_abs, energy, zero_crossings] via the JDK's actual
    * RIFF/fmt parser. */
  def wav_stats(payload: Column): Column =
    Bridge.column(WavStats(Bridge.expression(payload)))

  /** LOSSY real-codec encode: the id's gray fixture pattern as actual
    * baseline-JPEG bytes (JDK DCT codec —
    * [[MediaCore.encodePatternJpeg]]). */
  def jpeg_encode_pattern(id: Column): Column =
    Bridge.column(JpegEncodePattern(Bridge.expression(id)))

  /** LOSSY real-codec decode: JPEG payload → [width, height, blocks_x,
    * blocks_y, per-8×8-block decoded sample sums...]. Callers compare
    * the block sums against the pattern formula within
    * [[MediaCore.JpegBlockSumTol]] — never exactly. */
  def jpeg_block_stats(payload: Column): Column =
    Bridge.column(JpegBlockStats(Bridge.expression(payload)))

  /**
   * Perceptual-hash image near-dups: aHash signatures banded and
   * verified exactly like SimHash text near-dups
   * ([[Dedup.hammingPairs]] — 4×16-bit pigeonhole bands, so recall is
   * guaranteed for Hamming ≤ 3). At 100 TB this is one scan computing
   * 8 bytes/image + bucket joins on 16-bit chunks — never a pair scan.
   */
  def perceptualNearDups(media: DataFrame, maxHamming: Int = 3,
                         srcW: Int = 64, srcH: Int = 64): DataFrame =
    Dedup.hammingPairs(
      media.select(col("doc_id").as("id"), ahash64(col("payload"), srcW, srcH).as("sig")),
      maxHamming)

  // ------------------------------------------------- batch (UDF-shape) path

  /**
   * mapPartitions decode: consumes (doc_id, payload) rows in fixed-size
   * batches — the shape a real vectorized decode (or RPC to a model
   * server) needs: amortized per-batch setup, bounded memory per batch.
   */
  def decodeBatched(media: DataFrame, batchSize: Int = 64): DataFrame = {
    val spark = media.sparkSession
    import spark.implicits._
    val ds: Dataset[(Long, Array[Byte])] =
      media.select(col("doc_id"), col("payload")).as[(Long, Array[Byte])]
    ds.mapPartitions { rows =>
      rows.grouped(batchSize).flatMap { batch =>
        // per-batch setup would happen here (decoder init, model session)
        batch.iterator.map { case (id, payload) =>
          val f = MediaCore.byteHistogram(payload)
          (id, payload.length.toLong, f(0), f(1), f(2), f(3))
        }
      }
    }.toDF("doc_id", "n_bytes", "f0", "f1", "f2", "f3")
  }
}

/** `media_features(payload)` → array<double> stub feature vector. */
case class MediaFeatures(child: Expression) extends UnaryExpression with ExpectsInputTypes {
  override def prettyName: String = "media_features"
  override def inputTypes = Seq(BinaryType)
  override def dataType: DataType = ArrayType(DoubleType, containsNull = false)
  override def nullIntolerant: Boolean = true
  protected override def nullSafeEval(input: Any): Any =
    new GenericArrayData(MediaCore.byteHistogram(input.asInstanceOf[Array[Byte]]))
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c =>
      s"new org.apache.spark.sql.catalyst.util.GenericArrayData(graft.core.MediaCore.byteHistogram($c))")
  override protected def withNewChildInternal(newChild: Expression): MediaFeatures =
    copy(child = newChild)
}

/** `media_resize(payload, sw, sh, dw, dh)` → binary: nearest-neighbor
  * grid resample of the payload viewed as a sw×sh byte image. */
case class MediaResize(child: Expression, srcW: Int, srcH: Int, dstW: Int, dstH: Int)
  extends UnaryExpression with ExpectsInputTypes {
  override def prettyName: String = "media_resize"
  override def inputTypes = Seq(BinaryType)
  override def dataType: DataType = BinaryType
  override def nullIntolerant: Boolean = true
  protected override def nullSafeEval(input: Any): Any =
    MediaCore.resizeNearest(input.asInstanceOf[Array[Byte]], srcW, srcH, dstW, dstH)
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c =>
      s"graft.core.MediaCore.resizeNearest($c, $srcW, $srcH, $dstW, $dstH)")
  override protected def withNewChildInternal(newChild: Expression): MediaResize =
    copy(child = newChild)
}

/** `ahash64(payload, sw, sh)` → 64-bit perceptual average-hash. */
case class AHash64(child: Expression, srcW: Int, srcH: Int)
  extends UnaryExpression with ExpectsInputTypes {
  override def prettyName: String = "ahash64"
  override def inputTypes = Seq(BinaryType)
  override def dataType: DataType = LongType
  override def nullIntolerant: Boolean = true
  protected override def nullSafeEval(input: Any): Any =
    MediaCore.aHash64(input.asInstanceOf[Array[Byte]], srcW, srcH)
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.core.MediaCore.aHash64($c, $srcW, $srcH)")
  override protected def withNewChildInternal(newChild: Expression): AHash64 =
    copy(child = newChild)
}

/** `png_encode_pattern(id)` → binary: REAL PNG encode (JDK ImageIO) of
  * the id's deterministic fixture pattern. Interpreted-only (no
  * doGenCode): the codec call dominates, so codegen fusion buys nothing
  * and this runs at fixture-ingest time, not in a hot query path. */
case class PngEncodePattern(child: Expression)
  extends UnaryExpression with ExpectsInputTypes
  with org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback {
  override def prettyName: String = "png_encode_pattern"
  override def inputTypes = Seq(LongType)
  override def dataType: DataType = BinaryType
  override def nullIntolerant: Boolean = true
  protected override def nullSafeEval(input: Any): Any =
    MediaCore.encodePatternPng(input.asInstanceOf[Long])
  override protected def withNewChildInternal(newChild: Expression): PngEncodePattern =
    copy(child = newChild)
}

/** `png_stats(payload)` → array<long> [width, height, grid_sum, ahash]:
  * REAL PNG decode (JDK ImageIO) feeding the shared resize + average-
  * hash kernel. Codegen'd like the stub-path expressions — the static
  * call keeps the scan stage in whole-stage codegen. */
case class PngStats(child: Expression) extends UnaryExpression with ExpectsInputTypes {
  override def prettyName: String = "png_stats"
  override def inputTypes = Seq(BinaryType)
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullIntolerant: Boolean = true
  protected override def nullSafeEval(input: Any): Any =
    new GenericArrayData(MediaCore.pngStats(input.asInstanceOf[Array[Byte]]))
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c =>
      s"new org.apache.spark.sql.catalyst.util.GenericArrayData(graft.core.MediaCore.pngStats($c))")
  override protected def withNewChildInternal(newChild: Expression): PngStats =
    copy(child = newChild)
}

/** `png_encode_rgb_pattern(id)` → binary: REAL PNG encode of the id's
  * RGB fixture pattern (interpreted-only, as [[PngEncodePattern]] —
  * fixture-ingest path, the codec call dominates). */
case class PngEncodeRgbPattern(child: Expression)
  extends UnaryExpression with ExpectsInputTypes
  with org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback {
  override def prettyName: String = "png_encode_rgb_pattern"
  override def inputTypes = Seq(LongType)
  override def dataType: DataType = BinaryType
  override def nullIntolerant: Boolean = true
  protected override def nullSafeEval(input: Any): Any =
    MediaCore.encodePatternRgbPng(input.asInstanceOf[Long])
  override protected def withNewChildInternal(newChild: Expression): PngEncodeRgbPattern =
    copy(child = newChild)
}

/** `png_rgb_stats(payload)` → array<long> [width, height, r_sum, g_sum,
  * b_sum, luma aHash]: REAL RGB PNG decode feeding the shared grid
  * kernel per channel + the integer-BT.601 luminance hash. Codegen'd —
  * the static call keeps the scan stage in whole-stage codegen. */
case class PngRgbStats(child: Expression) extends UnaryExpression with ExpectsInputTypes {
  override def prettyName: String = "png_rgb_stats"
  override def inputTypes = Seq(BinaryType)
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullIntolerant: Boolean = true
  protected override def nullSafeEval(input: Any): Any =
    new GenericArrayData(MediaCore.pngRgbStats(input.asInstanceOf[Array[Byte]]))
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c =>
      s"new org.apache.spark.sql.catalyst.util.GenericArrayData(graft.core.MediaCore.pngRgbStats($c))")
  override protected def withNewChildInternal(newChild: Expression): PngRgbStats =
    copy(child = newChild)
}

/** `png_encode_palette_pattern(id)` → binary: REAL indexed-PNG encode
  * of the id's fixture pattern (interpreted-only, as
  * [[PngEncodePattern]] — fixture-ingest path). */
case class PngEncodePalettePattern(child: Expression)
  extends UnaryExpression with ExpectsInputTypes
  with org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback {
  override def prettyName: String = "png_encode_palette_pattern"
  override def inputTypes = Seq(LongType)
  override def dataType: DataType = BinaryType
  override def nullIntolerant: Boolean = true
  protected override def nullSafeEval(input: Any): Any =
    MediaCore.encodePatternPalettePng(input.asInstanceOf[Long])
  override protected def withNewChildInternal(newChild: Expression): PngEncodePalettePattern =
    copy(child = newChild)
}

/** `png_palette_stats(payload)` → array<long> [width, height, palette
  * size, r_sum, g_sum, b_sum, luma aHash]: REAL indexed-PNG decode +
  * palette expansion feeding the shared grid kernel. Codegen'd — the
  * static call keeps the scan stage in whole-stage codegen. */
case class PngPaletteStats(child: Expression) extends UnaryExpression with ExpectsInputTypes {
  override def prettyName: String = "png_palette_stats"
  override def inputTypes = Seq(BinaryType)
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullIntolerant: Boolean = true
  protected override def nullSafeEval(input: Any): Any =
    new GenericArrayData(MediaCore.pngPaletteStats(input.asInstanceOf[Array[Byte]]))
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c =>
      s"new org.apache.spark.sql.catalyst.util.GenericArrayData(graft.core.MediaCore.pngPaletteStats($c))")
  override protected def withNewChildInternal(newChild: Expression): PngPaletteStats =
    copy(child = newChild)
}

/** `wav_encode_pattern(id)` → binary: REAL WAV encode (JDK
  * javax.sound RIFF writer) of the id's deterministic PCM fixture
  * waveform (interpreted-only, as [[PngEncodePattern]] —
  * fixture-ingest path, the codec call dominates). */
case class WavEncodePattern(child: Expression)
  extends UnaryExpression with ExpectsInputTypes
  with org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback {
  override def prettyName: String = "wav_encode_pattern"
  override def inputTypes = Seq(LongType)
  override def dataType: DataType = BinaryType
  override def nullIntolerant: Boolean = true
  protected override def nullSafeEval(input: Any): Any =
    MediaCore.encodePatternWav(input.asInstanceOf[Long])
  override protected def withNewChildInternal(newChild: Expression): WavEncodePattern =
    copy(child = newChild)
}

/** `wav_stats(payload)` → array<long> [n_samples, sample_rate, peak,
  * sum_abs, energy, zero_crossings]: REAL WAV decode (JDK javax.sound
  * RIFF/fmt parser) feeding exact integer audio features. Codegen'd —
  * the static call keeps the scan stage in whole-stage codegen. */
case class WavStats(child: Expression) extends UnaryExpression with ExpectsInputTypes {
  override def prettyName: String = "wav_stats"
  override def inputTypes = Seq(BinaryType)
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullIntolerant: Boolean = true
  protected override def nullSafeEval(input: Any): Any =
    new GenericArrayData(MediaCore.wavStats(input.asInstanceOf[Array[Byte]]))
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c =>
      s"new org.apache.spark.sql.catalyst.util.GenericArrayData(graft.core.MediaCore.wavStats($c))")
  override protected def withNewChildInternal(newChild: Expression): WavStats =
    copy(child = newChild)
}

/** `jpeg_encode_pattern(id)` → binary: REAL baseline-JPEG encode (JDK
  * DCT codec) of the id's gray fixture pattern (interpreted-only, as
  * [[PngEncodePattern]] — fixture-ingest path). */
case class JpegEncodePattern(child: Expression)
  extends UnaryExpression with ExpectsInputTypes
  with org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback {
  override def prettyName: String = "jpeg_encode_pattern"
  override def inputTypes = Seq(LongType)
  override def dataType: DataType = BinaryType
  override def nullIntolerant: Boolean = true
  protected override def nullSafeEval(input: Any): Any =
    MediaCore.encodePatternJpeg(input.asInstanceOf[Long])
  override protected def withNewChildInternal(newChild: Expression): JpegEncodePattern =
    copy(child = newChild)
}

/** `jpeg_block_stats(payload)` → array<long> [width, height, blocks_x,
  * blocks_y, block sums...]: REAL (lossy) JPEG decode feeding exact
  * integer per-8×8-block sample sums — the tolerance comparison
  * against the pattern formula happens in the query, never here.
  * Codegen'd — the static call keeps the scan stage in whole-stage
  * codegen. */
case class JpegBlockStats(child: Expression) extends UnaryExpression with ExpectsInputTypes {
  override def prettyName: String = "jpeg_block_stats"
  override def inputTypes = Seq(BinaryType)
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullIntolerant: Boolean = true
  protected override def nullSafeEval(input: Any): Any =
    new GenericArrayData(MediaCore.jpegBlockStats(input.asInstanceOf[Array[Byte]]))
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c =>
      s"new org.apache.spark.sql.catalyst.util.GenericArrayData(graft.core.MediaCore.jpegBlockStats($c))")
  override protected def withNewChildInternal(newChild: Expression): JpegBlockStats =
    copy(child = newChild)
}

/** `frame_checksums(payload)` → array<long>, one per sampled frame. */
case class FrameChecksums(child: Expression, nFrames: Int) extends UnaryExpression with ExpectsInputTypes {
  override def prettyName: String = "frame_checksums"
  override def inputTypes = Seq(BinaryType)
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullIntolerant: Boolean = true
  protected override def nullSafeEval(input: Any): Any =
    new GenericArrayData(MediaCore.frameChecksums(input.asInstanceOf[Array[Byte]], nFrames))
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c =>
      s"new org.apache.spark.sql.catalyst.util.GenericArrayData(graft.core.MediaCore.frameChecksums($c, $nFrames))")
  override protected def withNewChildInternal(newChild: Expression): FrameChecksums =
    copy(child = newChild)
}
