package graft.queries

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.operators.{Multimodal, SlotPartitioning}
import graft.sources.Tables

/**
 * Multimodal plumbing and slot-aware layout as driver-checkable queries.
 * The multimodal oracles recompute the stub kernels (byte histograms,
 * frame checksums) from `ord()` folds in DuckDB — fully independent.
 */
object ExtrasQueries {
  private def t(s: SparkSession, dir: String, n: String): DataFrame = Tables.load(s, dir, n)

  /**
   * Ingest-once: write the slot-bucketed customer/orders tables for `dir`
   * unless this session already has them — repeat invocations (plan
   * checks, reports) reuse the layout, which is exactly the production
   * story: the write cost is paid once at ingest and every subsequent
   * slot-keyed join reuses it. Bench calls this in its warm-up so the
   * timed p11 body measures the zero-exchange join, not the one-time
   * write. Returns (customerTable, ordersTable) names.
   */
  def ensureSlotBucketedTables(s: SparkSession, dir: String): (String, String) = {
    import s.implicits._
    val suffix = dir.replaceAll("[^A-Za-z0-9]", "_")
    val custTable = s"graft_cust_by_slot_$suffix"
    val ordTable = s"graft_ord_by_slot_$suffix"
    val warehouse = new java.net.URI(
      s.conf.get("spark.sql.warehouse.dir")).getPath
    // digest-guarded like every other derived artifact: a regenerated
    // corpus (even rewritten in place) must not leave the bucketed
    // layout serving last generation's rows just because the catalog
    // entry still exists
    def ensure(tbl: String, table: String)(build: => Unit): Unit = {
      // writeSlotBucketed saves an EXTERNAL table at this explicit
      // location — the staleness marker lives with the data files
      val loc = s"$warehouse/graft_bucketed/$tbl"
      val want = RelationalQueries.srcDigest(dir, table)
      if (!s.catalog.tableExists(tbl) || RelationalQueries.stale(loc, dir, table)) {
        build
        RelationalQueries.markFresh(loc, want)
      }
    }
    ensure(custTable, "customer") {
      val cust = t(s, dir, "customer").select($"c_custkey", $"c_mktsegment",
        concat(lit("{cust:"), $"c_custkey", lit("}")).as("key"))
      SlotPartitioning.writeSlotBucketed(cust, $"key", custTable)
    }
    ensure(ordTable, "orders") {
      val ords = t(s, dir, "orders").select($"o_custkey", $"o_totalprice",
        concat(lit("{cust:"), $"o_custkey", lit("}")).as("key"))
      SlotPartitioning.writeSlotBucketed(ords, $"key", ordTable)
    }
    (custTable, ordTable)
  }

  /** PNG fixture export root (per-sf, same layout rationale as
    * RelationalQueries.csvDir). */
  def pngDir(sfDir: String): String =
    RelationalQueries.dataRoot("png", sfDir, "fixtures")

  /** Ingest-once REAL-codec fixture set: the first 100 docs' ids, each
    * rendered as TWO deterministic gray patterns (variant 1 perturbs
    * one pixel — a perceptual near-duplicate of variant 0) and
    * PNG-encoded with the JDK's actual codec
    * (MediaCore.encodePatternPng), stored as an opaque binary column
    * keyed by img_id = doc_id·2 + variant. The m56/m57 read paths must
    * genuinely decode these bytes — the oracles know only the pattern
    * formula. */
  def ensurePngExport(s: SparkSession, sfDir: String): String = {
    val dir = pngDir(sfDir)
    val want = RelationalQueries.srcDigest(sfDir, "documents")
    if (RelationalQueries.stale(dir, sfDir, "documents")) {
      t(s, sfDir, "documents")
        .orderBy("doc_id").limit(100)
        .select(col("doc_id"), explode(array(lit(0L), lit(1L))).as("variant"))
        .select((col("doc_id") * 2 + col("variant")).as("img_id"))
        .select(col("img_id"),
          Multimodal.png_encode_pattern(col("img_id")).as("payload"))
        .coalesce(1)
        .write.mode("overwrite").parquet(dir)
      RelationalQueries.markFresh(dir, want)
    }
    dir
  }

  /** RGB variant of the fixture set (same id scheme, three-channel
    * patterns, real JDK PNG encode — see MediaCore.patternRgb). */
  def rgbPngDir(sfDir: String): String =
    RelationalQueries.dataRoot("png-rgb", sfDir, "fixtures")

  def ensureRgbPngExport(s: SparkSession, sfDir: String): String = {
    val dir = rgbPngDir(sfDir)
    val want = RelationalQueries.srcDigest(sfDir, "documents")
    if (RelationalQueries.stale(dir, sfDir, "documents")) {
      t(s, sfDir, "documents")
        .orderBy("doc_id").limit(100)
        .select(col("doc_id"), explode(array(lit(0L), lit(1L))).as("variant"))
        .select((col("doc_id") * 2 + col("variant")).as("img_id"))
        .select(col("img_id"),
          Multimodal.png_encode_rgb_pattern(col("img_id")).as("payload"))
        .coalesce(1)
        .write.mode("overwrite").parquet(dir)
      RelationalQueries.markFresh(dir, want)
    }
    dir
  }

  /** Indexed-colour (palette) variant of the fixture set — PNG colour
    * type 3, same id scheme; the gray pattern plane becomes the
    * palette-index plane (see MediaCore.encodePatternPalettePng). */
  def palettePngDir(sfDir: String): String =
    RelationalQueries.dataRoot("png-pal", sfDir, "fixtures")

  def ensurePalettePngExport(s: SparkSession, sfDir: String): String = {
    val dir = palettePngDir(sfDir)
    val want = RelationalQueries.srcDigest(sfDir, "documents")
    if (RelationalQueries.stale(dir, sfDir, "documents")) {
      t(s, sfDir, "documents")
        .orderBy("doc_id").limit(100)
        .select(col("doc_id"), explode(array(lit(0L), lit(1L))).as("variant"))
        .select((col("doc_id") * 2 + col("variant")).as("img_id"))
        .select(col("img_id"),
          Multimodal.png_encode_palette_pattern(col("img_id")).as("payload"))
        .coalesce(1)
        .write.mode("overwrite").parquet(dir)
      RelationalQueries.markFresh(dir, want)
    }
    dir
  }

  /** JPEG fixture export root (lossy sibling of [[pngDir]]). */
  def jpegDir(sfDir: String): String =
    RelationalQueries.dataRoot("jpeg", sfDir, "fixtures")

  /** Ingest-once LOSSY real-codec fixture set: the same id scheme and
    * gray pattern as [[ensurePngExport]], but encoded with the JDK's
    * actual baseline-JPEG (DCT) codec. Decode is NOT bit-faithful —
    * the m61 read path asserts per-block sums within
    * [[graft.core.MediaCore.JpegBlockSumTol]] of the pattern formula,
    * never exact equality. */
  def ensureJpegExport(s: SparkSession, sfDir: String): String = {
    val dir = jpegDir(sfDir)
    val want = RelationalQueries.srcDigest(sfDir, "documents")
    if (RelationalQueries.stale(dir, sfDir, "documents")) {
      t(s, sfDir, "documents")
        .orderBy("doc_id").limit(100)
        .select(col("doc_id"), explode(array(lit(0L), lit(1L))).as("variant"))
        .select((col("doc_id") * 2 + col("variant")).as("img_id"))
        .select(col("img_id"),
          Multimodal.jpeg_encode_pattern(col("img_id")).as("payload"))
        .coalesce(1)
        .write.mode("overwrite").parquet(dir)
      RelationalQueries.markFresh(dir, want)
    }
    dir
  }

  /** SCALED JPEG fixture root (r11): fixture count ∝ sf, unlike the
    * fixed-200 m61 set. */
  def jpegScaledDir(sfDir: String): String =
    RelationalQueries.dataRoot("jpeg-scaled", sfDir, "fixtures")

  /** Ingest-once SCALED real-codec fixture family: one baseline-JPEG
    * per document (img_id = doc_id·2, variant 0 — the same id scheme
    * and pattern arithmetic as [[ensureJpegExport]], so the m61 block
    * formula applies verbatim). The point is SCALE SHAPE: every other
    * operator family's cost is slope-measured across sf decades, but
    * the fixed-200 media sets are fixture-bound — this family grows
    * with the corpus so the real-codec decode path's per-row cost is
    * measurable at volume (SCALING.md r11). Deliberately NOT
    * coalesced: half a million payloads at sf10 are written and
    * scanned with the corpus's own parallelism — the 100 TB layout,
    * where media blobs live in many splittable files, never one. */
  def ensureJpegScaledExport(s: SparkSession, sfDir: String): String = {
    val dir = jpegScaledDir(sfDir)
    val want = RelationalQueries.srcDigest(sfDir, "documents")
    if (RelationalQueries.stale(dir, sfDir, "documents")) {
      t(s, sfDir, "documents")
        .select((col("doc_id") * 2).as("img_id"))
        .select(col("img_id"),
          Multimodal.jpeg_encode_pattern(col("img_id")).as("payload"))
        .write.mode("overwrite").parquet(dir)
      RelationalQueries.markFresh(dir, want)
    }
    dir
  }

  /** Expected 8×8-block sample sum of fixture `img_id`'s pattern at
    * block (bx, by), computed in SQL — ONE encoding of the arithmetic
    * shared by m61 and m62 (and mirrored by their DuckDB oracles). */
  private def jpegExpSum(bx: Int, by: Int): Column = expr(
    s"""aggregate(sequence(0, 63), CAST(0 AS BIGINT), (acc, i) -> acc +
       |  (CAST((img_id div 2) * 31 % 251 AS BIGINT)
       |   + 7 * ($bx * 8 + i % 8) + 13 * ($by * 8 + i div 8)
       |   + CASE WHEN $bx * 8 + i % 8 = 0 AND $by * 8 + i div 8 = 0
       |          THEN 120 * (img_id % 2) ELSE 0 END) % 251)""".stripMargin)

  /** WAV fixture export root (audio sibling of [[pngDir]]). */
  def wavDir(sfDir: String): String =
    RelationalQueries.dataRoot("wav", sfDir, "fixtures")

  /** Ingest-once REAL-codec audio fixture set: the first 100 docs' ids,
    * each rendered as a deterministic 16-bit PCM waveform and
    * containerized by the JDK's actual RIFF/WAVE writer
    * (MediaCore.encodePatternWav), stored as an opaque binary column.
    * The m60 read path must genuinely parse the container and decode
    * the samples — the oracle knows only the waveform formula. */
  def ensureWavExport(s: SparkSession, sfDir: String): String = {
    val dir = wavDir(sfDir)
    val want = RelationalQueries.srcDigest(sfDir, "documents")
    if (RelationalQueries.stale(dir, sfDir, "documents")) {
      t(s, sfDir, "documents")
        .orderBy("doc_id").limit(100)
        .select(col("doc_id").as("audio_id"))
        .select(col("audio_id"),
          Multimodal.wav_encode_pattern(col("audio_id")).as("payload"))
        .coalesce(1)
        .write.mode("overwrite").parquet(dir)
      RelationalQueries.markFresh(dir, want)
    }
    dir
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // Audio extension of the real-codec boundary: RIFF/WAVE 16-bit PCM
    // fixtures decoded with the JDK's actual audio codec (javax.sound —
    // the ImageIO analogue) inside a codegen'd scan expression, feeding
    // exact integer features (peak, Σ|s|, Σs², sign-change count). The
    // oracle recomputes every feature purely from the waveform formula —
    // a parser that mis-walked the RIFF chunks, byte-swapped the PCM,
    // or truncated samples would hash-mismatch. Image paths untouched.
    "m60_wav_decode" -> ((s, dir) => {
      import s.implicits._
      val path = ensureWavExport(s, dir)
      s.read.parquet(path)
        .select($"audio_id", Multimodal.wav_stats($"payload").as("st"))
        .select($"audio_id",
          element_at($"st", 1).as("n_samples"),
          element_at($"st", 2).as("sample_rate"),
          element_at($"st", 3).as("peak"),
          element_at($"st", 4).as("sum_abs"),
          element_at($"st", 5).as("energy"),
          element_at($"st", 6).as("zero_crossings"))
        .orderBy("audio_id")
    }),
    // LOSSY real-codec decode — the boundary's remaining side: every
    // PNG/WAV path decodes bit-faithfully, so their oracles recompute
    // features EXACTLY; baseline JPEG does not (quantized AC
    // coefficients ring at the pattern's mod-251 wrap edges — measured
    // per-pixel error up to 34 levels), so the oracle contract changes
    // shape. The kernel returns exact integer per-8×8-block sums of
    // the DECODED samples; the QUERY recomputes the expected block
    // sums from the pattern formula in SQL and asserts each within the
    // documented band (±128 per 64-sample block ≈ 2 levels/pixel;
    // measured worst 56 over all 200 fixtures), plus the whole-image
    // total within 6×128. The oracle re-derives the formula's exact
    // total and expects every band check TRUE — a decoder drifting
    // out of band, wrong dimensions, or a wrong fixture set
    // hash-fails; exact-sum matching is impossible BY CONSTRUCTION
    // and deliberately not claimed (MultimodalSpec pins that at least
    // one block really is inexact, so the band stays load-bearing).
    "m61_jpeg_decode" -> ((s, dir) => {
      import s.implicits._
      val path = ensureJpegExport(s, dir)
      val tol = graft.core.MediaCore.JpegBlockSumTol
      // expected 8×8-block sample sums from the pattern formula,
      // computed in SQL — the same arithmetic the oracle runs
      val blocks = (0 until 6).map(k => (k % 3, k / 3))
      val inTol = blocks.zipWithIndex.map { case ((bx, by), k) =>
        when(abs(element_at($"st", k + 5) - jpegExpSum(bx, by)) <= tol, 1L).otherwise(0L)
      }.reduce(_ + _)
      val decodedTotal = (0 until 6).map(k => element_at($"st", k + 5)).reduce(_ + _)
      val expTotal = blocks.map { case (bx, by) => jpegExpSum(bx, by) }.reduce(_ + _)
      s.read.parquet(path)
        .select($"img_id", Multimodal.jpeg_block_stats($"payload").as("st"))
        .select($"img_id",
          element_at($"st", 1).as("width"),
          element_at($"st", 2).as("height"),
          (element_at($"st", 3) * element_at($"st", 4)).as("n_blocks"),
          inTol.as("blocks_in_tol"),
          expTotal.as("exp_total"),
          (abs(decodedTotal - expTotal) <= lit(6 * tol)).as("total_in_tol"))
        .orderBy("img_id")
    }),
    // REAL-codec decode (the stub boundary's other side): PNG fixtures
    // are decoded with the JDK's actual PNG codec inside a codegen'd
    // scan expression, then fed to the same resize + average-hash
    // kernel as the stub path. The oracle recomputes width/height/
    // grid-sum/aHash purely from the pattern formula — a decoder that
    // failed to reproduce the encoded pixels bit-for-bit would
    // hash-mismatch.
    // The SCALED media family's corpus-validation scan: decode EVERY
    // document's JPEG fixture (count ∝ sf — the slope-measurable decode
    // workload, SCALING.md r11) and reduce to corpus-level verdicts:
    // image/pixel counts, band-check tallies at the m61 tolerance, and
    // the pattern formula's exact expected-total sum. Map-side combined
    // aggregation — the only exchange carries one partial row per
    // partition at any corpus size; the decode kernel dominates, which
    // is the point.
    "m62_jpeg_corpus_stats" -> ((s, dir) => {
      import s.implicits._
      val path = ensureJpegScaledExport(s, dir)
      val tol = graft.core.MediaCore.JpegBlockSumTol
      val blocks = (0 until 6).map(k => (k % 3, k / 3))
      val inTol = blocks.zipWithIndex.map { case ((bx, by), k) =>
        when(abs(element_at($"st", k + 5) - jpegExpSum(bx, by)) <= tol, 1L).otherwise(0L)
      }.reduce(_ + _)
      val decodedTotal = (0 until 6).map(k => element_at($"st", k + 5)).reduce(_ + _)
      val expTotal = blocks.map { case (bx, by) => jpegExpSum(bx, by) }.reduce(_ + _)
      s.read.parquet(path)
        .select($"img_id", Multimodal.jpeg_block_stats($"payload").as("st"))
        .select($"img_id",
          (element_at($"st", 1) * element_at($"st", 2)).as("px"),
          inTol.as("bit"), expTotal.as("et"),
          (abs(decodedTotal - expTotal) <= lit(6 * tol)).as("tit"))
        .agg(count(lit(1)).as("n_imgs"),
          sum($"px").as("n_pixels"),
          sum($"bit").as("blocks_in_tol"),
          sum($"et").as("exp_total_sum"),
          min($"tit").as("all_total_in_tol"))
    }),
    "m56_png_decode" -> ((s, dir) => {
      import s.implicits._
      val path = ensurePngExport(s, dir)
      s.read.parquet(path)
        .select($"img_id", Multimodal.png_stats($"payload").as("st"))
        .select($"img_id",
          element_at($"st", 1).as("width"),
          element_at($"st", 2).as("height"),
          element_at($"st", 3).as("grid_sum"),
          element_at($"st", 4).as("ahash"))
        .orderBy("img_id")
    }),
    // The m53 banding machinery over REAL decoded bytes: signatures come
    // from the JDK PNG decoder (not byte-as-pixel stubs), then the same
    // 4×16-bit pigeonhole banding + exact Hamming verify. Each doc's
    // two variants differ by one pixel, so the expected pairs are the
    // variant twins (whichever land within Hamming ≤ 3 — the oracle
    // recomputes the signatures from the pattern formula and scans all
    // pairs exhaustively, so the threshold censoring matches exactly).
    "m57_png_neardup" -> ((s, dir) => {
      import s.implicits._
      val path = ensurePngExport(s, dir)
      val sigs = s.read.parquet(path)
        .select($"img_id".as("id"),
          element_at(Multimodal.png_stats($"payload"), 4).as("sig"))
      graft.operators.Dedup.hammingPairs(sigs, maxHamming = 3)
        .orderBy("i", "j")
    }),
    // RGB extension of the real-codec boundary: three-channel fixtures
    // decoded with the JDK's actual PNG codec, per-channel 8×8 grid
    // sums + an aHash over integer BT.601 luminance. The oracle
    // recomputes every channel from the pattern formula — a decoder
    // that swapped bands, truncated bit depth, or mis-weighted the
    // luminance would hash-mismatch. The gray m56 path is untouched.
    "m58_png_rgb_decode" -> ((s, dir) => {
      import s.implicits._
      val path = ensureRgbPngExport(s, dir)
      s.read.parquet(path)
        .select($"img_id", Multimodal.png_rgb_stats($"payload").as("st"))
        .select($"img_id",
          element_at($"st", 1).as("width"),
          element_at($"st", 2).as("height"),
          element_at($"st", 3).as("r_sum"),
          element_at($"st", 4).as("g_sum"),
          element_at($"st", 5).as("b_sum"),
          element_at($"st", 6).as("ahash"))
        .orderBy("img_id")
    }),
    // Palette (indexed-colour) extension of the real-codec boundary:
    // colour-type-3 PNGs whose pixels are indices into a 256-entry
    // PLTE. The decode kernel must do the step gray/RGB never needed —
    // expand indices through the palette — before the per-channel grid
    // sums and luminance aHash. The oracle recomputes everything from
    // the index-pattern and palette FORMULAS, so a decoder that
    // returned raw indices as gray, truncated the palette, or mapped a
    // wrong entry would hash-mismatch. Gray/RGB paths untouched.
    "m59_png_palette_decode" -> ((s, dir) => {
      import s.implicits._
      val path = ensurePalettePngExport(s, dir)
      s.read.parquet(path)
        .select($"img_id", Multimodal.png_palette_stats($"payload").as("st"))
        .select($"img_id",
          element_at($"st", 1).as("width"),
          element_at($"st", 2).as("height"),
          element_at($"st", 3).as("palette_size"),
          element_at($"st", 4).as("r_sum"),
          element_at($"st", 5).as("g_sum"),
          element_at($"st", 6).as("b_sum"),
          element_at($"st", 7).as("ahash"))
        .orderBy("img_id")
    }),
    // Binary payload + typed metadata + native feature expression.
    "m50_media_features" -> ((s, dir) => {
      import s.implicits._
      val media = Multimodal.synthesizeMedia(t(s, dir, "documents"))
      media.select($"doc_id", $"kind",
          length($"payload").cast("long").as("n_bytes"),
          Multimodal.media_features($"payload").as("f"))
        .select($"doc_id", $"kind", $"n_bytes",
          element_at($"f", 1).as("f0"), element_at($"f", 2).as("f1"),
          element_at($"f", 3).as("f2"), element_at($"f", 4).as("f3"))
        .orderBy("doc_id")
    }),
    // Frame sampling over "video" payloads.
    "m51_frame_checksums" -> ((s, dir) => {
      import s.implicits._
      Multimodal.synthesizeMedia(t(s, dir, "documents"))
        .where($"kind" === "video")
        .select($"doc_id", posexplode(Multimodal.frame_checksums($"payload", 4)))
        .select($"doc_id", $"pos".cast("int").as("frame_idx"), $"col".as("fp"))
        .orderBy("doc_id", "frame_idx")
    }),
    // Resize over "image" payloads: 64x64 source grid -> 8x8 nearest-
    // neighbor sample (native codegen'd expression), summarized by
    // deterministic scalars so the oracle can recompute byte-for-byte.
    "m52_resize" -> ((s, dir) => {
      import s.implicits._
      val resized = Multimodal.synthesizeMedia(t(s, dir, "documents"))
        .where($"kind" === "image")
        .select($"doc_id", Multimodal.media_resize($"payload", 64, 64, 8, 8).as("r"))
      resized.select($"doc_id",
          length($"r").cast("int").as("n_bytes"),
          element_at(Multimodal.frame_checksums($"r", 1), 1).as("r_sum"))
        .orderBy("doc_id")
    }),
    // Perceptual-hash image dedup: aHash over the stub-decoded 8×8 grid
    // (STUB boundary: a codec would replace the byte indexing, the
    // signature/banding machinery is the real thing), then the same
    // 4×16-bit pigeonhole banding as SimHash text dedup — 8 bytes per
    // image + chunk bucket joins, never a pair scan.
    "m53_image_neardup" -> ((s, dir) => {
      import s.implicits._
      Multimodal.perceptualNearDups(
          Multimodal.synthesizeMedia(t(s, dir, "documents")).where($"kind" === "image"),
          maxHamming = 3)
        .orderBy("i", "j")
    }),
    // Typed UDAF: exact distinct-slot occupancy per node via a 16384-bit
    // bitmap aggregator (merge = bitwise OR, no dedup shuffle).
    "p10_slot_occupancy" -> ((s, dir) => {
      import s.implicits._
      import graft.functions.ClusterHashFunctions.{cluster_node, cluster_slot}
      t(s, dir, "orders")
        .select(concat(lit("order:"), $"o_orderkey").as("key"))
        .select(cluster_node($"key").as("node"), cluster_slot($"key").as("slot"))
        .groupBy("node")
        .agg(graft.functions.SlotBitmapAgg.distinct_slots($"slot").as("occupied_slots"),
          count(lit(1)).as("keys"))
        .orderBy("node")
    }),
    // Persistent slot-bucketed layout: both tables are written bucketed
    // by cluster_slot of a {cust:N} hash-tag key (an order and its
    // customer share a slot by construction), then slot-co-location is
    // analyzed with a join ON THE SLOT. The bucketed scans carry
    // HashPartitioning(slot) from disk, so the join plans ZERO
    // exchange — the only shuffle in the whole query is the final
    // 5-group aggregate (pinned by PlanChecksSpec). The write cost is
    // paid once at ingest; at 100 TB every subsequent slot-keyed
    // join/agg reuses the layout for free. (Spark's v1 bucketing
    // engages only when the join keys equal the bucket keys exactly,
    // which is also why the slot column, not the raw key, is the
    // bucketing column.)
    "p11_bucketed_coloc" -> ((s, dir) => {
      import s.implicits._
      val (custTable, ordTable) = ensureSlotBucketedTables(s, dir)
      val c = s.table(custTable)
      val o = s.table(ordTable)
      o.hint("merge").join(c, o("slot") === c("slot"))
        .groupBy(c("c_mktsegment").as("segment"))
        .agg(count(lit(1)).as("n_pairs"),
          sum($"o_totalprice".cast("decimal(18,2)")).cast("double").as("total"))
        .orderBy("segment")
    }),
    // Slot-aware layout analysis: per-node balance + share of keys.
    "p08_node_balance" -> ((s, dir) => {
      import s.implicits._
      SlotPartitioning.nodeBalance(
          t(s, dir, "customer"), concat(lit("user:"), $"c_custkey"))
        .select($"node", $"keys", $"distinct_slots", round($"share", 6).as("share"))
        .orderBy("node")
    }),
    // Fixed-point PageRank (damping 0.85, 5 rounds) over the bipartite
    // customer↔supplier purchase graph (cust node = 2k, supp = 2k+1;
    // both directions, so the walk is over the undirected graph) — the
    // authority-scoring pattern web-corpus curation runs over the link
    // graph. Integer arithmetic end to end (ranks are multiples of
    // 10^-12), so the oracle recomputes all 5 rounds bit-for-bit.
    "a42_pagerank" -> ((s, dir) => {
      import s.implicits._
      val o = t(s, dir, "orders").select($"o_orderkey", $"o_custkey")
      val l = t(s, dir, "lineitem").select($"l_orderkey", $"l_suppkey")
      // both directions from ONE pass over the join (a self-union of
      // the joined frame would run the orders⋈lineitem join twice)
      val edges = o.join(l, $"o_orderkey" === $"l_orderkey")
        .select(($"o_custkey" * 2).as("c"), ($"l_suppkey" * 2 + 1).as("p"))
        // dedup BEFORE doubling: half the rows through the distinct
        // exchange, and the doubled list is distinct by construction
        // (src parity differs), so pageRank can skip its own dedup
        .distinct()
        .select(explode(array(
          struct($"c".as("src"), $"p".as("dst")),
          struct($"p".as("src"), $"c".as("dst")))).as("e"))
        .select($"e.src".as("src"), $"e.dst".as("dst"))
      graft.operators.Graph.pageRank(edges, iters = 5, symmetric = true,
        assumeDistinct = true).orderBy("node")
    }),
    // Z-order (Morton) layout keys over events: interleave (user bucket,
    // hour bucket) and aggregate per coarse z-cell. Each cell's min/max
    // on BOTH dimensions stays inside one small tile — the property that
    // makes z-ordered file footers prunable by predicates on either
    // dimension (ZOrder scaladoc; locality is also spec-pinned). The
    // oracle recomputes the bit-interleave with plain SQL shift/mask.
    "p15_zorder_cells" -> ((s, dir) => {
      import s.implicits._
      val ev = t(s, dir, "events").select(
        ($"user_id" % 256).as("ub"),
        expr("(unix_micros(ts) div 1000 div 3600000) % 256").as("hb"))
      ev.select($"ub", $"hb", graft.operators.ZOrder.zkey($"ub", $"hb").as("z"))
        .groupBy(shiftright($"z", 6).as("cell"))
        .agg(count(lit(1)).as("n"),
          min($"ub").as("min_ub"), max($"ub").as("max_ub"),
          min($"hb").as("min_hb"), max($"hb").as("max_hb"))
        .orderBy("cell")
    }),
    // Temporal segmentation of "video" payloads: frame checksums (8
    // frames, scan-fused native expression), then a per-doc lag window
    // flags scene cuts where adjacent fingerprints jump by > 8000.
    // Window state is per-document frame counts — bounded — and the
    // heavy part (checksum folds) happens in the scan stage before the
    // one exchange on doc_id.
    "m54_scene_cuts" -> ((s, dir) => {
      import s.implicits._
      val w = org.apache.spark.sql.expressions.Window
        .partitionBy($"doc_id").orderBy($"frame_idx")
      Multimodal.synthesizeMedia(t(s, dir, "documents"))
        .where($"kind" === "video")
        .select($"doc_id", posexplode(Multimodal.frame_checksums($"payload", 8)))
        .select($"doc_id", $"pos".cast("int").as("frame_idx"), $"col".as("fp"))
        .withColumn("prev", lag($"fp", 1).over(w))
        .withColumn("cut", $"prev".isNotNull && abs($"fp" - $"prev") > 8000)
        .groupBy($"doc_id")
        .agg((sum(when($"cut", 1L).otherwise(0L)) + 1L).as("n_scenes"),
          min(when($"cut", $"frame_idx")).as("first_cut"))
        .orderBy("doc_id")
    }),
    // The mapPartitions batch-decode path (iterator-of-batches shape a
    // real codec / model server plugs into), driver-checked against the
    // same byte-histogram oracle as the expression path (m50) — both
    // executions of the stub kernel must agree with the independent
    // SQL recompute.
    "m55_batched_decode" -> ((s, dir) => {
      Multimodal.decodeBatched(Multimodal.synthesizeMedia(t(s, dir, "documents")))
        .orderBy("doc_id")
    }),
  )

  // ASCII-corpus assumption (same caveat as DuckSql's CRC16 oracle): the
  // m50/m51 oracles fold ord() CODE POINTS while the Scala kernels
  // (byteHistogram, frameChecksums) fold UTF-8 BYTES — equal only while
  // `documents.text` is pure ASCII (the driver corpus is). Non-ASCII
  // parity is covered by byte-level unit tests in MultimodalSpec.
  private val duckCodes =
    "list_transform(range(1, length(text)+1), i -> ord(substr(text, i, 1)))"

  // Shared CTE prefix for the PNG-fixture oracles: expected pixels come
  // from the pattern formula alone (base = floorMod(doc_id·31, 251);
  // resize samples at (3x, 2y) so grid cell t reads base + 21·(t%8) +
  // 26·(t//8), plus the variant-1 bump of 120 at cell 0 — all mod 251),
  // the mean compare is the same integer v·64 > sum rule, and the
  // signature folds to HUGEINT (2^63 won't fit BIGINT).
  private val pngSigCte =
    """ids AS (SELECT doc_id FROM documents ORDER BY doc_id LIMIT 100),
      |imgs AS (SELECT doc_id, unnest([0, 1]) AS variant FROM ids),
      |cells AS (SELECT doc_id * 2 + variant AS img_id, doc_id, variant,
      |          unnest(range(0, 64)) AS t FROM imgs),
      |v AS (SELECT img_id, t,
      |  (((doc_id * 31) % 251 + 251) % 251 + (t % 8) * 21 + (t // 8) * 26
      |   + CASE WHEN t = 0 THEN 120 * variant ELSE 0 END) % 251 AS g
      | FROM cells),
      |s AS (SELECT img_id, SUM(g) AS gs FROM v GROUP BY img_id),
      |sg AS (SELECT v.img_id,
      |  SUM(CASE WHEN v.g * 64 > s.gs THEN CAST(1 AS HUGEINT) << v.t
      |           ELSE CAST(0 AS HUGEINT) END) AS su
      | FROM v JOIN s ON v.img_id = s.img_id GROUP BY v.img_id)""".stripMargin

  // RGB fixture oracle CTEs: each channel's grid cell t samples pixel
  // (3·(t%8), 2·(t//8)), so the per-cell values are base + add(c) +
  // 3·dx(c)·(t%8) + 2·dy(c)·(t//8) (+ the variant bump at cell 0), all
  // mod 251; luminance is the same truncating (299r+587g+114b)//1000
  // the decoder computes. Coefficients: r=(0,7,13), g=(89,11,3),
  // b=(178,5,17) — see MediaCore.ChanAdd/ChanDx/ChanDy.
  private val rgbSigCte = {
    def chan(add: Int, dx: Int, dy: Int) =
      s"(((doc_id * 31) % 251 + 251) % 251 + $add + (t % 8) * ${3 * dx} + (t // 8) * ${2 * dy}" +
        " + CASE WHEN t = 0 THEN 120 * variant ELSE 0 END) % 251"
    s"""ids AS (SELECT doc_id FROM documents ORDER BY doc_id LIMIT 100),
       |imgs AS (SELECT doc_id, unnest([0, 1]) AS variant FROM ids),
       |cells AS (SELECT doc_id * 2 + variant AS img_id, doc_id, variant,
       |          unnest(range(0, 64)) AS t FROM imgs),
       |v AS (SELECT img_id, t, ${chan(0, 7, 13)} AS r, ${chan(89, 11, 3)} AS g,
       |  ${chan(178, 5, 17)} AS b FROM cells),
       |lv AS (SELECT img_id, t, r, g, b,
       |  (299 * r + 587 * g + 114 * b) // 1000 AS luma FROM v),
       |s AS (SELECT img_id, SUM(r) AS rs, SUM(g) AS gs, SUM(b) AS bs,
       |  SUM(luma) AS ls FROM lv GROUP BY img_id),
       |sg AS (SELECT lv.img_id,
       |  SUM(CASE WHEN lv.luma * 64 > s.ls THEN CAST(1 AS HUGEINT) << lv.t
       |           ELSE CAST(0 AS HUGEINT) END) AS su
       | FROM lv JOIN s ON lv.img_id = s.img_id GROUP BY lv.img_id)""".stripMargin
  }

  // Palette fixture oracle CTEs: the gray pattern's cell value (v.g in
  // pngSigCte) IS the palette index, so the expected channels are the
  // palette formulas applied to it — (73i+11)%256, (101i+29)%256,
  // (137i+43)%256 — and luminance is the same truncating BT.601 fold
  // as the RGB oracle. Builds on pngSigCte (its gray s/sg CTEs are
  // simply unused here).
  private val paletteSigCte =
    s"""$pngSigCte,
       |pv AS (SELECT img_id, t, (g * 73 + 11) % 256 AS pr,
       |  (g * 101 + 29) % 256 AS pg, (g * 137 + 43) % 256 AS pb FROM v),
       |plv AS (SELECT img_id, t, pr, pg, pb,
       |  (299 * pr + 587 * pg + 114 * pb) // 1000 AS luma FROM pv),
       |ps AS (SELECT img_id, SUM(pr) AS rs, SUM(pg) AS gs, SUM(pb) AS bs,
       |  SUM(luma) AS ls FROM plv GROUP BY img_id),
       |psg AS (SELECT plv.img_id,
       |  SUM(CASE WHEN plv.luma * 64 > ps.ls THEN CAST(1 AS HUGEINT) << plv.t
       |           ELSE CAST(0 AS HUGEINT) END) AS su
       | FROM plv JOIN ps ON plv.img_id = ps.img_id GROUP BY plv.img_id)""".stripMargin

  val oracles: Map[String, String] = Map(
    // Every feature recomputed purely from the waveform formula
    // (MediaCore.patternPcm): n = 800 + (id mod 7)·160 samples of
    // s(i) = ((id·31 mod 4001) + 17·i) mod 4001 − 2000. Exact integer
    // arithmetic end-to-end; zero crossings pair s(i−1)/s(i) via
    // DuckDB's 1-based list slots, with 0 counted non-negative on both
    // sides.
    // lossy-codec oracle: width/height/block count and the pattern
    // formula's exact pixel total are re-derived independently; the
    // band checks are asserted TRUE — the one contract a lossy decode
    // can honor (exact sums are impossible BY CONSTRUCTION; the band
    // is ±128 per 64-sample block, measured worst 56)
    // the scaled family's corpus-level twin: counts and the exact
    // expected-total sum re-derived from the pattern formula over ALL
    // documents (variant 0 — the img_id % 2 term vanishes); the band
    // tallies are asserted saturated (6 blocks/image, every total in
    // band), the contract a lossy decode can honor
    "m62_jpeg_corpus_stats" ->
      """WITH imgs AS (SELECT doc_id * 2 AS img_id FROM documents),
        |e AS (SELECT img_id,
        |  list_sum(list_transform(range(0, 384), i ->
        |    ((img_id // 2) * 31 % 251 + 7 * (i % 24) + 13 * (i // 24)) % 251)) AS et
        | FROM imgs)
        |SELECT CAST(count(*) AS BIGINT) AS n_imgs,
        | CAST(count(*) * 384 AS BIGINT) AS n_pixels,
        | CAST(count(*) * 6 AS BIGINT) AS blocks_in_tol,
        | CAST(SUM(et) AS BIGINT) AS exp_total_sum,
        | bool_and(TRUE) AS all_total_in_tol
        |FROM e""".stripMargin,
    "m61_jpeg_decode" ->
      """WITH ids AS (SELECT doc_id FROM documents ORDER BY doc_id LIMIT 100),
        |imgs AS (SELECT doc_id * 2 + v AS img_id
        |         FROM ids CROSS JOIN (VALUES (0), (1)) t(v)),
        |e AS (SELECT img_id,
        |  list_sum(list_transform(range(0, 384), i ->
        |    ((img_id // 2) * 31 % 251 + 7 * (i % 24) + 13 * (i // 24)
        |     + CASE WHEN i = 0 THEN 120 * (img_id % 2) ELSE 0 END) % 251)) AS et
        | FROM imgs)
        |SELECT img_id, CAST(24 AS BIGINT) AS width, CAST(16 AS BIGINT) AS height,
        | CAST(6 AS BIGINT) AS n_blocks, CAST(6 AS BIGINT) AS blocks_in_tol,
        | CAST(et AS BIGINT) AS exp_total, TRUE AS total_in_tol
        |FROM e ORDER BY img_id""".stripMargin,
    "m60_wav_decode" ->
      """WITH ids AS (SELECT doc_id AS audio_id FROM documents ORDER BY doc_id LIMIT 100),
        |p AS (SELECT audio_id, 800 + (audio_id % 7) * 160 AS n,
        |        (audio_id * 31) % 4001 AS base FROM ids),
        |w AS (SELECT audio_id, n,
        |        list_transform(range(0, n), i -> (base + i * 17) % 4001 - 2000) AS sm
        |      FROM p)
        |SELECT audio_id,
        | CAST(n AS BIGINT) AS n_samples,
        | CAST(8000 AS BIGINT) AS sample_rate,
        | CAST(list_max(list_transform(sm, v -> abs(v))) AS BIGINT) AS peak,
        | CAST(list_sum(list_transform(sm, v -> abs(v))) AS BIGINT) AS sum_abs,
        | CAST(list_sum(list_transform(sm, v -> v * v)) AS BIGINT) AS energy,
        | CAST(len(list_filter(range(1, n), i -> (sm[i] < 0) != (sm[i+1] < 0))) AS BIGINT)
        |   AS zero_crossings
        |FROM w ORDER BY audio_id""".stripMargin,
    "m59_png_palette_decode" ->
      s"""WITH $paletteSigCte
         |SELECT ps.img_id, CAST(24 AS BIGINT) AS width, CAST(16 AS BIGINT) AS height,
         |  CAST(256 AS BIGINT) AS palette_size,
         |  CAST(ps.rs AS BIGINT) AS r_sum, CAST(ps.gs AS BIGINT) AS g_sum,
         |  CAST(ps.bs AS BIGINT) AS b_sum,
         |  CAST(CASE WHEN psg.su >= CAST('9223372036854775808' AS HUGEINT)
         |       THEN psg.su - CAST('18446744073709551616' AS HUGEINT)
         |       ELSE psg.su END AS BIGINT) AS ahash
         |FROM ps JOIN psg ON ps.img_id = psg.img_id ORDER BY ps.img_id""".stripMargin,
    "m58_png_rgb_decode" ->
      s"""WITH $rgbSigCte
         |SELECT s.img_id, CAST(24 AS BIGINT) AS width, CAST(16 AS BIGINT) AS height,
         |  CAST(s.rs AS BIGINT) AS r_sum, CAST(s.gs AS BIGINT) AS g_sum,
         |  CAST(s.bs AS BIGINT) AS b_sum,
         |  CAST(CASE WHEN sg.su >= CAST('9223372036854775808' AS HUGEINT)
         |       THEN sg.su - CAST('18446744073709551616' AS HUGEINT)
         |       ELSE sg.su END AS BIGINT) AS ahash
         |FROM s JOIN sg ON s.img_id = sg.img_id ORDER BY s.img_id""".stripMargin,
    "m56_png_decode" ->
      s"""WITH $pngSigCte
         |SELECT s.img_id, CAST(24 AS BIGINT) AS width, CAST(16 AS BIGINT) AS height,
         |  CAST(s.gs AS BIGINT) AS grid_sum,
         |  CAST(CASE WHEN sg.su >= CAST('9223372036854775808' AS HUGEINT)
         |       THEN sg.su - CAST('18446744073709551616' AS HUGEINT)
         |       ELSE sg.su END AS BIGINT) AS ahash
         |FROM s JOIN sg ON s.img_id = sg.img_id ORDER BY s.img_id""".stripMargin,
    // exhaustive pair scan oracle-side only (the Spark side bands)
    "m57_png_neardup" ->
      s"""WITH $pngSigCte
         |SELECT a.img_id AS i, b.img_id AS j,
         | CAST(bit_count(xor(a.su, b.su)) AS INTEGER) AS hamming
         |FROM sg a JOIN sg b ON a.img_id < b.img_id
         |WHERE bit_count(xor(a.su, b.su)) <= 3
         |ORDER BY i, j""".stripMargin,
    "m50_media_features" ->
      s"""WITH b AS (SELECT doc_id,
         |  CASE doc_id % 3 WHEN 0 THEN 'image' WHEN 1 THEN 'audio' ELSE 'video' END AS kind,
         |  text, CAST(length(text) AS BIGINT) AS n_bytes, $duckCodes AS codes
         | FROM documents)
         |SELECT doc_id, kind, n_bytes,
         | CAST(len(list_filter(codes, c -> c >= 32 AND c < 64)) AS DOUBLE) / greatest(n_bytes, 1) AS f0,
         | CAST(len(list_filter(codes, c -> c >= 64 AND c < 96)) AS DOUBLE) / greatest(n_bytes, 1) AS f1,
         | CAST(len(list_filter(codes, c -> c >= 96 AND c < 128)) AS DOUBLE) / greatest(n_bytes, 1) AS f2,
         | CAST(len(list_filter(codes, c -> c < 32 OR c >= 128)) AS DOUBLE) / greatest(n_bytes, 1) AS f3
         |FROM b ORDER BY doc_id""".stripMargin,
    "m51_frame_checksums" ->
      """WITH v AS (SELECT doc_id, text, length(text) AS n FROM documents WHERE doc_id % 3 = 2),
        |f AS (SELECT doc_id, unnest(range(0, 4)) AS frame_idx, text, n FROM v)
        |SELECT doc_id, CAST(frame_idx AS INTEGER) AS frame_idx,
        | CAST(list_reduce(list_prepend(CAST(0 AS BIGINT),
        |   list_transform(range(frame_idx*n//4 + 1, (frame_idx+1)*n//4 + 1),
        |     j -> CAST(ord(substr(text, j, 1)) AS BIGINT))),
        |   (a, b) -> a + b) % 65521 AS BIGINT) AS fp
        |FROM f ORDER BY doc_id, frame_idx""".stripMargin,
    // nearest-neighbor grid recomputed positionally: target t in 0..63
    // reads source byte at (t//8*8)*64 + (t%8)*8 (0 past end of payload)
    "m52_resize" ->
      """WITH img AS (SELECT doc_id, text FROM documents WHERE doc_id % 3 = 0)
        |SELECT doc_id, CAST(64 AS INTEGER) AS n_bytes,
        | CAST(list_reduce(list_prepend(CAST(0 AS BIGINT),
        |   list_transform(range(0, 64), t ->
        |     CASE WHEN (t // 8) * 8 * 64 + (t % 8) * 8 + 1 <= length(text)
        |          THEN CAST(ord(substr(text, (t // 8) * 8 * 64 + (t % 8) * 8 + 1, 1)) AS BIGINT)
        |          ELSE 0 END)),
        |   (a, b) -> a + b) % 65521 AS BIGINT) AS r_sum
        |FROM img ORDER BY doc_id""".stripMargin,
    "p10_slot_occupancy" -> {
      val inner = graft.oracle.DuckSql.withSlotNode(
        "SELECT 'order:' || o_orderkey AS key FROM orders",
        Seq(), Some("slot"), Some("node"))
      s"""SELECT node, count(DISTINCT slot) AS occupied_slots, count(*) AS keys
         |FROM ($inner) GROUP BY node ORDER BY node""".stripMargin
    },
    // independent recompute: CRC-fold slot for both keyspaces, join on
    // slot (co-location pairs = own customer + any slot collisions)
    "p11_bucketed_coloc" -> {
      val oSlots = graft.oracle.DuckSql.withSlotNode(
        "SELECT o_totalprice, '{cust:' || o_custkey || '}' AS key FROM orders",
        Seq("o_totalprice"), Some("slot"))
      val cSlots = graft.oracle.DuckSql.withSlotNode(
        "SELECT c_mktsegment, '{cust:' || c_custkey || '}' AS key FROM customer",
        Seq("c_mktsegment"), Some("slot"))
      s"""SELECT c_mktsegment AS segment, COUNT(*) AS n_pairs,
         | CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS total
         |FROM ($oSlots) o JOIN ($cSlots) c ON o.slot = c.slot
         |GROUP BY 1 ORDER BY 1""".stripMargin
    },
    "p08_node_balance" -> {
      val inner = graft.oracle.DuckSql.withSlotNode(
        "SELECT 'user:' || c_custkey AS key FROM customer",
        Seq(), Some("slot"), Some("node"))
      s"""SELECT node, count(*) AS keys, count(DISTINCT slot) AS distinct_slots,
         | round(CAST(count(*) AS DOUBLE) / sum(count(*)) OVER (), 6) AS share
         |FROM ($inner) GROUP BY node ORDER BY node""".stripMargin
    },
    // aHash recomputed positionally (the m52 resize mapping), mean
    // compare as integer v·64 > sum (no division), signature as a
    // HUGEINT bit fold, exhaustive pair scan oracle-side only.
    "m53_image_neardup" -> {
      val p = "(t // 8) * 8 * 64 + (t % 8) * 8 + 1"
      s"""WITH img AS (SELECT doc_id, text FROM documents WHERE doc_id % 3 = 0),
         |v AS (SELECT doc_id, list_transform(range(0, 64), t ->
         |   CASE WHEN $p <= length(text)
         |        THEN CAST(ord(substr(text, $p, 1)) AS BIGINT) ELSE 0 END) AS g
         | FROM img),
         |sm AS (SELECT doc_id, g,
         |   list_reduce(list_prepend(CAST(0 AS BIGINT), g), (a, b) -> a + b) AS s
         | FROM v),
         |sig AS (SELECT doc_id,
         |   list_reduce(list_prepend(CAST(0 AS HUGEINT), list_transform(range(0, 64), t ->
         |     CASE WHEN g[t + 1] * 64 > s THEN CAST(1 AS HUGEINT) << t
         |          ELSE CAST(0 AS HUGEINT) END)), (a, b) -> a + b) AS sig
         | FROM sm)
         |SELECT a.doc_id AS i, b.doc_id AS j,
         | CAST(bit_count(xor(a.sig, b.sig)) AS INTEGER) AS hamming
         |FROM sig a JOIN sig b ON a.doc_id < b.doc_id
         |WHERE bit_count(xor(a.sig, b.sig)) <= 3
         |ORDER BY i, j""".stripMargin
    },
    // All 5 fixed-point rounds unrolled as CTEs (the iteration count is
    // a constant, so no recursive CTE is needed): same integer
    // contribution formula, same floor divisions — bit-identical.
    "a42_pagerank" -> {
      def round(cur: String, prev: String): String =
        s"""$cur AS (SELECT nd.node,
           |  (SELECT 150000000000 // n FROM p) + COALESCE(f.inflow, 0) AS r
           | FROM nodes nd LEFT JOIN (
           |  SELECT e.dst AS node, SUM((17 * $prev.r) // (20 * deg.deg)) AS inflow
           |  FROM e JOIN $prev ON e.src = $prev.node JOIN deg ON e.src = deg.src
           |  GROUP BY e.dst) f ON nd.node = f.node)""".stripMargin
      s"""WITH e0 AS (SELECT DISTINCT 2 * o.o_custkey AS src, 2 * l.l_suppkey + 1 AS dst
         |  FROM orders o JOIN lineitem l ON o.o_orderkey = l.l_orderkey),
         |e AS (SELECT src, dst FROM e0 UNION SELECT dst AS src, src AS dst FROM e0),
         |nodes AS (SELECT DISTINCT src AS node FROM e),
         |deg AS (SELECT src, count(*) AS deg FROM e GROUP BY src),
         |p AS (SELECT count(*) AS n FROM nodes),
         |r0 AS (SELECT node, 1000000000000 // n AS r FROM nodes, p),
         |${round("r1", "r0")},
         |${round("r2", "r1")},
         |${round("r3", "r2")},
         |${round("r4", "r3")},
         |${round("r5", "r4")}
         |SELECT node, CAST(r AS BIGINT) AS rank FROM r5 ORDER BY node""".stripMargin
    },
    // Morton interleave recomputed with the same shift/mask rounds in
    // SQL (integer ops only — exact on both engines).
    "p15_zorder_cells" -> {
      def spread(v: String): String = {
        val a = s"($v & 65535)"
        val b = s"((($a | ($a << 8)) & 16711935))"
        val c = s"((($b | ($b << 4)) & 252645135))"
        val d = s"((($c | ($c << 2)) & 858993459))"
        s"((($d | ($d << 1)) & 1431655765))"
      }
      s"""WITH e AS (SELECT user_id % 256 AS ub,
         |  (epoch_ms(ts) // 3600000) % 256 AS hb FROM events),
         |z AS (SELECT ub, hb,
         |  (${spread("ub")} | (${spread("hb")} << 1)) AS zk FROM e)
         |SELECT zk // 64 AS cell, count(*) AS n,
         | min(ub) AS min_ub, max(ub) AS max_ub,
         | min(hb) AS min_hb, max(hb) AS max_hb
         |FROM z GROUP BY cell ORDER BY cell""".stripMargin
    },
    "m55_batched_decode" ->
      s"""WITH b AS (SELECT doc_id, text,
         |  CAST(length(text) AS BIGINT) AS n_bytes, $duckCodes AS codes
         | FROM documents)
         |SELECT doc_id, n_bytes,
         | CAST(len(list_filter(codes, c -> c >= 32 AND c < 64)) AS DOUBLE) / greatest(n_bytes, 1) AS f0,
         | CAST(len(list_filter(codes, c -> c >= 64 AND c < 96)) AS DOUBLE) / greatest(n_bytes, 1) AS f1,
         | CAST(len(list_filter(codes, c -> c >= 96 AND c < 128)) AS DOUBLE) / greatest(n_bytes, 1) AS f2,
         | CAST(len(list_filter(codes, c -> c < 32 OR c >= 128)) AS DOUBLE) / greatest(n_bytes, 1) AS f3
         |FROM b ORDER BY doc_id""".stripMargin,
    // Same frame split (k·n // 8) and Adler-style fold as the m51
    // oracle, then the identical lag + threshold rule in SQL.
    "m54_scene_cuts" ->
      """WITH v AS (SELECT doc_id, text, length(text) AS n FROM documents WHERE doc_id % 3 = 2),
        |f AS (SELECT doc_id, unnest(range(0, 8)) AS frame_idx, text, n FROM v),
        |fp AS (SELECT doc_id, frame_idx,
        |  CAST(list_reduce(list_prepend(CAST(0 AS BIGINT),
        |    list_transform(range(frame_idx*n//8 + 1, (frame_idx+1)*n//8 + 1),
        |      j -> CAST(ord(substr(text, j, 1)) AS BIGINT))),
        |    (a, b) -> a + b) % 65521 AS BIGINT) AS fp
        | FROM f),
        |c AS (SELECT doc_id, frame_idx, fp,
        |  lag(fp) OVER (PARTITION BY doc_id ORDER BY frame_idx) AS prev FROM fp)
        |SELECT doc_id,
        | CAST(SUM(CASE WHEN prev IS NOT NULL AND abs(fp - prev) > 8000
        |               THEN 1 ELSE 0 END) + 1 AS BIGINT) AS n_scenes,
        | CAST(MIN(CASE WHEN prev IS NOT NULL AND abs(fp - prev) > 8000
        |               THEN frame_idx END) AS INTEGER) AS first_cut
        |FROM c GROUP BY doc_id ORDER BY doc_id""".stripMargin,
  )
}
