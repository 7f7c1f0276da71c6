package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import graft.functions.ClusterHashFunctions.cluster_slot

/**
 * Deterministic sampling for training-data pipelines. Seeded
 * `df.sample`/`sampleBy` are stable only for a fixed partitioning;
 * hash-based sampling is stable across runs, engines, partitionings and
 * appends — the property a reproducible corpus needs. The hash is the
 * engine's own slot function, so the sample is also *portable*: any
 * system that can compute the Redis slot (including the DuckDB oracle)
 * selects exactly the same rows.
 */
object Sampling {

  /**
   * Keep rows whose key hashes into the first `rate` fraction of the
   * 16384-slot space. Scan-local (no shuffle), pushes nothing to the
   * driver, composes with any downstream operator.
   */
  private val Slots = graft.core.ClusterHash.TotalSlots

  def hashSample(df: DataFrame, key: Column, rate: Double): DataFrame = {
    require(rate > 0 && rate <= 1, s"rate out of range: $rate")
    // below one slot the truncated threshold would silently select
    // NOTHING — fail loudly instead
    require((rate * Slots).toInt >= 1,
      s"rate $rate is below the 1/$Slots slot granularity")
    df.where(cluster_slot(key) < (rate * Slots).toInt)
  }

  /** Per-stratum hash sampling: different rates per value of `stratum`. */
  def stratifiedHashSample(df: DataFrame, key: Column, stratum: Column,
                           rates: Map[String, Double], default: Double = 0.0): DataFrame = {
    val threshold = rates.foldLeft(lit((default * Slots).toInt)) { case (acc, (value, rate)) =>
      when(stratum === value, lit((rate * Slots).toInt)).otherwise(acc)
    }
    df.where(cluster_slot(key) < threshold)
  }

  /**
   * Deterministic train/val/test assignment by slot-hash thresholds:
   * the first `valFrac` of the 16384-slot space is "val", the next
   * `testFrac` is "test", the rest "train". Stable across runs,
   * engines, partitionings and appends (a new row can never move an
   * existing row's split), disjoint and exhaustive by construction.
   * Scan-local — a projection, no shuffle, composable with any
   * downstream operator.
   */
  def assignSplit(df: DataFrame, key: Column, valFrac: Double, testFrac: Double,
                  splitCol: String = "split"): DataFrame = {
    require(valFrac >= 0 && testFrac >= 0 && valFrac + testFrac < 1,
      s"fractions out of range: val=$valFrac test=$testFrac")
    val slots = Slots
    val valHi = (valFrac * slots).toInt
    val testHi = valHi + (testFrac * slots).toInt
    // a nonzero fraction that truncates to zero slots would silently
    // produce an empty split while claiming exhaustive assignment
    require(valFrac == 0 || valHi >= 1,
      s"valFrac $valFrac is below the 1/$slots slot granularity")
    require(testFrac == 0 || testHi - valHi >= 1,
      s"testFrac $testFrac is below the 1/$slots slot granularity")
    val s = cluster_slot(key)
    df.withColumn(splitCol,
      when(s < valHi, lit("val"))
        .when(s < testHi, lit("test"))
        .otherwise(lit("train")))
  }

  /**
   * Deterministic per-group cap: keep at most `cap` rows per value of
   * `groupCol` — web-corpus curation's "at most K documents per
   * domain/source" rule. Rows are ranked by slot hash (ties by `idCol`),
   * not by arrival order, so the kept set is stable across runs,
   * engines and partitionings, and appending new rows can only displace
   * hash-later rows — never reshuffle the whole selection.
   *
   * Shape: one shuffle on the group key, then a streaming row_number —
   * per-group window state is O(1) (a running count), so a skewed giant
   * group sorts within its partition but never materializes in memory.
   * At 100 TB the group key (domain) has enough cardinality that AQE
   * spreads partitions evenly; a single pathological domain is bounded
   * by the sort's spill, not by the cap logic.
   */
  def capPerGroup(df: DataFrame, key: Column, groupCol: String, idCol: String,
                  cap: Int): DataFrame = {
    require(cap > 0, s"cap must be positive: $cap")
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col(groupCol)).orderBy(cluster_slot(key), col(idCol))
    // collision-proof temp name: a caller column literally named "__rk"
    // must not be clobbered and dropped
    val rk = s"__graft_rk_${java.util.UUID.randomUUID.toString.take(8)}"
    df.withColumn(rk, row_number().over(w))
      .where(col(rk) <= cap)
      .drop(rk)
  }

  /**
   * Temperature-flattened language rebalancing (the multilingual-LLM
   * mixture: sample languages ∝ p^α, α = 0.5), realized downsample-only:
   * per-language keep rate ∝ p^(α−1) = 1/√n, normalized so the rarest
   * language keeps everything — r_l = √(n_min / n_l). Selection is the
   * same deterministic slot-hash rule as [[hashSample]], so the
   * rebalanced corpus is append-stable and engine-portable; the rate
   * arithmetic is sqrt + one IEEE double division (no libm pow), so the
   * oracle reproduces thresholds bit-for-bit.
   *
   * Shape: one language-sized count aggregate, thresholds broadcast
   * back onto the scan, then a scan-local slot filter — the corpus
   * itself is never shuffled.
   */
  def temperatureSample(df: DataFrame, key: Column, langCol: String): DataFrame = {
    val counts = df.groupBy(col(langCol)).agg(count(lit(1)).as("__n"))
    val nmin = counts.agg(min(col("__n")).as("__nmin"))
    // greatest(1, …): at extreme head/tail ratios (n_l > n_min·16384²)
    // the floor would reach 0 and silently DROP the whole language —
    // downsample-only must never mean downsample-to-nothing, so the
    // rate saturates at one slot (1/16384)
    val thresh = counts.crossJoin(broadcast(nmin))
      .select(col(langCol),
        greatest(lit(1L),
          floor(sqrt(col("__nmin").cast("double") / col("__n").cast("double"))
            * graft.core.ClusterHash.TotalSlots)).cast("int").as("__thr"))
    // null-safe equality: a NULL language (failed language ID) must
    // meet its own threshold group, not silently vanish from the join
    df.join(broadcast(thresh), df(langCol) <=> thresh(langCol))
      .where(cluster_slot(key) < col("__thr"))
      .drop("__thr").drop(thresh(langCol))
  }
}
