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

  /** Shared weight stage of the MIXTURE family (d76/d77): per-stratum
    * w = min(cap, (T/L)/t_s) toward an EQUAL-share target over the L
    * observed strata. NULL is its own stratum — groupBy keeps it and
    * the null-safe joins below honor it, so rows with a failed
    * language ID meet their own weight instead of silently vanishing
    * (the same rule [[temperatureSample]] pins). The (T/L)/t
    * association is FIXED: the DuckDB oracles mirror the op order, so
    * the IEEE doubles agree across engines bit-for-bit. */
  private def mixtureWeights(df: DataFrame, stratumCol: String,
                             weightCol: String, cap: Double): DataFrame = {
    // distinct-case names collide under Spark's case-insensitive
    // resolver, so the stratum/total masses get fully distinct names
    val by = df.groupBy(col(stratumCol)).agg(sum(col(weightCol)).as("__sm"))
    val tot = by.agg(sum(col("__sm")).as("__tm"), count(lit(1)).as("__ns"))
    by.crossJoin(broadcast(tot))
      .select(col(stratumCol),
        least(lit(cap),
          col("__tm").cast("double") / col("__ns") / col("__sm").cast("double")).as("__w"))
  }

  /** [[mixtureWeights]] with a caller-supplied TARGET mixture — the
    * DoReMi/Pile-style generalization (r12 verdict item 3): per-stratum
    * w = min(cap, ((share_s / Σshare) · T) / t_s), where share_s comes
    * from `shares` (strata not in the map — including the NULL stratum
    * — take `defaultShare`). Shares are NORMALIZED over the observed
    * strata, so they need not sum to 1 and a stratum that never occurs
    * costs nothing. The op order is FIXED and mirrored by the d81/d82
    * oracles: share/Σ, then ·T, then /t — left-associated, so the IEEE
    * doubles agree across engines bit-for-bit.
    *
    * Oracle-exactness discipline: Σshare is a float aggregate over the
    * strata, so with arbitrary share values its last ulp is
    * order-dependent. Gated deployments use DYADIC shares (0.5, 0.25,
    * 0.125…), whose partial sums are exact in any order — then every
    * derived threshold is engine- and order-independent. The operator
    * itself doesn't care (an ulp flips a slot threshold only on an
    * exact integer boundary); only bit-exact gating does.
    *
    * A zero share does NOT drop the stratum: the consuming thresholds
    * keep the [[temperatureSample]] one-slot floor (downsample-only
    * never means downsample-to-nothing); a caller who wants exclusion
    * filters first. The equal-share [[mixtureWeights]] keeps its own
    * (T/L)/t op order — the d76/d77 oracles splice that form — so the
    * two paths are separate arithmetic, same machinery; SamplingSpec
    * pins that a uniform target reproduces the equal-share output. */
  private def mixtureWeightsTargeted(df: DataFrame, stratumCol: String,
                                     weightCol: String, cap: Double,
                                     shares: Map[String, Double],
                                     defaultShare: Double): DataFrame = {
    require(defaultShare >= 0, s"defaultShare must be >= 0, got $defaultShare")
    shares.foreach { case (k, v) =>
      require(v >= 0, s"share for stratum '$k' must be >= 0, got $v") }
    // canonical when-chain order (sorted by stratum) — semantically
    // irrelevant (each stratum matches at most one arm) but keeps the
    // plan and the oracle's CASE chain textually stable
    val shareOf = shares.toSeq.sortBy(_._1).foldLeft(lit(defaultShare)) {
      case (acc, (value, share)) =>
        when(col(stratumCol) <=> lit(value), lit(share)).otherwise(acc)
    }
    val by = df.groupBy(col(stratumCol))
      .agg(sum(col(weightCol)).as("__sm"))
      .withColumn("__sh", shareOf)
    val tot = by.agg(sum(col("__sm")).as("__tm"), sum(col("__sh")).as("__stot"))
    by.crossJoin(broadcast(tot))
      .select(col(stratumCol),
        least(lit(cap),
          col("__sh") / col("__stot")
            * col("__tm").cast("double") / col("__sm").cast("double")).as("__w"))
  }

  /** [[mixtureResample]] toward a caller-supplied target mixture
    * (d81): membership is the same slot-hash rule against
    * floor(w·16384) with the one-slot floor; only the weight
    * arithmetic changes ([[mixtureWeightsTargeted]]). */
  def mixtureResampleTo(df: DataFrame, stratumCol: String, weightCol: String,
                        key: Column, shares: Map[String, Double],
                        defaultShare: Double = 0.0): DataFrame =
    resampleByWeights(df, stratumCol, key,
      mixtureWeightsTargeted(df, stratumCol, weightCol, cap = 1.0,
        shares, defaultShare))

  /** [[mixtureEpochs]] toward a caller-supplied target mixture (d82):
    * ⌊w⌋ whole epochs + the slot-hash fractional epoch, w from
    * [[mixtureWeightsTargeted]] clamped at `maxEpochs`. */
  def mixtureEpochsTo(df: DataFrame, stratumCol: String, weightCol: String,
                      key: Column, shares: Map[String, Double],
                      maxEpochs: Double = 4.0, defaultShare: Double = 0.0,
                      epochCol: String = "epoch"): DataFrame = {
    require(maxEpochs >= 1.0, s"maxEpochs must be >= 1, got $maxEpochs")
    epochsByWeights(df, stratumCol, key, epochCol,
      mixtureWeightsTargeted(df, stratumCol, weightCol, cap = maxEpochs,
        shares, defaultShare))
  }

  /** ONE encoding of the membership tail every mixture variant rides:
    * thresholds = floor(w·16384) with the one-slot floor, null-safe
    * broadcast join, scan-side CRC slot test. The weight stage varies
    * (equal-share vs targeted); the floor/join/filter discipline must
    * not. */
  private def resampleByWeights(df: DataFrame, stratumCol: String,
                                key: Column, weights: DataFrame): DataFrame = {
    val wt = weights.select(col(stratumCol),
      greatest(lit(1), floor(col("__w") * Slots).cast("int")).as("__thr"))
    df.join(broadcast(wt), df(stratumCol) <=> wt(stratumCol))
      .where(cluster_slot(key) < col("__thr"))
      .drop("__thr").drop(wt(stratumCol))
  }

  /** The epochs tail ([[resampleByWeights]]'s up-sampling sibling):
    * ⌊w⌋ whole epochs + the slot-hash fractional epoch, fractional
    * threshold floored at one slot only when there are ZERO whole
    * epochs. */
  private def epochsByWeights(df: DataFrame, stratumCol: String, key: Column,
                              epochCol: String, weights: DataFrame): DataFrame = {
    val wt = weights
      .select(col(stratumCol), floor(col("__w")).cast("int").as("__full"),
        when(floor(col("__w")) === 0,
          greatest(lit(1), floor((col("__w") - floor(col("__w"))) * Slots).cast("int")))
          .otherwise(floor((col("__w") - floor(col("__w"))) * Slots).cast("int"))
          .as("__fthr"))
    df.join(broadcast(wt), df(stratumCol) <=> wt(stratumCol))
      .withColumn("__nc", col("__full") +
        when(cluster_slot(key) < col("__fthr"), 1).otherwise(0))
      .where(col("__nc") >= 1)
      .withColumn(epochCol, explode(sequence(lit(1), col("__nc"))))
      .drop("__full", "__fthr", "__nc").drop(wt(stratumCol))
  }

  /**
   * Domain-mixture RESAMPLE (downsample-only, d76): keep each row of an
   * overrepresented stratum with probability w = min(1, (T/L)/t_s),
   * decided by the deterministic slot hash of `key` against
   * floor(w·16384) — membership is append-stable, engine-portable, and
   * scan-side (the strata-sized threshold table broadcasts; the corpus
   * crosses no exchange for the join). Equal-share target: w is
   * bounded below by 1/L by construction (t_s ≤ T), so the floored
   * threshold stays ≥ 1 slot for any L ≤ 16384 strata; past that the
   * [[temperatureSample]] one-slot floor applies — nothing enforces a
   * stratum-count bound (the count is only known at execution), and
   * downsample-only must never mean downsample-to-NOTHING.
   */
  def mixtureResample(df: DataFrame, stratumCol: String, weightCol: String,
                      key: Column): DataFrame =
    resampleByWeights(df, stratumCol, key,
      mixtureWeights(df, stratumCol, weightCol, cap = 1.0))

  /**
   * Mixture EPOCHS (up- and downsampling in one rule, d77): each row
   * emits ⌊w⌋ whole epochs plus one fractional epoch when its slot
   * hash clears floor(frac(w)·16384), with w = min(maxEpochs, (T/L)/t_s)
   * — the "repeat scarce domains up to N epochs" mixture. w < 1
   * degenerates to [[mixtureResample]]'s membership decision (zero
   * whole epochs, the fraction decides). The (row, epoch) output is
   * the LOGICAL form: physical copies materialize only at pack time,
   * so replication costs one int per copy, never a corpus rewrite.
   */
  def mixtureEpochs(df: DataFrame, stratumCol: String, weightCol: String,
                    key: Column, maxEpochs: Double = 4.0,
                    epochCol: String = "epoch"): DataFrame = {
    require(maxEpochs >= 1.0, s"maxEpochs must be >= 1, got $maxEpochs")
    // fractional threshold floored at one slot when there are ZERO
    // whole epochs — the mixtureResample guard's epochs form: past
    // 16384 strata the heaviest stratum must still keep ≥ 1/16384,
    // never vanish (when __full ≥ 1 the stratum survives regardless)
    epochsByWeights(df, stratumCol, key, epochCol,
      mixtureWeights(df, stratumCol, weightCol, cap = maxEpochs))
  }

  /**
   * Greedy SEQUENCE PACKING for training-batch assembly (t54): assign
   * each document to a fixed-token-budget training sequence without
   * splitting documents. Docs are sharded by slot hash
   * (`cluster_slot(key) % nshards` — the append-stable discipline every
   * sampler here uses), walk in `idCol` order within their shard, and a
   * doc belongs to sequence `floor(prev_running_tokens / budget)`: a
   * new sequence opens exactly when the shard's running total has
   * crossed the next budget multiple. Deterministic, engine-portable
   * (the oracle recomputes the same window arithmetic), and the two
   * standard greedy trades are explicit: a sequence can OVERFLOW by at
   * most one document's tokens (docs are never split), and sequence ids
   * can SKIP where a single document spans multiple budgets.
   *
   * Sharding IS the 100 TB design: packing order is inherently
   * sequential, and a global order would be one single-partition window
   * — the driver-shaped anti-pattern. Per-shard windows run nshards-way
   * parallel (set nshards ~ cluster cores at scale), each shard's
   * packing is independent and append-stable, and the cross-shard
   * trade is only that budgets don't amortize across shards.
   */
  def packSequences(df: DataFrame, key: Column, tokCol: String, idCol: String,
                    budget: Long, nshards: Int = 8,
                    shardCol: String = "shard", seqCol: String = "seq"): DataFrame = {
    require(budget > 0, s"budget must be positive: $budget")
    require(nshards > 0 && nshards <= Slots, s"nshards out of range: $nshards")
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col(shardCol)).orderBy(col(idCol))
      .rowsBetween(org.apache.spark.sql.expressions.Window.unboundedPreceding, -1)
    // a NULL or negative token count would flow through the cumsum as
    // garbage packing (negative running totals -> seq -1) — fail loudly
    // at the row instead, as the samplers above fail on bad rates
    val tok = when(col(tokCol).isNull.or(col(tokCol) < 0),
      raise_error(concat(lit(s"packSequences: NULL or negative $tokCol: "),
        col(tokCol).cast("string")))).otherwise(col(tokCol))
    df.withColumn(shardCol, pmod(cluster_slot(key), lit(nshards)))
      .withColumn("__prev", coalesce(sum(tok).over(w), lit(0L)))
      // seq stays LONG: at the 100 TB shape this docstring claims, a
      // shard's running total exceeds budget * Int.MaxValue and an int
      // cast would throw under ANSI (or wrap negative without it).
      // INTEGRAL division (`div`), not floor(double /): both operands
      // are LONG, so the fold is exact by construction at any token
      // total — the double form was exact only below 2^53 per shard,
      // and the oracle's `//` is integer division
      .withColumn(seqCol, expr(s"__prev div ${budget}L"))
      .drop("__prev")
  }
}
