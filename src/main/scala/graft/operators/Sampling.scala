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
  def hashSample(df: DataFrame, key: Column, rate: Double): DataFrame = {
    require(rate > 0 && rate <= 1, s"rate out of range: $rate")
    df.where(cluster_slot(key) < (rate * graft.core.ClusterHash.TotalSlots).toInt)
  }

  /** Per-stratum hash sampling: different rates per value of `stratum`. */
  def stratifiedHashSample(df: DataFrame, key: Column, stratum: Column,
                           rates: Map[String, Double], default: Double = 0.0): DataFrame = {
    val threshold = rates.foldLeft(lit((default * 16384).toInt)) { case (acc, (value, rate)) =>
      when(stratum === value, lit((rate * 16384).toInt)).otherwise(acc)
    }
    df.where(cluster_slot(key) < threshold)
  }
}
