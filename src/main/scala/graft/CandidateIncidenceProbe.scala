package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/**
 * SCALING.md probe: per-sibling CANDIDATE-INCIDENCE counts for the
 * exact-Jaccard ground-truth family (d33/d35 over the raw corpus,
 * d39/d48/d62 over the quality-filtered exact-deduped corpus, d47 over
 * winnow fingerprints). The count Σ_{light keys} C(df, 2) is exactly
 * the number of candidate-pair rows the family's (i, j) aggregation
 * must absorb — the quantity whose spill filled the disk in the d35
 * sf10 infeasibility measurement — computed here WITHOUT materializing
 * a single pair: one groupBy(key).count() (map-side combined, linear)
 * and one global sum. Running this at sf1 and sf10 turns the shared-
 * stage extrapolation ("the siblings fail the same way") into
 * per-query evidence: each sibling's own pair volume at sf10, in rows
 * and bytes, against the box's free disk.
 *
 * Usage: runMain graft.CandidateIncidenceProbe <sfDir>
 * Env: SPARK_GRAFT_CPUS / SPARK_GRAFT_PARTITIONS (as Profile).
 */
object CandidateIncidenceProbe {
  def main(args: Array[String]): Unit = {
    require(args.nonEmpty, "usage: runMain graft.CandidateIncidenceProbe <sfDir>")
    val sfDir = args(0)
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val parts = sys.env.getOrElse("SPARK_GRAFT_PARTITIONS", cpus)
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", parts)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    // Σ_{df ≤ cap} C(df,2) + the dropped-heavy-key tally, from one
    // linear aggregation over the inverted index's per-key counts
    def incidence(label: String, inv: DataFrame, cap: Int): Unit = {
      val t0 = System.nanoTime()
      val row = inv.groupBy("k").agg(count(lit(1)).as("df"))
        .agg(
          sum(when(col("df") <= cap,
            (col("df") * (col("df") - 1) / 2).cast("long")).otherwise(0L)).as("pairs"),
          sum(when(col("df") <= cap, 1L).otherwise(0L)).as("light_keys"),
          sum(when(col("df") > cap, 1L).otherwise(0L)).as("heavy_keys"),
          max(col("df")).as("max_df"))
        .head()
      val sec = (System.nanoTime() - t0) / 1e9
      println(f"[incidence] $label: pairs=${row.getLong(0)} light_keys=${row.getLong(1)} " +
        f"heavy_keys=${row.getLong(2)} max_df=${row.getLong(3)} ($sec%.1f s)")
    }

    val docs = graft.sources.Tables.load(spark, sfDir, "documents")

    // d33/d35: 3-word shingle postings over the RAW corpus (cap 1000)
    incidence("d33_d35_raw_shingles",
      docs.select(explode(graft.operators.Dedup.hashedShingles(col("text"), 3)).as("k")), 1000)

    // d39/d48/d62: the same stage over the pipeline's quality-filtered,
    // exact-deduped corpus (the `exact` checkpoint the declared forms
    // feed into their component stage)
    val stats = graft.operators.TextAnalysis.analyze(docs)
      .select(col("doc_id"), col("text"), round(col("quality"), 6).as("quality"))
      .where(col("quality") >= 0.5)
    val cleaned = graft.operators.Dedup.exactDedup(stats, "doc_id", "text")
    incidence("d39_d48_d62_clean_shingles",
      cleaned.select(explode(graft.operators.Dedup.hashedShingles(col("text"), 3)).as("k")), 1000)

    // d47: winnow fingerprint postings (window 16, mod-8 sampling, cap 1000)
    incidence("d47_fingerprints",
      docs.select(explode(
        graft.functions.TextFunctions.fingerprint_set(col("text"), 16, 8)).as("k")), 1000)

    spark.stop()
  }
}
