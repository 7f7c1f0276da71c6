package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/**
 * A/B probe for the r16 streaming-ingest-dedup optimization: admit the
 * same N micro-batches against the same existing corpus through
 * (a) the UNPREPARED path — [[graft.operators.Dedup.incrementalDedup]]
 *     per batch, which rebuilds the corpus-side digests, shingle sets
 *     and df-capped postings inside every batch (what s87 ran through
 *     round 15), and
 * (b) the SNAPSHOT path — [[graft.operators.Dedup.prepareIncrementalCorpus]]
 *     once, then [[graft.operators.Dedup.incrementalDedupPrepared]] per
 *     batch (what s87 runs now).
 * The point of the probe is the CORPUS-SIZED old side: s87's gate corpus
 * is a fixed 250 docs, so the bench win there is mostly per-batch plan
 * stages — but in production the existing corpus is the big side, and
 * the snapshot's saving is (batches−1) full corpus-side passes. This
 * measures that directly by splitting a generated corpus at `cut`.
 *
 * Usage: runMain graft.IngestSnapshotProbe <docsDir> <cut> <batches> [reps]
 *   old = doc_id < cut, new = doc_id >= cut split by pmod(doc_id, batches).
 * Prints per-rep wall seconds for both paths plus a host-load stamp.
 * Env: SPARK_GRAFT_CPUS (default 32).
 */
object IngestSnapshotProbe {
  def main(args: Array[String]): Unit = {
    if (args.length < 3) {
      System.err.println("usage: runMain graft.IngestSnapshotProbe <docsDir> <cut> <batches> [reps]")
      sys.exit(2)
    }
    val Array(docsDir, cutS, batchesS) = args.take(3)
    val (cut, batches) = (cutS.toLong, batchesS.toInt)
    val reps = if (args.length > 3) args(3).toInt else 3
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.codegen.cache.maxEntries", "5000")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val docs = spark.read.parquet(docsDir).select(col("doc_id"), col("text"))
    val old = docs.where(col("doc_id") < cut)
    val fresh = docs.where(col("doc_id") >= cut)
    def noop(df: DataFrame): Unit =
      df.write.format("noop").mode("overwrite").save()
    def timed(tag: String)(body: => Unit): Double = {
      val t0 = System.nanoTime()
      body
      val sec = (System.nanoTime() - t0) / 1e9
      println(f"[snap-probe] $tag: $sec%.3f s (${HostLoad.line})")
      sec
    }
    def runUnprepared(): Unit =
      (0 until batches).foreach { b =>
        noop(graft.operators.Dedup.incrementalDedup(
          fresh.where(pmod(col("doc_id"), lit(batches)) === b),
          old, "doc_id", "text", threshold = 0.5))
      }
    def runSnapshot(): Unit = {
      val snap = graft.operators.Dedup.prepareIncrementalCorpus(old, "doc_id", "text")
      (0 until batches).foreach { b =>
        noop(graft.operators.Dedup.incrementalDedupPrepared(
          fresh.where(pmod(col("doc_id"), lit(batches)) === b),
          snap, "doc_id", "text", threshold = 0.5))
      }
    }
    // arm order ALTERNATES per rep (r17, ADVICE.md): a fixed
    // unprepared-first order let JIT/codegen/page-cache warm-up
    // systematically favor the snapshot arm
    (1 to reps).foreach { rep =>
      val arms: Seq[(String, () => Unit)] =
        if (rep % 2 == 1) Seq(
          (s"rep$rep unprepared (per-batch corpus rebuild x$batches)", () => runUnprepared()),
          (s"rep$rep snapshot (prepare once, admit x$batches)", () => runSnapshot()))
        else Seq(
          (s"rep$rep snapshot (prepare once, admit x$batches)", () => runSnapshot()),
          (s"rep$rep unprepared (per-batch corpus rebuild x$batches)", () => runUnprepared()))
      arms.foreach { case (tag, body) =>
        timed(tag)(body())
        SessionHygiene.sweep(spark)
      }
    }
    spark.stop()
  }
}
