package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}

/**
 * Parquet source layer over the test corpus (TESTDATA.md). The reference
 * relies on its host engine for scans (SURVEY.md §2.3); here the host is
 * Spark's parquet DataSource, which gives predicate pushdown, column
 * pruning and partition pruning for free — at 100 TB these tables would
 * be directories of many files and the same code holds.
 */
object Tables {
  val names: Seq[String] = Seq("region", "nation", "customer", "supplier",
    "part", "orders", "lineitem", "events", "documents", "embeddings")

  /**
   * events.ts is TIMESTAMP(NANOS) parquet, which Spark's vectorized
   * reader rejects; with `nanosAsLong` set the raw int64 nanos arrive
   * as a long `ts`, which this floors to a micros timestamp. ONE
   * definition shared by the batch reader below and the streaming
   * reader ([[graft.streaming.EventStreams.readEventStream]]) — the
   * batch/stream agreement specs depend on the two paths never
   * drifting.
   */
  def nanosTsToTimestamp(spark: SparkSession, df: DataFrame): DataFrame = {
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    df.withColumn("ts", org.apache.spark.sql.functions.timestamp_micros(
      org.apache.spark.sql.functions.expr("ts div 1000")))
  }

  def load(spark: SparkSession, sfDir: String, name: String): DataFrame =
    if (name == "events") {
      // conf must be set BEFORE the read plans the scan
      spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
      nanosTsToTimestamp(spark, spark.read.parquet(s"$sfDir/$name.parquet"))
    } else {
      spark.read.parquet(s"$sfDir/$name.parquet")
    }

  /** Register every table as a temp view so `spark.sql` queries resolve. */
  def registerAll(spark: SparkSession, sfDir: String): Unit =
    names.foreach(n => load(spark, sfDir, n).createOrReplaceTempView(n))
}
