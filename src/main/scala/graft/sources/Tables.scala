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
   * Normalize `events.ts` to a session-TZ TIMESTAMP whatever the file's
   * physical type. The driver has shipped the column two ways across
   * rounds: TIMESTAMP(NANOS) (which Spark's vectorized reader rejects;
   * with `nanosAsLong` the raw int64 nanos arrive as a long, floored
   * here to micros) and TIMESTAMP(MICROS) without timezone (arrives as
   * TIMESTAMP_NTZ; reinterpreted in the session TZ — UTC in Verify /
   * Bench — matching DuckDB's `epoch_us` view of the same file). ONE
   * definition shared by the batch reader below and the streaming
   * readers ([[graft.streaming.EventStreams.readEventStream]]) — the
   * batch/stream agreement specs depend on the paths never drifting.
   */
  def nanosTsToTimestamp(spark: SparkSession, df: DataFrame): DataFrame = {
    import org.apache.spark.sql.functions.{col, expr, timestamp_micros}
    import org.apache.spark.sql.types.{LongType, TimestampNTZType, TimestampType}
    df.schema("ts").dataType match {
      case LongType =>
        df.withColumn("ts", timestamp_micros(expr("ts div 1000")))
      case TimestampNTZType =>
        df.withColumn("ts", col("ts").cast(TimestampType))
      case _ => df
    }
  }

  def load(spark: SparkSession, sfDir: String, name: String): DataFrame =
    if (name == "events") {
      // conf must be set BEFORE the read plans the scan
      spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
      nanosTsToTimestamp(spark, spark.read.parquet(s"$sfDir/$name.parquet"))
    } else if (name == "embeddings") {
      // same insurance as ts above: the vector kernels and their specs
      // assume array<float>; if a regeneration ships array<double>,
      // normalize at the source (a same-type cast is optimized away,
      // so the green path costs nothing)
      import org.apache.spark.sql.functions.col
      import org.apache.spark.sql.types.{ArrayType, FloatType}
      val df = spark.read.parquet(s"$sfDir/$name.parquet")
      df.schema("embedding").dataType match {
        case ArrayType(FloatType, _) => df
        case ArrayType(_, n) =>
          df.withColumn("embedding", col("embedding").cast(ArrayType(FloatType, n)))
        case _ => df
      }
    } else {
      spark.read.parquet(s"$sfDir/$name.parquet")
    }

  /** Register every table as a temp view so `spark.sql` queries resolve. */
  def registerAll(spark: SparkSession, sfDir: String): Unit =
    names.foreach(n => load(spark, sfDir, n).createOrReplaceTempView(n))
}
