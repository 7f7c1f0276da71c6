package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{OutputMode, Trigger}

import graft.streaming.EventStreams

/**
 * Declared queries that execute on the REAL Structured Streaming engine
 * (file source → stateful operators → memory sink, Trigger.AvailableNow)
 * and still land in the DuckDB oracle gate: bounded input replayed
 * through the engine is deterministic here, so the streaming result
 * must equal batch SQL over the same rows. This upgrades the streaming
 * category (SURVEY.md §2.3) from spec-only to driver-checked.
 *
 * Scale notes: the identical topology runs unbounded — the file source
 * becomes Kafka, `AvailableNow` becomes a continuous trigger, the
 * memory sink becomes a parquet/Delta sink; watermarks bound state
 * either way. The memory sink is safe here because results are
 * aggregate-sized (hours × event types; distinct user buckets), never
 * corpus-sized.
 */
object StreamingQueries {

  /** File-source stream over the events table. Same nanos→micros
    * normalization as [[graft.sources.Tables.load]]. The path is a glob
    * on purpose: for a non-glob single-file path, `FileStreamSource`
    * injects `basePath = <the file>` into each batch's relation and
    * partition inference rejects a file basePath; a glob skips that
    * injection entirely. */
  private def eventStream(s: SparkSession, dir: String): DataFrame = {
    s.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    s.readStream
      .schema(EventStreams.eventSchema)
      .parquet(s"$dir/events.parque*")
      .withColumn("ts", timestamp_micros(expr("ts div 1000")))
  }

  /** Drain a streaming DataFrame into a named memory sink and return
    * the sink table. `dropTempView` first: bench re-invokes queries in
    * one session and a stale sink view would collide. */
  private def runToTable(s: SparkSession, df: DataFrame,
                         mode: OutputMode, name: String): DataFrame = {
    s.catalog.dropTempView(name)
    val q = df.writeStream
      .outputMode(mode)
      .format("memory")
      .queryName(name)
      .trigger(Trigger.AvailableNow())
      .start()
    q.awaitTermination()
    s.table(name)
  }

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // Watermarked 1h tumbling-window aggregation, actually executed by
    // the streaming engine (stateful agg, watermark tracking, state
    // store). `value` folds through DECIMAL so the sum is
    // partition-order-independent — same trick as a24, this query's
    // batch twin; `window(ts, '1 hour').start` = `date_trunc('hour')`.
    "s40_stream_hourly" -> ((s, dir) => {
      val agg = eventStream(s, dir)
        .withWatermark("ts", "10 minutes")
        .groupBy(window(col("ts"), "1 hour").as("w"), col("event_type"))
        .agg(count(lit(1)).as("cnt"),
          sum(col("value").cast("decimal(18,2)")).cast("double").as("sum_value"))
        .select(col("w.start").as("hour"), col("event_type"),
          col("cnt"), col("sum_value"))
      runToTable(s, agg, OutputMode.Complete(), "s40_sink")
        .orderBy("hour", "event_type")
    }),
    // Streaming dedup through the engine's dedup state store (append
    // mode). Projecting to the dedup key first makes the kept row
    // independent of arrival order — deterministic, oracle = DISTINCT.
    "s41_stream_dedup" -> ((s, dir) => {
      val ded = eventStream(s, dir)
        .select((col("user_id") % 100).as("user_bucket"), col("event_type"))
        .dropDuplicates("user_bucket", "event_type")
      runToTable(s, ded, OutputMode.Append(), "s41_sink")
        .orderBy("user_bucket", "event_type")
    }),
  )

  def oracles: Map[String, String] = Map(
    "s40_stream_hourly" ->
      """SELECT date_trunc('hour', ts) AS hour, event_type, COUNT(*) AS cnt,
        | CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS sum_value
        |FROM events GROUP BY 1, 2 ORDER BY hour, event_type""".stripMargin,
    "s41_stream_dedup" ->
      """SELECT DISTINCT user_id % 100 AS user_bucket, event_type
        |FROM events ORDER BY user_bucket, event_type""".stripMargin,
  )
}
