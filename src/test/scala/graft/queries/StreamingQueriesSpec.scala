package graft.queries

import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{OutputMode, Trigger}
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkTestSession

class StreamingQueriesSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark

  /** s52's claim is "cross-batch state merge, driver-checked" — that is
    * only true if the split source really replays in MULTIPLE data
    * micro-batches (a silently-ignored maxFilesPerTrigger would degrade
    * it to a second copy of s42). Pin it. */
  test("s52's split source replays in multiple micro-batches covering every row") {
    val sf = SparkTestSession.sf001
    val stream = StreamingQueries.splitEventStream(spark, sf)
      .groupBy(col("user_id")).agg(count(lit(1)).as("n"))
    spark.catalog.dropTempView("s52_probe")
    val q = stream.writeStream.outputMode(OutputMode.Complete())
      .format("memory").queryName("s52_probe")
      .trigger(Trigger.AvailableNow()).start()
    q.awaitTermination()
    val dataBatches = q.recentProgress.count(_.numInputRows > 0)
    assert(dataBatches >= 2, s"expected >= 2 data micro-batches, saw $dataBatches")
    val total = spark.table("s52_probe").agg(sum(col("n"))).head().getLong(0)
    val expect = graft.sources.Tables.load(spark, sf, "events").count()
    assert(total == expect, s"split halves must cover the table: $total != $expect")
  }
}
