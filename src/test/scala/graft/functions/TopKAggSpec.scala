package graft.functions

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkTestSession

class TopKAggSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  import spark.implicits._

  lazy val orders = spark.read.parquet(s"${SparkTestSession.sf001}/orders.parquet")

  test("agrees with the row_number window form, including ties") {
    val viaAgg = orders
      .groupBy($"o_orderstatus")
      .agg(TopKAgg.top_k($"o_totalprice", $"o_orderkey", 5).as("tk"))
      .select($"o_orderstatus", posexplode($"tk"))
      .select($"o_orderstatus", ($"pos" + 1).cast("long").as("rk"),
        $"col._2".as("o_orderkey"), $"col._1".as("o_totalprice"))
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getDouble(3))).toSet
    val w = Window.partitionBy("o_orderstatus").orderBy($"o_totalprice".desc, $"o_orderkey")
    val viaWindow = orders
      .withColumn("rk", row_number().over(w)).where($"rk" <= 5)
      .select($"o_orderstatus", $"rk".cast("long"), $"o_orderkey", $"o_totalprice")
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getDouble(3))).toSet
    assert(viaAgg == viaWindow)
  }

  test("deterministic across partitionings") {
    def run(df: org.apache.spark.sql.DataFrame) = df
      .agg(TopKAgg.top_k($"o_totalprice", $"o_orderkey", 7))
      .collect()(0).getSeq[org.apache.spark.sql.Row](0)
      .map(r => (r.getDouble(0), r.getLong(1)))
    assert(run(orders) == run(orders.repartition(13)))
  }

  test("NaN and -0.0 scores rank exactly as Spark's window sort ranks them") {
    val df = Seq(
      (Double.NaN, 1L), (2.0, 2L), (Double.NaN, 3L), (-0.0, 4L),
      (0.0, 5L), (Double.NegativeInfinity, 6L), (Double.PositiveInfinity, 7L)
    ).toDF("s", "id")
    val viaAgg = df.agg(TopKAgg.top_k($"s", $"id", 5))
      .collect()(0).getSeq[org.apache.spark.sql.Row](0)
      .map(r => r.getLong(1))
    val w = Window.partitionBy(lit(1)).orderBy($"s".desc, $"id")
    val viaWindow = df.withColumn("rk", row_number().over(w)).where($"rk" <= 5)
      .orderBy("rk").collect().map(_.getLong(1)).toSeq
    assert(viaAgg == viaWindow, s"$viaAgg vs $viaWindow")
  }

  test("buffer never exceeds k and stays ranked") {
    val agg = new TopKAgg(3)
    var b = agg.zero
    Seq((5.0, 10L), (7.0, 2L), (5.0, 3L), (9.0, 8L), (1.0, 1L), (9.0, 4L)).foreach {
      case (s, i) => b = agg.reduce(b, (Double.box(s), Long.box(i)))
    }
    assert(b.length == 3)
    assert(b.toSeq == Seq((9.0, 4L), (9.0, 8L), (7.0, 2L)))
    // merge keeps the global order and the bound
    val other = agg.reduce(agg.zero, (Double.box(8.0), Long.box(99L)))
    assert(agg.merge(b, other).toSeq == Seq((9.0, 4L), (9.0, 8L), (8.0, 99L)))
  }
}
