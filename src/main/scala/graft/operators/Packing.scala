package graft.operators

import org.apache.spark.sql.{DataFrame, Encoders, Row}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.LongType

/**
 * Greedy sequence packing: assign ordered items (documents) to
 * consecutive packs of at most `budget` total weight (tokens) — the
 * "sample packing" step of a training-data pipeline, where documents
 * are concatenated into fixed-size context windows.
 *
 * Semantics (per group, items in `orderCol` order): append the item to
 * the current pack unless that would exceed `budget`, else start a new
 * pack; an item heavier than the whole budget occupies its own pack.
 *
 * This is inherently ORDER-STATEFUL — each pack boundary depends on all
 * previous boundaries — so no Catalyst expression/window can compute it
 * (a plain cumsum÷budget misplaces boundaries). It is the one operator
 * family where `mapPartitions` is the right tool (SURVEY.md preference
 * (d)): repartition on the group key + sortWithinPartitions gives the
 * classic secondary-sort shape, and the packing itself streams with
 * O(1) state per partition — no group is ever materialized. At 100 TB
 * the group key is the shard (here: language), so packing parallelizes
 * across shards while staying sequential within each, which is exactly
 * the semantics training pipelines want.
 */
object Packing {

  def greedyPack(df: DataFrame, groupCol: String, orderCol: String,
                 weightCol: String, budget: Long): DataFrame = {
    require(budget > 0, s"budget must be positive, got $budget")
    // fail at plan time, not as an opaque executor ClassCastException /
    // NPE mid-shuffle: the streaming fold below reads the weight as a
    // non-null long
    require(df.schema(weightCol).dataType == LongType,
      s"weight column $weightCol must be LongType, got ${df.schema(weightCol).dataType}")
    val outSchema = df.schema.add("pack_id", LongType, nullable = false)
    val gIdx = df.schema.fieldIndex(groupCol)
    val wIdx = df.schema.fieldIndex(weightCol)
    implicit val enc = Encoders.row(outSchema)
    df.repartition(col(groupCol))
      .sortWithinPartitions(col(groupCol), col(orderCol))
      .mapPartitions { rows =>
        var curGroup: Any = null
        var started = false
        var acc = 0L
        var pack = 0L
        rows.map { r =>
          val g = r.get(gIdx)
          require(!r.isNullAt(wIdx),
            s"null weight in '$weightCol' — filter or default nulls before packing")
          val w = r.getLong(wIdx)
          // deepEquals, not !=: a BinaryType group key surfaces as a
          // fresh Array[Byte] per row, whose equals() is reference-based
          if (!started || !java.util.Objects.deepEquals(g, curGroup)) {
            started = true; curGroup = g; pack = 0L; acc = w
          } else if (acc + w > budget) {
            pack += 1L; acc = w
          } else {
            acc += w
          }
          Row.fromSeq(r.toSeq :+ pack)
        }
      }
  }
}
