package graft

import org.apache.spark.sql.SparkSession

/** Per-query session cleanup shared by Bench and Verify. */
object SessionHygiene {

  /**
   * Drop tracked caches AND leftover localCheckpoint blocks (which the
   * CacheManager never sees — getPersistentRDDs is the only handle), so
   * one query's persisted state can never poison the queries after it.
   * The round-2 bench regressed 1.7× from exactly this: leaked
   * checkpoint blocks degrading every query that ran later in the
   * session.
   */
  def sweep(spark: SparkSession): Unit = {
    spark.catalog.clearCache()
    spark.sparkContext.getPersistentRDDs.values.foreach(_.unpersist(false))
  }
}
