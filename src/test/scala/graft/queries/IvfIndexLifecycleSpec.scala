package graft.queries

import java.nio.file.{Files, Paths}

import org.scalatest.funsuite.AnyFunSuite

import graft.SparkTestSession

/**
 * Lifecycle contract of the persisted IVF index (build → append →
 * self-heal): the digest chain must survive a hand-damaged generation
 * by rebuilding, never by surfacing a raw filesystem exception.
 */
class IvfIndexLifecycleSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark
  import spark.implicits._

  /** Tiny deterministic corpus in a fresh dir (its own index root). */
  private def freshCorpus(): String = {
    val d = java.nio.file.Files.createTempDirectory("graft-ivf-life")
    d.toFile.deleteOnExit()
    val dir = d.toString
    val rnd = new scala.util.Random(11)
    (0L until 30L).map(i => (i, Seq.fill(64)(rnd.nextFloat()), (i % 3).toInt))
      .toDF("vec_id", "embedding", "label")
      .write.mode("overwrite").parquet(s"$dir/embeddings.parquet")
    dir
  }

  test("a hand-deleted base _SUCCESS between delta ensures rebuilds, not crashes") {
    val dir = freshCorpus()
    val root = PipelineQueries.ensureIvfDeltaExport(spark, dir)
    val base = Paths.get(root, "_SUCCESS")
    val deltaMarker = Paths.get(root, "delta", "_SUCCESS")
    assert(Files.exists(base) && Files.exists(deltaMarker))
    val stampBefore = new String(Files.readAllBytes(base), "UTF-8")
    // damage the generation the way an operator might: remove the base
    // marker only, leaving index files behind
    Files.delete(base)
    val root2 = PipelineQueries.ensureIvfDeltaExport(spark, dir)
    assert(root2 === root)
    assert(Files.exists(base), "the base generation must have been rebuilt")
    val stampAfter = new String(Files.readAllBytes(base), "UTF-8")
    assert(stampAfter === stampBefore,
      "same corpus → same digest stamp after the self-heal rebuild")
    assert(new String(Files.readAllBytes(deltaMarker), "UTF-8") === stampAfter,
      "the delta must be re-chained to the healed base generation")
  }
}
