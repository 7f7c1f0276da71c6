package graft.queries

import java.nio.file.{Files, Paths}

import org.scalatest.funsuite.AnyFunSuite

import graft.SparkTestSession

/**
 * Lifecycle contract of the CURATED-corpus index (s72/s73): the index
 * is digest-chained to the curation INPUT, so a fresh ensure is a
 * no-op, and regenerating the corpus invalidates and rebuilds the
 * whole artifact — the curation chain, the trained centroids, and the
 * partitioned list layout all move together.
 */
class CuratedIndexLifecycleSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark
  import spark.implicits._

  private val vocab = Seq("query", "join", "hash", "table", "scan", "stream",
    "window", "batch", "data", "column", "vector", "sort", "merge", "key", "value")

  /** ~60-word salads with a stopword cadence that clears the quality
    * gate (the curation chain must actually keep documents). */
  private def salad(id: Long, n: Int = 60): String = {
    val rnd = new scala.util.Random(id * 7919 + 17)
    (0 until n).map { i =>
      if (i % 4 == 3) "the" else vocab(rnd.nextInt(vocab.size))
    }.mkString(" ")
  }

  private def writeDocs(dir: String, ids: Range, mode: String): Unit =
    ids.map(i => (i.toLong, salad(i.toLong),
        "en", "unit", salad(i.toLong).length.toLong))
      .toDF("doc_id", "text", "lang", "source", "n_chars")
      .write.mode(mode).parquet(s"$dir/documents.parquet")

  test("curated index: fresh ensure is a no-op; corpus regeneration rebuilds with a new stamp") {
    val d = Files.createTempDirectory("graft-curated-life")
    d.toFile.deleteOnExit()
    val dir = d.toString
    writeDocs(dir, 0 until 40, "overwrite")

    val root = PipelineQueries.ensureCuratedIndexExport(spark, dir)
    val marker = Paths.get(root, "_SUCCESS")
    assert(Files.exists(marker))
    val stamp1 = new String(Files.readAllBytes(marker), "UTF-8")
    assert(stamp1 === RelationalQueries.srcDigest(dir, "documents"),
      "the marker must record the curation INPUT's digest")
    val indexed1 = spark.read.parquet(s"$root/index").count()
    assert(indexed1 >= 8, s"curation should keep enough chunks to train nlist=8: $indexed1")
    val mtime1 = Files.getLastModifiedTime(marker)

    // fresh ensure: nothing rebuilds (the marker is not rewritten)
    PipelineQueries.ensureCuratedIndexExport(spark, dir)
    assert(Files.getLastModifiedTime(marker) === mtime1,
      "a fresh ensure must not rebuild the index")

    // the corpus regenerates (new part file → new listing digest):
    // the whole artifact must rebuild under the NEW stamp
    writeDocs(dir, 40 until 60, "append")
    val root2 = PipelineQueries.ensureCuratedIndexExport(spark, dir)
    assert(root2 === root)
    val stamp2 = new String(Files.readAllBytes(marker), "UTF-8")
    assert(stamp2 !== stamp1, "a regenerated corpus must produce a new digest stamp")
    assert(stamp2 === RelationalQueries.srcDigest(dir, "documents"))
    val indexed2 = spark.read.parquet(s"$root/index").count()
    assert(indexed2 > indexed1,
      s"the rebuilt index must cover the grown corpus ($indexed1 -> $indexed2)")
  }

  test("curated index: the trained centroids are a pure function of the corpus") {
    // the same determinism contract the PCA model pins (s66): identical
    // corpus → bit-identical trained artifact, so the oracle's spliced
    // centroids are reproducible and serving answers cannot drift
    // between builds
    def build(): Array[Array[Double]] = {
      val d = Files.createTempDirectory("graft-curated-det")
      d.toFile.deleteOnExit()
      writeDocs(d.toString, 0 until 40, "overwrite")
      val root = PipelineQueries.ensureCuratedIndexExport(spark, d.toString)
      spark.read.parquet(s"$root/centroids").orderBy("cid").collect()
        .map(r => r.getSeq[Double](r.fieldIndex("centroid")).toArray)
    }
    val a = build()
    val b = build()
    assert(a.length == b.length && a.length == 8)
    a.zip(b).zipWithIndex.foreach { case ((ca, cb), i) =>
      assert(ca.sameElements(cb), s"centroid $i differs between identical-corpus builds")
    }
  }
}
