package graft.operators

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkTestSession

class DedupSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  import spark.implicits._

  lazy val docs = spark.read.parquet(s"${SparkTestSession.sf001}/documents.parquet")

  test("exact dedup finds planted duplicates") {
    val withDups = docs.select($"doc_id", $"text")
      .union(docs.select($"doc_id" + 10000, $"text").where($"doc_id" < 10))
    val groups = Dedup.exactGroups(withDups, "doc_id", "text")
    assert(groups.count() == 500)
    assert(groups.where($"copies" === 2).count() == 10)
    // keeper is always the min id → the original row
    assert(groups.where($"copies" === 2).where($"keeper" >= 10000).count() == 0)
    assert(Dedup.exactDedup(withDups, "doc_id", "text").count() == 500)
  }

  test("digest-grouped exact dedup equals the body-grouped ground truth") {
    val withDups = docs.select($"doc_id", $"text")
      .union(docs.select($"doc_id" + 10000, $"text").where($"doc_id" < 10))
    val byText = Dedup.exactGroups(withDups, "doc_id", "text")
      .select($"keeper", $"copies").collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    val byDigest = Dedup.exactGroupsByDigest(withDups, "doc_id", "text")
      .select($"keeper", $"copies").collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(byDigest == byText)
    // the digest is the portable sha-256 hex (64 lowercase hex chars)
    val d = Dedup.exactGroupsByDigest(withDups, "doc_id", "text")
      .select($"digest").head().getString(0)
    assert(d.matches("[0-9a-f]{64}"))
  }

  test("minhash-LSH near-dups equal exact n-gram jaccard ground truth") {
    val exact = Dedup.ngramJaccardPairs(docs, "doc_id", "text", threshold = 0.5)
      .select("i", "j").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val lsh = Dedup.minhashNearDups(docs, "doc_id", "text", threshold = 0.5)
      .select("i", "j").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(exact.nonEmpty, "corpus should contain planted near-dups")
    assert(lsh == exact, s"LSH missed ${exact -- lsh}, extra ${lsh -- exact}")
  }

  test("connected components label chains, stars and pairs by min id") {
    // chain 1-2-3-4, star 10-{11,12,13}, pair 20-21; node order scrambled
    val pairs = Seq((2L, 1L), (3L, 2L), (3L, 4L), (10L, 11L), (12L, 10L),
      (13L, 10L), (21L, 20L)).toDF("i", "j")
    val got = Dedup.connectedComponents(pairs)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val want = Map(1L -> 1L, 2L -> 1L, 3L -> 1L, 4L -> 1L,
      10L -> 10L, 11L -> 10L, 12L -> 10L, 13L -> 10L, 20L -> 20L, 21L -> 20L)
    assert(got == want)
    // cluster resolution keeps exactly one doc (the min) per component
    val losers = Dedup.clusterLosers(pairs).collect().map(_.getLong(0)).toSet
    assert(losers == Set(2L, 3L, 4L, 11L, 12L, 13L, 21L))
  }

  test("connected components match union-find on random graphs") {
    val rnd = new scala.util.Random(20260812L)
    for (trial <- 1 to 3) {
      val n = 40 + trial * 10
      val edges = Seq.fill(n)((rnd.nextInt(n).toLong, rnd.nextInt(n).toLong))
        .filter { case (a, b) => a != b }
      // union-find ground truth
      val parent = scala.collection.mutable.Map[Long, Long]()
      def find(x: Long): Long = {
        val p = parent.getOrElseUpdate(x, x)
        if (p == x) x else { val r = find(p); parent(x) = r; r }
      }
      edges.foreach { case (a, b) =>
        val (ra, rb) = (find(a), find(b))
        if (ra != rb) parent(math.max(ra, rb)) = math.min(ra, rb)
      }
      val want = parent.keys.map(k => k -> find(k)).toMap
      val got = Dedup.connectedComponents(edges.toDF("i", "j"))
        .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
      assert(got == want, s"trial $trial: ${got.toSeq.sorted} vs ${want.toSeq.sorted}")
    }
  }

  test("connected components converge on a long chain (pointer jumping)") {
    // a 64-node chain: naive per-hop propagation would need 63 rounds;
    // pointer jumping converges well inside the 25-iteration cap
    val chain = (0L until 63L).map(k => (k, k + 1)).toDF("i", "j")
    val got = Dedup.connectedComponents(chain).collect()
    assert(got.length == 64 && got.forall(_.getLong(1) == 0L))
  }

  test("minhash signature similarity approximates jaccard") {
    val a = Seq(("x y z a b c d e f g", 1L), ("x y z a b c d e f h", 2L),
      ("completely different words here now ok", 3L)).toDF("text", "id")
    val sigs = a.select($"id", Dedup.minhashSignature(Dedup.shingles($"text")).as("sig"))
      .collect().map(r => r.getLong(0) -> r.getSeq[Long](1)).toMap
    def simEst(x: Seq[Long], y: Seq[Long]) =
      x.zip(y).count { case (p, q) => p == q }.toDouble / x.size
    assert(simEst(sigs(1L), sigs(2L)) > simEst(sigs(1L), sigs(3L)))
  }

  test("simhash near-dups have high token overlap, hamming bounded") {
    // simhash similarity lives in token-multiset space (not 3-gram space),
    // so validate pairs against token-set jaccard
    val tokenSets = docs.select($"doc_id", $"text").collect()
      .map(r => r.getLong(0) -> r.getString(1).split("\\s+").filter(_.nonEmpty).toSet).toMap
    val sim = Dedup.simhashNearDups(docs, "doc_id", "text", maxHamming = 3).collect()
    assert(sim.nonEmpty)
    sim.foreach { r =>
      assert(r.getInt(2) <= 3)
      val (a, b) = (tokenSets(r.getLong(0)), tokenSets(r.getLong(1)))
      val jac = (a & b).size.toDouble / (a | b).size
      assert(jac >= 0.4, s"simhash pair ${(r.getLong(0), r.getLong(1))} token-jaccard $jac")
    }
  }

  test("simhash of identical token streams is identical; near docs are close") {
    val sigs = Seq("a b c d e f g h i j", "a b c d e f g h i j", "a b c d e f g h i k")
      .zipWithIndex.map { case (t, i) => (i.toLong, t) }
      .toDF("id", "text")
    val out = Dedup.simhashSignatures(sigs, "id", "text")
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(out(0L) == out(1L))
    assert(java.lang.Long.bitCount(out(0L) ^ out(2L)) < 16)
  }

  test("ngram jaccard pipeline has no cartesian product in the plan") {
    val plan = Dedup.ngramJaccardPairs(docs, "doc_id", "text", 0.5)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("Cartesian"), s"plan contains a cross join:\n$plan")
  }

  test("ngram jaccard values stay exact when the df cap is active") {
    def run(cap: Int) = Dedup.ngramJaccardPairs(docs, "doc_id", "text", 0.5, maxShingleDf = cap)
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> (r.getLong(2), r.getLong(3))).toMap
    val uncapped = run(1000000)
    val capped = run(3) // aggressively capped → candidate recall drops…
    assert(capped.nonEmpty && capped.keySet.subsetOf(uncapped.keySet))
    // …but every surviving pair's (inter, uni) must be EXACT, not
    // computed from the thinned postings
    capped.foreach { case (pair, v) =>
      assert(uncapped(pair) == v, s"pair $pair values differ under cap")
    }
  }

  test("contamination flags exactly the docs sharing a shingle with the benchmark") {
    val bench = Seq((100L, "the quick brown fox jumps over the lazy dog")).toDF("doc_id", "text")
    val corpus = Seq(
      (1L, "xx quick brown fox jumps yy"),            // shares "quick brown fox jumps"
      (2L, "totally different words entirely here"),  // clean
      (3L, "over the lazy dog and more and more"),    // shares "over the lazy dog"
    ).toDF("doc_id", "text")
    val out = Dedup.contaminatedDocs(corpus, bench, "doc_id", "text", shingleN = 4)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(out == Map(1L -> 1L, 3L -> 1L))
    // sub-n-token and blank docs have no true n-grams: a blank benchmark
    // entry must NOT flag blank corpus docs via the degenerate
    // whole-text shingle
    val bench2 = bench.union(Seq((101L, ""), (102L, "tiny doc")).toDF("doc_id", "text"))
    val corpus2 = corpus.union(Seq((4L, ""), (5L, "tiny doc")).toDF("doc_id", "text"))
    val out2 = Dedup.contaminatedDocs(corpus2, bench2, "doc_id", "text", shingleN = 4)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(out2 == Map(1L -> 1L, 3L -> 1L))
  }

  test("connectedComponents releases its loop checkpoints (only final labels persist)") {
    val sc = spark.sparkContext
    val before = sc.getPersistentRDDs.keySet
    val pairs = Seq((1L, 2L), (2L, 3L), (3L, 4L), (10L, 11L)).toDF("i", "j")
    val labels = Dedup.connectedComponents(pairs)
    val out = labels.collect().map(r => (r.getLong(0), r.getLong(1))).toMap
    assert(out == Map(1L -> 1L, 2L -> 1L, 3L -> 1L, 4L -> 1L, 10L -> 10L, 11L -> 10L))
    // edges + every superseded round must be unpersisted; the final
    // labels checkpoint is the one surviving block set (the caller —
    // here — still has to consume it, so it cannot self-release)
    val leaked = sc.getPersistentRDDs.keySet -- before
    assert(leaked.size <= 1, s"leaked persistent RDDs: $leaked")
    org.apache.spark.sql.graft.Bridge.unpersistCheckpoint(labels)
    assert((sc.getPersistentRDDs.keySet -- before).isEmpty)
  }

  test("incremental dedup drops exact and near copies of the existing corpus only") {
    val old = Seq(
      (1L, "the quick brown fox jumps over the lazy dog"),
      (2L, "pack my box with five dozen liquor jugs"),
    ).toDF("doc_id", "text")
    val fresh = Seq(
      (10L, "the quick brown fox jumps over the lazy dog"), // exact copy → drop
      (11L, "the quick brown fox jumps over the lazy cat"), // near-dup → drop
      (12L, "completely unrelated sentence about gardening tools"), // keep
      (13L, "completely unrelated sentence about gardening tools"), // within-batch dup → KEEP (not this op's job)
    ).toDF("doc_id", "text")
    val kept = Dedup.incrementalDedup(fresh, old, "doc_id", "text", threshold = 0.5)
      .select("doc_id").collect().map(_.getLong(0)).toSet
    assert(kept == Set(12L, 13L))
  }

  test("prepared-snapshot incremental dedup is answer-identical to the unprepared path") {
    // the r16 s87 optimization: corpus-side frames built once per
    // snapshot instead of once per batch — admission decisions must not
    // move. Includes an exact copy, a near-dup, a keeper, and a
    // within-batch dup (kept — not this operator's job), across two
    // disjoint "micro-batches" to mirror the streaming use.
    val old = Seq(
      (1L, "the quick brown fox jumps over the lazy dog"),
      (2L, "pack my box with five dozen liquor jugs"),
      (3L, "sphinx of black quartz judge my vow today ok"),
    ).toDF("doc_id", "text")
    val fresh = Seq(
      (10L, "the quick brown fox jumps over the lazy dog"),
      (11L, "the quick brown fox jumps over the lazy cat"),
      (12L, "completely unrelated sentence about gardening tools"),
      (13L, "completely unrelated sentence about gardening tools"),
      (14L, "pack my box with five dozen liquor jugs"),
      (15L, "sphinx of black quartz judge my vow today maybe"),
    ).toDF("doc_id", "text")
    val snap = Dedup.prepareIncrementalCorpus(old, "doc_id", "text")
    try {
      for (parity <- 0 to 1) {
        val batch = fresh.where(pmod($"doc_id", lit(2)) === parity)
        val viaSnap = Dedup.incrementalDedupPrepared(batch, snap, "doc_id", "text", threshold = 0.5)
          .select("doc_id").collect().map(_.getLong(0)).toSet
        val direct = Dedup.incrementalDedup(batch, old, "doc_id", "text", threshold = 0.5)
          .select("doc_id").collect().map(_.getLong(0)).toSet
        assert(viaSnap == direct, s"parity $parity: $viaSnap != $direct")
      }
    } finally Seq(snap.digests, snap.oldSh, snap.lightOld)
      .foreach(df => org.apache.spark.sql.graft.Bridge.unpersistCheckpoint(df))
  }

  test("prepared path plans the Bloom prefilter and the size band ahead of the verify") {
    // r17: the snapshot's Bloom over the capped postings' shingle keys
    // must filter the NEW side's exploded shingles BEFORE the candidate
    // exchange (guide §3.2), and the size band (J ≤ min/max set sizes)
    // must sit in/below the candidate join — ahead of the distinct and
    // the pair-expanded exact verify. foreachBatch plans are invisible
    // to explain, so this is the programmatic pin for the s87 claim.
    val old = Seq(
      (1L, "the quick brown fox jumps over the lazy dog"),
      (2L, "pack my box with five dozen liquor jugs"),
    ).toDF("doc_id", "text")
    val fresh = Seq(
      (10L, "the quick brown fox jumps over the lazy cat"),
    ).toDF("doc_id", "text")
    val snap = Dedup.prepareIncrementalCorpus(old, "doc_id", "text")
    try {
      val plan = Dedup.incrementalDedupPrepared(fresh, snap, "doc_id", "text", threshold = 0.5)
        .queryExecution.executedPlan.toString
      assert(plan.contains("UDF(s#"),
        s"no Bloom-prefilter UDF on the exploded new-side shingles in:\n$plan")
      assert(plan.contains("least(n_i") && plan.contains("greatest(n_i"),
        s"no size-band condition on the candidate pairs in:\n$plan")
      // the unprepared path carries the band but must NOT pay a Bloom
      val unprep = Dedup.incrementalDedup(fresh, old, "doc_id", "text", threshold = 0.5)
        .queryExecution.executedPlan.toString
      assert(!unprep.contains("UDF(s#"),
        "unprepared path unexpectedly plans a Bloom prefilter (extra corpus pass)")
      assert(unprep.contains("least(n_i"), "unprepared path lost the size band")
    } finally Seq(snap.digests, snap.oldSh, snap.lightOld)
      .foreach(df => org.apache.spark.sql.graft.Bridge.unpersistCheckpoint(df))
  }

  test("cross-corpus jaccard pairs: only cross-side pairs, values exact") {
    val a = Seq((1L, "w1 w2 w3 w4 w5")).toDF("doc_id", "text")
    val b = Seq((2L, "w1 w2 w3 w4 w5 w6"), (3L, "x y z q r s")).toDF("doc_id", "text")
    val rows = Dedup.crossNgramJaccardPairs(a, b, "doc_id", "text", threshold = 0.1)
      .collect()
    assert(rows.length == 1)
    val r = rows.head
    // 3-shingles: a has 3, b(2) has 4, shared 3 → jaccard 3/4
    assert(r.getLong(0) == 1L && r.getLong(1) == 2L && r.getDouble(2) == 0.75)
  }

  test("fingerprint set equals the direct per-window hash chain, sampled and distinct") {
    val rnd = new scala.util.Random(7)
    for (_ <- 1 to 50) {
      val len = rnd.nextInt(60)
      val s = (0 until len).map(_ => ('a' + rnd.nextInt(4)).toChar).mkString
      val bytes = s.getBytes("UTF-8")
      val w = math.min(16, math.max(bytes.length, 1))
      val direct = (0 to bytes.length - w).map { i =>
        bytes.slice(i, i + w).foldLeft(0L)((acc, b) => (acc * 257 + (b & 0xff)) % 2147483647L)
      }.filter(_ % 8 == 0).distinct.sorted
      val got = graft.core.TextHash.fingerprintSet(bytes, 16, 8).toSeq
      assert(got == direct, s"mismatch for '$s'")
    }
    assert(graft.core.TextHash.fingerprintSet(Array.emptyByteArray, 16, 8).isEmpty)
  }

  test("winnowed copy detection finds planted substring copies, exact shared counts") {
    val base = "the quick brown fox jumps over the lazy dog while the cat sleeps by the warm fire"
    val docs = Seq(
      (1L, base),
      (2L, "PREFIX " + base + " SUFFIX"),      // shares every interior window
      (3L, "totally unrelated words qqq zzz xyxyxyx kkk mmmm pppp wwww")
    ).toDF("doc_id", "text")
    val pairs = Dedup.fingerprintOverlapPairs(docs, "doc_id", "text", minShared = 1)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    assert(pairs.exists { case (i, j, _) => i == 1L && j == 2L }, s"missed copy pair: ${pairs.toSeq}")
    assert(!pairs.exists { case (i, j, _) => j == 3L || i == 3L }, s"false pair: ${pairs.toSeq}")
    // shared count == exact intersection of the two full fingerprint sets
    val f1 = graft.core.TextHash.fingerprintSet(base.getBytes("UTF-8"), 16, 8).toSet
    val f2 = graft.core.TextHash.fingerprintSet(("PREFIX " + base + " SUFFIX").getBytes("UTF-8"), 16, 8).toSet
    val want = (f1 & f2).size.toLong
    assert(pairs.collect { case (1L, 2L, n) => n }.head == want)
  }

  test("repeated spans: cross-doc only, overlap+adjacency merge, maximal extents") {
    // docs 1/2 share tokens 0..9 verbatim (11 windows of 3 → one merged
    // span 0..9); doc 1 additionally shares its TAIL (20..27) with doc 3
    // — a second, separate span; doc 4 repeats a 3-gram only WITHIN
    // itself (must not be marked — the threshold is distinct docs);
    // doc 5 has no repeats.
    val shared = (0 to 9).map(i => s"s$i").mkString(" ")
    val tail = (0 to 7).map(i => s"t$i").mkString(" ")
    val docs = Seq(
      (1L, s"$shared u0 u1 u2 u3 u4 u5 u6 u7 u8 u9 $tail"),
      (2L, s"$shared v0 v1 v2"),
      (3L, s"w0 w1 w2 $tail"),
      (4L, "x0 x1 x2 q q q x0 x1 x2"),
      (5L, "p0 p1 p2 p3 p4 p5")
    ).toDF("doc_id", "text")
    val got = Dedup.repeatedSpans(docs, "doc_id", "text", n = 3)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3))).toSet
    assert(got == Set(
      (1L, 0L, 9L, 10L),   // merged maximal span over 8 overlapping windows
      (1L, 20L, 27L, 8L),  // disjoint second span, 0-based positions
      (2L, 0L, 9L, 10L),
      (3L, 3L, 10L, 8L)))
  }

  test("span redaction: removes exactly the spans, keeps order, empties fully-duplicated docs") {
    val shared = (0 to 9).map(i => s"s$i").mkString(" ")
    val docs = Seq(
      (1L, s"$shared v0 v1 v2"),  // head duplicated -> tail survives
      (2L, s"w0 w1 $shared"),     // tail duplicated -> head survives
      (3L, shared),               // ENTIRE doc duplicated -> empty clean_text
      (4L, "p0 p1 p2 p3 p4 p5")   // untouched -> not emitted at all
    ).toDF("doc_id", "text")
    val got = Dedup.redactRepeatedSpans(docs, "doc_id", "text", n = 3)
      .collect().map(r => r.getLong(0) -> ((r.getLong(1), r.getString(2)))).toMap
    assert(got == Map(
      1L -> ((10L, "v0 v1 v2")),
      2L -> ((10L, "w0 w1")),
      3L -> ((10L, ""))))
  }

  test("repeated spans match a brute-force reference on random corpora") {
    // reference: literal n-gram occurrence map → marked windows →
    // interval merge, all in plain Scala over the token sequences
    def reference(corpus: Seq[(Long, Seq[String])], n: Int): Set[(Long, Long, Long, Long)] = {
      val byGram = corpus.flatMap { case (id, tk) =>
        tk.sliding(n).zipWithIndex.filter(_._1.length == n)
          .map { case (g, pos) => (g.mkString(" "), id, pos) }
      }.groupBy(_._1)
      val dup = byGram.filter(_._2.map(_._2).distinct.length >= 2).keySet
      corpus.flatMap { case (id, tk) =>
        val marked = tk.sliding(n).zipWithIndex
          .filter { case (g, _) => g.length == n && dup(g.mkString(" ")) }
          .map(_._2).toList
        val spans = marked.foldLeft(List.empty[(Int, Int)]) {
          case ((s0, e0) :: rest, pos) if pos <= e0 + 1 => (s0, math.max(e0, pos + n - 1)) :: rest
          case (acc, pos) => (pos, pos + n - 1) :: acc
        }.reverse
        spans.map { case (s0, e0) => (id, s0.toLong, e0.toLong, (e0 - s0 + 1).toLong) }
      }.toSet
    }
    val rnd = new scala.util.Random(4242)
    val vocab = Vector("a", "b", "c", "d", "e")
    (1 to 15).foreach { trial =>
      // tiny vocab + short docs force plenty of chance n-gram repeats,
      // including adjacent/overlapping marks and within-doc-only ones
      val corpus = (0L until (3 + rnd.nextInt(5)).toLong).map { id =>
        id -> Seq.fill(3 + rnd.nextInt(18))(vocab(rnd.nextInt(vocab.length)))
      }
      val df = corpus.map { case (id, tk) => (id, tk.mkString(" ")) }.toDF("doc_id", "text")
      val got = Dedup.repeatedSpans(df, "doc_id", "text", n = 3)
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3))).toSet
      val want = reference(corpus, 3)
      assert(got == want, s"trial $trial: got ${got -- want} extra, missed ${want -- got}\\ncorpus: $corpus")
    }
  }

  test("duplicate-shingle fraction counts cross-doc shingles, not within-doc repeats") {
    // doc 1 and 2 share "a b c"/"b c d" (their only shingles overlap);
    // doc 3 is all-unique; doc 4 repeats its own shingle (distinct set,
    // so within-doc repetition must NOT count as duplication)
    val docs = Seq(
      (1L, "a b c d"),        // shingles: "a b c","b c d"
      (2L, "a b c d e"),      // "a b c","b c d","c d e"
      (3L, "p q r s"),        // unique
      (4L, "x y z x y z x y z") // 7 shingles, distinct→{xyz,yzx,zxy}, df=1 each
    ).toDF("doc_id", "text")
    val got = Dedup.duplicateShingleStats(docs, "doc_id", "text")
      .collect().map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2), r.getDouble(3)))).toMap
    assert(got(1L) == ((2L, 2L, 1.0)))
    assert(got(2L) == ((3L, 2L, 0.666667)))
    assert(got(3L) == ((2L, 0L, 0.0)))
    assert(got(4L) == ((3L, 0L, 0.0)))
  }

  test("asciiGuarded: non-ASCII text fails LOUDLY with the gate name; ASCII passes through") {
    import org.apache.spark.sql.functions.{col, lit, concat}
    val ok = Seq((1L, "plain ascii text only")).toDF("doc_id", "text")
    assert(ok.select(Dedup.asciiGuarded(col("text"), "gateX"))
      .collect()(0).getString(0) == "plain ascii text only")
    // a UTF-8 corpus must fail the oracle-coupled gates DIAGNOSABLY —
    // a named encoding error at the scan, not a hash mismatch later
    val bad = Seq((1L, "plain"), (2L, "caf\u00e9 au lait")).toDF("doc_id", "text")
    val ex = intercept[Exception] {
      Dedup.minhashNearDupStats(
        bad.withColumn("text", Dedup.asciiGuarded(col("text"), "d79_source_overlap_minhash")),
        "doc_id", "text", threshold = 0.5).collect()
    }
    def messages(t: Throwable): Seq[String] =
      Option(t).toSeq.flatMap(e => Option(e.getMessage).toSeq ++ messages(e.getCause))
    val msg = messages(ex).mkString(" | ")
    assert(msg.contains("d79_source_overlap_minhash") &&
      msg.contains("ord-vs-bytes"), s"unexpected failure: $msg")
  }

  test("wordShingleHashes folds UTF-8 BYTES on non-ASCII text (golden FNV-1a64)") {
    // goldens computed independently (FNV-1a64 over the UTF-8 bytes of
    // each 3-word shingle, tokens split on ASCII whitespace) — pins the
    // byte fold d83's hex-pair oracle recompute must land on exactly,
    // on text where a code-point fold would give different values
    val got = graft.core.TextHash
      .wordShingleHashes("cät dßg aé汉 x".getBytes("UTF-8"), 3).sorted
    assert(got.toSeq == Seq(2800320183827739175L, 4448855916474178123L).sorted)
  }

  test("d83's corpus derivation is genuinely non-ASCII and trips the guard") {
    // the same translation d83 applies: multi-byte UTF-8 replacements,
    // so octet_length > char length wherever a/e/o occurred — i.e. the
    // corpus sits on the far side of the boundary asciiGuarded polices
    val docs = Seq((1L, "a quick test of encodings")).toDF("doc_id", "text")
      .select($"doc_id", translate($"text", "aeo", "äéß").as("text"))
    val r = docs.select(octet_length($"text").as("b"), length($"text").as("c")).head()
    assert(r.getInt(0) > r.getInt(1))
    assertThrows[Exception] {
      docs.select(Dedup.asciiGuarded($"text", "gateY")).collect()
    }
  }
}
