package graft.operators

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkTestSession
import graft.core.ClusterHash

class SamplingSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  import spark.implicits._

  lazy val docs = spark.read.parquet(s"${SparkTestSession.sf001}/documents.parquet")

  test("hash sample is deterministic, near-rate, and matches the core hash") {
    val key = concat(lit("doc:"), $"doc_id")
    val a = Sampling.hashSample(docs, key, 0.10).select("doc_id").collect().map(_.getLong(0)).toSet
    val b = Sampling.hashSample(docs, key, 0.10).select("doc_id").collect().map(_.getLong(0)).toSet
    assert(a == b, "same rows across runs")
    val n = docs.count().toDouble
    assert(math.abs(a.size / n - 0.10) < 0.05, s"rate ${a.size / n} not ~0.10")
    a.foreach(id => assert(ClusterHash.getSlot(s"doc:$id") < 1638))
  }

  test("sample is append-stable: sampling a superset keeps the original picks") {
    val key = concat(lit("doc:"), $"doc_id")
    val half = docs.where($"doc_id" < 250)
    val fromHalf = Sampling.hashSample(half, key, 0.10).select("doc_id").collect().map(_.getLong(0)).toSet
    val fromFull = Sampling.hashSample(docs, key, 0.10).select("doc_id").collect().map(_.getLong(0)).toSet
    assert(fromHalf.subsetOf(fromFull))
    assert(fromFull.filter(_ < 250) == fromHalf)
  }

  test("stratified rates apply per stratum") {
    val key = concat(lit("doc:"), $"doc_id")
    val sampled = Sampling.stratifiedHashSample(docs, key, $"lang",
      Map("en" -> 0.5, "de" -> 0.05))
    val counts = sampled.groupBy("lang").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    val totals = docs.groupBy("lang").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(counts("en").toDouble / totals("en") > 0.3)
    assert(counts.getOrElse("de", 0L).toDouble / totals("de") < 0.2)
    assert(!counts.contains("fr"), "default rate 0 excludes unlisted strata")
  }

  test("per-group cap keeps exactly the lowest-slot rows of each group") {
    val key = concat(lit("doc:"), $"doc_id")
    val capped = Sampling.capPerGroup(docs, key, "source", "doc_id", cap = 12)
    val got = capped.select("source", "doc_id").collect()
      .groupBy(_.getString(0)).view.mapValues(_.map(_.getLong(1)).toSet).toMap
    val all = docs.select("source", "doc_id").collect()
      .groupBy(_.getString(0)).view.mapValues(_.map(_.getLong(1))).toMap
    all.foreach { case (src, ids) =>
      val want = ids.sortBy(id => (ClusterHash.getSlot(s"doc:$id"), id)).take(12).toSet
      assert(got(src) == want, s"cap selection for $src")
      assert(got(src).size <= 12)
    }
    // physical layout must not change the selection
    val reshuffled = Sampling.capPerGroup(docs.repartition(13), key, "source", "doc_id", 12)
      .select("doc_id").collect().map(_.getLong(0)).toSet
    assert(reshuffled == got.values.flatten.toSet)
  }

  test("temperature sampling keeps the rarest language whole and flattens the head") {
    val key = concat(lit("doc:"), $"doc_id")
    val sampled = Sampling.temperatureSample(docs, key, "lang")
    val counts = sampled.groupBy("lang").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    val totals = docs.groupBy("lang").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    val rarest = totals.minBy(_._2)._1
    assert(counts(rarest) == totals(rarest), "rarest language keeps every row")
    // head language downsampled toward sqrt(n_min/n): realized rate
    // within hash noise of the target
    val head = totals.maxBy(_._2)._1
    val target = math.sqrt(totals(rarest).toDouble / totals(head).toDouble)
    val realized = counts(head).toDouble / totals(head)
    assert(math.abs(realized - target) < 0.15, s"head rate $realized vs target $target")
    // post-sample distribution is flatter: head/rarest ratio shrinks
    assert(counts(head).toDouble / counts(rarest) < totals(head).toDouble / totals(rarest))
    // selection is the slot-hash rule → append-stable determinism
    val again = Sampling.temperatureSample(docs, key, "lang")
      .select("doc_id").collect().map(_.getLong(0)).toSet
    assert(again == sampled.select("doc_id").collect().map(_.getLong(0)).toSet)
  }

  test("split assignment is exhaustive, near-fraction, and matches the core hash") {
    val key = concat(lit("doc:"), $"doc_id")
    val split = Sampling.assignSplit(docs, key, valFrac = 0.05, testFrac = 0.10)
      .select($"doc_id", $"split").collect()
      .map(r => (r.getLong(0), r.getString(1))).toMap
    assert(split.size == docs.count(), "every doc gets exactly one split")
    val n = split.size.toDouble
    val frac = split.values.groupBy(identity).view.mapValues(_.size / n).toMap
    assert(math.abs(frac.getOrElse("val", 0.0) - 0.05) < 0.03, frac.toString)
    assert(math.abs(frac.getOrElse("test", 0.0) - 0.10) < 0.05, frac.toString)
    // assignment is the slot rule — recompute independently per doc
    split.foreach { case (id, sp) =>
      val slot = ClusterHash.getSlot(s"doc:$id")
      val expect = if (slot < 819) "val" else if (slot < 2457) "test" else "train"
      assert(sp == expect, s"doc $id slot $slot: $sp != $expect")
    }
  }

  test("sampled quantiles track the exact full-corpus quantiles") {
    val li = spark.read.parquet(s"${SparkTestSession.sf001}/lineitem.parquet")
    val key = concat(lit("li:"), $"l_orderkey", lit(":"), $"l_linenumber")
    def qs(df: org.apache.spark.sql.DataFrame): Array[Double] =
      df.select(expr("percentile(l_extendedprice, array(0.25, 0.5, 0.75, 0.95))"))
        .collect()(0).getSeq[Double](0).toArray
    val exact = qs(li)
    val est = qs(Sampling.hashSample(li, key, 0.02))
    val range = li.agg(max($"l_extendedprice") - min($"l_extendedprice"))
      .collect()(0).getDouble(0)
    exact.zip(est).zipWithIndex.foreach { case ((e, a), i) =>
      val err = math.abs(a - e) / range
      info(f"q$i: exact $e%.1f est $a%.1f relerr $err%.3f")
      // ~120-row sample at sf0.001 → DKW-style bound ~1.36/sqrt(n) on the
      // CDF; against a uniform-ish value distribution that is ~0.12 of
      // the range (measured well under at pin time)
      assert(err <= 0.15, f"quantile $i off by $err%.3f of range")
    }
  }

  test("mixture family: NULL stratum meets its own weight instead of vanishing") {
    // the temperatureSample rule, pinned on the mixture operators too
    // (the r12 review's finding): rows with a failed language ID form
    // their own stratum — a plain equi-join would drop every one of
    // them while their weight still shaped the target arithmetic
    val rows = (0L until 300L).map { i =>
      val lang = if (i % 3 == 0) null else if (i % 3 == 1) "en" else "de"
      (i, lang, 10L)
    }.toDF("doc_id", "lang", "n_tokens")
    val key = concat(lit("mx:"), $"doc_id")
    val kept = Sampling.mixtureResample(rows, "lang", "n_tokens", key)
    val keptNull = kept.where($"lang".isNull).count()
    // three equal-mass strata → every weight is exactly 1.0, so ALL
    // rows (including the 100 NULL-lang ones) must survive
    assert(kept.count() == 300 && keptNull == 100,
      s"NULL stratum lost rows: total ${kept.count()}, null $keptNull")
    val ep = Sampling.mixtureEpochs(rows, "lang", "n_tokens", key)
    assert(ep.where($"lang".isNull).select("doc_id").distinct().count() == 100,
      "NULL stratum vanished from the epochs output")
    // and a skewed mass: NULL overrepresented → downsampled, not dropped
    val skew = (0L until 300L).map { i =>
      (i, if (i < 200) null else "en", 10L)
    }.toDF("doc_id", "lang", "n_tokens")
    val keptSkew = Sampling.mixtureResample(skew, "lang", "n_tokens", key)
      .where($"lang".isNull).count()
    assert(keptSkew > 0 && keptSkew < 200,
      s"overrepresented NULL stratum should thin, not vanish/persist: $keptSkew")
  }

  test("mixture guard: past 16384 strata the heaviest stratum never vanishes") {
    // w >= 1/L holds by construction, so the one-slot floor can only
    // bind past 16384 strata: 20k singleton strata + one heavy stratum
    // whose weight floors to ZERO slots without the guard
    import org.apache.spark.sql.functions._
    val light = (1L to 20000L).map(i => (i, s"s$i", 1L))
    val heavy = (1L to 150000L).map(i => (1000000L + i, "h", 1000L))
    val df = (light ++ heavy).toDF("id", "dom", "mass").repartition(8)
    // the guard gives the heavy stratum EXACTLY one slot, so the kept
    // set is exactly its slot-0 keys — pin equality, not just existence
    def slot0(prefix: String) = df.where($"dom" === "h").where(
      graft.functions.ClusterHashFunctions.cluster_slot(
        concat(lit(prefix), $"id")) === 0).count()
    val kept = Sampling.mixtureResample(df, "dom", "mass",
      concat(lit("g:"), $"id"))
    val keptHeavy = kept.where($"dom" === "h").count()
    assert(slot0("g:") > 0, "fixture too small to exercise the floor")
    assert(keptHeavy == slot0("g:"),
      s"heavy stratum kept $keptHeavy, expected its slot-0 keys ${slot0("g:")}")
    // light strata: w capped at 1 -> kept whole
    assert(kept.where($"dom" =!= "h").count() == 20000)
    // epochs form: zero whole epochs + the guarded fractional slot
    val ep = Sampling.mixtureEpochs(df, "dom", "mass",
      concat(lit("e:"), $"id"), maxEpochs = 4.0)
    assert(slot0("e:") > 0, "fixture too small to exercise the floor")
    assert(ep.where($"dom" === "h").count() == slot0("e:"),
      "heavy stratum's epochs must be exactly its slot-0 keys")
    assert(ep.where($"dom" =!= "h").groupBy("id").count()
      .agg(min("count")).head().getLong(0) >= 1)
  }

  test("weighted mixture: a uniform dyadic target reproduces the equal-share family bit-for-bit") {
    // L = 4 strata with share 0.25 each: stot = 1.0 exactly, and
    // 0.25·T = T/4 exactly (both round the same real), so the targeted
    // path's w equals the equal-share path's w in every bit — the
    // uniform ≡ today pin the r12 verdict asked for. (At L not a power
    // of two the two op orders can differ in the last ulp; the
    // contract is the kept set, and the 4-stratum case pins the
    // arithmetic itself.)
    val rows = (1L to 400L).map(i => (i, s"s${i % 4}", 1L + i % 7))
    val df = rows.toDF("id", "stratum", "mass")
    val key = concat(lit("umx:"), $"id")
    def ids(d: org.apache.spark.sql.DataFrame) =
      d.select("id").collect().map(_.getLong(0)).toSet
    val equalShare = ids(Sampling.mixtureResample(df, "stratum", "mass", key))
    val uniform = ids(Sampling.mixtureResampleTo(df, "stratum", "mass", key,
      shares = Map.empty, defaultShare = 0.25))
    assert(uniform == equalShare)
    def eps(d: org.apache.spark.sql.DataFrame) =
      d.select("id", "epoch").collect().map(r => (r.getLong(0), r.getInt(1))).toSet
    val eqEp = eps(Sampling.mixtureEpochs(df, "stratum", "mass", key, maxEpochs = 4.0))
    val unEp = eps(Sampling.mixtureEpochsTo(df, "stratum", "mass", key,
      shares = Map.empty, maxEpochs = 4.0, defaultShare = 0.25))
    assert(unEp == eqEp)
  }

  test("weighted mixture: non-uniform shares move the kept masses toward the target") {
    // two equal-mass strata, target 3:1 — the downweighted stratum
    // keeps ~1/2 of its rows ((0.25/1.0)·T/t = 0.5·16384 slots), the
    // upweighted one keeps everything (w capped at 1)
    val rows = (1L to 2000L).map(i => (i, if (i % 2 == 0) "big" else "small", 1L))
    val df = rows.toDF("id", "stratum", "mass")
    val key = concat(lit("wmx:"), $"id")
    val kept = Sampling.mixtureResampleTo(df, "stratum", "mass", key,
        shares = Map("big" -> 0.75, "small" -> 0.25))
      .groupBy("stratum").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(kept("big") == 1000L, s"w >= 1 stratum must keep everything: $kept")
    assert(math.abs(kept("small") - 500.0) / 500.0 < 0.15,
      s"0.5-weight stratum should keep ~half: $kept")
  }

  test("weighted mixture: a ZERO share floors at one slot — downsample never means drop") {
    val rows = (1L to 3000L).map(i => (i, if (i % 2 == 0) "keep" else "zero", 1L))
    val df = rows.toDF("id", "stratum", "mass")
    val key = concat(lit("zmx:"), $"id")
    val kept = Sampling.mixtureResampleTo(df, "stratum", "mass", key,
      shares = Map("keep" -> 1.0, "zero" -> 0.0))
    val zeroKept = kept.where($"stratum" === "zero").select("id")
      .collect().map(_.getLong(0)).toSet
    // exactly the rows whose slot clears the one-slot floor (slot 0)
    val expect = rows.filter(_._2 == "zero").map(_._1)
      .filter(i => ClusterHash.getSlot(s"zmx:$i") < 1).toSet
    assert(zeroKept == expect, s"zero-share stratum must keep exactly the slot<1 rows")
    assert(kept.where($"stratum" === "keep").count() == 1500L)
  }

  test("weighted mixture: NULL stratum takes the default share via the null-safe join") {
    val rows: Seq[(Long, Option[String], Long)] =
      (1L to 300L).map(i => (i, if (i % 3 == 0) None else Some("x"), 1L))
    val df = rows.toDF("id", "stratum", "mass")
    val key = concat(lit("nmx:"), $"id")
    val kept = Sampling.mixtureResampleTo(df, "stratum", "mass", key,
      shares = Map("x" -> 0.5), defaultShare = 0.5)
    // default == mapped share over two equal-role strata -> NULL rows
    // survive by the same rule, none silently vanish
    assert(kept.where($"stratum".isNull).count() > 0,
      "NULL stratum vanished from the weighted mixture")
  }

  test("packSequences: every doc exactly once, greedy fill/overflow bounds, deterministic") {
    val key = concat(lit("doc:"), $"doc_id")
    val toks = docs.select($"doc_id",
      size(split(trim($"text"), "\\s+")).cast("long").as("n_tokens"))
    val budget = 512L
    val packed = Sampling.packSequences(toks, key, "n_tokens", "doc_id", budget)
      .select($"doc_id", $"n_tokens", $"shard", $"seq").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getInt(2), r.getLong(3)))
    // partition: every doc exactly once, never split
    assert(packed.length == docs.count() && packed.map(_._1).distinct.length == packed.length)
    val maxTok = packed.map(_._2).max
    packed.groupBy(_._3).foreach { case (shard, rows) =>
      // seq non-decreasing in doc order within the shard
      val inOrder = rows.sortBy(_._1)
      assert(inOrder.map(_._4).sliding(2).forall(p => p.length < 2 || p(0) <= p(1)),
        s"shard $shard: sequence ids regress")
      val bySeq = rows.groupBy(_._4).view.mapValues(_.map(_._2).sum).toMap
      val lastSeq = rows.map(_._4).max
      bySeq.foreach { case (seq, total) =>
        // overflow bound: a sequence exceeds budget by less than one doc
        assert(total < budget + maxTok, s"shard $shard seq $seq total $total")
        // fill bound: every non-final sequence closed because the
        // running total crossed the next budget multiple
        if (seq != lastSeq)
          assert(total >= budget - maxTok, s"shard $shard seq $seq underfilled: $total")
      }
    }
    // deterministic across runs
    val again = Sampling.packSequences(toks, key, "n_tokens", "doc_id", budget)
      .select($"doc_id", $"shard", $"seq").collect()
      .map(r => (r.getLong(0), r.getInt(1), r.getLong(2))).toSet
    assert(again == packed.map(t => (t._1, t._3, t._4)).toSet)
  }

  test("packSequences rejects NULL and negative token counts loudly") {
    // a bad count would otherwise flow through the cumsum as garbage
    // packing (negative running totals -> negative sequence ids)
    val neg = Seq((1L, 10L), (2L, -5L)).toDF("doc_id", "n_tokens")
    assertThrows[Exception] {
      Sampling.packSequences(neg, concat(lit("doc:"), $"doc_id"),
        "n_tokens", "doc_id", 512L).collect()
    }
    val nul = Seq((1L, Some(10L)), (2L, None)).toDF("doc_id", "n_tokens")
    assertThrows[Exception] {
      Sampling.packSequences(nul, concat(lit("doc:"), $"doc_id"),
        "n_tokens", "doc_id", 512L).collect()
    }
  }
}
