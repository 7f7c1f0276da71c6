package graft

import org.apache.spark.sql.{Column, DataFrame, SaveMode, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{ArrayType, FloatType, IntegerType, TimestampNTZType}

/**
 * Deterministic scale-factor data generator for the SCALING.md slope
 * measurement (VERDICT r7 "next round" item 1).
 *
 * The driver ships read-only testdata only up to sf0.1 (TESTDATA.md);
 * measuring the sf0.1→sf1 slope needs an sf1 corpus with the SAME
 * distributions. This generator was calibrated against the driver's
 * sf0.001/0.01/0.1 tables (schemas, cardinality scaling law, value
 * ranges, planted-duplicate structure — all profiled from the files,
 * none copied):
 *
 *  - rows ∝ sf (counts quoted at sf=1): customer 150k, supplier 10k,
 *    part 200k, orders 1.5M, lineitem ≈4/order (linenumber 1..7),
 *    events 1M over 15k users / 30 days of Jan-2024, documents
 *    max(500, 50k·sf), embeddings max(500, 20k·sf); region/nation
 *    are fixed 5/25-row dimensions copied from the source dir.
 *  - every timestamp column is physical TIMESTAMP(MICROS) without
 *    timezone (TIMESTAMP_NTZ), matching the driver's parquet layout.
 *  - documents: 10–100-word salads over the 30-word vocab; 5% are
 *    near-dup family members (shared family salad + 1..3 trailing
 *    "dup" marker tokens — the driver's planted structure);
 *    approximately 0.17% of base docs are exact copies of an earlier
 *    doc (approximate because the copy target is drawn over [0, id)
 *    without excluding family/copy docs — when the target is itself
 *    one of those, the copied SEED does not reproduce its text, so the
 *    realized exact-copy rate is slightly below the draw rate).
 *  - embeddings: 64-dim iid N(0,1), L2-normalized, float — the driver
 *    corpus has no cluster structure (per-label mean-vector norm
 *    ≈ 1/sqrt(n), max pairwise cosine 0.60 at sf0.1).
 *
 * Everything derives from xxhash64 streams keyed on (table-tag, id) —
 * no RNG state, no driver-side loops, one distributed `range` per
 * table, so generating sf10 (60M lineitem) is as parallel as a scan.
 * Tables are written with one part file per sf0.1-worth of rows: each
 * part matches the driver's single-file sf0.1 table size, so scan
 * split counts grow with the data the way a real ingest layout would.
 *
 * Usage: runMain graft.GenData <srcSfDir> <outDir> <sf> [table,table,...]
 *                              [clusters=K[:sigma][:zipf[ALPHA]]]
 *                              [labels=zipf[ALPHA] | labels=clzipf[ALPHA]]
 * (the optional 4th arg restricts generation to the named tables —
 * e.g. a lineitem-only sf10 corpus for the AQE skew-split check)
 *
 * `clusters=K[:sigma]` switches the EMBEDDINGS table to a CLUSTERED
 * mixture-of-gaussians mode (round 14 — the r13 verdict's item 2:
 * every recall/agreement number had been measured only on the
 * isotropic corpus, the adversarial case for same-list agreement and
 * the favorable one for end-metric stability). Each vector draws a
 * cluster id from a hash stream, its raw value is the cluster's
 * deterministic unit center plus iid N(0, sigma²) per dimension, then
 * L2-normalized — expected point-to-center cosine ≈ 1/√(1+dim·σ²)
 * (σ=0.125, dim=64 → ≈ 0.71; same-cluster pairwise ≈ 0.5), vs the
 * isotropic corpus's ≈ 0. Labels follow the cluster (label = cluster
 * mod 10) so the 1-NN label eval has genuine cluster-aligned signal.
 * As deterministic as every other table: a pure function of
 * (id, K, sigma) via the same xxhash64 streams.
 *
 * `clusters=K:sigma:zipf[ALPHA]` (round 15 — the r14 verdict's item
 * 3: equal-mass K=64 was the one clustered shape measured, and the
 * flat-assignment occupancy skew visible there grows with mass skew)
 * draws the CLUSTER ID from a Zipf(ALPHA) mass function instead of
 * uniform: cluster c carries mass ∝ 1/(c+1)^ALPHA (ALPHA defaults to
 * 1.0 — at K=64 the head cluster then holds ~21% of the corpus and
 * the tail cluster ~0.3%, a 64:1 mass ratio). The draw inverts the
 * cumulative mass scan-locally: the K-element cumulative array rides
 * as a literal (metadata — K ≤ thousands) and the id is the count of
 * thresholds below the row's uniform draw. Centers, noise, and labels
 * are byte-identical to the equal-mass mode given the same cluster
 * id, so a Zipf corpus differs from its equal-mass sibling ONLY in
 * how many points each cluster owns — exactly the variable the
 * occupancy/recall probes isolate.
 */
object GenData {

  /** uniform [0,1) from a 64-bit hash of (tag, cols...) */
  private def u(tag: String, cols: Column*): Column =
    shiftrightunsigned(xxhash64((lit(tag) +: cols): _*), 11).cast("double") / lit((1L << 53).toDouble)

  /** standard normal via Box–Muller from two independent uniform streams */
  private def gauss(tag: String, cols: Column*): Column = {
    val u1 = u(tag + "/g1", cols: _*)
    val u2 = u(tag + "/g2", cols: _*)
    sqrt(lit(-2.0) * log(lit(1.0) - u1)) * cos(lit(2.0 * math.Pi) * u2)
  }

  /** Zipf(alpha) draw over [0, n): mass ∝ 1/(c+1)^alpha, inverted
    * scan-locally — the (n-1)-element cumulative threshold array rides
    * as a literal (metadata) and the drawn index is the count of
    * thresholds at or below the row's uniform draw, structurally
    * bounded to [0, n-1]. n=1 short-circuits (one class whatever the
    * mass function says — and the threshold array would be an untyped
    * empty literal). Shared by the cluster-mass mode (r15) and the
    * label mode (r16). */
  private def zipfDraw(tag: String, id: Column, n: Int, alpha: Double): Column =
    if (n == 1) lit(0L)
    else {
      val w = Array.tabulate(n)(c => 1.0 / math.pow(c + 1.0, alpha))
      val total = w.sum
      val cum = w.scanLeft(0.0)(_ + _).drop(1).map(_ / total).init
      val uu = u(tag, id)
      size(filter(array(cum.map(lit): _*), c => c <= uu)).cast("long")
    }

  private def pick(tag: String, id: Column, values: Seq[String]): Column =
    element_at(array(values.map(lit): _*), (pmod(xxhash64(lit(tag), id), lit(values.size)) + 1).cast(IntegerType))

  /** uniform TIMESTAMP_NTZ in [start, start + spanDays) with µs resolution */
  private def ntzTs(tag: String, id: Column, start: String, spanDays: Double): Column =
    timestamp_micros(
      (lit(java.time.LocalDateTime.parse(start).toEpochSecond(java.time.ZoneOffset.UTC)) * lit(1000000L)
        + (u(tag, id) * lit(spanDays * 86400e6)).cast("long"))
    ).cast(TimestampNTZType)

  private val docVocab = Seq("a", "agg", "batch", "big", "column", "customer",
    "data", "fast", "filter", "group", "hash", "join", "key", "line", "merge",
    "order", "part", "query", "row", "scan", "slow", "small", "sort", "spark",
    "stream", "table", "the", "value", "vector", "window")
  private val partAdj = Seq("blue", "cold", "hot", "large", "new", "old", "red", "small")
  private val partNoun = Seq("anvil", "bolt", "gear", "gizmo", "plate", "ring", "rod", "widget")
  private val partType = Seq("ECONOMY", "LARGE", "MEDIUM", "PROMO", "SMALL", "STANDARD")

  /** 10–100-word salad over the doc vocab, seeded by an arbitrary seed column */
  private def salad(seed: Column, nWords: Column): Column =
    array_join(transform(sequence(lit(1), nWords),
      i => element_at(array(docVocab.map(lit): _*),
        (pmod(xxhash64(lit("doc/w"), seed, i), lit(docVocab.size)) + 1).cast(IntegerType))), " ")

  def main(args: Array[String]): Unit = {
    val Array(srcDir, outDir, sfStr) = args.take(3)
    val sf = sfStr.toDouble
    val extra = args.drop(3)
    // (K, sigma, zipf mass exponent — 0.0 = equal mass). sigma and
    // zipf[ALPHA] are each independently optional, as the usage
    // grammar promises: clusters=64, clusters=64:0.2, clusters=64:zipf,
    // and clusters=64:0.2:zipf1.5 all parse
    val embClusters: Option[(Int, Double, Double)] = extra.find(_.startsWith("clusters="))
      .map { a =>
        // grammar-level messages for every numeric field (ADVICE r15:
        // a malformed alpha suffix died as a raw NumberFormatException
        // while the arity check beside it spoke the grammar)
        def num(what: String, v: String): Double =
          try v.toDouble catch {
            case _: NumberFormatException => throw new IllegalArgumentException(
              s"expected clusters=K[:sigma][:zipf[ALPHA]]: bad $what '$v' in $a")
          }
        val p = a.stripPrefix("clusters=").split(":")
        val (zipfParts, sigmaParts) = p.drop(1).partition(_.startsWith("zipf"))
        require(zipfParts.size <= 1 && sigmaParts.size <= 1,
          s"expected clusters=K[:sigma][:zipf[ALPHA]], got $a")
        val alpha = zipfParts.headOption.map { z =>
          val t = z.stripPrefix("zipf")
          if (t.isEmpty) 1.0 else num("zipf ALPHA", t)
        }.getOrElse(0.0)
        // K parses as an INTEGER in its own right — routing it through
        // the double parser would silently truncate `64.5` to 64 and
        // clamp overflow, defeating the validation (review r16)
        val k = try p(0).toInt catch {
          case _: NumberFormatException => throw new IllegalArgumentException(
            s"expected clusters=K[:sigma][:zipf[ALPHA]]: bad K '${p(0)}' in $a")
        }
        require(k >= 1, s"expected clusters=K[:sigma][:zipf[ALPHA]]: K must be >= 1, got $k")
        (k, sigmaParts.headOption.map(num("sigma", _)).getOrElse(0.125), alpha)
      }
    // `labels=zipf[ALPHA]` / `labels=clzipf[ALPHA]` (round 16 — the
    // r15 verdict's item 4: label mass INHERITED cluster mass via
    // `cluster id mod 10`, so the 1-NN label eval had never seen
    // class imbalance that wasn't also occupancy imbalance). Both
    // draw the label from Zipf(ALPHA) over the 10 classes via the
    // same scan-local inversion; they differ in the KEY:
    //  - zipf   keys on the ROW id — labels independent of geometry,
    //    the negative control: per-class 1-NN accuracy must collapse
    //    to the class prior (any metric reporting more is broken);
    //  - clzipf keys on the CLUSTER id (clustered mode only) — every
    //    cluster carries one label but label MASS over clusters is
    //    Zipf: rare classes own few clusters while neighbors still
    //    carry the signal, the shape real curation labels have (class
    //    imbalance WITH geometry — the cell that shows whether rare
    //    classes survive the eval).
    // Embeddings stay byte-identical to the sibling corpus either
    // way. At ALPHA=1 the head class holds ~34% of rows and the tail
    // ~3.4%; at 1.5, ~50% vs ~1.6%.
    val labelSpec: Option[(Boolean, Double)] = extra.find(_.startsWith("labels="))
      .map { a =>
        val t = a.stripPrefix("labels=")
        val perCluster = t.startsWith("clzipf")
        require(perCluster || t.startsWith("zipf"),
          s"expected labels=zipf[ALPHA] or labels=clzipf[ALPHA], got $a")
        val suffix = t.stripPrefix(if (perCluster) "clzipf" else "zipf")
        val alpha =
          if (suffix.isEmpty) 1.0
          else try suffix.toDouble catch {
            case _: NumberFormatException => throw new IllegalArgumentException(
              s"expected labels=[cl]zipf[ALPHA]: bad ALPHA '$suffix' in $a")
          }
        (perCluster, alpha)
      }
    require(labelSpec.forall(!_._1) || embClusters.isDefined,
      "labels=clzipf keys the label on the cluster id — it needs clusters=K")
    val only: Set[String] = extra
      .filterNot(a => a.startsWith("clusters=") || a.startsWith("labels="))
      .headOption.map(_.split(",").toSet).getOrElse(Set.empty)
    def wanted(name: String): Boolean = only.isEmpty || only(name)
    val spark = SparkSession.builder()
      .master(s"local[${sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")}]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    def rows(perSf: Long): Long = math.round(perSf * sf)
    val nCust = rows(150000)
    val nSupp = rows(10000)
    val nPart = rows(200000)
    val nOrders = rows(1500000)
    val nUsers = rows(15000)
    val nEvents = rows(1000000)
    val nDocs = math.max(500L, rows(50000))
    val nVecs = math.max(500L, rows(20000))

    // one part file per sf0.1-worth of rows: each part matches the size
    // of the driver's single-file sf0.1 table, so scan split counts grow
    // with the data exactly as a real cluster's ingest layout would
    val sfParts = math.max(1, math.round(sf * 10).toInt)
    def write(df: => DataFrame, name: String, parts: Int = 1): Unit = if (wanted(name)) {
      df.coalesce(parts).write.mode(SaveMode.Overwrite).parquet(s"$outDir/$name.parquet")
      println(s"[gendata] wrote $name")
    }

    // fixed dimensions: identical content at every sf
    write(spark.read.parquet(s"$srcDir/region.parquet"), "region")
    write(spark.read.parquet(s"$srcDir/nation.parquet"), "nation")

    lazy val cust = spark.range(nCust).select(
      col("id").as("c_custkey"),
      format_string("Customer#%09d", col("id")).as("c_name"),
      pmod(xxhash64(lit("c/nat"), col("id")), lit(25)).cast(IntegerType).as("c_nationkey"),
      round(u("c/bal", col("id")) * lit(11000.0) - lit(1000.0), 2).as("c_acctbal"),
      pick("c/seg", col("id"), Seq("AUTOMOBILE", "BUILDING", "FURNITURE", "HOUSEHOLD", "MACHINERY")).as("c_mktsegment"))
    write(cust, "customer")

    val supp = spark.range(nSupp).select(
      col("id").as("s_suppkey"),
      format_string("Supplier#%09d", col("id")).as("s_name"),
      pmod(xxhash64(lit("s/nat"), col("id")), lit(25)).cast(IntegerType).as("s_nationkey"),
      round(u("s/bal", col("id")) * lit(11000.0) - lit(1000.0), 2).as("s_acctbal"))
    write(supp, "supplier")

    val part = spark.range(nPart).select(
      col("id").as("p_partkey"),
      concat(pick("p/adj", col("id"), partAdj), lit(" "), pick("p/noun", col("id"), partNoun)).as("p_name"),
      concat(lit("Brand#"), (pmod(xxhash64(lit("p/br"), col("id")), lit(25)) + 1).cast("string")).as("p_brand"),
      pick("p/ty", col("id"), partType).as("p_type"),
      (pmod(xxhash64(lit("p/sz"), col("id")), lit(50)) + 1).cast(IntegerType).as("p_size"),
      round(lit(900.0) + u("p/rp", col("id")) * lit(99.9), 2).as("p_retailprice"))
    write(part, "part")

    val orders = spark.range(nOrders).select(
      col("id").as("o_orderkey"),
      pmod(xxhash64(lit("o/cust"), col("id")), lit(nCust)).as("o_custkey"),
      pick("o/st", col("id"), Seq("F", "O", "P")).as("o_orderstatus"),
      round(lit(1000.0) + u("o/tp", col("id")) * lit(499000.0), 2).as("o_totalprice"),
      ntzTs("o/dt", col("id"), "1995-01-01T00:00", 2404.0).as("o_orderdate"),
      pick("o/pr", col("id"), Seq("1-URGENT", "2-HIGH", "3-MEDIUM", "4-NOT SPECIFIED", "5-LOW")).as("o_orderpriority"))
    write(orders, "orders", parts = sfParts)

    // ~4 lines/order (uniform 1..7 — matches the driver's mean and
    // linenumber range); fan-out via explode keeps generation one pass
    val li = spark.range(nOrders)
      .select(col("id").as("l_orderkey"),
        explode(sequence(lit(1), (pmod(xxhash64(lit("l/k"), col("id")), lit(7)) + 1).cast(IntegerType))).as("l_linenumber"))
    val lid = Seq(col("l_orderkey"), col("l_linenumber"))
    val lineitem = li.select(
      col("l_orderkey"),
      pmod(xxhash64((lit("l/part") +: lid): _*), lit(nPart)).as("l_partkey"),
      pmod(xxhash64((lit("l/supp") +: lid): _*), lit(nSupp)).as("l_suppkey"),
      col("l_linenumber"),
      (pmod(xxhash64((lit("l/q") +: lid): _*), lit(50)) + 1).cast("double").as("l_quantity"),
      round(lit(900.0) + u("l/ep", lid: _*) * lit(104100.0), 2).as("l_extendedprice"),
      (pmod(xxhash64((lit("l/d") +: lid): _*), lit(11)).cast("double") / lit(100.0)).as("l_discount"),
      (pmod(xxhash64((lit("l/t") +: lid): _*), lit(9)).cast("double") / lit(100.0)).as("l_tax"),
      pick("l/rf", xxhash64(lid: _*), Seq("A", "N", "R")).as("l_returnflag"),
      pick("l/ls", xxhash64(lid: _*), Seq("F", "O")).as("l_linestatus"),
      ntzTs("l/sd", xxhash64(lid: _*), "1995-01-02T00:00", 2498.0).as("l_shipdate"))
    write(lineitem, "lineitem", parts = sfParts)

    val events = spark.range(nEvents).select(
      col("id").as("event_id"),
      ntzTs("e/ts", col("id"), "2024-01-01T00:00", 30.0).as("ts"),
      pmod(xxhash64(lit("e/u"), col("id")), lit(nUsers)).as("user_id"),
      pick("e/ty", col("id"), Seq("click", "error", "purchase", "signup", "view")).as("event_type"),
      round(lit(-50.0) * log(lit(1.0) - u("e/v", col("id"))), 2).as("value"),
      format_string("{\"k\": %d}", pmod(xxhash64(lit("e/k"), col("id")), lit(100))).as("props"))
    write(events, "events", parts = sfParts)

    // documents: 95% base salads (a few exact copies of earlier docs),
    // 5% near-dup family members (family salad + 1..3 trailing "dup")
    val nFam = math.max(1L, nDocs / 40)
    val docs = spark.range(nDocs)
      .withColumn("isFam", pmod(xxhash64(lit("d/fam?"), col("id")), lit(20)) === 0)
      .withColumn("fam", pmod(xxhash64(lit("d/fam"), col("id")), lit(nFam)))
      .withColumn("isCopy", !col("isFam") && pmod(xxhash64(lit("d/cp?"), col("id")), lit(594)) === 0 && col("id") > 0)
      // exact copies reuse an earlier doc's whole text seed
      .withColumn("seed",
        when(col("isFam"), -(col("fam") + 1))
          .when(col("isCopy"), pmod(xxhash64(lit("d/cp"), col("id")), greatest(col("id"), lit(1L))))
          .otherwise(col("id")))
      .withColumn("nWords", (pmod(xxhash64(lit("d/nw"), col("seed")), lit(91)) + 10).cast(IntegerType))
      .withColumn("base", salad(col("seed"), col("nWords")))
      .withColumn("text",
        when(col("isFam"),
          concat(col("base"),
            array_join(transform(sequence(lit(1), (pmod(xxhash64(lit("d/m"), col("id")), lit(3)) + 1).cast(IntegerType)),
              _ => lit(" dup")), "")))
          .otherwise(col("base")))
      .select(
        col("id").as("doc_id"),
        col("text"),
        // en is ~2× each other language (41/15/15/15/15 observed)
        pick("d/lang", col("id"), Seq("en", "en", "en", "de", "es", "fr", "zh", "en", "de", "es", "fr", "zh", "en", "en")).as("lang"),
        concat(lit("src"), pmod(xxhash64(lit("d/src"), col("id")), lit(20)).cast("string")).as("source"),
        length(col("text")).cast("long").as("n_chars"))
    write(docs, "documents", parts = sfParts)

    // label column: uniform hash (isotropic default), cluster-aligned
    // (clustered default — label = cluster mod 10, below), the
    // row-keyed Zipf stream (labels=zipf), or the cluster-keyed Zipf
    // mass (labels=clzipf — key supplied by the clustered branch)
    def zipfLabel(key: Column): Option[Column] =
      labelSpec.map { case (_, a) =>
        zipfDraw("v/lz", key, 10, a).cast(IntegerType).as("label") }
    val vecs = embClusters match {
      case None =>
        spark.range(nVecs)
          .withColumn("raw", transform(sequence(lit(0), lit(63)), i => gauss("v/e", col("id"), i)))
          .withColumn("norm", sqrt(aggregate(col("raw"), lit(0.0), (acc, x) => acc + x * x)))
          .select(
            col("id").as("vec_id"),
            transform(col("raw"), x => x / col("norm")).cast(ArrayType(FloatType, containsNull = true)).as("embedding"),
            zipfLabel(col("id")).getOrElse(
              pmod(xxhash64(lit("v/l"), col("id")), lit(10)).cast(IntegerType).as("label")))
      case Some((k, sigma, alpha)) =>
        // mixture of gaussians: unit cluster center (deterministic in
        // the cluster id) + iid N(0, sigma^2) noise, L2-normalized.
        // Everything stays scan-local column arithmetic — the center is
        // recomputed per row from its hash stream (64 gauss draws),
        // never joined from a table. Cluster MASS: uniform (alpha=0,
        // the pmod draw) or Zipf(alpha) via scan-local inversion of
        // the cumulative mass array (a K-double literal — metadata)
        val clDraw: Column =
          if (alpha == 0.0 && k > 1) pmod(xxhash64(lit("v/cl"), col("id")), lit(k))
          else zipfDraw("v/clz", col("id"), k, alpha)
        spark.range(nVecs)
          .withColumn("cl", clDraw)
          .withColumn("mu", transform(sequence(lit(0), lit(63)), i => gauss("v/mu", col("cl"), i)))
          .withColumn("mun", sqrt(aggregate(col("mu"), lit(0.0), (acc, x) => acc + x * x)))
          .withColumn("raw", zip_with(col("mu"),
            transform(sequence(lit(0), lit(63)), i => gauss("v/e", col("id"), i)),
            (m, g) => m / col("mun") + lit(sigma) * g))
          .withColumn("norm", sqrt(aggregate(col("raw"), lit(0.0), (acc, x) => acc + x * x)))
          .select(
            col("id").as("vec_id"),
            transform(col("raw"), x => x / col("norm")).cast(ArrayType(FloatType, containsNull = true)).as("embedding"),
            zipfLabel(if (labelSpec.exists(_._1)) col("cl") else col("id")).getOrElse(
              (col("cl") % 10).cast(IntegerType).as("label")))
    }
    write(vecs, "embeddings", parts = sfParts)

    println(s"[gendata] done: sf=$sf at $outDir")
    spark.stop()
  }
}
