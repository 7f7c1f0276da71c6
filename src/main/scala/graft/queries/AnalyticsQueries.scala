package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.sources.Tables

/**
 * Host-engine relational surface (SURVEY.md §2.3): the operator categories
 * the reference delegates to DuckDB, re-expressed as Spark built-ins so
 * Catalyst/Tungsten plan them — joins (broadcast/semi/anti), hash aggs
 * (partial+final), windows, rollup/cube, set ops, sort/limit/top-k,
 * string/date/math/JSON scalar functions, explode.
 *
 * Float determinism: double summation is order-dependent, so any SUM/AVG
 * that must hash-match the DuckDB oracle is computed over DECIMAL (exact,
 * associative) and only cast to DOUBLE at the end; averages divide the
 * exact sum by the count in DOUBLE, the same IEEE op in both engines.
 *
 * Scale notes per query are inline. The common pattern: filters/projections
 * reach the parquet scan (PushedFilters/ReadSchema), aggregations are
 * partial+final, the small side of every join is broadcast, and output
 * ordering happens after aggregation (tiny data).
 */
object AnalyticsQueries {
  private def t(s: SparkSession, dir: String, n: String): DataFrame = Tables.load(s, dir, n)

  /** Exact decimal view of a money/qty double column. */
  private def dec(c: org.apache.spark.sql.Column) = c.cast("decimal(18,2)")

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // TPC-H Q1 shape: scan-heavy partial+final hash agg; the shipdate
    // filter is pushed to parquet. At 100 TB this is the canonical
    // map-side-combine query: shuffle carries |groups|×|partitions| rows.
    "a10_pricing_summary" -> ((s, dir) => {
      import s.implicits._
      t(s, dir, "lineitem")
        // TIMESTAMP literal parses in the SESSION TZ (UTC) like the
        // oracle's naive literal — java.sql.Timestamp.valueOf would
        // parse in the JVM default TZ, shifting the cutoff on any
        // host whose user.timezone is not UTC
        .filter($"l_shipdate" <= expr("TIMESTAMP'1998-09-02 00:00:00'"))
        .groupBy($"l_returnflag", $"l_linestatus")
        .agg(
          sum(dec($"l_quantity")).cast("double").as("sum_qty"),
          sum(dec($"l_extendedprice")).cast("double").as("sum_base_price"),
          sum(dec($"l_extendedprice") * (lit(1).cast("decimal(18,2)") - dec($"l_discount"))).cast("double").as("sum_disc_price"),
          (sum(dec($"l_quantity")).cast("double") / count(lit(1))).as("avg_qty"),
          count(lit(1)).as("count_order"))
        .orderBy("l_returnflag", "l_linestatus")
    }),
    // 3-way join: lineitem revenue is PRE-AGGREGATED by orderkey before
    // the join (partial agg on the scan side), so the orderkey shuffle
    // carries one row per order instead of every lineitem — at 100 TB
    // this is the difference between shuffling the fact table and
    // shuffling its distinct-key projection. Customer (small) broadcasts.
    // Post-aggregation n_orders needs no distinct: the pre-agg key is
    // unique per order.
    "a11_segment_revenue" -> ((s, dir) => {
      import s.implicits._
      val c = broadcast(t(s, dir, "customer").select($"c_custkey", $"c_mktsegment"))
      val o = t(s, dir, "orders").select($"o_orderkey", $"o_custkey")
      val lrev = t(s, dir, "lineitem")
        .groupBy($"l_orderkey")
        .agg(sum(dec($"l_extendedprice") * (lit(1).cast("decimal(18,2)") - dec($"l_discount")))
          .as("order_rev"))
      lrev.join(o, lrev("l_orderkey") === o("o_orderkey"))
        .join(c, o("o_custkey") === c("c_custkey"))
        .groupBy($"c_mktsegment")
        .agg(
          sum($"order_rev").cast("double").as("revenue"),
          count(lit(1)).as("n_orders"))
        .orderBy("c_mktsegment")
    }),
    // Left-semi join (EXISTS): customers that have orders, per nation.
    "a12_semijoin" -> ((s, dir) => {
      import s.implicits._
      t(s, dir, "customer")
        .join(t(s, dir, "orders").select($"o_custkey"),
          $"c_custkey" === $"o_custkey", "left_semi")
        .groupBy($"c_nationkey").agg(count(lit(1)).as("cnt"))
        .orderBy("c_nationkey")
    }),
    // Left-anti join (NOT EXISTS): customers with no orders.
    "a13_antijoin" -> ((s, dir) => {
      import s.implicits._
      t(s, dir, "customer")
        .join(t(s, dir, "orders").select($"o_custkey"),
          $"c_custkey" === $"o_custkey", "left_anti")
        .select($"c_custkey", $"c_name")
        .orderBy("c_custkey")
    }),
    // Window function: top-3 orders per customer by price. At scale this
    // is the classic "grouped top-k": Spark plans a single shuffle on the
    // partition key; rank+filter avoids a global sort.
    "a14_window_topk" -> ((s, dir) => {
      import s.implicits._
      val w = Window.partitionBy($"o_custkey").orderBy($"o_totalprice".desc, $"o_orderkey")
      t(s, dir, "orders")
        .withColumn("rk", row_number().over(w))
        .filter($"rk" <= 3)
        .select($"o_custkey", $"o_orderkey", $"rk")
        .orderBy("o_custkey", "rk")
    }),
    // Set ops: nations with customers ∩ nations with suppliers.
    "a15_intersect" -> ((s, dir) => {
      import s.implicits._
      t(s, dir, "customer").select($"c_nationkey".as("nationkey")).distinct()
        .intersect(t(s, dir, "supplier").select($"s_nationkey".cast("int").as("nationkey")).distinct())
        .orderBy("nationkey")
    }),
    // Set ops: nations with customers but no suppliers.
    "a16_except" -> ((s, dir) => {
      import s.implicits._
      t(s, dir, "customer").select($"c_nationkey".as("nationkey")).distinct()
        .except(t(s, dir, "supplier").select($"s_nationkey".cast("int").as("nationkey")).distinct())
        .orderBy("nationkey")
    }),
    // ROLLUP: hierarchical totals (partial-agg friendly).
    "a17_rollup" -> ((s, dir) => {
      import s.implicits._
      t(s, dir, "lineitem")
        .rollup($"l_returnflag", $"l_linestatus")
        .agg(count(lit(1)).as("cnt"), sum(dec($"l_quantity")).cast("double").as("sum_qty"))
        .orderBy($"l_returnflag".asc_nulls_first, $"l_linestatus".asc_nulls_first)
    }),
    // Top-k: Spark plans TakeOrderedAndProject — no global sort at scale.
    "a18_topk_orders" -> ((s, dir) => {
      import s.implicits._
      t(s, dir, "orders")
        .select($"o_orderkey", $"o_custkey", $"o_totalprice")
        .orderBy($"o_totalprice".desc, $"o_orderkey")
        .limit(10)
    }),
    // Date/time: monthly order volume (date_trunc + count + exact sum).
    "a19_monthly_orders" -> ((s, dir) => {
      import s.implicits._
      t(s, dir, "orders")
        .groupBy(date_trunc("month", $"o_orderdate").as("month"))
        .agg(count(lit(1)).as("n_orders"),
          sum(dec($"o_totalprice")).cast("double").as("total"))
        .orderBy("month")
    }),
    // String functions over part.
    "a20_string_fns" -> ((s, dir) => {
      import s.implicits._
      t(s, dir, "part")
        .select($"p_partkey",
          upper($"p_brand").as("brand_u"),
          substring($"p_name", 1, 8).as("name8"),
          regexp_replace($"p_type", lit(" "), lit("_")).as("type_u"),
          length($"p_name").cast("long").as("name_len"),
          concat_ws("|", $"p_brand", $"p_type").as("joined"))
        .orderBy("p_partkey")
    }),
    // Math functions (all IEEE-deterministic: sqrt is correctly rounded).
    "a21_math_fns" -> ((s, dir) => {
      import s.implicits._
      t(s, dir, "lineitem")
        .filter($"l_linenumber" === 1)
        .select($"l_orderkey",
          sqrt($"l_extendedprice").as("root"),
          floor($"l_extendedprice").cast("long").as("fl"),
          ceil($"l_extendedprice").cast("long").as("ce"),
          abs($"l_discount" - 0.05).as("adj"),
          pmod($"l_orderkey", lit(7L)).as("m7"))
        .orderBy("l_orderkey")
    }),
    // JSON extraction from the events props column.
    "a22_json" -> ((s, dir) => {
      import s.implicits._
      t(s, dir, "events")
        .select($"event_type", get_json_object($"props", "$.k").cast("long").as("k"))
        .groupBy($"event_type")
        .agg(count(lit(1)).as("cnt"), sum($"k").as("sum_k"))
        .orderBy("event_type")
    }),
    // UDTF surface: explode/split word count over documents.
    "a23_wordcount" -> ((s, dir) => {
      import s.implicits._
      t(s, dir, "documents")
        .select(explode(split($"text", " ")).as("word"))
        .filter(length($"word") > 0)
        .groupBy("word").agg(count(lit(1)).as("cnt"))
        .orderBy($"cnt".desc, $"word")
        .limit(25)
    }),
    // Time-bucketed event aggregation (batch form of the streaming window).
    "a24_events_hourly" -> ((s, dir) => {
      import s.implicits._
      t(s, dir, "events")
        .groupBy(date_trunc("hour", $"ts").as("hour"), $"event_type")
        .agg(count(lit(1)).as("cnt"),
          sum(dec($"value")).cast("double").as("sum_value"))
        .orderBy("hour", "event_type")
    }),
    // Exact distinct aggregation (expand + two-phase agg in Spark).
    "a25_distinct_parts" -> ((s, dir) => {
      import s.implicits._
      t(s, dir, "lineitem")
        .groupBy($"l_returnflag")
        .agg(countDistinct($"l_partkey").as("d_parts"),
          countDistinct($"l_suppkey").as("d_supps"))
        .orderBy("l_returnflag")
    }),
    // CUBE over two dims.
    "a26_cube" -> ((s, dir) => {
      import s.implicits._
      t(s, dir, "orders")
        .cube($"o_orderstatus", $"o_orderpriority")
        .agg(count(lit(1)).as("cnt"))
        .orderBy($"o_orderstatus".asc_nulls_first, $"o_orderpriority".asc_nulls_first)
    }),
    // Multi-way join through the full snowflake: region→nation→customer
    // →orders, small dims broadcast.
    "a27_snowflake" -> ((s, dir) => {
      import s.implicits._
      val r = broadcast(t(s, dir, "region"))
      val n = broadcast(t(s, dir, "nation"))
      val c = t(s, dir, "customer")
      val o = t(s, dir, "orders")
      o.join(c, o("o_custkey") === c("c_custkey"))
        .join(n, c("c_nationkey") === n("n_nationkey"))
        .join(r, n("n_regionkey") === r("r_regionkey"))
        .groupBy($"r_name")
        .agg(count(lit(1)).as("n_orders"),
          sum(dec($"o_totalprice")).cast("double").as("total"))
        .orderBy("r_name")
    }),
  )

  /** Further operator-category coverage: window frames + lag/lead,
    * GROUPING SETS, UNION ALL, approx distinct, correlated scalar
    * subquery, composed as-of join. */
  val queries2: Map[String, (SparkSession, String) => DataFrame] = Map(
    // Window frames: lag/lead + running sum per customer order history.
    "a28_window_frames" -> ((s, dir) => {
      import s.implicits._
      val w = Window.partitionBy($"o_custkey").orderBy($"o_orderdate", $"o_orderkey")
      t(s, dir, "orders")
        .withColumn("prev_price", lag($"o_totalprice", 1).over(w))
        .withColumn("next_price", lead($"o_totalprice", 1).over(w))
        .withColumn("running",
          sum(dec($"o_totalprice")).over(w.rowsBetween(Window.unboundedPreceding, 0))
            .cast("double"))
        .select($"o_orderkey", $"prev_price", $"next_price", $"running")
        .orderBy("o_orderkey")
    }),
    // GROUPING SETS (finer than rollup/cube).
    "a29_grouping_sets" -> ((s, dir) => {
      Tables.registerAll(s, dir)
      s.sql("""SELECT l_returnflag, l_linestatus, count(*) AS cnt
              |FROM lineitem
              |GROUP BY GROUPING SETS ((l_returnflag), (l_linestatus), ())
              |ORDER BY l_returnflag ASC NULLS FIRST, l_linestatus ASC NULLS FIRST, cnt""".stripMargin)
    }),
    // UNION ALL with a source tag.
    "a30_union_all" -> ((s, dir) => {
      import s.implicits._
      t(s, dir, "customer").select(lit("c").as("src"), $"c_nationkey".as("nationkey"))
        .unionByName(
          t(s, dir, "supplier").select(lit("s").as("src"), $"s_nationkey".cast("int").as("nationkey")))
        .groupBy("src").agg(count(lit(1)).as("cnt"), countDistinct($"nationkey").as("nations"))
        .orderBy("src")
    }),
    // HLL approximate distinct — engine-specific, pinned vs exact in spec
    // (no DuckDB oracle: sketches differ across engines by design).
    "a31_approx_distinct" -> ((s, dir) => {
      import s.implicits._
      t(s, dir, "lineitem")
        .groupBy($"l_returnflag")
        .agg(approx_count_distinct($"l_partkey").as("approx_parts"),
          countDistinct($"l_partkey").as("exact_parts"))
        .orderBy("l_returnflag")
    }),
    // Correlated scalar subquery (decorrelated by Catalyst into a join).
    "a32_scalar_subquery" -> ((s, dir) => {
      Tables.registerAll(s, dir)
      s.sql("""SELECT c_custkey,
              | (SELECT count(*) FROM orders WHERE o_custkey = c_custkey) AS n_orders
              |FROM customer ORDER BY c_custkey""".stripMargin)
    }),
    // As-of join (composed union+window operator) — each event joined to
    // the customer's most recent order at event time.
    "a33_asof_join" -> ((s, dir) => {
      import s.implicits._
      val events = t(s, dir, "events").select($"event_id", $"user_id", $"ts")
      val orders = t(s, dir, "orders")
        .groupBy($"o_custkey".as("user_id"), $"o_orderdate")
        .agg(max($"o_orderkey").as("o_orderkey"))
      graft.operators.AsOfJoin.asof(events, orders, "user_id", "ts", "o_orderdate",
          Seq("o_orderkey", "o_orderdate"))
        .select($"event_id", $"user_id", $"o_orderkey", $"o_orderdate")
        .orderBy("event_id")
    }),
  )

  /** Pivot, exact percentiles, collection functions, sliding windows. */
  val queries3: Map[String, (SparkSession, String) => DataFrame] = Map(
    // Pivot: order counts per priority × status.
    "a34_pivot" -> ((s, dir) => {
      import s.implicits._
      t(s, dir, "orders")
        .groupBy($"o_orderpriority")
        .pivot($"o_orderstatus", Seq("F", "O", "P"))
        .agg(count(lit(1)))
        .na.fill(0L)
        .orderBy("o_orderpriority")
    }),
    // Exact interpolated percentiles of order totals per status.
    "a35_percentiles" -> ((s, dir) => {
      import s.implicits._
      t(s, dir, "orders")
        .groupBy($"o_orderstatus")
        .agg(
          round(expr("percentile(o_totalprice, 0.5)"), 4).as("p50"),
          round(expr("percentile(o_totalprice, 0.9)"), 4).as("p90"),
          round(expr("percentile(o_totalprice, 0.99)"), 4).as("p99"))
        .orderBy("o_orderstatus")
    }),
    // Array/struct collection functions over the token array.
    "a36_collections" -> ((s, dir) => {
      import s.implicits._
      t(s, dir, "documents")
        .select($"doc_id", split($"text", " ").as("words"))
        .select($"doc_id",
          size($"words").cast("long").as("n_words"),
          element_at(array_sort($"words"), 1).as("first_sorted"),
          element_at(reverse(array_sort($"words")), 1).as("last_sorted"),
          size(array_distinct($"words")).cast("long").as("n_distinct"),
          array_contains($"words", "spark").as("has_spark"))
        .orderBy("doc_id")
    }),
    // Range-predicate join: lineitems shipped within 60 days of their
    // order date (equi key + range band — Spark plans SMJ + band filter).
    "a38_range_join" -> ((s, dir) => {
      import s.implicits._
      val l = t(s, dir, "lineitem").select($"l_orderkey", $"l_shipdate")
      val o = t(s, dir, "orders").select($"o_orderkey", $"o_orderdate")
      l.join(o, $"l_orderkey" === $"o_orderkey" &&
          $"l_shipdate" >= $"o_orderdate" &&
          $"l_shipdate" <= $"o_orderdate" + expr("INTERVAL 60 DAYS"))
        .groupBy(date_trunc("month", $"o_orderdate").as("month"))
        .agg(count(lit(1)).as("fast_shipments"))
        .orderBy("month")
    }),
    // Salted skew join as a declared query: lineitem (big, potentially
    // skewed on partkey) joined to part through SlotPartitioning's
    // deterministic salt — row-identical to the plain join (the oracle
    // IS the plain join), but a hot partkey's rows spread over 8
    // reducers instead of one.
    "a39_salted_join" -> ((s, dir) => {
      import s.implicits._
      val big = t(s, dir, "lineitem")
        .select($"l_partkey".as("partkey"), $"l_orderkey", $"l_extendedprice")
      val small = t(s, dir, "part").select($"p_partkey".as("partkey"), $"p_brand")
      graft.operators.SlotPartitioning.saltedJoin(big, small, "partkey", "l_orderkey")
        .groupBy($"p_brand".as("brand"))
        .agg(count(lit(1)).as("n_items"),
          sum($"l_extendedprice".cast("decimal(18,2)")).cast("double").as("revenue"))
        .orderBy("brand")
    }),
    // AQE-native skew join: the complement of a39's manual salting —
    // the mechanism a real 100 TB join relies on BEFORE anyone
    // hand-salts. The fact side lands ~80% of lineitem on one join key
    // (a deliberately pathological distribution), the dim side is a
    // metadata-sized key table forced past broadcast with a MERGE hint,
    // and spark.sql.adaptive.skewJoin splits the straggler partition at
    // runtime — value-identical to the plain join (the oracle IS the
    // plain join), so the split must not change the answer. The
    // skew=true plan shape is pinned in PlanChecksSpec under
    // bench-scale thresholds.
    "a74_skew_join_aqe" -> ((s, dir) => {
      import s.implicits._
      // per-order pre-aggregation first — the production shape (reduce
      // before the expensive join), and what makes the skewed partition
      // SPLITTABLE: AQE divides it at map-output granularity, so the
      // join's input must come from many mappers (the pre-agg's
      // reducers), not one small-file scan task
      val fact = t(s, dir, "lineitem")
        .groupBy($"l_orderkey")
        .agg(count(lit(1)).as("n_items"),
          sum($"l_extendedprice".cast("decimal(18,2)")).as("order_rev"))
        .select(
          when($"l_orderkey" % 10 < 8, lit(0L))
            .otherwise($"l_orderkey" % 997).as("skew_key"),
          $"n_items", $"order_rev")
      val dim = s.range(0, 997)
        .select($"id".as("skew_key"), ($"id" % 7).as("grp"))
      fact.join(dim.hint("merge"), "skew_key")
        .groupBy($"grp")
        .agg(sum($"n_items").as("n_items"),
          sum($"order_rev").cast("double").as("revenue"))
        .orderBy("grp")
    }),
    // Column profiling (the data-quality pass every ingest runs): null
    // count, exact distinct count, min/max per numeric column, ONE scan.
    // Multiple countDistinct on different columns plans a single Expand
    // (N+1 projections of the same pass) + partial/final agg — not N
    // separate scans; the stack() unpivot happens on the 1-row result.
    "a41_column_profile" -> ((s, dir) => {
      import s.implicits._
      val cols = Seq("l_quantity", "l_extendedprice", "l_discount", "l_tax")
      val aggs = count(lit(1)).as("n_rows") +: cols.flatMap { c => Seq(
        count(col(c)).as(s"cnt_$c"),
        countDistinct(col(c)).as(s"dist_$c"),
        min(col(c)).cast("double").as(s"min_$c"),
        max(col(c)).cast("double").as(s"max_$c")) }
      t(s, dir, "lineitem")
        .agg(aggs.head, aggs.tail: _*)
        .select(expr(s"stack(${cols.length}, " + cols.map(c =>
            s"'$c', n_rows - cnt_$c, dist_$c, min_$c, max_$c").mkString(", ") +
          ") as (column_name, n_nulls, n_distinct, min_v, max_v)"))
        .orderBy("column_name")
    }),
    // Time-series gap-fill: the hour × event-type grid from a generated
    // spine (sequence of hour timestamps × distinct types — both
    // metadata-sized, so the grid build is free at any corpus scale),
    // LEFT-joined with the partial-aggregated hourly counts; missing
    // cells surface as explicit zeros. The dashboard-densification op.
    "a43_gapfill" -> ((s, dir) => {
      import s.implicits._
      val ev = t(s, dir, "events")
      val bounds = ev.agg(date_trunc("hour", min($"ts")).as("lo"),
        date_trunc("hour", max($"ts")).as("hi"))
      val spine = bounds.select(explode(
        sequence($"lo", $"hi", expr("INTERVAL 1 HOUR"))).as("hour"))
      val grid = spine.crossJoin(ev.select($"event_type").distinct())
      val counts = ev.groupBy(date_trunc("hour", $"ts").as("hour"), $"event_type")
        .agg(count(lit(1)).as("cnt"))
      grid.join(counts, Seq("hour", "event_type"), "left")
        .select($"hour", $"event_type", coalesce($"cnt", lit(0L)).as("cnt"))
        .orderBy("hour", "event_type")
    }),
    // Ordered funnel (view → click → purchase): each stage's timestamp
    // must follow the previous stage's FIRST timestamp. Three chained
    // per-user min-aggregations — each is one partial-agg exchange on
    // user_id, and each stage's state is one row per surviving user.
    "a44_funnel" -> ((s, dir) => {
      import s.implicits._
      val ev = t(s, dir, "events").select($"user_id", $"event_type", $"ts")
      val v = ev.where($"event_type" === "view")
        .groupBy($"user_id").agg(min($"ts").as("v_ts"))
      val c = ev.where($"event_type" === "click").join(v, Seq("user_id"))
        .where($"ts" > $"v_ts")
        .groupBy($"user_id").agg(min($"ts").as("c_ts"))
      val p = ev.where($"event_type" === "purchase").join(c, Seq("user_id"))
        .where($"ts" > $"c_ts")
        .groupBy($"user_id").agg(min($"ts").as("p_ts"))
      val one = (df: DataFrame, stage: String, ord: Int) =>
        df.agg(count(lit(1)).as("users"))
          .select(lit(ord).as("stage_ord"), lit(stage).as("stage"), $"users")
      one(v, "view", 1).unionAll(one(c, "click", 2)).unionAll(one(p, "purchase", 3))
        .orderBy("stage_ord")
    }),
    // Weekly cohort retention: cohort = ISO week of a user's first
    // event; one distinct (user, week) pass joined back to the cohort
    // table, counted per (cohort, week offset). Offsets are exact
    // integer divisions of day differences between week-truncated
    // timestamps — no float anywhere.
    "a45_retention" -> ((s, dir) => {
      import s.implicits._
      val ev = t(s, dir, "events")
      val cohorts = ev.groupBy($"user_id")
        .agg(date_trunc("week", min($"ts")).as("cohort_week"))
      ev.select($"user_id", date_trunc("week", $"ts").as("w")).distinct()
        .join(cohorts, Seq("user_id"))
        .groupBy($"cohort_week",
          expr("datediff(w, cohort_week) div 7").cast("int").as("week_offset"))
        .agg(count(lit(1)).as("users"))
        .orderBy("cohort_week", "week_offset")
    }),
    // Event-transition matrix (product-analytics path analysis): lag()
    // over each user's event stream in the (ts, event_id) TOTAL order —
    // same-timestamp ties break on event_id, so the transition pairs
    // are deterministic — then one count per (prev, curr) type pair.
    // One window shuffle on user_id; the matrix itself is type²-sized.
    "a46_transitions" -> ((s, dir) => {
      import s.implicits._
      val w = org.apache.spark.sql.expressions.Window
        .partitionBy("user_id").orderBy("ts", "event_id")
      t(s, dir, "events")
        .select($"user_id", $"event_id", $"ts", $"event_type")
        .withColumn("prev_type", lag($"event_type", 1).over(w))
        .where($"prev_type".isNotNull)
        .groupBy($"prev_type", $"event_type".as("next_type"))
        .agg(count(lit(1)).as("transitions"))
        .orderBy("prev_type", "next_type")
    }),
    // Per-group top-k WITHOUT a window sort: the bounded TopKAgg buffer
    // partial-aggregates map-side (shuffle carries ≤ k rows per group
    // per partition; a row_number window would shuffle and sort every
    // row). Tie-break on orderkey makes the answer deterministic —
    // which the oracle's window form reproduces exactly.
    "a47_grouped_topk" -> ((s, dir) => {
      import s.implicits._
      val c = t(s, dir, "customer").select($"c_custkey", $"c_mktsegment")
      val o = t(s, dir, "orders").select($"o_custkey", $"o_orderkey", $"o_totalprice")
      o.join(c, $"o_custkey" === $"c_custkey")
        .groupBy($"c_mktsegment".as("segment"))
        .agg(graft.functions.TopKAgg.top_k($"o_totalprice", $"o_orderkey", 3).as("tk"))
        .select($"segment", posexplode($"tk"))
        .select($"segment", ($"pos" + 1).cast("int").as("rank"),
          $"col._2".as("o_orderkey"), $"col._1".as("o_totalprice"))
        .orderBy("segment", "rank")
    }),
    // Sliding event-time windows (1h window, 30m slide) in batch form.
    "a37_sliding_window" -> ((s, dir) => {
      import s.implicits._
      t(s, dir, "events")
        .groupBy(window($"ts", "1 hour", "30 minutes").as("w"), $"event_type")
        .agg(count(lit(1)).as("cnt"))
        .select($"w.start".as("window_start"), $"event_type", $"cnt")
        .orderBy("window_start", "event_type")
    }),
    // Per-vertex triangle counts over the supplier co-occurrence graph
    // (suppliers sharing ≥5 orders): degree-ordered enumeration — the
    // wedge center is always the lowest-degree vertex, so fan-out is
    // bounded by O(√(2m)) even on power-law graphs. The oracle closes
    // triangles by plain id order instead (a different enumeration of
    // the same triangle set), making it genuinely independent.
    "a49_triangle_counts" -> ((s, dir) => {
      import s.implicits._
      // co-occurrence pairs via ONE shuffle on the order key (per-order
      // supplier sets expanded locally, k² per order with tiny k) — a
      // lineitem self-join would shuffle the table twice and join
      val li = t(s, dir, "lineitem").select($"l_orderkey", $"l_suppkey")
      val pairs = li.groupBy($"l_orderkey")
        .agg(collect_set($"l_suppkey").as("ss"))
        .select(explode($"ss").as("u"), $"ss")
        .select($"u", explode($"ss").as("v"))
        .where($"u" < $"v")
        .groupBy($"u".as("src"), $"v".as("dst"))
        .agg(count(lit(1)).as("w"))
        .where($"w" >= 5)
        .select($"src", $"dst")
      graft.operators.Graph.triangleCounts(pairs).orderBy("node")
    }),
    // Two-pass equi-width histogram of event values: a 1-row min/max
    // aggregate broadcast onto the scan (no driver collect), then one
    // map-side-combined shuffle on the 20-value bucket key. Bucket
    // arithmetic is the same IEEE-double expression on both sides, so
    // the edges land identically; per-bucket lo/hi are exact picks.
    "a50_histogram" -> ((s, dir) => {
      import s.implicits._
      val ev = t(s, dir, "events").select($"value")
      val mm = ev.agg(min($"value").as("vmin"), max($"value").as("vmax"))
      // degenerate single-value range → everything lands in bucket 0
      // (the division would be 0/0 = NaN, which the two engines coerce
      // differently — guard it identically on both sides)
      ev.crossJoin(broadcast(mm))
        .select(when($"vmax" === $"vmin", lit(0L))
          .otherwise(least(lit(19L),
            floor(($"value" - $"vmin") * lit(20.0) / ($"vmax" - $"vmin"))))
          .cast("int").as("bucket"), $"value")
        .groupBy("bucket")
        .agg(count(lit(1)).as("n"), min($"value").as("lo"), max($"value").as("hi"))
        .orderBy("bucket")
    }),
    // Data-quality audit: referential integrity as broadcast anti-join
    // counts, per-table constraint rules as ONE-pass conditional
    // aggregates (no scan per rule), unpivoted with stack(). The
    // ingest-gate pattern for a pipeline: rules are declarative, every
    // violation count is an aggregate, nothing leaves the executors.
    "a51_dq_audit" -> ((s, dir) => {
      import s.implicits._
      val li = t(s, dir, "lineitem")
      val ord = t(s, dir, "orders")
      val orphanLi = li.join(ord.select($"o_orderkey"),
          $"l_orderkey" === $"o_orderkey", "left_anti")
        .agg(count(lit(1)).as("violations"))
        .select(lit("lineitem_orphan_order").as("rule"), $"violations")
      val childlessOrd = ord.join(li.select($"l_orderkey"),
          $"o_orderkey" === $"l_orderkey", "left_anti")
        .agg(count(lit(1)).as("violations"))
        .select(lit("orders_no_lineitem").as("rule"), $"violations")
      val evRules = t(s, dir, "events")
        .agg(sum(when($"value" <= 0, 1L).otherwise(0L)).as("nonpos"),
          sum(when($"user_id".isNull, 1L).otherwise(0L)).as("nulluser"))
        .select(expr("stack(2, 'events_nonpos_value', nonpos, " +
          "'events_null_user', nulluser) as (rule, violations)"))
      val dupDocs = t(s, dir, "documents")
        .groupBy($"doc_id").agg(count(lit(1)).as("c")).where($"c" > 1)
        .agg(count(lit(1)).as("violations"))
        .select(lit("documents_dup_id").as("rule"), $"violations")
      val badStatus = ord
        .agg(sum(when(!$"o_orderstatus".isin("F", "O", "P"), 1L).otherwise(0L))
          .as("violations"))
        .select(lit("orders_bad_status").as("rule"), $"violations")
      orphanLi.unionByName(childlessOrd).unionByName(evRules)
        .unionByName(dupDocs).unionByName(badStatus)
        .orderBy("rule")
    }),
    // GROUPING() disambiguation over a rollup: tells a real NULL key
    // apart from a subtotal row — the detail a17's plain rollup output
    // can't express. SQL-text path; explicit NULLS FIRST because Spark
    // and DuckDB default opposite null orderings.
    "a58_grouping_id" -> ((s, dir) => {
      Tables.registerAll(s, dir)
      s.sql("""SELECT o_orderstatus, o_orderpriority,
              |  CAST(grouping(o_orderstatus) AS INT) AS g_status,
              |  CAST(grouping(o_orderpriority) AS INT) AS g_priority,
              |  count(*) AS cnt
              |FROM orders GROUP BY ROLLUP(o_orderstatus, o_orderpriority)
              |ORDER BY g_status, g_priority,
              |  o_orderstatus NULLS FIRST, o_orderpriority NULLS FIRST""".stripMargin)
    }),
    // Distribution window functions (ntile/percent_rank/cume_dist)
    // over a TOTAL order (price, then key — ties broken), so every
    // rank-derived value is deterministic on any engine. percent_rank
    // and cume_dist are exact rational divisions evaluated identically
    // in IEEE; rounding pins the printed precision.
    "a57_distribution_ranks" -> ((s, dir) => {
      import s.implicits._
      val w = Window.partitionBy($"o_orderstatus")
        .orderBy($"o_totalprice", $"o_orderkey")
      t(s, dir, "orders").where($"o_custkey" < 200)
        .select($"o_orderkey", $"o_orderstatus", $"o_totalprice")
        .withColumn("decile", ntile(10).over(w).cast("int"))
        .withColumn("pct_rank", round(percent_rank().over(w), 6))
        .withColumn("cume", round(cume_dist().over(w), 6))
        .orderBy("o_orderkey")
    }),
    // Correlated LATERAL subquery (per-customer argmax via ORDER BY ..
    // LIMIT 1 against the outer row): Catalyst decorrelates this into
    // a join — no per-row re-execution — which is exactly what makes
    // the construct usable at scale. SQL-text path on purpose: the
    // lateral syntax only exists there.
    "a56_lateral_topper" -> ((s, dir) => {
      Tables.registerAll(s, dir)
      s.sql("""SELECT c.c_custkey, t.o_orderkey, t.o_totalprice
              |FROM customer c, LATERAL (
              |  SELECT o_orderkey, o_totalprice FROM orders o
              |  WHERE o.o_custkey = c.c_custkey
              |  ORDER BY o_totalprice DESC, o_orderkey LIMIT 1) t
              |WHERE c.c_custkey < 500
              |ORDER BY c.c_custkey""".stripMargin)
    }),
    // RANGE-interval window frames (the time-based complement of a28's
    // ROWS frames): per-user moving count/sum over the preceding hour
    // BY EVENT TIME. RANGE includes all peers of the current timestamp,
    // so the result is deterministic even under ts ties; the DECIMAL
    // sum keeps the fold order-independent.
    "a55_range_frames" -> ((s, dir) => {
      import s.implicits._
      val w = Window.partitionBy($"user_id").orderBy($"t")
        .rangeBetween(-3600000L, 0L)
      t(s, dir, "events")
        .select($"event_id", $"user_id", unix_millis($"ts").as("t"),
          $"value")
        .withColumn("events_last_hour", count(lit(1)).over(w))
        .withColumn("value_last_hour",
          sum(expr("CAST(round(value, 6) AS DECIMAL(18,6))")).over(w)
            .cast("double"))
        .select($"event_id", $"user_id", $"events_last_hour", $"value_last_hour")
        .orderBy("event_id")
    }),
    // Sketch set algebra: per-segment KMV sketches answer |clicks ∪
    // purchases| by aggregating the union and |∩| by inclusion-
    // exclusion — the mergeable-summary algebra a 1000-executor
    // dashboard runs instead of exact distinct over raw IDs. Every
    // estimate is deterministic (KMV is order-independent), so even
    // the error is oracle-reproducible.
    "a54_sketch_setops" -> ((s, dir) => {
      import s.implicits._
      import graft.functions.KmvSketchAgg.kmv_distinct
      // ONE scan builds all three sketches: the aggregator skips NULL
      // hashes, so a conditional projection carves the per-segment
      // inputs out of the shared pass
      t(s, dir, "events")
        .where($"event_type".isin("click", "purchase"))
        .select($"event_type",
          graft.functions.TextFunctions
            .fnv1a64_mix(concat(lit("user:"), $"user_id")).as("h"))
        .agg(
          kmv_distinct(when($"event_type" === "click", $"h"), 64).as("est_click"),
          kmv_distinct(when($"event_type" === "purchase", $"h"), 64).as("est_purchase"),
          kmv_distinct($"h", 64).as("est_union"))
        .select($"est_click", $"est_purchase", $"est_union",
          ($"est_click" + $"est_purchase" - $"est_union").as("est_intersection"))
    }),
    // Higher-order lambda functions (filter/transform/aggregate/exists)
    // over the token array — all evaluated inside the scan's codegen
    // stage, zero shuffles before the output ordering. The declared
    // coverage for Spark's lambda-function surface.
    "a53_higher_order" -> ((s, dir) => {
      import s.implicits._
      t(s, dir, "documents")
        .select($"doc_id", split($"text", " ").as("words"))
        .select($"doc_id",
          expr("size(filter(words, w -> length(w) >= 4))").cast("long").as("n_long"),
          expr("aggregate(transform(words, w -> length(w)), 0L, (a, x) -> a + CAST(x AS BIGINT))").as("char_mass"),
          expr("exists(words, w -> length(w) > 8)").as("any_long8"))
        .orderBy("doc_id")
    }),
    // MapType surface: parse the JSON props into a map, explode it to
    // (key, value) rows, aggregate per event type × key. The oracle
    // discovers keys via json_keys — neither side hard-codes the
    // property names.
    "a52_map_explode" -> ((s, dir) => {
      import s.implicits._
      t(s, dir, "events")
        .select($"event_type",
          explode(expr("from_json(props, 'map<string,bigint>')")))
        .groupBy($"event_type", $"key".as("prop_key"))
        .agg(count(lit(1)).as("cnt"), sum($"value").as("sum_v"))
        .orderBy("event_type", "prop_key")
    }),
    // Deterministic sampled quantiles — the scalable quantile estimator:
    // a 2% slot-hash sample of lineitem (scan-local CRC selection, the
    // d41 mechanism — engine-portable, append-stable, no shuffle),
    // then EXACT interpolated percentiles of the sample per group. At
    // 100 TB the sample is what a quantile sketch buys: a bounded
    // fraction flows into a tiny per-group sort; the estimate's error
    // is ~1/√(group sample size), pinned against the exact full-corpus
    // quantiles in spec. Round 4dp on both sides: Spark and DuckDB
    // both linearly interpolate but evaluate the formula in different
    // operation orders, so the engines can differ in the last few ulps
    // — at ~1e5-scale prices a double's absolute ulp is ~3e-11, so a
    // 1e-4 rounding grid leaves ~6-7 orders of magnitude of slack
    // while still checking every meaningful digit.
    "a75_sample_quantiles" -> ((s, dir) => {
      import s.implicits._
      val smp = graft.operators.Sampling.hashSample(
        t(s, dir, "lineitem"),
        concat(lit("li:"), $"l_orderkey", lit(":"), $"l_linenumber"), 0.02)
      smp.groupBy($"l_returnflag")
        .agg(count(lit(1)).as("n_sample"),
          expr("percentile(l_extendedprice, array(0.25, 0.5, 0.75, 0.95))").as("qs"))
        .select($"l_returnflag", $"n_sample",
          round(element_at($"qs", 1), 4).as("q25"),
          round(element_at($"qs", 2), 4).as("q50"),
          round(element_at($"qs", 3), 4).as("q75"),
          round(element_at($"qs", 4), 4).as("q95"))
        .orderBy("l_returnflag")
    }),
  )

  val oracles3: Map[String, String] = Map(
    // same CRC slot selection as d41's oracle, then DuckDB's own
    // continuous-quantile interpolation over the identical sample
    "a75_sample_quantiles" -> {
      val inner = graft.oracle.DuckSql.withSlotNode(
        "SELECT l_returnflag, l_extendedprice, 'li:' || l_orderkey || ':' || l_linenumber AS key FROM lineitem",
        Seq("l_returnflag", "l_extendedprice"), Some("slot"), None)
      s"""SELECT l_returnflag, count(*) AS n_sample,
         | round(quantile_cont(l_extendedprice, 0.25), 4) AS q25,
         | round(quantile_cont(l_extendedprice, 0.50), 4) AS q50,
         | round(quantile_cont(l_extendedprice, 0.75), 4) AS q75,
         | round(quantile_cont(l_extendedprice, 0.95), 4) AS q95
         |FROM ($inner) WHERE slot < ${(0.02 * 16384).toInt}
         |GROUP BY l_returnflag ORDER BY l_returnflag""".stripMargin
    },
    // the plain join over the same synthesized skew key — AQE's runtime
    // partition split must be invisible in the values
    "a74_skew_join_aqe" ->
      """WITH po AS (SELECT l_orderkey, count(*) AS n_items,
        |  SUM(CAST(l_extendedprice AS DECIMAL(18,2))) AS order_rev
        | FROM lineitem GROUP BY l_orderkey)
        |SELECT g.id % 7 AS grp, CAST(SUM(n_items) AS BIGINT) AS n_items,
        | CAST(SUM(order_rev) AS DOUBLE) AS revenue
        |FROM po
        |JOIN generate_series(0, 996) g(id)
        |  ON (CASE WHEN l_orderkey % 10 < 8 THEN 0 ELSE l_orderkey % 997 END) = g.id
        |GROUP BY 1 ORDER BY 1""".stripMargin,
    "a49_triangle_counts" ->
      """WITH co AS (
        |  SELECT DISTINCT a.l_orderkey, a.l_suppkey AS u, b.l_suppkey AS v
        |  FROM lineitem a JOIN lineitem b
        |    ON a.l_orderkey = b.l_orderkey AND a.l_suppkey < b.l_suppkey),
        |pairs AS (
        |  SELECT u, v FROM co GROUP BY u, v HAVING count(*) >= 5),
        |tri AS (
        |  SELECT e1.u AS a, e1.v AS b, e2.v AS c
        |  FROM pairs e1 JOIN pairs e2 ON e2.u = e1.v
        |  JOIN pairs e3 ON e3.u = e1.u AND e3.v = e2.v),
        |nodes AS (SELECT a AS node FROM tri
        |  UNION ALL SELECT b FROM tri UNION ALL SELECT c FROM tri)
        |SELECT node, count(*) AS triangles FROM nodes
        |GROUP BY node ORDER BY node""".stripMargin,
    "a50_histogram" ->
      """WITH mm AS (SELECT min(value) AS vmin, max(value) AS vmax FROM events)
        |SELECT CAST(CASE WHEN vmax = vmin THEN 0
        |  ELSE LEAST(19, CAST(floor((value - vmin) * 20.0 / (vmax - vmin)) AS BIGINT))
        |  END AS INTEGER) AS bucket,
        | count(*) AS n, min(value) AS lo, max(value) AS hi
        |FROM events, mm GROUP BY 1 ORDER BY bucket""".stripMargin,
    "a58_grouping_id" ->
      """SELECT o_orderstatus, o_orderpriority,
        |  CAST(grouping(o_orderstatus) AS INT) AS g_status,
        |  CAST(grouping(o_orderpriority) AS INT) AS g_priority,
        |  count(*) AS cnt
        |FROM orders GROUP BY ROLLUP(o_orderstatus, o_orderpriority)
        |ORDER BY g_status, g_priority,
        |  o_orderstatus NULLS FIRST, o_orderpriority NULLS FIRST""".stripMargin,
    "a57_distribution_ranks" ->
      """SELECT o_orderkey, o_orderstatus, o_totalprice,
        | CAST(ntile(10) OVER w AS INTEGER) AS decile,
        | round(percent_rank() OVER w, 6) AS pct_rank,
        | round(cume_dist() OVER w, 6) AS cume
        |FROM orders WHERE o_custkey < 200
        |WINDOW w AS (PARTITION BY o_orderstatus ORDER BY o_totalprice, o_orderkey)
        |ORDER BY o_orderkey""".stripMargin,
    "a56_lateral_topper" ->
      """SELECT c.c_custkey, t.o_orderkey, t.o_totalprice
        |FROM customer c, LATERAL (
        |  SELECT o_orderkey, o_totalprice FROM orders o
        |  WHERE o.o_custkey = c.c_custkey
        |  ORDER BY o_totalprice DESC, o_orderkey LIMIT 1) t
        |WHERE c.c_custkey < 500
        |ORDER BY c.c_custkey""".stripMargin,
    "a55_range_frames" ->
      """SELECT event_id, user_id,
        | count(*) OVER (PARTITION BY user_id ORDER BY epoch_ms(ts)
        |   RANGE BETWEEN 3600000 PRECEDING AND CURRENT ROW) AS events_last_hour,
        | CAST(SUM(CAST(round(value, 6) AS DECIMAL(18,6))) OVER (
        |   PARTITION BY user_id ORDER BY epoch_ms(ts)
        |   RANGE BETWEEN 3600000 PRECEDING AND CURRENT ROW) AS DOUBLE) AS value_last_hour
        |FROM events ORDER BY event_id""".stripMargin,
    "a54_sketch_setops" -> {
      def kmv(name: String, where: String): String = {
        val chain = PipelineQueries.fnvMixCtes(name,
          s"(SELECT DISTINCT 'user:' || user_id AS key FROM events WHERE $where) t",
          Seq(), "key")
        s"""$chain,
           |${name}r AS (SELECT h, row_number() OVER (ORDER BY h) AS rn,
           |   count(*) OVER () AS nd FROM (SELECT DISTINCT h FROM $name)),
           |${name}e AS (SELECT CASE WHEN max(nd) < 64 THEN CAST(max(nd) AS DOUBLE)
           |   ELSE 63.0 * 18446744073709551616.0 /
           |     CAST(max(CASE WHEN rn = 64 THEN h END) AS DOUBLE) END AS est
           | FROM ${name}r)""".stripMargin
      }
      s"""WITH ${kmv("ck", "event_type = 'click'")},
         |${kmv("pu", "event_type = 'purchase'")},
         |${kmv("un", "event_type IN ('click', 'purchase')")}
         |SELECT cke.est AS est_click, pue.est AS est_purchase,
         | une.est AS est_union,
         | cke.est + pue.est - une.est AS est_intersection
         |FROM cke, pue, une""".stripMargin
    },
    "a53_higher_order" ->
      """SELECT doc_id,
        | CAST(len(list_filter(string_split(text, ' '), w -> length(w) >= 4)) AS BIGINT) AS n_long,
        | CAST(list_reduce(list_prepend(CAST(0 AS BIGINT),
        |   list_transform(string_split(text, ' '), w -> CAST(length(w) AS BIGINT))),
        |   (a, b) -> a + b) AS BIGINT) AS char_mass,
        | len(list_filter(string_split(text, ' '), w -> length(w) > 8)) > 0 AS any_long8
        |FROM documents ORDER BY doc_id""".stripMargin,
    "a52_map_explode" ->
      """SELECT event_type, k.key AS prop_key, count(*) AS cnt,
        | CAST(sum(CAST(json_extract_string(props, '$.' || k.key) AS BIGINT)) AS BIGINT) AS sum_v
        |FROM events, unnest(json_keys(props)) AS k(key)
        |GROUP BY 1, 2 ORDER BY event_type, prop_key""".stripMargin,
    "a51_dq_audit" ->
      """SELECT 'lineitem_orphan_order' AS rule, count(*) AS violations
        |FROM lineitem l
        |WHERE NOT EXISTS (SELECT 1 FROM orders o WHERE o.o_orderkey = l.l_orderkey)
        |UNION ALL
        |SELECT 'orders_no_lineitem', count(*)
        |FROM orders o
        |WHERE NOT EXISTS (SELECT 1 FROM lineitem l WHERE l.l_orderkey = o.o_orderkey)
        |UNION ALL
        |SELECT 'events_nonpos_value',
        | CAST(sum(CASE WHEN value <= 0 THEN 1 ELSE 0 END) AS BIGINT) FROM events
        |UNION ALL
        |SELECT 'events_null_user',
        | CAST(sum(CASE WHEN user_id IS NULL THEN 1 ELSE 0 END) AS BIGINT) FROM events
        |UNION ALL
        |SELECT 'documents_dup_id', count(*) FROM
        | (SELECT doc_id FROM documents GROUP BY doc_id HAVING count(*) > 1)
        |UNION ALL
        |SELECT 'orders_bad_status',
        | CAST(sum(CASE WHEN o_orderstatus NOT IN ('F','O','P') THEN 1 ELSE 0 END) AS BIGINT)
        |FROM orders
        |ORDER BY rule""".stripMargin,
    "a43_gapfill" ->
      """WITH b AS (SELECT date_trunc('hour', min(ts)) AS lo,
        |  date_trunc('hour', max(ts)) AS hi FROM events),
        |sp AS (SELECT unnest(generate_series(lo, hi, INTERVAL 1 HOUR)) AS hour FROM b),
        |ty AS (SELECT DISTINCT event_type FROM events),
        |c AS (SELECT date_trunc('hour', ts) AS hour, event_type, count(*) AS cnt
        |  FROM events GROUP BY 1, 2)
        |SELECT sp.hour AS hour, ty.event_type, COALESCE(c.cnt, 0) AS cnt
        |FROM sp CROSS JOIN ty
        |LEFT JOIN c ON c.hour = sp.hour AND c.event_type = ty.event_type
        |ORDER BY sp.hour, ty.event_type""".stripMargin,
    "a44_funnel" ->
      """WITH v AS (SELECT user_id, min(ts) AS v_ts FROM events
        |  WHERE event_type = 'view' GROUP BY user_id),
        |c AS (SELECT e.user_id, min(e.ts) AS c_ts FROM events e
        |  JOIN v ON e.user_id = v.user_id
        |  WHERE e.event_type = 'click' AND e.ts > v.v_ts GROUP BY e.user_id),
        |p AS (SELECT e.user_id, min(e.ts) AS p_ts FROM events e
        |  JOIN c ON e.user_id = c.user_id
        |  WHERE e.event_type = 'purchase' AND e.ts > c.c_ts GROUP BY e.user_id)
        |SELECT 1 AS stage_ord, 'view' AS stage, count(*) AS users FROM v
        |UNION ALL SELECT 2, 'click', count(*) FROM c
        |UNION ALL SELECT 3, 'purchase', count(*) FROM p
        |ORDER BY stage_ord""".stripMargin,
    "a45_retention" ->
      """WITH f AS (SELECT user_id, date_trunc('week', min(ts)) AS cohort_week
        |  FROM events GROUP BY user_id),
        |a AS (SELECT DISTINCT user_id, date_trunc('week', ts) AS w FROM events)
        |SELECT f.cohort_week,
        | CAST(date_diff('day', f.cohort_week, a.w) // 7 AS INTEGER) AS week_offset,
        | count(*) AS users
        |FROM a JOIN f ON a.user_id = f.user_id
        |GROUP BY 1, 2 ORDER BY cohort_week, week_offset""".stripMargin,
    "a46_transitions" ->
      """WITH o AS (SELECT user_id, event_type,
        |  lag(event_type) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS prev_type
        | FROM events)
        |SELECT prev_type, event_type AS next_type, count(*) AS transitions
        |FROM o WHERE prev_type IS NOT NULL
        |GROUP BY 1, 2 ORDER BY prev_type, next_type""".stripMargin,
    "a47_grouped_topk" ->
      """SELECT segment, CAST(rk AS INTEGER) AS rank, o_orderkey, o_totalprice FROM (
        | SELECT c.c_mktsegment AS segment, o.o_orderkey, o.o_totalprice,
        |  row_number() OVER (PARTITION BY c.c_mktsegment
        |    ORDER BY o.o_totalprice DESC, o.o_orderkey) AS rk
        | FROM orders o JOIN customer c ON o.o_custkey = c.c_custkey)
        |WHERE rk <= 3 ORDER BY segment, rank""".stripMargin,
    "a41_column_profile" -> {
      val cols = Seq("l_quantity", "l_extendedprice", "l_discount", "l_tax")
      cols.map { c =>
        s"""SELECT '$c' AS column_name,
           | count(*) - count($c) AS n_nulls,
           | count(DISTINCT $c) AS n_distinct,
           | CAST(min($c) AS DOUBLE) AS min_v,
           | CAST(max($c) AS DOUBLE) AS max_v FROM lineitem""".stripMargin
      }.mkString("", "\nUNION ALL\n", "\nORDER BY column_name")
    },
    "a34_pivot" ->
      """SELECT o_orderpriority,
        | count(*) FILTER (o_orderstatus = 'F') AS F,
        | count(*) FILTER (o_orderstatus = 'O') AS O,
        | count(*) FILTER (o_orderstatus = 'P') AS P
        |FROM orders GROUP BY o_orderpriority ORDER BY o_orderpriority""".stripMargin,
    "a35_percentiles" ->
      """SELECT o_orderstatus,
        | round(quantile_cont(o_totalprice, 0.5), 4) AS p50,
        | round(quantile_cont(o_totalprice, 0.9), 4) AS p90,
        | round(quantile_cont(o_totalprice, 0.99), 4) AS p99
        |FROM orders GROUP BY o_orderstatus ORDER BY o_orderstatus""".stripMargin,
    "a36_collections" ->
      """SELECT doc_id,
        | CAST(len(string_split(text, ' ')) AS BIGINT) AS n_words,
        | list_sort(string_split(text, ' '))[1] AS first_sorted,
        | list_reverse_sort(string_split(text, ' '))[1] AS last_sorted,
        | CAST(len(list_distinct(string_split(text, ' '))) AS BIGINT) AS n_distinct,
        | list_contains(string_split(text, ' '), 'spark') AS has_spark
        |FROM documents ORDER BY doc_id""".stripMargin,
    "a38_range_join" ->
      """SELECT date_trunc('month', o_orderdate) AS month, count(*) AS fast_shipments
        |FROM lineitem JOIN orders ON l_orderkey = o_orderkey
        | AND l_shipdate >= o_orderdate
        | AND l_shipdate <= o_orderdate + INTERVAL 60 DAY
        |GROUP BY 1 ORDER BY month""".stripMargin,
    // the salt changes only physical distribution, so the oracle is the
    // plain join
    "a39_salted_join" ->
      """SELECT p_brand AS brand, count(*) AS n_items,
        | CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) AS revenue
        |FROM lineitem JOIN part ON l_partkey = p_partkey
        |GROUP BY 1 ORDER BY 1""".stripMargin,
    "a37_sliding_window" ->
      """WITH e AS (SELECT event_type, ts,
        |  CAST(to_timestamp(floor(epoch(ts)/1800)*1800) AS TIMESTAMP) AS s_max FROM events),
        |x AS (SELECT event_type,
        |  unnest([s_max, s_max - INTERVAL 30 MINUTE]) AS window_start FROM e)
        |SELECT window_start, event_type, count(*) AS cnt
        |FROM x GROUP BY 1, 2 ORDER BY window_start, event_type""".stripMargin,
  )

  val oracles2: Map[String, String] = Map(
    "a28_window_frames" ->
      """SELECT o_orderkey,
        | lag(o_totalprice, 1) OVER w AS prev_price,
        | lead(o_totalprice, 1) OVER w AS next_price,
        | CAST(sum(CAST(o_totalprice AS DECIMAL(18,2)))
        |   OVER (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
        |         ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS DOUBLE) AS running
        |FROM orders
        |WINDOW w AS (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey)
        |ORDER BY o_orderkey""".stripMargin,
    "a29_grouping_sets" ->
      """SELECT l_returnflag, l_linestatus, count(*) AS cnt
        |FROM lineitem
        |GROUP BY GROUPING SETS ((l_returnflag), (l_linestatus), ())
        |ORDER BY l_returnflag ASC NULLS FIRST, l_linestatus ASC NULLS FIRST, cnt""".stripMargin,
    "a30_union_all" ->
      """SELECT src, count(*) AS cnt, count(DISTINCT nationkey) AS nations FROM (
        | SELECT 'c' AS src, c_nationkey AS nationkey FROM customer
        | UNION ALL
        | SELECT 's', CAST(s_nationkey AS INTEGER) FROM supplier)
        |GROUP BY src ORDER BY src""".stripMargin,
    "a32_scalar_subquery" ->
      """SELECT c_custkey,
        | (SELECT count(*) FROM orders WHERE o_custkey = c_custkey) AS n_orders
        |FROM customer ORDER BY c_custkey""".stripMargin,
    "a33_asof_join" ->
      """WITH r AS (SELECT o_custkey AS user_id, o_orderdate, max(o_orderkey) AS o_orderkey
        |           FROM orders GROUP BY 1, 2)
        |SELECT e.event_id, e.user_id, r.o_orderkey, r.o_orderdate
        |FROM events e ASOF JOIN r
        |  ON e.user_id = r.user_id AND e.ts >= r.o_orderdate
        |ORDER BY e.event_id""".stripMargin,
  )

  val oracles: Map[String, String] = Map(
    "a10_pricing_summary" ->
      """SELECT l_returnflag, l_linestatus,
        | CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sum_qty,
        | CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) AS sum_base_price,
        | CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2)) * (CAST(1 AS DECIMAL(18,2)) - CAST(l_discount AS DECIMAL(18,2)))) AS DOUBLE) AS sum_disc_price,
        | CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) / COUNT(*) AS avg_qty,
        | COUNT(*) AS count_order
        |FROM lineitem WHERE l_shipdate <= TIMESTAMP '1998-09-02 00:00:00'
        |GROUP BY l_returnflag, l_linestatus ORDER BY l_returnflag, l_linestatus""".stripMargin,
    "a11_segment_revenue" ->
      """SELECT c_mktsegment,
        | CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2)) * (CAST(1 AS DECIMAL(18,2)) - CAST(l_discount AS DECIMAL(18,2)))) AS DOUBLE) AS revenue,
        | COUNT(DISTINCT o_orderkey) AS n_orders
        |FROM lineitem JOIN orders ON l_orderkey = o_orderkey
        |JOIN customer ON o_custkey = c_custkey
        |GROUP BY c_mktsegment ORDER BY c_mktsegment""".stripMargin,
    "a12_semijoin" ->
      """SELECT c_nationkey, COUNT(*) AS cnt FROM customer
        |WHERE EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey)
        |GROUP BY c_nationkey ORDER BY c_nationkey""".stripMargin,
    "a13_antijoin" ->
      """SELECT c_custkey, c_name FROM customer
        |WHERE NOT EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey)
        |ORDER BY c_custkey""".stripMargin,
    "a14_window_topk" ->
      """SELECT o_custkey, o_orderkey, CAST(rk AS INTEGER) AS rk FROM (
        | SELECT o_custkey, o_orderkey,
        |  row_number() OVER (PARTITION BY o_custkey ORDER BY o_totalprice DESC, o_orderkey) AS rk
        | FROM orders) WHERE rk <= 3 ORDER BY o_custkey, rk""".stripMargin,
    "a15_intersect" ->
      """SELECT DISTINCT c_nationkey AS nationkey FROM customer
        |INTERSECT SELECT DISTINCT CAST(s_nationkey AS INTEGER) FROM supplier
        |ORDER BY nationkey""".stripMargin,
    "a16_except" ->
      """SELECT DISTINCT c_nationkey AS nationkey FROM customer
        |EXCEPT SELECT DISTINCT CAST(s_nationkey AS INTEGER) FROM supplier
        |ORDER BY nationkey""".stripMargin,
    "a17_rollup" ->
      """SELECT l_returnflag, l_linestatus, COUNT(*) AS cnt,
        | CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sum_qty
        |FROM lineitem GROUP BY ROLLUP(l_returnflag, l_linestatus)
        |ORDER BY l_returnflag ASC NULLS FIRST, l_linestatus ASC NULLS FIRST""".stripMargin,
    "a18_topk_orders" ->
      """SELECT o_orderkey, o_custkey, o_totalprice FROM orders
        |ORDER BY o_totalprice DESC, o_orderkey LIMIT 10""".stripMargin,
    "a19_monthly_orders" ->
      """SELECT date_trunc('month', o_orderdate) AS month, COUNT(*) AS n_orders,
        | CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS total
        |FROM orders GROUP BY 1 ORDER BY month""".stripMargin,
    "a20_string_fns" ->
      """SELECT p_partkey, upper(p_brand) AS brand_u, substr(p_name, 1, 8) AS name8,
        | replace(p_type, ' ', '_') AS type_u, CAST(length(p_name) AS BIGINT) AS name_len,
        | concat_ws('|', p_brand, p_type) AS joined
        |FROM part ORDER BY p_partkey""".stripMargin,
    "a21_math_fns" ->
      """SELECT l_orderkey, sqrt(l_extendedprice) AS root,
        | CAST(floor(l_extendedprice) AS BIGINT) AS fl,
        | CAST(ceil(l_extendedprice) AS BIGINT) AS ce,
        | abs(l_discount - 0.05) AS adj,
        | l_orderkey % 7 AS m7
        |FROM lineitem WHERE l_linenumber = 1 ORDER BY l_orderkey""".stripMargin,
    "a22_json" ->
      """SELECT event_type, COUNT(*) AS cnt,
        | CAST(SUM(CAST(json_extract_string(props, '$.k') AS BIGINT)) AS BIGINT) AS sum_k
        |FROM events GROUP BY event_type ORDER BY event_type""".stripMargin,
    "a23_wordcount" ->
      """SELECT word, COUNT(*) AS cnt FROM (
        | SELECT unnest(string_split(text, ' ')) AS word FROM documents)
        |WHERE length(word) > 0
        |GROUP BY word ORDER BY cnt DESC, word LIMIT 25""".stripMargin,
    "a24_events_hourly" ->
      """SELECT date_trunc('hour', ts) AS hour, event_type, COUNT(*) AS cnt,
        | CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS sum_value
        |FROM events GROUP BY 1, 2 ORDER BY hour, event_type""".stripMargin,
    "a25_distinct_parts" ->
      """SELECT l_returnflag, COUNT(DISTINCT l_partkey) AS d_parts,
        | COUNT(DISTINCT l_suppkey) AS d_supps
        |FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag""".stripMargin,
    "a26_cube" ->
      """SELECT o_orderstatus, o_orderpriority, COUNT(*) AS cnt
        |FROM orders GROUP BY CUBE(o_orderstatus, o_orderpriority)
        |ORDER BY o_orderstatus ASC NULLS FIRST, o_orderpriority ASC NULLS FIRST""".stripMargin,
    "a27_snowflake" ->
      """SELECT r_name, COUNT(*) AS n_orders,
        | CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS total
        |FROM orders JOIN customer ON o_custkey = c_custkey
        |JOIN nation ON c_nationkey = n_nationkey
        |JOIN region ON n_regionkey = r_regionkey
        |GROUP BY r_name ORDER BY r_name""".stripMargin,
  )
}
