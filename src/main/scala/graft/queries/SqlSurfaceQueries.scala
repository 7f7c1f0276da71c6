package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.sources.Tables

/**
 * Round-4 widening of the SQL surface (SURVEY.md §2.3 "host-engine
 * categories"): constructs a user of the reference's host engine
 * (DuckDB — see /root/reference README examples) reaches daily but
 * that no earlier declared query exercised end-to-end:
 *
 *  - FULL OUTER JOIN (a59) — both sides are pre-aggregated on the join
 *    key, so the full-outer merge shuffles one row per key per side;
 *    at 100 TB this is two partial-agg exchanges sharing one key, an
 *    SMJ, and nothing resident.
 *  - INTERSECT ALL / EXCEPT ALL multiset semantics (a60).
 *  - Aggregate FILTER (WHERE ...) clauses (a61) — one scan computes
 *    every conditional aggregate; no self-joins, no re-scans.
 *  - Statistical/regression aggregates (a62): corr, covar_samp,
 *    stddev_samp, var_samp, regr_slope/intercept/r2/count. All are
 *    single-pass partial+final merges (Welford-style), so they scale
 *    exactly like SUM.
 *  - median + bitwise aggregates (a63).
 *  - UNPIVOT / melt back from a pivoted wide table (a64).
 *  - IGNORE NULLS window navigation + nth_value (a65).
 *  - WITH RECURSIVE date-spine (a66) — Spark 4's recursive CTE; the
 *    spine is 31 rows, the join against it broadcasts.
 *  - levenshtein fuzzy top-k (a67) — scan-local scalar +
 *    TakeOrderedAndProject; no shuffle beyond the final top-k merge.
 *  - XML parse round-trip (x64) — Spark 4 native from_xml; the oracle
 *    computes the same aggregate from the raw columns, so the parse
 *    must be lossless.
 *
 * Every query carries a DuckDB oracle (same construct on the oracle
 * side where DuckDB has it; an independent formulation where it
 * doesn't, e.g. UNION ALL arms for UNPIVOT).
 */
object SqlSurfaceQueries {

  private def t(s: SparkSession, dir: String, n: String): DataFrame = Tables.load(s, dir, n)

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // FULL OUTER JOIN of two aggregates over disjoint order-status
    // slices: customers with only finished (or only open) orders take
    // nulls on the other side — COALESCE'd to 0 so the driver compare
    // is null-free on the count columns.
    "a59_full_outer" -> ((s, dir) => {
      import s.implicits._
      val o = t(s, dir, "orders")
      val f  = o.filter($"o_orderstatus" === "F").groupBy($"o_custkey")
        .agg(count(lit(1)).as("f_cnt"))
      val op = o.filter($"o_orderstatus" === "O").groupBy($"o_custkey")
        .agg(count(lit(1)).as("o_cnt"))
      f.join(op, Seq("o_custkey"), "full_outer")
        .select($"o_custkey",
          coalesce($"f_cnt", lit(0L)).as("f_cnt"),
          coalesce($"o_cnt", lit(0L)).as("o_cnt"))
        .orderBy("o_custkey")
    }),
    // Multiset set-ops: INTERSECT ALL keeps min(multiplicity),
    // EXCEPT ALL keeps the subtracted multiplicity — both reduced to
    // deterministic (key, cnt) rows and tagged so one result covers
    // both operators.
    "a60_setops_all" -> ((s, dir) => {
      import s.implicits._
      val li   = t(s, dir, "lineitem")
      val low  = li.filter($"l_quantity" < 10).select($"l_suppkey")
      val high = li.filter($"l_quantity" > 40).select($"l_suppkey")
      val ia = low.intersectAll(high).groupBy($"l_suppkey")
        .agg(count(lit(1)).as("cnt")).withColumn("op", lit("intersect_all"))
      val ea = low.exceptAll(high).groupBy($"l_suppkey")
        .agg(count(lit(1)).as("cnt")).withColumn("op", lit("except_all"))
      ia.unionByName(ea).orderBy("op", "l_suppkey")
    }),
    // Aggregate FILTER clauses: four conditional aggregates from ONE
    // scan of orders — the idiomatic replacement for per-condition
    // self-joins. Sum goes through DECIMAL so the partial-agg merge
    // order can't perturb the double.
    "a61_filtered_agg" -> ((s, dir) => {
      import s.implicits._
      t(s, dir, "orders")
        .groupBy($"o_orderpriority")
        .agg(
          expr("count(*) FILTER (WHERE o_orderstatus = 'F')").as("f_cnt"),
          expr("count(*) FILTER (WHERE o_orderstatus = 'O')").as("o_cnt"),
          expr("CAST(sum(CAST(o_totalprice AS DECIMAL(18,2))) FILTER (WHERE o_totalprice > 200000) AS DOUBLE)").as("big_total"),
          expr("max(o_totalprice) FILTER (WHERE o_orderstatus = 'F')").as("f_max"))
        .orderBy("o_orderpriority")
    }),
    // Statistical + least-squares aggregates, grouped. All single-pass
    // merge-able; rounded because Spark and DuckDB accumulate in
    // different orders (both are correct to ~1e-13 relative).
    "a62_stat_aggs" -> ((s, dir) => {
      import s.implicits._
      t(s, dir, "lineitem")
        .groupBy($"l_returnflag")
        .agg(
          round(corr($"l_extendedprice", $"l_quantity"), 6).as("price_qty_corr"),
          round(covar_samp($"l_extendedprice", $"l_quantity"), 2).as("price_qty_covar"),
          round(stddev_samp($"l_extendedprice"), 4).as("price_sd"),
          round(var_samp($"l_quantity"), 4).as("qty_var"),
          round(expr("regr_slope(l_extendedprice, l_quantity)"), 4).as("slope"),
          round(expr("regr_intercept(l_extendedprice, l_quantity)"), 2).as("intercept"),
          round(expr("regr_r2(l_extendedprice, l_quantity)"), 6).as("r2"),
          expr("regr_count(l_extendedprice, l_quantity)").as("n"))
        .orderBy("l_returnflag")
    }),
    // Exact median (interpolated, = percentile 0.5) + bitwise AND/OR/
    // XOR aggregates over the key space.
    "a63_median_bitagg" -> ((s, dir) => {
      import s.implicits._
      t(s, dir, "orders")
        .groupBy($"o_orderstatus")
        .agg(
          round(expr("median(o_totalprice)"), 4).as("med_price"),
          expr("bit_and(o_orderkey)").as("key_and"),
          expr("bit_or(o_orderkey)").as("key_or"),
          expr("bit_xor(o_orderkey)").as("key_xor"))
        .orderBy("o_orderstatus")
    }),
    // Pivot to a wide (linestatus × returnflag) table, then UNPIVOT
    // back to long form — the melt direction of a34_pivot. l_quantity
    // is integral so the BIGINT cast is exact; absent combinations
    // surface as 0, not dropped rows.
    "a64_unpivot" -> ((s, dir) => {
      import s.implicits._
      val wide = t(s, dir, "lineitem")
        .groupBy($"l_linestatus")
        .pivot("l_returnflag", Seq("A", "N", "R"))
        .agg(sum($"l_quantity").cast("long"))
        .select($"l_linestatus",
          coalesce($"A", lit(0L)).as("A"),
          coalesce($"N", lit(0L)).as("N"),
          coalesce($"R", lit(0L)).as("R"))
      wide.unpivot(Array($"l_linestatus"), Array($"A", $"N", $"R"), "flag", "sum_qty")
        .orderBy("l_linestatus", "flag")
    }),
    // Window navigation with IGNORE NULLS: per-user running "last seen
    // purchase value" and "previous purchase value" over an event
    // stream where most rows are not purchases, plus nth_value. The
    // (ts, event_id) sort key is unique, so the default RANGE frame
    // equals ROWS and both engines agree. The deterministic user_id
    // sample keeps the declared output ~2% of events.
    "a65_window_nulls" -> ((s, dir) => {
      import s.implicits._
      val w = Window.partitionBy($"user_id").orderBy($"ts", $"event_id")
      t(s, dir, "events")
        .filter($"user_id" % 53 === 0)
        .withColumn("v", when($"event_type" === "purchase", $"value"))
        .select($"user_id", $"event_id",
          last($"v", ignoreNulls = true).over(w).as("last_purchase"),
          lag($"v", 1, null, ignoreNulls = true).over(w).as("prev_purchase"),
          nth_value($"event_id", 2).over(w).as("second_evt"))
        .orderBy("user_id", "event_id")
    }),
    // Spark 4 recursive CTE: a 31-day date spine generated by
    // recursion, LEFT JOINed against orders so empty days report 0 —
    // the classic gap-free calendar rollup. The spine is driver-tiny
    // and broadcasts; orders is scanned once.
    "a66_recursive_spine" -> ((s, dir) => {
      t(s, dir, "orders").createOrReplaceTempView("a66_orders")
      s.sql("""
        WITH RECURSIVE days(d) AS (
          SELECT TIMESTAMP '1995-01-01'
          UNION ALL
          SELECT d + INTERVAL '1' DAY FROM days WHERE d < TIMESTAMP '1995-01-31'
        )
        SELECT d, COUNT(o_orderkey) AS n_orders,
               CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS day_total
        FROM days LEFT JOIN a66_orders ON date_trunc('DAY', o_orderdate) = d
        GROUP BY d ORDER BY d""")
    }),
    // Fuzzy search: levenshtein distance from every part name to a
    // probe string, global top-20. Scalar work stays in the scan
    // stage; only 20-row heaps reach the final merge
    // (TakeOrderedAndProject).
    "a67_fuzzy_lev" -> ((s, dir) => {
      import s.implicits._
      t(s, dir, "part")
        .select($"p_partkey", $"p_name",
          levenshtein($"p_name", lit("ghost linen sandy spring")).cast("long").as("dist"))
        .orderBy($"dist", $"p_partkey")
        .limit(20)
    }),
    // Spark 4 VARIANT: parse the JSON props column once into a variant,
    // then pull the same path out typed three ways (bigint, string, a
    // missing path). The shredded extraction happens in the scan stage;
    // the oracle recomputes from DuckDB's JSON functions — the variant
    // representation must be lossless.
    "v65_variant" -> ((s, dir) => {
      import s.implicits._
      t(s, dir, "events")
        .select($"event_type", expr("parse_json(props)").as("v"))
        .select($"event_type",
          expr("CAST(variant_get(v, '$.k', 'bigint') AS BIGINT)").as("k"),
          expr("variant_get(v, '$.k', 'string')").as("ks"),
          expr("variant_get(v, '$.missing', 'bigint')").as("miss"))
        .groupBy($"event_type")
        .agg(count($"k").as("n_k"),
          sum($"k").as("sum_k"),
          min($"ks").as("min_ks"),
          max($"ks").as("max_ks"),
          count($"miss").as("n_miss"))
        .orderBy("event_type")
    }),
    // ANSI-safe error-handling functions: try_cast swallows parse
    // failures (odd users carry a non-numeric string), try_divide
    // swallows division by zero (every 5th user) — both map to NULL
    // instead of failing the job, the semantics a 100 TB batch needs
    // when one malformed row must not kill a 6-hour run. Divided
    // doubles are rounded then DECIMAL-summed so the fold order can't
    // perturb the result.
    "a68_try_arith" -> ((s, dir) => {
      import s.implicits._
      t(s, dir, "events")
        .withColumn("mixed",
          when($"user_id" % 2 === 0, $"user_id".cast("string")).otherwise($"event_type"))
        .withColumn("parsed", expr("try_cast(mixed AS BIGINT)"))
        .withColumn("ratio", expr("try_divide(value, CAST(user_id % 5 AS DOUBLE))"))
        .groupBy($"event_type")
        .agg(
          count($"parsed").as("n_parsed"),
          sum($"parsed").as("sum_parsed"),
          count(when($"ratio".isNull, 1)).as("n_div_null"),
          sum(expr("CAST(round(ratio, 6) AS DECIMAL(28,6))")).cast("double").as("sum_ratio"))
        .orderBy("event_type")
    }),
    // GROUP BY ALL / ORDER BY ALL (Spark 4 ≡ DuckDB): every
    // non-aggregate select item is a grouping key, the full select
    // list the sort key — the exact query text runs on both engines.
    "a69_group_by_all" -> ((s, dir) => {
      t(s, dir, "orders").createOrReplaceTempView("a69_orders")
      s.sql("""
        SELECT o_orderstatus, o_orderpriority, COUNT(*) AS cnt,
               CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS total
        FROM a69_orders GROUP BY ALL ORDER BY ALL""")
    }),
    // Null-safe equality join (<=> / IS NOT DISTINCT FROM): every 7th
    // user's bucket key is NULL, and the null-safe join matches the two
    // sides' NULL buckets to each other — the semantics plain `=` would
    // silently drop. Both sides pre-aggregate to one row per bucket
    // before the join.
    "a70_nullsafe_join" -> ((s, dir) => {
      import s.implicits._
      val key = when($"user_id" % 7 === 0, lit(null)).otherwise($"user_id" % 100)
      val ev = t(s, dir, "events")
      val clicks = ev.filter($"event_type" === "click")
        .select(key.cast("long").as("ka"))
        .groupBy($"ka").agg(count(lit(1)).as("click_cnt"))
      val views = ev.filter($"event_type" === "view")
        .select(key.cast("long").as("kb"))
        .groupBy($"kb").agg(count(lit(1)).as("view_cnt"))
      clicks.join(views, $"ka" <=> $"kb", "inner")
        .select($"ka".as("bucket"), $"click_cnt", $"view_cnt")
        .orderBy(asc_nulls_first("bucket"))
    }),
    // ANSI ordered-set aggregates (Spark 4): listagg WITHIN GROUP gives
    // a deterministic concatenation (unlike collect_list, whose order
    // is partition-arrival-dependent and can never be oracle-checked),
    // plus percentile_cont/percentile_disc in their WITHIN GROUP form.
    // The custkey cap keeps the concatenated strings KB-sized; at
    // 100 TB you'd cap or hash the group the same way.
    "a71_ordered_set" -> ((s, dir) => {
      t(s, dir, "customer").createOrReplaceTempView("a71_customer")
      s.sql("""
        SELECT c_mktsegment,
               listagg(c_name, '|') WITHIN GROUP (ORDER BY c_name) AS names,
               round(percentile_cont(0.5) WITHIN GROUP (ORDER BY c_acctbal), 4) AS bal_p50,
               percentile_disc(0.9) WITHIN GROUP (ORDER BY c_acctbal) AS bal_p90
        FROM a71_customer WHERE c_custkey <= 300
        GROUP BY c_mktsegment ORDER BY c_mktsegment""")
    }),
    // Join-strategy hints: /*+ MERGE(c) */ forces a sort-merge join
    // where the planner would otherwise broadcast the 150-row customer
    // side — proof the hint surface steers physical strategy
    // (plan-pinned). The hint is the escape hatch when a "small" side
    // is only small at test scale: at 100 TB the same query text keeps
    // the scalable plan no matter what the estimator thinks.
    "a72_join_hints" -> ((s, dir) => {
      t(s, dir, "customer").createOrReplaceTempView("a72_customer")
      t(s, dir, "orders").createOrReplaceTempView("a72_orders")
      s.sql("""
        SELECT /*+ MERGE(c) */ c.c_mktsegment, COUNT(*) AS orders,
               CAST(SUM(CAST(o.o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS total
        FROM a72_customer c JOIN a72_orders o ON o.o_custkey = c.c_custkey
        GROUP BY c.c_mktsegment ORDER BY c.c_mktsegment""")
    }),
    // CDC / changelog compaction: keep each key's LATEST record
    // (row_number = 1 over ts DESC with an id tie-break — a total
    // order, so the survivor is deterministic on both engines). At
    // scale this is the upsert-table compaction every ingest runs;
    // Spark plans the rank<=1 filter as WindowGroupLimit, pruning
    // per-group state to one row instead of sorting whole groups
    // through the aggregation. ts is reported as epoch micros — the
    // engines' timestamp renderings differ, their micros don't.
    "a73_latest_per_key" -> ((s, dir) => {
      import s.implicits._
      import org.apache.spark.sql.expressions.Window
      t(s, dir, "events")
        .withColumn("rn", row_number().over(
          Window.partitionBy($"user_id").orderBy($"ts".desc, $"event_id".desc)))
        .where($"rn" === 1)
        .select($"user_id", $"event_id", unix_micros($"ts").as("last_us"),
          $"event_type", $"value")
        // NULLS LAST pinned: a NULL user_id key (the a51 DQ rule
        // admits them) compacts to its own row on both engines, but
        // Spark's default nulls-first vs DuckDB's nulls-last would put
        // it at opposite ends of the positionally-compared output
        .orderBy(asc_nulls_last("user_id"))
    }),
    // XML round-trip: serialize two customer columns into an XML
    // fragment, parse it back with Spark 4's native from_xml, and
    // aggregate the PARSED fields. The oracle aggregates the raw
    // columns — any lossiness in the round-trip breaks the match.
    "x64_xml_roundtrip" -> ((s, dir) => {
      import s.implicits._
      t(s, dir, "customer")
        .select(concat(lit("<c><seg>"), $"c_mktsegment",
          lit("</seg><nat>"), $"c_nationkey".cast("string"),
          lit("</nat></c>")).as("xml"))
        .select(expr("from_xml(xml, 'seg STRING, nat INT')").as("c"))
        .groupBy($"c.seg".as("seg"))
        .agg(count(lit(1)).as("cnt"), sum($"c.nat").as("sum_nat"))
        .orderBy("seg")
    }))

  def oracles: Map[String, String] = Map(
    "a59_full_outer" ->
      """SELECT COALESCE(f.o_custkey, o.o_custkey) AS o_custkey,
        | COALESCE(f.f_cnt, 0) AS f_cnt, COALESCE(o.o_cnt, 0) AS o_cnt
        |FROM (SELECT o_custkey, COUNT(*) AS f_cnt FROM orders
        |      WHERE o_orderstatus = 'F' GROUP BY 1) f
        |FULL OUTER JOIN
        |     (SELECT o_custkey, COUNT(*) AS o_cnt FROM orders
        |      WHERE o_orderstatus = 'O' GROUP BY 1) o
        |ON f.o_custkey = o.o_custkey
        |ORDER BY o_custkey""".stripMargin,
    "a60_setops_all" ->
      """SELECT l_suppkey, COUNT(*) AS cnt, 'intersect_all' AS op FROM (
        |  SELECT l_suppkey FROM lineitem WHERE l_quantity < 10
        |  INTERSECT ALL
        |  SELECT l_suppkey FROM lineitem WHERE l_quantity > 40) GROUP BY 1
        |UNION ALL
        |SELECT l_suppkey, COUNT(*) AS cnt, 'except_all' AS op FROM (
        |  SELECT l_suppkey FROM lineitem WHERE l_quantity < 10
        |  EXCEPT ALL
        |  SELECT l_suppkey FROM lineitem WHERE l_quantity > 40) GROUP BY 1
        |ORDER BY op, l_suppkey""".stripMargin,
    "a61_filtered_agg" ->
      """SELECT o_orderpriority,
        | COUNT(*) FILTER (WHERE o_orderstatus = 'F') AS f_cnt,
        | COUNT(*) FILTER (WHERE o_orderstatus = 'O') AS o_cnt,
        | CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2)))
        |   FILTER (WHERE o_totalprice > 200000) AS DOUBLE) AS big_total,
        | MAX(o_totalprice) FILTER (WHERE o_orderstatus = 'F') AS f_max
        |FROM orders GROUP BY o_orderpriority ORDER BY o_orderpriority""".stripMargin,
    "a62_stat_aggs" ->
      """SELECT l_returnflag,
        | round(corr(l_extendedprice, l_quantity), 6) AS price_qty_corr,
        | round(covar_samp(l_extendedprice, l_quantity), 2) AS price_qty_covar,
        | round(stddev_samp(l_extendedprice), 4) AS price_sd,
        | round(var_samp(l_quantity), 4) AS qty_var,
        | round(regr_slope(l_extendedprice, l_quantity), 4) AS slope,
        | round(regr_intercept(l_extendedprice, l_quantity), 2) AS intercept,
        | round(regr_r2(l_extendedprice, l_quantity), 6) AS r2,
        | regr_count(l_extendedprice, l_quantity) AS n
        |FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag""".stripMargin,
    "a63_median_bitagg" ->
      """SELECT o_orderstatus,
        | round(median(o_totalprice), 4) AS med_price,
        | bit_and(o_orderkey) AS key_and,
        | bit_or(o_orderkey) AS key_or,
        | bit_xor(o_orderkey) AS key_xor
        |FROM orders GROUP BY o_orderstatus ORDER BY o_orderstatus""".stripMargin,
    "a64_unpivot" ->
      """WITH g AS (
        |  SELECT l_linestatus, l_returnflag AS flag,
        |         CAST(SUM(l_quantity) AS BIGINT) AS sum_qty
        |  FROM lineitem GROUP BY 1, 2),
        |s AS (SELECT DISTINCT l_linestatus FROM lineitem),
        |f AS (SELECT unnest(['A','N','R']) AS flag)
        |SELECT s.l_linestatus, f.flag, COALESCE(g.sum_qty, 0) AS sum_qty
        |FROM s CROSS JOIN f
        |LEFT JOIN g ON g.l_linestatus = s.l_linestatus AND g.flag = f.flag
        |ORDER BY s.l_linestatus, f.flag""".stripMargin,
    "a65_window_nulls" ->
      """SELECT user_id, event_id,
        | last_value(v IGNORE NULLS) OVER w AS last_purchase,
        | lag(v IGNORE NULLS) OVER w AS prev_purchase,
        | nth_value(event_id, 2) OVER w AS second_evt
        |FROM (SELECT user_id, event_id, ts,
        |        CASE WHEN event_type = 'purchase' THEN value END AS v
        |      FROM events WHERE user_id % 53 = 0)
        |WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
        |ORDER BY user_id, event_id""".stripMargin,
    "a66_recursive_spine" ->
      """WITH RECURSIVE days(d) AS (
        |  SELECT TIMESTAMP '1995-01-01'
        |  UNION ALL
        |  SELECT d + INTERVAL 1 DAY FROM days WHERE d < TIMESTAMP '1995-01-31'
        |)
        |SELECT d, COUNT(o_orderkey) AS n_orders,
        |       CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS day_total
        |FROM days LEFT JOIN orders ON date_trunc('day', o_orderdate) = d
        |GROUP BY d ORDER BY d""".stripMargin,
    "a67_fuzzy_lev" ->
      """SELECT p_partkey, p_name,
        | CAST(levenshtein(p_name, 'ghost linen sandy spring') AS BIGINT) AS dist
        |FROM part ORDER BY dist, p_partkey LIMIT 20""".stripMargin,
    "v65_variant" ->
      """SELECT event_type,
        | COUNT(json_extract(props, '$.k')) AS n_k,
        | CAST(SUM(CAST(json_extract_string(props, '$.k') AS BIGINT)) AS BIGINT) AS sum_k,
        | MIN(json_extract_string(props, '$.k')) AS min_ks,
        | MAX(json_extract_string(props, '$.k')) AS max_ks,
        | COUNT(json_extract(props, '$.missing')) AS n_miss
        |FROM events GROUP BY event_type ORDER BY event_type""".stripMargin,
    "a68_try_arith" ->
      """SELECT event_type,
        | COUNT(TRY_CAST(mixed AS BIGINT)) AS n_parsed,
        | CAST(SUM(TRY_CAST(mixed AS BIGINT)) AS BIGINT) AS sum_parsed,
        | COUNT(*) FILTER (WHERE ratio IS NULL) AS n_div_null,
        | CAST(SUM(CAST(round(ratio, 6) AS DECIMAL(28,6))) AS DOUBLE) AS sum_ratio
        |FROM (SELECT event_type,
        |        CASE WHEN user_id % 2 = 0 THEN CAST(user_id AS VARCHAR)
        |             ELSE event_type END AS mixed,
        |        value / nullif(CAST(user_id % 5 AS DOUBLE), 0) AS ratio
        |      FROM events)
        |GROUP BY event_type ORDER BY event_type""".stripMargin,
    "a69_group_by_all" ->
      """SELECT o_orderstatus, o_orderpriority, COUNT(*) AS cnt,
        |       CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS total
        |FROM orders GROUP BY ALL ORDER BY ALL""".stripMargin,
    "a70_nullsafe_join" ->
      """SELECT a.ka AS bucket, a.click_cnt, b.view_cnt
        |FROM (SELECT CASE WHEN user_id % 7 = 0 THEN NULL
        |             ELSE user_id % 100 END AS ka, COUNT(*) AS click_cnt
        |      FROM events WHERE event_type = 'click' GROUP BY 1) a
        |JOIN (SELECT CASE WHEN user_id % 7 = 0 THEN NULL
        |             ELSE user_id % 100 END AS kb, COUNT(*) AS view_cnt
        |      FROM events WHERE event_type = 'view' GROUP BY 1) b
        |ON a.ka IS NOT DISTINCT FROM b.kb
        |ORDER BY bucket NULLS FIRST""".stripMargin,
    "a71_ordered_set" ->
      """SELECT c_mktsegment,
        | string_agg(c_name, '|' ORDER BY c_name) AS names,
        | round(percentile_cont(0.5) WITHIN GROUP (ORDER BY c_acctbal), 4) AS bal_p50,
        | percentile_disc(0.9) WITHIN GROUP (ORDER BY c_acctbal) AS bal_p90
        |FROM customer WHERE c_custkey <= 300
        |GROUP BY c_mktsegment ORDER BY c_mktsegment""".stripMargin,
    "a72_join_hints" ->
      """SELECT c.c_mktsegment, COUNT(*) AS orders,
        | CAST(SUM(CAST(o.o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS total
        |FROM customer c JOIN orders o ON o.o_custkey = c.c_custkey
        |GROUP BY c.c_mktsegment ORDER BY c.c_mktsegment""".stripMargin,
    "a73_latest_per_key" ->
      // order on epoch_us(ts), not raw ts: on a nanos-typed events file
      // DuckDB would otherwise tie-break at nanosecond precision while
      // Spark orders the micros-floored timestamp — different survivors
      // for same-microsecond events. Micros ordering matches Spark's
      // normalized column under every encoding the loader accepts.
      """SELECT user_id, event_id, epoch_us(ts) AS last_us, event_type, value
        |FROM (
        | SELECT user_id, event_id, ts, event_type, value,
        |  row_number() OVER (PARTITION BY user_id
        |    ORDER BY epoch_us(ts) DESC, event_id DESC) AS rn
        | FROM events)
        |WHERE rn = 1 ORDER BY user_id""".stripMargin,
    "x64_xml_roundtrip" ->
      """SELECT c_mktsegment AS seg, COUNT(*) AS cnt,
        | CAST(SUM(c_nationkey) AS BIGINT) AS sum_nat
        |FROM customer GROUP BY 1 ORDER BY 1""".stripMargin)
}
