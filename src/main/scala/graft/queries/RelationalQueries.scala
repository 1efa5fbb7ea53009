package graft.queries

import org.apache.spark.sql.functions._

/** Relational surface: scans, filters, joins, aggregations, top-k, set ops
  * (SURVEY §2.2-§2.6). The reference exposes no SQL dialect — its analogues
  * are predicate scans (VectorList.cs:80-88), point lookups
  * (VectorDatabase.cs:98-109), tag/tenancy filters, the union+distinct of
  * search results, and the tag-dictionary broadcast join — but the engine
  * built here treats the full relational layer as first-class so the same
  * plans carry the 100 TB pipeline operators.
  *
  * Numerics policy: any double that passes through an aggregate is rounded
  * identically on the Spark and oracle sides (partial-aggregation sum order
  * differs between engines in the last bits). Raw stored doubles compare
  * exactly.
  */
object RelationalQueries {

  val defs: Map[String, Q] = Map(
    // TPC-H Q1-shaped scan+aggregate: predicate pushdown + partial aggs.
    // Money sums run as DECIMAL, not DOUBLE: at sf1 the group sums reach
    // ~2.8e10 where double partial-agg order noise (~ulp·√n ≈ 5e-3)
    // crosses the 4-dp rounding grid and the two engines disagree — the
    // q_events_window lesson (r7) at a new scale. Per-row casts are
    // engine-identical (same doubles, same half-up), decimal sums are
    // exact integers, so the result is order- and engine-independent.
    "q1_agg" -> ((s, dir) => {
      table(s, dir, "lineitem")
        .filter(col("l_shipdate") <= lit("1998-09-02").cast("timestamp"))
        .groupBy(col("l_returnflag"), col("l_linestatus"))
        .agg(
          sum(col("l_quantity").cast("decimal(18,4)")).cast("double").as("sum_qty"),
          sum(col("l_extendedprice").cast("decimal(18,4)")).cast("double").as("sum_base_price"),
          round(sum((col("l_extendedprice") * (lit(1.0) - col("l_discount"))).cast("decimal(18,6)")), 4)
            .cast("double").as("sum_disc_price"),
          round(sum(col("l_discount").cast("decimal(18,6)")).cast("double") / count(lit(1)), 6)
            .as("avg_disc"),
          count(lit(1)).as("count_order"))
    }),

    // TPC-H Q3-shaped 3-way join + grouped agg + top-k by revenue.
    "q3_shipping" -> ((s, dir) => {
      val c = table(s, dir, "customer").filter(col("c_mktsegment") === "BUILDING")
      val o = table(s, dir, "orders").filter(col("o_orderdate") < lit("2000-03-15").cast("timestamp"))
      val l = table(s, dir, "lineitem").filter(col("l_shipdate") > lit("2000-03-15").cast("timestamp"))
      l.join(o, col("l_orderkey") === col("o_orderkey"))
        .join(c, col("o_custkey") === col("c_custkey"))
        .groupBy(col("l_orderkey"), col("o_orderdate"), col("o_orderpriority"))
        .agg(round(sum(col("l_extendedprice") * (lit(1.0) - col("l_discount"))), 4).as("revenue"))
        .orderBy(col("revenue").desc, col("l_orderkey"))
        .limit(10)
    }),

    // TPC-H Q5-shaped 6-way join; nation/region/supplier broadcast (small
    // dims stay broadcast-able at any scale; customer/orders/lineitem
    // shuffle on their keys and AQE picks the strategy).
    "q5_join" -> ((s, dir) => {
      val rev = round(sum(col("l_extendedprice") * (lit(1.0) - col("l_discount"))), 4)
      table(s, dir, "lineitem")
        .join(table(s, dir, "orders"), col("l_orderkey") === col("o_orderkey"))
        .join(table(s, dir, "customer"), col("o_custkey") === col("c_custkey"))
        .join(broadcast(table(s, dir, "supplier")),
          col("l_suppkey") === col("s_suppkey") && col("c_nationkey") === col("s_nationkey"))
        .join(broadcast(table(s, dir, "nation")), col("s_nationkey") === col("n_nationkey"))
        .join(broadcast(table(s, dir, "region")), col("n_regionkey") === col("r_regionkey"))
        .filter(col("r_name") === "ASIA" &&
          col("o_orderdate") >= lit("1996-01-01").cast("timestamp") &&
          col("o_orderdate") < lit("1998-01-01").cast("timestamp"))
        .groupBy(col("n_name"))
        .agg(rev.as("revenue"))
    }),

    // ORDER BY + LIMIT → TakeOrderedAndProject (distributed bounded heap).
    "q_topk" -> ((s, dir) =>
      table(s, dir, "orders")
        .select(col("o_orderkey"), col("o_custkey"), col("o_totalprice"))
        .orderBy(col("o_totalprice").desc, col("o_orderkey"))
        .limit(20)),

    // Window function: per-customer top-3 orders by price.
    "q_window" -> ((s, dir) => {
      import org.apache.spark.sql.expressions.Window
      val w = Window.partitionBy(col("o_custkey"))
        .orderBy(col("o_totalprice").desc, col("o_orderkey"))
      table(s, dir, "orders")
        .withColumn("rn", row_number().over(w).cast("long"))
        .filter(col("rn") <= 3)
        .select(col("o_custkey"), col("rn"), col("o_orderkey"), col("o_totalprice"))
    }),

    // Set op: EXCEPT (distinct semantics) — customers with open orders but
    // no filled ones (reference analog: result-set union/except §2.6).
    "q_setops" -> ((s, dir) => {
      val o = table(s, dir, "orders")
      o.filter(col("o_orderstatus") === "O").select(col("o_custkey"))
        .except(o.filter(col("o_orderstatus") === "F").select(col("o_custkey")))
    }),

    // Point lookup — Get-by-id analog (VectorDatabase.cs:98-109). The
    // predicate pushes to the parquet scan.
    "q_point_lookup" -> ((s, dir) =>
      table(s, dir, "lineitem")
        .filter(col("l_orderkey") === 5979L)
        .select(col("l_orderkey"), col("l_linenumber"), col("l_partkey"),
          col("l_quantity"), col("l_extendedprice"), col("l_shipdate"))),

    // Prefix-text filter — SearchService.cs:121-127 (case-insensitive
    // StartsWith fallback for short query texts).
    "q_prefix_filter" -> ((s, dir) =>
      table(s, dir, "documents")
        .filter(lower(col("text")).startsWith("the "))
        .select(col("doc_id"), col("n_chars"))),

    // Tenancy/tag predicate — array_contains/tag analog over the documents
    // dims (VectorTags.cs:171-194; attributes filters).
    "q_tag_filter" -> ((s, dir) =>
      table(s, dir, "documents")
        .filter(col("lang") === "en" && col("source").isin("src1", "src2"))
        .select(col("doc_id"), col("source"))),

    // Distinct aggregation over events.
    "q_distinct" -> ((s, dir) =>
      eventsTable(s, dir)
        .groupBy(col("event_type"))
        .agg(countDistinct(col("user_id")).as("n_users"),
          count(lit(1)).as("n_events"),
          round(sum(col("value")), 4).as("sum_value"))),

    // Left-semi join: customers having at least one urgent order.
    "q_semi_join" -> ((s, dir) => {
      val urgent = table(s, dir, "orders").filter(col("o_orderpriority") === "1-URGENT")
      table(s, dir, "customer")
        .join(urgent, col("c_custkey") === col("o_custkey"), "left_semi")
        .select(col("c_custkey"), col("c_name"))
    }),

    // Left-anti join: customers with no urgent orders.
    "q_anti_join" -> ((s, dir) => {
      val urgent = table(s, dir, "orders").filter(col("o_orderpriority") === "1-URGENT")
      table(s, dir, "customer")
        .join(urgent, col("c_custkey") === col("o_custkey"), "left_anti")
        .select(col("c_custkey"), col("c_name"))
    }),

    // As-of join: every event picks the same user's most recent 'click' at
    // or before its timestamp — composed as union + running last (one hash
    // partition, no inequality join); oracle = DuckDB's native ASOF JOIN.
    "q_asof_join" -> ((s, dir) => {
      val e = eventsTable(s, dir)
      val clicks = e.filter(col("event_type") === "click")
        .select(col("user_id"), col("ts"),
          col("event_id").as("click_id"), col("value").as("click_value"))
      graft.ops.AsOfJoin.asof(
          e.select(col("event_id"), col("user_id"), col("ts")),
          clicks, "user_id", "ts", "ts", Seq("click_id", "click_value"))
        .select(col("event_id"), col("user_id"), col("click_id"),
          round(col("click_value"), 6).as("click_value"))
    }),

    // Bucketed range join: lineitem quantities against nation-derived
    // intervals [2k, 2k+3) — an equi-join on buckets + boundary filter, so
    // the plan never degrades to a nested loop; the oracle runs the plain
    // inequality join.
    "q_interval_join" -> ((s, dir) => {
      val intervals = table(s, dir, "nation")
        .select(col("n_nationkey"),
          (col("n_nationkey") * 2.0).as("lo"),
          (col("n_nationkey") * 2.0 + 3.0).as("hi"))
      graft.ops.RangeJoin.pointInInterval(
          table(s, dir, "lineitem").select(col("l_quantity")),
          "l_quantity", intervals, "lo", "hi", width = 4.0)
        .groupBy(col("n_nationkey"))
        .agg(count(lit(1)).as("n"), round(sum(col("l_quantity")), 4).as("sum_q"))
    }),

    // ROLLUP hierarchy totals (subtotal + grand-total rows with NULL keys).
    "q_rollup" -> ((s, dir) =>
      table(s, dir, "lineitem")
        .rollup(col("l_returnflag"), col("l_linestatus"))
        .agg(count(lit(1)).as("n"), round(sum(col("l_quantity")), 4).as("sum_qty"))),

    // CUBE: all grouping-set combinations in one aggregate pass.
    "q_cube" -> ((s, dir) =>
      table(s, dir, "lineitem")
        .cube(col("l_returnflag"), col("l_linestatus"))
        .agg(count(lit(1)).as("n"), round(sum(col("l_quantity")), 4).as("sum_qty"))),

    // PIVOT: one column per event type (explicit value list keeps the plan
    // a single aggregate — no distinct-values pre-pass at scale).
    "q_pivot" -> ((s, dir) =>
      table(s, dir, "events")
        .groupBy(col("user_id"))
        .pivot("event_type", Seq("click", "error", "purchase", "signup", "view"))
        .agg(round(sum(col("value")), 4))),

    // Left outer join preserving customers without orders (null-side agg).
    "q_outer_join" -> ((s, dir) =>
      table(s, dir, "customer")
        .join(table(s, dir, "orders"), col("c_custkey") === col("o_custkey"), "left")
        .groupBy(col("c_custkey"))
        .agg(count(col("o_orderkey")).as("n_orders"),
          round(coalesce(sum(col("o_totalprice")), lit(0.0)), 4).as("total"))),

    // Running (cumulative) sum per user — ordered-frame window aggregation.
    "q_running_sum" -> ((s, dir) => {
      import org.apache.spark.sql.expressions.Window
      val w = Window.partitionBy(col("user_id"))
        .orderBy(col("ts"), col("event_id"))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      eventsTable(s, dir)
        .withColumn("running", round(sum(col("value")).over(w), 6))
        .select(col("event_id"), col("user_id"), col("running"))
    }),

    // Skew-salted equi-join: lineitem salted 8 ways on a row-unique hash,
    // supplier replicated 8x, joined on (s_suppkey, salt) — result must
    // equal the plain join, which is exactly what the oracle computes.
    "q_salted_join" -> ((s, dir) => {
      val l = table(s, dir, "lineitem")
        .withColumnRenamed("l_suppkey", "s_suppkey")
      graft.ops.Skew.saltedJoin(l, table(s, dir, "supplier"), "s_suppkey",
          salts = 8, saltSrc = col("l_orderkey") * 8 + col("l_linenumber"))
        .groupBy(col("s_nationkey"))
        .agg(round(sum(col("l_quantity")), 4).as("sum_qty"),
          count(lit(1)).as("n"))
    }),

    // Exact percentiles per group (the quantile surface of the engine).
    "q_percentile" -> ((s, dir) =>
      eventsTable(s, dir)
        .groupBy(col("event_type"))
        .agg(round(percentile(col("value"), lit(0.5)), 6).as("p50"),
          round(percentile(col("value"), lit(0.9)), 6).as("p90"))),

    // HLL sketch distinct counts (approximate → rows-only oracle; the
    // spec asserts the 5% relative-error envelope vs exact).
    "q_sketch_distinct" -> ((s, dir) =>
      eventsTable(s, dir)
        .groupBy(col("event_type"))
        .agg(approx_count_distinct(col("user_id")).as("approx_users"))),

    // Approximate quantile sketch (the one-pass bounded-memory quantile
    // path for 100 TB — exact percentile needs a per-group sort).
    // Engine-internal sketch → rows-only; the spec pins the error
    // envelope vs exact percentiles.
    "q_approx_percentile" -> ((s, dir) =>
      eventsTable(s, dir)
        .groupBy(col("event_type"))
        .agg(
          percentile_approx(col("value"), lit(0.5), lit(10000)).as("p50_approx"),
          percentile_approx(col("value"), lit(0.95), lit(10000)).as("p95_approx"))),

    // HLL in its provably-exact regime (VERDICT r4 item 1): 8 distinct
    // values per group against 2^16 registers put the estimator in pure
    // linear counting with (near-certainly) zero register collisions, so
    // the rounded estimate equals the true count — and the register-max
    // merge is order-independent, so the result is partitioning-proof.
    // The oracle is plain COUNT(DISTINCT).
    "q_sketch_distinct_exact" -> ((s, dir) =>
      eventsTable(s, dir)
        .groupBy(col("event_type"))
        .agg(approx_count_distinct(pmod(col("user_id"), lit(8)), 0.005)
          .as("n_user_mod"))),

    // The quantile sketch in its provably-exact regime: accuracy 10^6 →
    // relative error 10^-6, so at group sizes ≪ 10^6 the summary retains
    // every observation (no compression, lossless merges) and the query
    // returns the exact order statistic at rank ceil(p·n) — which the
    // oracle computes directly with a window rank.
    "q_approx_percentile_exact" -> ((s, dir) =>
      eventsTable(s, dir)
        .groupBy(col("event_type"))
        .agg(
          percentile_approx(col("value"), lit(0.5), lit(1000000)).as("p50_sketch"),
          percentile_approx(col("value"), lit(0.95), lit(1000000)).as("p95_sketch"))),

    // Semi-structured JSON column: extract a typed field from the props
    // payload and aggregate on it (get_json_object ↔ json_extract).
    "q_json_extract" -> ((s, dir) =>
      eventsTable(s, dir)
        .withColumn("k", get_json_object(col("props"), "$.k").cast("long"))
        .groupBy((col("k") % 10).as("k_mod"))
        .agg(count(lit(1)).as("n"), round(avg(col("k")), 6).as("avg_k"))),

    // Percentile winsorization: clamp values into the global exact
    // [p01, p99] band — one single-row aggregate broadcast into a
    // narrow clamp, no sort, no window.
    "q_winsorize" -> ((s, dir) => {
      val e = eventsTable(s, dir)
      val b = e.agg(
        round(percentile(col("value"), lit(0.01)), 6).as("lo"),
        round(percentile(col("value"), lit(0.99)), 6).as("hi"))
      e.crossJoin(broadcast(b))
        .select(col("event_id"),
          round(greatest(col("lo"), least(col("hi"), col("value"))), 6).as("v_w"))
    }),

    // Ordered-funnel analysis (view -> click -> purchase): per user the
    // strictly-later chained first-times, and the funnel stage reached.
    // Three filtered min-aggregates chained by equi-joins on user_id —
    // each shuffle is linear and map-side-partial; no per-user window,
    // no event-array materialization.
    "funnel_stages" -> ((s, dir) => {
      val e = eventsTable(s, dir)
      def fmt(c: org.apache.spark.sql.Column) =
        date_format(c, "yyyy-MM-dd HH:mm:ss.SSSSSS")
      val v = e.filter(col("event_type") === "view")
        .groupBy(col("user_id")).agg(min(col("ts")).as("t1"))
      val c1 = e.filter(col("event_type") === "click").join(v, "user_id")
        .filter(col("ts") > col("t1"))
        .groupBy(col("user_id")).agg(min(col("ts")).as("t2"))
      val p = e.filter(col("event_type") === "purchase").join(c1, "user_id")
        .filter(col("ts") > col("t2"))
        .groupBy(col("user_id")).agg(min(col("ts")).as("t3"))
      e.select(col("user_id")).distinct()
        .join(v, Seq("user_id"), "left")
        .join(c1, Seq("user_id"), "left")
        .join(p, Seq("user_id"), "left")
        .select(col("user_id"),
          when(col("t3").isNotNull, 3).when(col("t2").isNotNull, 2)
            .when(col("t1").isNotNull, 1).otherwise(0).as("stage"),
          fmt(col("t1")).as("t_view"), fmt(col("t2")).as("t_click"),
          fmt(col("t3")).as("t_purchase"))
    }),

    // Weekly retention cohorts: cohort = ISO week of the user's first
    // event, counts of distinct users active k weeks later. Two
    // aggregates plus one user-keyed join; week arithmetic is exact
    // integer epoch division (UTC, no DST).
    "retention_cohorts" -> ((s, dir) => {
      val e = eventsTable(s, dir)
      val first = e.groupBy(col("user_id"))
        .agg(date_trunc("week", min(col("ts"))).as("cohort_w"))
      val active = e.select(col("user_id"),
        date_trunc("week", col("ts")).as("act_w")).distinct()
      active.join(first, "user_id")
        .select(col("user_id"), col("cohort_w"),
          ((unix_timestamp(col("act_w")) - unix_timestamp(col("cohort_w")))
            / 604800L).cast("long").as("week_n"))
        .groupBy(date_format(col("cohort_w"), "yyyy-MM-dd").as("cohort_week"),
          col("week_n"))
        .agg(countDistinct(col("user_id")).as("n_users"))
    }),

    // Gap-based sessionization (session_window, 30-minute gap) — the
    // oracle rebuilds sessions with lag + cumulative-start-count, the
    // portable definition of the same semantics. Session start is
    // formatted to micros so both engines stringify identically.
    "q_session_window" -> ((s, dir) =>
      eventsTable(s, dir)
        .groupBy(session_window(col("ts"), "30 minutes").as("w"), col("user_id"))
        .agg(count(lit(1)).as("n"), round(sum(col("value")), 4).as("sum_value"))
        .select(col("user_id"),
          date_format(col("w.start"), "yyyy-MM-dd HH:mm:ss.SSSSSS").as("session_start"),
          col("n"), col("sum_value"))),

    // Event-time tumbling-window aggregation (streaming-compatible shape:
    // the same plan runs under readStream+watermark, see graft.streaming).
    "q_events_window" -> ((s, dir) =>
      // value carries exact 2-decimal amounts: summing as DECIMAL makes
      // the aggregate order-INDEPENDENT (double partial-agg order flipped
      // one group's 6th decimal at sf0.1), and avg derives from the exact
      // sum so both engines divide the same double by the same count
      eventsTable(s, dir)
        .groupBy(date_trunc("hour", col("ts")).as("hour"), col("event_type"))
        .agg(count(lit(1)).as("n"),
          round(sum(col("value").cast("decimal(30,4)")), 4).cast("double").as("sum_value"),
          round(sum(col("value").cast("decimal(30,4)")).cast("double") / count(lit(1)), 6)
            .as("avg_value"))))

  val oracles: Map[String, String] = Map(
    "q1_agg" ->
      """SELECT l_returnflag, l_linestatus,
        | CAST(sum(CAST(l_quantity AS DECIMAL(18,4))) AS DOUBLE) AS sum_qty,
        | CAST(sum(CAST(l_extendedprice AS DECIMAL(18,4))) AS DOUBLE) AS sum_base_price,
        | CAST(round(sum(CAST(l_extendedprice * (1.0 - l_discount) AS DECIMAL(18,6))), 4) AS DOUBLE) AS sum_disc_price,
        | round(CAST(sum(CAST(l_discount AS DECIMAL(18,6))) AS DOUBLE) / count(*), 6) AS avg_disc,
        | count(*) AS count_order
        |FROM lineitem
        |WHERE l_shipdate <= TIMESTAMP '1998-09-02'
        |GROUP BY l_returnflag, l_linestatus""".stripMargin,

    "q3_shipping" ->
      """SELECT l.l_orderkey AS l_orderkey, o.o_orderdate AS o_orderdate,
        | o.o_orderpriority AS o_orderpriority,
        | round(sum(l.l_extendedprice * (1.0 - l.l_discount)), 4) AS revenue
        |FROM lineitem l
        |JOIN orders o ON l.l_orderkey = o.o_orderkey
        |JOIN customer c ON o.o_custkey = c.c_custkey
        |WHERE c.c_mktsegment = 'BUILDING'
        |  AND o.o_orderdate < TIMESTAMP '2000-03-15'
        |  AND l.l_shipdate > TIMESTAMP '2000-03-15'
        |GROUP BY 1, 2, 3
        |ORDER BY revenue DESC, l_orderkey
        |LIMIT 10""".stripMargin,

    "q5_join" ->
      """SELECT n.n_name AS n_name,
        | round(sum(l.l_extendedprice * (1.0 - l.l_discount)), 4) AS revenue
        |FROM lineitem l
        |JOIN orders o ON l.l_orderkey = o.o_orderkey
        |JOIN customer c ON o.o_custkey = c.c_custkey
        |JOIN supplier s ON l.l_suppkey = s.s_suppkey AND c.c_nationkey = s.s_nationkey
        |JOIN nation n ON s.s_nationkey = n.n_nationkey
        |JOIN region r ON n.n_regionkey = r.r_regionkey
        |WHERE r.r_name = 'ASIA'
        |  AND o.o_orderdate >= TIMESTAMP '1996-01-01'
        |  AND o.o_orderdate < TIMESTAMP '1998-01-01'
        |GROUP BY n.n_name""".stripMargin,

    "q_topk" ->
      """SELECT o_orderkey, o_custkey, o_totalprice FROM orders
        |ORDER BY o_totalprice DESC, o_orderkey LIMIT 20""".stripMargin,

    "q_window" ->
      """SELECT o_custkey, CAST(rn AS BIGINT) AS rn, o_orderkey, o_totalprice FROM (
        |  SELECT o_custkey, o_orderkey, o_totalprice,
        |    row_number() OVER (PARTITION BY o_custkey
        |                       ORDER BY o_totalprice DESC, o_orderkey) AS rn
        |  FROM orders)
        |WHERE rn <= 3""".stripMargin,

    "q_setops" ->
      """SELECT o_custkey FROM orders WHERE o_orderstatus = 'O'
        |EXCEPT
        |SELECT o_custkey FROM orders WHERE o_orderstatus = 'F'""".stripMargin,

    "q_point_lookup" ->
      """SELECT l_orderkey, l_linenumber, l_partkey, l_quantity,
        | l_extendedprice, l_shipdate
        |FROM lineitem WHERE l_orderkey = 5979""".stripMargin,

    "q_prefix_filter" ->
      """SELECT doc_id, n_chars FROM documents
        |WHERE lower(text) LIKE 'the %'""".stripMargin,

    "q_tag_filter" ->
      """SELECT doc_id, source FROM documents
        |WHERE lang = 'en' AND source IN ('src1', 'src2')""".stripMargin,

    "q_distinct" ->
      """SELECT event_type, count(DISTINCT user_id) AS n_users,
        | count(*) AS n_events, round(sum(value), 4) AS sum_value
        |FROM events GROUP BY event_type""".stripMargin,

    "q_semi_join" ->
      """SELECT c_custkey, c_name FROM customer c
        |WHERE EXISTS (SELECT 1 FROM orders o
        |  WHERE o.o_custkey = c.c_custkey AND o.o_orderpriority = '1-URGENT')""".stripMargin,

    "q_anti_join" ->
      """SELECT c_custkey, c_name FROM customer c
        |WHERE NOT EXISTS (SELECT 1 FROM orders o
        |  WHERE o.o_custkey = c.c_custkey AND o.o_orderpriority = '1-URGENT')""".stripMargin,

    "q_interval_join" ->
      """SELECT n.n_nationkey AS n_nationkey, count(*) AS n,
        | round(sum(l.l_quantity), 4) AS sum_q
        |FROM lineitem l JOIN nation n
        |  ON l.l_quantity >= n.n_nationkey * 2.0
        | AND l.l_quantity <  n.n_nationkey * 2.0 + 3.0
        |GROUP BY 1""".stripMargin,

    "q_asof_join" ->
      """SELECT e.event_id AS event_id, e.user_id AS user_id,
        | c.click_id AS click_id, round(c.click_value, 6) AS click_value
        |FROM events e
        |ASOF JOIN (SELECT user_id, ts, event_id AS click_id, value AS click_value
        |           FROM events WHERE event_type = 'click') c
        |  ON e.user_id = c.user_id AND e.ts >= c.ts""".stripMargin,

    "q_rollup" ->
      """SELECT l_returnflag, l_linestatus, count(*) AS n,
        | round(sum(l_quantity), 4) AS sum_qty
        |FROM lineitem GROUP BY ROLLUP(l_returnflag, l_linestatus)""".stripMargin,

    "q_cube" ->
      """SELECT l_returnflag, l_linestatus, count(*) AS n,
        | round(sum(l_quantity), 4) AS sum_qty
        |FROM lineitem GROUP BY CUBE(l_returnflag, l_linestatus)""".stripMargin,

    "q_pivot" ->
      """SELECT user_id,
        | round(sum(CASE WHEN event_type = 'click' THEN value END), 4) AS click,
        | round(sum(CASE WHEN event_type = 'error' THEN value END), 4) AS error,
        | round(sum(CASE WHEN event_type = 'purchase' THEN value END), 4) AS purchase,
        | round(sum(CASE WHEN event_type = 'signup' THEN value END), 4) AS signup,
        | round(sum(CASE WHEN event_type = 'view' THEN value END), 4) AS view
        |FROM events GROUP BY user_id""".stripMargin,

    "q_outer_join" ->
      """SELECT c.c_custkey AS c_custkey, count(o.o_orderkey) AS n_orders,
        | round(coalesce(sum(o.o_totalprice), 0.0), 4) AS total
        |FROM customer c LEFT JOIN orders o ON c.c_custkey = o.o_custkey
        |GROUP BY 1""".stripMargin,

    "q_running_sum" ->
      """SELECT event_id, user_id,
        | round(sum(value) OVER (PARTITION BY user_id ORDER BY ts, event_id
        |   ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW), 6) AS running
        |FROM events""".stripMargin,

    "q_salted_join" ->
      """SELECT s.s_nationkey AS s_nationkey,
        | round(sum(l.l_quantity), 4) AS sum_qty, count(*) AS n
        |FROM lineitem l JOIN supplier s ON l.l_suppkey = s.s_suppkey
        |GROUP BY 1""".stripMargin,

    "q_percentile" ->
      """SELECT event_type,
        | round(quantile_cont(value, 0.5), 6) AS p50,
        | round(quantile_cont(value, 0.9), 6) AS p90
        |FROM events GROUP BY event_type""".stripMargin,

    "q_sketch_distinct_exact" ->
      """SELECT event_type,
        | CAST(count(DISTINCT ((user_id % 8) + 8) % 8) AS BIGINT) AS n_user_mod
        |FROM events GROUP BY event_type""".stripMargin,

    // The exact-regime sketch returns the order statistic at 1-indexed
    // rank ceil(p·n) — replayed with an explicit window rank (DuckDB's
    // quantile_disc uses a different rank rule, so it is NOT used here).
    "q_approx_percentile_exact" ->
      """WITH v AS (
        |  SELECT event_type, value,
        |    row_number() OVER (PARTITION BY event_type ORDER BY value) AS rn,
        |    count(*) OVER (PARTITION BY event_type) AS n
        |  FROM events)
        |SELECT event_type,
        |  max(CASE WHEN rn = CAST(ceil(0.5 * n) AS BIGINT) THEN value END) AS p50_sketch,
        |  max(CASE WHEN rn = CAST(ceil(0.95 * n) AS BIGINT) THEN value END) AS p95_sketch
        |FROM v GROUP BY event_type""".stripMargin,

    "q_json_extract" ->
      """SELECT CAST(json_extract(props, '$.k') AS BIGINT) % 10 AS k_mod,
        | count(*) AS n,
        | round(avg(CAST(json_extract(props, '$.k') AS BIGINT)), 6) AS avg_k
        |FROM events GROUP BY 1""".stripMargin,

    "q_winsorize" ->
      """WITH b AS (SELECT round(quantile_cont(value, 0.01), 6) AS lo,
        |                  round(quantile_cont(value, 0.99), 6) AS hi FROM events)
        |SELECT event_id,
        |  round(greatest(b.lo, least(b.hi, value)), 6) AS v_w
        |FROM events CROSS JOIN b""".stripMargin,

    "funnel_stages" ->
      """WITH v AS (SELECT user_id, min(ts) AS t1 FROM events
        |           WHERE event_type = 'view' GROUP BY user_id),
        |c AS (SELECT e.user_id, min(e.ts) AS t2 FROM events e
        |      JOIN v ON v.user_id = e.user_id
        |      WHERE e.event_type = 'click' AND e.ts > v.t1 GROUP BY e.user_id),
        |p AS (SELECT e.user_id, min(e.ts) AS t3 FROM events e
        |      JOIN c ON c.user_id = e.user_id
        |      WHERE e.event_type = 'purchase' AND e.ts > c.t2 GROUP BY e.user_id),
        |u AS (SELECT DISTINCT user_id FROM events)
        |SELECT u.user_id,
        |  CASE WHEN p.t3 IS NOT NULL THEN 3 WHEN c.t2 IS NOT NULL THEN 2
        |       WHEN v.t1 IS NOT NULL THEN 1 ELSE 0 END AS stage,
        |  strftime(v.t1, '%Y-%m-%d %H:%M:%S.%f') AS t_view,
        |  strftime(c.t2, '%Y-%m-%d %H:%M:%S.%f') AS t_click,
        |  strftime(p.t3, '%Y-%m-%d %H:%M:%S.%f') AS t_purchase
        |FROM u LEFT JOIN v USING (user_id) LEFT JOIN c USING (user_id)
        |LEFT JOIN p USING (user_id)""".stripMargin,

    // week arithmetic: both engines truncate to ISO Monday in UTC, the
    // epoch difference is an exact multiple of 604800
    "retention_cohorts" ->
      """WITH f AS (SELECT user_id, date_trunc('week', min(ts)) AS cohort_w
        |           FROM events GROUP BY user_id),
        |a AS (SELECT DISTINCT user_id, date_trunc('week', ts) AS act_w FROM events)
        |SELECT strftime(f.cohort_w, '%Y-%m-%d') AS cohort_week,
        |  (CAST(epoch(a.act_w) AS BIGINT) - CAST(epoch(f.cohort_w) AS BIGINT))
        |    // 604800 AS week_n,
        |  CAST(count(DISTINCT a.user_id) AS BIGINT) AS n_users
        |FROM a JOIN f USING (user_id)
        |GROUP BY 1, 2""".stripMargin,

    "q_session_window" ->
      """WITH x AS (
        |  SELECT user_id, ts, value,
        |    CASE WHEN lag(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id) IS NULL
        |           OR ts - lag(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id) > INTERVAL 30 MINUTE
        |         THEN 1 ELSE 0 END AS s
        |  FROM events),
        |y AS (SELECT *, sum(s) OVER (PARTITION BY user_id ORDER BY ts
        |        ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS sid
        |      FROM x)
        |SELECT user_id, strftime(min(ts), '%Y-%m-%d %H:%M:%S.%f') AS session_start,
        |  count(*) AS n, round(sum(value), 4) AS sum_value
        |FROM y GROUP BY user_id, sid""".stripMargin,

    "q_events_window" ->
      """SELECT date_trunc('hour', ts) AS hour, event_type,
        | count(*) AS n,
        | CAST(round(sum(CAST(value AS DECIMAL(30,4))), 4) AS DOUBLE) AS sum_value,
        | round(CAST(sum(CAST(value AS DECIMAL(30,4))) AS DOUBLE) / count(*), 6) AS avg_value
        |FROM events GROUP BY 1, 2""".stripMargin)
}
