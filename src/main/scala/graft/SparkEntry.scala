package graft

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.operators.QueryRunner

/**
 * Driver contract — one `queries` entry per operator from SURVEY.md §2
 * (plus the training-data-pipeline extensions), each with a DuckDB oracle
 * over the same parquet tables. Column names are aliased identically on
 * both sides; every query carries a total ORDER BY for deterministic
 * hashing. Float aggregates are rounded on both sides so double summation
 * order cannot flip the hash.
 */
object SparkEntry {

  private def t(s: SparkSession, dir: String, name: String): DataFrame =
    s.read.parquet(s"$dir/$name.parquet")

  /** `events.ts` is parquet TIMESTAMP(NANOS), which Spark's vectorized
   * reader rejects; read it as long nanos and rebuild a micro timestamp
   * (values are µs-aligned). Oracles CAST(ts AS TIMESTAMP) to match. */
  private def events(s: SparkSession, dir: String): DataFrame = {
    s.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    t(s, dir, "events")
      .withColumn("ts", timestamp_micros(expr("ts div 1000")))
  }

  /** Flagship query on sf=0.001; driver smoke-checks rows>0. */
  def entry(spark: SparkSession): DataFrame =
    queries("q19_tpch_q5ish")(spark, "/root/testdata/sf0.001")

  // ---------------------------------------------------------------- core

  /** SURVEY §2.1/2.3/2.4 scans, projection, filters. */
  private val core: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q01_scan_project" -> ((s, d) =>
      t(s, d, "region").select("r_regionkey", "r_name").orderBy("r_regionkey")),

    // §2.4 equality + isin + AND/OR predicate composition
    "q02_filter_isin" -> ((s, d) =>
      t(s, d, "lineitem")
        .filter(col("l_returnflag") === "A" &&
          col("l_linestatus").isin("F", "O") && col("l_quantity") > 25)
        .select("l_orderkey", "l_linenumber", "l_returnflag", "l_quantity")
        .orderBy("l_orderkey", "l_linenumber")),

    // §2.4 string predicate through Catalyst expr() — the glue_query CLI path
    "q03_filter_expr" -> ((s, d) => {
      val qr = new QueryRunner(null)
      qr.apply(t(s, d, "orders"),
          Seq("o_orderkey", "o_totalprice", "o_orderstatus"),
          "o_totalprice > 200000 AND o_orderstatus = 'O'")
        .orderBy("o_orderkey")
    }),

    // §2.5 inner equi-join (dim side broadcast)
    "q04_join_inner" -> ((s, d) =>
      t(s, d, "orders")
        .join(broadcast(t(s, d, "customer")),
          col("o_custkey") === col("c_custkey"))
        .filter(col("c_mktsegment") === "BUILDING")
        .select("o_orderkey", "o_totalprice", "c_name", "c_mktsegment")
        .orderBy("o_orderkey")),

    // §2.5 semi-join ("to consider" pattern)
    "q05_join_semi" -> ((s, d) => {
      val big = t(s, d, "orders").filter(col("o_totalprice") > 300000)
        .select(col("o_custkey").as("c_custkey"))
      t(s, d, "customer").join(big, Seq("c_custkey"), "left_semi")
        .select("c_custkey", "c_name", "c_acctbal")
        .orderBy("c_custkey")
    }),

    // §2.5 anti-join ("to remain" / new-keys pattern)
    "q06_join_anti" -> ((s, d) =>
      t(s, d, "customer")
        .join(t(s, d, "orders").select(col("o_custkey").as("c_custkey")),
          Seq("c_custkey"), "left_anti")
        .select("c_custkey", "c_name")
        .orderBy("c_custkey")),

    // §2.8 unionByName with ragged schemas (allowMissingColumns)
    "q07_union_by_name" -> ((s, d) => {
      val o = t(s, d, "orders")
      val a = o.filter(col("o_orderstatus") === "F")
        .select(col("o_orderkey"), col("o_totalprice"))
      val b = o.filter(col("o_orderstatus") === "O")
        .select(col("o_orderkey"), col("o_orderpriority"))
      a.unionByName(b, allowMissingColumns = true).orderBy("o_orderkey")
    }),

    // §2.6 distinct
    "q08_distinct" -> ((s, d) =>
      t(s, d, "customer").select("c_nationkey", "c_mktsegment").distinct()
        .orderBy("c_nationkey", "c_mktsegment")),

    // §2.7 window argmin — first event per key (the new-record seed pattern)
    "q09_window_argmin" -> ((s, d) => {
      val w = Window.partitionBy(col("user_id"))
        .orderBy(col("ts").asc, col("event_id").asc)
      events(s, d)
        .withColumn("rn", row_number().over(w))
        .filter(col("rn") === 1)
        .select("user_id", "event_id", "event_type", "ts")
        .orderBy("user_id")
    }),

    // §2.8 sort + limit (top-k)
    "q11_sort_limit" -> ((s, d) =>
      t(s, d, "orders")
        .orderBy(col("o_totalprice").desc, col("o_orderkey").asc)
        .select("o_orderkey", "o_totalprice", "o_orderpriority")
        .limit(10)),

    // §2.8 deterministic sample (hash/modulo page of the keyspace)
    "q12_sample" -> ((s, d) =>
      t(s, d, "lineitem").filter(col("l_orderkey") % 97 === 0)
        .select("l_orderkey", "l_linenumber", "l_quantity")
        .orderBy("l_orderkey", "l_linenumber")),

    // §2.9 mapper as pure expressions: image pick, casts, json field, split
    "q13_cdc_mapper" -> ((s, d) =>
      events(s, d).select(
          col("event_id"),
          col("user_id"),
          col("ts").cast("date").as("event_date"),
          upper(col("event_type")).as("op"),
          get_json_object(col("props"), "$.k").cast("int").as("prop_k"),
          round(col("value"), 2).as("val"))
        .orderBy("event_id")),

    // §2.9 CDC apply, last-event-wins: latest event per key decides the row
    "q14_cdc_apply_last" -> ((s, d) => {
      val w = Window.partitionBy(col("user_id"))
        .orderBy(col("ts").desc, col("event_id").desc)
      events(s, d)
        .withColumn("rn", row_number().over(w))
        .filter(col("rn") === 1 && col("event_type") =!= "error")
        .select(col("user_id"), col("event_id").as("last_event_id"),
          col("event_type").as("last_event_type"))
        .orderBy("user_id")
    }),

    // §3.2 domain-definition SQL shape: multi-join + string concat label
    "q15_domain_sql" -> ((s, d) =>
      t(s, d, "customer")
        .join(broadcast(t(s, d, "nation")),
          col("c_nationkey") === col("n_nationkey"))
        .join(broadcast(t(s, d, "region")),
          col("n_regionkey") === col("r_regionkey"))
        .select(col("c_custkey"),
          concat(col("c_name"), lit(" ["), col("n_name"), lit("]"))
            .as("customer_label"),
          col("r_name").as("region"))
        .orderBy("c_custkey")),

    // §2.7 window frame: running revenue per customer
    "q16_window_running" -> ((s, d) => {
      val w = Window.partitionBy(col("o_custkey"))
        .orderBy(col("o_orderdate").asc, col("o_orderkey").asc)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      t(s, d, "orders")
        .withColumn("running_spend", round(sum(col("o_totalprice")).over(w), 2))
        .select("o_custkey", "o_orderkey", "o_orderdate", "running_spend")
        .orderBy("o_custkey", "o_orderdate", "o_orderkey")
    }),

    // §2.6 grouped agg + having (exact-dedup shape)
    "q20_groupby_having" -> ((s, d) =>
      t(s, d, "orders").groupBy(col("o_custkey"))
        .agg(count(lit(1)).as("n_orders"),
          round(sum(col("o_totalprice")), 2).as("spend"))
        .filter(col("n_orders") >= 12)
        .orderBy("o_custkey")))

  private val coreSql: Map[String, String] = Map(
    "q01_scan_project" ->
      "SELECT r_regionkey, r_name FROM region ORDER BY r_regionkey",
    "q02_filter_isin" ->
      """SELECT l_orderkey, l_linenumber, l_returnflag, l_quantity FROM lineitem
         WHERE l_returnflag = 'A' AND l_linestatus IN ('F','O') AND l_quantity > 25
         ORDER BY l_orderkey, l_linenumber""",
    "q03_filter_expr" ->
      """SELECT o_orderkey, o_totalprice, o_orderstatus FROM orders
         WHERE o_totalprice > 200000 AND o_orderstatus = 'O' ORDER BY o_orderkey""",
    "q04_join_inner" ->
      """SELECT o_orderkey, o_totalprice, c_name, c_mktsegment
         FROM orders JOIN customer ON o_custkey = c_custkey
         WHERE c_mktsegment = 'BUILDING' ORDER BY o_orderkey""",
    "q05_join_semi" ->
      """SELECT c_custkey, c_name, c_acctbal FROM customer
         WHERE EXISTS (SELECT 1 FROM orders
                       WHERE o_custkey = c_custkey AND o_totalprice > 300000)
         ORDER BY c_custkey""",
    "q06_join_anti" ->
      """SELECT c_custkey, c_name FROM customer
         WHERE NOT EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey)
         ORDER BY c_custkey""",
    "q07_union_by_name" ->
      """SELECT o_orderkey, o_totalprice, CAST(NULL AS VARCHAR) AS o_orderpriority
         FROM orders WHERE o_orderstatus = 'F'
         UNION ALL
         SELECT o_orderkey, CAST(NULL AS DOUBLE), o_orderpriority
         FROM orders WHERE o_orderstatus = 'O'
         ORDER BY o_orderkey""",
    "q08_distinct" ->
      """SELECT DISTINCT c_nationkey, c_mktsegment FROM customer
         ORDER BY c_nationkey, c_mktsegment""",
    "q09_window_argmin" ->
      """WITH ev AS (SELECT * REPLACE (CAST(ts AS TIMESTAMP) AS ts) FROM events)
         SELECT user_id, event_id, event_type, ts FROM (
           SELECT *, ROW_NUMBER() OVER (PARTITION BY user_id
                     ORDER BY ts ASC, event_id ASC) AS rn FROM ev) x
         WHERE rn = 1 ORDER BY user_id""",
    "q11_sort_limit" ->
      """SELECT o_orderkey, o_totalprice, o_orderpriority FROM orders
         ORDER BY o_totalprice DESC, o_orderkey ASC LIMIT 10""",
    "q12_sample" ->
      """SELECT l_orderkey, l_linenumber, l_quantity FROM lineitem
         WHERE l_orderkey % 97 = 0 ORDER BY l_orderkey, l_linenumber""",
    "q13_cdc_mapper" ->
      """SELECT event_id, user_id, CAST(ts AS DATE) AS event_date,
                upper(event_type) AS op,
                CAST(json_extract_string(props, '$.k') AS INTEGER) AS prop_k,
                round(value, 2) AS val
         FROM events ORDER BY event_id""",
    "q14_cdc_apply_last" ->
      """SELECT user_id, event_id AS last_event_id, event_type AS last_event_type
         FROM (SELECT *, ROW_NUMBER() OVER (PARTITION BY user_id
                         ORDER BY ts DESC, event_id DESC) AS rn FROM events) x
         WHERE rn = 1 AND event_type <> 'error' ORDER BY user_id""",
    "q15_domain_sql" ->
      """SELECT c_custkey, c_name || ' [' || n_name || ']' AS customer_label,
                r_name AS region
         FROM customer JOIN nation ON c_nationkey = n_nationkey
                       JOIN region ON n_regionkey = r_regionkey
         ORDER BY c_custkey""",
    "q16_window_running" ->
      """SELECT o_custkey, o_orderkey, o_orderdate,
                round(sum(o_totalprice) OVER (PARTITION BY o_custkey
                      ORDER BY o_orderdate ASC, o_orderkey ASC
                      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW), 2)
                  AS running_spend
         FROM orders ORDER BY o_custkey, o_orderdate, o_orderkey""",
    "q20_groupby_having" ->
      """SELECT o_custkey, count(*) AS n_orders, round(sum(o_totalprice), 2) AS spend
         FROM orders GROUP BY o_custkey HAVING count(*) >= 12 ORDER BY o_custkey""")

  // ------------------------------------------------------------- headline

  private def revenue: Column = col("l_extendedprice") * (lit(1) - col("l_discount"))

  private val headline: Map[String, (SparkSession, String) => DataFrame] = Map(
    // TPC-H Q1 shape — the canonical wide aggregation
    "q10_tpch_q1" -> ((s, d) =>
      t(s, d, "lineitem")
        .filter(col("l_shipdate") <= to_timestamp(lit("1998-09-01 00:00:00")))
        .groupBy(col("l_returnflag"), col("l_linestatus"))
        .agg(
          round(sum(col("l_quantity")), 2).as("sum_qty"),
          round(sum(col("l_extendedprice")), 2).as("sum_base_price"),
          round(sum(revenue), 2).as("sum_disc_price"),
          round(avg(col("l_quantity")), 2).as("avg_qty"),
          round(avg(col("l_discount")), 4).as("avg_disc"),
          count(lit(1)).as("count_order"))
        .orderBy("l_returnflag", "l_linestatus")),

    // TPC-H Q6 shape — pure pushdown filter + scalar aggregate
    "q17_tpch_q6" -> ((s, d) =>
      t(s, d, "lineitem")
        .filter(col("l_shipdate") >= to_timestamp(lit("1996-01-01 00:00:00")) &&
          col("l_shipdate") < to_timestamp(lit("1997-01-01 00:00:00")) &&
          col("l_discount").between(0.05, 0.07) && col("l_quantity") < 24)
        .agg(round(sum(col("l_extendedprice") * col("l_discount")), 2)
          .as("revenue"))),

    // TPC-H Q3 shape — segment top-k unshipped revenue
    "q18_tpch_q3ish" -> ((s, d) =>
      t(s, d, "customer").filter(col("c_mktsegment") === "BUILDING")
        .join(t(s, d, "orders"), col("c_custkey") === col("o_custkey"))
        .filter(col("o_orderdate") < to_timestamp(lit("1998-01-01 00:00:00")))
        .join(t(s, d, "lineitem"), col("o_orderkey") === col("l_orderkey"))
        .filter(col("l_shipdate") > to_timestamp(lit("1998-01-01 00:00:00")))
        .groupBy(col("o_orderkey"), col("o_orderdate"))
        .agg(round(sum(revenue), 2).as("rev"))
        .orderBy(col("rev").desc, col("o_orderkey").asc)
        .limit(10)),

    // TPC-H Q5 shape — 6-table star join, revenue per nation
    "q19_tpch_q5ish" -> ((s, d) =>
      t(s, d, "lineitem")
        .join(t(s, d, "orders"), col("l_orderkey") === col("o_orderkey"))
        .join(t(s, d, "customer"), col("o_custkey") === col("c_custkey"))
        .join(broadcast(t(s, d, "supplier")),
          col("l_suppkey") === col("s_suppkey") &&
            col("c_nationkey") === col("s_nationkey"))
        .join(broadcast(t(s, d, "nation")), col("s_nationkey") === col("n_nationkey"))
        .join(broadcast(t(s, d, "region")), col("n_regionkey") === col("r_regionkey"))
        .filter(col("r_name").isin("ASIA", "EUROPE"))
        .groupBy(col("n_name"))
        .agg(round(sum(revenue), 2).as("revenue"))
        .orderBy(col("revenue").desc, col("n_name").asc)))

  private val headlineSql: Map[String, String] = Map(
    "q10_tpch_q1" ->
      """SELECT l_returnflag, l_linestatus,
                round(sum(l_quantity), 2) AS sum_qty,
                round(sum(l_extendedprice), 2) AS sum_base_price,
                round(sum(l_extendedprice * (1 - l_discount)), 2) AS sum_disc_price,
                round(avg(l_quantity), 2) AS avg_qty,
                round(avg(l_discount), 4) AS avg_disc,
                count(*) AS count_order
         FROM lineitem WHERE l_shipdate <= TIMESTAMP '1998-09-01 00:00:00'
         GROUP BY l_returnflag, l_linestatus ORDER BY l_returnflag, l_linestatus""",
    "q17_tpch_q6" ->
      """SELECT round(sum(l_extendedprice * l_discount), 2) AS revenue
         FROM lineitem
         WHERE l_shipdate >= TIMESTAMP '1996-01-01 00:00:00'
           AND l_shipdate < TIMESTAMP '1997-01-01 00:00:00'
           AND l_discount BETWEEN 0.05 AND 0.07 AND l_quantity < 24""",
    "q18_tpch_q3ish" ->
      """SELECT o_orderkey, o_orderdate,
                round(sum(l_extendedprice * (1 - l_discount)), 2) AS rev
         FROM customer JOIN orders ON c_custkey = o_custkey
                       JOIN lineitem ON o_orderkey = l_orderkey
         WHERE c_mktsegment = 'BUILDING'
           AND o_orderdate < TIMESTAMP '1998-01-01 00:00:00'
           AND l_shipdate > TIMESTAMP '1998-01-01 00:00:00'
         GROUP BY o_orderkey, o_orderdate
         ORDER BY rev DESC, o_orderkey ASC LIMIT 10""",
    "q19_tpch_q5ish" ->
      """SELECT n_name, round(sum(l_extendedprice * (1 - l_discount)), 2) AS revenue
         FROM lineitem JOIN orders ON l_orderkey = o_orderkey
                       JOIN customer ON o_custkey = c_custkey
                       JOIN supplier ON l_suppkey = s_suppkey
                                    AND c_nationkey = s_nationkey
                       JOIN nation ON s_nationkey = n_nationkey
                       JOIN region ON n_regionkey = r_regionkey
         WHERE r_name IN ('ASIA', 'EUROPE')
         GROUP BY n_name ORDER BY revenue DESC, n_name ASC""")

  // -------------------------------------------------------------- public

  def queries: Map[String, (SparkSession, String) => DataFrame] =
    core ++ headline

  def oracleSql: Map[String, String] =
    (coreSql ++ headlineSql).map { case (k, v) =>
      k -> v.replaceAll("\\s+", " ").trim
    }
}
