package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window

/** Core relational operator coverage (SURVEY.md §2.2–§2.6) expressed over the
  * driver corpus, each with a DuckDB oracle. Every query ends in a total
  * deterministic ORDER BY mirrored in the oracle so row order and hashes
  * line up engine-to-engine.
  */
object Relational {
  import Tables._

  /** name -> (spark query, duckdb oracle sql). */
  val defs: Map[String, ((SparkSession, String) => DataFrame, String)] = Map(

    // A1/A2: hash aggregate — TPC-H Q1 shape (pricing summary).
    "q01_pricing_summary" -> ((
      (s: SparkSession, d: String) =>
        t(s, d, "lineitem")
          .filter(col("l_shipdate") <= lit("1998-09-02").cast("date"))
          .groupBy("l_returnflag", "l_linestatus")
          .agg(
            sum(col("l_quantity")).as("sum_qty"),
            sumMoney(col("l_extendedprice")).as("sum_base_price"),
            sum(dec2(col("l_extendedprice")) * (dec2(lit(1)) - dec2(col("l_discount")))).cast("double").as("sum_disc_price"),
            avgMoney(col("l_extendedprice")).as("avg_price"),
            count(lit(1)).as("count_order"))
          .orderBy("l_returnflag", "l_linestatus"),
      """SELECT l_returnflag, l_linestatus,
        |  SUM(l_quantity) AS sum_qty,
        |  CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) AS sum_base_price,
        |  CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2)) * (CAST(1 AS DECIMAL(18,2)) - CAST(l_discount AS DECIMAL(18,2)))) AS DOUBLE) AS sum_disc_price,
        |  CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) / COUNT(l_extendedprice) AS avg_price,
        |  COUNT(*) AS count_order
        |FROM lineitem WHERE l_shipdate <= DATE '1998-09-02'
        |GROUP BY l_returnflag, l_linestatus
        |ORDER BY l_returnflag, l_linestatus""".stripMargin)),

    // P5/P2: filter + narrow projection, predicate pushdown — TPC-H Q6 shape.
    "q02_filter_revenue" -> ((
      (s: SparkSession, d: String) =>
        t(s, d, "lineitem")
          .filter(col("l_shipdate") >= lit("1997-01-01").cast("date") &&
            col("l_shipdate") < lit("1998-01-01").cast("date") &&
            col("l_discount").between(0.05, 0.07) && col("l_quantity") < 24)
          .agg(
            sum(dec2(col("l_extendedprice")) * dec2(col("l_discount"))).cast("double").as("revenue"),
            count(lit(1)).as("n_rows")),
      """SELECT
        |  CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2)) * CAST(l_discount AS DECIMAL(18,2))) AS DOUBLE) AS revenue,
        |  COUNT(*) AS n_rows
        |FROM lineitem
        |WHERE l_shipdate >= DATE '1997-01-01' AND l_shipdate < DATE '1998-01-01'
        |  AND l_discount BETWEEN 0.05 AND 0.07 AND l_quantity < 24""".stripMargin)),

    // J + A: fact-fact equi-join then aggregate.
    "q03_join_agg" -> ((
      (s: SparkSession, d: String) =>
        t(s, d, "lineitem")
          .join(t(s, d, "orders"), col("l_orderkey") === col("o_orderkey"))
          .groupBy("o_orderpriority")
          .agg(
            countDistinct(col("o_orderkey")).as("n_orders"),
            sum(dec2(col("l_extendedprice")) * (dec2(lit(1)) - dec2(col("l_discount")))).cast("double").as("revenue"))
          .orderBy("o_orderpriority"),
      """SELECT o_orderpriority,
        |  COUNT(DISTINCT o_orderkey) AS n_orders,
        |  CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2)) * (CAST(1 AS DECIMAL(18,2)) - CAST(l_discount AS DECIMAL(18,2)))) AS DOUBLE) AS revenue
        |FROM lineitem JOIN orders ON l_orderkey = o_orderkey
        |GROUP BY o_orderpriority ORDER BY o_orderpriority""".stripMargin)),

    // Broadcast dimension chain: customer ⋈ nation ⋈ region.
    "q04_dim_join" -> ((
      (s: SparkSession, d: String) =>
        t(s, d, "customer")
          .join(broadcast(t(s, d, "nation")), col("c_nationkey") === col("n_nationkey"))
          .join(broadcast(t(s, d, "region")), col("n_regionkey") === col("r_regionkey"))
          .groupBy("r_name")
          .agg(count(lit(1)).as("n_customers"), avgMoney(col("c_acctbal")).as("avg_acctbal"))
          .orderBy("r_name"),
      """SELECT r_name, COUNT(*) AS n_customers,
        |  CAST(SUM(CAST(c_acctbal AS DECIMAL(18,2))) AS DOUBLE) / COUNT(c_acctbal) AS avg_acctbal
        |FROM customer JOIN nation ON c_nationkey = n_nationkey
        |  JOIN region ON n_regionkey = r_regionkey
        |GROUP BY r_name ORDER BY r_name""".stripMargin)),

    // A4 as a query: latest event per user via window row_number (dedup-to-latest).
    "q05_latest_per_user" -> ((
      (s: SparkSession, d: String) => {
        val w = Window.partitionBy("user_id").orderBy(col("ts_us").desc, col("event_id").desc)
        events(s, d)
          .withColumn("rn", row_number().over(w))
          .filter(col("rn") === 1)
          .select("user_id", "event_id", "event_type", "ts_us")
          .orderBy("user_id")
      },
      """SELECT user_id, event_id, event_type, epoch_ns(ts)//1000 AS ts_us
        |FROM (SELECT *, ROW_NUMBER() OVER (PARTITION BY user_id ORDER BY ts DESC, event_id DESC) AS rn FROM events)
        |WHERE rn = 1 ORDER BY user_id""".stripMargin)),

    // J1 verbatim shape: groupwise-max self-join (README.md:1217-1221 pattern).
    "q06_groupwise_max" -> ((
      (s: SparkSession, d: String) => {
        val ev = events(s, d)
        val mx = ev.groupBy(col("user_id").as("m_user_id")).agg(max(col("ts_us")).as("max_ts"))
        ev.join(mx, col("user_id") === col("m_user_id") && col("ts_us") === col("max_ts"))
          .select(col("user_id"), col("ts_us"), col("event_id"), col("value"))
          .orderBy("user_id", "event_id")
      },
      """SELECT e.user_id AS user_id, epoch_ns(e.ts)//1000 AS ts_us, e.event_id AS event_id, e.value AS value
        |FROM events e INNER JOIN
        |  (SELECT user_id, MAX(ts) AS max_ts FROM events GROUP BY user_id) cm
        |  ON e.user_id = cm.user_id AND e.ts = cm.max_ts
        |ORDER BY user_id, event_id""".stripMargin)),

    // Anti join: customers without orders.
    "q07_anti_join" -> ((
      (s: SparkSession, d: String) =>
        t(s, d, "customer")
          .join(t(s, d, "orders"), col("c_custkey") === col("o_custkey"), "left_anti")
          .select("c_custkey", "c_name", "c_mktsegment")
          .orderBy("c_custkey"),
      """SELECT c_custkey, c_name, c_mktsegment FROM customer
        |WHERE NOT EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey)
        |ORDER BY c_custkey""".stripMargin)),

    // Semi join: customers having a high-value order.
    "q08_semi_join" -> ((
      (s: SparkSession, d: String) =>
        t(s, d, "customer")
          .join(t(s, d, "orders").filter(col("o_totalprice") > 300000.0),
            col("c_custkey") === col("o_custkey"), "left_semi")
          .select("c_custkey", "c_mktsegment")
          .orderBy("c_custkey"),
      """SELECT c_custkey, c_mktsegment FROM customer
        |WHERE EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey AND o_totalprice > 300000.0)
        |ORDER BY c_custkey""".stripMargin)),

    // Set ops: INTERSECT / EXCEPT, tagged and unioned.
    "q09_set_ops" -> ((
      (s: SparkSession, d: String) => {
        val o = t(s, d, "orders")
        val fin = o.filter(col("o_orderstatus") === "F").select("o_custkey").distinct()
        val big = o.filter(col("o_totalprice") > 250000.0).select("o_custkey").distinct()
        fin.intersect(big).withColumn("tag", lit("both"))
          .unionByName(fin.except(big).withColumn("tag", lit("only_f")))
          .orderBy("tag", "o_custkey")
      },
      """WITH fin AS (SELECT DISTINCT o_custkey FROM orders WHERE o_orderstatus = 'F'),
        |     big AS (SELECT DISTINCT o_custkey FROM orders WHERE o_totalprice > 250000.0)
        |SELECT o_custkey, 'both' AS tag FROM (SELECT * FROM fin INTERSECT SELECT * FROM big)
        |UNION ALL
        |SELECT o_custkey, 'only_f' AS tag FROM (SELECT * FROM fin EXCEPT SELECT * FROM big)
        |ORDER BY tag, o_custkey""".stripMargin)),

    // Sort + limit with total tiebreak (top-N).
    "q10_topn" -> ((
      (s: SparkSession, d: String) =>
        t(s, d, "orders")
          .orderBy(col("o_totalprice").desc, col("o_orderkey").asc)
          .select("o_orderkey", "o_custkey", "o_totalprice")
          .limit(25),
      """SELECT o_orderkey, o_custkey, o_totalprice FROM orders
        |ORDER BY o_totalprice DESC, o_orderkey ASC LIMIT 25""".stripMargin)),

    // ROLLUP multi-level aggregate (SQL entry point, S4-style).
    "q11_rollup" -> ((
      (s: SparkSession, d: String) => {
        t(s, d, "supplier").createOrReplaceTempView("g_supplier")
        t(s, d, "nation").createOrReplaceTempView("g_nation")
        t(s, d, "region").createOrReplaceTempView("g_region")
        s.sql(
          """SELECT r_name, n_name, COUNT(*) AS n_suppliers,
            |  CAST(SUM(CAST(s_acctbal AS DECIMAL(18,2))) AS DOUBLE) AS sum_acctbal
            |FROM g_supplier JOIN g_nation ON s_nationkey = n_nationkey
            |  JOIN g_region ON n_regionkey = r_regionkey
            |GROUP BY ROLLUP (r_name, n_name)
            |ORDER BY r_name ASC NULLS FIRST, n_name ASC NULLS FIRST""".stripMargin)
      },
      """SELECT r_name, n_name, COUNT(*) AS n_suppliers,
        |  CAST(SUM(CAST(s_acctbal AS DECIMAL(18,2))) AS DOUBLE) AS sum_acctbal
        |FROM supplier JOIN nation ON s_nationkey = n_nationkey
        |  JOIN region ON n_regionkey = r_regionkey
        |GROUP BY ROLLUP (r_name, n_name)
        |ORDER BY r_name ASC NULLS FIRST, n_name ASC NULLS FIRST""".stripMargin)),

    // Scalar functions: string + date kitchen-sink over part/orders.
    "q12_scalar_funcs" -> ((
      (s: SparkSession, d: String) =>
        t(s, d, "part")
          .select(
            col("p_partkey"),
            upper(col("p_name")).as("uname"),
            length(col("p_name")).as("name_len"),
            substring(col("p_type"), 1, 5).as("type5"),
            regexp_replace(col("p_brand"), "[0-9]", "#").as("brand_masked"),
            (col("p_retailprice") * 2).cast("double").as("dbl_price"))
          .filter(col("p_size") >= 25)
          .orderBy("p_partkey"),
      """SELECT p_partkey, UPPER(p_name) AS uname, LENGTH(p_name) AS name_len,
        |  SUBSTRING(p_type, 1, 5) AS type5,
        |  REGEXP_REPLACE(p_brand, '[0-9]', '#', 'g') AS brand_masked,
        |  p_retailprice * 2 AS dbl_price
        |FROM part WHERE p_size >= 25 ORDER BY p_partkey""".stripMargin)),

    // CASE WHEN bucketing + date parts.
    "q13_case_date" -> ((
      (s: SparkSession, d: String) =>
        t(s, d, "orders")
          .select(
            year(col("o_orderdate")).as("yr"),
            when(col("o_totalprice") < 100000.0, "small")
              .when(col("o_totalprice") < 250000.0, "medium")
              .otherwise("large").as("band"))
          .groupBy("yr", "band").agg(count(lit(1)).as("n"))
          .orderBy("yr", "band"),
      """SELECT CAST(YEAR(o_orderdate) AS BIGINT) AS yr,
        |  CASE WHEN o_totalprice < 100000.0 THEN 'small'
        |       WHEN o_totalprice < 250000.0 THEN 'medium' ELSE 'large' END AS band,
        |  COUNT(*) AS n
        |FROM orders GROUP BY 1, 2 ORDER BY yr, band""".stripMargin)),

    // Distinct aggregates.
    "q14_distinct_agg" -> ((
      (s: SparkSession, d: String) =>
        t(s, d, "lineitem")
          .groupBy("l_returnflag")
          .agg(
            countDistinct(col("l_suppkey")).as("n_supp"),
            countDistinct(col("l_partkey")).as("n_part"),
            count(lit(1)).as("n_rows"))
          .orderBy("l_returnflag"),
      """SELECT l_returnflag, COUNT(DISTINCT l_suppkey) AS n_supp,
        |  COUNT(DISTINCT l_partkey) AS n_part, COUNT(*) AS n_rows
        |FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag""".stripMargin)),

    // Correlated-scalar-subquery shape: parts priced above their brand average.
    "q15_above_brand_avg" -> ((
      (s: SparkSession, d: String) => {
        val p = t(s, d, "part")
        val avgB = p.groupBy(col("p_brand").as("b_brand"))
          .agg(avgMoney(col("p_retailprice")).as("brand_avg"))
        p.join(broadcast(avgB), col("p_brand") === col("b_brand"))
          .filter(col("p_retailprice") > col("brand_avg"))
          .select("p_partkey", "p_brand", "p_retailprice")
          .orderBy("p_partkey")
      },
      """SELECT p_partkey, p_brand, p_retailprice
        |FROM part p JOIN (
        |  SELECT p_brand AS b_brand,
        |    CAST(SUM(CAST(p_retailprice AS DECIMAL(18,2))) AS DOUBLE) / COUNT(p_retailprice) AS brand_avg
        |  FROM part GROUP BY p_brand) b ON p.p_brand = b.b_brand
        |WHERE p_retailprice > brand_avg ORDER BY p_partkey""".stripMargin)),

    // Window aggregates beyond row_number: rank + running sum per user.
    "q16_window_running" -> ((
      (s: SparkSession, d: String) => {
        val byUser = Window.partitionBy("user_id").orderBy(col("ts_us").asc, col("event_id").asc)
        events(s, d)
          .filter(col("event_type") === "purchase")
          .select(
            col("user_id"), col("event_id"),
            rank().over(Window.partitionBy("user_id").orderBy(col("value").desc, col("event_id").asc)).as("value_rank"),
            sum(dec2(col("value"))).over(byUser.rowsBetween(Window.unboundedPreceding, Window.currentRow))
              .cast("double").as("running_value"))
          .orderBy("user_id", "event_id")
      },
      """SELECT user_id, event_id,
        |  RANK() OVER (PARTITION BY user_id ORDER BY value DESC, event_id ASC) AS value_rank,
        |  CAST(SUM(CAST(value AS DECIMAL(18,2))) OVER (PARTITION BY user_id ORDER BY ts ASC, event_id ASC ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS DOUBLE) AS running_value
        |FROM events WHERE event_type = 'purchase'
        |ORDER BY user_id, event_id""".stripMargin)),

    // Left outer join with COALESCE over the null side.
    "q44_outer_join" -> ((
      (s: SparkSession, d: String) => {
        val counts = t(s, d, "orders")
          .groupBy(col("o_custkey")).agg(count(lit(1)).as("cnt"), sumMoney(col("o_totalprice")).as("spend"))
        t(s, d, "customer")
          .join(counts, col("c_custkey") === col("o_custkey"), "left")
          .select(col("c_custkey"),
            coalesce(col("cnt"), lit(0L)).as("n_orders"),
            coalesce(col("spend"), lit(0.0d)).as("total_spend"))
          .orderBy("c_custkey")
      },
      """SELECT c_custkey,
        |  COALESCE(cnt, 0) AS n_orders, COALESCE(spend, 0.0) AS total_spend
        |FROM customer LEFT JOIN (
        |  SELECT o_custkey, COUNT(*) AS cnt,
        |    CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS spend
        |  FROM orders GROUP BY o_custkey) o ON c_custkey = o_custkey
        |ORDER BY c_custkey""".stripMargin)),

    // lag/lead: inter-event gap per user (sessionization building block).
    "q45_lag_lead" -> ((
      (s: SparkSession, d: String) => {
        val w = Window.partitionBy("user_id").orderBy(col("ts_us").asc, col("event_id").asc)
        events(s, d)
          .select(col("user_id"), col("event_id"),
            (col("ts_us") - lag(col("ts_us"), 1).over(w)).as("gap_us"),
            lead(col("event_type"), 1).over(w).as("next_type"))
          .orderBy("user_id", "event_id")
      },
      """SELECT user_id, event_id,
        |  epoch_ns(ts)//1000 - LAG(epoch_ns(ts)//1000, 1) OVER w AS gap_us,
        |  LEAD(event_type, 1) OVER w AS next_type
        |FROM events
        |WINDOW w AS (PARTITION BY user_id ORDER BY ts ASC, event_id ASC)
        |ORDER BY user_id, event_id""".stripMargin)),

    // Sessionization (islands): new session when the gap to the previous
    // event exceeds 30 minutes; one row per session with bounds and counts.
    "q47_sessionize" -> ((
      (s: SparkSession, d: String) => {
        val w = Window.partitionBy("user_id").orderBy(col("ts_us").asc, col("event_id").asc)
        events(s, d)
          .withColumn("gap", col("ts_us") - lag(col("ts_us"), 1).over(w))
          .withColumn("new_sess",
            when(col("gap").isNull || col("gap") > 30L * 60 * 1000000, 1).otherwise(0))
          .withColumn("sess_id", sum(col("new_sess")).over(
            w.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
          .groupBy("user_id", "sess_id")
          .agg(min(col("ts_us")).as("sess_start"), max(col("ts_us")).as("sess_end"),
            count(lit(1)).as("n_events"))
          .orderBy("user_id", "sess_id")
      },
      """WITH g AS (
        |  SELECT user_id, event_id, epoch_ns(ts)//1000 AS ts_us,
        |    epoch_ns(ts)//1000 - LAG(epoch_ns(ts)//1000, 1)
        |      OVER (PARTITION BY user_id ORDER BY ts ASC, event_id ASC) AS gap
        |  FROM events),
        |m AS (
        |  SELECT *, CAST(SUM(CASE WHEN gap IS NULL OR gap > 30*60*1000000 THEN 1 ELSE 0 END)
        |    OVER (PARTITION BY user_id ORDER BY ts_us ASC, event_id ASC
        |          ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS sess_id
        |  FROM g)
        |SELECT user_id, sess_id, MIN(ts_us) AS sess_start, MAX(ts_us) AS sess_end,
        |  COUNT(*) AS n_events
        |FROM m GROUP BY user_id, sess_id ORDER BY user_id, sess_id""".stripMargin)),

    // 6-way star join (TPC-H Q5 shape): revenue by nation for one region.
    "q48_star_join" -> ((
      (s: SparkSession, d: String) =>
        t(s, d, "customer")
          .join(t(s, d, "orders"), col("c_custkey") === col("o_custkey"))
          .join(t(s, d, "lineitem"), col("o_orderkey") === col("l_orderkey"))
          .join(t(s, d, "supplier"), col("l_suppkey") === col("s_suppkey") &&
            col("c_nationkey") === col("s_nationkey"))
          .join(broadcast(t(s, d, "nation")), col("s_nationkey") === col("n_nationkey"))
          .join(broadcast(t(s, d, "region")), col("n_regionkey") === col("r_regionkey"))
          .filter(col("r_name").isin("ASIA", "EUROPE"))
          .groupBy("r_name", "n_name")
          .agg(sum(dec2(col("l_extendedprice")) * (dec2(lit(1)) - dec2(col("l_discount"))))
            .cast("double").as("revenue"),
            count(lit(1)).as("n_items"))
          .orderBy("r_name", "n_name"),
      """SELECT r_name, n_name,
        |  CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2)) * (CAST(1 AS DECIMAL(18,2)) - CAST(l_discount AS DECIMAL(18,2)))) AS DOUBLE) AS revenue,
        |  COUNT(*) AS n_items
        |FROM customer
        |JOIN orders ON c_custkey = o_custkey
        |JOIN lineitem ON o_orderkey = l_orderkey
        |JOIN supplier ON l_suppkey = s_suppkey AND c_nationkey = s_nationkey
        |JOIN nation ON s_nationkey = n_nationkey
        |JOIN region ON n_regionkey = r_regionkey
        |WHERE r_name IN ('ASIA', 'EUROPE')
        |GROUP BY r_name, n_name ORDER BY r_name, n_name""".stripMargin)),

    // CUBE over two dimensions.
    "q49_cube" -> ((
      (s: SparkSession, d: String) => {
        t(s, d, "orders").createOrReplaceTempView("g_orders")
        s.sql(
          """SELECT o_orderstatus, o_orderpriority, COUNT(*) AS n,
            |  CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS volume
            |FROM g_orders
            |GROUP BY CUBE (o_orderstatus, o_orderpriority)
            |ORDER BY o_orderstatus ASC NULLS FIRST, o_orderpriority ASC NULLS FIRST""".stripMargin)
      },
      """SELECT o_orderstatus, o_orderpriority, COUNT(*) AS n,
        |  CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS volume
        |FROM orders
        |GROUP BY CUBE (o_orderstatus, o_orderpriority)
        |ORDER BY o_orderstatus ASC NULLS FIRST, o_orderpriority ASC NULLS FIRST""".stripMargin)),

    // Exact percentiles (linear interpolation — same arithmetic both engines).
    "q50_percentile" -> ((
      (s: SparkSession, d: String) =>
        t(s, d, "orders")
          .groupBy("o_orderstatus")
          .agg(
            percentile(col("o_totalprice"), lit(0.5)).as("median"),
            percentile(col("o_totalprice"), lit(0.25)).as("p25"),
            percentile(col("o_totalprice"), lit(0.75)).as("p75"))
          .orderBy("o_orderstatus"),
      """SELECT o_orderstatus,
        |  quantile_cont(o_totalprice, 0.5) AS median,
        |  quantile_cont(o_totalprice, 0.25) AS p25,
        |  quantile_cont(o_totalprice, 0.75) AS p75
        |FROM orders GROUP BY o_orderstatus ORDER BY o_orderstatus""".stripMargin)),

    // Ordered string aggregation (deterministic listagg).
    "q51_string_agg" -> ((
      (s: SparkSession, d: String) =>
        t(s, d, "orders")
          .filter(col("o_orderkey") < 100)
          .groupBy("o_orderstatus")
          .agg(array_join(array_sort(collect_list(col("o_orderkey"))), ",").as("keys"))
          .orderBy("o_orderstatus"),
      """SELECT o_orderstatus,
        |  string_agg(CAST(o_orderkey AS VARCHAR), ',' ORDER BY o_orderkey) AS keys
        |FROM orders WHERE o_orderkey < 100
        |GROUP BY o_orderstatus ORDER BY o_orderstatus""".stripMargin)),

    // Correlated aggregate (TPC-H Q17 shape): lineitems below 20% of their
    // part's average quantity.
    "q55_below_part_avg" -> ((
      (s: SparkSession, d: String) => {
        val li = t(s, d, "lineitem")
        val avgQ = li.groupBy(col("l_partkey").as("a_partkey"))
          .agg((sum(col("l_quantity")).cast("double") / count(col("l_quantity"))).as("avg_qty"))
        li.join(avgQ, col("l_partkey") === col("a_partkey"))
          .filter(col("l_quantity") < col("avg_qty") * 0.2)
          .agg(sumMoney(col("l_extendedprice")).as("total_price"), count(lit(1)).as("n"))
      },
      """SELECT
        |  CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) AS total_price,
        |  COUNT(*) AS n
        |FROM lineitem l JOIN (
        |  SELECT l_partkey AS a_partkey,
        |    CAST(SUM(l_quantity) AS DOUBLE) / COUNT(l_quantity) AS avg_qty
        |  FROM lineitem GROUP BY l_partkey) a ON l.l_partkey = a.a_partkey
        |WHERE l_quantity < avg_qty * 0.2""".stripMargin)),

    // SQL entry point (S4): the Q1 shape verbatim through spark.sql over a
    // registered view — parser/analyzer path, same oracle as q01.
    "q56_sql_entry" -> ((
      (s: SparkSession, d: String) => {
        t(s, d, "lineitem").createOrReplaceTempView("g_lineitem")
        s.sql(
          """SELECT l_returnflag, l_linestatus,
            |  SUM(l_quantity) AS sum_qty,
            |  CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) AS sum_base_price,
            |  COUNT(*) AS count_order
            |FROM g_lineitem WHERE l_shipdate <= DATE '1998-09-02'
            |GROUP BY l_returnflag, l_linestatus
            |ORDER BY l_returnflag, l_linestatus""".stripMargin)
      },
      """SELECT l_returnflag, l_linestatus,
        |  SUM(l_quantity) AS sum_qty,
        |  CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) AS sum_base_price,
        |  COUNT(*) AS count_order
        |FROM lineitem WHERE l_shipdate <= DATE '1998-09-02'
        |GROUP BY l_returnflag, l_linestatus
        |ORDER BY l_returnflag, l_linestatus""".stripMargin)),

    // date_trunc monthly rollup of order volume.
    "q46_monthly" -> ((
      (s: SparkSession, d: String) =>
        t(s, d, "orders")
          .groupBy(unix_timestamp(date_trunc("month", col("o_orderdate"))).as("month_epoch"))
          .agg(count(lit(1)).as("n"), sumMoney(col("o_totalprice")).as("volume"))
          .orderBy("month_epoch"),
      """SELECT CAST(epoch(date_trunc('month', o_orderdate)) AS BIGINT) AS month_epoch,
        |  COUNT(*) AS n,
        |  CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS volume
        |FROM orders GROUP BY 1 ORDER BY month_epoch""".stripMargin))
  )
}
