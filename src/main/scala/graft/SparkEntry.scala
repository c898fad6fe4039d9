package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.operators.Relational

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  *
  * Every implemented operator from SURVEY.md §2 has a `queries` entry;
  * SQL-expressible ones also have an `oracleSql` entry (DuckDB dialect,
  * same parquet tables) for the driver's correctness gate. Column
  * aliases match between the Spark plan and the oracle SQL because the
  * driver sorts columns by name before hashing.
  */
object SparkEntry {

  /** Flagship query on sf=0.001 (driver smoke-checks rows>0): revenue
    * per nation — 3-way join (broadcast dim), grouped agg, sort. */
  def entry(spark: SparkSession): DataFrame = {
    val dir = "/root/testdata/sf0.001"
    val nation = Tables.load(spark, dir, "nation")
    val customer = Tables.load(spark, dir, "customer")
    val orders = Tables.load(spark, dir, "orders")
    val lineitem = Tables.load(spark, dir, "lineitem")
    lineitem
      .join(orders, lineitem("l_orderkey") === orders("o_orderkey"))
      .join(customer, orders("o_custkey") === customer("c_custkey"))
      .join(broadcast(nation), customer("c_nationkey") === nation("n_nationkey"))
      .groupBy(nation("n_name"))
      .agg(round(sum(lineitem("l_extendedprice") * (lit(1.0) - lineitem("l_discount"))), 2)
        .as("revenue"))
      .orderBy(col("revenue").desc, col("n_name").asc)
  }

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // SampleTest golden shapes (SURVEY §5)
    "q1_join_avg" -> (Relational.q1JoinAvg _),
    "q2_filter_sort" -> (Relational.q2FilterSort _),
    "q3_subquery_desc" -> (Relational.q3SubqueryDesc _),
    // ungrouped aggregates (SURVEY §2.4)
    "agg_sum" -> (Relational.aggSum _),
    "agg_avg" -> (Relational.aggAvg _),
    "agg_count" -> (Relational.aggCount _),
    "agg_min" -> (Relational.aggMin _),
    "agg_max" -> (Relational.aggMax _),
    "agg_min_date" -> (Relational.aggMinDate _),
    "agg_max_date" -> (Relational.aggMaxDate _),
    "agg_multi" -> (Relational.aggMulti _),
    // filters / projection (SURVEY §2.2)
    "filter_and" -> (Relational.filterAnd _),
    "filter_or" -> (Relational.filterOr _),
    "filter_ne_string" -> (Relational.filterNeString _),
    "filter_date_range" -> (Relational.filterDateRange _),
    // joins (SURVEY §2.3)
    "join_equi" -> (Relational.joinEqui _),
    "join_theta" -> (Relational.joinTheta _),
    "join_multicond" -> (Relational.joinMultiCond _),
    // sort / limit (SURVEY §2.5)
    "sort_asc" -> (Relational.sortAsc _),
    "sort_desc" -> (Relational.sortDesc _),
    "sort_string" -> (Relational.sortString _),
    "sort_date" -> (Relational.sortDate _),
    "sort_topn" -> (Relational.sortTopN _),
    // beyond-parity relational (SURVEY §2.6)
    "group_agg" -> (Relational.groupAgg _),
    "window_rank" -> (Relational.windowRank _),
    "set_except" -> (Relational.setExcept _),
    "events_window" -> (Relational.eventsWindow _),
  )

  /** DuckDB oracle SQL per query (driver runs these on the same parquet
    * tables at sf=0.01 and hash-compares). */
  def oracleSql: Map[String, String] = Map(
    "q1_join_avg" ->
      """SELECT round(avg(c.c_acctbal), 2) AS avg_acctbal
        |FROM customer c, orders o
        |WHERE c.c_custkey = o.o_custkey AND o.o_totalprice > 150000""".stripMargin,
    "q2_filter_sort" ->
      """SELECT o_orderkey, o_totalprice FROM orders
        |WHERE o_orderdate > TIMESTAMP '1995-01-01 00:00:00'
        |ORDER BY o_totalprice ASC, o_orderkey ASC""".stripMargin,
    "q3_subquery_desc" ->
      """SELECT c.c_name,
        |       (SELECT round(sum(o.o_totalprice), 2) FROM orders o
        |         WHERE o.o_custkey = c.c_custkey) AS total_spent
        |FROM customer c
        |ORDER BY total_spent DESC NULLS LAST, c.c_name ASC""".stripMargin,
    "agg_sum" ->
      "SELECT round(sum(l_extendedprice), 2) AS sum_price FROM lineitem",
    "agg_avg" ->
      "SELECT round(avg(l_quantity), 4) AS avg_qty FROM lineitem",
    "agg_count" ->
      "SELECT count(*) AS cnt FROM lineitem WHERE l_discount > 0.05",
    "agg_min" ->
      "SELECT min(l_extendedprice) AS min_price FROM lineitem",
    "agg_max" ->
      "SELECT max(l_extendedprice) AS max_price FROM lineitem",
    "agg_min_date" ->
      "SELECT min(l_shipdate) AS min_shipdate FROM lineitem",
    "agg_max_date" ->
      "SELECT max(l_shipdate) AS max_shipdate FROM lineitem",
    "agg_multi" ->
      """SELECT round(sum(l_quantity), 2) AS sum_qty,
        |       round(avg(l_quantity), 4) AS avg_qty,
        |       min(l_quantity) AS min_qty,
        |       max(l_quantity) AS max_qty,
        |       count(*) AS cnt
        |FROM lineitem WHERE l_shipdate > TIMESTAMP '1995-06-01 00:00:00'""".stripMargin,
    "filter_and" ->
      """SELECT l_orderkey, l_quantity, l_discount FROM lineitem
        |WHERE l_quantity >= 30 AND l_discount < 0.03
        |ORDER BY l_orderkey, l_quantity, l_discount""".stripMargin,
    "filter_or" ->
      """SELECT l_orderkey, l_returnflag, l_quantity FROM lineitem
        |WHERE l_returnflag = 'R' OR l_quantity > 45
        |ORDER BY l_orderkey, l_returnflag, l_quantity""".stripMargin,
    "filter_ne_string" ->
      """SELECT l_orderkey, l_linestatus FROM lineitem
        |WHERE l_linestatus <> 'F'
        |ORDER BY l_orderkey, l_linestatus""".stripMargin,
    "filter_date_range" ->
      """SELECT o_orderkey, o_orderdate FROM orders
        |WHERE o_orderdate >= TIMESTAMP '1994-01-01 00:00:00'
        |  AND o_orderdate < TIMESTAMP '1995-01-01 00:00:00'
        |ORDER BY o_orderkey, o_orderdate""".stripMargin,
    "join_equi" ->
      """SELECT c.c_custkey, c.c_name, o.o_orderkey, o.o_totalprice
        |FROM customer c JOIN orders o ON c.c_custkey = o.o_custkey
        |WHERE o.o_totalprice > 250000
        |ORDER BY c_custkey, c_name, o_orderkey, o_totalprice""".stripMargin,
    "join_theta" ->
      """SELECT s.s_suppkey, s.s_nationkey, n.n_nationkey
        |FROM supplier s JOIN nation n ON s.s_nationkey < n.n_nationkey
        |ORDER BY s_suppkey, s_nationkey, n_nationkey""".stripMargin,
    "join_multicond" ->
      """SELECT l.l_orderkey, l.l_linenumber, l.l_shipdate, o.o_orderdate
        |FROM lineitem l JOIN orders o
        |  ON l.l_orderkey = o.o_orderkey AND l.l_shipdate > o.o_orderdate
        |WHERE o.o_totalprice > 300000
        |ORDER BY l_orderkey, l_linenumber, l_shipdate, o_orderdate""".stripMargin,
    "sort_asc" ->
      """SELECT l_extendedprice, l_orderkey FROM lineitem
        |ORDER BY l_extendedprice ASC, l_orderkey ASC""".stripMargin,
    "sort_desc" ->
      """SELECT l_extendedprice, l_orderkey FROM lineitem
        |ORDER BY l_extendedprice DESC, l_orderkey DESC""".stripMargin,
    "sort_string" ->
      "SELECT c_name, c_custkey FROM customer ORDER BY c_name ASC, c_custkey ASC",
    "sort_date" ->
      "SELECT o_orderdate, o_orderkey FROM orders ORDER BY o_orderdate ASC, o_orderkey ASC",
    "sort_topn" ->
      """SELECT o_totalprice, o_orderkey FROM orders
        |ORDER BY o_totalprice DESC, o_orderkey ASC LIMIT 100""".stripMargin,
    "group_agg" ->
      """SELECT l_returnflag, l_linestatus,
        |       round(sum(l_quantity), 2) AS sum_qty,
        |       round(sum(l_extendedprice * (1.0 - l_discount)), 2) AS sum_disc_price,
        |       round(avg(l_discount), 4) AS avg_disc,
        |       count(*) AS count_order
        |FROM lineitem
        |WHERE l_shipdate <= TIMESTAMP '1998-09-02 00:00:00'
        |GROUP BY l_returnflag, l_linestatus
        |ORDER BY l_returnflag, l_linestatus""".stripMargin,
    "window_rank" ->
      """SELECT o_custkey, o_orderkey, o_totalprice, rn FROM (
        |  SELECT o_custkey, o_orderkey, o_totalprice,
        |         row_number() OVER (PARTITION BY o_custkey
        |           ORDER BY o_totalprice DESC, o_orderkey ASC) AS rn
        |  FROM orders) t
        |WHERE rn <= 3
        |ORDER BY o_custkey, o_orderkey, o_totalprice, rn""".stripMargin,
    "set_except" ->
      """SELECT c_custkey FROM customer
        |EXCEPT
        |SELECT o_custkey FROM orders
        |ORDER BY c_custkey""".stripMargin,
    "events_window" ->
      """SELECT time_bucket(INTERVAL '1 hour', ts) AS w_start, event_type,
        |       count(*) AS n_events, round(sum(value), 2) AS sum_value
        |FROM events
        |GROUP BY 1, 2
        |ORDER BY w_start, event_type, n_events, sum_value""".stripMargin,
  )
}
