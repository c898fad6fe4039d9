package graft

import org.apache.spark.sql.functions._
import graft.operators.Relational

/** Differential checks of the DataFrame plans against independent SQL
  * formulations of the same queries (Catalyst analyzes them through
  * different paths), plus algebraic invariants — the in-repo tier of
  * the correctness story; the DuckDB oracle is the cross-engine tier. */
class RelationalSpec extends SparkSuite {
  import spark.implicits._

  private val dir = SparkSpec.sfTiny

  private def sqlOf(q: String): org.apache.spark.sql.DataFrame = {
    Tables.registerAll(spark, dir)
    spark.sql(q)
  }

  test("agg_multi matches SQL formulation") {
    val df = Relational.aggMulti(spark, dir)
    val sql = sqlOf(
      """SELECT round(sum(l_quantity), 2) AS sum_qty,
        |       round(avg(l_quantity), 4) AS avg_qty,
        |       min(l_quantity) AS min_qty, max(l_quantity) AS max_qty,
        |       count(1) AS cnt
        |FROM lineitem WHERE l_shipdate > TIMESTAMP '1995-06-01 00:00:00'""".stripMargin)
    assert(df.collect().toSeq === sql.collect().toSeq)
  }

  test("join_multicond matches SQL formulation (AND semantics)") {
    val df = Relational.joinMultiCond(spark, dir)
    val sql = sqlOf(
      """SELECT l.l_orderkey, l.l_linenumber, l.l_shipdate, o.o_orderdate
        |FROM lineitem l JOIN orders o
        |  ON l.l_orderkey = o.o_orderkey AND l.l_shipdate > o.o_orderdate
        |WHERE o.o_totalprice > 300000
        |ORDER BY l_orderkey, l_linenumber, l_shipdate, o_orderdate""".stripMargin)
    assert(df.collect().toSeq === sql.collect().toSeq)
  }

  test("sort_desc is the exact reverse of sort_asc") {
    val asc = Relational.sortAsc(spark, dir).collect().toSeq
    val desc = Relational.sortDesc(spark, dir).collect().toSeq
    assert(asc === desc.reverse)
  }

  test("sort_topn equals first 100 rows of the full desc sort") {
    val full = Tables.load(spark, dir, "orders")
      .select("o_totalprice", "o_orderkey")
      .orderBy(col("o_totalprice").desc, col("o_orderkey").asc)
      .limit(100).collect().toSeq
    val topn = Relational.sortTopN(spark, dir).collect().toSeq
    assert(topn === full)
  }

  test("set_except returns customers minus order-placing customers") {
    val except = Relational.setExcept(spark, dir).as[Long].collect().toSet
    val all = Tables.load(spark, dir, "customer").select("c_custkey").as[Long].collect().toSet
    val withOrders = Tables.load(spark, dir, "orders").select("o_custkey").as[Long].collect().toSet
    assert(except === (all -- withOrders))
  }

  test("salted join returns exactly the plain join's rows") {
    val salted = Relational.joinSkewSalted(spark, dir).collect().toSeq
    val plain = Tables.load(spark, dir, "lineitem").as("l")
      .join(Tables.load(spark, dir, "orders").as("o"),
        col("l.l_orderkey") === col("o.o_orderkey"))
      .filter(col("o_totalprice") > 350000.0)
      .select(col("l_orderkey"), col("l_linenumber"), col("o_totalprice"))
      .orderBy("l_orderkey", "l_linenumber", "o_totalprice")
      .collect().toSeq
    assert(salted === plain)
  }

  test("approx distinct is within 2% of exact distinct") {
    val exact = Relational.aggCountDistinct(spark, dir).as[Long].head().toDouble
    val approx = Relational.aggApproxDistinct(spark, dir).as[Long].head().toDouble
    assert(math.abs(approx - exact) / exact <= 0.02, s"approx $approx vs exact $exact")
  }

  test("events_window counts sum to total events") {
    val total = Tables.load(spark, dir, "events").count()
    val sum = Relational.eventsWindow(spark, dir)
      .agg(org.apache.spark.sql.functions.sum("n_events")).as[Long].head()
    assert(sum === total)
  }
}
