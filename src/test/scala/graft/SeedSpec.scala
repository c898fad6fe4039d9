package graft

import org.apache.spark.sql.functions._
import graft.sources.TypedCsv
import graft.tools.Seed

/** FIXTURES.md §2: the seed.py-analogue generator round-trips through
  * the typed-CSV catalog and Spark's aggregates match the generator's
  * locally computed oracle (the reference hand-checks the same four
  * numbers, seed.py:120-142). */
class SeedSpec extends SparkSuite {
  import spark.implicits._

  test("generated typed CSVs load and aggregate to the local oracle") {
    val dir = "target/seed-spec"
    val emps = Seed.writeCsv(dir, rows = 5000)
    val tables = TypedCsv.loadDirectory(spark, dir)
    assert(tables.keySet === Set("employees", "departments"))

    val row = spark.sql(
      """SELECT min(salary) AS mn, max(salary) AS mx,
        |       sum(salary) AS sm, count(*) AS n FROM employees""".stripMargin)
      .as[(Double, Double, Double, Long)].head()
    val sal = emps.map(_.salary)
    assert(row._4 === 5000L)
    assert(math.abs(row._1 - sal.min) < 1e-6)
    assert(math.abs(row._2 - sal.max) < 1e-6)
    assert(math.abs(row._3 - sal.sum) < 1e-4)

    // join against the department dim behaves
    val perDept = spark.sql(
      """SELECT d.name, count(*) AS n FROM employees e
        |JOIN departments d ON e.department_id = d.id GROUP BY d.name""".stripMargin)
      .as[(String, Long)].collect().toMap
    assert(perDept.values.sum === 5000L)
    assert(perDept.keySet === Seed.departments.toSet)
  }
}
