package graft

import java.io.{File, FileOutputStream}
import java.util.zip.ZipFile
import scala.jdk.CollectionConverters._

import graft.sources.TypedCsv

/** End-to-end golden suite: the reference's own SampleTest fixtures
  * (its ONLY correctness contract, SURVEY.md §5) run through the
  * typed-CSV catalog + Spark SQL and compare against the shipped
  * result CSVs. Numeric compare with tolerance — the goldens' float
  * formatting is inconsistent (`15.50` vs `220.0`), so byte equality
  * is not the contract; values are. */
class TypedCsvSpec extends SparkSuite {

  private lazy val base: File = {
    val dest = new File("target/sampletest-spec")
    if (!new File(dest, "SampleTest/query1.txt").exists()) {
      dest.mkdirs()
      val zip = new ZipFile("/root/reference/src/SampleTest.zip")
      zip.entries().asScala.foreach { e =>
        val out = new File(dest, e.getName)
        if (e.isDirectory) out.mkdirs()
        else {
          out.getParentFile.mkdirs()
          val in = zip.getInputStream(e)
          val os = new FileOutputStream(out)
          try in.transferTo(os) finally { in.close(); os.close() }
        }
      }
      zip.close()
    }
    new File(dest, "SampleTest")
  }

  private def readCsv(f: File): Seq[Array[String]] = {
    val src = scala.io.Source.fromFile(f)
    try src.getLines().map(_.split(",", -1)).toList finally src.close()
  }

  private def assertGolden(queryFile: String, resultFile: String): Unit = {
    TypedCsv.loadDirectory(spark, new File(base, "data").getPath)
    val sql = {
      val src = scala.io.Source.fromFile(new File(base, queryFile))
      try src.mkString.trim.stripSuffix(";") finally src.close()
    }
    val out = new File(s"target/sampletest-spec/out_$resultFile")
    TypedCsv.saveSingleFile(spark.sql(sql), out.getPath)
    val got = readCsv(out)
    val want = readCsv(new File(base, resultFile))
    assert(got.head.toSeq === want.head.toSeq, "header mismatch")
    assert(got.size === want.size, s"row count ${got.size} vs ${want.size}")
    got.tail.zip(want.tail).zipWithIndex.foreach { case ((g, w), i) =>
      g.zip(w).foreach { case (gv, wv) =>
        val eq = (gv.toDoubleOption, wv.toDoubleOption) match {
          case (Some(a), Some(b)) => math.abs(a - b) < 1e-2
          case _ => gv == wv
        }
        assert(eq, s"row $i: ${g.mkString(",")} vs ${w.mkString(",")}")
      }
    }
  }

  test("schemaOf parses typed header with PK flag") {
    val st = TypedCsv.schemaOf("Employees_id (N) (P),Name (T),Salary (N),JoinedDate (D)")
    assert(st.fieldNames.toSeq === Seq("Employees_id", "Name", "Salary", "JoinedDate"))
    assert(st("Employees_id").dataType.typeName === "double")
    assert(st("Employees_id").metadata.getBoolean("primaryKey"))
    assert(st("Name").dataType.typeName === "string")
    assert(st("JoinedDate").dataType.typeName === "timestamp")
  }

  test("query1 golden: comma join + pushed filter + ungrouped AVG") {
    assertGolden("query1.txt", "result1.csv")
  }

  test("query2 golden: timestamp filter + projection + ORDER BY ASC") {
    assertGolden("query2.txt", "result2.csv")
  }

  test("query3 golden: correlated scalar subquery + ORDER BY DESC") {
    assertGolden("query3.txt", "result3.csv")
  }

  test("typed-header sink round-trips") {
    val df = TypedCsv.loadFile(spark, new File(base, "data/Employees.csv").getPath)
    val out = new File("target/sampletest-spec/roundtrip.csv")
    TypedCsv.saveSingleFile(df, out.getPath, typed = true)
    val reloaded = TypedCsv.loadFile(spark, out.getPath)
    assert(reloaded.schema("Employees_id").dataType.typeName === "double")
    assert(reloaded.count() === df.count())
    assert(reloaded.schema.fieldNames.toSeq === df.schema.fieldNames.toSeq)
  }
}
