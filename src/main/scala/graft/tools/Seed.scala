package graft.tools

import java.io.{BufferedWriter, File, FileWriter}

/** Deterministic typed-CSV generator — the Spark-side analogue of the
  * reference's `src/seed.py` (Faker tables with the typed header that
  * print min/max/sum/avg of salary as a hand-check oracle,
  * `seed.py:120-142`). Seeded LCG instead of Faker, so every run of
  * the same (rows, seed) is byte-identical and specs can assert
  * against locally recomputed aggregates.
  *
  * Usage: `Seed.main(Array(outDir, rows))` writes `employees.csv` and
  * `departments.csv` and prints the salary oracle line.
  */
object Seed {
  final case class Employee(id: Long, name: String, salary: Double,
                            hireDate: String, departmentId: Long)

  private val firstNames = Vector("Alice", "Bob", "Carol", "David", "Erin",
    "Frank", "Grace", "Henry", "Irene", "Jack")
  private val lastNames = Vector("Johnson", "Smith", "Davis", "Brown",
    "Williams", "Miller", "Wilson", "Moore", "Taylor", "Clark")
  val departments: Vector[String] =
    Vector("Engineering", "Sales", "Marketing", "Finance", "Support")

  def employees(rows: Int, seed: Long = 42L): Seq[Employee] = {
    var s = seed
    def next(n: Int): Int = {
      s = s * 6364136223846793005L + 1442695040888963407L
      (((s >>> 33) % n).toInt + n) % n
    }
    (1 to rows).map { i =>
      val salary = 30000.0 + next(900001) / 10.0 // 30000.0 .. 120000.0
      val y = 2020 + next(4); val m = 1 + next(12); val d = 1 + next(28)
      Employee(i.toLong,
        s"${firstNames(next(10))} ${lastNames(next(10))}",
        salary,
        f"$y%04d-$m%02d-$d%02d ${next(24)}%02d:${next(60)}%02d:00",
        1L + next(departments.size))
    }
  }

  def writeCsv(dir: String, rows: Int, seed: Long = 42L): Seq[Employee] = {
    new File(dir).mkdirs()
    val emps = employees(rows, seed)
    val ew = new BufferedWriter(new FileWriter(new File(dir, "employees.csv")))
    try {
      ew.write("id (N) (P),name (T),salary (N),hire_date (D),department_id (N)")
      ew.newLine()
      emps.foreach { e =>
        ew.write(s"${e.id},${e.name},${e.salary},${e.hireDate},${e.departmentId}")
        ew.newLine()
      }
    } finally ew.close()
    val dw = new BufferedWriter(new FileWriter(new File(dir, "departments.csv")))
    try {
      dw.write("id (N) (P),name (T)"); dw.newLine()
      departments.zipWithIndex.foreach { case (n, i) =>
        dw.write(s"${i + 1},$n"); dw.newLine()
      }
    } finally dw.close()
    emps
  }

  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("target/seed")
    val rows = args.lift(1).map(_.toInt).getOrElse(10000)
    val emps = writeCsv(dir, rows)
    val sal = emps.map(_.salary)
    // the reference prints exactly this oracle set (seed.py:120-142)
    println(f"salary min=${sal.min}%.2f max=${sal.max}%.2f " +
      f"sum=${sal.sum}%.2f avg=${sal.sum / sal.size}%.4f rows=$rows")
  }
}
