package graft.eval

import org.apache.spark.sql.SparkSession
import graft.core.FkEdge

/**
 * Second evaluation schema: the reference's pilot ran over two DIFFERENT
 * schemas ("school" and "store",
 * `backend/models/2564b10e49e9651a/metadata.json`,
 * `Miscellaneous/Project_Plan.txt:53-63`) so a single-fixture eval
 * saturates and distinguishes nothing. This is a deterministic in-memory
 * school schema — students, courses, scores with realistic FKs,
 * categorical grade letters and a numeric score — registered as temp
 * views, over which the demo-script questions ("students with a C and
 * score > 75", "top 5 courses by average score", "count per grade
 * letter") become evaluable with gold SQL.
 */
object SchoolFixture {

  val tables: Seq[String] = Seq("students", "courses", "scores")

  val fks: Seq[FkEdge] = Seq(
    FkEdge("scores", "student_id", "students", "student_id"),
    FkEdge("scores", "course_id", "courses", "course_id"))

  private def gradeOf(score: Int): String =
    if (score >= 90) "A" else if (score >= 80) "B" else if (score >= 70) "C"
    else if (score >= 60) "D" else "F"

  /** Register the deterministic fixture as temp views; returns the table
    * names. Data is a pure function of the ids (no RNG). */
  def register(spark: SparkSession): Seq[String] = {
    import spark.implicits._
    val first = Array("Ada", "Ben", "Cara", "Dev", "Elif", "Finn", "Gao", "Hana", "Ivan", "Jun")
    val last = Array("Adams", "Brown", "Chen", "Diaz", "Evans", "Fox", "Garcia", "Hall")
    val students = (1 to 100).map { i =>
      (i.toLong, s"${first(i % 10)} ${last(i % 8)}", 9 + i % 4, 14 + (i * 7) % 5)
    }.toDF("student_id", "student_name", "grade_level", "age")
    val depts = Array("math", "science", "history", "arts")
    val courseNames = Array("Algebra", "Biology", "Chemistry", "World History", "Painting",
      "Geometry", "Physics", "Literature", "Music", "Statistics")
    val courses = (1 to 10).map { c =>
      (c.toLong, courseNames(c - 1), depts(c % 4))
    }.toDF("course_id", "course_name", "dept")
    val scores = (for {
      s <- 1 to 100
      c <- 1 to 10
      if (s + c) % 3 != 0 // each student takes ~2/3 of the courses
    } yield {
      val score = 45 + ((s * 31 + c * 17) % 56) // 45..100, deterministic
      val year = 2022 + (s + c) % 3
      ((s.toLong * 100 + c), s.toLong, c.toLong, score, gradeOf(score), year)
    }).toDF("score_id", "student_id", "course_id", "score", "grade", "year")
    students.createOrReplaceTempView("students")
    courses.createOrReplaceTempView("courses")
    scores.createOrReplaceTempView("scores")
    tables
  }
}
