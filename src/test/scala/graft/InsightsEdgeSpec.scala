package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.ops.Insights

/** Anti-join / retake edge cases from SURVEY.md §5 (Q10/Q11):
  *  - a student who only ever failed a course must appear in q10;
  *  - a remediated failure must not;
  *  - failing the same course twice (RO then RF) is still "never passed"
  *    and counts as a retake. */
class InsightsEdgeSpec extends AnyFunSuite with SparkTestBase {

  private lazy val dir = writeMiniStar(Seq(
    // student 10: course 201 failed once, never retaken
    (100L, 10L, 201L, "2023-03-01", "R", "F", 3.0),
    // student 11: course 202 failed then passed (remediated)
    (110L, 11L, 202L, "2023-03-01", "R", "F", 3.0),
    (111L, 11L, 202L, "2023-09-01", "A", "F", 3.0),
    // student 12: course 203 failed twice (RO then RF)
    (120L, 12L, 203L, "2023-03-01", "R", "O", 3.0),
    (121L, 12L, 203L, "2023-09-01", "R", "F", 3.0)))

  test("q10: failed-never-passed keeps only unremediated failures") {
    val got = Insights.q10_failed_never_passed(spark, dir)
      .collect().map(r => (r.getAs[Long]("student"), r.getAs[Long]("course")))
    assert(got.toSeq == Seq((10L, 201L), (12L, 203L)))
  }

  test("q11: retaken courses counted regardless of outcome") {
    val got = Insights.q11_retaken(spark, dir)
      .collect()
      .map(r => (r.getAs[Long]("student"), r.getAs[Long]("course"), r.getAs[Long]("jumlah")))
    assert(got.toSeq == Seq((11L, 202L, 2L), (12L, 203L, 2L)))
  }
}
