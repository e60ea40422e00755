package graft.operators

import graft.SparkSpec

/** Pins suppression semantics: exactly the sub-k classes are NULLed, the
  * non-quasi payload always survives, and the report's risk arithmetic. */
class PrivacySpec extends SparkSpec {
  import spark.implicits._

  private lazy val rows = Seq(
    // class (DE, A): 3 members — at risk at k=4
    (1L, "DE", "A"), (2L, "DE", "A"), (3L, "DE", "A"),
    // class (FR, B): 4 members — safe
    (4L, "FR", "B"), (5L, "FR", "B"), (6L, "FR", "B"), (7L, "FR", "B"),
    // singleton
    (8L, "ES", "C"),
  ).toDF("id", "country", "segment")

  test("kAnonymityReport flags sub-k classes with exact risk") {
    val r = Privacy.kAnonymityReport(rows, Seq("country", "segment"), k = 4)
      .collect().map(x => (x.getString(0), x.getString(1)) ->
        (x.getAs[Long]("n_rows"), x.getAs[Int]("at_risk"), x.getAs[Double]("reid_risk"))).toMap
    assert(r(("DE", "A")) == ((3L, 1, 1.0 / 3)))
    assert(r(("FR", "B")) == ((4L, 0, 0.25)))
    assert(r(("ES", "C")) == ((1L, 1, 1.0)))
  }

  test("suppressBelowK nulls quasi cells of sub-k classes only, keeps payload") {
    val out = Privacy.suppressBelowK(rows, Seq("country", "segment"), k = 4)
      .collect().map(x => x.getLong(0) ->
        (Option(x.getString(1)), Option(x.getString(2)), x.getAs[Int]("suppressed"))).toMap
    assert(out.size == 8) // every row survives
    (1L to 3L).foreach(i => assert(out(i) == ((None, None, 1))))
    (4L to 7L).foreach(i => assert(out(i) == ((Some("FR"), Some("B"), 0))))
    assert(out(8L) == ((None, None, 1)))
  }
}
