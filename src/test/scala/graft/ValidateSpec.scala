package graft

import org.apache.spark.sql.functions._
import graft.operators.Validate

/** Constraint-report semantics on a hand-built table where every
  * count is derivable by eye — incl. the null-key referential case
  * (anti-join keeps null keys = dangling; NOT IN would lie).
  */
class ValidateSpec extends SparkSpecBase {

  test("report counts row, uniqueness, and referential violations exactly") {
    val sp = spark
    import sp.implicits._
    val df = Seq(
      (1L, Option(10L), 5.0),   // clean
      (2L, Option(10L), -1.0),  // range violation
      (2L, Option(11L), 5.0),   // dup id 2 + dangling fk 11
      (3L, None, 5.0),          // null user (also dangling in the fk check)
      (4L, Option(10L), 2000.0) // range violation
    ).toDF("event_id", "user_id", "value")
    val dim = Seq(10L).toDF("k")
    val got = Validate.report(df,
        Seq(Validate.RowRule("r1_user_not_null", col("user_id").isNull),
          Validate.RowRule("r2_value_in_range", col("value") < 0 || col("value") > 1000)),
        uniqueKeys = Seq(("u1_event_id_unique", col("event_id"))),
        refs = Seq(("f1_user_in_dim", col("user_id"), dim, col("k"))))
      .as[(String, Long, Long)].collect().toSeq
    assert(got == Seq(
      ("f1_user_in_dim", 5L, 2L),      // user 11 + the null row
      ("r1_user_not_null", 5L, 1L),
      ("r2_value_in_range", 5L, 2L),
      ("u1_event_id_unique", 5L, 1L))) // one excess row for id 2
  }

  test("rules-free call (unique/ref only) resolves and reports") {
    val sp = spark
    import sp.implicits._
    val df = Seq((1L, 10L), (1L, 11L)).toDF("event_id", "user_id")
    val dim = Seq(10L).toDF("k")
    val got = Validate.report(df, Nil,
        uniqueKeys = Seq(("u1", col("event_id"))),
        refs = Seq(("f1", col("user_id"), dim, col("k"))))
      .as[(String, Long, Long)].collect().toSeq
    assert(got == Seq(("f1", 2L, 1L), ("u1", 2L, 1L)))
  }

  test("empty input reports 0 checked (not null) on every branch") {
    val sp = spark
    import sp.implicits._
    val df = Seq.empty[(Long, Long)].toDF("event_id", "user_id")
    val dim = Seq(10L).toDF("k")
    val got = Validate.report(df,
        Seq(Validate.RowRule("r1", col("user_id").isNull)),
        uniqueKeys = Seq(("u1", col("event_id"))),
        refs = Seq(("f1", col("user_id"), dim, col("k"))))
      .as[(String, Long, Long)].collect().toSeq
    assert(got == Seq(("f1", 0L, 0L), ("r1", 0L, 0L), ("u1", 0L, 0L)))
  }

  test("zero constraints is an explicit error, not an analysis crash") {
    val sp = spark
    import sp.implicits._
    val df = Seq((1L, 10L)).toDF("event_id", "user_id")
    val e = intercept[IllegalArgumentException](Validate.report(df, Nil))
    assert(e.getMessage.contains("at least one constraint"))
  }

  test("clean table reports zero violations, not missing rows") {
    val sp = spark
    import sp.implicits._
    val df = Seq((1L, 10L)).toDF("event_id", "user_id")
    val got = Validate.report(df,
        Seq(Validate.RowRule("r1", col("user_id").isNull)),
        uniqueKeys = Seq(("u1", col("event_id"))))
      .as[(String, Long, Long)].collect().toSeq
    assert(got == Seq(("r1", 1L, 0L), ("u1", 1L, 0L)))
  }
}
