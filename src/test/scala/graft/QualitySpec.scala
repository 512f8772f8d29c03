package graft

import org.apache.spark.sql.functions._

/** Data-quality audit: planted-violation fixtures prove each rule
  * counts exactly the rows it claims to, and the corpus audit is
  * clean (the synthetic star schema satisfies its own FKs).
  */
class QualitySpec extends SparkSpec {
  import spark.implicits._

  test("fkRule counts exactly the orphans, once per child row") {
    val child = Seq(1L, 1L, 2L, 3L, 99L, 99L, 100L).toDF("ck")
    val parent = Seq(1L, 2L, 3L, 3L).toDF("pk") // dup parent keys must not multiply
    val r = ops.Quality.fkRule("t", child, col("ck"), parent, col("pk")).collect()(0)
    assert(r.getString(0) === "t")
    assert(r.getLong(1) === 7L)  // n_checked = child rows
    assert(r.getLong(2) === 3L)  // orphans: 99, 99, 100
  }

  test("domainRules: one pass, one row per rule, independent counts") {
    val df = Seq((0.0, -1.0), (1.0, 0.2), (-5.0, 0.9), (2.0, 0.1)).toDF("q", "d")
    val out = ops.Quality.domainRules(df, Seq(
      "q_pos" -> (col("q") <= 0),
      "d_range" -> (col("d") < 0 || col("d") > 0.5))).collect()
      .map(r => r.getString(0) -> (r.getLong(1), r.getLong(2))).toMap
    assert(out === Map("q_pos" -> (4L, 2L), "d_range" -> (4L, 2L)))
  }

  test("dq_audit_rules: the synthetic corpus is referentially clean and in-domain") {
    val rows = ops.Quality.dqAuditRules(spark, "/root/testdata/sf0.001").collect()
    assert(rows.length === 8)
    // every rule reports a positive checked count and zero violations
    rows.foreach { r =>
      assert(r.getLong(1) > 0, r.getString(0))
      assert(r.getLong(2) === 0L, s"${r.getString(0)} has violations")
      assert(r.getLong(3) === 0L)
    }
    // ordered by rule name (the oracle's total order)
    val names = rows.map(_.getString(0)).toSeq
    assert(names === names.sorted)
  }
}
