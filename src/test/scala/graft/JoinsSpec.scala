package graft

import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window

/** Adversarial join semantics (SURVEY §5.2): NULL keys in every join
  * type, null-safe equality, as-of boundary/tie behavior.
  */
class JoinsSpec extends SparkSpec {
  import spark.implicits._

  private lazy val left = Seq(
    (Some(1), "l1"), (Some(2), "l2"), (None: Option[Int], "lnull")
  ).toDF("k", "lv")
  private lazy val right = Seq(
    (Some(1), "r1"), (Some(3), "r3"), (None: Option[Int], "rnull")
  ).toDF("k", "rv")

  test("inner join drops NULL keys on both sides") {
    val j = left.join(right, left("k") === right("k"), "inner")
    assert(j.count() === 1)
    assert(j.select("lv", "rv").as[(String, String)].collect().toSet === Set(("l1", "r1")))
  }

  test("left outer keeps NULL-key row with null right side") {
    val j = left.join(right, left("k") === right("k"), "left")
    assert(j.count() === 3)
    assert(j.filter(left("k").isNull).select("rv").collect().head.isNullAt(0))
  }

  test("full outer yields both unmatched NULL-key rows separately") {
    val j = left.join(right, left("k") === right("k"), "full")
    assert(j.count() === 5) // match(1), l2, lnull, r3, rnull
  }

  test("null-safe equality <=> matches NULL to NULL") {
    val j = left.join(right, left("k") <=> right("k"), "inner")
    assert(j.count() === 2) // (1,1) and (null,null)
  }

  test("semi + anti partition the left relation exactly") {
    val semi = left.join(right, left("k") === right("k"), "left_semi")
    val anti = left.join(right, left("k") === right("k"), "left_anti")
    assert(semi.count() + anti.count() === left.count())
    assert(anti.select("lv").as[String].collect().toSet === Set("l2", "lnull"))
  }

  test("as-of join: <= boundary inclusive, latest wins, orderkey breaks date ties") {
    val events = Seq((100L, 7L, ts("2024-01-10 12:00:00"))).toDF("event_id", "user_id", "ts")
    val orders = Seq(
      (7L, 1L, ts("2024-01-10 12:00:00")), // exactly at ts → eligible (<=)
      (7L, 2L, ts("2024-01-10 12:00:00")), // same date, higher key → wins tie
      (7L, 3L, ts("2024-01-11 00:00:00")), // after ts → excluded
      (7L, 4L, ts("2024-01-01 00:00:00"))  // earlier → loses
    ).toDF("o_custkey", "o_orderkey", "o_orderdate")
    val w = Window.partitionBy(col("event_id"))
      .orderBy(col("o_orderdate").desc, col("o_orderkey").desc)
    val r = events
      .join(orders, col("user_id") === col("o_custkey") && col("o_orderdate") <= col("ts"))
      .withColumn("rn", row_number().over(w)).filter(col("rn") === 1)
    assert(r.select("o_orderkey").as[Long].collect().toSeq === Seq(2L))
  }
}
