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
    // exercises the SHIPPED union+carry-forward operator, not a local
    // reference formulation — fixtures written as a scale-factor dir
    val d = java.nio.file.Files.createTempDirectory("asof").toString
    // events.ts rides as raw nanos (the reader's TIMESTAMP(NANOS) path)
    def ns(t: String): Long = ts(t).getTime * 1000000L
    Seq(
      (100L, 7L, ns("2024-01-10 12:00:00")), // has ties + boundary order
      (101L, 8L, ns("2024-01-01 00:00:00")), // user with no prior order → dropped
      (102L, 7L, ns("2024-01-10 11:59:59"))  // just before the tied orders → earlier order wins
    ).toDF("event_id", "user_id", "ts").coalesce(1).write.parquet(s"$d/events.parquet")
    Seq(
      (7L, 1L, ts("2024-01-10 12:00:00")), // exactly at ts → eligible (<=)
      (7L, 2L, ts("2024-01-10 12:00:00")), // same date, higher key → wins tie
      (7L, 3L, ts("2024-01-11 00:00:00")), // after ts → excluded
      (7L, 4L, ts("2024-01-01 00:00:00")), // earlier → loses (but wins for event 102)
      (8L, 5L, ts("2024-02-01 00:00:00"))  // after user 8's event → user 8 unmatched
    ).toDF("o_custkey", "o_orderkey", "o_orderdate").coalesce(1)
      .write.parquet(s"$d/orders.parquet")
    val r = ops.Relational.joinAsof(spark, d)
      .select("event_id", "asof_orderkey").as[(Long, Long)].collect().toMap
    assert(r === Map(100L -> 2L, 102L -> 4L),
      "boundary inclusive, (date,key)-max tie-break, no-prior-order events dropped")
  }
}
