package graft

import org.apache.spark.sql.functions._

/** Salted-join / salted-agg equivalence: salting must change ONLY the
  * shuffle distribution, never the result set (SURVEY §7.5).
  */
class SkewSpec extends SparkSpec {
  import spark.implicits._

  // one pathologically hot key (90% of rows) + a long tail
  private lazy val skewed = ((1 to 900).map(i => (1L, i.toLong, i * 1.5)) ++
    (1 to 100).map(i => ((i % 7 + 2).toLong, i.toLong, i * 2.0)))
    .toDF("k", "row_id", "v")
  private lazy val dim = (1L to 10L).map(k => (k, s"name$k")).toDF("k", "name")

  test("saltedJoin returns exactly the rows of the plain join") {
    val plain = skewed.join(dim, Seq("k"), "inner")
      .select("k", "row_id", "v", "name")
    val salted = ops.Skew.saltedJoin(skewed, dim, "k", "row_id", salts = 8)
      .select("k", "row_id", "v", "name")
    assert(salted.count() === plain.count())
    assert(salted.exceptAll(plain).count() === 0)
    assert(plain.exceptAll(salted).count() === 0)
  }

  test("salted two-phase aggregation equals direct aggregation (decimal-exact)") {
    val direct = skewed.groupBy("k")
      .agg(sum(col("v").cast(Determinism.Money)).as("sum_value"), count(lit(1)).as("n"))
    val salted = ops.Skew.saltedSumCount(
      skewed, "k", col("v").cast(Determinism.Money), "row_id", salts = 8)
    val diff = direct.join(salted.withColumnRenamed("sum_value", "s2")
        .withColumnRenamed("n", "n2"), "k")
      .filter(col("sum_value") =!= col("s2") || col("n") =!= col("n2"))
    assert(diff.count() === 0)
    assert(salted.count() === direct.count())
  }

  test("salt is deterministic per discriminator value") {
    val s1 = skewed.select(ops.Skew.salt(col("row_id"), 8).as("s")).collect()
    val s2 = skewed.select(ops.Skew.salt(col("row_id"), 8).as("s")).collect()
    assert(s1.map(_.getInt(0)).toSeq === s2.map(_.getInt(0)).toSeq)
    val distinct = skewed.select(ops.Skew.salt(col("row_id"), 8).as("s")).distinct().count()
    assert(distinct === 8, "hot key must spread over all salt buckets")
  }
}
