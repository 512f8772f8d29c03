package graft

import org.apache.spark.sql.functions._

/** The injected optimizer rule (graft.plans.LevenshteinPrefilter):
  * `lev(a,b) <= k` filters gain a length guard and switch to the
  * banded threshold form — exactness, firing, and fixed-point
  * stability asserted against the real optimizer.
  */
class LevenshteinRuleSpec extends SparkSpec {
  import spark.implicits._

  private val df = Seq(
    ("kitten", "sitten"), ("kitten", "sitting"), ("abc", "abcdefgh"),
    ("same", "same"), ("a", "z"), ("short", "a much longer string entirely"))
    .toDF("x", "y")

  test("rewrite fires: filter plans the banded threshold form plus length guard") {
    // parquet-backed input — a LocalRelation would be folded eagerly
    val sup = spark.read.parquet("/root/testdata/sf0.001/supplier.parquet")
    val q = sup.filter(levenshtein(col("s_name"), lit("Supplier#000000001")) <= 1)
    val plan = q.queryExecution.optimizedPlan.toString
    assert(plan.contains("levenshtein(s_name") && plan.contains("Some(1)) >= 0"),
      s"threshold form expected in:\n$plan")
    assert(plan.contains("abs((length"), s"length guard expected in:\n$plan")
  }

  test("results identical to the unrewritten predicate, for several k") {
    for (k <- 0 to 3) {
      val got = df.filter(levenshtein(col("x"), col("y")) <= k)
        .select("x", "y").as[(String, String)].collect().toSet
      val expect = df.collect().map(r => (r.getString(0), r.getString(1)))
        .filter { case (a, b) =>
          // reference: classic DP, no Spark involved
          val d = Array.tabulate(a.length + 1, b.length + 1) { (i, j) =>
            if (i == 0) j else if (j == 0) i else 0 }
          for (i <- 1 to a.length; j <- 1 to b.length)
            d(i)(j) = math.min(math.min(d(i - 1)(j) + 1, d(i)(j - 1) + 1),
              d(i - 1)(j - 1) + (if (a(i - 1) == b(j - 1)) 0 else 1))
          d(a.length)(b.length) <= k
        }.toSet
      assert(got === expect, s"k=$k")
    }
  }

  test("rule is a fixed point: optimizing its own output changes nothing") {
    val once = df.filter(levenshtein(col("x"), col("y")) <= 1).queryExecution.optimizedPlan
    val twice = plans.LevenshteinPrefilter(once)
    assert(twice fastEquals once, "re-applying the rule must be a no-op")
  }
}
