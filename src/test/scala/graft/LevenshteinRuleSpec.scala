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

  // ------------- deletion-neighborhood blocking (ops.Scalar.del1Keys)

  test("del1 blocking is non-degenerate on the real supplier data") {
    // sf0.01 = 100 suppliers (sf0.001's 10 rows have one genuine
    // near-dup clique, hence legitimately one multi-row block)
    val sup = spark.read.parquet("/root/testdata/sf0.01/supplier.parquet")
    val n = sup.count()
    val blocks = sup
      .select(explode(ops.Scalar.del1Keys(col("s_name"))).as("blk"))
      .groupBy("blk").count()
      .filter(col("count") > 1)
    val nBlocks = blocks.count()
    val maxBlock = blocks.agg(max("count")).head.getLong(0)
    // r2's substring(1,9) key put ALL n rows in ONE block ('Supplier#'
    // is universal); the deletion keys must fan out into many small
    // blocks whose size tracks near-dup density, not corpus size
    assert(nBlocks > 1, s"expected >1 multi-row block, got $nBlocks")
    assert(maxBlock < n / 4,
      s"degenerate block: $maxBlock of $n rows share one key")
  }

  test("del1-blocked pair set equals brute force on real supplier data") {
    val got = ops.Scalar.strLevenshtein(spark, "/root/testdata/sf0.001")
      .select("a_key", "b_key").as[(Long, Long)].collect().toSet
    val names = spark.read.parquet("/root/testdata/sf0.001/supplier.parquet")
      .select("s_suppkey", "s_name").as[(Long, String)].collect()
    val brute = (for {
      (ak, an) <- names; (bk, bn) <- names
      if ak < bk && levDp(an, bn) <= 1
    } yield (ak, bk)).toSet
    assert(got === brute)
  }

  test("del1Keys: every edit-distance-<=1 pair shares a key (random strings)") {
    val rnd = new scala.util.Random(7)
    def randStr(): String =
      (0 until 3 + rnd.nextInt(8)).map(_ => ('a' + rnd.nextInt(4)).toChar).mkString
    val strs = Seq.fill(120)(randStr()).distinct
    val keys = strs.toDF("s")
      .select(col("s"), ops.Scalar.del1Keys(col("s")).as("ks"))
      .as[(String, Seq[String])].collect().toMap
    for (a <- strs; b <- strs if a < b && levDp(a, b) <= 1)
      assert(keys(a).toSet.intersect(keys(b).toSet).nonEmpty,
        s"ed<=1 pair ($a, $b) shares no deletion key")
  }

  test("native del1_keys ≡ the HOF formulation, element for element (incl. non-BMP and NULL)") {
    // the astral-plane rows pin code-POINT deletion: Spark's substr /
    // length (and therefore the HOF form) step by code points, so a
    // native expression deleting UTF-16 units would diverge here
    val sup = spark.read.parquet("/root/testdata/sf0.01/supplier.parquet")
      .select(col("s_name").as("s"))
      .union(Seq("a", "ab", "aab", "xyzzy", "x😀y", "𝄞",
        "a😀𝄞b").toDF("s"))
      .union(Seq(Option.empty[String]).toDF("s"))
    val rows = sup.select(
      ops.Scalar.del1Keys(col("s")).as("native"),
      ops.Scalar.del1KeysHof(col("s")).as("hof"))
      .as[(Option[Seq[String]], Option[Seq[String]])].collect()
    rows.foreach { case (n, h) => assert(n === h) }
  }

  test("non-BMP ed<=1 pairs share a deletion key and survive the blocked join") {
    // U+1F600 vs U+1D11E: ONE code-point substitution (Spark levenshtein
    // = 1) but both UTF-16 units differ — unit-level deletion keys would
    // silently drop the pair from the blocked join
    val emoji = "😀"; val clef = "𝄞"
    val cases = Seq(
      (s"x${emoji}y", s"x${clef}y"),   // astral substitution
      ("ab", s"ab$emoji"),             // astral insertion (2 units, 1 cp)
      (s"$emoji$clef", s"$emoji"))     // astral deletion
    cases.foreach { case (a, b) =>
      val lev = Seq((a, b)).toDF("a", "b")
        .select(levenshtein(col("a"), col("b"))).head.getInt(0)
      assert(lev <= 1, s"fixture assumption: ($a,$b) must be ed<=1 by Spark")
      val keys = Seq(a, b).toDF("s")
        .select(ops.Scalar.del1Keys(col("s"))).as[Seq[String]].collect()
      assert(keys(0).toSet.intersect(keys(1).toSet).nonEmpty,
        s"non-BMP ed<=1 pair ($a, $b) shares no deletion key")
    }
  }

  test("del_keys(k=2): every ed<=2 pair shares a key (random strings)") {
    val rnd = new scala.util.Random(11)
    def randStr(): String =
      (0 until 3 + rnd.nextInt(8)).map(_ => ('a' + rnd.nextInt(4)).toChar).mkString
    val strs = Seq.fill(80)(randStr()).distinct
    val keys = strs.toDF("s")
      .select(col("s"), graft.functions.TextExpressions.delKeys(col("s"), 2).as("ks"))
      .as[(String, Seq[String])].collect().toMap
    for (a <- strs; b <- strs if a < b && levDp(a, b) <= 2)
      assert(keys(a).toSet.intersect(keys(b).toSet).nonEmpty,
        s"ed<=2 pair ($a, $b) shares no 2-deletion key")
  }

  test("k=2 blocked pair set equals brute force on real supplier data") {
    val got = ops.Scalar.strLevenshteinK2(spark, "/root/testdata/sf0.001")
      .select("a_key", "b_key", "dist").as[(Long, Long, Int)].collect().toSet
    val names = spark.read.parquet("/root/testdata/sf0.001/supplier.parquet")
      .select("s_suppkey", "s_name").as[(Long, String)].collect()
    val brute = (for {
      (ak, an) <- names; (bk, bn) <- names
      if ak < bk && levDp(an, bn) <= 2
    } yield (ak, bk, levDp(an, bn))).toSet
    assert(got === brute)
  }

  test("del_keys rejects non-string input at analysis time") {
    val ex = intercept[org.apache.spark.sql.AnalysisException] {
      Seq(1, 2).toDF("n")
        .select(graft.functions.TextExpressions.delKeys(col("n"), 1)).collect()
    }
    assert(ex.getMessage.contains("del_keys"), s"unexpected: ${ex.getMessage}")
  }

  /** Classic DP edit distance — reference implementation, no Spark. */
  private def levDp(a: String, b: String): Int = {
    val d = Array.tabulate(a.length + 1, b.length + 1) { (i, j) =>
      if (i == 0) j else if (j == 0) i else 0 }
    for (i <- 1 to a.length; j <- 1 to b.length)
      d(i)(j) = math.min(math.min(d(i - 1)(j) + 1, d(i)(j - 1) + 1),
        d(i - 1)(j - 1) + (if (a(i - 1) == b(j - 1)) 0 else 1))
    d(a.length)(b.length)
  }
}
