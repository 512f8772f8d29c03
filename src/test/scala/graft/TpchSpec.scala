package graft

import org.apache.spark.sql.functions._

/** Brute-force replays and conservation invariants for the TPC-H
  * completion wave (ops/Tpch.scala). The DuckDB oracle is the
  * cross-engine instrument; these specs independently re-derive each
  * query's answer from first principles with DIFFERENT primitives
  * (fluent-API replays instead of SQL text, window-average instead of
  * cross-multiplication), so a shared misreading of the spec can't
  * pass both.
  */
class TpchSpec extends SparkSpec {

  private val dir = "/root/testdata/sf0.001"
  private def li = spark.read.parquet(s"$dir/lineitem.parquet")
  private def ord = spark.read.parquet(s"$dir/orders.parquet")
  private def cust = spark.read.parquet(s"$dir/customer.parquet")
  private val cents = (c: String) =>
    (col(c).cast("decimal(18,2)") * 100).cast("long")
  private def num(r: org.apache.spark.sql.Row, i: Int): Long =
    r.get(i).asInstanceOf[Number].longValue

  test("sql_tpch_q4: order_count conservation vs a fluent-API late-order replay") {
    val res = ops.Tpch.sqlTpchQ4(spark, dir).collect()
    val late = li.join(ord, col("l_orderkey") === col("o_orderkey"))
      .where(col("o_orderdate") >= lit("1996-07-01") &&
        col("o_orderdate") < lit("1996-10-01") &&
        col("l_shipdate") > col("o_orderdate") + expr("INTERVAL 60 DAY"))
      .select("o_orderkey").distinct().count()
    assert(res.map(_.getLong(1)).sum === late)
    assert(res.map(_.getString(0)).toSeq == res.map(_.getString(0)).toSeq.sorted)
  }

  test("sql_tpch_q7: rows are exactly the two ordered nation pairs; revenue positive") {
    val rows = ops.Tpch.sqlTpchQ7(spark, dir).collect()
    val pairs = rows.map(r => (r.getString(0), r.getString(1))).toSet
    assert(pairs.subsetOf(Set(("NATION_3", "NATION_7"), ("NATION_7", "NATION_3"))))
    assert(rows.forall(_.getLong(3) > 0))
  }

  test("sql_tpch_q8: share is the IEEE division of the two exact longs; target <= total") {
    ops.Tpch.sqlTpchQ8(spark, dir).collect().foreach { r =>
      val (t, tot, share) = (r.getLong(1), r.getLong(2), r.getDouble(3))
      assert(t >= 0 && t <= tot)
      assert(share == t.toDouble / tot.toDouble)
    }
  }

  test("sql_tpch_q12: the two CASE counts partition the row count") {
    ops.Tpch.sqlTpchQ12(spark, dir).collect().foreach { r =>
      assert(r.getLong(1) + r.getLong(2) === r.getLong(3))
    }
  }

  test("sql_tpch_q13: the distribution conserves the customer universe (zero-order customers included)") {
    val rows = ops.Tpch.sqlTpchQ13(spark, dir).collect()
    assert(rows.map(_.getLong(1)).sum === cust.count())
  }

  test("sql_tpch_q15: every emitted supplier attains the replayed exact maximum") {
    val rev = li
      .where(col("l_shipdate") >= lit("1996-01-01") && col("l_shipdate") < lit("1996-04-01"))
      .groupBy("l_suppkey")
      .agg(sum(cents("l_extendedprice") * (lit(100) - cents("l_discount"))).as("te"))
    val mx = rev.agg(max("te")).head().getLong(0)
    val winners = rev.where(col("te") === mx).select("l_suppkey")
      .collect().map(_.getLong(0)).toSet
    val got = ops.Tpch.sqlTpchQ15(spark, dir).collect()
    assert(got.map(_.getLong(0)).toSet === winners)
    assert(got.forall(_.getLong(2) === mx))
  }

  test("sql_tpch_q17: integer cross-multiplication equals the window-average replay") {
    val part = spark.read.parquet(s"$dir/part.parquet")
      .where(col("p_brand") === "Brand#3" && col("p_size") <= 10)
    // independent primitives: per-part avg via a window, double compare
    // guarded exactly by re-checking the rational form on the survivors
    val w = org.apache.spark.sql.expressions.Window.partitionBy("l_partkey")
    val flagged = li
      .withColumn("cnt", count(lit(1)).over(w))
      .withColumn("s", sum(col("l_quantity").cast("long")).over(w))
      .join(part, col("l_partkey") === col("p_partkey"))
      .where(col("l_quantity").cast("long") * 5 * col("cnt") < col("s"))
    val nExp = flagged.count()
    val sumExp = flagged.agg(sum(cents("l_extendedprice"))).head().getLong(0)
    val r = ops.Tpch.sqlTpchQ17(spark, dir).head()
    assert(r.getLong(0) === nExp)
    assert(r.getLong(1) === sumExp)
  }

  test("sql_tpch_q21: fluent-API replay of the waiting-supplier count matches") {
    val late = li.join(ord.where(col("o_orderstatus") === "F"),
        col("l_orderkey") === col("o_orderkey"))
      .where(col("l_shipdate") > col("o_orderdate") + expr("INTERVAL 60 DAY"))
      .select(col("l_orderkey").as("ok"), col("l_suppkey").as("sk"))
    val allSupp = li.select(col("l_orderkey").as("ok2"), col("l_suppkey").as("sk2")).distinct()
    // orders with >1 distinct supplier, and whose late-supplier set is {sk}
    val lateSet = late.select("ok", "sk").distinct()
    val multi = allSupp.groupBy("ok2").agg(countDistinct("sk2").as("ns")).where(col("ns") > 1)
    val soloLate = lateSet.groupBy("ok").agg(countDistinct("sk").as("nl"), first("sk").as("only"))
      .where(col("nl") === 1)
    val qualifying = late
      .join(multi, col("ok") === col("ok2"))
      .join(soloLate.select(col("ok").as("ok3"), col("only")), col("ok") === col("ok3") && col("sk") === col("only"))
    val exp = qualifying.groupBy("sk").count()
      .join(spark.read.parquet(s"$dir/supplier.parquet"), col("sk") === col("s_suppkey"))
      .select(col("s_name"), col("count"))
      .orderBy(col("count").desc, col("s_name")).limit(10)
      .collect().map(r => (r.getString(0), r.getLong(1))).toSeq
    val got = ops.Tpch.sqlTpchQ21(spark, dir)
      .collect().map(r => (r.getString(0), r.getLong(1))).toSeq
    assert(got === exp)
  }

  test("sql_tpch_q22: emitted codes lie in the code set; balances above the replayed exact boundary") {
    val codes = Set(3L, 7L, 11L, 17L, 21L)
    val base = cust.where(col("c_nationkey").isin(codes.toSeq: _*))
    val pos = base.where(col("c_acctbal") > 0)
      .agg(count(lit(1)).as("n"), sum(cents("c_acctbal")).as("s")).head()
    val (n, s2) = (pos.getLong(0), pos.getLong(1))
    val rows = ops.Tpch.sqlTpchQ22(spark, dir).collect()
    assert(rows.map(r => r.get(0).toString.toLong).forall(codes))
    // every counted customer individually clears cents·n > sum
    val recent = ord.where(col("o_orderdate") >= lit("1999-08-01"))
      .select(col("o_custkey")).distinct()
    val exp = base
      .where(cents("c_acctbal") * n > s2)
      .join(recent, col("c_custkey") === col("o_custkey"), "left_anti")
      .groupBy("c_nationkey").agg(count(lit(1)).as("nc"), sum(cents("c_acctbal")).as("tb"))
      .collect().map(r => (r.get(0).toString.toLong, (r.getLong(1), r.getLong(2)))).toMap
    val gotM = rows.map(r => (r.get(0).toString.toLong, (r.getLong(1), r.getLong(2)))).toMap
    assert(gotM === exp)
  }

  test("sql_tpch_q2: every emitted supplier attains the exact region minimum for its part") {
    val li2 = li.select(col("l_partkey"), col("l_suppkey"),
        ((col("l_extendedprice").cast("decimal(18,2)") * 100).cast("long") * 10000)
          .as("pe"), col("l_quantity").cast("long").as("q"))
      .withColumn("unit_e6", expr("pe div q"))
      .groupBy("l_partkey", "l_suppkey").agg(min("unit_e6").as("unit_e6"))
      .collect().map(r => ((r.getLong(0), r.getLong(1)), r.getLong(2))).toMap
    val supp = spark.read.parquet(s"$dir/supplier.parquet")
      .collect().map(r => num(r, 0) -> num(r, 2)).toMap // suppkey -> nationkey
    val nat = spark.read.parquet(s"$dir/nation.parquet")
      .collect().map(r => num(r, 0) -> num(r, 2)).toMap // nationkey -> regionkey
    val eur = spark.read.parquet(s"$dir/region.parquet")
      .collect().collectFirst { case r if r.getString(1) == "EUROPE" => num(r, 0) }.get
    val inEur = (sk: Long) => nat(supp(sk)) == eur
    val minByPart = li2.toSeq.filter { case ((_, sk), _) => inEur(sk) }
      .groupBy(_._1._1).view.mapValues(_.map(_._2).min).toMap
    ops.Tpch.sqlTpchQ2(spark, dir).collect().foreach { r =>
      val (pk, u) = (r.getLong(3), r.getLong(4))
      assert(u === minByPart(pk), s"part $pk")
    }
  }

  test("sql_tpch_q11: every emitted part clears the exact cross-multiplied threshold; none missed") {
    val rows = ops.Tpch.sqlTpchQ11(spark, dir).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    val nat3 = num(spark.read.parquet(s"$dir/nation.parquet")
      .where(col("n_name") === "NATION_3").head(), 0)
    val supp3 = spark.read.parquet(s"$dir/supplier.parquet")
      .where(col("s_nationkey") === nat3).select("s_suppkey")
      .collect().map(num(_, 0)).toSet
    val v = li.where(col("l_suppkey").isin(supp3.toSeq: _*))
      .groupBy("l_partkey")
      .agg(sum(cents("l_extendedprice") * col("l_quantity").cast("long")).as("v"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val tot = v.values.sum
    val want = v.filter { case (_, vv) => vv * 10000 > tot }
    assert(rows === want)
  }

  test("sql_tpch_q20: emitted suppliers exactly those dominating a red part's 1996 supply") {
    val red = spark.read.parquet(s"$dir/part.parquet")
      .where(col("p_name").like("%red%")).select("p_partkey")
      .collect().map(num(_, 0)).toSet
    val y96 = li.where(col("l_shipdate") >= lit("1996-01-01") &&
        col("l_shipdate") < lit("1997-01-01"))
      .select(col("l_partkey"), col("l_suppkey"), col("l_quantity").cast("long").as("q"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    val perPart = y96.groupBy(_._1).view.mapValues(_.map(_._3).sum).toMap
    val dominators = y96.filter(t => red(t._1))
      .groupBy(t => (t._1, t._2)).view.mapValues(_.map(_._3).sum)
      .collect { case ((pk, sk), sq) if sq * 2 > perPart(pk) => sk }.toSet
    val nat9 = num(spark.read.parquet(s"$dir/nation.parquet")
      .where(col("n_name") === "NATION_9").head(), 0)
    val supp9 = spark.read.parquet(s"$dir/supplier.parquet")
      .where(col("s_nationkey") === nat9).select("s_suppkey")
      .collect().map(num(_, 0)).toSet
    val want = (dominators intersect supp9).toSeq.sorted
    val got = ops.Tpch.sqlTpchQ20(spark, dir).collect().map(_.getLong(0)).toSeq
    assert(got === want)
  }

  test("sql_tpch_q9: per-cell profit replays through the fluent API") {
    val part = spark.read.parquet(s"$dir/part.parquet").where(col("p_name").like("%red%"))
    val supp = spark.read.parquet(s"$dir/supplier.parquet")
    val nat = spark.read.parquet(s"$dir/nation.parquet")
    val exp = li.join(part, col("l_partkey") === col("p_partkey"))
      .join(supp, col("l_suppkey") === col("s_suppkey"))
      .join(ord, col("l_orderkey") === col("o_orderkey"))
      .join(nat, col("s_nationkey") === col("n_nationkey"))
      .groupBy(col("n_name"), year(col("o_orderdate")).as("oy"))
      .agg(sum(cents("l_extendedprice") * (lit(100) - cents("l_discount"))
        - col("l_quantity").cast("long") * cents("p_retailprice") * 80).as("p"))
      .collect().map(r => ((r.getString(0), r.getInt(1)), r.getLong(2))).toMap
    val got = ops.Tpch.sqlTpchQ9(spark, dir)
      .collect().map(r => ((r.getString(0), r.getInt(1)), r.getLong(2))).toMap
    assert(got === exp)
  }
}
