package graft.ops

import org.apache.spark.sql.{Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.functions._

import graft.io.Readers.table

/** UDF / UDAF surface (SURVEY §2.4 `agg_custom_aggregator`, §2.10).
  *
  * Built-ins are always preferred (codegen + pushdown); this module
  * demonstrates the extension points for when they run out. The typed
  * `Aggregator` compiles to a Catalyst TypedImperativeAggregate —
  * partial+final merge works across partitions, so it scales like any
  * built-in agg (no driver-side reduce).
  */
object Udx {

  import Relational.Q

  /** Exact decimal buffer: sums stay exact across partition merges;
    * the single double rounding happens once, in `finish` — matching
    * the oracle's CAST(SUM(decimal) AS DOUBLE)/CAST(SUM(decimal) AS
    * DOUBLE) to the bit (SURVEY §7.4).
    */
  final case class WAvgBuf(num: BigDecimal, den: BigDecimal)

  /** Weighted average price (weight = quantity) as a typed Aggregator.
    * Doubles are lifted to exact decimals via Double.toString (inputs
    * carry ≤2 decimal places — FIXTURES.md), so partial sums are exact
    * and merge order cannot change the result.
    */
  object WeightedAvgPrice extends Aggregator[(Double, Double), WAvgBuf, Double] {
    private def d(x: Double): BigDecimal = BigDecimal(java.math.BigDecimal.valueOf(x))
    override def zero: WAvgBuf = WAvgBuf(BigDecimal(0), BigDecimal(0))
    override def reduce(b: WAvgBuf, a: (Double, Double)): WAvgBuf =
      WAvgBuf(b.num + d(a._1) * d(a._2), b.den + d(a._2))
    override def merge(x: WAvgBuf, y: WAvgBuf): WAvgBuf =
      WAvgBuf(x.num + y.num, x.den + y.den)
    override def finish(b: WAvgBuf): Double =
      if (b.den.signum == 0) Double.NaN else b.num.toDouble / b.den.toDouble
    override def bufferEncoder: Encoder[WAvgBuf] = Encoders.product[WAvgBuf]
    override def outputEncoder: Encoder[Double] = Encoders.scalaDouble
  }

  /** Quantity-weighted average price per return flag via the UDAF. */
  val aggCustomAggregator: Q = (s, dir) => {
    val wavg = udaf(WeightedAvgPrice,
      Encoders.tuple(Encoders.scalaDouble, Encoders.scalaDouble))
    table(s, dir, "lineitem")
      .groupBy(col("l_returnflag"))
      .agg(wavg(col("l_extendedprice"), col("l_quantity")).as("wavg_price"),
           count(lit(1)).as("n_items"))
      .orderBy("l_returnflag")
  }

  /** Scalar UDF demonstration: canonical whitespace + case fold for
    * dedup keys. The logic is deliberately SQL-replicable (trim /
    * regexp_replace / lower) so it stays oracle-checkable; a real
    * deployment would use the built-ins directly (codegen'd).
    */
  private val normalizeText: String => String = s =>
    if (s == null) null
    else s.trim.toLowerCase.replaceAll("\\s+", " ")

  val udfScalarNormalize: Q = (s, dir) => {
    val norm = udf(normalizeText)
    // evaluate the UDF once per row and derive the length from the
    // result column — UDFs are eval blackboxes to Catalyst, so naming
    // the same call twice would run it twice
    table(s, dir, "documents")
      .select(col("doc_id"), norm(col("text")).as("norm_text"))
      .withColumn("norm_len", length(col("norm_text")))
      .orderBy("doc_id")
  }

  val queries: Map[String, Q] = Map(
    "agg_custom_aggregator" -> aggCustomAggregator,
    "udf_scalar_normalize" -> udfScalarNormalize,
  )
}
