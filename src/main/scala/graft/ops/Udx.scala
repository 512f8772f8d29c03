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

  /** Misra–Gries heavy-hitter summary as a typed Aggregator (round 6):
    * a bounded `k-1`-entry counter map per partial, merged with the
    * Agarwal et al. "Mergeable Summaries" rule (sum, then subtract the
    * k-th largest count and drop non-positives). Guarantee: every item
    * with true frequency > N/k survives every partial AND every merge —
    * no false negatives, regardless of partitioning. Memory is O(k)
    * per task at ANY data scale; the exact GROUP BY it replaces needs
    * a vocabulary-sized shuffle.
    *
    * Buffers are java.util.HashMap under the kryo encoder (chill/kryo
    * round-trips Java collections natively; TypedImperativeAggregate
    * permits in-place buffer mutation).
    */
  final class MisraGries(k: Int)
      extends Aggregator[String, java.util.HashMap[String, java.lang.Long],
        java.util.HashMap[String, java.lang.Long]] {
    type Buf = java.util.HashMap[String, java.lang.Long]
    override def zero: Buf = new java.util.HashMap[String, java.lang.Long]()
    override def reduce(b: Buf, tok: String): Buf = {
      val c = b.get(tok)
      if (c != null) b.put(tok, c + 1L)
      else if (b.size < k - 1) b.put(tok, 1L)
      else { // decrement-all: happens ≤ N/k times total, amortized O(1)
        val it = b.entrySet().iterator()
        while (it.hasNext) {
          val e = it.next()
          if (e.getValue == 1L) it.remove() else e.setValue(e.getValue - 1L)
        }
      }
      b
    }
    override def merge(x: Buf, y: Buf): Buf = {
      y.forEach { (t, c) =>
        val cur = x.get(t)
        x.put(t, if (cur == null) c else cur + c)
      }
      if (x.size > k - 1) {
        // subtract the k-th largest count; ≤ k-1 strictly-larger entries survive
        val vals = new java.util.ArrayList[java.lang.Long](x.values())
        java.util.Collections.sort(vals, java.util.Collections.reverseOrder())
        val kth = vals.get(k - 1).longValue()
        val it = x.entrySet().iterator()
        while (it.hasNext) {
          val e = it.next()
          if (e.getValue <= kth) it.remove() else e.setValue(e.getValue - kth)
        }
      }
      x
    }
    override def finish(b: Buf): Buf = b
    override def bufferEncoder: Encoder[Buf] = Encoders.kryo[Buf]
    override def outputEncoder: Encoder[Buf] = Encoders.kryo[Buf]
  }

  /** One-pass bounded-memory candidate set over a token stream: the
    * distributed MG pass returns ≤ k-1 candidates to the driver —
    * O(k), never vocabulary-sized.
    */
  def mgCandidates(tok: org.apache.spark.sql.DataFrame, k: Int): Seq[String] = {
    val spark = tok.sparkSession
    import spark.implicits._
    val summary = tok.as[String].select(new MisraGries(k).toColumn).head()
    summary.keySet().toArray(Array.empty[String]).toSeq
  }

  /** Exact heavy hitters (freq > N/k) via the classic two-pass shape:
    * pass 1 is the bounded-memory MG sketch (candidates, no false
    * negatives), pass 2 recounts ONLY the ≤ k-1 candidates exactly and
    * applies the threshold — so the result is exact and oracle-able
    * while per-task memory stays O(k). The exact-GROUP-BY oracle is
    * the semantics; the sketch is how those semantics survive an
    * unbounded vocabulary at 100 TB (the candidate filter prunes the
    * shuffle to candidate rows only).
    */
  val aggHeavyHitters: Q = (s, dir) => {
    val k = 50
    val toks = split(lower(regexp_replace(trim(col("text")), "\\s+", " ")), " ")
    val tok = table(s, dir, "documents")
      .filter(trim(col("text")) =!= "")
      .select(explode(toks).as("tok"))
      .filter(col("tok") =!= "")
    val cands = mgCandidates(tok, k)
    val nTotal = tok.count()
    tok.filter(col("tok").isin(cands: _*))
      .groupBy(col("tok"))
      .agg(count(lit(1)).as("c"))
      .filter(col("c") * k > nTotal)
      .orderBy("tok")
  }

  /** Count-min sketch as a typed Aggregator (round 7 — completes the
    * sketch family next to HLL and Misra–Gries): a depth×width grid
    * of counters; each item increments one counter per row (pairwise
    * hashes via the Kirsch–Mitzenmacher h1 + i·h2 construction), and
    * a point-frequency estimate is the MINIMUM over the rows.
    * Merge is elementwise sum — fully mergeable, so partials combine
    * across partitions/days like any built-in agg. Guarantees (Cormode
    * & Muthukrishnan): est ≥ true always (one-sided), and
    * est ≤ true + (e/width)·N with probability ≥ 1 − e^−depth —
    * prop-tested against exact counts over the whole vocabulary.
    * Memory is O(depth·width) longs per task at ANY scale; the exact
    * GROUP BY it stands in for shuffles the full vocabulary.
    */
  final class CountMin(depth: Int, width: Int)
      extends Aggregator[String, Array[Long], Array[Long]] {
    override def zero: Array[Long] = new Array[Long](depth * width)
    @inline private[graft] def cellOf(row: Int, tok: String): Int = {
      val h1 = scala.util.hashing.MurmurHash3.stringHash(tok, 0x9747b28c)
      val h2 = scala.util.hashing.MurmurHash3.stringHash(tok, 0x85ebca6b) | 1
      val h = h1.toLong + row.toLong * h2.toLong
      row * width + (((h % width) + width) % width).toInt
    }
    override def reduce(b: Array[Long], tok: String): Array[Long] = {
      var r = 0
      while (r < depth) { b(cellOf(r, tok)) += 1L; r += 1 }
      b
    }
    override def merge(x: Array[Long], y: Array[Long]): Array[Long] = {
      var i = 0
      while (i < x.length) { x(i) += y(i); i += 1 }
      x
    }
    override def finish(b: Array[Long]): Array[Long] = b
    override def bufferEncoder: Encoder[Array[Long]] = Encoders.kryo[Array[Long]]
    override def outputEncoder: Encoder[Array[Long]] = Encoders.kryo[Array[Long]]
  }

  /** Point-frequency estimate from a finished sketch: min over rows. */
  def cmEstimate(sk: Array[Long], depth: Int, width: Int, tok: String): Long = {
    val probe = new CountMin(depth, width)
    var best = Long.MaxValue
    var r = 0
    while (r < depth) {
      val c = sk(probe.cellOf(r, tok))
      if (c < best) best = c
      r += 1
    }
    best
  }

  /** Build a sketch over a single string column — the sketch itself is
    * the only driver-side value: depth·width longs, bounded at any
    * data scale (same O(k) discipline as [[mgCandidates]]).
    */
  def cmSketch(tok: org.apache.spark.sql.DataFrame, depth: Int, width: Int): Array[Long] = {
    val spark = tok.sparkSession
    import spark.implicits._
    tok.as[String].select(new CountMin(depth, width).toColumn).head()
  }

  /** Point-frequency estimation demo: sketch the document token stream
    * once (bounded memory), then report the count-min estimate beside
    * the exact count for the 30 most frequent tokens. `cm_est ≥
    * exact_c` always; the prop spec bounds the overestimate at the
    * ε·N guarantee over the ENTIRE vocabulary. Approximate/seeded →
    * no oracle (SURVEY §7.4).
    */
  val aggCountMin: Q = (s, dir) => {
    val depth = 5
    val width = 4096
    val toks = split(lower(regexp_replace(trim(col("text")), "\\s+", " ")), " ")
    val tok = table(s, dir, "documents")
      .filter(trim(col("text")) =!= "")
      .select(explode(toks).as("tok"))
      .filter(col("tok") =!= "")
    val sk = cmSketch(tok, depth, width)
    val est = udf((t: String) => cmEstimate(sk, depth, width, t))
    tok.groupBy(col("tok"))
      .agg(count(lit(1)).as("exact_c"))
      .orderBy(col("exact_c").desc, col("tok").asc)
      .limit(30)
      .withColumn("cm_est", est(col("tok")))
      .orderBy("tok")
  }

  /** Mergeable rank/quantile sketch (round 8 — completes the sketch
    * family's missing axis next to HLL-distinct, Misra–Gries
    * heavy-hitters and count-min point-frequency): the low-rank
    * compaction lineage (Manku–Rajagopalan–Lindsay → Agarwal et al.
    * "Mergeable Summaries" → Karnin–Lang–Liberty). A hierarchy of
    * level buffers where level i holds items of weight 2^i; a full
    * level sorts, keeps alternate items (promoted to weight 2^{i+1}),
    * and the alternation offset flips per level per compaction, so
    * successive compaction errors cancel rather than accumulate
    * one-sided. An odd leftover item stays at its level — total
    * weight is conserved EXACTLY (Σᵢ 2^i·|levelᵢ| == n, asserted in
    * KllSpec), so quantile targets q·n never drift.
    *
    * SELF-CERTIFYING: one compaction at level i shifts any rank by at
    * most 2^i (the kept-alternate count of items below any threshold
    * differs from half the true count by ≤ 1), so the sketch carries
    * `errBound` = Σ per-compaction 2^i — an exact worst-case rank
    * error certificate for every query answered from it, valid under
    * ANY partitioning/merge order. KllSpec asserts true rank error
    * ≤ errBound over the full value set AND errBound ≤ n·(log₂(n/k)
    * +2)/k, under 1/7/32-partition layouts and both merge
    * associations. Deterministic (no seed): same input multiset in
    * the same arrival order → same sketch.
    *
    * Memory is O(k·log(n/k)) doubles per task at ANY scale; merge is
    * level-wise concatenation + re-compaction, so per-day sketches
    * persist and combine exactly like `agg_hll_sketch_merge`'s HLLs —
    * the 100 TB percentile-service shape (sketch each partition/day
    * once, answer any later quantile query from the tiny merged
    * state, never rescan history).
    */
  final class KllBuf(val k: Int) extends Serializable {
    import scala.collection.mutable.ArrayBuffer
    var n: Long = 0L
    var errBound: Long = 0L
    // levels(i): unsorted items of weight 2^i
    val levels: ArrayBuffer[ArrayBuffer[Double]] = ArrayBuffer(ArrayBuffer.empty[Double])
    private val flips: ArrayBuffer[Boolean] = ArrayBuffer(false)

    private def ensureLevel(i: Int): Unit =
      while (levels.size <= i) { levels += ArrayBuffer.empty[Double]; flips += false }

    private def compactLevel(i: Int): Unit = {
      val buf = levels(i).toArray
      java.util.Arrays.sort(buf)
      val even = buf.length & ~1
      ensureLevel(i + 1)
      val start = if (flips(i)) 1 else 0
      flips(i) = !flips(i)
      var j = start
      while (j < even) { levels(i + 1) += buf(j); j += 2 }
      levels(i).clear()
      // odd leftover keeps its level and weight — exact conservation
      if (even < buf.length) levels(i) += buf(buf.length - 1)
      errBound += 1L << i
    }

    private def compactCascade(): Unit = {
      var i = 0
      while (i < levels.size) {
        if (levels(i).size >= k) compactLevel(i)
        i += 1
      }
    }

    def update(x: Double): Unit = {
      levels(0) += x
      n += 1
      if (levels(0).size >= k) compactCascade()
    }

    def mergeWith(o: KllBuf): KllBuf = {
      require(o.k == k, s"cannot merge KLL sketches with k=$k and k=${o.k}")
      n += o.n
      errBound += o.errBound
      var i = 0
      while (i < o.levels.size) { ensureLevel(i); levels(i) ++= o.levels(i); i += 1 }
      compactCascade()
      this
    }

    /** Estimated weight of items strictly below x (±errBound). */
    def rankOf(x: Double): Long = {
      var w = 0L
      var i = 0
      while (i < levels.size) {
        val lvl = levels(i)
        var j = 0
        var c = 0L
        while (j < lvl.size) { if (lvl(j) < x) c += 1; j += 1 }
        w += c << i
        i += 1
      }
      w
    }

    /** Stable binary codec for PERSISTENCE (kryo is a shuffle
      * format, not a storage contract): k, n, errBound, levels,
      * alternation flips — everything [[mergeWith]] needs, so a
      * decoded sketch keeps merging (and keeps its error
      * certificate) exactly where the encoded one stopped.
      */
    def toBytes: Array[Byte] = {
      val bos = new java.io.ByteArrayOutputStream()
      val out = new java.io.DataOutputStream(bos)
      out.writeInt(k); out.writeLong(n); out.writeLong(errBound)
      out.writeInt(levels.size)
      levels.foreach { lvl =>
        out.writeInt(lvl.size)
        lvl.foreach(out.writeDouble)
      }
      flips.foreach(out.writeBoolean)
      out.flush()
      bos.toByteArray
    }

    private[Udx] def readFrom(in: java.io.DataInputStream): Unit = {
      n = in.readLong(); errBound = in.readLong()
      val nl = in.readInt()
      levels.clear(); flips.clear()
      (0 until nl).foreach { _ =>
        val sz = in.readInt()
        val lvl = ArrayBuffer.empty[Double]
        (0 until sz).foreach(_ => lvl += in.readDouble())
        levels += lvl
      }
      (0 until nl).foreach(_ => flips += in.readBoolean())
    }

    /** Smallest stored item whose cumulative weight reaches q·n. */
    def quantile(q: Double): Double = {
      require(n > 0, "empty sketch")
      val items = ArrayBuffer.empty[(Double, Long)]
      var i = 0
      while (i < levels.size) {
        levels(i).foreach(v => items += ((v, 1L << i)))
        i += 1
      }
      val sorted = items.sortBy(_._1)
      val target = math.max(1L, math.ceil(q * n).toLong)
      var cum = 0L
      var idx = 0
      while (idx < sorted.size - 1 && cum + sorted(idx)._2 < target) {
        cum += sorted(idx)._2
        idx += 1
      }
      sorted(idx)._1
    }
  }

  /** Column-level KLL as a typed Aggregator — partials compact
    * per-partition, merge is the sketch merge: a Catalyst
    * TypedImperativeAggregate with O(k log(n/k)) state, like any
    * built-in agg (no driver-side reduce).
    */
  final class KllQuantiles(k: Int) extends Aggregator[Double, KllBuf, KllBuf] {
    override def zero: KllBuf = new KllBuf(k)
    override def reduce(b: KllBuf, x: Double): KllBuf = { b.update(x); b }
    override def merge(x: KllBuf, y: KllBuf): KllBuf = x.mergeWith(y)
    override def finish(b: KllBuf): KllBuf = b
    override def bufferEncoder: Encoder[KllBuf] = Encoders.kryo[KllBuf]
    override def outputEncoder: Encoder[KllBuf] = Encoders.kryo[KllBuf]
  }

  /** Second-level aggregator over ALREADY-BUILT sketches — the
    * merge-across-days path ([[aggKllQuantiles]] feeds per-day
    * sketches through it; a persisted-percentile service would store
    * the day sketches and run only this).
    */
  final class KllMerge(k: Int) extends Aggregator[KllBuf, KllBuf, KllBuf] {
    override def zero: KllBuf = new KllBuf(k)
    override def reduce(b: KllBuf, s: KllBuf): KllBuf = b.mergeWith(s)
    override def merge(x: KllBuf, y: KllBuf): KllBuf = x.mergeWith(y)
    override def finish(b: KllBuf): KllBuf = b
    override def bufferEncoder: Encoder[KllBuf] = Encoders.kryo[KllBuf]
    override def outputEncoder: Encoder[KllBuf] = Encoders.kryo[KllBuf]
  }

  /** Sketch a single double column distributed; the returned sketch is
    * the only driver-side value — O(k log(n/k)), bounded at any data
    * scale (the [[mgCandidates]]/[[cmSketch]] discipline).
    */
  /** Decode a [[KllBuf.toBytes]] payload (see codec notes there). */
  def kllFromBytes(bytes: Array[Byte]): KllBuf = {
    val in = new java.io.DataInputStream(new java.io.ByteArrayInputStream(bytes))
    val k = in.readInt()
    val b = new KllBuf(k)
    b.readFrom(in)
    b
  }

  def kllSketch(values: org.apache.spark.sql.DataFrame, k: Int = 256): KllBuf = {
    val spark = values.sparkSession
    import spark.implicits._
    values.as[Double].select(new KllQuantiles(k).toColumn).head()
  }

  /** Quantile service demo: per-day KLL sketches of the event value
    * stream (one distributed agg), merged into a whole-history sketch
    * by a SECOND aggregation over the day sketches alone — the
    * mergeability that `percentile_approx` (single-shot, in-query)
    * cannot give. Reports the merged estimate beside the exact
    * percentile for seven ranks; approx → no oracle (SURVEY §7.4),
    * KllSpec carries the certified error-bound properties.
    */
  val aggKllQuantiles: Q = (s, dir) => {
    import s.implicits._
    val k = 256
    val vals = table(s, dir, "events").select(col("value"))
    // per-day sketches (distributed partials within each day)…
    val udafKll = udaf(new KllQuantiles(k), Encoders.scalaDouble)
    val perDay = table(s, dir, "events")
      .groupBy(to_date(col("ts")).as("day"))
      .agg(udafKll(col("value")).as("sk"))
    // …merged across days: only the tiny sketch rows move
    implicit val kllEnc: Encoder[KllBuf] = Encoders.kryo[KllBuf]
    val merged = perDay.select(col("sk")).as[KllBuf]
      .select(new KllMerge(k).toColumn).head()
    val qs = Seq(0.01, 0.10, 0.25, 0.50, 0.75, 0.90, 0.99)
    val exact = vals.agg(
      expr(s"percentile(value, array(${qs.mkString(",")}))").as("ex"))
      .head().getSeq[Double](0)
    qs.zip(exact).map { case (q, ex) =>
      (q, merged.quantile(q), ex, merged.errBound.toDouble / merged.n)
    }.toDF("q", "kll_est", "exact_pctl", "rank_eps_bound")
      .orderBy("q")
  }

  val queries: Map[String, Q] = Map(
    "agg_custom_aggregator" -> aggCustomAggregator,
    "udf_scalar_normalize" -> udfScalarNormalize,
    "agg_heavy_hitters" -> aggHeavyHitters,
    "agg_count_min" -> aggCountMin,
    "agg_kll_quantiles" -> aggKllQuantiles,
  )
}
