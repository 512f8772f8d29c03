package graft

import org.apache.spark.sql.functions._

/** Round-6 third wave: substring-span dedup, Gopher rules, BPE pair
  * counts, label centroids, integer PageRank.
  */
class Curation2Spec extends SparkSpec {
  import spark.implicits._

  private val dir = "/root/testdata/sf0.001"

  /** Reference order-sequence edges: successor in each order's
    * (linenumber, partkey) sort — mirrors Graph.orderSequenceEdges.
    */
  private def referenceEdges(li: Array[(Long, Int, Long)]): Set[(Long, Long)] =
    li.groupBy(_._1).values.toSeq.flatMap { lines =>
      val seq = lines.toSeq.sortBy(x => (x._2, x._3)).map(_._3)
      seq.zip(seq.drop(1)).filter { case (a, b) => a != b }
    }.toSet

  private def toksOf(dir: String): Map[Long, (String, Array[String])] =
    io.Readers.table(spark, dir, "documents")
      .filter(trim(col("text")) =!= "")
      .select(col("doc_id"), col("lang"), split(trim(col("text")), "\\s+").as("toks"))
      .as[(Long, String, Array[String])].collect()
      .map { case (id, lang, t) => id -> (lang, t) }.toMap

  // --------------------------------------------- substring spans

  test("dedup_substring_span spans are real, exact, and maximal") {
    // sf0.01 — sf0.001 may not contain planted long spans
    val big = "/root/testdata/sf0.01"
    val out = ops.Curation2.dedupSubstringSpan(spark, big).collect()
    assert(out.nonEmpty, "expected shared spans in the sf0.01 corpus")
    val docs = toksOf(big)
    out.foreach { r =>
      val (aLang, aToks) = docs(r.getLong(1))
      val (bLang, bToks) = docs(r.getLong(2))
      val (aStart, bStart) = (r.getInt(3), r.getInt(4))
      val span = r.getLong(5).toInt
      assert(aLang == r.getString(0) && bLang == r.getString(0))
      // the reported span really is token-identical
      assert(aToks.slice(aStart, aStart + span)
        .sameElements(bToks.slice(bStart, bStart + span)))
      // maximality: extending one token either way breaks it
      if (aStart > 0 && bStart > 0)
        assert(aToks(aStart - 1) != bToks(bStart - 1), s"span $r extends left")
      if (aStart + span < aToks.length && bStart + span < bToks.length)
        assert(aToks(aStart + span) != bToks(bStart + span), s"span $r extends right")
      assert(span >= 4)
    }
  }

  test("sharedSpans: hashed branch equals the exact branch on corpus and fixtures") {
    // round 16 — the volume-gated join-key dispatch: both branches
    // must emit the identical span set (the hashed branch's slice
    // verify restores exactness; collisions at 2^-64 cannot occur at
    // this scale)
    def docsOf(df: org.apache.spark.sql.DataFrame) = df
      .filter(trim(col("text")) =!= "")
      .select(col("doc_id"), col("lang"), split(trim(col("text")), "\\s+").as("toks"))
      .filter(size(col("toks")) >= 4)
    def w(tag: String, n: Int): Seq[String] = (1 to n).map(i => s"$tag$i")
    val shared = w("dup", 8)
    val fixture = Seq(
      (1L, "en", (w("a", 4) ++ shared ++ w("b", 4)).mkString(" ")),
      (2L, "en", (w("c", 6) ++ shared ++ w("d", 2)).mkString(" ")),
      (3L, "de", (w("e", 3) ++ shared ++ w("f", 5) ++ shared ++ w("g", 2)).mkString(" ")), // other lang: no cross-lang span
      (4L, "en", (shared.take(4) ++ w("h", 7)).mkString(" ")), // exactly-4-token span at pos 0
      (5L, "en", w("solo", 9).mkString(" ")),
      (6L, "en", w("tiny", 3).mkString(" "))) // under the 4-token floor
      .toDF("doc_id", "lang", "text")
    val corpus = io.Readers.table(spark, "/root/testdata/sf0.01", "documents")
    Seq(fixture -> "fixture", corpus -> "sf0.01").foreach { case (df, label) =>
      val d = docsOf(df)
      val exact = ops.Curation2.sharedSpans(d, hashed = false)
        .as[(String, Long, Long, Int, Int, Long)].collect().toSet
      val hashed = ops.Curation2.sharedSpans(d, hashed = true)
        .as[(String, Long, Long, Int, Int, Long)].collect().toSet
      assert(exact === hashed, s"branch outputs must be identical on $label")
      if (label == "fixture") {
        // en-block spans only: 1-2 (8 toks), 1-4/2-4 (4-tok prefix)
        assert(exact.contains(("en", 1L, 2L, 4, 6, 8L)))
        assert(exact.exists(r => r._2 == 1L && r._3 == 4L && r._6 == 4L))
        assert(!exact.exists(r => r._2 == 3L || r._3 == 3L), "cross-lang span leaked")
        assert(!exact.exists(r => r._2 == 6L || r._3 == 6L))
      }
    }
  }

  test("dedup_substring_span 4-gram spine replays the r15 3-gram form exactly") {
    // round 16 spine swap: maximal runs of >=2 shared 3-grams and
    // >=1 shared 4-grams are the SAME maximal >=4-token spans — the
    // old form, rebuilt verbatim here, must emit the identical set
    import org.apache.spark.sql.expressions.Window
    val big = "/root/testdata/sf0.01"
    val toks = split(trim(col("text")), "\\s+")
    val d = io.Readers.table(spark, big, "documents")
      .filter(trim(col("text")) =!= "")
      .select(col("doc_id"), col("lang"), toks.as("toks"))
      .filter(size(col("toks")) >= 3)
    val g = d.select(col("doc_id"), col("lang"),
        explode(transform(sequence(lit(0), size(col("toks")) - 3),
          i => struct(i.as("pos"),
            concat_ws(" ", slice(col("toks"), i + 1, lit(3))).as("gram")))).as("pg"))
      .select(col("doc_id"), col("lang"), col("pg.pos").as("pos"), col("pg.gram").as("gram"))
    val b = g.select(col("lang").as("b_lang"), col("gram").as("b_gram"),
      col("doc_id").as("b_id"), col("pos").as("b_pos"))
    val pairs = g.join(b,
        col("lang") === col("b_lang") && col("gram") === col("b_gram") &&
          col("doc_id") < col("b_id"))
      .select(col("lang"), col("doc_id").as("a_id"), col("b_id"),
        col("pos").as("a_pos"), (col("pos") - col("b_pos")).as("diag"))
    val wi = Window.partitionBy(col("a_id"), col("b_id"), col("diag"))
      .orderBy(col("a_pos"))
    val old = pairs.withColumn("isl", col("a_pos") - row_number().over(wi))
      .groupBy(col("lang"), col("a_id"), col("b_id"), col("diag"), col("isl"))
      .agg(min(col("a_pos")).as("a_start"), count(lit(1)).as("run"))
      .filter(col("run") >= 2)
      .select(col("lang"), col("a_id"), col("b_id"), col("a_start"),
        (col("a_start") - col("diag")).as("b_start"),
        (col("run") + 2).as("span_toks"))
      .as[(String, Long, Long, Int, Int, Long)].collect().toSet
    val now = ops.Curation2.dedupSubstringSpan(spark, big)
      .as[(String, Long, Long, Int, Int, Long)].collect().toSet
    assert(now === old)
    assert(now.nonEmpty)
  }

  // ------------------------------------------ substring-span removal

  test("dedup_substring_remove cuts exactly the planted span from the larger doc, merging overlaps") {
    def w(tag: String, n: Int): Seq[String] = (1 to n).map(i => s"$tag$i")
    val shared = w("dup", 8)
    // doc 1 carries the canonical copy; docs 2 and 3 each embed it —
    // doc 3 TWICE, so the per-doc interval handling is exercised
    val d1 = (w("a", 4) ++ shared ++ w("b", 4)).mkString(" ")
    val d2 = (w("c", 6) ++ shared ++ w("d", 2)).mkString(" ")
    val d3 = (w("e", 3) ++ shared ++ w("f", 5) ++ shared ++ w("g", 2)).mkString(" ")
    val corpus = Seq((1L, "en", d1), (2L, "en", d2), (3L, "en", d3))
      .toDF("doc_id", "lang", "text")
    val out = ops.Curation2.removeSpans(corpus).orderBy("doc_id")
      .as[(Long, String, String, Long, Long)].collect()
    val byId = out.map(r => r._1 -> r).toMap
    // smallest id keeps its copy untouched
    assert(byId(1L)._3 === d1 && byId(1L)._4 === 0L && byId(1L)._5 === 0L)
    // doc 2: the shared block is gone, its own words remain in order
    assert(byId(2L)._3 === (w("c", 6) ++ w("d", 2)).mkString(" "),
      s"doc 2 must lose exactly the shared span: ${byId(2L)._3}")
    assert(byId(2L)._5 === 8L)
    // doc 3: BOTH embedded copies cut, own words intact
    assert(byId(3L)._3 === (w("e", 3) ++ w("f", 5) ++ w("g", 2)).mkString(" "),
      s"doc 3 must lose both copies: ${byId(3L)._3}")
    assert(byId(3L)._5 === 16L)
    // provenance counts merged intervals, not raw pair spans
    assert(byId(3L)._4 === 2L)
  }

  test("dedup_substring_remove: identical intervals from multiple partners count as ONE cut") {
    // the round-9 oracle-determinism regression in fixture form: docs 1
    // AND 2 each carry the span doc 3 embeds, so doc 3 accumulates TWO
    // IDENTICAL (lo, hi) cut intervals — which must dedupe before the
    // island merge (n_spans_cut = 1, toks_removed = span length, not 2×)
    def w(tag: String, n: Int): Seq[String] = (1 to n).map(i => s"$tag$i")
    val shared = w("dup", 8)
    val corpus = Seq(
      (1L, "en", (w("a", 4) ++ shared).mkString(" ")),
      (2L, "en", (w("b", 5) ++ shared).mkString(" ")),
      (3L, "en", (w("c", 3) ++ shared ++ w("d", 2)).mkString(" "))
    ).toDF("doc_id", "lang", "text")
    val out = ops.Curation2.removeSpans(corpus).orderBy("doc_id")
      .as[(Long, String, String, Long, Long)].collect()
    val byId = out.map(r => r._1 -> r).toMap
    assert(byId(3L)._3 === (w("c", 3) ++ w("d", 2)).mkString(" "), byId(3L)._3)
    assert(byId(3L)._4 === 1L, s"duplicate partner intervals must merge to one cut: ${byId(3L)._4}")
    assert(byId(3L)._5 === 8L, s"toks_removed must not double-count: ${byId(3L)._5}")
    // doc 2 also loses its copy to doc 1 (a_id < b_id policy)
    assert(byId(2L)._3 === w("b", 5).mkString(" "))
    assert(byId(1L)._4 === 0L)
  }

  test("dedup_substring_remove is idempotent on planted fixtures and the real corpus") {
    def runOnce(docs: org.apache.spark.sql.DataFrame) =
      ops.Curation2.removeSpans(docs)
        .select(col("doc_id"), col("lang"), col("clean_text").as("text"))
    def w(tag: String, n: Int): Seq[String] = (1 to n).map(i => s"$tag$i")
    val shared = w("dup", 8)
    val fixture = Seq(
      (1L, "en", (w("a", 4) ++ shared ++ w("b", 4)).mkString(" ")),
      (2L, "en", (w("c", 6) ++ shared ++ w("d", 2)).mkString(" ")),
      (3L, "en", (w("e", 3) ++ shared ++ w("f", 5) ++ shared ++ w("g", 2)).mkString(" ")))
      .toDF("doc_id", "lang", "text")
    Seq(fixture -> "fixture",
        io.Readers.table(spark, dir, "documents")
          .select("doc_id", "lang", "text") -> "corpus").foreach { case (docs, label) =>
      val once = runOnce(docs)
      val onceRows = once.orderBy("doc_id")
        .as[(Long, String, String)].collect().toSeq
      val twiceRows = runOnce(once).orderBy("doc_id")
        .as[(Long, String, String)].collect().toSeq
      // a doc whose text was ENTIRELY duplicated content leaves the
      // corpus (empty text — the operator's domain is non-empty docs);
      // on the remaining docs the second pass must change nothing
      assert(twiceRows === onceRows.filter(_._3.nonEmpty),
        s"remove∘remove must equal remove on $label")
    }
  }

  test("dedup_substring_remove pipes every doc through and conserves untouched text") {
    val out = ops.Curation2.dedupSubstringRemove(spark, dir)
      .as[(Long, String, String, Long, Long)].collect()
    val docs = toksOf(dir)
    assert(out.length === docs.size, "every non-empty doc must appear")
    out.foreach { case (id, _, clean, nCut, removed) =>
      val orig = docs(id)._2
      val cleanToks = if (clean.isEmpty) Array.empty[String] else clean.split(" ")
      assert(cleanToks.length === orig.length - removed,
        s"doc $id: token accounting must be exact")
      if (nCut == 0L) assert(clean === orig.mkString(" "),
        s"untouched doc $id must pass through verbatim")
      // kept tokens are a subsequence of the original
      var j = 0
      cleanToks.foreach { t =>
        while (j < orig.length && orig(j) != t) j += 1
        assert(j < orig.length, s"doc $id: '$t' out of order vs original")
        j += 1
      }
    }
  }

  // ------------------------------------------------- Gopher rules

  test("text_gopher_rules matches a direct recomputation") {
    val out = ops.Curation2.textGopherRules(spark, dir).collect()
    val docs = toksOf(dir)
    val stop = Set("the", "a", "of", "and", "to", "in", "is", "that")
    assert(out.nonEmpty)
    var passes = 0
    out.foreach { r =>
      val toks = docs(r.getLong(0))._2
      val n = toks.length
      val mwl = toks.map(_.length).sum.toDouble / n
      val nAlpha = toks.count(_.exists(c => c >= 'a' && c <= 'z'))
      val nStop = toks.toSet.intersect(stop).size
      assert(r.getInt(1) == n)
      assert(math.abs(r.getDouble(2) - mwl) < 1e-12)
      assert(r.getBoolean(3) == (n >= 15))
      assert(r.getBoolean(4) == (mwl >= 4.0 && mwl <= 10.0))
      assert(r.getBoolean(5) == (nAlpha * 5 >= n * 4))
      assert(r.getBoolean(6) == (nStop >= 2))
      assert(r.getBoolean(7) ==
        (r.getBoolean(3) && r.getBoolean(4) && r.getBoolean(5) && r.getBoolean(6)))
      if (r.getBoolean(7)) passes += 1
    }
    // thresholds were chosen to discriminate: both outcomes occur
    assert(passes > 0 && passes < out.length)
  }

  // ---------------------------------------------- BPE pair counts

  test("text_bpe_pairs equals brute-force pair counting") {
    val out = ops.Curation2.textBpePairs(spark, dir).collect()
      .map(r => r.getString(0) -> r.getLong(1))
    val counts = scala.collection.mutable.Map.empty[String, Long]
    toksOf(dir).values.foreach { case (_, toks) =>
      toks.filter(_.length >= 2).foreach { w =>
        (0 until w.length - 1).foreach { i =>
          val p = w.substring(i, i + 2)
          counts(p) = counts.getOrElse(p, 0L) + 1
        }
      }
    }
    val truth = counts.toSeq.sortBy { case (p, c) => (-c, p) }.take(50)
    assert(out.toSeq == truth)
  }

  // ------------------------------------------------ label centroid

  test("sim_centroid_label equals the quantized driver-side mean") {
    val out = ops.Curation2.simCentroidLabel(spark, dir).collect()
      .map(r => (r.getInt(0), r.getInt(1)) -> r.getDouble(2)).toMap
    val vecs = io.Readers.table(spark, dir, "embeddings")
      .select(col("label"), col("embedding"))
      .as[(Int, Array[Float])].collect()
    vecs.groupBy(_._1).foreach { case (label, xs) =>
      val dim = xs.head._2.length
      (0 until dim).foreach { pos =>
        val qs = xs.map(v => math.floor(v._2(pos).toDouble * 1000000).toLong)
        val expect = qs.sum.toDouble / (qs.length.toDouble * 1000000)
        assert(math.abs(out((label, pos)) - expect) < 1e-15,
          s"label=$label pos=$pos")
      }
    }
  }

  // ------------------------------------- quality-weighted sampling

  test("sample_quality_weighted admission rate tracks the quality score") {
    val out = ops.Curation2.sampleQualityWeighted(spark, dir).collect()
    assert(out.nonEmpty)
    // kept rows satisfy the admission inequality exactly
    out.foreach { r =>
      assert(r.getLong(2) < r.getInt(1).toLong * 25,
        s"doc ${r.getLong(0)} bucket ${r.getLong(2)} score ${r.getInt(1)}")
    }
    // composition independence: admission bucket is uncorrelated with
    // the split bucket (different salt) — kept docs span all splits
    val rules = ops.Curation2.textGopherRules(spark, dir).collect()
      .map(r => r.getLong(0) ->
        Seq(3, 4, 5, 6).count(i => r.getBoolean(i))).toMap
    out.foreach { r => assert(rules(r.getLong(0)) == r.getInt(1)) }
    val splits = ops.Llm.sampleHashSplit(spark, dir).collect()
      .map(r => r.getLong(0) -> r.getString(3)).toMap
    val keptSplits = out.map(r => splits(r.getLong(0))).toSet
    assert(keptSplits.size >= 2, "quality sampling starved entire splits")
  }

  // -------------------------------------------------- readability

  test("text_readability matches a driver-side recomputation") {
    val out = ops.Curation2.textReadability(spark, dir).collect()
    assert(out.nonEmpty)
    val docs = toksOf(dir)
    out.foreach { r =>
      val toks = docs(r.getLong(0))._2
      val syll = toks.map { w =>
        math.max(w.split("[aeiou]+", -1).length - 1, 1)
      }.sum
      assert(r.getInt(1) == toks.length)
      assert(r.getInt(2) == syll, s"doc ${r.getLong(0)}")
      val score = 206.835 - 1.015 * toks.length - 84.6 * (syll.toDouble / toks.length)
      assert(r.getLong(3) == math.floor(score * 10000).toLong, s"doc ${r.getLong(0)}")
    }
  }

  // ----------------------------------------------------- PageRank

  test("graph_pagerank matches a driver-side integer reference") {
    val got = ops.Graph.graphPagerank(spark, dir).collect()
      .map(r => r.getLong(0) -> r.getDouble(1))
    assert(got.length > 0 && got.length <= 20)
    // reference: same integer arithmetic, plain Scala
    val li = io.Readers.table(spark, dir, "lineitem")
      .select("l_orderkey", "l_linenumber", "l_partkey")
      .as[(Long, Int, Long)].collect()
    val edges: Set[(Long, Long)] = referenceEdges(li)
    val nodes = edges.flatMap(e => Seq(e._1, e._2))
    val n = nodes.size
    val outDeg = edges.groupBy(_._1).map { case (s, es) => s -> es.size }
    var rq = nodes.map(_ -> 1000000000000L / n).toMap
    (1 to 5).foreach { _ =>
      val s = scala.collection.mutable.Map.empty[Long, Long]
      edges.foreach { case (src, dst) =>
        s(dst) = s.getOrElse(dst, 0L) + rq(src) / outDeg(src)
      }
      rq = nodes.map(nd =>
        nd -> (150000000000L / n + 85 * s.getOrElse(nd, 0L) / 100)).toMap
    }
    val expect = rq.toSeq.sortBy { case (nd, r) => (-r, nd) }.take(20)
      .map { case (nd, r) => nd -> r.toDouble / 1000000000000L }
    assert(got.toSeq == expect)
    // rank mass is bounded by 1 (dangling mass only leaks out)
    assert(rq.values.map(_.toDouble / 1e12).sum <= 1.0 + 1e-9)
  }

  test("graph_triangle_count matches brute-force triangle enumeration") {
    val got = ops.Graph.graphTriangleCount(spark, dir).collect()
      .map(r => r.getLong(0) -> r.getLong(1))
    val li = io.Readers.table(spark, dir, "lineitem")
      .select("l_orderkey", "l_linenumber", "l_partkey")
      .as[(Long, Int, Long)].collect()
    val und: Set[(Long, Long)] = referenceEdges(li)
      .map { case (a, b) => (math.min(a, b), math.max(a, b)) }
    val adj = und.groupBy(_._1).map { case (u, es) => u -> es.map(_._2) }
    val triCount = scala.collection.mutable.Map.empty[Long, Long]
    und.foreach { case (u, v) =>
      // close wedges u < v < w
      adj.getOrElse(v, Set.empty).foreach { w =>
        if (und.contains((u, w))) {
          Seq(u, v, w).foreach(n => triCount(n) = triCount.getOrElse(n, 0L) + 1)
        }
      }
    }
    val expect = triCount.toSeq.sortBy { case (n, c) => (-c, n) }.take(20)
    assert(got.toSeq == expect)
  }

  // ------------------------------------------- label propagation

  test("graph_label_propagation equals 3 synchronous min-label rounds in plain Scala") {
    val got = ops.Graph.graphLabelPropagation(spark, dir).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    val li = io.Readers.table(spark, dir, "lineitem")
      .select("l_orderkey", "l_linenumber", "l_partkey")
      .as[(Long, Int, Long)].collect()
    val und = referenceEdges(li)
      .map { case (a, b) => (math.min(a, b), math.max(a, b)) }
    val nodes = und.flatMap(e => Seq(e._1, e._2))
    val nbrs = (und.toSeq.flatMap { case (u, v) => Seq(u -> v, v -> u) } ++
      nodes.map(n => n -> n)).groupBy(_._1).map { case (k, vs) => k -> vs.map(_._2) }
    var lab = nodes.map(n => n -> n).toMap
    (1 to 3).foreach { _ =>
      lab = nodes.map(n => n -> nbrs(n).map(lab).min).toMap
    }
    assert(got == lab)
    // propagation is monotone toward the component min and non-trivial:
    // some label must have moved off its own id by round 3
    assert(got.forall { case (n, l) => l <= n })
    assert(got.exists { case (n, l) => l < n })
  }

  // ---------------------------------------------------- k-core

  test("graph_k_core equals 3 brute-force peel rounds at k=2") {
    val got = ops.Graph.graphKCore(spark, dir).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    val li = io.Readers.table(spark, dir, "lineitem")
      .select("l_orderkey", "l_linenumber", "l_partkey")
      .as[(Long, Int, Long)].collect()
    def bucket(key: String): Long = {
      val hex = java.security.MessageDigest.getInstance("MD5")
        .digest(s"graft-kcore|$key".getBytes("UTF-8"))
        .take(4).map(b => f"$b%02x").mkString
      java.lang.Long.parseLong(hex, 16) % 100
    }
    var edges = referenceEdges(li)
      .map { case (a, b) => (math.min(a, b), math.max(a, b)) }
      .filter { case (u, v) => bucket(s"$u|$v") < 10 }
    val sampledNodes = edges.flatMap(e => Seq(e._1, e._2))
    (1 to 3).foreach { _ =>
      val deg = edges.toSeq.flatMap(e => Seq(e._1, e._2))
        .groupBy(identity).map { case (n, xs) => n -> xs.size }
      val surv = deg.filter(_._2 >= 2).keySet
      edges = edges.filter { case (u, v) => surv(u) && surv(v) }
    }
    val truth = edges.toSeq.flatMap(e => Seq(e._1, e._2))
      .groupBy(identity).map { case (n, xs) => n -> xs.size.toLong }
    assert(got == truth)
    // the 10% sparsification makes the k=2 peel non-trivial here:
    // some sampled node must actually be gone, and some must survive
    assert(got.nonEmpty)
    assert(got.keySet.subsetOf(sampledNodes))
    assert(got.size < sampledNodes.size, "at least one node peeled")
  }

  // ---------------------------------------- neighbor-set Jaccard

  test("graph_jaccard_neighbors matches brute-force structural similarity over the edge set") {
    val got = ops.Graph.graphJaccardNeighbors(spark, dir).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getDouble(3)))
    val li = io.Readers.table(spark, dir, "lineitem")
      .select("l_orderkey", "l_linenumber", "l_partkey")
      .as[(Long, Int, Long)].collect()
    val und = referenceEdges(li)
      .map { case (a, b) => (math.min(a, b), math.max(a, b)) }
    val nbrs = und.toSeq.flatMap { case (u, v) => Seq(u -> v, v -> u) }
      .groupBy(_._1).map { case (k, vs) => k -> vs.map(_._2).toSet }
    // candidates are the EDGES (SCAN structural similarity), with a
    // positive common-neighbor count (common=0 edges never aggregate)
    val pairs = und.toSeq.collect {
      case (a, b) if (nbrs(a) & nbrs(b)).nonEmpty =>
        val c = (nbrs(a) & nbrs(b)).size
        (a, b, c.toLong, c.toDouble / (nbrs(a).size + nbrs(b).size - c))
    }
    val truth = pairs.sortBy { case (a, b, _, j) => (-j, a, b) }.take(20)
    assert(got.toSeq == truth)
    assert(got.length == 20)
    // sanity: every reported pair is an edge sharing >= 1 neighbor
    assert(got.forall(_._3 >= 1))
    assert(got.forall { case (a, b, _, _) => und((a, b)) })
  }

  // ------------------------------------------------ n-gram novelty

  test("text_ngram_novelty counts first-occurrence grams against the doc_id prefix order") {
    val out = ops.Curation2.textNgramNovelty(spark, dir).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getDouble(3)))
    assert(out.nonEmpty)
    val docs = toksOf(dir).view.mapValues(_._2)
      .filter(_._2.length >= 3).toMap
    val gramsOf = docs.view.mapValues(t =>
      t.sliding(3).map(_.mkString(" ")).toSet).toMap
    val firstDoc = gramsOf.toSeq.flatMap { case (id, gs) => gs.map(_ -> id) }
      .groupBy(_._1).map { case (g, xs) => g -> xs.map(_._2).min }
    out.foreach { case (id, nGrams, nSeen, novelty) =>
      val gs = gramsOf(id)
      val seen = gs.count(g => firstDoc(g) < id)
      assert(nGrams == gs.size && nSeen == seen.toLong)
      assert(novelty == (gs.size - seen).toDouble / gs.size)
      assert(novelty >= 0.0 && novelty <= 1.0)
    }
    assert(out.length == docs.size)
    // the earliest doc by id has nothing before it — novelty exactly 1
    val firstId = docs.keys.min
    assert(out.find(_._1 == firstId).get._4 == 1.0)
    // boilerplate exists: someone repeats an earlier doc's gram
    assert(out.exists(_._3 > 0))
  }

  test("text_ngram_novelty: hash-key branch equals the string-key branch") {
    // round 16 — the volume-gated hash-key swap: counts over
    // xxhash64(gram) equal counts over the gram string unless a
    // 64-bit collision lands inside one corpus's vocabulary
    val docs = io.Readers.table(spark, "/root/testdata/sf0.01", "documents")
    val str = ops.Curation2.noveltyOf(docs, hashKey = false)
      .as[(Long, Long, Long, Double)].collect().toSet
    val hsh = ops.Curation2.noveltyOf(docs, hashKey = true)
      .as[(Long, Long, Long, Double)].collect().toSet
    assert(str === hsh)
    assert(str.nonEmpty)
  }
}
