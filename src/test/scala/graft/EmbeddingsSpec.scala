package graft

/** ops.Embeddings: Gram cells + int8 quantization profile. The JVM
  * replays below execute the SAME IEEE binary64 operations the Spark
  * expressions compile to, so equality is exact, not approximate —
  * the float frontier is crossed only through power-of-two scaling
  * and verbatim-ordered ops.
  */
class EmbeddingsSpec extends SparkSpec {
  import spark.implicits._

  private val dir = "/root/testdata/sf0.001"

  private def corpus: Array[(Long, Array[Float], Int)] =
    io.Readers.table(spark, dir, "embeddings")
      .select("vec_id", "embedding", "label")
      .as[(Long, Array[Float], Int)].collect()

  test("gram cells: aggregator output equals the brute-force JVM replay") {
    val vecs = corpus
    val d = vecs.head._2.length
    val n = vecs.length.toLong
    val ref = Array.ofDim[Long](d, d)
    vecs.foreach { case (_, e, _) =>
      val q = e.map(x => math.floor(x.toDouble * ops.Embeddings.GramScale).toLong)
      for (i <- 0 until d; j <- i until d) ref(i)(j) += q(i) * q(j)
    }
    val got = ops.Embeddings.embedGramCells(spark, dir)
      .as[(Long, Long, Long, Long)].collect()
    assert(got.length === d * (d + 1) / 2)
    got.foreach { case (i, j, nv, g) =>
      assert(nv === n)
      assert(g === ref(i.toInt)(j.toInt), s"cell ($i,$j)")
    }
  }

  test("gram cells: the declarative A/B control emits identical rows") {
    val agg = ops.Embeddings.embedGramCells(spark, dir).collect().map(_.toSeq)
    val dec = ops.Embeddings.gramCellsDeclarative(
      io.Readers.table(spark, dir, "embeddings")).collect().map(_.toSeq)
    assert(agg.toSeq === dec.toSeq)
  }

  test("gram cells: Cauchy–Schwarz on every off-diagonal; trace is the quantized corpus energy") {
    val cells = ops.Embeddings.embedGramCells(spark, dir)
      .as[(Long, Long, Long, Long)].collect()
      .map { case (i, j, _, g) => (i, j) -> g }.toMap
    val n = corpus.length.toDouble
    cells.foreach { case ((i, j), g) =>
      if (i != j) {
        // exact integer Cauchy–Schwarz via BigInt (no overflow risk)
        assert(BigInt(g) * BigInt(g) <= BigInt(cells((i, i))) * BigInt(cells((j, j))),
          s"CS at ($i,$j)")
      } else assert(g >= 0L, s"diag $i")
    }
    // unit-norm corpus: Σ_i G[i,i] = Σ_vec |q|² ≈ n·2²⁸, within the
    // per-component quantization slack (|q|² ∈ [(|x|·2¹⁴−1)², …])
    val trace = (0L until cells.keys.map(_._1).max + 1)
      .map(i => cells((i, i))).sum.toDouble
    val exact = n * ops.Embeddings.GramScale * ops.Embeddings.GramScale
    assert(math.abs(trace - exact) / exact < 0.01, s"trace $trace vs $exact")
  }

  test("centroid cells: brute-force JVM replay; per-dim label marginals cover the corpus") {
    val vecs = corpus
    val d = vecs.head._2.length
    val ref = scala.collection.mutable.Map.empty[(Int, Int), (Long, Long)]
      .withDefaultValue((0L, 0L))
    vecs.foreach { case (_, e, label) =>
      e.zipWithIndex.foreach { case (x, dim) =>
        val q = math.floor(x.toDouble * ops.Embeddings.GramScale).toLong
        val (n, s) = ref((label, dim))
        ref((label, dim)) = (n + 1, s + q)
      }
    }
    val got = ops.Embeddings.embedCentroidCells(spark, dir)
      .as[(Int, Long, Long, Long)].collect()
    assert(got.length === ref.size)
    got.foreach { case (label, dim, n, s) =>
      assert((n, s) === ref((label, dim.toInt)), s"cell ($label,$dim)")
    }
    // every (label, dim) grid point present; n marginal covers corpus
    (0 until d).foreach { dim =>
      assert(got.filter(_._2 == dim.toLong).map(_._3).sum === vecs.length.toLong)
    }
  }

  test("label affinity: JVM replay; centroid cosines land in [-1, 1] with unit diagonal") {
    val vecs = corpus
    val d = vecs.head._2.length
    val sums = scala.collection.mutable.Map.empty[Int, Array[BigInt]]
    val ns = scala.collection.mutable.Map.empty[Int, Long].withDefaultValue(0L)
    vecs.foreach { case (_, e, label) =>
      val s = sums.getOrElseUpdate(label, Array.fill(d)(BigInt(0)))
      e.zipWithIndex.foreach { case (x, i) =>
        s(i) += BigInt(math.floor(x.toDouble * ops.Embeddings.GramScale).toLong)
      }
      ns(label) += 1
    }
    val got = ops.Embeddings.embedLabelAffinity(spark, dir)
      .as[(Int, Int, Long, Long, String)].collect()
    val labels = sums.keys.toSeq.sorted
    assert(got.length === labels.size * (labels.size + 1) / 2)
    val dotMap = got.map(r => (r._1, r._2) -> BigInt(r._5)).toMap
    got.foreach { case (la, lb, na, nb, dot) =>
      val ref = (0 until d).map(i => sums(la)(i) * sums(lb)(i)).sum
      assert(BigInt(dot) === ref, s"pair ($la,$lb)")
      assert(na === ns(la) && nb === ns(lb))
    }
    // consumer cosine: |dot_ab| <= sqrt(dot_aa*dot_bb), diagonal = 1
    got.filter(r => r._1 != r._2).foreach { case (la, lb, _, _, _) =>
      val ab = dotMap((la, lb)); val aa = dotMap((la, la)); val bb = dotMap((lb, lb))
      assert(ab * ab <= aa * bb, s"Cauchy–Schwarz at ($la,$lb)")
    }
  }

  test("topEigen recovers a planted principal direction; Rayleigh dominance holds") {
    // planted anisotropic corpus: x = a·u + small hash noise, u fixed
    val d = 16
    val u = Array.tabulate(d)(i => math.sin(i + 1.0))
    val un = math.sqrt(u.map(x => x * x).sum)
    val unit = u.map(_ / un)
    val vecs = (0 until 2000).map { k =>
      val a = (k % 7 - 3).toDouble / 3.0
      (k.toLong, Array.tabulate(d)(i =>
        (a * unit(i) + ((k * 31 + i * 17) % 11 - 5) / 200.0).toFloat))
    }
    import spark.implicits._
    val df = vecs.toDF("vec_id", "embedding")
    val cells = ops.Embeddings.gramCellsDeclarative(df)
    val (lambda, v) = ops.Embeddings.topEigen(cells)
    val cos = math.abs(v.zip(unit).map { case (a, b) => a * b }.sum)
    assert(cos > 0.99, s"cosine to planted direction $cos")
    assert(lambda > 0.0)
    // Rayleigh dominance: the returned pair beats arbitrary probes
    val rows = cells.collect().map(r =>
      ((r.getLong(0).toInt, r.getLong(1).toInt), r.getLong(3))).toMap
    val n = 2000.0 * ops.Embeddings.GramScale * ops.Embeddings.GramScale
    def rayleigh(w: Array[Double]): Double = {
      val nw = math.sqrt(w.map(x => x * x).sum)
      val x = w.map(_ / nw)
      (for (i <- 0 until d; j <- 0 until d) yield {
        val g = rows.getOrElse((math.min(i, j), math.max(i, j)), 0L) / n
        x(i) * g * x(j)
      }).sum
    }
    (1 to 5).foreach { s =>
      val probe = Array.tabulate(d)(i => ((s * 13 + i * 7) % 9 - 4).toDouble)
      assert(rayleigh(probe) <= lambda + 1e-9, s"probe $s beat the eigenpair")
    }
    // determinism: a second run is bit-identical
    val (l2, v2) = ops.Embeddings.topEigen(cells)
    assert(l2 === lambda && v2.toSeq === v.toSeq)
  }

  test("topEigenK deflation recovers two planted directions; whitening decorrelates them") {
    val d = 12
    // two orthogonal planted directions with distinct energies
    val u1 = Array.tabulate(d)(i => if (i < d / 2) 1.0 / math.sqrt(d / 2.0) else 0.0)
    val u2 = Array.tabulate(d)(i => if (i >= d / 2) 1.0 / math.sqrt(d / 2.0) else 0.0)
    val vecs = (0 until 4000).map { k =>
      val a = (k % 9 - 4).toDouble / 2.0          // strong axis
      val b = (k % 5 - 2).toDouble / 4.0          // weaker axis
      (k.toLong, Array.tabulate(d)(i =>
        (a * u1(i) + b * u2(i) + ((k * 37 + i * 13) % 7 - 3) / 500.0).toFloat))
    }
    import spark.implicits._
    val df = vecs.toDF("vec_id", "embedding")
    val cells = ops.Embeddings.gramCellsDeclarative(df).localCheckpoint()
    val pairs = ops.Embeddings.topEigenK(cells, 2)
    assert(pairs.length === 2)
    val Seq((l1, v1), (l2, v2)) = pairs
    assert(l1 > l2 && l2 > 0.0, s"ordered energies $l1 $l2")
    assert(math.abs(v1.zip(u1).map { case (x, y) => x * y }.sum) > 0.99, "first direction")
    assert(math.abs(v2.zip(u2).map { case (x, y) => x * y }.sum) > 0.99, "second direction")
    assert(math.abs(v1.zip(v2).map { case (x, y) => x * y }.sum) < 1e-6, "orthogonal")
    // whitening: z covariance ≈ I within tolerance (row-local plan)
    val z = ops.Embeddings.whitened(df, pairs)
    val p = z.queryExecution.executedPlan.toString
    assert(!p.contains("Exchange") && !p.contains("BatchEvalPython"), p)
    val zs = z.select("z").as[Seq[Double]].collect()
    val n = zs.length.toDouble
    val cov = Array.ofDim[Double](2, 2)
    zs.foreach(r => for (i <- 0 until 2; j <- 0 until 2) cov(i)(j) += r(i) * r(j) / n)
    assert(math.abs(cov(0)(0) - 1.0) < 0.05, s"var z0 ${cov(0)(0)}")
    assert(math.abs(cov(1)(1) - 1.0) < 0.05, s"var z1 ${cov(1)(1)}")
    assert(math.abs(cov(0)(1)) < 0.05, s"cross ${cov(0)(1)}")
  }

  test("int8 profile: brute-force JVM replay; every vector saturates at least one component") {
    val vecs = corpus
    val ref = scala.collection.mutable.Map.empty[Int, (Long, Long, Long, Long, Long)]
      .withDefaultValue((0L, 0L, 0L, 0L, 0L))
    vecs.foreach { case (_, e, label) =>
      val s = e.map(x => math.abs(x.toDouble)).max
      val q = e.map(x => math.floor((x.toDouble / s) * 127.0).toLong)
      val (nv, nz, ns, q2, sf) = ref(label)
      ref(label) = (nv + 1, nz + q.count(_ == 0L), ns + q.count(v => math.abs(v) == 127L),
        q2 + q.map(v => v * v).sum, sf + math.floor(s * 1048576.0).toLong)
    }
    val got = ops.Embeddings.embedQuantizeInt8(spark, dir)
      .as[(Int, Long, Long, Long, Long, Long)].collect()
    assert(got.map(_._1).toSet === ref.keySet)
    got.foreach { case (label, nv, nz, ns, q2, sf) =>
      assert((nv, nz, ns, q2, sf) === ref(label), s"label $label")
      // the max-abs component always lands on ±127 exactly
      assert(ns >= nv, s"label $label saturation")
    }
  }
}
