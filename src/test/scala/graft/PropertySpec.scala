package graft

import org.apache.spark.sql.functions._
import org.scalacheck.Gen
import org.scalacheck.rng.Seed

/** Property-based invariants (SURVEY §5.4), scalacheck generators with
  * a fixed seed (deterministic CI) sampled through the real engine —
  * bounded case counts because each case is a Spark job.
  */
class PropertySpec extends SparkSpec {
  import spark.implicits._

  /** Deterministic samples from a generator (fixed seed, sizes 5..30). */
  private def samples[A](gen: Gen[A], n: Int): Seq[A] =
    (0 until n).flatMap { i =>
      gen(Gen.Parameters.default.withSize(5 + i * 5), Seed(42L + i))
    }

  private val eventsGen: Gen[List[(Long, Long, String, Long, Double)]] =
    Gen.listOf(for {
      id <- Gen.choose(1L, 1000L)
      user <- Gen.choose(1L, 5L)
      typ <- Gen.oneOf("click", "view")
      tsOff <- Gen.choose(0L, 86400L)
      v <- Gen.choose(0, 10000).map(_ / 100.0)
    } yield (id, user, typ, tsOff, v))

  test("latest-wins dedup is idempotent and keeps one row per key") {
    for (rows <- samples(eventsGen, 5) if rows.nonEmpty) {
      val df = rows.map { case (id, u, t, off, v) =>
        (id, new java.sql.Timestamp(1700000000000L + off * 1000), u, t, v, "{}")
      }.toDF("event_id", "ts", "user_id", "event_type", "value", "props")
      val once = ops.Streaming.upsertLatest(df.limit(0), df)
      val twice = ops.Streaming.upsertLatest(once, once.limit(0))
      val keys = df.select("user_id", "event_type").distinct().count()
      assert(once.count() === keys)
      assert(twice.count() === keys)
    }
  }

  test("semi and anti joins partition the distinct left keys") {
    val g = Gen.listOf(Gen.choose(1, 20))
    for ((ls, rs) <- samples(g, 5).zip(samples(g, 5).reverse) if ls.nonEmpty) {
      val l = ls.toDF("k").distinct()
      val r = rs.toDF("k")
      val semi = l.join(r, Seq("k"), "left_semi").count()
      val anti = l.join(r, Seq("k"), "left_anti").count()
      assert(semi + anti === l.count())
    }
  }

  test("union-all counts add; union-distinct equals distinct of concatenation") {
    val g = Gen.listOf(Gen.choose(1, 50))
    for ((as, bs) <- samples(g, 5).zip(samples(g, 5).reverse)) {
      val a = as.toDF("v"); val b = bs.toDF("v")
      assert(a.unionByName(b).count() === as.size + bs.size)
      assert(a.unionByName(b).distinct().count() === (as ++ bs).distinct.size)
    }
  }

  test("running sum's final row per group equals the group decimal total") {
    for (rows <- samples(eventsGen, 5) if rows.nonEmpty) {
      val df = rows.zipWithIndex.map { case ((_, u, _, _, v), i) => (u, i.toLong, v) }
        .toDF("u", "seq", "v")
      val w = org.apache.spark.sql.expressions.Window
        .partitionBy("u").orderBy("seq")
        .rowsBetween(org.apache.spark.sql.expressions.Window.unboundedPreceding, 0)
      val lastRunning = df
        .withColumn("rs", sum(col("v").cast(Determinism.Money)).over(w))
        .groupBy("u").agg(max(struct(col("seq"), col("rs"))).getField("rs").as("last_rs"))
      val totals = df.groupBy("u").agg(sum(col("v").cast(Determinism.Money)).as("tot"))
      val mismatches = lastRunning.join(totals, "u")
        .filter(col("last_rs") =!= col("tot")).count()
      assert(mismatches === 0)
    }
  }

  test("MinHash candidate recall ⊇ high-Jaccard pairs on generated near-dup corpora") {
    // construct docs from a small vocab with planted duplicates; one
    // changed token in ~60 → shingle-Jaccard ≈ 0.9, where 4×4-band LSH
    // recall is ≈ 1 − (1 − 0.9⁴)⁴ ≈ 0.996 (j ≈ 0.7 pairs are NOT
    // guaranteed: band-match probability there is only ~0.68 — the
    // property must respect the S-curve)
    val vocabGen = Gen.listOfN(30, Gen.identifier.map(_.take(6))).map(_.distinct)
    for ((vocab, i) <- samples(vocabGen, 3).zipWithIndex if vocab.size >= 10) {
      val base = (0 until 60).map(j => vocab((j * 7 + i) % vocab.size)).mkString(" ")
      val nearDup = base.split(" ").updated(3, "changed").mkString(" ")
      val distinctDoc = vocab.take(10).reverse.mkString(" ") + " extra words here now ok"
      val d = java.nio.file.Files.createTempDirectory(s"prop$i").toString
      Seq((1L, base, "en", "s", 1L), (2L, nearDup, "en", "s", 1L),
        (3L, distinctDoc, "en", "s", 1L))
        .toDF("doc_id", "text", "lang", "source", "n_chars")
        .coalesce(1).write.parquet(s"$d/documents.parquet")
      val pairs = ops.Llm.dedupMinhashLsh(spark, d)
        .select("a_id", "b_id").as[(Long, Long)].collect().toSet
      assert(pairs.contains((1L, 2L)), s"seed $i: planted near-dup must be recalled")
    }
  }

  test("sequence packing invariants hold on random corpora (budget, partition, bucket-invariance)") {
    val docGen: Gen[List[(Long, Int)]] = Gen.listOf(for {
      id <- Gen.choose(1L, 500L)
      nTok <- Gen.choose(1, 40)
    } yield (id, nTok)).map(_.distinctBy(_._1))
    for ((docs, i) <- samples(docGen, 4).zipWithIndex if docs.size >= 3) {
      val df = docs.map { case (id, n) => (id, Seq.fill(n)("w").mkString(" ")) }
        .toDF("doc_id", "text")
      val budget = 16 + i * 7
      val packs = ops.Llm2.packSequences(df, budget)
        .as[(Long, Long, Long, Long)].collect().toSeq
      // budget: every pack but the last is exactly `budget` tokens
      val perPack = packs.groupBy(_._1).view.mapValues(_.map(_._4).sum).toMap
      val last = perPack.keys.max
      perPack.foreach { case (p, tot) =>
        if (p != last) assert(tot === budget.toLong, s"seed $i: pack $p holds $tot")
        else assert(tot > 0 && tot <= budget.toLong, s"seed $i: last pack $tot")
      }
      // partition: slices cover each doc contiguously from 0
      val nByDoc = docs.toMap
      packs.groupBy(_._2).foreach { case (doc, slices) =>
        val ordered = slices.sortBy(_._1)
        assert(ordered.head._3 === 0L, s"seed $i doc $doc")
        ordered.sliding(2).foreach {
          case Seq(a, b) => assert(b._3 === a._3 + a._4, s"seed $i doc $doc")
          case _ =>
        }
        assert(ordered.map(_._4).sum === nByDoc(doc).toLong, s"seed $i doc $doc")
      }
      // total conservation + bucket-size invariance of the prefix sum
      assert(packs.map(_._4).sum === docs.map(_._2.toLong).sum, s"seed $i")
      val rebucketed = ops.Llm2.packSequences(df, budget, bucketSize = 3L)
        .as[(Long, Long, Long, Long)].collect().toSeq
      assert(rebucketed.sorted === packs.sorted, s"seed $i: bucketSize changed the packing")
    }
  }

  test("PII scrub is idempotent on generated text (redactions never re-match)") {
    val piiGen: Gen[String] = for {
      words <- Gen.listOf(Gen.identifier.map(_.take(8)))
      email <- Gen.option(Gen.identifier.map(u => s"${u.take(6)}@mail.example.org"))
      phone <- Gen.option(Gen.choose(100000000L, 999999999L).map(n => s"+1 $n"))
    } yield (words ++ email.toList ++ phone.toList).mkString(" ")
    val texts = samples(piiGen, 12).filter(_.nonEmpty)
    if (texts.nonEmpty) {
      val df = texts.toDF("text")
      val diff = df.select(
          ops.Llm2.piiScrub(col("text")).as("once"),
          ops.Llm2.piiScrub(ops.Llm2.piiScrub(col("text"))).as("twice"))
        .filter(col("once") =!= col("twice")).count()
      assert(diff === 0L, "scrub(scrub(x)) must equal scrub(x)")
    }
  }
}
