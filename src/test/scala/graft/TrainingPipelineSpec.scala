package graft

import java.nio.file.Files
import org.apache.spark.sql.functions._

/** End-to-end training-data curation (the LLM analogue of
  * PipelineSpec): PII scrub → lang/quality gate → exact dedup →
  * SimHash near-dedup → tokens → split → partitioned layout.
  */
class TrainingPipelineSpec extends SparkSpec {
  import spark.implicits._

  private def longDoc(extra: String): String =
    (1 to 40).map(i => s"the quick brown fox and word$i of this fine day").mkString(" ") + " " + extra

  test("curate: scrubs, gates, dedups exactly and nearly, splits deterministically") {
    val docs = Seq(
      // near-identical long English pair (one trailing word differs) → simhash near-dup
      (1L, longDoc("alpha")),
      (2L, longDoc("alpha beta")),
      // exact duplicate of doc 1 modulo whitespace/case → exact dedup
      (3L, longDoc("alpha").toUpperCase),
      // distinct clean English doc with planted PII
      (4L, "the deal is done and this is that fine report of it all; contact sam.lee@example.org or +1 412 555 0100 for more of the things we said in the report that day"),
      // junk: no markers, low quality → filtered (lang 'und')
      (5L, "zzz qqq www"),
      // German doc, clean
      (6L, "der hund und die katze ist nicht das problem und ein haus ist der ort der die freude und das leben in die stadt bringt der tag ist gut und die nacht ist still")
    ).toDF("doc_id", "text")

    val out = ops.TrainingPipeline.curate(docs).orderBy("doc_id")
    val rows = out.select("doc_id", "pred_lang", "split", "text")
      .as[(Long, String, String, String)].collect()
    val ids = rows.map(_._1).toSeq

    assert(!ids.contains(5L), "junk doc gated out (lang=und)")
    assert(!ids.contains(3L), "exact duplicate (case/whitespace) removed, min id kept")
    assert(ids.contains(1L) && !ids.contains(2L),
      s"near-duplicate pair keeps the smaller id only (got $ids)")
    assert(ids.contains(4L) && ids.contains(6L))
    val doc4 = rows.find(_._1 == 4L).get
    assert(doc4._4.contains("[EMAIL]") && doc4._4.contains("[PHONE]"),
      "PII scrubbed before anything else")
    assert(rows.find(_._1 == 6L).get._2 === "de")
    assert(rows.forall(r => Set("train", "valid", "test")(r._3)))

    // the split is the same function sample_hash_split exposes
    val expected = docs.select(col("doc_id"),
      ops.Llm.splitName(ops.Llm.splitBucket(col("doc_id"))).as("s"))
      .as[(Long, String)].collect().toMap
    assert(rows.forall(r => expected(r._1) == r._3))
  }

  test("repetition gate drops generation loops, keeps real text; packSplit packs one split only") {
    // doc 7: a long English generation loop — passes the lang/quality
    // gates (English markers, reasonable lengths) but its duplicate-
    // bigram fraction is ~0.99 → repetition gate must drop it
    val loop = ("the cat sat on the mat and " * 60) + "end"
    val docs = Seq(
      (1L, longDoc("alpha")),
      (4L, "the deal is done and this is that fine report of it all and more of the things we said in the report that day"),
      (7L, loop)).toDF("doc_id", "text")
    val curated = ops.TrainingPipeline.curate(docs)
    val ids = curated.select("doc_id").as[Long].collect().toSet
    assert(!ids.contains(7L), s"repetition loop must be gated out (got $ids)")
    assert(ids === Set(1L, 4L))
    // packing is per split: every packed doc belongs to that split and
    // all packs except the last are exactly the budget
    val trainIds = curated.filter(col("split") === "train")
      .select("doc_id").as[Long].collect().toSet
    val packs = ops.TrainingPipeline.packSplit(curated, "train", budget = 64)
      .as[(Long, Long, Long, Long)].collect()
    assert(packs.map(_._2).toSet === trainIds, "packed docs must be exactly the train split")
    val perPack = packs.groupBy(_._1).view.mapValues(_.map(_._4).sum).toMap
    val last = perPack.keys.max
    perPack.foreach { case (p, tot) =>
      if (p != last) assert(tot === 64L, s"pack $p holds $tot tokens")
    }
  }

  test("near-dedup closure keeps one representative per transitive cluster") {
    // three near-identical docs (each one word apart) — whatever pair
    // subset SimHash banding surfaces, the closure must reduce the
    // cluster to exactly its min id
    val docs = Seq(
      (1L, longDoc("alpha")),
      (2L, longDoc("alpha beta")),
      (3L, longDoc("alpha beta gamma")),
      (4L, "the deal is done and this is that fine report of it all and more of the things we said in the report that day"))
      .toDF("doc_id", "text")
    val ids = ops.TrainingPipeline.curate(docs)
      .select("doc_id").as[Long].collect().toSet
    assert(ids === Set(1L, 4L),
      s"cluster {1,2,3} must keep exactly doc 1 (got $ids)")
  }

  test("writeCurated lays out split/lang partitions that prune on read") {
    val docs = Seq((10L, longDoc("gamma")),
      (11L, "der hund und die katze ist nicht das problem und ein haus ist der ort der die freude und das leben in die stadt bringt der tag ist gut und die nacht ist still"))
      .toDF("doc_id", "text")
    val d = Files.createTempDirectory("cur").toString + "/corpus"
    ops.TrainingPipeline.writeCurated(ops.TrainingPipeline.curate(docs), d)
    val back = spark.read.parquet(d)
    assert(back.count() === 2)
    assert(back.columns.contains("split") && back.columns.contains("pred_lang"))
    // partition-pruned read touches only the one split directory
    val one = spark.read.parquet(d).filter(col("split") === "train")
    val scan = one.queryExecution.executedPlan.toString
    assert(scan.contains("PartitionFilters: [isnotnull(split"), scan)
  }
}
