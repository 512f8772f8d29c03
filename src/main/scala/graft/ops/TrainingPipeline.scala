package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.functions.TextExpressions

/** The training-data pipeline, end to end — the LLM-corpus analogue of
  * [[Pipeline]] (north star: every operator exists to serve this flow
  * at 100 TB):
  *
  * raw docs → PII scrub → language ID → quality filter → repetition
  * filter (Gopher-style duplicate-bigram gate) → exact dedup
  * (normalized-hash, min-id wins) → near-dedup (SimHash band blocking,
  * Hamming ≤ 7, connected-components closure) → token accounting →
  * deterministic train/valid/test split → [[packSplit]] sequence
  * packing per split.
  *
  * Every stage is one of the engine's §2 operators applied as a pure
  * transformation; nothing here introduces a shuffle the operators do
  * not already declare. Scale posture per stage: scrub/lang/quality/
  * tokens are row-local; exact dedup is one hash aggregation; SimHash
  * signatures are map-only with only (band, byte) pairs reaching an
  * exchange; the split is a pure function of doc_id (stable under
  * corpus growth, so incremental runs never reshuffle old docs across
  * splits).
  */
object TrainingPipeline {

  /** Curate a documents relation: returns the surviving rows with
    * provenance columns (pred_lang, quality, n_tokens, bucket, split).
    * Input schema: (doc_id, text, ...) — other columns pass through.
    */
  def curate(docs: DataFrame, minQuality: Double = 0.5,
      maxHamming: Int = 7, maxDupBigramFrac: Double = 0.9): DataFrame = {
    // 1. PII scrub — redact before anything else sees the text
    val scrubbed = docs.withColumn("text", Llm2.piiScrub(col("text")))

    // 2-3. language ID + quality gate (row-local)
    val prelim = scrubbed
      .withColumn("pred_lang", Llm2.predLangCol(col("text")))
      .withColumn("quality", Llm2.qualityCol(col("text")))
      .filter(col("quality") >= minQuality && col("pred_lang") =!= "und")

    // 3b. repetition gate (Gopher-style): drop generation loops /
    //     boilerplate whose duplicate-bigram fraction exceeds the
    //     threshold. Inline single-pass form of text_repetition_stats'
    //     dup_bigram_frac: distinct/total bigram counts from the
    //     projected token array (array ops, row-local — no explode ⋈
    //     re-join needed inside the composite); one-token docs have no
    //     bigrams and pass.
    val toksCol = split(lower(regexp_replace(trim(col("text")), "\\s+", " ")), " ")
    val scored = prelim
      .withColumn("toks", toksCol)
      .withColumn("bigrams",
        when(size(col("toks")) >= 2,
          zip_with(
            slice(col("toks"), lit(1), size(col("toks")) - 1),
            slice(col("toks"), lit(2), size(col("toks")) - 1),
            (a, b) => concat_ws(" ", a, b)))
          .otherwise(array()))
      .filter(size(col("bigrams")) < 2 ||
        (lit(1.0) - size(array_distinct(col("bigrams"))).cast("double")
          / size(col("bigrams")).cast("double")) <= maxDupBigramFrac)
      .drop("toks", "bigrams")

    // 4. exact dedup: smallest doc_id per normalized-text hash wins
    val normHash = sha2(lower(regexp_replace(trim(col("text")), "\\s+", " ")), 256)
    val keepExact = scored.withColumn("text_hash", normHash)
      .groupBy("text_hash").agg(min(col("doc_id")).as("doc_id"))
      .select("doc_id")
    val exactDeduped = scored.join(keepExact, Seq("doc_id"), "left_semi")

    // 5. near-dedup: SimHash band blocking → Hamming-qualified PAIRS →
    //    connected-components closure → keep the min id per cluster
    //    (single-link semantics). Per-pair "drop the higher id" keeps
    //    every LOCAL-min doc instead: with pairs (1,3) and (2,3) it
    //    keeps both 1 and 2 even though they sit in one transitive
    //    near-dup cluster {1,2,3}; the closure keeps exactly 1.
    val sig = exactDeduped
      .select(col("doc_id"),
        TextExpressions.wordShingles(col("text"), 2).as("grams"))
      .filter(size(col("grams")) > 0)
      .select(col("doc_id"), TextExpressions.simHash64(col("grams")).as("simhash"))
    val banded = sig.select(col("doc_id"), col("simhash"),
        explode(array((0 until 8).map(k =>
          struct(lit(k).as("band"),
            shiftright(col("simhash"), k * 8).bitwiseAND(0xFFL).as("bv"))): _*)).as("e"))
      .select(col("doc_id"), col("simhash"), col("e.band").as("band"), col("e.bv").as("bv"))
    val pairs = banded.as("a").join(banded.as("b"),
        col("a.band") === col("b.band") && col("a.bv") === col("b.bv") &&
        col("a.doc_id") < col("b.doc_id"))
      .filter(bit_count(col("a.simhash").bitwiseXOR(col("b.simhash"))) <= maxHamming)
      .select(col("a.doc_id").as("a_id"), col("b.doc_id").as("b_id"))
      .distinct()
    val dupIds = Llm.connectedComponents(pairs)
      .filter(col("id") =!= col("comp"))
      .select(col("id").as("doc_id"))
    val nearDeduped = exactDeduped.join(dupIds, Seq("doc_id"), "left_anti")

    // 6-7. token accounting + deterministic split
    nearDeduped
      .withColumn("n_tokens",
        size(split(trim(regexp_replace(col("text"), "\\s+", " ")), " ")))
      .withColumn("bucket", Llm.splitBucket(col("doc_id")))
      .withColumn("split", Llm.splitName(col("bucket")))
  }

  /** Write the curated corpus partitioned by (split, pred_lang) — the
    * layout a trainer consumes split-at-a-time with partition pruning.
    */
  def writeCurated(curated: DataFrame, path: String): Unit =
    curated.write.mode("overwrite")
      .partitionBy("split", "pred_lang")
      .parquet(path)

  /** Pack ONE split of the curated corpus into fixed-budget training
    * sequences ([[Llm2.packSequences]] manifest). Packing runs per
    * split — mixing splits in one token stream would leak holdout
    * tokens into train packs at the boundaries.
    */
  def packSplit(curated: DataFrame, split: String, budget: Int): DataFrame =
    Llm2.packSequences(
      curated.filter(col("split") === split).select("doc_id", "text"), budget)
}
