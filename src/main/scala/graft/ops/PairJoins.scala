package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Shared machinery of the adaptive set-similarity pair joins
  * ([[Curation.dedupNgramContainment]], [[Llm2.dedupNgramJaccard]]):
  * the hot-gram probe that picks the join shape per corpus, and the
  * PPJoin-style prefix-filter candidate generator the hot branch
  * uses. One implementation, parameterized by the threshold-specific
  * constants (prefix fraction, size-ratio bound), so the two
  * operators cannot drift: the probe formula and the pigeonhole
  * construction live here once.
  */
private[graft] object PairJoins {

  /** The shared token-bigram inverted index (round 14): BOTH
    * set-similarity dedup keys (jaccard τ=0.5, containment τ=0.8)
    * build the IDENTICAL (doc_id, gsz, gh = xxhash64(lang, bigram))
    * relation and its df rollup — before sharing, each paid the
    * tokenize + explode + checkpoint and the df aggregate twice per
    * suite. One [[SessionCache]] checkpoint now serves every
    * consumer, which is also the honest deployment shape: ONE
    * inverted index serves every dedup policy over it (the durable
    * analogue being [[GramService]]/[[PostingIndex]]). Narrow three
    * columns — the wide gram arrays stay out (materializing them
    * measured slower; see the jaccard key's comment).
    */
  def bigramInv(s: org.apache.spark.sql.SparkSession, dir: String): DataFrame =
    SessionCache.of(s, dir, "ngram-inv2") {
      val grams = graft.functions.TextExpressions.wordShingles(col("text"), 2)
      graft.io.Readers.table(s, dir, "documents")
        .select(col("doc_id"), col("lang"), grams.as("grams"))
        .filter(size(col("grams")) > 0)
        .select(col("doc_id"), size(col("grams")).as("gsz"),
          explode(col("grams")).as("gram"), col("lang"))
        .select(col("doc_id"), col("gsz"),
          xxhash64(col("lang"), col("gram")).as("gh"))
    }

  /** The (gh, df) gram-frequency rollup of [[bigramInv]], shared the
    * same way (the adaptive-shape probe reads it eagerly in both
    * keys).
    */
  def bigramDfreq(s: org.apache.spark.sql.SparkSession, dir: String): DataFrame =
    SessionCache.of(s, dir, "ngram-df2") {
      bigramInv(s, dir).groupBy(col("gh")).agg(count(lit(1)).as("df"))
    }

  /** Hot-gram share `maxDf²/Σdf` of a (gh, df) gram-frequency
    * relation — the pair rows the single hottest gram generates per
    * gram row of input. Measured (ScratchDfProfile, BASELINE.md r7):
    * 0.04–0.09 on corpora where the shared-count join wins its A/B
    * vs 24.4 where the prefix filter wins 4–7× — the 1.0 switch
    * threshold sits three orders of magnitude from both sides.
    * Returns 0.0 (the shared-count branch) on an EMPTY relation —
    * both aggregates are NULL there, and either branch returns zero
    * pairs anyway; without the guard the probe would NPE on an empty
    * or all-whitespace corpus.
    */
  def hotGramShare(dfreq: DataFrame): Double = {
    val prof = dfreq.agg(sum(col("df")).as("n"), max(col("df")).as("maxdf")).head()
    if (prof.isNullAt(0) || prof.isNullAt(1)) 0.0
    else prof.getLong(1).toDouble * prof.getLong(1).toDouble /
      prof.getLong(0).max(1L).toDouble
  }

  /** PPJoin prefix-filter candidate pairs over a
    * (doc_id, gsz, gh) inverted relation: index only each doc's
    * ⌊gsz/prefixDivisor⌋+1 RAREST grams (rarity from `dfreq`, ties
    * broken on the hash for determinism) — by the caller's
    * pigeonhole bound, a qualifying pair leaves the smaller doc
    * fewer than that many unshared grams, so it MUST collide inside
    * a prefix; hash collisions only merge grams, i.e. only ADD
    * candidates. `sizeRatio = Some(r)` applies the τ size bound
    * r·min ≥ max inside the candidate join. Output: one row per
    * candidate pair (a_id < b_id, ids packed < 2³²) with both doc
    * sizes. Candidate volume is Σ over prefix grams of df — immune
    * to the hot-gram df² explosion of the shared-count shape.
    */
  def prefixCandidates(inv: DataFrame, dfreq: DataFrame, prefixDivisor: Int,
      sizeRatio: Option[Int]): DataFrame = {
    val wDoc = Window.partitionBy(col("doc_id")).orderBy(col("df"), col("gh"))
    val prefix = inv.join(dfreq, "gh")
      .withColumn("rn", row_number().over(wDoc))
      .filter(col("rn") <= floor(col("gsz") / prefixDivisor) + 1)
      .select(col("gh"), col("doc_id").as("p_id"), col("gsz").as("p_sz"))
    val full = inv.select(col("gh").as("f_gh"), col("doc_id").as("f_id"),
      col("gsz").as("f_sz")).hint("shuffle_hash")
    val ratioCond = sizeRatio match {
      case Some(r) =>
        lit(r) * col("p_sz") >= col("f_sz") && lit(r) * col("f_sz") >= col("p_sz")
      case None => lit(true)
    }
    prefix.join(full,
        col("gh") === col("f_gh") && col("p_id") =!= col("f_id") && ratioCond)
      .select(
        shiftleft(least(col("p_id"), col("f_id")).cast("long"), 32)
          .bitwiseOR(greatest(col("p_id"), col("f_id")).cast("long")).as("pk"),
        when(col("p_id") < col("f_id"), col("p_sz")).otherwise(col("f_sz")).as("a_sz"),
        when(col("p_id") < col("f_id"), col("f_sz")).otherwise(col("p_sz")).as("b_sz"))
      .groupBy(col("pk"))
      .agg(max(col("a_sz")).as("a_sz"), max(col("b_sz")).as("b_sz"))
      .select(shiftright(col("pk"), 32).cast("int").as("a_id"),
        col("pk").bitwiseAND(lit(0xFFFFFFFFL)).cast("int").as("b_id"),
        col("a_sz"), col("b_sz"))
  }
}
