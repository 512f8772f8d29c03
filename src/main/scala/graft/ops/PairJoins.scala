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

  /** Predicted pair-row volume Σ df² of the shared-count join — the
    * rows its gram self-join must shuffle. Corpus-QUADRATIC on a
    * dense uniform vocabulary (measured, BASELINE.md r14 scaling row:
    * 1.5·10⁹ rows / disk-full DNF at 50 k docs), which neither the
    * hot-gram probe (uniform df ⇒ no hot gram) nor the prefix filter
    * (nothing is rare) escapes. 0.0 on an empty relation. Double
    * math: per-gram df² stays exact to df ≈ 9·10⁷ and the switch
    * needs one significant digit, not exactness.
    */
  def pairVolume(dfreq: DataFrame): Double = {
    val r = dfreq.agg(
      sum(col("df").cast("double") * col("df").cast("double")).as("v")).head()
    if (r.isNullAt(0)) 0.0 else r.getDouble(0)
  }

  /** Both dispatch scalars of a (gh, df) relation in ONE eager
    * aggregation — (hotGramShare, pairVolume) — so a dispatch that
    * consults both (and may read the share twice while falling
    * through its branches) runs one driver job instead of three
    * (r15 ADVICE). Same empty-relation guard as the single probes.
    */
  def dfProfile(dfreq: DataFrame): (Double, Double) = {
    val r = dfreq.agg(sum(col("df")).as("n"), max(col("df")).as("maxdf"),
      sum(col("df").cast("double") * col("df").cast("double")).as("v")).head()
    if (r.isNullAt(0) || r.isNullAt(1)) (0.0, 0.0)
    else (r.getLong(1).toDouble * r.getLong(1).toDouble /
      r.getLong(0).max(1L).toDouble, r.getDouble(2))
  }

  /** Positional word-4-gram frequency rollup of the documents table
    * — the span/novelty text families' probe relation (round 16, the
    * r15 verdict's item 2), shared via [[SessionCache]] across the
    * `dedup_substring_span` / `dedup_substring_remove` /
    * `text_ngram_novelty` dispatches. df counts OCCURRENCES
    * (positions), not docs: the span detector joins every position,
    * so Σ df² predicts its pair-hit volume exactly the way
    * [[bigramDfreq]]'s does for the set-similarity family.
    */
  def quadgramDfreq(s: org.apache.spark.sql.SparkSession, dir: String): DataFrame =
    SessionCache.of(s, dir, "ngram-df4pos") {
      val toks = split(trim(col("text")), "\\s+")
      graft.io.Readers.table(s, dir, "documents")
        .filter(trim(col("text")) =!= "")
        .select(col("lang"), toks.as("toks"))
        .filter(size(col("toks")) >= 4)
        .select(explode(transform(sequence(lit(0), size(col("toks")) - 4),
          i => xxhash64(col("lang"),
            concat_ws(" ", slice(col("toks"), i + 1, lit(4)))))).as("gh"))
        .groupBy(col("gh")).agg(count(lit(1)).as("df"))
    }

  /** (Σ df, Σ df²) of [[quadgramDfreq]] in ONE eager aggregation —
    * the two dispatch scalars of the positional text families: Σ df
    * (total gram positions) gates the LINEAR keys' hash-key swap
    * ([[HashKeyGramVolume]]), Σ df² the span detector's join-key
    * shape ([[BandedPairVolume]] — same switch point as the bigram
    * family; the shuffle economics are identical). (0, 0) on an
    * empty or all-short corpus, where every consumer emits nothing
    * on either branch anyway.
    */
  def quadgramProfile(s: org.apache.spark.sql.SparkSession, dir: String): (Double, Double) = {
    val r = quadgramDfreq(s, dir).agg(sum(col("df")).as("n"),
      sum(col("df").cast("double") * col("df").cast("double")).as("v")).head()
    if (r.isNullAt(0)) (0.0, 0.0)
    else (r.getLong(0).toDouble, r.getDouble(1))
  }

  /** [[quadgramProfile]] over an arbitrary documents frame (round 16
    * — the curation composite's survivor-set stages need the same
    * dispatch scalars as the registry keys, but their input is a
    * filtered frame, not `dir`'s table, so the SessionCache'd rollup
    * does not apply). One eager aggregation; (0, 0) on an empty or
    * all-short frame.
    */
  def quadgramProfileOf(docs: DataFrame): (Double, Double) = {
    val toks = split(trim(col("text")), "\\s+")
    val r = docs
      .filter(trim(col("text")) =!= "")
      .select(col("lang"), toks.as("toks"))
      .filter(size(col("toks")) >= 4)
      .select(explode(transform(sequence(lit(0), size(col("toks")) - 4),
        i => xxhash64(col("lang"),
          concat_ws(" ", slice(col("toks"), i + 1, lit(4)))))).as("gh"))
      .groupBy(col("gh")).agg(count(lit(1)).as("df"))
      .agg(sum(col("df")).as("n"),
        sum(col("df").cast("double") * col("df").cast("double")).as("v")).head()
    if (r.isNullAt(0)) (0.0, 0.0)
    else (r.getLong(0).toDouble, r.getDouble(1))
  }

  /** Switch point for the linear text keys' hash-key swap (round
    * 16): above ~10⁸ gram positions the distinct/aggregate/join
    * shuffles of the Σ df–linear keys move gigabytes of gram STRINGS
    * that an 8-byte xxhash64 key carries at roughly a third of the
    * width; below it the string key is exact-by-construction and
    * oracle-able. Counts above the switch tolerate the ~2⁻⁶⁴
    * collision rate (stated per key). The gate corpora sit 2–3
    * orders of magnitude below (sf0.01 ≈ 2·10⁴ positions,
    * sf0.1 ≈ 3·10⁵), so every oracle run stays on the exact branch.
    */
  val HashKeyGramVolume: Double = 1e8

  /** Switch point for the MinHash-banded front-end (round 15,
    * §8.r15 item 3 / the r14 verdict's promotion): above this
    * predicted volume the exact pair join's shuffle dominates and
    * the banded candidate generator feeds the same exact verify.
    * Placement is measured (ScratchPairVolume + the r14
    * ScratchNgramBanded A/B): the oracle-gate corpora sit 1–2 orders
    * below (sf0.01 ≈ 2·10⁵, sf0.1 ≈ 2·10⁷ — both keys stay on the
    * exact branches there, preserving the hash-exact contract),
    * while the corpora where banding measurably wins sit above
    * (sf0.3 ≈ 2·10⁸: banded 10.5 s vs exact 17.5 s; sf1 ≈ 1.9·10⁹:
    * 19.1 s vs 71.4 s / containment DNF), with recall 1.0000 at
    * every measured scale and the output a verified subset by
    * construction.
    */
  val BandedPairVolume: Double = 1e8

  /** MinHash-LSH candidate pairs over a (doc_id, lang, gsz, grams)
    * relation — the dense-vocabulary 100 TB front-end (promoted from
    * ScratchNgramBanded, measured r14): `nPerm` seeded minhashes over
    * each doc's gram set → `bands` hashed band keys → lang-blocked
    * band equi-join → distinct pairs. Every emitted pair flows into
    * the caller's EXACT verify (array_intersect on the true gram
    * sets), so precision is 1 by construction; the probabilistic
    * side is recall only — P[candidate | J] = 1−(1−J^(nPerm/bands))^bands,
    * 0.968 at J = 0.5 under the jaccard key's 12×2 parameters;
    * the containment key runs 64×2 (see its scaladoc for the
    * containment-to-Jaccard curve and why 1-row bands were measured
    * unusable at this corpus's background J). Candidate volume is
    * Σ over (lang, band, bandHash) buckets of C(bucket, 2) — bounded
    * by band-key dispersion instead of gram df², measured ~500× under
    * Σ df² at sf1. `sizeRatio = Some(r)` applies the Jaccard size
    * bound r·min ≥ max inside the band join. Output: one row per
    * candidate pair (a_id < b_id) with both doc sizes.
    */
  def bandedCandidates(d: DataFrame, nPerm: Int, bands: Int,
      sizeRatio: Option[Int]): DataFrame = {
    val rpb = nPerm / bands
    require(rpb * bands == nPerm, s"bands=$bands must divide nPerm=$nPerm")
    val sigs = d.select(col("doc_id"), col("lang"), col("gsz"),
      graft.functions.TextExpressions.minHashSigs(col("grams"), nPerm).as("sig"))
    val bandCols = (0 until bands).map { b =>
      struct(lit(b).as("band"),
        hash((b * rpb until (b + 1) * rpb)
          .map(i => element_at(col("sig"), i + 1)): _*).as("bh")).as(s"b$b")
    }
    // The banded relation is consumed by BOTH sides of the self-join;
    // localCheckpoint (not SessionCache — the band parameters differ
    // per caller) computes the signatures once.
    val banded = sigs.select(col("doc_id"), col("lang"), col("gsz"),
        explode(array(bandCols: _*)).as("e"))
      .select(col("doc_id"), col("lang"), col("gsz"),
        col("e.band").as("band"), col("e.bh").as("bh"))
      .localCheckpoint()
    val ratioCond = sizeRatio match {
      case Some(r) =>
        lit(r) * col("a.gsz") >= col("b.gsz") &&
          lit(r) * col("b.gsz") >= col("a.gsz")
      case None => lit(true)
    }
    banded.as("a").join(banded.as("b"),
        col("a.lang") === col("b.lang") && col("a.band") === col("b.band") &&
        col("a.bh") === col("b.bh") && col("a.doc_id") < col("b.doc_id") &&
        ratioCond)
      .select(col("a.doc_id").as("a_id"), col("b.doc_id").as("b_id"),
        col("a.gsz").as("a_sz"), col("b.gsz").as("b_sz"))
      .groupBy(col("a_id"), col("b_id"))
      .agg(max(col("a_sz")).as("a_sz"), max(col("b_sz")).as("b_sz"))
  }

  /** Predicted pair-row volume of [[smallSideCandidates]] —
    * Σ_g dfS(g)·df(g) where dfS counts only docs with
    * gsz ≤ `smallCap` — evaluated eagerly from the two tiny df
    * rollups (one equi-join of gram-count-bounded relations, no
    * corpus pass). 0.0 when no small docs exist.
    */
  def smallSideVolume(inv: DataFrame, dfreq: DataFrame, smallCap: Int): Double = {
    val dfs = inv.filter(col("gsz") <= smallCap)
      .groupBy(col("gh")).agg(count(lit(1)).as("dfs"))
    val r = dfs.join(dfreq, "gh")
      .agg(sum(col("dfs").cast("double") * col("df").cast("double")).as("v"))
      .head()
    if (r.isNullAt(0)) 0.0 else r.getDouble(0)
  }

  /** Small-side exhaustive candidate pairs — the ASYMMETRY
    * complement to [[bandedCandidates]] for the containment key
    * (round 16, r15 ADVICE): banded collision probability degrades
    * with size ratio (J = τ/(k + 1 − τ) at ratio k), yet
    * tiny-inside-huge is precisely the containment signal. A pair at
    * high ratio has a SMALL small side, and a small doc can afford
    * the full lossless index: join the grams of docs with
    * gsz ≤ `smallCap` against the whole inverted index, count shared
    * hashes per pair, and prefilter on the integer containment bound
    * `den·shared ≥ num·min(sz)` (collisions only inflate — no false
    * negatives; the caller's exact verify restores precision). Every
    * contained pair whose small side is ≤ `smallCap` grams is found
    * EXACTLY at ANY ratio; the residual (both sides > `smallCap` AND
    * ratio high enough to degrade banding) is the caller's documented
    * gap. Cost is [[smallSideVolume]] rows — gate on it.
    */
  def smallSideCandidates(inv: DataFrame, smallCap: Int,
      num: Int, den: Int): DataFrame = {
    val sa = inv.filter(col("gsz") <= smallCap)
      .select(col("gh"), col("doc_id").as("s_id"), col("gsz").as("s_sz"))
    val fb = inv.select(col("gh").as("f_gh"), col("doc_id").as("f_id"),
      col("gsz").as("f_sz")).hint("shuffle_hash")
    // canonicalize: the indexed side is the strictly-smaller one
    // (ties break on id), so a both-small pair joins exactly once and
    // shared_h counts each shared gram once
    sa.join(fb, col("gh") === col("f_gh") &&
        (col("s_sz") < col("f_sz") ||
          (col("s_sz") === col("f_sz") && col("s_id") < col("f_id"))))
      .select(
        shiftleft(least(col("s_id"), col("f_id")).cast("long"), 32)
          .bitwiseOR(greatest(col("s_id"), col("f_id")).cast("long")).as("pk"),
        least(col("s_sz"), col("f_sz")).as("min_sz"))
      .groupBy(col("pk"))
      .agg(count(lit(1)).as("shared_h"), min(col("min_sz")).as("min_sz"))
      .filter(lit(den) * col("shared_h") >= lit(num) * col("min_sz"))
      .select(shiftright(col("pk"), 32).cast("int").as("a_id"),
        col("pk").bitwiseAND(lit(0xFFFFFFFFL)).cast("int").as("b_id"))
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
