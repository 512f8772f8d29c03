package graft.ops

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.Determinism.{dsum, dsumProduct}
import graft.io.Readers.table

/** Round-6 curation / scale-pattern operators (beyond SURVEY §2's core
  * set — same contract: every SQL-expressible key carries a DuckDB
  * oracle with identical column names and a total ORDER BY).
  *
  * Themes: benchmark decontamination and containment dedup (the two
  * LLM-corpus hygiene steps the earlier dedup family did not cover),
  * per-domain admission caps and SCD2 history (standard warehouse-side
  * curation), and two explicit scale levers — Bloom semi-join
  * reduction and salted skew joins — expressed as oracle'd queries so
  * their row-identity with the naive plan is machine-checked.
  */
object Curation {

  import Relational.Q

  /** Small-side cap (in grams) for the containment key's
    * asymmetry-aware supplement above the banded volume switch: docs
    * at or under this gram count get the full lossless index
    * ([[PairJoins.smallSideCandidates]]), so a contained pair's
    * recall is exact at ANY size ratio whenever its smaller side is
    * this small. 256 bigrams ≈ a 258-token document — comfortably
    * past the quote/boilerplate sizes the tiny-inside-huge signal
    * targets, while keeping the supplement's predicted volume
    * Σ dfS·df linear-ish (small docs contribute few grams each).
    */
  val SmallSideGrams: Int = 256

  // ------------------------------------------- benchmark decontamination

  /** Docs sharing ≥1 word-4-gram with the eval set (`doc_id % 20 = 0`
    * stands in for a held-out benchmark) — the decontamination gate
    * every training corpus runs before a model sees it (GPT-3 appendix
    * C / PaLM-style n-gram overlap, with a short n because the
    * synthetic docs are ~54 tokens).
    *
    * Scale shape: an eval set is SMALL by definition (benchmarks are
    * thousands of docs, the corpus is billions), so its distinct grams
    * broadcast; the corpus side is one scan → explode → broadcast semi
    * probe → partial-agg count. Nothing about the corpus ever
    * shuffles except the per-doc counts. Joining on the gram STRING
    * (not a hash) keeps the check exact — no collision can flag a
    * clean document.
    */
  /** The two-frame contamination relation (round 17 — the r16 ADVICE
    * decontamination finding): (doc_id, n_shared_grams) for every
    * `training` doc sharing ≥ 1 word-4-gram with `evalDocs`. Taking
    * the eval side as its OWN frame is what lets
    * [[CurationPipeline]]'s stage gate survivors' cleaned text
    * against the FULL raw eval set — an eval doc dropped upstream
    * (gopher-fail, or near-dup of a lower-id training doc: exactly
    * the contamination case) must still contribute its grams.
    */
  private[graft] def contaminationBetween(
      training: org.apache.spark.sql.DataFrame,
      evalDocs: org.apache.spark.sql.DataFrame)
      : org.apache.spark.sql.DataFrame = {
    val grams = graft.functions.TextExpressions.wordShingles(col("text"), 4)
    val evalGrams = evalDocs.select(explode(grams).as("gram")).distinct()
    training.select(col("doc_id"), explode(grams).as("gram"))
      .join(broadcast(evalGrams), "gram")
      .groupBy("doc_id")
      .agg(countDistinct(col("gram")).as("n_shared_grams"))
  }

  /** The contamination relation over an arbitrary documents frame —
    * (doc_id, n_shared_grams) for every NON-eval doc sharing ≥ 1
    * word-4-gram with the eval set (`doc_id % 20 = 0`). Shared by the
    * registry key and [[CurationPipeline]]'s decontamination stage
    * (round 16) so the gate's definition cannot drift between them.
    */
  private[graft] def contaminationOf(docs: org.apache.spark.sql.DataFrame)
      : org.apache.spark.sql.DataFrame =
    contaminationBetween(
      docs.filter(col("doc_id") % 20 =!= 0),
      docs.filter(col("doc_id") % 20 === 0))

  val decontaminateNgram: Q = (s, dir) =>
    contaminationOf(table(s, dir, "documents")).orderBy("doc_id")

  // ------------------------------------------------ containment dedup

  /** Bigram-set containment ≥ 0.8 within a language block — catches
    * what Jaccard structurally cannot: a short document embedded in a
    * much longer one (quotes, boilerplate wrappers, excerpt pages).
    * `containment(A,B) = |A∩B| / min(|A|,|B|)` is 1.0 for a perfect
    * quote even when Jaccard is ~|A|/|B| ≈ 0.
    *
    * Same inverted-index shape as [[Llm2.dedupNgramJaccard]]: explode
    * distinct grams, self-join on the hashed 8-byte gram key
    * (shuffle_hash — a 100 TB gram index never broadcasts), count
    * shared hashes per packed-long pair, prefilter on the integer
    * containment bound, then verify the few survivors exactly with
    * `array_intersect` on the true gram arrays. Hash collisions can
    * only INFLATE the counted overlap, so the prefilter admits every
    * true pair; the verify restores exactness. Note there is NO
    * length-ratio prune here — unlike Jaccard, a tiny-inside-huge pair
    * is precisely the signal, so the size asymmetry must survive.
    *
    * Cost is Σ df² (measured 19 M pair rows at sf0.1 — uniform df,
    * max 152, so a df-cap prunes nothing). The PPJoin-style prefix
    * filter was implemented and A/B'd (ScratchPrefixFilter): on a
    * uniform vocabulary like this one it LOSES (3.0 vs 5.4 s — the
    * rarity-ranking machinery isn't repaid), on a planted Zipf
    * vocabulary it wins 4–7× (41–74 vs 10.3 s, hot-gram df²
    * explosion, identical outputs).
    *
    * Round 7 AUTOMATES the switch: a one-row df-profile probe picks
    * the join shape per corpus. The discriminator is the hot-gram
    * share `maxDf²/Σdf` — the pair rows the single hottest gram
    * generates per gram row of input. Measured (ScratchDfProfile):
    * 0.09 on documents sf0.1 and 0.04 on the uniform fixture (both
    * corpora where shared-count wins the A/B) vs 24.4 on the Zipf
    * fixture (where prefix wins 4–7×) — three orders of magnitude
    * of separation around the 1.0 threshold. Either path feeds the
    * SAME exact verify, so the result is identical whichever shape
    * runs (ScratchPrefixFilter asserts pair-set equality on both
    * corpora); the probe's driver-side state is one row.
    *
    * EXACTNESS CONTRACT, by corpus (r15 ADVICE — surfaced here, the
    * key's primary doc, not just the dispatch comment): below
    * [[PairJoins.BandedPairVolume]] — every oracle-gate corpus — the
    * key is EXACT at any size asymmetry (no ratio prune anywhere).
    * ABOVE the volume switch the candidate front-end is
    * MinHash-banded, whose per-pair collision probability DEGRADES
    * with size ratio (a τ = 0.8-contained pair at ratio k has
    * J = 0.8/(k + 0.2): P ≈ 1.0 at k ≤ 2 under 64 × 2 bands, 0.87 at
    * k = 4, 0.71 at k = 5, worse beyond) — yet tiny-inside-huge is
    * precisely this key's signal. Round 16 closes most of that gap
    * with an ASYMMETRY-AWARE supplement: docs whose gram set is
    * ≤ [[SmallSideGrams]] get the full lossless index
    * ([[PairJoins.smallSideCandidates]] — its own volume probe gates
    * it), so a contained pair is missed only when BOTH sides exceed
    * [[SmallSideGrams]] grams AND the ratio is high enough to
    * degrade banding — the one residual, seeded-probabilistic with
    * the stated per-pair bound. Output is a verified subset in every
    * branch (precision 1 by construction).
    */
  val dedupNgramContainment: Q = (s, dir) => {
    val tau = 0.8 // integer form: 5·shared ≥ 4·min(|A|,|B|)
    val grams = graft.functions.TextExpressions.wordShingles(col("text"), 2)
    val d = table(s, dir, "documents")
      .select(col("doc_id"), col("lang"), grams.as("grams"))
      .filter(size(col("grams")) > 0)
      .select(col("doc_id"), col("lang"), size(col("grams")).as("gsz"), col("grams"))
    // session-shared inverted index (round 14): identical to the
    // jaccard twin's relation — one SessionCache checkpoint serves
    // both keys and the eager df probe (the per-key localCheckpoint
    // this replaces was the r7 ADVICE fix; sharing subsumes it)
    val inv = PairJoins.bigramInv(s, dir)
    val dfreq = PairJoins.bigramDfreq(s, dir)
    // Round 15: third dispatch branch (see [[Llm2.dedupNgramJaccard]]
    // — same measured rationale): above [[PairJoins.BandedPairVolume]]
    // on a uniform vocabulary the Σ df² join cannot run (sf1 DNF,
    // BASELINE.md r14 scaling row) and the MinHash-banded front-end
    // generates candidates for the SAME exact verify. Containment
    // banding is 64 bands × 2 rows, NO size-ratio bound (tiny-inside-
    // huge is the signal). Parameter reasoning, because containment
    // is NOT what minhash natively approximates: a τ = 0.8-contained
    // pair at size ratio k has Jaccard J = 0.8/(k + 0.2), so the
    // collision curve P = 1−(1−J²)⁶⁴ reads ≈ 1.0 at k ≤ 2, 0.98 at
    // k = 3, 0.87 at k = 4, 0.71 at k = 5, then degrades — while a
    // 1-row band (whose curve stays high at low J) was MEASURED
    // unusable here: at this corpus's background J ≈ 0.006 it admits
    // ~13 % of ALL in-lang pairs (28.8 s vs 18.8 s exact at sf0.3 —
    // slower than the join it replaces), where 2-row bands admit
    // ~0.2 %. So the banded branch certifies recall for moderate
    // asymmetry (ratio ≲ 4) and the gate SFs keep the exact branches;
    // EXTREME tiny-inside-huge at 100 TB is the substring family's
    // job ([[SubstringIndex]]/`dedup_substring_span`), whose index
    // scales linearly and catches verbatim quotes at any ratio.
    // Measured recall per corpus is pinned in the BASELINE.md r15 row.
    val (hotShare, predVolume) = PairJoins.dfProfile(dfreq)
    val candidates = if (hotShare <= 1.0 &&
        predVolume > PairJoins.BandedPairVolume) {
      val banded = PairJoins.bandedCandidates(d, nPerm = 128, bands = 64,
        sizeRatio = None).select(col("a_id"), col("b_id"))
      // Asymmetry-aware supplement (round 16, r15 ADVICE — see the
      // contract paragraph above): small docs get the full lossless
      // index so high-ratio contained pairs with a small small-side
      // are found exactly; gated on ITS OWN predicted volume so a
      // mostly-small corpus cannot reopen the Σ df² door banding
      // just closed.
      if (PairJoins.smallSideVolume(inv, dfreq, Curation.SmallSideGrams)
          <= PairJoins.BandedPairVolume) {
        banded.union(
          PairJoins.smallSideCandidates(inv, Curation.SmallSideGrams,
            num = 4, den = 5)).distinct()
      } else banded
    } else if (hotShare <= 1.0) {
      // shared-count shape. The pair join emits BARE packed keys:
      // Σ df² rows is the join's irreducible volume, so every byte on
      // those rows is paid Σ df² times. Doc sizes re-attach AFTER the
      // count from the tiny (doc_id, gsz) dimension via broadcast —
      // the counted relation is pair-distinct (orders of magnitude
      // smaller), and the integer containment bound prunes it before
      // the verify.
      val a = inv.select(col("gh"), col("doc_id").as("a_id"))
      val b = inv.select(col("gh").as("b_gh"), col("doc_id").as("b_id"))
        .hint("shuffle_hash")
      val sizes = d.select(col("doc_id"), col("gsz"))
      a.join(b, col("gh") === col("b_gh") && col("a_id") < col("b_id"))
        .select(shiftleft(col("a_id").cast("long"), 32)
          .bitwiseOR(col("b_id").cast("long")).as("pk"))
        .groupBy(col("pk"))
        .agg(count(lit(1)).as("shared_h"))
        .select(shiftright(col("pk"), 32).cast("int").as("a_id"),
          col("pk").bitwiseAND(lit(0xFFFFFFFFL)).cast("int").as("b_id"),
          col("shared_h"))
        .join(broadcast(sizes.select(col("doc_id").cast("int").as("a_id"),
          col("gsz").as("a_sz"))), "a_id")
        .join(broadcast(sizes.select(col("doc_id").cast("int").as("b_id"),
          col("gsz").as("b_sz"))), "b_id")
        .filter(lit(5) * col("shared_h") >= lit(4) * least(col("a_sz"), col("b_sz")))
        .select(col("a_id"), col("b_id"))
    } else {
      // τ = 0.8 pigeonhole: a qualifying pair leaves the smaller doc
      // fewer than ⌊gsz/5⌋+1 unshared grams; no size-ratio bound —
      // tiny-inside-huge is exactly the containment signal
      PairJoins.prefixCandidates(inv, dfreq, prefixDivisor = 5,
        sizeRatio = None).select(col("a_id"), col("b_id"))
    }
    candidates
      .join(d.select(col("doc_id").as("a_id"), col("lang"),
        col("grams").as("a_grams"), col("gsz").as("a_sz")), "a_id")
      .join(d.select(col("doc_id").as("b_id"), col("lang").as("b_lang"),
        col("grams").as("b_grams"), col("gsz").as("b_sz")), "b_id")
      // lang blocking rides the gram hash; re-check so a 64-bit
      // collision cannot admit a cross-lang pair
      .filter(col("lang") === col("b_lang"))
      .withColumn("shared", size(array_intersect(col("a_grams"), col("b_grams"))))
      .withColumn("containment",
        col("shared").cast("double") / least(col("a_sz"), col("b_sz")).cast("double"))
      .filter(col("containment") >= tau)
      .select("lang", "a_id", "b_id", "containment")
      .orderBy("lang", "a_id", "b_id")
  }

  // --------------------------------------------------- per-domain cap

  /** Per-source admission cap — keep at most `cap` documents per
    * source/domain, chosen by a deterministic salted-hash admission
    * order (the Common-Crawl-style anti-spam lever: one domain cannot
    * flood the corpus no matter how many pages it serves). Hash order
    * (not "first by doc_id") so the kept subset is an unbiased sample
    * of the domain AND stable under corpus growth: a new crawl adds
    * candidates but never reshuffles the admission ranks of old docs
    * relative to each other.
    *
    * Scale shape: one window partitioned by source — domains are
    * numerous (millions), so the partitioning is well-spread; a
    * pathological mega-domain is exactly what the cap truncates.
    */
  val sampleDomainCap: Q = (s, dir) => {
    val cap = 10
    val adm = md5(concat_ws("|", lit("graft-domaincap"), col("doc_id").cast("string")))
    val w = Window.partitionBy(col("source")).orderBy(col("adm"), col("doc_id"))
    table(s, dir, "documents")
      .withColumn("adm", adm)
      .withColumn("rk", row_number().over(w))
      .filter(col("rk") <= cap)
      .select("source", "rk", "doc_id")
      .orderBy("source", "rk")
  }

  // ------------------------------------------------------ SCD2 history

  /** Slowly-changing-dimension (type 2) history from an update stream:
    * each event is a new version of its user's `value`; versions get
    * `[valid_from, valid_to)` intervals via `lead(ts)` and the open
    * interval marks the current row. The standard warehouse pattern
    * for dimension snapshots — one partitioned window, no self-join
    * (the naive `t1 JOIN t2 ON t2.ts > t1.ts` formulation is O(n²)
    * per user and was never on the table).
    *
    * (ts, event_id) is the deterministic version order — ts alone has
    * ties within a user.
    */
  val dimScd2History: Q = (s, dir) => {
    val w = Window.partitionBy(col("user_id")).orderBy(col("ts"), col("event_id"))
    table(s, dir, "events")
      .select(col("user_id"), col("ts"), col("event_id"), col("value"))
      .withColumn("version", row_number().over(w))
      .withColumn("valid_from", col("ts"))
      .withColumn("valid_to", lead(col("ts"), 1).over(w))
      .withColumn("is_current", col("valid_to").isNull)
      .select("user_id", "version", "valid_from", "valid_to", "value", "is_current")
      .orderBy("user_id", "version")
  }

  // ------------------------------------------------ bloom semi-join

  /** Semi-join reduction via a Bloom filter — the runtime-filter
    * pattern made explicit (and exact, and oracle'd). The dimension
    * side (urgent orders) builds a distributed Bloom filter over its
    * keys; the fact side (lineitem) applies the filter AT THE SCAN as
    * a codegen'd predicate, so only candidate rows reach the semi
    * join's exchange. The join above the filter removes the fpp false
    * positives — false negatives are impossible — so the result is
    * row-identical to the plain semi join the oracle runs.
    *
    * The semi join is pinned to shuffle_hash: this key demonstrates
    * the regime where the dimension is too big to broadcast (otherwise
    * a broadcast join would subsume the bloom). At 100 TB the filter
    * (~1.2 MB per 10⁶ keys at 1 % fpp) broadcasts where the hash
    * relation (~50 MB+) cannot, and the fact-side exchange shrinks by
    * the filter's selectivity — that is the whole point.
    */
  val joinBloomSemi: Q = (s, dir) => {
    val urgent = table(s, dir, "orders")
      .filter(col("o_orderpriority") === "1-URGENT")
      .select("o_orderkey")
    // sizing pass over the (small, filtered) dimension only; at scale
    // this count comes from table stats instead
    val bf = urgent.stat.bloomFilter("o_orderkey", math.max(urgent.count(), 1000L), 0.01)
    val bytes = graft.functions.BloomExpr.serialize(bf)
    table(s, dir, "lineitem")
      .filter(graft.functions.BloomExpr.mightContainLong(col("l_orderkey"), bytes))
      .join(urgent.hint("shuffle_hash"),
        col("l_orderkey") === col("o_orderkey"), "left_semi")
      .groupBy("l_returnflag")
      .agg(count(lit(1)).as("n_items"), dsum(col("l_quantity")).as("sum_qty"))
      .orderBy("l_returnflag")
  }

  // ------------------------------------------------ salted skew join

  /** Fact-to-dimension join through [[Skew.saltedJoin]], aggregated —
    * the manual skew lever as an ORACLE'D query: the salted plan's
    * result is machine-checked row-identical to the plain join the
    * DuckDB oracle runs. Salting spreads each hot key over 8 sub-keys
    * (the dimension is replicated 8×, the price of the spread); the
    * BASELINE.md r5 study measured this ~20 % faster than AQE's
    * skew-join split on a 40 %-hot-key join, and a wash on uniform
    * keys like these — the key exists to pin the SEMANTICS of the
    * lever, the study pins its economics.
    */
  val joinSkewSalted: Q = (s, dir) => {
    val ord = table(s, dir, "orders")
      .select(col("o_orderkey").as("l_orderkey"), col("o_orderpriority"))
    Skew.saltedJoin(table(s, dir, "lineitem"), ord,
        key = "l_orderkey", discriminator = "l_partkey", salts = 4)
      .groupBy("o_orderpriority")
      .agg(count(lit(1)).as("n_items"),
        dsumProduct(col("l_extendedprice"), lit(1.0) - col("l_discount")).as("revenue"))
      .orderBy("o_orderpriority")
  }

  // --------------------------------------- unigram LM surprisal

  /** Per-document average unigram surprisal (−ln p(token) under the
    * corpus's own unigram model) — the classic cheap perplexity proxy
    * for quality filtering: boilerplate and keyword-stuffed docs score
    * LOW (their tokens are corpus-frequent), lorem-noise scores HIGH.
    * CCNet-style filtering uses a trained LM; the unigram self-model
    * is its deterministic, SQL-expressible core.
    *
    * Two-phase shape: token counts (one shuffle on token), then a
    * token→frequency join (shuffle on token — the vocabulary is
    * unbounded at 100 TB, so no broadcast), then a per-doc aggregate.
    * Float discipline (SURVEY §7.4): each token's −ln p is rounded to
    * 6 decimals and cast to exact decimal BEFORE the per-doc sum, so
    * association order cannot move the result; the only cross-engine
    * risk left is libm `ln` ULP disagreement at a rounding boundary —
    * the same exposure `text_tfidf_topterms` has carried green since
    * round 1.
    */
  private[graft] def docAvgNll(s: org.apache.spark.sql.SparkSession, dir: String) =
      SessionCache.of(s, dir, "tok-avgnll") {
    // the canonical token spine (round 15 sharing) — this tokenizer
    // is byte-identical to InfoTheory's; the cached OUTPUT is one
    // tiny (doc, n_toks, avg_nll) row per doc serving both the
    // logprob key and the perplexity band
    val tok = InfoTheory.tokSpine(s, dir).select(col("doc_id"), col("tok"))
    val freq = tok.groupBy(col("tok")).agg(count(lit(1)).as("c"))
    val total = freq.agg(sum(col("c")).as("n_total"))
    val nll = round(-log(col("c").cast("double") / col("n_total").cast("double")), 6)
      .cast("decimal(18,6)")
    tok.join(freq, "tok")
      .crossJoin(broadcast(total))
      .select(col("doc_id"), nll.as("nll"))
      .groupBy(col("doc_id"))
      .agg(count(lit(1)).as("n_toks"),
        round(sum(col("nll")).cast("double") / count(lit(1)), 6).as("avg_nll"))
  }

  val textUnigramLogprob: Q = (s, dir) =>
    docAvgNll(s, dir).orderBy("doc_id")

  /** CCNet-style perplexity banding (round 7): each document is
    * assigned a quality band from its average unigram surprisal —
    * the head/middle/tail split CCNet uses to keep, review, or drop
    * web text (there, under a trained KenLM; here, under the
    * deterministic unigram self-model of [[textUnigramLogprob]]).
    * Band thresholds are tuned so every band discriminates on this
    * corpus (the [[Curation2.textGopherRules]] convention). The
    * banded compare runs on the 6-dp-rounded avg — already proven
    * engine-identical by the logprob key — so the CASE cannot flip
    * across engines.
    */
  val textPerplexityBucket: Q = (s, dir) =>
    docAvgNll(s, dir)
      .withColumn("ppl_band",
        when(col("avg_nll") < 3.40, "head")
          .when(col("avg_nll") < 3.41, "middle")
          .otherwise("tail"))
      .orderBy("doc_id")

  // ------------------------------------------------ document chunking

  /** Sliding-window document chunking (round 6): each document becomes
    * overlapping 32-token chunks on a 24-token stride — the
    * training/RAG preprocessing step between curation and packing
    * (`pack_sequences` packs whole docs; this splits long docs so no
    * sequence exceeds the context budget, with overlap so no span
    * loses its context at a chunk boundary).
    *
    * Scale shape: purely row-local — tokenize once, explode the
    * ceil(n/stride) chunk starts per doc, slice the token array per
    * start. No shuffle at all before the presentation sort; fan-out
    * per doc is n/stride + 1 rows, linear in corpus tokens. The chunk
    * id is start/stride, so (doc_id, chunk_id) is a stable key under
    * re-runs.
    */
  val textChunkOverlap: Q = (s, dir) => {
    val chunk = 32
    val stride = 24
    val toksC = split(regexp_replace(trim(col("text")), "\\s+", " "), " ")
    table(s, dir, "documents")
      .filter(trim(col("text")) =!= "")
      .select(col("doc_id"), toksC.as("toks"))
      .withColumn("strt",
        explode(sequence(lit(0), size(col("toks")) - 1, lit(stride))))
      .select(col("doc_id"),
        (col("strt") / stride).cast("int").as("chunk_id"),
        size(slice(col("toks"), col("strt") + 1, lit(chunk))).as("n_toks"),
        concat_ws(" ", slice(col("toks"), col("strt") + 1, lit(chunk))).as("chunk_text"))
      .orderBy("doc_id", "chunk_id")
  }

  // ------------------------------------------------- recursive CTE

  /** `WITH RECURSIVE` through the SQL text path (Spark 4 supports
    * recursive CTEs natively): a 12-month date spine generated by
    * recursion, left-joined to orders so empty months surface as
    * zero. The recursive-union surface is what a SQL engine must
    * provide for graph/spine workloads; the distributed part (the
    * join + aggregate) stays a plain shuffle — the recursion itself
    * produces 12 driver-side rows, which is the only regime a
    * recursive spine is FOR.
    */
  val sqlRecursiveCte: Q = (s, dir) => {
    table(s, dir, "orders").createOrReplaceTempView("orders")
    s.sql("""
      WITH RECURSIVE months(m) AS (
        SELECT DATE '1995-01-01'
        UNION ALL
        SELECT m + INTERVAL '1' MONTH FROM months WHERE m < DATE '1995-12-01'
      )
      SELECT m, count(o_orderkey) AS n_orders
      FROM months
      LEFT JOIN orders ON CAST(date_trunc('month', o_orderdate) AS DATE) = m
      GROUP BY m
      ORDER BY m""")
  }

  val queries: Map[String, Q] = Map(
    "decontaminate_ngram" -> decontaminateNgram,
    "dedup_ngram_containment" -> dedupNgramContainment,
    "sample_domain_cap" -> sampleDomainCap,
    "dim_scd2_history" -> dimScd2History,
    "join_bloom_semi" -> joinBloomSemi,
    "join_skew_salted" -> joinSkewSalted,
    "sql_recursive_cte" -> sqlRecursiveCte,
    "text_unigram_logprob" -> textUnigramLogprob,
    "text_perplexity_bucket" -> textPerplexityBucket,
    "text_chunk_overlap" -> textChunkOverlap,
  )
}
