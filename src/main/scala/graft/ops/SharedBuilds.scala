package graft.ops

import org.apache.spark.sql.SparkSession

/** The registry of session-shared [[SessionCache]] relations, in
  * dependency order (round 16 — the r15 verdict's item 5: per-key
  * bench attribution for shared builds).
  *
  * Why this exists: a shared relation is built by whichever consumer
  * key happens to run FIRST (alphabetical in the bench loop), so that
  * key's per-key number silently absorbs the whole family's build
  * cost — `dedup_exact_hash` looked 2 s slower than its marginal cost
  * while it carried the bigram inverted index. [[graft.Bench]]
  * materializes these entries BEFORE the timed query loop and reports
  * each as its own `builds` entry in the bench JSON; the suite total
  * still includes every build second (nothing leaves the timed
  * surface — the accounting moves, the honesty doesn't), and every
  * consumer key's number becomes its steady-state marginal cost, the
  * same quantity the isolated `SPARK_GRAFT_ONLY` protocol measures.
  *
  * DEPENDENCY ORDER is load-bearing for attribution: an entry built
  * from an earlier entry (tok-bigram from tok-spine, ngram-df2 from
  * ngram-inv2, bpe-state from bpe-rules, cluster-labels from
  * brand-profiles) must follow it, so each row times only its own
  * marginal work.
  *
  * Keep this list in sync with the `SessionCache.of` call sites
  * (grep `SessionCache.of`); a missing entry is not a correctness bug
  * — the first consumer just reverts to carrying that build.
  */
object SharedBuilds {

  /** (cache kind, materializer) — calling the accessor runs the
    * eager localCheckpoint if absent; `.count()` is unnecessary.
    */
  val all: Seq[(String, (SparkSession, String) => Unit)] = Seq(
    "tok-spine" -> ((s, d) => { InfoTheory.tokSpine(s, d); () }),
    "tok-bigram" -> ((s, d) => { InfoTheory.tokBigrams(s, d); () }),
    "tok-unicnt" -> ((s, d) => { InfoTheory.tokLangCounts(s, d); () }),
    "tok-doccnt" -> ((s, d) => { InfoTheory.tokDocCounts(s, d); () }),
    "tok-avgnll" -> ((s, d) => { Curation.docAvgNll(s, d); () }),
    "ngram-inv2" -> ((s, d) => { PairJoins.bigramInv(s, d); () }),
    "ngram-df2" -> ((s, d) => { PairJoins.bigramDfreq(s, d); () }),
    "ngram-df4pos" -> ((s, d) => { PairJoins.quadgramDfreq(s, d); () }),
    "graph-directed" -> ((s, d) => { Graph.directedEdgesCached(s, d); () }),
    "graph-canonical" -> ((s, d) => { Graph.canonicalUndirectedEdges(s, d); () }),
    "graph-both" -> ((s, d) => { Graph.undirectedBothEdges(s, d); () }),
    "graph-tris" -> ((s, d) => { Graph.triangleTriples(s, d); () }),
    "events-daily" -> ((s, d) => { EventsBase.dailyCounts(s, d); () }),
    "bpe-rules-k8" -> ((s, d) => { Bpe.trainedRulesShared(s, d); () }),
    "bpe-state-k8" -> ((s, d) => { Bpe.trainedStateShared(s, d); () }),
    "brand-profiles" -> ((s, d) => { Bipartite.profiles(s, d); () }),
    "cluster-labels" -> ((s, d) => { Bipartite.clusterLabels(s, d); () }),
  )
}
