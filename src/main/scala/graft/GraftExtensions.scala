package graft

import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo, Literal}

import graft.functions.TextExpressions.{BoundRank, CentroidRanks, CosineSim, DelKeys, MinHashSigs, RollingHash, SimHash64, WordShingles}

/** Engine extension point (`spark.sql.extensions=graft.GraftExtensions`):
  * registers the native expressions so they resolve by name from both
  * the Column API (`call_function`) and SQL. This is the supported
  * public seam for custom Catalyst expressions — no private Spark API
  * is touched.
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(ext: SparkSessionExtensions): Unit = {
    ext.injectFunction((
      new FunctionIdentifier("word_shingles"),
      new ExpressionInfo(classOf[WordShingles].getName, "word_shingles"),
      (args: Seq[Expression]) => args match {
        case Seq(text, Literal(n: Int, _)) => WordShingles(text, n)
        case _ => throw new IllegalArgumentException(
          "word_shingles(text, n) expects a string column and an int literal")
      }))
    ext.injectFunction((
      new FunctionIdentifier("cosine_sim"),
      new ExpressionInfo(classOf[CosineSim].getName, "cosine_sim"),
      (args: Seq[Expression]) => args match {
        case Seq(a, b) => CosineSim(a, b)
        case _ => throw new IllegalArgumentException("cosine_sim(a, b) expects two array columns")
      }))
    ext.injectFunction((
      new FunctionIdentifier("simhash64"),
      new ExpressionInfo(classOf[SimHash64].getName, "simhash64"),
      (args: Seq[Expression]) => args match {
        case Seq(features) => SimHash64(features)
        case _ => throw new IllegalArgumentException(
          "simhash64(features) expects one array<string> column")
      }))
    ext.injectFunction((
      new FunctionIdentifier("minhash_sigs"),
      new ExpressionInfo(classOf[MinHashSigs].getName, "minhash_sigs"),
      (args: Seq[Expression]) => args match {
        case Seq(features, Literal(n: Int, _)) => MinHashSigs(features, n)
        case _ => throw new IllegalArgumentException(
          "minhash_sigs(features, nPerm) expects an array<string> column and an int literal")
      }))
    ext.injectFunction((
      new FunctionIdentifier("del_keys"),
      new ExpressionInfo(classOf[DelKeys].getName, "del_keys"),
      (args: Seq[Expression]) => args match {
        case Seq(text, Literal(k: Int, _)) => DelKeys(text, k)
        case _ => throw new IllegalArgumentException(
          "del_keys(text, k) expects a string column and an int literal")
      }))
    ext.injectFunction((
      new FunctionIdentifier("centroid_ranks"),
      new ExpressionInfo(classOf[CentroidRanks].getName, "centroid_ranks"),
      (args: Seq[Expression]) => args match {
        case Seq(v, cents) => CentroidRanks(v, cents)
        case _ => throw new IllegalArgumentException(
          "centroid_ranks(v, cents) expects a vector column and a centroid-array column")
      }))
    ext.injectFunction((
      new FunctionIdentifier("rolling_hash"),
      new ExpressionInfo(classOf[RollingHash].getName, "rolling_hash"),
      (args: Seq[Expression]) => args match {
        case Seq(text) => RollingHash(text)
        case _ => throw new IllegalArgumentException(
          "rolling_hash(text) expects one string column")
      }))
    ext.injectFunction((
      new FunctionIdentifier("bound_rank"),
      new ExpressionInfo(classOf[BoundRank].getName, "bound_rank"),
      (args: Seq[Expression]) => args match {
        case Seq(bnds, v) => BoundRank(bnds, v)
        case _ => throw new IllegalArgumentException(
          "bound_rank(bnds, v) expects an array<double> column and a double column")
      }))
    ext.injectFunction((
      new FunctionIdentifier("bloom_might_contain_long"),
      new ExpressionInfo(
        classOf[graft.functions.BloomExpr.BloomMightContainLong].getName,
        "bloom_might_contain_long"),
      (args: Seq[Expression]) => args match {
        case Seq(key, Literal(bytes: Array[Byte], _)) =>
          graft.functions.BloomExpr.BloomMightContainLong(key, bytes)
        case _ => throw new IllegalArgumentException(
          "bloom_might_contain_long(key, filterBytes) expects a long column and a binary literal")
      }))
    ext.injectFunction((
      new FunctionIdentifier("image_meta"),
      new ExpressionInfo(
        classOf[graft.functions.ImageExpr.ImageMeta].getName, "image_meta"),
      (args: Seq[Expression]) => args match {
        case Seq(b) => graft.functions.ImageExpr.ImageMeta(b)
        case _ => throw new IllegalArgumentException(
          "image_meta(bytes) expects one binary column")
      }))
    ext.injectFunction((
      new FunctionIdentifier("log2_fixed"),
      new ExpressionInfo(
        classOf[graft.functions.NumericExpressions.Log2Fixed].getName, "log2_fixed"),
      (args: Seq[Expression]) => args match {
        case Seq(c) => graft.functions.NumericExpressions.Log2Fixed(c)
        case _ => throw new IllegalArgumentException(
          "log2_fixed(c) expects one integral column")
      }))
    ext.injectFunction((
      new FunctionIdentifier("hilbert_d16"),
      new ExpressionInfo(
        classOf[graft.functions.NumericExpressions.Hilbert16].getName, "hilbert_d16"),
      (args: Seq[Expression]) => args match {
        case Seq(x, y) => graft.functions.NumericExpressions.Hilbert16(x, y)
        case _ => throw new IllegalArgumentException(
          "hilbert_d16(x, y) expects two integral columns")
      }))
    ext.injectFunction((
      new FunctionIdentifier("exp2_fixed"),
      new ExpressionInfo(
        classOf[graft.functions.NumericExpressions.Exp2Fixed].getName, "exp2_fixed"),
      (args: Seq[Expression]) => args match {
        case Seq(c) => graft.functions.NumericExpressions.Exp2Fixed(c)
        case _ => throw new IllegalArgumentException(
          "exp2_fixed(x20) expects one integral column")
      }))
    ext.injectOptimizerRule(_ => graft.plans.LevenshteinPrefilter)
  }
}
