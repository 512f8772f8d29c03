package graft.ops

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Shared random-hyperplane (sign) LSH geometry — ONE set of
  * deterministic hyperplanes used by every sign-LSH consumer
  * ([[Llm2.simLshHyperplane]], [[Llm.exactCosinePairs]]'s banded
  * blocking), so signatures agree across operators and an index built
  * by one is probe-able by another.
  *
  * 16 Gaussian hyperplanes from a fixed-seed JVM RNG (build-time
  * constant, ~8 kB — a literal in the plan, never a join input).
  * sign(v·hp) == sign(cos(v, hp)), so the bit evaluation rides the
  * codegen'd cosine expression; the per-vector signature is map-only.
  * Banding: 4 bands × 4 bits. For cos θ ≈ 0.99 pairs,
  * P(≥1 clean band) ≈ 1−(1−0.955⁴)⁴ ≈ 0.999; recall decays along the
  * LSH S-curve for weaker pairs — that is the approximation contract
  * (production near-dup thresholds sit at 0.9+ where the curve is
  * flat).
  */
private[graft] object SignLsh {

  val NPlanes = 16
  val NBands = 4
  val BitsPerBand = 4

  /** Hyperplane literals (seed 42 — the same construction
    * simLshHyperplane shipped with, kept bit-identical so existing
    * recall specs and any persisted signatures stay valid).
    */
  val planes: Array[Array[Double]] = {
    val rnd = new scala.util.Random(42)
    Array.fill(NPlanes)(Array.fill(64)(rnd.nextGaussian()))
  }

  /** 16-bit sign signature of a double vector (map-only; hyperplane
    * literals are truncated to the data's dim by cosine_sim's
    * min-length guard).
    */
  def sig(v: Column): Column =
    planes.zipWithIndex.map { case (hp, k) =>
      when(graft.functions.TextExpressions.cosineSim(v, lit(hp)) > 0,
        lit(1L << k)).otherwise(0L)
    }.reduce(_ + _)

  /** The signature's band array: (band, bv) structs to explode into
    * narrow collision-join rows.
    */
  def bands(sig: Column): Column =
    array((0 until NBands).map(b =>
      struct(lit(b).as("band"),
        shiftright(sig, b * BitsPerBand)
          .bitwiseAND((1L << BitsPerBand) - 1).as("bv"))): _*)
}
