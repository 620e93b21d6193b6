package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Vector math over `array<float>` embedding columns. Floats are cast to
  * double BEFORE multiply/accumulate: the cast is exact, keeps accumulation
  * precision, and makes results reproducible against any double-precision
  * oracle.
  *
  * The dot product is a custom codegen'd Catalyst expression
  * ([[graft.expressions.DotProduct]]): the HOF formulation
  * (`aggregate(zip_with(...))`) is CodegenFallback in Spark — interpreted
  * lambdas plus a per-pair intermediate array — and measured ~4x slower on
  * the pair-heavy similarity queries. Identical fold order → identical
  * doubles.
  */
object VectorFunctions {

  /** Sequential ascending-index dot product in double precision
    * (codegen'd primitive loop).
    */
  def dot(a: Column, b: Column): Column =
    graft.expressions.VectorExpressions.dotProduct(a, b)

  def normSq(a: Column): Column = dot(a, a)

  def cosine(a: Column, b: Column): Column =
    dot(a, b) / (sqrt(normSq(a)) * sqrt(normSq(b)))

  /** Cosine from precomputed squared norms (avoids recomputing per pair). */
  def cosineWithNorms(dotAb: Column, normSqA: Column, normSqB: Column): Column =
    dotAb / (sqrt(normSqA) * sqrt(normSqB))

  /** Deterministic random-hyperplane set for sign-LSH: nPlanes × dim
    * Gaussian coefficients from a fixed seed. Stable across releases —
    * bucket ids are persisted artifacts.
    */
  def hyperplanes(nPlanes: Int, dim: Int, seed: Long = 7L): Array[Array[Double]] = {
    val rnd = new scala.util.Random(seed)
    Array.fill(nPlanes)(Array.fill(dim)(rnd.nextGaussian()))
  }

  /** Sign-LSH bucket id: bit p set iff dot(vec, plane_p) > 0. Cosine-similar
    * vectors collide with high probability; bucket equality join replaces
    * all-pairs search.
    */
  def lshBucket(vec: Column, planes: Array[Array[Double]]): Column =
    planes.zipWithIndex.map { case (p, i) =>
      when(dot(vec, typedlit(p.toSeq)) > 0, lit(1L << i)).otherwise(lit(0L))
    }.reduce(_.bitwiseOR(_))

  /** The bucket plus all Hamming-1 neighbors (multiprobe): query-side
    * expansion that recovers most boundary losses for nPlanes× fewer probes
    * than exact search.
    */
  def multiprobeBuckets(bucket: Column, nPlanes: Int): Column =
    array((bucket +: (0 until nPlanes).map(j => bucket.bitwiseXOR(lit(1L << j)))): _*)
}
