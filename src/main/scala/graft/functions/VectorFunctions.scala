package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Vector math over `array<float>` embedding columns, built from codegen'd
  * higher-order functions (zip_with/aggregate) — no UDF deserialization in
  * the hot path. Floats are cast to double BEFORE multiply/accumulate: the
  * cast is exact, keeps accumulation precision, and makes results
  * reproducible against any double-precision oracle.
  *
  * At 100 TB a dedicated Catalyst Expression with doGenCode over the raw
  * float arrays would shave the lambda overhead; these HOFs are the
  * composition-first baseline (preference order (a) in the build brief).
  */
object VectorFunctions {

  /** Sequential left-fold dot product in double precision. */
  def dot(a: Column, b: Column): Column =
    aggregate(
      zip_with(a, b, (x, y) => x.cast("double") * y.cast("double")),
      lit(0.0), (acc, v) => acc + v)

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
