package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Embedding-vector primitives over `array<float>` / `array<double>`
  * columns, built from codegen'd higher-order functions (`zip_with`,
  * `aggregate`) — no UDFs, no MLlib Vector boxing in the hot path, so
  * similarity scans stay inside WholeStageCodegen and distribute as pure
  * narrow per-row work.
  */
object VectorFunctions {

  private def d(c: Column): Column = c.cast("array<double>")

  /** Sum of elements of a double array. */
  private def asum(c: Column): Column =
    aggregate(c, lit(0.0), (acc, x) => acc + x)

  def dot(a: Column, b: Column): Column =
    asum(zip_with(d(a), d(b), (x, y) => x * y))

  def norm2(a: Column): Column = sqrt(asum(transform(d(a), x => x * x)))

  /** Cosine similarity; 0.0 when either vector has zero norm. */
  def cosine(a: Column, b: Column): Column = {
    val na = norm2(a)
    val nb = norm2(b)
    when(na === 0.0 || nb === 0.0, 0.0).otherwise(dot(a, b) / (na * nb))
  }

  def l2Distance(a: Column, b: Column): Column =
    sqrt(asum(zip_with(d(a), d(b), (x, y) => (x - y) * (x - y))))

  /** Random-hyperplane LSH bucket id (deterministic seed): `nBits` sign
    * bits of projections onto pseudo-random ±1 hyperplanes. Vectors in the
    * same bucket are cosine-similar candidates; used to cut ANN search from
    * O(N·Q) to per-bucket work. The ±1 "hyperplane" for (bit b, dim i) is
    * derived from the portable 60-bit hash so the bucketing is
    * deterministic across runs and engines. */
  def lshBucket(v: Column, nBits: Int): Column = {
    val vd = d(v)
    val bits = (0 until nBits).map { b =>
      // projection = sum_i v[i] * sign(hash(b,i))
      val proj = aggregate(
        zip_with(vd, sequence(lit(0), size(vd) - 1), (x, i) =>
          x * when(
            TextFunctions.hash60(concat_ws("_", lit(b.toString), i))
              .bitwiseAND(lit(1L)) === 0L, 1.0).otherwise(-1.0)),
        lit(0.0), (acc, x) => acc + x)
      when(proj >= 0.0, shiftleft(lit(1L), b)).otherwise(lit(0L))
    }
    bits.reduce(_ bitwiseOR _)
  }
}
