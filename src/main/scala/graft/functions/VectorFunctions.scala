package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Embedding-vector primitives over `array<float>` / `array<double>`
  * columns. The inner product is a native codegen'd Catalyst expression
  * ([[ArrayDotProduct]]) — Spark's higher-order functions (`zip_with`,
  * `aggregate`) are interpreted and would dominate pair-scoring queries.
  * Float elements are widened to double per element (exact), accumulation
  * is sequential double — bit-identical to the portable SQL oracle
  * formulations.
  */
object VectorFunctions {

  def dot(a: Column, b: Column): Column = ArrayDotProduct(a, b)

  def norm2(a: Column): Column = sqrt(ArrayDotProduct(a, a))

  /** Cosine similarity; 0.0 when either vector has zero norm. Computes both
    * norms inline — for pair-scoring joins precompute norms per row and use
    * [[cosineWithNorms]] so each norm is computed once per vector, not once
    * per pair. */
  def cosine(a: Column, b: Column): Column = {
    val na = norm2(a)
    val nb = norm2(b)
    when(na === 0.0 || nb === 0.0, 0.0).otherwise(dot(a, b) / (na * nb))
  }

  /** Cosine from a precomputed pair dot and per-row norms. */
  def cosineWithNorms(dotAB: Column, na: Column, nb: Column): Column =
    when(na === 0.0 || nb === 0.0, 0.0).otherwise(dotAB / (na * nb))

  def l2Distance(a: Column, b: Column): Column = {
    // ||a-b||^2 = a·a - 2a·b + b·b, all three codegen'd
    val d2 = dot(a, a) - lit(2.0) * dot(a, b) + dot(b, b)
    sqrt(greatest(d2, lit(0.0)))
  }

  /** Johnson-Lindenstrauss random projection: compress a `dims`-vector to
    * `outDims` components via deterministic ±1 hyperplanes (the same
    * md5-derived sign chains as [[lshBucket]], WITHOUT the sign
    * threshold), scaled by 1/√outDims so pairwise distances are
    * approximately preserved. Each output component is one codegen'd dot
    * product, rounded to 6 places — the rounding pins the projected
    * vectors bit-identical across engines, so everything downstream
    * (cosine, ANN, clustering) stays oracle-checkable. The projection is
    * the bandwidth/storage lever BEFORE the index: at 100 TB a 4×
    * dimension cut is a 4× cut in everything the ANN layer shuffles,
    * scans, and caches, at a quantifiable recall cost (benched as
    * `ann_rp_brute` in `recall_at_10`). */
  def randomProject(v: Column, outDims: Int, dims: Int,
                    seed: String = "rp"): Column = {
    val scale = math.sqrt(outDims.toDouble)
    array((0 until outDims).map { j =>
      val plane = array((0 until dims).map { i =>
        lit(if ((TextFunctions.md5Long60(s"${seed}_${j}_$i") & 1L) == 0L) 1.0
            else -1.0)
      }: _*)
      round(ArrayDotProduct(v, plane) / lit(scale), 6)
    }: _*)
  }

  /** Random-hyperplane LSH bucket id: `nBits` sign bits of projections onto
    * deterministic ±1 hyperplanes (derived from md5, so stable across runs
    * and engines). Hyperplanes are plan-time literal arrays over `dims`
    * dimensions — each projection is one codegen'd dot product. Vectors in
    * the same bucket are cosine-similar candidates; this cuts ANN search
    * from O(N·Q) to per-bucket work. */
  def lshBucket(v: Column, nBits: Int, dims: Int, seed: String = ""): Column = {
    val prefix = if (seed.isEmpty) "" else s"${seed}_"
    val bits = (0 until nBits).map { b =>
      val plane = array((0 until dims).map { i =>
        lit(if ((TextFunctions.md5Long60(s"$prefix${b}_$i") & 1L) == 0L) 1.0 else -1.0)
      }: _*)
      when(ArrayDotProduct(v, plane) >= 0.0, shiftleft(lit(1L), b)).otherwise(lit(0L))
    }
    bits.reduce(_ bitwiseOR _)
  }
}
