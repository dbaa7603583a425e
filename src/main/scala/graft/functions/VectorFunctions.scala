package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Fixed-dimension vector math as flat codegen'd expressions.
  *
  * Spark's array higher-order functions (`zip_with`/`aggregate`) are
  * CodegenFallback — interpreted per row — which makes them the bottleneck
  * in O(n²) similarity kernels. For a known embedding dimension, unrolling
  * the dot product into a flat `element_at` multiply-add chain keeps the
  * whole kernel inside whole-stage codegen: left-to-right evaluation order
  * also matches a sequential oracle sum bit-for-bit (IEEE doubles).
  */
object VectorFunctions {

  /** Embedding dimension of the fixtures (FIXTURES.md §B). */
  val Dim = 64

  /** dot(a, b) unrolled over a fixed dimension; elements cast to double. */
  def dotFixed(a: Column, b: Column, dim: Int = Dim): Column =
    (1 to dim).map { i =>
      element_at(a, i).cast("double") * element_at(b, i).cast("double")
    }.reduce(_ + _)

  /** Dot with a constant vector (e.g. an LSH hyperplane). */
  def dotConst(a: Column, w: Seq[Double]): Column =
    w.zipWithIndex.map { case (wi, i) =>
      element_at(a, i + 1).cast("double") * lit(wi)
    }.reduce(_ + _)

  /** L2 norm over a fixed dimension. */
  def l2normFixed(a: Column, dim: Int = Dim): Column = sqrt(dotFixed(a, a, dim))

  /** Primitive-array dot kernel for O(n²) pair scoring. In an all-pairs
    * join Catalyst pushes a threshold filter (and the whole scoring
    * expression under it) into the nested-loop join condition, where a
    * 64-term expression tree evaluates per candidate pair — interpreter
    * overhead dominates. A compiled tight loop over primitive Float arrays
    * (Spark extracts array<float> to Array[Float] without boxing) keeps the
    * kernel at memory bandwidth wherever the expression lands in the plan.
    * Accumulation order is left-to-right in double, bit-identical to the
    * sequential oracle sum.
    */
  val dotKernel: org.apache.spark.sql.expressions.UserDefinedFunction =
    udf { (a: Array[Float], b: Array[Float]) =>
      val n = math.min(a.length, b.length)
      var i = 0
      var s = 0.0d
      while (i < n) { s += a(i).toDouble * b(i).toDouble; i += 1 }
      s
    }.asNondeterministic() // deliberately opaque: keeps Catalyst from
  // duplicating the kernel into join conditions / pushing the threshold
  // filter beneath the pair-forming join (results are deterministic).

  /** Deterministic variant for single-evaluation projections. */
  val dotKernelDet: org.apache.spark.sql.expressions.UserDefinedFunction =
    udf { (a: Array[Float], b: Array[Float]) =>
      val n = math.min(a.length, b.length)
      var i = 0
      var s = 0.0d
      while (i < n) { s += a(i).toDouble * b(i).toDouble; i += 1 }
      s
    }
}
