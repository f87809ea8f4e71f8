package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Embedding-vector column functions (SURVEY.md §2b similarity search).
  *
  * Vectors are plain `array<float>` columns; all math is done with
  * higher-order functions (`zip_with`/`aggregate`/`transform`) in double
  * precision — codegen-friendly, no UDF, no driver involvement. The same
  * expressions run unchanged over 100 TB of embeddings because they are
  * per-row scalar work.
  */
object VectorFunctions {

  /** Dot product of two float-array columns, accumulated in double. */
  def dotProduct(a: Column, b: Column): Column =
    aggregate(
      zip_with(a, b, (x, y) => x.cast("double") * y.cast("double")),
      lit(0.0),
      (acc, x) => acc + x)

  /** L2 norm. */
  def l2Norm(a: Column): Column = sqrt(dotProduct(a, a))

  /** Cosine similarity in double precision; 0 for zero-norm inputs. */
  def cosineSimilarity(a: Column, b: Column): Column = {
    val denom = l2Norm(a) * l2Norm(b)
    when(denom === 0.0, lit(0.0)).otherwise(dotProduct(a, b) / denom)
  }

  /** Sign bit of the projection onto a fixed hyperplane — one bit of a
    * random-hyperplane (SimHash) LSH signature. `plane` is a literal
    * double array broadcast into the expression. */
  def hyperplaneBit(vec: Column, plane: Seq[Double]): Column = {
    val planeCol = array(plane.map(lit): _*)
    when(dotProduct(vec, planeCol) >= 0.0, lit(1)).otherwise(lit(0))
  }

  /** Pack `planes.length` hyperplane sign bits into one integer bucket id.
    * Vectors in the same bucket are likely neighbors (cosine LSH); used to
    * prune the O(n²) candidate space before exact re-ranking. */
  def lshBucket(vec: Column, planes: Seq[Seq[Double]]): Column =
    planes.zipWithIndex.foldLeft(lit(0)) { case (acc, (p, i)) =>
      acc + (hyperplaneBit(vec, p) * (1 << i))
    }
}
