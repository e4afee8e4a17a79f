package graft.ops

import org.apache.spark.sql.functions._
import org.apache.spark.sql.{Column, DataFrame}

/** Approximate-nearest-neighbor operators over embedding columns
  * (array<float>). Baseline: brute-force cosine top-k (exact). Scale path:
  * random-hyperplane LSH bucketing so only same-bucket pairs are scored --
  * the bucket join is an equi-join, broadcastable when the query side is
  * small, and the candidate set shrinks ~2^bits-fold.
  */
object Similarity {

  /** Dot product of two float-array columns in doubles (zip_with + aggregate:
    * codegen'd, no UDF). */
  def dot(a: Column, b: Column): Column =
    aggregate(
      zip_with(a, b, (x, y) => x.cast("double") * y.cast("double")),
      lit(0.0),
      (acc, v) => acc + v
    )

  def norm(a: Column): Column = sqrt(dot(a, a))

  def cosine(a: Column, b: Column): Column = dot(a, b) / (norm(a) * norm(b))

  /** Exact brute-force top-k neighbors for each query row.
    * Broadcast the (small) query side; rank with a deterministic tie-break
    * on the x1e4-floored similarity so results are stable across engines. */
  def bruteForceTopK(
      queries: DataFrame, // (id, vec)
      corpus: DataFrame, // (id, vec)
      k: Int
  ): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val scored = broadcast(queries.select(col("id").as("qid"), col("vec").as("qv")))
      .join(corpus.select(col("id").as("cid"), col("vec").as("cv")), col("qid") =!= col("cid"))
      .select(
        col("qid"),
        col("cid"),
        floor(cosine(col("qv"), col("cv")) * 10000).as("sim_x10000")
      )
    val w = Window.partitionBy("qid").orderBy(col("sim_x10000").desc, col("cid").asc)
    scored
      .withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
  }

  /** Random-hyperplane LSH bucket id (`bits` sign bits of projections onto
    * deterministic pseudo-random hyperplanes derived from the seed). */
  def rhpBucket(vec: Column, dim: Int, bits: Int, seed: Long): Column = {
    // deterministic hyperplane component h(b, i) in [-0.5, 0.5): a stable
    // integer hash scaled; identical across sessions, engines irrelevant
    def comp(b: Int, i: Int): Column =
      (pmod(xxhash64(lit(seed), lit(b), lit(i)), lit(1000003L)).cast("double") / 1000003.0) - 0.5
    (0 until bits)
      .map { b =>
        val proj = (0 until dim)
          .map(i => element_at(vec, i + 1).cast("double") * comp(b, i))
          .reduce(_ + _)
        when(proj >= 0, shiftleft(lit(1), b)).otherwise(lit(0))
      }
      .reduce(_.bitwiseOR(_))
  }

  /** LSH-bucketed ANN: score only same-bucket pairs; recall < 1 traded for a
    * ~2^bits candidate reduction. Same output shape as bruteForceTopK. */
  def lshTopK(df: DataFrame, dim: Int, bits: Int, k: Int, seed: Long): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val b = df.select(col("id"), col("vec"), rhpBucket(col("vec"), dim, bits, seed).as("bucket"))
    val scored = b
      .as("l")
      .join(b.as("r"), Seq("bucket"))
      .filter(col("l.id") =!= col("r.id"))
      .select(
        col("l.id").as("qid"),
        col("r.id").as("cid"),
        floor(cosine(col("l.vec"), col("r.vec")) * 10000).as("sim_x10000")
      )
    val w = Window.partitionBy("qid").orderBy(col("sim_x10000").desc, col("cid").asc)
    scored.withColumn("rank", row_number().over(w)).filter(col("rank") <= k)
  }
}
