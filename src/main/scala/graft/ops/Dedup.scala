package graft.ops

import org.apache.spark.sql.functions._
import org.apache.spark.sql.{Column, DataFrame}

/** Deduplication operators for training-data pipelines: exact, MinHash+LSH,
  * SimHash, n-gram Jaccard. Shuffle discipline: everything keys on a derived
  * hash/bucket so the heavy joins are equi-joins Catalyst can plan as
  * shuffle-hash (or broadcast for the small side), and candidate generation
  * never goes O(n^2) -- pairs only materialize inside a shared bucket.
  */
object Dedup {

  import TextOps.stableHash60

  /** Exact dedup by content hash: one row per distinct key with the kept
    * (minimum) id and the duplicate count. Map-side partial aggregation
    * applies; the shuffle key is the 128-bit md5, so skew is impossible. */
  def exactByKey(df: DataFrame, id: Column, key: Column): DataFrame =
    df.groupBy(md5(key.cast("string")).as("content_key"))
      .agg(min(id).as("keep_id"), count(lit(1)).as("dup_count"))

  /** Word shingles (n consecutive words joined by a space). */
  def shingles(words: Column, n: Int): Column =
    when(size(words) < n, array())
      .otherwise(
        transform(
          sequence(lit(0), size(words) - n),
          i => concat_ws(" ", (0 until n).map(j => element_at(words, i + j + 1)): _*)
        )
      )

  /** k MinHash values over the distinct shingle set, salt-indexed so every
    * hash function is independent: sig_i = min over s of h(i || s).
    * `fast=true` uses native xxhash64 (codegen'd, ~20x cheaper); the default
    * md5-hex hash is reproducible in DuckDB for the oracle twins. */
  def minhashSignature(shingleCol: Column, k: Int, fast: Boolean = false): Seq[Column] =
    (0 until k).map { i =>
      val h: Column => Column =
        if (fast) s => xxhash64(lit(i), s)
        else s => stableHash60(concat(lit(i + ":"), s))
      // no array_distinct: min() is idempotent under duplicates (the DuckDB
      // twin keeps list_distinct -- same value, so hashes still compare)
      array_min(transform(shingleCol, h)).as(s"sig_$i")
    }

  /** MinHash LSH candidate pairs: signatures banded (bandSize rows/band);
    * docs sharing any band bucket become candidates. Returns (id_a, id_b)
    * with id_a < id_b, distinct. The band join is an equi-join on
    * (band_index, band_hash) -- a co-partitioned shuffle, not a cross join. */
  def lshCandidates(
      df: DataFrame,
      id: Column,
      shingleCol: Column,
      k: Int,
      bandSize: Int,
      fast: Boolean = true
  ): DataFrame = {
    val sigs = minhashSignature(shingleCol, k, fast)
    val nBands = k / bandSize
    // docs with no shingles have all-null signatures; they must not all
    // collide into one giant shared band bucket
    val sigDf = df.filter(size(shingleCol) > 0).select(id.as("id") +: sigs: _*)
    def bandKey(b: Int): Column = {
      val parts = (b * bandSize until (b + 1) * bandSize).map(i => col(s"sig_$i"))
      // fast: 32-bit murmur of the band; stable: a cross-engine string key
      if (fast) hash(parts: _*).cast("string")
      else concat_ws("|", parts.map(_.cast("string")): _*)
    }
    val banded = sigDf.select(
      col("id"),
      posexplode(array((0 until nBands).map(bandKey): _*)).as(Seq("band", "band_hash"))
    )
    banded
      .as("l")
      .join(banded.as("r"), Seq("band", "band_hash"))
      .filter(col("l.id") < col("r.id"))
      .select(col("l.id").as("id_a"), col("r.id").as("id_b"))
      .distinct()
  }

  /** 60-bit SimHash over the word multiset: per bit, sum +-1 weighted by
    * word frequency; bit set where the sum is positive. `fast=true` hashes
    * with native xxhash64; the default md5 path is DuckDB-reproducible. */
  def simhash60(words: Column, fast: Boolean = true): Column = {
    // bits masked/limited to 60 (sign-safe shifts below)
    val hashes =
      if (fast) transform(words, w => xxhash64(w).bitwiseAND(lit(0xfffffffffffffffL)))
      else transform(words, w => stableHash60(w))
    (0 until 60)
      .map { bit =>
        val votes = aggregate(
          hashes,
          lit(0L),
          (acc, h) => acc + when(shiftrightunsigned(h, bit).bitwiseAND(1L) === 1L, 1L).otherwise(-1L)
        )
        when(votes > 0, shiftleft(lit(1L), bit)).otherwise(lit(0L))
      }
      .reduce(_.bitwiseOR(_))
  }

  /** Exact n-gram Jaccard similarity for candidate pairs that share at least
    * one shingle: explode -> self-equi-join on the shingle -> intersection
    * counts; union = |A| + |B| - |A ∩ B|. jaccard scaled x10000 (integer).
    *
    * `maxDf` caps the document frequency of join-key shingles: a shingle in
    * d documents contributes d^2 join rows, so one stop-word-ish shingle is
    * an O(n^2) scale-killer at 100 TB. It is an APPROXIMATION knob: shingles
    * with df > maxDf are dropped from the join, so (a) pairs connected only
    * through ubiquitous shingles disappear, and (b) pairs that also share a
    * dropped shingle have their intersection undercounted (sizes stay exact,
    * so their jaccard is understated). Set maxDf above the df of any shingle
    * whose loss matters; Int.MaxValue recovers exact jaccard. */
  def ngramJaccardPairs(
      df: DataFrame,
      id: Column,
      shingleCol: Column,
      maxDf: Int = 10000
  ): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val ex = df
      .select(id.as("id"), explode(array_distinct(shingleCol)).as("sh"))
    val sizes = ex.groupBy("id").agg(count(lit(1)).as("n"))
    val joinable = ex
      .withColumn("df", count(lit(1)).over(Window.partitionBy("sh")))
      .filter(col("df") <= maxDf)
      .drop("df")
    val inter = joinable
      .as("l")
      .join(joinable.as("r"), col("l.sh") === col("r.sh") && col("l.id") < col("r.id"))
      .groupBy(col("l.id").as("id_a"), col("r.id").as("id_b"))
      .agg(count(lit(1)).as("inter"))
    inter
      .join(sizes.as("sa"), col("id_a") === col("sa.id"))
      .join(sizes.as("sb"), col("id_b") === col("sb.id"))
      .select(
        col("id_a"),
        col("id_b"),
        col("inter"),
        (col("sa.n") + col("sb.n") - col("inter")).as("uni"),
        floor(col("inter") * 10000L / (col("sa.n") + col("sb.n") - col("inter"))).as("jaccard_x10000")
      )
  }
}
