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

  /** Drop rows whose key appears more than `maxN` times. Scale-safe shape:
    * the over-cap key set is computed with a hash aggregate (map-side
    * partials, AQE-splittable -- no per-key window sort, no single-task
    * straggler when one key has 10M rows) and is TINY by construction (only
    * keys beyond the cap), so the removal is a broadcast anti-join that
    * stays map-side. Used to bound LSH band buckets and shingle document
    * frequency before any self-join. */
  private[ops] def dropOverCapKeys(df: DataFrame, keys: Seq[String], maxN: Long): DataFrame = {
    if (maxN == Long.MaxValue || maxN == Int.MaxValue.toLong) return df
    val over = df
      .groupBy(keys.map(col): _*)
      .agg(count(lit(1)).as("__key_n"))
      .filter(col("__key_n") > maxN)
      .drop("__key_n")
    df.join(broadcast(over), keys, "left_anti")
  }

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
    * (band_index, band_hash) -- a co-partitioned shuffle, not a cross join.
    *
    * `maxBucket` bounds the self-join: a band bucket holding d ids yields
    * d^2 join rows in one task, and near-identical boilerplate docs (the
    * common case in web-scale dedup) create exactly such hot buckets.
    * Buckets with more than `maxBucket` ids are dropped BEFORE the join
    * (broadcast anti-join on the tiny over-cap bucket set), so per-bucket
    * work is bounded by construction. RECALL KNOB: ids in a dropped bucket
    * can still pair through their other bands; pairs connected ONLY through
    * over-cap buckets are lost -- set the cap above the largest duplicate
    * cluster that must be detected, or deduplicate such mega-clusters with
    * [[exactByKey]] first (they are near-exact duplicates by definition). */
  def lshCandidates(
      df: DataFrame,
      id: Column,
      shingleCol: Column,
      k: Int,
      bandSize: Int,
      fast: Boolean = true,
      maxBucket: Int = 1000
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
    val banded = dropOverCapKeys(
      sigDf.select(
        col("id"),
        posexplode(array((0 until nBands).map(bandKey): _*)).as(Seq("band", "band_hash"))
      ),
      Seq("band", "band_hash"),
      maxBucket.toLong
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
    * with native xxhash64; the default md5 path is DuckDB-reproducible.
    *
    * Single-pass formulation: ONE `aggregate()` with a 60-long vote-array
    * accumulator (bit b tested as `h & 2^b`, so no variable shifts), then
    * one zip to assemble the hash -- the word-hash array is traversed once,
    * not 60 times as with per-bit aggregates (~60x less expression work on
    * the hot path; identical output). */
  def simhash60(words: Column, fast: Boolean = true): Column = {
    // bits masked/limited to 60 (sign-safe arithmetic below)
    val hashes =
      if (fast) transform(words, w => xxhash64(w).bitwiseAND(lit(0xfffffffffffffffL)))
      else transform(words, w => stableHash60(w))
    val pows = typedLit((0 until 60).map(b => 1L << b))
    val zeros = typedLit(Seq.fill(60)(0L))
    val votes = aggregate(
      hashes,
      zeros,
      (acc, h) => zip_with(acc, pows, (a, p) => a + when(h.bitwiseAND(p) =!= 0L, 1L).otherwise(-1L))
    )
    aggregate(
      zip_with(votes, pows, (v, p) => when(v > 0, p).otherwise(lit(0L))),
      lit(0L),
      (acc, bit) => acc.bitwiseOR(bit)
    )
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
    val ex = df
      .select(id.as("id"), explode(array_distinct(shingleCol)).as("sh"))
    val sizes = ex.groupBy("id").agg(count(lit(1)).as("n"))
    // df cap via hash-aggregate + broadcast anti-join of the (tiny) over-cap
    // shingle blacklist -- NOT a count-over-window: a window would sort-
    // exchange the full exploded shingle table and put a df=10M stop-word
    // shingle into one straggler task at 100 TB scale
    val joinable = dropOverCapKeys(ex, Seq("sh"), maxDf.toLong)
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
