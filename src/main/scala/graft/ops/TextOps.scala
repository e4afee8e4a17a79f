package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Text-analysis operators for large-scale training-data pipelines: token
  * counting, quality scoring, language id, fingerprinting. All built from
  * codegen'd built-ins (no UDFs) so they whole-stage-compile and push down;
  * every function has an ANSI-SQL twin runnable in DuckDB for the oracle.
  */
object TextOps {

  /** Whitespace token count (empty text -> 0). */
  def wsTokenCount(text: Column): Column =
    when(length(trim(text)) === 0, 0)
      .otherwise(size(split(trim(text), "\\s+")))

  /** BPE-ish token count: letter runs, digit runs, single punctuation. */
  def bpeishTokenCount(text: Column): Column =
    size(regexp_extract_all(text, lit("[A-Za-z]+|[0-9]+|[^A-Za-z0-9\\s]"), lit(0)))

  /** Punctuation+digit character count (everything outside [a-z ]). */
  def punctCount(text: Column): Column =
    length(regexp_replace(lower(text), "[a-z ]", ""))

  /** Integer quality score in [0, 1000]: length saturation + word-length
    * sanity - punctuation penalty. Deterministic integer arithmetic only. */
  def qualityScore(text: Column): Column = {
    val nChars = length(text)
    val nTok = wsTokenCount(text)
    val avgLen100 = when(nTok === 0, 0L).otherwise(floor(nChars * 100L / nTok))
    val lenScore = least(nChars, lit(400)) // saturates at 400 chars
    val wordScore =
      when(avgLen100 >= 300 && avgLen100 <= 900, 400L).otherwise(100L)
    val punctPenalty = least(punctCount(text) * 10L, lit(200L))
    greatest(least(lenScore + wordScore + lit(200L) - punctPenalty, lit(1000L)), lit(0L))
  }

  private val markers: Seq[(String, Seq[String])] = Seq(
    "en" -> Seq(" the ", " and ", " of "),
    "es" -> Seq(" el ", " la ", " de "),
    "de" -> Seq(" der ", " und ", " die "),
    "fr" -> Seq(" le ", " et ", " les "),
    "zh" -> Seq(" zh ", " shi ", " de ")
  )

  /** Occurrences of a literal substring (cross-engine: length arithmetic). */
  def substrCount(text: Column, lit0: String): Column =
    ((length(text) - length(replace(text, lit(lit0), lit("")))) / lit0.length).cast("long")

  /** N-gram-marker language id with deterministic tie-break (marker order). */
  def langId(text: Column): Column = {
    val padded = concat(lit(" "), lower(text), lit(" "))
    val scores = markers.map { case (lang, ms) =>
      lang -> ms.map(m => substrCount(padded, m)).reduce(_ + _)
    }
    val best = scores.map(_._2).reduce(greatest(_, _))
    scores.foldRight(lit("und"): Column) { case ((lang, s), acc) =>
      when(s === best && best > 0, lit(lang)).otherwise(acc)
    }
  }

  /** 60-bit cross-engine-stable hash: md5 hex prefix as integer. The same
    * value is computable in DuckDB as ('0x' || substr(md5(x),1,15))::bigint. */
  def stableHash60(c: Column): Column =
    conv(substring(md5(c.cast("string")), 1, 15), 16, 10).cast("long")

  /** Order-independent document fingerprint: sum of per-distinct-word hashes
    * mod 2^31 (exact integer arithmetic in any engine). */
  def wordSetFingerprint(words: Column): Column =
    pmod(
      aggregate(
        array_distinct(words),
        lit(0L),
        (acc, w) => pmod(acc + pmod(stableHash60(w), lit(2147483647L)), lit(2147483647L))
      ),
      lit(2147483647L)
    )

  /** Train/eval DECONTAMINATION by exact n-gram overlap (the standard
    * benchmark-leakage check in LLM data pipelines): for every train doc,
    * how many of its distinct word n-grams appear anywhere in the eval set.
    *
    * 100 TB shape: the eval side (benchmarks are small) reduces to a
    * distinct 60-bit-hash set and BROADCASTS; the train side is a map-only
    * scan (shingle kernel + array_distinct per row -- distinctness without
    * a shuffle) plus ONE aggregation keyed by doc_id. No train-side
    * self-join, no skew (the broadcast hash join fans out per-gram).
    * Docs with fewer than n words produce no grams and drop from the
    * output (both engines agree). Hashes are [[stableHash60]], so the
    * DuckDB twin reproduces the join exactly. */
  def ngramOverlap(train: DataFrame, evalDocs: DataFrame, n: Int): DataFrame = {
    def grams(df: DataFrame): DataFrame = df.select(
      col("doc_id"),
      explode(
        array_distinct(transform(Dedup.shingles(split(col("text"), " "), n), s => stableHash60(s)))
      ).as("g")
    )
    val evalSet = grams(evalDocs).select("g").distinct().withColumn("hit", lit(1))
    grams(train)
      .join(broadcast(evalSet), Seq("g"), "left")
      .groupBy("doc_id")
      .agg(count(lit(1)).as("n_grams"), count(col("hit")).as("n_matched"))
  }

  /** Deterministic per-stratum hash sampling: keep a row iff
    * hash60(stratum:key) mod 1000 < the stratum's permille rate. Pure
    * filter -- zero shuffle, zero state, reproducible on any engine and any
    * partitioning, stable under reruns/backfills (the classic keyed-sample
    * design for 100 TB pipelines: sampling rate changes don't resample
    * unrelated keys). */
  def hashSample(
      df: DataFrame,
      key: Column,
      stratum: Column,
      permille: Map[String, Int],
      defaultPermille: Int
  ): DataFrame = {
    val rate = permille.foldRight(lit(defaultPermille): Column) { case ((s, r), acc) =>
      when(stratum === s, lit(r)).otherwise(acc)
    }
    df.filter(pmod(stableHash60(concat_ws(":", stratum, key)), lit(1000L)) < rate)
  }

  /** Count of the most frequent element in a (non-null-element) string
    * array, computed MAP-SIDE as the longest equal-run of the sorted array
    * -- no explode, no per-gram shuffle; value-identical to
    * `max(count) GROUP BY element`. Empty array -> 0. */
  def topElementCount(arr: Column): Column =
    aggregate(
      sort_array(arr),
      struct(lit(0L).as("best"), lit(0L).as("run"), lit(null).cast("string").as("prev")),
      (acc, x) => {
        val run2 = when(acc.getField("prev") === x, acc.getField("run") + 1L).otherwise(lit(1L))
        struct(greatest(acc.getField("best"), run2).as("best"), run2.as("run"), x.as("prev"))
      }
    ).getField("best")

  /** Within-document repetition metrics (Gopher-style quality signals):
    * duplicate-word fraction and top-bigram fraction, integer permille.
    * Entirely map-side (scan -> project -> filter): word distinctness via
    * array_distinct, the top-bigram count via [[topElementCount]] -- zero
    * shuffle at any scale. Docs with fewer than 2 words have no bigrams and
    * are dropped (the per-gram unnest oracle drops them identically). */
  def repetitionMetrics(docs: DataFrame): DataFrame = {
    val w = split(col("text"), " ")
    docs
      .select(
        col("doc_id"),
        size(w).cast("long").as("n_words"),
        size(array_distinct(w)).cast("long").as("n_distinct"),
        // pushdown barrier: the emptiness filter below would otherwise be
        // pushed under this projection by expression substitution and
        // re-evaluate the shingle chain per row (plan had two shinglesexpr)
        graft.expr.GraftExpressions.no_push_barrier(Dedup.shingles(w, 2)).as("bg")
      )
      .filter(size(col("bg")) > 0)
      // two-step projection: top_bigram_n is referenced twice below, and
      // CollapseProject never inlines a non-cheap multi-referenced producer
      // -- the run-length fold evaluates once per row
      .select(
        col("doc_id"),
        col("n_words"),
        col("n_distinct"),
        size(col("bg")).cast("long").as("n_bigrams"),
        topElementCount(col("bg")).as("top_bigram_n")
      )
      .select(
        col("doc_id"),
        col("n_words"),
        col("n_distinct"),
        col("n_bigrams"),
        col("top_bigram_n"),
        floor(lit(1000L) * (col("n_words") - col("n_distinct")) / col("n_words"))
          .cast("long").as("dup_word_permille"),
        floor(lit(1000L) * col("top_bigram_n") / col("n_bigrams"))
          .cast("long").as("top_bigram_permille")
      )
  }

  /** Sequence-packing plan for pretraining (concatenate-and-chunk): within
    * each of `nShards` deterministic hash shards, docs line up in
    * hash-of-id order (a rerun-stable stand-in for corpus shuffling), their
    * token streams concatenate, and the stream is cut into fixed
    * `budget`-token sequences. Returns per-doc placement -- shard, token
    * start offset, the sequence id holding the doc's first token and the
    * offset inside it -- i.e. the assembly plan a writer job executes.
    *
    * Scale shape: ONE exchange (hash-partition by shard) + one per-shard
    * window sort. Shards bound both the sort width and the downstream
    * writer parallelism; at 100 TB pick nShards ~ cluster cores so each
    * shard's cumsum is an independent task -- there is no global order,
    * which is the point: a single total-order cumsum would serialize the
    * corpus through one range-partitioned sort. */
  def packChunks(docs: DataFrame, id: Column, nTokens: Column, nShards: Int, budget: Long): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val base = docs.select(
      id.as("doc_id"),
      nTokens.cast("long").as("n_tokens"),
      pmod(stableHash60(id), lit(nShards.toLong)).as("shard"),
      stableHash60(concat(lit("o:"), id.cast("string"))).as("__ord")
    )
    val w = Window
      .partitionBy("shard")
      .orderBy(col("__ord"), col("doc_id"))
      .rowsBetween(Window.unboundedPreceding, -1)
    base
      .select(
        col("doc_id"),
        col("shard"),
        col("n_tokens"),
        coalesce(sum(col("n_tokens")).over(w), lit(0L)).as("start_tok")
      )
      .select(
        col("doc_id"),
        col("shard"),
        col("n_tokens"),
        col("start_tok"),
        floor(col("start_tok") / budget).cast("long").as("seq_id"),
        (col("start_tok") % budget).as("seq_off")
      )
  }

  /** Per-stratum top-permille gate (quality filtering): keep a row when its
    * deterministic rank within `stratum` (by `score` desc, `key` asc -- no
    * tie ambiguity) falls in the best `keepPermille`/1000 of the stratum.
    * Integer arithmetic only: (rk-1)*1000 < keepPermille*cnt. Output columns
    * and values are IDENTICAL to the single-window formulation (spec-pinned):
    * (stratum, score, key, rk, cnt).
    *
    * Scale shape (two-pass threshold cut -- VERDICT r5 scale-killer #1; the
    * old single `row_number().over(partitionBy(stratum))` funneled each
    * stratum, a large corpus fraction, through ONE sort task):
    *  1. score histogram: one partial-agg groupBy (stratum, score) -- tiny
    *     when scores are bounded-cardinality quality buckets (this
    *     operator's contract: qualityScore-like integer scores);
    *  2. per-(stratum, score) rows-strictly-above counts via a window over
    *     the HISTOGRAM (thousands of rows, not the corpus), keeping only
    *     score groups that contain at least one kept rank;
    *  3. map-side broadcast semi-join drops sub-threshold groups (at
    *     keepPermille=200 that is ~80% of the corpus) before anything
    *     shuffles;
    *  4. the global rank decomposes exactly: rk = above + (rank by key
    *     within the row's (stratum, score) group), so the only corpus-side
    *     sort is a window partitioned by (stratum, SCORE) over SURVIVORS --
    *     parallelism = kept score groups per stratum instead of 1 task per
    *     stratum, and each group sorts only its own rows. A single hot
    *     boundary score group remains the irreducible worst case (ranking
    *     unique keys inside one tie set); it is bounded by that tie set, not
    *     by the stratum. */
  def stratumTopPermille(
      df: DataFrame,
      stratum: Column,
      score: Column,
      key: Column,
      keepPermille: Int
  ): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val base = df.select(stratum.as("stratum"), score.as("score"), key.as("key"))
    val hist = base.groupBy("stratum", "score").agg(count(lit(1)).as("gcnt"))
    val wAbove = Window.partitionBy("stratum").orderBy(col("score").desc)
      .rowsBetween(Window.unboundedPreceding, -1)
    val wAll = Window.partitionBy("stratum")
    // per score group: rows strictly above it in its stratum + the stratum
    // count; a group contributes kept rows iff its FIRST rank is kept:
    // above*1000 < cnt*keepPermille
    val keptGroups = hist
      .select(
        col("stratum"),
        col("score"),
        coalesce(sum(col("gcnt")).over(wAbove), lit(0L)).as("above"),
        sum(col("gcnt")).over(wAll).as("cnt")
      )
      .filter(col("above") * 1000L < col("cnt") * keepPermille)
    val rig = row_number().over(Window.partitionBy("stratum", "score").orderBy(col("key")))
    // score joins NULL-SAFELY (<=>): a null score ranks last but can still be
    // kept; stratum joins null-unsafely exactly like the old Seq("stratum")
    // using-join (null-stratum rows never reached the output)
    val kg = keptGroups.select(col("stratum").as("kg_stratum"),
      col("score").as("kg_score"), col("above"), col("cnt"))
    base
      .join(
        broadcast(kg),
        col("stratum") === col("kg_stratum") && col("score") <=> col("kg_score"))
      .select(col("stratum"), col("score"), col("key"), col("above"), col("cnt"),
        rig.as("rig"))
      .filter((col("above") + col("rig") - 1L) * 1000L < col("cnt") * keepPermille)
      .select(col("stratum"), col("score"), col("key"),
        (col("above") + col("rig")).cast("int").as("rk"), col("cnt"))
  }

  /** Domain-mixture reweighting (training-data mixing): per-stratum doc and
    * token mass plus the resampling weight (ppm) that moves the mixture to
    * a UNIFORM share per stratum: weight = (total/n_strata) / stratum_tokens.
    * Decimal(38) intermediates keep 1e6 * total_tokens exact at 100 TB
    * token counts (long would overflow past ~9.2e12 tokens); the quotient
    * floors back to a long. Scale shape: one partial-agg groupBy over the
    * corpus, then a 2-row broadcast of the grand total onto the (tiny)
    * stratum frame -- nothing else shuffles. */
  def mixtureWeights(docs: DataFrame, strata: Seq[String], nTokens: Column): DataFrame = {
    val keys = strata.map(col)
    val agg = docs
      .select(keys :+ nTokens.cast("long").as("__nt"): _*)
      .groupBy(keys: _*)
      .agg(count(lit(1)).as("n_docs"), sum(col("__nt")).as("n_tokens"))
    val tot = agg.agg(
      sum(col("n_tokens")).cast("decimal(38,0)").as("__tot"),
      count(lit(1)).cast("decimal(38,0)").as("__ns")
    )
    agg
      .crossJoin(broadcast(tot))
      .select(
        keys ++ Seq(
          col("n_docs"),
          col("n_tokens"),
          floor(
            lit(1000000).cast("decimal(38,0)") * col("__tot") /
              (col("__ns") * col("n_tokens").cast("decimal(38,0)"))
          ).cast("long").as("weight_ppm")
        ): _*
      )
  }

  /** Rolling (positional polynomial) fingerprint over the word sequence:
    * h = sum(hash(w_i) * 31^i) mod p. Order-sensitive document identity. */
  def rollingFingerprint(words: Column): Column = {
    val p = lit(2147483647L)
    // fold (h, pow) as a struct accumulator
    val folded = aggregate(
      words,
      struct(lit(0L).as("h"), lit(1L).as("pow")),
      (acc, w) =>
        struct(
          pmod(acc.getField("h") + pmod(stableHash60(w), p) * acc.getField("pow"), p).as("h"),
          pmod(acc.getField("pow") * 31L, p).as("pow")
        )
    )
    folded.getField("h")
  }
}
