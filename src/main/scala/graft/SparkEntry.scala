package graft

import graft.loggen.LogGen
import graft.ops.{Dedup, Multimodal, Similarity, TextOps}
import graft.pipeline.{Route, TfPipeline}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.{DataFrame, SparkSession}

/** Driver contract (see SURVEY.md §7): every operator in SURVEY.md §2 has a
  * `queries` entry; SQL-expressible ones carry a DuckDB oracle twin in
  * [[oracleSql]] with IDENTICAL column names and integer-stable arithmetic
  * (money in cents, similarities floored x1e4) so value hashes compare
  * exactly. The tf_* queries run the reference pipeline on the deterministic
  * synthetic tokenized table (driver check: rows>0; full semantics are
  * golden-tested against ReferenceSim in ScalaTest).
  */
object SparkEntry {

  private def T(spark: SparkSession, dir: String, name: String): DataFrame =
    spark.read.parquet(s"$dir/$name.parquet")

  // deterministic synthetic tokenized-log table, sized by the sf directory
  private val genCache = scala.collection.concurrent.TrieMap.empty[String, DataFrame]
  def tfInput(spark: SparkSession, dir: String): DataFrame = {
    val key = dir + "#" + System.identityHashCode(spark)
    genCache.getOrElseUpdate(
      key, {
        val sf = "sf([0-9.]+)".r.findFirstMatchIn(dir).map(_.group(1).toDouble).getOrElse(0.001)
        val docs = math.max(2, (sf * 2000).toInt)
        val df = LogGen.generate(spark, docs, 500, 42L).toDF().persist()
        df.count()
        df
      }
    )
  }

  private def routedOf(spark: SparkSession, dir: String): DataFrame =
    TfPipeline.routed(TfPipeline.envelope(tfInput(spark, dir)))

  /** Pin a (small) result locally so its memory-sink table / temp input dir
    * can be dropped before the DataFrame is consumed downstream. */
  private def localize(s: SparkSession, df: DataFrame): DataFrame =
    s.createDataFrame(df.collectAsList(), df.schema)

  private def deleteDir(path: String): Unit = {
    import java.nio.file._
    val p = Paths.get(path)
    if (Files.exists(p))
      Files.walkFileTree(
        p,
        new SimpleFileVisitor[Path] {
          override def visitFile(f: Path, a: attribute.BasicFileAttributes): FileVisitResult = {
            Files.delete(f); FileVisitResult.CONTINUE
          }
          override def postVisitDirectory(d: Path, e: java.io.IOException): FileVisitResult = {
            Files.delete(d); FileVisitResult.CONTINUE
          }
        }
      )
  }

  /** Flagship: full per-player stats from the tokenized log table. */
  def entry(spark: SparkSession): DataFrame = {
    val routed = routedOf(spark, "/root/testdata/sf0.001")
    TfPipeline.perPlayer(routed, TfPipeline.subjectDim(routed))
  }

  // ---- documents helpers (shared Spark/SQL shapes) ------------------------
  private def words(c: org.apache.spark.sql.Column) = split(c, " ")

  /** Canonicalize f32 for hash-compare: non-finite -> sentinel (NaN and Inf
    * hash unreliably through the driver's pandas comparator). */
  private def fcanon(c: org.apache.spark.sql.Column): org.apache.spark.sql.Column =
    when(isnan(c), lit(-999999f))
      .when(c === lit(Float.PositiveInfinity), lit(999999f))
      .otherwise(c)

  /** DuckDB CTE chain producing the MinHash-LSH candidate pairs (k=8,
    * bands=4x2, md5 double-hashing) -- the exact twin of
    * `Dedup.lshCandidates(..., 8, 2, fast = false)`. Shared by the
    * tf_lsh_candidates oracle and the connected-components oracle. */
  private val lshPairCtes: String = {
    val sigs = (0 until 8)
      .map { i =>
        s"""    list_min(list_transform(sh, s -> ((('0x' || substr(md5(s), 1, 15))::BIGINT + $i * (('0x' || substr(md5('x:' || s), 1, 15))::BIGINT % 9007199254740992)) % 1152921504606846976))) AS sig_$i"""
      }
      .mkString(",\n")
    val bandKeys = (0 until 4)
      .map(b => s"WHEN $b THEN sig_${2 * b}::VARCHAR || '|' || sig_${2 * b + 1}::VARCHAR")
      .mkString(" ")
    s"""d AS (SELECT doc_id, string_split(text, ' ') AS w FROM documents),
       |sh AS (
       |  SELECT doc_id,
       |    CASE WHEN len(w) < 3 THEN []
       |         ELSE list_distinct(list_transform(range(1, len(w) - 1),
       |                i -> w[i] || ' ' || w[i+1] || ' ' || w[i+2])) END AS sh
       |  FROM d),
       |sig AS (
       |  SELECT doc_id,
       |$sigs
       |  FROM sh WHERE len(sh) > 0),
       |b AS (
       |  SELECT doc_id, band, CASE band $bandKeys END AS key
       |  FROM sig, range(4) t(band)),
       |pairs AS (
       |  SELECT DISTINCT l.doc_id AS id_a, r.doc_id AS id_b
       |  FROM b l JOIN b r ON l.band = r.band AND l.key = r.key AND l.doc_id < r.doc_id)""".stripMargin
  }

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // ====== TF pipeline: flattened driver-comparable outputs; oracles are
    // ====== ReferenceSim expectation tables written by Verify (the sim is
    // ====== proven bit-exact against the reference's real-log snapshots)
    "tf_per_player" -> ((s, d) => {
      val r = routedOf(s, d)
      val pp = TfPipeline.perPlayer(r, TfPipeline.subjectDim(r))
      val arrays = Seq("kills" -> "k", "deaths" -> "d", "assists" -> "a", "damage" -> "g").flatMap {
        case (src, p) => (0 until 10).map(i => element_at(col(src), i + 1).as(s"$p$i"))
      }
      pp.select(
        Seq(
          col("doc_id"),
          col("steam3"),
          col("steam64"),
          col("name"),
          array_join(
            transform(
              map_entries(col("heals")),
              e => concat(e.getField("key"), lit(":"), e.getField("value"))
            ),
            ";"
          ).as("heals"),
          col("medic.advantages_lost").as("m_advantages_lost"),
          fcanon(col("medic.biggest_advantage_lost")).as("m_biggest_advantage_lost"),
          col("medic.near_full_charge_death").as("m_near_full_charge_death"),
          col("medic.deaths_after_uber").as("m_deaths_after_uber"),
          fcanon(col("medic.avg_time_before_healing")).as("m_avg_time_before_healing"),
          fcanon(col("medic.avg_time_to_build")).as("m_avg_time_to_build"),
          fcanon(col("medic.avg_time_to_use")).as("m_avg_time_to_use"),
          fcanon(col("medic.avg_uber_length")).as("m_avg_uber_length"),
          col("medic.charge_count").as("m_charge_count"),
          col("medic.drops").as("m_drops")
        ) ++ arrays: _*
      )
    }),
    "tf_chat" -> ((s, d) => {
      val r = routedOf(s, d)
      TfPipeline
        .chatMessages(r, TfPipeline.subjectDim(r))
        .select(
          col("doc_id"),
          col("line_no"),
          col("msg.time").as("time"),
          col("msg.name").as("name"),
          col("msg.steam_id").as("steam_id"),
          col("msg.message").as("message"),
          col("msg.chat_type").as("chat_type")
        )
    }),
    "tf_route_counts" -> ((s, d) =>
      TfPipeline
        .routable(TfPipeline.envelope(tfInput(s, d)))
        .groupBy("route")
        .agg(count(lit(1)).as("n"))),
    "tf_envelope" -> ((s, d) =>
      TfPipeline
        .envelope(tfInput(s, d))
        .groupBy(
          when(col("status") === 0, col("event_type"))
            .otherwise(concat(lit("__status_"), col("status")))
            .as("event_type")
        )
        .agg(count(lit(1)).as("n"), sum(size(col("tokens"))).cast("long").as("n_tokens"))),
    "tf_subject_dim" -> ((s, d) =>
      TfPipeline
        .subjectDim(routedOf(s, d))
        .select(
          col("doc_id"),
          col("sid"),
          col("data_kind").cast("long").as("data_kind"),
          col("name"),
          coalesce(col("steam64_text"), lit(-1L)).as("steam64"),
          col("first_line")
        )),
    "tf_lobby" -> ((s, d) => {
      val lb = graft.pipeline.Lobby.lobbySettings(routedOf(s, d))
      val st = col("settings")
      def b(f: String) = coalesce(st.getField(f).cast("long"), lit(-1L)).as(f)
      lb.select(
        col("doc_id"),
        col("ok").cast("long").as("ok"),
        coalesce(col("error_kind"), lit("")).as("error_kind"),
        coalesce(col("error"), lit("")).as("error"),
        coalesce(st.getField("id"), lit(-1L)).as("id"),
        coalesce(st.getField("leader").getField("name"), lit("")).as("leader_name"),
        coalesce(st.getField("leader").getField("steam64"), lit(-1L)).as("leader_steam64"),
        coalesce(st.getField("map"), lit("")).as("map"),
        coalesce(st.getField("game_type"), lit("")).as("game_type"),
        coalesce(st.getField("location"), lit("")).as("location"),
        b("advanced"),
        b("region_lock"),
        b("allow_offclassing"),
        b("balancing"),
        coalesce(st.getField("restriction"), lit("")).as("restriction"),
        b("mumble_required"),
        coalesce(st.getField("date").cast("long"), lit(-1L)).as("date_epoch"),
        coalesce(st.getField("server"), lit("")).as("server")
      )
    }),
    "tf_typed_kills" -> ((s, d) =>
      graft.pipeline.TypedEvents
        .view(TfPipeline.envelope(tfInput(s, d)), "kill")
        .select(
          col("doc_id"),
          col("line_no"),
          col("kind").cast("long").as("kind"),
          col("subject"),
          coalesce(col("target"), lit("")).as("target"),
          coalesce(col("target_kind"), lit("")).as("target_kind"),
          coalesce(col("weapon"), lit("")).as("weapon"),
          coalesce(array_join(col("attacker_position"), " "), lit("")).as("attacker_position"),
          coalesce(array_join(col("victim_position"), " "), lit("")).as("victim_position"),
          col("parse_error").cast("long").as("parse_error")
        )),
    "tf_captures" -> ((s, d) =>
      graft.pipeline.TypedEvents
        .capturePlayers(TfPipeline.envelope(tfInput(s, d)))
        .select(
          col("doc_id"),
          col("line_no"),
          coalesce(col("cp").cast("long"), lit(-1L)).as("cp"),
          coalesce(col("cp_name"), lit("")).as("cp_name"),
          coalesce(col("num_cappers").cast("long"), lit(-1L)).as("num_cappers"),
          posexplode(col("players")).as(Seq("idx", "p"))
        )
        .select(
          col("doc_id"),
          col("line_no"),
          col("cp"),
          col("cp_name"),
          col("num_cappers"),
          col("idx").cast("long").as("idx"),
          col("p.subject").as("subject"),
          array_join(col("p.position"), " ").as("position")
        )),
    "tf_multimodal_features" -> ((s, d) =>
      Multimodal
        .extractFeatures(s, Multimodal.mediaFromDocuments(T(s, d, "documents")), 8)
        .toDF()
        .select(
          Seq(
            col("media_id"),
            col("kind"),
            col("n_bytes"),
            col("byte_mean_x1000"),
            col("frames_sampled").cast("long").as("frames")
          ) ++ (0 until 16).map(i => element_at(col("histogram16"), i + 1).as(s"h$i")): _*
        )),
    "tf_simhash" -> ((s, d) =>
      T(s, d, "documents").select(
        col("doc_id"),
        Dedup.simhash60(words(col("text")), fast = false).as("simhash")
      )),
    "tf_lsh_candidates" -> ((s, d) => {
      val docs = T(s, d, "documents")
        .select(col("doc_id"), Dedup.shingles(words(col("text")), 3).as("sh"))
      Dedup.lshCandidates(docs, col("doc_id"), col("sh"), 8, 2, fast = false)
    }),
    "tf_lsh_stream" -> ((s, d) => {
      // streaming near-dup candidate detection over a STREAMED copy of the
      // documents table: the stateful bucket machine must reproduce the
      // batch LSH candidate set (k=8, bands=4x2, md5 signatures) exactly --
      // the oracle is the same DuckDB pair SQL as tf_lsh_candidates
      val streaming = graft.streaming.StreamingPipeline
      val dir = java.nio.file.Files.createTempDirectory("graft-lsh-stream-drv").toString
      val qname = s"lsh_stream_v${System.identityHashCode(s)}"
      try {
        T(s, d, "documents").select(col("doc_id"), col("text")).write.mode("overwrite").parquet(dir)
        val src = s.readStream.schema("doc_id BIGINT, text STRING").parquet(dir)
        val cands = streaming.lshCandidatesStream(
          s,
          src,
          col("doc_id"),
          Dedup.shingles(words(col("text")), 3),
          8,
          2,
          fast = false
        )
        val q = streaming.memorySinkAppend(cands, qname).start()
        try q.processAllAvailable()
        finally q.stop()
        localize(s, s.table(qname).select(col("id_a"), col("id_b")).distinct())
      } finally {
        s.catalog.dropTempView(qname)
        deleteDir(dir)
      }
    }),
    "tf_dedup_stream" -> ((s, d) => {
      // streaming first-arrival-wins exact dedup over a STREAMED copy of the
      // documents table; emitting one row per content key (the key, not the
      // arrival-order-dependent winner id) makes the gate deterministic --
      // if the keyed state missed a duplicate, the extra row breaks the
      // row/hash compare against the distinct-key oracle
      val streaming = graft.streaming.StreamingPipeline
      val dir = java.nio.file.Files.createTempDirectory("graft-dedup-stream-drv").toString
      val qname = s"dedup_stream_v${System.identityHashCode(s)}"
      try {
        T(s, d, "documents")
          .select(col("doc_id"), col("text"))
          .withColumn("ts", to_timestamp(col("doc_id") + lit(1600000000L)))
          .write.mode("overwrite").parquet(dir)
        // every initial file in ONE micro-batch, explicitly: the watermark
        // horizon (10 min) is narrower than the corpus's doc_id-derived
        // event-time span, so a split across triggers could evict keys
        // mid-corpus and make the gate depend on trigger boundaries
        val src = s.readStream
          .option("maxFilesPerTrigger", Int.MaxValue.toString)
          .schema("doc_id BIGINT, text STRING, ts TIMESTAMP").parquet(dir)
        val key = concat_ws(" ", slice(words(col("text")), 1, 3))
        val q = streaming
          .memorySink(streaming.dedupExactStream(src, key, col("ts")), qname, complete = false)
          .start()
        try q.processAllAvailable()
        finally q.stop()
        localize(s, s.table(qname).select(col("content_key")))
      } finally {
        s.catalog.dropTempView(qname)
        deleteDir(dir)
      }
    }),
    "q_dedup_cc" -> ((s, d) => {
      // cluster resolution: LSH candidate pairs -> connected components ->
      // one canonical (min-id) doc per duplicate group, singletons kept
      val docs = T(s, d, "documents")
      val sh = docs.select(col("doc_id"), Dedup.shingles(words(col("text")), 3).as("sh"))
      val pairs = Dedup.lshCandidates(sh, col("doc_id"), col("sh"), 8, 2, fast = false)
      val cc = Dedup.connectedComponents(pairs, col("id_a"), col("id_b"))
      docs
        .select(col("doc_id"))
        .join(cc.withColumnRenamed("id", "doc_id"), Seq("doc_id"), "left")
        .select(
          col("doc_id"),
          coalesce(col("component"), col("doc_id")).as("cluster_id"),
          (coalesce(col("component"), col("doc_id")) === col("doc_id")).cast("long").as("is_canonical")
        )
    }),
    "tf_ann_lsh" -> ((s, d) => {
      val e = T(s, d, "embeddings").select(col("vec_id").as("id"), col("embedding").as("vec"))
      Similarity.lshTopK(e, 64, 6, 3, tables = 4, maxBucket = 50)
    }),
    "tf_ann_ivf" -> ((s, d) => {
      // IVF-flat scale path: deterministic sampled centroids, nProbe=3,
      // capped cells -- exact DuckDB twin incl. the cell cap
      val e = T(s, d, "embeddings").select(col("vec_id").as("id"), col("embedding").as("vec"))
      Similarity.ivfTopK(e, 3, centroidEvery = 25, nProbe = 3, maxCell = 200)
    }),
    "q_embed_neardup" -> ((s, d) => {
      // embedding-cosine near-duplicate pairs (threshold on the integer
      // cosine); brute force at sf scale -- the 100 TB path is
      // q_embed_neardup_ann below (same threshold, IVF candidates).
      // Threshold 4200: the synthetic embeddings are near-orthogonal random
      // vectors (max pairwise cosine 0.48/0.51/0.60 at sf0.001/0.01/0.1), so
      // a true near-dup cut like 0.95 matches NOTHING at any sf and the gate
      // would compare empty sets; 0.42 sits at the ~99.98th percentile of
      // the pair-score distribution and returns 27/34/441 rows -- the
      // threshold+pair logic is actually exercised at every sf
      val e = T(s, d, "embeddings").select(col("vec_id").as("id"), col("embedding").as("vec"))
      // spread the O(n^2) nested-loop work: the corpus is one small parquet
      // file, so the BNLJ stream side would otherwise be a SINGLE task
      // carrying every pair evaluation; an O(n) round-robin exchange is
      // always worth it for an O(n^2) operator (row set unchanged)
      e.repartition(s.sparkContext.defaultParallelism).as("a")
        .join(broadcast(e.as("b")), col("a.id") < col("b.id"))
        .select(
          col("a.id").as("id_a"),
          col("b.id").as("id_b"),
          Similarity.cosineX10000(col("a.vec"), col("b.vec")).as("sim_x10000")
        )
        .filter(col("sim_x10000") >= 4200)
    }),
    "q_embed_neardup_ann" -> ((s, d) => {
      // the SCALE shape of q_embed_neardup: identical threshold + scoring,
      // but candidate pairs come from IVF probed cells (ivfNearDupPairs)
      // instead of the n^2/2 cross join; gated against an exact DuckDB twin
      // of the whole candidate pipeline. On this corpus (no true near-dups,
      // see q_embed_neardup) nProbe=8 recovers most-but-not-all threshold
      // pairs -- the recall floor on PLANTED cosine>=0.95 duplicates is 1.0
      // (OpsSpec) and bench telemetry reports the corpus recall per round
      val e = T(s, d, "embeddings").select(col("vec_id").as("id"), col("embedding").as("vec"))
      Similarity.ivfNearDupPairs(e, 4200L, centroidEvery = 25, nProbe = 8, maxCell = 200)
    }),
    "tf_json" -> ((s, d) => {
      // S5 surface end-to-end: per-doc reference JSON ([global, per_player],
      // skip-default, non-finite -> null), hash-compared byte-for-byte
      // against the sim-rendered expectation
      val (docs, routed) = TfPipeline.routedWithUniverse(TfPipeline.envelope(tfInput(s, d)))
      graft.pipeline.JsonEmit
        .emit(docs, routed, TfPipeline.subjectDim(routed))
        .select(col("doc_id"), col("json"))
    }),
    "tf_medic_stream" -> ((s, d) => {
      // §2.8 streaming surface through the driver gate: the
      // flatMapGroupsWithState per-doc sequential machine over a STREAMED
      // copy of the tokenized table, compared against the sim's medic
      // fields for the player subjects with >=1 surviving medic-typed line
      val streaming = graft.streaming.StreamingPipeline
      val dir = java.nio.file.Files.createTempDirectory("graft-medic-stream").toString
      val qname = s"medics_stream_v${System.identityHashCode(s)}"
      // localize + clean up: repeated runs must not leak /tmp parquet copies
      // or registered memory-sink views
      try {
        tfInput(s, d).write.mode("overwrite").parquet(dir)
        val q = streaming
          .memorySink(streaming.medicStatsStream(s, streaming.sequencedStream(s, dir)), qname, complete = false)
          .start()
        try q.processAllAvailable()
        finally q.stop()
        localize(
          s,
          streaming
            .latestMedicRows(s.table(qname))
            .filter(!col("aborted") && shiftrightunsigned(col("sid"), 32) === 1)
            .select(
              col("doc_id"), col("sid"),
              col("advantages_lost"),
              fcanon(col("biggest_advantage_lost")).as("biggest_advantage_lost"),
              col("near_full_charge_death"), col("deaths_after_uber"),
              fcanon(col("avg_time_before_healing")).as("avg_time_before_healing"),
              fcanon(col("avg_time_to_build")).as("avg_time_to_build"),
              fcanon(col("avg_time_to_use")).as("avg_time_to_use"),
              fcanon(col("avg_uber_length")).as("avg_uber_length"),
              col("charge_count"), col("drops")
            )
        )
      } finally {
        s.catalog.dropTempView(qname)
        deleteDir(dir)
      }
    }),
    "tf_chat_stream" -> ((s, d) => {
      // streaming chat module against the SAME expectation table as the
      // batch tf_chat query: messages are emitted exactly once with
      // first-seen identity, so no latest-row dedup is needed
      val streaming = graft.streaming.StreamingPipeline
      val dir = java.nio.file.Files.createTempDirectory("graft-chat-stream").toString
      val qname = s"chat_stream_v${System.identityHashCode(s)}"
      try {
        tfInput(s, d).write.mode("overwrite").parquet(dir)
        val q = streaming
          .memorySink(streaming.chatStream(s, streaming.sequencedStream(s, dir)), qname, complete = false)
          .start()
        try q.processAllAvailable()
        finally q.stop()
        localize(
          s,
          s.table(qname)
            .select("doc_id", "line_no", "time", "name", "steam_id", "message", "chat_type")
        )
      } finally {
        s.catalog.dropTempView(qname)
        deleteDir(dir)
      }
    }),
    "tf_classstats_stream" -> ((s, d) => {
      // streaming classStats (flatMapGroupsWithState as-of machine) gated
      // against the SAME sim expectation as the batch path: the stream
      // provides the class arrays, the (gate-proven) subject dimension
      // provides the player universe + steam3 identity, zeros fill players
      // that were never a beneficiary -- exactly tf_per_player's shape
      val streaming = graft.streaming.StreamingPipeline
      val dir = java.nio.file.Files.createTempDirectory("graft-class-stream").toString
      val qname = s"class_stream_v${System.identityHashCode(s)}"
      try {
        tfInput(s, d).write.mode("overwrite").parquet(dir)
        val q = streaming
          .memorySink(streaming.classStatsStream(s, streaming.sequencedStream(s, dir)), qname, complete = false)
          .start()
        try q.processAllAvailable()
        finally q.stop()
        val allRows = streaming
          .latestMedicRows(s.table(qname))
          .filter(!col("aborted"))
        val latest = allRows.filter(shiftrightunsigned(col("sid"), 32) === 1)
        val r = routedOf(s, d)
        val dim = TfPipeline.subjectDim(r)
        val players = dim
          .filter(shiftrightunsigned(col("sid"), 32) === 1)
          .select(col("doc_id"), col("sid"))
        // the machine's deaths are BUCKET-keyed (raw kill-target interned
        // id); finalize re-keys them by the claiming subject's
        // SubjectData-id, same as the batch assembly (classstats.rs:113-120)
        val deathsClaimed = TfPipeline
          .claimDeaths(allRows.select("doc_id", "sid", "deaths"), dim)
          .withColumnRenamed("deaths", "deaths_c")
        val cells = Seq("kills" -> "k", "deaths_c" -> "d", "assists" -> "a", "damage" -> "g").flatMap {
          case (src, p) =>
            (0 until 10).map(i => coalesce(element_at(col(src), i + 1), lit(0L)).as(s"$p$i"))
        }
        localize(
          s,
          players
            .join(latest.drop("deaths"), Seq("doc_id", "sid"), "left")
            .join(deathsClaimed, Seq("doc_id", "sid"), "left")
            .select(
              Seq(
                col("doc_id"),
                concat(lit("[U:1:"), col("sid").bitwiseAND(lit(0xffffffffL)), lit("]")).as("steam3")
              ) ++ cells: _*
            )
        )
      } finally {
        s.catalog.dropTempView(qname)
        deleteDir(dir)
      }
    }),
    "tf_healspread_stream" -> ((s, d) => {
      // streaming healSpread gated against the sim's per-player heals
      // string (same expectation slice as tf_per_player.heals)
      val streaming = graft.streaming.StreamingPipeline
      val dir = java.nio.file.Files.createTempDirectory("graft-heal-stream").toString
      val qname = s"heal_stream_v${System.identityHashCode(s)}"
      try {
        tfInput(s, d).write.mode("overwrite").parquet(dir)
        val q = streaming
          .memorySink(streaming.healSpreadStream(s, streaming.sequencedStream(s, dir)), qname, complete = false)
          .start()
        try q.processAllAvailable()
        finally q.stop()
        val latest = streaming
          .latestMedicRows(s.table(qname))
          .filter(!col("aborted") && shiftrightunsigned(col("sid"), 32) === 1)
        val r = routedOf(s, d)
        val players = TfPipeline
          .subjectDim(r)
          .filter(shiftrightunsigned(col("sid"), 32) === 1)
          .select(col("doc_id"), col("sid"))
        localize(
          s,
          players
            .join(latest, Seq("doc_id", "sid"), "left")
            .select(
              col("doc_id"),
              concat(lit("[U:1:"), col("sid").bitwiseAND(lit(0xffffffffL)), lit("]")).as("steam3"),
              coalesce(col("heals"), lit("")).as("heals")
            )
        )
      } finally {
        s.catalog.dropTempView(qname)
        deleteDir(dir)
      }
    }),
    "tf_composed" -> ((s, d) => {
      // §2.9 surface: custom HighestDamage module composed over the routed
      // frame (examples/custom_handler.rs:29-56 shape)
      val r = routedOf(s, d)
      graft.pipeline.Handlers
        .composePerPlayer(r, TfPipeline.subjectDim(r),
          Seq("highest_damage" -> graft.pipeline.Handlers.highestDamage))
        .select(
          col("doc_id"),
          col("steam3"),
          col("steam64"),
          col("name"),
          coalesce(col("highest_damage.damage"), lit(-1L)).as("hd_damage"),
          coalesce(col("highest_damage.line_no"), lit(-1L)).as("hd_line")
        )
    }),

    // ================= SQL twins with DuckDB oracles ======================
    "q1_agg" -> ((s, d) =>
      T(s, d, "lineitem")
        .groupBy(col("l_returnflag"), col("l_linestatus"))
        .agg(
          sum(col("l_quantity")).cast("long").as("sum_qty"),
          sum(floor(col("l_extendedprice") * 100 + 0.5)).cast("long").as("sum_price_cents"),
          count(lit(1)).as("cnt")
        )),
    "q_route_counts" -> ((s, d) =>
      T(s, d, "events").groupBy(col("event_type")).agg(count(lit(1)).as("n"))),
    "q_first_seen" -> ((s, d) =>
      T(s, d, "events")
        .groupBy(col("user_id"))
        .agg(
          min_by(col("props"), col("event_id")).as("first_props"),
          min(col("ts")).as("first_ts"),
          count(lit(1)).as("n")
        )),
    "q_broadcast_join" -> ((s, d) =>
      T(s, d, "lineitem")
        .join(broadcast(T(s, d, "part")), col("l_partkey") === col("p_partkey"))
        .groupBy(col("p_brand"))
        .agg(
          count(lit(1)).as("cnt"),
          sum(col("l_quantity")).cast("long").as("sum_qty")
        )),
    "q_asof_join" -> ((s, d) => {
      val w = Window
        .partitionBy("user_id")
        .orderBy("ts", "event_id")
        .rowsBetween(Window.unboundedPreceding, -1)
      T(s, d, "events")
        .withColumn(
          "last_view_cents",
          last(when(col("event_type") === "view", floor(col("value") * 100 + 0.5)), ignoreNulls = true).over(w)
        )
        .filter(col("event_type") === "purchase" && col("last_view_cents").isNotNull)
        .groupBy(col("user_id"))
        .agg(
          count(lit(1)).as("n_purchases"),
          sum(col("last_view_cents")).cast("long").as("sum_last_view_cents")
        )
    }),
    "q_round_gate" -> ((s, d) => {
      val w = Window
        .partitionBy("user_id")
        .orderBy("ts", "event_id")
        .rowsBetween(Window.unboundedPreceding, -1)
      T(s, d, "events")
        .withColumn(
          "gate",
          last(
            when(col("event_type") === "signup", 1).when(col("event_type") === "error", 0),
            ignoreNulls = true
          ).over(w)
        )
        .filter(col("event_type") === "click" && col("gate") === 1)
        .groupBy(col("user_id"))
        .agg(count(lit(1)).as("clicks_while_active"))
    }),
    "q_topk_window" -> ((s, d) => {
      val w = Window.partitionBy("event_type").orderBy(col("value").desc, col("event_id").asc)
      T(s, d, "events")
        .withColumn("rank", row_number().over(w))
        .filter(col("rank") <= 3)
        .select(
          col("event_type"),
          col("rank"),
          col("event_id"),
          floor(col("value") * 100 + 0.5).cast("long").as("value_cents")
        )
    }),
    "q_max_by" -> ((s, d) =>
      // A14 top-1 exemplar (custom_handler.rs HighestDamage): arg-max with a
      // deterministic (value, id) tie-break
      T(s, d, "events")
        .groupBy(col("event_type"))
        .agg(
          max_by(col("event_id"), struct(col("value"), col("event_id"))).as("top_event_id"),
          floor(max(col("value")) * 100 + 0.5).cast("long").as("top_value_cents")
        )),
    "q_sessionize" -> ((s, d) => {
      val wo = Window.partitionBy("user_id").orderBy("ts", "event_id")
      val ev = T(s, d, "events")
        .withColumn(
          "new_sess",
          when(
            unix_timestamp(col("ts")) - unix_timestamp(lag(col("ts"), 1).over(wo)) > 3600,
            1
          ).otherwise(0)
        )
        .withColumn("sess_id", sum(col("new_sess")).over(wo.rowsBetween(Window.unboundedPreceding, 0)))
      ev.groupBy(col("user_id"), col("sess_id"))
        .agg(count(lit(1)).as("sess_events"))
        .groupBy(col("user_id"))
        .agg(
          count(lit(1)).as("n_sessions"),
          max(col("sess_events")).as("max_session_events")
        )
    }),
    "q_collect_ordered" -> ((s, d) =>
      T(s, d, "events")
        .groupBy(col("user_id"))
        .agg(
          array_join(
            slice(
              transform(
                array_sort(collect_list(struct(col("ts"), col("event_id"), col("event_type")))),
                e => e.getField("event_type")
              ),
              1,
              5
            ),
            ","
          ).as("first5")
        )),
    "q_saturating" -> ((s, d) =>
      T(s, d, "events")
        .groupBy(col("event_type"))
        .agg(
          least(sum(floor(col("value") * 100 + 0.5)), lit(500000L)).cast("long").as("sat_cents"),
          least(count(lit(1)), lit(1000L)).as("sat_cnt")
        )),
    "q_dedup_exact" -> ((s, d) =>
      Dedup.exactByKey(
        T(s, d, "documents"),
        col("doc_id"),
        concat_ws(" ", slice(words(col("text")), 1, 3))
      )),
    "q_minhash_sig" -> ((s, d) => {
      val docs = T(s, d, "documents")
        .select(col("doc_id"), Dedup.shingles(words(col("text")), 3).as("sh"))
      // fused md5 signature kernel: value-identical to the hash-pairs +
      // per-salt array_min chain (differential-spec pinned), one traversal
      docs
        .select(col("doc_id"), Dedup.minhashMd5Fast(col("sh"), 8).as("__mh"))
        .select(col("doc_id") +: Dedup.minhashSignatureFast(col("__mh"), 8): _*)
    }),
    "q_ngram_jaccard" -> ((s, d) => {
      val docs = T(s, d, "documents")
        .select(col("doc_id"), Dedup.shingles(words(col("text")), 3).as("sh"))
      Dedup
        .ngramJaccardPairs(docs, col("doc_id"), col("sh"), maxDf = 64)
        .filter(col("jaccard_x10000") >= 500)
        .select(col("id_a"), col("id_b"), col("inter"), col("uni"), col("jaccard_x10000"))
    }),
    "q_cosine_topk" -> ((s, d) => {
      val e = T(s, d, "embeddings").select(col("vec_id").as("id"), col("embedding").as("vec"))
      Similarity
        .bruteForceTopK(e.filter(col("id") < 30), e, 3)
        .select(col("qid"), col("cid"), col("sim_x10000"), col("rank"))
    }),
    "q_langid" -> ((s, d) =>
      T(s, d, "documents").select(
        col("doc_id"),
        TextOps.langId(col("text")).as("lang_guess")
      )),
    "q_quality" -> ((s, d) =>
      T(s, d, "documents").select(
        col("doc_id"),
        TextOps.qualityScore(col("text")).cast("long").as("quality")
      )),
    "q_token_counts" -> ((s, d) =>
      T(s, d, "documents").select(
        col("doc_id"),
        TextOps.wsTokenCount(col("text")).cast("long").as("ws_tokens"),
        TextOps.bpeishTokenCount(col("text")).cast("long").as("bpeish_tokens")
      )),
    "q_fingerprint" -> ((s, d) =>
      T(s, d, "documents").select(
        col("doc_id"),
        TextOps.wordSetFingerprint(words(col("text"))).as("wordset_fp"),
        TextOps.rollingFingerprint(words(col("text"))).as("rolling_fp")
      )),
    "q_decontam" -> ((s, d) => {
      // train/eval decontamination: 8-gram overlap of every train doc vs the
      // broadcast eval-set gram hashes (TextOps.ngramOverlap); the doc_id
      // mod-97 split plays the held-out benchmark
      val docs = T(s, d, "documents")
      TextOps
        .ngramOverlap(
          docs.filter(col("doc_id") % 97 >= 5),
          docs.filter(col("doc_id") % 97 < 5),
          n = 8
        )
        .select(col("doc_id"), col("n_grams").cast("long").as("n_grams"),
          col("n_matched").cast("long").as("n_matched"))
    }),
    "q_repetition" -> ((s, d) =>
      // Gopher-style within-doc repetition signals, entirely map-side (the
      // top-bigram count is a sorted-run fold, not an explode+groupBy)
      TextOps.repetitionMetrics(T(s, d, "documents"))),
    "q_pack_chunks" -> ((s, d) =>
      // pretraining sequence assembly plan: concatenate-and-chunk packing
      // into 1024-token sequences over 32 deterministic hash shards
      TextOps.packChunks(T(s, d, "documents"), col("doc_id"), TextOps.wsTokenCount(col("text")), 32, 1024L)),
    "q_mix_weights" -> ((s, d) =>
      // domain-mixture reweighting: per-(lang, source) token mass and the
      // uniform-target resampling weight in ppm
      TextOps.mixtureWeights(T(s, d, "documents"), Seq("lang", "source"), TextOps.wsTokenCount(col("text")))),
    "q_quality_cut" -> ((s, d) =>
      // per-source quality gate: keep the best 200 permille of each source
      TextOps
        .stratumTopPermille(
          T(s, d, "documents"),
          col("source"),
          TextOps.qualityScore(col("text")).cast("long"),
          col("doc_id"),
          200
        )
        .select(
          col("key").as("doc_id"),
          col("stratum").as("source"),
          col("score").as("quality"),
          col("rk").cast("long").as("rk")
        )),
    "q_sample_stratified" -> ((s, d) =>
      // deterministic per-stratum hash sampling (zero-shuffle keyed filter):
      // en at 200 permille, zh at 50, everything else 100
      TextOps
        .hashSample(T(s, d, "documents"), col("doc_id"), col("lang"),
          Map("en" -> 200, "zh" -> 50), defaultPermille = 100)
        .select(col("doc_id"), col("lang"), col("source"))),
    "q_skew_salted" -> ((s, d) => {
      // two-stage salted aggregation (explicit skew handling) must equal the
      // plain group-by oracle
      T(s, d, "events")
        .withColumn("salt", pmod(col("event_id"), lit(16)))
        .groupBy(col("event_type"), col("salt"))
        .agg(count(lit(1)).as("c"))
        .groupBy(col("event_type"))
        .agg(sum(col("c")).cast("long").as("n"))
    }),
    "q_union_distinct" -> ((s, d) => {
      val ev = T(s, d, "events")
      ev.filter(col("event_type") === "click")
        .select(col("user_id"), col("event_id"))
        .unionByName(
          ev.filter(col("event_type") === "view").select(col("user_id"), col("event_id"))
        )
        .distinct()
        .groupBy(col("user_id"))
        .agg(count(lit(1)).as("n_click_view"))
    }),
    "q_running_sum" -> ((s, d) => {
      val w = Window
        .partitionBy("user_id")
        .orderBy("ts", "event_id")
        .rowsBetween(Window.unboundedPreceding, 0)
      T(s, d, "events")
        .withColumn("running_cents", sum(floor(col("value") * 100 + 0.5)).over(w))
        .groupBy(col("user_id"))
        .agg(max(col("running_cents")).cast("long").as("max_running_cents"))
    }),
    "q_binary_meta" -> ((s, d) =>
      Multimodal
        .mediaFromDocuments(T(s, d, "documents"))
        .select(
          col("media_id"),
          col("kind"),
          octet_length(col("media")).cast("long").as("n_bytes")
        ))
  )

  /** Oracle twins for the tf_* pipeline queries: `SELECT *` over the
    * sequential-sim expectation parquet written by [[Verify]] (placeholder
    * `__EXP__` is substituted with the absolute expectation dir at dump
    * time). The sim is validated bit-exactly against the reference's own
    * committed snapshots (RealLogGoldenSpec), so these rows are
    * reference-anchored, not self-referential. */
  private def expOracle(name: String): String =
    s"SELECT * FROM read_parquet('__EXP__/$name/*.parquet')"

  def oracleSql: Map[String, String] = Map(
    "tf_medic_stream" -> expOracle("tf_medic_stream"),
    "tf_chat_stream" -> expOracle("tf_chat"),
    // the streaming classStats machine must reproduce the class-array slice
    // of the sim's per-player expectation exactly
    "tf_classstats_stream" -> {
      val cells = Seq("k", "d", "a", "g").flatMap(p => (0 until 10).map(i => s"$p$i")).mkString(", ")
      s"SELECT doc_id, steam3, $cells FROM read_parquet('__EXP__/tf_per_player/*.parquet')"
    },
    "tf_healspread_stream" ->
      "SELECT doc_id, steam3, heals FROM read_parquet('__EXP__/tf_per_player/*.parquet')",
    "tf_per_player" -> expOracle("tf_per_player"),
    "tf_chat" -> expOracle("tf_chat"),
    "tf_route_counts" -> expOracle("tf_route_counts"),
    "tf_envelope" -> expOracle("tf_envelope"),
    "tf_subject_dim" -> expOracle("tf_subject_dim"),
    "tf_lobby" -> expOracle("tf_lobby"),
    "tf_typed_kills" -> expOracle("tf_typed_kills"),
    "tf_captures" -> expOracle("tf_captures"),
    "tf_json" -> expOracle("tf_json"),
    "tf_composed" -> expOracle("tf_composed"),
    "tf_multimodal_features" -> {
      val hist = (0 until 16)
        .map(j => s"  CAST(len(list_filter(bytes, b -> b // 16 = $j)) AS BIGINT) AS h$j")
        .mkString(",\n")
      s"""WITH ch AS (
         |  SELECT doc_id, length(text) AS n,
         |    list_transform(range(1, length(text) + 1), i -> ord(substr(text, i, 1))) AS bytes
         |  FROM documents)
         |SELECT doc_id AS media_id,
         |  CASE (doc_id % 3) WHEN 0 THEN 'image' WHEN 1 THEN 'audio' ELSE 'video' END AS kind,
         |  CAST(n AS BIGINT) AS n_bytes,
         |  CAST(CASE WHEN n = 0 THEN 0 ELSE list_sum(bytes) * 1000 // n END AS BIGINT) AS byte_mean_x1000,
         |  CAST(CASE (doc_id % 3) WHEN 2 THEN greatest(1, n // 4096)
         |       WHEN 1 THEN greatest(1, n // 1024) ELSE 1 END AS BIGINT) AS frames,
         |$hist
         |FROM ch""".stripMargin
    },
    "tf_simhash" ->
      """WITH w AS (SELECT doc_id, string_split(text, ' ') AS words FROM documents),
        |h AS (
        |  SELECT doc_id, unnest(list_transform(words, x -> ('0x' || substr(md5(x), 1, 15))::BIGINT)) AS hv
        |  FROM w),
        |v AS (
        |  SELECT doc_id, bit, sum(CASE WHEN (hv >> bit) & 1 = 1 THEN 1 ELSE -1 END) AS votes
        |  FROM h, range(60) t(bit) GROUP BY 1, 2)
        |SELECT doc_id, CAST(sum(CASE WHEN votes > 0 THEN 1::BIGINT << bit ELSE 0 END) AS BIGINT) AS simhash
        |FROM v GROUP BY 1""".stripMargin,
    "tf_lsh_candidates" -> s"WITH $lshPairCtes\nSELECT id_a, id_b FROM pairs",
    "tf_lsh_stream" -> s"WITH $lshPairCtes\nSELECT id_a, id_b FROM pairs",
    "tf_dedup_stream" ->
      """SELECT array_to_string((string_split(text, ' '))[1:3], ' ') AS content_key
        |FROM documents GROUP BY 1""".stripMargin,
    "q_dedup_cc" ->
      // min-label transitive closure: propagate every label smaller than the
      // target node (the component min always travels, everything else is
      // bounded); DuckDB's UNION recursion dedupes rows until fixpoint
      s"""WITH RECURSIVE $lshPairCtes,
         |e AS (SELECT id_a AS s, id_b AS t FROM pairs
         |      UNION ALL SELECT id_b, id_a FROM pairs),
         |reach AS (
         |  SELECT doc_id AS id, doc_id AS lbl FROM documents
         |  UNION
         |  SELECT e.t AS id, r.lbl AS lbl FROM reach r JOIN e ON e.s = r.id
         |  WHERE r.lbl < e.t)
         |SELECT id AS doc_id, min(lbl) AS cluster_id,
         |  CAST(CASE WHEN min(lbl) = id THEN 1 ELSE 0 END AS BIGINT) AS is_canonical
         |FROM reach GROUP BY id""".stripMargin,
    "tf_ann_lsh" ->
      """WITH e AS (
        |  SELECT vec_id AS id, embedding::DOUBLE[] AS v,
        |    list_transform(embedding, x -> floor(x::DOUBLE * 1000)::BIGINT) AS q
        |  FROM embeddings),
        |planes AS (
        |  SELECT t.t, b.b,
        |    list_transform(range(64), i -> (('0x' || substr(md5(t.t || ':' || b.b || ':' || i), 1, 15))::BIGINT % 2001) - 1000) AS w
        |  FROM range(4) t(t), range(6) b(b)),
        |proj AS (
        |  SELECT e.id, p.t, p.b,
        |    list_sum(list_transform(range(64), i -> e.q[i+1] * p.w[i+1])) AS pr
        |  FROM e, planes p),
        |buck AS (
        |  SELECT id, t, sum(CASE WHEN pr >= 0 THEN 1::BIGINT << b ELSE 0 END) AS bucket
        |  FROM proj GROUP BY 1, 2),
        |bounded AS (
        |  SELECT * FROM (SELECT *, count(*) OVER (PARTITION BY t, bucket) AS bsize FROM buck)
        |  WHERE bsize <= 50),
        |cand AS (
        |  SELECT DISTINCT l.id AS qid, r.id AS cid
        |  FROM bounded l JOIN bounded r ON l.t = r.t AND l.bucket = r.bucket AND l.id <> r.id),
        |sc AS (
        |  SELECT qid, cid,
        |    CAST(floor(list_dot_product(a.v, c.v) /
        |      (sqrt(list_dot_product(a.v, a.v)) * sqrt(list_dot_product(c.v, c.v))) * 10000) AS BIGINT) AS sim_x10000
        |  FROM cand JOIN e a ON qid = a.id JOIN e c ON cid = c.id),
        |r AS (
        |  SELECT qid, cid, sim_x10000,
        |    row_number() OVER (PARTITION BY qid ORDER BY sim_x10000 DESC, cid ASC) AS rank
        |  FROM sc)
        |SELECT qid, cid, sim_x10000, CAST(rank AS INT) AS rank FROM r WHERE rank <= 3""".stripMargin,
    "q_max_by" ->
      """WITH w AS (
        |  SELECT event_type, event_id, value,
        |    row_number() OVER (PARTITION BY event_type ORDER BY value DESC, event_id DESC) AS rn
        |  FROM events)
        |SELECT event_type, event_id AS top_event_id,
        |  CAST(floor(value * 100 + 0.5) AS BIGINT) AS top_value_cents
        |FROM w WHERE rn = 1""".stripMargin,
    "q1_agg" ->
      """SELECT l_returnflag, l_linestatus,
        |  CAST(sum(l_quantity) AS BIGINT) AS sum_qty,
        |  CAST(sum(floor(l_extendedprice * 100 + 0.5)) AS BIGINT) AS sum_price_cents,
        |  count(*) AS cnt
        |FROM lineitem GROUP BY 1, 2""".stripMargin,
    "q_route_counts" ->
      "SELECT event_type, count(*) AS n FROM events GROUP BY 1",
    "q_first_seen" ->
      """SELECT user_id, arg_min(props, event_id) AS first_props,
        |  min(ts) AS first_ts, count(*) AS n
        |FROM events GROUP BY 1""".stripMargin,
    "q_broadcast_join" ->
      """SELECT p_brand, count(*) AS cnt, CAST(sum(l_quantity) AS BIGINT) AS sum_qty
        |FROM lineitem JOIN part ON l_partkey = p_partkey GROUP BY 1""".stripMargin,
    "q_asof_join" ->
      """WITH w AS (
        |  SELECT user_id, event_type,
        |    last_value(CASE WHEN event_type = 'view' THEN floor(value * 100 + 0.5) END IGNORE NULLS)
        |      OVER (PARTITION BY user_id ORDER BY ts, event_id
        |            ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS last_view_cents
        |  FROM events)
        |SELECT user_id, count(*) AS n_purchases,
        |  CAST(sum(last_view_cents) AS BIGINT) AS sum_last_view_cents
        |FROM w WHERE event_type = 'purchase' AND last_view_cents IS NOT NULL
        |GROUP BY 1""".stripMargin,
    "q_round_gate" ->
      """WITH w AS (
        |  SELECT user_id, event_type,
        |    last_value(CASE WHEN event_type = 'signup' THEN 1
        |                    WHEN event_type = 'error' THEN 0 END IGNORE NULLS)
        |      OVER (PARTITION BY user_id ORDER BY ts, event_id
        |            ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS gate
        |  FROM events)
        |SELECT user_id, count(*) AS clicks_while_active
        |FROM w WHERE event_type = 'click' AND gate = 1 GROUP BY 1""".stripMargin,
    "q_topk_window" ->
      """WITH w AS (
        |  SELECT event_type, event_id, value,
        |    row_number() OVER (PARTITION BY event_type ORDER BY value DESC, event_id ASC) AS rank
        |  FROM events)
        |SELECT event_type, rank, event_id,
        |  CAST(floor(value * 100 + 0.5) AS BIGINT) AS value_cents
        |FROM w WHERE rank <= 3""".stripMargin,
    "q_sessionize" ->
      """WITH g AS (
        |  SELECT user_id, ts, event_id,
        |    CASE WHEN epoch(ts) - epoch(lag(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id)) > 3600
        |         THEN 1 ELSE 0 END AS new_sess
        |  FROM events),
        |s AS (
        |  SELECT user_id,
        |    sum(new_sess) OVER (PARTITION BY user_id ORDER BY ts, event_id
        |                        ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS sess_id
        |  FROM g),
        |c AS (SELECT user_id, sess_id, count(*) AS sess_events FROM s GROUP BY 1, 2)
        |SELECT user_id, count(*) AS n_sessions, max(sess_events) AS max_session_events
        |FROM c GROUP BY 1""".stripMargin,
    "q_collect_ordered" ->
      """SELECT user_id,
        |  array_to_string((list(event_type ORDER BY ts, event_id))[1:5], ',') AS first5
        |FROM events GROUP BY 1""".stripMargin,
    "q_saturating" ->
      """SELECT event_type,
        |  CAST(least(sum(floor(value * 100 + 0.5)), 500000) AS BIGINT) AS sat_cents,
        |  least(count(*), 1000) AS sat_cnt
        |FROM events GROUP BY 1""".stripMargin,
    "q_dedup_exact" ->
      """SELECT md5(array_to_string((string_split(text, ' '))[1:3], ' ')) AS content_key,
        |  min(doc_id) AS keep_id, count(*) AS dup_count
        |FROM documents GROUP BY 1""".stripMargin,
    "q_minhash_sig" -> {
      // double-hashing twin: g_i = (h1 + i*(h2 % 2^53)) % 2^60, both md5-based
      val sigs = (0 until 8)
        .map { i =>
          s"""  list_min(list_transform(sh, s -> ((('0x' || substr(md5(s), 1, 15))::BIGINT + $i * (('0x' || substr(md5('x:' || s), 1, 15))::BIGINT % 9007199254740992)) % 1152921504606846976))) AS sig_$i"""
        }
        .mkString(",\n")
      s"""WITH d AS (
         |  SELECT doc_id, string_split(text, ' ') AS w FROM documents),
         |sh AS (
         |  SELECT doc_id,
         |    CASE WHEN len(w) < 3 THEN []
         |         ELSE list_distinct(list_transform(range(1, len(w) - 1),
         |                i -> w[i] || ' ' || w[i+1] || ' ' || w[i+2])) END AS sh
         |  FROM d)
         |SELECT doc_id,
         |$sigs
         |FROM sh""".stripMargin
    },
    "q_ngram_jaccard" ->
      """WITH d AS (SELECT doc_id, string_split(text, ' ') AS w FROM documents),
        |sh AS (
        |  SELECT doc_id, unnest(list_distinct(list_transform(range(1, len(w) - 1),
        |           i -> w[i] || ' ' || w[i+1] || ' ' || w[i+2]))) AS s
        |  FROM d WHERE len(w) >= 3),
        |sizes AS (SELECT doc_id, count(*) AS n FROM sh GROUP BY 1),
        |joinable AS (
        |  SELECT doc_id, s FROM sh QUALIFY count(*) OVER (PARTITION BY s) <= 64),
        |inter AS (
        |  SELECT l.doc_id AS id_a, r.doc_id AS id_b, count(*) AS inter
        |  FROM joinable l JOIN joinable r ON l.s = r.s AND l.doc_id < r.doc_id
        |  GROUP BY 1, 2)
        |SELECT id_a, id_b, inter,
        |  sa.n + sb.n - inter AS uni,
        |  CAST(floor(inter * 10000 / (sa.n + sb.n - inter)) AS BIGINT) AS jaccard_x10000
        |FROM inter JOIN sizes sa ON id_a = sa.doc_id JOIN sizes sb ON id_b = sb.doc_id
        |WHERE floor(inter * 10000 / (sa.n + sb.n - inter)) >= 500""".stripMargin,
    "tf_ann_ivf" ->
      """WITH e AS (SELECT vec_id AS id, embedding::DOUBLE[] AS v FROM embeddings),
        |c AS (SELECT id AS cid, v AS cv FROM e WHERE id % 25 = 0),
        |sc AS (
        |  SELECT e.id, c.cid,
        |    CAST(floor(list_dot_product(e.v, c.cv) /
        |      (sqrt(list_dot_product(e.v, e.v)) * sqrt(list_dot_product(c.cv, c.cv))) * 10000) AS BIGINT) AS cscore
        |  FROM e, c),
        |pr AS (
        |  SELECT id, cid, row_number() OVER (PARTITION BY id ORDER BY cscore DESC, cid ASC) AS crank
        |  FROM sc),
        |assign AS (SELECT id, cid AS cell FROM pr WHERE crank = 1),
        |kept AS (SELECT cell FROM (SELECT cell, count(*) AS nn FROM assign GROUP BY cell) WHERE nn <= 200),
        |probes AS (SELECT id AS qid, cid AS cell FROM pr WHERE crank <= 3),
        |cand AS (
        |  SELECT p.qid, a.id AS cid
        |  FROM probes p JOIN kept k ON p.cell = k.cell
        |  JOIN assign a ON a.cell = p.cell AND a.id <> p.qid),
        |s AS (
        |  SELECT cand.qid, cand.cid,
        |    CAST(floor(list_dot_product(a.v, b.v) /
        |      (sqrt(list_dot_product(a.v, a.v)) * sqrt(list_dot_product(b.v, b.v))) * 10000) AS BIGINT) AS sim_x10000
        |  FROM cand JOIN e a ON a.id = cand.qid JOIN e b ON b.id = cand.cid),
        |r AS (
        |  SELECT qid, cid, sim_x10000,
        |    row_number() OVER (PARTITION BY qid ORDER BY sim_x10000 DESC, cid ASC) AS rank
        |  FROM s)
        |SELECT qid, cid, sim_x10000, CAST(rank AS INT) AS rank FROM r WHERE rank <= 3""".stripMargin,
    "q_embed_neardup" ->
      """WITH e AS (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings),
        |s AS (
        |  SELECT a.vec_id AS id_a, b.vec_id AS id_b,
        |    CAST(floor(list_dot_product(a.v, b.v) /
        |      (sqrt(list_dot_product(a.v, a.v)) * sqrt(list_dot_product(b.v, b.v))) * 10000) AS BIGINT) AS sim_x10000
        |  FROM e a JOIN e b ON a.vec_id < b.vec_id)
        |SELECT id_a, id_b, sim_x10000 FROM s WHERE sim_x10000 >= 4200""".stripMargin,
    "q_embed_neardup_ann" ->
      """WITH e AS (SELECT vec_id AS id, embedding::DOUBLE[] AS v FROM embeddings),
        |c AS (SELECT id AS cid, v AS cv FROM e WHERE id % 25 = 0),
        |sc AS (
        |  SELECT e.id, c.cid,
        |    CAST(floor(list_dot_product(e.v, c.cv) /
        |      (sqrt(list_dot_product(e.v, e.v)) * sqrt(list_dot_product(c.cv, c.cv))) * 10000) AS BIGINT) AS cscore
        |  FROM e, c),
        |pr AS (
        |  SELECT id, cid, row_number() OVER (PARTITION BY id ORDER BY cscore DESC, cid ASC) AS crank
        |  FROM sc),
        |assign AS (SELECT id, cid AS cell FROM pr WHERE crank = 1),
        |kept AS (SELECT cell FROM (SELECT cell, count(*) AS nn FROM assign GROUP BY cell) WHERE nn <= 200),
        |probes AS (SELECT id, cid AS cell FROM pr WHERE crank <= 8),
        |cand AS (
        |  SELECT DISTINCT least(p.id, a.id) AS id_a, greatest(p.id, a.id) AS id_b
        |  FROM probes p JOIN kept k ON p.cell = k.cell
        |  JOIN assign a ON a.cell = p.cell AND a.id <> p.id)
        |SELECT cand.id_a, cand.id_b,
        |  CAST(floor(list_dot_product(x.v, y.v) /
        |    (sqrt(list_dot_product(x.v, x.v)) * sqrt(list_dot_product(y.v, y.v))) * 10000) AS BIGINT) AS sim_x10000
        |FROM cand JOIN e x ON x.id = cand.id_a JOIN e y ON y.id = cand.id_b
        |WHERE floor(list_dot_product(x.v, y.v) /
        |    (sqrt(list_dot_product(x.v, x.v)) * sqrt(list_dot_product(y.v, y.v))) * 10000) >= 4200""".stripMargin,
    "q_cosine_topk" ->
      """WITH e AS (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings),
        |s AS (
        |  SELECT a.vec_id AS qid, b.vec_id AS cid,
        |    CAST(floor(list_dot_product(a.v, b.v) /
        |      (sqrt(list_dot_product(a.v, a.v)) * sqrt(list_dot_product(b.v, b.v))) * 10000) AS BIGINT) AS sim_x10000
        |  FROM e a JOIN e b ON a.vec_id < 30 AND a.vec_id <> b.vec_id),
        |r AS (
        |  SELECT qid, cid, sim_x10000,
        |    row_number() OVER (PARTITION BY qid ORDER BY sim_x10000 DESC, cid ASC) AS rank
        |  FROM s)
        |SELECT qid, cid, sim_x10000, CAST(rank AS INT) AS rank FROM r WHERE rank <= 3""".stripMargin,
    "q_langid" -> {
      def cnt(m: String) =
        s"(length(p) - length(replace(p, '$m', ''))) / ${m.length}"
      val scores = Seq(
        "en" -> Seq(" the ", " and ", " of "),
        "es" -> Seq(" el ", " la ", " de "),
        "de" -> Seq(" der ", " und ", " die "),
        "fr" -> Seq(" le ", " et ", " les "),
        "zh" -> Seq(" zh ", " shi ", " de ")
      )
      val sels = scores
        .map { case (l, ms) => s"  CAST(${ms.map(cnt).mkString(" + ")} AS BIGINT) AS s_$l" }
        .mkString(",\n")
      s"""WITH p AS (SELECT doc_id, ' ' || lower(text) || ' ' AS p FROM documents),
         |sc AS (
         |  SELECT doc_id,
         |$sels
         |  FROM p),
         |b AS (SELECT doc_id, s_en, s_es, s_de, s_fr, s_zh,
         |        greatest(s_en, s_es, s_de, s_fr, s_zh) AS best FROM sc)
         |SELECT doc_id,
         |  CASE WHEN best <= 0 THEN 'und'
         |       WHEN s_en = best THEN 'en'
         |       WHEN s_es = best THEN 'es'
         |       WHEN s_de = best THEN 'de'
         |       WHEN s_fr = best THEN 'fr'
         |       ELSE 'zh' END AS lang_guess
         |FROM b""".stripMargin
    },
    "q_quality" ->
      """WITH m AS (
        |  SELECT doc_id, length(text) AS n_chars,
        |    CASE WHEN length(trim(text)) = 0 THEN 0
        |         ELSE len(string_split_regex(trim(text), '\s+')) END AS n_tok,
        |    length(regexp_replace(lower(text), '[a-z ]', '', 'g')) AS punct
        |  FROM documents),
        |x AS (
        |  SELECT doc_id, n_chars, n_tok, punct,
        |    CASE WHEN n_tok = 0 THEN 0 ELSE floor(n_chars * 100 / n_tok) END AS avg_len100
        |  FROM m)
        |SELECT doc_id,
        |  CAST(greatest(least(least(n_chars, 400)
        |    + (CASE WHEN avg_len100 BETWEEN 300 AND 900 THEN 400 ELSE 100 END)
        |    + 200 - least(punct * 10, 200), 1000), 0) AS BIGINT) AS quality
        |FROM x""".stripMargin,
    "q_token_counts" ->
      """SELECT doc_id,
        |  CAST(CASE WHEN length(trim(text)) = 0 THEN 0
        |       ELSE len(string_split_regex(trim(text), '\s+')) END AS BIGINT) AS ws_tokens,
        |  CAST(len(regexp_extract_all(text, '[A-Za-z]+|[0-9]+|[^A-Za-z0-9\s]')) AS BIGINT) AS bpeish_tokens
        |FROM documents""".stripMargin,
    "q_fingerprint" ->
      """WITH w AS (SELECT doc_id, string_split(text, ' ') AS words FROM documents),
        |ws AS (
        |  SELECT doc_id,
        |    list_reduce(
        |      list_prepend(0::BIGINT,
        |        list_transform(list_distinct(words),
        |          x -> ('0x' || substr(md5(x), 1, 15))::BIGINT % 2147483647)),
        |      (a, b) -> (a + b) % 2147483647) AS wordset_fp,
        |    list_reduce(
        |      list_prepend([0::BIGINT, 1::BIGINT],
        |        list_transform(words, x -> [('0x' || substr(md5(x), 1, 15))::BIGINT % 2147483647, 0::BIGINT])),
        |      (acc, e) -> [(acc[1] + e[1] * acc[2]) % 2147483647, (acc[2] * 31) % 2147483647]) AS roll
        |  FROM w)
        |SELECT doc_id, wordset_fp, roll[1] AS rolling_fp FROM ws""".stripMargin,
    "q_decontam" ->
      """WITH w AS (SELECT doc_id, string_split(text, ' ') AS ws, (doc_id % 97 < 5) AS is_eval
        |           FROM documents),
        |g AS (SELECT doc_id, is_eval,
        |             unnest(list_distinct(list_transform(range(len(ws) - 7),
        |                    i -> ('0x' || substr(md5(array_to_string(ws[(i+1):(i+8)], ' ')), 1, 15))::BIGINT))) AS g
        |      FROM w),
        |ev AS (SELECT DISTINCT g FROM g WHERE is_eval)
        |SELECT g.doc_id, count(*) AS n_grams, count(ev.g) AS n_matched
        |FROM g LEFT JOIN ev USING (g)
        |WHERE NOT g.is_eval
        |GROUP BY 1""".stripMargin,
    "q_repetition" ->
      """WITH w AS (SELECT doc_id, string_split(text, ' ') AS ws FROM documents),
        |b AS (SELECT doc_id, len(ws) AS n_words, len(list_distinct(ws)) AS n_distinct,
        |             unnest(list_transform(range(len(ws) - 1),
        |                    i -> array_to_string(ws[(i+1):(i+2)], ' '))) AS g
        |      FROM w),
        |c AS (SELECT doc_id, n_words, n_distinct, g, count(*) AS c
        |      FROM b GROUP BY 1, 2, 3, 4)
        |SELECT doc_id, CAST(n_words AS BIGINT) AS n_words,
        |  CAST(n_distinct AS BIGINT) AS n_distinct,
        |  CAST(sum(c) AS BIGINT) AS n_bigrams, CAST(max(c) AS BIGINT) AS top_bigram_n,
        |  CAST((1000 * (n_words - n_distinct)) // n_words AS BIGINT) AS dup_word_permille,
        |  CAST((1000 * max(c)) // sum(c) AS BIGINT) AS top_bigram_permille
        |FROM c GROUP BY doc_id, n_words, n_distinct""".stripMargin,
    "q_pack_chunks" ->
      """WITH t AS (
        |  SELECT doc_id,
        |    CAST(CASE WHEN length(trim(text)) = 0 THEN 0
        |         ELSE len(string_split_regex(trim(text), '\s+')) END AS BIGINT) AS n_tokens,
        |    ('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 15))::BIGINT % 32 AS shard,
        |    ('0x' || substr(md5('o:' || CAST(doc_id AS VARCHAR)), 1, 15))::BIGINT AS ord
        |  FROM documents),
        |c AS (
        |  SELECT doc_id, shard, n_tokens,
    |    CAST(COALESCE(sum(n_tokens) OVER (PARTITION BY shard ORDER BY ord, doc_id
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS BIGINT) AS start_tok
        |  FROM t)
        |SELECT doc_id, shard, n_tokens, start_tok,
        |  start_tok // 1024 AS seq_id, start_tok % 1024 AS seq_off
        |FROM c""".stripMargin,
    "q_mix_weights" ->
      """WITH t AS (
        |  SELECT lang, source,
        |    CAST(count(*) AS BIGINT) AS n_docs,
        |    CAST(sum(CASE WHEN length(trim(text)) = 0 THEN 0
        |         ELSE len(string_split_regex(trim(text), '\s+')) END) AS BIGINT) AS n_tokens
        |  FROM documents GROUP BY 1, 2),
        |g AS (SELECT sum(n_tokens) AS tot, count(*) AS ns FROM t)
        |SELECT lang, source, n_docs, n_tokens,
        |  CAST(1000000 * g.tot // (g.ns * n_tokens) AS BIGINT) AS weight_ppm
        |FROM t, g""".stripMargin,
    "q_quality_cut" ->
      """WITH m AS (
        |  SELECT doc_id, source, length(text) AS n_chars,
        |    CASE WHEN length(trim(text)) = 0 THEN 0
        |         ELSE len(string_split_regex(trim(text), '\s+')) END AS n_tok,
        |    length(regexp_replace(lower(text), '[a-z ]', '', 'g')) AS punct
        |  FROM documents),
        |x AS (
        |  SELECT doc_id, source, n_chars, n_tok, punct,
        |    CASE WHEN n_tok = 0 THEN 0 ELSE floor(n_chars * 100 / n_tok) END AS avg_len100
        |  FROM m),
        |q AS (
        |  SELECT doc_id, source,
        |    CAST(greatest(least(least(n_chars, 400)
        |      + (CASE WHEN avg_len100 BETWEEN 300 AND 900 THEN 400 ELSE 100 END)
        |      + 200 - least(punct * 10, 200), 1000), 0) AS BIGINT) AS quality
        |  FROM x),
        |r AS (
        |  SELECT doc_id, source, quality,
        |    row_number() OVER (PARTITION BY source ORDER BY quality DESC, doc_id) AS rk,
        |    count(*) OVER (PARTITION BY source) AS cnt
        |  FROM q)
        |SELECT doc_id, source, quality, CAST(rk AS BIGINT) AS rk
        |FROM r WHERE (rk - 1) * 1000 < cnt * 200""".stripMargin,
    "q_sample_stratified" ->
      """SELECT doc_id, lang, source FROM documents
        |WHERE ('0x' || substr(md5(lang || ':' || CAST(doc_id AS VARCHAR)), 1, 15))::BIGINT % 1000
        |      < (CASE WHEN lang = 'en' THEN 200 WHEN lang = 'zh' THEN 50 ELSE 100 END)""".stripMargin,
    "q_skew_salted" ->
      "SELECT event_type, count(*) AS n FROM events GROUP BY 1",
    "q_union_distinct" ->
      """SELECT user_id, count(*) AS n_click_view FROM (
        |  SELECT user_id, event_id FROM events WHERE event_type = 'click'
        |  UNION
        |  SELECT user_id, event_id FROM events WHERE event_type = 'view'
        |) GROUP BY 1""".stripMargin,
    "q_running_sum" ->
      """WITH r AS (
        |  SELECT user_id,
        |    sum(floor(value * 100 + 0.5)) OVER (PARTITION BY user_id ORDER BY ts, event_id
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS running_cents
        |  FROM events)
        |SELECT user_id, CAST(max(running_cents) AS BIGINT) AS max_running_cents
        |FROM r GROUP BY 1""".stripMargin,
    "q_binary_meta" ->
      """SELECT doc_id AS media_id,
        |  CASE (doc_id % 3) WHEN 0 THEN 'image' WHEN 1 THEN 'audio' ELSE 'video' END AS kind,
        |  CAST(octet_length(encode(text)) AS BIGINT) AS n_bytes
        |FROM documents""".stripMargin
  )
}
