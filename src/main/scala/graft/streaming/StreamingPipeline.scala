package graft.streaming

import graft.expr.GraftExpressions._
import graft.pipeline.TfPipeline
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{DataStreamWriter, OutputMode}
import org.apache.spark.sql.types._
import org.apache.spark.sql.{Column, DataFrame, Row, SparkSession}

/** Structured Streaming variant of the parse -> route layer: a continuously
  * arriving tokenized-sequence table is envelope-parsed, routed, and
  * aggregated into windowed per-event-type counts with a watermark. The
  * reference's batch semantics (single ordered pass) stay in TfPipeline;
  * streaming covers the ingest/monitoring side (SURVEY.md §2.8).
  */
object StreamingPipeline {

  val inputSchema: StructType = StructType(
    Seq(
      StructField("doc_id", StringType),
      StructField("line_no", LongType),
      StructField("source", StringType),
      StructField("tokens", ArrayType(IntegerType, containsNull = false)),
      StructField("n_tok", IntegerType)
    )
  )

  /** Streaming envelope: same expressions as the batch path (stateless ->
    * identical semantics per row). */
  def envelopeStream(spark: SparkSession, dir: String): DataFrame =
    spark.readStream
      .schema(inputSchema)
      .parquet(dir)
      .withColumn("line", tokens_to_string(col("tokens")))
      .withColumn("r", parse_raw_line(col("line")))
      .select(
        col("doc_id"),
        col("line_no"),
        col("source"),
        col("r.status").as("status"),
        col("r.kind").as("kind"),
        col("r.subject").as("subject"),
        col("r.event_type").as("event_type"),
        timestamp_seconds(col("r.ts")).as("ts")
      )

  /** Windowed routed counts: 5-minute event-time windows per event type with
    * a 10-minute watermark for late lines. */
  def routedCounts(env: DataFrame): DataFrame =
    env
      .filter(col("status") === 0)
      .withWatermark("ts", "10 minutes")
      .groupBy(window(col("ts"), "5 minutes"), col("event_type"))
      .agg(count(lit(1)).as("n"))

  /** Streaming exact deduplication (ingest-side first-arrival-wins): keep
    * each content key's first-arriving row, drop every later duplicate --
    * within a micro-batch AND across batches (keyed state). State holds
    * only the key (dropDuplicatesWithinWatermark), and the watermark evicts
    * keys once the horizon passes, so state is bounded at 100 TB ingest; a
    * duplicate arriving later than the horizon passes through -- the
    * standard streaming-dedup tradeoff (global exactness is the batch
    * [[graft.ops.Dedup.exactByKey]] job). Within one micro-batch the
    * surviving row per key is arrival-order-dependent; emit the key, not
    * the winner id, where determinism matters downstream. */
  def dedupExactStream(docs: DataFrame, key: Column, eventTime: Column, horizon: String = "10 minutes"): DataFrame =
    docs
      .withColumn("content_key", key)
      .withColumn("__event_time", eventTime)
      .withWatermark("__event_time", horizon)
      .dropDuplicatesWithinWatermark("content_key")
      .drop("__event_time")

  /** Streaming MinHash-LSH near-dup candidate detection (ingest-side twin
    * of [[graft.ops.Dedup.lshCandidates]]): the purely map-side banding
    * runs unchanged on the stream; per (band, band_hash) bucket a
    * flatMapGroupsWithState machine keeps the member ids seen so far and
    * emits a normalized candidate pair (new, prior) the moment a new doc
    * lands in a non-empty bucket -- near-dups are flagged at ARRIVAL time,
    * no batch job needed.
    *
    * State per bucket is capped at `maxBucket` ids (same hot-bucket
    * pathology as batch), but the NUMBER of bucket states is unbounded for
    * the lifetime of the stream (GroupStateTimeout.NoTimeout, no watermark):
    * total state grows with the distinct (band, band_hash) keys ever seen.
    * A long-running ingest deployment must either restart periodically from
    * a compacted checkpoint or add an event-time/processing-time timeout --
    * with the caveat that evicted buckets stop pairing against pre-eviction
    * members, a divergence from batch the cap does not have.
    * Divergence from batch semantics ABOVE the cap:
    * batch drops an over-cap bucket whole, the stream has already emitted
    * the first cap members' pairs and stops adding -- below the cap the
    * emitted pair set equals the batch candidate set exactly (a pair can
    * arrive once per shared band; dedupe downstream where it matters).
    * Within a micro-batch, members join in id order (deterministic). */
  final case class BandMember(id: Long, band: Int, band_hash: String)
  final case class BucketMembers(ids: List[Long])
  final case class CandPair(id_a: Long, id_b: Long)

  def lshCandidatesStream(
      spark: SparkSession,
      docs: DataFrame,
      id: Column,
      shingleCol: Column,
      k: Int,
      bandSize: Int,
      fast: Boolean = true,
      maxBucket: Int = 1000
  ): DataFrame = {
    import org.apache.spark.sql.streaming.{GroupStateTimeout, OutputMode}
    import spark.implicits._
    graft.ops.Dedup
      .bandedIds(docs, id, shingleCol, k, bandSize, fast)
      .as[BandMember]
      .groupByKey(r => (r.band, r.band_hash))
      .flatMapGroupsWithState[BucketMembers, CandPair](OutputMode.Append, GroupStateTimeout.NoTimeout) {
        case (_, rows, state) =>
          var seen = state.getOption.map(_.ids).getOrElse(Nil)
          // O(1) membership via a task-local mirror (the encoded state stays
          // a List; a cap-sized bucket would otherwise pay O(cap) per arrival)
          val seenSet = scala.collection.mutable.HashSet.empty[Long] ++ seen
          val out = List.newBuilder[CandPair]
          for (r <- rows.toSeq.sortBy(_.id) if seenSet.size < maxBucket && !seenSet.contains(r.id)) {
            for (p <- seen) out += CandPair(math.min(p, r.id), math.max(p, r.id))
            seen = r.id :: seen
            seenSet += r.id
          }
          state.update(BucketMembers(seen))
          out.result().iterator
      }
      .toDF()
  }

  /** Per-(doc, medic) charge state tracked with mapGroupsWithState: a
    * streaming analogue of the medic build-time machine (counts completed
    * first_heal -> chargeready builds). */
  final case class MedicEvent(doc_id: String, sid: Long, line_no: Long, event_type: String, time: Long)
  final case class BuildState(lastBuildStart: Long, builds: Long)
  final case class BuildCount(doc_id: String, sid: Long, builds: Long)

  def buildCounts(spark: SparkSession, env: DataFrame): DataFrame = {
    import org.apache.spark.sql.streaming.GroupStateTimeout
    import spark.implicits._
    val typed = env
      .filter(col("status") === 0 && col("event_type").isin("first_heal", "charge_ready"))
      .withColumn("sid", subject_id(col("kind"), col("subject")))
      .select(col("doc_id"), col("sid"), col("line_no"), col("event_type"), unix_timestamp(col("ts")).as("time"))
      .as[MedicEvent]
    typed
      .groupByKey(e => (e.doc_id, e.sid))
      .mapGroupsWithState[BuildState, BuildCount](GroupStateTimeout.NoTimeout) {
        case ((doc, sid), events, state) =>
          var st = state.getOption.getOrElse(BuildState(0L, 0L))
          // per-batch events sorted by line order: the in-doc sequence
          for (e <- events.toSeq.sortBy(_.line_no)) {
            if (e.event_type == "first_heal") st = st.copy(lastBuildStart = e.time)
            else if (st.lastBuildStart > 0)
              st = BuildState(0L, st.builds + 1)
          }
          state.update(st)
          BuildCount(doc, sid, st.builds)
      }
      .toDF()
  }

  /** Memory-sink writer for tests/smoke: processAllAvailable drives a batch
    * of parquet through the streaming plan synchronously. */
  def memorySink(df: DataFrame, name: String, complete: Boolean): DataStreamWriter[Row] =
    df.writeStream
      .format("memory")
      .queryName(name)
      .outputMode(if (complete) OutputMode.Complete else OutputMode.Update)

  /** Append-mode memory sink (flatMapGroupsWithState(Append) queries must
    * run in Append output mode). */
  def memorySinkAppend(df: DataFrame, name: String): DataStreamWriter[Row] =
    df.writeStream.format("memory").queryName(name).outputMode(OutputMode.Append)

  // ---------------------------------------------------------------------
  // Streaming medic module with reference-sequential semantics
  // ---------------------------------------------------------------------

  /** One classified line for the per-doc state machine: pointwise columns
    * only (the same expressions as the batch path), ordering restored inside
    * the keyed state handler. tsOpt is None on an invalid date. */
  final case class SeqLine(
      doc_id: String,
      line_no: Long,
      status: Byte,
      handled: Boolean,
      typed_err: Boolean,
      rescue_a: Boolean,
      tsOpt: Option[Long],
      sid: Long,
      event_type: String,
      charge: Long,
      duration: Float,
      f_time: Float,
      subject: String,
      text: String,
      // classStats / healSpread fields (null/None outside their event types)
      class_str: String,
      target_kind: String,
      target_raw: String,
      dmgOpt: Option[Long],
      healingOpt: Option[Long]
  )

  /** Mutable-free per-medic accumulator mirroring TfPipeline.medicStats'
    * aggregate columns (sums kept in double like Spark's FloatType sum). */
  final case class MedicAcc(
      advantagesLost: Long = 0L,
      biggestAdv: Float = 0f,
      nearFull: Long = 0L,
      deathsAfterUber: Long = 0L,
      totalBeforeHeal: Double = 0d,
      healCount: Long = 0L,
      totalBuild: Long = 0L,
      buildCount: Long = 0L,
      totalUber: Double = 0d,
      chargeCount: Long = 0L,
      drops: Long = 0L,
      // sequential machine bits (batch twin: fh/cr line windows)
      lastFhTime: Long = 0L,
      fhSinceLastCr: Boolean = false,
      uberEnd: Long = 0L
  )

  /** The sequential recovery machine's control state (lib.rs:58-104),
    * shared by every streaming module. `pendingConsumeTs` is Some(errTs)
    * when the NEXT line is consumed by a just-evaluated error; `nextLine`
    * is the cross-batch resume guard. */
  final case class SeqCtl(
      startTs: Option[Long] = None,
      pendingConsumeTs: Option[Long] = None,
      aborted: Boolean = false,
      nextLine: Long = 0L
  )

  /** Advance the recovery machine by one line. Returns the new control
    * state and Some(docRelativeTime) exactly when the line is a surviving
    * handled line the module should process. */
  private def advance(c: SeqCtl, l: SeqLine): (SeqCtl, Option[Long]) = {
    val st = c.copy(nextLine = l.line_no + 1)
    st.pendingConsumeTs match {
      case Some(errTs) =>
        // consumed line: its own content is never evaluated; both lines
        // drop iff it parses OK with a >60s forward jump
        if (!(l.status == 0 && l.tsOpt.getOrElse(0L) - errTs > 60))
          (st.copy(aborted = true, pendingConsumeTs = None), None)
        else (st.copy(pendingConsumeTs = None), None)
      case None =>
        if (l.status == 2) (st.copy(aborted = true), None) // Malformed envelope
        else if (l.status == 0 && l.handled) {
          if (l.typed_err) {
            // consume the next physical line (stream end first = reference
            // break -- same as never seeing it); rescue_a drops silently
            if (!l.rescue_a) (st.copy(pendingConsumeTs = Some(l.tsOpt.getOrElse(0L))), None)
            else (st, None)
          } else if (l.tsOpt.isEmpty) (st.copy(aborted = true), None) // date panic
          else {
            val ts = l.tsOpt.get
            st.startTs match {
              case Some(s) => (st, Some(u32(ts - s)))
              case None    => (st.copy(startTs = Some(ts)), Some(0L))
            }
          }
        } else (st, None) // non-OK / unhandled: skipped, like does_handle
    }
  }

  /** Per-doc medic state: recovery control plus per-medic accumulators. */
  final case class DocState(
      ctl: SeqCtl = SeqCtl(),
      medics: Map[Long, MedicAcc] = Map.empty
  )

  final case class MedicRow(
      doc_id: String,
      sid: Long,
      aborted: Boolean,
      advantages_lost: Long,
      biggest_advantage_lost: Float,
      near_full_charge_death: Long,
      deaths_after_uber: Long,
      avg_time_before_healing: Float,
      avg_time_to_build: Float,
      avg_time_to_use: Float,
      avg_uber_length: Float,
      charge_count: Long,
      drops: Long,
      // lines-consumed watermark: monotone per key, so consumers can pick
      // the latest emission order-independently (max_by(_, up_to))
      up_to: Long
  )

  /** Classified streaming lines: the batch pointwise classifier over the
    * streaming envelope (stateless -> identical semantics), flattened to the
    * medic-typed primitives. */
  def sequencedStream(spark: SparkSession, dir: String, maxFilesPerTrigger: Option[Int] = None): DataFrame = {
    val reader = spark.readStream.schema(inputSchema)
    maxFilesPerTrigger.foreach(n => reader.option("maxFilesPerTrigger", n.toString))
    val env = reader
      .parquet(dir)
      .withColumn("line", tokens_to_string(col("tokens")))
      .withColumn("r", parse_raw_line(col("line")))
      .select(
        col("doc_id"),
        col("line_no"),
        col("r.status").as("status"),
        col("r.date").as("date"),
        col("r.kind").as("kind"),
        col("r.subject").as("subject"),
        col("r.event_type").as("event_type"),
        col("r.params").as("params"),
        col("r.ts").as("ts")
      )
    TfPipeline
      .classifyPointwise(env)
      // sid is only read on handled medic rows; sentinel for non-OK lines
      .withColumn("sid", coalesce(subject_id(col("kind"), col("subject")), lit(-2L)))
      // typed fields come pre-extracted from the one-pass `tp` struct; the
      // coalesce defaults fire only for unhandled rows (tp null), exactly
      // like the old element_at-over-null-map chain
      .select(
        col("doc_id"), col("line_no"), col("status"), col("handled"),
        col("typed_err"), col("rescue_a"), col("ts").as("tsOpt"), col("sid"),
        coalesce(col("event_type"), lit("")).as("event_type"),
        coalesce(col("tp").getField("charge"), lit(0L)).as("charge"),
        coalesce(col("tp").getField("duration"), lit(0f)).as("duration"),
        coalesce(col("tp").getField("f_time"), lit(0f)).as("f_time"),
        col("subject"), col("tp").getField("text").as("text"),
        col("tp").getField("class_str").as("class_str"),
        col("tp").getField("target_kind").as("target_kind"),
        col("tp").getField("target_raw").as("target_raw"),
        col("tp").getField("dmg").as("dmgOpt"),
        col("tp").getField("healing").as("healingOpt")
      )
  }

  /** IEEE f32 division with the batch f32div's exact semantics. */
  private def f32div(n: Float, d: Float): Float =
    if (d == 0f) { if (n == 0f) Float.NaN else Float.PositiveInfinity }
    else (n.toDouble / d.toDouble).toFloat

  private def u32(v: Long): Long = v & 0xffffffffL

  /** Latest emission per (doc, sid) from an accumulating (Update-mode) sink
    * table, picked order-independently via the monotone `up_to` watermark. */
  def latestMedicRows(df: DataFrame): DataFrame = {
    val payload = df.columns.filter(c => c != "doc_id" && c != "sid").map(col)
    df.groupBy(col("doc_id"), col("sid"))
      .agg(max_by(struct(payload: _*), col("up_to")).as("r"))
      .select(col("doc_id"), col("sid"), col("r.*"))
  }

  /** Streaming medic stats keyed by doc: flatMapGroupsWithState runs the
    * reference's SEQUENTIAL per-doc machine -- error-consumption chains,
    * doc-level abort, doc-relative event time -- over micro-batches (events
    * sorted by line_no within a batch; cross-batch order is the source's
    * file order, the streaming contract for sequence logs). Emits the
    * current per-(doc, medic) stats every batch; an aborted doc emits a
    * single tombstone row (sid = -1, aborted = true) and nothing after,
    * mirroring the batch path's whole-doc exclusion. */
  def medicStatsStream(spark: SparkSession, seq: DataFrame): DataFrame = {
    import org.apache.spark.sql.streaming.GroupStateTimeout
    import spark.implicits._

    def emitRows(doc: String, st: DocState): Iterator[MedicRow] =
      st.medics.iterator.map { case (sid, a) =>
        if (a.healCount > 0)
          MedicRow(doc, sid, aborted = false,
            a.advantagesLost, a.biggestAdv, a.nearFull, a.deathsAfterUber,
            f32div(a.totalBeforeHeal.toFloat, a.healCount.toFloat),
            f32div(a.totalBuild.toFloat, a.buildCount.toFloat),
            f32div(0f, a.chargeCount.toFloat),
            f32div(a.totalUber.toFloat, a.chargeCount.toFloat),
            a.chargeCount, a.drops, st.ctl.nextLine)
        else
          MedicRow(doc, sid, aborted = false, 0L, 0f, 0L, 0L, 0f, 0f, 0f, 0f, 0L, 0L, st.ctl.nextLine)
      }

    seq
      .as[SeqLine]
      .groupByKey(_.doc_id)
      .flatMapGroupsWithState[DocState, MedicRow](
        OutputMode.Update,
        GroupStateTimeout.NoTimeout
      ) { case (doc, lines, state) =>
        var st = state.getOption.getOrElse(DocState())
        if (st.ctl.aborted) Iterator.empty
        else {
          val ordered = lines.toArray.sortBy(_.line_no).filter(_.line_no >= st.ctl.nextLine)
          var i = 0
          while (i < ordered.length && !st.ctl.aborted) {
            val l = ordered(i)
            i += 1
            val (ctl2, timeOpt) = advance(st.ctl, l)
            st = st.copy(ctl = ctl2)
            timeOpt.foreach { time =>
              if (TfPipeline.MedicTypes.contains(l.event_type)) {
                val a = st.medics.getOrElse(l.sid, MedicAcc())
                val b = l.event_type match {
                  case "first_heal" =>
                    a.copy(
                      totalBeforeHeal = a.totalBeforeHeal + l.f_time,
                      healCount = a.healCount + 1,
                      lastFhTime = time,
                      fhSinceLastCr = true
                    )
                  case "charge_ready" =>
                    val consume = a.fhSinceLastCr && a.lastFhTime > 0
                    a.copy(
                      totalBuild = a.totalBuild + (if (consume) math.max(time - a.lastFhTime, 0L) else 0L),
                      buildCount = a.buildCount + (if (consume) 1 else 0),
                      fhSinceLastCr = false
                    )
                  case "charge_ended" =>
                    a.copy(uberEnd = time, totalUber = a.totalUber + l.duration)
                  case "charge_deployed" => a.copy(chargeCount = a.chargeCount + 1)
                  case "advantage_lost" =>
                    a.copy(
                      advantagesLost = a.advantagesLost + 1,
                      biggestAdv = if (l.f_time > a.biggestAdv) l.f_time else a.biggestAdv
                    )
                  case "medic_death" =>
                    a.copy(
                      nearFull = a.nearFull + (if (l.charge >= 95 && l.charge < 100) 1 else 0),
                      deathsAfterUber =
                        a.deathsAfterUber + (if (math.max(time - a.uberEnd, 0L) <= 10) 1 else 0),
                      drops = a.drops + (if (l.charge >= 100) 1 else 0)
                    )
                  case _ => a
                }
                st = st.copy(medics = st.medics.updated(l.sid, b))
              }
            }
          }
          state.update(st)
          if (st.ctl.aborted)
            Iterator.single(
              MedicRow(doc, -1L, aborted = true, 0L, 0f, 0L, 0L, 0f, 0f, 0f, 0f, 0L, 0L, st.ctl.nextLine))
          else emitRows(doc, st)
        }
      }
      .toDF()
  }

  // ---------------------------------------------------------------------
  // Streaming classStats module (A1-A4 + J3 as-of class + A13 round gate)
  // ---------------------------------------------------------------------

  /** Per-beneficiary 10-cell accumulators (u64 here; the reference's u16
    * saturation is applied at emission, like the batch `least(sum, 65535)`). */
  final case class ClassAcc(
      kills: Vector[Long] = Vector.fill(10)(0L),
      deaths: Vector[Long] = Vector.fill(10)(0L),
      assists: Vector[Long] = Vector.fill(10)(0L),
      damage: Vector[Long] = Vector.fill(10)(0L)
  )

  /** Per-doc classStats state: recovery control, the as-of entry table
    * (sid -> normalized class; "" = entry created by a kill target with its
    * class still unknown), accumulators, and the round-active gate. */
  final case class ClassDocState(
      ctl: SeqCtl = SeqCtl(),
      entries: Map[Long, String] = Map.empty,
      stats: Map[Long, ClassAcc] = Map.empty,
      active: Boolean = false
  )

  final case class ClassRow(
      doc_id: String,
      sid: Long,
      aborted: Boolean,
      kills: Seq[Long],
      deaths: Seq[Long],
      assists: Seq[Long],
      damage: Seq[Long],
      up_to: Long
  )

  /** Streaming classStats keyed by doc: the same flatMapGroupsWithState
    * machine shape as [[medicStatsStream]] (shared [[advance]] recovery
    * step, doc aborts -> tombstone), running the reference's SEQUENTIAL
    * as-of semantics (classstats.rs:61-120): spawns/role changes set the
    * subject's class; an active kill creates the target's entry BEFORE the
    * class reads; deaths/assists/damage require the read subject to have an
    * entry; consumers accumulate under the beneficiary subject. Exactly
    * equal to the batch [[TfPipeline.classStats]] window formulation
    * (differential-tested incl. doc aborts and consumption chains). */
  def classStatsStream(spark: SparkSession, seq: DataFrame): DataFrame = {
    import org.apache.spark.sql.streaming.GroupStateTimeout
    import spark.implicits._
    import graft.expr.{LineParser, Steam}

    val zero = Vector.fill(10)(0L)
    def sat(v: Vector[Long]): Seq[Long] = v.map(x => if (x > 65535L) 65535L else x)
    def clsIdx(entry: String): Int =
      if (entry == null || entry.isEmpty) LineParser.classIndex("unknown")
      else LineParser.classIndex(entry)

    def killTargetSid(l: SeqLine): Long = l.target_kind match {
      case "player"  => Steam.playerSubjectId(l.target_raw)
      case "console" => Steam.K_CONSOLE << 32
      case "team"    => (Steam.K_TEAM << 32) | 2L
      case _         => Steam.K_SYSTEM << 32
    }

    seq
      .as[SeqLine]
      .groupByKey(_.doc_id)
      .flatMapGroupsWithState[ClassDocState, ClassRow](
        OutputMode.Update,
        GroupStateTimeout.NoTimeout
      ) { case (doc, lines, state) =>
        var st = state.getOption.getOrElse(ClassDocState())
        if (st.ctl.aborted) Iterator.empty
        else {
          def bump(sid: Long, pick: ClassAcc => ClassAcc): Unit = {
            val a = st.stats.getOrElse(sid, ClassAcc())
            st = st.copy(stats = st.stats.updated(sid, pick(a)))
          }
          val ordered = lines.toArray.sortBy(_.line_no).filter(_.line_no >= st.ctl.nextLine)
          var i = 0
          while (i < ordered.length && !st.ctl.aborted) {
            val l = ordered(i)
            i += 1
            val (ctl2, timeOpt) = advance(st.ctl, l)
            st = st.copy(ctl = ctl2)
            if (timeOpt.isDefined) l.event_type match {
              case "round_start" => st = st.copy(active = true)
              case "round_win"   => st = st.copy(active = false)
              case "spawned" | "role_change" =>
                if (l.class_str != null)
                  st = st.copy(entries = st.entries.updated(l.sid, l.class_str))
              case "kill" if st.active =>
                val tsid = killTargetSid(l)
                // the attacker's class is read BEFORE the target entry is
                // created (classstats.rs:81-82) -- observable on a self-kill
                // with no prior entry; then the target entry is created and
                // the kill is counted under the target's as-of class
                val attackerEntry = st.entries.get(l.sid)
                if (!st.entries.contains(tsid))
                  st = st.copy(entries = st.entries.updated(tsid, ""))
                val vIdx = clsIdx(st.entries(tsid))
                bump(l.sid, a => a.copy(kills = a.kills.updated(vIdx, a.kills(vIdx) + 1)))
                // the victim is a beneficiary group either way; its death
                // counts only when the ATTACKER had an entry (its class may
                // still be unknown) -- classstats.rs:83-86
                attackerEntry match {
                  case Some(ac) =>
                    val aIdx = clsIdx(ac)
                    bump(tsid, a => a.copy(deaths = a.deaths.updated(aIdx, a.deaths(aIdx) + 1)))
                  case None => bump(tsid, identity)
                }
              case "kill_assist" if st.active =>
                // the assister's group exists even when the target has no
                // entry (batch: the consumer row always groups)
                val counted = l.target_raw != null && {
                  val t = Steam.againstSubjectId(l.target_raw)
                  st.entries.contains(t) && {
                    val tIdx = clsIdx(st.entries(t))
                    bump(l.sid, a => a.copy(assists = a.assists.updated(tIdx, a.assists(tIdx) + 1)))
                    true
                  }
                }
                if (!counted) bump(l.sid, identity)
              case "damage" if st.active =>
                val d = l.dmgOpt.getOrElse(0L)
                if (d > 0 && d < 1500) {
                  val t =
                    if (l.target_raw == null) Steam.K_SYSTEM << 32
                    else Steam.againstSubjectId(l.target_raw)
                  if (st.entries.contains(t)) {
                    val tIdx = clsIdx(st.entries(t))
                    bump(l.sid, a => a.copy(damage = a.damage.updated(tIdx, a.damage(tIdx) + d)))
                  } else bump(l.sid, identity)
                }
              case _ =>
            }
          }
          state.update(st)
          if (st.ctl.aborted)
            Iterator.single(ClassRow(doc, -1L, aborted = true, zero, zero, zero, zero, st.ctl.nextLine))
          else
            st.stats.iterator.map { case (sid, a) =>
              ClassRow(doc, sid, aborted = false,
                sat(a.kills), sat(a.deaths), sat(a.assists), sat(a.damage), st.ctl.nextLine)
            }
        }
      }
      .toDF()
  }

  // ---------------------------------------------------------------------
  // Streaming healSpread module (A5: per-(healer, target) u32-wrapped sums)
  // ---------------------------------------------------------------------

  final case class HealDocState(
      ctl: SeqCtl = SeqCtl(),
      heals: Map[Long, Map[Long, Long]] = Map.empty // healer sid -> target account -> u32 sum
  )

  /** heals rendered in target-account order as "[U:1:acct]:sum;..." -- the
    * same string shape as tf_per_player's flattened heals column, so the
    * driver query compares against the SAME sim expectation. */
  final case class HealRow(doc_id: String, sid: Long, aborted: Boolean, heals: String, up_to: Long)

  /** Streaming healSpread on the shared per-doc machine (healspread.rs:20-33):
    * `healed` lines whose `against` target is a PLAYER accumulate the healing
    * amount (absent -> 0) under (healer, target account) with u32 wrapping;
    * missing `against` is a no-op. Exactly equal to the batch
    * [[TfPipeline.healSpread]] aggregate (differential-tested). */
  def healSpreadStream(spark: SparkSession, seq: DataFrame): DataFrame = {
    import org.apache.spark.sql.streaming.GroupStateTimeout
    import spark.implicits._
    import graft.expr.Steam

    def render(m: Map[Long, Long]): String =
      m.toSeq.sorted.map { case (acct, v) => s"[U:1:$acct]:$v" }.mkString(";")

    seq
      .as[SeqLine]
      .groupByKey(_.doc_id)
      .flatMapGroupsWithState[HealDocState, HealRow](
        OutputMode.Update,
        GroupStateTimeout.NoTimeout
      ) { case (doc, lines, state) =>
        var st = state.getOption.getOrElse(HealDocState())
        if (st.ctl.aborted) Iterator.empty
        else {
          val ordered = lines.toArray.sortBy(_.line_no).filter(_.line_no >= st.ctl.nextLine)
          var i = 0
          while (i < ordered.length && !st.ctl.aborted) {
            val l = ordered(i)
            i += 1
            val (ctl2, timeOpt) = advance(st.ctl, l)
            st = st.copy(ctl = ctl2)
            if (timeOpt.isDefined && l.event_type == "healed" && l.target_raw != null) {
              val t = Steam.againstSubjectId(l.target_raw)
              if (Steam.packedKind(t) == Steam.K_PLAYER.toInt) {
                val acct = t & 0xffffffffL
                val m = st.heals.getOrElse(l.sid, Map.empty[Long, Long])
                val next = (m.getOrElse(acct, 0L) + l.healingOpt.getOrElse(0L)) & 0xffffffffL
                st = st.copy(heals = st.heals.updated(l.sid, m.updated(acct, next)))
              }
            }
          }
          state.update(st)
          if (st.ctl.aborted)
            Iterator.single(HealRow(doc, -1L, aborted = true, "", st.ctl.nextLine))
          else
            st.heals.iterator.map { case (sid, m) =>
              HealRow(doc, sid, aborted = false, render(m), st.ctl.nextLine)
            }
        }
      }
      .toDF()
  }

  // ---------------------------------------------------------------------
  // Streaming chat module (player-only ordered messages, J2 identity)
  // ---------------------------------------------------------------------

  final case class SubjEntry(dataKind: Int, name: String, steam64: Long)
  final case class ChatDocState(ctl: SeqCtl = SeqCtl(), subjects: Map[Long, SubjEntry] = Map.empty)
  final case class ChatMsg(
      doc_id: String,
      line_no: Long,
      time: Long,
      name: String,
      steam_id: Long,
      message: String,
      chat_type: String
  )

  /** Streaming chat: say/say_team messages resolved against the FIRST-SEEN
    * subject identity (SubjectData semantics, common.rs:308-342), player
    * subjects only (F2), emitted in processing order with doc-relative time.
    * Each message is emitted exactly once (the resume guard makes re-emission
    * impossible); a doc that aborts mid-batch emits nothing for that batch
    * and nothing after -- messages emitted in EARLIER batches stand (the
    * Update-mode sink cannot retract; batch consumers drop aborted docs via
    * the medic tombstones or the batch universe). */
  def chatStream(spark: SparkSession, seq: DataFrame): DataFrame = {
    import org.apache.spark.sql.streaming.GroupStateTimeout
    import spark.implicits._
    seq
      .as[SeqLine]
      .groupByKey(_.doc_id)
      .flatMapGroupsWithState[ChatDocState, ChatMsg](
        OutputMode.Update,
        GroupStateTimeout.NoTimeout
      ) { case (doc, lines, state) =>
        var st = state.getOption.getOrElse(ChatDocState())
        val out = scala.collection.mutable.ArrayBuffer.empty[ChatMsg]
        if (!st.ctl.aborted) {
          val ordered = lines.toArray.sortBy(_.line_no).filter(_.line_no >= st.ctl.nextLine)
          var i = 0
          while (i < ordered.length && !st.ctl.aborted) {
            val l = ordered(i)
            i += 1
            val (ctl2, timeOpt) = advance(st.ctl, l)
            st = st.copy(ctl = ctl2)
            timeOpt.foreach { time =>
              // first-seen-wins intern, mirroring TfPipeline.subjectDim
              if (!st.subjects.contains(l.sid)) {
                val k = graft.expr.Steam.packedKind(l.sid)
                val e =
                  if (k == 1 || k == 2) {
                    val parts = graft.expr.Steam.splitPlayerSubject(l.subject)
                    if (parts == null) SubjEntry(3, l.subject, -1L)
                    else {
                      // ASCII digits ONLY, matching the batch twin's
                      // rlike("^[0-9]{1,18}$") -- Character.isDigit also
                      // accepts non-ASCII Unicode decimal digits, which the
                      // batch path classifies as data_kind=3
                      val uidOk = parts(1).nonEmpty && parts(1).length <= 18 &&
                        parts(1).forall(c => c >= '0' && c <= '9') &&
                        java.lang.Long.parseLong(parts(1)) <= 65535L
                      val acct = graft.expr.Kernels.steamTextAccount(
                        org.apache.spark.unsafe.types.UTF8String.fromString(parts(2)))
                      if (acct != null && uidOk)
                        SubjEntry(1, parts(0), graft.expr.Steam.steam64(acct.longValue()))
                      else if (uidOk) SubjEntry(2, parts(0), -1L)
                      else SubjEntry(3, l.subject, -1L)
                    }
                  } else SubjEntry(k, l.subject, -1L)
                st = st.copy(subjects = st.subjects.updated(l.sid, e))
              }
              if ((l.event_type == "say" || l.event_type == "say_team") &&
                graft.expr.Steam.packedKind(l.sid) == 1) {
                val e = st.subjects(l.sid)
                if (e.dataKind == 1)
                  out += ChatMsg(doc, l.line_no, time, e.name, e.steam64,
                    Option(l.text).getOrElse(""),
                    if (l.event_type == "say") "All" else "Team")
              }
            }
          }
          state.update(st)
        }
        if (st.ctl.aborted) Iterator.empty else out.iterator
      }
      .toDF()
  }
}
