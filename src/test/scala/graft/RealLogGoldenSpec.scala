package graft

import com.fasterxml.jackson.databind.{JsonNode, ObjectMapper}
import graft.pipeline.TfPipeline
import graft.sources.LogFiles
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import graft.sim.ReferenceSim
import org.scalatest.funsuite.AnyFunSuite

import scala.jdk.CollectionConverters._

/** End-to-end validation against the reference's OWN committed artifacts:
  * the 5 real match logs in /root/reference/tests/data and the full parse()
  * snapshot goldens in /root/reference/tests/snapshots (shape per
  * tests/snapshot.rs:10-54: per-player ClassStats as raw 10-arrays, heals as
  * steam3-keyed map, MedicStats serialized in full; global.chat list).
  *
  * Two assertions per log:
  *   1. ReferenceSim (sequential) == snapshot EXACTLY, floats included --
  *      proving the transcribed semantics against the real reference output.
  *   2. Distributed pipeline == snapshot with integer-exact stats and
  *      f32-tolerant averages (distributed float sums accumulate in double
  *      and re-round once; the reference accumulates in f32 per event, so
  *      the last ulp can differ).
  *
  * The pipeline input is produced by the real ingestion path
  * (sources/LogFiles: wholetext + gzip decode + "\nL "-split), covering
  * SURVEY.md S2/S3 on real data.
  */
class RealLogGoldenSpec extends AnyFunSuite {

  lazy val spark: SparkSession = SparkSession
    .builder()
    .master("local[4]")
    .appName("realgolden")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  private val dataDir = "/root/reference/tests/data"
  private val snapDir = "/root/reference/tests/snapshots"
  private val logs = Seq("log_6s", "log_2788889", "log_2892242", "log_bball", "log_hl")

  private val mapper = new ObjectMapper()

  private def snapshot(name: String): JsonNode = {
    val raw = new String(
      java.nio.file.Files.readAllBytes(
        java.nio.file.Paths.get(s"$snapDir/snapshot__parse-$name.log.snap")
      ),
      java.nio.charset.StandardCharsets.UTF_8
    )
    // insta header: two `---` fences, JSON follows
    val at = raw.indexOf("---", raw.indexOf("---") + 3)
    mapper.readTree(raw.substring(at + 3))
  }

  /** f32 from a snapshot node; serde_json emits null for non-finite f32. */
  private def f32(n: JsonNode): Float =
    if (n == null || n.isNull) Float.NaN else n.asDouble().toFloat

  private def feq(actual: Float, expected: Float): Boolean =
    actual == expected || (actual.isNaN && expected.isNaN) ||
      (expected.isNaN && actual.isInfinite) || // null snapshot = NaN-or-Inf
      math.abs(actual - expected) <= 1e-4f * math.max(1f, math.abs(expected))

  private def arr10(n: JsonNode): Seq[Long] = (0 until 10).map(i => n.get(i).asLong())

  private val medicFields = Seq(
    "advantages_lost", "biggest_advantage_lost", "near_full_charge_death",
    "deaths_after_uber", "avg_time_before_healing", "avg_time_to_build",
    "avg_time_to_use", "avg_uber_length", "charge_count", "drops"
  )

  for (name <- logs) {
    lazy val lines = LogFiles.splitLines(LogFiles.readLogFile(s"$dataDir/$name.log.gz"))
    lazy val snap = snapshot(name)

    test(s"$name: sequential sim reproduces the reference snapshot exactly") {
      val sim = ReferenceSim.run(lines)
      assert(!sim.hardError, s"$name: sim hit hard error")

      // ---- per_player ----------------------------------------------------
      val expPlayers = snap.get("per_player")
      val expKeys = expPlayers.fieldNames().asScala.toVector
      assert(
        sim.perPlayer.map(_.steam3).sorted == expKeys.sorted,
        s"$name: player key set mismatch"
      )
      for (p <- sim.perPlayer) {
        val e = expPlayers.get(p.steam3)
        val who = s"$name/${p.steam3}"
        val st = e.get("stats")
        assert(p.kills.toSeq == arr10(st.get("kills")), s"$who kills")
        assert(p.deaths.toSeq == arr10(st.get("deaths")), s"$who deaths")
        assert(p.assists.toSeq == arr10(st.get("assists")), s"$who assists")
        assert(p.damage.toSeq == arr10(st.get("damage")), s"$who damage")
        val expHeals = e.get("heals").fields().asScala
          .map(en => en.getKey -> en.getValue.asLong()).toMap
        assert(p.heals.toMap == expHeals, s"$who heals")
        assert(p.heals.map(_._1) == p.heals.map(_._1).sortBy(s => s.drop(5).stripSuffix("]").toLong),
          s"$who heals order")
        val m = e.get("medic")
        val sm = p.medic
        assert(sm.advantagesLost == m.get("advantages_lost").asLong(), s"$who advantages_lost")
        assert(sm.nearFullChargeDeath == m.get("near_full_charge_death").asLong(), s"$who near_full")
        assert(sm.deathsAfterUber == m.get("deaths_after_uber").asLong(), s"$who deaths_after_uber")
        assert(sm.chargeCount == m.get("charge_count").asLong(), s"$who charge_count")
        assert(sm.drops == m.get("drops").asLong(), s"$who drops")
        // sequential f32 arithmetic must be bit-faithful
        def fx(v: Float, k: String): Unit = {
          val exp = f32(m.get(k))
          assert(v == exp || (v.isNaN && exp.isNaN) || (exp.isNaN && v.isInfinite), s"$who $k: $v != $exp")
        }
        fx(sm.biggestAdvantageLost, "biggest_advantage_lost")
        fx(sm.avgTimeBeforeHealing, "avg_time_before_healing")
        fx(sm.avgTimeToBuild, "avg_time_to_build")
        fx(sm.avgTimeToUse, "avg_time_to_use")
        fx(sm.avgUberLength, "avg_uber_length")
      }

      // ---- global.chat ---------------------------------------------------
      val expChat = snap.get("global").get("chat")
      val expMsgs = (0 until (if (expChat == null) 0 else expChat.size())).map(expChat.get)
      assert(sim.chat.length == expMsgs.length, s"$name: chat length")
      for ((a, e) <- sim.chat.zip(expMsgs)) {
        assert(a.time == e.get("time").asLong(), s"$name chat time")
        assert(a.name == e.get("name").asText(), s"$name chat name")
        assert(a.steam64 == e.get("steam_id").asLong(), s"$name chat steam_id")
        assert(a.message == e.get("message").asText(), s"$name chat message")
        assert(a.chatType == e.get("chat_type").asText(), s"$name chat type")
      }
    }

    test(s"$name: distributed pipeline reproduces the reference snapshot") {
      spark.sparkContext.setLogLevel("WARN")
      val input = LogFiles.readLogs(spark, s"$dataDir/$name.log.gz")

      // the spark-side line split must agree with the sequential one
      val sparkLines = input
        .orderBy("line_no")
        .select(graft.expr.GraftExpressions.tokens_to_string(col("tokens")))
        .collect()
        .map(_.getString(0))
        .toVector
      assert(sparkLines == lines, s"$name: LogFiles split != sequential split")

      val routed = TfPipeline.routed(TfPipeline.envelope(input)).cache()
      val dim = TfPipeline.subjectDim(routed)
      val pp = TfPipeline
        .perPlayer(routed, dim)
        .withColumn("heal_entries", map_entries(col("heals")))
        .collect()
      val chat = TfPipeline.chat(routed, dim).collect()
      routed.unpersist()

      val expPlayers = snap.get("per_player")
      assert(
        pp.map(_.getString(1)).sorted.toSeq == expPlayers.fieldNames().asScala.toVector.sorted,
        s"$name: player key set mismatch"
      )
      for (row <- pp) {
        val steam3 = row.getString(1)
        val e = expPlayers.get(steam3)
        val who = s"$name/$steam3"
        val st = e.get("stats")
        def arr(i: Int): Seq[Long] = row.getSeq[Long](i)
        assert(arr(4) == arr10(st.get("kills")), s"$who kills")
        assert(arr(5) == arr10(st.get("deaths")), s"$who deaths")
        assert(arr(6) == arr10(st.get("assists")), s"$who assists")
        assert(arr(7) == arr10(st.get("damage")), s"$who damage")
        val heals = row
          .getSeq[org.apache.spark.sql.Row](10)
          .map(x => (x.getString(0), x.getLong(1)))
        val expHeals = e.get("heals").fields().asScala
          .map(en => en.getKey -> en.getValue.asLong()).toMap
        assert(heals.toMap == expHeals, s"$who heals")
        val m = row.getStruct(9)
        val em = e.get("medic")
        assert(m.getLong(0) == em.get("advantages_lost").asLong(), s"$who advantages_lost")
        assert(m.getLong(2) == em.get("near_full_charge_death").asLong(), s"$who near_full")
        assert(m.getLong(3) == em.get("deaths_after_uber").asLong(), s"$who deaths_after_uber")
        assert(m.getLong(8) == em.get("charge_count").asLong(), s"$who charge_count")
        assert(m.getLong(9) == em.get("drops").asLong(), s"$who drops")
        for ((idx, key) <- Seq(1 -> "biggest_advantage_lost", 4 -> "avg_time_before_healing",
            5 -> "avg_time_to_build", 6 -> "avg_time_to_use", 7 -> "avg_uber_length"))
          assert(feq(m.getFloat(idx), f32(em.get(key))), s"$who $key: ${m.getFloat(idx)}")
      }

      val expChat = snap.get("global").get("chat")
      val expMsgs = (0 until (if (expChat == null) 0 else expChat.size())).map(expChat.get)
      val msgs = chat.headOption
        .map(_.getSeq[org.apache.spark.sql.Row](1))
        .getOrElse(Seq.empty)
      assert(msgs.length == expMsgs.length, s"$name: chat length")
      for ((a, e) <- msgs.zip(expMsgs)) {
        assert(a.getLong(0) == e.get("time").asLong(), s"$name chat time")
        assert(a.getString(1) == e.get("name").asText(), s"$name chat name")
        assert(a.getLong(2) == e.get("steam_id").asLong(), s"$name chat steam_id")
        assert(a.getString(3) == e.get("message").asText(), s"$name chat message")
        assert(a.getString(4) == e.get("chat_type").asText(), s"$name chat type")
      }
    }
  }
}
