package graft

import graft.pipeline.{Lobby, TfPipeline}
import graft.sim.SimExpectations
import graft.sources.LogFiles
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Lobby settings on the reference's REAL logs: log_2892242 carries a full
  * TF2Center block (Leader "name (steam64)", GameType, Location, five bools,
  * Restriction, "Launch date: Www Mmm dd HH:MM:SS CEST yyyy", Server) that
  * the synthetic generator never produces -- this exercises leaderParse, the
  * CEST/CET date conversion and the strict validators on real data, checked
  * against the independent sequential fold (SimExpectations.lobby). */
class RealLogLobbySpec extends AnyFunSuite {

  lazy val spark: SparkSession = SparkSession
    .builder()
    .master("local[4]")
    .appName("reallobby")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  private val dataDir = "/root/reference/tests/data"
  private val logs = Seq("log_6s", "log_2788889", "log_2892242", "log_bball", "log_hl")

  test("real-log lobby settings: distributed fold == sequential fold") {
    spark.sparkContext.setLogLevel("WARN")
    for (name <- logs) {
      val lines = LogFiles.splitLines(LogFiles.readLogFile(s"$dataDir/$name.log.gz"))
      val exp = SimExpectations.lobby(name, lines)

      val input = LogFiles.readLogs(spark, s"$dataDir/$name.log.gz")
      val routed = TfPipeline.routed(TfPipeline.envelope(input))
      val rows = Lobby.lobbySettings(routed).collect()

      assert(rows.length == exp.size, s"$name: lobby row presence (${rows.length} vs ${exp.size})")
      for (e <- exp; row <- rows.headOption) {
        val ok = row.getBoolean(1)
        assert((if (ok) 1L else 0L) == e.ok, s"$name ok")
        if (ok) {
          val st = row.getStruct(4)
          assert(st.getLong(0) == e.id, s"$name lobby id")
          val leader = st.getStruct(1)
          assert(leader.getString(0) == e.leader_name, s"$name leader name")
          assert(leader.getLong(1) == e.leader_steam64, s"$name leader steam64")
          assert(st.getString(2) == e.map, s"$name map")
          assert(st.getString(3) == e.game_type, s"$name game type")
          assert(st.getString(4) == e.location, s"$name location")
          assert(st.getBoolean(5) == (e.advanced == 1L), s"$name advanced")
          assert(st.getBoolean(6) == (e.region_lock == 1L), s"$name region lock")
          assert(st.getBoolean(7) == (e.allow_offclassing == 1L), s"$name offclass")
          assert(st.getBoolean(8) == (e.balancing == 1L), s"$name balancing")
          assert(st.getString(9) == e.restriction, s"$name restriction")
          assert(st.getBoolean(10) == (e.mumble_required == 1L), s"$name mumble")
          val dateEpoch = if (st.isNullAt(11)) -1L
            else st.getTimestamp(11).toInstant.getEpochSecond
          assert(dateEpoch == e.date_epoch, s"$name launch date ($dateEpoch vs ${e.date_epoch})")
          assert(st.getString(12) == e.server, s"$name server")
        } else {
          assert(row.getString(2) == e.error_kind, s"$name error kind")
          assert(row.getString(3) == e.error, s"$name error display")
        }
      }
      if (name == "log_2892242") {
        assert(exp.nonEmpty && exp.get.ok == 1L, "2892242 must have a valid lobby")
        assert(exp.get.leader_name == "b4rney" && exp.get.leader_steam64 == 76561198055036243L)
        assert(exp.get.game_type == "Sixes" && exp.get.location == "Europe")
        // Sun Apr 11 23:33:26 CEST 2021 = 21:33:26 UTC
        assert(exp.get.date_epoch == java.time.LocalDateTime
          .of(2021, 4, 11, 21, 33, 26).toEpochSecond(java.time.ZoneOffset.UTC))
      }
    }
  }
}
