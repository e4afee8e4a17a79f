package graft

import graft.loggen.LogGen
import graft.pipeline.{Lobby, TfPipeline}
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class LobbySpec extends AnyFunSuite {

  lazy val spark: SparkSession = SparkSession
    .builder()
    .master("local[4]")
    .appName("lobby")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  private def toDf(docs: Seq[(String, Seq[String])]) = {
    import spark.implicits._
    docs.flatMap { case (doc, lines) =>
      lines.zipWithIndex.map { case (l, i) =>
        val t = LogGen.tokenize(l)
        graft.loggen.SeqRow(doc, i.toLong, "s", t, t.length)
      }
    }.toDF()
  }

  private val C = """"Console<0><Console><Console>""""
  private def say(msg: String) = s"""04/11/2021 - 23:33:27: $C say "$msg""""

  test("lobby settings fold: arm, key/value fill, last-wins, date tz") {
    spark.sparkContext.setLogLevel("WARN")
    val lines = Seq(
      say("Ignored: before arming"),
      say("TF2Center Lobby #1148166 | 547089698"),
      say("Leader: b4rney (76561198055036243)"),
      say("Map: cp_gullywash_final1"),
      say("GameType: 6v6"),
      say("Location: Europe"),
      say("Advanced Lobby: false"),
      say("Region lock: true"),
      say("Restriction: None"),
      say("Mumble required: true"),
      say("Launch date: Sun Apr 11 23:33:27 CEST 2021"),
      say("Server: fakkelbrigade.eu:27055"),
      say("Map: cp_process_final") // last-wins
    )
    val routed = TfPipeline.routed(TfPipeline.envelope(toDf(Seq(("d1", lines)))))
    val out = Lobby.lobbySettings(routed).collect()
    assert(out.length == 1)
    val r = out(0)
    assert(r.getBoolean(1), "ok")
    val st = r.getStruct(4)
    assert(st.getLong(0) == 1148166L)
    assert(st.getStruct(1).getString(0) == "b4rney")
    assert(st.getStruct(1).getLong(1) == 76561198055036243L)
    assert(st.getString(2) == "cp_process_final")
    assert(st.getString(3) == "Sixes")
    assert(st.getString(4) == "Europe")
    assert(!st.getBoolean(5) && st.getBoolean(6))
    assert(st.getString(9) == "None")
    assert(st.getBoolean(10))
    // CEST 23:33:27 -> 21:33:27 UTC
    assert(st.getTimestamp(11).toInstant.toString == "2021-04-11T21:33:27Z")
    assert(st.getString(12) == "fakkelbrigade.eu:27055")
  }

  test("error latch: first malformed value wins, later messages ignored") {
    val lines = Seq(
      say("TF2Center Lobby #99 | x"),
      say("GameType: 9v9"), // unknown_game_type latches
      say("Location: Nowhere") // ignored (already latched)
    )
    val routed = TfPipeline.routed(TfPipeline.envelope(toDf(Seq(("d2", lines)))))
    val r = Lobby.lobbySettings(routed).collect()(0)
    assert(!r.getBoolean(1))
    assert(r.getString(2) == "unknown_game_type")
  }

  test("never armed -> no output row; non-console says ignored") {
    val lines = Seq(
      say("Leader: nobody (123)"),
      """04/11/2021 - 23:33:27: "A<2><[U:1:100]><Red>" say "TF2Center Lobby #1 | x""""
    )
    val routed = TfPipeline.routed(TfPipeline.envelope(toDf(Seq(("d3", lines)))))
    assert(Lobby.lobbySettings(routed).count() == 0)
  }

  test("bad lobby id in the header latches invalid_lobby_id") {
    val lines = Seq(say("TF2Center Lobby #notanumber | x"), say("Map: foo"))
    val routed = TfPipeline.routed(TfPipeline.envelope(toDf(Seq(("d4", lines)))))
    val r = Lobby.lobbySettings(routed).collect()(0)
    assert(!r.getBoolean(1) && r.getString(2) == "invalid_lobby_id")
    assert(r.getString(3) == "invalid digit found in string") // ParseIntError Display
  }

  test("launch date: weekday name must match the calendar date (chrono %a consistency)") {
    // Apr 11 2021 was a Sunday; "Mon" is a valid weekday token but
    // inconsistent -> chrono Impossible -> error latch
    val lines = Seq(
      say("TF2Center Lobby #42 | x"),
      say("Launch date: Mon Apr 11 23:33:27 CEST 2021"),
      say("Map: ignored-after-error")
    )
    val routed = TfPipeline.routed(TfPipeline.envelope(toDf(Seq(("d5", lines)))))
    val r = Lobby.lobbySettings(routed).collect()(0)
    assert(!r.getBoolean(1) && r.getString(2) == "invalid_date")
    assert(r.getString(3) == "no possible date and time matching input")
    // and the sequential twin agrees
    val exp = graft.sim.SimExpectations.lobby("d5", lines.toIndexedSeq).get
    assert(exp.ok == 0L && exp.error_kind == "invalid_date" && exp.error == r.getString(3))
  }

  test("launch date: timezone resolved first; unknown tz carries its Display string") {
    val lines = Seq(
      say("TF2Center Lobby #42 | x"),
      say("Launch date: Sun Apr 11 23:33:27 PST 2021")
    )
    val routed = TfPipeline.routed(TfPipeline.envelope(toDf(Seq(("d6", lines)))))
    val r = Lobby.lobbySettings(routed).collect()(0)
    assert(!r.getBoolean(1) && r.getString(2) == "unknown_timezone")
    assert(r.getString(3) == "Unknown timezone in date: Sun Apr 11 23:33:27 PST 2021")
    val exp = graft.sim.SimExpectations.lobby("d6", lines.toIndexedSeq).get
    assert(exp.error_kind == "unknown_timezone" && exp.error == r.getString(3))
  }

  test("launch date: out-of-range and garbage map to chrono ParseError Displays") {
    def errOf(dateVal: String): (String, String) = {
      val lines = Seq(say("TF2Center Lobby #42 | x"), say(s"Launch date: $dateVal"))
      val routed = TfPipeline.routed(TfPipeline.envelope(toDf(Seq(("d7", lines)))))
      val r = Lobby.lobbySettings(routed).collect()(0)
      val exp = graft.sim.SimExpectations.lobby("d7", lines.toIndexedSeq).get
      assert(exp.error_kind == r.getString(2) && exp.error == r.getString(3), dateVal)
      (r.getString(2), r.getString(3))
    }
    assert(errOf("Sun Apr 11 25:00:00 CEST 2021") == ("invalid_date", "input is out of range"))
    assert(errOf("Xxx Apr 11 23:00:00 CEST 2021") == ("invalid_date", "input contains invalid characters"))
    // bad calendar day fails in chrono's from_ymd_opt -> OutOfRange (NOT
    // Impossible; that is reserved for field inconsistency, e.g. weekday)
    assert(errOf("Tue Feb 30 23:00:00 CET 2021") == ("invalid_date", "input is out of range"))
    // chrono %a/%b match exactly three letters: a LONG weekday name parses
    // "Sun" then fails at the month position with Invalid
    assert(errOf("Sunday Apr 11 23:33:27 CEST 2021") == ("invalid_date", "input contains invalid characters"))
    // the TooShort / TooLong long tail carries chrono's own Displays
    assert(errOf("Sun Apr 11 23:33:27 CEST") == ("invalid_date", "premature end of input"))
    assert(errOf("Sun Apr 11 23:33:27 CEST 2021 extra") == ("invalid_date", "trailing input"))
  }

  test("launch date: chrono numeric widths (1-digit hour valid, leap second folds to :59)") {
    def dateOf(dateVal: String): java.sql.Timestamp = {
      val lines = Seq(say("TF2Center Lobby #42 | x"), say(s"Launch date: $dateVal"))
      val routed = TfPipeline.routed(TfPipeline.envelope(toDf(Seq(("d8", lines)))))
      val r = Lobby.lobbySettings(routed).collect()(0)
      assert(r.getBoolean(1), s"expected valid: $dateVal")
      val exp = graft.sim.SimExpectations.lobby("d8", lines.toIndexedSeq).get
      val ts = r.getStruct(4).getTimestamp(11)
      assert(exp.date_epoch == ts.toInstant.getEpochSecond, dateVal)
      ts
    }
    // chrono scans 1..=2 digits for %H -- "3:33:27" is a valid time
    assert(dateOf("Sun Apr 11 3:33:27 CEST 2021").toInstant.toString == "2021-04-11T01:33:27Z")
    // second == 60 is chrono's leap-second representation (epoch second 59)
    assert(dateOf("Sun Apr 11 23:59:60 CEST 2021").toInstant.toString == "2021-04-11T21:59:59Z")
  }

  test("leader: leading zeros and '+' are legal u64 (Rust FromStr semantics)") {
    def leaderOf(v: String): (Boolean, Any) = {
      val lines = Seq(say("TF2Center Lobby #42 | x"), say(s"Leader: $v"), say("Map: m"))
      val routed = TfPipeline.routed(TfPipeline.envelope(toDf(Seq(("dl", lines)))))
      val r = Lobby.lobbySettings(routed).collect()(0)
      val exp = graft.sim.SimExpectations.lobby("dl", lines.toIndexedSeq).get
      if (r.getBoolean(1)) {
        val s64 = r.getStruct(4).getStruct(1).getLong(1)
        assert(exp.ok == 1L && exp.leader_steam64 == s64, v)
        (true, s64)
      } else {
        assert(exp.ok == 0L, v)
        (false, r.getString(2))
      }
    }
    assert(leaderOf("b4rney (0076561198055036243)") == ((true, 76561198055036243L)))
    assert(leaderOf("b4rney (+76561198055036243)") == ((true, 76561198055036243L)))
    assert(leaderOf("b4rney (x123)") == ((false, "malformed_leader")))
    // full u64 range like Rust: values above i64::MAX carry as the wrapped
    // two's-complement Long (adversarial-input-only; real steam64 ~7.6e16)
    assert(leaderOf("b4rney (9223372036854775808)") == ((true, Long.MinValue)))
    assert(leaderOf("b4rney (18446744073709551615)") == ((true, -1L)))
    assert(leaderOf("b4rney (18446744073709551616)") == ((false, "malformed_leader")))
    assert(leaderOf("b4rney (00018446744073709551615)") == ((true, -1L)))
  }

  test("lobby id: leading zeros are legal u32 (Rust FromStr semantics)") {
    val lines = Seq(say("TF2Center Lobby #0001148166 | x"), say("Map: foo"))
    val routed = TfPipeline.routed(TfPipeline.envelope(toDf(Seq(("d9", lines)))))
    val r = Lobby.lobbySettings(routed).collect()(0)
    assert(r.getBoolean(1), "leading-zero id must parse")
    assert(r.getStruct(4).getLong(0) == 1148166L)
    // and an over-u32 VALUE (not length) still errors with the right Display
    val lines2 = Seq(say("TF2Center Lobby #004294967296 | x"))
    val routed2 = TfPipeline.routed(TfPipeline.envelope(toDf(Seq(("d10", lines2)))))
    val r2 = Lobby.lobbySettings(routed2).collect()(0)
    assert(!r2.getBoolean(1) && r2.getString(2) == "invalid_lobby_id")
    assert(r2.getString(3) == "number too large to fit in target type")
    val exp = graft.sim.SimExpectations.lobby("d9", lines.toIndexedSeq).get
    assert(exp.ok == 1L && exp.id == 1148166L)
  }
}
