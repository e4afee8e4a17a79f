package graft

import graft.expr.{LineParser, Steam}
import org.scalatest.funsuite.AnyFunSuite

/** Unit tests using the reference's own inline test vectors
  * (raw_event.rs:65-72,118-132,179-187,321-335; parsing.rs:72-76). */
class LineParserSpec extends AnyFunSuite {

  test("parse raw line (reference test_parse_raw)") {
    val line =
      """08/06/2018 - 21:13:57: "makxbi<27><[U:1:40364391]><Red>" changed role to "sniper""""
    val r = LineParser.parse(line)
    assert(r.status == LineParser.OK)
    assert(r.date == "08/06/2018 - 21:13:57")
    assert(r.kind == LineParser.KIND_PLAYER)
    assert(r.subject == "makxbi<27><[U:1:40364391]><Red>")
    assert(r.eventType == "role_change")
    assert(r.params == """to "sniper"""")
  }

  test("split player subject (reference test_split_player_subject)") {
    assert(
      Steam.splitPlayerSubject("Fin<4><[U:1:129852188]><Blue>").toSeq ==
        Seq("Fin", "4", "[U:1:129852188]", "Blue")
    )
    assert(
      Steam.splitPlayerSubject("Electra<3<8><[U:1:104485840]><Red>").toSeq ==
        Seq("Electra<3", "8", "[U:1:104485840]", "Red")
    )
    assert(
      Steam.splitPlayerSubject("sorry, squidie<15><[U:1:83437541]><Red>").toSeq ==
        Seq("sorry, squidie", "15", "[U:1:83437541]", "Red")
    )
  }

  test("subject parser quote-in-name (reference test_subject_parser)") {
    val sj = LineParser.subjectParse(""""Buddie :")<25><[U:1:123]><>" connected""")
    assert(sj.status == LineParser.OK)
    assert(sj.kind == LineParser.KIND_PLAYER)
    assert(sj.subject == """Buddie :")<25><[U:1:123]><>""")
    assert(sj.after == "connected")
  }

  test("find_between_end (reference test_find_between_end)") {
    assert(Steam.findBetweenEnd("asd[foo]bar", '[', ']') == "foo")
    assert(Steam.findBetweenEnd("asd]foo[bar", '[', ']') == null)
  }

  test("console subject") {
    val line =
      """04/11/2021 - 23:33:27: "Console<0><Console><Console>" say "TF2Center Lobby #1148166 | 547089698""""
    val r = LineParser.parse(line)
    assert(r.kind == LineParser.KIND_CONSOLE)
    assert(r.eventType == "say")
    val p = LineParser.paramsFor("say", r.params)
    assert(p.keys.toSeq == Seq("_text"))
    assert(p.values(0) == "TF2Center Lobby #1148166 | 547089698")
  }

  test("Team subject parses as Spectator (uppercase-compare quirk)") {
    val line = """04/11/2021 - 23:37:35: Team "Red" triggered "pointcaptured" (cp "2")"""
    val r = LineParser.parse(line)
    assert(r.kind == LineParser.KIND_TEAM)
    assert(r.subject == "Spectator") // byte 6 is 'R', not 'r' -> spectator arm
    assert(r.eventType == "point_captured")
  }

  test("kill line: target + weapon first-char-loss quirk") {
    val line =
      """04/11/2021 - 23:34:07: "P0PZEE<3><[U:1:883986710]><Blue>" killed "dr/tr<9><[U:1:30575700]><Red>" with "scattergun" (attacker_position "39 -492 81") (victim_position "-34 -434 93")"""
    val r = LineParser.parse(line)
    assert(r.eventType == "kill")
    val p = LineParser.paramsFor("kill", r.params)
    val m = p.keys.zip(p.values).toMap
    assert(m("_target") == "dr/tr<9><[U:1:30575700]><Red>")
    assert(m("_target_kind") == "player")
    assert(m("with") == "cattergun") // replicated skip_after misalignment
    assert(m("attacker_position") == "39 -492 81")
    assert(m("victim_position") == "-34 -434 93")
    assert(!p.error)
  }

  test("damage params with against hack") {
    val params =
      """against "P0PZEE<3><[U:1:883986710]><Blue>" (damage "3") (weapon "scattergun")"""
    val p = LineParser.paramIter(params)
    val m = p.keys.zip(p.values).toMap
    assert(m("against") == "P0PZEE<3><[U:1:883986710]><Blue>")
    assert(m("damage") == "3")
    assert(m("weapon") == "scattergun")
  }

  test("against value with quotes in name terminates at >\"") {
    val params = """against "Budd"ie<25><[U:1:123]><Red>" (damage "42")"""
    val p = LineParser.paramIter(params)
    val m = p.keys.zip(p.values).toMap
    assert(m("against") == """Budd"ie<25><[U:1:123]><Red>""")
    assert(m("damage") == "42")
  }

  test("event type lexer literal set") {
    val cases = Seq(
      "joined team \"Blue\"" -> "joined",
      "triggered \"medic_death_ex\" (uberpct \"1\")" -> "medic_death_ex",
      "triggered \"medic_death\" (x \"1\")" -> "medic_death",
      "triggered \"player_dropobject\"" -> "carry_object",
      "triggered \"player_carryobject\"" -> "drop_object",
      "say_team \"hi\"" -> "say_team",
      "say \"hi\"" -> "say",
      "current score \"0\" with \"6\" players" -> "current_score",
      "final score \"4\" with \"6\" players" -> "final_score",
      "triggered \"Round_Start\"" -> "round_start",
      "triggered \"Round_Win\" (winner \"Red\")" -> "round_win",
      "Request:  something" -> "request",
      "STEAM USERID validated" -> "steamid_validated",
      "entered the game" -> "entered",
      "file started (file \"logs/x.log\")" -> "log_file_started",
      "file closed" -> "log_file_closed",
      "mode started\nBlue Team: A\nRed Team: B" -> "tournament_start",
      "garbage input here" -> "unknown"
    )
    for ((in, want) <- cases)
      assert(LineParser.lexEventType(in)._1 == want, s"input: $in")
  }

  test("int clamp parse (overflow -> MAX, empty -> MAX, junk -> null)") {
    assert(LineParser.clampParse("42", 65535L) == 42L)
    assert(LineParser.clampParse("70000", 65535L) == 65535L)
    assert(LineParser.clampParse("99999999999999999999999", 4294967295L) == 4294967295L)
    assert(LineParser.clampParse("", 255L) == 255L)
    assert(LineParser.clampParse("12a", 255L) == null)
    assert(LineParser.clampParse("-1", 255L) == null)
  }

  test("steam id arithmetic") {
    assert(Steam.steam3Account("[U:1:129852188]") == 129852188L)
    assert(Steam.steam2Account("STEAM_0:0:64926094") == 129852188L)
    assert(Steam.steam2Account("STEAM_0:1:15287850") == 30575701L)
    assert(Steam.steam64(34394789L) == 76561197994660517L)
    assert(Steam.steam3(34394789L) == "[U:1:34394789]")
    // fast-path id from a full player raw
    val sid = Steam.playerSubjectId("dr/tr<9><[U:1:30575700]><Red>")
    assert(Steam.packedKind(sid) == 1 && Steam.packedValue(sid) == 30575700L)
    // bot: no steam id text
    val bot = Steam.playerSubjectId("SomeBot<7><BOT><Red>")
    assert(Steam.packedKind(bot) == 2 && Steam.packedValue(bot) == 7L)
    // console raw via against path
    assert(Steam.packedKind(Steam.againstSubjectId("Console<0><Console><Console>")) == 6)
  }

  test("say with truncated quote falls back to trim") {
    val p = LineParser.paramsFor("say", "\"no closing quote")
    assert(p.values(0) == "no closing quote")
  }

  test("tournament mode 2-line body") {
    val p = LineParser.paramsFor("tournament_start", "\nBlue Team: BLUE\nRed Team: RED")
    val m = p.keys.zip(p.values).toMap
    assert(m("_blue") == "BLUE" && m("_red") == "RED")
  }

  test("point_captured params keep playerN/positionN pairs") {
    val params =
      """(cp "2") (cpname "#Well_cap_center") (numcappers "2") (player1 "A<4><[U:1:1]><Red>") (position1 "549 -361 261") (player2 "B<5><[U:1:2]><Red>") (position2 "1 2 3")"""
    val p = LineParser.paramsFor("point_captured", params)
    val m = p.keys.zip(p.values).toMap
    assert(m("cp") == "2" && m("numcappers") == "2")
    assert(m("player1") == "A<4><[U:1:1]><Red>" && m("position2") == "1 2 3")
  }
}
