package graft

import graft.expr.{ByteParser, LineParser}
import graft.sources.LogFiles
import org.apache.spark.unsafe.types.UTF8String
import org.scalatest.funsuite.AnyFunSuite

/** Differential spec: the zero-copy [[ByteParser]] must agree with the
  * String-based [[LineParser]] on EVERY line -- reference vectors, all five
  * real logs, generated docs, and the adversarial fuzz corpus -- or refuse
  * (null) and let the caller fall back. Also pins that the byte path
  * actually runs (zero fallbacks on realistic corpora).
  */
class ByteParserSpec extends AnyFunSuite {

  /** Compare a single line across both parsers; returns true when the byte
    * parser handled it (false = fell back). */
  private def diffLine(line: String): Boolean = {
    val s = LineParser.parse(line)
    val b = ByteParser.parse(UTF8String.fromString(line))
    if (b == null) return false
    assert(b.status == s.status, s"status: $line")
    if (s.status == LineParser.OK) {
      assert(Option(b.date).map(_.toString) == Option(s.date), s"date: $line")
      assert(b.kind == s.kind, s"kind: $line")
      assert(Option(b.subject).map(_.toString) == Option(s.subject), s"subject: $line")
      assert(b.eventType.toString == s.eventType, s"eventType: $line")
      assert(b.params.toString == s.params, s"params: $line")
      val ep = LineParser.dateEpoch(s.date)
      assert(b.ts == ep, s"ts: $line")
      // subject-id byte fast path must agree with the String path
      assert(
        graft.expr.Steam.subjectIdU(s.kind, UTF8String.fromString(if (s.subject == null) "" else s.subject)) ==
          graft.expr.Steam.subjectId(s.kind, if (s.subject == null) "" else s.subject),
        s"subjectId: $line"
      )
      diffParams(s.eventType, s.params)
    }
    true
  }

  /** Compare paramsFor + typedError across both parsers for one event. */
  private def diffParams(ty: String, params: String): Unit = {
    val s = LineParser.paramsFor(ty, params)
    val b = ByteParser.paramsFor(UTF8String.fromString(ty), UTF8String.fromString(params))
    if (b == null) return // fallback: caller would use the String path
    assert(b.error == s.error, s"params error: $ty | $params")
    assert(b.keys.map(_.toString).toSeq == s.keys.toSeq, s"param keys: $ty | $params")
    assert(b.values.map(_.toString).toSeq == s.values.toSeq, s"param values: $ty | $params")
    val st = LineParser.typedError(ty, s.keys, s.values)
    val bt = ByteParser.typedError(UTF8String.fromString(ty), b.keys, b.values)
    assert(bt == st, s"typedError: $ty | $params")
    // against-style subject values: byte fast path == String path
    for ((k, v) <- s.keys.zip(s.values) if k == "against" || k == "_target" || k == "objectowner")
      assert(
        graft.expr.Steam.againstSubjectIdU(UTF8String.fromString(v)) ==
          graft.expr.Steam.againstSubjectId(v),
        s"againstSubjectId: $v"
      )
    diffTypedParams(ty, params)
  }

  /** The one-pass [[graft.expr.Kernels.typedParams]] struct must equal the
    * old map formulation (last-wins params map + element_at + clamp/parse
    * chain) field-for-field on every parseable event. */
  private def diffTypedParams(ty: String, params: String): Unit = {
    val row = graft.expr.Kernels
      .typedParams(UTF8String.fromString(ty), UTF8String.fromString(params))
    val p = LineParser.paramsFor(ty, params)
    val m = new scala.collection.mutable.LinkedHashMap[String, String]
    for ((k, v) <- p.keys.zip(p.values)) m(k) = v
    def g(k: String): String = m.get(k).orNull
    def str(i: Int): String = if (row.isNullAt(i)) null else row.getUTF8String(i).toString
    def lng(i: Int): java.lang.Long = if (row.isNullAt(i)) null else row.getLong(i)
    val ctx = s"$ty | $params"

    val expErr = p.error || LineParser.typedError(ty, p.keys, p.values)
    assert(row.getBoolean(0) == expErr, s"tp.err: $ctx")
    assert(str(1) == g("_text"), s"tp.text: $ctx")
    val expTarget = if (m.contains("_target")) g("_target") else g("against")
    assert(str(2) == expTarget, s"tp.target_raw: $ctx")
    assert(str(3) == g("_target_kind"), s"tp.target_kind: $ctx")
    assert(lng(4) == LineParser.clampParse(g("healing"), 4294967295L), s"tp.healing: $ctx")
    assert(
      lng(5) == LineParser.clampParseSigned(g("damage"), Long.MinValue, Long.MaxValue),
      s"tp.dmg: $ctx")
    val expCharge = Option(LineParser.clampParse(g("ubercharge"), 4294967295L))
      .fold(0L)(_.longValue())
    assert(row.getLong(6) == expCharge, s"tp.charge: $ctx")
    val expDur = Option(LineParser.parseF32(g("duration"))).fold(0f)(_.floatValue())
    assert(java.lang.Float.compare(row.getFloat(7), expDur) == 0, s"tp.duration: $ctx")
    val expTime = Option(LineParser.parseF32(g("time"))).fold(0f)(_.floatValue())
    assert(java.lang.Float.compare(row.getFloat(8), expTime) == 0, s"tp.f_time: $ctx")
    val expClsRaw = if (ty == "spawned") g("as") else if (ty == "role_change") g("to") else null
    val expCls = if (expClsRaw == null) null else LineParser.classNormalize(expClsRaw)
    assert(str(9) == expCls, s"tp.class_str: $ctx")
  }

  test("reference vectors and quirk lines agree byte-for-byte") {
    val vectors = Seq(
      """08/06/2018 - 21:13:57: "makxbi<27><[U:1:40364391]><Red>" changed role to "sniper"""",
      """04/11/2021 - 23:33:27: "Console<0><Console><Console>" say "TF2Center Lobby #1148166 | 547089698"""",
      """04/11/2021 - 23:37:35: Team "Red" triggered "pointcaptured" (cp "2")""",
      """04/11/2021 - 23:34:07: "P0PZEE<3><[U:1:883986710]><Blue>" killed "dr/tr<9><[U:1:30575700]><Red>" with "scattergun" (attacker_position "39 -492 81") (victim_position "-34 -434 93")""",
      """04/11/2021 - 23:34:07: "Buddie :")<25><[U:1:123]><>" connected, address "1.2.3.4:27005"""",
      """04/11/2021 - 23:34:07: "a<1><[U:1:1]><Red>" triggered "healed" against "b<2><[U:1:2]><Blue>" (healing "72")""",
      """04/11/2021 - 23:34:07: "m<1><[U:1:1]><Red>" triggered "chargeended" (duration "5.6")""",
      """04/11/2021 - 23:34:07: Team "Blue" current score "3" with "6" players""",
      """04/11/2021 - 23:34:07: World triggered "Round_Win" (winner "Red")""",
      """04/11/2021 - 23:34:07: Tournament mode started""" + "\nBlue Team: x\nRed Team: y",
      """04/11/2021 - 23:34:07: Log file closed""",
      // unicode in VALUE positions stays on the fast path
      """04/11/2021 - 23:34:07: "héllo😀<27><[U:1:40364391]><Red>" say "héllo wörld 😀"""",
      """04/11/2021 - 23:34:07: "naïve<1><[U:1:1]><Red>" killed "pâté<2><[U:1:2]><Blue>" with "weapön"""",
      // short / degenerate lines
      "", "L", "04/11/2021 - 23:34:07: ", "04/11/2021 - 23:34:07: x",
      """04/11/2021 - 23:34:07: Te""", """04/11/2021 - 23:34:07: Team """,
      """04/11/2021 - 23:34:07: "unterminated""""
    )
    var fast = 0
    for (v <- vectors) if (diffLine(v)) fast += 1
    assert(fast >= vectors.length - 1, "realistic vectors must stay on the byte path")
  }

  test("all five real logs agree line-for-line with zero fallbacks") {
    val dataDir = "/root/reference/tests/data"
    val names = Seq("log_2788889", "log_2892242", "log_6s", "log_bball", "log_hl")
    var total = 0
    var fallbacks = 0
    for (name <- names) {
      val f = new java.io.File(s"$dataDir/$name.log.gz")
      assume(f.exists(), s"missing $f")
      for (line <- LogFiles.splitLines(LogFiles.readLogFile(f.getPath))) {
        total += 1
        if (!diffLine(line)) fallbacks += 1
      }
    }
    assert(total > 10000, s"sanity: real corpus read ($total lines)")
    assert(fallbacks == 0, s"$fallbacks/$total real-log lines fell back to the String parser")
  }

  test("generated docs agree with zero fallbacks") {
    var fallbacks = 0
    var total = 0
    for (d <- 3000 until 3020; line <- graft.loggen.LogGen.docLines(13L, d.toLong, 150)) {
      total += 1
      if (!diffLine(line)) fallbacks += 1
    }
    assert(total > 2000)
    assert(fallbacks == 0, s"$fallbacks/$total generated lines fell back")
  }

  test("adversarial fuzz corpus: equal or refused, never divergent (5000 cases)") {
    val rnd = new java.util.Random(42)
    val fragments = Array(
      "04/11/2021 - 10:00:00: ", "\"", "<", ">", "[U:1:", "]", "Team ", "Te",
      "triggered \"", "killed ", "say ", "against ", "(", ")", " ", "\n",
      "damage", "Console<0><Console><Console>", "héllo", "😀", ":",
      "999999999999999999999999", "-1", "Red", "with \""
    )
    var fast = 0
    var fell = 0
    for (_ <- 0 until 5000) {
      val sb = new StringBuilder
      val n = rnd.nextInt(20)
      for (_ <- 0 until n) {
        if (rnd.nextBoolean()) sb.append(fragments(rnd.nextInt(fragments.length)))
        else sb.append((32 + rnd.nextInt(95)).toChar)
      }
      if (diffLine(sb.toString)) fast += 1 else fell += 1
    }
    // the byte path must carry the bulk even of adversarial input; fallbacks
    // are the rare non-ASCII-at-structural-position cases
    assert(fast > 4000, s"byte path handled only $fast/5000 fuzz lines")
  }
}
