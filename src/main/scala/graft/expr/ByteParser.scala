package graft.expr

import org.apache.spark.unsafe.types.UTF8String

/** Byte-level zero-copy twin of [[LineParser]] for the per-line hot path.
  *
  * The map-dominant parse->route leg IS the dominant cost of the 100 TB
  * regime, and the String-based kernel paid one UTF-16 decode (`toString`),
  * O(fields) substring copies, and one UTF-8 re-encode per output field for
  * EVERY line. This parser scans the line's UTF-8 bytes directly
  * (`UTF8String.getBytes`, at most one memcpy and zero transcoding) and
  * emits output fields as `UTF8String.fromBytes` views sharing that single
  * buffer; event types are interned constants.
  *
  * Semantics are IDENTICAL to [[LineParser]] by construction: the grammar's
  * structural bytes (quotes, spaces, '>', '(') are ASCII, so delimiter
  * scans and relative slicing agree between byte- and char-space. At the
  * few positions where the char parser's semantics are observably UTF-16
  * based (fixed-width length guards, blind one-char skips landing on a
  * non-ASCII byte), the parser REFUSES (returns null) and the caller falls
  * back to [[LineParser]] -- exact equality always, byte speed on every
  * structurally-ASCII line (all real log lines). The differential spec
  * (ByteParserSpec) pins equality across the reference vectors, real logs,
  * generated docs, and the adversarial fuzz corpus.
  *
  * Reference grammar: /root/reference/src/raw_event.rs:26-319,
  * /root/reference/src/event/mod.rs:118-192 (see [[LineParser]] for the
  * replicated quirks).
  */
object ByteParser {

  import LineParser.{KIND_CONSOLE, KIND_PLAYER, KIND_SYSTEM, KIND_TEAM, MALFORMED, OK, SKIP}

  // ---- interned output constants -----------------------------------------

  private def u(s: String): UTF8String = UTF8String.fromString(s)

  private val U_RED = u("Red")
  private val U_BLUE = u("Blue")
  private val U_SPECTATOR = u("Spectator")
  private[expr] val U_UNKNOWN = u("unknown")
  private val U_EMPTY = u("")

  private val U_TARGET_KIND = u("_target_kind")
  private val U_TARGET = u("_target")
  private val U_TEXT = u("_text")
  private val U_BLUE_KEY = u("_blue")
  private val U_RED_KEY = u("_red")
  private val U_PLAYER = u("player")
  private val U_TEAM = u("team")
  private val U_CONSOLE = u("console")
  private val U_SYSTEM = u("system")
  private val U_WITH = u("with")
  private val U_AGAINST = u("against")
  private val U_ITEM = u("item")
  private val U_REASON = u("reason")
  private val U_TEAM_KEY = u("team")
  private val U_ADDRESS = u("address")
  private val U_SCORE = u("score")

  // event types (interned; also compared against in paramsFor dispatch)
  private val TY: Map[String, UTF8String] = Seq(
    "joined", "role_change", "suicide", "current_score", "connected", "cvars",
    "kill", "say_team", "say", "spawned", "picked_up", "final_score",
    "log_file_started", "log_file_closed", "disconnect", "entered",
    "tournament_start", "request", "response", "steamid_validated",
    "not_uploaded", "shot_fired", "shot_hit", "damage", "domination",
    "healed", "first_heal", "flag_event", "kill_assist", "killed_object",
    "revenge", "rocket_jump", "empty_uber", "built_object", "carry_object",
    "drop_object", "extinguished", "point_captured", "object_detonated",
    "medic_death_ex", "medic_death", "charge_ended", "charge_ready",
    "charge_deployed", "capture_blocked", "advantage_lost",
    "round_setup_begin", "round_setup_end", "round_start", "round_win",
    "round_length", "round_overtime", "mini_round_selected",
    "mini_round_start", "mini_round_win", "mini_round_length", "game_over",
    "paused", "unpaused", "win_limit", "unknown"
  ).map(s => s -> u(s)).toMap

  // ---- byte helpers ------------------------------------------------------

  @inline private def asciiAt(b: Array[Byte], i: Int): Boolean = b(i) >= 0

  private def asciiRange(b: Array[Byte], from: Int, until: Int): Boolean = {
    var i = from
    val e = if (until > b.length) b.length else until
    while (i < e) { if (b(i) < 0) return false; i += 1 }
    true
  }

  private def indexOfByte(b: Array[Byte], from: Int, end: Int, c: Byte): Int = {
    var i = from
    while (i < end) { if (b(i) == c) return i; i += 1 }
    -1
  }

  /** First index of the two-byte sequence c1 c2 in [from, end). */
  private def indexOf2(b: Array[Byte], from: Int, end: Int, c1: Byte, c2: Byte): Int = {
    var i = from
    while (i < end - 1) { if (b(i) == c1 && b(i + 1) == c2) return i; i += 1 }
    -1
  }

  private def startsWith(b: Array[Byte], pos: Int, end: Int, lit: String): Boolean = {
    val l = lit.length
    if (end - pos < l) return false
    var i = 0
    while (i < l) { if (b(pos + i) != lit.charAt(i).toByte) return false; i += 1 }
    true
  }

  private def sliceEndsWith(b: Array[Byte], start: Int, end: Int, lit: String): Boolean = {
    val l = lit.length
    if (end - start < l) return false
    var i = 0
    while (i < l) { if (b(end - l + i) != lit.charAt(i).toByte) return false; i += 1 }
    true
  }

  private def sliceEquals(b: Array[Byte], start: Int, end: Int, lit: String): Boolean = {
    if (end - start != lit.length) return false
    startsWith(b, start, end, lit)
  }

  // ---- results -----------------------------------------------------------

  /** Envelope result; null from [[parse]] means "fall back to LineParser". */
  final class RawB(
      val status: Byte,
      val kind: Byte,
      val date: UTF8String,
      val subject: UTF8String,
      val eventType: UTF8String,
      val params: UTF8String,
      val ts: Long // Long.MinValue when the date is invalid
  )

  private def rawStatus(status: Byte): RawB =
    new RawB(status, 0, null, null, null, null, Long.MinValue)

  /** Subject-parse scratch (one per call; escape analysis takes care of it). */
  private final class SubjB {
    var status: Byte = OK
    var kind: Byte = 0
    var sStart: Int = -1 // slice subject; -1 with constSubj==null => null subject
    var sEnd: Int = -1
    var constSubj: UTF8String = _
    var after: Int = 0
    var fallback: Boolean = false
  }

  /** subject_parser twin over [p, e). */
  private def subjectParse(b: Array[Byte], p: Int, e: Int, out: SubjB): Unit = {
    out.status = OK; out.kind = 0; out.sStart = -1; out.sEnd = -1
    out.constSubj = null; out.fallback = false
    if (p < e && b(p) == '"') {
      val body = p + 1
      val idx = indexOf2(b, body, e, '>', '"')
      if (idx < 0) { // no subject terminator: console, re-lex from the full rest
        out.kind = KIND_CONSOLE; out.after = p
        return
      }
      val afterQ = idx + 2
      if (afterQ >= e) { out.status = SKIP; return } // skip(1) -> Incomplete
      // skip one char: the char parser skips one UTF-16 unit; only safe to
      // mirror bytewise when that unit is ASCII
      if (!asciiAt(b, afterQ)) { out.fallback = true; return }
      if (sliceEndsWith(b, body, idx + 1, "le>")) {
        out.kind = KIND_CONSOLE; out.after = afterQ + 1
      } else {
        out.kind = KIND_PLAYER; out.sStart = body; out.sEnd = idx + 1; out.after = afterQ + 1
      }
    } else if (startsWith(b, p, e, "Te")) {
      // the char parser indexes UTF-16 positions <= 12 here; require the
      // window to be ASCII so byte positions coincide
      if (!asciiRange(b, p, p + 13)) { out.fallback = true; return }
      if (e - p <= 6) { out.status = SKIP; return }
      val b6 = b(p + 6)
      if (b6 == 'r') {
        if (e - p < 11) { out.status = MALFORMED; return }
        out.kind = KIND_TEAM; out.constSubj = U_RED; out.after = p + 11
      } else if (b6 == 'b') {
        if (e - p < 12) { out.status = MALFORMED; return }
        out.kind = KIND_TEAM; out.constSubj = U_BLUE; out.after = p + 12
      } else {
        val r2 = p + 7
        val q = indexOfByte(b, r2, e, '"')
        if (q < 0) { out.status = SKIP; return }
        val afterQ = q + 1
        if (afterQ >= e) { out.status = SKIP; return }
        if (!asciiAt(b, afterQ)) { out.fallback = true; return }
        out.kind = KIND_TEAM; out.constSubj = U_SPECTATOR; out.after = afterQ + 1
      }
    } else {
      val s = indexOfByte(b, p, e, ' ')
      if (s < 0) { out.kind = KIND_SYSTEM; out.sStart = p; out.sEnd = e; out.after = e }
      else { out.kind = KIND_SYSTEM; out.sStart = p; out.sEnd = s; out.after = s + 1 }
    }
  }

  // ---- envelope ----------------------------------------------------------

  /** Envelope parse; null => caller must fall back to the String parser. */
  def parse(line: UTF8String): RawB = {
    val b = line.getBytes
    val n = b.length
    // n < 24 implies charLength < 24 too (chars <= bytes): SKIP either way
    if (n < 24) return rawStatus(SKIP)
    // the char parser's `length < 24` guard and fixed 0/21/23 splits are
    // UTF-16-indexed; require the window to be ASCII so they coincide
    if (!asciiRange(b, 0, 24)) return null

    val sj = new SubjB
    subjectParse(b, 23, n, sj)
    if (sj.fallback) return null
    if (sj.status != OK) return rawStatus(sj.status)

    val tyAndPos = lexEventType(b, sj.after, n)
    if (tyAndPos == null) return null
    val ty = tyAndPos._1
    var pPos = tyAndPos._2
    if (pPos < n && b(pPos) == ' ') pPos += 1

    val subject =
      if (sj.constSubj != null) sj.constSubj
      else if (sj.sStart >= 0) UTF8String.fromBytes(b, sj.sStart, sj.sEnd - sj.sStart)
      else null
    new RawB(
      OK,
      sj.kind,
      UTF8String.fromBytes(b, 0, 21),
      subject,
      ty,
      UTF8String.fromBytes(b, pPos, n - pPos),
      dateEpochBytes(b)
    )
  }

  /** [[LineParser.dateEpoch]] on the first 21 (ASCII-verified) bytes. */
  private def dateEpochBytes(b: Array[Byte]): Long = {
    @inline def d2(a: Int): Int = {
      val c1 = b(a); val c2 = b(a + 1)
      if (c1 < '0' || c1 > '9' || c2 < '0' || c2 > '9') return -1
      (c1 - '0') * 10 + (c2 - '0')
    }
    val mo = d2(0); val dy = d2(3); val y1 = d2(6); val y2 = d2(8)
    val h = d2(13); val mi = d2(16); val se = d2(19)
    if (mo < 1 || mo > 12 || dy < 1 || dy > 31 || y1 < 0 || y2 < 0 ||
      h < 0 || h > 23 || mi < 0 || mi > 59 || se < 0 || se > 59) return Long.MinValue
    val y = y1 * 100 + y2
    val dim = mo match {
      case 2              => if ((y % 4 == 0 && y % 100 != 0) || y % 400 == 0) 29 else 28
      case 4 | 6 | 9 | 11 => 30
      case _              => 31
    }
    if (dy > dim) return Long.MinValue
    val yy = if (mo <= 2) y - 1 else y
    val era = (if (yy >= 0) yy else yy - 399) / 400
    val yoe = yy - era * 400
    val doy = (153 * (if (mo > 2) mo - 3 else mo + 9) + 2) / 5 + dy - 1
    val doe = yoe * 365 + yoe / 4 - yoe / 100 + doy
    val days = era * 146097L + doe - 719468L
    days * 86400L + h * 3600L + mi * 60L + se
  }

  // ---- event-type lexer --------------------------------------------------

  /** (interned type, position after token); null => fallback (never taken:
    * literal matching is pure byte compare -- kept for uniformity). */
  private def lexEventType(b: Array[Byte], p: Int, e: Int): (UTF8String, Int) = {
    var ty: String = null
    var len = 0
    @inline def m(lit: String, name: String): Boolean =
      if (startsWith(b, p, e, lit)) { ty = name; len = lit.length; true } else false

    if (p < e) {
      b(p) match {
        case 'j' => m("joined ", "joined")
        case 'c' =>
          m("changed role ", "role_change") ||
          m("committed suicide ", "suicide") ||
          m("current ", "current_score") ||
          m("connected, ", "connected") ||
          m("cvars ", "cvars")
        case 'k' => m("killed ", "kill")
        case 's' =>
          m("say_team ", "say_team") || m("say ", "say") || m("spawned ", "spawned")
        case 'p' => m("picked up ", "picked_up")
        case 'f' =>
          m("final ", "final_score") || m("file started ", "log_file_started") ||
          m("file closed", "log_file_closed")
        case 'd' => m("disconnected ", "disconnect")
        case 'e' => m("entered the game", "entered")
        case 'm' => m("mode started", "tournament_start")
        case 'R' => m("Request:  ", "request") || m("Response:  ", "response")
        case 'S' => m("STEAM USERID validated", "steamid_validated")
        case 'T' => m("The log might have not been uploaded. ", "not_uploaded")
        case 't' =>
          // `input.length > 11` in chars: given the ASCII 11-byte prefix,
          // bytes > 11 iff chars > 11
          if (startsWith(b, p, e, "triggered \"") && e - p > 11) {
            val t = p + 11
            val base = 11
            @inline def mq(body: String, name: String): Boolean =
              if (startsWith(b, t, e, body)) { ty = name; len = base + body.length; true }
              else false
            b(t) match {
              case 's' => mq("shot_fired\"", "shot_fired") || mq("shot_hit\"", "shot_hit")
              case 'd' => mq("damage\"", "damage") || mq("domination\"", "domination")
              case 'h' => mq("healed\"", "healed")
              case 'f' =>
                mq("first_heal_after_spawn\"", "first_heal") || mq("flagevent\"", "flag_event")
              case 'k' => mq("kill assist\"", "kill_assist") || mq("killedobject\"", "killed_object")
              case 'r' => mq("revenge\"", "revenge") || mq("rocket_jump\"", "rocket_jump")
              case 'e' => mq("empty_uber\"", "empty_uber")
              case 'p' =>
                mq("player_builtobject\"", "built_object") ||
                mq("player_dropobject\"", "carry_object") || // swapped in the reference
                mq("player_carryobject\"", "drop_object") || // swapped in the reference
                mq("player_extinguished\"", "extinguished") ||
                mq("pointcaptured\"", "point_captured")
              case 'o' => mq("object_detonated\"", "object_detonated")
              case 'm' =>
                mq("medic_death_ex\"", "medic_death_ex") || mq("medic_death\"", "medic_death")
              case 'c' =>
                mq("chargeended\"", "charge_ended") || mq("chargeready\"", "charge_ready") ||
                mq("chargedeployed\"", "charge_deployed") ||
                mq("captureblocked\"", "capture_blocked")
              case 'l' => mq("lost_uber_advantage\"", "advantage_lost")
              case 'R' =>
                mq("Round_Setup_Begin\"", "round_setup_begin") ||
                mq("Round_Setup_End\"", "round_setup_end") ||
                mq("Round_Start\"", "round_start") ||
                mq("Round_Win\"", "round_win") ||
                mq("Round_Length\"", "round_length") ||
                mq("Round_Overtime\"", "round_overtime")
              case 'M' =>
                mq("Mini_Round_Selected\"", "mini_round_selected") ||
                mq("Mini_Round_Start\"", "mini_round_start") ||
                mq("Mini_Round_Win\"", "mini_round_win") ||
                mq("Mini_Round_Length\"", "mini_round_length")
              case 'G' =>
                mq("Game_Over\"", "game_over") || mq("Game_Paused\"", "paused") ||
                mq("Game_Unpaused\"", "unpaused")
              case 'I' => mq("Intermission_Win_Limit\"", "win_limit")
              case _   => false
            }
          } else false
        case _ => false
      }
    }
    if (ty == null) (TY("unknown"), p) else (TY(ty), p + len)
  }

  // ---- params ------------------------------------------------------------

  /** Param-extraction result; null from [[paramsFor]] => fall back. */
  final class ParamsB(
      val keys: Array[UTF8String],
      val values: Array[UTF8String],
      val error: Boolean
  )

  private val EMPTY = new ParamsB(Array.empty, Array.empty, false)
  private def perr = new ParamsB(Array.empty, Array.empty, true)

  /** Builder used by the per-event parsers; `bad` => fall back. */
  private final class PB {
    val keys = new java.util.ArrayList[UTF8String](8)
    val vals = new java.util.ArrayList[UTF8String](8)
    var bad = false
    def add(k: UTF8String, v: UTF8String): Unit = { keys.add(k); vals.add(v) }
    def result(error: Boolean): ParamsB =
      new ParamsB(
        keys.toArray(new Array[UTF8String](keys.size())),
        vals.toArray(new Array[UTF8String](vals.size())),
        error
      )
  }

  // dispatch constants (UTF8String.equals is a length-guarded byte compare;
  // no per-row decode)
  private val T_KILL = TY("kill")
  private val T_SAY = TY("say")
  private val T_SAY_TEAM = TY("say_team")
  private val T_KILL_ASSIST = TY("kill_assist")
  private val T_EXTINGUISHED = TY("extinguished")
  private val T_PICKED_UP = TY("picked_up")
  private val T_GAME_OVER = TY("game_over")
  private val T_JOINED = TY("joined")
  private val T_CONNECTED = TY("connected")
  private val T_CURRENT_SCORE = TY("current_score")
  private val T_FINAL_SCORE = TY("final_score")
  private val T_TOURNAMENT = TY("tournament_start")
  private val T_REQUEST = TY("request")
  private val T_RESPONSE = TY("response")
  private val T_DAMAGE = TY("damage")
  private val T_HEALED = TY("healed")
  private val T_CHARGE_ENDED = TY("charge_ended")
  private val T_ADVANTAGE_LOST = TY("advantage_lost")
  private val T_FIRST_HEAL = TY("first_heal")
  private val T_MEDIC_DEATH = TY("medic_death")

  private val SPEC_KILL_ASSIST = Array(("against", U_TARGET))
  private val SPEC_EXTINGUISHED = Array(("against", U_AGAINST), ("with", U_WITH))
  private val SPEC_PICKED_UP = Array(("item", U_ITEM))
  private val SPEC_GAME_OVER = Array(("reason", U_REASON))
  private val SPEC_JOINED = Array(("team", U_TEAM_KEY))
  private val SPEC_CONNECTED = Array(("address", U_ADDRESS))
  private val SPEC_SCORE = Array(("score", U_SCORE), ("with", U_WITH))

  /** [[LineParser.paramsFor]] twin; null => fall back to the String path. */
  def paramsFor(eventType: UTF8String, params: UTF8String): ParamsB = {
    val b = params.getBytes
    val n = b.length
    val t = eventType
    if (t.equals(T_KILL)) parseKill(b, n)
    else if (t.equals(T_SAY) || t.equals(T_SAY_TEAM)) parseSay(b, n)
    else if (t.equals(T_KILL_ASSIST)) parseRequiredThenIter(b, n, SPEC_KILL_ASSIST)
    else if (t.equals(T_EXTINGUISHED)) parseRequiredThenIter(b, n, SPEC_EXTINGUISHED)
    else if (t.equals(T_PICKED_UP)) parseRequiredThenIter(b, n, SPEC_PICKED_UP)
    else if (t.equals(T_GAME_OVER)) parseRequiredThenIter(b, n, SPEC_GAME_OVER)
    else if (t.equals(T_JOINED)) parseRequiredThenIter(b, n, SPEC_JOINED)
    else if (t.equals(T_CONNECTED)) parseRequiredThenIter(b, n, SPEC_CONNECTED)
    else if (t.equals(T_CURRENT_SCORE) || t.equals(T_FINAL_SCORE))
      parseRequiredThenIter(b, n, SPEC_SCORE)
    else if (t.equals(T_TOURNAMENT)) parseTournament(b, n)
    else if (t.equals(T_REQUEST) || t.equals(T_RESPONSE)) EMPTY
    else {
      val pb = new PB
      paramIter(b, 0, n, pb)
      if (pb.bad) null else pb.result(false)
    }
  }

  /** ParamIter twin over [start, e); appends into `pb`. */
  private def paramIter(b: Array[Byte], start: Int, e: Int, pb: PB): Unit = {
    var pos = start
    var done = false
    while (!done) {
      var p = pos
      var open = false
      if (p < e && b(p) == '(') { open = true; p += 1 }
      val sp = indexOfByte(b, p, e, ' ')
      if (sp < 0) done = true
      else {
        val kStart = p
        val kEnd = sp
        p = sp + 1
        if (p >= e) done = true // skip(input, 1) -> Incomplete
        else {
          // char parser skips one UTF-16 unit over the opening-quote slot
          if (!asciiAt(b, p)) { pb.bad = true; return }
          p += 1
          var vStart = -1
          var vEnd = -1
          if (sliceEquals(b, kStart, kEnd, "against") || sliceEquals(b, kStart, kEnd, "objectowner")) {
            val idx = indexOf2(b, p, e, '>', '"')
            if (idx < 0) done = true
            else { vStart = p; vEnd = idx + 1; p = idx + 2 }
          } else {
            val q = indexOfByte(b, p, e, '"')
            if (q < 0) done = true
            else { vStart = p; vEnd = q; p = q + 1 }
          }
          if (!done && open) {
            if (p >= e) done = true
            else {
              if (!asciiAt(b, p)) { pb.bad = true; return }
              p += 1
            }
          }
          if (!done) {
            if (p < e && b(p) == ' ') p += 1
            pb.add(
              UTF8String.fromBytes(b, kStart, kEnd - kStart),
              UTF8String.fromBytes(b, vStart, vEnd - vStart)
            )
            pos = p
          }
        }
      }
    }
  }

  /** param_parse_with twin; result fields in the scratch [[PW]]. */
  private final class PW {
    var vStart: Int = -1
    var vEnd: Int = -1
    var next: Int = 0
    var incomplete: Boolean = false
    var bad: Boolean = false
  }

  private def paramParseWith(b: Array[Byte], start: Int, e: Int, key: String, out: PW): Unit = {
    out.incomplete = false; out.bad = false
    var p = start
    var hasOpen = 0
    if (p < e && b(p) == '(') { hasOpen = 1; p += 1 }
    val skip = key.length + 2
    // char guard `in.length < skip`: bytes < skip implies chars < skip; when
    // bytes >= skip the skipped window must be ASCII for positions to agree
    if (e - p < skip) { out.incomplete = true; return }
    if (!asciiRange(b, p, p + skip)) { out.bad = true; return }
    p += skip
    if (key == "against" || key == "objectowner") {
      val idx = indexOf2(b, p, e, '>', '"')
      if (idx < 0) { out.incomplete = true; return }
      out.vStart = p; out.vEnd = idx + 1; p = idx + 2
    } else {
      val q = indexOfByte(b, p, e, '"')
      if (q < 0) { out.incomplete = true; return }
      out.vStart = p; out.vEnd = q; p = q + 1
    }
    if (e - p < hasOpen) { out.incomplete = true; return }
    if (hasOpen == 1) {
      if (!asciiAt(b, p)) { out.bad = true; return }
      p += 1
    }
    if (p < e) {
      if (!asciiAt(b, p)) { out.bad = true; return }
      p += 1 // tolerant trailing skip (one char)
    }
    out.next = p
  }

  private def parseRequiredThenIter(
      b: Array[Byte],
      n: Int,
      spec: Array[(String, UTF8String)]
  ): ParamsB = {
    val pb = new PB
    val pw = new PW
    var p = 0
    var i = 0
    while (i < spec.length) {
      paramParseWith(b, p, n, spec(i)._1, pw)
      if (pw.bad) return null
      if (pw.incomplete) return perr
      pb.add(spec(i)._2, UTF8String.fromBytes(b, pw.vStart, pw.vEnd - pw.vStart))
      p = pw.next
      i += 1
    }
    paramIter(b, p, n, pb)
    if (pb.bad) null else pb.result(false)
  }

  private def parseKill(b: Array[Byte], n: Int): ParamsB = {
    val sj = new SubjB
    subjectParse(b, 0, n, sj)
    if (sj.fallback) return null
    if (sj.status != OK) return perr
    var p = sj.after
    // skip_after = 1 (one char in the char parser)
    if (p >= n) return perr
    if (!asciiAt(b, p)) return null
    p += 1
    val pw = new PW
    paramParseWith(b, p, n, "with", pw)
    if (pw.bad) return null
    if (pw.incomplete) return perr
    val pb = new PB
    pb.add(
      U_TARGET_KIND,
      sj.kind match {
        case KIND_PLAYER  => U_PLAYER
        case KIND_TEAM    => U_TEAM
        case KIND_CONSOLE => U_CONSOLE
        case _            => U_SYSTEM
      }
    )
    val subj =
      if (sj.constSubj != null) sj.constSubj
      else if (sj.sStart >= 0) UTF8String.fromBytes(b, sj.sStart, sj.sEnd - sj.sStart)
      else null
    if (subj != null) pb.add(U_TARGET, subj)
    pb.add(U_WITH, UTF8String.fromBytes(b, pw.vStart, pw.vEnd - pw.vStart))
    paramIter(b, pw.next, n, pb)
    if (pb.bad) null else pb.result(false)
  }

  private def parseSay(b: Array[Byte], n: Int): ParamsB = {
    var text: UTF8String = null
    if (n < 1) text = U_EMPTY // skip(1) fails -> Incomplete -> trim of ""
    else {
      // char parser: params.substring(1) -- one UTF-16 unit
      if (!asciiAt(b, 0)) return null
      val q = indexOfByte(b, 1, n, '"')
      text =
        if (q < 0) trimQuotes(b, n) // Incomplete fallback: whole input trimmed
        else UTF8String.fromBytes(b, 1, q - 1)
    }
    new ParamsB(Array(U_TEXT), Array(text), false)
  }

  private def trimQuotes(b: Array[Byte], n: Int): UTF8String = {
    var a = 0
    var e = n
    while (a < e && b(a) == '"') a += 1
    while (e > a && b(e - 1) == '"') e -= 1
    UTF8String.fromBytes(b, a, e - a)
  }

  private def parseTournament(b: Array[Byte], n: Int): ParamsB = {
    // char guard `length < 12`: bytes < 12 implies chars < 12
    if (n < 12) return perr
    if (!asciiRange(b, 0, 12)) return null
    var in = 12 // "\nBlue Team: ".length
    var nl = indexOfByte(b, in, n, '\n')
    var blueS = 0; var blueE = 0
    if (nl < 0) { blueS = in; blueE = n; in = n }
    else { blueS = in; blueE = nl; in = nl }
    if (n - in < 11) return perr
    if (!asciiRange(b, in, in + 11)) return null
    in += 11 // "\nRed Team: ".length
    nl = indexOfByte(b, in, n, '\n')
    val redS = in
    val redE = if (nl < 0) n else nl
    new ParamsB(
      Array(U_BLUE_KEY, U_RED_KEY),
      Array(
        UTF8String.fromBytes(b, blueS, blueE - blueS),
        UTF8String.fromBytes(b, redS, redE - redS)
      ),
      false
    )
  }

  // ---- typed-field validation -------------------------------------------

  private val K_HEALING = u("healing")
  private val K_DAMAGE = u("damage")
  private val K_REALDAMAGE = u("realdamage")
  private val K_ATT_POS = u("attacker_position")
  private val K_VIC_POS = u("victim_position")
  private val K_DURATION = u("duration")
  private val K_TIME = u("time")
  private val K_UBERCHARGE = u("ubercharge")

  /** [[LineParser.typedError]] over UTF8String key/value arrays: last-wins
    * lookup by interned key (byte compare); only the <=2 values an event
    * actually inspects go through the scalar parsers via toString (short
    * numerics). */
  def typedError(eventType: UTF8String, keys: Array[UTF8String], values: Array[UTF8String]): Boolean = {
    def get(k: UTF8String): String = {
      var i = keys.length - 1
      while (i >= 0) {
        if (keys(i).equals(k)) return values(i).toString
        i -= 1
      }
      null
    }
    def badU32(k: UTF8String) = { val v = get(k); v != null && LineParser.clampParse(v, 4294967295L) == null }
    def badI64(k: UTF8String) = {
      val v = get(k); v != null && LineParser.clampParseSigned(v, Long.MinValue, Long.MaxValue) == null
    }
    def badF32(k: UTF8String) = { val v = get(k); v != null && LineParser.parseF32(v) == null }
    def badPos(k: UTF8String) = {
      val v = get(k)
      v != null && {
        val a = v.indexOf(' ')
        if (a < 0) true
        else {
          val bb = v.indexOf(' ', a + 1)
          bb < 0 ||
          LineParser.clampParseSigned(v.substring(0, a), Int.MinValue, Int.MaxValue) == null ||
          LineParser.clampParseSigned(v.substring(a + 1, bb), Int.MinValue, Int.MaxValue) == null ||
          LineParser.clampParseSigned(v.substring(bb + 1), Int.MinValue, Int.MaxValue) == null
        }
      }
    }
    val t = eventType
    if (t.equals(T_HEALED)) badU32(K_HEALING)
    else if (t.equals(T_DAMAGE)) badI64(K_DAMAGE) || badI64(K_REALDAMAGE)
    else if (t.equals(T_KILL) || t.equals(T_KILL_ASSIST)) badPos(K_ATT_POS) || badPos(K_VIC_POS)
    else if (t.equals(T_CHARGE_ENDED)) badF32(K_DURATION)
    else if (t.equals(T_ADVANTAGE_LOST) || t.equals(T_FIRST_HEAL)) badF32(K_TIME)
    else if (t.equals(T_MEDIC_DEATH)) badU32(K_UBERCHARGE)
    else false
  }
}
