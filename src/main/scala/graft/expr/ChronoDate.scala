package graft.expr

/** Byte-exact twin of chrono 0.4's `NaiveDateTime::parse_from_str` for the
  * ONE format the reference uses, `"%a %b %d %H:%M:%S %Z %Y"`
  * (`/root/reference/src/module/lobbysettings.rs:183-192`), including the
  * full ParseError long tail the thiserror Display path surfaces:
  *
  *  - `TooShort`   -> "premature end of input"
  *  - `TooLong`    -> "trailing input"
  *  - `Invalid`    -> "input contains invalid characters"
  *  - `OutOfRange` -> "input is out of range"
  *  - `Impossible` -> "no possible date and time matching input"
  *  - `NotEnough`  -> "input is not enough for unique date and time"
  *    (unreachable with this format: a scan that completes always sets every
  *    field `to_naive_date`/`to_naive_time` need; kept for the Display map)
  *
  * Semantics transcribed from chrono's format/parse.rs + format/scan.rs:
  *
  *  - `%a`/`%b` match EXACTLY three bytes case-insensitively (long names are
  *    NOT accepted: "Thursday" parses "Thu" and fails at the month); fewer
  *    than three remaining BYTES is TooShort, a non-matching triple Invalid.
  *  - literal spaces in the format skip zero-or-more Unicode-White_Space
  *    chars and never fail.
  *  - numeric fields trim leading whitespace, then scan 1..=width ASCII
  *    digits (empty -> TooShort, non-digit first -> Invalid, i64 overflow ->
  *    OutOfRange); `%d %H %M %S` have width 2, so "1:02:03" hours parse and
  *    range checks happen at RESOLUTION, not scan.
  *  - `%Y` is signed: a leading '+'/'-' lifts the width-4 cap entirely.
  *  - `%Z` consumes any run (possibly empty) of non-whitespace bytes.
  *  - trailing bytes after the last field -> TooLong.
  *  - resolution: `from_ymd_opt` failure (bad calendar day OR year outside
  *    chrono's +-262143 internal range) -> OutOfRange; a weekday NAME
  *    inconsistent with the date -> Impossible; hour>23/min>59/sec>60 ->
  *    OutOfRange; sec==60 is chrono's leap-second representation (epoch
  *    second 59). Date errors take precedence over time errors
  *    (`to_naive_datetime_with_offset`'s match order).
  *
  * The reference resolves the timezone FIRST by containment (CEST/CET,
  * lobbysettings.rs:231-239) -- that check stays in the caller; this parser
  * sees the naive-datetime part only and returns LOCAL epoch seconds.
  */
object ChronoDate {

  // chrono ParseErrorKind ordinals (stable engine/sim contract)
  final val Ok = 0
  final val TooShort = 1
  final val TooLong = 2
  final val Invalid = 3
  final val OutOfRange = 4
  final val Impossible = 5
  final val NotEnough = 6

  /** chrono ParseError Display strings, indexed by the codes above. */
  val displays: Array[String] = Array(
    "",
    "premature end of input",
    "trailing input",
    "input contains invalid characters",
    "input is out of range",
    "no possible date and time matching input",
    "input is not enough for unique date and time"
  )

  /** err == Ok -> epochLocal holds seconds of the LOCAL naive datetime. */
  final case class Result(err: Int, epochLocal: Long)

  // Unicode White_Space, as Rust's char::is_whitespace / str::trim_start use
  // (Java's Character.isWhitespace drops U+0085, U+00A0, U+2007, U+202F).
  // Returns the byte length of the whitespace char at i, or 0.
  private def wsLen(b: Array[Byte], i: Int): Int = {
    val n = b.length
    if (i >= n) return 0
    val c0 = b(i) & 0xff
    if (c0 == 0x20 || (c0 >= 0x09 && c0 <= 0x0d)) return 1
    if (c0 == 0xc2 && i + 1 < n) {
      val c1 = b(i + 1) & 0xff
      if (c1 == 0x85 || c1 == 0xa0) return 2 // U+0085, U+00A0
    }
    if (i + 2 < n) {
      val c1 = b(i + 1) & 0xff
      val c2 = b(i + 2) & 0xff
      c0 match {
        case 0xe1 if c1 == 0x9a && c2 == 0x80 => return 3 // U+1680
        case 0xe2 if c1 == 0x80 && ((c2 >= 0x80 && c2 <= 0x8a) || c2 == 0xa8 || c2 == 0xa9 || c2 == 0xaf) =>
          return 3 // U+2000-200A, U+2028, U+2029, U+202F
        case 0xe2 if c1 == 0x81 && c2 == 0x9f => return 3 // U+205F
        case 0xe3 if c1 == 0x80 && c2 == 0x80 => return 3 // U+3000
        case _ =>
      }
    }
    0
  }

  // 3-letter tables; values: month 0-11, weekday = days-from-Monday 0-6
  private def month0Of(a: Int, b: Int, c: Int): Int = (a, b, c) match {
    case ('j', 'a', 'n') => 0
    case ('f', 'e', 'b') => 1
    case ('m', 'a', 'r') => 2
    case ('a', 'p', 'r') => 3
    case ('m', 'a', 'y') => 4
    case ('j', 'u', 'n') => 5
    case ('j', 'u', 'l') => 6
    case ('a', 'u', 'g') => 7
    case ('s', 'e', 'p') => 8
    case ('o', 'c', 't') => 9
    case ('n', 'o', 'v') => 10
    case ('d', 'e', 'c') => 11
    case _               => -1
  }

  private def weekdayOf(a: Int, b: Int, c: Int): Int = (a, b, c) match {
    case ('m', 'o', 'n') => 0
    case ('t', 'u', 'e') => 1
    case ('w', 'e', 'd') => 2
    case ('t', 'h', 'u') => 3
    case ('f', 'r', 'i') => 4
    case ('s', 'a', 't') => 5
    case ('s', 'u', 'n') => 6
    case _               => -1
  }

  private def isLeap(y: Long): Boolean = y % 4 == 0 && (y % 100 != 0 || y % 400 == 0)

  private val mdays = Array(31, 28, 31, 30, 31, 30, 31, 31, 30, 31, 30, 31)

  private def daysInMonth(y: Long, m: Int): Int =
    if (m == 2 && isLeap(y)) 29 else mdays(m - 1)

  /** Proleptic-Gregorian days since 1970-01-01 (Howard Hinnant's algorithm;
    * also the arithmetic inside chrono's NaiveDate). */
  private def daysFromCivil(y0: Long, m: Int, d: Int): Long = {
    val y = if (m <= 2) y0 - 1 else y0
    val era = (if (y >= 0) y else y - 399) / 400
    val yoe = y - era * 400
    val mp = if (m > 2) m - 3 else m + 9
    val doy = (153L * mp + 2) / 5 + d - 1
    val doe = yoe * 365 + yoe / 4 - yoe / 100 + doy
    era * 146097 + doe - 719468
  }

  def parse(b: Array[Byte]): Result = {
    val n = b.length
    var i = 0
    var err = Ok

    def skipWs(): Unit = {
      var l = wsLen(b, i)
      while (l > 0) { i += l; l = wsLen(b, i) }
    }

    // scan::number(s, 1, max); on failure sets err and returns -1
    def num(max: Long): Long = {
      if (n - i < 1) { err = TooShort; return -1 }
      var c = b(i) & 0xff
      if (c < '0' || c > '9') { err = Invalid; return -1 }
      var v = 0L
      var cnt = 0L
      while (i < n && cnt < max && { c = b(i) & 0xff; c >= '0' && c <= '9' }) {
        val d = c - '0'
        if (v > (Long.MaxValue - d) / 10) { err = OutOfRange; return -1 }
        v = v * 10 + d
        i += 1
        cnt += 1
      }
      v
    }

    def name3(table: (Int, Int, Int) => Int): Int = {
      if (n - i < 3) { err = TooShort; return -1 }
      val v = table((b(i) | 32) & 0xff, (b(i + 1) | 32) & 0xff, (b(i + 2) | 32) & 0xff)
      if (v < 0) { err = Invalid; return -1 }
      i += 3
      v
    }

    // %a
    val wd = name3(weekdayOf)
    if (err != Ok) return Result(err, 0L)
    skipWs()
    // %b
    val mon0 = name3(month0Of)
    if (err != Ok) return Result(err, 0L)
    skipWs()
    // %d (Numeric items trim their own leading whitespace)
    skipWs()
    val day = num(2)
    if (err != Ok) return Result(err, 0L)
    skipWs()
    // %H
    skipWs()
    val hour = num(2)
    if (err != Ok) return Result(err, 0L)
    // ':' literal
    if (i >= n) return Result(TooShort, 0L)
    if (b(i) != ':') return Result(Invalid, 0L)
    i += 1
    // %M
    skipWs()
    val minute = num(2)
    if (err != Ok) return Result(err, 0L)
    if (i >= n) return Result(TooShort, 0L)
    if (b(i) != ':') return Result(Invalid, 0L)
    i += 1
    // %S
    skipWs()
    val second = num(2)
    if (err != Ok) return Result(err, 0L)
    skipWs()
    // %Z: any run of non-whitespace bytes, possibly empty; never fails
    while (i < n && wsLen(b, i) == 0) i += 1
    skipWs()
    // %Y: signed, width 4 unless an explicit sign lifts the cap
    skipWs()
    var neg = false
    var unlimited = false
    if (i < n && (b(i) == '+' || b(i) == '-')) {
      neg = b(i) == '-'
      unlimited = true
      i += 1
    }
    val yraw = num(if (unlimited) Long.MaxValue else 4L)
    if (err != Ok) return Result(err, 0L)
    val year = if (neg) -yraw else yraw
    if (i < n) return Result(TooLong, 0L)

    // resolution: date first (its error outranks the time error)
    if (year < -262144L || year > 262143L) return Result(OutOfRange, 0L)
    if (mon0 < 0) return Result(OutOfRange, 0L) // unreachable; name3 guarded
    if (day < 1 || day > daysInMonth(year, mon0 + 1)) return Result(OutOfRange, 0L)
    val epochDays = daysFromCivil(year, mon0 + 1, day.toInt)
    val fromMonday = (((epochDays % 7) + 7) % 7 + 3) % 7 // epoch day 0 = Thursday
    if (fromMonday != wd) return Result(Impossible, 0L)
    if (hour > 23 || minute > 59 || second > 60) return Result(OutOfRange, 0L)
    val sec = if (second == 60) 59 else second // chrono leap-second
    Result(Ok, epochDays * 86400L + hour * 3600L + minute * 60L + sec)
  }

  def parse(s: String): Result = parse(s.getBytes(java.nio.charset.StandardCharsets.UTF_8))
}
