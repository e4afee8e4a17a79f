package graft.pipeline

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.{Column, DataFrame}

/** Lobby-settings module (A11, reference module/lobbysettings.rs): a per-doc
  * ordered fold over CONSOLE `say` messages.
  *
  *  - state NotAvailable until the first `TF2Center Lobby #<id> |` header
  *    (bad id -> error latch);
  *  - while Active, each `Key: Value` message assigns a settings field
  *    (last-wins); a malformed recognized value latches the error state
  *    permanently (messages after the first error are ignored).
  *
  * Output per doc: present / error_kind (stable tag) / `error` carrying the
  * reference's thiserror/chrono Display string / settings struct.
  *
  * Launch dates replicate chrono's `%a %b %d %H:%M:%S %Z %Y` validation:
  * the timezone is resolved FIRST by substring containment (CEST/CET,
  * lobbysettings.rs:231-239), then the weekday NAME is checked for
  * consistency with the calendar date (chrono's Parsed::to_naive_date ->
  * Impossible on mismatch). Epochs are computed with the fixed-UTC parse
  * kernel, so results never depend on spark.sql.session.timeZone.
  *
  * Not part of the default LogHandler (lib.rs:127-132) -- an optional module,
  * like `examples/combine_handlers.rs` composes it.
  */
object Lobby {

  private val boolKeys =
    Seq("Advanced Lobby", "Region lock", "Allow offclassing", "Balancing", "Mumble required")

  private def strictBool(v: Column): Column =
    when(v === "true", true).when(v === "false", false) // null = error

  /** u32 FromStr: optional '+', ASCII digits (ANY count -- leading zeros are
    * legal, "00000000001" parses to 1), VALUE <= u32::MAX. */
  private def strictU32(v: Column): Column = {
    val digits = regexp_replace(v, "^\\+", "")
    val trimmed = regexp_replace(digits, "^0+(?=[0-9])", "")
    when(
      digits.rlike("^[0-9]+$") && length(trimmed) <= 10 && trimmed.cast("long") <= 4294967295L,
      trimmed.cast("long")
    )
  }

  /** ParseIntError Display for a failed u32 parse (lobby header id). */
  private def parseIntErrDisplay(v: Column): Column = {
    val digits = regexp_replace(v, "^\\+", "")
    when(v === "", "cannot parse integer from empty string")
      .when(!digits.rlike("^[0-9]+$"), "invalid digit found in string")
      .otherwise("number too large to fit in target type")
  }

  /** Leader "name (steam64)" -> struct(name, steam64); null on malformed.
    *
    * Rust u64 FromStr semantics (lobbysettings.rs:58-70): optional '+',
    * ASCII digits with leading zeros legal, any digit count while the VALUE
    * fits u64. Values in (i64::MAX, u64::MAX] -- adversarial-input-only,
    * real steam64s are ~7.6e16 -- are stored as the two's-complement
    * wrapped Long (u64 bits in LongType, Java Long.parseUnsignedLong
    * semantics), so the full Rust acceptance range round-trips. */
  private def leaderParse(v: Column): Column = {
    // rsplit_once(" (") + trailing-')' strip (trim_end_matches strips ALL)
    val idx = length(v) - locate("( ", reverse(v)) // 1-based pos of last " ("
    val name = when(locate("( ", reverse(v)) > 0, substring(v, lit(1), idx - lit(1)))
    val rest = regexp_replace(substring(v, idx + lit(2), lit(1000000)), "\\)+$", "")
    val digits = regexp_replace(rest, "^\\+", "")
    val trimmed = regexp_replace(digits, "^0+(?=[0-9])", "")
    val inU64Range = length(trimmed) <= 19 ||
      (length(trimmed) === 20 && trimmed <= "18446744073709551615")
    val dec = trimmed.cast("decimal(20,0)")
    val wrapped = when(dec <= lit(Long.MaxValue), dec.cast("long"))
      .otherwise((dec - lit(new java.math.BigDecimal("18446744073709551616"))).cast("long"))
    when(
      name.isNotNull && digits.rlike("^[0-9]+$") && inU64Range,
      struct(name.as("name"), wrapped.as("steam64"))
    )
  }

  // ---- launch-date parsing (chrono "%a %b %d %H:%M:%S %Z %Y") -------------
  //
  // The scan/resolution itself lives in the graft.expr.ChronoDate kernel -- a
  // byte-exact twin of chrono's parse for this one format, including the
  // TooShort/TooLong/Invalid/OutOfRange/Impossible error long tail and their
  // Display strings. The timezone resolves FIRST by containment
  // (get_timezone, lobbysettings.rs:231-239), before the date is scanned.

  private def tzOffsetOf(v: Column): Column =
    when(v.contains("CEST"), 7200).when(v.contains("CET"), 3600)

  /** Launch date -> UTC timestamp; null on any validation failure. */
  private def dateParse(v: Column): Column = {
    val tz = tzOffsetOf(v)
    when(
      tz.isNotNull,
      timestamp_seconds(graft.expr.GraftExpressions.chrono_epoch_local(v) - tz.cast("long"))
    )
  }

  /** (error_kind, display) for a Launch date value; kind null when valid.
    * Display strings follow LobbySettingsError / chrono::ParseError. */
  private def dateErr(v: Column): (Column, Column) = {
    val tz = tzOffsetOf(v)
    val code = graft.expr.GraftExpressions.chrono_classify(v)
    val kind =
      when(tz.isNull, "unknown_timezone")
        .when(code =!= 0, "invalid_date")
    val display =
      when(tz.isNull, concat(lit("Unknown timezone in date: "), v))
        .when(code =!= 0, element_at(typedLit(graft.expr.ChronoDate.displays.toSeq), code + 1))
    (kind, display)
  }

  /** Per-doc lobby settings from the routed frame. */
  def lobbySettings(routedDf: DataFrame): DataFrame = {
    val says = routedDf
      .filter(col("event_type") === "say" && shiftrightunsigned(col("sid"), 32) === 6)
      .select(col("doc_id"), col("line_no"), col("text").as("msg"))

    val header = col("msg").startsWith("TF2Center Lobby #") && locate(" |", col("msg")) > 0
    val headerId = substring(col("msg"), lit(18), locate(" |", col("msg")) - lit(18))

    val kvPos = locate(": ", col("msg"))
    val key = when(kvPos > 0, substring(col("msg"), lit(1), kvPos - lit(1)))
    val value = when(kvPos > 0, expr("substring(msg, locate(': ', msg) + 2)"))

    val parsed = says
      .withColumn("is_header", header)
      .withColumn("header_raw", when(header, headerId))
      .withColumn("header_id", when(header, strictU32(headerId)))
      .withColumn("key", key)
      .withColumn("value", value)

    val wDocAll = Window.partitionBy("doc_id")
    // arming line: first header (min line among headers)
    val armed = parsed
      .withColumn("arm_line", min(when(col("is_header"), col("line_no"))).over(wDocAll))
      .filter(col("arm_line").isNotNull)

    val active = col("line_no") > col("arm_line")
    val (dateKind, dateDisplay) = dateErr(col("value"))
    val errKind =
      when(col("is_header") && col("line_no") === col("arm_line") && col("header_id").isNull, "invalid_lobby_id")
        .when(active && col("key") === "Leader" && leaderParse(col("value")).isNull, "malformed_leader")
        .when(active && col("key") === "GameType" && !col("value").isin("6v6", "highlander"), "unknown_game_type")
        .when(active && col("key") === "Location" && !col("value").isin("Europe", "North America"), "unknown_location")
        .when(active && col("key").isInCollection(boolKeys) && strictBool(col("value")).isNull, "invalid_bool")
        .when(active && col("key") === "Launch date", dateKind)
    // the reference's Display strings (thiserror #[error] formats; chrono /
    // std parse errors pass their own Display through)
    val errDisplay =
      when(col("is_header") && col("line_no") === col("arm_line") && col("header_id").isNull,
        parseIntErrDisplay(col("header_raw")))
        .when(active && col("key") === "Leader" && leaderParse(col("value")).isNull,
          concat(lit("Malformed leader: "), col("value")))
        .when(active && col("key") === "GameType" && !col("value").isin("6v6", "highlander"),
          concat(lit("Unknown game type: "), col("value")))
        .when(active && col("key") === "Location" && !col("value").isin("Europe", "North America"),
          concat(lit("Unknown location: "), col("value")))
        .when(active && col("key").isInCollection(boolKeys) && strictBool(col("value")).isNull,
          lit("provided string was not `true` or `false`"))
        .when(active && col("key") === "Launch date", dateDisplay)

    val withErr = armed
      .withColumn("err_kind", errKind)
      .withColumn("err_display", errDisplay)
      .withColumn(
        "first_err_line",
        min(when(col("err_kind").isNotNull, col("line_no"))).over(wDocAll)
      )

    // effective assignments: strictly after arming, strictly before the error
    val effective = withErr.filter(
      col("line_no") > col("arm_line") &&
        (col("first_err_line").isNull || col("line_no") < col("first_err_line")) &&
        col("key").isNotNull
    )

    def lastVal(k: String): Column =
      max_by(when(col("key") === k, col("value")), when(col("key") === k, col("line_no")))

    val fields = effective
      .groupBy("doc_id")
      .agg(
        lastVal("Leader").as("leader_raw"),
        lastVal("Map").as("map"),
        lastVal("GameType").as("game_type_raw"),
        lastVal("Location").as("location_raw"),
        lastVal("Advanced Lobby").as("advanced_raw"),
        lastVal("Region lock").as("region_lock_raw"),
        lastVal("Allow offclassing").as("offclass_raw"),
        lastVal("Balancing").as("balancing_raw"),
        lastVal("Restriction").as("restriction"),
        lastVal("Mumble required").as("mumble_raw"),
        lastVal("Launch date").as("date_raw"),
        lastVal("Server").as("server")
      )

    val docState = withErr
      .groupBy("doc_id")
      .agg(
        min(when(col("is_header"), col("line_no"))).as("arm_line2"),
        max_by(col("header_id"), when(col("is_header"), -col("line_no"))).as("lobby_id"),
        min(when(col("err_kind").isNotNull, col("line_no"))).as("err_line"),
        max_by(col("err_kind"), when(col("err_kind").isNotNull, -col("line_no"))).as("error_kind"),
        max_by(col("err_display"), when(col("err_kind").isNotNull, -col("line_no"))).as("error")
      )

    docState
      .join(fields, Seq("doc_id"), "left")
      .select(
        col("doc_id"),
        col("err_line").isNull.as("ok"),
        col("error_kind"),
        col("error"),
        when(
          col("err_line").isNull,
          struct(
            coalesce(col("lobby_id"), lit(0L)).as("id"),
            coalesce(leaderParse(col("leader_raw")),
              struct(lit("").as("name"), lit(0L).as("steam64"))).as("leader"),
            coalesce(col("map"), lit("")).as("map"),
            coalesce(
              when(col("game_type_raw") === "highlander", "Highlander").otherwise("Sixes"),
              lit("Sixes")
            ).as("game_type"),
            coalesce(
              when(col("location_raw") === "North America", "NorthAmerica").otherwise("Europe"),
              lit("Europe")
            ).as("location"),
            coalesce(strictBool(col("advanced_raw")), lit(false)).as("advanced"),
            coalesce(strictBool(col("region_lock_raw")), lit(false)).as("region_lock"),
            coalesce(strictBool(col("offclass_raw")), lit(false)).as("allow_offclassing"),
            coalesce(strictBool(col("balancing_raw")), lit(false)).as("balancing"),
            coalesce(col("restriction"), lit("")).as("restriction"),
            coalesce(strictBool(col("mumble_raw")), lit(false)).as("mumble_required"),
            dateParse(col("date_raw")).as("date"),
            coalesce(col("server"), lit("")).as("server")
          )
        ).as("settings")
      )
  }
}
