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
  * Output per doc: present / error_kind / settings struct. Divergence from
  * the reference (documented): errors carry a stable `error_kind` tag rather
  * than the thiserror Display strings.
  *
  * Not part of the default LogHandler (lib.rs:127-132) -- an optional module,
  * like `examples/combine_handlers.rs` composes it.
  */
object Lobby {

  private val boolKeys =
    Seq("Advanced Lobby", "Region lock", "Allow offclassing", "Balancing", "Mumble required")

  private def strictBool(v: Column): Column =
    when(v === "true", true).when(v === "false", false) // null = error

  private def strictU32(v: Column): Column =
    when(v.rlike("^[0-9]{1,10}$") && v.cast("long") <= 4294967295L, v.cast("long"))

  /** Leader "name (steam64)" -> struct(name, steam64); null on malformed. */
  private def leaderParse(v: Column): Column = {
    // rsplit_once(" (") + trailing-')' strip + strict u64
    val idx = length(v) - locate("( ", reverse(v)) // 1-based pos of last " ("
    val name = when(locate("( ", reverse(v)) > 0, substring(v, lit(1), idx - lit(1)))
    val rest = regexp_replace(substring(v, idx + lit(2), lit(1000000)), "\\)+$", "")
    // {1,18} keeps the cast inside signed-long range (real steam64 ~7.6e16)
    when(
      name.isNotNull && rest.rlike("^[0-9]{1,18}$"),
      struct(name.as("name"), rest.cast("long").as("steam64"))
    )
  }

  /** Launch date "Www Mmm dd HH:MM:SS CEST|CET yyyy" -> UTC timestamp. */
  private def dateParse(v: Column): Column = {
    val re = "^[A-Za-z]{3} ([A-Za-z]{3}) ([0-9]{1,2}) ([0-9]{2}:[0-9]{2}:[0-9]{2}) (CEST|CET) ([0-9]{4})$"
    val mon = regexp_extract(v, re, 1)
    val day = regexp_extract(v, re, 2)
    val hms = regexp_extract(v, re, 3)
    val tz = regexp_extract(v, re, 4)
    val year = regexp_extract(v, re, 5)
    val local = to_timestamp(concat_ws(" ", mon, day, year, hms), "MMM d yyyy HH:mm:ss")
    when(
      v.rlike(re),
      when(tz === "CEST", local - expr("INTERVAL 2 HOURS"))
        .otherwise(local - expr("INTERVAL 1 HOURS"))
    )
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
      .withColumn("header_id", when(header, strictU32(headerId)))
      .withColumn("key", key)
      .withColumn("value", value)

    val wDocAll = Window.partitionBy("doc_id")
    // arming line: first header (min line among headers)
    val armed = parsed
      .withColumn("arm_line", min(when(col("is_header"), col("line_no"))).over(wDocAll))
      .filter(col("arm_line").isNotNull)

    // per-message error while Active (or a bad header id at the arm line)
    val recognizedErr =
      (col("key") === "Leader" && leaderParse(col("value")).isNull) ||
        (col("key") === "GameType" && !col("value").isin("6v6", "highlander")) ||
        (col("key") === "Location" && !col("value").isin("Europe", "North America")) ||
        (col("key").isInCollection(boolKeys) && strictBool(col("value")).isNull) ||
        (col("key") === "Launch date" && dateParse(col("value")).isNull)
    val errKind =
      when(col("is_header") && col("line_no") === col("arm_line") && col("header_id").isNull, "invalid_lobby_id")
        .when(col("line_no") > col("arm_line") && col("key") === "Leader" && leaderParse(col("value")).isNull, "malformed_leader")
        .when(col("line_no") > col("arm_line") && col("key") === "GameType" && !col("value").isin("6v6", "highlander"), "unknown_game_type")
        .when(col("line_no") > col("arm_line") && col("key") === "Location" && !col("value").isin("Europe", "North America"), "unknown_location")
        .when(col("line_no") > col("arm_line") && col("key").isInCollection(boolKeys) && strictBool(col("value")).isNull, "invalid_bool")
        .when(col("line_no") > col("arm_line") && col("key") === "Launch date" && dateParse(col("value")).isNull, "invalid_date")

    val withErr = armed
      .withColumn("err_kind", errKind)
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
        max_by(col("err_kind"), when(col("err_kind").isNotNull, -col("line_no"))).as("error_kind")
      )

    docState
      .join(fields, Seq("doc_id"), "left")
      .select(
        col("doc_id"),
        col("err_line").isNull.as("ok"),
        col("error_kind"),
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
