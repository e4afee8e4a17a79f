package graft.pipeline

import org.apache.spark.sql.functions._
import org.apache.spark.sql.{Column, DataFrame}

/** Reference-shaped JSON output (SURVEY.md S5/F9): per doc, the exact JSON
  * `tf-log-parser` prints from main.rs:14 -- the serde tuple
  * `[GlobalOutput, per_player]` with the handler! macro's skip-default
  * serialization (module/mod.rs:150-155,182-187):
  *
  *   - global `{chat: [...]}` -- `chat` omitted when empty;
  *   - per_player: object keyed by steam3, ORDERED BY steam64 (BTreeMap over
  *     SteamId3, common.rs:348-358), each value
  *     `{heal_spread?, medic_stats?, class_stats?}` with each section
  *     omitted when it equals its Default (the `chat` per-subject slot is
  *     `()` and always omitted);
  *   - ClassStats maps serialize class-keyed with zero entries skipped, in
  *     enum order (ClassMap Serialize, common.rs:158-175).
  *
  * Built declaratively: struct/map assembly + one `to_json` per doc; Spark's
  * JSON generator omits null fields by default, which implements serde's
  * skip-default once defaulted sections are nulled out.
  *
  * Documented divergence: non-finite medic averages (possible when
  * charge_count == 0) serialize as serde_json `null`; Spark's generator
  * cannot emit a bare null inside an otherwise non-null struct field, so
  * such structs would render NaN -- none of the reference's own logs hits
  * this (no `null` in any committed snapshot).
  */
object JsonEmit {

  private val classNames = TfPipeline.ClassNames

  /** 10-array -> class-keyed map with zero entries skipped (enum order). */
  private def classMapJson(arr: Column): Column =
    map_from_entries(
      filter(
        transform(
          sequence(lit(0), lit(9)),
          i =>
            struct(
              element_at(typedLit(classNames), i + 1).as("key"),
              element_at(arr, i + 1).as("value")
            )
        ),
        e => e.getField("value") =!= 0L
      )
    )

  /** Per-doc JSON line matching `tf_log_parser::parse` + serde_json. Input:
    * the frames produced by [[TfPipeline.perPlayer]] and [[TfPipeline.chat]]. */
  def mainJson(perPlayer: DataFrame, chat: DataFrame): DataFrame = {
    val m = col("medic")
    val medicDefault =
      m.getField("advantages_lost") === 0L && m.getField("biggest_advantage_lost") === 0f &&
        m.getField("near_full_charge_death") === 0L && m.getField("deaths_after_uber") === 0L &&
        m.getField("avg_time_before_healing") === 0f && m.getField("avg_time_to_build") === 0f &&
        m.getField("avg_time_to_use") === 0f && m.getField("avg_uber_length") === 0f &&
        m.getField("charge_count") === 0L && m.getField("drops") === 0L

    val k = classMapJson(col("kills"))
    val d = classMapJson(col("deaths"))
    val a = classMapJson(col("assists"))
    val g = classMapJson(col("damage"))

    val payload = struct(
      // serde field order: chat (unit, always skipped), heal_spread,
      // medic_stats, class_stats
      when(size(map_entries(col("heals"))) > 0, col("heals")).as("heal_spread"),
      when(!medicDefault, col("medic")).as("medic_stats"),
      when(size(map_entries(k)) + size(map_entries(d)) + size(map_entries(a)) + size(map_entries(g)) > 0,
        struct(k.as("kills"), d.as("deaths"), a.as("assists"), g.as("damage"))
      ).as("class_stats")
    )

    // per-player JSON rendered BEFORE the collect so the (steam64, json)
    // pairs are sort_array-orderable (structs containing maps are not)
    val pair = concat(lit("\""), col("steam3"), lit("\":"), to_json(payload))
    val perDoc = perPlayer
      .groupBy("doc_id")
      .agg(
        concat(
          lit("{"),
          concat_ws(
            ",",
            transform(
              sort_array(collect_list(struct(col("steam64"), pair.as("pair")))),
              e => e.getField("pair")
            )
          ),
          lit("}")
        ).as("per_player_json")
      )

    val globals = chat.select(
      col("doc_id"),
      to_json(struct(when(size(col("chat")) > 0, col("chat")).as("chat"))).as("global_json")
    )

    // full-outer on the doc universe: a doc with no interned players (all
    // bots/console) still emits `[{...}, {}]` like main.rs, and one with no
    // chat emits `[{}, {...}]`
    perDoc
      .join(globals, Seq("doc_id"), "full_outer")
      .select(
        col("doc_id"),
        concat(
          lit("["),
          coalesce(col("global_json"), lit("{}")),
          lit(","),
          coalesce(col("per_player_json"), lit("{}")),
          lit("]")
        ).as("json")
      )
  }

  /** Convenience: full routed frame -> per-doc reference JSON. Every doc
    * with at least one surviving handled line emits a row. */
  def emit(routed: DataFrame, dim: DataFrame): DataFrame =
    routed
      .select(col("doc_id"))
      .distinct()
      .join(mainJson(TfPipeline.perPlayer(routed, dim), TfPipeline.chat(routed, dim)), Seq("doc_id"), "left")
      .withColumn("json", coalesce(col("json"), lit("[{},{}]")))
}
