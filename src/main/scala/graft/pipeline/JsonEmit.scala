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
  *     enum order (ClassMap Serialize, common.rs:158-175);
  *   - non-finite f32 medic averages (possible when charge_count == 0)
  *     serialize as `null`, exactly like serde_json's f32 handling.
  *
  * Built declaratively: each SECTION renders with its own `to_json` and the
  * per-player object is assembled by string concat -- the medic section uses
  * `ignoreNullFields=false` so a nulled non-finite float emits an explicit
  * `null`, while absent sections are skipped entirely (serde's
  * skip_serializing_if), which a single to_json could not express both of.
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

  /** Non-finite f32 -> null (serde_json emits null for NaN/Inf f32). */
  private def finiteOrNull(c: Column): Column =
    when(isnan(c) || c === Float.PositiveInfinity || c === Float.NegativeInfinity,
      lit(null).cast("float")
    ).otherwise(c)

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

    // serde field order preserved; non-finite averages nulled -> emitted as
    // literal null by the ignoreNullFields=false generator below
    val medicNulled = struct(
      m.getField("advantages_lost").as("advantages_lost"),
      finiteOrNull(m.getField("biggest_advantage_lost")).as("biggest_advantage_lost"),
      m.getField("near_full_charge_death").as("near_full_charge_death"),
      m.getField("deaths_after_uber").as("deaths_after_uber"),
      finiteOrNull(m.getField("avg_time_before_healing")).as("avg_time_before_healing"),
      finiteOrNull(m.getField("avg_time_to_build")).as("avg_time_to_build"),
      finiteOrNull(m.getField("avg_time_to_use")).as("avg_time_to_use"),
      finiteOrNull(m.getField("avg_uber_length")).as("avg_uber_length"),
      m.getField("charge_count").as("charge_count"),
      m.getField("drops").as("drops")
    )

    val k = classMapJson(col("kills"))
    val d = classMapJson(col("deaths"))
    val a = classMapJson(col("assists"))
    val g = classMapJson(col("damage"))

    // serde field order: chat (unit, always skipped), heal_spread,
    // medic_stats, class_stats; concat_ws skips null (absent) sections
    val sections = array(
      when(
        size(map_entries(col("heals"))) > 0,
        concat(lit("\"heal_spread\":"), to_json(col("heals")))
      ),
      when(
        !medicDefault,
        concat(
          lit("\"medic_stats\":"),
          to_json(medicNulled, java.util.Map.of("ignoreNullFields", "false"))
        )
      ),
      when(
        size(map_entries(k)) + size(map_entries(d)) + size(map_entries(a)) + size(map_entries(g)) > 0,
        concat(
          lit("\"class_stats\":"),
          to_json(struct(k.as("kills"), d.as("deaths"), a.as("assists"), g.as("damage")))
        )
      )
    )
    val payloadJson = concat(lit("{"), concat_ws(",", sections), lit("}"))

    // per-player JSON rendered BEFORE the collect so the (steam64, json)
    // pairs are sort_array-orderable (structs containing maps are not)
    val pair = concat(lit("\""), col("steam3"), lit("\":"), payloadJson)
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

  /** Full per-doc reference JSON over an explicit doc universe (use
    * [[TfPipeline.routedWithUniverse]]'s first element): every ingested,
    * non-aborted doc emits a row -- a doc whose lines are all
    * valid-but-unhandled prints `[{},{}]` exactly like main.rs, while a doc
    * the reference would abort (hard parse error) emits nothing. */
  def emit(docs: DataFrame, routed: DataFrame, dim: DataFrame): DataFrame =
    docs
      .select(col("doc_id"))
      .distinct()
      // the UNORDERED assembly: mainJson sort_arrays by steam64 per doc, so
      // perPlayer's global orderBy (range sampling pass + exchange) would be
      // pure wasted work on this path
      .join(mainJson(TfPipeline.perPlayerAssembled(routed, dim), TfPipeline.chat(routed, dim)), Seq("doc_id"), "left")
      .withColumn("json", coalesce(col("json"), lit("[{},{}]")))
}
