package graft.pipeline

import graft.expr.GraftExpressions._
import org.apache.spark.sql.functions._
import org.apache.spark.sql.{Column, DataFrame}

/** Typed per-event-type views (SURVEY.md P16/§2.2a): for each of the
  * reference's event structs, a DataFrame view that extracts its fields from
  * the params map with the exact reference types (overflow-clamp ints, f32,
  * positions, subjects, classes). A user of the reference's `GameEvent`
  * variants consumes these views instead.
  *
  * Field tables transcribed from /root/reference/src/event/{player,medic,game}.rs.
  */
object TypedEvents {

  sealed trait FType
  case object FStr extends FType
  case object FU8 extends FType
  case object FU16 extends FType
  case object FU32 extends FType
  case object FI64 extends FType
  case object FF32 extends FType
  case object FPos extends FType
  case object FSubject extends FType // against-style player/console subject
  case object FClass extends FType
  case object FTeam extends FType

  final case class FieldSpec(name: String, key: String, ftype: FType)

  /** Full per-type field tables. Pseudo-keys from the params kernel:
    * `_target` (kill subject), `_target_kind`, `_text`, `_blue`, `_red`. */
  val specs: Map[String, Seq[FieldSpec]] = Map(
    "shot_fired" -> Seq(FieldSpec("weapon", "weapon", FStr)),
    "shot_hit" -> Seq(FieldSpec("weapon", "weapon", FStr)),
    "damage" -> Seq(
      FieldSpec("target", "against", FSubject),
      FieldSpec("damage", "damage", FI64),
      FieldSpec("real_damage", "realdamage", FI64),
      FieldSpec("weapon", "weapon", FStr)
    ),
    "kill" -> Seq(
      FieldSpec("target", "_target", FStr),
      FieldSpec("target_kind", "_target_kind", FStr),
      FieldSpec("weapon", "with", FStr),
      FieldSpec("attacker_position", "attacker_position", FPos),
      FieldSpec("victim_position", "victim_position", FPos)
    ),
    "kill_assist" -> Seq(
      FieldSpec("target", "_target", FSubject),
      FieldSpec("attacker_position", "attacker_position", FPos),
      FieldSpec("victim_position", "victim_position", FPos)
    ),
    "spawned" -> Seq(FieldSpec("class", "as", FClass)),
    "role_change" -> Seq(FieldSpec("class", "to", FClass)),
    "connected" -> Seq(FieldSpec("address", "address", FStr)),
    "joined" -> Seq(FieldSpec("team", "team", FTeam)),
    "suicide" -> Seq(
      FieldSpec("weapon", "with", FStr),
      FieldSpec("attacker_position", "attacker_position", FPos)
    ),
    "picked_up" -> Seq(FieldSpec("item", "item", FStr)),
    "domination" -> Seq(FieldSpec("against", "against", FSubject)),
    "revenge" -> Seq(FieldSpec("against", "against", FSubject)),
    "disconnect" -> Seq(FieldSpec("reason", "reason", FStr)),
    "built_object" -> Seq(
      FieldSpec("object", "object", FStr),
      FieldSpec("position", "position", FPos)
    ),
    "carry_object" -> Seq(
      FieldSpec("object", "object", FStr),
      FieldSpec("position", "position", FPos)
    ),
    "drop_object" -> Seq(
      FieldSpec("object", "object", FStr),
      FieldSpec("position", "position", FPos)
    ),
    "killed_object" -> Seq(
      FieldSpec("object", "object", FStr),
      FieldSpec("weapon", "weapon", FStr),
      FieldSpec("object_owner", "objectowner", FSubject),
      FieldSpec("attacker_position", "attacker_position", FPos)
    ),
    "object_detonated" -> Seq(
      FieldSpec("object", "object", FStr),
      FieldSpec("position", "attacker_position", FPos)
    ),
    "extinguished" -> Seq(
      FieldSpec("against", "against", FSubject),
      FieldSpec("with", "with", FStr),
      FieldSpec("attacker_position", "attacker_position", FPos),
      FieldSpec("victim_position", "victim_position", FPos)
    ),
    "say" -> Seq(FieldSpec("text", "_text", FStr)),
    "say_team" -> Seq(FieldSpec("text", "_text", FStr)),
    "healed" -> Seq(
      FieldSpec("target", "against", FSubject),
      FieldSpec("amount", "healing", FU32) // default 0 applied by consumers
    ),
    "charge_deployed" -> Seq(FieldSpec("medigun", "medigun", FStr)),
    "charge_ended" -> Seq(FieldSpec("duration", "duration", FF32)),
    "advantage_lost" -> Seq(FieldSpec("time", "time", FF32)),
    "first_heal" -> Seq(FieldSpec("time", "time", FF32)),
    "medic_death" -> Seq(FieldSpec("charge", "ubercharge", FU32)),
    // quirk: the log key is `uberpct`, so charge_percentage is always null
    "medic_death_ex" -> Seq(FieldSpec("charge_percentage", "charge_percentage", FU8)),
    "round_win" -> Seq(FieldSpec("team", "winner", FStr)),
    "round_length" -> Seq(FieldSpec("length", "seconds", FF32)),
    "log_file_started" -> Seq(
      FieldSpec("file", "file", FStr),
      FieldSpec("game", "game", FStr),
      FieldSpec("version", "version", FStr)
    ),
    "capture_blocked" -> Seq(
      FieldSpec("cp", "cp", FU8),
      FieldSpec("cp_name", "cpname", FStr),
      FieldSpec("position", "position", FPos)
    ),
    "point_captured" -> Seq(
      FieldSpec("cp", "cp", FU8),
      FieldSpec("cp_name", "cpname", FStr),
      FieldSpec("num_cappers", "numcappers", FU8)
      // playerN/positionN pairs handled by capturePlayers()
    ),
    "current_score" -> Seq(
      FieldSpec("score", "score", FU8),
      FieldSpec("players", "with", FU8)
    ),
    "final_score" -> Seq(
      FieldSpec("score", "score", FU8),
      FieldSpec("players", "with", FU8)
    ),
    "game_over" -> Seq(FieldSpec("reason", "reason", FStr)),
    "tournament_start" -> Seq(
      FieldSpec("blue", "_blue", FStr),
      FieldSpec("red", "_red", FStr)
    )
  )

  private def fieldCol(pm: Column, f: FieldSpec): Column = {
    val v = element_at(pm, f.key)
    val c = f.ftype match {
      case FStr     => v
      case FU8      => clamp_u8(v)
      case FU16     => clamp_u16(v)
      case FU32     => clamp_u32(v)
      case FI64     => clamp_i64(v)
      case FF32     => parse_f32(v)
      case FPos     => parse_position(v)
      case FClass   => class_normalize(v)
      case FTeam    => when(v.isin("Red", "Blue", "Spectator"), v)
      case FSubject => v // raw subject text; ids via against_subject_id
    }
    c.as(f.name)
  }

  /** Typed view of one event type from a frame carrying (event_type, params)
    * -- e.g. the routable frame or a routed-store partition. Rows of other
    * types are filtered out (partition pruning when reading the routed
    * store). */
  def view(frame: DataFrame, eventType: String): DataFrame = {
    val fields = specs.getOrElse(eventType, Seq.empty)
    val pm = params_map(col("event_type"), col("params"))
    val base = frame
      .filter(col("event_type") === eventType)
      .withColumn("__pm", pm)
    val cols = Seq(col("doc_id"), col("line_no")) ++
      (if (frame.columns.contains("subject")) Seq(col("kind"), col("subject")) else Nil) ++
      fields.map(f => fieldCol(col("__pm"), f)) :+
      element_at(col("__pm"), "__error").isNotNull.as("parse_error")
    base.select(cols: _*)
  }

  /** point_captured players: zip playerN/positionN pairs into an array of
    * (subject, position) structs (game.rs:58-104). */
  def capturePlayers(frame: DataFrame): DataFrame = {
    val pm = params_map(col("event_type"), col("params"))
    frame
      .filter(col("event_type") === "point_captured")
      .withColumn("__pm", pm)
      .withColumn(
        "players",
        filter(
          transform(
            sequence(lit(1), lit(32)),
            i =>
              struct(
                element_at(col("__pm"), concat(lit("player"), i)).as("subject"),
                parse_position(element_at(col("__pm"), concat(lit("position"), i))).as("position")
              )
          ),
          p => p.getField("subject").isNotNull && p.getField("position").isNotNull
        )
      )
      .select(
        col("doc_id"),
        col("line_no"),
        clamp_u8(element_at(col("__pm"), "cp")).as("cp"),
        element_at(col("__pm"), "cpname").as("cp_name"),
        clamp_u8(element_at(col("__pm"), "numcappers")).as("num_cappers"),
        col("players")
      )
  }
}
