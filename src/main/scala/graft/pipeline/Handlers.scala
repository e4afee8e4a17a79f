package graft.pipeline

import org.apache.spark.sql.functions._
import org.apache.spark.sql.{Column, DataFrame}

/** Handler composition (SURVEY.md §2.9): the Spark analogue of the
  * reference's `handler!` macro / `HandlerStack` (module/mod.rs:71-226) and
  * of user compositions like examples/combine_handlers.rs (chat + lobby).
  *
  * A module is a `DataFrame -> DataFrame` aggregate stage over the routed
  * frame; per-player modules key on `(doc_id, sid)` and are assembled with
  * full-outer joins (the reference iterates one SubjectMap, so every subject
  * appears in every module's output slot); global modules key on `doc_id`.
  * Users add custom modules by extending the maps -- the analogue of
  * implementing `EventHandler` (examples/custom_handler.rs).
  */
object Handlers {

  /** (routed, dim) -> frame keyed (doc_id, sid). */
  type PerPlayerModule = (DataFrame, DataFrame) => DataFrame

  /** (routed, dim) -> frame keyed (doc_id). */
  type GlobalModule = (DataFrame, DataFrame) => DataFrame

  val perPlayerModules: Map[String, PerPlayerModule] = Map(
    "class_stats" -> ((r, _) => TfPipeline.classStats(r)),
    "heal_spread" -> ((r, _) => TfPipeline.healSpread(r)),
    "medic_stats" -> ((r, _) => TfPipeline.medicStats(r))
  )

  val globalModules: Map[String, GlobalModule] = Map(
    "chat" -> ((r, dim) => TfPipeline.chat(r, dim)),
    "lobby" -> ((r, _) => Lobby.lobbySettings(r))
  )

  /** Example custom module (HighestDamage, examples/custom_handler.rs:29-56):
    * per player, the single highest damage event (A14 top-1 exemplar). */
  val highestDamage: PerPlayerModule = (r, _) =>
    r.filter(col("event_type") === "damage" && col("dmg").isNotNull)
      .groupBy("doc_id", "sid")
      .agg(max_by(struct(col("dmg").as("damage"), col("line_no")), struct(col("dmg"), col("line_no")))
        .as("highest_damage"))

  /** Compose per-player modules over one routed frame: every interned player
    * subject appears once, joined with each selected module's output (J5).
    * The routed frame is scanned once per module -- at scale each module
    * reads only its pruned route partitions (see TfPipeline.routedFromStore),
    * exactly like `does_handle` masks.
    *
    * NOTE: this generic composition left-joins each module's arbitrary
    * schema; the BUILT-IN assembly (TfPipeline.perPlayerAssembled) instead
    * merges the fixed module set with a null-padded union + one
    * first(ignoreNulls) aggregate -- measurably cheaper (left-outer SMJ of
    * even tiny sides costs ~3s each at 4M rows) and the pattern to follow
    * when a custom composition grows past a couple of modules. */
  def composePerPlayer(
      routed: DataFrame,
      dim: DataFrame,
      modules: Seq[(String, PerPlayerModule)]
  ): DataFrame = {
    val players = dim
      .filter(shiftrightunsigned(col("sid"), 32) === 1)
      .withColumn("account", col("sid").bitwiseAND(lit(0xffffffffL)))
      .withColumn("steam3", concat(lit("[U:1:"), col("account"), lit("]")))
      .withColumn("steam64", col("account") + lit(graft.expr.Steam.STEAM64_BASE))
      .select("doc_id", "sid", "steam3", "steam64", "name")
    modules
      .foldLeft(players) { case (acc, (_, m)) => acc.join(m(routed, dim), Seq("doc_id", "sid"), "left") }
      .orderBy("doc_id", "steam64")
  }

  /** Compose global modules: one row per doc with each module's output
    * columns (missing docs -> nulls, like empty GlobalOutput sections). */
  def composeGlobal(
      routed: DataFrame,
      dim: DataFrame,
      modules: Seq[(String, GlobalModule)]
  ): DataFrame = {
    val docs = routed.select(col("doc_id")).distinct()
    modules.foldLeft(docs) { case (acc, (_, m)) => acc.join(m(routed, dim), Seq("doc_id"), "left") }
  }
}
