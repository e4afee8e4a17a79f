package graft.streaming

import graft.expr.GraftExpressions._
import graft.pipeline.TfPipeline
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{DataStreamWriter, OutputMode}
import org.apache.spark.sql.types._
import org.apache.spark.sql.{DataFrame, Row, SparkSession}

/** Structured Streaming variant of the parse -> route layer: a continuously
  * arriving tokenized-sequence table is envelope-parsed, routed, and
  * aggregated into windowed per-event-type counts with a watermark. The
  * reference's batch semantics (single ordered pass) stay in TfPipeline;
  * streaming covers the ingest/monitoring side (SURVEY.md §2.8).
  */
object StreamingPipeline {

  val inputSchema: StructType = StructType(
    Seq(
      StructField("doc_id", StringType),
      StructField("line_no", LongType),
      StructField("source", StringType),
      StructField("tokens", ArrayType(IntegerType, containsNull = false)),
      StructField("n_tok", IntegerType)
    )
  )

  /** Streaming envelope: same expressions as the batch path (stateless ->
    * identical semantics per row). */
  def envelopeStream(spark: SparkSession, dir: String): DataFrame =
    spark.readStream
      .schema(inputSchema)
      .parquet(dir)
      .withColumn("line", tokens_to_string(col("tokens")))
      .withColumn("r", parse_raw_line(col("line")))
      .select(
        col("doc_id"),
        col("line_no"),
        col("source"),
        col("r.status").as("status"),
        col("r.kind").as("kind"),
        col("r.subject").as("subject"),
        col("r.event_type").as("event_type"),
        timestamp_seconds(col("r.ts")).as("ts")
      )

  /** Windowed routed counts: 5-minute event-time windows per event type with
    * a 10-minute watermark for late lines. */
  def routedCounts(env: DataFrame): DataFrame =
    env
      .filter(col("status") === 0)
      .withWatermark("ts", "10 minutes")
      .groupBy(window(col("ts"), "5 minutes"), col("event_type"))
      .agg(count(lit(1)).as("n"))

  /** Per-(doc, medic) charge state tracked with mapGroupsWithState: a
    * streaming analogue of the medic build-time machine (counts completed
    * first_heal -> chargeready builds). */
  final case class MedicEvent(doc_id: String, sid: Long, line_no: Long, event_type: String, time: Long)
  final case class BuildState(lastBuildStart: Long, builds: Long)
  final case class BuildCount(doc_id: String, sid: Long, builds: Long)

  def buildCounts(spark: SparkSession, env: DataFrame): DataFrame = {
    import org.apache.spark.sql.streaming.GroupStateTimeout
    import spark.implicits._
    val typed = env
      .filter(col("status") === 0 && col("event_type").isin("first_heal", "charge_ready"))
      .withColumn("sid", subject_id(col("kind"), col("subject")))
      .select(col("doc_id"), col("sid"), col("line_no"), col("event_type"), unix_timestamp(col("ts")).as("time"))
      .as[MedicEvent]
    typed
      .groupByKey(e => (e.doc_id, e.sid))
      .mapGroupsWithState[BuildState, BuildCount](GroupStateTimeout.NoTimeout) {
        case ((doc, sid), events, state) =>
          var st = state.getOption.getOrElse(BuildState(0L, 0L))
          // per-batch events sorted by line order: the in-doc sequence
          for (e <- events.toSeq.sortBy(_.line_no)) {
            if (e.event_type == "first_heal") st = st.copy(lastBuildStart = e.time)
            else if (st.lastBuildStart > 0)
              st = BuildState(0L, st.builds + 1)
          }
          state.update(st)
          BuildCount(doc, sid, st.builds)
      }
      .toDF()
  }

  /** Memory-sink writer for tests/smoke: processAllAvailable drives a batch
    * of parquet through the streaming plan synchronously. */
  def memorySink(df: DataFrame, name: String, complete: Boolean): DataStreamWriter[Row] =
    df.writeStream
      .format("memory")
      .queryName(name)
      .outputMode(if (complete) OutputMode.Complete else OutputMode.Update)
}
