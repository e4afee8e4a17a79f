package graft

import graft.loggen.LogGen
import graft.streaming.StreamingPipeline
import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite
import java.nio.file.Files

class StreamingSpec extends AnyFunSuite {

  lazy val spark: SparkSession = SparkSession
    .builder()
    .master("local[4]")
    .appName("streaming")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  test("streaming envelope + windowed routed counts match the batch counts") {
    spark.sparkContext.setLogLevel("WARN")
    val dir = Files.createTempDirectory("graft-stream").toString
    val input = LogGen.generate(spark, 2, 200, 42L).toDF()
    input.write.mode("overwrite").parquet(dir)

    val counts = StreamingPipeline.routedCounts(StreamingPipeline.envelopeStream(spark, dir))
    val q = StreamingPipeline.memorySink(counts, "routed_counts", complete = true).start()
    try {
      q.processAllAvailable()
      val got = spark
        .sql("select sum(n) from routed_counts")
        .head()
        .getLong(0)
      val want = graft.pipeline.TfPipeline
        .envelope(input)
        .filter(org.apache.spark.sql.functions.col("status") === 0)
        .count()
      assert(got == want, "windowed streaming counts must cover every valid line")
    } finally q.stop()
  }

  test("stateful build counts via mapGroupsWithState") {
    val dir = Files.createTempDirectory("graft-stream2").toString
    // enough docs that at least one lobby has a medic emitting
    // first_heal/charge_ready events
    LogGen.generate(spark, 6, 400, 42L).toDF().write.mode("overwrite").parquet(dir)
    val env = StreamingPipeline.envelopeStream(spark, dir)
    val q = StreamingPipeline
      .memorySink(StreamingPipeline.buildCounts(spark, env), "builds", complete = false)
      .start()
    try {
      q.processAllAvailable()
      val rows = spark.sql("select * from builds").collect()
      assert(rows.nonEmpty)
      assert(rows.forall(_.getLong(2) >= 0))
    } finally q.stop()
  }
}
