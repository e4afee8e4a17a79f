package graft

import graft.pipeline.TfPipeline
import org.apache.spark.sql.functions._
import org.apache.spark.sql.{DataFrame, SparkSession}

/** Stage-level profiler for the flagship pipeline: times each stage of
  * parse -> classify -> route -> module aggregates in isolation (noop sink,
  * min of `iters` samples) so optimization work targets measured cost, not
  * guessed cost.
  *
  * Usage: SPARK_GRAFT_BIG_DOCS=8000 sbt -batch "runMain graft.Profile"
  */
object Profile {
  def main(args: Array[String]): Unit = {
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val bigDocs = sys.env.getOrElse("SPARK_GRAFT_BIG_DOCS", "8000").toInt
    val iters = sys.env.getOrElse("SPARK_GRAFT_ITERS", "3").toInt
    val spark = Bench.session(cpus)
    spark.sparkContext.setLogLevel("WARN")
    import Bench.force

    val input = graft.loggen.LogGen.generate(spark, bigDocs, 500, 42L).toDF().persist()
    val n = input.count()
    println(s"rows=$n docs=$bigDocs cpus=$cpus")

    def timed(name: String)(f: => Unit): Unit = {
      val ts = (0 until iters).map { _ =>
        val t0 = System.nanoTime(); f; (System.nanoTime() - t0) / 1e9
      }
      println(f"$name%-28s min=${ts.min}%7.2f s  raw=${ts.map(t => f"$t%.2f").mkString(",")}")
    }

    timed("envelope")(force(TfPipeline.envelope(input)))
    timed("classified")(force(TfPipeline.classified(TfPipeline.envelope(input).drop("tokens"))))
    // how much of `classified` is just serializing the pm map into the sink
    timed("classified(flags only)")(force(
      TfPipeline.classified(TfPipeline.envelope(input).drop("tokens"))
        .select("doc_id", "line_no", "handled", "typed_err", "drop", "hard_error")
    ))
    timed("routed")(force(TfPipeline.routed(TfPipeline.envelope(input))))

    val routed = TfPipeline.routed(TfPipeline.envelope(input)).persist()
    timed("routed.persist+count") { routed.count(); () }
    timed("subjectDim")(force(TfPipeline.subjectDim(routed)))
    val dim = TfPipeline.subjectDim(routed)
    timed("classStats")(force(TfPipeline.classStats(routed)))
    timed("healSpread")(force(TfPipeline.healSpread(routed)))
    timed("medicStats")(force(TfPipeline.medicStats(routed)))
    timed("chat")(force(TfPipeline.chat(routed, dim)))
    timed("chat_messages(no agg)")(force(TfPipeline.chatMessages(routed, dim)))
    timed("perPlayer(all+joins)")(force(TfPipeline.perPlayer(routed, dim)))
    val dimP = dim.persist()
    dimP.count()
    timed("chat(dim persisted)")(force(TfPipeline.chat(routed, dimP)))
    timed("perPlayer(dim persisted)")(force(TfPipeline.perPlayer(routed, dimP)))
    // assembly without the ordered-output contract: attributes the final
    // repartition + global sort cost inside the perPlayer figure
    timed("perPlayerAssembled(no sort)")(force(TfPipeline.perPlayerAssembled(routed, dimP)))
    dimP.unpersist()
    routed.unpersist()

    // e2e decomposition: the EXACT pipelineOnce sequence with each phase
    // timed separately (fresh persist each round, like the bench), so the
    // gap between the sum of warm-cache legs above and the e2e figure is
    // attributable instead of guessed
    timed("e2e sub: routed persist+mat") {
      val r = TfPipeline.routed(TfPipeline.envelope(input)).persist()
      r.count()
      r.unpersist(blocking = true); ()
    }
    (0 until iters).foreach { _ =>
      val r = TfPipeline.routed(TfPipeline.envelope(input)).persist()
      val t0 = System.nanoTime(); r.count()
      val tMat = (System.nanoTime() - t0) / 1e9
      val d = TfPipeline.subjectDim(r).persist()
      val t1 = System.nanoTime(); d.count()
      val tDim = (System.nanoTime() - t1) / 1e9
      val t2 = System.nanoTime(); force(TfPipeline.perPlayer(r, d))
      val tPp = (System.nanoTime() - t2) / 1e9
      val t3 = System.nanoTime(); force(TfPipeline.chat(r, d))
      val tCh = (System.nanoTime() - t3) / 1e9
      d.unpersist(); r.unpersist()
      println(f"e2e phases: mat=$tMat%.2f dim=$tDim%.2f perPlayer=$tPp%.2f chat=$tCh%.2f sum=${tMat + tDim + tPp + tCh}%.2f")
    }

    timed("pipelineOnce(e2e)")(Bench.pipelineOnce(spark, input))
    spark.stop()
  }
}
