package graft

import graft.loggen.LogGen
import graft.pipeline.TfPipeline
import org.apache.spark.sql.SparkSession

object Profile {
  def main(args: Array[String]): Unit = {
    val spark = Bench.session("32")
    spark.sparkContext.setLogLevel("WARN")
    val input = LogGen.generate(spark, 200, 500, 42L).toDF().persist()
    println("rows=" + input.count())
    def t(name: String)(f: => Unit): Unit = {
      val t0 = System.nanoTime(); f
      println(f"$name%-16s ${(System.nanoTime() - t0) / 1e9}%.2f s")
    }
    t("envelope")(Bench.force(TfPipeline.envelope(input)))
    val routed = TfPipeline.routed(TfPipeline.envelope(input)).persist()
    t("routed-mat")(routed.count())
    t("dim")(Bench.force(TfPipeline.subjectDim(routed)))
    t("healspread")(Bench.force(TfPipeline.healSpread(routed)))
    t("medic")(Bench.force(TfPipeline.medicStats(routed)))
    t("classstats")(Bench.force(TfPipeline.classStats(routed)))
    val dim = TfPipeline.subjectDim(routed)
    t("chat")(Bench.force(TfPipeline.chat(routed, dim)))
    t("perPlayer")(Bench.force(TfPipeline.perPlayer(routed, dim)))
    t("perPlayer2")(Bench.force(TfPipeline.perPlayer(routed, dim)))
    spark.stop()
  }
}
