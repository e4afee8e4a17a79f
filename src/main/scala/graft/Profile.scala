package graft

import graft.loggen.LogGen
import graft.pipeline.TfPipeline
import org.apache.spark.sql.SparkSession

object Profile {
  def main(args: Array[String]): Unit = {
    val spark = Bench.session("32")
    spark.sparkContext.setLogLevel("WARN")
    val input = LogGen.generate(spark, 2000, 500, 42L).toDF().persist()
    println("rows=" + input.count())
    val routed = TfPipeline.routed(TfPipeline.envelope(input))
    val plan = routed.queryExecution.optimizedPlan.toString
    println("ParamsMap occurrences in optimized plan: " + "paramsmap".r.findAllIn(plan.toLowerCase).length)
    println("ParseRawLine occurrences: " + "parserawline".r.findAllIn(plan.toLowerCase).length)
    println("TokensToString occurrences: " + "tokenstostring".r.findAllIn(plan.toLowerCase).length)
    def t(name: String)(f: => Unit): Unit = {
      val t0 = System.nanoTime(); f
      println(f"$name%-16s ${(System.nanoTime() - t0) / 1e9}%.2f s")
    }
    t("envelope")(Bench.force(TfPipeline.envelope(input)))
    t("classified")(Bench.force(TfPipeline.classified(TfPipeline.envelope(input))))
    t("routed")(Bench.force(routed))
    spark.stop()
  }
}
