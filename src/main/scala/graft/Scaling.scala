package graft

import graft.loggen.LogGen
import org.apache.spark.sql.SparkSession

/** Scaling-efficiency evidence (BASELINE.md): runs the identical end-to-end
  * pipeline on the identical input at local[N] and local[4N] and reports
  * throughput at both plus efficiency = thr(4N) / (4 * thr(N)).
  *
  * Sandbox stand-in for the north rule's N vs 4N executors criterion (no
  * real cluster here); the job itself takes its master from config and is
  * spark-submit compatible.
  */
object Scaling {

  private def run(cpus: Int, docs: Int, lines: Int, iters: Int): (Long, Double) = {
    val spark = Bench.session(cpus.toString)
    spark.sparkContext.setLogLevel("WARN")
    try {
      val input = LogGen.generate(spark, docs, lines, 42L).toDF().persist()
      val n = input.count()
      Bench.pipelineOnce(spark, input) // warmup (codegen + JIT)
      val times = (1 to iters).map { _ =>
        val t0 = System.nanoTime()
        Bench.pipelineOnce(spark, input)
        (System.nanoTime() - t0) / 1e9
      }
      (n, times.min)
    } finally spark.stop()
  }

  def main(args: Array[String]): Unit = {
    val n = sys.env.getOrElse("SPARK_GRAFT_N", "8").toInt
    val docs = sys.env.getOrElse("SPARK_GRAFT_DOCS", "2000").toInt
    val lines = sys.env.getOrElse("SPARK_GRAFT_LINES", "500").toInt
    val iters = sys.env.getOrElse("SPARK_GRAFT_ITERS", "3").toInt

    val (rows1, secN) = run(n, docs, lines, iters)
    val (_, sec4N) = run(4 * n, docs, lines, iters)
    val thrN = rows1 / secN
    val thr4N = rows1 / sec4N
    val eff = thr4N / (4 * thrN)
    println(
      f"""{"rows":$rows1%d,"n_cpus":$n%d,"sec_n":$secN%.3f,"thr_n":$thrN%.1f,"sec_4n":$sec4N%.3f,"thr_4n":$thr4N%.1f,"scaling_efficiency":$eff%.3f}"""
    )
  }
}
