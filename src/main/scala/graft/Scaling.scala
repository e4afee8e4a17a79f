package graft

import graft.loggen.LogGen
import org.apache.spark.sql.SparkSession

/** Scaling-efficiency evidence (BASELINE.md): runs the end-to-end pipeline at
  * ONE parallelism level (SPARK_GRAFT_CPUS) in a fresh JVM and prints a JSON
  * line; `scripts/scaling.sh` orchestrates the N vs 4N pair in separate JVMs
  * (no cross-session heap pollution) and computes
  * efficiency = thr(4N) / (4 * thr(N)).
  *
  * Sandbox stand-in for the north rule's N vs 4N executors criterion (no
  * real cluster here); the job takes its master from config and is
  * spark-submit compatible.
  */
object Scaling {

  def main(args: Array[String]): Unit = {
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "8").toInt
    val docs = sys.env.getOrElse("SPARK_GRAFT_DOCS", "8000").toInt
    val lines = sys.env.getOrElse("SPARK_GRAFT_LINES", "500").toInt
    val iters = sys.env.getOrElse("SPARK_GRAFT_ITERS", "3").toInt

    val quiet = Bench.waitQuiet()
    val loadBefore = Bench.loadavg()._1
    val spark = Bench.session(cpus.toString)
    spark.sparkContext.setLogLevel("WARN")
    val input = LogGen.generate(spark, docs, lines, 42L).toDF().persist()
    val n = input.count()
    val job: () => Unit = sys.env.getOrElse("SPARK_GRAFT_JOB", "pipeline") match {
      case "parse" =>
        // scan -> envelope -> classify -> route leg (map-dominant, the shape
        // of the 100 TB regime where data volume dwarfs barrier latency)
        () => Bench.force(graft.pipeline.TfPipeline.routable(graft.pipeline.TfPipeline.envelope(input)))
      case _ => () => Bench.pipelineOnce(spark, input)
    }
    job() // warmup (codegen + JIT)
    val times = (1 to iters).map { _ =>
      // let the ContextCleaner drop the previous iteration's shuffle files
      System.gc()
      Thread.sleep(1500)
      val t0 = System.nanoTime()
      job()
      (System.nanoTime() - t0) / 1e9
    }
    val sorted = times.sorted
    val best = sorted(sorted.length / 2) // median: robust to warmup + GC bursts
    val thr = n / best
    println(
      f"""SCALING {"rows":$n%d,"cpus":$cpus%d,"sec":$best%.3f,"thr":$thr%.1f,"times":[${times
          .map(t => f"$t%.2f")
          .mkString(",")}],"load_before":$loadBefore%.2f,"quiet_at_start":$quiet%b}"""
    )
    spark.stop()
  }
}
