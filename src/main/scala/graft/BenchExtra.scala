package graft

import graft.pipeline.TfPipeline

/** Extra benchmarks for optimization iteration (guide §1.4 noop isolation):
  * the two pipeline legs at SF scale, separately sampled, without the frozen
  * Bench harness's full query sweep. Reads the same env contract
  * (SPARK_GRAFT_SF_DIR / SPARK_GRAFT_CPUS / SPARK_GRAFT_ITERS); prints one
  * line per leg. Numbers are cited in OPTIMIZATION_r06.md -- the frozen
  * graft.Bench stays the artifact of record.
  */
object BenchExtra {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val iters = sys.env.getOrElse("SPARK_GRAFT_ITERS", "5").toInt
    val spark = Bench.session(cpus)
    spark.sparkContext.setLogLevel("WARN")

    val input = SparkEntry.tfInput(spark, sfDir)
    val nRows = input.count()
    val wide = spark.conf.get("spark.sql.shuffle.partitions")
    val sized = math.max(cpus.toInt, math.min(wide.toInt, (nRows / 3000L).toInt)).toString
    if (!sys.env.contains("SPARK_GRAFT_SHUFFLE")) {
      spark.conf.set("spark.sql.shuffle.partitions", sized)
    }

    val storeBase = "/tmp/graft-benchextra-store/" + java.lang.Long.toHexString(System.nanoTime())
    val storeDir = s"$storeBase/r"
    val routable = TfPipeline.routable(TfPipeline.envelope(input))
    graft.pipeline.Route.writeRouted(spark, routable, storeDir, graft.pipeline.Route.fingerprint(input))

    def timed(name: String)(f: => Unit): Unit = {
      val ts = (0 until iters).map { _ =>
        val t0 = System.nanoTime(); f; (System.nanoTime() - t0) / 1e9
      }
      println(f"$name%-24s min=${ts.min}%7.3f s  raw=${ts.map(t => f"$t%.3f").mkString(",")}")
    }

    // explicit query-name args: time just those declared queries (noop sink);
    // no args: the two pipeline legs
    if (args.nonEmpty) {
      args.foreach { name =>
        spark.sparkContext.setJobDescription(s"benchextra: $name")
        timed(name)(Bench.force(SparkEntry.queries(name)(spark, sfDir)))
      }
    } else {
      spark.sparkContext.setJobDescription("benchextra: pipelineOnce sf")
      timed("tf_pipeline(sf)")(Bench.pipelineOnce(spark, input))
      spark.sparkContext.setJobDescription("benchextra: aggregatesFromStore sf")
      timed("tf_pipeline_store(sf)")(Bench.aggregatesFromStore(spark, storeDir))
    }
    spark.sparkContext.setJobDescription(null)
    spark.stop()
  }
}
