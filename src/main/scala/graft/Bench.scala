package graft

import graft.pipeline.TfPipeline
import org.apache.spark.sql.{DataFrame, SparkSession}

/** Benchmark main: headline queries on SPARK_GRAFT_SF_DIR, one JSON line to
  * stdout. Forces plans with the noop sink (no driver-side collect). The
  * flagship metric is parse->route->aggregate throughput in sequences/sec
  * over the synthetic tokenized table (BASELINE.md north rule).
  */
object Bench {

  def force(df: DataFrame): Unit =
    df.write.mode("overwrite").format("noop").save()

  /** Session at a given parallelism. Default master `local[cpus]`; set
    * SPARK_GRAFT_EXECUTORS=K to use `local-cluster[K, cpus/K, mem]` instead --
    * K SEPARATE executor JVMs, the faithful sandbox stand-in for the north
    * rule's N vs 4N executors (per-executor heaps/GC like a real cluster). */
  def session(cpus: String): SparkSession = {
    val execs = sys.env.get("SPARK_GRAFT_EXECUTORS").map(_.toInt)
    // spark-submit compatibility: an externally provided master (e.g.
    // --master on a real cluster) wins over the local default
    val master = sys.props.get("spark.master").getOrElse(execs match {
      case Some(k) =>
        val coresPer = math.max(1, cpus.toInt / k)
        val memMb = sys.env.getOrElse("SPARK_GRAFT_EXEC_MEM_MB", "4096")
        s"local-cluster[$k,$coresPer,$memMb]"
      case None => s"local[$cpus]"
    })
    val b = SparkSession
      .builder()
      .master(master)
      .appName("graft-bench")
      // 4 waves per stage: straggler smoothing without tiny-task overhead
      // (override with SPARK_GRAFT_SHUFFLE for A/B runs)
      .config(
        "spark.sql.shuffle.partitions",
        sys.env.getOrElse("SPARK_GRAFT_SHUFFLE", (cpus.toInt * 4).toString)
      )
      .config("spark.sql.adaptive.enabled", sys.env.getOrElse("SPARK_GRAFT_AQE", "true"))
      .config("spark.sql.session.timeZone", "UTC")
      // tmpfs shuffle dirs: the sandbox's single shared disk would otherwise
      // serialize every shuffle; a real cluster has per-node local disks, so
      // RAM-backed local dirs are the honest stand-in for scaling runs
      .config(
        "spark.local.dir",
        sys.env.getOrElse(
          "SPARK_GRAFT_LOCAL_DIR",
          if (new java.io.File("/dev/shm").isDirectory) "/dev/shm/graft-spark" else "/tmp"
        )
      )
      .config("spark.ui.enabled", "false")
    execs.foreach { _ =>
      val cp = new java.io.File("target/scala-2.13/classes").getAbsolutePath
      val memMb = sys.env.getOrElse("SPARK_GRAFT_EXEC_MEM_MB", "4096")
      b.config("spark.executor.memory", s"${memMb.toInt - 512}m")
        .config("spark.executor.extraClassPath", cp)
    }
    b.getOrCreate()
  }

  /** End-to-end pipeline: envelope -> classify -> route -> all four module
    * aggregates + assembly, forced through the noop sink. */
  def pipelineOnce(spark: SparkSession, input: DataFrame): Unit = {
    val noCache = sys.env.get("SPARK_GRAFT_NO_CACHE").contains("1")
    val routed0 = TfPipeline.routed(TfPipeline.envelope(input))
    val routed = if (noCache) routed0 else routed0.persist()
    try {
      val dim = TfPipeline.subjectDim(routed)
      force(TfPipeline.perPlayer(routed, dim))
      force(TfPipeline.chat(routed, dim))
    } finally if (!noCache) { routed.unpersist(); () }
  }

  /** Aggregate layer reading the COMMITTED route store (partition-pruned
    * parquet) instead of an in-memory cache -- the only shape that exists at
    * 100 TB, where parse->route runs once and aggregates are separate jobs. */
  def aggregatesFromStore(spark: SparkSession, storeDir: String): Unit = {
    val stored = spark.read.parquet(s"$storeDir/data")
    val routed = TfPipeline.routedFromStore(stored)
    val dim = TfPipeline.subjectDim(routed)
    force(TfPipeline.perPlayer(routed, dim))
    force(TfPipeline.chat(routed, dim))
  }

  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val iters = sys.env.getOrElse("SPARK_GRAFT_ITERS", "3").toInt
    val bigDocs = sys.env.getOrElse("SPARK_GRAFT_BIG_DOCS", "8000").toInt
    val spark = session(cpus)
    spark.sparkContext.setLogLevel("WARN")

    // pre-generate the tokenized table outside the timed region
    val input = SparkEntry.tfInput(spark, sfDir)
    val nRows = input.count()

    def timed(f: => Unit): Double = {
      val t0 = System.nanoTime()
      f
      (System.nanoTime() - t0) / 1e9
    }

    /** Median of up to `iters` runs (the host shows up to 3x run-to-run
      * variance); expensive queries (>10 s first run) get 2, >30 s get 1. */
    def median(f: () => Unit): (Double, Double) = {
      try {
        val first = timed(f())
        val n = if (first > 30) 1 else if (first > 10) 2 else iters
        val all = first +: (1 until n).map(_ => timed(f()))
        val s = all.sorted
        (s(s.length / 2), s.head)
      } catch { case _: Throwable => (-1.0, -1.0) }
    }

    // routed store for the store-based aggregate leg (written outside the
    // headline timings; the committed write itself is timed below as
    // tf_store_write into fresh dirs)
    val storeBase = sys.env.getOrElse("SPARK_GRAFT_STORE_DIR", "/tmp/graft-bench-store")
    val storeDir = s"$storeBase/r"
    val routable = TfPipeline.routable(TfPipeline.envelope(input))
    graft.pipeline.Route.writeRouted(spark, routable, storeDir, graft.pipeline.Route.fingerprint(input))
    val wCounter = new java.util.concurrent.atomic.AtomicLong(0)

    val headline: Seq[(String, () => Unit)] = Seq(
      "tf_pipeline" -> (() => pipelineOnce(spark, input)),
      "tf_pipeline_store" -> (() => aggregatesFromStore(spark, storeDir)),
      "tf_envelope" -> (() => force(TfPipeline.envelope(input))),
      "tf_route_write" -> (() => force(TfPipeline.routable(TfPipeline.envelope(input)))),
      // the COMMITTED store write (partitioned parquet + audit + manifest),
      // a fresh dir per iteration so the manifest resume no-op can't hide it
      "tf_store_write" -> (() => {
        val d = s"$storeBase/w${wCounter.incrementAndGet()}"
        graft.pipeline.Route.writeRouted(spark, routable, d, graft.pipeline.Route.fingerprint(input))
        ()
      }),
      "q1_agg" -> (() => force(SparkEntry.queries("q1_agg")(spark, sfDir))),
      "q_asof_join" -> (() => force(SparkEntry.queries("q_asof_join")(spark, sfDir))),
      "q_sessionize" -> (() => force(SparkEntry.queries("q_sessionize")(spark, sfDir))),
      "q_minhash_sig" -> (() => force(SparkEntry.queries("q_minhash_sig")(spark, sfDir))),
      "q_ngram_jaccard" -> (() => force(SparkEntry.queries("q_ngram_jaccard")(spark, sfDir))),
      "q_cosine_topk" -> (() => force(SparkEntry.queries("q_cosine_topk")(spark, sfDir))),
      "q_dedup_exact" -> (() => force(SparkEntry.queries("q_dedup_exact")(spark, sfDir))),
      "q_langid" -> (() => force(SparkEntry.queries("q_langid")(spark, sfDir))),
      "tf_ann_lsh" -> (() => force {
        import org.apache.spark.sql.functions._
        // size-aware parametrization (the sf-independent oracle query fixes
        // bits=6, which over-fills buckets at larger corpora)
        val e = spark.read.parquet(s"$sfDir/embeddings.parquet")
          .select(col("vec_id").as("id"), col("embedding").as("vec"))
        val n = e.count()
        val bits = math.max(6, (math.log(n / 12.0) / math.log(2)).ceil.toInt)
        graft.ops.Similarity.lshTopK(e, 64, bits, 3, tables = 4, maxBucket = 200)
      }),
      // production hash paths (xxhash64) vs the md5-bound oracle twins above
      "tf_simhash_fast" -> (() => force {
        import org.apache.spark.sql.functions._
        spark.read.parquet(s"$sfDir/documents.parquet")
          .select(col("doc_id"), graft.ops.Dedup.simhash60(split(col("text"), " ")).as("h"))
      }),
      "tf_lsh_candidates_fast" -> (() => force {
        import org.apache.spark.sql.functions._
        val docs = spark.read.parquet(s"$sfDir/documents.parquet")
          .select(col("doc_id"), graft.ops.Dedup.shingles(split(col("text"), " "), 3).as("sh"))
        graft.ops.Dedup.lshCandidates(docs, col("doc_id"), col("sh"), 8, 2)
      })
    )

    // one warmup of the flagship to JIT/codegen-compile before timing
    try pipelineOnce(spark, input)
    catch { case _: Throwable => }

    val results = headline.map { case (name, f) => name -> median(f) }

    // throughput leg: a larger generated table (default 8000 docs = ~4M
    // rows, the BASELINE.md scaling-table shape) so seq/s reflects
    // streaming throughput, not the ~10-stage barrier floor of a small input
    val (bigRows, bigSec) =
      try {
        val big = graft.loggen.LogGen.generate(spark, bigDocs, 500, 42L).toDF().persist()
        val n = big.count()
        try pipelineOnce(spark, big)
        catch { case _: Throwable => } // warm partitions/codegen
        val t = Seq(timed(pipelineOnce(spark, big)), timed(pipelineOnce(spark, big))).min
        big.unpersist()
        (n, t)
      } catch { case _: Throwable => (0L, -1.0) }

    val qs = results
      .map { case (k, (med, _)) => "\"" + k + "\":" + f"$med%.3f" }
      .mkString("{", ",", "}")
    val qmin = results
      .map { case (k, (_, mn)) => "\"" + k + "\":" + f"$mn%.3f" }
      .mkString("{", ",", "}")
    val total = results.map(_._2._1).filter(_ >= 0).sum
    val pipeSec = results.toMap.get("tf_pipeline").map(_._1).getOrElse(-1.0)
    val thrSmall = if (pipeSec > 0) nRows / pipeSec else -1.0
    val thr = if (bigSec > 0) bigRows / bigSec else thrSmall
    println(
      f"""{"metric":"total","value":$total%.3f,"unit":"sec","queries":$qs%s,"queries_min":$qmin%s,"sf":"$sfDir%s","rows":$nRows%d,"cpus":"$cpus%s","pipeline_seq_per_sec":$thr%.1f,"pipeline_seq_per_sec_small":$thrSmall%.1f,"big_rows":$bigRows%d,"big_sec":$bigSec%.3f,"iters":$iters%d}"""
    )
    spark.stop()
  }

}
