package graft

import graft.pipeline.TfPipeline
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Plan auditor: prints the physical plans of the scale-critical paths so
  * partition pruning / filter pushdown / broadcast choices are inspectable
  * (and greppable) rather than assumed.
  *
  * Usage: runMain graft.ExplainAudit [storeDir] [sfDir]
  */
object ExplainAudit {
  def main(args: Array[String]): Unit = {
    val storeDir = args.headOption.getOrElse("/tmp/graft-bench-store/r")
    val sfDir = args.lift(1).getOrElse("/root/testdata/sf0.01")
    val spark = SparkSession
      .builder()
      .master(sys.props.getOrElse("spark.master", "local[4]"))
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    def section(title: String)(df: => org.apache.spark.sql.DataFrame): Unit = {
      println(s"\n================ $title ================")
      df.explain("formatted")
    }

    if (new java.io.File(s"$storeDir/data").isDirectory) {
      section("store-read aggregate leg (expect PartitionFilters on route)") {
        val routed = TfPipeline.routedFromStore(spark.read.parquet(s"$storeDir/data"))
        TfPipeline.perPlayer(routed, TfPipeline.subjectDim(routed))
      }
    }
    section("q1_agg (expect PushedFilters/ReadSchema pruning)") {
      SparkEntry.queries("q1_agg")(spark, sfDir)
    }
    section("q_broadcast_join (expect BroadcastHashJoin)") {
      SparkEntry.queries("q_broadcast_join")(spark, sfDir)
    }
    section("q_ngram_jaccard (expect ObjectHashAggregate bounded_collect df cap, ONE explode subtree, NO window sort / self-join)") {
      SparkEntry.queries("q_ngram_jaccard")(spark, sfDir)
    }
    section("lsh_candidates fast (expect ObjectHashAggregate bounded_collect bucket cap, ONE minhash subtree)") {
      val docs = spark.read.parquet(s"$sfDir/documents.parquet")
        .select(col("doc_id"), graft.ops.Dedup.shingles(split(col("text"), " "), 3).as("sh"))
      graft.ops.Dedup.lshCandidates(docs, col("doc_id"), col("sh"), 8, 2)
    }
    section("tf_ann_lsh (expect ObjectHashAggregate bounded_collect bucket cap)") {
      SparkEntry.queries("tf_ann_lsh")(spark, sfDir)
    }
    section("tf_ann_ivf (expect BroadcastNestedLoopJoin for centroid assignment, capped cells)") {
      SparkEntry.queries("tf_ann_ivf")(spark, sfDir)
    }
    section("q_embed_neardup_ann / ivfNearDupPairs (expect broadcast centroid scoring, ONE bounded_collect cell aggregate, pair dedup BEFORE scoring)") {
      SparkEntry.queries("q_embed_neardup_ann")(spark, sfDir)
    }
    section("trained-centroid IVF probe (same plan shape as the sampled quantizer: broadcast cents, capped cells)") {
      val e = spark.read.parquet(s"$sfDir/embeddings.parquet")
        .select(col("vec_id").as("id"), col("embedding").as("vec"))
      graft.ops.Similarity.ivfTopKWithCentroids(
        e, graft.ops.Similarity.trainCentroids(e, 8, maxIter = 2), 3, nProbe = 2, maxCell = 500)
    }
    section("q_decontam (expect BroadcastHashJoin of the eval gram-hash set; train side map-only until the per-doc aggregate)") {
      SparkEntry.queries("q_decontam")(spark, sfDir)
    }
    section("q_sample_stratified (expect a pure Filter over the scan -- zero exchange, zero state)") {
      SparkEntry.queries("q_sample_stratified")(spark, sfDir)
    }
    section("q_repetition (expect map-side Project/Filter only -- the top-bigram count is a sorted-run fold, no explode, no Exchange)") {
      SparkEntry.queries("q_repetition")(spark, sfDir)
    }
    section("q_pack_chunks (expect ONE hash-partition Exchange on shard + one per-shard Window sort -- no global order)") {
      SparkEntry.queries("q_pack_chunks")(spark, sfDir)
    }
    section("q_quality_cut (expect one Window sort per source + BroadcastHashJoin for the per-stratum counts -- no second count-over-window pass)") {
      SparkEntry.queries("q_quality_cut")(spark, sfDir)
    }
    section("chunked bucket pairs, cap > 2048 (expect a user-numbered Exchange spreading chunk-pair rows BEFORE the pair explode)") {
      val ids = spark.range(0, 3000).select(lit("hot").as("k"), col("id"))
      val buckets = ids.groupBy("k")
        .agg(graft.expr.BoundedCollect.bounded_collect(col("id"), 10000).as("__ids"))
        .filter(col("__ids").isNotNull && size(col("__ids")) >= 2)
      graft.ops.Dedup.bucketPairs(buckets, directed = false, cap = 10000)
    }
    spark.stop()
  }
}
