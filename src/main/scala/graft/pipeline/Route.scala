package graft.pipeline

import org.apache.spark.sql.functions._
import org.apache.spark.sql.{DataFrame, SparkSession}
import java.nio.charset.StandardCharsets
import java.nio.file.{Files, Paths, StandardCopyOption}

/** Fan-out routing sinks (SURVEY.md S6) with a snapshot-manifest commit
  * protocol standing in for Iceberg (no Iceberg jar offline -- SURVEY.md §7):
  *
  *  - data lands under `<dir>/data/route=<event_type>/` (partitioned parquet,
  *    partition pruning on read = the reference's does_handle masks);
  *  - an audit table under `<dir>/audit/` carries per-partition lineage and
  *    metrics (route, rows, docs, line span) -- north-rule requirement;
  *  - `_MANIFEST.json` is written last via atomic same-directory rename; a
  *    manifest whose fingerprint matches the input makes the whole write a
  *    no-op (resume-from-checkpoint), and a crashed run (data but no
  *    manifest) is safely overwritten (idempotent commit).
  */
object Route {

  final case class RouteResult(counts: Map[String, Long], resumed: Boolean)

  def manifestPath(dir: String): java.nio.file.Path = Paths.get(dir, "_MANIFEST.json")

  /** Stable fingerprint of an input frame: count + xor/sum of row hashes.
    * Order-independent, cheap, and scale-out friendly (one pass). */
  def fingerprint(input: DataFrame): String = {
    val row = input
      .select(
        count(lit(1)).as("n"),
        coalesce(expr("bit_xor(xxhash64(doc_id, line_no, tokens))"), lit(0L)).as("h")
      )
      .head()
    s"${row.getLong(0)}-${java.lang.Long.toHexString(row.getLong(1))}"
  }

  def writeRouted(
      spark: SparkSession,
      routable: DataFrame,
      dir: String,
      fp: String
  ): RouteResult = {
    val mp = manifestPath(dir)
    if (Files.exists(mp)) {
      val text = new String(Files.readAllBytes(mp), StandardCharsets.UTF_8)
      if (text.contains(s""""fingerprint":"$fp"""")) {
        // committed snapshot for this exact input: resume as no-op
        val counts = parseCounts(text)
        return RouteResult(counts, resumed = true)
      }
    }
    Files.createDirectories(Paths.get(dir))

    // cluster by route before the partitioned write: without it every
    // (doc-partitioned) task opens a file per route it sees -- tasks x ~45
    // routes of tiny files, and the commit protocol dominates wall time.
    // REBALANCE is the AQE-aware form: route-pure output partitions, sized
    // to the advisory target, with skewed routes (damage/kill at scale)
    // split across several files instead of one straggler writer.
    routable
      .hint("rebalance", col("route"))
      .write
      .mode("overwrite")
      .partitionBy("route")
      .parquet(s"$dir/data")

    // per-partition lineage + metrics audit table (reads back the committed
    // files so the audit reflects exactly what landed)
    val written = spark.read.parquet(s"$dir/data")
    val audit = written
      .groupBy(col("route"))
      .agg(
        count(lit(1)).as("rows"),
        countDistinct(col("doc_id")).as("docs"),
        min(col("line_no")).as("min_line"),
        max(col("line_no")).as("max_line"),
        expr("bit_xor(xxhash64(doc_id, line_no, tokens))").as("content_hash")
      )
    audit.write.mode("overwrite").parquet(s"$dir/audit")

    val counts = audit
      .select(col("route"), col("rows"))
      .collect()
      .map(r => r.getString(0) -> r.getLong(1))
      .toMap

    // manifest last, atomic rename = the commit point
    val json = {
      val cs = counts.toSeq.sorted
        .map { case (k, v) => s""""${k}":$v""" }
        .mkString("{", ",", "}")
      s"""{"fingerprint":"$fp","counts":$cs,"committed_at_ms":${System.currentTimeMillis()}}"""
    }
    val tmp = Paths.get(dir, s"_MANIFEST.tmp")
    Files.write(tmp, json.getBytes(StandardCharsets.UTF_8))
    Files.move(tmp, mp, StandardCopyOption.ATOMIC_MOVE, StandardCopyOption.REPLACE_EXISTING)
    RouteResult(counts, resumed = false)
  }

  private def parseCounts(json: String): Map[String, Long] = {
    val m = """"([^"]+)":(\d+)""".r
    m.findAllMatchIn(json)
      .filterNot(x => x.group(1) == "fingerprint" || x.group(1) == "committed_at_ms")
      .map(x => x.group(1) -> x.group(2).toLong)
      .toMap
  }

  /** Read one routed partition back with pruning (the aggregate layer's
    * entry point when running from the committed store). */
  def readRoute(spark: SparkSession, dir: String, routes: Seq[String]): DataFrame =
    spark.read.parquet(s"$dir/data").filter(col("route").isInCollection(routes))
}
