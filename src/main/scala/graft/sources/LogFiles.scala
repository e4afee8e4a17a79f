package graft.sources

import graft.expr.GraftExpressions._
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.{DataFrame, SparkSession}

/** Raw log-file ingestion (SURVEY.md S1-S4): reads `.log` / `.log.gz` match
  * logs straight from a directory into the engine's tokenized sequence table
  * `(doc_id, line_no, source, tokens, n_tok)`.
  *
  * Spark-first: `text` source with `wholetext` (one row per file; gzip is
  * decompressed transparently by extension, covering S3), then the
  * reference's LineSplit semantics (src/lib.rs:134-170) as declarative
  * expressions:
  *   - everything before the first "L " (byte-order mark, noise) is dropped
  *     (`split_once("L ")`);
  *   - records split on the "\nL " sentinel (so multi-line event bodies like
  *     TournamentModeStarted stay in one record);
  *   - the final fragment is right-trimmed of newlines.
  *
  * Parallelism note (S2): one task per file (wholetext is not splittable);
  * at cluster scale a directory of many logs parallelizes per-file exactly
  * like the reference's rayon walkdir (examples/dir.rs:44-55). The produced
  * table is the scalable interchange format -- write it once to partitioned
  * parquet and all downstream stages read columnar splits.
  */
object LogFiles {

  /** Driver-side LineSplit twin (same semantics as [[fromBlobs]]) for
    * sequential oracles and small tools. */
  def splitLines(content: String): Vector[String] = {
    val at = content.indexOf("L ")
    if (at < 0) return Vector.empty
    val body = content.substring(at + 2)
    val out = Vector.newBuilder[String]
    var start = 0
    var next = body.indexOf("\nL ", start)
    while (next >= 0) {
      out += body.substring(start, next)
      start = next + 3
      next = body.indexOf("\nL ", start)
    }
    if (start < body.length) {
      var end = body.length
      while (end > start && body.charAt(end - 1) == '\n') end -= 1
      out += body.substring(start, end)
    }
    out.result()
  }

  /** Gunzip + decode a log file (UTF-8, lossy like the reference's
    * from_utf8_lossy) -- driver-side helper for oracles/tools. */
  def readLogFile(path: String): String = {
    val fis = new java.io.FileInputStream(path)
    try {
      val in: java.io.InputStream =
        if (path.endsWith(".gz")) new java.util.zip.GZIPInputStream(fis) else fis
      new String(in.readAllBytes(), java.nio.charset.StandardCharsets.UTF_8)
    } finally fis.close()
  }

  /** Read a file/dir/glob of raw logs into the tokenized table shape. */
  def readLogs(spark: SparkSession, path: String): DataFrame = {
    val raw = spark.read
      .option("wholetext", "true")
      .option("recursiveFileLookup", "true")
      .text(path)
      .select(input_file_name().as("file"), col("value"))
    fromBlobs(raw)
  }

  /** Blob rows (file, value) -> one row per log line, LineSplit semantics. */
  def fromBlobs(raw: DataFrame): DataFrame = {
    // doc_id = the full file path (scheme stripped): FILE-unique, so
    // `a.log` and `a.log.gz` in one directory stay separate documents
    // instead of silently merging into one doc with duplicated line_nos
    val doc = regexp_replace(col("file"), "^file:/+", "/")
    val body = expr("substring(value, instr(value, 'L ') + 2)")
    val wDoc = Window.partitionBy("doc_id")
    raw
      .filter(instr(col("value"), "L ") > 0)
      .select(
        doc.as("doc_id"),
        col("file").as("source"),
        posexplode(split(body, "\nL ")).as(Seq("line_no", "line0"))
      )
      // trim_end_matches("\n") applies only to the final fragment; and when
      // the content ends exactly with the "\nL " sentinel the reference
      // iterator yields NO trailing fragment (start == len), so the split's
      // trailing empty string is dropped to match splitLines
      .withColumn("max_line", max(col("line_no")).over(wDoc))
      .filter(!(col("line_no") === col("max_line") && col("line0") === ""))
      .withColumn(
        "line",
        when(col("line_no") === col("max_line"), regexp_replace(col("line0"), "\\n+\\z", ""))
          .otherwise(col("line0"))
      )
      .select(
        col("doc_id"),
        col("line_no").cast("long").as("line_no"),
        col("source"),
        string_to_tokens(col("line")).as("tokens")
      )
      .withColumn("n_tok", size(col("tokens")))
  }
}
