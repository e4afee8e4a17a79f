package graft

import graft.pipeline.{JsonEmit, TfPipeline}
import graft.sources.LogFiles
import org.apache.spark.sql.SparkSession

/** CLI twin of the reference's main.rs: parse raw match log(s) and print the
  * per-doc result JSON (`[global, per_player]`, skip-default serde shape) to
  * stdout. Accepts a file, directory or glob of `.log` / `.log.gz`.
  *
  * Usage: runMain graft.ParseLog <path> [--pretty]
  */
object ParseLog {
  def main(args: Array[String]): Unit = {
    require(args.nonEmpty, "usage: ParseLog <path-to-log-or-dir> [--pretty]")
    val path = args(0)
    val pretty = args.contains("--pretty")
    val spark = SparkSession
      .builder()
      .master(sys.props.getOrElse("spark.master", "local[8]"))
      .appName("graft-parselog")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    // stdout must be UTF-8 regardless of the JVM's default charset (player
    // names / chat are arbitrary Unicode)
    val stdout = new java.io.PrintStream(new java.io.FileOutputStream(java.io.FileDescriptor.out), true, "UTF-8")

    val input = LogFiles.readLogs(spark, path)
    val (docs, routed0) = TfPipeline.routedWithUniverse(TfPipeline.envelope(input))
    val routed = routed0.cache()
    val dim = TfPipeline.subjectDim(routed)
    val out = JsonEmit.emit(docs, routed, dim).orderBy("doc_id").collect()

    // docs the reference's parse() would abort (hard error -> main.rs exits
    // with the error and prints nothing): report on stderr like main_error
    val aborted = input.select("doc_id").distinct()
      .join(docs, Seq("doc_id"), "left_anti").collect().map(_.getString(0))
    aborted.sorted.foreach(d => System.err.println(s"[parse error] $d: hard parse error, no output"))

    for (row <- out) {
      val json = row.getString(1)
      val rendered =
        if (!pretty) json
        else {
          val mapper = new com.fasterxml.jackson.databind.ObjectMapper()
          mapper.writerWithDefaultPrettyPrinter().writeValueAsString(mapper.readTree(json))
        }
      if (out.length > 1) stdout.println(s"=== ${row.getString(0)} ===")
      stdout.println(rendered)
    }
    spark.stop()
  }
}
