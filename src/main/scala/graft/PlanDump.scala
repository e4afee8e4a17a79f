package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.execution.ExplainMode

/** Dump `.explain("formatted")` for declared batch queries to files --
  * the plan evidence the optimization rounds commit under plans/rNN/.
  *
  * Usage: runMain graft.PlanDump [outDir] [sfDir] [suffix] [name,name,...]
  * Streaming queries are skipped (their declared lambdas execute a real
  * micro-batch run; their physical shape is pinned by StreamingSpec instead).
  */
object PlanDump {
  def main(args: Array[String]): Unit = {
    val outDir = args.headOption.getOrElse("plans/r06")
    val sfDir = args.lift(1).getOrElse("/root/testdata/sf0.001")
    val suffix = args.lift(2).getOrElse("before")
    val only: Set[String] = args.lift(3).map(_.split(",").toSet).getOrElse(Set.empty)
    val spark = SparkSession
      .builder()
      .master(sys.props.getOrElse("spark.master", "local[8]"))
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    new java.io.File(outDir).mkdirs()
    val names = SparkEntry.queries.keys.toSeq.sorted
      .filterNot(_.contains("_stream"))
      .filter(n => only.isEmpty || only(n))
    names.foreach { name =>
      try {
        val df = SparkEntry.queries(name)(spark, sfDir)
        val plan = df.queryExecution.explainString(ExplainMode.fromString("formatted"))
        val p = java.nio.file.Paths.get(outDir, s"${name}_$suffix.txt")
        java.nio.file.Files.write(p, plan.getBytes("UTF-8"))
        println(s"[plandump] wrote $p")
      } catch {
        case e: Throwable => println(s"[plandump] FAILED $name: ${e.getMessage}")
      }
    }
    spark.stop()
  }
}
