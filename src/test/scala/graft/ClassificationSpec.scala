package graft

import graft.loggen.LogGen
import graft.pipeline.TfPipeline
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import graft.sim.ReferenceSim
import org.scalatest.funsuite.AnyFunSuite

/** Recovery-classification semantics (lib.rs:68-99) on hand-built docs, plus
  * parser-totality properties over adversarial random lines. */
class ClassificationSpec extends AnyFunSuite {

  lazy val spark: SparkSession = SparkSession
    .builder()
    .master("local[4]")
    .appName("classification")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  private def toDf(lines: Seq[String]) = {
    import spark.implicits._
    lines.zipWithIndex.map { case (l, i) =>
      val t = LogGen.tokenize(l)
      graft.loggen.SeqRow("doc-x", i.toLong, "src-0", t, t.length)
    }.toDF()
  }

  private val P = """"A<2><[U:1:100]><Red>""""
  private def ln(hms: String, rest: String) = s"04/11/2021 - $hms: $rest"

  test("hard error: truncated kill followed by <=60s line") {
    spark.sparkContext.setLogLevel("WARN")
    val lines = Seq(
      ln("10:00:00", s"""$P spawned as "Scout""""),
      ln("10:00:05", s"""$P killed ${'"'}B<3><[U:1:200]><Blue"""), // required-field error
      ln("10:00:10", s"""$P spawned as "Medic"""") // within 60s -> hard error
    )
    val cls = TfPipeline.classified(TfPipeline.envelope(toDf(lines)))
    assert(cls.filter(col("hard_error")).count() == 1)
    val sim = ReferenceSim.run(lines.toIndexedSeq)
    assert(sim.hardError)
  }

  test("recovery (b): truncated kill + >60s jump drops BOTH lines") {
    val lines = Seq(
      ln("10:00:00", s"""$P spawned as "Scout""""),
      ln("10:00:05", s"""$P killed ${'"'}B<3><[U:1:200]><Blue"""),
      ln("10:02:00", s"""$P spawned as "Medic""""), // consumed + dropped
      ln("10:02:05", s"""$P triggered "healed" against $P (healing "7")""")
    )
    val env = TfPipeline.envelope(toDf(lines))
    val cls = TfPipeline.classified(env)
    assert(cls.filter(col("hard_error")).count() == 0)
    assert(cls.filter(col("drop")).count() == 2)
    val routed = TfPipeline.routed(env)
    // survivors: the first spawn and the heal
    assert(routed.select("event_type").collect().map(_.getString(0)).sorted.toSeq ==
      Seq("healed", "spawned"))
    val sim = ReferenceSim.run(lines.toIndexedSeq)
    assert(!sim.hardError && sim.handledCount == 2)
  }

  test("recovery (a): same-date embedded line start drops silently") {
    val lines = Seq(
      ln("10:00:00", s"""$P spawned as "Scout""""),
      ln("10:00:05", s"""$P killed ${'"'}garbage L 04/11/2021 - 09:00:00 tail"""),
      ln("10:00:06", s"""$P spawned as "Medic"""") // NOT consumed
    )
    val env = TfPipeline.envelope(toDf(lines))
    assert(TfPipeline.classified(env).filter(col("hard_error")).count() == 0)
    assert(TfPipeline.routed(env).count() == 2)
    val sim = ReferenceSim.run(lines.toIndexedSeq)
    assert(!sim.hardError && sim.handledCount == 2)
  }

  test("trailing truncated error line just drops (break)") {
    val lines = Seq(
      ln("10:00:00", s"""$P spawned as "Scout""""),
      ln("10:00:05", s"""$P killed ${'"'}B<3><[U:1:200]><Blue""")
    )
    val env = TfPipeline.envelope(toDf(lines))
    assert(TfPipeline.classified(env).filter(col("hard_error")).count() == 0)
    assert(TfPipeline.routed(env).count() == 1)
    assert(!ReferenceSim.run(lines.toIndexedSeq).hardError)
  }

  test("parser totality: never throws on arbitrary lines (5000 fuzz cases)") {
    val rnd = new java.util.Random(42)
    val fragments = Array(
      "04/11/2021 - 10:00:00: ", "\"", "<", ">", "[U:1:", "]", "Team ", "Te",
      "triggered \"", "killed ", "say ", "against ", "(", ")", " ", "\n",
      "damage", "Console<0><Console><Console>", "héllo", "😀", ":",
      "999999999999999999999999", "-1", "Red", "with \""
    )
    for (_ <- 0 until 5000) {
      val sb = new StringBuilder
      val n = rnd.nextInt(20)
      for (_ <- 0 until n) {
        if (rnd.nextBoolean()) sb.append(fragments(rnd.nextInt(fragments.length)))
        else sb.append((32 + rnd.nextInt(95)).toChar)
      }
      val s = sb.toString
      val r = graft.expr.LineParser.parse(s)
      if (r.status == graft.expr.LineParser.OK) {
        // params extraction + subject id must be total too
        val p = graft.expr.LineParser.paramsFor(r.eventType, r.params)
        graft.expr.LineParser.typedError(r.eventType, p.keys, p.values)
        graft.expr.Steam.subjectId(r.kind, r.subject)
      }
    }
  }

  test("sim vs pipeline on 20 more random docs (seeds 1000-1019)") {
    for (docId <- 1000 until 1020) {
      val lines = LogGen.docLines(7L, docId.toLong, 150)
      val sim = ReferenceSim.run(lines)
      val env = TfPipeline.envelope(toDf(lines))
      if (sim.hardError) {
        assert(TfPipeline.classified(env).filter(col("hard_error")).count() > 0, s"doc $docId")
      } else {
        val routed = TfPipeline.routed(env)
        assert(routed.count() == sim.handledCount, s"doc $docId handled count")
      }
    }
  }
}
