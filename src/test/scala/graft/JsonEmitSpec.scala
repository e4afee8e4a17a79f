package graft

import graft.loggen.LogGen
import graft.pipeline.{JsonEmit, TfPipeline}
import graft.sim.{ReferenceSim, SimExpectations}
import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

/** Reference-JSON emission (S5/F9): serde parity for non-finite medic
  * averages (serde_json emits `null` for NaN/Inf f32) and byte-for-byte
  * agreement with the sequential sim's renderer on generated docs.
  */
class JsonEmitSpec extends AnyFunSuite {

  lazy val spark: SparkSession = SparkSession
    .builder()
    .master("local[4]")
    .appName("jsonemit")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  private def toDf(docs: Seq[(String, Seq[String])]) = {
    import spark.implicits._
    docs.flatMap { case (id, lines) =>
      lines.zipWithIndex.map { case (l, i) =>
        val t = LogGen.tokenize(l)
        graft.loggen.SeqRow(id, i.toLong, "src-0", t, t.length)
      }
    }.toDF()
  }

  private def emitJson(docs: Seq[(String, Seq[String])]): Map[String, String] = {
    val (universe, routed) = TfPipeline.routedWithUniverse(TfPipeline.envelope(toDf(docs)))
    JsonEmit
      .emit(universe, routed, TfPipeline.subjectDim(routed))
      .collect()
      .map(r => r.getString(0) -> r.getString(1))
      .toMap
  }

  private val P = """"A<2><[U:1:100]><Red>""""
  private def ln(hms: String, rest: String) = s"04/11/2021 - $hms: $rest"

  test("charge_count=0 medic emits null averages like serde_json") {
    spark.sparkContext.setLogLevel("WARN")
    // first_heal with no charge ever deployed: avg_time_to_use and
    // avg_uber_length are 0/0 -> NaN -> serde null
    val lines = Seq(
      ln("10:00:00", s"""$P spawned as "Medic""""),
      ln("10:00:05", s"""$P triggered "first_heal_after_spawn" (time "3.5")""")
    )
    val json = emitJson(Seq("doc-nan" -> lines))("doc-nan")
    assert(json.contains("\"avg_time_to_use\":null"), json)
    assert(json.contains("\"avg_uber_length\":null"), json)
    assert(json.contains("\"avg_time_to_build\":null"), json)
    assert(json.contains("\"avg_time_before_healing\":3.5"), json)
    assert(!json.contains("NaN") && !json.contains("Infinity"), json)
    // and it matches the sim renderer byte-for-byte
    assert(json == SimExpectations.renderDocJson(ReferenceSim.run(lines.toIndexedSeq)))
  }

  test("all-unhandled doc emits [{},{}] like main.rs") {
    val lines = Seq(
      ln("10:00:00", s"""$P picked up item "medkit_small""""),
      ln("10:00:05", s"""$P disconnected (reason "client left")""")
    )
    assert(emitJson(Seq("doc-empty" -> lines))("doc-empty") == "[{},{}]")
  }

  test("hard-error doc emits nothing (reference aborts the whole log)") {
    val bad = Seq(
      ln("10:00:00", s"""$P spawned as "Scout""""),
      ln("10:00:05", s"""$P killed ${'"'}trunc"""),
      ln("10:00:10", s"""$P spawned as "Medic"""") // consumed, gap <= 60s -> hard error
    )
    val ok = Seq(ln("10:00:00", s"""$P spawned as "Scout""""))
    val out = emitJson(Seq("doc-bad" -> bad, "doc-ok" -> ok))
    assert(!out.contains("doc-bad"), "aborted doc must emit no JSON row")
    assert(out.contains("doc-ok"))
  }

  test("engine JSON equals sim-rendered JSON on generated docs (byte parity)") {
    val gen = (0 until 6).map(d => f"gen-$d%02d" -> LogGen.docLines(13L, d.toLong, 200))
    val got = emitJson(gen.map { case (k, v) => k -> (v: Seq[String]) })
    for ((name, lines) <- gen) {
      val sim = ReferenceSim.run(lines)
      if (!sim.hardError)
        assert(got(name) == SimExpectations.renderDocJson(sim), s"$name JSON mismatch")
    }
  }
}
