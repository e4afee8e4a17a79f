package graft

import graft.loggen.LogGen
import graft.pipeline.{TfPipeline, TypedEvents}
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class TypedEventsSpec extends AnyFunSuite {

  lazy val spark: SparkSession = SparkSession
    .builder()
    .master("local[4]")
    .appName("typed")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  private def frame(lines: Seq[String]) = {
    import spark.implicits._
    val df = lines.zipWithIndex.map { case (l, i) =>
      val t = LogGen.tokenize(l)
      graft.loggen.SeqRow("d", i.toLong, "s", t, t.length)
    }.toDF()
    TfPipeline.envelope(df)
  }

  test("kill view: weapon quirk, positions, target kind") {
    spark.sparkContext.setLogLevel("WARN")
    val f = frame(Seq(
      """04/11/2021 - 23:34:07: "A<3><[U:1:10]><Blue>" killed "B<9><[U:1:20]><Red>" with "scattergun" (attacker_position "39 -492 81") (victim_position "-34 -434 93")"""
    ))
    val r = TypedEvents.view(f, "kill").collect()(0)
    assert(r.getAs[String]("target") == "B<9><[U:1:20]><Red>")
    assert(r.getAs[String]("target_kind") == "player")
    assert(r.getAs[String]("weapon") == "cattergun") // replicated misalignment
    assert(r.getSeq[Int](r.fieldIndex("attacker_position")) == Seq(39, -492, 81))
    assert(!r.getAs[Boolean]("parse_error"))
  }

  test("damage view: clamped ints, subject raw") {
    val f = frame(Seq(
      """04/11/2021 - 23:33:54: "A<3><[U:1:10]><Red>" triggered "damage" against "B<9><[U:1:20]><Blue>" (damage "99999999999999999999") (weapon "scattergun")"""
    ))
    val r = TypedEvents.view(f, "damage").collect()(0)
    assert(r.getAs[Long]("damage") == Long.MaxValue) // all-digits overflow clamp
    assert(r.getAs[String]("target") == "B<9><[U:1:20]><Blue>")
  }

  test("medic_death_ex quirk: charge_percentage always null (uberpct key)") {
    val f = frame(Seq(
      """04/11/2021 - 23:35:16: "A<4><[U:1:10]><Red>" triggered "medic_death_ex" (uberpct "1")"""
    ))
    val r = TypedEvents.view(f, "medic_death_ex").collect()(0)
    assert(r.isNullAt(r.fieldIndex("charge_percentage")))
  }

  test("point_captured players zipped with positions") {
    val f = frame(Seq(
      """04/11/2021 - 23:37:35: Team "Red" triggered "pointcaptured" (cp "2") (cpname "#cap") (numcappers "2") (player1 "A<4><[U:1:1]><Red>") (position1 "1 2 3") (player2 "B<5><[U:1:2]><Red>") (position2 "4 5 6")"""
    ))
    val r = TypedEvents.capturePlayers(f).collect()(0)
    assert(r.getAs[Long]("cp") == 2L && r.getAs[Long]("num_cappers") == 2L)
    val players = r.getSeq[org.apache.spark.sql.Row](r.fieldIndex("players"))
    assert(players.length == 2)
    assert(players(0).getString(0) == "A<4><[U:1:1]><Red>")
    assert(players(1).getSeq[Int](1) == Seq(4, 5, 6))
  }

  test("tournament_start two-line body") {
    val f = frame(Seq(
      "04/11/2021 - 23:33:27: Tournament mode started\nBlue Team: BLU\nRed Team: RED"
    ))
    val r = TypedEvents.view(f, "tournament_start").collect()(0)
    assert(r.getAs[String]("blue") == "BLU" && r.getAs[String]("red") == "RED")
  }

  test("every spec'd event type yields a valid view (schema + no throw)") {
    val f = frame(LogGen.docLines(42L, 0L, 300))
    for (ty <- TypedEvents.specs.keys) {
      val v = TypedEvents.view(f, ty)
      v.collect() // must not throw
      assert(v.columns.contains("parse_error"))
    }
  }
}
