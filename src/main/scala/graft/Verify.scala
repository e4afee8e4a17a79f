package graft

import graft.loggen.LogGen
import graft.sim.{ReferenceSim, SimExpectations}
import org.apache.spark.sql.types._
import org.apache.spark.sql.{Row, SparkSession}

import java.nio.file.{Files, Paths}
import scala.collection.mutable

/** Driver-run correctness dump: each SparkEntry.queries result -> parquet,
  * plus oracle_sql.json for the driver's DuckDB compare.
  *
  * For the tf_* pipeline queries (whose input is the deterministic synthetic
  * tokenized table, not a parquet the oracle can read), this also writes
  * EXPECTATION tables computed by the sequential ReferenceSim -- the
  * simulator proven bit-exact against the reference's committed real-log
  * snapshots -- and the oracle SQL simply SELECTs them, giving those queries
  * a full rows+schema+hash driver check instead of rows-only.
  */
object Verify {

  private def canonF(v: Float): Float =
    if (v.isNaN) -999999f else if (v == Float.PositiveInfinity) 999999f else v

  /** Write all tf_* expectation tables for the sf under `expDir`. */
  def writeExpectations(spark: SparkSession, sfDir: String, expDir: String): Unit = {
    val sf = "sf([0-9.]+)".r.findFirstMatchIn(sfDir).map(_.group(1).toDouble).getOrElse(0.001)
    val nDocs = math.max(2, (sf * 2000).toInt)
    val seed = 42L
    val linesPerDoc = 500

    val routeAcc = mutable.Map.empty[String, Long]
    val envAcc = mutable.Map.empty[String, (Long, Long)]
    val kills = Vector.newBuilder[SimExpectations.KillRow]
    val caps = Vector.newBuilder[SimExpectations.CaptureRow]
    val lobbies = Vector.newBuilder[SimExpectations.LobbyRow]
    val dims = Vector.newBuilder[Row]
    val chats = Vector.newBuilder[Row]
    val players = Vector.newBuilder[Row]
    val jsons = Vector.newBuilder[Row]
    val composed = Vector.newBuilder[Row]
    val medicStream = Vector.newBuilder[Row]

    for (docId <- 0L until nDocs.toLong) {
      val docKey = f"log-$docId%06d"
      val lines = LogGen.docLines(seed, docId, linesPerDoc)
      SimExpectations.routeCounts(lines, routeAcc)
      SimExpectations.envelopeCounts(lines, envAcc)
      kills ++= SimExpectations.typedKills(docKey, lines)
      caps ++= SimExpectations.captures(docKey, lines)
      lobbies ++= SimExpectations.lobby(docKey, lines)

      val sim = ReferenceSim.run(lines)
      require(!sim.hardError, s"$docKey: sim hard error (generator bug)")
      sim.subjects.foreach { s =>
        dims += Row(docKey, s.sid, s.dataKind.toLong, s.name,
          if (s.dataKind == 1) s.steam64 else -1L, s.firstLine)
      }
      sim.chat.foreach { c =>
        chats += Row(docKey, c.lineNo, c.time, c.name, c.steam64, c.message, c.chatType)
      }
      jsons += Row(docKey, SimExpectations.renderDocJson(sim))
      val hd = SimExpectations.composedDamage(lines)
      sim.subjects.foreach { s =>
        if (graft.expr.Steam.packedKind(s.sid) == 1) {
          val acct = graft.expr.Steam.packedValue(s.sid)
          val (d, l) = hd.getOrElse(s.sid, (-1L, -1L))
          composed += Row(docKey, graft.expr.Steam.steam3(acct),
            graft.expr.Steam.steam64(acct), s.name, d, l)
        }
      }

      // streaming medic module universe: PLAYER subjects with >=1 surviving
      // medic-typed line (the query filters to the same universe)
      val medicActive = SimExpectations.medicActiveSids(lines)
      sim.perPlayer.foreach { p =>
        val sid = (graft.expr.Steam.K_PLAYER << 32) | p.account
        if (medicActive.contains(sid)) {
          val m = p.medicEngine
          medicStream += Row(docKey, sid,
            m.advantagesLost, canonF(m.biggestAdvantageLost), m.nearFullChargeDeath,
            m.deathsAfterUber, canonF(m.avgTimeBeforeHealing), canonF(m.avgTimeToBuild),
            canonF(m.avgTimeToUse), canonF(m.avgUberLength), m.chargeCount, m.drops)
        }
      }

      val nameBySid = sim.subjects.map(s => s.sid -> s.name).toMap
      sim.perPlayer.foreach { p =>
        val sid = (graft.expr.Steam.K_PLAYER << 32) | p.account
        val heals = p.heals.map { case (s3, v) => s"$s3:$v" }.mkString(";")
        val m = p.medicEngine
        players += Row(
          Seq[Any](
            docKey, p.steam3, p.steam64, nameBySid.getOrElse(sid, ""), heals,
            m.advantagesLost, canonF(m.biggestAdvantageLost), m.nearFullChargeDeath,
            m.deathsAfterUber, canonF(m.avgTimeBeforeHealing), canonF(m.avgTimeToBuild),
            canonF(m.avgTimeToUse), canonF(m.avgUberLength), m.chargeCount, m.drops
          ) ++ p.kills ++ p.deaths ++ p.assists ++ p.damage: _*
        )
      }
    }

    import spark.implicits._
    def save(df: org.apache.spark.sql.DataFrame, name: String): Unit =
      df.coalesce(1).write.mode("overwrite").parquet(s"$expDir/$name")

    save(routeAcc.toSeq.toDF("route", "n"), "tf_route_counts")
    save(
      envAcc.toSeq.map { case (k, (n, t)) => (k, n, t) }.toDF("event_type", "n", "n_tokens"),
      "tf_envelope"
    )
    save(spark.createDataset(kills.result()).toDF(), "tf_typed_kills")
    save(spark.createDataset(caps.result()).toDF(), "tf_captures")
    save(spark.createDataset(lobbies.result()).toDF(), "tf_lobby")

    val jsonSchema = StructType(Seq(
      StructField("doc_id", StringType), StructField("json", StringType)
    ))
    save(spark.createDataFrame(spark.sparkContext.parallelize(jsons.result(), 1), jsonSchema), "tf_json")

    val composedSchema = StructType(Seq(
      StructField("doc_id", StringType), StructField("steam3", StringType),
      StructField("steam64", LongType), StructField("name", StringType),
      StructField("hd_damage", LongType), StructField("hd_line", LongType)
    ))
    save(
      spark.createDataFrame(spark.sparkContext.parallelize(composed.result(), 1), composedSchema),
      "tf_composed"
    )

    val medicStreamSchema = StructType(Seq(
      StructField("doc_id", StringType), StructField("sid", LongType),
      StructField("advantages_lost", LongType),
      StructField("biggest_advantage_lost", FloatType),
      StructField("near_full_charge_death", LongType),
      StructField("deaths_after_uber", LongType),
      StructField("avg_time_before_healing", FloatType),
      StructField("avg_time_to_build", FloatType),
      StructField("avg_time_to_use", FloatType),
      StructField("avg_uber_length", FloatType),
      StructField("charge_count", LongType),
      StructField("drops", LongType)
    ))
    save(
      spark.createDataFrame(spark.sparkContext.parallelize(medicStream.result(), 1), medicStreamSchema),
      "tf_medic_stream"
    )

    val dimSchema = StructType(Seq(
      StructField("doc_id", StringType), StructField("sid", LongType),
      StructField("data_kind", LongType), StructField("name", StringType),
      StructField("steam64", LongType), StructField("first_line", LongType)
    ))
    save(spark.createDataFrame(spark.sparkContext.parallelize(dims.result(), 1), dimSchema), "tf_subject_dim")

    val chatSchema = StructType(Seq(
      StructField("doc_id", StringType), StructField("line_no", LongType),
      StructField("time", LongType), StructField("name", StringType),
      StructField("steam_id", LongType), StructField("message", StringType),
      StructField("chat_type", StringType)
    ))
    save(spark.createDataFrame(spark.sparkContext.parallelize(chats.result(), 1), chatSchema), "tf_chat")

    val ppSchema = StructType(
      Seq(
        StructField("doc_id", StringType), StructField("steam3", StringType),
        StructField("steam64", LongType), StructField("name", StringType),
        StructField("heals", StringType),
        StructField("m_advantages_lost", LongType),
        StructField("m_biggest_advantage_lost", FloatType),
        StructField("m_near_full_charge_death", LongType),
        StructField("m_deaths_after_uber", LongType),
        StructField("m_avg_time_before_healing", FloatType),
        StructField("m_avg_time_to_build", FloatType),
        StructField("m_avg_time_to_use", FloatType),
        StructField("m_avg_uber_length", FloatType),
        StructField("m_charge_count", LongType),
        StructField("m_drops", LongType)
      ) ++ Seq("k", "d", "a", "g").flatMap(p => (0 until 10).map(i => StructField(s"$p$i", LongType)))
    )
    save(spark.createDataFrame(spark.sparkContext.parallelize(players.result(), 1), ppSchema), "tf_per_player")
  }

  def main(args: Array[String]): Unit = {
    // optional 3rd arg: comma-separated query-name subset (fast local
    // iteration on one query; the driver always runs the full set)
    val (sfDir, outDir, only) = args match {
      case Array(s, o)       => (s, o, None)
      case Array(s, o, subset) => (s, o, Some(subset.split(',').toSet))
    }
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val spark = SparkSession.builder()
      .master(sys.props.getOrElse("spark.master", s"local[$cpus]"))
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    new java.io.File(outDir).mkdirs()
    SparkEntry.queries.foreach { case (name, fn) =>
      if (only.forall(_.contains(name))) {
        try fn(spark, sfDir).coalesce(1).write.mode("overwrite")
          .parquet(s"$outDir/$name")
        catch { case e: Throwable =>
          System.err.println(s"[verify] $name failed: ${e.getMessage}")
        }
      }
    }

    // SIBLING of outDir, not inside it: the driver enumerates outDir's
    // subdirectories as queries, and the expectation dump must not show up
    // as a 36th pseudo-query with no oracle
    val expDir = new java.io.File(outDir).getAbsolutePath.stripSuffix("/") + "_expected"
    if (only.forall(_.exists(_.startsWith("tf_")))) {
      try writeExpectations(spark, sfDir, expDir)
      catch { case e: Throwable => System.err.println(s"[verify] expectations failed: ${e.getMessage}") }
    }

    // JSON string escape: backslash, quote, and ALL control chars (<0x20)
    // — a tab or CR in builder-authored SQL would otherwise make the
    // driver's json.load fail and silently zero the round's correctness.
    def q(s: String): String = "\"" + s.flatMap {
      case '"'  => "\\\""
      case '\\' => "\\\\"
      case '\n' => "\\n"
      case '\r' => "\\r"
      case '\t' => "\\t"
      case c if c < ' ' => f"\\u${c.toInt}%04x"
      case c => c.toString
    } + "\""
    val json = SparkEntry.oracleSql
      .map { case (k, v) => s"${q(k)}: ${q(v.replace("__EXP__", expDir))}" }
      .mkString("{", ",", "}")
    Files.writeString(Paths.get(s"$outDir/oracle_sql.json"), json)
    spark.stop()
  }
}
