package graft.loggen

import org.apache.spark.sql.{Dataset, SparkSession}

/** One row of the engine's source table (BASELINE.json input_hint):
  * pre-tokenized log line; token = Unicode codepoint (deterministic,
  * invertible). `line_no` carries the in-document order the windowed
  * operators require (SURVEY.md §7 risk 2).
  */
case class SeqRow(
    doc_id: String,
    line_no: Long,
    source: String,
    tokens: Array[Int],
    n_tok: Int
)

/** Deterministic synthetic TF2-grammar log generator (seed-stable regardless
  * of partitioning: every doc derives its own rng stream from (seed, docId)).
  *
  * Emits the reference's line grammar (FIXTURES.md §1) with the measured event
  * mix of log_2892242 (FIXTURES.md §3) plus edge cases: names containing '<'
  * and '"', junk short lines, unknown events, overflowing integer literals,
  * damage outside (0,1500), truncated final lines, combined-log corruption.
  */
object LogGen {

  // -- splitmix64 ----------------------------------------------------------
  final class Rng(seed0: Long) {
    private var x = seed0
    def nextLong(): Long = {
      x += 0x9e3779b97f4a7c15L
      var z = x
      z = (z ^ (z >>> 30)) * 0xbf58476d1ce4e5b9L
      z = (z ^ (z >>> 27)) * 0x94d049bb133111ebL
      z ^ (z >>> 31)
    }
    def nextInt(bound: Int): Int = (Math.floorMod(nextLong(), bound.toLong)).toInt
    def nextDouble(): Double = (nextLong() >>> 11) * 1.1102230246251565e-16
    def chance(p: Double): Boolean = nextDouble() < p
  }

  private val firstNames = Array(
    "Liko", "dr/tr", "P0PZEE", "TC159", "b4rney", "Nata", "makxbi", "Fin",
    "sorry, squidie", "Electra<3", "Buddie :\")", "wG.sigafoo", "kaidus",
    "shade", "numlocked", "Mike", "degu", "onbekend", "Hildreth", "Clark"
  )
  private val weapons = Array(
    "scattergun", "tf_projectile_rocket", "sniperrifle", "flamethrower",
    "minigun", "ubersaw", "knife", "world", "obj_sentrygun", "iron_bomber"
  )
  private val classes = Array(
    "Scout", "Soldier", "Pyro", "Demoman", "Heavy", "Engineer", "Medic",
    "Sniper", "Spy"
  )
  private val maps = Array("cp_gullywash_final1", "cp_process_final", "koth_product_rcx")

  final case class Player(
      name: String,
      userId: Int,
      account: Long,
      team: String,
      var clazz: String,
      isBot: Boolean = false
  ) {
    // bots carry the literal BOT steam field (SubjectData::Bot path,
    // common.rs:318-321): interned by numeric user_id, excluded from
    // per-player output
    def raw: String =
      if (isBot) s"$name<$userId><BOT><$team>" else s"$name<$userId><[U:1:$account]><$team>"
  }

  /** All lines of one synthetic match log (without the "L " prefix). */
  def docLines(seed: Long, docId: Long, targetLines: Int): Vector[String] = {
    val rng = new Rng(seed ^ (docId * 0x5851f42d4c957f2dL))
    val out = Vector.newBuilder[String]
    // seconds within the fixed day 04/11/2021, low enough not to wrap midnight
    var t: Long = 50000L + rng.nextInt(5000)

    def ts: String = {
      val dayS = Math.floorMod(t, 86400L)
      val h = dayS / 3600; val m = (dayS % 3600) / 60; val s = dayS % 60
      f"04/11/2021 - $h%02d:$m%02d:$s%02d"
    }
    def emit(rest: String): Unit = out += s"$ts: $rest"

    // roster: 6-12 players
    val nPlayers = 6 + rng.nextInt(7)
    val players = (0 until nPlayers).map { i =>
      Player(
        firstNames((rng.nextInt(firstNames.length) + i) % firstNames.length) +
          (if (rng.chance(0.3)) s"_$i" else ""),
        userId = 2 + i,
        account = 1000000L + rng.nextInt(900000000) + i,
        team = if (i % 2 == 0) "Red" else "Blue",
        clazz = classes(rng.nextInt(classes.length)),
        isBot = rng.chance(0.12) // ~1 bot per lobby: Bot subject-kind path
      )
    }.toArray
    val medics = players.filter(_.clazz == "Medic")
    def anyPlayer(): Player = players(rng.nextInt(players.length))

    // ---- preamble
    emit("""Log file started (file "logs/L0411002.log") (game "/home/tf2/tf") (version "6300758")""")
    emit(s""""Console<0><Console><Console>" say "TF2Center Lobby #${1000000 + rng.nextInt(
        900000
      )} | ${500000000 + rng.nextInt(99999999)}"""")
    emit(s""""Console<0><Console><Console>" say "Map: ${maps(rng.nextInt(maps.length))}"""")
    if (rng.chance(0.5))
      emit("Tournament mode started\nBlue Team: BLU\nRed Team: RED")
    players.foreach { p =>
      emit(s""""${p.name}<${p.userId}><[U:1:${p.account}]><>" connected, address "10.0.${rng
          .nextInt(255)}.${rng.nextInt(255)}:27005"""")
      t += (if (rng.chance(0.3)) 1 else 0)
      emit(s""""${p.name}<${p.userId}><[U:1:${p.account}]><>" STEAM USERID validated""")
      emit(s""""${p.name}<${p.userId}><[U:1:${p.account}]><>" entered the game""")
      emit(s""""${p.name}<${p.userId}><[U:1:${p.account}]><Unassigned>" joined team "${p.team}"""")
      emit(s""""${p.raw}" spawned as "${p.clazz}"""")
    }

    var linesLeft = targetLines - out.result().size
    var roundOpen = false
    var lastUber = Map.empty[Int, Long]

    def pos(): String = s"${rng.nextInt(4000) - 2000} ${rng.nextInt(4000) - 2000} ${rng.nextInt(600)}"

    while (linesLeft > 0) {
      t += rng.nextInt(8)
      val r = rng.nextDouble()
      if (!roundOpen && rng.chance(0.1)) {
        emit("""World triggered "Round_Start"""")
        roundOpen = true
      } else if (roundOpen && rng.chance(0.02)) {
        val w = if (rng.chance(0.5)) "Red" else "Blue"
        emit(s"""World triggered "Round_Win" (winner "$w")""")
        emit(s"""World triggered "Round_Length" (seconds "${60 + rng.nextInt(500)}.${rng.nextInt(10)}")""")
        emit(s"""Team "Red" current score "${rng.nextInt(5)}" with "${nPlayers / 2}" players""")
        emit(s"""Team "Blue" current score "${rng.nextInt(5)}" with "${nPlayers / 2}" players""")
        roundOpen = false
      } else if (r < 0.34) { // healed (34%)
        val healer = if (medics.nonEmpty && rng.chance(0.8)) medics(rng.nextInt(medics.length)) else anyPlayer()
        val target = anyPlayer()
        val amount =
          if (rng.chance(0.002)) "99999999999" // u32 overflow clamp path
          else (1 + rng.nextInt(150)).toString
        emit(s""""${healer.raw}" triggered "healed" against "${target.raw}" (healing "$amount")""")
      } else if (r < 0.67) { // damage (33%)
        val a = anyPlayer(); val v = anyPlayer()
        val dmg =
          if (rng.chance(0.01)) (1500 + rng.nextInt(3000)).toString // outside gate
          else if (rng.chance(0.005)) "0"
          else (1 + rng.nextInt(120)).toString
        val real = if (rng.chance(0.3)) s""" (realdamage "${1 + rng.nextInt(90)}")""" else ""
        emit(
          s""""${a.raw}" triggered "damage" against "${v.raw}" (damage "$dmg")$real (weapon "${weapons(
              rng.nextInt(weapons.length)
            )}")"""
        )
      } else if (r < 0.72) { // kill + maybe assist
        val a = anyPlayer(); val v = anyPlayer()
        emit(
          s""""${a.raw}" killed "${v.raw}" with "${weapons(rng.nextInt(weapons.length))}" (attacker_position "${pos()}") (victim_position "${pos()}")"""
        )
        if (rng.chance(0.4)) {
          val h = anyPlayer()
          emit(
            s""""${h.raw}" triggered "kill assist" against "${v.raw}" (assister_position "${pos()}") (attacker_position "${pos()}") (victim_position "${pos()}")"""
          )
        }
        if (rng.chance(0.1))
          emit(s""""${a.raw}" triggered "domination" against "${v.raw}"""")
        if (rng.chance(0.05))
          emit(s""""${v.raw}" triggered "revenge" against "${a.raw}"""")
        // respawn with possible class change
        if (rng.chance(0.5)) {
          if (rng.chance(0.2)) v.clazz = classes(rng.nextInt(classes.length))
          emit(s""""${v.raw}" spawned as "${v.clazz}"""")
        }
      } else if (r < 0.80 && medics.nonEmpty) { // medic machinery
        val m = medics(rng.nextInt(medics.length))
        rng.nextInt(6) match {
          case 0 =>
            emit(s""""${m.raw}" triggered "first_heal_after_spawn" (time "${rng.nextInt(20)}.${rng.nextInt(10)}")""")
          case 1 => emit(s""""${m.raw}" triggered "chargeready"""")
          case 2 =>
            emit(s""""${m.raw}" triggered "chargedeployed" (medigun "medigun")""")
          case 3 =>
            emit(s""""${m.raw}" triggered "chargeended" (duration "${1 + rng.nextInt(8)}.${rng.nextInt(10)}")""")
            lastUber += (m.userId -> t)
          case 4 =>
            emit(s""""${m.raw}" triggered "lost_uber_advantage" (time "${5 + rng.nextInt(40)}")""")
          case 5 =>
            val killer = anyPlayer()
            val charge = rng.nextInt(4) match {
              case 0 => rng.nextInt(95)
              case 1 => 95 + rng.nextInt(5)
              case 2 => 100
              case _ => rng.nextInt(101)
            }
            emit(s""""${killer.raw}" triggered "medic_death" against "${m.raw}" (healing "${rng.nextInt(3000)}") (ubercharge "$charge")""")
            emit(s""""${m.raw}" triggered "medic_death_ex" (uberpct "${rng.nextInt(100)}")""")
        }
      } else if (r < 0.85) { // chat
        val p = anyPlayer()
        val msgs = Array("gg", "nice shot", "gl hf", "ns", "lol \"quoted\"", "go go go")
        val kind = if (rng.chance(0.4)) "say_team" else "say"
        emit(s""""${p.raw}" $kind "${msgs(rng.nextInt(msgs.length))}"""")
      } else if (r < 0.88) { // role change / spawn
        val p = anyPlayer()
        if (rng.chance(0.4)) p.clazz = classes(rng.nextInt(classes.length))
        if (rng.chance(0.5)) emit(s""""${p.raw}" changed role to "${p.clazz}"""")
        else emit(s""""${p.raw}" spawned as "${p.clazz}"""")
      } else if (r < 0.90 && roundOpen) { // captures
        val team = if (rng.chance(0.5)) "Red" else "Blue"
        val cappers = 1 + rng.nextInt(3)
        val pp = (1 to cappers)
          .map { i =>
            val p = anyPlayer()
            s"""(player$i "${p.raw}") (position$i "${pos()}")"""
          }
          .mkString(" ")
        emit(s"""Team "$team" triggered "pointcaptured" (cp "${rng.nextInt(5)}") (cpname "#cap_${rng.nextInt(5)}") (numcappers "$cappers") $pp""")
      } else if (r < 0.92) { // object / misc events
        val p = anyPlayer()
        rng.nextInt(6) match {
          case 0 => emit(s""""${p.raw}" triggered "player_builtobject" (object "OBJ_SENTRYGUN") (position "${pos()}")""")
          case 1 => emit(s""""${p.raw}" triggered "killedobject" (object "OBJ_SENTRYGUN") (weapon "knife") (objectowner "${anyPlayer().raw}") (attacker_position "${pos()}")""")
          case 2 => emit(s""""${p.raw}" triggered "player_extinguished" against "${anyPlayer().raw}" with "tf_weapon_medigun" (attacker_position "${pos()}") (victim_position "${pos()}")""")
          case 3 => emit(s""""${p.raw}" committed suicide with "world" (attacker_position "${pos()}")""")
          case 4 => emit(s""""${p.raw}" picked up item "ammopack_small"""")
          case 5 => emit(s""""${p.raw}" triggered "shot_fired" (weapon "scattergun")""")
        }
      } else if (r < 0.94) { // junk / edge lines
        rng.nextInt(16) match {
          case 0 => out += "short junk" // envelope Skip (<24 chars)
          case 1 => emit(s""""${anyPlayer().raw}" triggered "mysterious_event" (x "1")""") // unknown
          case 2 => emit(s"""World triggered "Game_Paused"""")
          case 3 => emit(s"""World triggered "Game_Unpaused"""")
          case 4 =>
            // combined-log corruption, recovery path (a): a truncated KILL
            // line (required-field error) whose params embed a same-date
            // line start -> silently dropped (lib.rs:77-79)
            val a = anyPlayer()
            // no closing quote anywhere after `killed "` -> required-field
            // (weapon) parse error; params embed a same-date line start
            emit(s""""${a.raw}" killed ${'"'}garbage L 04/11/2021 - 09:00:00 tail""")
          case 5 =>
            // recovery path (b): truncated kill, then a >60s time jump to the
            // next line -> BOTH lines dropped (lib.rs:81-96)
            val a = anyPlayer(); val v = anyPlayer()
            emit(s""""${a.raw}" killed ${'"'}${v.raw.stripSuffix(">")}""")
            t += 70
            emit(s""""${anyPlayer().raw}" spawned as "Scout"""") // consumed+dropped
          case 6 =>
            // malformed player subject (no <uid><steam><team> parts):
            // MalformedPlayer interning, excluded from per-player output
            emit(s""""mystery entity ${rng.nextInt(10)}" say "who am i"""")
          case 7 =>
            // medic_death without ubercharge: charge defaults to 0
            emit(s""""${anyPlayer().raw}" triggered "medic_death" against "${anyPlayer().raw}" (healing "${rng.nextInt(500)}")""")
          case 8 =>
            // empty chat message (empty quoted text is a legal say)
            emit(s""""${anyPlayer().raw}" say ""${""}""")
          case 9 =>
            // console team chat: handled type, non-player subject -> dropped
            // by the chat module's player filter (chat.rs:59-61)
            emit(""""Console<0><Console><Console>" say_team "server team msg"""")
          case 10 =>
            // ADJACENT-ERROR CHAIN (lib.rs:81-99 sequential consumption):
            // errA consumes errB (B's own error is never evaluated; raw-date
            // gap >60s -> both silently dropped), then the following line is
            // processed NORMALLY -- a one-step-lookbehind formulation would
            // wrongly treat B as consuming it and hard-error the doc
            emit(s""""${anyPlayer().raw}" killed ${'"'}chain-a""")
            t += 70
            emit(s""""${anyPlayer().raw}" killed ${'"'}chain-b""")
            t += 5
            // unhandled event: survives routing, no module-stats impact
            emit(s""""${anyPlayer().raw}" picked up item "medkit_small"""")
          case 11 =>
            // classstats self-kill edge (classstats.rs:81-88): an attacker
            // with NO prior entry (never spawned / never a kill target)
            // self-kills during an active round -- the reference reads the
            // attacker entry BEFORE data_mut creates the target entry, so
            // the kill counts (vs the just-created default class) but the
            // death does NOT (batch/stream/sim must all agree)
            if (!roundOpen) { emit("""World triggered "Round_Start""""); roundOpen = true }
            val g = Player(s"ghost_${rng.nextInt(100)}", 90 + rng.nextInt(9),
              999000000L + rng.nextInt(1000), "Red", "Scout")
            emit(s""""${g.raw}" killed "${g.raw}" with "world" (attacker_position "${pos()}") (victim_position "${pos()}")""")
          case 12 =>
            // same edge, non-self variant: unspawned attacker kills an
            // existing player -- kill counts by the victim's class, the
            // victim's death is NOT counted (attacker has no entry)
            if (!roundOpen) { emit("""World triggered "Round_Start""""); roundOpen = true }
            val g = Player(s"ghost_${rng.nextInt(100)}", 90 + rng.nextInt(9),
              999100000L + rng.nextInt(1000), "Blue", "Scout")
            emit(s""""${g.raw}" killed "${anyPlayer().raw}" with "world" (attacker_position "${pos()}") (victim_position "${pos()}")""")
          case 13 =>
            // SubjectData-id divergence (b): user_id overflows u16, steam3
            // valid -> interned Player(acct) (the `:digits]` fast path never
            // reads the uid, common.rs:237-242) but SubjectData =
            // MalformedPlayer (u16 parse fails, common.rs:320) -> the
            // finalize deaths lookup (classstats.rs:119) deterministically
            // MISSES: kills accrue, deaths stay zero
            if (!roundOpen) { emit("""World triggered "Round_Start""""); roundOpen = true }
            val uidBig = 70000 + rng.nextInt(30000)
            val acct = 998000000L + rng.nextInt(1000)
            val praw = s"uid_overflow<$uidBig><[U:1:$acct]><Red>"
            val k = anyPlayer()
            emit(s""""$praw" spawned as "Sniper"""")
            emit(s""""$praw" killed "${k.raw}" with "sniperrifle" (attacker_position "${pos()}") (victim_position "${pos()}")""")
            emit(s""""${k.raw}" killed "$praw" with "knife" (attacker_position "${pos()}") (victim_position "${pos()}")""")
          case 14 =>
            // SubjectData-id divergence (c): trailing junk after the steam3
            // bracket -> interned Player(acct) via the fast scan, but
            // SubjectData's strict steam3/steam2 parses fail -> Bot(uid)
            // (common.rs:324-328); the finalize lookup then CLAIMS the
            // interned Bot(uid) bucket -- a roster bot's deaths when uids
            // collide (remove() transfer, classstats.rs:119)
            if (!roundOpen) { emit("""World triggered "Round_Start""""); roundOpen = true }
            val bots = players.filter(_.isBot)
            val uid = if (bots.nonEmpty) bots(0).userId else 55
            val acct = 997000000L + rng.nextInt(1000)
            val praw = s"junk_steam<$uid><[U:1:$acct]x><Blue>"
            if (bots.nonEmpty)
              emit(s""""${anyPlayer().raw}" killed "${bots(0).raw}" with "world" (attacker_position "${pos()}") (victim_position "${pos()}")""")
            emit(s""""$praw" say "borrowed identity"""")
          case 15 =>
            // SubjectData-id divergence (d): the TEAM field embeds ':N]' so
            // the interning fast scan (rightmost ']' then rightmost ':')
            // reads N from the team while SubjectData parses the real steam
            // field -> interned Player(freshAcct), data id Player(existing
            // account). The existing player was first-seen earlier, so IT
            // keeps its deaths bucket and the impostor's lookup finds the
            // bucket already removed -> zeros (first-claimant-wins)
            val victim = anyPlayer()
            val freshAcct = 996000000L + rng.nextInt(1000)
            val praw = s"team_trick<9><[U:1:${victim.account}]><R:${freshAcct}]d>"
            emit(s""""$praw" say "second claimant"""")
        }
      } else { // disconnect/reconnect churn
        val p = anyPlayer()
        emit(s""""${p.raw}" disconnected (reason "client left")""")
        emit(s""""${p.name}<${p.userId}><[U:1:${p.account}]><>" connected, address "10.0.0.1:27005"""")
        emit(s""""${p.raw}" spawned as "${p.clazz}"""")
      }
      linesLeft = targetLines - out.result().size
    }
    emit("""World triggered "Game_Over" reason "Reached Win Limit"""")
    emit("""Team "Red" final score "5" with "6" players""")
    emit("""Team "Blue" final score "2" with "6" players""")
    emit("Log file closed")
    out.result()
  }

  def tokenize(line: String): Array[Int] = line.codePoints().toArray

  /** Distributed generation of the tokenized-sequence table. Source ids are
    * skewed (a few hot sources) to exercise salting/AQE per the north rule. */
  def generate(spark: SparkSession, nDocs: Int, linesPerDoc: Int, seed: Long): Dataset[SeqRow] = {
    import spark.implicits._
    spark
      .range(0, nDocs.toLong, 1, math.min(nDocs, 128)) // >=4 task waves on 32 cores: straggler smoothing
      .as[Long]
      .flatMap { docId =>
        val rng = new Rng(seed ^ docId)
        // skew: 60% of docs map to 3 hot sources, rest uniform over 97
        val source =
          if (rng.chance(0.6)) s"src-${rng.nextInt(3)}"
          else s"src-${3 + rng.nextInt(97)}"
        val lines = docLines(seed, docId, linesPerDoc)
        lines.zipWithIndex.map { case (line, i) =>
          val toks = tokenize(line)
          SeqRow(f"log-$docId%06d", i.toLong, source, toks, toks.length)
        }
      }
  }
}
