package graft

import java.sql.Timestamp

import org.apache.spark.sql.functions._

import graft.operators.{Analytics, Layout}

/** Funnel, cohort retention, and compaction planning on hand-computable
  * fixtures: the strict sequential anchoring (stage k within the horizon
  * of stage k-1's MATCH, not of stage 1) is the part worth pinning. */
class AnalyticsSpec extends SparkTestBase {
  import spark.implicits._

  private def ts(s: String): Timestamp = Timestamp.valueOf(s)

  test("funnel anchors each stage at the previous stage's match") {
    val events = Seq(
      // u1: view 10:00, click 10:30, purchase 11:15 — purchase is within
      // 1h of the CLICK (anchor), though 75min after the view: converts
      (1L, "view", ts("2026-01-01 10:00:00")),
      (1L, "click", ts("2026-01-01 10:30:00")),
      (1L, "purchase", ts("2026-01-01 11:15:00")),
      // u2: click BEFORE the first view never matches; the later click does
      (2L, "click", ts("2026-01-01 09:00:00")),
      (2L, "view", ts("2026-01-01 10:00:00")),
      (2L, "click", ts("2026-01-01 10:45:00")),
      // u2's purchase is 61min after its click anchor: does NOT convert
      (2L, "purchase", ts("2026-01-01 11:46:00")),
      // u3: purchase only — not even stage 1
      (3L, "purchase", ts("2026-01-01 10:00:00")),
      // u4: view then nothing
      (4L, "view", ts("2026-01-01 12:00:00")))
      .toDF("user_id", "event_type", "ts")
    val got = Analytics.funnel(events, "user_id", "event_type", "ts",
        Seq("view", "click", "purchase"), horizonMicros = 3600L * 1000000L)
      .as[(Int, String, Long)].collect().toSeq
    assert(got == Seq((1, "view", 3L), (2, "click", 2L), (3, "purchase", 1L)))
  }

  test("funnelSegmented partitions users by segment and sums back to the global funnel") {
    val events = Seq(
      // segment A: u1 fully converts, u4 stalls at view
      (1L, "A", "view", ts("2026-01-01 10:00:00")),
      (1L, "A", "click", ts("2026-01-01 10:30:00")),
      (1L, "A", "purchase", ts("2026-01-01 11:15:00")),
      (4L, "A", "view", ts("2026-01-01 12:00:00")),
      // segment B: u2 reaches click only (purchase past the click anchor's horizon)
      (2L, "B", "view", ts("2026-01-01 10:00:00")),
      (2L, "B", "click", ts("2026-01-01 10:45:00")),
      (2L, "B", "purchase", ts("2026-01-01 11:46:00")))
      .toDF("user_id", "segment", "event_type", "ts")
    val got = Analytics.funnelSegmented(events, "user_id", "segment",
        "event_type", "ts", Seq("view", "click", "purchase"),
        horizonMicros = 3600L * 1000000L)
      .as[(String, Int, String, Long)].collect().toSeq
    assert(got == Seq(
      ("A", 1, "view", 2L), ("A", 2, "click", 1L), ("A", 3, "purchase", 1L),
      ("B", 1, "view", 1L), ("B", 2, "click", 1L), ("B", 3, "purchase", 0L)))
    // per-stage sums across segments == the unsegmented funnel on the same events
    val global = Analytics.funnel(events, "user_id", "event_type", "ts",
        Seq("view", "click", "purchase"), horizonMicros = 3600L * 1000000L)
      .as[(Int, String, Long)].collect().map(r => (r._1, r._3)).toMap
    val summed = got.groupBy(_._2).map { case (st, rs) => (st, rs.map(_._4).sum) }
    assert(summed == global)
  }

  test("funnel: simultaneous timestamps count (>= bound is inclusive)") {
    val events = Seq(
      (1L, "view", ts("2026-01-01 10:00:00")),
      (1L, "click", ts("2026-01-01 10:00:00")), // same instant: matches
      (1L, "purchase", ts("2026-01-01 11:00:00"))) // exactly at horizon
      .toDF("user_id", "event_type", "ts")
    val got = Analytics.funnel(events, "user_id", "event_type", "ts",
        Seq("view", "click", "purchase"), horizonMicros = 3600L * 1000000L)
      .as[(Int, String, Long)].collect().toSeq
    assert(got.map(_._3) == Seq(1L, 1L, 1L))
  }

  test("sessionize cuts on strict gap > threshold and shares sessions across ties") {
    val gap = 30L * 60 * 1000000 // 30 min
    val events = Seq(
      // u1: 10:00, 10:29 (in), 10:59 (gap EXACTLY 30min — inclusive, same
      // session), 11:30 (31min — new session), 11:45
      (1L, ts("2026-01-01 10:00:00")),
      (1L, ts("2026-01-01 10:29:00")),
      (1L, ts("2026-01-01 10:59:00")),
      (1L, ts("2026-01-01 11:30:00")),
      (1L, ts("2026-01-01 11:45:00")),
      // u2: tied timestamps share a session; the tie is the session start
      (2L, ts("2026-01-01 09:00:00")),
      (2L, ts("2026-01-01 09:00:00")),
      (2L, ts("2026-01-01 09:20:00")),
      // u3: single event = single session
      (3L, ts("2026-01-01 08:00:00")))
      .toDF("user_id", "ts")
    val got = Analytics.sessionize(events, "user_id", "ts", gap)
      .groupBy("user_id", "session_no").count()
      .as[(Long, Long, Long)].collect().toSet
    assert(got == Set((1L, 1L, 3L), (1L, 2L, 2L), (2L, 1L, 3L), (3L, 1L, 1L)))
  }

  test("sessionize agrees with a driver-side replay on random event sets") {
    val rnd = new scala.util.Random(64)
    val gap = 1000L // micros
    val rows = Seq.tabulate(400) { _ =>
      (rnd.nextInt(12).toLong, new Timestamp(rnd.nextInt(2000).toLong))
    }
    val got = Analytics.sessionize(rows.toDF("user_id", "ts"), "user_id", "ts", gap)
      .select(col("user_id"), unix_micros(col("ts")), col("session_no"))
      .as[(Long, Long, Long)].collect().toSet
    val expected = rows.groupBy(_._1).flatMap { case (u, es) =>
      val sorted = es.map(_._2.getTime * 1000).sorted
      val bounds = sorted.zip(Long.MinValue +: sorted.dropRight(1))
      var s = 0L
      val byTs = bounds.map { case (t, prev) =>
        if (prev == Long.MinValue || t - prev > gap) s += 1
        t -> s
      }.toMap // ties: last assignment wins == shared RANGE-frame value
      sorted.map(t => (u, t, byTs(t)))
    }.toSet
    assert(got == expected)
  }

  test("cohortRetention buckets by first activity and counts distinct members") {
    val events = Seq(
      // u1 first in bucket of Jan-01 (day 20454 -> bucket 2922), active
      // again 2 buckets later; two events in one bucket count once
      (1L, ts("2026-01-01 10:00:00")),
      (1L, ts("2026-01-02 10:00:00")),
      (1L, ts("2026-01-15 10:00:00")),
      // u2 same cohort, only the first bucket
      (2L, ts("2026-01-03 10:00:00")),
      // u3 cohorted one bucket later
      (3L, ts("2026-01-08 10:00:00")))
      .toDF("user_id", "ts")
    val got = Analytics.cohortRetention(events, "user_id", "ts", bucketDays = 7)
      .as[(Long, Long, Long)].collect().toSeq
    val byCohort = got.groupBy(_._1)
    assert(byCohort.size == 2)
    val (c0, c1) = (byCohort.keys.min, byCohort.keys.max)
    assert(c1 == c0 + 1)
    assert(got.filter(_._1 == c0).map(t => (t._2, t._3)).toSet ==
      Set((0L, 2L), (2L, 1L)))
    assert(got.filter(_._1 == c1).map(t => (t._2, t._3)).toSet == Set((0L, 1L)))
  }

  test("funnel plan grows linearly in stage count (anchors stay projected)") {
    // anchor k references anchor k-1 TWICE inside a filter() lambda, and
    // HOF lambdas defeat CSE — if the anchors get re-inlined instead of
    // staying projected columns, the plan (and per-row work) goes
    // exponential in the stage count. Pin linearity: adding 3 stages must
    // add exactly 3 array_min nodes.
    def planArrayMins(k: Int): Int = {
      val stages = (1 to k).map(i => s"s$i")
      val df = (1 to k).map(i => (1L, s"s$i", ts(f"2026-01-01 00:0$i:00")))
        .toDF("user_id", "event_type", "ts")
      val plan = Analytics.funnel(df, "user_id", "event_type", "ts",
        stages, 600L * 1000000L).queryExecution.optimizedPlan.toString
      "array_min".r.findAllIn(plan).size
    }
    val c3 = planArrayMins(3)
    val c6 = planArrayMins(6)
    assert(c6 - c3 == 3, s"expected linear anchor growth, got $c3 -> $c6")
  }

  test("funnel equals a driver-side replay on random event sets") {
    import org.scalacheck.{Gen, Prop}
    val stages = Seq("s1", "s2", "s3")
    val horizon = 600L * 1000000L // 10 min in micros
    val base = Timestamp.valueOf("2026-01-01 00:00:00").getTime
    val genEvents: Gen[List[(Long, String, Long)]] = for {
      n <- Gen.choose(1, 40)
      es <- Gen.listOfN(n, for {
        u <- Gen.choose(0L, 4L)
        s <- Gen.oneOf(stages)
        m <- Gen.choose(0L, 59L) // minute offset
      } yield (u, s, m))
    } yield es
    PropHelper.check(Prop.forAll(genEvents) { es =>
      val df = es.map { case (u, s, m) =>
        (u, s, new Timestamp(base + m * 60000L)) }
        .toDF("user_id", "event_type", "ts")
      val got = Analytics.funnel(df, "user_id", "event_type", "ts",
          stages, horizon)
        .as[(Int, String, Long)].collect().map(t => t._2 -> t._3).toMap
      // driver-side replay of the anchoring rule
      val byUser = es.groupBy(_._1)
      val micros = (m: Long) => (base + m * 60000L) * 1000L
      val counts = Array(0L, 0L, 0L)
      byUser.values.foreach { ues =>
        val perStage = stages.map(s =>
          ues.filter(_._2 == s).map(e => micros(e._3)).sorted)
        var anchor: Option[Long] = perStage.head.headOption
        var k = 0
        while (k < stages.size && anchor.isDefined) {
          counts(k) += 1
          k += 1
          if (k < stages.size) {
            val a = anchor.get
            anchor = perStage(k).find(t => t >= a && t <= a + horizon)
          }
        }
      }
      got == stages.zipWithIndex.map { case (s, i) => s -> counts(i) }.toMap
    }, minTests = 12)
  }

  test("compactionPlan invariants hold on random listings") {
    import org.scalacheck.{Gen, Prop}
    val genListing: Gen[List[(String, Int, Long)]] = for {
      n <- Gen.choose(1, 30)
      fs <- Gen.listOfN(n, for {
        pt <- Gen.oneOf("a", "b")
        f <- Gen.choose(0, 99)
        bytes <- Gen.choose(1L, 150L)
      } yield (pt, f, bytes))
    } yield fs.distinctBy(e => (e._1, e._2))
    PropHelper.check(Prop.forAll(genListing) { fs =>
      val target = 100L
      val got = Layout.compactionPlan(fs.toDF("pt", "file_id", "bytes"),
          Seq("pt"), "file_id", "bytes", target)
        .select("pt", "file_id", "bytes", "compaction_group")
        .as[(String, Int, Long, Long)].collect().toSeq
      got.groupBy(_._1).forall { case (_, part) =>
        val sorted = part.sortBy(_._2)
        val groups = sorted.map(_._4)
        // groups are non-decreasing in file order, start at 0
        groups.head == 0L && groups.sliding(2).forall {
          case Seq(x, y) => y >= x
          case _ => true
        } &&
        // every group's bytes-before-last-file < target (the prefix-sum
        // rule: a group only ends once the running bytes reach target)
        sorted.groupBy(_._4).values.forall { g =>
          val before = sorted.takeWhile(_._2 < g.head._2).map(_._3).sum
          before / target == g.head._4
        }
      }
    }, minTests = 15)
  }

  test("compactionPlan groups by prefix-sum within each partition") {
    val listing = Seq(
      ("a", 1, 40L), ("a", 2, 40L), ("a", 3, 40L), // before: 0, 40, 80
      ("a", 4, 200L),                              // before: 120 -> group 1
      ("b", 1, 10L))                               // independent partition
      .toDF("pt", "file_id", "bytes")
    val got = Layout.compactionPlan(listing, Seq("pt"), "file_id", "bytes", 100L)
      .select("pt", "file_id", "compaction_group")
      .as[(String, Int, Long)].collect().toSet
    assert(got == Set(
      ("a", 1, 0L), ("a", 2, 0L), ("a", 3, 0L), ("a", 4, 1L), ("b", 1, 0L)))
  }

  test("reclusterPlan: depth equals containing-interval count, inclusive at touch points") {
    // [0,10] and [5,15] overlap; [20,30] is clear of both ([0,10] ends at
    // 11, [5,15] at 16); [10,18] starts exactly at [0,10]'s zmax —
    // inclusive intervals, so it still counts it
    val listing = Seq(
      ("a", "f1", 0L, 10L),
      ("a", "f2", 5L, 15L),
      ("a", "f3", 20L, 30L),
      ("a", "f4", 10L, 18L),
      ("b", "g1", 0L, 100L)) // independent partition
      .toDF("pt", "file_id", "zmin", "zmax")
    val got = Layout.reclusterPlan(listing, Seq("pt"), "file_id",
        "zmin", "zmax", maxDepth = 2)
      .select("pt", "file_id", "depth", "needs_rewrite")
      .as[(String, String, Long, Boolean)].collect().toSet
    assert(got == Set(
      ("a", "f1", 1L, false),  // nothing before it
      ("a", "f2", 2L, false),  // inside f1
      ("a", "f4", 3L, true),   // touches f1's end, inside f2
      ("a", "f3", 1L, false),  // both earlier intervals closed
      ("b", "g1", 1L, false)))
    // files starting at the SAME key must see each other (RANGE peers)
    val tied = Seq(("a", "t1", 7L, 9L), ("a", "t2", 7L, 8L))
      .toDF("pt", "file_id", "zmin", "zmax")
    val depths = Layout.reclusterPlan(tied, Seq("pt"), "file_id",
        "zmin", "zmax", maxDepth = 1)
      .select("file_id", "depth").as[(String, Long)].collect().toMap
    assert(depths == Map("t1" -> 2L, "t2" -> 2L))
    // an inverted or null range must not corrupt other files' depths: the
    // bad row is excluded (no stats -> rewrite upstream), the valid file
    // keeps depth 1
    val bad = Seq(
      ("a", "ok", Some(7L), Some(9L)),
      ("a", "inv", Some(10L), Some(5L)),
      ("a", "nul", None: Option[Long], Some(9L)))
      .toDF("pt", "file_id", "zmin", "zmax")
    val cleaned = Layout.reclusterPlan(bad, Seq("pt"), "file_id",
        "zmin", "zmax", maxDepth = 1)
      .select("file_id", "depth").as[(String, Long)].collect().toMap
    assert(cleaned == Map("ok" -> 1L))
  }

  test("compactionPlan duplicate file ids are not RANGE-frame peers") {
    // under the default RANGE frame the two (1, 100) rows are peers: each
    // running sum includes BOTH, overstating _before for the first peer
    // (both would land in group 1 and group 0 would be empty). The ROWS
    // frame assigns them prefix-sum positions 0 and 100.
    val listing = Seq(("a", 1, 100L), ("a", 1, 100L), ("a", 2, 50L))
      .toDF("pt", "file_id", "bytes")
    val got = Layout.compactionPlan(listing, Seq("pt"), "file_id", "bytes", 100L)
      .select("file_id", "compaction_group")
      .as[(Int, Long)].collect().toSeq.sorted
    assert(got == Seq((1, 0L), (1, 1L), (2, 2L)))
  }

  test("skyline2d matches the brute-force dominance definition") {
    // deterministic pseudo-random points (hash spread), many partitions so
    // the local-prune phase genuinely runs
    val pts = (1 to 400).map { i =>
      (i.toLong, (i * 7919L) % 97, (i * 6271L) % 89)
    }
    val df = pts.toDF("id", "x", "y").repartition(8)
    val got = Analytics.skyline2d(df, "x", "y")
      .select("id").as[Long].collect().toSet
    val expect = pts.filter { case (_, x, y) =>
      !pts.exists { case (_, bx, by) =>
        bx >= x && by <= y && (bx > x || by < y)
      }
    }.map(_._1).toSet
    assert(got == expect, s"skyline mismatch: got $got expect $expect")
  }

  test("skyline2d keeps duplicated frontier points and drops tie-group losers") {
    val df = Seq(
      (1L, 10L, 5L), (2L, 10L, 5L), // duplicate frontier point: both stay
      (3L, 10L, 7L),                // same x, worse y: dominated by 1/2
      (4L, 12L, 6L),                // frontier (best x)
      (5L, 8L, 4L)                  // frontier (best y)
    ).toDF("id", "x", "y")
    val got = Analytics.skyline2d(df, "x", "y").select("id").as[Long].collect().toSet
    assert(got == Set(1L, 2L, 4L, 5L))
  }

  test("throttle anchors at the last KEPT event, not the previous raw event") {
    // gap 15: 0 kept; 10 dropped (10 < 15 from anchor 0); 20 KEPT (20-0
    // >= 15 — a lag-based filter would drop it: 20-10 < 15); 35 kept
    // (35-20 >= 15). The burst case that separates throttle from
    // sessionization.
    val base = 1700000000000000L
    val ev = Seq(0L, 10L, 20L, 35L).zipWithIndex.map { case (off, i) =>
      (1L, "alert", i.toLong, new Timestamp((base + off * 1000000L) / 1000))
    }.toDF("user_id", "kind", "event_id", "ts")
    val kept = Analytics.throttle(ev, Seq("user_id", "kind"), "ts", "event_id",
        minGapMicros = 15000000L)
      .select("event_id").as[Long].collect().toSet
    assert(kept == Set(0L, 2L, 3L), s"got $kept")
  }

  test("throttle folds each key independently across partitions") {
    val base = 1700000000000000L
    val ev = (for {
      u <- 1L to 20L; i <- 0L until 10L
    } yield (u, "k", u * 100 + i, new Timestamp((base + i * 1000000L) / 1000)))
      .toDF("user_id", "kind", "event_id", "ts").repartition(7)
    // gap 3s over 1s-spaced events: keep offsets 0,3,6,9 for every user
    val kept = Analytics.throttle(ev, Seq("user_id", "kind"), "ts", "event_id",
        minGapMicros = 3000000L)
      .select("event_id").as[Long].collect().toSet
    val expect = (for (u <- 1L to 20L; i <- Seq(0L, 3L, 6L, 9L))
      yield u * 100 + i).toSet
    assert(kept == expect)
  }
}
