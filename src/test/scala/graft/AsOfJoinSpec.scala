package graft

import java.sql.Timestamp

import org.apache.spark.sql.functions._

import graft.operators.AsOfJoin

/** As-of join edge semantics: equal-timestamp inclusion, no-match nulls,
  * deterministic tie-breaks, and equivalence with the naive quadratic form. */
class AsOfJoinSpec extends SparkTestBase {
  import spark.implicits._

  private def t(s: String) = Timestamp.valueOf(s)

  test("picks the latest right row at or before each left row, null when none") {
    val probes = Seq(
      (1L, t("2026-01-01 10:00:00"), "p1"),
      (1L, t("2026-01-01 12:00:00"), "p2"),
      (2L, t("2026-01-01 09:00:00"), "p3") // before any snapshot for key 2
    ).toDF("k", "ts", "probe")
    val snaps = Seq(
      (1L, t("2026-01-01 10:00:00"), 100L, "a"), // equal ts: included for p1
      (1L, t("2026-01-01 11:00:00"), 101L, "b"),
      (2L, t("2026-01-01 10:00:00"), 200L, "c")
    ).toDF("k", "ts", "sid", "v")
    val got = AsOfJoin.asOf(probes, snaps, "k", "ts", "ts", Seq("v"), rightTie = "sid")
      .select("probe", "asof_v").as[(String, Option[String])].collect().toMap
    assert(got == Map("p1" -> Some("a"), "p2" -> Some("b"), "p3" -> None))
  }

  test("equal right timestamps: the greatest tie wins, deterministically") {
    val probes = Seq((1L, t("2026-01-01 10:30:00"), "p")).toDF("k", "ts", "probe")
    val snaps = Seq(
      (1L, t("2026-01-01 10:00:00"), 5L, "five"),
      (1L, t("2026-01-01 10:00:00"), 9L, "nine"),
      (1L, t("2026-01-01 10:00:00"), 7L, "seven")).toDF("k", "ts", "sid", "v")
    (1 to 3).foreach { _ =>
      val got = AsOfJoin.asOf(probes, snaps, "k", "ts", "ts", Seq("v"), rightTie = "sid")
        .select("asof_v").as[String].collect()(0)
      assert(got == "nine")
    }
  }

  test("a NULL in the latest right row is carried as NULL, never an older value") {
    val probes = Seq((1L, t("2026-01-01 12:00:00"), "p")).toDF("k", "ts", "probe")
    val snaps = Seq(
      (1L, t("2026-01-01 10:00:00"), 1L, Some("old"), Some(10.0)),
      (1L, t("2026-01-01 11:00:00"), 2L, None: Option[String], Some(20.0))
    ).toDF("k", "ts", "sid", "v", "x")
    val got = AsOfJoin.asOf(probes, snaps, "k", "ts", "ts", Seq("v", "x"), rightTie = "sid")
      .select("asof_v", "asof_x").collect()(0)
    // latest snapshot has v=NULL: must NOT fall back to "old", and both
    // carried columns must come from the same (latest) row
    assert(got.isNullAt(0), s"expected NULL, got ${got.get(0)}")
    assert(got.getDouble(1) == 20.0)
  }

  test("matches the naive quadratic formulation on a random-ish corpus") {
    val probes = (1 to 300).map(i =>
      ((i % 5).toLong, t(f"2026-01-01 ${i % 24}%02d:${i % 60}%02d:00"), i.toLong))
      .toDF("k", "ts", "pid")
    val snaps = (1 to 100).map(j =>
      ((j % 5).toLong, t(f"2026-01-01 ${(j * 7) % 24}%02d:${(j * 13) % 60}%02d:00"), j.toLong))
      .toDF("k", "ts", "sid")
    val got = AsOfJoin.asOf(probes, snaps, "k", "ts", "ts", Seq("sid"), rightTie = "sid")
      .select("pid", "asof_sid").as[(Long, Option[Long])].collect().toMap
    // naive: per probe, argmax over all earlier snapshots
    val snapList = snaps.collect().map(r => (r.getLong(0), r.getTimestamp(1), r.getLong(2)))
    val naive = probes.collect().map { r =>
      val (k, ts, pid) = (r.getLong(0), r.getTimestamp(1), r.getLong(2))
      val cands = snapList.filter(s => s._1 == k && !s._2.after(ts))
      pid -> (if (cands.isEmpty) None
              else Some(cands.maxBy(s => (s._2.getTime, s._3))._3))
    }.toMap
    assert(got == naive)
  }
}
