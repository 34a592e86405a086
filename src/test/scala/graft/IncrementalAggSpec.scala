package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.operators.{IncrementalAgg, Upsert}

/** IVM invariant: refresh(agg(old), snapshotDiff(old, new)) must be
  * row-identical to agg(new) — including group moves, groups dying to
  * count 0, brand-new groups, and NULL group keys. */
class IncrementalAggSpec extends SparkTestBase {
  import spark.implicits._

  private def agg(snap: DataFrame): DataFrame =
    snap.groupBy("seg").agg(count(lit(1)).as("cnt"), sum("bal").as("bal"))

  private def rows(df: DataFrame) =
    df.select("seg", "cnt", "bal").collect()
      .map(r => (Option(r.get(0)), r.getLong(1), r.getLong(2))).toSet

  test("refresh over a changelog equals the direct recompute") {
    val oldSnap = Seq(
      (1L, Some("A"), 10L),  // stays
      (2L, Some("A"), 20L),  // value update in place
      (3L, Some("B"), 30L),  // moves to group A
      (4L, Some("C"), 40L),  // deleted -> group C dies
      (5L, None, 50L))       // null group, value update
      .toDF("id", "seg", "bal")
    val newSnap = Seq(
      (1L, Some("A"), 10L),
      (2L, Some("A"), 25L),
      (3L, Some("A"), 30L),
      (5L, None, 55L),
      (6L, Some("D"), 60L))  // brand-new group
      .toDF("id", "seg", "bal")
    val diff = Upsert.snapshotDiff(oldSnap, newSnap, Seq("id"), Seq("seg", "bal"))
    val refreshed = IncrementalAgg.refresh(agg(oldSnap), diff, Seq("seg"), Seq("bal"))
    assert(rows(refreshed) == rows(agg(newSnap)))
    // group C died (count 0) and must not linger with a zero row
    assert(!refreshed.select("seg").as[Option[String]].collect().contains(Some("C")))
  }

  test("empty changelog is a no-op refresh") {
    val snap = Seq((1L, Some("A"), 10L), (2L, None, 20L)).toDF("id", "seg", "bal")
    val diff = Upsert.snapshotDiff(snap, snap, Seq("id"), Seq("seg", "bal"))
    assert(diff.isEmpty)
    val refreshed = IncrementalAgg.refresh(agg(snap), diff, Seq("seg"), Seq("bal"))
    assert(rows(refreshed) == rows(agg(snap)))
  }

  test("refreshJoin equals the full recompute across I/D/U and FK misses") {
    import spark.implicits._
    val dim = Seq((10L, "x"), (20L, "y"), (30L, "z")).toDF("fk", "name")
    // old: keys 1..4; new: 2 updated (value + fk move), 3 dropped, 5-6
    // inserted (6 with a dangling FK that must vanish under inner join)
    val oldFact = Seq((1L, 10L, 100L), (2L, 10L, 200L), (3L, 20L, 300L),
      (4L, 30L, 400L)).toDF("id", "fk", "v")
    val newFact = Seq((1L, 10L, 100L), (2L, 20L, 250L), (4L, 30L, 400L),
      (5L, 20L, 500L), (6L, 99L, 600L)).toDF("id", "fk", "v")
    val oldView = oldFact.join(dim, "fk").select("id", "fk", "v", "name")
    val diff = Upsert.snapshotDiff(oldFact, newFact, Seq("id"), Seq("fk", "v"))
    val got = IncrementalAgg.refreshJoin(oldView, diff, dim,
        Seq("id"), Seq("fk", "v"), "fk")
      .select("id", "fk", "v", "name").as[(Long, Long, Long, String)]
      .collect().toSet
    val full = newFact.join(dim, "fk").select("id", "fk", "v", "name")
      .as[(Long, Long, Long, String)].collect().toSet
    assert(got == full)
    assert(!got.exists(_._1 == 6L)) // dangling FK dropped, as in the recompute
    assert(got.exists(r => r._1 == 2L && r._2 == 20L && r._3 == 250L)) // U re-imaged
  }

  test("refreshJoin rejects a joinKey outside the tracked columns") {
    intercept[IllegalArgumentException] {
      IncrementalAgg.refreshJoin(null, null, null, Seq("id"), Seq("v"), "fk")
    }
  }
}
