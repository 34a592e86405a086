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
}
