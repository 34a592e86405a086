package graft

import org.apache.spark.sql.functions._

import graft.operators.Upsert

/** K5 read-shape analog — keyed MERGE/DELETE semantics
  * (monarchmoney.py:2410-2570, 1556-1662). */
class UpsertSpec extends SparkTestBase {
  import spark.implicits._

  test("matched keys are replaced, unmatched fresh keys inserted, rest untouched") {
    val existing = Seq(("1", 10.0, "keep"), ("2", 20.0, "update-me"), ("3", 30.0, "keep"))
      .toDF("id", "amount", "note")
    val fresh = Seq(("2", 99.0, "updated"), ("4", 40.0, "created"))
      .toDF("id", "amount", "note")
    val out = Upsert.upsert(existing, fresh, "id").collect()
      .map(r => r.getString(0) -> (r.getDouble(1), r.getString(2))).toMap
    assert(out == Map(
      "1" -> (10.0, "keep"),
      "2" -> (99.0, "updated"), // update wins over the existing row
      "3" -> (30.0, "keep"),
      "4" -> (40.0, "created")))
  }

  test("upsert is idempotent: re-applying the same fresh batch changes nothing") {
    val existing = Seq(("1", 10.0), ("2", 20.0)).toDF("id", "amount")
    val fresh = Seq(("2", 99.0), ("3", 30.0)).toDF("id", "amount")
    val once = Upsert.upsert(existing, fresh, "id")
    val twice = Upsert.upsert(once, fresh, "id")
    assert(once.collect().map(_.toSeq).toSet == twice.collect().map(_.toSeq).toSet)
  }

  test("schema alignment: one-sided columns are null on the other side (v3:165-176)") {
    val existing = Seq(("1", "legacy")).toDF("id", "old_col")
    val fresh = Seq(("2", "b1")).toDF("id", "loaded")
    val out = Upsert.upsert(existing, fresh, "id")
    assert(out.columns.toSet == Set("id", "old_col", "loaded"))
    val byId = out.collect().map(r => r.getString(0) -> r).toMap
    assert(byId("1").getAs[String]("loaded") == null)
    assert(byId("2").getAs[String]("old_col") == null)
  }

  test("delete drops exactly the listed keys") {
    val existing = Seq(("1", 10.0), ("2", 20.0), ("3", 30.0)).toDF("id", "amount")
    val ids = Seq("2", "9").toDF("id") // unknown key 9 is a no-op, like the API's 404
    val out = Upsert.delete(existing, ids, "id")
    assert(out.select("id").as[String].collect().sorted.toSeq == Seq("1", "3"))
  }

  test("snapshotDiff classifies I/U/D, skips unchanged, and null-safely compares") {
    val oldDf = Seq(
      ("1", Some(10.0), "a"),   // unchanged
      ("2", Some(20.0), "b"),   // value update
      ("3", None, "c"),         // null -> value update
      ("4", Some(40.0), "d"))   // deleted
      .toDF("id", "bal", "note")
    val newDf = Seq(
      ("1", Some(10.0), "a"),
      ("2", Some(25.0), "b"),
      ("3", Some(30.0), "c"),
      ("5", Some(50.0), "e"))   // inserted
      .toDF("id", "bal", "note")
    val got = Upsert.snapshotDiff(oldDf, newDf, Seq("id"), Seq("bal", "note"))
      .collect().map(r => r.getString(0) -> r.getString(1)).toMap
    assert(got == Map("2" -> "U", "3" -> "U", "4" -> "D", "5" -> "I"))
    // round trip: applying the changelog to old reproduces new exactly
    val diff = Upsert.snapshotDiff(oldDf, newDf, Seq("id"), Seq("bal", "note"))
    val deletions = diff.filter(col("op") === "D").select("id")
    val freshRows = diff.filter(col("op").isin("I", "U"))
      .select(col("id"), col("bal_new").as("bal"), col("note_new").as("note"))
    val rebuilt = Upsert.upsert(Upsert.delete(oldDf, deletions, "id"), freshRows, "id")
    assert(rebuilt.collect().map(_.toSeq).toSet == newDf.collect().map(_.toSeq).toSet)
  }

  test("invertChangelog rolls the new snapshot back and equals diff(new, old)") {
    val oldDf = Seq(("1", Some(10.0)), ("2", Some(20.0)), ("4", Some(40.0)))
      .toDF("id", "bal")
    val newDf = Seq(("1", Some(10.0)), ("2", Some(25.0)), ("5", Some(50.0)))
      .toDF("id", "bal")
    val inv = Upsert.invertChangelog(
      Upsert.snapshotDiff(oldDf, newDf, Seq("id"), Seq("bal")), Seq("bal"))
    // algebraic identity: invert(diff(a, b)) == diff(b, a)
    val direct = Upsert.snapshotDiff(newDf, oldDf, Seq("id"), Seq("bal"))
    assert(inv.collect().map(_.toSeq).toSet == direct.collect().map(_.toSeq).toSet)
    // applying the inverse to new reproduces old
    val deletions = inv.filter(col("op") === "D").select("id")
    val freshRows = inv.filter(col("op").isin("I", "U"))
      .select(col("id"), col("bal_new").as("bal"))
    val rolledBack = Upsert.upsert(Upsert.delete(newDf, deletions, "id"), freshRows, "id")
    assert(rolledBack.collect().map(_.toSeq).toSet == oldDf.collect().map(_.toSeq).toSet)
  }

  test("upsert plan has no cartesian / nested loop (anti join stays keyed)") {
    val existing = spark.range(1000).select(col("id"), (col("id") * 2).as("v"))
    val fresh = spark.range(100).select((col("id") * 10).as("id"), lit(-1L).as("v"))
    val plan = Upsert.upsert(existing, fresh, "id").queryExecution.executedPlan.toString
    assert(!plan.contains("CartesianProduct") && !plan.contains("BroadcastNestedLoopJoin"), plan)
  }
}
