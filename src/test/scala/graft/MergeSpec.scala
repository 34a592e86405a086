package graft

import java.time.Instant

import org.apache.spark.sql.functions._

import graft.operators.IncrementalMerge

/** P3+U1+K2 — watermark merge: strict `<` keep, union-of-keys schema
  * alignment, control-table advance semantics (v3:1312-1337). */
class MergeSpec extends SparkTestBase {
  import spark.implicits._

  test("merge keeps strictly-older rows only (strict <, v3:1318)") {
    val existing = Seq(
      ("e1", "2026-01-01"), ("e2", "2026-01-14"), ("e3", "2026-01-15"), ("e4", "2026-02-01"))
      .toDF("id", "d").withColumn("d", $"d".cast("date"))
    val fresh = Seq(("f1", "2026-01-15"), ("f2", "2026-02-05"))
      .toDF("id", "d").withColumn("d", $"d".cast("date"))
    val merged = IncrementalMerge.merge(existing, fresh, "d", "2026-01-15")
    val ids = merged.select("id").as[String].collect().sorted.toSeq
    // e3 (exactly on the boundary) is REPLACED, not kept
    assert(ids == Seq("e1", "e2", "f1", "f2"))
  }

  test("merge aligns differing schemas via union-of-keys (U3, v3:165-176)") {
    val existing = Seq(("e1", "2026-01-01", "legacy")).toDF("id", "d", "old_col")
      .withColumn("d", $"d".cast("date"))
    val fresh = Seq(("f1", "2026-01-20", "batch-1")).toDF("id", "d", "loaded")
      .withColumn("d", $"d".cast("date"))
    val merged = IncrementalMerge.merge(existing, fresh, "d", "2026-01-15")
    assert(merged.columns.toSet == Set("id", "d", "old_col", "loaded"))
    val byId = merged.collect().map(r => r.getString(0) -> r).toMap
    assert(byId("e1").getAs[String]("loaded") == null)
    assert(byId("f1").getAs[String]("old_col") == null)
  }

  test("idempotence: re-merging the same fresh batch changes nothing") {
    val existing = Seq(("e1", "2026-01-01"), ("e2", "2026-01-20")).toDF("id", "d")
      .withColumn("d", $"d".cast("date"))
    val fresh = Seq(("e2", "2026-01-20"), ("f1", "2026-01-21")).toDF("id", "d")
      .withColumn("d", $"d".cast("date"))
    val once = IncrementalMerge.merge(existing, fresh, "d", "2026-01-15")
    val twice = IncrementalMerge.merge(once, fresh, "d", "2026-01-15")
    assert(once.collect().sortBy(_.getString(0)).toSeq ==
      twice.collect().sortBy(_.getString(0)).toSeq)
  }

  test("control table round-trip + ADVANCE_ON_EMPTY (K2, v3:1282-1289,1335-1337)") {
    val dir = java.nio.file.Files.createTempDirectory("graft_ctl").toString + "/control"
    val ctl = new IncrementalMerge.ControlTable(spark, dir)
    assert(ctl.read().isEmpty) // missing table = first run
    val t1 = Instant.parse("2026-01-15T10:00:00Z")
    ctl.advance(t1)
    assert(ctl.read().contains(t1))
    // empty batch + advanceOnEmpty=false: watermark must NOT move
    val t2 = Instant.parse("2026-01-16T10:00:00Z")
    ctl.advance(t2, batchWasEmpty = true, advanceOnEmpty = false)
    assert(ctl.read().contains(t1))
    // empty batch + advanceOnEmpty=true: moves
    ctl.advance(t2, batchWasEmpty = true, advanceOnEmpty = true)
    assert(ctl.read().contains(t2))
  }
}
