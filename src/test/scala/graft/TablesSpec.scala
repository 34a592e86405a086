package graft

import java.nio.file.Files
import java.sql.Timestamp

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{TimestampNTZType, TimestampType}

import graft.sources.Tables

/** Regression guard for the round-8 breakage: the driver regenerated
  * events.parquet with `ts` as TIMESTAMP(MICROS, isAdjustedToUTC=false),
  * which Spark 4 reads as TIMESTAMP_NTZ, and six entries died at analysis
  * (unix_micros / session_window require TimestampType). `Tables.events`
  * must normalize every shape the testdata has ever shipped — nanos-as-long,
  * NTZ micros, and UTC-adjusted micros — to TimestampType, value-exact.
  */
class TablesSpec extends SparkTestBase {
  import spark.implicits._

  // one event at a known UTC instant: 2026-03-01T12:34:56.789Z
  private val micros = 1772368496789000L

  private def writeEvents(dir: java.nio.file.Path)(f: org.apache.spark.sql.DataFrame => org.apache.spark.sql.DataFrame): String = {
    val base = Seq((1L, micros, 7L, "view", 1.5, "{}"))
      .toDF("event_id", "us", "user_id", "event_type", "value", "props")
    f(base).coalesce(1).write.mode("overwrite").parquet(s"$dir/events.parquet")
    dir.toString
  }

  test("events loader normalizes all three historical ts shapes to TimestampType") {
    val tmp = Files.createTempDirectory("tables-spec")
    // shape 1: nanos-as-long (the pre-round-8 TIMESTAMP(NANOS) testdata reads
    // as LongType under spark.sql.legacy.parquet.nanosAsLong)
    val nanosDir = writeEvents(Files.createTempDirectory(tmp, "nanos")) { df =>
      df.select($"event_id", ($"us" * 1000L).as("ts"), $"user_id", $"event_type", $"value", $"props")
    }
    // shape 2: NTZ micros (the round-8 regenerated testdata: isAdjustedToUTC=false)
    val ntzDir = writeEvents(Files.createTempDirectory(tmp, "ntz")) { df =>
      df.select($"event_id", timestamp_micros($"us").cast(TimestampNTZType).as("ts"),
        $"user_id", $"event_type", $"value", $"props")
    }
    // shape 3: UTC-adjusted micros (plain TimestampType)
    val ltzDir = writeEvents(Files.createTempDirectory(tmp, "ltz")) { df =>
      df.select($"event_id", timestamp_micros($"us").as("ts"),
        $"user_id", $"event_type", $"value", $"props")
    }

    // sanity: the NTZ fixture really reads back as NTZ before normalization
    // (otherwise this spec can't catch the regression it exists for)
    val rawNtz = spark.read.parquet(s"$ntzDir/events.parquet").schema("ts").dataType
    assert(rawNtz == TimestampNTZType, s"fixture did not round-trip as NTZ: $rawNtz")

    for (dir <- Seq(nanosDir, ntzDir, ltzDir)) {
      val df = Tables.events(spark, dir)
      assert(df.schema("ts").dataType == TimestampType, s"dir=$dir")
      // value-exact under the UTC session TZ: all three shapes decode to the
      // same instant, so unix_micros round-trips the original micros
      val got = df.select(unix_micros($"ts")).as[Long].head()
      assert(got == micros, s"dir=$dir got=$got")
    }

    // registerAll must expose the normalized column to SQL consumers too;
    // run it against the real testdata (which currently ships the NTZ shape)
    Tables.registerAll(spark, "/root/testdata/sf0.001")
    val viaSqlType = spark.table("events").schema("ts").dataType
    assert(viaSqlType == TimestampType, s"registerAll events view: $viaSqlType")
    assert(spark.sql("SELECT unix_micros(ts) FROM events LIMIT 1").count() == 1)
  }
}
