package graft

import java.time.{Instant, LocalDate}

import org.scalacheck.{Gen, Prop}
import org.scalatest.funsuite.AnyFunSuite

import graft.PropHelper.check
import graft.operators.IncrementalMerge.extractionWindow

/** F10/§2.9 — extraction-window semantics (v3:1227-1258): forced start >
  * watermark > backfill default, start-of-day truncation, empty-table
  * widening. Off-by-one-day bugs live here (SURVEY §7.5 risk 3). */
class ExtractionWindowSpec extends AnyFunSuite {

  private val now = Instant.parse("2026-02-10T15:30:00Z")
  private val backfill = 30

  test("watermark wins when present (v3:1241-1247)") {
    val wm = Instant.parse("2026-02-03T22:15:00Z")
    val (start, end) = extractionWindow(Some(wm), now, backfill)
    assert(start == LocalDate.parse("2026-02-03")) // truncated to start of day (v3:1250)
    assert(end == now)
  }

  test("no watermark falls back to now - backfillDays (v3:1245-1247)") {
    val (start, _) = extractionWindow(None, now, backfill)
    assert(start == LocalDate.parse("2026-01-11"))
  }

  test("FORCE_START_DATE overrides everything (v3:1227-1234)") {
    val wm = Instant.parse("2026-02-03T00:00:00Z")
    val (start, _) = extractionWindow(Some(wm), now, backfill,
      forceStartDate = Some(LocalDate.parse("2020-05-05")))
    assert(start == LocalDate.parse("2020-05-05"))
  }

  test("FORCE_FULL_REFRESH ignores the watermark (v3:1236-1239)") {
    val wm = Instant.parse("2026-02-09T00:00:00Z")
    val (start, _) = extractionWindow(Some(wm), now, backfill, forceFullRefresh = true)
    assert(start == LocalDate.parse("2026-01-11"))
  }

  test("FORCE_FULL_REFRESH wins over FORCE_START_DATE (v3:1228-1240 apply order)") {
    val (start, _) = extractionWindow(None, now, backfill,
      forceStartDate = Some(LocalDate.parse("2026-06-01")), forceFullRefresh = true)
    assert(start == LocalDate.parse("2026-01-11")) // backfill window, not the forced slice
  }

  test("empty-table widening: today's watermark over an empty target widens (v3:1252-1256)") {
    val wm = Instant.parse("2026-02-10T01:00:00Z") // same UTC day as `now`
    val (start, _) = extractionWindow(Some(wm), now, backfill, targetIsEmpty = true)
    assert(start == LocalDate.parse("2026-01-11"))
    // non-empty target: no widening
    val (start2, _) = extractionWindow(Some(wm), now, backfill)
    assert(start2 == LocalDate.parse("2026-02-10"))
    // forced start disables widening
    val (start3, _) = extractionWindow(Some(wm), now, backfill,
      forceStartDate = Some(LocalDate.parse("2026-02-10")), targetIsEmpty = true)
    assert(start3 == LocalDate.parse("2026-02-10"))
  }

  private val instantGen: Gen[Instant] =
    Gen.chooseNum(0L, 4102444800L).map(Instant.ofEpochSecond)

  test("property: start is always a day boundary at or before now's day") {
    val g = for {
      wm <- Gen.option(instantGen)
      nowI <- instantGen
      bf <- Gen.chooseNum(1, 4000)
      empty <- Gen.oneOf(true, false)
    } yield (wm, nowI, bf, empty)
    check(Prop.forAll(g) { case (wm, nowI, bf, empty) =>
      val boundedWm = wm.filter(_.isBefore(nowI)) // watermarks precede now in practice
      val (start, end) = extractionWindow(boundedWm, nowI, bf, targetIsEmpty = empty)
      val nowDay = nowI.atZone(java.time.ZoneOffset.UTC).toLocalDate
      end == nowI && !start.isAfter(nowDay)
    })
  }

  test("property: widening only changes a start that equals now's day") {
    val g = for {
      wm <- instantGen
      nowI <- instantGen if wm.isBefore(nowI)
      bf <- Gen.chooseNum(1, 4000)
    } yield (wm, nowI, bf)
    check(Prop.forAll(g) { case (wm, nowI, bf) =>
      val (plain, _) = extractionWindow(Some(wm), nowI, bf)
      val (widened, _) = extractionWindow(Some(wm), nowI, bf, targetIsEmpty = true)
      val nowDay = nowI.atZone(java.time.ZoneOffset.UTC).toLocalDate
      if (plain == nowDay) !widened.isAfter(plain) else widened == plain
    })
  }
}
