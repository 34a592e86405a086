package graft

import org.apache.spark.unsafe.types.UTF8String
import org.scalacheck.{Gen, Prop}
import org.scalatest.funsuite.AnyFunSuite

import graft.PropHelper.check
import graft.functions.MoneyUtil

/** F1 money-scrub semantics (v3:513-532): strip $ and commas, parens negate,
  * empty -> 0.0, unparseable -> null (quarantined). */
class MoneyUtilSpec extends AnyFunSuite {

  private def parse(s: String): java.lang.Double =
    MoneyUtil.parse(UTF8String.fromString(s))

  test("golden cases from the reference's scrub table") {
    assert(parse("$1,234.56") == 1234.56)
    assert(parse("(1,234.56)") == -1234.56)
    assert(parse("($1,234.56)") == -1234.56)
    assert(parse("$0.01") == 0.01)
    assert(parse("  42  ") == 42.0)
    assert(parse("-17.5") == -17.5)
    assert(parse("") == 0.0)
    assert(parse("   ") == 0.0)
    assert(parse("$") == 0.0)    // strips to empty -> 0.0 (v3:531 'if cleaned')
    assert(parse("()") == null) // '(' -> '-', ')' dropped -> "-" unparseable
  }

  test("unparseable input yields null (reference keeps raw string + warns)") {
    assert(parse("N/A") == null)
    assert(parse("12.3.4") == null)
    assert(parse("abc$1") == null)
    assert(parse("1 2") == null)
  }

  test("null passes through") {
    assert(MoneyUtil.parse(null) == null)
  }

  test("Python float() grammar, not Java's (v3:527 uses float())") {
    // Java-only syntax the reference's float() rejects
    assert(parse("100d") == null)
    assert(parse("1f") == null)
    assert(parse("0x1p3") == null)
    // Python-only digit-group underscores the reference accepts
    assert(parse("1_000") == 1000.0)
    assert(parse("$1_234.5_5") == 1234.55)
    assert(parse("1__0") == null) // only single underscores between digits
    assert(parse("_1") == null)
    assert(parse("1_") == null)
    // both engines accept these
    assert(parse("Infinity") == Double.PositiveInfinity)
    assert(parse("-inf") == Double.NegativeInfinity)
    assert(java.lang.Double.isNaN(parse("nan")))
    assert(parse("1.e3") == 1000.0)
    assert(parse(".5") == 0.5)
    assert(parse("1.") == 1.0)
  }

  test("property: round-trip through $#,###.## formatting") {
    val cents = Gen.chooseNum(-99999999L, 99999999L)
    check(Prop.forAll(cents) { c =>
      val v = c / 100.0
      val abs = math.abs(v)
      val digits = f"$abs%.2f"
      // insert thousands separators like the sheet cells carry
      val (intPart, frac) = digits.splitAt(digits.indexOf('.'))
      val grouped = intPart.reverse.grouped(3).mkString(",").reverse
      val s = if (v < 0) s"($$$grouped$frac)" else s"$$$grouped$frac"
      val p = parse(s)
      p != null && math.abs(p - v) < 1e-9
    })
  }

  test("property: parse never throws on arbitrary strings") {
    check(Prop.forAll(Gen.asciiPrintableStr) { s =>
      parse(s); true
    })
  }

  test("property: pure digits+dot strings parse to their double value") {
    val g = for {
      i <- Gen.chooseNum(0L, 999999L)
      f <- Gen.chooseNum(0, 99)
    } yield (i, f)
    check(Prop.forAll(g) { case (i, f) =>
      val p = parse(f"$i.$f%02d")
      p != null && math.abs(p - (i + f / 100.0)) < 1e-9
    })
  }
}
