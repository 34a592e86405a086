package graft.functions

import org.apache.spark.unsafe.types.UTF8String

/** Money-string scrubbing semantics from the reference ETL
  * (MonarchMoneyMain-v3.py:513-532):
  *   - strip `$` and `,`
  *   - `(` becomes `-`, `)` is removed (accounting negatives)
  *   - trim; empty string parses to 0.0
  *   - unparseable input yields null (the reference keeps the raw string in
  *     the same cell; Spark columns are monotyped, so the raw value is
  *     quarantined in a sibling column — see Functions.moneyQuarantine)
  *
  * Kept as a tiny static helper so both the interpreted `eval` path and the
  * generated Java of [[ParseMoney]] share one implementation.
  */
object MoneyUtil {
  def parse(s: UTF8String): java.lang.Double = {
    if (s == null) return null
    val str = s.toString
    val sb = new java.lang.StringBuilder(str.length)
    var i = 0
    while (i < str.length) {
      val c = str.charAt(i)
      c match {
        case '$' | ',' | ')' => ()
        case '('             => sb.append('-')
        case other           => sb.append(other)
      }
      i += 1
    }
    val cleaned = sb.toString.trim
    if (cleaned.isEmpty) return java.lang.Double.valueOf(0.0)
    try java.lang.Double.valueOf(java.lang.Double.parseDouble(cleaned))
    catch { case _: NumberFormatException => null }
  }
}
