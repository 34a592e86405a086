package graft.functions

import org.apache.spark.unsafe.types.UTF8String

/** Money-string scrubbing semantics from the reference ETL
  * (MonarchMoneyMain-v3.py:513-532):
  *   - strip `$` and `,`
  *   - `(` becomes `-`, `)` is removed (accounting negatives)
  *   - trim; empty string parses to 0.0
  *   - the numeric grammar is PYTHON's `float()` (the reference's parser),
  *     not Java's: trailing d/D/f/F suffixes and hex floats are rejected,
  *     digit-group underscores ("1_000") are accepted;
  *   - unparseable input yields null (the reference keeps the CLEANED
  *     string in the cell, v3:532; Spark columns are monotyped, so the
  *     cleaned value is quarantined in a sibling column — see
  *     Functions.money_quarantine)
  *
  * Kept as a tiny static helper so both the interpreted `eval` path and the
  * generated Java of [[ParseMoney]] share one implementation.
  */
object MoneyUtil {

  /** Python float() grammar: sign, underscore-grouped digits with optional
    * fraction/exponent, or inf/infinity/nan (all case-insensitive). */
  private val PyFloat = java.util.regex.Pattern.compile(
    "(?i)[+-]?(?:(?:\\d(?:_?\\d)*(?:\\.(?:\\d(?:_?\\d)*)?)?|\\.\\d(?:_?\\d)*)(?:e[+-]?\\d(?:_?\\d)*)?|inf(?:inity)?|nan)")

  /** The v3:526 scrub: $ and , and ) removed, ( -> -, trimmed. */
  def clean(str: String): String = {
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
    sb.toString.trim
  }

  def parse(s: UTF8String): java.lang.Double = {
    if (s == null) return null
    val cleaned = clean(s.toString)
    if (cleaned.isEmpty) return java.lang.Double.valueOf(0.0)
    if (!PyFloat.matcher(cleaned).matches()) return null
    val normalized = cleaned.replace("_", "")
    val unsigned = normalized.stripPrefix("+").stripPrefix("-")
    val negative = normalized.startsWith("-")
    val lower = unsigned.toLowerCase
    val magnitude =
      if (lower == "inf" || lower == "infinity") java.lang.Double.POSITIVE_INFINITY
      else if (lower == "nan") java.lang.Double.NaN
      else java.lang.Double.parseDouble(unsigned)
    java.lang.Double.valueOf(if (negative) -magnitude else magnitude)
  }

  /** The cleaned string, for the quarantine column (v3:532 keeps the
    * cleaned — not raw — string on parse failure). */
  def cleaned(s: UTF8String): UTF8String =
    if (s == null) null else UTF8String.fromString(clean(s.toString))
}
