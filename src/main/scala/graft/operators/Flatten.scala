package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import graft.Functions._

/** F7/F8/P4 — entity struct flattens, the reference's core transform layer
  * (MonarchMoneyMain-v3.py:431-534 `_extract_nested_fields`, :995-1051
  * `_process_accounts`, :290-304 `_txn_account_id`).
  *
  * All row-local column expressions — no shuffle, whole-stage codegen.
  * Missing structs/fields default to "" exactly like the reference's
  * `.get(k, "")` probes.
  */
object Flatten {

  /** Null-safe struct-field read with the reference's `""` default. */
  private def field(struct: Column, name: String): Column =
    coalesce(struct.getField(name).cast("string"), lit(""))

  /** F7 — transaction flatten: replace `account`/`category`/`merchant`
    * structs with their breakout columns, keep `tags` and add `TagsCSL`
    * (v3:431-499). `createdAt`/`updatedAt` are rendered `yyyy-MM-dd HH:mm:ss`
    * (F3, v3:500-507) and `tags` is JSON-serialized (F5, v3:53-59) — the
    * sheet-cell representations the 29-column contract pins.
    */
  def transaction(df: DataFrame): DataFrame = {
    val cols = df.columns.toSet
    def has(c: String) = cols.contains(c)
    // the reference emits every breakout column unconditionally
    // (td.get("account", {}) etc., v3:441-481) — a batch without the struct
    // still gets the columns with "" defaults, so downstream joins and the
    // 29-column contract never lose columns
    def breakout(struct: String, fld: String): Column =
      if (has(struct)) field(col(struct), fld) else lit("")
    var out = df
      .withColumn("AccID", breakout("account", "id"))
      .withColumn("AccDispName", breakout("account", "displayName"))
      .withColumn("AccType", breakout("account", "__typename"))
      .withColumn("CatID", breakout("category", "id"))
      .withColumn("CatDispName", breakout("category", "name"))
      .withColumn("CatType", breakout("category", "__typename"))
      .withColumn("MrchntID", breakout("merchant", "id"))
      .withColumn("MrchntDispName", breakout("merchant", "name"))
      .withColumn("MrchntTranCount", breakout("merchant", "transactionsCount"))
      .withColumn("MrchntType", breakout("merchant", "__typename"))
      .withColumn("TagsCSL",
        if (has("tags")) coalesce(tags_csl(col("tags")), lit("")) else lit(""))
      .drop("account", "category", "merchant")
    if (has("tags"))
      out = out.withColumn("tags", to_json(col("tags")))
    for (ts <- Seq("createdAt", "updatedAt", "loadedAtUtc") if has(ts))
      out = out.withColumn(ts, coalesce(format_timestamp(col(ts)), lit("")))
    out
  }

  /** F8 — account flatten: `TypeDisplay` = type.display, `AccountType` =
    * subtype.display, `InstitutionName` = institution.name; original structs
    * KEPT (v3:995-1051 mutates in place, never pops). A payload missing any
    * of the structs gets "" — the reference's `.get(k, {})` probe — instead
    * of an analysis error. */
  def account(df: DataFrame): DataFrame = {
    val cols = df.columns.toSet
    def probe(struct: String, fld: String): Column =
      if (cols.contains(struct)) field(col(struct), fld) else lit("")
    df.withColumn("TypeDisplay", probe("type", "display"))
      .withColumn("AccountType", probe("subtype", "display"))
      .withColumn("InstitutionName", probe("institution", "name"))
  }

  /** F5 — sheet-cell serialization of any remaining complex columns: structs
    * and arrays become compact JSON strings (`_scalar`'s json.dumps,
    * v3:53-59). Simple columns pass through untouched. */
  def sheetCells(df: DataFrame): DataFrame = {
    import org.apache.spark.sql.types.{ArrayType, MapType, StructType}
    df.schema.fields.foldLeft(df) { (d, f) =>
      f.dataType match {
        case _: StructType | _: ArrayType | _: MapType =>
          d.withColumn(f.name, to_json(col(f.name)))
        case _ => d
      }
    }
  }

  /** P4 — account-id coalescing resolution (v3:290-304): first non-empty of
    * the flat id columns, else the nested account struct's id-ish fields.
    * Pass the columns that exist in the input; `nullify` maps "" to null so
    * coalesce skips empties the way the Python truthiness check does. */
  def resolveAccountId(candidates: Column*): Column = {
    val nullified = candidates.map(c => when(c.isNotNull && c =!= "", c))
    coalesce(nullified :+ lit(null).cast("string"): _*)
  }
}
