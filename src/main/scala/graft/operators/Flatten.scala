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
    var out = df
    if (has("account"))
      out = out
        .withColumn("AccID", field(col("account"), "id"))
        .withColumn("AccDispName", field(col("account"), "displayName"))
        .withColumn("AccType", field(col("account"), "__typename"))
        .drop("account")
    if (has("category"))
      out = out
        .withColumn("CatID", field(col("category"), "id"))
        .withColumn("CatDispName", field(col("category"), "name"))
        .withColumn("CatType", field(col("category"), "__typename"))
        .drop("category")
    if (has("merchant"))
      out = out
        .withColumn("MrchntID", field(col("merchant"), "id"))
        .withColumn("MrchntDispName", field(col("merchant"), "name"))
        .withColumn("MrchntTranCount", field(col("merchant"), "transactionsCount"))
        .withColumn("MrchntType", field(col("merchant"), "__typename"))
        .drop("merchant")
    if (has("tags"))
      out = out
        .withColumn("TagsCSL", coalesce(tags_csl(col("tags")), lit("")))
        .withColumn("tags", to_json(col("tags")))
    for (ts <- Seq("createdAt", "updatedAt", "loadedAtUtc") if has(ts))
      out = out.withColumn(ts, coalesce(format_timestamp(col(ts)), lit("")))
    out
  }

  /** F8 — account flatten: `TypeDisplay` = type.display, `AccountType` =
    * subtype.display, `InstitutionName` = institution.name; original structs
    * KEPT (v3:995-1051 mutates in place, never pops). */
  def account(df: DataFrame): DataFrame =
    df.withColumn("TypeDisplay", field(col("type"), "display"))
      .withColumn("AccountType", field(col("subtype"), "display"))
      .withColumn("InstitutionName", field(col("institution"), "name"))

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
