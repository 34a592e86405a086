package graft

/** COLUMN DEFAULT VALUES (the Iceberg-v3 initial/write-default shape):
  * `ADD COLUMN ... DEFAULT d` back-fills files written before the
  * column existed with the FROZEN initial default (never NULL, never
  * retroactively changed), while INSERTs that omit the column
  * materialize the CURRENT write default (`SET DEFAULT` moves it,
  * `DROP DEFAULT` removes it). Everything rides Spark's own metadata
  * machinery — the format only persists the `coldefault.*` ledger. */
class ColumnDefaultsSpec extends SparkTestBase {

  private lazy val warehouse: String = {
    val wh = java.nio.file.Files.createTempDirectory("graft_dflt").toString
    spark.conf.set("spark.sql.catalog.dfcat",
      "graft.sources.v2.GraftTableCatalog")
    spark.conf.set("spark.sql.catalog.dfcat.warehouse", wh)
    wh
  }

  private def rows(sql: String): Seq[(Long, Option[Long])] =
    spark.sql(sql).collect().toSeq
      .map(r => (r.getLong(0), if (r.isNullAt(1)) None else Some(r.getLong(1))))
      .sortBy(_._1)

  test("ADD COLUMN DEFAULT: pre-existing files read the frozen initial " +
      "default; INSERTs omitting the column fill the write default; SET " +
      "DEFAULT moves only the write default; DROP DEFAULT restores NULL") {
    warehouse
    spark.sql("""CREATE TABLE dfcat.t (k BIGINT, v BIGINT)
      TBLPROPERTIES('key_col'='k')""")
    spark.sql("INSERT INTO dfcat.t SELECT id, id * 2 FROM range(10) ORDER BY id")
    spark.sql("ALTER TABLE dfcat.t ADD COLUMN b BIGINT DEFAULT 7")
    // old file: every row back-fills 7 (not NULL)
    assert(rows("SELECT k, b FROM dfcat.t") ==
      (0L until 10L).map(k => (k, Some(7L))))
    // INSERT omitting b -> write default 7; explicit b wins
    spark.sql("INSERT INTO dfcat.t (k, v) VALUES (10, 20)")
    spark.sql("INSERT INTO dfcat.t (k, v, b) VALUES (11, 22, 99)")
    // SET DEFAULT moves the WRITE default only: rows 0-10 keep 7
    spark.sql("ALTER TABLE dfcat.t ALTER COLUMN b SET DEFAULT 9")
    spark.sql("INSERT INTO dfcat.t (k, v) VALUES (12, 24)")
    // DROP DEFAULT: inserts fill NULL again; nothing old reinterprets
    spark.sql("ALTER TABLE dfcat.t ALTER COLUMN b DROP DEFAULT")
    spark.sql("INSERT INTO dfcat.t (k, v) VALUES (13, 26)")
    val expect = (0L until 10L).map(k => (k, Some(7L))) ++
      Seq((10L, Some(7L)), (11L, Some(99L)), (12L, Some(9L)), (13L, None))
    assert(rows("SELECT k, b FROM dfcat.t") == expect)
    // a filter ON the defaulted column must see the back-filled value
    // in OLD files (the row-group-predicate hazard: a missing column
    // must not drop row groups that read the default)
    assert(spark.sql("SELECT count(*) FROM dfcat.t WHERE b = 7")
      .collect()(0).getLong(0) == 11L)
    assert(spark.sql("SELECT count(*) FROM dfcat.t WHERE b = 99")
      .collect()(0).getLong(0) == 1L)
  }

  test("defaults survive compaction (maintenance materializes the " +
      "back-fill), follow a column rename, and CREATE-time defaults " +
      "fill INSERT gaps") {
    warehouse
    spark.sql("""CREATE TABLE dfcat.c (k BIGINT, v BIGINT)
      TBLPROPERTIES('key_col'='k')""")
    spark.sql("INSERT INTO dfcat.c SELECT id, id FROM range(6) ORDER BY id")
    spark.sql("ALTER TABLE dfcat.c ADD COLUMN b BIGINT DEFAULT 5")
    spark.sql("INSERT INTO dfcat.c (k, v) SELECT id, id FROM range(6, 9)")
    val before = rows("SELECT k, b FROM dfcat.c")
    assert(before == (0L until 9L).map(k => (k, Some(5L))))
    // compaction rewrites through the default-filled read: values keep
    spark.sql("CALL dfcat.system.compact('c', 1)")
    assert(rows("SELECT k, b FROM dfcat.c") == before)
    // rename: the ledger follows the logical column
    spark.sql("ALTER TABLE dfcat.c RENAME COLUMN b TO bb")
    spark.sql("INSERT INTO dfcat.c (k, v) VALUES (9, 9)")
    assert(rows("SELECT k, bb FROM dfcat.c") ==
      (0L until 10L).map(k => (k, Some(5L))))
    // CREATE-time default
    spark.sql("""CREATE TABLE dfcat.c2 (k BIGINT, w BIGINT DEFAULT 42)
      TBLPROPERTIES('key_col'='k')""")
    spark.sql("INSERT INTO dfcat.c2 (k) VALUES (1)")
    spark.sql("INSERT INTO dfcat.c2 (k, w) VALUES (2, 3)")
    assert(rows("SELECT k, w FROM dfcat.c2") ==
      Seq((1L, Some(42L)), (2L, Some(3L))))
  }

  test("MoR deletes and time travel compose with defaults; a dropped " +
      "column's ledger entry goes with it") {
    warehouse
    spark.sql("""CREATE TABLE dfcat.m (k BIGINT, v BIGINT)
      TBLPROPERTIES('key_col'='k',
        'write.delete.mode'='merge-on-read')""")
    spark.sql("INSERT INTO dfcat.m SELECT id, id FROM range(8) ORDER BY id")
    spark.sql("ALTER TABLE dfcat.m ADD COLUMN b BIGINT DEFAULT 3")
    // MoR delete ON the defaulted column's value: the row-level match
    // must see the back-filled 3 in old files
    spark.sql("DELETE FROM dfcat.m WHERE b = 3 AND k < 2")
    assert(rows("SELECT k, b FROM dfcat.m") ==
      (2L until 8L).map(k => (k, Some(3L))))
    // time travel BEFORE the add: the column does not exist there
    val e = intercept[Exception](
      spark.sql("SELECT b FROM dfcat.m VERSION AS OF 2").collect())
    assert(e.getMessage.contains("b"))
    // drop the column: its default ledger entry must not survive to
    // resurrect on a later re-add
    spark.sql("ALTER TABLE dfcat.m DROP COLUMN b")
    spark.sql("ALTER TABLE dfcat.m ADD COLUMN b BIGINT")
    assert(rows("SELECT k, b FROM dfcat.m").forall(_._2.isEmpty),
      "re-added column must read NULL, not the dropped default")
  }
}
