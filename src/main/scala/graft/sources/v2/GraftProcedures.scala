package graft.sources.v2

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.connector.catalog.procedures.{BoundProcedure, ProcedureParameter, UnboundProcedure}
import org.apache.spark.sql.connector.read.{LocalScan, Scan}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

import graft.operators.TableFormat

/** SQL-INVOCABLE MAINTENANCE — the Iceberg `CALL catalog.system.proc`
  * shape on Spark 4's DSv2 procedure API, so an SQL-only user can run
  * the table-format maintenance the library exposes programmatically:
  *
  * {{{
  *   CALL graft.system.compact('t', 4)            -- materialize MoR, 4 files
  *   CALL graft.system.compact_small_files('t', 100000)
  *   CALL graft.system.compact_manifests('t')
  *   CALL graft.system.materialize_deletes('t')
  *   CALL graft.system.expire_snapshots('t', 10)  -- keep last 10 versions
  *   CALL graft.system.recluster('t', 'cast(od as string)', 'od')
  * }}}
  *
  * This closes the read-amplification dial for SQL users: ingest
  * merge-on-read deletes through SQL (the scan stays columnar since
  * r13, paying per-batch mask work + the honest refusal of the
  * metadata-aggregate pushdown), `CALL compact`, and the mask work and
  * the pushdown refusal both disappear — all without leaving SQL
  * (GraftCatalogSpec proves the loop end-to-end). Each procedure is one
  * library call ([[TableFormat]] / [[graft.operators.Layout]]-shaped
  * rewrite), commits through the same CAS as every writer, and returns
  * its ledger (new version, files touched) as the CALL's result rows.
  *
  * The `table` argument is the catalog-relative name (namespace levels
  * dot-separated, exactly as in `SELECT ... FROM graft.ns.t`). */
private[v2] object GraftProcedures {
  val Namespace = "system"

  val names: Seq[String] = Seq("compact", "compact_small_files",
    "compact_manifests", "maintain", "materialize_deletes",
    "expire_snapshots", "remove_orphan_files",
    "recluster", "rollback", "create_tag", "drop_tag",
    "create_branch", "publish_branch", "drop_branch", "clone",
    "create_view", "drop_view", "rename_view", "list_views",
    "create_materialized_view", "refresh_mv", "drop_materialized_view",
    "migrate_partition_spec", "rebase_branch")

  private def param(name: String, dt: DataType): ProcedureParameter =
    ProcedureParameter.in(name, dt).build()

  private def paramD(name: String, dt: DataType,
                     default: String): ProcedureParameter =
    ProcedureParameter.in(name, dt).defaultValue(default).build()

  /** Result scan for the CALL output (usually one row; list_views many). */
  private final case class ResultScan(schema: StructType,
                                      rowValues: Seq[Seq[Any]],
                                      label: String) extends LocalScan {
    override def readSchema(): StructType = schema
    override def rows(): Array[InternalRow] =
      rowValues.map(InternalRow.fromSeq).toArray
    override def description(): String = s"graft-procedure($label)"
  }

  private def result(label: String, fields: (String, Any)*): java.util.Iterator[Scan] = {
    val schema = StructType(fields.map {
      case (n, _: Long) => StructField(n, LongType, nullable = false)
      case (n, _: Int) => StructField(n, IntegerType, nullable = false)
      case (n, _: String) => StructField(n, StringType, nullable = false)
      case (n, v) => throw new IllegalStateException(s"procedure result $n: $v")
    })
    val values = fields.map {
      case (_, s: String) => UTF8String.fromString(s)
      case (_, v) => v
    }
    java.util.List.of[Scan](ResultScan(schema, Seq(values), label)).iterator()
  }

  private def resultList(label: String, colName: String,
                         values: Seq[String]): java.util.Iterator[Scan] =
    java.util.List.of[Scan](ResultScan(
      StructType(Seq(StructField(colName, StringType, nullable = false))),
      values.sorted.map(v => Seq(UTF8String.fromString(v))),
      label)).iterator()

  def load(catalog: GraftTableCatalog, name: String): UnboundProcedure = {
    // the procedure resolves table names through ITS catalog's warehouse
    // (two mounted graft catalogs each call their own)
    implicit val cat: GraftTableCatalog = catalog
    name match {
      case "compact" => proc(name,
        "rewrite the whole table range-clustered; materializes merge-on-read masks",
        Array(param("table", StringType), paramD("n_files", IntegerType, "1"))) {
        (spark, root, args) =>
          val snap = TableFormat.compact(spark, root, s"$root/data",
            args.getInt(1))
          result(name, "version" -> snap.version,
            "n_files" -> snap.files.size.toLong)
      }
      case "compact_small_files" => proc(name,
        "bin-pack the small-file tail in key order; O(small files) not O(table)",
        Array(param("table", StringType), param("target_rows", LongType))) {
        (spark, root, args) =>
          val (snap, packed, bins) = TableFormat.compactSmallFiles(spark, root,
            s"$root/data", args.getLong(1))
          result(name, "version" -> snap.version,
            "files_packed" -> packed.toLong, "bins_written" -> bins.toLong)
      }
      case "compact_manifests" => proc(name,
        "merge delete manifests without touching data files",
        Array(param("table", StringType))) {
        (spark, root, args) =>
          val (snap, before, after) =
            TableFormat.compactManifests(spark, root, s"$root/data")
          result(name, "version" -> snap.version,
            "manifests_before" -> before.toLong,
            "manifests_after" -> after.toLong)
      }
      case "maintain" => proc(name,
        "one idempotent auto-maintenance tick: materialize pending masks, bin-pack the small-file tail, expire old versions — each only past its threshold",
        Array(param("table", StringType),
          paramD("target_rows", LongType, "0"),
          paramD("min_small_files", IntegerType, "8"),
          paramD("max_pending_masks", IntegerType, "0"),
          paramD("keep_last", IntegerType, "0"),
          paramD("grace_ms", LongType, "3600000"))) {
        (spark, root, args) =>
          val (snap, actions) = TableFormat.maintainTable(spark, root,
            s"$root/data", args.getLong(1), args.getInt(2), args.getInt(3),
            args.getInt(4), args.getLong(5))
          result(name, "version" -> snap.version,
            "n_files" -> snap.files.size.toLong,
            "actions" -> (if (actions.isEmpty) "none"
              else actions.mkString(";")))
      }
      case "materialize_deletes" => proc(name,
        "rewrite only manifest-affected files and clear the manifest set",
        Array(param("table", StringType),
          paramD("n_out_files", IntegerType, "0"))) {
        (spark, root, args) =>
          val (snap, rewritten, carried) = TableFormat.materializeDeletes(
            spark, root, s"$root/data", args.getInt(1))
          result(name, "version" -> snap.version,
            "files_rewritten" -> rewritten.toLong,
            "files_carried" -> carried.toLong)
      }
      case "expire_snapshots" => proc(name,
        "drop versions beyond the retention horizon (count- and/or age-based) and sweep orphan data files",
        Array(param("table", StringType), param("keep_last", IntegerType),
          paramD("grace_ms", LongType, "3600000"),
          // 0 = count-only; > 0 = also require the commit be older than
          // this many ms ("keep 7 days" = 604800000)
          paramD("older_than_ms", LongType, "0"))) {
        (spark, root, args) =>
          val (expired, removed) = TableFormat.expireSnapshots(spark, root,
            args.getInt(1), Seq(s"$root/data", root), args.getLong(2),
            args.getLong(3))
          result(name, "versions_expired" -> expired.size.toLong,
            "files_removed" -> removed.size.toLong)
      }
      case "remove_orphan_files" => proc(name,
        "sweep files no retained version references (crashed writers, " +
          "aborted commits) WITHOUT expiring any snapshot",
        Array(param("table", StringType),
          paramD("grace_ms", LongType, "3600000"))) {
        (spark, root, args) =>
          // expiry with the horizon past every version = pure orphan
          // sweep: all versions survive, phase 2 still reconciles the
          // data dirs against the full referenced set (grace keeps
          // in-flight writers' files out of the sweep)
          val keepAll = TableFormat.versions(spark, root).size + 1
          val (_, removed) = TableFormat.expireSnapshots(spark, root,
            keepAll, Seq(s"$root/data", root), args.getLong(1))
          result(name, "files_removed" -> removed.size.toLong)
      }
      case "recluster" => proc(name,
        "rewrite the table grouped by a clustering expression, declaring zone columns",
        Array(param("table", StringType), param("group_expr", StringType),
          param("zone_cols", StringType))) {
        (spark, root, args) =>
          val zones = args.getUTF8String(2).toString
            .split(",").map(_.trim).filter(_.nonEmpty).toSeq
          val snap = TableFormat.rewriteClustered(spark, root, s"$root/data",
            org.apache.spark.sql.functions.expr(args.getUTF8String(1).toString),
            zones)
          result(name, "version" -> snap.version,
            "n_files" -> snap.files.size.toLong)
      }
      case "migrate_partition_spec" => proc(name,
        "rewrite files recorded under an OLD partition spec routed by the " +
          "CURRENT one (one file per live value, sorted) — restores the " +
          "storage-partitioned join after ALTER TABLE SET " +
          "TBLPROPERTIES('partition.spec'=...)",
        Array(param("table", StringType))) {
        (spark, root, args) =>
          val (snap, migrated, carriedN) =
            TableFormat.migratePartitionSpec(spark, root, s"$root/data")
          result(name, "version" -> snap.version,
            "files_migrated" -> migrated.toLong,
            "files_carried" -> carriedN.toLong)
      }
      case "rollback" => proc(name,
        "re-publish a prior version's state as a NEW commit (history intact)",
        Array(param("table", StringType), param("to_version", LongType))) {
        (spark, root, args) =>
          val snap = TableFormat.rollback(spark, root, args.getLong(1))
          result(name, "version" -> snap.version,
            "restored_from" -> args.getLong(1))
      }
      case "create_tag" => proc(name,
        "pin a named ref to a version (default: the head) — resolvable as VERSION AS OF 'name', protected from retention",
        Array(param("table", StringType), param("tag", StringType),
          paramD("tag_version", LongType, "-1"))) {
        (spark, root, args) =>
          val v = args.getLong(2)
          val snap = TableFormat.createTag(spark, root,
            args.getUTF8String(1).toString,
            if (v < 0) None else Some(v))
          val pinned = snap.props(s"ref.${args.getUTF8String(1).toString}").toLong
          result(name, "version" -> snap.version, "pinned" -> pinned)
      }
      case "drop_tag" => proc(name,
        "drop a named ref — its version rejoins the retention horizon",
        Array(param("table", StringType), param("tag", StringType))) {
        (spark, root, args) =>
          val snap = TableFormat.dropTag(spark, root,
            args.getUTF8String(1).toString)
          result(name, "version" -> snap.version)
      }
      // ---- write-audit-publish from SQL: the staging flow the library
      // proves programmatically, driveable end-to-end with CALL + the
      // `t$branch_<name>` table idiom (stage with INSERT INTO
      // graft.`t$branch_b`, audit with SELECT, publish or drop here) ----
      case "create_branch" => proc(name,
        "fork a branch from the head (or a pinned version) — metadata only; stage via INSERT INTO graft.`<table>$branch_<name>`",
        Array(param("table", StringType), param("branch", StringType),
          paramD("as_of", LongType, "-1"))) {
        (spark, root, args) =>
          val v = args.getLong(2)
          val snap = TableFormat.createBranch(spark, root,
            args.getUTF8String(1).toString, if (v < 0) None else Some(v))
          result(name, "version" -> snap.version,
            "forked_from" -> snap.props("branch.forked_from").toLong)
      }
      case "publish_branch" => proc(name,
        "fast-forward the audited branch head onto main — FAILS LOUD if main advanced since the fork",
        Array(param("table", StringType), param("branch", StringType))) {
        (spark, root, args) =>
          val snap = TableFormat.publishBranch(spark, root,
            args.getUTF8String(1).toString)
          result(name, "version" -> snap.version,
            "n_files" -> snap.files.size.toLong)
      }
      case "rebase_branch" => proc(name,
        "re-fork a diverged branch onto main's head and re-apply its net " +
          "staged change (disjoint touched-file sets only; refuses loudly " +
          "otherwise) so publish_branch fast-forwards",
        Array(param("table", StringType), param("branch", StringType))) {
        (spark, root, args) =>
          val (snap, reborn, carriedN) = TableFormat.rebaseBranch(spark, root,
            args.getUTF8String(1).toString)
          result(name, "version" -> snap.version,
            "forked_from" -> snap.props("branch.forked_from").toLong,
            "files_reapplied" -> reborn.toLong,
            "files_carried" -> carriedN.toLong)
      }
      case "drop_branch" => proc(name,
        "drop a branch: sweep its unreferenced staged files, delete its log (published files survive)",
        Array(param("table", StringType), param("branch", StringType))) {
        (spark, root, args) =>
          val (removed, kept) = TableFormat.dropBranch(spark, root,
            args.getUTF8String(1).toString)
          result(name, "files_removed" -> removed.toLong,
            "files_kept" -> kept.toLong)
      }
      case "clone" => proc(name,
        "zero-copy clone of the table (or a pinned version) under a new catalog name — metadata only",
        Array(param("table", StringType), param("target", StringType),
          paramD("as_of", LongType, "-1"))) {
        (spark, root, args) =>
          val tgtParts = args.getUTF8String(1).toString.split('.').toSeq
          val tgtRoot = catalog.tableRoot(
            org.apache.spark.sql.connector.catalog.Identifier.of(
              tgtParts.init.toArray, tgtParts.last))
          val v = args.getLong(2)
          val snap = TableFormat.cloneTable(spark, root, tgtRoot,
            if (v < 0) None else Some(v))
          result(name, "version" -> snap.version,
            "n_files" -> snap.files.size.toLong)
      }
      // ---- persisted views: DDL rides CALL because OSS Spark 4 refuses
      // CREATE VIEW on non-session catalogs (ResolveSessionCatalog) —
      // reads expand through graft.plans.ViewSubstitution ----
      case "create_view" => viewProc(name,
        "store a SQL view document under the warehouse; SELECTs re-analyze it every read",
        Array(param("view", StringType), param("view_sql", StringType),
          paramD("replace", BooleanType, "false"))) { (spark, args) =>
        val viewName = args.getUTF8String(0).toString
        val sql = args.getUTF8String(1).toString
        val parts = viewName.split('.').toSeq
        val ident = org.apache.spark.sql.connector.catalog.Identifier.of(
          parts.init.toArray, parts.last)
        require(!catalog.tableExists(ident),
          s"graft create_view: '$viewName' names an existing TABLE — " +
            "tables shadow views; pick another name")
        // SESSION-LOCAL relations are refused outright: a stored view
        // re-resolves in OTHER sessions where this session's temp views
        // do not exist — no stored context can carry them, so accepting
        // one here would store a definition that only ever resolved by
        // accident (ViewSubstitution resolves everything else against
        // the STORED catalog/namespace)
        spark.sessionState.sqlParser.parsePlan(sql).collectWithSubqueries {
          case r: org.apache.spark.sql.catalyst.analysis.UnresolvedRelation
              if spark.sessionState.catalog
                .isTempView(r.multipartIdentifier) =>
            throw new IllegalArgumentException(
              s"graft create_view: '$viewName' references the TEMP VIEW " +
                s"'${r.multipartIdentifier.mkString(".")}' — temp views " +
                "are session-local and unreachable from other sessions; " +
                "persist the input as a table or inline its query")
        }
        // analyze now: a view that cannot resolve at create time is a
        // typo, not a definition (also captures the schema)
        val analyzed = spark.sql(sql)
        val info = new org.apache.spark.sql.connector.catalog.ViewInfo(
          ident, sql,
          spark.sessionState.catalogManager.currentCatalog.name(),
          spark.sessionState.catalogManager.currentNamespace,
          analyzed.schema, Array.empty[String], Array.empty[String],
          Array.empty[String],
          java.util.Collections.emptyMap[String, String]())
        val v =
          if (args.getBoolean(2)) catalog.replaceView(info, orCreate = true)
          else catalog.createView(info)
        result(name, "view" -> viewName,
          "n_columns" -> v.schema().fields.length.toLong)
      }
      // ---- SQL MATERIALIZED VIEWS with incremental refresh: the IVM
      // operators + changelog + stored views composed into the surface a
      // user expects — CALL create_materialized_view / refresh_mv, read
      // via an ordinary SELECT on the stored view. Refresh consumes
      // table_changes as signed deltas (all three delete shapes + the
      // CDF paired-update shape), NEVER re-scanning the fact table ----
      case "create_materialized_view" => viewProc(name,
        "store an incrementally-maintainable aggregate (count(*)/count/sum " +
          "over one graft table) as a table + stored view with a " +
          "source-version cursor",
        Array(param("mv", StringType), param("mv_sql", StringType),
          paramD("n_out_files", IntegerType, "1"))) { (spark, args) =>
        val mvName = args.getUTF8String(0).toString
        val parts = mvName.split('.').toSeq
        val ident = org.apache.spark.sql.connector.catalog.Identifier.of(
          parts.init.toArray, parts.last)
        require(!catalog.tableExists(ident),
          s"create_materialized_view: '$mvName' names an existing TABLE")
        val d = graft.operators.MaterializedView.parse(spark,
          args.getUTF8String(1).toString, catalog.name())
        def rootOf(table: String): String = {
          val p = table.split('.').toSeq
          catalog.tableRoot(
            org.apache.spark.sql.connector.catalog.Identifier.of(
              p.init.toArray, p.last))
        }
        val srcRoot = rootOf(d.sourceTable)
        val src2Root = d.join.map(j => rootOf(j.table))
        val storeParts = parts.init :+ s"${parts.last}__store"
        val storeIdent = org.apache.spark.sql.connector.catalog.Identifier.of(
          storeParts.init.toArray, storeParts.last)
        val storeRoot = catalog.tableRoot(storeIdent)
        val (snap, cursor) = graft.operators.MaterializedView.create(
          spark, d, srcRoot, src2Root, storeRoot, args.getInt(2))
        // the user-facing name is a STORED VIEW projecting the
        // definition's columns over the store (hidden __mv_* columns
        // rebuild NULL sums and group liveness)
        val fromRef = (catalog.name() +: storeParts.map(p => s"`$p`"))
          .mkString(".")
        val vsql = graft.operators.MaterializedView.viewSql(fromRef, d)
        val analyzed = spark.sql(vsql)
        catalog.createView(new org.apache.spark.sql.connector.catalog.ViewInfo(
          ident, vsql, catalog.name(),
          Array.empty[String],
          analyzed.schema, Array.empty[String], Array.empty[String],
          Array.empty[String],
          java.util.Collections.emptyMap[String, String]()))
        result(name, "mv" -> mvName, "store_version" -> snap.version,
          "cursor" -> cursor)
      }
      case "refresh_mv" => viewProc(name,
        "advance a materialized view to the source head by consuming the " +
          "changelog (cursor, head] as signed deltas — O(changed files + " +
          "|view|), never a fact-table rescan",
        Array(param("mv", StringType),
          paramD("n_out_files", IntegerType, "1"))) { (spark, args) =>
        val mvName = args.getUTF8String(0).toString
        val parts = mvName.split('.').toSeq
        val storeParts = parts.init :+ s"${parts.last}__store"
        val storeRoot = catalog.tableRoot(
          org.apache.spark.sql.connector.catalog.Identifier.of(
            storeParts.init.toArray, storeParts.last))
        require(TableFormat.versions(spark, storeRoot).nonEmpty,
          s"refresh_mv: no materialized view '$mvName'")
        val props = TableFormat.snapshot(spark, storeRoot).props
        def rootOf(table: String): String = {
          val p = table.split('.').toSeq
          catalog.tableRoot(
            org.apache.spark.sql.connector.catalog.Identifier.of(
              p.init.toArray, p.last))
        }
        val srcRoot = rootOf(props("mv.source"))
        val src2Root = props.get("mv.source2").map(rootOf)
        val r = graft.operators.MaterializedView.refresh(
          spark, srcRoot, src2Root, storeRoot, args.getInt(1))
        result(name, "store_version" -> r.snap.version,
          "from_version" -> r.fromA, "to_version" -> r.toA,
          "from_version2" -> r.fromB, "to_version2" -> r.toB,
          "refreshed" -> (if (r.refreshed) 1L else 0L))
      }
      case "drop_materialized_view" => viewProc(name,
        "drop a materialized view: the stored view document and the store " +
          "table's log + data",
        Array(param("mv", StringType))) { (spark, args) =>
        val mvName = args.getUTF8String(0).toString
        val parts = mvName.split('.').toSeq
        val ident = org.apache.spark.sql.connector.catalog.Identifier.of(
          parts.init.toArray, parts.last)
        val storeParts = parts.init :+ s"${parts.last}__store"
        val storeRoot = catalog.tableRoot(
          org.apache.spark.sql.connector.catalog.Identifier.of(
            storeParts.init.toArray, storeParts.last))
        require(TableFormat.versions(spark, storeRoot).nonEmpty,
          s"drop_materialized_view: no materialized view '$mvName'")
        catalog.dropView(ident)
        val p = new org.apache.hadoop.fs.Path(storeRoot)
        p.getFileSystem(spark.sparkContext.hadoopConfiguration)
          .delete(p, true)
        result(name, "dropped" -> 1L)
      }
      case "drop_view" => viewProc(name,
        "delete a stored view document",
        Array(param("view", StringType))) { (spark, args) =>
        val parts = args.getUTF8String(0).toString.split('.').toSeq
        val dropped = catalog.dropView(
          org.apache.spark.sql.connector.catalog.Identifier.of(
            parts.init.toArray, parts.last))
        result(name, "dropped" -> (if (dropped) 1L else 0L))
      }
      case "rename_view" => viewProc(name,
        "move a stored view document to a new name (refuses an occupied target)",
        Array(param("view", StringType), param("to", StringType))) {
        (spark, args) =>
        def identOf(s: String) = {
          val parts = s.split('.').toSeq
          org.apache.spark.sql.connector.catalog.Identifier.of(
            parts.init.toArray, parts.last)
        }
        catalog.renameView(identOf(args.getUTF8String(0).toString),
          identOf(args.getUTF8String(1).toString))
        result(name, "view" -> args.getUTF8String(1).toString)
      }
      case "list_views" => viewProc(name,
        "list stored views in a namespace ('' = the warehouse root)",
        Array(paramD("in_namespace", StringType, "''"))) { (spark, args) =>
        val ns = args.getUTF8String(0).toString.split('.').toSeq
          .filter(_.nonEmpty)
        resultList(name, "view",
          catalog.listViews(ns: _*).map(_.name()).toSeq)
      }
      case other => throw new RuntimeException(
        s"graft catalog: no procedure system.$other " +
          s"(have: ${names.mkString(", ")})")
    }
  }

  /** Like [[proc]] but WITHOUT the table-existence gate — view
    * procedures name view documents, not table logs. */
  private def viewProc(procName: String, desc: String,
                       params: Array[ProcedureParameter])
                      (body: (SparkSession, InternalRow) => java.util.Iterator[Scan])
      : UnboundProcedure =
    new UnboundProcedure {
      override def name(): String = procName
      override def description(): String = desc
      override def bind(inputType: StructType): BoundProcedure =
        new BoundProcedure {
          override def name(): String = procName
          override def description(): String = desc
          override def parameters(): Array[ProcedureParameter] = params
          override def isDeterministic: Boolean = false
          override def call(input: InternalRow): java.util.Iterator[Scan] =
            body(SparkSession.active, input)
        }
    }

  /** An UnboundProcedure whose bound form resolves the table root from
    * the owning catalog's warehouse and runs `body` on the driver.
    * Procedures are non-deterministic by declaration (they commit new
    * versions). */
  private def proc(procName: String, desc: String,
                   params: Array[ProcedureParameter])
                  (body: (SparkSession, String, InternalRow) => java.util.Iterator[Scan])
                  (implicit catalog: GraftTableCatalog): UnboundProcedure =
    new UnboundProcedure {
      override def name(): String = procName
      override def description(): String = desc
      override def bind(inputType: StructType): BoundProcedure =
        new BoundProcedure {
          override def name(): String = procName
          override def description(): String = desc
          override def parameters(): Array[ProcedureParameter] = params
          override def isDeterministic: Boolean = false
          override def call(input: InternalRow): java.util.Iterator[Scan] = {
            val spark = SparkSession.active
            val parts = input.getUTF8String(0).toString.split('.').toSeq
            val ident = org.apache.spark.sql.connector.catalog.Identifier.of(
              parts.init.toArray, parts.last)
            val root = catalog.tableRoot(ident)
            require(TableFormat.versions(spark, root).nonEmpty,
              s"graft procedure $procName: no table '${parts.mkString(".")}'")
            body(spark, root, input)
          }
        }
    }
}
