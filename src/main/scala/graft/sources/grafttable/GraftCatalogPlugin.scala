package graft.sources.grafttable

import java.util

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.analysis.{NoSuchTableException, TableAlreadyExistsException}
import org.apache.spark.sql.connector.catalog.{Identifier, Table, TableCatalog, TableChange}
import org.apache.spark.sql.connector.expressions.Transform
import org.apache.spark.sql.types.StructType
import org.apache.spark.sql.util.CaseInsensitiveStringMap

import graft.operators.CommitLog

/** Path-based SQL catalog for commit-log tables — Delta's
  * `` delta.`/path` `` addressing, with SQL time travel served by the
  * catalog's versioned loadTable overloads:
  *
  * {{{
  *   spark.conf.set("spark.sql.catalog.graft",
  *     "graft.sources.grafttable.GraftCatalogPlugin")
  *   spark.sql("SELECT * FROM graft.`/lake/events`")
  *   spark.sql("SELECT * FROM graft.`/lake/events` VERSION AS OF 3")
  *   spark.sql("SELECT * FROM graft.`/lake/events` TIMESTAMP AS OF '2026-08-14'")
  *   spark.sql("INSERT INTO graft.`/lake/events` SELECT ...")
  *   spark.sql("CREATE TABLE graft.`/lake/new` (id BIGINT, s STRING)")
  *   spark.sql("ALTER TABLE graft.`/lake/events` ADD COLUMNS (score DOUBLE)")
  * }}}
  *
  * The identifier IS the table path (single-part, backquoted).
  * loadTable pins the resolved version into the returned
  * [[GraftTable]], so one SQL statement reads one snapshot; INSERT
  * INTO routes through the table's write builder (one atomic commit,
  * declared-schema gate); CREATE TABLE is a declareSchema metadata
  * commit; ADD COLUMNS is evolveSchema's widen-only contract. DROP and
  * RENAME are refused by design: a path-addressed table's lifecycle
  * belongs to the storage layer and the vacuum/retention tooling, not
  * a metadata catalog (Delta draws the same line). */
class GraftCatalogPlugin extends TableCatalog {

  private var catalogName: String = "graft"
  private def spark = SparkSession.active

  override def initialize(name: String,
      options: CaseInsensitiveStringMap): Unit =
    catalogName = name

  override def name(): String = catalogName

  private def pathOf(ident: Identifier): String = {
    if (ident.namespace.nonEmpty)
      throw new NoSuchTableException(ident)
    ident.name
  }

  private def exists(path: String): Boolean =
    scala.util.Try(CommitLog.latestVersion(spark, path)).toOption.exists(_ >= 0)

  override def listTables(namespace: Array[String]): Array[Identifier] =
    Array.empty // path-addressed: there is no enumerable namespace

  override def tableExists(ident: Identifier): Boolean =
    ident.namespace.isEmpty && exists(ident.name)

  override def loadTable(ident: Identifier): Table = {
    val path = pathOf(ident)
    if (!exists(path)) throw new NoSuchTableException(ident)
    val v = CommitLog.latestVersion(spark, path)
    new GraftTable(path, GraftTableProvider.schemaAt(spark, path, v), v, acceptAnySchema = false)
  }

  /** SQL `VERSION AS OF <v>`. */
  override def loadTable(ident: Identifier, version: String): Table = {
    val path = pathOf(ident)
    if (!exists(path)) throw new NoSuchTableException(ident)
    val v = scala.util.Try(version.toLong).getOrElse(
      throw new IllegalArgumentException(
        s"$catalogName: VERSION AS OF wants a commit number, got '$version'"))
    require(CommitLog.versions(spark, path).contains(v),
      s"$catalogName: $path has no version $v")
    new GraftTable(path, GraftTableProvider.schemaAt(spark, path, v), v, acceptAnySchema = false)
  }

  /** SQL `TIMESTAMP AS OF <t>` — Spark hands the instant in
    * MICROseconds since epoch. */
  override def loadTable(ident: Identifier, timestampMicros: Long): Table = {
    val path = pathOf(ident)
    if (!exists(path)) throw new NoSuchTableException(ident)
    val v = CommitLog.versionAtTimestamp(spark, path,
      Math.floorDiv(timestampMicros, 1000L))
    new GraftTable(path, GraftTableProvider.schemaAt(spark, path, v), v, acceptAnySchema = false)
  }

  override def createTable(ident: Identifier, schema: StructType,
      partitions: Array[Transform],
      properties: util.Map[String, String]): Table = {
    val path = pathOf(ident)
    if (exists(path)) throw new TableAlreadyExistsException(ident)
    require(partitions.isEmpty,
      s"$catalogName: partition transforms are not supported — the log's " +
      "zone maps serve partition pruning (appendWithStats/statsCols)")
    val v = CommitLog.declareSchema(spark, path, schema)
    new GraftTable(path, schema, v, acceptAnySchema = false)
  }

  /** Column lifecycle DDL, all metadata-only commits:
    *
    *  - ADD COLUMNS maps onto [[CommitLog.evolveSchema]]'s widen-only
    *    contract (top-level, positionless, defaultless), with the
    *    resurrection guard: a name any earlier schema used physically
    *    gets a FRESH minted physical name
    *    ([[CommitLog.addColumnField]]);
    *  - RENAME COLUMN / DROP COLUMN ride Delta-style COLUMN MAPPING
    *    ([[graft.operators.ColumnMapping]]): the physical name in the
    *    files never changes, so no data is rewritten and zone/bloom
    *    pruning keeps working across the rename;
    *  - retypes and nested changes are refused — they would orphan
    *    existing files' data. */
  override def alterTable(ident: Identifier,
      changes: TableChange*): Table = {
    val path = pathOf(ident)
    if (!exists(path)) throw new NoSuchTableException(ident)
    val cur = CommitLog.tableSchema(spark, path).getOrElse(
      throw new UnsupportedOperationException(
        s"$catalogName: $path has no declared schema — declareSchema " +
        "first (ALTER gates on the declared-schema contract)"))
    // VALIDATE EVERY change against the in-flight schema FIRST, then
    // publish ONE commit: a multi-change ALTER that fails partway must
    // leave the table untouched, not half-altered (the pure helpers
    // throw before anything is written)
    val next = changes.foldLeft(cur) { (acc, ch) =>
      ch match {
        case add: TableChange.AddColumn =>
          require(add.fieldNames.length == 1,
            s"$catalogName: nested ADD COLUMN ${add.fieldNames.mkString(".")}")
          require(add.position == null,
            s"$catalogName: column position is not supported (files are " +
            "name-addressed; order is presentational)")
          StructType(acc.fields :+ CommitLog.applyAdd(spark, path, acc,
            add.fieldNames.head, add.dataType))
        case rn: TableChange.RenameColumn =>
          require(rn.fieldNames.length == 1,
            s"$catalogName: nested RENAME COLUMN ${rn.fieldNames.mkString(".")}")
          CommitLog.applyRename(spark, path, acc, rn.fieldNames.head, rn.newName)
        case del: TableChange.DeleteColumn =>
          require(del.fieldNames.length == 1,
            s"$catalogName: nested DROP COLUMN ${del.fieldNames.mkString(".")}")
          CommitLog.applyDrop(spark, path, acc, del.fieldNames.head)
        case other => throw new UnsupportedOperationException(
          s"$catalogName: unsupported ALTER ${other.getClass.getSimpleName} — " +
          "ADD/RENAME/DROP COLUMN are the supported column changes " +
          "(a retype would orphan existing files' data)")
      }
    }
    CommitLog.declareSchema(spark, path, next)
    new GraftTable(path, next, CommitLog.latestVersion(spark, path), acceptAnySchema = false)
  }

  override def dropTable(ident: Identifier): Boolean =
    throw new UnsupportedOperationException(
      s"$catalogName: DROP TABLE on a path-addressed table is a storage " +
      "operation — delete the directory (or vacuum to the horizon) instead")

  override def renameTable(oldIdent: Identifier,
      newIdent: Identifier): Unit =
    throw new UnsupportedOperationException(
      s"$catalogName: RENAME on a path-addressed table is a storage move")
}
