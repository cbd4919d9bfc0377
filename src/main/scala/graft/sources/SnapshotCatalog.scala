package graft.sources

import java.util

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.analysis.{NoSuchNamespaceException, NoSuchTableException}
import org.apache.spark.sql.connector.catalog.{Identifier, SupportsRead, Table, TableCapability, TableCatalog, TableChange}
import org.apache.spark.sql.connector.expressions.Transform
import org.apache.spark.sql.connector.read.{Scan, ScanBuilder, SupportsPushDownFilters, SupportsPushDownRequiredColumns}
import org.apache.spark.sql.execution.datasources.parquet.ParquetFileFormat
import org.apache.spark.sql.execution.datasources.v2.parquet.ParquetTable
import org.apache.spark.sql.sources.Filter
import org.apache.spark.sql.types.StructType
import org.apache.spark.sql.util.CaseInsensitiveStringMap

import graft.io.Snapshots

/** SQL/catalog surface over [[graft.io.Snapshots]] — the DataSourceV2
  * `TableCatalog` that turns the engine's flagship store from a
  * library-only API into `spark.sql` tables, the same query layer the
  * reference exposes through its Glue/Athena catalog (reference
  * `sql/athena/curated_events.sql:1-14` — `CREATE EXTERNAL TABLE` +
  * `MSCK REPAIR` + audit queries over it), upgraded with the snapshot
  * store's versioning:
  *
  * {{{
  *   spark.conf.set("spark.sql.catalog.graft",
  *     "graft.sources.SnapshotCatalog")
  *   spark.conf.set("spark.sql.catalog.graft.root", "/warehouse")
  *   spark.sql("SELECT * FROM graft.events")                  // current
  *   spark.sql("SELECT * FROM graft.events VERSION AS OF 3")  // pinned
  *   spark.sql("SELECT * FROM graft.events VERSION AS OF 'train-2026'")
  *   spark.sql("SELECT * FROM graft.events TIMESTAMP AS OF '…'")
  * }}}
  *
  * A table named `ns.t` resolves to the snapshot table at
  * `$root/ns/t`; `VERSION AS OF` takes a version number or a named ref
  * ([[Snapshots.tag]]), `TIMESTAMP AS OF` routes through
  * [[Snapshots.versionAsOfTime]]. Each loaded table PINS its version
  * at resolution (the snapshot read contract): concurrent commits
  * never make one query see two versions.
  *
  * Scan planning is the engine's own: pushed filters prune the
  * version's MANIFEST (per-file min/max stats + era-aware partition
  * values, [[Snapshots.sqlPrunedPaths]]) so whole files are skipped
  * without opening a footer, then the surviving file list is handed to
  * Spark's native vectorized parquet scan ([[ParquetTable]]) for
  * column pruning and execution — identical file-skipping to
  * [[Snapshots.readRange]] (SnapshotCatalogSpec pins set-equality),
  * identical row-reading machinery to every other parquet scan in the
  * engine. All pushed filters are also kept as residuals, so pruning
  * can only cut IO, never change answers.
  *
  * Read-only by design this round: writes go through the library's
  * transactional commits ([[Snapshots.commitAppend]] and friends),
  * which SQL `INSERT` could not make atomic without duplicating the
  * reservation protocol here.
  */
class SnapshotCatalog extends TableCatalog {

  private var catalogName: String = _
  private var root: String = _

  override def initialize(name: String,
      options: CaseInsensitiveStringMap): Unit = {
    catalogName = name
    root = Option(options.get("root")).getOrElse(throw
      new IllegalArgumentException(
        s"SnapshotCatalog: set spark.sql.catalog.$name.root to the " +
          "directory holding the snapshot tables"))
  }

  override def name(): String = catalogName

  private def spark: SparkSession = SparkSession.active

  private def tablePath(ident: Identifier): String =
    (ident.namespace() :+ ident.name()).mkString(s"$root/", "/", "")

  private def isSnapshotTable(path: String): Boolean =
    new java.io.File(path, "_CURRENT").isFile ||
      new java.io.File(path, "_CURRENT.tmp").isFile

  override def listTables(namespace: Array[String]): Array[Identifier] = {
    val dir = new java.io.File((root +: namespace).mkString("/"))
    if (!dir.isDirectory) throw new NoSuchNamespaceException(namespace)
    dir.listFiles().filter(f => isSnapshotTable(f.getPath))
      .map(f => Identifier.of(namespace, f.getName)).sortBy(_.name())
  }

  override def tableExists(ident: Identifier): Boolean =
    isSnapshotTable(tablePath(ident))

  override def loadTable(ident: Identifier): Table =
    load(ident, None)

  /** `VERSION AS OF x`: a version number, or a named ref published by
    * [[Snapshots.tag]] — the reproducible-training handle readable
    * straight from SQL. */
  override def loadTable(ident: Identifier, version: String): Table =
    load(ident, Some(version))

  /** `TIMESTAMP AS OF t`: Spark hands micros since epoch. */
  override def loadTable(ident: Identifier, timestampMicros: Long): Table = {
    val path = tablePath(ident)
    if (!tableExists(ident)) throw new NoSuchTableException(ident)
    val v = Snapshots.versionAsOfTime(spark, path, timestampMicros / 1000L)
    requireNoMorDeletes(path, v)
    new SnapshotSqlTable(fullName(ident), path, v)
  }

  private def fullName(ident: Identifier): String =
    (catalogName +: ident.namespace() :+ ident.name()).mkString(".")

  private def load(ident: Identifier, version: Option[String]): Table = {
    val path = tablePath(ident)
    if (!tableExists(ident)) throw new NoSuchTableException(ident)
    val v = version match {
      case None => Snapshots.currentVersion(spark, path)
      case Some(s) => s.toIntOption
        .getOrElse(Snapshots.versionOfRef(spark, path, s))
    }
    requireNoMorDeletes(path, v)
    new SnapshotSqlTable(fullName(ident), path, v)
  }

  /** A DSv2 Scan produces rows from files; it cannot anti-join the
    * merge-on-read delete keys away. Refusing beats silently serving
    * deleted rows; folding restores SQL access. */
  private def requireNoMorDeletes(path: String, v: Int): Unit =
    if (Snapshots.hasMorDeletes(spark, path, v))
      throw new UnsupportedOperationException(
        s"SnapshotCatalog: $path@v$v carries merge-on-read delete " +
          "files the SQL scan cannot apply — fold them first " +
          "(Snapshots.compactDeletes) or read through the library API")

  // The store's writes are the library's transactional commits; SQL
  // DDL/DML would need the same reservation protocol to stay atomic.
  override def createTable(ident: Identifier, schema: StructType,
      partitions: Array[Transform],
      properties: util.Map[String, String]): Table =
    throw new UnsupportedOperationException(
      "SnapshotCatalog is read-only: create tables with " +
        "Snapshots.commitFull")
  override def alterTable(ident: Identifier,
      changes: TableChange*): Table =
    throw new UnsupportedOperationException(
      "SnapshotCatalog is read-only: evolve schemas through commits")
  override def dropTable(ident: Identifier): Boolean =
    throw new UnsupportedOperationException(
      "SnapshotCatalog is read-only: retention is Snapshots.vacuum")
  override def renameTable(oldIdent: Identifier,
      newIdent: Identifier): Unit =
    throw new UnsupportedOperationException(
      "SnapshotCatalog is read-only")
}

/** One snapshot table PINNED at `version`. Schema is the version's
  * recorded `_schema` (evolved reads null-fill old files; time travel
  * returns exactly that version's columns), falling back to the file
  * set's own schema for pre-tracking tables. */
private[sources] class SnapshotSqlTable(tableName: String,
    path: String, version: Int) extends Table with SupportsRead {

  override def name(): String = s"$tableName@v$version"

  override lazy val schema: StructType = {
    val spark = SparkSession.active
    Snapshots.schemaOf(spark, path, version)
      .getOrElse(Snapshots.readAsOf(spark, path, version).schema)
  }

  override def capabilities(): util.Set[TableCapability] =
    util.EnumSet.of(TableCapability.BATCH_READ)

  override def newScanBuilder(options: CaseInsensitiveStringMap)
      : ScanBuilder =
    new SnapshotScanBuilder(path, version, schema, options)
}

/** Pushdown seam: pushed filters drive MANIFEST pruning (file-level
  * skip, [[Snapshots.sqlPrunedPaths]]); every filter is also returned
  * as residual, so answers never depend on pruning; the pruned file
  * list then becomes a native [[ParquetTable]] scan (vectorized read +
  * column pruning — `pruneColumns` passes straight through). */
private[sources] class SnapshotScanBuilder(path: String, version: Int,
    tableSchema: StructType, options: CaseInsensitiveStringMap)
    extends ScanBuilder
    with SupportsPushDownFilters with SupportsPushDownRequiredColumns {

  private var pushed = Array.empty[Filter]
  private var required: StructType = tableSchema

  override def pushFilters(filters: Array[Filter]): Array[Filter] = {
    pushed = filters
    filters // all residual: pruning is an IO optimization, never a proof
  }

  override def pushedFilters(): Array[Filter] = pushed

  override def pruneColumns(requiredSchema: StructType): Unit =
    required = requiredSchema

  override def build(): Scan = {
    val spark = SparkSession.active
    val paths = Snapshots.sqlPrunedPaths(spark, path, version,
      pushed.toSeq)
    val pt = ParquetTable(s"graft-snap $path@v$version", spark,
      options, paths, Some(tableSchema), classOf[ParquetFileFormat])
    val inner = pt.newScanBuilder(options)
    inner.pruneColumns(required)
    inner.build()
  }
}
