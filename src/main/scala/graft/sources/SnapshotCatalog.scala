package graft.sources

import java.util

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.analysis.{NoSuchNamespaceException, NoSuchTableException}
import org.apache.spark.sql.connector.catalog.{Identifier, SupportsRead, SupportsWrite, Table, TableCapability, TableCatalog, TableChange}
import org.apache.spark.sql.connector.expressions.Transform
import org.apache.spark.sql.connector.read.{Scan, ScanBuilder, SupportsPushDownFilters, SupportsPushDownRequiredColumns}
import org.apache.spark.sql.connector.write.{LogicalWriteInfo, SupportsTruncate, V1Write, Write, WriteBuilder}
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
  * Writes: `INSERT INTO` appends and `INSERT OVERWRITE` replaces the
  * table — both through the LIBRARY's transactional commits
  * ([[Snapshots.commitAppend]] / [[Snapshots.commitFull]] via the
  * `V1Write` bridge), so SQL writers get the same reservation
  * protocol, OCC, schema evolution, and atomic pointer flip as
  * library writers, with nothing duplicated here. Writes land on the
  * CURRENT version under the current partition spec; a time-travel
  * handle (`VERSION AS OF`) refuses writes. DDL stays library-side
  * (create = commitFull, retention = vacuum).
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
    new SnapshotSqlTable(fullName(ident), path, v, timeTravel = true)
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
    new SnapshotSqlTable(fullName(ident), path, v,
      timeTravel = version.isDefined)
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

  // DDL stays library-side: table creation is a first commitFull,
  // schema evolution happens through commits, retention is vacuum.
  override def createTable(ident: Identifier, schema: StructType,
      partitions: Array[Transform],
      properties: util.Map[String, String]): Table =
    throw new UnsupportedOperationException(
      "SnapshotCatalog: create tables with Snapshots.commitFull " +
        "(SQL INSERT/OVERWRITE work once the table exists)")
  override def alterTable(ident: Identifier,
      changes: TableChange*): Table =
    throw new UnsupportedOperationException(
      "SnapshotCatalog: schemas evolve add-only through commits")
  override def dropTable(ident: Identifier): Boolean =
    throw new UnsupportedOperationException(
      "SnapshotCatalog: retention is Snapshots.vacuum")
  override def renameTable(oldIdent: Identifier,
      newIdent: Identifier): Unit =
    throw new UnsupportedOperationException(
      "SnapshotCatalog does not rename tables")
}

/** One snapshot table PINNED at `version`. Schema is the version's
  * recorded `_schema` (evolved reads null-fill old files; time travel
  * returns exactly that version's columns), falling back to the file
  * set's own schema for pre-tracking tables. `timeTravel` marks a
  * handle resolved through VERSION/TIMESTAMP AS OF — readable, never
  * writable (writing "into the past" has no meaning in a linear
  * version history). */
private[sources] class SnapshotSqlTable(tableName: String,
    path: String, version: Int, timeTravel: Boolean = false)
    extends Table with SupportsRead with SupportsWrite {

  override def name(): String = s"$tableName@v$version"

  override lazy val schema: StructType = {
    val spark = SparkSession.active
    Snapshots.schemaOf(spark, path, version)
      .getOrElse(Snapshots.readAsOf(spark, path, version).schema)
  }

  override def capabilities(): util.Set[TableCapability] =
    util.EnumSet.of(TableCapability.BATCH_READ,
      TableCapability.V1_BATCH_WRITE, TableCapability.TRUNCATE)

  override def newScanBuilder(options: CaseInsensitiveStringMap)
      : ScanBuilder =
    new SnapshotScanBuilder(path, version, schema, options)

  /** SQL writes ride the library's transactional commits through the
    * V1Write bridge: INSERT INTO → [[Snapshots.commitAppend]] (the
    * reservation protocol, add-only schema evolution, atomic pointer
    * flip — a concurrent writer fails clean, never lost-updates);
    * INSERT OVERWRITE (truncate) → [[Snapshots.commitFull]]. The
    * partition column is the CURRENT version's recorded spec. */
  override def newWriteBuilder(info: LogicalWriteInfo): WriteBuilder =
    new WriteBuilder with SupportsTruncate {
      private var replace = false
      override def truncate(): WriteBuilder = { replace = true; this }
      override def build(): Write = new V1Write {
        override def toInsertableRelation()
            : org.apache.spark.sql.sources.InsertableRelation =
          (data: org.apache.spark.sql.DataFrame, overwrite: Boolean) => {
            require(!timeTravel,
              s"SnapshotCatalog: cannot write to time-travel handle " +
                s"$tableName@v$version — writes land on the current " +
                "version only")
            val spark = data.sparkSession
            val cur = Snapshots.currentVersion(spark, path)
            val partCol = Snapshots.partSpecOf(spark, path, cur)
              .getOrElse(throw new UnsupportedOperationException(
                s"SnapshotCatalog: $path predates partition-spec " +
                  "tracking — re-commit once (commitFull) before " +
                  "writing through SQL"))
            if (replace || overwrite)
              Snapshots.commitFull(data, path, partCol)
            else Snapshots.commitAppend(data, path, partCol)
            ()
          }
      }
    }
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
