package graft.io

import java.nio.charset.StandardCharsets

import org.apache.hadoop.fs.{FileSystem, Path}
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Snapshot-versioned table on plain parquet — the table-format half of
  * the reference's "Consider Iceberg/Delta for transactional upserts and
  * time travel" roadmap item (reference `docs/design.md:168`; the upsert
  * half is [[graft.operators.Merge]] / [[graft.streaming.CdcView]]).
  *
  * Layout:
  * {{{
  *   table/
  *     data/c{N}/{partCol}={v}/part-*.parquet   immutable commit dirs
  *     _manifests/v{N}/                          checkpoint: complete
  *                                               file list+stats parquet
  *       — or, for delta versions —
  *     _manifests/v{N}/part-*.parquet            ONLY this commit's adds
  *     _manifests/v{N}/_delta_meta               partition tombstones
  *     _CURRENT                                  "vN", temp+rename publish
  *     _vacuum_floor                             "vN", temp+rename publish
  * }}}
  *
  * Manifests form a METADATA LOG (the Delta-Lake checkpoint/log shape):
  * most commits write only their own entries plus partition tombstones
  * (O(commit) metadata), and every [[CheckpointEvery]]-th commit
  * materializes the complete set plan-side into a fresh checkpoint, so
  * chains stay bounded and total metadata is proportional to data
  * written, not versions × files. [[manifestDF]] resolves a version by
  * walking to the nearest checkpoint and composing checkpoint + deltas
  * lazily — every downstream consumer (pruning, diffs, history,
  * streams) sees the same (path, partition, rows, stats) relation as
  * before.
  *
  * The contract that makes readers safe during rewrites:
  *
  *  - data files are IMMUTABLE — a commit writes only new files under
  *    its own `data/c{N}` dir and never touches or deletes existing
  *    ones (deletion is a separate, explicitly-retention-bounded
  *    [[vacuum]]);
  *  - a manifest names the COMPLETE file set of its version, so a read
  *    is: resolve one manifest, then scan exactly those files — a
  *    reader that resolved version N keeps returning version N's rows
  *    bit-for-bit while and after version N+1 replaces a partition,
  *    because nothing it references ever changes;
  *  - `_CURRENT` is published LAST via write-temp + rename (the
  *    [[IncrementalAgg]] pointer discipline, same crash-window
  *    self-heal): concurrent readers see the old complete version or
  *    the new complete version, never a mix — the half-swapped-
  *    partition window of purge+rewrite schemes closes.
  *
  * Manifests also carry per-file stats (row count, min/max of declared
  * columns, captured at commit time from the just-written files), so
  * planning can skip whole files on a range predicate WITHOUT opening
  * parquet footers — at 100 TB the footer stampede of a 4000-file
  * listing is itself a cost, and manifest pruning turns "which files
  * can match?" into one metadata read ([[readRange]]).
  *
  * Scale shape: a commit's cost is the rewritten partition plus an
  * O(files) metadata job, and the carried-forward manifest flows
  * manifest→manifest INSIDE a DataFrame plan — pruning, version
  * diffs, and history aggregates likewise run plan-side over
  * [[manifestDF]], so the driver materializes only pruned file lists,
  * per-version summaries, and the commit's own fresh entries, never
  * the full file history (ManifestScaleSpec pins this on a 100k-file
  * manifest). The irreducible driver lists are the path array a
  * full-version scan hands to the parquet reader (Spark's own
  * InMemoryFileIndex class of cost) and vacuum's live-path set.
  */
object Snapshots {

  /** min/max of one column in one file, stringified; `typ` picks the
    * comparison domain back (numeric vs lexicographic). Null lo/hi =
    * all-null column in that file = never prunable. */
  case class StatRange(typ: String, lo: String, hi: String)

  /** One file of one version: path relative to the table root, the
    * partition value it belongs to, rows, declared-column stats, and
    * the PARTITION SPEC (the partCol name) the file was committed
    * under — None for files written before spec tracking. The spec is
    * what makes partition-spec EVOLUTION transactional: two eras of one
    * table can carry colliding partition VALUES under different specs,
    * and a whole-partition tombstone only reaches files of its own
    * era (see [[manifestDF]]).
    *
    * `kind` distinguishes DATA files (None) from merge-on-read DELETE
    * files (`Some("delete:<keyCol>")` — an equality-delete key set,
    * see [[deleteRowsMoR]]); `seq` is the commit version that added
    * the file (None for pre-MoR manifests, ordered as 0). A delete
    * file suppresses matching rows only in data files with a LOWER
    * seq — the Iceberg-v2 sequence rule that makes re-inserting a
    * deleted key after the delete work, and makes folded rewrites
    * (whose files carry a newer seq) immune to the deletes they
    * already applied. */
  case class FileEntry(path: String, partition: String, rows: Long,
      stats: Map[String, StatRange], spec: Option[String] = None,
      kind: Option[String] = None, seq: Option[Int] = None)

  private def fs(spark: SparkSession, p: String): FileSystem =
    new Path(p).getFileSystem(spark.sparkContext.hadoopConfiguration)

  // ---- version pointer (IncrementalAgg discipline) --------------------

  def currentVersion(spark: SparkSession, table: String): Int = {
    val f = fs(spark, table)
    val cur = new Path(table, "_CURRENT")
    val tmp = new Path(table, "_CURRENT.tmp")
    // legacy crash heal: pre-round-11 publishes could die between
    // delete(cur) and rename(tmp, cur). Promote the tmp ONLY when it
    // parses — an EMPTY or half-written tmp is a LIVE legacy writer
    // mid-publish, and promoting it hands every reader a corrupt
    // pointer (the round-11 concurrent-audit race: NumberFormat-
    // Exception on "" under 3-way parallel appends).
    if (!f.exists(cur) && f.exists(tmp) &&
        scala.util.Try(
          readSmallFile(f, tmp).trim.stripPrefix("v").toInt).isSuccess)
      f.rename(tmp, cur)
    if (!f.exists(cur)) 0
    else readSmallFile(f, cur).trim.stripPrefix("v").toInt
  }

  /** Atomic pointer flip. The old delete(cur)→rename(tmp, cur) dance
    * had two windows a concurrent reader could fall into (missing
    * pointer; half-written SHARED tmp promoted by the reader heal).
    * The tmp is writer-unique so no publisher can truncate another's
    * in-flight file, and the flip is [[atomicReplace]] — readers
    * always observe a complete pointer. FileContext bypasses
    * ChecksumFileSystem, so any legacy `._CURRENT.crc` sidecar is
    * dropped first (stale crc over new bytes fails every subsequent
    * read). */
  private[io] def publish(spark: SparkSession, table: String, v: Int): Unit = {
    val f = fs(spark, table)
    val cur = f.makeQualified(new Path(table, "_CURRENT"))
    val tmp = f.makeQualified(new Path(table,
      s"_CURRENT.${java.util.UUID.randomUUID}.tmp"))
    val fc = org.apache.hadoop.fs.FileContext.getFileContext(
      cur.toUri, spark.sparkContext.hadoopConfiguration)
    val out = fc.create(tmp,
      java.util.EnumSet.of(org.apache.hadoop.fs.CreateFlag.CREATE,
        org.apache.hadoop.fs.CreateFlag.OVERWRITE))
    try out.write(s"v$v".getBytes(StandardCharsets.UTF_8))
    finally out.close()
    f.delete(new Path(cur.getParent, "." + cur.getName + ".crc"), false)
    atomicReplace(fc, tmp, cur)
    sweepStaleTmps(f, new Path(table), cur.getName)
  }

  /** Rename `tmp` onto `dst` with NO window where `dst` is missing.
    * On HDFS/object stores FileContext.rename(OVERWRITE) is an atomic
    * server-side replace. On the LOCAL filesystem Hadoop's overwrite
    * rename is delete(dst)-then-rename — the round-12 snapshot SOAK
    * measured a reader inside that gap resolving currentVersion to 0
    * on a published table — so local paths take POSIX rename(2)
    * directly (Files.move ATOMIC_MOVE replaces atomically), the same
    * scheme dispatch [[reserve]] uses for its O_EXCL. */
  private[io] def atomicReplace(
      fc: org.apache.hadoop.fs.FileContext, tmp: Path, dst: Path): Unit = {
    val scheme = Option(dst.toUri.getScheme).getOrElse("file")
    if (scheme == "file")
      java.nio.file.Files.move(
        java.nio.file.Paths.get(tmp.toUri.getPath),
        java.nio.file.Paths.get(dst.toUri.getPath),
        java.nio.file.StandardCopyOption.ATOMIC_MOVE)
    else fc.rename(tmp, dst, org.apache.hadoop.fs.Options.Rename.OVERWRITE)
  }

  /** Best-effort reclaim of writer-unique `_CURRENT.<uuid>.tmp` files a
    * publisher that crashed between create and rename left behind —
    * without a sweep they accumulate forever (the heal only promotes
    * the legacy shared-name tmp). Age-gated well past any publish's
    * create→rename span so a LIVE writer's in-flight tmp is never
    * touched; every failure is swallowed (the publish already
    * succeeded). */
  private[io] def sweepStaleTmps(f: FileSystem, dir: Path,
      pointerName: String, maxAgeMs: Long = 15 * 60 * 1000L): Unit =
    try {
      val cutoff = System.currentTimeMillis() - maxAgeMs
      f.listStatus(dir).foreach { st =>
        val n = st.getPath.getName
        if (st.isFile && n.startsWith(pointerName + ".") &&
            n.endsWith(".tmp") && n != pointerName + ".tmp" &&
            st.getModificationTime < cutoff)
          try f.delete(st.getPath, false)
          catch { case scala.util.control.NonFatal(_) => () }
      }
    } catch { case scala.util.control.NonFatal(_) => () }

  private def manifestDir(table: String, v: Int) = s"$table/_manifests/v$v"

  private def readSmallFile(f: FileSystem, p: Path): String = {
    val in = f.open(p)
    try {
      val buf = new java.io.ByteArrayOutputStream()
      val chunk = new Array[Byte](4096)
      var r = in.read(chunk)
      while (r > 0) { buf.write(chunk, 0, r); r = in.read(chunk) }
      new String(buf.toByteArray, StandardCharsets.UTF_8)
    } finally in.close()
  }

  // ---- retention floor -------------------------------------------------

  private def floorPath(table: String) = new Path(table, "_vacuum_floor")

  /** Retention floor published by the most recent [[vacuum]]: versions
    * below it are VACUUMED — their data files may be reclaimed and
    * fresh resolutions fail — even while their manifest dirs linger
    * through vacuum's one-cycle grace period (which exists for
    * in-flight lazy plans, not new readers). */
  def retentionFloor(spark: SparkSession, table: String): Int = {
    val f = fs(spark, table)
    val p = floorPath(table)
    // crash-window self-heal (the _CURRENT discipline): a writer that
    // died between delete(old floor) and rename(tmp) left only the tmp —
    // without recovery the floor would silently REGRESS to 1 and graced
    // versions whose data files vacuum already reclaimed would resolve
    // again, failing readers at action time instead of with the clean
    // retention error ("floors never regress" broken)
    val tmp = new Path(table, "_vacuum_floor.tmp")
    if (!f.exists(p) && f.exists(tmp)) f.rename(tmp, p)
    if (!f.exists(p)) 1
    else readSmallFile(f, p).trim.stripPrefix("v").toInt
  }

  /** Floor publish, same discipline as [[publish]]: writer-unique tmp
    * + [[atomicReplace]]. The old shared-name tmp + delete + rename had
    * two soak-measured reader hazards: the missing-floor gap (floors
    * transiently regress to 1) and a racing publish's `create(tmp,
    * overwrite)` TRUNCATING the tmp while the reader heal promoted it —
    * retentionFloor then read an empty floor file and threw
    * NumberFormatException. The legacy heal in [[retentionFloor]]
    * remains for tables last written by the old code. */
  private def publishFloor(spark: SparkSession, table: String, v: Int)
      : Unit = {
    val f = fs(spark, table)
    val cur = f.makeQualified(floorPath(table))
    val tmp = f.makeQualified(new Path(table,
      s"_vacuum_floor.${java.util.UUID.randomUUID}.tmp"))
    val fc = org.apache.hadoop.fs.FileContext.getFileContext(
      cur.toUri, spark.sparkContext.hadoopConfiguration)
    val out = fc.create(tmp,
      java.util.EnumSet.of(org.apache.hadoop.fs.CreateFlag.CREATE,
        org.apache.hadoop.fs.CreateFlag.OVERWRITE))
    try out.write(s"v$v".getBytes(StandardCharsets.UTF_8))
    finally out.close()
    // FileContext writes no checksum sidecar; a stale crc from the old
    // f.create-based publishes would fail every later checksummed read
    f.delete(new Path(cur.getParent, "." + cur.getName + ".crc"), false)
    atomicReplace(fc, tmp, cur)
    sweepStaleTmps(f, new Path(table), cur.getName)
  }

  // ---- named refs (tags) ------------------------------------------------
  //
  // A `_refs/<name>` file beside the metadata log pins one version
  // under a human name — the reproducible-training handle ("the v the
  // model saw" as `train-2026-08`, not an integer in a notebook; the
  // Iceberg tag concept, reference `docs/design.md:168`'s "at scale"
  // clause). Same publish discipline as `_CURRENT` (write-temp +
  // rename, crash-window self-heal on read), and [[vacuum]] refuses to
  // reclaim below any tagged version: the retention floor CLAMPS to
  // the lowest tag, so a pinned training snapshot survives every
  // routine vacuum until its tag is deleted.

  private def refsDir(table: String) = new Path(table, "_refs")

  private def refPath(table: String, name: String): Path = {
    require(name.matches("[A-Za-z0-9][A-Za-z0-9._-]*")
        && !name.endsWith(".tmp"),
      s"Snapshots: invalid ref name '$name' (letters/digits/._- only, " +
        "must not end with .tmp)")
    new Path(refsDir(table), name)
  }

  /** Pin version `v` under `name`. Tags are immutable: re-tagging the
    * same name is idempotent at the same version and refused at a
    * different one unless `replace = true` (an explicit retarget, the
    * audit-visible operation). Tagging a vacuumed version is refused —
    * a tag is a retention promise and must be made while the version
    * is still retained. */
  def tag(spark: SparkSession, table: String, name: String, v: Int,
      replace: Boolean = false): Unit = {
    val f = fs(spark, table)
    val cur = currentVersion(spark, table)
    require(v >= 1 && v <= cur,
      s"Snapshots.tag: version $v does not exist under $table")
    require(v >= retentionFloor(spark, table),
      s"Snapshots.tag: v$v of $table is below the retention floor " +
        "(vacuumed versions cannot be tagged)")
    val p = refPath(table, name)
    versionOfRefOpt(spark, table, name).foreach { existing =>
      if (existing == v) return // idempotent re-publish
      require(replace,
        s"Snapshots.tag: ref '$name' already pins v$existing of $table " +
          s"(pass replace=true to retarget to v$v)")
    }
    f.mkdirs(refsDir(table))
    // publishFloor discipline: a WRITER-UNIQUE tmp + atomicReplace. The
    // old shared-name `$name.tmp` + delete(p) + rename had a lost-ref
    // window on FIRST publish (and after deleteTag): a concurrent
    // reader's crash heal could rename our in-flight tmp into place,
    // then our delete(p) removed the correctly-published ref and the
    // re-read found nothing — tag threw while the ref transiently
    // vanished. A uuid tmp is invisible to the heal (which only
    // promotes the legacy shared name), and atomicReplace both creates
    // and replaces with no missing-dst window.
    val qp = f.makeQualified(p)
    val tmp = f.makeQualified(new Path(refsDir(table),
      s"$name.${java.util.UUID.randomUUID}.tmp"))
    val fc = org.apache.hadoop.fs.FileContext.getFileContext(
      qp.toUri, spark.sparkContext.hadoopConfiguration)
    val out = fc.create(tmp,
      java.util.EnumSet.of(org.apache.hadoop.fs.CreateFlag.CREATE,
        org.apache.hadoop.fs.CreateFlag.OVERWRITE))
    try out.write(s"v$v".getBytes(StandardCharsets.UTF_8))
    finally out.close()
    // drop any legacy checksum sidecar (the publish/publishFloor rule:
    // FileContext writes none; a stale crc fails later checksummed reads)
    f.delete(new Path(qp.getParent, "." + qp.getName + ".crc"), false)
    atomicReplace(fc, tmp, qp)
    sweepStaleTmps(f, refsDir(table), name)
  }

  private def versionOfRefOpt(spark: SparkSession, table: String,
      name: String): Option[Int] = {
    val f = fs(spark, table)
    val p = refPath(table, name)
    // crash-window self-heal (the _CURRENT discipline)
    val tmp = new Path(refsDir(table), s"$name.tmp")
    if (!f.exists(p) && f.exists(tmp)) f.rename(tmp, p)
    if (!f.exists(p)) None
    else Some(readSmallFile(f, p).trim.stripPrefix("v").toInt)
  }

  /** The version a ref pins. */
  def versionOfRef(spark: SparkSession, table: String, name: String): Int =
    versionOfRefOpt(spark, table, name).getOrElse(
      throw new IllegalArgumentException(
        s"Snapshots.versionOfRef: no ref '$name' under $table"))

  /** Read the snapshot a ref pins — exactly [[readAsOf]] of its
    * version. */
  def readRef(spark: SparkSession, table: String, name: String): DataFrame =
    readAsOf(spark, table, versionOfRef(spark, table, name))

  /** Drop a ref; its version becomes reclaimable by the NEXT vacuum.
    * Returns whether the ref existed. */
  def deleteTag(spark: SparkSession, table: String, name: String): Boolean =
    fs(spark, table).delete(refPath(table, name), false)

  /** All published refs, (name, version), name-sorted. Metadata-only
    * (one dir listing — O(refs)). */
  def listRefs(spark: SparkSession, table: String): Seq[(String, Int)] = {
    val f = fs(spark, table)
    val dir = refsDir(table)
    if (!f.exists(dir)) Nil
    else f.listStatus(dir).toSeq
      .map(_.getPath.getName)
      .filterNot(_.endsWith(".tmp"))
      .flatMap(n => versionOfRefOpt(spark, table, n).map(n -> _))
      .sortBy(_._1)
  }

  // ---- schema tracking (add-only evolution) ----------------------------
  //
  // Every version records the table schema it was committed under as a
  // `_schema` JSON file in its manifest dir (underscore name: invisible
  // to the parquet reader sharing the dir). Append/overwrite commits
  // MERGE their frame's schema into the previous version's — new
  // columns append (nullable: files written before the change simply
  // lack them), common columns must keep their exact type (a type
  // change needs a rewrite, not an evolution — the Iceberg add-only
  // contract). Reads resolve a version's file list AND its schema, and
  // scan with the schema EXPLICIT: Spark's parquet reader null-fills
  // columns a file lacks, so a 100 TB history never rewrites for a new
  // column, never pays a mergeSchema footer stampede, and time travel
  // to a pre-change version returns exactly that version's columns.

  private def schemaPath(table: String, v: Int) =
    new Path(manifestDir(table, v), "_schema")

  // ---- partition-spec tracking (spec evolution) -----------------------
  //
  // Every version records the PARTITION SPEC (the partCol) it was
  // committed under as a `_partspec` file beside `_schema` — the
  // Iceberg spec-evolution sibling of schema tracking. A growing table
  // can re-partition (date → type) WITHOUT a rewrite: new commits
  // write the new spec, their files carry it in the manifest, and
  // resolution unions the eras while whole-partition tombstones stay
  // scoped to their own era (colliding partition VALUES across specs
  // cannot cross-delete — see [[manifestDF]]). Reads prune either era
  // through the same per-file stats ([[readWhere]]), so the new layout
  // benefits new data immediately and old data is never rewritten.
  //
  // COMPOSITE specs (date → (date, type)) are a derived column: commit
  // with partCol = a `concat(date, '/', type)` column — the composite
  // string IS the spec ("date_type"), its values partition exactly,
  // tombstones scope to it, and per-component pruning rides statsCols
  // on the underlying columns (the [[readWhere]] path), which is how
  // component predicates prune files in ANY era.

  private def partSpecPath(table: String, v: Int) =
    new Path(manifestDir(table, v), "_partspec")

  private[io] def writePartSpec(spark: SparkSession, table: String, v: Int,
      partCol: String): Unit = {
    val f = fs(spark, table)
    f.mkdirs(new Path(manifestDir(table, v)))
    val out = f.create(partSpecPath(table, v), true)
    try out.write(partCol.getBytes(StandardCharsets.UTF_8))
    finally out.close()
  }

  /** The partition spec (partCol) version `v` was committed under;
    * None for versions written before spec tracking. */
  def partSpecOf(spark: SparkSession, table: String, v: Int)
      : Option[String] = {
    val f = fs(spark, table)
    val p = partSpecPath(table, v)
    try {
      if (!f.exists(p)) None
      else Some(readSmallFile(f, p).trim).filter(_.nonEmpty)
    } catch {
      // graced manifest dirs can be reclaimed between probe and open
      // (the schemaOf discipline)
      case _: java.io.FileNotFoundException => None
    }
  }

  private[io] def writeSchema(spark: SparkSession, table: String, v: Int,
      schema: org.apache.spark.sql.types.StructType): Unit = {
    val f = fs(spark, table)
    f.mkdirs(new Path(manifestDir(table, v)))
    val out = f.create(schemaPath(table, v), true)
    try out.write(schema.json.getBytes(StandardCharsets.UTF_8))
    finally out.close()
  }

  /** The schema version `v` was committed under; None only for tables
    * written before schema tracking (those read as before — schema
    * from the scanned files themselves). */
  def schemaOf(spark: SparkSession, table: String, v: Int)
      : Option[org.apache.spark.sql.types.StructType] = {
    val f = fs(spark, table)
    val p = schemaPath(table, v)
    try {
      if (!f.exists(p)) None
      else Some(org.apache.spark.sql.types.DataType
        .fromJson(readSmallFile(f, p))
        .asInstanceOf[org.apache.spark.sql.types.StructType])
    } catch {
      // a graced manifest dir can be reclaimed between the exists
      // probe and the open (vacuum churn); fall back to the legacy
      // schema-from-files read — the same in-flight-plan failure mode
      // the grace period already bounds, not a new one
      case _: java.io.FileNotFoundException => None
    }
  }

  /** prev ++ columns new to `next`, add-only: a common column changing
    * type is refused (fail-fast — silently casting would corrupt the
    * old files' reads). All fields go nullable: an evolved read must
    * null-fill added columns in old files and dropped-from-the-frame
    * columns in new ones. */
  private def evolveSchema(
      prev: org.apache.spark.sql.types.StructType,
      next: org.apache.spark.sql.types.StructType, op: String)
      : org.apache.spark.sql.types.StructType = {
    val prevByName = prev.fields.map(f => f.name.toLowerCase -> f).toMap
    next.fields.foreach { f =>
      prevByName.get(f.name.toLowerCase).foreach { p =>
        require(p.dataType == f.dataType,
          s"Snapshots.$op: schema evolution is add-only — column " +
            s"'${f.name}' cannot change ${p.dataType} -> ${f.dataType} " +
            "(a type change needs a table rewrite)")
      }
    }
    val added = next.fields
      .filterNot(f => prevByName.contains(f.name.toLowerCase))
    org.apache.spark.sql.types.StructType(
      (prev.fields ++ added).map(_.copy(nullable = true)))
  }

  /** The schema an evolving commit on top of `prev` publishes. Legacy
    * adoption (a table written before schema tracking) resolves the
    * CARRIED files' merged schema and evolves it against the frame's —
    * adopting only `df.schema` would silently drop carried-file-only
    * columns from every evolved read, and a type conflict with carried
    * files would surface at scan time instead of refusing the commit.
    * The mergeSchema footer pass is paid exactly once per pre-tracking
    * table (every later commit finds a recorded `_schema`). */
  private def commitSchema(spark: SparkSession, table: String, prev: Int,
      df: DataFrame, op: String)
      : org.apache.spark.sql.types.StructType =
    schemaOf(spark, table, prev) match {
      case Some(s) => evolveSchema(s, df.schema, op)
      case None =>
        // data files only: a merge-on-read delete file's key-set
        // schema must never leak into the table schema (unreachable
        // in practice — deleteRowsMoR requires schema tracking — but
        // the filter keeps the invariant local)
        val carriedPaths = allEntries(spark, table, prev)._1.map(_._1)
        val carried = spark.read.option("mergeSchema", "true")
          .parquet(carriedPaths.map(p => s"$table/$p"): _*).schema
        evolveSchema(carried, df.schema, op)
    }

  /** [[commitSchema]] validated BEFORE any data write: an add-only
    * violation must refuse the commit with nothing on disk and the
    * version slot released, not strand a half-written version. */
  private def validatedSchema(spark: SparkSession, table: String,
      prev: Int, df: DataFrame, op: String, v: Int)
      : org.apache.spark.sql.types.StructType =
    try commitSchema(spark, table, prev, df, op)
    catch {
      case e: Throwable => breakReservation(spark, table, v); throw e
    }

  // ---- delta manifests + checkpoints (metadata log) -------------------
  //
  // A version's manifest dir is either a CHECKPOINT (parquet holding the
  // complete file set — the original layout, so pre-existing tables read
  // unchanged) or a DELTA: parquet holding only the commit's own fresh
  // entries plus a `_delta_meta` file naming the partitions the commit
  // replaced (tombstones). Resolution walks back to the nearest
  // checkpoint and unions checkpoint + deltas, dropping rows whose
  // partition was replaced by a LATER delta — the Delta-Lake
  // checkpoint/log shape (public docs), with partition-level tombstones
  // because replacement here is always whole-partition. Every
  // [[CheckpointEvery]]-th commit materializes a fresh checkpoint, so a
  // chain is bounded and per-commit metadata cost is O(commit) amortized
  // instead of O(table files): at 100 TB with years of commits, the
  // metadata under `_manifests/` stays proportional to data written, not
  // versions × files.

  private val CheckpointEvery = 8

  /** Tombstones + whether the version wrote any add segment, plus the
    * partition spec the removing commit ran under (None for metas
    * written before spec tracking). Underscore name keeps the file
    * invisible to the parquet reader sharing the dir. */
  private[io] case class DeltaMeta(removes: Seq[String], hasAdds: Boolean,
      spec: Option[String] = None)

  private def deltaMetaPath(table: String, v: Int) =
    new Path(manifestDir(table, v), "_delta_meta")

  /** Pointer to an immutable re-checkpoint written by vacuum's
    * retention-floor compaction: its content names the `_ckpt_<id>`
    * subdir holding the materialized complete file set. Presence
    * OVERRIDES `_delta_meta` — the version resolves as a checkpoint.
    * The superseded delta part files and meta stay in place untouched
    * (an in-flight reader's plan holds their exact file names; deleting
    * or renaming them mid-scan is the FILE_NOT_EXIST race the scale
    * stress spec caught) and fall out only when the whole version dir
    * ages below a later retention floor. Underscore names keep both the
    * pointer and the subdir invisible to a parquet scan of the parent
    * dir, so readers planned BEFORE the compaction keep reading the old
    * layout unperturbed. */
  private def ckptPtrPath(table: String, v: Int) =
    new Path(manifestDir(table, v), "_ckpt_ptr")

  private def readCkptPtr(spark: SparkSession, table: String, v: Int)
      : Option[String] = {
    val f = fs(spark, table)
    val p = ckptPtrPath(table, v)
    if (!f.exists(p)) None
    else Some(readSmallFile(f, p).trim)
  }

  /** Where this version's checkpoint parquet lives: the re-checkpoint
    * subdir when a `_ckpt_ptr` has been published, else the version dir
    * itself (the original layout). */
  private def checkpointParquetDir(spark: SparkSession, table: String,
      v: Int): String =
    readCkptPtr(spark, table, v) match {
      case Some(id) => new Path(manifestDir(table, v), s"_ckpt_$id").toString
      case None => manifestDir(table, v)
    }

  private[io] def readDeltaMeta(spark: SparkSession, table: String, v: Int)
      : Option[DeltaMeta] = {
    val f = fs(spark, table)
    val p = deltaMetaPath(table, v)
    if (readCkptPtr(spark, table, v).isDefined) None
    else if (!f.exists(p)) None
    else {
      val txt = readSmallFile(f, p)
      val kv = txt.split('\n').filter(_.contains('='))
        .map { l => val i = l.indexOf('='); l.take(i) -> l.drop(i + 1) }
        .toMap
      val removes = kv.getOrElse("removes", "") match {
        case "" => Nil
        case s => s.split(',').toSeq
          .map(java.net.URLDecoder.decode(_, "UTF-8"))
      }
      Some(DeltaMeta(removes, kv.get("adds").contains("true"),
        kv.get("spec").filter(_.nonEmpty)
          .map(java.net.URLDecoder.decode(_, "UTF-8"))))
    }
  }

  /** Write one delta version: the commit's own entries (tiny) plus the
    * tombstone meta — never the carried file set. */
  private[io] def writeDelta(spark: SparkSession, table: String, v: Int,
      adds: Seq[FileEntry], removes: Seq[String],
      spec: Option[String] = None): Unit = {
    val f = fs(spark, table)
    if (adds.nonEmpty)
      writeManifestEntries(spark, manifestDir(table, v), adds)
    else f.mkdirs(new Path(manifestDir(table, v)))
    val out = f.create(deltaMetaPath(table, v), true)
    try out.write(
      (s"removes=${removes.map(java.net.URLEncoder.encode(_, "UTF-8"))
        .mkString(",")}\n" +
        s"adds=${adds.nonEmpty}\n" +
        s"spec=${spec.map(java.net.URLEncoder.encode(_, "UTF-8"))
          .getOrElse("")}\n").getBytes(StandardCharsets.UTF_8))
    finally out.close()
  }

  /** One walk down from `v` to the nearest checkpoint, reading each
    * version's `_delta_meta` (and its ckpt-ptr override) EXACTLY once:
    * returns (base checkpoint version, chain metas ascending). Both
    * [[baseOf]] and [[manifestDF]] consume this walk — before the
    * factoring, resolving one delta version re-read every meta across
    * baseOf's walk AND the rebuild (O(chain²) filesystem round-trips
    * per resolution, repeated per version by [[history]]; on an object
    * store each is a network request). The base is still DERIVED,
    * never stored, so re-checkpointing a version in place (vacuum's
    * retention-floor compaction) transparently re-bases every later
    * delta; chain length is bounded by [[CheckpointEvery]]. */
  private def chainOf(spark: SparkSession, table: String, v: Int)
      : (Int, List[(Int, DeltaMeta)]) = {
    var w = v
    var metas = List.empty[(Int, DeltaMeta)]
    var m = if (w >= 1) readDeltaMeta(spark, table, w) else None
    while (w >= 1 && m.isDefined) {
      metas = (w -> m.get) :: metas
      w -= 1
      m = if (w >= 1) readDeltaMeta(spark, table, w) else None
    }
    require(w >= 1 &&
      fs(spark, table).exists(new Path(manifestDir(table, w))),
      s"Snapshots: no checkpoint at or below v$v of $table " +
        "(base manifest vacuumed)")
    (w, metas)
  }

  /** Nearest checkpoint at or below `v` — the resolution base. */
  private def baseOf(spark: SparkSession, table: String, v: Int): Int =
    chainOf(spark, table, v)._1

  /** Does a tombstone from a commit under `rspec` reach a manifest row?
    * Only within the same ERA: both specs known and different → the row
    * is another era's file and survives. Either side unknown (legacy
    * data or legacy meta) → the pre-evolution behavior: value match
    * alone removes. */
  private def specCompat(rowSpec: Column, rspec: Column): Column =
    rowSpec.isNull || rspec.isNull || rowSpec === rspec

  /** Route one commit's manifest: checkpoint (complete set, plan-side
    * carry) when the chain would exceed [[CheckpointEvery]], else a
    * delta of just the commit's own entries + tombstones. `spec` is the
    * commit's partition spec — tombstones it writes reach only files of
    * the same era. */
  private def commitManifest(spark: SparkSession, table: String, v: Int,
      prev: Int, adds: Seq[FileEntry], removes: Seq[String],
      spec: Option[String] = None): Unit = {
    import spark.implicits._
    if (prev == 0) writeManifest(spark, table, v, adds)
    else if (v - baseOf(spark, table, prev) >= CheckpointEvery) {
      val carried =
        if (removes.isEmpty) manifestDF(spark, table, prev)
        else manifestDF(spark, table, prev)
          .where(!(col("partition").isin(removes: _*) &&
            specCompat(col("spec"),
              lit(spec.orNull).cast("string"))))
      writeManifestDF(spark, carried.unionByName(adds.toDS().toDF()),
        table, v)
    } else writeDelta(spark, table, v, adds, removes, spec)
  }

  /** Another writer holds the next version slot; re-read the current
    * version and retry AFTER it publishes (retrying before would base
    * the new manifest on a stale file set — the lost-update anomaly the
    * reservation exists to prevent). */
  final class ConcurrentCommitException(table: String, v: Int)
    extends RuntimeException(
      s"version v$v of $table is reserved by another writer; " +
        "retry after it publishes")

  /** Optimistic concurrency: a commit must RESERVE currentVersion+1
    * before writing anything — exactly one writer per version slot, and
    * only the slot directly above the published version can ever be
    * reserved, so a racing writer can never base its manifest on a
    * version that is about to be superseded.
    *
    * The test-and-set must be ATOMIC per filesystem. On HDFS/object
    * stores `create(path, overwrite=false)` is; on the LOCAL filesystem
    * it is exists-then-create — two threads could both pass the exists
    * probe, both "win" the slot, and both write the same commit dir,
    * where one job committer's cleanup deletes the other's _temporary
    * tree mid-write (measured: TASK_WRITE_FAILED under a 3-way
    * concurrent audit append). Local paths therefore use
    * `java.io.File.createNewFile` — POSIX O_CREAT|O_EXCL, the atomic
    * primitive. */
  private[graft] def reserve(spark: SparkSession, table: String, v: Int)
      : Unit = {
    val f = fs(spark, table)
    val marker = new Path(table, s"_commits/v$v.reserved")
    f.mkdirs(marker.getParent)
    val scheme = Option(marker.toUri.getScheme)
      .getOrElse(Option(f.getUri).map(_.getScheme).getOrElse("file"))
    if (scheme == "file") {
      val local = new java.io.File(
        new Path(f.makeQualified(marker).toUri.getPath).toString)
      val won =
        try local.createNewFile()
        catch { case _: java.io.IOException => false }
      if (!won) throw new ConcurrentCommitException(table, v)
    } else {
      try f.create(marker, false).close()
      catch {
        case _: java.io.IOException =>
          throw new ConcurrentCommitException(table, v)
      }
    }
  }

  /** Operator override for a reservation orphaned by a crashed writer
    * (the writer is verifiably dead and never published). Until broken,
    * an orphan blocks all commits — fail-stop beats silent lost
    * updates. */
  def breakReservation(spark: SparkSession, table: String, v: Int): Boolean =
    fs(spark, table).delete(new Path(table, s"_commits/v$v.reserved"), false)

  /** The manifest as a LAZY relation — the planning surface every
    * heavy path below builds on: pruning, version diffs, and history
    * aggregates run inside the DataFrame plan, and only their
    * (pruned/diffed/aggregated) RESULTS are collected. At 100 TB with
    * years of commits the manifest union is O(total files); holding it
    * as a plan instead of a driver Seq is what keeps driver memory
    * bounded by the answer, not the history (the Iceberg
    * distributed-manifest-read shape). */
  def manifestDF(spark: SparkSession, table: String, v: Int): DataFrame = {
    require(v >= 1 && v <= currentVersion(spark, table),
      s"Snapshots: version $v does not exist under $table")
    // below-floor versions are vacuumed even while their manifest dirs
    // linger through the one-cycle grace period (see [[vacuum]]) —
    // fresh resolutions must fail with the clean retention error, not
    // scan a version whose data files are already reclaimed
    val floor = retentionFloor(spark, table)
    require(v >= floor,
      s"Snapshots: manifest v$v has been vacuumed from $table " +
        s"(retention floor is v$floor)")
    val dir = manifestDir(table, v)
    require(fs(spark, table).exists(new Path(dir)),
      s"Snapshots: manifest v$v has been vacuumed from $table")
    // manifests read under ONE explicit schema: pre-spec/pre-MoR files
    // simply null-fill the columns they lack (the parquet reader's
    // missing-column rule — the same normalization the old per-frame
    // withColumn shims did), and no manifest read ever pays a footer
    // schema-inference job (guide §1.2: the schema is a constant of the
    // format, not something to rediscover per read)
    def readManifestDir(dir: String): DataFrame =
      spark.read.schema(ManifestSchema).parquet(dir)
    chainOf(spark, table, v) match {
      case (_, Nil) => // checkpoint: the complete set
        readManifestDir(checkpointParquetDir(spark, table, v))
      case (b, metas) =>
        // delta chain: nearest checkpoint + each delta's adds, tagged
        // with their origin version; a row survives unless its
        // partition carries a SAME-ERA tombstone from a LATER version
        // (an overwrite's own adds survive their own tombstone, and a
        // tombstone never reaches another spec's era even when the
        // partition VALUES collide). All of it composes lazily —
        // downstream pruning/diff/aggregation still runs over one plan.
        val segs =
          readManifestDir(checkpointParquetDir(spark, table, b))
            .withColumn("_origin", lit(b)) +:
            metas.collect { case (w, m) if m.hasAdds =>
              readManifestDir(manifestDir(table, w))
                .withColumn("_origin", lit(w))
            }
        val all = segs.reduce(_.unionByName(_))
        val removeRows = metas.flatMap { case (w, m) =>
          m.removes.map(r => (r, w, m.spec.orNull))
        }
        if (removeRows.isEmpty) all.drop("_origin")
        else {
          import spark.implicits._
          // anti-join: a row dies iff ANY later same-era tombstone
          // names its partition — multiplicity-safe when the same
          // value was overwritten under different specs
          val rm = broadcast(removeRows.toDF("_rpart", "_rmv", "_rspec"))
          all.join(rm,
            col("partition") === col("_rpart") &&
              col("_origin") < col("_rmv") &&
              specCompat(col("spec"), col("_rspec")),
            "left_anti")
            .drop("_origin")
        }
    }
  }

  /** Full manifest materialized to the driver — the debug/API surface
    * (specs, operator tooling). Internal planning paths use
    * [[manifestDF]] + targeted collects instead. */
  def readManifest(spark: SparkSession, table: String, v: Int)
      : Seq[FileEntry] = {
    import spark.implicits._
    manifestDF(spark, table, v).as[FileEntry].collect().toSeq
  }

  /** Data-file paths of one version — the minimal driver
    * materialization a full-version scan needs (Spark's reader takes a
    * path list; its own InMemoryFileIndex is the same O(files) class).
    * Stats maps stay out of driver memory. */
  private def manifestPaths(spark: SparkSession, table: String, v: Int)
      : Seq[String] = {
    import spark.implicits._
    manifestDF(spark, table, v).select("path").as[String].collect().toSeq
  }

  // ---- commits --------------------------------------------------------

  /** Can `t`'s min/max be recovered from parquet FOOTER statistics in
    * the same comparison domain the scan-based read-back produced?
    *  - integral / decimal / float / double: pruning compares these
    *    numerically (pruneColOpt casts to DECIMAL(38,18)), so any
    *    parseable decimal string is equivalent — footer values convert
    *    exactly (NaN falls back to unknown stats, which never prune).
    *  - string: Spark's string ordering IS unsigned UTF-8 byte order
    *    (UTF8String.compareTo), exactly the parquet UTF8 sort order the
    *    footer min/max were computed under — the domains coincide.
    *  - date: ISO `toString` order = value order, both engines agree.
    * Timestamps (cast-to-string formatting is session-dependent) and
    * anything exotic take the legacy scan path instead. */
  private def footerStatsSafe(t: org.apache.spark.sql.types.DataType)
      : Boolean = t match {
    case org.apache.spark.sql.types.ByteType |
         org.apache.spark.sql.types.ShortType |
         org.apache.spark.sql.types.IntegerType |
         org.apache.spark.sql.types.LongType |
         org.apache.spark.sql.types.BooleanType |
         org.apache.spark.sql.types.StringType |
         org.apache.spark.sql.types.DateType |
         org.apache.spark.sql.types.FloatType |
         org.apache.spark.sql.types.DoubleType => true
    case _: org.apache.spark.sql.types.DecimalType => true
    case _ => false
  }

  /** (rows, per-column StatRange) of ONE just-written parquet file,
    * read from its FOOTER — no data scanned. Unknown or unusable
    * footer stats yield a null lo/hi range, which [[pruneColOpt]]
    * keeps (conservative: weaker pruning, never a lost row). */
  private def footerFileStats(conf: org.apache.hadoop.conf.Configuration,
      file: Path, statsCols: Seq[String],
      types: Map[String, org.apache.spark.sql.types.DataType])
      : (Long, Map[String, StatRange]) = {
    import scala.jdk.CollectionConverters._
    val reader = org.apache.parquet.hadoop.ParquetFileReader.open(
      org.apache.parquet.hadoop.util.HadoopInputFile.fromPath(file, conf))
    try {
      val blocks = reader.getFooter.getBlocks.asScala.toSeq
      val rows = blocks.map(_.getRowCount).sum
      val stats = statsCols.map { c =>
        val t = types(c)
        val typName = t.typeName
        // one Statistics per block; a block whose stats are absent or
        // unusable makes the whole column unknown (conservative)
        val chunkStats = blocks.map(b =>
          b.getColumns.asScala.find(_.getPath.toDotString == c)
            .map(_.getStatistics).orNull)
        if (chunkStats.exists(s => s == null || s.isEmpty))
          c -> StatRange(typName, null, null)
        else {
          val nonNull = chunkStats.filter(_.hasNonNullValue)
          if (nonNull.isEmpty) c -> StatRange(typName, null, null)
          else c -> footerRange(t, typName,
            nonNull.map(_.genericGetMin.asInstanceOf[AnyRef]),
            nonNull.map(_.genericGetMax.asInstanceOf[AnyRef]))
        }
      }.toMap
      (rows, stats)
    } finally reader.close()
  }

  /** Fold per-block footer min/max values into one stringified
    * StatRange in the scan-read-back's comparison domain (see
    * [[footerStatsSafe]] for why each mapping is order-exact). */
  private def footerRange(t: org.apache.spark.sql.types.DataType,
      typName: String, mins: Seq[AnyRef], maxs: Seq[AnyRef]): StatRange = {
    import org.apache.spark.sql.types._
    def long(v: AnyRef): Long = v match {
      case i: java.lang.Integer => i.toLong
      case l: java.lang.Long => l
      case o => o.toString.toLong
    }
    t match {
      case ByteType | ShortType | IntegerType | LongType =>
        StatRange(typName, mins.map(long).min.toString,
          maxs.map(long).max.toString)
      case BooleanType =>
        val bs = (v: AnyRef) => v.asInstanceOf[java.lang.Boolean]
        StatRange(typName, mins.map(bs).min.toString,
          maxs.map(bs).max.toString)
      case DateType =>
        StatRange(typName,
          java.time.LocalDate.ofEpochDay(mins.map(long).min).toString,
          java.time.LocalDate.ofEpochDay(maxs.map(long).max).toString)
      case StringType =>
        // min/max under UNSIGNED byte order — Spark's own string order
        val bytes = (v: AnyRef) =>
          v.asInstanceOf[org.apache.parquet.io.api.Binary].getBytes
        val lo = mins.map(bytes).reduce((a, b) =>
          if (java.util.Arrays.compareUnsigned(a, b) <= 0) a else b)
        val hi = maxs.map(bytes).reduce((a, b) =>
          if (java.util.Arrays.compareUnsigned(a, b) >= 0) a else b)
        StatRange(typName, new String(lo, StandardCharsets.UTF_8),
          new String(hi, StandardCharsets.UTF_8))
      case d: DecimalType =>
        def unscaled(v: AnyRef): java.math.BigInteger = v match {
          case i: java.lang.Integer => java.math.BigInteger.valueOf(i.toLong)
          case l: java.lang.Long => java.math.BigInteger.valueOf(l)
          case b: org.apache.parquet.io.api.Binary =>
            new java.math.BigInteger(b.getBytes)
          case o => new java.math.BigInteger(o.toString)
        }
        def dec(v: AnyRef) = new java.math.BigDecimal(unscaled(v), d.scale)
        StatRange(typName, mins.map(dec).min.toPlainString,
          maxs.map(dec).max.toPlainString)
      case FloatType | DoubleType =>
        val dbl = (v: AnyRef) => v match {
          case f: java.lang.Float => f.toDouble
          case x: java.lang.Double => x.doubleValue()
          case o => o.toString.toDouble
        }
        val (lo, hi) = (mins.map(dbl).min, maxs.map(dbl).max)
        if (lo.isNaN || hi.isNaN) StatRange(typName, null, null)
        else StatRange(typName, lo.toString, hi.toString)
      case _ => StatRange(typName, null, null)
    }
  }

  /** Stats of every file under `dir` — from parquet footers when every
    * stat column's type is footer-safe (O(files) driver metadata, NO
    * extra pass over just-written data — the Iceberg DataFile-stats
    * shape; guide §6), falling back to one bounded read-back scan job
    * otherwise. `schema` is the WRITER's schema, so even the fallback
    * skips footer schema inference. */
  private def fileStats(spark: SparkSession, table: String, dir: String,
      statsCols: Seq[String],
      schema: Option[org.apache.spark.sql.types.StructType] = None)
      : Seq[(String, Long, Map[String, StatRange])] = {
    val types = schema.map(s => statsCols.map(c =>
      c -> s(c).dataType).toMap)
    if (types.exists(_.values.forall(footerStatsSafe))) {
      val conf = spark.sparkContext.hadoopConfiguration
      val f = fs(spark, table)
      val files = f.globStatus(new Path(s"$table/$dir/*.parquet")).toSeq
      return files.map { st =>
        val full = st.getPath.toString
        val rel = full.substring(full.indexOf(dir))
        val (rows, stats) =
          footerFileStats(conf, st.getPath, statsCols, types.get)
        (rel, rows, stats)
      }
    }
    val df = schema.fold(spark.read)(spark.read.schema)
      .parquet(s"$table/$dir")
    val typs = statsCols.map(c => c -> df.schema(c).dataType.typeName).toMap
    val aggs = count(lit(1L)).as("_rows") +:
      statsCols.flatMap(c => Seq(
        min(col(c)).cast("string").as(s"_lo_$c"),
        max(col(c)).cast("string").as(s"_hi_$c")))
    df.groupBy(input_file_name().as("_path")).agg(aggs.head, aggs.tail: _*)
      .collect().toSeq.map { r =>
        val full = r.getString(0)
        val rel = full.substring(full.indexOf(dir))
        val stats = statsCols.map { c =>
          c -> StatRange(typs(c),
            r.getAs[String](s"_lo_$c"), r.getAs[String](s"_hi_$c"))
        }.toMap
        (rel, r.getAs[Long]("_rows"), stats)
      }
  }

  /** The one manifest shape every reader sees (see [[FileEntry]]).
    * Reads pass it explicitly — older files null-fill the columns they
    * predate — and the driver-side writer below emits exactly this
    * structure, so Spark- and driver-written manifest files are
    * interchangeable on disk. */
  private[io] val ManifestSchema: org.apache.spark.sql.types.StructType = {
    import org.apache.spark.sql.types._
    StructType(Seq(
      StructField("path", StringType),
      StructField("partition", StringType),
      StructField("rows", LongType),
      StructField("stats", MapType(StringType, StructType(Seq(
        StructField("typ", StringType),
        StructField("lo", StringType),
        StructField("hi", StringType))))),
      StructField("spec", StringType),
      StructField("kind", StringType),
      StructField("seq", IntegerType)))
  }

  /** Parquet-message twin of [[ManifestSchema]] for the driver-side
    * writer — field names, order and logical types match what Spark's
    * own parquet writer emits for a `Dataset[FileEntry]`, so readers
    * cannot tell which writer produced a file. */
  private lazy val ManifestMessageType =
    org.apache.parquet.schema.MessageTypeParser.parseMessageType(
      """message graft_manifest {
        |  optional binary path (STRING);
        |  optional binary partition (STRING);
        |  optional int64 rows;
        |  optional group stats (MAP) {
        |    repeated group key_value {
        |      required binary key (STRING);
        |      optional group value {
        |        optional binary typ (STRING);
        |        optional binary lo (STRING);
        |        optional binary hi (STRING);
        |      }
        |    }
        |  }
        |  optional binary spec (STRING);
        |  optional binary kind (STRING);
        |  optional int32 seq;
        |}""".stripMargin)

  /** Write one manifest segment ON THE DRIVER: the entries are already
    * a driver-side Seq (a commit's own files — O(commit), bounded),
    * so round-tripping them through a one-task Spark job (plan +
    * schedule + commit protocol) bought nothing. The plan-side carry
    * paths (checkpoints, vacuum re-checkpoints) still write through
    * Spark — those are O(table files) and belong on executors. */
  private def writeManifestEntries(spark: SparkSession, dir: String,
      entries: Seq[FileEntry]): Unit = {
    import org.apache.parquet.example.data.simple.SimpleGroupFactory
    import org.apache.parquet.hadoop.example.ExampleParquetWriter
    val f = fs(spark, dir)
    // the Spark writer this replaces ran in overwrite mode — clear any
    // crash-retry debris so a re-driven commit can't double its entries
    if (f.exists(new Path(dir))) f.delete(new Path(dir), true)
    f.mkdirs(new Path(dir))
    val file = new Path(dir,
      s"part-00000-${java.util.UUID.randomUUID}.parquet")
    val w = ExampleParquetWriter
      .builder(org.apache.parquet.hadoop.util.HadoopOutputFile
        .fromPath(file, spark.sparkContext.hadoopConfiguration))
      .withType(ManifestMessageType)
      .withCompressionCodec(
        org.apache.parquet.hadoop.metadata.CompressionCodecName.SNAPPY)
      .build()
    val gf = new SimpleGroupFactory(ManifestMessageType)
    try entries.foreach { e =>
      val g = gf.newGroup()
      g.add("path", e.path)
      if (e.partition != null) g.add("partition", e.partition)
      g.add("rows", e.rows)
      val m = g.addGroup("stats")
      e.stats.foreach { case (k, st) =>
        val kv = m.addGroup("key_value")
        kv.add("key", k)
        val v = kv.addGroup("value")
        v.add("typ", st.typ)
        if (st.lo != null) v.add("lo", st.lo)
        if (st.hi != null) v.add("hi", st.hi)
      }
      e.spec.foreach(g.add("spec", _))
      e.kind.foreach(g.add("kind", _))
      e.seq.foreach(g.add("seq", _))
      w.write(g)
    } finally w.close()
  }

  private def writeManifest(spark: SparkSession, table: String, v: Int,
      entries: Seq[FileEntry]): Unit =
    writeManifestEntries(spark, manifestDir(table, v), entries)

  /** Manifest write from a PLAN (carried-forward rows read lazily from
    * the previous manifest union'd with the commit's fresh entries) —
    * the carried file set never round-trips through the driver. */
  private def writeManifestDF(spark: SparkSession, df: DataFrame,
      table: String, v: Int): Unit =
    df.coalesce(1).write.mode("overwrite").parquet(manifestDir(table, v))

  /** FUSED commit-dir write: every touched partition lands in ONE
    * Spark job via `partitionBy` on a shadow string column (`gp` — the
    * original `partCol` stays in the data files; the shadow is consumed
    * by the directory layout), then one metadata job reads the commit
    * dir back (partition discovery restores `gp`) and collects per-file
    * stats + partition ownership. Two jobs total regardless of how many
    * partitions the commit touches — the production shape the
    * per-partition loop's scaladoc used to only point at. */
  private def writeCommitData(df: DataFrame, table: String, v: Int,
      partCol: String, statsCols: Seq[String]): Seq[FileEntry] = {
    val spark = df.sparkSession
    val dir = s"data/c$v"
    df.withColumn("gp", col(partCol).cast("string"))
      .write.partitionBy("gp").mode("overwrite").parquet(s"$table/$dir")
    // an EMPTY input writes only _SUCCESS — one driver glob detects it
    // without any read-back (the dir is removed so `data/` holds only
    // versions that actually added files)
    val f = fs(spark, table)
    val files = f.globStatus(new Path(s"$table/$dir/*/*.parquet")).toSeq
    if (files.isEmpty) {
      f.delete(new Path(s"$table/$dir"), true)
      return Nil
    }
    val types = statsCols.map(c => c -> df.schema(c).dataType).toMap
    if (types.values.forall(footerStatsSafe)) {
      // FOOTER metadata path (the default): per-file rows + min/max
      // from the parquet footers of the files just written, partition
      // value from the directory name — zero extra passes over the
      // commit's data (pre-round-14 this was a full read-back scan job,
      // an O(commit data) second pass; guide §1.2/§6)
      val conf = spark.sparkContext.hadoopConfiguration
      files.map { st =>
        val full = st.getPath.toString
        val rel = full.substring(full.indexOf(dir))
        val gpDir = st.getPath.getParent.getName
        val part = unescapePartitionValue(gpDir.stripPrefix("gp="))
        val (rows, stats) = footerFileStats(conf, st.getPath, statsCols,
          types)
        FileEntry(rel, part, rows, stats, Some(partCol), kind = None,
          seq = Some(v))
      }
    } else {
      // legacy read-back scan (stat types the footer domain can't
      // stringify faithfully, e.g. timestamps) — still under the
      // writer's schema, so no footer schema-inference job
      val typs = statsCols.map { case c => c -> types(c).typeName }.toMap
      val back = spark.read
        .schema(org.apache.spark.sql.types.StructType(
          df.schema.fields.map(_.copy(nullable = true)) :+
            org.apache.spark.sql.types.StructField("gp",
              org.apache.spark.sql.types.StringType)))
        .parquet(s"$table/$dir")
      val aggs = count(lit(1L)).as("_rows") +:
        (max(col("gp").cast("string")).as("_gp") +:
          statsCols.flatMap(c => Seq(
            min(col(c)).cast("string").as(s"_lo_$c"),
            max(col(c)).cast("string").as(s"_hi_$c"))))
      back.groupBy(input_file_name().as("_path"))
        .agg(aggs.head, aggs.tail: _*)
        .collect().toSeq.map { r =>
          val full = r.getString(0)
          val rel = full.substring(full.indexOf(dir))
          val stats = statsCols.map { c =>
            c -> StatRange(typs(c),
              r.getAs[String](s"_lo_$c"), r.getAs[String](s"_hi_$c"))
          }.toMap
          FileEntry(rel, r.getAs[String]("_gp"), r.getAs[Long]("_rows"),
            stats, Some(partCol), kind = None, seq = Some(v))
        }
    }
  }

  /** Decode one `gp=<value>` directory name back to the partition
    * value: Spark's partition-path escaping is %XX on a fixed special
    * set, and the HIVE_DEFAULT sentinel encodes null (which commit
    * validation then refuses, exactly as the old read-back's
    * partition-discovery null did). */
  private def unescapePartitionValue(s: String): String =
    if (s == "__HIVE_DEFAULT_PARTITION__") null
    else if (!s.contains('%')) s
    else {
      val out = new java.lang.StringBuilder(s.length)
      var i = 0
      while (i < s.length) {
        val c = s.charAt(i)
        // %XX with exactly two hex digits (Spark always emits both)
        if (c == '%' && i + 3 <= s.length &&
            Character.digit(s.charAt(i + 1), 16) >= 0 &&
            Character.digit(s.charAt(i + 2), 16) >= 0) {
          out.append(Integer.parseInt(s.substring(i + 1, i + 3), 16).toChar)
          i += 3
        } else { out.append(c); i += 1 }
      }
      out.toString
    }

  /** Initial (or wholesale re-) commit of a full table, one immutable
    * dir per partition value. Returns the new version. */
  def commitFull(df: DataFrame, table: String, partCol: String,
      statsCols: Seq[String] = Nil): Int = {
    val spark = df.sparkSession
    val v = currentVersion(spark, table) + 1
    reserve(spark, table, v)
    require(!df.columns.contains("gp"),
      "Snapshots.commitFull: column name 'gp' is reserved for the " +
        "commit layout")
    val entries = writeCommitData(df, table, v, partCol, statsCols)
    // post-write validation (was a SEPARATE full computation of `df`
    // before round 14 — a distinct() pass that doubled every commit's
    // build cost; guide §1.2: don't compute things twice). The write
    // itself surfaces both invariants: no files ⇒ empty frame, a
    // HIVE_DEFAULT (null-decoded) partition dir ⇒ null partCol rows.
    validateCommitEntries(spark, table, v, entries, partCol,
      "commitFull", allowEmpty = false)
    writeManifest(spark, table, v, entries)
    // wholesale re-commit: the frame's schema IS the table schema (no
    // carried files to stay compatible with)
    writeSchema(spark, table, v, df.schema)
    writePartSpec(spark, table, v, partCol)
    publish(spark, table, v)
    v
  }

  /** Post-write commit validation — the invariants the old
    * `requireCommittable` pre-pass enforced, now read off the commit's
    * OWN file entries so no separate full computation of the input is
    * paid: an empty frame (refused unless appending — a published
    * empty version could never resolve a scan) and a null partition
    * value (partitionBy buried those rows in a HIVE_DEFAULT dir the
    * read-back decodes to null — a value the manifest can't honestly
    * describe). A refused commit breaks its reservation; the orphaned
    * `data/c<v>` files are unreferenced by any manifest and fall to
    * the next vacuum. */
  private def validateCommitEntries(spark: SparkSession, table: String,
      v: Int, entries: Seq[FileEntry], partCol: String, op: String,
      allowEmpty: Boolean): Unit = {
    def refuse(msg: String): Nothing = {
      breakReservation(spark, table, v)
      throw new IllegalArgumentException(msg)
    }
    if (!allowEmpty && entries.isEmpty)
      refuse(s"Snapshots.$op: refusing to publish an EMPTY version " +
        "(no rows; a reader of it could never resolve a scan)")
    if (entries.exists(_.partition == null))
      refuse(s"Snapshots.$op: null $partCol is not a partitionable value")
  }

  /** Replace ONE partition with `df`'s rows (which must all carry
    * `partCol == value`); every other partition is carried by
    * reference — no data movement, no window where a reader can see
    * the partition half-swapped. Returns the new version. */
  def commitOverwritePartition(df: DataFrame, table: String,
      partCol: String, value: String,
      statsCols: Seq[String] = Nil,
      expectedPrev: Option[Int] = None): Int = {
    val spark = df.sparkSession
    val prev = currentVersion(spark, table)
    require(prev >= 1, s"Snapshots: no initial commit under $table")
    val v = prev + 1
    reserve(spark, table, v)
    // OCC snapshot validation — see commitOverwritePartitions
    expectedPrev.filter(_ != prev).foreach { _ =>
      breakReservation(spark, table, v)
      throw new ConcurrentCommitException(table, v)
    }
    val sch = validatedSchema(spark, table, prev, df,
      "commitOverwritePartition", v)
    val dir = s"data/c$v/$partCol=$value"
    df.where(col(partCol).cast("string") === value)
      .write.mode("overwrite").parquet(s"$table/$dir")
    val fresh = fileStats(spark, table, dir, statsCols,
      Some(org.apache.spark.sql.types.StructType(
        df.schema.fields.map(_.copy(nullable = true))))).map {
      case (rel, n, st) =>
        FileEntry(rel, value, n, st, Some(partCol), kind = None,
          seq = Some(v))
    }
    // metadata-log commit: normally just the fresh entries + one
    // partition tombstone (O(commit)); every CheckpointEvery-th version
    // materializes the carried set plan-side into a fresh checkpoint
    commitManifest(spark, table, v, prev, fresh, Seq(value),
      Some(partCol))
    writeSchema(spark, table, v, sch)
    writePartSpec(spark, table, v, partCol)
    publish(spark, table, v)
    v
  }

  /** Replace SEVERAL partitions in ONE atomic commit: `df` must hold
    * exactly the new content of every partition in `values` (a value
    * with no rows in `df` publishes as a pure tombstone — the
    * partition disappears); every other partition carries by
    * reference. One fused write job + one metadata job + one manifest
    * regardless of how many partitions the commit touches — the batch
    * sibling of [[commitOverwritePartition]], and what keeps a
    * multi-cell compaction ([[deleteRows]]) at one version instead of
    * one commit per cell. Returns the new version. */
  def commitOverwritePartitions(df: DataFrame, table: String,
      partCol: String, values: Seq[String],
      statsCols: Seq[String] = Nil,
      expectedPrev: Option[Int] = None): Int = {
    val spark = df.sparkSession
    val prev = currentVersion(spark, table)
    require(prev >= 1, s"Snapshots: no initial commit under $table")
    require(values.nonEmpty,
      "Snapshots.commitOverwritePartitions: no partitions named")
    require(!df.columns.contains("gp"),
      "Snapshots.commitOverwritePartitions: column name 'gp' is " +
        "reserved for the commit layout")
    val v = prev + 1
    reserve(spark, table, v)
    // OCC snapshot validation (the Delta/Iceberg conflict check): a
    // caller that computed `df` FROM version expectedPrev must not
    // publish it on top of anything newer — that would silently drop
    // the concurrent commit's changes to the named partitions (lost
    // update). Checking AFTER the reservation is exact, not racy: the
    // held slot is the only one that can publish next, so
    // currentVersion is frozen at `prev` until we publish or release.
    expectedPrev.filter(_ != prev).foreach { _ =>
      breakReservation(spark, table, v)
      throw new ConcurrentCommitException(table, v)
    }
    val sch = validatedSchema(spark, table, prev, df,
      "commitOverwritePartitions", v)
    val restricted = df
      .where(col(partCol).cast("string").isin(values: _*))
    // partitions whose entire content was dropped write no files — the
    // tombstone alone removes them. The write IS the presence probe
    // (pre-round-14 a separate distinct() pass over `restricted` ran
    // the whole rewrite plan twice); writeCommitData returns Nil when
    // nothing survived the restriction.
    val fresh = writeCommitData(restricted, table, v, partCol, statsCols)
    // the empty-version invariant, restated for tombstone commits: a
    // published version whose manifest names NO files could never
    // resolve a scan — reachable when the overwrite drops every row of
    // every partition the table has (e.g. deleteRows matching the whole
    // table). One limit-1 probe of the carried manifest, only on the
    // path that could actually publish empty; the refused slot's
    // reservation is released so the table isn't wedged.
    if (fresh.isEmpty) {
      // spec-scoped like the tombstone it probes for (commitManifest's
      // specCompat): an OTHER-ERA file whose partition VALUE collides
      // with `values` is untouched by this commit's era-scoped
      // tombstone and therefore a survivor — counting it as removed
      // would spuriously refuse a commit that leaves it live
      val survivors = manifestDF(spark, table, prev)
        .where(!(col("partition").isin(values: _*) &&
          specCompat(col("spec"), lit(partCol).cast("string"))))
        .limit(1).count()
      if (survivors == 0L) {
        breakReservation(spark, table, v)
        throw new IllegalArgumentException(
          "Snapshots.commitOverwritePartitions: refusing to publish an " +
            "EMPTY version (the commit tombstones every partition and " +
            "adds no files; a reader of it could never resolve a scan)")
      }
    }
    commitManifest(spark, table, v, prev, fresh, values, Some(partCol))
    writeSchema(spark, table, v, sch)
    writePartSpec(spark, table, v, partCol)
    publish(spark, table, v)
    v
  }

  /** Append-only commit — the streaming-sink building block: new files
    * for the batch's touched partitions are ADDED to the carried
    * manifest (nothing replaced). `tag`, when given, is recorded inside
    * the manifest dir BEFORE the pointer publish, so "this batch is
    * applied" and "this batch's rows are visible" become one atomic
    * fact — the exactly-once hinge [[batchApplied]] reads. Works from
    * an empty table (v1 = the first appended batch). */
  def commitAppend(df: DataFrame, table: String, partCol: String,
      statsCols: Seq[String] = Nil, tag: Option[String] = None): Int = {
    val spark = df.sparkSession
    val prev = currentVersion(spark, table)
    val v = prev + 1
    reserve(spark, table, v)
    val sch =
      if (prev == 0) df.schema
      else validatedSchema(spark, table, prev, df, "commitAppend", v)
    require(!df.columns.contains("gp"),
      "Snapshots.commitAppend: column name 'gp' is reserved for the " +
        "commit layout")
    // empty micro-batches are legal appends: the version still publishes
    // (carrying the previous file set) so the batch tag lands atomically;
    // writeCommitData returns Nil for them (no pre-pass over the input)
    val fresh = writeCommitData(df, table, v, partCol, statsCols)
    validateCommitEntries(spark, table, v, fresh, partCol,
      "commitAppend", allowEmpty = true)
    commitManifest(spark, table, v, prev, fresh, Nil, Some(partCol))
    writeSchema(spark, table, v, sch)
    writePartSpec(spark, table, v, partCol)
    tag.foreach { t =>
      val f = fs(spark, table)
      f.create(new Path(manifestDir(table, v), s"_applied_$t"), true).close()
    }
    publish(spark, table, v)
    v
  }

  /** Has a [[commitAppend]] carrying `tag` already PUBLISHED? Scans the
    * retained manifest dirs (O(versions) exists-checks — metadata
    * only). Replay semantics: a foreachBatch retry re-offers only the
    * last unconfirmed batch, so markers vacuumed with ancient history
    * are long past the replay window. */
  def batchApplied(spark: SparkSession, table: String, tag: String)
      : Boolean = {
    val f = fs(spark, table)
    (1 to currentVersion(spark, table)).exists(v =>
      f.exists(new Path(manifestDir(table, v), s"_applied_$tag")))
  }

  /** Snapshot-safe small-file compaction: rewrite one partition's
    * current file set as `targetFiles` files in a NEW commit. Unlike
    * the in-place [[Compaction]] swap, readers need no recovery
    * reasoning at all — pinned readers keep their (uncompacted) file
    * set, fresh readers plan over the compacted one, and the old files
    * stay until [[vacuum]] drops their last referencing manifest.
    * Returns the new version. */
  def commitCompact(spark: SparkSession, table: String, partCol: String,
      value: String, targetFiles: Int = 1,
      statsCols: Seq[String] = Nil): Int = {
    import spark.implicits._
    val cur = currentVersion(spark, table)
    val mine = manifestDF(spark, table, cur)
      .where(col("partition") === lit(value) && !isDelete(col("kind")))
      .select(col("path"), coalesce(col("seq"), lit(0)).as("seq"))
      .as[(String, Int)].collect().toSeq
    require(mine.nonEmpty,
      s"Snapshots.commitCompact: no files for $partCol=$value")
    // MoR-filtered (the deleteRows rule): the compacted file's fresh
    // seq must not resurrect rows an active delete file suppresses
    commitOverwritePartition(
      morScan(spark, table, mine, activeDeletes(spark, table, cur),
          schemaOf(spark, table, cur))
        .coalesce(targetFiles),
      table, partCol, value, statsCols, expectedPrev = Some(cur))
  }

  /** Copy-on-write row-level delete (the GDPR/retraction path): every
    * partition holding a key in `keys` is rewritten WITHOUT the
    * matching rows, all together in ONE snapshot commit
    * ([[commitOverwritePartitions]] — one write job, one metadata job,
    * one manifest; a first cut committed per-cell and paid ~8 commit
    * round-trips on an 8-cell store). All other partitions carry by
    * reference, pinned readers keep their pre-delete version (the
    * snapshot contract), and vacuum reclaims the superseded files on
    * the usual retention schedule. A partition whose every row matches
    * publishes as a pure tombstone. Untouched partitions cost nothing;
    * the scan to FIND affected partitions is one semi-join pruned to
    * `partCol`. Returns the rewritten partition count. Merge-on-read
    * is the query-side dual: serve paths anti-join a small tombstone
    * set instead (see emb_ivf_delete), then call this to compact the
    * tombstones away. */
  def deleteRows(spark: SparkSession, table: String, partCol: String,
      keyCol: String, keys: DataFrame,
      statsCols: Seq[String] = Nil): Int = {
    import spark.implicits._
    // the whole delete computes against ONE pinned version, and each
    // commit validates it is still current (OCC) — a commit landing
    // in between must fail the rewrite, not be silently overwritten
    val baseV = currentVersion(spark, table)
    // ERA-AWARE resolution under partition-spec evolution: a file's
    // manifest `partition` value is meaningful only in its own era —
    // pinning by the CURRENT spec's values would (a) silently skip
    // keys living in legacy-era files (their manifest values are
    // old-spec; the key survives the "delete") and (b) rewrite a
    // colliding-value legacy file's rows under the NEW spec while the
    // era-scoped tombstone spares the original file (row duplication).
    // Instead each era resolves with ITS OWN partCol: affected values
    // computed from that era's files, the pin and the tombstone scoped
    // to that era, and the rewrite committed UNDER that era's spec (a
    // row never migrates eras through a delete). Files written before
    // spec tracking (spec null) belong to the caller's-partCol era —
    // the pre-evolution behavior, where a value-matching tombstone
    // reaches them. Eras commit separately (one OCC-chained version
    // each, current era last); the operation is idempotent, so a crash
    // between era commits re-runs to completion.
    val eras = manifestDF(spark, table, baseV)
      .where(!isDelete(col("kind")))
      .select(coalesce(col("spec"), lit(partCol)).as("s")).distinct()
      .as[String].collect().sorted
      .sortBy(_ == partCol) // current era commits LAST (tie to caller)
    val sch = schemaOf(spark, table, baseV)
    val morDels = activeDeletes(spark, table, baseV)
    var touched = 0
    // OCC across the era chain: every pin resolves against baseV (each
    // era commit tombstones only its OWN era's partitions, so baseV's
    // file set stays exact for the eras still to come), and each commit
    // expects exactly baseV + (our own commits so far) — a FOREIGN
    // commit landing mid-chain fails the next era commit instead of
    // being silently rewritten over
    var expect = baseV
    // affected-partition PROBE is key-range pruned (the rewrite set
    // `mine` below stays partition-complete — whole partitions rewrite)
    val keyPrune = keyRangePrune(keys, keyCol)
    eras.foreach { eraCol =>
      require(sch.forall(_.fieldNames.contains(eraCol)),
        s"Snapshots.deleteRows: era partition column '$eraCol' missing " +
          s"from v$baseV's schema of $table")
      val eraPred =
        if (eraCol == partCol) col("spec").isNull || col("spec") === eraCol
        else col("spec") === eraCol
      val eraPaths = manifestDF(spark, table, baseV)
        .where(eraPred && keyPrune)
        .select(col("path"), coalesce(col("seq"), lit(0)).as("seq"))
        .as[(String, Int)].collect().toSeq
      if (eraPaths.nonEmpty) {
        // MoR-filtered: the rewrite's fresh seq makes older delete
        // files inert for these partitions — rows they suppressed must
        // not ride back in through the copy-on-write scan
        val eraRows = morScan(spark, table, eraPaths, morDels, sch)
        val affected = eraRows
          .join(keys.select(keyCol), Seq(keyCol), "left_semi")
          .select(col(eraCol).cast("string")).distinct()
          .as[String].collect().sorted
        if (affected.nonEmpty) {
          val mine = manifestDF(spark, table, baseV)
            .where(eraPred && col("partition").isin(affected.toSeq: _*))
            .select(col("path"), coalesce(col("seq"), lit(0)).as("seq"))
            .as[(String, Int)].collect().toSeq
          val kept = morScan(spark, table, mine, morDels, sch)
            .join(keys.select(keyCol), Seq(keyCol), "left_anti")
          // statsCols must survive the rewrite: a compaction that
          // dropped the manifest min/max of the store's range column
          // would silently turn every later stats-pruned read
          // (readRange / readWhere) into a full-file scan of the
          // rewritten partitions — overlapCol fails open, so answers
          // stay right while the targeted-read contract rots
          expect = commitOverwritePartitions(kept, table, eraCol,
            affected.toSeq, statsCols, expectedPrev = Some(expect))
          touched += affected.length
        }
      }
    }
    touched
  }

  /** Transactional MERGE INTO the snapshot table — the CDC landing
    * path (the last quarter of the reference's "Iceberg/Delta for
    * transactional upserts and time travel" roadmap item, reference
    * `docs/design.md:168`): [[graft.operators.Merge.upsert]] supplies
    * the row semantics (op 'U'/'I' upserts, 'D' deletes, unmatched
    * target rows pass through), this supplies the transaction — ONE
    * atomic version, pinned readers undisturbed, time travel across
    * the merge.
    *
    * Copy-on-write, partition-scoped: the batch touches only
    *  - partitions holding a CHANGED key (one semi-join, pruned to
    *    `partCol`), and
    *  - partitions non-delete change rows LAND in (the change's own
    *    `partCol` value — which may be brand-new, or differ from the
    *    key's current partition: a partition-key-changing update
    *    rewrites both the old home and the new one);
    * everything else carries by reference. The merge join itself runs
    * over ONLY the affected partitions' files (resolved once from the
    * manifest — the same pinning discipline as [[readAsOf]]), so a
    * 100-row CDC batch against a 100 TB table reads and rewrites the
    * touched partitions, never the table. A partition emptied by its
    * deletes publishes as a pure tombstone; a batch that would empty
    * the whole table is refused (the EMPTY-version guard).
    *
    * Caller contract (the MERGE contract [[graft.operators.Merge]]
    * documents): `keyCol` is unique in the table and at most one
    * change row per key per batch. `changes` carries `keyCol`,
    * `partCol`, `opCol`, and any subset of the table's other columns:
    * a batch from a producer still emitting a PRE-EVOLUTION shape
    * merges fine — table columns the batch lacks are null-filled in
    * its rows (the write-path dual of the read path's null-fill of
    * old files; a change row is a full-row statement in the schema its
    * producer knows, so columns it has never heard of hold NULL, not a
    * carried-over target value). Columns NEW to the batch evolve the
    * table schema add-only, exactly as a commit would. Returns the new
    * version, or 0 when the batch touches nothing (no commit). */
  def mergeRows(spark: SparkSession, table: String, partCol: String,
      keyCol: String, changes0: DataFrame, opCol: String = "op",
      statsCols: Seq[String] = Nil): Int = {
    import spark.implicits._
    // one pinned version end-to-end, validated at commit (OCC): a
    // concurrent commit between this read and the publish must fail
    // the merge — retry from a fresh read — never be silently dropped
    val baseV = currentVersion(spark, table)
    val target = readAsOf(spark, table, baseV)
    Seq(keyCol, partCol, opCol).foreach(c =>
      require(changes0.columns.contains(c),
        s"Snapshots.mergeRows: change batch must carry '$c'"))
    // null-fill table columns the (schema-evolved-past) batch lacks
    val changes = target.schema.fields
      .filterNot(f => changes0.columns.contains(f.name))
      .foldLeft(changes0)((df, f) =>
        df.withColumn(f.name, lit(null).cast(f.dataType)))
    // columns NEW to the batch ride through the merge and evolve the
    // table schema add-only at the commit (target rows null-fill them,
    // the same rule an append evolution applies to old files)
    val batchNew = changes0.schema.fields
      .filterNot(f => target.columns.contains(f.name) || f.name == opCol)
    val attrCols = (target.columns.filterNot(_ == keyCol) ++
      batchNew.map(_.name)).toSeq
    // ERA GUARD under partition-spec evolution: a change key whose
    // current row lives in a LEGACY-era file cannot be merged
    // copy-on-write here — its file's manifest partition value is
    // old-spec, so the value-based pin would miss it (silent duplicate
    // key on upsert, silent no-op on delete) and a colliding-value
    // legacy file that DID get pinned would have its rows rewritten
    // under the new spec while the era-scoped tombstone spared the
    // original (row duplication). Refuse fail-fast with the migration
    // path spelled out; deletes of legacy keys go through the era-aware
    // [[deleteRows]]. One metadata probe when single-era (the common
    // case), one bounded semi-join otherwise.
    val eraPred = col("spec").isNull || col("spec") === lit(partCol)
    val sch = schemaOf(spark, table, baseV)
    val otherEraPaths = manifestDF(spark, table, baseV)
      .where(!eraPred && !isDelete(col("kind")))
      .select("path").as[String].collect().toSeq
    if (otherEraPaths.nonEmpty) {
      val hit = scanPaths(spark, table, otherEraPaths, sch)
        .join(changes.select(keyCol), Seq(keyCol), "left_semi")
        .limit(1).count()
      require(hit == 0L,
        s"Snapshots.mergeRows: change batch touches keys living in " +
          s"files of another partition-spec era of $table — merge " +
          "cannot rewrite across eras. Migrate first (deleteRows the " +
          "keys era-aware, or commitFull to rewrite the table under " +
          s"'$partCol'), then re-apply the batch")
    }
    // matched-partition PROBE, key-range pruned: only files whose
    // keyCol stats overlap the batch's [min, max] can hold a changed
    // key, so the probe scans O(candidate files), not the table (the
    // MoR filter still applies — a partition whose only matching rows
    // are delete-suppressed must not be rewritten for them)
    val probePaths = manifestDF(spark, table, baseV)
      .where(eraPred && !isDelete(col("kind")) &&
        keyRangePrune(changes, keyCol))
      .select(col("path"), coalesce(col("seq"), lit(0)).as("seq"))
      .as[(String, Int)].collect().toSeq
    val probe =
      if (probePaths.isEmpty) target.where(lit(false))
      else morScan(spark, table, probePaths,
        activeDeletes(spark, table, baseV), sch)
    val matched = probe
      .join(changes.select(keyCol), Seq(keyCol), "left_semi")
      .select(col(partCol).cast("string"))
    val landing = changes.where(col(opCol) =!= "D")
      .select(col(partCol).cast("string"))
    val affected = matched.unionByName(landing).distinct()
      .as[String].collect().sorted
    if (affected.isEmpty) return 0
    // pin the affected partitions' file set now — the merge plan reads
    // exactly these files however long it runs, and a concurrent commit
    // cannot make it see a mix (brand-new landing partitions have no
    // files yet; their rows come solely from the change batch). The pin
    // is ERA-SCOPED: a colliding-value other-era file must keep serving
    // its own era, not ride into this rewrite (the guard above ensures
    // no change key needs it).
    val mine = manifestDF(spark, table, baseV)
      .where(eraPred && col("partition").isin(affected.toSeq: _*))
      .select(col("path"), coalesce(col("seq"), lit(0)).as("seq"))
      .as[(String, Int)].collect().toSeq
    val pinned0 =
      if (mine.isEmpty) target.where(lit(false)) // pure-insert batch
      // MoR-filtered (the deleteRows rule): the merge rewrite's fresh
      // seq must not resurrect rows an active delete file suppresses
      else morScan(spark, table, mine,
        activeDeletes(spark, table, baseV), sch)
    val pinned = batchNew.foldLeft(pinned0)((df, f) =>
      df.withColumn(f.name, lit(null).cast(f.dataType)))
    val merged = graft.operators.Merge
      .upsert(pinned, changes, keyCol, attrCols, opCol)
      .drop("merge_status")
    commitOverwritePartitions(merged, table, partCol, affected.toSeq,
      statsCols, expectedPrev = Some(baseV))
  }

  // ---- merge-on-read deletes -------------------------------------------
  //
  // The query-side dual of copy-on-write [[deleteRows]] (the Iceberg-v2
  // equality-delete shape): [[deleteRowsMoR]] commits a tiny KEY-SET
  // file instead of rewriting partitions — a 1-row CDC delete against a
  // 1 GB partition costs O(1 key), not O(partition rewrite). Reads
  // anti-join the accumulated delete keys (seq-scoped: a delete reaches
  // only data files committed BEFORE it, so re-inserts and folded
  // rewrites are immune), and [[compactDeletes]] folds the tombstones
  // away with the usual copy-on-write rewrite once they warrant it.

  /** Is this manifest row a merge-on-read delete file? */
  private def isDelete(kind: Column): Column =
    kind.isNotNull && kind.startsWith("delete:")

  /** Manifest KEY-RANGE prune for the copy-on-write probes
    * ([[deleteRows]] / [[mergeRows]] / [[compactDeletes]] all start by
    * scanning for partitions that hold an affected key): keep only
    * manifest rows whose recorded `keyCol` stats overlap the key
    * batch's [min, max] — a 1-key delete against a stats-covered table
    * probes O(candidate files), not the era (the 10⁷-file lens the
    * distributed vacuum adopted, applied to the CoW planning side).
    * Bounds are computed in the key's NATIVE type (numeric min, not
    * lexicographic-on-strings) and rendered as strings for the shared
    * decimal/lexicographic stat comparison ([[pruneColOpt]]), which
    * FAILS OPEN for rows without stats on `keyCol` — pruning is an IO
    * optimization, never a proof; the semi-join stays the decider. */
  private def keyRangePrune(keys: DataFrame, keyCol: String): Column = {
    val kb = keys.agg(min(col(keyCol)).cast("string"),
      max(col(keyCol)).cast("string")).head()
    if (kb.isNullAt(0)) lit(true)
    else pruneColOpt(keyCol, Option(kb.getString(0)),
      Option(kb.getString(1)))
  }

  /** ONE manifest resolution serving both halves of a MoR read —
    * (data entries as (relPath, seq), delete files as (relPath,
    * keyCol)). The first MoR cut probed delete files with a SEPARATE
    * manifestDF collect per read, which taxed every read path — the
    * bench's whole commit-inside-query class — by one manifest job
    * even on tables that never saw a delete; the fused collect keeps
    * reads at exactly one resolution, deletes or not. */
  private def splitEntries(rows: Seq[(String, Int, String)])
      : (Seq[(String, Int)], Seq[(String, String)]) = {
    val (del, data) = rows.partition(r =>
      r._3 != null && r._3.startsWith("delete:"))
    (data.map(r => (r._1, r._2)),
      del.map(r => (r._1, r._3.stripPrefix("delete:"))))
  }

  private def allEntries(spark: SparkSession, table: String, v: Int)
      : (Seq[(String, Int)], Seq[(String, String)]) = {
    import spark.implicits._
    splitEntries(manifestDF(spark, table, v)
      .select(col("path"), coalesce(col("seq"), lit(0)).as("seq"),
        col("kind"))
      .as[(String, Int, String)].collect().toSeq)
  }

  /** Version `v`'s active delete files as (relPath, keyCol) — for the
    * WRITE paths, which resolve the manifest separately anyway. */
  private def activeDeletes(spark: SparkSession, table: String, v: Int)
      : Seq[(String, String)] = {
    import spark.implicits._
    manifestDF(spark, table, v).where(isDelete(col("kind")))
      .select(col("path"), col("kind")).as[(String, String)].collect()
      .toSeq.map { case (p, k) => (p, k.stripPrefix("delete:")) }
  }

  /** Does version `v` carry active merge-on-read delete files? (The
    * SQL catalog refuses such versions — a DSv2 Scan cannot express
    * the anti-join — and points at [[compactDeletes]].) */
  private[graft] def hasMorDeletes(spark: SparkSession, table: String,
      v: Int): Boolean =
    activeDeletes(spark, table, v).nonEmpty

  /** Attach each row's data-file seq (`_gseq`): a broadcast
    * (relPath → seq) map joined on `input_file_name`. */
  private def morTag(spark: SparkSession, base: DataFrame,
      entries: Seq[(String, Int)]): DataFrame = {
    import spark.implicits._
    Seq("_grel", "_gseq", "_gdelkey", "_delseq").foreach(c =>
      require(!base.columns.contains(c),
        s"Snapshots: column name '$c' is reserved for merge-on-read " +
          "delete application"))
    val seqDf = broadcast(entries.toDF("_grel", "_gseq"))
    // manifest-relative path = the LAST `data/c<version>/…` suffix of
    // the file URI (greedy `.*` backtracks to the final match), NOT
    // the first literal 'data/c' occurrence — a table rooted under a
    // path like /data/corpus/t would otherwise mis-anchor every row,
    // miss the seq join, and over-apply deletes to re-inserted keys.
    // Partition VALUES can't fake a match: Spark percent-escapes '/'
    // in partition directory names, so the only literal `data/c<d>/`
    // segments are version dirs (and possibly the root — hence LAST).
    base
      .withColumn("_grel",
        regexp_extract(input_file_name(),
          "^.*/(data/c\\d+/.*)$", 1))
      .join(seqDf, Seq("_grel"), "left_outer")
  }

  /** One broadcast join per delete key column with the seq guard
    * `deleteSeq > dataSeq` as the extra hash-join condition. `anti`
    * filters suppressed rows away (the read); semi keeps ONLY them
    * (the fold's affected-partition probe). */
  private def morJoin(spark: SparkSession, table: String,
      tagged: DataFrame, dels: Seq[(String, String)], joinType: String)
      : DataFrame =
    dels.groupBy(_._2).toSeq.sortBy(_._1)
      .foldLeft(tagged) { case (acc, (keyCol, files)) =>
        val keys = spark.read
          .parquet(files.map(f => s"$table/${f._1}"): _*)
          .withColumnRenamed(keyCol, "_gdelkey")
        acc.join(broadcast(keys),
          acc(keyCol) === keys("_gdelkey") &&
            keys("_delseq") > coalesce(acc("_gseq"), lit(0)),
          joinType)
      }

  /** Scan `entries`' files and suppress rows matched by `dels` — the
    * MoR read (delete sets are small by contract — that's what
    * [[compactDeletes]] is for — so the anti-joins broadcast and the
    * scan never shuffles). Zero overhead when no deletes are active:
    * the plain multi-file parquet scan comes back untouched. */
  private def morScan(spark: SparkSession, table: String,
      entries: Seq[(String, Int)], dels: Seq[(String, String)],
      schema: Option[org.apache.spark.sql.types.StructType])
      : DataFrame = {
    val base = scanPaths(spark, table, entries.map(_._1), schema)
    if (dels.isEmpty) return base
    morJoin(spark, table, morTag(spark, base, entries), dels,
      "left_anti").drop("_grel", "_gseq")
  }

  /** Merge-on-read row delete: commit version `v` adds ONE key-set
    * parquet (the distinct `keys`, stamped with `_delseq = v`) and
    * rewrites NOTHING — the metadata-only delete a CDC-heavy 100 TB
    * table needs. Every read of v onward anti-joins the keys away;
    * time travel below v still sees them; a later re-insert of a
    * deleted key is visible (its file's seq exceeds the delete's).
    * Returns the new version, or 0 for an empty key set. Call
    * [[compactDeletes]] periodically to fold accumulated deletes into
    * a copy-on-write rewrite. */
  def deleteRowsMoR(spark: SparkSession, table: String, keyCol: String,
      keys: DataFrame): Int = {
    val prev = currentVersion(spark, table)
    require(prev >= 1, s"Snapshots: no initial commit under $table")
    val sch = schemaOf(spark, table, prev)
    require(sch.nonEmpty,
      s"Snapshots.deleteRowsMoR: $table predates schema tracking — " +
        "re-commit once (commitFull) to adopt it before using " +
        "merge-on-read deletes")
    require(sch.exists(_.fieldNames.contains(keyCol)),
      s"Snapshots.deleteRowsMoR: key column '$keyCol' not in v$prev's " +
        s"schema of $table")
    val v = prev + 1
    reserve(spark, table, v)
    val keyTyped = sch.map(_(keyCol).dataType)
      .map(t => keys.select(col(keyCol).cast(t))).getOrElse(
        keys.select(keyCol))
    val distinctKeys = keyTyped.distinct()
    if (distinctKeys.isEmpty) { breakReservation(spark, table, v); return 0 }
    val dir = s"data/c$v/_del"
    val delDf = distinctKeys.withColumn("_delseq", lit(v))
    delDf.coalesce(1).write.mode("overwrite").parquet(s"$table/$dir")
    val fresh = fileStats(spark, table, dir, Nil,
      Some(org.apache.spark.sql.types.StructType(
        delDf.schema.fields.map(_.copy(nullable = true))))).map {
      case (rel, n, st) =>
        FileEntry(rel, s"_del$v", n, st, Some("_del"),
          Some(s"delete:$keyCol"), Some(v))
    }
    commitManifest(spark, table, v, prev, fresh, Nil, None)
    sch.foreach(writeSchema(spark, table, v, _))
    partSpecOf(spark, table, prev)
      .foreach(writePartSpec(spark, table, v, _))
    publish(spark, table, v)
    v
  }

  /** Fold accumulated merge-on-read deletes into the data: rewrite the
    * affected partitions copy-on-write FROM THE MoR-FILTERED VIEW (one
    * [[commitOverwritePartitions]] — the rewritten files' seq then
    * exceeds every delete's, making the delete files inert), then drop
    * the delete files in a second, metadata-only commit. Crash-safe in
    * between: inert delete files change no answer, and a re-run just
    * drops them. Returns rewritten partition count (0 = nothing to
    * fold). Single-spec tables only (the CoW rewrite commits under
    * `partCol`); spec-evolved tables fold with [[deleteRows]] per era
    * first. */
  def compactDeletes(spark: SparkSession, table: String, partCol: String,
      statsCols: Seq[String] = Nil): Int = {
    import spark.implicits._
    val baseV = currentVersion(spark, table)
    val (_, dels) = allEntries(spark, table, baseV)
    if (dels.isEmpty) return 0
    // the fold commits under `partCol` for EVERY affected file, so a
    // legacy-era file (different spec) would be rewritten under the
    // wrong spec while its era-scoped tombstone spares the original —
    // row duplication, then the delete-file drop resurrects whatever
    // the legacy files still suppressed. Refuse instead (the dual of
    // mergeRows' era guard); spec-evolved tables fold per era with
    // [[deleteRows]] first.
    val foreign = manifestDF(spark, table, baseV)
      .where(!isDelete(col("kind")) &&
        col("spec").isNotNull && col("spec") =!= partCol)
      .limit(1).count()
    require(foreign == 0L,
      s"Snapshots.compactDeletes: $table@v$baseV holds files from a " +
        s"partition-spec era other than '$partCol' — fold " +
        "spec-evolved tables with deleteRows per era first")
    val sch = schemaOf(spark, table, baseV)
    // partitions still holding a row a delete suppresses = the fold
    // set. One seq-guarded SEMI-join per delete KEY COLUMN, unioned:
    // a row is suppressed when ANY key column's deletes match it, so
    // the affected set is the UNION across key columns — chaining the
    // semi-joins (as the anti-join read path correctly does) would
    // intersect them and the delete-file drop below would resurrect
    // rows only one key column suppressed. Each group's probe is
    // key-range pruned against the manifest stats (fails open), so a
    // handful of tombstoned keys probe O(candidate files), not the
    // table.
    val mdf = manifestDF(spark, table, baseV)
    val affected = dels.groupBy(_._2).toSeq.sortBy(_._1)
      .map { case (kc, files) =>
        val delKeys = spark.read
          .parquet(files.map(f => s"$table/${f._1}"): _*).select(kc)
        val pruned = mdf
          .where(!isDelete(col("kind")) && keyRangePrune(delKeys, kc))
          .select(col("path"), coalesce(col("seq"), lit(0)).as("seq"))
          .as[(String, Int)].collect().toSeq
        if (pruned.isEmpty)
          spark.emptyDataset[String].toDF("_gpart")
        else
          morJoin(spark, table,
            morTag(spark,
              scanPaths(spark, table, pruned.map(_._1), sch), pruned),
            files, "left_semi")
            .select(col(partCol).cast("string").as("_gpart"))
      }
      .reduce(_.unionByName(_)).distinct()
      .as[String].collect().sorted
    var expect = baseV
    if (affected.nonEmpty) {
      // rewrite scan pinned to the AFFECTED partitions' files (the
      // single-spec guard above makes manifest partition values
      // caller-spec, so the pin is exact); the residual row filter
      // stays as belt-and-braces
      val mine = mdf
        .where(!isDelete(col("kind")) &&
          col("partition").isin(affected.toSeq: _*))
        .select(col("path"), coalesce(col("seq"), lit(0)).as("seq"))
        .as[(String, Int)].collect().toSeq
      val kept = morScan(spark, table, mine, dels, sch)
        .where(col(partCol).cast("string").isin(affected.toSeq: _*))
      expect = commitOverwritePartitions(kept, table, partCol,
        affected.toSeq, statsCols, expectedPrev = Some(expect))
    }
    // metadata-only drop of the (now inert) delete files: tombstone
    // their unique `_del<v>` partitions under the reserved `_del` spec
    val prev = currentVersion(spark, table)
    val v = prev + 1
    reserve(spark, table, v)
    if (expect != prev) { // a foreign commit slipped in: OCC refusal
      breakReservation(spark, table, v)
      throw new ConcurrentCommitException(table, v)
    }
    val delParts = manifestDF(spark, table, prev)
      .where(isDelete(col("kind"))).select("partition").distinct()
      .as[String].collect().toSeq.sorted
    commitManifest(spark, table, v, prev, Nil, delParts, Some("_del"))
    schemaOf(spark, table, prev).foreach(writeSchema(spark, table, v, _))
    partSpecOf(spark, table, prev)
      .foreach(writePartSpec(spark, table, v, _))
    publish(spark, table, v)
    affected.length
  }

  // ---- reads ----------------------------------------------------------

  private def scanPaths(spark: SparkSession, table: String,
      paths: Seq[String],
      schema: Option[org.apache.spark.sql.types.StructType] = None)
      : DataFrame = {
    require(paths.nonEmpty, s"Snapshots: empty file set under $table")
    // the version's recorded schema is passed EXPLICITLY: the reader
    // null-fills columns a pre-evolution file lacks, no per-file footer
    // merge, and time travel returns exactly that version's columns
    val r = schema.fold(spark.read)(spark.read.schema)
    r.parquet(paths.map(p => s"$table/$p"): _*)
  }

  /** Read as of a PINNED version: the file set is resolved here, once,
    * so the returned frame keeps answering with version `v`'s rows no
    * matter how many commits land afterwards. Merge-on-read delete
    * files of `v` are applied ([[morScan]]); versions without deletes
    * read as the plain multi-file scan. */
  def readAsOf(spark: SparkSession, table: String, v: Int): DataFrame = {
    val (data, dels) = allEntries(spark, table, v)
    morScan(spark, table, data, dels, schemaOf(spark, table, v))
  }

  /** Read the latest snapshot — pinned at CALL time (the manifest is
    * resolved now), so a concurrent commit cannot make this frame see
    * a mix of two versions. */
  def read(spark: SparkSession, table: String): DataFrame =
    readAsOf(spark, table, currentVersion(spark, table))

  /** Incremental consumption — rows ADDED between two versions, found
    * by manifest diff: scan exactly the files in version `toV`'s
    * manifest that `fromV`'s lacks, nothing else. An incremental
    * consumer at 100 TB reads only the delta, not the table.
    *
    * Semantics (the Iceberg incremental-append contract): appended
    * files surface their rows once; a partition OVERWRITE surfaces the
    * partition's full new file set (the consumer sees it as a
    * refreshed partition — removed rows are not subtracted, this is an
    * append-stream view, not a row-level CDC diff; row-level deltas
    * are [[graft.streaming.CdcView]]'s job). */
  def readChanges(spark: SparkSession, table: String, fromV: Int,
      toV: Int): DataFrame = {
    require(fromV >= 0 && fromV <= toV,
      s"Snapshots.readChanges: need 0 <= fromV <= toV, got $fromV..$toV")
    import spark.implicits._
    val to = manifestDF(spark, table, toV)
    // the version diff is a left-anti join INSIDE the plan — neither
    // manifest materializes on the driver, only the added paths do.
    // Merge-on-read DELETE files are metadata, not rows: they never
    // surface in the append stream, and `toV`'s deletes apply to the
    // added data files (a key appended then MoR-deleted inside the
    // range is not "added" at toV).
    val flagged = (
      if (fromV == 0) to.withColumn("_new", lit(true))
      else to.join(manifestDF(spark, table, fromV)
          .select(col("path"), lit(true).as("_old")),
          Seq("path"), "left_outer")
        .withColumn("_new", col("_old").isNull).drop("_old")
      )
      .select(col("path"), coalesce(col("seq"), lit(0)).as("seq"),
        col("kind"), col("_new"))
      .as[(String, Int, String, Boolean)].collect().toSeq
    // one collect carries everything: the added data files AND toV's
    // delete files (ALL of them — a delete from before the range still
    // suppresses an added-then-deleted key at toV)
    val (_, dels) = splitEntries(flagged.map(r => (r._1, r._2, r._3)))
    val added = flagged
      .filter(r => r._4 && (r._3 == null || !r._3.startsWith("delete:")))
      .map(r => (r._1, r._2))
    val sch = schemaOf(spark, table, toV)
    if (added.isEmpty) {
      // nothing new: an empty frame with the version's schema (one
      // file resolves it when the table predates schema tracking)
      val one = to.where(!isDelete(col("kind"))).select("path")
        .limit(1).as[String].collect().toSeq
      scanPaths(spark, table, one, sch).where(lit(false))
    } else morScan(spark, table, added, dels, sch)
  }

  /** Row-level diff between two versions: (added, removed) frames via
    * null-safe anti-joins on `keyCols` (use the full column list for
    * whole-row semantics, or the primary key + changed columns for
    * keyed tables). File-level [[readChanges]] is the cheap incremental
    * path; this is the audit path — "exactly which rows did the rewrite
    * change" — and it scans only the two manifests' file sets. */
  def diff(spark: SparkSession, table: String, fromV: Int, toV: Int,
      keyCols: Seq[String]): (DataFrame, DataFrame) = {
    require(keyCols.nonEmpty, "Snapshots.diff: keyCols must be non-empty")
    val a = readAsOf(spark, table, fromV)
    val b = readAsOf(spark, table, toV)
    def anti(left: DataFrame, right: DataFrame): DataFrame = {
      val l = left.alias("l")
      val r = right.alias("r")
      val on = keyCols.map(c => col(s"l.$c") <=> col(s"r.$c"))
        .reduce(_ && _)
      l.join(r, on, "left_anti")
    }
    (anti(b, a), anti(a, b)) // (added in toV, removed since fromV)
  }

  /** Table history — the DESCRIBE HISTORY equivalent: one row per
    * retained version with commit wall-clock, file count, row count,
    * and touched partitions (diffed against the previous retained
    * manifest). Driver-side metadata only. */
  def history(spark: SparkSession, table: String): DataFrame = {
    import spark.implicits._
    val f = fs(spark, table)
    val cur = currentVersion(spark, table)
    // graced below-floor dirs may linger (vacuum's one-cycle grace);
    // they are vacuumed, not retained
    val retained = (retentionFloor(spark, table) to cur).filter(v =>
      f.exists(new Path(manifestDir(table, v))))
    // per-version counts aggregate INSIDE the plan; the driver sees one
    // summary row plus the touched-partition list (bounded by the
    // partition count, not the file count) per version
    val rows = retained.map { v =>
      val m = manifestDF(spark, table, v)
      val summary = m.agg(count(lit(1)).as("nf"),
        coalesce(sum(col("rows")), lit(0L)).as("nr")).head()
      val fresh = retained.filter(_ < v).lastOption match {
        case Some(p) => m.join(
          manifestDF(spark, table, p).select("path"), Seq("path"),
          "left_anti")
        case None => m
      }
      val touched = fresh.select("partition").distinct()
        .as[String].collect().sorted
      (v, f.getFileStatus(new Path(manifestDir(table, v)))
        .getModificationTime, summary.getLong(0), summary.getLong(1),
        touched.mkString(","))
    }
    rows.toDF("version", "commit_ms", "n_files", "n_rows",
      "touched_partitions")
  }

  /** Highest version published at or before `tsMillis` (wall-clock time
    * travel — "what did the dashboard show yesterday 09:00"). Commit
    * time is the manifest dir's filesystem mtime: set when the manifest
    * finished writing, immediately before the pointer publish, and
    * never touched again — no clock is stored in the data path. */
  def versionAsOfTime(spark: SparkSession, table: String, tsMillis: Long)
      : Int = {
    val f = fs(spark, table)
    val vs = (retentionFloor(spark, table) to
        currentVersion(spark, table)).filter { v =>
      val p = new Path(manifestDir(table, v))
      f.exists(p) && f.getFileStatus(p).getModificationTime <= tsMillis
    }
    require(vs.nonEmpty,
      s"Snapshots: no version of $table existed at epoch-ms $tsMillis " +
        "(or its manifest was vacuumed)")
    vs.max
  }

  def readAsOfTime(spark: SparkSession, table: String, tsMillis: Long)
      : DataFrame =
    readAsOf(spark, table, versionAsOfTime(spark, table, tsMillis))

  // ---- manifest-level stats pruning -----------------------------------

  /** Plan-side survival predicate for one column range over manifest
    * rows: numeric stats compare in DECIMAL(38,18) — covers the full
    * long range exactly (19 integer digits + 18 fractional ≤ 38); a
    * magnitude that overflows the cast yields NULL and the file is
    * conservatively KEPT, as is any sub-1e-18 distinction the scale
    * rounds away (rounding is monotone, so collapsing toward equality
    * only ever widens the kept set — pruning can lose a sliver of
    * sharpness in pathological ranges, never a row). Strings / dates /
    * timestamps compare lexicographically (ISO order = value order).
    * Files with no stats for the column, or all-null stats, are kept. */
  private def overlapCol(c: String, lo: String, hi: String): Column =
    pruneColOpt(c, Some(lo), Some(hi))

  /** [[overlapCol]] generalized to OPTIONAL bounds — the shared survival
    * predicate for both the library reads ([[readWhere]], both bounds)
    * and the SQL catalog's pushed filters (one-sided `>=`/`<=`
    * comparisons push one bound each; their conjunction equals the
    * two-sided overlap, which is what keeps the SQL scan's file set
    * identical to [[readRange]]'s — SnapshotCatalogSpec pins it). */
  private[graft] def pruneColOpt(c: String, lo: Option[String],
      hi: Option[String]): Column = {
    val st = col("stats").getItem(c)
    val typ = st.getField("typ")
    val flo = st.getField("lo")
    val fhi = st.getField("hi")
    val numeric = typ.isin("byte", "short", "integer", "long",
      "float", "double") || typ.startsWith("decimal")
    val dec = "decimal(38,18)"
    val numOv = lo.map(l => fhi.cast(dec) >= lit(l).cast(dec))
      .getOrElse(lit(true)) &&
      hi.map(h => flo.cast(dec) <= lit(h).cast(dec)).getOrElse(lit(true))
    val strOv = lo.map(l => fhi >= lit(l)).getOrElse(lit(true)) &&
      hi.map(h => flo <= lit(h)).getOrElse(lit(true))
    st.isNull || flo.isNull || fhi.isNull ||
      coalesce(when(numeric, numOv).otherwise(strOv), lit(true))
  }

  /** Stringify one pushed-filter comparison value into the stats
    * comparison domain — None for types whose `toString` does not match
    * Spark's `cast(string)` of the column (timestamps; anything exotic),
    * which keeps pruning CONSERVATIVE: an untranslatable value prunes
    * nothing rather than mis-pruning a boundary file. */
  private def statLit(v: Any): Option[String] = v match {
    case null => None
    case _: java.lang.Integer | _: java.lang.Long | _: java.lang.Short |
         _: java.lang.Byte | _: java.lang.Float | _: java.lang.Double |
         _: java.math.BigDecimal | _: java.lang.Boolean => Some(v.toString)
    case s: String => Some(s)
    case s: org.apache.spark.unsafe.types.UTF8String => Some(s.toString)
    case d: java.sql.Date => Some(d.toString)
    case d: java.time.LocalDate => Some(d.toString)
    case _ => None
  }

  /** Manifest-pruning predicate for one pushed source Filter — None
    * when the shape or value type cannot prune (the file is kept;
    * Spark's residual filter preserves correctness either way).
    * Equality on the version's PARTITION column additionally prunes by
    * the manifest's exact partition value for same-era files (the
    * [[readPartition]] rule), which is what makes `WHERE day = 'x'`
    * directory-exact through SQL even when `day` carries no stats. */
  private def pruneFilter(f: org.apache.spark.sql.sources.Filter,
      partCol: Option[String]): Option[Column] = {
    import org.apache.spark.sql.sources._
    def eq(c: String, v: Any): Option[Column] = statLit(v).map { s =>
      val statsOv = pruneColOpt(c, Some(s), Some(s))
      if (partCol.contains(c)) {
        val sameEra = col("spec").isNotNull && col("spec") === lit(c)
        (sameEra && col("partition") === lit(s)) || (!sameEra && statsOv)
      } else statsOv
    }
    f match {
      case EqualTo(c, v) => eq(c, v)
      case EqualNullSafe(c, v) if v != null => eq(c, v)
      case In(c, vs) =>
        val preds = vs.toSeq.map(v => eq(c, v))
        if (preds.isEmpty || preds.exists(_.isEmpty)) None
        else Some(preds.flatten.reduce(_ || _))
      case GreaterThan(c, v) =>
        statLit(v).map(s => pruneColOpt(c, Some(s), None))
      case GreaterThanOrEqual(c, v) =>
        statLit(v).map(s => pruneColOpt(c, Some(s), None))
      case LessThan(c, v) =>
        statLit(v).map(s => pruneColOpt(c, None, Some(s)))
      case LessThanOrEqual(c, v) =>
        statLit(v).map(s => pruneColOpt(c, None, Some(s)))
      case And(l, r) =>
        (pruneFilter(l, partCol), pruneFilter(r, partCol)) match {
          case (Some(a), Some(b)) => Some(a && b)
          case (a, b) => a.orElse(b) // one side still prunes
        }
      case Or(l, r) => // both sides must prune, else keep everything
        for (a <- pruneFilter(l, partCol); b <- pruneFilter(r, partCol))
          yield a || b
      case _ => None
    }
  }

  /** Planning-time file pruning for the SQL catalog: the data-file
    * paths of version `v` (ABSOLUTE) that could satisfy every pushed
    * filter, decided from manifest stats + era-aware partition values —
    * no parquet footer opened. Conservative by construction: an
    * untranslatable filter keeps all files; correctness rides on
    * Spark's residual Filter, pruning only cuts IO. */
  private[graft] def sqlPrunedPaths(spark: SparkSession, table: String,
      v: Int, filters: Seq[org.apache.spark.sql.sources.Filter])
      : Seq[String] = {
    import spark.implicits._
    val partCol = partSpecOf(spark, table, v)
    val preds = filters.flatMap(pruneFilter(_, partCol))
    // delete-file entries never reach the file scan: their parquet
    // shape is the key set, not the table schema (when a version
    // carries active deletes the SQL path routes through
    // [[sqlMorScan]] instead, but the guard keeps this leg safe
    // regardless)
    val mdf = manifestDF(spark, table, v).where(!isDelete(col("kind")))
    val pruned = if (preds.isEmpty) mdf else mdf.where(preds.reduce(_ && _))
    pruned.select("path").as[String].collect().toSeq
      .map(p => s"$table/$p")
  }

  /** The SQL catalog's merge-on-read leg: version `v`'s rows with its
    * delete files APPLIED, file-pruned by the pushed filters exactly
    * like [[sqlPrunedPaths]] (delete files always ride along — a
    * delete suppresses rows in any surviving file). Returned as a
    * DataFrame because a plain DSv2 file Scan cannot express the
    * seq-guarded anti-join; the catalog bridges it through a
    * `V1Scan`, and all pushed filters stay residual above it, so
    * pruning here only cuts IO. */
  private[graft] def sqlMorScan(spark: SparkSession, table: String,
      v: Int, filters: Seq[org.apache.spark.sql.sources.Filter])
      : DataFrame = {
    import spark.implicits._
    val partCol = partSpecOf(spark, table, v)
    val preds = filters.flatMap(pruneFilter(_, partCol))
    val mdf = manifestDF(spark, table, v)
    val keepPred =
      if (preds.isEmpty) !isDelete(col("kind"))
      else !isDelete(col("kind")) && preds.reduce(_ && _)
    val (keep, dels) = splitEntries(
      mdf.where(isDelete(col("kind")) || keepPred)
        .select(col("path"), coalesce(col("seq"), lit(0)).as("seq"),
          col("kind"))
        .as[(String, Int, String)].collect().toSeq)
    val sch = schemaOf(spark, table, v)
    if (keep.isEmpty) {
      val one = mdf.where(!isDelete(col("kind"))).select("path")
        .limit(1).as[String].collect().toSeq
      scanPaths(spark, table, one, sch).where(lit(false))
    } else morScan(spark, table, keep, dels, sch)
  }

  /** Files of version `v` that COULD hold rows with `c` in [lo, hi] —
    * decided from manifest stats alone, no footer opened, and filtered
    * INSIDE the manifest plan: the driver materializes only the
    * surviving entries, never the full file list. */
  def prunedFiles(spark: SparkSession, table: String, v: Int, c: String,
      lo: String, hi: String): Seq[FileEntry] = {
    import spark.implicits._
    manifestDF(spark, table, v).where(overlapCol(c, lo, hi))
      .as[FileEntry].collect().toSeq
  }

  /** Range read with planning-time file skipping: scans only the files
    * whose manifest stats overlap [lo, hi], then re-applies the exact
    * predicate (stats prune at file granularity; the residual filter
    * still runs, pushed into the parquet reader as usual). */
  def readRange(spark: SparkSession, table: String, c: String,
      lo: String, hi: String): DataFrame =
    readWhere(spark, table, Map(c -> (lo, hi)))

  /** Era-aware partition read under SPEC EVOLUTION: scan exactly the
    * files that can hold rows with `partCol == value` in the CURRENT
    * version. Files committed under the same spec prune by their
    * manifest partition value (exact — only the named partition's
    * files); files of OTHER eras prune by per-file stats on `partCol`
    * when the era recorded them, and are conservatively scanned
    * otherwise (their rows pass through the residual filter — a
    * pre-evolution file that never carried the column null-fills it
    * and contributes nothing). This is the migration economics of spec
    * evolution: the new layout's reads are directory-exact
    * immediately, legacy data serves unrewritten. */
  def readPartition(spark: SparkSession, table: String, partCol: String,
      value: String): DataFrame = {
    import spark.implicits._
    val v = currentVersion(spark, table)
    val sch = schemaOf(spark, table, v)
    require(sch.forall(_.fieldNames.contains(partCol)),
      s"Snapshots.readPartition: column '$partCol' not in v$v's schema")
    // 3VL care: a legacy file's spec is NULL — it must land in the
    // other-era (conservative) branch, never be dropped by a
    // null-valued comparison
    val sameEra = col("spec").isNotNull && col("spec") === lit(partCol)
    val otherEra = col("spec").isNull || col("spec") =!= lit(partCol)
    val pred = (sameEra && col("partition") === lit(value)) ||
      (otherEra && overlapCol(partCol, value, value))
    val mdf = manifestDF(spark, table, v)
    // ONE resolution: surviving data files AND the version's delete
    // files (kept unconditionally — a delete suppresses rows wherever
    // they live) ride the same collect
    val (keep, dels) = splitEntries(
      mdf.where(isDelete(col("kind")) || pred)
        .select(col("path"), coalesce(col("seq"), lit(0)).as("seq"),
          col("kind"))
        .as[(String, Int, String)].collect().toSeq)
    if (keep.isEmpty) {
      val one = mdf.where(!isDelete(col("kind"))).select("path")
        .limit(1).as[String].collect().toSeq
      scanPaths(spark, table, one, sch).where(lit(false))
    } else {
      val kept = morScan(spark, table, keep, dels, sch)
      kept.where(col(partCol).cast("string") === value)
    }
  }

  /** Conjunctive multi-column pruned read: a file survives only if its
    * stats overlap EVERY range — with independent clustering per
    * column (e.g. range-sorted on one, partition-aligned on another)
    * the surviving set is the intersection, each column knocking out
    * files the others can't. */
  def readWhere(spark: SparkSession, table: String,
      ranges: Map[String, (String, String)]): DataFrame = {
    require(ranges.nonEmpty, "Snapshots.readWhere: no ranges given")
    import spark.implicits._
    val v = currentVersion(spark, table)
    val mdf = manifestDF(spark, table, v)
    val pred = ranges.map { case (c, (lo, hi)) => overlapCol(c, lo, hi) }
      .reduce(_ && _)
    // pruning runs inside the manifest plan; the driver holds only the
    // surviving paths (and, on a fully-pruned read, the single path
    // needed to resolve the table schema)
    val sch = schemaOf(spark, table, v)
    // delete files ride the same collect (kept unconditionally: their
    // key columns carry no stats, and a delete suppresses rows in any
    // surviving file)
    val (keep, dels) = splitEntries(
      mdf.where(isDelete(col("kind")) || pred)
        .select(col("path"), coalesce(col("seq"), lit(0)).as("seq"),
          col("kind"))
        .as[(String, Int, String)].collect().toSeq)
    if (keep.isEmpty) {
      val one = mdf.where(!isDelete(col("kind"))).select("path")
        .limit(1).as[String].collect().toSeq
      scanPaths(spark, table, one, sch).where(lit(false))
    } else {
      val kept = morScan(spark, table, keep, dels, sch)
      val residual = ranges.map { case (c, (lo, hi)) =>
        col(c) >= lit(lo).cast(kept.schema(c).dataType) &&
          col(c) <= lit(hi).cast(kept.schema(c).dataType)
      }.reduce(_ && _)
      kept.where(residual)
    }
  }

  /** Register the CURRENT snapshot as a temp view so `spark.sql` works
    * over the table. Pinned at registration time (the snapshot
    * contract): re-register to advance to a newer version. */
  def registerView(spark: SparkSession, table: String, name: String)
      : Unit =
    read(spark, table).createOrReplaceTempView(name)

  // ---- retention ------------------------------------------------------

  /** Drop history: publish `retainFrom` as the retention floor, delete
    * every data file no retained manifest references, and delete
    * below-floor manifest DIRS one vacuum cycle late (grace period).
    * Time travel to vacuumed versions fails with a clear error the
    * moment the floor publishes; [[read]] and all retained versions
    * are untouched. Returns deleted data-file count.
    *
    * Why the grace period: a reader that resolved a retained delta
    * version's chain JUST BEFORE this vacuum's re-checkpoint holds a
    * lazy plan ([[manifestDF]] is the documented lazy planning surface)
    * referencing checkpoint/delta parquet in below-floor dirs. Deleting
    * those dirs in the same call would fail that reader at action time
    * with FILE_NOT_EXIST — the readers-safe-during-rewrites contract
    * broken at the metadata layer. Instead each vacuum deletes only the
    * dirs below the PREVIOUS vacuum's floor: any plan referencing them
    * resolved before that floor published and has had a full vacuum
    * cycle to finish — the same retention-vs-longest-reader sizing rule
    * the data files already follow. New resolutions of graced versions
    * are refused by the floor check in [[manifestDF]], so the lingering
    * dirs serve only in-flight plans, never fresh reads of versions
    * whose data files this call reclaims. */
  def vacuum(spark: SparkSession, table: String, retainFrom: Int): Int = {
    val f = fs(spark, table)
    val cur = currentVersion(spark, table)
    require(retainFrom <= cur,
      s"Snapshots.vacuum: retainFrom=$retainFrom > current=$cur")
    // floors never regress: versions below an already-published floor
    // are gone or graced, so a lower retainFrom cannot resurrect them
    val prevFloor = retentionFloor(spark, table)
    // tags are retention promises: the floor CLAMPS to the lowest
    // tagged version, so a vacuum can never reclaim a version a ref
    // still pins (delete the tag to release it). Tagging below the
    // floor is refused at tag time, so minTag >= prevFloor always and
    // the clamp cannot regress the floor.
    val minTag = listRefs(spark, table).map(_._2)
      .minOption.getOrElse(Int.MaxValue)
    val floor = math.max(prevFloor, math.min(retainFrom, minTag))
    // retention-floor compaction: if the floor version is a delta, its
    // chain resolves through manifests scheduled for deletion —
    // materialize it as a checkpoint IN PLACE first (later deltas
    // re-base onto it automatically, because the base is found by
    // walking, never stored). `_applied_*` markers and the dir mtime
    // (versionAsOfTime's clock) are preserved across the rewrite.
    if (floor >= 1 && f.exists(new Path(manifestDir(table, floor)))
        && readDeltaMeta(spark, table, floor).isDefined) {
      val dir = new Path(manifestDir(table, floor))
      val mtime = f.getFileStatus(dir).getModificationTime
      // A crash between the `_ckpt_<id>` parquet write and the pointer
      // rename strands both the subdir and a `_ckpt_ptr.tmp*` file in a
      // RETAINED dir forever (later vacuums mint fresh ids and never
      // revisit). Sweep that debris first: in this branch no pointer is
      // published (readDeltaMeta would have returned None), so every
      // `_ckpt_*` entry is an orphan no reader ever resolved to.
      f.listStatus(dir).foreach { st =>
        if (st.getPath.getName.startsWith("_ckpt_"))
          f.delete(st.getPath, true)
      }
      // Immutable re-checkpoint (see [[ckptPtrPath]]): materialize the
      // resolved set into a fresh `_ckpt_<id>` subdir, then publish it
      // with ONE atomic rename of the pointer file. Nothing an
      // in-flight reader planned against is deleted or renamed — the
      // previous delete-the-dir-and-rename swap raced concurrent scans
      // of this RETAINED version to FILE_NOT_EXIST. The superseded
      // delta files stay (bounded: one commit's worth) until the whole
      // dir drops below a later retention floor. `_applied_*` markers
      // and the dir mtime (versionAsOfTime's clock) are untouched by
      // construction; only the mtime needs restoring after the child
      // writes bump it.
      val id = java.util.UUID.randomUUID().toString.substring(0, 8)
      manifestDF(spark, table, floor).coalesce(1)
        .write.mode("overwrite")
        .parquet(new Path(dir, s"_ckpt_$id").toString)
      val tmp = new Path(dir, s"_ckpt_ptr.tmp$id")
      val out = f.create(tmp, true)
      try out.write(id.getBytes(StandardCharsets.UTF_8))
      finally out.close()
      require(f.rename(tmp, ckptPtrPath(table, floor)),
        s"Snapshots.vacuum: failed to publish the v$floor " +
          s"re-checkpoint pointer of $table")
      f.setTimes(dir, mtime, -1)
    }
    // floor publishes BEFORE any deletion: from this instant fresh
    // resolutions of below-floor versions fail cleanly, while in-flight
    // plans keep their graced manifest dirs for one more cycle
    publishFloor(spark, table, floor)
    (1 until prevFloor).foreach(v =>
      f.delete(new Path(manifestDir(table, v)), true))
    val dataRoot = new Path(table, "data")
    if (!f.exists(dataRoot)) return 0
    // DISTRIBUTED reclaim planning (the 10⁷-file lens): the live set is
    // a PLAN — the union of retained manifests' path columns — never a
    // driver Set (a 100 TB table's live paths are GBs of strings); the
    // listing fans out over commit dirs on executors; the delete set is
    // their anti-join, and the deletes themselves run foreachPartition
    // so the only driver state is the accumulator count. Commit dirs
    // ABOVE `cur` are an IN-FLIGHT writer's (the reserved slot's data
    // lands before its manifest publishes) and are skipped WHOLESALE at
    // dir enumeration — one O(versions) driver listing: their files are
    // unreferenced by every retained manifest yet must be SPARED, and
    // even LISTING them races the job committer's `_temporary` churn
    // (both measured by the soak spec's writer×vacuum interleaving). A
    // later vacuum judges them normally. Retained dirs' contents are
    // immutable, so their walks are churn-free; a racing surprise skips
    // that dir for this cycle (conservative — reclaimed next time).
    import spark.implicits._
    val liveDF = (floor to cur)
      .filter(v => f.exists(new Path(manifestDir(table, v))))
      .map(v => manifestDF(spark, table, v).select("path"))
      .reduce(_.unionByName(_)).distinct()
    val eligible = f.listStatus(dataRoot)
      .filter(_.isDirectory)
      .filter { d =>
        val n = d.getPath.getName
        !n.startsWith("c") ||
          scala.util.Try(n.drop(1).toInt).toOption.forall(_ <= cur)
      }
      .map(_.getPath.toString).toSeq
    if (eligible.isEmpty) return 0
    // executors rebuild FileSystem from a BROADCAST of the session's
    // full Hadoop configuration (SerializableConfiguration) — a bare
    // `new Configuration()` would drop every spark.hadoop.* override
    // (S3 credentials, fs.defaultFS), every listing would fail, and
    // the swallow-to-Nil guard would report "0 reclaimed" with no
    // diagnostic. Listing failures are now also COUNTED and surfaced
    // in a warning so a misconfigured deployment is loud, not silent.
    // Manifest-relative paths are derived by stripping the table
    // root's QUALIFIED prefix (both sides come from Path.toString on
    // the same FS, so they agree) — never by searching for a literal
    // 'data/c' substring, which a root like /data/corpus/t defeats:
    // the rel path would then never match the manifest's, the
    // anti-join would mark LIVE files unreferenced, and vacuum would
    // delete current data. A\u0001 separator packs
    // (full, rel) through one string column
    val rootPrefix = f.makeQualified(new Path(table)).toString
      .stripSuffix("/") + "/"
    val bcConf = spark.sparkContext.broadcast(
      new org.apache.spark.util.SerializableConfiguration(
        spark.sparkContext.hadoopConfiguration))
    val listFailures =
      spark.sparkContext.longAccumulator("graft.vacuum.listFailures")
    val listed = spark.createDataset(eligible)
      .repartition(math.min(eligible.size, 32))
      .flatMap { dir =>
        try {
          val p = new org.apache.hadoop.fs.Path(dir)
          val efs = p.getFileSystem(bcConf.value.value)
          val out = scala.collection.mutable.ArrayBuffer.empty[String]
          val it = efs.listFiles(p, true)
          while (it.hasNext) {
            val st = it.next()
            if (st.isFile) {
              val full = st.getPath.toString
              val rel =
                if (full.startsWith(rootPrefix))
                  full.substring(rootPrefix.length)
                else full
              if (rel.endsWith(".parquet"))
                out += full + "\u0001" + rel
            }
          }
          out.toSeq
        } catch {
          case scala.util.control.NonFatal(_) =>
            listFailures.add(1L); Nil
        }
      }
      .map { s =>
        val i = s.indexOf('\u0001'); (s.take(i), s.drop(i + 1))
      }
      .toDF("_full", "path")
    val acc = spark.sparkContext.longAccumulator("graft.vacuum.deleted")
    listed.join(liveDF, Seq("path"), "left_anti")
      .select(col("_full")).as[String]
      .foreachPartition { (it: Iterator[String]) =>
        val conf = bcConf.value.value
        it.foreach { full =>
          try {
            val p = new org.apache.hadoop.fs.Path(full)
            if (p.getFileSystem(conf).delete(p, false)) acc.add(1L)
          } catch { case scala.util.control.NonFatal(_) => () }
        }
      }
    if (listFailures.value > 0)
      org.slf4j.LoggerFactory.getLogger(getClass).warn(
        s"Snapshots.vacuum($table): ${listFailures.value} commit-dir " +
          "listings failed on executors (check executor Hadoop/FS " +
          "configuration) — their files were conservatively spared")
    acc.value.toInt
  }
}
