package graft.sources

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.io.Snapshots

class SnapshotCatalogSpec extends SparkSpec {

  private def rows(part: String, ids: Range, v: Long): DataFrame = {
    val s = spark
    import s.implicits._
    ids.map(i => (s"$part-$i", part, v + i)).toDF("id", "day", "cents")
  }

  /** Files the SQL plan will actually scan: the built ParquetScan's
    * file index, read off the optimized plan's V2 scan relation.
    * (`DataFrame.inputFiles` only understands FileTable-backed
    * relations; our table delegates to a ParquetScan built at
    * pushdown time, so the file set lives on the Scan itself.) */
  private def scannedFiles(df: DataFrame): Set[String] =
    df.queryExecution.optimizedPlan.collect {
      case r: org.apache.spark.sql.execution.datasources.v2
          .DataSourceV2ScanRelation =>
        r.scan match {
          case p: org.apache.spark.sql.execution.datasources.v2.parquet
              .ParquetScan => p.fileIndex.inputFiles.toSet
          case _ => Set.empty[String]
        }
    }.flatten.toSet

  /** Register a fresh catalog name over `root` (catalog instances are
    * cached per session — each test uses its own name). */
  private var n = 0
  private def catalog(root: String): String = {
    n += 1
    val name = s"graftcat$n"
    spark.conf.set(s"spark.sql.catalog.$name",
      classOf[SnapshotCatalog].getName)
    spark.conf.set(s"spark.sql.catalog.$name.root", root)
    name
  }

  test("SQL reads the current snapshot; VERSION AS OF pins history by " +
      "number and by named ref; TIMESTAMP AS OF time-travels") {
    val root = tmpDir("cat_basic")
    val t = s"$root/events"
    Snapshots.commitFull(
      rows("d1", 1 to 3, 0).unionByName(rows("d2", 1 to 3, 100)), t, "day")
    Snapshots.tag(spark, t, "train", 1)
    Thread.sleep(20)
    val cutoff = System.currentTimeMillis()
    Thread.sleep(20)
    Snapshots.commitOverwritePartition(rows("d2", 1 to 2, 9000), t,
      "day", "d2")
    val c = catalog(root)
    assert(spark.sql(s"SELECT count(*) AS n FROM $c.events")
      .head().getLong(0) == 5, "current = v2 (d2 replaced with 2 rows)")
    assert(spark.sql(s"SELECT count(*) AS n FROM $c.events VERSION AS OF 1")
      .head().getLong(0) == 6)
    assert(spark.sql(
      s"SELECT count(*) AS n FROM $c.events VERSION AS OF 'train'")
      .head().getLong(0) == 6, "a tag is a SQL-addressable version")
    val ts = new java.sql.Timestamp(cutoff).toString
    assert(spark.sql(
      s"SELECT count(*) AS n FROM $c.events TIMESTAMP AS OF '$ts'")
      .head().getLong(0) == 6, "wall-clock time travel lands on v1")
    // values, not just counts: SQL agg equals the library read
    val viaSql = spark.sql(
      s"SELECT day, sum(cents) AS s FROM $c.events GROUP BY day")
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val viaLib = Snapshots.read(spark, t)
      .groupBy("day").agg(sum("cents").as("s"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(viaSql == viaLib)
  }

  test("pushed range filter prunes the manifest: the SQL scan reads " +
      "EXACTLY the files readRange would") {
    val s = spark
    import s.implicits._
    val root = tmpDir("cat_prune")
    val t = s"$root/facts"
    // 4 partitions with disjoint cents ranges → disjoint per-file stats
    val df = (1 to 4).map { p =>
      (1 to 20).map(i => (s"p$p-$i", s"p$p", p * 1000L + i))
        .toDF("id", "day", "cents")
    }.reduce(_.unionByName(_))
    Snapshots.commitFull(df, t, "day", statsCols = Seq("cents"))
    val c = catalog(root)
    val sql = spark.sql(
      s"SELECT id, cents FROM $c.facts " +
        "WHERE cents >= 2000 AND cents <= 3005")
    val lib = Snapshots.readRange(spark, t, "cents", "2000", "3005")
    assert(sql.as[(String, Long)].collect().sorted.toSeq ==
      lib.select("id", "cents").as[(String, Long)].collect().sorted.toSeq)
    assert(scannedFiles(sql) == lib.inputFiles.toSet,
      "SQL planning must skip exactly the files manifest stats rule out")
    def parts(fs: Set[String]): Set[String] =
      fs.map(_.split('/').takeRight(2).head)
    assert(parts(scannedFiles(sql)) == Set("gp=p2", "gp=p3"),
      "two of four partitions overlap [2000, 3005]")
    // unfiltered SQL scans the full version
    assert(parts(scannedFiles(spark.sql(s"SELECT id FROM $c.facts")))
      .size == 4)
  }

  test("partition-column equality is directory-exact through SQL, " +
      "era-aware under spec evolution (readPartition's file set)") {
    val s = spark
    import s.implicits._
    val root = tmpDir("cat_part")
    val t = s"$root/evolved"
    Snapshots.commitFull(
      rows("d1", 1 to 3, 0).unionByName(rows("d2", 1 to 3, 100)), t, "day")
    // era 2: re-partition by `bucket`, value colliding with era-1 d1
    Snapshots.commitAppend(
      Seq(("e2-1", "z", "d1", 1000L), ("e2-2", "z", "x", 2000L))
        .toDF("id", "day", "bucket", "cents"), t, "bucket")
    val c = catalog(root)
    val sql = spark.sql(
      s"SELECT id FROM $c.evolved WHERE bucket = 'd1'")
    val lib = Snapshots.readPartition(spark, t, "bucket", "d1")
    assert(sql.as[String].collect().toSeq.sorted ==
      lib.select("id").as[String].collect().toSeq.sorted)
    assert(scannedFiles(sql) == lib.inputFiles.toSet,
      "same-era files prune by partition value; legacy-era files " +
        "serve conservatively — identical sets through SQL and library")
    assert(sql.as[String].collect().toSeq == Seq("e2-1"))
  }

  test("time travel returns exactly the old version's columns across " +
      "schema evolution; catalog lists and existence-checks tables") {
    val s = spark
    import s.implicits._
    val root = tmpDir("cat_evo")
    val t = s"$root/wide"
    Snapshots.commitFull(rows("d1", 1 to 2, 0), t, "day")
    Snapshots.commitAppend(
      Seq(("n1", "d2", 5L, "extra")).toDF("id", "day", "cents", "note"),
      t, "day")
    val c = catalog(root)
    assert(spark.sql(s"SELECT * FROM $c.wide VERSION AS OF 1")
      .columns.toSeq == Seq("id", "day", "cents"))
    assert(spark.sql(s"SELECT * FROM $c.wide").columns.toSeq ==
      Seq("id", "day", "cents", "note"))
    assert(spark.sql(s"SELECT note FROM $c.wide WHERE id = 'd1-1'")
      .head().isNullAt(0), "pre-evolution rows null-fill the new column")
    // listing + existence + missing-table error
    Snapshots.commitFull(rows("d1", 1 to 1, 0), s"$root/other", "day")
    assert(spark.sql(s"SHOW TABLES IN $c").collect()
      .map(_.getString(1)).toSet == Set("wide", "other"))
    val e = intercept[org.apache.spark.sql.AnalysisException] {
      spark.sql(s"SELECT * FROM $c.nope").collect()
    }
    assert(e.getMessage.toLowerCase.contains("table"))
  }

  test("DDL refuses with a pointer to the transactional library API") {
    val root = tmpDir("cat_ro")
    Snapshots.commitFull(rows("d1", 1 to 2, 0), s"$root/t1", "day")
    val c = catalog(root)
    intercept[Exception] {
      spark.sql(s"DROP TABLE $c.t1")
    }
    assert(spark.sql(s"SELECT count(*) FROM $c.t1").head().getLong(0) == 2,
      "refused drop leaves the table intact")
  }

  test("SQL INSERT INTO appends through the transactional commit " +
      "(version bumps, library read agrees); INSERT OVERWRITE replaces " +
      "wholesale and history stays time-travelable") {
    val root = tmpDir("cat_write")
    val t = s"$root/w"
    Snapshots.commitFull(rows("d1", 1 to 2, 0), t, "day")
    val c = catalog(root)
    spark.sql(s"INSERT INTO $c.w VALUES ('n1', 'd2', 50)")
    assert(Snapshots.currentVersion(spark, t) == 2,
      "a SQL insert is one snapshot commit")
    assert(spark.sql(s"SELECT count(*) AS n FROM $c.w")
      .head().getLong(0) == 3)
    assert(Snapshots.read(spark, t)
      .where(col("id") === "n1").count() == 1,
      "the library read sees the SQL-inserted row")
    spark.sql(
      s"INSERT OVERWRITE $c.w VALUES ('z1', 'd9', 1), ('z2', 'd9', 2)")
    assert(spark.sql(s"SELECT count(*) AS n FROM $c.w")
      .head().getLong(0) == 2, "overwrite replaces the table")
    assert(spark.sql(s"SELECT count(*) AS n FROM $c.w VERSION AS OF 2")
      .head().getLong(0) == 3,
      "pre-overwrite versions stay time-travelable")
    assert(Snapshots.currentVersion(spark, t) == 3)
  }
}
