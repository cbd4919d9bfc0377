package graft.queries

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.functions._

import graft.Tables
import graft.io.Snapshots

/** Time-travel over the snapshot-versioned table ([[graft.io.Snapshots]])
  * — the read half of the reference's Iceberg/Delta roadmap item
  * (reference `docs/design.md:168`).
  *
  * The query builds a real two-version table from `events` inside a
  * scratch dir, then answers from BOTH versions in one result:
  * version 1 is the raw ingest, version 2 rewrites exactly one
  * partition (purchases, cents doubled — an integer-exact transform
  * both engines replay). The oracle never sees the snapshot dir: it
  * recomputes each version's aggregate from the raw parquet, so a
  * hash match proves `readAsOf` returns precisely the pre-rewrite
  * rows and `read` precisely the post-rewrite ones.
  */
object SnapshotQueries {

  private def scratch(sfDir: String): String = {
    val tag = sfDir.replaceAll("[^A-Za-z0-9]", "_")
    s"${sys.props("java.io.tmpdir")}/graft_snapshot_q/$tag"
  }

  /** Shared by q_time_travel and q_snapshot_tag VERBATIM: a ref read
    * is defined as readAsOf of the pinned version, so the same oracle
    * proving one proves the other. */
  private val TimeTravelOracle: String =
    """WITH e AS (SELECT event_type,
      |    CAST(CAST(value AS DECIMAL(18,2)) * 100 AS BIGINT) AS cents
      |  FROM events WHERE event_type IS NOT NULL)
      |SELECT tag, event_type, n, sum_cents FROM (
      |  SELECT 'v1' AS tag, event_type,
      |    CAST(COUNT(*) AS BIGINT) AS n,
      |    CAST(SUM(cents) AS BIGINT) AS sum_cents
      |  FROM e GROUP BY event_type
      |  UNION ALL
      |  SELECT 'v2_current' AS tag, event_type,
      |    CAST(COUNT(*) AS BIGINT) AS n,
      |    CAST(SUM(CASE WHEN event_type = 'purchase' THEN 2 * cents
      |              ELSE cents END) AS BIGINT) AS sum_cents
      |  FROM e GROUP BY event_type)
      |ORDER BY tag, event_type""".stripMargin

  val all: Seq[Q] = Seq(
    Q(
      "q_time_travel",
      TimeTravelOracle
    ) { (s, d) =>
      val table = scratch(d)
      // clean slate → version numbers are deterministic per run
      val p = new Path(table)
      val fs = p.getFileSystem(s.sparkContext.hadoopConfiguration)
      fs.delete(p, true)

      val ev = Tables.events(s, d)
        .where(col("event_type").isNotNull)
        .select(col("event_id"), col("event_type"),
          (col("value").cast("decimal(18,2)") * 100).cast("long")
            .as("cents"))
      val v1 = Snapshots.commitFull(ev, table, "event_type")
      Snapshots.commitOverwritePartition(
        ev.where(col("event_type") === "purchase")
          .withColumn("cents", col("cents") * 2),
        table, "event_type", "purchase")

      def agg(df: org.apache.spark.sql.DataFrame, tag: String) =
        df.groupBy(col("event_type"))
          .agg(count(lit(1)).as("n"),
            sum(col("cents")).cast("long").as("sum_cents"))
          .select(lit(tag).as("tag"), col("event_type"), col("n"),
            col("sum_cents"))

      // the PINNED pre-rewrite version and the current version, read
      // AFTER the rewrite landed — time travel is the point
      agg(Snapshots.readAsOf(s, table, v1), "v1")
        .unionByName(agg(Snapshots.read(s, table), "v2_current"))
        .orderBy(col("tag"), col("event_type"))
    },

    // --- named refs: read-by-tag ≡ readAsOf ------------------------------
    // The reproducible-training handle (reference `docs/design.md:168`'s
    // "at scale" clause): v1 is tagged 'train-base' BEFORE the rewrite
    // lands, and the result's v1 leg reads through Snapshots.readRef —
    // by the tag name, not the integer. The oracle is q_time_travel's
    // VERBATIM: a ref read is defined as readAsOf of the pinned
    // version, so one hash proves both. The tag also pins retention
    // (vacuum clamps its floor to the lowest tag — SnapshotsSpec's
    // vacuum-protection case); here the engine additionally asserts
    // the ref round-trips through listRefs.
    Q(
      "q_snapshot_tag",
      TimeTravelOracle
    ) { (s, d) =>
      val table = scratch(d) + "_tag"
      val p = new Path(table)
      val fs = p.getFileSystem(s.sparkContext.hadoopConfiguration)
      fs.delete(p, true)
      val ev = Tables.events(s, d)
        .where(col("event_type").isNotNull)
        .select(col("event_id"), col("event_type"),
          (col("value").cast("decimal(18,2)") * 100).cast("long")
            .as("cents"))
      val v1 = Snapshots.commitFull(ev, table, "event_type")
      Snapshots.tag(s, table, "train-base", v1)
      Snapshots.commitOverwritePartition(
        ev.where(col("event_type") === "purchase")
          .withColumn("cents", col("cents") * 2),
        table, "event_type", "purchase")
      require(Snapshots.listRefs(s, table) == Seq("train-base" -> v1),
        "the published ref must round-trip through listRefs")

      def agg(df: org.apache.spark.sql.DataFrame, tag: String) =
        df.groupBy(col("event_type"))
          .agg(count(lit(1)).as("n"),
            sum(col("cents")).cast("long").as("sum_cents"))
          .select(lit(tag).as("tag"), col("event_type"), col("n"),
            col("sum_cents"))

      // the pinned version BY NAME, read after the rewrite landed
      agg(Snapshots.readRef(s, table, "train-base"), "v1")
        .unionByName(agg(Snapshots.read(s, table), "v2_current"))
        .orderBy(col("tag"), col("event_type"))
    },

    // --- manifest-pruned range read --------------------------------------
    // The snapshot table is committed RANGE-SORTED on cents
    // (repartitionByRange before the commit), so each data file covers a
    // disjoint cents range and the manifest's per-file min/max stats
    // make readRange skip most files at PLANNING time — no footer
    // opened for a skipped file (SnapshotsSpec asserts the inputFiles
    // count; this query proves the pruned read returns exactly the
    // rows a full-scan filter would).
    Q(
      "q_snapshot_prune",
      """WITH e AS (SELECT event_type,
        |    CAST(CAST(value AS DECIMAL(18,2)) * 100 AS BIGINT) AS cents
        |  FROM events WHERE event_type IS NOT NULL)
        |SELECT event_type, CAST(COUNT(*) AS BIGINT) AS n,
        |  CAST(SUM(cents) AS BIGINT) AS sum_cents
        |FROM e WHERE cents BETWEEN 2500 AND 7500
        |GROUP BY event_type
        |ORDER BY event_type""".stripMargin
    ) { (s, d) =>
      val table = scratch(d) + "_prune"
      val p = new Path(table)
      val fs = p.getFileSystem(s.sparkContext.hadoopConfiguration)
      fs.delete(p, true)
      val ev = Tables.events(s, d)
        .where(col("event_type").isNotNull)
        .select(col("event_id"), col("event_type"),
          (col("value").cast("decimal(18,2)") * 100).cast("long")
            .as("cents"))
        .repartitionByRange(16, col("cents"))
      Snapshots.commitFull(ev, table, "event_type",
        statsCols = Seq("cents"))
      Snapshots.readRange(s, table, "cents", "2500", "7500")
        .groupBy(col("event_type"))
        .agg(count(lit(1)).as("n"),
          sum(col("cents")).cast("long").as("sum_cents"))
        .orderBy(col("event_type"))
    },

    // --- transactional MERGE into the snapshot store ----------------------
    // The CDC landing path (Snapshots.mergeRows): one deterministic
    // change batch — updates (event_id%10=3 triples its cents), deletes
    // (event_id%10=7), and inserts under brand-new keys into a brand-new
    // partition ('restated') — lands as ONE atomic version. The result
    // reads BOTH sides of the commit: the pinned pre-merge version and
    // the merged current one; the oracle recomputes each as a flat MERGE
    // over the raw parquet, so a hash match proves the upsert/delete/
    // insert semantics AND that time travel across the merge returns
    // precisely the pre-merge rows. Scale shape: the change batch
    // touches only the partitions holding changed keys plus the insert
    // landing partition — the merge join reads those partitions' files
    // off the pinned manifest, never the table.
    Q(
      "q_snapshot_merge",
      """WITH e AS (SELECT event_id, event_type,
        |    CAST(CAST(value AS DECIMAL(18,2)) * 100 AS BIGINT) AS cents
        |  FROM events WHERE event_type IS NOT NULL),
        |v2 AS (
        |  SELECT event_type,
        |    cents * CASE WHEN event_id % 10 = 3 THEN 3 ELSE 1 END AS cents
        |  FROM e WHERE event_id % 10 <> 7
        |  UNION ALL
        |  SELECT 'restated' AS event_type, cents + 7 AS cents
        |  FROM e WHERE event_id % 10 = 1)
        |SELECT tag, event_type, n, sum_cents FROM (
        |  SELECT 'v1' AS tag, event_type,
        |    CAST(COUNT(*) AS BIGINT) AS n,
        |    CAST(SUM(cents) AS BIGINT) AS sum_cents
        |  FROM e GROUP BY event_type
        |  UNION ALL
        |  SELECT 'v2_merged' AS tag, event_type,
        |    CAST(COUNT(*) AS BIGINT) AS n,
        |    CAST(SUM(cents) AS BIGINT) AS sum_cents
        |  FROM v2 GROUP BY event_type)
        |ORDER BY tag, event_type""".stripMargin
    ) { (s, d) =>
      val table = scratch(d) + "_merge"
      val p = new Path(table)
      p.getFileSystem(s.sparkContext.hadoopConfiguration).delete(p, true)
      val ev = Tables.events(s, d)
        .where(col("event_type").isNotNull)
        .select(col("event_id"), col("event_type"),
          (col("value").cast("decimal(18,2)") * 100).cast("long")
            .as("cents"))
      val v1 = Snapshots.commitFull(ev, table, "event_type")
      // the CDC batch: disjoint key sets by construction (inserts mint
      // keys far above the corpus id range), one change row per key
      val changes = ev.where(pmod(col("event_id"), lit(10)) === 3)
        .withColumn("cents", col("cents") * 3)
        .withColumn("op", lit("U"))
        .unionByName(ev.where(pmod(col("event_id"), lit(10)) === 7)
          .withColumn("op", lit("D")))
        .unionByName(ev.where(pmod(col("event_id"), lit(10)) === 1)
          .select((col("event_id") + 1000000000000L).as("event_id"),
            lit("restated").as("event_type"),
            (col("cents") + 7).as("cents"))
          .withColumn("op", lit("I")))
      Snapshots.mergeRows(s, table, "event_type", "event_id", changes)

      def agg(df: org.apache.spark.sql.DataFrame, tag: String) =
        df.groupBy(col("event_type"))
          .agg(count(lit(1)).as("n"),
            sum(col("cents")).cast("long").as("sum_cents"))
          .select(lit(tag).as("tag"), col("event_type"), col("n"),
            col("sum_cents"))

      agg(Snapshots.readAsOf(s, table, v1), "v1")
        .unionByName(agg(Snapshots.read(s, table), "v2_merged"))
        .orderBy(col("tag"), col("event_type"))
    },

    // --- schema evolution: a new column, no rewrite -----------------------
    // Era 1 commits half the events under the original (event_id,
    // event_type, cents) schema; era 2 appends the other half carrying a
    // NEW 'channel' column. The evolved read serves BOTH eras — old
    // files null-fill the column at scan time (the version's recorded
    // schema is passed to the reader explicitly; no file rewritten, no
    // mergeSchema footer pass) — and time travel to v1 returns exactly
    // the pre-change columns. The oracle recomputes both sides flat:
    // v1 = the era-1 subset (channel necessarily absent → the query
    // projects the literal NULL the engine's old-file scan produces),
    // v2 = both eras with era-1 rows under the NULL channel group.
    Q(
      "q_snapshot_schema_evolution",
      """WITH e AS (SELECT event_id, event_type,
        |    CAST(CAST(value AS DECIMAL(18,2)) * 100 AS BIGINT) AS cents
        |  FROM events WHERE event_type IS NOT NULL),
        |era2 AS (SELECT event_type, cents,
        |    CASE CAST(event_id % 3 AS INT) WHEN 0 THEN 'web'
        |         WHEN 1 THEN 'app' ELSE 'api' END AS channel
        |  FROM e WHERE event_id % 2 <> 0),
        |v2 AS (SELECT event_type, CAST(NULL AS VARCHAR) AS channel, cents
        |    FROM e WHERE event_id % 2 = 0
        |  UNION ALL SELECT event_type, channel, cents FROM era2)
        |SELECT tag, event_type, channel, n, sum_cents FROM (
        |  SELECT 'v1' AS tag, event_type, CAST(NULL AS VARCHAR) AS channel,
        |    CAST(COUNT(*) AS BIGINT) AS n,
        |    CAST(SUM(cents) AS BIGINT) AS sum_cents
        |  FROM e WHERE event_id % 2 = 0 GROUP BY event_type
        |  UNION ALL
        |  SELECT 'v2_evolved' AS tag, event_type, channel,
        |    CAST(COUNT(*) AS BIGINT) AS n,
        |    CAST(SUM(cents) AS BIGINT) AS sum_cents
        |  FROM v2 GROUP BY event_type, channel)
        |ORDER BY tag, event_type, channel NULLS FIRST""".stripMargin
    ) { (s, d) =>
      val table = scratch(d) + "_schema"
      val p = new Path(table)
      p.getFileSystem(s.sparkContext.hadoopConfiguration).delete(p, true)
      val ev = Tables.events(s, d)
        .where(col("event_type").isNotNull)
        .select(col("event_id"), col("event_type"),
          (col("value").cast("decimal(18,2)") * 100).cast("long")
            .as("cents"))
      val v1 = Snapshots.commitFull(
        ev.where(pmod(col("event_id"), lit(2)) === 0), table, "event_type")
      Snapshots.commitAppend(
        ev.where(pmod(col("event_id"), lit(2)) =!= 0)
          .withColumn("channel",
            when(pmod(col("event_id"), lit(3)) === 0, "web")
              .when(pmod(col("event_id"), lit(3)) === 1, "app")
              .otherwise("api")),
        table, "event_type")

      // v1 pinned ACROSS the schema change: its own columns, no channel
      val old = Snapshots.readAsOf(s, table, v1)
      require(!old.columns.contains("channel"),
        "time travel must return the pre-change schema")
      val v1Agg = old.groupBy(col("event_type"))
        .agg(count(lit(1)).as("n"),
          sum(col("cents")).cast("long").as("sum_cents"))
        .select(lit("v1").as("tag"), col("event_type"),
          lit(null).cast("string").as("channel"), col("n"),
          col("sum_cents"))
      val v2Agg = Snapshots.read(s, table)
        .groupBy(col("event_type"), col("channel"))
        .agg(count(lit(1)).as("n"),
          sum(col("cents")).cast("long").as("sum_cents"))
        .select(lit("v2_evolved").as("tag"), col("event_type"),
          col("channel"), col("n"), col("sum_cents"))
      v1Agg.unionByName(v2Agg)
        .orderBy(col("tag"), col("event_type"), col("channel"))
    },

    // --- MERGE × schema evolution: an old-shape CDC batch ----------------
    // The first-schema-change-after-go-live scenario (reference
    // `docs/design.md:165`): the table evolves (era-2 append adds
    // 'channel'), but a producer still emits the PRE-EVOLUTION shape.
    // mergeRows null-fills the table columns the batch lacks — the
    // write-path dual of the read path's old-file null-fill: a change
    // row is a full-row statement in the schema its producer knows, so
    // an updated row's evolved column becomes NULL (not a carried-over
    // target value), while untouched rows keep theirs. The result reads
    // the pinned pre-merge version AND the merged current one; the
    // oracle recomputes both flat, so a hash match proves the null-fill
    // semantics and that time travel across the merge still returns the
    // evolved-but-unmerged rows.
    Q(
      "q_snapshot_merge_evolved",
      """WITH e AS (SELECT event_id, event_type,
        |    CAST(CAST(value AS DECIMAL(18,2)) * 100 AS BIGINT) AS cents
        |  FROM events WHERE event_type IS NOT NULL),
        |v2 AS (SELECT event_id, event_type,
        |    CAST(NULL AS VARCHAR) AS channel, cents
        |  FROM e WHERE event_id % 2 = 0
        |  UNION ALL
        |  SELECT event_id, event_type,
        |    CASE CAST(event_id % 3 AS INT) WHEN 0 THEN 'web'
        |         WHEN 1 THEN 'app' ELSE 'api' END AS channel, cents
        |  FROM e WHERE event_id % 2 <> 0),
        |v3 AS (SELECT event_type,
        |    CASE WHEN event_id % 10 = 3 THEN CAST(NULL AS VARCHAR)
        |         ELSE channel END AS channel,
        |    cents * CASE WHEN event_id % 10 = 3 THEN 3 ELSE 1 END AS cents
        |  FROM v2 WHERE event_id % 10 <> 7
        |  UNION ALL
        |  SELECT 'restated' AS event_type, CAST(NULL AS VARCHAR) AS channel,
        |    cents + 7 AS cents
        |  FROM e WHERE event_id % 10 = 1)
        |SELECT tag, event_type, channel, n, sum_cents FROM (
        |  SELECT 'v2_premerge' AS tag, event_type, channel,
        |    CAST(COUNT(*) AS BIGINT) AS n,
        |    CAST(SUM(cents) AS BIGINT) AS sum_cents
        |  FROM v2 GROUP BY event_type, channel
        |  UNION ALL
        |  SELECT 'v3_merged' AS tag, event_type, channel,
        |    CAST(COUNT(*) AS BIGINT) AS n,
        |    CAST(SUM(cents) AS BIGINT) AS sum_cents
        |  FROM v3 GROUP BY event_type, channel)
        |ORDER BY tag, event_type, channel NULLS FIRST""".stripMargin
    ) { (s, d) =>
      val table = scratch(d) + "_merge_evolved"
      val p = new Path(table)
      p.getFileSystem(s.sparkContext.hadoopConfiguration).delete(p, true)
      val ev = Tables.events(s, d)
        .where(col("event_type").isNotNull)
        .select(col("event_id"), col("event_type"),
          (col("value").cast("decimal(18,2)") * 100).cast("long")
            .as("cents"))
      Snapshots.commitFull(
        ev.where(pmod(col("event_id"), lit(2)) === 0), table, "event_type")
      val v2 = Snapshots.commitAppend(
        ev.where(pmod(col("event_id"), lit(2)) =!= 0)
          .withColumn("channel",
            when(pmod(col("event_id"), lit(3)) === 0, "web")
              .when(pmod(col("event_id"), lit(3)) === 1, "app")
              .otherwise("api")),
        table, "event_type")
      // the OLD-SHAPE batch: event_id, event_type, cents, op — no channel
      val oldShape = ev.where(pmod(col("event_id"), lit(10)) === 3)
        .withColumn("cents", col("cents") * 3)
        .withColumn("op", lit("U"))
        .unionByName(ev.where(pmod(col("event_id"), lit(10)) === 7)
          .withColumn("op", lit("D")))
        .unionByName(ev.where(pmod(col("event_id"), lit(10)) === 1)
          .select((col("event_id") + 1000000000000L).as("event_id"),
            lit("restated").as("event_type"),
            (col("cents") + 7).as("cents"))
          .withColumn("op", lit("I")))
      Snapshots.mergeRows(s, table, "event_type", "event_id", oldShape)

      def agg(df: org.apache.spark.sql.DataFrame, tag: String) =
        df.groupBy(col("event_type"), col("channel"))
          .agg(count(lit(1)).as("n"),
            sum(col("cents")).cast("long").as("sum_cents"))
          .select(lit(tag).as("tag"), col("event_type"), col("channel"),
            col("n"), col("sum_cents"))

      agg(Snapshots.readAsOf(s, table, v2), "v2_premerge")
        .unionByName(agg(Snapshots.read(s, table), "v3_merged"))
        .orderBy(col("tag"), col("event_type"), col("channel"))
    },

    // --- partition evolution: new layout, no rewrite ---------------------
    // The Iceberg marquee capability the manifest design earns for free:
    // era 1 commits half the events partitioned BY DATE (the original
    // spec), era 2 appends the other half partitioned BY EVENT TYPE (the
    // new spec) — and a type-filtered read serves from BOTH eras through
    // the same stats pruning, because pruning rides on per-FILE min/max,
    // not on directory layout. The era-2 scan touches only the purchase
    // file; era-1 files survive pruning (each date file spans all types)
    // and the residual filter handles them — exactly the migration
    // economics at 100 TB: the new layout benefits new data immediately,
    // old data is never rewritten, and correctness never depended on
    // layout at all. The oracle recomputes from the raw table; the
    // pruning claim itself is PartitionEvolutionSpec's (inputFiles
    // strictly under the committed count).
    Q(
      "q_partition_evolution",
      """WITH e AS (SELECT CAST(ts AS DATE) AS event_date, user_id
        |  FROM events
        |  WHERE event_type = 'purchase')
        |SELECT event_date, CAST(COUNT(*) AS BIGINT) AS n,
        |  CAST(COUNT(DISTINCT user_id) AS BIGINT) AS n_users
        |FROM e GROUP BY event_date
        |ORDER BY event_date NULLS FIRST""".stripMargin
    ) { (s, d) => partitionEvolutionServe(s, d) },

    // --- TRANSACTIONAL partition-spec evolution --------------------------
    // q_partition_evolution proves the two-era READ; this proves the
    // spec is table METADATA with transactional semantics (the Iceberg
    // spec-evolution contract): each version records its partCol
    // (`_partspec`, partSpecOf), manifest rows carry their era, and a
    // whole-partition OVERWRITE in the evolved era (pt='purchase',
    // cents doubled) tombstones only same-era files — era-1 rows are
    // untouched bit-for-bit, proven by the 'current' leg's era-1
    // portion hashing against the raw replay. Three legs: the current
    // unified read after the overwrite, the era-exact partition read
    // (readPartition — only era-2 purchase files scan; era-1 rows
    // null-fill pt and drop in the residual), and time travel to the
    // pre-overwrite version across the spec boundary.
    Q(
      "q_snapshot_partition_evolution",
      """WITH e AS (SELECT event_id, event_type,
        |    CAST(CAST(value AS DECIMAL(18,2)) * 100 AS BIGINT) AS cents
        |  FROM events WHERE event_type IS NOT NULL),
        |e1 AS (SELECT * FROM e WHERE event_id % 2 = 0),
        |e2 AS (SELECT * FROM e WHERE event_id % 2 <> 0),
        |cur AS (
        |  SELECT event_type, cents FROM e1
        |  UNION ALL
        |  SELECT event_type,
        |    CASE WHEN event_type = 'purchase' THEN 2 * cents
        |         ELSE cents END AS cents
        |  FROM e2)
        |SELECT leg, event_type, n, sum_cents FROM (
        |  SELECT 'current' AS leg, event_type,
        |    CAST(COUNT(*) AS BIGINT) AS n,
        |    CAST(SUM(cents) AS BIGINT) AS sum_cents
        |  FROM cur GROUP BY event_type
        |  UNION ALL
        |  SELECT 'era_purchase', event_type, CAST(COUNT(*) AS BIGINT),
        |    CAST(SUM(2 * cents) AS BIGINT)
        |  FROM e2 WHERE event_type = 'purchase' GROUP BY event_type
        |  UNION ALL
        |  SELECT 'v2_preoverwrite', event_type, CAST(COUNT(*) AS BIGINT),
        |    CAST(SUM(cents) AS BIGINT)
        |  FROM e GROUP BY event_type)
        |ORDER BY leg, event_type""".stripMargin
    ) { (s, d) =>
      val table = scratch(d) + "_specevolve"
      val p = new Path(table)
      p.getFileSystem(s.sparkContext.hadoopConfiguration).delete(p, true)
      val ev = Tables.events(s, d)
        .where(col("event_type").isNotNull)
        .select(col("event_id"), col("event_type"),
          (col("value").cast("decimal(18,2)") * 100).cast("long")
            .as("cents"), to_date(col("ts")).as("event_date"))
      // era 1: date-partitioned
      val v1 = Snapshots.commitFull(
        ev.where(pmod(col("event_id"), lit(2)) === 0)
          .withColumn("pd", col("event_date").cast("string")),
        table, "pd", statsCols = Seq("event_type"))
      // era 2: the evolved type-partitioned spec — appended, no rewrite
      val v2 = Snapshots.commitAppend(
        ev.where(pmod(col("event_id"), lit(2)) =!= 0)
          .withColumn("pt", col("event_type")),
        table, "pt", statsCols = Seq("event_type"))
      require(Snapshots.partSpecOf(s, table, v1).contains("pd") &&
        Snapshots.partSpecOf(s, table, v2).contains("pt"),
        "each version must record its partition spec")
      // transactional overwrite IN THE EVOLVED ERA: purchase cents
      // doubled; the tombstone is era-scoped, era-1 files carry over
      Snapshots.commitOverwritePartition(
        ev.where(pmod(col("event_id"), lit(2)) =!= 0 &&
            col("event_type") === "purchase")
          .withColumn("cents", col("cents") * 2)
          .withColumn("pt", col("event_type")),
        table, "pt", "purchase")
      def agg(df: org.apache.spark.sql.DataFrame, leg: String) =
        df.groupBy(col("event_type"))
          .agg(count(lit(1)).as("n"),
            sum(col("cents")).cast("long").as("sum_cents"))
          .select(lit(leg).as("leg"), col("event_type"), col("n"),
            col("sum_cents"))
      agg(Snapshots.read(s, table), "current")
        .unionByName(agg(
          Snapshots.readPartition(s, table, "pt", "purchase"),
          "era_purchase"))
        .unionByName(agg(Snapshots.readAsOf(s, table, v2),
          "v2_preoverwrite"))
        .orderBy(col("leg"), col("event_type"))
    },

    // --- the SQL/catalog surface ([[graft.sources.SnapshotCatalog]]) ------
    // The reference's entire query layer is catalog SQL over the curated
    // table (reference `sql/athena/curated_events.sql:1-14` registers it,
    // `:17-36` queries it); this is the snapshot store reaching the same
    // surface with its versioning intact. Three legs, ALL pure
    // `spark.sql` text over the registered catalog — no library read
    // anywhere in the result path:
    //   current   — the live version through `FROM graftsql_*.events_sql`;
    //   v1        — `VERSION AS OF 'base'`, time travel BY NAMED REF
    //               across a partition rewrite;
    //   pruned    — a cents range over the range-sorted commit, planned
    //               through the manifest's per-file stats (the catalog's
    //               pushed-filter pruning; SnapshotCatalogSpec pins the
    //               file set == readRange's).
    // The oracle recomputes every leg flat from the raw parquet, so a
    // hash match proves the SQL path returns exactly the library
    // semantics: pinned versions, ref resolution, and pruning that cuts
    // IO without touching answers.
    Q(
      "q_snapshot_sql",
      """WITH e AS (SELECT event_id, event_type,
        |    CAST(CAST(value AS DECIMAL(18,2)) * 100 AS BIGINT) AS cents
        |  FROM events WHERE event_type IS NOT NULL),
        |v2 AS (SELECT event_type,
        |    cents * CASE WHEN event_type = 'purchase' THEN 2 ELSE 1 END
        |      AS cents
        |  FROM e)
        |SELECT leg, event_type, n, sum_cents FROM (
        |  SELECT 'current' AS leg, event_type,
        |    CAST(COUNT(*) AS BIGINT) AS n,
        |    CAST(SUM(cents) AS BIGINT) AS sum_cents
        |  FROM v2 GROUP BY event_type
        |  UNION ALL
        |  SELECT 'pruned', event_type, CAST(COUNT(*) AS BIGINT),
        |    CAST(SUM(cents) AS BIGINT)
        |  FROM v2 WHERE cents BETWEEN 2500 AND 7500 GROUP BY event_type
        |  UNION ALL
        |  SELECT 'v1', event_type, CAST(COUNT(*) AS BIGINT),
        |    CAST(SUM(cents) AS BIGINT)
        |  FROM e GROUP BY event_type)
        |ORDER BY leg, event_type""".stripMargin
    ) { (s, d) =>
      val root = scratch(d) + "_sqlcat"
      val table = s"$root/events_sql"
      val p = new Path(root)
      p.getFileSystem(s.sparkContext.hadoopConfiguration).delete(p, true)
      val ev = Tables.events(s, d)
        .where(col("event_type").isNotNull)
        .select(col("event_id"), col("event_type"),
          (col("value").cast("decimal(18,2)") * 100).cast("long")
            .as("cents"))
        // range-sorted so per-file cents stats are disjoint → the SQL
        // range leg's pushed filter prunes whole files at planning time
        .repartitionByRange(16, col("cents"))
      val v1 = Snapshots.commitFull(ev, table, "event_type",
        statsCols = Seq("cents"))
      Snapshots.tag(s, table, "base", v1)
      Snapshots.commitOverwritePartition(
        ev.where(col("event_type") === "purchase")
          .withColumn("cents", col("cents") * 2),
        table, "event_type", "purchase", statsCols = Seq("cents"))
      // register the catalog once per (session, tier): catalog instances
      // cache their root at first use, so the name carries the tier tag
      val cat = "graftsql_" + d.replaceAll("[^A-Za-z0-9]", "_")
      s.conf.set(s"spark.sql.catalog.$cat",
        "graft.sources.SnapshotCatalog")
      s.conf.set(s"spark.sql.catalog.$cat.root", root)
      def leg(tag: String, from: String, where: String = "") = s.sql(
        s"""SELECT '$tag' AS leg, event_type,
           |  CAST(COUNT(*) AS BIGINT) AS n,
           |  CAST(SUM(cents) AS BIGINT) AS sum_cents
           |FROM $from $where GROUP BY event_type""".stripMargin)
      leg("current", s"$cat.events_sql")
        .unionByName(leg("pruned", s"$cat.events_sql",
          "WHERE cents BETWEEN 2500 AND 7500"))
        .unionByName(leg("v1", s"$cat.events_sql VERSION AS OF 'base'"))
        .orderBy(col("leg"), col("event_type"))
    },

    // --- merge-on-read deletes ([[Snapshots.deleteRowsMoR]]) --------------
    // The Iceberg-v2 equality-delete shape: deleting every event_id%10=7
    // key commits ONE key-set file (SnapshotsMorSpec pins the structural
    // O(tombstone) claim: zero data files rewritten), reads anti-join it
    // away seq-scoped — so the event_id%100=7 keys RE-INSERTED after the
    // delete (cents+1) are visible, because their file's seq exceeds the
    // delete's — and compactDeletes folds the tombstones into a
    // copy-on-write rewrite without changing a single answer. Three
    // legs: v1 time-travels below the delete, mor reads the pinned
    // delete+reinsert view, folded re-reads after the fold (same values
    // as mor — the oracle computes the expression once and serves it to
    // both legs, so a fold that changed anything would hash-mismatch).
    Q(
      "q_snapshot_delete_mor",
      """WITH e AS (SELECT event_id, event_type,
        |    CAST(CAST(value AS DECIMAL(18,2)) * 100 AS BIGINT) AS cents
        |  FROM events WHERE event_type IS NOT NULL),
        |mor AS (
        |  SELECT event_type, cents FROM e
        |  WHERE NOT (event_type = 'purchase' AND event_id % 10 = 7)
        |  UNION ALL
        |  SELECT event_type, cents + 1 AS cents
        |  FROM e WHERE event_type = 'purchase' AND event_id % 100 = 7)
        |SELECT leg, event_type, n, sum_cents FROM (
        |  SELECT 'folded' AS leg, event_type,
        |    CAST(COUNT(*) AS BIGINT) AS n,
        |    CAST(SUM(cents) AS BIGINT) AS sum_cents
        |  FROM mor GROUP BY event_type
        |  UNION ALL
        |  SELECT 'mor', event_type, CAST(COUNT(*) AS BIGINT),
        |    CAST(SUM(cents) AS BIGINT)
        |  FROM mor GROUP BY event_type
        |  UNION ALL
        |  SELECT 'v1', event_type, CAST(COUNT(*) AS BIGINT),
        |    CAST(SUM(cents) AS BIGINT)
        |  FROM e GROUP BY event_type)
        |ORDER BY leg, event_type""".stripMargin
    ) { (s, d) =>
      val table = scratch(d) + "_mor"
      val p = new Path(table)
      p.getFileSystem(s.sparkContext.hadoopConfiguration).delete(p, true)
      val ev = Tables.events(s, d)
        .where(col("event_type").isNotNull)
        .select(col("event_id"), col("event_type"),
          (col("value").cast("decimal(18,2)") * 100).cast("long")
            .as("cents"))
      val v1 = Snapshots.commitFull(ev, table, "event_type",
        statsCols = Seq("cents"))
      // metadata-only delete of PURCHASE keys: one key file, no
      // partition rewritten — and the later fold rewrites exactly the
      // one partition holding suppressed rows (the targeted-delete
      // economics this entry prices; a first cut deleted keys across
      // every event type and the fold rewrote the whole table)
      Snapshots.deleteRowsMoR(s, table, "event_id",
        ev.where(col("event_type") === "purchase" &&
          pmod(col("event_id"), lit(10)) === 7).select("event_id"))
      // re-insert a subset AFTER the delete: newer seq → visible
      val vMor = Snapshots.commitAppend(
        ev.where(col("event_type") === "purchase" &&
            pmod(col("event_id"), lit(100)) === 7)
          .withColumn("cents", col("cents") + 1),
        table, "event_type", statsCols = Seq("cents"))
      def agg(df: org.apache.spark.sql.DataFrame, leg: String) =
        df.groupBy(col("event_type"))
          .agg(count(lit(1)).as("n"),
            sum(col("cents")).cast("long").as("sum_cents"))
          .select(lit(leg).as("leg"), col("event_type"), col("n"),
            col("sum_cents"))
      val morLeg = agg(Snapshots.readAsOf(s, table, vMor), "mor")
      Snapshots.compactDeletes(s, table, "event_type",
        statsCols = Seq("cents"))
      agg(Snapshots.readAsOf(s, table, v1), "v1")
        .unionByName(morLeg)
        .unionByName(agg(Snapshots.read(s, table), "folded"))
        .orderBy(col("leg"), col("event_type"))
    },

    // --- the SQL-ONLY DML lifecycle --------------------------------------
    // Everything a SQL client needs to run the store without touching
    // the Scala API, in one query: `CREATE TABLE … PARTITIONED BY …
    // AS SELECT` (staged descriptor, first insert = commitFull v1),
    // `DELETE FROM … WHERE event_id IN (…)` (one tombstone commit via
    // the SupportsDelete bridge — zero data rewrites, the key list is
    // the literal IN shape a SQL client sends, bounded at n/997 keys),
    // `INSERT INTO` re-inserting a subset AFTER the delete (the
    // re-inserted rows' file seq exceeds the tombstone's, so they
    // must serve), then two pure-SQL reads: `mor` — the CURRENT
    // version WITH active delete files, served through the catalog's
    // V1 bridge (the scan a plain DSv2 file scan can't express) — and
    // `v1` — `VERSION AS OF 1`, pre-delete, still on the vectorized
    // parquet path. The oracle recomputes both legs flat from the raw
    // parquet: a hash match proves SQL DELETE applied exactly the
    // declared key set, seq scoping held through SQL INSERT, and the
    // MoR bridge returns precisely the library's row set.
    Q(
      "q_snapshot_sql_dml",
      """WITH e AS (SELECT event_id, event_type,
        |    CAST(CAST(value AS DECIMAL(18,2)) * 100 AS BIGINT) AS cents
        |  FROM events WHERE event_type IS NOT NULL),
        |mor AS (
        |  SELECT event_type, cents FROM e WHERE event_id % 997 <> 7
        |  UNION ALL
        |  SELECT event_type, cents + 1 AS cents
        |  FROM e WHERE event_id % 9970 = 7)
        |SELECT leg, event_type, n, sum_cents FROM (
        |  SELECT 'mor' AS leg, event_type,
        |    CAST(COUNT(*) AS BIGINT) AS n,
        |    CAST(SUM(cents) AS BIGINT) AS sum_cents
        |  FROM mor GROUP BY event_type
        |  UNION ALL
        |  SELECT 'v1', event_type, CAST(COUNT(*) AS BIGINT),
        |    CAST(SUM(cents) AS BIGINT)
        |  FROM e GROUP BY event_type)
        |ORDER BY leg, event_type""".stripMargin
    ) { (s, d) =>
      import s.implicits._
      val root = scratch(d) + "_sqldml"
      val p = new Path(root)
      p.getFileSystem(s.sparkContext.hadoopConfiguration).delete(p, true)
      val tag = d.replaceAll("[^A-Za-z0-9]", "_")
      val ev = Tables.events(s, d)
        .where(col("event_type").isNotNull)
        .select(col("event_id"), col("event_type"),
          (col("value").cast("decimal(18,2)") * 100).cast("long")
            .as("cents"))
      ev.createOrReplaceTempView(s"ev_dml_$tag")
      val cat = "graftdml_" + tag
      s.conf.set(s"spark.sql.catalog.$cat",
        "graft.sources.SnapshotCatalog")
      s.conf.set(s"spark.sql.catalog.$cat.root", root)
      s.sql(s"CREATE TABLE $cat.events_dml PARTITIONED BY (event_type) " +
        s"AS SELECT event_id, event_type, cents FROM ev_dml_$tag")
      // the key list a SQL client would send: literal IN values —
      // bounded by construction (one key per 997 events)
      val keys = ev.where(pmod(col("event_id"), lit(997)) === 7)
        .select("event_id").as[Long].collect().sorted
      s.sql(s"DELETE FROM $cat.events_dml " +
        s"WHERE event_id IN (${keys.mkString(",")})")
      s.sql(s"INSERT INTO $cat.events_dml " +
        s"SELECT event_id, event_type, cents + 1 AS cents " +
        s"FROM ev_dml_$tag WHERE event_id % 9970 = 7")
      def leg(tag: String, from: String) = s.sql(
        s"""SELECT '$tag' AS leg, event_type,
           |  CAST(COUNT(*) AS BIGINT) AS n,
           |  CAST(SUM(cents) AS BIGINT) AS sum_cents
           |FROM $from GROUP BY event_type""".stripMargin)
      leg("mor", s"$cat.events_dml")
        .unionByName(leg("v1", s"$cat.events_dml VERSION AS OF 1"))
        .orderBy(col("leg"), col("event_type"))
    }
  )

  /** Build the two-era table (shared with PartitionEvolutionSpec) and
    * serve the type-filtered aggregate from the stats-pruned read. */
  def partitionEvolutionServe(s: org.apache.spark.sql.SparkSession,
      d: String): org.apache.spark.sql.DataFrame = {
    val table = scratch(d) + "_evolve"
    val p = new Path(table)
    p.getFileSystem(s.sparkContext.hadoopConfiguration).delete(p, true)
    val ev = Tables.events(s, d)
      .where(col("event_type").isNotNull)
      .select(col("event_id"), col("user_id"), col("event_type"),
        to_date(col("ts")).as("event_date"))
    // era 1: the original date-partitioned layout
    Snapshots.commitFull(
      ev.where(pmod(col("event_id"), lit(2)) === 0)
        .withColumn("pd", col("event_date").cast("string")),
      table, "pd", statsCols = Seq("event_type"))
    // era 2: the evolved type-partitioned layout — appended, no rewrite
    Snapshots.commitAppend(
      ev.where(pmod(col("event_id"), lit(2)) =!= 0)
        .withColumn("pt", col("event_type")),
      table, "pt", statsCols = Seq("event_type"))
    Snapshots.readRange(s, table, "event_type", "purchase", "purchase")
      .groupBy(col("event_date"))
      .agg(count(lit(1)).as("n"),
        count_distinct(col("user_id")).as("n_users"))
      .orderBy(col("event_date"))
  }
}
