package graft.sources

import java.util

import scala.jdk.CollectionConverters._

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.GenericInternalRow
import org.apache.spark.sql.connector.catalog.{SupportsRead, Table, TableCapability, TableProvider}
import org.apache.spark.sql.connector.expressions.Transform
import org.apache.spark.sql.connector.read.{Batch, InputPartition, PartitionReader, PartitionReaderFactory, Scan, ScanBuilder, SupportsPushDownFilters, SupportsPushDownRequiredColumns}
import org.apache.spark.sql.connector.read.streaming.{MicroBatchStream, Offset}
import org.apache.spark.sql.sources.{EqualTo, Filter, GreaterThan, GreaterThanOrEqual, IsNotNull, LessThan, LessThanOrEqual}
import org.apache.spark.sql.types._
import org.apache.spark.sql.util.CaseInsensitiveStringMap
import org.apache.spark.unsafe.types.UTF8String

/** DataSource V2 batch source: a deterministic event generator with
  * REAL pushdown — the connector surface of the engine (every other
  * input rides Spark's built-in parquet/json readers).
  *
  * `spark.read.format("graft-synth").option("numRows", n)
  * .option("numPartitions", p).load()` produces rows
  * `(id, user_id, event_type, value)` as pure integer arithmetic on the
  * row index, so tests and oracles can re-derive the stream exactly
  * (DuckDB replays it from `range()` — the source feeds a hash-exact
  * inventory query like any parquet table).
  *
  * What it demonstrates, in connector terms:
  *  - partition planning: the [0, numRows) index range splits into
  *    `numPartitions` contiguous chunks, each generated independently on
  *    its executor — the distributed-scan contract;
  *  - filter pushdown (`SupportsPushDownFilters`): range/equality
  *    predicates on `id` narrow the generated interval BEFORE planning,
  *    so partitions shrink or vanish instead of generating-then-
  *    filtering (the DSv2 analogue of parquet row-group pruning);
  *  - column pruning (`SupportsPushDownRequiredColumns`): the reader
  *    materializes only requested fields — a projection never pays for
  *    the string column it dropped.
  *
  * The same four interfaces are exactly what a real warehouse connector
  * (JDBC shard reader, message-log snapshot, metrics API) implements;
  * generation stands in for IO so the contract itself is what's tested.
  */
class SyntheticSource extends TableProvider
    with org.apache.spark.sql.sources.DataSourceRegister {

  override def shortName(): String = "graft-synth"

  override def inferSchema(options: CaseInsensitiveStringMap): StructType =
    SyntheticSource.schema

  override def getTable(schema: StructType, partitioning: Array[Transform],
      properties: util.Map[String, String]): Table =
    new SynthTable(new CaseInsensitiveStringMap(properties))
}

object SyntheticSource {
  val schema: StructType = StructType(Seq(
    StructField("id", LongType, nullable = false),
    StructField("user_id", LongType, nullable = false),
    StructField("event_type", StringType, nullable = false),
    StructField("value", DoubleType, nullable = false)))

  val EventTypes: Array[String] =
    Array("view", "click", "purchase", "signup", "error")

  /** Row arithmetic shared with oracles: keep every operand < 2^53 so
    * BIGINT replay is exact in any engine. */
  def userId(i: Long): Long = (i * 48271L) % 9973L
  def eventType(i: Long): String = EventTypes((i % 5).toInt)
  def valueCents(i: Long): Long = (i * 2654435761L) % 1000000L

  /** The generator arithmetic as DuckDB SQL over a row-index column —
    * one source of truth for query oracles. */
  def rowSql(i: String): String =
    s"""$i AS id, ($i * 48271) % 9973 AS user_id,
       |  ['view','click','purchase','signup','error'][($i % 5) + 1]
       |    AS event_type,
       |  CAST(($i * 2654435761) % 1000000 AS DOUBLE) / 100 AS value"""
      .stripMargin
}

private class SynthTable(options: CaseInsensitiveStringMap)
    extends Table with SupportsRead {
  override def name(): String = "graft_synth"
  override def schema(): StructType = SyntheticSource.schema
  override def capabilities(): util.Set[TableCapability] =
    util.EnumSet.of(TableCapability.BATCH_READ,
      TableCapability.MICRO_BATCH_READ)
  override def newScanBuilder(opts: CaseInsensitiveStringMap): ScanBuilder = {
    val merged = new util.HashMap[String, String](options)
    merged.putAll(opts)
    new SynthScanBuilder(new CaseInsensitiveStringMap(merged))
  }
}

private class SynthScanBuilder(options: CaseInsensitiveStringMap)
    extends ScanBuilder
    with SupportsPushDownFilters with SupportsPushDownRequiredColumns {

  private val numRows = options.getLong("numRows", 100000L)
  private val numPartitions = options.getInt("numPartitions", 8)
  private val batchRows = options.getLong("batchRows", 10000L)

  private var lo = 0L
  private var hi = numRows
  private var accepted = Array.empty[Filter]
  private var required: StructType = SyntheticSource.schema

  override def pushFilters(filters: Array[Filter]): Array[Filter] = {
    val (handled, rest) = filters.partition {
      case GreaterThanOrEqual("id", v: Long) => lo = lo.max(v); true
      case GreaterThan("id", v: Long) => lo = lo.max(v + 1); true
      case LessThan("id", v: Long) => hi = hi.min(v); true
      case LessThanOrEqual("id", v: Long) => hi = hi.min(v + 1); true
      case EqualTo("id", v: Long) => lo = lo.max(v); hi = hi.min(v + 1); true
      case IsNotNull("id") => true // no column is nullable: a no-op
      case _ => false
    }
    accepted = handled
    rest
  }

  override def pushedFilters(): Array[Filter] = accepted

  override def pruneColumns(requiredSchema: StructType): Unit =
    required = requiredSchema

  override def build(): Scan =
    new SynthScan(required, lo.min(hi), hi, numPartitions, batchRows)
}

private class SynthScan(readSchema: StructType, lo: Long, hi: Long,
    numPartitions: Int, batchRows: Long = 10000L) extends Scan with Batch {
  override def readSchema(): StructType = readSchema
  override def toBatch: Batch = this
  override def toMicroBatchStream(checkpointLocation: String)
      : MicroBatchStream =
    new SynthMicroBatchStream(readSchema, lo, hi, numPartitions, batchRows)
  override def description(): String =
    s"graft-synth [$lo, $hi) over $numPartitions partitions, " +
      s"columns ${readSchema.fieldNames.mkString(",")}"

  override def planInputPartitions(): Array[InputPartition] = {
    val total = (hi - lo).max(0L)
    val chunk = (total + numPartitions - 1) / numPartitions.max(1)
    (0 until numPartitions).map { p =>
      val s = lo + p * chunk
      val e = (s + chunk).min(hi)
      SynthPartition(s, e.max(s)): InputPartition
    }.toArray
  }

  override def createReaderFactory(): PartitionReaderFactory =
    new SynthReaderFactory(readSchema.fieldNames)
}

private case class SynthPartition(start: Long, end: Long)
    extends InputPartition

/** Offsets are plain row indexes: a micro-batch is the index interval
  * (previous offset, next offset], planned with the same chunking as
  * the batch path. Pacing lives in `latestOffset` — it advances by at
  * most `batchRows` per trigger and pins at the end of the stream;
  * clamping anywhere later would skip rows, because the engine COMMITS
  * whatever latestOffset returned. A restart from a checkpointed
  * offset regenerates identical rows (the generator is pure index
  * arithmetic; determinism is the source's exactly-once story, not
  * sink-side dedup). */
private class SynthMicroBatchStream(readSchema: StructType, lo: Long,
    hi: Long, numPartitions: Int, batchRows: Long)
    extends MicroBatchStream {

  private case class SynthOffset(i: Long) extends Offset {
    override def json(): String = i.toString
  }

  // highest offset offered to the engine so far (driver-side instance)
  private var offered = lo

  override def initialOffset(): Offset = SynthOffset(lo)

  override def latestOffset(): Offset = {
    offered = (offered + batchRows).min(hi)
    SynthOffset(offered)
  }

  override def deserializeOffset(json: String): Offset = {
    // after a restart the engine replays from the checkpoint; keep the
    // pacing cursor at least there so latestOffset never moves backward
    val o = json.toLong
    offered = offered.max(o)
    SynthOffset(o)
  }

  override def planInputPartitions(start: Offset, end: Offset)
      : Array[InputPartition] = {
    val s0 = start.asInstanceOf[SynthOffset].i
    val e0 = end.asInstanceOf[SynthOffset].i
    val total = (e0 - s0).max(0L)
    val chunk = ((total + numPartitions - 1) / numPartitions.max(1)).max(1L)
    (0 until numPartitions).map { p =>
      val s = s0 + p * chunk
      val e = (s + chunk).min(e0)
      SynthPartition(s, e.max(s)): InputPartition
    }.toArray
  }

  override def createReaderFactory(): PartitionReaderFactory =
    new SynthReaderFactory(readSchema.fieldNames)

  override def commit(end: Offset): Unit = ()
  override def stop(): Unit = ()
}

private class SynthReaderFactory(fields: Array[String])
    extends PartitionReaderFactory {
  override def createReader(p: InputPartition): PartitionReader[InternalRow] = {
    val sp = p.asInstanceOf[SynthPartition]
    new PartitionReader[InternalRow] {
      private var i = sp.start - 1
      override def next(): Boolean = { i += 1; i < sp.end }
      override def get(): InternalRow =
        new GenericInternalRow(fields.map[Any] {
          case "id" => i
          case "user_id" => SyntheticSource.userId(i)
          case "event_type" =>
            UTF8String.fromString(SyntheticSource.eventType(i))
          case "value" => SyntheticSource.valueCents(i).toDouble / 100.0
        })
      override def close(): Unit = ()
    }
  }
}
