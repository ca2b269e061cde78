package graft.sources

import java.util

import scala.jdk.CollectionConverters._

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.GenericInternalRow
import org.apache.spark.sql.connector.catalog.{SupportsRead, Table, TableCapability, TableProvider}
import org.apache.spark.sql.connector.expressions.Transform
import org.apache.spark.sql.connector.read.{Batch, InputPartition, PartitionReader, PartitionReaderFactory, Scan, ScanBuilder, SupportsPushDownFilters, SupportsPushDownRequiredColumns}
import org.apache.spark.sql.sources.{EqualTo, Filter, GreaterThan, GreaterThanOrEqual, LessThan, LessThanOrEqual}
import org.apache.spark.sql.types.{DoubleType, IntegerType, LongType, StringType, StructType}
import org.apache.spark.sql.util.CaseInsensitiveStringMap
import org.apache.spark.unsafe.types.UTF8String

/** Custom DataSource V2: a deterministic generated table with REAL filter
  * pushdown and column pruning — the source-side rung of the extension
  * ladder (next to the codegen Expressions, the optimizer Rule, and the
  * custom physical operator). `spark.read.format("graft-gen")
  * .option("rows", n).option("parts", p)`.
  *
  * Schema: (id BIGINT, val DOUBLE, bucket INT, label STRING), all pure
  * functions of `id` (val = (id·2654435761) mod 1000003 as a double — the
  * products stay < 2^53, so any engine can replay the generator exactly;
  * the correctness oracle recomputes it from DuckDB's range()).
  *
  * Pushdown semantics: range predicates on `id` (>, >=, <, <=, =) tighten
  * the generated interval BEFORE partition planning, so filtered scans
  * plan fewer/narrower input partitions — partition pruning at the source,
  * observable in the scan description (`GeneratedScan[lo,hi)…`). Pushed
  * filters are FULLY handled (pushFilters returns only the residual), and
  * `pruneColumns` narrows the produced rows to the projected fields.
  * At 100 TB the same interfaces are how a real table format (Iceberg,
  * Delta) skips files: the engine hands the source its predicates and
  * projection, the source answers with a smaller plan.
  */
class GeneratedTableProvider extends TableProvider
    with org.apache.spark.sql.sources.DataSourceRegister {
  override def shortName(): String = "graft-gen"
  override def inferSchema(options: CaseInsensitiveStringMap): StructType =
    GeneratedSource.schema
  override def getTable(schema: StructType, partitioning: Array[Transform],
      properties: util.Map[String, String]): Table =
    new GeneratedTable(
      properties.getOrDefault("rows", "1000").toLong,
      properties.getOrDefault("parts", "8").toInt,
      properties.getOrDefault("batchRows", "0").toLong)
  override def supportsExternalMetadata(): Boolean = false
}

object GeneratedSource {
  val schema: StructType = new StructType()
    .add("id", LongType).add("val", DoubleType)
    .add("bucket", IntegerType).add("label", StringType)

  /** The row generator both engines replay: every column from `id`. */
  def valOf(id: Long): Double = ((id * 2654435761L) % 1000003L).toDouble
  def bucketOf(id: Long): Int = (id % 16L).toInt
  def labelOf(id: Long): String = "r" + id
}

private[sources] class GeneratedTable(rows: Long, parts: Int, batchRows: Long)
    extends Table with SupportsRead {
  override def name(): String = s"graft_gen($rows)"
  override def schema(): StructType = GeneratedSource.schema
  override def capabilities(): util.Set[TableCapability] =
    Set(TableCapability.BATCH_READ, TableCapability.MICRO_BATCH_READ).asJava
  override def newScanBuilder(options: CaseInsensitiveStringMap): ScanBuilder =
    new GeneratedScanBuilder(rows, parts, batchRows)
}

private[sources] class GeneratedScanBuilder(rows: Long, parts: Int, batchRows: Long)
    extends ScanBuilder with SupportsPushDownFilters with SupportsPushDownRequiredColumns {
  private var lo = 0L
  private var hi = rows // exclusive
  private var pushed: Array[Filter] = Array.empty
  private var required: StructType = GeneratedSource.schema

  override def pushFilters(filters: Array[Filter]): Array[Filter] = {
    val (supported, residual) = filters.partition {
      case GreaterThan("id", _: Long) | GreaterThanOrEqual("id", _: Long) |
           LessThan("id", _: Long) | LessThanOrEqual("id", _: Long) |
           EqualTo("id", _: Long) => true
      case _ => false
    }
    // saturating +1: v = Long.MaxValue (e.g. an always-true id <= MAX) would
    // wrap negative, silently emptying the scan — and since the filter is
    // reported fully pushed, Spark would never re-check it (ADVICE r7)
    def incSat(v: Long): Long = if (v == Long.MaxValue) v else v + 1
    supported.foreach {
      case GreaterThan("id", v: Long) => lo = math.max(lo, incSat(v))
      case GreaterThanOrEqual("id", v: Long) => lo = math.max(lo, v)
      case LessThan("id", v: Long) => hi = math.min(hi, v)
      case LessThanOrEqual("id", v: Long) => hi = math.min(hi, incSat(v))
      case EqualTo("id", v: Long) => lo = math.max(lo, v); hi = math.min(hi, incSat(v))
      case _ => ()
    }
    pushed = supported
    residual // only these get re-evaluated by Spark
  }
  override def pushedFilters(): Array[Filter] = pushed

  override def pruneColumns(requiredSchema: StructType): Unit =
    required = requiredSchema

  override def build(): Scan = new GeneratedScan(lo, hi, rows, parts, batchRows, required)
}

private[sources] case class GeneratedRange(start: Long, end: Long) extends InputPartition

private[sources] class GeneratedScan(lo: Long, hi: Long, rows: Long, parts: Int,
    batchRows: Long, required: StructType) extends Scan with Batch {
  override def readSchema(): StructType = required
  override def toBatch: Batch = this
  override def description(): String =
    s"GeneratedScan[$lo,$hi) cols=${required.fieldNames.mkString(",")}"

  /** Partitions live on a FIXED grid over the full [0, rows) table (the
    * "files" of this source); the pushed range prunes non-overlapping
    * cells entirely and clips the boundary ones — the same model as
    * file/row-group skipping in a real table format. A naive
    * re-split-the-narrow-interval version hid the pruning (always `parts`
    * partitions); the spec asserts the count shrinks.
    */
  override def planInputPartitions(): Array[InputPartition] = {
    if (hi <= lo) return Array.empty
    val per = math.max(1L, (rows + parts - 1) / parts)
    (0L until rows by per)
      .map(s => GeneratedRange(math.max(s, lo), math.min(s + per, hi)))
      .filter(r => r.end > r.start)
      .toArray
  }

  override def createReaderFactory(): PartitionReaderFactory = {
    val fields = required.fieldNames
    new GeneratedReaderFactory(fields)
  }

  override def toMicroBatchStream(checkpointLocation: String)
      : org.apache.spark.sql.connector.read.streaming.MicroBatchStream =
    new GeneratedMicroBatchStream(lo, hi, rows, parts,
      if (batchRows > 0) batchRows else math.max(1L, rows / 4), required)
}

private[sources] case class GenOffset(v: Long)
    extends org.apache.spark.sql.connector.read.streaming.Offset {
  override def json(): String = v.toString
}

/** Micro-batch twin of the batch scan: offsets are plain row positions in
  * [lo, hi); each `latestOffset` call admits at most `batchRows` more rows
  * (rate limiting), and `planInputPartitions(start, end)` re-uses the same
  * fixed-grid pruning as the batch side. The generator is stateless, so
  * recovery from any checkpointed offset is trivially exactly-once — the
  * property a replayable source (Kafka, file listing) provides and a
  * socket-style source cannot.
  */
private[sources] class GeneratedMicroBatchStream(lo: Long, hi: Long, rows: Long,
    parts: Int, batchRows: Long, required: StructType)
    extends org.apache.spark.sql.connector.read.streaming.MicroBatchStream
    with org.apache.spark.sql.connector.read.streaming.SupportsTriggerAvailableNow {
  import org.apache.spark.sql.connector.read.streaming.{Offset, ReadLimit, ReadMaxRows}

  // Admission control, not an in-memory cursor (review r9): the engine
  // hands the last planned offset into latestOffset(start, limit), so rate
  // limiting is a PURE FUNCTION of checkpointed state — a restarted stream
  // instance cannot regress behind the committed offset and re-emit rows
  // (the stateful cursor variant did exactly that). SupportsTrigger-
  // AvailableNow also lets AvailableNow drain the bounded range in
  // batchRows steps instead of falling back to one giant batch.
  override def initialOffset(): Offset = GenOffset(lo)
  override def getDefaultReadLimit: ReadLimit = ReadLimit.maxRows(batchRows)
  override def latestOffset(start: Offset, limit: ReadLimit): Offset = {
    val s = start.asInstanceOf[GenOffset].v
    val step = limit match {
      case r: ReadMaxRows => r.maxRows()
      case _ => batchRows
    }
    GenOffset(math.min(hi, s + step))
  }
  override def reportLatestOffset(): Offset = GenOffset(hi)
  override def prepareForTriggerAvailableNow(): Unit = () // bounded: hi is final
  override def latestOffset(): Offset =
    throw new UnsupportedOperationException(
      "admission-control latestOffset(start, limit) is the entry point")
  override def deserializeOffset(json: String): Offset = GenOffset(json.toLong)
  override def commit(end: Offset): Unit = ()
  override def stop(): Unit = ()

  override def planInputPartitions(start: Offset, end: Offset): Array[InputPartition] = {
    val (s, e) = (start.asInstanceOf[GenOffset].v, end.asInstanceOf[GenOffset].v)
    if (e <= s) return Array.empty
    val per = math.max(1L, (rows + parts - 1) / parts)
    (0L until rows by per)
      .map(g => GeneratedRange(math.max(g, s), math.min(g + per, e)))
      .filter(r => r.end > r.start)
      .toArray
  }

  override def createReaderFactory(): PartitionReaderFactory =
    new GeneratedReaderFactory(required.fieldNames)
}

private[sources] class GeneratedReaderFactory(fields: Array[String])
    extends PartitionReaderFactory {
  override def createReader(partition: InputPartition): PartitionReader[InternalRow] = {
    val range = partition.asInstanceOf[GeneratedRange]
    new PartitionReader[InternalRow] {
      private var cur = range.start - 1
      override def next(): Boolean = { cur += 1; cur < range.end }
      override def get(): InternalRow = {
        val values: Array[Any] = fields.map {
          case "id" => cur
          case "val" => GeneratedSource.valOf(cur)
          case "bucket" => GeneratedSource.bucketOf(cur)
          case "label" => UTF8String.fromString(GeneratedSource.labelOf(cur))
        }
        new GenericInternalRow(values)
      }
      override def close(): Unit = ()
    }
  }
}
