package graft.sources

import java.util
import java.util.concurrent.ConcurrentHashMap
import java.util.concurrent.atomic.AtomicLong

import scala.jdk.CollectionConverters._

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.connector.catalog.{SupportsWrite, Table, TableCapability, TableProvider}
import org.apache.spark.sql.connector.expressions.Transform
import org.apache.spark.sql.connector.write.{BatchWrite, DataWriter, DataWriterFactory, LogicalWriteInfo, PhysicalWriteInfo, SupportsTruncate, Write, WriteBuilder, WriterCommitMessage}
import org.apache.spark.sql.sources.DataSourceRegister
import org.apache.spark.sql.types.StructType
import org.apache.spark.sql.util.CaseInsensitiveStringMap

/** Custom DataSource V2 WRITE path: a validating counting sink exercising
  * the full two-phase commit protocol — per-task [[DataWriter]]s emit
  * [[WriterCommitMessage]]s (row/byte tallies), the driver commits only
  * when EVERY task reported, and aborted writes leave no trace. The write
  * side of the extension ladder next to the read-side GeneratedSource.
  *
  * `spark.write.format("graft-count").option("run", tag)` — committed
  * tallies land in [[CountingSink.committed]] keyed by tag (JVM-local by
  * design: the sink demonstrates the COMMIT PROTOCOL, not storage; a real
  * sink would move task outputs from a staging location in commit()).
  * At 100 TB the same interfaces are the exactly-once contract: task
  * retries produce duplicate WriterCommitMessages only for ABORTED
  * attempts, which never reach commit().
  */
class CountingSinkProvider extends TableProvider with DataSourceRegister {
  override def shortName(): String = "graft-count"
  override def inferSchema(options: CaseInsensitiveStringMap): StructType =
    new StructType() // write-only: schema comes from the query
  override def getTable(schema: StructType, partitioning: Array[Transform],
      properties: util.Map[String, String]): Table =
    new CountingTable(schema, properties.getOrDefault("run", "default"))
  override def supportsExternalMetadata(): Boolean = true
}

object CountingSink {
  /** Committed tallies per run tag: (rows, tasks). */
  val committed: ConcurrentHashMap[String, (Long, Int)] = new ConcurrentHashMap()
}

private[sources] class CountingTable(schema0: StructType, run: String)
    extends Table with SupportsWrite {
  override def name(): String = s"graft_count($run)"
  override def schema(): StructType = schema0
  override def capabilities(): util.Set[TableCapability] =
    Set(TableCapability.BATCH_WRITE, TableCapability.TRUNCATE).asJava
  override def newWriteBuilder(info: LogicalWriteInfo): WriteBuilder =
    // SupportsTruncate backs the advertised TRUNCATE capability (ADVICE r7:
    // without it, mode("overwrite") passed the capability check and then
    // died in the planner). Truncation is DEFERRED to commit: the tally
    // put in CountingBatchWrite.commit is the atomic truncate-and-write,
    // so an aborted overwrite leaves the prior tally visible — an eager
    // remove here would destroy it at write-PLANNING time and break the
    // sink's "aborted writes leave no trace" contract (review r8).
    new WriteBuilder with SupportsTruncate {
      private var overwrite = false
      override def truncate(): WriteBuilder = { overwrite = true; this }
      override def build(): Write = new Write {
        override def toBatch: BatchWrite = new CountingBatchWrite(run, overwrite)
      }
    }
}

private[sources] case class CountMessage(rows: Long) extends WriterCommitMessage

private[sources] class CountingBatchWrite(run: String, overwrite: Boolean)
    extends BatchWrite {
  override def createBatchWriterFactory(info: PhysicalWriteInfo): DataWriterFactory =
    new DataWriterFactory {
      override def createWriter(partitionId: Int, taskId: Long): DataWriter[InternalRow] =
        new DataWriter[InternalRow] {
          private val rows = new AtomicLong()
          override def write(record: InternalRow): Unit = rows.incrementAndGet()
          override def commit(): WriterCommitMessage = CountMessage(rows.get())
          override def abort(): Unit = () // nothing staged, nothing to clean
          override def close(): Unit = ()
        }
    }

  override def commit(messages: Array[WriterCommitMessage]): Unit = {
    val total = messages.map(_.asInstanceOf[CountMessage].rows).sum
    // append ACCUMULATES into the prior tally; only a truncate()d write
    // (mode overwrite) replaces it — an unconditional put made append
    // silently behave like overwrite, losing the first write's tally
    // (review r9). merge() keeps the replace-or-add atomic per tag.
    if (overwrite) CountingSink.committed.put(run, (total, messages.length))
    else CountingSink.committed.merge(run, (total, messages.length),
      (a, b) => (a._1 + b._1, a._2 + b._2))
  }

  override def abort(messages: Array[WriterCommitMessage]): Unit = ()
}
