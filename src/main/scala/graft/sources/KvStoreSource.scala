package graft.sources

import java.util
import java.util.concurrent.ConcurrentHashMap

import scala.jdk.CollectionConverters._

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.connector.catalog.{SupportsRead, SupportsWrite, Table, TableCapability, TableProvider}
import org.apache.spark.sql.connector.expressions.Transform
import org.apache.spark.sql.connector.read.{Batch, InputPartition, PartitionReader, PartitionReaderFactory, Scan, ScanBuilder}
import org.apache.spark.sql.connector.write.{BatchWrite, DataWriter, DataWriterFactory, LogicalWriteInfo, PhysicalWriteInfo, SupportsTruncate, Write, WriteBuilder, WriterCommitMessage}
import org.apache.spark.sql.types._
import org.apache.spark.sql.util.CaseInsensitiveStringMap
import org.apache.spark.unsafe.types.UTF8String

/** Writable DataSource V2 — the SINK half of the connector surface
  * (SURVEY §2.1; `SeqSource` is the read half with its three pushdown
  * hooks). A connector to an external system a reference user would
  * WRITE (a key-value service, a feed, an index) looks exactly like
  * this; the "external system" here is a JVM-global in-memory store so
  * the protocol is testable offline.
  *
  * What it demonstrates is the DSv2 TWO-PHASE COMMIT protocol — the
  * exactly-once publication contract every production sink needs:
  *
  *  1. each task gets its own `DataWriter`, which BUFFERS its rows and
  *     publishes nothing while writing (a failed/retried/speculated
  *     task therefore leaves no trace);
  *  2. a task that finishes hands its buffered batch back as its
  *     `WriterCommitMessage` — the data rides the commit message here,
  *     which is exactly how staging works when the target supports no
  *     cross-task transaction (file sinks stage temp files instead and
  *     send paths);
  *  3. only the driver-side `BatchWrite.commit`, called once after ALL
  *     tasks succeeded, installs the union into the store — atomically
  *     replacing the previous table version (truncate-then-publish is
  *     a single reference swap), so readers never observe a partial
  *     write; `abort` discards everything.
  *
  * `df.write.format("graft.sources.KvStoreSource").option("table", t)
  *   .mode("append"|"overwrite").save()` — append unions with the
  * current version at commit time, overwrite (TRUNCATE capability)
  * replaces it. Read back with the same format + table option; the
  * scan serves the committed version split into range partitions.
  * Schema is fixed (k BIGINT, v STRING) — the protocol, not schema
  * plumbing, is the capability under test (SourceSuite: roundtrip,
  * append vs truncate, atomic abort on task failure, commit-message
  * row accounting).
  */
class KvStoreSource extends TableProvider {
  override def inferSchema(options: CaseInsensitiveStringMap): StructType =
    KvStoreSource.schema

  override def getTable(schema: StructType, partitioning: Array[Transform],
      properties: util.Map[String, String]): Table = {
    val opts = new CaseInsensitiveStringMap(properties)
    new KvTable(opts.getOrDefault("table", "default"))
  }
}

object KvStoreSource {
  val schema: StructType = StructType(Seq(
    StructField("k", LongType, nullable = false),
    StructField("v", StringType, nullable = false)))

  /** The stand-in external system: table name → committed version (an
    * immutable snapshot array). Publication is a single map.put — the
    * atomic "reference swap" a real KV/object store gives you.
    */
  private val store = new ConcurrentHashMap[String, Array[(Long, String)]]()

  def committed(table: String): Seq[(Long, String)] =
    store.getOrDefault(table, Array.empty).toSeq
  def drop(table: String): Unit = store.remove(table)
  private[sources] def publish(table: String, rows: Array[(Long, String)]): Unit =
    store.put(table, rows)

  /** Atomic append: union with the CURRENT version inside the map's own
    * merge, so two concurrent append jobs committing to one table both
    * land (a read-then-publish pair could lose one — round-9 advice).
    * The result re-sorts, so the committed version stays deterministic
    * regardless of which committer wins the race.
    */
  private[sources] def appendTo(table: String, rows: Array[(Long, String)]): Unit =
    store.merge(table, rows.sortBy(identity),
      (old, inc) => (old ++ inc).sortBy(identity))
}

private class KvTable(tableName: String)
    extends Table with SupportsRead with SupportsWrite {
  override def name(): String = s"graft_kv($tableName)"
  override def schema(): StructType = KvStoreSource.schema
  override def capabilities(): util.Set[TableCapability] =
    Set(TableCapability.BATCH_READ, TableCapability.BATCH_WRITE,
      TableCapability.TRUNCATE).asJava

  override def newScanBuilder(options: CaseInsensitiveStringMap): ScanBuilder =
    new ScanBuilder {
      override def build(): Scan = new KvScan(tableName)
    }

  override def newWriteBuilder(info: LogicalWriteInfo): WriteBuilder = {
    // validate names AND types at PLANNING time: a wrong dtype (e.g. an
    // IntegerType k) would otherwise surface as a ClassCastException
    // inside executor tasks from row.getLong(0) (round-9 advice)
    require(info.schema().fieldNames.sameElements(Array("k", "v")),
      s"KvStoreSource expects (k, v), got ${info.schema().fieldNames.mkString(",")}")
    require(info.schema().fields.map(_.dataType).sameElements(
        Array[DataType](LongType, StringType)),
      s"KvStoreSource expects (BIGINT, STRING), got " +
        info.schema().fields.map(_.dataType.simpleString).mkString(","))
    new KvWriteBuilder(tableName, truncate = false)
  }
}

private class KvWriteBuilder(tableName: String, truncate: Boolean)
    extends WriteBuilder with SupportsTruncate {
  override def truncate(): WriteBuilder = new KvWriteBuilder(tableName, truncate = true)
  override def build(): Write = new Write {
    override def toBatch: BatchWrite = new KvBatchWrite(tableName, truncate)
  }
}

/** A finished task's buffered batch, riding back to the driver as the
  * commit message. Must be serializable — it crosses the executor →
  * driver boundary.
  */
private case class KvTaskBatch(rows: Array[(Long, String)])
  extends WriterCommitMessage

private class KvBatchWrite(tableName: String, truncate: Boolean)
    extends BatchWrite {
  override def createBatchWriterFactory(info: PhysicalWriteInfo): DataWriterFactory =
    new KvWriterFactory

  /** Driver-side, runs ONCE after every task succeeded: the only point
    * where the external system changes. Task order inside the publish
    * is normalized by (k, v) sort so the committed version is
    * deterministic regardless of task scheduling. Overwrite is a single
    * reference swap; append goes through the store's atomic merge so
    * concurrent committers can't lose each other's rows.
    */
  override def commit(messages: Array[WriterCommitMessage]): Unit = {
    val incoming = messages.flatMap(_.asInstanceOf[KvTaskBatch].rows)
    if (truncate) KvStoreSource.publish(tableName, incoming.sortBy(identity))
    else KvStoreSource.appendTo(tableName, incoming)
  }

  override def abort(messages: Array[WriterCommitMessage]): Unit = ()
  // nothing to clean: uncommitted rows only ever lived in task buffers
}

private class KvWriterFactory extends DataWriterFactory {
  override def createWriter(partitionId: Int, taskId: Long): DataWriter[InternalRow] =
    new DataWriter[InternalRow] {
      private val buf = scala.collection.mutable.ArrayBuffer.empty[(Long, String)]
      override def write(row: InternalRow): Unit =
        buf += ((row.getLong(0), row.getString(1)))
      override def commit(): WriterCommitMessage = KvTaskBatch(buf.toArray)
      override def abort(): Unit = buf.clear()
      override def close(): Unit = ()
    }
}

private class KvScan(tableName: String) extends Scan with Batch {
  override def readSchema(): StructType = KvStoreSource.schema
  override def toBatch: Batch = this
  override def description(): String = s"graft_kv($tableName) committed version"

  override def planInputPartitions(): Array[InputPartition] = {
    // snapshot ONCE at planning: readers of this scan all see the same
    // committed version even if a concurrent write publishes mid-query
    val snap = KvStoreSource.committed(tableName).toArray
    if (snap.isEmpty) return Array.empty
    val parts = math.min(4, snap.length)
    val span = (snap.length + parts - 1) / parts
    snap.grouped(span).map(g => KvPartition(g): InputPartition).toArray
  }

  override def createReaderFactory(): PartitionReaderFactory =
    new KvReaderFactory
}

private case class KvPartition(rows: Array[(Long, String)]) extends InputPartition

private class KvReaderFactory extends PartitionReaderFactory {
  override def createReader(p: InputPartition): PartitionReader[InternalRow] = {
    val rows = p.asInstanceOf[KvPartition].rows
    new PartitionReader[InternalRow] {
      private var i = -1
      override def next(): Boolean = { i += 1; i < rows.length }
      override def get(): InternalRow =
        new org.apache.spark.sql.catalyst.expressions.GenericInternalRow(
          Array[Any](rows(i)._1, UTF8String.fromString(rows(i)._2)))
      override def close(): Unit = ()
    }
  }
}
