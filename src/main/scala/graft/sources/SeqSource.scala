package graft.sources

import java.util

import scala.jdk.CollectionConverters._

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.connector.catalog.{SupportsRead, Table, TableCapability, TableProvider}
import org.apache.spark.sql.connector.expressions.{NamedReference, Transform}
import org.apache.spark.sql.connector.expressions.aggregate.{AggregateFunc, Aggregation, Count, CountStar, Max, Min}
import org.apache.spark.sql.connector.read.{Batch, InputPartition, PartitionReader, PartitionReaderFactory, Scan, ScanBuilder, SupportsPushDownAggregates, SupportsPushDownFilters, SupportsPushDownRequiredColumns}
import org.apache.spark.sql.sources.{Filter, GreaterThan, GreaterThanOrEqual, LessThan, LessThanOrEqual}
import org.apache.spark.sql.types._
import org.apache.spark.sql.util.CaseInsensitiveStringMap
import org.apache.spark.unsafe.types.UTF8String

/** Minimal read-only DataSource V2 — the custom-SOURCE extension
  * surface (SURVEY §2.1), complementing the custom expressions /
  * optimizer rule / UDAF demos elsewhere. A connector to an external
  * system a reference user would read (a feed, a key-value store, a
  * proprietary format) looks exactly like this; the "external system"
  * here is a deterministic generator so the capability is testable
  * offline.
  *
  * `spark.read.format("graft.sources.SeqSource")
  *   .option("rows", n).option("parts", p).load()`
  * yields rows `(id BIGINT, val DOUBLE, tag STRING)` with
  * `val = id · 0.5` and `tag = "t" + id % 10`, split into `parts`
  * contiguous range partitions — each an independent
  * `InputPartition`, the unit Spark schedules per executor (the
  * 100 TB contract: a source must split, or one task reads
  * everything).
  *
  * Implements BOTH pushdown hooks a scan-heavy source needs:
  *  - column pruning (`SupportsPushDownRequiredColumns`): readers
  *    materialize only requested fields — the DSv2 equivalent of
  *    parquet's ReadSchema;
  *  - filter pushdown (`SupportsPushDownFilters`) for range predicates
  *    on `id`: partition GENERATION narrows to the surviving id range,
  *    so pruned partitions are never scheduled at all (partition
  *    pruning, not per-row filtering). Non-id filters are reported
  *    back as residuals for Spark to evaluate.
  *
  * SourceSuite asserts content vs an equivalent `spark.range`
  * computation, the partition count, the pruned read schema, and that
  * a pushed `id < k` range shrinks the planned partitions.
  */
class SeqSource extends TableProvider {
  override def inferSchema(options: CaseInsensitiveStringMap): StructType =
    SeqSource.schema

  override def getTable(schema: StructType, partitioning: Array[Transform],
      properties: util.Map[String, String]): Table = {
    // properties arrive CASE-PRESERVED here (unlike inferSchema's
    // CaseInsensitiveStringMap) — rewrap, or .option("Rows", …) would
    // silently fall back to the default
    val opts = new CaseInsensitiveStringMap(properties)
    val rows = opts.getOrDefault("rows", "1000").toLong
    val parts = opts.getOrDefault("parts", "4").toInt
    require(rows >= 0, s"rows must be >= 0, got $rows")
    require(parts >= 1, s"parts must be >= 1, got $parts")
    new SeqTable(rows, parts)
  }
}

object SeqSource {
  val schema: StructType = StructType(Seq(
    StructField("id", LongType, nullable = false),
    StructField("val", DoubleType, nullable = false),
    StructField("tag", StringType, nullable = false)))
}

private class SeqTable(rows: Long, parts: Int) extends Table with SupportsRead {
  override def name(): String = s"graft_seq($rows, $parts)"
  override def schema(): StructType = SeqSource.schema
  override def capabilities(): util.Set[TableCapability] =
    Set(TableCapability.BATCH_READ).asJava
  override def newScanBuilder(options: CaseInsensitiveStringMap): ScanBuilder =
    new SeqScanBuilder(rows, parts)
}

private class SeqScanBuilder(rows: Long, parts: Int)
    extends ScanBuilder with SupportsPushDownRequiredColumns
    with SupportsPushDownFilters with SupportsPushDownAggregates {
  private var required: StructType = SeqSource.schema
  private var lo: Long = 0L          // inclusive id lower bound
  private var hi: Long = rows        // exclusive id upper bound
  private var pushed: Array[Filter] = Array.empty
  private var aggFuncs: Seq[String] = Nil  // "count" | "min" | "max", in output order

  override def pruneColumns(requiredSchema: StructType): Unit =
    required = requiredSchema

  override def pushFilters(filters: Array[Filter]): Array[Filter] = {
    // the two `v + 1` rules overflow at Long.MaxValue — and an accepted
    // filter is NOT re-checked by Spark, so overflow would be a silent
    // wrong answer; leave the boundary values as residuals instead
    val (accepted, residual) = filters.partition {
      case GreaterThan("id", v: Long) => v != Long.MaxValue
      case LessThanOrEqual("id", v: Long) => v != Long.MaxValue
      case GreaterThanOrEqual("id", _: Long) | LessThan("id", _: Long) => true
      case _ => false
    }
    accepted.foreach {
      case GreaterThan("id", v: Long) => lo = math.max(lo, v + 1)
      case GreaterThanOrEqual("id", v: Long) => lo = math.max(lo, v)
      case LessThan("id", v: Long) => hi = math.min(hi, v)
      case LessThanOrEqual("id", v: Long) => hi = math.min(hi, v + 1)
      case _ =>
    }
    pushed = accepted
    residual
  }

  override def pushedFilters(): Array[Filter] = pushed

  /** Aggregate pushdown (`SupportsPushDownAggregates`) — the most
    * powerful DSv2 hook: ungrouped COUNT(*) / COUNT(id) / MIN(id) /
    * MAX(id) are answered from the (already filter-narrowed) id range
    * IN O(1), so the "scan" emits ONE row and zero data moves — the
    * DSv2 equivalent of parquet footer statistics, and what a 100 TB
    * connector does for metadata-answerable queries. Complete pushdown
    * is declared only for the exactly-translatable shape (no grouping,
    * every aggregate on the non-null generated id), so Spark elides its
    * own Aggregate node entirely; anything else is declined and planned
    * normally.
    */
  private def isId(e: org.apache.spark.sql.connector.expressions.Expression): Boolean =
    e match {
      case r: NamedReference => r.fieldNames.sameElements(Array("id"))
      case _ => false
    }
  private def isTag(e: org.apache.spark.sql.connector.expressions.Expression): Boolean =
    e match {
      case r: NamedReference => r.fieldNames.sameElements(Array("tag"))
      case _ => false
    }

  private def translateFns(agg: Aggregation): Option[Seq[String]] = {
    val fns = agg.aggregateExpressions.toSeq.map {
      case _: CountStar => Some("count")
      case c: Count if !c.isDistinct && isId(c.column) => Some("count")
      case m: Min if isId(m.column) => Some("min")
      case m: Max if isId(m.column) => Some("max")
      case _ => None
    }
    if (fns.nonEmpty && fns.forall(_.isDefined)) Some(fns.flatten) else None
  }

  /** Ungrouped → COMPLETE pushdown (O(1) range arithmetic, Spark's
    * Aggregate elided). Grouped by `tag` → PARTIAL pushdown: the scan
    * emits per-PARTITION per-group rows (`supportCompletePushDown`
    * false), and Spark's final Aggregate merges them — SUM over pushed
    * counts, MIN/MAX over pushed extrema. That is the other half of
    * the DSv2 aggregate protocol, and the shape a real columnar
    * connector uses when per-file statistics exist but cross-file
    * merging is the engine's job. tag = id % 10, so each partition
    * answers its ≤10 groups in O(10) arithmetic — no row materializes.
    */
  private def translate(agg: Aggregation): Option[(Boolean, Seq[String])] = {
    val grouped = agg.groupByExpressions.toSeq match {
      case Nil => Some(false)
      case Seq(g) if isTag(g) => Some(true)
      case _ => None
    }
    for (g <- grouped; fns <- translateFns(agg)) yield (g, fns)
  }

  override def supportCompletePushDown(agg: Aggregation): Boolean =
    translate(agg).exists(!_._1) // complete only when ungrouped

  override def pushAggregation(agg: Aggregation): Boolean =
    translate(agg) match {
      case Some((g, fns)) => aggFuncs = fns; aggByTag = g; true
      case None => false
    }
  private var aggByTag = false

  override def build(): Scan =
    if (aggFuncs.nonEmpty && aggByTag)
      new SeqGroupAggScan(rows, lo, math.max(lo, hi), parts, aggFuncs)
    else if (aggFuncs.nonEmpty) new SeqAggScan(lo, math.max(lo, hi), aggFuncs)
    else new SeqScan(rows, lo, math.max(lo, hi), parts, required)
}

/** Partial grouped-aggregate scan: the normal partition grid, but each
  * partition emits one row per tag group present in its range —
  * (tag, stats…) computed from modular range arithmetic, never by
  * materializing rows. Spark's final Aggregate merges the partials.
  */
private class SeqGroupAggScan(rows: Long, lo: Long, hi: Long, parts: Int,
    funcs: Seq[String]) extends Scan with Batch {
  override def readSchema(): StructType = StructType(
    StructField("tag", StringType, nullable = false) +:
      funcs.zipWithIndex.map { case (f, i) =>
        StructField(s"${f}_$i", LongType, nullable = f != "count") })
  override def toBatch: Batch = this
  override def description(): String =
    s"graft_seq grouped-agg [$lo, $hi) by tag -> ${funcs.mkString(",")}"

  override def planInputPartitions(): Array[InputPartition] = {
    if (hi <= lo) return Array.empty
    val span = math.max(1L, (rows + parts - 1) / parts)
    val first = lo / span * span
    (first until hi by span)
      .map(s => SeqPartition(math.max(s, lo), math.min(s + span, hi)))
      .filter(p => p.end > p.start)
      .map(p => p: InputPartition).toArray
  }

  override def createReaderFactory(): PartitionReaderFactory =
    new SeqGroupAggReaderFactory(funcs)
}

private class SeqGroupAggReaderFactory(funcs: Seq[String])
    extends PartitionReaderFactory {
  override def createReader(p: InputPartition): PartitionReader[InternalRow] = {
    val sp = p.asInstanceOf[SeqPartition]
    // per tag t in [0,10): ids ≡ t (mod 10) within [start, end)
    val groups = (0L until 10L).flatMap { t =>
      val first = sp.start + ((t - sp.start % 10) + 10) % 10
      if (first >= sp.end) None
      else {
        val last = first + (sp.end - 1 - first) / 10 * 10
        val n = (last - first) / 10 + 1
        val values: Array[Any] = UTF8String.fromString("t" + t) +:
          funcs.map[Any] {
            case "count" => n
            case "min" => first
            case "max" => last
          }.toArray
        Some(values)
      }
    }
    new PartitionReader[InternalRow] {
      private var i = -1
      override def next(): Boolean = { i += 1; i < groups.length }
      override def get(): InternalRow =
        new org.apache.spark.sql.catalyst.expressions.GenericInternalRow(groups(i))
      override def close(): Unit = ()
    }
  }
}

/** One-row, one-partition scan answering a fully-pushed aggregation
  * from range arithmetic: count = hi−lo, min = lo, max = hi−1 (min/max
  * NULL on an empty range, count 0 — standard SQL aggregate semantics).
  */
private class SeqAggScan(lo: Long, hi: Long, funcs: Seq[String])
    extends Scan with Batch {
  override def readSchema(): StructType = StructType(funcs.zipWithIndex.map {
    case (f, i) => StructField(s"${f}_$i", LongType, nullable = f != "count")
  })
  override def toBatch: Batch = this
  override def description(): String =
    s"graft_seq agg [$lo, $hi) -> ${funcs.mkString(",")}"

  override def planInputPartitions(): Array[InputPartition] =
    Array(SeqPartition(lo, hi))

  override def createReaderFactory(): PartitionReaderFactory =
    new SeqAggReaderFactory(funcs)
}

/** Serializable factory for the pushed-aggregate scan (a factory must
  * ship to executors; an inner class would drag the Scan along). */
private class SeqAggReaderFactory(funcs: Seq[String])
    extends PartitionReaderFactory {
  override def createReader(p: InputPartition): PartitionReader[InternalRow] = {
    val sp = p.asInstanceOf[SeqPartition]
    val empty = sp.end <= sp.start
    val values: Array[Any] = funcs.map {
      case "count" => if (empty) 0L else sp.end - sp.start
      case "min" => if (empty) null else sp.start
      case "max" => if (empty) null else sp.end - 1
    }.toArray
    new PartitionReader[InternalRow] {
      private var emitted = false
      override def next(): Boolean = { val r = !emitted; emitted = true; r }
      override def get(): InternalRow =
        new org.apache.spark.sql.catalyst.expressions.GenericInternalRow(values)
      override def close(): Unit = ()
    }
  }
}

private class SeqScan(rows: Long, lo: Long, hi: Long, parts: Int,
    required: StructType) extends Scan with Batch {
  override def readSchema(): StructType = required
  override def toBatch: Batch = this
  override def description(): String =
    s"graft_seq range [$lo, $hi) cols=${required.fieldNames.mkString(",")}"

  override def planInputPartitions(): Array[InputPartition] = {
    if (hi <= lo) return Array.empty
    // the partition grid is fixed by the TABLE (rows/parts), like file
    // splits — a pushed id range DROPS non-overlapping grid cells
    // (partition pruning) rather than re-slicing the surviving range
    val span = math.max(1L, (rows + parts - 1) / parts)
    val first = lo / span * span
    (first until hi by span)
      .map(s => SeqPartition(math.max(s, lo), math.min(s + span, hi)))
      .filter(p => p.end > p.start)
      .map(p => p: InputPartition).toArray
  }

  override def createReaderFactory(): PartitionReaderFactory =
    new SeqReaderFactory(required)
}

private case class SeqPartition(start: Long, end: Long) extends InputPartition

private class SeqReaderFactory(required: StructType)
    extends PartitionReaderFactory {
  override def createReader(p: InputPartition): PartitionReader[InternalRow] = {
    val sp = p.asInstanceOf[SeqPartition]
    // resolve field positions ONCE per partition, not per row
    val getters: Array[Long => Any] = required.fieldNames.map {
      case "id" => (id: Long) => id
      case "val" => (id: Long) => id * 0.5
      case "tag" => (id: Long) => UTF8String.fromString("t" + (id % 10))
      case other => throw new IllegalArgumentException(s"unknown column $other")
    }
    new PartitionReader[InternalRow] {
      private var cur = sp.start - 1
      private val values = new Array[Any](getters.length)
      override def next(): Boolean = { cur += 1; cur < sp.end }
      override def get(): InternalRow = {
        // fill the reused buffer with a primitive loop; the clone is
        // the one unavoidable per-row allocation — downstream operators
        // may buffer returned rows, so the backing array can't be shared
        var i = 0
        while (i < getters.length) { values(i) = getters(i)(cur); i += 1 }
        new org.apache.spark.sql.catalyst.expressions.GenericInternalRow(values.clone())
      }
      override def close(): Unit = ()
    }
  }
}
