package graft.sources

import java.util

import scala.jdk.CollectionConverters._

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.GenericInternalRow
import org.apache.spark.sql.connector.catalog.{SupportsRead, Table, TableCapability, TableProvider}
import org.apache.spark.sql.connector.expressions.Transform
import org.apache.spark.sql.connector.read._
import org.apache.spark.sql.connector.read.streaming.{MicroBatchStream, Offset, ReadLimit, SupportsAdmissionControl}
import org.apache.spark.sql.sources.{EqualTo, Filter, GreaterThan, GreaterThanOrEqual, IsNotNull, LessThan, LessThanOrEqual}
import org.apache.spark.sql.types._
import org.apache.spark.sql.util.CaseInsensitiveStringMap
import org.apache.spark.unsafe.types.UTF8String

/** Custom DataSource V2: a deterministic synthetic document generator —
  * the connector tier of the engine (SURVEY §2.1), demonstrating what a
  * production source (the reference's Elasticsearch scroll,
  * elastic.go:44-102) plugs into:
  *
  *  - **filter pushdown** (`SupportsPushDownFilters`): `doc_id`
  *    comparisons are absorbed into the scan — exactly how the
  *    reference pushes `last_update >= watermark` into the ES query DSL
  *    (elastic.go:50-53). Pushed bounds prune whole input partitions at
  *    planning time and clip row ranges inside surviving ones.
  *  - **column pruning** (`SupportsPushDownRequiredColumns`): the
  *    reader materializes only requested fields — text generation is
  *    skipped entirely for `SELECT doc_id` shapes.
  *  - **splittable parallel read**: `partitions` disjoint id slices,
  *    each an independent `InputPartition` (the 1000-executor scale
  *    contract; no driver-side row creation).
  *
  * Rows are a pure function of `doc_id`, so the source is exactly
  * reproducible across runs/engines (the DuckDB oracle regenerates the
  * same corpus from `range()` — see SparkEntry `dgen_source_stats`):
  * `n_words = 5 + id%5`, word `i` = `"w" + (id*31 + i) % 97`,
  * `source = "src" + id%20`.
  *
  * Usage:
  * {{{
  * spark.read.format(classOf[DocGenSource].getName)
  *   .option("rows", 2000).option("partitions", 8).load()
  * }}}
  */
class DocGenSource extends TableProvider {
  override def inferSchema(options: CaseInsensitiveStringMap): StructType = DocGen.Schema
  override def getTable(
      schema: StructType,
      partitioning: Array[Transform],
      properties: util.Map[String, String]): Table = new DocGenTable
}

object DocGen {
  val Schema: StructType = StructType(Seq(
    StructField("doc_id", LongType, nullable = false),
    StructField("source", StringType, nullable = false),
    StructField("text", StringType, nullable = false)))

  /** The row closed form (shared by the reader and the spec). */
  def sourceOf(id: Long): String = "src" + (id % 20)
  def textOf(id: Long): String =
    (0L until (5 + id % 5)).map(i => "w" + ((id * 31 + i) % 97)).mkString(" ")
}

private[sources] class DocGenTable extends Table with SupportsRead {
  override def name(): String = "docgen"
  override def schema(): StructType = DocGen.Schema
  override def capabilities(): util.Set[TableCapability] =
    Set(TableCapability.BATCH_READ, TableCapability.MICRO_BATCH_READ).asJava
  override def newScanBuilder(options: CaseInsensitiveStringMap): ScanBuilder =
    new DocGenScanBuilder(
      options.getLong("rows", 1000L),
      options.getInt("partitions", 4),
      options.getLong("rowsPerBatch", 250L))
}

private[sources] class DocGenScanBuilder(rows: Long, partitions: Int, rowsPerBatch: Long = 250L)
    extends ScanBuilder with SupportsPushDownFilters with SupportsPushDownRequiredColumns {

  private var lo = 0L          // inclusive
  private var hi = rows        // exclusive
  private var pushed = Array.empty[Filter]
  private var required: StructType = DocGen.Schema

  override def pushFilters(filters: Array[Filter]): Array[Filter] = {
    val (accepted, residual) = filters.partition {
      case EqualTo("doc_id", _: java.lang.Long | _: java.lang.Integer) => true
      case GreaterThanOrEqual("doc_id", _: java.lang.Long | _: java.lang.Integer) => true
      case GreaterThan("doc_id", _: java.lang.Long | _: java.lang.Integer) => true
      case LessThan("doc_id", _: java.lang.Long | _: java.lang.Integer) => true
      case LessThanOrEqual("doc_id", _: java.lang.Long | _: java.lang.Integer) => true
      case IsNotNull("doc_id") => true
      case _ => false
    }
    accepted.foreach {
      case EqualTo(_, v) =>
        val x = v.asInstanceOf[Number].longValue
        lo = math.max(lo, x); hi = math.min(hi, x + 1)
      case GreaterThanOrEqual(_, v) => lo = math.max(lo, v.asInstanceOf[Number].longValue)
      case GreaterThan(_, v) => lo = math.max(lo, v.asInstanceOf[Number].longValue + 1)
      case LessThan(_, v) => hi = math.min(hi, v.asInstanceOf[Number].longValue)
      case LessThanOrEqual(_, v) => hi = math.min(hi, v.asInstanceOf[Number].longValue + 1)
      case IsNotNull(_) => ()
      case _ => ()
    }
    pushed = accepted
    residual
  }
  override def pushedFilters(): Array[Filter] = pushed

  override def pruneColumns(requiredSchema: StructType): Unit =
    // preserve generator field order regardless of projection order
    required = StructType(DocGen.Schema.filter(f => requiredSchema.fieldNames.contains(f.name)))

  override def build(): Scan =
    new DocGenScan(rows, partitions, lo, hi, required, pushed, rowsPerBatch)
}

private[sources] case class DocGenSlice(start: Long, end: Long) extends InputPartition

private[sources] class DocGenScan(
    rows: Long, partitions: Int, lo: Long, hi: Long,
    required: StructType, pushed: Array[Filter],
    rowsPerBatch: Long = 250L) extends Scan with Batch {

  override def readSchema(): StructType = required
  override def toBatch: Batch = this
  // the pushed [lo,hi) bound travels into the stream: pushFilters claims
  // doc_id predicates as fully applied (non-residual), so the streaming
  // path must honor them too or filtered-out rows would leak unchecked
  override def toMicroBatchStream(checkpointLocation: String): MicroBatchStream =
    new DocGenMicroBatchStream(rows, partitions, rowsPerBatch, required, lo, hi)
  override def description(): String =
    s"DocGenScan rows=$rows range=[$lo,$hi) " +
      s"PushedFilters: [${pushed.mkString(", ")}], ReadSchema: ${required.simpleString}"

  /** Partition pruning happens HERE: slices outside the pushed id
    * range never become tasks.
    */
  override def planInputPartitions(): Array[InputPartition] = {
    val per = math.max(1L, (rows + partitions - 1) / partitions)
    (0 until partitions).iterator
      .map(p => DocGenSlice(p * per, math.min((p + 1) * per, rows)))
      .map(s => DocGenSlice(math.max(s.start, lo), math.min(s.end, hi)))
      .filter(s => s.start < s.end)
      .toArray[InputPartition]
  }

  override def createReaderFactory(): PartitionReaderFactory = new DocGenReaderFactory(required)
}

/** The resumable-offset id in the stream — the T1 watermark contract
  * (the reference logs the max seen `last_update` as a restart point,
  * elastic.go:87-96) as a real Structured Streaming offset: `id` =
  * next unread doc_id; serialized into the checkpoint, so a restarted
  * query resumes exactly where the committed batch ended.
  */
private[graft] case class DocGenOffset(id: Long) extends Offset {
  override def json(): String = id.toString
}

/** Micro-batch form of the generator: each trigger admits a capped
  * count of ids past the last committed offset (stateless start-based
  * admission control) until the pushed-down id range `[rangeLo,
  * rangeHi)` is exhausted; every batch's id range splits into
  * `partitions` parallel slices (same reader as the batch path).
  * Offsets commit through the engine's checkpoint — the hand-rolled
  * resumable scan of the reference (T1/T2) with exactly-once
  * bookkeeping for free.
  *
  * The per-batch cap comes from the engine-supplied [[ReadLimit]]
  * (`maxRows` / `allAvailable` / composite), so trigger-level
  * admission settings win; `rowsPerBatch` is only the default limit
  * and the fallback for limit shapes the source cannot interpret.
  */
private[graft] class DocGenMicroBatchStream(
    rows: Long, partitions: Int, rowsPerBatch: Long, required: StructType,
    rangeLo: Long = 0L, rangeHi: Long = Long.MaxValue)
    extends MicroBatchStream with SupportsAdmissionControl {

  private val lastId = math.min(rows, rangeHi) // exclusive end of the stream
  private val firstId = math.min(math.max(0L, rangeLo), lastId)

  override def initialOffset(): Offset = DocGenOffset(firstId)
  override def deserializeOffset(json: String): Offset = DocGenOffset(json.toLong)
  override def commit(end: Offset): Unit = ()
  override def stop(): Unit = ()

  override def getDefaultReadLimit: ReadLimit = ReadLimit.maxRows(rowsPerBatch)
  // legacy entry point (engines use the admission-control overload)
  override def latestOffset(): Offset = DocGenOffset(lastId)
  override def latestOffset(start: Offset, limit: ReadLimit): Offset = {
    val s = math.max(start.asInstanceOf[DocGenOffset].id, firstId)
    DocGenOffset(math.min(s + batchCap(limit), lastId))
  }
  override def reportLatestOffset(): Offset = DocGenOffset(lastId)

  /** Row budget for one trigger, honoring the engine's admission
    * control. A composite limit's tightest interpretable member wins.
    */
  private def batchCap(limit: ReadLimit): Long = limit match {
    case r: streaming.ReadMaxRows => r.maxRows()
    case _: streaming.ReadAllAvailable => Long.MaxValue - lastId // s + cap never overflows
    case c: streaming.CompositeReadLimit =>
      // only max-shaped members bound a batch (min-rows does not)
      val caps = c.getReadLimits.collect { case r: streaming.ReadMaxRows => r.maxRows() }
      if (caps.nonEmpty) caps.min else rowsPerBatch
    case _ => rowsPerBatch // ReadMinRows etc.: no max semantics to apply
  }

  override def planInputPartitions(start: Offset, end: Offset): Array[InputPartition] = {
    val lo = math.max(start.asInstanceOf[DocGenOffset].id, firstId)
    val hi = math.min(end.asInstanceOf[DocGenOffset].id, lastId)
    val n = math.max(1L, hi - lo)
    val per = math.max(1L, (n + partitions - 1) / partitions)
    (0 until partitions).iterator
      .map(p => DocGenSlice(lo + p * per, math.min(lo + (p + 1) * per, hi)))
      .filter(s => s.start < s.end)
      .toArray[InputPartition]
  }

  override def createReaderFactory(): PartitionReaderFactory =
    new DocGenReaderFactory(required)
}

private[sources] class DocGenReaderFactory(required: StructType)
    extends PartitionReaderFactory {
  override def createReader(partition: InputPartition): PartitionReader[InternalRow] = {
    val s = partition.asInstanceOf[DocGenSlice]
    new PartitionReader[InternalRow] {
      private var id = s.start - 1
      // column pruning is real: unrequested fields are never generated
      private val gens: Array[Long => Any] = required.fields.map { f =>
        f.name match {
          case "doc_id" => (i: Long) => i
          case "source" => (i: Long) => UTF8String.fromString(DocGen.sourceOf(i))
          case "text" => (i: Long) => UTF8String.fromString(DocGen.textOf(i))
        }
      }
      override def next(): Boolean = { id += 1; id < s.end }
      override def get(): InternalRow = new GenericInternalRow(gens.map(_(id)))
      override def close(): Unit = ()
    }
  }
}
