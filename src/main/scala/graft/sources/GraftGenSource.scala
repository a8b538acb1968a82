package graft.sources

import java.util

import scala.jdk.CollectionConverters._

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.connector.catalog.{SupportsRead, Table, TableCapability, TableProvider}
import org.apache.spark.sql.connector.expressions.Transform
import org.apache.spark.sql.connector.read._
import org.apache.spark.sql.sources.{Filter, GreaterThan, GreaterThanOrEqual, LessThan, LessThanOrEqual}
import org.apache.spark.sql.types._
import org.apache.spark.sql.util.CaseInsensitiveStringMap
import org.apache.spark.unsafe.types.UTF8String

/**
 * `graftgen` — a DataSource V2 table that GENERATES a deterministic
 * synthetic document-metadata table, the engine-tier "source" surface
 * beyond files (SURVEY.md §2a stretch): TableProvider → ScanBuilder
 * with COLUMN PRUNING (`SupportsPushDownRequiredColumns`) and FILTER
 * PUSHDOWN (`SupportsPushDownFilters` — range predicates on `id`
 * narrow the generated range itself, so a pruned scan never produces
 * the filtered rows at all), and range-split partition planning
 * (`planInputPartitions` → `parts` equal id-range slices, each read by
 * an independent `PartitionReader`).
 *
 * Schema: id BIGINT, val DOUBLE, cat STRING — every column a pure
 * function of `id` (val = ((id·2654435761) mod 1000)/10, cat =
 * 'c'||(id mod 7)), so any slice of the table is reproducible on any
 * executor, retries are free, and a DuckDB `generate_series` oracle
 * can recompute the whole table exactly. This is the scan shape of a
 * deterministic-synthesis source at 100 TB: no driver state, no
 * shuffle, partitions = range slices.
 *
 * Options: `rows` (total ids, 0-based), `parts` (input partitions).
 */
class GraftGenSource extends TableProvider
    with org.apache.spark.sql.sources.DataSourceRegister {
  override def shortName(): String = "graftgen"
  override def inferSchema(options: CaseInsensitiveStringMap): StructType =
    GraftGenSource.schema
  override def getTable(schema: StructType, partitioning: Array[Transform],
      properties: util.Map[String, String]): Table =
    new GraftGenTable(
      properties.getOrDefault("rows", "1000").toLong,
      properties.getOrDefault("parts", "4").toInt)
}

object GraftGenSource {
  val schema: StructType = StructType(Seq(
    StructField("id", LongType, nullable = false),
    StructField("val", DoubleType, nullable = false),
    StructField("cat", StringType, nullable = false)))

  def valOf(id: Long): Double = ((id * 2654435761L) % 1000L).toDouble / 10.0
  def catOf(id: Long): String = "c" + (id % 7L)
}

class GraftGenTable(rows: Long, parts: Int) extends Table with SupportsRead {
  override def name(): String = s"graftgen($rows)"
  override def schema(): StructType = GraftGenSource.schema
  override def capabilities(): util.Set[TableCapability] =
    Set(TableCapability.BATCH_READ).asJava
  override def newScanBuilder(options: CaseInsensitiveStringMap): ScanBuilder =
    new GraftGenScanBuilder(rows, parts)
}

class GraftGenScanBuilder(rows: Long, parts: Int) extends ScanBuilder
    with SupportsPushDownFilters with SupportsPushDownRequiredColumns {
  private var lo = 0L            // inclusive
  private var hi = rows          // exclusive
  private var pushed = Array.empty[Filter]
  private var required = GraftGenSource.schema

  /** Range predicates on `id` tighten the generated range itself (the
    * source-level analogue of parquet row-group pruning); everything
    * else is left for Spark to evaluate post-scan. */
  override def pushFilters(filters: Array[Filter]): Array[Filter] = {
    val (accepted, rest) = filters.partition {
      case GreaterThan("id", _: Long) | GreaterThanOrEqual("id", _: Long) |
           LessThan("id", _: Long) | LessThanOrEqual("id", _: Long) => true
      case _ => false
    }
    accepted.foreach {
      case GreaterThan("id", v: Long)        => lo = math.max(lo, v + 1)
      case GreaterThanOrEqual("id", v: Long) => lo = math.max(lo, v)
      case LessThan("id", v: Long)           => hi = math.min(hi, v)
      case LessThanOrEqual("id", v: Long)    => hi = math.min(hi, v + 1)
      case _                                 => ()
    }
    pushed = accepted
    rest // nothing accepted is re-checked by Spark; rest is
  }
  override def pushedFilters(): Array[Filter] = pushed
  override def pruneColumns(requiredSchema: StructType): Unit =
    required = requiredSchema
  override def build(): Scan = new GraftGenScan(lo, hi, parts, required)
}

class GraftGenScan(lo: Long, hi: Long, parts: Int, required: StructType)
    extends Scan with Batch {
  override def readSchema(): StructType = required
  override def toBatch: Batch = this
  override def description(): String =
    s"GraftGenScan(range=[$lo,$hi), parts=$parts, cols=${required.fieldNames.mkString(",")})"

  override def planInputPartitions(): Array[InputPartition] = {
    val n = math.max(0L, hi - lo)
    if (n == 0L) return Array.empty
    val k = math.min(parts.toLong, n).toInt
    (0 until k).map { i =>
      val start = lo + n * i / k
      val end = lo + n * (i + 1) / k
      GraftGenPartition(start, end): InputPartition
    }.toArray
  }
  override def createReaderFactory(): PartitionReaderFactory =
    new GraftGenReaderFactory(required)
}

case class GraftGenPartition(start: Long, end: Long) extends InputPartition

class GraftGenReaderFactory(required: StructType)
    extends PartitionReaderFactory {
  override def createReader(p: InputPartition): PartitionReader[InternalRow] = {
    val gp = p.asInstanceOf[GraftGenPartition]
    new PartitionReader[InternalRow] {
      private var id = gp.start - 1
      // column pruning realized at generation: only requested fields
      // are computed and emitted
      private val emit: Array[Long => Any] = required.fieldNames.map {
        case "id"  => (i: Long) => i
        case "val" => (i: Long) => GraftGenSource.valOf(i)
        case "cat" => (i: Long) => UTF8String.fromString(GraftGenSource.catOf(i))
      }
      override def next(): Boolean = { id += 1; id < gp.end }
      override def get(): InternalRow =
        InternalRow.fromSeq(emit.map(f => f(id)).toIndexedSeq)
      override def close(): Unit = ()
    }
  }
}
