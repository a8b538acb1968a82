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
    with SupportsPushDownFilters with SupportsPushDownRequiredColumns
    with SupportsPushDownAggregates {
  private var lo = 0L            // inclusive
  private var hi = rows          // exclusive
  private var pushed = Array.empty[Filter]
  private var required = GraftGenSource.schema
  // parsed pushed aggregation: group-by-cat flag + per-agg emitters over
  // the (cnt, minId, maxId) arithmetic of one residue class / the range
  private var aggPushed: Option[(Boolean, Seq[String])] = None

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

  /** COMPLETE aggregate pushdown (`SupportsPushDownAggregates`): for
    * COUNT(*) / MIN(id) / MAX(id), optionally GROUP BY cat, the answer
    * is pure residue-class arithmetic over the (already filter-
    * tightened) id range — count of ids ≡ c (mod 7) in [lo, hi) is a
    * closed formula — so the "scan" emits ≤7 result rows and never
    * generates a data row at all. This is the source-side analogue of
    * answering COUNT from parquet footer statistics: pushdown order is
    * filters first, then aggregates, so range pruning COMPOSES with the
    * arithmetic. All-or-nothing per the API contract: any unsupported
    * agg/group rejects the whole pushdown and Spark falls back to the
    * row-generating scan. */
  override def supportCompletePushDown(
      agg: org.apache.spark.sql.connector.expressions.aggregate.Aggregation): Boolean =
    parseAgg(agg).isDefined

  override def pushAggregation(
      agg: org.apache.spark.sql.connector.expressions.aggregate.Aggregation): Boolean = {
    parseAgg(agg) match {
      case some @ Some(_) => aggPushed = some; true
      case None => false
    }
  }

  private def parseAgg(
      agg: org.apache.spark.sql.connector.expressions.aggregate.Aggregation)
      : Option[(Boolean, Seq[String])] = {
    import org.apache.spark.sql.connector.expressions.NamedReference
    import org.apache.spark.sql.connector.expressions.aggregate.{CountStar, Max, Min}
    def isCol(e: org.apache.spark.sql.connector.expressions.Expression,
        name: String): Boolean = e match {
      case nr: NamedReference => nr.fieldNames.sameElements(Array(name))
      case _ => false
    }
    val byCat = agg.groupByExpressions() match {
      // global agg over an EMPTY range must yield one row with
      // count=0 / NULL min-max — SQL semantics the arithmetic emitter
      // doesn't model (its schema is non-nullable); reject and let the
      // row-generating scan produce the correct empty-input aggregate
      case Array() if hi > lo => Some(false)
      case Array(e) if isCol(e, "cat") => Some(true)
      case _ => None
    }
    val funcs = agg.aggregateExpressions().foldLeft(Option(Seq.empty[String])) {
      case (Some(acc), _: CountStar) => Some(acc :+ "count")
      case (Some(acc), m: Min) if isCol(m.column, "id") => Some(acc :+ "min")
      case (Some(acc), m: Max) if isCol(m.column, "id") => Some(acc :+ "max")
      case _ => None
    }
    for (g <- byCat; f <- funcs if f.nonEmpty) yield (g, f)
  }

  override def build(): Scan = aggPushed match {
    case Some((byCat, funcs)) => new GraftGenAggScan(lo, hi, byCat, funcs)
    case None => new GraftGenScan(lo, hi, parts, required)
  }
}

/** Result "scan" for a completely-pushed aggregation: one partition,
  * ≤7 rows, all values computed by closed-form residue arithmetic. */
class GraftGenAggScan(lo: Long, hi: Long, byCat: Boolean, funcs: Seq[String])
    extends Scan with Batch {
  override def readSchema(): StructType = StructType(
    (if (byCat) Seq(StructField("cat", StringType, nullable = false)) else Nil) ++
      funcs.zipWithIndex.map { case (f, i) =>
        StructField(s"agg_$i", LongType, nullable = false)
      })
  override def toBatch: Batch = this
  override def description(): String =
    s"GraftGenAggScan(range=[$lo,$hi), groupByCat=$byCat, " +
      s"aggs=${funcs.mkString(",")}, aggPushed=complete)"

  override def planInputPartitions(): Array[InputPartition] =
    Array(GraftGenPartition(0L, 1L))

  override def createReaderFactory(): PartitionReaderFactory =
    GraftGenAggReaderFactory(lo, hi, byCat, funcs)
}

case class GraftGenAggReaderFactory(lo: Long, hi: Long, byCat: Boolean,
    funcs: Seq[String]) extends PartitionReaderFactory {
  override def createReader(p: InputPartition): PartitionReader[InternalRow] =
    new PartitionReader[InternalRow] {
      private val rows: Iterator[InternalRow] = {
        // (cnt, minId, maxId) per emitted group
        val groups: Seq[(Option[String], (Long, Long, Long))] =
          if (!byCat) {
            if (hi > lo) Seq((None, (hi - lo, lo, hi - 1))) else Nil
          } else {
            (0L until 7L).flatMap { c =>
              val minId = lo + (((c - lo % 7) % 7) + 7) % 7
              val maxId = (hi - 1) - ((((hi - 1) % 7 - c) % 7) + 7) % 7
              if (minId >= hi || maxId < lo) None
              else Some((Option(GraftGenSource.catOf(c)),
                ((maxId - minId) / 7 + 1, minId, maxId)))
            }.sortBy(_._1.get)
          }
        groups.iterator.map { case (cat, (cnt, mn, mx)) =>
          val aggVals = funcs.map {
            case "count" => cnt
            case "min"   => mn
            case "max"   => mx
          }
          InternalRow.fromSeq(
            (cat.map(UTF8String.fromString).toSeq ++ aggVals).toIndexedSeq)
        }
      }
      override def next(): Boolean = rows.hasNext
      override def get(): InternalRow = rows.next()
      override def close(): Unit = ()
    }
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
