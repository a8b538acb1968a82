package graft.sources

import java.util

import scala.jdk.CollectionConverters._

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.GenericInternalRow
import org.apache.spark.sql.connector.catalog.{SupportsRead, Table, TableCapability, TableProvider}
import org.apache.spark.sql.connector.expressions.{Expressions, Transform}
import org.apache.spark.sql.connector.read._
import org.apache.spark.sql.connector.read.partitioning.{KeyGroupedPartitioning, Partitioning}
import org.apache.spark.sql.types._
import org.apache.spark.sql.util.CaseInsensitiveStringMap
import org.apache.spark.unsafe.types.UTF8String

/**
 * `graftpart` — a DataSource V2 source whose scan REPORTS its
 * partitioning (SURVEY.md §2a engine tier, round 9): rows are laid out
 * one input partition per `cat` value, the scan advertises
 * [[KeyGroupedPartitioning]] over `identity(cat)`, and every partition
 * carries its [[HasPartitionKey]] key row. That is the contract behind
 * STORAGE-PARTITIONED JOINS: with
 * `spark.sql.sources.v2.bucketing.enabled`, two such scans equi-joined
 * on `cat` match partitions by KEY VALUE and the join plans with ZERO
 * exchange on either side — the DSv2 generalization of bucketing
 * (q_bucketed_join), and the mechanism Iceberg/Delta use to join
 * co-partitioned 100 TB tables without shuffling either.
 *
 * Rows are the same pure-function-of-id family as `graftgen`
 * (val = ((id·2654435761) mod 1000)/10, cat = 'c'||(id mod 7)), so a
 * DuckDB generate_series oracle recomputes the join exactly.
 *
 * Options: `rows` (total ids, 0-based), `salt` (id offset, letting two
 * instances carry different row sets).
 */
class GraftPartSource extends TableProvider
    with org.apache.spark.sql.sources.DataSourceRegister {
  override def shortName(): String = "graftpart"
  override def inferSchema(options: CaseInsensitiveStringMap): StructType =
    GraftGenSource.schema
  override def getTable(schema: StructType, partitioning: Array[Transform],
      properties: util.Map[String, String]): Table =
    new GraftPartTable(
      properties.getOrDefault("rows", "1000").toLong,
      properties.getOrDefault("salt", "0").toLong)
}

class GraftPartTable(rows: Long, salt: Long) extends Table with SupportsRead {
  override def name(): String = s"graftpart($rows,$salt)"
  override def schema(): StructType = GraftGenSource.schema
  override def partitioning(): Array[Transform] =
    Array(Expressions.identity("cat"))
  override def capabilities(): util.Set[TableCapability] =
    Set(TableCapability.BATCH_READ).asJava
  override def newScanBuilder(options: CaseInsensitiveStringMap): ScanBuilder =
    () => new Scan with Batch with SupportsReportPartitioning {
      override def readSchema(): StructType = GraftGenSource.schema
      override def toBatch: Batch = this
      override def outputPartitioning(): Partitioning =
        new KeyGroupedPartitioning(Array(Expressions.identity("cat")), 7)
      override def planInputPartitions(): Array[InputPartition] =
        (0 until 7).map(c => CatPartition(rows, salt, c): InputPartition).toArray
      override def createReaderFactory(): PartitionReaderFactory =
        (p: InputPartition) => new PartitionReader[InternalRow] {
          private val CatPartition(n, slt, cat) = p.asInstanceOf[CatPartition]
          // ids ≡ cat (mod 7) within [0, n), shifted by salt
          private var id = cat.toLong - 7L
          override def next(): Boolean = { id += 7L; id < n }
          override def get(): InternalRow = {
            val realId = id + slt
            new GenericInternalRow(Array[Any](realId,
              GraftGenSource.valOf(realId),
              UTF8String.fromString("c" + (id % 7L))))
          }
          override def close(): Unit = ()
        }
    }
}

/** One partition per cat value; the key row is what SPJ matches on. */
case class CatPartition(rows: Long, salt: Long, cat: Int)
    extends InputPartition with HasPartitionKey {
  override def partitionKey(): InternalRow =
    new GenericInternalRow(Array[Any](UTF8String.fromString("c" + cat)))
}
