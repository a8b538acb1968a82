package graft.sources

import java.util

import scala.collection.concurrent.TrieMap
import scala.jdk.CollectionConverters._

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.GenericInternalRow
import org.apache.spark.sql.connector.catalog.{SupportsRead, SupportsWrite, Table, TableCapability, TableProvider}
import org.apache.spark.sql.connector.expressions.Transform
import org.apache.spark.sql.connector.read._
import org.apache.spark.sql.connector.write._
import org.apache.spark.sql.types._
import org.apache.spark.sql.util.CaseInsensitiveStringMap
import org.apache.spark.unsafe.types.UTF8String

/**
 * `graftmem` — the WRITE half of the DataSource V2 surface
 * (SURVEY.md §2a engine tier; read half = [[GraftGenSource]]): a named
 * in-memory table store exercising the full connector write protocol —
 * `WriteBuilder` (with `SupportsTruncate` for overwrite), `BatchWrite`,
 * per-partition `DataWriter`s whose buffered rows travel to the driver
 * as `WriterCommitMessage`s, and an ATOMIC `commit()` that publishes
 * all partitions at once (readers see the old snapshot until commit
 * returns; `abort()` discards everything, so a failed job leaves the
 * table untouched — the transactional contract files get from a
 * manifest swap, here from one volatile reference swap).
 *
 * Scope: rows-through-commit-messages is the pattern of Spark's own
 * memory/noop sinks and is single-process by design — the right shape
 * for tests and for the protocol demonstration. A production writer
 * ships FILES and commits a manifest (exactly the mechanic
 * `q_time_travel` builds at the query level); the protocol surface
 * (task commit → job commit → atomic publish) is identical.
 *
 * Supported column types: BIGINT, INT, DOUBLE, STRING, BOOLEAN
 * (commit messages carry JVM-serializable copies).
 */
class GraftMemSink extends TableProvider
    with org.apache.spark.sql.sources.DataSourceRegister {
  override def shortName(): String = "graftmem"
  // on read: the committed schema; on first write: empty (the table
  // accepts the incoming write schema via ACCEPT_ANY_SCHEMA)
  override def inferSchema(options: CaseInsensitiveStringMap): StructType =
    GraftMemStore.tables.get(GraftMemStore.nameOf(options))
      .map(_.schema).getOrElse(new StructType())
  override def getTable(schema: StructType, partitioning: Array[Transform],
      properties: util.Map[String, String]): Table =
    new GraftMemTable(
      GraftMemStore.nameOf(new CaseInsensitiveStringMap(properties)),
      new CaseInsensitiveStringMap(properties).getInt("parts", 4))
}

/** Driver-side table registry: one atomic reference per table name. */
object GraftMemStore {
  case class Committed(schema: StructType, rows: Array[Array[Any]])
  val tables: TrieMap[String, Committed] = TrieMap.empty
  def nameOf(options: CaseInsensitiveStringMap): String =
    options.getOrDefault("table", "default")

  def toJvm(row: InternalRow, schema: StructType): Array[Any] = {
    val out = new Array[Any](schema.length)
    var i = 0
    while (i < schema.length) {
      out(i) =
        if (row.isNullAt(i)) null
        else schema(i).dataType match {
          case LongType => row.getLong(i)
          case IntegerType => row.getInt(i)
          case DoubleType => row.getDouble(i)
          case BooleanType => row.getBoolean(i)
          case StringType => row.getUTF8String(i).toString
          case t => throw new IllegalArgumentException(
            s"graftmem does not support ${t.catalogString}")
        }
      i += 1
    }
    out
  }

  def toInternal(vals: Array[Any], schema: StructType): InternalRow = {
    val out = new Array[Any](schema.length)
    var i = 0
    while (i < schema.length) {
      out(i) = (vals(i), schema(i).dataType) match {
        case (null, _) => null
        case (v: String, StringType) => UTF8String.fromString(v)
        case (v, _) => v
      }
      i += 1
    }
    new GenericInternalRow(out)
  }
}

class GraftMemTable(tableName: String, parts: Int)
    extends Table with SupportsRead with SupportsWrite
    with org.apache.spark.sql.connector.catalog.SupportsDelete
    with org.apache.spark.sql.connector.catalog.SupportsRowLevelOperations {

  // ---- row-level UPDATE / MERGE (and DELETE fallback): the GROUP-based
  // rewrite protocol. Spark rewrites the command into ReplaceData —
  // scan the affected groups, compute the replacement rows (updated +
  // untouched), write them back, and the connector must atomically
  // replace the scanned groups' content. This table's group granularity
  // is the WHOLE TABLE (no file substructure), so the write-back is a
  // truncating commit — the same atomic snapshot swap as overwrite.
  // Division of labor with SupportsDelete above: a DELETE whose
  // predicate passes canDeleteWhere takes the METADATA-ONLY fast path
  // (no Spark job); anything else — arbitrary predicates, UPDATE,
  // MERGE — flows through this rewrite, where Spark itself evaluates
  // the condition with full expression semantics.
  override def newRowLevelOperationBuilder(
      info: org.apache.spark.sql.connector.write.RowLevelOperationInfo)
      : org.apache.spark.sql.connector.write.RowLevelOperationBuilder =
    () => new org.apache.spark.sql.connector.write.RowLevelOperation {
      override def command():
          org.apache.spark.sql.connector.write.RowLevelOperation.Command =
        info.command()
      override def newScanBuilder(
          options: CaseInsensitiveStringMap): ScanBuilder =
        GraftMemTable.this.newScanBuilder(options)
      // whole-table group ⇒ the replacement set is the full new content:
      // commit as a truncating snapshot swap. The incoming write schema
      // carries ENGINE METADATA columns (`__row_operation`) alongside
      // the row columns, so the writer projects the committed columns
      // BY NAME — storing positionally would shift every value one slot
      // (observed: operation codes where ids should be).
      override def newWriteBuilder(lwi: LogicalWriteInfo): WriteBuilder =
        new WriteBuilder {
          override def build(): Write = new Write {
          override def toBatch: BatchWrite = new BatchWrite {
            private val committed = GraftMemStore.tables(tableName).schema
            override def createBatchWriterFactory(
                pi: PhysicalWriteInfo): DataWriterFactory =
              MemProjWriterFactory(committed)
            override def commit(messages: Array[WriterCommitMessage]): Unit = {
              val batch = messages.flatMap(_.asInstanceOf[MemCommit].rows)
              GraftMemStore.tables.put(tableName,
                GraftMemStore.Committed(committed, batch))
            }
            override def abort(messages: Array[WriterCommitMessage]): Unit = ()
          }
          }
        }
    }
  override def name(): String = s"graftmem($tableName)"
  override def schema(): StructType =
    GraftMemStore.tables.get(tableName).map(_.schema).getOrElse(new StructType())
  override def capabilities(): util.Set[TableCapability] = {
    val base = Set(TableCapability.BATCH_READ, TableCapability.BATCH_WRITE,
      TableCapability.TRUNCATE)
    // ACCEPT_ANY_SCHEMA only BEFORE the first commit (the table adopts
    // the incoming write schema). Once a schema is committed, writes
    // resolve against it normally — which also unblocks the row-level
    // UPDATE/MERGE rewrites: with ACCEPT_ANY_SCHEMA the analyzer skips
    // assignment alignment, `aligned` never holds, and RewriteUpdateTable
    // silently never fires (the command then dies at the planner with
    // UNSUPPORTED_FEATURE.TABLE_OPERATION — observed, diagnosed here).
    val caps =
      if (GraftMemStore.tables.contains(tableName)) base
      else base + TableCapability.ACCEPT_ANY_SCHEMA
    caps.asJava
  }

  // ---- row-level DELETE (SupportsDelete): `DELETE FROM cat.t WHERE p`
  // plans as a metadata operation pushed WHOLLY into the connector —
  // no Spark job, no rewrite-the-survivors scan plan. canDeleteWhere is
  // the honesty gate: only predicates the connector can evaluate
  // exactly are accepted (else Spark falls back/errors rather than
  // half-deleting); the delete itself is a compare-and-swap republish
  // of the filtered snapshot, atomic exactly like a write commit.
  import org.apache.spark.sql.sources._
  // The honesty gate must also cover VALUES, not just filter shapes: a
  // pushed literal of a type cmp() cannot order (date, timestamp,
  // decimal vs a string column, …) must refuse pushdown here — Spark
  // then falls back — rather than throw mid-delete after some rows are
  // already judged.
  private def comparableLiteral(attr: String, x: Any): Boolean = {
    val fieldType = GraftMemStore.tables.get(tableName)
      .flatMap(_.schema.fields.find(_.name == attr)).map(_.dataType)
    (fieldType, x) match {
      case (Some(LongType | IntegerType | DoubleType), _: java.lang.Long |
            _: java.lang.Integer | _: java.lang.Double | _: java.lang.Short |
            _: java.lang.Byte | _: java.lang.Float) => true
      case (Some(BooleanType), _: java.lang.Boolean) => true
      case (Some(StringType), _: String) => true
      case _ => false
    }
  }
  private def supportedFilter(f: Filter): Boolean = f match {
    case EqualTo(a, x) => comparableLiteral(a, x)
    case GreaterThan(a, x) => comparableLiteral(a, x)
    case GreaterThanOrEqual(a, x) => comparableLiteral(a, x)
    case LessThan(a, x) => comparableLiteral(a, x)
    case LessThanOrEqual(a, x) => comparableLiteral(a, x)
    case In(a, xs) => xs.nonEmpty && xs.forall(x => comparableLiteral(a, x))
    case IsNull(a) => GraftMemStore.tables.get(tableName)
      .exists(_.schema.fieldNames.contains(a))
    case IsNotNull(a) => GraftMemStore.tables.get(tableName)
      .exists(_.schema.fieldNames.contains(a))
    case _: AlwaysTrue | _: AlwaysFalse => true
    case And(l, r) => supportedFilter(l) && supportedFilter(r)
    case Or(l, r) => supportedFilter(l) && supportedFilter(r)
    case Not(c) => supportedFilter(c)
    case _ => false
  }

  override def canDeleteWhere(filters: Array[Filter]): Boolean =
    GraftMemStore.tables.contains(tableName) && filters.forall(supportedFilter)

  override def deleteWhere(filters: Array[Filter]): Unit = {
    def cmp(a: Any, b: Any): Int = (a, b) match {
      case (x: Long, y: Number) => java.lang.Long.compare(x, y.longValue())
      case (x: Int, y: Number) => java.lang.Long.compare(x.toLong, y.longValue())
      case (x: Double, y: Number) => java.lang.Double.compare(x, y.doubleValue())
      case (x: Boolean, y: Boolean) => java.lang.Boolean.compare(x, y)
      case (x: String, y: String) => x.compareTo(y)
      case _ => throw new IllegalArgumentException(
        s"graftmem delete: cannot compare $a with $b")
    }
    // THREE-valued evaluation (None = SQL UNKNOWN): a comparison over a
    // NULL cell is unknown, Not(unknown) stays unknown, and a row is
    // deleted only on a definite TRUE — so `DELETE WHERE a != 5` (which
    // Spark pushes as Not(EqualTo(a,5))) KEEPS rows where a IS NULL,
    // matching ANSI semantics instead of deleting them.
    def eval(f: Filter, schema: StructType, row: Array[Any]): Option[Boolean] = {
      def v(attr: String): Any = row(schema.fieldIndex(attr))
      def nullableCmp(a: String, x: Any)(p: Int => Boolean): Option[Boolean] =
        if (v(a) == null) None else Some(p(cmp(v(a), x)))
      f match {
        case EqualTo(a, x) => nullableCmp(a, x)(_ == 0)
        case GreaterThan(a, x) => nullableCmp(a, x)(_ > 0)
        case GreaterThanOrEqual(a, x) => nullableCmp(a, x)(_ >= 0)
        case LessThan(a, x) => nullableCmp(a, x)(_ < 0)
        case LessThanOrEqual(a, x) => nullableCmp(a, x)(_ <= 0)
        case In(a, xs) =>
          if (v(a) == null) None else Some(xs.exists(x => cmp(v(a), x) == 0))
        case IsNull(a) => Some(v(a) == null)
        case IsNotNull(a) => Some(v(a) != null)
        case And(l, r) => (eval(l, schema, row), eval(r, schema, row)) match {
          case (Some(false), _) | (_, Some(false)) => Some(false)
          case (Some(true), Some(true)) => Some(true)
          case _ => None
        }
        case Or(l, r) => (eval(l, schema, row), eval(r, schema, row)) match {
          case (Some(true), _) | (_, Some(true)) => Some(true)
          case (Some(false), Some(false)) => Some(false)
          case _ => None
        }
        case Not(c) => eval(c, schema, row).map(!_)
        case _: AlwaysTrue => Some(true)
        case _: AlwaysFalse => Some(false)
        case other => throw new IllegalStateException(
          s"unreachable: canDeleteWhere admitted $other")
      }
    }
    var done = false
    while (!done) {
      done = GraftMemStore.tables.get(tableName) match {
        case None => throw new IllegalStateException(
          s"graftmem table $tableName not committed")
        case Some(prev) =>
          val kept = prev.rows.filterNot(r =>
            filters.forall(f => eval(f, prev.schema, r).contains(true)))
          GraftMemStore.tables.replace(tableName, prev,
            GraftMemStore.Committed(prev.schema, kept))
      }
    }
  }

  // ---- read path: range-sliced scan over the committed snapshot ----
  // The snapshot is captured ONCE here (at Scan construction) and its
  // row slices travel INSIDE the InputPartitions, so a commit landing
  // between planning and reading can never tear the read: every reader
  // decodes exactly the planned snapshot, and nothing on the executor
  // side touches the mutable registry (which also makes the read path
  // correct in a genuinely multi-process cluster, where the registry
  // singleton would not even exist on executors).
  override def newScanBuilder(options: CaseInsensitiveStringMap): ScanBuilder =
    () => new Scan with Batch {
      private val snap = GraftMemStore.tables.getOrElse(tableName,
        throw new IllegalStateException(s"graftmem table $tableName not committed"))
      override def readSchema(): StructType = snap.schema
      override def toBatch: Batch = this
      override def planInputPartitions(): Array[InputPartition] = {
        val n = snap.rows.length
        val per = math.max(1, (n + parts - 1) / parts)
        (0 until n by per).map(start =>
          MemSlice(snap.schema,
            snap.rows.slice(start, math.min(start + per, n))): InputPartition)
          .toArray
      }
      override def createReaderFactory(): PartitionReaderFactory =
        (p: InputPartition) => new PartitionReader[InternalRow] {
          private val MemSlice(schema, rows) = p.asInstanceOf[MemSlice]
          private var i = -1
          override def next(): Boolean = { i += 1; i < rows.length }
          override def get(): InternalRow =
            GraftMemStore.toInternal(rows(i), schema)
          override def close(): Unit = ()
        }
    }

  // ---- write path: task buffers -> commit messages -> atomic publish ----
  override def newWriteBuilder(info: LogicalWriteInfo): WriteBuilder =
    new WriteBuilder with SupportsTruncate {
      private var replace = false
      override def truncate(): WriteBuilder = { replace = true; this }
      override def build(): Write = new Write {
        private val doReplace = replace
        override def toBatch: BatchWrite = new BatchWrite {
          private val schema = info.schema()
          override def createBatchWriterFactory(
              pi: PhysicalWriteInfo): DataWriterFactory =
            MemWriterFactory(schema)
          override def commit(messages: Array[WriterCommitMessage]): Unit = {
            val batch = messages.flatMap(_.asInstanceOf[MemCommit].rows)
            if (doReplace) {
              // overwrite: one put publishes the whole job atomically
              GraftMemStore.tables.put(tableName,
                GraftMemStore.Committed(schema, batch))
            } else {
              // append: compare-and-swap loop so two concurrent append
              // jobs to the same table both land (a plain get-then-put
              // loses the race), and a schema-divergent append is
              // REJECTED instead of silently re-labelling the committed
              // rows with the new schema (which would mis-decode them
              // on the next read)
              var done = false
              while (!done) {
                done = GraftMemStore.tables.get(tableName) match {
                  case None =>
                    GraftMemStore.tables.putIfAbsent(tableName,
                      GraftMemStore.Committed(schema, batch)).isEmpty
                  case Some(prev) =>
                    // positional TYPE check only: decoding is driven by
                    // the committed schema's types, so a type-divergent
                    // append would mis-decode old rows — but under
                    // ACCEPT_ANY_SCHEMA incoming column NAMES may differ
                    // (e.g. an unaliased projection)
                    if (prev.schema.map(_.dataType) != schema.map(_.dataType))
                      throw new IllegalStateException(
                        s"graftmem append to $tableName: schema " +
                          s"${schema.simpleString} does not match committed " +
                          s"${prev.schema.simpleString}")
                    GraftMemStore.tables.replace(tableName, prev,
                      GraftMemStore.Committed(prev.schema, prev.rows ++ batch))
                }
              }
            }
          }
          override def abort(messages: Array[WriterCommitMessage]): Unit = ()
        }
      }
    }
}

/**
 * Minimal `TableCatalog` over the graftmem registry, so the SQL
 * row-level surface resolves: set
 * `spark.sql.catalog.<name> = graft.sources.GraftMemCatalog` and
 * `DELETE FROM <name>.t WHERE …` / `SELECT … FROM <name>.t` work on
 * tables committed through the DataFrame writer. Flat namespace (the
 * registry is flat); alter/rename are unsupported by design.
 */
class GraftMemCatalog
    extends org.apache.spark.sql.connector.catalog.TableCatalog {
  import org.apache.spark.sql.connector.catalog.{Identifier, Table => CatTable, TableChange}

  private var catName = "graftmem_cat"
  override def initialize(name: String,
      options: CaseInsensitiveStringMap): Unit = catName = name
  override def name(): String = catName

  override def listTables(namespace: Array[String]): Array[Identifier] =
    GraftMemStore.tables.keys.map(Identifier.of(Array.empty, _)).toArray

  override def tableExists(ident: Identifier): Boolean =
    GraftMemStore.tables.contains(ident.name)

  override def loadTable(ident: Identifier): CatTable = {
    if (!GraftMemStore.tables.contains(ident.name))
      throw new org.apache.spark.sql.catalyst.analysis.NoSuchTableException(
        Seq(catName, ident.name))
    new GraftMemTable(ident.name, 4)
  }

  override def createTable(ident: Identifier, schema: StructType,
      partitions: Array[Transform],
      properties: util.Map[String, String]): CatTable = {
    GraftMemStore.tables.putIfAbsent(ident.name,
      GraftMemStore.Committed(schema, Array.empty))
    new GraftMemTable(ident.name, 4)
  }

  override def alterTable(ident: Identifier, changes: TableChange*): CatTable =
    throw new UnsupportedOperationException("graftmem: ALTER not supported")

  override def dropTable(ident: Identifier): Boolean =
    GraftMemStore.tables.remove(ident.name).isDefined

  override def renameTable(old: Identifier, next: Identifier): Unit =
    throw new UnsupportedOperationException("graftmem: RENAME not supported")
}

/** A planned slice of one committed snapshot: schema + the rows
  * themselves (JVM-serializable), so readers never consult the mutable
  * registry. */
case class MemSlice(schema: StructType, rows: Array[Array[Any]])
    extends InputPartition

case class MemCommit(rows: Array[Array[Any]]) extends WriterCommitMessage

/** Row-level-rewrite writer: buffers only the committed columns. The
  * physical rows of a group-based ReplaceData carry LEADING engine
  * metadata (`__row_operation`) that `LogicalWriteInfo.schema()` does
  * NOT report (observed: schema said 3 columns, rows carried 4, and a
  * positional read stored operation codes where ids should be) — so
  * the writer skips `row.numFields - committed.length` leading slots.
  * The Dsv2SourceSpec UPDATE/MERGE value assertions break loudly if a
  * Spark upgrade ever moves the metadata elsewhere. */
case class MemProjWriterFactory(committed: StructType) extends DataWriterFactory {
  override def createWriter(partitionId: Int, taskId: Long): DataWriter[InternalRow] =
    new DataWriter[InternalRow] {
      private val buf = scala.collection.mutable.ArrayBuffer.empty[Array[Any]]
      override def write(row: InternalRow): Unit = {
        val off = row.numFields - committed.length
        val out = new Array[Any](committed.length)
        var i = 0
        while (i < committed.length) {
          val j = off + i
          out(i) =
            if (row.isNullAt(j)) null
            else committed(i).dataType match {
              case LongType => row.getLong(j)
              case IntegerType => row.getInt(j)
              case DoubleType => row.getDouble(j)
              case BooleanType => row.getBoolean(j)
              case StringType => row.getUTF8String(j).toString
              case t => throw new IllegalArgumentException(
                s"graftmem does not support ${t.catalogString}")
            }
          i += 1
        }
        buf += out
      }
      override def commit(): WriterCommitMessage = MemCommit(buf.toArray)
      override def abort(): Unit = buf.clear()
      override def close(): Unit = ()
    }
}

case class MemWriterFactory(schema: StructType) extends DataWriterFactory {
  override def createWriter(partitionId: Int, taskId: Long): DataWriter[InternalRow] =
    new DataWriter[InternalRow] {
      private val buf = scala.collection.mutable.ArrayBuffer.empty[Array[Any]]
      override def write(row: InternalRow): Unit =
        buf += GraftMemStore.toJvm(row, schema)
      override def commit(): WriterCommitMessage = MemCommit(buf.toArray)
      // a failed task discards its buffer; the job sees only committed
      // task messages, so retries cannot double-write
      override def abort(): Unit = buf.clear()
      override def close(): Unit = ()
    }
}
