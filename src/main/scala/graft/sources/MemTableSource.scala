package graft.sources

import java.util

import scala.collection.concurrent.TrieMap

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.{NoSuchTableException, TableAlreadyExistsException}
import org.apache.spark.sql.connector.catalog.{Identifier, SupportsDeleteV2, SupportsRead, SupportsRowLevelOperations, SupportsWrite, Table, TableCapability, TableCatalog, TableChange, TableProvider}
import org.apache.spark.sql.catalyst.expressions.GenericInternalRow
import org.apache.spark.sql.connector.expressions.{Literal, NamedReference, Transform}
import org.apache.spark.sql.connector.expressions.filter.Predicate
import org.apache.spark.sql.connector.read._
import org.apache.spark.sql.connector.write._
import org.apache.spark.sql.types._
import org.apache.spark.sql.util.CaseInsensitiveStringMap
import org.apache.spark.unsafe.types.UTF8String

/** DataSource-V2 SINK (+ read-back) — the write half of the reference's
  * public data-source SPI (sources/interfaces.scala:199-203
  * `InsertableRelation` and CreatableRelationProvider), which the read-only
  * RangeSource deliberately leaves uncovered. Implements the full V2 write
  * protocol: LogicalWriteInfo → BatchWrite → per-task DataWriter →
  * WriterCommitMessage → driver-side commit, with TRUNCATE capability for
  * SaveMode.Overwrite.
  *
  * Rows travel driver-ward inside commit messages (the V2 memory-sink
  * pattern): correct-by-construction exactly-once semantics — an aborted
  * task's rows are never committed, a retried task replaces its message.
  * A real external sink would push rows to storage in `write` and use the
  * message only as an idempotency token; the protocol surface is the same.
  *
  * Usage:
  *   df.write.format("graft.sources.MemTableSource")
  *     .option("name", "t").mode("append"|"overwrite").save()
  *   spark.read.format("graft.sources.MemTableSource").option("name", "t").load()
  */
class MemTableSource extends TableProvider {
  override def supportsExternalMetadata(): Boolean = true

  override def inferSchema(options: CaseInsensitiveStringMap): StructType =
    MemTableStore.schemaOf(options.get("name")) // read-back path

  override def getTable(schema: StructType, partitioning: Array[Transform],
      properties: util.Map[String, String]): Table =
    new MemTable(properties.get("name"), schema)
}

/** JVM-global store: table key → (schema, committed rows).
  *
  * Keys are CANONICAL IDENTIFIER keys (r15 ADVICE: the store used to key
  * by `ident.name()` alone, so `ns1.t` and `ns2.t` collided and a
  * cross-namespace rename silently "succeeded" by bare name): namespace
  * segments + name joined by a NUL separator no SQL identifier can
  * contain — so `a.b` in the empty namespace can never collide with name
  * `b` in namespace `a` either. The empty namespace's key is the bare
  * name, which keeps the format-API path (`option("name", "t")`, no
  * namespace concept) interoperable with `graftmem.t` SQL exactly as
  * before. */
object MemTableStore {
  private val tables = TrieMap.empty[String, (StructType, Vector[Seq[Any]])]

  private val Sep = "\u0000"

  /** Canonical store key for a (possibly namespaced) identifier. */
  def key(ident: Identifier): String =
    (ident.namespace() :+ ident.name()).mkString(Sep)

  /** Human-readable form of a store key (for Table.name()). */
  def display(storeKey: String): String = storeKey.replace(Sep, ".")

  def schemaOf(name: String): StructType =
    tables.get(name).map(_._1)
      .getOrElse(throw new IllegalArgumentException(s"mem table '$name' not written yet"))

  def rowsOf(name: String): Vector[Seq[Any]] = tables.get(name).map(_._2).getOrElse(Vector.empty)

  def truncate(name: String, schema: StructType): Unit = tables.put(name, (schema, Vector.empty)): Unit

  def append(name: String, schema: StructType, rows: Seq[Seq[Any]]): Unit =
    tables.synchronized {
      val cur = tables.get(name).map(_._2).getOrElse(Vector.empty)
      tables.put(name, (schema, cur ++ rows)): Unit
    }

  def deleteWhere(name: String, pred: Seq[Any] => Boolean): Unit =
    tables.synchronized {
      tables.get(name).foreach { case (schema, rows) =>
        tables.put(name, (schema, rows.filterNot(pred))): Unit
      }
    }

  def names: Seq[String] = tables.keys.toSeq.sorted

  /** Last-segment names of the tables living EXACTLY in `namespace`
    * (not in namespaces nested below it). */
  def namesIn(namespace: Array[String]): Seq[String] = {
    val prefix = if (namespace.isEmpty) "" else namespace.mkString("", Sep, Sep)
    names.collect {
      case k if k.startsWith(prefix) && !k.drop(prefix.length).contains(Sep) =>
        k.drop(prefix.length)
    }
  }

  def drop(name: String): Boolean = tables.remove(name).isDefined

  /** Schema evolution: append a column, padding existing rows with null
    * (the add-column contract MERGE WITH SCHEMA EVOLUTION relies on). */
  def addColumn(name: String, field: StructField): Unit =
    tables.synchronized {
      tables.get(name).foreach { case (schema, rows) =>
        if (!schema.fieldNames.contains(field.name))
          tables.put(name, (schema.add(field), rows.map(_ :+ null))): Unit
      }
    }

  /** Rename one column in place — data untouched, field order kept (the
    * v2 RENAME COLUMN contract the rename_column goldens exercise). */
  def renameColumn(name: String, from: String, to: String): Unit =
    tables.synchronized {
      tables.get(name).foreach { case (schema, rows) =>
        require(schema.fieldNames.contains(from), s"no column '$from' in '$name'")
        require(!schema.fieldNames.contains(to), s"column '$to' already exists")
        val ns = StructType(schema.fields.map(f =>
          if (f.name == from) f.copy(name = to) else f))
        tables.put(name, (ns, rows)): Unit
      }
    }

  private def ident(name: String): Identifier =
    Identifier.of(Array.empty[String], name)

  /** Table rename: existence checks and the move happen atomically under
    * the store lock, throwing the TYPED catalog errors the TableCatalog
    * contract promises — a check in MemCatalog followed by a mutation
    * here would let a concurrent racer see a bare require failure.
    * Errors carry the CALLER'S identifiers, so a namespaced lookup's
    * message names the path the user wrote, not a bare table name
    * (r14 review finding); lookups use the FULL identifier key, so a
    * cross-namespace rename moves the table rather than colliding with
    * (or "finding") an unrelated same-named table (r15 ADVICE). */
  def renameTable(from: Identifier, to: Identifier): Unit =
    tables.synchronized {
      if (!tables.contains(key(from)))
        throw new NoSuchTableException(from)
      if (tables.contains(key(to)))
        throw new TableAlreadyExistsException(to)
      tables.remove(key(from)).foreach(v => tables.put(key(to), v): Unit)
    }

  def renameTable(from: String, to: String): Unit =
    renameTable(ident(from), ident(to))

  /** Metadata-only CREATE (the SQL `CREATE TABLE cat.t (…)` path —
    * distinct from the format-API write path, which creates on write).
    * Check-and-put is atomic under the lock; an existing target is the
    * typed TABLE_OR_VIEW_ALREADY_EXISTS error carrying the caller's
    * identifier (see renameTable). */
  def create(tableIdent: Identifier, schema: StructType): Unit =
    tables.synchronized {
      if (tables.contains(key(tableIdent)))
        throw new TableAlreadyExistsException(tableIdent)
      tables.put(key(tableIdent), (schema, Vector.empty)): Unit
    }

  def create(name: String, schema: StructType): Unit =
    create(ident(name), schema)
}

/** Driver-side evaluator for the connector Predicates a DELETE WHERE
  * clause translates to — comparisons between one column and one
  * literal, plus AND/OR/NOT over them. Anything else is rejected by
  * canDeleteWhere, making unsupported deletes an analysis-time error
  * rather than a wrong result. */
object MemPredicates {
  private def colIndex(p: Predicate, schema: StructType): Option[Int] =
    p.children().collectFirst { case f: NamedReference =>
      schema.fieldIndex(f.fieldNames().last)
    }
  private def literal(p: Predicate): Option[Any] =
    p.children().collectFirst { case l: Literal[_] => l.value() }

  private def asDouble(v: Any): Option[Double] = v match {
    case n: Number => Some(n.doubleValue())
    case _ => None
  }

  def evaluable(p: Predicate, schema: StructType): Boolean = p.name() match {
    case "AND" | "OR" => p.children().forall {
      case c: Predicate => evaluable(c, schema); case _ => false
    }
    case "NOT" => p.children().forall {
      case c: Predicate => evaluable(c, schema); case _ => false
    }
    case "=" | "<" | "<=" | ">" | ">=" | "<>" =>
      colIndex(p, schema).isDefined && literal(p).isDefined &&
        // comparisons are evaluated numerically or as strings
        p.children().length == 2 &&
        p.children()(0).isInstanceOf[NamedReference] // column op literal order
    case "IS_NULL" | "IS_NOT_NULL" => colIndex(p, schema).isDefined
    case _ => false
  }

  def eval(p: Predicate, schema: StructType, row: Seq[Any]): Boolean = p.name() match {
    case "AND" => p.children().forall { case c: Predicate => eval(c, schema, row) }
    case "OR" => p.children().exists { case c: Predicate => eval(c, schema, row) }
    case "NOT" => !p.children().forall { case c: Predicate => eval(c, schema, row) }
    case "IS_NULL" => row(colIndex(p, schema).get) == null
    case "IS_NOT_NULL" => row(colIndex(p, schema).get) != null
    case op =>
      val v = row(colIndex(p, schema).get)
      val lit = literal(p).get
      val cmp: Option[Int] = (asDouble(v), asDouble(lit)) match {
        case (Some(a), Some(b)) => Some(java.lang.Double.compare(a, b))
        case _ => (v, lit) match {
          case (a: String, b: UTF8String) => Some(a.compareTo(b.toString))
          case (a: String, b: String) => Some(a.compareTo(b))
          case _ => None
        }
      }
      cmp match {
        case None => false
        case Some(c) => op match {
          case "=" => c == 0
          case "<>" => c != 0
          case "<" => c < 0
          case "<=" => c <= 0
          case ">" => c > 0
          case ">=" => c >= 0
          case _ => false
        }
      }
  }
}

/** Minimal V2 TableCatalog over MemTableStore — just enough surface to
  * address mem tables from SQL DML (`DELETE FROM graftmem.t WHERE …`).
  * Tables are created by the format-API write path; the catalog only
  * resolves them. */
class MemCatalog extends TableCatalog {
  private var cname: String = _
  override def initialize(name: String, options: CaseInsensitiveStringMap): Unit =
    cname = name
  override def name(): String = cname
  override def listTables(namespace: Array[String]): Array[Identifier] =
    // list only the requested namespace — keys are canonical, so the
    // namespace is decodable from the key itself
    MemTableStore.namesIn(namespace).map(Identifier.of(namespace, _)).toArray
  override def loadTable(ident: Identifier): Table = {
    val k = MemTableStore.key(ident)
    if (!MemTableStore.names.contains(k)) throw new NoSuchTableException(ident)
    new MemTable(k, MemTableStore.schemaOf(k))
  }
  override def createTable(ident: Identifier, schema: StructType,
      partitions: Array[Transform], properties: util.Map[String, String]): Table = {
    // SQL CREATE TABLE path; partition transforms stay loudly
    // unsupported (mem tables are a single unpartitioned buffer)
    if (partitions.nonEmpty) throw new UnsupportedOperationException(
      "mem tables do not support partition transforms")
    // TableCatalog contract: an existing target is the typed catalog
    // error (TABLE_OR_VIEW_ALREADY_EXISTS) — thrown ATOMICALLY inside
    // the store lock, so a concurrent racer gets the typed error too
    MemTableStore.create(ident, schema)
    new MemTable(MemTableStore.key(ident), schema)
  }
  override def alterTable(ident: Identifier, changes: TableChange*): Table = {
    // the schema-evolution changes the goldens exercise (AddColumn for
    // MERGE WITH SCHEMA EVOLUTION, RenameColumn for the rename_column
    // family); everything else stays loudly unsupported
    changes.foreach {
      case add: TableChange.AddColumn if add.fieldNames().length == 1 =>
        MemTableStore.addColumn(MemTableStore.key(ident),
          StructField(add.fieldNames().head, add.dataType(), nullable = true))
      case ren: TableChange.RenameColumn if ren.fieldNames().length == 1 =>
        MemTableStore.renameColumn(MemTableStore.key(ident),
          ren.fieldNames().head, ren.newName())
      case other => throw new UnsupportedOperationException(
        s"ALTER change not supported: $other")
    }
    loadTable(ident)
  }
  override def dropTable(ident: Identifier): Boolean =
    MemTableStore.drop(MemTableStore.key(ident))
  override def renameTable(oldIdent: Identifier, newIdent: Identifier): Unit =
    // typed NoSuchTable/TableAlreadyExists errors thrown atomically
    // under the store lock (see MemTableStore.renameTable)
    MemTableStore.renameTable(oldIdent, newIdent)
  override def tableExists(ident: Identifier): Boolean =
    MemTableStore.names.contains(MemTableStore.key(ident))
}

final class MemTable(tname: String, tschema: StructType)
    extends Table with SupportsRead with SupportsWrite with SupportsDeleteV2
    with SupportsRowLevelOperations {
  require(tname != null && tname.nonEmpty, "option 'name' is required")
  // tname may be a canonical store key (catalog path) — display it dotted
  override def name(): String = s"memtable:${MemTableStore.display(tname)}"
  override def schema(): StructType = tschema
  override def capabilities(): util.Set[TableCapability] =
    util.EnumSet.of(TableCapability.BATCH_READ, TableCapability.BATCH_WRITE,
      TableCapability.TRUNCATE,
      // opt-in for MERGE WITH SCHEMA EVOLUTION: the engine may ALTER
      // this table (AddColumn via MemCatalog) to absorb source columns
      TableCapability.AUTOMATIC_SCHEMA_EVOLUTION)

  // ---- row-level DELETE (SupportsDeleteV2): the engine translates the
  // SQL WHERE into connector Predicates; the source filters its own
  // storage. canDeleteWhere rejects anything the evaluator can't prove;
  // with SupportsRowLevelOperations also present (below), the engine
  // then falls back to the group-based rewrite instead of erroring —
  // metadata-only delete when provable, copy-on-write otherwise.
  override def canDeleteWhere(predicates: Array[Predicate]): Boolean =
    predicates.forall(p => MemPredicates.evaluable(p, tschema))
  override def deleteWhere(predicates: Array[Predicate]): Unit =
    MemTableStore.deleteWhere(tname, row =>
      predicates.forall(p => MemPredicates.eval(p, tschema, row)))

  // ---- row-level MERGE / UPDATE (SupportsRowLevelOperations): the
  // GROUP-BASED (copy-on-write) protocol — Spark rewrites MERGE/UPDATE
  // into a join of this operation's scan against the source, computes
  // every row the affected groups should contain afterwards, and hands
  // them to this operation's write, which REPLACES the groups. This
  // table's replacement granularity is the whole table (one group), so
  // the commit is truncate + append-all — the same contract an
  // Iceberg-style lake table implements per-file. No SupportsDelta, so
  // Spark must (and does) route through the group-based rewrite.
  override def newRowLevelOperationBuilder(
      info: RowLevelOperationInfo): RowLevelOperationBuilder =
    new RowLevelOperationBuilder {
      override def build(): RowLevelOperation = new RowLevelOperation {
        override def command(): RowLevelOperation.Command = info.command()
        // scan of the existing data = the one replacement group
        override def newScanBuilder(options: CaseInsensitiveStringMap): ScanBuilder =
          MemTable.this.newScanBuilder(options)
        // replacement write: commit atomically swaps the table contents
        override def newWriteBuilder(winfo: LogicalWriteInfo): WriteBuilder =
          new WriteBuilder {
            override def build(): Write = new Write {
              override def toBatch: BatchWrite = new BatchWrite {
                override def createBatchWriterFactory(
                    pinfo: PhysicalWriteInfo): DataWriterFactory =
                  new MemWriterFactory(winfo.schema())
                override def commit(messages: Array[WriterCommitMessage]): Unit = {
                  MemTableStore.truncate(tname, winfo.schema())
                  messages.foreach { case m: MemCommitMessage =>
                    MemTableStore.append(tname, winfo.schema(), m.rows)
                  }
                }
                override def abort(messages: Array[WriterCommitMessage]): Unit = ()
              }
            }
          }
      }
    }

  // ---- read side: one partition per committed chunk is pointless — a
  // single partition of the (small, driver-held) buffer; a real source
  // would split here.
  override def newScanBuilder(options: CaseInsensitiveStringMap): ScanBuilder =
    new ScanBuilder {
      override def build(): Scan = new Scan {
        override def readSchema(): StructType = MemTableStore.schemaOf(tname)
        override def toBatch: Batch = new Batch {
          override def planInputPartitions(): Array[InputPartition] =
            Array(new InputPartition {})
          override def createReaderFactory(): PartitionReaderFactory = {
            val rows = MemTableStore.rowsOf(tname)
            val sch = MemTableStore.schemaOf(tname)
            new MemReaderFactory(rows, sch)
          }
        }
      }
    }

  // ---- write side: the full V2 protocol.
  override def newWriteBuilder(info: LogicalWriteInfo): WriteBuilder =
    new WriteBuilder with SupportsTruncate {
      private var doTruncate = false
      override def truncate(): WriteBuilder = { doTruncate = true; this }
      override def build(): Write = new Write {
        override def toBatch: BatchWrite = new BatchWrite {
          override def createBatchWriterFactory(pinfo: PhysicalWriteInfo): DataWriterFactory =
            new MemWriterFactory(info.schema())
          override def commit(messages: Array[WriterCommitMessage]): Unit = {
            if (doTruncate) MemTableStore.truncate(tname, info.schema())
            messages.foreach { case m: MemCommitMessage =>
              MemTableStore.append(tname, info.schema(), m.rows)
            }
          }
          override def abort(messages: Array[WriterCommitMessage]): Unit = ()
        }
      }
    }

  override def toString: String = name()
}

final case class MemCommitMessage(rows: Seq[Seq[Any]]) extends WriterCommitMessage

final class MemWriterFactory(schema: StructType) extends DataWriterFactory {
  override def createWriter(partitionId: Int, taskId: Long): DataWriter[InternalRow] =
    new DataWriter[InternalRow] {
      private val buf = Vector.newBuilder[Seq[Any]]
      override def write(record: InternalRow): Unit = {
        // Group-based row-level writes (ReplaceDataExec) prefix each row
        // with the __row_operation marker (RowDeltaUtils.OPERATION_COLUMN)
        // when the operation requested no metadata columns — Spark only
        // strips it via the data projection on the metadata path. Every
        // row handed to a replace-data write is a keep row, so the marker
        // is skipped, not interpreted.
        val off = record.numFields - schema.fields.length
        buf += schema.fields.zipWithIndex.map { case (f, i) =>
          val v = record.get(i + off, f.dataType)
          // Spark REUSES the incoming UnsafeRow across write() calls, and
          // get() returns VIEWS into its buffer for string/array/map/struct
          // values — buffering a view would silently alias every row to the
          // last one. Strings become JVM strings; nested catalyst values
          // are deep-copied.
          v match {
            case s: UTF8String => s.toString
            case a: org.apache.spark.sql.catalyst.util.ArrayData => a.copy()
            case m: org.apache.spark.sql.catalyst.util.MapData => m.copy()
            case r: InternalRow => r.copy()
            case other => other
          }
        }.toSeq
      }
      override def commit(): WriterCommitMessage = MemCommitMessage(buf.result())
      override def abort(): Unit = ()
      override def close(): Unit = ()
    }
}

final class MemReaderFactory(rows: Vector[Seq[Any]], schema: StructType)
    extends PartitionReaderFactory {
  override def createReader(partition: InputPartition): PartitionReader[InternalRow] =
    new PartitionReader[InternalRow] {
      private val it = rows.iterator
      private var cur: InternalRow = _
      override def next(): Boolean = {
        if (!it.hasNext) return false
        val r = it.next()
        cur = new GenericInternalRow(r.zip(schema.fields).map {
          case (s: String, _) => UTF8String.fromString(s)
          case (v, _) => v.asInstanceOf[AnyRef]
        }.toArray[Any])
        true
      }
      override def get(): InternalRow = cur
      override def close(): Unit = ()
    }
}
