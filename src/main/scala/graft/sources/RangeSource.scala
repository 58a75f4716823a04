package graft.sources

import java.util

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.connector.catalog.{SupportsRead, Table, TableCapability, TableProvider}
import org.apache.spark.sql.connector.expressions.{NamedReference, SortDirection, SortOrder, Transform}
import org.apache.spark.sql.connector.expressions.{Literal => V2Literal}
import org.apache.spark.sql.connector.expressions.filter.Predicate
import org.apache.spark.sql.connector.read._
import org.apache.spark.sql.sources._
import org.apache.spark.sql.types._
import org.apache.spark.sql.util.CaseInsensitiveStringMap
import org.apache.spark.unsafe.types.UTF8String

/** Minimal DataSource-V2 `TableProvider` — the modern analog of the
  * reference's public data-source SPI (sources/interfaces.scala:136-197
  * TableScan/PrunedScan/PrunedFilteredScan + the Filter algebra in
  * sources/filters.scala:23-101). Exposes a deterministic synthetic table
  *
  *   id BIGINT, val BIGINT = (id*id) mod 997, label STRING = 'g' || id%10
  *
  * over `[0, n)` split into `partitions` input partitions, with BOTH
  * extension hooks a real source needs at scale:
  *
  *  - `SupportsPushDownFilters`: comparisons on `id` narrow the generated
  *    range itself (the source-side WHERE of PrunedFilteredScan) — the
  *    scan never materializes pruned rows;
  *  - `SupportsPushDownRequiredColumns`: the reader emits only the
  *    projected columns (PrunedScan).
  *
  * Usage: `spark.read.format("graft.sources.RangeSource").option("n", …)`.
  */
class RangeSource extends TableProvider {
  override def inferSchema(options: CaseInsensitiveStringMap): StructType = RangeSource.Schema
  override def getTable(schema: StructType, partitioning: Array[Transform],
      properties: util.Map[String, String]): Table =
    new GraftRangeTable(
      properties.getOrDefault("n", "1000").toLong,
      properties.getOrDefault("partitions", "4").toInt)
}

object RangeSource {
  val Schema: StructType = StructType(Seq(
    StructField("id", LongType, nullable = false),
    StructField("val", LongType, nullable = false),
    StructField("label", StringType, nullable = false)))

  def valOf(id: Long): Long = (id * id) % 997
  def labelOf(id: Long): String = "g" + (id % 10)
}

private[sources] class GraftRangeTable(n: Long, parts: Int) extends Table with SupportsRead {
  override def name(): String = s"graft_range($n)"
  override def schema(): StructType = RangeSource.Schema
  override def capabilities(): util.Set[TableCapability] =
    util.EnumSet.of(TableCapability.BATCH_READ)
  override def newScanBuilder(options: CaseInsensitiveStringMap): ScanBuilder =
    new GraftRangeScanBuilder(n, parts)
}

private[sources] class GraftRangeScanBuilder(n: Long, parts: Int) extends ScanBuilder
    with SupportsPushDownFilters with SupportsPushDownRequiredColumns
    with SupportsPushDownLimit with SupportsPushDownTopN with SupportsPushDownOffset {

  private var lo = 0L
  private var hi = n
  private var accepted: Array[Filter] = Array.empty
  private var required: StructType = RangeSource.Schema
  private var pagingNote = "" // what limit/topN/offset narrowing accepted
  private var descTopN = false

  private def idBound(v: Any): Option[Long] = v match {
    case l: Long => Some(l)
    case i: Int => Some(i.toLong)
    case s: Short => Some(s.toLong)
    case b: Byte => Some(b.toLong)
    case _ => None
  }

  /** Comparisons on `id` are FULLY handled by narrowing the generated
    * range (not returned as residual); everything else stays with Spark. */
  override def pushFilters(filters: Array[Filter]): Array[Filter] = {
    val residual = filters.filterNot {
      case EqualTo("id", v) => idBound(v).exists { b => lo = math.max(lo, b); hi = math.min(hi, b + 1); true }
      case GreaterThan("id", v) => idBound(v).exists { b => lo = math.max(lo, b + 1); true }
      case GreaterThanOrEqual("id", v) => idBound(v).exists { b => lo = math.max(lo, b); true }
      case LessThan("id", v) => idBound(v).exists { b => hi = math.min(hi, b); true }
      case LessThanOrEqual("id", v) => idBound(v).exists { b => hi = math.min(hi, b + 1); true }
      case IsNotNull("id") => true // id is never null
      case _ => false
    }
    accepted = filters.diff(residual)
    residual
  }
  override def pushedFilters(): Array[Filter] = accepted

  override def pruneColumns(requiredSchema: StructType): Unit = required = requiredSchema

  // ---- limit / top-N / offset pushdown (the V2 paging SPI): the source
  // narrows the GENERATED id range instead of materializing-then-cutting.
  // All three report partial pushdown (the default), so Spark keeps its
  // own cut on top — the source result only has to be a superset laid out
  // to make that cut cheap, which keeps every acceptance sound:
  //  - LIMIT: any `limit` rows are a legal answer → keep the lowest ids;
  //  - ORDER BY id ASC/DESC LIMIT k: the top-k ids are exactly the
  //    lowest/highest k of the surviving range;
  //  - OFFSET: dropping the lowest `offset` ids is legal both unordered
  //    (any rows may be dropped) and under ORDER BY id ASC (Spark pushes
  //    the offset only after pushing the matching top-N). Rejected after
  //    a DESC top-N, where dropped-lowest would be the wrong end.
  override def pushLimit(limit: Int): Boolean = {
    hi = math.min(hi, lo + limit)
    pagingNote += s" limit=$limit"
    true
  }

  override def pushTopN(orders: Array[SortOrder], limit: Int): Boolean = {
    val onId = orders.length == 1 && (orders(0).expression() match {
      case r: NamedReference => r.fieldNames().sameElements(Array("id"))
      case _ => false
    })
    if (!onId) return false
    if (orders(0).direction() == SortDirection.ASCENDING) hi = math.min(hi, lo + limit)
    else { lo = math.max(lo, hi - limit); descTopN = true }
    pagingNote += s" topN=${orders(0).direction()}:$limit"
    true
  }
  override def isPartiallyPushed(): Boolean = true

  override def pushOffset(offset: Int): Boolean = {
    if (descTopN) return false
    lo = math.min(hi, lo + offset)
    pagingNote += s" offset=$offset"
    true
  }

  override def build(): Scan =
    new GraftRangeScan(lo, math.max(lo, hi), parts, required, accepted, pagingNote)
}

private[sources] class GraftRangeScan(lo0: Long, hi0: Long, parts: Int,
    required: StructType, pushed: Array[Filter], pagingNote: String = "")
    extends Scan with Batch with SupportsRuntimeV2Filtering {
  private var lo = lo0
  private var hi = hi0
  override def readSchema(): StructType = required
  override def toBatch: Batch = this
  // the narrowed bounds in the plan text are the pushdown PROOF PlanSpec
  // asserts on — if pushdown regressed, the full [0,n) range would print.
  // NOTE: description() renders at plan time, BEFORE runtime filters
  // re-narrow the bounds; the runtime proof is the RuntimeFilters line.
  override def description(): String =
    s"GraftRange range=[$lo,$hi) pushed=[${pushed.mkString(", ")}]$pagingNote"

  // ---- runtime filtering (SupportsRuntimeV2Filtering): the V2 analog of
  // dynamic partition pruning — after the broadcast side of a join
  // materializes, Spark replays its join-key values into this scan as an
  // IN predicate, and the scan narrows the generated range BEFORE
  // planning splits. Narrowing to [min,max] of the IN-set is coarse but
  // sound: a runtime filter is best-effort, the join re-filters.
  override def filterAttributes(): Array[NamedReference] =
    Array(org.apache.spark.sql.connector.expressions.Expressions.column("id"))
  override def filter(predicates: Array[Predicate]): Unit =
    predicates.foreach { p =>
      if (p.name() == "IN" && p.children().nonEmpty) {
        val vals = p.children().collect { case l: V2Literal[_] => l.value() }.collect {
          case l: java.lang.Long => l.longValue()
          case i: java.lang.Integer => i.longValue()
        }
        if (vals.nonEmpty) {
          lo = math.max(lo, vals.min)
          hi = math.min(hi, vals.max + 1)
        }
      }
    }

  override def planInputPartitions(): Array[InputPartition] = {
    val total = math.max(0L, hi - lo)
    val k = math.max(1, math.min(parts.toLong, math.max(total, 1L))).toInt
    (0 until k).map { i =>
      GraftRangePartition(lo + i * total / k, lo + (i + 1) * total / k): InputPartition
    }.toArray
  }
  override def createReaderFactory(): PartitionReaderFactory =
    new GraftRangeReaderFactory(required)
}

private[sources] case class GraftRangePartition(lo: Long, hi: Long) extends InputPartition

private[sources] class GraftRangeReaderFactory(required: StructType)
    extends PartitionReaderFactory {
  override def createReader(partition: InputPartition): PartitionReader[InternalRow] = {
    val p = partition.asInstanceOf[GraftRangePartition]
    new PartitionReader[InternalRow] {
      private var cur = p.lo - 1
      override def next(): Boolean = { cur += 1; cur < p.hi }
      override def get(): InternalRow = InternalRow.fromSeq(required.fields.map { f =>
        f.name match {
          case "id" => cur
          case "val" => RangeSource.valOf(cur)
          case "label" => UTF8String.fromString(RangeSource.labelOf(cur))
        }
      }.toSeq)
      override def close(): Unit = ()
    }
  }
}
