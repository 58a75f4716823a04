package graft.sources

import java.util

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.connector.catalog.{SupportsRead, Table, TableCapability, TableProvider}
import org.apache.spark.sql.connector.expressions.Transform
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
    with SupportsPushDownFilters with SupportsPushDownRequiredColumns {

  private var lo = 0L
  private var hi = n
  private var accepted: Array[Filter] = Array.empty
  private var required: StructType = RangeSource.Schema

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

  override def build(): Scan = new GraftRangeScan(lo, math.max(lo, hi), parts, required, accepted)
}

private[sources] class GraftRangeScan(lo: Long, hi: Long, parts: Int,
    required: StructType, pushed: Array[Filter]) extends Scan with Batch {
  override def readSchema(): StructType = required
  override def toBatch: Batch = this
  // the narrowed bounds in the plan text are the pushdown PROOF PlanSpec
  // asserts on — if pushdown regressed, the full [0,n) range would print
  override def description(): String =
    s"GraftRange range=[$lo,$hi) pushed=[${pushed.mkString(", ")}]"

  override def planInputPartitions(): Array[InputPartition] = {
    val total = hi - lo
    val k = math.max(1, math.min(parts.toLong, total)).toInt
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
