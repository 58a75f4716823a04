package graft.sources

import java.util

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.GenericInternalRow
import org.apache.spark.sql.connector.catalog.{SupportsRead, Table, TableCapability, TableProvider}
import org.apache.spark.sql.connector.expressions.{Expressions, Transform}
import org.apache.spark.sql.connector.read._
import org.apache.spark.sql.connector.read.partitioning.{KeyGroupedPartitioning, Partitioning}
import org.apache.spark.sql.types._
import org.apache.spark.sql.util.CaseInsensitiveStringMap
import org.apache.spark.unsafe.types.UTF8String

/** DataSource-V2 source that REPORTS ITS PARTITIONING — the
  * storage-partitioned-join (SPJ) half of the V2 SPI that the in-tree
  * bucketed-parquet path (`src_bucketed_join`) cannot exercise: a
  * connector whose data is already laid out by key (an Iceberg/Delta-style
  * table, a sharded KV store, a pre-bucketed lake) declares
  * `KeyGroupedPartitioning` over its `HasPartitionKey` splits, and Spark's
  * `EnsureRequirements` elides BOTH shuffles when two such tables join on
  * the partition key (requires `spark.sql.sources.v2.bucketing.enabled`).
  *
  * At 100 TB this is the difference between a fact-fact join that moves
  * both tables over the network and one that moves nothing: the join
  * becomes a per-key zip of co-located splits. The reference's
  * sources/interfaces.scala SPI (Spark 1.3) has no partitioning report at
  * all — every external-source join shuffles; this is the modern contract
  * a migrating user gains.
  *
  * Data is generated deterministically from the key so the DuckDB oracle
  * can restate it with generate_series (no files involved):
  *   fact: for k in 0..7, rows (k, v = k*31 + i) for i in 0..k+2
  *   dim:  for k in 0..7, one row (k, label = 'key_' || k)
  */
class KeyedSource extends TableProvider {
  override def supportsExternalMetadata(): Boolean = false

  override def inferSchema(options: CaseInsensitiveStringMap): StructType =
    KeyedSource.schemaFor(options.get("side"))

  override def getTable(schema: StructType, partitioning: Array[Transform],
      properties: util.Map[String, String]): Table =
    new KeyedTable(properties.get("side"))
}

object KeyedSource {
  val NumKeys = 8

  def schemaFor(side: String): StructType = side match {
    case "dim" => StructType(Seq(
      StructField("k", IntegerType, nullable = false),
      StructField("label", StringType, nullable = false)))
    case _ => StructType(Seq(
      StructField("k", IntegerType, nullable = false),
      StructField("v", LongType, nullable = false)))
  }

  /** Rows of one key-partition, as catalyst values. */
  def rowsFor(side: String, k: Int): Seq[Array[Any]] = side match {
    case "dim" => Seq(Array[Any](k, UTF8String.fromString(s"key_$k")))
    case _ => (0 to k + 2).map(i => Array[Any](k, (k * 31 + i).toLong))
  }
}

final class KeyedTable(side: String) extends Table with SupportsRead {
  override def name(): String = s"keyed:$side"
  override def schema(): StructType = KeyedSource.schemaFor(side)
  override def capabilities(): util.Set[TableCapability] =
    util.EnumSet.of(TableCapability.BATCH_READ)

  override def newScanBuilder(options: CaseInsensitiveStringMap): ScanBuilder =
    new ScanBuilder {
      override def build(): Scan = new KeyedScan(side)
    }
}

/** One split per key value; the scan reports KeyGroupedPartitioning(k). */
final class KeyedScan(side: String) extends Scan with Batch
    with SupportsReportPartitioning {
  override def readSchema(): StructType = KeyedSource.schemaFor(side)
  override def toBatch: Batch = this

  override def outputPartitioning(): Partitioning =
    new KeyGroupedPartitioning(
      Array(Expressions.identity("k")), KeyedSource.NumKeys)

  override def planInputPartitions(): Array[InputPartition] =
    (0 until KeyedSource.NumKeys).map(k => KeyedPartition(side, k): InputPartition).toArray

  override def createReaderFactory(): PartitionReaderFactory = new KeyedReaderFactory
}

/** A split that knows its key — HasPartitionKey is what lets Spark line
  * up the two sides split-by-split without a shuffle. */
final case class KeyedPartition(side: String, k: Int)
    extends InputPartition with HasPartitionKey {
  override def partitionKey(): InternalRow = new GenericInternalRow(Array[Any](k))
}

final class KeyedReaderFactory extends PartitionReaderFactory {
  override def createReader(partition: InputPartition): PartitionReader[InternalRow] = {
    val p = partition.asInstanceOf[KeyedPartition]
    new PartitionReader[InternalRow] {
      private val it = KeyedSource.rowsFor(p.side, p.k).iterator
      private var cur: InternalRow = _
      override def next(): Boolean = {
        if (!it.hasNext) return false
        cur = new GenericInternalRow(it.next())
        true
      }
      override def get(): InternalRow = cur
      override def close(): Unit = ()
    }
  }
}
