package graft.sources

import java.util
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.connector.catalog.{SupportsRead, Table, TableCapability, TableProvider}
import org.apache.spark.sql.connector.expressions.Transform
import org.apache.spark.sql.connector.read.{Batch, InputPartition, PartitionReader, PartitionReaderFactory, Scan, ScanBuilder}
import org.apache.spark.sql.sources.DataSourceRegister
import org.apache.spark.sql.types.{LongType, StructField, StructType}
import org.apache.spark.sql.util.CaseInsensitiveStringMap

/** DataSource V2 connector for Kerf's AFFINE range
  * (/root/reference/presented.h:560–580: O(1)-space arithmetic sequence
  * `{length, base, imult}`) — and a working miniature of the
  * DISTRIBUTED_ARRAY_FOLIO idea (/root/reference/enums.h:263): the
  * "array" exists nowhere; each Spark partition materializes its own
  * affine slice on demand. Zero bytes of driver state beyond the three
  * parameters; N partitions of `length/N` rows each.
  *
  * Usage:
  *   spark.read.format("graft.sources.AffineRangeSource")
  *     .option("length", 1000).option("base", 3).option("imult", 2)
  *     .option("slices", 8).load()   // column: value BIGINT
  */
class AffineRangeSource extends TableProvider with DataSourceRegister {
  override def shortName(): String = "affine"
  override def inferSchema(options: CaseInsensitiveStringMap): StructType =
    AffineRangeSource.schema
  override def getTable(schema: StructType, partitioning: Array[Transform],
                        properties: util.Map[String, String]): Table = {
    // DSv2 hands getTable the case-PRESERVED map; reader options are
    // case-insensitive by contract (.option("Length", …) must not be
    // silently ignored into a length-0 table)
    val opts = new org.apache.spark.sql.util.CaseInsensitiveStringMap(properties)
    def get(k: String, dflt: String) = Option(opts.get(k)).getOrElse(dflt)
    new AffineTable(
      get("length", "0").toLong,
      get("base", "0").toLong,
      get("imult", "1").toLong,
      get("slices", "8").toInt)
  }
}

object AffineRangeSource {
  val schema: StructType = StructType(Seq(StructField("value", LongType, nullable = false)))
}

private class AffineTable(length: Long, base: Long, imult: Long, slices: Int)
    extends Table with SupportsRead {
  override def name(): String = s"affine($length,$base,$imult)"
  override def schema(): StructType = AffineRangeSource.schema
  override def capabilities(): util.Set[TableCapability] =
    util.EnumSet.of(TableCapability.BATCH_READ)
  override def newScanBuilder(options: CaseInsensitiveStringMap): ScanBuilder =
    new ScanBuilder with Scan with Batch {
      override def build(): Scan = this
      override def readSchema(): StructType = AffineRangeSource.schema
      override def toBatch: Batch = this
      override def planInputPartitions(): Array[InputPartition] = {
        val n = math.max(1, slices)
        // overflow-safe split points: `length * i` wraps for the very
        // O(1)-huge ranges this source exists for (length > MaxValue/n);
        // quotient-first keeps every term < length + n²
        def point(i: Int): Long =
          (length / n) * i + ((length % n) * i) / n
        (0 until n).map { i =>
          AffineSlice(point(i), point(i + 1), base, imult): InputPartition
        }.toArray
      }
      override def createReaderFactory(): PartitionReaderFactory =
        AffineReaderFactory
    }
}

/** One lazily-materialized slice [start, end) of the affine index set. */
case class AffineSlice(start: Long, end: Long, base: Long, imult: Long)
    extends InputPartition

private object AffineReaderFactory extends PartitionReaderFactory {
  override def createReader(partition: InputPartition): PartitionReader[InternalRow] = {
    val s = partition.asInstanceOf[AffineSlice]
    new PartitionReader[InternalRow] {
      private var i = s.start - 1
      private val row = new org.apache.spark.sql.catalyst.expressions.GenericInternalRow(1)
      override def next(): Boolean = { i += 1; i < s.end }
      override def get(): InternalRow = {
        row.setLong(0, s.base + i * s.imult); row
      }
      override def close(): Unit = ()
    }
  }
}
