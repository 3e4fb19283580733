package graft.sources

import java.util

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.connector.catalog.{SupportsRead, Table, TableCapability, TableProvider}
import org.apache.spark.sql.connector.expressions.Transform
import org.apache.spark.sql.connector.read._
import org.apache.spark.sql.types._
import org.apache.spark.sql.util.CaseInsensitiveStringMap
import org.apache.spark.unsafe.types.UTF8String

/** DataSource V2 `TableProvider` exposing the WAQI feed as a real
  * Spark table (SURVEY.md §7.3 "WAQI HTTP source as a real table"):
  *
  * {{{
  *   spark.read.format("graft.sources.WaqiTableProvider").load()
  *   // => (city string, raw string), one row per city payload
  * }}}
  *
  * One input partition PER CITY: on a cluster each partition's
  * `PartitionReader` is where the HTTP GET for its city would run
  * (executor-side, parallel — unlike the reference's sequential
  * driver-side loop, my_data_pipeline.py:78,155). This container has
  * no egress, so the reader serves the canned [[WaqiFixtures]]
  * payloads; the fetch call is the single marked line in
  * [[WaqiPartitionReader.next]].
  */
class WaqiTableProvider extends TableProvider {

  override def inferSchema(options: CaseInsensitiveStringMap): StructType =
    WaqiTableProvider.schema

  override def getTable(schema: StructType, partitioning: Array[Transform],
      properties: util.Map[String, String]): Table = new WaqiTable
}

object WaqiTableProvider {
  val schema: StructType = StructType(Seq(
    StructField("city", StringType, nullable = false),
    StructField("raw", StringType, nullable = false)))
}

final class WaqiTable extends Table with SupportsRead {
  override def name(): String = "waqi"
  override def schema(): StructType = WaqiTableProvider.schema
  override def capabilities(): util.Set[TableCapability] =
    util.EnumSet.of(TableCapability.BATCH_READ)

  override def newScanBuilder(options: CaseInsensitiveStringMap)
      : ScanBuilder = new ScanBuilder with Scan with Batch {
    override def build(): Scan = this
    override def readSchema(): StructType = WaqiTableProvider.schema
    override def toBatch: Batch = this

    override def planInputPartitions(): Array[InputPartition] =
      WaqiFixtures.all.map { case (city, raw) =>
        WaqiInputPartition(city, raw): InputPartition
      }.toArray

    override def createReaderFactory(): PartitionReaderFactory =
      new PartitionReaderFactory {
        override def createReader(p: InputPartition)
            : PartitionReader[InternalRow] =
          new WaqiPartitionReader(p.asInstanceOf[WaqiInputPartition])
      }
  }
}

/** One (city, payload) unit of work; serialized to executors. */
final case class WaqiInputPartition(city: String, raw: String)
    extends InputPartition

final class WaqiPartitionReader(p: WaqiInputPartition)
    extends PartitionReader[InternalRow] {
  private var consumed = false

  override def next(): Boolean =
    if (consumed) false
    else {
      // REAL IMPLEMENTATION: HTTP GET api.waqi.info/feed/{p.city} here
      // (executor-side). Zero-egress container => canned payload.
      consumed = true
      true
    }

  override def get(): InternalRow =
    InternalRow(UTF8String.fromString(p.city), UTF8String.fromString(p.raw))

  override def close(): Unit = ()
}
