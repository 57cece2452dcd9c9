package graft.sources

import java.util

import scala.jdk.CollectionConverters._

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.connector.catalog.{SupportsRead, Table, TableCapability, TableProvider}
import org.apache.spark.sql.connector.expressions.Transform
import org.apache.spark.sql.connector.read.{Batch, InputPartition, PartitionReader, PartitionReaderFactory, Scan, ScanBuilder, SupportsPushDownRequiredColumns}
import org.apache.spark.sql.sources.DataSourceRegister
import org.apache.spark.sql.types.{BinaryType, LongType, StringType, StructField, StructType}
import org.apache.spark.sql.util.CaseInsensitiveStringMap
import org.apache.spark.unsafe.types.UTF8String

/** DataSource V2 reader for MEMBER-STRUCTURED gzip archives — the
  * `.warc.gz` / `.jsonl.gz` shard layout where every record is its own
  * gzip member. `spark.read.format("warcgz").load(dir)` yields one row
  * per member: `(file, member_idx, name, n_bytes, data)`, decoded with
  * [[graft.operators.Crawl.GzipCodec]] (header flag walk, CRC32 + ISIZE
  * trailer verification) inside each partition reader.
  *
  * This is the remaining rung of the engine's Spark-extension ladder: a
  * full V2 `TableProvider` (registered under the `warcgz` short name)
  * with `SupportsPushDownRequiredColumns` — a projection that doesn't
  * touch `data` reaches the scan as a pruned ReadSchema, so the reader
  * emits only the small metadata columns and the decompressed bytes are
  * dropped at the source instead of being materialized into rows and
  * carried through the plan. (The members are still inflated once —
  * gzip's framing puts the member boundary and CRC AFTER the deflate
  * stream, so walking the archive inherently decompresses; what pruning
  * saves is the per-row buffering and everything downstream.)
  *
  * Scale: one InputPartition per shard file — the standard archive-shard
  * parallelism (members inside one file are sequential by format; files
  * across the lake scan in parallel). A corrupt archive fails its file's
  * task loudly with the codec's typed reason rather than emitting
  * partial rows.
  */
class GzipMemberSource extends TableProvider with DataSourceRegister {
  override def shortName(): String = "warcgz"

  override def inferSchema(options: CaseInsensitiveStringMap): StructType =
    GzipMemberSource.schema

  override def getTable(schema: StructType, partitioning: Array[Transform],
      properties: util.Map[String, String]): Table =
    new GzipMemberTable(properties.get("path"))
}

object GzipMemberSource {
  val schema: StructType = StructType(Seq(
    StructField("file", StringType, nullable = false),
    StructField("member_idx", LongType, nullable = false),
    StructField("name", StringType, nullable = true),
    StructField("n_bytes", LongType, nullable = false),
    StructField("data", BinaryType, nullable = false)))
}

private class GzipMemberTable(path: String) extends Table with SupportsRead {
  require(path != null, "warcgz source requires a path")
  override def name(): String = s"warcgz($path)"
  override def schema(): StructType = GzipMemberSource.schema
  override def capabilities(): util.Set[TableCapability] =
    Set(TableCapability.BATCH_READ).asJava
  override def newScanBuilder(options: CaseInsensitiveStringMap): ScanBuilder =
    new GzipScanBuilder(path)
}

private class GzipScanBuilder(path: String)
    extends ScanBuilder with SupportsPushDownRequiredColumns {
  private var required: StructType = GzipMemberSource.schema
  override def pruneColumns(requiredSchema: StructType): Unit =
    required = requiredSchema
  override def build(): Scan = new GzipScan(path, required)
}

private class GzipScan(path: String, required: StructType) extends Scan with Batch {
  override def readSchema(): StructType = required
  override def toBatch: Batch = this

  override def planInputPartitions(): Array[InputPartition] = {
    val root = new java.io.File(path)
    val files =
      if (root.isDirectory)
        Option(root.listFiles()).getOrElse(Array.empty[java.io.File])
          .filter(f => f.isFile && !f.getName.startsWith("_") &&
            !f.getName.startsWith("."))
          .sortBy(_.getName)
      else Array(root)
    files.map(f => GzipFilePartition(f.getPath): InputPartition)
  }

  override def createReaderFactory(): PartitionReaderFactory =
    new GzipReaderFactory(required)
}

private case class GzipFilePartition(path: String) extends InputPartition

private class GzipReaderFactory(required: StructType)
    extends PartitionReaderFactory {
  override def createReader(partition: InputPartition): PartitionReader[InternalRow] =
    new GzipPartitionReader(
      partition.asInstanceOf[GzipFilePartition].path, required)
}

private class GzipPartitionReader(path: String, required: StructType)
    extends PartitionReader[InternalRow] {
  import graft.operators.Crawl.GzipCodec

  private val fileName = new java.io.File(path).getName
  private lazy val members: Array[GzipCodec.Member] = {
    val bytes = java.nio.file.Files.readAllBytes(java.nio.file.Paths.get(path))
    GzipCodec.decodeMembers(bytes) match {
      case Right(ms) => ms.toArray
      case Left(reason) =>
        throw new java.io.IOException(s"warcgz $fileName: $reason")
    }
  }
  private var i = -1

  override def next(): Boolean = { i += 1; i < members.length }

  override def get(): InternalRow = {
    val m = members(i)
    InternalRow.fromSeq(required.fields.map(_.name).toSeq.map {
      case "file" => UTF8String.fromString(fileName)
      case "member_idx" => i.toLong
      case "name" => m.name.map(UTF8String.fromString).orNull
      case "n_bytes" => m.data.length.toLong
      case "data" => m.data
    })
  }

  override def close(): Unit = ()
}
