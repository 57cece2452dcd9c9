package graft.sources

import java.util

import scala.jdk.CollectionConverters._

import org.apache.hadoop.fs.{FileStatus, Path}
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.connector.catalog.{SupportsRead, Table, TableCapability, TableProvider}
import org.apache.spark.sql.connector.expressions.Transform
import org.apache.spark.sql.connector.read.{Batch, InputPartition, PartitionReader, PartitionReaderFactory, Scan, ScanBuilder, SupportsPushDownFilters, SupportsPushDownRequiredColumns}
import org.apache.spark.sql.sources.{DataSourceRegister, EqualTo, Filter, In, StringStartsWith}
import org.apache.spark.sql.types.{BinaryType, LongType, StringType, StructField, StructType}
import org.apache.spark.sql.util.CaseInsensitiveStringMap
import org.apache.spark.unsafe.types.UTF8String

/** DataSource V2 reader for MEMBER-STRUCTURED gzip archives — the
  * `.warc.gz` / `.jsonl.gz` shard layout where every record is its own
  * gzip member. `spark.read.format("warcgz").load(dir)` yields one row
  * per member: `(file, member_idx, name, n_bytes, data)`, decoded with
  * [[graft.operators.Crawl.GzipCodec.MemberIterator]] — ONE member is
  * inflated, CRC32 + ISIZE-verified, emitted, and released per `next()`,
  * over a streamed Hadoop `FSDataInputStream`. Peak task memory is one
  * member plus a fixed 64 KB read window, never the inflated shard, so
  * real CommonCrawl-sized shards (~1 GB gz, several GB inflated) read in
  * bounded memory.
  *
  * Paths resolve through the Hadoop `FileSystem` API with the session's
  * Hadoop configuration, so `hdfs://` / object-store URIs work exactly
  * like local directories (the reference's source is a remote object
  * store, `dags/daily_search_history.py:40`).
  *
  * Pushdown, both V2 mixins:
  *  - `SupportsPushDownRequiredColumns`: a projection that doesn't touch
  *    `data` reaches the scan as a pruned ReadSchema, so the reader emits
  *    only the small metadata columns and the decompressed bytes are
  *    dropped at the source. (Members are still inflated once — gzip's
  *    framing puts the member boundary and CRC AFTER the deflate stream,
  *    so walking the archive inherently decompresses; pruning saves the
  *    per-row buffering and everything downstream.)
  *  - `SupportsPushDownFilters`: `file` equality / IN / prefix predicates
  *    prune at PLANNING time — a single-shard probe opens ONE file
  *    instead of listing every shard into tasks. The predicates are also
  *    kept as residuals (Spark re-evaluates them post-scan), so pruning
  *    is purely an optimization and can never change results.
  *
  * Scale: one InputPartition per shard file — the standard archive-shard
  * parallelism (members inside one file are sequential by format; files
  * across the lake scan in parallel). A zero-length file is an EMPTY
  * shard (zero members), not an error — an empty partition of a
  * distributed shard writer produces exactly that. A corrupt archive
  * fails its file's task loudly with the codec's typed reason rather
  * than emitting partial rows — unless `.option("salvage", "true")` is
  * set, in which case a corrupt member ENDS THAT FILE's contribution at
  * the last verified member boundary (the
  * [[graft.operators.Crawl.GzipCodec.salvageIterator]] contract, lifted
  * to the streamed reader). Salvage mode is what a continuous crawl
  * ingest runs: one rotten shard in a landing directory must cost its
  * own tail, not poison every replay of the micro-batch that lists it.
  */
class GzipMemberSource extends TableProvider with DataSourceRegister {
  override def shortName(): String = "warcgz"

  override def inferSchema(options: CaseInsensitiveStringMap): StructType =
    GzipMemberSource.schema

  override def getTable(schema: StructType, partitioning: Array[Transform],
      properties: util.Map[String, String]): Table =
    new GzipMemberTable(GzipMemberSource.resolvePaths(properties))
}

object GzipMemberSource {
  /** `load(p)` arrives as `path`; `load(p1, p2, ...)` as a JSON-encoded
    * `paths` array (the DataFrameReader convention) — accept both, so a
    * foreachBatch can hand the source exactly the shard files of one
    * micro-batch.
    */
  private[sources] def resolvePaths(
      properties: util.Map[String, String]): Seq[String] = {
    val multi = Option(properties.get("paths")).map { json =>
      new com.fasterxml.jackson.databind.ObjectMapper()
        .readValue(json, classOf[Array[String]]).toSeq
    }.getOrElse(Seq.empty)
    val all = multi ++ Option(properties.get("path")).toSeq
    require(all.nonEmpty, "warcgz source requires a path")
    all
  }

  val schema: StructType = StructType(Seq(
    StructField("file", StringType, nullable = false),
    StructField("member_idx", LongType, nullable = false),
    StructField("name", StringType, nullable = true),
    StructField("n_bytes", LongType, nullable = false),
    StructField("data", BinaryType, nullable = false)))
}

/** Java-serializable Hadoop `Configuration` carrier (the stock class is
  * `Writable` but not `Serializable`) — ships the session's Hadoop conf
  * from the driver's scan to executor-side partition readers so remote
  * filesystems resolve with the same credentials/settings.
  */
private[graft] class SerializableHadoopConf(
    @transient var value: org.apache.hadoop.conf.Configuration)
    extends java.io.Serializable {
  private def writeObject(out: java.io.ObjectOutputStream): Unit = {
    out.defaultWriteObject()
    value.write(out)
  }
  private def readObject(in: java.io.ObjectInputStream): Unit = {
    in.defaultReadObject()
    value = new org.apache.hadoop.conf.Configuration(false)
    value.readFields(in)
  }
}

private class GzipMemberTable(paths: Seq[String]) extends Table with SupportsRead {
  override def name(): String = s"warcgz(${paths.mkString(",")})"
  override def schema(): StructType = GzipMemberSource.schema
  override def capabilities(): util.Set[TableCapability] =
    Set(TableCapability.BATCH_READ).asJava
  override def newScanBuilder(options: CaseInsensitiveStringMap): ScanBuilder =
    new GzipScanBuilder(paths, options.getBoolean("salvage", false))
}

private class GzipScanBuilder(paths: Seq[String], salvage: Boolean)
    extends ScanBuilder with SupportsPushDownRequiredColumns
    with SupportsPushDownFilters {
  private var required: StructType = GzipMemberSource.schema
  private var pushed: Array[Filter] = Array.empty

  override def pruneColumns(requiredSchema: StructType): Unit =
    required = requiredSchema

  /** Accept `file` predicates the planner can prune shard files with;
    * everything (accepted included) is returned as residual so Spark
    * keeps the authoritative post-scan evaluation.
    */
  override def pushFilters(filters: Array[Filter]): Array[Filter] = {
    pushed = filters.filter {
      case EqualTo("file", _: String) => true
      case In("file", vs) => vs.forall(_.isInstanceOf[String])
      case StringStartsWith("file", _) => true
      case _ => false
    }
    filters
  }

  override def pushedFilters(): Array[Filter] = pushed

  override def build(): Scan = new GzipScan(paths, required, pushed, salvage)
}

private class GzipScan(paths: Seq[String], required: StructType,
    pushed: Array[Filter], salvage: Boolean) extends Scan with Batch {
  override def readSchema(): StructType = required
  override def toBatch: Batch = this

  // captured at planning time on the driver; serialized to readers
  private val conf = new SerializableHadoopConf(
    SparkSession.active.sessionState.newHadoopConf())

  private def fileMatches(name: String): Boolean =
    pushed.forall {
      case EqualTo("file", v: String) => name == v
      case In("file", vs) => vs.exists(_ == name)
      case StringStartsWith("file", p) => name.startsWith(p)
      case _ => true
    }

  override def planInputPartitions(): Array[InputPartition] =
    paths.toArray.flatMap { p =>
      val root = new Path(p)
      val fs = root.getFileSystem(conf.value)
      val status = fs.getFileStatus(root)
      val files: Array[FileStatus] =
        if (status.isDirectory)
          fs.listStatus(root)
            .filter(st => st.isFile && !st.getPath.getName.startsWith("_") &&
              !st.getPath.getName.startsWith("."))
            .sortBy(_.getPath.getName)
        else Array(status)
      files
        // zero-length file = empty shard (zero members): planning it away
        // is both the correct semantics and one less task
        .filter(_.getLen > 0)
        // file-predicate pruning: a pruned file contributes no rows under
        // the pushed predicate anyway (Spark still re-applies the filter)
        .filter(st => fileMatches(st.getPath.getName))
        .map(st => GzipFilePartition(st.getPath.toString): InputPartition)
    }

  override def createReaderFactory(): PartitionReaderFactory =
    new GzipReaderFactory(required, conf, salvage)
}

private case class GzipFilePartition(path: String) extends InputPartition

private class GzipReaderFactory(required: StructType,
    conf: SerializableHadoopConf, salvage: Boolean) extends PartitionReaderFactory {
  override def createReader(partition: InputPartition): PartitionReader[InternalRow] =
    new GzipPartitionReader(
      partition.asInstanceOf[GzipFilePartition].path, required, conf, salvage)
}

/** Streams one shard file: members decode incrementally (one inflated
  * member live at a time) from the open `FSDataInputStream`; a typed
  * malformation fails the task loudly at the corrupt member's offset —
  * or, in salvage mode, ends the file's rows at the last verified
  * member boundary (the salvage-prefix contract).
  */
private class GzipPartitionReader(path: String, required: StructType,
    conf: SerializableHadoopConf, salvage: Boolean)
    extends PartitionReader[InternalRow] {
  import graft.operators.Crawl.GzipCodec

  private val hadoopPath = new Path(path)
  private val fileName = hadoopPath.getName
  private var opened = false
  private lazy val stream = {
    opened = true
    hadoopPath.getFileSystem(conf.value).open(hadoopPath)
  }
  private lazy val members = new GzipCodec.MemberIterator(stream)
  private var i = -1L
  private var current: GzipCodec.Member = null

  override def next(): Boolean =
    try {
      if (members.hasNext) { current = members.next(); i += 1; true }
      else false
    } catch {
      case GzipCodec.CorruptArchive(reason) =>
        if (salvage) false // keep the verified prefix, drop the rotten tail
        else throw new java.io.IOException(s"warcgz $fileName: $reason")
    }

  override def get(): InternalRow = {
    val m = current
    InternalRow.fromSeq(required.fields.map(_.name).toSeq.map {
      case "file" => UTF8String.fromString(fileName)
      case "member_idx" => i
      case "name" => m.name.map(UTF8String.fromString).orNull
      case "n_bytes" => m.data.length.toLong
      case "data" => m.data
    })
  }

  override def close(): Unit =
    if (opened) try stream.close() catch { case _: Exception => () }
}
