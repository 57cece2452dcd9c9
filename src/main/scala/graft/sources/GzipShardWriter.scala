package graft.sources

import org.apache.hadoop.fs.Path
import org.apache.spark.Partitioner
import org.apache.spark.sql.DataFrame

/** Distributed member-structured archive WRITER — the missing write half
  * of the crawl layer's read+write symmetry: executor tasks stream
  * `.warc.gz` / `.jsonl.gz` shards straight to the (Hadoop) filesystem,
  * one gzip member per record, never holding more than one member in
  * memory and never collecting anything data-sized to the driver.
  *
  * Contract: the input frame carries `(key: Long, name: String?, data:
  * Binary)` rows; row with key k lands in shard `k % nShards` as one
  * RFC 1952 member (encoded by [[graft.operators.Crawl.GzipCodec]],
  * `name` as FNAME), members within a shard ordered by ascending
  * `(key, name)` — a DETERMINISTIC layout, so two runs over the same
  * input produce byte-identical shards (modulo deflate, which is also
  * deterministic for a fixed library) and the readback accounting is
  * oracle-checkable.
  *
  * Execution shape: one shuffle
  * (`repartitionAndSortWithinPartitions` on the shard partitioner — the
  * same cost any partitioned write pays) then one streaming pass per
  * shard task. Task commit is rename-based: each attempt writes
  * `.inprogress-<uuid>` and renames to `shard-<s>.gz` (last rename wins
  * — attempts write identical bytes by determinism), and the driver
  * stamps `_SUCCESS` only after the job completes, so readers gated on
  * the marker never observe a partial shard set. An EMPTY shard writes
  * NO file — the V2 reader treats absent/zero-length shards as zero
  * members, so the round trip is lossless either way.
  *
  * At 100 TB: nShards sizes the output files (pick ~1 GB compressed, the
  * CommonCrawl convention); each task's memory is one member + the
  * deflate window regardless of shard size, and the writer scales to any
  * shard count the shuffle can address.
  */
object GzipShardWriter {

  /** Write `df`'s `(keyCol, nameCol, dataCol)` rows as `nShards`
    * member-structured gzip shard files under `dir` (any Hadoop
    * FileSystem URI). Returns per-shard member counts (metadata-sized),
    * empty shards omitted.
    */
  def write(df: DataFrame, dir: String, nShards: Int,
      keyCol: String = "doc_id", nameCol: String = "name",
      dataCol: String = "data"): Seq[(Int, Long)] = {
    require(nShards > 0, "nShards must be positive")
    val spark = df.sparkSession
    val conf = new SerializableHadoopConf(spark.sessionState.newHadoopConf())
    val rootStr = dir
    // clean any previous generation (stale shards from a bigger corpus
    // would otherwise survive beside the new ones)
    val rootPath = new Path(rootStr)
    val fs0 = rootPath.getFileSystem(conf.value)
    if (fs0.exists(rootPath)) fs0.delete(rootPath, true): Unit
    fs0.mkdirs(rootPath): Unit

    import org.apache.spark.sql.functions.col
    val keyed = df
      .select(col(keyCol).cast("long"), col(nameCol).cast("string"),
        col(dataCol).cast("binary"))
      .rdd
      .map(r => ((r.getLong(0), Option(r.getString(1)).getOrElse("")),
        (Option(r.getString(1)), r.getAs[Array[Byte]](2))))
    val sharded = keyed.repartitionAndSortWithinPartitions(new Partitioner {
      override def numPartitions: Int = nShards
      override def getPartition(key: Any): Int =
        (key.asInstanceOf[(Long, String)]._1 % nShards).toInt match {
          case neg if neg < 0 => neg + nShards
          case s => s
        }
    })
    val counts = sharded.mapPartitionsWithIndex { (shard, it) =>
      if (!it.hasNext) Iterator.empty
      else {
        val fs = new Path(rootStr).getFileSystem(conf.value)
        val tmp = new Path(rootStr,
          s".inprogress-$shard-${java.util.UUID.randomUUID.toString.take(8)}")
        val out = fs.create(tmp, true)
        var n = 0L
        try {
          it.foreach { case (_, (name, data)) =>
            // one member encoded and released per row — task memory is
            // one member + the deflate window, independent of shard size
            out.write(graft.operators.Crawl.GzipCodec.encodeMember(data, name))
            n += 1
          }
        } finally out.close()
        val dest = new Path(rootStr, s"shard-$shard.gz")
        // ATOMIC overwrite-rename (FileContext, not FileSystem.rename):
        // a delete+rename pair would let a killed speculative attempt
        // delete a committed shard and die before replacing it — the
        // job would still succeed and _SUCCESS would cover a hole.
        // Attempts write identical bytes (deterministic layout), so
        // whichever rename lands last, the shard is whole.
        org.apache.hadoop.fs.FileContext.getFileContext(dest.toUri, conf.value)
          .rename(tmp, dest, org.apache.hadoop.fs.Options.Rename.OVERWRITE)
        Iterator.single(shard -> n)
      }
    }.collect().toSeq // one small (shard, count) row per non-empty shard
    // sweep losers' debris before stamping the marker: a failed or killed
    // (e.g. speculative) attempt leaves its `.inprogress-*` temp behind —
    // readers already skip dot-prefixed files, but without this sweep the
    // orphans accumulate until the next full-directory rewrite
    Option(fs0.globStatus(new Path(rootPath, ".inprogress-*")))
      .getOrElse(Array.empty)
      .foreach(st => fs0.delete(st.getPath, false): Unit)
    val success = new Path(rootStr, "_SUCCESS")
    fs0.create(success, true).close()
    counts.sortBy(_._1)
  }
}
