package graft

import graft.operators.Crawl.GzipCodec
import org.apache.spark.sql.execution.datasources.v2.BatchScanExec
import org.apache.spark.sql.functions._

/** The V2 `warcgz` source: short-name registration, row correctness
  * against the codec, required-column pruning reaching the scan, and
  * loud typed failure on a corrupt shard.
  */
class GzipSourceSpec extends SparkSuiteBase {

  private def writeShards(): String = {
    val dir = tmpDir("warcgz")
    java.nio.file.Files.write(
      new java.io.File(dir, "shard-0.gz").toPath,
      GzipCodec.encodeMembers(Seq(
        (Some("a"), "first member".getBytes("UTF-8")),
        (Some("b"), "second".getBytes("UTF-8")))))
    java.nio.file.Files.write(
      new java.io.File(dir, "shard-1.gz").toPath,
      GzipCodec.encodeMembers(Seq((None, "third one".getBytes("UTF-8")))))
    // underscore-prefixed files (markers) must be invisible to the scan
    java.nio.file.Files.write(new java.io.File(dir, "_DONE").toPath,
      Array.emptyByteArray)
    dir
  }

  test("short-name read: one row per member, bytes round-trip, markers skipped") {
    val rows = spark.read.format("warcgz").load(writeShards())
      .orderBy("file", "member_idx").collect()
    assert(rows.length == 3)
    assert(rows.map(r => (r.getString(0), r.getLong(1), r.getString(2),
      r.getLong(3), new String(r.getAs[Array[Byte]](4), "UTF-8"))).toSeq == Seq(
      ("shard-0.gz", 0L, "a", 12L, "first member"),
      ("shard-0.gz", 1L, "b", 6L, "second"),
      ("shard-1.gz", 0L, null, 9L, "third one")))
  }

  test("required-column pruning reaches the scan: data is not in the ReadSchema") {
    val df = spark.read.format("warcgz").load(writeShards())
      .select("file", "n_bytes")
    val scans = df.queryExecution.executedPlan.collect {
      case b: BatchScanExec => b.scan.readSchema()
    }
    assert(scans.nonEmpty)
    assert(scans.head.fieldNames.toSet == Set("file", "n_bytes"),
      s"expected a pruned ReadSchema, got ${scans.head.fieldNames.mkString(",")}")
    assert(df.collect().map(_.getLong(1)).sum == 12 + 6 + 9)
  }

  test("a zero-length file is an empty shard (zero members), not an error") {
    val dir = tmpDir("warcgzempty")
    java.nio.file.Files.write(
      new java.io.File(dir, "shard-0.gz").toPath,
      GzipCodec.encodeMembers(Seq((Some("a"), "only".getBytes("UTF-8")))))
    // a distributed shard writer's empty partition produces exactly this
    java.nio.file.Files.write(new java.io.File(dir, "shard-1.gz").toPath,
      Array.emptyByteArray)
    val rows = spark.read.format("warcgz").load(dir).collect()
    assert(rows.length == 1 && rows(0).getString(0) == "shard-0.gz")
  }

  test("file-predicate pushdown prunes shard files at planning time") {
    val dir = writeShards() // shard-0.gz (2 members), shard-1.gz (1 member)
    val all = spark.read.format("warcgz").load(dir)
    // without a predicate: one input partition per shard file
    assert(all.rdd.getNumPartitions == 2)
    // equality predicate: ONE file planned — the single-shard probe shape
    val one = all.filter(col("file") === "shard-1.gz")
    assert(one.rdd.getNumPartitions == 1)
    assert(one.collect().map(_.getLong(3)).toSeq == Seq(9L))
    // IN predicate
    val in = all.filter(col("file").isin("shard-0.gz"))
    assert(in.rdd.getNumPartitions == 1)
    assert(in.count() == 2)
    // prefix predicate
    val pre = all.filter(col("file").startsWith("shard-1"))
    assert(pre.rdd.getNumPartitions == 1)
    // a non-file predicate must NOT prune (and results stay correct)
    val byName = all.filter(col("name") === "a")
    assert(byName.rdd.getNumPartitions == 2)
    assert(byName.count() == 1)
  }

  test("paths resolve through the Hadoop FileSystem API (explicit file:// URI works)") {
    val dir = writeShards()
    val rows = spark.read.format("warcgz").load(s"file://$dir").collect()
    assert(rows.length == 3)
  }

  test("distributed shard writer: write -> read round trip, deterministic layout, empty shards omitted") {
    import graft.sources.GzipShardWriter
    import spark.implicits._
    val dir = tmpDir("warcgzw") + "/shards"
    // keys cover residues 0,1,3 of 4 — residue 2 is EMPTY (no file)
    val docs = Seq(
      (0L, "m-0", "zero"), (4L, "m-4", "four"),
      (1L, "m-1", "one"), (5L, "m-5", "five"), (3L, "m-3", "three"))
      .toDF("doc_id", "name", "text")
      .select(col("doc_id"), col("name"), col("text").cast("binary").as("data"))
    val counts = GzipShardWriter.write(docs, dir, 4)
    assert(counts == Seq(0 -> 2L, 1 -> 2L, 3 -> 1L), "per-shard accounting; empty shard omitted")
    assert(new java.io.File(dir, "_SUCCESS").exists())
    // no attempt debris survives the commit sweep
    assert(!new java.io.File(dir).listFiles()
      .exists(_.getName.startsWith(".inprogress-")),
      "stale .inprogress-* temp files must be swept before _SUCCESS")
    assert(!new java.io.File(dir, "shard-2.gz").exists())
    // readback through the V2 source: contents, names, ascending-key order
    val rows = spark.read.format("warcgz").load(dir)
      .orderBy("file", "member_idx").collect()
      .map(r => (r.getString(0), r.getString(2), new String(r.getAs[Array[Byte]](4), "UTF-8")))
    assert(rows.toSeq == Seq(
      ("shard-0.gz", "m-0", "zero"), ("shard-0.gz", "m-4", "four"),
      ("shard-1.gz", "m-1", "one"), ("shard-1.gz", "m-5", "five"),
      ("shard-3.gz", "m-3", "three")))
    // a re-write over the same input is byte-identical (deterministic layout)
    val before = java.nio.file.Files.readAllBytes(
      new java.io.File(dir, "shard-0.gz").toPath)
    GzipShardWriter.write(docs, dir, 4)
    val after = java.nio.file.Files.readAllBytes(
      new java.io.File(dir, "shard-0.gz").toPath)
    assert(java.util.Arrays.equals(before, after))
  }

  test("multi-path load: a foreachBatch can hand the source exactly its batch's files") {
    val dir = writeShards()
    val p0 = s"$dir/shard-0.gz"
    val p1 = s"$dir/shard-1.gz"
    val rows = spark.read.format("warcgz").load(p0, p1).collect()
    assert(rows.length == 3)
    assert(spark.read.format("warcgz").load(p1).count() == 1)
  }

  test("a corrupt shard fails its task loudly with the codec's typed reason") {
    val dir = tmpDir("warcgzbad")
    val ok = GzipCodec.encodeMember("fine".getBytes)
    val bad = ok.clone(); bad(ok.length - 1) = 0x7f // flip an ISIZE byte
    java.nio.file.Files.write(new java.io.File(dir, "shard-0.gz").toPath, bad)
    val e = intercept[org.apache.spark.SparkException] {
      spark.read.format("warcgz").load(dir).collect()
    }
    assert(e.getMessage.contains("ISIZE mismatch") ||
      Option(e.getCause).exists(_.getMessage.contains("ISIZE mismatch")))
  }

  test("salvage mode: a corrupt member ends its file's rows at the last verified boundary") {
    val dir = tmpDir("warcgzsalv")
    // shard-0: two good members, then a rotten tail (ISIZE flipped on the
    // third member) — salvage keeps exactly the verified prefix
    val third = GzipCodec.encodeMember("rotten".getBytes)
    third(third.length - 1) = 0x7f
    java.nio.file.Files.write(new java.io.File(dir, "shard-0.gz").toPath,
      GzipCodec.encodeMembers(Seq(
        (Some("a"), "good one".getBytes("UTF-8")),
        (Some("b"), "good two".getBytes("UTF-8")))) ++ third)
    // shard-1 is wholly fine: the corruption must cost ONLY shard-0's tail
    java.nio.file.Files.write(new java.io.File(dir, "shard-1.gz").toPath,
      GzipCodec.encodeMembers(Seq((Some("c"), "intact".getBytes("UTF-8")))))
    val rows = spark.read.format("warcgz").option("salvage", "true")
      .load(dir).orderBy("file", "member_idx").collect()
      .map(r => (r.getString(0), r.getString(2)))
    assert(rows.toSeq == Seq(
      ("shard-0.gz", "a"), ("shard-0.gz", "b"), ("shard-1.gz", "c")),
      "salvage keeps the verified prefix per file and every healthy file whole")
    // and the DEFAULT mode still fails loudly on the same directory
    intercept[org.apache.spark.SparkException] {
      spark.read.format("warcgz").load(dir).collect()
    }: Unit
  }
}
