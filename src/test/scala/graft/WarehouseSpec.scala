package graft

import graft.pipeline.Warehouse
import org.apache.spark.sql.functions._

class WarehouseSpec extends SparkSuiteBase {
  import spark.implicits._

  test("truncate replaces; append accumulates") {
    val wh = new Warehouse(tmpDir("wh"))
    wh.truncateWrite(Seq(1, 2, 3).toDF("x"), "t")
    wh.truncateWrite(Seq(4, 5).toDF("x"), "t")
    assert(wh.read(spark, "t").count() == 2)
    wh.appendWrite(Seq(6).toDF("x"), "t")
    assert(wh.read(spark, "t").count() == 3)
  }

  test("version-pinned diff: prune of a pinned input fails loudly, never silently reads latest") {
    val wh = new Warehouse(tmpDir("whvd"))
    wh.versionedWrite(Seq((1, "a"), (2, "b")).toDF("id", "v"), "t")
    wh.versionedWrite(Seq((2, "b"), (3, "c")).toDF("id", "v"), "t")
    wh.versionedWrite(Seq((3, "c")).toDF("id", "v"), "t")
    // the pipe_version_diff shape: both inputs pinned, current (v3) a decoy
    def diff12() = wh.readVersion(spark, "t", Some(1))
      .join(wh.readVersion(spark, "t", Some(2)), Seq("id"), "full_outer")
      .count()
    assert(diff12() == 3)
    // retention drops v1; a diff still pinned to it must fail loudly —
    // lineage must never degrade to "whatever is still on disk"
    assert(wh.pruneVersions("t", keep = 2) == Seq(1))
    val e = intercept[IllegalArgumentException](diff12())
    assert(e.getMessage.contains("pruned or never written"))
    // the surviving pinned pair still works
    assert(wh.readVersion(spark, "t", Some(2))
      .join(wh.readVersion(spark, "t", Some(3)), Seq("id"), "full_outer")
      .count() == 2)
  }

  test("versioned snapshots: time travel, latest-by-default, retention never drops current") {
    val wh = new Warehouse(tmpDir("whver"))
    // no versions yet: loud failure, not an empty frame
    intercept[IllegalArgumentException](wh.readVersion(spark, "t"))
    assert(wh.versionedWrite(Seq(1, 2, 3).toDF("x"), "t") == 1)
    assert(wh.versionedWrite(Seq(10, 20).toDF("x"), "t") == 2)
    assert(wh.versionedWrite(Seq(7).toDF("x"), "t") == 3)
    assert(wh.listVersions("t") == Seq(1, 2, 3))
    assert(wh.currentVersion("t").contains(3))
    // latest by default; any pinned snapshot is byte-stable history
    assert(wh.readVersion(spark, "t").as[Int].collect().toSeq == Seq(7))
    assert(wh.readVersion(spark, "t", Some(1)).as[Int].collect().sorted.toSeq == Seq(1, 2, 3))
    assert(wh.readVersion(spark, "t", Some(2)).as[Int].collect().sorted.toSeq == Seq(10, 20))
    // retention: newest `keep` survive, current is sacred
    assert(wh.pruneVersions("t", keep = 2) == Seq(1))
    assert(wh.listVersions("t") == Seq(2, 3))
    // a pruned pin fails loudly — lineage must never silently see "latest"
    val e = intercept[IllegalArgumentException](wh.readVersion(spark, "t", Some(1)))
    assert(e.getMessage.contains("pruned or never written"))
    assert(wh.readVersion(spark, "t").as[Int].collect().toSeq == Seq(7))
    // keep=1 keeps exactly the current snapshot
    assert(wh.pruneVersions("t", keep = 1) == Seq(2))
    assert(wh.listVersions("t") == Seq(3))
    // crash debris: a _v= dir WITHOUT the _SUCCESS marker is invisible to
    // listing and unreadable even when pinned. Prune's sweep distinguishes
    // by version number: a dir NUMBERED ABOVE current may be an in-flight
    // versionedWrite (_SUCCESS only lands at job commit), so a concurrent
    // maintenance pruner must leave it alone; a dir at-or-below current
    // can only be crash debris and is swept.
    val inflight = new java.io.File(wh.tablePath("t"), "_v=9")
    assert(inflight.mkdirs())
    java.nio.file.Files.write(new java.io.File(inflight, "part-junk").toPath,
      Array[Byte](1, 2, 3))
    val debris = new java.io.File(wh.tablePath("t"), "_v=2")
    assert(debris.mkdirs())
    java.nio.file.Files.write(new java.io.File(debris, "part-junk").toPath,
      Array[Byte](1, 2, 3))
    assert(wh.listVersions("t") == Seq(3), "uncommitted dirs must be invisible")
    intercept[IllegalArgumentException](wh.readVersion(spark, "t", Some(9)))
    assert(wh.pruneVersions("t", keep = 1) == Seq())
    assert(!debris.exists(), "prune must sweep uncommitted debris below current")
    assert(inflight.exists(), "prune must NOT destroy a possibly-in-flight write")
    assert(wh.readVersion(spark, "t").as[Int].collect().toSeq == Seq(7))
    // a stray non-numeric _v= dir must not break listing/read/retention
    val stray = new java.io.File(wh.tablePath("t"), "_v=tmp")
    assert(stray.mkdirs())
    assert(wh.listVersions("t") == Seq(3))
    assert(wh.pruneVersions("t", keep = 1) == Seq())
    assert(wh.readVersion(spark, "t").as[Int].collect().toSeq == Seq(7))
    stray.delete()
    // crash window between job commit and marker flip: _v=9's data lands
    // with _SUCCESS but the writer dies before _VERSION points at it. The
    // NEXT versionedWrite must not reuse (and Overwrite-rewrite) dir 9
    // under a pinned reader — it derives its number from the dirs on
    // disk, not the stale marker.
    Seq(99).toDF("v").write.mode("overwrite").parquet(inflight.getPath)
    assert(wh.currentVersion("t").contains(3), "marker is stale by design here")
    assert(wh.readVersion(spark, "t", Some(9)).as[Int].collect().toSeq == Seq(99))
    val v10 = wh.versionedWrite(Seq(100).toDF("v"), "t")
    assert(v10 == 10, "next version must skip past the committed-but-unmarked dir")
    assert(wh.readVersion(spark, "t", Some(9)).as[Int].collect().toSeq == Seq(99),
      "the orphaned committed snapshot is still intact for pinned readers")
    assert(wh.readVersion(spark, "t").as[Int].collect().toSeq == Seq(100))
  }

  test("version metadata sidecars: carried with the commit, readable, pruned with their generation, tmp debris swept") {
    val wh = new Warehouse(tmpDir("whmeta"))
    import spark.implicits._
    assert(wh.versionedWrite(Seq(1).toDF("x"), "m", Nil,
      Map("thru" -> "7", "note" -> "a=b")) == 1)
    assert(wh.versionedWrite(Seq(2).toDF("x"), "m", Nil,
      Map("thru" -> "9")) == 2)
    // round-trip, including a value containing '=' (split on FIRST '=')
    assert(wh.versionMeta("m", 1) === Map("thru" -> "7", "note" -> "a=b"))
    assert(wh.versionMeta("m", 2) === Map("thru" -> "9"))
    // a metadata-less generation reads as empty, not an error
    assert(wh.versionedWrite(Seq(3).toDF("x"), "m") == 3)
    assert(wh.versionMeta("m", 3) === Map.empty[String, String])
    // backfill path (the lakeThru self-heal): atomic write, re-readable
    wh.writeVersionMeta("m", 3, Map("thru" -> "11"))
    assert(wh.versionMeta("m", 3) === Map("thru" -> "11"))
    // crashed backfill tmp debris + the pruned generation's sidecar are
    // both swept; retained sidecars survive. The sweep is mtime-gated:
    // an OLD tmp is crash debris, a FRESH one may be an in-flight
    // read-path backfill between its write and atomic move — deleting
    // it would make the reader's move throw
    val oldTmp = new java.io.File(wh.tablePath("m"), "_v=2.meta.tmpdeadbeef")
    java.nio.file.Files.write(oldTmp.toPath, "thru=torn".getBytes("UTF-8"))
    assert(oldTmp.setLastModified(
      System.currentTimeMillis() - 24L * 3600 * 1000))
    val freshTmp = new java.io.File(wh.tablePath("m"), "_v=3.meta.tmpcafe0000")
    java.nio.file.Files.write(freshTmp.toPath, "thru=inflight".getBytes("UTF-8"))
    assert(wh.pruneVersions("m", keep = 2) == Seq(1))
    assert(!new java.io.File(wh.tablePath("m"), "_v=1.meta").exists(),
      "a pruned generation's sidecar must not linger")
    assert(!oldTmp.exists(), "aged-out tmp sidecar debris must be swept")
    assert(freshTmp.exists(),
      "a fresh tmp (possibly an in-flight backfill) must survive the sweep")
    freshTmp.delete()
    assert(wh.versionMeta("m", 2) === Map("thru" -> "9"))
    assert(wh.versionMeta("m", 3) === Map("thru" -> "11"))
  }

  test("versionedWrite: concurrent writers commit DISTINCT versions; marker stays monotone") {
    val wh = new Warehouse(tmpDir("whrace"))
    assert(wh.versionedWrite(Seq(1).toDF("x"), "t") == 1)
    // another writer holds the next slot's reservation (mid-write): this
    // writer must NOT shadow it — the create-exclusive CAS sends it to a
    // fresh number
    val reserved = new java.io.File(wh.tablePath("t"), "_v=2.reserved")
    java.nio.file.Files.createFile(reserved.toPath)
    assert(wh.versionedWrite(Seq(2).toDF("x"), "t") == 3,
      "the loser of the reservation race retries with a higher number")
    assert(wh.currentVersion("t").contains(3))
    assert(reserved.exists(), "the in-flight writer's reservation is untouched")
    // an OVERTAKEN in-flight writer (live reservation + uncommitted dir
    // below current) must survive pruning — its _SUCCESS hasn't landed yet
    val inflightDir = new java.io.File(wh.tablePath("t"), "_v=2")
    inflightDir.mkdirs()
    java.nio.file.Files.write(
      new java.io.File(inflightDir, "part-00000").toPath, Array[Byte](1))
    wh.pruneVersions("t", keep = 10)
    assert(reserved.exists() && inflightDir.exists(),
      "prune must not destroy a possibly-in-flight overtaken writer")
    // once the writer finishes (reservation released), the uncommitted
    // dir IS debris and sweeps; a reservation left beside a COMMITTED dir
    // (crash between marker flip and release) also sweeps
    reserved.delete()
    val staleRes = new java.io.File(wh.tablePath("t"), "_v=3.reserved")
    java.nio.file.Files.createFile(staleRes.toPath)
    wh.pruneVersions("t", keep = 10)
    assert(!inflightDir.exists(), "released uncommitted dir is crash debris")
    assert(!staleRes.exists(), "reservation beside a committed dir is debris")

    // two genuinely concurrent writers: both succeed, versions distinct,
    // marker = max, both snapshots readable
    val pool = java.util.concurrent.Executors.newFixedThreadPool(2)
    try {
      val start = new java.util.concurrent.CountDownLatch(1)
      def submit(v: Int) = pool.submit(new java.util.concurrent.Callable[Int] {
        override def call(): Int = {
          start.await()
          wh.versionedWrite(Seq(v).toDF("x"), "t")
        }
      })
      val (fa, fb) = (submit(100), submit(200))
      start.countDown()
      val (va, vb) = (fa.get(), fb.get())
      assert(va != vb, "concurrent writers must never share a version dir")
      assert(Set(va, vb) == Set(4, 5))
      assert(wh.currentVersion("t").contains(math.max(va, vb)),
        "the marker never regresses below the highest published snapshot")
      assert(wh.readVersion(spark, "t", Some(va)).as[Int].collect().toSeq == Seq(100))
      assert(wh.readVersion(spark, "t", Some(vb)).as[Int].collect().toSeq == Seq(200))
    } finally pool.shutdown()
  }

  test("partitionedUpsertWrite: re-running a batch date replaces only that partition") {
    val wh = new Warehouse(tmpDir("whp"))
    val spark2 = spark
    // dynamic partition overwrite needs the session-level setting
    spark2.conf.set("spark.sql.sources.partitionOverwriteMode", "dynamic")
    val d1 = Seq(("2021-03-10", 1), ("2021-03-10", 2), ("2021-03-11", 3)).toDF("ds", "v")
    wh.partitionedUpsertWrite(d1, "t", "ds")
    // re-run day 1 with different content
    val d1b = Seq(("2021-03-10", 9)).toDF("ds", "v")
    wh.partitionedUpsertWrite(d1b, "t", "ds")
    // cast: partition-column type inference reads "2021-03-10" back as DATE
    val out = wh.read(spark2, "t")
      .withColumn("ds", col("ds").cast("string"))
      .orderBy("ds", "v").collect()
      .map(r => (r.getAs[String]("ds"), r.getAs[Int]("v"))).toSeq
    assert(out == Seq(("2021-03-10", 9), ("2021-03-11", 3)))
  }

  test("date-partitioned layout: a date filter prunes partitions at the scan") {
    val wh = new Warehouse(tmpDir("whprune"))
    val df = Seq(
      ("2021-03-10", 1), ("2021-03-11", 2), ("2021-03-12", 3), ("2021-03-12", 4))
      .toDF("ds", "v")
    wh.partitionedUpsertWrite(df, "t", "ds")
    val q = wh.read(spark, "t").filter(col("ds") === lit("2021-03-12").cast("date"))
    val plan = q.queryExecution.executedPlan.toString
    // the predicate must land in PartitionFilters (file-level pruning),
    // NOT in PushedFilters/data Filter (row-level, after reading)
    assert(plan.contains("PartitionFilters"), plan)
    assert("""PartitionFilters: \[[^\]]*ds[^\]]*\]""".r.findFirstIn(plan).isDefined, plan)
    assert(q.count() == 2)
    // only the matching partition directory's files are read
    assert(q.queryExecution.executedPlan.collectLeaves().toString.contains("t"))
    val scanned = q.select(input_file_name()).distinct().collect().map(_.getString(0))
    assert(scanned.nonEmpty && scanned.forall(_.contains("ds=2021-03-12")), scanned.mkString(","))
  }

  test("ORC round-trip: schema and values survive the columnar format change") {
    // parquet is the primary lake format; ORC is the other built-in
    // columnar source a migrating user may hold data in
    val dir = tmpDir("orc") + "/docs_orc"
    val docs = Tables.documents(spark, sf0001)
      .select("doc_id", "lang", "source", "n_chars")
    docs.write.mode("overwrite").orc(dir)
    val back = spark.read.orc(dir)
    assert(back.schema == docs.schema)
    assert(back.orderBy("doc_id").collect().toSeq ==
      docs.orderBy("doc_id").collect().toSeq)
    // predicate pushdown reaches the ORC scan too
    val plan = back.filter(col("n_chars") > 100)
      .queryExecution.executedPlan.toString
    assert(plan.contains("PushedFilters") && plan.contains("n_chars"), plan)
  }

  test("Warehouse(format=orc): truncate/append/partitioned-upsert behave identically to parquet") {
    val whP = new Warehouse(tmpDir("whfmt_p"))
    val whO = new Warehouse(tmpDir("whfmt_o"), "orc")
    val docs = Tables.documents(spark, sf0001)
      .select(col("doc_id"), col("lang"), col("source"), col("n_chars"))
    for (wh <- Seq(whP, whO)) {
      wh.truncateWrite(docs.filter(col("doc_id") < 100), "t")
      wh.truncateWrite(docs.filter(col("doc_id") < 50), "t")   // idempotent replace
      wh.appendWrite(docs.filter(col("doc_id") < 10), "t")     // accumulate
      wh.partitionedUpsertWrite(docs, "tp", "lang")
      wh.partitionedUpsertWrite(docs.filter(col("lang") === "en"), "tp", "lang")
    }
    def dump(wh: Warehouse, t: String) =
      wh.read(spark, t).orderBy(col("doc_id"), col("lang")).collect().toSeq
    assert(dump(whP, "t") == dump(whO, "t"))
    assert(dump(whP, "tp") == dump(whO, "tp"))
    assert(dump(whO, "t").size == 50 + 10)
    // the partition-pruning layout works for ORC too
    val scanned = whO.read(spark, "tp").filter(col("lang") === "de")
      .queryExecution.executedPlan.collect {
        case f: org.apache.spark.sql.execution.FileSourceScanExec =>
          f.relation.location.listFiles(f.partitionFilters, f.dataFilters)
            .flatMap(_.files.map(_.getPath.toString))
      }.flatten
    assert(scanned.nonEmpty && scanned.forall(_.contains("lang=de")), scanned.mkString(","))
  }

  test("refreshRollup: incremental refresh equals full recompute; corrections replace one date") {
    import org.apache.spark.sql.functions._
    val wh = new Warehouse(tmpDir("whroll"))
    val ev = Tables.events(spark, sf0001)
      .filter(col("user_id").isNotNull)
      .withColumn("ds", to_date(col("ts")).cast("string"))
      .select(col("ds"), col("event_type"), col("value"))
    val days = ev.select(col("ds")).distinct().orderBy(col("ds"))
      .collect().map(_.getString(0)).take(3)
    val aggs = Seq(count(lit(1)).as("n"),
      sum(round(col("value") * 100).cast("bigint")).as("v_cents"))
    // three daily batches arrive and refresh incrementally
    days.foreach { d =>
      wh.refreshRollup(ev.filter(col("ds") === d), "rollup", "ds",
        Seq("event_type"), aggs)
    }
    // partition-column reads back typed (DATE) — normalize to string so
    // row equality compares values, not partition-inference types
    def dump() = wh.read(spark, "rollup")
      .select(col("ds").cast("string").as("ds"), col("event_type"),
        col("n"), col("v_cents"))
      .orderBy(col("ds"), col("event_type")).collect().toSeq
    val incremental = dump()
    // full recompute over the same three days must agree exactly
    val full = ev.filter(col("ds").isin(days: _*))
      .groupBy(col("ds"), col("event_type")).agg(aggs.head, aggs.tail: _*)
      .select(col("ds"), col("event_type"), col("n"), col("v_cents"))
      .orderBy(col("ds"), col("event_type")).collect().toSeq
    assert(incremental == full)
    // re-running a day is idempotent
    wh.refreshRollup(ev.filter(col("ds") === days(1)), "rollup", "ds",
      Seq("event_type"), aggs)
    assert(dump() == incremental)
    // a correction batch for day 0 replaces ONLY day 0
    val corrected = ev.filter(col("ds") === days(0) && col("event_type") =!= "error")
    wh.refreshRollup(corrected, "rollup", "ds", Seq("event_type"), aggs)
    val after = dump()
    assert(after.filter(_.getString(0) == days(0)) !=
      incremental.filter(_.getString(0) == days(0)))
    assert(after.filter(_.getString(0) != days(0)) ==
      incremental.filter(_.getString(0) != days(0)))
  }

  test("writeAuditPublish: failing audit leaves live untouched and staged for forensics; passing audit swaps atomically") {
    val wh = new Warehouse(tmpDir("whwap"))
    // establish a good live table
    assert(wh.writeAuditPublish(spark, Seq(1, 2, 3).toDF("x"), "t",
      df => if (df.count() == 3) None else Some("bad count")).isRight)
    assert(wh.read(spark, "t").as[Int].collect().sorted.toSeq == Seq(1, 2, 3))
    // a bad batch: audit rejects it on the READBACK
    val r = wh.writeAuditPublish(spark, Seq(7).toDF("x"), "t",
      df => if (df.count() == 3) None else Some("expected 3 rows"))
    assert(r == Left("expected 3 rows"))
    // live unchanged, staged directory kept for forensics
    assert(wh.read(spark, "t").as[Int].collect().sorted.toSeq == Seq(1, 2, 3))
    assert(wh.exists("__stage__t"), "failed batch stays quarantined")
    assert(spark.read.parquet(wh.tablePath("__stage__t"))
      .as[Int].collect().toSeq == Seq(7))
    // a good batch publishes over the old live
    assert(wh.writeAuditPublish(spark, Seq(4, 5, 6).toDF("x"), "t",
      df => if (df.count() == 3) None else Some("bad count")).isRight)
    assert(wh.read(spark, "t").as[Int].collect().sorted.toSeq == Seq(4, 5, 6))
    assert(!wh.exists("__retired__t"), "retired copy cleaned after publish")
  }

  test("writeAuditPublish with an expectations-style audit body gates a publish end-to-end") {
    val wh = new Warehouse(tmpDir("whwapx"))
    // the audit body: declarative rules over the STAGED readback, the
    // q_expectations_audit pattern (not-null + accepted set + unique key)
    def expectations(df: org.apache.spark.sql.DataFrame): Option[String] = {
      val agg = df.agg(
        count(lit(1)).as("n"),
        sum(when(col("k").isNull, 1L).otherwise(0L)).as("v_nn"),
        sum(when(!col("status").isin("ok", "warn"), 1L).otherwise(0L)).as("v_set"))
        .collect()(0)
      val uniq = df.groupBy(col("k")).count().filter(col("count") > 1).count()
      if (agg.getLong(1) > 0) Some(s"${agg.getLong(1)} null keys")
      else if (agg.getLong(2) > 0) Some(s"${agg.getLong(2)} bad statuses")
      else if (uniq > 0) Some(s"$uniq duplicated keys")
      else None
    }
    val good = Seq((1L, "ok"), (2L, "warn"), (3L, "ok")).toDF("k", "status")
    assert(wh.writeAuditPublish(spark, good, "t", expectations).isRight)
    // duplicate key: rejected with the uniqueness reason, live unchanged
    val dup = Seq((7L, "ok"), (7L, "ok")).toDF("k", "status")
    assert(wh.writeAuditPublish(spark, dup, "t", expectations) ==
      Left("1 duplicated keys"))
    // bad status: rejected with the set reason
    val bad = Seq((9L, "broken")).toDF("k", "status")
    assert(wh.writeAuditPublish(spark, bad, "t", expectations) ==
      Left("1 bad statuses"))
    assert(wh.read(spark, "t").count() == 3, "live survived both bad batches")
  }

  test("schema evolution: mergeSchema surfaces a late-added column as nullable") {
    val dir = tmpDir("whevo") + "/t"
    val v1 = Tables.documents(spark, sf0001).select("doc_id", "lang").filter(col("doc_id") < 10)
    val v2 = Tables.documents(spark, sf0001)
      .select("doc_id", "lang", "n_chars").filter(col("doc_id").between(10, 19))
    v1.write.mode("append").parquet(dir)
    v2.write.mode("append").parquet(dir)
    val merged = spark.read.option("mergeSchema", "true").parquet(dir)
    assert(merged.schema.fieldNames.toSet == Set("doc_id", "lang", "n_chars"))
    assert(merged.count() == 20)
    // rows written before the column existed read as null
    assert(merged.filter(col("doc_id") < 10 && col("n_chars").isNull).count() == 10)
    assert(merged.filter(col("doc_id") >= 10 && col("n_chars").isNotNull).count() == 10)
  }

  test("bucketed co-located join: no shuffle exchange in the join plan") {
    val wh = new Warehouse(tmpDir("whbkt"))
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1") // force non-broadcast path
    try {
      val o = Tables.orders(spark, sf0001).select("o_orderkey", "o_totalprice")
      val li = Tables.lineitem(spark, sf0001).select("l_orderkey", "l_quantity")
      wh.bucketedWrite(o, "orders_bkt", "o_orderkey", 4)
      wh.bucketedWrite(li.withColumnRenamed("l_orderkey", "o_orderkey"), "lineitem_bkt", "o_orderkey", 4)
      val joined = spark.table("lineitem_bkt")
        .join(spark.table("orders_bkt"), "o_orderkey")
      val plan = joined.queryExecution.executedPlan.toString
      assert(!plan.contains("Exchange"), plan)
      assert(joined.count() == Tables.lineitem(spark, sf0001).count())
    } finally {
      spark.conf.unset("spark.sql.autoBroadcastJoinThreshold")
      spark.sql("DROP TABLE IF EXISTS orders_bkt")
      spark.sql("DROP TABLE IF EXISTS lineitem_bkt")
    }
  }
}
