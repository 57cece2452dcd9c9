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
