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
}
