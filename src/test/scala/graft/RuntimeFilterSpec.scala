package graft

import graft.pipeline.Warehouse
import org.apache.spark.sql.functions._

/** Pins the two runtime scan-reduction mechanisms the 100 TB story relies
  * on beyond static pushdown (SCALE.md): a selective dimension filter must
  * cut the FACT scan at execution time, either row-level (runtime bloom
  * filter injected into the probe side) or partition-level (dynamic
  * partition pruning against a date-partitioned lake table). Thresholds
  * tuned down so local-scale data exercises the same code paths; confs
  * restored after (shared session).
  */
class RuntimeFilterSpec extends SparkSuiteBase {
  import spark.implicits._

  private def withConfs(pairs: (String, String)*)(body: => Unit): Unit = {
    val saved = pairs.map { case (k, _) => k -> spark.conf.getOption(k) }
    try {
      pairs.foreach { case (k, v) => spark.conf.set(k, v) }
      body
    } finally saved.foreach {
      case (k, Some(v)) => spark.conf.set(k, v)
      case (k, None) => spark.conf.unset(k)
    }
  }

  test("a selective dim filter injects a runtime bloom filter into the fact scan side") {
    withConfs(
      "spark.sql.optimizer.runtime.bloomFilter.enabled" -> "true",
      // the fact side is tiny here; drop the size gates so the rewrite
      // fires the way it would against a 100 TB scan
      "spark.sql.optimizer.runtime.bloomFilter.applicationSideScanSizeThreshold" -> "0",
      "spark.sql.optimizer.runtime.bloomFilter.creationSideThreshold" -> "10MB",
      // broadcast would satisfy the join without a shuffle; keep it anyway —
      // bloom filters inject for broadcast joins too, but force shuffle to
      // model the fact-fact case
      "spark.sql.autoBroadcastJoinThreshold" -> "-1",
      "spark.sql.adaptive.autoBroadcastJoinThreshold" -> "-1") {
      val li = Tables.lineitem(spark, sf0001)
      val ord = Tables.orders(spark, sf0001)
        .filter(col("o_orderpriority") === "1-URGENT")
      val joined = li.join(ord, col("l_orderkey") === col("o_orderkey"))
        .groupBy(col("o_orderpriority")).agg(count(lit(1)).as("n"))
      val optimized = joined.queryExecution.optimizedPlan.toString
      assert(optimized.contains("might_contain"),
        s"expected a runtime bloom filter (might_contain) on the fact side:\n$optimized")
      assert(joined.collect().map(_.getLong(1)).sum > 0)
    }
  }

  test("dynamic partition pruning: a dim filter prunes date partitions of a lake table") {
    val wh = new Warehouse(tmpDir("dpp_wh"))
    // date-partitioned fact, written the way the batch pipelines lay out
    // the lake (ds=YYYY-MM-DD directories)
    val fact = Tables.events(spark, sf0001)
      .withColumn("ds", to_date(col("ts")).cast("string"))
      .select(col("event_id"), col("user_id"), col("event_type"), col("ds"))
    wh.partitionedUpsertWrite(fact, "evt_by_ds", "ds")

    withConfs(
      // keep ds a STRING on read-back (inference would type the partition
      // dir values as DATE and change the join key type)
      "spark.sql.sources.partitionColumnTypeInference.enabled" -> "false",
      "spark.sql.optimizer.dynamicPartitionPruning.enabled" -> "true",
      // fact stats are tiny locally; remove the benefit-ratio gate
      "spark.sql.optimizer.dynamicPartitionPruning.useStats" -> "false",
      "spark.sql.optimizer.dynamicPartitionPruning.fallbackFilterRatio" -> "10000.0") {
      val lake = spark.read.parquet(wh.tablePath("evt_by_ds"))
      val nDs = lake.select(col("ds")).distinct().count()
      assert(nDs > 3, s"fixture spans $nDs dates; need several for pruning to matter")

      // dim: maps every ds to a cohort, ONE of them "target" — DPP requires
      // a selective predicate on the dim side, and the dim must live on
      // disk: a Filter over a local relation constant-folds away
      // (ConvertToLocalRelation) leaving no predicate to derive the
      // pruning subquery from
      val allDs = lake.select(col("ds")).distinct().orderBy(col("ds"))
        .collect().map(_.getString(0))
      val keep = allDs.head
      wh.truncateWrite(
        allDs.map(d => (d, if (d == keep) "target" else "other"))
          .toSeq.toDF("ds", "cohort"),
        "ds_cohorts")
      val dim = spark.read.parquet(wh.tablePath("ds_cohorts"))
        .filter(col("cohort") === "target")

      val joined = lake.join(dim, Seq("ds"))
        .groupBy(col("cohort")).agg(count(lit(1)).as("n"))
      val planText = joined.queryExecution.executedPlan.toString
      assert(planText.contains("dynamicpruning"),
        s"expected dynamicpruning in the fact scan's partition filters:\n$planText")
      // and the pruned result equals the statically-filtered one
      val n = joined.collect().head.getLong(1)
      val expected = lake.filter(col("ds") === keep).count()
      assert(n == expected && n > 0)
    }
  }
}
