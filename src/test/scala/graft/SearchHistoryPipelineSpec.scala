package graft

import java.nio.file.{Files, Paths}
import java.time.LocalDate

import graft.pipeline.{BatchRunner, SearchHistoryPipeline, Warehouse}
import org.apache.spark.sql.functions._

/** End-to-end run of reference pipeline 1 over FIXTURES.md §B1-shaped CSVs:
  * 3 consecutive days, malformed numerics/dates, tie rows.
  */
class SearchHistoryPipelineSpec extends SparkSuiteBase {

  private def writeCsvs(dir: String): Unit = {
    val files = Map(
      "search_20210310.csv" ->
        """user_id,search_keyword,search_result_count,created_at
          |101,spark,42,2021-03-10 08:15:00
          |102,etl,7,2021-03-10 09:00:00
          |bad_id,cloud,not_a_number,2021-03-10
          |""".stripMargin,
      "search_20210311.csv" ->
        """user_id,search_keyword,search_result_count,created_at
          |103,spark,9,2021-03-11 10:00:00
          |104,airflow,9,2021-03-11 11:00:00
          |105,etl,3,2021-03-11 12:00:00
          |""".stripMargin,
      "search_20210312.csv" ->
        """user_id,search_keyword,search_result_count,created_at
          |106,bigquery,55,2021-03-12 06:00:00
          |107,spark,54,garbage_date
          |""".stripMargin)
    files.foreach { case (name, content) =>
      Files.writeString(Paths.get(dir, name), content)
    }
  }

  test("3-day backfill accumulates typed rows and one top-1 row per day") {
    val input = tmpDir("sh_csv")
    val whRoot = tmpDir("sh_wh")
    writeCsvs(input)
    val wh = new Warehouse(whRoot)
    val dates = BatchRunner.dateRange(LocalDate.of(2021, 3, 10), LocalDate.of(2021, 3, 12))
    BatchRunner.run(spark, wh, SearchHistoryPipeline(input), dates)

    // raw table holds ONLY the last batch (WRITE_TRUNCATE per run)
    assert(wh.read(spark, SearchHistoryPipeline.rawTable).count() == 2)

    // typed table accumulates all 8 rows (WRITE_APPEND), with null casts
    val typed = wh.read(spark, SearchHistoryPipeline.typedTable)
    assert(typed.count() == 8)
    val badRow = typed.filter(col("search_keyword") === "cloud").collect().head
    assert(badRow.isNullAt(badRow.fieldIndex("user_id")))          // try_cast('bad_id')
    assert(badRow.isNullAt(badRow.fieldIndex("search_result_count"))) // try_cast('not_a_number')

    // report: one row per day; ties break on keyword ASC; bad dates excluded
    val report = wh.read(spark, SearchHistoryPipeline.reportTable)
      .orderBy("created_at").collect()
    assert(report.length == 3)
    assert(report.map(_.getAs[String]("search_keyword")).toSeq ==
      Seq("spark", "airflow", "bigquery"))
    // day 2: airflow and spark tie at 9 -> airflow wins (keyword ASC)
    // day 3: the 54-count row has an unparseable date -> bigquery(55) wins anyway
  }

  test("re-running the truncate stage is idempotent; re-running append double-appends (reference semantics)") {
    val input = tmpDir("sh_csv2")
    val whRoot = tmpDir("sh_wh2")
    writeCsvs(input)
    val wh = new Warehouse(whRoot)
    val d = Seq(LocalDate.of(2021, 3, 10))
    val p = SearchHistoryPipeline(input)
    BatchRunner.run(spark, wh, p, d)
    val raw1 = wh.read(spark, SearchHistoryPipeline.rawTable).count()
    BatchRunner.run(spark, wh, p, d) // re-run the same date
    assert(wh.read(spark, SearchHistoryPipeline.rawTable).count() == raw1)
    // append tables doubled — the reference guards re-runs only via the
    // scheduler (SURVEY.md §2.1); data-level idempotence is
    // Warehouse.partitionedUpsertWrite, tested in WarehouseSpec
    assert(wh.read(spark, SearchHistoryPipeline.typedTable).count() == 2 * 3)
  }
}
