package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.types.StructType

/** Date-partitioned CSV file source (SURVEY.md §2 S1; reference
  * `dags/daily_search_history.py:37-53`).
  *
  * Reference semantics preserved:
  *  - one file per logical day, selected by name: `search_<yyyymmdd>.csv`
  *    (`dags/daily_search_history.py:40`) — path selection IS the partition
  *    pruning, exactly like the reference;
  *  - explicit schema, no inference (`:44-49` declares 4×STRING REQUIRED);
  *  - one header row skipped (`skip_leading_rows=1`, `:43`).
  *
  * Scale: at 100 TB the same reader takes a glob/directory of files per day;
  * Spark parallelizes the scan by file split. Schema stays explicit so a
  * malformed file can't silently change types mid-lake.
  */
object CsvSource {

  def read(spark: SparkSession, path: String, schema: StructType): DataFrame =
    spark.read
      .schema(schema)
      .option("header", "true") // skip_leading_rows=1
      .option("mode", "PERMISSIVE") // malformed rows -> nulls, not job failure
      .csv(path)

  /** Reference file-naming convention: `<prefix>/search_<yyyymmdd>.csv`. */
  def dailyPath(prefix: String, dsNodash: String): String =
    s"$prefix/search_$dsNodash.csv"
}
