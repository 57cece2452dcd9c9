package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions.expr

/** Readers for the driver-generated parquet fixtures (TESTDATA.md /
  * FIXTURES.md §A). Parquet carries its own schema; we do NOT infer.
  *
  * Scale posture: these are plain `spark.read.parquet` scans — at 100 TB the
  * same call reads a date/key-partitioned parquet lake and Catalyst does
  * partition pruning + predicate pushdown for free, because every operator in
  * this library keeps filters and projections declarative.
  */
object Tables {
  val names: Seq[String] = Seq(
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings")

  def path(dir: String, name: String): String = s"$dir/$name.parquet"

  def load(spark: SparkSession, dir: String, name: String): DataFrame =
    if (name == "events") {
      // events.ts is parquet TIMESTAMP(NANOS) which Spark cannot represent
      // (PARQUET_TYPE_ILLEGAL). Sessions set
      // spark.sql.legacy.parquet.nanosAsLong=true (see Sessions.base) so the
      // column arrives as BIGINT nanos; convert to a micros TimestampType
      // here (integer div — exact, and identical to DuckDB's ns value at
      // the seconds/date granularity the oracle queries use).
      spark.read.parquet(path(dir, name))
        .withColumn("ts", expr("timestamp_micros(CAST(ts DIV 1000 AS BIGINT))"))
    } else {
      spark.read.parquet(path(dir, name))
    }

  /** Register every fixture table as a temp view so the full engine surface
    * is reachable from `spark.sql(...)` text too (the reference's users
    * write SQL; `graft_dot`/`graft_cosine`/`graft_topk` resolve once the
    * session has graft's extensions).
    */
  def registerAll(spark: SparkSession, dir: String): Unit =
    names.foreach(n => load(spark, dir, n).createOrReplaceTempView(n))

  def region(s: SparkSession, d: String): DataFrame     = load(s, d, "region")
  def nation(s: SparkSession, d: String): DataFrame     = load(s, d, "nation")
  def customer(s: SparkSession, d: String): DataFrame   = load(s, d, "customer")
  def supplier(s: SparkSession, d: String): DataFrame   = load(s, d, "supplier")
  def part(s: SparkSession, d: String): DataFrame       = load(s, d, "part")
  def orders(s: SparkSession, d: String): DataFrame     = load(s, d, "orders")
  def lineitem(s: SparkSession, d: String): DataFrame   = load(s, d, "lineitem")
  def events(s: SparkSession, d: String): DataFrame     = load(s, d, "events")
  def documents(s: SparkSession, d: String): DataFrame  = load(s, d, "documents")
  def embeddings(s: SparkSession, d: String): DataFrame = load(s, d, "embeddings")
}
