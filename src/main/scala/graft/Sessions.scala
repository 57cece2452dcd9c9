package graft

import org.apache.spark.sql.SparkSession

/** Shared SparkSession construction for the driver-facing mains.
  *
  * One place for the settings every entry point needs:
  *  - shuffle partitions sized to the core count (local mode; at cluster
  *    scale this is sized to shuffle volume and AQE coalesces, SCALE.md);
  *  - AQE on (runtime re-planning, skew splitting);
  *  - UTC session timezone (oracle determinism);
  *  - `nanosAsLong` because the `events` fixture carries parquet
  *    TIMESTAMP(NANOS), which Spark 4 otherwise refuses
  *    (PARQUET_TYPE_ILLEGAL); `Tables.load` converts back to micros;
  *  - graft's extensions (native expressions + optimizer rule), so
  *    sessions built here resolve `graft_dot`/`graft_cosine`/`graft_topk`
  *    without the post-hoc `ensureRegistered` path.
  */
object Sessions {
  def base(master: String, shufflePartitions: Int): SparkSession = {
    val spark = SparkSession.builder()
      .master(master)
      .config("spark.sql.shuffle.partitions", shufflePartitions.toString)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .withExtensions(new plans.GraftExtensions)
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    spark
  }

  /** Session per SPARK_GRAFT_CPUS (driver contract default: 32). */
  def fromEnv(): SparkSession = {
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    base(s"local[$cpus]", cpus.toInt)
  }
}
