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
    var b = SparkSession.builder()
      .master(master)
      .config("spark.sql.shuffle.partitions", shufflePartitions.toString)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
    // SPARK_GRAFT_CONF: semicolon-separated key=value pairs appended to the
    // session config — the parameterization hook for scale-dependent
    // settings (shuffle sizing, join strategy preferences) so cluster
    // profiles don't require a rebuild. Applied last: overrides the
    // defaults above.
    sys.env.get("SPARK_GRAFT_CONF").foreach(_.split(';').filter(_.nonEmpty)
      .foreach { kv =>
        val i = kv.indexOf('=')
        require(i > 0, s"SPARK_GRAFT_CONF entry not key=value: $kv")
        b = b.config(kv.substring(0, i), kv.substring(i + 1))
      })
    val spark = b.withExtensions(new plans.GraftExtensions).getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    spark
  }

  /** Session per SPARK_GRAFT_CPUS (driver contract default: 32). */
  def fromEnv(): SparkSession = {
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    base(s"local[$cpus]", cpus.toInt)
  }
}
