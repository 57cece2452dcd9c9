package graft
object Bench {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = Sessions.fromEnv()
    // Warm the JVM + codegen + parquet footer cache with the tiny smoke
    // query so one-time session costs aren't billed to the first timed query.
    try { SparkEntry.entry(spark).write.format("noop").mode("overwrite").save() }
    catch { case _: Throwable => () }
    // A failed query records elapsed -1 and lands in `errors`, and is
    // EXCLUDED from total/headline_total — silently-swallowed failures
    // previously made a fast-failing query "improve" the headline number.
    val raw = SparkEntry.queries.map { case (name, fn) =>
      val t0 = System.nanoTime()
      // noop sink: every column is computed and serialized, nothing is
      // written — unlike count(), which lets Catalyst prune the whole
      // projection and would time only the scan.
      val ok =
        try { fn(spark, sfDir).write.format("noop").mode("overwrite").save(); true }
        catch { case e: Throwable =>
          System.err.println(s"[bench] $name FAILED: ${e.getMessage}"); false }
      val elapsed = (System.nanoTime() - t0) / 1e9
      // free this query's cached/checkpointed RDDs so 50+ queries in one
      // session don't squeeze each other's execution memory
      spark.catalog.clearCache()
      spark.sparkContext.getPersistentRDDs.values.foreach(_.unpersist(false))
      name -> (if (ok) elapsed else -1.0)
    }
    val results = raw.filter(_._2 >= 0)
    val errors = raw.collect { case (k, v) if v < 0 => k }.toSeq
    val qs = raw.map { case (k, v) => s"\"" + k + "\":" + v }
      .mkString("{", ",", "}")
    val errs = errors.map("\"" + _ + "\"").mkString("[", ",", "]")
    val total = if (results.nonEmpty) results.values.sum else 0.0
    // headline_total: fixed representative subset (PlanDump.headline), so
    // the number stays comparable across rounds while the full query set
    // keeps growing; "total" remains the sum over everything.
    val headline = PlanDump.headline.flatMap(results.get).sum
    // headline_errors: failed queries from the FIXED headline subset. When
    // nonzero, headline_total covers fewer queries and is NOT comparable
    // across rounds — surfaced explicitly so a fast-failing headline query
    // can't read as a speedup.
    val headlineErrors = PlanDump.headline.count(errors.contains)
    println(s"""{"metric":"total","value":$total,"unit":"sec","n_queries":${results.size},"n_errors":${errors.size},"errors":$errs,"headline_total":$headline,"headline_errors":$headlineErrors,"queries":$qs,"sf":"$sfDir"}""")
    spark.stop()
  }
}
