package graft.tools

import java.nio.file.{Files, Paths}

import graft.{Sessions, SparkEntry}

/** Per-query formatted-plan snapshots for the optimization rounds.
  *
  * Usage: runMain graft.tools.PlanSnap <sfDir> <outDir> <suffix> <q1,q2,...>
  *
  * Writes `<outDir>/<query>_<suffix>.txt` with the `.explain("formatted")`
  * output of each named query — the before/after plan evidence the round's
  * OPTIMIZATION notes cite (Exchange count, join strategy, PushedFilters,
  * ReadSchema, codegen spans).
  */
object PlanSnap {
  def main(args: Array[String]): Unit = {
    require(args.length == 4,
      "usage: PlanSnap <sfDir> <outDir> <suffix> <q1,q2,...|headline>")
    val Array(sfDir, outDir, suffix, qlist) = args
    val names =
      if (qlist == "headline") graft.PlanDump.headline
      else qlist.split(",").map(_.trim).filter(_.nonEmpty).toSeq
    val unknown = names.filterNot(SparkEntry.queries.contains)
    require(unknown.isEmpty, s"unknown queries: ${unknown.mkString(", ")}")
    Files.createDirectories(Paths.get(outDir))
    val spark = Sessions.fromEnv()
    spark.sparkContext.setLogLevel("ERROR")
    names.foreach { name =>
      val df = SparkEntry.queries(name)(spark, sfDir)
      val txt = df.queryExecution.explainString(
        org.apache.spark.sql.execution.FormattedMode)
      Files.writeString(Paths.get(s"$outDir/${name}_$suffix.txt"), txt)
      println(s"[plansnap] wrote $outDir/${name}_$suffix.txt")
      spark.catalog.clearCache()
      spark.sparkContext.getPersistentRDDs.values.foreach(_.unpersist(false))
    }
    spark.stop()
  }
}
