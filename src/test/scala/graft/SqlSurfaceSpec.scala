package graft

import graft.plans.GraftExtensions

/** The SQL-text surface: fixture views + graft functions resolve in
  * `spark.sql`, matching the DataFrame forms.
  */
class SqlSurfaceSpec extends SparkSuiteBase {

  test("registered views + graft functions answer SQL text") {
    GraftExtensions.ensureRegistered(spark)
    Tables.registerAll(spark, sf0001)

    val topRevenue = spark.sql(
      """SELECT o_orderpriority, COUNT(*) AS n
        |FROM orders JOIN lineitem ON o_orderkey = l_orderkey
        |GROUP BY o_orderpriority ORDER BY o_orderpriority""".stripMargin)
    assert(topRevenue.collect().length == 5)

    val sim = spark.sql(
      """SELECT e.vec_id, graft_cosine(e.embedding, q.embedding) AS cs
        |FROM embeddings e, (SELECT embedding FROM embeddings WHERE vec_id = 0) q
        |WHERE e.vec_id <> 0
        |ORDER BY cs DESC, e.vec_id LIMIT 3""".stripMargin).collect()
    assert(sim.length == 3 && sim.forall(r => math.abs(r.getDouble(1)) <= 1.0 + 1e-9))

    val topk = spark.sql(
      """SELECT o_custkey, graft_topk(o_totalprice, o_orderkey, 2) AS top
        |FROM orders GROUP BY o_custkey ORDER BY o_custkey LIMIT 5""".stripMargin).collect()
    assert(topk.length == 5)
    assert(topk.forall(_.getSeq[org.apache.spark.sql.Row](1).length <= 2))

    val qsk = spark.sql(
      """SELECT l_returnflag,
        |  graft_qsketch(CAST(round(l_quantity * 100) AS BIGINT)) AS sk
        |FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag""".stripMargin).collect()
    assert(qsk.length == 3)
    // sketch rows are (bucket, count) with positive counts, ascending buckets
    qsk.foreach { r =>
      val entries = r.getSeq[org.apache.spark.sql.Row](1)
      assert(entries.nonEmpty && entries.forall(_.getLong(1) > 0))
      val ids = entries.map(_.getInt(0))
      assert(ids == ids.sorted)
    }
  }
}
