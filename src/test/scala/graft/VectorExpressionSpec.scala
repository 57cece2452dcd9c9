package graft

import graft.operators.Similarity
import graft.plans.GraftExtensions
import org.apache.spark.sql.functions._

/** Native vector expressions: bit-identity with the HOF reference form,
  * null semantics, and codegen participation.
  */
class VectorExpressionSpec extends SparkSuiteBase {

  test("graft_cosine / graft_dot are bit-identical to the zip_with+aggregate fold on fixture vectors") {
    GraftExtensions.ensureRegistered(spark)
    val e = Tables.embeddings(spark, sf0001).limit(200)
    val q = Tables.embeddings(spark, sf0001).filter(col("vec_id") === 0)
      .select(col("embedding").as("q_emb"))
    val both = e.crossJoin(broadcast(q)).select(
      col("vec_id"),
      call_function("graft_cosine", col("embedding"), col("q_emb")).as("native_cos"),
      Similarity.hofCosine("embedding", "q_emb").as("hof_cos"),
      call_function("graft_dot", col("embedding"), col("q_emb")).as("native_dot"),
      Similarity.hofDot("embedding", "q_emb").as("hof_dot"))
      .collect()
    assert(both.nonEmpty)
    both.foreach { r =>
      // exact bit equality, not approx — same fp ops in the same order
      assert(java.lang.Double.doubleToLongBits(r.getDouble(1)) ==
        java.lang.Double.doubleToLongBits(r.getDouble(2)), s"cosine mismatch at vec ${r.getLong(0)}")
      assert(java.lang.Double.doubleToLongBits(r.getDouble(3)) ==
        java.lang.Double.doubleToLongBits(r.getDouble(4)), s"dot mismatch at vec ${r.getLong(0)}")
    }
  }

  test("null semantics: null operand, length mismatch, null element") {
    GraftExtensions.ensureRegistered(spark)
    import spark.implicits._
    val df = Seq(
      (1L, Seq(1.0f, 2.0f), Seq(3.0f, 4.0f)),   // ok
      (2L, Seq(1.0f), Seq(3.0f, 4.0f)),          // length mismatch
      (3L, null, Seq(3.0f, 4.0f))                // null operand
    ).toDF("id", "a", "b")
    val out = df.select(col("id"), call_function("graft_dot", col("a"), col("b")).as("d"))
      .collect().map(r => r.getLong(0) -> (if (r.isNullAt(1)) None else Some(r.getDouble(1)))).toMap
    assert(out(1L).contains(11.0))
    assert(out(2L).isEmpty)
    assert(out(3L).isEmpty)

    val withNullElem = spark.sql(
      "SELECT graft_dot(array(CAST(1 AS FLOAT), CAST(NULL AS FLOAT)), array(CAST(1 AS FLOAT), CAST(1 AS FLOAT))) AS d")
    assert(withNullElem.collect()(0).isNullAt(0))
  }

  test("double arrays and SQL-text resolution work") {
    GraftExtensions.ensureRegistered(spark)
    val r = spark.sql("SELECT graft_cosine(array(1.0d, 0.0d), array(1.0d, 0.0d)) AS c").collect()(0)
    assert(math.abs(r.getDouble(0) - 1.0) < 1e-15)
  }

  test("native expression stays inside whole-stage codegen") {
    GraftExtensions.ensureRegistered(spark)
    // exchange-free plan so the physical plan is final without running AQE
    val plan = Tables.embeddings(spark, sf0001)
      .select(call_function("graft_cosine", col("embedding"), col("embedding")).as("c"))
      .queryExecution.executedPlan.toString
    // the "*(n)" star marks operators fused into a WholeStageCodegen stage
    assert("""\*\(\d+\) Project \[graft_cosine""".r.findFirstIn(plan).isDefined, plan)
  }
}
