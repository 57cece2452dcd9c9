package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Reusable vector ops over `ARRAY<FLOAT|DOUBLE>` embedding columns.
  *
  * Higher-order functions only (zip_with/aggregate/transform) — codegen'd
  * per-row evaluation, no UDF, no shuffle. Elements are cast to DOUBLE
  * before arithmetic: deterministic sequential left-to-right folds (see
  * operators.Similarity for why this matters to the oracle).
  *
  * On sessions with graft's extensions installed, dot/cosine uses of this
  * portable form are rewritten to the fused native expression automatically
  * (plans/VectorFoldRewrite) — same results, no intermediate arrays.
  */
object VectorFunctions {

  /** Dot product as a SQL expression string (composable inline). */
  def dotSql(a: String, b: String): String =
    s"aggregate(zip_with($a, $b, (x, y) -> CAST(x AS DOUBLE) * CAST(y AS DOUBLE)), CAST(0 AS DOUBLE), (acc, v) -> acc + v)"

  /** Dot product. `a`/`b` are SQL expression strings (column names). */
  def dot(a: String, b: String): Column = expr(dotSql(a, b))

  def l2Norm(a: String): Column = sqrt(dot(a, a))

  def cosine(a: String, b: String): Column =
    dot(a, b) / (l2Norm(a) * l2Norm(b))

  def l2Distance(a: String, b: String): Column =
    sqrt(expr(s"aggregate(zip_with($a, $b, (x, y) -> pow(CAST(x AS DOUBLE) - CAST(y AS DOUBLE), 2)), CAST(0 AS DOUBLE), (acc, v) -> acc + v)"))

  /** Unit-normalize (pre-normalizing once turns cosine top-k into dot
    * top-k — the right trade at scale when one corpus serves many queries).
    */
  def normalize(a: String): Column =
    expr(s"transform($a, x -> CAST(x AS DOUBLE) / sqrt(${dotSql(a, a)}))")
}
