package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Reusable text-analysis Column builders (library API surface; the
  * oracle-checked query forms live in operators.TextAnalysis / Dedup).
  *
  * All pure `org.apache.spark.sql.functions` compositions — codegen'd, no
  * UDFs, no shuffles. Hashes are md5-based for engine portability (see
  * operators.Dedup scaladoc).
  */
object TextFunctions {

  /** Whitespace tokens. */
  def tokens(text: Column): Column = split(text, " ")

  /** Portable n-bit integer hash of a string (n ≤ 60): md5 hex prefix. */
  def md5Bits(c: Column, hexChars: Int): Column =
    conv(substring(md5(c), 1, hexChars), 16, 10).cast("bigint")

  /** Rolling polynomial fingerprint over whitespace tokens, mod 1e9+7.
    * Sequential left fold — deterministic under any partitioning because it
    * is evaluated per-row over the token array, never across rows.
    */
  def rollingFingerprint(text: Column): Column =
    expr(
      """aggregate(split(%s, ' '), CAST(0 AS BIGINT),
        |  (acc, w) -> pmod(acc * 31 + CAST(conv(substring(md5(w), 1, 8), 16, 10) AS BIGINT), 1000000007))
        |""".stripMargin.format(text.toString))

  /** 60-bit SimHash over whitespace tokens (60 = the md5-prefix hash width;
    * fits a BIGINT with headroom). Runs as graft's one-pass native
    * expression ([[graft.plans.SimHash60]]) — requires the session to have
    * graft's extensions (Sessions.base installs them; or call
    * `GraftExtensions.ensureRegistered`). Bit-identical to
    * [[simhashPortable]] (FunctionsSpec pins it).
    */
  def simhash(text: Column): Column =
    call_function("graft_simhash60", text)

  /** The portable HOF form of [[simhash]] — runs on stock Spark with no
    * extensions. One aggregate() fold carries a 60-slot vote array — each
    * token's hash votes ±1 per bit position — then the sign bits are
    * assembled into the sketch. Kept as the reference implementation the
    * native expression is verified against; prefer [[simhash]] in hot
    * paths (the HOF evaluator rebuilds the vote array per token).
    */
  def simhashPortable(text: Column): Column = {
    val votes =
      """aggregate(
        |  split(%s, ' '),
        |  array_repeat(CAST(0 AS BIGINT), 60),
        |  (acc, w) -> (
        |    transform(acc, (v, b) ->
        |      v + CASE WHEN (CAST(conv(substring(md5(w), 1, 15), 16, 10) AS BIGINT) >> b) %% 2 = 1
        |               THEN 1 ELSE -1 END)
        |  )
        |)""".stripMargin.format(text.toString)
    expr(
      s"""aggregate(
         |  zip_with($votes, sequence(0, 59), (v, b) -> IF(v > 0, shiftleft(CAST(1 AS BIGINT), CAST(b AS INT)), CAST(0 AS BIGINT))),
         |  CAST(0 AS BIGINT),
         |  (acc, x) -> acc + x
         |)""".stripMargin)
  }

  /** Hamming distance between two SimHash sketches. */
  def hamming(a: Column, b: Column): Column =
    bit_count(a.bitwiseXOR(b))

  /** Count of tokens belonging to a marker set (language-ID heuristic). */
  def markerHits(text: Column, markers: Seq[String]): Column = {
    val list = markers.map(m => s"'$m'").mkString(", ")
    expr(s"size(filter(split(${text.toString}, ' '), x -> x IN ($list)))")
  }
}
