package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** A named group of oracle-checkable queries.
  *
  * Contract (driver): every key in `queries` SHOULD have a matching key in
  * `oracleSql` with an ANSI-SQL equivalent DuckDB runs on the same parquet
  * tables; column names must match exactly (the driver sorts columns by name
  * before hashing). Queries without an oracle get a weaker rows-only check.
  *
  * Determinism rules used throughout this library so hashes match:
  *  - every query ends in a total ORDER BY over a unique key;
  *  - double aggregates go through exact DECIMAL arithmetic, then cast back
  *    to DOUBLE (bit-identical on both engines, no fp-accumulation-order
  *    sensitivity);
  *  - sequential folds over arrays use Spark's `aggregate` HOF and DuckDB's
  *    `list_reduce` (both left-to-right, bit-identical);
  *  - no raw ns-precision timestamps in outputs (Spark truncates parquet ns
  *    to micros; DuckDB keeps ns) — dates or formatted strings instead;
  *  - integer SUMs in OUTPUT columns are CAST(... AS BIGINT) on the DuckDB
  *    side (its integer SUM returns HUGEINT; the driver hashes typed
  *    values) — `scripts/oracle_check.py` fails this class locally;
  *  - portable hashes are md5-derived OR pure integer mixes whose every
  *    intermediate stays inside int64 on BOTH engines (LCG lanes mod 2^31,
  *    exact bit-packs of bounded values); Spark's murmur `hash()` /
  *    `xxhash64` never appear in oracle-checked outputs. Hash the row's
  *    full UNIQUE identity — the fixture has duplicate
  *    (l_orderkey, l_linenumber) pairs, so partial keys silently diverge
  *    on boundary ties.
  */
trait QueryModule {
  def queries: Map[String, (SparkSession, String) => DataFrame]
  def oracleSql: Map[String, String]
}
