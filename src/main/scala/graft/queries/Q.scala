package graft.queries

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Shared helpers for the driver-contract query set.
  *
  * Determinism rules (so DuckDB-oracle hashes match exactly):
  *   - every query ORDERs BY a deterministic key in both engines;
  *   - double sums/averages over 2-decimal columns go through exact
  *     integer cents (`round(x*100)::long`) — order-independent, so
  *     Spark's partial-aggregation order can't perturb the result;
  *   - parquet `timestamp[us]` event times (read by Spark as
  *     TIMESTAMP_NTZ) are compared in integer microseconds under the
  *     UTC session timezone (`unix_micros(cast(ts as timestamp))` ≡
  *     DuckDB `epoch_us(ts)` — both treat the naive value as UTC).
  */
object Q {
  type QFn = (SparkSession, String) => DataFrame

  def t(s: SparkSession, dir: String, name: String): DataFrame =
    s.read.parquet(s"$dir/$name.parquet")

  def events(s: SparkSession, dir: String): DataFrame = t(s, dir, "events")

  /** Event time in integer microseconds (DuckDB: `epoch_us(ts)`). */
  val tsUs: Column = expr("unix_micros(cast(ts as timestamp))")

  /** Exact integer cents of a 2-decimal double column. */
  def cents(c: Column): Column = round(c * 100).cast("long")
}
