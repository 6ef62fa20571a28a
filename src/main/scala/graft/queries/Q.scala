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
  *   - nanosecond parquet timestamps are read as raw longs
  *     (`spark.sql.legacy.parquet.nanosAsLong`) and compared in
  *     microseconds (`ts div 1000` ≡ DuckDB `epoch_us(ts)`).
  */
object Q {
  type QFn = (SparkSession, String) => DataFrame

  def t(s: SparkSession, dir: String, name: String): DataFrame =
    s.read.parquet(s"$dir/$name.parquet")

  def events(s: SparkSession, dir: String): DataFrame = t(s, dir, "events")

  /** Event time in integer microseconds (DuckDB: `epoch_us(ts)`). */
  val tsUs: Column = expr("ts div 1000")

  /** Exact integer cents of a 2-decimal double column. */
  def cents(c: Column): Column = round(c * 100).cast("long")
}
