package graft.llm

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Deterministic source-weighted data mixing — the "sample source A at
  * 25%, keep B whole" stage every pretraining corpus assembly runs.
  * Selection is a pure function of the row id (FNV-1a of the id
  * rendered as a string, taken mod 1000 — the [[graft.functions.Fnv64]]
  * kernel, so the decision is reproducible across runs, partitionings,
  * and engines, and the DuckDB oracle replays it exactly), which makes
  * the mix auditable: the same row is kept or dropped forever, no RNG
  * state. Map-only — a filter over one scan, nothing moves.
  */
object Mixing {

  /** Keep each row of `df` with its source's rate (resolution 1/1000,
    * rates in [0, 1]; sources absent from the map use `defaultRate`).
    * A row survives iff `bucket(id) < round(rate·1000)` where
    * `bucket = pmod(fnv64(cast(id as string)), 1000)`. */
  def mixBySources(
      df: DataFrame,
      sourceCol: String,
      idCol: String,
      rates: Map[String, Double],
      defaultRate: Double = 1.0): DataFrame = {
    require(rates.values.forall(r => r >= 0 && r <= 1),
      "rates must be in [0, 1]")
    val rateCol = coalesce(
      element_at(typedlit(rates), col(sourceCol)),
      lit(defaultRate))
    val bucket = pmod(
      graft.functions.Fnv64(col(idCol).cast("string")), lit(1000L))
    df.filter(bucket < round(rateCol * 1000d).cast("long"))
  }
}
