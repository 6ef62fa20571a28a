package graft.llm

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Curation funnel: chain quality-filter stages and report per-stage
  * attrition — the operational heart of a training-data pipeline
  * (every public pipeline paper leads with this table: N docs in,
  * X% dropped by language ID, Y% by Gopher rules, Z% by dedup...).
  *
  * Scale shape (100 TB): the funnel is ONE scan. Every stage predicate
  * is evaluated per row and the cumulative-survival indicators are
  * summed in a single aggregation (map-side combined, one job, no
  * per-stage passes over the corpus — k stages over 100 TB cost one
  * read, not k). The single aggregate row is then unpivoted to stage
  * rows driver-side-free with `explode`. Stage semantics are
  * CUMULATIVE: stage i's input is the survivor set of stages 0..i−1,
  * matching how pipeline attrition tables are actually read. */
object Curate {

  /** Per-stage attrition table: (stage_idx, stage, rows_in, rows_out,
    * pass_rate). rows_in of stage 0 = corpus size; rows_in of stage i =
    * rows_out of stage i−1. pass_rate = rows_out / rows_in as one exact
    * double division (null when rows_in = 0). */
  def funnel(df: DataFrame, stages: Seq[(String, Column)]): DataFrame = {
    require(stages.nonEmpty, "at least one funnel stage")
    val cums = stages.indices.map { i =>
      val cum = stages.take(i + 1).map(_._2).reduce(_ && _)
      // null predicate results (e.g. a metric over null text) count as
      // FAIL, the way a SQL WHERE treats them
      sum(when(coalesce(cum, lit(false)), 1L).otherwise(0L)).as(s"__s$i")
    }
    val aggd = df.agg(count(lit(1)).as("__s_in"), cums: _*)
    val stageRows = stages.zipWithIndex.map { case ((name, _), i) =>
      val in = if (i == 0) col("__s_in") else col(s"__s${i - 1}")
      struct(lit(i).as("stage_idx"), lit(name).as("stage"),
        in.as("rows_in"), col(s"__s$i").as("rows_out"))
    }
    aggd
      .select(explode(array(stageRows: _*)).as("f"))
      .select(col("f.stage_idx"), col("f.stage"),
        col("f.rows_in"), col("f.rows_out"),
        when(col("f.rows_in") > 0L,
          col("f.rows_out").cast("double") / col("f.rows_in").cast("double"))
          .as("pass_rate"))
  }

  /** The surviving documents: rows passing EVERY stage (one filter —
    * compose with [[funnel]] when the attrition table is also needed;
    * both are single-scan so running the pair costs two reads total). */
  def survivors(df: DataFrame, stages: Seq[(String, Column)]): DataFrame = {
    require(stages.nonEmpty, "at least one funnel stage")
    df.filter(stages.map(_._2).map(p => coalesce(p, lit(false)))
      .reduce(_ && _))
  }
}
