package graft.core

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** The unified cut (selection) input algebra.
  *
  * The reference accepts any of: nothing, a numpy bool mask, a registered
  * cut name, a boolean column name, a string expression, or a lazy boolean
  * expression, normalized in `_subset_df` (reference
  * `detanalysis/analyzer.py:204-234`) and `_resolve_cut_reference`
  * (`analyzer.py:187-202`). In Spark the natural carrier for all of these
  * is a boolean `Column`; the one non-columnar form (a mask / selected key
  * set, reference `analyzer.py:150-159`) becomes a key table that is
  * semi-joined on the stable `event_uid` (SURVEY.md J1).
  */
sealed trait Cut {
  /** AND-compose two cuts (both columnar forms only). */
  def &&(other: Cut): Cut = (this, other) match {
    case (Cut.All, o) => o
    case (s, Cut.All) => s
    case (a, b)       => Cut.Pred(Cut.toColumn(a) && Cut.toColumn(b))
  }
  def unary_! : Cut = this match {
    case Cut.All => Cut.Pred(lit(false))
    case c       => Cut.Pred(!Cut.toColumn(c))
  }
}

object Cut {
  /** No selection: the full table. (`cut=None` in the reference.) */
  case object All extends Cut

  /** A registered cut / boolean column, referenced by name
    * (`analyzer.py:225-228`). */
  final case class Named(name: String) extends Cut

  /** An arbitrary boolean expression (`analyzer.py:229-231`). */
  final case class Pred(predicate: Column) extends Cut

  /** A SQL-string expression, parsed by Spark SQL — covers vaex's string
    * expression form (`analyzer.py:232-234`). */
  final case class Sql(expression: String) extends Cut

  /** A small, driver-held set of selected `event_uid`s — the Spark form of
    * a numpy index list (`analyzer.py:150-159`). Use only for sets small
    * enough to inline into the plan; otherwise use [[KeyTable]]. */
  final case class Keys(uids: Seq[Long], keyCol: String = "event_uid")
      extends Cut

  /** A distributed set of selected keys — the Spark form of a full-length
    * bool mask (SURVEY.md F2/J1). Applied as a broadcast left-semi join on
    * `keyCol`, never as a driver-side materialized mask. */
  final case class KeyTable(keys: DataFrame, keyCol: String = "event_uid")
      extends Cut

  /** Normalize a columnar cut to a boolean Column. KeyTable cuts have no
    * standalone Column form — they are applied by [[EventTable.filter]] as
    * a semi-join. */
  def toColumn(cut: Cut): Column = cut match {
    case All            => lit(true)
    case Named(n)       => col(n)
    case Pred(p)        => p
    case Sql(e)         => expr(e)
    case Keys(uids, k)  => col(k).isin(uids: _*)
    case KeyTable(_, _) =>
      throw new IllegalArgumentException(
        "KeyTable cuts are join-applied; use EventTable.filter/registerCut")
  }

  /** Rectangular (box) cut: conjunction of `lo <= f <= hi` over features
    * (reference `register_cut_box`, `analyzer.py:328-357`). */
  def box(limits: Seq[(String, Double, Double)]): Cut =
    Pred(limits.map { case (f, lo, hi) => col(f) >= lo && col(f) <= hi }
      .reduce(_ && _))
}

/** Fold modes for combining N boolean cut columns
  * (reference `combine_cuts`, `analyzer.py:379-413`) and for composing the
  * session-wide global filter (`apply_global_filter`, `analyzer.py:419-447`).
  * `Subtract` is AND-NOT; `Replace` only applies to the global filter. */
sealed trait CombineMode
object CombineMode {
  case object And      extends CombineMode
  case object Or       extends CombineMode
  case object Xor      extends CombineMode
  case object Subtract extends CombineMode
  case object Replace  extends CombineMode

  def fold(cols: Seq[Column], mode: CombineMode): Column = mode match {
    case And      => cols.reduce(_ && _)
    case Or       => cols.reduce(_ || _)
    // xor on booleans = inequality; fold pairwise (`analyzer.py:399-404`)
    case Xor      => cols.reduce(_ =!= _)
    // first minus the rest (`analyzer.py:405-409`)
    case Subtract => cols.tail.foldLeft(cols.head)(_ && !_)
    case Replace  => cols.last
  }
}
