package graft.cuts

import org.json4s._
import org.json4s.jackson.JsonMethods
import org.json4s.jackson.Serialization

/** Serializable cut definition — the save/load round trip of the reference
  * (`get_cut_dict` `detanalysis/semiautocuts.py:1899-1936`, `load_cut_dict`
  * `:308-381`, batch loaders `:2035-2188`). The reference serializes either
  * resolved thresholds or estimation parameters with −1e8 sentinels for
  * "unset"; we use `Option[Double]` (absent JSON keys) instead (T8,
  * SURVEY.md §2.11).
  */
sealed trait CutSpec { def name: String; def rq: String }

object CutSpec {
  /** Resolved-threshold form: `value_lower/value_upper` in the reference. */
  final case class Fixed(
      name: String,
      rq: String,
      lower: Option[Double],
      upper: Option[Double]) extends CutSpec

  /** Parameterized form: thresholds re-estimated from data at load time
    * (`load_cut_dict` re-runs `do_cut`, `semiautocuts.py:349-377`). */
  final case class Estimated(
      name: String,
      rq: String,
      pars: CutPars,
      binning: Option[BinSpec] = None) extends CutSpec

  /** One [lo, hi] time interval (tuples don't round-trip in json4s). */
  final case class Interval(lo: Double, hi: Double)

  /** Time-interval form (T5). */
  final case class TimeIntervals(
      name: String,
      rq: String,
      pairs: List[Interval]) extends CutSpec

  /** Binning descriptor for T6 binned cuts: bin on `binRq` with either
    * `nbins` equal-width bins over [lo,hi] or explicit percentile-derived
    * edges. */
  final case class BinSpec(
      binRq: String,
      nbins: Int,
      lo: Option[Double],
      hi: Option[Double],
      equalCount: Boolean = false)

  private implicit val fmts: Formats =
    Serialization.formats(ShortTypeHints(
      List(classOf[Fixed], classOf[Estimated], classOf[TimeIntervals]),
      "kind"))

  def toJson(specs: Seq[CutSpec]): String = Serialization.write(specs)
  def fromJson(json: String): Seq[CutSpec] =
    JsonMethods.parse(json).extract[List[CutSpec]]

  def toJsonOne(spec: CutSpec): String = Serialization.write(spec)
  def fromJsonOne(json: String): CutSpec =
    JsonMethods.parse(json).extract[CutSpec]
}
