package graft.core

import org.apache.spark.sql.{Column, DataFrame}

/** Versioned plugin cuts/features — the Spark form of the reference's
  * exec-a-script plugin loader (`detanalysis/analyzer.py:1102-1165`,
  * decorators `func.py:7-39`, examples
  * `demos/git_repo_example/cuts/cut_chi2_CPDv21Ge.py:22-43` and
  * `features/slope_CPDv21Ge.py:21-32`).
  *
  * A plugin is a named `DataFrame => Column` with metadata; registration
  * into an [[EventTable]] is version-gated: a plugin whose version is ≤
  * the already-registered one is skipped (`analyzer.py:1134-1148`).
  */
final case class Plugin(
    name: String,
    kind: Plugin.Kind,
    version: Double,
    author: String,
    description: String,
    fn: DataFrame => Column)

object Plugin {
  sealed trait Kind
  case object CutKind extends Kind
  case object FeatureKind extends Kind

  def cut(name: String, version: Double, author: String = "",
      description: String = "")(fn: DataFrame => Column): Plugin =
    Plugin(name, CutKind, version, author, description, fn)

  def feature(name: String, version: Double, author: String = "",
      description: String = "")(fn: DataFrame => Column): Plugin =
    Plugin(name, FeatureKind, version, author, description, fn)
}

/** Driver-side plugin registry (`load_cuts`/`load_derived_features`,
  * `analyzer.py:482-520`). */
final class PluginRegistry private (val plugins: Map[String, Plugin]) {

  def register(p: Plugin): PluginRegistry =
    new PluginRegistry(plugins + (p.name -> p))

  /** Apply all plugins of a kind to the table, version-gated against the
    * table's existing cut/feature metadata. */
  def applyAll(table: EventTable): EventTable =
    plugins.values.toSeq.sortBy(_.name).foldLeft(table) { (t, p) =>
      val meta = CutMeta(p.name, p.description, p.version, p.author)
      val existing = p.kind match {
        case Plugin.CutKind     => t.cutMeta.get(p.name)
        case Plugin.FeatureKind => t.featureMeta.get(p.name)
      }
      existing match {
        case Some(prev) if prev.version >= p.version => t // version gate
        case _ =>
          p.kind match {
            case Plugin.CutKind => t.registerCut(p.name, Cut.Pred(p.fn(t.full)), meta)
            case Plugin.FeatureKind => t.addFeature(p.name, p.fn(t.full), meta)
          }
      }
    }
}

object PluginRegistry {
  val empty = new PluginRegistry(Map.empty)
  def apply(ps: Plugin*): PluginRegistry =
    ps.foldLeft(empty)(_.register(_))

  /** Horner-scheme polynomial evaluation, highest coefficient first —
    * `np.polyval` as used by the chi2-vs-amp plugin cut
    * (`demos/git_repo_example/cuts/cut_chi2_CPDv21Ge.py:30-42`). */
  def polyval(coeffs: Seq[Double], x: Column): Column = {
    import org.apache.spark.sql.functions.lit
    coeffs.map(lit(_): Column).reduceLeft((acc, c) => acc * x + c)
  }
}
