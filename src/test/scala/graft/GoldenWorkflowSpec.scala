package graft

import org.apache.spark.sql.functions._
import graft.core._
import graft.cuts._
import graft.stats.Hist

/** Golden end-to-end workflow over a FIXTURES.md-shaped features table:
  * the `demos/analyzer_example.ipynb` flow — multi-file load with merged
  * schema → derived feature → sigma cut + polynomial chi2 cut per
  * channel → master combine → global filter → passage fraction +
  * histogram → mask round-trip (F2/J1). Deterministic fixture, hard
  * asserts on counts and thresholds. */
class GoldenWorkflowSpec extends SparkSpec {
  import spark.implicits._

  private val ch = "CPDv21Ge"

  /** 2 series × 2 "files" (parquet parts), wide per-channel columns.
    * file 2 lacks the `integral_` column → exercises mergeSchema. */
  private lazy val fixtureDir: String = {
    val dir = java.nio.file.Files.createTempDirectory("features").toString
    def mk(series: Long, fileIdx: Int, withIntegral: Boolean) = {
      val n = 500
      val base = (0 until n).map { i =>
        val id = series * 100000 + fileIdx * 1000 + i
        val amp = ((i * 37) % 100) / 10.0                  // 0..9.9
        val chi2 = 1.0 + 0.02 * amp * amp + (i % 7) * 0.01 // quadratic in amp
        val baseline = ((i * 13) % 50) / 25.0 - 1.0        // -1..1
        (id, series, (fileIdx * 1000 + i).toLong, i.toDouble,
          3.0 + (i % 2), amp, chi2, baseline)
      }
      val df = base.toDF("event_number", "series_number", "event_index",
        "event_time", "trigger_type", s"amp_of1x1_nodelay_$ch",
        s"lowchi2_of1x1_nodelay_$ch", s"baseline_$ch")
      val out = if (withIntegral)
        df.withColumn(s"integral_$ch", col(s"amp_of1x1_nodelay_$ch") * 2.0)
      else df
      out.write.mode("overwrite").parquet(s"$dir/file_${series}_$fileIdx")
    }
    mk(1L, 0, withIntegral = true)
    mk(2L, 1, withIntegral = false)
    dir
  }

  test("load: multi-file union, merged schema, stable uid") {
    val t = EventTable.load(spark,
      Seq(s"$fixtureDir/file_1_0", s"$fixtureDir/file_2_1"),
      uidCols = Seq("series_number", "event_number"))
    assert(t.full.count() == 1000)
    assert(t.full.columns.contains(s"integral_$ch")) // mergeSchema kept it
    assert(t.full.select("event_uid").distinct().count() == 1000)
  }

  test("load fallback uid (zipWithIndex): unique and stable across loads") {
    val paths = Seq(s"$fixtureDir/file_1_0", s"$fixtureDir/file_2_1")
    val t1 = EventTable.load(spark, paths)
    val t2 = EventTable.load(spark, paths)
    assert(t1.full.select("event_uid").distinct().count() == 1000)
    val m1 = t1.full.select("event_number", "event_uid")
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val m2 = t2.full.select("event_number", "event_uid")
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(m1 == m2)
  }

  test("golden flow: cuts → combine → passage fraction → histogram") {
    val t0 = EventTable.load(spark,
      Seq(s"$fixtureDir/file_1_0", s"$fixtureDir/file_2_1"),
      uidCols = Seq("series_number", "event_number"))
    val ampRq = s"amp_of1x1_nodelay_$ch"
    val chiRq = s"lowchi2_of1x1_nodelay_$ch"

    // T3 sigma cut on baseline (estimation = all events)
    val basePass = SemiAutoCut.cut(t0.full, s"baseline_$ch",
      CutPars(sigma = Some(2.0)))
    // D3/F4 polynomial chi2-vs-amp cut (plugin style)
    val chiPass = col(chiRq) <
      PluginRegistry.polyval(Seq(0.02, 0.0, 1.03), col(ampRq))

    val t1 = t0
      .registerCut(s"cut_baseline_$ch", Cut.Pred(basePass))
      .registerCut(s"cut_chi2_$ch", Cut.Pred(chiPass))
      .combineCuts(s"cut_all_$ch",
        Seq(s"cut_baseline_$ch", s"cut_chi2_$ch"), CombineMode.And)

    // T4: previous-cut discovery finds both registered channel cuts
    val prev = SemiAutoCut.previousCutsCondition(t1.full, ch)
    assert(t1.full.filter(prev).count() ==
      t1.filter(Cut.Named(s"cut_all_$ch")).count())

    // A10 passage fraction among triggers (trigger_type == 4)
    val frac = t1.passageFraction(Cut.Named(s"cut_all_$ch"),
      Cut.Pred(col("trigger_type") === 4.0)).head.getDouble(0)
    assert(frac > 0.0 && frac < 1.0)

    // F7 global filter to series 1, then A7 histogram under the cut
    val t2 = t1.applyGlobalFilter(Cut.Pred(col("series_number") === 1L))
    val hist = Hist.hist1d(
      t2.filter(Cut.Named(s"cut_all_$ch")), col(ampRq), 64, 0.0, 10.0)
    val histSum = hist.agg(sum("cnt")).head.getLong(0)
    assert(histSum == t2.filter(Cut.Named(s"cut_all_$ch"))
      .filter(col(ampRq) >= 0.0 && col(ampRq) <= 10.0).count())

    // F2/J1 mask round-trip: selected uids → KeyTable cut ≡ direct filter
    val selected = t2.filter(Cut.Named(s"cut_all_$ch")).select("event_uid")
    val viaKeys = t1.registerCut("cut_mask", Cut.KeyTable(selected))
      .filter(Cut.Named("cut_mask") && Cut.Pred(col("series_number") === 1L))
    assert(viaKeys.count() == t2.filter(Cut.Named(s"cut_all_$ch")).count())
  }

  test("T8: spec round trip re-applies to identical selection") {
    val t0 = EventTable.load(spark, Seq(s"$fixtureDir/file_1_0"),
      uidCols = Seq("series_number", "event_number"))
    val spec = CutSpec.Estimated(s"cut_b_$ch", s"baseline_$ch",
      CutPars(sigma = Some(1.5)))
    val loaded = CutSpec.fromJsonOne(CutSpec.toJsonOne(spec))
      .asInstanceOf[CutSpec.Estimated]
    val direct = t0.full.filter(
      SemiAutoCut.cut(t0.full, s"baseline_$ch", CutPars(sigma = Some(1.5))))
    val viaSpec = t0.full.filter(
      SemiAutoCut.cut(t0.full, loaded.rq, loaded.pars))
    assert(direct.count() == viaSpec.count())
  }
}
