package graft

import java.nio.file.{Files, Paths}

import org.apache.spark.sql.functions._
import graft.core._
import graft.cuts.{CutPars, SemiAutoCut}
import graft.sources.{Ingest, RawConvert, VaexHdf5Reader}
import graft.stats.{Hist, Sampling}
import graft.traces.TraceStore

/** Executes every Scala snippet of NOTEBOOK_PARITY.md, in the notebook's
  * order, against the reference's own demo feature file — the
  * cell-by-cell migration path of `demos/analyzer_example.ipynb`
  * (VERDICT r05 §8). Keep this spec and the doc in lockstep. */
class NotebookParitySpec extends SparkSpec {

  private val demoFile = "/root/reference/demos/features.hdf5"
  private def demoExists = Files.exists(Paths.get(demoFile))

  private val ch = "CPDv21Ge"
  private val amp = s"amp_of1x1_constrained_$ch"

  private lazy val table: EventTable = {
    // §1: Analyzer("features.hdf5") — read + one-time curation
    val store = Files.createTempDirectory("nbparity").toString + "/store"
    val reader = VaexHdf5Reader(demoFile)
    RawConvert.convertEvents(spark, Seq(demoFile), reader, store)
    EventTable(Ingest.readEvents(spark, store))
  }

  test("§2 units metadata survives HDF5 → curated Parquet → load") {
    // df.unit(expr) (`analyzer.py:135-136`): the vaex file's per-column
    // `unit` attribute rides StructField Metadata through the parquet
    // round trip and surfaces via EventTable.unit. The demo file ships
    // no unit attrs, so a synthetic vaex fixture carries them.
    val d = Files.createTempDirectory("units").toString
    Hdf5TestWriter.writeVaex(s"$d/f.h5", Seq(
      Hdf5TestWriter.DoubleCol("series_number", Array(1.0, 1.0)),
      Hdf5TestWriter.DoubleCol("dump_number", Array(0.0, 0.0)),
      Hdf5TestWriter.DoubleCol("event_number", Array(1.0, 2.0)),
      Hdf5TestWriter.DoubleCol("amp", Array(0.25, 0.5))),
      units = Map("amp" -> "amps", "event_number" -> "")) // "" ≡ unitless
    val reader = VaexHdf5Reader(s"$d/f.h5")
    assert(reader.schema("amp").metadata.getString("unit") == "amps")
    RawConvert.convertEvents(spark, Seq(s"$d/f.h5"), reader, s"$d/store")
    val t = EventTable(Ingest.readEvents(spark, s"$d/store"))
    assert(t.unit("amp").contains("amps"))
    assert(t.unit("series_number").isEmpty) // no attr → no unit
  }

  test("§1 load + describe") {
    assume(demoExists, s"$demoFile not present")
    assert(table.view.count() == 1000L)
    val desc = table.describe(amp)
    assert(desc.count() > 0) // summary rows (count/mean/stddev/min/max...)
  }

  test("§3-5 schema, working view, statistics, get_values") {
    assume(demoExists, s"$demoFile not present")
    assert(table.view.columns.take(10).nonEmpty)
    assert(table.view.columns.contains(amp))
    val r = table.view.agg(avg(col(amp)), stddev(col(amp))).head()
    assert(!r.isNullAt(0) && !r.isNullAt(1))
    val values = table.values(amp).collect()
    assert(values.length == 1000)
  }

  test("§6-7a cuts: register, semiauto (T3/T4), combine") {
    assume(demoExists, s"$demoFile not present")
    val t1 = table
      .registerCut("cut_demo_1", Cut.Pred(col("event_index") < 10))
      .registerCut("cut_demo_2", Cut.Sql("event_index > 200"))
    // event_index is 1-based in the demo file → 1..9 pass "< 10"
    assert(t1.values(amp, Cut.Named("cut_demo_1")).count() == 9L)

    val cutBaseline = SemiAutoCut.cut(t1.full, s"baseline_$ch",
      CutPars(sigmaUpper = Some(2.0)))
    val cutChi2 = SemiAutoCut.cut(t1.full, s"chi2_of1x1_constrained_$ch",
      CutPars(sigma = Some(2.0)), estimationCondition = cutBaseline)
    val t2 = t1.registerCut(s"cut_baseline_$ch", Cut.Pred(cutBaseline))
      .registerCut(s"cut_chi2_$ch", Cut.Pred(cutChi2))
    val t3 = t2.combineCuts(s"cut_tot_$ch",
      Seq(s"cut_baseline_$ch", s"cut_chi2_$ch"), CombineMode.And)
    val nTot = t3.filter(Cut.Named(s"cut_tot_$ch")).count()
    val nBase = t3.filter(Cut.Named(s"cut_baseline_$ch")).count()
    assert(nTot > 0 && nTot <= nBase) // AND can only shrink
  }

  test("§8-9 global filter modes + derived feature") {
    assume(demoExists, s"$demoFile not present")
    val t = table
      .registerCut("cut_lo", Cut.Pred(col("event_index") < 100))
      .registerCut("cut_hi", Cut.Pred(col("event_index") >= 900))
    val f1 = t.applyGlobalFilter(Cut.Named("cut_lo"))
    assert(f1.view.count() == 99L) // event_index 1-based: 1..99
    val f2 = f1.applyGlobalFilter(Cut.Named("cut_hi"), CombineMode.Or)
    assert(f2.view.count() == 99L + 101L) // ∪ 900..1000
    assert(f2.dropGlobalFilter.view.count() == 1000L)

    val t4 = t.addFeature("new_feature", col(amp) * 1e6)
    val scaled = t4.view.agg(avg("new_feature")).head.getDouble(0)
    val base = t.view.agg(avg(amp)).head.getDouble(0)
    assert(math.abs(scaled - base * 1e6) <=
      1e-9 * math.max(1.0, math.abs(base * 1e6)))
  }

  test("§10-12 hist overlay, heatmap, downsampled scatter") {
    assume(demoExists, s"$demoFile not present")
    val t = table
      .registerCut("cut_demo_2", Cut.Sql("event_index > 200"))
    val Seq(lo, hi) = t.view
      .agg(min(col(amp)), max(col(amp))).head.toSeq
      .map(_.asInstanceOf[Double])
    val overlay = Hist.hist1dOverlay(t.view, col(amp), 128, lo, hi,
      Map("all" -> lit(true),
        "cut_demo_2" -> Cut.toColumn(Cut.Named("cut_demo_2"))))
    assert(overlay.agg(sum("cnt_all")).head.getLong(0) == 1000L)
    assert(overlay.columns.toSet ==
      Set("bin", "cnt_all", "cnt_cut_demo_2"))

    val y = s"lowchi2_of1x1_constrained_$ch"
    val Seq(ylo, yhi) = t.view
      .agg(min(col(y)), max(col(y))).head.toSeq
      .map(_.asInstanceOf[Double])
    val heat = Hist.hist2d(t.view, col(amp), col(y), 200, 200,
      (lo, hi), (ylo, yhi))
    assert(heat.agg(sum("cnt")).head.getLong(0) == 1000L)

    val scatter = Sampling.exactN(t.view, 800, seed = 42)
      .select(col(amp), col(y))
    assert(scatter.count() == 800L)
  }

  test("§13-14 selection box cut → saved selection → trace fetch") {
    assume(demoExists, s"$demoFile not present")
    val Seq(lo, hi) = table.view
      .agg(min(col(amp)), max(col(amp))).head.toSeq
      .map(_.asInstanceOf[Double])
    val mid = (lo + hi) / 2
    val sel = table.registerBoxCut("cut_event_select",
      Seq((amp, lo, mid)))
    val nSel = sel.filter(Cut.Named("cut_event_select")).count()
    assert(nSel > 0 && nSel < 1000)

    val frozen = sel.applyGlobalFilter(Cut.Named("cut_event_select"))
      .saveCurrentSelection("cut_frozen")
    assert(frozen.dropGlobalFilter.filter(Cut.Named("cut_frozen")).count()
      == nSel)

    // §14: fetch traces for the selected events from a synthetic store
    // carrying the same (series, event) keys as the demo file
    import spark.implicits._
    val keys = sel.filter(Cut.Named("cut_event_select"))
      .select("series_number", "event_number")
    val traceStore = table.view
      .select(col("series_number"), col("event_number"),
        lit(ch).as("channel"))
      .withColumn("trace", transform(sequence(lit(0), lit(31)),
        i => (col("event_number") * 7 + i * 3).cast("double")))
    val fetched = TraceStore.fetch(traceStore, keys,
      channels = Seq(ch), nbEventsLimit = 1000)
    assert(fetched.count() == nSel)
    assert(fetched.select("trace").head.getSeq[Double](0).length == 32)
  }
}
