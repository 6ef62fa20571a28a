package graft

import org.apache.spark.sql.functions._
import graft.core.Temporal

/** core/Temporal operators vs brute-force references on small frames,
  * plus the plan-shape guarantees the scale story rests on. */
class TemporalSpec extends SparkSpec {
  import spark.implicits._

  // (key, ts, id) rows; ids unique so matches are fully specified
  private val leftRows = Seq(
    (1L, 100L, 10L), (1L, 200L, 11L), (1L, 300L, 12L),
    (2L, 150L, 20L), (2L, 151L, 21L), (3L, 500L, 30L))
  private val rightRows = Seq(
    (1L, 90L, 910L), (1L, 200L, 920L), (1L, 250L, 930L),
    (2L, 151L, 940L), (4L, 100L, 950L))

  private def leftDf = leftRows.toDF("k", "t", "lid")
  private def rightDf = rightRows.toDF("k", "t", "rid")

  private def bruteAsof(backward: Boolean, tol: Option[Long])
      : Map[Long, Option[Long]] =
    leftRows.map { case (k, lt, lid) =>
      val cand = rightRows.filter(r => r._1 == k &&
        (if (backward) r._2 <= lt else r._2 >= lt) &&
        tol.forall(v => math.abs(r._2 - lt) <= v))
      val best =
        if (cand.isEmpty) None
        else Some(if (backward) cand.maxBy(_._2)._3 else cand.minBy(_._2)._3)
      lid -> best
    }.toMap

  test("asofJoin backward matches brute force (inner + left outer)") {
    val expect = bruteAsof(backward = true, tol = None)
    val inner = Temporal.asofJoin(leftDf, rightDf, Seq("k"), "t", "t",
      Seq("rid")).collect()
      .map(r => r.getAs[Long]("lid") -> r.getAs[Long]("r_rid")).toMap
    assert(inner == expect.collect { case (l, Some(r)) => l -> r })
    val outer = Temporal.asofJoin(leftDf, rightDf, Seq("k"), "t", "t",
      Seq("rid"), leftOuter = true).collect()
      .map(r => r.getAs[Long]("lid") ->
        Option(r.getAs[java.lang.Long]("r_rid")).map(_.longValue)).toMap
    assert(outer == expect)
    assert(outer.size == leftRows.size)
  }

  test("asofJoin carries multi-column payloads consistently") {
    val r2 = rightDf.withColumn("rv", col("rid") * 1.5)
    val got = Temporal.asofJoin(leftDf, r2, Seq("k"), "t", "t",
      Seq("rid", "rv")).collect()
    assert(got.nonEmpty)
    got.foreach { row =>
      assert(row.getAs[Double]("r_rv") == row.getAs[Long]("r_rid") * 1.5,
        s"payload columns drifted: $row")
    }
    val sliced = Temporal.asofJoinSliced(leftDf, r2, Seq("k"), "t", "t",
      Seq("rid", "rv"), sliceWidth = 64L).collect()
      .map(r => (r.getAs[Long]("lid"), r.getAs[Long]("r_rid"),
        r.getAs[Double]("r_rv"))).toSet
    val bcast = Temporal.asofJoinBroadcast(leftDf, r2, Seq("k"), "t", "t",
      Seq("rid", "rv")).collect()
      .map(r => (r.getAs[Long]("lid"), r.getAs[Long]("r_rid"),
        r.getAs[Double]("r_rv"))).toSet
    val plain = got.map(r => (r.getAs[Long]("lid"), r.getAs[Long]("r_rid"),
      r.getAs[Double]("r_rv"))).toSet
    assert(sliced == plain && bcast == plain)
  }

  test("asofJoin forward matches brute force") {
    val expect = bruteAsof(backward = false, tol = None)
    val got = Temporal.asofJoin(leftDf, rightDf, Seq("k"), "t", "t",
      Seq("rid"), direction = Temporal.Forward, leftOuter = true).collect()
      .map(r => r.getAs[Long]("lid") ->
        Option(r.getAs[java.lang.Long]("r_rid")).map(_.longValue)).toMap
    assert(got == expect)
  }

  test("asofJoin tolerance drops stale matches") {
    val expect = bruteAsof(backward = true, tol = Some(10L))
    val got = Temporal.asofJoin(leftDf, rightDf, Seq("k"), "t", "t",
      Seq("rid"), tolerance = Some(10L), leftOuter = true).collect()
      .map(r => r.getAs[Long]("lid") ->
        Option(r.getAs[java.lang.Long]("r_rid")).map(_.longValue)).toMap
    assert(got == expect)
    // k=1: t=100 within 10 of right t=90 → match; t=300 is 50 from
    // 250 → nulled even though a backward match exists
    assert(got(10L).contains(910L) && got(12L).isEmpty)
  }

  test("asofJoin shuffles exactly once (union-tag plan shape)") {
    val plan = Temporal.asofJoin(leftDf, rightDf, Seq("k"), "t", "t",
      Seq("rid")).queryExecution.executedPlan.toString
    val exchanges = "Exchange hashpartitioning".r
      .findAllIn(plan).length
    assert(exchanges == 1, s"expected one hash exchange, plan:\n$plan")
    assert(!plan.contains("CartesianProduct") &&
      !plan.contains("BroadcastNestedLoopJoin"))
  }

  test("asofJoinSliced ≡ asofJoin: widths × directions × tol × outer") {
    def norm(df: org.apache.spark.sql.DataFrame): Set[(Long, Option[Long])] =
      df.collect().map(r => (r.getAs[Long]("lid"),
        Option(r.getAs[java.lang.Long]("r_rid")).map(_.longValue))).toSet
    for (w <- Seq(1L, 10L, 64L, 1000L);
         dir <- Seq[Temporal.AsOfDirection](Temporal.Backward,
           Temporal.Forward);
         tol <- Seq(None, Some(10L));
         outer <- Seq(false, true)) {
      val a = norm(Temporal.asofJoin(leftDf, rightDf, Seq("k"), "t", "t",
        Seq("rid"), dir, tol, outer))
      val b = norm(Temporal.asofJoinSliced(leftDf, rightDf, Seq("k"), "t",
        "t", Seq("rid"), w, dir, tol, outer))
      assert(a == b, s"w=$w dir=$dir tol=$tol outer=$outer: $a vs $b")
    }
  }

  test("asofJoinSliced ≡ asofJoin on 400 random rows (deduped right)") {
    val rnd = new scala.util.Random(42)
    val l = Seq.tabulate(200)(i =>
      (rnd.nextInt(5).toLong, rnd.nextInt(1000).toLong, i.toLong))
      .toDF("k", "t", "lid")
    val r = Seq.tabulate(200)(i =>
      (rnd.nextInt(5).toLong, rnd.nextInt(1000).toLong, (1000 + i).toLong))
      .toDF("k", "t", "rid")
      .groupBy("k", "t").agg(min("rid").as("rid")) // contract: deduped
    def norm(df: org.apache.spark.sql.DataFrame): Map[Long, Option[Long]] =
      df.collect().map(row => row.getAs[Long]("lid") ->
        Option(row.getAs[java.lang.Long]("r_rid")).map(_.longValue)).toMap
    for (dir <- Seq[Temporal.AsOfDirection](Temporal.Backward,
        Temporal.Forward); w <- Seq(7L, 67L, 250L)) {
      val a = norm(Temporal.asofJoin(l, r, Seq("k"), "t", "t",
        Seq("rid"), dir, leftOuter = true))
      val b = norm(Temporal.asofJoinSliced(l, r, Seq("k"), "t", "t",
        Seq("rid"), w, dir, leftOuter = true))
      assert(a == b, s"dir=$dir w=$w")
      assert(a.size == 200)
    }
  }

  test("asofJoinBroadcast ≡ asofJoin: directions × tol × outer") {
    def norm(df: org.apache.spark.sql.DataFrame): Set[(Long, Option[Long])] =
      df.collect().map(r => (r.getAs[Long]("lid"),
        Option(r.getAs[java.lang.Long]("r_rid")).map(_.longValue))).toSet
    for (dir <- Seq[Temporal.AsOfDirection](Temporal.Backward,
           Temporal.Forward);
         tol <- Seq(None, Some(10L));
         outer <- Seq(false, true)) {
      val a = norm(Temporal.asofJoin(leftDf, rightDf, Seq("k"), "t", "t",
        Seq("rid"), dir, tol, outer))
      val b = norm(Temporal.asofJoinBroadcast(leftDf, rightDf, Seq("k"),
        "t", "t", Seq("rid"), dir, tol, outer))
      assert(a == b, s"dir=$dir tol=$tol outer=$outer: $a vs $b")
    }
  }

  test("asofJoinBroadcast never shuffles the left side") {
    val plan = Temporal.asofJoinBroadcast(leftDf, rightDf, Seq("k"), "t",
      "t", Seq("rid")).queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastHashJoin"), plan)
    // the only hash exchange allowed is the (small) right-side groupBy
    val exchanges = "Exchange hashpartitioning".r.findAllIn(plan).length
    assert(exchanges <= 1, s"left side must not shuffle, plan:\n$plan")
    assert(!plan.contains("SortMergeJoin") && !plan.contains("Window"), plan)
  }

  test("null keys: window strategy groups them, join strategy drops them") {
    // documented divergence (core/Temporal scaladoc): window PARTITION
    // groups null keys; SQL join equality never matches them
    val l = Seq((null.asInstanceOf[String], 100L, 1L), ("a", 100L, 2L))
      .toDF("k", "t", "lid")
    val r = Seq((null.asInstanceOf[String], 90L, 10L), ("a", 90L, 20L))
      .toDF("k", "t", "rid")
    val windowed = Temporal.asofJoin(l, r, Seq("k"), "t", "t", Seq("rid"))
      .select("lid", "r_rid").collect()
      .map(x => (x.getLong(0), x.getLong(1))).toSet
    assert(windowed == Set((1L, 10L), (2L, 20L))) // null grouped with null
    val joined = Temporal.asofJoinBroadcast(l, r, Seq("k"), "t", "t",
      Seq("rid")).select("lid", "r_rid").collect()
      .map(x => (x.getLong(0), x.getLong(1))).toSet
    assert(joined == Set((2L, 20L))) // SQL semantics: null never equal
  }

  test("intervalJoin equals the naive range join, any bucket width") {
    val intervals = Seq((1L, 95L, 210L, 800L), (1L, 205L, 206L, 801L),
      (2L, 0L, 1000L, 802L), (3L, 501L, 900L, 803L),
      (1L, 300L, 300L, 804L), (2L, 900L, 100L, 805L)) // degenerate: empty
      .toDF("k", "lo", "hi", "iid")
    val naive = leftDf.join(intervals, Seq("k"))
      .filter(col("t") >= col("lo") && col("t") < col("hi"))
      .select("lid", "iid").collect().map(r => (r.getLong(0), r.getLong(1)))
      .toSet
    for (w <- Seq(1L, 7L, 100L, 5000L)) {
      val got = Temporal.intervalJoin(leftDf, "t", intervals, "lo", "hi",
        bucketWidth = w, keys = Seq("k"))
        .select("lid", "iid").collect()
        .map(r => (r.getLong(0), r.getLong(1))).toSet
      assert(got == naive, s"bucketWidth=$w")
    }
    // half-open: t=500 not in [501,900); t=205 in [205,206)
    assert(!naive.contains((30L, 803L)))
  }

  test("resampleLocf: grid inside span, values carried forward, no nulls") {
    // key 1: obs at t=7,25,52 → step-10 grid {10,20,30,40,50}:
    //   10→7, 20→7, 30→25, 40→25, 50→25 (52 is past the last grid pt)
    // key 2: obs at 15,18 → grid {} (no multiple of 10 in [15,18]...
    //   wait: none — 20 > 18) → key dropped
    // key 3: obs exactly at 30 → grid {30} → matches itself
    val obs = Seq((1L, 7L, 1.0), (1L, 25L, 2.0), (1L, 52L, 3.0),
      (2L, 15L, 4.0), (2L, 18L, 5.0), (3L, 30L, 6.0))
      .toDF("k", "t", "v")
    val got = Temporal.resampleLocf(obs, Seq("k"), "t", Seq("v"), step = 10L)
      .select("k", "t", "r_t", "r_v").orderBy("k", "t")
      .collect().map(r =>
        (r.getLong(0), r.getLong(1), r.getLong(2), r.getDouble(3)))
    assert(got.toSeq == Seq(
      (1L, 10L, 7L, 1.0), (1L, 20L, 7L, 1.0), (1L, 30L, 25L, 2.0),
      (1L, 40L, 25L, 2.0), (1L, 50L, 25L, 2.0), (3L, 30L, 30L, 6.0)))
  }

  test("rollingSumLinear ≡ RANGE-frame rolling aggregates at sf0.001") {
    import org.apache.spark.sql.expressions.Window
    val ev = spark.read.parquet("/root/testdata/sf0.001/events.parquet")
      .select(col("event_id"), col("user_id"),
        graft.queries.Q.tsUs.as("us"),
        (col("value") * 100).cast("long").as("vc"))
    val day = 86400000000L
    val wR = Window.partitionBy("user_id").orderBy("us")
      .rangeBetween(-7 * day, 0)
    val frame = ev
      .select(col("event_id"), sum("vc").over(wR).as("s"),
        count(lit(1)).over(wR).as("n"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
      .sortBy(_._1)
    val linear = graft.core.Temporal.rollingSumLinear(
      ev, Seq("user_id"), "us", "vc", 7 * day)
      .select(col("event_id"), col("rolling_sum"), col("rolling_cnt"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
      .sortBy(_._1)
    assert(frame.nonEmpty && linear.sameElements(frame))
  }

  test("rollingSumLinear handles ts ties (peers share the full window)") {
    val rows = Seq((1L, 10L, 1L), (1L, 10L, 2L), (1L, 15L, 4L),
      (1L, 21L, 8L), (2L, 10L, 16L)).toDF("k", "t", "v")
    val got = graft.core.Temporal
      .rollingSumLinear(rows, Seq("k"), "t", "v", window = 10L)
      .select("k", "t", "v", "rolling_sum", "rolling_cnt")
      .orderBy("k", "t", "v")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        r.getLong(3), r.getLong(4)))
    // window [t-10, t]: at t=21 rows with ts in [11, 21] → 4+8
    assert(got.toSeq == Seq(
      (1L, 10L, 1L, 3L, 2L), (1L, 10L, 2L, 3L, 2L),
      (1L, 15L, 4L, 7L, 3L), (1L, 21L, 8L, 12L, 2L),
      (2L, 10L, 16L, 16L, 1L)))
  }

  test("duplicate-(key,ts) right rows: all three strategies tie-break alike") {
    // ADVICE r07: sliced Forward (negated-ts delegation) used to pick
    // the MAX payload at (key, rightTs) ties where windowed/broadcast
    // pick the MIN. Contract: Backward tie → lexicographic max
    // payload; Forward tie → min.
    val l = Seq((1L, 100L, 1L), (1L, 300L, 2L)).toDF("k", "t", "lid")
    val r = Seq((1L, 100L, 910L), (1L, 100L, 920L),
      (1L, 300L, 930L), (1L, 300L, 940L)).toDF("k", "t", "rid")
    def got(df: org.apache.spark.sql.DataFrame): Map[Long, Long] =
      df.select("lid", "r_rid").collect()
        .map(x => (x.getLong(0), x.getLong(1))).toMap
    for (dir <- Seq[Temporal.AsOfDirection](Temporal.Backward,
        Temporal.Forward)) {
      val expect = dir match {
        case Temporal.Backward => Map(1L -> 920L, 2L -> 940L)
        case Temporal.Forward  => Map(1L -> 910L, 2L -> 930L)
      }
      val windowed = got(Temporal.asofJoin(l, r, Seq("k"), "t", "t",
        Seq("rid"), dir))
      val bcast = got(Temporal.asofJoinBroadcast(l, r, Seq("k"), "t", "t",
        Seq("rid"), dir))
      assert(windowed == expect, s"windowed dir=$dir")
      assert(bcast == expect, s"broadcast dir=$dir")
      for (w <- Seq(1L, 64L, 1000L)) {
        val sliced = got(Temporal.asofJoinSliced(l, r, Seq("k"), "t", "t",
          Seq("rid"), w, dir))
        assert(sliced == expect, s"sliced dir=$dir w=$w")
      }
    }
  }

  test("rollingMinMaxLinear ≡ RANGE-frame rolling min/max at sf0.001") {
    import org.apache.spark.sql.expressions.Window
    val ev = spark.read.parquet("/root/testdata/sf0.001/events.parquet")
      .select(col("event_id"), col("user_id"),
        graft.queries.Q.tsUs.as("us"),
        (col("value") * 100).cast("long").as("vc"))
    val day = 86400000000L
    val wR = Window.partitionBy("user_id").orderBy("us")
      .rangeBetween(-7 * day, 0)
    val frame = ev
      .select(col("event_id"), min("vc").over(wR).as("mn"),
        max("vc").over(wR).as("mx"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
      .sortBy(_._1)
    val linear = Temporal.rollingMinMaxLinear(
      ev, Seq("user_id"), "us", "vc", 7 * day)
      .select(col("event_id"), col("rolling_min"), col("rolling_max"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
      .sortBy(_._1)
    assert(frame.nonEmpty && linear.sameElements(frame))
  }

  test("rollingMinMaxLinear handles ts ties and cross-block windows") {
    val rows = Seq((1L, 10L, 5L), (1L, 10L, 2L), (1L, 15L, 4L),
      (1L, 21L, 8L), (2L, 10L, 16L)).toDF("k", "t", "v")
    val got = Temporal
      .rollingMinMaxLinear(rows, Seq("k"), "t", "v", window = 10L)
      .select("k", "t", "v", "rolling_min", "rolling_max")
      .orderBy("k", "t", "v")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        r.getLong(3), r.getLong(4)))
    // window [t-10, t]: t=21 sees [11, 21] = {4, 8} (cross-block: 15
    // is in block 1, 21 in block 2); t=10 peers {5, 2} share min/max
    assert(got.toSeq == Seq(
      (1L, 10L, 2L, 2L, 5L), (1L, 10L, 5L, 2L, 5L),
      (1L, 15L, 4L, 2L, 5L), (1L, 21L, 8L, 4L, 8L),
      (2L, 10L, 16L, 16L, 16L)))
  }

  test("intervalJoinAgg equals intervalJoin + groupBy, any bucket width") {
    val intervals = Seq((1L, 95L, 210L, 800L), (1L, 205L, 206L, 801L),
      (2L, 0L, 1000L, 802L), (3L, 501L, 900L, 803L),
      (1L, 300L, 300L, 804L), (2L, 900L, 100L, 805L))
      .toDF("k", "lo", "hi", "iid")
    val naive = Temporal.intervalJoin(leftDf, "t", intervals, "lo", "hi",
        bucketWidth = 100L, keys = Seq("k"))
      .groupBy("k", "lo", "hi", "iid")
      .agg(count(lit(1)).as("n"), sum("lid").as("sum_lid"))
      .collect().map(r => (r.getLong(3), r.getLong(4), r.getLong(5))).toSet
    for (w <- Seq(1L, 7L, 100L, 5000L)) {
      val got = Temporal.intervalJoinAgg(leftDf, "t", Seq("lid"),
        intervals, "lo", "hi", bucketWidth = w, keys = Seq("k"))
        .collect().map(r => (r.getAs[Long]("iid"), r.getAs[Long]("n"),
          r.getAs[Long]("sum_lid"))).toSet
      assert(got == naive, s"bucketWidth=$w: $got vs $naive")
    }
  }

  test("timestamps at 2^53 raise the double-exactness error; below pass") {
    val ok = Seq((1L, (1L << 53) - 10L), (1L, (1L << 53) - 5L))
      .toDF("k", "t")
    assert(Temporal.sessionize(ok, Seq("k"), "t", gap = 100L)
      .collect().length == 2)
    val bad = Seq((1L, 1L << 53), (1L, (1L << 53) + 10L)).toDF("k", "t")
    val e = intercept[Exception] {
      Temporal.sessionize(bad, Seq("k"), "t", gap = 100L).collect()
    }
    def messages(t: Throwable): Seq[String] =
      if (t == null) Nil
      else Option(t.getMessage).toSeq ++ messages(t.getCause)
    assert(messages(e).exists(_.contains("double-exact")),
      s"unexpected error: $e")
  }

  test("asofJoinAuto probe routes hot feeds to sliced, uniform to windowed") {
    val hotL = Seq.tabulate(2000)(i => (7L, i.toLong, i.toLong))
      .toDF("k", "t", "lid")
    val hotR = Seq.tabulate(500)(i => (7L, i * 4L, 1000L + i))
      .toDF("k", "t", "rid")
    val estHot = Temporal.estimateAsofHotKey(hotL, hotR, Seq("k"))
    assert(estHot > 2000, s"hot estimate too low: $estHot")
    val uniL = Seq.tabulate(2000)(i => ((i % 100).toLong, i.toLong, i.toLong))
      .toDF("k", "t", "lid")
    val uniR = Seq.tabulate(500)(i => ((i % 100).toLong, i * 4L, 1000L + i))
      .toDF("k", "t", "rid")
    val estUni = Temporal.estimateAsofHotKey(uniL, uniR, Seq("k"))
    assert(estUni < 200, s"uniform estimate too high: $estUni")
    // either route returns the windowed plan's results
    def norm(df: org.apache.spark.sql.DataFrame): Set[(Long, Long)] =
      df.select("lid", "r_rid").collect()
        .map(x => (x.getLong(0), x.getLong(1))).toSet
    for ((l, r) <- Seq((hotL, hotR), (uniL, uniR))) {
      val auto = norm(Temporal.asofJoinAuto(l, r, Seq("k"), "t", "t",
        Seq("rid"), sliceWidth = 100L, hotKeyThreshold = 1000L))
      val plain = norm(Temporal.asofJoin(l, r, Seq("k"), "t", "t",
        Seq("rid")))
      assert(auto == plain)
    }
  }

  test("rolling aggregates: null values match RANGE-frame null semantics") {
    import org.apache.spark.sql.expressions.Window
    // k=1: null-valued rows inside and outside windows; k=2 all-null
    val rows = Seq((1L, 0L, Some(3L)), (1L, 5L, None), (1L, 12L, Some(4L)),
      (1L, 30L, None), (2L, 0L, None), (2L, 8L, None))
      .toDF("k", "t", "v")
    val wR = Window.partitionBy("k").orderBy("t").rangeBetween(-10L, 0L)
    val frame = rows.select(col("k"), col("t"),
        sum("v").over(wR).as("s"), count(lit(1)).over(wR).as("n"),
        min("v").over(wR).as("mn"), max("v").over(wR).as("mx"))
      .collect().map(r => (r.getLong(0), r.getLong(1),
        Option(r.get(2)), r.getLong(3), Option(r.get(4)), Option(r.get(5))))
      .toSet
    val sums = Temporal.rollingSumLinear(rows, Seq("k"), "t", "v", 10L)
    val got = Temporal
      .rollingMinMaxLinear(sums, Seq("k"), "t", "v", 10L)
      .select(col("k"), col("t"), col("rolling_sum").as("s"),
        col("rolling_cnt").as("n"), col("rolling_min").as("mn"),
        col("rolling_max").as("mx"))
      .collect().map(r => (r.getLong(0), r.getLong(1),
        Option(r.get(2)), r.getLong(3), Option(r.get(4)), Option(r.get(5))))
      .toSet
    assert(got == frame)
  }

  test("rollingMinMaxLinear ≡ brute force on random data incl. negative ts") {
    val rnd = new scala.util.Random(7)
    val rows = Seq.tabulate(300)(i =>
      (rnd.nextInt(4).toLong, (rnd.nextInt(2001) - 1000).toLong,
        rnd.nextInt(100).toLong, i.toLong))
    val df = rows.toDF("k", "t", "v", "id")
    for (w <- Seq(1L, 13L, 250L, 5000L)) {
      val expect = rows.map { case (k, t, _, id) =>
        val inWin = rows.filter(r => r._1 == k && r._2 >= t - w && r._2 <= t)
        id -> (inWin.map(_._3).min, inWin.map(_._3).max)
      }.toMap
      val got = Temporal.rollingMinMaxLinear(df, Seq("k"), "t", "v", w)
        .select("id", "rolling_min", "rolling_max")
        .collect()
        .map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2))).toMap
      assert(got == expect, s"window=$w")
    }
  }

  test("intervalJoinAgg handles negative timestamps and empty results") {
    val rows = Seq((1L, -95L, 3L), (1L, -5L, 5L), (1L, 40L, 7L))
      .toDF("k", "t", "v")
    val ivs = Seq((1L, -100L, -90L, 1L), (1L, -10L, 50L, 2L),
      (1L, 60L, 70L, 3L)).toDF("k", "lo", "hi", "iid")
    for (w <- Seq(1L, 7L, 64L)) {
      val got = Temporal.intervalJoinAgg(rows, "t", Seq("v"), ivs,
        "lo", "hi", bucketWidth = w, keys = Seq("k"))
        .select("iid", "n", "sum_v").collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
      // iid=1 gets only t=-95; iid=2 gets -5 and 40; iid=3 empty → absent
      assert(got == Set((1L, 1L, 3L), (2L, 2L, 12L)), s"w=$w: $got")
    }
  }

  test("sessionize splits on gap and keeps ts ties together") {
    val rows = Seq((1L, 0L), (1L, 50L), (1L, 50L), (1L, 200L), (1L, 201L),
      (2L, 1000L)).toDF("k", "t")
    val got = Temporal.sessionize(rows, Seq("k"), "t", gap = 100L)
      .groupBy("k", "session_id")
      .agg(count(lit(1)).as("n"), min("t").as("lo"), max("t").as("hi"))
      .orderBy("k", "session_id")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        r.getLong(3), r.getLong(4)))
    assert(got.toSeq == Seq(
      (1L, 1L, 3L, 0L, 50L), (1L, 2L, 2L, 200L, 201L),
      (2L, 1L, 1L, 1000L, 1000L)))
  }

  test("temporal driver queries run and are deterministic at sf0.001") {
    val sf = "/root/testdata/sf0.001"
    for (name <- graft.queries.TemporalQueries.queries.keys) {
      val fn = graft.queries.TemporalQueries.queries(name)
      val a = fn(spark, sf).collect()
      val b = fn(spark, sf).collect()
      assert(a.nonEmpty, s"$name returned no rows")
      assert(a.sameElements(b), s"$name not deterministic")
    }
  }

  test("funnel: nested-min semantics on hand-built edge cases") {
    val steps = Seq("a", "b", "c")
    val ev = Seq(
      // u1: clean completion a@10 b@20 c@30
      (1L, 10L, "a"), (1L, 20L, "b"), (1L, 30L, "c"),
      // u2: b before a is ignored; b@25 after a@15 counts; no c → stage 2
      (2L, 5L, "b"), (2L, 15L, "a"), (2L, 25L, "b"),
      // u3: c at SAME ts as b must not advance (strict >); later c does
      (3L, 10L, "a"), (3L, 20L, "b"), (3L, 20L, "c"), (3L, 40L, "c"),
      // u4: within window expiry — b arrives at t1+101 > within=100
      (4L, 10L, "a"), (4L, 111L, "b"),
      // u5: only non-first steps → stage 0, null times
      (5L, 10L, "b"), (5L, 20L, "c"),
      // u6: repeated first step — earliest a anchors the window; the
      // later a does NOT re-anchor even though its window would fit
      (6L, 10L, "a"), (6L, 200L, "a"), (6L, 250L, "b"), (6L, 260L, "c"))
      .toDF("u", "t", "s")
    def run(df: org.apache.spark.sql.DataFrame) =
      Temporal.funnel(df, "u", col("t"), "s", steps, withinUs = 100L)
        .orderBy("user_id").collect()
        .map(r => (r.getLong(0), r.getLong(1),
          if (r.isNullAt(2)) -1L else r.getLong(2),
          if (r.isNullAt(3)) -1L else r.getLong(3),
          r.getBoolean(4))).toSeq
    val got = run(ev)
    assert(got == Seq(
      (1L, 3L, 10L, 30L, true),
      (2L, 2L, 15L, 25L, false),
      (3L, 3L, 10L, 40L, true),
      (4L, 1L, 10L, 10L, false),
      (5L, 0L, -1L, -1L, false),
      (6L, 1L, 10L, 10L, false)))
    // partitioning-independent (the repartition inside pins ownership)
    assert(run(ev.repartition(7)) == got)
  }

  test("funnelTimes + funnelDropoff: per-stage times and drop-off table") {
    val steps = Seq("a", "b", "c")
    val ev = Seq(
      (1L, 10L, "a"), (1L, 20L, "b"), (1L, 30L, "c"), // complete, dt 10/10
      (2L, 5L, "a"), (2L, 45L, "b"), // stage 2, dt1 = 40
      (3L, 10L, "a"), // stage 1
      (4L, 10L, "b")) // stage 0 — excluded from the table
      .toDF("u", "t", "s")
    val times = Temporal.funnelTimes(ev, "u", col("t"), "s", steps, 100L)
      .orderBy("user_id").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getSeq[Long](2).toSeq))
    assert(times.toSeq == Seq(
      (1L, 3L, Seq(10L, 20L, 30L)),
      (2L, 2L, Seq(5L, 45L)),
      (3L, 1L, Seq(10L)),
      (4L, 0L, Seq.empty)))
    val drop = Temporal.funnelDropoff(ev, "u", col("t"), "s", steps, 100L)
      .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2),
        r.getLong(3), r.getDouble(4),
        if (r.isNullAt(5)) -1.0 else r.getDouble(5)))
    // stage 1: entered 3 (u1,u2,u3), converted 2 (u1,u2),
    //   dts {10, 40} → median 25; stage 2: entered 2, converted 1,
    //   dt {10}; stage 3: entered 1, terminal
    assert(drop.toSeq == Seq(
      (1L, "a", 3L, 2L, 2.0 / 3.0, 25.0),
      (2L, "b", 2L, 1L, 0.5, 10.0),
      (3L, "c", 1L, 0L, 0.0, -1.0)))
  }

  test("funnel: property — automaton ≡ brute nested-min on random streams") {
    val rnd = new scala.util.Random(20260814L)
    val stepsAll = Seq("a", "b", "c", "d")
    (0 until 15).foreach { trial =>
      val k = 2 + rnd.nextInt(3)
      val steps = stepsAll.take(k)
      val within = 20L + rnd.nextInt(200)
      val nUsers = 1 + rnd.nextInt(12)
      val ev = (0 until 300).map { _ =>
        (rnd.nextInt(nUsers).toLong, rnd.nextInt(400).toLong,
          stepsAll(rnd.nextInt(stepsAll.length))) // incl. non-funnel 'd'
      }
      // brute nested-min per user
      def brute(u: Long): (Long, Long, Long, Boolean) = {
        val mine = ev.filter(e => e._1 == u && steps.contains(e._3))
        var stage = 0
        var tFirst = -1L
        var tPrev = -1L
        var advancing = true
        while (advancing && stage < k) {
          val cand = mine.filter(e => e._3 == steps(stage) &&
            (stage == 0 || (e._2 > tPrev && e._2 - tFirst <= within)))
          if (cand.isEmpty) advancing = false
          else {
            val t = cand.map(_._2).min
            if (stage == 0) tFirst = t
            tPrev = t
            stage += 1
          }
        }
        (stage.toLong, tFirst, if (stage > 0) tPrev else -1L, stage == k)
      }
      val funnelUsers = ev.filter(e => steps.contains(e._3)).map(_._1).distinct
      val expect = funnelUsers.sorted.map(u =>
        (u, brute(u)._1, brute(u)._2, brute(u)._3, brute(u)._4))
      val got = Temporal.funnel(ev.toDF("u", "t", "s"), "u", col("t"), "s",
          steps, within)
        .orderBy("user_id").collect()
        .map(r => (r.getLong(0), r.getLong(1),
          if (r.isNullAt(2)) -1L else r.getLong(2),
          if (r.isNullAt(3)) -1L else r.getLong(3),
          r.getBoolean(4))).toSeq
      assert(got == expect, s"trial $trial (k=$k within=$within)")
    }
  }
}
