package graft

import org.apache.spark.sql.functions._
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import graft.stats.Sampling
import graft.streaming.StreamingMoments

/** §2.9 streaming lift + L3/L5 sampling + S9 dPdI load. */
class StreamingAndSamplingSpec extends SparkSpec {
  import spark.implicits._

  test("streaming moment accumulation matches batch over the same rows") {
    implicit val sqlCtx = spark.sqlContext
    val events = (0 until 40).map { i =>
      (i % 4, Seq(Seq((i % 5).toDouble, (i % 3).toDouble)))
    }
    val stream = MemoryStream[(Int, Seq[Seq[Double]])]
    stream.addData(events: _*)
    val q = StreamingMoments.startToMemory(
      stream.toDF().toDF("freq", "chans"), col("freq"), 1, 1, "mo_test")
    q.processAllAvailable()
    q.stop()
    val streamed = spark.sql(
      "SELECT freq, mo.n AS n, mo.m[0] AS m_re FROM mo_test ORDER BY freq")
      .collect()
    val batch = StreamingMoments.moments(
      events.toDF("freq", "chans"), col("freq"), 1, 1)
      .select(col("freq"), col("mo.n").as("n"),
        element_at(col("mo.m"), 1).as("m_re"))
      .orderBy("freq").collect()
    assert(streamed.length == batch.length)
    streamed.zip(batch).foreach { case (s, b) =>
      assert(s.getInt(0) == b.getInt(0))
      assert(s.getLong(1) == b.getLong(1))
      assert(math.abs(s.getDouble(2) - b.getDouble(2)) < 1e-12)
    }
  }

  test("streaming rechunk equals batch rechunk across micro-batches") {
    import graft.streaming.StreamingRechunk
    import graft.streaming.StreamingRechunk.{Chunk, TraceSeg}
    implicit val sqlCtx = spark.sqlContext
    val segs = (0 until 7).map(i =>
      TraceSeg("ch1", i.toLong, (0 until 5 + i % 3).map(s => i * 100.0 + s)))
    val stream = MemoryStream[TraceSeg]
    val q = StreamingRechunk.rechunkStream(stream.toDS(), chunkLen = 4)
      .writeStream.format("memory").queryName("chunks")
      .outputMode("append").start()
    // two micro-batches to exercise the carry-over state
    stream.addData(segs.take(3): _*)
    q.processAllAvailable()
    stream.addData(segs.drop(3): _*)
    q.processAllAvailable()
    q.stop()
    val got = spark.sql("SELECT * FROM chunks ORDER BY chunkId")
      .as[Chunk].collect().map(_.trace.toSeq)
    val serial = (0 until 7)
      .flatMap(i => (0 until 5 + i % 3).map(s => i * 100.0 + s))
      .grouped(4).filter(_.size == 4).toSeq
    assert(got.length == serial.length)
    got.zip(serial).foreach { case (g, s) => assert(g == s) }
  }

  test("watermarked rate monitor counts in-range events per window") {
    import graft.streaming.StreamingRechunk
    implicit val sqlCtx = spark.sqlContext
    val stream = MemoryStream[(java.sql.Timestamp, Double)]
    val df = stream.toDF().toDF("ts", "value")
    val q = StreamingRechunk.rateMonitor(df, "10 seconds", "10 seconds",
        "5 seconds", 10.0, 20.0)
      .writeStream.format("memory").queryName("rates")
      .outputMode("complete").start()
    val t0 = 1700000000000L
    stream.addData(
      (new java.sql.Timestamp(t0), 15.0),
      (new java.sql.Timestamp(t0 + 1000), 25.0),
      (new java.sql.Timestamp(t0 + 12000), 12.0))
    q.processAllAvailable()
    q.stop()
    val rows = spark.sql(
      "SELECT in_range_cnt, total_cnt FROM rates ORDER BY window.start")
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    assert(rows.toSeq == Seq((1L, 2L), (1L, 1L)))
  }

  test("streaming exact dedup: first occurrence survives across batches") {
    import graft.streaming.StreamingDedup
    import graft.streaming.StreamingDedup.Doc
    implicit val sqlCtx = spark.sqlContext
    val stream = MemoryStream[Doc]
    val q = StreamingDedup.exactDedupStream(stream.toDS())
      .writeStream.format("memory").queryName("dedup_docs")
      .outputMode("append").start()
    stream.addData(Doc(3L, "aa"), Doc(1L, "aa"), Doc(2L, "bb"))
    q.processAllAvailable()
    // "aa" already seen (survivor id 1, min within the batch); "cc" new
    stream.addData(Doc(4L, "aa"), Doc(5L, "cc"), Doc(6L, "bb"))
    q.processAllAvailable()
    q.stop()
    val got = spark.sql("SELECT docId, text FROM dedup_docs ORDER BY docId")
      .as[(Long, String)].collect().toSeq
    assert(got == Seq((1L, "aa"), (2L, "bb"), (5L, "cc")))
    // parity with the batch form when ids follow arrival order: one
    // survivor per distinct text, min id each
    assert(got.map(_._2).distinct.length == got.length)
  }

  test("streaming weighted reservoir: cross-batch == batch selection") {
    import org.apache.spark.sql.functions._
    implicit val sqlCtx = spark.sqlContext
    // (id, weight) rows; priorities are pure functions of the id, so
    // the k-smallest reservoir replays deterministically
    val stream = MemoryStream[(Long, Long)]
    val u = pmod(graft.functions.Fnv64(col("_1").cast("string")),
      lit(1L << 52)).cast("double")
    val agg = stream.toDF().filter(col("_2") > 0)
      .select((-(u / col("_2").cast("double"))).as("negp"), col("_1"))
      .agg(graft.functions.TopKByScore(col("negp"), col("_1"), 5).as("top"))
    val q = agg.writeStream.format("memory").queryName("wres")
      .outputMode("complete").start()
    val batch1 = (0L until 20L).map(i => (i, 10L + i % 7))
    val batch2 = (20L until 40L).map(i => (i, 10L + i % 7))
    stream.addData(batch1: _*)
    q.processAllAvailable()
    stream.addData(batch2: _*)
    q.processAllAvailable()
    q.stop()
    val got = spark.sql("SELECT top FROM wres").collect().last
      .getSeq[org.apache.spark.sql.Row](0).map(_.getLong(1)).toSeq
    // batch reference over ALL rows seen across both batches
    val ref = graft.stats.Sampling.weightedPriorityN(
        (batch1 ++ batch2).toDF("id", "w"), "id", "w", 5)
      .select("id").as[Long].collect().toSeq
    assert(got.sorted == ref.sorted && got.length == 5)
  }

  test("streaming near-dup candidates: cross-batch detection, bounded state") {
    import graft.streaming.StreamingDedup
    import graft.streaming.StreamingDedup.Doc
    implicit val sqlCtx = spark.sqlContext
    val a = "the quick brown fox jumps over the lazy dog tonight again"
    val b = "the quick brown fox jumps over the lazy cat tonight again"
    val c = "completely different words appear in this sentence here today now"
    val stream = MemoryStream[Doc]
    val q = StreamingDedup.nearDupCandidatesStream(stream.toDS())
      .writeStream.format("memory").queryName("neardup_pairs")
      .outputMode("append").start()
    stream.addData(Doc(1L, a), Doc(2L, c))
    q.processAllAvailable()
    // near-dup of doc 1 arrives in a LATER batch — state remembers
    stream.addData(Doc(3L, b), Doc(4L, a))
    q.processAllAvailable()
    q.stop()
    val pairs = spark.sql(
      "SELECT DISTINCT ida, idb FROM neardup_pairs ORDER BY ida, idb")
      .as[(Long, Long)].collect().toSet
    assert(pairs.contains((1L, 4L))) // exact copy collides in all bands
    assert(pairs.contains((1L, 3L)) || pairs.contains((3L, 4L))) // near-dup
    assert(!pairs.exists(p => p._1 == 2L || p._2 == 2L)) // unrelated doc
    // cap = 1: only the first member per bucket is remembered, so the
    // third copy pairs ONLY against it (bounded state, no quadratics)
    val docs = Seq(Doc(1L, a), Doc(2L, a), Doc(3L, a)).toDS()
    val capped = StreamingDedup
      .nearDupCandidatesStream(docs, maxBucket = 1)
      .distinct().collect().map(p => (p.ida, p.idb)).toSet
    assert(capped == Set((1L, 2L), (1L, 3L)))
  }

  test("streaming near-dup: replicated hot bucket, bounded members (r07)") {
    import graft.streaming.StreamingDedup
    import graft.streaming.StreamingDedup.Doc
    implicit val sqlCtx = spark.sqlContext
    // 300 identical docs land in the SAME bucket of every band — the
    // hot-bucket worst case. Members are capped at 20, so doc i pairs
    // against min(i, 20) predecessors; the emission is a lazy iterator
    // (the state function holds O(batch + cap), never a size² list)
    val text = "same exact content in every copy of this document today"
    val hot = (1L to 300L).map(Doc(_, text)).toDS()
    val pairs = StreamingDedup
      .nearDupCandidatesStream(hot, maxBucket = 20).collect()
    val perBand = (0 until 300).map(i => math.min(i, 20)).sum
    assert(pairs.length == 16 * perBand)
    // the smaller side of every pair is one of the 20 admitted members
    assert(pairs.forall(p => p.ida >= 1L && p.ida <= 20L))
    // cross-batch: a later arrival pairs ONLY against the capped
    // member set, not the 300 seen ids
    val stream = MemoryStream[Doc]
    val q = StreamingDedup
      .nearDupCandidatesStream(stream.toDS(), maxBucket = 20)
      .writeStream.format("memory").queryName("hot_pairs")
      .outputMode("append").start()
    stream.addData((1L to 300L).map(Doc(_, text)): _*)
    q.processAllAvailable()
    stream.addData(Doc(1000L, text))
    q.processAllAvailable()
    q.stop()
    val late = spark.sql(
      "SELECT DISTINCT ida, idb FROM hot_pairs WHERE idb = 1000")
      .as[(Long, Long)].collect().toSet
    assert(late == (1L to 20L).map(i => (i, 1000L)).toSet)
  }

  test("streaming as-of enrich: batch parity, state carry, late-fact guard") {
    import graft.streaming.StreamingAsOf
    import graft.streaming.StreamingAsOf.{Dim, Fact}
    implicit val sqlCtx = spark.sqlContext

    // (1) bounded single-batch replay ≡ batch asofJoin(leftOuter) on
    // the events fixture: purchases enriched with latest click value
    val ev = spark.read.parquet("/root/testdata/sf0.001/events.parquet")
      .withColumn("us", graft.queries.Q.tsUs)
    val facts = ev.filter(col("event_type") === "purchase")
      .select(col("user_id").as("key"), col("us").as("ts"),
        col("event_id").as("factId")).as[Fact]
    val dims = ev.filter(col("event_type") === "click")
      .groupBy("user_id", "us").agg(min("value").as("v"))
      .select(col("user_id").as("key"), col("us").as("ts"),
        col("v").as("value")).as[Dim]
    val streamed = StreamingAsOf.asofEnrichStream(facts, dims)
      .collect()
      .map(e => (e.factId, e.dimTs.getOrElse(-1L),
        e.dimValue.getOrElse(-1.0))).sortBy(_._1)
    val batch = graft.core.Temporal.asofJoin(
      facts.toDF(), dims.toDF(), Seq("key"), "ts", "ts", Seq("value"),
      leftOuter = true)
      .select(col("factId"), coalesce(col("r_ts"), lit(-1L)),
        coalesce(col("r_value"), lit(-1.0)))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
      .sortBy(_._1)
    assert(batch.nonEmpty && streamed.sameElements(batch))

    // (2) cross-batch carry + (3) late facts: exact within retained
    // history, unmatched beyond it
    val dstream = MemoryStream[Dim]
    val fstream = MemoryStream[Fact]
    val q = StreamingAsOf.asofEnrichStream(fstream.toDS(), dstream.toDS())
      .writeStream.format("memory").queryName("asof_enrich")
      .outputMode("append").start()
    dstream.addData(Dim(1L, 40L, 0.5), Dim(1L, 100L, 1.5))
    q.processAllAvailable()
    fstream.addData(Fact(1L, 200L, 10L), // matches the newest dim
      Fact(1L, 50L, 11L), // LATE, but dim ts=40 is in history → exact
      Fact(1L, 30L, 12L)) // LATE, nothing ≤ 30 ever consumed → none
    q.processAllAvailable()
    q.stop()
    val got = spark.sql(
      "SELECT factId, dimTs, dimValue FROM asof_enrich ORDER BY factId")
      .collect()
      .map(r => (r.getLong(0),
        if (r.isNullAt(1)) -1L else r.getLong(1),
        if (r.isNullAt(2)) -1.0 else r.getDouble(2)))
    assert(got.toSeq == Seq(
      (10L, 100L, 1.5), (11L, 40L, 0.5), (12L, -1L, -1.0)))

    // (4) dimHistory=1 degenerates to latest-only: the late fact that
    // needed the evicted dim goes unmatched rather than matching a
    // future dim
    val d1 = MemoryStream[Dim]
    val f1 = MemoryStream[Fact]
    val q1 = StreamingAsOf
      .asofEnrichStream(f1.toDS(), d1.toDS(), dimHistory = 1)
      .writeStream.format("memory").queryName("asof_enrich_k1")
      .outputMode("append").start()
    d1.addData(Dim(1L, 40L, 0.5), Dim(1L, 100L, 1.5))
    q1.processAllAvailable()
    f1.addData(Fact(1L, 50L, 21L))
    q1.processAllAvailable()
    q1.stop()
    val gotK1 = spark.sql(
      "SELECT factId, dimTs FROM asof_enrich_k1").collect()
      .map(r => (r.getLong(0), if (r.isNullAt(1)) -1L else r.getLong(1)))
    assert(gotK1.toSeq == Seq((21L, -1L)))
  }

  test("L3 exact-n seeded sample: size, determinism, no replacement") {
    val df = (0 until 1000).map(Tuple1(_)).toDF("x")
    val s1 = Sampling.exactN(df, 50, seed = 7).as[Int].collect()
    val s2 = Sampling.exactN(df, 50, seed = 7).as[Int].collect()
    assert(s1.length == 50)
    assert(s1.toSeq == s2.toSeq)          // deterministic for fixed seed
    assert(s1.distinct.length == 50)      // without replacement
    val s3 = Sampling.exactN(df, 50, seed = 8).as[Int].collect()
    assert(s3.toSeq != s1.toSeq)          // seed-sensitive
  }

  test("weightedPriorityN: ∝-weight inclusion, deterministic, w≤0 excluded") {
    import spark.implicits._
    // 1000 ids weight 1 vs 1000 ids weight 10 → the heavy group should
    // take the strong majority of a 400-row sample (E[heavy] ≈ 10/11)
    val df = ((0 until 1000).map(i => (i.toLong, 1.0)) ++
      (1000 until 2000).map(i => (i.toLong, 10.0)) ++
      Seq((2000L, 0.0), (2001L, -3.0))).toDF("id", "w")
    val got = graft.stats.Sampling.weightedPriorityN(df, "id", "w", 400)
      .collect().map(_.getLong(0))
    assert(got.length == 400)
    assert(!got.contains(2000L) && !got.contains(2001L)) // w ≤ 0 never
    val heavy = got.count(_ >= 1000)
    assert(heavy > 300, s"heavy group took $heavy/400 — not ∝ weight")
    // deterministic: same input → same sample, any partitioning
    val again = graft.stats.Sampling
      .weightedPriorityN(df.repartition(7), "id", "w", 400)
      .collect().map(_.getLong(0))
    assert(got.sorted.sameElements(again.sorted))
  }

  test("L5 log-downsample: identity below target, monotone above") {
    assert(Sampling.logDownsampleIndices(100, 200).toSeq == (0 until 100))
    val idx = Sampling.logDownsampleIndices(100000, 500)
    assert(idx.head == 0 && idx.last == 99999)
    assert(idx.length <= 501)
    assert(idx.sliding(2).forall(p => p(0) < p(1)))
  }

  test("S9 dPdI load round-trips through parquet") {
    val path = java.nio.file.Files
      .createTempDirectory("dpdi").resolve("f.parquet").toString
    Seq(("ch1", Seq(1.0, 2.0), Seq(0.5, -0.5)))
      .toDF("channel", "dpdi_re", "dpdi_im")
      .write.mode("overwrite").parquet(path)
    val d = graft.calib.PhotonCalib.loadDpdi(spark, path, "ch1")
    assert(d.toSeq == Seq(1.0, 0.5, 2.0, -0.5))
  }

  test("streaming funnel: cross-batch advance, no rewind, emit-on-change") {
    import graft.streaming.StreamingFunnel
    import graft.streaming.StreamingFunnel.Ev
    implicit val sqlCtx = spark.sqlContext
    val stream = MemoryStream[Ev]
    val q = StreamingFunnel
      .funnelStream(stream.toDS(), Seq("a", "b", "c"), withinUs = 100L)
      .writeStream.format("memory").queryName("funnel_prog")
      .outputMode("update").start()
    // batch 1: u1 anchors (a@10); u2 has only a later step → stage 0
    stream.addData(Ev(1L, 10L, "a"), Ev(2L, 5L, "b"))
    q.processAllAvailable()
    // batch 2: u1 advances b@20 then completes c@30 — IN ONE batch;
    // u2 emits nothing (no change). An out-of-window b for u1 at
    // t=500 must not advance (window expired at 110).
    stream.addData(Ev(1L, 20L, "b"), Ev(1L, 30L, "c"), Ev(2L, 40L, "c"))
    q.processAllAvailable()
    // batch 3: late/duplicate events cannot rewind u1's completion
    stream.addData(Ev(1L, 15L, "b"))
    q.processAllAvailable()
    q.stop()
    val rows = spark.sql(
      "SELECT user_id, stages, t_first, t_last, completed FROM funnel_prog")
      .collect().map(r => (r.getLong(0), r.getLong(1),
        if (r.isNullAt(2)) -1L else r.getLong(2),
        if (r.isNullAt(3)) -1L else r.getLong(3), r.getBoolean(4)))
    // u1: batch1 emitted stage 1, batch2 emitted stage 3, batch3 silent
    assert(rows.filter(_._1 == 1L).toSet ==
      Set((1L, 1L, 10L, 10L, false), (1L, 3L, 10L, 30L, true)))
    // u2: one stage-0 emission (first batch), nothing after
    assert(rows.filter(_._1 == 2L).toSeq == Seq((2L, 0L, -1L, -1L, false)))
    // latest state per user = max stages (monotone)
    val latest = rows.groupBy(_._1).map { case (u, rs) => u -> rs.maxBy(_._2) }
    assert(latest(1L) == (1L, 3L, 10L, 30L, true))
  }
}
