package graft

import org.apache.spark.sql.functions._

import graft.core.Graph

/** Integer-quantized PageRank (r11): ground truth via an independent
  * in-memory reference implementation (same quantization contract),
  * ranking sanity on an authority-shaped graph, dangling/off-spine
  * edge handling, and partition invariance. */
class GraphSpec extends SparkSpec {

  /** Driver-side reference: same integer contract as Graph.pageRank. */
  private def reference(
      edges: Seq[(Long, Long)], nodes: Seq[Long], iters: Int,
      scale: Long = 1000000000L,
      init: Map[Long, Long] = Map.empty): Map[Long, Long] = {
    val n = nodes.size
    val r0 = scale / n
    val base = 15L * r0 / 100L
    val deg = edges.groupBy(_._1).map { case (s, es) => s -> es.size.toLong }
    var r = nodes.map(v => v -> init.getOrElse(v, r0)).toMap
    for (_ <- 1 to iters) {
      val contrib = scala.collection.mutable.Map.empty[Long, Long]
        .withDefaultValue(0L)
      edges.foreach { case (s, d) =>
        if (r.contains(s)) contrib(d) += r(s) / deg(s)
      }
      r = nodes.map(v => v -> (base + 85L * contrib(v) / 100L)).toMap
    }
    r
  }

  test("pageRank: matches the independent reference on a hand graph, " +
      "authority node wins") {
    import spark.implicits._
    // star-ish: everyone links to 0; 0 links to 1; 3 also links to 2
    val es = Seq((1L, 0L), (2L, 0L), (3L, 0L), (4L, 0L), (0L, 1L), (3L, 2L))
    val ns = Seq(0L, 1L, 2L, 3L, 4L)
    val got = Graph.pageRank(es.toDF("src", "dst"), ns.toDF("v"), 5)
      .as[(Long, Long)].collect().toMap
    assert(got == reference(es, ns, 5))
    // the authority collects the most rank; a never-linked node floors
    assert(got(0L) == got.values.max)
    assert(got(4L) == got.values.min)
    assert(got(1L) > got(2L)) // fed by the authority vs by half of 3
  }

  test("pageRank: off-spine edge targets are dropped, multi-edges " +
      "count multiply") {
    import spark.implicits._
    val es = Seq((0L, 1L), (0L, 1L), (0L, 99L), (1L, 0L)) // 99 not a node
    val ns = Seq(0L, 1L)
    val got = Graph.pageRank(es.toDF("src", "dst"), ns.toDF("v"), 3)
      .as[(Long, Long)].collect().toMap
    assert(got.keySet == Set(0L, 1L)) // 99 never materializes
    assert(got == reference(es, ns, 3)) // reference keeps 99's sink loss
    // the off-spine third of 0's rank leaks out of the system: the
    // total must sit strictly below what the 2-node closed loop keeps
    val closed = reference(Seq((0L, 1L), (0L, 1L), (0L, 0L), (1L, 0L)),
      ns, 3)
    assert(got.values.sum < closed.values.sum)
  }

  test("pageRank: partition invariance and iteration monotonicity of " +
      "the quantization") {
    import spark.implicits._
    val es = (0L until 60L).flatMap(i =>
      Seq((i, (i * 7 + 1) % 60), (i, (i * 11 + 3) % 60)))
    val ns = (0L until 60L).toSeq
    val a = Graph.pageRank(es.toDF("src", "dst"), ns.toDF("v"), 4)
      .as[(Long, Long)].collect().sortBy(_._1).toSeq
    val b = Graph.pageRank(
        es.toDF("src", "dst").repartition(13), ns.toDF("v").repartition(7), 4)
      .as[(Long, Long)].collect().sortBy(_._1).toSeq
    assert(a == b)
    assert(a == ns.map(v => v -> reference(es, ns, 4)(v)))
    // truncation only ever loses mass: total ≤ scale
    assert(a.map(_._2).sum <= 1000000000L)
  }

  test("pageRank: warm start from a previous rank vector — partial " +
      "init, stale init rows dropped, cold start unchanged") {
    import spark.implicits._
    val es = (0L until 30L).flatMap(i => Seq((i, (i * 7 + 1) % 30)))
    val ns = (0L until 30L).toSeq
    // previous ranks for a third of the spine + one node (99) that no
    // longer exists — the join must drop it
    val initMap = ns.filter(_ % 3 == 0).map(v => v -> (v % 10 + 1) * 100L)
    val init = (initMap :+ (99L -> 777L)).toDF("v", "rank")
    val warm = Graph.pageRank(es.toDF("src", "dst"), ns.toDF("v"), 2,
        init = Some(init))
      .as[(Long, Long)].collect().toMap
    assert(warm.keySet == ns.toSet) // 99 never materializes
    assert(warm == reference(es, ns, 2, init = initMap.toMap))
    // empty init ≡ cold start (absent nodes default to uniform)
    val emptyInit = spark.emptyDataset[(Long, Long)].toDF("v", "rank")
    val a = Graph.pageRank(es.toDF("src", "dst"), ns.toDF("v"), 2,
      init = Some(emptyInit)).as[(Long, Long)].collect().toMap
    val b = Graph.pageRank(es.toDF("src", "dst"), ns.toDF("v"), 2)
      .as[(Long, Long)].collect().toMap
    assert(a == b)
  }

  test("pageRank: iters=50 (the permitted ceiling) completes with " +
      "bounded plan depth — lineage is truncated between rounds") {
    import spark.implicits._
    val es = (0L until 40L).flatMap(i => Seq((i, (i * 3 + 1) % 40)))
    val ns = (0L until 40L).toSeq
    val out = Graph.pageRank(es.toDF("src", "dst"), ns.toDF("v"), 50)
    // checkpointing must not change the values: the in-memory
    // reference runs the same 50 rounds
    val got = out.as[(Long, Long)].collect().toMap
    assert(got == reference(es, ns, 50))
    // and the final logical plan must NOT embed ~50 copies of the
    // edge-join subtree — with per-5-round truncation at most the
    // last 5 rounds of joins survive in the plan tree (3 joins per
    // round: deg⋈edges, rank⋈edges, spine left-join = 15), vs 150
    // for the untruncated plan
    val joins = out.queryExecution.optimizedPlan.collect {
      case j: org.apache.spark.sql.catalyst.plans.logical.Join => j
    }.size
    assert(joins <= 15, s"plan still embeds $joins joins — lineage " +
      "truncation regressed")
  }

  test("pageRank: guards") {
    import spark.implicits._
    val df = Seq((0L, 1L)).toDF("src", "dst")
    intercept[IllegalArgumentException] {
      Graph.pageRank(df, Seq(0L, 1L).toDF("v"), 0)
    }
    intercept[IllegalArgumentException] {
      Graph.pageRank(df, spark.emptyDataset[Long].toDF("v"), 3)
    }
  }

  /** Driver-side HITS reference: same quantization contract as
    * Graph.hits (both-endpoints-on-spine edges contribute; each
    * half-step renormalizes to `scale` total via exact BigInt
    * floor division; zero-total degrades to zeros). */
  private def hitsRef(
      edges: Seq[(Long, Long)], nodes: Seq[Long], iters: Int,
      scale: Long = 1000000000L): Map[Long, (Long, Long)] = {
    val onSpine = nodes.toSet
    val es = edges.filter(e => onSpine(e._1) && onSpine(e._2))
    def norm(raw: Map[Long, Long]): Map[Long, Long] = {
      val tot = math.max(raw.values.sum, 1L)
      nodes.map(v =>
        v -> (BigInt(raw.getOrElse(v, 0L)) * scale / tot).toLong).toMap
    }
    var hub = nodes.map(v => v -> scale / nodes.size).toMap
    var auth = Map.empty[Long, Long]
    for (_ <- 1 to iters) {
      val ra = scala.collection.mutable.Map.empty[Long, Long]
        .withDefaultValue(0L)
      es.foreach { case (s, d) => ra(d) += hub(s) }
      auth = norm(ra.toMap)
      val rh = scala.collection.mutable.Map.empty[Long, Long]
        .withDefaultValue(0L)
      es.foreach { case (s, d) => rh(s) += auth(d) }
      hub = norm(rh.toMap)
    }
    nodes.map(v => v -> (auth(v), hub(v))).toMap
  }

  test("hits: matches the independent reference on a hand graph — " +
      "pure hubs score hub-high/auth-zero and vice versa") {
    import spark.implicits._
    // 3 and 4 are pure hubs pointing at authorities 0 and 1; 0 also
    // links to 2, so 0 is the one node with both roles
    val es = Seq((3L, 0L), (3L, 1L), (4L, 0L), (4L, 1L), (0L, 2L))
    val ns = Seq(0L, 1L, 2L, 3L, 4L)
    val got = Graph.hits(es.toDF("src", "dst"), ns.toDF("v"), 3)
      .as[(Long, Long, Long)].collect()
      .map(r => r._1 -> (r._2, r._3)).toMap
    assert(got == hitsRef(es, ns, 3))
    // authorities: 0 and 1 tie at the top (same in-link hub set); the
    // never-linked pure hubs have zero authority
    assert(got(0L)._1 == got.values.map(_._1).max)
    assert(got(0L)._1 == got(1L)._1)
    assert(got(3L)._1 == 0L && got(4L)._1 == 0L)
    // hubs: 3 and 4 tie at the top; the link-less sinks 1 and 2 have
    // zero hub score
    assert(got(3L)._2 == got.values.map(_._2).max)
    assert(got(3L)._2 == got(4L)._2)
    assert(got(1L)._2 == 0L && got(2L)._2 == 0L)
    // normalization invariant: truncation only loses mass
    assert(got.values.map(_._1).sum <= 1000000000L)
    assert(got.values.map(_._2).sum <= 1000000000L)
  }

  test("hits: off-spine endpoints drop, multi-edges count multiply, " +
      "partition invariance") {
    import spark.implicits._
    val es = (0L until 60L).flatMap(i =>
      Seq((i, (i * 7 + 1) % 60), (i, (i * 11 + 3) % 60),
        (i, (i * 7 + 1) % 60))) :+ (5L, 999L) :+ (999L, 7L)
    val ns = (0L until 60L).toSeq
    val a = Graph.hits(es.toDF("src", "dst"), ns.toDF("v"), 4)
      .as[(Long, Long, Long)].collect().sortBy(_._1).toSeq
    val b = Graph.hits(
        es.toDF("src", "dst").repartition(13),
        ns.toDF("v").repartition(7), 4)
      .as[(Long, Long, Long)].collect().sortBy(_._1).toSeq
    assert(a == b)
    val ref = hitsRef(es, ns, 4)
    assert(a == ns.map(v => (v, ref(v)._1, ref(v)._2)))
  }

  test("hits: edge-free spine degrades to all-zero vectors, guards " +
      "match pageRank's") {
    import spark.implicits._
    // the only edge leaves the spine → zero totals both half-steps
    val es = Seq((0L, 99L))
    val ns = Seq(0L, 1L)
    val got = Graph.hits(es.toDF("src", "dst"), ns.toDF("v"), 2)
      .as[(Long, Long, Long)].collect().sortBy(_._1).toSeq
    assert(got == Seq((0L, 0L, 0L), (1L, 0L, 0L)))
    intercept[IllegalArgumentException] {
      Graph.hits(es.toDF("src", "dst"), ns.toDF("v"), 0)
    }
    intercept[IllegalArgumentException] {
      Graph.hits(es.toDF("src", "dst"), spark.emptyDataset[Long].toDF("v"), 3)
    }
  }
}
