package graft

import org.apache.spark.sql.functions._

import graft.llm.Dsir

/** DSIR importance resampling (r11): ground-truth checks independent of
  * the SQL oracle mirror — gram extraction on a hand fixture,
  * log-ratios against hand-computed micro-nats, the selection-quality
  * property (on-target docs outrank off-target docs), and the
  * power-of-two bucket contract. */
class DsirSpec extends SparkSpec {

  test("docGrams: unigrams + adjacent bigrams, exact on a fixture") {
    import spark.implicits._
    val df = Seq((1L, "a b c"), (2L, "x"), (3L, "  p   q  ")).toDF("id", "text")
    val got = Dsir.docGrams(df, "text", "id")
      .as[(Long, String)].collect().toSet
    assert(got == Set(
      (1L, "a"), (1L, "b"), (1L, "c"), (1L, "a b"), (1L, "b c"),
      (2L, "x"),
      (3L, "p"), (3L, "q"), (3L, "p q"))) // multi-space + trim collapse
  }

  test("logRatios: hand-computed micro-nats on a two-bucket toy") {
    import spark.implicits._
    // engineer collisions irrelevant: just check the smoothing algebra
    // by feeding single-token docs and reading back the buckets they
    // actually hashed to
    val target = Seq((1L, "aa"), (2L, "aa"), (3L, "bb")).toDF("id", "text")
    val raw = Seq((4L, "aa"), (5L, "cc")).toDF("id", "text")
    val n = 4096
    val lr = Dsir.logRatios(target, raw, "text", "id", n)
    // totals: Nt = 3 grams, Nr = 2 grams
    val bucketOf = Map(
      "aa" -> bucket("aa", n), "bb" -> bucket("bb", n), "cc" -> bucket("cc", n))
    def expected(ct: Long, cr: Long): Long =
      math.round(math.log(((ct + 1).toDouble * (2 + n)) /
        ((cr + 1).toDouble * (3 + n))) * 1e6)
    val got = lr.as[(Long, Long)].collect().toMap
    assert(got.size == n) // dense spine
    assert(got(bucketOf("aa")) == expected(2, 1))
    assert(got(bucketOf("bb")) == expected(1, 0))
    assert(got(bucketOf("cc")) == expected(0, 1))
    // every untouched bucket smooths to the same baseline
    val baseline = expected(0, 0)
    val touched = bucketOf.values.toSet
    assert(got.filter(kv => !touched.contains(kv._1)).values
      .forall(_ == baseline))
  }

  test("weigh: on-target docs outrank off-target docs (selection " +
      "property, independent of the oracle)") {
    import spark.implicits._
    // target speaks vocabulary A; the pool mixes A-docs and B-docs.
    // DSIR's whole point: the A-docs must come out with the higher
    // importance weights
    val aWords = Seq("alpha", "beta", "gamma", "delta")
    val bWords = Seq("zeta", "omega", "sigma", "kappa")
    def sentence(ws: Seq[String], seed: Int): String =
      (0 until 12).map(i => ws((i * 7 + seed) % ws.length)).mkString(" ")
    val target = (1L to 8L).map(i =>
      (i, sentence(aWords, i.toInt))).toDF("id", "text")
    val pool = ((100L to 104L).map(i => (i, sentence(aWords, i.toInt))) ++
      (200L to 204L).map(i => (i, sentence(bWords, i.toInt))))
      .toDF("id", "text")
    val w = Dsir.weigh(pool, target, "text", "id", 4096)
      .as[(Long, Long, Long)].collect()
    val (on, off) = w.partition(_._1 < 200L)
    assert(on.map(_._3).min > off.map(_._3).max,
      s"every on-target weight must beat every off-target weight: " +
        s"on=${on.toSeq}, off=${off.toSeq}")
    // and selectTopK surfaces exactly the on-target ids first
    val top5 = Dsir.selectTopK(
      Dsir.weigh(pool, target, "text", "id", 4096), "id", 5)
      .as[(Int, Long, Long)].collect()
    assert(top5.map(_._1).toSeq == (1 to 5))
    assert(top5.map(_._2).toSet == (100L to 104L).toSet)
    // ranks descend by weight
    assert(top5.sortBy(_._1).map(_._3).toSeq ==
      top5.map(_._3).sortBy(-_).toSeq)
  }

  test("weight determinism: partition-invariant integer sums") {
    import spark.implicits._
    val docs = (1L to 40L).map(i =>
      (i, s"tok${i % 7} tok${i % 5} tok${i % 3} tok${i % 11}"))
      .toDF("id", "text")
    val target = docs.filter(col("id") % 4 === 0)
    val pool = docs.filter(col("id") % 4 =!= 0)
    val w1 = Dsir.weigh(pool, target, "text", "id", 4096)
      .as[(Long, Long, Long)].collect().sortBy(_._1).toSeq
    val w2 = Dsir.weigh(pool.repartition(13), target.repartition(7),
      "text", "id", 4096).as[(Long, Long, Long)].collect()
      .sortBy(_._1).toSeq
    assert(w1 == w2)
  }

  test("non-power-of-two buckets rejected") {
    import spark.implicits._
    val df = Seq((1L, "a")).toDF("id", "text")
    intercept[IllegalArgumentException] {
      Dsir.logRatios(df, df, "text", "id", 1000)
    }
  }

  private def bucket(s: String, n: Int): Long = {
    val h = graft.functions.MinHashSig.fnv64(
      org.apache.spark.unsafe.types.UTF8String.fromString(s))
    ((h % n) + n) % n
  }
}
