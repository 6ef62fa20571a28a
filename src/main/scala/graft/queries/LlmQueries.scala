package graft.queries

import org.apache.spark.sql.functions._
import graft.llm._
import Q._

/** LLM-data-pipeline operators over documents/embeddings: dedup (exact,
  * MinHash LSH, SimHash, n-gram Jaccard), similarity search (brute-force
  * + LSH ANN), text analysis, multimodal binary plumbing.
  *
  * Oracle-less queries (minhash/simhash/fingerprint/ANN) hinge on
  * xxhash64 / 64-bit-wrap / Scala-side-plane internals DuckDB can't
  * mirror — the driver records rows-only for those; their kernels are
  * unit-tested instead. */
object LlmQueries {

  val queries: Map[String, QFn] = Map(
    // exact dedup groups (hash → survivor id + multiplicity)
    "llm_dedup_exact" -> ((s, dir) =>
      Dedup.exactGroups(t(s, dir, "documents"), col("text"), col("doc_id"))
        .orderBy("content_hash")),

    // exact dedup survivors count
    "llm_dedup_survivors" -> ((s, dir) =>
      Dedup.exactDedup(t(s, dir, "documents"), "text", "doc_id")
        .agg(count(lit(1)).as("cnt"))),

    // token counts (whitespace tokenizer)
    "llm_text_tokens" -> ((s, dir) =>
      t(s, dir, "documents")
        .select(col("doc_id"),
          TextAnalysis.tokenCount(col("text")).as("n_tokens"))
        .orderBy("doc_id")),

    // quality metrics (ratios of exact integer counts)
    "llm_text_quality" -> ((s, dir) =>
      TextAnalysis.qualityMetrics(t(s, dir, "documents"), col("text"))
        .select(col("doc_id"), col("alpha_ratio"), col("avg_token_len"),
          col("n_tokens"))
        .orderBy("doc_id")),

    // language/source distribution (A1 over documents)
    "llm_lang_dist" -> ((s, dir) =>
      t(s, dir, "documents").groupBy("lang")
        .agg(count(lit(1)).as("cnt"),
          sum(col("n_chars")).as("total_chars"))
        .orderBy("lang")),

    // language-ID heuristic predictions (declarative stopword argmax —
    // codegen'd AND oracle-checked)
    "llm_langid_pred" -> ((s, dir) =>
      t(s, dir, "documents")
        .select(col("doc_id"),
          TextAnalysis.langId(col("text")).as("predicted"))
        .groupBy("predicted").agg(count(lit(1)).as("cnt"))
        .orderBy("predicted")),

    // rolling-hash fingerprints via the native fingerprint64 expression
    // (rows-only: 64-bit wrapping multiply not expressible in DuckDB)
    "llm_fingerprint" -> ((s, dir) =>
      t(s, dir, "documents")
        .select(col("doc_id"),
          TextAnalysis.fingerprint(col("text")).as("fingerprint"))
        .orderBy("doc_id")),

    // embedding cosine near-dup: hyperplane-LSH buckets + exact cosine
    // verify (rows-only: plane signs are Scala-side; kernel unit-tested)
    "llm_emb_neardup" -> ((s, dir) =>
      Dedup.embeddingNearDups(t(s, dir, "embeddings"), "embedding",
          "vec_id", planes = 8, minCosine = 0.9)
        .withColumn("cosine", round(col("cosine"), 6))
        .orderBy("ida", "idb")),

    // exact 3-gram Jaccard over a small verified pair set (the J-verify
    // kernel, oracle-checked end to end)
    "llm_ngram_jaccard" -> ((s, dir) => {
      val d = t(s, dir, "documents").filter(col("doc_id") < 20)
      val ids = d.select(col("doc_id"))
      val cands = ids.select(col("doc_id").as("ida"))
        .join(ids.select(col("doc_id").as("idb")), col("ida") < col("idb"))
      Dedup.verifyJaccard(cands, d, "text", "doc_id")
        .filter(col("jaccard") > 0)
        .orderBy("ida", "idb")
    }),

    // MinHash + banded LSH near-dup pipeline (rows-only): top candidate
    // pairs by estimated jaccard, with exact verification attached
    "llm_minhash_neardup" -> ((s, dir) => {
      val d = t(s, dir, "documents")
      // signatures are consumed twice (banding + estimation): persist —
      // at cluster scale this is a checkpoint of the signature table
      val sigs = Dedup.minhashSignatures(d, "text", "doc_id", k = 64)
        .persist()
      sigs.count() // materialize once; three downstream branches reuse
      val cands = Dedup.lshCandidates(sigs, "doc_id", bands = 16, rows = 4)
      // verify-what-you-report: rank by the cheap signature estimate
      // first, run exact-Jaccard verification ONLY on the reported
      // top-k pairs (the expensive stage scales with what is shown,
      // not with the full candidate set)
      val top = Dedup.estimateJaccard(cands, sigs, "doc_id")
        .orderBy(desc("est_jaccard"), col("ida"), col("idb"))
        .limit(20).persist()
      val ver = Dedup.verifyJaccard(top.select("ida", "idb"), d,
        "text", "doc_id")
      top.join(ver, Seq("ida", "idb"), "left")
        .withColumn("jaccard", coalesce(col("jaccard"), lit(0.0)))
        .orderBy(desc("est_jaccard"), col("ida"), col("idb"))
    }),

    // end-to-end near-dup dedup: LSH candidates → verify → connected
    // components → survivors (rows-only: hash-dependent pair set)
    "llm_neardup_dedup" -> ((s, dir) => {
      val d = t(s, dir, "documents")
      val survivors = Dedup.dedupNearMinhash(d, "text", "doc_id",
        jaccardThreshold = 0.8)
      survivors.agg(count(lit(1)).as("survivors"),
        (lit(d.count()) - count(lit(1))).as("removed"))
    }),

    // SimHash signatures + banded hamming candidates (rows-only).
    // maxHamming = 3 is the radius the 4×16-bit banding actually
    // guarantees recall for (pigeonhole: ≤3 differing bits leave ≥1
    // chunk untouched).
    "llm_simhash_neardup" -> ((s, dir) => {
      val sh = Dedup.simhash(t(s, dir, "documents"), "text", "doc_id")
      Dedup.simhashCandidates(sh, "doc_id", maxHamming = 3)
        .orderBy("ida", "idb")
    }),

    // embedding L2 norms (fold order matches DuckDB's sequential sum)
    "llm_emb_norms" -> ((s, dir) =>
      t(s, dir, "embeddings")
        .select(col("vec_id"),
          Similarity.l2Norm(col("embedding")).as("nrm"))
        .orderBy("vec_id")),

    // brute-force cosine top-10 against vec_id 0 (rounded for oracle)
    "llm_sim_topk" -> ((s, dir) => {
      val emb = t(s, dir, "embeddings")
      val q = emb.filter(col("vec_id") === 0)
        .select("embedding").head().getSeq[Float](0).toArray
      emb.select(col("vec_id"),
          round(Similarity.cosine(col("embedding"), typedlit(q)), 6)
            .as("cosine"))
        .orderBy(desc("cosine"), col("vec_id"))
        .limit(10)
    }),

    // per-label centroids (vector mean via posexplode + grouped avg)
    "llm_emb_centroids" -> ((s, dir) =>
      t(s, dir, "embeddings")
        .select(col("label"), posexplode(col("embedding")))
        .groupBy("label", "pos")
        .agg(round(avg(col("col").cast("double")), 6).as("centroid"))
        .orderBy("label", "pos")),

    // LSH-bucketed ANN top-5 for vec_id 0 (rows-only: xxhash-free but
    // plane signs are Scala-side)
    "llm_ann_lsh" -> ((s, dir) => {
      val emb = t(s, dir, "embeddings")
      val q = emb.filter(col("vec_id") === 0)
        .select("embedding").head().getSeq[Float](0).toArray
      Similarity.annTopK(emb, "embedding", "vec_id", q, 5, nPlanes = 8)
        .withColumn("cosine", round(col("cosine"), 6))
    }),

    // IVF ANN: coarse-quantizer index + nprobe scan + exact rerank
    // (rows-only: centroid training is Scala-side)
    "llm_ann_ivf" -> ((s, dir) => {
      val emb = t(s, dir, "embeddings")
      val q = emb.filter(col("vec_id") === 0)
        .select("embedding").head().getSeq[Float](0).toArray
      val cents = Similarity.ivfCentroids(emb, "embedding", k = 8)
      val assigned = Similarity.ivfAssign(emb, "embedding", cents)
      Similarity.ivfTopK(assigned, "embedding", "vec_id", q, 5, cents)
        .withColumn("cosine", round(col("cosine"), 6))
    }),

    // multimodal binary plumbing: byte metadata over text-as-binary
    "mm_binary_meta" -> ((s, dir) =>
      Multimodal.withBinaryMeta(
          t(s, dir, "documents").withColumn("payload",
            col("text").cast("binary")),
          "payload")
        .select(col("doc_id"), col("n_bytes"), col("content_hash"))
        .orderBy("doc_id"))
  )

  val oracle: Map[String, String] = Map(
    "llm_dedup_exact" ->
      "SELECT md5(text) AS content_hash, min(doc_id) AS keep_id, count(*) AS cnt FROM documents GROUP BY content_hash ORDER BY content_hash",
    "llm_dedup_survivors" ->
      "SELECT count(*) AS cnt FROM (SELECT min(doc_id) FROM documents GROUP BY md5(text))",
    "llm_text_tokens" ->
      "SELECT doc_id, CAST(len(regexp_split_to_array(trim(text), '\\s+')) AS BIGINT) AS n_tokens FROM documents ORDER BY doc_id",
    "llm_text_quality" ->
      """SELECT doc_id,
        | CAST(length(regexp_replace(text, '[^\p{L}]', '', 'g')) AS DOUBLE) / length(text) AS alpha_ratio,
        | CAST(length(regexp_replace(text, '\s', '', 'g')) AS DOUBLE) / len(regexp_split_to_array(trim(text), '\s+')) AS avg_token_len,
        | CAST(len(regexp_split_to_array(trim(text), '\s+')) AS BIGINT) AS n_tokens
        |FROM documents ORDER BY doc_id""".stripMargin,
    "llm_lang_dist" ->
      "SELECT lang, count(*) AS cnt, CAST(sum(n_chars) AS BIGINT) AS total_chars FROM documents GROUP BY lang ORDER BY lang",
    "llm_langid_pred" ->
      """WITH c AS (SELECT doc_id,
        | len(list_intersect(regexp_split_to_array(trim(lower(coalesce(text, ''))), '\s+'), ['der','die','das','und','ist','ein','zu','den'])) AS c_de,
        | len(list_intersect(regexp_split_to_array(trim(lower(coalesce(text, ''))), '\s+'), ['the','and','of','to','a','in','is','it'])) AS c_en,
        | len(list_intersect(regexp_split_to_array(trim(lower(coalesce(text, ''))), '\s+'), ['el','la','de','que','y','en','un','es'])) AS c_es,
        | len(list_intersect(regexp_split_to_array(trim(lower(coalesce(text, ''))), '\s+'), ['le','la','de','et','un','est','que','pour'])) AS c_fr,
        | len(list_intersect(regexp_split_to_array(trim(lower(coalesce(text, ''))), '\s+'), ['的','是','了','在','我','有','和','不'])) AS c_zh
        |FROM documents),
        |p AS (SELECT CASE WHEN greatest(c_de,c_en,c_es,c_fr,c_zh) <= 0 THEN 'und'
        | WHEN c_de = greatest(c_de,c_en,c_es,c_fr,c_zh) THEN 'de'
        | WHEN c_en = greatest(c_de,c_en,c_es,c_fr,c_zh) THEN 'en'
        | WHEN c_es = greatest(c_de,c_en,c_es,c_fr,c_zh) THEN 'es'
        | WHEN c_fr = greatest(c_de,c_en,c_es,c_fr,c_zh) THEN 'fr'
        | ELSE 'zh' END AS predicted FROM c)
        |SELECT predicted, count(*) AS cnt FROM p GROUP BY predicted ORDER BY predicted""".stripMargin,
    "llm_ngram_jaccard" ->
      """WITH d AS (SELECT doc_id, regexp_split_to_array(trim(text), '\s+') AS l FROM documents WHERE doc_id < 20),
        |tok AS (SELECT doc_id, unnest(l) AS w, generate_subscripts(l, 1) AS i FROM d),
        |sh AS (SELECT DISTINCT a.doc_id AS doc_id, a.w || ' ' || b.w || ' ' || c.w AS s FROM tok a JOIN tok b ON a.doc_id = b.doc_id AND b.i = a.i + 1 JOIN tok c ON a.doc_id = c.doc_id AND c.i = a.i + 2),
        |n AS (SELECT doc_id, count(*) AS nsh FROM sh GROUP BY doc_id),
        |inter AS (SELECT x.doc_id AS ida, y.doc_id AS idb, count(*) AS it FROM sh x JOIN sh y ON x.s = y.s AND x.doc_id < y.doc_id GROUP BY 1, 2)
        |SELECT ida, idb, CAST(it AS DOUBLE) / (na.nsh + nb.nsh - it) AS jaccard FROM inter JOIN n na ON na.doc_id = ida JOIN n nb ON nb.doc_id = idb WHERE it > 0 ORDER BY ida, idb""".stripMargin,
    "llm_emb_norms" ->
      """SELECT vec_id, sqrt(sum(CAST(x AS DOUBLE) * CAST(x AS DOUBLE))) AS nrm FROM (SELECT vec_id, unnest(embedding) AS x FROM embeddings) GROUP BY vec_id ORDER BY vec_id""",
    "llm_sim_topk" ->
      """WITH q AS (SELECT unnest(embedding) AS qx, generate_subscripts(embedding, 1) AS i FROM embeddings WHERE vec_id = 0),
        |e AS (SELECT vec_id, unnest(embedding) AS x, generate_subscripts(embedding, 1) AS i FROM embeddings),
        |d AS (SELECT e.vec_id AS vec_id, sum(CAST(e.x AS DOUBLE) * CAST(q.qx AS DOUBLE)) AS dot, sqrt(sum(CAST(e.x AS DOUBLE) * CAST(e.x AS DOUBLE))) AS ne FROM e JOIN q USING (i) GROUP BY e.vec_id),
        |nq AS (SELECT sqrt(sum(CAST(qx AS DOUBLE) * CAST(qx AS DOUBLE))) AS nrm FROM q)
        |SELECT vec_id, round(dot / (ne * nrm), 6) AS cosine FROM d, nq ORDER BY cosine DESC, vec_id LIMIT 10""".stripMargin,
    "llm_emb_centroids" ->
      """SELECT label, CAST(i - 1 AS INTEGER) AS pos, round(avg(CAST(x AS DOUBLE)), 6) AS centroid FROM (SELECT label, unnest(embedding) AS x, generate_subscripts(embedding, 1) AS i FROM embeddings) GROUP BY label, pos ORDER BY label, pos""",
    "mm_binary_meta" ->
      "SELECT doc_id, CAST(octet_length(encode(text)) AS BIGINT) AS n_bytes, md5(text) AS content_hash FROM documents ORDER BY doc_id"
  )
}
