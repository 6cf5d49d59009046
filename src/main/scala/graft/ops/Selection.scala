package graft.ops

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.util.Tables._

/** Data-selection, sketching, and calibration keys (round 8): DSIR
  * importance resampling, the count-min sketch, the corpus kNN graph,
  * and calibration of the learned quality classifier — the remaining
  * selection-side components of a production curation stack, each wired
  * over graft.api.{Selection, Similarity, Quality}.
  *
  * Scale notes:
  *  - DSIR: the target slice collapses to a |buckets|-row broadcast
  *    model; weighting is one corpus-sized feature pass;
  *  - count-min: aggregation state is depth×width cells — the map-side
  *    partial agg bounds shuffle volume regardless of vocabulary size;
  *  - kNN graph: a shuffle-hash equi-join on the sign bucket — pair
  *    space is inverted-list-bounded, never |corpus|²;
  *  - calibration: ≤10-row bin frames off one doc-keyed margin agg.
  */
object Selection {

  /** DuckDB twin of graft.api.Similarity.signBucket (8 bits, MSB = dim 1) */
  private def signBucketSql(e: String): String =
    (0 until 8).map(i =>
      s"(CASE WHEN $e[${i + 1}] >= 0 THEN ${1 << (7 - i)} ELSE 0 END)")
      .mkString(" + ")

  /** DuckDB twin of the codegen'd sequential double dot-product fold */
  private def dotSql(a: String, b: String): String =
    s"list_sum(list_transform(list_zip($a, $b), " +
      "p -> CAST(p[1] AS DOUBLE) * CAST(p[2] AS DOUBLE)))"

  /** CMS geometry for llm_heavy_hitters_cms: 4 hash rows × 16 buckets.
    * Width 16 against the ~31-word fixture vocabulary FORCES collisions,
    * so the est ≥ exact overestimate is visible in the checked output
    * (production widths are 2⁰⁰⁰s; the operator is width-parametric). */
  private val CmsDepth = 4
  private val CmsWidth = 16

  /** DuckDB twin of the count-min bucket (graft.api.Selection.cmsBucket):
    * 15 md5 hex chars of "cms<r>|token" parsed as a 60-bit int, mod width
    * (positive by construction — the llm_simhash_md5 parsing precedent). */
  private def cmsBucketSql(r: String, token: String): String =
    s"CAST('0x' || substr(md5('cms' || CAST($r AS VARCHAR) || '|' || " +
      s"$token), 1, 15) AS BIGINT) % $CmsWidth"

  /** PII pattern classes for llm_pii_audit — ASCII-only regex syntax
    * shared verbatim by Java (Spark) and RE2 (DuckDB): character
    * classes, bounded repetition, no lookaround, no word boundaries. */
  private val PiiPatterns: Seq[(String, String)] = Seq(
    "email" -> "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}",
    "phone" -> "[0-9]{3}-[0-9]{3}-[0-9]{4}",
    "ipv4" -> "[0-9]{1,3}\\.[0-9]{1,3}\\.[0-9]{1,3}\\.[0-9]{1,3}",
    "digit_id" -> "[0-9]{4,}")

  /** Shared DuckDB CTEs for the DSIR keys: bigram-featurized raw/target
    * slices (lang <> 'en' vs lang = 'en'), per-bucket counts, the 1-row
    * totals, the add-one-smoothed log-likelihood-ratio model (each ln
    * rounded to micro BEFORE the subtraction — the Spark leaf order),
    * and the per-doc weight sum. */
  private def dsirCte: String =
    """rawd AS (SELECT doc_id, text FROM documents WHERE lang <> 'en'),
      |tgtd AS (SELECT doc_id, text FROM documents WHERE lang = 'en'),
      |rf AS (SELECT doc_id, substr(md5(token), 1, 1) AS bucket,
      |    COUNT(*) AS n
      |  FROM (SELECT doc_id, unnest(list_concat(tk,
      |      list_transform(range(1, len(tk)),
      |        i -> tk[CAST(i AS INT)] || ' ' || tk[CAST(i AS INT) + 1])))
      |      AS token
      |    FROM (SELECT doc_id, string_split_regex(text, ' ') AS tk
      |          FROM rawd)) GROUP BY 1, 2),
      |tf AS (SELECT doc_id, substr(md5(token), 1, 1) AS bucket,
      |    COUNT(*) AS n
      |  FROM (SELECT doc_id, unnest(list_concat(tk,
      |      list_transform(range(1, len(tk)),
      |        i -> tk[CAST(i AS INT)] || ' ' || tk[CAST(i AS INT) + 1])))
      |      AS token
      |    FROM (SELECT doc_id, string_split_regex(text, ' ') AS tk
      |          FROM tgtd)) GROUP BY 1, 2),
      |tc AS (SELECT bucket, CAST(SUM(n) AS BIGINT) AS tn
      |  FROM tf GROUP BY 1),
      |rc AS (SELECT bucket, CAST(SUM(n) AS BIGINT) AS rn
      |  FROM rf GROUP BY 1),
      |tt AS (SELECT CAST(SUM(n) AS BIGINT) AS t FROM tf),
      |rt AS (SELECT CAST(SUM(n) AS BIGINT) AS t FROM rf),
      |model AS (SELECT bucket,
      |    CAST(ROUND(ln(CAST(COALESCE(tn, 0) + 1 AS DOUBLE)
      |        / CAST(tt.t + 16 AS DOUBLE)) * 1000000) AS BIGINT)
      |    - CAST(ROUND(ln(CAST(COALESCE(rn, 0) + 1 AS DOUBLE)
      |        / CAST(rt.t + 16 AS DOUBLE)) * 1000000) AS BIGINT)
      |      AS llr_micro
      |  FROM tc FULL OUTER JOIN rc USING (bucket), tt, rt),
      |wts AS (SELECT f.doc_id,
      |    CAST(SUM(f.n * m.llr_micro) AS BIGINT) AS w_micro
      |  FROM rf f JOIN model m USING (bucket) GROUP BY 1)""".stripMargin

  val entries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // DSIR importance weights (Xie et al. 2023): how target-like is
    // every raw doc, as the hashed-bigram log-ratio log(p_tgt/p_raw) —
    // target slice = the corpus's 'en' docs, raw = the rest. The
    // target collapses to a 16-row broadcast model; weighting is ONE
    // corpus-sized feature pass. Exact integer micro-unit sums (each
    // ln rounded at its leaf), so the frame hash-matches cross-engine.
    "llm_dsir_weights" -> ((s, d) => {
      val docs = documents(s, d)
      graft.api.Selection.dsirWeights(
        docs.filter(col("lang") =!= "en"),
        docs.filter(col("lang") === "en"),
        col("doc_id"), col("text"))
        .orderBy("doc_id")
    }),

    // the SELECT step: top-50 raw docs by DSIR weight — the docs the
    // resampler would feed to training first. Global top-k is
    // TakeOrderedAndProject (per-partition heads + one k-row merge),
    // never a full corpus sort.
    "llm_dsir_select" -> ((s, d) => {
      val docs = documents(s, d)
      graft.api.Selection.dsirSelect(
        docs.filter(col("lang") =!= "en"),
        docs.filter(col("lang") === "en"),
        col("doc_id"), col("text"), k = 50)
    }),

    // corpus kNN graph (graft.api.Similarity.knnGraph): every
    // embedding's top-3 neighbors among its sign-bucket inverted list
    // + its first one-bit-flip list (nprobe=2) — the backbone of
    // graph-based semantic dedup / diversity selection. A shuffle-hash
    // equi-join on the bucket key: pair space is list-bounded, neither
    // side broadcasts, AQE splits skewed lists.
    "llm_knn_graph" -> ((s, d) =>
      graft.api.Similarity.knnGraph(embeddings(s, d), col("vec_id"),
        col("embedding"), k = 3, nprobe = 2)
        .orderBy("src_id", "rk")),

    // count-min heavy hitters (Cormode & Muthukrishnan 2005): top-20
    // tokens by sketch estimate with the exact count beside it —
    // est ≥ exact everywhere, and the deliberately narrow 16-bucket
    // width makes the collision overestimate visible in the checked
    // rows. The sketch's aggregation state is 4×16 cells, so the
    // map-side partial agg bounds shuffle volume regardless of
    // vocabulary size — the bounded-memory frequency primitive.
    "llm_heavy_hitters_cms" -> ((s, d) =>
      graft.api.Selection.heavyHittersCms(documents(s, d), col("text"),
        depth = CmsDepth, width = CmsWidth, k = 20)),

    // reliability diagram of the learned quality classifier: predicted
    // probability deciles vs actual positive counts — per-bin sums are
    // EXACT integers (sum of 6-dp-rounded sigmoids and label counts),
    // so calibration is inspectable without a single float comparison.
    // Model = ONE epoch at lr 2⁻⁵ (31250 micro — power of two, the
    // IEEE-exact-update rule): an early-training model whose
    // probabilities genuinely SPREAD over the deciles; the fully-fit
    // 2-epoch model saturates every doc into the top bin (that
    // overconfidence is what llm_quality_ece reports).
    "llm_quality_calibration" -> ((s, d) => {
      val docs = documents(s, d)
      val feats = graft.api.Corpus.hashFeatures(docs, col("doc_id"),
        col("text"))
      val labels = docs.select(col("doc_id"),
        array_contains(split(col("text"), " "), "join").cast("int").as("y"))
      val model = graft.api.Quality.trainStep(feats, labels,
        graft.api.Quality.emptyWeights(docs), lrMicro = 31250L)
      graft.api.Quality.reliability(feats, labels, model)
    }),

    // expected calibration error over the same deciles: the numerator
    // telescopes to the exact integer Σ|sum_p_micro − n_pos·10⁶|, so
    // the only float is ONE final division of exact integers.
    "llm_quality_ece" -> ((s, d) => {
      val docs = documents(s, d)
      val feats = graft.api.Corpus.hashFeatures(docs, col("doc_id"),
        col("text"))
      val labels = docs.select(col("doc_id"),
        array_contains(split(col("text"), " "), "join").cast("int").as("y"))
      val model = graft.api.Quality.train(feats, labels, epochs = 2)
      graft.api.Quality.eceMicro(feats, labels, model)
    }),

    // the SAMPLED DSIR step — Gumbel-top-k importance resampling
    // (sample ∝ exp(w) without replacement) with DETERMINISTIC salted-
    // hash noise, so every run draws the same docs and a re-salt is a
    // fresh epoch. Noise magnitude (~10⁶ micro) is commensurate with
    // the fixture weight spread, so the draw genuinely reorders the
    // tail rather than degenerating to the top-k ranking.
    "llm_dsir_sample" -> ((s, d) => {
      val docs = documents(s, d)
      graft.api.Selection.dsirGumbelTopK(
        docs.filter(col("lang") =!= "en"),
        docs.filter(col("lang") === "en"),
        col("doc_id"), col("text"), k = 50)
    }),

    // sketch mergeability — count-min's distributed accept step: the
    // even-doc shard sketch + the odd-doc shard sketch merged cell-wise
    // MUST equal the whole-corpus sketch, and the ORACLE is the
    // rebuilt-over-everything definition, so the DuckDB hash gate
    // itself certifies grown ≡ rebuilt (the llm_dedup_substring_grow
    // pattern applied to sketches).
    "llm_cms_grow" -> ((s, d) => {
      val docs = documents(s, d)
      graft.api.Selection.cmsMerge(
        graft.api.Selection.cmsBuild(docs.filter(col("doc_id") % 2 === 0),
          col("text"), depth = CmsDepth, width = CmsWidth),
        graft.api.Selection.cmsBuild(docs.filter(col("doc_id") % 2 === 1),
          col("text"), depth = CmsDepth, width = CmsWidth))
        .orderBy("r", "bucket")
    }),

    // quality-aware canonical selection: near-dup clusters keep their
    // HIGHEST-scoring member under the learned quality model, not their
    // first-seen one — the production keep rule, composing the jaccard
    // cluster engine with the classifier margin. Singletons form their
    // own cluster and keep themselves; election is one window bounded
    // by cluster size.
    "llm_dedup_keep_best" -> ((s, d) => {
      val docs = documents(s, d)
      val pairs = graft.api.TextDedup.jaccardWithinBucket(docs,
        col("doc_id"), col("source"), col("text"), minJaccard = 0.95)
      val cl = graft.api.TextDedup.clusters(pairs, col("doc_a"),
        col("doc_b")).withColumnRenamed("node", "doc_id")
      val feats = graft.api.Corpus.hashFeatures(docs, col("doc_id"),
        col("text"))
      val labels = docs.select(col("doc_id"),
        array_contains(split(col("text"), " "), "join").cast("int").as("y"))
      val model = graft.api.Quality.train(feats, labels, epochs = 2)
      val sc = graft.api.Quality.classify(feats, model)
        .select(col("doc_id"), col("score_micro"))
      val members = docs.select(col("doc_id"))
        .join(cl, Seq("doc_id"), "left")
        .withColumn("cluster_id", coalesce(col("cluster_id"),
          col("doc_id")))
        .join(sc, "doc_id")
      graft.api.TextDedup.keepBestByScore(members, col("score_micro"))
        .select("doc_id", "cluster_id", "score_micro", "keep")
        .orderBy("doc_id")
    }),

    // multi-pattern PII audit: per pattern class, records with ≥1 match
    // + total matches, in ONE corpus pass (in-row struct explode — the
    // plan is |patterns|-independent). The fixture payloads only carry
    // digit runs, so the query unions probe rows (negative ids,
    // mirrored in the oracle) carrying real email/phone/IPv4 shapes —
    // every pattern class genuinely exercises its regex (the
    // llm_text_normalize probe-row precedent).
    "llm_pii_audit" -> ((s, d) => {
      import s.implicits._
      val probes = Seq(
        (-3L, "contact alice@example.com or bob.smith+tag@mail.example.org"),
        (-2L, "call 555-123-4567 or 555-987-6543 ref 20240101"),
        (-1L, "host 192.168.0.1 and 10.0.0.255 port 8080"))
        .toDF("event_id", "props")
      val base = events(s, d).select(col("event_id"), col("props"))
        .unionByName(probes)
      graft.api.TextQuality.piiAudit(base, col("props"), PiiPatterns)
    }),

    // Platt scaling (Platt 1999) of the classifier margin, reusing the
    // house SGD step on a TWO-feature pseudo-frame (bias n=1, margin
    // units n=round(z/10⁶)): one epoch-1 fit gives the margins (exp-
    // free — σ(0)·10⁶ = 500000 exactly), one calibration epoch from
    // zero weights fits (a, b) — the entire chain is transcendental-
    // free integer arithmetic, oracle-checked end to end. Output: the
    // 2-row (bucket, w_micro) calibration model.
    "llm_quality_platt" -> ((s, d) => {
      val docs = documents(s, d)
      val feats = graft.api.Corpus.hashFeatures(docs, col("doc_id"),
        col("text"))
      val labels = docs.select(col("doc_id"),
        array_contains(split(col("text"), " "), "join").cast("int").as("y"))
      val w1 = graft.api.Quality.trainStep(feats, labels,
        graft.api.Quality.emptyWeights(docs))
      val su = graft.api.Quality.margins(feats, w1)
        .select(col("doc_id"),
          round(col("z_micro").cast("double") / 1000000.0).cast("long")
            .as("n"))
      val pseudo = labels
        .select(col("doc_id"), lit("B").as("bucket"), lit(1L).as("n"))
        .unionByName(su.select(col("doc_id"), lit("S").as("bucket"),
          col("n")))
      graft.api.Quality.trainStep(pseudo, labels,
        graft.api.Quality.emptyWeights(docs))
        .orderBy("bucket")
    })
  )

  val oracles: Map[String, String] = Map(
    "llm_dsir_weights" ->
      s"""WITH $dsirCte
         |SELECT doc_id, w_micro FROM wts ORDER BY doc_id""".stripMargin,
    "llm_dsir_select" ->
      s"""WITH $dsirCte
         |SELECT rk, doc_id, w_micro FROM (
         |  SELECT CAST(ROW_NUMBER() OVER (ORDER BY w_micro DESC, doc_id)
         |    AS INTEGER) AS rk, doc_id, w_micro FROM wts) t
         |WHERE rk <= 50 ORDER BY rk""".stripMargin,
    "llm_knn_graph" ->
      s"""WITH e AS (SELECT vec_id, embedding,
         |  ${signBucketSql("embedding")} AS bucket FROM embeddings),
         |s AS (SELECT a.vec_id AS src_id, b.vec_id AS dst_id,
         |  ROUND(${dotSql("a.embedding", "b.embedding")}, 6) AS sim_r
         |  FROM e a CROSS JOIN (VALUES (0), (1)) m(m)
         |  JOIN e b ON b.bucket = xor(a.bucket, m.m)
         |    AND b.vec_id != a.vec_id)
         |SELECT src_id, rk, dst_id, sim_r FROM (
         |  SELECT *, CAST(ROW_NUMBER() OVER (PARTITION BY src_id
         |    ORDER BY sim_r DESC, dst_id) AS INTEGER) AS rk FROM s) t
         |WHERE rk <= 3 ORDER BY src_id, rk""".stripMargin,
    "llm_heavy_hitters_cms" ->
      s"""WITH tok AS (SELECT unnest(string_split_regex(text, ' '))
         |    AS token FROM documents),
         |cells AS (SELECT t.r,
         |    ${cmsBucketSql("t.r", "token")} AS bucket,
         |    CAST(COUNT(*) AS BIGINT) AS c
         |  FROM tok CROSS JOIN range($CmsDepth) t(r) GROUP BY 1, 2),
         |exact AS (SELECT token, CAST(COUNT(*) AS BIGINT) AS exact_count
         |  FROM tok GROUP BY 1),
         |est AS (SELECT e.token, MIN(c.c) AS est_count
         |  FROM exact e CROSS JOIN range($CmsDepth) t(r)
         |  JOIN cells c ON c.r = t.r
         |    AND c.bucket = ${cmsBucketSql("t.r", "e.token")}
         |  GROUP BY 1)
         |SELECT rk, token, est_count, exact_count FROM (
         |  SELECT CAST(ROW_NUMBER() OVER (ORDER BY est_count DESC, token)
         |      AS INTEGER) AS rk, e.token, est_count, x.exact_count
         |  FROM est e JOIN exact x USING (token)) t
         |WHERE rk <= 20 ORDER BY rk""".stripMargin,
    "llm_dsir_sample" ->
      s"""WITH $dsirCte,
         |gs AS (SELECT doc_id, w_micro,
         |  CAST(ROUND(-ln(-ln(CAST(CAST('0x' || substr(md5('dsir|'
         |    || CAST(doc_id AS VARCHAR)), 1, 15) AS BIGINT) + 1
         |    AS DOUBLE) / 1152921504606846977.0)) * 1000000) AS BIGINT)
         |    AS g_micro
         |  FROM wts)
         |SELECT rk, doc_id, w_micro, g_micro FROM (
         |  SELECT CAST(ROW_NUMBER() OVER (ORDER BY w_micro + g_micro
         |      DESC, doc_id) AS INTEGER) AS rk,
         |    doc_id, w_micro, g_micro FROM gs) t
         |WHERE rk <= 50 ORDER BY rk""".stripMargin,
    "llm_cms_grow" ->
      s"""WITH tok AS (SELECT unnest(string_split_regex(text, ' '))
         |    AS token FROM documents)
         |SELECT t.r, ${cmsBucketSql("t.r", "token")} AS bucket,
         |  CAST(COUNT(*) AS BIGINT) AS c
         |FROM tok CROSS JOIN range($CmsDepth) t(r)
         |GROUP BY 1, 2 ORDER BY r, bucket""".stripMargin,
    "llm_dedup_keep_best" ->
      s"""WITH RECURSIVE ${Curation.qualityCte},
         |t AS (SELECT doc_id, source,
         |  list_distinct(string_split_regex(text, ' ')) AS tk
         |  FROM documents),
         |p AS (SELECT a.doc_id AS doc_a, b.doc_id AS doc_b
         |  FROM t a JOIN t b ON a.source = b.source
         |    AND a.doc_id < b.doc_id
         |  WHERE ROUND(CAST(len(list_intersect(a.tk, b.tk)) AS DOUBLE) /
         |    (CAST(len(a.tk) + len(b.tk) AS DOUBLE)
         |      - len(list_intersect(a.tk, b.tk))), 4) >= 0.95),
         |e AS (SELECT doc_a AS x, doc_b AS y FROM p
         |      UNION ALL SELECT doc_b, doc_a FROM p),
         |walk AS (SELECT x AS node, y AS label FROM e
         |         UNION
         |         SELECT e.x, w.label FROM e JOIN walk w ON e.y = w.node),
         |cl AS (SELECT node, LEAST(node, MIN(label)) AS cluster_id
         |  FROM walk GROUP BY node),
         |sc AS (SELECT f.doc_id,
         |    CAST(SUM(f.n * w2.w_micro) AS BIGINT) AS score_micro
         |  FROM feats f JOIN w2 USING (bucket) GROUP BY 1),
         |mm AS (SELECT d.doc_id,
         |    COALESCE(cl.cluster_id, d.doc_id) AS cluster_id,
         |    sc.score_micro
         |  FROM documents d LEFT JOIN cl ON cl.node = d.doc_id
         |  JOIN sc ON sc.doc_id = d.doc_id)
         |SELECT doc_id, cluster_id, score_micro,
         |  (ROW_NUMBER() OVER (PARTITION BY cluster_id
         |    ORDER BY score_micro DESC, doc_id) = 1) AS keep
         |FROM mm ORDER BY doc_id""".stripMargin,
    "llm_pii_audit" -> {
      val unions = PiiPatterns.map { case (name, re) =>
        s"""SELECT '$name' AS pii_type,
           |  CAST(len(regexp_extract_all(props, '$re')) AS BIGINT) AS n
           |  FROM base""".stripMargin
      }.mkString("\n  UNION ALL ")
      s"""WITH base AS (
         |  SELECT event_id, props FROM events
         |  UNION ALL
         |  SELECT * FROM (VALUES
         |    (CAST(-3 AS BIGINT),
         |     'contact alice@example.com or bob.smith+tag@mail.example.org'),
         |    (CAST(-2 AS BIGINT),
         |     'call 555-123-4567 or 555-987-6543 ref 20240101'),
         |    (CAST(-1 AS BIGINT),
         |     'host 192.168.0.1 and 10.0.0.255 port 8080'))
         |    v(event_id, props)),
         |m AS (
         |  $unions)
         |SELECT pii_type,
         |  CAST(SUM(CASE WHEN n > 0 THEN 1 ELSE 0 END) AS BIGINT)
         |    AS n_docs,
         |  CAST(SUM(n) AS BIGINT) AS n_matches
         |FROM m GROUP BY 1 ORDER BY pii_type""".stripMargin
    },
    "llm_quality_calibration" ->
      s"""WITH ${Curation.qualityCte},
         |w1s AS (SELECT bucket,
         |    0 - CAST(ROUND((CAST(g AS DOUBLE) / nd.n) * 0.03125)
         |      AS BIGINT) AS w
         |  FROM g1, nd),
         |zz AS (SELECT f.doc_id, CAST(SUM(f.n * w1s.w) AS BIGINT)
         |    AS z
         |  FROM feats f JOIN w1s USING (bucket) GROUP BY 1),
         |pp AS (SELECT l.doc_id, l.y,
         |    CAST(ROUND(1000000.0 / (1.0 + exp(-(CAST(COALESCE(zz.z, 0)
         |      AS DOUBLE) / 1000000.0)))) AS BIGINT) AS p
         |  FROM labels l LEFT JOIN zz USING (doc_id))
         |SELECT CAST(LEAST(9, FLOOR(CAST(p * 10 AS DOUBLE) / 1000000.0))
         |    AS BIGINT) AS bin,
         |  CAST(COUNT(*) AS BIGINT) AS n,
         |  CAST(SUM(p) AS BIGINT) AS sum_p_micro,
         |  CAST(SUM(y) AS BIGINT) AS n_pos
         |FROM pp GROUP BY 1 ORDER BY bin""".stripMargin,
    "llm_quality_ece" ->
      s"""WITH ${Curation.qualityCte},
         |zz AS (SELECT f.doc_id, CAST(SUM(f.n * w2.w_micro) AS BIGINT)
         |    AS z
         |  FROM feats f JOIN w2 USING (bucket) GROUP BY 1),
         |pp AS (SELECT l.doc_id, l.y,
         |    CAST(ROUND(1000000.0 / (1.0 + exp(-(CAST(COALESCE(zz.z, 0)
         |      AS DOUBLE) / 1000000.0)))) AS BIGINT) AS p
         |  FROM labels l LEFT JOIN zz USING (doc_id)),
         |bb AS (SELECT CAST(LEAST(9, FLOOR(CAST(p * 10 AS DOUBLE)
         |      / 1000000.0)) AS BIGINT) AS bin,
         |    CAST(COUNT(*) AS BIGINT) AS n,
         |    CAST(SUM(p) AS BIGINT) AS sum_p_micro,
         |    CAST(SUM(y) AS BIGINT) AS n_pos
         |  FROM pp GROUP BY 1)
         |SELECT CAST(SUM(ABS(sum_p_micro - n_pos * 1000000)) AS BIGINT)
         |    AS ece_numer_micro,
         |  CAST(SUM(n) AS BIGINT) AS n_docs,
         |  CAST(SUM(ABS(sum_p_micro - n_pos * 1000000)) AS DOUBLE)
         |    / CAST(SUM(n) * 1000000 AS DOUBLE) AS ece
         |FROM bb""".stripMargin,
    "llm_quality_platt" ->
      s"""WITH ${Curation.qualityCte},
         |zz AS (SELECT f.doc_id, CAST(SUM(f.n * w1.w) AS BIGINT) AS z
         |  FROM feats f JOIN w1 USING (bucket) GROUP BY 1),
         |pf AS (SELECT doc_id, 'B' AS bucket, CAST(1 AS BIGINT) AS n
         |    FROM labels
         |  UNION ALL
         |  SELECT doc_id, 'S',
         |    CAST(ROUND(CAST(z AS DOUBLE) / 1000000.0) AS BIGINT)
         |    FROM zz),
         |pg AS (SELECT pf.bucket,
         |    CAST(SUM(pf.n * (500000 - l.y * 1000000)) AS BIGINT) AS g
         |  FROM pf JOIN labels l USING (doc_id) GROUP BY 1),
         |pw AS (SELECT bucket,
         |    0 - CAST(ROUND((CAST(g AS DOUBLE) / nd.n) * 0.5) AS BIGINT)
         |      AS w_micro
         |  FROM pg, nd)
         |SELECT bucket, w_micro FROM pw ORDER BY bucket""".stripMargin
  )
}
