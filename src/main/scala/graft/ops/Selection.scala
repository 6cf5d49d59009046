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

  /** Shared DuckDB twin of the k=3/nprobe=2 kNN graph (CTEs e → s → g;
    * g = ranked top-3 edges per src) — consumed by the dedup and
    * mutual-clustering oracles. */
  private def knnCte: String =
    s"""e AS (SELECT vec_id, embedding,
       |  ${signBucketSql("embedding")} AS bucket FROM embeddings),
       |s AS (SELECT a.vec_id AS src_id, b.vec_id AS dst_id,
       |  ROUND(${dotSql("a.embedding", "b.embedding")}, 6) AS sim_r
       |  FROM e a CROSS JOIN (VALUES (0), (1)) m(m)
       |  JOIN e b ON b.bucket = xor(a.bucket, m.m)
       |    AND b.vec_id != a.vec_id),
       |g AS (SELECT src_id, dst_id, sim_r FROM (
       |  SELECT *, ROW_NUMBER() OVER (PARTITION BY src_id
       |    ORDER BY sim_r DESC, dst_id) AS rk FROM s) t
       |  WHERE rk <= 3)""".stripMargin

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

    // graph-based near-dup over the kNN graph: drop a vector when any
    // of its top-k neighbors has sim ≥ τ AND a smaller id (keep-first
    // within each near-dup neighborhood) — the bounded-degree dedup
    // rule: unlike the threshold-join spelling the pair work per node
    // is capped at k·nprobe regardless of how dense a semantic region
    // is. Semantics are k-bounded BY DESIGN (a qualifying neighbor
    // outside the top-k is invisible); the oracle re-derives the same
    // graph, so the gate checks the rule, not an all-pairs ideal.
    "llm_dedup_knn" -> ((s, d) => {
      val e = embeddings(s, d)
      val g = graft.api.Similarity.knnGraph(e, col("vec_id"),
        col("embedding"), k = 3, nprobe = 2)
      val dropped = g.filter(col("sim_r") >= 0.2 &&
          col("dst_id") < col("src_id"))
        .select(col("src_id").as("vec_id")).distinct()
        .withColumn("__drop", lit(true))
      e.select(col("vec_id"))
        .join(dropped, Seq("vec_id"), "left")
        .select(col("vec_id"),
          (!coalesce(col("__drop"), lit(false))).as("keep"))
        .orderBy("vec_id")
    }),

    // mutual-kNN clustering: connected components over RECIPROCATED
    // kNN edges (a↔b both rank each other top-k) — the standard
    // robustness upgrade over one-directional graphs (hubs that
    // everyone points at but that point elsewhere stop gluing regions
    // together). Edges from one bounded graph self-join; components
    // via the house fixpoint engine. Only nodes with ≥1 mutual edge
    // appear (the llm_dedup_clusters contract).
    "llm_cluster_mutual_knn" -> ((s, d) => {
      val e = embeddings(s, d)
      val g = graft.api.Similarity.knnGraph(e, col("vec_id"),
        col("embedding"), k = 3, nprobe = 2)
      val fwd = g.select(col("src_id").as("__a"), col("dst_id").as("__b"))
      val rev = g.select(col("dst_id").as("__a"), col("src_id").as("__b"))
      val mutual = fwd.intersect(rev).filter(col("__a") < col("__b"))
      graft.api.TextDedup.clusters(mutual, col("__a"), col("__b"))
        .select(col("node").as("vec_id"), col("cluster_id"))
        .orderBy("vec_id")
    }),

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
      val feats = QualityShared.feats(docs)
      val labels = QualityShared.seedLabels(docs)
      val model = QualityShared.model2(s, d)
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

    // the PERSISTED sketch lifecycle as one declared key: day-0 shard
    // written (Selection.writeCms), day-1 shard ACCEPTED by cell append
    // (appendToCms — day 0 never re-read), the collapsed sketch read
    // back — and the ORACLE is the rebuilt-over-everything definition,
    // so the driver gate certifies persisted-grown ≡ rebuilt (the
    // llm_dedup_substring_grow pattern; timed query includes both
    // writes, the honesty rule).
    "llm_cms_index" -> ((s, d) => {
      val docs = documents(s, d)
      val path = graft.util.Staging.dir("cms_index", d)
      graft.api.Selection.writeCms(docs.filter(col("doc_id") % 2 === 0),
        col("text"), path, depth = CmsDepth, width = CmsWidth)
      graft.api.Selection.appendToCms(docs.filter(col("doc_id") % 2 === 1),
        col("text"), path, depth = CmsDepth, width = CmsWidth)
      graft.api.Selection.readCms(s, path, depth = CmsDepth,
        width = CmsWidth)
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
      val feats = QualityShared.feats(docs)
      val model = QualityShared.model2(s, d)
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

    // right-to-be-forgotten on the persisted signature index: build
    // day-0 index, DELETE a removal cohort (doc_id % 3 == 1) via
    // anti-join + rename-swap, then screen the delta — and the ORACLE
    // is the rebuilt-without-them definition, so the driver gate
    // certifies removed ≡ rebuilt (the grown ≡ rebuilt pattern, in
    // reverse). Timed query includes the index write AND the removal
    // rewrite — the honesty rule.
    "llm_dedup_forget" -> ((s, d) => {
      val docs = documents(s, d)
      val corpus = docs.filter(col("doc_id") % 10 =!= 0)
      val delta = docs.filter(col("doc_id") % 10 === 0)
      val idx = graft.util.Staging.dir("sig_index_forget", d)
      graft.api.TextDedup.writeSignatureIndex(corpus, col("doc_id"),
        col("text"), idx)
      graft.api.TextDedup.removeFromSignatureIndex(s, idx,
        corpus.filter(col("doc_id") % 3 === 1).select(col("doc_id")))
      graft.api.TextDedup
        .dedupShardAgainstIndex(delta, col("doc_id"), col("text"), idx)
        .select("doc_id", "source")
        .orderBy("doc_id")
    }),

    // CROSS-MODAL curation: semantic dup groups from the EMBEDDING
    // table (threshold pairs within sign-buckets → components), the
    // survivor decided by the TEXT-side learned quality margin
    // (doc_id ≡ vec_id row alignment) — SemDeDup's grouping with the
    // keep-best rule instead of keep-first: the production "which twin
    // do we keep" answer uses the classifier, not arrival order.
    "llm_semdedup_keep_best" -> ((s, d) => {
      val e = embeddings(s, d)
      val pairs = graft.api.Similarity.thresholdJoin(
        e.withColumn("bucket",
          graft.api.Similarity.signBucket(col("embedding"), 8)),
        col("vec_id"), col("embedding"), col("bucket"), minSim = 0.2)
      val comps = graft.api.TextDedup
        .clusters(pairs, col("vec_a"), col("vec_b"))
        .withColumnRenamed("node", "doc_id")
      val docs = documents(s, d)
      val feats = QualityShared.feats(docs)
      val model = QualityShared.model2(s, d)
      val sc = graft.api.Quality.classify(feats, model)
        .select(col("doc_id"), col("score_micro"))
      val members = docs.select(col("doc_id"))
        .join(comps, Seq("doc_id"), "left")
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

    // binned ROC-AUC of the learned filter: the ranking-quality summary
    // next to the PR curve — the trapezoid telescopes to an exact
    // integer numerator (Σ Δfp·(tp_prev+tp_cur)), one final division by
    // 2·P·N. Bounded bin windows, never a global score sort.
    "llm_quality_auc" -> ((s, d) => {
      val docs = documents(s, d)
      val feats = QualityShared.feats(docs)
      val labels = QualityShared.seedLabels(docs)
      val model = QualityShared.model2(s, d)
      // bins tuned to the fitted margin scale (the pr_curve geometry)
      graft.api.Quality.aucBinned(feats, labels, model,
        binMicro = 5000000L, minBin = 0, maxBin = 10)
    }),

    // per-source operating points: each source gets the most permissive
    // threshold whose binned precision still meets 90% — the production
    // refinement of one global cutoff (domain-specific thresholds). The
    // precision gate is exact integer cross-multiplication; per-source
    // cumulative walks over bounded bin frames.
    "llm_quality_threshold_by_source" -> ((s, d) => {
      val docs = documents(s, d)
      val feats = QualityShared.feats(docs)
      val labels = QualityShared.seedLabels(docs)
      val model = QualityShared.model2(s, d)
      graft.api.Quality.operatingPointsByGroup(feats, labels, model,
        docs.select(col("doc_id"), col("source").as("group")),
        pNumer = 9, pDenom = 10, binMicro = 5000000L, minBin = 0,
        maxBin = 10)
        .withColumnRenamed("group", "source")
        .orderBy("source")
    }),

    // vocabulary-pruning APPLY (the min_frequency knob materialized):
    // tokens under 1% of corpus mass → <unk>, docs re-assembled in
    // order; the threshold is relative (exact integer compare), so the
    // key is meaningful at every fixture scale. The fixture's one rare
    // token ('dup', ~0.1% of mass) is replaced corpus-wide.
    "llm_vocab_prune_apply" -> ((s, d) =>
      graft.api.Corpus.vocabPruneApply(documents(s, d), col("doc_id"),
        col("text"), permille = 10)
        .orderBy("doc_id")),

    // per-bucket medoids: one representative embedding per sign-bucket
    // (max total similarity to bucket peers, decimal order-free sums) —
    // the prototype-selection digest for diversity sampling; pair space
    // is the same inverted-list-bounded self-join as the kNN graph.
    "llm_cluster_medoids" -> ((s, d) =>
      graft.api.Similarity.medoidsBySignBucket(embeddings(s, d),
        col("vec_id"), col("embedding"))
        .orderBy("bucket")),

    // shard manifest: the integrity sheet a reproducible export ships —
    // per shard, row count + ORDER-FREE content checksum (exact integer
    // sum of 32-bit salted id hashes) + id range; recompute on a copy
    // and compare. One map-side-combinable groupBy, no sort, no text.
    "llm_shard_manifest" -> ((s, d) =>
      graft.api.Corpus.shardManifest(
        graft.api.Corpus.shuffleShard(documents(s, d), col("doc_id")),
        col("doc_id"))
        .orderBy("shard")),

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
    "llm_dedup_knn" ->
      s"""WITH $knnCte,
         |dropped AS (SELECT DISTINCT src_id AS vec_id FROM g
         |  WHERE sim_r >= 0.2 AND dst_id < src_id)
         |SELECT e.vec_id, (d.vec_id IS NULL) AS keep
         |FROM e LEFT JOIN dropped d USING (vec_id)
         |ORDER BY e.vec_id""".stripMargin,
    "llm_cluster_mutual_knn" ->
      s"""WITH RECURSIVE $knnCte,
         |me AS (SELECT g1.src_id AS a, g1.dst_id AS b
         |  FROM g g1 JOIN g g2 ON g2.src_id = g1.dst_id
         |    AND g2.dst_id = g1.src_id
         |  WHERE g1.src_id < g1.dst_id),
         |ed AS (SELECT a AS x, b AS y FROM me
         |       UNION ALL SELECT b, a FROM me),
         |walk AS (SELECT x AS node, y AS label FROM ed
         |         UNION
         |         SELECT ed.x, w.label FROM ed JOIN walk w ON ed.y = w.node)
         |SELECT node AS vec_id, LEAST(node, MIN(label)) AS cluster_id
         |FROM walk GROUP BY node ORDER BY vec_id""".stripMargin,
    "llm_cms_index" ->
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
    "llm_quality_auc" ->
      s"""WITH ${Curation.qualityCte},
         |sc AS (SELECT l.doc_id, l.y,
         |    CAST(GREATEST(0, LEAST(10,
         |      FLOOR(CAST(COALESCE(z.z, 0) AS DOUBLE) / 5000000.0)))
         |      AS BIGINT) AS bin
         |  FROM labels l LEFT JOIN (SELECT f.doc_id,
         |      CAST(SUM(f.n * w2.w_micro) AS BIGINT) AS z
         |    FROM feats f JOIN w2 USING (bucket) GROUP BY 1) z
         |    USING (doc_id)),
         |pb AS (SELECT bin, CAST(SUM(y) AS BIGINT) AS pos,
         |    CAST(SUM(1 - y) AS BIGINT) AS neg
         |  FROM sc GROUP BY bin),
         |cum AS (SELECT bin,
         |    CAST(SUM(pos) OVER w AS BIGINT) AS tp,
         |    CAST(SUM(neg) OVER w AS BIGINT) AS fp
         |  FROM pb
         |  WINDOW w AS (ORDER BY bin DESC
         |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)),
         |pts AS (SELECT bin, tp, fp,
         |    CAST(COALESCE(LAG(tp) OVER (ORDER BY bin DESC), 0)
         |      AS BIGINT) AS tpp,
         |    CAST(COALESCE(LAG(fp) OVER (ORDER BY bin DESC), 0)
         |      AS BIGINT) AS fpp
         |  FROM cum),
         |tot AS (SELECT CAST(SUM(y) AS BIGINT) AS n_pos,
         |    CAST(SUM(1 - y) AS BIGINT) AS n_neg FROM sc)
         |SELECT CAST(SUM((fp - fpp) * (tp + tpp)) AS BIGINT)
         |    AS auc_numer,
         |  tot.n_pos, tot.n_neg,
         |  CAST(SUM((fp - fpp) * (tp + tpp)) AS DOUBLE)
         |    / CAST(tot.n_pos * tot.n_neg * 2 AS DOUBLE) AS auc
         |FROM pts, tot GROUP BY tot.n_pos, tot.n_neg""".stripMargin,
    "llm_quality_threshold_by_source" ->
      s"""WITH ${Curation.qualityCte},
         |sc AS (SELECT d.source, l.y,
         |    CAST(GREATEST(0, LEAST(10,
         |      FLOOR(CAST(COALESCE(z.z, 0) AS DOUBLE) / 5000000.0)))
         |      AS BIGINT) AS bin
         |  FROM labels l
         |  JOIN documents d USING (doc_id)
         |  LEFT JOIN (SELECT f.doc_id,
         |      CAST(SUM(f.n * w2.w_micro) AS BIGINT) AS z
         |    FROM feats f JOIN w2 USING (bucket) GROUP BY 1) z
         |    USING (doc_id)),
         |pb AS (SELECT source, bin, CAST(SUM(y) AS BIGINT) AS pos,
         |    CAST(SUM(1 - y) AS BIGINT) AS neg
         |  FROM sc GROUP BY 1, 2),
         |pts AS (SELECT source, bin,
         |    CAST(SUM(pos) OVER w AS BIGINT) AS tp,
         |    CAST(SUM(neg) OVER w AS BIGINT) AS fp
         |  FROM pb
         |  WINDOW w AS (PARTITION BY source ORDER BY bin DESC
         |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)),
         |ok AS (SELECT *, ROW_NUMBER() OVER (PARTITION BY source
         |    ORDER BY bin ASC) AS rk
         |  FROM pts WHERE tp * 10 >= (tp + fp) * 9 AND tp > 0)
         |SELECT source, CAST(bin * 5000000 AS BIGINT) AS threshold_micro,
         |  tp, fp,
         |  CAST(tp AS DOUBLE) / CAST(tp + fp AS DOUBLE) AS precision
         |FROM ok WHERE rk = 1 ORDER BY source""".stripMargin,
    "llm_vocab_prune_apply" ->
      """WITH tk AS (SELECT doc_id, string_split_regex(text, ' ') AS tks
        |  FROM documents),
        |tkp AS (SELECT doc_id, unnest(range(1, len(tks) + 1)) AS pos,
        |    unnest(tks) AS tok
        |  FROM tk),
        |freq AS (SELECT tok, CAST(COUNT(*) AS BIGINT) AS n
        |  FROM tkp GROUP BY 1),
        |tot AS (SELECT CAST(SUM(n) AS BIGINT) AS t FROM freq),
        |rare AS (SELECT tok FROM freq, tot WHERE n * 1000 < t * 10),
        |mk AS (SELECT t.doc_id, t.pos,
        |    CASE WHEN r.tok IS NOT NULL THEN '<unk>' ELSE t.tok END AS t2,
        |    CASE WHEN r.tok IS NOT NULL THEN 1 ELSE 0 END AS u
        |  FROM tkp t LEFT JOIN rare r ON r.tok = t.tok)
        |SELECT doc_id,
        |  string_agg(t2, ' ' ORDER BY pos) AS pruned_text,
        |  CAST(SUM(u) AS BIGINT) AS n_unk
        |FROM mk GROUP BY doc_id ORDER BY doc_id""".stripMargin,
    "llm_cluster_medoids" ->
      s"""WITH e AS (SELECT vec_id, embedding,
         |  ${signBucketSql("embedding")} AS bucket FROM embeddings),
         |s AS (SELECT a.bucket, a.vec_id AS va,
         |    CAST(SUM(CAST(ROUND(${dotSql("a.embedding", "b.embedding")},
         |      6) AS DECIMAL(20, 6))) AS DOUBLE) AS sum_sim
         |  FROM e a JOIN e b ON a.bucket = b.bucket
         |    AND a.vec_id != b.vec_id
         |  GROUP BY 1, 2),
         |sc AS (SELECT e.bucket, e.vec_id,
         |    COALESCE(s.sum_sim, 0.0) AS sum_sim
         |  FROM e LEFT JOIN s ON s.bucket = e.bucket
         |    AND s.va = e.vec_id)
         |SELECT bucket, vec_id AS medoid_id, sum_sim FROM (
         |  SELECT *, ROW_NUMBER() OVER (PARTITION BY bucket
         |    ORDER BY sum_sim DESC, vec_id) AS rk FROM sc) t
         |WHERE rk = 1 ORDER BY bucket""".stripMargin,
    "llm_dedup_forget" ->
      s"""WITH ${LlmOps.md5MinhashCte},
         |cand AS (SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b
         |  FROM band a JOIN band b
         |    ON a.band = b.band AND a.sig = b.sig
         |  WHERE a.doc_id % 10 = 0 AND b.doc_id % 10 != 0
         |    AND b.doc_id % 3 != 1),
         |dup AS (SELECT DISTINCT doc_a FROM cand
         |  JOIN d da ON da.doc_id = cand.doc_a
         |  JOIN d db ON db.doc_id = cand.doc_b
         |  WHERE ROUND(
         |      CAST(len(list_filter(da.sh, x -> list_contains(db.sh, x)))
         |        AS DOUBLE)
         |      / (len(da.sh) + len(db.sh)
         |         - len(list_filter(da.sh, x -> list_contains(db.sh, x)))),
         |      4) >= 0.8),
         |icand AS (SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b
         |  FROM band a JOIN band b
         |    ON a.band = b.band AND a.sig = b.sig AND a.doc_id < b.doc_id
         |  WHERE a.doc_id % 10 = 0 AND b.doc_id % 10 = 0),
         |intra AS (SELECT DISTINCT doc_b FROM icand
         |  JOIN d da ON da.doc_id = icand.doc_a
         |  JOIN d db ON db.doc_id = icand.doc_b
         |  WHERE ROUND(
         |      CAST(len(list_filter(da.sh, x -> list_contains(db.sh, x)))
         |        AS DOUBLE)
         |      / (len(da.sh) + len(db.sh)
         |         - len(list_filter(da.sh, x -> list_contains(db.sh, x)))),
         |      4) >= 0.8)
         |SELECT doc_id, source FROM documents
         |WHERE doc_id % 10 = 0
         |  AND doc_id NOT IN (SELECT doc_a FROM dup)
         |  AND doc_id NOT IN (SELECT doc_b FROM intra)
         |ORDER BY doc_id""".stripMargin,
    "llm_semdedup_keep_best" ->
      s"""WITH RECURSIVE ${Curation.qualityCte},
         |e AS (SELECT vec_id, embedding,
         |  ${signBucketSql("embedding")} AS bucket FROM embeddings),
         |p AS (SELECT a.vec_id AS va, b.vec_id AS vb
         |  FROM e a JOIN e b
         |    ON a.bucket = b.bucket AND a.vec_id < b.vec_id
         |  WHERE ROUND(${dotSql("a.embedding", "b.embedding")}, 6)
         |    >= 0.2),
         |ed AS (SELECT va AS x, vb AS y FROM p
         |       UNION ALL SELECT vb, va FROM p),
         |walk AS (SELECT x AS node, y AS label FROM ed
         |         UNION
         |         SELECT ed.x, w.label FROM ed JOIN walk w ON ed.y = w.node),
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
    "llm_shard_manifest" ->
      """WITH sh AS (SELECT doc_id,
        |    substring(md5('shard:' || CAST(doc_id AS VARCHAR)), 1, 1)
        |      AS shard
        |  FROM documents)
        |SELECT shard, CAST(COUNT(*) AS BIGINT) AS n_rows,
        |  CAST(SUM(CAST('0x' || substr(md5('man|'
        |    || CAST(doc_id AS VARCHAR)), 1, 8) AS BIGINT)) AS BIGINT)
        |    AS checksum,
        |  CAST(MIN(doc_id) AS BIGINT) AS min_id,
        |  CAST(MAX(doc_id) AS BIGINT) AS max_id
        |FROM sh GROUP BY shard ORDER BY shard""".stripMargin,
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
