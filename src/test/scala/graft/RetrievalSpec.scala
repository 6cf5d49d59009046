package graft

import org.apache.spark.sql.Row
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Behavioral pins for the round-8 retrieval/audit family: BM25 ranking
  * properties, funnel first-fail attribution, distinct-n arithmetic,
  * Kneser–Ney vs a pure-Scala reference, semantic-decontamination
  * recall/exclusion — plus the plan shapes that survive a scale-up. */
class RetrievalSpec extends AnyFunSuite {
  private val spark = SparkFixture.spark
  import spark.implicits._

  // ---------------------------------------------------------- BM25

  private def bm25Queries =
    Seq((1, "fast scan")).toDF("query_id", "qtext")

  test("bm25TopK ranks a doc dense in query terms above a sparse one, " +
      "and never returns a doc with no query term") {
    val docs = Seq(
      (1L, "fast scan fast scan fast scan"),
      (2L, "fast the the the the the"),
      (3L, "the big table merge group sort")).toDF("id", "text")
    val out = graft.api.Retrieval
      .bm25TopK(docs, col("id"), col("text"), bm25Queries, k = 10)
      .orderBy("rk").collect()
    assert(out.map(_.getLong(2)).toSeq == Seq(1L, 2L),
      "dense doc first, term-free doc absent")
    assert(out(0).getLong(3) > out(1).getLong(3), "scores strictly ordered")
  }

  test("bm25TopK length normalization: same tf, shorter doc wins") {
    val docs = Seq(
      (1L, "fast scan pad pad pad pad pad pad pad pad pad pad pad pad"),
      (2L, "fast scan pad pad")).toDF("id", "text")
    val out = graft.api.Retrieval
      .bm25TopK(docs, col("id"), col("text"), bm25Queries, k = 2)
      .orderBy("rk").collect()
    assert(out.map(_.getLong(2)).toSeq == Seq(2L, 1L),
      "b > 0 must favor the shorter doc at equal tf")
  }

  test("bm25TopK matches a pure-Scala reference on a synthetic corpus") {
    val corpus = Seq(
      1L -> "fast scan merge the big table",
      2L -> "fast fast scan scan",
      3L -> "the the the fast",
      4L -> "scan merge scan merge scan")
    val (k1, b) = (1.2, 0.75)
    val qterms = Seq("fast", "scan")
    // reference: exact integer micro pipeline, mirrored independently
    val n = corpus.size
    val dls = corpus.map { case (id, t) => id -> t.split(" ").length }.toMap
    val avgdl = dls.values.sum.toDouble / n
    def tf(id: Long, t: String) =
      corpus.toMap.apply(id).split(" ").count(_ == t)
    val dfm = qterms.map(t =>
      t -> corpus.count(_._2.split(" ").contains(t))).toMap
    val expected = corpus.map(_._1).map { id =>
      id -> qterms.map { t =>
        val tfd = tf(id, t).toDouble
        if (tfd == 0) 0L
        else {
          val idfU = math.round(math.log(
            1.0 + (n - dfm(t) + 0.5) / (dfm(t) + 0.5)) * 1e6)
          math.round(idfU * ((tfd * (k1 + 1.0))
            / (tfd + k1 * ((1.0 - b) + b * (dls(id) / avgdl)))))
        }
      }.sum
    }.filter(_._2 > 0).toMap
    val out = graft.api.Retrieval
      .bm25TopK(corpus.toDF("id", "text"), col("id"), col("text"),
        bm25Queries, k = 10, k1 = k1, b = b)
      .collect().map(r => r.getLong(2) -> r.getLong(3)).toMap
    assert(out == expected, s"engine $out vs reference $expected")
  }

  test("bm25TopKAgainstIndex returns bit-identical results to scoring " +
      "the corpus directly") {
    val direct = SparkEntry.queries("llm_bm25_topk")(
      spark, SparkFixture.sf0001).collect().toSeq
    val viaIndex = SparkEntry.queries("llm_bm25_index")(
      spark, SparkFixture.sf0001).collect().toSeq
    assert(direct == viaIndex, "index path must equal direct path")
    assert(direct.nonEmpty)
  }

  test("appendToBm25Index: grown index answers queries identically to a " +
      "fresh rebuild over corpus ∪ delta") {
    val all = Seq(
      1L -> "fast scan merge table", 2L -> "fast fast scan",
      3L -> "the big sort group", 4L -> "scan scan scan fast",
      5L -> "merge fast scan row").toDF("id", "text")
    val corpus = all.filter(col("id") <= 3)
    val delta = all.filter(col("id") > 3)
    val d1 = SparkFixture.tempDir("bm25grow").getAbsolutePath
    val d2 = SparkFixture.tempDir("bm25full").getAbsolutePath
    graft.api.Retrieval.writeBm25Index(corpus, col("id"), col("text"), d1)
    graft.api.Retrieval.appendToBm25Index(delta, col("id"), col("text"), d1)
    graft.api.Retrieval.writeBm25Index(all, col("id"), col("text"), d2)
    val q = bm25Queries
    val grown = graft.api.Retrieval
      .bm25TopKAgainstIndex(spark, d1, q).collect().toSeq
    val fresh = graft.api.Retrieval
      .bm25TopKAgainstIndex(spark, d2, q).collect().toSeq
    assert(grown == fresh, "append must equal rebuild")
    assert(grown.nonEmpty)
  }

  test("llm_bm25_topk plan: no cartesian; term screen and query expansion " +
      "are broadcast joins") {
    val p = SparkEntry.queries("llm_bm25_topk")(spark, SparkFixture.sf0001)
      .queryExecution.executedPlan.toString
    assert(!p.contains("CartesianProduct"), s"unbounded cartesian:\n$p")
    assert(p.contains("BroadcastHashJoin"), s"expected broadcast screen:\n$p")
  }

  // --------------------------------------------------- filter funnel

  test("filterFunnel attributes each row to its FIRST failing gate; " +
      "NULL gate conditions do not fail") {
    val df = Seq(
      (1L, 5, 100),          // fails g1 and g2 → g1
      (2L, 50, 100),         // fails g2 only
      (3L, 50, 1)).toDF("id", "a", "b")  // passes
      .withColumn("c", when(col("id") === 3L, lit(null).cast("int")))
    val out = graft.api.TextQuality.filterFunnel(df, Seq(
        "g1" -> (col("a") < 10),
        "g2" -> (col("b") > 50),
        "g3" -> (col("c") > 0)))  // NULL for id=3 → must not fire
      .select("id", "stage_idx", "stage").collect()
      .map(r => r.getLong(0) -> ((r.getInt(1), r.getString(2)))).toMap
    assert(out(1L) == ((1, "g1")))
    assert(out(2L) == ((2, "g2")))
    assert(out(3L) == ((4, "kept")))
  }

  test("llm_filter_funnel: every stage fires at sf0.01 and fracs sum to 1") {
    val rows = SparkEntry.queries("llm_filter_funnel")(
      spark, SparkFixture.sf001).collect()
    assert(rows.length == 5, s"expected all 5 stages, got ${rows.length}")
    val frac = rows.map(_.getDouble(3)).sum
    assert(math.abs(frac - 1.0) < 1e-9, s"fracs sum to $frac")
    assert(rows.map(_.getLong(2)).sum == 500L)
  }

  // ---------------------------------------------------- diversity

  test("ngramDiversity computes exact distinct-n ratios") {
    val df = Seq(
      ("s1", "a b a b"),     // 4 tokens {a,b}; bigrams: ab ba ab → 2/3
      ("s1", "a a"),         // 2 tokens; bigram: aa
      ("s2", "x")).toDF("source", "text")  // 1 token, no bigrams
    val out = graft.api.TextQuality
      .ngramDiversity(df, col("source"), col("text"))
      .collect().map(r => r.getString(0) -> r).toMap
    val s1 = out("s1")
    assert(s1.getLong(1) == 6L && s1.getLong(2) == 2L)
    assert(s1.getDouble(3) == 2.0 / 6.0)
    assert(s1.getLong(4) == 4L && s1.getLong(5) == 3L) // ab ba ab aa
    val s2 = out("s2")
    assert(s2.getLong(4) == 0L, "no bigrams → 0, not a dropped row")
  }

  // --------------------------------------------------- Kneser–Ney

  test("trainKn matches a pure-Scala KN reference and sums to 1 over the " +
      "full event space per history") {
    val docs = Seq(
      1L -> "a b a b a c",
      2L -> "b a b c a b").toDF("doc_id", "text")
    val d = 0.75
    // pure-Scala reference
    val bi = Seq("a b a b a c", "b a b c a b")
      .flatMap(t => t.split(" ").sliding(2).map(p => (p(0), p(1))))
    val cb = bi.groupBy(identity).map { case (k, v) => k -> v.size }
    val c1 = cb.groupBy(_._1._1).map { case (w, m) => w -> m.values.sum }
    val nFw = cb.groupBy(_._1._1).map { case (w, m) => w -> m.size }
    val nBw = cb.groupBy(_._1._2).map { case (w, m) => w -> m.size }
    val bTypes = cb.size
    def pKn(w1: String, w2: String): Double =
      math.max(cb.getOrElse((w1, w2), 0).toDouble - d, 0.0) / c1(w1) +
        ((d * nFw(w1)) / c1(w1)) * (nBw(w2).toDouble / bTypes)
    val out = graft.api.NgramLm.trainKn(docs, col("doc_id"), col("text"), d)
      .collect()
      .map(r => (r.getString(0), r.getString(1)) -> r.getDouble(3)).toMap
    cb.keys.foreach { case (w1, w2) =>
      assert(math.abs(out((w1, w2)) - pKn(w1, w2)) < 1e-12,
        s"p_kn($w2|$w1)")
    }
    // total mass: observed p_kn + unseen-successor mass λ(w1)·Σ_unseen
    // p_cont = 1 exactly, for every history
    val vocab = nBw.keySet
    c1.keys.foreach { w1 =>
      val seenW2 = cb.keys.filter(_._1 == w1).map(_._2).toSet
      val lambda = (d * nFw(w1)) / c1(w1)
      val seenMass = seenW2.toSeq.map(w2 => out((w1, w2))).sum
      val unseenMass = (vocab -- seenW2).toSeq
        .map(w2 => lambda * (nBw(w2).toDouble / bTypes)).sum
      assert(math.abs(seenMass + unseenMass - 1.0) < 1e-9,
        s"KN mass for history $w1")
    }
  }

  test("trainKn3 matches a pure-Scala trigram-KN reference and sums to 1 " +
      "over the full event space per (w1,w2) history") {
    val texts = Seq("a b a b a c a b", "b a c a b c b a")
    val docs = texts.zipWithIndex.map { case (t, i) => (i.toLong, t) }
      .toDF("doc_id", "text")
    val d = 0.75
    val tri = texts.flatMap(_.split(" ").sliding(3).map(w => (w(0), w(1), w(2))))
    val c3 = tri.groupBy(identity).map { case (k, v) => k -> v.size }
    val c12 = c3.groupBy(t => (t._1._1, t._1._2))
      .map { case (k, m) => k -> (m.values.sum, m.size) }
    val pre23 = c3.groupBy(t => (t._1._2, t._1._3))
      .map { case (k, m) => k -> m.size }
    val mid2 = pre23.groupBy(_._1._1)
      .map { case (k, m) => k -> (m.values.sum, m.size) }
    val w3c = pre23.groupBy(_._1._2).map { case (k, m) => k -> m.size }
    val b2 = pre23.size
    def p2(w2: String, w3: String): Double = {
      val (n2dot, nFw2) = mid2(w2)
      math.max(pre23.getOrElse((w2, w3), 0).toDouble - d, 0.0) / n2dot +
        ((d * nFw2) / n2dot) * (w3c(w3).toDouble / b2)
    }
    def p3(w1: String, w2: String, w3: String): Double = {
      val (c12v, nFw12) = c12((w1, w2))
      math.max(c3((w1, w2, w3)).toDouble - d, 0.0) / c12v +
        ((d * nFw12) / c12v) * p2(w2, w3)
    }
    val out = graft.api.NgramLm.trainKn3(docs, col("doc_id"), col("text"), d)
      .collect().map(r =>
        (r.getString(0), r.getString(1), r.getString(2)) -> r.getDouble(4))
      .toMap
    c3.keys.foreach { case (w1, w2, w3) =>
      assert(math.abs(out((w1, w2, w3)) - p3(w1, w2, w3)) < 1e-12,
        s"p_kn3($w3|$w1 $w2)")
    }
    // full-event-space mass per history: observed trigrams at p3 plus
    // every unseen w3 at λ12·p2 must total exactly 1
    val vocab = w3c.keySet
    c12.keys.foreach { case (w1, w2) =>
      val (c12v, nFw12) = c12((w1, w2))
      val lam12 = (d * nFw12) / c12v
      val seenW3 = c3.keys.filter(t => t._1 == w1 && t._2 == w2)
        .map(_._3).toSet
      val mass = seenW3.toSeq.map(w3 => out((w1, w2, w3))).sum +
        (vocab -- seenW3).toSeq.map(w3 => lam12 * p2(w2, w3)).sum
      assert(math.abs(mass - 1.0) < 1e-9, s"KN3 mass for history ($w1,$w2)")
    }
  }

  test("scoreDocsKn resolves every backoff shape: seen bigram, " +
      "λ+cont for unseen pairs, OOV floor for unknown words") {
    val train = Seq(1L -> "a b a b a c").toDF("doc_id", "text")
    val model = graft.api.NgramLm
      .trainKnBackoff(train, col("doc_id"), col("text"))
    val rows = model.collect()
    def costOf(w1: Option[String], w2: Option[String]): Long =
      rows.find(r => Option(r.getString(0)) == w1 &&
        Option(r.getString(1)) == w2).get.getLong(2)
    // score a doc whose bigrams hit all three shapes:
    //   "a b"  → seen;  "b b" → unseen pair (λ(b) + cont(b));
    //   "b z"  → z unknown (λ(b) + OOV);  "z a" → OOV + cont(a)
    val test0 = Seq(9L -> "a b b z a").toDF("doc_id", "text")
    val out = graft.api.NgramLm
      .scoreDocsKn(test0, col("doc_id"), col("text"), model)
      .collect().head
    val expected =
      costOf(Some("a"), Some("b")) +
        (costOf(Some("b"), None) + costOf(None, Some("b"))) +
        (costOf(Some("b"), None) + costOf(None, None)) +
        (costOf(None, None) + costOf(None, Some("a")))
    assert(out.getLong(1) == 4L)
    assert(out.getLong(2) == expected,
      s"backoff chain total: got ${out.getLong(2)}, want $expected")
  }

  test("scoreDocsKn3 resolves the full order-3 backoff chain: seen " +
      "trigram, λ12+p2, λ12+λ2+cont, OOV floors") {
    val train = Seq(1L -> "a b c a b d").toDF("doc_id", "text")
    val model = graft.api.NgramLm
      .trainKn3Backoff(train, col("doc_id"), col("text"))
    val rows = model.collect()
    def c(kind: String, ws: String*): Long =
      rows.find(r => r.getString(0) == kind &&
        Seq(r.getString(1), r.getString(2), r.getString(3))
          .filter(_ != null) == ws).get.getLong(4)
    // "a b c b x a b": (a,b,c) seen; (b,c,b) λ12(b,c)+λ2(c)+cont(b);
    // (c,b,x) oov+λ2(b)+oov; (b,x,a) oov+oov+cont(a); (x,a,b) oov+p2(a,b)
    val out = graft.api.NgramLm.scoreDocsKn3(
      Seq(9L -> "a b c b x a b").toDF("doc_id", "text"),
      col("doc_id"), col("text"), model).collect().head
    val oo = c("oov")
    val expected =
      c("p3", "a", "b", "c") +
        (c("lam12", "b", "c") + (c("lam2", "c") + c("cont", "b"))) +
        (oo + (c("lam2", "b") + oo)) +
        (oo + (oo + c("cont", "a"))) +
        (oo + c("p2", "a", "b"))
    assert(out.getLong(1) == 5L)
    assert(out.getLong(2) == expected,
      s"order-3 backoff total: got ${out.getLong(2)}, want $expected")
  }

  // ------------------------------------------------ winnowing

  test("winnowFingerprints: local guarantee — docs sharing a " +
      "win+k-1-token run share a fingerprint; short docs yield empty " +
      "sets, not descending-sequence garbage") {
    val shared = "query scan merge join sort group table" // 7 tokens
    val docs = Seq(
      (1L, s"a b c d e $shared x y z"),
      (2L, s"p q $shared r s t u v w"),
      (3L, "one two three"), // < k tokens → 0 grams
      (4L, "completely different words here nothing shared at all ok"))
      .toDF("id", "text")
    val out = graft.api.TextDedup
      .winnowFingerprints(docs, col("id"), col("text"), k = 4, win = 4)
      .collect().map(r => r.getLong(0) ->
        ((r.getInt(1), r.getInt(2), r.getSeq[Long](3).toSet))).toMap
    assert(out(3L) == ((0, 0, Set.empty[Long])))
    val common = out(1L)._3 intersect out(2L)._3
    assert(common.nonEmpty, "7-token shared run must share a fingerprint")
    assert((out(1L)._3 intersect out(4L)._3).isEmpty,
      "no shared grams → no shared fingerprints")
  }

  test("winnowFingerprints value set matches a pure-Scala reference") {
    val text = "the fast key order sort table scan merge row value the fast"
    val docs = Seq((1L, text)).toDF("id", "text")
    val (k, win) = (4, 4)
    val toks = text.split(" ")
    val md = java.security.MessageDigest.getInstance("MD5")
    def h(g: String): Long = {
      val hex = md.digest(g.getBytes("UTF-8"))
        .map("%02x".format(_)).mkString.take(15)
      java.lang.Long.parseLong(hex, 16)
    }
    val hs = toks.sliding(k).map(_.mkString(" ")).map(h).toArray
    val expected = hs.sliding(win).map(_.min).toSet
    val got = graft.api.TextDedup
      .winnowFingerprints(docs, col("id"), col("text"), k, win)
      .collect().head.getSeq[Long](3).toSet
    assert(got == expected)
  }

  test("winnowCandidates surfaces every pair sharing a win+k-1 run and " +
      "no pair without shared grams") {
    val shared = "query scan merge join sort group table" // 7 tokens
    val docs = Seq(
      (1L, s"a b c d e $shared x y z"),
      (2L, s"p q $shared r s t u v w"),
      (3L, "one two three four five six seven eight nine"),
      (4L, "alpha beta gamma delta epsilon zeta eta theta")).toDF("id", "text")
    val pairs = graft.api.TextDedup
      .winnowCandidates(docs, col("id"), col("text"))
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(pairs == Set((1L, 2L)),
      s"exactly the planted overlap pair, got $pairs")
  }

  // ------------------------------------- semantic decontamination

  test("decontaminateByEmbedding flags a planted eval twin at sim 1.0 " +
      "and leaves orthogonal vectors unflagged") {
    val e1 = Array(1.0f, 0.0f, 0.0f)
    val e2 = Array(0.0f, 1.0f, 0.0f)
    val corpus = Seq(
      (10L, e1),                        // exact twin of eval 1 → flagged
      (11L, Array(0.0f, 0.0f, 1.0f)),   // orthogonal → clean
      (12L, Array(0.8f, 0.6f, 0.0f)))   // cos 0.8 to eval 1 → flagged
      .toDF("vec_id", "embedding")
    val eval0 = Seq((1L, e1), (2L, e2)).toDF("qid", "qe")
    val out = graft.api.Similarity
      .decontaminateByEmbedding(corpus, col("vec_id"), col("embedding"),
        eval0, tau = 0.5)
      .collect().map(r => r.getLong(0) ->
        ((r.getLong(1), r.getLong(2), r.getDouble(3)))).toMap
    assert(out(10L) == ((1L, 1L, 1.0)), "twin flagged at 1.0 vs eval 1")
    assert(out(12L) == ((2L, 1L, 0.8)),
      "cos 0.8 to eval 1 AND cos 0.6 to eval 2 → 2 hits, best eval 1")
    assert(!out.contains(11L), "orthogonal vector must stay clean")
  }

  test("llm_decontaminate_semantic plan: eval side broadcast (BNLJ), " +
      "no shuffle cartesian") {
    val p = SparkEntry.queries("llm_decontaminate_semantic")(
      spark, SparkFixture.sf0001).queryExecution.executedPlan.toString
    assert(!p.contains("CartesianProduct"), s"unbounded cartesian:\n$p")
    assert(p.contains("BroadcastNestedLoopJoin"),
      s"eval side must broadcast:\n$p")
  }
}
