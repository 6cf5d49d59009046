package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.api.{Corpus, Quality, Selection, Similarity}

/** Pins for the data-selection / sketching / calibration layer
  * (graft.api.Selection, Similarity.knnGraph, Quality.reliability). */
class SelectionSpec extends AnyFunSuite {
  private lazy val spark = SparkFixture.spark
  import spark.implicits._

  private def docs = graft.util.Tables.documents(spark, SparkFixture.sf0001)
  private def emb = graft.util.Tables.embeddings(spark, SparkFixture.sf0001)

  // ---------------------------------------------------------------- DSIR

  test("dsirWeights ranks planted target-like docs above anti-target docs") {
    // target vocabulary {aa bb cc}, raw pool: two docs OF the target
    // distribution + two of a disjoint one — the planted target-like
    // docs must take the top-2 weights
    val target = Seq((100L, "aa bb cc aa bb"), (101L, "bb cc aa aa"))
      .toDF("doc_id", "text")
    val raw = Seq(
      (1L, "aa bb cc bb aa"), (2L, "cc aa bb cc"),
      (3L, "xx yy zz xx yy"), (4L, "zz zz yy xx"))
      .toDF("doc_id", "text")
    val w = Selection.dsirWeights(raw, target, col("doc_id"), col("text"))
      .orderBy(col("w_micro").desc)
      .select("doc_id").as[Long].collect()
    assert(w.take(2).toSet == Set(1L, 2L),
      s"target-like docs should outrank, got order ${w.mkString(",")}")
  }

  test("dsirWeights is an exact integer sum: n_tokens scales the weight") {
    // duplicating a doc's text doubles every feature count, so the
    // weight of "aa aa" is exactly twice the weight of "aa" (bigram of
    // the doubled doc adds its own term — use single-token docs)
    val target = Seq((9L, "aa")).toDF("doc_id", "text")
    val raw = Seq((1L, "aa"), (2L, "aa aa aa")).toDF("doc_id", "text")
    val w = Selection.dsirWeights(raw, target, col("doc_id"), col("text"),
        wordNgrams = 1)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(w(2L) == 3 * w(1L),
      s"3× the tokens must give exactly 3× the weight, got $w")
  }

  test("dsirSelect returns k rows ranked by weight with id tie-break") {
    val sel = Selection.dsirSelect(
      docs.filter(col("lang") =!= "en"), docs.filter(col("lang") === "en"),
      col("doc_id"), col("text"), k = 10)
    val rows = sel.collect()
    assert(rows.length == 10)
    assert(rows.map(_.getInt(0)).toSeq == (1 to 10))
    val ws = rows.map(_.getLong(2)).toSeq
    assert(ws == ws.sorted(Ordering[Long].reverse), "must be weight-desc")
  }

  test("dsirModel is dense over the bucket universe; streaming-shape " +
      "weightsAgainstModel reproduces dsirWeights") {
    val raw = docs.filter(col("lang") =!= "en")
    val tgt = docs.filter(col("lang") === "en")
    val model = Selection.dsirModel(
      Corpus.hashFeatures(raw, col("doc_id"), col("text"), wordNgrams = 2),
      Corpus.hashFeatures(tgt, col("doc_id"), col("text"), wordNgrams = 2),
      buckets = 16).cache()
    assert(model.count() == 16, "model must cover all 16 buckets")
    assert(model.filter(col("llr_micro").isNull).count() == 0)
    val direct = Selection.dsirWeights(raw, tgt, col("doc_id"),
      col("text")).as[(Long, Long)].collect().toMap
    val served = Selection.weightsAgainstModel(
      Corpus.hashFeatures(raw, col("doc_id"), col("text"), wordNgrams = 2),
      model).as[(Long, Long)].collect().toMap
    assert(served == direct)
    model.unpersist()
  }

  test("llm_dedup_knn keeps the smaller id of a planted duplicate pair") {
    import org.apache.spark.sql.Row
    import org.apache.spark.sql.types._
    // two identical vectors land in the same bucket with sim 1.0; the
    // larger id must be dropped, the smaller kept
    val v = Array.fill(64)(0.1f)
    val w = Array.tabulate(64)(i => if (i % 2 == 0) 0.2f else -0.2f)
    val schema = StructType(Seq(StructField("vec_id", LongType),
      StructField("embedding", ArrayType(FloatType))))
    val e = spark.createDataFrame(
      java.util.Arrays.asList(Row(1L, v.toSeq), Row(2L, v.toSeq),
        Row(3L, w.toSeq)), schema)
    val g = Similarity.knnGraph(e, col("vec_id"), col("embedding"),
      k = 3, nprobe = 2)
    val dropped = g.filter(col("sim_r") >= 0.2 &&
        col("dst_id") < col("src_id"))
      .select("src_id").as[Long].collect().toSet
    assert(dropped == Set(2L), s"only the later twin drops, got $dropped")
  }

  test("mutual-kNN edges are a subset of the directed graph and symmetric") {
    val g = Similarity.knnGraph(emb, col("vec_id"), col("embedding"),
      k = 3, nprobe = 2).cache()
    val fwd = g.select(col("src_id").as("__a"), col("dst_id").as("__b"))
    val mutual = fwd.intersect(
      g.select(col("dst_id").as("__a"), col("src_id").as("__b")))
    val m = mutual.as[(Long, Long)].collect().toSet
    val dir = fwd.as[(Long, Long)].collect().toSet
    assert(m.subsetOf(dir))
    assert(m.forall { case (a, b) => m.contains((b, a)) }, "symmetric")
    g.unpersist()
  }

  // ----------------------------------------------------- count-min sketch

  test("cms estimate dominates the exact count for every token") {
    val hh = Selection.heavyHittersCms(docs, col("text"), depth = 4,
      width = 16, k = 1000)
    val bad = hh.filter(col("est_count") < col("exact_count")).count()
    assert(bad == 0, "count-min must never underestimate")
  }

  test("cms estimate is exact when width is collision-free") {
    // 3 distinct tokens into width 4096: collision probability ~0 per
    // row and the min over 4 rows needs only ONE clean row — est == exact
    val tiny = Seq((1L, "aa bb aa"), (2L, "cc aa")).toDF("doc_id", "text")
    val hh = Selection.heavyHittersCms(tiny, col("text"), depth = 4,
      width = 4096, k = 10).collect()
    assert(hh.forall(r => r.getLong(2) == r.getLong(3)),
      s"wide sketch must be exact, got ${hh.mkString(";")}")
    assert(hh.map(r => r.getString(1) -> r.getLong(3)).toMap ==
      Map("aa" -> 3L, "bb" -> 1L, "cc" -> 1L))
  }

  test("cmsBuild state is bounded by depth×width") {
    val cms = Selection.cmsBuild(docs, col("text"), depth = 4, width = 16)
    assert(cms.count() <= 4 * 16)
    // every row's total mass equals the corpus token count
    val tokens = docs.select(explode(split(col("text"), " "))).count()
    val perRow = cms.groupBy("r").agg(sum("c").as("m"))
      .select("m").as[Long].collect()
    assert(perRow.length == 4 && perRow.forall(_ == tokens))
  }

  test("persisted cms: write + append + read equals one whole-corpus " +
      "build; compaction preserves cells; param mismatch fails loudly") {
    val path = SparkFixture.tempDir("cms_idx").getAbsolutePath
    Selection.writeCms(docs.filter(col("doc_id") % 2 === 0), col("text"),
      path, depth = 4, width = 16)
    Selection.appendToCms(docs.filter(col("doc_id") % 2 === 1),
      col("text"), path, depth = 4, width = 16)
    val whole = Selection.cmsBuild(docs, col("text"), depth = 4,
      width = 16).as[(Int, Long, Long)].collect().toSet
    val grown = Selection.readCms(spark, path, depth = 4, width = 16)
      .as[(Int, Long, Long)].collect().toSet
    assert(grown == whole, "grown sketch must equal rebuilt")
    Selection.compactCms(spark, path, depth = 4, width = 16)
    val compacted = spark.read.parquet(s"$path/cells")
    assert(compacted.as[(Int, Long, Long)].collect().toSet == whole)
    // one row per cell after compaction
    assert(compacted.groupBy("r", "bucket").count()
      .filter(col("count") > 1).count() == 0)
    val ex = intercept[IllegalArgumentException] {
      Selection.appendToCms(docs, col("text"), path, depth = 4, width = 32)
    }
    assert(ex.getMessage.contains("width"))
  }

  // ------------------------------------------------------------ kNN graph

  test("knnGraph matches per-node brute force over the probed buckets") {
    val e = emb.limit(60).cache()
    val g = Similarity.knnGraph(e, col("vec_id"), col("embedding"),
      k = 2, nprobe = 2)
    // reference: brute-force pairs restricted to bucket(dst) ∈
    // {bucket(src), bucket(src) xor 1}
    val ref = {
      val b = e.select(col("vec_id"), col("embedding"),
        Similarity.signBucket(col("embedding"), 8).as("bk"))
      val a = b.select(col("vec_id").as("sa"), col("embedding").as("va"),
        col("bk").as("ba"))
      val c = b.select(col("vec_id").as("sb"), col("embedding").as("vb"),
        col("bk").as("bb"))
      a.join(c, (col("bb") === col("ba") ||
          col("bb") === col("ba").bitwiseXOR(lit(1))) &&
          col("sa") =!= col("sb"))
        .select(col("sa"), col("sb"),
          round(Similarity.dot(col("va"), col("vb")), 6).as("sim"))
    }
    val got = g.select("src_id", "dst_id", "sim_r")
      .as[(Long, Long, Double)].collect().toSet
    val want = ref.as[(Long, Long, Double)].collect()
      .groupBy(_._1).iterator.flatMap { case (_, xs) =>
        xs.sortBy(t => (-t._3, t._2)).take(2)
      }.toSet
    assert(got == want)
    e.unpersist()
  }

  test("knnGraph emits at most k rows per node, self excluded") {
    val g = Similarity.knnGraph(emb, col("vec_id"), col("embedding"), k = 3)
      .cache()
    assert(g.filter(col("src_id") === col("dst_id")).count() == 0)
    val overK = g.groupBy("src_id").count().filter(col("count") > 3).count()
    assert(overK == 0)
    val badRk = g.filter(col("rk") < 1 || col("rk") > 3).count()
    assert(badRk == 0)
    g.unpersist()
  }

  test("removeFromSignatureIndex: screen after removal equals screen " +
      "of an index rebuilt without the removed docs") {
    import graft.api.TextDedup
    val corpus = docs.filter(col("doc_id") % 10 =!= 0)
    val delta = docs.filter(col("doc_id") % 10 === 0)
    val kept = corpus.filter(col("doc_id") % 3 =!= 1)
    val removed = corpus.filter(col("doc_id") % 3 === 1)
      .select(col("doc_id"))
    val pA = SparkFixture.tempDir("sig_rm_a").getAbsolutePath
    val pB = SparkFixture.tempDir("sig_rm_b").getAbsolutePath
    TextDedup.writeSignatureIndex(corpus, col("doc_id"), col("text"), pA)
    TextDedup.removeFromSignatureIndex(spark, pA, removed)
    TextDedup.writeSignatureIndex(kept, col("doc_id"), col("text"), pB)
    val a = TextDedup.dedupShardAgainstIndex(delta, col("doc_id"),
      col("text"), pA).select("doc_id").as[Long].collect().toSet
    val b = TextDedup.dedupShardAgainstIndex(delta, col("doc_id"),
      col("text"), pB).select("doc_id").as[Long].collect().toSet
    assert(a == b, s"removed-index screen diverges from rebuilt: $a vs $b")
    // the removal genuinely shrank the index
    assert(spark.read.parquet(s"$pA/sigs")
      .join(removed.withColumnRenamed("doc_id", "__id"), Seq("__id"))
      .count() == 0)
  }

  test("shardManifest checksum detects a dropped and a duplicated row") {
    val sharded = Corpus.shuffleShard(docs, col("doc_id")).cache()
    val m0 = Corpus.shardManifest(sharded, col("doc_id"))
      .as[(String, Long, Long, Long, Long)].collect()
      .map(r => r._1 -> r).toMap
    assert(m0.values.map(_._2).sum == docs.count())
    val tampered = Corpus.shardManifest(
      sharded.filter(col("doc_id") =!= 0), col("doc_id"))
      .as[(String, Long, Long, Long, Long)].collect()
      .map(r => r._1 -> r).toMap
    val shard0 = sharded.filter(col("doc_id") === 0)
      .select("shard").as[String].head()
    assert(m0(shard0)._3 != tampered(shard0)._3,
      "dropping a row must move its shard's checksum")
    val duped = Corpus.shardManifest(
      sharded.unionByName(sharded.filter(col("doc_id") === 0)),
      col("doc_id"))
      .as[(String, Long, Long, Long, Long)].collect()
      .map(r => r._1 -> r).toMap
    assert(m0(shard0)._3 != duped(shard0)._3,
      "duplicating a row must move its shard's checksum")
    sharded.unpersist()
  }

  test("mixtureApply delivers each group's plan within one boundary doc") {
    val tk = size(split(col("text"), " "))
    val plan = Corpus.mixturePlan(docs, tk, col("lang"), budget = 40000L,
      maxEpochs = 1.5)
      .select(col("group"), col("plan_tokens")).as[(String, Long)]
      .collect().toMap
    val stream = Corpus.mixtureApply(docs, col("doc_id"), tk, col("lang"),
      budget = 40000L, maxEpochs = 1.5)
    val delivered = stream.join(
        docs.select(col("doc_id"), tk.cast("long").as("__tk")), "doc_id")
      .groupBy("group").agg(sum("__tk").as("got"))
      .as[(String, Long)].collect().toMap
    val maxDoc = docs.select(max(tk.cast("long"))).as[Long].head()
    plan.foreach { case (g, p) =>
      val got = delivered.getOrElse(g, 0L)
      assert(got >= p, s"$g under-delivered: $got < $p")
      assert(got < p + maxDoc,
        s"$g overshot by a full doc+: $got >= $p + $maxDoc")
    }
    // deterministic; a re-salt moves the partial-epoch membership
    val again = Corpus.mixtureApply(docs, col("doc_id"), tk, col("lang"),
      budget = 40000L, maxEpochs = 1.5)
      .as[(Long, String, Long)].collect().toSet
    assert(again == stream.as[(Long, String, Long)].collect().toSet)
    val resalted = Corpus.mixtureApply(docs, col("doc_id"), tk,
      col("lang"), budget = 40000L, maxEpochs = 1.5, salt = "epoch2")
      .as[(Long, String, Long)].collect().toSet
    assert(resalted != again, "a re-salt must redraw the partial epoch")
  }

  test("persisted BPE model round-trips with merge order intact") {
    import graft.api.Bpe
    val merges = Bpe.train(docs, col("text"), nMerges = 8)
    val path = SparkFixture.tempDir("bpe_model").getAbsolutePath + "/m"
    Bpe.writeModel(spark, merges, path)
    assert(Bpe.readModel(spark, path) == merges,
      "order-preserving round-trip")
    // segmenting with the read-back model must equal the in-memory one
    val words = docs.select(explode(split(col("text"), " ")).as("w"))
      .distinct()
    val a = Bpe.segment(words, col("w"), merges)
      .select("w", "tokens").as[(String, Seq[String])].collect().toMap
    val b = Bpe.segment(words, col("w"), Bpe.readModel(spark, path))
      .select("w", "tokens").as[(String, Seq[String])].collect().toMap
    assert(a == b)
  }

  // ---------------------------------------------------------- calibration

  test("reliability bins partition the labeled set; ece in [0,1]") {
    val feats = Corpus.hashFeatures(docs, col("doc_id"), col("text"))
    val labels = docs.select(col("doc_id"),
      array_contains(split(col("text"), " "), "join").cast("int").as("y"))
    val m = Quality.trainStep(feats, labels, Quality.emptyWeights(docs),
      lrMicro = 31250L)
    val rel = Quality.reliability(feats, labels, m).collect()
    assert(rel.map(_.getLong(1)).sum == labels.count())
    assert(rel.forall(r => r.getLong(0) >= 0 && r.getLong(0) <= 9))
    // per-bin mean predicted probability must itself lie inside the bin
    // (up to the decile clamp on the top bin)
    rel.foreach { r =>
      val mean = r.getLong(2).toDouble / r.getLong(1) / 1e6
      assert(mean >= r.getLong(0) / 10.0 - 1e-9 &&
        mean <= (r.getLong(0) + 1) / 10.0 + 0.1 + 1e-9)
    }
    val ece = Quality.eceMicro(feats, labels, m).collect()(0)
    assert(ece.getDouble(2) >= 0.0 && ece.getDouble(2) <= 1.0)
  }

  test("a perfectly calibrated model has near-zero ece on its own bins") {
    // degenerate but exact: the zero model predicts p = 0.5 for all;
    // labels split exactly half-half → sum_p = n_pos·10⁶ → ece = 0
    val d = (0L until 100L).map(i => (i, "tok")).toDF("doc_id", "text")
    val feats = Corpus.hashFeatures(d, col("doc_id"), col("text"))
    val labels = d.select(col("doc_id"), (col("doc_id") % 2).cast("int")
      .as("y"))
    val ece = Quality.eceMicro(feats, labels, Quality.emptyWeights(d))
      .collect()(0)
    assert(ece.getLong(0) == 0L && ece.getDouble(2) == 0.0)
  }

  test("cmsMerge of disjoint shards equals the whole-corpus sketch") {
    val whole = Selection.cmsBuild(docs, col("text"))
    val merged = Selection.cmsMerge(
      Selection.cmsBuild(docs.filter(col("doc_id") % 2 === 0), col("text")),
      Selection.cmsBuild(docs.filter(col("doc_id") % 2 === 1), col("text")))
    val diff = whole.as[(Int, Long, Long)].collect().toSet
      .diff(merged.as[(Int, Long, Long)].collect().toSet)
    assert(diff.isEmpty, s"merged sketch diverges on: $diff")
  }

  test("gumbel top-k is deterministic and resamples vs the plain ranking") {
    val raw = docs.filter(col("lang") =!= "en")
    val tgt = docs.filter(col("lang") === "en")
    val s1 = Selection.dsirGumbelTopK(raw, tgt, col("doc_id"), col("text"),
      k = 20).select("doc_id").as[Long].collect().toSeq
    val s2 = Selection.dsirGumbelTopK(raw, tgt, col("doc_id"), col("text"),
      k = 20).select("doc_id").as[Long].collect().toSeq
    assert(s1 == s2, "same salt must draw the same docs in the same order")
    val salted = Selection.dsirGumbelTopK(raw, tgt, col("doc_id"),
      col("text"), k = 20, salt = "epoch2")
      .select("doc_id").as[Long].collect().toSeq
    assert(salted != s1, "a re-salt must be a fresh draw")
  }

  test("keepBestByScore keeps exactly one member per cluster, the " +
      "highest-scoring one") {
    val members = Seq(
      (1L, 1L, 10L), (2L, 1L, 30L), (3L, 1L, 30L), // tie → doc 2
      (4L, 4L, 5L)                                 // singleton
    ).toDF("doc_id", "cluster_id", "score")
    val kept = graft.api.TextDedup
      .keepBestByScore(members, col("score"))
      .filter(col("keep")).select("doc_id").as[Long].collect().toSet
    assert(kept == Set(2L, 4L))
  }

  test("piiAudit counts every pattern class independently in one pass") {
    val rows = Seq(
      (1L, "mail a@b.co and c.d@e.org plus 12345"),
      (2L, "no pii here"),
      (3L, "ip 10.0.0.1")).toDF("id", "payload")
    val audit = graft.api.TextQuality.piiAudit(rows, col("payload"), Seq(
      "email" -> "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}",
      "ipv4" -> "[0-9]{1,3}\\.[0-9]{1,3}\\.[0-9]{1,3}\\.[0-9]{1,3}",
      "digit_id" -> "[0-9]{4,}"))
      .collect().map(r => r.getString(0) -> (r.getLong(1), r.getLong(2)))
      .toMap
    assert(audit("email") == ((1L, 2L)))
    assert(audit("ipv4") == ((1L, 1L)))
    assert(audit("digit_id") == ((1L, 1L)))
  }

  test("aucBinned is exact on a hand-walked separable set") {
    // margins: pos docs all land in higher bins than negs → AUC = 1
    val d = Seq((1L, "join"), (2L, "join"), (3L, "scan"), (4L, "scan"))
      .toDF("doc_id", "text")
    val feats = Corpus.hashFeatures(d, col("doc_id"), col("text"))
    val labels = d.select(col("doc_id"),
      array_contains(split(col("text"), " "), "join").cast("int").as("y"))
    val m = Quality.train(feats, labels, epochs = 2)
    val r = Quality.aucBinned(feats, labels, m).collect()(0)
    assert(r.getLong(1) == 2 && r.getLong(2) == 2)
    assert(r.getDouble(3) == 1.0,
      s"separable labels must score AUC 1, got $r")
  }

  test("aucBinned of a label-blind model is exactly 1/2") {
    // all docs share one margin bin → the single trapezoid gives
    // N·P/(2·N·P): the chance-level diagonal
    val d = (0L until 40L).map(i => (i, "tok")).toDF("doc_id", "text")
    val feats = Corpus.hashFeatures(d, col("doc_id"), col("text"))
    val labels = d.select(col("doc_id"), (col("doc_id") % 2).cast("int")
      .as("y"))
    val r = Quality.aucBinned(feats, labels, Quality.emptyWeights(d))
      .collect()(0)
    assert(r.getDouble(3) == 0.5, s"one-bin ROC must be chance, got $r")
  }

  test("operatingPointsByGroup: picked threshold meets the target and " +
      "the next-looser bin does not") {
    val feats = Corpus.hashFeatures(docs, col("doc_id"), col("text"))
    val labels = docs.select(col("doc_id"),
      array_contains(split(col("text"), " "), "join").cast("int").as("y"))
    val model = Quality.train(feats, labels, epochs = 2)
    val groups = docs.select(col("doc_id"), col("source").as("group"))
    val pts = Quality.operatingPointsByGroup(feats, labels, model, groups,
      pNumer = 9, pDenom = 10, binMicro = 5000000L, minBin = 0,
      maxBin = 10).collect()
    assert(pts.nonEmpty)
    pts.foreach { r =>
      val (tp, fp) = (r.getLong(2), r.getLong(3))
      assert(tp * 10 >= (tp + fp) * 9,
        s"picked point misses the precision bar: $r")
    }
  }

  test("vocabPruneApply replaces exactly the sub-threshold tokens, " +
      "in place") {
    // 'zz' is 1 of 12 tokens (83 permille); threshold 100 permille
    // prunes it, everything else survives with order intact
    val d = Seq((1L, "aa bb zz aa"), (2L, "bb aa aa bb"),
      (3L, "aa bb aa bb")).toDF("doc_id", "text")
    val out = Corpus.vocabPruneApply(d, col("doc_id"), col("text"),
        permille = 100, unk = "<unk>")
      .orderBy("doc_id")
      .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2)))
    assert(out(0) == ((1L, "aa bb <unk> aa", 1L)))
    assert(out(1) == ((2L, "bb aa aa bb", 0L)))
    assert(out(2) == ((3L, "aa bb aa bb", 0L)))
  }

  test("medoidsBySignBucket elects one member per bucket; singleton " +
      "buckets keep their member at sum 0") {
    val m = Similarity.medoidsBySignBucket(emb, col("vec_id"),
      col("embedding")).cache()
    val e = emb.select(col("vec_id"),
      Similarity.signBucket(col("embedding"), 8).as("bucket"))
    val nBuckets = e.select("bucket").distinct().count()
    assert(m.count() == nBuckets, "exactly one medoid per bucket")
    // singleton buckets: medoid is the sole member, sum_sim exactly 0
    val singles = e.groupBy("bucket").count().filter(col("count") === 1)
      .select("bucket")
    val sm = m.join(singles, "bucket")
    assert(sm.filter(col("sum_sim") =!= 0.0).count() == 0)
    m.unpersist()
  }

  test("platt epoch moves the margin-feature weight in the right direction") {
    // margins from the 1-epoch fit correlate positively with y, so the
    // calibration slope (bucket S) must come out positive, and the
    // fitted 2-row model scores must keep at least the raw model's
    // ranking on a clean subset
    val feats = Corpus.hashFeatures(docs, col("doc_id"), col("text"))
    val labels = docs.select(col("doc_id"),
      array_contains(split(col("text"), " "), "join").cast("int").as("y"))
    val w1 = Quality.trainStep(feats, labels, Quality.emptyWeights(docs))
    val su = Quality.margins(feats, w1).select(col("doc_id"),
      round(col("z_micro").cast("double") / 1000000.0).cast("long").as("n"))
    val pseudo = labels
      .select(col("doc_id"), lit("B").as("bucket"), lit(1L).as("n"))
      .unionByName(su.select(col("doc_id"), lit("S").as("bucket"),
        col("n")))
    val platt = Quality.trainStep(pseudo, labels, Quality.emptyWeights(docs))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(platt.keySet == Set("B", "S"))
    assert(platt("S") > 0L, s"slope must be positive, got $platt")
  }
}
