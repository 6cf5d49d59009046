package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Pins the no-oracle extras (simhash, fingerprint) to the planted sf0.1
  * duplicates, mirroring LlmOpsSpec's MinHash treatment. */
class LlmExtrasSpec extends AnyFunSuite {
  private val spark = SparkFixture.spark

  private lazy val plantedPairs: Set[(Long, Long)] = {
    val docs = graft.util.Tables.documents(spark, SparkFixture.sf01)
      .select(col("doc_id"), md5(col("text")).as("h"))
    docs.alias("a")
      .join(docs.alias("b"),
        col("a.h") === col("b.h") && col("a.doc_id") < col("b.doc_id"))
      .select(col("a.doc_id"), col("b.doc_id"))
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
  }

  test("llm_dedup_simhash recovers every planted duplicate pair " +
      "(hamming 0) at sf0.1") {
    val pairs = SparkEntry
      .queries("llm_dedup_simhash")(spark, SparkFixture.sf01)
      .collect()
      .map(r => (r.getLong(0), r.getLong(1)) -> r.getInt(2)).toMap
    plantedPairs.foreach { case (a, b) =>
      assert(pairs.get((a, b)).contains(0),
        s"planted pair ($a,$b) missing or hamming != 0")
    }
  }

  test("llm_text_normalize folds NFC-equivalent forms and whitespace " +
      "variants to identical bytes") {
    import spark.implicits._
    val dir = SparkFixture.tempDir("graft_nfc_").toString
    // é precomposed (U+00E9) vs e + combining acute (U+0301); mixed case
    // and run-on whitespace — all four must normalize identically
    val composed = "café au lait"
    val decomposed = "café au lait"
    Seq(
      (1L, composed, "fr", "web", composed.length.toLong),
      (2L, decomposed, "fr", "web", decomposed.length.toLong),
      (3L, "CAFÉ   au\tlait ", "fr", "web", 16L),
      (4L, null.asInstanceOf[String], "fr", "web", 0L))
      .toDF("doc_id", "text", "lang", "source", "n_chars")
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")
    val out = SparkEntry.queries("llm_text_normalize")(spark, dir)
      .collect().map(r => r.getLong(0) ->
        (if (r.isNullAt(1)) null else r.getString(1))).toMap
    assert(out(1L) == out(2L), "NFC forms must collapse")
    assert(out(1L) == out(3L), "case/whitespace variants must collapse")
    assert(out(1L) == "café au lait")
    assert(out(4L) == null, "NULL text must stay NULL")
  }

  test("planted duplicates share identical simhash at sf0.1") {
    val sh = SparkEntry.queries("llm_simhash")(spark, SparkFixture.sf01)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    plantedPairs.foreach { case (a, b) =>
      assert(sh(a) == sh(b), s"simhash differs for duplicate pair ($a,$b)")
    }
    // the oracle-checked md5 twin must agree on the same invariant
    val shMd5 = SparkEntry.queries("llm_simhash_md5")(spark, SparkFixture.sf01)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    plantedPairs.foreach { case (a, b) =>
      assert(shMd5(a) == shMd5(b),
        s"md5 simhash differs for duplicate pair ($a,$b)")
    }
  }

  test("planted duplicates share identical fingerprints at sf0.1") {
    // declared key output is the '|'-flattened string form; identical
    // strings ⟺ identical fingerprint arrays (order-preserving join)
    val fp = SparkEntry.queries("llm_fingerprint")(spark, SparkFixture.sf01)
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    plantedPairs.foreach { case (a, b) =>
      assert(fp(a) == fp(b), s"fingerprint differs for pair ($a,$b)")
    }
  }

  test("sign-bucket LSH: reported pairs really share the sign pattern") {
    val out = SparkEntry.queries("llm_dedup_embedding")(
        spark, SparkFixture.sf0001)
      .collect().map(r => (r.getInt(0), r.getLong(1), r.getLong(2)))
    assert(out.nonEmpty, "expected some same-bucket pairs at sf0.001")
    // recompute each vector's bucket INDEPENDENTLY of the query under test
    val vecs = graft.util.Tables.embeddings(spark, SparkFixture.sf0001)
      .collect()
      .map(r => r.getLong(0) -> r.getSeq[Float](1).take(8).toList).toMap
    def bucket(v: List[Float]): Int =
      v.zipWithIndex.map { case (x, i) =>
        if (x >= 0) 1 << (7 - i) else 0
      }.sum
    out.foreach { case (b, va, vb) =>
      assert(bucket(vecs(va)) == b && bucket(vecs(vb)) == b,
        s"pair ($va,$vb) reported in bucket $b but recomputed buckets " +
          s"are ${bucket(vecs(va))}/${bucket(vecs(vb))}")
    }
  }

  test("hot-LSH-bucket guard: 60 identical payloads collapse to ONE " +
      "band-join row yet every member pair still comes out") {
    import spark.implicits._
    // the pathological shard exact dedup should have caught but didn't:
    // 60 byte-identical payloads + 3 distinct ones. Pre-r10 the band
    // self-join ate 60² candidate rows per band; the collapse must cap
    // its input at one representative per distinct signature while the
    // OUTPUT pair set stays exactly the all-pairs contract.
    val clone = Array.tabulate(64)(i => (i * 37 + 11).toByte)
    val docs = ((0 until 60).map(i => (i.toLong, clone)) ++
      Seq(60L -> Array.tabulate(64)(i => (i * 53 + 7).toByte),
        61L -> Array.tabulate(64)(i => (i * 59 + 3).toByte),
        62L -> Array.tabulate(64)(i => (i * 61 + 5).toByte)))
      .toDF("doc_id", "payload")
    // the bounded-candidate claim, asserted on the collapse itself: the
    // signature frame the band join sees has one row per DISTINCT
    // signature (4 groups), not one per doc (63)
    val toks = docs.select(col("doc_id").as("__id"),
      graft.sources.Multimodal.payloadBlockTokens(col("payload"))
        .as("__bt"))
    val sh = toks.select(col("__id"),
      array_distinct(transform(
        sequence(lit(1), size(split(col("__bt"), " ")) - 1),
        i => concat_ws(" ", slice(split(col("__bt"), " "), i, lit(2)))))
        .as("sh"))
    val mh = sh.select(col("__id"),
      graft.functions.VectorExprs.minhashMd5(col("sh"), 16).as("mh"))
    val (reps, members) = graft.api.TextDedup.collapseSigGroups(
      mh, graft.api.TextDedup.fullSigKey(col("mh")))
    assert(reps.count() == 4,
      "band join must see one representative per distinct signature")
    assert(members.count() == 63)
    // end to end: all C(60,2) = 1770 clone pairs at jaccard 1.0, and
    // nothing involving the distinct payloads
    val out = graft.sources.Multimodal
      .payloadNearDups(docs, col("doc_id"), col("payload"))
      .collect().map(r => ((r.getLong(0), r.getLong(1)), r.getDouble(2)))
    assert(out.length == 1770, s"expected 1770 pairs, got ${out.length}")
    assert(out.forall { case ((a, b), j) => a < b && b < 60 && j == 1.0 })
  }

  test("hot-bucket guard (perceptual): 50 identical pixel matrices " +
      "collapse to one dHash representative, all pairs at hamming 0") {
    import spark.implicits._
    val flat = Array.tabulate(72)(i => (i * 7) % 251) // one gradient img
    val other = Array.tabulate(72)(i => (i * 113 + 9) % 251)
    val df = ((0 until 50).map(i => (i.toLong, flat)) ++
      Seq(50L -> other)).toDF("id", "px")
    val bw = df.select(col("id").as("__id"),
      graft.sources.Multimodal.dhashBands(col("px")).as("__bd"))
    val (reps, _) =
      graft.api.TextDedup.collapseSigGroups(bw, col("__bd"))
    assert(reps.count() == 2,
      "one representative per distinct dHash must reach the band join")
    val out = graft.sources.Multimodal
      .phashNearDups(df, col("id"), col("px"))
      .collect().map(r => ((r.getLong(0), r.getLong(1)), r.getInt(2)))
    assert(out.length == 1225, s"expected C(50,2) pairs, got ${out.length}")
    assert(out.forall { case ((a, b), h) => a < b && b < 50 && h == 0 })
  }

  test("hot-bucket guard (simhash): identical texts collapse to one " +
      "representative, all member pairs out at hamming 0, nulls stay out") {
    import spark.implicits._
    val docs = ((0 until 40).map(i => (i.toLong, "alpha beta gamma delta")) ++
      Seq(40L -> "totally different words entirely here now",
        41L -> null.asInstanceOf[String])).toDF("doc_id", "text")
    val sigs = graft.api.TextDedup.simhash(docs, col("doc_id"), col("text"))
    val (reps, _) = graft.api.TextDedup.collapseSigGroups(
      sigs.select(col("doc_id").as("__id"), col("simhash").as("__sig"))
        .filter(col("__sig").isNotNull), col("__sig"))
    assert(reps.count() == 2,
      "band join must see one representative per distinct signature")
    val out = graft.api.TextDedup
      .nearSimhash(docs, col("doc_id"), col("text"))
      .collect().map(r => ((r.getLong(0), r.getLong(1)), r.getInt(2)))
    assert(out.length == 40 * 39 / 2, s"got ${out.length} pairs")
    assert(out.forall { case ((a, b), h) => a < b && b < 40 && h == 0 })
  }

  test("language-ID confusion matrix covers every true lang") {
    val cm = SparkEntry.queries("llm_lang_id")(spark, SparkFixture.sf0001)
      .groupBy("lang").agg(sum("n").as("n")).collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    val docs = graft.util.Tables.documents(spark, SparkFixture.sf0001)
      .groupBy("lang").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(cm == docs, "every doc must be classified exactly once")
  }

  test("llm_tokenizer_compare is cross-key consistent: the bpe and " +
      "unigram families reproduce llm_bpe_fertility / " +
      "llm_tokenizer_fertility bit for bit, and every family covers " +
      "every source") {
    val cmp = SparkEntry
      .queries("llm_tokenizer_compare")(spark, SparkFixture.sf0001)
      .collect()
      .map(r => (r.getString(0), r.getString(1)) ->
        (r.getLong(2), r.getLong(3), r.getDouble(4))).toMap
    // bpe rows == the dedicated trained-BPE fertility key
    val bpe = SparkEntry
      .queries("llm_bpe_fertility")(spark, SparkFixture.sf0001)
      .collect()
      .map(r => r.getString(0) ->
        (r.getLong(1), r.getLong(2), r.getDouble(3))).toMap
    bpe.foreach { case (src, (nw, np, f)) =>
      val (cw, cp, cf) = cmp(("bpe", src))
      assert(cw == nw && cp == np &&
        java.lang.Double.doubleToLongBits(cf) ==
          java.lang.Double.doubleToLongBits(f),
        s"bpe/$src: compare ($cw,$cp,$cf) != dedicated ($nw,$np,$f)")
    }
    // unigram rows == the dedicated seed-model fertility key
    val ug = SparkEntry
      .queries("llm_tokenizer_fertility")(spark, SparkFixture.sf0001)
      .select("source", "n_words", "n_pieces", "fertility").collect()
      .map(r => r.getString(0) ->
        (r.getLong(1), r.getLong(2), r.getDouble(3))).toMap
    ug.foreach { case (src, (nw, np, f)) =>
      val (cw, cp, cf) = cmp(("unigram", src))
      assert(cw == nw && cp == np &&
        java.lang.Double.doubleToLongBits(cf) ==
          java.lang.Double.doubleToLongBits(f),
        s"unigram/$src: compare ($cw,$cp,$cf) != dedicated ($nw,$np,$f)")
    }
    // all three families present, same source set, same word totals
    // (every family prices the SAME word instances)
    val fams = cmp.keySet.map(_._1)
    assert(fams == Set("bpe", "wordpiece", "unigram"), s"families $fams")
    val bySrc = cmp.groupBy(_._1._2).view
      .mapValues(_.map { case (_, (nw, _, _)) => nw }.toSet)
    bySrc.foreach { case (src, nws) =>
      assert(nws.size == 1, s"$src: families disagree on n_words: $nws")
    }
  }

  test("card n_tokens char-count identity (r15): spaces + 1 equals " +
      "size(split(s, ' ')) on every split edge case — the dataset-card " +
      "totals read corpus bytes instead of re-materializing token arrays") {
    import spark.implicits._
    // consecutive spaces (empty fields), leading/trailing spaces,
    // single word, empty string — every place split-keeps-empties
    // semantics could diverge from the char-count formula
    val cases = Seq("a b c", "a  b", " a", "a ", "word", "", "  ",
      "a b  c   d ")
    val df = cases.toDF("text")
    val rows = df.select(
        org.apache.spark.sql.functions.size(split(col("text"), " "))
          .cast("long").as("via_split"),
        (length(col("text")) -
          length(translate(col("text"), " ", "")) + 1L).as("via_chars"))
      .collect()
    rows.zip(cases).foreach { case (r, s) =>
      assert(r.getLong(0) == r.getLong(1),
        s"identity broke on '$s': split=${r.getLong(0)} " +
          s"chars=${r.getLong(1)}")
    }
  }
}
