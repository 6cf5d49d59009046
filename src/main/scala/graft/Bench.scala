package graft
import org.apache.spark.sql.SparkSession
object Bench {
  /** Fixed single-threaded CPU microbench — the HOST-CONDITION SENTINEL
    * (r12 verdict #1). The shared VM shows ~2× run-to-run variance
    * (three same-code full runs spanned 243.7–323.3 s in r12); without
    * telemetry IN the artifact, a driver-side evaluation on a degraded
    * host is indistinguishable from a real regression. This loop is
    * pure register arithmetic (xorshift64 + add, no allocation, no
    * memory traffic), so its wall time tracks only CPU contention /
    * frequency — run before and after the suite and written into
    * BENCH_SUMMARY.json / BENCH_FULL.json as host_sentinel_pre_s /
    * host_sentinel_post_s. Fair-band calibration lives in BASELINE.md. */
  private def sentinelLoop(n: Long): Long = {
    var x = 0x9E3779B97F4A7C15L
    var acc = 0L
    var i = 0L
    while (i < n) {
      x ^= x << 13; x ^= x >>> 7; x ^= x << 17
      acc += x
      i += 1
    }
    acc
  }

  /** (single-thread seconds, all-cores wall seconds). The MT reading is
    * the load-bearing one for a 32-thread suite: a contended VM can
    * read FAIR single-threaded (one core is always schedulable) while
    * parallel throughput is halved — the mode that actually throttles
    * the bench. Each of N=availableProcessors threads runs the same
    * fixed loop; on a healthy host wall ≈ the single-thread time, and
    * inflation above that is exactly the oversubscription factor. */
  private val sentinelSink = new java.util.concurrent.atomic.AtomicLong()

  /** One timed single-thread sentinel reading (the same fixed loop the
    * pre/post single readings use, so BASELINE.md's calibrated fair
    * band applies to every reading) — also the mid-suite checkpoint
    * probe (r13 verdict #7). */
  private def timedSentinel(): Double = {
    val t0 = System.nanoTime()
    sentinelSink.addAndGet(sentinelLoop(600000000L))
    (System.nanoTime() - t0) / 1e9
  }

  private def hostSentinel(): (Double, Double) = {
    // untimed warm call: compiles sentinelLoop before the timed reading
    // so the pre/post readings measure the same (fully JIT'd) code
    sentinelSink.addAndGet(sentinelLoop(1000000L))
    val st = timedSentinel()
    val n = Runtime.getRuntime.availableProcessors()
    val threads = (0 until n).map { _ =>
      new Thread(() => {
        sentinelSink.addAndGet(sentinelLoop(600000000L)); () })
    }
    val t1 = System.nanoTime()
    threads.foreach(_.start())
    threads.foreach(_.join())
    val mt = (System.nanoTime() - t1) / 1e9
    // consume the sink so the JIT cannot dead-code the loops
    if (sentinelSink.get() == 42L)
      System.err.println("[bench] sentinel fixed point")
    (st, mt)
  }

  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      // codegen cache stays at the DEFAULT 100 entries (r15, measured):
      // raising it to 5000 to dedupe Janino recompiles across keys
      // looked free but measured consistently SLOWER — +0.3-0.5 s on
      // the llm_dedup_* slice isolated and a concentrated 2-3× cluster
      // ~130 keys into the full suite (retaining thousands of compiled
      // generated classes thrashes the JIT code cache, which hits
      // whichever keys run after it fills). BASELINE.md r15 notes.
      .getOrCreate()
    // ERROR, not WARN: the benign localCheckpoint "lineage truncated"
    // WARN flood interleaves with the summary JSON in the driver's
    // captured output and broke its parser two rounds running
    // (BENCH_r07/r08 `parsed: null`). Failures still surface — every
    // per-query error is caught and printed explicitly below.
    spark.sparkContext.setLogLevel("ERROR")
    // JVM/codegen warm-up so the first timed query doesn't absorb one-time
    // session costs (engine machinery), plus a footer touch per fixture
    // table so whichever query the map iterates first doesn't pay the
    // parquet metadata reads the rest then get for free
    spark.range(10000).selectExpr("sum(id)", "count(distinct id % 7)")
      .collect()
    // join + partial-agg warm-up (r4 ask): drive BOTH join codegen paths
    // (broadcast-hash and sort-merge) plus an exchange + grouped agg once,
    // so the first join-bearing timed key stops absorbing their one-time
    // compile cost (measured r4→r5: top-1 bench concentration halved when
    // warm-up covers the shapes the timed keys actually use)
    locally {
      val fact = spark.range(20000).selectExpr("id % 97 as k", "id as v")
      val dim = spark.range(97).selectExpr("id as k", "id * 2 as w")
      fact.join(dim, "k").groupBy("k").sum("v").collect()
      fact.hint("merge").join(dim.hint("merge"), "k").groupBy("k")
        .count().collect()
    }
    // best-effort only: a missing table must surface as that QUERY's -1 +
    // errors entry in the timed loop, never abort the whole bench here
    graft.util.Tables.all.foreach { t =>
      try spark.read.parquet(s"$sfDir/$t.parquet").limit(1).count()
      catch { case scala.util.control.NonFatal(_) => () }
    }
    // real-path warm-up (r6): a genuine parquet scan through codegen'd
    // string hashing + one tiny parquet write. The first REAL scan pays
    // vectorized-reader + codegen init and the first write pays committer
    // init — measured ~3 s landing on whichever timed key the map
    // iterates first (llm_dedup_norm read 4.6 s in-suite vs 1.4 s
    // isolated before this block)
    try {
      spark.read.parquet(s"$sfDir/documents.parquet")
        .selectExpr("md5(substring(text, 1, 16)) as h").limit(2000)
        .groupBy("h").count().collect()
      val wtmp = java.nio.file.Files.createTempDirectory("graft-warm")
      spark.range(100).write.mode("overwrite")
        .parquet(wtmp.resolve("w").toString)
      // the write only exists to warm the committer path — reap it so
      // repeated bench runs don't accumulate temp datasets
      java.nio.file.Files.walk(wtmp)
        .sorted(java.util.Comparator.reverseOrder())
        .forEach(p => java.nio.file.Files.deleteIfExists(p))
    } catch { case scala.util.control.NonFatal(_) => () }
    // a failed query must be VISIBLE: it is timed as -1 and listed under
    // "errors" rather than silently contributing a near-zero duration
    var errors = List.empty[String]
    // dev-only subset filter (comma-separated keys); the driver never sets
    // it, so driver runs always time the full surface
    val only = sys.env.get("SPARK_GRAFT_ONLY")
      .map(_.split(",").map(_.trim).toSet)
    val selected = only match {
      case Some(ks) =>
        val sel = SparkEntry.queries.filter { case (k, _) => ks(k) }
        // a typo'd filter must fail loudly, not report a clean ~0s total
        require(sel.nonEmpty,
          s"SPARK_GRAFT_ONLY matched no queries: ${ks.mkString(",")}")
        val unknown = ks -- SparkEntry.queries.keySet
        if (unknown.nonEmpty)
          System.err.println(s"[bench] unknown keys ignored: " +
            unknown.mkString(","))
        sel
      case None => SparkEntry.queries
    }
    // dev-only regression-review mode (SPARK_GRAFT_REPEATS=N): time each
    // key N times and report the MEDIAN, so the shared VM's ~2×
    // run-to-run variance stops masquerading as per-query regressions.
    // The driver never sets it, so contract runs stay single-pass (and
    // honest about cold-path costs like index writes).
    val repeats = sys.env.get("SPARK_GRAFT_REPEATS")
      .map(_.toInt).filter(_ >= 1).getOrElse(1)
    // host sentinel BEFORE the suite. Deliberately NOT gated on
    // `only.isEmpty`: filtered REPEATS probes are exactly where a
    // human is judging whether a per-key move is host or code, and the
    // stdout line carries the readings even though filtered runs never
    // write the artifacts (r13 review decision; BASELINE.md documents
    // both behaviors).
    val (sentinelPre, sentinelMtPre) = hostSentinel()
    // mid-suite sentinel checkpoints (r13 verdict #7): the pre/post
    // brackets detect mid-suite host drift but cannot LOCALIZE it — a
    // single-thread reading every MidSentinelEvery keys (the identical
    // fixed loop, so the calibrated fair band applies per reading) lets
    // bench_diff.py normalize per-SEGMENT instead of per-run. The MT
    // probe stays pre/post-only: a 32-thread wall reading between keys
    // would cost ~1.5 s of pure overhead per checkpoint and perturb the
    // very suite it observes.
    val MidSentinelEvery = 100
    val midSentinels =
      scala.collection.mutable.ArrayBuffer.empty[(Int, Double)]
    var keyIdx = 0
    // SORTED key order (r14, with the checkpoints): hash-map order is
    // deterministic but opaque — with the suite alphabetical, segment
    // membership is reconstructible from the artifact alone (key i in
    // sorted order belongs to the segment after checkpoint ⌊i/100⌋),
    // which is what lets bench_diff normalize per-segment
    val results = selected.toSeq.sortBy(_._1).map { case (name, fn) =>
      // a failing key stops its repeat loop on the FIRST failure and
      // reports its name ONCE (r12 ADVICE: the old shape re-ran the
      // failure on every remaining repeat and duplicated the errors
      // entry per attempt)
      val times = scala.collection.mutable.ArrayBuffer.empty[Double]
      var failed = false
      var attempt = 0
      while (attempt < repeats && !failed) {
        val t0 = System.nanoTime()
        try { fn(spark, sfDir).count(); times += (System.nanoTime() - t0) / 1e9 }
        catch { case e: Throwable =>
          System.err.println(s"[bench] $name FAILED: ${e.getMessage}")
          errors ::= name; failed = true
        }
        // between attempts/queries (outside the timed section): drop RDDs
        // the last run left persisted — localCheckpoint generations from
        // the iterative ops would otherwise accumulate across the suite
        spark.sparkContext.getPersistentRDDs.values
          .foreach(_.unpersist(blocking = false))
        // and collect the previous run's garbage NOW (JMH-style
        // inter-iteration hygiene): otherwise a heavy predecessor's
        // collection lands inside the next key's timed section — measured
        // 1.5 s → 4.3 s on llm_dedup_norm purely from running after
        // tpch_q7. Wall-clock cost sits outside every timed region.
        System.gc()
        attempt += 1
      }
      val dt = if (failed) -1.0 else times.sorted.apply(times.length / 2)
      // checkpoint between keys (outside every timed section); skipped
      // when the boundary coincides with the suite end — the post
      // sentinel already reads there
      keyIdx += 1
      if (keyIdx % MidSentinelEvery == 0 && keyIdx < selected.size)
        midSentinels += ((keyIdx, timedSentinel()))
      name -> dt
    }
    // host sentinel AFTER the suite: pre/post bracket the run, so a
    // host that degraded mid-suite is visible in the artifact too
    val (sentinelPost, sentinelMtPost) = hostSentinel()
    // The driver captures only a ~2000-char tail of stdout: a JSON line
    // carrying all ~130 full-precision timings gets head-truncated and the
    // driver records parsed:null (this killed BENCH_r03). So the stdout
    // line stays compact — totals + the top-30 slowest at 3 decimals —
    // and the complete per-query map goes to BENCH_FULL.json for the judge.
    def fmt(v: Double): String =
      if (v < 0) "-1" else BigDecimal(v).setScale(3, BigDecimal.RoundingMode.HALF_UP).toString
    val total = results.map(_._2).filter(_ >= 0).sum
    val errs = errors.sorted.map("\"" + _ + "\"").mkString("[", ",", "]")
    def qjson(rs: Seq[(String, Double)]): String =
      rs.map { case (k, v) => "\"" + k + "\":" + fmt(v) }.mkString("{", ",", "}")
    val mids = midSentinels
      .map { case (k, s) => s"""{"after_key":$k,"s":${fmt(s)}}""" }
      .mkString("[", ",", "]")
    val sentinels =
      s""""host_sentinel_pre_s":${fmt(sentinelPre)},"host_sentinel_post_s":${fmt(sentinelPost)},"host_sentinel_mt_pre_s":${fmt(sentinelMtPre)},"host_sentinel_mt_post_s":${fmt(sentinelMtPost)},"host_sentinel_mid":$mids"""
    val fullLine =
      s"""{"metric":"total","value":${fmt(total)},"unit":"sec","n_queries":${results.size},$sentinels,"queries":${qjson(results.sortBy(_._1))},"errors":$errs,"sf":"$sfDir"}"""
    // a filtered dev run must not clobber the committed full-suite artifact
    if (only.isEmpty)
      try java.nio.file.Files.write(java.nio.file.Paths.get("BENCH_FULL.json"),
        fullLine.getBytes("UTF-8"))
      catch { case scala.util.control.NonFatal(e) =>
        System.err.println(s"[bench] BENCH_FULL.json write failed: ${e.getMessage}") }
    val top = results.sortBy { case (_, v) => -v }.take(30)
    val summaryLine =
      s"""{"metric":"total","value":${fmt(total)},"unit":"sec","n_queries":${results.size},$sentinels,"queries":${qjson(top)},"queries_full":"BENCH_FULL.json","errors":$errs,"sf":"$sfDir"}"""
    // sidecar copy of the summary line: if anything DOES interleave with
    // stdout on the driver side, the artifact survives in a file
    if (only.isEmpty)
      try java.nio.file.Files.write(
        java.nio.file.Paths.get("BENCH_SUMMARY.json"),
        summaryLine.getBytes("UTF-8"))
      catch { case scala.util.control.NonFatal(e) =>
        System.err.println(
          s"[bench] BENCH_SUMMARY.json write failed: ${e.getMessage}") }
    // stop BEFORE the summary print: whatever shutdown logging Spark
    // emits lands above the JSON, keeping it the LAST stdout line for
    // the driver's tail-capture parser
    spark.stop()
    println(summaryLine)
    System.out.flush()
  }
}
