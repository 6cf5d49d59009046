package graft.api

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** User-facing text-quality API over arbitrary DataFrames — the generic
  * forms behind the fixture-bound `SparkEntry` quality/scrub keys, in the
  * same pattern as [[TextDedup]] / [[Similarity]]:
  *
  * {{{
  *   import graft.api.TextQuality
  *   val stats = TextQuality.gopherStats(docs, $"id", $"body")
  *   val kept  = TextQuality.gopherFilter(docs, $"id", $"body")
  *                 .filter($"keep")
  *   val clean = TextQuality.scrub(docs, $"id", $"body")
  * }}}
  *
  * Scale contracts: everything is map-side HOF arithmetic except the
  * single explode → partial-agg groupBy that token dominance needs; all
  * ratios are exact-integer divisions finished in IEEE double, and filter
  * gates compare on the RAW doubles so thresholds are exactly
  * reproducible across engines.
  */
object TextQuality {

  /** Gopher/C4-style per-document statistics (RAW, unrounded):
    * (id, n_words, mean_word_len, short_frac, top_word_ratio).
    * `sep` is a token-separator REGEX (Java `Pattern` — it reaches
    * `functions.split`); quote literal metacharacters, e.g.
    * `"\\|"` for a pipe or `"\\s+"` for any whitespace run. */
  def gopherStats(df: DataFrame, id: Column, text: Column,
      sep: String = " "): DataFrame = {
    val toks = split(text, sep)
    val nW = size(toks).cast("double")
    val base = df.select(id.as("__id"),
      size(toks).cast("long").as("n_words"),
      (aggregate(toks, lit(0L), (acc, x) => acc + length(x).cast("long"))
        .cast("double") / nW).as("mean_word_len"),
      (size(filter(toks, x => length(x) <= 2)).cast("double") / nW)
        .as("short_frac"))
    val dom = df
      .select(id.as("__id"), explode(split(text, sep)).as("__token"))
      .groupBy("__id", "__token").agg(count(lit(1)).as("__c"))
      .groupBy("__id")
      .agg((max(col("__c")).cast("double") / sum(col("__c")).cast("double"))
        .as("top_word_ratio"))
    // LEFT join: a NULL-text row explodes to zero tokens, so an inner join
    // would silently drop it from a generic stats API; it must survive with
    // top_word_ratio = NULL instead
    base.join(dom, Seq("__id"), "left").withColumnRenamed("__id", "id")
  }

  /** [[gopherStats]] plus a `keep` gate ANDing the published Gopher-style
    * thresholds (word-count band, mean-word-length band, max single-token
    * dominance). Gates evaluate on the raw statistics. */
  def gopherFilter(df: DataFrame, id: Column, text: Column,
      minWords: Long = 10, maxWords: Long = 100000,
      minMeanWordLen: Double = 2.0, maxMeanWordLen: Double = 10.0,
      maxDominance: Double = 0.2): DataFrame =
    gopherStats(df, id, text).withColumn("keep",
      col("n_words") >= minWords && col("n_words") <= maxWords &&
        col("mean_word_len") >= minMeanWordLen &&
        col("mean_word_len") <= maxMeanWordLen &&
        col("top_word_ratio") <= maxDominance)

  /** PII-style scrub: replace every match of `pattern` in `payload` with
    * `replacement` and count the redactions. Map-side only; swap in
    * email/phone/id patterns without changing the plan. */
  def scrub(df: DataFrame, id: Column, payload: Column,
      pattern: String = "[0-9]+", replacement: String = "<NUM>"): DataFrame =
    df.select(id.as("id"),
      regexp_replace(payload, pattern, replacement).as("scrubbed"),
      regexp_count(payload, lit(pattern)).as("n_redacted"))
}
