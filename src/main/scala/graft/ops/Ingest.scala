package graft.ops

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.api.TextClean
import graft.util.Tables._

/** Ingest-cleaning keys (round 8, session 4): markup stripping, mojibake
  * repair, and the script-mix audit — the raw-text normalization family
  * that runs BEFORE everything else in a crawl pipeline (the fixture
  * corpus arrives pre-cleaned, so each key unions a few damage-bearing
  * probe rows under negative doc_ids, the llm_text_normalize
  * convention, and the oracle inlines the SAME probe strings — both
  * sides generated from one Scala constant so they cannot drift).
  *
  * Scale shape: all three operators are pure map-side expression chains
  * (regex/replace/length arithmetic) — zero shuffles beyond the
  * presentation sort; at 100 TB they ride the ingest scan for free.
  *
  * Oracle notes: DuckDB regexp_replace defaults to FIRST-match — every
  * oracle pass carries the 'g' flag; patterns stay inside the
  * Java-regex ∩ RE2 syntax subset (inline (?is), explicit classes,
  * \xHH escapes — never \uXXXX, which RE2 rejects). */
object Ingest {

  /** Markup probe rows: a full page with script/comment/entities, a
    * style block, and the documented unclosed-block caveat case. */
  private val MarkupProbes: Seq[(Long, String)] = Seq(
    -3L -> ("<html><head><title>T</title><script type=\"text/js\">var x" +
      " = 1 < 2;</script></head><body><p>Hello &amp; welcome</p>" +
      "<!-- hidden note --><div>A&nbsp;B &lt;tag&gt; &#39;q&#39;" +
      "</div></body></html>"),
    -2L -> "<style>p { color: red }</style><b>bold</b> x &gt; y",
    -1L -> "unclosed <script>alert(1) and the text that follows")

  /** Mojibake probe rows, BUILT by damaging clean text through the same
    * mechanical UTF-8→cp1252 mis-decode the repair map inverts — the
    * probes are correct by construction. Row -1 is DOUBLE-encoded. */
  private val MojibakeProbes: Seq[(Long, String)] = {
    def m(s: String) = TextClean.mojibakeOf(s)
    Seq(
      -3L -> (m("’") + "tis " + m("“") + "quoted” words " +
        m("–") + " caf" + m("é") + " touch" + m("é") + "e"),
      -2L -> ("price 5" + m("€") + " brand" + m("™") + " A" +
        m("\u00A0") + "B " + m("°") + "C"),
      -1L -> ("double " + m(m("’")) + " encoded"))
  }

  /** Script probe rows: one per script family + a mixed and an
    * all-symbol row (main_script = 'none'). */
  private val ScriptProbes: Seq[(Long, String)] = Seq(
    -6L -> "Привет мир hello 77",
    -5L -> ("日本語のテキスト " +
      "漢字"),
    -4L -> "مرحبا بالعالم",
    -3L -> "안녕하세요 감사",
    -2L -> "ΑΒΓ αβγ mixed latin text here",
    -1L -> "!!! ??? ,,, ...")

  /** C4 probe rows — each exercises one rule: the line gates (short /
    * javascript / no-punctuation lines), the lorem-ipsum page drop, the
    * brace page drop, and the min-kept-lines page drop. PRE-lined (they
    * carry their own newlines), unlike the reshaped fixture docs. */
  private val C4Probes: Seq[(Long, String)] = Seq(
    -4L -> ("This is a good line with punctuation.\nshort line.\n" +
      "this line has JavaScript in it and is long enough.\n" +
      "Another fine sentence with enough words here.\n" +
      "no terminal punctuation on this long line here\n" +
      "And a third proper sentence to clear the page gate."),
    -3L -> ("Lorem Ipsum dolor sit amet consectetur adipiscing elit.\n" +
      "A perfectly good line otherwise sits right here today.\n" +
      "And another good line that cannot save the page."),
    -2L -> ("var config = { retries: 3 };\n" +
      "Some good sentence with many words right here.\n" +
      "More good text follows with plenty of words.\n" +
      "And a third good sentence arrives on time."),
    -1L -> "Only one good sentence here with words enough.\nshort.\nbad")

  /** URL probes — the fixture carries no URLs; these exercise scheme
    * variants, ports, paths, queries, fragments, and punctuation
    * boundaries. */
  private val UrlProbes: Seq[(Long, String)] = Seq(
    -3L -> ("see https://example.com/path?q=1#frag and also " +
      "http://sub.example.org:8080/deep/path plus text after"),
    -2L -> ("wrapped (https://en.wikipedia.org/wiki/Spark) and quoted " +
      "\"http://docs.example.com/a\" links"),
    -1L -> ("bare domain example.com is NOT a url; " +
      "https://example.com twice https://example.com/x"))

  /** End-to-end pipeline probes: pages carrying markup AND mojibake AND
    * line-rule cases at once — each survives or dies for a different
    * reason. */
  private val PipelineProbes: Seq[(Long, String)] = {
    def m(s: String) = TextClean.mojibakeOf(s)
    Seq(
      -3L -> ("<h1>Page Title</h1>\n" +
        "It" + m("’") + "s a perfectly good first sentence.\n" +
        "<script>var tracker = 1;</script>\n" +
        "Another good line mentions caf" + m("é") +
        " culture today.\n" + "short.\n" +
        "A third good sentence closes out the page."),
      -2L -> ("Pricing update of 5" + m("€") + " applies here.\n" +
        "This page has enough sentences to survive easily.\n" +
        "One more complete sentence appears right here."),
      -1L -> ("<p>Lorem ipsum dolor sit amet as filler.</p>\n" +
        "A real sentence that cannot save this page."))
  }

  /** The fixture reshaped into newline-delimited pages for the C4 key
    * (fixture text carries no '\n'): 10-token folds, with a terminal
    * '.' appended to EVEN-indexed lines so the punctuation gate sees
    * both outcomes on every doc (the lined() convention of the
    * line-dedup family, plus deterministic punctuation). */
  private def linedPunct(s: SparkSession, d: String): DataFrame = {
    val tk = split(col("text"), " ")
    val lines = transform(
      sequence(lit(0), ((size(tk) + 9) / 10).cast("int") - 1),
      i => concat_ws(" ", slice(tk, i * 10 + 1, lit(10))))
    val punct = transform(lines, (l, i) =>
      when(i % 2 === 0, concat(l, lit("."))).otherwise(l))
    documents(s, d).select(col("doc_id"),
      concat_ws("\n", punct).as("text"))
  }

  private def withProbes(s: SparkSession, d: String,
      probes: Seq[(Long, String)]): DataFrame = {
    import s.implicits._
    documents(s, d).select(col("doc_id"), col("text"))
      .unionByName(probes.toDF("doc_id", "text"))
  }

  val entries: Map[String, (SparkSession, String) => DataFrame] = Map(

    // markup strip: blocks → comments → tags → entity chain →
    // whitespace collapse, with tag/entity counts priced pre-strip
    "llm_strip_markup" -> ((s, d) =>
      TextClean.stripMarkup(withProbes(s, d, MarkupProbes),
          col("doc_id"), col("text"))
        .orderBy("doc_id")),

    // mojibake repair at passes=2 so the double-encoded probe row
    // exercises the two-pass contract the scaladoc documents
    "llm_fix_mojibake" -> ((s, d) =>
      TextClean.fixMojibake(withProbes(s, d, MojibakeProbes),
          col("doc_id"), col("text"), passes = 2)
        .orderBy("doc_id")),

    // per-doc script histogram + argmax main script
    "llm_script_mix" -> ((s, d) =>
      TextClean.scriptMix(withProbes(s, d, ScriptProbes),
          col("doc_id"), col("text"))
        .orderBy("doc_id")),

    // C4 line-and-page rules over the punctuation-augmented lined
    // fixture + rule-specific probes; entirely in-row HOF work
    "llm_c4_line_filter" -> ((s, d) => {
      import s.implicits._
      TextClean.c4LineFilter(
          linedPunct(s, d).unionByName(C4Probes.toDF("doc_id", "text")),
          col("doc_id"), col("text"))
        .orderBy("doc_id")
    }),

    // the whole ingest chain fused into ONE map-side plan: mojibake
    // repair → per-line markup strip (line structure preserved) →
    // C4 line/page rules — raw crawl bytes in, curated text out,
    // one codegen pass
    "llm_ingest_pipeline" -> ((s, d) => {
      import s.implicits._
      TextClean.ingestPipeline(
          linedPunct(s, d)
            .unionByName(PipelineProbes.toDF("doc_id", "text")),
          col("doc_id"), col("text"))
        .orderBy("doc_id")
    }),

    // URL extraction with per-occurrence numbering — the provenance
    // audit behind domain mixing and URL-keyed dedup
    "llm_extract_urls" -> ((s, d) =>
      TextClean.extractUrls(withProbes(s, d, UrlProbes),
          col("doc_id"), col("text"))
        .orderBy("doc_id", "url_no")),

    // per-domain rollup of the same extraction: ONE partial-agg
    // shuffle on a domain-sized key space
    "llm_domain_stats" -> ((s, d) =>
      TextClean.domainStats(withProbes(s, d, UrlProbes),
          col("doc_id"), col("text"))
        .orderBy("domain")),

    // sentence segmentation without lookbehind (RE2-compatible), over
    // the punctuation-augmented lined fixture: terminator-run split +
    // length-arithmetic recovery of the unterminated trailing fragment
    "llm_split_sentences" -> ((s, d) => {
      import s.implicits._
      val probes = Seq(
        -4L -> "?!.",
        -3L -> "!!!Leading run skipped. then a fragment",
        -2L -> "First one. Second one! Third one? trailing fragment",
        -1L -> "No terminator at all in this page")
        .toDF("doc_id", "text")
      TextClean.splitSentences(
          linedPunct(s, d).unionByName(probes),
          col("doc_id"), col("text"))
        .orderBy("doc_id", "sent_no")
    })
  )

  // ---------------------------------------------------------------------
  // Oracle generation: every literal below is interpolated from the SAME
  // Scala constants the Spark plan uses.
  // ---------------------------------------------------------------------

  /** SQL string literal with quote doubling. */
  private def q(s: String): String = "'" + s.replace("'", "''") + "'"

  /** Inline probe rows as a VALUES-backed CTE body. */
  private def probesSql(probes: Seq[(Long, String)]): String =
    probes.map { case (id, t) => s"(${id}, ${q(t)})" }.mkString(",\n    ")

  private def corpusCte(probes: Seq[(Long, String)]): String =
    s"""corpus AS (SELECT doc_id, text FROM documents
       |  UNION ALL SELECT * FROM (VALUES
       |    ${probesSql(probes)}) probes(doc_id, text))""".stripMargin

  /** The entity-decode chain as nested replace() calls (innermost runs
    * first — same order as the Spark foldLeft). */
  private def entityChainSql(inner: String): String =
    TextClean.Entities.foldLeft(inner) { case (acc, (e, r)) =>
      s"replace($acc, ${q(e)}, ${q(r)})"
    }

  /** The mojibake repair chain, `passes` times. */
  private def mojibakeChainSql(inner: String, passes: Int): String =
    (0 until passes).foldLeft(inner) { (acc, _) =>
      TextClean.Mojibake.foldLeft(acc) { case (a, (bad, good)) =>
        s"replace($a, ${q(bad)}, ${q(good)})"
      }
    }

  val oracles: Map[String, String] = Map(
    "llm_strip_markup" -> {
      val noBlocks = Seq("script", "style").foldLeft("text") { (c, t) =>
        s"regexp_replace($c, '(?is)<$t[^>]*>.*?</$t>', ' ', 'g')"
      }
      s"""WITH ${corpusCte(MarkupProbes)},
         |s1 AS (SELECT doc_id, text,
         |    regexp_replace($noBlocks, '(?s)<!--.*?-->', ' ', 'g')
         |      AS nc
         |  FROM corpus),
         |s2 AS (SELECT doc_id, text,
         |    regexp_replace(nc, '<[^>]*>', ' ', 'g') AS nt
         |  FROM s1)
         |SELECT doc_id,
         |  trim(regexp_replace(${entityChainSql("nt")},
         |    '${TextClean.Ws}+', ' ', 'g')) AS clean_text,
         |  CAST(len(regexp_extract_all(text, '<[^>]*>')) AS INT)
         |    AS n_tags,
         |  CAST(len(regexp_extract_all(nt, '${TextClean.EntityPat}'))
         |    AS INT) AS n_entities
         |FROM s2 ORDER BY doc_id""".stripMargin
    },

    "llm_fix_mojibake" ->
      s"""WITH ${corpusCte(MojibakeProbes)}
         |SELECT doc_id,
         |  ${mojibakeChainSql("text", 2)} AS fixed_text,
         |  CAST(len(regexp_extract_all(text,
         |    ${q(TextClean.MojibakePat)})) AS INT) AS n_mojibake,
         |  len(regexp_extract_all(text,
         |    ${q(TextClean.MojibakePat)})) > 0 AS changed
         |FROM corpus ORDER BY doc_id""".stripMargin,

    "llm_c4_line_filter" -> {
      val lineOk = s"regexp_matches(l, ${q(TextClean.TerminalPunct)}) " +
        "AND len(string_split_regex(l, ' ')) >= 5 AND NOT (" +
        TextClean.LineBlocklist.map(b => s"contains(lower(l), ${q(b)})")
          .mkString(" OR ") + ")"
      val blockHit = TextClean.PageBlocklist
        .map(b => s"contains(lower(text), ${q(b)})").mkString("(", " OR ", ")")
      s"""WITH tk AS (SELECT doc_id, string_split_regex(text, ' ') AS tk
         |  FROM documents),
         |lp AS (SELECT doc_id, array_to_string(list_transform(
         |    range(0, (len(tk) + 9) // 10),
         |    i -> array_to_string(tk[i*10+1 : i*10+10], ' ')
         |      || CASE WHEN i % 2 = 0 THEN '.' ELSE '' END),
         |    chr(10)) AS text
         |  FROM tk),
         |corpus AS (SELECT doc_id, text FROM lp
         |  UNION ALL SELECT * FROM (VALUES
         |    ${probesSql(C4Probes)}) probes(doc_id, text)),
         |k AS (SELECT doc_id, text,
         |    string_split(text, chr(10)) AS ls,
         |    list_filter(string_split(text, chr(10)),
         |      l -> $lineOk) AS ka
         |  FROM corpus)
         |SELECT doc_id, CAST(len(ls) AS INT) AS n_lines,
         |  CAST(len(ka) AS INT) AS n_kept,
         |  $blockHit AS page_dropped,
         |  (NOT $blockHit AND len(ka) >= 3) AS keep_page,
         |  CASE WHEN NOT $blockHit AND len(ka) >= 3
         |    THEN array_to_string(ka, chr(10)) ELSE '' END AS kept_text
         |FROM k ORDER BY doc_id""".stripMargin
    },

    "llm_ingest_pipeline" -> {
      // per-line strip chain over the lambda variable l
      val noBlocks = Seq("script", "style").foldLeft("l") { (c, t) =>
        s"regexp_replace($c, '(?is)<$t[^>]*>.*?</$t>', ' ', 'g')"
      }
      val stripped = entityChainSql(
        s"regexp_replace(regexp_replace($noBlocks, " +
          "'(?s)<!--.*?-->', ' ', 'g'), '<[^>]*>', ' ', 'g')")
      val lineOk = s"regexp_matches(l, ${q(TextClean.TerminalPunct)}) " +
        "AND len(string_split_regex(l, ' ')) >= 5 AND NOT (" +
        TextClean.LineBlocklist.map(b => s"contains(lower(l), ${q(b)})")
          .mkString(" OR ") + ")"
      val blockHit = TextClean.PageBlocklist
        .map(b => s"contains(lower(text), ${q(b)})")
        .mkString("(", " OR ", ")")
      s"""WITH tk AS (SELECT doc_id, string_split_regex(text, ' ') AS tk
         |  FROM documents),
         |lp AS (SELECT doc_id, array_to_string(list_transform(
         |    range(0, (len(tk) + 9) // 10),
         |    i -> array_to_string(tk[i*10+1 : i*10+10], ' ')
         |      || CASE WHEN i % 2 = 0 THEN '.' ELSE '' END),
         |    chr(10)) AS text
         |  FROM tk),
         |raw AS (SELECT doc_id, text FROM lp
         |  UNION ALL SELECT * FROM (VALUES
         |    ${probesSql(PipelineProbes)}) probes(doc_id, text)),
         |fx AS (SELECT doc_id, ${mojibakeChainSql("text", 2)} AS t1
         |  FROM raw),
         |cl AS (SELECT doc_id, array_to_string(list_transform(
         |    string_split(t1, chr(10)),
         |    l -> trim(regexp_replace($stripped,
         |      '${TextClean.Hws}+', ' ', 'g'))), chr(10)) AS text
         |  FROM fx),
         |k AS (SELECT doc_id, text,
         |    string_split(text, chr(10)) AS ls,
         |    list_filter(string_split(text, chr(10)),
         |      l -> $lineOk) AS ka
         |  FROM cl)
         |SELECT doc_id, CAST(len(ls) AS INT) AS n_lines,
         |  CAST(len(ka) AS INT) AS n_kept,
         |  $blockHit AS page_dropped,
         |  (NOT $blockHit AND len(ka) >= 3) AS keep_page,
         |  CASE WHEN NOT $blockHit AND len(ka) >= 3
         |    THEN array_to_string(ka, chr(10)) ELSE '' END AS kept_text
         |FROM k ORDER BY doc_id""".stripMargin
    },

    "llm_extract_urls" ->
      s"""WITH ${corpusCte(UrlProbes)},
         |u AS (SELECT doc_id,
         |    unnest(regexp_extract_all(text, ${q(TextClean.UrlPat)}))
         |      AS url,
         |    generate_subscripts(regexp_extract_all(text,
         |      ${q(TextClean.UrlPat)}), 1) AS url_no
         |  FROM corpus)
         |SELECT doc_id, CAST(url_no AS INT) AS url_no, url,
         |  lower(regexp_extract(url, ${q(TextClean.DomainPat)}, 1))
         |    AS domain
         |FROM u ORDER BY doc_id, url_no""".stripMargin,

    "llm_domain_stats" ->
      s"""WITH ${corpusCte(UrlProbes)},
         |u AS (SELECT doc_id,
         |    unnest(regexp_extract_all(text, ${q(TextClean.UrlPat)}))
         |      AS url
         |  FROM corpus)
         |SELECT lower(regexp_extract(url, ${q(TextClean.DomainPat)}, 1))
         |    AS domain,
         |  CAST(COUNT(*) AS BIGINT) AS n_urls,
         |  CAST(COUNT(DISTINCT doc_id) AS BIGINT) AS n_docs
         |FROM u GROUP BY 1 ORDER BY domain""".stripMargin,

    "llm_split_sentences" ->
      s"""WITH tk AS (SELECT doc_id, string_split_regex(text, ' ') AS tk
         |  FROM documents),
         |lp AS (SELECT doc_id, array_to_string(list_transform(
         |    range(0, (len(tk) + 9) // 10),
         |    i -> array_to_string(tk[i*10+1 : i*10+10], ' ')
         |      || CASE WHEN i % 2 = 0 THEN '.' ELSE '' END),
         |    chr(10)) AS text
         |  FROM tk),
         |corpus AS (SELECT doc_id, text FROM lp
         |  UNION ALL SELECT * FROM (VALUES
         |    (-4, '?!.'),
         |    (-3, '!!!Leading run skipped. then a fragment'),
         |    (-2, 'First one. Second one! Third one? trailing fragment'),
         |    (-1, 'No terminator at all in this page'))
         |    probes(doc_id, text)),
         |s1 AS (SELECT doc_id, text,
         |    regexp_extract_all(text, '[^.!?]+[.!?]+') AS sents,
         |    length(regexp_extract(text, '^[.!?]+', 0))
         |      + COALESCE(list_sum(list_transform(
         |      regexp_extract_all(text, '[^.!?]+[.!?]+'),
         |      s -> length(s))), 0) AS consumed
         |  FROM corpus),
         |s2a AS (SELECT doc_id, text,
         |    CASE WHEN length(trim(substr(text, CAST(1 + consumed AS INT),
         |        length(text)))) > 0
         |      THEN list_append(sents, trim(substr(text,
         |        CAST(1 + consumed AS INT), length(text))))
         |      ELSE sents END AS al0
         |  FROM s1),
         |s2 AS (SELECT doc_id,
         |    CASE WHEN len(al0) = 0
         |        AND length(trim(regexp_extract(text, '^[.!?]+', 0))) > 0
         |      THEN [trim(regexp_extract(text, '^[.!?]+', 0))]
         |      ELSE al0 END AS al
         |  FROM s2a),
         |s3 AS (SELECT doc_id, trim(unnest(al)) AS s,
         |    generate_subscripts(al, 1) AS i FROM s2)
         |SELECT doc_id, CAST(i AS INT) AS sent_no, s AS sentence,
         |  CAST(len(string_split_regex(s, ' ')) AS INT) AS n_words,
         |  CAST(length(s) AS INT) AS n_chars
         |FROM s3 WHERE length(s) > 0
         |ORDER BY doc_id, sent_no""".stripMargin,

    "llm_script_mix" -> {
      val cls = TextClean.ScriptClasses
      val letters = cls.map(_._1).filterNot(Set("digit", "space"))
      val counts = cls.map { case (name, c) =>
        s"CAST(length(text) - length(regexp_replace(text, ${q(c)}, " +
          s"'', 'g')) AS INT) AS n_$name"
      }.mkString(",\n    ")
      val sumAll = cls.map(c => s"n_${c._1}").mkString(" + ")
      val sumLetters = letters.map(l => s"n_$l").mkString(" + ")
      val maxLetters =
        s"GREATEST(${letters.map(l => s"n_$l").mkString(", ")})"
      // first WHEN whose count equals the max = first-listed-wins ties,
      // the exact semantics of the Spark strict-> fold
      val mainCase = letters.map(l =>
        s"WHEN n_$l = $maxLetters THEN '$l'").mkString("\n      ")
      s"""WITH ${corpusCte(ScriptProbes)},
         |c AS (SELECT doc_id, CAST(length(text) AS INT) AS n_chars,
         |    $counts
         |  FROM corpus)
         |SELECT doc_id, n_chars,
         |  ${cls.map(c => s"n_${c._1}").mkString(", ")},
         |  CAST(n_chars - ($sumAll) AS INT) AS n_other,
         |  CASE WHEN $sumLetters = 0 THEN 'none'
         |      $mainCase
         |  END AS main_script,
         |  CASE WHEN $sumLetters = 0 THEN 0.0
         |    ELSE CAST($maxLetters AS DOUBLE)
         |      / CAST($sumLetters AS DOUBLE)
         |  END AS frac_main
         |FROM c ORDER BY doc_id""".stripMargin
    }
  )
}
