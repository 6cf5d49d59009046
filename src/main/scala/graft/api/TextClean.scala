package graft.api

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Raw-text ingest cleaning — the step BEFORE every operator downstream
  * of a crawl: strip the markup the fetcher left in, repair the classic
  * encoding damage, and audit which scripts a document is actually
  * written in. Everything here is MAP-SIDE ONLY (regex/replace chains
  * and length arithmetic — no shuffle, no state), so at 100 TB the
  * family rides the ingest scan for free, exactly where a production
  * pipeline runs it.
  *
  * Engine portability: every pattern below is written in the syntax
  * subset Java regex and RE2 interpret identically (explicit character
  * classes, no \s/\w shorthands whose definitions differ between the
  * engines, no lookaround, no backreferences), and every replacement
  * map is a fixed literal chain, so a SQL twin computes byte-identical
  * output. All non-ASCII constants are built from \u escapes or
  * derived mechanically — a cleaning module is itself maximally
  * exposed to source re-encoding damage, so none of its literals may
  * depend on the source file's own encoding surviving.
  */
object TextClean {

  // -------------------------------------------------------------------
  // Markup stripping
  // -------------------------------------------------------------------

  /** Explicit whitespace class — Java's \s includes U+000B where RE2's
    * does not, so the shorthand is banned here. */
  val Ws = "[ \\t\\n\\r\\x0B\\x0C]"

  /** Fixed entity-decode chain. &amp; MUST decode LAST: decoding it
    * first would turn the literal text "&amp;lt;" into "&lt;" and then
    * into "<" — the classic double-decode bug. */
  val Entities: Seq[(String, String)] = Seq(
    "&lt;" -> "<", "&gt;" -> ">", "&quot;" -> "\"", "&apos;" -> "'",
    "&#39;" -> "'", "&nbsp;" -> " ", "&amp;" -> "&")

  /** The entity-count pattern: what [[stripMarkup]] will decode. */
  val EntityPat = "&(lt|gt|quot|apos|nbsp|amp|#39);"

  /** The tag/entity strip as a pure COLUMN expression (no whitespace
    * collapse — callers pick their collapse policy): blocks → comments
    * → tags → entity chain. Composable per line as well as per page
    * (per line, a multi-line block is not recognized — its tags still
    * strip; the [[stripMarkup]] page form sees whole blocks). */
  def stripMarkupExpr(text: Column): Column = {
    val noBlocks = Seq("script", "style").foldLeft(text) { (c, t) =>
      regexp_replace(c, s"(?is)<$t[^>]*>.*?</$t>", " ")
    }
    val noComments = regexp_replace(noBlocks, "(?s)<!--.*?-->", " ")
    val noTags = regexp_replace(noComments, "<[^>]*>", " ")
    Entities.foldLeft(noTags) { case (c, (e, r)) =>
      replace(c, lit(e), lit(r))
    }
  }

  /** Strip HTML/XML markup down to text: script/style/comment BLOCKS go
    * first (their contents are code, not prose — a tag-only strip would
    * leak JavaScript into the corpus), then every remaining tag becomes
    * a space (block tags separate words), then the fixed entity chain
    * decodes, then whitespace collapses. Reported alongside:
    * `n_tags` — tag-shaped spans <...> in the RAW text (one number with
    * one unambiguous definition; block/comment contents count their own
    * tags) — and `n_entities` (entities the chain will decode, counted
    * post-strip). Not a parser — an unclosed script/style block
    * survives as tag-stripped text (acceptable for a cleaner; a crawler
    * needing DOM fidelity parses upstream).
    * Output: (doc_id, clean_text, n_tags, n_entities). */
  def stripMarkup(df: DataFrame, id: Column, text: Column): DataFrame = {
    val noBlocks = Seq("script", "style").foldLeft(text) { (c, t) =>
      regexp_replace(c, s"(?is)<$t[^>]*>.*?</$t>", " ")
    }
    val noComments = regexp_replace(noBlocks, "(?s)<!--.*?-->", " ")
    val noTags = regexp_replace(noComments, "<[^>]*>", " ")
    val decoded = Entities.foldLeft(noTags) { case (c, (e, r)) =>
      replace(c, lit(e), lit(r))
    }
    df.select(id.as("doc_id"),
      trim(regexp_replace(decoded, s"$Ws+", " ")).as("clean_text"),
      size(regexp_extract_all(text, lit("<[^>]*>"), lit(0)))
        .as("n_tags"),
      size(regexp_extract_all(noTags, lit(EntityPat), lit(0)))
        .as("n_entities"))
  }

  // -------------------------------------------------------------------
  // Mojibake repair
  // -------------------------------------------------------------------

  /** cp1252 decode of one byte: the 0x80–0x9F window has its own table
    * (undefined slots 0x81/8D/8F/90/9D pass through as C1 controls, the
    * lenient-decoder convention ICU and Python's cp1252 errors='replace'
    * neighbors follow); everything else is Latin-1 identity. */
  private def cp1252(b: Int): Char = (b & 0xFF) match {
    case 0x80 => '€'; case 0x82 => '‚'; case 0x83 => 'ƒ'
    case 0x84 => '„'; case 0x85 => '…'; case 0x86 => '†'
    case 0x87 => '‡'; case 0x88 => 'ˆ'; case 0x89 => '‰'
    case 0x8A => 'Š'; case 0x8B => '‹'; case 0x8C => 'Œ'
    case 0x8E => 'Ž'; case 0x91 => '‘'; case 0x92 => '’'
    case 0x93 => '“'; case 0x94 => '”'; case 0x95 => '•'
    case 0x96 => '–'; case 0x97 => '—'; case 0x98 => '˜'
    case 0x99 => '™'; case 0x9A => 'š'; case 0x9B => '›'
    case 0x9C => 'œ'; case 0x9E => 'ž'; case 0x9F => 'Ÿ'
    case other => other.toChar
  }

  /** What one UTF-8-encoded character looks like after a cp1252
    * mis-decode — the KEY the repair chain searches for. */
  def mojibakeOf(s: String): String =
    new String(s.getBytes("UTF-8").map(b => cp1252(b.toInt)))

  /** The characters the repair map covers: typographic punctuation
    * (three-byte UTF-8, so their damaged forms lead with U+00E2 "â")
    * FIRST, then Latin-1 letters/symbols (two-byte, damaged forms lead
    * with U+00C3 "Ã" or U+00C2 "Â"). The order is load-bearing: the
    * letter entry for "â" itself (key "Ã¢") must run after every â-led
    * punctuation key, or its output could not be distinguished from
    * freshly repaired text in the same pass. */
  private val MojibakeTargets: String =          // visible chars in comments
    "\u2018\u2019\u201C\u201D\u2013\u2014" + // ‘’“”–—
    "\u2026\u20AC\u2122" +                      // …€™
    "\u00E1\u00E0\u00E2\u00E4\u00E7" +        // áàâäç
    "\u00E9\u00E8\u00EA\u00ED" +               // éèêí
    "\u00F1\u00F3\u00F6\u00FA\u00FC\u00DF" + // ñóöúüß
    "\u00A0\u00B0\u00A3\u00A9"                 // nbsp ° £ ©

  /** UTF-8-read-as-cp1252 damage map, derived MECHANICALLY from
    * [[MojibakeTargets]] (encode the target as UTF-8, mis-decode the
    * bytes per cp1252) — correctness by construction, no hand-typed
    * mojibake literals to get re-mangled by the next editor. The one
    * non-identity repair: damaged NBSP restores to a PLAIN space (the
    * curation convention — downstream tokenizers split on it).
    *
    * Chain safety: no key is a prefix of another (three-byte keys lead
    * with "â", two-byte with "Ã"/"Â"), and no value re-triggers a later
    * key. Twice-encoded text repairs in two passes for the targets
    * whose damaged forms consist only of characters with their own map
    * entries — the apostrophe and both dashes (e.g. U+2019 arrives as
    * "Ã¢â‚¬â„¢"; pass 1's Ã¢/â‚¬/â„¢ entries reconstruct "â€™", pass 2
    * finishes); other doubled targets repair partially (their damaged
    * forms contain unmapped carriers like Å“). [[fixMojibake]] takes
    * `passes` for exactly that. */
  val Mojibake: Seq[(String, String)] =
    MojibakeTargets.map { ch =>
      val fixed = if (ch == '\u00A0') " " else ch.toString
      mojibakeOf(ch.toString) -> fixed
    }

  /** Count-pattern for the damage the map repairs: a plain alternation
    * of the keys (none contains a regex metacharacter — accented
    * letters and typographic punctuation only), valid in Java regex
    * and RE2 alike. Counted BEFORE repair so the report prices the
    * damage found. */
  val MojibakePat: String =
    Mojibake.map(_._1).mkString("(", "|", ")")

  /** The repair chain as a pure COLUMN expression — composable inside
    * larger cleaning pipelines ([[fixMojibake]] is the df form). */
  def fixMojibakeExpr(text: Column, passes: Int = 1): Column =
    (0 until passes).foldLeft(text) { (c, _) =>
      Mojibake.foldLeft(c) { case (cc, (bad, good)) =>
        replace(cc, lit(bad), lit(good))
      }
    }

  /** Repair mojibake via the fixed [[Mojibake]] replace chain, `passes`
    * times (pass 2 catches twice-encoded text). Output: (doc_id,
    * fixed_text, n_mojibake — damaged sequences present BEFORE repair —
    * changed). Map-side only. */
  def fixMojibake(df: DataFrame, id: Column, text: Column,
      passes: Int = 1): DataFrame = {
    require(passes >= 1 && passes <= 3,
      s"passes=$passes out of [1,3] (3 repairs triple-encoding, the " +
        "deepest damage seen in practice)")
    val fixedCol = fixMojibakeExpr(text, passes)
    df.select(id.as("doc_id"), fixedCol.as("fixed_text"),
      size(regexp_extract_all(text, lit(MojibakePat), lit(0)))
        .as("n_mojibake"))
      .withColumn("changed", col("n_mojibake") > 0)
  }

  // -------------------------------------------------------------------
  // Script-mix audit
  // -------------------------------------------------------------------

  /** Script classes as explicit BMP codepoint ranges (built from \u
    * escapes; the same Scala strings are interpolated into the
    * generated oracle, so both engines see identical literal ranges).
    * Astral-plane characters (emoji etc.) fall into `other` in BOTH
    * engines: neither a Java UTF-16 class nor an RE2 codepoint class
    * matches them against a BMP range, and both length() and len()
    * count one character. Latin deliberately includes the Latin-1/
    * Extended-A/B letters (and accepts the two stray math signs
    * U+00D7/U+00F7 — noise at audit scale). */
  val ScriptClasses: Seq[(String, String)] = Seq(
    "latin" -> "[A-Za-zÀ-ɏ]",
    "cyrillic" -> "[Ѐ-ӿ]",
    "greek" -> "[Ͱ-Ͽ]",
    "arabic" -> "[؀-ۿ]",
    "han" -> "[㐀-䶿一-鿿]",
    "kana" -> "[぀-ヿ]",
    "hangul" -> "[가-힯]",
    "digit" -> "[0-9]",
    "space" -> "[ \\t\\n\\r\\x0B\\x0C]")

  /** Per-doc script histogram — the mixed-script/wrong-script audit a
    * multilingual curation run reports next to lang-id (lang-id names
    * the best GUESS; this measures what is literally on the page — a
    * "de" doc that is 40% Han characters is mislabeled or spam).
    * Counts are length differences after class removal: n_x = len(t) −
    * len(regexp_replace(t, class_x, "")) — exact integers, one pass per
    * class, zero shuffles. `other` is the remainder; `main_script` is
    * the argmax over the LETTER classes (digits/spaces excluded — every
    * script uses them) with first-listed-wins tie-break, 'none' for a
    * doc with no letters at all; frac_main = main/letters raw IEEE.
    * Output: (doc_id, n_chars, n_<class>…, n_other, main_script,
    * frac_main). */
  def scriptMix(df: DataFrame, id: Column, text: Column): DataFrame = {
    val letters = ScriptClasses.map(_._1)
      .filterNot(Set("digit", "space"))
    val counted = df.select(Seq(id.as("doc_id"),
      length(text).as("n_chars")) ++
      ScriptClasses.map { case (name, cls) =>
        (length(text) - length(regexp_replace(text, cls, "")))
          .as(s"n_$name")
      }: _*)
    val withOther = counted.withColumn("n_other",
      col("n_chars") - ScriptClasses.map(c => col(s"n_${c._1}"))
        .reduce(_ + _))
    val nLetters = letters.map(l => col(s"n_$l")).reduce(_ + _)
    // strict > against the running max = first-listed-wins on ties
    val best = letters.tail.foldLeft(
      struct(col(s"n_${letters.head}").as("n"),
        lit(letters.head).as("s"))) { (acc, l) =>
      when(col(s"n_$l") > acc.getField("n"),
        struct(col(s"n_$l").as("n"), lit(l).as("s"))).otherwise(acc)
    }
    withOther
      .withColumn("main_script",
        when(nLetters === 0, lit("none")).otherwise(best.getField("s")))
      .withColumn("frac_main",
        when(nLetters === 0, lit(0.0)).otherwise(
          best.getField("n").cast("double") / nLetters.cast("double")))
  }

  // -------------------------------------------------------------------
  // C4 line filter
  // -------------------------------------------------------------------

  /** Terminal-punctuation pattern: a line must END in one of . ! ? "
    * (the C4 rule — Raffel et al. 2020 §2.2, public). */
  val TerminalPunct = "[.!?\"]$"

  /** Page-level blocklist: any page containing one of these is dropped
    * whole (the C4 "lorem ipsum" / "{" rules — placeholder text and
    * leaked code). Matched on the LOWERCASED page. */
  val PageBlocklist: Seq[String] = Seq("lorem ipsum", "{")

  /** Line-level blocklist: a line containing one of these is dropped
    * (C4's "javascript" rule — cookie/JS boilerplate banners). */
  val LineBlocklist: Seq[String] = Seq("javascript")

  /** The C4 line-and-page cleaning rules (Raffel et al. 2020 §2.2),
    * applied to newline-delimited text entirely IN ROW — split, filter
    * lambda, re-join; zero shuffles:
    *  - keep a line iff it ends in terminal punctuation, has ≥
    *    `minWordsPerLine` whitespace words, and contains no line-
    *    blocklist phrase (case-insensitive);
    *  - drop the whole page if it contains a page-blocklist phrase, or
    *    if fewer than `minKeptLines` lines survive (the "at least 3
    *    sentences" rule).
    * Output: (doc_id, n_lines, n_kept, page_dropped — blocklist hit,
    * keep_page — final verdict, kept_text — surviving lines re-joined,
    * '' when the page is dropped). */
  /** Horizontal-whitespace class — the per-line collapse (newlines are
    * the line structure; collapsing them would erase it). */
  val Hws = "[ \\t\\x0B\\x0C]"

  def c4LineFilter(df: DataFrame, id: Column, text: Column,
      minWordsPerLine: Int = 5, minKeptLines: Int = 3): DataFrame = {
    val lines = split(text, "\n")
    val keptArr = filter(lines, l =>
      regexp_like(l, lit(TerminalPunct)) &&
        size(split(l, " ")) >= minWordsPerLine &&
        !LineBlocklist.map(b => contains(lower(l), lit(b)))
          .reduce(_ || _))
    val blockHit = PageBlocklist.map(b => contains(lower(text), lit(b)))
      .reduce(_ || _)
    df.select(id.as("doc_id"), size(lines).as("n_lines"),
        size(keptArr).as("n_kept"), blockHit.as("page_dropped"),
        (!blockHit && size(keptArr) >= minKeptLines).as("keep_page"),
        array_join(keptArr, "\n").as("__kt"))
      .withColumn("kept_text",
        when(col("keep_page"), col("__kt")).otherwise(lit("")))
      .drop("__kt")
  }

  // -------------------------------------------------------------------
  // URL extraction & sentence segmentation
  // -------------------------------------------------------------------

  /** URL pattern — scheme + authority + path, stopping at whitespace or
    * closing punctuation that virtually never belongs to a URL in prose
    * (quote, angle bracket, paren). Java∩RE2 subset. */
  val UrlPat = "https?://[^ \\t\\n\\r\"'<>()]+"

  /** Domain of a matched URL: the authority up to the first /, :, ?, or
    * #, lowercased. */
  val DomainPat = "^https?://([^/:?#]+)"

  /** Extract every URL with its registrable domain — the provenance
    * audit behind domain-mixing weights and URL-keyed dedup. One row
    * per (doc, occurrence index); `url_no` numbers occurrences in
    * document order so the output has a total key. In-row explode, no
    * joins; the per-domain rollup is ONE partial-agg shuffle on a
    * domain-sized key space. Output: (doc_id, url_no, url, domain). */
  def extractUrls(df: DataFrame, id: Column, text: Column): DataFrame =
    df.select(id.as("doc_id"),
        posexplode(regexp_extract_all(text, lit(UrlPat), lit(0))))
      .select(col("doc_id"), (col("pos") + 1).cast("int").as("url_no"),
        col("col").as("url"),
        lower(regexp_extract(col("col"), DomainPat, 1)).as("domain"))

  /** Per-domain link statistics over [[extractUrls]]: how many docs and
    * occurrences point at each domain — the table a domain-mixing or
    * blocklist decision reads. */
  def domainStats(df: DataFrame, id: Column, text: Column): DataFrame =
    extractUrls(df, id, text).groupBy("domain")
      .agg(count(lit(1)).as("n_urls"),
        countDistinct(col("doc_id")).as("n_docs"))

  /** Sentence segmentation without lookbehind (RE2 has none): a
    * sentence is a maximal run of non-terminator characters followed by
    * a terminator run — `[^.!?]+[.!?]+` — and a trailing fragment with
    * no terminator is kept as a final sentence (real prose ends
    * mid-line all the time; dropping it would silently lose text).
    * The trailing fragment is recovered by comparing consumed length —
    * pure length arithmetic, no lookaround anywhere. The one place the
    * matches DON'T cover a prefix of the text is a LEADING terminator
    * run ("!!!Hello."): `[^.!?]+` can't start there, so the run is
    * skipped, not consumed — count it separately or the substr-based
    * fragment recovery re-emits the tail of the last sentence (r9
    * ADVICE fix; any interior terminator run is absorbed by the
    * previous match's greedy `[.!?]+`, so leading is the ONLY gap).
    * A terminator-ONLY document ("?!.") — no match, no tail — emits its
    * run as the single fragment row rather than vanishing; docs with at
    * least one sentence still drop a leading run (it is punctuation
    * noise, not text).
    * One row per sentence with its 1-based index and exact word/char
    * counts. In-row explode, map-side. Output: (doc_id, sent_no,
    * sentence, n_words, n_chars). */
  def splitSentences(df: DataFrame, id: Column, text: Column): DataFrame = {
    val sents = regexp_extract_all(text, lit("[^.!?]+[.!?]+"), lit(0))
    // total chars the matches consumed — plus the leading terminator
    // run the first match skipped; anything after is the fragment
    val consumed = length(regexp_extract(text, "^[.!?]+", 0)) +
      aggregate(sents, lit(0), (acc, s) => acc + length(s))
    val tail0 = trim(text.substr(lit(1) + consumed, length(text)))
    val all0 = when(length(tail0) > 0,
      concat(sents, array(tail0))).otherwise(sents)
    // a terminator-ONLY document ("?!.") has no match and no tail — the
    // leading run IS the whole text, so emit it as the one fragment
    // (the keep-don't-drop principle; r9 ADVICE). Guarded on the
    // all-empty case so docs with real sentences keep today's
    // leading-run-skipped behavior.
    val lead = trim(regexp_extract(text, "^[.!?]+", 0))
    val all = when(size(all0) === 0 && length(lead) > 0, array(lead))
      .otherwise(all0)
    df.select(id.as("doc_id"),
        posexplode(transform(all, s => trim(s))))
      .filter(length(col("col")) > 0)
      .select(col("doc_id"), (col("pos") + 1).cast("int").as("sent_no"),
        col("col").as("sentence"),
        size(split(col("col"), " ")).as("n_words"),
        length(col("col")).as("n_chars"))
  }

  /** The whole ingest chain as ONE map-side plan — the production
    * order: repair encoding damage first (mojibake sequences would
    * confuse every later rule), strip markup PER LINE (preserving the
    * line structure the C4 rules need — a page-level strip would
    * collapse newlines), collapse horizontal whitespace, then apply the
    * C4 line-and-page rules. Fuses into a single codegen stage over the
    * ingest scan: raw crawl bytes in, curated text out, one pass.
    * Output: the [[c4LineFilter]] columns over the cleaned text. */
  def ingestPipeline(df: DataFrame, id: Column, text: Column,
      passes: Int = 2, minWordsPerLine: Int = 5,
      minKeptLines: Int = 3): DataFrame = {
    val fixed = fixMojibakeExpr(text, passes)
    val cleaned = array_join(transform(split(fixed, "\n"),
      l => trim(regexp_replace(stripMarkupExpr(l), s"$Hws+", " "))),
      "\n")
    c4LineFilter(df.select(id.as("__id"), cleaned.as("__cleaned")),
      col("__id"), col("__cleaned"), minWordsPerLine, minKeptLines)
  }
}
