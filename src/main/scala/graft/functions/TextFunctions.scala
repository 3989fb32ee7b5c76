package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

import graft.functions.expr.MarkerFunctions.markerCounts
import graft.functions.expr.ShingleFunctions

/** Text-analysis column functions for the documents pipeline — all
  * composed from built-in (codegen'd / vectorizable) expressions so the
  * same logic is expressible in the ANSI-SQL oracle. Custom Catalyst
  * expressions live in [[graft.functions.expr]] and are used only where
  * built-ins can't express the kernel (simhash/minhash/rolling hash).
  */
object TextFunctions {

  /** lower-cased, trimmed, whitespace-collapsed text. */
  def normText(c: Column): Column =
    regexp_replace(lower(trim(c)), "\\s+", " ")

  /** whitespace tokens of the normalized text. */
  def tokens(c: Column): Column = split(normText(c), " ")

  /** whitespace token count; 0 for empty/blank text. */
  def tokenCountWs(c: Column): Column =
    when(length(normText(c)) === 0, 0L).otherwise(size(tokens(c)).cast("long"))

  /** BPE-ish token count: alpha runs, digit runs, and single non-space
    * symbols each count as one token (a cheap proxy for subword tokenizer
    * load estimation).
    */
  def tokenCountRegex(c: Column): Column =
    size(regexp_extract_all(c, lit("[A-Za-z]+|[0-9]+|[^A-Za-z0-9\\s]"), lit(0))).cast("long")

  /** word n-gram shingles (space-joined) of the normalized text; empty
    * array when fewer than n tokens. Declarative REFERENCE form (with
    * multiplicity) — the production path is [[shingleSet]]'s compiled
    * kernel, which ShingleKernelSpec asserts element-equal to this.
    */
  def wordShingles(c: Column, n: Int): Column = {
    val t = tokens(c)
    when(size(t) < n, array().cast("array<string>"))
      .otherwise(transform(
        sequence(lit(1), size(t) - (n - 1)),
        i => array_join(slice(t, i, lit(n)), " ")))
  }

  /** distinct shingle set (order-insensitive) for Jaccard math —
    * single-pass codegen'd kernel ([[graft.functions.expr.ShingleSet]]).
    */
  def shingleSet(c: Column, n: Int): Column =
    ShingleFunctions.shingleSet(tokens(c), n)

  /** ORDERED per-window n-gram hashes of the normalized text (element i =
    * xxhash64 of the window starting at token i) — the positional shape
    * the repeated-span operator needs, where [[shingleSet]]'s distinct set
    * loses positions. Compiled kernel
    * ([[graft.functions.expr.ShingleWindowHashes]]).
    */
  def shingleWindowHashes(c: Column, n: Int): Column =
    ShingleFunctions.shingleWindowHashes(tokens(c), n)

  /** Within-doc repetition: the duplicate n-gram fraction,
    * 1 − distinct/total word n-grams (0 when fewer than n tokens) — the
    * standard repetition filter for training corpora (boilerplate,
    * keyword stuffing, and degenerate generations repeat n-grams; clean
    * prose rarely does). Distinct count reuses the compiled shingle
    * kernel; the total is arithmetic on the token count, so the whole
    * signal is one pass over the tokens.
    */
  def repetitionRatio(c: Column, n: Int = 3): Column = {
    val total = greatest(tokenCountWs(c) - (n - 1), lit(0L))
    when(total === 0, 0.0)
      .otherwise(lit(1.0) - size(shingleSet(c, n)).cast("double") / total)
  }

  /** PII scrubbing for training corpora: email addresses and URLs
    * replaced with placeholder tokens. Both patterns are deliberately
    * lookaround-free so the exact same regex runs under Java regex
    * (Spark, codegen'd `regexp_replace`) and RE2 (the DuckDB oracle).
    * URLs are scrubbed FIRST so an address embedded in a URL's userinfo
    * is consumed as part of the URL, not left half-redacted.
    */
  val emailPattern = "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}"
  val urlPattern = "https?://[^\\s]+"

  def scrubPii(c: Column): Column =
    regexp_replace(regexp_replace(c, urlPattern, "<URL>"), emailPattern, "<EMAIL>")

  /** number of non-overlapping matches of `pattern` in `c`. */
  def matchCount(c: Column, pattern: String): Column =
    size(regexp_extract_all(c, lit(pattern), lit(0))).cast("long")

  /** The common UTF-8-read-as-Windows-1252 DOUBLE-ENCODING artifacts
    * ("mojibake") and their repairs — the ftfy-class encoding-repair
    * step of web-corpus curation. The patterns are mutually disjoint
    * (three-char â€x artifacts with distinct final chars — the x of
    * U+2019/2014/201C/201D includes an INVISIBLE U+009D — and two-char
    * Ãx artifacts), and every one is a regex-metacharacter-free
    * literal, so the identical chain runs under Java regex and RE2
    * (the DuckDB oracle's engine) in any order; the order is pinned
    * anyway as part of the replay contract.
    */
  val mojibakePairs: Seq[(String, String)] = Seq(
    "â€™" -> "’", "â€”" -> "—", "â€œ" -> "“", "â€" -> "”",
    "Ã©" -> "é", "Ã¨" -> "è", "Ã¼" -> "ü", "Ã±" -> "ñ", "Ã¯" -> "ï",
    "Ã¶" -> "ö", "Ã§" -> "ç")

  /** Count of mojibake artifacts present (the detector — a corpus
    * health metric and the repair trigger).
    */
  def mojibakeCount(c: Column): Column =
    mojibakePairs.map { case (bad, _) => matchCount(c, bad) }
      .reduce(_ + _)

  /** Repair by replacing every artifact with its decoded character —
    * sequential literal replaces in the pinned [[mojibakePairs]] order
    * (longest-prefix-first makes the order-insensitive in practice,
    * but the order is still part of the contract the oracle replays).
    *
    * KNOWN LIMITATION (documented, not defended): the chain is not
    * idempotent under adversarial nesting — replacement OUTPUT can
    * recombine with a leftover prefix into a new artifact. Example:
    * "â€" immediately followed by the "â€" artifact — replacing
    * the latter with '”' synthesizes "â€”" (the em-dash
    * artifact) AFTER that rule has already run, leaving it unrepaired.
    * No finite replace chain is idempotent here (every pass can nest
    * one level deeper), so the contract is exactly ONE pass; the
    * DuckDB oracle replays the identical chain in the identical order,
    * so engine/oracle parity holds on every input including these.
    * Real-world mojibake comes from ONE mis-decode (UTF-8 read as
    * cp1252), which never produces the nested shape; a corpus where it
    * matters should iterate [[mojibakeCount]] → repair to fixpoint.
    */
  def fixMojibake(c: Column): Column =
    mojibakePairs.foldLeft(c) { case (acc, (bad, good)) =>
      regexp_replace(acc, bad, good)
    }

  /** HTML-to-text extraction for web-scrape curation: script/style blocks
    * dropped whole, remaining tags stripped, the common entities decoded
    * (`&amp;` last so `&amp;lt;` does not double-decode), whitespace
    * collapsed. Every pattern is lookaround- and backreference-free so
    * the identical regexes run under Java regex and RE2 (the DuckDB
    * oracle); this is the cheap curation-scale pass — a fidelity
    * extraction (tables, lists, boilerplate classification) belongs in a
    * dedicated parser behind the multimodal-style stub boundary.
    */
  def stripHtml(c: Column): Column = {
    val noScript = regexp_replace(c, "(?is)<script[^>]*>.*?</script>", " ")
    val noStyle = regexp_replace(noScript, "(?is)<style[^>]*>.*?</style>", " ")
    val noTags = regexp_replace(noStyle, "<[^>]*>", " ")
    val decoded = Seq(
      "&lt;" -> "<", "&gt;" -> ">", "&quot;" -> "\"",
      "&#39;" -> "'", "&nbsp;" -> " ", "&amp;" -> "&")
      .foldLeft(noTags) { case (col0, (ent, ch)) =>
        replace(col0, lit(ent), lit(ch))
      }
    trim(regexp_replace(decoded, "\\s+", " "))
  }

  /** characters that are neither alnum nor whitespace, over total chars. */
  def punctRatio(c: Column): Column = {
    val len = length(c)
    when(len === 0, 0.0).otherwise(
      (len - length(regexp_replace(c, "[^A-Za-z0-9\\s]", ""))).cast("double") / len)
  }

  /** small English stopword marker set (public top-frequency words). */
  val stopwordsEn: Seq[String] = Seq(
    "the", "a", "an", "and", "or", "of", "to", "in", "is", "it",
    "for", "on", "with", "as", "at", "by", "be", "this", "that", "are")

  /** fraction of whitespace tokens that are in `words` (single-pass
    * codegen'd kernel — see [[graft.functions.expr.MarkerCounts]]).
    */
  def wordSetRatio(c: Column, words: Seq[String]): Column = {
    val t = tokens(c)
    val cnt = element_at(markerCounts(t, Seq(words)), 1)
    when(size(t) === 0, 0.0).otherwise(cnt.cast("double") / size(t))
  }

  def stopwordRatio(c: Column): Column = wordSetRatio(c, stopwordsEn)

  /** Heuristic quality score in [0,1]: blends length sanity, punctuation
    * sanity, and stopword presence (the usual cheap pre-LLM text filters).
    */
  def qualityScore(c: Column): Column = {
    val lenScore = least(length(c).cast("double") / 200.0, lit(1.0))
    val punctScore = greatest(lit(0.0), lit(1.0) - punctRatio(c) * 4.0)
    val stopScore = least(stopwordRatio(c) * 5.0, lit(1.0))
    round((lenScore + punctScore + stopScore) / 3.0, 6)
  }

  /** Marker-word language ID over a small per-language stopword table
    * (n-gram-frequency heuristic reduced to its top markers). Returns the
    * language with the highest marker hit count; ties and zero-hit rows
    * fall back to "und". Deterministic and SQL-expressible.
    */
  val langMarkers: Seq[(String, Seq[String])] = Seq(
    "en" -> Seq("the", "and", "of", "to", "is"),
    "de" -> Seq("der", "die", "und", "das", "ist"),
    "fr" -> Seq("le", "la", "et", "les", "est"),
    "es" -> Seq("el", "los", "las", "es", "una"))

  def langId(c: Column): Column = {
    // ALL languages' marker counts in one token pass (codegen'd kernel;
    // repeated references below dedupe via codegen subexpression
    // elimination) — the HOF form re-walked the tokens per language,
    // interpreted
    val cnts = markerCounts(tokens(c), langMarkers.map(_._2))
    val counts = langMarkers.zipWithIndex.map { case ((lang, _), i) =>
      lang -> element_at(cnts, i + 1)
    }
    val best = counts.map(_._2).reduce((a, b) => greatest(a, b))
    // first language (in langMarkers order) achieving the max count wins
    counts.foldRight(lit("und")) { case ((lang, n), acc) =>
      when(n === best && best > 0, lit(lang)).otherwise(acc)
    }
  }

  /** Unicode SCRIPT classes for script detection (the mC4-family
    * curation step script ID — distinct from [[langId]]: script is a
    * property of the writing system, language of the vocabulary; a
    * Russian and a Bulgarian doc share Cyrillic). BMP ranges only, so
    * the char count is identical under UTF-16 units (Spark `length`)
    * and codepoints (DuckDB `LENGTH`). Order is the deterministic
    * tie-break priority.
    */
  val scriptRanges: Seq[(String, String)] = Seq(
    "latin" -> "a-zA-Z",
    "cyrillic" -> "Ѐ-ӿ",
    "greek" -> "Ͱ-Ͽ",
    "arabic" -> "؀-ۿ",
    "cjk" -> "一-鿿",
    "hangul" -> "가-힣")

  /** Per-class character counts: one codegen'd regexp_replace per class
    * (count = chars removed), map-side, zero shuffle.
    */
  def scriptCounts(c: Column): Seq[(String, Column)] =
    scriptRanges.map { case (name, range) =>
      name -> (length(c) - length(regexp_replace(c, s"[$range]", "")))
        .cast("long")
    }

  /** Dominant script of the text — argmax of [[scriptCounts]], first
    * class in [[scriptRanges]] order on ties, 'und' when no class
    * character occurs.
    */
  def dominantScript(c: Column): Column = {
    val counts = scriptCounts(c)
    val best = counts.map(_._2).reduce((a, b) => greatest(a, b))
    counts.foldRight(lit("und")) { case ((name, n), acc) =>
      when(n === best && best > 0, lit(name)).otherwise(acc)
    }
  }

  /** Exact-dup content fingerprint: md5 of the normalized text. */
  def contentFingerprint(c: Column): Column = md5(normText(c))

  /** Crawl-curation URL canonicalization — the normalize-before-dedup
    * step that runs in front of per-domain caps (q110) and URL-keyed
    * exact dedup, so `HTTP://WWW.X.COM:80/a/?utm_source=f&b=2&a=1#top`
    * and `http://www.x.com/a?a=1&b=2` collapse to one key:
    *
    *   - scheme and host LOWERCASE (case-insensitive by RFC 3986); the
    *     PATH keeps its case (case-sensitive by the same RFC);
    *   - default ports stripped (`:80` for http, `:443` for https);
    *   - trailing-slash runs stripped from the path;
    *   - the fragment dropped (never sent to the server);
    *   - tracking parameters removed (`utm_*`, `fbclid`, `gclid`,
    *     `ref` — the C4/CCNet-era link-decoration set);
    *   - surviving query parameters SORTED (order is almost always
    *     semantically irrelevant and is the largest accidental-dup
    *     source after tracking params).
    *
    * Built from built-ins only (regexp extracts + array ops), every step
    * replayable with the SAME regexes in the DuckDB oracle — no UDF, no
    * java.net.URI (whose parsing behavior an oracle cannot mirror).
    */
  def canonicalUrl(u: Column): Column = {
    val scheme = lower(regexp_extract(u, "^([A-Za-z][A-Za-z0-9+.-]*)://", 1))
    val auth = lower(regexp_extract(u, "^[A-Za-z][A-Za-z0-9+.-]*://([^/?#]*)", 1))
    val host = when(scheme === "http", regexp_replace(auth, ":80$", ""))
      .when(scheme === "https", regexp_replace(auth, ":443$", ""))
      .otherwise(auth)
    val path = regexp_replace(
      regexp_extract(u, "^[A-Za-z][A-Za-z0-9+.-]*://[^/?#]*([^?#]*)", 1),
      "/+$", "")
    val qs = regexp_extract(u, "\\?([^#]*)", 1)
    val keep = array_sort(filter(split(qs, "&"),
      p => p =!= "" && !p.rlike("^(utm_[^=]*|fbclid|gclid|ref)(=|$)")))
    val query = when(size(keep) > 0, concat(lit("?"), concat_ws("&", keep)))
      .otherwise(lit(""))
    concat(scheme, lit("://"), host, path, query)
  }
}
