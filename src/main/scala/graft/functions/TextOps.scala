package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Text-analysis primitives for the LLM-data-pipeline operators: tokenize,
  * shingle, MinHash, SimHash, character n-grams, fingerprinting, language
  * ID and quality scoring.
  *
  * Everything is a composition of codegen'd built-ins (`split`,
  * `transform`, `aggregate`, `md5`) — no UDFs — so each function runs
  * inside whole-stage codegen and scales embarrassingly-parallel over
  * document splits. Hashes are all derived from `md5` so results are
  * engine-portable (the DuckDB oracle computes the identical values).
  */
object TextOps {
  /** Whitespace tokens of a single-space-joined text column. */
  def tokens(text: Column): Column = split(text, " ")

  /** Word n-gram shingles; empty array when the document has fewer than
    * n tokens (`sequence(1, 0)` would DESCEND and slice(…, 0) throws). */
  def shingles(toks: Column, n: Int): Column =
    when(size(toks) < n, array().cast("array<string>"))
      .otherwise(transform(sequence(lit(1), size(toks) - (n - 1)),
        i => concat_ws(" ", slice(toks, i, lit(n)))))

  /** MinHash value for one seeded hash family member: the minimum md5 of
    * `"<seed>|<shingle>"` over the shingle set. Any total order over a
    * uniform hash is a valid MinHash carrier, so the hex string min works
    * and stays portable across engines. */
  def minhash(shingleArr: Column, seed: Int): Column =
    array_min(transform(shingleArr, sh => md5(concat_ws("|", lit(seed.toString), sh))))

  /** Fused native form of `array_distinct(shingles(tokens(text), n))` —
    * one pass over the string per row ([[expressions.WordShingles]]),
    * property-tested bit-equal to the HOF composition. */
  def shinglesNative(text: Column, n: Int): Column =
    org.apache.spark.sql.GraftShim.column(expressions.WordShingles(
      org.apache.spark.sql.GraftShim.expression(text), n))

  /** Fused native form of the bare `shingles(tokens(text), n)` —
    * positional order, duplicates kept — for consumers that need every
    * window (q100's `posexplode`), property-tested bit-equal to the
    * HOF composition. */
  def shinglesAllNative(text: Column, n: Int): Column =
    org.apache.spark.sql.GraftShim.column(expressions.WordShingles(
      org.apache.spark.sql.GraftShim.expression(text), n, distinct = false))

  /** Positional winnowing fingerprints (q103) as one fused scan-local
    * pass ([[expressions.WinnowFingerprints]]): distinct w-window
    * minima over char n-gram md5s, property-tested equal to the
    * posexplode + doc-window + distinct dataflow it replaces. */
  def winnowFingerprints(text: Column, n: Int, w: Int): Column =
    org.apache.spark.sql.GraftShim.column(expressions.WinnowFingerprints(
      org.apache.spark.sql.GraftShim.expression(text), n, w))

  /** (gram-hash, variant-hash) structs for fuzzy n-gram
    * decontamination (q115) as one fused pass
    * ([[expressions.FuzzyVariantPairs]]): n drop-one variant keys per
    * positional word n-gram, 64-bit hashed with the drop position as
    * salt — property-tested against the unrolled string-key
    * formulation for the SymSpell equivalence. */
  def fuzzyVariantPairs(text: Column, n: Int): Column =
    org.apache.spark.sql.GraftShim.column(expressions.FuzzyVariantPairs(
      org.apache.spark.sql.GraftShim.expression(text), n))

  /** Content-defined chunk md5s (q101) as one fused pass
    * ([[expressions.CdcChunkHashes]]), property-tested bit-equal to the
    * declarative boundary-filter + zip_with chain. */
  def cdcChunkHashes(text: Column, w: Int): Column =
    org.apache.spark.sql.GraftShim.column(expressions.CdcChunkHashes(
      org.apache.spark.sql.GraftShim.expression(text), w))

  /** Fused native md5-52-bit seam ([[expressions.Md5Long52]]): equals
    * `conv(substring(md5(s), 1, 13), 16, 10).cast("long")` bit-for-bit
    * (property-tested) with one reused digest and no hex round-trip —
    * for per-ROW uses of the deterministic-uniform seam, where the
    * declarative stack's hex parse is the measured wall. */
  def md5Long52(s: Column): Column =
    org.apache.spark.sql.GraftShim.column(expressions.Md5Long52(
      org.apache.spark.sql.GraftShim.expression(s)))

  /** Fused native form of the full [[minhash]] family: element i equals
    * `minhash(sh, i)` ([[expressions.MinHashes]]; one reused digest per
    * row instead of a fresh one per (shingle, seed)). */
  def minhashesNative(sh: Column, numHashes: Int): Column =
    org.apache.spark.sql.GraftShim.column(expressions.MinHashes(
      org.apache.spark.sql.GraftShim.expression(sh), numHashes))

  /** Fused LSH band keys from a shingle array: one kernel call computes
    * the minhash family AND formats the `bands` keys, so an `explode`
    * over it evaluates the family exactly once per row
    * ([[expressions.MinHashBandKeys]] — `GenerateExec` does no
    * subexpression elimination, so composing from [[minhashesNative]]
    * under an explode re-runs the md5 family per key component).
    * Empty shingle set ⇒ empty array (explode drops the row). */
  def bandKeysNative(sh: Column, bands: Int, rowsPerBand: Int): Column =
    org.apache.spark.sql.GraftShim.column(expressions.MinHashBandKeys(
      org.apache.spark.sql.GraftShim.expression(sh), bands, rowsPerBand))

  /** 16-bit SimHash over a token array. Bit j of each token's hash is the
    * parity of hex digit j of its md5; the SimHash bit is the majority
    * vote weighted by token frequency (> 0 after ±1 accumulation). */
  def simhash16(toks: Column): Column =
    aggregate(
      sequence(lit(0), lit(15)),
      lit(0L),
      (acc, j) =>
        acc + when(
          aggregate(toks, lit(0), (s, t) =>
            s + (conv(md5(t).substr(j + 1, lit(1)), 16, 10).cast("int") % 2) * 2 - 1) > 0,
          pow(lit(2.0), j).cast("long")
        ).otherwise(lit(0L)))

  /** Fused native form of [[simhash16]] — one md5 per token instead of
    * one per (token, bit); property-tested bit-equal. Elements must be
    * non-null (token arrays from `split` always are). */
  def simhash16Native(toks: Column): Column =
    org.apache.spark.sql.GraftShim.column(expressions.SimHash16(
      org.apache.spark.sql.GraftShim.expression(toks)))

  /** 60-bit SimHash (4×15-bit pigeonhole blocks for hamming-3 joins,
    * q192) — fused native kernel, one md5 per token; bit k is the
    * majority vote of bit (k mod 4) of hex digit (k div 4). */
  def simhash60Native(toks: Column): Column =
    org.apache.spark.sql.GraftShim.column(expressions.SimHash60(
      org.apache.spark.sql.GraftShim.expression(toks)))

  /** Character n-grams of a text column (positions 1..len-n+1). */
  def charNgrams(text: Column, n: Int): Column =
    transform(sequence(lit(1), greatest(length(text) - (n - 1), lit(1))),
      i => text.substr(i, lit(n)))

  /** Rolling-hash document fingerprint: min md5 over character 5-grams —
    * a deterministic winnowing-style signature. Served by the fused
    * native [[expressions.MinGramMd5]] kernel (one digest instance,
    * no per-window substring/hex allocation — 3.2 s → sub-second at
    * sf0.1 under the all-columns bench action); [[fingerprintHof]]
    * keeps the built-in composition the kernel is property-tested
    * against. */
  def fingerprint(text: Column): Column =
    org.apache.spark.sql.GraftShim.column(expressions.MinGramMd5(
      org.apache.spark.sql.GraftShim.expression(text), 5))

  /** The pure-built-ins fingerprint formulation (the kernel's spec). */
  def fingerprintHof(text: Column): Column =
    array_min(transform(
      sequence(lit(1), greatest(length(text) - 4, lit(1))),
      i => md5(text.substr(i, lit(5)))))

  /** Count of tokens from `set` present in the token array. */
  def markerCount(toks: Column, set: Seq[String]): Column =
    size(filter(toks, t => t.isin(set.map(lit): _*)))

  /** Language-ID marker sets (tiny stopword heuristics). */
  val Markers: Seq[(String, Seq[String])] = Seq(
    "de" -> Seq("der", "die", "das", "und", "nicht"),
    "en" -> Seq("the", "a", "of", "and", "to"),
    "es" -> Seq("el", "la", "los", "que", "de"),
    "fr" -> Seq("le", "la", "les", "et", "des"))

  /** N-gram-heuristic language ID: argmax of marker-set hits, first match
    * wins ties in `Markers` order, no hits ⇒ "und". */
  def langId(toks: Column): Column = {
    val counts = Markers.map { case (l, set) => l -> markerCount(toks, set) }
    val best = counts.map(_._2).reduce((a, b) => greatest(a, b))
    counts.foldRight(lit("und")) { case ((l, c), els) =>
      when(c === best && c > 0, lit(l)).otherwise(els)
    }
  }

  /** English stopword markers — the `Markers("en")` set, shared by the
    * quality score so its stopword ratio stays pinned to language ID. */
  val EnStops: Seq[String] = Seq("the", "a", "of", "and", "to")

  /** The canonical document quality score (q25's formula):
    * `min(tokens/100, 1) · (1 − stopword_ratio)`, rounded to 4 dp. ONE
    * definition — q25, the percentile curation (q54), the token-budget
    * walk (q65) and their specs all call this, so a formula tweak can
    * never silently diverge between the scorer and its consumers. */
  def qualityScore(text: Column): Column = {
    val toks = tokens(text)
    val nTok = size(toks).cast("long")
    val stopRatio = markerCount(toks, EnStops).cast("double") / size(toks)
    round(least(nTok.cast("double") / 100.0, lit(1.0)) * (lit(1.0) - stopRatio), 4)
  }

  /** PII patterns for corpus scrubbing, ordered most-specific-first so a
    * value never half-matches a later, looser pattern (an email's domain
    * must not survive as a "hostname"; a card number must not be eaten
    * digit-group-wise by the phone pattern). Each entry is
    * (tag, java-regex); the same patterns drive both [[redactPii]] and
    * [[piiCounts]]. Patterns are conservative public-knowledge shapes —
    * a scrubbing pass prefers false positives over leaked PII. */
  val PiiPatterns: Seq[(String, String)] = Seq(
    "email" -> """[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}""",
    // card digits group in FOURS with one CONSISTENT separator (the
    // backreference): a per-digit-optional separator would greedily
    // span two ADJACENT distinct values ("123-45-6789 555-123-4567" is
    // a 16-digit run), mislabeling both and leaking a remnant. Groups
    // of 4 + \1 can't start inside SSN (3-2-4) or phone (3-3-4)
    // shapes. Tail covers 13-19 digit PANs (Visa-13 … UnionPay-19).
    "card" -> """\b\d{4}([ -]?)\d{4}\1\d{4}\1\d{1,4}(?:\1\d{1,3})?\b""",
    "ssn" -> """\b\d{3}-\d{2}-\d{4}\b""",
    // leading guard is a lookbehind, not \b: "(555)" starts at a
    // space→paren position, which is not a word boundary; the area-code
    // separator is optional only after a PARENTHESIZED code ("(555)123-
    // 4567" is standard formatting, bare "555123-4567" is not)
    "phone" -> """(?<![\d.-])(?:\+?\d{1,3}[ .-]?)?(?:\(\d{3}\)[ .-]?|\d{3}[ .-])\d{3}[ .-]\d{4}\b""",
    "ipv4" -> """\b(?:(?:25[0-5]|2[0-4]\d|1\d\d|[1-9]?\d)\.){3}(?:25[0-5]|2[0-4]\d|1\d\d|[1-9]?\d)\b""")

  /** Redact every [[PiiPatterns]] match to `[TAG]`, applied in pattern
    * order. Pure chained `regexp_replace` — codegen'd, scan-local, no
    * shuffle; the 100 TB scrub is exactly this expression inside the
    * ingest projection. */
  def redactPii(text: Column): Column =
    PiiPatterns.foldLeft(text) { case (c, (tag, re)) =>
      regexp_replace(c, re, s"[${tag.toUpperCase}]")
    }

  /** Per-tag PII match counts as a map<string,int> — the audit side of
    * the scrub (counts ride `observe()`/aggregations without a second
    * scan). Counted sequentially in the same order as [[redactPii]], on
    * the progressively-redacted text, so counts equal what redaction
    * actually replaced (a card number is never double-counted as
    * phone-shaped digit groups). */
  def piiCounts(text: Column): Column = {
    val (cols, _) = PiiPatterns.foldLeft(
        (Seq.empty[Column], text)) { case ((acc, cur), (tag, re)) =>
      val cnt = size(regexp_extract_all(cur, lit(re), lit(0)))
      (acc :+ struct(lit(tag).as("tag"), cnt.as("n")),
        regexp_replace(cur, re, s"[${tag.toUpperCase}]"))
    }
    map_from_entries(array(cols: _*))
  }
}
