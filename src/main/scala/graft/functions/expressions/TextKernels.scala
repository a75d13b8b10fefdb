package graft.functions.expressions

import java.security.MessageDigest

import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Distinct word n-gram shingles of a text column as ONE native
  * expression — the fused, codegen-callable form of
  * `array_distinct(transform(sequence(...), i -> concat_ws(" ",
  * slice(split(text, " "), i, n))))`. The HOF stack evaluates three
  * interpreted lambdas and allocates a sliced token array per shingle
  * position; this kernel makes one pass over the string. Bit-identical
  * by construction (property-tested against the HOF formulation): split
  * on single spaces keeping empties, windows joined by a single space,
  * first-occurrence dedup order.
  */
case class WordShingles(child: Expression, n: Int, distinct: Boolean = true)
    extends UnaryExpression {
  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def prettyName: String = "graft_shingles"

  override protected def nullSafeEval(input: Any): Any =
    WordShingles.compute(input.asInstanceOf[UTF8String], n, distinct)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c =>
      s"graft.functions.expressions.WordShingles.compute($c, $n, $distinct)")

  override protected def withNewChildInternal(newChild: Expression): WordShingles =
    copy(child = newChild)
}

object WordShingles {
  /** Static entry for generated code (one invoke per row). With
    * `distinct = false` the window list is returned as-is (positional
    * order, duplicates kept) — the fused form of the bare HOF
    * `shingles` composition the positional dedup family (q100) feeds
    * through `posexplode`.
    */
  def compute(text: UTF8String, n: Int, distinct: Boolean): ArrayData = {
    val s = text.toString
    val toks = new java.util.ArrayList[String]
    var start = 0
    var i = 0
    // split(" ", -1) semantics: single-space delimiter, empties kept
    while (i <= s.length) {
      if (i == s.length || s.charAt(i) == ' ') {
        toks.add(s.substring(start, i))
        start = i + 1
      }
      i += 1
    }
    val m = toks.size - (n - 1)
    if (m <= 0) return new GenericArrayData(Array.empty[Any])
    // LinkedHashSet for first-occurrence dedup order; ArrayList keeps
    // every positional window
    val seen: java.util.Collection[String] =
      if (distinct) new java.util.LinkedHashSet[String]
      else new java.util.ArrayList[String](m)
    var j = 0
    while (j < m) {
      val sb = new java.lang.StringBuilder
      var k = 0
      while (k < n) {
        if (k > 0) sb.append(' ')
        sb.append(toks.get(j + k))
        k += 1
      }
      seen.add(sb.toString)
      j += 1
    }
    val out = new Array[Any](seen.size)
    val it = seen.iterator()
    var x = 0
    while (it.hasNext) { out(x) = UTF8String.fromString(it.next()); x += 1 }
    new GenericArrayData(out)
  }
}

/** All `numHashes` MinHash family members over a shingle array in ONE
  * pass — the fused form of `numHashes` separate
  * `array_min(transform(sh, x -> md5(concat_ws("|", seed, x))))`
  * columns. One reused MessageDigest per row instead of a fresh digest
  * (plus concat/hex/UTF8String churn) per (shingle, seed) pair.
  * Element i equals the HOF `TextOps.minhash(sh, i)` exactly: md5 hex
  * (lowercase) of `"<seed>|<shingle>"`, minimum by string order; null
  * when the shingle set is empty (array_min of empty), hence
  * `containsNull = true`.
  */
case class MinHashes(child: Expression, numHashes: Int) extends UnaryExpression {
  override def dataType: DataType = ArrayType(StringType, containsNull = true)
  override def prettyName: String = "graft_minhashes"

  override protected def nullSafeEval(input: Any): Any =
    MinHashes.compute(input.asInstanceOf[ArrayData], numHashes)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c =>
      s"graft.functions.expressions.MinHashes.compute($c, $numHashes)")

  override protected def withNewChildInternal(newChild: Expression): MinHashes =
    copy(child = newChild)
}

/** LSH band keys straight from a shingle array in ONE kernel call —
  * the fused form of `explode`-feeding
  * `array(concat_ws("|", b, mh[b*r], …, mh[b*r+r-1]) for b < bands)`
  * over `mh = graft_minhashes(sh, bands*rowsPerBand)`. The array
  * formulation references `mh` once per band component (8 `getItem`s +
  * a null check), and `GenerateExec` — unlike `ProjectExec` — performs
  * NO subexpression elimination, so under an `explode` the entire md5
  * minhash family was recomputed per reference (~9× the kernel work;
  * measured as the q19 regression). This kernel computes the family
  * once and formats the keys in the same pass. Empty shingle set ⇒
  * EMPTY key array (not null), so `explode` naturally drops empty
  * documents without an up-front filter. Key format is byte-identical
  * to the concat_ws form ("&lt;band&gt;|&lt;hex&gt;|&lt;hex&gt;"), so
  * candidates from stored `mh` columns and from this kernel agree.
  */
case class MinHashBandKeys(child: Expression, bands: Int, rowsPerBand: Int)
    extends UnaryExpression {
  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def prettyName: String = "graft_bandkeys"

  override protected def nullSafeEval(input: Any): Any =
    MinHashBandKeys.compute(input.asInstanceOf[ArrayData], bands, rowsPerBand)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c =>
      s"graft.functions.expressions.MinHashBandKeys.compute($c, $bands, $rowsPerBand)")

  override protected def withNewChildInternal(newChild: Expression): MinHashBandKeys =
    copy(child = newChild)
}

object MinHashBandKeys {
  /** Static entry for generated code (one invoke per row). */
  def compute(sh: ArrayData, bands: Int, rowsPerBand: Int): ArrayData = {
    if (sh.numElements() == 0) return new GenericArrayData(Array.empty[Any])
    val mh = MinHashes.compute(sh, bands * rowsPerBand)
    val out = new Array[Any](bands)
    var b = 0
    while (b < bands) {
      val sb = new java.lang.StringBuilder
      sb.append(b).append('|')
      var r = 0
      while (r < rowsPerBand) {
        if (r > 0) sb.append('|')
        sb.append(mh.getUTF8String(b * rowsPerBand + r).toString)
        r += 1
      }
      out(b) = UTF8String.fromString(sb.toString)
      b += 1
    }
    new GenericArrayData(out)
  }
}

/** 16-bit SimHash over a token array in ONE pass with ONE md5 per token
  * — the fused form of [[graft.functions.TextOps.simhash16]], whose
  * nested-aggregate formulation recomputes `md5(t)` for every one of the
  * 16 bit positions. Bit j's vote is the parity of hex digit j of the
  * token's md5, majority-weighted by token frequency (> 0 after ±1
  * accumulation) — identical votes, identical result, 16× fewer
  * digests.
  */
case class SimHash16(child: Expression) extends UnaryExpression {
  override def dataType: DataType = org.apache.spark.sql.types.LongType
  override def prettyName: String = "graft_simhash16"

  override protected def nullSafeEval(input: Any): Any =
    SimHash16.compute(input.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c =>
      s"graft.functions.expressions.SimHash16.compute($c)")

  override protected def withNewChildInternal(newChild: Expression): SimHash16 =
    copy(child = newChild)
}

object SimHash16 {
  /** Static entry for generated code (one invoke per row). */
  def compute(toks: ArrayData): Long = {
    val votes = new Array[Int](16)
    val md = MessageDigest.getInstance("MD5")
    val n = toks.numElements()
    var i = 0
    while (i < n) {
      md.reset()
      md.update(toks.getUTF8String(i).getBytes)
      val d = md.digest()
      // hex digit j = high nibble of byte j/2 when j even, low when odd;
      // parity of the digit = its lowest bit
      var j = 0
      while (j < 16) {
        val nib = if ((j & 1) == 0) (d(j >> 1) >> 4) & 0xf else d(j >> 1) & 0xf
        votes(j) += (if ((nib & 1) == 1) 1 else -1)
        j += 1
      }
      i += 1
    }
    var acc = 0L
    var j = 0
    while (j < 16) {
      if (votes(j) > 0) acc += (1L << j)
      j += 1
    }
    acc
  }
}

/** 60-bit SimHash over a token array — the wide-signature sibling of
  * [[SimHash16]] for HAMMING-JOIN blocking (q192): 60 bits split into
  * 4×15-bit pigeonhole blocks, so any pair within hamming distance 3
  * shares at least one exact block (4 blocks, ≤3 differing bits ⇒ one
  * block untouched). Bit k's vote is bit (k mod 4) of hex digit
  * (k div 4) of the token's md5 — the first 15 hex digits carry all 60
  * bits — majority-weighted by token frequency. 60 (not 64) keeps every
  * signature and every 2^k term inside a non-negative BIGINT on both
  * engines. One digest per token, one pass.
  */
case class SimHash60(child: Expression) extends UnaryExpression {
  override def dataType: DataType = org.apache.spark.sql.types.LongType
  override def prettyName: String = "graft_simhash60"

  override protected def nullSafeEval(input: Any): Any =
    SimHash60.compute(input.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c =>
      s"graft.functions.expressions.SimHash60.compute($c)")

  override protected def withNewChildInternal(newChild: Expression): SimHash60 =
    copy(child = newChild)
}

object SimHash60 {
  /** Static entry for generated code (one invoke per row). */
  def compute(toks: ArrayData): Long = {
    val votes = new Array[Int](60)
    val md = MessageDigest.getInstance("MD5")
    val n = toks.numElements()
    var i = 0
    while (i < n) {
      md.reset()
      md.update(toks.getUTF8String(i).getBytes)
      val d = md.digest()
      var k = 0
      while (k < 60) {
        val j = k >> 2 // hex digit index
        val nib = if ((j & 1) == 0) (d(j >> 1) >> 4) & 0xf else d(j >> 1) & 0xf
        votes(k) += (if (((nib >> (k & 3)) & 1) == 1) 1 else -1)
        k += 1
      }
      i += 1
    }
    var acc = 0L
    var k = 0
    while (k < 60) {
      if (votes(k) > 0) acc += (1L << k)
      k += 1
    }
    acc
  }
}

/** `levenshtein(a, b) == 1` as an O(L) two-pointer check with NO DP
  * matrix — the verify kernel of the fuzzy join (q80). Distance exactly
  * 1 means: strip the common prefix and suffix; what remains is either
  * a single inserted code point (lengths differ by 1, nothing left of
  * the shorter) or a single substituted one (equal lengths, exactly one
  * mismatched position). The banded thresholded DP this replaces still
  * ran a t-wide band over L columns with per-cell min3 bookkeeping;
  * this is two linear scans. Code-point semantics (surrogate pairs are
  * one unit), matching Spark's and DuckDB's levenshtein on every input.
  */
case class EditDistanceIs1(left: Expression, right: Expression)
    extends org.apache.spark.sql.catalyst.expressions.BinaryExpression {
  override def dataType: DataType = org.apache.spark.sql.types.BooleanType
  override def prettyName: String = "graft_edit1"

  override protected def nullSafeEval(a: Any, b: Any): Any =
    EditDistanceIs1.compute(a.asInstanceOf[UTF8String], b.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (a, b) =>
      s"graft.functions.expressions.EditDistanceIs1.compute($a, $b)")

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): EditDistanceIs1 =
    copy(left = newLeft, right = newRight)
}

object EditDistanceIs1 {
  /** Static entry for generated code (one invoke per row). */
  def compute(ua: UTF8String, ub: UTF8String): Boolean = {
    // code points, not UTF-16 units: a supplementary character is ONE
    // edit to levenshtein, so it must be one unit here too
    var x = ua.toString.codePoints().toArray
    var y = ub.toString.codePoints().toArray
    if (x.length > y.length) { val t = x; x = y; y = t }
    val la = x.length
    val lb = y.length
    if (lb - la > 1) return false
    var i = 0
    while (i < la && x(i) == y(i)) i += 1
    var j = 0
    while (j < la - i && x(la - 1 - j) == y(lb - 1 - j)) j += 1
    val ra = la - i - j
    val rb = lb - i - j
    // one inserted point (ra=0, rb=1) or one substituted point (1, 1);
    // ra == rb == 0 is equality (distance 0), anything longer is ≥ 2
    (ra == 0 && rb == 1) || (ra == 1 && rb == 1 && la == lb)
  }
}

/** A string's SymSpell deletion neighborhood — itself plus every
  * single-code-point deletion, first-occurrence-deduped — in ONE kernel
  * call. Fuses the q80 HOF stack `array_distinct(concat(array(t),
  * transform(sequence(1, length(t)), i => concat(substr(...), ...))))`,
  * which evaluated an interpreted lambda and two substring allocations
  * per position plus an O(L²) array_distinct of interpreted equality
  * checks. Code-point positions, matching `substr`'s SQL semantics.
  */
case class DeletionKeys(child: Expression) extends UnaryExpression {
  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def prettyName: String = "graft_delkeys"

  override protected def nullSafeEval(input: Any): Any =
    DeletionKeys.compute(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c =>
      s"graft.functions.expressions.DeletionKeys.compute($c)")

  override protected def withNewChildInternal(newChild: Expression): DeletionKeys =
    copy(child = newChild)
}

object DeletionKeys {
  /** Static entry for generated code (one invoke per row). */
  def compute(u: UTF8String): ArrayData = {
    val s = u.toString
    val cps = s.codePoints().toArray
    val seen = new java.util.LinkedHashSet[String]
    seen.add(s)
    var i = 0
    while (i < cps.length) {
      val sb = new java.lang.StringBuilder(s.length)
      var j = 0
      while (j < cps.length) {
        if (j != i) sb.appendCodePoint(cps(j))
        j += 1
      }
      seen.add(sb.toString)
      i += 1
    }
    val out = new Array[Any](seen.size)
    val it = seen.iterator()
    var x = 0
    while (it.hasNext) { out(x) = UTF8String.fromString(it.next()); x += 1 }
    new GenericArrayData(out)
  }
}

/** VERIFIED distance-1 pairs from a sorted bucket-member array in ONE
  * kernel call: every (i &lt; j) member pair run through the
  * [[EditDistanceIs1]] two-pointer check, only survivors materialized.
  * Fuses q80's pair-explode (two nested interpreted `transform` lambdas
  * allocating a struct per CANDIDATE) with the verify filter — distance-2
  * candidates die inside the loop without ever becoming rows. Bucket
  * membership is bounded by construction (≤ 1 + |Σ|·(L+1)), so the
  * nested loop is constant-bounded per bucket.
  */
case class Edit1Pairs(child: Expression) extends UnaryExpression {
  private val elem = org.apache.spark.sql.types.StructType(Seq(
    org.apache.spark.sql.types.StructField("a_val", StringType, nullable = false),
    org.apache.spark.sql.types.StructField("b_val", StringType, nullable = false)))
  override def dataType: DataType = ArrayType(elem, containsNull = false)
  override def prettyName: String = "graft_edit1pairs"

  override protected def nullSafeEval(input: Any): Any =
    Edit1Pairs.compute(input.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c =>
      s"graft.functions.expressions.Edit1Pairs.compute($c)")

  override protected def withNewChildInternal(newChild: Expression): Edit1Pairs =
    copy(child = newChild)
}

object Edit1Pairs {
  /** Static entry for generated code (one invoke per row). */
  def compute(m: ArrayData): ArrayData = {
    val n = m.numElements()
    val out = new java.util.ArrayList[Any]
    var i = 0
    while (i < n) {
      val a = m.getUTF8String(i)
      var j = i + 1
      while (j < n) {
        val b = m.getUTF8String(j)
        if (EditDistanceIs1.compute(a, b))
          out.add(new org.apache.spark.sql.catalyst.expressions.GenericInternalRow(
            Array[Any](a, b)))
        j += 1
      }
      i += 1
    }
    new GenericArrayData(out.toArray)
  }
}

/** VERIFIED distance-≤2 pairs from a sorted bucket-member array in one
  * kernel call — [[Edit1Pairs]]'s wider-ball sibling for the SymSpell
  * D≤2 neighborhood (q186): every (i &lt; j) pair runs the engine's own
  * banded threshold `UTF8String.levenshteinDistance(b, 2)` (O(L·3)
  * diagonal band, early exit; the identical primitive behind the SQL
  * `levenshtein(a, b, 2)`), with a free length-gap rejection first.
  * Candidates never materialize as rows: the measured replacement —
  * nested interpreted `transform` lambdas building a struct per
  * candidate then filtering — paid allocation for the ~90% of
  * candidates the verify rejects. The emitted distance rides along so
  * the consumer never re-computes it.
  */
case class Edit2Pairs(child: Expression) extends UnaryExpression {
  private val elem = org.apache.spark.sql.types.StructType(Seq(
    org.apache.spark.sql.types.StructField("a_val", StringType, nullable = false),
    org.apache.spark.sql.types.StructField("b_val", StringType, nullable = false),
    org.apache.spark.sql.types.StructField("dist",
      org.apache.spark.sql.types.IntegerType, nullable = false)))
  override def dataType: DataType = ArrayType(elem, containsNull = false)
  override def prettyName: String = "graft_edit2pairs"

  override protected def nullSafeEval(input: Any): Any =
    Edit2Pairs.compute(input.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c =>
      s"graft.functions.expressions.Edit2Pairs.compute($c)")

  override protected def withNewChildInternal(newChild: Expression): Edit2Pairs =
    copy(child = newChild)
}

object Edit2Pairs {
  /** Static entry for generated code (one invoke per row). */
  def compute(m: ArrayData): ArrayData = {
    val n = m.numElements()
    val out = new java.util.ArrayList[Any]
    var i = 0
    while (i < n) {
      val a = m.getUTF8String(i)
      val la = a.numChars()
      var j = i + 1
      while (j < n) {
        val b = m.getUTF8String(j)
        val lb = b.numChars()
        if (math.abs(la - lb) <= 2) {
          val d = a.levenshteinDistance(b, 2)
          if (d >= 1 && d <= 2)
            out.add(new org.apache.spark.sql.catalyst.expressions.GenericInternalRow(
              Array[Any](a, b, d)))
        }
        j += 1
      }
      i += 1
    }
    new GenericArrayData(out.toArray)
  }
}

object MinHashes {
  private val Hex = "0123456789abcdef".toCharArray

  // hoisted off the per-row hot path; grown on demand, tiny forever
  @volatile private var seedCache: Array[Array[Byte]] = Array.empty
  private def seedBytesFor(numHashes: Int): Array[Array[Byte]] = {
    val cached = seedCache
    if (cached.length >= numHashes) cached
    else synchronized {
      if (seedCache.length < numHashes)
        seedCache = Array.tabulate(numHashes)(s => String.valueOf(s).getBytes)
      seedCache
    }
  }

  /** Static entry for generated code (one invoke per row). */
  def compute(sh: ArrayData, numHashes: Int): ArrayData = {
    val n = sh.numElements()
    val mins = new Array[String](numHashes)
    val md = MessageDigest.getInstance("MD5")
    val seedBytes = seedBytesFor(numHashes)
    var i = 0
    while (i < n) {
      // null element: concat_ws SKIPS null args, so the HOF hashes just
      // "<seed>" (no pipe) — replicate exactly
      val u = sh.getUTF8String(i)
      val bytes = if (u == null) null else u.getBytes
      var seed = 0
      while (seed < numHashes) {
        md.reset()
        md.update(seedBytes(seed))
        if (bytes != null) {
          md.update('|'.toByte)
          md.update(bytes)
        }
        val d = md.digest()
        val hex = new Array[Char](32)
        var b = 0
        while (b < 16) {
          hex(2 * b) = Hex((d(b) >> 4) & 0xf)
          hex(2 * b + 1) = Hex(d(b) & 0xf)
          b += 1
        }
        val h = new String(hex)
        if (mins(seed) == null || h.compareTo(mins(seed)) < 0) mins(seed) = h
        seed += 1
      }
      i += 1
    }
    val out = new Array[Any](numHashes)
    var s = 0
    while (s < numHashes) {
      out(s) = if (mins(s) == null) null else UTF8String.fromString(mins(s))
      s += 1
    }
    new GenericArrayData(out)
  }
}

/** Content-defined chunk hashes of a text column in ONE pass — the
  * fused, codegen-callable form of q101's declarative chain
  * (boundary-filter over `sequence` + `zip_with` chunk md5s), which
  * evaluates interpreted lambdas and allocates a window substring,
  * Column-md5 input copy and hex string per CHARACTER POSITION. The
  * kernel reuses one MessageDigest, tests the boundary nibble straight
  * off the digest bytes (no hex string until a chunk is emitted), and
  * for pure-ASCII rows (the common corpus case) hashes windows as
  * zero-copy slices of one UTF-8 byte array.
  *
  * Semantics, bit-for-bit with the declarative form (property-tested):
  * candidate positions i = 2..L-w+1 (1-based, CHARACTER offsets); i is
  * a boundary iff md5(utf8(substring(text, i, w))) ends in hex '0'
  * (low nibble of digest byte 15 == 0); chunk starts = 1 :: boundaries,
  * each chunk ends at the next start (last at L+1); output = md5 hex
  * (lowercase) of each chunk's UTF-8 bytes, positional order. Empty
  * text → empty array.
  */
case class CdcChunkHashes(child: Expression, w: Int) extends UnaryExpression {
  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def prettyName: String = "graft_cdc_chunks"

  override protected def nullSafeEval(input: Any): Any =
    CdcChunkHashes.compute(input.asInstanceOf[UTF8String], w)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c =>
      s"graft.functions.expressions.CdcChunkHashes.compute($c, $w)")

  override protected def withNewChildInternal(newChild: Expression): CdcChunkHashes =
    copy(child = newChild)
}

object CdcChunkHashes {
  private val Hex = "0123456789abcdef".toCharArray

  private def hex32(d: Array[Byte]): UTF8String = {
    val hex = new Array[Char](32)
    var b = 0
    while (b < 16) {
      hex(2 * b) = Hex((d(b) >> 4) & 0xf)
      hex(2 * b + 1) = Hex(d(b) & 0xf)
      b += 1
    }
    UTF8String.fromString(new String(hex))
  }

  /** Static entry for generated code (one invoke per row). */
  def compute(text: UTF8String, w: Int): ArrayData = {
    val s = text.toString
    val len = s.length
    if (len == 0) return new GenericArrayData(Array.empty[Any])
    val md = MessageDigest.getInstance("MD5")
    // ASCII fast path: char offsets == byte offsets, so windows and
    // chunks digest as slices of one byte array (zero per-position
    // allocation). Multi-byte rows fall back to char-based substrings.
    val bytes = text.getBytes
    val ascii = bytes.length == len
    val starts = new java.util.ArrayList[Int]
    starts.add(1)
    var i = 2 // 1-based candidate boundary position
    val last = len - w + 1
    while (i <= last) {
      md.reset()
      if (ascii) md.update(bytes, i - 1, w)
      else md.update(s.substring(i - 1, i - 1 + w)
        .getBytes(java.nio.charset.StandardCharsets.UTF_8))
      if ((md.digest()(15) & 0x0f) == 0) starts.add(i)
      i += 1
    }
    val n = starts.size
    val out = new Array[Any](n)
    var k = 0
    while (k < n) {
      val a = starts.get(k)
      val b = if (k + 1 < n) starts.get(k + 1) else len + 1
      md.reset()
      if (ascii) md.update(bytes, a - 1, b - a)
      else md.update(s.substring(a - 1, b - 1)
        .getBytes(java.nio.charset.StandardCharsets.UTF_8))
      out(k) = hex32(md.digest())
      k += 1
    }
    new GenericArrayData(out)
  }
}

/** Positional winnowing fingerprints (q103) as one fused scan-local
  * kernel: char n-gram md5s, sliding w-window minimum, first-occurrence
  * distinct — the whole Schleimer et al. selection per document in a
  * single pass, replacing a per-CHARACTER posexplode + doc-partitioned
  * window sort + distinct exchange (the declarative draft shuffled one
  * row per character three times; winnowing is per-document, so none of
  * that needs to leave the scan). Property-tested equal to the
  * posexplode + window-min + distinct dataflow. Hashes compare as raw
  * 16-byte digests (unsigned lexicographic == hex-string order, hex
  * being order-preserving per byte); only SELECTED fingerprints pay the
  * hex conversion, and a window whose argmin is the previously selected
  * position is skipped before any allocation (the classic winnowing
  * robustness argument: adjacent windows usually share their min).
  */
case class WinnowFingerprints(child: Expression, n: Int, w: Int)
    extends UnaryExpression {
  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def prettyName: String = "graft_winnow"

  override protected def nullSafeEval(input: Any): Any =
    WinnowFingerprints.compute(input.asInstanceOf[UTF8String], n, w)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c =>
      s"graft.functions.expressions.WinnowFingerprints.compute($c, $n, $w)")

  override protected def withNewChildInternal(newChild: Expression): WinnowFingerprints =
    copy(child = newChild)
}

object WinnowFingerprints {
  private val Hex = "0123456789abcdef".toCharArray

  private def hex32(d: Array[Byte]): String = {
    val hex = new Array[Char](32)
    var b = 0
    while (b < 16) {
      hex(2 * b) = Hex((d(b) >> 4) & 0xf)
      hex(2 * b + 1) = Hex(d(b) & 0xf)
      b += 1
    }
    new String(hex)
  }

  /** Unsigned lexicographic digest compare (== md5 hex string order). */
  private def less(a: Array[Byte], b: Array[Byte]): Boolean = {
    var i = 0
    while (i < 16) {
      val x = a(i) & 0xff
      val y = b(i) & 0xff
      if (x != y) return x < y
      i += 1
    }
    false
  }

  /** Static entry for generated code (one invoke per row). */
  def compute(text: UTF8String, n: Int, w: Int): ArrayData = {
    val s = text.toString
    val len = s.length
    if (len < n) return new GenericArrayData(Array.empty[Any])
    val md = MessageDigest.getInstance("MD5")
    val bytes = text.getBytes
    val ascii = bytes.length == len
    val nGrams = len - n + 1
    val digests = new Array[Array[Byte]](nGrams)
    var i = 0
    while (i < nGrams) {
      md.reset()
      if (ascii) md.update(bytes, i, n)
      else md.update(s.substring(i, i + n)
        .getBytes(java.nio.charset.StandardCharsets.UTF_8))
      digests(i) = md.digest()
      i += 1
    }
    val lastStart = math.max(nGrams - w, 0)
    val seen = new java.util.LinkedHashSet[String]
    var lastArgmin = -1
    var p = 0
    while (p <= lastStart) {
      val end = math.min(p + w, nGrams)
      var best = p
      var q = p + 1
      while (q < end) {
        if (less(digests(q), digests(best))) best = q
        q += 1
      }
      if (best != lastArgmin) {
        seen.add(hex32(digests(best)))
        lastArgmin = best
      }
      p += 1
    }
    val out = new Array[Any](seen.size)
    val it = seen.iterator()
    var k = 0
    while (it.hasNext) { out(k) = UTF8String.fromString(it.next()); k += 1 }
    new GenericArrayData(out)
  }
}

/** (gram-hash, variant-hash) pairs for fuzzy n-gram decontamination
  * (q115) as ONE native expression: for every positional word n-gram of
  * `text`, emit n structs (g, v) — g a 64-bit hash identifying the gram
  * (for distinct-per-(doc, gram) hit counting), v the hash of (drop
  * position j, the n−1 kept tokens) — the SymSpell delete-variant key
  * with the position salt folded into the hash. Same kept tokens + same
  * drop position ⟺ same v, exactly the string-key equivalence, at none
  * of its cost: per-token hashes are computed ONCE per token, each
  * gram/variant key is an O(n) fold over them (no sliced arrays, no
  * concatenated strings, no per-variant allocation beyond the 16-byte
  * output struct), and the SQL layer explodes the result straight into
  * slim long-keyed rows. The composed-builtins form this replaces
  * (posexplode of 5 unrolled concat_ws variants) measured 1.24 s for
  * the 1.19M-variant relation at sf0.1; this kernel ~0.3 s.
  *
  * Hash: FNV-1a 64 over UTF-8 token bytes, combined across tokens with
  * a xorshift-multiply mix per element (order-sensitive, separator-free
  * — token boundaries are preserved by construction, not by a sentinel
  * byte, so tokens containing any byte sequence are safe). 64-bit
  * collisions can only ADD a spurious hit (P ≈ 4·10⁻⁸ at 10⁶ keys);
  * the DuckDB oracle replays the STRING semantics and would surface
  * one as a count mismatch.
  */
case class FuzzyVariantPairs(child: Expression, n: Int) extends UnaryExpression {
  private val elem = org.apache.spark.sql.types.StructType(Seq(
    org.apache.spark.sql.types.StructField("g", org.apache.spark.sql.types.LongType, nullable = false),
    org.apache.spark.sql.types.StructField("v", org.apache.spark.sql.types.LongType, nullable = false)))
  override def dataType: DataType = ArrayType(elem, containsNull = false)
  override def prettyName: String = "graft_fuzzy_variants"

  override protected def nullSafeEval(input: Any): Any =
    FuzzyVariantPairs.compute(input.asInstanceOf[UTF8String], n)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c =>
      s"graft.functions.expressions.FuzzyVariantPairs.compute($c, $n)")

  override protected def withNewChildInternal(newChild: Expression): FuzzyVariantPairs =
    copy(child = newChild)
}

object FuzzyVariantPairs {
  private final val FnvOffset = 0xcbf29ce484222325L
  private final val FnvPrime = 0x100000001b3L

  private def fnv64(s: String): Long = {
    val b = s.getBytes(java.nio.charset.StandardCharsets.UTF_8)
    var h = FnvOffset
    var i = 0
    while (i < b.length) { h = (h ^ (b(i) & 0xffL)) * FnvPrime; i += 1 }
    h
  }

  /** Order-sensitive 64-bit combine (xorshift-multiply mix per element). */
  private def mix(acc: Long, h: Long): Long = {
    var x = acc ^ h
    x ^= x >>> 33
    x *= 0xff51afd7ed558ccdL
    x ^= x >>> 29
    acc * FnvPrime + x
  }

  def compute(text: UTF8String, n: Int): ArrayData = {
    val s = text.toString
    // split(" ", -1) semantics: single-space delimiter, empties kept
    val toks = new java.util.ArrayList[String]
    var start = 0
    var i = 0
    while (i <= s.length) {
      if (i == s.length || s.charAt(i) == ' ') {
        toks.add(s.substring(start, i))
        start = i + 1
      }
      i += 1
    }
    val m = toks.size - (n - 1)
    if (m <= 0) return new GenericArrayData(Array.empty[Any])
    val th = new Array[Long](toks.size)
    i = 0
    while (i < toks.size) { th(i) = fnv64(toks.get(i)); i += 1 }
    val out = new Array[Any](m * n)
    var g = 0
    var idx = 0
    while (g < m) {
      var gh = FnvOffset
      var k = 0
      while (k < n) { gh = mix(gh, th(g + k)); k += 1 }
      var j = 0
      while (j < n) {
        var v = mix(FnvOffset, j.toLong)
        k = 0
        while (k < n) {
          if (k != j) v = mix(v, th(g + k))
          k += 1
        }
        out(idx) = new org.apache.spark.sql.catalyst.expressions.GenericInternalRow(
          Array[Any](gh, v))
        idx += 1
        j += 1
      }
      g += 1
    }
    new GenericArrayData(out)
  }
}

/** Lexicographically smallest md5 over the text's character n-gram
  * windows as ONE native kernel — the fused form of q27's
  * `array_min(transform(sequence(1, greatest(len−(g−1), 1)),
  * i -> md5(substr(text, i, g))))` fingerprint. The HOF stack
  * materializes the full position array and, per window, a substring
  * copy, a fresh MessageDigest (commons-codec allocates one per md5()
  * call) and a 32-char hex string, only to throw all but one away;
  * this kernel reuses ONE digest instance and two 16-byte buffers,
  * compares raw digests (hex encoding is order-preserving per nibble,
  * so min-of-hex ≡ hex-of-min), and hex-encodes exactly once. ASCII
  * texts stream directly over the UTF8String's bytes; texts with
  * multi-byte characters fall back to a code-point walk so the window
  * semantics stay those of SQL `substr` (code points, not UTF-16
  * units). Property-tested bit-equal to the HOF composition.
  */
case class MinGramMd5(child: Expression, gram: Int) extends UnaryExpression {
  override def dataType: DataType = StringType
  override def prettyName: String = "graft_min_gram_md5"

  override protected def nullSafeEval(input: Any): Any =
    MinGramMd5.compute(input.asInstanceOf[UTF8String], gram)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c =>
      s"graft.functions.expressions.MinGramMd5.compute($c, $gram)")

  override protected def withNewChildInternal(newChild: Expression): MinGramMd5 =
    copy(child = newChild)
}

object MinGramMd5 {
  private val HexDigits = "0123456789abcdef".toCharArray

  private def unsignedLess(a: Array[Byte], b: Array[Byte]): Boolean = {
    var i = 0
    while (i < a.length) {
      val ai = a(i) & 0xff; val bi = b(i) & 0xff
      if (ai != bi) return ai < bi
      i += 1
    }
    false
  }

  /** Static entry for generated code (one invoke per row). */
  def compute(text: UTF8String, gram: Int): UTF8String = {
    val md = MessageDigest.getInstance("MD5")
    var best: Array[Byte] = null
    var cur = new Array[Byte](16)
    val bytes = text.getBytes
    if (bytes.length == text.numChars) {
      // ASCII fast path: windows are byte slices of the UTF-8 buffer
      val m = math.max(bytes.length - (gram - 1), 1)
      var i = 0
      while (i < m) {
        md.reset()
        md.update(bytes, i, math.min(gram, bytes.length - i))
        md.digest(cur, 0, 16)
        if (best == null || unsignedLess(cur, best)) {
          val t = best; best = cur
          cur = if (t == null) new Array[Byte](16) else t
        }
        i += 1
      }
    } else {
      // code-point walk: SQL substr windows count code points
      val cps = text.toString.codePoints().toArray()
      val n = cps.length
      val m = math.max(n - (gram - 1), 1)
      var i = 0
      while (i < m) {
        val sub = new String(cps, i, math.min(gram, n - i))
        md.reset()
        md.update(sub.getBytes(java.nio.charset.StandardCharsets.UTF_8))
        md.digest(cur, 0, 16)
        if (best == null || unsignedLess(cur, best)) {
          val t = best; best = cur
          cur = if (t == null) new Array[Byte](16) else t
        }
        i += 1
      }
    }
    val hex = new Array[Char](32)
    var j = 0
    while (j < 16) {
      hex(2 * j) = HexDigits((best(j) >> 4) & 0xf)
      hex(2 * j + 1) = HexDigits(best(j) & 0xf)
      j += 1
    }
    UTF8String.fromString(new String(hex))
  }
}

/** md5 truncated to its first 52 bits as a LONG — the engine-native
  * fused form of `conv(substring(md5(s), 1, 13), 16, 10).cast("long")`,
  * the repo-wide deterministic-uniform seam (sampling thresholds,
  * additive pairwise hashes, argmin walk choices). The declarative
  * stack computes the full 32-char hex string, substrings it, and
  * radix-parses it per row; this kernel reads the 13 leading nibbles
  * straight off the raw digest bytes with a reused thread-local
  * MessageDigest — no hex round-trip, no allocation beyond the UTF-8
  * bytes. Property-tested bit-equal to the declarative formulation
  * (and therefore to the DuckDB sqlHex52 digit fold). */
case class Md5Long52(child: Expression) extends UnaryExpression {
  override def dataType: DataType = org.apache.spark.sql.types.LongType
  override def prettyName: String = "graft_md5long52"

  override protected def nullSafeEval(input: Any): Any =
    Md5Long52.compute(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c =>
      s"graft.functions.expressions.Md5Long52.compute($c)")

  override protected def withNewChildInternal(newChild: Expression): Md5Long52 =
    copy(child = newChild)
}

object Md5Long52 {
  private val digests = new ThreadLocal[MessageDigest] {
    override def initialValue(): MessageDigest =
      MessageDigest.getInstance("MD5")
  }

  /** Static entry for generated code (one invoke per row). */
  def compute(s: UTF8String): Long = {
    val md = digests.get()
    md.reset()
    val d = md.digest(s.getBytes)
    // 13 hex digits = bytes 0..5 (12 nibbles) + the high nibble of byte 6
    var v = 0L
    var i = 0
    while (i < 6) { v = (v << 8) | (d(i) & 0xffL); i += 1 }
    (v << 4) | ((d(6) & 0xf0L) >>> 4)
  }
}
