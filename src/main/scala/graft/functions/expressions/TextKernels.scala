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
case class WordShingles(child: Expression, n: Int) extends UnaryExpression {
  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def prettyName: String = "graft_shingles"

  override protected def nullSafeEval(input: Any): Any =
    WordShingles.compute(input.asInstanceOf[UTF8String], n)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c =>
      s"graft.functions.expressions.WordShingles.compute($c, $n)")

  override protected def withNewChildInternal(newChild: Expression): WordShingles =
    copy(child = newChild)
}

object WordShingles {
  /** Static entry for generated code (one invoke per row). */
  def compute(text: UTF8String, n: Int): ArrayData = {
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
    val seen = new java.util.LinkedHashSet[String]
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
