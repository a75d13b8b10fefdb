package graft

import org.scalacheck.{Gen, Prop, Properties}
import org.scalacheck.Prop.propBoolean

import scala.concurrent.duration._

import graft.operators.SimilarityJoin
import graft.plans.Scheduler
import graft.sources.{Naming, PermanentError, Retry}

/** ScalaCheck properties for the driver-side pure kernels (no Spark
  * session — these run in milliseconds and cover the edges the
  * example-based specs don't enumerate).
  */
object PureProps extends Properties("graft.pure") {

  property("round4 matches BigDecimal HALF_UP semantics") =
    Prop.forAll(Gen.chooseNum(-1e6, 1e6)) { x: Double =>
      val r = SimilarityJoin.round4(x)
      r == new java.math.BigDecimal(java.lang.Double.toString(x))
        .setScale(4, java.math.RoundingMode.HALF_UP).doubleValue()
    }

  property("round4 is idempotent") =
    Prop.forAll(Gen.chooseNum(-1e6, 1e6)) { x: Double =>
      SimilarityJoin.round4(SimilarityJoin.round4(x)) == SimilarityJoin.round4(x)
    }

  property("uniformJitter stays within [i-d/2, i+d/2]") =
    Prop.forAll(Gen.choose(1L, 100000L), Gen.choose(0L, 50000L), Gen.long) {
      (i, d, seed) =>
        val j = Scheduler.uniformJitter(i.millis, d.millis, new scala.util.Random(seed))
        j >= (i - d / 2 - 1).millis && j <= (i + d / 2 + 1).millis
    }

  property("retry: permanent error always aborts after exactly one call") =
    Prop.forAll(Gen.choose(1L, 1000L)) { w =>
      var calls = 0
      val r = Retry.withRetry(w.millis, (w * 8).millis, _ => ()) {
        calls += 1; throw PermanentError("nope")
      }
      r.isLeft && calls == 1
    }

  property("retry: attempt count is log2-bounded by the wait window") =
    Prop.forAll(Gen.choose(1L, 64L)) { factor =>
      var calls = 0
      Retry.withRetry(1.millis, factor.millis, _ => ()) {
        calls += 1; throw new RuntimeException("always")
      }
      // waits double from 1ms: aborts when next wait exceeds the cap
      val expected = (math.floor(math.log(factor.toDouble) / math.log(2.0)).toInt + 2)
      calls == expected
    }

  property("regexName composes prefix + groups") =
    Prop.forAll(Gen.alphaNumStr.suchThat(_.nonEmpty)) { f =>
      Naming.regexName("P/", "T-", """.*(\d{4}/\d{2}/)(.*)""".r,
        s"http://h/x/2020/07/$f") == Some(s"P/2020/07/T-$f")
    }

  property("LSH S-curve: collision probability is monotone in similarity") =
    Prop.forAll(Gen.choose(0.0, 1.0), Gen.choose(0.0, 1.0),
      Gen.choose(1, 32), Gen.choose(1, 8)) { (s1, s2, b, r) =>
      val (lo, hi) = if (s1 <= s2) (s1, s2) else (s2, s1)
      graft.operators.MinHashLsh.collisionProbability(lo, b, r) <=
        graft.operators.MinHashLsh.collisionProbability(hi, b, r) + 1e-12
    }

  property("LSH S-curve: more bands never lower collision probability") =
    Prop.forAll(Gen.choose(0.0, 1.0), Gen.choose(1, 16), Gen.choose(1, 8)) {
      (s, b, r) =>
        graft.operators.MinHashLsh.collisionProbability(s, b, r) <=
          graft.operators.MinHashLsh.collisionProbability(s, b + 1, r) + 1e-12
    }

  property("LSH S-curve threshold sits at ~1/2 collision probability") =
    Prop.forAll(Gen.choose(2, 16), Gen.choose(1, 8)) { (b, r) =>
      // guard: ScalaCheck shrinking can step outside the generator range
      (b >= 2 && r >= 1) ==> {
        val t = graft.operators.MinHashLsh.sCurveThreshold(b, r)
        val p = graft.operators.MinHashLsh.collisionProbability(t, b, r)
        // at s = (1/b)^(1/r): p = 1 − (1 − 1/b)^b, which descends from
        // 0.75 (b=2) toward 1 − 1/e ≈ 0.632 — the steep mid-range
        p > 0.63 && p <= 0.75 + 1e-9
      }
    }

  property("datePrefix/timestampPrefix are UTC-stable") =
    Prop.forAll(Gen.choose(0L, 4102444800L)) { epoch =>
      val i = java.time.Instant.ofEpochSecond(epoch)
      val d = Naming.datePrefix(i)
      val t = Naming.timestampPrefix(i)
      d.matches("""\d{4}/\d{2}/\d{2}/""") &&
        t.matches("""\d{8}T\d{6}Z-""") &&
        t.startsWith(d.replace("/", "").take(8))
    }

  // PII regexes run inside the ingest scan over arbitrary corpus bytes:
  // they must be TOTAL (no exception, no catastrophic backtracking on
  // long digit runs) and a second pass must be the identity (the
  // replacement tokens never re-match any pattern). JVM-local regex
  // application — the Spark column form compiles the same patterns.
  private def redactLocal(s: String): String =
    graft.functions.TextOps.PiiPatterns.foldLeft(s) { case (acc, (tag, re)) =>
      acc.replaceAll(re, s"[${tag.toUpperCase}]")
    }

  private val piiGen: Gen[String] = {
    val atoms = Gen.oneOf(
      Gen.alphaNumStr.map(_.take(12)),
      Gen.numStr.map(_.take(40)), // long digit runs: backtracking bait
      Gen.oneOf(" ", "-", ".", "(", ")", "@", "+", "|"),
      Gen.const("a@b.io"), Gen.const("555-123-4567"),
      Gen.const("4111 1111 1111 1111"), Gen.const("10.0.0.1"))
    Gen.listOf(atoms).map(_.mkString(""))
  }

  property("PII scrub is total and idempotent on arbitrary text") =
    Prop.forAll(piiGen) { s =>
      val once = redactLocal(s)
      redactLocal(once) == once
    }

  property("PII scrub never leaves a seeded email or SSN intact") =
    Prop.forAll(Gen.alphaStr.map(_.take(10)), Gen.alphaStr.map(_.take(10))) {
      (pre, post) =>
        val r1 = redactLocal(s"$pre x@y.org $post")
        val r2 = redactLocal(s"$pre 123-45-6789 $post")
        !r1.contains("x@y.org") && !r2.contains("123-45-6789")
    }

  // ----------------------------------------------------------------
  // Winnowing kernel vs an independent straight-line reference: the
  // kernel optimizes (raw-digest compares, argmin skip, ASCII byte
  // slices); the reference below is the naive textbook definition.
  private def winnowRef(text: String, n: Int, w: Int): Seq[String] = {
    if (text.length < n) return Seq.empty
    val md = java.security.MessageDigest.getInstance("MD5")
    val grams = (0 to text.length - n).map { i =>
      md.reset()
      md.update(text.substring(i, i + n).getBytes("UTF-8"))
      md.digest().map("%02x".format(_)).mkString
    }
    val last = math.max(grams.length - w, 0)
    (0 to last).map(p => grams.slice(p, p + w).min).distinct
  }

  private val textGen: Gen[String] = for {
    len <- Gen.choose(0, 200)
    cs <- Gen.listOfN(len, Gen.frequency(
      8 -> Gen.alphaLowerChar, 2 -> Gen.const(' '),
      1 -> Gen.oneOf('\u00e9', '\u4e2d', '\u03a9')))
  } yield cs.mkString

  property("WinnowFingerprints equals the textbook winnowing definition") =
    Prop.forAll(textGen) { s =>
      val got = graft.functions.expressions.WinnowFingerprints
        .compute(org.apache.spark.unsafe.types.UTF8String.fromString(s), 5, 4)
      val seq = (0 until got.numElements())
        .map(i => got.getUTF8String(i).toString)
      seq == winnowRef(s, 5, 4)
    }

  property("winnowing guarantee: a shared >= w+n-1 substring shares a fingerprint") =
    Prop.forAll(textGen, textGen, textGen) { (a, b, core0) =>
      val core = (core0 + "abcdefgh").takeRight(8) // >= 8 chars
      val d1 = a + core + b
      val d2 = b + core + a
      val f1 = winnowRef(d1, 5, 4).toSet
      val f2 = winnowRef(d2, 5, 4).toSet
      f1.intersect(f2).nonEmpty
    }
}
