package graft.operators

import graft.SparkSpec

class FuzzyJoinSpec extends SparkSpec {
  import spark.implicits._

  private def pairsOf(vals: Seq[String]): Set[(String, String)] =
    FuzzyJoin.editDistance1Pairs(vals.toDF("s"), "s")
      .as[(String, String)].collect().toSet

  private def pairs2Of(vals: Seq[String]): Set[(String, String, Long)] =
    FuzzyJoin.editDistance2Pairs(vals.toDF("s"), "s")
      .as[(String, String, Long)].collect().toSet

  test("d2: brute-force equality on randomized corpora (composed-neighborhood completeness)") {
    val rnd = new scala.util.Random(7)
    val alpha = "abcd"
    def randStr() = Seq.fill(3 + rnd.nextInt(7))(alpha(rnd.nextInt(alpha.length))).mkString
    val vals = (0 until 120).map(_ => randStr()).distinct
    def lev(a: String, b: String): Int = {
      val d = Array.tabulate(a.length + 1, b.length + 1) { (i, j) =>
        if (i == 0) j else if (j == 0) i else 0
      }
      for (i <- 1 to a.length; j <- 1 to b.length)
        d(i)(j) = math.min(math.min(d(i - 1)(j) + 1, d(i)(j - 1) + 1),
          d(i - 1)(j - 1) + (if (a(i - 1) == b(j - 1)) 0 else 1))
      d(a.length)(b.length)
    }
    val expected = (for {
      i <- vals.indices; j <- vals.indices
      a = vals(i); b = vals(j)
      if a < b
      d = lev(a, b)
      if d >= 1 && d <= 2
    } yield (a, b, d.toLong)).toSet
    val got = pairs2Of(vals)
    assert(got == expected,
      s"d2 mismatch: missing ${expected diff got}, extra ${got diff expected}")
  }

  test("d2: no duplicate pairs despite many shared keys; distances are exact") {
    // a substitution-1 pair shares ~L distance-2 deletion keys — the
    // pair-distinct must collapse them to ONE row with the right dist
    val got = FuzzyJoin.editDistance2Pairs(
      Seq("kitten", "mitten", "sitten", "kitty").toDF("s"), "s")
      .as[(String, String, Long)].collect()
    assert(got.length == got.toSet.size, "duplicate rows escaped the distinct")
    val m = got.map(r => (r._1, r._2) -> r._3).toMap
    assert(m(("kitten", "mitten")) == 1L && m(("kitten", "sitten")) == 1L &&
      m(("mitten", "sitten")) == 1L && m(("kitten", "kitty")) == 2L, s"wrong distances: $m")
  }

  test("finds substitution, insertion, and deletion pairs; rejects distance 2") {
    val got = pairsOf(Seq(
      "kitten", "mitten",   // substitution at position 1
      "cart", "chart",      // insertion
      "note", "not",        // deletion
      "abcd", "cdab",       // distance 4 — shares no deletion key
      "flip", "flop"))      // substitution mid-word
    assert(got == Set(
      ("cart", "chart"),
      ("kitten", "mitten"),
      ("flip", "flop"),
      ("not", "note")))
  }

  test("distance-2 pairs sharing a deletion key are verified away") {
    // "ab" and "ba": delete position 1 of one and position 2 of the other
    // both give "a"/"b" keys — candidate generated, levenshtein(ab, ba)=2
    val got = pairsOf(Seq("ab", "ba"))
    assert(got.isEmpty)
  }

  test("duplicates and nulls in the input are tolerated") {
    val df = Seq(Some("hat"), Some("hat"), Some("cat"), None).toDF("s")
    val got = FuzzyJoin.editDistance1Pairs(df, "s")
      .as[(String, String)].collect().toSet
    assert(got == Set(("cat", "hat")))
  }

  test("completeness: every random single-edit pair is found (100 seeded cases)") {
    val rnd = new scala.util.Random(42)
    val alpha = "abcdefg"
    def randStr(n: Int) = Seq.fill(n)(alpha(rnd.nextInt(alpha.length))).mkString
    val cases = (0 until 100).flatMap { i =>
      val base = randStr(4 + rnd.nextInt(6)) + s"x$i" // distinct bases
      val pos = rnd.nextInt(base.length)
      val edited = rnd.nextInt(3) match {
        case 0 => base.substring(0, pos) + base.substring(pos + 1) // deletion
        case 1 => base.substring(0, pos) + alpha(rnd.nextInt(7)) +
          base.substring(pos) // insertion
        case 2 => // substitution with a guaranteed-different character
          val cur = alpha.indexOf(base(pos))
          val c = alpha((cur + 1 + rnd.nextInt(6)) % 7)
          base.substring(0, pos) + c + base.substring(pos + 1)
      }
      if (edited != base) Some((base, edited)) else None
    }
    val expected = cases.map { case (a, b) =>
      if (a < b) (a, b) else (b, a)
    }.toSet
    val got = pairsOf(cases.flatMap(c => Seq(c._1, c._2)))
    val missing = expected -- got
    assert(missing.isEmpty, s"pairs not found: ${missing.take(5)}")
  }

  test("EditDistanceIs1 kernel matches levenshtein==1 on randomized + edge inputs") {
    import graft.functions.expressions.EditDistanceIs1
    import org.apache.spark.unsafe.types.UTF8String
    def k(a: String, b: String): Boolean =
      EditDistanceIs1.compute(UTF8String.fromString(a), UTF8String.fromString(b))
    // prefix/suffix-stripping edge cases
    assert(!k("", ""))                 // equal (distance 0)
    assert(k("", "a") && k("a", ""))   // insertion at either end, empty side
    assert(!k("", "ab"))               // length gap 2
    assert(k("aa", "aaa"))             // insertion inside a run
    assert(!k("aaa", "aaa"))           // equality after full prefix strip
    assert(k("abc", "abd") && k("abc", "xbc") && k("abc", "axc")) // subst at ends/middle
    assert(!k("ab", "ba"))             // transposition is distance 2
    assert(!k("abcd", "abdc"))
    assert(k("abc", "abcd") && k("abc", "xabc") && k("abc", "abxc"))
    assert(!k("abc", "abcde"))
    // supplementary-plane characters are ONE code point, like levenshtein
    assert(k("a😀b", "ab")) // one emoji deleted = distance 1
    assert(!k("😀😁", "😁😀"))
    // randomized agreement with the reference DP on short strings, where
    // all distances 0/1/2+ occur densely
    val rnd = new scala.util.Random(7)
    val alpha = "abc"
    def rs() = Seq.fill(rnd.nextInt(5))(alpha(rnd.nextInt(3))).mkString
    for (_ <- 0 until 2000) {
      val (a, b) = (rs(), rs())
      val expected = UTF8String.fromString(a)
        .levenshteinDistance(UTF8String.fromString(b)) == 1
      assert(k(a, b) == expected, s"kernel disagrees with levenshtein on ('$a','$b')")
    }
  }

  test("EditDistanceIs1 works as a Catalyst expression in a DataFrame filter (codegen path)") {
    import org.apache.spark.sql.functions.col
    import org.apache.spark.sql.GraftShim
    val df = Seq(("kitten", "mitten"), ("ab", "ba"), ("cart", "chart"),
        ("same", "same"), (null, "x"))
      .toDF("a", "b")
    val got = df.filter(GraftShim.column(graft.functions.expressions.EditDistanceIs1(
        GraftShim.expression(col("a")), GraftShim.expression(col("b")))))
      .as[(String, String)].collect().toSet
    assert(got == Set(("kitten", "mitten"), ("cart", "chart")))
  }

  test("DeletionKeys kernel matches the HOF formulation as a set, on random strings") {
    import org.apache.spark.sql.functions._
    val rnd = new scala.util.Random(13)
    val alpha = "aab"  // repeated chars on purpose: exercises the dedup
    val vals = (0 until 200).map(_ =>
      Seq.fill(rnd.nextInt(8))(alpha(rnd.nextInt(3))).mkString) :+ "" :+ "😀a😀"
    val df = vals.distinct.toDF("t")
    val hof = df.select(col("t"), array_sort(array_distinct(
      concat(array(col("t")),
        transform(sequence(lit(1), length(col("t"))),
          i => concat(col("t").substr(lit(1), i - lit(1)),
            col("t").substr(i + lit(1), length(col("t")))))))).as("k"))
      .as[(String, Seq[String])].collect().toMap
    import org.apache.spark.sql.GraftShim
    val kernel = df.select(col("t"), array_sort(GraftShim.column(
        graft.functions.expressions.DeletionKeys(GraftShim.expression(col("t"))))).as("k"))
      .as[(String, Seq[String])].collect().toMap
    assert(kernel == hof)
  }

  test("no cartesian product in the plan") {
    val plan = FuzzyJoin.editDistance1Pairs(
      Seq("aaa", "aab").toDF("s"), "s").queryExecution.executedPlan.toString
    assert(!plan.contains("CartesianProduct") && !plan.contains("NestedLoop"), plan)
  }

  test("output pairs are unique without a distinct (one bucket per true pair)") {
    // substitution, insertion, and repeated-char cases together; every
    // true pair must surface exactly once even though dist-2 candidates
    // (which CAN share two buckets) flow through the same explode
    val vals = Seq("kitten", "mitten", "cart", "chart", "aab", "ab", "ba", "aa")
    val rows = FuzzyJoin.editDistance1Pairs(vals.toDF("s"), "s")
      .as[(String, String)].collect().toSeq
    assert(rows.size == rows.toSet.size, s"duplicate pairs in $rows")
    assert(rows.toSet.contains(("aa", "aab")) && rows.toSet.contains(("aab", "ab")))
  }
}
