package graft.operators

import org.apache.spark.sql.functions._

import graft.SparkSpec

class TextStatsSpec extends SparkSpec {
  import spark.implicits._

  test("token/char counts and ratios on handmade text") {
    val df = Seq(
      (1L, "the cat sat of the mat"),
      (2L, ""),
      (3L, "  spaced   out  "),
      (4L, "no!! punct?? here,,")
    ).toDF("doc_id", "text")
    val p = TextStats.profile(df).collect().map(r => r.getAs[Long]("doc_id") -> r).toMap

    assert(p(1L).getAs[Int]("token_count") == 6)
    assert(p(1L).getAs[Double]("stopword_ratio") == 0.5) // the, of, the / 6
    assert(p(2L).getAs[Int]("token_count") == 0)
    assert(p(3L).getAs[Int]("token_count") == 2)
    assert(p(4L).getAs[Double]("punct_ratio") == math.BigDecimal(6.0 / 19).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble)
  }

  test("language id picks the profile with most stopword hits; und when none") {
    val df = Seq(
      (1L, "the cat and the dog of it"),
      (2L, "der hund und die katze ist nicht da"),
      (3L, "le chat et la souris des les"),
      (4L, "xyzzy qwerty")
    ).toDF("doc_id", "text")
    val out = TextStats.profile(df).collect().map(r => r.getAs[Long]("doc_id") -> r.getAs[String]("predicted_lang")).toMap
    assert(out == Map(1L -> "en", 2L -> "de", 3L -> "fr", 4L -> "und"))
  }

  test("fingerprint is invariant to word order and repetition") {
    val df = Seq(
      (1L, "alpha beta gamma"),
      (2L, "gamma alpha beta beta"),
      (3L, "alpha beta delta")
    ).toDF("doc_id", "text")
    val fp = TextStats.profile(df).collect().map(r => r.getAs[Long]("doc_id") -> r.getAs[String]("fingerprint")).toMap
    assert(fp(1L) == fp(2L))
    assert(fp(1L) != fp(3L))
  }

  test("BPE-ish token count segments contractions, digits, punct runs") {
    val df = Seq((1L, "it's 42 cats!"), (2L, ""), (3L, "hello")).toDF("doc_id", "text")
    val out = df.select($"doc_id", TextStats.bpeTokenCount($"text").as("n"))
      .collect().map(r => r.getLong(0) -> r.getAs[Int]("n")).toMap
    // "it" | "'s" | " 42" | " cats" | "!"
    assert(out(1L) == 5)
    assert(out(2L) == 0)
    assert(out(3L) == 1)
  }

  test("native rolling fingerprint: codegen==interpreted, duplicate-invariant, window-monotone") {
    val base = "the quick brown fox jumps over the lazy dog, again and again"
    val df = Seq((1L, base), (2L, base), (3L, "a completely different document body"),
      (4L, ""), (5L, "tiny"), (6L, base + " with an appended tail"))
      .toDF("doc_id", "text")
    val fp = df.select($"doc_id", TextStats.rollingFingerprint($"text").as("fp"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(fp(1L) == fp(2L) && fp(1L) != fp(3L))
    // codegen output equals direct interpreted evaluation
    assert(fp(1L) == graft.functions.RollingMinHash.compute(
      org.apache.spark.unsafe.types.UTF8String.fromString(base), 16))
    // appending text only ADDS windows, so the unsigned min cannot rise
    assert(java.lang.Long.compareUnsigned(fp(6L), fp(1L)) <= 0)
    // short + empty texts hash whole (and differently)
    assert(fp(4L) != fp(5L))
  }

  test("rolling fingerprint md5 twin is the min md5 over char 16-grams; short text hashes whole") {
    val text = "the quick brown fox jumps over the lazy dog"
    val expected = (0 to text.length - 16).map { i =>
      java.security.MessageDigest.getInstance("MD5")
        .digest(text.substring(i, i + 16).getBytes("UTF-8"))
        .map("%02x".format(_)).mkString
    }.min
    val df = Seq((1L, text), (2L, "short")).toDF("doc_id", "text")
    val out = df.select($"doc_id", TextStats.rollingFingerprintMd5($"text").as("f"))
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(out(1L) == expected)
    assert(out(2L) == java.security.MessageDigest.getInstance("MD5")
      .digest("short".getBytes("UTF-8")).map("%02x".format(_)).mkString)
  }

  test("profile is a shuffle-free single projection") {
    val docs = graft.Tables.load(spark, "/root/testdata/sf0.001", "documents")
    val plan = TextStats.profile(docs).queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange"), s"unexpected shuffle:\n$plan")
  }

  test("gopher rules: each rule fires on its designed violation") {
    val good = (("the data be full of words that have merit with style " * 10).trim)
    val df = Seq(
      (1L, good),                                    // passes everything
      (2L, "too short"),                             // word count < 50
      (3L, ("ab " * 60).trim),                       // mean word length 2 < 3
      (4L, (("# " + good).replace("of", "#").replace("be", "#"))), // symbol ratio >= 0.1
      (5L, good + " " + ("1234 " * 200).trim),       // alpha fraction <= 0.8
      (6L, ("zebra quantum flux " * 20).trim),       // no required stopwords
      (7L, (1 to 60).map(i => s"- item$i the of and that be have with to").mkString("\n")),
      (8L, (1 to 60).map(i => s"line$i the of and that be have with to ...").mkString("\n")),
      (9L, null.asInstanceOf[String])                // empty: fails wc rule
    ).toDF("doc_id", "text")
    val r = TextStats.gopherRules(df).collect()
      .map(row => row.getAs[Long]("doc_id") -> row).toMap

    assert(r(1L).getAs[Boolean]("pass"))
    assert(!r(2L).getAs[Boolean]("r_word_count"))
    assert(!r(3L).getAs[Boolean]("r_mean_word_len"))
    assert(!r(4L).getAs[Boolean]("r_symbol_ratio"))
    assert(!r(5L).getAs[Boolean]("r_alpha_words"))
    assert(!r(6L).getAs[Boolean]("r_stopwords"))
    assert(!r(7L).getAs[Boolean]("r_bullet_lines"))
    assert(r(7L).getAs[Double]("bullet_line_frac") == 1.0)
    assert(!r(8L).getAs[Boolean]("r_ellipsis_lines"))
    assert(!r(9L).getAs[Boolean]("pass"))
    assert(r(9L).getAs[Long]("word_count") == 0L)
    // every non-passing doc fails at least one named rule
    r.values.filterNot(_.getAs[Boolean]("pass")).foreach { row =>
      val flags = Seq("r_word_count", "r_mean_word_len", "r_symbol_ratio",
        "r_alpha_words", "r_stopwords", "r_bullet_lines", "r_ellipsis_lines")
      assert(flags.exists(f => !row.getAs[Boolean](f)))
    }
  }

  test("gopher repetition battery: hand-computed metrics per family") {
    val clean = (1 to 50).map(i => f"w$i%02d").mkString(" ") // 50 distinct 3-char tokens
    val df = Seq(
      // repeated lines + repeated paragraph
      (1L, "alpha beta\nalpha beta\ngamma delta\n\npara one\n\npara one"),
      // dominant 2-gram
      (2L, "spam ham spam ham spam ham eggs"),
      // one duplicated 5-gram, nothing at 6
      (3L, "a b c d e a b c d e x y z w v"),
      (4L, clean),
      (5L, null.asInstanceOf[String])
    ).toDF("doc_id", "text")
    val r = TextStats.gopherRepetition(df).collect()
      .map(row => row.getAs[Long]("doc_id") -> row).toMap

    def d(id: Long, c: String): Double = r(id).getAs[Double](c)
    // doc 1: 5 nonempty lines (2 dups), line chars 47 vs 29 distinct;
    // 3 paragraphs (1 dup), para chars 49 vs 41 distinct.
    assert(d(1L, "dup_line_frac") == 0.4)
    assert(d(1L, "dup_line_char_frac") == math.rint(18.0 / 47 * 1e6) / 1e6)
    assert(d(1L, "dup_para_frac") == 0.333333)
    assert(d(1L, "dup_para_char_frac") == math.rint(8.0 / 49 * 1e6) / 1e6)
    // doc 2: 'spam ham' x3, token char mass 25 -> 3*7/25
    assert(d(2L, "top_2gram_char_frac") == 0.84)
    assert(d(2L, "top_3gram_char_frac") == 0.88) // 'spam ham spam' x2 -> 2*11/25
    assert(!r(2L).getAs[Boolean]("pass"))
    // doc 3: 'a b c d e' covers positions 1-10 of 15 single-char tokens
    assert(d(3L, "dup_5gram_char_frac") == 0.666667)
    assert(d(3L, "dup_6gram_char_frac") == 0.0)
    // doc 4: 50 distinct tokens -> every metric tiny, passes
    assert(d(4L, "top_2gram_char_frac") == math.rint(6.0 / 150 * 1e6) / 1e6)
    assert(r(4L).getAs[Boolean]("pass"))
    // null text: zero everywhere (no repetition to flag)
    assert(d(5L, "dup_line_frac") == 0.0 && d(5L, "dup_10gram_char_frac") == 0.0)
    assert(r(5L).getAs[Boolean]("pass"))
  }

  test("gopher rules stay shuffle-free") {
    val docs = graft.Tables.load(spark, "/root/testdata/sf0.001", "documents")
    val plan = TextStats.gopherRules(docs).queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange"), s"unexpected shuffle:\n$plan")
  }

  test("gopher repetition battery is a shuffle-free projection (kernel path)") {
    val docs = graft.Tables.load(spark, "/root/testdata/sf0.001", "documents")
    val plan = TextStats.gopherRepetition(docs).queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange"), s"unexpected shuffle:\n$plan")
    assert(plan.contains("ngram_rep_mass"), s"kernel missing from plan:\n$plan")
  }
}
