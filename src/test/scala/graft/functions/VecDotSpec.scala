package graft.functions

import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.operators.Similarity

class VecDotSpec extends SparkSpec {
  import spark.implicits._

  test("vec_dot matches the higher-order fold bit-for-bit on real embeddings") {
    val e = graft.Tables.load(spark, "/root/testdata/sf0.001", "embeddings")
    val both = e.select(
      Similarity.dot($"embedding", $"embedding").as("native"),
      Similarity.dotHof($"embedding", $"embedding").as("hof"))
    assert(both.filter($"native" =!= $"hof" || $"native".isNull).count() == 0)
  }

  test("null array or null element yields null") {
    val df = Seq(
      (Some(Array(1.0f, 2.0f)), Some(Array(3.0f, 4.0f))),
      (None: Option[Array[Float]], Some(Array(1.0f)))
    ).toDF("a", "b")
    val out = df.select(Similarity.dot($"a", $"b").as("d")).collect()
    assert(out(0).getDouble(0) == 11.0)
    assert(out(1).isNullAt(0))

    val withNullElem = spark.sql("SELECT vec_dot(array(CAST(1.0 AS FLOAT), NULL), array(CAST(1.0 AS FLOAT), CAST(1.0 AS FLOAT))) AS d")
    assert(withNullElem.head().isNullAt(0))
  }

  test("mismatched dimensions yield null (matching the fold), both eval paths") {
    val viaSql = spark.sql(
      "SELECT vec_dot(array(CAST(1.0 AS FLOAT), CAST(2.0 AS FLOAT), CAST(3.0 AS FLOAT)), array(CAST(1.0 AS FLOAT), CAST(2.0 AS FLOAT)))")
    assert(viaSql.head().isNullAt(0))
    val df = Seq((Array(1.0f, 2.0f, 3.0f), Array(1.0f, 2.0f))).toDF("a", "b")
    val both = df.select(Similarity.dot($"a", $"b").as("n"), Similarity.dotHof($"a", $"b").as("h")).head()
    assert(both.isNullAt(0) && both.isNullAt(1))
  }

  test("vec_dot accepts double arrays and mixed float/double, matching the fold") {
    val e = graft.Tables.load(spark, "/root/testdata/sf0.001", "embeddings")
    val planeLit = typedLit(Similarity.md5Planes(1, 64).head)
    val both = e.select(
      Similarity.dot($"embedding", planeLit).as("native"),
      Similarity.dotHof($"embedding", planeLit).as("hof"))
    assert(both.filter($"native" =!= $"hof" || $"native".isNull).count() == 0)

    val dd = spark.sql(
      "SELECT vec_dot(array(CAST(1.5 AS DOUBLE), CAST(2.0 AS DOUBLE)), array(CAST(2.0 AS DOUBLE), CAST(0.5 AS DOUBLE)))")
      .head().getDouble(0)
    assert(dd == 4.0)
  }

  test("vec_dot is callable from SQL via the session extension") {
    val r = spark.sql(
      "SELECT vec_dot(array(CAST(1.5 AS FLOAT), CAST(2.0 AS FLOAT)), array(CAST(2.0 AS FLOAT), CAST(0.5 AS FLOAT)))")
      .head().getDouble(0)
    assert(r == 4.0)
  }

  test("shingle_hashes matches string-shingle hashing set-wise, handles short/empty text") {
    import graft.operators.TextDedup
    val df = Seq(
      (1L, "a b c d e"),
      (2L, "x y"),          // shorter than n -> one whole-text shingle
      (3L, "a b c a b c"),  // repeated n-grams -> distinct set
      (4L, "")
    ).toDF("doc_id", "text")
    val out = df.select($"doc_id", TextDedup.hashedShingles($"text", 3).as("h"))
      .collect().map(r => r.getAs[Long]("doc_id") -> r.getSeq[Long](1)).toMap
    assert(out(1L).length == 3) // "a b c","b c d","c d e"
    assert(out(2L).length == 1)
    // "a b c","b c a","c a b","a b c" -> 3 distinct
    assert(out(3L).toSet.size == out(3L).length && out(3L).length == 3)
    assert(out(4L).length == 1) // [""] tokens -> one shingle
    // identical texts hash identically; distinct texts don't collide
    assert(out(1L).toSet.intersect(out(2L).toSet).isEmpty)
  }

  test("ngram_rep_mass: hand-computed top/dup masses, short-doc zeros, codegen==interpreted") {
    import org.apache.spark.sql.functions.{call_function, lit => slit, split => ssplit}
    val df = Seq(
      // trigram "a b c" occurs twice (positions 1,4 overlap-free):
      // top = 2*3, dup covers positions 1-3 and 4-6 of 7 1-char tokens
      (1L, "a b c a b c x"),
      (2L, "x y"),                 // shorter than n -> both masses 0
      (3L, "ab cd ef"),            // all distinct: top = 1*(2+2+2), dup 0
      (4L, "w w w w")              // overlapping dup windows union, not sum
    ).toDF("doc_id", "text")
    val out = df.select($"doc_id",
        call_function("ngram_rep_mass", ssplit($"text", " "), slit(3)).as("m"))
      .collect().map(r => r.getAs[Long]("doc_id") -> r.getSeq[Long](1)).toMap
    assert(out(1L) == Seq(6L, 6L))
    assert(out(2L) == Seq(0L, 0L))
    assert(out(3L) == Seq(6L, 0L))
    // "w w w": 2 windows, both the same gram (count 2) -> top = 2*3;
    // union coverage = all 4 tokens (overlap counted once) -> dup = 4
    assert(out(4L) == Seq(6L, 4L))
    // interpreted == codegen
    val toks = "a b c a b c x".split(" ")
      .map(org.apache.spark.unsafe.types.UTF8String.fromString)
    val arr = new org.apache.spark.sql.catalyst.util.GenericArrayData(toks.asInstanceOf[Array[Any]])
    assert(graft.functions.NgramRepMass.compute(arr, 3).toLongArray().toSeq == out(1L))
  }

  test("shingle_hashes interpreted eval equals codegen output") {
    import graft.operators.TextDedup
    val df = Seq((1L, "the quick brown fox jumps over the lazy dog")).toDF("doc_id", "text")
    val viaCodegen = df.select(TextDedup.hashedShingles($"text", 3).as("h"))
      .head().getSeq[Long](0)
    // interpreted path: evaluate the expression directly
    val toks = "the quick brown fox jumps over the lazy dog".split(" ")
      .map(org.apache.spark.unsafe.types.UTF8String.fromString)
    val arr = new org.apache.spark.sql.catalyst.util.GenericArrayData(toks.asInstanceOf[Array[Any]])
    val interp = graft.functions.ShingleHashes.compute(arr, 3)
    assert(viaCodegen == interp.toLongArray().toSeq)
  }

  test("native simhash64 is bit-identical to the higher-order fold") {
    import graft.operators.TextDedup
    val docs = graft.Tables.load(spark, "/root/testdata/sf0.001", "documents")
    val both = docs.select(
      TextDedup.simhash64($"text").as("native"),
      TextDedup.simhash64Hof($"text").as("hof"))
    assert(both.filter($"native" =!= $"hof").count() == 0)
  }

  test("vec_sign_bits sets the bit for NaN dots, matching SQL comparison semantics") {
    // a NaN element makes every plane dot NaN; Spark SQL (and DuckDB)
    // order NaN above all values, so the when(vec_dot > 0) shape the
    // kernel replaces sets every bit — Java's primitive > would not
    val planes = Similarity.md5Planes(4, 2)
    val df = Seq(Tuple1(Array(Float.NaN, 1.0f))).toDF("e")
    val whenChain = planes.zipWithIndex.map { case (p, i) =>
      when(Similarity.dotHof($"e", typedLit(p)) > 0, lit(1L << i)).otherwise(lit(0L))
    }.reduce(_ + _)
    val row = df.select(
      call_function("vec_sign_bits", $"e", typedLit(planes)).as("native"),
      whenChain.as("composed")).head()
    assert(row.getLong(0) == row.getLong(1),
      s"native=${row.getLong(0)} composed=${row.getLong(1)}")
    assert(row.getLong(0) == 15L)
  }

  test("scoring runs inside whole-stage codegen") {
    val e = graft.Tables.load(spark, "/root/testdata/sf0.001", "embeddings")
    val plan = e.select(Similarity.dot($"embedding", $"embedding").as("d"))
      .queryExecution.executedPlan.toString
    // the "*(n)" star prefix marks operators inside a WholeStageCodegen span
    assert(plan.contains("*(1) Project"), s"no codegen span:\n$plan")
  }
}
