package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Document deduplication for LLM training-data pipelines, at three
  * fidelity levels — exact, MinHash-LSH near-dup, SimHash near-dup.
  *
  * Scale discipline (the non-negotiable at 100 TB): NOTHING here is
  * all-pairs. Every candidate-generation step is a bucketed equi-join —
  * exact dedup buckets on a content hash, MinHash on LSH band hashes,
  * SimHash on 16-bit chunks (pigeonhole: hamming ≤ 3 of 64 bits ⇒ at
  * least one of 4 chunks identical). Expensive verification (true
  * Jaccard / exact hamming) runs only on bucket-collision candidates.
  *
  * Signatures are built entirely from codegen'd higher-order array
  * functions in a single projection — per-row work at scan speed, no
  * shuffle until the (tiny) candidate join.
  */
object TextDedup {

  /** Canonical text form: lowercase, whitespace collapsed. */
  def normalize(text: Column): Column =
    lower(trim(regexp_replace(text, "\\s+", " ")))

  def contentHash(text: Column): Column = md5(normalize(text))

  // ------------------------------------------------------------------
  // Exact dedup
  // ------------------------------------------------------------------

  /** Clusters of exact (normalized) duplicates: one row per content
    * hash held by >1 doc. One hash-aggregate — a single shuffle on the
    * 128-bit content hash, uniformly distributed, no skew. */
  def exactDupClusters(docs: DataFrame, textCol: String = "text"): DataFrame =
    docs
      .select(contentHash(col(textCol)).as("content_hash"), col("doc_id"))
      .groupBy("content_hash")
      .agg(count(lit(1)).as("dup_count"), min("doc_id").as("canonical_doc_id"))
      .filter(col("dup_count") > 1)

  /** Exact dedup keeping the lowest doc_id per content hash. A window
    * over the hash — same single shuffle as the cluster agg. */
  def dedupExact(docs: DataFrame, textCol: String = "text"): DataFrame = {
    val w = Window.partitionBy(contentHash(col(textCol))).orderBy(col("doc_id"))
    docs.withColumn("__rn", row_number().over(w)).filter(col("__rn") === 1).drop("__rn")
  }

  // ------------------------------------------------------------------
  // MinHash + LSH
  // ------------------------------------------------------------------

  /** Word n-gram shingles of the normalized text (distinct). */
  def shingles(text: Column, n: Int = 3): Column = {
    val toks = split(normalize(text), " ")
    array_distinct(
      when(size(toks) < n, array(concat_ws(" ", toks)))
        .otherwise(transform(
          sequence(lit(1), size(toks) - (n - 1)),
          i => concat_ws(" ", slice(toks, i, lit(n))))))
  }

  /** MinHash signature: for each of `numHashes` hash families, the
    * minimum xxhash64(salt, shingle) over the shingle set. One nested
    * higher-order expression — no explode, no shuffle. */
  def minhashSignature(sh: Column, numHashes: Int = 64): Column =
    transform(sequence(lit(0), lit(numHashes - 1)),
      h => array_min(transform(sh, s => xxhash64(h, s))))

  /** LSH band keys: the signature split into `bands` equal slices, each
    * hashed to one bucket key. Docs sharing ANY band key are candidates. */
  def bandKeys(sig: Column, bands: Int, rowsPerBand: Int): Column =
    transform(sequence(lit(0), lit(bands - 1)),
      b => struct(b.as("band"), xxhash64(concat_ws(",", slice(sig, b * rowsPerBand + 1, lit(rowsPerBand)))).as("bucket")))

  /** Candidate pairs from LSH banding, verified with TRUE Jaccard over
    * the shingle sets; pairs are distinct with left id < right id.
    *
    * Plan shape: project (doc_id, shingles, sig) → explode bands
    * (×`bands` rows) → shuffle on (band, bucket) → self-join within
    * buckets → verify. The only quadratic term is within-bucket, which
    * LSH keeps tiny for non-duplicate text.
    */
  def nearDupPairsMinhash(
      docs: DataFrame,
      textCol: String = "text",
      shingleN: Int = 3,
      numHashes: Int = 64,
      bands: Int = 16,
      jaccardThreshold: Double = 0.8): DataFrame = {
    val rowsPerBand = numHashes / bands
    require(bands * rowsPerBand == numHashes, "bands must divide numHashes")

    val sigs = docs.select(
      col("doc_id"),
      shingles(col(textCol), shingleN).as("sh"),
      minhashSignature(shingles(col(textCol), shingleN), numHashes).as("sig"))

    val banded = sigs
      .select(col("doc_id"), col("sh"), explode(bandKeys(col("sig"), bands, rowsPerBand)).as("bk"))
      .select(col("doc_id"), col("sh"), col("bk.band").as("band"), col("bk.bucket").as("bucket"))

    val a = banded.select(col("band"), col("bucket"), col("doc_id").as("a_id"), col("sh").as("a_sh"))
    val b = banded.select(col("band"), col("bucket"), col("doc_id").as("b_id"), col("sh").as("b_sh"))

    a.join(b, Seq("band", "bucket"))
      .filter(col("a_id") < col("b_id"))
      .select(col("a_id"), col("b_id"),
        (size(array_intersect(col("a_sh"), col("b_sh"))).cast("double") /
          size(array_union(col("a_sh"), col("b_sh")))).as("jaccard"))
      .filter(col("jaccard") >= jaccardThreshold)
      .groupBy("a_id", "b_id").agg(max("jaccard").as("jaccard")) // distinct across bands
  }

  // ------------------------------------------------------------------
  // SimHash
  // ------------------------------------------------------------------

  /** 64-bit SimHash over the token multiset: per bit position, sum +1
    * for tokens whose hash has the bit set, -1 otherwise; the result
    * bit is 1 iff the sum is positive. One aggregate fold over the
    * token array — per-row, shuffle-free. */
  def simhash64(text: Column): Column = {
    val toks = split(normalize(text), " ")
    val counters = aggregate(
      toks,
      array_repeat(lit(0), 64),
      (acc, t) => zip_with(acc, sequence(lit(0), lit(63)),
        (c, i) => c + when(call_function("shiftright", xxhash64(t), i).bitwiseAND(1) === 1, 1).otherwise(-1)))
    aggregate(
      zip_with(counters, sequence(lit(0), lit(63)), (c, i) => struct(c.as("c"), i.as("i"))),
      lit(0L),
      (acc, p) => acc +
        when(p.getField("c") > 0, call_function("shiftleft", lit(1L), p.getField("i"))).otherwise(0L))
  }

  /** Near-dup pairs by SimHash hamming distance ≤ `maxHamming` (< 16):
    * bucket on each of the 4 16-bit chunks (pigeonhole guarantees a
    * collision for hamming ≤ 3 when probing all 4 chunk tables), verify
    * with exact popcount of the XOR. */
  def nearDupPairsSimhash(
      docs: DataFrame,
      textCol: String = "text",
      maxHamming: Int = 3): DataFrame = {
    val sigs = docs.select(col("doc_id"), simhash64(col(textCol)).as("sim"))
    val chunked = sigs.select(
      col("doc_id"), col("sim"),
      explode(transform(sequence(lit(0), lit(3)),
        k => struct(k.as("chunk"),
          call_function("shiftright", col("sim"), k * 16).bitwiseAND(0xFFFFL).as("key")))).as("ck"))
      .select(col("doc_id"), col("sim"), col("ck.chunk").as("chunk"), col("ck.key").as("key"))

    val a = chunked.select(col("chunk"), col("key"), col("doc_id").as("a_id"), col("sim").as("a_sim"))
    val b = chunked.select(col("chunk"), col("key"), col("doc_id").as("b_id"), col("sim").as("b_sim"))

    a.join(b, Seq("chunk", "key"))
      .filter(col("a_id") < col("b_id"))
      .select(col("a_id"), col("b_id"),
        bit_count(col("a_sim").bitwiseXOR(col("b_sim"))).as("hamming"))
      .filter(col("hamming") <= maxHamming)
      .groupBy("a_id", "b_id").agg(min("hamming").as("hamming"))
  }

  // ------------------------------------------------------------------
  // Oracle-checkable MinHash variant (md5-based)
  // ------------------------------------------------------------------

  /** MinHash signature using md5 hex strings and lexicographic min —
    * slower than the xxhash64 path but expressible identically in
    * DuckDB, so the signature computation itself is cross-engine
    * verified (SparkEntry `doc_minhash_sig`). */
  def minhashSignatureMd5(sh: Column, numHashes: Int): Column =
    transform(sequence(lit(0), lit(numHashes - 1)),
      h => array_min(transform(sh, s => md5(concat(h.cast("string"), lit(":"), s)))))
}
