package graft.ops

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Shared text-normalization / shingling / hashing machinery for the
  * LLM-data-pipeline operator families (dedup, text analysis) over the
  * driver's `documents` table. The reference has no counterpart (its text
  * processing is the transcript regex ETL, ETL_FINAL.py:149-192); these are
  * the driver-mandated north-star operators (SURVEY.md §7.6).
  *
  * Every construct here exists twice: a Spark `Column` expression and a
  * DuckDB SQL fragment that computes the *identical* value (same hash
  * function md5, same shingle construction, same fold order), so results
  * hash-match across engines. All per-document work is expressed with
  * codegen-free higher-order functions over arrays — no explode until a
  * join needs it — so a document is processed entirely within its partition
  * (the 100 TB shape: documents are embarrassingly parallel until the
  * candidate-pair join, which shuffles on band/shingle keys only).
  */
object TextCore {

  // -------------------------------------------------------------------------
  // Spark side
  // -------------------------------------------------------------------------

  /** Whitespace-collapsed lowercase normalization. */
  def normCol(text: Column): Column =
    trim(regexp_replace(lower(text), "\\s+", " "))

  def wordsCol(norm: Column): Column = split(norm, " ")

  /** Deterministic 0..99 id-hash bucket (first 4 md5 hex digits of the
    * decimal id, mod 100) — the split/batch assignment primitive shared by
    * the data-split (q70), contamination (q77/q88) and incremental-dedup
    * (q80) queries. A pure function of the id: reproducible across runs,
    * engines and partitionings (`randomSplit` is none of those). */
  def idBucket(id: Column): Column =
    pmod(conv(substring(md5(id.cast("string")), 1, 4), 16, 10).cast("long"), lit(100L))

  /** Distinct word 3-shingles of a word array (empty if < 3 words),
    * sorted ascending so intersection sizes can be computed by a compiled
    * merge walk ([[graft.functions.SortedIntersectCount]]). Built with
    * transform over an index sequence — no explode. Every consumer is a
    * set operation (min-hash, bit-sum, intersection), so the ordering is
    * semantics-free. */
  def shingles3(words: Column): Column =
    when(size(words) >= 3,
      array_sort(array_distinct(transform(
        sequence(lit(1), size(words) - 2),
        i => concat_ws(" ",
          element_at(words, i),
          element_at(words, i + 1),
          element_at(words, i + 2))))))
      .otherwise(array().cast("array<string>"))

  /** MinHash signature value for one seed, by double hashing: with
    * h1/h2 = the first/second 8 hex digits of a shingle's md5 (computed
    * once, [[docShingles]]' `sh_md5`), hash_k(s) = h1 + k·h2 (< 2^36, no
    * overflow) — the standard 2-hash family, so k seeds cost one md5
    * instead of k. NULL for an empty shingle set (which null-propagates
    * out of band keys — empty docs never become candidates). */
  def minhash(shMd5: Column, seed: Int): Column =
    array_min(transform(shMd5, h =>
      conv(h.substr(1, 8), 16, 10).cast("long") +
        lit(seed.toLong) * conv(h.substr(9, 8), 16, 10).cast("long")))

  /** 64-bit SimHash over an array of pre-computed md5 hex digests, as a
    * 64-char '0'/'1' string. Bit b of digest h = bit (3 - b%4) of hex
    * digit b/4; simhash bit b = 1 iff Σ_h (2·bit_b(h) − 1) > 0. This is
    * the declarative spec (one nested higher-order expression — no
    * explode, no shuffle); the hot path uses the value-identical compiled
    * [[graft.functions.SimHash64]] (parity-tested in DedupSpec). Digests
    * are hashed once *before* this expression — inlining md5 here would
    * recompute it per bit (64×; the r2 q33 hotspot). */
  def simhash64(md5Hashes: Column): Column = {
    def bitOf(h: Column, b: Column): Column = {
      val hexDigit = h.substr((b.cast("int") / 4).cast("int") + 1, lit(1))
      val digit = instr(lit("0123456789abcdef"), hexDigit) - 1
      // (digit >> (3 - b%4)) & 1, spelled with a Column shift amount:
      // digits are 0..15 so the double division is exact.
      (digit.cast("double") / pow(lit(2.0), lit(3) - b % 4)).cast("int") % 2
    }
    array_join(
      transform(sequence(lit(0), lit(63)), b =>
        when(aggregate(md5Hashes, lit(0), (acc, h) => acc + bitOf(h, b) * 2 - 1) > 0,
          lit("1")).otherwise(lit("0"))),
      "")
  }

  /** Hamming distance between two equal-length 64-bit strings. */
  def hamming(a: Column, b: Column): Column =
    aggregate(sequence(lit(1), lit(64)), lit(0), (acc, i) =>
      acc + when(a.substr(i.cast("int"), lit(1)) === b.substr(i.cast("int"), lit(1)), 0).otherwise(1))

  /** Append the per-document shingle feature chain to `df`: norm →
    * words → shingles → sh_md5 (one md5 per shingle, shared by minhash
    * q32, simhash q33 and fingerprints q43 — hashing is the dominant
    * per-doc cost). THE definition of the chain: the batch
    * [[docShingles]] build and the streaming near-dup probe
    * ([[graft.streaming.EventStream.neardupProbeStream]]) both call
    * this, so the feature definition cannot drift between them. */
  def withShingleFeatures(df: DataFrame, text: Column): DataFrame =
    df.withColumn("norm", normCol(text))
      .withColumn("words", wordsCol(col("norm")))
      .withColumn("shingles", shingles3(col("words")))
      .withColumn("sh_md5", transform(col("shingles"), sh => md5(sh)))

  /** documents with norm/words/shingles columns — memoized + persisted per
    * (session, dir): a dozen queries derive from it, and the interpreted
    * shingle transform over the corpus is the expensive part (recomputing
    * it on every reference was the dominant cost of the r2 dedup bench).
    * The cluster-scale analog is a materialized features table. */
  def docShingles(spark: SparkSession, dir: String): DataFrame =
    graft.SessionMemo(spark, dir, "docs:shingles") {
      val d = spark.read.parquet(s"$dir/documents.parquet")
        .select("doc_id", "lang", "source", "n_chars", "text")
      withShingleFeatures(d, col("text")).drop("text")
    }(_.persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK))

  // -------------------------------------------------------------------------
  // DuckDB oracle fragments (must mirror the Spark expressions exactly)
  // -------------------------------------------------------------------------

  /** `docs` CTE: doc_id, lang, source, n_chars, norm, words, shingles,
    * sh_md5. */
  val docsCte: String =
    """docs AS (
      |  SELECT *, list_transform(shingles, s -> md5(s)) AS sh_md5 FROM (
      |  SELECT doc_id, lang, source, n_chars, norm, words,
      |         CASE WHEN len(words) >= 3
      |              THEN list_distinct(list_transform(range(1, len(words)-1),
      |                     i -> words[i] || ' ' || words[i+1] || ' ' || words[i+2]))
      |              ELSE CAST([] AS VARCHAR[]) END AS shingles
      |  FROM (
      |    SELECT doc_id, lang, source, n_chars, norm, string_split(norm, ' ') AS words
      |    FROM (SELECT doc_id, lang, source, n_chars,
      |                 trim(regexp_replace(lower(text), '\s+', ' ', 'g')) AS norm
      |          FROM documents))))""".stripMargin

  /** SQL spelling of [[idBucket]] for the DuckDB oracles — `id` is the
    * column expression to bucket (`doc_id`, `cluster_id`, …). */
  def idBucketSql(id: String): String =
    s"CAST('0x' || substr(md5(CAST($id AS VARCHAR)), 1, 4) AS BIGINT) % 100"

  /** SQL for [[minhash]] over the docs CTE's `sh_md5`. */
  def minhashSql(seed: Int): String =
    s"""list_aggregate(list_transform(sh_md5, h ->
       |      CAST('0x' || substr(h, 1, 8) AS BIGINT)
       |      + $seed * CAST('0x' || substr(h, 9, 8) AS BIGINT)), 'min')""".stripMargin

  /** SQL for [[simhash64]] over a pre-hashed md5-digest-list expression. */
  def simhash64Sql(md5Hashes: String): String =
    s"""array_to_string(list_transform(range(0, 64), b ->
       |  CASE WHEN list_aggregate(list_transform($md5Hashes, h ->
       |         ((instr('0123456789abcdef', substr(h, (b // 4) + 1, 1)) - 1
       |           >> (3 - (b % 4))) & 1) * 2 - 1), 'sum') > 0
       |       THEN '1' ELSE '0' END), '')""".stripMargin

  /** SQL for [[hamming]] of two 64-char bit strings (BIGINT to match the
    * Spark side's long — DuckDB list sums can widen to HUGEINT→float64). */
  def hammingSql(a: String, b: String): String =
    s"""CAST(list_aggregate(list_transform(range(1, 65), i ->
       |  CASE WHEN substr($a, CAST(i AS INT), 1) = substr($b, CAST(i AS INT), 1)
       |       THEN 0 ELSE 1 END), 'sum') AS BIGINT)""".stripMargin

  def withDocs(select: String): String = s"WITH $docsCte $select"

  /** [[withDocs]] with the RECURSIVE keyword — for oracles that carry a
    * recursive CTE (q138's greedy disjoint-pair selection); DuckDB
    * requires RECURSIVE on the WITH itself, and non-recursive CTEs under
    * it are unaffected. */
  def withDocsRecursive(select: String): String = s"WITH RECURSIVE $docsCte $select"
}
