package graft.dedup

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import graft.text.Text

/** Corpus deduplication — exact, MinHash+LSH, SimHash, n-gram Jaccard, and
  * embedding-cosine near-dup. Designed for the 100 TB shape:
  *
  *  - Exact dedup is a hash-groupBy: one shuffle on the content hash, no
  *    driver state, AQE handles skew from boilerplate duplicates.
  *  - MinHash is explode(permutation index) + groupBy(doc, perm) partial
  *    min — map-side combined, so the shuffle carries |docs|·k tiny rows.
  *  - LSH banding turns O(n²) pair generation into a self-join on band
  *    buckets; candidate verification (exact Jaccard) touches only the
  *    bucket-cojoined pairs.
  *  - Hash functions are salted md5 so the DuckDB oracle can reproduce the
  *    exact signatures (engine-portable determinism beats raw xxhash64
  *    speed at verification time; swap `hashFn` for xxhash64 in
  *    production where no cross-engine oracle is needed).
  */
object Dedup {

  /** Exact dedup: keep the lowest doc_id per normalized-content hash. */
  def exact(docs: DataFrame, idCol: String, textCol: String): DataFrame =
    docs
      .withColumn("fp", Text.exactFingerprint(col(textCol)))
      .groupBy(col("fp"))
      .agg(min(col(idCol)).as("keep_id"), count(lit(1)).as("n_copies"))

  /** Salted, engine-portable token hash for permutation `i`:
    * md5("i:token"). Lexicographic min over hex strings is a valid minhash
    * (uniformly distributed under md5). */
  private def saltedHash(i: Column, tok: Column): Column =
    md5(concat_ws(":", i.cast("string"), tok))

  /** MinHash signatures: one row per (doc, permutation) with the min salted
    * hash over the doc's token set. numPerms rows per doc — the explode is
    * map-side, the min is a partial agg. */
  def minhashSignatures(docs: DataFrame, idCol: String, textCol: String,
                        numPerms: Int): DataFrame =
    docs
      .select(col(idCol).as("doc_id"), Text.tokenSet(col(textCol)).as("toks"))
      .select(col("doc_id"), explode(col("toks")).as("tok"),
        lit(1).as("one"))
      .select(col("doc_id"), col("tok"),
        explode(sequence(lit(0), lit(numPerms - 1))).as("perm"))
      .groupBy("doc_id", "perm")
      .agg(min(saltedHash(col("perm"), col("tok"))).as("mh"))

  /** LSH band buckets: group each doc's signature into `numBands` bands of
    * `numPerms/numBands` rows, hash each band → (band, bucket) keys. */
  def lshBuckets(signatures: DataFrame, numBands: Int, numPerms: Int)
  : DataFrame = {
    val rowsPerBand = numPerms / numBands
    signatures
      .withColumn("band", (col("perm") / rowsPerBand).cast("int"))
      .groupBy("doc_id", "band")
      .agg(md5(concat_ws(",",
        array_sort(collect_list(struct(col("perm"), col("mh"))))
          .getField("mh"))).as("bucket"))
  }

  /** Candidate pairs from shared LSH buckets (doc_a < doc_b), deduped. */
  def lshCandidates(buckets: DataFrame): DataFrame = {
    val a = buckets.select(col("band"), col("bucket"),
      col("doc_id").as("doc_a"))
    val b = buckets.select(col("band"), col("bucket"),
      col("doc_id").as("doc_b"))
    a.join(b, Seq("band", "bucket"))
      .filter(col("doc_a") < col("doc_b"))
      .select("doc_a", "doc_b")
      .distinct()
  }

  /** Exact token-set Jaccard for a pair table — the verification step after
    * LSH candidate generation. */
  def verifyJaccard(pairs: DataFrame, docs: DataFrame, idCol: String,
                    textCol: String, threshold: Double): DataFrame = {
    val toks = docs.select(col(idCol).as("jid"),
      Text.tokenSet(col(textCol)).as("jtoks"))
    pairs
      .join(toks.select(col("jid").as("doc_a"), col("jtoks").as("toks_a")),
        Seq("doc_a"))
      .join(toks.select(col("jid").as("doc_b"), col("jtoks").as("toks_b")),
        Seq("doc_b"))
      .withColumn("jaccard",
        size(array_intersect(col("toks_a"), col("toks_b"))).cast("double") /
          size(array_union(col("toks_a"), col("toks_b"))).cast("double"))
      .filter(col("jaccard") >= threshold)
      .select(col("doc_a"), col("doc_b"), round(col("jaccard"), 6)
        .as("jaccard"))
  }

  /** Full MinHash-LSH near-dup pipeline: signatures → bands → candidates →
    * exact-Jaccard verification. */
  def minhashLshPairs(docs: DataFrame, idCol: String, textCol: String,
                      numPerms: Int, numBands: Int, threshold: Double)
  : DataFrame = {
    val sigs = minhashSignatures(docs, idCol, textCol, numPerms)
    val cands = lshCandidates(lshBuckets(sigs, numBands, numPerms))
    verifyJaccard(cands, docs, idCol, textCol, threshold)
  }

  /** SimHash fingerprint (Charikar '02), `bits`-wide (≤ 16 so the oracle
    * can reproduce it from md5 hex nibbles): per token take bit j of
    * md5(token), sum over tokens, bit set iff count*2 > n_tokens.
    * Implemented as explode(token) × transform(bit range) + groupBy — the
    * per-doc reduction is a partial agg, so the shuffle carries one row per
    * (doc, bit).
    */
  def simhash(docs: DataFrame, idCol: String, textCol: String, bits: Int)
  : DataFrame = {
    require(bits <= 16, "oracle-portable simhash uses the first 4 md5 nibbles")
    val tok = docs.select(col(idCol).as("doc_id"),
      Text.tokenSet(col(textCol)).as("toks"))
      .select(col("doc_id"), size(col("toks")).as("n_toks"),
        explode(col("toks")).as("tok"))
      .withColumn("h", md5(col("tok")))
    // bit j of the 16-bit prefix: nibble j/4, bit 3-(j%4) of that nibble.
    tok.select(col("doc_id"), col("n_toks"),
      explode(sequence(lit(0), lit(bits - 1))).as("bit"),
      col("h"))
      .withColumn("nibble",
        hexNibble(col("h").substr(
          (col("bit") / 4).cast("int") + 1, lit(1))))
      .withColumn("bit_set",
        (col("nibble") / pow(lit(2.0), lit(3) - col("bit") % 4))
          .cast("int") % 2)
      .groupBy("doc_id", "bit")
      .agg(sum(col("bit_set")).as("ones"), max(col("n_toks")).as("n_toks"))
      .withColumn("bit_val",
        when(col("ones") * 2 > col("n_toks"),
          pow(lit(2.0), lit(bits - 1) - col("bit")).cast("bigint"))
          .otherwise(0L))
      .groupBy("doc_id")
      .agg(sum(col("bit_val")).cast("bigint").as("simhash"))
  }

  /** Hex nibble char ('0'-'9','a'-'f') → 0-15, expression-only. */
  private def hexNibble(c: Column): Column =
    when(ascii(c) <= 57, ascii(c) - 48).otherwise(ascii(c) - 87)

  /** n-gram (word k-shingle) Jaccard near-dup within a blocking key —
    * the direct quadratic verifier, made scale-safe by blocking: pairs are
    * only generated inside (lang, source, length-bucket) blocks. */
  def ngramJaccardPairs(docs: DataFrame, k: Int, threshold: Double)
  : DataFrame = {
    val staged = docs.select(col("doc_id"), col("lang"), col("source"),
      (col("n_chars") / lit(64)).cast("int").as("len_bucket"),
      Text.shingles(Text.tokens(col("text")), k).as("grams"))
    val a = staged.toDF("doc_a", "lang", "source", "len_bucket", "grams_a")
    val b = staged.toDF("doc_b", "lang", "source", "len_bucket", "grams_b")
    a.join(b, Seq("lang", "source", "len_bucket"))
      .filter(col("doc_a") < col("doc_b"))
      .withColumn("jaccard",
        size(array_intersect(col("grams_a"), col("grams_b"))).cast("double") /
          size(array_union(col("grams_a"), col("grams_b"))).cast("double"))
      .filter(col("jaccard") >= threshold)
      .select(col("doc_a"), col("doc_b"), round(col("jaccard"), 6)
        .as("jaccard"))
  }
}
