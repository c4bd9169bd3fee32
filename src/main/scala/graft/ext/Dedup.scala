package graft.ext

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Deduplication operators (exact, MinHash-LSH, SimHash, n-gram
  * Jaccard) for training-data pipelines — beyond-reference scope,
  * SURVEY.md §2c.
  *
  * Scale design (the 100 TB lens):
  *  - exact dedup groups on a 128-bit digest, never on the raw text —
  *    the shuffle carries 16-byte keys, not documents;
  *  - near-dup NEVER does an all-pairs comparison: MinHash-LSH buckets
  *    by banded signatures so the self-join only materializes pairs
  *    that collide in some band (expected O(n·b + true pairs)), and the
  *    exact-Jaccard verification runs only on those candidates;
  *  - the n-gram path is an inverted-index join (shuffle on shingle),
  *    the exact counterpart for moderate corpora; its known hazard at
  *    scale is hot shingles — drop stop-shingles / use prefix filtering
  *    before the join (documented, not needed at test SF).
  */
object Dedup {

  /** Exact dedup: keep the lowest-id row per identical text. The group
    * key is md5(text) (16 bytes) so the aggregation shuffle is narrow;
    * the winning ids come back to the full rows via a semi-join that
    * AQE converts to broadcast when the winner set is small.
    */
  def exact(docs: DataFrame, idCol: String = "doc_id",
            textCol: String = "text"): DataFrame = {
    val winners = docs
      .groupBy(md5(col(textCol)).as("__fp"))
      .agg(min(col(idCol)).as(idCol))
      .select(idCol)
    docs.join(winners, Seq(idCol), "left_semi")
  }

  // ---------------------------------------------------------------------
  // MinHash
  // ---------------------------------------------------------------------

  /** Universal-hash parameters h_i(x) = (a_i·x + b_i) mod P, drawn
    * deterministically from a fixed seed. P = 2^31−1 (Mersenne prime)
    * keeps every product under 2^62 — Spark 4 runs ANSI mode, where a
    * 64-bit overflow is a runtime error, so the hash domain must
    * provably not overflow.
    */
  private val P = 2147483647L
  private def hashParams(numHashes: Int, seed: Long): (Seq[Long], Seq[Long]) = {
    val rnd = new scala.util.Random(seed)
    val as = Seq.fill(numHashes)(1L + rnd.nextInt((P - 1).toInt).toLong)
    val bs = Seq.fill(numHashes)(rnd.nextInt(P.toInt).toLong)
    (as, bs)
  }

  /** MinHash signature column (array<bigint> of length `numHashes`)
    * over a shingle-array column. One xxhash64 per shingle, then
    * `numHashes` affine re-hashes — all array HOFs, per-row, no
    * shuffle. Empty shingle set → signature of P (sentinel larger than
    * any real hash) so short docs never collide with real content.
    */
  def minHashSignature(shingleArr: Column, numHashes: Int, seed: Long = 0xC0FFEE): Column = {
    val (as, bs) = hashParams(numHashes, seed)
    val aLit = typedlit(as)
    val bLit = typedlit(bs)
    val base = transform(shingleArr, s => pmod(xxhash64(s), lit(P)))
    transform(sequence(lit(0), lit(numHashes - 1)), i =>
      when(size(base) > 0,
        array_min(transform(base, h =>
          pmod(element_at(aLit, i + 1) * h + element_at(bLit, i + 1), lit(P)))))
        .otherwise(lit(P)))
  }

  /** LSH banding: (id, band_idx, band_hash) — one row per band, hash of
    * the band's signature slice. Docs agreeing on ALL rows of any band
    * land in the same bucket. With r rows/band and b bands, a pair of
    * Jaccard similarity s collides somewhere with prob 1−(1−s^r)^b —
    * at r=4, b=32: s=0.8 → 1−5e−8 (recall ~1), s=0.3 → 0.23 (cheap
    * false candidates, killed by the exact verify).
    */
  def lshBands(sig: Column, bands: Int, rowsPerBand: Int): Column =
    transform(sequence(lit(0), lit(bands - 1)), j =>
      struct(j.as("band_idx"), hash(slice(sig, j * rowsPerBand + 1, lit(rowsPerBand))).as("band_hash")))

  /** Candidate pairs (aId < bId) from LSH bucket collisions: explode
    * bands, self-join on (band_idx, band_hash), distinct. The shuffle
    * key is the band hash — uniformly distributed, so no skew; bucket
    * sizes stay small because agreeing on r=4 independent min-hashes is
    * rare for dissimilar docs.
    */
  def lshCandidates(docsWithSig: DataFrame, idCol: String,
                    bands: Int, rowsPerBand: Int): DataFrame = {
    val banded = docsWithSig
      .select(col(idCol), explode(lshBands(col("__sig"), bands, rowsPerBand)).as("b"))
      .select(col(idCol), col("b.band_idx").as("band_idx"), col("b.band_hash").as("band_hash"))
    val a = banded.select(col("band_idx"), col("band_hash"), col(idCol).as("a_id"))
    val b = banded.select(col("band_idx"), col("band_hash"), col(idCol).as("b_id"))
    a.join(b, Seq("band_idx", "band_hash"))
      .where(col("a_id") < col("b_id"))
      .select("a_id", "b_id")
      .distinct()
  }

  /** Near-duplicate pairs by MinHash-LSH with exact verification:
    * shingle → sign → band → bucket-join → exact Jaccard on the
    * candidate pairs only → keep pairs ≥ threshold. Output:
    * (a_id, b_id, jaccard), deterministic — the LSH step only ever
    * *finds* candidates; the reported similarity is exact.
    */
  def nearDupMinHash(docs: DataFrame, idCol: String = "doc_id",
                     textCol: String = "text", shingleSize: Int = 3,
                     threshold: Double = 0.8, numHashes: Int = 128,
                     bands: Int = 32, seed: Long = 0xC0FFEE): DataFrame = {
    require(numHashes % bands == 0, s"bands=$bands must divide numHashes=$numHashes")
    val sh = docs.select(col(idCol), TextOps.shingles(col(textCol), shingleSize).as("__sh"))
    val withSig = sh.withColumn("__sig", minHashSignature(col("__sh"), numHashes, seed))
    val cands = lshCandidates(withSig, idCol, bands, numHashes / bands)
    verifyJaccard(cands, sh.select(col(idCol), col("__sh")), idCol, threshold)
  }

  /** Exact Jaccard on given (a_id, b_id) pairs from per-doc shingle
    * sets; keeps pairs ≥ threshold. Joins are on doc id (narrow keys);
    * the set intersection runs per-pair with array HOFs.
    */
  def verifyJaccard(pairs: DataFrame, shingleSets: DataFrame, idCol: String,
                    threshold: Double): DataFrame = {
    val aSets = shingleSets.select(col(idCol).as("a_id"), col("__sh").as("__sha"))
    val bSets = shingleSets.select(col(idCol).as("b_id"), col("__sh").as("__shb"))
    pairs.join(aSets, "a_id").join(bSets, "b_id")
      .withColumn("__inter", size(array_intersect(col("__sha"), col("__shb"))))
      .withColumn("jaccard",
        col("__inter").cast("double") /
          (size(col("__sha")) + size(col("__shb")) - col("__inter")).cast("double"))
      .where(col("jaccard") >= threshold)
      .select("a_id", "b_id", "jaccard")
  }

  /** Exact n-gram Jaccard near-dup via inverted-index join: explode
    * distinct shingles, self-join postings on the shingle, count
    * intersections per pair, compute J = |∩| / (|A|+|B|−|∩|). Exact
    * (no probabilistic step). Shuffle key is the shingle; at real scale
    * apply prefix filtering / drop ultra-frequent shingles first — a
    * shingle shared by f docs contributes f² join rows.
    */
  def nearDupNgramJaccard(docs: DataFrame, idCol: String = "doc_id",
                          textCol: String = "text", shingleSize: Int = 2,
                          threshold: Double = 0.7): DataFrame = {
    val sh = docs.select(col(idCol), TextOps.shingles(col(textCol), shingleSize).as("__sh"))
    val postings = sh.select(col(idCol), explode(col("__sh")).as("__s"))
    val sizes = sh.select(col(idCol), size(col("__sh")).as("__n"))
    val inter = postings.select(col("__s"), col(idCol).as("a_id"))
      .join(postings.select(col("__s"), col(idCol).as("b_id")), Seq("__s"))
      .where(col("a_id") < col("b_id"))
      .groupBy("a_id", "b_id").agg(count(lit(1)).as("__inter"))
    inter
      .join(sizes.select(col(idCol).as("a_id"), col("__n").as("__na")), "a_id")
      .join(sizes.select(col(idCol).as("b_id"), col("__n").as("__nb")), "b_id")
      .withColumn("jaccard",
        col("__inter").cast("double") /
          (col("__na") + col("__nb") - col("__inter")).cast("double"))
      .where(col("jaccard") >= threshold)
      .select("a_id", "b_id", "jaccard")
  }

  // ---------------------------------------------------------------------
  // SimHash
  // ---------------------------------------------------------------------

  /** 64-bit SimHash over tokens (with multiplicity), kept as four
    * 16-bit chunk ints: chunked storage both sidesteps ANSI-mode signed
    * overflow when packing bit 63 and IS the dedup index — by
    * pigeonhole, two signatures within Hamming distance 3 agree on at
    * least one of the 4 chunks, so candidate generation is an equi-join
    * on (chunk_idx, chunk_value), never all-pairs.
    */
  def simHashChunks(text: Column): Column = {
    val hashes = transform(TextOps.tokens(text), t => xxhash64(t))
    // bit b weight = Σ tokens (bit set ? +1 : −1); simhash bit = weight > 0
    val bits = transform(sequence(lit(0), lit(63)), b =>
      when(aggregate(hashes, lit(0L), (acc, h) =>
        acc + when(call_function("shiftright", h, b).bitwiseAND(lit(1L)) === 1L, 1L)
          .otherwise(-1L)) > 0, 1L)
        .otherwise(0L))
    transform(sequence(lit(0), lit(3)), c =>
      aggregate(slice(bits, c * 16 + 1, lit(16)), lit(0L), (acc, bit) => acc * 2 + bit))
  }

  /** Hamming distance between two chunked signatures. */
  def hammingDistance(a: Column, b: Column): Column =
    aggregate(zip_with(a, b, (x, y) => bit_count(x.bitwiseXOR(y))), lit(0), (acc, v) => acc + v)

  /** Near-dup pairs by SimHash: chunk-collision candidates, verified by
    * full Hamming distance ≤ maxHamming (exact for maxHamming ≤ 3 with
    * 4 chunks). Output: (a_id, b_id, hamming).
    */
  def nearDupSimHash(docs: DataFrame, idCol: String = "doc_id",
                     textCol: String = "text", maxHamming: Int = 3): DataFrame = {
    require(maxHamming <= 3, "4-chunk index is only complete for Hamming distance <= 3")
    val sigs = docs.select(col(idCol), simHashChunks(col(textCol)).as("__sim"))
    val chunks = sigs.select(col(idCol), col("__sim"),
        posexplode(col("__sim")).as(Seq("chunk_idx", "chunk_value")))
    val a = chunks.select(col("chunk_idx"), col("chunk_value"),
      col(idCol).as("a_id"), col("__sim").as("__sima"))
    val b = chunks.select(col("chunk_idx"), col("chunk_value"),
      col(idCol).as("b_id"), col("__sim").as("__simb"))
    a.join(b, Seq("chunk_idx", "chunk_value"))
      .where(col("a_id") < col("b_id"))
      .select(col("a_id"), col("b_id"),
        hammingDistance(col("__sima"), col("__simb")).as("hamming"))
      .distinct()
      .where(col("hamming") <= maxHamming)
  }
}
