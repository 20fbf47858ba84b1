package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.graft.Bridge
import org.apache.spark.sql.graft.expressions.{MinHashSignature, SimHash64}
import graft.functions.GraftFunctions

/**
 * Deduplication operators for training-data pipelines, each designed to
 * scale: no driver-side loops, candidate generation always via
 * hash-bucket equi-joins (shuffle on bucket key), exact verification only
 * on candidate pairs.
 *
 *  - exact:     one groupBy on a text hash (single shuffle).
 *  - minhash:   shingle -> MinHash signature -> LSH bands -> bucket join.
 *  - simhash:   64-bit fingerprint -> 4x16-bit chunk index (finds all
 *               pairs within Hamming distance 3 by pigeonhole).
 *  - ngram:     exact Jaccard via shingle inverted index (the standard
 *               "explode + self-join on shingle" plan).
 *  - embedding: cosine near-dup via random-hyperplane buckets, exact
 *               verify on candidates.
 */
object Dedup {

  def simhash(tokens: Column, seed: Long = 42L): Column =
    Bridge.column(SimHash64(Bridge.expression(tokens), seed))

  def minhash(tokens: Column, numHashes: Int, seed: Long = 42L): Column =
    Bridge.column(MinHashSignature(Bridge.expression(tokens), numHashes, seed))

  /**
   * Exact duplicate groups by full-text hash: one row per distinct text,
   * with the kept (minimum) id and the duplicate count.
   */
  def exactDuplicateGroups(df: DataFrame, idCol: String, textCol: String): DataFrame =
    df.groupBy(md5(col(textCol)).as("text_hash"))
      .agg(min(col(idCol)).as("keep_id"), count(lit(1)).as("n_copies"))

  /** Rows surviving exact dedup (min-id representative per text). */
  def exactDedup(df: DataFrame, idCol: String, textCol: String): DataFrame = {
    val keep = exactDuplicateGroups(df, idCol, textCol).select(col("keep_id").as(idCol))
    df.join(keep, Seq(idCol), "left_semi")
  }

  /**
   * MinHash-LSH candidate pairs: signature of `numHashes` hashes split
   * into `bands` bands; docs sharing any band land in the same bucket.
   * Exact Jaccard (on distinct shingles) verifies candidates >= minJaccard.
   * Output: (id_a, id_b, jaccard) with id_a < id_b.
   */
  def minHashNearDupPairs(df: DataFrame, idCol: String, textCol: String,
      shingleSize: Int = 3, numHashes: Int = 64, bands: Int = 16,
      minJaccard: Double = 0.5, seed: Long = 42L): DataFrame = {
    require(numHashes % bands == 0, "bands must divide numHashes")
    val rows = numHashes / bands
    val shingleTable = df.select(col(idCol).as("id"),
        TextAnalysis.shingles(col(textCol), shingleSize).as("shingles"))
      .filter(size(col("shingles")) > 0)

    // Band WITHOUT carrying the shingle arrays: the bucket join only
    // moves (id, band, bucket) triples. Arrays rejoin once, per side,
    // for the exact verification — at scale this is the difference
    // between shuffling ids and shuffling whole documents.
    val banded = shingleTable
      .withColumn("sig", minhash(col("shingles"), numHashes, seed))
      .select(col("id"), posexplode(transform(sequence(lit(0), lit(bands - 1)),
        b => hash(slice(col("sig"), b * rows + 1, lit(rows)), b))).as(Seq("band", "bucket")))

    val a = banded.select(col("band"), col("bucket"), col("id").as("id_a"))
    val b = banded.select(col("band"), col("bucket"), col("id").as("id_b"))
    val candidates = a.join(b, Seq("band", "bucket"))
      .filter(col("id_a") < col("id_b"))
      .select("id_a", "id_b")
      .dropDuplicates("id_a", "id_b")

    val shA = shingleTable.select(col("id").as("id_a"), col("shingles").as("sh_a"))
    val shB = shingleTable.select(col("id").as("id_b"), col("shingles").as("sh_b"))
    candidates.join(shA, Seq("id_a")).join(shB, Seq("id_b"))
      .withColumn("jaccard",
        size(array_intersect(col("sh_a"), col("sh_b"))).cast("double") /
          size(array_union(col("sh_a"), col("sh_b"))))
      .filter(col("jaccard") >= minJaccard)
      .select("id_a", "id_b", "jaccard")
  }

  /**
   * SimHash near-dup candidate pairs within Hamming distance
   * `maxHamming` (<= 3 guaranteed found with 4 chunks by pigeonhole).
   */
  def simHashNearDupPairs(df: DataFrame, idCol: String, textCol: String,
      maxHamming: Int = 3, seed: Long = 42L): DataFrame = {
    val withSim = df.select(col(idCol).as("id"),
      simhash(TextAnalysis.tokens(col(textCol)), seed).as("sim"))
    // 4 16-bit chunks; near-dups share at least one chunk
    val chunked = withSim.select(col("id"), col("sim"),
      explode(array((0 until 4).map(c =>
        struct(lit(c).as("chunk_idx"),
          shiftright(col("sim"), c * 16).bitwiseAND(lit(0xffffL)).as("chunk_val"))): _*))
        .as("chunk"))
      .select(col("id"), col("sim"), col("chunk.chunk_idx"), col("chunk.chunk_val"))
    val a = chunked.select(col("chunk_idx"), col("chunk_val"),
      col("id").as("id_a"), col("sim").as("sim_a"))
    val b = chunked.select(col("chunk_idx"), col("chunk_val"),
      col("id").as("id_b"), col("sim").as("sim_b"))
    a.join(b, Seq("chunk_idx", "chunk_val"))
      .filter(col("id_a") < col("id_b"))
      .dropDuplicates("id_a", "id_b")
      .withColumn("hamming", bit_count(col("sim_a").bitwiseXOR(col("sim_b"))))
      .filter(col("hamming") <= maxHamming)
      .select("id_a", "id_b", "hamming")
  }

  /**
   * Exact n-gram Jaccard similarity pairs via shingle inverted index:
   * explode distinct shingles, self-join on shingle, count common
   * shingles per pair, then Jaccard = common / (|A| + |B| - common).
   * Scales as the classic similarity-join plan (shuffle on shingle);
   * stop-shingle removal (df > maxShingleFreq) bounds the worst bucket.
   */
  def ngramJaccardPairs(df: DataFrame, idCol: String, textCol: String,
      shingleSize: Int = 3, minJaccard: Double = 0.5,
      maxShingleFreq: Long = 1000000L): DataFrame = {
    val sh = df.select(col(idCol).as("id"),
        TextAnalysis.shingles(col(textCol), shingleSize).as("shingles"))
      .filter(size(col("shingles")) > 0)
      .select(col("id"), size(col("shingles")).as("n_sh"),
        explode(col("shingles")).as("shingle"))

    // optional stop-shingle pruning to bound bucket skew at scale
    val pruned = sh.withColumn("df_count",
        count(lit(1)).over(org.apache.spark.sql.expressions.Window.partitionBy("shingle")))
      .filter(col("df_count") <= maxShingleFreq)
      .drop("df_count")

    if (minJaccard < 0.4) {
      // Low threshold: prefixes would keep most shingles (prefix len =
      // |S| - ceil(t|S|) + 1), so candidate generation saves little and
      // array-based verification costs more than counting. The
      // inverted-index + groupBy-count plan never materializes arrays
      // in the join — each matched shingle is one narrow row, and the
      // aggregation does the verification.
      val a = pruned.select(col("shingle"), col("id").as("id_a"), col("n_sh").as("n_a"))
      val b = pruned.select(col("shingle"), col("id").as("id_b"), col("n_sh").as("n_b"))
      a.join(b, Seq("shingle"))
        .filter(col("id_a") < col("id_b"))
        .groupBy("id_a", "id_b", "n_a", "n_b")
        .agg(count(lit(1)).as("common"))
        .withColumn("jaccard", col("common").cast("double") /
          (col("n_a") + col("n_b") - col("common")))
        .filter(col("jaccard") >= minJaccard)
        .select("id_a", "id_b", "jaccard")
    } else {
      // Prefix filtering (SSJoin/PPJoin family, Chaudhuri et al. 2006 /
      // Xiao et al. 2008): under a global rarest-first shingle order,
      // any pair with Jaccard >= t must share a shingle within each
      // side's first (|S| - ceil(t*|S|) + 1) shingles. Only prefixes
      // join, collapsing the candidate space from sum(df^2) over ALL
      // shingles to the rare-shingle prefixes.
      val w = org.apache.spark.sql.expressions.Window.partitionBy("shingle")
      val ranked = pruned
        .withColumn("df_count", count(lit(1)).over(w))
        .withColumn("rn", row_number().over(
          org.apache.spark.sql.expressions.Window.partitionBy("id")
            .orderBy(col("df_count").asc, col("shingle").asc)))
        .withColumn("prefix_len",
          col("n_sh") - ceil(col("n_sh") * minJaccard).cast("int") + 1)
      val prefix = ranked.filter(col("rn") <= col("prefix_len"))
        .select(col("shingle"), col("id"))

      val candidates = prefix.join(
          prefix.select(col("shingle"), col("id").as("id_b")), Seq("shingle"))
        .filter(col("id") < col("id_b"))
        .select(col("id").as("id_a"), col("id_b"))
        .dropDuplicates("id_a", "id_b")

      // exact verification on candidates via the full shingle arrays
      val arrays = df.select(col(idCol).as("id"),
          TextAnalysis.shingles(col(textCol), shingleSize).as("shingles"))
        .filter(size(col("shingles")) > 0)
      candidates
        .join(arrays.select(col("id").as("id_a"), col("shingles").as("sh_a")), Seq("id_a"))
        .join(arrays.select(col("id").as("id_b"), col("shingles").as("sh_b")), Seq("id_b"))
        .withColumn("jaccard",
          size(array_intersect(col("sh_a"), col("sh_b"))).cast("double") /
            size(array_union(col("sh_a"), col("sh_b"))))
        .filter(col("jaccard") >= minJaccard)
        .select("id_a", "id_b", "jaccard")
    }
  }

  /**
   * Embedding cosine near-duplicate pairs. Candidate generation via
   * random-hyperplane LSH sign-buckets (same family as the reference's
   * LSH index, indexes.py:86-101); exact cosine verification on
   * candidates. `bruteForce = true` skips bucketing (exact, O(n^2) —
   * only for oracle-scale data).
   */
  def embeddingNearDupPairs(df: DataFrame, idCol: String, embCol: String,
      minCosine: Double = 0.95, bruteForce: Boolean = false,
      numTables: Int = 8, bitsPerTable: Int = 8, dim: Int = 64,
      seed: Long = 42L): DataFrame = {
    val a = df.select(col(idCol).as("id_a"), col(embCol).as("emb_a"))
    val b = df.select(col(idCol).as("id_b"), col(embCol).as("emb_b"))
    val candidates =
      if (bruteForce) a.crossJoin(b).filter(col("id_a") < col("id_b"))
      else {
        val lsh = graft.index.LshModel(numTables, bitsPerTable, dim, seed)
        val withBucket = df.select(col(idCol).as("id"), col(embCol).as("emb"),
          explode(lsh.bucketsColumn(col(embCol))).as("bucket"))
        val l = withBucket.select(col("bucket"), col("id").as("id_a"), col("emb").as("emb_a"))
        val r = withBucket.select(col("bucket"), col("id").as("id_b"), col("emb").as("emb_b"))
        l.join(r, Seq("bucket")).filter(col("id_a") < col("id_b"))
          .dropDuplicates("id_a", "id_b")
      }
    candidates
      .withColumn("cosine", GraftFunctions.cosine_sim(col("emb_a"), col("emb_b")))
      .filter(col("cosine") >= minCosine)
      .select("id_a", "id_b", "cosine")
  }
}
