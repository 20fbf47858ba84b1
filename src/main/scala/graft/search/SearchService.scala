package graft.search

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.catalog.{IndexType, VectorCatalog}
import graft.functions.GraftFunctions._
import graft.model._

/**
 * Search orchestration replicating the reference's
 * `SearchService.search_library` order of operations
 * (search_service.py:24-77 / SURVEY.md §2.10 Q4):
 *
 *   1. validate query (text XOR embedding)         models.py:116-120
 *   2. library must exist                          search_service.py:37-39
 *   3. clamp k                                     config.py:62-68
 *   4. resolve embedding (pass-through or embed)   search_service.py:79-86
 *   5. PRE-filter chunk universe by metadata, then
 *      the index search POST-filters its candidates
 *      against that universe                       search_service.py:98-110
 *   6. exact cosine rerank -> top-k, timed         indexes.py:162-168
 *
 * Post-filter semantics preserved deliberately: with a selective filter
 * an ANN index may return < k rows even when k matches exist — that is
 * the reference's observable behavior (SURVEY.md §7 risk register).
 * Edge semantics preserved: IVF untrained => empty (indexes.py:343);
 * LSH zero candidates => full-scan fallback (indexes.py:151-153).
 */
final class SearchService(catalog: VectorCatalog) {

  def search(libraryId: String, query: SearchQuery): Either[ApiError, SearchResponse] =
    for {
      q <- query.validated
      _ <- catalog.getLibrary(libraryId)
    } yield {
      val t0 = System.nanoTime()
      val k = GraftConfig.clampK(q.k)
      val queryVec = q.queryEmbedding.getOrElse(catalog.embedder.embedOne(q.queryText.get))

      // (5) metadata pre-filter defines the chunk universe
      val universe = catalog.chunksFiltered(libraryId, q.metadataFilters)
        .filter(col("embedding").isNotNull)

      val results = catalog.indexState(libraryId).map(_.indexType) match {
        case Some(IndexType.Lsh) if catalog.indexState(libraryId).exists(_.signatures.isDefined) =>
          lshSearch(libraryId, universe, queryVec, k)
        case Some(IndexType.Ivf) =>
          ivfSearch(libraryId, universe, queryVec, k)
        case Some(IndexType.Hnsw) if catalog.indexState(libraryId).exists(_.hnsw.isDefined) =>
          hnswSearch(libraryId, universe, queryVec, k)
        case Some(IndexType.IvfPq) =>
          ivfPqSearch(libraryId, universe, queryVec, k)
        case Some(IndexType.Binary) if catalog.indexState(libraryId).exists(_.signatures.isDefined) =>
          binarySearch(libraryId, universe, queryVec, k)
        case _ => // exact index type, or index never built => brute force
          exactTopK(universe, queryVec, k)
      }
      val ms = (System.nanoTime() - t0) / 1e6
      SearchResponse(results, results.size, ms)
    }

  /** Q1 exact: cosine + euclid, deterministic tiebreak (desc score, asc id). */
  private def exactTopK(universe: DataFrame, queryVec: Array[Float], k: Int): Seq[SearchResult] =
    collectResults(universe
      .withColumn("similarity_score", cosine_sim(col("embedding"), typedLit(queryVec)))
      .withColumn("distance", euclidean_dist(col("embedding"), typedLit(queryVec)))
      .orderBy(col("similarity_score").desc, col("id").asc)
      .limit(k))

  /** Q2: bucket-join candidates; an EMPTY CANDIDATE SET falls back to a
    * full scan (indexes.py:151-153 — the fallback fires before the
    * universe membership check, so a non-empty candidate set that the
    * metadata post-filter eliminates correctly returns < k rows, it
    * does NOT fall back). */
  private def lshSearch(libraryId: String, universe: DataFrame,
      queryVec: Array[Float], k: Int): Seq[SearchResult] = {
    val state = catalog.indexState(libraryId).get
    // flips=0 is exactly the reference's single-probe candidates;
    // >0 adds Lv-et-al multi-probe buckets (opt-in, GraftConfig —
    // either the explicit flips knob or the active recall preset)
    val flips = GraftConfig.lshActivePreset.map(_.flips)
      .getOrElse(GraftConfig.lshMultiProbeFlips)
    val candidates = state.lsh.get.multiProbeCandidates(
      state.signatures.get, queryVec, flips)
    if (candidates.isEmpty) exactTopK(universe, queryVec, k)
    else exactTopK(universe.join(candidates, Seq("id"), "left_semi"), queryVec, k)
  }

  /** Q3: probe nprobe clusters; untrained => empty (indexes.py:343). */
  private def ivfSearch(libraryId: String, universe: DataFrame,
      queryVec: Array[Float], k: Int): Seq[SearchResult] = {
    val state = catalog.indexState(libraryId).get
    state.ivf match {
      case None => Seq.empty // untrained IVF returns no results
      case Some(model) =>
        val probed = model.candidates(state.assigned.get, queryVec).select("id")
        val candidateChunks = universe.join(probed, Seq("id"), "left_semi")
        exactTopK(candidateChunks, queryVec, k)
    }
  }

  /** HNSW tier: graph navigation proposes a candidate set (fetch factor
    * 4k, floor 50 — the two-tier contract: graph error is removed by
    * the exact rerank below), then the same post-filter + exact-cosine
    * top-k as every other index path. The graph covers all indexed
    * chunks, so like IVF a selective metadata filter may return < k —
    * the reference's observable post-filter semantics. */
  private def hnswSearch(libraryId: String, universe: DataFrame,
      queryVec: Array[Float], k: Int): Seq[SearchResult] = {
    val hs = catalog.indexState(libraryId).get.hnsw.get
    val fetch = math.max(4 * k, 50)
    val candIds = hs.graph.search(queryVec, fetch, ef = math.max(100, fetch))
      .map { case (node, _) => hs.chunkIds(node.toInt) }
    exactTopK(universe.filter(col("id").isin(candIds: _*)), queryVec, k)
  }

  /** IVF-PQ tier: residual-ADC candidate generation over the encoded
    * codes (probe nprobe cells, fetch 4k floor 50), exact cosine
    * rerank over the survivors. Untrained (below the nlist threshold
    * at build) => empty, exactly like plain IVF. */
  private def ivfPqSearch(libraryId: String, universe: DataFrame,
      queryVec: Array[Float], k: Int): Seq[SearchResult] = {
    catalog.indexState(libraryId).get.ivfpq match {
      case None => Seq.empty // untrained: reference IVF semantics
      case Some(s) =>
        val fetch = math.max(4 * k, 50)
        val cands = s.candidatesWith(queryVec,
          nprobe = GraftConfig.ivfNprobe, n = fetch).select("id")
        exactTopK(universe.join(cands, Seq("id"), "left_semi"), queryVec, k)
    }
  }

  /** Binary sign-quantization tier: Hamming top-C over the packed
    * signature table (integer distance, id tiebreak — a per-partition
    * heap over 8-byte-per-64-dims rows, the cheapest prefilter scan of
    * any tier), then the shared post-filter + exact-cosine top-k. The
    * candidate set is never empty for a non-empty index (every indexed
    * chunk has a signature), so there is no LSH-style fallback. */
  private def binarySearch(libraryId: String, universe: DataFrame,
      queryVec: Array[Float], k: Int): Seq[SearchResult] = {
    val state = catalog.indexState(libraryId).get
    // n-proportional candidate budget: 1-bit/dim signatures lose
    // recall at FIXED C as the corpus grows (measured curve in
    // GraftConfig.binaryCandidateFraction's doc). The count was
    // captured when the cached table was materialized at
    // build/refresh/restore — no Spark job on the search hot path.
    val n = state.sigCount.getOrElse(state.signatures.get.count())
    val fetch = math.max(math.max(4 * k, 64),
      math.ceil(n * GraftConfig.binaryCandidateFraction).toInt)
    val qSig = graft.index.BinaryQuant.pack(queryVec)
    val cands = state.signatures.get
      .withColumn("ham", hamming_dist(col("sig"), typedLit(qSig.toSeq)))
      .orderBy(col("ham").asc, col("id").asc)
      .limit(fetch)
      .select("id")
    exactTopK(universe.join(cands, Seq("id"), "left_semi"), queryVec, k)
  }

  private def collectResults(df: DataFrame): Seq[SearchResult] = {
    import df.sparkSession.implicits._
    df.select(col("id"), col("document_id"), col("library_id"), col("text"),
        col("embedding"), col("metadata"), col("created_at"), col("updated_at"),
        col("similarity_score"), col("distance"))
      .collect()
      .map { r =>
        val chunk = ChunkRow(r.getString(0), r.getString(1), r.getString(2), r.getString(3),
          Option(r.getAs[scala.collection.Seq[Float]]("embedding")).map(_.toArray),
          Option(r.getAs[scala.collection.Map[String, String]]("metadata")).map(_.toMap).getOrElse(Map.empty),
          r.getTimestamp(6), r.getTimestamp(7))
        SearchResult(chunk, r.getDouble(8), r.getDouble(9))
      }.toSeq
  }
}
