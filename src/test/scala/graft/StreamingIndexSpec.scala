package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.types.{StringType, StructField, StructType}

import graft.catalog.VectorCatalog
import graft.model.SearchQuery
import graft.search.SearchService

/**
 * Streaming incremental ANN index maintenance, end to end: arriving
 * chunk micro-batches (a file-source stream, the production landing
 * pattern) drive `VectorCatalog.refreshIndex` from `foreachBatch`, and
 * a search issued AFTER each batch sees the streamed chunks — without
 * a full index rebuild, which the assertions pin down directly:
 * the LSH model object and the seed chunks' signature rows are
 * untouched, and IVF centroids stay bit-identical (the reference's
 * never-retrain contract, indexes.py:280).
 */
class StreamingIndexSpec extends SparkSpec {

  private val arrivalSchema = StructType(Seq(StructField("text", StringType)))

  /** Run `arrivalBatches` through a parquet file stream; after each
    * batch lands, `afterBatch` runs with the number of batches so far. */
  private def streamArrivals(arrivalBatches: Seq[Seq[String]],
      onBatch: DataFrame => Unit)(afterBatch: Int => Unit): Unit = {
    val staging = java.nio.file.Files.createTempDirectory("graft-arrivals").toString
    val stream = spark.readStream.schema(arrivalSchema).parquet(staging)
    val q = stream.writeStream
      .foreachBatch { (batch: DataFrame, _: Long) => onBatch(batch) }
      .start()
    try {
      arrivalBatches.zipWithIndex.foreach { case (texts, i) =>
        import spark.implicits._
        texts.toDF("text").coalesce(1).write.mode("append").parquet(staging)
        q.processAllAvailable()
        afterBatch(i + 1)
      }
    } finally q.stop()
  }

  test("LSH: streamed arrivals refresh the index; search sees them, seed rows untouched") {
    val cat = new VectorCatalog(spark)
    val svc = new SearchService(cat)
    val lib = cat.createLibrary("L", indexType = "lsh").toOption.get
    val doc = cat.createDocument(lib.id, "D").toOption.get
    cat.createChunks(doc.id,
      (1 to 5).map(i => (s"seed chunk number $i about databases", Map.empty[String, String])))
    cat.indexLibrary(lib.id, "lsh")
    val st0 = cat.indexState(lib.id).get
    val modelBefore = st0.lsh.get
    val seedSigs = st0.signatures.get.collect().map(_.toSeq).toSet
    assert(seedSigs.nonEmpty)

    val batches = Seq(
      Seq("streamed zeppelin quasar", "streamed nebula fjord"),
      Seq("streamed obsidian whirlwind"))
    val newIds = scala.collection.mutable.ArrayBuffer.empty[String]

    streamArrivals(batches, { batch =>
      // foreachBatch runs on the driver: ingest the micro-batch through
      // the catalog (which embeds), then reconcile the index delta
      batch.collect().foreach { r =>
        newIds += cat.createChunk(doc.id, r.getString(0)).toOption.get.id
      }
      assert(cat.indexStale(lib.id))
      cat.refreshIndex(lib.id)
      ()
    }) { nBatches =>
      val st = cat.indexState(lib.id).get
      assert(!cat.indexStale(lib.id))
      // no rebuild: same model object (stateless hyperplanes never
      // re-derived), and the seed chunks' signature rows are identical
      assert(st.lsh.get eq modelBefore)
      val sigs = st.signatures.get.collect().map(_.toSeq).toSet
      assert(seedSigs.subsetOf(sigs), "seed signature rows changed on refresh")
      // index-level visibility: every streamed chunk has signature rows
      val sigIds = sigs.map(_.head.asInstanceOf[String])
      newIds.foreach(id => assert(sigIds.contains(id), s"chunk $id missing from index"))
      // e2e search visibility through the refreshed index
      val probe = if (nBatches == 1) "nebula fjord" else "obsidian whirlwind"
      val resp = svc.search(lib.id, SearchQuery(queryText = Some(probe), k = 1)).toOption.get
      assert(newIds.contains(resp.results.head.chunk.id))
    }
  }

  test("IVF: streamed arrivals assign with existing centroids; search sees them") {
    val cat = new VectorCatalog(spark)
    val svc = new SearchService(cat)
    val lib = cat.createLibrary("L", indexType = "ivf").toOption.get
    val doc = cat.createDocument(lib.id, "D").toOption.get
    // enough seed chunks to cross the train threshold (nlist)
    cat.createChunks(doc.id,
      (1 to 110).map(i => (s"seed document number $i with plain words", Map.empty[String, String])))
    cat.indexLibrary(lib.id, "ivf")
    val st0 = cat.indexState(lib.id).get
    assert(st0.ivf.isDefined)
    val centroidsBefore = st0.ivf.get.centroids.map(_.toSeq).toSeq
    val assignedBefore = st0.assigned.get.count()

    val streamedText = "streamed chrysanthemum observatory"
    var streamedId: String = null

    streamArrivals(Seq(Seq(streamedText)), { batch =>
      batch.collect().foreach { r =>
        streamedId = cat.createChunk(doc.id, r.getString(0)).toOption.get.id
      }
      cat.refreshIndex(lib.id)
      ()
    }) { _ =>
      val st = cat.indexState(lib.id).get
      // never-retrain: centroids bit-identical after the streamed batch
      assert(st.ivf.get.centroids.map(_.toSeq).toSeq == centroidsBefore)
      assert(st.assigned.get.count() == assignedBefore + 1)
      // the query embeds to the streamed chunk's own vector, so its
      // nearest centroid is the chunk's assigned cell: k=1 must hit it
      val resp = svc.search(lib.id, SearchQuery(queryText = Some(streamedText), k = 1)).toOption.get
      assert(resp.results.head.chunk.id == streamedId)
    }
  }

  test("semDedupIngestStream: keep-decisions identical to the sequential batch fold") {
    import org.apache.spark.sql.functions._
    import spark.implicits._
    val dim = 8
    val rnd = new scala.util.Random(7)
    def unit(): Seq[Float] = {
      val v = Array.fill(dim)(rnd.nextGaussian())
      val n = math.sqrt(v.map(x => x * x).sum)
      v.map(x => (x / n).toFloat).toSeq
    }
    // 40 base vectors; 30 arrivals in 3 batches of 10: some exact
    // copies of base rows (must drop as dup-of-existing), some copies
    // of EARLIER-batch arrivals (must drop only if the earlier copy
    // survived and became authoritative — the cross-batch contract a
    // stateless per-batch dedup would miss), the rest fresh
    val baseVecs = (0 until 40).map(i => (i.toLong, unit()))
    val fresh = (0 until 30).map(i => (100L + i, unit()))
    def arrivalRow(i: Int): (Long, Seq[Float]) = {
      if (i % 5 == 0) (100L + i, baseVecs(i % 40)._2)        // dup of base
      else if (i % 5 == 1 && i >= 10) (100L + i, fresh(i - 10)._2) // dup of earlier arrival
      else (100L + i, fresh(i)._2)
    }
    val base = baseVecs.toDF("vec_id", "embedding")
      .withColumn("embedding", col("embedding").cast("array<float>"))
      .localCheckpoint(true)
    val batches = (0 until 3).map(b =>
      (0 until 10).map(j => arrivalRow(b * 10 + j))
        .toDF("vec_id", "embedding")
        .withColumn("embedding", col("embedding").cast("array<float>"))
        .localCheckpoint(true))
    val model = graft.operators.SemDedup.trainModel(base, "embedding", nlist = 4)

    // sequential batch fold — the semantics oracle
    var foldCorpus = base
    val foldSurvivors = scala.collection.mutable.ArrayBuffer.empty[Long]
    batches.foreach { b =>
      val surv = graft.operators.SemDedup.semDedupIncremental(
        foldCorpus, b, "vec_id", "embedding", minCosine = 0.95,
        model = Some(model)).localCheckpoint(true)
      foldSurvivors ++= surv.select("vec_id").collect().map(_.getLong(0))
      foldCorpus = foldCorpus.unionByName(surv)
    }

    // the streaming form over the same splits
    val staging = java.nio.file.Files.createTempDirectory("graft-semdedup-stream").toString
    var corpus = base
    val stream = spark.readStream.schema(base.schema).parquet(staging)
    val q = graft.streaming.CorpusStream.semDedupIngestStream(
      stream, "vec_id", "embedding", model, minCosine = 0.95,
      readCorpus = () => corpus,
      appendSurvivors = surv => corpus = corpus
        .unionByName(surv.select("vec_id", "embedding")).localCheckpoint(true))
    try batches.foreach { b =>
      b.coalesce(1).write.mode("append").parquet(staging)
      q.processAllAvailable()
    } finally q.stop()
    val streamSurvivors = corpus.join(base.select("vec_id"), Seq("vec_id"), "left_anti")
      .select("vec_id").collect().map(_.getLong(0)).toSet

    assert(streamSurvivors == foldSurvivors.toSet,
      s"stream vs fold keep-sets differ: " +
        s"only-stream=${streamSurvivors -- foldSurvivors.toSet} " +
        s"only-fold=${foldSurvivors.toSet -- streamSurvivors}")
    // the contract is non-trivial on this fixture: some arrivals
    // dropped (dups) and some survived (fresh)
    assert(streamSurvivors.nonEmpty && streamSurvivors.size < 30)
    // exact dups of base never survive
    val baseDupIds = (0 until 30).filter(_ % 5 == 0).map(100L + _).toSet
    assert((streamSurvivors & baseDupIds).isEmpty, "dup-of-base survived")
  }

  test("semDedupIngestStream: corpus deletes between triggers match the sequential fold") {
    import org.apache.spark.sql.functions._
    import spark.implicits._
    val dim = 8
    val rnd = new scala.util.Random(11)
    def unit(): Seq[Float] = {
      val v = Array.fill(dim)(rnd.nextGaussian())
      val n = math.sqrt(v.map(x => x * x).sum)
      v.map(x => (x / n).toFloat).toSeq
    }
    val baseVecs = (0 until 20).map(i => (i.toLong, unit()))
    val base = baseVecs.toDF("vec_id", "embedding")
      .withColumn("embedding", col("embedding").cast("array<float>"))
      .localCheckpoint(true)
    // batch 1: a dup of base 3 (drops) + one fresh row; then base rows
    // 3 and 5 are DELETED (takedown) before batch 2, which re-arrives
    // both deleted vectors (must now SURVIVE — the suppressing corpus
    // rows are gone), plus a dup of the still-present base 7 (drops)
    // and a fresh row. Deletes are corpus-table mutations applied
    // between triggers; readCorpus() picks them up at the next trigger,
    // so the streaming form needs no delete-aware operator — the
    // contract under test is that this equals the sequential fold with
    // the SAME delete applied at the SAME batch boundary.
    val fresh = (0 until 2).map(_ => unit())
    val batch1 = Seq((100L, baseVecs(3)._2), (101L, fresh(0)))
      .toDF("vec_id", "embedding")
      .withColumn("embedding", col("embedding").cast("array<float>"))
      .localCheckpoint(true)
    val batch2 = Seq((102L, baseVecs(3)._2), (103L, baseVecs(5)._2),
        (104L, baseVecs(7)._2), (105L, fresh(1)))
      .toDF("vec_id", "embedding")
      .withColumn("embedding", col("embedding").cast("array<float>"))
      .localCheckpoint(true)
    val model = graft.operators.SemDedup.trainModel(base, "embedding", nlist = 4)
    def deleteRows(corpus: DataFrame): DataFrame =
      corpus.filter(!col("vec_id").isin(3L, 5L)).localCheckpoint(true)

    // sequential fold with the delete at the batch-1/batch-2 boundary
    var foldCorpus = base
    def foldStep(b: DataFrame): Set[Long] = {
      val surv = graft.operators.SemDedup.semDedupIncremental(
        foldCorpus, b, "vec_id", "embedding", minCosine = 0.95,
        model = Some(model)).localCheckpoint(true)
      foldCorpus = foldCorpus.unionByName(surv)
      surv.select("vec_id").collect().map(_.getLong(0)).toSet
    }
    val foldS1 = foldStep(batch1)
    foldCorpus = deleteRows(foldCorpus)
    val foldS2 = foldStep(batch2)

    // streaming form over the same splits with the same delete
    val staging = java.nio.file.Files.createTempDirectory("graft-semdedup-del").toString
    var corpus = base
    val stream = spark.readStream.schema(base.schema).parquet(staging)
    val q = graft.streaming.CorpusStream.semDedupIngestStream(
      stream, "vec_id", "embedding", model, minCosine = 0.95,
      readCorpus = () => corpus,
      appendSurvivors = surv => corpus = corpus
        .unionByName(surv.select("vec_id", "embedding")).localCheckpoint(true))
    try {
      batch1.coalesce(1).write.mode("append").parquet(staging)
      q.processAllAvailable()
      corpus = deleteRows(corpus)
      batch2.coalesce(1).write.mode("append").parquet(staging)
      q.processAllAvailable()
    } finally q.stop()
    val streamSurvivors = corpus.select("vec_id")
      .filter(col("vec_id") >= 100L).collect().map(_.getLong(0)).toSet

    assert(streamSurvivors == foldS1 ++ foldS2,
      s"stream=$streamSurvivors fold=${foldS1 ++ foldS2}")
    // the delete contract is non-trivial on this fixture
    assert(!streamSurvivors.contains(100L), "dup of then-present base 3 survived batch 1")
    assert(streamSurvivors.contains(102L), "re-arrival of DELETED base 3 was wrongly dropped")
    assert(streamSurvivors.contains(103L), "re-arrival of DELETED base 5 was wrongly dropped")
    assert(!streamSurvivors.contains(104L), "dup of still-present base 7 survived")
  }

  test("SemDedupIngestSink: a re-delivered batchId is skipped (idempotent append)") {
    import org.apache.spark.sql.functions._
    import spark.implicits._
    val dim = 8
    val rnd = new scala.util.Random(13)
    def unit(): Seq[Float] = {
      val v = Array.fill(dim)(rnd.nextGaussian())
      val n = math.sqrt(v.map(x => x * x).sum)
      v.map(x => (x / n).toFloat).toSeq
    }
    val base = (0 until 12).map(i => (i.toLong, unit()))
      .toDF("vec_id", "embedding")
      .withColumn("embedding", col("embedding").cast("array<float>"))
      .localCheckpoint(true)
    val batch = (0 until 3).map(i => (50L + i, unit()))
      .toDF("vec_id", "embedding")
      .withColumn("embedding", col("embedding").cast("array<float>"))
      .localCheckpoint(true)
    val model = graft.operators.SemDedup.trainModel(base, "embedding", nlist = 2)
    var corpus = base
    var appends = 0
    val sink = new graft.streaming.CorpusStream.SemDedupIngestSink(
      "vec_id", "embedding", model, minCosine = 0.95,
      readCorpus = () => corpus,
      appendSurvivors = surv => {
        appends += 1
        corpus = corpus.unionByName(surv.select("vec_id", "embedding"))
          .localCheckpoint(true)
      })
    assert(sink.process(batch, 0L), "first delivery must process")
    val afterFirst = corpus.count()
    // foreachBatch re-delivery after a failure: same batchId again
    assert(!sink.process(batch, 0L), "re-delivered batchId must be skipped")
    assert(corpus.count() == afterFirst, "re-delivery double-appended survivors")
    assert(appends == 1)
    assert(sink.process(batch, 1L), "the next batchId proceeds")
  }
}
