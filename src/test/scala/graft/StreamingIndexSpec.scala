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
}
