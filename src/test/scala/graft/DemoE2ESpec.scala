package graft

import graft.api.VectorDb
import graft.model.SearchQuery

/** The reference's demo flow (demo.py:53-241) through the facade:
  * topic corpus -> index -> semantic search -> metadata-filtered search
  * (incl. created_after), asserted by containment against exact search
  * (§5.5 of the SURVEY test plan). Plus a CRUD stress run long enough
  * to cross the catalog's compaction threshold. */
class DemoE2ESpec extends SparkSpec {

  test("demo corpus: semantic + filtered search through the facade") {
    val db = new VectorDb(spark)
    val lib = db.createLibrary("Knowledge Base", Some("demo"),
      Map("category" -> "technology", "language" -> "en")).toOption.get

    val corpus = Map(
      "Python Programming" -> Seq(
        ("python is a high level programming language", Map("topic" -> "python", "chunk_index" -> "0")),
        ("python has simple syntax and dynamic typing", Map("topic" -> "python", "chunk_index" -> "1"))),
      "Machine Learning" -> Seq(
        ("machine learning trains models on data", Map("topic" -> "ml", "chunk_index" -> "0")),
        ("neural networks learn hierarchical features", Map("topic" -> "ml", "chunk_index" -> "1"))),
      "Databases" -> Seq(
        ("databases store and index structured data", Map("topic" -> "databases", "chunk_index" -> "0")),
        ("vector databases search by embedding similarity", Map("topic" -> "databases", "chunk_index" -> "1"))))
    corpus.foreach { case (docName, chunks) =>
      val doc = db.createDocument(lib.id, docName).toOption.get
      db.catalog.createChunks(doc.id, chunks)
    }
    db.indexLibrary(lib.id, "lsh")

    // semantic search (demo.py:182-187 analog)
    val resp = db.simpleSearch(lib.id, "programming language", k = 3).toOption.get
    assert(resp.results.nonEmpty)
    // top hit should be a python chunk for this query with this embedder
    assert(resp.results.head.chunk.metadata("topic") == "python")

    // metadata-filtered search (demo.py:223-241 analog)
    val filtered = db.search(lib.id, SearchQuery(queryText = Some("data"),
      k = 5, metadataFilters = Map("topic" -> "databases"))).toOption.get
    assert(filtered.results.nonEmpty)
    assert(filtered.results.forall(_.chunk.metadata("topic") == "databases"))

    // created_after filter: everything was created "now", so a past
    // cutoff keeps all and a future cutoff keeps none
    val past = db.search(lib.id, SearchQuery(queryText = Some("data"), k = 10,
      metadataFilters = Map("created_after" -> "2020-01-01"))).toOption.get
    val future = db.search(lib.id, SearchQuery(queryText = Some("data"), k = 10,
      metadataFilters = Map("created_after" -> "2100-01-01"))).toOption.get
    assert(past.results.nonEmpty)
    assert(future.results.isEmpty)

    // filtered results are a subset of the unfiltered exact ranking
    val all = db.search(lib.id, SearchQuery(queryText = Some("data"), k = 10)).toOption.get
    val allIds = all.results.map(_.chunk.id).toSet
    assert(filtered.results.map(_.chunk.id).toSet.subsetOf(allIds))
  }

  test("sustained CRUD crosses the compaction threshold and stays consistent") {
    val db = new VectorDb(spark)
    val lib = db.createLibrary("L", indexType = "exact").toOption.get
    val doc = db.createDocument(lib.id, "D").toOption.get
    val ids = (1 to 70).map { i =>
      db.createChunk(doc.id, s"chunk number $i about topic ${i % 7}").toOption.get.id
    }
    // deletes + updates push past compactEvery=64 mutations
    ids.take(5).foreach(id => assert(db.deleteChunk(id).isRight))
    ids.slice(5, 10).foreach(id =>
      assert(db.updateChunk(id, text = Some("rewritten text")).isRight))
    assert(db.catalog.chunks.count() == 65)
    val resp = db.simpleSearch(lib.id, "rewritten", k = 3).toOption.get
    assert(resp.results.nonEmpty)
    assert(resp.results.head.chunk.text == "rewritten text")
  }
}
