package graft

import graft.api.{JsonCodec, VectorDb}
import graft.model._

/** The 18-endpoint facade end-to-end, mirroring tests/test_basic.py
  * scenarios plus the JSON filter boundary (V8/V9). */
class ApiSpec extends SparkSpec {

  test("full happy path: library -> document -> chunks -> index -> search (test_basic.py:175-223)") {
    val db = new VectorDb(spark)
    assert(db.health()("status") == "healthy")
    assert(db.info().contains("engine"))

    val lib = db.createLibrary("Programming", Some("code docs"),
      Map("category" -> "tech"), indexType = "lsh").toOption.get
    val doc = db.createDocument(lib.id, "Languages").toOption.get
    Seq(
      ("python is a programming language", Map("topic" -> "python")),
      ("java is also a programming language", Map("topic" -> "java")),
      ("cats are cute animals", Map("topic" -> "animals")),
      ("spark processes data at scale", Map("topic" -> "data"))
    ).foreach { case (t, m) => assert(db.createChunk(doc.id, t, m).isRight) }

    assert(db.indexLibrary(lib.id, "lsh").isRight)
    val resp = db.simpleSearch(lib.id, "programming", k = 2).toOption.get
    assert(resp.results.size <= 2 && resp.results.nonEmpty)
    assert(resp.executionTimeMs > 0)

    // chunk listing endpoints
    assert(db.chunksByDocument(doc.id).toOption.get.size == 4)
    assert(db.chunksByLibrary(lib.id).toOption.get.size == 4)
    assert(db.chunksByDocument("missing").isLeft)

    // filter endpoint with JSON boundary
    val filtered = db.chunksByMetadataJson(lib.id, """{"topic": "python"}""").toOption.get
    assert(filtered.size == 1 && filtered.head.text.contains("python"))

    // index type switch (test_basic.py:225-268)
    assert(db.indexLibrary(lib.id, "ivf").isRight)
    assert(db.indexLibrary(lib.id, "exact").isRight)
    assert(db.indexLibrary(lib.id, "bogus").isLeft)
  }

  test("bad filter JSON => 400-style validation error (search.py:34-40)") {
    val db = new VectorDb(spark)
    val lib = db.createLibrary("L").toOption.get
    assert(db.simpleSearch(lib.id, "q", 5, Some("not json")).isLeft)
    assert(db.chunksByMetadataJson(lib.id, "[1,2]").isLeft)
    assert(JsonCodec.parseFilter("""{"a": 1, "b": "x", "c": true}""").toOption.get ==
      Map("a" -> "1", "b" -> "x", "c" -> "true")) // str() coercion
  }

  test("search response JSON shape (models.py:123-135)") {
    val db = new VectorDb(spark)
    val lib = db.createLibrary("L", indexType = "exact").toOption.get
    val doc = db.createDocument(lib.id, "D").toOption.get
    db.createChunk(doc.id, "hello world", Map("k" -> "v"))
    val resp = db.search(lib.id, SearchQuery(queryText = Some("hello"), k = 1)).toOption.get
    val json = JsonCodec.searchResponseJson(resp)
    assert(json.contains("\"total_results\":1"))
    assert(json.contains("\"similarity_score\""))
    assert(json.contains("\"execution_time_ms\""))
    assert(json.contains("\"metadata\":{\"k\":\"v\"}"))
    // ISO timestamps (V9)
    assert(json.contains("T") && json.contains("\"created_at\""))
  }
}
