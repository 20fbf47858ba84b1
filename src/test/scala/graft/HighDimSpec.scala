package graft

import org.apache.spark.sql.functions._

import graft.functions.{Embedder, HashingEmbedder}
import graft.index.LshModel
import graft.operators.Similarity

/** Reference-scale embedding dimension (1024, config.py:20): the fixture
  * embeddings are 64-dim, so this suite builds a 1024-dim corpus from
  * the documents text via the distributed embedder UDF and exercises
  * exact kNN + LSH end-to-end at the reference's width. */
class HighDimSpec extends SparkSpec {
  import spark.implicits._

  private val dim = 1024

  private lazy val corpus = {
    val e = HashingEmbedder(dimension = dim)
    val embed = Embedder.embedColumn(e)
    spark.read.parquet(s"$sfDir/documents.parquet")
      .select(col("doc_id"), embed(col("text")).as("embedding"))
      .cache()
  }

  test("1024-dim embeddings: distributed embed + exact kNN") {
    assert(corpus.select(size(col("embedding"))).distinct().as[Int].head() == dim)
    val q = corpus.filter(col("doc_id") === 0).select("embedding")
      .collect()(0).getSeq[Float](0).toArray
    val top = Similarity.knnExact(corpus, "doc_id", "embedding", q, 5)
      .select("doc_id", "score").as[(Long, Double)].collect()
    assert(top.head._1 == 0L) // self is nearest
    assert(math.abs(top.head._2 - 1.0) < 1e-9)
    assert(top.map(_._2).sliding(2).forall(s => s.head >= s.last))
  }

  test("1024-dim LSH: reference-shaped parameters (8 tables x 12 bits)") {
    val lsh = LshModel(numTables = 8, bitsPerTable = 12, dim = dim)
    val sigs = lsh.build(corpus, "doc_id", "embedding")
    assert(sigs.count() == corpus.count() * 8)
    val q = corpus.filter(col("doc_id") === 1).select("embedding")
      .collect()(0).getSeq[Float](0).toArray
    val cands = lsh.candidates(sigs, q).collect().map(_.getLong(0)).toSet
    assert(cands.contains(1L)) // identical vector collides in all tables
  }
}
