package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.operators.Dedup

/**
 * Streaming corpus curation pieces: near-dup flagging of a document
 * STREAM against a static, already-banded corpus signature table — the
 * online mirror of `Dedup.incrementalMinHashPairs`. Each micro-batch
 * doc shingles, minhashes, and bands exactly like the batch operator
 * (same seed => same buckets), then stream-static inner-joins the
 * corpus table on (band, bucket). A stream-static equi-join needs no
 * watermark and holds no stream state; the corpus side is a plain
 * DataFrame that Spark re-reads per micro-batch — persist it (or back
 * it by the IndexStore bucket layout) so each batch pays a lookup, not
 * a rebuild.
 *
 * Emits one row per (doc, corpus doc, band) collision; callers
 * aggregate/distinct downstream (kept un-aggregated here so the result
 * stays append-mode streamable) and exact-verify the few candidates.
 */
object CorpusStream {

  def nearDupFlagStream(docs: DataFrame, corpusBanded: DataFrame,
      idCol: String, textCol: String, shingleSize: Int = 3,
      numHashes: Int = 64, bands: Int = 16, seed: Long = 42L): DataFrame = {
    val streamBanded = Dedup.minHashBanded(docs, idCol, textCol,
      shingleSize, numHashes, bands, seed)
    streamBanded
      .join(corpusBanded
          .withColumnRenamed("id", "corpus_id"),
        Seq("band", "bucket"))
      .select(col("id"), col("corpus_id"), col("band"))
  }
}
