package graft.queries

import org.apache.spark.sql.functions._

import graft.filter.MetadataFilter
import graft.functions.GraftFunctions._

/**
 * The vector-DB read path (SURVEY.md §3.1) exercised as a data query:
 * documents.parquet joined 1:1 with embeddings.parquet plays the chunks
 * table (text + embedding + MAP metadata), the filter DSL compiles the
 * reference's four predicate forms (F1), and exact kNN runs over the
 * filtered universe. This is the oracle-checkable mirror of
 * SearchService (whose CRUD/index surface is covered in ScalaTest).
 */
object HierarchyQueries {
  import Tables.table

  private val cosSql =
    "list_dot_product(CAST(e.embedding AS DOUBLE[]), CAST(q.qe AS DOUBLE[])) / " +
      "(sqrt(list_dot_product(CAST(e.embedding AS DOUBLE[]), CAST(e.embedding AS DOUBLE[]))) * " +
      "sqrt(list_dot_product(CAST(q.qe AS DOUBLE[]), CAST(q.qe AS DOUBLE[]))))"

  def defs: Seq[QueryDef] = Seq(

    QueryDef("q50_filtered_search", Some(
      s"""SELECT d.doc_id, d.lang, d.source, round($cosSql, 6) AS score
         |FROM documents d
         |JOIN embeddings e ON d.doc_id = e.vec_id,
         |  (SELECT embedding AS qe FROM embeddings WHERE vec_id = 3) q
         |WHERE d.lang = 'en' AND contains(lower(d.source), 'src1')
         |ORDER BY $cosSql DESC, d.doc_id
         |LIMIT 5""".stripMargin),
      (spark, dir) => {
        val d = table(spark, dir, "documents")
        val e = table(spark, dir, "embeddings")
        // chunks-shaped universe: metadata as MAP<STRING,STRING>
        val chunks = d.join(e, d("doc_id") === e("vec_id"))
          .select(col("doc_id"), col("lang"), col("source"), col("embedding"),
            map(lit("lang"), col("lang"), lit("source"), col("source")).as("metadata"),
            current_timestamp().as("created_at"))
        // F1 forms: exact equality + `_contains` substring
        val universe = chunks.filter(MetadataFilter.compile(
          Map("lang" -> "en", "source_contains" -> "SRC1"),
          col("metadata"), col("created_at")))
        val q = e.filter(col("vec_id") === 3).select(col("embedding").as("qe"))
        universe.crossJoin(broadcast(q))
          .withColumn("raw", cosine_sim(col("embedding"), col("qe")))
          .orderBy(col("raw").desc, col("doc_id"))
          .limit(5)
          .select(col("doc_id"), col("lang"), col("source"), round(col("raw"), 6).as("score"))
      }),

    QueryDef("q51_metadata_filter_forms", Some(
      """SELECT d.doc_id, d.lang, d.n_chars
        |FROM documents d
        |WHERE d.lang = 'fr' AND contains(lower(d.source), 'src')
        |  AND d.n_chars > 200
        |ORDER BY d.doc_id""".stripMargin),
      (spark, dir) => {
        val d = table(spark, dir, "documents")
          .withColumn("metadata", map(
            lit("lang"), col("lang"),
            lit("source"), col("source"),
            lit("n_chars"), col("n_chars").cast("string")))
        d.filter(MetadataFilter.compile(
            Map("lang" -> "fr", "source_contains" -> "SRC"),
            col("metadata"), current_timestamp()))
          .filter(col("n_chars") > 200)
          .select(col("doc_id"), col("lang"), col("n_chars"))
          .orderBy("doc_id")
      }))
}
