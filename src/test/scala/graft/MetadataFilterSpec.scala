package graft

import java.sql.Timestamp

import org.apache.spark.sql.functions._

import graft.filter.MetadataFilter

/** The four predicate forms + missing-key rule of
  * search_service.py:155-197. */
class MetadataFilterSpec extends SparkSpec {
  import spark.implicits._

  private val rows = Seq(
    ("a", Map("topic" -> "Python Basics", "lang" -> "en"), Timestamp.valueOf("2024-01-01 00:00:00")),
    ("b", Map("topic" -> "databases", "lang" -> "es"), Timestamp.valueOf("2024-06-01 00:00:00")),
    ("c", Map("lang" -> "en"), Timestamp.valueOf("2024-12-01 00:00:00"))
  ).toDF("id", "metadata", "created_at")

  private def ids(filters: Map[String, String]): Seq[String] =
    rows.filter(MetadataFilter.compile(filters, $"metadata", $"created_at"))
      .select("id").as[String].collect().toSeq.sorted

  test("exact equality (search_service.py:188-192)") {
    assert(ids(Map("lang" -> "en")) == Seq("a", "c"))
    assert(ids(Map("lang" -> "en", "topic" -> "Python Basics")) == Seq("a"))
  }

  test("missing key => no match (search_service.py:190)") {
    assert(ids(Map("missing_key" -> "x")) == Seq.empty)
    assert(ids(Map("topic" -> "databases")) == Seq("b")) // c has no topic
  }

  test("_contains is case-insensitive substring (search_service.py:179-187)") {
    assert(ids(Map("topic_contains" -> "PYTHON")) == Seq("a"))
    assert(ids(Map("topic_contains" -> "base")) == Seq("b"))
    assert(ids(Map("topic_contains" -> "zzz")) == Seq.empty)
  }

  test("created_after / created_before on the chunk column (search_service.py:170-178)") {
    assert(ids(Map("created_after" -> "2024-03-01")) == Seq("b", "c"))
    assert(ids(Map("created_before" -> "2024-03-01")) == Seq("a"))
    assert(ids(Map("created_after" -> "2024-03-01", "created_before" -> "2024-09-01")) == Seq("b"))
  }

  test("empty filter matches all; conjunction semantics") {
    assert(ids(Map.empty) == Seq("a", "b", "c"))
    assert(ids(Map("lang" -> "en", "created_after" -> "2024-06-15")) == Seq("c"))
  }
}
