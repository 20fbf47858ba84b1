package graft.filter

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/**
 * The reference's metadata-filter predicate language, compiled to Catalyst
 * `Column`s (reference: app/services/search_service.py:155-197).
 *
 * Four predicate forms, dispatched on the KEY's shape:
 *   - key starts with "created_after"  => chunk.created_at >  value  (:170-174)
 *   - key starts with "created_before" => chunk.created_at <  value  (:175-178)
 *   - key ends with "_contains"        => case-insensitive substring on
 *     metadata[stripped_key]                                          (:179-187)
 *   - otherwise                        => exact equality on metadata[key] (:188-192)
 *
 * Missing metadata key => predicate is false (no match) (:182-184, :190).
 * Filters are a conjunction (ALL must match, :160-166).
 *
 * Compiling to plain `Column`s keeps the whole thing inside Catalyst:
 * the `created_*` forms push down to the Parquet scan, and the map
 * predicates stay in whole-stage codegen.
 */
sealed trait MetaPredicate {
  def toColumn(metadataCol: Column, createdAtCol: Column): Column
}

object MetaPredicate {
  final case class Eq(key: String, value: String) extends MetaPredicate {
    def toColumn(m: Column, c: Column): Column =
      element_at(m, key).isNotNull && element_at(m, key) === lit(value)
  }
  /** Case-insensitive substring; key already stripped of `_contains`. */
  final case class Contains(key: String, value: String) extends MetaPredicate {
    def toColumn(m: Column, c: Column): Column =
      element_at(m, key).isNotNull &&
        lower(element_at(m, key)).contains(lower(lit(value)))
  }
  final case class CreatedAfter(value: String) extends MetaPredicate {
    def toColumn(m: Column, c: Column): Column = c > to_timestamp(lit(value))
  }
  final case class CreatedBefore(value: String) extends MetaPredicate {
    def toColumn(m: Column, c: Column): Column = c < to_timestamp(lit(value))
  }
}

object MetadataFilter {
  import MetaPredicate._

  /** Parse a filter map using the reference's key-shape dispatch. */
  def parse(filters: Map[String, String]): Seq[MetaPredicate] =
    filters.toSeq.sortBy(_._1).map { case (key, value) =>
      if (key.startsWith("created_after")) CreatedAfter(value)
      else if (key.startsWith("created_before")) CreatedBefore(value)
      else if (key.endsWith("_contains")) Contains(key.stripSuffix("_contains"), value)
      else Eq(key, value)
    }

  /** Conjunction over all predicates; empty filter matches everything. */
  def compile(filters: Map[String, String],
      metadataCol: Column, createdAtCol: Column): Column =
    parse(filters).foldLeft(lit(true)) { (acc, p) =>
      acc && p.toColumn(metadataCol, createdAtCol)
    }
}
