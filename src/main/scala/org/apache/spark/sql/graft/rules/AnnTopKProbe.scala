package org.apache.spark.sql.graft.rules

import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.plans.logical._
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.graft.expressions.{CosineSimilarity, EuclideanDistance, NearestCentroid}
import org.apache.spark.sql.types.{ArrayType, FloatType}

import graft.index.AnnRegistry

/**
 * OPT-IN optimizer rewrite of exact cosine top-k into an IVF probe.
 *
 * When `spark.graft.ann.autoProbe=<registered index name>` is set and a
 * plan has the shape
 *
 *   Limit k (Sort [cosine_sim(emb, <literal query>) DESC] child)
 *
 * the rule computes the top-`nprobe` centroid ids for the query vector
 * on the driver (centroids are KB-scale) and injects
 *
 *   Filter (nearest_centroid(emb) IN probed)
 *
 * at the LOWEST node where `emb` is available — synthesized from the
 * cosine expression itself, so it fires whether or not the table was
 * pre-assigned a cluster column (and survives column pruning). On a
 * table stored `partitionBy("cluster_id")`, filter on that column
 * upstream instead via `IvfModel.candidates`; here the filter evaluates
 * the centroid argmin inline, skipping (nlist - nprobe)/nlist of the
 * scored+sorted work — the Spark analog of probing 5 of 100 inverted
 * lists (indexes.py:346-356).
 *
 * Results become approximate (ANN) — exactly the trade the reference's
 * indexed search makes — so the rewrite NEVER fires unless the user
 * both registered an index and set the conf. Idempotent under the
 * fixed-point optimizer batch: an already-injected probe filter is
 * detected by semantic equality and left alone.
 */
object AnnTopKProbe extends Rule[LogicalPlan] {

  private val ConfKey = "spark.graft.ann.autoProbe"

  /** Matches the topmost Sort under zero or more Projects. */
  private object SortBelowProjects {
    @annotation.tailrec
    def unapply(p: LogicalPlan): Option[Sort] = p match {
      case s: Sort => Some(s)
      case proj: Project => unapply(proj.child)
      case _ => None
    }
  }

  override def apply(plan: LogicalPlan): LogicalPlan = {
    val idxName = conf.getConfString(ConfKey, "")
    if (idxName.isEmpty) return plan
    AnnRegistry.get(idxName) match {
      case None => plan
      case Some(idx) =>
        plan.transformDown {
          // column pruning may slide Projects between the limit and the
          // sort — see through them
          case limit @ Limit(_, SortBelowProjects(sort @ Sort(
              SortOrder(sortExpr, direction, _, _) +: _, true, child, _))) =>
            val rewritten = for {
              (emb, query) <- similarityTarget(sortExpr, direction, child)
              // dimension sanity: a registered index for a different
              // embedding space must not hijack the plan
              if idx.model.centroids.headOption.exists(_.length == query.length)
            } yield {
              val probed = idx.model.probe(query, idx.nprobe).map(i => Literal(i))
              // Prefer filtering an EXISTING cluster_id column (the
              // persisted assigned table): on a partitionBy("cluster_id")
              // layout the IN becomes PartitionFilters — file pruning,
              // zero per-row work. Synthesize nearest_centroid(emb) only
              // when no assignment column exists in the subtree.
              val (anchor: Expression, probeFilter) = clusterAttr(child) match {
                case Some(attr) => (attr, In(attr, probed))
                case None =>
                  (emb, In(NearestCentroid(emb, idx.model.centroids), probed))
              }
              if (hasFilter(child, probeFilter)) limit
              else limit.transformUp {
                case s: Sort if s eq sort =>
                  s.copy(child = injectLowest(child, anchor, probeFilter))
              }
            }
            rewritten.getOrElse(limit)
        }
    }
  }

  /** The (embedding expression, query vector) pair, if the sort
    * expression is (an alias of) a similarity top-k shape against an
    * `array<float>` literal: `cosine_sim DESC` (most similar first) or
    * `euclidean_dist ASC` (nearest first — the metric IVF centroids
    * are actually trained on). */
  private def similarityTarget(sortExpr: Expression, direction: SortDirection,
      child: LogicalPlan): Option[(Expression, Array[Float])] = {
    val aliases = child.collect {
      case p: Project => p.projectList.collect {
        case a: Alias => a.toAttribute.exprId -> a.child
      }
    }.flatten.toMap
    @annotation.tailrec
    def resolve(e: Expression): Expression = e match {
      case ar: AttributeReference if aliases.contains(ar.exprId) => resolve(aliases(ar.exprId))
      case other => other
    }
    (resolve(sortExpr), direction) match {
      case (CosineSimilarity(emb, Literal(q: ArrayData, ArrayType(FloatType, _))), Descending) =>
        Some((emb, q.toFloatArray()))
      case (CosineSimilarity(Literal(q: ArrayData, ArrayType(FloatType, _)), emb), Descending) =>
        Some((emb, q.toFloatArray()))
      case (EuclideanDistance(emb, Literal(q: ArrayData, ArrayType(FloatType, _))), Ascending) =>
        Some((emb, q.toFloatArray()))
      case (EuclideanDistance(Literal(q: ArrayData, ArrayType(FloatType, _)), emb), Ascending) =>
        Some((emb, q.toFloatArray()))
      case _ => None
    }
  }

  /** A `cluster_id` attribute anywhere in the subtree (the pre-assigned
    * table), lowest occurrence preferred. */
  private def clusterAttr(plan: LogicalPlan): Option[Attribute] = {
    var found: Option[Attribute] = None
    plan.foreachUp {
      case p if found.isEmpty =>
        found = p.output.find(_.name == "cluster_id")
      case _ =>
    }
    found
  }

  /** True when an equivalent probe filter is already in place (makes the
    * rewrite a no-op on the optimizer's next fixed-point pass). */
  private def hasFilter(plan: LogicalPlan, probeFilter: Expression): Boolean =
    plan.exists {
      case Filter(cond, _) => cond.exists(_.semanticEquals(probeFilter))
      case _ => false
    }

  /** Wrap the LOWEST node where the anchor expression's inputs are all
    * present — closest to the scan, so Catalyst pushdown has the
    * shortest distance to travel. */
  private def injectLowest(plan: LogicalPlan, anchor: Expression,
      cond: Expression): LogicalPlan = {
    var done = false
    plan.transformUp {
      case p if !done && anchor.references.subsetOf(p.outputSet) =>
        done = true
        Filter(cond, p)
    }
  }
}
