package org.apache.spark.sql.graft.rules

import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.plans.logical._
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.graft.expressions.{CosineSimilarity, EuclideanDistance, HammingDist, LshBuckets, NearestCentroid, SignBits}
import org.apache.spark.sql.types.{ArrayType, FloatType, IntegerType, LongType}

import graft.index.AnnRegistry

/**
 * OPT-IN optimizer rewrite of exact similarity top-k into an
 * index-probe plan, one rewrite per registered index TIER.
 *
 * When `spark.graft.ann.autoProbe=<registered index name>` is set and a
 * plan has the shape
 *
 *   Limit k (Sort [cosine_sim(emb, <literal query>) DESC] child)
 *
 * (or `euclidean_dist ASC`), the rule injects a candidate filter at
 * the LOWEST node where its inputs are available, leaving the exact
 * score+sort on top as the rerank:
 *
 *  - IVF ([[AnnRegistry.AnnIndex]]): top-`nprobe` centroid ids are
 *    computed on the driver (centroids are KB-scale) and the filter is
 *    `cluster_id IN probed` when an assignment column exists in the
 *    subtree (on a `partitionBy("cluster_id")` layout the IN becomes
 *    PartitionFilters — file pruning, zero per-row work), else the
 *    synthesized `nearest_centroid(emb) IN probed` — the Spark analog
 *    of probing 5 of 100 inverted lists (indexes.py:346-356).
 *  - LSH ([[AnnRegistry.LshIndex]]): the query's (optionally
 *    multi-probe) bucket keys are computed on the driver and the
 *    filter is `arrays_overlap(lsh_buckets(emb), <query buckets>)` —
 *    the FILTER form of the signature-table semi-join
 *    (LshModel.candidates): identical candidate set, but synthesized
 *    from the embedding expression itself, so it needs no persisted
 *    signature table, introduces no shuffle, and survives column
 *    pruning. NOTES.md sketched this as a join-introducing rewrite;
 *    the filter form dominates it (the join's only advantage — not
 *    recomputing signatures — costs a full shuffle of the corpus,
 *    while recomputation is numTables×bits codegen'd dot products
 *    per row, cheaper than the cosine already being computed).
 *  - HNSW ([[AnnRegistry.HnswIndex]]): the graph is bounded driver
 *    state (like centroids), so it is navigated AT OPTIMIZATION TIME:
 *    `max(k, fetchK)` nearest ids are injected as `<idCol> IN (...)`.
 *    The rerank on top restores exact ordering among candidates.
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
      case Some(entry) =>
        plan.transformDown {
          // column pruning may slide Projects between the limit and the
          // sort — see through them
          case limit @ Limit(limitExpr, SortBelowProjects(sort @ Sort(
              SortOrder(sortExpr, direction, _, _) +: _, true, child, _))) =>
            val k = limitExpr match {
              case Literal(v: Int, IntegerType) => v
              case _ => 0
            }
            val rewritten = for {
              (emb, query) <- similarityTarget(sortExpr, direction, child)
              (anchor, probeFilter) <- tierFilter(entry, emb, query, k, child)
            } yield {
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

  /** The (anchor, candidate filter) for the registered tier, or None
    * when the tier cannot validly fire on this plan. Dimension checks
    * keep a registered index for a DIFFERENT embedding space from
    * hijacking the plan. */
  private def tierFilter(entry: AnnRegistry.AnnIndexEntry, emb: Expression,
      query: Array[Float], k: Int,
      child: LogicalPlan): Option[(Expression, Expression)] = entry match {
    case AnnRegistry.AnnIndex(model, nprobe)
        if model.centroids.headOption.exists(_.length == query.length) =>
      val probed = model.probe(query, nprobe).map(i => Literal(i))
      // Prefer filtering an EXISTING cluster_id column (the persisted
      // assigned table): on a partitionBy("cluster_id") layout the IN
      // becomes PartitionFilters — file pruning, zero per-row work.
      // Synthesize nearest_centroid(emb) only when no assignment
      // column exists in the subtree. The name alone is not enough
      // provenance — an unrelated user column called cluster_id of
      // the wrong type would break analysis or silently mis-filter —
      // so the binding also requires the assignment's exact type.
      Some(attrNamed(child, "cluster_id", _.dataType == IntegerType) match {
        case Some(attr) => (attr, In(attr, probed))
        case None => (emb, In(NearestCentroid(emb, model.centroids), probed))
      })
    case AnnRegistry.LshIndex(model, flips) if model.dim == query.length =>
      val qBuckets =
        if (flips > 0) model.multiProbeBucketsOf(query, flips)
        else model.bucketsOf(query)
      Some((emb, ArraysOverlap(
        LshBuckets(emb, model.numTables, model.bitsPerTable, model.dim, model.seed),
        Literal.create(qBuckets, ArrayType(LongType, containsNull = false)))))
    case AnnRegistry.HnswIndex(model, idCol, fetchK, ef)
        if model.size > 0 && model.dim == query.length =>
      attrNamed(child, idCol).map { attr =>
        val ids = model.search(query, math.max(k, fetchK), ef)
          .map { case (id, _) => Literal(id) }
        (attr, In(attr, ids))
      }
    case AnnRegistry.BinaryIndex(dim, radius) if dim == query.length =>
      // Prefer filtering a PERSISTED `sig` column (the binary tier's
      // materialized signature table — 8 bytes/64-dims, the cheap
      // scan), mirroring the IVF cluster_id preference; synthesize
      // sign_bits(emb) per row only when none exists in the subtree.
      // `sig` is a generic name, so the binding demands the packed
      // signature's shape — array<long> — before trusting it: a
      // wrong-typed user column falls back to synthesizing
      // sign_bits(emb). Length can't be checked at optimization time
      // (the type carries no arity), and HammingDist on mismatched
      // word counts degrades monotonically rather than erroring — a
      // silently LOSSY prefilter if the column came from a different
      // embedding space — so the injected predicate fails OPEN: rows
      // whose signature is not exactly ceil(dim/64) words skip the
      // prefilter and ride through to the exact rerank on top.
      val words = (query.length + 63) / 64
      val qSig = Literal.create(
        ArrayData.toArrayData(graft.index.BinaryQuant.pack(query)),
        ArrayType(LongType, containsNull = false))
      Some(attrNamed(child, "sig", a => a.dataType match {
        case ArrayType(LongType, _) => true
        case _ => false
      }) match {
        case Some(attr) =>
          (attr, Or(
            Not(EqualTo(Size(attr), Literal(words))),
            LessThanOrEqual(HammingDist(attr, qSig), Literal(radius))))
        case None =>
          (emb, LessThanOrEqual(HammingDist(SignBits(emb), qSig), Literal(radius)))
      })
    case _ => None
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

  /** An attribute of the given name (and, for the index-owned column
    * bindings, the index's expected type — the name alone is weak
    * provenance) anywhere in the subtree, lowest occurrence
    * preferred. */
  private def attrNamed(plan: LogicalPlan, name: String,
      typeOk: Attribute => Boolean = _ => true): Option[Attribute] = {
    var found: Option[Attribute] = None
    plan.foreachUp {
      case p if found.isEmpty =>
        found = p.output.find(a => a.name == name && typeOk(a))
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
