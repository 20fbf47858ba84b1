package graft.index

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.graft.Bridge
import org.apache.spark.sql.graft.expressions.NearestCentroid

/**
 * Product quantization (Jegou et al. 2011, "Product Quantization for
 * Nearest Neighbor Search") — the memory-bound ANN representation at
 * corpus scale: the embedding space splits into `m` subspaces, each
 * with its own `k`-centroid codebook, and a vector stores as `m` small
 * codes (m=8, k=16 on dim 64 ⇒ 8 codes ≈ 8 bytes vs 256 bytes float32,
 * a 32x compression — the difference between RAM-resident and
 * disk-bound candidate generation at 100 TB).
 *
 * Codebooks are KB-scale driver state (like IVF centroids); encoding
 * composes the existing codegen'd `NearestCentroid` expression per
 * subspace — no new expression and no UDF. Search is asymmetric
 * distance computation (ADC): the query builds an [m][k] table of
 * partial squared distances once on the driver, each row's approximate
 * distance is m table lookups (a broadcast literal + codegen'd
 * element_at chain), and the exact rerank over the top candidates
 * removes the quantization error from the final ranking (two-tier, as
 * with int8 — AnnRecallSpec measures the candidate-tier recall).
 */
final case class PqModel(codebooks: Array[Array[Array[Float]]]) {

  def m: Int = codebooks.length
  def k: Int = codebooks(0).length
  def dsub: Int = codebooks(0)(0).length
  def dim: Int = m * dsub

  /** `array<int>` of `m` codes for an `array<float>` embedding column. */
  def encodeColumn(emb: Column): Column =
    array((0 until m).map { s =>
      Bridge.column(NearestCentroid(
        Bridge.expression(slice(emb, s * dsub + 1, dsub)), codebooks(s)))
    }: _*)

  /** Driver-side ADC table: partial squared L2 from the query's s-th
    * subvector to every centroid of subspace s. */
  def adcTable(query: Array[Float]): Array[Array[Float]] = {
    require(query.length == dim, s"query dim ${query.length} != model dim $dim")
    Array.tabulate(m) { s =>
      Array.tabulate(k) { c =>
        val cen = codebooks(s)(c)
        var d = 0.0; var i = 0
        while (i < dsub) {
          val x = query(s * dsub + i) - cen(i); d += x * x; i += 1
        }
        d.toFloat
      }
    }
  }

  /** Approximate squared distance of a codes column to `query`:
    * m lookups into the broadcast ADC table. */
  def adcDistance(codes: Column, query: Array[Float]): Column = {
    val table = typedlit(adcTable(query).map(_.toSeq).toSeq)
    (0 until m).map { s =>
      element_at(element_at(table, s + 1), element_at(codes, s + 1) + 1)
        .cast("double")
    }.reduce(_ + _)
  }

  /** Top-`n` candidate rows of an encoded table by ADC distance.
    * `idCol`, when given, breaks ADC ties deterministically (vectors
    * sharing all m codes have bit-identical ADC distances, so an
    * untiebroken LIMIT at the cutoff would pick among them by
    * partition order). */
  def candidates(encoded: DataFrame, codesCol: String, query: Array[Float],
      n: Int, idCol: Option[String] = None): DataFrame = {
    val scored = encoded.withColumn("adc_dist", adcDistance(col(codesCol), query))
    idCol.fold(scored.orderBy(col("adc_dist").asc))(id =>
        scored.orderBy(col("adc_dist").asc, col(id).asc))
      .limit(n)
  }
}

object PqModel {

  /** Cap on driver-collected training vectors (codebooks are statistics
    * of the distribution — a bounded seeded sample trains as well as
    * the full corpus, same policy as IvfModel's local path). */
  val maxTrainVectors: Int = 100000

  /**
   * Train per-subspace codebooks with the same reference-shaped Lloyd
   * loop IVF uses (seeded ⇒ deterministic). `dim` must divide evenly
   * into `m` subspaces.
   */
  def train(df: DataFrame, embCol: String, m: Int = 8, k: Int = 16,
      maxIter: Int = 10, seed: Long = 42L): PqModel = {
    val vecs = df.filter(col(embCol).isNotNull)
      .select(col(embCol).cast("array<float>"))
      .limit(maxTrainVectors)
      .collect().map(_.getSeq[Float](0).toArray)
    require(vecs.nonEmpty, "PqModel.train: no non-null vectors")
    trainLocal(vecs, m, k, maxIter, seed)
  }

  /** Codebook training on driver-resident vectors (shared with
    * [[OpqModel]], which re-trains per rotation iteration). */
  def trainLocal(vecs: Array[Array[Float]], m: Int, k: Int,
      maxIter: Int = 10, seed: Long = 42L): PqModel = {
    require(vecs.nonEmpty, "PqModel.trainLocal: no vectors")
    val dim = vecs(0).length
    require(dim % m == 0, s"dim $dim must be divisible by m=$m subspaces")
    val dsub = dim / m
    val codebooks = Array.tabulate(m) { s =>
      val sub = vecs.map(v => java.util.Arrays.copyOfRange(v, s * dsub, (s + 1) * dsub))
      // distinct seed per subspace so identical subspace distributions
      // do not produce identical (wasted) codebooks
      IvfModel.lloydLocal(sub, math.min(k, sub.length), maxIter, seed + s)
    }
    PqModel(codebooks)
  }

  /** Warm-started retraining: Lloyd from `prev`'s codebooks (no
    * re-seeding), so each OPQ alternation step is non-increasing in
    * the shared quantization objective. */
  def trainLocalFrom(vecs: Array[Array[Float]], prev: PqModel,
      maxIter: Int = 10): PqModel = {
    val dsub = prev.dsub
    val codebooks = Array.tabulate(prev.m) { s =>
      val sub = vecs.map(v => java.util.Arrays.copyOfRange(v, s * dsub, (s + 1) * dsub))
      IvfModel.lloydFrom(sub, prev.codebooks(s), maxIter)
    }
    PqModel(codebooks)
  }
}
