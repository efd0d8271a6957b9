package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Unsupervised k-means document clustering over embedding vectors — the
  * corpus-organization primitive behind topic balancing, diversity-aware
  * sampling, and cluster-based dedup sharding in a training-data
  * pipeline (the unsupervised twin of
  * [[graft.operators.Similarity]]'s supervised label centroids).
  *
  * EXACT INTEGER Lloyd's: vectors and centroids live in micro-int space
  * (`floor(x·1e6 + 0.5)` per component — the identical IEEE double ops in
  * every engine), distances are BIGINT sums of squared integer diffs, and
  * centroid updates round the exact integer sums through one double
  * division (`floor(sum/cnt + 0.5)`). Every step is therefore
  * bit-reproducible across engines — a DuckDB replay of the same
  * initialization and iteration count lands on the SAME clusters, so the
  * whole iterative fit is oracle-checkable (the same micro-int discipline
  * as ext14's quantization).
  *
  * Initialization is deterministic: the k vectors with the LOWEST ids,
  * cluster ids 0..k-1 in id order. Assignment ties break toward the
  * lowest cluster id. A cluster that loses all members disappears (no
  * carry-forward) — mirrored in the oracle.
  *
  * Scale shape (the MLlib k-means shape): centroids are k×dims longs —
  * BYTES — broadcast into the plan as literals each iteration; assignment
  * is a narrow per-row projection (no join, no shuffle); the centroid
  * update is one map-side-combinable elementwise aggregate
  * ([[graft.functions.ElementwiseLongAgg]] — the shuffle carries one
  * ~0.5 KB partial per (partition, cluster), never the corpus). Driver
  * traffic per iteration is k rows. The corpus-side micro projection is
  * leased-cached across the `iters+1` passes
  * ([[graft.util.Caching.leased]]).
  */
object Clustering {

  /** Micro-int projection of `vecCol`: id + array<long>. */
  private[operators] def micro(df: DataFrame, idCol: String, vecCol: String): DataFrame =
    df.select(col(idCol).cast("long").as("id"),
      transform(col(vecCol), x => floor(x.cast("double") * 1e6 + 0.5).cast("long"))
        .as("m"))

  /** Squared L2 distance between the row's `m` and a centroid literal. */
  private[operators] def sqDist(c: Array[Long]): Column = {
    val cLit = array(c.map(lit(_)).toIndexedSeq: _*)
    aggregate(zip_with(col("m"), cLit, (a, b) => (a - b) * (a - b)),
      lit(0L), (acc, x) => acc + x)
  }

  /** `(id, cluster)` assignment column for the given centroids: argmin of
    * sqDist, ties to the lowest cluster id (struct array_min orders by
    * (dist, cid)). */
  private[operators] def assignExpr(centroids: Seq[(Int, Array[Long])]): Column =
    array_min(array(centroids.map { case (cid, c) =>
      struct(sqDist(c).as("d"), lit(cid).as("c"))
    }: _*)).getField("c")

  /** The driver-side Lloyd's loop over an (already-persisted) micro
    * projection: k-row driver traffic per iteration (the class scaladoc's
    * scale argument). Returns the FINAL centroids, cid-sorted. */
  private def fit(m: DataFrame, k: Int, iters: Int): Seq[(Int, Array[Long])] = {
    val dims = m.select(size(col("m"))).head.getInt(0)
    // deterministic seeds: the k lowest-id vectors, cid 0..k-1 in id order
    var centroids: Seq[(Int, Array[Long])] =
      m.orderBy(col("id")).limit(k).collect().zipWithIndex.map { case (r, i) =>
        i -> r.getSeq[Long](1).toArray
      }.toSeq
    val sumAgg = graft.functions.ElementwiseLongAgg.sumUdaf(dims)
    for (_ <- 1 to iters) {
      centroids = m.select(col("m"), assignExpr(centroids).as("cluster"))
        .groupBy(col("cluster"))
        .agg(sumAgg(col("m")).as("s"), count(lit(1)).as("n"))
        .collect().map { r =>
          val s = r.getSeq[Long](1); val n = r.getLong(2)
          r.getInt(0) -> s.map(v => math.floor(v.toDouble / n + 0.5).toLong).toArray
        }.sortBy(_._1).toSeq
    }
    // cluster ids are STABLE across iterations (no re-densify): a
    // cluster that empties simply stops existing, which the oracle
    // mirrors for free.
    centroids
  }

  /** Run `iters` exact Lloyd's iterations with k seeds and return the
    * final per-vector assignment `(idCol, cluster, cluster_size)`. */
  def kmeans(df: DataFrame, idCol: String, vecCol: String,
             k: Int, iters: Int): DataFrame = {
    val m = micro(df, idCol, vecCol)
    graft.util.Caching.leased(m) {
      val centroids = fit(m, k, iters)
      val sizes = m.select(assignExpr(centroids).as("cluster"))
        .groupBy("cluster").agg(count(lit(1)).as("cluster_size"))
      m.select(col("id").as(idCol), assignExpr(centroids).as("cluster"))
        .join(broadcast(sizes), "cluster")
        .select(col(idCol), col("cluster"), col("cluster_size"))
    }
  }

  /** The fit as a PERSISTABLE INDEX TABLE `(cluster, centroid)` —
    * centroids in micro-int space, one row per surviving cluster. This
    * is the build half of the IVF index lifecycle
    * ([[graft.script.AnnIndexJob]] writes it through the YAML engine;
    * [[graft.operators.Similarity.ivfTopKIndexed]] probes it): train
    * once as an ETL job, query many times against the stored table —
    * and because the fit is exact integer Lloyd's, the index contents
    * themselves are cross-engine replayable. */
  def kmeansCentroids(df: DataFrame, idCol: String, vecCol: String,
                      k: Int, iters: Int): DataFrame = {
    val spark = df.sparkSession
    val m = micro(df, idCol, vecCol)
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    try {
      val centroids = fit(m, k, iters)
      import spark.implicits._
      centroids.map { case (cid, c) => (cid, c.toSeq) }
        .toDF("cluster", "centroid")
    } finally { m.unpersist(false): Unit }
  }

  /** Assign vectors to their nearest stored IVF cell — the probe half
    * of the persisted-index lifecycle as a standalone operator:
    * `(idCol, cluster, sq_dist)` with the [[assignExpr]] tie rule
    * (lowest cluster id). The index is collected to the driver —
    * BOUNDED: k rows of (cluster, centroid), the same k-row broadcast
    * every IVF probe rides — and the assignment is one shuffle-free
    * codegen projection over the corpus. */
  def ivfAssign(df: DataFrame, idCol: String, vecCol: String,
                index: DataFrame): DataFrame = {
    val cents = index.select("cluster", "centroid").collect()
      .map(r => r.getInt(0) -> r.getSeq[Long](1).toArray).sortBy(_._1).toSeq
    require(cents.nonEmpty, "ivfAssign: empty index")
    val best = array_min(array(cents.map { case (cid, c) =>
      struct(sqDist(c).as("d"), lit(cid).as("c"))
    }: _*))
    micro(df, idCol, vecCol).select(col("id").as(idCol),
      best.getField("c").as("cluster"), best.getField("d").as("sq_dist"))
  }

  /** Mean squared distance of an [[ivfAssign]] result — the fit-time
    * BASELINE the drift trigger compares against (micro-int² units;
    * one map-side-combined aggregate). */
  def meanSqDist(assignments: DataFrame): Double =
    assignments.agg(avg(col("sq_dist"))).head().getDouble(0)

  /** One incremental IVF maintenance step's outcome: the delta's
    * assignments against the EXISTING cells, the measured drift
    * (milli-ratio of the delta's mean sq-dist to the fit baseline),
    * and whether that drift demands a full refit. */
  final case class IvfDelta(assignments: DataFrame, driftMilli: Long,
                            refitNeeded: Boolean)

  /** INCREMENTAL IVF index maintenance (r10 verdict #6): assign ONLY
    * the appended arrivals (a `changesBetween` delta) to the existing
    * cells and fold them into the assignment table — the ext127
    * star-edge discipline applied to the ANN index: below the drift
    * threshold the fold is provably identical to reassigning the whole
    * corpus (centroids unchanged ⇒ per-row argmin unchanged ⇒
    * incremental == full, which ext148 asserts with a two-sided
    * except()), so a daily 0.1% append costs one delta-sized
    * projection, not a corpus refit.
    *
    * The DRIFT TRIGGER is the honesty valve: arrivals from a shifted
    * distribution sit far from every centroid, the delta's mean
    * sq-dist rises against the fit-time baseline, and past
    * `maxDriftMilli` (1000 = parity with the fit) the step REFUSES the
    * incremental path — the caller refits. Without it, silent
    * incremental folds would degrade recall unboundedly as the corpus
    * drifts. Cost: the delta projection + one scalar aggregate over
    * the delta; the corpus is never touched. */
  def ivfMaintainIncremental(delta: DataFrame, idCol: String, vecCol: String,
                             index: DataFrame, baselineMeanSqDist: Double,
                             maxDriftMilli: Long): IvfDelta = {
    require(baselineMeanSqDist > 0,
      "ivfMaintainIncremental: fit baseline must be positive")
    // deterministic plan — re-evaluation by later consumers (the fold,
    // the equivalence check) recomputes the same delta-sized projection
    val assigned = ivfAssign(delta, idCol, vecCol, index)
    // an EMPTY delta (no arrivals since the last run) is zero drift by
    // definition — avg() over zero rows is NULL and must not NPE a
    // scheduled maintenance job
    val meanOpt = Option(assigned.agg(avg(col("sq_dist"))).head().get(0))
      .map(_.asInstanceOf[Double])
    val driftMilli = meanOpt
      .map(m => math.floor(1000.0 * m / baselineMeanSqDist).toLong)
      .getOrElse(0L)
    IvfDelta(assigned, driftMilli, driftMilli > maxDriftMilli)
  }

  /** Diversity selection by CLUSTER REPRESENTATIVES: fit integer
    * k-means, then keep per cluster the vector nearest its final
    * centroid (ties to the lowest id) — the deterministic
    * "one exemplar per region of embedding space" subset that seeds
    * diverse eval sets and coreset-style pruning (the bucketed stand-in
    * for greedy k-center, which is inherently sequential). Everything
    * is the [[kmeans]] integer arithmetic, so fit + assignment +
    * argmin pick all replay in SQL (ext86).
    *
    * Scale shape: centroids ride the plan as literals; the per-row
    * (distance, cluster) is one narrow projection; the pick is a
    * map-side-combinable min(struct(dist, id)) per cluster — k output
    * rows, no window, no second corpus pass beyond the fit's. */
  def clusterRepresentatives(df: DataFrame, idCol: String, vecCol: String,
                             k: Int, iters: Int): DataFrame = {
    val cents = kmeansCentroids(df, idCol, vecCol, k, iters)
      .collect().map(r => r.getInt(0) -> r.getSeq[Long](1).toArray).sortBy(_._1).toSeq
    val best = array_min(array(cents.map { case (cid, c) =>
      struct(sqDist(c).as("d"), lit(cid).as("c"))
    }: _*))
    micro(df, idCol, vecCol)
      .select(col("id"), best.getField("c").as("cluster"), best.getField("d").as("sq_dist"))
      .groupBy(col("cluster"))
      .agg(min(struct(col("sq_dist"), col("id"))).as("rep"),
        count(lit(1)).as("cluster_size"))
      .select(col("cluster"), col("rep.id").as("rep_id"),
        col("rep.sq_dist").as("sq_dist"), col("cluster_size"))
  }

  /** SemDeDup (Abbas et al. 2023): semantic dedup = k-means clustering +
    * within-cluster cosine near-dup, keeping one representative per
    * near-dup group. A vector is DROPPED iff some LOWER-id vector in its
    * OWN cluster sits within the cosine threshold — a deterministic
    * dominance rule (no transitive closure), exactly replayable in SQL.
    *
    * Scale shape: the cluster id is the BLOCKING key — the pair join is
    * EQUALITY-keyed on cluster, so each cluster is an independent
    * (n/k)² cell and the corpus is never compared all-pairs (the ext33
    * argument, with learned rather than hashed blocks). The kmeans fit
    * itself is the [[kmeans]] broadcast/elementwise-agg shape. */
  def semDedup(df: DataFrame, idCol: String, vecCol: String,
               k: Int, iters: Int, threshold: Double): DataFrame = {
    graft.sql.GraftExtensions.ensureRegistered(df.sparkSession)
    val assign = kmeans(df, idCol, vecCol, k, iters)
    val e = df.select(col(idCol).cast("long").as("id"),
        col(vecCol).cast("array<double>").as("v"))
      .join(assign.select(col(idCol).cast("long").as("id"), col("cluster")), "id")
    val a = e.select(col("id").as("aid"), col("v").as("av"), col("cluster"))
    val b = e.select(col("id").as("bid"), col("v").as("bv"), col("cluster"))
    // drop bid iff a lower aid in the same cluster is within threshold:
    // unrounded threshold compare, the cosinePairs/ext10 discipline
    val dropped = a.join(b, Seq("cluster"))
      .filter(col("aid") < col("bid") &&
        call_function("cosine_sim", col("av"), col("bv")) >= threshold)
      .select(col("bid").as("id")).distinct()
    e.join(dropped.withColumn("__dropped", lit(true)), Seq("id"), "left")
      .select(col("id").as(idCol), col("cluster"),
        not(coalesce(col("__dropped"), lit(false))).as("keep"))
  }
}
