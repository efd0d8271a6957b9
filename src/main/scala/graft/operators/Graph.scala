package graft.operators

import graft.util.Caching
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Graph analytics over corpus-derived graphs (kNN similarity graphs,
  * duplicate-cluster graphs, citation/link graphs). Complements
  * [[Dedup.clusters]] (connected components via label propagation) with
  * centrality.
  */
object Graph {

  /** PageRank by power iteration — exact INTEGER arithmetic in micro
    * units, so every engine replays the identical ranks (the fixture
    * discipline: floats only where a single rounded division is
    * provable, here not even that).
    *
    * Recurrence (classic PageRank with damping 0.85, uniform
    * personalization, no dangling mass — callers pass a graph where
    * every node has out-degree ≥ 1, e.g. a kNN graph):
    *
    *   r₀(v)    = 1_000_000                       (micro-units, sums to N·1e6)
    *   c(u)     = r(u) div outdeg(u)              (floor division)
    *   r'(v)    = 150_000 + (85 · Σ_{u→v} c(u)) div 100
    *
    * Scale shape: `ranks` is a nodes-sized frame (id, rank); each
    * iteration is ONE hash join edges⋈ranks on src (edges shuffle once
    * if pre-partitioned by src — at 100 TB bucket the edge table) and
    * ONE groupBy(dst) aggregation with map-side combine, then a left
    * join back onto the node list for in-degree-0 nodes. The loop
    * is checkpointed per `checkpointEvery` iterations (default: every
    * iteration) — `ranks` is NODES-sized, so the materialization is
    * cheap at any scale, while the alternative (one lazy plan `iters`
    * deep) makes Catalyst re-analyze a tree that doubles per iteration:
    * measured on the ext79 fixture, the un-checkpointed 10-iteration
    * chain costs 9.0 s of mostly planning vs 3.4 s checkpointing each
    * iteration. The edge list is eagerly localCheckpoint'ed for the
    * same reason — every iteration's plan then starts from a flat
    * in-memory relation instead of re-embedding the caller's (possibly
    * deep: kNN window joins) edge derivation.
    *
    * Input: `edges` with (srcCol, dstCol) — parallel edges count twice,
    * matching the multigraph semantics of a kNN edge list. Output:
    * (node, pr_e6, out_deg, in_deg).
    */
  def pageRank(edges: DataFrame, srcCol: String, dstCol: String,
               iters: Int = 10, checkpointEvery: Int = 1): DataFrame =
    pageRankWeighted(
      edges.select(col(srcCol).as("src"), col(dstCol).as("dst"),
        lit(1L).as("__w")),
      "src", "dst", "__w", iters, checkpointEvery)

  /** Weighted [[pageRank]]: `wCol` is an integer edge MULTIPLICITY —
    * the result is term-for-term identical to running [[pageRank]] on
    * the edge list with each (src, dst) repeated w times (out/in-degree
    * = Σw; contribution per edge = w·(r div outdeg)), but every
    * iteration joins the GROUPED frame. The difference is the scale
    * story for co-occurrence graphs ([[TextAnalysis.textRank]]): the
    * multiset of a corpus's bigram instances is TOKEN-scale, while the
    * grouped (src, dst, n) frame is dictionary-scale — the 10-iteration
    * loop must join the latter, never the former (measured at sf0.1:
    * 7.1 s expanded vs 3.6 s grouped, identical output). */
  def pageRankWeighted(edges: DataFrame, srcCol: String, dstCol: String,
                       wCol: String, iters: Int = 10,
                       checkpointEvery: Int = 1): DataFrame = {
    // Eager checkpoint: the edge list feeds every iteration plus the
    // degree frames; at 100 TB this is the one input you materialize
    // (or bucket by src on disk) rather than re-scan `iters` times —
    // and truncating its lineage here keeps every iteration's plan
    // flat instead of re-embedding the caller's edge derivation.
    val e = edges.select(col(srcCol).cast("long").as("src"),
      col(dstCol).cast("long").as("dst"),
      col(wCol).cast("long").as("w")).localCheckpoint(true)
    val outDeg = e.groupBy(col("src").as("node"))
      .agg(sum(col("w")).as("out_deg"))
    val inDeg = e.groupBy(col("dst").as("node"))
      .agg(sum(col("w")).as("in_deg"))
    // node universe = endpoints of either side; checkpointed ALREADY
    // hash-partitioned on the per-iteration join key so the ranks-side
    // join reuses the captured partitioning (LogicalRDD preserves it)
    val nodes = outDeg.select(col("node"))
      .unionByName(inDeg.select(col("node"))).distinct()
      .repartition(col("node"))
      .localCheckpoint(true) // referenced twice per iteration + finish
    // r14 optimization pass: `degreed` (the edge list joined to its
    // out-degrees) is LOOP-INVARIANT, but the r13 form re-ran the
    // out-degree aggregation and the e⋈outDeg join inside every
    // iteration's plan — two shuffles per iteration of pure recompute.
    // Materialize it ONCE, hash-partitioned on `src`, so each iteration
    // is exactly: ranks shuffle to src ⋈ cached degreed → groupBy(dst)
    // → join back to nodes (guide §2.4). Edges-sized, same scale
    // contract as `e` itself (at 100 TB: bucket the edge table by src).
    val degreed = e.join(outDeg.withColumnRenamed("node", "src"), "src")
      .repartition(col("src"))
      .localCheckpoint(true)

    var ranks = nodes.withColumn("r", lit(1000000L))
    // a superseded iteration checkpoint frees as soon as the NEXT one
    // materializes (its data is baked into the successor); e, nodes, and
    // the LAST checkpoint feed the returned plan, so they release via a
    // consumption lease below — no block leaks across a long session
    var lastCp: Option[DataFrame] = None
    var i = 0
    while (i < iters) {
      val contrib = degreed
        .join(ranks.withColumnRenamed("node", "src"), "src")
        .select(col("dst"), expr("(r div out_deg) * w").as("c"))
        .groupBy(col("dst").as("node"))
        .agg(sum(col("c")).as("s"))
      ranks = nodes.join(contrib, Seq("node"), "left")
        .select(col("node"),
          (lit(150000L) + expr("85 * coalesce(s, CAST(0 AS BIGINT)) div 100")).as("r"))
      if (checkpointEvery > 0 && (i + 1) % checkpointEvery == 0 && i + 1 < iters) {
        ranks = ranks.localCheckpoint(true)
        lastCp.foreach(graft.util.Caching.freeCheckpoint)
        lastCp = Some(ranks)
      }
      i += 1
    }
    // Materialize the FINAL (nodes-sized, cheap) result once, then free
    // every upstream checkpoint immediately and deterministically. A
    // consumption-listener release would be WRONG here: checkpointed
    // blocks have no lineage, so unlike a persist lease they cannot
    // recompute — freeing them after the first action would make the
    // returned frame single-use. The flat checkpointed result is
    // multi-use safe; its own nodes-sized blocks live only as long as
    // the caller holds the frame.
    val result = ranks
      .join(outDeg, Seq("node"), "left")
      .join(inDeg, Seq("node"), "left")
      .select(col("node"), col("r").as("pr_e6"),
        coalesce(col("out_deg"), lit(0L)).as("out_deg"),
        coalesce(col("in_deg"), lit(0L)).as("in_deg"))
      .localCheckpoint(true)
    (Seq(e, nodes, degreed) ++ lastCp).foreach(graft.util.Caching.freeCheckpoint)
    result
  }

  /** Multi-source BFS hop distance — the "blast radius" question over
    * corpus-derived graphs: given a seed set (contaminated documents,
    * compromised suppliers, recalled parts), which nodes are within k
    * undirected hops, and how far is each? Output: (node, hops) with
    * hops = the EXACT shortest hop distance in [0, maxHops] (seeds are
    * 0); unreachable-within-k nodes are absent.
    *
    * Level-synchronous frontier expansion: `dist` holds every settled
    * node, `frontier` only the nodes settled in the previous round.
    * Each round is ONE equality join frontier⋈edges on the node key
    * plus ONE anti-join against the settled set — never a pair
    * explosion, and the per-round shuffle is frontier-sized, not
    * graph-sized. The edge list localCheckpoints once (at 100 TB:
    * bucket it by src instead); dist/frontier checkpoint per round so
    * plan depth stays O(1) instead of O(rounds) (the pageRank lesson:
    * re-analyzing a tree that grows per iteration costs more than the
    * data). Early-exit on an empty frontier makes the operator EAGER
    * (it counts per round) — by design for iterative graph ops, like
    * the components rounds in [[Dedup.clusters]].
    *
    * Edges are treated as undirected (both directions expanded);
    * parallel edges and self-loops are harmless (distinct frontier,
    * anti-joined). Seeds not present in the edge list still report
    * hops=0 — a seed is contaminated whether or not it has neighbors.
    */
  def bfsHops(edges: DataFrame, srcCol: String, dstCol: String,
              seeds: DataFrame, seedCol: String, maxHops: Int): DataFrame = {
    val fwd = edges.select(col(srcCol).cast("long").as("node"),
      col(dstCol).cast("long").as("nbr"))
    val e = fwd.unionByName(fwd.select(col("nbr").as("node"), col("node").as("nbr")))
      .filter(col("node").isNotNull && col("nbr").isNotNull)
      .localCheckpoint(true)
    var dist = seeds.select(col(seedCol).cast("long").as("node")).distinct()
      .withColumn("hops", lit(0)).localCheckpoint(true)
    var frontier = dist
    val spent = scala.collection.mutable.ArrayBuffer[DataFrame](dist)
    var h = 1
    var done = false
    while (h <= maxHops && !done) {
      val next = frontier.join(e, "node")
        .select(col("nbr").as("node")).distinct()
        .join(dist, Seq("node"), "left_anti")
        .withColumn("hops", lit(h))
        .localCheckpoint(true)
      if (next.isEmpty) { done = true; spent += next }
      else {
        dist = dist.unionByName(next).localCheckpoint(true)
        frontier = next
        spent += next; spent += dist
        h += 1
      }
    }
    // final result is the last `dist` checkpoint: keep it, free the rest
    val result = dist
    (Seq(e) ++ spent.filterNot(_ eq result)).foreach(graft.util.Caching.freeCheckpoint)
    result
  }

  /** EXACT triangle census per node — the transitivity/cohesion metric
    * over corpus-derived graphs (how clique-like are the near-dup
    * families, the co-order baskets, the kNN neighborhoods). Output:
    * (node, deg, tri, max_wedges) with max_wedges = C(deg, 2), so the
    * local clustering coefficient is the exact rational tri/max_wedges
    * and the global triangle count is Σ tri / 3 — all integers, no
    * float drift anywhere.
    *
    * Algorithm: compact-forward (Latapy, TCS 2008) as ONE lazy plan.
    * Undirected edges normalize to (a = least, b = greatest), dedup,
    * self-loops dropped; each edge is then ORIENTED from the lower to
    * the higher endpoint in the (degree, id) total order, and a
    * triangle {x, y, z} (orientation order x < y < z) is found exactly
    * once: as the wedge y ← x → z closed by the directed edge y → z.
    *
    * The orientation is the load-bearing scale choice, not a tie-break
    * nicety: out-degrees under (degree, id) orientation are O(√m)
    * amortized, so the wedge join emits O(m^1.5) rows — the best
    * possible for exact global triangle counting — where the naive
    * id-orientation lets one low-id hub of degree D emit C(D, 2)
    * wedges on its own (a viral near-dup family or a bestseller part
    * turns that quadratic). Every step is an equality-keyed join or a
    * map-side-combined count: wedges join on the shared LOW endpoint,
    * closure probes the (v1, v2) edge key, per-node counts explode 3
    * corner rows per triangle. Catalyst's exchange reuse dedups the
    * repeated scans of the oriented edge frame inside the single plan.
    * Parallel edges collapse (dedup); an empty graph returns empty. */
  def triangles(edges: DataFrame, srcCol: String, dstCol: String): DataFrame = {
    val e0 = edges.select(least(col(srcCol), col(dstCol)).as("a"),
        greatest(col(srcCol), col(dstCol)).as("b"))
      .filter(col("a").isNotNull && col("b").isNotNull && col("a") =!= col("b"))
      .distinct()
    val deg = e0.select(col("a").as("node"))
      .unionByName(e0.select(col("b").as("node")))
      .groupBy(col("node")).agg(count(lit(1)).as("deg"))
    val withDeg = e0
      .join(deg.select(col("node").as("a"), col("deg").as("deg_a")), "a")
      .join(deg.select(col("node").as("b"), col("deg").as("deg_b")), "b")
    // forward iff (deg_a, a) < (deg_b, b) — a TOTAL order (ids untied)
    val fwd = col("deg_a") < col("deg_b") ||
      (col("deg_a") === col("deg_b") && col("a") < col("b"))
    val dir = withDeg.select(
      when(fwd, col("a")).otherwise(col("b")).as("u"),
      when(fwd, col("b")).otherwise(col("a")).as("v"),
      when(fwd, col("deg_b")).otherwise(col("deg_a")).as("deg_v"))
    // `dir` feeds THREE scans (two wedge sides + the closure probe) and
    // its derivation is itself two joins over the deduped edge list;
    // `deg` feeds the orientation joins plus the final report. Without a
    // lease each scan re-runs the edge build — measured 19.1 s → 5.5 s
    // at sf0.1 (1.16 M co-order edges) from persisting exactly these
    // two. Persist + explicit consumption lease (not Caching.leased:
    // the m-count action below would trip that lease's release before
    // the real consumers run); blocks release once the returned plan is
    // consumed (m- and n-sized frames, safe at any scale — the 100 TB
    // form would bucket the oriented edge table on `u` instead).
    dir.persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    deg.persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    // r14 optimization pass (guide §3.1 — pick the join strategy
    // deliberately): the closure probe joins the O(m^1.5) wedge set
    // against the m-sized oriented edge list, and the wedge join's
    // output IS that wedge set — under the default sort-merge plan the
    // single largest exchange in the whole operator is the wedge set
    // shuffled by (v1, v2). When the oriented edge list fits a
    // broadcast, ship IT instead and the wedge set never crosses an
    // exchange at all: wedge build and closure probe fuse into one
    // broadcast-hash stage. The decision is SIZE-ADAPTIVE, not a blind
    // hint: m is counted on the already-persisted frame (one cheap
    // scan), and past the threshold (conf graft.triangles.broadcastMaxEdges,
    // default 4M edges ≈ 100 MB built relation) the plan degrades to
    // the former shuffle form — never an OOM-by-hint at scale.
    val m = dir.count()
    val maxBcast = try dir.sparkSession.conf
      .get("graft.triangles.broadcastMaxEdges", "4000000").toLong
    catch { case _: NumberFormatException => 4000000L }
    val dirMaybeBcast = if (m <= maxBcast) broadcast(dir) else dir
    val out = {
      val wedges = dir.select(col("u"), col("v").as("v1"), col("deg_v").as("dv1"))
        .join(dirMaybeBcast.select(col("u"), col("v").as("v2"), col("deg_v").as("dv2")),
          Seq("u"))
        .filter(col("dv1") < col("dv2") ||
          (col("dv1") === col("dv2") && col("v1") < col("v2")))
      val tri = wedges.join(
        dirMaybeBcast.select(col("u").as("v1"), col("v").as("v2")), Seq("v1", "v2"))
        .select(col("u").as("x"), col("v1").as("y"), col("v2").as("z"))
      val perNode = tri
        .select(explode(array(col("x"), col("y"), col("z"))).as("node"))
        .groupBy(col("node")).agg(count(lit(1)).as("tri"))
      deg.join(perNode, Seq("node"), "left")
        .select(col("node"), col("deg"),
          coalesce(col("tri"), lit(0L)).as("tri"),
          expr("CAST(deg * (deg - 1) DIV 2 AS BIGINT)").as("max_wedges"))
    }
    Caching.releaseOnConsumed(out, Seq(dir, deg)) { () =>
      dir.unpersist(blocking = false); deg.unpersist(blocking = false)
    }
  }
}
