package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Iterative graph computation on edge DataFrames — the second graph
  * operator family next to connected components
  * (`Dedup.nearDupComponents`).
  *
  * Weighted PageRank (Page et al. '99; the power-iteration form every
  * distributed engine ships): rank flows along out-edges proportional
  * to edge weight, damped toward the uniform distribution. Each
  * iteration is ONE shuffle (contribution groupBy on dst) plus one
  * left join back onto the node set — both keyed on the node id, so
  * the partitioning is reused across iterations; nothing ever
  * materializes beyond the node and edge relations. The node count is
  * the only driver-side scalar (same status as the vocabulary count
  * in the LM scorers).
  *
  * Iteration count is FIXED (caller-chosen), not convergence-tested —
  * that keeps the whole computation one declarative plan and makes
  * the result engine-portable (an epsilon test would couple output to
  * float drift). For web-scale graphs add a `localCheckpoint` every
  * few rounds to truncate lineage; at bounded iters the plan is fine.
  */
object Graph {

  /** @param edges (src, dst, w) with integral weight `w`; parallel
    *              edges should be pre-aggregated. Nodes with no
    *              out-edges receive damped rank but emit none
    *              (standard simplified dangling handling — document
    *              when it matters for the graph at hand).
    * @return (node, rank) for every node appearing as src or dst */
  def pageRank(edges: DataFrame, iters: Int = 5,
      damping: Double = 0.85): DataFrame = {
    // The edge subplan appears in every iteration's join, but it is
    // NOT cached deliberately: the repeated subtree shuffles on the
    // same key each round, so Spark plans ONE Exchange and reuses it
    // (ReusedExchange) — measured 2.1 s uncached vs 5.2 s persisted
    // at sf0.1 (InMemoryRelation blocks exchange reuse and pays a
    // materialization). If the edge DERIVATION ever became
    // nondeterministic, persist would be required for correctness.
    val e = edges
    val out = e.groupBy(col("src")).agg(sum(col("w")).as("outw"))
    val nodes = e.select(col("src").as("node"))
      .unionByName(e.select(col("dst").as("node")))
      .distinct()
    val n = nodes.count()
    val base = (1 - damping) / n
    var ranks = nodes.withColumn("rank", lit(1.0 / n))
    for (_ <- 1 to iters) {
      val contribs = e.join(out, "src")
        .join(ranks.select(col("node").as("src"), col("rank")), "src")
        .select(col("dst").as("node"),
          (col("rank") * col("w").cast("double") / col("outw").cast("double"))
            .as("c"))
        .groupBy(col("node")).agg(sum(col("c")).as("c"))
      ranks = nodes.join(contribs, Seq("node"), "left")
        .select(col("node"),
          (lit(base) + lit(damping) * coalesce(col("c"), lit(0.0)))
            .as("rank"))
    }
    ranks
  }

  /** Undirected co-occurrence edges (u < v) over a bucketed
    * projection: pair expansion as row-local array algebra over the
    * per-bucket SORTED user set (k² per bucket, k bounded by bucket
    * cardinality — one shuffle fewer than the equivalent bucket
    * self-join, and the sorted set gives u < v for free), kept when
    * the pair shares at least `minSupport` distinct buckets.
    *
    * @param p (bucketCol*, user) projection, pre-distinct */
  def cooccurEdges(p: DataFrame, bucketCols: Seq[String],
      userCol: String, minSupport: Int): DataFrame =
    cooccurPairCounts(p, bucketCols, userCol)
      .filter(col("w") >= minSupport)
      .select(col("u"), col("v"))

  /** The pair-count relation behind [[cooccurEdges]] — (u, v, w)
    * with w = shared-bucket count — exposed separately so callers
    * with a DATA-DERIVED support threshold (q243's 2×mean cut) can
    * filter in-plan instead of baking a constant in. */
  def cooccurPairCounts(p: DataFrame, bucketCols: Seq[String],
      userCol: String): DataFrame =
    p.groupBy(bucketCols.map(col): _*)
      .agg(sort_array(collect_set(col(userCol))).as("us"))
      .select(explode(expr(
        """flatten(transform(us, (u, i) ->
           transform(slice(us, i + 2, size(us)),
             v -> struct(u AS u, v AS v))))""")).as("e"))
      .select(col("e.u").as("u"), col("e.v").as("v"))
      .groupBy("u", "v").agg(count(lit(1)).as("w"))

  /** Min-label propagation with a FIXED iteration budget — the
    * deterministic community/component sweep (one node-keyed
    * shuffle per round; labels monotonically decrease, so k rounds
    * give every node the minimum label within k hops — exact
    * connected components once k reaches the diameter). Like
    * [[pageRank]], the edge subplan is deliberately NOT cached:
    * each round's neighbor-min join shuffles it on the same key, so
    * Spark plans one Exchange and reuses it. */
  /** k-core decomposition PROFILE under a fixed peeling budget:
    * starting from the undirected edge set, each round removes
    * every node of degree < k and the edges touching it, emitting
    * (round, n_nodes, n_edges) for round 0 and after each of
    * `rounds` peels — the shrinking-core audit (how fast the graph
    * collapses under peeling measures its cohesion; a graph whose
    * profile flatlines early HAS a k-core). Each round is one
    * degree aggregate + two semi-joins on the node key; every
    * intermediate edge set is persisted (tiny residue — the q188
    * round-boundary lesson) so later rounds and the count union
    * never re-derive earlier rounds' subplans.
    *
    * @param edges undirected (u, v) with u < v, no parallel edges */
  def kCoreProfile(edges: DataFrame, k: Int, rounds: Int): DataFrame = {
    val spark = edges.sparkSession
    import spark.implicits._
    // ONE aggregate per profile row: the directed union has every
    // edge twice, so n_edges = rows/2 and both stats share a scan.
    // (Two structures were measured and rejected at sf0.1: the
    // two-branch crossJoin profile costs an extra aggregate + BNLJ
    // per round — 24.7 s; reusing a PERSISTED per-round degree
    // relation for both the profile and the peel filter chains four
    // lazy caches through the semi-join build sides and AQE
    // re-plans each layer — 45-59 s. This shape: ~18 s, of which
    // ~8 s is the unavoidable pair expansion.)
    def profileRow(e: DataFrame, r: Int): DataFrame =
      e.select(col("u").as("n"))
        .unionByName(e.select(col("v").as("n")))
        .agg(count_distinct(col("n")).cast("long").as("n_nodes"),
          (count(lit(1)) / 2).cast("long").as("n_edges"))
        .select(lit(r.toLong).as("round"), col("n_nodes"),
          col("n_edges"))
    var e = edges.select(col("u"), col("v")).persist()
    var out = profileRow(e, 0)
    for (r <- 1 to rounds) {
      val deg = e.select(col("u").as("n"))
        .unionByName(e.select(col("v").as("n")))
        .groupBy(col("n")).agg(count(lit(1)).as("deg"))
      val keep = deg.filter(col("deg") >= k).select(col("n"))
      val next = e
        .join(keep.select(col("n").as("ku")),
          col("u") === col("ku"), "left_semi")
        .join(keep.select(col("n").as("kv")),
          col("v") === col("kv"), "left_semi")
        .persist()
      out = out.unionByName(profileRow(next, r))
      e = next
    }
    out.orderBy(col("round"))
  }

  def labelPropagation(edges: DataFrame, iters: Int): DataFrame = {
    val ed = edges.select(col("u"), col("v"))
      .unionByName(edges.select(col("v").as("u"), col("u").as("v")))
    val nodes = ed.select(col("u").as("node")).distinct()
    var labels = nodes.withColumn("lbl", col("node"))
    for (_ <- 1 to iters) {
      val m = ed
        .join(labels.select(col("node").as("v"), col("lbl")), "v")
        .groupBy(col("u")).agg(min(col("lbl")).as("minl"))
      labels = labels
        .join(m.select(col("u").as("node"), col("minl")),
          Seq("node"), "left")
        .select(col("node"),
          least(col("lbl"), coalesce(col("minl"), col("lbl")))
            .as("lbl"))
    }
    labels
  }

  /** Per-node triangle counts by degree-ordered edge orientation
    * (Schank/Wagner; the node-iterator++ every distributed engine
    * uses): each undirected edge is directed from its lower-degree
    * endpoint to its higher-degree one (ties by id), wedges are
    * generated only from a node's OUT-edges, and a wedge closes iff
    * its far pair exists in the (undirected) edge set. The total
    * order makes every triangle a wedge at exactly one apex, so no
    * dedup pass; the orientation bounds per-node wedge fan-out by
    * O(sqrt(m)) regardless of raw degree skew — the difference
    * between a web-scale graph finishing and its highest-degree hub
    * generating deg² wedges in one task. Three shuffles total (degree
    * agg, wedge self-join on apex, closing join on the far pair),
    * all on node/pair keys. Edge derivation shared with the scale
    * probe via [[cooccurEdges]] so the two cannot drift apart.
    *
    * Orientation is computed JOIN-FREE (measured 1.6× end-to-end vs
    * the degree-relation double-join at sf0.1): each edge explodes
    * into its two directed forms (row-local), deg(x) is a COUNT
    * window over the source partition, and the partner's degree
    * needs no second join — the reversed row carries it, so within
    * the unordered-pair partition (exactly two rows)
    * dy = sum(dx) − dx. Two window shuffles replace a union-agg plus
    * two joins (and their broadcast-build jobs); the edge subtree
    * feeding both the orientation and the closing join is planned
    * once via exchange reuse, so callers need not persist it.
    *
    * @param edges undirected edge list as (u, v) with u < v, no
    *              parallel edges
    * @return (user_id, n_tri): triangle participation count per
    *         node, nodes in no triangle omitted */
  def triangleCounts(edges: DataFrame): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val ex = edges.select(explode(array(
        struct(col("u").as("x"), col("v").as("y")),
        struct(col("v").as("x"), col("u").as("y")))).as("e"))
      .select(col("e.x").as("x"), col("e.y").as("y"))
    val oriented = ex
      .withColumn("dx", count(lit(1)).over(Window.partitionBy("x")))
      .withColumn("dy",
        sum(col("dx")).over(Window.partitionBy(
          least(col("x"), col("y")), greatest(col("x"), col("y"))))
          - col("dx"))
      .filter(col("dx") < col("dy") ||
        (col("dx") === col("dy") && col("x") < col("y")))
      .select(col("x").as("s"), col("y").as("t"))
    val wedges = oriented.as("e1")
      .join(oriented.as("e2"),
        col("e1.s") === col("e2.s") && col("e1.t") < col("e2.t"))
      .select(col("e1.s").as("a"), col("e1.t").as("b"), col("e2.t").as("c"))
    val tri = wedges.join(
      edges.select(col("u").as("b"), col("v").as("c")), Seq("b", "c"))
    tri.select(explode(array(col("a"), col("b"), col("c"))).as("user_id"))
      .groupBy("user_id").agg(count(lit(1)).as("n_tri"))
  }
}
