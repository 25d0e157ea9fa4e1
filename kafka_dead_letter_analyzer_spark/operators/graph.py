"""Connected components over a pair table — duplicate-cluster assignment.

A near-dup detector (minhash/simhash/embedding) emits PAIRS; a training
pipeline needs CLUSTERS (keep one canonical doc per component, drop the
rest). This is connected components over the dup-pair graph with the
component label = min member id.

Spark-first design: iterative min-label propagation on DataFrames.

- state: ``labels(id, lab)``, initialized lab = id.
- step: every node offers its label to its neighbors
  (edges are kept both directions); a node's new label is
  ``min(own, min(offered))``. Expressed as join + groupBy — two hash
  shuffles per iteration, both on ``id``, so AQE coalesces them and a
  future bucketed edge table would make them exchange-free.
- termination: labels are monotonically non-increasing and bounded, so
  the loop is a fixpoint; it converges in at most ``diameter`` rounds
  (each round a label travels one hop). ``localCheckpoint`` truncates the
  growing lineage each round — without it the plan doubles per iteration.

At 100 TB the round count, not the per-round cost, is what hurts; the
published fix is large-star/small-star (Kiveris et al., "Connected
Components in MapReduce and Beyond", SOCC'14) which contracts the graph
each round and converges in O(log n) rounds on pathological chains. Dup
graphs from banded LSH are overwhelmingly tiny cliques (diameter 1-2), so
plain propagation is the right default; the star variant is a drop-in
replacement of the step if a corpus proves chain-heavy.

Oracle (queries.py x_dup_clusters): DuckDB recursive CTE propagating
labels along the same edges — set-semantics UNION guarantees termination.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from kafka_dead_letter_analyzer_spark import cache_registry

__all__ = ["connected_components", "connected_components_star", "triangle_counts", "pagerank_int"]


def _free_checkpoint(df: DataFrame) -> None:
    """Best-effort release of a localCheckpointed DataFrame's cached
    blocks. ``localCheckpoint`` pins its RDD blocks in executor storage
    until GC and Spark exposes no public API to drop them (``spark.
    catalog.clearCache()`` only covers SQL-cached relations), so iterative
    algorithms would otherwise accumulate one generation of blocks per
    round. Reaches the checkpointed RDD through the analyzed LogicalRDD;
    silently a no-op where the internal API is unavailable (Spark
    Connect)."""
    try:
        df._jdf.queryExecution().analyzed().rdd().unpersist(False)
    except Exception:
        pass


def _driver_union_find(edge_rows) -> list:
    """Min-label union-find over collected (s, d) edge rows. Invariant:
    a tree's root is the minimum id of its component (unions always
    attach the larger root under the smaller), so root == component
    label with no extra pass. Path-halving keeps it near-linear."""

    parent: dict = {}

    def find(x):
        r = parent.setdefault(x, x)
        while parent[r] != r:
            parent[r] = parent[parent[r]]
            r = parent[r]
        parent[x] = r
        return r

    for s, d in edge_rows:
        ra, rb = find(s), find(d)
        if ra != rb:
            lo, hi = (ra, rb) if ra < rb else (rb, ra)
            parent[hi] = lo
    return [(x, find(x)) for x in parent]


def connected_components(
    pairs: DataFrame,
    src: str = "id_a",
    dst: str = "id_b",
    max_iterations: int = 50,
    driver_pair_limit: int | None = 250_000,
) -> DataFrame:
    """Resolve an undirected pair table to ``(id, component)`` where
    ``component`` is the minimum id reachable from ``id``. Only ids that
    appear in ``pairs`` are emitted (singletons are their own component
    trivially and would dominate the output).

    Two physical strategies behind one contract:

    - **Bounded driver union-find** (when the deduped edge count is at
      most ``2 * driver_pair_limit``): collect the id-only edge list and
      label components in-process. This is the same bounded-driver-action
      class as the IVF fit sample — the default bound is 500k directed
      id pairs, ~8 MB as an Arrow batch — and replaces per-round
      distributed jobs with ONE localize, which is strictly faster for
      the small-to-medium dup graphs banded LSH emits. The localize is
      ``toPandas`` (Arrow columnar), not ``collect`` — at the bound,
      Python ``Row`` objects would cost ~100 B/row vs Arrow's 16, so the
      worst-case driver materialization stays bounded by tens of MB even
      if a caller raises the limit 10×. The distributed path stays
      differential-tested against this one.
    - **Iterative min-label propagation** (above the bound, or
      ``driver_pair_limit=None``): the 100 TB shape. ``max_iterations``
      bounds PROPAGATION HOPS; the loop exits as soon as a hop changes no
      label. Exhausting the bound WITHOUT convergence raises — silently
      returning mid-propagation labels would hand a dedup pipeline wrong
      canonical ids. Diameter > 50 graphs should use
      :func:`connected_components_star` (O(log n) rounds).

    Driver-round-trip economy (iterative path): each loop iteration
    applies TWO propagation hops inside one checkpointed plan and checks
    convergence only on the second hop's change flag. That is sound —
    propagation is a monotone fixpoint, so a hop that changes nothing
    guarantees every later hop changes nothing — and it halves the
    per-hop driver actions. Each iteration also frees the previous
    iteration's checkpoint blocks, so executor storage stays at one
    generation regardless of round count.
    """
    # both directions in ONE scan of the pair lineage (a union would run
    # the upstream candidate-generation pipeline once per branch)
    edges = (
        pairs.select(
            F.explode(
                F.array(
                    F.struct(F.col(src).alias("s"), F.col(dst).alias("d")),
                    F.struct(F.col(dst).alias("s"), F.col(src).alias("d")),
                )
            ).alias("e")
        )
        .select("e.s", "e.d")
        .distinct()
        .persist()
    )
    cache_registry.track(edges)

    if driver_pair_limit is not None:
        # ONE bounded action decides the strategy AND delivers the data:
        # limit(cap+1) short-circuits over the deduped edges, so the
        # bounded case pays a single job instead of the count()+collect()
        # pair (the count probe re-ran the whole candidate pipeline as a
        # separate job — measured as the r3 CC exec regression). The
        # upstream shuffle still runs exactly once either way; an
        # over-limit probe leaves the persist primed for the hops below.
        cap = 2 * driver_pair_limit
        head = edges.limit(cap + 1).toPandas()
        # NULL-endpoint guard (r13 driver advice): pandas promotes a
        # nullable int id column containing NULLs to float64/NaN, which
        # the in-process recurrence would propagate where the
        # distributed joins drop them — fall back to the distributed
        # branch so both strategies agree.
        if len(head) <= cap and not head.isnull().values.any():
            spark = pairs.sparkSession
            from pyspark.sql import types as T

            id_type = pairs.schema[src].dataType
            # localized eagerly as ONE Arrow batch, not toLocalIterator:
            # the set is bounded by contract and toLocalIterator
            # schedules one sequential job PER PARTITION (measured 10x
            # slower on 32 partitions)
            labels = _driver_union_find(
                head.itertuples(index=False, name=None)
            )
            edges.unpersist()
            schema = T.StructType(
                [
                    T.StructField("id", id_type, False),
                    T.StructField("component", id_type, False),
                ]
            )
            # Arrow-backed localization: createDataFrame on a plain list
            # re-pickles row-by-row into 32 parallelize tasks on EVERY
            # re-execution of the returned plan (measured 0.35 s for 477
            # labels); one Arrow batch re-forces in ~0.04 s.
            import pandas as pd

            pdf = pd.DataFrame(labels or [], columns=["id", "component"])
            return spark.createDataFrame(pdf, schema)

    labels = edges.select(F.col("s").alias("id")).distinct().withColumn(
        "lab", F.col("id")
    )
    labels = labels.localCheckpoint(eager=True)

    def _hop(lab_df: DataFrame) -> DataFrame:
        offered = (
            edges.join(lab_df, edges["s"] == lab_df["id"], "inner")
            .groupBy(F.col("d").alias("id"))
            .agg(F.min("lab").alias("offered"))
        )
        return lab_df.join(offered, "id", "left").select(
            "id",
            F.least(
                F.col("lab"), F.coalesce(F.col("offered"), F.col("lab"))
            ).alias("lab"),
            (F.col("offered") < F.col("lab")).alias("_changed"),
        )

    converged = False
    prev_ckpt = labels
    for _ in range(0, max_iterations, 2):
        # two hops per checkpointed plan; convergence read from the SECOND
        new_labels = _hop(_hop(labels).drop("_changed"))
        new_labels = new_labels.localCheckpoint(eager=True)
        _free_checkpoint(prev_ckpt)
        prev_ckpt = new_labels
        changed = new_labels.filter(F.col("_changed")).limit(1).count()
        labels = new_labels.drop("_changed")
        if changed == 0:
            converged = True
            break
    edges.unpersist()
    if not converged:
        raise RuntimeError(
            f"connected_components did not converge in {max_iterations} "
            "rounds (graph diameter exceeds the bound) — raise "
            "max_iterations or use connected_components_star"
        )
    return labels.select(F.col("id"), F.col("lab").alias("component"))


def _large_star(edges: DataFrame) -> DataFrame:
    """One large-star round: every node connects its strictly-larger
    neighbors to its smallest neighborhood member (Kiveris et al. SOCC'14,
    Alg. 2). ``edges`` is the bidirectional edge list (s, d)."""
    m = edges.groupBy("s").agg(F.least(F.min("d"), F.first("s")).alias("m"))
    return (
        edges.join(m, "s")
        .filter(F.col("d") > F.col("s"))
        .select(F.col("d").alias("s"), F.col("m").alias("d"))
        .filter(F.col("s") != F.col("d"))
        .distinct()
    )


def _small_star(edges: DataFrame) -> DataFrame:
    """One small-star round: every node connects its smaller-or-equal
    neighbors (and itself) to the minimum of that set (Alg. 3). Operates
    on directed (s, d) with d <= s invariant from large-star output."""
    neigh = edges.filter(F.col("d") <= F.col("s"))
    m = neigh.groupBy("s").agg(F.least(F.min("d"), F.first("s")).alias("m"))
    out = (
        neigh.join(m, "s")
        .select(F.col("d").alias("s"), F.col("m").alias("d"))
        .union(m.select(F.col("s"), F.col("m").alias("d")))
        .filter(F.col("s") != F.col("d"))
        .distinct()
    )
    return out


def connected_components_star(
    pairs: DataFrame,
    src: str = "id_a",
    dst: str = "id_b",
    max_iterations: int = 30,
) -> DataFrame:
    """Connected components via alternating large-star / small-star
    contraction (Kiveris et al., "Connected Components in MapReduce and
    Beyond", SOCC'14) — converges in O(log n) rounds REGARDLESS of graph
    diameter, unlike plain min-label propagation's O(diameter). Use this
    variant when the dup graph may contain long chains (transitive
    near-dup runs); for the clique-heavy graphs banded LSH emits, plain
    :func:`connected_components` does fewer shuffles per round.

    Same output contract: (id, component=min member id), only ids that
    appear in ``pairs``. Termination: the edge multiset is monotonically
    contracting toward star graphs; the loop exits when a round changes
    nothing (checked via count — edges after small-star are exactly the
    (member -> center) map when converged).
    """
    # localCheckpoint (not persist): materialized once, truncates the pair
    # lineage, and leaves nothing cached behind after the call
    nodes = (
        pairs.select(F.col(src).alias("id"))
        .union(pairs.select(F.col(dst).alias("id")))
        .distinct()
        .localCheckpoint(eager=True)
    )
    edges = (
        pairs.select(
            F.explode(
                F.array(
                    F.struct(F.col(src).alias("s"), F.col(dst).alias("d")),
                    F.struct(F.col(dst).alias("s"), F.col(src).alias("d")),
                )
            ).alias("e")
        )
        .select("e.s", "e.d")
        .distinct()
    )
    edges = edges.localCheckpoint(eager=True)
    prev_count = -1
    converged = False
    for _ in range(max_iterations):
        # large-star needs both directions; small-star output is directed
        # (s, d<=s), so rebuild the symmetric view first
        sym = edges.select("s", "d").union(
            edges.select(F.col("d").alias("s"), F.col("s").alias("d"))
        ).distinct()
        contracted = _small_star(_large_star(sym))
        contracted = contracted.localCheckpoint(eager=True)
        n = contracted.count()
        if n == prev_count and contracted.exceptAll(edges).isEmpty():
            _free_checkpoint(edges)
            edges = contracted
            converged = True
            break
        prev_count = n
        _free_checkpoint(edges)
        edges = contracted
    if not converged:
        raise RuntimeError(
            f"connected_components_star did not converge in {max_iterations} "
            "rounds — the post-loop star-arc mapping would be wrong on a "
            "mid-contraction edge set; raise max_iterations"
        )
    # converged: edges are (member, center) star arcs; every node not a
    # source is its own center
    comp = edges.select(F.col("s").alias("id"), F.col("d").alias("component"))
    return (
        nodes.join(comp, "id", "left")
        .select(
            "id", F.coalesce(F.col("component"), F.col("id")).alias("component")
        )
    )


def triangle_counts(
    edges: DataFrame, src: str = "id_a", dst: str = "id_b"
) -> DataFrame:
    """Per-node triangle counts over an undirected edge table —
    ``(node, triangles BIGINT)`` for every node in at least one triangle.

    The distributed-classic formulation (Suri & Vassilvitskii, WWW'11
    "Counting Triangles and the Curse of the Last Reducer"): orient every
    edge from the endpoint with the SMALLER (degree, id) to the larger,
    then each triangle {u, v, w} is found exactly once — as the wedge
    (u->v, u->w) at its minimum-order corner u, closed by the oriented
    edge v->w.  The orientation is the whole scale story: a node's
    out-degree under it is O(sqrt(|E|)) regardless of its raw degree, so
    the wedge fan-out on a power-law graph (where a celebrity node would
    otherwise generate degree^2 wedges — the "last reducer") is bounded;
    wedges total at most O(|E|^{3/2}).

    Plan shape: canonical-dedup (one shuffle), degree agg (one
    shuffle over endpoint ids), two joins to attach endpoint degrees, a
    self-equi-join on the wedge corner, and a final equi-join probing the
    closing edge — all joins on plain ids, no cartesian anywhere, so AQE
    handles skew.  The per-node rollup explodes each triangle's three
    corners (3 rows per triangle, combined map-side).

    Cross-engine determinism: degrees, the (degree, id) order, and every
    join are exact integer/string operations — the DuckDB oracle unrolls
    the same orientation (queries.py x_triangle_counts).
    """
    e = (
        edges.filter(F.col(src) != F.col(dst))
        .select(
            F.least(src, dst).alias("a"), F.greatest(src, dst).alias("b")
        )
        .distinct()
    )
    # the canonical edge list is consumed by the degree union (twice)
    # and the degree-attach join; without a persist each consumer
    # re-runs the whole upstream candidate-generation pipeline (no
    # ReusedExchange across these shapes — verified in the plan).
    # Measured on x_triangle_counts sf0.1, same-session A/B, best of 5
    # warm reps: 2.24 s unpersisted -> 1.70 s with this + the oriented
    # persist below.
    e = e.persist()
    cache_registry.track(e)
    deg = (
        e.select(F.col("a").alias("n"))
        .unionAll(e.select(F.col("b").alias("n")))
        .groupBy("n")
        .agg(F.count(F.lit(1)).alias("d"))
    )
    da = deg.select(F.col("n").alias("a"), F.col("d").alias("da"))
    db = deg.select(F.col("n").alias("b"), F.col("d").alias("db"))
    with_deg = e.join(da, "a").join(db, "b")
    # orient lower (degree, id) -> higher; (a < b) breaks degree ties
    lower_first = (F.col("da") < F.col("db")) | (
        (F.col("da") == F.col("db")) & (F.col("a") < F.col("b"))
    )
    oriented = with_deg.select(
        F.when(lower_first, F.col("a")).otherwise(F.col("b")).alias("u"),
        F.when(lower_first, F.col("b")).otherwise(F.col("a")).alias("v"),
        F.when(lower_first, F.col("db")).otherwise(F.col("da")).alias("dv"),
    )
    # three consumers (both wedge legs + the closing probe)
    oriented = oriented.persist()
    cache_registry.track(oriented)
    o1 = oriented.select(
        F.col("u").alias("wu"), F.col("v").alias("wv"), F.col("dv").alias("wdv")
    )
    o2 = oriented.select(
        F.col("u").alias("wu"), F.col("v").alias("ww"), F.col("dv").alias("wdw")
    )
    # wedge (u->v, u->w) with v before w in the SAME (degree, id) order,
    # so the closing probe looks for exactly the oriented edge v->w
    wedges = o1.join(o2, "wu").filter(
        (F.col("wdv") < F.col("wdw"))
        | ((F.col("wdv") == F.col("wdw")) & (F.col("wv") < F.col("ww")))
    )
    closing = oriented.select(
        F.col("u").alias("wv2"), F.col("v").alias("ww2")
    )
    triangles = wedges.join(
        closing,
        (F.col("wv") == F.col("wv2")) & (F.col("ww") == F.col("ww2")),
    ).select("wu", "wv", "ww")
    return (
        triangles.select(
            F.explode(F.array("wu", "wv", "ww")).alias("node")
        )
        .groupBy("node")
        .agg(F.count(F.lit(1)).cast("bigint").alias("triangles"))
    )


def _driver_pagerank(
    edge_rows,
    iters: int,
    scale: int,
    damping_num: int,
    damping_den: int,
) -> list:
    """In-process integer power iteration over a bounded edge list —
    the bounded-driver-action twin of :func:`_driver_union_find` /
    :func:`_driver_kcore`.  Bit-identical to the distributed recurrence:
    same truncating divisions in the same order (all quantities are
    non-negative, so Python ``//`` and SQL ``DIV`` agree).  Returns
    sorted ``(node, rank_int)`` tuples."""
    from collections import defaultdict

    od: dict = defaultdict(int)
    nodes = set()
    edge_list = []
    for u, v in edge_rows:
        od[u] += 1
        nodes.add(u)
        nodes.add(v)
        edge_list.append((u, v))
    base = (scale * (damping_den - damping_num)) // damping_den
    rank = {n: scale for n in nodes}
    for _ in range(iters):
        s: dict = defaultdict(int)
        for u, v in edge_list:
            s[v] += rank[u] // od[u]
        rank = {
            n: base + (damping_num * s.get(n, 0)) // damping_den
            for n in nodes
        }
    return sorted(rank.items())


def pagerank_int(
    edges: DataFrame,
    src: str = "id_a",
    dst: str = "id_b",
    iters: int = 3,
    scale: int = 1_000_000,
    damping_num: int = 85,
    damping_den: int = 100,
    driver_pair_limit: int | None = 250_000,
) -> DataFrame:
    """Integer-exact PageRank over a directed edge table —
    ``(node, rank_int BIGINT)`` after a FIXED number of power
    iterations, every arithmetic step integer (truncating division), so
    the result is bit-identical on any engine / partitioning / retry —
    the same determinism contract as ``kmeans_fit_int``, with the SQL
    oracle unrolling the iterations as CTEs (queries.py
    x_pagerank_int).

    Update rule (simplified PageRank, no dangling redistribution —
    dangling mass decays, documented):

        contrib(u)  = rank(u) DIV outdeg(u)            per edge u->v
        rank'(v)    = base + (d_num * sum contribs) DIV d_den
        base        = (scale * (d_den - d_num)) DIV d_den

    Division BEFORE the sum and once after — a fixed evaluation order
    both engines reproduce exactly (floats would round differently
    under reassociation).

    Scale shape: each iteration is one equi-join (ranks ⋈ edges on src
    — ranks is |V| rows and BROADCASTS when small; hash join otherwise)
    plus one groupBy(dst) with map-side partial sums; the edge list,
    node set and out-degrees persist ONCE (registry-tracked) and the
    rank frame lineage is truncated per iteration with a lazy
    ``localCheckpoint``, so the plan reads each invariant from cache
    instead of re-deriving it per iteration per branch.  Nodes with no
    in-edges keep ``base`` via the left join back onto the node set.

    Two physical strategies behind one contract (r13 optimization, the
    :func:`connected_components` / :func:`kcore_nodes` pattern): when
    the edge list is at most ``2 * driver_pair_limit`` rows, ONE
    bounded localize (Arrow ``toPandas`` via ``limit(cap+1)``, which
    doubles as the strategy probe) runs the same integer recurrence
    in-process and returns one Arrow-backed local frame — the unrolled
    distributed plan re-evaluated the edge derivation once per
    iteration per branch (38 Exchange + 9 BroadcastExchange at 3
    iterations, the plan-sweep maximum over all declared queries) for
    a |V|-row result.  Above the bound, or ``driver_pair_limit=None``,
    the distributed iteration below is the 100 TB shape; the two paths
    are differential-tested bit-equal.
    """
    e = edges.select(F.col(src).alias("u"), F.col(dst).alias("v"))
    if driver_pair_limit is not None:
        cap = 2 * driver_pair_limit
        head = e.limit(cap + 1).toPandas()
        # NULL-endpoint guard (r13 driver advice): a NULL src/dst id
        # becomes NaN under the pandas localize and _driver_pagerank
        # would feed it through the recurrence (and createDataFrame
        # then rejects the nullable=False node field) — the
        # distributed branch's null-unsafe joins drop those
        # contributions, so fall through to it and stay bit-equal.
        if len(head) <= cap and not head.isnull().values.any():
            import pandas as pd
            from pyspark.sql import types as T

            spark = edges.sparkSession
            id_type = edges.schema[src].dataType
            labels = _driver_pagerank(
                head.itertuples(index=False, name=None),
                iters,
                scale,
                damping_num,
                damping_den,
            )
            schema = T.StructType(
                [
                    T.StructField("node", id_type, False),
                    T.StructField("rank_int", T.LongType(), False),
                ]
            )
            pdf = pd.DataFrame(labels or [], columns=["node", "rank_int"])
            return spark.createDataFrame(pdf, schema)
    # Distributed path — the 100 TB shape (r14, VERDICT r13 next-#3).
    # The unrolled loop otherwise re-derives e/outdeg/nodes once per
    # iteration per branch (38 Exchange + 18 BroadcastExchange at 3
    # iterations — the r13 plan-sweep maximum): persist the
    # per-iteration INVARIANTS once (registry-tracked, released at the
    # session owner's boundary) and truncate the rank lineage each
    # iteration with a LAZY localCheckpoint (LogicalRDD cuts the plan
    # immediately; materialization happens on first force, so
    # construction stays action-free).  The sf0.1 bench never takes
    # this branch (the bounded driver path covers it); the old "persist
    # LOSES 1.15 -> 1.37 s" A/B predates the driver path and priced
    # exactly that small-scale regime.
    e = e.persist()
    cache_registry.track(e)
    nodes = (
        e.select(F.col("u").alias("node"))
        .unionAll(e.select(F.col("v").alias("node")))
        .distinct()
        .persist()
    )
    cache_registry.track(nodes)
    outdeg = e.groupBy("u").agg(F.count(F.lit(1)).alias("od")).persist()
    cache_registry.track(outdeg)
    base = (scale * (damping_den - damping_num)) // damping_den
    ranks = nodes.select("node", F.lit(scale).cast("bigint").alias("rank_int"))
    for it in range(iters):
        contribs = (
            ranks.join(e, ranks.node == e.u)
            .join(outdeg, "u")
            .select(
                F.col("v").alias("node"),
                F.expr("rank_int DIV od").alias("c"),
            )
            .groupBy("node")
            .agg(F.sum("c").alias("s"))
        )
        ranks = (
            nodes.join(contribs, "node", "left")
            .select(
                "node",
                (
                    F.lit(base)
                    + F.expr(
                        f"({damping_num} * coalesce(s, 0)) DIV {damping_den}"
                    )
                )
                .cast("bigint")
                .alias("rank_int"),
            )
        )
        # truncate lineage BETWEEN iterations only — the returned
        # frame keeps the last iteration's real plan (auditable, and
        # consumers see the true shape), while every earlier iteration
        # is one bounded LogicalRDD instead of a re-derivation chain.
        if it < iters - 1:
            ranks = ranks.localCheckpoint(eager=False)
    return ranks


def _driver_kcore(edge_rows, k: int) -> list:
    """In-process simultaneous peeling over a bounded edge list —
    the bounded-driver-action twin of :func:`_driver_union_find`.
    Returns sorted ``(node, core_degree)`` tuples."""
    from collections import defaultdict

    adj = defaultdict(set)
    for u, v in edge_rows:
        if u != v:
            adj[u].add(v)
            adj[v].add(u)
    alive = set(adj)
    while True:
        nxt = {u for u in alive if len(adj[u] & alive) >= k}
        if nxt == alive:
            return sorted((u, len(adj[u] & alive)) for u in alive)
        alive = nxt


def kcore_nodes(
    pairs: DataFrame,
    k: int,
    src: str = "id_a",
    dst: str = "id_b",
    max_rounds: int = 6,
    driver_pair_limit: int | None = 250_000,
) -> DataFrame:
    """``k``-core of the undirected graph given as a pair table:
    iteratively peel every node of degree < ``k`` until a fixpoint
    (Seidman 1983 degeneracy peeling, bulk-synchronous form: each round
    recomputes degrees restricted to the surviving node set and drops
    the under-degree nodes SIMULTANEOUSLY — order-independent, so the
    result is the unique maximal k-core however the engine schedules
    it).  Returns ``(node, core_degree)`` — the surviving nodes with
    their degree INSIDE the core (``core_degree >= k`` by definition).

    Dedup-pipeline use: near-dup pair graphs mix true duplicate cliques
    with transitive CHAINS (A~B~C where A!~C — the drift that makes
    connected-component canonicalization over-merge).  The 2-core keeps
    exactly the nodes with two independent duplicate witnesses (every
    clique of size >= 3), while pure chains peel away — the
    precision-side complement to :func:`connected_components`.

    Scale shape: edges symmetrize in ONE scan of the pair lineage (the
    explode trick from connected_components) and persist; each round is
    two alive-set equi-semi-joins + a map-side-combined degree count +
    ONE bounded driver action (the alive count, monotone decreasing —
    equal counts <=> fixpoint).  ``max_rounds`` bounds the rounds; a
    non-converged exit RAISES rather than returning a mid-peel set
    (same contract as connected_components' hop bound).  Peeling can
    need O(diameter) rounds on pathological chains, but threshold dup
    graphs converge in 2-3 (measured: 2 at sf0.01 and sf0.1); the
    declared oracle unrolls the same fixed round count, sound because
    post-fixpoint rounds are idempotent.

    Like :func:`connected_components`, a BOUNDED DRIVER strategy sits in
    front of the loop: one ``limit(cap+1)`` probe over the deduped
    symmetric edges decides — at most ``2 * driver_pair_limit`` directed
    edges peel in-process (dup graphs banded/thresholded joins emit are
    tiny; the per-round jobs dominated the measured cost at 12.6 s for a
    25-edge graph), anything larger runs the distributed rounds (an
    over-limit probe leaves the persist primed). The two strategies are
    differential-tested against each other."""
    if k < 1:
        raise ValueError(f"kcore_nodes: k must be >= 1, got {k}")
    sym = (
        pairs.select(
            F.explode(
                F.array(
                    F.struct(F.col(src).alias("u"), F.col(dst).alias("v")),
                    F.struct(F.col(dst).alias("u"), F.col(src).alias("v")),
                )
            ).alias("e")
        )
        .select("e.u", "e.v")
        .distinct()
        .persist()
    )
    cache_registry.track(sym)

    if driver_pair_limit is not None:
        cap = 2 * driver_pair_limit
        # same Arrow-batch localize rationale as connected_components:
        # one short-circuiting job, 16 B/edge on the driver, never
        # cap+1 Python Row objects.
        head = sym.limit(cap + 1).toPandas()
        # NULL-endpoint guard: same rationale as connected_components.
        if len(head) <= cap and not head.isnull().values.any():
            spark = pairs.sparkSession
            from pyspark.sql import types as T

            id_type = pairs.schema[src].dataType
            core = _driver_kcore(head.itertuples(index=False, name=None), k)
            sym.unpersist()
            schema = T.StructType(
                [
                    T.StructField("node", id_type, False),
                    T.StructField("core_degree", T.LongType(), False),
                ]
            )
            import pandas as pd

            pdf = pd.DataFrame(core or [], columns=["node", "core_degree"])
            return spark.createDataFrame(pdf, schema).select(
                F.col("node").cast("bigint").alias("node"),
                F.col("core_degree").cast("bigint").alias("core_degree"),
            )

    def _core_degrees(alive_df: DataFrame) -> DataFrame:
        au = alive_df.select(F.col("node").alias("u"))
        av = alive_df.select(F.col("node").alias("v"))
        return (
            sym.join(au, "u")
            .join(av, "v")
            .groupBy("u")
            .agg(F.count(F.lit(1)).alias("deg"))
        )

    alive = sym.select(F.col("u").alias("node")).distinct()
    alive = alive.localCheckpoint(eager=True)
    n_alive = alive.count()
    prev_ckpt = alive
    for _ in range(max_rounds):
        deg = _core_degrees(alive)
        new_alive = deg.filter(F.col("deg") >= k).select(
            F.col("u").alias("node")
        )
        new_alive = new_alive.localCheckpoint(eager=True)
        n_new = new_alive.count()
        _free_checkpoint(prev_ckpt)
        prev_ckpt = new_alive
        alive = new_alive
        if n_new == n_alive:
            # monotone-decreasing node set: equal size <=> fixpoint
            return (
                _core_degrees(alive)
                .select(
                    F.col("u").cast("bigint").alias("node"),
                    F.col("deg").cast("bigint").alias("core_degree"),
                )
            )
        n_alive = n_new
    raise RuntimeError(
        f"kcore_nodes: no fixpoint within {max_rounds} rounds "
        f"(still peeling at {n_alive} nodes) — raise max_rounds"
    )


def _driver_bfs(edge_rows, seed_ids, max_hops: int) -> list:
    """In-process multi-source BFS over a bounded edge list — the
    bounded-driver-action twin of :func:`_driver_union_find` /
    :func:`_driver_kcore`.  Returns sorted ``(node, hop)`` tuples for
    every node reachable from the seed set; raises (same contract as
    the distributed rounds) if any reachable node is farther than
    ``max_hops``."""
    from collections import defaultdict

    adj = defaultdict(set)
    for u, v in edge_rows:
        if u != v:
            adj[u].add(v)
            adj[v].add(u)
    hops = {s: 0 for s in seed_ids}
    frontier = set(hops)
    h = 0
    while frontier:
        h += 1
        if h > max_hops:
            raise RuntimeError(
                f"bfs_hops: frontier still expanding after {max_hops} "
                "hops — raise max_hops"
            )
        nxt = set()
        for u in frontier:
            for v in adj[u]:
                if v not in hops:
                    hops[v] = h
                    nxt.add(v)
        frontier = nxt
    return sorted(hops.items())


def bfs_hops(
    pairs: DataFrame,
    seeds: DataFrame,
    src: str = "id_a",
    dst: str = "id_b",
    max_hops: int = 8,
    driver_pair_limit: int | None = 250_000,
) -> DataFrame:
    """Multi-source BFS hop distance over the undirected pair graph:
    ``(node, hop)`` for every node reachable from the ``seeds`` frame
    (one ``node`` column; hop 0), minimum number of edges to the
    nearest seed.

    Dedup-pipeline use: with seeds = each component's canonical (min-id)
    representative, ``hop`` is how far a document drifted from its
    canonical through pairwise-similar intermediates — the CHAIN-LENGTH
    diagnostic for transitive over-merge.  :func:`kcore_nodes` answers
    "does this node have dense duplicate witnesses"; this answers "how
    many weak links connect it to its cluster's representative" —
    hop >= 3 members of a 2-core-empty cluster are precisely the
    drift-merge suspects.

    Same two-strategies-one-contract structure as
    :func:`connected_components` / :func:`kcore_nodes`: a single
    ``limit(cap+1)`` Arrow-batch probe decides; under the cap the BFS
    runs in-process, above it bulk-synchronous frontier rounds (one
    equi-join + one anti-join per hop, each round's frontier
    localCheckpointed and the previous one freed).  BOTH strategies
    RAISE if a reachable node lies beyond ``max_hops`` — a silent
    truncation would report a drifted document as close to canonical.
    Frontier rounds are exact BFS: a node enters ``visited`` at its
    first (minimal) hop, so no re-visits and the work per round is the
    frontier's edge neighborhood, never the whole graph again.
    """
    if max_hops < 1:
        raise ValueError(f"bfs_hops: max_hops must be >= 1, got {max_hops}")
    sym = (
        pairs.select(
            F.explode(
                F.array(
                    F.struct(F.col(src).alias("u"), F.col(dst).alias("v")),
                    F.struct(F.col(dst).alias("u"), F.col(src).alias("v")),
                )
            ).alias("e")
        )
        .select("e.u", "e.v")
        .distinct()
        .persist()
    )
    cache_registry.track(sym)
    spark = pairs.sparkSession

    if driver_pair_limit is not None:
        cap = 2 * driver_pair_limit
        head = sym.limit(cap + 1).toPandas()
        # NULL-endpoint guard: same rationale as connected_components.
        if len(head) <= cap and not head.isnull().values.any():
            from pyspark.sql import types as T

            seed_ids = [r[0] for r in seeds.select("node").toPandas().itertuples(index=False, name=None)]
            out = _driver_bfs(
                head.itertuples(index=False, name=None), seed_ids, max_hops
            )
            sym.unpersist()
            id_type = pairs.schema[src].dataType
            schema = T.StructType(
                [
                    T.StructField("node", id_type, False),
                    T.StructField("hop", T.LongType(), False),
                ]
            )
            import pandas as pd

            pdf = pd.DataFrame(out or [], columns=["node", "hop"])
            return spark.createDataFrame(pdf, schema).select(
                "node", F.col("hop").cast("bigint").alias("hop")
            )

    visited = seeds.select("node", F.lit(0).alias("hop"))
    visited = visited.localCheckpoint(eager=True)
    frontier = visited.select("node")
    prev_ckpts = [visited]
    for h in range(1, max_hops + 1):
        nxt = (
            sym.join(frontier.select(F.col("node").alias("u")), "u")
            .select(F.col("v").alias("node"))
            .distinct()
            .join(visited.select("node"), "node", "left_anti")
        )
        nxt = nxt.localCheckpoint(eager=True)
        n_new = nxt.count()
        if n_new == 0:
            for c in prev_ckpts[:-1]:
                _free_checkpoint(c)
            return visited.select(
                "node", F.col("hop").cast("bigint").alias("hop")
            )
        visited = visited.unionByName(
            nxt.withColumn("hop", F.lit(h))
        ).localCheckpoint(eager=True)
        prev_ckpts.append(nxt)
        prev_ckpts.append(visited)
        frontier = nxt
    # one more expansion would tell us whether anything lies beyond the
    # bound; compute it and raise if so (monotone: empty <=> converged)
    residue = (
        sym.join(frontier.select(F.col("node").alias("u")), "u")
        .select(F.col("v").alias("node"))
        .distinct()
        .join(visited.select("node"), "node", "left_anti")
        .limit(1)
        .count()
    )
    for c in prev_ckpts[:-1]:
        _free_checkpoint(c)
    if residue:
        raise RuntimeError(
            f"bfs_hops: frontier still expanding after {max_hops} hops — "
            "raise max_hops"
        )
    return visited.select("node", F.col("hop").cast("bigint").alias("hop"))
