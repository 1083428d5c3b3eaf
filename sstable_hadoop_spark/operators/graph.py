"""Link-graph PageRank in exact integer arithmetic.

Web-scale training corpora weight documents by link authority
(Common-Crawl curation ranks hosts with harmonic centrality /
PageRank before sampling); this module provides that signal as a
declarative DataFrame loop — a beyond-reference extension in the
training-pipeline family (SURVEY.md §2 extensions; the reference
engine, SSTableDataRecordReader.scala and friends, has no graph
surface at all).

Determinism contract (the house pattern): ranks live in integer
MICRO-units.  Every node starts at 1_000_000; one iteration is

    contrib(v) = Σ_{(u,v) ∈ E}  rank(u) div outdeg(u)     -- BIGINT div
    rank'(v)   = base + (damping_pm * contrib(v)) div 1000

with ``base = (1000 - damping_pm) * 1000`` (0.15/0.85 at the default
``damping_pm=850``).  Both engines truncate BIGINT division
identically (Spark ``div``, DuckDB ``//``), so a fixed iteration
count yields bit-identical ranks under ANY partitioning — the same
quantize-once trick the sketch and resample operators use.  Dangling
nodes (no out-edges) simply leak their mass, the classic simplified
formulation; with a fixed iteration count the result is still exact
and cross-engine stable.  Truncation loses < outdeg(u) micro-units
per node per iteration — noise at the 1e6 scale, and identical noise
in both engines, which is the point.

Scale shape (100 TB): edges are the big table.  They are augmented
with out-degrees ONCE (one src-keyed exchange) and cached; each
iteration is then one src-keyed join (ranks are node-sized, far
smaller than edges) plus one dst-keyed aggregation with map-side
partial sums.  Iterations are a fixed small count (the web-curation
use runs 3-10), so total cost is O(n_iter × |E| shuffle) with no
driver-side data, no collect, and lineage truncated per iteration
(localCheckpoint) so the plan never grows with n_iter.  A deployment
at petabyte edge counts would pre-bucket edges by src so the
per-iteration join is exchange-free on the edge side — the same
bucketing story as the LWW tables (operators/layout.py).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

__all__ = ["pagerank", "stage_pagerank_edges", "pagerank_bucketed",
           "connected_components", "triangle_count"]


def pagerank(edges: DataFrame, n_iter: int = 5,
             src: str = "src", dst: str = "dst",
             weight: str | None = None,
             damping_pm: int = 850,
             checkpoint: bool = True) -> DataFrame:
    """Fixed-iteration integer PageRank over ``edges``.

    ``edges``: one row per directed edge (``src`` → ``dst``);
    parallel edges count multiply (both engines agree).  Nodes are
    the union of sources and destinations.  Returns ``(id, rank)``
    with ``rank`` in micro-units (BIGINT), bit-deterministic for a
    given ``(edges, n_iter, damping_pm)`` on any cluster layout.

    ``weight`` (optional): a positive INTEGER edge-weight column —
    each edge then carries ``rank · w div Σw(src)`` instead of the
    uniform ``rank div outdeg`` (the weighted random surfer); with
    all weights 1 the two are identical by construction.  Keep
    weights small integers: the per-edge product must stay inside
    BIGINT next to micro-unit ranks.

    ``damping_pm`` is the damping factor in per-mille (850 = 0.85).
    ``checkpoint=False`` keeps full lineage (only for plan tests).
    """
    if n_iter < 1:
        raise ValueError(f"n_iter must be >= 1, got {n_iter}")
    if not 0 < damping_pm < 1000:
        raise ValueError(
            f"damping_pm must be in (0, 1000), got {damping_pm}")
    w = (F.col(weight).cast("long") if weight is not None
         else F.lit(1).cast("long"))
    e = edges.select(F.col(src).alias("_src"), F.col(dst).alias("_dst"),
                     w.alias("_w"))
    nodes = (e.select(F.col("_src").alias("id"))
              .union(e.select(F.col("_dst").alias("id")))
              .distinct())
    outdeg = e.groupBy("_src").agg(
        F.sum("_w").cast("long").alias("_d"))
    # (src, dst, weight, total-weight) — per-iteration input, built once
    fan = e.join(outdeg, "_src")
    if checkpoint:
        fan = fan.localCheckpoint(eager=False)
    base = F.lit((1000 - damping_pm) * 1000).cast("long")
    ranks = nodes.select("id",
                         F.lit(1_000_000).cast("long").alias("rank"))
    for _ in range(n_iter):
        contrib = (fan.join(ranks, fan["_src"] == ranks["id"])
                      .select(F.col("_dst").alias("id"),
                              F.expr("(rank * _w) div _d").alias("_c"))
                      .groupBy("id")
                      .agg(F.sum("_c").cast("long").alias("_contrib")))
        ranks = (nodes.join(contrib, "id", "left")
                      .select("id",
                              (base + F.expr(
                                  f"({damping_pm} * coalesce(_contrib,"
                                  f" 0)) div 1000").cast("long"))
                              .alias("rank")))
        if checkpoint:
            ranks = ranks.localCheckpoint(eager=False)
    return ranks


def stage_pagerank_edges(spark, edges: DataFrame, path: str,
                         table: str, n_buckets: int,
                         src: str = "src", dst: str = "dst",
                         weight: str | None = None) -> DataFrame:
    """Pay PageRank's edge-side shuffle ONCE, at layout time: write
    the per-iteration fan table ``(_src, _dst, _w, _d)`` — edges
    augmented with their source's total out-weight — as a catalog-
    declared bucketed table CLUSTERED BY ``_src`` (layout.py
    write_bucketed/bucketed_table), so every later
    :func:`pagerank_bucketed` iteration joins ranks against a scan
    that already satisfies the join's clustering and plans ZERO
    exchanges on the EDGE side.  At petabyte edge counts this is the
    difference between shuffling |E| once per day (layout) and once
    per iteration per run (the in-memory ``pagerank`` path, which
    remains correct for one-shot graphs).  Returns the declared
    table's DataFrame."""
    from .layout import bucketed_table, write_bucketed

    w = (F.col(weight).cast("long") if weight is not None
         else F.lit(1).cast("long"))
    e = edges.select(F.col(src).alias("_src"),
                     F.col(dst).alias("_dst"), w.alias("_w"))
    outdeg = e.groupBy("_src").agg(
        F.sum("_w").cast("long").alias("_d"))
    fan = e.join(outdeg, "_src")
    write_bucketed(fan, path, table, ("_src",), n_buckets,
                   sort_by=("_src",))
    ddl = ", ".join(f"{f.name} {f.dataType.simpleString()}"
                    for f in fan.schema.fields)
    return bucketed_table(spark, table, path, ddl,
                          ("_src",), n_buckets, sort_by=("_src",))


def pagerank_bucketed(fan: DataFrame, n_iter: int = 5,
                      damping_pm: int = 850,
                      checkpoint: bool = True) -> DataFrame:
    """Fixed-iteration integer PageRank over a PRE-BUCKETED fan table
    (:func:`stage_pagerank_edges`) — bit-identical ranks to
    :func:`pagerank` on the same edges (same integer recursion, and
    partitioning never changes integer results), but the per-
    iteration join's edge side is the bucketed scan: Catalyst plans
    NO exchange above it (plan-asserted in tests/test_graph.py), so
    each iteration shuffles only the NODE-sized ranks (once into the
    join's clustering, once for the dst aggregation).  Total
    per-iteration network cost is O(|V|), not O(|E|) — the 100 TB
    shape the module docstring promises."""
    if n_iter < 1:
        raise ValueError(f"n_iter must be >= 1, got {n_iter}")
    if not 0 < damping_pm < 1000:
        raise ValueError(
            f"damping_pm must be in (0, 1000), got {damping_pm}")
    nodes = (fan.select(F.col("_src").alias("id"))
                .union(fan.select(F.col("_dst").alias("id")))
                .distinct())
    if checkpoint:
        nodes = nodes.localCheckpoint(eager=False)
    base = F.lit((1000 - damping_pm) * 1000).cast("long")
    ranks = nodes.select("id",
                         F.lit(1_000_000).cast("long").alias("rank"))
    for _ in range(n_iter):
        contrib = (fan.join(ranks, fan["_src"] == ranks["id"])
                      .select(F.col("_dst").alias("id"),
                              F.expr("(rank * _w) div _d").alias("_c"))
                      .groupBy("id")
                      .agg(F.sum("_c").cast("long").alias("_contrib")))
        ranks = (nodes.join(contrib, "id", "left")
                      .select("id",
                              (base + F.expr(
                                  f"({damping_pm} * coalesce(_contrib,"
                                  f" 0)) div 1000").cast("long"))
                              .alias("rank")))
        if checkpoint:
            ranks = ranks.localCheckpoint(eager=False)
    return ranks


def _cc_min_nbr(e: DataFrame) -> DataFrame:
    """Per node u: min(Γ(u) ∪ {u}) over the edge list ``(u, v)``."""
    return (e.groupBy("u").agg(F.min("v").alias("_mn"))
             .select("u", F.least(F.col("_mn"),
                                  F.col("u")).alias("m")))


def connected_components(edges: DataFrame, src: str = "src",
                         dst: str = "dst", max_iter: int = 50,
                         return_iters: bool = False):
    """Connected components of an undirected graph — the alternating
    LARGE-STAR / SMALL-STAR algorithm (Kiveris et al., "Connected
    Components in MapReduce and Beyond", SoCC'14), expressed as
    DataFrame joins.  Returns ``(id, component)`` for every node
    incident to an edge, where ``component`` is the smallest node id
    in its component (``return_iters=True`` appends the round count).

    Why not label propagation: `operators/dedup.py dedup_components`
    propagates min labels one hop per round — O(graph diameter)
    rounds, the right tool for near-dup graphs (tiny cliques,
    diameter ≤ ~3) but pathological on chains (a 512-node path needs
    511 rounds).  The star rounds HALVE long paths each alternation
    (large-star hangs every larger neighbor under the local min,
    small-star re-hangs the small neighborhood), converging in
    O(log n) rounds on ANY topology — the general-graph tool
    (citation-link graphs, host graphs) this module's PageRank
    feeds on.

    Per round: two grouped mins + two joins, and the UNDIRECTED edge
    set stays linear — each input edge maps to at most one output
    edge per star (large-star re-emits an edge {a, b}, a < b, only
    from a's side as {b, m(a)}; a's link to its own min survives
    through the OTHER endpoint's emission — re-adding it here too is
    the superficially-safe variant that DOUBLES the set every round
    and melts a long path into O(n²) intermediate edges before the
    mins win; caught and pinned by the edge-growth test).
    Convergence is a one-row checksum aggregate (count + xor of edge
    hashes) and lineage truncates per round (localCheckpoint)."""
    e = (edges.select(F.col(src).cast("long").alias("u"),
                      F.col(dst).cast("long").alias("v"))
              .filter(F.col("u").isNotNull()
                      & F.col("v").isNotNull()
                      & (F.col("u") != F.col("v"))))
    nodes = (e.select(F.col("u").alias("id"))
              .union(e.select(F.col("v").alias("id")))
              .distinct().localCheckpoint(eager=False))
    # canonical UNDIRECTED pairs; each star symmetrizes as it needs
    e = (e.select(F.least("u", "v").alias("u"),
                  F.greatest("u", "v").alias("v"))
          .distinct().localCheckpoint(eager=False))

    def checksum(ed):
        row = ed.agg(
            F.count(F.lit(1)).alias("n"),
            F.expr("bit_xor(xxhash64(least(u, v), greatest(u, v)))")
             .alias("h")).collect()[0]
        return (row["n"], row["h"])

    sig = checksum(e)
    iters = 0
    for _ in range(max_iter):
        iters += 1
        # LARGE-STAR: hang every strictly-larger neighbor of u under
        # min(Γ⁺(u)).  Output REPLACES the edge set: {a,b} (a<b)
        # becomes {b, m(a)} — nothing else is kept
        sym = e.union(e.select(F.col("v").alias("u"),
                               F.col("u").alias("v")))
        m = _cc_min_nbr(sym)
        e1 = (sym.filter(F.col("v") > F.col("u"))
                 .join(m, "u")
                 .select(F.col("v").alias("a"),
                         F.col("m").alias("b"))
                 .filter(F.col("a") != F.col("b"))
                 .select(F.least("a", "b").alias("u"),
                         F.greatest("a", "b").alias("v"))
                 .distinct())
        # SMALL-STAR at the larger endpoint: u's ≤-neighborhood
        # (plus u itself) re-hangs under its min
        e2 = e1.select(F.col("v").alias("u"),
                       F.col("u").alias("v"))
        m2 = _cc_min_nbr(e2)
        nbrs_plus = e2.union(
            e2.select("u", F.col("u").alias("v")).distinct())
        e = (nbrs_plus.join(m2, "u")
             .filter(F.col("v") != F.col("m"))
             .select(F.col("m").alias("u"), F.col("v"))
             .filter(F.col("u") != F.col("v"))
             .distinct().localCheckpoint())
        new_sig = checksum(e)
        if new_sig == sig:
            break
        sig = new_sig
    # converged star forest: every edge is (root=min, member)
    parent = (e.select(F.least("u", "v").alias("component"),
                       F.greatest("u", "v").alias("id"))
               .groupBy("id").agg(F.min("component")
                                  .alias("component")))
    out = (nodes.join(parent, "id", "left")
                .select("id", F.coalesce("component", F.col("id"))
                              .alias("component")))
    return (out, iters) if return_iters else out


def triangle_count(edges: DataFrame, src: str = "src",
                   dst: str = "dst") -> DataFrame:
    """Per-node triangle counts of an undirected graph — the
    COMPACT-FORWARD / degree-ordering algorithm (Latapy 2008; the
    same orientation trick every distributed triangle system uses):
    orient each undirected edge from its lower-(degree, id) endpoint
    to the higher one, enumerate wedges only at a node's OUT-edges,
    and close them against the canonical edge set.  Degree ordering
    bounds total wedges by O(|E|^1.5) regardless of skew — a
    celebrity node with 10M followers contributes wedges only
    through its handful of HIGHER-degree peers, where the naive
    lower-id orientation would enumerate its 10M-choose-2 pairs.

    Returns ``(id, n_triangles)`` for every node incident to an edge
    (0 for triangle-free nodes).  Plan shape: one degree aggregation,
    two joins (wedge build + closure), one explode + final count —
    all equi-joins, no cartesian anywhere."""
    e0 = (edges.select(F.col(src).cast("long").alias("a"),
                       F.col(dst).cast("long").alias("b"))
               .filter(F.col("a").isNotNull()
                       & F.col("b").isNotNull()
                       & (F.col("a") != F.col("b"))))
    # canonical undirected edge set (lo, hi) by id — the closure probe
    canon = (e0.select(F.least("a", "b").alias("lo"),
                       F.greatest("a", "b").alias("hi"))
               .distinct().localCheckpoint(eager=False))
    nodes = (canon.select(F.col("lo").alias("id"))
                  .union(canon.select(F.col("hi").alias("id")))
                  .distinct())
    deg = (canon.select(F.col("lo").alias("id"))
                .union(canon.select(F.col("hi").alias("id")))
                .groupBy("id").agg(F.count(F.lit(1)).alias("d")))
    # orient low-(degree, id) -> high-(degree, id)
    withd = (canon
             .join(deg.select(F.col("id").alias("lo"),
                              F.col("d").alias("dlo")), "lo")
             .join(deg.select(F.col("id").alias("hi"),
                              F.col("d").alias("dhi")), "hi"))
    fwd = withd.select(
        F.when((F.col("dlo") < F.col("dhi"))
               | ((F.col("dlo") == F.col("dhi"))
                  & (F.col("lo") < F.col("hi"))),
               F.struct(F.col("lo").alias("s"),
                        F.col("hi").alias("t")))
         .otherwise(F.struct(F.col("hi").alias("s"),
                             F.col("lo").alias("t")))
         .alias("e")).select("e.s", "e.t")
    # wedges at the low endpoint: unordered pairs of its out-edges
    l, r = fwd.alias("l"), fwd.alias("r")
    wedge = (l.join(r, F.col("l.s") == F.col("r.s"))
              .filter((F.col("l.t") < F.col("r.t")))
              .select(F.col("l.s").alias("p"),
                      F.col("l.t").alias("x"),
                      F.col("r.t").alias("y")))
    tri = wedge.join(
        canon,
        (F.least("x", "y") == F.col("lo"))
        & (F.greatest("x", "y") == F.col("hi"))).select("p", "x", "y")
    per_node = (tri.select(F.explode(F.array("p", "x", "y"))
                           .alias("id"))
                   .groupBy("id")
                   .agg(F.count(F.lit(1)).alias("n_triangles")))
    return (nodes.join(per_node, "id", "left")
                 .select("id",
                         F.coalesce("n_triangles", F.lit(0))
                          .cast("long").alias("n_triangles")))
