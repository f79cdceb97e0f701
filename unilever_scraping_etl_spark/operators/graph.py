"""Iterative graph ranking: fixed-iteration PageRank (public
algorithm — Brin & Page 1998; damping-factor form as in the original
paper and every textbook). The corpus-curation use is domain/item
authority weighting — web pipelines weight documents by link-graph
centrality of their hosts (e.g. Common Crawl's published harmonic-
centrality rankings); here the same machinery ranks any derived
edge list.

This is the engine's representative of the ITERATIVE class beyond
connected components: a driver-side loop of K relational steps, each
step one join + one aggregation — no GraphX, no RDDs. Per iteration:

    contrib(v) = Σ_{u→v} rank(u) / outdeg(u)          (join + sum)
    rank'(v)   = (1−d)/N + d · contrib(v)             (map)

(``personalize=`` swaps the uniform (1−d)/N teleport for a seed
distribution s(v) — Brin & Page's non-uniform E vector — giving the
topic-focused variant; see the parameter docs.)

Nodes with no in-links keep the (1−d)/N floor; mass arriving at
dangling nodes (no out-links) is dropped by default, matching the
plain fixed-iteration formulation the oracle unrolls (symmetric edge
lists — the co-occurrence graphs this engine derives — have no
dangling nodes, so the two definitions coincide there).
``redistribute_dangling=True`` opts into the textbook correction
instead: each iteration the rank mass sitting on dangling nodes is
spread uniformly, ``rank'(v) = (1−d)/N + d·(contrib(v) + m/N)`` with
``m = Σ_{u dangling} rank(u)`` — total mass is then conserved at
exactly 1 on ANY graph. The dangling mass enters the plan as a 1-row
broadcast (agg → crossJoin), never a driver collect.

Convergence: ``iterations`` is the fixed K by default; passing
``tol`` turns it into a CAP and stops early once ``max|Δrank|`` over
the nodes falls to ``tol`` or below. Each tol check is one bounded
driver probe (a single max-abs-delta scalar — the same discipline as
connected components' convergence checksum) and each checked
iteration is localCheckpointed, so the probe never re-executes the
iteration chain.

Scale posture: the edge list, node set, and out-degrees are
MATERIALIZED once up front (``materialize=True`` default) — a lazy
plan would re-derive the whole upstream subtree (self-joins, scans)
once per iteration reference, K+1 times; Spark's own iterative
algorithms cache their graph for the same reason. Each iteration is
then ONE shuffle of the rank table against the cached edges; the
plan tree still grows linearly with K, so for deep runs pass
``checkpoint_every`` to also truncate the RANK lineage (the standard
Spark iterative-algorithm discipline — at cluster scale, a reliable
checkpoint dir instead of localCheckpoint).
Convergence is the caller's choice of K: PageRank contracts at rate
d per iteration, so K = 5 bounds the error at d^5 ≈ 0.44 of the
initial gap — pick K from the tolerance, or iterate in an outer loop
on the returned frame's delta (same bounded-probe discipline as the
CC convergence checksum).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from unilever_scraping_etl_spark.operators._contracts import (
    require_free_columns,
)

_WORKING = ("__outdeg", "__contrib", "__rank", "__dmass", "__prev",
            "__wr", "__wtot", "__sv", "__cn", "__esv")

# diagnostic: iterations the last pagerank() call actually ran (the
# tol early-stop is otherwise invisible) — same pattern as connected
# components' _LAST_CC_ROUNDS
_LAST_PR_ITERATIONS = 0

# Diagnostics for the until_stable peeling family (r14 VERDICT #2):
# rounds the last k_core() / core_number() call actually executed,
# and whether it VERIFIED the fixed point (the stability probe fired)
# or hit the rounds cap with the last round still changing. A cap-hit
# result is a monotone upper bound (superset survivors / inflated
# coreness) — correct direction, unverified value — which callers
# previously could not distinguish from convergence. Set on every
# call (fixed-rounds runs record rounds executed, converged=None
# since no probe runs); not part of the operator contract. Like
# _LAST_PR_ITERATIONS and dedup's _LAST_CC_ROUNDS these are plain
# module globals with no thread affinity — concurrent driver threads
# overwrite each other's verdicts; a caller that needs a race-free
# signal uses on_cap="raise"/"warn" (delivered on the calling
# thread), not the globals.
_LAST_KCORE_ROUNDS: int | None = None
_LAST_KCORE_CONVERGED: bool | None = None
_LAST_CORE_ROUNDS: int | None = None
_LAST_CORE_CONVERGED: bool | None = None


def _on_cap_signal(name: str, rounds: int, on_cap: str,
                   bound: str = "a monotone upper bound (superset "
                                "survivors / inflated coreness)") -> None:
    """Shared cap-hit escalation for the until_stable family:
    ``"silent"`` preserves the historical behavior (the result is a
    documented monotone bound), ``"warn"`` emits a RuntimeWarning,
    ``"raise"`` matches connected_components' loud non-convergence
    discipline (dedup.py) for callers that treat an unverified bound
    as wrong. ``bound`` names the direction — peeling truncates HIGH
    (supersets), reachability truncates LOW (a ≤rounds-hop subset)."""
    msg = (f"{name}(until_stable=True) hit the rounds cap "
           f"({rounds}) before verifying the fixed point; the "
           f"result is {bound}. Raise `rounds` or accept the bound.")
    if on_cap == "raise":
        raise RuntimeError(msg)
    if on_cap == "warn":
        import warnings
        warnings.warn(msg, RuntimeWarning, stacklevel=3)

# The bounded-probe broadcast discipline (pagerank, round 11), shared
# by the whole structural family since round 14: every iterative
# operator here joins a NODE-bounded frame (ranks, scores, labels,
# survivor sets, degree tables) against the cached edge list. On
# host-level graphs that frame is small and forcing a broadcast
# removes the edge-side exchange entirely; on PAGE-level graphs the
# same frame is 90M+ rows and a forced F.broadcast is a multi-GB
# build per iteration — driver/executor OOM, and a hint AQE cannot
# demote. So: `None` (the default everywhere) probes the bounded node
# count once and broadcasts only when it reads <= this cap; above it
# the join ships unhinted and AQE picks the strategy at runtime.
_BROADCAST_NODE_CAP = 1_000_000


def _gate_broadcast(flag: bool | None, n: int) -> bool:
    """Resolve a tri-state broadcast flag against the bounded node
    probe ``n``: explicit True/False wins; ``None`` auto-enables only
    when ``n <= _BROADCAST_NODE_CAP``."""
    return (n <= _BROADCAST_NODE_CAP) if flag is None else bool(flag)


def _resolve_score_gate(nodes: DataFrame,
                        flag: bool | None,
                        need_empty: bool = True) -> tuple[bool, bool]:
    """Shared gate resolution for the score-propagation operators
    (hits, salsa) — ONE source of truth for the probe-or-isEmpty
    discipline (r14 ADVICE low): the bounded node-count probe is
    paid only when the gate is on auto; an explicit flag uses the
    cheap isEmpty check for the empty-graph early return (under
    materialize=False a count would re-evaluate the full upstream
    for a probe the gate never reads). Returns (broadcast, empty).

    ``need_empty=False`` (r15 ADVICE low): callers that never consult
    the empty signal — reachability, whose seed semi-join against an
    empty graph is already empty — skip the isEmpty action entirely
    on the explicit-flag path instead of paying a Spark job (and,
    under materialize=False, a full upstream re-evaluation) for a
    value they discard."""
    if flag is None:
        n = nodes.count()
        return _gate_broadcast(None, n), n == 0
    return bool(flag), (nodes.isEmpty() if need_empty else False)


def pagerank(edges: DataFrame, src: str, dst: str,
             iterations: int = 5, damping: float = 0.85,
             checkpoint_every: int | None = None,
             rank_digits: int | None = None,
             materialize: bool = True,
             tol: float | None = None,
             redistribute_dangling: bool = False,
             broadcast_ranks: bool | None = None,
             warm_start: DataFrame | None = None,
             weight_col: str | None = None,
             personalize: DataFrame | None = None) -> DataFrame:
    """Fixed-iteration PageRank over the directed edge list
    ``edges[src, dst]`` (parallel duplicate edges count once per
    occurrence — pre-DISTINCT the list if that is not intended).
    Returns ``(node, rank)`` for every node appearing as a source or
    destination; ranks start uniform at 1/N. ``rank_digits`` rounds
    the final rank (engines disagree in the last ulp of float sums —
    round on BOTH sides when comparing cross-engine). Edges with a
    NULL endpoint are dropped (a NULL key would otherwise surface as
    a phantom node with the base rank).

    ``tol``: stop as soon as ``max|Δrank| <= tol`` between successive
    iterations, with ``iterations`` as the cap (requires
    ``materialize=True`` — the probe evaluates eagerly, and an
    unmaterialized upstream would re-derive the graph every check).
    ``redistribute_dangling``: conserve dangling-node mass by uniform
    redistribution instead of dropping it (module docstring).
    ``broadcast_ranks``: hint the (node, rank) side of each
    iteration's join broadcast, removing the edge-side exchange
    entirely — measured ~11% at sf0.1 and a bigger first-iteration
    win (BASELINE.md round-11). The rank table is ONE ROW PER NODE,
    so this is only sane on node-bounded graphs (host graphs, entity
    graphs); default ``None`` auto-enables when the bounded node
    probe reads ≤ 1M — page-level graphs fall back to the shuffle
    plan, where AQE may still convert at runtime.
    ``warm_start``: a two-column ``(node, rank)`` frame (column
    names are positional) seeding the iteration instead of the
    uniform start — the INCREMENTAL re-rank path: when the graph is
    a small delta away from a snapshot whose ranks are already
    published, warm-starting from them reaches the same fixed point
    in far fewer iterations (PageRank's fixed point is independent
    of the start; only convergence speed changes — drift-bound
    property-tested in tests/test_graph.py). Nodes absent from the
    warm frame (new hosts in the delta) enter at 1/N; the seed is
    renormalized to total mass 1 (one bounded 1-row broadcast). Pair
    with ``tol`` so the saved iterations are realized, or with fixed
    ``iterations`` for the oracle-checkable form.
    ``weight_col``: WEIGHTED PageRank — rank mass flows out of each
    node proportional to the edge weight instead of uniformly,
    ``contrib(v) = Σ_{u→v} rank(u) · w(u,v) / Σ_out w(u,·)`` (the
    anchor-corpus use: host edges weighted by link counts, so a host
    that links somewhere 100 times endorses it 100× harder than a
    single footer link). Edges with NULL or non-positive weight drop
    (they carry no mass and a ≤0 weight would corrupt the out-sum);
    equal weights reduce exactly to the unweighted form
    (property-tested).
    ``personalize``: PERSONALIZED PageRank (Brin & Page 1998 §2.1.2's
    non-uniform E vector; the topic-focused curation tool — teleport
    to a trusted seed set instead of everywhere) — a two-column
    ``(node, weight)`` frame (positional, like ``warm_start``)
    replacing the uniform teleport: ``rank'(v) = (1−d)·s(v) +
    d·contrib(v)`` with ``s`` the seed distribution. Rows with NULL
    or non-positive weight drop, duplicate node rows sum (same
    defensive-seed discipline as ``warm_start``), weights on nodes
    absent from the graph are ignored (teleporting to a node that
    does not exist would leak rank mass), and the surviving weights
    are renormalized to total 1 — raising if no graph node carries
    positive weight. With ``redistribute_dangling`` the dangling mass
    also re-enters per ``s`` (the textbook personalized correction),
    so total mass stays exactly 1. A seed uniform over all nodes
    reduces exactly to standard PageRank (property-tested). Composes
    with ``warm_start``/``tol``/``weight_col``."""
    if iterations < 1:
        raise ValueError("iterations must be >= 1")
    if not 0.0 < damping < 1.0:
        raise ValueError("damping must be in (0, 1)")
    if tol is not None and tol < 0.0:
        raise ValueError("tol must be >= 0")
    if tol is not None and not materialize:
        raise ValueError("tol requires materialize=True (each "
                         "convergence probe evaluates the plan)")
    require_free_columns("pagerank", edges.columns, _WORKING)
    require_free_columns("pagerank", edges.columns, ("node", "rank"),
                         kind="output")
    global _LAST_PR_ITERATIONS
    _LAST_PR_ITERATIONS = 0
    edges = edges.filter(F.col(src).isNotNull()
                         & F.col(dst).isNotNull())
    if weight_col is not None:
        edges = edges.filter(F.col(weight_col).isNotNull()
                             & (F.col(weight_col) > 0))
    if materialize:
        # snapshot the RAW edges first, so nodes/degrees derive from
        # the SAME evaluation of a possibly-nondeterministic upstream
        # (a sampled edge list re-evaluated per branch could put a src
        # in edges that nodes never saw — silently dropped mass)
        edges = edges.localCheckpoint()
    nodes = (edges.select(F.col(src).alias("node"))
             .union(edges.select(F.col(dst).alias("node")))
             .distinct())
    # the out-degree (or out-weight-sum) is a static per-src value:
    # attach it to the edge list ONCE so each iteration runs a single
    # join (ranks), not two
    if weight_col is None:
        deg = edges.groupBy(src).agg(F.count(F.lit(1))
                                     .alias("__outdeg"))
    else:
        deg = edges.groupBy(src).agg(
            F.sum(F.col(weight_col).cast("double")).alias("__outdeg"))
    edges = edges.join(deg, src)
    if materialize:
        edges = edges.localCheckpoint()
        nodes = nodes.localCheckpoint()
    n = nodes.count()  # bounded driver probe: one scalar, like CC's
    if n == 0:
        # a fully-NULL or empty edge list has no nodes to rank —
        # return the empty (node, rank) frame, not a ZeroDivisionError
        return nodes.select("node", F.lit(0.0).alias("rank"))
    if personalize is not None:
        # seed distribution s(v): defensive per-node sum, NULL/<=0
        # drop, restricted to GRAPH nodes before normalizing (mass on
        # absent nodes must not dilute the teleport), 0.0 elsewhere
        ps = (personalize.select(
                  F.col(personalize.columns[0]).alias("node"),
                  F.col(personalize.columns[1]).cast("double")
                  .alias("__sv"))
              .filter(F.col("__sv").isNotNull() & (F.col("__sv") > 0))
              .groupBy("node").agg(F.sum("__sv").alias("__sv")))
        nodes = (nodes.join(ps, "node", "left")
                 .select("node", F.coalesce(F.col("__sv"), F.lit(0.0))
                         .alias("__sv")))
        if materialize:
            nodes = nodes.localCheckpoint()
        # bounded 1-row probe; `not stot > 0` is NaN-safe like the
        # warm_start total check
        stot = nodes.agg(F.sum("__sv")).first()[0]
        if stot is None or not stot > 0.0:
            raise ValueError(
                f"personalize: no graph node carries positive teleport "
                f"weight (total {stot}) — the seed distribution has "
                f"nothing to normalize over")
        nodes = nodes.select(
            "node", (F.col("__sv") / F.lit(float(stot))).alias("__sv"))
        if materialize:
            nodes = nodes.localCheckpoint()
        base = F.lit(1.0 - damping) * F.col("__sv")
    else:
        base = F.lit((1.0 - damping) / n)
    dangling = None
    if redistribute_dangling:
        # nodes with no out-edge, fixed for the whole run: their rank
        # mass re-enters uniformly each iteration
        dangling = nodes.join(
            edges.select(F.col(src).alias("node")).distinct(),
            "node", "left_anti")
        if materialize:
            dangling = dangling.localCheckpoint()
    broadcast_ranks = _gate_broadcast(broadcast_ranks, n)
    if warm_start is not None:
        # defensive seed aggregation (r12 ADVICE): duplicate node rows
        # in the seed would otherwise fan out through the left join and
        # double-count that node's mass every iteration — summing per
        # node keeps any published-snapshot union a valid seed
        ws = (warm_start.select(
                  F.col(warm_start.columns[0]).alias("node"),
                  F.col(warm_start.columns[1]).cast("double")
                  .alias("__wr"))
              .groupBy("node").agg(F.sum("__wr").alias("__wr")))
        init = (nodes.join(ws, "node", "left")
                .select("node",
                        F.coalesce(F.col("__wr"), F.lit(1.0 / n))
                        .alias("rank")))
        if materialize:
            init = init.localCheckpoint()
        # bounded 1-row probe (same discipline as the node count): the
        # renormalization divides by this total, so a zero/negative/NaN
        # seed mass must fail loudly, not mint NULL/inf ranks silently
        # (r12 ADVICE). `not tot > 0` is deliberately NaN-safe.
        tot = init.agg(F.sum("rank")).first()[0]
        if tot is None or not tot > 0.0:
            raise ValueError(
                f"warm_start ranks must sum to a positive total over "
                f"the graph's nodes (got {tot}) — the seed is "
                f"renormalized to mass 1, so a non-positive or NaN "
                f"total has no valid scaling")
        ranks = init.select(
            "node", (F.col("rank") / F.lit(float(tot))).alias("rank"))
        if materialize:
            ranks = ranks.localCheckpoint()
    else:
        ranks = nodes.select("node", F.lit(1.0 / n).alias("rank"))
    def _dense(contribs: DataFrame, dmass: DataFrame | None) -> DataFrame:
        """Complete the sparse contribution frame to the dense
        (node, rank) frame — the old loop built this EVERY iteration;
        the sparse loop below builds it once at the end (and the tol
        path per probe)."""
        gain = F.coalesce(F.col("__contrib"), F.lit(0.0))
        new = nodes.join(contribs, "node", "left")
        if dmass is not None:
            new = new.crossJoin(F.broadcast(dmass))
            # personalized runs re-enter dangling mass per the seed
            # distribution (teleporting it uniformly would bleed
            # topic-locality every iteration); total mass stays 1
            # either way
            gain = gain + (F.col("__dmass") * F.col("__sv")
                           if personalize is not None
                           else F.col("__dmass") / F.lit(float(n)))
        return new.select(
            "node", (base + F.lit(damping) * gain).alias("rank"))

    # Sparse iteration (the fixed-iteration path): a node's rank is a
    # CLOSED FORM of its incoming contributions — rank(v) = base(v) +
    # d·(contrib(v) [+ dangling term]) — so materializing the dense
    # (node, rank) frame per iteration only to join it back into the
    # edge list was one redundant |V|-sized join PER ITERATION. The
    # loop instead carries the sparse contribution frame and inlines
    # the closed form into the next iteration's edge join (absent
    # contributions coalesce to the exact 0.0 the dense frame carried);
    # the dense frame is built ONCE after the loop. Identical
    # arithmetic per node, identical results. The tol path keeps the
    # dense per-iteration frame — its convergence probe needs rank
    # deltas between successive dense frames.
    if personalize is not None and tol is None:
        # the closed form needs base(src) = (1-d)·s(src) inside the
        # edge join: attach the seed weight to the cached edge list
        # ONCE (replacing the per-iteration dense join that used to
        # deliver it)
        esv = nodes.select(F.col("node").alias(src),
                           F.col("__sv").alias("__esv"))
        edges = edges.join(esv, src)
        if materialize:
            edges = edges.localCheckpoint()
    prev: tuple[DataFrame, DataFrame | None] | None = None
    for i in range(iterations):
        _LAST_PR_ITERATIONS = i + 1
        if prev is None:
            # first iteration: the explicit init frame (uniform or
            # warm-start seed) is the rank source
            rside = F.broadcast(ranks) if broadcast_ranks else ranks
            joined = edges.join(rside, edges[src] == rside["node"])
            rank_u = F.col("rank")
        else:
            pc, pdm = prev
            cside = pc.withColumnRenamed("node", "__cn")
            if broadcast_ranks:
                cside = F.broadcast(cside)
            joined = edges.join(cside, edges[src] == F.col("__cn"),
                                "left")
            g = F.coalesce(F.col("__contrib"), F.lit(0.0))
            if pdm is not None:
                joined = joined.crossJoin(F.broadcast(pdm))
                g = g + (F.col("__dmass") * F.col("__esv")
                         if personalize is not None
                         else F.col("__dmass") / F.lit(float(n)))
            src_base = (F.lit(1.0 - damping) * F.col("__esv")
                        if personalize is not None else base)
            rank_u = src_base + F.lit(damping) * g
        share = (rank_u / F.col("__outdeg") if weight_col is None
                 else rank_u
                 * F.col(weight_col).cast("double")
                 / F.col("__outdeg"))
        contribs = (joined
                    .select(F.col(dst).alias("node"),
                            share.alias("__contrib"))
                    .groupBy("node")
                    .agg(F.sum("__contrib").alias("__contrib")))
        dmass = None
        if redistribute_dangling:
            if prev is None:
                dsrc = ranks
            else:
                # dangling ranks via the same closed form (dangling
                # derives from `nodes`, so it carries __sv when
                # personalized)
                dsrc = _dense(*prev)
            dmass = (dsrc.join(dangling, "node", "left_semi")
                     .agg(F.coalesce(F.sum("rank"), F.lit(0.0))
                          .alias("__dmass")))
        if tol is not None:
            new = _dense(contribs, dmass)
            # probe needs the frame evaluated anyway; checkpointing it
            # also keeps each probe from re-running the iteration
            # chain. LAZY (r16): the delta probe right below
            # materializes it in its own job — no separate
            # synchronous checkpoint job per probed iteration
            new = new.localCheckpoint(eager=False)
            delta = (new.join(ranks.withColumnRenamed("rank", "__prev"),
                              "node")
                     .agg(F.max(F.abs(F.col("rank") - F.col("__prev"))))
                     .first()[0])
            ranks = new
            prev = None  # tol path stays dense: next join uses `ranks`
            if delta is not None and delta <= tol:
                break
        else:
            prev = (contribs, dmass)
            if checkpoint_every and (i + 1) % checkpoint_every == 0:
                contribs = contribs.localCheckpoint()
                prev = (contribs, dmass)
    if tol is None:
        ranks = _dense(*prev)
    if rank_digits is not None:
        ranks = ranks.select("node", F.round("rank", rank_digits)
                             .alias("rank"))
    return ranks


def hits(edges: DataFrame, src: str, dst: str,
         iterations: int = 5,
         hub_digits: int | None = None,
         materialize: bool = True,
         broadcast_scores: bool | None = None,
         weight_col: str | None = None) -> DataFrame:
    """HITS hubs-and-authorities (Kleinberg 1999, public algorithm)
    over the directed edge list ``edges[src, dst]`` — the classic
    complement to PageRank for link-graph curation: an AUTHORITY is a
    page many good hubs point at, a HUB is a page pointing at many
    good authorities (directory/index pages). PageRank's single score
    conflates the two; corpus weighting wants authorities, link-
    frontier expansion wants hubs.

    Returns ``(node, hub, authority)`` for every node in the graph.
    The standard mutual recursion, run for fixed ``iterations``:

        a_t(v) = Σ_{u→v} h_{t−1}(u),   then a_t /= ‖a_t‖₂
        h_t(u) = Σ_{u→v} a_t(v),       then h_t /= ‖h_t‖₂

    starting from h₀ ≡ 1. Nodes with no in-links have authority 0,
    nodes with no out-links have hub 0; the L2 norms are never 0 on a
    non-empty edge list (some node always receives mass), and the
    empty graph returns an empty frame. NULL-endpoint edges drop;
    parallel duplicate edges count once per occurrence (pre-DISTINCT
    if unintended), matching the adjacency-matrix formulation.
    ``hub_digits`` rounds both scores (cross-engine float-sum order,
    the pagerank rule).

    ``weight_col``: WEIGHTED HITS — the adjacency matrix carries the
    edge weight instead of 1 (Kleinberg's recurrence on a weighted
    A, the same refinement Bharat-Henzinger 1998 applied to curb
    mutually-reinforcing host pairs — public literature):

        a_t(v) = Σ_{u→v} w(u,v) · h_{t−1}(u)
        h_t(u) = Σ_{u→v} w(u,v) · a_t(v)

    each half-step still L2-normalized. The anchor-corpus use
    mirrors weighted PageRank's: per-(src,dst) link OCCURRENCE
    counts, so a host linking somewhere 100 times endorses it 100×
    harder. Edges with NULL or non-positive weight drop (they carry
    no mass); a CONSTANT weight reduces exactly to the unweighted
    form — the scale factor cancels in every norm
    (property-tested).

    Scale posture: identical to ``pagerank`` — the edge list and node
    set are materialized once; each half-iteration is ONE join of the
    (node-bounded) score table against the cached edges plus a
    partial-aggregated sum, and each normalization is a 1-row L2
    aggregate entering the plan as a broadcast (never a driver
    collect, never a SinglePartition funnel of the score table).
    ``broadcast_scores`` follows pagerank's bounded-probe discipline
    (r13 VERDICT #1): ``None`` broadcasts the score side of each
    half-step join only when the node count reads ≤ 1M — host graphs
    get the exchange-free plan, page-level graphs ship the join
    unhinted and let AQE pick (a forced 90M-row broadcast per
    half-step would OOM the build side). Iterations are O(K)
    shuffles total either way.
    """
    if iterations < 1:
        raise ValueError("iterations must be >= 1")
    require_free_columns("hits", edges.columns, _WORKING)
    require_free_columns("hits", edges.columns,
                         ("node", "hub", "authority"), kind="output")
    edges = edges.filter(F.col(src).isNotNull()
                         & F.col(dst).isNotNull())
    if weight_col is not None:
        edges = edges.filter(F.col(weight_col).isNotNull()
                             & (F.col(weight_col) > 0))
    if materialize:
        edges = edges.localCheckpoint()
    nodes = (edges.select(F.col(src).alias("node"))
             .union(edges.select(F.col(dst).alias("node")))
             .distinct())
    if materialize:
        nodes = nodes.localCheckpoint()
    broadcast_scores, empty = _resolve_score_gate(nodes,
                                                  broadcast_scores)
    if empty:
        return nodes.select("node", F.lit(0.0).alias("hub"),
                            F.lit(0.0).alias("authority"))

    # The loop runs on SPARSE score frames — only nodes that received
    # mass this half-step. Nodes absent from a sparse frame have score
    # exactly 0.0, and 0.0 is an exact no-op in every place such a row
    # could flow: a 0-score term adds nothing to the next half-step's
    # sums (x + 0.0*w == x in IEEE), and contributes nothing to an L2
    # norm — so the dense per-half-step `nodes` LEFT-join + coalesce
    # of the previous shape was pure overhead: one extra join and one
    # extra |V|-row pass PER HALF-STEP (2K joins for K iterations) at
    # 100 TB, each carried before the norm could be taken. The dense
    # completion happens ONCE, after the loop. Scores are bit-identical
    # to the dense form (same join terms, same norm value).
    def _normalized(raw: DataFrame, col: str) -> DataFrame:
        norm = raw.agg(
            F.sqrt(F.sum(F.col(col) * F.col(col))).alias("__z"))
        return (raw.crossJoin(F.broadcast(norm))
                .select("node",
                        (F.col(col) / F.col("__z")).alias(col)))

    hub = nodes.select("node", F.lit(1.0).alias("hub"))
    auth = None
    # weighted contribution: score × edge weight; unweighted keeps the
    # plain column (no 1.0-multiply noise in the unweighted plan)
    def _wmul(score: Column) -> Column:
        if weight_col is None:
            return score
        return score * F.col(weight_col).cast("double")
    for i in range(iterations):
        hside = F.broadcast(hub) if broadcast_scores else hub
        araw = (edges.join(hside, edges[src] == hside["node"])
                .select(F.col(dst).alias("node"),
                        _wmul(F.col("hub")).alias("hub"))
                .groupBy("node").agg(F.sum("hub").alias("authority")))
        if materialize:
            # snapshot the RAW half-step sums LAZILY: the norm is an
            # aggregate OF this frame and the normalized scores divide
            # it again, so without the checkpoint each half-step's
            # join+agg subtree is planned (and, across the norm's
            # broadcast build plus the next half-step's score build,
            # executed) twice; eager=False materializes it inside the
            # norm's broadcast job instead of paying a separate
            # synchronous job per half-step
            araw = araw.localCheckpoint(eager=False)
        auth = _normalized(araw, "authority")
        aside = F.broadcast(auth) if broadcast_scores else auth
        hraw = (edges.join(aside, edges[dst] == aside["node"])
                .select(F.col(src).alias("node"),
                        _wmul(F.col("authority")).alias("authority"))
                .groupBy("node").agg(F.sum("authority").alias("hub")))
        if materialize:
            hraw = hraw.localCheckpoint(eager=False)
        hub = _normalized(hraw, "hub")
    # dense completion ONCE: every graph node appears in the output,
    # nodes that never received mass at exactly 0.0 (the value the
    # per-half-step dense form carried for them all along)
    out = (nodes
           .join(hub, "node", "left")
           .join(auth, "node", "left")
           .select("node",
                   F.coalesce(F.col("hub"), F.lit(0.0)).alias("hub"),
                   F.coalesce(F.col("authority"), F.lit(0.0))
                   .alias("authority")))
    if hub_digits is not None:
        out = out.select("node", F.round("hub", hub_digits).alias("hub"),
                         F.round("authority", hub_digits)
                         .alias("authority"))
    return out.select("node", "hub", "authority")


def salsa(edges: DataFrame, src: str, dst: str,
          iterations: int = 5,
          score_digits: int | None = None,
          materialize: bool = True,
          broadcast_scores: bool | None = None) -> DataFrame:
    """SALSA — the Stochastic Approach for Link-Structure Analysis
    (Lempel-Moran 2000, ACM TOIT; public algorithm): HITS' mutual
    recursion on the ROW/COLUMN-NORMALIZED adjacency instead of the
    raw one, i.e. a random walk that alternates one step backward
    and one step forward along links. The practical difference HITS
    users reach for SALSA to get: HITS scores are dominated by the
    single densest community (the tightly-knit-community effect —
    one mutually-reinforcing cluster absorbs all the mass), while
    SALSA's degree normalization makes every hub split its
    endorsement across its out-links, so a directory page linking
    2000 hosts endorses each 1/2000th as hard — the anti-spam
    property corpus curation wants next to PageRank.

    Returns ``(node, hub, authority)``. The iterative form, run for
    fixed ``iterations`` from h₀ ≡ 1 with an L1 normalization per
    half-step (SALSA's stationary scores are a probability
    distribution, unlike HITS' L2-normalized eigenvector):

        a_t(v) = Σ_{u→v} h_{t−1}(u) / outdeg(u),   then a_t /= Σ a_t
        h_t(u) = Σ_{u→v} a_t(v) / indeg(v),        then h_t /= Σ h_t

    On a graph whose authority chain is connected and aperiodic the
    authority scores converge to indeg(v)/|E| and the hub scores to
    outdeg(u)/|E| — Lempel-Moran's stationary-distribution theorem,
    property-tested; the interesting (and published) behavior is the
    PER-COMPONENT mass split on disconnected link structures, which
    the power iteration computes and the closed form does not.
    Degrees are over the DISTINCT edge list (parallel edges collapse
    — the walk picks among distinct links uniformly); NULL endpoints
    and self-loops drop. Nodes with no in-links have authority 0,
    no out-links hub 0; the L1 norms are never 0 on a non-empty
    edge list. ``score_digits`` rounds both scores (the cross-engine
    float-sum rule).

    Scale posture: identical to :func:`hits` — the distinct edge
    list is materialized ONCE carrying its two reciprocal-degree
    columns (1/outdeg(src) for the authority step, 1/indeg(dst) for
    the hub step), so each half-iteration is one join of the
    (node-bounded) score table against the cached weighted edges
    plus a partial-aggregated sum, and each L1 norm is a 1-row
    aggregate entering the plan as a broadcast — never a driver
    collect. The one-time degree joins that build the edge weights
    ship unhinted (AQE decides — they are paid once, the keep-set
    rule); the per-iteration score joins follow pagerank's
    bounded-probe gate: ``broadcast_scores=None`` probes the node
    count and force-broadcasts only when it reads ≤ 1M, page-scale
    graphs ship unhinted."""
    if iterations < 1:
        raise ValueError("iterations must be >= 1")
    require_free_columns("salsa", edges.columns,
                         _WORKING + ("__wa", "__wh", "__od", "__id"))
    require_free_columns("salsa", edges.columns,
                         ("node", "hub", "authority"), kind="output")
    el = (edges
          .filter(F.col(src).isNotNull() & F.col(dst).isNotNull()
                  & (F.col(src) != F.col(dst)))
          .select(F.col(src).alias("__a"), F.col(dst).alias("__b"))
          .distinct())
    if materialize:
        # the distinct list feeds BOTH degree tables and the weighted
        # edge build — snapshot once (the cocitation r14 rule)
        el = el.localCheckpoint()
    od = el.groupBy("__a").agg(F.count(F.lit(1)).alias("__od"))
    idg = el.groupBy("__b").agg(F.count(F.lit(1)).alias("__id"))
    # the walk's transition weights ride the cached edge list: one
    # row per distinct edge, (1/outdeg(src), 1/indeg(dst))
    en = (el.join(od, "__a").join(idg, "__b")
          .select("__a", "__b",
                  (F.lit(1.0) / F.col("__od")).alias("__wa"),
                  (F.lit(1.0) / F.col("__id")).alias("__wh")))
    if materialize:
        en = en.localCheckpoint()
    nodes = (en.select(F.col("__a").alias("node"))
             .union(en.select(F.col("__b").alias("node")))
             .distinct())
    if materialize:
        nodes = nodes.localCheckpoint()
    broadcast_scores, empty = _resolve_score_gate(nodes,
                                                  broadcast_scores)
    if empty:
        return nodes.select("node", F.lit(0.0).alias("hub"),
                            F.lit(0.0).alias("authority"))

    # Sparse half-steps + one dense completion, exactly hits()'s shape
    # (see the comment there): absent rows are exact 0.0 no-ops in both
    # the walk sums and the L1 norms, so the per-half-step dense
    # `nodes` LEFT-join of the previous form was 2K redundant joins.
    def _l1(raw: DataFrame, col: str) -> DataFrame:
        norm = raw.agg(F.sum(F.col(col)).alias("__z"))
        return (raw.crossJoin(F.broadcast(norm))
                .select("node",
                        (F.col(col) / F.col("__z")).alias(col)))

    hub = nodes.select("node", F.lit(1.0).alias("hub"))
    auth = None
    for _ in range(iterations):
        hside = F.broadcast(hub) if broadcast_scores else hub
        araw = (en.join(hside, en["__a"] == hside["node"])
                .select(F.col("__b").alias("node"),
                        (F.col("hub") * F.col("__wa")).alias("hub"))
                .groupBy("node").agg(F.sum("hub").alias("authority")))
        if materialize:
            # lazy raw-sum snapshot — the hits() rule: the norm
            # aggregates this frame and the normalized scores divide
            # it again, so the checkpoint stops the half-step subtree
            # from being planned and executed twice
            araw = araw.localCheckpoint(eager=False)
        auth = _l1(araw, "authority")
        aside = F.broadcast(auth) if broadcast_scores else auth
        hraw = (en.join(aside, en["__b"] == aside["node"])
                .select(F.col("__a").alias("node"),
                        (F.col("authority") * F.col("__wh"))
                        .alias("authority"))
                .groupBy("node").agg(F.sum("authority").alias("hub")))
        if materialize:
            hraw = hraw.localCheckpoint(eager=False)
        hub = _l1(hraw, "hub")
    out = (nodes
           .join(hub, "node", "left")
           .join(auth, "node", "left")
           .select("node",
                   F.coalesce(F.col("hub"), F.lit(0.0)).alias("hub"),
                   F.coalesce(F.col("authority"), F.lit(0.0))
                   .alias("authority")))
    if score_digits is not None:
        out = out.select("node",
                         F.round("hub", score_digits).alias("hub"),
                         F.round("authority", score_digits)
                         .alias("authority"))
    return out.select("node", "hub", "authority")


_LAST_REACH_ROUNDS: int | None = None
_LAST_REACH_CONVERGED: bool | None = None


def reachability(edges: DataFrame, src: str, dst: str,
                 seeds: DataFrame,
                 direction: str = "forward",
                 rounds: int = 32, until_stable: bool = True,
                 materialize: bool = True,
                 broadcast_frontier: bool | None = None,
                 on_cap: str = "silent") -> DataFrame:
    """Seed-set reachability closure over a directed edge list — the
    BFS primitive under Broder et al. 2000's bow-tie measurement
    (WWW9: IN/OUT/CORE are exactly backward-reach, forward-reach,
    and their intersection from a core pivot) and under trusted-seed
    frontier expansion (crawl a hop-bounded neighborhood of a
    curated host list). Returns a one-column ``(node)`` frame: every
    GRAPH node reachable from the seed set along edge direction
    (``direction="forward"``: src→dst) or against it
    (``"backward"``: who can REACH the seeds). Seeds present in the
    graph are included in the result (reachability is reflexive
    here); seed values absent from the graph drop — they have no
    edges to close over. NULL endpoints and self-loops drop;
    duplicate seed rows collapse.

    Each round is ONE semi-join of the cached edge list against the
    current reached set plus a union-distinct — the reached set is
    node-bounded and only GROWS, so an unchanged bounded count probe
    IS the fixed point (``until_stable=True``, the default: real
    graphs close in diameter rounds, far under the cap; set
    ``until_stable=False`` for the fixed-rounds oracle-checkable
    K-HOP form, where the result after K rounds is exactly the ≤K-hop
    neighborhood). Rounds needed = BFS DEPTH from the seeds (graph
    diameter at worst) — NOT the condensation depth that makes
    peeling-style SCC loops unbounded; this is why the bow-tie
    query composes two reachability calls instead of a full SCC
    decomposition. ``broadcast_frontier`` follows the family's
    bounded-probe gate (the reached frame is one row per node;
    ``None`` probes the graph's node count once and broadcasts only
    ≤ 1M). ``on_cap`` escalates a cap-hit exactly like
    :func:`k_core` (the result is then a ≤rounds-hop LOWER bound of
    the closure — monotone, unverified; requires
    ``until_stable=True`` to be meaningful, enforced);
    ``_LAST_REACH_ROUNDS``/``_LAST_REACH_CONVERGED`` record the
    run (same thread-unsafety caveat as the family's other
    diagnostics)."""
    if direction not in ("forward", "backward"):
        raise ValueError("direction must be 'forward' or 'backward'")
    if rounds < 1:
        raise ValueError("rounds must be >= 1")
    if until_stable and not materialize:
        raise ValueError("until_stable requires materialize=True "
                         "(each stability probe evaluates the plan)")
    if on_cap not in ("silent", "warn", "raise"):
        raise ValueError("on_cap must be 'silent', 'warn', or 'raise'")
    if on_cap != "silent" and not until_stable:
        raise ValueError("on_cap escalation requires until_stable=True "
                         "(fixed-rounds runs never probe the fixpoint, "
                         "so a cap-hit signal could not fire)")
    require_free_columns("reachability", edges.columns,
                         _WORKING + ("__a", "__b"))
    require_free_columns("reachability", edges.columns, ("node",),
                         kind="output")
    a, b = (src, dst) if direction == "forward" else (dst, src)
    el = (edges
          .filter(F.col(src).isNotNull() & F.col(dst).isNotNull()
                  & (F.col(src) != F.col(dst)))
          .select(F.col(a).alias("__a"), F.col(b).alias("__b"))
          .distinct())
    if materialize:
        el = el.localCheckpoint()
    nodes = (el.select(F.col("__a").alias("node"))
             .union(el.select(F.col("__b").alias("node")))
             .distinct())
    if materialize:
        nodes = nodes.localCheckpoint()
    broadcast_frontier, _ = _resolve_score_gate(nodes,
                                                broadcast_frontier,
                                                need_empty=False)
    seed_col = seeds.columns[0]
    reached = (nodes.join(
        seeds.select(F.col(seed_col).alias("node")).distinct(),
        "node", "left_semi"))
    if materialize:
        # lazy: the until_stable baseline count (or round 1's semi-join
        # side / broadcast build) materializes it — no dedicated job
        reached = reached.localCheckpoint(eager=False)
    global _LAST_REACH_ROUNDS, _LAST_REACH_CONVERGED
    executed, converged = 0, None
    n_prev = reached.count() if until_stable else None
    for _ in range(rounds):
        rside = (F.broadcast(reached.withColumnRenamed("node", "__a"))
                 if broadcast_frontier
                 else reached.withColumnRenamed("node", "__a"))
        step = (el.join(rside, "__a", "left_semi")
                .select(F.col("__b").alias("node")))
        reached = reached.union(step).distinct()
        if materialize:
            # LAZY (r16): under until_stable the count probe right
            # below materializes the snapshot in ITS job instead of a
            # separate synchronous one per round (the CC discipline);
            # under fixed rounds the chain materializes once inside
            # the consumer's action cascade.
            reached = reached.localCheckpoint(eager=False)
        executed += 1
        if until_stable:
            n_now = reached.count()  # monotone: unchanged == closed
            if n_now == n_prev:
                converged = True
                break
            n_prev = n_now
    if until_stable and converged is None:
        converged = False
    _LAST_REACH_ROUNDS, _LAST_REACH_CONVERGED = executed, converged
    if converged is False:
        _on_cap_signal("reachability", rounds, on_cap,
                       bound="a monotone LOWER bound (the ≤rounds-hop "
                             "neighborhood, a subset of the closure)")
    return reached.select("node")


def label_propagation(edges: DataFrame, src: str, dst: str,
                      iterations: int = 5,
                      materialize: bool = True,
                      broadcast_labels: bool | None = None) -> DataFrame:
    """Synchronous label propagation (Raghavan-Albert-Kumara 2007,
    public algorithm) over the edge list treated as UNDIRECTED — the
    community-detection pass a corpus-curation pipeline runs on the
    host graph to group mutually-linking site families (mirror
    clusters, link farms, forum networks) before per-community
    sampling caps or quality decisions.

    Returns ``(node, community)`` where ``community`` is the label the
    node converged to. Deterministic semantics (the published
    algorithm breaks ties randomly, which no oracle can check):

    - neighbors(v) = the DISTINCT undirected neighbor set from the
      edge list (direction erased, self-loops and NULL endpoints
      dropped, parallel edges collapse);
    - label₀(v) = v;
    - label_t(v) = the most frequent label among neighbors' t−1
      labels, ties broken by the SMALLEST label (min-label tie-break
      — every engine and the SQL oracle agree on it);
    - all nodes update simultaneously from the t−1 snapshot
      (synchronous — the asynchronous variant is order-dependent).

    Fixed ``iterations`` (the oracle-checkable form); synchronous LPA
    on bipartite-ish structures can oscillate rather than converge,
    which fixed-K sidesteps — callers wanting convergence iterate on
    the returned frame's label-change count (bounded probe), the
    pagerank ``tol`` discipline.

    Scale posture: the symmetric neighbor list is materialized once;
    each iteration is the (node-bounded) label table joined to the
    cached neighbor list, a partial-aggregated (node, label) count,
    then a per-node arg-min — ``min_by`` over
    ``struct(-count, label)``, an ordinary partial-aggregatable
    aggregate, NOT a global window. O(K) shuffles total; per-node
    state is one row, so a 90M-host graph carries 90M label rows per
    iteration. ``broadcast_labels`` follows pagerank's bounded-probe
    discipline (r13 VERDICT #1): ``None`` broadcasts the label side
    of each iteration's join only when the node count reads ≤ 1M;
    above that the join ships unhinted (AQE decides) — forcing a
    90M-row broadcast per round would OOM, and a hint cannot be
    demoted at runtime."""
    if iterations < 1:
        raise ValueError("iterations must be >= 1")
    require_free_columns("label_propagation", edges.columns,
                         _WORKING + ("__a", "__b", "__c"))
    require_free_columns("label_propagation", edges.columns,
                         ("node", "community"), kind="output")
    nbr = (edges
           .filter(F.col(src).isNotNull() & F.col(dst).isNotNull()
                   & (F.col(src) != F.col(dst)))
           .select(F.col(src).alias("__a"), F.col(dst).alias("__b")))
    nbr = nbr.union(nbr.select(F.col("__b").alias("__a"),
                               F.col("__a").alias("__b"))).distinct()
    if materialize:
        nbr = nbr.localCheckpoint()
    labels = (nbr.select(F.col("__a").alias("node"))
              .distinct()
              .select("node", F.col("node").alias("community")))
    if materialize:
        labels = labels.localCheckpoint()
    if broadcast_labels is None:
        # bounded probe (one scalar off the materialized label
        # table) — only paid when the caller leaves the gate on auto
        broadcast_labels = _gate_broadcast(None, labels.count())
    for _ in range(iterations):
        lbl = F.broadcast(labels) if broadcast_labels else labels
        counts = (nbr.join(lbl, nbr["__b"] == lbl["node"])
                  .groupBy(F.col("__a").alias("node"),
                           F.col("community"))
                  .agg(F.count(F.lit(1)).alias("__c")))
        labels = counts.groupBy("node").agg(
            F.min_by("community",
                     F.struct((-F.col("__c")).alias("nc"),
                              F.col("community").alias("l")))
            .alias("community"))
        if materialize:
            # LAZY (r16): materializes inside the next iteration's
            # broadcast build (or the consumer's action) — the eager
            # form paid one synchronous job per iteration
            labels = labels.localCheckpoint(eager=False)
    return labels.select("node", "community")


def cocitation(edges: DataFrame, src: str, dst: str,
               mode: str = "cocitation",
               min_common: int = 1,
               max_linker_degree: int | None = None,
               jaccard_digits: int | None = None,
               broadcast_degrees: bool | None = None,
               materialize: bool = True) -> DataFrame:
    """Co-citation / bibliographic-coupling similarity (Small 1973 /
    Kessler 1963, public measures) over a directed edge list — the
    related-host discovery pass: two hosts are CO-CITED when the same
    third host links to both (similar by endorsement), and COUPLED
    when they link to the same third host (similar by behavior).
    Corpus curation uses co-citation to expand a trusted seed set and
    coupling to spot coordinated link networks.

    Returns ``(node_a, node_b, common, jaccard)`` for every unordered
    pair with at least ``min_common`` shared in-neighbors
    (``mode="cocitation"``) or shared out-neighbors
    (``mode="coupling"``), with ``node_a < node_b``, ``common`` the
    shared-neighbor count and ``jaccard`` = common / (deg_a + deg_b −
    common) over the corresponding DISTINCT neighbor sets. The edge
    list is de-duplicated and self-loop/NULL-filtered first, so
    parallel edges never inflate the counts.

    Scale posture: the pair generation is the classic self-join on
    the shared linker — per linker of degree D it emits D·(D−1)/2
    pairs, so one mega-hub (a directory page linking half the web)
    quadratically floods the shuffle. ``max_linker_degree`` caps it:
    linkers with more than that many distinct targets are EXCLUDED
    from pair generation (the standard frequent-linker cut — a hub
    that links everywhere carries no similarity signal; its
    endorsement is vacuous). Degrees for the Jaccard are computed
    BEFORE the cap (the true set sizes) and join back onto the pair
    aggregation, which is one partial-aggregated shuffle keyed by
    the pair. ``broadcast_degrees`` follows pagerank's bounded-probe
    discipline (r13 VERDICT #1): ``None`` broadcasts the degree
    tables only when the bounded node probe reads ≤ 1M — on a
    page-scale graph those frames are 90M+ rows and a forced
    broadcast would OOM the build side; the unhinted join lets AQE
    decide. The ``max_linker_degree`` keep-set is LINKER-bounded
    (a different — and on the cocitation shape, far larger —
    cardinality than the item-side degree tables), so its semi-join
    always ships unhinted regardless of the flag; AQE broadcasts it
    at runtime when it is genuinely small (r14 ADVICE). ``materialize``
    snapshots the distinct edge list and the degree table once
    (r14): the plan otherwise re-derives the upstream distinct for
    BOTH sides of the pair self-join, both degree joins, and the
    gate probe — the family's standard one-materialization
    discipline."""
    if mode not in ("cocitation", "coupling"):
        raise ValueError("mode must be 'cocitation' or 'coupling'")
    if min_common < 1:
        raise ValueError("min_common must be >= 1")
    require_free_columns("cocitation", edges.columns,
                         _WORKING + ("__lk", "__it", "__d",
                                     "__da", "__db"))
    require_free_columns("cocitation", edges.columns,
                         ("node_a", "node_b", "common", "jaccard"),
                         kind="output")
    # orient so "linker" is the shared endpoint and "item" the ranked one
    linker, item = (src, dst) if mode == "cocitation" else (dst, src)
    el = (edges
          .filter(F.col(src).isNotNull() & F.col(dst).isNotNull()
                  & (F.col(src) != F.col(dst)))
          .select(F.col(linker).alias("__lk"), F.col(item).alias("__it"))
          .distinct())
    if materialize:
        el = el.localCheckpoint()
    deg = el.groupBy(F.col("__it").alias("node")).agg(
        F.count(F.lit(1)).alias("__deg"))
    if materialize:
        deg = deg.localCheckpoint()
    if broadcast_degrees is None:
        # bounded probe (one scalar): the degree table is one row per
        # item node, so its count IS the node bound the gate needs
        broadcast_degrees = _gate_broadcast(None, deg.count())
    gen = el
    if max_linker_degree is not None:
        keep = (el.groupBy("__lk")
                .agg(F.count(F.lit(1)).alias("__d"))
                .filter(F.col("__d") <= max_linker_degree)
                .select("__lk"))
        # The keep-set is LINKER-bounded, not item-bounded: on the
        # docstring's own target shape (90M pages citing <=1M hosts)
        # the item probe reads small and auto-enables the gate while
        # the keep frame is ~90M rows — forcing F.broadcast here is
        # the exact OOM the bounded-probe discipline exists to
        # prevent (r14 ADVICE, medium). The semi-join ships unhinted;
        # it is built ONCE (not per iteration) and AQE converts it to
        # a broadcast at runtime whenever the keep-set is actually
        # small, so host-scale graphs lose nothing.
        gen = el.join(keep, "__lk", "left_semi")
    a, b = gen.alias("__l"), gen.alias("__r")
    pairs = (a.join(b, (F.col("__l.__lk") == F.col("__r.__lk"))
                    & (F.col("__l.__it") < F.col("__r.__it")))
             .groupBy(F.col("__l.__it").alias("node_a"),
                      F.col("__r.__it").alias("node_b"))
             .agg(F.count(F.lit(1)).alias("common"))
             .filter(F.col("common") >= min_common))
    da = (deg.withColumnRenamed("node", "node_a")
          .withColumnRenamed("__deg", "__da"))
    db = (deg.withColumnRenamed("node", "node_b")
          .withColumnRenamed("__deg", "__db"))
    if broadcast_degrees:
        da, db = F.broadcast(da), F.broadcast(db)
    jac = (F.col("common")
           / (F.col("__da") + F.col("__db") - F.col("common")))
    if jaccard_digits is not None:
        jac = F.round(jac, jaccard_digits)
    return (pairs.join(da, "node_a").join(db, "node_b")
            .select("node_a", "node_b", "common", jac.alias("jaccard")))


def k_core(edges: DataFrame, src: str, dst: str, k: int,
           rounds: int = 8, until_stable: bool = False,
           materialize: bool = True,
           broadcast_survivors: bool | None = None,
           on_cap: str = "silent") -> DataFrame:
    """k-core peeling (Seidman 1983, public algorithm) over the edge
    list treated as UNDIRECTED: repeatedly remove every node whose
    degree among the SURVIVORS is below ``k``. The corpus-curation
    read: the k-core is the mutually-reinforcing dense part of the
    host graph — link farms and tightly-coupled site families
    concentrate in high cores, while legitimately popular-but-
    independent hosts peel out early; core membership is a standard
    spam/cohesion feature next to PageRank (which measures incoming
    endorsement, not mutual density).

    Returns ``(node, degree)`` for nodes surviving ``rounds``
    synchronous peel rounds, with ``degree`` recounted among the
    final survivors. Fixed ``rounds`` is the oracle-checkable form:
    peeling is MONOTONE (survivor sets only shrink), so once a round
    removes nobody the result is the true k-core and further rounds
    are no-ops — a ``rounds`` past the graph's peel depth returns the
    exact k-core. ``until_stable=True`` iterates to that fixpoint
    with ``rounds`` as the cap, checking one bounded count probe per
    round (the pagerank ``tol`` discipline; requires
    ``materialize=True``). Self-loops, NULL endpoints, and parallel
    edges drop (degree is over the DISTINCT neighbor set).

    Scale posture: the symmetric neighbor list is materialized once;
    each round is two semi-joins of the cached neighbor list against
    the (node-bounded) survivor set plus one partial-aggregated
    degree count — O(rounds) shuffles, survivor state one row per
    node. Peel depth on real webgraphs is far below the worst case
    (a path graph peels one node per round from each end);
    ``until_stable`` stops at the true depth. ``broadcast_survivors``
    follows pagerank's bounded-probe discipline (r13 VERDICT #1):
    ``None`` broadcasts the survivor set into the per-round
    semi-joins only when the initial node count reads ≤ 1M (survivor
    sets only SHRINK, so the initial count bounds every round);
    above that the semi-joins ship unhinted — a forced 90M-row
    broadcast twice per peel round would OOM the build side.

    Convergence visibility (r14 VERDICT #2): the module diagnostics
    ``_LAST_KCORE_ROUNDS`` / ``_LAST_KCORE_CONVERGED`` record the
    rounds the call executed and whether ``until_stable`` VERIFIED
    the fixed point (``None`` under fixed rounds — no probe runs).
    ``on_cap`` escalates an ``until_stable`` run that exhausts the
    cap with the last round still shrinking: ``"silent"`` (default —
    the result is the documented monotone upper bound), ``"warn"``
    (RuntimeWarning), or ``"raise"`` (connected_components' loud
    discipline for callers that treat an unverified bound as
    wrong). An escalating ``on_cap`` without ``until_stable=True``
    raises ValueError — fixed-rounds runs never probe the fixpoint,
    so the signal could not fire and accepting the combination would
    silently disarm it."""
    if k < 1:
        raise ValueError("k must be >= 1")
    if rounds < 1:
        raise ValueError("rounds must be >= 1")
    if until_stable and not materialize:
        raise ValueError("until_stable requires materialize=True "
                         "(each stability probe evaluates the plan)")
    if on_cap not in ("silent", "warn", "raise"):
        raise ValueError("on_cap must be 'silent', 'warn', or 'raise'")
    if on_cap != "silent" and not until_stable:
        raise ValueError("on_cap escalation requires until_stable=True "
                         "(fixed-rounds runs never probe the fixpoint, "
                         "so a cap-hit signal could not fire)")
    require_free_columns("k_core", edges.columns,
                         _WORKING + ("__a", "__b"))
    require_free_columns("k_core", edges.columns, ("node", "degree"),
                         kind="output")
    nbr = (edges
           .filter(F.col(src).isNotNull() & F.col(dst).isNotNull()
                   & (F.col(src) != F.col(dst)))
           .select(F.col(src).alias("__a"), F.col(dst).alias("__b")))
    nbr = nbr.union(nbr.select(F.col("__b").alias("__a"),
                               F.col("__a").alias("__b"))).distinct()
    if materialize:
        nbr = nbr.localCheckpoint()
    survivors = nbr.select(F.col("__a").alias("node")).distinct()
    if materialize:
        survivors = survivors.localCheckpoint()
    n_prev = None
    if until_stable or broadcast_survivors is None:
        # one bounded probe serves both the stability baseline and
        # the broadcast gate — survivor sets only shrink, so the
        # initial count bounds every round's build side
        n_prev = survivors.count()
    broadcast_survivors = _gate_broadcast(
        broadcast_survivors, n_prev if n_prev is not None else 0)

    def _alive_degrees(alive: DataFrame) -> DataFrame:
        sa = alive.withColumnRenamed("node", "__a")
        sb = alive.withColumnRenamed("node", "__b")
        if broadcast_survivors:
            sa, sb = F.broadcast(sa), F.broadcast(sb)
        return (nbr
                .join(sa, "__a", "left_semi")
                .join(sb, "__b", "left_semi")
                .groupBy(F.col("__a").alias("node"))
                .agg(F.count(F.lit(1)).alias("degree")))

    global _LAST_KCORE_ROUNDS, _LAST_KCORE_CONVERGED
    executed, converged = 0, None
    for _ in range(rounds):
        survivors = (_alive_degrees(survivors)
                     .filter(F.col("degree") >= k).select("node"))
        if materialize:
            # LAZY (r16): the stability probe (or the next round's
            # semi-join sides) materializes the snapshot inside its
            # own job — one job per peel round instead of two
            survivors = survivors.localCheckpoint(eager=False)
        executed += 1
        if until_stable:
            n_now = survivors.count()  # bounded probe: one scalar
            if n_now == n_prev:
                converged = True
                break
            n_prev = n_now
    if until_stable and converged is None:
        converged = False
    # diagnostics recorded BEFORE the escalation so a raise still
    # leaves the cap-hit observable
    _LAST_KCORE_ROUNDS, _LAST_KCORE_CONVERGED = executed, converged
    if converged is False:
        _on_cap_signal("k_core", rounds, on_cap)
    # LEFT join from the survivor set: under fixed rounds a survivor
    # can lose its last surviving neighbor in the final round (kept
    # at round R because its count over survivors_{R-1} cleared k,
    # recounted over survivors_R). It must REPORT degree 0, not
    # silently vanish — at the true fixpoint the two forms coincide
    # (every degree >= k), but the fixed-rounds contract promises one
    # row per survivor. Caught by this round's self-review; pinned by
    # the hub-and-leaves test.
    return (survivors.join(_alive_degrees(survivors), "node", "left")
            .select("node",
                    F.coalesce(F.col("degree"), F.lit(0).cast("long"))
                    .alias("degree")))


def triangle_count(edges: DataFrame, src: str, dst: str,
                   coeff_digits: int | None = None,
                   materialize: bool = True,
                   broadcast_degrees: bool | None = None) -> DataFrame:
    """Per-node triangle count and local clustering coefficient over
    the edge list treated as UNDIRECTED (self-loops/NULLs/parallels
    drop) — the density signal next to k-core: a host whose
    neighbors also link to EACH OTHER sits in a cohesive (often
    coordinated) cluster, while a high-degree host with coefficient
    ~0 is a hub bridging unrelated sites. Returns ``(node, degree,
    triangles, clustering)`` for every node, ``clustering`` =
    2·T / (deg·(deg−1)) (0 when deg < 2), rounded to
    ``coeff_digits`` (the cross-engine float rule — the division is
    exact-integer so rounding is belt-and-braces).

    Scale posture — the degree-ORIENTATION trick (Chiba-Nishizeki
    1985 / the standard MapReduce formulation, Suri-Vassilvitskii
    2011): orient every undirected edge from the endpoint with the
    SMALLER (degree, node) pair to the larger. The orientation is
    consistent with a total order, so every triangle has exactly ONE
    node with two outgoing oriented edges, and enumeration becomes
    wedge-generation from oriented adjacency (fan-out bounded by
    out-degree ≤ O(√m) for the heavy nodes — a 10M-follower hub
    generates no wedges; its LOW-degree neighbors claim them) plus
    one equi-join probe for the closing edge. Three shuffles total:
    the wedge self-join, the closing probe, and the per-corner
    count. ``broadcast_degrees`` follows pagerank's bounded-probe
    discipline (r13 VERDICT #1): ``None`` broadcasts the degree
    table into the orientation join only when the bounded node
    probe reads ≤ 1M; above that the join ships unhinted (AQE
    decides) — a forced 90M-row degree broadcast would OOM."""
    require_free_columns("triangle_count", edges.columns,
                         _WORKING + ("__a", "__b", "__c", "__deg"))
    require_free_columns("triangle_count", edges.columns,
                         ("node", "degree", "triangles", "clustering"),
                         kind="output")
    nbr = (edges
           .filter(F.col(src).isNotNull() & F.col(dst).isNotNull()
                   & (F.col(src) != F.col(dst)))
           .select(F.col(src).alias("__a"), F.col(dst).alias("__b")))
    nbr = nbr.union(nbr.select(F.col("__b").alias("__a"),
                               F.col("__a").alias("__b"))).distinct()
    if materialize:
        nbr = nbr.localCheckpoint()
    deg = (nbr.groupBy(F.col("__a").alias("node"))
           .agg(F.count(F.lit(1)).alias("__deg")))
    if materialize:
        deg = deg.localCheckpoint()
    if broadcast_degrees is None:
        # bounded probe (one scalar off the materialized degree
        # table): one row per node, so its count IS the node bound
        broadcast_degrees = _gate_broadcast(None, deg.count())
    # orient low -> high in the (degree, node) total order
    da = deg.select(F.col("node").alias("__a"),
                    F.col("__deg").alias("__dega"))
    db = deg.select(F.col("node").alias("__b"),
                    F.col("__deg").alias("__degb"))
    if broadcast_degrees:
        da, db = F.broadcast(da), F.broadcast(db)
    oriented = (nbr.join(da, "__a").join(db, "__b")
                .filter((F.col("__dega") < F.col("__degb"))
                        | ((F.col("__dega") == F.col("__degb"))
                           & (F.col("__a") < F.col("__b"))))
                .select("__a", "__b",
                        F.col("__dega").alias("__oda"),
                        F.col("__degb").alias("__odb")))
    if materialize:
        oriented = oriented.localCheckpoint()
    w1 = oriented.select(F.col("__a"), F.col("__b").alias("__w1"),
                         F.col("__odb").alias("__d1"))
    w2 = oriented.select(F.col("__a"), F.col("__b").alias("__w2"),
                         F.col("__odb").alias("__d2"))
    # wedges out of the order-smallest corner; the closing edge must
    # itself run low->high in the same order, so probe (__w1, __w2)
    # with __w1 before __w2
    wedges = (w1.join(w2, "__a")
              .filter((F.col("__d1") < F.col("__d2"))
                      | ((F.col("__d1") == F.col("__d2"))
                         & (F.col("__w1") < F.col("__w2")))))
    tri = (wedges.join(
               oriented.select(F.col("__a").alias("__w1"),
                               F.col("__b").alias("__w2")),
               ["__w1", "__w2"], "left_semi")
           .select("__a", "__w1", "__w2"))
    corners = (tri.select(F.col("__a").alias("node"))
               .union(tri.select(F.col("__w1").alias("node")))
               .union(tri.select(F.col("__w2").alias("node"))))
    counts = corners.groupBy("node").agg(
        F.count(F.lit(1)).alias("triangles"))
    out = (deg.join(counts, "node", "left")
           .select("node", F.col("__deg").alias("degree"),
                   F.coalesce(F.col("triangles"),
                              F.lit(0).cast("long")).alias("triangles")))
    d = F.col("degree").cast("double")
    coeff = F.when(F.col("degree") >= 2,
                   2.0 * F.col("triangles") / (d * (d - 1.0))) \
        .otherwise(F.lit(0.0))
    if coeff_digits is not None:
        coeff = F.round(coeff, coeff_digits)
    return out.select("node", "degree", "triangles",
                      coeff.alias("clustering"))


def core_number(edges: DataFrame, src: str, dst: str,
                rounds: int = 8, until_stable: bool = False,
                materialize: bool = True,
                broadcast_values: bool | None = None,
                on_cap: str = "silent") -> DataFrame:
    """Full core decomposition — per-node core NUMBER (the largest k
    for which the node survives k-core peeling) via the iterated
    H-index (Lü-Chen-Ren-Zhang-Zhang-Zhou 2016, Nature
    Communications — public algorithm): start every node at its
    degree and repeatedly replace each node's value with the H-index
    of its neighbors' values,

        c_0(v) = deg(v)
        c_t(v) = H({ c_{t-1}(u) : u ∈ N(v) })

    where H(S) is the largest h such that at least h members of S
    are ≥ h. The sequence is monotonically non-increasing and its
    fixed point IS the coreness (the paper's theorem) — no
    sequential peel order needed, which is what makes the
    decomposition distributable; bin-sort peeling is inherently
    serial. This turns :func:`k_core`'s one-k membership filter into
    the FEATURE column a curation pipeline joins (coreness ≥ k ⇔
    k-core membership, property-tested), ranking every host by how
    deep it sits in the mutually-reinforcing part of the graph.

    Returns ``(node, core)``. Fixed ``rounds`` is the
    oracle-checkable form (the SQL oracle unrolls the SAME
    iteration, so Spark and DuckDB agree round for round even before
    convergence); ``until_stable=True`` iterates to the true
    coreness with ``rounds`` as the cap, probing one bounded scalar
    (the value sum — monotone, so unchanged-sum ⇔ fixed point) per
    round, the pagerank ``tol`` discipline (requires
    ``materialize=True``). Edges are undirected; self-loops, NULL
    endpoints, and parallel edges drop (degree over the DISTINCT
    neighbor set).

    Scale posture: the symmetric neighbor list is materialized once;
    each round is one join of the (node-bounded) value table onto
    the cached neighbor list, a DEGREE-bounded keyed window (the
    H-index is max(min(rank_desc, value)) over each node's neighbor
    values — partitioned BY NODE, so the partition is one
    adjacency list, never the graph), and a partial-aggregated max.
    O(rounds) shuffles. ``broadcast_values`` is the family's
    bounded-probe gate (r13 VERDICT #1): ``None`` broadcasts the
    value table only when the node count reads ≤ 1M; above that the
    join ships unhinted and AQE decides.

    Convergence visibility (r14 VERDICT #2): the module diagnostics
    ``_LAST_CORE_ROUNDS`` / ``_LAST_CORE_CONVERGED`` record the
    rounds executed and whether ``until_stable`` VERIFIED the fixed
    point (``None`` under fixed rounds). ``on_cap`` escalates an
    ``until_stable`` run that exhausts the cap with values still
    falling: ``"silent"`` (default — the result is the documented
    monotone upper bound on the coreness), ``"warn"``
    (RuntimeWarning), or ``"raise"``; escalation without
    ``until_stable=True`` raises ValueError (no probe, no signal —
    the combination would silently disarm it)."""
    from pyspark.sql import Window

    if rounds < 1:
        raise ValueError("rounds must be >= 1")
    if until_stable and not materialize:
        raise ValueError("until_stable requires materialize=True "
                         "(each stability probe evaluates the plan)")
    if on_cap not in ("silent", "warn", "raise"):
        raise ValueError("on_cap must be 'silent', 'warn', or 'raise'")
    if on_cap != "silent" and not until_stable:
        raise ValueError("on_cap escalation requires until_stable=True "
                         "(fixed-rounds runs never probe the fixpoint, "
                         "so a cap-hit signal could not fire)")
    require_free_columns("core_number", edges.columns,
                         _WORKING + ("__a", "__b", "__c", "__rn"))
    require_free_columns("core_number", edges.columns,
                         ("node", "core"), kind="output")
    nbr = (edges
           .filter(F.col(src).isNotNull() & F.col(dst).isNotNull()
                   & (F.col(src) != F.col(dst)))
           .select(F.col(src).alias("__a"), F.col(dst).alias("__b")))
    nbr = nbr.union(nbr.select(F.col("__b").alias("__a"),
                               F.col("__a").alias("__b"))).distinct()
    if materialize:
        nbr = nbr.localCheckpoint()
    vals = (nbr.groupBy(F.col("__a").alias("node"))
            .agg(F.count(F.lit(1)).alias("__c")))
    if materialize:
        vals = vals.localCheckpoint()
    if broadcast_values is None:
        # bounded probe: the value table is one row per node
        broadcast_values = _gate_broadcast(None, vals.count())
    s_prev = None
    if until_stable:
        s_prev = vals.agg(F.sum("__c")).first()[0]
    w = (Window.partitionBy("__a")
         .orderBy(F.col("__c").desc(), F.col("__b")))
    global _LAST_CORE_ROUNDS, _LAST_CORE_CONVERGED
    executed, converged = 0, None
    for _ in range(rounds):
        vside = F.broadcast(vals) if broadcast_values else vals
        # H-index of the neighbor multiset: sort desc, rank, take
        # max(min(rank, value)) — a window over ONE adjacency list
        vals = (nbr.join(vside, nbr["__b"] == vside["node"])
                .select("__a", "__b", "__c")
                .withColumn("__rn", F.row_number().over(w))
                .groupBy(F.col("__a").alias("node"))
                .agg(F.max(F.least(F.col("__rn").cast("long"),
                                   F.col("__c")))
                     .alias("__c")))
        if materialize:
            # LAZY (r16): the sum probe (or next round's join side)
            # materializes it — one job per H-index round, not two
            vals = vals.localCheckpoint(eager=False)
        executed += 1
        if until_stable:
            # monotone non-increasing values: an unchanged sum means
            # every value is unchanged — one bounded scalar probe
            s_now = vals.agg(F.sum("__c")).first()[0]
            if s_now == s_prev:
                converged = True
                break
            s_prev = s_now
    if until_stable and converged is None:
        converged = False
    # diagnostics recorded BEFORE the escalation so a raise still
    # leaves the cap-hit observable
    _LAST_CORE_ROUNDS, _LAST_CORE_CONVERGED = executed, converged
    if converged is False:
        _on_cap_signal("core_number", rounds, on_cap)
    return vals.select("node", F.col("__c").alias("core"))
