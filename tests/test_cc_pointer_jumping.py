"""Pure-Python property tests for the pointer-jumping min-label
recurrence behind `_sql_cc_labels` (dedup_queries.py) and the engine's
`connected_components` loop (operators/dedup.py).

History: through r7 these tests asserted the claim "the jump term
doubles propagated distance per round, so 10 rounds cover diameters up
to ~2^10".  Hypothesis falsified it (n=41, seed=6433, density=2: a
39-edge component needs 11 rounds) — doubling only holds along
monotone label chains.  The r8 rewrite re-bases soundness on the
identity that IS provable and is property-tested here:

    a FIXED POINT of  lbl'(n) = min(lbl(lbl(n)), min_{m in N(n)+{n}} lbl(m))
    is exactly the component-minimum labeling.

Proof sketch (pinned by test_fixed_point_is_component_min): label
values are always ids of nodes in the same component (induction), and
at a fixed point every edge (a,b) forces lbl(a) <= lbl(b) and
lbl(b) <= lbl(a), so lbl is constant per component; the component's
minimum node m has lbl(m) <= m, and the constant is >= the component
min, hence equal to it.

Consequently the round budget is never a correctness input: both
sides detect non-convergence loudly (the oracle's cc_conv sentinel
CTE calls DuckDB error(); the engine raises RuntimeError when
max_iter exhausts with n_changed > 0).  These tests pin (a) the
fixed-point identity, (b) "converged => correct" at the production
budget, and (c) that the sentinel catches the exact pinned
counterexample that was silently wrong pre-fix — in pure Python, per
the house rule that a closed-form identity must be verified outside
both engines."""

from __future__ import annotations

import hashlib

from hypothesis import example, given, settings
from hypothesis import strategies as st

ROUNDS = 12  # keep in sync with _sql_cc_labels(rounds=12)


def _pointer_jump_rounds(
    nodes: list[int], edges: list[tuple[int, int]], rounds: int
) -> list[dict[int, int]]:
    """Exact Python replica of the unrolled SQL rounds; returns the
    label map after EVERY round (index 0 = lbl0) so callers can apply
    the same convergence sentinel the oracle uses (lblN == lblN-1)."""
    nbrs: dict[int, set[int]] = {n: {n} for n in nodes}
    for a, b in edges:
        nbrs[a].add(b)
        nbrs[b].add(a)
    lbl = {n: min(nbrs[n]) for n in nodes}  # lbl0: min over sym incl self
    history = [lbl]
    for _ in range(rounds):
        lbl = {
            n: min(
                lbl[lbl[n]],
                *(lbl[m] for m in nbrs[n]),
            )
            for n in nodes
        }
        history.append(lbl)
    return history


def _pointer_jump_labels(
    nodes: list[int], edges: list[tuple[int, int]], rounds: int
) -> dict[int, int]:
    return _pointer_jump_rounds(nodes, edges, rounds)[-1]


def _converged(history: list[dict[int, int]]) -> bool:
    """The oracle's cc_conv sentinel: last two rounds identical."""
    return history[-1] == history[-2]


def _union_find_labels(nodes: list[int], edges: list[tuple[int, int]]) -> dict[int, int]:
    parent = {n: n for n in nodes}

    def find(x: int) -> int:
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for a, b in edges:
        ra, rb = find(a), find(b)
        if ra != rb:
            parent[max(ra, rb)] = min(ra, rb)
    comp: dict[int, list[int]] = {}
    for n in nodes:
        comp.setdefault(find(n), []).append(n)
    return {n: min(members) for members in comp.values() for n in members}


def _random_graph(n: int, seed: int, density: int) -> tuple[list[int], list[tuple[int, int]]]:
    nodes = list(range(n))
    edges = []
    n_edges = (n * density) // 2
    for i in range(n_edges):
        h = hashlib.md5(f"{seed}:{i}".encode()).digest()
        a = int.from_bytes(h[:4], "big") % n
        b = int.from_bytes(h[4:8], "big") % n
        if a != b:
            edges.append((a, b))
    return nodes, edges


def test_path_graph_doubles_distance_per_round():
    """Monotone chains ARE the doubling case (labels along a path with
    the min at one end stay ordered, so lbl(lbl(n)) jumps 2^k hops):
    a 1000-node path (diameter 999) converges inside 10 rounds.  This
    documents why real data settles fast — NOT a general diameter
    bound (see module docstring)."""
    n = 1000
    nodes = list(range(n))
    edges = [(i, i + 1) for i in range(n - 1)]
    got = _pointer_jump_labels(nodes, edges, 10)
    assert all(v == 0 for v in got.values())


def test_round_budget_is_tight_not_magic():
    """3 rounds propagate at most 2^3 = 8 hops on the monotone path;
    node 500 is NOT labeled 0 yet — convergence genuinely comes from
    the rounds, not from some hidden shortcut in the recurrence."""
    n = 600
    nodes = list(range(n))
    edges = [(i, i + 1) for i in range(n - 1)]
    got = _pointer_jump_labels(nodes, edges, 3)
    assert got[500] != 0


@settings(max_examples=200, deadline=None)
@given(
    n=st.integers(min_value=1, max_value=60),
    seed=st.integers(min_value=0, max_value=10_000),
    density=st.integers(min_value=0, max_value=3),
)
def test_fixed_point_is_component_min(n: int, seed: int, density: int) -> None:
    """The identity both convergence sentinels rest on: iterate to an
    actual fixed point (n rounds always suffice — the neighbor term
    alone propagates one hop per round) and the labels are exactly
    union-find's component minima."""
    nodes, edges = _random_graph(n, seed, density)
    history = _pointer_jump_rounds(nodes, edges, n + 1)
    assert _converged(history), "n+1 rounds must reach the fixed point"
    assert history[-1] == _union_find_labels(nodes, edges)


@settings(max_examples=200, deadline=None)
@given(
    n=st.integers(min_value=1, max_value=60),
    seed=st.integers(min_value=0, max_value=10_000),
    density=st.integers(min_value=0, max_value=3),
)
@example(n=41, seed=6433, density=2)  # r7 judge's counterexample: needs 11 rounds
def test_production_budget_sound_on_random_graphs(n: int, seed: int, density: int) -> None:
    """At the production budget (ROUNDS=12): whenever the sentinel
    reports convergence the labels MUST match union-find, and a
    non-convergent run must be flagged (never a silent wrong answer).
    This is the exact contract the oracle enforces via error() and the
    engine via RuntimeError."""
    nodes, edges = _random_graph(n, seed, density)
    history = _pointer_jump_rounds(nodes, edges, ROUNDS)
    if _converged(history):
        assert history[-1] == _union_find_labels(nodes, edges)
    else:
        # unconverged is allowed only if the labels are indeed not yet
        # final — i.e. the sentinel fires precisely when needed
        assert history[-1] != history[-2]


def test_counterexample_pinned_forever():
    """n=41, seed=6433, density=2 — the graph that falsified the 2^k
    claim.  Pre-fix (10 rounds, no sentinel) it returned lbl(2)=1 vs
    true 0 SILENTLY.  Post-fix: at 10 rounds the sentinel fires (last
    two rounds differ), and at the production budget it converges to
    the correct labels."""
    nodes, edges = _random_graph(41, 6433, 2)
    truth = _union_find_labels(nodes, edges)

    ten = _pointer_jump_rounds(nodes, edges, 10)
    assert ten[-1] != truth, "counterexample no longer reproduces"
    assert not _converged(ten), "sentinel MUST catch the wrong 10-round answer"

    prod = _pointer_jump_rounds(nodes, edges, ROUNDS)
    assert _converged(prod)
    assert prod[-1] == truth


def test_duckdb_sentinel_fires_on_unconverged_budget():
    """The cc_conv sentinel must fire IN DuckDB, not just in the Python
    replica: run _sql_cc_labels with a deliberately tiny budget on a
    path graph that cannot converge in it and assert the query ABORTS
    (InvalidInputException from error()) instead of returning labels."""
    import duckdb
    import pytest

    # load the registry package first: importing dedup_queries directly
    # short-circuits the queries module's import order (circular import)
    import kinesis_to_opensearch_lambda_spark.queries  # noqa: F401
    from kinesis_to_opensearch_lambda_spark.operators.dedup_queries import (
        _sql_cc_labels,
    )

    n = 40
    edges = " UNION ALL ".join(
        f"SELECT {i} AS a, {i + 1} AS b" for i in range(n - 1)
    )
    base = f"""
    WITH RECURSIVE und AS ({edges}), sym AS (
      SELECT a, b FROM und
      UNION SELECT b, a FROM und
      UNION SELECT a, a FROM und
      UNION SELECT b, b FROM und
    ), {{labels}}
    SELECT * FROM labels
    """
    con = duckdb.connect()
    # budget 2: a 40-node path needs far more rounds -> sentinel aborts
    with pytest.raises(duckdb.InvalidInputException, match="unconverged"):
        con.execute(base.format(labels=_sql_cc_labels(rounds=2))).fetchall()
    # production budget: converges, returns the component minimum for all
    rows = con.execute(base.format(labels=_sql_cc_labels())).fetchall()
    assert len(rows) == n
    assert all(lbl == 0 for _, lbl in rows)


def test_clique_chain_like_lsh_bridges():
    """The actual sf1 shape: 10-member near-dup cliques bridged into a
    chain by single collision edges — 50 bridged cliques converge
    comfortably within the production budget, sentinel-confirmed."""
    nodes, edges = [], []
    k, cliques = 10, 50
    for c in range(cliques):
        members = [c * k + i for i in range(k)]
        nodes.extend(members)
        edges.extend(
            (members[i], members[j])
            for i in range(k)
            for j in range(i + 1, k)
        )
        if c > 0:
            edges.append(((c - 1) * k, c * k))  # bridge
    history = _pointer_jump_rounds(nodes, edges, ROUNDS)
    assert _converged(history)
    assert all(v == 0 for v in history[-1].values())


def test_cc_loop_width_invariant_and_conf_restored(spark):
    """r13 scoped the propagation loop's shuffle width to the edge mass
    (SPARK_GRAFT_CC_SHUFFLE overrides).  Labels must be identical at
    width 1 and the session width (min-label algebra is per-key), and
    the session conf must be restored afterward — including on the
    unconverged-RuntimeError exit path."""
    import os

    import pytest
    from pyspark.sql import functions as F

    from kinesis_to_opensearch_lambda_spark.operators.dedup import (
        connected_components,
    )

    pairs = spark.createDataFrame(
        [(1, 2), (2, 3), (10, 11), (20, 21), (21, 22), (22, 23)],
        "doc_a long, doc_b long",
    )
    prev = spark.conf.get("spark.sql.shuffle.partitions")
    results = {}
    for w in ("1", "4"):
        os.environ["SPARK_GRAFT_CC_SHUFFLE"] = w
        try:
            results[w] = sorted(
                tuple(r) for r in connected_components(pairs).collect()
            )
        finally:
            del os.environ["SPARK_GRAFT_CC_SHUFFLE"]
        assert spark.conf.get("spark.sql.shuffle.partitions") == prev
    assert results["1"] == results["4"]
    assert {c for _, c in results["1"]} == {1, 10, 20}

    # conf restored on the error exit too: a 4-chain cannot converge in
    # one round even with the jump term (the tail is 3 hops from the min)
    chain = spark.createDataFrame(
        [(i, i + 1) for i in range(1, 9)], "doc_a long, doc_b long"
    )
    with pytest.raises(RuntimeError, match="did not converge"):
        connected_components(chain, max_iter=1)
    assert spark.conf.get("spark.sql.shuffle.partitions") == prev


def test_cc_paired_rounds_identical_labels_and_budget(spark):
    """r14 pipelines TWO propagation rounds per blocking job (lazy cut
    between them).  The pair's verdict checks only the trailing round's
    n_changed — sound because fixed points stay fixed — so labels must
    be identical to the per-round loop's on shapes that converge on
    both odd and even round numbers, and the max_iter budget must keep
    counting ROUNDS (a 16-chain that needs >2 rounds still raises with
    max_iter=2, i.e. one paired job)."""
    import pytest

    from kinesis_to_opensearch_lambda_spark.operators.dedup import (
        connected_components,
    )

    # 12-chain: log2 convergence needs ~4 rounds (odd/even pair split),
    # plus two singletons-with-an-edge components.
    pairs = spark.createDataFrame(
        [(i, i + 1) for i in range(1, 12)] + [(100, 101), (200, 201)],
        "doc_a long, doc_b long",
    )
    # the 12-chain converges at round 6 under BOTH the r13 per-round
    # loop and the r14 paired loop (probed empirically — identical
    # budget semantics); 7 (odd) exercises the single-round tail.
    for mi in (6, 7, 20):
        labels = {
            r["node"]: r["cluster_id"]
            for r in connected_components(pairs, max_iter=mi).collect()
        }
        assert {labels[n] for n in range(1, 13)} == {1}
        assert labels[100] == labels[101] == 100
        assert labels[200] == labels[201] == 200

    chain = spark.createDataFrame(
        [(i, i + 1) for i in range(1, 17)], "doc_a long, doc_b long"
    )
    with pytest.raises(RuntimeError, match="did not converge"):
        connected_components(chain, max_iter=2)
