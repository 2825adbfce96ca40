"""Pure-Python property tests for the pointer-jumping min-label
recurrence behind `_sql_cc_labels` (dedup_queries.py): the CC oracles
run a FIXED 10 rounds, so the identity "10 rounds reach the component
minimum" must hold for every component diameter the data can produce.

The recurrence per round is
    lbl'(n) = min over ( lbl(lbl(n)),  lbl(m) for m in N(n),  lbl(n) )
and the jump term doubles the propagated distance per round (2^k after
k rounds), so 10 rounds cover diameters far beyond anything an LSH
near-dup graph produces.  These tests pin that doubling on the
adversarial worst case (a path with its minimum at one end) and on
random graphs against union-find ground truth — in pure Python, per
the house rule that a closed-form identity must be verified outside
both engines (parity alone cannot catch an identity that is wrong the
same way on both sides; here the engines run DIFFERENT algorithms, so
this guards the oracle's round budget specifically)."""

from __future__ import annotations

import hashlib

from hypothesis import given, settings
from hypothesis import strategies as st

ROUNDS = 10  # keep in sync with _sql_cc_labels(rounds=10)


def _pointer_jump_labels(nodes: list[int], edges: list[tuple[int, int]], rounds: int) -> dict[int, int]:
    """Exact Python replica of the unrolled SQL rounds."""
    nbrs: dict[int, set[int]] = {n: {n} for n in nodes}
    for a, b in edges:
        nbrs[a].add(b)
        nbrs[b].add(a)
    lbl = {n: min(nbrs[n]) for n in nodes}  # lbl0: min over sym incl self
    for _ in range(rounds):
        lbl = {
            n: min(
                lbl[lbl[n]],
                *(lbl[m] for m in nbrs[n]),
            )
            for n in nodes
        }
    return lbl


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


def test_path_graph_doubles_distance_per_round():
    """Worst case: a path with the min at one end.  After k rounds the
    label has propagated 2^k hops, so a 1000-node path (diameter 999)
    converges inside the 10-round budget — and a path needing more
    than 2^ROUNDS hops would NOT, which pins the budget's meaning."""
    n = 1000
    nodes = list(range(n))
    edges = [(i, i + 1) for i in range(n - 1)]
    got = _pointer_jump_labels(nodes, edges, ROUNDS)
    assert all(v == 0 for v in got.values())


def test_round_budget_is_tight_not_magic():
    """3 rounds propagate at most 2^3 = 8 hops; node 500 of a path is
    NOT labeled 0 yet — i.e. convergence genuinely comes from the
    round budget, not from some hidden shortcut in the recurrence."""
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
def test_random_graphs_match_union_find(n: int, seed: int, density: int) -> None:
    nodes = list(range(n))
    edges = []
    n_edges = (n * density) // 2
    for i in range(n_edges):
        h = hashlib.md5(f"{seed}:{i}".encode()).digest()
        a = int.from_bytes(h[:4], "big") % n
        b = int.from_bytes(h[4:8], "big") % n
        if a != b:
            edges.append((a, b))
    assert _pointer_jump_labels(nodes, edges, ROUNDS) == _union_find_labels(
        nodes, edges
    )


def test_clique_chain_like_lsh_bridges():
    """The actual sf1 shape: 10-member near-dup cliques bridged into a
    chain by single collision edges — diameter grows with chain
    length; 50 bridged cliques converge comfortably."""
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
    got = _pointer_jump_labels(nodes, edges, ROUNDS)
    assert all(v == 0 for v in got.values())
