"""Differential parity of the BFS candidate-chain builder against an oracle
transcribed line-by-line from the reference implementation
(``src/data/components/bfs_chain_builder.py:149-318``): oriented adjacency
with (score desc, edge_id, direction) branch ordering and branch cap,
FIFO chain expansion with edge/node-revisit rules and the max_total_chains
break, signature dedup with frequency counting + best-score retention, and
(frequency, length, score)-desc ranking with per-sample truncation.

Same pattern as ``tests/test_reference_parity.py``: the oracle re-states the
reference algorithm in plain python; the repo implementation must produce
identical candidate lists (exact dict equality, including tie order, which
both sides inherit from stable sorts over identical insertion orders).
"""

from __future__ import annotations

import dataclasses
from collections import deque

import numpy as np
import pytest

from evi_rag_tpu.data.chains import ChainSettings, build_bfs_candidate_chains

# --------------------------------------------------------------------- #
# Oracle: reference bfs_chain_builder transcription.
# --------------------------------------------------------------------- #


@dataclasses.dataclass(frozen=True)
class _OEdge:
    edge_id: int
    src_local: int
    dst_local: int
    head_local: int
    tail_local: int
    relation_id: int
    score: float
    direction: int


@dataclasses.dataclass
class _OChain:
    edges: list
    last_node: int
    score: float
    used_edge_ids: set | None = None
    visited_nodes: set | None = None


def _oracle_adjacency(num_nodes, heads, tails, relations, scores,
                      allow_backward, max_branch_per_node):
    """``_build_oriented_adjacency`` (bfs_chain_builder.py:149-192)."""
    adj = [[] for _ in range(num_nodes)]
    for eid, (h, t, r, s) in enumerate(zip(heads, tails, relations, scores)):
        adj[int(h)].append(_OEdge(eid, int(h), int(t), int(h), int(t), int(r), float(s), 0))
        if allow_backward:
            adj[int(t)].append(_OEdge(eid, int(t), int(h), int(h), int(t), int(r), float(s), 1))
    for edges in adj:
        edges.sort(key=lambda e: (-e.score, e.edge_id, e.direction))
        if max_branch_per_node is not None:
            keep = int(max_branch_per_node)
            if keep >= 0:
                del edges[keep:]
    return adj


def _oracle_expand(adj, start_nodes, max_chain_length, min_chain_length,
                   max_total_chains, forbid_edge_revisit, forbid_node_revisit):
    """``_expand_chains`` (bfs_chain_builder.py:195-249)."""
    queue = deque()
    for s in start_nodes:
        if s < 0 or s >= len(adj):
            continue
        for e in adj[int(s)]:
            used = {e.edge_id} if forbid_edge_revisit else None
            visited = {int(s), e.dst_local} if forbid_node_revisit else None
            queue.append(_OChain([e], e.dst_local, e.score, used, visited))
    chains = []
    while queue:
        chain = queue.popleft()
        if len(chain.edges) >= min_chain_length:
            chains.append(chain)
            if max_total_chains > 0 and len(chains) >= max_total_chains:
                break
        if len(chain.edges) >= max_chain_length:
            continue
        for e in adj[int(chain.last_node)]:
            if forbid_edge_revisit and chain.used_edge_ids is not None and e.edge_id in chain.used_edge_ids:
                continue
            if forbid_node_revisit and chain.visited_nodes is not None and e.dst_local in chain.visited_nodes:
                continue
            used = None
            if forbid_edge_revisit and chain.used_edge_ids is not None:
                used = set(chain.used_edge_ids) | {e.edge_id}
            visited = None
            if forbid_node_revisit and chain.visited_nodes is not None:
                visited = set(chain.visited_nodes) | {e.dst_local}
            queue.append(_OChain([*chain.edges, e], e.dst_local, chain.score + e.score, used, visited))
    return chains


def _oracle_edge_dict(e: _OEdge, node_entity_ids):
    """``_edge_to_dict`` (bfs_chain_builder.py:294-310)."""
    return {
        "edge_id": int(e.edge_id),
        "head_entity_id": int(node_entity_ids[e.head_local]),
        "tail_entity_id": int(node_entity_ids[e.tail_local]),
        "relation_id": int(e.relation_id),
        "src_entity_id": int(node_entity_ids[e.src_local]),
        "dst_entity_id": int(node_entity_ids[e.dst_local]),
        "src_node_local": int(e.src_local),
        "dst_node_local": int(e.dst_local),
        "direction": int(e.direction),
    }


def _oracle_dedup(chains, node_entity_ids):
    """``_dedup_chains`` (bfs_chain_builder.py:252-293)."""
    stats = {}
    for chain in chains:
        sig = tuple(
            (int(node_entity_ids[e.src_local]), int(e.relation_id), int(node_entity_ids[e.dst_local]))
            for e in chain.edges
        )
        if not sig:
            continue
        st = stats.get(sig)
        if st is None:
            stats[sig] = {"frequency": 1, "score": float(chain.score), "edges": chain.edges}
        else:
            st["frequency"] += 1
            if float(chain.score) > float(st["score"]):
                st["score"] = float(chain.score)
                st["edges"] = chain.edges
    candidates = []
    for sig, st in stats.items():
        edges = st["edges"]
        candidates.append({
            "signature": sig,
            "length": len(edges),
            "frequency": int(st["frequency"]),
            "score": float(st["score"]),
            "edge_local_ids": [int(e.edge_id) for e in edges],
            "chain_edges": [_oracle_edge_dict(e, node_entity_ids) for e in edges],
        })
    candidates.sort(key=lambda c: (-int(c["frequency"]), -int(c["length"]), -float(c["score"])))
    return candidates


def _oracle_build(num_nodes, heads, tails, relations, scores, node_entity_ids,
                  start_nodes, st: ChainSettings):
    """``build_bfs_candidate_chains`` entry (bfs_chain_builder.py:49-91)."""
    adj = _oracle_adjacency(num_nodes, heads, tails, relations, scores,
                            st.allow_backward, st.max_branch_per_node)
    raw = _oracle_expand(adj, [int(s) for s in start_nodes], st.max_chain_length,
                         st.min_chain_length, st.max_total_chains,
                         st.forbid_edge_revisit, st.forbid_node_revisit)
    cands = _oracle_dedup(raw, node_entity_ids)
    cands = cands[: max(int(st.max_chains_per_sample), 0)]
    for rank, c in enumerate(cands, 1):
        c["rank"] = rank
    return cands


# --------------------------------------------------------------------- #
# Random-graph equivalence over the settings grid.
# --------------------------------------------------------------------- #


def _random_graph(seed):
    rng = np.random.default_rng(seed)
    n = int(rng.integers(4, 14))
    e = int(rng.integers(3, 30))
    heads = rng.integers(0, n, size=e)
    tails = rng.integers(0, n, size=e)
    relations = rng.integers(0, 6, size=e)
    # A few exact score ties to exercise the (score, edge_id, direction)
    # branch-order tiebreak and the dedup best-score retention.
    scores = np.round(rng.normal(size=e), 1)
    node_entity_ids = rng.permutation(1000 + np.arange(n))
    starts = rng.integers(-1, n + 1, size=int(rng.integers(1, 3)))  # incl. invalid
    return n, heads, tails, relations, scores, node_entity_ids, starts


SETTINGS_GRID = [
    ChainSettings(),
    ChainSettings(max_chain_length=2, min_chain_length=2),
    ChainSettings(allow_backward=False),
    ChainSettings(forbid_edge_revisit=False, max_chain_length=2),
    ChainSettings(forbid_node_revisit=True),
    ChainSettings(max_branch_per_node=2),
    ChainSettings(max_branch_per_node=0),
    # Negative branch cap = no cap in the reference (keep >= 0 guard).
    ChainSettings(max_branch_per_node=-3),
    ChainSettings(max_total_chains=7),       # early break mid-expansion
    ChainSettings(max_chains_per_sample=3),  # post-dedup truncation
]


@pytest.mark.parametrize("seed", [0, 1, 2, 3, 4])
def test_bfs_chains_match_reference_oracle(seed):
    n, heads, tails, relations, scores, ids, starts = _random_graph(seed)
    for st in SETTINGS_GRID:
        got = build_bfs_candidate_chains(
            num_nodes=n, heads=heads, tails=tails, relations=relations,
            scores=scores, node_entity_ids=ids, start_nodes=starts, settings=st,
        )
        want = _oracle_build(n, heads, tails, relations, scores, ids, starts, st)
        assert len(got) == len(want), st
        for g, w in zip(got, want):
            assert tuple(g["signature"]) == tuple(w["signature"]), st
            assert g["length"] == w["length"] and g["frequency"] == w["frequency"], st
            assert g["score"] == pytest.approx(w["score"]), st
            assert list(g["edge_local_ids"]) == w["edge_local_ids"], st
            assert g["rank"] == w["rank"], st
            assert g["chain_edges"] == w["chain_edges"], st


def test_no_start_nodes_yields_empty():
    n, heads, tails, relations, scores, ids, _ = _random_graph(9)
    got = build_bfs_candidate_chains(
        num_nodes=n, heads=heads, tails=tails, relations=relations,
        scores=scores, node_entity_ids=ids, start_nodes=[],
        settings=ChainSettings(),
    )
    assert got == []
