"""Multi-hop invariants of the scale-lane synthetic generator (VERDICT r4 #2).

The generator's contract is that the undirected-BFS supervision protocol
(reference ``scripts/build_retrieval_pipeline.py:691-815``) sees EXACTLY the
planted hop structure: >=2-hop answers are never adjacent to a seed, and
3-hop chains contribute a bridge positive (an edge touching neither a topic
nor an answer node, reference ``src/metrics/retriever_metrics.py:169-267``).
These are the structural preconditions for non-degenerate bridge metrics at
scale -- validated here directly on generated questions via host BFS.
"""

import collections
import sys
from pathlib import Path

import numpy as np
import pytest

sys.path.insert(0, str(Path(__file__).resolve().parents[1] / "scripts"))
from make_synthetic_webqsp import _PRESETS, _entity_pool, _relation_pool, make_question


def _bfs_dist(adj, src):
    dist = {src: 0}
    q = collections.deque([src])
    while q:
        u = q.popleft()
        for v in adj[u]:
            if v not in dist:
                dist[v] = dist[u] + 1
                q.append(v)
    return dist


def _gen(n, hop_mix, seed=3, lognorm_mean=5.0):
    rng = np.random.default_rng(seed)
    ents, _ = _entity_pool(4096, rng)
    rels = _relation_pool(64, rng)
    return [
        make_question(f"q{i}", rng, ents, rels, edge_cap=512,
                      hop_mix=hop_mix, lognorm_mean=lognorm_mean)
        for i in range(n)
    ]


def _analyze(q):
    """Per-question (min seed->answer undirected BFS distance, bridge count).

    Bridge count = planted-shortest-path edges touching neither a topic nor
    an answer node, over the union of per-(seed, answer) shortest paths --
    the same union the build-stage supervision materializes.
    """
    adj = collections.defaultdict(set)
    edges = []
    for h, _, t in q["graph"]:
        adj[h].add(t)
        adj[t].add(h)
        edges.append((h, t))
    qa = set(q["q_entity"]) | set(q["a_entity"])
    dmin, bridge = np.inf, 0
    for s in q["q_entity"]:
        dist_s = _bfs_dist(adj, s)
        for a in q["a_entity"]:
            if a not in dist_s:
                continue
            d = dist_s[a]
            dmin = min(dmin, d)
            dist_a = _bfs_dist(adj, a)
            for h, t in edges:
                if h in qa or t in qa:
                    continue
                on_path = (
                    dist_s.get(h, 1 << 30) + 1 + dist_a.get(t, 1 << 30) == d
                    or dist_s.get(t, 1 << 30) + 1 + dist_a.get(h, 1 << 30) == d
                )
                bridge += on_path
    return dmin, bridge


def test_multihop_answers_not_adjacent_to_seeds():
    qs = _gen(40, (0.0, 0.5, 0.5))
    dists = [_analyze(q)[0] for q in qs]
    assert all(d >= 2 for d in dists), dists
    assert any(d == 3 for d in dists)


def test_three_hop_chains_have_bridge_positives():
    qs = _gen(24, (0.0, 0.0, 1.0))
    for q in qs:
        d, bridge = _analyze(q)
        assert d == 3, (q["id"], d)
        assert bridge >= 1, q["id"]


def test_hop_mix_respected_and_one_hop_unchanged():
    qs = _gen(60, (1.0, 0.0, 0.0))
    assert all(_analyze(q)[0] == 1 for q in qs)
    qs = _gen(120, (0.35, 0.35, 0.30), seed=11)
    dists = [_analyze(q)[0] for q in qs]
    frac_nonadj = sum(d >= 2 for d in dists) / len(dists)
    assert 0.5 <= frac_nonadj <= 0.8, frac_nonadj  # VERDICT: >=50% non-adjacent


@pytest.mark.parametrize("preset", sorted(_PRESETS))
def test_presets_are_reference_split_sizes(preset):
    p = _PRESETS[preset]
    ref = {"webqsp": (2826, 246, 1628), "cwq": (27639, 3519, 3531)}[preset]
    assert (p["train"], p["validation"], p["test"]) == ref
