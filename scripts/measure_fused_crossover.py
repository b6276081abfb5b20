"""Measure the serve_window XLA-scorer vs fused-Pallas-kernel crossover.

VERDICT r3 weak #5: ``serve_split``'s ``fused_threshold`` (the per-question
padded edge width ``m_pad`` above which ``serve_window`` routes a bucket
through ``pallas_per_question_topk`` instead of the XLA scorer) was asserted,
never measured.  This sweep times both paths on identical device-resident
bucket feeds across pow-2 widths at the production embedding width and
prints one JSON line per width, plus the measured crossover.

Run on the real chip:  python scripts/measure_fused_crossover.py
(CPU runs use interpret mode and are NOT meaningful for the threshold.)
"""

import argparse
import json
import sys
import time

import numpy as np


def main(group_size=16, n_buckets=2, k=100, dim=1024, struct=20, iters=8,
         widths=(256, 512, 1024, 2048, 4096, 8192, 16384, 32768)):
    import jax
    import jax.numpy as jnp

    sys.path.insert(0, ".")
    from bench import make_bundle
    from evi_rag_tpu.serving import serve_window

    backend = jax.default_backend()
    interp = backend == "cpu"
    bundle = jax.tree.map(jnp.asarray, make_bundle(dim, dim, struct))
    rng = np.random.default_rng(0)

    vocab, rels, n_questions = 4096, 512, 64
    ent_table = jnp.asarray(rng.normal(size=(vocab, dim)).astype(np.float32))
    rel_table = jnp.asarray(rng.normal(size=(rels, dim)).astype(np.float32))
    q_table = jnp.asarray(rng.normal(size=(n_questions, dim)).astype(np.float32))

    rows = []
    for m_pad in widths:
        n_pad = min(max(64, m_pad // 2), 4096)
        B, G = n_buckets, group_size
        eidx = rng.integers(0, n_pad - 1, size=(B, G, 2, m_pad)).astype(np.int16)
        node_rows = rng.integers(0, vocab, size=(B, G, n_pad)).astype(np.int32)
        rel_ids = rng.integers(0, rels, size=(B, G, m_pad)).astype(np.int16)
        # Realistic fill: buckets hold questions whose true edge count landed
        # in (m_pad/2, m_pad]; model ~75% average fill.
        lengths = rng.integers(m_pad // 2 + 1, m_pad + 1, size=(B, G)).astype(np.int32)
        topic = (rng.random(size=(B, G, n_pad)) < 0.05).astype(np.uint8)
        ncnt = np.full((B, G), n_pad, np.int32)
        qids = rng.integers(0, n_questions, size=(B, G)).astype(np.int32)
        feed = [jnp.asarray(x) for x in (eidx, node_rows, rel_ids, lengths, topic, ncnt, qids)]

        def run(use_fused):
            kw = dict(k=k, num_rounds=2, num_reverse_rounds=2,
                      dtype=jnp.bfloat16, use_fused=use_fused, interpret=interp)
            # Sync by FETCHING a small result: block_until_ready does not
            # block on the axon backend (memory: tpu-tunnel-bench-pitfalls).
            v, i = serve_window(bundle, q_table, ent_table, rel_table, *feed, **kw)
            np.asarray(v)
            best = float("inf")
            for _ in range(3):
                t0 = time.perf_counter()
                for _ in range(iters):
                    v, i = serve_window(bundle, q_table, ent_table, rel_table, *feed, **kw)
                np.asarray(v), np.asarray(i)
                best = min(best, (time.perf_counter() - t0) / iters)
            return best

        t_xla = run(False)
        t_fused = run(True)
        q = B * G
        row = {
            "m_pad": m_pad, "xla_ms": round(t_xla * 1e3, 2),
            "fused_ms": round(t_fused * 1e3, 2),
            "xla_qps": round(q / t_xla, 1), "fused_qps": round(q / t_fused, 1),
            "fused_speedup": round(t_xla / t_fused, 3),
        }
        rows.append(row)
        print(json.dumps(row), flush=True)

    crossover = next((r["m_pad"] for r in rows if r["fused_speedup"] > 1.0), None)
    print(json.dumps({"backend": backend, "crossover_m_pad": crossover}))


if __name__ == "__main__":
    ap = argparse.ArgumentParser()
    ap.add_argument("--widths", type=int, nargs="+",
                    default=[256, 512, 1024, 2048, 4096, 8192, 16384, 32768])
    ap.add_argument("--iters", type=int, default=8)
    ap.add_argument("--dim", type=int, default=1024)
    ap.add_argument("--k", type=int, default=100)
    a = ap.parse_args()
    main(iters=a.iters, dim=a.dim, k=a.k, widths=tuple(a.widths))
