"""Headline benchmark: retriever query throughput per chip.

Measures the north-star metric from BASELINE.json -- queries/sec/chip of the
fused triple-scoring + streaming-top-k engine (``evi_rag_tpu/ops/query.py``)
at production scale (D=1024 embeddings, bidirectional scoring, top-100 of
131k candidate triples per query -- the reference's recall@100 operating
point over a large candidate fan-out).

``vs_baseline`` is measured against the same scorer executed by torch on the
host CPU (the reference implementation's stack, which published no numbers
of its own -- see BASELINE.md); the CPU reference is timed on a reduced
candidate set and scaled linearly.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.
"""

import json
import os
import sys
import time

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/.cache/jax_comp_cache")

import numpy as np

METRIC_NAME = "query_throughput_131k_candidates_top100_d1024"
METRIC_UNIT = "queries/sec/chip"
# Shared across main() and the top-level error handler so a mid-run failure
# still commits whatever sections completed to bench_details.json.
DETAILS: dict = {}


def _progress(msg: str) -> None:
    print(f"[bench] {time.strftime('%H:%M:%S')} {msg}", file=sys.stderr, flush=True)


_PROBE_CODE = (
    "import jax, json; d = jax.devices(); "
    "print(json.dumps({'n': len(d), 'platform': d[0].platform}))"
)


def probe_backend(timeout_s: float) -> tuple[bool, str]:
    """Try backend init in a killable subprocess.

    The remote-TPU tunnel has two distinct failure modes and this catches
    both: a dead relay makes ``jax.devices()`` HANG (the r3 MULTICHIP rc=124
    mode -- only a subprocess timeout can recover), and a half-up relay makes
    it RAISE ``Unable to initialize backend 'axon'`` (the r3 BENCH rc=1 mode).
    """
    import subprocess

    try:
        p = subprocess.run(
            [sys.executable, "-c", _PROBE_CODE],
            capture_output=True, text=True, timeout=timeout_s,
        )
    except subprocess.TimeoutExpired:
        return False, f"backend init hung >{timeout_s:.0f}s (tunnel relay down?)"
    if p.returncode != 0:
        return False, (p.stderr or p.stdout).strip()[-400:]
    return True, p.stdout.strip().splitlines()[-1]


def wait_for_backend() -> tuple[bool, str]:
    """Bounded retry-with-backoff for backend availability (VERDICT r3 #1b)."""
    attempts = int(os.environ.get("EVI_BENCH_PROBE_ATTEMPTS", "4"))
    timeout_s = float(os.environ.get("EVI_BENCH_PROBE_TIMEOUT_S", "75"))
    backoff_s = float(os.environ.get("EVI_BENCH_PROBE_BACKOFF_S", "45"))
    info = ""
    for i in range(attempts):
        _progress(f"backend probe {i + 1}/{attempts}")
        ok, info = probe_backend(timeout_s)
        if ok:
            _progress(f"backend up: {info}")
            return True, info
        _progress(f"backend unavailable: {info}")
        if i + 1 < attempts:
            time.sleep(backoff_s * (i + 1))
    return False, info


def _write_details() -> None:
    try:
        import pathlib

        pathlib.Path("bench_details.json").write_text(json.dumps(DETAILS, indent=2) + "\n")
    except OSError:
        pass


def emit_structured_error(kind: str, detail: str) -> None:
    """Parseable one-line result on failure; the driver must never see rc!=0
    with a bare traceback again (VERDICT r3 weak #1)."""
    DETAILS.setdefault("error", kind)
    DETAILS.setdefault("error_detail", detail[:400])
    _write_details()
    print(
        json.dumps(
            {
                "metric": METRIC_NAME,
                "value": None,
                "unit": METRIC_UNIT,
                "vs_baseline": None,
                "error": kind,
                "detail": detail[:400],
            }
        )
    )


def build_inputs(num_candidates: int, dim: int, struct_dim: int, batch: int, seed: int = 0):
    rng = np.random.default_rng(seed)
    return {
        "head": rng.normal(size=(num_candidates, dim)).astype(np.float32) * 0.1,
        "rel": rng.normal(size=(num_candidates, dim)).astype(np.float32) * 0.1,
        "tail": rng.normal(size=(num_candidates, dim)).astype(np.float32) * 0.1,
        "struct": rng.normal(size=(num_candidates, struct_dim)).astype(np.float32),
        "q": rng.normal(size=(batch, dim)).astype(np.float32),
    }


def build_inputs_device(
    num_candidates: int, dim: int, struct_dim: int, batch: int,
    seed: int = 0, dtype=None,
):
    """Device-side candidate generation (jax.random): million-row indexes
    never cross the host->device link, which is minutes-slow over the
    remote-TPU tunnel for multi-GB arrays."""
    import jax
    import jax.numpy as jnp

    dtype = dtype or jnp.float32
    ks = jax.random.split(jax.random.key(seed), 5)

    @jax.jit
    def gen():
        mk = lambda k, shape: (jax.random.normal(k, shape) * 0.1).astype(dtype)
        return {
            "head": mk(ks[0], (num_candidates, dim)),
            "rel": mk(ks[1], (num_candidates, dim)),
            "tail": mk(ks[2], (num_candidates, dim)),
            "struct": jax.random.normal(ks[3], (num_candidates, struct_dim)).astype(dtype),
        }

    out = gen()
    out["q"] = np.asarray(jax.random.normal(ks[4], (batch, dim), jnp.float32))
    return out


def make_bundle(dim: int, hidden: int, struct_dim: int, seed: int = 0):
    """Random retriever feature bundle with the production geometry."""
    rng = np.random.default_rng(seed)

    def dense(i, o):
        return {
            "kernel": (rng.normal(size=(i, o)) / np.sqrt(i)).astype(np.float32),
            "bias": np.zeros(o, np.float32),
        }

    def ln(d):
        return {"scale": np.ones(d, np.float32), "bias": np.zeros(d, np.float32)}

    feats = {
        "entity_proj": {"proj": dense(dim, dim)},
        "relation_proj": {"proj": dense(dim, dim)},
        "query_proj": {"proj": dense(dim, dim)},
        "non_text_entity_emb": np.zeros(dim, np.float32),
        "q_gate": dense(dim, dim),
        "q_bias": dense(dim, dim),
        "struct_proj": dense(struct_dim, dim),
        "struct_norm": ln(dim),
        "struct_gate": dense(dim, 1),
        "state_net_0": dense(3 * dim + 1, hidden),
        "state_norm": ln(hidden),
        "state_net_1": dense(hidden, hidden),
        "score_head": dense(hidden, 1),
    }
    parity = {"use_topic_pe": 1, "num_topics": 2, "dde_rounds": 2, "dde_reverse_rounds": 2}
    return {"features": feats, "parity_meta": parity}


def bench_tpu(bundle, inputs, *, k: int, chunk: int, iters: int = 5, engine: str = "pallas_fused", index_dtype=None):
    """Time the query path.

    engine: "pallas_fused" (batched in-kernel top-k; candidates stream once
    per auto-bq queries) | "pallas" (one launch per query) | "xla".
    """
    import jax
    import jax.numpy as jnp

    from evi_rag_tpu.ops.pallas_score import pallas_query_topk, pallas_query_topk_fused
    from evi_rag_tpu.ops.query import TripleIndex, query_topk

    # index_dtype=bf16 keeps million-candidate indexes within HBM (the
    # kernels cast to bf16 on entry anyway).
    cast = lambda x: jnp.asarray(x, index_dtype) if index_dtype else jnp.asarray(x)
    index = TripleIndex(
        head_repr=cast(inputs["head"]),
        rel_repr=cast(inputs["rel"]),
        tail_repr=cast(inputs["tail"]),
        struct_raw=cast(inputs["struct"]),
    )
    bundle_j = jax.tree.map(jnp.asarray, bundle)
    q = jnp.asarray(inputs["q"])

    if engine == "pallas_fused":
        def run():
            return pallas_query_topk_fused(bundle_j, q, index, k=k)
    elif engine == "pallas":
        def run():
            return pallas_query_topk(bundle_j, q, index, k=k, tile=256)
    else:
        def run():
            return query_topk(bundle_j, q, index, k=k, chunk=chunk)

    def sync(x):
        # NOTE: under the remote-TPU tunnel block_until_ready does not imply
        # execution completion; a device->host fetch does.
        return np.asarray(x[0])

    sync(run())  # compile + warm
    sync(run())
    t0 = time.perf_counter()
    for _ in range(iters - 1):
        run()
    sync(run())
    dt = (time.perf_counter() - t0) / iters
    nq = q.shape[0]
    return nq / dt, dt


V5E_BF16_PEAK_TFLOPS = 197.0  # TPU v5e peak dense bf16 (public spec)


def fused_kernel_mfu(qps: float, num_candidates: int, d: int, h: int, bq: int) -> float:
    """Analytic MFU of the fused batched top-k kernel (VERDICT r2 weak #2).

    Per (candidate, query) the factorized kernel does 2 per-query
    [T,D]x[D,H] matmul rows (zi, zr) plus 3 query-independent rows (zh,
    zs_fwd, zs_bwd) amortized over bq queries; matvecs/struct-proj/epilogues
    are O(D) or O(hh*D) and excluded (<2%).  useful FLOP/s = qps * M *
    2*D*H*(2 + 3/bq); MFU = useful / bf16 peak.
    """
    flops_per_cand_query = 2.0 * d * h * (2.0 + 3.0 / bq)
    return qps * num_candidates * flops_per_cand_query / (V5E_BF16_PEAK_TFLOPS * 1e12)


def auto_bq(batch: int) -> int:
    """Mirror of ``pallas_query_topk_fused``'s bq auto-select (for MFU math)."""
    bq = 8
    while bq < min(batch, 128):
        bq *= 2
    return bq


def bench_cpu_reference(bundle, inputs, *, reduced: int = 2048, scale_to: int | None = None):
    """Torch-CPU run of the same scorer on a reduced set, scaled linearly
    (to ``scale_to`` candidates, default the input candidate count)."""
    try:
        import torch
    except Exception:
        return None
    def to_torch(x):
        if isinstance(x, dict):
            return {k: to_torch(v) for k, v in x.items()}
        return torch.from_numpy(np.asarray(x))

    f = to_torch(bundle["features"])

    def dense(p, x):
        return x @ p["kernel"] + p["bias"]

    def lnorm(p, x):
        m = x.mean(-1, keepdim=True)
        v = x.var(-1, unbiased=False, keepdim=True)
        return (x - m) / torch.sqrt(v + 1e-6) * p["scale"] + p["bias"]

    h = torch.from_numpy(inputs["head"][:reduced])
    r = torch.from_numpy(inputs["rel"][:reduced])
    t = torch.from_numpy(inputs["tail"][:reduced])
    s = torch.from_numpy(inputs["struct"][:reduced])
    q = torch.from_numpy(inputs["q"][:1])
    s_dim = s.shape[-1] // 2

    def score(qrow, h, r, t, s):
        qp = torch.tanh(dense(f["query_proj"]["proj"], qrow))
        gate = torch.sigmoid(dense(f["q_gate"], qp))
        bias = torch.tanh(dense(f["q_bias"], qp))
        r_ctx = r * gate + bias
        sc = torch.nn.functional.gelu(lnorm(f["struct_norm"], dense(f["struct_proj"], s)))
        nav = torch.sigmoid(dense(f["struct_gate"], sc))
        inter = h * r_ctx * t * nav
        err = h + r_ctx - t
        dist = -torch.sqrt((err * err).sum(-1, keepdim=True) + 1e-12)
        comb = torch.cat([inter, sc, err, dist], dim=-1)
        z = torch.nn.functional.gelu(lnorm(f["state_norm"], dense(f["state_net_0"], comb)))
        z = dense(f["state_net_1"], z)
        return dense(f["score_head"], z)[..., 0]

    with torch.no_grad():
        score(q[0], h, r, t, s)  # warm
        dt_reduced = float("inf")
        for _rep in range(3):  # best-of-3: host CPU timing is noisy under load
            t0 = time.perf_counter()
            fwd = score(q[0], h, r, t, s)
            s_swap = torch.cat([s[:, s_dim:], s[:, :s_dim]], dim=-1)
            bwd = score(q[0], t, r, h, s_swap)
            st = torch.stack([fwd, bwd])
            w = torch.softmax(st, dim=0)
            _ = torch.topk((w * st).sum(0), k=min(100, reduced))
            dt_reduced = min(dt_reduced, time.perf_counter() - t0)
    full_m = scale_to or inputs["head"].shape[0]
    dt_full = dt_reduced * (full_m / reduced)
    return 1.0 / dt_full  # queries/sec (single CPU)


def bench_index_build(dim: int = 1024, vocab: int = 262144, rels: int = 1024, m: int = 1_048_576):
    """Index build time: project the entity/relation tables through the
    trained projectors and gather 1M candidate rows (``build_triple_index``)."""
    import jax
    import jax.numpy as jnp

    from evi_rag_tpu.ops.query import build_triple_index

    bundle = jax.tree.map(jnp.asarray, make_bundle(dim, dim, 20, seed=3))
    # Device-side generation: the ~1 GB table never crosses the tunnel.
    ks = jax.random.split(jax.random.key(2), 7)
    ent = jax.random.normal(ks[0], (vocab, dim), jnp.float32) * 0.1
    rel = jax.random.normal(ks[1], (rels, dim), jnp.float32) * 0.1
    nontext = jax.random.uniform(ks[2], (vocab,)) < 0.05
    heads = jax.random.randint(ks[3], (m,), 0, vocab, jnp.int32)
    rs = jax.random.randint(ks[4], (m,), 0, rels, jnp.int32)
    tails = jax.random.randint(ks[5], (m,), 0, vocab, jnp.int32)
    struct = jax.random.normal(ks[6], (m, 20), jnp.float32)

    # Arrays go in as ARGUMENTS: a jitted closure over device arrays treats
    # them as constants, and constant canonicalization fetches them to host
    # (hours over the remote-TPU tunnel for a 13 GB working set).
    build = jax.jit(
        lambda e, r, n, h, rr, t, s: build_triple_index(
            bundle, entity_emb=e, relation_emb=r, nontext_mask=n,
            heads=h, rels=rr, tails=t, struct_raw=s,
        )
    )
    args = (ent, rel, nontext, heads, rs, tails, struct)
    np.asarray(build(*args).head_repr[0])  # compile + warm
    t0 = time.perf_counter()
    np.asarray(build(*args).head_repr[0])
    return (time.perf_counter() - t0) * 1e3  # ms


def bench_knn(dim: int = 1024, table_rows: int = 262144, batch: int = 64, k: int = 100):
    """Secondary: exact kNN over an embedding table (entity linking path)."""
    import jax
    import jax.numpy as jnp

    from evi_rag_tpu.ops.knn import knn_topk

    k1, k2 = jax.random.split(jax.random.key(1))
    table = jax.random.normal(k1, (table_rows, dim), jnp.float32)  # device-side gen
    q = jax.random.normal(k2, (batch, dim), jnp.float32)

    out = {}
    for method in ("exact", "approx"):
        def run():
            return knn_topk(q, table, k=k, metric="cosine", method=method)

        np.asarray(run()[0])
        np.asarray(run()[0])
        best = float("inf")
        for _ in range(3):
            t0 = time.perf_counter()
            for _ in range(4):
                run()
            np.asarray(run()[0])
            best = min(best, (time.perf_counter() - t0) / 5)
        out[method] = batch / best
    return out["exact"], out["approx"]


def bench_train_step():
    """Secondary: retriever train-step throughput (graphs/sec) at production width."""
    import jax

    from evi_rag_tpu.data.feeder import Bucket, collate_stacked
    from evi_rag_tpu.data.synthetic import make_synthetic_dataset
    from evi_rag_tpu.models.retriever import Retriever
    from evi_rag_tpu.train.retriever_trainer import (
        RetrieverTrainConfig,
        create_train_state,
        make_train_step,
    )

    ds = make_synthetic_dataset(num_samples=32, emb_dim=1024, max_nodes=64, seed=0)
    bucket = Bucket(graphs=33, nodes=4096, edges=16384)
    batch = collate_stacked(
        ds.samples, num_shards=1, entity_emb=ds.entity_emb,
        relation_emb=ds.relation_emb, question_emb=ds.question_emb, bucket=bucket,
    )
    model = Retriever(emb_dim=1024, hidden_dim=1024, dropout_p=0.1, compute_dtype="bfloat16")
    cfg = RetrieverTrainConfig(k_values=(100,))
    state, tx = create_train_state(model, batch, cfg, seed=0)
    step = make_train_step(model, tx, cfg)
    state, m = step(state, batch)
    float(m["loss"])  # sync
    # Best-of-3 passes: per-step dispatch rides the remote-TPU tunnel, so a
    # congested RPC window can halve a single short measurement (observed
    # 519 vs 1234 graphs/s across driver runs at identical code).
    dt = float("inf")
    for _ in range(3):
        t0 = time.perf_counter()
        iters = 5
        for _ in range(iters):
            state, m = step(state, batch)
        float(m["loss"])
        dt = min(dt, (time.perf_counter() - t0) / iters)
    return 32 / dt  # graphs/sec


def bench_gflownet_step():
    """Secondary: GFlowNet train-step throughput at production width
    (4 sampled rollouts + SubTB + BC per step)."""
    import jax
    import jax.numpy as jnp

    from evi_rag_tpu.data.feeder import collate_agent, fixed_agent_bucket
    from evi_rag_tpu.data.g_agent import AgentSettings, build_agent_sample
    from evi_rag_tpu.data.synthetic import make_synthetic_dataset
    from evi_rag_tpu.models.batches import RetrieverBatch
    from evi_rag_tpu.models.retriever import Retriever
    from evi_rag_tpu.train.checkpoint import export_retriever_features
    from evi_rag_tpu.train.gflownet_trainer import (
        GFlowNetConfig,
        build_modules,
        init_gflownet_params,
        make_gfn_train_step,
    )
    from evi_rag_tpu.train.optim import OptimizerConfig
    from evi_rag_tpu.train.retriever_trainer import TrainState
    from evi_rag_tpu.train.optim import setup_optimizer

    emb = 1024
    ds = make_synthetic_dataset(num_samples=16, emb_dim=emb, max_nodes=48, seed=5)
    rng = np.random.default_rng(0)
    agents = []
    for s in ds.samples:
        a = build_agent_sample(
            sample_id=s.sample_id, question_id=s.question_id,
            heads=s.edge_index[0], tails=s.edge_index[1], relations=s.edge_relations,
            labels=s.edge_labels.astype(np.float32),
            scores=rng.normal(size=s.edge_index.shape[1]).astype(np.float32) + 2 * s.edge_labels,
            node_entity_ids=np.arange(1000, 1000 + s.num_nodes),
            node_embedding_ids=s.node_embedding_ids,
            start_entity_ids=1000 + s.topic_locals, answer_entity_ids=1000 + s.answer_locals,
            settings=AgentSettings(edge_top_k=200, score_mode="logits"),
        )
        if a is not None:
            agents.append(a)
    agents = agents[:16]
    bucket = fixed_agent_bucket(agents, 16)
    batch = collate_agent(
        agents, entity_emb=ds.entity_emb, relation_emb=ds.relation_emb,
        question_emb=ds.question_emb, bucket=bucket,
    )
    retr = Retriever(emb_dim=emb, hidden_dim=emb, dropout_p=0.0)
    rb = RetrieverBatch(
        graph=batch.graph, node_emb=batch.node_emb, node_is_nontext=batch.node_is_nontext,
        edge_emb=batch.edge_emb, question_emb=batch.question_emb,
        topic_one_hot=jnp.stack(
            [batch.node_is_start.astype(jnp.float32), 1 - batch.node_is_start.astype(jnp.float32)], -1
        ),
        edge_labels=batch.edge_labels, node_is_q=batch.node_is_start, node_is_a=batch.node_is_answer,
    )
    rp = jax.jit(retr.init)(jax.random.key(0), rb)
    bundle = export_retriever_features(rp["params"], retr.parity_meta())
    cfg = GFlowNetConfig(
        hidden_dim=emb, max_steps=3, num_train_rollouts=4, bc_weight=0.5,
        total_steps=100, dropout=0.1, optimizer=OptimizerConfig(name="adamw", learning_rate=1e-4),
    )
    mods = build_modules(cfg)
    params = init_gflownet_params(cfg, mods, bundle, batch, seed=0)
    tx = setup_optimizer(cfg.optimizer, params)
    state = TrainState(
        params=params, opt_state=jax.jit(tx.init)(params),
        step=jnp.zeros((), jnp.int32), rng=jax.random.key(1),
    )
    step = make_gfn_train_step(mods, tx, cfg, bundle)
    state, m = step(state, batch)
    float(m["loss"])
    # Best-of-3 (tunnel-congestion robustness; see bench_train_step).
    iters = 5
    dt = float("inf")
    for _ in range(3):
        t0 = time.perf_counter()
        for _ in range(iters):
            state, m = step(state, batch)
        float(m["loss"])
        dt = min(dt, (time.perf_counter() - t0) / iters)

    # Frozen-embed cache variant (VERDICT r2 next-step #5): the parameter-
    # free retriever embedding of a fixed batch is computed once and passed
    # into every step (epoch-style training reuses it across epochs;
    # ``gflownet_trainer.py`` cache_frozen_embed path).
    import functools

    from evi_rag_tpu.models.gflownet.embedder import embed_agent_batch_frozen

    fe = jax.jit(functools.partial(embed_agent_batch_frozen, bundle))(batch)
    state, m = step(state, batch, fe)
    float(m["loss"])
    dt_cached = float("inf")
    for _ in range(3):
        t1 = time.perf_counter()
        for _ in range(iters):
            state, m = step(state, batch, fe)
        float(m["loss"])
        dt_cached = min(dt_cached, (time.perf_counter() - t1) / iters)

    # bf16 policy variant (gflownet.compute_dtype=bfloat16; reference trains
    # 16-mixed) on the cached-embed path.
    import dataclasses as _dc

    cfg16 = _dc.replace(cfg, compute_dtype="bfloat16")
    mods16 = build_modules(cfg16)
    params16 = init_gflownet_params(cfg16, mods16, bundle, batch, seed=0)
    tx16 = setup_optimizer(cfg16.optimizer, params16)
    state16 = TrainState(
        params=params16, opt_state=jax.jit(tx16.init)(params16),
        step=jnp.zeros((), jnp.int32), rng=jax.random.key(1),
    )
    step16 = make_gfn_train_step(mods16, tx16, cfg16, bundle)
    state16, m = step16(state16, batch, fe)
    float(m["loss"])
    dt16 = float("inf")
    for _ in range(3):
        t1 = time.perf_counter()
        for _ in range(iters):
            state16, m = step16(state16, batch, fe)
        float(m["loss"])
        dt16 = min(dt16, (time.perf_counter() - t1) / iters)

    # A/B delta for the rollout restructure (VERDICT r3 #5): same cached-embed
    # step with the per-step canonical policy (precompute_policy=False).
    # EVI_BENCH_GFN_AB=0 skips the extra compile.
    dt_off = None
    if os.environ.get("EVI_BENCH_GFN_AB", "1") == "1":
        cfg_off = _dc.replace(cfg, precompute_policy=False)
        state_off = TrainState(
            params=params, opt_state=jax.jit(tx.init)(params),
            step=jnp.zeros((), jnp.int32), rng=jax.random.key(1),
        )
        step_off = make_gfn_train_step(mods, tx, cfg_off, bundle)
        state_off, m = step_off(state_off, batch, fe)
        float(m["loss"])
        dt_off = float("inf")
        for _ in range(3):
            t1 = time.perf_counter()
            for _ in range(iters):
                state_off, m = step_off(state_off, batch, fe)
            float(m["loss"])
            dt_off = min(dt_off, (time.perf_counter() - t1) / iters)

    # Sample-then-score rollout (VERDICT r3 #5 restructure): forward-only
    # sampling scan + one batched differentiable score pass; measured on the
    # cached-embed path in both f32 and bf16-policy forms.
    def _timed_step(cfg_v):
        mods_v = build_modules(cfg_v)
        params_v = init_gflownet_params(cfg_v, mods_v, bundle, batch, seed=0)
        tx_v = setup_optimizer(cfg_v.optimizer, params_v)
        st_v = TrainState(
            params=params_v, opt_state=jax.jit(tx_v.init)(params_v),
            step=jnp.zeros((), jnp.int32), rng=jax.random.key(1),
        )
        step_v = make_gfn_train_step(mods_v, tx_v, cfg_v, bundle)
        st_v, mv = step_v(st_v, batch, fe)
        float(mv["loss"])
        best = float("inf")
        for _ in range(3):
            t1 = time.perf_counter()
            for _ in range(iters):
                st_v, mv = step_v(st_v, batch, fe)
            float(mv["loss"])
            best = min(best, (time.perf_counter() - t1) / iters)
        return best

    dt_sts = _timed_step(_dc.replace(cfg, sample_then_score=True))
    dt_sts16 = _timed_step(
        _dc.replace(cfg, sample_then_score=True, compute_dtype="bfloat16")
    )
    return (
        16 / dt, 16 / dt_cached, 16 / dt16,
        (16 / dt_off if dt_off else None), 16 / dt_sts, 16 / dt_sts16,
    )


def bench_gflownet_step_wide(graphs: int = 64):
    """GFN train step at the production batch width: per-graph throughput
    peaks near G=64 (width sweep on v5e: 1261 g/s @16, ~1650-1720 @64,
    1472 @128 — launch latency amortizes, then backward residual traffic
    takes over; docs/tpu_design.md).  bf16 policy + cached frozen embed —
    the fastest faithful training configuration."""
    import dataclasses as _dc
    import functools
    import importlib
    import sys as _s

    import jax
    import jax.numpy as jnp

    _s.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), "scripts"))
    pg = importlib.import_module("profile_gfn_step")
    cfg, _, bundle, batch, _, _, _, _ = pg._build(graphs)

    from evi_rag_tpu.models.gflownet.embedder import embed_agent_batch_frozen
    from evi_rag_tpu.train.gflownet_trainer import (
        build_modules,
        init_gflownet_params,
        make_gfn_train_step,
    )
    from evi_rag_tpu.train.optim import setup_optimizer
    from evi_rag_tpu.train.retriever_trainer import TrainState

    fe = jax.jit(functools.partial(embed_agent_batch_frozen, bundle))(batch)

    def _timed(cfg_v, iters=5):
        mods_v = build_modules(cfg_v)
        params_v = init_gflownet_params(cfg_v, mods_v, bundle, batch, seed=0)
        tx_v = setup_optimizer(cfg_v.optimizer, params_v)
        st = TrainState(
            params=params_v, opt_state=jax.jit(tx_v.init)(params_v),
            step=jnp.zeros((), jnp.int32), rng=jax.random.key(1),
        )
        step_v = make_gfn_train_step(mods_v, tx_v, cfg_v, bundle)
        st, m = step_v(st, batch, fe)
        float(m["loss"])
        best = float("inf")
        for _ in range(3):
            t0 = time.perf_counter()
            for _ in range(iters):
                st, m = step_v(st, batch, fe)
            float(m["loss"])
            best = min(best, (time.perf_counter() - t0) / iters)
        return graphs / best

    cfg16 = _dc.replace(cfg, compute_dtype="bfloat16")
    out = {"b64_bf16": _timed(cfg16)}
    # Residual-traffic knob A/B at the production point (VERDICT r4 #5):
    # "dots" remat (dots_saveable: matmul results saved, elementwise chains
    # — the dropout-masked edge_repr expansion, edge-head activations —
    # recomputed in the backward) on both the canonical and the
    # sample-then-score rollout.
    if os.environ.get("EVI_BENCH_GFN_KNOBS", "1") == "1":
        out["b64_bf16_dots"] = _timed(_dc.replace(cfg16, remat_policy="dots"))
        out["b64_bf16_sts"] = _timed(_dc.replace(cfg16, sample_then_score=True))
        out["b64_bf16_sts_dots"] = _timed(
            _dc.replace(cfg16, sample_then_score=True, remat_policy="dots")
        )
    return out


def bench_serve_surface(
    num_questions: int = 256, dim: int = 1024, k: int = 100,
    *, realistic: bool = False, passes: int = 5,
):
    """Secondary: the product serving surface (``serve_split``, the engine
    behind ``cli serve``) at production width -- per-question subgraphs,
    D=1024, top-100.  Reported warm (tables projected, kernels compiled);
    the phase breakdown shows where the next bottleneck is.

    ``realistic=True`` sizes per-question subgraphs like the WebQSP-scale
    build (median ~1.2k edges, wide spread across the pow-2 bucket ladder)
    instead of the toy 64-node graphs -- the operating point that exposed the
    round-4 serve redesign (19 -> 193 q/s; docs/serving.md).

    Jitter-robust protocol (VERDICT r4 #1): the remote-TPU tunnel adds
    seconds of per-run RPC variance (round-4 captures of the SAME code
    ranged 68-194 q/s), so the headline is the MEDIAN of ``passes`` warm
    split passes, with every pass's q/s returned for dispersion reporting.
    Returns ``(median_stats, all_qps, best_qps)``."""
    import statistics

    from evi_rag_tpu.data.synthetic import make_synthetic_dataset
    from evi_rag_tpu.serving import project_tables, serve_split

    size_kw = (
        dict(min_nodes=128, max_nodes=1024, avg_extra_edges=3.0, num_entities=16384)
        if realistic
        else dict(max_nodes=64, num_entities=4096)
    )
    ds = make_synthetic_dataset(
        num_samples=num_questions, emb_dim=dim,
        num_relations=64, seed=7, **size_kw,
    )
    struct_dim = 2 * 2 * (1 + 2 + 2)
    bundle = make_bundle(dim, dim, struct_dim, seed=11)
    projected = project_tables(bundle, ds.entity_emb, ds.relation_emb)
    kw = dict(
        entity_emb=ds.entity_emb, relation_emb=ds.relation_emb,
        question_emb=ds.question_emb, k=k, num_rounds=2, num_reverse_rounds=2,
        projected=projected,
    )
    serve_split(bundle, ds.samples, **kw)  # cold: per-bucket compiles
    runs = []
    for _ in range(passes):
        _, stats = serve_split(bundle, ds.samples, **kw)
        runs.append(stats)
    runs.sort(key=lambda s: s.queries_per_s)
    all_qps = [s.queries_per_s for s in runs]
    return runs[len(runs) // 2], all_qps, max(all_qps)


def main():
    # Persistent compilation cache (same default as the CLI): round-over-round
    # driver runs recompile nothing, which both shortens the run and removes
    # compile jitter from the steady-state serve/step numbers.
    import jax as _jax

    cache_dir = os.environ.get(
        "JAX_COMPILATION_CACHE_DIR", os.path.expanduser("~/.cache/jax_comp_cache")
    )
    if cache_dir and cache_dir != "0":
        _jax.config.update("jax_compilation_cache_dir", cache_dir)
        _jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.1)

    dim, hidden = 1024, 1024
    struct_dim = 2 * 2 * (1 + 2 + 2)  # edge struct = concat(head, tail) topic features
    num_candidates = 131072
    # Headline serving batch. NOTE (cross-round comparability): r1 measured
    # batch=8, r2 batch=64, r3+ batch=128 -- auto-bq then reaches its
    # measured-best candidate-tile reuse (bq sweep on v5e @131k: 8 -> 81.6,
    # 16 -> 169, 32 -> 186, 64 -> 194, 128 -> 199 q/s).  A batch=8 point is
    # emitted alongside so trends across rounds stay interpretable.
    batch = 128
    k = 100

    bundle = make_bundle(dim, hidden, struct_dim)
    # Candidates are generated on device (the multi-GB host->device copy is
    # minutes-to-hours slow over the remote-TPU tunnel); the torch-CPU
    # reference times its own small host-side arrays -- identical scorer and
    # distribution, content irrelevant to timing.
    _progress("gen 131k inputs on device")
    inputs = build_inputs_device(num_candidates, dim, struct_dim, batch)

    # Headline: the fused batched top-k Pallas kernel; fall back to the
    # per-query kernel, then the pure-XLA streaming path.
    qps = dt = None
    for engine in ("pallas_fused", "pallas", "xla"):
        try:
            _progress(f"headline engine={engine}")
            qps, dt = bench_tpu(bundle, inputs, k=k, chunk=4096, engine=engine)
            break
        except Exception as exc:
            print(json.dumps({f"{engine}_fallback": str(exc)[:400]}), file=sys.stderr)
    # Cross-round comparability point at the r1 batch size (ADVICE r2 #3).
    qps_b8 = None
    try:
        _progress("batch=8 point")
        qps_b8, _ = bench_tpu(
            bundle, {**inputs, "q": inputs["q"][:8]}, k=k, chunk=4096, engine=engine,
        )
    except Exception as exc:
        print(json.dumps({"batch8_error": str(exc)[:300]}), file=sys.stderr)
    del inputs  # free the 131k index before the large-HBM phases
    cpu_inputs = build_inputs(2048, dim, struct_dim, batch)
    _progress("torch cpu reference")
    cpu_qps = bench_cpu_reference(bundle, cpu_inputs, scale_to=num_candidates)
    vs = qps / cpu_qps if cpu_qps else float("nan")

    details = DETAILS
    details.update(
        engine=engine,
        query_throughput_qps=round(qps, 3),
        headline_batch=batch,
        **{f"query_latency_ms_batch{batch}": round(dt * 1e3, 2)},
        query_qps_batch8=round(qps_b8, 2) if qps_b8 else None,
        cpu_reference_qps=round(cpu_qps, 4) if cpu_qps else None,
    )
    if engine == "pallas_fused":
        details["mfu_fused_131k"] = round(
            fused_kernel_mfu(qps, num_candidates, dim, hidden, auto_bq(batch)), 4
        )
    # Index build: project + gather 1M candidate triples from a 262k-entity
    # table (BASELINE.json names "index build time" alongside query qps).
    # Runs BEFORE the 1M query section: the f32 gather peaks at ~13 GB HBM
    # and must not coexist with the 6 GB bf16 query index.
    try:
        _progress("index build")
        details["index_build_1m_candidates_ms"] = round(bench_index_build(), 1)
    except Exception as exc:
        details["index_build_error"] = str(exc)[:300]
    # Million-candidate fan-out point (VERDICT #2 target: >=2x the XLA path).
    try:
        import jax.numpy as _jnp

        _progress("gen 1M inputs on device")
        inputs_1m = build_inputs_device(1_048_576, dim, struct_dim, batch, dtype=_jnp.bfloat16)

        _progress("1M fused")
        qps_1m, _ = bench_tpu(
            bundle, inputs_1m, k=k, chunk=4096, engine="pallas_fused", iters=3,
            index_dtype=_jnp.bfloat16,
        )
        _progress("1M xla")
        xla_1m, _ = bench_tpu(
            bundle, inputs_1m, k=k, chunk=4096, engine="xla", iters=3,
            index_dtype=_jnp.bfloat16,
        )
        details["query_qps_1m_candidates_fused"] = round(qps_1m, 2)
        details["query_qps_1m_candidates_xla"] = round(xla_1m, 2)
        details["fused_vs_xla_1m"] = round(qps_1m / xla_1m, 2)
        details["mfu_fused_1m"] = round(
            fused_kernel_mfu(qps_1m, 1_048_576, dim, hidden, auto_bq(batch)), 4
        )
        del inputs_1m
    except Exception as exc:
        details["bench_1m_error"] = str(exc)[:300]
    def _secondary(name, fn):
        # Secondary benchmarks must not break the headline; the remote-TPU
        # compile RPC also flakes transiently ("response body closed"), so
        # each section gets two retries, with a pause for the tunnel to
        # recover (an immediate retry tends to hit the same broken stream).
        for attempt in range(3):
            try:
                _progress(name if attempt == 0 else f"{name} (retry {attempt})")
                fn()
                return
            except Exception as exc:
                err = str(exc)[:300]
                time.sleep(20 * attempt + 5)
        details[f"{name.replace(' ', '_')}_error"] = err

    def _knn():
        knn_exact, knn_approx = bench_knn()
        details["knn_qps_262k_rows_d1024"] = round(knn_exact, 2)
        details["knn_qps_262k_rows_d1024_approx"] = round(knn_approx, 2)

    def _train():
        details["train_step_graphs_per_sec"] = round(bench_train_step(), 2)

    def _gfn():
        (gfn_qps, gfn_qps_cached, gfn_qps_bf16, gfn_qps_noprecomp,
         gfn_qps_sts, gfn_qps_sts16) = bench_gflownet_step()
        details["gflownet_step_graphs_per_sec"] = round(gfn_qps, 2)
        details["gflownet_step_graphs_per_sec_cached_embed"] = round(gfn_qps_cached, 2)
        details["gflownet_step_graphs_per_sec_bf16_policy"] = round(gfn_qps_bf16, 2)
        if gfn_qps_noprecomp:
            details["gflownet_step_graphs_per_sec_no_precompute"] = round(gfn_qps_noprecomp, 2)
        details["gflownet_step_graphs_per_sec_sts"] = round(gfn_qps_sts, 2)
        details["gflownet_step_graphs_per_sec_sts_bf16"] = round(gfn_qps_sts16, 2)
        for lbl, v in bench_gflownet_step_wide().items():
            details[f"gflownet_step_graphs_per_sec_{lbl}"] = round(v, 2)

    def _serve_keys(prefix: str, stats, all_qps, best_qps):
        # Identical phase-key set for every serve point (ADVICE r4): the
        # headline is the MEDIAN pass; all_qps shows tunnel dispersion.
        details[prefix] = stats.queries_per_s
        base = prefix.rsplit("_qps", 1)[0] + (
            "_realistic" if "realistic" in prefix else ""
        )
        details[f"{base}_qps_all_passes"] = all_qps
        details[f"{base}_qps_best"] = best_qps
        details[f"{base}_pack_s"] = stats.pack_s
        details[f"{base}_dispatch_s"] = stats.dispatch_s
        details[f"{base}_drain_s"] = stats.drain_s
        details[f"{base}_index_build_s"] = stats.index_build_s
        wall = max(stats.scoring_s, 1e-9)
        details[f"{base}_drain_frac"] = round(stats.drain_s / wall, 3)
        details[f"{base}_dispatch_frac"] = round(stats.dispatch_s / wall, 3)

    def _serve():
        stats, all_qps, best_qps = bench_serve_surface()
        _serve_keys("serve_qps_warm_256q_d1024", stats, all_qps, best_qps)

    def _serve_realistic():
        # WebQSP-scale subgraph widths (median ~1.2k edges): the product
        # operating point.  Median of five ~10 s windows (1024 questions
        # each): long windows + median-of-N make the number reproducible
        # across driver captures despite per-RPC tunnel jitter (VERDICT r4
        # #1 -- single short windows measured 68-194 q/s run-to-run).
        stats, all_qps, best_qps = bench_serve_surface(
            num_questions=1024, realistic=True
        )
        _serve_keys("serve_qps_realistic_1024q_d1024", stats, all_qps, best_qps)

    _secondary("knn", _knn)
    _secondary("train step", _train)
    _secondary("gflownet step", _gfn)
    _secondary("serve surface", _serve)
    _secondary("serve realistic", _serve_realistic)
    print(json.dumps(details), file=sys.stderr)
    _write_details()

    print(
        json.dumps(
            {
                "metric": METRIC_NAME,
                "value": round(qps, 3),
                "unit": METRIC_UNIT,
                "vs_baseline": round(vs, 2) if np.isfinite(vs) else None,
            }
        )
    )


def run_cli() -> int:
    """Driver entry: always exits 0 with one parseable JSON line on stdout --
    numbers when the backend is healthy, a structured error otherwise."""
    ok, info = wait_for_backend()
    if not ok:
        emit_structured_error("backend_unavailable", info)
        return 0
    try:
        main()
    except Exception as exc:  # noqa: BLE001 -- structured error is the contract
        import traceback

        traceback.print_exc()
        emit_structured_error("bench_exception", repr(exc))
    return 0


if __name__ == "__main__":
    sys.exit(run_cli())
