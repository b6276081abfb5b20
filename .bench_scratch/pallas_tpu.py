import os, time
os.environ.setdefault('JAX_COMPILATION_CACHE_DIR','/root/.cache/jax_comp_cache')
import numpy as np, jax, jax.numpy as jnp
import sys; sys.path.insert(0, '/root/repo')
from bench import make_bundle, build_inputs
from evi_rag_tpu.ops.query import TripleIndex, score_all, query_topk
from evi_rag_tpu.ops.pallas_score import pallas_score_bidirectional, pallas_query_topk
D, S = 256, 20
bundle = jax.tree.map(jnp.asarray, make_bundle(D, D, S))
ins = build_inputs(2048, D, S, 1)
t0=time.time()
got = pallas_score_bidirectional(bundle, jnp.asarray(ins['q'][0]),
    jnp.asarray(ins['head']), jnp.asarray(ins['rel']), jnp.asarray(ins['tail']),
    jnp.asarray(ins['struct']), tile=512)
got = np.asarray(got)
print('D=256 compile+run', round(time.time()-t0,1), 's', flush=True)
ref = np.asarray(score_all(bundle, jnp.asarray(ins['q'][:1]), TripleIndex(
    head_repr=jnp.asarray(ins['head']), rel_repr=jnp.asarray(ins['rel']),
    tail_repr=jnp.asarray(ins['tail']), struct_raw=jnp.asarray(ins['struct'])), dtype=jnp.bfloat16)[0])
print('parity maxabs', float(np.abs(ref-got).max()), 'corr', float(np.corrcoef(ref,got)[0,1]), flush=True)

# production size
D, S, M, B = 1024, 20, 131072, 8
bundle = jax.tree.map(jnp.asarray, make_bundle(D, D, S))
ins = build_inputs(M, D, S, B)
idx = TripleIndex(head_repr=jnp.asarray(ins['head']), rel_repr=jnp.asarray(ins['rel']),
    tail_repr=jnp.asarray(ins['tail']), struct_raw=jnp.asarray(ins['struct']))
q = jnp.asarray(ins['q'])
t0=time.time()
v, i = pallas_query_topk(bundle, q, idx, k=100, tile=512)
np.asarray(v)
print('D=1024 pallas compile+first run', round(time.time()-t0,1), 's', flush=True)
def timeit(fn, iters=5):
    np.asarray(fn()[0])
    t0=time.perf_counter()
    for _ in range(iters-1): fn()
    r=fn(); np.asarray(r[0])
    return (time.perf_counter()-t0)/iters
t_pal = timeit(lambda: pallas_query_topk(bundle, q, idx, k=100, tile=512))
print(f"Pallas: {B/t_pal:.1f} q/s ({t_pal*1e3:.1f} ms/batch)", flush=True)
t_xla = timeit(lambda: query_topk(bundle, q, idx, k=100, chunk=4096))
print(f"XLA   : {B/t_xla:.1f} q/s ({t_xla*1e3:.1f} ms/batch)", flush=True)
