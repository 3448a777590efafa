"""Beam decode bench with tunnel-safe methodology: varied inputs per iter,
one block_until_ready at the end (per-iter host reads measure tunnel RTT,
not compute; see scripts/bench_verify.py)."""
import sys, time; sys.path.insert(0,'/root/repo')
import numpy as np, jax, jax.numpy as jnp
from end2end_tpu import beam_search_decode
B,T,V,W,K = 32,1000,1024,8,16
rng = np.random.default_rng(0)
base = jax.device_put(jax.nn.log_softmax(jnp.asarray(rng.standard_normal((T,B,V)).astype(np.float32)),-1))
il = jnp.asarray(np.full(B,T,np.int32))
def bench(name, approx, iters=8):
    fn = lambda i: beam_search_decode(base + jnp.float32(i)*1e-7, il, beam_width=W,
                                      prune_k=K, max_symbols=256, approx_topk=approx)
    jax.block_until_ready(fn(999))
    outs = []
    t0=time.perf_counter()
    for i in range(iters): outs.append(fn(i)[2])
    jax.block_until_ready(outs)
    dt=(time.perf_counter()-t0)/iters
    print(f"{name}: {dt*1e3:.2f} ms  {B/dt:.0f} seq/s", flush=True)
bench("beam-8 exact  (varied+block)", False)
bench("beam-8 approx (varied+block)", True)
