"""Beam bench — chained methodology (see bench.py docstring)."""
import sys, time; sys.path.insert(0,'/root/repo')
import numpy as np, jax, jax.numpy as jnp
from end2end_tpu import beam_search_decode
rng = np.random.default_rng(0)
B,T,V = 32,1000,1024
base = jax.device_put(jax.nn.log_softmax(jnp.asarray(rng.standard_normal((T,B,V)).astype(np.float32)),-1))
il = jnp.asarray(np.full(B,T,np.int32))
def chain(R, W, K):
    @jax.jit
    def run(x):
        def body(c, _):
            tk, ln, sc = beam_search_decode(c, il, beam_width=W, prune_k=K, max_symbols=256)
            return c + 1e-6*sc.sum(), sc[0,0]
        _, vs = jax.lax.scan(body, x, None, length=R)
        return vs.sum()
    return run
for (W,K) in [(8,16),(16,32)]:
    r1, r5 = chain(1,W,K), chain(5,W,K)
    float(r1(base)); float(r5(base))
    t0=time.perf_counter(); float(r1(base)); t1=time.perf_counter()-t0
    t0=time.perf_counter(); float(r5(base)); t5=time.perf_counter()-t0
    per=(t5-t1)/4
    print(f"beam-{W} (prune {K}): {per*1e3:.2f} ms/iter {B/per:.0f} seq/s", flush=True)
