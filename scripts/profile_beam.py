import sys, time, glob, os; sys.path.insert(0,'/root/repo')
import numpy as np, jax, jax.numpy as jnp
from end2end_tpu import beam_search_decode
rng = np.random.default_rng(0)
B,T,V,W,K = 32,1000,1024,8,16
base = jax.device_put(jax.nn.log_softmax(jnp.asarray(rng.standard_normal((T,B,V)).astype(np.float32)),-1))
il = jnp.asarray(np.full(B,T,np.int32))
@jax.jit
def run(x):
    def body(c, _):
        tk, ln, sc = beam_search_decode(c, il, beam_width=W, prune_k=K, max_symbols=256)
        return c + 1e-6*sc.sum(), sc[0,0]
    _, vs = jax.lax.scan(body, x, None, length=3)
    return vs.sum()
float(run(base))
with jax.profiler.trace("/tmp/beamtrace"):
    float(run(base))
print("trace files:", glob.glob("/tmp/beamtrace/**/*", recursive=True)[:10])
