import sys, time; sys.path.insert(0,'/root/repo')
import numpy as np, jax, jax.numpy as jnp
import end2end_tpu.ops.beam_search_pallas as BP
rng = np.random.default_rng(0)
B,T,V,W,K = 32,1000,1024,8,16
lp = jax.device_put(jax.nn.log_softmax(jnp.asarray(rng.standard_normal((T,B,V)).astype(np.float32)),-1))
il = jnp.asarray(np.full(B,T,np.int32))
# device part only, blocked
out = BP._device_part(lp, il, W, K, 256, 0, False, T, B, V); jax.block_until_ready(out)
t0=time.perf_counter()
for _ in range(5):
    out = BP._device_part(lp, il, W, K, 256, 0, False, T, B, V)
jax.block_until_ready(out)
dt=(time.perf_counter()-t0)/5
print(f"device part (identical-arg dispatch): {dt*1e3:.1f} ms", flush=True)
# chained (true device cost)
@jax.jit
def chain(x):
    def body(c, _):
        bp, sc, ck = BP._device_part(c, il, W, K, 256, 0, False, T, B, V)
        return c + 1e-6*sc.sum(), sc[0,0]
    _, vs = jax.lax.scan(body, x, None, length=5)
    return vs.sum()
float(chain(lp))
t0=time.perf_counter(); float(chain(lp)); t5=time.perf_counter()-t0
@jax.jit
def chain1(x):
    bp, sc, ck = BP._device_part(x, il, W, K, 256, 0, False, T, B, V)
    return sc.sum()
float(chain1(lp))
t0=time.perf_counter(); float(chain1(lp)); t1=time.perf_counter()-t0
print(f"chained kernel true: {(t5-t1)/4*1e3:.1f} ms/iter (t1={t1*1e3:.0f} t5={t5*1e3:.0f})", flush=True)
# full call incl host backtrace
from end2end_tpu.ops.beam_search_pallas import beam_search_pallas
beam_search_pallas(np.asarray(lp), np.asarray(il), beam_width=W, prune_k=K, max_symbols=256)
t0=time.perf_counter()
beam_search_pallas(np.asarray(lp), np.asarray(il), beam_width=W, prune_k=K, max_symbols=256)
print(f"full call (incl backtrace + transfers): {(time.perf_counter()-t0)*1e3:.1f} ms", flush=True)
