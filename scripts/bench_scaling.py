"""Batch-scaling study: is throughput launch-bound or compute-bound?"""
import sys, time; sys.path.insert(0,'/root/repo')
import numpy as np, jax, jax.numpy as jnp
from end2end_tpu import ctc_loss, beam_search_decode
rng = np.random.default_rng(0)
def chain(make_body, R):
    @jax.jit
    def run(x):
        _, vs = jax.lax.scan(make_body(), x, None, length=R)
        return vs.sum()
    return run
def bench_loss(B, T=1000, S=100, V=1024):
    lp = jax.device_put(jax.nn.log_softmax(jnp.asarray(rng.standard_normal((T,B,V)).astype(np.float32)),-1))
    tgt = jnp.asarray(rng.integers(1,V,(B,S)).astype(np.int32))
    il = jnp.asarray(np.full(B,T,np.int32)); tl = jnp.asarray(np.full(B,S,np.int32))
    def mk():
        def body(c, _):
            v,g = jax.value_and_grad(lambda y: ctc_loss(y,tgt,il,tl,reduction="mean",zero_infinity=True))(c)
            return c + 1e-6*g, v
        return body
    r1, r9 = chain(mk,1), chain(mk,9)
    float(r1(lp)); float(r9(lp))
    t0=time.perf_counter(); float(r1(lp)); t1=time.perf_counter()-t0
    t0=time.perf_counter(); float(r9(lp)); t9=time.perf_counter()-t0
    per=(t9-t1)/8
    print(f"loss B={B}: {per*1e3:7.2f} ms/iter  {B*T*(2*S+1)/per/1e6:8.0f} M cells/s", flush=True)
def bench_beam(B, T=1000, V=1024, W=8, K=16):
    lp = jax.device_put(jax.nn.log_softmax(jnp.asarray(rng.standard_normal((T,B,V)).astype(np.float32)),-1))
    il = jnp.asarray(np.full(B,T,np.int32))
    def mk():
        def body(c, _):
            tk, ln, sc = beam_search_decode(c, il, beam_width=W, prune_k=K, max_symbols=256)
            return c + 1e-6*sc.sum(), sc[0,0]
        return body
    r1, r5 = chain(mk,1), chain(mk,5)
    float(r1(lp)); float(r5(lp))
    t0=time.perf_counter(); float(r1(lp)); t1=time.perf_counter()-t0
    t0=time.perf_counter(); float(r5(lp)); t5=time.perf_counter()-t0
    per=(t5-t1)/4
    print(f"beam B={B}: {per*1e3:7.2f} ms/iter  {B/per:8.0f} seq/s", flush=True)
for B in (32, 128, 512):
    bench_loss(B)
for B in (32, 128, 512):
    bench_beam(B)
