"""Tunnel-proof benchmark: chain R dependent iterations inside ONE jitted
program (each feeds on the previous gradient), host-read a scalar once.
true_per_iter = (t(R) - t(1)) / (R - 1)  — dispatch/RTT cancels."""
import sys, time; sys.path.insert(0,'/root/repo')
import numpy as np, jax, jax.numpy as jnp
from end2end_tpu import ctc_loss, beam_search_decode, greedy_decode

rng = np.random.default_rng(0)

def chain_loss(R, B,T,S,V, impl):
    base = jax.device_put(jax.nn.log_softmax(jnp.asarray(rng.standard_normal((T,B,V)).astype(np.float32)),-1))
    tgt = jnp.asarray(rng.integers(1,V,(B,S)).astype(np.int32))
    il = jnp.asarray(np.full(B,T,np.int32)); tl = jnp.asarray(np.full(B,S,np.int32))
    @jax.jit
    def run(x):
        def body(c, _):
            v,g = jax.value_and_grad(lambda y: ctc_loss(y,tgt,il,tl,reduction="mean",zero_infinity=True,implementation=impl))(c)
            return c + 1e-6*g, v
        _, vs = jax.lax.scan(body, x, None, length=R)
        return vs.sum()
    float(run(base))  # warm
    t0=time.perf_counter(); float(run(base)); return time.perf_counter()-t0

def chain_beam(R, B,T,V,W,K):
    base = jax.device_put(jax.nn.log_softmax(jnp.asarray(rng.standard_normal((T,B,V)).astype(np.float32)),-1))
    il = jnp.asarray(np.full(B,T,np.int32))
    @jax.jit
    def run(x):
        def body(c, _):
            tk, ln, sc = beam_search_decode(c, il, beam_width=W, prune_k=K, max_symbols=256)
            return c + 1e-6*sc.sum(), sc[0,0]
        _, vs = jax.lax.scan(body, x, None, length=R)
        return vs.sum()
    float(run(base))
    t0=time.perf_counter(); float(run(base)); return time.perf_counter()-t0

B,T,S,V = 32,1000,100,1024
for impl in ("pallas","xla"):
    t1 = chain_loss(1, B,T,S,V, impl); t9 = chain_loss(9, B,T,S,V, impl)
    per = (t9-t1)/8
    print(f"loss+grad [{impl}] true: {per*1e3:.2f} ms/iter -> {B*T*(2*S+1)/per/1e6:.0f} M cells/s  (t1={t1*1e3:.0f}ms t9={t9*1e3:.0f}ms)", flush=True)
t1 = chain_beam(1, 32,1000,1024,8,16); t9 = chain_beam(9, 32,1000,1024,8,16)
per=(t9-t1)/8
print(f"beam-8 true: {per*1e3:.2f} ms/iter -> {32/per:.0f} seq/s  (t1={t1*1e3:.0f}ms t9={t9*1e3:.0f}ms)", flush=True)
