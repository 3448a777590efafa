"""Is the per-step W-selection top_k the beam bottleneck? Try iterative max."""
import sys, time; sys.path.insert(0,'/root/repo')
import numpy as np, jax, jax.numpy as jnp
import end2end_tpu.ops.beam_search as BS
from end2end_tpu import beam_search_decode

def topw_iter(scores, W):
    n = scores.shape[-1]
    idxs = []
    vals = []
    s = scores
    iota = jnp.arange(n, dtype=jnp.int32)
    for _ in range(W):
        m = jnp.max(s, axis=-1)
        i = jnp.argmax(s, axis=-1).astype(jnp.int32)
        vals.append(m); idxs.append(i)
        s = jnp.where(iota[None, :] == i[..., None] if s.ndim > 1 else iota == i, -jnp.inf, s)
    return jnp.stack(vals, -1), jnp.stack(idxs, -1)

orig_topk = jax.lax.top_k
def patched_topk(x, k):
    if k <= 16 and x.shape[-1] <= 512:
        return topw_iter(x, k)
    return orig_topk(x, k)

rng = np.random.default_rng(0)
B,T,V,W,K = 32,1000,1024,8,16
base = jax.device_put(jax.nn.log_softmax(jnp.asarray(rng.standard_normal((T,B,V)).astype(np.float32)),-1))
il = jnp.asarray(np.full(B,T,np.int32))
def chain(R):
    @jax.jit
    def run(x):
        def body(c, _):
            tk, ln, sc = beam_search_decode(c, il, beam_width=W, prune_k=K, max_symbols=256)
            return c + 1e-6*sc.sum(), sc[0,0]
        _, vs = jax.lax.scan(body, x, None, length=R)
        return vs.sum()
    return run
def measure(tag):
    r1, r5 = chain(1), chain(5)
    float(r1(base)); float(r5(base))
    t0=time.perf_counter(); float(r1(base)); t1=time.perf_counter()-t0
    t0=time.perf_counter(); float(r5(base)); t5=time.perf_counter()-t0
    per=(t5-t1)/4
    print(f"{tag}: {per*1e3:.2f} ms/iter {B/per:.0f} seq/s", flush=True)
measure("baseline")
BS.jax.lax = jax.lax  # ensure attr
import types
# monkeypatch inside the beam module only
BS_jax_lax = BS.jax.lax
patched = types.SimpleNamespace(**{k: getattr(jax.lax, k) for k in dir(jax.lax) if not k.startswith('_')})
patched.top_k = patched_topk
BS.jax = types.SimpleNamespace(lax=patched, vmap=jax.vmap, jit=jax.jit, tree=jax.tree)
measure("iterative top-w")
# correctness
t1_,l1_,s1_ = beam_search_decode(base, il, beam_width=W, prune_k=K, max_symbols=256)
import end2end_tpu.ops.beam_search as BS2
print("scores close:", bool(jnp.allclose(s1_, s1_)))
