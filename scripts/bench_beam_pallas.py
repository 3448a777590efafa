"""Pallas beam kernel: TPU correctness + chained throughput vs XLA beam."""
import sys, time; sys.path.insert(0,'/root/repo')
import numpy as np, jax, jax.numpy as jnp
from end2end_tpu.ops.beam_search_pallas import beam_search_pallas
from end2end_tpu import beam_search_decode
rng = np.random.default_rng(0)
B,T,V,W,K = 32,1000,1024,8,16
base = np.asarray(jax.nn.log_softmax(jnp.asarray(rng.standard_normal((T,B,V)).astype(np.float32)),-1))
il = np.full(B,T,np.int32)

# correctness vs XLA on the big config (top-1 + scores)
pt, pl_, ps = beam_search_pallas(base, il, beam_width=W, prune_k=K, max_symbols=256)
xt, xl, xs = beam_search_decode(base, il, beam_width=W, prune_k=K, max_symbols=256)
agree = sum(pt[b,0,:pl_[b,0]].tolist() == np.asarray(xt)[b,0,:int(xl[b,0])].tolist() for b in range(B))
sdiff = float(np.max(np.abs(ps[:,0] - np.asarray(xs)[:,0])))
print(f"top-1 agreement {agree}/{B}; top-1 score maxdiff {sdiff:.2e}", flush=True)

# throughput: time the device part (kernel+topk) excluding host backtrace,
# then the full call including backtrace.
import end2end_tpu.ops.beam_search_pallas as BP
t0=time.perf_counter()
for i in range(5):
    out = beam_search_pallas(base + np.float32(i)*1e-7, il, beam_width=W, prune_k=K, max_symbols=256)
dt_full=(time.perf_counter()-t0)/5
print(f"pallas beam full (incl host backtrace): {dt_full*1e3:.2f} ms/iter {B/dt_full:.0f} seq/s", flush=True)
