"""Pallas beam kernel: TPU correctness + chained throughput vs XLA scan.

The whole pallas decode (topk kernel -> beam kernel -> associative-scan
backtrace) is one jittable program, so the chained methodology from bench.py
applies directly.
"""
import sys, time; sys.path.insert(0, '/root/repo')
import numpy as np, jax, jax.numpy as jnp
from end2end_tpu import beam_search_decode

rng = np.random.default_rng(0)
B, T, V, W, K = 32, 1000, 1024, 8, 16
lp = jax.device_put(jax.nn.log_softmax(
    jnp.asarray(rng.standard_normal((T, B, V)).astype(np.float32) * 2.0), -1))
il = jnp.full((B,), T, jnp.int32)

# correctness: pallas vs XLA scan on the big config (top-1 + scores)
pt, pl_, ps = [np.asarray(a) for a in beam_search_decode(
    lp, il, beam_width=W, prune_k=K, max_symbols=256, implementation="pallas")]
xt, xl, xs = [np.asarray(a) for a in beam_search_decode(
    lp, il, beam_width=W, prune_k=K, max_symbols=256, implementation="xla")]
agree = sum(pt[b, 0, :pl_[b, 0]].tolist() == xt[b, 0, :xl[b, 0]].tolist()
            for b in range(B))
sdiff = float(np.max(np.abs(ps[:, 0] - xs[:, 0])))
print(f"top-1 agreement {agree}/{B}; top-1 score maxdiff {sdiff:.2e}", flush=True)

def bench(impl):
    def mk(r):
        @jax.jit
        def run(x):
            def body(c, _):
                # decode the CARRY so iterations are data-dependent — XLA
                # hoists a loop-invariant decode out of the while loop
                # (observed: 4x-optimistic numbers)
                toks, lens, scores = beam_search_decode(
                    c, il, beam_width=W, prune_k=K, max_symbols=256,
                    implementation=impl)
                return c + 1e-9 * scores.sum(), scores[0, 0]
            _, vs = jax.lax.scan(body, x, None, length=r)
            return vs.sum()
        return lambda: run(lp)
    r1, r5 = mk(1), mk(5)
    float(r1()); float(r5())
    a = time.perf_counter(); float(r1()); t1 = time.perf_counter() - a
    a = time.perf_counter(); float(r5()); t5 = time.perf_counter() - a
    dt = max(t5 - t1, 1e-9) / 4
    print(f"{impl}: {dt*1e3:.2f} ms/iter -> {B/dt:.0f} seq/s", flush=True)

bench("pallas")
bench("xla")
