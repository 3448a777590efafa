"""In-kernel LM fusion: TPU correctness + chained throughput vs XLA scan.

Char-CTC + bigram-LM decode (the reference's KenLM regime): V=29 alphabet,
dense NGramLM fused inside the Pallas beam kernel vs the XLA scan's
shallow-fusion carry.  Chained methodology from bench.py (each iteration
perturbs the input with the previous scores, so the scan cannot be hoisted).
"""
import sys, time; sys.path.insert(0, '/root/repo')
import numpy as np, jax, jax.numpy as jnp
from end2end_tpu import beam_search_decode
from end2end_tpu.ops.lm import NGramLM, bigram_from_counts

rng = np.random.default_rng(0)
V = 29
lm = NGramLM(
    bigram_from_counts(rng.integers(0, 20, (V, V))),
    start_logp=rng.standard_normal(V).astype(np.float32),
    eos_logp=(rng.standard_normal(V).astype(np.float32) * 0.5),
)
ALPHA, BETA = 0.6, 0.3

# --- correctness: EXACT config (prune_k=None -> full vocab) ---------------
Bc, Tc = 16, 200
lpc = jax.device_put(jax.nn.log_softmax(
    jnp.asarray(rng.standard_normal((Tc, Bc, V)).astype(np.float32) * 1.5), -1))
ilc = jnp.asarray(rng.integers(Tc // 2, Tc + 1, Bc).astype(np.int32))
kw = dict(beam_width=8, lm=lm, lm_alpha=ALPHA, lm_beta=BETA, max_symbols=256)
pt, pl_, ps = [np.asarray(a) for a in beam_search_decode(
    lpc, ilc, implementation="pallas", **kw)]
xt, xl, xs = [np.asarray(a) for a in beam_search_decode(
    lpc, ilc, implementation="xla", **kw)]
agree = sum(pt[b, 0, :pl_[b, 0]].tolist() == xt[b, 0, :xl[b, 0]].tolist()
            for b in range(Bc))
sdiff = float(np.max(np.abs(ps[:, 0] - xs[:, 0])))
beams_eq = 0
for b in range(Bc):
    pset = {tuple(pt[b, w, :pl_[b, w]].tolist()) for w in range(8)
            if np.isfinite(ps[b, w])}
    xset = {tuple(xt[b, w, :xl[b, w]].tolist()) for w in range(8)
            if np.isfinite(xs[b, w])}
    beams_eq += pset == xset
print(f"EXACT: top-1 agree {agree}/{Bc}; full beam sets equal {beams_eq}/{Bc};"
      f" top-1 score maxdiff {sdiff:.2e}", flush=True)

# --- chained throughput: production char-decode shape ---------------------
B, T, W, K = 128, 1000, 8, 16
lp = jax.device_put(jax.nn.log_softmax(
    jnp.asarray(rng.standard_normal((T, B, V)).astype(np.float32) * 2.0), -1))
il = jnp.full((B,), T, jnp.int32)

def bench(impl, use_lm, label):
    kw2 = dict(beam_width=W, prune_k=K, max_symbols=256, implementation=impl)
    if use_lm:
        kw2.update(lm=lm, lm_alpha=ALPHA, lm_beta=BETA)
    def mk(r):
        @jax.jit
        def run(x):
            def body(c, _):
                toks, lens, scores = beam_search_decode(c, il, **kw2)
                # perturb the next input with this result: data-dependent
                c = c + 1e-9 * scores.sum()
                return c, scores[0, 0]
            _, vs = jax.lax.scan(body, x, None, length=r)
            return vs.sum()
        return lambda: run(lp)
    r1, r5 = mk(1), mk(5)
    float(r1()); float(r5())
    a = time.perf_counter(); float(r1()); t1 = time.perf_counter() - a
    a = time.perf_counter(); float(r5()); t5 = time.perf_counter() - a
    dt = max(t5 - t1, 1e-9) / 4
    print(f"{label}: {dt*1e3:.2f} ms/iter -> {B/dt:.0f} seq/s", flush=True)

bench("pallas", True, "pallas+LM")
bench("xla", True, "xla+LM   ")
bench("pallas", False, "pallas   ")
bench("xla", False, "xla      ")
