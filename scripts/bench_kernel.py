"""Micro-bench of the fused Pallas CTC kernels on the metric config."""
import sys, time
sys.path.insert(0, "/root/repo")
import numpy as np, jax, jax.numpy as jnp
from end2end_tpu.ops import ctc_loss_pallas as P
from end2end_tpu.ops.ctc_loss_xla import ctc_nll_xla

B, T, S, V = 32, 1000, 100, 1024
rng = np.random.default_rng(0)
lp = jax.device_put(jax.nn.log_softmax(jnp.asarray(rng.standard_normal((T, B, V)).astype(np.float32)), -1))
tgt = jnp.asarray(rng.integers(1, V, (B, S)).astype(np.int32))
il = jnp.asarray(np.full(B, T, np.int32))
tl = jnp.asarray(np.full(B, S, np.int32))
full = jax.jit(lambda x: jax.value_and_grad(lambda y: jnp.sum(P.ctc_nll_pallas(y, tgt, il, tl, 0)))(x))
for _ in range(3):
    jax.block_until_ready(full(lp))
t0 = time.perf_counter()
for _ in range(20):
    out = full(lp)
jax.block_until_ready(out)
dt = (time.perf_counter() - t0) / 20
print(f"pallas fwd+bwd: {dt*1e3:.2f} ms -> {B*T*(2*S+1)/dt/1e6:.0f} M cells/s", flush=True)
fx = jax.jit(lambda x: jax.value_and_grad(lambda y: jnp.sum(ctc_nll_xla(y, tgt, il, tl, 0)))(x))
v1, g1 = full(lp); v2, g2 = fx(lp)
print("loss:", float(v1), float(v2), "graddiff:", float(jnp.abs(g1 - g2).max()))
