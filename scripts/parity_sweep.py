"""TPU parity sweep: pallas vs xla loss+grad on all 5 BASELINE configs."""
import sys, time; sys.path.insert(0,'/root/repo')
import numpy as np, jax, jax.numpy as jnp
from end2end_tpu.ops.ctc_loss_pallas import ctc_nll_pallas
from end2end_tpu.ops.ctc_loss_xla import ctc_nll_xla
rng = np.random.default_rng(0)
configs = {
    "synthetic-char": (4, 50, 20, 29),
    "librispeech-char": (32, 1000, 200, 29),
    "ocr": (64, 256, 64, 96),
    "bpe-asr": (16, 1500, 150, 1024),
    "metric": (32, 1000, 100, 1024),
}
for name, (B,T,S,V) in configs.items():
    lp = jax.device_put(jax.nn.log_softmax(jnp.asarray(rng.standard_normal((T,B,V)).astype(np.float32)),-1))
    tgt = jnp.asarray(rng.integers(1,V,(B,S)).astype(np.int32))
    il = jnp.asarray(rng.integers(T//2, T+1, B).astype(np.int32))
    tl = jnp.asarray(np.minimum(np.maximum(il//4,1), S).astype(np.int32))
    fp = jax.jit(lambda x,tg=tgt,i=il,t=tl: jax.value_and_grad(lambda y: jnp.sum(ctc_nll_pallas(y,tg,i,t,0)))(x))
    fx = jax.jit(lambda x,tg=tgt,i=il,t=tl: jax.value_and_grad(lambda y: jnp.sum(ctc_nll_xla(y,tg,i,t,0)))(x))
    v1,g1 = fp(lp); v2,g2 = fx(lp)
    print(f"{name:18s} B={B},T={T},S={S},V={V}: lossdiff={abs(float(v1)-float(v2)):.2e} "
          f"graddiff={float(jnp.abs(g1-g2).max()):.2e}", flush=True)
