import sys, time; sys.path.insert(0,'/root/repo')
import numpy as np, jax, jax.numpy as jnp
from end2end_tpu.ops import ctc_loss_pallas as P
from end2end_tpu.ops.ctc_loss_xla import ctc_nll_xla
rng = np.random.default_rng(0)
def check(B,T,S,V):
    lp = jax.device_put(jax.nn.log_softmax(jnp.asarray(rng.standard_normal((T,B,V)).astype(np.float32)),-1))
    tgt = jnp.asarray(rng.integers(1,V,(B,S)).astype(np.int32))
    il = jnp.asarray(np.full(B,T,np.int32)); tl = jnp.asarray(np.full(B,S,np.int32))
    fp = jax.jit(lambda x: jax.value_and_grad(lambda y: jnp.sum(P.ctc_nll_pallas(y,tgt,il,tl,0)))(x))
    fx = jax.jit(lambda x: jax.value_and_grad(lambda y: jnp.sum(ctc_nll_xla(y,tgt,il,tl,0)))(x))
    v1,g1 = fp(lp); v2,g2 = fx(lp)
    meta = P._prep(lp, tgt, il, tl, 0)[7]
    print(f"B={B},T={T},S={S},V={V} (Lp={meta['lp_lanes']},tc={meta['tc']},chunks={meta['t_pad']//meta['tc']}): "
          f"lossdiff={abs(float(v1)-float(v2)):.2e} graddiff={float(jnp.abs(g1-g2).max()):.2e}", flush=True)
check(8, 120, 100, 29)    # Lp=256, single chunk
check(8, 1000, 30, 29)    # Lp=128, multi chunk
check(32, 120, 30, 29)    # B=32, Lp=128, single chunk
check(32, 1000, 30, 29)   # B=32, multi chunk, Lp=128
