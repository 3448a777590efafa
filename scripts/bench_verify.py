import sys, time; sys.path.insert(0,'/root/repo')
import numpy as np, jax, jax.numpy as jnp
from end2end_tpu import ctc_loss
B,T,S,V = 32,1000,100,1024
rng = np.random.default_rng(0)
base = jax.device_put(jax.nn.log_softmax(jnp.asarray(rng.standard_normal((T,B,V)).astype(np.float32)),-1))
tgt = jnp.asarray(rng.integers(1,V,(B,S)).astype(np.int32))
il = jnp.asarray(np.full(B,T,np.int32)); tl = jnp.asarray(np.full(B,S,np.int32))
step = jax.jit(lambda x: jax.value_and_grad(lambda y: ctc_loss(y,tgt,il,tl,reduction="mean",zero_infinity=True))(x))
# warmup
for _ in range(3): jax.block_until_ready(step(base))
# A: identical inputs, block_until_ready only
t0=time.perf_counter()
for _ in range(20): out=step(base)
jax.block_until_ready(out)
dtA=(time.perf_counter()-t0)/20
# B: varied inputs, host-read sync each iter
t0=time.perf_counter(); acc=0.0
for i in range(20):
    v,g = step(base + jnp.float32(i)*1e-7)
    acc += float(v)
dtB=(time.perf_counter()-t0)/20
# C: varied inputs, block_until_ready at end only
outs=[]
t0=time.perf_counter()
for i in range(20):
    outs.append(step(base + jnp.float32(100+i)*1e-7)[0])
jax.block_until_ready(outs)
dtC=(time.perf_counter()-t0)/20
cells=B*T*(2*S+1)
print(f"A identical+block: {dtA*1e3:.2f} ms ({cells/dtA/1e6:.0f} M cells/s)")
print(f"B varied+hostread: {dtB*1e3:.2f} ms ({cells/dtB/1e6:.0f} M cells/s) acc={acc:.2f}")
print(f"C varied+block:    {dtC*1e3:.2f} ms ({cells/dtC/1e6:.0f} M cells/s)")
