import sys, time; sys.path.insert(0,'/root/repo')
import numpy as np, jax, jax.numpy as jnp
import end2end_tpu.ops.ctc_loss_pallas as P
rng = np.random.default_rng(0)
B,T,S,V = 32,1000,100,1024
base = jax.device_put(jax.nn.log_softmax(jnp.asarray(rng.standard_normal((T,B,V)).astype(np.float32)),-1))
tgt = jnp.asarray(rng.integers(1,V,(B,S)).astype(np.int32))
il = jnp.asarray(np.full(B,T,np.int32)); tl = jnp.asarray(np.full(B,S,np.int32))
orig = P._pick_tc
def chain(R):
    @jax.jit
    def run(x):
        def body(c, _):
            v,g = jax.value_and_grad(lambda y: jnp.sum(P.ctc_nll_pallas(y,tgt,il,tl,0)))(c)
            return c + 1e-6*g, v
        _, vs = jax.lax.scan(body, x, None, length=R)
        return vs.sum()
    return run
print("default tc:", orig(1000, 32, 256), flush=True)
for tc in (10, 25, 50, 100, 125, 200, 250):
    P._pick_tc = lambda t_pad,b,l,_tc=tc: _tc if t_pad % _tc == 0 else orig(t_pad,b,l)
    jax.clear_caches()
    r1, r9 = chain(1), chain(9)
    float(r1(base)); float(r9(base))
    t0=time.perf_counter(); float(r1(base)); t1=time.perf_counter()-t0
    t0=time.perf_counter(); float(r9(base)); t9=time.perf_counter()-t0
    per=(t9-t1)/8
    print(f"tc={tc}: {per*1e3:.2f} ms/iter {B*T*(2*S+1)/per/1e6:.0f} M cells/s", flush=True)
