"""Stage-level profile of the pallas beam decode on the real TPU.

Breaks the decode into its three stages (topk kernel / beam scan kernel /
associative-scan backtrace) with the chained one-jit methodology.
"""
import sys, time; sys.path.insert(0, '/root/repo')
from functools import partial
import numpy as np, jax, jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu
import end2end_tpu.ops.beam_search_pallas as bsp
from end2end_tpu.ops.topk_pallas import topk_pallas

rng = np.random.default_rng(0)
B, T, V, W, K, s_cap = 32, 1000, 1024, 8, 16, 256
lp = jax.device_put(jax.nn.log_softmax(
    jnp.asarray(rng.standard_normal((T, B, V)).astype(np.float32) * 2.0), -1))
il = jnp.full((B,), T, jnp.int32)

def timeit(name, mk):
    r1, r5 = mk(1), mk(5)
    float(r1()); float(r5())
    a = time.perf_counter(); float(r1()); t1 = time.perf_counter() - a
    a = time.perf_counter(); float(r5()); t5 = time.perf_counter() - a
    print(f"{name}: {(t5-t1)/4*1e3:.2f} ms/iter", flush=True)

def chain(f, consume):
    def mk(r):
        @jax.jit
        def run(x):
            def body(c, _):
                return c + 1e-6 * consume(f(c)), 0.0
            c, _ = jax.lax.scan(body, x, None, length=r)
            return c.sum()
        return lambda: run(lp)
    return mk

timeit("topk_pallas", chain(lambda c: topk_pallas(c, K),
                            lambda o: o[0].sum()))
timeit("full pallas decode", chain(
    lambda c: bsp._beam_pallas_jit(c, il, W, K, s_cap, 0, False, False, T, B, V),
    lambda o: o[2].sum()))
timeit("xla lax.top_k (for reference)", chain(
    lambda c: jax.lax.top_k(c, K),
    lambda o: o[0].sum() + 1e-3 * o[1].sum().astype(jnp.float32)))
