"""Test configuration.

Tests run on a virtual 8-device CPU mesh (SURVEY.md §5.2 item 6) so that the
multi-chip sharding paths are exercised without real TPU hardware, and so
results are deterministic.  Set E2E_TPU=1 to run the suite against the real
TPU device instead (sharding tests will skip if fewer than 2 devices).

Environment variables must be set before jax is imported anywhere.
"""

import os

import jax  # noqa: E402

if os.environ.get("E2E_TPU", "0") != "1":
    # The environment's sitecustomize imports jax and registers the axon TPU
    # plugin at interpreter start, so env vars are too late here — use the
    # config API to force an 8-device virtual CPU platform for tests.
    jax.config.update("jax_platforms", "cpu")
    jax.config.update("jax_num_cpu_devices", 8)

# Persistent compilation cache: scan compiles are ~40-60s each on this
# 1-vCPU box; caching makes repeat suite runs fast.
jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache_e2e")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)

# The full suite compiles/loads hundreds of XLA CPU executables in ONE
# process; each maps many JIT code/data segments, and the process EXHAUSTS
# the kernel's vm.max_map_count (default 65530) around ~80% of the suite —
# mmap then fails and XLA segfaults (observed round 3: rc=139 crashes in
# backend_compile / executable (de)serialization, moving with run order).
# Two-layer fix: raise the limit when we can (root in this environment),
# and bound live executables by dropping JAX's in-memory caches after each
# test module (module-scoped jitted closures die with the module; the
# persistent disk cache keeps any cross-module recompiles cheap).
try:  # best-effort: harmless if not permitted
    with open("/proc/sys/vm/max_map_count") as f:
        _cur = int(f.read())
    if _cur < 1_000_000:
        with open("/proc/sys/vm/max_map_count", "w") as f:
            f.write("1000000")
except OSError:
    pass

import numpy as np  # noqa: E402
import pytest  # noqa: E402


@pytest.fixture(autouse=True, scope="module")
def _bound_jax_jit_maps():
    """Free compiled executables (and their mmapped JIT code) per module —
    see the max_map_count note above."""
    yield
    jax.clear_caches()


@pytest.fixture
def rng():
    return np.random.default_rng(0)


def random_ctc_problem(rng, B, T, S, V, blank=0, min_t_frac=0.5, dtype=np.float32):
    """Random padded CTC problem in torch.nn.CTCLoss layout."""
    logits = rng.standard_normal((T, B, V)).astype(np.float64) * 2.0
    log_probs = logits - np.log(np.sum(np.exp(logits), axis=-1, keepdims=True))
    log_probs = log_probs.astype(dtype)
    input_lengths = rng.integers(max(1, int(T * min_t_frac)), T + 1, size=B)
    target_lengths = rng.integers(1, S + 1, size=B)
    # ensure feasible alignments: need T_n >= ... keep S_n small enough
    target_lengths = np.minimum(target_lengths, np.maximum(input_lengths // 3, 1))
    labels = rng.integers(1, V, size=(B, S))  # avoid blank id 0 in labels
    return log_probs, labels.astype(np.int32), input_lengths.astype(np.int32), target_lengths.astype(np.int32)
