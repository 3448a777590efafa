"""End-to-end ASR demo: train a tiny Conformer-CTC on synthetic audio until
it overfits, then decode with greedy and LM-fused beam search.

Run: python examples/asr_demo.py  (CPU ok: JAX_DEMO_CPU=1 forces it)
"""

import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax

if os.environ.get("JAX_DEMO_CPU"):
    jax.config.update("jax_platforms", "cpu")

import jax.numpy as jnp
import numpy as np
import optax

import end2end_tpu as e2e
from end2end_tpu.models.pipeline import ConformerCTCPipeline, PipelineConfig
from end2end_tpu.utils.text import asr_alphabet


def main():
    alphabet = asr_alphabet()
    cfg = PipelineConfig(vocab_size=len(alphabet), d_model=64,
                         num_layers=2, num_heads=2, n_mels=24)
    pipe = ConformerCTCPipeline(cfg)

    rng = np.random.default_rng(0)
    B = 4
    wav = rng.standard_normal((B, 8000)).astype(np.float32)  # 0.5s each
    ns = np.full(B, 8000, np.int32)
    texts = ["hello", "jax tpu", "ctc", "beam"]
    tgt = np.zeros((B, 8), np.int32)
    tl = np.zeros(B, np.int32)
    for i, t in enumerate(texts):
        ids = alphabet.encode(t)
        tgt[i, : len(ids)] = ids
        tl[i] = len(ids)

    n_steps = int(os.environ.get("E2E_DEMO_STEPS", "400"))
    params = pipe.init(jax.random.key(0), wav, ns)
    opt = optax.adamw(optax.cosine_decay_schedule(5e-3, n_steps))
    state = opt.init(params)

    @jax.jit
    def step(params, state):
        loss, grads = jax.value_and_grad(
            lambda p: pipe.loss(p, wav, ns, tgt, tl)
        )(params)
        updates, state = opt.update(grads, state, params)
        return optax.apply_updates(params, updates), state, loss

    for i in range(n_steps):
        params, state, loss = step(params, state)
        if i % 50 == 0:
            print(f"step {i:3d}  ctc loss {float(loss):.3f}")

    toks, lens, scores = jax.jit(lambda p: pipe.decode(p, wav, ns))(params)
    greedy = [alphabet.decode(np.asarray(toks)[i, : int(lens[i])]) for i in range(B)]
    btoks, blens, bscores = jax.jit(
        lambda p: pipe.decode(p, wav, ns, beam_width=8)
    )(params)
    beam = [alphabet.decode(np.asarray(btoks)[i, : int(blens[i])]) for i in range(B)]
    print("\ntarget | greedy | beam-8")
    for t, g, b in zip(texts, greedy, beam):
        print(f"{t!r:12} | {g!r:12} | {b!r:12}")

    from end2end_tpu.utils.metrics import corpus_wer

    print(f"\ngreedy WER {corpus_wer(texts, greedy):.2%} | "
          f"beam-8 WER {corpus_wer(texts, beam):.2%}")

    # checkpoint round-trip (utils/checkpoint.py): restore must reproduce
    # the decode bit-for-bit
    import tempfile

    from end2end_tpu.utils.checkpoint import restore_checkpoint, save_checkpoint

    with tempfile.TemporaryDirectory() as d:
        path = os.path.join(d, "ckpt")
        save_checkpoint(path, params)
        params2 = restore_checkpoint(path, params)
    toks2, lens2, _ = jax.jit(lambda p: pipe.decode(p, wav, ns))(params2)
    assert np.array_equal(np.asarray(toks2), np.asarray(toks))
    print("checkpoint restore reproduces the greedy decode exactly")


if __name__ == "__main__":
    main()
