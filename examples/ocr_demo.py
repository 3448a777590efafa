"""OCR demo: train the CRNN-style recognizer to read synthetic glyph strips,
then decode with beam-10 (BASELINE config 3's decoding setup).

Run: python examples/ocr_demo.py  (JAX_DEMO_CPU=1 to force CPU)
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

from end2end_tpu import beam_search_decode, ctc_loss
from end2end_tpu.models.ocr import OCRRecognizer
from end2end_tpu.utils.text import Alphabet


def glyph_strip(text, alphabet, h=16, glyph_w=8, width=64, rng=None):
    """Deterministic toy glyphs: each char id renders as a distinct pattern."""
    img = np.zeros((h, width), np.float32)
    for i, c in enumerate(text):
        cid = alphabet.encode(c)[0]
        x0 = i * glyph_w
        gy, gx = np.mgrid[0:h, 0:glyph_w]
        img[:, x0 : x0 + glyph_w] = np.sin(0.7 * cid * gx + gy * 0.31 * (cid % 5 + 1))
    if rng is not None:
        img += 0.05 * rng.standard_normal(img.shape).astype(np.float32)
    return img, len(text) * glyph_w


def main():
    alphabet = Alphabet(["_"] + list("abcdefgh"))
    model = OCRRecognizer(vocab_size=len(alphabet), d_model=48, num_layers=1,
                          num_heads=2)
    rng = np.random.default_rng(0)
    texts = ["cafe", "badge", "dach", "fee"]
    imgs, widths, tgt, tl = [], [], [], []
    for t in texts:
        im, w = glyph_strip(t, alphabet, rng=rng)
        imgs.append(im)
        widths.append(w)
        ids = alphabet.encode(t)
        tgt.append(ids + [0] * (8 - len(ids)))
        tl.append(len(ids))
    imgs = np.stack(imgs)
    widths = np.array(widths, np.int32)
    tgt = np.array(tgt, np.int32)
    tl = np.array(tl, np.int32)

    n_steps = int(os.environ.get("E2E_DEMO_STEPS", "300"))
    params = model.init(jax.random.key(0), jnp.asarray(imgs), jnp.asarray(widths))
    opt = optax.adamw(optax.cosine_decay_schedule(4e-3, n_steps))
    state = opt.init(params)

    @jax.jit
    def step(params, state):
        def loss_fn(p):
            logits, ow = model.apply(p, jnp.asarray(imgs), jnp.asarray(widths))
            lp = jnp.moveaxis(jax.nn.log_softmax(logits, -1), 0, 1)
            return ctc_loss(lp, tgt, ow, tl)

        loss, grads = jax.value_and_grad(loss_fn)(params)
        updates, state = opt.update(grads, state, params)
        return optax.apply_updates(params, updates), state, loss

    for i in range(n_steps):
        params, state, loss = step(params, state)
        if i % 50 == 0:
            print(f"step {i:3d}  ctc loss {float(loss):.3f}")

    logits, ow = model.apply(params, jnp.asarray(imgs), jnp.asarray(widths))
    lp = jnp.moveaxis(jax.nn.log_softmax(logits, -1), 0, 1)
    toks, lens, scores = beam_search_decode(lp, ow, beam_width=10)
    print("\ntarget | beam-10 best")
    for i, t in enumerate(texts):
        got = alphabet.decode(np.asarray(toks)[i, 0, : int(lens[i, 0])])
        print(f"{t!r:10} | {got!r}")


if __name__ == "__main__":
    main()
