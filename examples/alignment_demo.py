"""Forced-alignment demo: align a transcript to a lattice and print the
per-frame segmentation.

Run: python examples/alignment_demo.py  (JAX_DEMO_CPU=1 to force CPU)
"""

import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax

if os.environ.get("JAX_DEMO_CPU"):
    jax.config.update("jax_platforms", "cpu")

import numpy as np

import end2end_tpu as e2e
from end2end_tpu.utils.text import asr_alphabet


def main():
    alphabet = asr_alphabet()
    rng = np.random.default_rng(1)
    text = "cat"
    ids = alphabet.encode(text)
    T, V = 16, len(alphabet)

    # synthesize a lattice that clearly spells the target with varying spans
    lp = np.full((T, 1, V), np.log(0.01 / (V - 1)), np.float32)
    spans = [(1, 4, ids[0]), (6, 9, ids[1]), (11, 14, ids[2])]
    for t in range(T):
        c = 0
        for lo, hi, cid in spans:
            if lo <= t < hi:
                c = cid
        lp[t, 0, c] = np.log(0.99)
    lp = lp - np.log(np.exp(lp).sum(-1, keepdims=True))

    out = e2e.ctc_forced_alignment(
        lp, np.array([ids], np.int32), np.array([T], np.int32),
        np.array([len(ids)], np.int32),
    )
    labels = np.asarray(out.labels)[:, 0]
    print(f"aligning {text!r}, best-path logp = {float(out.scores[0]):.2f}")
    for t in range(T):
        sym = alphabet.symbols[labels[t]] if labels[t] > 0 else "·"
        print(f"frame {t:2d}: {sym}")


if __name__ == "__main__":
    main()
