"""Quantify QuantizedBigramGuide steering degradation (VERDICT r4 weak #6).

The class guide steers mid-chunk pruning with CLASS-MEAN bigram rows, so
steering quality degrades as contexts inside a class get heterogeneous —
scores never do (exact replay at chunk boundaries).  This measures that
degradation end-to-end, WER-style, on a synthetic world built to make the
LM matter:

  * a V=80 char bigram whose context rows come from `n_latent` latent
    patterns plus per-context noise (the heterogeneity knob),
  * transcripts sampled from that bigram, rendered as weakly peaked noisy
    lattices (acoustics alone are ambiguous),
  * chunked kernel decodes (chunk_t such that steering matters) with
    no guide / quantized guides at k classes / the exact-fusion XLA scan
    as the per-frame-steering reference.

Reported per configuration, against the exact fused scan:
  agree  — top-1 exact-match rate with the scan decode,
  deficit— mean fused-score shortfall (>= 0; scores are exact, so any
           gap is mid-chunk pruning loss),
  CER    — character error rate vs the true sampled transcript.

Run on CPU: JAX_PLATFORMS handled by the harness; ~1 min.
Usage: python scripts/measure_guide_quality.py [B] [T] [seed]
"""

import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax

if os.environ.get("E2E_TPU", "0") != "1":
    jax.config.update("jax_platforms", "cpu")

import numpy as np

from end2end_tpu import beam_search_decode
from end2end_tpu.ops.beam_chunked import beam_search_chunked_lm
from end2end_tpu.ops.lm import NGramLM, QuantizedBigramGuide
from end2end_tpu.utils.metrics import edit_distance


def heterogeneous_bigram(rng, v, n_latent=12, noise=1.5):
    """Bigram log-probs whose V context rows mix n_latent latent row
    patterns with per-context noise — quantization into k < n_latent
    classes is necessarily lossy, and `noise` controls how lossy."""
    latent = rng.standard_normal((n_latent, v)) * 2.5
    rows = latent[rng.integers(0, n_latent, v)]
    rows = rows + noise * rng.standard_normal((v, v))
    rows = rows - np.log(np.sum(np.exp(rows), axis=1, keepdims=True))
    return rows.astype(np.float32)


def sample_transcripts(rng, big, b, s):
    start = np.exp(big).mean(axis=0)
    start /= start.sum()
    out = np.zeros((b, s), np.int32)
    for i in range(b):
        c = rng.choice(big.shape[0], p=start)
        for j in range(s):
            out[i, j] = c
            p = np.exp(big[c])
            c = rng.choice(big.shape[0], p=p / p.sum())
    return out


def render_lattice(rng, tgt, t, v, peak=2.6, noise=0.8):
    """Weakly peaked lattice: the true char is favored but not decisive,
    so per-frame LM steering decides ties."""
    b, s = tgt.shape
    lp = noise * rng.standard_normal((b, t, v)).astype(np.float32)
    span = t // s
    for i in range(b):
        for j in range(s):
            lp[i, j * span: (j + 1) * span, tgt[i, j]] += peak
    lp = lp - np.log(np.sum(np.exp(lp), axis=-1, keepdims=True))
    return np.moveaxis(lp, 0, 1).astype(np.float32)  # (T, B, V)


def main(b=24, t=60, seed=0):
    rng = np.random.default_rng(seed)
    v, s, w = 80, 10, 8
    big = heterogeneous_bigram(rng, v)
    lm = NGramLM(big)
    tgt = sample_transcripts(rng, big, b, s)
    lp = render_lattice(rng, tgt, t, v)
    il = np.full(b, t, np.int32)
    kw = dict(beam_width=w, prune_k=16, lm=lm, lm_alpha=1.0, lm_beta=0.0)

    st, slen, ss = beam_search_decode(lp, il, implementation="xla", **kw)
    ref = [np.asarray(st)[i, 0, : int(slen[i, 0])].tolist()
           for i in range(b)]

    def stats(toks, lens, scores):
        hyp = [np.asarray(toks)[i, 0, : int(lens[i, 0])].tolist()
               for i in range(b)]
        agree = np.mean([h == r for h, r in zip(hyp, ref)])
        scan_cer = (sum(edit_distance(h, r) for h, r in zip(hyp, ref))
                    / max(sum(len(r) for r in ref), 1))
        deficit = float(np.mean(np.asarray(ss)[:, 0]
                                - np.asarray(scores)[:, 0]))
        errs = sum(edit_distance(h, tgt[i, :].tolist())
                   for i, h in enumerate(hyp))
        return agree, scan_cer, deficit, errs / (b * s)

    rows = []
    out = beam_search_chunked_lm(lp, il, chunk_t=16, **kw)
    rows.append(("chunked, no guide", *stats(*out[:3])))
    for k in (4, 16, 63):
        guide = QuantizedBigramGuide.from_bigram(lm, n_classes=k, seed=0)
        out = beam_search_chunked_lm(lp, il, chunk_t=16, guide_lm=guide,
                                     **kw)
        rows.append((f"quantized guide k={k}", *stats(*out[:3])))
    rows.append(("exact per-frame scan", *stats(st, slen, ss)))

    print(f"\nB={b} T={t} V={v} beam={w} chunk_t=16 "
          f"(scan CER is the steering-quality ceiling)")
    print(f"{'config':24s} {'agree':>7s} {'vs-scan':>8s} "
          f"{'deficit':>9s} {'CER':>7s}")
    for name, agree, scan_cer, deficit, cer_ in rows:
        print(f"{name:24s} {agree:7.2%} {scan_cer:8.2%} "
              f"{deficit:9.4f} {cer_:7.2%}")
    return rows


if __name__ == "__main__":
    args = [int(a) for a in sys.argv[1:4]]
    main(*args)
