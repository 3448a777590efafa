"""PyTorch-CPU RNN-T loss+grad baseline for BASELINE.md.

torch ships no transducer loss (torchaudio, which has one, is not in this
environment), so the comparator is the best practical PURE-torch
implementation: the same diagonal-wavefront DP the TPU path uses
(ops/rnnt_loss.py) — one skew gather, T+U vectorized logaddexp steps over
(N, U+1) rows, autograd backward.  This is deliberately the FAST torch
formulation (a per-(t, u) Python loop is ~50x slower still), so the
bench.py vs_baseline ratio is honest.

Validates against utils/rnnt_reference.rnnt_loss_ref (f64 loops) before
timing.  Run on an otherwise idle box: `python scripts/baseline_rnnt_torch.py`.
"""

import sys
import time

import jax

# CPU baseline: must precede any device use (repo imports build jnp
# constants at import time, which would otherwise initialize — and, while
# the tunnel is down, hang on — the axon TPU backend).
jax.config.update("jax_platforms", "cpu")

import numpy as np
import torch

sys.path.insert(0, "/root/repo")

NEG = -1e30


def rnnt_nll_torch(logits, targets, il, ul, blank=0):
    """(N, T, U+1, V) logits -> (N,) NLL, autograd-differentiable."""
    n, t_max, up, v = logits.shape
    lp = torch.log_softmax(logits, dim=-1)
    b_pl = lp[..., blank]                                   # (N, T, U+1)
    y_ext = torch.cat(
        [targets.long(), torch.zeros(n, up - targets.shape[1],
                                     dtype=torch.long)], dim=1)
    l_pl = lp.gather(3, y_ext[:, None, :, None].expand(
        n, t_max, up, 1)).squeeze(3)
    u_ok = torch.arange(up)[None] < ul[:, None]
    l_pl = torch.where(u_ok[:, None], l_pl, torch.full_like(l_pl, NEG))

    # skew: sk[d][n, u] = plane[n, d-u, u]
    d_total = t_max + up - 1
    d_idx = torch.arange(d_total)[:, None]
    u_idx = torch.arange(up)[None, :]
    t_idx = d_idx - u_idx
    valid = (t_idx >= 0) & (t_idx < t_max)
    flat = (t_idx.clamp(0, t_max - 1) * up + u_idx).reshape(-1)
    sk_b = b_pl.reshape(n, -1)[:, flat].reshape(n, d_total, up)
    sk_b = torch.where(valid[None], sk_b, torch.full_like(sk_b, NEG))
    sk_l = l_pl.reshape(n, -1)[:, flat].reshape(n, d_total, up)
    sk_l = torch.where(valid[None], sk_l, torch.full_like(sk_l, NEG))

    a = torch.full((n, up), NEG, dtype=lp.dtype)
    a[:, 0] = 0.0
    diags = [a]
    pad = torch.full((n, 1), NEG, dtype=lp.dtype)
    for d in range(1, d_total):
        blank_in = diags[-1] + sk_b[:, d - 1]
        lab_in = (torch.cat([pad, diags[-1][:, :-1]], dim=1)
                  + torch.cat([pad, sk_l[:, d - 1, :-1]], dim=1))
        diags.append(torch.logaddexp(blank_in, lab_in))
    alpha = torch.stack(diags, dim=1)                       # (N, D, U+1)
    d_term = (il - 1 + ul).long()
    nb = torch.arange(n)
    return -(alpha[nb, d_term, ul.long()] + b_pl[nb, (il - 1).long(),
                                                 ul.long()])


def validate():
    from end2end_tpu.utils.rnnt_reference import rnnt_loss_ref

    rng = np.random.default_rng(0)
    n, t, u, v = 3, 12, 5, 7
    logits = rng.standard_normal((n, t, u + 1, v)).astype(np.float64)
    tgt = rng.integers(1, v, (n, u))
    il = np.array([t, t - 3, t - 1])
    ul = np.array([u, 2, 4])
    x = torch.tensor(logits, requires_grad=True)
    nll = rnnt_nll_torch(x, torch.tensor(tgt), torch.tensor(il),
                         torch.tensor(ul))
    nll.sum().backward()
    lp = torch.log_softmax(torch.tensor(logits), -1).numpy()
    ref, ref_g = rnnt_loss_ref(lp, tgt, il, ul)
    assert np.abs(nll.detach().numpy() - ref).max() < 1e-8, "loss mismatch"
    print(f"validated vs f64 oracle: max |dnll| = "
          f"{np.abs(nll.detach().numpy() - ref).max():.2e}")


def bench(n=8, t=400, u=80, v=256, iters=3):
    torch.set_num_threads(1)
    rng = np.random.default_rng(0)
    logits = torch.tensor(
        rng.standard_normal((n, t, u + 1, v)).astype(np.float32),
        requires_grad=True)
    tgt = torch.tensor(rng.integers(1, v, (n, u)))
    il = torch.tensor(np.full(n, t))
    ul = torch.tensor(np.full(n, u))
    # warmup
    rnnt_nll_torch(logits, tgt, il, ul).mean().backward()
    times = []
    for _ in range(iters):
        logits.grad = None
        t0 = time.perf_counter()
        rnnt_nll_torch(logits, tgt, il, ul).mean().backward()
        times.append(time.perf_counter() - t0)
    dt = float(np.median(times))
    cells = n * t * (u + 1)
    print(f"torch-CPU rnnt loss+grad B={n},T={t},U={u},V={v}: "
          f"{dt * 1e3:.1f} ms/iter, {cells / dt / 1e6:.3f} M lattice "
          f"cells/s, {n / dt:.2f} seq/s")


def _np_gru_step(params, h, tok):
    """NumPy twin of ops/neural_lm.gru_step (host-loop baseline)."""
    def sig(x):
        return 1.0 / (1.0 + np.exp(-x))

    x = params["emb"][tok]
    xh = np.concatenate([x, h])
    z = sig(xh @ params["wz"] + params["bz"])
    r = sig(xh @ params["wr"] + params["br"])
    xrh = np.concatenate([x, r * h])
    cand = np.tanh(xrh @ params["wh"] + params["bh"])
    return (1.0 - z) * h + z * cand


def _np_joint_lp(f_vec, h, mats):
    w_enc, w_pred, b_j, w_out, b_out = mats
    z = np.tanh(f_vec @ w_enc + h @ w_pred + b_j)
    logits = z @ w_out + b_out
    m = logits.max()
    return logits - m - np.log(np.exp(logits - m).sum())


def _decode_setup(n, t, v, h_enc=256, emb=128, hid=256, jdim=256, seed=0):
    """Mirrors bench.py::_rnnt_decoder exactly (same RNG stream)."""
    rng = np.random.default_rng(seed)
    enc = rng.normal(size=(n, t, h_enc)).astype(np.float32)
    from end2end_tpu.ops.neural_lm import random_gru_params

    params = random_gru_params(rng, v, emb_dim=emb, hidden_dim=hid)

    def w(*shape):
        return (rng.standard_normal(shape) * 0.5
                / np.sqrt(shape[0])).astype(np.float32)

    mats = (w(h_enc, jdim), w(hid, jdim), 0.1 * w(jdim), w(jdim, v),
            0.1 * w(v))
    init_h = np.zeros((hid,), np.float32)
    return enc, params, init_h, mats


def bench_decode(n=16, t=400, v=256, W=4, s_cap=128, blank=0):
    """Per-sample host-loop decode baselines (pure NumPy — the
    reference-class Python formulation, same convention as the CTC
    pure-Python beam baseline in BASELINE.md)."""
    enc, params, init_h, mats = _decode_setup(n, t, v)

    # --- greedy ----------------------------------------------------------
    t0 = time.perf_counter()
    for b in range(n):
        h, tt, syms, toks = init_h, 0, 0, []
        while tt < t:
            lp = _np_joint_lp(enc[b, tt], h, mats)
            k = int(np.argmax(lp))
            if k == blank or syms >= 4 or len(toks) >= s_cap:
                tt += 1
                syms = 0
            else:
                toks.append(k)
                h = _np_gru_step(params, h, k)
                syms += 1
    dt = time.perf_counter() - t0
    print(f"numpy-CPU rnnt greedy B={n},T={t},V={v},GRU-256: "
          f"{dt / n * 1e3:.1f} ms/seq, {n / dt:.2f} seq/s")

    # --- ALSD beam (dict merging, K = 2W candidates) ---------------------
    K = 2 * W
    t0 = time.perf_counter()
    for b in range(n):
        live = {(): (0.0, init_h)}
        finished = {}
        for d in range(t + s_cap):
            cand, hid = {}, {}

            def add(key, s, h=None):
                if key in cand:
                    cand[key] = np.logaddexp(cand[key], s)
                else:
                    cand[key] = s
                    if h is not None:
                        hid[key] = h

            for p, s in finished.items():
                add(("F",) + p, s)
            for p, (s, h) in live.items():
                tt = d - len(p)
                lp = _np_joint_lp(enc[b, tt], h, mats)
                if tt + 1 >= t:
                    add(("F",) + p, s + lp[blank])
                else:
                    add(p, s + lp[blank], h)
                if len(p) < s_cap:
                    nb = np.argsort(-np.delete(lp, blank))[:K]
                    nb = nb + (nb >= blank)
                    for k in nb:
                        add(p + (int(k),), s + lp[k],
                            _np_gru_step(params, h, int(k)))
            keep = sorted(cand, key=lambda key: -cand[key])[:W]
            live, new_fin = {}, {}
            for key in keep:
                if key and key[0] == "F":
                    new_fin[key[1:]] = cand[key]
                else:
                    live[key] = (cand[key], hid[key])
            finished = new_fin
            if not live:
                break
        if b == 0:
            dt1 = time.perf_counter() - t0
            print(f"  (beam: first sample {dt1 * 1e3:.0f} ms)")
    dt = time.perf_counter() - t0
    print(f"numpy-CPU rnnt ALSD beam-{W} B={n},T={t},V={v},GRU-256: "
          f"{dt / n * 1e3:.1f} ms/seq, {n / dt:.3f} seq/s")


def bench_decode_rt(n=16, t=400, v=256, s_cap=128, blank=0, bias=1.1):
    """Greedy host-loop baseline on the BLANK-DOMINATED (realistic ASR)
    workload: same setup/RNG stream as bench.py::_rnnt_decoder with
    `blank_bias` added to the joint's blank output bias, giving a ~5-10%
    emission rate instead of the emission-saturated random joint."""
    enc, params, init_h, mats = _decode_setup(n, t, v)
    w_enc, w_pred, b_j, w_out, b_out = mats
    b_out = b_out.copy()
    b_out[blank] += bias
    mats = (w_enc, w_pred, b_j, w_out, b_out)

    emitted = 0
    t0 = time.perf_counter()
    for b in range(n):
        h, tt, syms, toks = init_h, 0, 0, []
        while tt < t:
            lp = _np_joint_lp(enc[b, tt], h, mats)
            k = int(np.argmax(lp))
            if k == blank or syms >= 4 or len(toks) >= s_cap:
                tt += 1
                syms = 0
            else:
                toks.append(k)
                h = _np_gru_step(params, h, k)
                syms += 1
        emitted += len(toks)
    dt = time.perf_counter() - t0
    print(f"numpy-CPU rnnt greedy-rt B={n},T={t},V={v},GRU-256,"
          f"bias={bias}: {dt / n * 1e3:.1f} ms/seq, {n / dt:.2f} seq/s "
          f"(emission rate {emitted / (n * t):.3f})")


def bench_decode_beam_rt(n=16, t=400, v=256, W=4, s_cap=128, blank=0,
                         bias=1.1):
    """ALSD dict-beam host-loop baseline on the BLANK-DOMINATED workload
    (same blank-biased joint as bench_decode_rt; same dict-beam code as
    bench_decode) — comparator for bench.py's bench_rnnt_beam_rt harness
    (row withdrawn 2026-08-20; see STATUS.md known-gaps)."""
    enc, params, init_h, mats = _decode_setup(n, t, v)
    w_enc, w_pred, b_j, w_out, b_out = mats
    b_out = b_out.copy()
    b_out[blank] += bias
    mats = (w_enc, w_pred, b_j, w_out, b_out)

    K = 2 * W
    t0 = time.perf_counter()
    for b in range(n):
        live = {(): (0.0, init_h)}
        finished = {}
        for d in range(t + s_cap):
            cand, hid = {}, {}

            def add(key, s, h=None):
                if key in cand:
                    cand[key] = np.logaddexp(cand[key], s)
                else:
                    cand[key] = s
                    if h is not None:
                        hid[key] = h

            for p, s in finished.items():
                add(("F",) + p, s)
            for p, (s, h) in live.items():
                tt = d - len(p)
                lp = _np_joint_lp(enc[b, tt], h, mats)
                if tt + 1 >= t:
                    add(("F",) + p, s + lp[blank])
                else:
                    add(p, s + lp[blank], h)
                if len(p) < s_cap:
                    nb = np.argsort(-np.delete(lp, blank))[:K]
                    nb = nb + (nb >= blank)
                    for k in nb:
                        add(p + (int(k),), s + lp[k],
                            _np_gru_step(params, h, int(k)))
            keep = sorted(cand, key=lambda key: -cand[key])[:W]
            live, new_fin = {}, {}
            for key in keep:
                if key and key[0] == "F":
                    new_fin[key[1:]] = cand[key]
                else:
                    live[key] = (cand[key], hid[key])
            finished = new_fin
            if not live:
                break
        if b == 0:
            dt1 = time.perf_counter() - t0
            print(f"  (beam-rt: first sample {dt1 * 1e3:.0f} ms)")
    dt = time.perf_counter() - t0
    print(f"numpy-CPU rnnt ALSD beam-{W} RT B={n},T={t},V={v},GRU-256,"
          f"bias={bias}: {dt / n * 1e3:.1f} ms/seq, {n / dt:.3f} seq/s")


def bench_fused(n=8, t=400, u=80, v=4096, j=128, tc=16, iters=1):
    """Chunked fused-joint loss+grad in torch (the V=32768 bench config's
    materialized joint is ~34 GB, infeasible even for the baseline, so the
    torch comparator uses the SAME chunked-planes trick: per-chunk logits
    -> log_softmax -> blank/label planes -> the wavefront DP; autograd
    through chunks via torch.utils.checkpoint).  Measured at V=4096 (one
    iter is minutes); the V=32768 baseline constant extrapolates linearly
    in V (the joint matmul dominates and is linear in V)."""
    from torch.utils.checkpoint import checkpoint as ckpt
    torch.set_num_threads(1)
    rng = np.random.default_rng(0)
    enc_p = torch.tensor(rng.standard_normal((n, t, j)).astype(np.float32),
                         requires_grad=True)
    pred_p = torch.tensor(
        rng.standard_normal((n, u + 1, j)).astype(np.float32),
        requires_grad=True)
    w_out = torch.tensor(
        (rng.standard_normal((j, v)) / np.sqrt(j)).astype(np.float32),
        requires_grad=True)
    tgt = torch.tensor(rng.integers(1, v, (n, u)))
    il = torch.tensor(np.full(n, t)); ul = torch.tensor(np.full(n, u))
    y_ext = torch.cat([tgt.long(), torch.zeros(n, 1, dtype=torch.long)], 1)

    def chunk_planes(enc_c, pred_p, w_out):
        logits = torch.tanh(enc_c[:, :, None, :] + pred_p[:, None]) @ w_out
        lp = torch.log_softmax(logits, dim=-1)
        b_c = lp[..., 0]
        l_c = lp.gather(3, y_ext[:, None, :, None].expand(
            n, enc_c.shape[1], u + 1, 1)).squeeze(3)
        return b_c, l_c

    def loss():
        bs, ls = [], []
        for c0 in range(0, t, tc):
            b_c, l_c = ckpt(chunk_planes, enc_p[:, c0:c0 + tc], pred_p,
                            w_out, use_reentrant=False)
            bs.append(b_c); ls.append(l_c)
        b_pl = torch.cat(bs, 1); l_pl = torch.cat(ls, 1)
        u_ok = torch.arange(u + 1)[None] < ul[:, None]
        l_pl = torch.where(u_ok[:, None], l_pl, torch.full_like(l_pl, NEG))
        # wavefront DP over the planes (same recurrence as rnnt_nll_torch);
        # all lengths are full here, so the terminal node (t-1, u) sits on
        # the last computed diagonal d_total - 1 = t - 1 + u.
        d_total = t + u
        a = torch.full((n, u + 1), NEG); a[:, 0] = 0.0
        pad = torch.full((n, 1), NEG)
        for d in range(1, d_total):
            td = (d - 1) - torch.arange(u + 1)
            ok = (td >= 0) & (td < t)
            idx = (td.clamp(0, t - 1) * (u + 1)
                   + torch.arange(u + 1))[None].expand(n, -1)
            skb = torch.where(ok[None], b_pl.reshape(n, -1).gather(1, idx),
                              torch.full((n, u + 1), NEG))
            skl = torch.where(ok[None], l_pl.reshape(n, -1).gather(1, idx),
                              torch.full((n, u + 1), NEG))
            blank_in = a + skb
            lab_in = (torch.cat([pad, a[:, :-1]], 1)
                      + torch.cat([pad, skl[:, :-1]], 1))
            a = torch.logaddexp(blank_in, lab_in)
        nb = torch.arange(n)
        return -(a[nb, ul.long()] + b_pl[nb, (il - 1).long(), ul.long()])

    # timing only (correctness of the DP is covered by rnnt_nll_torch)
    loss().sum().backward()  # warmup + autograd graph exercise
    times = []
    for _ in range(iters):
        enc_p.grad = w_out.grad = None
        t0 = time.perf_counter()
        loss().sum().backward()
        times.append(time.perf_counter() - t0)
    dt = float(np.median(times))
    cells = n * t * (u + 1)
    print(f"torch-CPU fused rnnt loss+grad B={n},T={t},U={u},V={v},J={j}: "
          f"{dt:.1f} s/iter, {cells / dt / 1e6:.4f} M cells/s "
          f"(extrapolate x{32768 // v} for V=32768: "
          f"{cells / dt / (32768 / v) / 1e6:.4f} M cells/s)")


if __name__ == "__main__":
    if "--decode-beam-rt" in sys.argv:
        bench_decode_beam_rt()
    elif "--decode-rt" in sys.argv:
        bench_decode_rt()
    elif "--decode" in sys.argv:
        bench_decode()
    elif "--fused" in sys.argv:
        bench_fused()
    else:
        validate()
        bench()
