"""Fused Pallas TPU kernel for CTC prefix beam search — the default TPU path.

Rebuild of the reference's C++ prefix beam-search decoder (SURVEY.md §3.1 N3)
as a real TPU kernel.  The XLA-scan decoder (beam_search.py) keeps full
generality (LM fusion, any width) and remains the fallback; `'auto'` in
`beam_search_decode` routes here on TPU when this kernel applies.

Layout (the round-2 "beam-in-sublane" redesign): beam state lives in VMEM as
(W, B) arrays — beams in SUBLANES, batch in the 128 LANES — and per-frame
extension candidates as (K, W, B) with the top-K candidate index in the
leading (vreg-unrolled) dimension.  Consequences:

  * spreading a per-beam scalar to its K candidates is a free broadcast
    (the round-1 kernel burned ~90 masked cross-lane reduces per frame on
    exactly this);
  * reductions over candidates are K elementwise vreg ops (leading dim)
    plus one cheap sublane reduce — no 128-lane shuffles;
  * the whole batch tile (128 sequences) advances one frame per iteration.

The kernel emits per-frame BACKPOINTER CODES (in the same candidate order the
XLA scan ranks, so tie-breaks match): code w in [0, W) = "stay" of beam w;
code W + w*K + k = "extend beam w with its k-th top-K candidate".  Token
matrices are reconstructed OUTSIDE the kernel in one fused XLA program: the
per-frame parent maps compose associatively (lane_after[t] =
parent_map[t+1][lane_after[t+1]]), so a `jax.lax.associative_scan` over
function composition replaces the sequential backtrace — no host round-trip,
no while loop, and the full decode stays jittable end to end.

Semantics: identical algorithm to beam_search.py (stay/extend candidates,
hash-based prefix merging with logaddexp — never max, per SURVEY.md §6.3 —
masked top-W by repeated argmax) with ONE extra prune: the repeat-last
("stay") term reads the last symbol's frame probability from the current
top-K candidate set.  When prune_k >= V this is EXACT; with pruning it is
one more assumption of the same character as prune_k itself.  The top-K prep
keeps blank in the candidate list (masked in-kernel) so K-slot ordering and
tie-breaking match the XLA scan bit for bit.

In-kernel LM fusion (dense bigram): for `NGramLM` instances with a small
context table (vocab + 1 <= 64 rows — the char-CTC + character/word-piece
LM regime the reference uses KenLM for), the kernel fuses shallow-fusion
scoring directly into the beam step.  The per-candidate LM increments
`alpha * log p_LM(ck | last) + beta` are gathered OUTSIDE the kernel into a
per-frame (context-row, candidate) table (the gather is over the static LM
table, so XLA does it in one take); in-kernel each beam selects its
context row with a static select-loop over the <= 64 rows (per-lane dynamic
gather does not exist on the VPU, but a select ladder over a few dozen rows
is ~500 vreg-ops/frame).  The accumulated LM bonus rides in a `(W, B)`
scratch register exactly like the XLA scan's `lm_score` carry; ranking,
merging and the final </s> bonus reproduce the XLA scan's semantics.
Higher-order / hashed / word-level LMs still fall back to the XLA scan.

Constraints: beam_width <= 32, prune_k <= 128, float32; LM fusion limited
to dense `NGramLM` with vocab + 1 <= 64 (auto mode falls back to the XLA
scan otherwise, with a logged reason).
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .fastmath import exp32, log1p32
from .semiring import LOG0, LOG0_THRESHOLD

_M1 = np.int32(-1640531535)  # 2654435761 with int32 wraparound semantics
_M2 = np.int32(-2048144789)  # 0x85EBCA6B
_SEED1 = np.int32(1)
_SEED2 = np.int32(7)
_DEADBASE = np.int32(0x7EAD0000)
_NOPARENT = np.int32(0x5EED0000)  # parent-prefix hash that matches nothing
_BIG = np.int32(1 << 30)

_LANES = 128  # batch tile width
_N_STATE = 10  # per-beam state: pb pnb h1 h2 hp1 hp2 last len lm lcls


def _laddexp2(a, b):
    m = jnp.maximum(a, b)
    m_safe = jnp.maximum(m, LOG0)
    d = jnp.maximum(-jnp.abs(a - b), LOG0)
    out = m_safe + log1p32(exp32(d))
    return jnp.where(m > LOG0_THRESHOLD, out, LOG0)


def _pad_up(x, m):
    return (x + m - 1) // m * m


def _beam_kernel(W, K, s_cap, blank, n_ctx, resume, ext_k, use_cls, *refs):
    n_in = (4 + (1 if n_ctx else 0) + (1 if use_cls else 0)
            + (_N_STATE if resume else 0))
    n_out = 3 + (_N_STATE if resume else 0)
    in_refs, out_refs = refs[:n_in], refs[n_in:n_in + n_out]
    (pb_s, pnb_s, h1_s, h2_s, hp1_s, hp2_s, last_s, len_s,
     lm_s, lcls_s) = refs[n_in + n_out:]
    if use_cls:  # quantized-context guide: LM block keyed by CONTEXT CLASS
        # (row id = class of the beam's last symbol, tracked in lcls_s from
        # the streamed per-candidate class ids) instead of the symbol id —
        # lifts the <= 64-context-row cap to arbitrary vocabularies.
        lpk_ref, ck_ref, lpb_ref, il_ref, lm_ref, cls_ref = in_refs[:6]
    elif n_ctx:  # in-kernel LM fusion: one extra block of LM increments
        lpk_ref, ck_ref, lpb_ref, il_ref, lm_ref = in_refs[:5]
    else:
        lpk_ref, ck_ref, lpb_ref, il_ref = in_refs[:4]
    bp_ref, score_ref, last_ref = out_refs[:3]
    i = pl.program_id(1)  # time chunk (sequential; batch tile is dim 0)
    tc_len, _, b = lpk_ref.shape
    w_iota = jax.lax.broadcasted_iota(jnp.int32, (W, b), 0)
    k_iota2 = jax.lax.broadcasted_iota(jnp.int32, (K, b), 0)
    k_iota3 = jax.lax.broadcasted_iota(jnp.int32, (ext_k, W, b), 0)
    w_iota3 = jax.lax.broadcasted_iota(jnp.int32, (ext_k, W, b), 1)
    # Does candidate ranking carry an LM bonus?  True with in-kernel fusion
    # (n_ctx) and in resume/chunked mode, where the bonus accumulated by
    # earlier chunks steers this chunk's pruning (per-frame increments are
    # then zero; the XLA side adds each chunk's emissions post hoc).
    track_lm = bool(n_ctx) or resume
    # Candidate codes in the XLA scan's ranking order (ties break identically):
    # stay candidates first (code = w), then extends row-major (W + w*K + k).
    code_ext = W + w_iota3 * ext_k + k_iota3  # (ext_k, W, b)
    code_stay = w_iota                    # (W, b)

    @pl.when(i == 0)
    def _():
        if resume:  # chunked decode: continue from the carried-in state
            (pb_i, pnb_i, h1_i, h2_i, hp1_i, hp2_i, last_i, len_i,
             lm_i, lcls_i) = in_refs[n_in - _N_STATE:]
            pb_s[:] = pb_i[:]
            pnb_s[:] = pnb_i[:]
            h1_s[:] = h1_i[:]
            h2_s[:] = h2_i[:]
            hp1_s[:] = hp1_i[:]
            hp2_s[:] = hp2_i[:]
            last_s[:] = last_i[:]
            len_s[:] = len_i[:]
            lm_s[:] = lm_i[:]
            lcls_s[:] = lcls_i[:]
        else:
            live0 = w_iota == 0
            pb_s[:] = jnp.where(live0, 0.0, LOG0)
            pnb_s[:] = jnp.full((W, b), LOG0, jnp.float32)
            h1_s[:] = jnp.where(live0, _SEED1, _DEADBASE + w_iota)
            h2_s[:] = jnp.where(live0, _SEED2, _DEADBASE + w_iota)
            hp1_s[:] = _NOPARENT + w_iota  # the empty prefix has no parent
            hp2_s[:] = _NOPARENT + w_iota
            last_s[:] = jnp.full((W, b), -1, jnp.int32)
            len_s[:] = jnp.zeros((W, b), jnp.int32)
            lm_s[:] = jnp.zeros((W, b), jnp.float32)
            lcls_s[:] = jnp.full((W, b), -1, jnp.int32)

    il = il_ref[:]  # (1, b)

    def body(tc, _):
        t = i * tc_len + tc
        lpk = lpk_ref[tc]  # (K, b) f32 top-K log-probs (full vocab)
        ck = ck_ref[tc]    # (K, b) i32 top-K token ids (pad -2)
        lpb = lpb_ref[tc]  # (1, b) blank log-prob
        pb, pnb = pb_s[:], pnb_s[:]
        h1, h2 = h1_s[:], h2_s[:]
        hp1, hp2 = hp1_s[:], hp2_s[:]
        last, lens = last_s[:], len_s[:]
        lms = lm_s[:]  # (W, b) accumulated alpha*lm + beta bonus
        total = _laddexp2(pb, pnb)  # (W, b)

        # Extension candidates come from the first ext_k slots; the STAY
        # lookup below reads ALL K streamed slots — with the default 2x
        # window (beam_search_pallas stay_k) a repeat demoted just past
        # the extension prune line keeps its exact frame probability
        # (round-4 mitigation; the optimistic-floor alternative was tried
        # and REJECTED: it inflates weak repeats and LOWERED adversarial
        # top-1 agreement 31/32 -> 27/32, measured 2026-08-19).
        lpk_all = lpk[:, None, :]   # (K, 1, b)
        same_all = ck[:, None, :] == last[None]
        # NB: x[:ext_k, None, :] routes through jnp's gather path, which
        # Mosaic cannot lower — slice and expand in two steps.
        lpk3 = jax.lax.slice_in_dim(lpk, 0, ext_k, axis=0)[:, None, :]
        ck3 = jax.lax.slice_in_dim(ck, 0, ext_k, axis=0)[:, None, :]
        same = ck3 == last[None]  # (ext_k, W, b)

        # --- stay candidates: same prefix ---------------------------------
        # repeat-last probability read over the FULL streamed window
        rep = jnp.max(jnp.where(same_all, lpk_all, LOG0), axis=0)  # (W, b)
        pb_stay = total + lpb
        pnb_stay = jnp.where(last >= 0, pnb + rep, LOG0)

        # --- extend candidates: prefix + c ---------------------------------
        ext_pnb = jnp.where(same, pb[None], total[None]) + lpk3  # (K, W, b)
        ok = (ck3 >= 0) & (ck3 != blank) & (lens[None] < s_cap)
        ext_pnb = jnp.where(ok, ext_pnb, LOG0)

        # --- per-candidate LM increment: alpha*lm(ck|last) + beta ----------
        # lm_ref[tc] rows are context ids (row n_ctx-1 = start-of-sequence);
        # each beam picks its row with a select ladder over the <= 64 rows.
        # Unrolled at narrow widths (fastest); at W > 16 the unrolled
        # ladder's code size exceeds Mosaic's compile limits (the round-2
        # W <= 16 LM cap), so wide beams run the same ladder as a
        # fori_loop — constant code size, identical numerics.
        if n_ctx:
            if use_cls:
                lcls = lcls_s[:]
                ctx = jnp.where(last >= 0, lcls, n_ctx - 1)  # (W, b)
            else:
                ctx = jnp.where(last >= 0, last, n_ctx - 1)  # (W, b)
            delta0 = jnp.zeros((ext_k, W, b), jnp.float32)
            if W <= 16:
                delta = delta0
                for c in range(n_ctx):
                    row = jax.lax.slice_in_dim(lm_ref[tc, c], 0, ext_k,
                                               axis=0)
                    delta = jnp.where((ctx == c)[None], row[:, None, :],
                                      delta)
            else:
                def lm_row(c, acc):
                    row = jax.lax.slice_in_dim(lm_ref[tc, c], 0, ext_k,
                                               axis=0)
                    return jnp.where((ctx == c)[None], row[:, None, :],
                                     acc)

                delta = jax.lax.fori_loop(0, n_ctx, lm_row, delta0)
            lm_tot = lms[None] + delta  # (K, W, b) candidate total bonus
        elif track_lm:
            # resume/chunked mode without in-kernel increments: every
            # candidate inherits its parent beam's accumulated bonus
            lm_tot = lms[None]  # (1, W, b), broadcasts over K

        # --- merge extends that recreate an existing beam's prefix --------
        # A beam w can receive merges ONLY from extensions of its unique
        # PARENT prefix (prefix(w) minus its last token) with token last[w]:
        # beams are distinct prefixes and top-K tokens are distinct, so the
        # merge source is at most ONE candidate.  Tracking each beam's
        # parent-prefix hash (hp) collapses the old O(W^2 K) masked
        # logsumexps to O(W) selects: merge_add[w] = base(parent) + rep[w],
        # bit-identical to the pairwise-hash formulation absent collisions.
        merge_add = jnp.full((W, b), LOG0, jnp.float32)
        for w in range(W):
            bm = (
                (h1 == hp1[w:w + 1]) & (h2 == hp2[w:w + 1])
                & (lens < s_cap)
            )  # (W, b): which beam is w's parent (at most one)
            last_w = last[w:w + 1]  # (1, b)
            base = jnp.where(last == last_w, pb, total)
            val = jnp.sum(jnp.where(bm, base, 0.0), axis=0, keepdims=True)
            hit = jnp.max(bm.astype(jnp.int32), axis=0, keepdims=True) > 0
            rep_w = rep[w:w + 1]
            add = jnp.where(
                hit & (rep_w > LOG0_THRESHOLD) & (val > LOG0_THRESHOLD),
                val + rep_w,
                LOG0,
            )
            merge_add = jnp.where(w_iota == w, add, merge_add)
            # remove the merged candidate from the extend pool
            rm = bm[None] & (ck3 == last_w[None]) & ok
            ext_pnb = jnp.where(rm, LOG0, ext_pnb)
        pnb_stay = _laddexp2(pnb_stay, merge_add)
        stay_score = _laddexp2(pb_stay, pnb_stay)

        # --- top-W by repeated argmax (first-index tie break, XLA order) ---
        # Ranking scores carry the LM bonus (like the XLA scan's cand_lm);
        # acoustic mass is selected separately from the unranked pools.
        if track_lm:
            cand_ext = ext_pnb + lm_tot
            cand_stay = stay_score + lms
        else:
            cand_ext = ext_pnb
            cand_stay = stay_score
        new_pb = jnp.full((W, b), LOG0, jnp.float32)
        new_pnb = jnp.full((W, b), LOG0, jnp.float32)
        new_lm = jnp.zeros((W, b), jnp.float32)
        new_h1 = _DEADBASE + w_iota
        new_h2 = _DEADBASE + w_iota
        new_hp1 = _NOPARENT + w_iota
        new_hp2 = _NOPARENT + w_iota
        new_last = jnp.full((W, b), -1, jnp.int32)
        new_len = jnp.zeros((W, b), jnp.int32)
        new_lcls = jnp.full((W, b), -1, jnp.int32)
        bp_row = code_stay
        for w_out in range(W):
            mx_e = jnp.max(jnp.max(cand_ext, axis=0), axis=0, keepdims=True)
            mx_s = jnp.max(cand_stay, axis=0, keepdims=True)
            mx = jnp.maximum(mx_e, mx_s)  # (1, b)
            sel_e = jnp.min(
                jnp.min(jnp.where(cand_ext >= mx[None], code_ext, _BIG),
                        axis=0),
                axis=0, keepdims=True,
            )
            sel_s = jnp.min(
                jnp.where(cand_stay >= mx, code_stay, _BIG),
                axis=0, keepdims=True,
            )
            code = jnp.minimum(sel_e, sel_s)  # (1, b)
            is_stay = code < W
            # decode (parent, k) from the selected candidate's onehot —
            # avoids integer div/rem inside the kernel
            oh_e = code_ext == code[None]  # (K, W, b); exact onehot when ext
            parent_e = jnp.sum(
                jnp.sum(jnp.where(oh_e, w_iota3, 0), axis=0),
                axis=0, keepdims=True,
            )
            parent = jnp.where(is_stay, code, parent_e)  # (1, b)
            kk = jnp.sum(
                jnp.sum(jnp.where(oh_e, k_iota3, 0), axis=0),
                axis=0, keepdims=True,
            )
            # kill the selected candidate
            cand_ext = jnp.where(oh_e, LOG0, cand_ext)
            cand_stay = jnp.where(
                is_stay & (code_stay == code), LOG0, cand_stay
            )
            # gather parent fields (one true sublane per column)
            psel = w_iota == parent
            pick_f = lambda f: jnp.sum(
                jnp.where(psel, f, 0.0), axis=0, keepdims=True
            )
            pick_i = lambda f: jnp.sum(
                jnp.where(psel, f, 0), axis=0, keepdims=True
            )
            h1p, h2p = pick_i(h1), pick_i(h2)
            hp1p, hp2p = pick_i(hp1), pick_i(hp2)
            lastp, lenp = pick_i(last), pick_i(lens)
            pb_sp, pnb_sp = pick_f(pb_stay), pick_f(pnb_stay)
            ck_k = jnp.sum(
                jnp.where(k_iota2 == kk, ck, 0), axis=0, keepdims=True
            )
            if use_cls:
                cls_k = jnp.sum(
                    jnp.where(k_iota2 == kk, cls_ref[tc], 0), axis=0,
                    keepdims=True,
                )
                n_lcls = jnp.where(is_stay, pick_i(lcls), cls_k)
            if track_lm:
                # acoustic mass / LM bonus of the selected ext candidate
                # (oh_e is exact-onehot; mx alone would include the bonus)
                ac_e = jnp.sum(
                    jnp.sum(jnp.where(oh_e, ext_pnb, 0.0), axis=0),
                    axis=0, keepdims=True,
                )
                lm_e = jnp.sum(
                    jnp.sum(jnp.where(oh_e, lm_tot, 0.0), axis=0),
                    axis=0, keepdims=True,
                )
                n_lm = jnp.where(is_stay, pick_f(lms), lm_e)
            else:
                ac_e = mx
                n_lm = jnp.zeros_like(mx)
            n_pb = jnp.where(is_stay, pb_sp, LOG0)
            n_pnb = jnp.where(is_stay, pnb_sp, ac_e)
            n_last = jnp.where(is_stay, lastp, ck_k)
            n_len = jnp.where(is_stay, lenp, lenp + 1)
            n_h1 = jnp.where(is_stay, h1p, h1p * _M1 + (ck_k + 1))
            n_h2 = jnp.where(is_stay, h2p, h2p * _M2 + (ck_k + 1))
            # an extension's parent prefix IS the parent beam's full prefix
            n_hp1 = jnp.where(is_stay, hp1p, h1p)
            n_hp2 = jnp.where(is_stay, hp2p, h2p)
            # Dead picks (score at log-zero) must carry NO state: when fewer
            # finite candidates than W exist, the argmax re-picks candidate
            # 0, whose pb/pnb are still finite — copying them would create a
            # zombie duplicate of a live beam that multiply-counts its mass.
            # Zero the mass and give slot-unique hashes so dead slots can
            # never merge with anything.
            dead = mx <= LOG0_THRESHOLD
            n_pb = jnp.where(dead, LOG0, n_pb)
            n_pnb = jnp.where(dead, LOG0, n_pnb)
            n_lm = jnp.where(dead, 0.0, n_lm)
            n_last = jnp.where(dead, -1, n_last)
            n_len = jnp.where(dead, 0, n_len)
            n_h1 = jnp.where(dead, _DEADBASE + w_out, n_h1)
            n_h2 = jnp.where(dead, _DEADBASE + w_out, n_h2)
            n_hp1 = jnp.where(dead, _NOPARENT + w_out, n_hp1)
            n_hp2 = jnp.where(dead, _NOPARENT + w_out, n_hp2)
            if use_cls:
                n_lcls = jnp.where(dead, -1, n_lcls)
                new_lcls = jnp.where(w_iota == w_out, n_lcls, new_lcls)
            dst = w_iota == w_out
            new_pb = jnp.where(dst, n_pb, new_pb)
            new_pnb = jnp.where(dst, n_pnb, new_pnb)
            new_lm = jnp.where(dst, n_lm, new_lm)
            new_h1 = jnp.where(dst, n_h1, new_h1)
            new_h2 = jnp.where(dst, n_h2, new_h2)
            new_hp1 = jnp.where(dst, n_hp1, new_hp1)
            new_hp2 = jnp.where(dst, n_hp2, new_hp2)
            new_last = jnp.where(dst, n_last, new_last)
            new_len = jnp.where(dst, n_len, new_len)
            bp_row = jnp.where(dst, code, bp_row)

        upd = t < il  # (1, b) — freeze state past each sample's length
        pb_s[:] = jnp.where(upd, new_pb, pb)
        pnb_s[:] = jnp.where(upd, new_pnb, pnb)
        h1_s[:] = jnp.where(upd, new_h1, h1)
        h2_s[:] = jnp.where(upd, new_h2, h2)
        hp1_s[:] = jnp.where(upd, new_hp1, hp1)
        hp2_s[:] = jnp.where(upd, new_hp2, hp2)
        last_s[:] = jnp.where(upd, new_last, last)
        len_s[:] = jnp.where(upd, new_len, lens)
        if use_cls:
            lcls_s[:] = jnp.where(upd, new_lcls, lcls)
        if track_lm:
            lm_s[:] = jnp.where(upd, new_lm, lms)
        bp_ref[tc] = jnp.where(upd, bp_row, code_stay)
        return 0

    jax.lax.fori_loop(0, tc_len, body, 0)

    @pl.when(i == pl.num_programs(1) - 1)
    def _():
        score_ref[:] = _laddexp2(pb_s[:], pnb_s[:]) + lm_s[:]
        last_ref[:] = last_s[:]
        if resume:  # export the full carry for the next chunk
            (pb_o, pnb_o, h1_o, h2_o, hp1_o, hp2_o, last_o, len_o,
             lm_o, lcls_o) = out_refs[3:]
            pb_o[:] = pb_s[:]
            pnb_o[:] = pnb_s[:]
            h1_o[:] = h1_s[:]
            h2_o[:] = h2_s[:]
            hp1_o[:] = hp1_s[:]
            hp2_o[:] = hp2_s[:]
            last_o[:] = last_s[:]
            len_o[:] = len_s[:]
            lm_o[:] = lm_s[:]
            lcls_o[:] = lcls_s[:]


def _compose(a, b):
    """Lane-map composition for the reverse associative scan.

    `associative_scan(fn, x, reverse=True)` folds with the LAST element
    leftmost (r_t = fn(...fn(x_{T-1}, x_{T-2})..., x_t), verified
    empirically), so fn must apply its left argument FIRST for the suffix
    product to come out as g_t ∘ g_{t+1} ∘ ... ∘ g_{T-1}:
    fn(a, b)[w] = b[a[w]].  Compare-select ladder over the static beam dim
    (take_along_axis on a trailing axis is ~30x slower on TPU — see
    ops/indexing.py).
    """
    from .indexing import ladder_take

    return ladder_take(b, a)


def _backtrace(bp, ck, scores, W, K, s_cap, t_max, n):
    """Reconstruct token matrices from backpointer codes — one fused XLA
    program (associative lane-map composition instead of a sequential loop).

    bp: (t_pad, W, b_pad) codes; ck: (T, N, K) top-K ids; scores: (W, b_pad).
    """
    from .indexing import flat_take, ladder_take

    code = jnp.moveaxis(bp[:t_max, :, :n], 1, 2)  # (T, N, W)
    # parent lane chosen at frame t for each (post-t) beam lane
    g = jnp.where(code < W, code, (code - W) // K)  # (T, N, W)
    # suffix compositions: S[t] = g_t ∘ g_{t+1} ∘ ... ∘ g_{T-1};
    # the lane occupied AFTER frame t by final beam w is S[t+1][w]
    # (identity at t = T-1).
    s_comp = jax.lax.associative_scan(_compose, g, reverse=True, axis=0)
    ident = jnp.broadcast_to(
        jnp.arange(W, dtype=code.dtype), (1, n, W)
    )
    lane_after = jnp.concatenate([s_comp[1:], ident], axis=0)  # (T, N, W)

    code_sel = ladder_take(code, lane_after)  # (T, N, W)
    emit = code_sel >= W
    k_sel = jnp.where(emit, (code_sel - W) % K, 0)
    ch = flat_take(ck, k_sel)  # (T, N, W)
    pos = jnp.cumsum(emit.astype(jnp.int32), axis=0) - 1
    lens = jnp.minimum(pos[-1] + 1, s_cap)  # (N, W); kernel caps emits
    idx = jnp.where(emit, jnp.minimum(pos, s_cap - 1), s_cap)
    n_idx = jax.lax.broadcasted_iota(jnp.int32, idx.shape, 1)
    w_idx = jax.lax.broadcasted_iota(jnp.int32, idx.shape, 2)
    t_idx = jax.lax.broadcasted_iota(jnp.int32, idx.shape, 0)
    tokens = jnp.full((n, W, s_cap + 1), -1, jnp.int32)
    tokens = tokens.at[n_idx, w_idx, idx].set(jnp.where(emit, ch, -1))
    tokens = tokens[:, :, :s_cap]
    # per-token emission frames (same scatter, frame index payload)
    times = jnp.full((n, W, s_cap + 1), -1, jnp.int32)
    times = times.at[n_idx, w_idx, idx].set(jnp.where(emit, t_idx, -1))
    times = times[:, :, :s_cap]

    sc = scores[:, :n].T  # (N, W)
    sc = jnp.where(sc > LOG0_THRESHOLD, sc, -jnp.inf)
    sc, order = jax.lax.top_k(sc, W)
    tokens = jnp.take_along_axis(tokens, order[:, :, None], axis=1)
    times = jnp.take_along_axis(times, order[:, :, None], axis=1)
    lens = jnp.take_along_axis(lens, order, axis=1)
    return tokens, lens, sc, times


@partial(
    jax.jit,
    static_argnames=(
        "W", "K", "s_cap", "blank", "interpret", "approx_topk",
        "t_max", "n", "v", "lm_alpha", "lm_beta", "token_min_logp",
    ),
)
def _beam_pallas_jit(log_probs, il, W, K, s_cap, blank, interpret,
                     approx_topk, t_max, n, v, lm_table=None, lm_eos=None,
                     lm_alpha=0.0, lm_beta=0.0, token_min_logp=None):
    """Full decode: top-K prep -> pallas scan kernel -> XLA backtrace."""
    # Full-vocab top-K (blank included, masked in-kernel): candidate K-slot
    # ordering — and therefore tie-breaking — matches the XLA scan exactly.
    # On TPU the dedicated pallas kernel replaces lax.top_k for LARGE vocab
    # (10.4 -> 1.9 ms at B=32,V=1024,K=16) but XLA's sort wins for small
    # rows where the kernel's K sequential extraction passes dominate
    # (1.7 vs 11.7 ms at B=128,V=128) — measured crossover at V ~ 256-512,
    # so route on v; interpret mode (CPU tests) keeps lax.top_k, which has
    # identical semantics either way.
    from .topk_pallas import topk_pallas, topk_pallas_fits_vmem

    # Stream a slightly wider window: extensions use the first K slots,
    # the stay lookup reads all of them (see _beam_kernel) — a repeat
    # demoted just past the prune line keeps its exact probability.  +8
    # (not 2x): the top-K extraction kernel's cost is linear in K and was
    # ~27% of the beam-8 decode; widening by a fixed margin keeps that
    # row's throughput while covering every demote-past-the-line case
    # the adversarial grid constructs (rank K+1).
    ks = min(K + 8, v)
    if approx_topk and ks < v:
        lpk, ck = jax.lax.approx_max_k(log_probs, ks)
    elif interpret or v <= 256 or not topk_pallas_fits_vmem(n, v):
        # small rows: XLA's sort wins; huge rows: the kernel's minimum
        # block would blow scoped VMEM — either way lax.top_k (identical
        # semantics) keeps the beam kernel path usable
        lpk, ck = jax.lax.top_k(log_probs, ks)  # (T, N, ks)
    else:
        lpk, ck = topk_pallas(log_probs, ks)
    from .beam_search import apply_token_min_logp

    lpk, ck = apply_token_min_logp(lpk, ck, token_min_logp)
    lpb = log_probs[:, :, blank]  # (T, N)
    return _beam_pallas_from_topk_jit(
        lpk, ck, lpb, il, W, ks, s_cap, blank, interpret, t_max, n, v,
        lm_table=lm_table, lm_eos=lm_eos, lm_alpha=lm_alpha,
        lm_beta=lm_beta, ext_k=K,
    )


_STATE_DTYPES = (jnp.float32, jnp.float32, jnp.int32, jnp.int32, jnp.int32,
                 jnp.int32, jnp.int32, jnp.int32, jnp.float32, jnp.int32)


def beam_state_init(W, b_pad):
    """Initial per-beam kernel carry as XLA arrays — bit-identical to the
    kernel's own i==0 init (used to seed resume/chunked decoding)."""
    w_iota = jnp.broadcast_to(jnp.arange(W, dtype=jnp.int32)[:, None],
                              (W, b_pad))
    live0 = w_iota == 0
    return (
        jnp.where(live0, 0.0, LOG0).astype(jnp.float32),        # pb
        jnp.full((W, b_pad), LOG0, jnp.float32),                # pnb
        jnp.where(live0, _SEED1, _DEADBASE + w_iota),           # h1
        jnp.where(live0, _SEED2, _DEADBASE + w_iota),           # h2
        _NOPARENT + w_iota,                                     # hp1
        _NOPARENT + w_iota,                                     # hp2
        jnp.full((W, b_pad), -1, jnp.int32),                    # last
        jnp.zeros((W, b_pad), jnp.int32),                       # len
        jnp.zeros((W, b_pad), jnp.float32),                     # lm bonus
        jnp.full((W, b_pad), -1, jnp.int32),                    # lcls
    )


def _run_beam_kernel(inputs, in_specs, t_pad, tc, b_pad, W, K, s_cap, blank,
                     n_ctx, interpret, state_in=None, ext_k=None,
                     use_cls=False):
    """Build and invoke the pallas_call.  With `state_in` (a 10-tuple of
    (W, b_pad) arrays, see beam_state_init) the kernel resumes from that
    carry and additionally returns the final carry — the primitive the
    chunked LM decode (beam_chunked.py) alternates with XLA-side LM
    scoring.  `use_cls`: the LM-increment block is keyed by context CLASS
    and the caller appended a (tc, K, lanes) i32 per-candidate class block
    after it (quantized-context guide; see beam_chunked.py)."""
    resume = state_in is not None
    vspec = lambda shape, imap: pl.BlockSpec(shape, imap,
                                             memory_space=pltpu.VMEM)
    state_spec = vspec((W, _LANES), lambda bt, i: (0, bt))
    inputs = list(inputs)
    in_specs = list(in_specs)
    if resume:
        inputs += list(state_in)
        in_specs += [state_spec] * _N_STATE
    out_specs = [
        vspec((tc, W, _LANES), lambda bt, i: (i, 0, bt)),
        state_spec,
        state_spec,
    ]
    out_shape = [
        jax.ShapeDtypeStruct((t_pad, W, b_pad), jnp.int32),
        jax.ShapeDtypeStruct((W, b_pad), jnp.float32),
        jax.ShapeDtypeStruct((W, b_pad), jnp.int32),
    ]
    if resume:
        out_specs += [state_spec] * _N_STATE
        out_shape += [jax.ShapeDtypeStruct((W, b_pad), d)
                      for d in _STATE_DTYPES]
    kern = partial(_beam_kernel, W, K, s_cap, blank, n_ctx, resume,
                   K if ext_k is None else ext_k, use_cls)
    out = pl.pallas_call(
        kern,
        grid=(b_pad // _LANES, t_pad // tc),
        in_specs=in_specs,
        out_specs=out_specs,
        out_shape=out_shape,
        scratch_shapes=[pltpu.VMEM((W, _LANES), d) for d in _STATE_DTYPES],
        interpret=interpret,
    )(*inputs)
    bp, scores, last_out = out[:3]
    state_out = tuple(out[3:]) if resume else None
    return bp, scores, last_out, state_out


@partial(
    jax.jit,
    static_argnames=(
        "W", "K", "s_cap", "blank", "interpret",
        "t_max", "n", "v", "lm_alpha", "lm_beta", "ext_k",
    ),
)
def _beam_pallas_from_topk_jit(lpk, ck, lpb, il, W, K, s_cap, blank,
                               interpret, t_max, n, v, lm_table=None,
                               lm_eos=None, lm_alpha=0.0, lm_beta=0.0,
                               ext_k=None):
    """Pallas scan kernel + XLA backtrace from precomputed candidates."""
    ck = ck.astype(jnp.int32)
    use_lm = lm_table is not None
    n_ctx = v + 1 if use_lm else 0
    c_pad = _pad_up(n_ctx, 8) if use_lm else 0

    b_pad = _pad_up(max(n, 1), _LANES)
    tc = _input_tc(K, c_pad)
    t_pad = _pad_up(t_max, tc)

    lpk_full = jnp.full((t_pad, K, b_pad), LOG0, jnp.float32)
    lpk_full = lpk_full.at[:t_max, :, :n].set(jnp.moveaxis(lpk, 2, 1))
    ck_full = jnp.full((t_pad, K, b_pad), -2, jnp.int32)
    ck_full = ck_full.at[:t_max, :, :n].set(jnp.moveaxis(ck, 2, 1))
    lpb_full = jnp.full((t_pad, 1, b_pad), LOG0, jnp.float32)
    lpb_full = lpb_full.at[:t_max, 0, :n].set(lpb)
    il_full = jnp.zeros((1, b_pad), jnp.int32).at[0, :n].set(il)

    inputs = [lpk_full, ck_full, lpb_full, il_full]
    vspec = lambda shape, imap: pl.BlockSpec(shape, imap,
                                             memory_space=pltpu.VMEM)
    in_specs = [
        vspec((tc, K, _LANES), lambda bt, i: (i, 0, bt)),
        vspec((tc, K, _LANES), lambda bt, i: (i, 0, bt)),
        vspec((tc, 1, _LANES), lambda bt, i: (i, 0, bt)),
        vspec((1, _LANES), lambda bt, i: (0, bt)),
    ]
    if use_lm:
        # Per-frame LM increments alpha*lm(ck | context) + beta for every
        # (context row, candidate).  The lookup is a one-hot MXU einsum
        # emitted DIRECTLY in the kernel's (t, ctx, k, lane) layout — 21x
        # faster than gather+transpose (0.18 vs 3.9 ms at T=1000, B=128,
        # K=16, C=30) and bit-exact (each output sums exactly one 1.0 * x
        # product).
        oh = jax.nn.one_hot(jnp.clip(ck, 0, v - 1), v, dtype=jnp.float32)
        # HIGHEST: the TPU MXU's default bf16 pass would truncate the table
        # values (the one-hot side is exact either way)
        col = jnp.einsum("tnkv,cv->tckn", oh, lm_table,
                         precision=jax.lax.Precision.HIGHEST)
        col = lm_alpha * col + lm_beta  # (T, n_ctx, K, N)
        lm_full = jnp.zeros((t_pad, c_pad, K, b_pad), jnp.float32)
        lm_full = lm_full.at[:t_max, :n_ctx, :, :n].set(col)
        inputs.append(lm_full)
        in_specs.append(
            vspec((tc, c_pad, K, _LANES), lambda bt, i: (i, 0, 0, bt))
        )

    ext_k = K if ext_k is None else ext_k
    bp, scores, last_out, _ = _run_beam_kernel(
        inputs, in_specs, t_pad, tc, b_pad, W, K, s_cap, blank, n_ctx,
        interpret, state_in=None, ext_k=ext_k,
    )
    if use_lm:
        # end-of-sequence bonus, matching the XLA scan's lm.final():
        # alpha * eos[last] for nonempty prefixes
        eos = jnp.take(lm_eos, jnp.clip(last_out, 0, v - 1), axis=0)
        scores = scores + jnp.where(last_out >= 0, lm_alpha * eos, 0.0)
    return _backtrace(bp, ck, scores, W, ext_k, s_cap, t_max, n)


_LM_CTX_CAP = 64  # max context rows for in-kernel LM (select-ladder cost)


def _input_frame_bytes(K, c_pad):
    """Bytes of per-frame kernel input: top-K values+ids (+ the LM
    increment block when fused)."""
    return K * _LANES * 8 + c_pad * K * _LANES * 4


def _input_tc(K, c_pad):
    """Time-chunk length for the kernel's input blocks: target ~4 MB of
    per-chunk VMEM (x2 double-buffered).  No lower floor: with LM fusion at
    large (V, K) the per-frame LM block alone reaches ~2 MB, and a floored
    tc=8 would allocate >16 MB of scoped VMEM — tc=1 just runs more grid
    steps instead (advisor finding, round 2)."""
    return max(1, min(128, (4 << 20) // _input_frame_bytes(K, c_pad)))


def beam_pallas_supported(t_max, v, beam_width, prune_k, lm,
                          dtype=jnp.float32):
    """(ok, reason) — whether the pallas kernel covers this decode config."""
    k = min(prune_k if prune_k else v, v)
    if lm is not None:
        from .lm import NGramLM

        if not isinstance(lm, NGramLM):
            return False, ("in-kernel LM fusion supports dense bigram "
                           "NGramLM only; other LMs use the XLA scan")
        if lm._v != v:
            return False, (f"LM vocab ({lm._v}) != lattice vocab ({v})")
        if lm._v + 1 > _LM_CTX_CAP:
            return False, (f"in-kernel LM fusion supports vocab + 1 <= "
                           f"{_LM_CTX_CAP} context rows (got {lm._v + 1}); "
                           "larger LMs use the XLA scan")
        if beam_width > 32:
            return False, ("in-kernel LM fusion supports beam_width <= 32 "
                           "(wide widths run the context ladder as a "
                           "fori_loop to stay within Mosaic's compile "
                           "limits)")
        # VMEM budget for the per-frame LM increment block: even at tc=1
        # the double-buffered input blocks must fit scoped VMEM (advisor
        # finding, round 2 — within the current envelope this always holds,
        # but the guard keeps 'auto' safe if the caps above ever widen).
        c_pad = _pad_up(lm._v + 1, 8)
        # the streamed candidate window is 2x the extension prune
        if 2 * _input_frame_bytes(min(2 * k, v), c_pad) > (10 << 20):
            return False, ("in-kernel LM fusion: per-frame input blocks "
                           "exceed the VMEM budget at this (V, prune_k); "
                           "falling back to the XLA scan")
    if beam_width > 32:
        return False, "pallas beam supports beam_width <= 32"
    if k > 128:
        return False, "pallas beam supports prune_k <= 128"
    if dtype != jnp.float32:
        return False, "pallas beam is float32-only"
    return True, ""


def beam_search_pallas(log_probs, input_lengths=None, beam_width: int = 8,
                       blank: int = 0, prune_k: int | None = None,
                       max_symbols: int | None = None,
                       approx_topk: bool = False, interpret=None,
                       lm=None, lm_alpha: float = 0.0, lm_beta: float = 0.0,
                       return_timestamps: bool = False,
                       token_min_logp: float | None = None):
    """Pallas-kernel beam search; same returns as beam_search_decode.

    Jittable end to end (device arrays out).  float32 only;
    beam_width <= 32; prune_k <= 128; LM fusion for dense `NGramLM` with
    vocab + 1 <= 64 (see module docstring).
    """
    log_probs = jnp.asarray(log_probs, jnp.float32)
    t_max, n, v = log_probs.shape
    if input_lengths is None:
        input_lengths = np.full((n,), t_max, np.int32)
    il = jnp.asarray(input_lengths, jnp.int32)
    W = int(beam_width)
    K = min(int(prune_k or v), v)
    s_cap = int(max_symbols or min(t_max, 512))
    ok, reason = beam_pallas_supported(t_max, v, W, K, lm=lm)
    if not ok:
        raise ValueError(reason)
    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    lm_table = lm._table if lm is not None else None
    lm_eos = lm._eos if lm is not None else None
    out = _beam_pallas_jit(
        log_probs, il, W, K, s_cap, int(blank), bool(interpret),
        bool(approx_topk), t_max, n, v,
        lm_table=lm_table, lm_eos=lm_eos,
        lm_alpha=float(lm_alpha), lm_beta=float(lm_beta),
        token_min_logp=(None if token_min_logp is None
                        else float(token_min_logp)),
    )
    return out if return_timestamps else out[:3]


def beam_search_pallas_from_topk(lpk, ck, lpb, input_lengths, beam_width=8,
                                 blank=0, max_symbols=None, v=None,
                                 lm=None, lm_alpha=0.0, lm_beta=0.0,
                                 interpret=None, return_timestamps=False,
                                 ext_k: int | None = None):
    """Pallas beam search from PRECOMPUTED candidates — the kernel twin of
    `beam_search.beam_search_from_topk` (identical candidate-only
    semantics).  Used by the vocab-sharded decode so tensor-parallel
    decoding runs at kernel speed: lpk/ck (T, N, K), lpb (T, N), `v` the
    (global) vocab size the ids index into."""
    lpk = jnp.asarray(lpk, jnp.float32)
    t_max, n, K = lpk.shape
    if v is None:
        raise ValueError(
            "pass the (global) vocab size v explicitly — inferring it from "
            "ck would force a host sync and underestimates V whenever the "
            "highest token ids never reach any frame's top-K")
    W = int(beam_width)
    s_cap = int(max_symbols or min(t_max, 512))
    ok, reason = beam_pallas_supported(t_max, v, W, K, lm=lm)
    if not ok:
        raise ValueError(reason)
    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    lm_table = lm._table if lm is not None else None
    lm_eos = lm._eos if lm is not None else None
    out = _beam_pallas_from_topk_jit(
        lpk, jnp.asarray(ck), jnp.asarray(lpb, jnp.float32),
        jnp.asarray(input_lengths, jnp.int32), W, K, s_cap, int(blank),
        bool(interpret), t_max, n, int(v),
        lm_table=lm_table, lm_eos=lm_eos,
        lm_alpha=float(lm_alpha), lm_beta=float(lm_beta),
        ext_k=None if ext_k is None else int(ext_k),
    )
    return out if return_timestamps else out[:3]
