"""Shallow-fusion language models for the beam-search decoder.

TPU-native replacement for the reference's KenLM hook (SURVEY.md §3.1 N6):
instead of calling out to a C++ n-gram library per hypothesis (impossible
inside a compiled scan), the LM is a set of DEVICE ARRAYS queried with
gathers, and its per-beam state rides in the `lax.scan` carry.

Protocol (duck-typed; used by beam_search.py when `lm=` is given):

  init_state(W) -> state           pytree of (W, ...) arrays, one per beam
  score(state, ck) -> (lm_lp, state_ext)
      ck: (K,) int32 candidate tokens for this frame.
      lm_lp: (W, K) log p_LM(ck[k] | beam w's prefix).
      state_ext: pytree of (W, K, ...) arrays — state after extending.
  select(state, state_ext, parent, kk, is_stay) -> state
      gather the surviving beams' states (stay: state[parent];
      extend: state_ext[parent, kk]).
  final(state) -> (W,) end-of-sequence bonus added once at the end.

The decoder applies `lm_alpha * lm_lp + lm_beta` per emitted token (alpha =
LM weight, beta = insertion bonus — the reference's alpha/beta knobs).

LM objects are STATIC jit arguments (hashed by identity): reuse one instance
across calls or every new instance recompiles.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

_INV31 = np.uint32(pow(31, -1, 1 << 32))  # 31 is odd -> invertible mod 2^32


def _pow_bits(exp, base, n_max):
    """base^exp (mod 2^32) for int32 exp in [0, n_max] — square-and-multiply
    with per-bit selects.  Elementwise VPU work; a table GATHER here costs
    ~1 ms per 131k elements on TPU (ops/indexing.py), the selects ~30 us."""
    x = jnp.full(exp.shape, 1, jnp.uint32)
    sq = np.uint32(base)
    with np.errstate(over="ignore"):
        for i in range(max(int(n_max).bit_length(), 1)):
            x = jnp.where((exp >> i) & 1 == 1, x * sq, x)
            sq = np.uint32(sq * sq)
    return x


def _at_last_flag(flag, vals):
    """Per position j (inclusive): each val's value at the most recent
    flagged position <= j (0 where none yet), plus the seen-flag — ONE
    elementwise associative scan instead of cummax + per-row gathers."""
    def comb(a, b):
        return (a[0] | b[0],) + tuple(
            jnp.where(b[0], y, x) for x, y in zip(a[1:], b[1:]))

    init = (flag,) + tuple(jnp.where(flag, v, jnp.zeros_like(v))
                           for v in vals)
    out = jax.lax.associative_scan(comb, init, axis=1)
    return out[0], out[1:]


def _chunk_words(toks, space_id, curh, curlen, mult, seed):
    """Vectorized word segmentation of emitted-token chunks.

    The chunked kernel decode (beam_chunked.py) hands each beam its tokens
    emitted during a chunk as a dense row; word-level LMs must then find the
    completed words and their spell hashes WITHOUT a sequential scan (a
    T-step scan is exactly the cost the chunked decode exists to avoid).
    The rolling polynomial hash h = h0*m^L + sum_i (c_i+1)*m^(L-1-i) factors
    as h = m^L * (h0 + sum_i (c_i+1)*inv_m^(i+1)) because m is odd and hence
    invertible mod 2^32 — so per-word hashes become segmented SUMS of
    position-weighted terms, computable with cumulative sums plus one
    "value at the previous space" gather.  All (M, C) element-wise ops.

    Args:
      toks: (M, C) int32 emitted tokens in order, -1 padded at the end.
      space_id: the word-separator token id.
      curh / curlen: (M,) uint32/int32 carried partial-word hash and length.
      mult / seed: the rolling-hash constants (uint32).

    Returns dict with:
      whash: (M, Wmax) uint32 spell hashes of completed words, in order.
      wvalid: (M, Wmax) bool; n_words: (M,) int32.
      new_curh / new_curlen: carried partial word after the chunk.
    """
    from .indexing import compact_rows

    m, c = toks.shape
    w_max = c // 2 + 1  # a completed word needs >= 1 char + 1 space
    inv = (_INV31 if mult == np.uint32(31)
           else np.uint32(pow(int(mult), -1, 1 << 32)))
    valid = toks >= 0
    space = valid & (toks == space_id)
    char = valid & ~space

    cc = jnp.cumsum(char.astype(jnp.int32), axis=1)  # chars so far (incl.)
    # position-weighted terms u_j = (tok+1) * inv_m^(cc_j) — exponent
    # relative to the CHUNK START; re-based per segment below (dividing by
    # inv^cc_at_prev_space == multiplying by mult^(...), all mod 2^32).
    u = (toks.astype(jnp.uint32) + 1) * _pow_bits(cc, inv, c)
    # int32 cumsum, cast back: uint32 cumsum takes a ~10x slower TPU path,
    # and two's-complement wraparound makes them bit-identical
    cs = jnp.cumsum(
        jnp.where(char, u, jnp.uint32(0)).astype(jnp.int32), axis=1
    ).astype(jnp.uint32)

    # "value at the most recent space" for (cc, cs): one elementwise
    # associative scan; exclusive via a 1-position shift.  (The previous
    # cummax + per-row-gather form cost ~4 ms per call on TPU.)
    sp_seen_inc, (cc_sp_inc, cs_sp_inc) = _at_last_flag(space, (cc, cs))
    shift1 = lambda a: jnp.concatenate(
        [jnp.zeros_like(a[:, :1]), a[:, :-1]], axis=1)
    seg0 = ~shift1(sp_seen_inc)  # no space strictly before
    cc_prev_sp = shift1(cc_sp_inc)
    cs_prev_sp = shift1(cs_sp_inc)

    # completed word at each space position (chunk part + carried part).
    # Hash identity: with u_j scaled by inv^cc_j, the segment sum times
    # mult^cc_at_space re-bases the polynomial so the word's chars carry
    # powers mult^(L1-1-i) exactly; + base * mult^L1 prepends the carry.
    seg_len = cc - cc_prev_sp          # at a space: chars in the chunk part
    tot_len = seg_len + jnp.where(seg0, curlen[:, None], 0)
    is_word = space & (tot_len > 0)
    base = jnp.where(seg0, curh[:, None], jnp.uint32(seed))
    whash_at = (_pow_bits(seg_len, mult, c) * base
                + _pow_bits(cc, mult, c) * (cs - cs_prev_sp))

    # compact completed words left-justified (one stable sort, no scatter)
    n_words = jnp.sum(is_word.astype(jnp.int32), axis=1)
    whash = compact_rows(jnp.where(is_word, whash_at, 0),
                         fill=np.uint32(0), valid=is_word)[:, :w_max]
    wvalid = jnp.arange(w_max, dtype=jnp.int32)[None] < n_words[:, None]

    # trailing partial word -> new carry (read the inclusive scan's last
    # column — no gather)
    any_sp = sp_seen_inc[:, -1]
    cc_end, cs_end = cc[:, -1], cs[:, -1]
    cc_sp = jnp.where(any_sp, cc_sp_inc[:, -1], 0)
    cs_sp = jnp.where(any_sp, cs_sp_inc[:, -1], jnp.uint32(0))
    tl_chars = cc_end - cc_sp
    base_tr = jnp.where(any_sp, jnp.uint32(seed), curh)
    new_curh = (_pow_bits(tl_chars, mult, c) * base_tr
                + _pow_bits(cc_end, mult, c) * (cs_end - cs_sp))
    new_curlen = tl_chars + jnp.where(any_sp, 0, curlen)
    return dict(whash=whash, wvalid=wvalid, n_words=n_words,
                new_curh=new_curh, new_curlen=new_curlen.astype(jnp.int32))


_VSEP = 1 << 30  # virtual separator id for prefix-boundary interleaving


def _prefix_to_separator(toks, is_bnd):
    """Reduce prefix-boundary (BPE-style) word segmentation to separator
    segmentation: insert a VIRTUAL separator before each boundary token.
    Boundary tokens stay in the stream (they are part of their own word's
    spelling, unlike a space); the virtual id never appears in real data,
    so the separator machinery (_chunk_words) applies unchanged.
    (M, C) -> (M, 2C); -1 slots are invalid and ignored downstream."""
    m, c = toks.shape
    sep = jnp.where(is_bnd, jnp.int32(_VSEP), jnp.int32(-1))
    return jnp.stack([sep, toks], axis=2).reshape(m, 2 * c)


class _WordBoundaryMode:
    """Shared boundary handling for the word-level LMs: 'separator' (a
    dedicated token, e.g. space, ends the word and belongs to none) or
    'prefix' (BPE/SentencePiece-style: tokens marked as word-starters,
    e.g. '▁the', BEGIN a new word and are part of it — the
    pyctcdecode-compatible regime for subword CTC models).  Pass
    `boundary_ids` (iterable of token ids that start words) to select
    prefix mode; `space_id` must then be None."""

    def _init_boundary(self, space_id, boundary_ids):
        if (space_id is None) == (boundary_ids is None):
            raise ValueError(
                "exactly one of space_id (separator mode) and "
                "boundary_ids (prefix/BPE mode) must be given")
        # -10: matches no candidate id, including the -1 padding slots
        self._space = -10 if space_id is None else int(space_id)
        self._bnd = None
        if boundary_ids is not None:
            ids = sorted(int(i) for i in boundary_ids)
            if not ids or ids[0] < 0:
                raise ValueError("boundary_ids must be non-negative")
            mask = np.zeros(ids[-1] + 1, bool)
            mask[ids] = True
            self._bnd = jnp.asarray(mask)

    def _cand_boundary(self, ck):
        """(..., ) bool: does candidate token ck start/end a word?"""
        if self._bnd is None:
            return ck == self._space
        n = self._bnd.shape[0]
        return self._bnd[jnp.clip(ck, 0, n - 1)] & (ck >= 0) & (ck < n)

    def _advance_word_hash(self, is_b, curh, curlen, ck):
        """Per-candidate rolling-hash/length advance: (W, K) new hash and
        length given boundary flags is_b (W, K) or (1, K).  In separator
        mode a boundary resets to an empty word; in prefix mode it starts
        a new word CONTAINING the boundary token."""
        cku = ck.astype(jnp.uint32) + 1
        cont_h = curh[:, None] * self._MULT + cku[None, :]
        if self._bnd is None:
            new_h = jnp.where(is_b, jnp.uint32(self._SEED), cont_h)
            new_len = jnp.where(is_b, 0, curlen[:, None] + 1)
        else:
            restart = jnp.uint32(self._SEED) * self._MULT + cku  # (K,)
            new_h = jnp.where(is_b, restart[None, :], cont_h)
            new_len = jnp.where(is_b, 1, curlen[:, None] + 1)
        return new_h, new_len.astype(jnp.int32)

    def _segment_chunk(self, toks, curh, curlen):
        """_chunk_words under the configured boundary mode (prefix mode
        goes through the virtual-separator interleave)."""
        if self._bnd is None:
            return _chunk_words(toks, self._space, curh, curlen,
                                self._MULT, self._SEED)
        n = self._bnd.shape[0]
        is_b = ((toks >= 0) & (toks < n)
                & self._bnd[jnp.clip(toks, 0, n - 1)])
        return _chunk_words(_prefix_to_separator(toks, is_b), _VSEP,
                            curh, curlen, self._MULT, self._SEED)


class NGramLM:
    """Token-level n-gram LM with dense tables (n = 1 or 2).

    For bigram: `table[prev, next] = log p(next | prev)` with a dedicated
    start row used when the prefix is empty.  State = last token id per beam
    (-1 for the empty prefix).  Tables live in device memory; scoring is one
    gather per frame.  Build tables from an ARPA file with
    `end2end_tpu.utils.arpa.load_arpa` (uses the native C parser when built).
    """

    def __init__(self, bigram_logp, start_logp=None, eos_logp=None):
        """bigram_logp: (V, V) log p(next|prev); start_logp: (V,) log p(next|<s>)
        (defaults to uniform 0); eos_logp: (V,) log p(</s>|last) (default 0)."""
        bigram_logp = jnp.asarray(bigram_logp, jnp.float32)
        v = bigram_logp.shape[0]
        if start_logp is None:
            start_logp = jnp.zeros((v,), jnp.float32)
        # Row V = start-of-sequence context.
        self._table = jnp.concatenate(
            [bigram_logp, jnp.asarray(start_logp, jnp.float32)[None, :]], axis=0
        )
        self._eos = (
            jnp.asarray(eos_logp, jnp.float32)
            if eos_logp is not None
            else jnp.zeros((v,), jnp.float32)
        )
        self._v = v

    def init_state(self, w):
        return jnp.full((w,), -1, jnp.int32)  # last token; -1 = start

    def score(self, state, ck):
        ctx = jnp.where(state < 0, self._v, state)  # (W,)
        rows = self._table[ctx]  # (W, V)
        lm_lp = rows[:, ck]  # (W, K)
        state_ext = jnp.broadcast_to(ck[None, :], lm_lp.shape).astype(jnp.int32)
        return lm_lp, state_ext

    def select(self, state, state_ext, parent, kk, is_stay):
        return jnp.where(is_stay, state[parent], state_ext[parent, kk])

    def final(self, state):
        last = jnp.clip(state, 0, self._v - 1)
        return jnp.where(state >= 0, self._eos[last], 0.0)

    def score_chunk(self, state, toks):
        """Score a dense chunk of emitted tokens per hypothesis — the
        vectorized replay used by the chunked kernel decode
        (beam_chunked.py): toks (M, C) int32 in emission order, -1 padded
        at the END.  Returns (sum of log p_LM over the chunk (M,), advanced
        state); exactly equals folding score()/select() token by token."""
        from .indexing import flat_take

        m, c = toks.shape
        valid = toks >= 0
        prev = jnp.concatenate([state[:, None], toks[:, :-1]], axis=1)
        ctx = jnp.where(prev < 0, self._v, prev)
        # table[ctx, tok] as one flat 1-D gather (fast TPU form)
        lp = self._table.reshape(-1)[
            ctx * self._v + jnp.clip(toks, 0, self._v - 1)]  # (M, C)
        lp_sum = jnp.sum(jnp.where(valid, lp, 0.0), axis=1)
        n_valid = valid.sum(axis=1)
        last_tok = flat_take(toks, jnp.maximum(n_valid - 1, 0)[:, None])[:, 0]
        return lp_sum, jnp.where(n_valid > 0, last_tok, state)


class UniformLM(NGramLM):
    """Degenerate LM assigning log p = const to every token (for testing:
    with alpha it only adds a per-token constant, acting as a length bonus)."""

    def __init__(self, vocab_size, logp=0.0):
        super().__init__(jnp.full((vocab_size, vocab_size), logp, jnp.float32))


def bigram_from_counts(counts, smoothing: float = 1.0):
    """Dense bigram log-probs from a (V, V) count matrix (add-k smoothing)."""
    counts = np.asarray(counts, np.float64) + smoothing
    probs = counts / counts.sum(axis=1, keepdims=True)
    return np.log(probs).astype(np.float32)


class QuantizedBigramGuide:
    """Class-quantized dense bigram for IN-KERNEL mid-chunk steering at
    ANY vocabulary size (BPE included).

    The exact in-kernel guide (`guide_lm=NGramLM`) keys its streamed
    increment block by the last symbol id, capping it at vocab + 1 <= 64
    context rows (beam_search_pallas._LM_CTX_CAP) — char-scale only.  This
    guide keys the block by a CONTEXT CLASS instead: `cls_map` sends each
    token id to one of `n_classes` (< 64) context classes, and
    `table[c, k] ~ log p(k | context class c)` approximates the bigram row
    of every context in class c.  The beam kernel tracks the class of each
    beam's last symbol in a dedicated register fed by streamed
    per-candidate class ids (beam_search_pallas.py `use_cls`).

    Like every guide, it only STEERS mid-chunk pruning — the accumulated
    bonus is replaced by the exact `lm` replay at each chunk boundary, so
    returned scores are exactly the `lm`-fused scores regardless of how
    coarse the quantization is.

    Build from a dense bigram with `from_bigram` (k-means over context
    rows) or construct directly from a linguistically motivated partition
    (e.g. BPE word-starter vs continuation classes).
    """

    def __init__(self, cls_map, table):
        """cls_map: (V,) int class of each token id, values in
        [0, n_classes); table: (n_classes + 1, V) log-prob-like guide rows,
        row n_classes = the exact start-of-sequence row."""
        self._cls_map = jnp.asarray(cls_map, jnp.int32)
        self._table = jnp.asarray(table, jnp.float32)
        self._v = int(self._cls_map.shape[0])
        self._n_classes = int(self._table.shape[0]) - 1
        if self._table.shape[1] != self._v:
            raise ValueError(f"table columns ({self._table.shape[1]}) must "
                             f"match cls_map length ({self._v})")
        if int(jnp.max(self._cls_map)) >= self._n_classes or \
                int(jnp.min(self._cls_map)) < 0:
            raise ValueError("cls_map values must lie in [0, n_classes)")

    @classmethod
    def from_bigram(cls, lm, n_classes: int = 63, iters: int = 10,
                    seed: int = 0, max_cols: int = 1024,
                    floor: float = -30.0):
        """Quantize an `NGramLM`'s context rows by k-means.

        Rows are floored at `floor` (log-domain; deeper mass is
        steering-irrelevant) and distances computed on a random column
        subsample of at most `max_cols` (bounds build cost at large V);
        class rows are full-width means of their member rows.  The
        start-of-sequence context keeps its EXACT row.  Build-time NumPy —
        O(V * max_cols * n_classes * iters).
        """
        if not isinstance(lm, NGramLM):
            raise ValueError("from_bigram takes a dense NGramLM")
        v = lm._v
        n_classes = int(min(n_classes, v))
        X = np.maximum(np.asarray(lm._table[:v], np.float32), floor)
        rng = np.random.default_rng(seed)
        cols = (np.arange(v) if v <= max_cols
                else rng.choice(v, max_cols, replace=False))
        Xd = X[:, cols]
        cent = Xd[rng.choice(v, n_classes, replace=False)]
        assign = np.zeros(v, np.int64)
        for _ in range(int(iters)):
            d = ((Xd[:, None, :] - cent[None]) ** 2).sum(-1) \
                if v * n_classes * len(cols) < (1 << 27) else None
            if d is None:  # blockwise distances at large V
                d = np.empty((v, n_classes), np.float32)
                x2 = (Xd ** 2).sum(1)
                for c0 in range(0, n_classes, 16):
                    cc = cent[c0:c0 + 16]
                    d[:, c0:c0 + 16] = (x2[:, None]
                                        - 2.0 * Xd @ cc.T
                                        + (cc ** 2).sum(1)[None])
            assign = d.argmin(1)
            for c in range(n_classes):
                m = assign == c
                if m.any():
                    cent[c] = Xd[m].mean(0)
                else:  # reseed empty clusters to the farthest point
                    far = int(d.min(1).argmax())
                    cent[c] = Xd[far]
                    assign[far] = c
        rows = np.zeros((n_classes + 1, v), np.float32)
        for c in range(n_classes):
            m = assign == c
            rows[c] = X[m].mean(0) if m.any() else floor
        rows[n_classes] = np.maximum(
            np.asarray(lm._table[v], np.float32), floor)
        return cls(assign.astype(np.int32), rows)


_BUCKET = 8        # entries per hash bucket (one gathered row)
_PROBE_MAX = 8192  # entry count below which the probe layout wins

# Word-level chunk replay scores completed words in data-adaptive ROUNDS of
# this many positions (lax.while_loop) instead of all w_max = chunk_t/2+1
# static columns: a chunk's word count is bounded by its SPACES, so typical
# chunks complete 0-3 words per beam and one round (or zero) covers every
# row, cutting the dominant hash-table gathers ~4x at chunk_t=64.  Rows
# needing more words just run more rounds — exactness is data-independent.
_WORD_ROUND = 8


def _word_score_rounds(whash, n_words, carry0, round_fn, round_cap=None):
    """Drive `round_fn(carry, whash_slice (M, w_cap), nv (M,)) ->
    (carry, lp (M,))` over left-compacted word hashes in rounds of
    `round_cap` (default _WORD_ROUND) until every row's `n_words` are
    consumed (zero rounds when no row completed a word).  `nv` is each
    row's valid count within the slice (0..w_cap); slots past it hold
    padding the round_fn must mask.  Returns (final carry, summed lp)."""
    m, w_max = whash.shape
    w_cap = min(round_cap or _WORD_ROUND, w_max)
    pad = -w_max % w_cap
    if pad:
        whash = jnp.pad(whash, ((0, 0), (0, pad)))
    n_max = jnp.max(n_words) if m else jnp.int32(0)

    def cond(c):
        return c[0] * w_cap < n_max

    def body(c):
        r, carry, acc = c
        sl = jax.lax.dynamic_slice_in_dim(whash, r * w_cap, w_cap, axis=1)
        nv = jnp.clip(n_words - r * w_cap, 0, w_cap)
        carry, lp = round_fn(carry, sl, nv)
        return r + 1, carry, acc + lp

    _, carry, lp_sum = jax.lax.while_loop(
        cond, body, (jnp.int32(0), carry0, jnp.zeros((m,), jnp.float32)))
    return carry, lp_sum


def _word_score_packed(whash, n_words, win0, lookup_wid, score_pos,
                       round_size=None):
    """Per-row data-adaptive word replay: score the completed words of a
    chunk over a PACKED row-major worklist instead of the (M, w_cap)
    round grid (VERDICT r4 item 8 — `_word_score_rounds` is bounded by
    the MAX word count across rows and scores every grid slot, ~80%
    padding at typical occupancy; here lookups are issued only for words
    that exist, in while-loop rounds of `round_size` packed positions).

    whash: (M, w_max) uint32 left-compacted spell hashes; n_words: (M,);
    win0: (M, n_ctx) int32 per-row word-history windows (oldest first,
    -1 = empty).  lookup_wid(whash (R,)) -> wid (R,) int32;
    score_pos(win (R, n_ctx), wid (R,)) -> lp (R,) must be the LM's exact
    per-position score (same lookups/accumulation as its sequential
    `score`).  Returns (final windows (M, n_ctx), lp_sum (M,)).

    Mechanics: worklist position p of word j in row r is off[r] + j
    (off = exclusive cumsum), so packing is a gather at (rowid, local j),
    with rowid recovered by a vectorized rank-count against off (an
    (R, M) compare-sum — cheaper than per-position binary-search
    gathers).  In-round word contexts come from the round's own wid
    vector (row-major ⇒ a word's predecessors are at p-1, p-2, …) with
    per-row carried windows covering round/chunk boundaries; per-row
    score sums use a segmented in-round scan (sums stay segment-local,
    no large-magnitude cumsum cancellation).
    """
    from .indexing import flat_take

    m, w_max = whash.shape
    n_ctx = win0.shape[1]
    r_sz = min(round_size or m, m * w_max)
    off = jnp.cumsum(n_words) - n_words  # exclusive offsets (M,)
    total = off[-1] + n_words[-1] if m else jnp.int32(0)
    iota_r = jnp.arange(r_sz, dtype=jnp.int32)

    def seg_op(a, b):
        # segmented running sum: (start_flag, value) pairs
        return a[0] | b[0], jnp.where(b[0], b[1], a[1] + b[1])

    def cond(c):
        return c[0] * r_sz < total

    def body(c):
        r, win_cur, acc = c
        s = r * r_sz
        p = s + iota_r
        live = p < total
        # rowid by rank count: last row with off <= p
        rid = jnp.sum((off[None, :] <= p[:, None]).astype(jnp.int32),
                      axis=1) - 1
        rid = jnp.clip(rid, 0, m - 1)
        j = p - off[rid]
        # flat 1-D gather (the fast TPU form — ops/indexing.py)
        wid = lookup_wid(whash.reshape(-1)[rid * w_max + j])

        # context: k-th previous word of the same row is wid[i-k] when it
        # falls inside this round, else carried window column
        # n_ctx - k + m_cnt (m_cnt = in-round same-row predecessors < k)
        shifted = []
        for k in range(1, n_ctx + 1):
            wk = jnp.concatenate(
                [jnp.zeros((k,), wid.dtype), wid[:-k]]) if k < r_sz else (
                jnp.zeros((r_sz,), wid.dtype))
            rk = jnp.concatenate(
                [jnp.full((k,), -1, jnp.int32), rid[:-k]]) if k < r_sz \
                else jnp.full((r_sz,), -1, jnp.int32)
            shifted.append((wk, (rk == rid) & (p - k >= s)))
        m_cnt = sum(sk.astype(jnp.int32) for _, sk in shifted)
        wrows = win_cur[rid]  # (R, n_ctx)
        cols = []
        for k in range(1, n_ctx + 1):
            wk, same_k = shifted[k - 1]
            fb_col = jnp.clip(n_ctx - k + m_cnt, 0, n_ctx - 1)
            fb = flat_take(wrows, fb_col[:, None])[:, 0]
            cols.append(jnp.where(same_k, wk, fb))
        win_v = jnp.stack(cols[::-1], axis=1)  # oldest first

        lp = jnp.where(live, score_pos(win_v, wid), 0.0)
        # per-row sums: segmented scan keeps additions segment-local
        start = ~shifted[0][1] if n_ctx >= 1 else jnp.ones((r_sz,), bool)
        run = jax.lax.associative_scan(seg_op, (start, lp))[1]
        lo = jnp.clip(off - s, 0, r_sz)            # round-local [lo, hi)
        hi = jnp.clip(off + n_words - s, 0, r_sz)
        row_lp = jnp.where(hi > lo, run[jnp.clip(hi - 1, 0, r_sz - 1)], 0.0)
        acc = acc + row_lp

        # carried-window advance: last n_ctx of (win_cur ++ round words)
        cnt = hi - lo
        new_cols = []
        for k in range(n_ctx):  # k-th newest
            from_round = wid[jnp.clip(hi - 1 - k, 0, r_sz - 1)]
            old_col = jnp.clip(n_ctx - 1 - (k - cnt), 0, n_ctx - 1)
            from_old = flat_take(win_cur, old_col[:, None])[:, 0]
            new_cols.append(jnp.where(cnt > k, from_round, from_old))
        win_cur = jnp.stack(new_cols[::-1], axis=1)
        return r + 1, win_cur, acc

    _, win_fin, lp_sum = jax.lax.while_loop(
        cond, body, (jnp.int32(0), win0,
                     jnp.zeros((m,), jnp.float32)))
    return win_fin, lp_sum


class _FastTable:
    """Device hash table with a TPU-cost-aware layout (two regimes,
    measured on v5e — ops/indexing.py):

      * LARGE tables (HBM-resident): gather cost is per gathered ROW
        (~10-20 ns each, width-insensitive), so entries pack into 8-entry
        BUCKETS read as one wide row — one gather + 8 compare-selects per
        lookup, ~4x cheaper than probing.
      * SMALL tables (<= _PROBE_MAX entries, VMEM-resident): gathers are
        bandwidth-bound, so narrow (2 + payload)-wide rows win over wide
        buckets; entries are placed by CUCKOO 2-choice hashing (each key
        owns exactly two candidate slots, displacement at build time), so
        a lookup is TWO independent narrow gathers — half the round-3
        4-probe linear walk (VERDICT r4 item 8).

    items: [(bucket_hash uint32, key uint32, payload float tuple)]; the
    builder grows-and-rebuilds on overflow; `on_dup='error'` rejects
    distinct items with identical (hash, key) (true collisions).
    Payload floats must be exact in f32 (ids < 2^24, log-probs).

    Keys are stored as TWO exact 16-bit-valued floats (hi, lo), never as
    f32 BITCASTS of the raw uint32: bitcast patterns land on denormals for
    ~0.4% of hashes and TPU pipelines flush denormals to zero, silently
    breaking those entries (caught by the on-chip suite, round 3).
    """

    def __init__(self, items, payload_width, on_dup="overwrite"):
        self._pw = payload_width
        self._bucketed = len(items) > _PROBE_MAX
        if self._bucketed:
            self._m, self._packed = self._build(
                items, payload_width, _BUCKET, len(items), on_dup)
        else:
            self._m, self._packed = self._build_probe(
                items, payload_width, on_dup)

    @staticmethod
    def _build(items, pw, bucket, min_rows, on_dup):
        m_b = 8
        while m_b < max(min_rows, 1):
            m_b *= 2
        while True:
            keys = np.zeros((m_b, bucket), np.uint32)
            occ = np.zeros((m_b, bucket), bool)
            pay = np.zeros((m_b, bucket, pw), np.float32)
            counts = np.zeros((m_b,), np.int32)
            ok = True
            for hidx, key, payload in items:
                b = int(hidx) & (m_b - 1)
                dup = next(
                    (s for s in range(counts[b]) if keys[b, s] == key), None)
                if dup is not None:
                    if on_dup == "error":
                        raise ValueError(
                            f"hash collision for key {int(key):#x}")
                    pay[b, dup] = payload
                    continue
                if counts[b] >= bucket:
                    ok = False
                    break
                s = counts[b]
                keys[b, s] = key
                occ[b, s] = True
                pay[b, s] = payload
                counts[b] += 1
            if ok:
                break
            m_b *= 2
        packed = np.zeros((m_b, bucket, 3 + pw), np.float32)
        packed[..., 0] = (keys >> 16).astype(np.float32)
        packed[..., 1] = (keys & 0xFFFF).astype(np.float32)
        packed[..., 2] = occ
        packed[..., 3:] = pay
        return m_b, jnp.asarray(packed)

    # second-choice slot: a fixed remix of the bucket hash, identical in
    # the NumPy builder and the jnp lookup (uint32 wraparound both sides)
    _REMIX = np.uint32(0x85EBCA6B)

    @classmethod
    def _alt_slot(cls, h):
        """The two candidate slots of bucket-hash h are (h & m-1) and
        this remix (& m-1); an entry always lives in one of them."""
        return (h * cls._REMIX) ^ (h >> np.uint32(15))

    @classmethod
    def _build_probe(cls, items, pw, on_dup):
        """Cuckoo 2-choice layout: (m, 2 + pw) narrow rows; each key owns
        slots i1 = h & (m-1) and i2 = remix(h) & (m-1), with build-time
        displacement (kick loop) — so a lookup is exactly TWO gathers.
        4x-sized tables (load 0.25) place without displacement almost
        always; the builder grows on a stuck kick chain."""
        m = 8
        while m < 4 * max(len(items), 1):
            m *= 2
        while True:
            keys = np.zeros((m,), np.uint32)
            hsh = np.zeros((m,), np.uint32)  # builder-only: occupant's h
            occ = np.zeros((m,), bool)
            pay = np.zeros((m, pw), np.float32)
            ok = True
            with np.errstate(over="ignore"):
                for hidx, key, payload in items:
                    h = np.uint32(hidx)
                    i1 = int(h) & (m - 1)
                    i2 = int(cls._alt_slot(h)) & (m - 1)
                    dup = next((j for j in (i1, i2)
                                if occ[j] and keys[j] == key
                                and hsh[j] == h), None)
                    if dup is not None:
                        if on_dup == "error":
                            raise ValueError(
                                f"hash collision for key {int(key):#x}")
                        pay[dup] = payload
                        continue
                    # cuckoo insert: take an empty candidate slot, else
                    # evict i1's occupant to ITS alternate, repeat
                    cur = (h, key, np.asarray(payload, np.float32))
                    j = i1 if not occ[i1] else (i2 if not occ[i2] else i1)
                    for _ in range(64):
                        if not occ[j]:
                            occ[j] = True
                            hsh[j], keys[j], pay[j] = cur
                            cur = None
                            break
                        vic = (hsh[j], keys[j], pay[j].copy())
                        hsh[j], keys[j], pay[j] = cur
                        v1 = int(vic[0]) & (m - 1)
                        v2 = int(cls._alt_slot(vic[0])) & (m - 1)
                        nxt = v2 if j == v1 else v1
                        if nxt == j:  # degenerate i1 == i2: stuck
                            cur = vic
                            break
                        cur, j = vic, nxt
                    if cur is not None:
                        ok = False
                        break
            if ok:
                break
            m *= 2
        packed = np.zeros((m, 3 + pw), np.float32)
        packed[:, 0] = (keys >> 16).astype(np.float32)
        packed[:, 1] = (keys & 0xFFFF).astype(np.float32)
        packed[:, 2] = occ
        packed[:, 3:] = pay
        return m, jnp.asarray(packed)

    def lookup(self, hidx, key):
        """(hit, [payload columns]) for uint32 hash/key arrays (any shape).
        At most one stored entry matches a key in its probe window/bucket,
        so the masked payload sums select exactly the matching entry."""
        pw = self._pw
        # exact 16-bit halves of the query key as floats (see class doc)
        khi = (key >> jnp.uint32(16)).astype(jnp.float32)
        klo = (key & jnp.uint32(0xFFFF)).astype(jnp.float32)
        if self._bucketed:
            rows = self._packed[
                (hidx & jnp.uint32(self._m - 1)).astype(jnp.int32)]
            hit_s = ((rows[..., 2] > 0.5)
                     & (rows[..., 0] == khi[..., None])
                     & (rows[..., 1] == klo[..., None]))
            hit = jnp.any(hit_s, axis=-1)
            outs = [jnp.sum(jnp.where(hit_s, rows[..., 3 + i], 0.0), axis=-1)
                    for i in range(pw)]
            return hit, outs
        mask = jnp.uint32(self._m - 1)
        idx0 = (hidx & mask).astype(jnp.int32)
        idx1 = (self._alt_slot(hidx) & mask).astype(jnp.int32)
        hit = jnp.zeros(hidx.shape, bool)
        outs = [jnp.zeros(hidx.shape, jnp.float32) for _ in range(pw)]
        for idx in (idx0, idx1):  # the key's two cuckoo slots
            row = self._packed[idx]
            h = ((row[..., 2] > 0.5) & (row[..., 0] == khi)
                 & (row[..., 1] == klo) & ~hit)
            outs = [jnp.where(h, row[..., 3 + i], o)
                    for i, o in enumerate(outs)]
            hit = hit | h
        return hit, outs


class _WordHash:
    """Spell-hash -> word-id table (one _FastTable lookup per query);
    shared by the word-level LMs."""

    _MULT = np.uint32(31)
    _SEED = np.uint32(5381)

    def __init__(self, word_spellings, miss_value):
        self.miss = int(miss_value)
        items = []
        with np.errstate(over="ignore"):
            for wid, spell in enumerate(word_spellings):
                h = self._SEED
                for c in spell:
                    h = h * self._MULT + np.uint32(int(c) + 1)
                items.append((h, h, (float(wid),)))
        # duplicate full-hash spellings are REAL collisions -> error (word
        # ids would be silently conflated)
        self._t = _FastTable(items, 1, on_dup="error")

    def lookup(self, h):
        """uint32 spell-hashes (any shape) -> word ids (miss_value on miss)."""
        hit, (wid,) = self._t.lookup(h, h)
        return jnp.where(hit, wid.astype(jnp.int32), self.miss)


class WordNGramLM(_WordBoundaryMode):
    """Word-level shallow fusion — the reference's KenLM behavior: hypotheses
    are scored with a WORD bigram each time a word completes (at the word
    boundary and at end of utterance), not per character (SURVEY.md §3.1 N6,
    §4.4 "[KenLM: on word boundary, add alpha*lm_logp + beta]").  Boundaries
    are either a separator token (space — char CTC) or prefix-marked
    word-starter tokens (BPE '▁…' — pass `boundary_ids`), see
    _WordBoundaryMode.

    TPU-native mechanics: per-beam state is (previous word id, rolling hash
    of the word being typed, its length); completed words resolve to word
    ids through a device-side open-addressing hash table (one gather + 4
    linear probes, fully vectorized); the word-bigram table is dense
    (vocab_words^2 — fine for the few-thousand-word LMs used with char CTC;
    larger LMs would bucket the bigrams by hash the same way).

    Build from an ARPA word LM with `from_arpa`, or pass tables directly.
    Unknown words (hash misses) score `unk_logp` and condition as <unk>.
    """

    _MULT = np.uint32(31)
    _SEED = np.uint32(5381)

    def __init__(self, word_spellings, bigram_logp, start_logp, space_id,
                 unigram_logp=None, eos_logp=None, unk_logp=-13.8,
                 boundary_ids=None):
        """word_spellings: list of tuples of token ids (the label
        alphabet's) for each word — in prefix mode each starts with its
        boundary token; bigram_logp (Wv, Wv); start_logp (Wv,); eos_logp
        (Wv,) optional; space_id: the word-separator label id (or None
        with `boundary_ids` for prefix/BPE mode)."""
        wv = len(word_spellings)
        self._wv = wv
        self._init_boundary(space_id, boundary_ids)
        self._unk = wv + 1  # context row for unknown words; wv = <s>
        bigram_logp = np.asarray(bigram_logp, np.float32)
        start_logp = np.asarray(start_logp, np.float32)
        if unigram_logp is None:
            unigram_logp = np.full((wv,), unk_logp, np.float32)
        unigram_logp = np.asarray(unigram_logp, np.float32)
        # Extended table: rows = context (words, <s>, <unk>);
        # cols = next word (words, then col wv = <unk> next-word).
        ext = np.full((wv + 2, wv + 1), unk_logp, np.float32)
        ext[:wv, :wv] = bigram_logp
        ext[wv, :wv] = start_logp
        ext[wv + 1, :wv] = unigram_logp  # unk context backs off to unigrams
        self._table = jnp.asarray(ext)
        self._eos = jnp.asarray(
            np.concatenate([
                np.asarray(eos_logp, np.float32) if eos_logp is not None
                else np.zeros((wv,), np.float32),
                np.zeros((2,), np.float32),
            ])
        )

        self._wh = _WordHash(word_spellings, self._unk)
        self._unk_logp = float(unk_logp)

    @classmethod
    def from_arpa(cls, path, words, alphabet=None, space_symbol=" ",
                  spellings=None, boundary_ids=None, **kw):
        """words: list of word strings; alphabet: utils.text.Alphabet.
        For subword (BPE) models pass `spellings` (token-id tuples per
        word, each starting with its boundary token) and `boundary_ids`
        instead of an alphabet."""
        from ..utils.arpa import load_arpa

        uni, bigram, start, eos = load_arpa(path, list(words))
        if spellings is None:
            spellings = [tuple(alphabet.encode(w)) for w in words]
        space_id = (None if boundary_ids is not None
                    else alphabet.encode(space_symbol)[0])
        return cls(spellings, bigram, start, space_id, unigram_logp=uni,
                   eos_logp=eos, boundary_ids=boundary_ids, **kw)

    def _lookup(self, h):
        return self._wh.lookup(h)

    # -- ShallowFusionLM protocol --------------------------------------------
    def init_state(self, w):
        return (
            jnp.full((w,), self._wv, jnp.int32),      # prev word = <s>
            jnp.full((w,), self._SEED, jnp.uint32),   # rolling word hash
            jnp.zeros((w,), jnp.int32),               # chars in current word
        )

    def score(self, state, ck):
        prev, curh, curlen = state
        is_b = self._cand_boundary(ck)[None, :]  # (1, K)
        wid = self._lookup(curh)  # (W,) word completed by a boundary now
        # completed-word score; empty words (double space) score 0
        complete_lp = self._table[prev, jnp.minimum(wid, self._wv)]
        complete_lp = jnp.where(wid == self._unk, self._unk_logp, complete_lp)
        complete_lp = jnp.where(curlen > 0, complete_lp, 0.0)  # (W,)
        lm_lp = jnp.where(is_b, complete_lp[:, None], 0.0)  # (W, K)

        new_prev = jnp.where(
            is_b, jnp.where(curlen > 0, wid, prev)[:, None],
            prev[:, None],
        ).astype(jnp.int32)
        new_hash, new_len = self._advance_word_hash(is_b, curh, curlen, ck)
        return lm_lp, (new_prev, new_hash, new_len)

    def select(self, state, state_ext, parent, kk, is_stay):
        out = []
        for s, se in zip(state, state_ext):
            out.append(jnp.where(is_stay, s[parent], se[parent, kk]))
        return tuple(out)

    def final(self, state):
        """Complete the trailing word (utterances rarely end in a space)."""
        prev, curh, curlen = state
        wid = self._lookup(curh)
        lp = self._table[prev, jnp.minimum(wid, self._wv)]
        lp = jnp.where(wid == self._unk, self._unk_logp, lp)
        trailing = jnp.where(curlen > 0, lp, 0.0)
        ended = jnp.where(curlen > 0, wid, prev)
        return trailing + self._eos[jnp.minimum(ended, self._wv + 1)]

    @partial(jax.jit, static_argnums=0)
    def score_chunk(self, state, toks):
        """Vectorized chunk replay (see NGramLM.score_chunk): words
        completed inside the chunk are segmented/hashed with _chunk_words,
        then scored over the PER-ROW packed worklist (_word_score_packed):
        spell lookup + one flat bigram gather per word that actually
        exists — no per-frame scan, no (M, w_cap) grid padding."""
        prev, curh, curlen = state
        seg = self._segment_chunk(toks, curh, curlen)
        ncol = self._wv + 1

        def score_pos(win_v, wid):
            lp = self._table.reshape(-1)[
                win_v[:, 0] * ncol + jnp.minimum(wid, self._wv)]
            return jnp.where(wid == self._unk, self._unk_logp, lp)

        new_win, lp_sum = _word_score_packed(
            seg["whash"], seg["n_words"], prev[:, None].astype(jnp.int32),
            self._wh.lookup, score_pos)
        return lp_sum, (new_win[:, 0], seg["new_curh"], seg["new_curlen"])


class _HashedNGramTables:
    """Arbitrary-order n-gram score/backoff tables behind dual-hash
    open-addressing — the KenLM-parity core (SURVEY.md §3.1 N6).

    One BUCKETIZED table per order k (_build_buckets): bucket index from
    hash-1, entry key = hash-2 with an explicit occupancy flag (hash values
    must not be mangled to mark empties: grams differing only in the last
    token hash 1 apart), payload (logp, backoff).  A lookup is ONE gathered
    bucket row + 8 compare-selects, fully vectorized over (beam, candidate)
    — queryable from inside a compiled scan, and 4-8x cheaper than the
    probe-loop form on TPU (gather cost is per gathered row).  The same
    fold recipe hashes a k-gram and serves as the context prefix of a
    (k+1)-gram, so context hashes double as context-gram lookups for the
    backoff chain.

    LOW orders skip hashing entirely: unigrams always (a dense (lp, bo,
    occ) row per token id — one gathered row, no probes), bigrams when the
    id space is char-scale (dense (id1, id2)-indexed rows, <= ~800 KB).
    Query ids are in hand at every call site, so these are exact drop-ins
    for the hash lookups.

    SMALL id spaces skip the backoff chain at query time entirely: when
    n_ids**order fits _FULL_MAX entries (char-scale vocabs at order <= 3;
    any vocab <= ~1400 at order 2), the WHOLE backoff recursion is
    resolved at build time into a dense score table over (ctx window, w)
    row tuples — log p(w | ctx) is a pure function of the last (order-1)
    ids plus w, so one gathered f32 per scored position replaces the
    chain's ~3-5 gathered rows (gather cost on TPU is per gathered row —
    ops/indexing.py).  The build replays `score`'s f32 accumulation order
    in NumPy, so scores are bitwise identical to the chain's.
    """

    _M1 = np.uint32(2654435761)
    _M2 = np.uint32(0x85EBCA6B)
    _SEED1 = np.uint32(0x9E3779B9)
    _SEED2 = np.uint32(0x85EBCA77)
    _FULL_MAX = 1 << 21  # dense full-score entries cap (8 MB f32)

    def __init__(self, order, ngrams, unk_logp=None, dense_full=None):
        """ngrams: {k: [(ids_tuple, logp, backoff)], 'unk': logp|None} —
        the output of utils.arpa.parse_arpa_order.  dense_full: None =
        build the fully-resolved score table when it fits _FULL_MAX
        entries; False = never (forces the hashed/backoff query path —
        the large-id-space code path, pinned by tests); True = require
        it (raises if over the cap)."""
        self.order = int(order)
        self.unk_logp = float(
            unk_logp if unk_logp is not None
            else (ngrams.get("unk") if ngrams.get("unk") is not None else -23.0)
        )
        # Dense fast paths for the LOW orders, indexed by token id directly
        # (ids are in hand at every query site): unigrams are always dense
        # (one gathered row instead of a 4-probe hash lookup), bigrams too
        # when the id space is char-scale.  Row layout (lp, bo, occ); row 0
        # = id -2 (unk sentinel), row 1 = id -1 (empty), last row = out-of-
        # range miss.  Exactly equivalent to the hash lookups (same ARPA
        # entries, occ gates hits), minus their per-probe gathers.
        max_id = -1
        for k in range(1, self.order + 1):
            for ids, _, _ in ngrams.get(k, []):
                max_id = max(max_id, max(int(t) for t in ids))
        self._max_id = max_id
        n_ids = max_id + 4
        self._n_ids = n_ids
        fits = n_ids ** self.order <= self._FULL_MAX
        if dense_full and not fits:
            raise ValueError(
                f"dense_full requested but {n_ids}**{self.order} exceeds "
                f"the {self._FULL_MAX}-entry cap")
        self._full = None
        if fits and dense_full is not False:
            self._full = jnp.asarray(self._build_full(ngrams, n_ids))
        self._uni = None
        self._bi = None
        if self._full is None:
            uni = np.zeros((n_ids, 3), np.float32)
            for ids, lp, bo in ngrams.get(1, []):
                uni[int(ids[0]) + 2] = (lp, bo, 1.0)
            self._uni = jnp.asarray(uni)
            if self.order >= 2 and n_ids <= 259:  # dense bigram <= ~800 KB
                bi = np.zeros((n_ids * n_ids, 3), np.float32)
                for ids, lp, bo in ngrams.get(2, []):
                    bi[(int(ids[0]) + 2) * n_ids + int(ids[1]) + 2] = (
                        lp, bo, 1.0)
                self._bi = jnp.asarray(bi)

        self._tables = []
        for k in range(1, self.order + 1):
            if (self._full is not None or k == 1
                    or (k == 2 and self._bi is not None)):
                self._tables.append(None)  # served by a dense path
                continue
            items = []
            for ids, lp, bo in ngrams.get(k, []):
                h1, h2 = self._fold_np(ids)
                # exact (h1, h2) duplicates overwrite (re-listed grams)
                items.append((h1, h2, (lp, bo)))
            self._tables.append(_FastTable(items, 2))

    def _build_full(self, ngrams, n):
        """Resolve the whole backoff recursion into a flat (n**order,) f32
        score table over row-index tuples (ctx oldest..newest, w) — exact
        `score` semantics, f32 accumulation order replayed bitwise.
        Sentinel rows (0 = unk id, 1 = empty slot, n-1 = out-of-range)
        stay unoccupied in every per-order grid, so they miss all grams
        and back off naturally, exactly like the hashed lookups."""
        order = self.order
        lps, bos, occs = [], [], []
        for k in range(1, order + 1):
            lp = np.zeros((n,) * k, np.float32)
            bo = np.zeros((n,) * k, np.float32)
            oc = np.zeros((n,) * k, bool)
            for ids, l, b in ngrams.get(k, []):
                idx = tuple(int(t) + 2 for t in ids)
                lp[idx], bo[idx], oc[idx] = l, b, True
            lps.append(lp); bos.append(bo); occs.append(oc)

        def gram_w(k):  # k-gram ending in w: the last k grid axes
            sh = (1,) * (order - k) + (n,) * k
            return lps[k - 1].reshape(sh), occs[k - 1].reshape(sh)

        def gram_ctx(k):  # k-gram ending at the last ctx slot
            sh = (1,) * (order - 1 - k) + (n,) * k + (1,)
            return bos[k - 1].reshape(sh), occs[k - 1].reshape(sh)

        shape = (n,) * order
        acc = np.zeros(shape, np.float32)
        res = np.zeros(shape, np.float32)
        found = np.zeros(shape, bool)
        for k in range(order, 0, -1):
            lp, hit = gram_w(k)
            res = np.where(~found & hit, lp + acc, res)
            found = found | hit
            if k > 1:
                cbo, chit = gram_ctx(k - 1)
                acc = acc + np.where(chit, cbo, np.float32(0.0))
        return np.where(
            found, res, np.float32(self.unk_logp) + acc).reshape(-1)

    def _id_row(self, ids):
        """Clamp token ids to dense-table rows (sentinels/-oob -> miss)."""
        oob = (ids < -2) | (ids > self._max_id)
        return jnp.where(oob, self._n_ids - 1, ids + 2).astype(jnp.int32)

    def _dense1(self, ids):
        rows = self._uni[self._id_row(ids)]
        return rows[..., 0], rows[..., 1], rows[..., 2] > 0.5

    def _dense2(self, a, b):
        rows = self._bi[self._id_row(a) * self._n_ids + self._id_row(b)]
        return rows[..., 0], rows[..., 1], rows[..., 2] > 0.5

    @classmethod
    def _fold_np(cls, ids):
        with np.errstate(over="ignore"):
            h1, h2 = cls._SEED1, cls._SEED2
            for t in ids:
                h1 = h1 * cls._M1 + np.uint32(int(t) + 2)
                h2 = h2 * cls._M2 + np.uint32(int(t) + 2)
        return h1, h2

    @classmethod
    def _fold1(cls, h1, h2, tok):
        t = tok.astype(jnp.uint32) + jnp.uint32(2)
        return h1 * cls._M1 + t, h2 * cls._M2 + t

    def _lookup(self, k, h1, h2):
        """k-gram lookup (1-based order).  h1/h2: raw uint32 fold hashes
        (any shape).  Returns (logp, backoff, hit)."""
        hit, (lp, bo) = self._tables[k - 1].lookup(h1, h2)
        return lp, bo, hit

    def ctx_hashes(self, window):
        """window: (..., order-1) int32, oldest first, -1 = empty slot.
        Returns [(h1, h2)] raw fold hashes for context suffix lengths
        0..order-1; the same fold is both a gram lookup key and the prefix
        for one more _fold1 step."""
        out = [(
            jnp.full(window.shape[:-1], self._SEED1, jnp.uint32),
            jnp.full(window.shape[:-1], self._SEED2, jnp.uint32),
        )]
        n_ctx = window.shape[-1]
        for j in range(1, n_ctx + 1):
            h1 = jnp.full(window.shape[:-1], self._SEED1, jnp.uint32)
            h2 = jnp.full(window.shape[:-1], self._SEED2, jnp.uint32)
            for i in range(n_ctx - j, n_ctx):
                h1, h2 = self._fold1(h1, h2, window[..., i])
            out.append((h1, h2))
        return out

    def score(self, window, w):
        """log p(w | window) with full KenLM backoff semantics.

        window: (..., order-1) int32 (oldest first, -1 empty); w: broadcast-
        compatible int32 tokens.  A context slot holding -1 never matches any
        stored gram, so short histories back off naturally.
        """
        if self._full is not None:  # one gather: chain resolved at build
            n = self._n_ids
            if self.order == 1:
                return self._full[self._id_row(w)]
            idx = self._id_row(window[..., -(self.order - 1)])
            for i in range(-(self.order - 1) + 1, 0):
                idx = idx * n + self._id_row(window[..., i])
            return self._full[idx * n + self._id_row(w)]
        ctx = self.ctx_hashes(window)  # index = context length

        def gram(k, last):
            """(lp, bo, hit) of the k-gram ending in `last`: dense by ids
            for the low orders, hashed otherwise.  last = None means the
            gram ends at the window's last slot (a context gram)."""
            if k == 1:
                return self._dense1(window[..., -1] if last is None else last)
            if k == 2 and self._bi is not None:
                a = window[..., -2] if last is None else window[..., -1]
                return self._dense2(a, window[..., -1] if last is None
                                    else last)
            if last is None:
                h1, h2 = ctx[k - 1]
            else:
                h1, h2 = self._fold1(*ctx[k - 1], last)
            return self._lookup(k, h1, h2)

        acc = jnp.zeros(jnp.broadcast_shapes(window.shape[:-1], w.shape),
                        jnp.float32)
        res = jnp.zeros_like(acc)
        found = jnp.zeros(acc.shape, bool)
        for k in range(self.order, 0, -1):
            lp, _, hit = gram(k, w)
            res = jnp.where(~found & hit, lp + acc, res)
            found = found | hit
            if k > 1:
                # backoff weight of the (k-1)-length context gram (0 if the
                # context itself is unseen — standard ARPA semantics)
                _, cbo, chit = gram(k - 1, None)
                acc = acc + jnp.where(chit, cbo, 0.0)
        return jnp.where(found, res, self.unk_logp + acc)

    def score_sequence(self, full, p):
        """log p(full[j] | full[:j]) for the LAST p positions of `full`
        ((..., n_hist + p) int32, oldest first; n_hist >= order-1) — the
        vectorized-replay twin of `score` for chunk scoring.

        Key saving vs p independent `score` calls: the backoff CONTEXT
        gram of position j+1 IS the (k-1)-gram ending at position j, so
        each (k, end-position) gram is hashed and looked up ONCE and
        reused as both the scored gram of j and the context of j+1 —
        `order` table gathers per position instead of 2*order-1.  Bitwise
        identical to `score` per position (same folds, same lookups, same
        accumulation order).
        """
        if p == 0:
            return jnp.zeros(full.shape[:-1] + (0,), jnp.float32)
        if self._full is not None:  # one gather per position (see `score`)
            n = self._n_ids
            s0 = full.shape[-1] - p - (self.order - 1)
            idx = self._id_row(full[..., s0:s0 + p])
            for i in range(1, self.order):
                idx = idx * n + self._id_row(full[..., s0 + i:s0 + i + p])
            return self._full[idx]
        n_hist = full.shape[-1] - p
        lead = full.shape[:-1]
        grams = {}  # k -> (lp, bo, hit) at k-gram end offsets; length
        #             p+1 for k < order (first entry ends at n_hist-1,
        #             carrying position 0's contexts), p for k == order
        for k in range(1, self.order + 1):
            length = p if k == self.order else p + 1
            e0 = n_hist if k == self.order else n_hist - 1
            if k == 1:
                grams[k] = self._dense1(full[..., e0:e0 + length])
                continue
            if k == 2 and self._bi is not None:
                grams[k] = self._dense2(full[..., e0 - 1:e0 - 1 + length],
                                        full[..., e0:e0 + length])
                continue
            h1 = jnp.full(lead + (length,), self._SEED1, jnp.uint32)
            h2 = jnp.full(lead + (length,), self._SEED2, jnp.uint32)
            for i in range(k):
                s = e0 - k + 1 + i
                h1, h2 = self._fold1(h1, h2, full[..., s:s + length])
            grams[k] = self._lookup(k, h1, h2)
        shape = lead + (p,)
        acc = jnp.zeros(shape, jnp.float32)
        res = jnp.zeros(shape, jnp.float32)
        found = jnp.zeros(shape, bool)
        for k in range(self.order, 0, -1):
            lp, _, hit = grams[k]
            if k < self.order:
                lp, hit = lp[..., 1:], hit[..., 1:]
            res = jnp.where(~found & hit, lp + acc, res)
            found = found | hit
            if k > 1:
                _, cbo, chit = grams[k - 1]
                cbo, chit = cbo[..., :-1], chit[..., :-1]
                acc = acc + jnp.where(chit, cbo, 0.0)
        return jnp.where(found, res, self.unk_logp + acc)


class HashedNGramLM:
    """Token-level n-gram LM of ANY order with KenLM backoff semantics,
    implementing the ShallowFusionLM protocol.  Per-beam state is the last
    (order-1) token ids; scoring is ONE gathered f32 per candidate when
    the id space is small enough for the build-time-resolved dense score
    table (char-scale vocabs at order <= 3 — see _HashedNGramTables), and
    O(order) hashed lookups otherwise.  `dense_full=False` forces the
    hashed path; None (default) auto-selects.

    Build from an ARPA file with `from_arpa` (any order), or pass the parsed
    ngrams dict directly.  <s> conditions the first tokens; `final()` adds
    the </s> score.
    """

    def __init__(self, order, ngrams, vocab_size, unk_logp=None,
                 use_eos=True, dense_full=None):
        self._t = _HashedNGramTables(order, ngrams, unk_logp, dense_full)
        self.order = self._t.order
        self._v = int(vocab_size)
        self._bos = self._v       # parse_arpa_order's <s> id
        self._eos = self._v + 1
        self._use_eos = bool(use_eos)

    @classmethod
    def from_arpa(cls, path, vocab, **kw):
        from ..utils.arpa import parse_arpa_order

        order, ngrams = parse_arpa_order(path, list(vocab))
        return cls(order, ngrams, len(vocab), **kw)

    # -- ShallowFusionLM protocol -------------------------------------------
    def init_state(self, w):
        n_ctx = max(self.order - 1, 1)
        win = jnp.full((w, n_ctx), -1, jnp.int32)
        return win.at[:, -1].set(self._bos)

    def score(self, state, ck):
        # state: (W, n_ctx); ck: (K,) -> lm_lp (W, K), state_ext (W, K, n_ctx)
        lm_lp = self._t.score(state[:, None, :], ck[None, :].astype(jnp.int32))
        new_win = jnp.concatenate(
            [
                jnp.broadcast_to(
                    state[:, None, 1:], (state.shape[0], ck.shape[0],
                                         state.shape[1] - 1)
                ),
                jnp.broadcast_to(
                    ck[None, :, None].astype(jnp.int32),
                    (state.shape[0], ck.shape[0], 1),
                ),
            ],
            axis=-1,
        ) if state.shape[1] > 1 else jnp.broadcast_to(
            ck[None, :, None].astype(jnp.int32),
            (state.shape[0], ck.shape[0], 1),
        )
        return lm_lp, new_win

    def select(self, state, state_ext, parent, kk, is_stay):
        return jnp.where(
            is_stay[:, None], state[parent], state_ext[parent, kk]
        )

    def final(self, state):
        if not self._use_eos:
            return jnp.zeros((state.shape[0],), jnp.float32)
        w = jnp.full((state.shape[0],), self._eos, jnp.int32)
        return self._t.score(state, w)

    _TOKEN_ROUND = 16

    @partial(jax.jit, static_argnums=0)
    def score_chunk(self, state, toks):
        """Vectorized chunk replay (see NGramLM.score_chunk): every emitted
        token is scored against its (order-1)-token history via
        `score_sequence` (each (order, position) gram looked up once,
        shared between scoring and backoff contexts) — no sequential scan.
        Positions run in data-adaptive ROUNDS of _TOKEN_ROUND columns
        (the emitted tokens are a left-compacted prefix of `toks`): table
        gathers cover ceil(max_emitted / 16) * 16 position slots instead
        of the full chunk capacity, which on peaked lattices is most of
        the capacity saved.  Jitted with `self` static (LM objects hash
        by identity — module docstring) so eager callers don't re-trace
        the round loop per call; under an outer jit it inlines."""
        n_ctx = state.shape[1]
        from .indexing import flat_take

        n_valid = jnp.sum(toks >= 0, axis=1).astype(jnp.int32)

        def round_fn(win_r, tok_sl, nv):
            p = tok_sl.shape[1]
            vmask = jnp.arange(p, dtype=jnp.int32)[None] < nv[:, None]
            fullr = jnp.concatenate(
                [win_r, tok_sl.astype(jnp.int32)], axis=1)
            lp = self._t.score_sequence(fullr, p)
            idx = nv[:, None] + jnp.arange(n_ctx, dtype=jnp.int32)[None]
            return (flat_take(fullr, idx),
                    jnp.sum(jnp.where(vmask, lp, 0.0), axis=1))

        new_win, lp_sum = _word_score_rounds(
            toks, n_valid, state, round_fn, round_cap=self._TOKEN_ROUND)
        return lp_sum, new_win


class HashedWordNGramLM(_WordBoundaryMode):
    """Word-level shallow fusion at ANY n-gram order — full KenLM parity for
    the reference's word-LM behavior (SURVEY.md §3.1 N6): hypotheses are
    scored each time a word completes (at the word boundary and at end of
    utterance), with arbitrary-order backoff over the word history.
    Boundary modes: separator token (space — char CTC) or prefix-marked
    word starters (BPE '▁…' via `boundary_ids`), see _WordBoundaryMode.

    Per-beam state: (word-history window (order-1), rolling spell-hash of
    the word being typed, its length).  Completed words resolve to word ids
    through the open-addressing spell table (_WordHash); scores come from
    the hashed n-gram tables (_HashedNGramTables) over word ids.  Unknown
    words score the <unk> log-prob (plus the context's backoff chain) and
    enter the history as an id that matches no stored gram — the natural
    KenLM behavior of conditioning through <unk>.

    Build from an ARPA word LM of any order with `from_arpa`.
    """

    _MULT = np.uint32(31)
    _SEED = np.uint32(5381)

    def __init__(self, word_spellings, order, ngrams, space_id,
                 unk_logp=None, dense_full=None, boundary_ids=None):
        wv = len(word_spellings)
        self._wv = wv
        self._init_boundary(space_id, boundary_ids)
        self._bos = wv       # parse_arpa_order's <s> id
        self._eos = wv + 1
        self._unk_word = -2  # history sentinel: matches no stored gram
        self._t = _HashedNGramTables(order, ngrams, unk_logp, dense_full)
        self.order = self._t.order
        self._wh = _WordHash(word_spellings, self._unk_word)

    @classmethod
    def from_arpa(cls, path, words, alphabet=None, space_symbol=" ",
                  spellings=None, boundary_ids=None, **kw):
        """words: list of word strings; alphabet: utils.text.Alphabet.
        For subword (BPE) models pass `spellings` (token-id tuples per
        word, each starting with its boundary token) and `boundary_ids`
        instead of an alphabet."""
        from ..utils.arpa import parse_arpa_order

        order, ngrams = parse_arpa_order(path, list(words))
        if spellings is None:
            spellings = [tuple(alphabet.encode(w)) for w in words]
        space_id = (None if boundary_ids is not None
                    else alphabet.encode(space_symbol)[0])
        return cls(spellings, order, ngrams, space_id,
                   boundary_ids=boundary_ids, **kw)

    # -- ShallowFusionLM protocol -------------------------------------------
    def init_state(self, w):
        n_ctx = max(self.order - 1, 1)
        win = jnp.full((w, n_ctx), -1, jnp.int32).at[:, -1].set(self._bos)
        return (
            win,                                     # word history window
            jnp.full((w,), self._SEED, jnp.uint32),  # rolling word hash
            jnp.zeros((w,), jnp.int32),              # chars in current word
        )

    def _shift(self, win, new_word):
        if win.shape[-1] == 1:
            return new_word[..., None].astype(jnp.int32)
        return jnp.concatenate(
            [win[..., 1:], new_word[..., None].astype(jnp.int32)], axis=-1
        )

    def score(self, state, ck):
        win, curh, curlen = state
        is_b = self._cand_boundary(ck)[None, :]  # (1, K)
        wid = self._wh.lookup(curh)  # (W,) word completed by a boundary now
        complete_lp = self._t.score(win, wid)  # unk wid -> unk + backoffs
        complete_lp = jnp.where(curlen > 0, complete_lp, 0.0)  # (W,)
        lm_lp = jnp.where(is_b, complete_lp[:, None], 0.0)  # (W, K)

        k = ck.shape[0]
        w = win.shape[0]
        win_b = jnp.broadcast_to(win[:, None, :], (w, k, win.shape[-1]))
        advanced = self._shift(win_b, jnp.broadcast_to(wid[:, None], (w, k)))
        new_win = jnp.where(
            (is_b & (curlen > 0)[:, None])[..., None], advanced, win_b
        )
        new_hash, new_len = self._advance_word_hash(is_b, curh, curlen, ck)
        return lm_lp, (new_win, new_hash, new_len)

    def select(self, state, state_ext, parent, kk, is_stay):
        win, curh, curlen = state
        ewin, ehash, elen = state_ext
        return (
            jnp.where(is_stay[:, None], win[parent], ewin[parent, kk]),
            jnp.where(is_stay, curh[parent], ehash[parent, kk]),
            jnp.where(is_stay, curlen[parent], elen[parent, kk]),
        )

    def final(self, state):
        """Complete the trailing word, then add the </s> score."""
        win, curh, curlen = state
        wid = self._wh.lookup(curh)
        trailing = jnp.where(curlen > 0, self._t.score(win, wid), 0.0)
        ended = jnp.where(
            (curlen > 0)[:, None],
            self._shift(win, wid),
            win,
        )
        eos = jnp.full((win.shape[0],), self._eos, jnp.int32)
        return trailing + self._t.score(ended, eos)

    @partial(jax.jit, static_argnums=0)
    def score_chunk(self, state, toks):
        """Vectorized chunk replay (see NGramLM.score_chunk): chunk words
        from _chunk_words, then PER-ROW data-adaptive packed replay
        (_word_score_packed): spell lookup + the exact backoff `score`
        only at word positions that exist — table traffic scales with the
        chunk's actual word count, not the (M, w_cap) round grid."""
        win, curh, curlen = state
        seg = self._segment_chunk(toks, curh, curlen)

        new_win, lp_sum = _word_score_packed(
            seg["whash"], seg["n_words"], win,
            self._wh.lookup,                       # miss -> -2 (unk)
            lambda w_v, wid: self._t.score(w_v, wid))
        return lp_sum, (new_win, seg["new_curh"], seg["new_curlen"])


class HotwordBoostLM:
    """Hotword / phrase boosting (pyctcdecode's `hotwords` feature): adds
    `weight` for every emitted token that CONTINUES some hotword phrase
    (the emitted suffix matches one of its prefixes), plus
    `complete_bonus` each time a full phrase completes.  A protocol LM
    carrying no probabilities — stack it on a real LM with `CompositeLM`,
    or use it alone (the decoder's lm_alpha scales the boost).

    Matching is longest-suffix against the hashed prefix set of all
    phrases: per-beam state is the last (max_len - 1) token ids, so the
    match state is a pure function of the token window — Aho-Corasick-
    style suffix recovery comes for free ("a b c d" re-enters phrase
    "b c d" at 'd' even though the "a b c…" match just failed), and
    chunk replay (`score_chunk`) vectorizes exactly like the n-gram LMs
    (ops/beam_chunked.py).  `phrases` are tuples of token ids (encode
    words/phrases with your alphabet or tokenizer first).
    """

    def __init__(self, phrases, weight=1.0, complete_bonus=0.0):
        phrases = [tuple(int(t) for t in p) for p in phrases]
        if not phrases or any(len(p) == 0 for p in phrases):
            raise ValueError("phrases must be non-empty token sequences")
        if any(t < 0 for p in phrases for t in p):
            raise ValueError("phrase token ids must be non-negative")
        self._L = max(len(p) for p in phrases)
        complete = set(phrases)
        prefixes = {}
        for p in phrases:
            for l in range(1, len(p) + 1):
                pre = p[:l]
                prefixes[pre] = prefixes.get(pre, False) or (pre in complete)
        items = []
        for pre, comp in prefixes.items():
            h1, h2 = _HashedNGramTables._fold_np(pre)
            items.append((h1, h2, (float(comp),)))
        # distinct prefixes sharing (h1, h2) would conflate matches
        self._t = _FastTable(items, 1, on_dup="error")
        self._w = float(weight)
        self._cb = float(complete_bonus)

    def _bonus(self, window, w):
        """Boost for appending token(s) w to window(s) (..., n_ctx)."""
        n_ctx = window.shape[-1]
        h = _HashedNGramTables
        matched = jnp.zeros(
            jnp.broadcast_shapes(window.shape[:-1], w.shape), bool)
        complete = jnp.zeros(matched.shape, bool)
        for l in range(1, self._L + 1):  # suffix of length l ends in w
            h1 = jnp.full(window.shape[:-1], h._SEED1, jnp.uint32)
            h2 = jnp.full(window.shape[:-1], h._SEED2, jnp.uint32)
            for i in range(n_ctx - (l - 1), n_ctx):
                h1, h2 = h._fold1(h1, h2, window[..., i])
            g1, g2 = h._fold1(h1, h2, w)
            hit, (comp,) = self._t.lookup(g1, g2)
            matched = matched | hit
            complete = complete | (hit & (comp > 0.5))
        return (self._w * matched.astype(jnp.float32)
                + self._cb * complete.astype(jnp.float32))

    # -- ShallowFusionLM protocol -------------------------------------------
    def init_state(self, w):
        return jnp.full((w, max(self._L - 1, 1)), -1, jnp.int32)

    def score(self, state, ck):
        cki = ck.astype(jnp.int32)
        lm_lp = self._bonus(state[:, None, :], cki[None, :])  # (W, K)
        w, k = lm_lp.shape
        if state.shape[1] > 1:
            new_win = jnp.concatenate(
                [jnp.broadcast_to(state[:, None, 1:],
                                  (w, k, state.shape[1] - 1)),
                 jnp.broadcast_to(cki[None, :, None], (w, k, 1))], axis=-1)
        else:
            new_win = jnp.broadcast_to(cki[None, :, None], (w, k, 1))
        return lm_lp, new_win

    def select(self, state, state_ext, parent, kk, is_stay):
        return jnp.where(
            is_stay[:, None], state[parent], state_ext[parent, kk])

    def final(self, state):
        return jnp.zeros((state.shape[0],), jnp.float32)

    @partial(jax.jit, static_argnums=0)
    def score_chunk(self, state, toks):
        """Vectorized chunk replay: each position's boost is a pure
        function of the sliding token window, evaluated with the same
        suffix-hash lookups as `score` — data-adaptive rounds like the
        n-gram LMs (no sequential scan)."""
        n_ctx = state.shape[1]
        from .indexing import flat_take

        n_valid = jnp.sum(toks >= 0, axis=1).astype(jnp.int32)
        h = _HashedNGramTables

        def round_fn(win_r, tok_sl, nv):
            p = tok_sl.shape[1]
            vmask = jnp.arange(p, dtype=jnp.int32)[None] < nv[:, None]
            fullr = jnp.concatenate(
                [win_r, tok_sl.astype(jnp.int32)], axis=1)
            lead = fullr.shape[:-1]
            matched = jnp.zeros(lead + (p,), bool)
            complete = jnp.zeros(lead + (p,), bool)
            for l in range(1, self._L + 1):
                h1 = jnp.full(lead + (p,), h._SEED1, jnp.uint32)
                h2 = jnp.full(lead + (p,), h._SEED2, jnp.uint32)
                for i in range(l):
                    s = n_ctx - l + 1 + i
                    h1, h2 = h._fold1(h1, h2, fullr[..., s:s + p])
                hit, (comp,) = self._t.lookup(h1, h2)
                matched = matched | hit
                complete = complete | (hit & (comp > 0.5))
            lp = (self._w * matched.astype(jnp.float32)
                  + self._cb * complete.astype(jnp.float32))
            idx = nv[:, None] + jnp.arange(n_ctx, dtype=jnp.int32)[None]
            return (flat_take(fullr, idx),
                    jnp.sum(jnp.where(vmask, lp, 0.0), axis=1))

        new_win, lp_sum = _word_score_rounds(
            toks, n_valid, state, round_fn,
            round_cap=HashedNGramLM._TOKEN_ROUND)
        return lp_sum, new_win


class CompositeLM:
    """Weighted sum of protocol LMs sharing one decode — e.g. a word-level
    KenLM plus a `HotwordBoostLM` (pyctcdecode's hotwords setup), or a
    token LM plus a word LM.  State is the tuple of member states, so
    every decode path (fused scan, chunked kernel, streaming, N-best
    rescoring) works unchanged.  The decoder's `lm_alpha`/`lm_beta` apply
    on top of the per-member `weights`."""

    def __init__(self, lms, weights=None):
        self._lms = tuple(lms)
        if not self._lms:
            raise ValueError("CompositeLM needs at least one member LM")
        self._w = tuple(float(x) for x in (
            weights if weights is not None else (1.0,) * len(self._lms)))
        if len(self._w) != len(self._lms):
            raise ValueError("weights must match the number of LMs")

    def init_state(self, w):
        return tuple(lm.init_state(w) for lm in self._lms)

    def score(self, state, ck):
        tot, exts = None, []
        for lm, wt, st in zip(self._lms, self._w, state):
            lp, ext = lm.score(st, ck)
            tot = wt * lp if tot is None else tot + wt * lp
            exts.append(ext)
        return tot, tuple(exts)

    def select(self, state, state_ext, parent, kk, is_stay):
        return tuple(
            lm.select(st, ext, parent, kk, is_stay)
            for lm, st, ext in zip(self._lms, state, state_ext))

    def final(self, state):
        tot = None
        for lm, wt, st in zip(self._lms, self._w, state):
            f = wt * lm.final(st)
            tot = f if tot is None else tot + f
        return tot

    def score_chunk(self, state, toks):
        tot, new = None, []
        for lm, wt, st in zip(self._lms, self._w, state):
            lp, ns = lm.score_chunk(st, toks)
            tot = wt * lp if tot is None else tot + wt * lp
            new.append(ns)
        return tot, tuple(new)
