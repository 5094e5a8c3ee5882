"""On-device beam search as a jitted `lax.while_loop`.

Semantics replicate the reference's generic beam search (whisper-burn
`src/beam.rs`) as driven by `mels_to_text` (`src/transcribe.rs:148-383`):

  * scores are RAW summed log-probs, no length normalization
    (`BeamNode.log_prob`, src/beam.rs:6; accumulation src/transcribe.rs:299);
  * per step, each active beam proposes its top-`beam_size` continuations and
    the union is re-topped to `beam_size` (src/beam.rs:55-72) -- equivalent to
    a global top-k over the (beam x vocab) candidate matrix;
  * a beam whose last token is EOT is "finished": it is frozen and competes
    in a separate top-`beam_size` finished pool (src/beam.rs:50-78);
  * the loop stops when the best beam overall is finished (src/beam.rs:22-27)
    or after `max_depth` steps (src/beam.rs:22);
  * special-token logits are masked to -inf while the sequence length is
    <= `suppress_until_len` (= 5 in the reference, src/transcribe.rs:271-275),
    BEFORE the log-softmax;
  * ties between an active and a finished beam prefer the finished one
    (Rust `Iterator::max_by` returns the last maximal element and finished
    beams are listed last, src/beam.rs:33-36,72-78).

TPU-first design: the whole search is ONE compiled program -- fixed-shape
state (tokens padded to n_text_ctx), `lax.top_k` on device, KV-cache gather
on beam reshuffle -- versus the reference's per-step host round-trip of the
full vocab distribution (src/transcribe.rs:279-304, the dominant inefficiency
called out in SURVEY.md §3).
"""

from __future__ import annotations

import functools
from typing import NamedTuple, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp

from ..config import WhisperConfig
from ..models import whisper as M

NEG_INF = float("-inf")

def _top_k_iter(x, k):
    """Exact top-k over the last axis via k iterative argmax passes.

    XLA's sort-based `lax.top_k` over the (W, K*V) beam candidate matrix
    measured ~0.9 ms/step at large-v2 (W=8, K*V=259k); for k=5 wanted out
    of 259k, five max+mask passes are cheaper and exactly equivalent
    (ties: argmax picks the lowest index, matching lax.top_k's stable
    order over distinct-index candidates).

    Divergence from lax.top_k: if a row has fewer than k finite entries,
    the all--inf tail yields argmax = 0 repeatedly, so the returned
    indices contain DUPLICATE 0s where lax.top_k would return distinct
    indices. Harmless here (-inf slots never carry results: selection and
    freeze logic key on the logp values), but consumers of the index array
    must not assume distinctness.
    """
    vals, idxs = [], []
    iota = jnp.arange(x.shape[-1])
    for _ in range(k):
        i = jnp.argmax(x, axis=-1)
        vals.append(jnp.take_along_axis(x, i[..., None], -1)[..., 0])
        idxs.append(i.astype(jnp.int32))
        x = jnp.where(iota == i[..., None], -jnp.inf, x)
    return jnp.stack(vals, -1), jnp.stack(idxs, -1)


def _top_k(x, k, seg: int = 128):
    """Exact top-k, two-level: segment maxima -> top-k segments -> top-k.

    The k iterative argmax passes of `_top_k_iter` each stream the full
    (W, K*V) candidate matrix (k reads + k masked writes ~ 250 MB/step at
    large-v2 W24); here ONE max pass reduces each 128-lane segment, the
    top-k SEGMENTS are found on the (W, N/128) maxima, and the final top-k
    runs over the k*128 gathered candidates. Exactness: any true top-k
    element's segment max is >= that element, so fewer than k other
    segments can rank strictly above its segment -- with the same
    lowest-index tie order on both levels (segments are re-sorted
    ascending before the gather, making gathered position order = global
    index order), the result is element-for-element identical to
    `_top_k_iter`, including tie-breaks. The -inf-tail duplicate-0 quirk
    is reproduced explicitly (see `_top_k_iter`'s docstring).
    """
    n = x.shape[-1]
    if n <= 4 * seg:
        return _top_k_iter(x, k)
    pad = (-n) % seg
    if pad:
        x = jnp.pad(x, [(0, 0)] * (x.ndim - 1) + [(0, pad)],
                    constant_values=-jnp.inf)
    nseg = (n + pad) // seg
    xs = x.reshape(*x.shape[:-1], nseg, seg)
    seg_max = jnp.max(xs, axis=-1)  # (..., nseg), one full-stream pass
    # lax.top_k, NOT _top_k_iter: the segment indices must be DISTINCT even
    # when segment maxima tie at -inf (the iterative form's duplicate-0
    # quirk would gather the same segment k times and drop real candidates).
    # Small input (n/128 per row), stable lowest-index tie order.
    _, seg_idx = jax.lax.top_k(seg_max, k)
    seg_idx = jnp.sort(seg_idx, axis=-1)  # ascending: position = index order
    gathered = jnp.take_along_axis(xs, seg_idx[..., None], axis=-2)
    vals, local = _top_k_iter(gathered.reshape(*x.shape[:-1], k * seg), k)
    gi = (
        jnp.take_along_axis(seg_idx, local // seg, axis=-1) * seg
        + local % seg
    ).astype(jnp.int32)
    # all--inf rows: mimic the iterative form's duplicate index 0
    gi = jnp.where(jnp.isneginf(vals), 0, gi)
    return vals, gi


def _topk_lse(x, k, seg: int = 128):
    """Per-row top-k AND logsumexp of `x` in ONE pass over the data.

    The batched beam step needs, per lane, (a) the top-k raw masked logits
    (per-lane candidate ORDER is invariant to the per-lane normalizer) and
    (b) the log-softmax normalizer. Computing them together from the same
    per-segment maxima streams the (B, V) logits once per step, replacing
    the full log_softmax write + candidate add + top-k re-read of the
    materialized (W, K, V) `logp_next` (~4 extra full-vocab passes/step at
    large-v2 W48; docs/PERFORMANCE.md round-4 bookkeeping trim).

    Top-k indices/values are element-identical to `_top_k` (same two-level
    segment scheme, same tie order, same -inf duplicate-0 quirk). The
    logsumexp combines per-segment online partials
    (sum_j exp(m_j - M) * sum_seg_j exp(x - m_j)); -inf segments contribute
    0, an all--inf row returns -inf (no NaNs).
    """
    n = x.shape[-1]
    if n <= 4 * seg:
        vals, idx = _top_k_iter(x, k)
        return vals, idx, jax.scipy.special.logsumexp(x, axis=-1)
    pad = (-n) % seg
    if pad:
        x = jnp.pad(x, [(0, 0)] * (x.ndim - 1) + [(0, pad)],
                    constant_values=-jnp.inf)
    nseg = (n + pad) // seg
    xs = x.reshape(*x.shape[:-1], nseg, seg)
    seg_max = jnp.max(xs, axis=-1)  # (..., nseg): the ONE full-stream pass
    safe = jnp.where(jnp.isneginf(seg_max), 0.0, seg_max)
    # fused by XLA with the max pass (same reshaped operand, no dependency)
    seg_sum = jnp.sum(jnp.exp(xs - safe[..., None]), axis=-1)
    m = jnp.max(seg_max, axis=-1)
    m_safe = jnp.where(jnp.isneginf(m), 0.0, m)
    total = jnp.sum(seg_sum * jnp.exp(seg_max - m_safe[..., None]), axis=-1)
    lse = jnp.where(jnp.isneginf(m), NEG_INF, jnp.log(total) + m)

    # top-k from the SAME seg_max (identical math to `_top_k`)
    _, seg_idx = jax.lax.top_k(seg_max, k)
    seg_idx = jnp.sort(seg_idx, axis=-1)
    gathered = jnp.take_along_axis(xs, seg_idx[..., None], axis=-2)
    vals, local = _top_k_iter(gathered.reshape(*x.shape[:-1], k * seg), k)
    gi = (
        jnp.take_along_axis(seg_idx, local // seg, axis=-1) * seg
        + local % seg
    ).astype(jnp.int32)
    gi = jnp.where(jnp.isneginf(vals), 0, gi)
    return vals, gi, lse


def _fuse_reshuffle(self_k, cfg, allow=None) -> bool:
    """True when the beam reshuffle should ride the fused decode kernel
    (flash attention + quantized self-KV; cfg.knobs.fused_permute /
    WHISPER_TPU_FUSED_PERMUTE=0 forces the separate permute kernel for
    A/B). `allow=False` hard-gates it off (explicit caller control; dp
    meshes are token-identical through the fused path on the virtual
    mesh)."""
    from ..config import resolve_knobs
    from ..quantize import QTensor

    if allow is False:
        return False
    return (
        cfg.attention == "flash"
        and isinstance(self_k, QTensor)
        and resolve_knobs(cfg.knobs).fused_permute
    )


def _use_cow(fused: bool, cfg) -> bool:
    """Copy-on-write beam reshuffle (default on with the fused kernel;
    cfg.knobs.cow / WHISPER_TPU_COW=0 forces the physical whole-prefix
    write-back for A/B). See _cow_assign."""
    from ..config import resolve_knobs

    return fused and resolve_knobs(cfg.knobs).cow


def _cow_assign(parent: jax.Array, phys: jax.Array):
    """Copy-on-write physical-slot assignment for the beam reshuffle.

    parent, phys: (W, K) in-window indices. `phys[w, i]` is the physical
    cache slot currently holding logical lane i's slab; `parent[w, i]` is
    new lane i's logical parent. Returns (src, dest), both (W, K): new lane
    i's slab is read from physical slot src[i] = phys[parent[i]] and lives
    at physical slot dest[i] afterwards (dest IS the next step's phys).

    Assignment: the FIRST claimant (lowest lane index) of each distinct
    parent slab stays in that slab's slot -- dest == src, and the fused
    kernel (ops/pallas/permute_attention.py) elides its full write-back,
    writing only the appended-row tile. Later claimants copy to free slots
    (slots no lane reads this step), lowest-free-slot to lowest-mover-lane.
    Per step this cuts full slab writes from K to K - distinct(parent) per
    window: ~K(1-1/K)^K on random parents, ~0 on stable real-audio beams
    (parents near-identity). phys stays a permutation per window, so src
    and dest are window-local -- the kernel contract holds.
    """
    _, K = parent.shape
    src = jnp.take_along_axis(phys, parent, axis=1)  # (W, K) physical
    # first claimant of each distinct src value (lane-order tie break)
    same = src[:, :, None] == src[:, None, :]  # [w, i, j]: src_i == src_j
    before = jnp.tril(jnp.ones((K, K), bool), k=-1)  # j < i
    first = ~jnp.any(same & before[None], axis=2)  # (W, K)
    # free slots = physical slots no lane reads from this step, ascending;
    # stable argsort(taken) lists them first in slot order
    taken = jnp.any(
        src[:, :, None] == jnp.arange(K)[None, None, :], axis=1)  # (W, K)
    free_slots = jnp.argsort(taken, axis=1)
    mover_rank = jnp.cumsum(~first, axis=1) - 1  # rank among movers
    dest = jnp.where(
        first, src,
        jnp.take_along_axis(
            free_slots, jnp.clip(mover_rank, 0, K - 1), axis=1))
    return src, dest


def _cache_gather(self_k, self_v, gparent, valid_len=None, beam_k=None):
    """Beam reshuffle of the batch-major (B, L, C, d) self-KV pair -- a
    Pallas block-DMA permute kernel. Every XLA formulation of this pure
    data movement (leading-axis gather, one-hot MXU matmul) measured ~4x
    off copy speed; see ops/pallas/permute.py. int8 (QTensor) caches
    permute their q and per-row scale arrays in the same call, and copy
    only the valid row prefix (the decode kernel masks + sanitizes the
    uninitialized tail; the bf16 path copies everything because an MXU
    0-weight times a NaN-garbage bf16 tail row would poison the output)."""
    from ..ops.pallas.permute import permute_lanes_arrays
    from ..quantize import QTensor

    if isinstance(self_k, QTensor):
        if valid_len is not None and self_k.q.shape[2] % 32 != 0:
            # The prefix copy needs whole 32-row chunks; tiny (test-size)
            # caches fall back to copying everything.
            valid_len = None
        kq, ks, vq, vs = permute_lanes_arrays(
            (self_k.q, self_k.scale, self_v.q, self_v.scale), gparent,
            valid_len=valid_len, beam_k=beam_k,
        )
        return QTensor(kq, ks), QTensor(vq, vs)
    return permute_lanes_arrays((self_k, self_v), gparent, beam_k=beam_k)



class BeamState(NamedTuple):
    depth: jax.Array  # i32 scalar: completed expansion steps
    cur_tokens: jax.Array  # (K, n_text_ctx) i32
    cur_len: jax.Array  # i32 scalar, shared by all current beams
    cur_logp: jax.Array  # (K,) f32 cumulative log-prob
    cur_valid: jax.Array  # (K,) bool
    cur_eot: jax.Array  # (K,) bool: last token is EOT
    fin_tokens: jax.Array  # (K, n_text_ctx) i32 finished pool
    fin_len: jax.Array  # (K,) i32
    fin_logp: jax.Array  # (K,) f32 (-inf = empty slot)
    logp_next: jax.Array  # (K, V) log-softmax for the next position
    # self-attention KV only: the cross-KV is loop-INVARIANT and closed
    # over -- carrying it makes the vmapped (batched-window) while_loop
    # select/copy the multi-GB cross cache every step (measured ~60% beam
    # overhead at large-v2, docs/PERFORMANCE.md round-2 log)
    self_k: jax.Array
    self_v: jax.Array
    # copy-on-write reshuffle: physical cache slot holding logical lane i's
    # slab (identity unless the fused kernel runs with COW; see _cow_assign)
    phys: jax.Array  # (K,) i32


def _masked_log_softmax(
    logits: jax.Array,  # (K, V)
    seq_len: jax.Array,
    suppress_mask: Optional[jax.Array],
    suppress_until_len: int,
) -> jax.Array:
    """Apply the special-token maskout then log-softmax (f32).

    Reference: logits + maskout iff seq_len <= 5, then log_softmax
    (src/transcribe.rs:271-276). The mask participates in the softmax
    normalization exactly as in the reference.
    """
    logits = logits.astype(jnp.float32)
    if suppress_mask is not None:
        logits = jnp.where(
            seq_len <= suppress_until_len, logits + suppress_mask, logits
        )
    return jax.nn.log_softmax(logits, axis=-1)


def apply_timestamp_rules(
    logits: jax.Array,  # (B, V) f32, already suppress-masked
    tokens: jax.Array,  # (B, ctx) i32 current sequences (prompt included)
    seq_len: jax.Array,  # i32 scalar: current length (next write position)
    prompt_len: int,
    ts_begin: int,  # id of <|0.00|>; every id >= ts_begin is a timestamp
    eot_id: int,
    max_initial_idx: int,  # first sampled timestamp capped at ts_begin+this
) -> jax.Array:
    """The standard Whisper timestamp logit constraints, in-graph.

    New capability (the reference always decodes <|notimestamps|>,
    src/transcribe.rs:203); the rules follow OpenAI Whisper's
    ApplyTimestampRules so emitted segments are well-formed:
      1. pairs: after a single (opening) timestamp the next token must be a
         timestamp or EOT; after a closing pair the next must NOT be one;
      2. monotonic: timestamps never decrease (equal allowed only for the
         pair-closing token);
      3. the FIRST sampled token is a timestamp, <= max_initial_idx;
      4. if the total timestamp probability exceeds the best text token's,
         a timestamp is forced (the sum-of-logprobs rule).
    """
    neg = NEG_INF
    V = logits.shape[-1]
    ids = jnp.arange(V)
    is_ts = ids >= ts_begin  # (V,)

    last = tokens[:, seq_len - 1]  # (B,) seq_len >= prompt_len >= 1
    penult = tokens[:, jnp.maximum(seq_len - 2, 0)]
    last_is_ts = (seq_len >= prompt_len + 1) & (last >= ts_begin)
    pen_is_ts = (seq_len >= prompt_len + 2) & (penult >= ts_begin)

    # 1. pair rules
    closed = last_is_ts & pen_is_ts  # <|a|><|b|> just closed: no 3rd stamp
    opened = last_is_ts & ~pen_is_ts  # single stamp open: ts or EOT only
    logits = jnp.where(closed[:, None] & is_ts[None, :], neg, logits)
    logits = jnp.where(
        opened[:, None] & ~is_ts[None, :] & (ids != eot_id)[None, :],
        neg, logits,
    )

    # 2. monotonicity: floor = max emitted timestamp (+1 once its pair
    #    closed, so the next OPENING stamp strictly advances)
    ctx = tokens.shape[1]
    pos = jnp.arange(ctx)
    sampled = (pos >= prompt_len) & (pos < seq_len)
    ts_vals = jnp.where(sampled[None, :] & (tokens >= ts_begin), tokens, -1)
    ts_last = jnp.max(ts_vals, axis=1)  # (B,) -1 when none emitted yet
    floor = jnp.where(opened, ts_last, ts_last + 1)
    logits = jnp.where(
        (ts_last >= 0)[:, None] & is_ts[None, :]
        & (ids[None, :] < floor[:, None]),
        neg, logits,
    )

    # 3. first sampled position: timestamps only, capped
    first = seq_len == prompt_len
    logits = jnp.where(first & ~is_ts[None, :], neg, logits)
    logits = jnp.where(
        first & (ids[None, :] > ts_begin + max_initial_idx), neg, logits
    )

    # 4. sum-of-logprobs rule
    lp = jax.nn.log_softmax(logits, axis=-1)
    ts_lp = jax.nn.logsumexp(jnp.where(is_ts[None, :], lp, neg), axis=-1)
    text_max = jnp.max(jnp.where(is_ts[None, :], neg, lp), axis=-1)
    force_ts = ts_lp > text_max
    logits = jnp.where(force_ts[:, None] & ~is_ts[None, :], neg, logits)
    return logits


def beam_search(
    params: M.Params,
    enc_out: jax.Array,  # (1, Sa, d)
    prompt: jax.Array,  # (P,) i32
    cfg: WhisperConfig,
    eot_id: int,
    suppress_mask: Optional[jax.Array] = None,  # (V,) f32, 0 or -inf
    beam_size: int = 5,
    max_depth: int = 100,
    suppress_until_len: int = 5,
    kv_quant: bool = False,
    self_quant: bool = False,
    ts_begin: Optional[int] = None,
    max_initial_ts_idx: int = 50,
    nospeech_id: Optional[int] = None,  # also return p(<|nospeech|>) at SOT
    sot_pos: int = 0,  # prompt index of <|startoftranscript|>
    fuse_reshuffle: Optional[bool] = None,  # False: never the fused kernel
    logits_hook=None,  # Callable[(logits, tokens, seq_len) -> logits]
) -> Tuple[jax.Array, ...]:
    """Run beam search; returns (tokens (n_text_ctx,), length, log_prob).

    The returned sequence includes the prompt, like the reference where the
    initial BeamNode holds the prompt (src/transcribe.rs:201-220) and the
    final seq is decoded whole (src/transcribe.rs:309-312,380).

    `ts_begin` (the <|0.00|> id) enables the in-graph timestamp constraints
    (apply_timestamp_rules) for timestamped decoding. `nospeech_id` appends
    a 4th output: p(<|nospeech|>) from the prefill logits at the SOT
    position (no-speech detection; new capability beyond the reference).

    `logits_hook` is a traced custom logit filter `(logits (K, V) f32,
    tokens (K, ctx), seq_len) -> logits`, applied after the suppression
    window and timestamp rules, before the log-softmax -- the extension
    point OpenAI Whisper exposes as LogitFilter (new capability; the
    in-graph bench uses it to stagger EOT depths).
    """
    K = beam_size
    dec_cfg = cfg.text_decoder_config
    V = dec_cfg.n_vocab
    ctx = dec_cfg.n_text_ctx
    P = prompt.shape[0]

    def _logp(logits, tokens, seq_len):
        x = logits.astype(jnp.float32)
        if suppress_mask is not None:
            x = jnp.where(seq_len <= suppress_until_len, x + suppress_mask, x)
        if ts_begin is not None:
            x = apply_timestamp_rules(
                x, tokens, seq_len, P, ts_begin, eot_id, max_initial_ts_idx
            )
        if logits_hook is not None:
            x = logits_hook(x, tokens, seq_len)
        return jax.nn.log_softmax(x, axis=-1)

    # ---- prefill: all K lanes carry the same prompt; only lane 0 is live.
    tokens0 = jnp.zeros((K, ctx), jnp.int32).at[:, :P].set(prompt[None, :])
    # tight cache: longest possible sequence is P + max_depth; rounding to a
    # lane-friendly multiple of 128 keeps the per-step cache read minimal.
    cache_len = min(ctx, -(-(P + max_depth) // 128) * 128)
    cache = M.init_cache(params, enc_out, cfg, batch=K, cache_len=cache_len,
                         kv_quant=kv_quant, self_quant=self_quant)
    logits, cache = M.decoder_step(
        params, tokens0[:, :P], jnp.int32(0), cache, cfg
    )
    cross_k, cross_v = cache.cross_k, cache.cross_v  # loop-invariant closure
    ns_prob = None
    if nospeech_id is not None:
        ns_prob = jax.nn.softmax(
            logits[0, sot_pos].astype(jnp.float32), axis=-1)[nospeech_id]
    logp_next = _logp(logits[:, -1], tokens0, jnp.int32(P))

    state = BeamState(
        depth=jnp.int32(0),
        cur_tokens=tokens0,
        cur_len=jnp.int32(P),
        cur_logp=jnp.where(jnp.arange(K) == 0, 0.0, NEG_INF).astype(jnp.float32),
        cur_valid=jnp.arange(K) == 0,
        cur_eot=jnp.zeros((K,), bool),
        fin_tokens=jnp.zeros((K, ctx), jnp.int32),
        fin_len=jnp.zeros((K,), jnp.int32),
        fin_logp=jnp.full((K,), NEG_INF, jnp.float32),
        logp_next=logp_next,
        self_k=cache.self_k,
        self_v=cache.self_v,
        phys=jnp.arange(K, dtype=jnp.int32),
    )

    def best_scores(s: BeamState) -> Tuple[jax.Array, jax.Array]:
        """(best finished score, best active score) for the stop rule."""
        fin_like = jnp.where(s.cur_valid & s.cur_eot, s.cur_logp, NEG_INF)
        best_fin = jnp.maximum(jnp.max(fin_like), jnp.max(s.fin_logp))
        active = jnp.where(s.cur_valid & ~s.cur_eot, s.cur_logp, NEG_INF)
        return best_fin, jnp.max(active)

    def cond(s: BeamState) -> jax.Array:
        best_fin, best_active = best_scores(s)
        # Stop when the best beam is finished (>=: ties prefer finished,
        # matching Rust max_by last-max with finished beams listed last).
        not_done = best_fin < best_active
        return (s.depth < max_depth) & not_done & (s.cur_len < ctx)

    def body(s: BeamState) -> BeamState:
        # (a) fold current EOT-ended beams into the finished pool
        #     (src/beam.rs:55-57 + the top-k at :75).
        cand_fin_logp = jnp.concatenate(
            [s.fin_logp, jnp.where(s.cur_valid & s.cur_eot, s.cur_logp, NEG_INF)]
        )
        fin_logp, fin_idx = jax.lax.top_k(cand_fin_logp, K)
        all_tokens = jnp.concatenate([s.fin_tokens, s.cur_tokens], axis=0)
        all_len = jnp.concatenate([s.fin_len, jnp.full((K,), s.cur_len)])
        fin_tokens = all_tokens[fin_idx]
        fin_len = all_len[fin_idx]

        # (b) expand active beams: global top-K over (K x V) candidates
        #     (equivalent to per-beam top-K then merge, src/beam.rs:59-72).
        active = s.cur_valid & ~s.cur_eot
        cand = jnp.where(active[:, None], s.cur_logp[:, None] + s.logp_next, NEG_INF)
        new_logp, flat_idx = jax.lax.top_k(cand.reshape(-1), K)
        parent = flat_idx // V
        tok = (flat_idx % V).astype(jnp.int32)

        new_tokens = s.cur_tokens[parent].at[:, s.cur_len].set(tok)
        new_valid = new_logp > NEG_INF
        new_eot = (tok == eot_id) & new_valid

        # beam reshuffle: gather the SELF cache only (cross is shared and
        # unordered across lanes). On the flash + quantized-self path the
        # reshuffle is FUSED into the decode kernel (one cache pass instead
        # of permute-read + permute-write + attention-read; see
        # ops/pallas/permute_attention.py); parents are window-local here
        # by construction (one window).
        fused = _fuse_reshuffle(s.self_k, cfg, fuse_reshuffle)
        phys = jnp.arange(K, dtype=jnp.int32)
        if fused and _use_cow(fused, cfg):
            # COW reshuffle: read lane i's slab from phys[parent[i]], keep
            # first claimants in place (tile-only write), move the rest to
            # free slots; the cache stays in PHYSICAL slot order and `phys`
            # carries the logical->physical map (see _cow_assign).
            src, dest = _cow_assign(parent[None], s.phys[None])
            cache = M.DecoderCache(s.self_k, s.self_v, cross_k, cross_v)
            logits, cache = M.decoder_step(
                params, tok[:, None], s.cur_len, cache, cfg,
                parents=src[0], dests=dest[0],
            )
            phys = dest[0]
        elif fused:
            cache = M.DecoderCache(s.self_k, s.self_v, cross_k, cross_v)
            logits, cache = M.decoder_step(
                params, tok[:, None], s.cur_len, cache, cfg, parents=parent
            )
        else:
            self_k, self_v = _cache_gather(
                s.self_k, s.self_v, parent, valid_len=s.cur_len, beam_k=K)
            cache = M.DecoderCache(self_k, self_v, cross_k, cross_v)

            # (c) run the decoder on the appended token for next-step logits.
            logits, cache = M.decoder_step(
                params, tok[:, None], s.cur_len, cache, cfg
            )
        logp_next = _logp(logits[:, -1], new_tokens, s.cur_len + 1)

        return BeamState(
            depth=s.depth + 1,
            cur_tokens=new_tokens,
            cur_len=s.cur_len + 1,
            cur_logp=new_logp,
            cur_valid=new_valid,
            cur_eot=new_eot,
            fin_tokens=fin_tokens,
            fin_len=fin_len,
            fin_logp=fin_logp,
            logp_next=logp_next,
            self_k=cache.self_k,
            self_v=cache.self_v,
            phys=phys,
        )

    state = jax.lax.while_loop(cond, body, state)

    # ---- result: best beam overall; ties prefer finished (see module doc).
    fin_like_logp = jnp.where(state.cur_valid & state.cur_eot, state.cur_logp, NEG_INF)
    best_fin_cur = jnp.argmax(fin_like_logp)
    best_fin_pool = jnp.argmax(state.fin_logp)
    use_pool = state.fin_logp[best_fin_pool] >= fin_like_logp[best_fin_cur]
    best_fin_logp = jnp.where(
        use_pool, state.fin_logp[best_fin_pool], fin_like_logp[best_fin_cur]
    )
    fin_tokens = jnp.where(
        use_pool, state.fin_tokens[best_fin_pool], state.cur_tokens[best_fin_cur]
    )
    fin_len = jnp.where(
        use_pool, state.fin_len[best_fin_pool], state.cur_len
    )

    active_logp = jnp.where(state.cur_valid & ~state.cur_eot, state.cur_logp, NEG_INF)
    best_active = jnp.argmax(active_logp)

    take_fin = best_fin_logp >= active_logp[best_active]
    tokens = jnp.where(take_fin, fin_tokens, state.cur_tokens[best_active])
    length = jnp.where(take_fin, fin_len, state.cur_len)
    logp = jnp.where(take_fin, best_fin_logp, active_logp[best_active])
    if ns_prob is not None:
        return tokens, length.astype(jnp.int32), logp, ns_prob
    return tokens, length.astype(jnp.int32), logp


@functools.partial(
    jax.jit,
    static_argnames=(
        "cfg",
        "eot_id",
        "beam_size",
        "max_depth",
        "suppress_until_len",
        "kv_quant",
        "self_quant",
        "ts_begin",
        "max_initial_ts_idx",
        "nospeech_id",
        "sot_pos",
        "fuse_reshuffle",
        "logits_hook",
    ),
)
def beam_search_jit(
    params,
    enc_out,
    prompt,
    cfg: WhisperConfig,
    eot_id: int,
    suppress_mask=None,
    beam_size: int = 5,
    max_depth: int = 100,
    suppress_until_len: int = 5,
    kv_quant: bool = False,
    self_quant: bool = False,
    ts_begin: Optional[int] = None,
    max_initial_ts_idx: int = 50,
    nospeech_id: Optional[int] = None,
    sot_pos: int = 0,
    fuse_reshuffle: Optional[bool] = None,
    logits_hook=None,
):
    return beam_search(
        params,
        enc_out,
        prompt,
        cfg,
        eot_id,
        suppress_mask,
        beam_size,
        max_depth,
        suppress_until_len,
        kv_quant,
        self_quant,
        ts_begin,
        max_initial_ts_idx,
        nospeech_id,
        sot_pos,
        fuse_reshuffle,
        logits_hook,
    )


class BatchedBeamState(NamedTuple):
    depth: jax.Array  # i32 scalar
    cur_tokens: jax.Array  # (W, K, ctx) i32
    cur_len: jax.Array  # i32 scalar (windows share the prompt length)
    cur_len_w: jax.Array  # (W,) i32: per-window length, frozen at stop time
    cur_logp: jax.Array  # (W, K)
    cur_valid: jax.Array  # (W, K) bool
    cur_eot: jax.Array  # (W, K) bool
    fin_tokens: jax.Array  # (W, K, ctx)
    fin_len: jax.Array  # (W, K)
    fin_logp: jax.Array  # (W, K)
    # compressed next-step proposals: each lane's top-K continuation token
    # ids and their NORMALIZED log-probs. Exact-equivalent to carrying the
    # full (W, K, V) log-softmax (the global top-K over K x V candidates can
    # take at most K winners from one lane, and per-lane order is invariant
    # to the per-lane normalizer), at 1/V the carry + bookkeeping traffic.
    next_vals: jax.Array  # (W, K, K) f32: logp of lane l's rank-j proposal
    next_idx: jax.Array  # (W, K, K) i32: its token id
    self_k: jax.Array  # (W*K, L, C, d), batch-major (see init_cache)
    self_v: jax.Array
    # copy-on-write reshuffle: physical in-window cache slot holding logical
    # lane i's slab (identity unless the fused kernel runs with COW)
    phys: jax.Array  # (W, K) i32


def beam_search_batched(
    params,
    enc_out: jax.Array,  # (W, Sa, d) -- W independent windows
    prompt: jax.Array,
    cfg: WhisperConfig,
    eot_id: int,
    suppress_mask: Optional[jax.Array] = None,
    beam_size: int = 5,
    max_depth: int = 100,
    suppress_until_len: int = 5,
    kv_quant: bool = False,
    self_quant: bool = False,
    nospeech_id: Optional[int] = None,  # also return p(<|nospeech|>) (W,)
    sot_pos: int = 0,
    fuse_reshuffle: Optional[bool] = None,  # False: never the fused kernel
    ts_begin: Optional[int] = None,  # <|0.00|> id: in-graph timestamp rules
    max_initial_ts_idx: int = 50,
    logits_hook=None,  # Callable[(logits, tokens, seq_len) -> logits]
):
    """Beam-search W windows in ONE flat while_loop (no vmap).

    All W x K lanes run one decoder program; per-window beam bookkeeping is
    batched arithmetic, compressed to each lane's top-K proposals so the
    full-vocab logits are streamed ONCE per step (`_topk_lse`) and the
    while_loop carry holds (W, K, K) proposals instead of the (W, K, V)
    log-softmax -- exact-equivalent to the top-k over the (W, K*V)
    candidate matrix (see `_proposals`). Windows
    whose stop rule has fired are frozen by masking their result-bearing
    leaves, exactly reproducing per-window `beam_search` semantics
    (src/beam.rs:22-27 early stop) while the batch runs until the slowest
    window finishes. This replaces an earlier jax.vmap(while_loop) design:
    the batching rule's per-step carry selects and its pallas interactions
    cost ~60% over the flat program at large-v2 (docs/PERFORMANCE.md),
    and its compile time was pathological.

    `ts_begin` enables the same in-graph timestamp constraints as the
    single-window search (apply_timestamp_rules operates row-wise on the
    flat (W*K, V) logits against the flat (W*K, ctx) token state, so the
    rules are applied per lane exactly as in the single-window path).

    Returns (tokens (W, n_text_ctx), lengths (W,), log_probs (W,)).
    """
    K = beam_size
    dec_cfg = cfg.text_decoder_config
    V = dec_cfg.n_vocab
    ctx = dec_cfg.n_text_ctx
    P = prompt.shape[0]
    W = enc_out.shape[0]
    B = W * K

    def _proposals(logits, tokens_flat, seq_len):
        """Masked (B, V) logits -> per-lane top-K proposals + normalizer.

        Applies the same masking as the single-window `_logp` (suppress
        window, then the timestamp rules on the flat (B, ctx) token state),
        then compresses to (next_vals, next_idx): rank-ordered normalized
        log-probs and token ids, (W, K, K) each. One fused pass over the
        logits (`_topk_lse`) instead of materializing the (B, V)
        log-softmax; selection and tie-breaks are element-identical (see
        `_topk_lse`)."""
        x = logits.astype(jnp.float32)
        if suppress_mask is not None:
            x = jnp.where(seq_len <= suppress_until_len, x + suppress_mask, x)
        if ts_begin is not None:
            x = apply_timestamp_rules(
                x, tokens_flat, seq_len, P, ts_begin, eot_id,
                max_initial_ts_idx,
            )
        if logits_hook is not None:
            x = logits_hook(x, tokens_flat, seq_len)
        vals, idx, lse = _topk_lse(x, K)
        return ((vals - lse[:, None]).reshape(W, K, K),
                idx.reshape(W, K, K))

    # cross-KV stays per-window (W rows); lanes map to windows i // K inside
    # the attention paths -- no K-fold replication of the cross cache.
    tokens0 = jnp.zeros((B, ctx), jnp.int32).at[:, :P].set(prompt[None, :])
    cache_len = min(ctx, -(-(P + max_depth) // 128) * 128)
    cache = M.init_cache(params, enc_out, cfg, batch=B, cache_len=cache_len,
                         kv_quant=kv_quant, self_quant=self_quant)
    logits, cache = M.decoder_step(
        params, tokens0[:, :P], jnp.int32(0), cache, cfg
    )
    cross_k, cross_v = cache.cross_k, cache.cross_v  # loop-invariant closure
    ns_prob = None
    if nospeech_id is not None:
        # one value per window: lanes share the prompt, take lane 0
        ns_prob = jax.nn.softmax(
            logits[::K, sot_pos].astype(jnp.float32), axis=-1
        )[:, nospeech_id]
    next_vals, next_idx = _proposals(logits[:, -1], tokens0, jnp.int32(P))

    lane = jnp.arange(K)
    state = BatchedBeamState(
        depth=jnp.int32(0),
        cur_tokens=jnp.broadcast_to(
            tokens0.reshape(W, K, ctx), (W, K, ctx)),
        cur_len=jnp.int32(P),
        cur_len_w=jnp.full((W,), P, jnp.int32),
        cur_logp=jnp.broadcast_to(
            jnp.where(lane == 0, 0.0, NEG_INF).astype(jnp.float32), (W, K)),
        cur_valid=jnp.broadcast_to(lane == 0, (W, K)),
        cur_eot=jnp.zeros((W, K), bool),
        fin_tokens=jnp.zeros((W, K, ctx), jnp.int32),
        fin_len=jnp.zeros((W, K), jnp.int32),
        fin_logp=jnp.full((W, K), NEG_INF, jnp.float32),
        next_vals=next_vals,
        next_idx=next_idx,
        self_k=cache.self_k,
        self_v=cache.self_v,
        phys=jnp.broadcast_to(jnp.arange(K, dtype=jnp.int32), (W, K)),
    )

    def window_stopped(s: BatchedBeamState) -> jax.Array:
        """(W,) per-window stop rule == the single-window cond negation
        (best finished >= best active; ties prefer finished)."""
        fin_like = jnp.where(s.cur_valid & s.cur_eot, s.cur_logp, NEG_INF)
        best_fin = jnp.maximum(jnp.max(fin_like, 1), jnp.max(s.fin_logp, 1))
        active = jnp.where(s.cur_valid & ~s.cur_eot, s.cur_logp, NEG_INF)
        return best_fin >= jnp.max(active, 1)

    def cond(s: BatchedBeamState) -> jax.Array:
        return ((s.depth < max_depth) & (s.cur_len < ctx)
                & ~jnp.all(window_stopped(s)))

    def body(s: BatchedBeamState) -> BatchedBeamState:
        stopped = window_stopped(s)  # (W,) freeze these windows' results

        # (a) fold EOT-ended beams into the per-window finished pool
        cand_fin_logp = jnp.concatenate(
            [s.fin_logp,
             jnp.where(s.cur_valid & s.cur_eot, s.cur_logp, NEG_INF)], axis=1
        )  # (W, 2K)
        fin_logp, fin_idx = _top_k(cand_fin_logp, K)  # (W, K)
        all_tokens = jnp.concatenate([s.fin_tokens, s.cur_tokens], axis=1)
        all_len = jnp.concatenate(
            [s.fin_len, jnp.broadcast_to(s.cur_len, (W, K))], axis=1)
        fin_tokens = jnp.take_along_axis(
            all_tokens, fin_idx[:, :, None], axis=1)
        fin_len = jnp.take_along_axis(all_len, fin_idx, axis=1)

        # (b) expand active beams: per-window top-K over the COMPRESSED
        # (K x K) proposal matrix -- exact-equivalent to the top-K over the
        # full (K x V) candidates (at most K winners come from one lane; the
        # flat lane-major/rank order reproduces the lowest-global-index tie
        # break: rank order within a lane IS ascending token order on ties).
        active = s.cur_valid & ~s.cur_eot
        cand = jnp.where(
            active[:, :, None], s.cur_logp[:, :, None] + s.next_vals, NEG_INF)
        new_logp, flat_idx = _top_k(cand.reshape(W, K * K), K)
        parent = flat_idx // K  # (W, K) in-window parent lane
        tok = jnp.take_along_axis(
            s.next_idx.reshape(W, K * K), flat_idx, axis=-1)

        new_tokens = jnp.take_along_axis(
            s.cur_tokens, parent[:, :, None], axis=1
        ).at[:, :, s.cur_len].set(tok)
        new_valid = new_logp > NEG_INF
        new_eot = (tok == eot_id) & new_valid

        # (c) beam reshuffle of the flat self cache (global lane indices);
        # fused into the decode kernel on the flash + quantized-self path
        # (parents stay window-local: parent is an in-window index).
        gparent = (parent + jnp.arange(W)[:, None] * K).reshape(B)
        fused = _fuse_reshuffle(s.self_k, cfg, fuse_reshuffle)
        phys = jnp.broadcast_to(jnp.arange(K, dtype=jnp.int32), (W, K))
        if fused and _use_cow(fused, cfg):
            # COW reshuffle (see the single-window path / _cow_assign): the
            # flat cache stays in physical slot order; `phys` carries each
            # window's logical->physical map. Stopped windows keep being
            # rewritten with stale proposals (same as before COW) -- their
            # cache contents are garbage either way and phys tracks exactly
            # what the kernel did, so reads stay consistent.
            src, dest = _cow_assign(parent, s.phys)
            offs = jnp.arange(W, dtype=jnp.int32)[:, None] * K
            full = M.DecoderCache(s.self_k, s.self_v, cross_k, cross_v)
            logits, cache = M.decoder_step(
                params, tok.reshape(B, 1), s.cur_len, full, cfg,
                parents=(src + offs).reshape(B),
                dests=(dest + offs).reshape(B),
            )
            phys = dest
        elif fused:
            full = M.DecoderCache(s.self_k, s.self_v, cross_k, cross_v)
            logits, cache = M.decoder_step(
                params, tok.reshape(B, 1), s.cur_len, full, cfg,
                parents=gparent,
            )
        else:
            self_k, self_v = _cache_gather(
                s.self_k, s.self_v, gparent, valid_len=s.cur_len, beam_k=K)
            full = M.DecoderCache(self_k, self_v, cross_k, cross_v)
            logits, cache = M.decoder_step(
                params, tok.reshape(B, 1), s.cur_len, full, cfg
            )
        next_vals, next_idx = _proposals(
            logits[:, -1], new_tokens.reshape(B, ctx), s.cur_len + 1)

        # (e) freeze result-bearing leaves of stopped windows (the flat
        # equivalent of the while_loop batching rule's carry select)
        f1 = stopped[:, None]
        f2 = stopped[:, None, None]
        return BatchedBeamState(
            depth=s.depth + 1,
            cur_tokens=jnp.where(f2, s.cur_tokens, new_tokens),
            cur_len=s.cur_len + 1,
            cur_len_w=jnp.where(stopped, s.cur_len_w, s.cur_len + 1),
            cur_logp=jnp.where(f1, s.cur_logp, new_logp),
            cur_valid=jnp.where(f1, s.cur_valid, new_valid),
            cur_eot=jnp.where(f1, s.cur_eot, new_eot),
            fin_tokens=jnp.where(f2, s.fin_tokens, fin_tokens),
            fin_len=jnp.where(f1, s.fin_len, fin_len),
            fin_logp=jnp.where(f1, s.fin_logp, fin_logp),
            # next_vals/next_idx need no freeze: a stopped window's RESULT
            # leaves (tokens/logp/valid/fin_*) are frozen above, its stop
            # rule reads only those, and candidates computed from stale
            # proposals next step are discarded by the same masks.
            next_vals=next_vals,
            next_idx=next_idx,
            self_k=cache.self_k,
            self_v=cache.self_v,
            phys=phys,
        )

    s = jax.lax.while_loop(cond, body, state)

    # ---- per-window result selection (same math as the single-window
    # epilogue, batched over W). A frozen window's cur_len is the GLOBAL
    # cur_len at freeze time... which equals its own: cur_len advances for
    # every window in lockstep, and frozen windows' tokens/lengths come from
    # the fin pool or frozen cur leaves whose recorded lengths were frozen
    # with them -- except cur_len itself is scalar. Track per-window active
    # length via fin_len for finished picks; for an active pick the length
    # is the final global cur_len (the window never stopped).
    fin_like_logp = jnp.where(s.cur_valid & s.cur_eot, s.cur_logp, NEG_INF)
    best_fin_cur = jnp.argmax(fin_like_logp, axis=1)  # (W,)
    best_fin_pool = jnp.argmax(s.fin_logp, axis=1)
    pool_logp = jnp.take_along_axis(
        s.fin_logp, best_fin_pool[:, None], 1)[:, 0]
    cur_fin_logp = jnp.take_along_axis(
        fin_like_logp, best_fin_cur[:, None], 1)[:, 0]
    use_pool = pool_logp >= cur_fin_logp
    best_fin_logp = jnp.where(use_pool, pool_logp, cur_fin_logp)
    pool_tokens = jnp.take_along_axis(
        s.fin_tokens, best_fin_pool[:, None, None], 1)[:, 0]
    curf_tokens = jnp.take_along_axis(
        s.cur_tokens, best_fin_cur[:, None, None], 1)[:, 0]
    fin_tokens = jnp.where(use_pool[:, None], pool_tokens, curf_tokens)
    pool_len = jnp.take_along_axis(s.fin_len, best_fin_pool[:, None], 1)[:, 0]
    fin_len = jnp.where(use_pool, pool_len, s.cur_len_w)

    active_logp = jnp.where(s.cur_valid & ~s.cur_eot, s.cur_logp, NEG_INF)
    best_active = jnp.argmax(active_logp, axis=1)
    act_logp = jnp.take_along_axis(active_logp, best_active[:, None], 1)[:, 0]
    act_tokens = jnp.take_along_axis(
        s.cur_tokens, best_active[:, None, None], 1)[:, 0]

    take_fin = best_fin_logp >= act_logp
    tokens = jnp.where(take_fin[:, None], fin_tokens, act_tokens)
    length = jnp.where(take_fin, fin_len, s.cur_len_w)
    logp = jnp.where(take_fin, best_fin_logp, act_logp)
    if ns_prob is not None:
        return tokens, length.astype(jnp.int32), logp, ns_prob
    return tokens, length.astype(jnp.int32), logp


@functools.partial(
    jax.jit,
    static_argnames=("cfg", "eot_id", "beam_size", "max_depth",
                     "suppress_until_len", "kv_quant", "self_quant",
                     "nospeech_id", "sot_pos", "fuse_reshuffle",
                     "ts_begin", "max_initial_ts_idx", "logits_hook"),
)
def beam_search_batched_jit(
    params, enc_out, prompt, cfg: WhisperConfig, eot_id: int,
    suppress_mask=None, beam_size: int = 5, max_depth: int = 100,
    suppress_until_len: int = 5, kv_quant: bool = False,
    self_quant: bool = False, nospeech_id: Optional[int] = None,
    sot_pos: int = 0, fuse_reshuffle: Optional[bool] = None,
    ts_begin: Optional[int] = None, max_initial_ts_idx: int = 50,
    logits_hook=None,
):
    return beam_search_batched(
        params, enc_out, prompt, cfg, eot_id, suppress_mask, beam_size,
        max_depth, suppress_until_len, kv_quant, self_quant, nospeech_id,
        sot_pos, fuse_reshuffle, ts_begin, max_initial_ts_idx, logits_hook,
    )
