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
    cache: M.DecoderCache


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
) -> Tuple[jax.Array, jax.Array, jax.Array]:
    """Run beam search; returns (tokens (n_text_ctx,), length, log_prob).

    The returned sequence includes the prompt, like the reference where the
    initial BeamNode holds the prompt (src/transcribe.rs:201-220) and the
    final seq is decoded whole (src/transcribe.rs:309-312,380).
    """
    K = beam_size
    dec_cfg = cfg.text_decoder_config
    V = dec_cfg.n_vocab
    ctx = dec_cfg.n_text_ctx
    P = prompt.shape[0]

    # ---- prefill: all K lanes carry the same prompt; only lane 0 is live.
    tokens0 = jnp.zeros((K, ctx), jnp.int32).at[:, :P].set(prompt[None, :])
    # tight cache: longest possible sequence is P + max_depth; rounding to a
    # lane-friendly multiple of 128 keeps the per-step cache read minimal.
    cache_len = min(ctx, -(-(P + max_depth) // 128) * 128)
    cache = M.init_cache(params, enc_out, cfg, batch=K, cache_len=cache_len,
                         kv_quant=kv_quant)
    logits, cache = M.decoder_step(
        params, tokens0[:, :P], jnp.int32(0), cache, cfg
    )
    logp_next = _masked_log_softmax(
        logits[:, -1], jnp.int32(P), suppress_mask, suppress_until_len
    )

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
        cache=cache,
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

        cache = M.reorder_cache(s.cache, parent)

        # (c) run the decoder on the appended token to get next-step logits.
        logits, cache = M.decoder_step(
            params, tok[:, None], s.cur_len, cache, cfg
        )
        logp_next = _masked_log_softmax(
            logits[:, -1], s.cur_len + 1, suppress_mask, suppress_until_len
        )

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
            cache=cache,
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
    )


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
):
    """Beam-search W windows in one compiled program via `vmap`.

    JAX's while_loop batching rule freezes lanes whose stop condition has
    fired (per-lane select on the carry), so each window stops expanding at
    its own EOT while the batch runs until the slowest window finishes --
    beam-quality decoding at multi-stream throughput (the reference is
    strictly one window at a time, src/transcribe.rs:42-71).

    Returns (tokens (W, n_text_ctx), lengths (W,), log_probs (W,)).
    """

    def one(enc):
        return beam_search(
            params, enc[None], prompt, cfg, eot_id, suppress_mask,
            beam_size, max_depth, suppress_until_len, kv_quant,
        )

    return jax.vmap(one)(enc_out)


@functools.partial(
    jax.jit,
    static_argnames=("cfg", "eot_id", "beam_size", "max_depth",
                     "suppress_until_len", "kv_quant"),
)
def beam_search_batched_jit(
    params, enc_out, prompt, cfg: WhisperConfig, eot_id: int,
    suppress_mask=None, beam_size: int = 5, max_depth: int = 100,
    suppress_until_len: int = 5, kv_quant: bool = False,
):
    return beam_search_batched(
        params, enc_out, prompt, cfg, eot_id, suppress_mask, beam_size,
        max_depth, suppress_until_len, kv_quant,
    )
