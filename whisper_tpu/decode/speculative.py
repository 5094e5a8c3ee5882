"""In-graph speculative greedy decoding: a small DRAFT model proposes the
next few tokens; ONE target `decoder_step` over the whole candidate block
verifies them (models/whisper.py decoder_step already returns per-position
logits at S=k). Greedy acceptance -- keep the longest candidate prefix whose
target argmax agrees, then take the target's own argmax at the first
disagreement as a bonus token -- makes the output TOKEN-IDENTICAL to plain
`greedy_decode` by construction at temperature 0; tests/test_speculative.py
pins tokens, lengths AND sum_logp against the plain loop.

Numerics fine print: every emitted token is the argmax of the TARGET's
S=k `decoder_step` distribution (the draft influences speed only), so the
output is a self-consistent greedy decode under the S=k path's numerics.
Plain greedy determines steady-state tokens through the S=1 fused kernel
instead; on CPU/XLA the two paths compute identical values, and on TPU
they can differ in rounding the way the flash and xla attention paths
already do -- divergence requires an exact argmax near-tie (the verify
drive checks token parity on chip).

The whole scheme (k-1 draft steps + 1 verify step + acceptance) runs inside
ONE `lax.while_loop` body, so the decode is still a single device program:
no host round trips per block (the axon tunnel has a ~24 ms dispatch floor,
CLAUDE.md), and both models' KV caches ride the loop carry. Rejected
candidate rows left in either cache are dead weight only: subsequent
iterations re-write from the accepted position (dynamic_update_slice /
fused-kernel append at `pos`) and every cache read is masked to the valid
prefix (`causal_vis` / the fused kernel's pos-bounded reads), so no
rollback copies are needed.

New capability beyond the reference (whisper-burn decodes one token per
step, src/transcribe.rs:232-233) targeting the B=1 LATENCY path -- live
streaming and single-stream serving, where each large-model step is bound
by streaming the full weight set for one token. Batched lanes would accept
different prefix lengths per lane; per-lane cache positions are the
lockstep-bookkeeping rework docs/PERFORMANCE.md prices at >=20%, so this
decoder is B=1 only (asserted).

Requirements on the draft model: same tokenizer vocabulary (candidate ids
must mean the same thing) and its own encoder output over the same audio
window. Sampling (temperature > 0) is out of scope: exactness under
sampling needs rejection-sampling speculative decoding, which changes the
RNG stream and is NOT reproducible against the plain sampler anyway.
"""

from __future__ import annotations

from typing import NamedTuple, Optional, Tuple

import jax
import jax.numpy as jnp

from ..config import WhisperConfig
from ..models import whisper as M
from .greedy import make_logp_fn


class SpecState(NamedTuple):
    tokens: jax.Array  # (1, n_text_ctx) i32
    length: jax.Array  # (1,) i32 sequence length (incl. prompt)
    seq_len: jax.Array  # i32 scalar: next write position
    done: jax.Array  # (1,) bool
    logp_next: jax.Array  # (1, V) target distribution for position seq_len
    sum_logp: jax.Array  # (1,) cumulative target log-prob of emitted tokens
    # self-attention KV caches only; each model's cross-KV is loop-invariant
    # and lives in the body's closure (same reasoning as GreedyState)
    t_self_k: jax.Array
    t_self_v: jax.Array
    d_self_k: jax.Array
    d_self_v: jax.Array


def speculative_greedy_decode(
    params: M.Params,
    enc_out: jax.Array,  # (1, Sa, d) target encoder output
    prompt: jax.Array,  # (P,) i32
    cfg: WhisperConfig,
    eot_id: int,
    draft_params: M.Params,
    draft_enc_out: jax.Array,  # (1, Sa_d, d_d) draft encoder output
    draft_cfg: WhisperConfig,
    suppress_mask: Optional[jax.Array] = None,
    n_draft: int = 4,  # block size k: 1 committed + k-1 proposals / iter
    max_depth: int = 224,
    suppress_until_len: int = 5,
    kv_quant: bool = False,
    self_quant: bool = False,
    ts_begin: Optional[int] = None,
    max_initial_ts_idx: int = 50,
    nospeech_id: Optional[int] = None,
    sot_pos: int = 0,
    logits_hook=None,
    draft_logits_hook=None,
) -> Tuple[jax.Array, ...]:
    """Speculative greedy decode; returns exactly `greedy_decode`'s outputs
    -- (tokens (1, n_text_ctx), lengths (1,), sum_logp) plus p(<|nospeech|>)
    when `nospeech_id` is given -- with identical values at temperature 0.

    `kv_quant`/`self_quant` apply to the TARGET's caches (the big ones);
    the draft's caches stay unquantized -- they are small and the draft's
    argmax need not match anything exactly, but keeping them exact removes
    one source of proposal/verify drift.

    `draft_logits_hook` (default: `logits_hook`) replaces the hook on the
    DRAFT's proposal distributions only. It cannot change the output --
    proposals the target disagrees with are rejected -- only the
    acceptance rate; tools/ablations/spec_decode.py uses it to pin
    acceptance exactly (random-weight models tie-collapse onto the same
    argmax, so without decorrelating the draft side a scripted-agreement
    bench measures ~100% acceptance at every setting).
    """
    k = int(n_draft)
    if k < 1:
        raise ValueError("n_draft must be >= 1")
    if enc_out.shape[0] != 1:
        raise ValueError(
            "speculative decoding is B=1 only (got batch "
            f"{enc_out.shape[0]}); batched lanes accept different prefix "
            "lengths per lane, which the lockstep cache bookkeeping cannot "
            "represent"
        )
    tV = cfg.text_decoder_config.n_vocab
    dV = draft_cfg.text_decoder_config.n_vocab
    if tV != dV:
        raise ValueError(
            f"draft vocab {dV} != target vocab {tV}: speculative decoding "
            "requires a shared tokenizer"
        )
    dec_cfg = cfg.text_decoder_config
    ctx = dec_cfg.n_text_ctx
    P = prompt.shape[0]
    if P + max_depth + k > min(ctx, draft_cfg.text_decoder_config.n_text_ctx):
        raise ValueError(
            f"prompt ({P}) + max_depth ({max_depth}) + n_draft ({k}) must "
            f"fit in the decoder context ({ctx}): the verify step writes "
            "k cache rows past the current position"
        )

    _logp = make_logp_fn(P, eot_id, suppress_mask, suppress_until_len,
                         ts_begin, max_initial_ts_idx, logits_hook)
    _logp_draft = _logp if draft_logits_hook is None else make_logp_fn(
        P, eot_id, suppress_mask, suppress_until_len,
        ts_begin, max_initial_ts_idx, draft_logits_hook)

    tokens0 = jnp.zeros((1, ctx), jnp.int32).at[:, :P].set(prompt[None, :])
    # +k headroom: the verify step writes candidate rows [pos, pos+k), the
    # last of which can start at max_len - 1
    cache_len = min(ctx, -(-(P + max_depth + k) // 128) * 128)
    cache_t = M.init_cache(params, enc_out, cfg, batch=1,
                           cache_len=cache_len, kv_quant=kv_quant,
                           self_quant=self_quant)
    cache_d = M.init_cache(draft_params, draft_enc_out, draft_cfg, batch=1,
                           cache_len=cache_len)
    logits, cache_t = M.decoder_step(
        params, tokens0[:, :P], jnp.int32(0), cache_t, cfg)
    _, cache_d = M.decoder_step(
        draft_params, tokens0[:, :P], jnp.int32(0), cache_d, draft_cfg)
    cross_k_t, cross_v_t = cache_t.cross_k, cache_t.cross_v
    cross_k_d, cross_v_d = cache_d.cross_k, cache_d.cross_v
    ns_prob = None
    if nospeech_id is not None:
        ns_prob = jax.nn.softmax(
            logits[:, sot_pos].astype(jnp.float32), axis=-1
        )[:, nospeech_id]
    logp_next = _logp(logits[:, -1], tokens0, jnp.int32(P))

    state = SpecState(
        tokens=tokens0,
        length=jnp.full((1,), P, jnp.int32),
        seq_len=jnp.int32(P),
        done=jnp.zeros((1,), bool),
        logp_next=logp_next,
        sum_logp=jnp.zeros((1,), jnp.float32),
        t_self_k=cache_t.self_k,
        t_self_v=cache_t.self_v,
        d_self_k=cache_d.self_k,
        d_self_v=cache_d.self_v,
    )

    max_len = min(ctx, P + max_depth)

    def cond(s: SpecState) -> jax.Array:
        return (~jnp.all(s.done)) & (s.seq_len < max_len)

    def body(s: SpecState) -> SpecState:
        # --- committed token for position seq_len (greedy semantics: it
        # was fully determined by the previous iteration's distribution)
        t0 = jnp.argmax(s.logp_next, axis=-1).astype(jnp.int32)  # (1,)
        t0 = jnp.where(s.done, eot_id, t0)

        # --- draft phase: k-1 proposals from the small model. Each step
        # writes the current token into the hypothesis buffer FIRST, then
        # applies the shared _logp at the advanced length -- the exact
        # order of the plain greedy body.
        def draft_step(j, carry):
            cur, hyp, cand, dk, dv = carry
            pos = s.seq_len + j
            hyp = jax.lax.dynamic_update_slice(hyp, cur[:, None], (0, pos))
            full_d = M.DecoderCache(dk, dv, cross_k_d, cross_v_d)
            logits_d, cache_d = M.decoder_step(
                draft_params, cur[:, None], pos, full_d, draft_cfg)
            lp = _logp_draft(logits_d[:, -1], hyp, pos + 1)
            nxt = jnp.argmax(lp, axis=-1).astype(jnp.int32)
            cand = jax.lax.dynamic_update_slice(cand, nxt[:, None], (0, j + 1))
            return nxt, hyp, cand, cache_d.self_k, cache_d.self_v

        cand0 = jnp.zeros((1, k), jnp.int32).at[:, 0].set(t0)
        cur, hyp, cand, d_self_k, d_self_v = jax.lax.fori_loop(
            0, k - 1, draft_step,
            (t0, s.tokens, cand0, s.d_self_k, s.d_self_v),
        )
        # the last proposal enters the hypothesis buffer too: the verify
        # scan's final position applies rules with it as the last token
        hyp = jax.lax.dynamic_update_slice(
            hyp, cand[:, k - 1:k], (0, s.seq_len + k - 1))

        # --- verify: one target step over the whole candidate block.
        # logits_t[:, i] is the target's distribution for position
        # seq_len + i + 1 given candidates 0..i.
        full_t = M.DecoderCache(s.t_self_k, s.t_self_v, cross_k_t, cross_v_t)
        logits_t, cache_t = M.decoder_step(params, cand, s.seq_len, full_t, cfg)
        lp_list = [
            _logp(logits_t[:, i], hyp, s.seq_len + i + 1) for i in range(k)
        ]
        lp_stack = jnp.stack(lp_list)  # (k, 1, V)
        g = jnp.argmax(lp_stack, axis=-1).astype(jnp.int32)  # (k, 1)

        # --- acceptance: longest agreeing prefix, truncated at the first
        # emitted EOT (greedy stops there) and at max_len (fixed budget)
        if k > 1:
            match = (g[:-1, 0] == cand[0, 1:]).astype(jnp.int32)  # (k-1,)
            n_acc = jnp.sum(jnp.cumprod(match))
        else:
            n_acc = jnp.int32(0)
        n_emit = 1 + n_acc
        idx = jnp.arange(k)
        eot_pos = jnp.where((cand[0] == eot_id) & (idx < n_emit), idx, k)
        first_eot = jnp.min(eot_pos)
        n_emit = jnp.minimum(n_emit, first_eot + 1)
        n_emit = jnp.minimum(n_emit, max_len - s.seq_len)
        newly_done = first_eot < n_emit

        # --- write the accepted block; untouched slots keep old values so
        # the tokens buffer matches plain greedy's bit-for-bit
        block = jax.lax.dynamic_slice(s.tokens, (0, s.seq_len), (1, k))
        newblk = jnp.where(idx[None, :] < n_emit, cand, block)
        tokens = jax.lax.dynamic_update_slice(s.tokens, newblk, (0, s.seq_len))

        # --- bookkeeping under the target's own distributions: token i's
        # log-prob comes from the distribution that PREDICTED it
        lp_prev = jnp.concatenate(
            [s.logp_next[None], lp_stack[:-1]], axis=0)  # (k, 1, V)
        tok_lp = jnp.take_along_axis(
            lp_prev[:, 0, :], cand[0, :, None], axis=1)[:, 0]  # (k,)
        emit_lp = jnp.sum(jnp.where(idx < n_emit, tok_lp, 0.0))
        sum_logp = jnp.where(s.done, s.sum_logp, s.sum_logp + emit_lp)
        length = jnp.where(s.done, s.length, s.length + n_emit)
        done = s.done | newly_done

        # the distribution for position seq_len + n_emit: produced by the
        # last ACCEPTED candidate, so it equals what plain greedy computes
        logp_next = jax.lax.dynamic_index_in_dim(
            lp_stack, n_emit - 1, axis=0, keepdims=False)

        return SpecState(
            tokens=tokens,
            length=length,
            seq_len=s.seq_len + n_emit,
            done=done,
            logp_next=logp_next,
            sum_logp=sum_logp,
            t_self_k=cache_t.self_k,
            t_self_v=cache_t.self_v,
            d_self_k=d_self_k,
            d_self_v=d_self_v,
        )

    state = jax.lax.while_loop(cond, body, state)
    if ns_prob is not None:
        return state.tokens, state.length, state.sum_logp, ns_prob
    return state.tokens, state.length, state.sum_logp
