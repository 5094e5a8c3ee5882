"""Batched greedy decoding as a jitted `lax.while_loop` with KV cache.

New capability relative to the reference (whose greedy loop is dead code,
src/transcribe.rs:314-378): supports B independent streams per call -- the
production multi-stream path that `pjit`/data-parallel sharding batches
across chips. Keeps the reference pipeline's special-token suppression rule
(mask while seq len <= 5, src/transcribe.rs:271-275) so outputs line up with
beam search on the same model.
"""

from __future__ import annotations

import functools
from typing import NamedTuple, Optional, Tuple

import jax
import jax.numpy as jnp

from ..config import WhisperConfig
from ..models import whisper as M
from .beam import _masked_log_softmax, apply_timestamp_rules


def _fuse_append(self_k, cfg, allow=None) -> bool:
    """True when the greedy append should ride the fused decode kernel
    (identity parents; flash + quantized self-KV). OFF by default: greedy
    has no reshuffle, its XLA appends are already in-place, and the fused
    kernel's whole-prefix write-back measured a 3-5% LOSS on chip (424.7x
    vs 437x int8 / 444.6x bf16 at large-v2 b64 -- docs/PERFORMANCE.md
    fused-reshuffle study). Kept as an opt-in A/B knob."""
    from ..config import resolve_knobs
    from ..quantize import QTensor

    if allow is False:  # explicit caller override (A/B, tests)
        return False
    return (
        cfg.attention == "flash"
        and isinstance(self_k, QTensor)
        and resolve_knobs(cfg.knobs).greedy_fused_append
    )


def make_logp_fn(
    prompt_len: int,
    eot_id: int,
    suppress_mask: Optional[jax.Array],
    suppress_until_len: int,
    ts_begin: Optional[int],
    max_initial_ts_idx: int,
    logits_hook,
):
    """The greedy token-selection distribution: suppression window +
    timestamp rules + custom hook + log-softmax, as one traced function
    `(logits (B, V), tokens (B, ctx), seq_len) -> logp (B, V)`.

    Single-sourced so the speculative decoder's draft and verify phases
    (decode/speculative.py) apply BIT-IDENTICAL masking to the plain greedy
    loop -- its token-parity guarantee rests on argmax agreement of these
    distributions. `tokens` positions >= seq_len are never read
    (apply_timestamp_rules masks reads by seq_len; hooks must honor the
    same contract)."""

    def _logp(logits, tokens, seq_len):
        x = logits.astype(jnp.float32)
        if suppress_mask is not None:
            x = jnp.where(seq_len <= suppress_until_len, x + suppress_mask, x)
        if ts_begin is not None:
            x = apply_timestamp_rules(
                x, tokens, seq_len, prompt_len, ts_begin, eot_id,
                max_initial_ts_idx,
            )
        if logits_hook is not None:
            # traced custom logit filter (OpenAI Whisper's LogitFilter
            # extension point; new capability) -- after suppression +
            # timestamp rules, before the log-softmax
            x = logits_hook(x, tokens, seq_len)
        return jax.nn.log_softmax(x, axis=-1)

    return _logp


class GreedyState(NamedTuple):
    tokens: jax.Array  # (B, n_text_ctx) i32
    length: jax.Array  # (B,) i32 per-stream sequence length (incl. prompt)
    seq_len: jax.Array  # i32 scalar: current padded length (same all streams)
    done: jax.Array  # (B,) bool
    logp_next: jax.Array  # (B, V)
    sum_logp: jax.Array  # (B,) cumulative log-prob of emitted tokens
    # self-attention KV only: the cross-KV is loop-INVARIANT and lives in
    # the body's closure -- carrying it through the while_loop makes the
    # vmapped (batched-window) loop select/copy the multi-GB cross cache
    # every step (measured ~60% beam overhead at large-v2)
    self_k: jax.Array
    self_v: jax.Array


def greedy_decode(
    params: M.Params,
    enc_out: jax.Array,  # (B, Sa, d) or (1, Sa, d) broadcast to B
    prompt: jax.Array,  # (P,) i32 shared prompt
    cfg: WhisperConfig,
    eot_id: int,
    suppress_mask: Optional[jax.Array] = None,
    batch: Optional[int] = None,
    max_depth: int = 224,
    suppress_until_len: int = 5,
    kv_quant: bool = False,
    self_quant: bool = False,
    ts_begin: Optional[int] = None,
    max_initial_ts_idx: int = 50,
    temperature: float = 0.0,  # static: 0 = argmax, >0 = sampling
    rng: Optional[jax.Array] = None,  # PRNG key, required when temperature>0
    nospeech_id: Optional[int] = None,  # also return p(<|nospeech|>) at SOT
    sot_pos: int = 0,  # prompt index of <|startoftranscript|>
    fuse_append: Optional[bool] = None,  # False: never the fused kernel
    logits_hook=None,  # LogitFilter: (logits, tokens, seq_len) -> logits
) -> Tuple[jax.Array, ...]:
    """Greedy decode; returns (tokens (B, n_text_ctx), lengths (B,), sum_logp).

    Sequences end with EOT (appended implicitly when predicted); streams that
    finish early idle until the last stream finishes (fixed-shape loop).
    `ts_begin` (the <|0.00|> id) enables the in-graph timestamp constraints
    (decode/beam.apply_timestamp_rules) for timestamped decoding.

    New capability (OpenAI-style robust decoding, beyond the reference):
    `temperature > 0` samples each token from softmax(logits/T) (one PRNG
    fold per position; `sum_logp` still accumulates UNSCALED logprobs, the
    quality signal the fallback ladder thresholds). `nospeech_id` appends a
    4th output: p(<|nospeech|>) from the prefill logits at the SOT position
    (the standard no-speech detection signal).
    """
    if temperature > 0.0 and rng is None:
        raise ValueError("temperature > 0 requires a PRNG key (rng=...)")
    dec_cfg = cfg.text_decoder_config
    ctx = dec_cfg.n_text_ctx
    P = prompt.shape[0]
    B = batch or enc_out.shape[0]

    _logp = make_logp_fn(P, eot_id, suppress_mask, suppress_until_len,
                         ts_begin, max_initial_ts_idx, logits_hook)

    tokens0 = jnp.zeros((B, ctx), jnp.int32).at[:, :P].set(prompt[None, :])
    cache_len = min(ctx, -(-(P + max_depth) // 128) * 128)
    cache = M.init_cache(params, enc_out, cfg, batch=B, cache_len=cache_len,
                         kv_quant=kv_quant, self_quant=self_quant)
    logits, cache = M.decoder_step(params, tokens0[:, :P], jnp.int32(0), cache, cfg)
    cross_k, cross_v = cache.cross_k, cache.cross_v  # loop-invariant closure
    ns_prob = None
    if nospeech_id is not None:
        # p(<|nospeech|>) at the SOT position (logits there predict the
        # language token; OpenAI reads no-speech probability off the same
        # position): softmax over the raw (unsuppressed) distribution.
        ns_prob = jax.nn.softmax(
            logits[:, sot_pos].astype(jnp.float32), axis=-1
        )[:, nospeech_id]
    logp_next = _logp(logits[:, -1], tokens0, jnp.int32(P))

    state = GreedyState(
        tokens=tokens0,
        length=jnp.full((B,), P, jnp.int32),
        seq_len=jnp.int32(P),
        done=jnp.zeros((B,), bool),
        logp_next=logp_next,
        sum_logp=jnp.zeros((B,), jnp.float32),
        self_k=cache.self_k,
        self_v=cache.self_v,
    )

    max_len = min(ctx, P + max_depth)

    def cond(s: GreedyState) -> jax.Array:
        return (~jnp.all(s.done)) & (s.seq_len < max_len)

    def body(s: GreedyState) -> GreedyState:
        if temperature > 0.0:
            tok = jax.random.categorical(
                jax.random.fold_in(rng, s.seq_len),
                s.logp_next / temperature, axis=-1,
            ).astype(jnp.int32)
        else:
            tok = jnp.argmax(s.logp_next, axis=-1).astype(jnp.int32)
        tok_logp = jnp.take_along_axis(s.logp_next, tok[:, None], axis=-1)[:, 0]
        # finished streams keep emitting EOT into the pad region
        tok = jnp.where(s.done, eot_id, tok)

        tokens = s.tokens.at[:, s.seq_len].set(tok)
        newly_done = tok == eot_id
        length = jnp.where(s.done, s.length, s.length + 1)
        sum_logp = jnp.where(s.done, s.sum_logp, s.sum_logp + tok_logp)
        done = s.done | newly_done

        full = M.DecoderCache(s.self_k, s.self_v, cross_k, cross_v)
        # WHISPER_TPU_GREEDY_FUSED_APPEND=1 (opt-in A/B knob) patches the
        # new KV row inside the fused decode kernel instead of the two XLA
        # dynamic-update-slice appends per layer; measured a LOSS for
        # greedy (see _fuse_append), win for beam (where the reshuffle
        # permute rides the same pass).
        parents = (
            jnp.arange(B, dtype=jnp.int32)
            if _fuse_append(s.self_k, cfg, fuse_append) else None
        )
        logits, cache = M.decoder_step(
            params, tok[:, None], s.seq_len, full, cfg, parents=parents)
        logp_next = _logp(logits[:, -1], tokens, s.seq_len + 1)
        return GreedyState(
            tokens=tokens,
            length=length,
            seq_len=s.seq_len + 1,
            done=done,
            logp_next=logp_next,
            sum_logp=sum_logp,
            self_k=cache.self_k,
            self_v=cache.self_v,
        )

    state = jax.lax.while_loop(cond, body, state)
    if ns_prob is not None:
        return state.tokens, state.length, state.sum_logp, ns_prob
    return state.tokens, state.length, state.sum_logp


@functools.partial(
    jax.jit,
    static_argnames=("cfg", "eot_id", "batch", "max_depth",
                     "suppress_until_len", "kv_quant", "self_quant",
                     "ts_begin", "max_initial_ts_idx", "temperature",
                     "nospeech_id", "sot_pos", "fuse_append", "logits_hook"),
)
def greedy_decode_jit(
    params,
    enc_out,
    prompt,
    cfg: WhisperConfig,
    eot_id: int,
    suppress_mask=None,
    batch: Optional[int] = None,
    max_depth: int = 224,
    suppress_until_len: int = 5,
    kv_quant: bool = False,
    self_quant: bool = False,
    ts_begin: Optional[int] = None,
    max_initial_ts_idx: int = 50,
    temperature: float = 0.0,
    rng=None,
    nospeech_id: Optional[int] = None,
    sot_pos: int = 0,
    fuse_append: Optional[bool] = None,
    logits_hook=None,
):
    return greedy_decode(
        params,
        enc_out,
        prompt,
        cfg,
        eot_id,
        suppress_mask,
        batch,
        max_depth,
        suppress_until_len,
        kv_quant,
        self_quant,
        ts_begin,
        max_initial_ts_idx,
        temperature,
        rng,
        nospeech_id,
        sot_pos,
        fuse_append,
        logits_hook,
    )
