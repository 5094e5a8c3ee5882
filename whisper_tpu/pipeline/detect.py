"""Spoken-language identification (new capability; the reference requires the
language as a CLI argument, src/bin/transcribe/main.rs:97-105).

Standard Whisper language ID: run ONE decoder step on the prompt `[SOT]` and
read the probability mass over the language tokens at the next position
(all 99 incl. "haw" when the loaded tokenizer carries it; the reference's
table stops at 98 -- src/token.rs:50-58). One jitted program per encoder
length; cost is one decode step.
"""

from __future__ import annotations

import functools
from typing import Dict, List, Tuple

import numpy as np

import jax
import jax.numpy as jnp

from ..config import WhisperConfig
from ..models import whisper as M
from ..text.tokenizer import WhisperTokenizer


@functools.partial(jax.jit, static_argnames=("cfg",))
def _lang_logits(params, enc_out, sot: jax.Array, cfg: WhisperConfig):
    cache = M.init_cache(params, enc_out, cfg, cache_len=8)
    tokens = jnp.broadcast_to(sot, (enc_out.shape[0], 1)).astype(jnp.int32)
    logits, _ = M.decoder_step(params, tokens, jnp.int32(0), cache, cfg)
    return logits[:, 0]  # (B, V): distribution over the token after SOT


def detect_language(
    params: M.Params,
    enc_out: jax.Array,  # (B, Sa, d)
    cfg: WhisperConfig,
    tokenizer: WhisperTokenizer,
) -> List[Tuple[str, Dict[str, float]]]:
    """Returns per stream: (best language code, {code: probability}).

    Probabilities are softmax over language tokens only, like the OpenAI
    implementation's detect_language.
    """
    languages = tokenizer.available_languages()
    lang_ids = np.asarray(
        [tokenizer.language_token(c) for c in languages], np.int32
    )
    logits = np.asarray(
        _lang_logits(params, enc_out, jnp.int32(tokenizer.sot), cfg),
        np.float32,
    )
    lang_logits = logits[:, lang_ids]
    lang_logits -= lang_logits.max(axis=-1, keepdims=True)
    probs = np.exp(lang_logits)
    probs /= probs.sum(axis=-1, keepdims=True)

    out = []
    for row in probs:
        dist = {code: float(p) for code, p in zip(languages, row)}
        out.append((languages[int(row.argmax())], dist))
    return out
