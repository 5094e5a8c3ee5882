"""Quantization agreement gate: quantized decode vs a reference config.

Purpose (docs/PERFORMANCE.md steps 9-11): before a quantized configuration
(int8 weights and/or int8 cross-KV cache) is allowed to be the default serving
or benchmark config, demonstrate that it decodes the SAME tokens as the bf16
reference path on fixed inputs. The reference project has no quantization at
all, so this is a new capability with no whisper-burn counterpart; the bar it
enforces is the BASELINE accuracy target ("<= 0.1 absolute WER delta" --
token-identical decode implies identical WER).

`decode_agreement` runs the full production window program (log-mel frontend
-> encoder -> greedy/beam decode with KV cache) under both parameterizations
on seeded synthetic audio and reports:

  * token_match_rate: matching positions / compared positions (per window,
    up to the shorter sequence, averaged over windows);
  * exact_window_rate: fraction of windows whose decodes are identical;
  * max_logit_delta_rel: max |logits_test - logits_ref| / max|logits_ref| on
    a teacher-forced decoder forward (a decode-independent numeric bound).

Works on any params (random in CI, real checkpoints via the `quant-check`
CLI) and any pair of configurations.
"""

from __future__ import annotations

from typing import Any, Dict, Optional, Sequence

import numpy as np

import jax
import jax.numpy as jnp

from ..config import WhisperConfig
from ..models import whisper as M
from ..ops.audio import max_waveform_samples, prep_audio
from ..decode import beam as dbeam
from ..decode import greedy as dgreedy

Params = Dict[str, Any]


def _decode_windows(
    params: Params,
    waves: jax.Array,  # (W, n_samples)
    prompt: jax.Array,
    cfg: WhisperConfig,
    *,
    strategy: str,
    eot_id: int,
    suppress_mask: Optional[jax.Array],
    beam_size: int,
    max_depth: int,
    padding: int,
    kv_quant: bool,
    self_quant: bool = False,
):
    """One jitted program: W windows -> (tokens (W, ctx), lengths (W,))."""
    enc_ctx = cfg.encoder_ctx_size

    def run(params, waves, prompt, suppress):
        mel = prep_audio(waves, per_sample_max=True, n_mels=cfg.n_mels)
        keep = min(mel.shape[2], enc_ctx - padding)
        mel = jnp.pad(mel[:, :, :keep], ((0, 0), (0, 0), (0, padding)))
        enc = M.encoder_forward(params, mel, cfg)
        if strategy == "beam":
            toks, lengths, _ = dbeam.beam_search_batched(
                params, enc, prompt, cfg, eot_id=eot_id,
                suppress_mask=suppress, beam_size=beam_size,
                max_depth=max_depth, kv_quant=kv_quant,
                self_quant=self_quant,
            )
        else:
            toks, lengths, _ = dgreedy.greedy_decode(
                params, enc, prompt, cfg, eot_id=eot_id,
                suppress_mask=suppress, max_depth=max_depth,
                kv_quant=kv_quant, self_quant=self_quant,
            )
        return toks, lengths

    toks, lengths = jax.jit(run)(params, waves, prompt, suppress_mask)
    return np.asarray(toks), np.asarray(lengths)


def decode_agreement(
    params_ref: Params,
    params_test: Params,
    cfg: WhisperConfig,
    *,
    eot_id: int,
    prompt: Sequence[int],
    suppress_mask: Optional[np.ndarray] = None,
    strategies: Sequence[str] = ("greedy", "beam"),
    beam_size: int = 5,
    max_depth: int = 32,
    n_windows: int = 8,
    window_seconds: Optional[float] = None,
    padding: int = 10,
    kv_quant_test: bool = False,
    self_quant_test: bool = False,
    seed: int = 0,
) -> Dict[str, Any]:
    """Compare decodes of params_test (+ optional int8 KV) against params_ref.

    Returns {"greedy": {...}, "beam": {...}, "max_logit_delta_rel": float}
    where each strategy dict has token_match_rate, exact_window_rate, and
    n_windows. Inputs are seeded standard-normal audio at the production
    window length (or `window_seconds`), so runs are reproducible.
    """
    rng = np.random.default_rng(seed)
    if window_seconds is None:
        n_samples = max_waveform_samples(cfg.encoder_ctx_size - padding)
    else:
        n_samples = int(window_seconds * 16000)
    waves = jnp.asarray(
        rng.standard_normal((n_windows, n_samples)).astype(np.float32) * 0.1
    )
    prompt_arr = jnp.asarray(np.asarray(prompt, np.int32))
    sup = None if suppress_mask is None else jnp.asarray(suppress_mask)

    out: Dict[str, Any] = {}
    for strategy in strategies:
        kw = dict(
            strategy=strategy, eot_id=eot_id, suppress_mask=sup,
            beam_size=beam_size, max_depth=max_depth, padding=padding,
        )
        rt, rl = _decode_windows(
            params_ref, waves, prompt_arr, cfg, kv_quant=False, **kw)
        tt, tl = _decode_windows(
            params_test, waves, prompt_arr, cfg, kv_quant=kv_quant_test,
            self_quant=self_quant_test, **kw)

        matched = compared = exact = 0
        for i in range(n_windows):
            a = rt[i, : rl[i]]
            b = tt[i, : tl[i]]
            n = min(len(a), len(b))
            matched += int((a[:n] == b[:n]).sum())
            compared += max(len(a), len(b))
            exact += int(len(a) == len(b) and bool((a == b).all()))
        out[strategy] = {
            "token_match_rate": matched / max(compared, 1),
            "exact_window_rate": exact / n_windows,
            "n_windows": n_windows,
        }

    # decode-independent numeric bound: teacher-forced logits delta
    toks = jnp.asarray(
        rng.integers(0, cfg.text_decoder_config.n_vocab, (2, 8)), jnp.int32
    )
    mel = prep_audio(waves[:2], per_sample_max=True, n_mels=cfg.n_mels)
    keep = min(mel.shape[2], cfg.encoder_ctx_size - padding)
    mel = jnp.pad(mel[:, :, :keep], ((0, 0), (0, 0), (0, padding)))

    def logits_fn(p):
        enc = M.encoder_forward(p, mel, cfg)
        return M.decoder_forward(p, toks, enc, cfg)

    ref = np.asarray(jax.jit(logits_fn)(params_ref), np.float32)
    test = np.asarray(jax.jit(logits_fn)(params_test), np.float32)
    out["max_logit_delta_rel"] = float(
        np.abs(test - ref).max() / max(np.abs(ref).max(), 1e-9)
    )
    return out


def gate(report: Dict[str, Any], *, min_token_match: float = 0.99,
         max_logit_delta_rel: float = 0.1) -> None:
    """Raise AssertionError unless the agreement report clears the bar."""
    for strategy in ("greedy", "beam"):
        if strategy in report:
            rate = report[strategy]["token_match_rate"]
            assert rate >= min_token_match, (
                f"{strategy} token match {rate:.4f} < {min_token_match}"
            )
    delta = report["max_logit_delta_rel"]
    assert delta <= max_logit_delta_rel, (
        f"logit delta {delta:.4f} > {max_logit_delta_rel}"
    )
