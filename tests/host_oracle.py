"""Pure-NumPy float64 implementation of the reference's COMPLETE pipeline.

An independent, host-only executable specification of whisper-burn's
end-to-end semantics (src/transcribe.rs:23-383), used by
tests/test_golden_oracle.py as the strongest offline stand-in for the
env-blocked golden E2E gate: it composes EVERY stage -- log-mel frontend
(src/audio.rs:34-56), encoder/decoder forward (src/model/mod.rs),
full-recompute host beam search (src/beam.rs driven as in
src/transcribe.rs:253-307), windowing with the ~14.9s/3s-overlap rule
(src/transcribe.rs:114-138), the 10-frame zero pad (src/transcribe.rs:170-177)
and token-overlap stitching (src/transcribe.rs:76-110) -- so composition bugs
cannot hide between the piecewise parity tests.

Deliberately different implementation style from whisper_tpu: per-layer
Python loops, np.fft.rfft instead of the GEMM-DFT, f64 throughout, a
dict-of-arrays walked by explicit indexing. Shares ONLY the parameter pytree
(the object under test is the compute, not the storage layout) and the
host-side tokenizer.
"""

from __future__ import annotations

import math
from typing import List, Optional, Sequence, Tuple

import numpy as np
from scipy.special import erf

from whisper_tpu.decode import host_beam

N_FFT = 400
HOP = 160
SAMPLE_RATE = 16000


# ---------------------------------------------------------------------------
# Audio frontend (src/audio.rs:34-56), f64 with np.fft.rfft.
# ---------------------------------------------------------------------------


def oracle_max_waveform_samples(n_frame_max: int) -> int:
    """src/audio.rs:12-17: HOP*(n+1) + is_odd(N_FFT) - 1."""
    return HOP * (n_frame_max + 1) + (N_FFT % 2) - 1


def oracle_mel_filters(n_mels: int, sr: float = SAMPLE_RATE) -> np.ndarray:
    """Slaney-normalized triangular filterbank (src/audio.rs:67-143), f64."""

    def hz_to_mel(f):
        f_sp = 200.0 / 3.0
        if f >= 1000.0:
            return 1000.0 / f_sp + math.log(f / 1000.0) / (math.log(6.4) / 27.0)
        return f / f_sp

    def mel_to_hz(m):
        f_sp = 200.0 / 3.0
        min_log_mel = 1000.0 / f_sp
        out = np.empty_like(m)
        for i, mv in enumerate(m):
            if mv >= min_log_mel:
                out[i] = 1000.0 * math.exp((math.log(6.4) / 27.0) * (mv - min_log_mel))
            else:
                out[i] = f_sp * mv
        return out

    n_freq = N_FFT // 2 + 1
    fftfreqs = np.arange(n_freq, dtype=np.float64) * (sr / N_FFT)
    mel_pts = np.linspace(hz_to_mel(0.0), hz_to_mel(sr / 2.0), n_mels + 2)
    hz_pts = mel_to_hz(mel_pts)

    w = np.zeros((n_mels, n_freq))
    for m in range(n_mels):
        lo, ctr, hi = hz_pts[m], hz_pts[m + 1], hz_pts[m + 2]
        up = (fftfreqs - lo) / (ctr - lo)
        down = (hi - fftfreqs) / (hi - ctr)
        w[m] = np.maximum(0.0, np.minimum(up, down)) * (2.0 / (hi - lo))
    return w


def oracle_prep_audio(wave: np.ndarray, n_mels: int) -> np.ndarray:
    """Waveform (T,) -> log-mel (n_mels, F): reflection pad, periodic Hann,
    rfft power, drop-last-frame, mel matmul, log10@1e-10, (max-8) clamp,
    (x+4)/4 (src/audio.rs:34-56)."""
    x = np.asarray(wave, np.float64)
    pad = N_FFT // 2
    xp = np.pad(x, (pad, pad), mode="reflect")
    n_frames = (len(xp) - N_FFT) // HOP + 1
    n = np.arange(N_FFT, dtype=np.float64)
    window = np.sin(n * math.pi / N_FFT) ** 2
    frames = np.stack(
        [xp[i * HOP: i * HOP + N_FFT] * window for i in range(n_frames)]
    )
    spec = np.fft.rfft(frames, axis=-1)  # (F, n_freq)
    power = (spec.real ** 2 + spec.imag ** 2).T  # (n_freq, F)
    power = power[:, :-1]  # drop last frame (src/audio.rs:42)

    mel = oracle_mel_filters(n_mels) @ power
    log_spec = np.log10(np.maximum(mel, 1e-10))
    log_spec = np.maximum(log_spec, log_spec.max() - 8.0)
    return (log_spec + 4.0) / 4.0


# ---------------------------------------------------------------------------
# Model forward (src/model/mod.rs), f64 per-layer loops.
# ---------------------------------------------------------------------------


def _gelu(x: np.ndarray) -> np.ndarray:
    return 0.5 * x * (1.0 + erf(x / math.sqrt(2.0)))


def _ln(x: np.ndarray, g: np.ndarray, b: np.ndarray, eps: float) -> np.ndarray:
    mu = x.mean(-1, keepdims=True)
    var = ((x - mu) ** 2).mean(-1, keepdims=True)
    return (x - mu) / np.sqrt(var + eps) * g + b


def _softmax(x: np.ndarray) -> np.ndarray:
    e = np.exp(x - x.max(-1, keepdims=True))
    return e / e.sum(-1, keepdims=True)


def _attn(q, k, v, n_head, mask=None):
    """(S, d) projections; (d/h)^-0.25 on BOTH q and k
    (src/model/mod.rs:493-533)."""
    sq, d = q.shape
    sk = k.shape[0]
    hd = d // n_head
    scale = (d / n_head) ** -0.25
    qh = (q * scale).reshape(sq, n_head, hd).transpose(1, 0, 2)
    kh = (k * scale).reshape(sk, n_head, hd).transpose(1, 2, 0)
    vh = v.reshape(sk, n_head, hd).transpose(1, 0, 2)
    scores = qh @ kh  # (h, sq, sk)
    if mask is not None:
        scores = scores + mask
    return (_softmax(scores) @ vh).transpose(1, 0, 2).reshape(sq, d)


def _conv1d(x: np.ndarray, w: np.ndarray, b: np.ndarray, stride: int) -> np.ndarray:
    """x (T, C_in), w (K=3, C_in, C_out), padding=1 -> (ceil(T/stride), C_out)."""
    k, cin, cout = w.shape
    xp = np.pad(x, ((1, 1), (0, 0)))
    t_out = (x.shape[0] + 2 - k) // stride + 1
    out = np.zeros((t_out, cout))
    for j in range(k):
        out += xp[j: j + (t_out - 1) * stride + 1: stride] @ w[j]
    return out + b


class OracleWhisper:
    """f64 NumPy forward over the whisper_tpu parameter pytree."""

    def __init__(self, params, cfg):
        self.p = {
            side: {
                k: (
                    {kk: np.asarray(vv, np.float64) for kk, vv in v.items()}
                    if k == "blocks"
                    else np.asarray(v, np.float64)
                )
                for k, v in params[side].items()
            }
            for side in ("encoder", "decoder")
        }
        self.cfg = cfg

    def encode(self, mel: np.ndarray) -> np.ndarray:
        """mel (n_mels, T) -> (ceil(T/2), d) (src/model/mod.rs:228-260)."""
        cfg = self.cfg.audio_encoder_config
        e = self.p["encoder"]
        assert mel.shape[0] == cfg.n_mels
        assert mel.shape[1] <= cfg.n_audio_ctx  # the reference's quirky guard
        x = _gelu(_conv1d(mel.T, e["conv1_w"], e["conv1_b"], 1))
        x = _gelu(_conv1d(x, e["conv2_w"], e["conv2_b"], 2))
        x = x + e["pos_emb"][: x.shape[0]]
        blk = e["blocks"]
        for i in range(cfg.n_audio_layer):
            x = self._block(x, blk, i, cfg.n_audio_head, xa=None)
        return _ln(x, e["ln_post_g"], e["ln_post_b"], self.cfg.ln_eps)

    def decode(self, tokens: Sequence[int], enc: np.ndarray) -> np.ndarray:
        """tokens (S,) + enc (Sa, d) -> logits (S, V) (src/model/mod.rs:131-157)."""
        cfg = self.cfg.text_decoder_config
        d = self.p["decoder"]
        toks = np.asarray(tokens, np.int64)
        s = len(toks)
        x = d["tok_emb"][toks] + d["pos_emb"][:s]
        mask = np.triu(np.full((s, s), -np.inf), 1)
        blk = d["blocks"]
        for i in range(cfg.n_text_layer):
            x = self._block(x, blk, i, cfg.n_text_head, xa=enc, mask=mask)
        x = _ln(x, d["ln_g"], d["ln_b"], self.cfg.ln_eps)
        return x @ d["tok_emb"].T

    def _block(self, x, blk, i, n_head, xa, mask=None):
        eps = self.cfg.ln_eps
        h = _ln(x, blk["attn_ln_g"][i], blk["attn_ln_b"][i], eps)
        d = h.shape[-1]
        qkv = h @ blk["qkv_w"][i].reshape(d, 3 * d) + blk["qkv_b"][i].reshape(-1)
        q, k, v = np.split(qkv, 3, axis=-1)
        x = x + _attn(q, k, v, n_head, mask) @ blk["attn_o_w"][i] + blk["attn_o_b"][i]

        if xa is not None:
            h = _ln(x, blk["cross_ln_g"][i], blk["cross_ln_b"][i], eps)
            q = h @ blk["cross_q_w"][i] + blk["cross_q_b"][i]
            kv = xa @ blk["cross_kv_w"][i].reshape(d, 2 * d) + blk["cross_kv_b"][i].reshape(-1)
            ck, cv = np.split(kv, 2, axis=-1)
            x = x + _attn(q, ck, cv, n_head) @ blk["cross_o_w"][i] + blk["cross_o_b"][i]

        h = _ln(x, blk["mlp_ln_g"][i], blk["mlp_ln_b"][i], eps)
        h = _gelu(h @ blk["mlp1_w"][i] + blk["mlp1_b"][i]) @ blk["mlp2_w"][i] + blk["mlp2_b"][i]
        return x + h


# ---------------------------------------------------------------------------
# Per-window decode: full-recompute beam / greedy with the suppression rule
# (src/transcribe.rs:148-383).
# ---------------------------------------------------------------------------


def _log_softmax(x: np.ndarray) -> np.ndarray:
    s = x - x.max(-1, keepdims=True)
    return s - np.log(np.exp(s).sum(-1, keepdims=True))


def oracle_window_tokens(
    model: OracleWhisper,
    mel: np.ndarray,  # (n_mels, F) for one window
    prompt: List[int],
    eot_id: int,
    suppress_mask: np.ndarray,  # (V,) 0 / -inf
    strategy: str,
    beam_size: int,
    max_depth: int,
    padding: int,
    suppress_until_len: int,
) -> List[int]:
    """One window: clip+pad mel, encode once, decode (src/transcribe.rs:148-383).

    Beam drives the generic host_beam.beam_search with a full-recompute
    `next` closure exactly like the reference's beamsearch_next
    (src/transcribe.rs:253-307). Greedy is stepwise argmax with the same
    masking (the repo's live-greedy semantics, decode/greedy.py).
    """
    enc_ctx = model.cfg.audio_encoder_config.n_audio_ctx
    keep = min(mel.shape[1], enc_ctx - padding)
    mel = np.pad(mel[:, :keep], ((0, 0), (0, padding)))
    enc = model.encode(mel)
    ctx = model.cfg.text_decoder_config.n_text_ctx
    max_len = min(ctx, len(prompt) + max_depth)

    def next_logp(seq: Sequence[int]) -> np.ndarray:
        logits = model.decode(seq, enc)[-1]
        if len(seq) <= suppress_until_len:
            logits = logits + suppress_mask
        return _log_softmax(logits)

    if strategy == "greedy":
        seq = list(prompt)
        while len(seq) < max_len:
            tok = int(np.argmax(next_logp(seq)))
            seq.append(tok)
            if tok == eot_id:
                break
        return seq

    def next_fn(beams):
        out = []
        for b in beams:
            row = next_logp(b.seq)
            out.append([(t, b.log_prob + row[t]) for t in range(len(row))])
        return out

    return host_beam.beam_search(
        [host_beam.BeamNode(list(prompt), 0.0)],
        next_fn,
        lambda seq: len(seq) > 0 and seq[-1] == eot_id,
        beam_size,
        max_depth,
    )


# ---------------------------------------------------------------------------
# Long-form driver: windowing + stitching (src/transcribe.rs:23-138).
# ---------------------------------------------------------------------------


def oracle_find_overlap(
    prev: Sequence[int], curr: Sequence[int], max_n_offsets: int,
    min_n_overlaps: int,
) -> Optional[Tuple[int, int]]:
    """Best suffix(prev)/prefix(curr) alignment (src/transcribe.rs:76-110);
    aligned equal pairs need not be contiguous."""
    best_count, best = 0, None
    for offset in range(min(len(prev), len(curr), max_n_offsets)):
        start = len(prev) - 1 - offset
        tail = prev[start:]
        hits = [j for j in range(min(len(tail), len(curr))) if tail[j] == curr[j]]
        if len(hits) > best_count:
            best_count = len(hits)
            best = (start + hits[0], hits[0])
    return best if best_count >= min_n_overlaps else None


def oracle_waveform_to_text(
    params,
    cfg,
    tokenizer,
    lang: str,
    waveform: np.ndarray,
    sample_rate: int = SAMPLE_RATE,
    task: str = "transcribe",
    strategy: str = "beam",
    beam_size: int = 5,
    max_depth: int = 100,
    padding: int = 10,
    chunk_overlap_seconds: float = 3.0,
    stitch_max_offsets: int = 40,
    stitch_min_overlaps: int = 3,
    suppress_until_len: int = 5,
) -> Tuple[str, List[int], List[str]]:
    """Complete reference pipeline (src/transcribe.rs:23-74) in f64 NumPy.

    Returns (text, tokens, per-chunk texts). Mirrors the repo pipeline's two
    documented divergences from the reference: overlap >= window clamps to
    window//2 (the reference degenerates to 1-sample shifts) and sub-n_fft
    tail windows are skipped (the reference would panic).
    """
    model = OracleWhisper(params, cfg)
    n_mels = cfg.audio_encoder_config.n_mels
    enc_ctx = cfg.audio_encoder_config.n_audio_ctx
    prompt = tokenizer.prompt_ids(lang, task=task)
    eot = tokenizer.eot
    suppress = np.asarray(tokenizer.suppress_mask(), np.float64)

    n_window = oracle_max_waveform_samples(enc_ctx - padding)
    overlap = int(sample_rate * chunk_overlap_seconds)
    if overlap >= n_window:
        overlap = n_window // 2
    shift = max(n_window - overlap, 1)

    tokens: List[int] = []
    chunk_texts: List[str] = []
    n = (max(len(waveform) - 1, 0)) // shift + 1
    for i in range(n):
        start = i * shift
        window = np.asarray(waveform[start: start + n_window], np.float64)
        if len(window) < N_FFT:
            continue
        mel = oracle_prep_audio(window, n_mels)
        new_tokens = oracle_window_tokens(
            model, mel, prompt, eot, suppress, strategy, beam_size,
            max_depth, padding, suppress_until_len,
        )
        spliced = oracle_find_overlap(
            tokens, new_tokens, stitch_max_offsets, stitch_min_overlaps
        )
        if spliced is not None:
            pi, ci = spliced
            tokens = tokens[:pi] + list(new_tokens[ci:])
        else:
            tokens = tokens + list(new_tokens)
        chunk_texts.append(tokenizer.decode(tokens, skip_special=True))

    text = tokenizer.decode(tokens, skip_special=True) if tokens else ""
    return text, tokens, chunk_texts
