"""Batched multi-stream transcription (BASELINE config 5: "8+ concurrent
audios per chip").

New capability beyond the reference (single stream, batch-1 everywhere except
beam lanes). Strategy: every stream is windowed exactly like the single-stream
pipeline (same ~14.9 s windows / overlap / zero-pad semantics, so results
match `Transcriber.transcribe` stream-for-stream); all FULL-length windows
across all streams are packed into fixed-size batches and run through one
jitted mel->encoder->greedy program; odd-length tail windows fall back to the
per-shape single path. Host-side stitching reassembles each stream.

Scaling: construct with `mesh=make_mesh(dp=N)` and the window batches are
dp-sharded (`batch_pspec()`), so the same jitted program data-parallelizes
across chips; tp>1 additionally shards heads/MLP per the Megatron rules
(tests/test_parallel.py asserts token equality vs the meshless path).
"""

from __future__ import annotations

import functools
from typing import List, Optional, Sequence, Tuple

import numpy as np

import jax
import jax.numpy as jnp

from ..config import SAMPLE_RATE, WhisperConfig
from ..models import whisper as M
from ..ops.audio import max_waveform_samples, prep_audio
from ..decode import beam as dbeam
from ..decode import greedy as dgreedy
from ..text.tokenizer import WhisperTokenizer
from ..utils.logging import get_logger
from . import vad
from .transcribe import DecodeOptions, Transcriber, find_chunk_overlap, window_waveform

log = get_logger(__name__)


class BatchTranscriber(Transcriber):
    """Transcriber with a many-streams entry point (greedy or vmapped beam)."""

    def __init__(self, *args, batch_size: int = 8, **kwargs):
        super().__init__(*args, **kwargs)
        if self.mesh is not None:
            dp = self.mesh.shape.get("dp", 1)
            if batch_size % dp != 0:
                rounded = -(-batch_size // dp) * dp
                log.info(
                    "batch_size %d rounded up to %d (multiple of dp=%d)",
                    batch_size, rounded, dp,
                )
                batch_size = rounded
        self.batch_size = batch_size

    def _place_batch(self, waves: np.ndarray) -> jax.Array:
        """Put a (B, n) window batch on device, dp-sharded when meshed."""
        if self._batch_sharding is not None:
            return jax.device_put(waves, self._batch_sharding)
        return jnp.asarray(waves)

    def _batch_window_fn(self, n_samples: int, prompt_len: int, strategy: str,
                         beam_size: int, max_depth: int, padding: int,
                         suppress_until_len: int, kv_quant: bool = False,
                   self_quant: bool = False):
        key = ("batch", n_samples, prompt_len, strategy, beam_size, max_depth,
               padding, suppress_until_len, kv_quant, self_quant)
        if key in self._fn_cache:
            return self._fn_cache[key]
        cfg = self.cfg
        enc_ctx = cfg.encoder_ctx_size
        eot = self.tok.eot


        def run(params, waves, prompt, suppress):  # waves (B, n_samples)
            mel = prep_audio(waves, per_sample_max=True, n_mels=cfg.n_mels)
            keep = min(mel.shape[2], enc_ctx - padding)
            mel = jnp.pad(mel[:, :, :keep], ((0, 0), (0, 0), (0, padding)))
            enc = M.encoder_forward(params, mel, cfg)
            if strategy == "beam":
                # vmapped beam: B windows x beam_size lanes in one program
                toks, lengths, _ = dbeam.beam_search_batched(
                    params, enc, prompt, cfg, eot_id=eot,
                    suppress_mask=suppress, beam_size=beam_size,
                    max_depth=max_depth,
                    suppress_until_len=suppress_until_len,
                    kv_quant=kv_quant, self_quant=self_quant,
                )
            else:
                toks, lengths, _ = dgreedy.greedy_decode(
                    params, enc, prompt, cfg, eot_id=eot,
                    suppress_mask=suppress, max_depth=max_depth,
                    suppress_until_len=suppress_until_len,
                    kv_quant=kv_quant, self_quant=self_quant,
                )
            return toks, lengths

        fn = jax.jit(run)
        self._fn_cache[key] = fn
        return fn

    def transcribe_many(
        self,
        waveforms: Sequence[np.ndarray],
        sample_rate: int = SAMPLE_RATE,
        options: Optional[DecodeOptions] = None,
    ) -> List[Tuple[str, List[int]]]:
        """Transcribe N independent audio streams; returns [(text, tokens)].

        Windowing/stitching semantics are identical to `transcribe`
        (per-sample mel max keeps batched numerics equal to singleton runs).
        """
        opt = options or DecodeOptions()
        cfg, tok = self.cfg, self.tok
        n_window = max_waveform_samples(cfg.encoder_ctx_size - opt.padding)
        overlap = int(sample_rate * opt.chunk_overlap_seconds)
        if overlap >= n_window:
            overlap = n_window // 2
        prompt, n_cond = self._build_prompt(opt)
        sup_len = opt.suppress_until_len + n_cond

        # 1. collect windows: full-size ones go to the batch queue
        full: List[Tuple[int, int, np.ndarray]] = []  # (stream, window_idx, wave)
        tail: List[Tuple[int, int, np.ndarray]] = []
        n_windows = [0] * len(waveforms)
        for s, wave in enumerate(waveforms):
            wave = np.asarray(wave, np.float32)
            for w, (start, end) in enumerate(
                window_waveform(wave, sample_rate, n_window, overlap)
            ):
                chunk = np.ascontiguousarray(wave[start:end])
                n_windows[s] = w + 1
                if opt.vad and vad.is_silent(
                    chunk, sample_rate, opt.vad_threshold_db,
                    opt.vad_min_speech_seconds,
                ):
                    continue  # stitching skips missing windows below
                if len(chunk) == n_window:
                    full.append((s, w, chunk))
                elif len(chunk) >= 400:
                    tail.append((s, w, chunk))

        results: dict = {}

        # 2. run full windows in fixed-size batches (pad the last batch by
        #    repeating row 0; padded rows are discarded)
        B = self.batch_size
        fn = self._batch_window_fn(
            n_window, int(prompt.shape[0]), opt.strategy, opt.beam_size,
            opt.max_depth, opt.padding, sup_len, opt.kv_quant,
            opt.self_quant,
        )
        for i in range(0, len(full), B):
            group = full[i : i + B]
            waves = np.stack([g[2] for g in group])
            if len(group) < B:
                waves = np.concatenate(
                    [waves, np.repeat(waves[:1], B - len(group), axis=0)]
                )
            toks, lengths = fn(self.params, self._place_batch(waves), prompt,
                               self._suppress)
            toks, lengths = np.asarray(toks), np.asarray(lengths)
            for j, (s, w, _) in enumerate(group):
                results[(s, w)] = [
                    int(t) for t in toks[j, : lengths[j]]][n_cond:]
            log.info("batch %d-%d/%d windows done", i, i + len(group), len(full))

        # 3. tail windows, one at a time through the single-window path
        for s, w, chunk in tail:
            sfn = self._window_fn(
                len(chunk), int(prompt.shape[0]), opt.strategy, opt.beam_size,
                opt.max_depth, opt.padding, sup_len,
                opt.kv_quant,
                opt.self_quant,
            )
            toks_dev, length = sfn(self.params, jnp.asarray(chunk), prompt,
                                   self._suppress)
            results[(s, w)] = [
                int(t) for t in np.asarray(toks_dev)[: int(length)]][n_cond:]

        # 4. per-stream stitching (src/transcribe.rs:56-63 semantics)
        out: List[Tuple[str, List[int]]] = []
        for s in range(len(waveforms)):
            tokens: List[int] = []
            for w in range(n_windows[s]):
                new_tokens = results.get((s, w))
                if new_tokens is None:
                    continue  # skipped (<400 sample) tail
                spliced = find_chunk_overlap(
                    tokens, new_tokens, opt.stitch_max_offsets,
                    opt.stitch_min_overlaps,
                )
                if spliced is not None:
                    pi, ci = spliced
                    tokens = tokens[:pi] + new_tokens[ci:]
                else:
                    tokens.extend(new_tokens)
            out.append((tok.decode(tokens, skip_special=True), tokens))
        return out
