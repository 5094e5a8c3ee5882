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
                         self_quant: bool = False, timestamps: bool = False,
                         max_initial_ts_idx: int = 50):
        """One jitted program: (B, n_samples) waveforms -> (tokens, lengths).

        With `timestamps`, both decode loops run the in-graph timestamp
        logit constraints (decode/beam.apply_timestamp_rules) per lane,
        exactly as the single-window path does -- callers must pass the
        timestamp-permitting suppress mask (`self._suppress_ts`).
        """
        key = ("batch", n_samples, prompt_len, strategy, beam_size, max_depth,
               padding, suppress_until_len, kv_quant, self_quant, timestamps,
               max_initial_ts_idx)
        if key in self._fn_cache:
            return self._fn_cache[key]
        cfg = self.cfg
        enc_ctx = cfg.encoder_ctx_size
        eot = self.tok.eot
        ts_begin = None
        if timestamps:
            if self._ts_begin is None:
                raise ValueError(
                    "timestamps=True but the tokenizer has no timestamp "
                    "tokens (<|0.00|>...)"
                )
            ts_begin = self._ts_begin

        def run(params, waves, prompt, suppress):  # waves (B, n_samples)
            mel = prep_audio(waves, per_sample_max=True, n_mels=cfg.n_mels)
            keep = min(mel.shape[2], enc_ctx - padding)
            mel = jnp.pad(mel[:, :, :keep], ((0, 0), (0, 0), (0, padding)))
            enc = M.encoder_forward(params, mel, cfg)
            if strategy == "beam":
                # flat-batched beam: B windows x beam_size lanes, one program
                toks, lengths, _ = dbeam.beam_search_batched(
                    params, enc, prompt, cfg, eot_id=eot,
                    suppress_mask=suppress, beam_size=beam_size,
                    max_depth=max_depth,
                    suppress_until_len=suppress_until_len,
                    kv_quant=kv_quant, self_quant=self_quant,
                    ts_begin=ts_begin, max_initial_ts_idx=max_initial_ts_idx,
                )
            else:
                toks, lengths, _ = dgreedy.greedy_decode(
                    params, enc, prompt, cfg, eot_id=eot,
                    suppress_mask=suppress, max_depth=max_depth,
                    suppress_until_len=suppress_until_len,
                    kv_quant=kv_quant, self_quant=self_quant,
                    ts_begin=ts_begin, max_initial_ts_idx=max_initial_ts_idx,
                )
            return toks, lengths

        fn = jax.jit(run)
        self._fn_cache[key] = fn
        return fn

    def _decode_windows(
        self,
        waveforms: Sequence[np.ndarray],
        sample_rate: int,
        opt: DecodeOptions,
        timestamps: bool = False,
        max_ts_idx: int = 50,
    ):
        """Window + batch-decode N streams; the shared engine under both
        `transcribe_many` and `transcribe_many_with_timestamps`.

        Returns (results, bounds, n_windows): results[(stream, window)] is
        the decoded token list (conditioning prefix stripped; missing keys
        = VAD-skipped or sub-n_fft windows), bounds[(stream, window)] the
        (start, end) sample range, n_windows[stream] the window count.
        """
        cfg = self.cfg
        n_window = max_waveform_samples(cfg.encoder_ctx_size - opt.padding)
        overlap = int(sample_rate * opt.chunk_overlap_seconds)
        if overlap >= n_window:
            overlap = n_window // 2
        prompt, n_cond = self._build_prompt(opt)
        sup_len = opt.suppress_until_len + n_cond
        suppress = self._suppress_ts if timestamps else self._suppress

        # 1. collect windows: full-size ones go to the batch queue
        full: List[Tuple[int, int, np.ndarray]] = []  # (stream, window_idx, wave)
        tail: List[Tuple[int, int, np.ndarray]] = []
        n_windows = [0] * len(waveforms)
        bounds: dict = {}
        for s, wave in enumerate(waveforms):
            wave = np.asarray(wave, np.float32)
            for w, (start, end) in enumerate(
                window_waveform(wave, sample_rate, n_window, overlap)
            ):
                chunk = np.ascontiguousarray(wave[start:end])
                n_windows[s] = w + 1
                bounds[(s, w)] = (start, end)
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
            opt.self_quant, timestamps=timestamps,
            max_initial_ts_idx=max_ts_idx,
        )
        for i in range(0, len(full), B):
            group = full[i : i + B]
            waves = np.stack([g[2] for g in group])
            if len(group) < B:
                waves = np.concatenate(
                    [waves, np.repeat(waves[:1], B - len(group), axis=0)]
                )
            toks, lengths = fn(self.params, self._place_batch(waves), prompt,
                               suppress)
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
                timestamps=timestamps, max_initial_ts_idx=max_ts_idx,
            )
            toks_dev, length = sfn(self.params, jnp.asarray(chunk), prompt,
                                   suppress)
            results[(s, w)] = [
                int(t) for t in np.asarray(toks_dev)[: int(length)]][n_cond:]
        return results, bounds, n_windows

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
        tok = self.tok
        results, _, n_windows = self._decode_windows(
            waveforms, sample_rate, opt)

        # per-stream stitching (src/transcribe.rs:56-63 semantics)
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

    def transcribe_many_with_timestamps(
        self,
        waveforms: Sequence[np.ndarray],
        sample_rate: int = SAMPLE_RATE,
        options: Optional[DecodeOptions] = None,
        word_timestamps: bool = False,
    ) -> List[Tuple[str, list]]:
        """Timestamped transcription of N streams on the batched path;
        returns [(text, [Segment])], stream-for-stream identical to
        `Transcriber.transcribe_with_timestamps` (same windowing, the same
        in-graph timestamp rules per lane, and the SAME TimestampStitcher)
        while all full windows across all streams share the chip-efficient
        batched decode program.

        `word_timestamps` attaches per-word cross-attention DTW timings to
        each segment (one alignment pass per decode window, as in the
        single-stream path).
        """
        import dataclasses

        from .segments import TimestampStitcher

        opt = dataclasses.replace(
            options or DecodeOptions(), timestamps=True)
        if opt.condition_on_previous_text:
            # window i+1's prompt depends on window i's text: sequential by
            # construction, so batching across windows is impossible -- run
            # each stream through the single-stream path (executables are
            # still shared via self._fn_cache).
            log.info("condition_on_previous_text: falling back to the "
                     "sequential single-stream path per stream")
            return [
                self.transcribe_with_timestamps(
                    w, sample_rate, opt, word_timestamps=word_timestamps)
                for w in waveforms
            ]
        max_ts_idx = max(0, int(round(opt.max_initial_timestamp / 0.02)))
        results, bounds, n_windows = self._decode_windows(
            waveforms, sample_rate, opt, timestamps=True,
            max_ts_idx=max_ts_idx)

        out: List[Tuple[str, list]] = []
        for s in range(len(waveforms)):
            st = TimestampStitcher(
                self.tok, opt.stitch_max_offsets, opt.stitch_min_overlaps)
            for w in range(n_windows[s]):
                toks = results.get((s, w))
                if toks is None:
                    continue
                start, end = bounds[(s, w)]
                st.add_window(
                    toks, start / sample_rate, (end - start) / sample_rate)
            segs = st.segments
            if word_timestamps and segs:
                self._attach_words(
                    np.asarray(waveforms[s], np.float32), sample_rate, segs,
                    opt)
            out.append((" ".join(x.text.strip() for x in segs), segs))
        return out
