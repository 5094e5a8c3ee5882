"""Long-form pipeline tests: stitching, windowing, end-to-end transcribe
(SURVEY.md §4 item 5, with a random tiny model standing in for real weights)."""

import numpy as np
import pytest

import jax

from whisper_tpu.config import tiny_test_config
from whisper_tpu.models import whisper as M
from whisper_tpu.pipeline.transcribe import (
    DecodeOptions,
    Transcriber,
    find_chunk_overlap,
    window_waveform,
)
from whisper_tpu.text.tokenizer import WhisperTokenizer, build_test_tokenizer_json


class TestFindChunkOverlap:
    """Parity cases for src/transcribe.rs:76-110."""

    def test_perfect_overlap(self):
        prev = [1, 2, 3, 4, 5]
        curr = [3, 4, 5, 6, 7]
        res = find_chunk_overlap(prev, curr, 40, 3)
        assert res == (2, 0)
        prev_idx, curr_idx = res
        assert prev[:prev_idx] + curr[curr_idx:] == [1, 2, 3, 4, 5, 6, 7]

    def test_no_overlap(self):
        assert find_chunk_overlap([1, 2, 3], [7, 8, 9], 40, 3) is None

    def test_min_overlaps_threshold(self):
        # only 2 matching tokens < min 3
        assert find_chunk_overlap([1, 2, 9, 9], [9, 9, 5], 40, 3) is None

    def test_non_contiguous_matches_count(self):
        # aligned matches need not be contiguous in the reference
        prev = [1, 2, 3, 9, 5]
        curr = [3, 4, 5, 6, 7, 8]  # offset 2: matches at rel idx 0 (3) and 2 (5)
        res = find_chunk_overlap(prev, curr, 40, 2)
        assert res == (2, 0)

    def test_empty(self):
        assert find_chunk_overlap([], [1, 2, 3], 40, 3) is None
        assert find_chunk_overlap([1, 2, 3], [], 40, 3) is None

    def test_max_offsets_limits_search(self):
        prev = list(range(100))
        curr = list(range(50, 120))  # overlap starts 50 tokens back
        assert find_chunk_overlap(prev, curr, 10, 3) is None
        assert find_chunk_overlap(prev, curr, 60, 3) == (50, 0)

    def test_offsets_also_capped_by_curr_len(self):
        """n_offsets = min(|prev|, |curr|, max) (src/transcribe.rs:84)."""
        prev = list(range(100))
        curr = list(range(50, 60))  # |curr|=10 caps the search depth
        assert find_chunk_overlap(prev, curr, 60, 3) is None


class TestWindowing:
    def test_bounds(self):
        # reference: shift = window - overlap; n = (len-1)//shift + 1
        wins = list(window_waveform(np.zeros(1000), 100, 300, 100))
        assert wins[0] == (0, 300)
        assert wins[1] == (200, 500)
        assert wins[-1][1] == 1000
        assert len(wins) == (1000 - 1) // 200 + 1

    def test_overlap_longer_than_window_clamps_shift(self):
        wins = list(window_waveform(np.zeros(10), 100, 5, 8))
        # shift clamped to 1 (src/transcribe.rs:122 saturating_sub + max(1))
        assert wins[0] == (0, 5) and wins[1] == (1, 6)


@pytest.fixture(scope="module")
def setup(tmp_path_factory):
    d = tmp_path_factory.mktemp("pipe")
    tok_path = str(d / "tokenizer.json")
    build_test_tokenizer_json(tok_path)
    tok = WhisperTokenizer(tok_path)
    cfg = tiny_test_config(
        n_vocab=tok.vocab_size, n_audio_ctx=64, n_text_ctx=32, n_state=8,
    )
    params = M.init_params(jax.random.PRNGKey(0), cfg)
    return params, cfg, tok


class TestTranscriber:
    def test_end_to_end_single_window(self, setup):
        params, cfg, tok = setup
        t = Transcriber(params, cfg, tok)
        # window = max_waveform_samples(64-10) = 160*55-1 samples
        wave = np.random.default_rng(0).standard_normal(5000).astype(np.float32)
        chunks = []
        text, tokens = t.transcribe(
            wave, 16000,
            DecodeOptions(lang="en", beam_size=2, max_depth=6,
                          chunk_overlap_seconds=0.01),
            on_chunk=lambda i, s: chunks.append((i, s)),
        )
        assert isinstance(text, str)
        assert len(tokens) >= 4  # at least the prompt survived
        assert chunks and chunks[0][0] == 0
        # prompt tokens present at the start
        assert tokens[: 4] == tok.prompt_ids("en")

    def test_multi_window_stitching(self, setup):
        params, cfg, tok = setup
        t = Transcriber(params, cfg, tok)
        # 3 windows of 8799 samples with small overlap
        wave = np.random.default_rng(1).standard_normal(20000).astype(np.float32)
        chunks = []
        text, tokens = t.transcribe(
            wave, 16000,
            DecodeOptions(lang="en", strategy="greedy", max_depth=6,
                          chunk_overlap_seconds=0.02),
            on_chunk=lambda i, s: chunks.append(i),
        )
        assert len(chunks) >= 2  # several windows processed
        assert isinstance(text, str)

    def test_greedy_and_beam_agree_on_trivial(self, setup):
        """With beam_size=1 beam search reduces to greedy's argmax path."""
        params, cfg, tok = setup
        t = Transcriber(params, cfg, tok)
        wave = np.random.default_rng(2).standard_normal(4000).astype(np.float32)
        opts = dict(lang="en", max_depth=5, chunk_overlap_seconds=0.01)
        _, toks_beam = t.transcribe(
            wave, 16000, DecodeOptions(strategy="beam", beam_size=1, **opts),
            on_chunk=lambda *a: None)
        _, toks_greedy = t.transcribe(
            wave, 16000, DecodeOptions(strategy="greedy", **opts),
            on_chunk=lambda *a: None)
        assert toks_beam == toks_greedy

    def test_tail_window_shorter_than_fft_skipped(self, setup):
        params, cfg, tok = setup
        t = Transcriber(params, cfg, tok)
        # length chosen so the final window is < 400 samples
        n_window = 160 * 55 - 1  # max_waveform_samples(54)
        wave = np.random.default_rng(3).standard_normal(
            n_window + 300
        ).astype(np.float32)
        text, tokens = t.transcribe(
            wave, 16000,
            DecodeOptions(lang="en", strategy="greedy", max_depth=4,
                          chunk_overlap_seconds=0.0),
            on_chunk=lambda *a: None,
        )
        assert isinstance(text, str)


class TestDeterminismAndNumerics:
    """SURVEY.md §5: deterministic-order tests + nan debugging in place of the
    reference's (absent) sanitizers."""

    def test_transcribe_deterministic(self, setup):
        params, cfg, tok = setup
        t = Transcriber(params, cfg, tok)
        wave = np.random.default_rng(7).standard_normal(6000).astype(np.float32)
        opts = DecodeOptions(lang="en", beam_size=2, max_depth=5,
                             chunk_overlap_seconds=0.01)
        _, toks1 = t.transcribe(wave, 16000, opts, on_chunk=lambda *a: None)
        _, toks2 = t.transcribe(wave, 16000, opts, on_chunk=lambda *a: None)
        assert toks1 == toks2

    def test_debug_nans_context(self, setup):
        import jax
        import jax.numpy as jnp

        from whisper_tpu.utils.debug import assert_all_finite, debug_nans

        params, cfg, tok = setup
        assert_all_finite(params, "params")
        with pytest.raises(FloatingPointError):
            assert_all_finite({"x": jnp.asarray([1.0, float("nan")])})
        with debug_nans():
            with pytest.raises(FloatingPointError):
                jnp.asarray(0.0) / jnp.asarray(0.0)
        assert jax.config.jax_debug_nans is False


class TestLanguageDetection:
    def test_returns_valid_distribution(self, setup):
        params, cfg, tok = setup
        t = Transcriber(params, cfg, tok)
        wave = np.random.default_rng(9).standard_normal(5000).astype(np.float32)
        code, dist = t.detect_language(wave)
        from whisper_tpu.text.tokenizer import LANGUAGES

        assert code in LANGUAGES
        assert abs(sum(dist.values()) - 1.0) < 1e-5
        assert max(dist, key=dist.get) == code

    def test_too_short_raises(self, setup):
        params, cfg, tok = setup
        t = Transcriber(params, cfg, tok)
        with pytest.raises(ValueError):
            t.detect_language(np.zeros(100, np.float32))


class TestTimestamps:
    """Timestamped decoding (new capability; the reference always decodes
    with <|notimestamps|>, src/transcribe.rs:203)."""

    @pytest.fixture(scope="class")
    def full_tok(self, tmp_path_factory):
        from whisper_tpu.text.tokenizer import (
            WhisperTokenizer, build_full_scale_tokenizer_json,
        )

        path = str(tmp_path_factory.mktemp("ts") / "tokenizer.json")
        build_full_scale_tokenizer_json(path)
        return WhisperTokenizer(path)

    def test_tokenizer_timestamp_helpers(self, full_tok):
        t = full_tok
        assert t.timestamp_begin == 50364
        assert t.is_timestamp(50364) and t.is_timestamp(51864)
        assert not t.is_timestamp(50363) and not t.is_timestamp(100)
        assert t.timestamp_seconds(50364) == 0.0
        assert t.timestamp_seconds(50364 + 150) == pytest.approx(3.0)

    def test_segments_from_tokens(self, full_tok):
        from whisper_tpu.pipeline.segments import segments_from_tokens

        t = full_tok
        w = [100]  # a base token ("w100 ")
        ts = lambda s: t.timestamp_begin + int(round(s / 0.02))
        tokens = ([t.sot, ts(0.0)] + w + [ts(1.5), ts(1.5)] + w + w
                  + [ts(4.0), t.eot])
        segs = segments_from_tokens(tokens, t, offset_s=10.0)
        assert len(segs) == 2
        assert segs[0].start == pytest.approx(10.0)
        assert segs[0].end == pytest.approx(11.5)
        assert segs[1].start == pytest.approx(11.5)
        assert segs[1].end == pytest.approx(14.0)
        assert segs[0].text.strip() and segs[1].text.strip()

    def test_unclosed_segment_bounded_by_window(self, full_tok):
        from whisper_tpu.pipeline.segments import segments_from_tokens

        t = full_tok
        w = [200]
        tokens = [t.timestamp_begin + 50] + w  # open at 1.0 s, never closed
        segs = segments_from_tokens(tokens, t, offset_s=0.0, window_s=14.9)
        assert len(segs) == 1
        assert segs[0].start == pytest.approx(1.0)
        assert segs[0].end == pytest.approx(14.9)

    def test_prompt_omits_notimestamps(self, full_tok):
        assert full_tok.no_timestamps not in full_tok.prompt_ids(
            "en", timestamps=True)

    def test_end_to_end_with_timestamps(self, setup):
        """transcribe_with_timestamps runs the full pipeline (random tiny
        model: segments may be empty, but the path must execute)."""
        params, cfg, tok = setup
        t = Transcriber(params, cfg, tok)
        wave = np.random.default_rng(3).standard_normal(9000).astype(np.float32)
        text, segs = t.transcribe_with_timestamps(
            wave, 16000,
            DecodeOptions(lang="en", strategy="greedy", max_depth=6,
                          chunk_overlap_seconds=0.02),
        )
        assert isinstance(text, str) and isinstance(segs, list)


class TestQuantizedPipelineOptions:
    """The quantized-cache DecodeOptions reach the decode layer end to end."""

    def test_self_quant_beam_transcribe(self, setup):
        params, cfg, tok = setup
        t = Transcriber(params, cfg, tok)
        wave = np.random.default_rng(3).standard_normal(5000).astype(
            np.float32)
        text, tokens = t.transcribe(
            wave, 16000,
            DecodeOptions(lang="en", beam_size=2, max_depth=6,
                          chunk_overlap_seconds=0.01,
                          kv_quant=True, self_quant=True),
        )
        assert isinstance(text, str) and len(tokens) >= 4

    def test_int4_kv_greedy_transcribe(self, setup):
        params, cfg, tok = setup
        t = Transcriber(params, cfg, tok)
        wave = np.random.default_rng(4).standard_normal(5000).astype(
            np.float32)
        text, tokens = t.transcribe(
            wave, 16000,
            DecodeOptions(lang="en", strategy="greedy", max_depth=6,
                          chunk_overlap_seconds=0.01, kv_quant="int4"),
        )
        assert isinstance(text, str) and len(tokens) >= 4

    def test_translate_task_prompt(self, setup):
        """task="translate" swaps the task token in the decode prompt
        (the reference hard-codes <|transcribe|>, src/transcribe.rs:203;
        translate is the multilingual models' X->English mode)."""
        params, cfg, tok = setup
        t = Transcriber(params, cfg, tok)
        wave = np.random.default_rng(5).standard_normal(5000).astype(
            np.float32)
        text, tokens = t.transcribe(
            wave, 16000,
            DecodeOptions(lang="de", task="translate", strategy="greedy",
                          max_depth=5, chunk_overlap_seconds=0.01),
        )
        assert tokens[:4] == tok.prompt_ids("de", task="translate")
        assert tokens[2] == tok.translate
