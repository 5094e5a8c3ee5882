"""Long-form pipeline tests: stitching, windowing, end-to-end transcribe
(SURVEY.md §4 item 5, with a random tiny model standing in for real weights)."""

import dataclasses

import numpy as np
import pytest

import jax
import jax.numpy as jnp

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


class TestTimestampRules:
    """In-graph timestamp logit constraints (VERDICT r2 weak #3): the
    standard Whisper decode-time rules, unit-tested on a toy vocabulary.

    Toy layout: V=20, eot=5, ts_begin=12 (ids 12..19 are timestamps),
    prompt_len=2."""

    V, EOT, TS, P = 20, 5, 12, 2

    def _rules(self, tokens, seq_len, max_initial=50):
        import jax.numpy as jnp

        from whisper_tpu.decode.beam import apply_timestamp_rules

        logits = jnp.zeros((1, self.V), jnp.float32)
        toks = np.zeros((1, 10), np.int32)
        toks[0, : len(tokens)] = tokens
        out = np.asarray(
            apply_timestamp_rules(
                logits, jnp.asarray(toks), jnp.int32(seq_len), self.P,
                self.TS, self.EOT, max_initial,
            )
        )[0]
        return np.isneginf(out)

    def test_first_sampled_must_be_capped_timestamp(self):
        masked = self._rules([1, 2], seq_len=2, max_initial=3)
        assert masked[: self.TS].all()  # no text at the first position
        assert not masked[self.TS: self.TS + 4].any()  # <= cap allowed
        assert masked[self.TS + 4:].all()  # beyond max_initial masked

    def test_open_stamp_forces_timestamp_or_eot(self):
        # seq = [p, p, ts] -> single (opening) stamp is pending. EOT gets a
        # strong logit so the sum rule (which, as in OpenAI's reference,
        # may legitimately mask EOT when timestamp mass dominates) stays
        # quiet and the PAIR rule is isolated.
        import jax.numpy as jnp

        from whisper_tpu.decode.beam import apply_timestamp_rules

        logits = np.zeros((1, self.V), np.float32)
        logits[0, self.EOT] = 8.0
        toks = np.zeros((1, 10), np.int32)
        toks[0, :3] = [1, 2, self.TS]
        masked = np.isneginf(np.asarray(
            apply_timestamp_rules(
                jnp.asarray(logits), jnp.asarray(toks), jnp.int32(3), self.P,
                self.TS, self.EOT, 50,
            )
        )[0])
        assert not masked[self.EOT]
        assert not masked[self.TS:].any()  # same stamp may close the pair
        others = [i for i in range(self.TS) if i != self.EOT]
        assert masked[others].all()

    def test_closed_pair_forbids_timestamp(self):
        # seq = [p, p, ts, ts] -> pair closed, next must be text
        masked = self._rules([1, 2, self.TS, self.TS], seq_len=4)
        assert masked[self.TS:].all()
        assert not masked[7]  # ordinary text allowed

    def test_monotonic_floor(self):
        # closed pair at ts+2: every stamp below ts+3 is masked
        masked = self._rules([1, 2, self.TS + 2, self.TS + 2, 7], seq_len=5)
        assert masked[self.TS: self.TS + 3].all()
        assert not masked[self.TS + 3:].any()

    def test_sum_rule_forces_timestamp(self):
        import jax.numpy as jnp

        from whisper_tpu.decode.beam import apply_timestamp_rules

        # timestamp mass dominates every text token -> text masked
        logits = np.zeros((1, self.V), np.float32)
        logits[0, self.TS:] = 3.0
        toks = np.zeros((1, 10), np.int32)
        toks[0, :5] = [1, 2, self.TS, self.TS, 7]
        out = np.asarray(
            apply_timestamp_rules(
                jnp.asarray(logits), jnp.asarray(toks), jnp.int32(5), self.P,
                self.TS, self.EOT, 50,
            )
        )[0]
        assert np.isneginf(out[: self.TS]).all()

    def test_greedy_loop_emits_wellformed_timestamps(self, setup):
        """The rules hold inside the jitted greedy while_loop: first sampled
        token is a stamp, stamps never decrease, and text never directly
        follows a single (opening) stamp."""
        import jax
        import jax.numpy as jnp

        from whisper_tpu.decode import greedy as dgreedy
        from whisper_tpu.models import whisper as M

        params, cfg, tok = setup
        ts_begin = tok.timestamp_begin
        enc = jax.random.normal(
            jax.random.PRNGKey(2), (1, 8, cfg.n_state), jnp.float32)
        prompt = jnp.asarray(tok.prompt_ids("en", timestamps=True), jnp.int32)
        m = np.asarray(tok.suppress_mask()).copy()
        m[ts_begin:] = 0.0
        toks, lens, _ = dgreedy.greedy_decode(
            params, enc, prompt, cfg, eot_id=tok.eot,
            suppress_mask=jnp.asarray(m), max_depth=10,
            ts_begin=ts_begin,
        )
        seq = [int(t) for t in np.asarray(toks)[0][: int(lens[0])]]
        sampled = seq[len(prompt):]
        assert sampled, "no tokens sampled"
        assert sampled[0] >= ts_begin  # rule 3
        last_ts = -1
        for i, t in enumerate(sampled):
            if t >= ts_begin:
                assert t >= last_ts  # rule 2
                last_ts = t
            prev_is_open = (
                i > 0 and sampled[i - 1] >= ts_begin
                and (i < 2 or sampled[i - 2] < ts_begin)
            )
            if prev_is_open:
                assert t >= ts_begin or t == tok.eot  # rule 1


class TestTimestampStitching:
    """Segment-aware token-overlap stitching (VERDICT r2 weak #3): windows
    are joined by the same stitcher as the plain path, trimming segments at
    the exact splice index -- boundary text is neither dropped nor doubled."""

    def _fake_transcriber(self, setup, seqs):
        params, cfg, tok = setup

        class FakeWindows(Transcriber):
            def _window_fn(self, *a, quality=False, **k):
                def fn(params, wave, prompt, suppress, rng=None):
                    toks = seqs.pop(0)
                    arr = np.zeros(
                        cfg.text_decoder_config.n_text_ctx, np.int32)
                    arr[: len(toks)] = toks
                    if quality:  # (tokens, length, sum_logp, ns_prob)
                        return arr, len(toks), 0.0, -1.0
                    return arr, len(toks)

                return fn

        return FakeWindows(params, cfg, tok), tok

    def test_splice_trims_not_drops(self, setup):
        params, cfg, tok = setup
        ts = tok.timestamp_begin  # test tokenizer: <|0.00|>..<|0.06|>
        A, B, C, D, E, F, G = tok.encode("abcdefg")
        sot, en = tok.sot, tok.language_token("en")
        tr, eot = tok.transcribe, tok.eot
        w1 = [sot, en, tr, ts, A, B, ts + 1, ts + 1, C, D, E, ts + 2, eot]
        w2 = [sot, en, tr, ts, C, D, E, ts + 1, ts + 1, F, G, ts + 2, eot]
        t, tok = self._fake_transcriber(setup, [list(w1), list(w2)])

        # two windows: clamp puts shift at n_window//2 = 4400 samples.
        # stitch_max_offsets=9 keeps the alignment window inside the real
        # overlap (the toy 13-token sequences would otherwise allow a
        # degenerate whole-window alignment that 14.9s windows never see).
        wave = np.zeros(8800, np.float32)
        text, segs = t.transcribe_with_timestamps(
            wave, 16000, DecodeOptions(lang="en", strategy="greedy",
                                       stitch_max_offsets=9))

        # [A,B] from w1; [C,D,E] once (w2's reading); [F,G] from w2
        assert [s.tokens for s in segs] == [[A, B], [C, D, E], [F, G]]
        o2 = 4400 / 16000
        assert segs[0].start == pytest.approx(0.0)
        assert segs[0].end == pytest.approx(0.02)
        assert segs[1].start == pytest.approx(o2)
        assert segs[2].start == pytest.approx(o2 + 0.02)
        # no boundary text dropped or duplicated
        joined = [tk for s in segs for tk in s.tokens]
        assert joined == [A, B, C, D, E, F, G]

    def test_no_match_appends_all_segments(self, setup):
        params, cfg, tok = setup
        ts = tok.timestamp_begin
        A, B, C, D = tok.encode("abcd")
        sot, en, tr, eot = tok.sot, tok.language_token("en"), tok.transcribe, tok.eot
        w1 = [sot, en, tr, ts, A, B, ts + 1, eot]
        w2 = [sot, en, tr, ts, C, D, ts + 1, eot]
        t, tok = self._fake_transcriber(setup, [list(w1), list(w2)])
        wave = np.zeros(8800, np.float32)
        text, segs = t.transcribe_with_timestamps(
            wave, 16000, DecodeOptions(lang="en", strategy="greedy",
                                       stitch_max_offsets=4))
        assert [s.tokens for s in segs] == [[A, B], [C, D]]


class TestClipTimestamps:
    def test_parse(self):
        from whisper_tpu.pipeline.transcribe import parse_clip_timestamps

        assert parse_clip_timestamps("1,2,3,4", 10.0) == [(1.0, 2.0),
                                                          (3.0, 4.0)]
        # odd count: last clip runs to the end; ends clamp to the audio
        assert parse_clip_timestamps("2", 10.0) == [(2.0, 10.0)]
        assert parse_clip_timestamps([0, 99], 5.0) == [(0.0, 5.0)]
        assert parse_clip_timestamps("", 5.0) == [(0.0, 5.0)]
        import pytest as _pytest

        with _pytest.raises(ValueError):
            parse_clip_timestamps("3,2", 10.0)
        with _pytest.raises(ValueError):
            parse_clip_timestamps("0,5,4,8", 10.0)  # overlapping

    def test_clip_equals_slice(self, setup):
        """Transcribing clip [0, t] must equal transcribing waveform[:t]."""
        params, cfg, tok = setup
        t = Transcriber(params, cfg, tok)
        wave = np.random.default_rng(7).standard_normal(8000) \
            .astype(np.float32)
        opts = DecodeOptions(lang="en", strategy="greedy", max_depth=6)
        ref_text, ref_tokens = t.transcribe(wave[:4000], 16000, opts)
        clip_text, clip_tokens = t.transcribe(
            wave, 16000,
            dataclasses.replace(opts, clip_timestamps="0,0.25"))
        assert clip_text == ref_text and clip_tokens == ref_tokens

    def test_timestamped_clips_offset(self, setup):
        params, cfg, tok = setup
        t = Transcriber(params, cfg, tok)
        wave = np.random.default_rng(8).standard_normal(9000) \
            .astype(np.float32)
        opts = DecodeOptions(lang="en", strategy="greedy", max_depth=6,
                             clip_timestamps="0.25,0.5")
        text, segs = t.transcribe_with_timestamps(wave, 16000, opts)
        assert isinstance(text, str)
        for seg in segs:  # absolute times: within the clip's range
            assert seg.start >= 0.25 - 1e-6
            assert seg.start <= seg.end


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


class TestV3Frontend:
    """128-mel (large-v3 family) threading: Transcriber must build its
    window program with cfg.n_mels, not the default-80 filterbank."""

    def test_transcribe_128_mels(self, tmp_path):
        tok_path = str(tmp_path / "tokenizer.json")
        build_test_tokenizer_json(tok_path)
        tok = WhisperTokenizer(tok_path)
        cfg = tiny_test_config(
            n_vocab=tok.vocab_size, n_audio_ctx=64, n_text_ctx=32,
            n_state=8, n_mels=128,
        )
        params = M.init_params(jax.random.PRNGKey(0), cfg)
        assert params["encoder"]["conv1_w"].shape[1] == 128
        t = Transcriber(params, cfg, tok)
        wave = np.random.default_rng(0).standard_normal(4000).astype(
            np.float32)
        text, tokens = t.transcribe(
            wave, 16000, DecodeOptions(strategy="greedy", max_depth=4),
        )
        assert isinstance(text, str)
        assert tokens[:4] == tok.prompt_ids("en")


class TestInitialPrompt:
    """initial_prompt conditioning (new capability): text after
    <|startofprev|> prepended to every window's prompt, suppression window
    widened by the conditioning length, conditioning stripped from output."""

    def test_build_prompt(self, setup):
        params, cfg, tok = setup
        t = Transcriber(params, cfg, tok)
        base, n0 = t._build_prompt(DecodeOptions(lang="en"))
        assert n0 == 0
        assert [int(x) for x in base] == tok.prompt_ids("en")

        opt = DecodeOptions(lang="en", initial_prompt="abc")
        full, n = t._build_prompt(opt)
        full = [int(x) for x in full]
        assert n >= 2  # <|startofprev|> + at least one text token
        assert full[0] == tok.start_of_prev
        assert full[n:] == tok.prompt_ids("en")
        assert full[1:n] == tok.encode(" abc")
        # cap: a huge prompt is trimmed to n_text_ctx//2 - 1 tokens, and
        # the <|startofprev|> marker survives the crop (the crop applies to
        # the TEXT, not the marker -- review finding)
        big = DecodeOptions(lang="en", initial_prompt="x" * 500)
        ids_big, nbig = t._build_prompt(big)
        assert nbig <= cfg.decoder_ctx_size // 2 - 1
        assert int(ids_big[0]) == tok.start_of_prev
        # user text stays EXACT by default; prompt_length_bucket quantizes
        # (serving daemon), and prev-text context always buckets
        exact = DecodeOptions(lang="en", initial_prompt="hello png")
        _, n_exact = t._build_prompt(exact)
        assert n_exact == 1 + len(tok.encode(" hello png"))  # < cap: exact
        bucketed = dataclasses.replace(exact, prompt_length_bucket=8)
        _, n_b = t._build_prompt(bucketed)
        assert (n_b - 1) % 8 == 0
        _, n_prev = t._build_prompt(
            DecodeOptions(lang="en"), prev_tokens=[70, 71, 72, 73, 74, 75,
                                                   76, 77, 78, 79])
        assert (n_prev - 1) % 8 == 0

    def test_transcribe_strips_conditioning(self, setup):
        params, cfg, tok = setup
        t = Transcriber(params, cfg, tok)
        wave = np.random.default_rng(0).standard_normal(5000).astype(
            np.float32)
        opt = DecodeOptions(lang="en", strategy="greedy", max_depth=4,
                            initial_prompt="hi", chunk_overlap_seconds=0.01)
        text, tokens = t.transcribe(wave, 16000, opt)
        # output tokens start at the standard prompt -- no <|startofprev|>,
        # no conditioning text tokens
        assert tokens[:4] == tok.prompt_ids("en")
        assert tok.start_of_prev not in tokens
        assert isinstance(text, str)


class TestConditionOnPreviousText:
    def test_prev_context_threaded(self, setup):
        params, cfg, tok = setup
        t = Transcriber(params, cfg, tok)
        wave = np.random.default_rng(0).standard_normal(20000).astype(
            np.float32)  # several windows at the tiny 64-frame context
        seen_prev = []
        orig = t._build_prompt

        def spy(opt, prev_tokens=()):
            seen_prev.append(list(prev_tokens))
            return orig(opt, prev_tokens=prev_tokens)

        t._build_prompt = spy
        opt = DecodeOptions(strategy="greedy", max_depth=4,
                            chunk_overlap_seconds=0.01,
                            condition_on_previous_text=True)
        text, tokens = t.transcribe(wave, 16000, opt)
        t._build_prompt = orig
        # the first per-window prompt has no context; once text exists the
        # later windows carry it (non-special tokens only)
        assert seen_prev[1] == []  # [0] is the loop-level base build
        later = [p for p in seen_prev[2:] if p]
        if any(not tok.is_special(x) for x in tokens):
            assert later, seen_prev
            assert all(not tok.is_special(x) for p in later for x in p)
        # output stays clean of conditioning artifacts
        assert tok.start_of_prev not in tokens

    def test_off_by_default_matches_plain(self, setup):
        params, cfg, tok = setup
        t = Transcriber(params, cfg, tok)
        wave = np.random.default_rng(1).standard_normal(8000).astype(
            np.float32)
        base = DecodeOptions(strategy="greedy", max_depth=4,
                             chunk_overlap_seconds=0.01)
        t0 = t.transcribe(wave, 16000, base)
        t1 = t.transcribe(wave, 16000, dataclasses.replace(
            base, condition_on_previous_text=False))
        assert t0 == t1


class TestRobustDecoding:
    """OpenAI-style fallback ladder (new capability): temperature sampling,
    no-speech detection, compression-ratio / logprob quality gates."""

    def test_compression_ratio(self):
        from whisper_tpu.pipeline.transcribe import compression_ratio

        assert compression_ratio("") == 0.0
        loopy = "the same thing " * 50
        normal = "a perfectly ordinary sentence with varied words"
        assert compression_ratio(loopy) > compression_ratio(normal)
        assert compression_ratio(loopy) > 2.4

    def test_greedy_temperature_sampling(self, setup):
        params, cfg, tok = setup
        from whisper_tpu.decode.greedy import greedy_decode

        enc = jnp.asarray(
            np.random.default_rng(0).standard_normal((2, 16, 8)),
            jnp.float32)
        prompt = jnp.asarray(tok.prompt_ids("en"), jnp.int32)
        with pytest.raises(ValueError, match="PRNG"):
            greedy_decode(params, enc, prompt, cfg, eot_id=tok.eot,
                          max_depth=4, temperature=0.7)
        key = jax.random.PRNGKey(0)
        t1, l1, p1 = greedy_decode(params, enc, prompt, cfg, eot_id=tok.eot,
                                   max_depth=4, temperature=0.7, rng=key)
        t2, l2, p2 = greedy_decode(params, enc, prompt, cfg, eot_id=tok.eot,
                                   max_depth=4, temperature=0.7, rng=key)
        # deterministic given the key
        assert jnp.array_equal(t1, t2) and jnp.array_equal(l1, l2)
        # sum_logp accumulates UNSCALED logprobs (negative)
        assert float(p1.max()) <= 0.0

    def test_nospeech_prob_outputs(self, setup):
        params, cfg, tok = setup
        from whisper_tpu.decode.beam import beam_search
        from whisper_tpu.decode.greedy import greedy_decode
        from whisper_tpu.text.tokenizer import SpecialToken

        ns_id = tok.special_token(SpecialToken.NO_SPEECH)
        assert ns_id is not None
        enc = jnp.asarray(
            np.random.default_rng(0).standard_normal((1, 16, 8)), jnp.float32)
        prompt = jnp.asarray(tok.prompt_ids("en"), jnp.int32)
        *_, ns = greedy_decode(params, enc, prompt, cfg, eot_id=tok.eot,
                               max_depth=3, nospeech_id=ns_id)
        assert ns.shape == (1,) and 0.0 <= float(ns[0]) <= 1.0
        *_, nsb = beam_search(params, enc, prompt, cfg, eot_id=tok.eot,
                              beam_size=2, max_depth=3, nospeech_id=ns_id)
        assert 0.0 <= float(nsb) <= 1.0
        # greedy and beam read the same prefill position
        np.testing.assert_allclose(float(ns[0]), float(nsb), rtol=1e-5)

    def test_ladder_first_temp_passes(self, setup):
        params, cfg, tok = setup
        t = Transcriber(params, cfg, tok)
        wave = np.random.default_rng(0).standard_normal(5000).astype(
            np.float32)
        base = DecodeOptions(strategy="greedy", max_depth=4,
                             chunk_overlap_seconds=0.01)
        text0, tokens0 = t.transcribe(wave, 16000, base)
        # permissive thresholds: ladder accepts temps[0], tokens identical
        opt = dataclasses.replace(
            base, temperature=(0.0, 0.5),
            compression_ratio_threshold=1e9, logprob_threshold=None)
        text1, tokens1 = t.transcribe(wave, 16000, opt)
        assert tokens1 == tokens0 and text1 == text0

    def test_ladder_with_timestamps(self, setup):
        params, cfg, tok = setup
        t = Transcriber(params, cfg, tok)
        wave = np.random.default_rng(0).standard_normal(5000).astype(
            np.float32)
        # permissive thresholds: ladder accepts temps[0]; segments match the
        # plain timestamped decode
        base = DecodeOptions(strategy="greedy", max_depth=4,
                             chunk_overlap_seconds=0.01, timestamps=True)
        text0, segs0 = t.transcribe_with_timestamps(wave, 16000, base)
        opt = dataclasses.replace(
            base, temperature=(0.0, 0.5),
            compression_ratio_threshold=1e9, logprob_threshold=None)
        text1, segs1 = t.transcribe_with_timestamps(wave, 16000, opt)
        assert text1 == text0
        assert [(s.start, s.end, s.text) for s in segs1] == [
            (s.start, s.end, s.text) for s in segs0]
        # no-speech gate empties the transcript when forced
        opt_ns = dataclasses.replace(
            base, temperature=(0.0,), logprob_threshold=100.0,
            no_speech_threshold=0.0)
        text_ns, segs_ns = t.transcribe_with_timestamps(wave, 16000, opt_ns)
        assert segs_ns == [] and text_ns == ""

    def test_ladder_falls_back_and_no_speech(self, setup):
        params, cfg, tok = setup
        t = Transcriber(params, cfg, tok)
        wave = np.random.default_rng(0).standard_normal(5000).astype(
            np.float32)
        # impossible logprob threshold: every temp fails, last one returned
        opt = DecodeOptions(strategy="greedy", max_depth=4,
                            chunk_overlap_seconds=0.01,
                            temperature=(0.0, 0.8),
                            logprob_threshold=100.0,
                            compression_ratio_threshold=None)
        text, tokens = t.transcribe(wave, 16000, opt)
        assert isinstance(text, str) and len(tokens) >= 4
        # no-speech gate: threshold 0 accepts every window as silence once
        # the logprob check fails -> empty transcript
        opt_ns = dataclasses.replace(opt, no_speech_threshold=0.0)
        text_ns, tokens_ns = t.transcribe(wave, 16000, opt_ns)
        assert tokens_ns == [] and text_ns == ""


class TestVad:
    """Energy-VAD pre-filter (new capability, pipeline/vad.py): silent
    windows are skipped on the host before any device dispatch."""

    def test_frame_rms_matches_naive(self):
        from whisper_tpu.pipeline.vad import FRAME_LENGTH, HOP_LENGTH, frame_rms

        rng = np.random.default_rng(0)
        x = rng.standard_normal(4000).astype(np.float32)
        got = frame_rms(x)
        n = 1 + (len(x) - FRAME_LENGTH) // HOP_LENGTH
        want = np.array([
            np.sqrt(np.mean(np.square(
                x[i * HOP_LENGTH : i * HOP_LENGTH + FRAME_LENGTH]
                .astype(np.float64))))
            for i in range(n)
        ])
        assert got.shape == (n,)
        np.testing.assert_allclose(got, want, rtol=1e-10)

    def test_frame_rms_short_and_empty(self):
        from whisper_tpu.pipeline.vad import frame_rms

        assert frame_rms(np.zeros(0, np.float32)).shape == (0,)
        short = frame_rms(0.5 * np.ones(100, np.float32))
        assert short.shape == (1,)
        np.testing.assert_allclose(short[0], 0.5, rtol=1e-12)

    def test_is_silent(self):
        from whisper_tpu.pipeline.vad import is_silent

        sr = 16000
        assert is_silent(np.zeros(8000, np.float32), sr)
        # a sustained tone is speech-like energy
        t = np.arange(8000) / sr
        tone = (0.1 * np.sin(2 * np.pi * 440 * t)).astype(np.float32)
        assert not is_silent(tone, sr)
        # a 5 ms click does not clear the 100 ms duration floor
        click = np.zeros(8000, np.float32)
        click[4000:4080] = 0.5
        assert is_silent(click, sr)
        # quiet but audible (-34 dBFS = 0.02 amplitude) beats the -40 default
        assert not is_silent(0.02 * np.ones(8000, np.float32), sr)
        # ... and is silent under a raised threshold
        assert is_silent(0.02 * np.ones(8000, np.float32), sr,
                         threshold_db=-20.0)

    def test_silent_windows_skipped(self, setup):
        """Noise | silence | noise: the middle windows dispatch nothing."""
        params, cfg, tok = setup
        t = Transcriber(params, cfg, tok)
        n_window = 160 * 55 - 1  # max_waveform_samples(54)
        rng = np.random.default_rng(7)
        wave = np.concatenate([
            rng.standard_normal(n_window).astype(np.float32),
            np.zeros(2 * n_window, np.float32),
            rng.standard_normal(n_window).astype(np.float32),
        ])
        opts = dict(lang="en", strategy="greedy", max_depth=4,
                    chunk_overlap_seconds=0.0)
        chunks_vad, chunks_plain = [], []
        t.transcribe(wave, 16000, DecodeOptions(vad=True, **opts),
                     on_chunk=lambda i, s: chunks_vad.append(i))
        t.transcribe(wave, 16000, DecodeOptions(**opts),
                     on_chunk=lambda i, s: chunks_plain.append(i))
        assert len(chunks_plain) == 4
        assert len(chunks_vad) == 2  # the two silent windows never dispatch

    def test_all_silence_returns_empty(self, setup):
        params, cfg, tok = setup
        t = Transcriber(params, cfg, tok)
        wave = np.zeros(20000, np.float32)
        text, tokens = t.transcribe(
            wave, 16000,
            DecodeOptions(lang="en", strategy="greedy", max_depth=4, vad=True),
            on_chunk=lambda *a: None,
        )
        assert text == "" and tokens == []

    def test_vad_no_effect_on_speechful_audio(self, setup):
        params, cfg, tok = setup
        t = Transcriber(params, cfg, tok)
        wave = np.random.default_rng(8).standard_normal(20000).astype(np.float32)
        opts = dict(lang="en", strategy="greedy", max_depth=5,
                    chunk_overlap_seconds=0.02)
        _, toks_vad = t.transcribe(wave, 16000,
                                   DecodeOptions(vad=True, **opts),
                                   on_chunk=lambda *a: None)
        _, toks_plain = t.transcribe(wave, 16000, DecodeOptions(**opts),
                                     on_chunk=lambda *a: None)
        assert toks_vad == toks_plain

    def test_timestamped_path_skips_silence(self, setup):
        params, cfg, tok = setup
        t = Transcriber(params, cfg, tok)
        text, segs = t.transcribe_with_timestamps(
            np.zeros(20000, np.float32), 16000,
            DecodeOptions(lang="en", strategy="greedy", max_depth=4,
                          vad=True),
        )
        assert text == "" and segs == []

    def test_batch_path_skips_silence(self, setup):
        from whisper_tpu.pipeline.batch import BatchTranscriber

        params, cfg, tok = setup
        bt = BatchTranscriber(params, cfg, tok, batch_size=2)
        rng = np.random.default_rng(9)
        speech = rng.standard_normal(9000).astype(np.float32)
        silence = np.zeros(9000, np.float32)
        opt = DecodeOptions(lang="en", strategy="greedy", max_depth=4,
                            chunk_overlap_seconds=0.0, vad=True)
        (r_speech, r_silence) = bt.transcribe_many(
            [speech, silence], 16000, opt)
        assert r_silence == ("", [])
        # the speechful stream matches the vad-off batched result
        (r_plain, _) = bt.transcribe_many(
            [speech, silence], 16000, dataclasses.replace(opt, vad=False))
        assert r_speech == r_plain


class TestVadLanguageDetection:
    """VAD-assisted language detection (VERDICT r3 weak #7): leading
    silence/music no longer drives the decision."""

    N_WINDOW = 160 * 55 - 1  # max_waveform_samples(54) for the test config

    def test_silence_leading_audio_uses_speech_window(self, setup):
        params, cfg, tok = setup
        t = Transcriber(params, cfg, tok)
        rng = np.random.default_rng(11)
        speech = rng.standard_normal(self.N_WINDOW).astype(np.float32)
        led = np.concatenate([np.zeros(self.N_WINDOW, np.float32), speech])
        code_led, dist_led = t.detect_language(led)
        code_sp, dist_sp = t.detect_language(speech)
        assert code_led == code_sp
        for k in dist_sp:  # the SAME window was scored, not the silence
            assert dist_led[k] == pytest.approx(dist_sp[k], abs=1e-6)

    def test_all_silence_falls_back_to_first_window(self, setup):
        params, cfg, tok = setup
        t = Transcriber(params, cfg, tok)
        code, dist = t.detect_language(np.zeros(2 * self.N_WINDOW, np.float32))
        assert code in dist and abs(sum(dist.values()) - 1.0) < 1e-4

    def test_vote_averages_windows(self, setup):
        params, cfg, tok = setup
        t = Transcriber(params, cfg, tok)
        rng = np.random.default_rng(12)
        w1 = rng.standard_normal(self.N_WINDOW).astype(np.float32)
        w2 = rng.standard_normal(self.N_WINDOW).astype(np.float32)
        _, d1 = t.detect_language(w1)
        _, d2 = t.detect_language(w2)
        _, dv = t.detect_language(np.concatenate([w1, w2]), vote_windows=2)
        for k in dv:
            assert dv[k] == pytest.approx((d1[k] + d2[k]) / 2, abs=1e-6)
