"""Tests: WER eval harness, batched multi-stream transcription, training
checkpoint/resume."""

import os
import wave as wave_mod

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from whisper_tpu.config import tiny_test_config
from whisper_tpu.eval import wer as werlib
from whisper_tpu.models import whisper as M
from whisper_tpu.pipeline.batch import BatchTranscriber
from whisper_tpu.pipeline.transcribe import DecodeOptions, Transcriber
from whisper_tpu.text.tokenizer import WhisperTokenizer, build_test_tokenizer_json
from whisper_tpu.training import checkpointing, train


class TestWer:
    def test_identical(self):
        assert werlib.wer("hello world", "hello world") == 0.0

    def test_substitution(self):
        assert werlib.wer("the cat sat", "the dog sat") == pytest.approx(1 / 3)

    def test_insert_delete(self):
        assert werlib.wer("a b c d", "a b d") == pytest.approx(1 / 4)
        assert werlib.wer("a b d", "a b c d") == pytest.approx(1 / 3)

    def test_normalization(self):
        assert werlib.wer("Hello, World!", "hello world") == 0.0
        # the English normalizer expands contractions on BOTH sides
        assert werlib.wer("don't stop", "do not stop") == 0.0
        # basic (language-agnostic) mode strips the apostrophe instead
        r = werlib.WerResult(english=False)
        assert r.add("don't stop", "dont stop").wer == 0.0

    def test_empty_hyp(self):
        assert werlib.wer("one two three", "") == 1.0


class TestEnglishNormalizer:
    """The OpenAI-style English normalization pipeline (eval/normalizer.py):
    the preprocessing behind published Whisper WER numbers (BASELINE.md
    accuracy target comparability)."""

    @pytest.fixture(scope="class")
    def norm(self):
        from whisper_tpu.eval.normalizer import EnglishTextNormalizer

        return EnglishTextNormalizer()

    @pytest.mark.parametrize("src,expect", [
        # contractions and titles
        ("I won't go", "i will not go"),
        ("they're here, we've left", "they are here we have left"),
        ("Mr. Smith met Dr. Jones", "mister smith met doctor jones"),
        ("let's can't don't", "let us can not do not"),
        # bracketed asides and fillers dropped
        ("hello [noise] world (laughs)", "hello world"),
        ("um hello uh world", "hello world"),
        # numbers
        ("one hundred and twenty three", "123"),
        ("twenty one", "21"),
        ("nineteen sixty four", "1964"),
        ("three point one four", "3.14"),
        ("seven percent", "7%"),
        ("minus five degrees", "-5 degrees"),
        ("the twentieth century", "the 20th century"),
        ("chapter first", "chapter 1st"),
        ("two thousand and five", "2005"),
        ("five million people", "5000000 people"),
        ("double oh seven", "007"),
        # currency
        ("five dollars", "$5"),
        ("it cost one dollar and fifty cents", "it cost $1.50"),
        # spelling
        ("the colour of the theatre", "the color of the theater"),
        ("he travelled to the centre", "he traveled to the center"),
        ("she must recognise the flavour", "she must recognize the flavor"),
        # commas in digits, stray punctuation
        ("1,000 years.", "1000 years"),
        ("hello!!! world???", "hello world"),
    ])
    def test_pipeline(self, norm, src, expect):
        assert norm(src) == expect

    def test_applied_symmetrically_zero_wer(self):
        ref = "Mr. Brown paid one hundred and twenty dollars, didn't he?"
        hyp = "mister brown paid $120 did not he"
        assert werlib.wer(ref, hyp) == 0.0

    def test_basic_normalizer_mode(self):
        from whisper_tpu.eval.normalizer import BasicTextNormalizer

        b = BasicTextNormalizer()
        assert b("Hello, [noise] World!") == "hello world"

    def test_aggregate(self):
        r = werlib.WerResult()
        r.add("a b", "a b")
        r.add("a b", "a x")
        assert r.wer == pytest.approx(1 / 4)
        assert r.utterances == 2

    def test_manifest_tsv_and_jsonl(self, tmp_path):
        (tmp_path / "a.wav").write_bytes(b"")
        m = tmp_path / "m.tsv"
        m.write_text("a.wav\thello there\n")
        items = list(werlib.iter_manifest(str(m)))
        assert items == [(str(tmp_path / "a.wav"), "hello there")]
        j = tmp_path / "m.jsonl"
        j.write_text('{"audio": "a.wav", "text": "hi"}\n')
        assert list(werlib.iter_manifest(str(j)))[0][1] == "hi"

    def test_librispeech_layout(self, tmp_path):
        d = tmp_path / "19" / "198"
        d.mkdir(parents=True)
        (d / "19-198.trans.txt").write_text("19-198-0000 HELLO WORLD\n")
        with wave_mod.open(str(d / "19-198-0000.wav"), "wb") as w:
            w.setnchannels(1); w.setsampwidth(2); w.setframerate(16000)
            w.writeframes(np.zeros(100, np.int16).tobytes())
        items = list(werlib.iter_librispeech(str(tmp_path)))
        assert len(items) == 1 and items[0][1] == "HELLO WORLD"

    def test_evaluate_runner(self):
        items = [("x.wav", "a b c"), ("y.wav", "d e")]
        res = werlib.evaluate(lambda p: "a b c" if p == "x.wav" else "d x",
                              items)
        assert res.words == 5 and res.errors == 1


@pytest.fixture(scope="module")
def setup(tmp_path_factory):
    d = tmp_path_factory.mktemp("batch")
    tok_path = str(d / "tokenizer.json")
    build_test_tokenizer_json(tok_path)
    tok = WhisperTokenizer(tok_path)
    cfg = tiny_test_config(n_vocab=tok.vocab_size, n_audio_ctx=64, n_text_ctx=32)
    params = M.init_params(jax.random.PRNGKey(0), cfg)
    return params, cfg, tok


class TestBatchTranscriber:
    def test_matches_single_stream(self, setup):
        """Batched many-streams output == per-stream single pipeline."""
        params, cfg, tok = setup
        rng = np.random.default_rng(0)
        waves = [rng.standard_normal(n).astype(np.float32)
                 for n in (9000, 12000, 5000)]
        opts = DecodeOptions(lang="en", strategy="greedy", max_depth=6,
                             chunk_overlap_seconds=0.02)

        bt = BatchTranscriber(params, cfg, tok, batch_size=4)
        batched = bt.transcribe_many(waves, 16000, opts)

        single = Transcriber(params, cfg, tok)
        for wave, (btext, btoks) in zip(waves, batched):
            stext, stoks = single.transcribe(wave, 16000, opts,
                                             on_chunk=lambda *a: None)
            assert btoks == stoks
            assert btext == stext

    def test_many_streams_one_batch(self, setup):
        params, cfg, tok = setup
        rng = np.random.default_rng(1)
        n_window = 160 * 55 - 1  # full window for ctx 64 / padding 10
        waves = [rng.standard_normal(n_window).astype(np.float32)
                 for _ in range(5)]
        bt = BatchTranscriber(params, cfg, tok, batch_size=8)
        out = bt.transcribe_many(
            waves, 16000,
            DecodeOptions(lang="en", strategy="greedy", max_depth=5),
        )
        assert len(out) == 5
        for text, toks in out:
            assert toks[:4] == tok.prompt_ids("en")


class TestTrainCheckpoint:
    def test_save_restore_roundtrip(self, tmp_path):
        cfg = tiny_test_config()
        params = M.init_params(jax.random.PRNGKey(1), cfg)
        opt = train.make_optimizer(total_steps=10)
        state = train.init_train_state(params, opt)

        rng = np.random.default_rng(0)
        batch = train.Batch(
            mel=jnp.asarray(rng.standard_normal((2, 80, 32)).astype(np.float32)),
            tokens=jnp.asarray(rng.integers(0, 64, (2, 12)).astype(np.int32)),
            loss_mask=jnp.ones((2, 12), jnp.float32),
        )
        step = train.make_train_step(cfg, opt)
        state, _ = step(state, batch)

        path = str(tmp_path / "ckpt")
        checkpointing.save_train_state(path, state)
        fresh = train.init_train_state(params, opt)
        restored = checkpointing.restore_train_state(path, fresh)
        assert int(restored.step) == 1
        a = np.asarray(state.params["decoder"]["tok_emb"])
        b = np.asarray(restored.params["decoder"]["tok_emb"])
        np.testing.assert_array_equal(a, b)

        # resume training from the restored state
        state2, metrics = step(restored, batch)
        assert int(state2.step) == 2
        assert np.isfinite(float(metrics["loss"]))

    def test_export_params(self, tmp_path):
        from whisper_tpu.io import checkpoint as ckpt_io

        cfg = tiny_test_config()
        params = M.init_params(jax.random.PRNGKey(2), cfg)
        opt = train.make_optimizer()
        state = train.init_train_state(params, opt)
        path = str(tmp_path / "model.safetensors")
        checkpointing.export_params(state, cfg, path)
        loaded, lcfg = ckpt_io.load_safetensors(path)
        assert lcfg.audio_encoder_config == cfg.audio_encoder_config
        np.testing.assert_array_equal(
            np.asarray(params["decoder"]["tok_emb"]),
            loaded["decoder"]["tok_emb"],
        )


class TestBatchBeam:
    def test_batched_beam_matches_single(self, setup):
        """Batched BEAM transcription == per-stream beam pipeline."""
        params, cfg, tok = setup
        rng = np.random.default_rng(5)
        waves = [rng.standard_normal(n).astype(np.float32) for n in (8799, 8799)]
        opts = DecodeOptions(lang="en", strategy="beam", beam_size=3,
                             max_depth=6, chunk_overlap_seconds=0.02)
        bt = BatchTranscriber(params, cfg, tok, batch_size=2)
        batched = bt.transcribe_many(waves, 16000, opts)
        single = Transcriber(params, cfg, tok)
        for wave, (btext, btoks) in zip(waves, batched):
            stext, stoks = single.transcribe(wave, 16000, opts,
                                             on_chunk=lambda *a: None)
            assert btoks == stoks


class TestBatchTimestamps:
    """Batched timestamped decoding (VERDICT r3 weak #1): the chip-efficient
    batched path must produce segments stream-for-stream identical to the
    single-stream `transcribe_with_timestamps`."""

    def _assert_streams_equal(self, batched, singles):
        assert len(batched) == len(singles)
        for (btext, bsegs), (stext, ssegs) in zip(batched, singles):
            assert btext == stext
            assert len(bsegs) == len(ssegs)
            for b, s in zip(bsegs, ssegs):
                assert b.tokens == s.tokens
                assert b.text == s.text
                assert b.start == pytest.approx(s.start)
                assert b.end == pytest.approx(s.end)

    def test_greedy_matches_single(self, setup):
        params, cfg, tok = setup
        rng = np.random.default_rng(7)
        waves = [rng.standard_normal(n).astype(np.float32)
                 for n in (9000, 12000, 8799)]
        opts = DecodeOptions(lang="en", strategy="greedy", max_depth=6,
                             chunk_overlap_seconds=0.02)
        bt = BatchTranscriber(params, cfg, tok, batch_size=4)
        batched = bt.transcribe_many_with_timestamps(waves, 16000, opts)
        single = Transcriber(params, cfg, tok)
        singles = [
            single.transcribe_with_timestamps(w, 16000, opts) for w in waves
        ]
        self._assert_streams_equal(batched, singles)

    def test_beam_matches_single(self, setup):
        """The flat-batched beam with in-graph timestamp rules == the
        single-window beam with the same rules (token-exact, so segment
        boundaries and texts are identical)."""
        params, cfg, tok = setup
        rng = np.random.default_rng(8)
        waves = [rng.standard_normal(8799).astype(np.float32)
                 for _ in range(2)]
        opts = DecodeOptions(lang="en", strategy="beam", beam_size=3,
                             max_depth=6, chunk_overlap_seconds=0.02)
        bt = BatchTranscriber(params, cfg, tok, batch_size=2)
        batched = bt.transcribe_many_with_timestamps(waves, 16000, opts)
        single = Transcriber(params, cfg, tok)
        singles = [
            single.transcribe_with_timestamps(w, 16000, opts) for w in waves
        ]
        self._assert_streams_equal(batched, singles)

    def test_word_timestamps_attach(self, setup):
        """words mode executes on the batched path and attaches WordTiming
        lists wherever the single path does."""
        params, cfg, tok = setup
        rng = np.random.default_rng(9)
        waves = [rng.standard_normal(9000).astype(np.float32)]
        opts = DecodeOptions(lang="en", strategy="greedy", max_depth=6,
                             chunk_overlap_seconds=0.02)
        bt = BatchTranscriber(params, cfg, tok, batch_size=2)
        batched = bt.transcribe_many_with_timestamps(
            waves, 16000, opts, word_timestamps=True)
        single = Transcriber(params, cfg, tok)
        stext, ssegs = single.transcribe_with_timestamps(
            waves[0], 16000, opts, word_timestamps=True)
        btext, bsegs = batched[0]
        assert btext == stext
        for b, s in zip(bsegs, ssegs):
            assert (b.words is None) == (s.words is None)
            if b.words is not None:
                assert [w.word for w in b.words] == [w.word for w in s.words]


class TestBatchedLadder:
    """Robust-decoding ladder on the batched path (VERDICT r3 weak #2):
    first pass batched at temps[0], host gates per window, only failed
    windows re-decode at the next temperature."""

    def test_ladder_falls_back(self, setup):
        """Impossible logprob threshold: every temp fails, last accepted."""
        params, cfg, tok = setup
        rng = np.random.default_rng(0)
        waves = [rng.standard_normal(9000).astype(np.float32)]
        opt = DecodeOptions(lang="en", strategy="greedy", max_depth=4,
                            chunk_overlap_seconds=0.01,
                            temperature=(0.0, 0.8),
                            logprob_threshold=100.0,
                            compression_ratio_threshold=None)
        bt = BatchTranscriber(params, cfg, tok, batch_size=2)
        (text, tokens), = bt.transcribe_many(waves, 16000, opt)
        assert isinstance(text, str) and len(tokens) >= 4
        # the sampling rung compiled: a temperature-0.8 batched program ran
        assert any(
            k[0] == "batch" and 0.8 in k for k in bt._fn_cache
        )

    def test_no_speech_gate_empties_batch(self, setup):
        params, cfg, tok = setup
        rng = np.random.default_rng(1)
        waves = [rng.standard_normal(9000).astype(np.float32)
                 for _ in range(2)]
        opt = DecodeOptions(lang="en", strategy="greedy", max_depth=4,
                            chunk_overlap_seconds=0.01,
                            temperature=(0.0,), logprob_threshold=100.0,
                            compression_ratio_threshold=None,
                            no_speech_threshold=0.0)
        bt = BatchTranscriber(params, cfg, tok, batch_size=2)
        out = bt.transcribe_many(waves, 16000, opt)
        assert all(text == "" and toks == [] for text, toks in out)

    def test_ladder_matches_single_at_first_temp(self, setup):
        """Permissive thresholds: the batched ladder accepts temps[0] and
        the tokens equal the single-stream ladder's."""
        params, cfg, tok = setup
        rng = np.random.default_rng(2)
        waves = [rng.standard_normal(9000).astype(np.float32)]
        opt = DecodeOptions(lang="en", strategy="greedy", max_depth=4,
                            chunk_overlap_seconds=0.01,
                            temperature=(0.0, 0.5),
                            compression_ratio_threshold=1e9,
                            logprob_threshold=None)
        bt = BatchTranscriber(params, cfg, tok, batch_size=2)
        (btext, btoks), = bt.transcribe_many(waves, 16000, opt)
        single = Transcriber(params, cfg, tok)
        stext, stoks = single.transcribe(waves[0], 16000, opt,
                                         on_chunk=lambda *a: None)
        assert btoks == stoks and btext == stext

    def test_repetition_loop_redecodes_only_failed(self, setup):
        """A seeded repetition loop at temps[0] is caught by the
        compression gate and ONLY the failing window re-decodes at the
        sampling temperature."""
        from whisper_tpu.pipeline.transcribe import compression_ratio

        params, cfg, tok = setup
        ctx = cfg.text_decoder_config.n_text_ctx
        prompt_ids = tok.prompt_ids("en")
        loop_tokens = tok.encode("a" * 28)
        clean_tokens = tok.encode("fresh words")
        assert compression_ratio("a" * 28) > 2.4
        assert compression_ratio("fresh words") < 2.4
        calls = []

        class FakeBatch(BatchTranscriber):
            def _batch_window_fn(self, n_samples, prompt_len, strategy,
                                 beam_size, max_depth, padding,
                                 suppress_until_len, kv_quant=False,
                                 self_quant=False, timestamps=False,
                                 max_initial_ts_idx=50, quality=False,
                                 temperature=0.0, sot_pos=0):
                def fn(params, waves, prompt, suppress, rng=None):
                    w = np.asarray(waves)
                    B = w.shape[0]
                    calls.append((temperature, B))
                    toks = np.zeros((B, ctx), np.int32)
                    lengths = np.zeros(B, np.int32)
                    for b in range(B):
                        # marker: loopy stream windows are ~0.9-valued
                        loopy = (w[b, 0] > 0.5) and temperature == 0.0
                        seq = list(prompt_ids) + (
                            loop_tokens if loopy else clean_tokens)
                        toks[b, : len(seq)] = seq
                        lengths[b] = len(seq)
                    z = np.zeros(B, np.float32)
                    return toks, lengths, z, np.full(B, -1.0, np.float32)

                return fn

        n_window = 160 * 55 - 1
        waves = [np.full(n_window, 0.1, np.float32),   # clean
                 np.full(n_window, 0.9, np.float32)]   # loopy at t=0
        opt = DecodeOptions(lang="en", strategy="greedy", max_depth=4,
                            chunk_overlap_seconds=0.0,
                            temperature=(0.0, 0.8),
                            logprob_threshold=None,
                            compression_ratio_threshold=2.4)
        bt = FakeBatch(params, cfg, tok, batch_size=1)
        out = bt.transcribe_many(waves, 16000, opt)
        # both streams end clean; the loop never survives
        assert [t for t, _ in out] == ["fresh words", "fresh words"]
        # pass 1: two batched calls at t=0 (batch_size=1); pass 2: ONE
        # re-decode (the failed window only) at t=0.8
        assert calls == [(0.0, 1), (0.0, 1), (0.8, 1)]


class TestSegmentQualityMetadata:
    """Per-segment decode-quality metadata (VERDICT r3 weak #8)."""

    def test_batched_segments_carry_metadata(self, setup):
        params, cfg, tok = setup
        rng = np.random.default_rng(3)
        waves = [rng.standard_normal(9000).astype(np.float32)]
        opt = DecodeOptions(lang="en", strategy="greedy", max_depth=6,
                            chunk_overlap_seconds=0.02)
        bt = BatchTranscriber(params, cfg, tok, batch_size=2)
        (text, segs), = bt.transcribe_many_with_timestamps(waves, 16000, opt)
        for s in segs:
            assert isinstance(s.avg_logprob, float) and s.avg_logprob <= 0.0
            assert isinstance(s.compression_ratio, float)
            assert s.no_speech_prob is None or 0.0 <= s.no_speech_prob <= 1.0

    def test_single_segments_carry_metadata(self, setup):
        params, cfg, tok = setup
        rng = np.random.default_rng(3)
        wave = rng.standard_normal(9000).astype(np.float32)
        opt = DecodeOptions(lang="en", strategy="greedy", max_depth=6,
                            chunk_overlap_seconds=0.02)
        t = Transcriber(params, cfg, tok)
        text, segs = t.transcribe_with_timestamps(wave, 16000, opt)
        for s in segs:
            assert isinstance(s.avg_logprob, float)
            assert isinstance(s.compression_ratio, float)

    def test_low_quality_window_carries_failing_scores(self, setup):
        """A window failing the logprob gate at every rung still surfaces
        its (failing) avg_logprob on the emitted segments."""
        params, cfg, tok = setup
        rng = np.random.default_rng(4)
        wave = rng.standard_normal(9000).astype(np.float32)
        opt = DecodeOptions(lang="en", strategy="greedy", max_depth=6,
                            chunk_overlap_seconds=0.02,
                            temperature=(0.0, 0.4),
                            logprob_threshold=100.0,
                            compression_ratio_threshold=None)
        t = Transcriber(params, cfg, tok)
        text, segs = t.transcribe_with_timestamps(wave, 16000, opt)
        for s in segs:
            assert s.avg_logprob is not None
            assert s.avg_logprob < 100.0  # the failing score, surfaced
