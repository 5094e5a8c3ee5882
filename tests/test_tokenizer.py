"""Tokenizer tests (SURVEY.md §4 item 3) against a synthetic whisper-style
tokenizer.json (offline environment -- no real HF tokenizer available)."""

import numpy as np
import pytest

from whisper_tpu.text.tokenizer import (
    LANGUAGES,
    SpecialToken,
    WhisperTokenizer,
    build_test_tokenizer_json,
)


@pytest.fixture(scope="module")
def tok(tmp_path_factory):
    path = str(tmp_path_factory.mktemp("tok") / "tokenizer.json")
    build_test_tokenizer_json(path)
    return WhisperTokenizer(path)


class TestBasics:
    def test_languages_table(self):
        assert len(LANGUAGES) == 98  # src/token.rs:50-58
        assert LANGUAGES[0] == "en" and LANGUAGES[-1] == "su"

    def test_encode_decode_roundtrip(self, tok):
        text = "hello world"
        ids = tok.encode(text)
        assert len(ids) > 0
        assert tok.decode(ids) == text

    def test_special_token_ids_exist(self, tok):
        for s in (
            SpecialToken.END_OF_TEXT,
            SpecialToken.START_OF_TRANSCRIPT,
            SpecialToken.TRANSCRIBE,
            SpecialToken.TRANSLATE,
            SpecialToken.NO_TIMESTAMPS,
            SpecialToken.START_OF_PREV,
            SpecialToken.language("en"),
            SpecialToken.language("fr"),
            SpecialToken.timestamp(0.0),
        ):
            assert tok.special_token(s) is not None, s

    def test_special_tokens_distinct(self, tok):
        ids = {tok.sot, tok.eot, tok.transcribe, tok.translate,
               tok.no_timestamps, tok.language_token("en"),
               tok.language_token("de")}
        assert len(ids) == 7

    def test_timestamp_format(self):
        # src/token.rs:292: "<|{:.2}|>"
        assert SpecialToken.timestamp(0.0) == "<|0.00|>"
        assert SpecialToken.timestamp(0.02) == "<|0.02|>"
        assert SpecialToken.timestamp(30.0) == "<|30.00|>"

    def test_invalid_language_raises(self, tok):
        with pytest.raises(KeyError):
            tok.language_token("xx")


class TestIsSpecial:
    def test_special_and_regular(self, tok):
        assert tok.is_special(tok.sot)
        assert tok.is_special(tok.eot)
        regular = tok.encode("a")[0]
        assert not tok.is_special(regular)

    def test_decode_skips_special(self, tok):
        """Decode with skip_special drops SOT/EOT (drives is_special)."""
        ids = [tok.sot] + tok.encode("hi") + [tok.eot]
        assert tok.decode(ids, skip_special=True) == "hi"
        assert "<|startoftranscript|>" in tok.decode(ids, skip_special=False)

    def test_suppress_mask(self, tok):
        mask = tok.suppress_mask()
        assert mask.shape == (tok.vocab_size,)
        assert mask[tok.sot] == -np.inf
        assert mask[tok.eot] == -np.inf
        assert mask[tok.language_token("en")] == -np.inf
        regular = tok.encode("a")[0]
        assert mask[regular] == 0.0
        # exactly the is_special set (reference sweep, transcribe.rs:244)
        specials = {i for i in range(tok.vocab_size) if tok.is_special(i)}
        assert {int(i) for i in np.flatnonzero(np.isneginf(mask))} == specials


class TestPrompt:
    def test_prompt_ids(self, tok):
        """[SOT, lang, transcribe, notimestamps] (src/transcribe.rs:201-203)."""
        ids = tok.prompt_ids("en")
        assert ids == [tok.sot, tok.language_token("en"), tok.transcribe,
                       tok.no_timestamps]
        ids_ts = tok.prompt_ids("de", timestamps=True)
        assert ids_ts == [tok.sot, tok.language_token("de"), tok.transcribe]

    def test_missing_file(self):
        with pytest.raises(FileNotFoundError):
            WhisperTokenizer("/nonexistent/tokenizer.json")


class TestFullScaleLayout:
    """Id-level validation at REAL vocabulary scale (VERDICT r1 missing #3):
    the synthetic full-scale tokenizer replicates the multilingual
    tokenizer.json added-token layout, pinning the ids that drive decoding
    to their true values (50257 eot, 50258 sot, 50359 transcribe, ...)."""

    @pytest.fixture(scope="class")
    def full(self, tmp_path_factory):
        from whisper_tpu.text.tokenizer import build_full_scale_tokenizer_json

        path = str(tmp_path_factory.mktemp("fulltok") / "tokenizer.json")
        build_full_scale_tokenizer_json(path)
        return WhisperTokenizer(path)

    def test_real_ids(self, full):
        assert full.vocab_size == 51865
        assert full.eot == 50257
        assert full.sot == 50258
        assert full.language_token("en") == 50259
        assert full.translate == 50358
        assert full.transcribe == 50359
        assert full.start_of_prev == 50361
        assert full.no_timestamps == 50363
        assert full.token_to_id("<|0.00|>") == 50364
        assert full.token_to_id("<|30.00|>") == 51864

    def test_real_prompt(self, full):
        # the exact ids the real model sees (src/transcribe.rs:203 prompt)
        assert full.prompt_ids("en") == [50258, 50259, 50359, 50363]
        assert full.prompt_ids("de", task="translate", timestamps=True) == [
            50258, 50261, 50358]

    def test_suppress_mask_at_scale(self, full):
        mask = full.suppress_mask()
        assert mask.shape == (51865,)
        suppressed = np.where(np.isneginf(mask))[0]
        # exactly the 1608 added specials: 2 + 99 langs + 6 + 1501 timestamps
        assert len(suppressed) == 1608
        assert suppressed[0] == 50257 and suppressed[-1] == 51864
        assert (suppressed == np.arange(50257, 51865)).all()
        assert mask[:50257].max() == 0.0 and mask[:50257].min() == 0.0

    def test_is_special_boundaries(self, full):
        assert not full.is_special(50256)  # last base token
        assert full.is_special(50257)  # eot
        assert full.is_special(51864)  # last timestamp
        assert not full.is_special(0)

    def test_haw_reachable(self, full, tok):
        """The 99th language: "haw" sits between "tt" and "ln" (id 50352)
        in the trained vocabulary but is absent from the reference's table
        (src/token.rs:50-58). It must resolve against a tokenizer that
        carries it, and fall back to a KeyError against one that doesn't."""
        assert full.language_token("haw") == 50352
        assert "haw" in full.available_languages()
        assert len(full.available_languages()) == 99
        # the small test tokenizer lacks haw: recognized code, missing token
        with pytest.raises(KeyError, match="no token"):
            tok.language_token("haw")
        assert "haw" not in tok.available_languages()
        # a made-up code is still rejected as invalid
        with pytest.raises(KeyError, match="Invalid language"):
            full.language_token("xx")

    def test_haw_in_detection(self, full):
        """detect_language scores every language the tokenizer carries,
        including haw (pipeline/detect.py builds its id list from
        available_languages, not the reference's 98-entry table)."""
        import jax
        import jax.numpy as jnp

        from whisper_tpu.config import tiny_test_config
        from whisper_tpu.models import whisper as M
        from whisper_tpu.pipeline.detect import detect_language

        cfg = tiny_test_config(
            n_state=32, n_head=2, n_vocab=full.vocab_size,
            n_audio_ctx=8, n_text_ctx=8,
        )
        p = M.init_params(jax.random.PRNGKey(0), cfg)
        enc = jnp.zeros((1, 8, 32), jnp.float32)
        best, dist = detect_language(p, enc, cfg, full)[0]
        assert "haw" in dist and len(dist) == 99
        assert abs(sum(dist.values()) - 1.0) < 1e-3


class TestV3Layout:
    """large-v3 layout (beyond the reference, which predates v3): <|yue|>
    joins the language block at 50358 and every later special token shifts
    up by one (vocab 51866)."""

    @pytest.fixture(scope="class")
    def v3(self, tmp_path_factory):
        from whisper_tpu.text.tokenizer import build_full_scale_tokenizer_json

        path = str(tmp_path_factory.mktemp("v3tok") / "tokenizer.json")
        build_full_scale_tokenizer_json(path, v3=True)
        return WhisperTokenizer(path)

    def test_v3_ids(self, v3):
        assert v3.vocab_size == 51866
        assert v3.eot == 50257
        assert v3.sot == 50258
        assert v3.language_token("en") == 50259
        assert v3.language_token("haw") == 50352  # unshifted: before yue
        assert v3.language_token("yue") == 50358
        assert v3.translate == 50359
        assert v3.transcribe == 50360
        assert v3.start_of_prev == 50362
        assert v3.no_timestamps == 50364
        assert v3.timestamp_begin == 50365
        assert v3.token_to_id("<|30.00|>") == 51865

    def test_v3_prompt_and_languages(self, v3, tmp_path):
        from whisper_tpu.text.tokenizer import build_full_scale_tokenizer_json

        assert v3.prompt_ids("yue") == [50258, 50358, 50360, 50364]
        assert len(v3.available_languages()) == 100
        # v2-layout tokenizers reject yue at the token level, not the table
        v2_path = str(tmp_path / "tokenizer.json")
        build_full_scale_tokenizer_json(v2_path)
        v2 = WhisperTokenizer(v2_path)
        with pytest.raises(KeyError, match="no token"):
            v2.language_token("yue")
        assert "yue" not in v2.available_languages()

    def test_v3_suppress_mask(self, v3):
        mask = v3.suppress_mask()
        assert mask.shape == (51866,)
        suppressed = np.where(np.isneginf(mask))[0]
        # 2 + 100 langs + 6 + 1501 timestamps
        assert (suppressed == np.arange(50257, 51866)).all()


class TestPresetsV3:
    def test_large_v3_config(self):
        from whisper_tpu.config import preset

        cfg = preset("large-v3")
        assert cfg.n_mels == 128
        assert cfg.text_decoder_config.n_vocab == 51866
        assert cfg.audio_encoder_config.n_audio_layer == 32
        assert cfg.text_decoder_config.n_text_layer == 32

        turbo = preset("large-v3-turbo")
        assert turbo.n_mels == 128
        assert turbo.audio_encoder_config.n_audio_layer == 32
        assert turbo.text_decoder_config.n_text_layer == 4
        assert turbo.text_decoder_config.n_vocab == 51866

        with pytest.raises(KeyError, match="English-only"):
            preset("large-v3.en")

    def test_v2_presets_unchanged(self):
        from whisper_tpu.config import preset

        cfg = preset("large-v2")
        assert cfg.n_mels == 80
        assert cfg.text_decoder_config.n_vocab == 51865
        assert preset("tiny.en").text_decoder_config.n_vocab == 51864
        assert preset("medium").text_decoder_config.n_text_layer == 24
