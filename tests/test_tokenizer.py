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
