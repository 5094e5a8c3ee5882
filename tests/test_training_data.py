"""Training data pipeline tests: example encoding, batch building,
SpecAugment, dataset iteration, and the finetune CLI end-to-end."""

import os
import wave as wave_mod

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from whisper_tpu.config import tiny_test_config
from whisper_tpu.models import whisper as M
from whisper_tpu.training import data as tdata
from whisper_tpu.text.tokenizer import WhisperTokenizer, build_test_tokenizer_json


@pytest.fixture(scope="module")
def tok(tmp_path_factory):
    d = tmp_path_factory.mktemp("tok")
    build_test_tokenizer_json(str(d / "tokenizer.json"))
    return WhisperTokenizer(str(d / "tokenizer.json"))


@pytest.fixture(scope="module")
def cfg(tok):
    return tiny_test_config(n_vocab=tok.vocab_size, n_audio_ctx=64,
                            n_text_ctx=32)


class TestEncodeExample:
    def test_mask_scores_text_and_eot_only(self, tok, cfg):
        text = "hello world"
        tokens, mask = tdata.encode_example(text, tok, cfg.decoder_ctx_size)
        prompt = tok.prompt_ids("en")
        body = tok.encode(text)
        seq = list(prompt) + list(body) + [tok.eot]
        assert tokens[: len(seq)].tolist() == seq
        assert (tokens[len(seq):] == tok.eot).all()  # EOT padding
        # mask[t] scores prediction of tokens[t+1]: body[0] is predicted at
        # the last prompt position; EOT at the last body position
        expect = np.zeros_like(mask)
        expect[len(prompt) - 1: len(seq) - 1] = 1.0
        np.testing.assert_array_equal(mask, expect)
        assert mask.sum() == len(body) + 1  # text tokens + EOT

    def test_overflow_raises(self, tok, cfg):
        with pytest.raises(ValueError):
            tdata.encode_example("word " * 100, tok, cfg.decoder_ctx_size)


class TestBuildBatch:
    def test_shapes_fixed(self, tok, cfg):
        rng = np.random.default_rng(0)
        waves = [rng.standard_normal(3000).astype(np.float32),
                 rng.standard_normal(20000).astype(np.float32)]  # truncated
        b = tdata.build_batch(waves, ["hello", "hello world"], tok, cfg)
        assert b.mel.shape == (2, cfg.n_mels, cfg.encoder_ctx_size)
        assert b.tokens.shape == (2, cfg.decoder_ctx_size)
        assert b.loss_mask.shape == (2, cfg.decoder_ctx_size)

    def test_trains_through_model(self, tok, cfg):
        """The built batch runs through the real loss (shape contract)."""
        from whisper_tpu.training import train as ttrain

        params = M.init_params(jax.random.PRNGKey(0), cfg)
        waves = [np.random.default_rng(1).standard_normal(3000)
                 .astype(np.float32)]
        b = tdata.build_batch(waves, ["hello"], tok, cfg)
        loss, metrics = ttrain.cross_entropy_loss(params, b, cfg)
        assert np.isfinite(float(loss)) and float(metrics["tokens"]) >= 2


class TestSpecAugment:
    def _mel(self, b=2, m=80, t=100, seed=0):
        return jnp.asarray(np.random.default_rng(seed)
                           .standard_normal((b, m, t)).astype(np.float32))

    def test_shape_and_determinism(self):
        mel = self._mel()
        k = jax.random.PRNGKey(0)
        a1 = tdata.spec_augment(mel, k)
        a2 = tdata.spec_augment(mel, k)
        assert a1.shape == mel.shape
        np.testing.assert_array_equal(np.asarray(a1), np.asarray(a2))
        assert not np.array_equal(
            np.asarray(a1),
            np.asarray(tdata.spec_augment(mel, jax.random.PRNGKey(1))))

    def test_masks_to_mean_and_bounded(self):
        mel = self._mel()
        scfg = tdata.SpecAugmentConfig(n_freq_masks=1, freq_mask_width=10,
                                       n_time_masks=1, time_mask_width=20)
        out = np.asarray(tdata.spec_augment(mel, jax.random.PRNGKey(2), scfg))
        changed = out != np.asarray(mel)
        fill = np.asarray(mel).mean(axis=(1, 2))
        for i in range(mel.shape[0]):
            assert set(np.round(out[i][changed[i]], 5)) <= {
                np.round(fill[i], 5)}
        # union of 1 freq band (<=10 rows) + 1 time band (<=20 cols)
        assert changed.mean() <= (10 * 100 + 20 * 80) / (80 * 100)

    def test_jit_compatible(self):
        mel = self._mel()
        out = jax.jit(tdata.spec_augment)(mel, jax.random.PRNGKey(0))
        assert out.shape == mel.shape


class TestIterBatches:
    def test_fixed_batches_and_drop_long(self, tok, cfg):
        rng = np.random.default_rng(0)
        ex = [(rng.standard_normal(2000).astype(np.float32), "hello")
              for _ in range(5)]
        ex.append((ex[0][0], "word " * 100))  # exceeds n_text_ctx: dropped
        it = tdata.iter_batches(ex, tok, cfg, batch_size=2, seed=0, epochs=2)
        batches = list(it)
        # 5 usable -> 2 batches/epoch x 2 epochs (ragged tail dropped)
        assert len(batches) == 4
        assert all(b.tokens.shape == (2, cfg.decoder_ctx_size)
                   for b in batches)

    def test_too_few_raises(self, tok, cfg):
        ex = [(np.zeros(2000, np.float32), "hi")]
        with pytest.raises(ValueError):
            next(tdata.iter_batches(ex, tok, cfg, batch_size=4))


class TestFinetuneCli:
    def test_end_to_end(self, tok, cfg, tmp_path, monkeypatch, capsys):
        from whisper_tpu import cli
        from whisper_tpu.io import checkpoint, npy_tree

        d = tmp_path
        monkeypatch.chdir(d)
        build_test_tokenizer_json(str(d / "tokenizer.json"))
        params = jax.tree.map(np.asarray,
                              M.init_params(jax.random.PRNGKey(0), cfg))
        npy_tree.save_whisper(params, cfg, str(d / "dump"))
        rng = np.random.default_rng(0)
        lines = []
        for i in range(4):
            path = d / f"a{i}.wav"
            with wave_mod.open(str(path), "wb") as w:
                w.setnchannels(1); w.setsampwidth(2); w.setframerate(16000)
                w.writeframes((rng.standard_normal(2000) * 3000)
                              .astype(np.int16).tobytes())
            lines.append(f"a{i}.wav\thello world")
        (d / "train.tsv").write_text("\n".join(lines) + "\n")

        rc = cli.main([
            "finetune", "dump", "train.tsv", "en", "--steps", "4",
            "--batch-size", "2", "--lr", "1e-3", "--warmup", "1",
            "--spec-augment", "--out", "tuned",
        ])
        out = capsys.readouterr().out
        assert rc == 0, out
        assert os.path.exists("tuned.safetensors")
        assert os.path.exists("tuned.cfg")
        # the exported checkpoint loads and differs from the start params
        tuned, tcfg = checkpoint.load_params("tuned")
        assert tcfg.decoder_ctx_size == cfg.decoder_ctx_size
        assert not np.allclose(np.asarray(tuned["decoder"]["tok_emb"]),
                               params["decoder"]["tok_emb"])
        # overfitting 4 identical transcripts: loss must drop
        losses = [float(l.split("loss ")[1].split()[0])
                  for l in out.splitlines() if l.startswith("step ")]
        assert len(losses) >= 2 and losses[-1] < losses[0]
