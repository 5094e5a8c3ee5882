"""IO tests: npy dump-tree round trip, safetensors, Burn mpk record reader,
WAV parsing (SURVEY.md §4 item 2)."""

import gzip
import struct
import wave as wave_mod

import msgpack
import numpy as np
import pytest

import jax

from whisper_tpu.config import tiny_test_config
from whisper_tpu.io import checkpoint, mpk, npy_tree, wav
from whisper_tpu.models import whisper as M

CFG = tiny_test_config()


@pytest.fixture(scope="module")
def params():
    return jax.tree.map(np.asarray, M.init_params(jax.random.PRNGKey(5), CFG))


def _assert_cfg_equal(a, b):
    """Config equality with f32-round-trip tolerance on ln_eps (the reference
    stores eps as an f32 scalar, load.rs:71, so 1e-5 -> 9.9999997e-6)."""
    assert a.audio_encoder_config == b.audio_encoder_config
    assert a.text_decoder_config == b.text_decoder_config
    assert abs(a.ln_eps - b.ln_eps) < 1e-9


def _assert_tree_equal(a, b):
    fa, fb = checkpoint.flatten_params(a), checkpoint.flatten_params(b)
    assert set(fa) == set(fb)
    for k in fa:
        np.testing.assert_array_equal(fa[k], fb[k], err_msg=k)


class TestNpyTree:
    def test_round_trip(self, params, tmp_path):
        """save_whisper -> load_whisper reproduces params and config."""
        path = str(tmp_path / "dump")
        npy_tree.save_whisper(params, CFG, path)
        loaded, cfg = npy_tree.load_whisper(path)
        _assert_cfg_equal(cfg, CFG)
        _assert_tree_equal(params, loaded)

    def test_scalar_encoding(self, tmp_path):
        """Scalars are [1.0, v] (dump.py:130-132)."""
        p = str(tmp_path / "s.npy")
        npy_tree.write_scalar(6, p)
        raw = np.load(p)
        np.testing.assert_array_equal(raw, [1.0, 6.0])
        assert npy_tree.read_scalar(p) == 6.0

    def test_tensor_encoding(self, tmp_path):
        """Tensors are [dims..., flat] (dump.py:134-139)."""
        p = str(tmp_path / "t.npy")
        arr = np.arange(12, dtype=np.float32).reshape(3, 4)
        npy_tree.write_tensor(arr, p)
        raw = np.load(p)
        np.testing.assert_array_equal(raw[:2], [3.0, 4.0])
        np.testing.assert_array_equal(npy_tree.read_tensor(p, 2), arr)

    def test_key_has_no_bias(self, params, tmp_path):
        """K-projection bias must not be written (src/model/mod.rs:402-404)."""
        path = tmp_path / "dump"
        npy_tree.save_whisper(params, CFG, str(path))
        assert (path / "encoder/block_0/attn/key/weight.npy").exists()
        assert not (path / "encoder/block_0/attn/key/bias.npy").exists()
        assert (path / "encoder/block_0/attn/query/bias.npy").exists()


class TestSafetensors:
    def test_round_trip(self, params, tmp_path):
        path = str(tmp_path / "model.safetensors")
        checkpoint.save_safetensors(params, CFG, path)
        loaded, cfg = checkpoint.load_safetensors(path)
        _assert_cfg_equal(cfg, CFG)
        _assert_tree_equal(params, loaded)

    def test_load_params_dispatch(self, params, tmp_path):
        st = str(tmp_path / "m.safetensors")
        checkpoint.save_safetensors(params, CFG, st)
        p1, c1 = checkpoint.load_params(st)
        _assert_cfg_equal(c1, CFG)

        tree = str(tmp_path / "tree")
        npy_tree.save_whisper(params, CFG, tree)
        p2, c2 = checkpoint.load_params(tree)
        _assert_cfg_equal(c2, CFG)
        _assert_tree_equal(p1, p2)

        # bare model name resolution (<name>.safetensors first)
        p3, _ = checkpoint.load_params(str(tmp_path / "m"))
        _assert_tree_equal(p1, p3)

    def test_missing(self):
        with pytest.raises(FileNotFoundError):
            checkpoint.load_params("/nonexistent/model")


def _burn_record(params, wrap_param: bool):
    """Construct a synthetic Burn 0.9-style named-msgpack record."""

    def tensor(arr):
        arr = np.asarray(arr, np.float32)
        leaf = {"value": arr.ravel().tolist(), "shape": list(arr.shape)}
        if wrap_param:
            return {"id": "some-uuid", "param": leaf}
        return leaf

    def linear(w, b=None):
        return {"weight": tensor(w), "bias": None if b is None else tensor(b)}

    def ln(g, b):
        return {"gamma": tensor(g), "beta": tensor(b), "epsilon": None}

    def attn(blk, i, cross):
        pre = "cross_" if cross else ""
        if cross:
            qw, qb = blk["cross_q_w"][i], blk["cross_q_b"][i]
            kw, vw = blk["cross_kv_w"][i, :, 0], blk["cross_kv_w"][i, :, 1]
            kb, vb = blk["cross_kv_b"][i]
            ow, ob = blk["cross_o_w"][i], blk["cross_o_b"][i]
        else:
            qw, kw, vw = (blk["qkv_w"][i, :, j] for j in range(3))
            qb, kb, vb = blk["qkv_b"][i]
            ow, ob = blk["attn_o_w"][i], blk["attn_o_b"][i]
        return {
            "n_head": None,  # Burn constant -> unit
            "query": linear(qw, qb),
            "key": linear(kw),  # no bias
            "value": linear(vw, vb),
            "out": linear(ow, ob),
        }

    def block(blk, i, cross):
        node = {
            "attn": attn(blk, i, cross=False),
            "attn_ln": ln(blk["attn_ln_g"][i], blk["attn_ln_b"][i]),
            "mlp": {
                "lin1": linear(blk["mlp1_w"][i], blk["mlp1_b"][i]),
                "gelu": None,
                "lin2": linear(blk["mlp2_w"][i], blk["mlp2_b"][i]),
            },
            "mlp_ln": ln(blk["mlp_ln_g"][i], blk["mlp_ln_b"][i]),
        }
        if cross:
            node["cross_attn"] = attn(blk, i, cross=True)
            node["cross_attn_ln"] = ln(blk["cross_ln_g"][i], blk["cross_ln_b"][i])
        return node

    enc, dec = params["encoder"], params["decoder"]
    L_e = CFG.audio_encoder_config.n_audio_layer
    L_d = CFG.text_decoder_config.n_text_layer
    return {
        "encoder": {
            "conv1": linear(enc["conv1_w"].transpose(2, 1, 0), enc["conv1_b"]),
            "gelu1": None,
            "conv2": linear(enc["conv2_w"].transpose(2, 1, 0), enc["conv2_b"]),
            "gelu2": None,
            "blocks": [block(enc["blocks"], i, False) for i in range(L_e)],
            "ln_post": ln(enc["ln_post_g"], enc["ln_post_b"]),
            "positional_embedding": tensor(enc["pos_emb"]),
            "n_mels": None,
            "n_audio_ctx": None,
        },
        "decoder": {
            "token_embedding": tensor(dec["tok_emb"]),
            "positional_embedding": tensor(dec["pos_emb"]),
            "blocks": [block(dec["blocks"], i, True) for i in range(L_d)],
            "ln": ln(dec["ln_g"], dec["ln_b"]),
            "mask": tensor(np.zeros((4, 4), np.float32)),
            "n_vocab": None,
            "n_text_ctx": None,
        },
    }


class TestMpkRecord:
    @pytest.mark.parametrize("wrap_param", [False, True])
    def test_load_synthetic_record(self, params, tmp_path, wrap_param):
        rec = _burn_record(params, wrap_param)
        path = str(tmp_path / "model.mpk.gz")
        with gzip.open(path, "wb") as f:
            f.write(msgpack.packb(rec))
        loaded, cfg = mpk.load_whisper_record(path, CFG)
        _assert_cfg_equal(cfg, CFG)
        _assert_tree_equal(params, loaded)

    def test_config_inference_without_cfg(self, params, tmp_path):
        rec = _burn_record(params, wrap_param=False)
        path = str(tmp_path / "model.mpk")
        with open(path, "wb") as f:
            f.write(msgpack.packb(rec))
        _, cfg = mpk.load_whisper_record(path, None)
        # shapes inferred; heads fall back to d//64 heuristic
        assert cfg.audio_encoder_config.n_audio_layer == CFG.audio_encoder_config.n_audio_layer
        assert cfg.text_decoder_config.n_vocab == CFG.text_decoder_config.n_vocab

    def test_writer_reader_round_trip(self, params, tmp_path):
        """save_whisper_record -> load_whisper_record == identity (C24:
        the reference convert CLI's .mpk.gz write side)."""
        path = str(tmp_path / "model.mpk.gz")
        mpk.save_whisper_record(params, CFG, path)
        loaded, cfg = mpk.load_whisper_record(path, CFG)
        _assert_cfg_equal(cfg, CFG)
        _assert_tree_equal(params, loaded)

    def test_writer_emits_causal_mask_param(self, params, tmp_path):
        """The Burn TextDecoder record stores the precomputed causal mask
        as a Param (src/model/mod.rs:125); the Rust loader needs it."""
        path = str(tmp_path / "model.mpk.gz")
        mpk.save_whisper_record(params, CFG, path)
        with gzip.open(path, "rb") as f:
            root = msgpack.unpackb(f.read(), raw=False)
        node = root["item"]["decoder"]["mask"]
        assert set(node) == {"id", "param"}
        ctx = CFG.text_decoder_config.n_text_ctx
        mask = np.asarray(node["param"]["value"], np.float32).reshape(
            node["param"]["shape"])
        assert mask.shape == (ctx, ctx)
        expect = mpk.causal_mask(ctx)
        np.testing.assert_array_equal(mask, expect)
        assert np.isneginf(mask[0, 1]) and mask[1, 0] == 0.0

    def test_writer_key_has_no_bias(self, params, tmp_path):
        path = str(tmp_path / "model.mpk.gz")
        mpk.save_whisper_record(params, CFG, path)
        with gzip.open(path, "rb") as f:
            root = msgpack.unpackb(f.read(), raw=False)
        blk = root["item"]["decoder"]["blocks"][0]
        assert blk["attn"]["key"]["bias"] is None  # src/model/mod.rs:402-404
        assert blk["attn"]["query"]["bias"] is not None
        assert blk["attn"]["n_head"] is None  # constant, lives in .cfg


class TestWav:
    def _write_wav(self, path, samples_i16, rate=16000):
        with wave_mod.open(str(path), "wb") as w:
            w.setnchannels(1)
            w.setsampwidth(2)
            w.setframerate(rate)
            w.writeframes(samples_i16.tobytes())

    def test_int16_normalization(self, tmp_path):
        """ints normalized by 2^(bits-1)-1 = 32767 (main.rs:44-52)."""
        path = tmp_path / "t.wav"
        samples = np.array([0, 32767, -32767, 16384], np.int16)
        self._write_wav(path, samples)
        out, rate = wav.load_wav(str(path))
        assert rate == 16000
        np.testing.assert_allclose(
            out, np.array([0, 1.0, -1.0, 16384 / 32767], np.float32), atol=1e-7
        )

    def test_rejects_stereo(self, tmp_path):
        path = tmp_path / "st.wav"
        with wave_mod.open(str(path), "wb") as w:
            w.setnchannels(2)
            w.setsampwidth(2)
            w.setframerate(16000)
            w.writeframes(np.zeros(64, np.int16).tobytes())
        with pytest.raises(wav.WavFormatError):
            wav.load_wav(str(path))

    def test_float32_passthrough(self, tmp_path):
        """Hand-built IEEE-float WAV."""
        samples = np.array([0.0, 0.5, -0.25], np.float32)
        body = samples.tobytes()
        fmt = struct.pack("<HHIIHH", 3, 1, 16000, 16000 * 4, 4, 32)
        riff = b"WAVE" + b"fmt " + struct.pack("<I", len(fmt)) + fmt
        riff += b"data" + struct.pack("<I", len(body)) + body
        data = b"RIFF" + struct.pack("<I", len(riff)) + riff
        path = tmp_path / "f.wav"
        path.write_bytes(data)
        out, rate = wav.load_wav(str(path))
        np.testing.assert_array_equal(out, samples)

    def test_reference_sample_loads(self):
        """The bundled reference audio.wav parses (22 kHz mono 16-bit)."""
        out, rate = wav.load_wav("/root/reference/audio.wav")
        assert rate == 22050
        assert out.shape == (168511,)
        assert np.abs(out).max() <= 1.0

    def test_resample(self):
        out, rate = wav.load_wav("/root/reference/audio.wav")
        res = wav.resample(out, rate, 16000)
        expected = int(round(len(out) * 16000 / 22050))
        assert abs(len(res) - expected) <= 2
