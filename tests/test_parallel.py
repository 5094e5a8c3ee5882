"""Multi-chip sharding tests on the 8-virtual-CPU-device mesh (SURVEY.md §4
item 6): TP/DP-sharded forward and training step must match single-device
numerics, and the graft entry points must run."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp
from jax.sharding import NamedSharding, PartitionSpec as P

from whisper_tpu.config import tiny_test_config
from whisper_tpu.models import whisper as M
from whisper_tpu.parallel import mesh as pmesh
from whisper_tpu.parallel import sharding
from whisper_tpu.training import train

CFG = tiny_test_config(
    n_state=64, n_head=4, n_layer=2, n_vocab=256, n_audio_ctx=32, n_text_ctx=16
)


@pytest.fixture(scope="module")
def params():
    return M.init_params(jax.random.PRNGKey(0), CFG)


def _batch(rng, b=4):
    return train.Batch(
        mel=rng.standard_normal((b, 80, 32)).astype(np.float32),
        tokens=rng.integers(0, 256, (b, 16)).astype(np.int32),
        loss_mask=np.ones((b, 16), np.float32),
    )


def test_eight_virtual_devices():
    assert len(jax.devices()) == 8, (
        "conftest must provide 8 virtual CPU devices"
    )


class TestMesh:
    def test_make_mesh_shapes(self):
        m = pmesh.make_mesh(dp=4, tp=2)
        assert m.shape == {"dp": 4, "tp": 2}
        m = pmesh.make_mesh(tp=2)
        assert m.shape == {"dp": 4, "tp": 2}

    def test_bad_tp_rejected(self):
        with pytest.raises(ValueError):
            pmesh.make_mesh(tp=3)

    def test_validate_tp(self):
        sharding.validate_tp(CFG, 2)
        with pytest.raises(ValueError):
            sharding.validate_tp(CFG, 8)  # 4 heads not divisible by 8


class TestShardedForward:
    @pytest.mark.parametrize("dp,tp", [(8, 1), (4, 2), (2, 4)])
    def test_forward_matches_single_device(self, params, dp, tp):
        rng = np.random.default_rng(0)
        mel = rng.standard_normal((dp, 80, 32)).astype(np.float32)
        toks = rng.integers(0, 256, (dp, 16)).astype(np.int32)

        ref = np.asarray(M.whisper_forward(
            params, jnp.asarray(mel), jnp.asarray(toks), CFG))

        mesh = pmesh.make_mesh(dp=dp, tp=tp)
        with mesh:
            sp = sharding.shard_params(params, mesh, CFG)
            mel_s = jax.device_put(mel, NamedSharding(mesh, P("dp")))
            toks_s = jax.device_put(toks, NamedSharding(mesh, P("dp")))
            out = jax.jit(
                lambda p, m, t: M.whisper_forward(p, m, t, CFG)
            )(sp, mel_s, toks_s)
        np.testing.assert_allclose(np.asarray(out), ref, atol=2e-3)

    def test_param_placement(self, params):
        """Column/row-parallel weights actually shard over tp."""
        mesh = pmesh.make_mesh(dp=4, tp=2)
        sp = sharding.shard_params(params, mesh, CFG)
        qkv = sp["encoder"]["blocks"]["qkv_w"]
        # last axis (head dim) sharded over tp -> each shard holds half
        shard_shapes = {s.data.shape for s in qkv.addressable_shards}
        L, d = CFG.audio_encoder_config.n_audio_layer, CFG.n_state
        assert shard_shapes == {(L, d, 3, d // 2)}
        o_w = sp["encoder"]["blocks"]["attn_o_w"]
        assert {s.data.shape for s in o_w.addressable_shards} == {(L, d // 2, d)}


class TestTrainStep:
    def test_loss_decreases(self, params):
        rng = np.random.default_rng(1)
        batch = jax.tree.map(jnp.asarray, _batch(rng))
        opt = train.make_optimizer(learning_rate=1e-2, total_steps=20)
        state = train.init_train_state(params, opt)
        step = train.make_train_step(CFG, opt)
        losses = []
        for _ in range(5):
            state, metrics = step(state, batch)
            losses.append(float(metrics["loss"]))
        assert losses[-1] < losses[0]
        assert np.isfinite(losses).all()

    def test_remat_matches_no_remat(self, params):
        rng = np.random.default_rng(2)
        batch = jax.tree.map(jnp.asarray, _batch(rng))
        loss1, _ = train.cross_entropy_loss(params, batch, CFG, remat=False)
        loss2, _ = train.cross_entropy_loss(params, batch, CFG, remat=True)
        np.testing.assert_allclose(float(loss1), float(loss2), rtol=1e-6)

        g1 = jax.grad(lambda p: train.cross_entropy_loss(p, batch, CFG, False)[0])(params)
        g2 = jax.grad(lambda p: train.cross_entropy_loss(p, batch, CFG, True)[0])(params)
        for a, b in zip(jax.tree.leaves(g1), jax.tree.leaves(g2)):
            np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-5)

    def test_sharded_step_matches_single(self, params):
        """The pjit'd DP+TP training step computes the same loss/params."""
        rng = np.random.default_rng(3)
        nb = _batch(rng, b=4)
        opt = train.make_optimizer(total_steps=10)
        step = train.make_train_step(CFG, opt)

        # single device
        state0 = train.init_train_state(params, opt)
        state1, m1 = step(state0, jax.tree.map(jnp.asarray, nb))

        # 4x2 mesh
        mesh = pmesh.make_mesh(dp=4, tp=2)
        with mesh:
            sp = sharding.shard_params(params, mesh, CFG)
            sstate = train.init_train_state(sp, opt)
            sbatch = jax.tree.map(
                lambda x: jax.device_put(x, NamedSharding(mesh, P("dp"))), nb
            )
            sstate1, m2 = step(sstate, sbatch)

        np.testing.assert_allclose(float(m1["loss"]), float(m2["loss"]), rtol=1e-5)
        # updated params agree
        a = np.asarray(state1.params["decoder"]["tok_emb"])
        b = np.asarray(sstate1.params["decoder"]["tok_emb"])
        np.testing.assert_allclose(a, b, atol=1e-5)


class TestShardedInference:
    """The serving path under GSPMD (VERDICT r1 item 2): dp-sharded greedy and
    beam decode (lax.while_loop + KV cache + reorder_cache gather) must
    produce the same tokens as the single-device program."""

    def _enc_inputs(self, b=8):
        rng = np.random.default_rng(7)
        mel = rng.standard_normal((b, 80, 32)).astype(np.float32)
        prompt = jnp.asarray([3, 5], jnp.int32)
        return mel, prompt

    def _decode_fn(self, strategy):
        from whisper_tpu.decode import beam as dbeam
        from whisper_tpu.decode import greedy as dgreedy

        def run(params, mel, prompt):
            enc = M.encoder_forward(params, mel, CFG)
            if strategy == "beam":
                return dbeam.beam_search_batched(
                    params, enc, prompt, CFG, eot_id=1, beam_size=3,
                    max_depth=8)[:2]
            return dgreedy.greedy_decode(
                params, enc, prompt, CFG, eot_id=1, max_depth=8)[:2]

        return run

    @pytest.mark.parametrize("strategy", ["greedy", "beam"])
    @pytest.mark.parametrize("dp,tp", [(8, 1), (4, 2)])
    def test_sharded_decode_matches_single_device(
        self, params, strategy, dp, tp
    ):
        mel, prompt = self._enc_inputs(b=8)
        run = self._decode_fn(strategy)

        ref_toks, ref_len = jax.jit(run)(params, jnp.asarray(mel), prompt)
        ref_toks, ref_len = np.asarray(ref_toks), np.asarray(ref_len)

        mesh = pmesh.make_mesh(dp=dp, tp=tp)
        with mesh:
            sp = sharding.shard_params(params, mesh, CFG)
            mel_s = jax.device_put(mel, NamedSharding(mesh, P("dp")))
            toks, lens = jax.jit(run)(sp, mel_s, prompt)
        toks, lens = np.asarray(toks), np.asarray(lens)

        np.testing.assert_array_equal(lens, ref_len)
        for i in range(8):
            np.testing.assert_array_equal(
                toks[i, : lens[i]], ref_toks[i, : ref_len[i]]
            )

    def test_batch_transcriber_meshed_matches_meshless(self, tmp_path):
        """End-to-end transcribe_many with mesh= produces identical text."""
        from whisper_tpu.pipeline.batch import BatchTranscriber
        from whisper_tpu.pipeline.transcribe import DecodeOptions
        from whisper_tpu.text.tokenizer import (
            WhisperTokenizer, build_test_tokenizer_json,
        )
        from whisper_tpu.config import tiny_test_config
        from whisper_tpu.ops.audio import max_waveform_samples

        tok_path = str(tmp_path / "tokenizer.json")
        build_test_tokenizer_json(tok_path)
        tok = WhisperTokenizer(tok_path)
        cfg = tiny_test_config(
            n_vocab=tok.vocab_size, n_audio_ctx=64, n_text_ctx=32, n_state=8,
        )
        tparams = M.init_params(jax.random.PRNGKey(3), cfg)

        # full-size windows so every stream rides the batched (dp) path
        n = max_waveform_samples(cfg.encoder_ctx_size - 10)
        rng = np.random.default_rng(11)
        waves = [rng.standard_normal(n).astype(np.float32) for _ in range(4)]
        opts = DecodeOptions(lang="en", strategy="greedy", max_depth=6)

        ref = BatchTranscriber(tparams, cfg, tok, batch_size=4).transcribe_many(
            waves, options=opts)

        mesh = pmesh.make_mesh(dp=4, tp=1, devices=jax.devices()[:4])
        meshed = BatchTranscriber(
            tparams, cfg, tok, batch_size=4, mesh=mesh
        ).transcribe_many(waves, options=opts)

        assert [t for t, _ in meshed] == [t for t, _ in ref]
        assert [tk for _, tk in meshed] == [tk for _, tk in ref]


class TestTpFlashComposition:
    """VERDICT r4 item 1: tensor parallelism must COMPOSE with the Pallas
    kernels instead of falling back to XLA attention. The kernel entry
    points shard_map over ("dp", "tp") when parallel/context.kernel_mesh is
    active (set by the meshed pipeline programs while tracing), so tp>1
    keeps the flash/fused-beam path and must stay token-identical to both
    the meshless flash pipeline and the xla path."""

    def _mk(self, tmp_path, mesh, attention):
        from whisper_tpu.pipeline.transcribe import Transcriber
        from whisper_tpu.text.tokenizer import (
            WhisperTokenizer, build_test_tokenizer_json,
        )

        tok_path = str(tmp_path / "tokenizer.json")
        build_test_tokenizer_json(tok_path)
        tok = WhisperTokenizer(tok_path)
        cfg = tiny_test_config(
            n_vocab=tok.vocab_size, n_audio_ctx=64, n_text_ctx=32,
            n_state=64, n_head=4,
        )
        tparams = M.init_params(jax.random.PRNGKey(5), cfg)
        return Transcriber(tparams, cfg, tok, attention=attention, mesh=mesh), tparams, cfg, tok

    def test_tp_mesh_keeps_flash(self, tmp_path):
        """tp>1 no longer downgrades the attention impl (the round-2 guard
        is gone: kernels shard over heads via shard_map)."""
        mesh = pmesh.make_mesh(dp=4, tp=2)
        t, *_ = self._mk(tmp_path, mesh, attention="flash")
        assert t.cfg.attention == "flash"

    def test_no_mesh_keeps_flash(self, tmp_path):
        t, *_ = self._mk(tmp_path, None, attention="flash")
        assert t.cfg.attention == "flash"

    @pytest.mark.parametrize("strategy", ["greedy", "beam"])
    def test_tp_meshed_flash_transcribe_matches_meshless(
        self, tmp_path, strategy
    ):
        """End-to-end: a tp=2 Transcriber on the FLASH path produces the
        same tokens as the meshless flash AND xla pipelines."""
        from whisper_tpu.ops.audio import max_waveform_samples
        from whisper_tpu.pipeline.transcribe import DecodeOptions

        mesh = pmesh.make_mesh(dp=4, tp=2)
        t_meshed, tparams, cfg, tok = self._mk(tmp_path, mesh, "flash")
        assert t_meshed.cfg.attention == "flash"
        from whisper_tpu.pipeline.transcribe import Transcriber

        t_flash = Transcriber(tparams, cfg, tok, attention="flash")
        t_xla = Transcriber(tparams, cfg, tok, attention="xla")

        n = max_waveform_samples(cfg.encoder_ctx_size - 10)
        wave = np.random.default_rng(13).standard_normal(
            n + 2000).astype(np.float32)
        opts = DecodeOptions(lang="en", strategy=strategy, beam_size=2,
                             max_depth=6, chunk_overlap_seconds=0.02)
        silent = lambda i, s: None
        text_m, toks_m = t_meshed.transcribe(wave, options=opts,
                                             on_chunk=silent)
        text_f, toks_f = t_flash.transcribe(wave, options=opts,
                                            on_chunk=silent)
        text_x, toks_x = t_xla.transcribe(wave, options=opts,
                                          on_chunk=silent)
        assert toks_m == toks_f
        assert text_m == text_f
        assert toks_m == toks_x
        assert text_m == text_x

    @pytest.mark.parametrize("dp,tp", [(4, 2), (2, 4)])
    @pytest.mark.parametrize("strategy", ["greedy", "beam"])
    def test_tp_sharded_flash_decode_matches_single_device(
        self, strategy, dp, tp
    ):
        """The raw decode programs under kernel_mesh: tp-sharded flash
        greedy and the FUSED int8 beam (reshuffle+append+attend kernel)
        must be token-exact vs the meshless flash program."""
        import dataclasses

        from whisper_tpu.decode import beam as dbeam
        from whisper_tpu.decode import greedy as dgreedy
        from whisper_tpu.parallel.context import kernel_mesh

        cfg = dataclasses.replace(
            tiny_test_config(n_state=128, n_head=4, n_layer=2, n_vocab=256,
                             n_audio_ctx=32, n_text_ctx=16),
            attention="flash")
        params = M.init_params(jax.random.PRNGKey(1), cfg)
        rng = np.random.default_rng(3)
        mel = rng.standard_normal((8, 80, 32)).astype(np.float32)
        prompt = jnp.asarray([3, 5], jnp.int32)

        def f(p, m, pr):
            enc = M.encoder_forward(p, m, cfg)
            if strategy == "beam":
                return dbeam.beam_search_batched(
                    p, enc, pr, cfg, eot_id=1, beam_size=3, max_depth=6,
                    self_quant=True)[:2]
            return dgreedy.greedy_decode(
                p, enc, pr, cfg, eot_id=1, max_depth=6)[:2]

        ref_toks, ref_len = jax.jit(f)(params, jnp.asarray(mel), prompt)
        ref_toks, ref_len = np.asarray(ref_toks), np.asarray(ref_len)

        mesh = pmesh.make_mesh(dp=dp, tp=tp)
        with mesh:
            sp = sharding.shard_params(params, mesh, cfg)
            mel_s = jax.device_put(mel, NamedSharding(mesh, P("dp")))
            with kernel_mesh(mesh):
                toks, lens = jax.jit(f)(sp, mel_s, prompt)
        toks, lens = np.asarray(toks), np.asarray(lens)

        np.testing.assert_array_equal(lens, ref_len)
        for i in range(8):
            np.testing.assert_array_equal(
                toks[i, : lens[i]], ref_toks[i, : ref_len[i]])


class TestGraftEntry:
    def test_dryrun_multichip(self):
        import __graft_entry__ as g

        g.dryrun_multichip(8)

    def test_entry_compiles(self):
        import __graft_entry__ as g

        fn, args = g.entry()
        out = jax.jit(fn)(*args)
        assert out.shape[0] == 1 and np.isfinite(np.asarray(out)).all()


class TestMultiProcess:
    """VERDICT r4 item 2 (SURVEY §5 `jax.distributed`): 2 local processes x
    2 CPU devices each, distributed-initialized against a coordinator,
    build the GLOBAL dp=4 mesh and run one train step + one sharded decode.
    Cross-process collectives (gloo) must produce the same loss and the
    SAME tokens as a single-process dp=4 run of the identical program."""

    def test_multiprocess_matches_single_process(self):
        import dataclasses

        import __graft_entry__ as g
        from whisper_tpu.decode import greedy as dgreedy

        loss_mp, toks_mp, lens_mp = g.dryrun_multiprocess(2, 2)

        # single-process reference: SAME cfg/seed/batch construction as
        # tools/multiproc_dryrun.py, dp=4 over this process's devices
        mesh = pmesh.make_mesh(dp=4, tp=1, devices=jax.devices()[:4])
        with mesh:
            params = sharding.shard_params(
                M.init_params(jax.random.PRNGKey(0), CFG), mesh, CFG)
            B = 8
            rng = np.random.default_rng(0)
            bspec = NamedSharding(mesh, sharding.batch_pspec())
            batch = train.Batch(
                mel=jax.device_put(
                    rng.standard_normal((B, 80, 32)).astype(np.float32),
                    bspec),
                tokens=jax.device_put(
                    rng.integers(0, 256, (B, 16)).astype(np.int32), bspec),
                loss_mask=jax.device_put(
                    np.ones((B, 16), np.float32), bspec),
            )
            optimizer = train.make_optimizer(total_steps=10)
            state = train.init_train_state(params, optimizer)
            step_fn = train.make_train_step(CFG, optimizer, remat=True)
            _, metrics = step_fn(state, batch)
            loss_sp = float(metrics["loss"])

            mel2 = jax.device_put(
                rng.standard_normal((B, 80, 32)).astype(np.float32), bspec)
            prompt = jnp.asarray([1, 2, 3], jnp.int32)
            xcfg = dataclasses.replace(CFG, attention="xla")

            def decode(params, mel, prompt):
                enc = M.encoder_forward(params, mel, xcfg)
                toks, lengths, _ = dgreedy.greedy_decode(
                    params, enc, prompt, xcfg, eot_id=0, max_depth=4)
                return toks, lengths

            toks_sp, lens_sp = jax.jit(decode)(params, mel2, prompt)

        np.testing.assert_allclose(loss_mp, loss_sp, rtol=0, atol=1e-5)
        np.testing.assert_array_equal(lens_mp, np.asarray(lens_sp))
        np.testing.assert_array_equal(toks_mp, np.asarray(toks_sp))


class TestShardedFusedBeam:
    """The FUSED beam-reshuffle kernel under a dp-sharded mesh WITHOUT
    kernel_mesh set (plain GSPMD handling of the custom call) must still
    produce single-device tokens; the shard_mapped composition is covered
    by TestTpFlashComposition. Also pins the small-cache regression: the
    kernel's aligned-tile patch must handle caches shorter than one 32-row
    tile (tiny configs; first seen as a mesh-test failure that was really
    this)."""

    def test_dp_sharded_fused_beam_matches_single_device(self):
        import dataclasses

        from whisper_tpu.decode import beam as dbeam

        # n_text_ctx=16 -> cache shorter than one 32-row tile (regression)
        cfg = dataclasses.replace(
            tiny_test_config(n_state=128, n_head=4, n_layer=2, n_vocab=256,
                             n_audio_ctx=32, n_text_ctx=16),
            attention="flash")
        params = M.init_params(jax.random.PRNGKey(1), cfg)
        rng = np.random.default_rng(3)
        mel = rng.standard_normal((8, 80, 32)).astype(np.float32)
        prompt = jnp.asarray([3, 5], jnp.int32)

        def f(p, m, pr):
            enc = M.encoder_forward(p, m, cfg)
            return dbeam.beam_search_batched(
                p, enc, pr, cfg, eot_id=1, beam_size=3, max_depth=6,
                self_quant=True)[:2]

        ref_toks, ref_len = jax.jit(f)(params, jnp.asarray(mel), prompt)
        ref_toks, ref_len = np.asarray(ref_toks), np.asarray(ref_len)

        mesh = pmesh.make_mesh(dp=8, tp=1)
        with mesh:
            sp = sharding.shard_params(params, mesh, cfg)
            mel_s = jax.device_put(mel, NamedSharding(mesh, P("dp")))
            toks, lens = jax.jit(f)(sp, mel_s, prompt)
        toks, lens = np.asarray(toks), np.asarray(lens)

        np.testing.assert_array_equal(lens, ref_len)
        for i in range(8):
            np.testing.assert_array_equal(
                toks[i, : lens[i]], ref_toks[i, : ref_len[i]])
