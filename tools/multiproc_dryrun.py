"""Multi-PROCESS multi-host dry-run worker (SURVEY §5: "XLA collectives
over ICI/DCN via jax.distributed" -- the distributed-communication backend
the single-process virtual-mesh dryrun cannot exercise).

Each worker initializes `jax.distributed` against a shared coordinator,
contributes its local CPU devices to the GLOBAL device list, builds the
same dp mesh over all global devices, and runs ONE training step plus ONE
dp-sharded greedy decode (xla attention AND the shard_mapped Pallas flash
path) on identical host data. Global arrays are assembled with
`jax.make_array_from_callback` (each process materializes only its
addressable shards); cross-process collectives ride the CPU gloo backend
exactly where ICI/DCN collectives would on a TPU pod.

Prints one `RESULT {json}` line per worker: replicated loss, this
process's addressable token shards (with their global row ranges), and an
in-worker flash==xla equality flag. The parent
(__graft_entry__.dryrun_multiprocess / tests/test_parallel.py) assembles
the shards and asserts equality with a single-process reference.

The reference is single-device-only (src/bin/transcribe/main.rs:82); this
is additive TPU-native capability.
"""

from __future__ import annotations

import json
import sys


def main(coordinator: str, num_processes: int, process_id: int) -> None:
    import jax

    jax.config.update("jax_platforms", "cpu")
    jax.distributed.initialize(
        coordinator_address=coordinator,
        num_processes=num_processes,
        process_id=process_id,
    )

    import dataclasses

    import numpy as np
    import jax.numpy as jnp
    from jax.sharding import NamedSharding, PartitionSpec as P

    from whisper_tpu.config import tiny_test_config
    from whisper_tpu.decode import greedy as dgreedy
    from whisper_tpu.models import whisper as M
    from whisper_tpu.parallel import mesh as pmesh
    from whisper_tpu.parallel.context import kernel_mesh
    from whisper_tpu.training import train

    devs = jax.devices()  # GLOBAL: all processes' devices
    n = len(devs)
    assert jax.process_count() == num_processes, (
        jax.process_count(), num_processes)
    mesh = pmesh.make_mesh(dp=n, tp=1, devices=devs)

    cfg = tiny_test_config(
        n_state=64, n_head=4, n_layer=2, n_vocab=256, n_audio_ctx=32,
        n_text_ctx=16,
    )
    # identical on every process (deterministic PRNG) -- the global arrays
    # below are assembled from these host values shard by shard
    host_params = M.init_params(jax.random.PRNGKey(0), cfg)

    def gput(x, spec):
        x = np.asarray(x)
        s = NamedSharding(mesh, spec)
        return jax.make_array_from_callback(x.shape, s, lambda idx: x[idx])

    with mesh:
        params = jax.tree.map(lambda x: gput(x, P()), host_params)
        B = 2 * n
        rng = np.random.default_rng(0)
        mel_np = rng.standard_normal((B, 80, 32)).astype(np.float32)
        tok_np = rng.integers(0, 256, (B, 16)).astype(np.int32)
        batch = train.Batch(
            mel=gput(mel_np, P("dp")),
            tokens=gput(tok_np, P("dp")),
            loss_mask=gput(np.ones((B, 16), np.float32), P("dp")),
        )

        optimizer = train.make_optimizer(total_steps=10)
        state = jax.jit(lambda p: train.init_train_state(p, optimizer))(
            params)
        step_fn = train.make_train_step(cfg, optimizer, remat=True)
        state, metrics = step_fn(state, batch)
        loss = float(metrics["loss"])  # replicated scalar: locally readable

        # --- dp-sharded greedy decode, xla and shard_mapped flash paths ---
        mel2 = gput(rng.standard_normal((B, 80, 32)).astype(np.float32),
                    P("dp"))
        prompt = jnp.asarray([1, 2, 3], jnp.int32)

        def make_decode(dcfg):
            def decode(params, mel, prompt):
                enc = M.encoder_forward(params, mel, dcfg)
                toks, lengths, _ = dgreedy.greedy_decode(
                    params, enc, prompt, dcfg, eot_id=0, max_depth=4
                )
                return toks, lengths
            return decode

        xcfg = dataclasses.replace(cfg, attention="xla")
        fcfg = dataclasses.replace(cfg, attention="flash")
        xtoks, xlens = jax.jit(make_decode(xcfg))(params, mel2, prompt)
        with kernel_mesh(mesh):
            ftoks, _ = jax.jit(make_decode(fcfg))(params, mel2, prompt)

        def local_shards(arr):
            out = []
            for s in arr.addressable_shards:
                idx = s.index[0]
                out.append({
                    "rows": [int(idx.start or 0), int(idx.stop or B)],
                    "data": np.asarray(s.data).tolist(),
                })
            return sorted(out, key=lambda d: d["rows"][0])

        flash_equal = all(
            np.array_equal(np.asarray(a.data), np.asarray(b.data))
            for a, b in zip(
                sorted(xtoks.addressable_shards, key=lambda s: s.index),
                sorted(ftoks.addressable_shards, key=lambda s: s.index),
            )
        )

        print("RESULT " + json.dumps({
            "pid": process_id,
            "n_global_devices": n,
            "loss": loss,
            "step": int(state.step),
            "toks": local_shards(xtoks),
            "lens": local_shards(xlens),
            "flash_equals_xla": bool(flash_equal),
        }), flush=True)

    jax.distributed.shutdown()


if __name__ == "__main__":
    main(sys.argv[1], int(sys.argv[2]), int(sys.argv[3]))
