"""Benchmark harness: batched multi-stream transcription throughput (xRT).

Measures the BASELINE.md primary metric -- audio seconds transcribed per
wall-clock second per chip -- on the real device, using the production path:
log-mel frontend -> encoder -> greedy decode with KV cache, B concurrent
streams, bf16 weights, fixed decode depth (no early EOT exit) so the work is
deterministic and the number is a lower bound on real transcription speed
(real decodes emit EOT long before the depth cap).

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"} for the
primary model (large-v2 greedy), with "beam" and "tiny_en" sub-records so
BOTH BASELINE models appear in the round artifact.
vs_baseline is value / 50 -- the BASELINE.json target of >=50x real-time per
chip (set for large-v2; reported for whatever model is benched, see metric).

The default configuration is int8 weights + int4 cross-KV cache -- the
fastest config that clears the quantization token-agreement gate
(tests/test_quantize.py::TestAgreementGate and `whisper_tpu quant-check`:
token-identical greedy AND beam decode vs bf16, see docs/PERFORMANCE.md).

Env knobs:
  WHISPER_TPU_BENCH_MODEL  (default large-v2; any preset name)
  WHISPER_TPU_BENCH_BATCH  (default 64 streams; on-chip sweeps: decode
                            cost/lane still falling at b64, encoder linear)
  WHISPER_TPU_BENCH_STEPS  (default 100 decode steps/window)
  WHISPER_TPU_BENCH_REPS   (default 3 timed reps)
  WHISPER_TPU_BENCH_QUANT  (int8 | int4 | none; default int8 weight-only)
  WHISPER_TPU_BENCH_KV     (int4 | int8 | none; default int4 cross-KV --
                            packed S4, gate-clean, ~4% faster greedy)
  WHISPER_TPU_BENCH_SELFKV (beam | int8 | none; default beam: int8 self-KV
                            with per-row scales on the beam run only)
  WHISPER_TPU_BENCH_BEAM   (beam width; default 5, 0 disables the beam run)
  WHISPER_TPU_BENCH_BEAM_BATCH (windows in the beam run; default 48 --
                            post-fusion sweep optimum, docs/PERFORMANCE.md)
  WHISPER_TPU_BENCH_SECOND (secondary model; default tiny.en, "none" skips)
  WHISPER_TPU_BENCH_THIRD  (third model; default large-v3-turbo, the
                            deployment model -- encoder-dominated profile)
  WHISPER_TPU_BENCH_{SECOND,THIRD}_BATCH / _BEAM_BATCH (stream counts;
                            default to MODEL_BATCH_DEFAULTS sweep optima)
  WHISPER_TPU_BENCH_EOT    (fixed | ragged; default fixed. ragged gives each
                            stream a real EOT at a staggered depth via a
                            logits_hook -- times the done-masked idle steps
                            and ragged-finish epilogue the fixed-depth run
                            never exercises; see docs/PERFORMANCE.md)
  WHISPER_TPU_BENCH_COLLAPSE (0 | 1; default 0. 1 biases every non-rank-0
                            beam lane's logits toward flat so all K winners
                            descend from one parent each step -- the beam-
                            collapse regime of confident real audio; times
                            the fused kernel's read-dedup + COW best case)
"""

from __future__ import annotations

import json
import os
import sys
import time

import numpy as np


def bench_model(model_name: str, batch: int, steps: int, reps: int,
                quant: str, kv_quant, self_kv: str, beam_size: int,
                beam_batch: int):
    """Bench one model preset; returns a dict with greedy (+ beam) xRT."""
    import dataclasses

    import jax
    import jax.numpy as jnp

    from whisper_tpu.config import preset
    from whisper_tpu.decode import beam as dbeam
    from whisper_tpu.decode import greedy
    from whisper_tpu.models import whisper as M
    from whisper_tpu.ops.audio import max_waveform_samples, prep_audio

    cfg = preset(model_name)
    if jax.default_backend() == "tpu":
        cfg = dataclasses.replace(cfg, attention="flash")
    print(f"# bench: {model_name} batch={batch} steps={steps} "
          f"device={jax.devices()[0].device_kind}", file=sys.stderr)

    params = M.init_params(jax.random.PRNGKey(0), cfg, dtype=jnp.bfloat16)
    if quant in ("int8", "int4"):
        from whisper_tpu.quantize import quantize_params

        params = quantize_params(params, bits=4 if quant == "int4" else 8)
    n_params = sum(int(np.prod(x.shape)) for x in jax.tree.leaves(params))
    print(f"# params: {n_params/1e6:.0f}M (bf16{'+int8' if quant else ''})",
          file=sys.stderr)

    # one window of the production pipeline, batched over streams
    padding = 10
    window_samples = max_waveform_samples(cfg.encoder_ctx_size - padding)
    window_seconds = window_samples / 16000.0
    prompt = jnp.asarray([3, 7, 11, 13], jnp.int32)  # 4-token prompt shape

    # WHISPER_TPU_BENCH_EOT=ragged: a logits_hook boosts a REAL eot id once
    # a stream's depth passes its per-stream threshold (linspace over
    # [0.3*steps, steps-1]), so streams finish STAGGERED like real audio and
    # the done-masked idle steps + ragged-finish epilogue are timed (the
    # default fixed-depth run never exercises them). Deterministic: the
    # +1e4 boost dominates any random-weight logit.
    eot_mode = os.environ.get("WHISPER_TPU_BENCH_EOT", "fixed")
    # WHISPER_TPU_BENCH_COLLAPSE=1 (beam only): a logits_hook scales every
    # non-rank-0 lane's logits toward flat, so after per-lane normalization
    # lane 0's proposals dominate and ALL K winners descend from one parent
    # every step -- the beam-collapse regime real audio spends much of its
    # time in (confident stretches). Exercises the fused kernel's read-dedup
    # (K shared-slab reads -> 1) and the COW degenerate case (1 stay, K-1
    # moves). Composes with the default fixed-depth EOT mode.
    collapse = os.environ.get("WHISPER_TPU_BENCH_COLLAPSE", "0") == "1"

    def make_window_fn(strategy, beam_size=5):
        eot_id = -1  # fixed: no token matches, all streams run `steps`
        collapse_hook = None
        if collapse and strategy == "beam":
            def collapse_hook(logits, tokens, seq_len):
                lane0 = (jnp.arange(logits.shape[0]) % beam_size) == 0
                return logits * jnp.where(lane0[:, None], 1.0, 0.05)
        hook = collapse_hook
        if eot_mode == "ragged":
            eot_id = cfg.text_decoder_config.n_vocab - 1
            P = int(prompt.shape[0])

            # composes with COLLAPSE=1: collapse scaling first, then the
            # EOT boost (the +1e4 dominates either way)
            def hook(logits, tokens, seq_len):
                if collapse_hook is not None:
                    logits = collapse_hook(logits, tokens, seq_len)
                n = logits.shape[0]
                grp = jnp.arange(n) // beam_size if strategy == "beam" \
                    else jnp.arange(n)
                ngrp = n // beam_size if strategy == "beam" else n
                thr = jnp.floor(
                    0.3 * steps
                    + grp * (0.7 * steps - 1.0) / max(ngrp - 1, 1))
                boost = jnp.where(seq_len - P >= thr, 1e4, 0.0)
                return logits.at[:, eot_id].add(boost)

        def window_fn(params, wave):
            mel = prep_audio(wave, per_sample_max=True, n_mels=cfg.n_mels)
            mel = jnp.pad(mel, ((0, 0), (0, 0), (0, padding)))
            enc = M.encoder_forward(params, mel.astype(jnp.bfloat16), cfg)
            if strategy == "beam":
                toks, lengths, _ = dbeam.beam_search_batched(
                    params, enc, prompt, cfg, eot_id=eot_id,
                    beam_size=beam_size, max_depth=steps, kv_quant=kv_quant,
                    self_quant=self_kv in ("beam", "int8"),
                    logits_hook=hook,
                )
            else:
                toks, lengths, _ = greedy.greedy_decode(
                    params, enc, prompt, cfg, eot_id=eot_id, max_depth=steps,
                    kv_quant=kv_quant, self_quant=self_kv == "int8",
                    logits_hook=hook,
                )
            return lengths
        return window_fn

    rng = np.random.default_rng(0)

    def run_config(strategy, b, beam_size=5):
        """Compile + time one (strategy, batch) config; returns (xrt, tok/s).

        NOTE: np.asarray (device->host fetch) rather than block_until_ready
        -- on the axon tunnel backend block_until_ready can return before
        the computation finishes, silently under-measuring.
        """
        fn = jax.jit(make_window_fn(strategy, beam_size))
        wave = jnp.asarray(
            rng.standard_normal((b, window_samples)).astype(np.float32) * 0.1
        )
        t0 = time.perf_counter()
        lengths = np.asarray(fn(params, wave))
        compile_s = time.perf_counter() - t0
        if eot_mode == "ragged":
            print(f"# {strategy} ragged depths: mean "
                  f"{float(lengths.mean()) - prompt.shape[0]:.1f} of {steps} "
                  f"(min {int(lengths.min()) - prompt.shape[0]}, "
                  f"max {int(lengths.max()) - prompt.shape[0]})",
                  file=sys.stderr)
        print(f"# {strategy} b{b}: compile+first run {compile_s:.1f}s",
              file=sys.stderr)
        times = []
        for _ in range(reps):
            t0 = time.perf_counter()
            np.asarray(fn(params, wave))
            times.append(time.perf_counter() - t0)
        best = min(times)
        xrt = b * window_seconds / best
        tok_s = b * steps / best
        print(f"# {strategy} window={window_seconds:.1f}s reps={times} -> "
              f"{xrt:.1f}x RT, {tok_s:.0f} tok/s", file=sys.stderr)
        return xrt, tok_s

    xrt, tok_s = run_config("greedy", batch)

    suffix = (f"_{quant}" if quant else "") + (
        "_kv4" if kv_quant == "int4" else "_kv8" if kv_quant else "") + (
        "_ragged" if eot_mode == "ragged" else "")
    tag = model_name.replace(".", "_").replace("-", "_")
    record = {
        "metric": f"xrt_{tag}_b{batch}_greedy{steps}{suffix}",
        "value": round(xrt, 2),
        "unit": "audio_s_per_s_per_chip",
        "vs_baseline": round(xrt / 50.0, 3),
    }
    if beam_size > 1:
        beam_xrt, _ = run_config("beam", beam_batch, beam_size)
        record["beam"] = {
            "metric": (f"xrt_{tag}_b{beam_batch}_beam{beam_size}_"
                       f"{steps}{suffix}"),
            "value": round(beam_xrt, 2),
            "vs_baseline": round(beam_xrt / 50.0, 3),
        }
    return record


# Per-model measured-best stream counts (on-chip sweeps, docs/PERFORMANCE.md):
# large-v2 greedy still gains to b64 / beam peaks at W48; turbo's 4-layer
# decoder is encoder-dominated -- greedy peaks at b96 (1316.9x vs 1273.3x at
# b64, 1303.2x at b128) and beam at W48 (990.1 vs 950.6 at W64, round-5
# turbo study); tiny.en keeps scaling to b128/W64.
MODEL_BATCH_DEFAULTS = {
    "large-v3-turbo": {"batch": 96, "beam_batch": 48},
    "tiny.en": {"batch": 128, "beam_batch": 64},
    "tiny": {"batch": 128, "beam_batch": 64},
}


def main() -> int:
    import jax

    cache_dir = os.path.expanduser("~/.cache/whisper_tpu/xla")
    os.makedirs(cache_dir, exist_ok=True)
    jax.config.update("jax_compilation_cache_dir", cache_dir)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

    model_name = os.environ.get("WHISPER_TPU_BENCH_MODEL", "large-v2")
    batch = int(os.environ.get("WHISPER_TPU_BENCH_BATCH", "64"))
    steps = int(os.environ.get("WHISPER_TPU_BENCH_STEPS", "100"))
    reps = int(os.environ.get("WHISPER_TPU_BENCH_REPS", "3"))
    kv_env = os.environ.get("WHISPER_TPU_BENCH_KV", "int4")
    kv_quant = kv_env if kv_env in ("int8", "int4") else False
    # int8 self-KV (per-row scales): a clear win for beam (halves the
    # reshuffle permute + cache stream); measured neutral for greedy at b32
    # (the per-step scale-relayout overhead cancels the bandwidth saving),
    # so it defaults on for the beam run only.
    self_kv = os.environ.get("WHISPER_TPU_BENCH_SELFKV", "beam")
    quant = os.environ.get("WHISPER_TPU_BENCH_QUANT", "int8")
    quant = "" if quant in ("none", "bf16", "0") else quant
    beam_size = int(os.environ.get("WHISPER_TPU_BENCH_BEAM", "5"))
    # W=48 measured best for large-v2 beam with the fused reshuffle kernel
    # (W24 253.4 / W32 256.3 / W48 262.0 / W64 249.7 x RT; docs/PERFORMANCE.md)
    beam_batch = int(os.environ.get("WHISPER_TPU_BENCH_BEAM_BATCH", "48"))

    record = bench_model(model_name, batch, steps, reps, quant, kv_quant,
                         self_kv, beam_size, beam_batch)

    # The secondary BASELINE model (tiny.en) rides the same artifact line,
    # as does the deployment model (large-v3-turbo) so all three headline
    # models appear in every round artifact. WHISPER_TPU_BENCH_SECOND /
    # _THIRD=none skips; batches default to the per-model sweep optima.
    extras = [
        ("SECOND", os.environ.get("WHISPER_TPU_BENCH_SECOND", "tiny.en")),
        ("THIRD", os.environ.get("WHISPER_TPU_BENCH_THIRD",
                                 "large-v3-turbo")),
    ]
    seen = {model_name}
    for tag, name in extras:
        if name in ("", "none") or name in seen:
            continue
        seen.add(name)
        defaults = MODEL_BATCH_DEFAULTS.get(name, {})
        sbatch = int(os.environ.get(
            f"WHISPER_TPU_BENCH_{tag}_BATCH",
            str(defaults.get("batch", batch))))
        sbeam_batch = int(os.environ.get(
            f"WHISPER_TPU_BENCH_{tag}_BEAM_BATCH",
            str(defaults.get("beam_batch", beam_batch))))
        srec = bench_model(name, sbatch, steps, reps, quant, kv_quant,
                           self_kv, beam_size, sbeam_batch)
        record[name.replace(".", "_").replace("-", "_")] = srec

    print(json.dumps(record))
    return 0


if __name__ == "__main__":
    sys.exit(main())
