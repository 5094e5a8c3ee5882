"""Probe: decode-step cost vs self-KV cache length (valid-prefix sizing).

The decode-attention kernels stream the WHOLE (C, D) self cache block per
step even though only rows [0, cur_len) are valid; over a 100-step decode
with C=128 the average valid fraction is ~0.42. This probe measures the
marginal cost of cache rows directly -- step time at cache_len 128 vs 256
(the extra 128 rows are 100% dead) -- to size the win of chunked
valid-prefix kernel reads before building them. Run on the real chip.
"""
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", ".."))

import numpy as np
import jax
import jax.numpy as jnp

jax.config.update(
    "jax_compilation_cache_dir",
    os.path.expanduser("~/.cache/whisper_tpu/xla"),
)

import dataclasses
import functools

from whisper_tpu.config import preset
from whisper_tpu.models import whisper as M
from whisper_tpu.quantize import quantize_params

cfg = dataclasses.replace(preset("large-v2"), attention="flash")
params = quantize_params(
    M.init_params(jax.random.PRNGKey(0), cfg, dtype=jnp.bfloat16))
B = int(os.environ.get("B", "64"))
STEPS = int(os.environ.get("STEPS", "50"))
SELFQ = os.environ.get("SELFQ", "0") == "1"

rng = np.random.default_rng(0)
enc = jnp.asarray(
    rng.standard_normal((B, cfg.encoder_ctx_size, cfg.n_state))
    .astype(np.float32) * 0.2
).astype(jnp.bfloat16)


@functools.partial(jax.jit, static_argnames=("cache_len",))
def decode_steps(params, enc, cache_len):
    cache = M.init_cache(params, enc, cfg, cache_len=cache_len,
                         kv_quant="int4", self_quant=SELFQ)
    tok0 = jnp.full((B, 4), 7, jnp.int32)
    logits, cache = M.decoder_step(params, tok0, jnp.int32(0), cache, cfg)
    logits = logits[:, -1:]

    def body(i, carry):
        logits, cache = carry
        tok = jnp.argmax(logits[:, -1], -1).astype(jnp.int32)[:, None]
        logits, cache = M.decoder_step(params, tok, 4 + i, cache, cfg)
        return logits[:, -1:], cache

    logits, cache = jax.lax.fori_loop(0, STEPS, body, (logits, cache))
    return logits[:, -1, :8]


for cl in (128, 256):
    out = decode_steps(params, enc, cl)
    np.asarray(out)  # compile + run
    times = []
    for _ in range(3):
        t0 = time.perf_counter()
        np.asarray(decode_steps(params, enc, cl))
        times.append(time.perf_counter() - t0)
    best = min(times)
    print(f"B={B} selfq={SELFQ} cache_len={cl}: {best*1e3:.1f} ms total, "
          f"{best*1e3/STEPS:.3f} ms/step  times={['%.3f' % t for t in times]}")
