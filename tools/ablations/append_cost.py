"""Append-cost probe: does the greedy decode step pay for its cache DUS?

The beam reshuffle fusion won +52% -- far beyond the predicted DMA saving
-- implicating the XLA dynamic-update-slice appends' copy-on-write in the
while-loop carry. Greedy (bf16 self-KV) runs the same two DUS appends per
layer; this probe times the fused decoder step with the appends PRESENT
vs MONKEYPATCHED AWAY (semantically wrong, timing-valid: the kernel reads
a stale cache of identical shape/layout).

Env: B (64), C (128), N (20). Greedy shapes: bf16 self-KV, int4 cross.
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

from whisper_tpu.config import preset
from whisper_tpu.models import whisper as M
from whisper_tpu.quantize import QTensor, quantize_params

cfg = dataclasses.replace(preset("large-v2"), attention="flash")
B = int(os.environ.get("B", "64"))
C = int(os.environ.get("C", "128"))
N = int(os.environ.get("N", "20"))
L, SA, D = (cfg.text_decoder_config.n_text_layer, 750, cfg.n_state)
POS = C // 2

print(f"# append_cost: B={B} C={C} N={N} "
      f"device={jax.devices()[0].device_kind}", file=sys.stderr)

rng = np.random.default_rng(0)
ck8 = jnp.asarray(rng.integers(-7, 8, (L, B, SA, D), dtype=np.int8))
sk = jnp.asarray(rng.standard_normal((B, L, C, D)), jnp.bfloat16)
sv = jnp.asarray(rng.standard_normal((B, L, C, D)), jnp.bfloat16)
params = quantize_params(
    M.init_params(jax.random.PRNGKey(0), cfg, dtype=jnp.bfloat16))
params = jax.device_put(params)  # committed device values: jit treats
# closed-over DEVICE arrays as runtime inputs (no constant folding)
tok0 = jnp.asarray(rng.integers(0, 100, (B, 1)), jnp.int32)


def full_step(tok, pos, k, v, c8):
    # c8 is an ARGUMENT: a closed-over cast of the 1.6 GB cross cache gets
    # CONSTANT-FOLDED by XLA at compile time (minutes of folding; the same
    # trap bit step_decomp in a previous session). As an arg the cast is a
    # runtime op, hoisted out of the fori_loop.
    one = jnp.ones((L, D), jnp.float32)
    c4 = c8.astype(jnp.int4)
    cache = M.DecoderCache(k, v, QTensor(c4, one), QTensor(c4, one))
    lg, cache2 = M.decoder_step(params, tok, pos, cache, cfg)
    return tok, (pos + 1) % (C - 1), cache2.self_k, cache2.self_v, c8


def chain(f, *args):
    def run(*a):
        return jax.lax.fori_loop(0, N, lambda _, o: f(*o), a)
    jf = jax.jit(run)
    r = jf(*args)
    np.asarray(jax.tree.leaves(r)[0]).ravel()[:2]
    reps = []
    for _ in range(3):
        t0 = time.perf_counter()
        r = jf(*args)
        np.asarray(jax.tree.leaves(r)[0]).ravel()[:2]
        reps.append(time.perf_counter() - t0)
    return min(reps) / N


mode = os.environ.get("MODE", "both")
if mode in ("both", "with"):
    t = chain(full_step, tok0, jnp.int32(POS), sk, sv, ck8) * 1e3
    print(f"step WITH appends:    {t:7.3f} ms", flush=True)
if mode in ("both", "without"):
    _orig = jax.lax.dynamic_update_slice
    jax.lax.dynamic_update_slice = lambda x, u, idx: x  # timing hack
    try:
        t = chain(full_step, tok0, jnp.int32(POS), sk, sv, ck8) * 1e3
    finally:
        jax.lax.dynamic_update_slice = _orig
    print(f"step WITHOUT appends: {t:7.3f} ms", flush=True)
