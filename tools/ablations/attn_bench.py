"""Microbench: stacked decode-attention kernel, row-major vs transposed K."""
import sys, os as _os
sys.path.insert(0, _os.path.join(_os.path.dirname(__file__), '..', '..'))
import os, time, sys
import jax, jax.numpy as jnp, numpy as np, functools
jax.config.update("jax_compilation_cache_dir", os.path.expanduser("~/.cache/whisper_tpu/xla"))
from whisper_tpu.ops.pallas import decode_attention as DA

B, L, SA, D, NH = 64, 32, 750, 1280, 20
dtname = os.environ.get("DT", "int8")
dt = {"int8": jnp.int8, "int4": jnp.int4, "bf16": jnp.bfloat16}[dtname]
rng = np.random.default_rng(0)
k8 = jnp.asarray(rng.integers(-7, 8, (L, B, SA, D)), jnp.int8)
v8 = jnp.asarray(rng.integers(-7, 8, (L, B, SA, D)), jnp.int8)
q = jnp.asarray(rng.standard_normal((B, D)), jnp.bfloat16)
pos = jnp.full((B,), SA - 1, jnp.int32)

def make(transposed):
    def run(q, k8, v8):
        v = v8.astype(dt)
        k = jnp.swapaxes(k8, 2, 3).astype(dt) if transposed else k8.astype(dt)
        out = q
        for i in range(32):
            out = DA.decode_attention_stacked(
                out[:, :D], k, v, pos, jnp.int32(i % L), NH,
                k_transposed=transposed)
        return out
    return jax.jit(run)

for name, f in (("row", make(False)), ("T", make(True))):
    out = f(q, k8, v8); np.asarray(out[0, :2])
    reps = []
    for _ in range(4):
        t0 = time.perf_counter(); np.asarray(f(q, k8, v8)[0, :2]); reps.append(time.perf_counter() - t0)
    print(f"{name}[{dtname} b{B}]: {min(reps)*1000/32:.3f} ms per layer-call (incl. one-time cast amortized)")
