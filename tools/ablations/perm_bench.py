import sys, os as _os
sys.path.insert(0, _os.path.join(_os.path.dirname(__file__), '..', '..'))
import os, time, sys
import jax, jax.numpy as jnp, numpy as np
jax.config.update("jax_compilation_cache_dir", os.path.expanduser("~/.cache/whisper_tpu/xla"))
from whisper_tpu.ops.pallas.permute import permute_lanes_pair
from whisper_tpu.models.whisper import permute_lanes

B, L, C, D = 40, 32, 128, 1280
k = jax.random.normal(jax.random.PRNGKey(0), (B, L, C, D), jnp.bfloat16)
v = jax.random.normal(jax.random.PRNGKey(1), (B, L, C, D), jnp.bfloat16)
p = jnp.asarray(np.random.default_rng(0).integers(0, B, B), jnp.int32)
gb = 4 * B * L * C * D * 2 / 1e9

f_pal = jax.jit(permute_lanes_pair)
f_take = jax.jit(lambda k, v, p: (permute_lanes(k, p), permute_lanes(v, p)))
for name, f in (("pallas", f_pal), ("take", f_take)):
    ko, vo = f(k, v, p); np.asarray(ko[0, 0, 0, :4])
    reps = []
    for _ in range(5):
        t0 = time.perf_counter()
        for _ in range(20):
            ko, vo = f(k, v, p)
        np.asarray(ko[0, 0, 0, :4]); np.asarray(vo[0, 0, 0, :4])
        reps.append((time.perf_counter() - t0) / 20)
    ms = min(reps) * 1000
    print(f"{name}: {ms:.2f} ms  ({gb/min(reps)/1e9*1000:.0f} GB/s eff, roofline ~2.05 ms)")
