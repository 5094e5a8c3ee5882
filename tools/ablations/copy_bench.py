import sys, os as _os
sys.path.insert(0, _os.path.join(_os.path.dirname(__file__), '..', '..'))
import os, time
import jax, jax.numpy as jnp, numpy as np
jax.config.update("jax_compilation_cache_dir", os.path.expanduser("~/.cache/whisper_tpu/xla"))
B, L, C, D = 40, 32, 128, 1280
k = jax.random.normal(jax.random.PRNGKey(0), (B, L, C, D), jnp.bfloat16)
v = jax.random.normal(jax.random.PRNGKey(1), (B, L, C, D), jnp.bfloat16)
f = jax.jit(lambda k, v: (k + jnp.bfloat16(1), v + jnp.bfloat16(1)))
ko, vo = f(k, v); np.asarray(ko[0,0,0,:4])
gb = 4 * B * L * C * D * 2 / 1e9
reps = []
for _ in range(5):
    t0 = time.perf_counter()
    for _ in range(20):
        ko, vo = f(k, v)
    np.asarray(ko[0,0,0,:4]); np.asarray(vo[0,0,0,:4])
    reps.append((time.perf_counter() - t0) / 20)
ms = min(reps) * 1000
print(f"elementwise copy-equivalent: {ms:.2f} ms -> {gb/(ms/1000):.0f} GB/s aggregate")
