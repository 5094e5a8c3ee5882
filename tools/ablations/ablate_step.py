import sys, os as _os
sys.path.insert(0, _os.path.join(_os.path.dirname(__file__), '..', '..'))
import os, time, sys
os.makedirs(os.path.expanduser("~/.cache/whisper_tpu/xla"), exist_ok=True)
import jax, jax.numpy as jnp, numpy as np, dataclasses, functools
jax.config.update("jax_compilation_cache_dir", os.path.expanduser("~/.cache/whisper_tpu/xla"))
from whisper_tpu.config import preset
from whisper_tpu.models import whisper as M
from whisper_tpu.quantize import quantize_params
from whisper_tpu.decode import greedy
import whisper_tpu.ops.pallas.decode_attention as DA

variant = sys.argv[1]

if variant == "nokernel":
    DA.decode_attention_stacked = (
        lambda q, k, v, pos, layer, n_head, **kw: q
    )
elif variant == "noopkernel":
    def noop_kernel(*a):
        o_ref = a[-1]
        o_ref[...] = jnp.zeros(o_ref.shape, o_ref.dtype)
    DA._decode_attn_stacked_kernel = noop_kernel
    DA._decode_attn_stacked_t_kernel = noop_kernel
    DA._decode_attn_stacked_t_scaled_kernel = noop_kernel
    DA._decode_attn_stacked_group_kernel = noop_kernel
    DA._decode_attn_stacked_scaled_kernel = noop_kernel

cfg = dataclasses.replace(preset("large-v2"), attention="flash")
params = M.init_params(jax.random.PRNGKey(0), cfg, dtype=jnp.bfloat16)
params = quantize_params(params)
B, SA = int(os.environ.get('B', '32')), 750
enc = jax.random.normal(jax.random.PRNGKey(1), (B, SA, cfg.n_state), jnp.bfloat16)
prompt = jnp.array([50258, 50259, 50359], jnp.int32)

fn = jax.jit(functools.partial(
    greedy.greedy_decode, cfg=cfg, eot_id=-1, max_depth=100, kv_quant=os.environ.get('KV','int8'),
    self_quant=os.environ.get('SQ','0')=='1'))
t0 = time.perf_counter()
toks, lens, lp = fn(params, enc, prompt)
np.asarray(lens)
print(f"compile+first: {time.perf_counter()-t0:.1f}s", file=sys.stderr)
reps = []
for _ in range(3):
    t0 = time.perf_counter()
    toks, lens, lp = fn(params, enc, prompt)
    np.asarray(lens)
    reps.append(time.perf_counter() - t0)
print(f"{variant}: reps={['%.3f' % r for r in reps]} -> {min(reps)*1000/100:.2f} ms/step")
