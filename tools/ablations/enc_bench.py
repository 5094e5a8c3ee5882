import sys, os as _os
sys.path.insert(0, _os.path.join(_os.path.dirname(__file__), '..', '..'))
import os, time, sys
import jax, jax.numpy as jnp, numpy as np, dataclasses
jax.config.update("jax_compilation_cache_dir", os.path.expanduser("~/.cache/whisper_tpu/xla"))
from whisper_tpu.config import preset
from whisper_tpu.models import whisper as M
from whisper_tpu.ops.audio import prep_audio, max_waveform_samples
from whisper_tpu.quantize import quantize_params

impl = sys.argv[1] if len(sys.argv) > 1 else "flash"
quant = len(sys.argv) > 2 and sys.argv[2] == "int8"
cfg = dataclasses.replace(preset("large-v2"), attention=impl)
params = M.init_params(jax.random.PRNGKey(0), cfg, dtype=jnp.bfloat16)
if quant:
    params = quantize_params(params, quantize_encoder=True)
B = int(os.environ.get("B", "32"))
n = max_waveform_samples(1490)
wave = jnp.asarray(np.random.default_rng(0).standard_normal((B, n)).astype(np.float32))
mel_fn = jax.jit(prep_audio)
mel = mel_fn(wave); np.asarray(mel[0,0,:1])
enc_fn = jax.jit(lambda p, m: M.encoder_forward(p, m, cfg))
t0=time.perf_counter(); out = enc_fn(params, mel); np.asarray(out[0,0,:1])
print(f"compile+first {time.perf_counter()-t0:.1f}s", file=sys.stderr)
# time mel and encoder separately
for name, fn, arg in (("mel", mel_fn, wave), ("encoder", enc_fn, None)):
    reps=[]
    for _ in range(3):
        t0=time.perf_counter()
        r = fn(params, mel) if arg is None else fn(arg)
        np.asarray(r[0,0,:1] if r.ndim==3 else r[0,:1])
        reps.append(time.perf_counter()-t0)
    print(f"{impl}{'+int8' if quant else ''} {name}: {min(reps)*1000:.1f} ms (b{B})")
