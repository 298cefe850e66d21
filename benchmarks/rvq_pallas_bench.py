import os, sys
sys.path.insert(0, os.path.join(os.path.dirname(__file__), '..'))
import numpy as np, jax, jax.numpy as jnp, time
jax.config.update("jax_compilation_cache_dir", "/tmp/lyra_tpu_jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
from lyra_tpu import config
from lyra_tpu.models.rvq import ResidualVectorQuantizer
rvq = ResidualVectorQuantizer.from_model_path(config.DEFAULT_MODEL_PATH)
B = 16384
rng = np.random.RandomState(0)
f = jnp.asarray(rng.uniform(-1, 1, (B, 64)), jnp.float32)

# correctness vs fast method first (on-device)
fast = jax.jit(lambda x: rvq.quantize(x, 46, method="fast"))
pal = jax.jit(lambda x: rvq.quantize(x, 46, method="pallas"))
a = np.asarray(fast(f)); b = np.asarray(pal(f))
agree = (a == b).mean()
print(f"index agreement fast vs pallas: {agree:.6f}", flush=True)

for name, fn in (("fast", fast), ("pallas", pal)):
    out = fn(f); jax.block_until_ready(out)
    t0 = time.perf_counter()
    for _ in range(30): out = fn(f)
    jax.block_until_ready(out)
    print(f"rvq {name}: {(time.perf_counter()-t0)/30*1e3:.2f} ms/step at B={B}", flush=True)
