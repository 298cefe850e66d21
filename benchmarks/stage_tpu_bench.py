import os, sys
sys.path.insert(0, os.path.join(os.path.dirname(__file__), '..'))
import numpy as np, jax, jax.numpy as jnp, time, sys
jax.config.update("jax_compilation_cache_dir", "/tmp/lyra_tpu_jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
from lyra_tpu import config
from lyra_tpu.models.streaming import SoundStreamEncoder, LyraGanModel
from lyra_tpu.models.rvq import ResidualVectorQuantizer
from lyra_tpu.codec.comfort_noise import ComfortNoiseGenerator
from lyra_tpu.codec.noise_estimator import NoiseEstimator
MP = config.DEFAULT_MODEL_PATH
B = 4096
rng = np.random.RandomState(0)

def timeit(name, fn, state, x, iters=30):
    out, st = fn(state, x); jax.block_until_ready(out)
    t0 = time.perf_counter()
    for _ in range(iters):
        out, st = fn(st, x)
    jax.block_until_ready(out)
    dt = (time.perf_counter()-t0)/iters
    print(f"{name:14s}: {dt*1e3:7.2f} ms/step at B={B}", flush=True)

ss = SoundStreamEncoder(MP, mode="bf16")
timeit("soundstream", jax.jit(ss.extract), ss.init_state(B),
       jnp.asarray(rng.uniform(-0.5,0.5,(B,320)), jnp.float32))
gan = LyraGanModel(MP, mode="bf16")
timeit("lyragan", jax.jit(gan.decode_hop), gan.init_state(B),
       jnp.asarray(rng.uniform(-1,1,(B,64)), jnp.float32))
rvq = ResidualVectorQuantizer.from_model_path(MP)
f = jnp.asarray(rng.uniform(-1,1,(B,64)), jnp.float32)
timeit("rvq_quantize", jax.jit(lambda s, x: (rvq.quantize(x, 46), s)), None, f)
idx = jnp.zeros((B,46), jnp.int32)
timeit("rvq_decode", jax.jit(lambda s, x: (rvq.decode(x), s)), None, idx)
cng = ComfortNoiseGenerator(16000)
timeit("cng", jax.jit(cng.generate_hop), cng.init_state(B), jnp.zeros((B,160), jnp.float32))
ne = NoiseEstimator(16000)
timeit("noise_est", jax.jit(lambda s, x: (ne.receive_hop(s, x), s)), ne.init_state(B),
       jnp.asarray(rng.randint(-8000,8000,(B,320)), jnp.float32))
