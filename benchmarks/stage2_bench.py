import os, sys
sys.path.insert(0, os.path.join(os.path.dirname(__file__), '..'))
import numpy as np, jax, jax.numpy as jnp, time
jax.config.update("jax_compilation_cache_dir", "/tmp/lyra_tpu_jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
from lyra_tpu import config
from lyra_tpu.codec.engine import DecoderEngine, EncoderEngine
from lyra_tpu.codec.comfort_noise import ComfortNoiseGenerator
from lyra_tpu.codec.noise_estimator import NoiseEstimator
from lyra_tpu.models.rvq import ResidualVectorQuantizer
MP = config.DEFAULT_MODEL_PATH
B = 16384
rng = np.random.RandomState(0)

def timeit(name, fn, *args, iters=20):
    out = fn(*args); jax.block_until_ready(out)
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn(*args)
    jax.block_until_ready(out)
    print(f"{name:16s}: {(time.perf_counter()-t0)/iters*1e3:7.2f} ms/step at B={B}", flush=True)

enc = EncoderEngine(16000, mode="bf16")
dec = DecoderEngine(16000, mode="bf16")
es, ds = enc.init_state(B), dec.init_state(B)
audio = jnp.asarray(rng.randint(-16000,16000,(B,320)), jnp.float32)
received = jnp.ones((B,), bool)
nq = jnp.full((B,), 16, jnp.int32)
idx = jnp.zeros((B,46), jnp.int32)
timeit("enc_step", lambda: enc.step(es, audio, nq)[0])
timeit("dec_step", lambda: dec.step(ds, idx, received)[0])
rvq = dec.rvq
timeit("rvq_fast_quant", jax.jit(lambda f: rvq.quantize(f, 16, method="fast")), jnp.zeros((B,64), jnp.float32))
timeit("rvq_decode", jax.jit(rvq.decode), idx)
cng = dec.cng
cs = cng.init_state(B)
timeit("cng", jax.jit(cng.generate_hop), cs, jnp.zeros((B,160), jnp.float32))
# phases RNG alone (counter-hash path)
timeit("cng_rng_only", jax.jit(lambda c: cng._random_phases(c, 513)), cs["ctr"])
ne = dec.noise
ns = ne.init_state(B)
timeit("noise_est", jax.jit(ne.receive_hop), ns, audio)
