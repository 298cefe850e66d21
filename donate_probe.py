import numpy as np, jax, jax.numpy as jnp, time
jax.config.update("jax_compilation_cache_dir", "/tmp/lyra_tpu_jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
from lyra_tpu import config
from lyra_tpu.codec.engine import DecoderEngine, EncoderEngine
B = 16384
rng = np.random.RandomState(0)
enc, dec = EncoderEngine(16000, mode="bf16"), DecoderEngine(16000, mode="bf16")
audio = jnp.asarray(rng.randint(-16000,16000,(B,320)), jnp.float32)
received = jnp.ones((B,), bool); nq = jnp.full((B,), 16, jnp.int32)

def rt(es, ds, a, r, n):
    idx, isn, es = enc._step_impl(es, a, n)
    out, iscn, ds = dec._step_impl(ds, idx, r)
    return out, iscn, es, ds

for name, donate in (("donate-enc", (0,)), ("donate-both", (0, 1))):
    try:
        step = jax.jit(rt, donate_argnums=donate)
        es, ds = enc.init_state(B), dec.init_state(B)
        out, c, es, ds = step(es, ds, audio, received, nq)
        jax.block_until_ready(c)
        t0 = time.perf_counter()
        for _ in range(20):
            out, c, es, ds = step(es, ds, audio, received, nq)
        jax.block_until_ready(c)
        dt = (time.perf_counter()-t0)/20
        print(f"{name}: {dt*1e3:.2f} ms/step -> {B*0.02/dt:.0f} streams", flush=True)
    except Exception as e:
        print(f"{name}: FAIL {str(e)[:120]}", flush=True)
