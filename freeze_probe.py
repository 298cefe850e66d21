import numpy as np, jax, jax.numpy as jnp, time
jax.config.update("jax_compilation_cache_dir", "/tmp/lyra_tpu_jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
from lyra_tpu import config
from lyra_tpu.codec import engine as eng_mod
from lyra_tpu.codec.engine import DecoderEngine, EncoderEngine, _mask_tree
B = 16384
rng = np.random.RandomState(0)
enc, dec = EncoderEngine(16000, mode="bf16"), DecoderEngine(16000, mode="bf16")
audio = jnp.asarray(rng.randint(-16000,16000,(B,320)), jnp.float32)
received = jnp.ones((B,), bool); nq = jnp.full((B,), 16, jnp.int32)

orig_mask_tree = eng_mod._mask_tree
def run(label, patched):
    if patched:
        eng_mod._mask_tree = lambda m, new, old: new  # no freeze/masking
    else:
        eng_mod._mask_tree = orig_mask_tree
    @jax.jit
    def rt(es, ds, a, r, n):
        idx, isn, es = enc._step_impl(es, a, n)
        out, iscn, ds = dec._step_impl(ds, idx, r)
        return out, iscn, es, ds
    es, ds = enc.init_state(B), dec.init_state(B)
    out, c, es, ds = rt(es, ds, audio, received, nq); jax.block_until_ready(c)
    t0 = time.perf_counter()
    for _ in range(20):
        out, c, es, ds = rt(es, ds, audio, received, nq)
    jax.block_until_ready(c)
    print(f"{label}: {(time.perf_counter()-t0)/20*1e3:.2f} ms/step", flush=True)

run("masked (current)", False)
run("unmasked (no freeze)", True)
eng_mod._mask_tree = orig_mask_tree
