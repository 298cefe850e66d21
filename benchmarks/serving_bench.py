import os, sys
sys.path.insert(0, os.path.join(os.path.dirname(__file__), '..'))
"""End-to-end serving throughput: engine steps + native wire codec on host.

Production-shaped loop: the host processes tick t-1's packet bytes while
the device computes tick t (software pipelining, one tick of added
latency), and index transfers are compacted to int8 [B, nq] (12x smaller
than the raw [B, 46] int32).  Run with `--sync` to see the naive
blocking loop for comparison."""
import numpy as np, jax, jax.numpy as jnp, time
jax.config.update("jax_compilation_cache_dir", "/tmp/lyra_tpu_jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
from lyra_tpu import config, packet
from lyra_tpu.codec.engine import DecoderEngine, EncoderEngine

B = int(sys.argv[1]) if len(sys.argv) > 1 else 16384
NQ = 16  # 3.2 kbps
rng = np.random.RandomState(0)
enc = EncoderEngine(16000, mode="bf16")
dec = DecoderEngine(16000, mode="bf16")

@jax.jit
def enc_step(es, audio):
    idx, isn, es = enc._step_impl(es, audio, jnp.int32(NQ))
    return idx[:, :NQ].astype(jnp.int8), es  # compact transfer

@jax.jit
def dec_step(ds, idx8, received):
    full = jnp.full((B, 46), -1, jnp.int32)
    full = full.at[:, :NQ].set(idx8.astype(jnp.int32))
    return dec._step_impl(ds, full, received)

es, ds = enc.init_state(B), dec.init_state(B)
audio = jnp.asarray(rng.randint(-16000, 16000, (B, 320)), jnp.float32)
received = np.ones(B, bool); received[rng.uniform(size=B) < 0.05] = False
received_j = jnp.asarray(received)

idx8, es = enc_step(es, audio)
out, iscn, ds = dec_step(ds, idx8, received_j)
jax.block_until_ready(out)

iters = 30
t0 = time.perf_counter()
prev = idx8
for _ in range(iters):
    idx8, es = enc_step(es, audio)          # enqueue tick t
    host_idx = np.asarray(prev, np.int32)   # fetch t-1 (overlaps device)
    pkts = packet.pack_indices_batch(host_idx, 64)
    back = packet.unpack_indices_batch(pkts, 64)
    out, iscn, ds = dec_step(ds, jnp.asarray(back.astype(np.int8)), received_j)
    prev = idx8
jax.block_until_ready(out)
jax.block_until_ready(prev)
dt = (time.perf_counter() - t0) / iters
print(f"serving e2e (pipelined): {dt*1e3:.2f} ms/tick at B={B} -> "
      f"{B*0.02/dt:.0f} realtime streams/chip", flush=True)
