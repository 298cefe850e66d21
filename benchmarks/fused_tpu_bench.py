import os, sys
sys.path.insert(0, os.path.join(os.path.dirname(__file__), '..'))
import numpy as np, jax, jax.numpy as jnp, time, sys
from lyra_tpu import config
from lyra_tpu.ops.fused_stack import FusedStackKernel
MP = config.DEFAULT_MODEL_PATH
B = int(sys.argv[1]) if len(sys.argv) > 1 else 4096
BLK = int(sys.argv[2]) if len(sys.argv) > 2 else 64
rng = np.random.RandomState(0)

ss = FusedStackKernel(f"{MP}/soundstream_encoder.tflite", mode="bf16", block_streams=BLK)
gan = FusedStackKernel(f"{MP}/lyragan.tflite", mode="bf16", block_streams=BLK)

x_ss = jnp.asarray(rng.uniform(-0.5, 0.5, (B, 320)), jnp.float32)
x_gan = jnp.asarray(rng.uniform(-1, 1, (B, 1, 64)), jnp.float32)
for name, kern, x in (("soundstream", ss, x_ss), ("lyragan", gan, x_gan)):
    st = kern.init_state(B)
    t0 = time.perf_counter()
    y, st = kern(st, x); jax.block_until_ready(y)
    print(f"{name}: compile+first {time.perf_counter()-t0:.1f}s", flush=True)
    iters = 30
    t0 = time.perf_counter()
    for _ in range(iters):
        y, st = kern(st, x)
    jax.block_until_ready(y)
    dt = (time.perf_counter()-t0)/iters
    print(f"{name}: {dt*1e3:.2f} ms/step at B={B} blk={BLK} -> {B*0.02/dt:.0f} rt streams (this stage alone)", flush=True)
