import os, sys
sys.path.insert(0, os.path.join(os.path.dirname(__file__), '..'))
import os; os.environ["LYRA_TPU_PLATFORM"]="cpu"
import numpy as np, jax, jax.numpy as jnp
from lyra_tpu import config
from lyra_tpu.ops.fused_stack import FusedStackKernel
from lyra_tpu.models.streaming import SoundStreamEncoder, LyraGanModel

MP = config.DEFAULT_MODEL_PATH
rng = np.random.RandomState(0)
B = 8

for name, path, inp_shape, mk_ref in (
    ("soundstream", f"{MP}/soundstream_encoder.tflite", (B, 320),
     lambda: SoundStreamEncoder(MP)),
    ("lyragan", f"{MP}/lyragan.tflite", (B, 1, 64),
     lambda: LyraGanModel(MP)),
):
    fused = FusedStackKernel(path, mode="float", block_streams=4, interpret=True)
    ref = mk_ref()
    x = rng.uniform(-0.5, 0.5, inp_shape).astype(np.float32)

    fs = fused.init_state(B)
    rs = ref.init_state(B)
    for step in range(3):
        xs = rng.uniform(-0.5, 0.5, inp_shape).astype(np.float32)
        if name == "soundstream":
            y_f, fs = fused(fs, jnp.asarray(xs))
            y_r, rs = ref(rs, jnp.asarray(xs)[:, None, :])
            y_r = np.asarray(y_r).reshape(B, -1)
            y_f = np.asarray(y_f).reshape(B, -1)
        else:
            y_f, fs = fused(fs, jnp.asarray(xs))
            y_r, rs = ref(rs, jnp.asarray(xs)[:, None, None, :])
            y_r = np.asarray(y_r).reshape(B, -1)
            y_f = np.asarray(y_f).reshape(B, -1)
        err = np.abs(y_f - y_r).max()
        print(f"{name} step {step}: max|diff| = {err:.3e}")
