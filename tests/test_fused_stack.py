"""Pallas megakernel parity vs the per-op XLA lowering.

Runs the fused stack in pallas interpret mode (CPU) against the reference
GraphFn executor across multiple streaming steps, so the in-VMEM conv
lowering (windowed matmuls, parity-decomposed transpose convs, state
splicing) is pinned op-for-op.
"""

import numpy as np
import pytest

jax = pytest.importorskip("jax")
import jax.numpy as jnp  # noqa: E402

from lyra_tpu import config  # noqa: E402
from lyra_tpu.models.streaming import LyraGanModel, SoundStreamEncoder  # noqa: E402
from lyra_tpu.ops.fused_stack import FusedStackKernel  # noqa: E402


@pytest.mark.parametrize("name", ["soundstream_encoder", "lyragan"])
def test_fused_matches_executor(model_path, name):
    B = 8
    rng = np.random.default_rng(1)
    fused = FusedStackKernel(f"{model_path}/{name}.tflite", mode="float",
                             block_streams=4, interpret=True)
    if name == "soundstream_encoder":
        ref = SoundStreamEncoder(model_path)
        shape = (B, 320)
        run_ref = lambda st, x: ref(st, x[:, None, :])
    else:
        ref = LyraGanModel(model_path)
        shape = (B, 1, 64)
        run_ref = lambda st, x: ref(st, x[:, None, :, :])

    fs, rs = fused.init_state(B), ref.init_state(B)
    for _ in range(3):
        x = jnp.asarray(rng.uniform(-0.5, 0.5, shape), jnp.float32)
        y_f, fs = fused(fs, x)
        y_r, rs = run_ref(rs, x)
        np.testing.assert_allclose(
            np.asarray(y_f).reshape(B, -1), np.asarray(y_r).reshape(B, -1),
            atol=2e-4, rtol=1e-4)


def test_fused_backend_model_wrappers(model_path):
    """backend='fused' wrappers expose the same API and agree with XLA."""
    B = 8
    rng = np.random.default_rng(2)
    import lyra_tpu.ops.fused_stack as fs_mod

    ss_x = SoundStreamEncoder(model_path)
    ss_f = SoundStreamEncoder(model_path, backend="fused", block_streams=4)
    ss_f._fused._kernel.interpret = True

    frames = jnp.asarray(rng.uniform(-0.5, 0.5, (B, 320)), jnp.float32)
    sx, sf = ss_x.init_state(B), ss_f.init_state(B)
    fx, sx = ss_x.extract(sx, frames)
    ff, sf = ss_f.extract(sf, frames)
    np.testing.assert_allclose(np.asarray(fx), np.asarray(ff),
                               atol=2e-4, rtol=1e-4)

    gan_x = LyraGanModel(model_path)
    gan_f = LyraGanModel(model_path, backend="fused", block_streams=4)
    gan_f._fused._kernel.interpret = True
    feats = jnp.asarray(rng.uniform(-1, 1, (B, 64)), jnp.float32)
    gx, gf = gan_x.init_state(B), gan_f.init_state(B)
    yx, gx = gan_x.decode_hop(gx, feats)
    yf, gf = gan_f.decode_hop(gf, feats)
    np.testing.assert_allclose(np.asarray(yx), np.asarray(yf),
                               atol=2e-4, rtol=1e-4)

    # reset_rows reinitializes only masked rows
    mask = np.zeros(B, bool)
    mask[0] = True
    gf2 = gan_f.reset_rows(gf, jnp.asarray(mask))
    init = gan_f.init_state(B)
    for k in gf2:
        np.testing.assert_array_equal(np.asarray(gf2[k][0]),
                                      np.asarray(init[k][0]))
        np.testing.assert_array_equal(np.asarray(gf2[k][1]),
                                      np.asarray(gf[k][1]))
