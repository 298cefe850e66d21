"""Parity tests: our TFLite→JAX lowering vs the TF Lite interpreter oracle.

These tests exercise the same three model graphs the reference ships
(reference: lyra/model_coeffs/*.tflite) and compare against the TFLite
interpreter, which is the reference's compute engine
(reference: lyra/tflite_model_wrapper.cc).
"""

import os

import jax
import numpy as np
import pytest

from lyra_tpu.tflite import executor

tf = pytest.importorskip("tensorflow")

MC = "/root/reference/lyra/model_coeffs"
pytestmark = pytest.mark.skipif(not os.path.isdir(MC), reason="no reference weights")


def _oracle(model, signature="serving_default"):
    ip = tf.lite.Interpreter(model_path=f"{MC}/{model}.tflite")
    return ip.get_signature_runner(signature)


@pytest.fixture(scope="module")
def rng():
    return np.random.default_rng(42)


def test_soundstream_parity(rng):
    r = _oracle("soundstream_encoder")
    g = executor.load_graph(f"{MC}/soundstream_encoder.tflite", mode="fakequant")
    fn = jax.jit(lambda s, x: g(s, input_audio=x))
    state = g.init_state()
    frames = rng.uniform(-0.5, 0.5, size=(4, 1, 320)).astype(np.float32)
    for f in frames:
        ref = r(input_audio=f)["output_0"]
        out, state = fn(state, f)
        got = np.asarray(out["output_0"])
        assert got.shape == (1, 1, 64)
        # fakequant tracks the int8 oracle to within a few quantization steps
        # (output scale ~0.26); features span roughly ±40.
        assert np.abs(got - ref).max() < 1.6
        assert np.abs(got - ref).mean() < 0.5


def test_soundstream_state_carries(rng):
    """Same input twice must give different output (streaming conv state)."""
    g = executor.load_graph(f"{MC}/soundstream_encoder.tflite")
    state = g.init_state()
    f = rng.uniform(-0.5, 0.5, size=(1, 320)).astype(np.float32)
    o1, state = g(state, input_audio=f)
    o2, state = g(state, input_audio=f)
    assert np.abs(np.asarray(o1["output_0"]) - np.asarray(o2["output_0"])).max() > 0.1


def test_soundstream_state_reset(rng):
    """Re-initializing state reproduces the first-frame output exactly."""
    g = executor.load_graph(f"{MC}/soundstream_encoder.tflite")
    f = rng.uniform(-0.5, 0.5, size=(1, 320)).astype(np.float32)
    o1, _ = g(g.init_state(), input_audio=f)
    o2, _ = g(g.init_state(), input_audio=f)
    np.testing.assert_array_equal(np.asarray(o1["output_0"]), np.asarray(o2["output_0"]))


def test_lyragan_parity(rng):
    r = _oracle("lyragan")
    g = executor.load_graph(f"{MC}/lyragan.tflite", mode="float")
    fn = jax.jit(lambda s, x: g(s, input_audio=x))
    state = g.init_state()
    feats = rng.normal(0, 5, size=(4, 1, 1, 64)).astype(np.float32)
    for f in feats:
        ref = r(input_audio=f)["output_0"]
        out, state = fn(state, f)
        got = np.asarray(out["output_0"])
        assert got.shape == (1, 320)
        rms = float(np.sqrt((ref**2).mean()))
        rms_diff = float(np.sqrt(((got - ref) ** 2).mean()))
        # int8-island quantization noise; the real fidelity oracle is the
        # end-to-end log-spectral-distance test in test_integration.py.
        assert rms_diff < max(0.35 * rms, 0.02)


def test_rvq_encode_bit_exact(rng):
    """Our lowering of the RVQ encode graph reproduces TFLite indices exactly."""
    enc = _oracle("quantizer", "encode")
    ge = executor.load_graph(f"{MC}/quantizer.tflite", signature="encode")
    assert not ge.stateful
    feats = rng.normal(0, 5, size=(4, 1, 1, 64)).astype(np.float32)
    for nq in (16, 30, 46):
        for f in feats:
            ref = enc(input_frames=f, num_quantizers=np.int32(nq))
            out, _ = ge({}, input_frames=f, num_quantizers=np.int32(nq))
            got = np.asarray(out["output_0"]).ravel()
            np.testing.assert_array_equal(got[:nq], ref["output_0"].ravel()[:nq])
            assert int(np.asarray(out["output_1"])) == int(ref["output_1"]) == 4


def test_rvq_decode_bit_exact(rng):
    dec = _oracle("quantizer", "decode")
    gd = executor.load_graph(f"{MC}/quantizer.tflite", signature="decode")
    for nq in (16, 30, 46):
        idx = rng.integers(0, 16, size=(46, 1, 1)).astype(np.int32)
        idx[nq:] = -1
        ref = dec(encoding_indices=idx)["output_0"]
        out, _ = gd({}, encoding_indices=idx)
        np.testing.assert_array_equal(np.asarray(out["output_0"]), ref)
