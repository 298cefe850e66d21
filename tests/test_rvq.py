import numpy as np
import pytest
import jax.numpy as jnp

from lyra_tpu import config
from lyra_tpu.models.rvq import ResidualVectorQuantizer
from lyra_tpu.tflite import executor


@pytest.fixture(scope="module")
def rvq(model_path):
    return ResidualVectorQuantizer.from_model_path(model_path)


def test_codebook_shapes(rvq):
    assert rvq.codebooks.shape == (46, 16, 64)
    assert rvq.bits_per_stage == config.BITS_PER_QUANTIZER == 4


def test_native_matches_graph_encode(rvq, model_path):
    """Native scan-based encode == unrolled TFLite encode graph, bit-exact."""
    ge = executor.load_graph(f"{model_path}/quantizer.tflite", signature="encode")
    rng = np.random.default_rng(7)
    feats = rng.normal(0, 5, size=(8, 64)).astype(np.float32)
    for nq in (16, 30, 46):
        got = np.asarray(rvq.quantize(feats, nq))
        for b in range(feats.shape[0]):
            ref, _ = ge({}, input_frames=feats[b].reshape(1, 1, 64),
                        num_quantizers=np.int32(nq))
            ref_idx = np.asarray(ref["output_0"]).ravel()
            np.testing.assert_array_equal(got[b, :nq], ref_idx[:nq])
            np.testing.assert_array_equal(got[b, nq:], -1)


def test_native_matches_graph_decode(rvq, model_path):
    gd = executor.load_graph(f"{model_path}/quantizer.tflite", signature="decode")
    rng = np.random.default_rng(8)
    for nq in (16, 30, 46):
        idx = rng.integers(0, 16, size=(5, 46)).astype(np.int32)
        idx[:, nq:] = -1
        got = np.asarray(rvq.decode(idx))
        for b in range(idx.shape[0]):
            ref, _ = gd({}, encoding_indices=idx[b].reshape(46, 1, 1))
            np.testing.assert_allclose(
                got[b], np.asarray(ref["output_0"]).ravel(), atol=1e-5
            )


def test_roundtrip_distance(rvq):
    """Mirror of the reference RVQ round-trip bar: relative distance < 1.11
    (reference: lyra/residual_vector_quantizer_test.cc:104-111)."""
    rng = np.random.default_rng(9)
    feats = rng.normal(0, 5, size=(4, 64)).astype(np.float32)
    for bits in config.SUPPORTED_QUANTIZED_BITS:
        nq = bits // config.BITS_PER_QUANTIZER
        idx = rvq.quantize(feats, nq)
        back = np.asarray(rvq.decode(np.asarray(idx)))
        rel = np.linalg.norm(back - feats, axis=-1) / np.linalg.norm(feats, axis=-1)
        assert (rel < 1.11).all()


def test_more_stages_better(rvq):
    rng = np.random.default_rng(10)
    feats = rng.normal(0, 5, size=(4, 64)).astype(np.float32)
    errs = []
    for nq in (16, 30, 46):
        back = np.asarray(rvq.decode(np.asarray(rvq.quantize(feats, nq))))
        errs.append(np.linalg.norm(back - feats))
    assert errs[0] > errs[1] > errs[2]


def test_per_stream_num_quantizers(rvq):
    """num_quantizers can vary per stream within one batch."""
    rng = np.random.default_rng(11)
    feats = rng.normal(0, 5, size=(3, 64)).astype(np.float32)
    nq = np.array([16, 30, 46], np.int32)
    idx = np.asarray(rvq.quantize(feats, nq))
    for b, n in enumerate(nq):
        assert (idx[b, :n] >= 0).all()
        assert (idx[b, n:] == -1).all()
        single = np.asarray(rvq.quantize(feats[b : b + 1], int(n)))
        np.testing.assert_array_equal(idx[b], single[0])


def test_pallas_method_matches_fast(rvq):
    """ops/rvq_kernel.py (interpret mode) must match the XLA fast method."""
    from lyra_tpu.ops.rvq_kernel import RvqEncodeKernel

    rng = np.random.default_rng(5)
    feats = jnp.asarray(rng.uniform(-1, 1, (8, 64)), jnp.float32)
    kern = RvqEncodeKernel(np.asarray(rvq.codebooks), block_streams=4,
                           interpret=True)
    rvq._pallas_kernel = kern
    a = np.asarray(rvq.quantize(feats, 46, method="fast"))
    b = np.asarray(rvq.quantize(feats, 46, method="pallas"))
    np.testing.assert_array_equal(a, b)
    # bitrate masking applies identically
    m = np.asarray(rvq.quantize(feats, 16, method="pallas"))
    assert (m[:, 16:] == -1).all() and (m[:, :16] == b[:, :16]).all()


def test_quantize_max_stages_matches_full(model_path):
    """Static stage cap: computed indices identical to the full 46-stage
    run (stage s never depends on later stages), −1 beyond the cap."""
    import numpy as np

    rvq = ResidualVectorQuantizer.from_model_path(model_path)
    rng = np.random.default_rng(5)
    feats = rng.normal(0, 5, (8, 64)).astype(np.float32)
    for method in ("exact", "fast"):
        full = np.asarray(rvq.quantize(feats, 16, method=method))
        capped = np.asarray(rvq.quantize(feats, 16, method=method,
                                         max_stages=16))
        np.testing.assert_array_equal(full, capped)
        assert (capped[:, 16:] == -1).all()


def test_decode_max_stages_matches_full(model_path):
    import numpy as np

    rvq = ResidualVectorQuantizer.from_model_path(model_path)
    rng = np.random.default_rng(6)
    idx = rng.integers(0, 16, (8, 46)).astype(np.int32)
    idx[:, 16:] = -1
    full = np.asarray(rvq.decode(idx))
    capped = np.asarray(rvq.decode(idx, max_stages=16))
    np.testing.assert_allclose(full, capped, rtol=1e-6, atol=1e-6)
