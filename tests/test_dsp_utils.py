import numpy as np

from lyra_tpu.dsp import utils


def test_int16_unit_roundtrip():
    x = np.array([-32768, -1, 0, 1, 16384, 32767], dtype=np.int16)
    u = utils.int16_to_unit_np(x)
    np.testing.assert_allclose(u, x.astype(np.float32) / 32768.0)
    back = utils.unit_to_int16_np(u)
    np.testing.assert_array_equal(back, x)


def test_unit_to_int16_truncates_not_rounds():
    # reference uses C-style truncation toward zero (lyra/dsp_utils.h:51-60)
    vals = np.array([0.99999, -0.99999, 0.5, -0.5], dtype=np.float32)
    out = utils.unit_to_int16_np(vals)
    np.testing.assert_array_equal(out, [32767, -32767, 16384, -16384])


def test_unit_to_int16_clips():
    vals = np.array([1.5, -1.5, 1.0, -1.0], dtype=np.float32)
    out = utils.unit_to_int16_np(vals)
    np.testing.assert_array_equal(out, [32767, -32768, 32767, -32768])


def test_jnp_matches_np():
    rng = np.random.default_rng(2)
    vals = rng.uniform(-1.2, 1.2, size=1024).astype(np.float32)
    import jax.numpy as jnp

    np.testing.assert_array_equal(
        utils.unit_to_int16_np(vals), np.asarray(utils.unit_to_int16(jnp.asarray(vals)))
    )
    ints = rng.integers(-32768, 32768, size=1024).astype(np.int16)
    np.testing.assert_allclose(
        utils.int16_to_unit_np(ints), np.asarray(utils.int16_to_unit(jnp.asarray(ints)))
    )


def test_log_spectral_distance():
    a = np.zeros(64, np.float32)
    b = np.ones(64, np.float32)
    assert np.isclose(utils.log_spectral_distance(a, b), 10.0)
    assert np.isclose(utils.log_spectral_distance(a, a), 0.0)


def test_convert_num_samples():
    assert utils.convert_num_samples(320, 16000, 48000) == 960
    assert utils.convert_num_samples(961, 48000, 16000) == 321
