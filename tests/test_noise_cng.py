import jax
import numpy as np
import pytest

from lyra_tpu import config
from lyra_tpu.codec.comfort_noise import ComfortNoiseGenerator
from lyra_tpu.codec.noise_estimator import NoiseEstimator
from lyra_tpu.dsp import melspec
from lyra_tpu.dsp import utils as dsp_utils

SILENCE = melspec.silence_value()


def _base_noise():
    """Reference BaseNoise: power rising linearly with frequency
    (reference: lyra/noise_estimator_test.cc:103-113)."""
    rise = SILENCE / config.NUM_MEL_BINS
    return (rise * np.arange(config.NUM_MEL_BINS) + SILENCE).astype(np.float32)


def test_sparse_energy_convergence():
    """Mirror of FiveSecondsSparseEnergy (reference:
    lyra/noise_estimator_test.cc:130-151): drive the estimator with CNG audio
    generated from base noise + sparse energy spikes; the minimum-statistics
    estimate must converge to the base noise (LSD < 0.7)."""
    rng = np.random.default_rng(0)
    base = _base_noise()
    est = NoiseEstimator(16000)
    cng = ComfortNoiseGenerator(16000)
    jrecv = jax.jit(est.receive_hop)
    jgen = jax.jit(cng.generate_hop)
    es, cs = est.init_state(1), cng.init_state(1, seed=7)
    for i in range(250):
        sparse = base.copy()
        spikes = rng.integers(0, 11, size=base.shape) == 0
        sparse[spikes] = 1.0  # kMaxPower
        samples, cs = jgen(cs, sparse[None])
        clipped = np.clip(np.trunc(np.asarray(samples)), -32768, 32767)
        es = jrecv(es, clipped.astype(np.float32))
    lsd = dsp_utils.log_spectral_distance(
        base, np.asarray(est.noise_estimate(es))[0]
    )
    assert lsd < 0.7, f"LSD {lsd:.3f}"


def test_silence_estimate_stays_silent():
    """Mirror of FiveSecondsSilence (reference:
    lyra/noise_estimator_test.cc:153-172)."""
    est = NoiseEstimator(16000)
    cng = ComfortNoiseGenerator(16000)
    jrecv = jax.jit(est.receive_hop)
    jgen = jax.jit(cng.generate_hop)
    es, cs = est.init_state(1), cng.init_state(1, seed=8)
    silence = np.full((1, config.NUM_MEL_BINS), SILENCE, np.float32)
    for i in range(100):
        samples, cs = jgen(cs, silence)
        es = jrecv(es, np.asarray(samples))
        lsd = dsp_utils.log_spectral_distance(
            silence[0], np.asarray(est.noise_estimate(es))[0]
        )
        assert lsd < 0.2, f"estimate dissimilar at hop {i}: {lsd:.3f}"


def test_noise_identification():
    """Mirror of NoiseIdentification (reference:
    lyra/noise_estimator_test.cc:174-199): after warmup on fluctuating base
    noise (feature level), base noise is classified as noise and a periodic
    spiky signal is not."""
    rng = np.random.default_rng(1)
    base = _base_noise()
    est = NoiseEstimator(16000)
    # match the test's faster constants
    est.num_hops_per_update = 10
    est.max_smoothing = 0.5 ** (1.0 / 20)
    est.bound_decay = 0.5 ** (1.0 / 50)
    state = est.init_state(1)
    jupd = jax.jit(est.update_noise_estimate)
    for _ in range(250):
        feats = base + rng.uniform(-0.1, 0.1, size=base.shape).astype(np.float32)
        state = jupd(state, feats[None])
    assert bool(np.asarray(est.compute_is_noise(state, base[None]))[0])
    periodic = np.full_like(base, SILENCE)
    periodic[::20] = 1.0
    assert not bool(np.asarray(est.compute_is_noise(state, periodic[None]))[0])


def test_noise_estimator_batch_independent():
    rng = np.random.default_rng(2)
    est = NoiseEstimator(16000)
    hops = (2500 * rng.standard_normal((2, 3, 320))).astype(np.float32)
    sb = est.init_state(2)
    for t in range(3):
        sb = est.receive_hop(sb, hops[:, t])
    for b in range(2):
        ss = est.init_state(1)
        for t in range(3):
            ss = est.receive_hop(ss, hops[b : b + 1, t])
        # f32 reduction-order differences between batch shapes get amplified
        # by the exp(-(x/0.3)^2) smoothing term; streams stay independent but
        # not bit-identical across batch sizes.
        np.testing.assert_allclose(
            np.asarray(sb["noise_estimate"])[b],
            np.asarray(ss["noise_estimate"])[0],
            atol=0.05,
        )


def test_cng_matches_requested_features():
    """Reference quality bar: LSD between requested noise features and the
    features of generated comfort noise < 0.7 after a few hops
    (reference: lyra/comfort_noise_generator_test.cc:100-139)."""
    rng = np.random.default_rng(3)
    mel_cfg = melspec.MelConfig.for_rate(16000, config.NUM_MEL_BINS)
    ext = melspec.LogMelExtractorRef(mel_cfg)
    for _ in range(4):
        feats = ext.extract(
            (2500 * rng.standard_normal(320)).clip(-32768, 32767).astype(np.float32)
        )
    feats = feats.astype(np.float32)

    cng = ComfortNoiseGenerator(16000)
    gen = jax.jit(cng.generate_hop)
    state = cng.init_state(1, seed=42)
    out_ext = melspec.LogMelExtractorRef(mel_cfg)
    lsds = []
    for t in range(12):
        samples, state = gen(state, feats[None])
        got = out_ext.extract(np.asarray(samples)[0])
        lsds.append(dsp_utils.log_spectral_distance(feats, got))
    assert np.mean(lsds[-3:]) < 0.7, f"LSDs: {np.round(lsds, 3)}"


def test_cng_output_is_random_but_stationary():
    cng = ComfortNoiseGenerator(16000)
    feats = np.full((1, config.NUM_MEL_BINS), 1.5, np.float32)
    state = cng.init_state(1)
    h1, state = cng.generate_hop(state, feats)
    h2, state = cng.generate_hop(state, feats)
    assert not np.allclose(np.asarray(h1), np.asarray(h2))
    r1 = np.sqrt((np.asarray(h1) ** 2).mean())
    r2 = np.sqrt((np.asarray(h2) ** 2).mean())
    assert abs(r1 - r2) / max(r1, r2) < 0.5
