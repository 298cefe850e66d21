"""PLC state-machine tests for the single-stream LyraDecoder facade.

Mirrors the reference decoder tests' strategy (reference:
lyra/lyra_decoder_test.cc:185-231 documents the 6-state machine; tests at
:373-795 drive it with mock models returning constant samples): fake hop
generators stand in for LyraGAN/CNG so state transitions and exact cos^2
crossfade values are asserted deterministically, without model weights.
"""

import numpy as np
import pytest

from lyra_tpu import config
from lyra_tpu.codec import decoder as dec
from lyra_tpu.codec.decoder import HopGenerator, LyraDecoder
from lyra_tpu.codec.engine import (
    CONCEALMENT_SAMPLES,
    FADE_FROM_CNG,
    FADE_SAMPLES,
    INTERNAL_HOP,
)
from lyra_tpu.dsp.buffered_resampler import BufferedResampler

MODEL_VALUE = 1000
CNG_VALUE = 4000
PACKET = bytes(config.packet_size(64))  # all-zero 3.2 kbps packet


class _Calls:
    def __init__(self):
        self.noise_receive = 0
        self.estimated_features_added = 0


def make_decoder(sample_rate_hz=16000):
    """Assemble a LyraDecoder with fake models (no weights needed)."""
    d = object.__new__(LyraDecoder)
    calls = _Calls()

    def model_hop(features):
        # Encode which features conditioned this hop into the sample value:
        # real packets decode to MODEL_VALUE, estimated (zero) features to
        # MODEL_VALUE + 1 so tests can tell them apart.
        v = MODEL_VALUE if features[0] == 7.0 else MODEL_VALUE + 1
        if features[0] == 0.0:
            calls.estimated_features_added += 1
        return np.full(INTERNAL_HOP, v, np.int16)

    def cng_hop(features):
        return np.full(INTERNAL_HOP, CNG_VALUE, np.int16)

    d._sample_rate_hz = sample_rate_hz
    d._num_channels = 1
    d._model = HopGenerator(model_hop, config.NUM_FEATURES)
    d._comfort = HopGenerator(cng_hop, config.NUM_MEL_BINS)
    d._resampler = BufferedResampler(config.INTERNAL_SAMPLE_RATE, sample_rate_hz)
    d._concealment = 0
    d._fade = 0
    d._fade_dir = FADE_FROM_CNG

    from lyra_tpu.codec.feature_estimator import ZeroFeatureEstimator

    d._estimator = ZeroFeatureEstimator()
    d._est_state = d._estimator.init_state(1)

    class _FakeRvq:
        num_stages = config.MAX_NUM_QUANTIZERS

    d._rvq = _FakeRvq()
    d._rvq_decode = lambda idx: np.full((1, config.NUM_FEATURES), 7.0, np.float32)

    class _FakeNoise:
        @staticmethod
        def noise_estimate(state):
            return np.full((1, config.NUM_MEL_BINS), 0.5, np.float32)

    d._noise = _FakeNoise()
    d._noise_state = None
    d._noise_buffer = np.zeros(0, np.float32)

    def _noise_receive(samples):
        calls.noise_receive += 1

    d._noise_receive_samples = _noise_receive
    return d, calls


def expected_fade(fade_start, direction, n=INTERNAL_HOP,
                  model=MODEL_VALUE, cng=CNG_VALUE):
    i = np.arange(n, dtype=np.float64)
    w = (1.0 + np.cos((fade_start + direction * i) * np.pi / FADE_SAMPLES)) / 2.0
    return (model * w + cng * (1.0 - w)).astype(np.int16)


def test_normal_decoding_uses_model_only():
    d, calls = make_decoder()
    assert d.set_encoded_packet(PACKET)
    out = d.decode_samples(INTERNAL_HOP)
    np.testing.assert_array_equal(out, np.full(INTERNAL_HOP, MODEL_VALUE))
    assert calls.noise_receive == 1
    assert not d.is_comfort_noise()


def test_rejects_bad_packet_size():
    d, _ = make_decoder()
    assert not d.set_encoded_packet(b"\x00" * 3)
    assert not d.set_encoded_packet(b"")  # DTX empty packet is "not a packet"


def test_concealment_fade_comfort_noise_sequence():
    """States 2 -> 3 -> 4: 4 hops concealment, 2 hops fade, then pure CNG."""
    d, calls = make_decoder()
    conceal_hops = CONCEALMENT_SAMPLES // INTERNAL_HOP  # 4
    fade_hops = FADE_SAMPLES // INTERNAL_HOP  # 2

    # State 2: estimated features drive the generative model alone.
    for _ in range(conceal_hops):
        out = d.decode_samples(INTERNAL_HOP)
        np.testing.assert_array_equal(out, np.full(INTERNAL_HOP, MODEL_VALUE + 1))
        assert not d.is_comfort_noise()
    assert calls.estimated_features_added == conceal_hops

    # State 3: cos^2 fade from model to comfort noise, exact sample values.
    for h in range(fade_hops):
        out = d.decode_samples(INTERNAL_HOP)
        np.testing.assert_array_equal(
            out, expected_fade(h * INTERNAL_HOP, +1, model=MODEL_VALUE + 1))
    assert d.is_comfort_noise()

    # State 4: pure comfort noise; generative model no longer conditioned.
    added = calls.estimated_features_added
    out = d.decode_samples(INTERNAL_HOP)
    np.testing.assert_array_equal(out, np.full(INTERNAL_HOP, CNG_VALUE))
    assert calls.estimated_features_added == added
    assert d.is_comfort_noise()


def test_fade_back_to_normal_after_packet():
    """State 4 -> 5 -> 1: received packet fades CNG out over 2 hops."""
    d, calls = make_decoder()
    for _ in range(CONCEALMENT_SAMPLES // INTERNAL_HOP + FADE_SAMPLES // INTERNAL_HOP + 2):
        d.decode_samples(INTERNAL_HOP)
    assert d.is_comfort_noise()

    # State 5: fade from CNG back to real-packet decoding.
    for h in range(FADE_SAMPLES // INTERNAL_HOP):
        assert d.set_encoded_packet(PACKET)
        out = d.decode_samples(INTERNAL_HOP)
        np.testing.assert_array_equal(
            out, expected_fade(FADE_SAMPLES - h * INTERNAL_HOP, -1))
    assert not d.is_comfort_noise()

    # State 1 again: pure model output, noise estimator hears it.
    before = calls.noise_receive
    assert d.set_encoded_packet(PACKET)
    out = d.decode_samples(INTERNAL_HOP)
    np.testing.assert_array_equal(out, np.full(INTERNAL_HOP, MODEL_VALUE))
    assert calls.noise_receive == before + 1


def test_multiple_hops_one_request():
    """Queue several packets, decode them in one request
    (reference: lyra/lyra_decoder_test.cc:556-581)."""
    d, calls = make_decoder()
    for _ in range(4):
        assert d.set_encoded_packet(PACKET)
    out = d.decode_samples(4 * INTERNAL_HOP)
    np.testing.assert_array_equal(out, np.full(4 * INTERNAL_HOP, MODEL_VALUE))
    assert calls.noise_receive == 4
    assert not d.is_comfort_noise()


def test_subhop_requests_equal_hop_requests():
    """Arbitrary DecodeSamples sizes must produce the identical stream."""
    da, _ = make_decoder()
    db, _ = make_decoder()
    total = 8 * INTERNAL_HOP
    for d in (da, db):
        d.set_encoded_packet(PACKET)
        d.set_encoded_packet(PACKET)

    a = np.concatenate([da.decode_samples(INTERNAL_HOP) for _ in range(8)])
    chunks, got = [], 0
    sizes = [37, 100, 283, 320, 1, 479]
    k = 0
    while got < total:
        n = min(sizes[k % len(sizes)], total - got)
        k += 1
        chunks.append(db.decode_samples(n))
        got += n
    b = np.concatenate(chunks)
    np.testing.assert_array_equal(a, b)


def test_finish_fake_packet_before_real_packet():
    """A packet arriving mid-concealment-hop waits for the fake hop to end
    (reference: lyra/lyra_decoder.cc:186-196, negative concealment)."""
    d, _ = make_decoder()
    out = d.decode_samples(100)  # starts a concealment hop (estimated feats)
    np.testing.assert_array_equal(out, np.full(100, MODEL_VALUE + 1))
    assert d.set_encoded_packet(PACKET)
    assert d._concealment == -(INTERNAL_HOP - 100)

    out = d.decode_samples(INTERNAL_HOP)
    np.testing.assert_array_equal(
        out[: INTERNAL_HOP - 100], np.full(INTERNAL_HOP - 100, MODEL_VALUE + 1))
    np.testing.assert_array_equal(out[INTERNAL_HOP - 100:],
                                  np.full(100, MODEL_VALUE))
    assert d._concealment == 0


@pytest.mark.parametrize("rate,factor", [(32000, 2), (48000, 3)])
def test_resampled_output_length(rate, factor):
    d, _ = make_decoder(sample_rate_hz=rate)
    d.set_encoded_packet(PACKET)
    hop_ext = config.num_samples_per_hop(rate)
    out = d.decode_samples(hop_ext)
    assert out.shape == (hop_ext,)
    # Constant input resamples to the same constant away from the filter edge.
    assert np.all(np.abs(out[factor * 40:].astype(int) - MODEL_VALUE) <= 1)
