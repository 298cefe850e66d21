"""Codec-API integration test: LyraEncoder → LyraDecoder with resampling.

The behavioral oracle of the reference integration test (reference:
lyra/lyra_integration_test.cc:49-143) applied to the full codec facades —
including the external-rate resampling and pull-style playout path that
tests/test_integration.py (raw model pipeline) does not cover.
"""

import numpy as np
import pytest

from lyra_tpu import config
from lyra_tpu.codec.decoder import LyraDecoder
from lyra_tpu.codec.encoder import LyraEncoder
from lyra_tpu.dsp import melspec
from lyra_tpu.dsp import utils as dsp_utils
from lyra_tpu.utils import wav

NUM_SECONDS = 1.5
# Model + resampler warmup hops ignored before asserting quality, the
# facade analog of the reference's |num_frames_to_ignore| logic
# (reference: lyra/lyra_integration_test.cc:104-131).
WARMUP_HOPS = 5


def _grid(sample_rate_hz, bitrate):
    """Quick tier keeps the grid's edges (every rate at 3200, every
    bitrate at 16 kHz); the interior combos run in the full tier/CI."""
    quick = sample_rate_hz == 16000 or bitrate == 3200
    return pytest.param(sample_rate_hz, bitrate,
                        marks=() if quick else (pytest.mark.full,))


@pytest.mark.parametrize(
    "sample_rate_hz,bitrate",
    [_grid(sr, br) for sr in config.SUPPORTED_SAMPLE_RATES
     for br in config.SUPPORTED_BITRATES])
def test_codec_roundtrip_per_hop_lsd(model_path, testdata_path,
                                     sample_rate_hz, bitrate):
    """Every (sample rate x bitrate): per-hop max LSD < 2.0 through the
    full facade path, the reference's integration oracle (reference:
    lyra/lyra_integration_test.cc:132-142 asserts the bar per hop, for
    every rate and bitrate)."""
    khz = sample_rate_hz // 1000
    data = wav.read_wav_int16(f"{testdata_path}/sample1_{khz}kHz.wav")
    assert data.sample_rate_hz == sample_rate_hz
    hop = config.num_samples_per_hop(sample_rate_hz)
    num_hops = int(NUM_SECONDS * config.FRAME_RATE)
    x = data.samples[: num_hops * hop].reshape(num_hops, hop)
    num_bits = config.bitrate_to_num_quantized_bits(bitrate)

    enc = LyraEncoder(sample_rate_hz, bitrate=bitrate, model_path=model_path)
    dec = LyraDecoder(sample_rate_hz, model_path=model_path)
    decoded = []
    for t in range(num_hops):
        pkt = enc.encode(x[t])
        assert pkt is not None and len(pkt) == config.packet_size(num_bits)
        assert dec.set_encoded_packet(pkt)
        out = dec.decode_samples(hop)
        assert out is not None and out.shape == (hop,)
        decoded.append(out)
    decoded = np.stack(decoded)

    cfg = melspec.MelConfig.for_rate(sample_rate_hz, config.NUM_FEATURES)
    ein, edec = melspec.LogMelExtractorRef(cfg), melspec.LogMelExtractorRef(cfg)
    lsds = []
    for t in range(num_hops):
        fi = ein.extract(x[t])
        fd = edec.extract(decoded[t])
        lsds.append(dsp_utils.log_spectral_distance(fi, fd))
    lsd = np.asarray(lsds)[WARMUP_HOPS:]
    assert lsd.max() < 2.0, (
        f"per-hop max LSD {lsd.max():.3f} (hop {WARMUP_HOPS + lsd.argmax()}) "
        f"at {sample_rate_hz} Hz / {bitrate} bps")


@pytest.mark.parametrize("sample_rate_hz", [16000, 48000])
def test_codec_roundtrip_dtx_ends_in_comfort_noise(model_path, testdata_path,
                                                   sample_rate_hz):
    """DTX-on facade round trip ending in CNG: once the encoder suppresses
    noise hops (0-byte packets, reference: lyra/lyra_encoder.cc:131-141) the
    receiver stops feeding packets and the decoder must walk concealment →
    fade → steady comfort noise (reference: lyra/lyra_decoder.cc:228-315).
    The noise classification is forced through the same gate-bypassing seam
    the estimator tests use (the reference warms its estimator through a
    test peer too, lyra/noise_estimator_test.cc:171-196)."""
    khz = sample_rate_hz // 1000
    data = wav.read_wav_int16(f"{testdata_path}/sample1_{khz}kHz.wav")
    hop = config.num_samples_per_hop(sample_rate_hz)
    speech_hops, noise_hops = 15, 12
    x = data.samples[: speech_hops * hop].reshape(speech_hops, hop)

    enc = LyraEncoder(sample_rate_hz, bitrate=3200, enable_dtx=True,
                      model_path=model_path)
    dec = LyraDecoder(sample_rate_hz, model_path=model_path)
    for t in range(speech_hops):
        pkt = enc.encode(x[t])
        assert len(pkt) == config.packet_size(64)  # speech: real packets
        assert dec.set_encoded_packet(pkt)
        assert dec.decode_samples(hop).shape == (hop,)
    assert not dec.is_comfort_noise()

    # Force the DTX gate shut: every further hop classifies as noise.
    enc._state = enc._engine._state_with_bound(enc._state, 1e9)
    rng = np.random.RandomState(3)
    noise = (rng.uniform(-1, 1, (noise_hops, hop)) * 500).astype(np.int16)
    cng_flags = []
    for t in range(noise_hops):
        pkt = enc.encode(noise[t])
        assert pkt == b""  # DTX-suppressed hop
        # A DTX receiver gets no packet, so it never calls
        # set_encoded_packet (a 0-byte packet is not a valid wire packet,
        # reference: lyra/lyra_decoder.cc:173-178) — playout continues
        # through the PLC machine.
        out = dec.decode_samples(hop)
        assert out is not None and out.shape == (hop,)
        cng_flags.append(dec.is_comfort_noise())
    # 0.08 s concealment + 0.04 s fade = 6 hops; by hop 12 of silence the
    # decoder must sit in steady comfort noise.
    assert cng_flags[-1], "decoder never reached comfort noise under DTX"
    # And the transition went through concealment first, not instantly.
    assert not cng_flags[0]


def test_codec_roundtrip_sample2_all_bitrates(model_path, testdata_path):
    """Second speech sample, every bitrate, facade API (reference integration
    style, lyra/lyra_integration_test.cc sweeps sample rates x bitrates)."""
    data = wav.read_wav_int16(f"{testdata_path}/sample2_16kHz.wav")
    hop = config.num_samples_per_hop(16000)
    num_hops = 40
    x = data.samples[: num_hops * hop].reshape(num_hops, hop)

    enc = LyraEncoder(16000, bitrate=3200, model_path=model_path)
    dec = LyraDecoder(16000, model_path=model_path)
    cfg = melspec.MelConfig.for_rate(16000, config.NUM_FEATURES)
    ein, edec = melspec.LogMelExtractorRef(cfg), melspec.LogMelExtractorRef(cfg)
    lsds = []
    for t in range(num_hops):
        if t == 15:
            assert enc.set_bitrate(6000)
        if t == 30:
            assert enc.set_bitrate(9200)
        pkt = enc.encode(x[t])
        assert dec.set_encoded_packet(pkt)
        out = dec.decode_samples(hop)
        lsds.append(dsp_utils.log_spectral_distance(
            ein.extract(x[t]), edec.extract(out)))
    # mid-stream bitrate switches must stay within the quality bar
    assert float(np.mean(lsds[5:])) < 2.0
