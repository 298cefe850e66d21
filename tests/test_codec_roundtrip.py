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


@pytest.mark.parametrize("sample_rate_hz", [8000, 16000, 32000, 48000])
def test_codec_roundtrip_lsd(model_path, testdata_path, sample_rate_hz):
    khz = sample_rate_hz // 1000
    data = wav.read_wav_int16(f"{testdata_path}/sample1_{khz}kHz.wav")
    assert data.sample_rate_hz == sample_rate_hz
    hop = config.num_samples_per_hop(sample_rate_hz)
    num_hops = int(NUM_SECONDS * config.FRAME_RATE)
    x = data.samples[: num_hops * hop].reshape(num_hops, hop)

    enc = LyraEncoder(sample_rate_hz, bitrate=9200, model_path=model_path)
    dec = LyraDecoder(sample_rate_hz, model_path=model_path)
    decoded = []
    for t in range(num_hops):
        pkt = enc.encode(x[t])
        assert pkt is not None and len(pkt) == config.packet_size(184)
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
    # Ignore the first few hops (model + resampler warmup), as the
    # reference does via its |num_frames_to_ignore| logic.
    lsd = np.asarray(lsds)[5:]
    assert lsd.mean() < 2.0, f"mean LSD {lsd.mean():.3f} at {sample_rate_hz} Hz"


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
