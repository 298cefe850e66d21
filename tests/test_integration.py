"""End-to-end behavioral quality test, mirroring the reference integration
test (reference: lyra/lyra_integration_test.cc:49-143): encode+decode 3 s of
real speech and require per-hop log-spectral distance < 2.0 dB between input
and decoded log-mel features.

This drives the raw model pipeline (SoundStream → RVQ → packet → RVQ⁻¹ →
LyraGAN); the codec-core tests add PLC/DTX/resampling on top.
"""

import jax
import numpy as np
import pytest

from lyra_tpu import config, packet
from lyra_tpu.dsp import melspec
from lyra_tpu.dsp import utils as dsp_utils
from lyra_tpu.models.rvq import ResidualVectorQuantizer
from lyra_tpu.models.streaming import LyraGanModel, SoundStreamEncoder
from lyra_tpu.utils import wav


@pytest.mark.parametrize("num_bits", [64, 120, 184])
def test_encode_decode_lsd(model_path, testdata_path, num_bits):
    data = wav.read_wav_int16(f"{testdata_path}/sample1_16kHz.wav")
    hop = config.num_samples_per_hop(16000)
    num_hops = min(3 * 16000 // hop, len(data.samples) // hop)
    x = data.samples[: num_hops * hop].reshape(num_hops, hop)

    encoder = SoundStreamEncoder(model_path)
    decoder = LyraGanModel(model_path)
    rvq = ResidualVectorQuantizer.from_model_path(model_path)
    nq = num_bits // config.BITS_PER_QUANTIZER

    @jax.jit
    def step(es, ds, frame_i16):
        feats, es = encoder.extract(es, dsp_utils.int16_to_unit(frame_i16))
        idx = rvq.quantize(feats, nq)
        lossy = rvq.decode(idx)
        samples, ds = decoder.decode_hop(ds, lossy)
        return idx, dsp_utils.unit_to_int16(samples), es, ds

    es, ds = encoder.init_state(1), decoder.init_state(1)
    decoded = []
    for t in range(num_hops):
        idx, out, es, ds = step(es, ds, x[t][None])
        # wire round-trip must be lossless
        pkt = packet.pack_indices_batch(np.asarray(idx), num_bits)
        assert pkt.shape == (1, config.packet_size(num_bits))
        back = packet.unpack_indices_batch(pkt, num_bits)
        np.testing.assert_array_equal(back[0], np.asarray(idx)[0, :nq])
        decoded.append(np.asarray(out)[0])
    decoded = np.stack(decoded)

    cfg = melspec.MelConfig.for_rate(16000, config.NUM_FEATURES)
    ein, edec = melspec.LogMelExtractorRef(cfg), melspec.LogMelExtractorRef(cfg)
    lsds = []
    for t in range(num_hops):
        fi = ein.extract(x[t])
        fd = edec.extract(decoded[t])
        lsds.append(dsp_utils.log_spectral_distance(fi, fd))
    lsds = np.array(lsds)
    assert lsds.max() < 2.0, f"max LSD {lsds.max():.3f} at hop {lsds.argmax()}"
