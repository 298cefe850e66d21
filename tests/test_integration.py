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


@pytest.mark.full
def test_long_run_stability_under_random_loss(model_path, testdata_path):
    """Soak: ~20 s of looped speech through the batched engines with 20%
    random loss and a mid-run bitrate mix.  Pins that the recurrent state
    never blows up (no NaN/inf anywhere in the state tree, audio stays in
    int16 range, LSD on received frames stays under the bar) — drift over
    hundreds of hops is exactly what short parity tests cannot see."""
    import jax

    from lyra_tpu import config
    from lyra_tpu.codec.engine import DecoderEngine, EncoderEngine
    from lyra_tpu.dsp import melspec
    from lyra_tpu.dsp import utils as dsp_utils
    from lyra_tpu.utils import wav

    data = wav.read_wav_int16(f"{testdata_path}/sample1_16kHz.wav")
    hop = 320
    n = len(data.samples) // hop
    frames = data.samples[: n * hop].reshape(n, hop).astype(np.float32)
    ticks = 6 * n  # ~20 s

    enc = EncoderEngine(16000, model_path, mode="bf16")
    dec = DecoderEngine(16000, model_path, mode="bf16")
    b = 2  # stream 0: 3.2 kbps; stream 1: 9.2 kbps
    nq = np.array([64 // config.BITS_PER_QUANTIZER,
                   184 // config.BITS_PER_QUANTIZER], np.int32)
    es, ds = enc.init_state(b), dec.init_state(b)
    rng = np.random.default_rng(11)

    cfg = melspec.MelConfig.for_rate(16000, config.NUM_FEATURES)
    ein = [melspec.LogMelExtractorRef(cfg) for _ in range(b)]
    eout = [melspec.LogMelExtractorRef(cfg) for _ in range(b)]
    lsds = []
    for t in range(ticks):
        x = np.broadcast_to(frames[t % n], (b, hop)).copy()
        idx, _, es = enc.step(es, x, nq)
        received = rng.uniform(size=b) >= 0.2
        audio, _, ds = dec.step(ds, np.asarray(idx), received)
        audio = np.asarray(audio)
        assert np.isfinite(audio).all(), f"non-finite audio at tick {t}"
        # clip_to_int16 clamps to [-32768, 32767]; both rails are legal.
        assert audio.max() <= 32767 and audio.min() >= -32768, \
            f"out-of-range sample at tick {t}"
        for i in range(b):
            fin = ein[i].extract(x[i])
            fdec = eout[i].extract(audio[i])
            if received[i]:
                lsds.append(dsp_utils.log_spectral_distance(fin, fdec))

    # Received-frame quality holds over the whole soak (loss pollutes the
    # hops right after a burst via the model's recurrent state, so the bar
    # is the mean, reference: lyra_integration_test.cc:132-142).
    assert float(np.mean(lsds[3:])) < 2.0
    # The recurrent state itself stays finite everywhere.
    for leaf in jax.tree.leaves(ds) + jax.tree.leaves(es):
        arr = np.asarray(leaf)
        if arr.dtype.kind == "f":
            assert np.isfinite(arr.astype(np.float32)).all()


def test_fp8_boundary_store_quality_and_refusals(model_path, testdata_path):
    """boundary_store="f8" (fp8 e4m3 layer-boundary storage) is a measured
    serving REGRESSION (PERF.md round 4: the converts do not fuse into
    conv operands), kept opt-in as the probe reproducer — so pin that the
    path still computes valid audio (per-hop LSD under the reference's
    2.0 bar despite quantizing every boundary) and that misconfiguration
    fails loudly."""
    from lyra_tpu.tflite.executor import load_graph

    data = wav.read_wav_int16(f"{testdata_path}/sample1_16kHz.wav")
    hop = config.num_samples_per_hop(16000)
    num_hops = min(50, len(data.samples) // hop)
    x = data.samples[: num_hops * hop].reshape(num_hops, hop)

    encoder = SoundStreamEncoder(model_path, mode="bf16",
                                 boundary_store="f8")
    decoder = LyraGanModel(model_path, mode="bf16", boundary_store="f8")
    rvq = ResidualVectorQuantizer.from_model_path(model_path)
    nq = 184 // config.BITS_PER_QUANTIZER

    @jax.jit
    def step(es, ds, frame_i16):
        feats, es = encoder.extract(es, dsp_utils.int16_to_unit(frame_i16))
        lossy = rvq.decode(rvq.quantize(feats, nq))
        samples, ds = decoder.decode_hop(ds, lossy)
        return dsp_utils.unit_to_int16(samples), es, ds

    es, ds = encoder.init_state(1), decoder.init_state(1)
    decoded = []
    for t in range(num_hops):
        out, es, ds = step(es, ds, x[t][None])
        decoded.append(np.asarray(out)[0])

    cfg = melspec.MelConfig.for_rate(16000, config.NUM_FEATURES)
    ein, edec = melspec.LogMelExtractorRef(cfg), melspec.LogMelExtractorRef(cfg)
    lsds = np.array([
        dsp_utils.log_spectral_distance(ein.extract(x[t]),
                                        edec.extract(decoded[t]))
        for t in range(num_hops)])
    assert lsds[3:].max() < 2.0, f"fp8-boundary max LSD {lsds.max():.3f}"

    # Misconfiguration is refused at construction, never silently ignored.
    path = f"{model_path}/lyragan.tflite"
    with pytest.raises(ValueError):
        load_graph(path, mode="int8", boundary_store="f8")
    with pytest.raises(ValueError):
        load_graph(path, boundary_store="int4")
    with pytest.raises(ValueError):
        load_graph(path, boundary_store="f8", boundary_scale=0.3)
    with pytest.raises(ValueError):
        LyraGanModel(model_path, backend="fused", boundary_store="f8")
