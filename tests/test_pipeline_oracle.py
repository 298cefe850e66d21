"""Pipeline-vs-pipeline fidelity oracle.

The integration tests bound decode quality against the *input* (LSD < 2.0,
mirroring lyra/lyra_integration_test.cc:132-142).  This file pins the far
tighter oracle: decoding the *same packet stream* with (a) the TFLite
interpreter chain — the reference's compute engine — and (b) lyra_tpu must
produce nearly identical audio (per-hop LSD ≪ the 2.0 vs-input bar), across
all bitrates, multi-second material, a packet-loss burst (PLC + fade into
comfort noise), and both float and bf16 compute modes.

Chain (b) is the production LyraDecoder facade.  Chain (a) reuses the same
facade control logic (whose PLC state machine is pinned against the
reference's documented state graph in tests/test_decoder_plc.py) but swaps
the two learned-model hop kernels for TFLite interpreter invocations —
the "test peer" pattern the reference uses to inject fakes
(lyra/lyra_decoder_test.cc:52-91).  Any divergence is therefore exactly the
divergence of our model lowering vs the interpreter, integrated over a real
decode.
"""

import numpy as np
import pytest

from lyra_tpu import config
from lyra_tpu.codec.decoder import LyraDecoder
from lyra_tpu.codec.encoder import LyraEncoder
from lyra_tpu.dsp import melspec
from lyra_tpu.dsp import utils as dsp_utils
from lyra_tpu.utils import wav

tf = pytest.importorskip("tensorflow")

HOP = 320  # 16 kHz internal rate
BURST = range(50, 65)  # 1.0 s .. 1.3 s: deep enough to reach comfort noise


def _interpreter_chain_decoder(model_path: str, seed: int) -> LyraDecoder:
    """LyraDecoder whose RVQ-decode and LyraGAN hops run in the TFLite
    interpreter (builtin kernels, fresh variable state)."""
    dec = LyraDecoder(16000, model_path=model_path, seed=seed)
    resolver = tf.lite.experimental.OpResolverType.BUILTIN_WITHOUT_DEFAULT_DELEGATES
    gan = tf.lite.Interpreter(
        model_path=f"{model_path}/lyragan.tflite",
        experimental_op_resolver_type=resolver,
    ).get_signature_runner("serving_default")
    rvq = tf.lite.Interpreter(
        model_path=f"{model_path}/quantizer.tflite",
        experimental_op_resolver_type=resolver,
    ).get_signature_runner("decode")

    def gan_hop(features: np.ndarray) -> np.ndarray:
        unit = gan(input_audio=np.asarray(
            features, np.float32).reshape(1, 1, -1))["output_0"][0]
        return dsp_utils.unit_to_int16_np(unit).astype(np.int16)

    def rvq_decode(padded: np.ndarray) -> np.ndarray:
        idx = np.asarray(padded, np.int32).reshape(-1, 1, 1)
        return rvq(encoding_indices=idx)["output_0"].reshape(1, -1)

    dec._model._hop_fn = gan_hop  # the facade's generative-model seam
    dec._rvq_decode = rvq_decode
    return dec


def _decode_stream(dec: LyraDecoder, packets) -> np.ndarray:
    hops = []
    for pkt in packets:
        if pkt is not None:
            assert dec.set_encoded_packet(pkt)
        out = dec.decode_samples(HOP)
        assert out is not None
        hops.append(out)
    return np.stack(hops)


def _per_hop_lsd(a: np.ndarray, b: np.ndarray) -> np.ndarray:
    cfg = melspec.MelConfig.for_rate(16000, config.NUM_FEATURES)
    ea, eb = melspec.LogMelExtractorRef(cfg), melspec.LogMelExtractorRef(cfg)
    return np.array([
        dsp_utils.log_spectral_distance(ea.extract(a[t]), eb.extract(b[t]))
        for t in range(a.shape[0])
    ])


@pytest.mark.parametrize("bitrate", [
    3200,  # quick tier keeps one bitrate of the chain oracle
    pytest.param(6000, marks=pytest.mark.full),
    pytest.param(9200, marks=pytest.mark.full),
])
def test_decode_matches_interpreter_chain(model_path, testdata_path, bitrate):
    data = wav.read_wav_int16(f"{testdata_path}/sample1_16kHz.wav")
    num_hops = min(3 * 16000 // HOP, len(data.samples) // HOP)
    x = data.samples[: num_hops * HOP].reshape(num_hops, HOP)

    enc = LyraEncoder(16000, bitrate=bitrate, model_path=model_path)
    packets = [
        None if t in BURST else enc.encode(x[t]) for t in range(num_hops)
    ]
    assert all(p for p in packets if p is not None)

    ref_audio = _decode_stream(
        _interpreter_chain_decoder(model_path, seed=0), packets)

    # ≪ the 2.0 vs-input bar: the two pipelines decode the same packets.
    # int8 mode is the bit-exact lowering (residual = rare f32 rounding
    # flips at island boundaries); float/bf16 additionally dequantize the
    # int8 islands, which costs a few tenths of a dB on warm-up hops.
    bars = {"float": (0.25, 1.0), "bf16": (0.25, 1.0), "int8": (0.05, 0.3)}
    for mode, (mean_bar, max_bar) in bars.items():
        got_audio = _decode_stream(
            LyraDecoder(16000, model_path=model_path, mode=mode, seed=0),
            packets)
        lsd = _per_hop_lsd(ref_audio, got_audio)
        assert lsd.mean() < mean_bar, (mode, lsd.mean())
        assert lsd.max() < max_bar, (mode, lsd.max(), int(lsd.argmax()))
