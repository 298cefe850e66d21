"""Golden-packet byte equality.

VERDICT round-1 stretch item: byte-identical packets vs the reference
pipeline.  Two parts:

1. The shipped `.lyra` fixtures are *synthetic*, not encodings of the
   shipped test audio: `two_encoded_packets_16khz.lyra` is the byte 0x64
   followed by 31 zero bytes (and is not even a whole number of the
   15-byte packets `decoder_main_lib_test.cc` decodes it as at 6000 bps).
   A real RVQ encoding of speech has high-entropy indices in every stage;
   119 consecutive zero bits cannot arise from the shipped wavs.  A test
   pins this proof so the claim stays checked against the tree.

2. The achievable — and stronger — form of byte equality: encoding real
   speech through (a) the TFLite interpreter chain (builtin kernels:
   soundstream → RVQ encode signature) and (b) the int8-exact
   EncoderEngine produces byte-identical wire packets, hop for hop, at
   every bitrate.  This subsumes what re-encoding the fixture would have
   shown.
"""

import numpy as np
import pytest

from lyra_tpu import config, packet
from lyra_tpu.codec.engine import EncoderEngine
from lyra_tpu.dsp import utils as dsp_utils
from lyra_tpu.utils import wav

tf = pytest.importorskip("tensorflow")


def test_shipped_lyra_fixtures_are_synthetic(testdata_path):
    """Proof the golden bitstream fixtures don't derive from shipped audio:
    all-zero payload after a single 0x64 marker byte, with a length that
    isn't a multiple of the 6000 bps packet size they are decoded as."""
    with open(f"{testdata_path}/one_encoded_packet_16khz.lyra", "rb") as f:
        one = f.read()
    assert one[0] == 0x64 and set(one[1:]) == {0} and len(one) == 16
    with open(f"{testdata_path}/two_encoded_packets_16khz.lyra", "rb") as f:
        two = f.read()
    assert two == one * 2  # literally the one-packet blob duplicated
    assert len(two) % config.bitrate_to_packet_size(6000) != 0


@pytest.mark.parametrize("bitrate", [3200, 6000, 9200])
def test_packets_byte_identical_to_interpreter_chain(
        model_path, testdata_path, bitrate):
    resolver = (tf.lite.experimental.OpResolverType
                .BUILTIN_WITHOUT_DEFAULT_DELEGATES)
    ss = tf.lite.Interpreter(
        model_path=f"{model_path}/soundstream_encoder.tflite",
        experimental_op_resolver_type=resolver,
    ).get_signature_runner("serving_default")
    rvq = tf.lite.Interpreter(
        model_path=f"{model_path}/quantizer.tflite",
        experimental_op_resolver_type=resolver,
    ).get_signature_runner("encode")

    data = wav.read_wav_int16(f"{testdata_path}/sample1_16kHz.wav")
    hops = min(50, data.samples.size // 320)
    x = data.samples[: hops * 320].reshape(hops, 320)

    eng = EncoderEngine(16000, model_path, mode="int8")
    st = eng.init_state(1)
    bits = config.bitrate_to_num_quantized_bits(bitrate)
    nq = bits // config.BITS_PER_QUANTIZER

    for t in range(hops):
        unit = dsp_utils.int16_to_unit_np(x[t]).astype(np.float32)
        feats = ss(input_audio=unit[None])["output_0"]
        ref_idx = rvq(input_frames=feats,
                      num_quantizers=np.int32(nq))["output_0"].ravel()[:nq]
        idx, _, st = eng.step(st, x[t].astype(np.float32)[None],
                              np.array([nq], np.int32))
        ref_pkt = packet.pack_indices(ref_idx.astype(np.int32), bits)
        my_pkt = packet.pack_indices(np.asarray(idx)[0, :nq], bits)
        assert my_pkt == ref_pkt, f"hop {t}: packet bytes diverge"
