"""Serving runtime tests: slot admission, mixed bitrates, loss handling."""

import numpy as np
import pytest

from lyra_tpu import config
from lyra_tpu.codec.engine import INTERNAL_HOP
from lyra_tpu.tools.stream_server import DecoderServer, EncoderServer


@pytest.fixture(scope="module")
def servers(model_path):
    return (EncoderServer(4, model_path=model_path, bitrate=3200),
            DecoderServer(4, model_path=model_path))


def test_roundtrip_with_admission_and_loss(servers, testdata_path):
    from lyra_tpu.utils import wav

    enc, dec = servers
    data = wav.read_wav_int16(f"{testdata_path}/sample1_16kHz.wav")
    x = data.samples[: 10 * INTERNAL_HOP].reshape(10, INTERNAL_HOP)

    enc.add_stream("a")
    enc.add_stream("b", bitrate=9200)
    dec.add_stream("a")
    dec.add_stream("b")
    assert enc.num_active == dec.num_active == 2

    for t in range(6):
        pkts = enc.tick({"a": x[t], "b": x[t]})
        assert len(pkts["a"]) == config.packet_size(64)
        assert len(pkts["b"]) == config.packet_size(184)
        if t == 3:
            pkts["b"] = None  # lose one packet for stream b
        audio = dec.tick(pkts)
        assert audio["a"].shape == (INTERNAL_HOP,)
        assert audio["b"].dtype == np.int16
    assert not dec.is_comfort_noise("a")

    # Evict "a", admit "c" into the freed slot: fresh state, same program.
    enc.remove_stream("a")
    dec.remove_stream("a")
    slot = enc.add_stream("c")
    dec.add_stream("c")
    assert slot == 0
    pkts = enc.tick({"b": x[6], "c": x[6]})
    audio = dec.tick(pkts)
    assert set(audio) == {"b", "c"}


def test_capacity_and_duplicate_errors(model_path):
    enc = EncoderServer(1, model_path=model_path)
    enc.add_stream("x")
    with pytest.raises(KeyError):
        enc.add_stream("x")
    with pytest.raises(RuntimeError):
        enc.add_stream("y")
    with pytest.raises(ValueError):
        enc.set_bitrate("x", 1234)


def test_decoder_comfort_noise_after_sustained_loss(servers):
    _, dec = servers
    dec_ids = list(dec._by_id)
    target = dec_ids[0]
    for _ in range(10):
        dec.tick({sid: None for sid in dec_ids})
    assert dec.is_comfort_noise(target)


def test_malformed_packet_is_treated_as_loss(model_path):
    dec = DecoderServer(2, model_path=model_path)
    dec.add_stream("good")
    dec.add_stream("evil")
    valid = bytes(config.packet_size(64))
    # Wrong length (not a supported packet size) must not raise out of
    # tick(): the stream gets PLC for the hop, the batch keeps running.
    audio = dec.tick({"good": valid, "evil": b"\x01\x02\x03"})
    assert set(audio) == {"good", "evil"}
    assert dec.bad_packets[dec._by_id["evil"]] == 1
    assert dec.bad_packets[dec._by_id["good"]] == 0
