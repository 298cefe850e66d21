import os

import pytest

from lyra_tpu import config


def test_bitrate_bits_packet_math():
    # 64 bits -> 8 bytes -> 3200 bps; 120 -> 15 -> 6000; 184 -> 23 -> 9200.
    assert config.packet_size(64) == 8
    assert config.packet_size(120) == 15
    assert config.packet_size(184) == 23
    assert config.bitrate(64) == 3200
    assert config.bitrate(120) == 6000
    assert config.bitrate(184) == 9200
    assert config.SUPPORTED_BITRATES == (3200, 6000, 9200)


def test_packet_size_roundtrip():
    for bits in config.SUPPORTED_QUANTIZED_BITS:
        assert config.packet_size_to_num_quantized_bits(config.packet_size(bits)) == bits
    assert config.packet_size_to_num_quantized_bits(7) == -1


def test_bitrate_to_bits():
    assert config.bitrate_to_num_quantized_bits(3200) == 64
    assert config.bitrate_to_num_quantized_bits(6000) == 120
    assert config.bitrate_to_num_quantized_bits(9200) == 184
    assert config.bitrate_to_num_quantized_bits(1234) == -1


def test_samples_per_hop():
    assert config.num_samples_per_hop(16000) == 320
    assert config.num_samples_per_hop(48000) == 960
    assert config.num_samples_per_window(16000) == 640
    with pytest.raises(ValueError):
        config.num_samples_per_hop(44111)


def test_version():
    assert config.version_string() == "1.3.2"


def test_check_params_supported(model_path):
    config.check_params_supported(16000, 1, model_path)
    with pytest.raises(ValueError):
        config.check_params_supported(44100, 1, model_path)
    with pytest.raises(ValueError):
        config.check_params_supported(16000, 2, model_path)
    with pytest.raises(ValueError):
        config.check_params_supported(16000, 1, "/nonexistent")


def test_identifier_parse(model_path):
    with open(os.path.join(model_path, "lyra_config.binarypb"), "rb") as f:
        blob = f.read()
    assert config._parse_identifier_varint(blob) == config.VERSION_MINOR
