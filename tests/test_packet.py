import numpy as np
import pytest

from lyra_tpu import config, packet


def test_bitstring_roundtrip_64():
    bits = "01" * 32  # 64 bits
    packed = packet.pack_bitstring(bits)
    assert len(packed) == 8
    assert packet.unpack_bitstring(packed, 64) == bits


def test_tail_byte_padding_matches_reference():
    # 184 bits -> 23 bytes: exact fit. 120 bits -> 15 bytes: exact fit.
    # A non-multiple example: 12 bits -> 2 bytes, the 4 unused bits must sit in
    # the LOW positions of the final byte (reference: lyra/packet.h:108-118).
    bits = "111111111111"  # 12 ones
    packed = packet.pack_bitstring(bits)
    assert packed == bytes([0xFF, 0xF0])
    assert packet.unpack_bitstring(packed, 12) == bits


def test_indices_bitstring_msb_first():
    # First quantizer stage goes in the most significant bits
    # (reference: lyra/residual_vector_quantizer.cc:101-109).
    idx = [0xA, 0x1, 0xF]
    bits = packet.indices_to_bitstring(idx)
    assert bits == "1010" + "0001" + "1111"
    np.testing.assert_array_equal(packet.bitstring_to_indices(bits), idx)


def test_pack_indices_roundtrip_all_bitrates():
    rng = np.random.default_rng(0)
    for bits in config.SUPPORTED_QUANTIZED_BITS:
        n_stages = bits // config.BITS_PER_QUANTIZER
        idx = rng.integers(0, 16, size=n_stages)
        p = packet.pack_indices(idx, bits)
        assert len(p) == config.packet_size(bits)
        np.testing.assert_array_equal(packet.unpack_indices(p), idx)


def test_batch_matches_scalar():
    rng = np.random.default_rng(1)
    for bits in config.SUPPORTED_QUANTIZED_BITS:
        n_stages = bits // config.BITS_PER_QUANTIZER
        idx = rng.integers(0, 16, size=(17, n_stages)).astype(np.int32)
        batch = packet.pack_indices_batch(idx, bits)
        assert batch.shape == (17, config.packet_size(bits))
        for i in range(17):
            assert bytes(batch[i]) == packet.pack_indices(idx[i], bits)
        back = packet.unpack_indices_batch(batch, bits)
        np.testing.assert_array_equal(back, idx)


def test_native_matches_numpy():
    """The C++ batch packer (native/packet_ops.cc) must agree bit-for-bit
    with the numpy oracle across all bitrates and padded-stride inputs."""
    from lyra_tpu.utils import native

    lib = native.load()
    assert lib is not None, "native library failed to build"
    rng = np.random.default_rng(2)
    for bits in config.SUPPORTED_QUANTIZED_BITS:
        n_stages = bits // config.BITS_PER_QUANTIZER
        # -1 padding beyond n_stages must be ignored by pack.
        idx = np.full((33, config.MAX_NUM_QUANTIZERS), -1, np.int32)
        idx[:, :n_stages] = rng.integers(0, 16, size=(33, n_stages))
        a = packet._pack_indices_batch_native(lib, idx, bits)
        b = packet.pack_indices_batch_np(idx, bits)
        np.testing.assert_array_equal(a, b)
        ua = packet._unpack_indices_batch_native(lib, a, bits)
        ub = packet.unpack_indices_batch_np(a, bits)
        np.testing.assert_array_equal(ua, ub)
        np.testing.assert_array_equal(ua, idx[:, :n_stages])


def test_native_rejects_out_of_range_index():
    from lyra_tpu.utils import native

    lib = native.load()
    assert lib is not None
    bad = np.full((1, 16), 99, np.int32)
    with pytest.raises(ValueError):
        packet._pack_indices_batch_native(lib, bad, 64)


def test_unpack_wrong_length_raises():
    with pytest.raises(ValueError):
        packet.unpack_bitstring(b"\x00" * 3, 64)
    with pytest.raises(ValueError):
        packet.unpack_indices(b"\x00" * 7)


def test_device_wire_codec_matches_host_codec():
    """The jax device-side nibble pack/unpack must be bit-identical to the
    host batch codec at every bitrate (the wire format is whole 4-bit
    stages, reference: lyra/lyra_config.h:119-168)."""
    import jax

    rng = np.random.default_rng(5)
    for bits in (64, 120, 184):
        n = bits // config.BITS_PER_QUANTIZER
        idx = rng.integers(0, 16, (9, 46)).astype(np.int32)
        host = packet.pack_indices_batch(idx[:, :n], bits)
        dev = np.asarray(
            jax.jit(lambda i, b=bits: packet.pack_wire_device(i, b))(idx))
        np.testing.assert_array_equal(host, dev)
        back = np.asarray(
            jax.jit(lambda p, b=bits: packet.unpack_wire_device(p, b))(dev))
        np.testing.assert_array_equal(back, idx[:, :n])
    with pytest.raises(ValueError):
        packet.pack_wire_device(np.zeros((1, 46), np.int32), 60)


def test_mixed_device_wire_codec_matches_host_codec():
    """pack_wire_device_mixed: each row's first size bytes must equal its
    own-rate host packet, tail bytes zero; unpack_wire_device_mixed must
    restore the indices with -1 beyond each row's own stages."""
    import jax

    rng = np.random.default_rng(6)
    bits_rows = np.array([64, 184, 120, 64, 184], np.int32)
    nq = bits_rows // config.BITS_PER_QUANTIZER
    idx = rng.integers(0, 16, (5, 46)).astype(np.int32)
    # un-run stages carry the engine's -1 marker; the mixed pack must mask
    # them to zero, not wrap them to 0xF
    for r, n in enumerate(nq):
        idx[r, n:] = -1

    wire = np.asarray(jax.jit(
        lambda i, q: packet.pack_wire_device_mixed(i, q, 184))(idx, nq))
    assert wire.shape == (5, 23)
    for r, bits in enumerate(bits_rows):
        size = (int(bits) + 7) // 8
        host = packet.pack_indices_batch(idx[r:r + 1, :nq[r]], int(bits))
        np.testing.assert_array_equal(wire[r, :size], host[0])
        assert not wire[r, size:].any()

    back = np.asarray(jax.jit(packet.unpack_wire_device_mixed)(wire, nq))
    for r, n in enumerate(nq):
        np.testing.assert_array_equal(back[r, :n], idx[r, :n])
        assert (back[r, n:] == -1).all()


def test_red_framing_roundtrip_and_refusals():
    """RED wire framing [len][cur][len][prev]: exact round trip, empty
    blocks valid (stream start, DTX empty packets), ragged payloads
    refused loudly (a short datagram is garbage, never a quieter
    packet)."""
    cases = [(b"\x01" * 8, b"\x02" * 8), (b"\x03" * 23, b""),
             (b"", b"\x04" * 15), (b"", b"")]
    for cur, prev in cases:
        assert packet.parse_red(packet.build_red(cur, prev)) == (cur, prev)
    with pytest.raises(ValueError):
        packet.parse_red(b"\x08" + b"x" * 4)  # primary overruns
    with pytest.raises(ValueError):
        packet.parse_red(b"\x02xx\x05xx")  # blocks don't tile
    with pytest.raises(ValueError):
        packet.parse_red(b"\x00")  # shorter than the prefixes
    with pytest.raises(ValueError):
        packet.build_red(b"x" * 256)  # exceeds the 1-byte prefix


def test_red_batch_matches_scalar():
    """The vectorized tick-matrix RED builder agrees byte-for-byte with
    the scalar framing across mixed per-row sizes (a mixed-bitrate
    fleet's downlink)."""
    rng = np.random.default_rng(3)
    sizes = np.array([8, 15, 23, 0, 8, 23], np.int64)
    prev_sizes = np.array([8, 8, 23, 15, 0, 0], np.int64)
    cur = np.zeros((6, 23), np.uint8)
    prev = np.zeros((6, 23), np.uint8)
    for r in range(6):
        cur[r, :sizes[r]] = rng.integers(0, 256, sizes[r])
        prev[r, :prev_sizes[r]] = rng.integers(0, 256, prev_sizes[r])
    red, red_sizes = packet.build_red_batch(cur, sizes, prev, prev_sizes)
    assert red.shape == (6, 2 + 2 * 23)
    for r in range(6):
        want = packet.build_red(bytes(cur[r, :sizes[r]]),
                                bytes(prev[r, :prev_sizes[r]]))
        assert red_sizes[r] == len(want) == 2 + sizes[r] + prev_sizes[r]
        assert bytes(red[r, :red_sizes[r]]) == want
        assert not red[r, red_sizes[r]:].any()
