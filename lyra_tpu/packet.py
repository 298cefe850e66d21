"""Wire-format packet packing/unpacking.

Bit layout parity with the reference (reference: lyra/packet.h:91-146 and
lyra/residual_vector_quantizer.cc:101-157): a frame's RVQ stage indices are
laid out MSB-first — the *first* quantizer stage occupies the most significant
bits — then packed into ceil(bits/8) bytes, with any unused bits sitting in the
low positions of the final byte.

Two implementations are provided:
  * numpy vectorized (works on whole batches of frames at once) — the default
    host-side path for the batched stream engine;
  * a pure-scalar path used for clarity/tests.

There are no headers in the current wire format (NUM_HEADER_BITS == 0), and the
packet size alone signals the bitrate.
"""

from __future__ import annotations

import numpy as np

from lyra_tpu import config


def indices_to_bitstring(indices, bits_per_stage: int = config.BITS_PER_QUANTIZER) -> str:
    """RVQ stage indices → '0'/'1' string, first stage in the MSBs."""
    out = []
    for idx in indices:
        idx = int(idx)
        if idx < 0 or idx >= (1 << bits_per_stage):
            raise ValueError(f"index {idx} out of range for {bits_per_stage} bits")
        out.append(format(idx, f"0{bits_per_stage}b"))
    return "".join(out)


def bitstring_to_indices(bits: str, bits_per_stage: int = config.BITS_PER_QUANTIZER):
    if len(bits) % bits_per_stage != 0:
        raise ValueError(
            f"bitstring length {len(bits)} not divisible by {bits_per_stage}"
        )
    n = len(bits) // bits_per_stage
    return np.array(
        [int(bits[i * bits_per_stage : (i + 1) * bits_per_stage], 2) for i in range(n)],
        dtype=np.int32,
    )


def pack_bitstring(bits: str) -> bytes:
    """'0'/'1' string → bytes, MSB-first, zero-padded at the tail."""
    n_bytes = -(-len(bits) // 8)
    padded = bits.ljust(n_bytes * 8, "0")
    return int(padded, 2).to_bytes(n_bytes, "big") if bits else b""


def unpack_bitstring(packet: bytes, num_bits: int) -> str:
    if len(packet) != -(-num_bits // 8):
        raise ValueError(f"Packet of unexpected length: {len(packet)}")
    as_int = int.from_bytes(packet, "big")
    total = len(packet) * 8
    return format(as_int, f"0{total}b")[:num_bits]


def pack_indices(indices, num_bits: int) -> bytes:
    """Stage indices for one frame → wire packet bytes."""
    n_stages = num_bits // config.BITS_PER_QUANTIZER
    if len(indices) < n_stages:
        raise ValueError(
            f"{len(indices)} stage indices cannot fill {num_bits} bits "
            f"({n_stages} stages)")
    return pack_bitstring(indices_to_bitstring(indices[:n_stages]))


def unpack_indices(packet: bytes) -> np.ndarray:
    """Wire packet → stage indices; bitrate inferred from packet size."""
    num_bits = config.packet_size_to_num_quantized_bits(len(packet))
    if num_bits < 0:
        raise ValueError(f"unrecognized packet size {len(packet)}")
    return bitstring_to_indices(unpack_bitstring(bytes(packet), num_bits))


# ----------------------------------------------------------------------------
# Batched paths — used by the stream engine (thousands of frames/call).
# The hot implementation is native C++ (native/packet_ops.cc, loaded via
# ctypes); the numpy versions below are the portable fallback and the test
# oracle for the native code.
# ----------------------------------------------------------------------------


def pack_indices_batch(indices: np.ndarray, num_bits: int) -> np.ndarray:
    """[B, n_stages] int32 stage indices → [B, packet_size] uint8 packets."""
    from lyra_tpu.utils import native

    lib = native.load()
    if lib is not None:
        return _pack_indices_batch_native(lib, indices, num_bits)
    return pack_indices_batch_np(indices, num_bits)


def unpack_indices_batch(packets: np.ndarray, num_bits: int) -> np.ndarray:
    """[B, packet_size] uint8 → [B, n_stages] int32 stage indices."""
    from lyra_tpu.utils import native

    lib = native.load()
    if lib is not None:
        return _unpack_indices_batch_native(lib, packets, num_bits)
    return unpack_indices_batch_np(packets, num_bits)


def _pack_indices_batch_native(lib, indices: np.ndarray, num_bits: int) -> np.ndarray:
    import ctypes

    bps = config.BITS_PER_QUANTIZER
    n_stages = num_bits // bps
    idx = np.ascontiguousarray(indices, np.int32)
    b, stride = idx.shape
    out = np.empty((b, config.packet_size(num_bits)), np.uint8)
    rc = lib.lyra_pack_indices_batch(
        idx.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)), b, stride,
        n_stages, bps,
        out.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)), out.shape[1])
    if rc != 0:
        raise ValueError(f"native pack failed (rc={rc}): index out of range?")
    return out


def _unpack_indices_batch_native(lib, packets: np.ndarray, num_bits: int) -> np.ndarray:
    import ctypes

    bps = config.BITS_PER_QUANTIZER
    n_stages = num_bits // bps
    pkts = np.ascontiguousarray(packets, np.uint8)
    b, size = pkts.shape
    out = np.empty((b, n_stages), np.int32)
    rc = lib.lyra_unpack_indices_batch(
        pkts.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)), b, size,
        n_stages, bps,
        out.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)))
    if rc != 0:
        raise ValueError(f"native unpack failed (rc={rc})")
    return out


def pack_indices_batch_np(indices: np.ndarray, num_bits: int) -> np.ndarray:
    """[B, n_stages] int32 stage indices → [B, packet_size] uint8 packets.

    Vectorized numpy equivalent of per-frame pack_indices.
    """
    bps = config.BITS_PER_QUANTIZER
    n_stages = num_bits // bps
    indices = np.asarray(indices)
    if indices.shape[1] < n_stages:
        # Match the native codec's rc=1 rejection: silently clamping would
        # emit wrong-size packets the decoder counts as drops, with no
        # error at the sender.
        raise ValueError(
            f"indices have {indices.shape[1]} stages, need {n_stages} "
            f"for {num_bits} bits")
    used = indices[:, :n_stages]
    if used.min(initial=0) < 0 or used.max(initial=0) >= (1 << bps):
        raise ValueError(
            f"stage index out of range for {bps} bits in packed batch")
    idx = used.astype(np.uint8)
    # Expand each stage index into its bits, MSB of stage first.
    shifts = np.arange(bps - 1, -1, -1, dtype=np.uint8)
    bits = (idx[:, :, None] >> shifts[None, None, :]) & 1  # [B, n_stages, bps]
    bits = bits.reshape(idx.shape[0], n_stages * bps)
    pad = (-bits.shape[1]) % 8
    if pad:
        bits = np.pad(bits, ((0, 0), (0, pad)))
    return np.packbits(bits, axis=1)


def unpack_indices_batch_np(packets: np.ndarray, num_bits: int) -> np.ndarray:
    """[B, packet_size] uint8 → [B, n_stages] int32 stage indices."""
    bps = config.BITS_PER_QUANTIZER
    n_stages = num_bits // bps
    bits = np.unpackbits(np.asarray(packets, dtype=np.uint8), axis=1)[:, :num_bits]
    bits = bits.reshape(-1, n_stages, bps)
    weights = (1 << np.arange(bps - 1, -1, -1)).astype(np.int32)
    return (bits.astype(np.int32) * weights[None, None, :]).sum(-1)


# ---- device-side wire codec (jax) -------------------------------------------
#
# Every supported bitrate's packet is whole 4-bit stages with no header and
# no padding (64/120/184 bits = 16/30/46 nibbles = 8/15/23 bytes exactly,
# reference: lyra/lyra_config.h:119-168, lyra/packet.h:91-146), so the wire
# format is a pure MSB-first nibble interleave: byte i = stage[2i]<<4 |
# stage[2i+1].  That means the TPU can emit/consume *actual wire bytes*:
# a serving host then moves half the bytes per stream over the
# interconnect (vs int8-per-stage index transfers) and does zero
# per-packet bit work — its job reduces to row slicing and network IO.


def pack_wire_device(indices, num_bits: int):
    """[B, >=n_stages] int32 stage indices → [B, packet_size] uint8 wire
    bytes, on device (jax).  Bit-identical to pack_indices_batch for valid
    inputs.

    Caveat (unlike the host codecs, which raise): values outside [0, 15)
    in the packed region cannot be detected inside a jitted program — they
    wrap to their low nibble (−1 packs as 0xF).  The packed region must be
    real quantizer output, i.e. num_bits must match the nq the indices
    were quantized with (the servers' tick_wire guarantees this)."""
    import jax.numpy as jnp

    bps = config.BITS_PER_QUANTIZER
    if bps != 4 or num_bits % 8:
        raise ValueError("device wire codec requires whole-byte 4-bit stages")
    n_stages = num_bits // bps
    idx = indices[:, :n_stages].astype(jnp.uint8)
    return (idx[:, 0::2] << 4) | (idx[:, 1::2] & 0xF)


def unpack_wire_device(packets, num_bits: int):
    """[B, packet_size] uint8 wire bytes → [B, n_stages] int32, on device.
    Bit-identical to unpack_indices_batch."""
    import jax.numpy as jnp

    bps = config.BITS_PER_QUANTIZER
    if bps != 4 or num_bits % 8:
        raise ValueError("device wire codec requires whole-byte 4-bit stages")
    b = packets.astype(jnp.uint8)
    hi = (b >> 4).astype(jnp.int32)
    lo = (b & 0xF).astype(jnp.int32)
    return jnp.stack([hi, lo], axis=-1).reshape(b.shape[0], -1)


# ---- mixed-bitrate device wire codec ----------------------------------------
#
# Every supported rate's wire bytes are a *prefix* of the next rate's layout
# (16/30/46 four-bit stages = 8/15/23 whole bytes, stages nibble-paired
# byte-aligned at every rate), so a mixed-bitrate fleet packs into rows of
# the fleet's widest packet with per-row stage masks — each row's first
# `sizes[i]` bytes are bit-identical to its own-rate packet and the tail is
# zero, exactly the tick_packed contract (reference: lyra/lyra_config.h:
# 119-168 packet sizes; lyra/lyra_encoder.h:44-101 per-stream set_bitrate).


def pack_wire_device_mixed(indices, nq_row, max_num_bits: int):
    """[B, >=n_stages] int32 indices + [B] int32 per-row stage counts →
    [B, packet_size(max_num_bits)] uint8 wire bytes, on device (jax).

    Row i's first packet_size(nq_row[i]*4) bytes are bit-identical to
    pack_indices_batch(indices[i], nq_row[i]*4); bytes beyond are zero
    (stages >= nq_row[i] are masked before the nibble interleave, which
    also neutralizes the engine's -1 padding for un-run stages)."""
    import jax.numpy as jnp

    bps = config.BITS_PER_QUANTIZER
    if bps != 4 or max_num_bits % 8:
        raise ValueError("device wire codec requires whole-byte 4-bit stages")
    n_stages = max_num_bits // bps
    stage = jnp.arange(n_stages)
    idx = jnp.where(stage[None, :] < nq_row[:, None],
                    indices[:, :n_stages], 0).astype(jnp.uint8)
    return (idx[:, 0::2] << 4) | (idx[:, 1::2] & 0xF)


def unpack_wire_device_mixed(packets, nq_row):
    """[B, max_size] uint8 wire bytes + [B] per-row stage counts →
    [B, 2*max_size] int32 indices, -1 beyond each row's own stages (the
    engine's not-received stage marker).  Row-wise bit-identical to
    unpack_indices_batch on each row's own-size packet."""
    import jax.numpy as jnp

    idx = unpack_wire_device(packets, packets.shape[1] * 8)
    stage = jnp.arange(idx.shape[1])
    return jnp.where(stage[None, :] < nq_row[:, None], idx, -1)


def build_red(cur: bytes, prev: bytes = b"") -> bytes:
    """RED wire framing for one datagram: [1B len][cur][1B len][prev].

    A datagram for sequence t carries packet t-D alongside (D = the
    fleet's redundancy distance), so one lost datagram is healed by its
    successor's redundant copy instead of concealed — the deployment-
    grade shield in front of the PLC machine the reference relies on
    alone (reference: lyra/lyra_decoder.cc:228-315).  `prev` may be empty
    (stream start).  Zero-length blocks are valid: a DTX empty packet is
    "received, no payload" on the wire (reference:
    lyra/lyra_encoder.cc:136-141)."""
    if len(cur) > 255 or len(prev) > 255:
        raise ValueError("RED block exceeds the 1-byte length prefix")
    return bytes([len(cur)]) + cur + bytes([len(prev)]) + prev


def parse_red(payload: bytes) -> tuple[bytes, bytes]:
    """Inverse of build_red; raises ValueError on a ragged payload (a
    short datagram is garbage, not a quieter packet)."""
    if len(payload) < 2:
        raise ValueError("RED payload shorter than its length prefixes")
    l1 = payload[0]
    if 2 + l1 > len(payload):
        raise ValueError("RED primary block overruns the payload")
    l2 = payload[1 + l1]
    if 2 + l1 + l2 != len(payload):
        raise ValueError("RED blocks do not tile the payload")
    return payload[1:1 + l1], payload[2 + l1:2 + l1 + l2]


def build_red_batch(cur: np.ndarray, cur_sizes: np.ndarray,
                    prev: np.ndarray, prev_sizes: np.ndarray
                    ) -> tuple[np.ndarray, np.ndarray]:
    """Vectorized RED framing for a serving tick's wire matrix.

    cur/prev: [B, max_size] u8 rows (row k's packet in the first
    cur_sizes[k]/prev_sizes[k] bytes); returns (red [B, 2 + 2*max_size]
    u8, red_sizes [B] = 2 + cur + prev) ready for the egress.  Rows group
    by their (cur, prev) size pair — at most bitrates² distinct pairs —
    so the assembly is a handful of slice assignments, not a per-row
    loop."""
    cur = np.ascontiguousarray(cur, np.uint8)
    prev = np.ascontiguousarray(prev, np.uint8)
    cur_sizes = np.asarray(cur_sizes, np.int64)
    prev_sizes = np.asarray(prev_sizes, np.int64)
    b, max_size = cur.shape
    if prev.shape != cur.shape:
        raise ValueError(f"cur {cur.shape} / prev {prev.shape} mismatch")
    if cur_sizes.max(initial=0) > max_size or \
            prev_sizes.max(initial=0) > max_size:
        raise ValueError("a size exceeds the matrix row width")
    out = np.zeros((b, 2 + 2 * max_size), np.uint8)
    out_sizes = (2 + cur_sizes + prev_sizes).astype(np.int32)
    out[:, 0] = cur_sizes
    for s1 in np.unique(cur_sizes):
        rows = cur_sizes == s1
        out[rows, 1:1 + s1] = cur[rows, :s1]
        out[rows, 1 + s1] = prev_sizes[rows]
        for s2 in np.unique(prev_sizes[rows]):
            rr = rows & (prev_sizes == s2)
            out[rr, 2 + s1:2 + s1 + s2] = prev[rr, :s2]
    return out, out_sizes
