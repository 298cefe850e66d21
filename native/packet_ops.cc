// Native host-side wire-format codec for the Lyra-TPU serving runtime.
//
// At production scale (thousands of concurrent streams, one packet per
// stream per 20 ms tick) the host must convert between RVQ stage indices
// and wire bytes at several hundred thousand packets/second while the TPU
// step runs asynchronously.  This is the native-hot equivalent of the
// reference's templated Packet bit packer (reference: lyra/packet.h:91-146
// packs one frame at a time via std::bitset); here the layout work is done
// batch-at-a-time over contiguous buffers, branch-free per stage.
//
// Wire layout parity (reference: lyra/packet.h:91-146,
// lyra/residual_vector_quantizer.cc:101-157): stage indices are laid out
// MSB-first — stage 0 occupies the most significant bits of the packet —
// and the tail byte is zero-padded in its low bits.
//
// Build: see native/Makefile (g++ -O3 -shared).  Exposed via ctypes with a
// pure-numpy fallback in lyra_tpu/packet.py.

#include <cstdint>
#include <cstring>

extern "C" {

// indices: [batch, num_stages_stride] int32, first n_stages used per row.
// out:     [batch, packet_size] bytes.
// Returns 0 on success, nonzero on bad arguments.
int lyra_pack_indices_batch(const int32_t* indices, int64_t batch,
                            int64_t num_stages_stride, int64_t n_stages,
                            int64_t bits_per_stage, uint8_t* out,
                            int64_t packet_size) {
  const int64_t num_bits = n_stages * bits_per_stage;
  if (packet_size * 8 < num_bits || bits_per_stage <= 0 ||
      bits_per_stage > 30 || n_stages > num_stages_stride) {
    return 1;
  }
  const uint32_t max_index = (1u << bits_per_stage) - 1u;
  for (int64_t b = 0; b < batch; ++b) {
    const int32_t* row = indices + b * num_stages_stride;
    uint8_t* dst = out + b * packet_size;
    std::memset(dst, 0, packet_size);
    // Accumulate bits MSB-first into a 64-bit shift register and spill
    // whole bytes as they fill.
    uint64_t acc = 0;
    int acc_bits = 0;
    int64_t byte_pos = 0;
    for (int64_t s = 0; s < n_stages; ++s) {
      uint32_t v = static_cast<uint32_t>(row[s]);
      if (v > max_index) return 2;
      acc = (acc << bits_per_stage) | v;
      acc_bits += static_cast<int>(bits_per_stage);
      while (acc_bits >= 8) {
        dst[byte_pos++] = static_cast<uint8_t>((acc >> (acc_bits - 8)) & 0xFF);
        acc_bits -= 8;
      }
    }
    if (acc_bits > 0) {
      dst[byte_pos] = static_cast<uint8_t>((acc << (8 - acc_bits)) & 0xFF);
    }
  }
  return 0;
}

// packets: [batch, packet_size] bytes; out: [batch, n_stages] int32.
int lyra_unpack_indices_batch(const uint8_t* packets, int64_t batch,
                              int64_t packet_size, int64_t n_stages,
                              int64_t bits_per_stage, int32_t* out) {
  const int64_t num_bits = n_stages * bits_per_stage;
  if (packet_size * 8 < num_bits || bits_per_stage <= 0 ||
      bits_per_stage > 30) {
    return 1;
  }
  const uint32_t mask = (1u << bits_per_stage) - 1u;
  for (int64_t b = 0; b < batch; ++b) {
    const uint8_t* src = packets + b * packet_size;
    int32_t* row = out + b * n_stages;
    uint64_t acc = 0;
    int acc_bits = 0;
    int64_t byte_pos = 0;
    for (int64_t s = 0; s < n_stages; ++s) {
      while (acc_bits < bits_per_stage) {
        acc = (acc << 8) | src[byte_pos++];
        acc_bits += 8;
      }
      row[s] = static_cast<int32_t>((acc >> (acc_bits - bits_per_stage)) & mask);
      acc_bits -= static_cast<int>(bits_per_stage);
    }
  }
  return 0;
}

}  // extern "C"
