// Sanitizer fuzz gate for the native host tier.
//
// The four native components (packet_ops, jitter_buffer, udp_pump,
// udp_egress) sit on the trust boundary: they parse bytes that arrive
// from the network (wire headers, RED framing, packet payloads) and are
// driven through a ctypes FFI where a bounds bug segfaults the serving
// process instead of raising.  The Python test suite pins their
// *semantics*; this harness pins their *memory safety* by driving every
// entry point with adversarial inputs under ASan+UBSan (build: `make
// fuzz` in native/) and the lock discipline under TSan (`make fuzz-tsan`).
//
// Deterministic: one PRNG seeded from argv, no wall-clock dependence in
// the generated inputs.  Usage: fuzz_native [seed] [scale]; scale
// multiplies every iteration count (1 ≈ a few seconds — the CI tier;
// larger scales are the soak).  Any sanitizer report aborts the run
// (-fno-sanitize-recover=all); CHECK failures abort with context.
//
// The reference has no transport or fuzz tier (its inputs are local
// files, reference: lyra/cli_example/decoder_main_lib.cc:86-219); this is
// the deployment-scale hardening its phone-app scope never needed.

#include <arpa/inet.h>
#include <netinet/in.h>
#include <sys/socket.h>
#include <unistd.h>

#include <algorithm>
#include <cinttypes>
#include <cstdint>
#include <cstdio>
#include <cstdlib>
#include <cstring>
#include <vector>

extern "C" {
// packet_ops.cc
int lyra_pack_indices_batch(const int32_t* indices, int64_t batch,
                            int64_t num_stages_stride, int64_t n_stages,
                            int64_t bits_per_stage, uint8_t* out,
                            int64_t packet_size);
int lyra_unpack_indices_batch(const uint8_t* packets, int64_t batch,
                              int64_t packet_size, int64_t n_stages,
                              int64_t bits_per_stage, int32_t* out);
// jitter_buffer.cc
void* lyra_jb_create(int64_t capacity, int64_t packet_size, int64_t depth);
void lyra_jb_destroy(void* h);
int lyra_jb_set_adaptive(void* h, int64_t min_delay, int64_t max_delay,
                         int64_t window);
int lyra_jb_add_stream(void* h, int64_t stream, int64_t start_seq,
                       int64_t playout_delay);
int lyra_jb_remove_stream(void* h, int64_t stream);
int lyra_jb_insert(void* h, int64_t stream, int64_t seq, const uint8_t* data,
                   int64_t size);
int lyra_jb_insert_red(void* h, int64_t stream, int64_t seq,
                       const uint8_t* data, int64_t size);
int64_t lyra_jb_red_heals(void* h);
int64_t lyra_jb_collect(void* h, uint8_t* out, uint8_t* received,
                        uint8_t* sizes_out);
void lyra_jb_stats2(void* h, int64_t* late, int64_t* dup, int64_t* overflow,
                    int64_t* inactive);
int64_t lyra_jb_resyncs(void* h);
void lyra_jb_adapt_stats(void* h, int64_t* grows, int64_t* shrinks,
                         int64_t* delay_min, int64_t* delay_max,
                         int64_t* delay_sum, int64_t* active_streams);
int64_t lyra_jb_delay(void* h, int64_t stream);
int64_t lyra_jb_delay2(void* h, int64_t stream);
int64_t lyra_jb_head(void* h, int64_t stream);
void lyra_jb_heads(void* h, int64_t* heads_out);
void lyra_jb_adapt_export(void* h, int64_t* delay0_out, int64_t* votes_out);
int lyra_jb_adapt_seed(void* h, int64_t stream, int64_t delay0,
                       int64_t votes);
int64_t lyra_jb_votes2(void* h, int64_t stream);
// udp_pump.cc
void* lyra_pump_create(void* jb, int port);
void* lyra_pump_create_shard(void* jb, int port, void* leader);
void* lyra_pcm_pump_create(int port, int64_t capacity, int64_t payload);
void* lyra_pcm_pump_create_shard(int port, int64_t capacity, int64_t payload,
                                 void* leader);
void* lyra_sink_pump_create(int port, int max_datagram);
int lyra_pump_port(void* h);
int lyra_pump_get_fd(void* h);
int lyra_pump_max_datagram(void);
void lyra_pump_destroy(void* h);
int lyra_pump_add_stream(void* h, int64_t stream, int64_t start_seq,
                         int64_t playout_delay);
int lyra_pump_remove_stream(void* h, int64_t stream);
int64_t lyra_pump_collect(void* h, uint8_t* out, uint8_t* received,
                          uint8_t* sizes);
void lyra_pump_stats(void* h, int64_t* datagrams, int64_t* malformed_drops,
                     int64_t* insert_drops);
void lyra_pump_jb_stats(void* h, int64_t* late, int64_t* dup,
                        int64_t* overflow, int64_t* inactive);
int64_t lyra_pump_jb_resyncs(void* h);
int lyra_pump_set_red(void* h, int64_t offset);
int64_t lyra_pump_red_heals(void* h);
int lyra_pump_jb_heads(void* h, int64_t* heads_out);
int lyra_pump_jb_adapt_export(void* h, int64_t* delay0_out,
                              int64_t* votes_out);
int lyra_pump_jb_adapt_seed(void* h, int64_t stream, int64_t delay0,
                            int64_t votes);
int lyra_pump_set_adaptive(void* h, int64_t min_delay, int64_t max_delay,
                           int64_t window);
void lyra_pump_jb_adapt_stats(void* h, int64_t* grows, int64_t* shrinks,
                              int64_t* delay_min, int64_t* delay_max,
                              int64_t* delay_sum, int64_t* active_streams);
int64_t lyra_pcm_pump_collect(void* h, uint8_t* out, uint8_t* fresh);
void lyra_pcm_pump_stats(void* h, int64_t* datagrams, int64_t* malformed,
                         int64_t* stale_drops, int64_t* resyncs);
int lyra_pcm_pump_reset_slot(void* h, int64_t slot);
int64_t lyra_pump_copy_sources(void* h, int64_t rows, uint32_t* ip_be,
                               uint16_t* port_be, uint8_t* known);
int64_t lyra_pump_collect_merged(void** pumps, int n, int64_t capacity,
                                 int64_t packet_size, uint8_t* out,
                                 uint8_t* received, uint8_t* sizes);
int64_t lyra_pcm_pump_collect_merged(void** pumps, int n, uint8_t* out,
                                     uint8_t* fresh);
int64_t lyra_pump_copy_sources_owned(void** pumps, int n, int64_t rows,
                                     uint32_t* ip_be, uint16_t* port_be,
                                     uint8_t* known, int32_t* owner);
int lyra_pump_adapt_stats_merged(void** pumps, int n, int64_t rows,
                                 int64_t* grows, int64_t* shrinks,
                                 int64_t* delay_min, int64_t* delay_max,
                                 int64_t* delay_sum, int64_t* active);
int lyra_pump_jb_adapt_export_merged(void** pumps, int n, int64_t rows,
                                     int64_t* delay0_out, int64_t* votes_out);
int lyra_pump_jb_heads_merged(void** pumps, int n, int64_t rows,
                              int64_t* heads_out);
int64_t lyra_pump_blast(int port, int64_t n, int64_t payload_size,
                        int64_t streams, int64_t seq0);
int64_t lyra_pump_blast_multi(int port, int64_t n, int64_t payload_size,
                              int64_t streams, int64_t seq0, int nsrc);
// udp_egress.cc
void* lyra_egress_create(int64_t capacity);
void* lyra_egress_create_on_pump(void* pump, int64_t capacity);
void lyra_egress_destroy(void* h);
int lyra_egress_set_dest(void* h, int64_t slot, const char* ip, int port);
int64_t lyra_egress_send_range(void* h, const uint8_t* wire,
                               const int32_t* sizes, int64_t rows,
                               int64_t stride, int64_t seq, int64_t row0,
                               int64_t row1, int count_unrouted);
int64_t lyra_egress_send(void* h, const uint8_t* wire, const int32_t* sizes,
                         int64_t rows, int64_t stride, int64_t seq);
int64_t lyra_egress_route_from_table(void* h, int64_t rows,
                                     const uint32_t* ip_be,
                                     const uint16_t* port_be,
                                     const uint8_t* routed);
int64_t lyra_egress_route_from_pump(void* h, void* pump);
void lyra_egress_stats(void* h, int64_t* sent, int64_t* no_dest_drops,
                       int64_t* kernel_drops);
}

namespace {

#define CHECK(cond, ...)                                              \
  do {                                                                \
    if (!(cond)) {                                                    \
      std::fprintf(stderr, "CHECK failed %s:%d: %s\n", __FILE__,      \
                   __LINE__, #cond);                                  \
      std::fprintf(stderr, __VA_ARGS__);                              \
      std::fprintf(stderr, "\n");                                     \
      std::abort();                                                   \
    }                                                                 \
  } while (0)

// splitmix64: deterministic, seedable, no libc rand state.
struct Rng {
  uint64_t s;
  explicit Rng(uint64_t seed) : s(seed) {}
  uint64_t next() {
    s += 0x9e3779b97f4a7c15ull;
    uint64_t z = s;
    z = (z ^ (z >> 30)) * 0xbf58476d1ce4e5b9ull;
    z = (z ^ (z >> 27)) * 0x94d049bb133111ebull;
    return z ^ (z >> 31);
  }
  // Uniform in [0, n).
  uint64_t below(uint64_t n) { return n ? next() % n : 0; }
  // Adversarial int64: boundary values mixed with small and random ones.
  int64_t hostile() {
    static const int64_t kEdges[] = {
        0,  1,  2,  -1, -2, 255, 256, 65535, 65536,
        (int64_t{1} << 31) - 1, int64_t{1} << 31, int64_t{1} << 32,
        int64_t{1} << 48, (int64_t{1} << 62) - 1, int64_t{1} << 62,
        INT64_MAX - 1, INT64_MAX, INT64_MIN + 1, INT64_MIN};
    switch (below(4)) {
      case 0:
        return kEdges[below(sizeof(kEdges) / sizeof(kEdges[0]))];
      case 1:
        return static_cast<int64_t>(below(64));
      case 2:
        return static_cast<int64_t>(next()) >> below(40);  // wide spread
      default:
        return static_cast<int64_t>(below(1u << 20));
    }
  }
};

// ---- packet_ops ------------------------------------------------------------

void FuzzPacketOps(Rng& rng, int64_t iters) {
  for (int64_t it = 0; it < iters; ++it) {
    const bool valid_mode = rng.below(2) == 0;
    int64_t bits, n_stages, stride, batch, packet_size;
    if (valid_mode) {
      bits = 1 + static_cast<int64_t>(rng.below(30));
      n_stages = static_cast<int64_t>(rng.below(64));
      stride = n_stages + static_cast<int64_t>(rng.below(4));
      batch = static_cast<int64_t>(rng.below(8));
      packet_size = (n_stages * bits + 7) / 8 + static_cast<int64_t>(
          rng.below(3));
      if (packet_size == 0) packet_size = 1;
    } else {
      // Hostile geometry, but buffers are still allocated to whatever
      // geometry we claim — the contract is "reject before writing".
      bits = static_cast<int64_t>(rng.below(40)) - 4;
      n_stages = static_cast<int64_t>(rng.below(64));
      stride = static_cast<int64_t>(rng.below(64));
      batch = static_cast<int64_t>(rng.below(8));
      packet_size = static_cast<int64_t>(rng.below(40));
    }
    std::vector<int32_t> indices(static_cast<size_t>(
        std::max<int64_t>(batch * stride, 1)));
    const uint32_t max_index =
        (bits >= 1 && bits <= 30) ? ((1u << bits) - 1u) : 0u;
    bool any_over = false;
    for (auto& v : indices) {
      if (valid_mode && rng.below(16) > 0) {
        v = static_cast<int32_t>(rng.below(max_index + 1));
      } else {
        v = static_cast<int32_t>(rng.next());  // arbitrary, often over-range
        if (max_index && static_cast<uint32_t>(v) > max_index) {
          any_over = true;
        }
      }
    }
    std::vector<uint8_t> out(static_cast<size_t>(
        std::max<int64_t>(batch * packet_size, 1)));
    const int rc = lyra_pack_indices_batch(indices.data(), batch, stride,
                                           n_stages, bits, out.data(),
                                           packet_size);
    const bool geom_ok = bits >= 1 && bits <= 30 && n_stages <= stride &&
                         packet_size * 8 >= n_stages * bits;
    if (!geom_ok) {
      CHECK(rc == 1, "pack accepted bad geometry rc=%d", rc);
      continue;
    }
    // Per-row over-range indices (within the first n_stages) force rc 2.
    bool used_over = false;
    for (int64_t b = 0; b < batch && !used_over; ++b) {
      for (int64_t st = 0; st < n_stages; ++st) {
        if (static_cast<uint32_t>(indices[static_cast<size_t>(
                b * stride + st)]) > max_index) {
          used_over = true;
          break;
        }
      }
    }
    (void)any_over;
    if (used_over) {
      CHECK(rc == 2, "pack accepted over-range index rc=%d", rc);
      continue;
    }
    CHECK(rc == 0, "pack refused valid input rc=%d", rc);
    if (batch == 0 || n_stages == 0) continue;
    std::vector<int32_t> rt(static_cast<size_t>(batch * n_stages));
    CHECK(lyra_unpack_indices_batch(out.data(), batch, packet_size, n_stages,
                                    bits, rt.data()) == 0,
          "unpack refused pack output");
    for (int64_t b = 0; b < batch; ++b) {
      for (int64_t st = 0; st < n_stages; ++st) {
        CHECK(rt[static_cast<size_t>(b * n_stages + st)] ==
                  indices[static_cast<size_t>(b * stride + st)],
              "roundtrip mismatch b=%" PRId64 " s=%" PRId64, b, st);
      }
    }
  }
}

// ---- jitter buffer ----------------------------------------------------------

void FuzzJitterBuffer(Rng& rng, int64_t rounds) {
  for (int64_t r = 0; r < rounds; ++r) {
    // Mostly-valid creation; hostile creations must return nullptr.
    if (rng.below(8) == 0) {
      int64_t c = rng.hostile(), p = rng.hostile(), d = rng.hostile();
      // Bound the product so a technically-valid giant doesn't OOM the
      // fuzzer; anything invalid must be refused.
      if (c > 0 && c < 1024 && p > 0 && p <= 255 && d > 0 && d < 1024) {
        void* h = lyra_jb_create(c, p, d);
        CHECK(h != nullptr, "create refused valid params");
        lyra_jb_destroy(h);
      } else if (c <= 0 || p <= 0 || p > 255 || d <= 0) {
        CHECK(lyra_jb_create(c, p, d) == nullptr,
              "create accepted invalid params %" PRId64 " %" PRId64
              " %" PRId64, c, p, d);
      }
      continue;
    }
    const int64_t capacity = 1 + static_cast<int64_t>(rng.below(16));
    const int64_t packet_size = 1 + static_cast<int64_t>(rng.below(32));
    const int64_t depth = 1 + static_cast<int64_t>(rng.below(16));
    void* jb = lyra_jb_create(capacity, packet_size, depth);
    CHECK(jb != nullptr, "create failed");
    if (rng.below(2) == 0) {
      const int64_t mn = static_cast<int64_t>(rng.below(4));
      const int64_t mx = mn + static_cast<int64_t>(rng.below(8));
      const int64_t win = 1 + static_cast<int64_t>(rng.below(8));
      lyra_jb_set_adaptive(jb, mn, mx, win);  // may refuse: mx >= depth
    }
    std::vector<uint8_t> payload(static_cast<size_t>(packet_size + 64));
    for (auto& b : payload) b = static_cast<uint8_t>(rng.next());
    std::vector<uint8_t> out(static_cast<size_t>(capacity * packet_size));
    std::vector<uint8_t> received(static_cast<size_t>(capacity));
    std::vector<uint8_t> sizes(static_cast<size_t>(capacity));
    std::vector<int64_t> heads(static_cast<size_t>(capacity));
    std::vector<int64_t> votes(static_cast<size_t>(capacity));
    const int64_t ops = 64 + static_cast<int64_t>(rng.below(256));
    for (int64_t i = 0; i < ops; ++i) {
      const int64_t stream =
          rng.below(4) == 0 ? rng.hostile()
                            : static_cast<int64_t>(rng.below(capacity + 2));
      switch (rng.below(12)) {
        case 0: {
          const int rc = lyra_jb_add_stream(jb, stream, rng.hostile(),
                                            rng.hostile());
          CHECK(rc == 0 || rc == 1, "add_stream rc=%d", rc);
          break;
        }
        case 1:
          lyra_jb_remove_stream(jb, stream);
          break;
        case 2:
        case 3:
        case 4: {  // hostile inserts dominate: this is the wire path
          int64_t size = rng.below(4) == 0
                             ? rng.hostile()
                             : static_cast<int64_t>(rng.below(packet_size + 2));
          if (size > static_cast<int64_t>(payload.size())) {
            size = static_cast<int64_t>(payload.size());
          }
          const int rc =
              lyra_jb_insert(jb, stream, rng.hostile(), payload.data(), size);
          CHECK(rc >= 0 && rc <= 5, "insert rc=%d", rc);
          break;
        }
        case 5: {
          int64_t size = static_cast<int64_t>(rng.below(packet_size + 1));
          const int rc = lyra_jb_insert_red(jb, stream, rng.hostile(),
                                            payload.data(), size);
          CHECK(rc >= 0 && rc <= 5, "insert_red rc=%d", rc);
          break;
        }
        case 6: {
          const int64_t n = lyra_jb_collect(jb, out.data(), received.data(),
                                            sizes.data());
          CHECK(n >= 0 && n <= capacity, "collect n=%" PRId64, n);
          int64_t got = 0;
          for (int64_t s = 0; s < capacity; ++s) {
            CHECK(received[static_cast<size_t>(s)] <= 1, "received flag");
            CHECK(sizes[static_cast<size_t>(s)] <= packet_size,
                  "collect size overflow");
            got += received[static_cast<size_t>(s)];
          }
          CHECK(got == n, "collect count mismatch");
          break;
        }
        case 7: {
          int64_t late, dup, ovf, inact;
          lyra_jb_stats2(jb, &late, &dup, &ovf, &inact);
          CHECK(late >= 0 && dup >= 0 && ovf >= 0 && inact >= 0, "stats");
          lyra_jb_resyncs(jb);
          lyra_jb_red_heals(jb);
          break;
        }
        case 8: {
          lyra_jb_heads(jb, heads.data());
          lyra_jb_adapt_export(jb, heads.data(), votes.data());
          break;
        }
        case 9: {
          const int rc =
              lyra_jb_adapt_seed(jb, stream, rng.hostile(), rng.hostile());
          CHECK(rc == 0 || rc == 1, "adapt_seed rc=%d", rc);
          break;
        }
        case 10: {
          int64_t g, sh, dmin, dmax, dsum, act;
          lyra_jb_adapt_stats(jb, &g, &sh, &dmin, &dmax, &dsum, &act);
          CHECK(act >= 0 && act <= capacity, "adapt_stats active");
          lyra_jb_delay(jb, stream);
          lyra_jb_delay2(jb, stream);
          lyra_jb_votes2(jb, stream);
          break;
        }
        default: {
          const int64_t h = lyra_jb_head(jb, stream);
          CHECK(h >= -1, "head=%" PRId64, h);
          break;
        }
      }
    }
    lyra_jb_destroy(jb);
  }
}

// ---- wire pumps --------------------------------------------------------------

// Sends one raw datagram (arbitrary bytes, arbitrary length) to
// 127.0.0.1:port.
void SendRaw(int fd, int port, const uint8_t* data, size_t len) {
  sockaddr_in addr{};
  addr.sin_family = AF_INET;
  addr.sin_addr.s_addr = htonl(INADDR_LOOPBACK);
  addr.sin_port = htons(static_cast<uint16_t>(port));
  (void)sendto(fd, data, len, 0, reinterpret_cast<sockaddr*>(&addr),
               sizeof(addr));
}

// Polls pump stats until the pump has accounted for `expect` datagrams
// (datagrams + malformed) or ~5 s elapse.  Loopback with an 8 MB receive
// buffer never drops at this volume, so shortfall is a real bug.
void AwaitPump(void* pump, int64_t expect, bool pcm) {
  for (int i = 0; i < 5000; ++i) {
    int64_t a = 0, b = 0, c = 0, d = 0;
    if (pcm) {
      lyra_pcm_pump_stats(pump, &a, &b, &c, &d);
    } else {
      lyra_pump_stats(pump, &a, &b, &c);
    }
    if (a + b >= expect) {
      CHECK(a + b == expect,
            "pump over-counted: %" PRId64 " vs sent %" PRId64, a + b, expect);
      return;
    }
    usleep(1000);
  }
  int64_t a = 0, b = 0, c = 0, d = 0;
  if (pcm) {
    lyra_pcm_pump_stats(pump, &a, &b, &c, &d);
  } else {
    lyra_pump_stats(pump, &a, &b, &c);
  }
  CHECK(false, "pump lost datagrams: %" PRId64 " of %" PRId64, a + b, expect);
}

void FuzzCodecPump(Rng& rng, int64_t datagrams, bool red) {
  const int64_t capacity = 8, packet_size = 23, depth = 8;
  void* jb = lyra_jb_create(capacity, packet_size, depth);
  CHECK(jb != nullptr, "jb create");
  void* pump = lyra_pump_create(jb, 0);
  CHECK(pump != nullptr, "pump create");
  const int port = lyra_pump_port(pump);
  if (red) CHECK(lyra_pump_set_red(pump, 2) == 0, "set_red");
  CHECK(lyra_pump_set_adaptive(pump, 0, 4, 8) == 0, "set_adaptive");
  for (int64_t s = 0; s < capacity - 2; ++s) {
    CHECK(lyra_pump_add_stream(pump, s, 0, 2) == 0, "add_stream");
  }
  int snd = socket(AF_INET, SOCK_DGRAM, 0);
  CHECK(snd >= 0, "sender socket");
  std::vector<uint8_t> out(static_cast<size_t>(capacity * packet_size));
  std::vector<uint8_t> received(static_cast<size_t>(capacity));
  std::vector<uint8_t> sizes(static_cast<size_t>(capacity));
  std::vector<int64_t> heads(static_cast<size_t>(capacity));
  std::vector<int64_t> votes(static_cast<size_t>(capacity));
  uint8_t buf[128];
  int64_t sent = 0;
  for (int64_t i = 0; i < datagrams; ++i) {
    // Adversarial datagram: random length 0..80 (headers shorter than 6 B,
    // oversize datagrams that MSG_TRUNC, ragged RED frames), random slot
    // and sequence bytes, random payload.
    size_t len = rng.below(81);
    for (size_t k = 0; k < len; ++k) buf[k] = static_cast<uint8_t>(rng.next());
    if (len >= 6 && rng.below(2) == 0) {
      // Half the time aim at a live slot with a near-window sequence so
      // the accept path (filing, route learning, adaptation) runs too.
      buf[0] = 0;
      buf[1] = static_cast<uint8_t>(rng.below(capacity));
      buf[2] = buf[3] = 0;
      buf[4] = 0;
      buf[5] = static_cast<uint8_t>(rng.below(depth * 2));
      if (red && len >= 8 && rng.below(2) == 0) {
        // Well-formed RED frame: [len1][p1][len2][p2] tiling the payload.
        const size_t pay = len - 6;
        const size_t l1 = rng.below(pay - 1);
        const size_t l2 = pay - 2 - l1;
        if (2 + l1 + l2 == pay) {
          buf[6] = static_cast<uint8_t>(l1);
          buf[7 + l1] = static_cast<uint8_t>(l2);
        }
      }
    }
    SendRaw(snd, port, buf, len);
    ++sent;
    if (rng.below(64) == 0) {
      const int64_t n =
          lyra_pump_collect(pump, out.data(), received.data(), sizes.data());
      CHECK(n >= 0 && n <= capacity, "pump collect");
    }
    if (rng.below(128) == 0) {
      const int64_t s = static_cast<int64_t>(rng.below(capacity));
      if (rng.below(2) == 0) {
        lyra_pump_remove_stream(pump, s);
      } else {
        lyra_pump_add_stream(pump, s, static_cast<int64_t>(rng.below(1000)),
                             static_cast<int64_t>(rng.below(depth)));
      }
    }
    if (rng.below(256) == 0) {
      CHECK(lyra_pump_jb_heads(pump, heads.data()) == 0, "heads");
      CHECK(lyra_pump_jb_adapt_export(pump, heads.data(), votes.data()) == 0,
            "adapt_export");
      lyra_pump_jb_adapt_seed(pump, static_cast<int64_t>(rng.below(capacity)),
                              static_cast<int64_t>(rng.below(4)),
                              static_cast<int64_t>(rng.below(4)));
      int64_t g, sh, dmin, dmax, dsum, act;
      lyra_pump_jb_adapt_stats(pump, &g, &sh, &dmin, &dmax, &dsum, &act);
      int64_t late, dup, ovf, inact;
      lyra_pump_jb_stats(pump, &late, &dup, &ovf, &inact);
      lyra_pump_jb_resyncs(pump);
      lyra_pump_red_heals(pump);
    }
  }
  AwaitPump(pump, sent, /*pcm=*/false);
  // Drain a few ticks; every byte the buffer returns was bounds-checked
  // by ASan on the way in and out.
  for (int t = 0; t < depth + 2; ++t) {
    lyra_pump_collect(pump, out.data(), received.data(), sizes.data());
  }
  close(snd);
  lyra_pump_destroy(pump);
  lyra_jb_destroy(jb);
}

void FuzzPcmPump(Rng& rng, int64_t datagrams) {
  const int64_t capacity = 8, payload = 40;
  void* pump = lyra_pcm_pump_create(0, capacity, payload);
  CHECK(pump != nullptr, "pcm pump create");
  const int port = lyra_pump_port(pump);
  int snd = socket(AF_INET, SOCK_DGRAM, 0);
  CHECK(snd >= 0, "sender socket");
  std::vector<uint8_t> out(static_cast<size_t>(capacity * payload));
  std::vector<uint8_t> fresh(static_cast<size_t>(capacity));
  uint8_t buf[160];
  int64_t sent = 0;
  for (int64_t i = 0; i < datagrams; ++i) {
    // Exact-size hops on live slots half the time; garbage otherwise.
    size_t len;
    if (rng.below(2) == 0) {
      len = 6 + static_cast<size_t>(payload);
      buf[0] = 0;
      buf[1] = static_cast<uint8_t>(rng.below(capacity + 2));
      buf[2] = buf[3] = buf[4] = 0;
      buf[5] = static_cast<uint8_t>(rng.below(64));
      for (size_t k = 6; k < len; ++k) {
        buf[k] = static_cast<uint8_t>(rng.next());
      }
    } else {
      len = rng.below(sizeof(buf) + 1);
      for (size_t k = 0; k < len; ++k) {
        buf[k] = static_cast<uint8_t>(rng.next());
      }
    }
    SendRaw(snd, port, buf, len);
    ++sent;
    if (rng.below(64) == 0) {
      const int64_t n = lyra_pcm_pump_collect(pump, out.data(), fresh.data());
      CHECK(n >= 0 && n <= capacity, "pcm collect");
      int64_t got = 0;
      for (int64_t s = 0; s < capacity; ++s) {
        got += fresh[static_cast<size_t>(s)] != 0;
      }
      CHECK(got == n, "pcm fresh mismatch");
    }
    if (rng.below(128) == 0) {
      lyra_pcm_pump_reset_slot(pump,
                               static_cast<int64_t>(rng.below(capacity + 2)));
    }
  }
  AwaitPump(pump, sent, /*pcm=*/true);
  close(snd);
  lyra_pump_destroy(pump);
}

void FuzzSinkPump(Rng& rng, int64_t datagrams) {
  void* pump = lyra_sink_pump_create(0, 64);
  CHECK(pump != nullptr, "sink pump create");
  const int port = lyra_pump_port(pump);
  int snd = socket(AF_INET, SOCK_DGRAM, 0);
  CHECK(snd >= 0, "sender socket");
  uint8_t buf[128];
  for (int64_t i = 0; i < datagrams; ++i) {
    const size_t len = rng.below(sizeof(buf) + 1);
    for (size_t k = 0; k < len; ++k) buf[k] = static_cast<uint8_t>(rng.next());
    SendRaw(snd, port, buf, len);
  }
  AwaitPump(pump, datagrams, /*pcm=*/false);
  close(snd);
  lyra_pump_destroy(pump);
}

// Shard group: two codec pumps on one port, blast through the multi-source
// sender, exercise every merged reader, tear down.
void FuzzShardGroup(Rng& rng, int64_t datagrams) {
  const int64_t capacity = 8, packet_size = 23, depth = 8;
  void* jb0 = lyra_jb_create(capacity, packet_size, depth);
  void* jb1 = lyra_jb_create(capacity, packet_size, depth);
  void* p0 = lyra_pump_create_shard(jb0, 0, nullptr);
  CHECK(p0 != nullptr, "shard founder");
  void* p1 = lyra_pump_create_shard(jb1, lyra_pump_port(p0), p0);
  CHECK(p1 != nullptr, "shard follower");
  void* pumps[2] = {p0, p1};
  for (int k = 0; k < 2; ++k) {
    lyra_pump_set_adaptive(pumps[k], 0, 4, 8);
    for (int64_t s = 0; s < capacity; ++s) {
      CHECK(lyra_pump_add_stream(pumps[k], s, 0, 2) == 0, "shard add");
    }
  }
  const int64_t sent = lyra_pump_blast_multi(
      lyra_pump_port(p0), datagrams, 8, capacity, 0, 4);
  CHECK(sent >= 0, "blast_multi");
  // The group shares the port: account for the total across both shards.
  for (int i = 0; i < 5000; ++i) {
    int64_t tot = 0;
    for (int k = 0; k < 2; ++k) {
      int64_t a, b, c;
      lyra_pump_stats(pumps[k], &a, &b, &c);
      tot += a + b;
    }
    if (tot >= sent) break;
    usleep(1000);
  }
  std::vector<uint8_t> out(static_cast<size_t>(capacity * packet_size));
  std::vector<uint8_t> received(static_cast<size_t>(capacity));
  std::vector<uint8_t> sizes(static_cast<size_t>(capacity));
  std::vector<int64_t> heads(static_cast<size_t>(capacity));
  std::vector<int64_t> votes(static_cast<size_t>(capacity));
  std::vector<uint32_t> ip(static_cast<size_t>(capacity));
  std::vector<uint16_t> prt(static_cast<size_t>(capacity));
  std::vector<uint8_t> known(static_cast<size_t>(capacity));
  std::vector<int32_t> owner(static_cast<size_t>(capacity));
  for (int t = 0; t < 16; ++t) {
    const int64_t n = lyra_pump_collect_merged(
        pumps, 2, capacity, packet_size, out.data(), received.data(),
        sizes.data());
    CHECK(n >= 0 && n <= capacity, "merged collect");
    CHECK(lyra_pump_jb_heads_merged(pumps, 2, capacity, heads.data()) == 0,
          "merged heads");
    CHECK(lyra_pump_jb_adapt_export_merged(pumps, 2, capacity, heads.data(),
                                           votes.data()) == 0,
          "merged adapt export");
    int64_t g, sh, dmin, dmax, dsum, act;
    CHECK(lyra_pump_adapt_stats_merged(pumps, 2, capacity, &g, &sh, &dmin,
                                       &dmax, &dsum, &act) == 0,
          "merged adapt stats");
    CHECK(lyra_pump_copy_sources_owned(pumps, 2, capacity, ip.data(),
                                       prt.data(), known.data(),
                                       owner.data()) >= 0,
          "sources owned");
    if (rng.below(2) == 0) {
      lyra_pump_remove_stream(pumps[rng.below(2)],
                              static_cast<int64_t>(rng.below(capacity)));
    }
  }
  lyra_pump_destroy(p1);
  lyra_pump_destroy(p0);
  lyra_jb_destroy(jb1);
  lyra_jb_destroy(jb0);
}

// ---- egress ------------------------------------------------------------------

void FuzzEgress(Rng& rng, int64_t rounds) {
  // A live sink so valid sends exercise the full sendmmsg path.
  void* sink = lyra_sink_pump_create(0, 64);
  CHECK(sink != nullptr, "egress sink");
  const int sink_port = lyra_pump_port(sink);
  for (int64_t r = 0; r < rounds; ++r) {
    const int64_t capacity = 1 + static_cast<int64_t>(rng.below(32));
    void* eg = lyra_egress_create(capacity);
    CHECK(eg != nullptr, "egress create");
    CHECK(lyra_egress_create(0) == nullptr, "egress accepted cap 0");
    CHECK(lyra_egress_create(65537) == nullptr, "egress accepted cap 65537");
    // Destination programming: valid, invalid, bulk.
    CHECK(lyra_egress_set_dest(eg, -1, "127.0.0.1", sink_port) == 0,
          "set_dest all");
    CHECK(lyra_egress_set_dest(eg, 0, "not-an-ip", sink_port) == 2,
          "set_dest bad ip");
    CHECK(lyra_egress_set_dest(eg, 0, "127.0.0.1", 0) == 1,
          "set_dest bad port");
    CHECK(lyra_egress_set_dest(eg, capacity, "127.0.0.1", sink_port) == 3,
          "set_dest bad slot");
    std::vector<uint32_t> ip(static_cast<size_t>(capacity),
                             htonl(INADDR_LOOPBACK));
    std::vector<uint16_t> prt(static_cast<size_t>(capacity),
                              htons(static_cast<uint16_t>(sink_port)));
    std::vector<uint8_t> routed(static_cast<size_t>(capacity));
    for (auto& v : routed) v = static_cast<uint8_t>(rng.below(2));
    CHECK(lyra_egress_route_from_table(eg, capacity, ip.data(), prt.data(),
                                       routed.data()) >= 0,
          "route_from_table");
    CHECK(lyra_egress_route_from_table(eg, capacity + 1, ip.data(),
                                       prt.data(), routed.data()) == -1,
          "route_from_table overcap");
    // Sends: valid geometry must return >= 0; hostile geometry must be
    // refused with -1 before any iovec is built.
    const int64_t stride = 1 + static_cast<int64_t>(rng.below(32));
    std::vector<uint8_t> wire(static_cast<size_t>(capacity * stride));
    for (auto& b : wire) b = static_cast<uint8_t>(rng.next());
    std::vector<int32_t> sizes(static_cast<size_t>(capacity));
    for (auto& s : sizes) {
      s = static_cast<int32_t>(rng.below(static_cast<uint64_t>(stride) + 1));
      if (rng.below(8) == 0) s = -s;  // negative size = inactive row
    }
    int64_t n = lyra_egress_send(eg, wire.data(), sizes.data(), capacity,
                                 stride, static_cast<int64_t>(rng.below(
                                     1u << 30)));
    CHECK(n >= 0 && n <= capacity, "send n=%" PRId64, n);
    // Row-range variant, including empty and full ranges.
    const int64_t row0 = static_cast<int64_t>(rng.below(capacity + 1));
    const int64_t row1 =
        row0 + static_cast<int64_t>(rng.below(capacity + 1 - row0));
    n = lyra_egress_send_range(eg, wire.data(), sizes.data(), capacity,
                               stride, 7, row0, row1, 0);
    CHECK(n >= 0, "send_range n=%" PRId64, n);
    // Hostile geometry: size exceeding the stride, inverted/overflowing
    // ranges, rows past the table.
    sizes[static_cast<size_t>(rng.below(capacity))] =
        static_cast<int32_t>(stride + 1 + rng.below(1000));
    CHECK(lyra_egress_send(eg, wire.data(), sizes.data(), capacity, stride,
                           1) == -1,
          "send accepted size > stride");
    for (auto& s : sizes) s = 1;
    CHECK(lyra_egress_send_range(eg, wire.data(), sizes.data(), capacity,
                                 stride, 1, 1, 0, 0) == -1,
          "send_range accepted inverted range");
    CHECK(lyra_egress_send_range(eg, wire.data(), sizes.data(), capacity,
                                 stride, 1, 0, capacity + 1, 0) == -1,
          "send_range accepted past-end range");
    CHECK(lyra_egress_send(eg, wire.data(), sizes.data(), capacity + 1,
                           stride, 1) == -1,
          "send accepted rows > capacity");
    int64_t sent, nodest, kdrops;
    lyra_egress_stats(eg, &sent, &nodest, &kdrops);
    CHECK(sent >= 0 && nodest >= 0 && kdrops >= 0, "egress stats");
    lyra_egress_destroy(eg);
  }
  // Reply mode: egress on a pump's socket + route_from_pump.
  void* jb = lyra_jb_create(4, 23, 8);
  void* pump = lyra_pump_create(jb, 0);
  CHECK(pump != nullptr, "reply pump");
  for (int64_t s = 0; s < 4; ++s) lyra_pump_add_stream(pump, s, 0, 0);
  void* eg = lyra_egress_create_on_pump(pump, 4);
  CHECK(eg != nullptr, "egress on pump");
  CHECK(lyra_egress_route_from_pump(eg, nullptr) == -1, "route null pump");
  // Give slot 0 a source by sending it a valid packet, then route.
  int snd = socket(AF_INET, SOCK_DGRAM, 0);
  uint8_t pkt[14] = {0, 0, 0, 0, 0, 1};
  SendRaw(snd, lyra_pump_port(pump), pkt, sizeof(pkt));
  AwaitPump(pump, 1, /*pcm=*/false);
  CHECK(lyra_egress_route_from_pump(eg, pump) >= 0, "route_from_pump");
  uint8_t wire[4 * 8];
  std::memset(wire, 0, sizeof(wire));
  int32_t szs[4] = {8, 8, 8, 8};
  CHECK(lyra_egress_send(eg, wire, szs, 4, 8, 1) >= 0, "reply send");
  close(snd);
  lyra_egress_destroy(eg);  // before the pump: borrowed fd
  lyra_pump_destroy(pump);
  lyra_jb_destroy(jb);
  lyra_pump_destroy(sink);
}

}  // namespace

int main(int argc, char** argv) {
  const uint64_t seed = argc > 1 ? std::strtoull(argv[1], nullptr, 10) : 1;
  const int64_t scale = argc > 2 ? std::strtoll(argv[2], nullptr, 10) : 1;
  CHECK(scale >= 1, "scale must be >= 1");
  Rng rng(seed * 0x9e3779b97f4a7c15ull + 1);
  FuzzPacketOps(rng, 4000 * scale);
  std::printf("packet_ops: %" PRId64 " geometries fuzzed\n", 4000 * scale);
  FuzzJitterBuffer(rng, 400 * scale);
  std::printf("jitter_buffer: %" PRId64 " op-stream rounds fuzzed\n",
              400 * scale);
  FuzzCodecPump(rng, 8000 * scale, /*red=*/false);
  FuzzCodecPump(rng, 8000 * scale, /*red=*/true);
  FuzzPcmPump(rng, 8000 * scale);
  FuzzSinkPump(rng, 4000 * scale);
  FuzzShardGroup(rng, 4000 * scale);
  std::printf("pumps: %" PRId64 " adversarial datagrams through real "
              "sockets\n", 32000 * scale);
  FuzzEgress(rng, 50 * scale);
  std::printf("egress: %" PRId64 " table/send rounds fuzzed\n", 50 * scale);
  std::printf("fuzz_native: OK (seed=%" PRIu64 ", scale=%" PRId64 ")\n", seed,
              scale);
  return 0;
}
