// Native UDP ingest pumps for the Lyra-TPU serving runtime.
//
// At fleet scale the transport side is per-packet work the batched device
// tick never sees: tens of thousands of streams x 50 datagrams/s is millions
// of datagrams per second, far past what a per-datagram Python loop can
// drain.  These components own the socket end to end in C++: a receiver
// thread batch-drains the socket with recvmmsg, parses the wire header
// (2 B stream slot + 4 B sequence, big-endian — the layout
// examples/udp_call.py established), and files payloads natively.  The
// serving loop only ever sees the dense per-tick collect() matrix.
//
// Two pumps share the machinery (PumpBase):
//  - UdpPump: codec packets -> the native jitter buffer (jitter_buffer.cc),
//    the decode/bridge uplink.  Payloads are at most 23 B.
//  - PcmPump: fixed-size PCM hops -> a latest-wins-by-sequence per-slot
//    staging matrix, the encode-relay uplink.  Mic audio wants the freshest
//    hop, not a playout queue: an older hop arriving after a newer one is a
//    stale drop (the hop it would replace already superseded it), and a
//    slot whose sender restarted at a lower sequence origin resyncs after
//    kResyncRun consecutive stale datagrams — the same recovery rule as the
//    jitter buffer's overflow resync.
//
// The reference has no transport layer at all (its CLIs read files and
// simulate loss, lyra/cli_example/decoder_main_lib.cc:86-219); like the
// jitter buffer this is the deployment-scale equivalent, native because it
// runs per packet.
//
// Concurrency: each pump's mutex serializes the receiver thread against
// collect/admission/stats, which MUST therefore go through the pump
// (lyra_pump_* / lyra_pcm_pump_*) rather than raw lyra_jb_* calls while the
// pump is running.

#include <arpa/inet.h>
#include <netinet/in.h>
#include <poll.h>
#include <sys/socket.h>
#include <unistd.h>

#include <algorithm>
#include <atomic>
#include <cstdint>
#include <cstring>
#include <mutex>
#include <thread>
#include <vector>

extern "C" {
// jitter_buffer.cc (same shared library).
int lyra_jb_add_stream(void* h, int64_t stream, int64_t start_seq,
                       int64_t playout_delay);
int lyra_jb_remove_stream(void* h, int64_t stream);
int lyra_jb_insert(void* h, int64_t stream, int64_t seq,
                   const uint8_t* packet, int64_t size);
int64_t lyra_jb_collect(void* h, uint8_t* out, uint8_t* received,
                        uint8_t* sizes);
void lyra_jb_stats2(void* h, int64_t* late, int64_t* dup, int64_t* overflow,
                    int64_t* inactive);
int64_t lyra_jb_resyncs(void* h);
int lyra_jb_insert_red(void* h, int64_t stream, int64_t seq,
                       const uint8_t* packet, int64_t size);
int64_t lyra_jb_red_heals(void* h);
int lyra_jb_set_adaptive(void* h, int64_t min_delay, int64_t max_delay,
                         int64_t window);
void lyra_jb_adapt_stats(void* h, int64_t* grows, int64_t* shrinks,
                         int64_t* delay_min, int64_t* delay_max,
                         int64_t* delay_sum, int64_t* active_streams);
int64_t lyra_jb_delay2(void* h, int64_t stream);
int64_t lyra_jb_head(void* h, int64_t stream);
void lyra_jb_heads(void* h, int64_t* heads_out);
void lyra_jb_adapt_export(void* h, int64_t* delay0_out, int64_t* votes_out);
int lyra_jb_adapt_seed(void* h, int64_t stream, int64_t delay0,
                       int64_t votes);
int64_t lyra_jb_votes2(void* h, int64_t stream);
}

namespace {

constexpr int kHeaderBytes = 6;   // 2 B slot + 4 B seq, big-endian
constexpr int kBatch = 256;       // datagrams per recvmmsg call
constexpr int kMaxDatagram = 64;  // header + widest Lyra packet (23 B)
// Largest UDP payload over IPv4 (65535 - 20 IP - 8 UDP); the PCM pump's
// per-datagram buffers are sized from the hop it carries, bounded by this.
constexpr int kUdpMax = 65507;
// Consecutive stale datagrams on one slot before the PCM pump adopts the
// incoming sequence origin (sender restart) — mirrors the jitter buffer's
// 3-overflow resync rule.
constexpr int kResyncRun = 3;

// Last-seen uplink source per slot (the 2-byte wire slot field bounds the
// table).  Reply routing (lyra_egress_route_from_pump, udp_egress.cc)
// copies these into the egress destination table so downlink datagrams go
// back where the uplink came from — the real-MCU shape.
constexpr int kMaxSlots = 65536;

struct SlotSource {
  uint32_t ip_be = 0;   // network byte order
  uint16_t port_be = 0; // network byte order
  uint8_t known = 0;
  // Monotonic freshness stamp.  Within one pump it orders route learning;
  // across a SO_REUSEPORT shard group all pumps share one counter
  // (lyra_pump_share_stamp) so merged readers can pick the shard that
  // heard a slot most recently — a migrated flow (NAT rebind hashing to a
  // new shard) must win over its stale twin.
  int64_t stamp = 0;
};

// Per-datagram verdict from a pump's handler (under the batch lock).
enum class Verdict {
  kAccepted,   // filed; learn the reply route from this datagram
  kDropped,    // well-formed but not filed (late/dup/stale/...); counted
  kMalformed,  // wrong shape for this pump; never filed
};

// State shared by both pump kinds.  Handles returned to callers are always
// PumpBase*, so the base accessors (port/fd/copy_sources/destroy) work on
// either; kind dispatches the rest.
struct PumpBase {
  int kind;  // 0 = jitter-buffer (codec packet) pump, 1 = PCM pump
  int fd = -1;
  int port = 0;
  std::mutex mu;  // receiver thread vs collect/admission/stats
  std::thread receiver;
  std::atomic<bool> stop{false};
  // stats (mu-guarded)
  int64_t datagrams = 0;       // well-formed datagrams (accepted + dropped)
  int64_t malformed_drops = 0; // shorter than the header, kernel-truncated
                               // past the buffer (MSG_TRUNC), or the wrong
                               // shape for this pump — filing one would
                               // decode as garbage
  int64_t drops = 0;           // well-formed but not filed; the pump kind's
                               // own counters hold the breakdown
  std::vector<SlotSource> sources = std::vector<SlotSource>(kMaxSlots);
  // Freshness clock for source learning: points at this pump's own counter
  // unless the pump joined a shard group (lyra_pump_share_stamp).
  std::atomic<int64_t> own_stamp{0};
  std::atomic<int64_t>* stamp_clock = &own_stamp;

  explicit PumpBase(int k) : kind(k) {}

  // Batch-drains the socket until stop.  `handle(slot, seq, payload, len)`
  // runs under the batch lock and returns the datagram's verdict; the loop
  // owns the shared counters and the accepted-only route learning.
  template <typename F>
  void RunLoop(int max_datagram, F&& handle) {
    std::vector<uint8_t> bufs(static_cast<size_t>(kBatch) * max_datagram);
    sockaddr_in srcs[kBatch];
    mmsghdr msgs[kBatch];
    iovec iovs[kBatch];
    for (int i = 0; i < kBatch; ++i) {
      iovs[i] = {bufs.data() + static_cast<size_t>(i) * max_datagram,
                 static_cast<size_t>(max_datagram)};
      std::memset(&msgs[i], 0, sizeof(msgs[i]));
      msgs[i].msg_hdr.msg_iov = &iovs[i];
      msgs[i].msg_hdr.msg_iovlen = 1;
    }
    while (!stop.load(std::memory_order_relaxed)) {
      pollfd pfd{fd, POLLIN, 0};
      if (poll(&pfd, 1, /*timeout_ms=*/50) <= 0) continue;
      for (int i = 0; i < kBatch; ++i) {
        // recvmmsg rewrites name lengths per datagram; re-arm each round.
        msgs[i].msg_hdr.msg_name = &srcs[i];
        msgs[i].msg_hdr.msg_namelen = sizeof(srcs[i]);
      }
      int n = recvmmsg(fd, msgs, kBatch, MSG_DONTWAIT, nullptr);
      if (n <= 0) continue;
      std::lock_guard<std::mutex> lock(mu);
      for (int i = 0; i < n; ++i) {
        const uint8_t* d = bufs.data() + static_cast<size_t>(i) * max_datagram;
        const int len = static_cast<int>(msgs[i].msg_len);
        if (len < kHeaderBytes ||
            (msgs[i].msg_hdr.msg_flags & MSG_TRUNC) != 0) {
          ++malformed_drops;
          continue;
        }
        const int64_t slot = (int64_t{d[0]} << 8) | d[1];
        const int64_t seq = (int64_t{d[2]} << 24) | (int64_t{d[3]} << 16) |
                            (int64_t{d[4]} << 8) | d[5];
        const Verdict v =
            handle(slot, seq, d + kHeaderBytes, len - kHeaderBytes);
        if (v == Verdict::kMalformed) {
          ++malformed_drops;
          continue;
        }
        ++datagrams;
        if (v == Verdict::kDropped) {
          ++drops;  // counted transport event, never fatal
        } else if (msgs[i].msg_hdr.msg_namelen >= sizeof(sockaddr_in) &&
                   srcs[i].sin_family == AF_INET) {
          // Learn the reply route only from datagrams the pump accepted
          // (active slot, in-window/fresh sequence): rejected traffic
          // (inactive/late/dup/stale/overflow) must not repoint a slot's
          // downlink.  Note this is plain-RTP-grade trust — an on-path or
          // guessing sender that lands a valid (slot, seq) still steers
          // the route; deployments that need more wrap the transport in
          // DTLS/SRTP, which the reference leaves to the app layer too.
          auto& s = sources[static_cast<size_t>(slot)];
          s.ip_be = srcs[i].sin_addr.s_addr;
          s.port_be = srcs[i].sin_port;
          s.known = 1;
          s.stamp = stamp_clock->fetch_add(1, std::memory_order_relaxed) + 1;
        }
      }
    }
  }
};

struct UdpPump : PumpBase {
  UdpPump() : PumpBase(0) {}
  void* jb = nullptr;
  // RED wire mode (lyra_pump_set_red): each datagram for sequence t is
  // [1B len1][packet t][1B len2][packet t-red_offset] instead of a bare
  // packet, so one lost datagram is healed by its successor's redundant
  // copy instead of concealed.  0 = plain framing.  A fleet-level wire
  // contract: every sender on this port must use the same framing.
  int64_t red_offset = 0;

  void Run() {
    RunLoop(kMaxDatagram, [this](int64_t slot, int64_t seq,
                                 const uint8_t* payload, int len) {
      if (red_offset == 0) {
        return lyra_jb_insert(jb, slot, seq, payload, len) == 0
                   ? Verdict::kAccepted
                   : Verdict::kDropped;
      }
      // RED framing.  Block lengths must tile the payload exactly — a
      // ragged datagram is garbage, not "a quieter packet".  len2 == 0
      // (stream start, or a sender declining redundancy this packet)
      // is valid: the primary block stands alone.
      if (len < 2) return Verdict::kMalformed;
      const int l1 = payload[0];
      if (2 + l1 > len) return Verdict::kMalformed;
      const int l2 = payload[1 + l1];
      if (2 + l1 + l2 != len) return Verdict::kMalformed;
      const bool primary_ok =
          lyra_jb_insert(jb, slot, seq, payload + 1, l1) == 0;
      bool heal = false;
      if (l2 > 0 && seq >= red_offset) {
        heal = lyra_jb_insert_red(jb, slot, seq - red_offset,
                                  payload + 2 + l1, l2) == 0;
      }
      // Accepted if either block was filed (route learning should
      // follow a datagram whose redundant copy healed a hole even if
      // its primary was a dup).
      return (primary_ok || heal) ? Verdict::kAccepted : Verdict::kDropped;
    });
  }
};

// Encode-relay uplink: one fixed-size PCM hop per datagram, freshest hop
// wins per slot.  No playout queue — the relay grid-aligns ticks itself
// and a superseded mic hop is worthless (tools/serve_main.py encode mode).
struct PcmPump : PumpBase {
  PcmPump() : PumpBase(1) {}
  int64_t capacity = 0;
  int64_t payload = 0;                 // exact bytes per hop
  std::vector<uint8_t> staging;        // [capacity * payload], latest hop
  std::vector<uint8_t> fresh;          // [capacity], new since last collect
  std::vector<int64_t> last_seq;       // [capacity], -1 = never spoke
  std::vector<int32_t> stale_run;      // consecutive stale drops per slot
  int64_t resyncs = 0;                 // sequence-origin adoptions

  void Run() {
    RunLoop(kHeaderBytes + static_cast<int>(payload),
            [this](int64_t slot, int64_t seq, const uint8_t* data, int len) {
      // A hop is all-or-nothing: a short datagram is not "a quieter hop",
      // it is garbage, so anything but the exact size is malformed.
      if (len != payload || slot >= capacity) return Verdict::kMalformed;
      if (last_seq[slot] >= 0 && seq <= last_seq[slot]) {
        if (++stale_run[slot] < kResyncRun) return Verdict::kDropped;
        ++resyncs;  // sender restarted at a lower origin: adopt its clock
      }
      stale_run[slot] = 0;
      last_seq[slot] = seq;
      std::memcpy(&staging[static_cast<size_t>(slot * payload)], data,
                  static_cast<size_t>(payload));
      fresh[static_cast<size_t>(slot)] = 1;
      return Verdict::kAccepted;
    });
  }
};

// Measurement-only pump: drains and discards.  Runs the identical receive
// machinery (poll + recvmmsg batches + length gate + header parse) but
// files nothing — the per-datagram handler is a counted drop — so an A/B
// against a real pump on the same boot isolates the filing cost (payload
// copy + ring bookkeeping + route learning) from the kernel/syscall floor.
// Exists for benchmarks/ingest_bench.py --decompose; never serves.
struct SinkPump : PumpBase {
  SinkPump() : PumpBase(2) {}
  int max_datagram = kMaxDatagram;

  void Run() {
    RunLoop(max_datagram, [](int64_t, int64_t, const uint8_t*, int) {
      return Verdict::kDropped;
    });
  }
};

// Binds 0.0.0.0:port (0 = ephemeral); returns the fd or -1, with the bound
// port written back through *bound_port.  With `reuseport` the socket
// joins (or founds) the port's SO_REUSEPORT group: the kernel hashes each
// datagram's 4-tuple across the group's sockets, so one flow always lands
// on one socket — the multi-core sharding primitive (every member of a
// group must set the flag, including the first to bind).
int OpenSocket(int port, int* bound_port, bool reuseport = false) {
  int fd = socket(AF_INET, SOCK_DGRAM, 0);
  if (fd < 0) return -1;
  int rcvbuf = 8 * 1024 * 1024;  // burst headroom: ~100k queued datagrams
  setsockopt(fd, SOL_SOCKET, SO_RCVBUF, &rcvbuf, sizeof(rcvbuf));
  if (reuseport) {
    int one = 1;
    if (setsockopt(fd, SOL_SOCKET, SO_REUSEPORT, &one, sizeof(one)) != 0) {
      close(fd);
      return -1;
    }
  }
  sockaddr_in addr{};
  addr.sin_family = AF_INET;
  addr.sin_addr.s_addr = htonl(INADDR_ANY);
  addr.sin_port = htons(static_cast<uint16_t>(port));
  if (bind(fd, reinterpret_cast<sockaddr*>(&addr), sizeof(addr)) != 0) {
    close(fd);
    return -1;
  }
  socklen_t alen = sizeof(addr);
  getsockname(fd, reinterpret_cast<sockaddr*>(&addr), &alen);
  *bound_port = ntohs(addr.sin_port);
  return fd;
}

// Batched loopback sender shared by the bench entry points below.
int64_t BlastImpl(int port, int64_t n, int64_t payload_size, int64_t streams,
                  int64_t seq0, int64_t max_payload) {
  if (streams <= 0 || payload_size < 0 || payload_size > max_payload) {
    return -1;
  }
  int fd = socket(AF_INET, SOCK_DGRAM, 0);
  if (fd < 0) return -1;
  sockaddr_in addr{};
  addr.sin_family = AF_INET;
  addr.sin_addr.s_addr = htonl(INADDR_LOOPBACK);
  addr.sin_port = htons(static_cast<uint16_t>(port));
  const int dlen = kHeaderBytes + static_cast<int>(payload_size);
  std::vector<uint8_t> bufs(static_cast<size_t>(kBatch) * dlen, 0);
  mmsghdr msgs[kBatch];
  iovec iovs[kBatch];
  for (int i = 0; i < kBatch; ++i) {
    iovs[i] = {bufs.data() + static_cast<size_t>(i) * dlen,
               static_cast<size_t>(dlen)};
    std::memset(&msgs[i], 0, sizeof(msgs[i]));
    msgs[i].msg_hdr.msg_name = &addr;
    msgs[i].msg_hdr.msg_namelen = sizeof(addr);
    msgs[i].msg_hdr.msg_iov = &iovs[i];
    msgs[i].msg_hdr.msg_iovlen = 1;
  }
  int64_t sent = 0;
  while (sent < n) {
    const int want = static_cast<int>(std::min<int64_t>(kBatch, n - sent));
    for (int i = 0; i < want; ++i) {
      uint8_t* d = bufs.data() + static_cast<size_t>(i) * dlen;
      const int64_t k = sent + i;
      const int64_t slot = k % streams;
      const int64_t seq = seq0 + k / streams;
      d[0] = static_cast<uint8_t>(slot >> 8);
      d[1] = static_cast<uint8_t>(slot);
      d[2] = static_cast<uint8_t>(seq >> 24);
      d[3] = static_cast<uint8_t>(seq >> 16);
      d[4] = static_cast<uint8_t>(seq >> 8);
      d[5] = static_cast<uint8_t>(seq);
    }
    int done = sendmmsg(fd, msgs, want, 0);
    if (done <= 0) break;  // ENOBUFS etc.: report what actually went out
    sent += done;
  }
  close(fd);
  return sent;
}

}  // namespace

extern "C" {

// Binds 0.0.0.0:port (port 0 = ephemeral; read back with lyra_pump_port)
// and starts the receiver thread.  With a non-null `leader` the pump joins
// the leader's SO_REUSEPORT shard group: the kernel hashes each flow to
// one member socket, and all members share one source-freshness clock so
// merged readers (lyra_pump_copy_sources_owned) can tell which shard heard
// a slot last.  Found the group by creating the first shard with
// leader == nullptr (it binds with SO_REUSEPORT and keeps its own clock);
// pass that founder as every follower's leader.  Returns nullptr on
// failure (socket, or the port's group is owned by non-reuseport binds).
void* lyra_pump_create_shard(void* jb, int port, void* leader) {
  if (jb == nullptr) return nullptr;
  auto* p = new UdpPump;
  auto* lead = static_cast<PumpBase*>(leader);
  // Group members all need the flag, including the founder: bind the
  // founder with SO_REUSEPORT too by treating it as its own leader for
  // socket options only (clock stays its own).
  p->fd = OpenSocket(port, &p->port, /*reuseport=*/true);
  if (p->fd < 0) {
    delete p;
    return nullptr;
  }
  if (lead != nullptr) p->stamp_clock = lead->stamp_clock;
  p->jb = jb;
  p->receiver = std::thread([p] { p->Run(); });
  return static_cast<PumpBase*>(p);
}

void* lyra_pump_create(void* jb, int port) {
  if (jb == nullptr) return nullptr;
  auto* p = new UdpPump;
  p->fd = OpenSocket(port, &p->port);
  if (p->fd < 0) {
    delete p;
    return nullptr;
  }
  p->jb = jb;
  p->receiver = std::thread([p] { p->Run(); });
  return static_cast<PumpBase*>(p);
}

// PCM pump: `payload` is the exact bytes per hop (e.g. 640 for a 20 ms
// 16 kHz int16 hop); datagrams of any other size are malformed drops.
// `leader` as in lyra_pump_create_shard (pass nullptr for a standalone
// pump bound without SO_REUSEPORT via lyra_pcm_pump_create).
void* lyra_pcm_pump_create_shard(int port, int64_t capacity, int64_t payload,
                                 void* leader) {
  if (capacity <= 0 || capacity > kMaxSlots || payload <= 0 ||
      payload > kUdpMax - kHeaderBytes) {
    return nullptr;
  }
  auto* p = new PcmPump;
  auto* lead = static_cast<PumpBase*>(leader);
  p->fd = OpenSocket(port, &p->port, /*reuseport=*/true);
  if (p->fd < 0) {
    delete p;
    return nullptr;
  }
  if (lead != nullptr) p->stamp_clock = lead->stamp_clock;
  p->capacity = capacity;
  p->payload = payload;
  p->staging.assign(static_cast<size_t>(capacity * payload), 0);
  p->fresh.assign(static_cast<size_t>(capacity), 0);
  p->last_seq.assign(static_cast<size_t>(capacity), -1);
  p->stale_run.assign(static_cast<size_t>(capacity), 0);
  p->receiver = std::thread([p] { p->Run(); });
  return static_cast<PumpBase*>(p);
}

void* lyra_pcm_pump_create(int port, int64_t capacity, int64_t payload) {
  if (capacity <= 0 || capacity > kMaxSlots || payload <= 0 ||
      payload > kUdpMax - kHeaderBytes) {
    return nullptr;
  }
  auto* p = new PcmPump;
  p->fd = OpenSocket(port, &p->port);
  if (p->fd < 0) {
    delete p;
    return nullptr;
  }
  p->capacity = capacity;
  p->payload = payload;
  p->staging.assign(static_cast<size_t>(capacity * payload), 0);
  p->fresh.assign(static_cast<size_t>(capacity), 0);
  p->last_seq.assign(static_cast<size_t>(capacity), -1);
  p->stale_run.assign(static_cast<size_t>(capacity), 0);
  p->receiver = std::thread([p] { p->Run(); });
  return static_cast<PumpBase*>(p);
}

// Sink pump for receive-floor measurement (see SinkPump above): counts
// well-formed datagrams (as drops) and malformed ones, files nothing.
// `max_datagram` sizes the receive buffers (header + widest payload the
// probe sends; larger datagrams are MSG_TRUNC-counted malformed).
void* lyra_sink_pump_create(int port, int max_datagram) {
  if (max_datagram < kHeaderBytes || max_datagram > kUdpMax) return nullptr;
  auto* p = new SinkPump;
  p->fd = OpenSocket(port, &p->port);
  if (p->fd < 0) {
    delete p;
    return nullptr;
  }
  p->max_datagram = max_datagram;
  p->receiver = std::thread([p] { p->Run(); });
  return static_cast<PumpBase*>(p);
}

int lyra_pump_port(void* h) { return static_cast<PumpBase*>(h)->port; }

// The pump's socket fd, for reply-mode egress on the same socket
// (lyra_egress_create_on_pump, udp_egress.cc): downlink must leave from
// the port the uplink was addressed to or NAT'd callers never see it.
// Works on either pump kind.
int lyra_pump_get_fd(void* h) { return static_cast<PumpBase*>(h)->fd; }

// Largest datagram the codec-packet pump's receive buffers hold (header +
// payload); callers validate their packet_size against this at
// construction, loudly.  (The PCM pump sizes its buffers from `payload`.)
int lyra_pump_max_datagram(void) { return kMaxDatagram; }

// Stops the receiver thread, closes the socket, frees the pump (either
// kind).  A jitter buffer fed by a codec pump stays valid and
// single-thread-usable.
void lyra_pump_destroy(void* h) {
  auto* p = static_cast<PumpBase*>(h);
  p->stop.store(true);
  if (p->receiver.joinable()) p->receiver.join();
  close(p->fd);
  if (p->kind == 0) {
    delete static_cast<UdpPump*>(p);
  } else if (p->kind == 1) {
    delete static_cast<PcmPump*>(p);
  } else {
    delete static_cast<SinkPump*>(p);
  }
}

// Locked pass-throughs: the only safe way to touch the jitter buffer while
// the receiver thread is live.
int lyra_pump_add_stream(void* h, int64_t stream, int64_t start_seq,
                         int64_t playout_delay) {
  auto* p = static_cast<PumpBase*>(h);
  if (p->kind != 0) return -1;
  std::lock_guard<std::mutex> lock(p->mu);
  // A slot changing hands must not inherit the previous occupant's reply
  // route: downlink for the new participant would leak to the departed
  // caller's address until the new one first speaks.
  if (stream >= 0 && stream < kMaxSlots) {
    p->sources[static_cast<size_t>(stream)] = SlotSource{};
  }
  return lyra_jb_add_stream(static_cast<UdpPump*>(p)->jb, stream, start_seq,
                            playout_delay);
}

int lyra_pump_remove_stream(void* h, int64_t stream) {
  auto* p = static_cast<PumpBase*>(h);
  if (p->kind != 0) return -1;
  std::lock_guard<std::mutex> lock(p->mu);
  if (stream >= 0 && stream < kMaxSlots) {
    p->sources[static_cast<size_t>(stream)] = SlotSource{};  // see add
  }
  return lyra_jb_remove_stream(static_cast<UdpPump*>(p)->jb, stream);
}

int64_t lyra_pump_collect(void* h, uint8_t* out, uint8_t* received,
                          uint8_t* sizes) {
  auto* p = static_cast<PumpBase*>(h);
  if (p->kind != 0) return -1;
  std::lock_guard<std::mutex> lock(p->mu);
  return lyra_jb_collect(static_cast<UdpPump*>(p)->jb, out, received, sizes);
}

void lyra_pump_stats(void* h, int64_t* datagrams, int64_t* malformed_drops,
                     int64_t* insert_drops) {
  auto* p = static_cast<PumpBase*>(h);
  std::lock_guard<std::mutex> lock(p->mu);
  *datagrams = p->datagrams;
  *malformed_drops = p->malformed_drops;
  *insert_drops = p->drops;
}

// Locked jitter-buffer drop breakdown: the jb counters are plain int64s
// the receiver thread increments, so reading them through the raw
// lyra_jb_stats2 while the pump is live would be a data race.
void lyra_pump_jb_stats(void* h, int64_t* late, int64_t* dup,
                        int64_t* overflow, int64_t* inactive) {
  auto* p = static_cast<PumpBase*>(h);
  if (p->kind != 0) {
    *late = *dup = *overflow = *inactive = -1;
    return;
  }
  std::lock_guard<std::mutex> lock(p->mu);
  lyra_jb_stats2(static_cast<UdpPump*>(p)->jb, late, dup, overflow, inactive);
}

int64_t lyra_pump_jb_resyncs(void* h) {
  auto* p = static_cast<PumpBase*>(h);
  if (p->kind != 0) return -1;
  std::lock_guard<std::mutex> lock(p->mu);
  return lyra_jb_resyncs(static_cast<UdpPump*>(p)->jb);
}

// Switch the pump's wire framing to RED with redundancy distance
// `offset` (see UdpPump::red_offset; 0 restores plain framing).  A wire
// contract for the whole port: set it before traffic flows, on every
// member of a shard group.  The receiver needs a playout delay of at
// least offset+1 ticks for the redundant copy to arrive before its
// sequence is due — enforced by the callers (serve_main --red), not
// here (the pump doesn't know the buffer's delays).  Returns 0, or -1
// on a wrong-kind handle / offset out of [0, 8].
int lyra_pump_set_red(void* h, int64_t offset) {
  auto* p = static_cast<PumpBase*>(h);
  if (p->kind != 0 || offset < 0 || offset > 8) return -1;
  std::lock_guard<std::mutex> lock(p->mu);
  static_cast<UdpPump*>(p)->red_offset = offset;
  return 0;
}

// Redundant copies that filled a real hole (locked read; the measure of
// what RED bought).  -1 on a wrong-kind handle.
int64_t lyra_pump_red_heals(void* h) {
  auto* p = static_cast<PumpBase*>(h);
  if (p->kind != 0) return -1;
  std::lock_guard<std::mutex> lock(p->mu);
  return lyra_jb_red_heals(static_cast<UdpPump*>(p)->jb);
}

// Locked playout-schedule export (see lyra_jb_heads): heads_out must hold
// the buffer's capacity entries.  Returns 0, or -1 on the wrong pump kind.
int lyra_pump_jb_heads(void* h, int64_t* heads_out) {
  auto* p = static_cast<PumpBase*>(h);
  if (p->kind != 0) return -1;
  std::lock_guard<std::mutex> lock(p->mu);
  lyra_jb_heads(static_cast<UdpPump*>(p)->jb, heads_out);
  return 0;
}

// Locked adaptive-evidence export/seed (see lyra_jb_adapt_export /
// lyra_jb_adapt_seed): the migration-snapshot companions of
// lyra_pump_jb_heads.  Returns 0, or -1 on the wrong pump kind (seed also
// propagates the buffer's own refusal as 1).
int lyra_pump_jb_adapt_export(void* h, int64_t* delay0_out,
                              int64_t* votes_out) {
  auto* p = static_cast<PumpBase*>(h);
  if (p->kind != 0) return -1;
  std::lock_guard<std::mutex> lock(p->mu);
  lyra_jb_adapt_export(static_cast<UdpPump*>(p)->jb, delay0_out, votes_out);
  return 0;
}

int lyra_pump_jb_adapt_seed(void* h, int64_t stream, int64_t delay0,
                            int64_t votes) {
  auto* p = static_cast<PumpBase*>(h);
  if (p->kind != 0) return -1;
  std::lock_guard<std::mutex> lock(p->mu);
  return lyra_jb_adapt_seed(static_cast<UdpPump*>(p)->jb, stream, delay0,
                            votes);
}

// Locked adaptive-delay controls (see jitter_buffer.cc): the only safe way
// to configure/read adaptation while the receiver thread is live.
int lyra_pump_set_adaptive(void* h, int64_t min_delay, int64_t max_delay,
                           int64_t window) {
  auto* p = static_cast<PumpBase*>(h);
  if (p->kind != 0) return -1;
  std::lock_guard<std::mutex> lock(p->mu);
  return lyra_jb_set_adaptive(static_cast<UdpPump*>(p)->jb, min_delay,
                              max_delay, window);
}

void lyra_pump_jb_adapt_stats(void* h, int64_t* grows, int64_t* shrinks,
                              int64_t* delay_min, int64_t* delay_max,
                              int64_t* delay_sum, int64_t* active_streams) {
  auto* p = static_cast<PumpBase*>(h);
  if (p->kind != 0) {
    *grows = *shrinks = *delay_min = *delay_max = *delay_sum =
        *active_streams = -1;
    return;
  }
  std::lock_guard<std::mutex> lock(p->mu);
  lyra_jb_adapt_stats(static_cast<UdpPump*>(p)->jb, grows, shrinks,
                      delay_min, delay_max, delay_sum, active_streams);
}

// Copies each fresh slot's latest hop into out[slot * payload ...] and its
// flag into fresh[slot], then clears the fresh flags (a hop is delivered to
// exactly one tick).  Rows that are not fresh are left untouched — the
// caller decides whether stale rows mean silence (serve_main zeroes them).
// Returns the number of fresh slots, or -1 on the wrong pump kind.
int64_t lyra_pcm_pump_collect(void* h, uint8_t* out, uint8_t* fresh) {
  auto* p = static_cast<PumpBase*>(h);
  if (p->kind != 1) return -1;
  auto* pp = static_cast<PcmPump*>(p);
  std::lock_guard<std::mutex> lock(pp->mu);
  int64_t n = 0;
  for (int64_t s = 0; s < pp->capacity; ++s) {
    fresh[s] = pp->fresh[static_cast<size_t>(s)];
    if (fresh[s]) {
      std::memcpy(out + s * pp->payload,
                  &pp->staging[static_cast<size_t>(s * pp->payload)],
                  static_cast<size_t>(pp->payload));
      pp->fresh[static_cast<size_t>(s)] = 0;
      ++n;
    }
  }
  return n;
}

void lyra_pcm_pump_stats(void* h, int64_t* datagrams, int64_t* malformed,
                         int64_t* stale_drops, int64_t* resyncs) {
  auto* p = static_cast<PumpBase*>(h);
  if (p->kind != 1) {
    *datagrams = *malformed = *stale_drops = *resyncs = -1;
    return;
  }
  auto* pp = static_cast<PcmPump*>(p);
  std::lock_guard<std::mutex> lock(pp->mu);
  *datagrams = pp->datagrams;
  *malformed = pp->malformed_drops;
  *stale_drops = pp->drops;
  *resyncs = pp->resyncs;
}

// Slot churn on the encode relay: the next occupant must not inherit the
// previous caller's sequence clock, pending hop, or reply route.
int lyra_pcm_pump_reset_slot(void* h, int64_t slot) {
  auto* p = static_cast<PumpBase*>(h);
  if (p->kind != 1) return -1;
  auto* pp = static_cast<PcmPump*>(p);
  if (slot < 0 || slot >= pp->capacity) return -1;
  std::lock_guard<std::mutex> lock(pp->mu);
  pp->last_seq[static_cast<size_t>(slot)] = -1;
  pp->stale_run[static_cast<size_t>(slot)] = 0;
  pp->fresh[static_cast<size_t>(slot)] = 0;
  pp->sources[static_cast<size_t>(slot)] = SlotSource{};
  return 0;
}

// Copies the first `rows` last-seen uplink sources (network byte order)
// under the pump lock; `known[i]`=0 means slot i has never spoken.
// Returns how many of the copied rows are known.  Reply routing's bulk
// read — see lyra_egress_route_from_pump (udp_egress.cc).  Either kind.
int64_t lyra_pump_copy_sources(void* h, int64_t rows, uint32_t* ip_be,
                               uint16_t* port_be, uint8_t* known) {
  auto* p = static_cast<PumpBase*>(h);
  if (rows < 0 || rows > kMaxSlots) return -1;
  std::lock_guard<std::mutex> lock(p->mu);
  int64_t n = 0;
  for (int64_t i = 0; i < rows; ++i) {
    const SlotSource& s = p->sources[static_cast<size_t>(i)];
    ip_be[i] = s.ip_be;
    port_be[i] = s.port_be;
    known[i] = s.known;
    n += s.known;
  }
  return n;
}

// Benchmark sender: blasts `n` datagrams (header + payload_size zero
// bytes) to 127.0.0.1:port round-robin over `streams` slots, sequence
// numbers seq0 + send_index/streams, batched with sendmmsg.  Exists so
// ingest benchmarks aren't limited by a Python sender; returns datagrams
// actually sent.
int64_t lyra_pump_blast(int port, int64_t n, int64_t payload_size,
                        int64_t streams, int64_t seq0) {
  return BlastImpl(port, n, payload_size, streams, seq0,
                   kMaxDatagram - kHeaderBytes);
}

// Same sender without the codec-packet size cap (bounded by the UDP
// maximum), for PCM-hop-sized payloads against the PCM pump.
int64_t lyra_pump_blast2(int port, int64_t n, int64_t payload_size,
                         int64_t streams, int64_t seq0) {
  return BlastImpl(port, n, payload_size, streams, seq0,
                   kUdpMax - kHeaderBytes);
}

// ---- SO_REUSEPORT shard-group readers ---------------------------------------
//
// A shard group is N pumps on one port, each with its own jitter buffer /
// staging matrix and its own lock: the kernel's flow hash gives every
// caller a home shard, so the per-packet hot path never crosses shards.
// The per-tick readers below merge the group back into the single dense
// matrix the device step consumes.  They lock shards one at a time (never
// two at once — no ordering hazard) and are the ONLY safe way to drain a
// group: every shard's jitter buffer must advance every tick or a shard's
// playout clock would drift from the group's.

// Merged codec-packet collect over `n` shard pumps.  Per slot the first
// shard holding the due packet wins (slots live on one shard per flow;
// overlap only happens the tick a migrated flow's old shard still had a
// queued packet).  Outputs follow the lyra_jb_collect contract.  Returns
// packets received, or -1 on a wrong-kind handle.
int64_t lyra_pump_collect_merged(void** pumps, int n, int64_t capacity,
                                 int64_t packet_size, uint8_t* out,
                                 uint8_t* received, uint8_t* sizes) {
  std::memset(received, 0, static_cast<size_t>(capacity));
  std::memset(sizes, 0, static_cast<size_t>(capacity));
  // Scratch for the follower shards' collects.  thread_local, grow-only:
  // this runs 50x/s in the serving hot path from one serving thread, and
  // a fresh ~capacity*packet_size allocation per tick is avoidable churn
  // (n == 1, the unsharded degenerate case, never touches it at all).
  static thread_local std::vector<uint8_t> s_out, s_recv, s_size;
  if (n > 1) {
    s_out.resize(static_cast<size_t>(capacity * packet_size));
    s_recv.resize(static_cast<size_t>(capacity));
    s_size.resize(static_cast<size_t>(capacity));
  }
  int64_t total = 0;
  for (int k = 0; k < n; ++k) {
    auto* p = static_cast<PumpBase*>(pumps[k]);
    if (p->kind != 0) return -1;
    uint8_t* dst = (k == 0) ? out : s_out.data();
    uint8_t* rcv = (k == 0) ? received : s_recv.data();
    uint8_t* siz = (k == 0) ? sizes : s_size.data();
    {
      std::lock_guard<std::mutex> lock(p->mu);
      lyra_jb_collect(static_cast<UdpPump*>(p)->jb, dst, rcv, siz);
    }
    if (k == 0) {
      for (int64_t i = 0; i < capacity; ++i) total += received[i];
      continue;
    }
    for (int64_t i = 0; i < capacity; ++i) {
      if (!s_recv[static_cast<size_t>(i)] || received[i]) continue;
      received[i] = 1;
      sizes[i] = s_size[static_cast<size_t>(i)];
      if (sizes[i] > 0) {
        std::memcpy(out + i * packet_size,
                    s_out.data() + i * packet_size, sizes[i]);
      }
      ++total;
    }
  }
  return total;
}

// Merged PCM collect over `n` shard pumps: per slot the freshest-arrival
// shard's hop wins when several staged one this tick (shards share the
// group stamp clock only for *sources*; for hops the first shard wins —
// a slot staging on two shards at once is the one-tick migration overlap,
// where either hop is at most one sequence stale).  Returns fresh slots,
// or -1 on a wrong-kind handle.
int64_t lyra_pcm_pump_collect_merged(void** pumps, int n, uint8_t* out,
                                     uint8_t* fresh) {
  int64_t total = 0;
  int64_t capacity = 0;
  for (int k = 0; k < n; ++k) {
    auto* p = static_cast<PumpBase*>(pumps[k]);
    if (p->kind != 1) return -1;
    auto* pp = static_cast<PcmPump*>(p);
    if (k == 0) {
      capacity = pp->capacity;
      total = lyra_pcm_pump_collect(pumps[0], out, fresh);
      if (total < 0) return -1;
      continue;
    }
    if (pp->capacity != capacity) return -1;
    std::lock_guard<std::mutex> lock(pp->mu);
    for (int64_t s = 0; s < capacity; ++s) {
      if (!pp->fresh[static_cast<size_t>(s)]) continue;
      if (!fresh[s]) {
        std::memcpy(out + s * pp->payload,
                    &pp->staging[static_cast<size_t>(s * pp->payload)],
                    static_cast<size_t>(pp->payload));
        fresh[s] = 1;
        ++total;
      }
      pp->fresh[static_cast<size_t>(s)] = 0;  // delivered or superseded
    }
  }
  return total;
}

// Merged reply-source read over `n` shard pumps: per slot the source with
// the freshest group stamp wins (the shard that heard the slot last), and
// owner[i] reports which shard that was (-1 = never spoke).  Reply egress
// then partitions the downlink by owner so each slot's reply leaves from
// the socket its uplink arrived on (the NAT-valid 5-tuple).  Returns known
// slots, or -1 on bad rows.
int64_t lyra_pump_copy_sources_owned(void** pumps, int n, int64_t rows,
                                     uint32_t* ip_be, uint16_t* port_be,
                                     uint8_t* known, int32_t* owner) {
  if (rows < 0 || rows > kMaxSlots) return -1;
  std::vector<int64_t> best(static_cast<size_t>(rows), 0);
  std::memset(known, 0, static_cast<size_t>(rows));
  for (int64_t i = 0; i < rows; ++i) owner[i] = -1;
  std::vector<SlotSource> scratch(static_cast<size_t>(rows));
  for (int k = 0; k < n; ++k) {
    auto* p = static_cast<PumpBase*>(pumps[k]);
    {
      std::lock_guard<std::mutex> lock(p->mu);
      std::copy(p->sources.begin(), p->sources.begin() + rows,
                scratch.begin());
    }
    for (int64_t i = 0; i < rows; ++i) {
      const SlotSource& s = scratch[static_cast<size_t>(i)];
      if (!s.known || (known[i] && s.stamp <= best[static_cast<size_t>(i)])) {
        continue;
      }
      ip_be[i] = s.ip_be;
      port_be[i] = s.port_be;
      known[i] = 1;
      owner[i] = k;
      best[static_cast<size_t>(i)] = s.stamp;
    }
  }
  int64_t total = 0;
  for (int64_t i = 0; i < rows; ++i) total += known[i];
  return total;
}

// Merged adaptive-playout stats over `n` shard pumps.  grows/shrinks sum
// cleanly (only a slot's home shard ever observes its margins, so only it
// decides), but per-slot delay does NOT: every shard admits every slot at
// the same starting delay and only the home shard adapts it, so a naive
// min/max across shards always reports the stale initial copies.  This
// reader resolves each slot's home shard by source freshness (the shard
// that heard it last — the same rule reply routing uses) and reads the
// delay from there; slots nobody has heard from sit at their admission
// delay on every shard, so shard 0's copy is authoritative for them.
// Returns 0, or -1 on a wrong-kind handle / bad rows.
int lyra_pump_adapt_stats_merged(void** pumps, int n, int64_t rows,
                                 int64_t* grows, int64_t* shrinks,
                                 int64_t* delay_min, int64_t* delay_max,
                                 int64_t* delay_sum, int64_t* active) {
  if (rows < 0 || rows > kMaxSlots || n <= 0) return -1;
  std::vector<int32_t> owner(static_cast<size_t>(rows), 0);
  std::vector<int64_t> best(static_cast<size_t>(rows), 0);
  for (int k = 0; k < n; ++k) {
    auto* p = static_cast<PumpBase*>(pumps[k]);
    if (p->kind != 0) return -1;
    std::lock_guard<std::mutex> lock(p->mu);
    for (int64_t i = 0; i < rows; ++i) {
      const SlotSource& s = p->sources[static_cast<size_t>(i)];
      if (s.known && s.stamp > best[static_cast<size_t>(i)]) {
        best[static_cast<size_t>(i)] = s.stamp;
        owner[static_cast<size_t>(i)] = k;
      }
    }
  }
  *grows = 0;
  *shrinks = 0;
  *delay_min = 0;
  *delay_max = 0;
  *delay_sum = 0;
  *active = 0;
  bool first = true;
  for (int k = 0; k < n; ++k) {
    auto* p = static_cast<UdpPump*>(static_cast<PumpBase*>(pumps[k]));
    std::lock_guard<std::mutex> lock(p->mu);
    int64_t g, sh, dmin, dmax, dsum, act;
    lyra_jb_adapt_stats(p->jb, &g, &sh, &dmin, &dmax, &dsum, &act);
    *grows += g;
    *shrinks += sh;
    for (int64_t i = 0; i < rows; ++i) {
      if (owner[static_cast<size_t>(i)] != k) continue;
      const int64_t d = lyra_jb_delay2(p->jb, i);
      if (d < 0) continue;  // inactive on its home shard: not serving
      ++*active;
      *delay_sum += d;
      if (first || d < *delay_min) *delay_min = d;
      if (first || d > *delay_max) *delay_max = d;
      first = false;
    }
  }
  return 0;
}

// Merged adaptive-evidence export over `n` shard pumps: a slot's learned
// delay and shrink streak live on its HOME shard (only the shard a flow
// hashes to observes its margins and adapts), resolved by source
// freshness — the same owner rule as adapt-stats/heads.  Never-heard
// slots read from shard 0 (identical everywhere: the add_stream base).
// Both buffers must hold `rows` entries.  Returns 0, or -1 on a
// wrong-kind handle / bad rows.
int lyra_pump_jb_adapt_export_merged(void** pumps, int n, int64_t rows,
                                     int64_t* delay0_out,
                                     int64_t* votes_out) {
  if (rows < 0 || rows > kMaxSlots || n <= 0) return -1;
  std::vector<int32_t> owner(static_cast<size_t>(rows), 0);
  std::vector<int64_t> best(static_cast<size_t>(rows), 0);
  for (int k = 0; k < n; ++k) {
    auto* p = static_cast<PumpBase*>(pumps[k]);
    if (p->kind != 0) return -1;
    std::lock_guard<std::mutex> lock(p->mu);
    for (int64_t i = 0; i < rows; ++i) {
      const SlotSource& s = p->sources[static_cast<size_t>(i)];
      if (s.known && s.stamp > best[static_cast<size_t>(i)]) {
        best[static_cast<size_t>(i)] = s.stamp;
        owner[static_cast<size_t>(i)] = k;
      }
    }
  }
  for (int k = 0; k < n; ++k) {
    auto* p = static_cast<UdpPump*>(static_cast<PumpBase*>(pumps[k]));
    std::lock_guard<std::mutex> lock(p->mu);
    for (int64_t i = 0; i < rows; ++i) {
      if (owner[static_cast<size_t>(i)] != k) continue;
      // Bounds-checked per-slot reads (the merged reader cannot assume
      // its rows match every member buffer's capacity).
      delay0_out[i] = lyra_jb_delay2(p->jb, i);
      votes_out[i] = lyra_jb_votes2(p->jb, i);
    }
  }
  return 0;
}

// Merged playout-schedule export over `n` shard pumps (see lyra_jb_heads).
// Heads advance in lockstep across shards (merged collect drains every
// member), but a RESYNC repoints only the home shard's copy, so each
// slot's head is read from its home shard — resolved by source freshness,
// the same rule as adapt-stats and reply routing; never-heard slots are
// identical everywhere, so shard 0's copy is authoritative for them.
// heads_out must hold `rows` entries.  Returns 0, or -1 on a wrong-kind
// handle / bad rows.
int lyra_pump_jb_heads_merged(void** pumps, int n, int64_t rows,
                              int64_t* heads_out) {
  if (rows < 0 || rows > kMaxSlots || n <= 0) return -1;
  std::vector<int32_t> owner(static_cast<size_t>(rows), 0);
  std::vector<int64_t> best(static_cast<size_t>(rows), 0);
  for (int k = 0; k < n; ++k) {
    auto* p = static_cast<PumpBase*>(pumps[k]);
    if (p->kind != 0) return -1;
    std::lock_guard<std::mutex> lock(p->mu);
    for (int64_t i = 0; i < rows; ++i) {
      const SlotSource& s = p->sources[static_cast<size_t>(i)];
      if (s.known && s.stamp > best[static_cast<size_t>(i)]) {
        best[static_cast<size_t>(i)] = s.stamp;
        owner[static_cast<size_t>(i)] = k;
      }
    }
  }
  for (int k = 0; k < n; ++k) {
    auto* p = static_cast<UdpPump*>(static_cast<PumpBase*>(pumps[k]));
    std::lock_guard<std::mutex> lock(p->mu);
    for (int64_t i = 0; i < rows; ++i) {
      if (owner[static_cast<size_t>(i)] == k) {
        heads_out[i] = lyra_jb_head(p->jb, i);
      }
    }
  }
  return 0;
}

// Blast variant for shard-group benches: rotates `nsrc` source sockets
// with per-slot affinity (socket = slot % nsrc), so the receiver's
// SO_REUSEPORT flow hash actually distributes the load the way `nsrc`
// independent callers would — one sender socket always hashes every
// datagram to the same shard, which would bench a group as one pump.
int64_t lyra_pump_blast_multi(int port, int64_t n, int64_t payload_size,
                              int64_t streams, int64_t seq0, int nsrc) {
  if (nsrc <= 0 || nsrc > 1024 || streams <= 0 || payload_size < 0 ||
      payload_size > kUdpMax - kHeaderBytes) {
    return -1;
  }
  std::vector<int> fds(static_cast<size_t>(nsrc), -1);
  sockaddr_in addr{};
  addr.sin_family = AF_INET;
  addr.sin_addr.s_addr = htonl(INADDR_LOOPBACK);
  addr.sin_port = htons(static_cast<uint16_t>(port));
  for (int i = 0; i < nsrc; ++i) {
    fds[static_cast<size_t>(i)] = socket(AF_INET, SOCK_DGRAM, 0);
    if (fds[static_cast<size_t>(i)] < 0) {
      for (int j = 0; j < i; ++j) close(fds[static_cast<size_t>(j)]);
      return -1;
    }
  }
  const int dlen = kHeaderBytes + static_cast<int>(payload_size);
  std::vector<uint8_t> bufs(static_cast<size_t>(kBatch) * dlen, 0);
  mmsghdr msgs[kBatch];
  iovec iovs[kBatch];
  for (int i = 0; i < kBatch; ++i) {
    iovs[i] = {bufs.data() + static_cast<size_t>(i) * dlen,
               static_cast<size_t>(dlen)};
    std::memset(&msgs[i], 0, sizeof(msgs[i]));
    msgs[i].msg_hdr.msg_name = &addr;
    msgs[i].msg_hdr.msg_namelen = sizeof(addr);
    msgs[i].msg_hdr.msg_iov = &iovs[i];
    msgs[i].msg_hdr.msg_iovlen = 1;
  }
  // Send order: per sequence round, per source socket, that source's
  // affine slots (slot ≡ src mod nsrc) in sendmmsg batches — one fd per
  // batch, one flow per slot, consecutive sequences per slot.
  int64_t sent = 0;
  bool backpressure = false;
  for (int64_t r = 0; sent < n && !backpressure; ++r) {
    const int64_t seq = seq0 + r;
    for (int src = 0; src < nsrc && sent < n && !backpressure; ++src) {
      for (int64_t s = src; s < streams && sent < n;) {
        int want = 0;
        while (want < kBatch && s < streams && sent + want < n) {
          uint8_t* d = bufs.data() + static_cast<size_t>(want) * dlen;
          d[0] = static_cast<uint8_t>(s >> 8);
          d[1] = static_cast<uint8_t>(s);
          d[2] = static_cast<uint8_t>(seq >> 24);
          d[3] = static_cast<uint8_t>(seq >> 16);
          d[4] = static_cast<uint8_t>(seq >> 8);
          d[5] = static_cast<uint8_t>(seq);
          s += nsrc;
          ++want;
        }
        if (want == 0) break;
        int done = sendmmsg(fds[static_cast<size_t>(src)], msgs, want, 0);
        if (done <= 0) {  // ENOBUFS etc.: report what actually went out
          backpressure = true;
          break;
        }
        sent += done;
        if (done < want) {  // partial batch: the rest of it is lost traffic
          backpressure = true;
          break;
        }
      }
    }
  }
  for (int i = 0; i < nsrc; ++i) close(fds[static_cast<size_t>(i)]);
  return sent;
}

}  // extern "C"
