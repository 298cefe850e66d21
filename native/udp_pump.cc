// Native UDP ingest pump for the Lyra-TPU serving runtime.
//
// At fleet scale the transport side is per-packet work the batched device
// tick never sees: tens of thousands of streams x 50 packets/s is millions
// of datagrams per second, far past what a per-datagram Python loop can
// drain.  This component owns the socket end to end in C++: a receiver
// thread batch-drains the socket with recvmmsg, parses the wire header
// (2 B stream slot + 4 B sequence, big-endian — the layout
// examples/udp_call.py established), and files payloads straight into the
// native jitter buffer (jitter_buffer.cc) under one lock per batch.  The
// serving loop only ever sees the dense per-tick collect() matrix.
//
// The reference has no transport layer at all (its decoder CLI reads a
// file and simulates loss, lyra/cli_example/decoder_main_lib.cc:86-219);
// like the jitter buffer this is the deployment-scale equivalent, native
// because it runs per packet.
//
// Concurrency: the pump's mutex serializes the receiver thread against
// collect/add_stream/remove_stream, which MUST therefore go through the
// pump (lyra_pump_*) rather than the raw lyra_jb_* calls while the pump
// is running.

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
}

namespace {

constexpr int kHeaderBytes = 6;   // 2 B slot + 4 B seq, big-endian
constexpr int kBatch = 256;       // datagrams per recvmmsg call
constexpr int kMaxDatagram = 64;  // header + widest Lyra packet (23 B)

// Last-seen uplink source per slot (the 2-byte wire slot field bounds the
// table).  Reply routing (lyra_egress_route_from_pump, udp_egress.cc)
// copies these into the egress destination table so downlink datagrams go
// back where the uplink came from — the real-MCU shape.
constexpr int kMaxSlots = 65536;

struct SlotSource {
  uint32_t ip_be = 0;   // network byte order
  uint16_t port_be = 0; // network byte order
  uint8_t known = 0;
};

struct UdpPump {
  void* jb = nullptr;
  int fd = -1;
  int port = 0;
  std::mutex mu;  // receiver thread vs collect/admission
  std::thread receiver;
  std::atomic<bool> stop{false};
  // stats (mu-guarded)
  int64_t datagrams = 0;       // well-formed datagrams filed into the buffer
  int64_t malformed_drops = 0; // shorter than the header, or kernel-truncated
                               // past kMaxDatagram (MSG_TRUNC) — filing a
                               // truncated payload would decode as garbage
  int64_t insert_drops = 0;    // filed but dropped by the jitter buffer
                               // (late/dup/overflow/inactive — its counters
                               // hold the breakdown)
  std::vector<SlotSource> sources = std::vector<SlotSource>(kMaxSlots);

  void Run() {
    std::vector<uint8_t> bufs(kBatch * kMaxDatagram);
    sockaddr_in srcs[kBatch];
    mmsghdr msgs[kBatch];
    iovec iovs[kBatch];
    for (int i = 0; i < kBatch; ++i) {
      iovs[i] = {bufs.data() + i * kMaxDatagram, kMaxDatagram};
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
        const uint8_t* d = bufs.data() + i * kMaxDatagram;
        const int len = static_cast<int>(msgs[i].msg_len);
        if (len < kHeaderBytes ||
            (msgs[i].msg_hdr.msg_flags & MSG_TRUNC) != 0) {
          ++malformed_drops;
          continue;
        }
        const int64_t slot = (int64_t{d[0]} << 8) | d[1];
        const int64_t seq = (int64_t{d[2]} << 24) | (int64_t{d[3]} << 16) |
                            (int64_t{d[4]} << 8) | d[5];
        ++datagrams;
        if (lyra_jb_insert(jb, slot, seq, d + kHeaderBytes,
                           len - kHeaderBytes) != 0) {
          ++insert_drops;  // counted transport event, never fatal
        } else if (msgs[i].msg_hdr.msg_namelen >= sizeof(sockaddr_in) &&
                   srcs[i].sin_family == AF_INET) {
          // Learn the reply route only from datagrams the jitter buffer
          // accepted (active slot, in-window sequence): rejected traffic
          // (inactive/late/dup/overflow) must not repoint a slot's
          // downlink.  Note this is plain-RTP-grade trust — an on-path or
          // guessing sender that lands a valid (slot, seq) still steers
          // the route; deployments that need more wrap the transport in
          // DTLS/SRTP, which the reference leaves to the app layer too.
          auto& s = sources[static_cast<size_t>(slot)];
          s.ip_be = srcs[i].sin_addr.s_addr;
          s.port_be = srcs[i].sin_port;
          s.known = 1;
        }
      }
    }
  }
};

}  // namespace

extern "C" {

// Binds 0.0.0.0:port (port 0 = ephemeral; read back with lyra_pump_port)
// and starts the receiver thread.  Returns nullptr on socket failure.
void* lyra_pump_create(void* jb, int port) {
  if (jb == nullptr) return nullptr;
  int fd = socket(AF_INET, SOCK_DGRAM, 0);
  if (fd < 0) return nullptr;
  int rcvbuf = 8 * 1024 * 1024;  // burst headroom: ~100k queued datagrams
  setsockopt(fd, SOL_SOCKET, SO_RCVBUF, &rcvbuf, sizeof(rcvbuf));
  sockaddr_in addr{};
  addr.sin_family = AF_INET;
  addr.sin_addr.s_addr = htonl(INADDR_ANY);
  addr.sin_port = htons(static_cast<uint16_t>(port));
  if (bind(fd, reinterpret_cast<sockaddr*>(&addr), sizeof(addr)) != 0) {
    close(fd);
    return nullptr;
  }
  socklen_t alen = sizeof(addr);
  getsockname(fd, reinterpret_cast<sockaddr*>(&addr), &alen);
  auto* p = new UdpPump;
  p->jb = jb;
  p->fd = fd;
  p->port = ntohs(addr.sin_port);
  p->receiver = std::thread([p] { p->Run(); });
  return p;
}

int lyra_pump_port(void* h) { return static_cast<UdpPump*>(h)->port; }

// The pump's socket fd, for reply-mode egress on the same socket
// (lyra_egress_create_on_pump, udp_egress.cc): downlink must leave from
// the port the uplink was addressed to or NAT'd callers never see it.
int lyra_pump_get_fd(void* h) { return static_cast<UdpPump*>(h)->fd; }

// Largest datagram the receive buffers hold (header + payload); callers
// validate their packet_size against this at construction, loudly.
int lyra_pump_max_datagram(void) { return kMaxDatagram; }

void lyra_pump_destroy(void* h) {
  auto* p = static_cast<UdpPump*>(h);
  p->stop.store(true);
  if (p->receiver.joinable()) p->receiver.join();
  close(p->fd);
  delete p;
}

// Locked pass-throughs: the only safe way to touch the jitter buffer while
// the receiver thread is live.
int lyra_pump_add_stream(void* h, int64_t stream, int64_t start_seq,
                         int64_t playout_delay) {
  auto* p = static_cast<UdpPump*>(h);
  std::lock_guard<std::mutex> lock(p->mu);
  // A slot changing hands must not inherit the previous occupant's reply
  // route: downlink for the new participant would leak to the departed
  // caller's address until the new one first speaks.
  if (stream >= 0 && stream < kMaxSlots) {
    p->sources[static_cast<size_t>(stream)] = SlotSource{};
  }
  return lyra_jb_add_stream(p->jb, stream, start_seq, playout_delay);
}

int lyra_pump_remove_stream(void* h, int64_t stream) {
  auto* p = static_cast<UdpPump*>(h);
  std::lock_guard<std::mutex> lock(p->mu);
  if (stream >= 0 && stream < kMaxSlots) {
    p->sources[static_cast<size_t>(stream)] = SlotSource{};  // see add
  }
  return lyra_jb_remove_stream(p->jb, stream);
}

int64_t lyra_pump_collect(void* h, uint8_t* out, uint8_t* received,
                          uint8_t* sizes) {
  auto* p = static_cast<UdpPump*>(h);
  std::lock_guard<std::mutex> lock(p->mu);
  return lyra_jb_collect(p->jb, out, received, sizes);
}

void lyra_pump_stats(void* h, int64_t* datagrams, int64_t* malformed_drops,
                     int64_t* insert_drops) {
  auto* p = static_cast<UdpPump*>(h);
  std::lock_guard<std::mutex> lock(p->mu);
  *datagrams = p->datagrams;
  *malformed_drops = p->malformed_drops;
  *insert_drops = p->insert_drops;
}

// Locked jitter-buffer drop breakdown: the jb counters are plain int64s
// the receiver thread increments, so reading them through the raw
// lyra_jb_stats2 while the pump is live would be a data race.
void lyra_pump_jb_stats(void* h, int64_t* late, int64_t* dup,
                        int64_t* overflow, int64_t* inactive) {
  auto* p = static_cast<UdpPump*>(h);
  std::lock_guard<std::mutex> lock(p->mu);
  lyra_jb_stats2(p->jb, late, dup, overflow, inactive);
}

int64_t lyra_pump_jb_resyncs(void* h) {
  auto* p = static_cast<UdpPump*>(h);
  std::lock_guard<std::mutex> lock(p->mu);
  return lyra_jb_resyncs(p->jb);
}

// Copies the first `rows` last-seen uplink sources (network byte order)
// under the pump lock; `known[i]`=0 means slot i has never spoken.
// Returns how many of the copied rows are known.  Reply routing's bulk
// read — see lyra_egress_route_from_pump (udp_egress.cc).
int64_t lyra_pump_copy_sources(void* h, int64_t rows, uint32_t* ip_be,
                               uint16_t* port_be, uint8_t* known) {
  auto* p = static_cast<UdpPump*>(h);
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
  if (streams <= 0 || payload_size < 0 ||
      payload_size > kMaxDatagram - kHeaderBytes) {
    return -1;
  }
  int fd = socket(AF_INET, SOCK_DGRAM, 0);
  if (fd < 0) return -1;
  sockaddr_in addr{};
  addr.sin_family = AF_INET;
  addr.sin_addr.s_addr = htonl(INADDR_LOOPBACK);
  addr.sin_port = htons(static_cast<uint16_t>(port));
  const int dlen = kHeaderBytes + static_cast<int>(payload_size);
  std::vector<uint8_t> bufs(kBatch * dlen, 0);
  mmsghdr msgs[kBatch];
  iovec iovs[kBatch];
  for (int i = 0; i < kBatch; ++i) {
    iovs[i] = {bufs.data() + i * dlen, static_cast<size_t>(dlen)};
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
      uint8_t* d = bufs.data() + i * dlen;
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

}  // extern "C"
