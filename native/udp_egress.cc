// Native UDP egress for the Lyra-TPU serving runtime.
//
// The send side of the transport mirrors the ingest pump
// (udp_pump.cc): a serving tick produces a dense wire matrix
// ([capacity, stride] bytes + per-slot sizes), and fanning it out as one
// datagram per active slot is per-packet work — tens of thousands of
// sendto() calls per 20 ms tick if done from Python.  This component
// takes the matrix and a per-slot destination table and issues the whole
// tick's fan-out as sendmmsg batches with zero per-datagram Python: the
// 6-byte wire header (2 B slot + 4 B big-endian sequence, the
// examples/udp_call.py layout) is built into a scratch area and the
// payload rides straight out of the caller's matrix via a second iovec
// (zero-copy).
//
// The reference has no transport layer (its CLIs read/write files,
// reference: lyra/cli_example/decoder_main_lib.cc:86-219); like the
// jitter buffer and the ingest pump this is the deployment-scale
// equivalent, native because it runs per packet.
//
// Threading: unlike the pump there is no background thread — send happens
// on the serving loop's tick, so the object is single-threaded by
// contract.  Transport-level backpressure (sendmmsg short count / ENOBUFS)
// is a counted drop, never an error out of the tick; malformed *caller*
// geometry (a size exceeding the matrix stride) is refused loudly.

#include <arpa/inet.h>
#include <netinet/in.h>
#include <sys/socket.h>
#include <unistd.h>

#include <algorithm>
#include <cstdint>
#include <cstring>
#include <vector>

namespace {

constexpr int kHeaderBytes = 6;  // 2 B slot + 4 B seq, big-endian
constexpr int kBatch = 256;      // datagrams per sendmmsg call

struct UdpEgress {
  int fd = -1;
  bool own_fd = true;  // borrowed fds (reply mode on the pump socket)
                       // are closed by their owner, not here
  std::vector<sockaddr_in> dests;  // per-slot destination
  std::vector<uint8_t> has_dest;
  // stats
  int64_t sent = 0;          // datagrams handed to the kernel
  int64_t no_dest_drops = 0; // active slot without a destination
  int64_t kernel_drops = 0;  // sendmmsg backpressure (short count/ENOBUFS)
};

UdpEgress* MakeEgress(int fd, bool own_fd, int64_t capacity) {
  auto* e = new UdpEgress;
  e->fd = fd;
  e->own_fd = own_fd;
  e->dests.resize(static_cast<size_t>(capacity));
  e->has_dest.assign(static_cast<size_t>(capacity), 0);
  return e;
}

}  // namespace

extern "C" {

// udp_pump.cc (same shared library).
int lyra_pump_get_fd(void* h);

// One socket, `capacity` slot destinations (unset until
// lyra_egress_set_dest).  Capacity is bounded by the 2-byte wire slot
// field — a larger table would silently alias slots in the header.
// Returns nullptr on socket failure or bad capacity.
void* lyra_egress_create(int64_t capacity) {
  if (capacity <= 0 || capacity > 65536) return nullptr;
  int fd = socket(AF_INET, SOCK_DGRAM, 0);
  if (fd < 0) return nullptr;
  int sndbuf = 8 * 1024 * 1024;  // burst headroom, mirroring the pump
  setsockopt(fd, SOL_SOCKET, SO_SNDBUF, &sndbuf, sizeof(sndbuf));
  return MakeEgress(fd, /*own_fd=*/true, capacity);
}

// Egress on the ingest pump's own socket: downlink leaves from the exact
// address:port the uplink was sent to, so a caller behind a
// port-restricted/symmetric NAT (whose mapping is per 5-tuple) receives
// it — required for --echo reply beyond loopback.  Concurrent recvmmsg
// (pump thread) and sendmmsg (serving thread) on one UDP socket are
// kernel-safe.  The fd stays owned by the pump; destroy this egress
// BEFORE the pump.
void* lyra_egress_create_on_pump(void* pump, int64_t capacity) {
  if (pump == nullptr || capacity <= 0 || capacity > 65536) return nullptr;
  int fd = lyra_pump_get_fd(pump);
  if (fd < 0) return nullptr;
  return MakeEgress(fd, /*own_fd=*/false, capacity);
}

void lyra_egress_destroy(void* h) {
  auto* e = static_cast<UdpEgress*>(h);
  if (e->own_fd) close(e->fd);
  delete e;
}

// Route `slot`'s datagrams to ip:port (dotted-quad; resolve hostnames on
// the caller side).  slot == -1 sets every slot (the --echo single-sink
// case).  Returns 0 ok, nonzero on bad slot/ip/port.
int lyra_egress_set_dest(void* h, int64_t slot, const char* ip, int port) {
  auto* e = static_cast<UdpEgress*>(h);
  if (port <= 0 || port > 65535) return 1;
  sockaddr_in addr{};
  addr.sin_family = AF_INET;
  addr.sin_port = htons(static_cast<uint16_t>(port));
  if (inet_pton(AF_INET, ip, &addr.sin_addr) != 1) return 2;
  if (slot == -1) {
    std::fill(e->dests.begin(), e->dests.end(), addr);
    std::fill(e->has_dest.begin(), e->has_dest.end(), uint8_t{1});
    return 0;
  }
  if (slot < 0 || slot >= static_cast<int64_t>(e->dests.size())) return 3;
  e->dests[static_cast<size_t>(slot)] = addr;
  e->has_dest[static_cast<size_t>(slot)] = 1;
  return 0;
}

// One tick's fan-out over the row range [row0, row1): for every slot with
// sizes[slot] > 0 and a destination, send header + wire[slot,
// :sizes[slot]].  `wire` is row-major [rows, stride]; `seq` stamps every
// header.  Row indices are absolute (the wire header carries the real slot
// id), so a striped multi-core send is N egress objects — each with its
// own socket and stats, single-threaded by contract — sending disjoint
// ranges of one matrix concurrently (ctypes releases the GIL around the
// call).  `count_unrouted` = 0 skips active-but-unrouted rows silently:
// the owner-partitioned reply path (lyra_pump_copy_sources_owned) routes
// every slot on exactly one shard egress, so on the others the same slot
// is someone else's row, not a drop.  Returns datagrams handed to the
// kernel, or -1 on bad geometry (nothing sent for that call).
int64_t lyra_egress_send_range(void* h, const uint8_t* wire,
                               const int32_t* sizes, int64_t rows,
                               int64_t stride, int64_t seq, int64_t row0,
                               int64_t row1, int count_unrouted) {
  auto* e = static_cast<UdpEgress*>(h);
  if (rows < 0 || rows > static_cast<int64_t>(e->dests.size()) ||
      row0 < 0 || row1 > rows || row0 > row1) {
    return -1;
  }
  for (int64_t i = row0; i < row1; ++i) {
    if (sizes[i] > stride) return -1;  // would send bytes past the row
  }
  uint8_t headers[kBatch][kHeaderBytes];
  mmsghdr msgs[kBatch];
  iovec iovs[kBatch][2];
  int64_t sent_total = 0;
  int n = 0;
  auto flush = [&]() {
    int off = 0;
    while (off < n) {
      int done = sendmmsg(e->fd, msgs + off, n - off, 0);
      if (done <= 0) {  // backpressure: count the remainder, keep serving
        e->kernel_drops += n - off;
        break;
      }
      off += done;
      sent_total += done;
    }
    n = 0;
  };
  for (int64_t i = row0; i < row1; ++i) {
    if (sizes[i] <= 0) continue;  // inactive slot, not a drop
    if (!e->has_dest[static_cast<size_t>(i)]) {
      if (count_unrouted) ++e->no_dest_drops;
      continue;
    }
    uint8_t* hd = headers[n];
    hd[0] = static_cast<uint8_t>(i >> 8);
    hd[1] = static_cast<uint8_t>(i);
    hd[2] = static_cast<uint8_t>(seq >> 24);
    hd[3] = static_cast<uint8_t>(seq >> 16);
    hd[4] = static_cast<uint8_t>(seq >> 8);
    hd[5] = static_cast<uint8_t>(seq);
    iovs[n][0] = {hd, kHeaderBytes};
    iovs[n][1] = {const_cast<uint8_t*>(wire + i * stride),
                  static_cast<size_t>(sizes[i])};
    std::memset(&msgs[n], 0, sizeof(msgs[n]));
    msgs[n].msg_hdr.msg_name = &e->dests[static_cast<size_t>(i)];
    msgs[n].msg_hdr.msg_namelen = sizeof(sockaddr_in);
    msgs[n].msg_hdr.msg_iov = iovs[n];
    msgs[n].msg_hdr.msg_iovlen = 2;
    if (++n == kBatch) flush();
  }
  flush();
  e->sent += sent_total;
  return sent_total;
}

int64_t lyra_egress_send(void* h, const uint8_t* wire, const int32_t* sizes,
                         int64_t rows, int64_t stride, int64_t seq) {
  return lyra_egress_send_range(h, wire, sizes, rows, stride, seq, 0, rows,
                                /*count_unrouted=*/1);
}

// Authoritative bulk routing from a caller-supplied table: slots with
// routed[i] != 0 get ip_be[i]:port_be[i] (network byte order), all others
// lose any route they had (same churn-safety rule as route_from_pump).
// This is how the owner-partitioned reply path programs each shard's
// egress: the caller masks the merged source table
// (lyra_pump_copy_sources_owned) down to owner == shard before the call.
// Returns slots routed, or -1 on bad rows.
int64_t lyra_egress_route_from_table(void* h, int64_t rows,
                                     const uint32_t* ip_be,
                                     const uint16_t* port_be,
                                     const uint8_t* routed) {
  auto* e = static_cast<UdpEgress*>(h);
  if (rows < 0 || rows > static_cast<int64_t>(e->dests.size())) return -1;
  int64_t n = 0;
  for (int64_t i = 0; i < rows; ++i) {
    if (!routed[i]) {
      e->has_dest[static_cast<size_t>(i)] = 0;
      continue;
    }
    sockaddr_in addr{};
    addr.sin_family = AF_INET;
    addr.sin_addr.s_addr = ip_be[i];
    addr.sin_port = port_be[i];
    e->dests[static_cast<size_t>(i)] = addr;
    e->has_dest[static_cast<size_t>(i)] = 1;
    ++n;
  }
  // Rows past the table (rows < capacity) keep their routes — the caller
  // passes the full capacity in practice; anything else is intentional.
  return n;
}

// udp_pump.cc (same shared library).
int64_t lyra_pump_copy_sources(void* h, int64_t rows, uint32_t* ip_be,
                               uint16_t* port_be, uint8_t* known);

// Reply routing: make the pump's source table authoritative for this
// egress — slots with a last-seen uplink source get it as their route,
// slots without one (never spoke, or cleared by slot churn) lose any
// route they had.  Clearing matters: keeping a stale route after
// remove_stream/add_stream would leak the new occupant's downlink to the
// departed caller's address.  (Consequently set_dest and route_from_pump
// don't compose — reply mode owns the whole table.)  One native call per
// tick; returns how many slots are routed, or -1 on a null pump.
int64_t lyra_egress_route_from_pump(void* h, void* pump) {
  auto* e = static_cast<UdpEgress*>(h);
  if (pump == nullptr) return -1;
  const int64_t rows = static_cast<int64_t>(e->dests.size());
  std::vector<uint32_t> ip(static_cast<size_t>(rows));
  std::vector<uint16_t> port(static_cast<size_t>(rows));
  std::vector<uint8_t> known(static_cast<size_t>(rows));
  if (lyra_pump_copy_sources(pump, rows, ip.data(), port.data(),
                             known.data()) < 0) {
    return -1;
  }
  int64_t routed = 0;
  for (int64_t i = 0; i < rows; ++i) {
    if (!known[static_cast<size_t>(i)]) {
      e->has_dest[static_cast<size_t>(i)] = 0;
      continue;
    }
    sockaddr_in addr{};
    addr.sin_family = AF_INET;
    addr.sin_addr.s_addr = ip[static_cast<size_t>(i)];
    addr.sin_port = port[static_cast<size_t>(i)];
    e->dests[static_cast<size_t>(i)] = addr;
    e->has_dest[static_cast<size_t>(i)] = 1;
    ++routed;
  }
  return routed;
}

void lyra_egress_stats(void* h, int64_t* sent, int64_t* no_dest_drops,
                       int64_t* kernel_drops) {
  auto* e = static_cast<UdpEgress*>(h);
  *sent = e->sent;
  *no_dest_drops = e->no_dest_drops;
  *kernel_drops = e->kernel_drops;
}

}  // extern "C"
