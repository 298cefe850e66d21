// Per-stream jitter buffer for the Lyra-TPU serving runtime.
//
// Real-time transport delivers packets out of order, duplicated, bursty or
// late; the batched decode engine consumes exactly one packet per stream
// per 20 ms tick.  This component is the native scheduler between the two:
// a fixed-capacity table of per-stream sequence-indexed ring slots.
// `insert` files a packet under its sequence number (dropping duplicates
// and too-late arrivals); `collect` drains one tick for every stream at
// once, emitting a dense [capacity, packet_size] matrix plus a received
// mask — exactly the shape the TPU step consumes.  The reference has no
// transport layer (its CLI reads a file, lyra/cli_example/decoder_main_
// lib.cc:86-219, and loss is simulated); this is the deployment-scale
// equivalent, in C++ because it runs per packet per stream.
//
// Concurrency model: single writer thread per buffer (or external locking).
// All functions are O(1) per packet.

// Adaptive playout delay (opt-in via lyra_jb_set_adaptive): per slot the
// buffer tracks the arrival margin of every insert — how many ticks of
// cushion the packet had before being too late (seq - head_seq; negative
// = it WAS late).  Every `window` ticks it decides per slot:
//   - window-min margin < 0  → grow the playout delay by the observed
//     lateness (bounded by max_delay), realized as a pause: the slot
//     emits nothing for the added ticks (PLC conceals) and every later
//     packet plays that much later but safer.
//   - window-min margin >= 2 for kShrinkVotes consecutive windows → the
//     cushion was never needed: shrink by one tick (bounded by
//     min_delay), realized as a one-packet skip (playout jumps 20 ms;
//     cheaper than carrying permanent latency).
// Decisions and the current per-slot delay are exposed in stats so an
// operator can see the buffer's latency position, not just drop counts.
// The reference has no transport; the PLC machine this protects is
// reference: lyra/lyra_decoder.cc:228-315.

#include <algorithm>
#include <cstdint>
#include <cstring>
#include <vector>

namespace {

struct Slot {
  bool occupied = false;
  int64_t seq = -1;
};

// Sentinel: no insert observed this window (sender silent) — no decision.
constexpr int64_t kNoMargin = INT64_MAX;
// Consecutive all-comfortable windows before giving back a tick of delay:
// shrinking is a deliberate playout jump, so it must be earned.
constexpr int64_t kShrinkVotes = 3;

// Sequence-number ceiling.  Wire sequences are 4 bytes (< 2^32); heads
// only move to an accepted sequence or forward by one per tick, so under
// this bound every head computation (head + depth, head + 1, head -
// ad_max) stays far from int64 overflow.  An API caller passing an absurd
// sequence (corrupt snapshot, bad FFI math) is refused/counted loudly
// instead of driving head arithmetic into signed-overflow UB — found by
// the sanitizer fuzz gate (native/fuzz_native.cc).
constexpr int64_t kMaxSeq = int64_t{1} << 62;

// Consecutive out-of-window inserts on one stream before its playout
// point resyncs to the arriving sequence.  >1 so a single stray (or
// hostile) packet cannot repoint a healthy stream's schedule; small so
// the stream recovers within ~60 ms of traffic.  Applies to the
// desync classes: overflow (receiver's schedule behind the sender —
// receiver stall, sender with a later origin) and FAR-late (sender more
// than a full ring depth behind — e.g. a migration standby whose head
// advanced every tick before its caller started sending; both sides
// advance 50/s, so the gap never closes without a resync).
constexpr int64_t kResyncAfter = 3;

// NEAR-late (behind head by at most the ring depth) is ambiguous: it is
// either transient network jitter (a delay burst that will pass — must
// NOT repoint the schedule, or a 3-packet burst converts into permanent
// extra playout latency) or a persistent small shift (a standby that
// ticked a few times before its caller's origin — gap never closes, so
// it MUST eventually resync or the stream is dead forever).  The
// discriminator is persistence: a jitter burst is followed by in-window
// arrivals (which reset the streak); a shift makes EVERY packet late.
// Half a second of uninterrupted late traffic is conclusively a shift.
constexpr int64_t kNearLateResyncAfter = 25;

struct JitterBuffer {
  int64_t capacity;      // streams
  int64_t packet_size;   // bytes per packet (max)
  int64_t depth;         // ring depth in packets
  std::vector<Slot> slots;       // [capacity * depth]
  std::vector<uint8_t> payload;  // [capacity * depth * packet_size]
  std::vector<uint8_t> sizes;    // actual size per slot (DTX empty = 0)
  std::vector<int64_t> head_seq; // next sequence to play, per stream
  std::vector<int64_t> delay;    // remaining playout-delay ticks, per stream
  std::vector<int64_t> delay0;   // configured playout delay (for resync)
  std::vector<int64_t> streak;   // consecutive overflow inserts, per stream
  std::vector<uint8_t> active;   // stream slot in use
  // stats
  int64_t late_drops = 0, dup_drops = 0, overflow_drops = 0;
  int64_t inactive_drops = 0;
  int64_t resyncs = 0;
  int64_t red_heals = 0;  // redundant copies that filled a real hole
  // adaptive playout (all zero = disabled, the static-depth default)
  int64_t ad_min = 0, ad_max = 0, ad_window = 0;
  std::vector<int64_t> margin_min;    // per stream, window min arrival margin
  std::vector<int64_t> win_left;      // per stream, ticks left in window
  std::vector<int64_t> shrink_votes;  // consecutive shrinkable windows
  int64_t grows = 0, shrinks = 0;     // delay decisions taken
};

// End-of-window decision for one stream (see the header comment).
void AdaptDecide(JitterBuffer* jb, int64_t s) {
  const int64_t margin = jb->margin_min[s];
  jb->margin_min[s] = kNoMargin;
  if (margin == kNoMargin) {  // silent sender: no evidence either way
    jb->shrink_votes[s] = 0;
    return;
  }
  if (margin < 0) {
    jb->shrink_votes[s] = 0;
    const int64_t grow =
        std::min(-margin, jb->ad_max - jb->delay0[s]);
    if (grow > 0) {
      jb->delay0[s] += grow;
      jb->delay[s] += grow;  // pause now; PLC conceals the added ticks
      ++jb->grows;
    }
    return;
  }
  if (margin >= 2 && jb->delay0[s] > jb->ad_min) {
    if (++jb->shrink_votes[s] >= kShrinkVotes) {
      jb->shrink_votes[s] = 0;
      --jb->delay0[s];
      // Realize the shrink as a one-packet skip: clear and step over the
      // next due sequence so playout jumps 20 ms forward.
      const int64_t head = jb->head_seq[s];
      Slot& skipped = jb->slots[s * jb->depth + (head % jb->depth)];
      if (skipped.occupied && skipped.seq == head) skipped.occupied = false;
      jb->head_seq[s] = head + 1;
      ++jb->shrinks;
    }
    return;
  }
  jb->shrink_votes[s] = 0;
}

}  // namespace

extern "C" {

void* lyra_jb_create(int64_t capacity, int64_t packet_size, int64_t depth) {
  // Per-slot sizes are stored as uint8_t; a larger packet_size would let
  // insert() silently truncate the recorded size.  Lyra packets are <=23 B.
  // Geometry ceilings (far above any real deployment: the wire slot field
  // is 2 bytes, rings are tens of packets) keep every index/size product
  // in safe int64 range and make an absurd config a loud nullptr instead
  // of an overflowing allocation.
  if (capacity <= 0 || packet_size <= 0 || packet_size > 255 || depth <= 0 ||
      capacity > (int64_t{1} << 22) || depth > (int64_t{1} << 20) ||
      capacity * depth > (int64_t{1} << 28)) {
    return nullptr;
  }
  auto* jb = new JitterBuffer();
  jb->capacity = capacity;
  jb->packet_size = packet_size;
  jb->depth = depth;
  jb->slots.resize(capacity * depth);
  jb->payload.resize(capacity * depth * packet_size);
  jb->sizes.resize(capacity * depth);
  jb->head_seq.assign(capacity, 0);
  jb->delay.assign(capacity, 0);
  jb->delay0.assign(capacity, 0);
  jb->streak.assign(capacity, 0);
  jb->active.assign(capacity, 0);
  jb->margin_min.assign(capacity, kNoMargin);
  jb->win_left.assign(capacity, 0);
  jb->shrink_votes.assign(capacity, 0);
  return jb;
}

// Enable adaptive playout delay: every `window` ticks each stream's delay
// may grow (late packets observed) or shrink (sustained excess cushion)
// within [min_delay, max_delay].  Streams keep their add_stream
// playout_delay as the starting point.  While a pump owns this buffer use
// lyra_pump_set_adaptive instead (locking).  Returns 0 ok, 1 bad bounds.
int lyra_jb_set_adaptive(void* h, int64_t min_delay, int64_t max_delay,
                         int64_t window) {
  auto* jb = static_cast<JitterBuffer*>(h);
  if (min_delay < 0 || max_delay < min_delay || max_delay >= jb->depth ||
      window <= 0) {
    return 1;
  }
  jb->ad_min = min_delay;
  jb->ad_max = max_delay;
  jb->ad_window = window;
  std::fill(jb->margin_min.begin(), jb->margin_min.end(), kNoMargin);
  std::fill(jb->win_left.begin(), jb->win_left.end(), window);
  std::fill(jb->shrink_votes.begin(), jb->shrink_votes.end(), 0);
  return 0;
}

void lyra_jb_destroy(void* h) { delete static_cast<JitterBuffer*>(h); }

// Activate/reset a stream slot starting at sequence `start_seq`.
// `playout_delay` ticks are absorbed before draining begins, so packets
// delayed by up to that many ticks by the network still play in order.
int lyra_jb_add_stream(void* h, int64_t stream, int64_t start_seq,
                       int64_t playout_delay) {
  auto* jb = static_cast<JitterBuffer*>(h);
  // start_seq must be non-negative: with head >= 0 every accepted seq is
  // >= head >= 0, so (seq % depth) can never be a negative (out-of-bounds)
  // ring index under C++ truncating modulo.  The kMaxSeq ceiling keeps
  // head arithmetic overflow-free (see its comment); real sequences are
  // 32-bit, so only a corrupt snapshot restore can trip it.
  if (stream < 0 || stream >= jb->capacity || start_seq < 0 ||
      start_seq >= kMaxSeq ||
      playout_delay < 0 || playout_delay >= jb->depth) {
    return 1;
  }
  jb->active[stream] = 1;
  jb->head_seq[stream] = start_seq;
  jb->delay[stream] = playout_delay;
  jb->delay0[stream] = playout_delay;
  jb->streak[stream] = 0;
  jb->margin_min[stream] = kNoMargin;
  jb->win_left[stream] = jb->ad_window;
  jb->shrink_votes[stream] = 0;
  for (int64_t d = 0; d < jb->depth; ++d) {
    jb->slots[stream * jb->depth + d].occupied = false;
  }
  return 0;
}

int lyra_jb_remove_stream(void* h, int64_t stream) {
  auto* jb = static_cast<JitterBuffer*>(h);
  if (stream < 0 || stream >= jb->capacity) return 1;
  jb->active[stream] = 0;
  return 0;
}

// File a packet. size may be 0 (DTX empty packet: "received, no payload").
// Returns 0 ok, 1 bad args, 2 late (already played), 3 duplicate,
// 4 overflow (further than `depth` ahead of head: dropped),
// 5 inactive stream (packet for a torn-down call: dropped, not an error —
// late arrivals after remove_stream are routine in real-time transport).
int lyra_jb_insert(void* h, int64_t stream, int64_t seq,
                   const uint8_t* data, int64_t size) {
  auto* jb = static_cast<JitterBuffer*>(h);
  if (stream < 0 || stream >= jb->capacity ||
      size < 0 || size > jb->packet_size) {
    return 1;
  }
  // A negative seq (corrupt wire header) falls through to the seq < head
  // late-drop below — head_seq is guaranteed >= 0 by lyra_jb_add_stream, so
  // it can never reach the ring indexing, and a hostile packet is a counted
  // drop, not an ingest-loop exception.
  if (!jb->active[stream]) {
    ++jb->inactive_drops;
    return 5;
  }
  if (seq >= kMaxSeq) {
    // Absurd sequence (the wire field is 4 bytes; this is FFI misuse or
    // corruption): a counted drop that must NEVER become a resync target —
    // adopting it as head would put head arithmetic within overflow range.
    ++jb->overflow_drops;
    return 4;
  }
  const int64_t head = jb->head_seq[stream];
  if (jb->ad_window > 0 && seq >= head - jb->ad_max &&
      seq < head + jb->depth) {
    // Arrival margin: ticks of cushion before this packet is too late
    // (negative = it was).  The window minimum drives AdaptDecide.
    // Only actionable evidence is recorded: a packet later than the
    // largest delay adaptation could ever add (ad_max) — or ahead of the
    // window entirely — is a desync/replay-class event for the resync
    // logic below, not jitter; recording it would let a single stray
    // (or hostile) ancient packet pin the slot's delay at max_delay.
    jb->margin_min[stream] =
        std::min(jb->margin_min[stream], seq - head);
  }
  if (seq < 0) {
    // Corrupt wire header: always a counted drop, never a resync target
    // (a negative head would make the ring index UB).
    ++jb->late_drops;
    return 2;
  }
  if (seq < head || seq >= head + jb->depth) {
    // Outside the playout window on either side.  A lone stray (or
    // hostile) packet is a counted drop, but a *sustained* run of them
    // means the sender is real and the schedule is stale — a receiver
    // stall (compile, pause) or a sender whose sequence origin is ahead
    // (overflow) or behind (late: the head advances every collect, so a
    // warm standby that ticked before this caller existed is permanently
    // ahead).  A real-time buffer must then resync or the stream is dead
    // forever: both sides advance 50/s and the gap never closes.  Jump
    // the playout point to the arriving sequence, re-absorb the
    // configured playout delay, and file this packet.  NEAR-late packets
    // (within one ring depth behind head) could instead be a transient
    // delay burst, so they need a much longer streak — see
    // kNearLateResyncAfter.
    const bool near_late = seq < head && seq >= head - jb->depth;
    const int64_t resync_after =
        near_late ? kNearLateResyncAfter : kResyncAfter;
    if (++jb->streak[stream] < resync_after) {
      if (seq < head) {
        ++jb->late_drops;
        return 2;
      }
      ++jb->overflow_drops;
      return 4;
    }
    ++jb->resyncs;
    jb->head_seq[stream] = seq;
    jb->delay[stream] = jb->delay0[stream];
    jb->streak[stream] = 0;
    // Adaptive evidence gathered against the old schedule is meaningless
    // at the new origin: start a fresh window, or the desync's margins
    // would masquerade as jitter and inflate the delay to max right
    // after the resync (the warm-standby failover case).
    jb->margin_min[stream] = kNoMargin;
    jb->win_left[stream] = jb->ad_window;
    jb->shrink_votes[stream] = 0;
    for (int64_t d = 0; d < jb->depth; ++d) {
      jb->slots[stream * jb->depth + d].occupied = false;
    }
  } else {
    jb->streak[stream] = 0;
  }
  Slot& slot = jb->slots[stream * jb->depth + (seq % jb->depth)];
  if (slot.occupied && slot.seq == seq) {
    ++jb->dup_drops;
    return 3;
  }
  slot.occupied = true;
  slot.seq = seq;
  const int64_t idx = stream * jb->depth + (seq % jb->depth);
  jb->sizes[idx] = static_cast<uint8_t>(size);
  if (size > 0) {
    std::memcpy(&jb->payload[idx * jb->packet_size], data, size);
  }
  return 0;
}

// File a REDUNDANT copy (RED framing: a datagram for sequence t carries
// packet t-D alongside, so one lost datagram is healed by its successor
// instead of concealed).  Unlike lyra_jb_insert this is side-effect-free
// beyond the filing itself: it never records adaptive arrival margins
// (the copy is systematically D ticks "later" than the live traffic and
// would bias delay adaptation), never feeds the desync-resync streak
// (the primary insert is the schedule evidence), and never bumps the
// late/dup/inactive drop counters (a redundant whose primary already
// arrived is the NORMAL case, not a transport anomaly worth alarming
// on).  It files only into an empty ring slot and counts the fill as a
// red_heal — the measure of what the redundancy actually bought.
// Returns 0 filed (healed), 2 too late, 3 primary already there,
// 4 ahead of the window, 5 inactive, 1 bad args.
int lyra_jb_insert_red(void* h, int64_t stream, int64_t seq,
                       const uint8_t* data, int64_t size) {
  auto* jb = static_cast<JitterBuffer*>(h);
  if (stream < 0 || stream >= jb->capacity ||
      size < 0 || size > jb->packet_size) {
    return 1;
  }
  if (!jb->active[stream]) return 5;
  const int64_t head = jb->head_seq[stream];
  if (seq < head) return 2;  // playout already passed: too late to heal
  if (seq >= head + jb->depth) return 4;
  Slot& slot = jb->slots[stream * jb->depth + (seq % jb->depth)];
  if (slot.occupied && slot.seq == seq) return 3;
  slot.occupied = true;
  slot.seq = seq;
  const int64_t idx = stream * jb->depth + (seq % jb->depth);
  jb->sizes[idx] = static_cast<uint8_t>(size);
  if (size > 0) {
    std::memcpy(&jb->payload[idx * jb->packet_size], data, size);
  }
  ++jb->red_heals;
  return 0;
}

int64_t lyra_jb_red_heals(void* h) {
  return static_cast<JitterBuffer*>(h)->red_heals;
}

// Drain one tick for all streams: for each active stream, pop the packet at
// head_seq (if present) into out[stream * packet_size ...], set
// received[stream], sizes_out[stream]; advance head_seq.  Inactive streams
// get received=0.  Returns number of received packets.
int64_t lyra_jb_collect(void* h, uint8_t* out, uint8_t* received,
                        uint8_t* sizes_out) {
  auto* jb = static_cast<JitterBuffer*>(h);
  int64_t n = 0;
  for (int64_t s = 0; s < jb->capacity; ++s) {
    received[s] = 0;
    sizes_out[s] = 0;
    if (!jb->active[s]) continue;
    if (jb->ad_window > 0 && --jb->win_left[s] <= 0) {
      AdaptDecide(jb, s);
      jb->win_left[s] = jb->ad_window;
    }
    if (jb->delay[s] > 0) {  // still filling the playout buffer
      --jb->delay[s];
      continue;
    }
    const int64_t head = jb->head_seq[s];
    Slot& slot = jb->slots[s * jb->depth + (head % jb->depth)];
    if (slot.occupied && slot.seq == head) {
      const int64_t idx = s * jb->depth + (head % jb->depth);
      const uint8_t size = jb->sizes[idx];
      if (size > 0) {
        std::memcpy(&out[s * jb->packet_size],
                    &jb->payload[idx * jb->packet_size], size);
      }
      received[s] = 1;
      sizes_out[s] = size;
      slot.occupied = false;
      ++n;
    }
    jb->head_seq[s] = head + 1;  // missing packet == loss; PLC handles it
  }
  return n;
}

void lyra_jb_stats(void* h, int64_t* late, int64_t* dup, int64_t* overflow) {
  auto* jb = static_cast<JitterBuffer*>(h);
  *late = jb->late_drops;
  *dup = jb->dup_drops;
  *overflow = jb->overflow_drops;
}

void lyra_jb_stats2(void* h, int64_t* late, int64_t* dup, int64_t* overflow,
                    int64_t* inactive) {
  lyra_jb_stats(h, late, dup, overflow);
  *inactive = static_cast<JitterBuffer*>(h)->inactive_drops;
}

int64_t lyra_jb_resyncs(void* h) {
  return static_cast<JitterBuffer*>(h)->resyncs;
}

// Adaptive-delay decision counters plus the fleet's current latency
// position: min / max / sum of per-active-slot playout delay (sum / active
// = mean added latency in ticks; all zero when no slot is active).
void lyra_jb_adapt_stats(void* h, int64_t* grows, int64_t* shrinks,
                         int64_t* delay_min, int64_t* delay_max,
                         int64_t* delay_sum, int64_t* active_streams) {
  auto* jb = static_cast<JitterBuffer*>(h);
  *grows = jb->grows;
  *shrinks = jb->shrinks;
  *delay_min = 0;
  *delay_max = 0;
  *delay_sum = 0;
  *active_streams = 0;
  bool first = true;
  for (int64_t s = 0; s < jb->capacity; ++s) {
    if (!jb->active[s]) continue;
    ++*active_streams;
    *delay_sum += jb->delay0[s];
    if (first || jb->delay0[s] < *delay_min) *delay_min = jb->delay0[s];
    if (first || jb->delay0[s] > *delay_max) *delay_max = jb->delay0[s];
    first = false;
  }
}

// Current playout delay (ticks) for one slot, or -1 on a bad slot.
int64_t lyra_jb_delay(void* h, int64_t stream) {
  auto* jb = static_cast<JitterBuffer*>(h);
  if (stream < 0 || stream >= jb->capacity) return -1;
  return jb->delay0[stream];
}

// As lyra_jb_delay, but -1 also for an INACTIVE slot — the shard-group
// merged adapt-stats reader must skip slots this buffer doesn't serve.
int64_t lyra_jb_delay2(void* h, int64_t stream) {
  auto* jb = static_cast<JitterBuffer*>(h);
  if (stream < 0 || stream >= jb->capacity || !jb->active[stream]) return -1;
  return jb->delay0[stream];
}

// Per-slot playout-schedule read: the next sequence slot `stream` will
// play, or -1 for a bad/inactive slot (bounds-checked — the shard-group
// merged reader cannot assume its rows match this buffer's capacity).
int64_t lyra_jb_head(void* h, int64_t stream) {
  auto* jb = static_cast<JitterBuffer*>(h);
  if (stream < 0 || stream >= jb->capacity || !jb->active[stream]) return -1;
  return jb->head_seq[stream];
}

// Bulk playout-schedule export: heads_out[s] = the next sequence slot s
// will play (head_seq), or -1 for an inactive slot.  This is the state a
// migration snapshot carries so the destination host can re-seed its own
// buffer (lyra_jb_add_stream with start_seq=head) and lock onto each
// caller's live sequence immediately instead of re-deriving the schedule
// from a streak of out-of-window drops.  heads_out must hold `capacity`
// entries.
void lyra_jb_heads(void* h, int64_t* heads_out) {
  auto* jb = static_cast<JitterBuffer*>(h);
  for (int64_t s = 0; s < jb->capacity; ++s) {
    heads_out[s] = jb->active[s] ? jb->head_seq[s] : -1;
  }
}

// Per-slot adaptive-evidence export (the companion of lyra_jb_heads for a
// migration snapshot): the learned playout delay (delay0; -1 for inactive
// slots) and the shrink-vote streak.  Carrying these lets a restored host
// resume each caller at its LEARNED latency position instead of
// re-learning from the configured base during exactly the burst window
// that made adaptation necessary (the failover already cost the caller a
// voice gap; re-dropping until the window re-learns doubles the damage).
// Both buffers must hold `capacity` entries.
void lyra_jb_adapt_export(void* h, int64_t* delay0_out, int64_t* votes_out) {
  auto* jb = static_cast<JitterBuffer*>(h);
  for (int64_t s = 0; s < jb->capacity; ++s) {
    delay0_out[s] = jb->active[s] ? jb->delay0[s] : -1;
    votes_out[s] = jb->active[s] ? jb->shrink_votes[s] : 0;
  }
}

// Re-seed one ACTIVE slot's adaptive evidence after a restore: the
// learned delay (clamped to this buffer's adaptive bounds) becomes both
// the slot's delay0 and its remaining pause — the handoff emptied the
// ring, so the pause refills the cushion to the learned depth before
// draining resumes — plus the shrink streak (clamped to the vote bar).
// Requires adaptive mode enabled (a static-delay host keeps its
// configured base; evidence from an adaptive host does not apply).
// Returns 0 ok, 1 bad slot / inactive / adaptive off / negative inputs.
int lyra_jb_adapt_seed(void* h, int64_t stream, int64_t delay0,
                       int64_t votes) {
  auto* jb = static_cast<JitterBuffer*>(h);
  if (stream < 0 || stream >= jb->capacity || !jb->active[stream] ||
      jb->ad_window <= 0 || delay0 < 0 || votes < 0) {
    return 1;
  }
  const int64_t d =
      std::min(std::max(delay0, jb->ad_min), jb->ad_max);
  jb->delay0[stream] = d;
  jb->delay[stream] = d;
  jb->shrink_votes[stream] = std::min(votes, kShrinkVotes);
  jb->margin_min[stream] = kNoMargin;  // fresh window on the new host
  jb->win_left[stream] = jb->ad_window;
  return 0;
}

// Per-slot shrink-vote read, bounds-checked (-1 for a bad/inactive slot):
// the shard-group merged adaptive export reads each slot from its home
// shard without assuming matching capacities.
int64_t lyra_jb_votes2(void* h, int64_t stream) {
  auto* jb = static_cast<JitterBuffer*>(h);
  if (stream < 0 || stream >= jb->capacity || !jb->active[stream]) return -1;
  return jb->shrink_votes[stream];
}

}  // extern "C"
