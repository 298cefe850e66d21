"""Multi-stream serving runtime over the batched lockstep engines.

The reference's outermost layer is a phone app driving one codec instance
from a mic thread (reference: lyra/android_example/MainActivity.java:44-299
+ the JNI bridge).  The TPU deployment analog is a server multiplexing
thousands of calls onto one chip: this module is that host runtime.

Per 20 ms tick the server
  * collects each live stream's incoming packet bytes (or None on loss),
  * batch-unpacks them to RVQ indices (native C++ path),
  * runs the jitted decoder step for all slots at once,
  * hands each stream its hop of audio,
and symmetrically for the encode direction.  Slot admission/eviction works
by masking rows of the engine state back to their initial values
(`reset_rows`), so adding or dropping a call never recompiles or reshapes
the device program — the batch is a fixed-capacity slot table, which is
exactly the shape XLA wants.
"""

from __future__ import annotations

import dataclasses
from typing import Dict, List, Optional, Sequence

import numpy as np

from lyra_tpu import config, packet
from lyra_tpu.codec.engine import DecoderEngine, EncoderEngine
from lyra_tpu.utils import checkpoint, native


@dataclasses.dataclass
class _Slot:
    stream_id: object
    active: bool = False


def _dev_int16(audio):
    """Cast device audio to int16 ON DEVICE (no-op for int16/host arrays).

    The engines emit integral int16-scale samples (engine.py clip_to_int16),
    so the cast is bit-exact; doing it device-side before the fetch halves
    the PCM bytes crossing PCIe per tick (reference: lyra/lyra_decoder.h:
    88-104 — int16 samples are the codec's public unit)."""
    if not isinstance(audio, np.ndarray) and hasattr(audio, "astype") \
            and audio.dtype != np.int16:
        return audio.astype(np.int16)
    return audio


def _pcm_out(audio) -> np.ndarray:
    """Device audio → writable host int16 PCM (see _dev_int16)."""
    return np.asarray(_dev_int16(audio)).astype(np.int16)


def _pcm_in(audio) -> np.ndarray:
    """Host PCM → the engine-upload array.

    int16 input uploads as int16 (2 B/sample over PCIe; the engine casts to
    f32 on device, engine.py EncoderEngine._step_impl); anything else keeps
    the float32 contract (callers may feed non-integral int16-scale floats).

    Always a private copy: the async tick paths return before the H2D
    transfer completes, and some backends zero-copy-alias aligned host
    arrays — a caller reusing its PCM ring buffer for the next hop must
    not corrupt an in-flight upload (the old unconditional f32 cast made
    this copy implicitly).

    Device arrays pass through untouched: they are immutable (no aliasing
    hazard) and already where the engine wants them — the conference
    bridge's on-device mix must not round-trip through the host here."""
    if not isinstance(audio, np.ndarray) and hasattr(audio,
                                                     "copy_to_host_async"):
        return audio
    a = np.asarray(audio)
    if a.dtype == np.int16:
        return np.array(a)
    return np.array(a, np.float32)


def _no_inflight_tick(server, verb: str) -> None:
    if (getattr(server, "_pending", None) is not None
            or getattr(server, "_wire_pending", None) is not None):
        raise RuntimeError(
            f"flush_async() before {verb}: a tick is in flight")


def _server_save(server, path: str, kind: str,
                 extra: Dict[str, object],
                 transport: Optional[dict] = None) -> None:
    """Snapshot engine state AND the host slot bookkeeping, so a drained
    server restores mid-call on another host (the deployment story behind
    utils/checkpoint.py).  In-flight async pipelines must be flushed first
    (enforced — an unflushed tick would be silently lost).  Stream ids ride
    in the snapshot's JSON header: numpy scalars are coerced, richer id
    objects are rejected here rather than deep inside json.dumps."""
    _no_inflight_tick(server, "save")

    def scalar(sid):
        if isinstance(sid, np.generic):
            sid = sid.item()
        if sid is not None and not isinstance(sid, (str, int, float, bool)):
            raise TypeError(
                f"stream id {sid!r} is not JSON-scalar; snapshots require "
                "str/int stream ids")
        return sid

    slots = [(scalar(s.stream_id), bool(s.active)) for s in server._slots]
    checkpoint.save_state(  # save_state host-copies the tree itself
        path, server._state,
        extra={"kind": kind, "slots": slots, "gen": server._gen.tolist(),
               "sample_rate_hz": server.sample_rate_hz,
               # Opaque serving-layer state (e.g. the jitter buffer's
               # playout schedule) riding the same atomic snapshot; the
               # server never interprets it — restore() hands it back to
               # whoever drives the transport (serve_main re-seeds its
               # ingest from it so lock-on after migration is immediate).
               **({"transport": transport} if transport is not None else {}),
               **extra})


def _server_restore(server, path: str, kind: str,
                    required: tuple = (),
                    validate=None) -> Dict[str, object]:
    """Validates everything BEFORE mutating the server — a failed restore
    must leave it exactly as it was.  `required` names extra-header keys
    that must be present; `validate(extra)` runs any server-specific checks
    (still pre-mutation).  The snapshot is loaded exactly once."""
    _no_inflight_tick(server, "restore")  # a stale tick would drain against
    state, extra = checkpoint.load_state(path)  # the restored slot/gen table
    if extra.get("kind") != kind:
        raise ValueError(f"snapshot is not a {kind}-server snapshot")
    for k in ("slots", "gen", *required):
        if k not in extra:
            raise ValueError(f"snapshot is missing the {k!r} header field")
    slots = extra["slots"]
    if len(slots) != server.capacity:
        raise ValueError(
            f"snapshot capacity {len(slots)} != server capacity "
            f"{server.capacity}")
    # Legacy (pre-multirate) snapshots came from 16 kHz-only servers.
    snap_rate = extra.get("sample_rate_hz", config.INTERNAL_SAMPLE_RATE)
    if snap_rate != server.sample_rate_hz:
        # The resampler state shapes would mismatch anyway; say why up front.
        raise ValueError(
            f"snapshot is a {snap_rate} Hz fleet; this server runs at "
            f"{server.sample_rate_hz} Hz")
    if validate is not None:
        validate(extra)
    mesh = getattr(server.engine, "mesh", None)
    if mesh is not None:  # mesh-sharded engine: land the restored state
        from lyra_tpu.parallel.sharding import shard_batch_tree  # sharded

        state = shard_batch_tree(state, mesh, server.engine.axis_name)
    server._state = state
    server._slots = [_Slot(sid, active) for sid, active in slots]
    server._by_id = {s.stream_id: i for i, s in enumerate(server._slots)
                     if s.active}
    server._gen = np.asarray(extra["gen"], np.int64)
    server._active_cache = None
    return extra


def _check_slot(slot_table: List[_Slot], capacity: int, slot: int) -> int:
    """Validate a caller-directed slot (placement policies — e.g. the
    conference bridge keeping a room's members on one shard)."""
    slot = int(slot)
    if not 0 <= slot < capacity:
        raise ValueError(f"slot {slot} out of range [0, {capacity})")
    if slot_table[slot].active:
        raise ValueError(
            f"slot {slot} is occupied by stream "
            f"{slot_table[slot].stream_id!r}")
    return slot


def _assign_slots(by_id: Dict[object, int], slot_table: List[_Slot],
                  capacity: int, ids: List[object],
                  want: Optional[Dict[object, int]] = None):
    """Validate a bulk admission and assign free slots (all-or-nothing:
    raises before any state is touched).  Returns (mask [capacity] bool,
    {stream_id: slot}).  `want` maps stream ids to caller-directed slots
    (must cover every id; duplicates/occupied slots are refused)."""
    if len(set(ids)) != len(ids):
        raise KeyError("duplicate stream ids in bulk admission")
    for sid in ids:
        if sid in by_id:
            raise KeyError(f"stream {sid!r} already active")
    if want is not None:
        chosen = [_check_slot(slot_table, capacity, want[sid])
                  for sid in ids]
        if len(set(chosen)) != len(chosen):
            raise ValueError("duplicate slots in directed bulk admission")
    else:
        free = [i for i, s in enumerate(slot_table) if not s.active]
        if len(free) < len(ids):
            raise RuntimeError("server at capacity")
        chosen = free[: len(ids)]
    mask = np.zeros(capacity, bool)
    slots: Dict[object, int] = {}
    for sid, i in zip(ids, chosen):
        mask[i] = True
        slots[sid] = i
    return mask, slots


class DecoderServer:
    """Fixed-capacity batched decoder with per-stream admission."""

    def __init__(self, capacity: int, engine: Optional[DecoderEngine] = None,
                 model_path: str = config.DEFAULT_MODEL_PATH, seed: int = 0,
                 sample_rate_hz: Optional[int] = None):
        native.build()  # compile the wire codec now, not mid-tick
        # Default engine emits int16 inside its own jitted step, so the
        # packed/dict ticks need no separate device cast before the fetch
        # (injected float-emitting engines get the eager _dev_int16 cast —
        # same bytes over the link, one extra dispatch).
        # sample_rate_hz: the fleet's external I/O rate (reference:
        # lyra/lyra_config.h:56-57 — 8/16/32/48 kHz external, 16 kHz
        # internal).  The engine resamples inside its jitted step, so a
        # 48 kHz fleet's ticks take/emit 960-sample hops with no host DSP.
        self.engine = engine or DecoderEngine(
            sample_rate_hz or config.INTERNAL_SAMPLE_RATE,
            model_path=model_path, emit_dtype="int16")
        if (sample_rate_hz is not None
                and self.engine.sample_rate_hz != sample_rate_hz):
            raise ValueError(
                f"sample_rate_hz={sample_rate_hz} contradicts the injected "
                f"engine's {self.engine.sample_rate_hz} Hz")
        self.sample_rate_hz = self.engine.sample_rate_hz
        self.hop_samples = self.engine.hop_samples
        self.capacity = capacity
        self._seed = seed
        self._state = self.engine.init_state(capacity, seed=seed)
        self._slots: List[_Slot] = [_Slot(None) for _ in range(capacity)]
        self._by_id: Dict[object, int] = {}
        self._num_stages = self.engine.rvq.num_stages
        # Engines built with max_bitrate= statically skip RVQ stages beyond
        # the cap; packets that need more stages would decode silently
        # degraded, so the server treats them as malformed instead.
        self._stage_cap = self.engine._max_stages or self._num_stages
        self._last_comfort = np.zeros(capacity, bool)
        # Malformed wire packets per slot: treated as loss, never fatal.
        self.bad_packets = np.zeros(capacity, np.int64)
        # Packets addressed to no active stream (stragglers after hangup):
        # counted drops, mirroring the jitter buffer's inactive_drops.
        self.inactive_drops = 0
        # Bumped on every admission: lets the async drain detect that a slot
        # changed hands between submit and drain (see tick_packed_async).
        self._gen = np.zeros(capacity, np.int64)

    @property
    def num_active(self) -> int:
        return len(self._by_id)

    def add_stream(self, stream_id, slot: Optional[int] = None) -> int:
        """Admit a stream; returns its slot. O(1) state reset, no recompile.

        `slot` directs placement (placement policies — e.g. shard-affine
        room packing, conference.py); occupied/out-of-range slots are
        refused before any state is touched."""
        if stream_id in self._by_id:
            raise KeyError(f"stream {stream_id!r} already active")
        if slot is not None:
            i = _check_slot(self._slots, self.capacity, slot)
        else:
            for i, s in enumerate(self._slots):
                if not s.active:
                    break
            else:
                raise RuntimeError("server at capacity")
        mask = np.zeros(self.capacity, bool)
        mask[i] = True
        self._state = self.engine.reset_rows(self._state, mask,
                                             seed=self._seed)
        self._slots[i] = _Slot(stream_id, True)
        self._by_id[stream_id] = i
        self.bad_packets[i] = 0  # the slot's counter belongs to its stream
        # Ditto the evicted stream's comfort-noise flag.  Copy-on-write:
        # after a tick _last_comfort holds a read-only view of the device
        # result.
        lc = np.array(self._last_comfort)
        lc[i] = False
        self._last_comfort = lc
        self._gen[i] += 1
        self._active_cache = None
        return i

    def add_streams(self, stream_ids,
                    slots: Optional[Dict[object, int]] = None
                    ) -> Dict[object, int]:
        """Bulk admission: one masked state reset for the whole group.

        Admission is O(capacity) device work per reset_rows call, so
        admitting k streams one at a time costs k full passes; a call-setup
        burst (or bench warmup) should use this instead.  All-or-nothing:
        raises before any mutation if a stream is duplicate or capacity is
        short.  `slots` directs placement per stream (must cover every id;
        duplicate/occupied slots are refused)."""
        ids = list(stream_ids)
        if not ids:
            return {}
        mask, slots = _assign_slots(self._by_id, self._slots, self.capacity,
                                    ids, want=slots)
        self._state = self.engine.reset_rows(self._state, mask,
                                             seed=self._seed)
        lc = np.array(self._last_comfort)  # copy-on-write, see add_stream
        for sid, i in slots.items():
            self._slots[i] = _Slot(sid, True)
            self._by_id[sid] = i
            self.bad_packets[i] = 0
            lc[i] = False
            self._gen[i] += 1
        self._last_comfort = lc
        self._active_cache = None
        return slots

    def remove_stream(self, stream_id) -> None:
        i = self._by_id.pop(stream_id)
        self._slots[i] = _Slot(None, False)
        self._active_cache = None

    def save(self, path: str, transport: Optional[dict] = None) -> None:
        """Drain-for-maintenance snapshot: engine state + slot table +
        per-slot counters (+ an opaque `transport` dict from the serving
        layer — see _server_save).  Restore with DecoderServer.restore on
        a server of the same capacity; streams continue bit-exactly
        mid-call."""
        _server_save(self, path, "decoder", {
            "seed": self._seed,
            "bad_packets": self.bad_packets.tolist(),
            "last_comfort": self._last_comfort.tolist(),
            "inactive_drops": int(self.inactive_drops),
        }, transport)

    def restore(self, path: str) -> Optional[dict]:
        extra = _server_restore(
            self, path, "decoder",
            required=("seed", "bad_packets", "last_comfort"))
        # Post-restore admissions must keep the ORIGINAL server's per-stream
        # RNG lineage, not this instance's constructor seed.
        self._seed = extra["seed"]
        self.bad_packets = np.asarray(extra["bad_packets"], np.int64)
        self._last_comfort = np.asarray(extra["last_comfort"], bool)
        self.inactive_drops = int(extra.get("inactive_drops", 0))
        return extra.get("transport")

    def tick(self, packets: Dict[object, Optional[bytes]]) -> Dict[object, np.ndarray]:
        """One 20 ms step for every active stream.

        packets: stream_id -> wire bytes, or None/missing for packet loss.
        Returns stream_id -> hop of int16 audio at the engine's sample rate.
        """
        _no_inflight_tick(self, "a synchronous tick")
        indices = np.full((self.capacity, self._num_stages), -1, np.int32)
        received = np.zeros(self.capacity, bool)
        for sid, pkt in packets.items():
            i = self._by_id.get(sid)
            if i is None:
                # A straggler packet for a stream that already hung up is a
                # routine transport event (same as the jitter buffer's
                # inactive_drops), not a reason to abort every live call's
                # tick: count it and move on.
                self.inactive_drops += 1
                continue
            if pkt:
                try:
                    idx = packet.unpack_indices(pkt)
                    if idx.size > self._stage_cap:
                        # Packet needs RVQ stages this engine statically
                        # skipped (max_bitrate cap): decoding it would play
                        # silently degraded audio, so refuse it instead.
                        raise ValueError("packet exceeds engine max_bitrate")
                except ValueError:
                    # Malformed/unsupported-size packet from one remote peer
                    # must not drop the tick for the whole batch (reference:
                    # LyraDecoder::SetEncodedPacket returns false per stream).
                    # Treat it as loss; PLC covers the hop.
                    self.bad_packets[i] += 1
                    continue
                indices[i, : idx.size] = idx
                received[i] = True

        audio, is_cn, self._state = self.engine.step(
            self._state, indices, received)
        audio = _pcm_out(audio)
        self._last_comfort = np.asarray(is_cn)
        return {sid: audio[i] for sid, i in self._by_id.items()}

    def is_comfort_noise(self, stream_id) -> bool:
        return bool(self._last_comfort[self._by_id[stream_id]])

    def tick_packed(self, packets: np.ndarray, received: np.ndarray,
                    sizes: np.ndarray) -> np.ndarray:
        """Array-based tick for high stream counts (no per-stream Python).

        packets:  [capacity, max_packet_size] uint8 (e.g. JitterBuffer.collect)
        received: [capacity] bool; sizes: [capacity] byte counts (0 = DTX
        empty packet, treated as loss so CNG takes over, matching the
        reference where an empty packet is not decodable).

        Returns audio [capacity, hop] int16.  Wire bytes → indices runs
        through the native batch codec, grouped by packet size (bitrate).
        """
        _no_inflight_tick(self, "a synchronous tick")
        indices, received = self._unpack_wire(packets, received, sizes)
        audio, is_cn, self._state = self.engine.step(
            self._state, indices, received)
        self._last_comfort = np.asarray(is_cn)
        return _pcm_out(audio)

    def _unpack_wire(self, packets, received, sizes):
        """Wire bytes → (indices [capacity, stages], effective received)."""
        packets = np.ascontiguousarray(packets, np.uint8)
        sizes = np.asarray(sizes)
        received = (np.asarray(received, bool) & (sizes > 0)
                    & self._active_mask())
        if np.any(received & (sizes > packets.shape[1])):
            # Same rule as _sizes_to_nq: a row claiming more bytes than the
            # packets array holds is the host's own buffer-assembly bug —
            # refuse loudly BEFORE any counter moves (a recognized-but-
            # oversized size would otherwise surface as an opaque native
            # codec error after earlier bad-size groups were counted).
            raise ValueError(
                f"sizes exceed the packets array width {packets.shape[1]}")
        indices = np.full((self.capacity, self._num_stages), -1, np.int32)
        for size in np.unique(sizes[received]):
            bits = config.packet_size_to_num_quantized_bits(int(size))
            if (bits < 0
                    or bits // config.BITS_PER_QUANTIZER > self._stage_cap):
                # Unknown size, or a bitrate above the engine's static
                # max_bitrate cap (would decode silently degraded): treat
                # the whole size group as malformed → loss.
                bad = received & (sizes == size)
                self.bad_packets[bad] += 1
                received = received & ~bad
                continue
            rows = np.flatnonzero(received & (sizes == size))
            idx = packet.unpack_indices_batch(packets[rows, :int(size)], bits)
            indices[rows, : idx.shape[1]] = idx
        return indices, received

    def tick_wire(self, packets: np.ndarray, received: np.ndarray,
                  sizes: Optional[np.ndarray] = None) -> np.ndarray:
        """Device-wire fast path: the wire-format unpack runs on device
        inside the same jitted call as the decode step
        (packet.unpack_wire_device{,_mixed}) — the counterpart of
        EncoderServer.tick_wire.

        Without `sizes`, packets must be [capacity, packet_size] for one
        supported size (uniform-bitrate fleet); DTX empties and losses are
        both signalled via `received`, so when the packets come from
        EncoderServer.tick_wire the caller must fold its sizes in:
        `received & (sizes > 0)`.  With `sizes` ([capacity] byte counts,
        exactly EncoderServer.tick_wire's second output), mixed-bitrate
        fleets decode on the device path too: each row's own packet size
        selects its RVQ stage count on device, size 0 is loss/DTX, and an
        unrecognized or over-cap size is a counted drop (bad_packets),
        never an exception out of the tick.  Bit-identical audio to
        tick_packed in both forms."""
        _no_inflight_tick(self, "a synchronous tick")
        audio, is_cn = self._wire_run(packets, received, sizes)
        self._last_comfort = np.asarray(is_cn)
        return _pcm_out(audio)

    def _wire_run(self, packets, received, sizes):
        """Shared uniform/mixed dispatch for the wire tick: (re)build the
        right jitted program, run it, advance state; returns device
        (audio, is_comfort_noise)."""
        packets = np.ascontiguousarray(packets, np.uint8)
        if sizes is None:
            self._wire_prep(packets)
            received = np.asarray(received, bool) & self._active_mask()
            audio, is_cn, self._state = self._wire_step(
                self._state, packets, received)
        else:
            nq_row, received = self._sizes_to_nq(sizes, received,
                                                 packets.shape[1])
            self._wire_prep_mixed(packets.shape[1])
            audio, is_cn, self._state = self._wire_step_mixed(
                self._state, packets, received, nq_row)
        return audio, is_cn

    def _sizes_to_nq(self, sizes: np.ndarray, received: np.ndarray,
                     width: int):
        """Per-row packet sizes → per-row RVQ stage counts + effective
        received mask.  Unknown sizes and bitrates above the engine's
        static max_bitrate cap are counted drops (same policy as
        _unpack_wire); size 0 (DTX empty / nothing arrived) is plain loss,
        not an error."""
        sizes = np.asarray(sizes)
        received = (np.asarray(received, bool) & (sizes > 0)
                    & self._active_mask())
        if np.any(received & (sizes > width)):
            # A row claiming more bytes than the packets array holds is the
            # host's own buffer-assembly bug, not a wire event: decoding
            # only the stages that physically fit would be silently
            # degraded audio, so refuse loudly (CLAUDE.md fail-loudly).
            raise ValueError(
                f"sizes exceed the packets array width {width}")
        nq_row = np.zeros(self.capacity, np.int32)
        bad = np.zeros(self.capacity, bool)
        for size in np.unique(sizes[received]):
            bits = config.packet_size_to_num_quantized_bits(int(size))
            sel = received & (sizes == size)
            if (bits < 0
                    or bits // config.BITS_PER_QUANTIZER > self._stage_cap):
                bad |= sel
            else:
                nq_row[sel] = bits // config.BITS_PER_QUANTIZER
        self.bad_packets[bad] += 1
        return nq_row, received & ~bad

    def _wire_prep_mixed(self, width: int) -> None:
        """(Re)build the jitted mixed-bitrate unpack+step program for a
        given wire row width (recompiles only when the fleet's widest
        packet size changes)."""
        cache = getattr(self, "_wire_steps_mixed", None)
        if cache is None:
            cache = self._wire_steps_mixed = {}
        if width not in cache:
            import jax
            import jax.numpy as jnp

            n_keep = min(2 * width, self._num_stages)

            @jax.jit
            def _wire_step_mixed(state, wire, received, nq_row):
                idx = packet.unpack_wire_device_mixed(wire, nq_row)
                full = jnp.full(
                    (wire.shape[0], self._num_stages), -1, jnp.int32)
                full = full.at[:, :n_keep].set(idx[:, :n_keep])
                audio, is_cn, state = self.engine._step_impl(
                    state, full, received)
                # PCM leaves the device as int16 (see _dev_int16: bit-exact,
                # half the D2H bytes); no-op for emit_dtype="int16" engines.
                return audio.astype(jnp.int16), is_cn, state

            cache[width] = _wire_step_mixed  # keyed: no churn recompiles
        self._wire_step_mixed = cache[width]

    def _wire_prep(self, packets: np.ndarray) -> None:
        """Validate the uniform packet size and (re)build the jitted
        unpack+step program for it.  `packets` must already be an ndarray
        (callers normalize with ascontiguousarray first)."""
        bits = config.packet_size_to_num_quantized_bits(int(packets.shape[1]))
        if bits < 0 or bits // config.BITS_PER_QUANTIZER > self._stage_cap:
            raise ValueError(
                f"packet size {packets.shape[1]} unsupported for this engine")
        cache = getattr(self, "_wire_steps", None)
        if cache is None:
            cache = self._wire_steps = {}
        if bits not in cache:
            import jax
            import jax.numpy as jnp

            nq = bits // config.BITS_PER_QUANTIZER

            @jax.jit
            def _wire_step(state, wire, received):
                idx = packet.unpack_wire_device(wire, bits)
                full = jnp.full(
                    (wire.shape[0], self._num_stages), -1, jnp.int32)
                full = full.at[:, :nq].set(idx)
                audio, is_cn, state = self.engine._step_impl(
                    state, full, received)
                # See _wire_step_mixed: int16 PCM over the boundary.
                return audio.astype(jnp.int16), is_cn, state

            # Keyed cache: a fleet whose packet size toggles (bitrate churn)
            # must not recompile the whole program on every flip.
            cache[bits] = _wire_step
        self._wire_step = cache[bits]

    def _active_mask(self) -> np.ndarray:
        # Rebuilding this is O(capacity) python — cache it per admission
        # epoch so array ticks at B=16k don't pay it every 20 ms.
        cached = getattr(self, "_active_cache", None)
        if cached is None:
            cached = np.zeros(self.capacity, bool)
            if self._by_id:
                cached[list(self._by_id.values())] = True
            self._active_cache = cached
        return cached

    def tick_wire_async(self, packets: np.ndarray, received: np.ndarray,
                        sizes: Optional[np.ndarray] = None
                        ) -> Optional[np.ndarray]:
        """Pipelined tick_wire: submit this tick's wire bytes, return the
        *previous* tick's audio (None on the first call).  Same overlap and
        slot-reuse-suppression contract as tick_packed_async; same input
        contract as tick_wire (pass `sizes` for a mixed-bitrate fleet)."""
        if getattr(self, "_pending", None) is not None:
            raise RuntimeError(
                "tick_packed_async pipeline in flight; flush_async() first")
        audio, is_cn = self._wire_run(packets, received, sizes)
        for dev_arr in (audio, is_cn):
            if hasattr(dev_arr, "copy_to_host_async"):
                dev_arr.copy_to_host_async()
        pending = getattr(self, "_wire_pending", None)
        self._wire_pending = (audio, is_cn, self._gen.copy())
        if pending is None:
            return None
        return self._drain(pending)

    def flush_wire_async(self) -> Optional[np.ndarray]:
        pending = getattr(self, "_wire_pending", None)
        self._wire_pending = None
        if pending is None:
            return None
        return self._drain(pending)

    def tick_packed_async(self, packets: np.ndarray, received: np.ndarray,
                          sizes: np.ndarray) -> Optional[np.ndarray]:
        """Pipelined tick: submit this tick's packets, return the *previous*
        tick's audio (None on the first call).

        One tick (20 ms) of added playout latency buys full overlap of
        device compute, D2H transfer, and host byte handling: the device
        computes tick t while the host receives tick t−1's audio, whose
        transfer was started asynchronously at dispatch time.  Ordering and
        loss semantics are identical to `tick_packed` shifted by one tick
        (pinned by tests/test_stream_server.py).  A slot that changed hands
        between submit and drain (remove_stream + add_stream) drains
        *silence*, never the evicted stream's audio — a newly admitted call
        must not be handed 20 ms of someone else's voice.
        """
        if getattr(self, "_wire_pending", None) is not None:
            raise RuntimeError(
                "tick_wire_async pipeline in flight; flush_wire_async() first")
        indices, received = self._unpack_wire(packets, received, sizes)
        audio, is_cn, self._state = self.engine.step(
            self._state, indices, received)
        audio = _dev_int16(audio)  # cast before the async D2H starts
        for dev_arr in (audio, is_cn):
            if hasattr(dev_arr, "copy_to_host_async"):
                dev_arr.copy_to_host_async()
        pending = getattr(self, "_pending", None)
        self._pending = (audio, is_cn, self._gen.copy())
        if pending is None:
            return None
        return self._drain(pending)

    def _drain(self, pending) -> np.ndarray:
        audio_prev, is_cn_prev, gen_prev = pending
        stale = gen_prev != self._gen  # slot re-admitted since submit
        audio_prev = np.asarray(audio_prev).astype(np.int16)
        audio_prev[stale] = 0
        self._last_comfort = np.asarray(is_cn_prev) & ~stale
        return audio_prev

    def flush_async(self) -> Optional[np.ndarray]:
        """Drain the last in-flight tick of whichever async pipeline is
        live (tick_packed_async or tick_wire_async)."""
        pending = getattr(self, "_pending", None)
        self._pending = None
        if pending is None:
            return self.flush_wire_async()
        return self._drain(pending)


class EncoderServer:
    """Fixed-capacity batched encoder; emits wire packets per stream."""

    def __init__(self, capacity: int, engine: Optional[EncoderEngine] = None,
                 model_path: str = config.DEFAULT_MODEL_PATH,
                 bitrate: int = 3200,
                 sample_rate_hz: Optional[int] = None):
        native.build()  # compile the wire codec now, not mid-tick
        # sample_rate_hz: see DecoderServer — the fleet's external I/O rate;
        # the engine resamples to 16 kHz inside its jitted step.
        self.engine = engine or EncoderEngine(
            sample_rate_hz or config.INTERNAL_SAMPLE_RATE,
            model_path=model_path)
        if (sample_rate_hz is not None
                and self.engine.sample_rate_hz != sample_rate_hz):
            raise ValueError(
                f"sample_rate_hz={sample_rate_hz} contradicts the injected "
                f"engine's {self.engine.sample_rate_hz} Hz")
        self.sample_rate_hz = self.engine.sample_rate_hz
        self.hop_samples = self.engine.hop_samples
        self.capacity = capacity
        self._state = self.engine.init_state(capacity)
        self._slots: List[_Slot] = [_Slot(None) for _ in range(capacity)]
        self._by_id: Dict[object, int] = {}
        self._stage_cap = self.engine._max_stages or self.engine.rvq.num_stages
        self._default_bits = self._check_bits(bitrate)
        self._nq = np.full(
            capacity, self._default_bits // config.BITS_PER_QUANTIZER, np.int32)
        self._bits = np.full(capacity, self._default_bits, np.int32)
        # See DecoderServer._gen: detects slot reuse across an async drain.
        self._gen = np.zeros(capacity, np.int64)

    def _check_bits(self, bitrate: int) -> int:
        bits = config.bitrate_to_num_quantized_bits(bitrate)
        if bits < 0:
            raise ValueError(f"unsupported bitrate {bitrate}")
        if bits // config.BITS_PER_QUANTIZER > self._stage_cap:
            raise ValueError(
                f"bitrate {bitrate} needs more RVQ stages than this engine's "
                f"max_bitrate cap computes ({self._stage_cap})")
        return bits

    @property
    def num_active(self) -> int:
        return len(self._by_id)

    def add_stream(self, stream_id, bitrate: Optional[int] = None,
                   slot: Optional[int] = None) -> int:
        if stream_id in self._by_id:
            raise KeyError(f"stream {stream_id!r} already active")
        # Validate before mutating anything: a bad bitrate must not leave a
        # half-admitted stream occupying a slot.
        bits = (self._default_bits if bitrate is None
                else self._check_bits(bitrate))
        if slot is not None:
            i = _check_slot(self._slots, self.capacity, slot)
        else:
            for i, s in enumerate(self._slots):
                if not s.active:
                    break
            else:
                raise RuntimeError("server at capacity")
        mask = np.zeros(self.capacity, bool)
        mask[i] = True
        self._state = self.engine.reset_rows(self._state, mask)
        self._slots[i] = _Slot(stream_id, True)
        self._by_id[stream_id] = i
        # Reused slots must not inherit the evicted stream's bitrate.
        self._nq[i] = bits // config.BITS_PER_QUANTIZER
        self._bits[i] = bits
        self._gen[i] += 1
        self._active_cache = None
        return i

    def add_streams(self, stream_ids, bitrate: Optional[int] = None,
                    slots: Optional[Dict[object, int]] = None
                    ) -> Dict[object, int]:
        """Bulk admission at one bitrate — see DecoderServer.add_streams."""
        ids = list(stream_ids)
        bits = (self._default_bits if bitrate is None
                else self._check_bits(bitrate))
        if not ids:
            return {}
        mask, slots = _assign_slots(self._by_id, self._slots, self.capacity,
                                    ids, want=slots)
        self._state = self.engine.reset_rows(self._state, mask)
        for sid, i in slots.items():
            self._slots[i] = _Slot(sid, True)
            self._by_id[sid] = i
            self._nq[i] = bits // config.BITS_PER_QUANTIZER
            self._bits[i] = bits
            self._gen[i] += 1
        self._active_cache = None
        return slots

    def remove_stream(self, stream_id) -> None:
        i = self._by_id.pop(stream_id)
        self._slots[i] = _Slot(None, False)
        # Drop the evicted stream's bitrate immediately: the wire width is
        # computed from _bits (tick_packed's max_size, _wire_submit's
        # max_bits), and a stale 9.2 kbps entry would keep an all-3.2 kbps
        # fleet emitting 23-byte rows until the slot is reused.
        self._nq[i] = self._default_bits // config.BITS_PER_QUANTIZER
        self._bits[i] = self._default_bits
        self._active_cache = None

    def set_bitrate(self, stream_id, bitrate: int) -> None:
        """Per-stream dynamic bitrate (reference: LyraEncoder::set_bitrate) —
        streams at different bitrates batch together."""
        bits = self._check_bits(bitrate)
        i = self._by_id[stream_id]
        self._nq[i] = bits // config.BITS_PER_QUANTIZER
        self._bits[i] = bits

    def save(self, path: str, transport: Optional[dict] = None) -> None:
        """Drain-for-maintenance snapshot — see DecoderServer.save."""
        _server_save(self, path, "encoder", {
            "bits": self._bits.tolist(),
        }, transport)

    def restore(self, path: str) -> Optional[dict]:
        def validate(extra):
            # The snapshot's *active* streams' bitrates must fit THIS
            # engine's stage cap: restoring 9.2 kbps streams onto a
            # max_bitrate=3200 engine would pack packets from RVQ stages
            # the engine statically skips — the silently-degraded condition
            # add_stream/set_bitrate refuse.  Inactive slots' stale bits
            # are overwritten on re-admission, so they don't gate restore.
            for (sid, active), bits in zip(extra["slots"], extra["bits"]):
                if active and bits // config.BITS_PER_QUANTIZER > self._stage_cap:
                    raise ValueError(
                        f"snapshot stream {sid!r} at {bits} quantized bits "
                        f"exceeds this engine's max_bitrate stage cap "
                        f"({self._stage_cap})")

        extra = _server_restore(self, path, "encoder",
                                required=("bits",), validate=validate)
        self._bits = np.asarray(extra["bits"], np.int32)
        self._nq = (self._bits // config.BITS_PER_QUANTIZER).astype(np.int32)
        return extra.get("transport")

    def tick_packed(self, audio: np.ndarray):
        """Array-based encode tick: audio [capacity, hop] int16-scale →
        (packets [capacity, max_size] uint8, sizes [capacity] int32).

        sizes is 0 for DTX noise hops; mixed per-stream bitrates pack in one
        native batch call per size group."""
        _no_inflight_tick(self, "a synchronous tick")
        indices, is_noise, self._state = self.engine.step(
            self._state, _pcm_in(audio), self._nq)
        return self._pack_wire(np.asarray(indices), np.asarray(is_noise),
                               self._bits, self._active_mask())

    def _active_mask(self) -> np.ndarray:
        # Cached per admission epoch (see DecoderServer._active_mask).
        cached = getattr(self, "_active_cache", None)
        if cached is None:
            cached = np.zeros(self.capacity, bool)
            if self._by_id:
                cached[list(self._by_id.values())] = True
            self._active_cache = cached
        return cached

    def _pack_wire(self, indices: np.ndarray, is_noise: np.ndarray,
                   bits_arr: np.ndarray, active: np.ndarray):
        """Indices → (packets [capacity, max_size] u8, sizes [capacity]).

        bits_arr/active are the per-slot wire config *of the tick that
        produced the indices* — the async path snapshots them at submit time
        so set_bitrate/add_stream between submit and drain can't pack a
        row with a config its indices weren't encoded for.  Width follows
        the *active* rows (default when empty), matching _wire_submit.
        """
        act_bits = bits_arr[active]
        max_size = config.packet_size(
            int(act_bits.max()) if act_bits.size else self._default_bits)
        out = np.zeros((self.capacity, max_size), np.uint8)
        sizes = np.zeros(self.capacity, np.int32)
        for bits in np.unique(bits_arr):
            rows = np.flatnonzero((bits_arr == bits) & ~is_noise & active)
            if rows.size == 0:
                continue
            pkts = packet.pack_indices_batch(indices[rows], int(bits))
            out[rows, : pkts.shape[1]] = pkts
            sizes[rows] = pkts.shape[1]
        return out, sizes

    def tick_wire(self, audio: np.ndarray):
        """Device-wire fast path: one jitted call runs the encode step AND
        the wire-format pack on device (packet.pack_wire_device_mixed), so
        the host receives actual packet bytes — half the interconnect
        traffic of index transfers and zero host bit work (+24% measured
        wire-path throughput, PERF.md "Device-side wire codec").

        Mixed per-stream bitrates are supported (reference:
        lyra/lyra_encoder.h:44-101 set_bitrate): rows pack at their own
        bitrate into the fleet's widest packet size, stages beyond a row's
        own masked to zero on device.  Returns (wire [capacity, max_size]
        uint8, sizes [capacity]) bit-identical to tick_packed: each row's
        first sizes[i] bytes are its own-rate packet, the tail and all
        non-emitting rows (inactive slots, DTX noise hops) are zeroed,
        never stale payload.  When feeding DecoderServer.tick_wire, pass
        these sizes and derive its mask as `received & (sizes > 0)`."""
        _no_inflight_tick(self, "a synchronous tick")
        wire, is_noise = self._wire_submit(audio)
        return self._drain_wire((wire, is_noise, self._active_mask(),
                                 self._bits.copy(), self._gen.copy()))

    def _wire_submit(self, audio: np.ndarray):
        """Run the jitted encode+device-pack step; returns device arrays.
        One program serves uniform and mixed fleets (per-row nq is already
        a runtime engine input on the packed path); it recompiles only when
        the fleet's widest bitrate changes.  The width comes from *active*
        rows (default when empty) so an idle fleet can't inflate the wire."""
        rows = list(self._by_id.values())
        max_bits = int(self._bits[rows].max()) if rows else self._default_bits
        cache = getattr(self, "_wire_steps", None)
        if cache is None:
            cache = self._wire_steps = {}
        if max_bits not in cache:
            import jax

            @jax.jit
            def _wire_step(state, frames, nq_row, max_bits=max_bits):
                indices, is_noise, state = self.engine._step_impl(
                    state, frames, nq_row)
                wire = packet.pack_wire_device_mixed(indices, nq_row,
                                                     max_bits)
                return wire, is_noise, state

            # Keyed cache: bitrate churn (a 9.2 kbps caller joining/leaving
            # an all-3.2 fleet) must not recompile on every width flip.
            cache[max_bits] = _wire_step
        self._wire_step = cache[max_bits]
        wire, is_noise, self._state = self._wire_step(
            self._state, _pcm_in(audio), self._nq)
        return wire, is_noise

    def _drain_wire(self, pending):
        wire, is_noise, active, bits, gen_prev = pending
        wire = np.array(wire)  # writable host copy
        # Match tick_packed exactly: non-emitting rows carry zeros, not the
        # slot's stale encoder output (an inactive row's bytes would be a
        # removed stream's encoded audio); a slot re-admitted since submit
        # emits size 0, like tick_packed_async.  bits is the submit-time
        # snapshot, so set_bitrate between submit and drain can't mislabel
        # a row's size.
        emit = (active & ~np.asarray(is_noise)) & (gen_prev == self._gen)
        wire[~emit] = 0
        sizes = np.where(emit, config.packet_size(bits), 0).astype(np.int32)
        return wire, sizes

    def tick_wire_async(self, audio: np.ndarray):
        """Pipelined tick_wire: submit this tick's audio, return the
        *previous* tick's (wire, sizes) — None on the first call.  Same
        overlap and slot-reuse-suppression contract as tick_packed_async."""
        if getattr(self, "_pending", None) is not None:
            raise RuntimeError(
                "tick_packed_async pipeline in flight; flush_async() first")
        wire, is_noise = self._wire_submit(audio)
        for dev_arr in (wire, is_noise):
            if hasattr(dev_arr, "copy_to_host_async"):
                dev_arr.copy_to_host_async()
        pending = getattr(self, "_wire_pending", None)
        self._wire_pending = (wire, is_noise, self._active_mask(),
                              self._bits.copy(), self._gen.copy())
        if pending is None:
            return None
        return self._drain_wire(pending)

    def flush_wire_async(self):
        pending = getattr(self, "_wire_pending", None)
        self._wire_pending = None
        if pending is None:
            return None
        return self._drain_wire(pending)

    def tick_packed_async(self, audio: np.ndarray):
        """Pipelined encode tick: submit this tick's audio, return the
        *previous* tick's (packets, sizes) — None on the first call.  Same
        overlap contract as DecoderServer.tick_packed_async; a slot that
        changed hands between submit and drain emits size 0, so the evicted
        stream's packet can never be attributed to the new occupant."""
        if getattr(self, "_wire_pending", None) is not None:
            raise RuntimeError(
                "tick_wire_async pipeline in flight; flush_wire_async() first")
        indices, is_noise, self._state = self.engine.step(
            self._state, _pcm_in(audio), self._nq)
        for dev_arr in (indices, is_noise):
            if hasattr(dev_arr, "copy_to_host_async"):
                dev_arr.copy_to_host_async()
        pending = getattr(self, "_pending", None)
        # Snapshot the wire config with the indices it belongs to (see
        # _pack_wire): self._bits/_by_id may legally change before drain.
        self._pending = (indices, is_noise, self._bits.copy(),
                         self._active_mask(), self._gen.copy())
        if pending is None:
            return None
        return self._drain(pending)

    def _drain(self, pending):
        indices, is_noise, bits, active, gen_prev = pending
        return self._pack_wire(np.asarray(indices), np.asarray(is_noise),
                               bits, active & (gen_prev == self._gen))

    def flush_async(self):
        """Drain the last in-flight tick of whichever async pipeline is
        live (tick_packed_async or tick_wire_async)."""
        pending = getattr(self, "_pending", None)
        self._pending = None
        if pending is None:
            return self.flush_wire_async()
        return self._drain(pending)

    def tick(self, audio: Dict[object, np.ndarray]) -> Dict[object, bytes]:
        """One 20 ms step: stream_id -> hop of int16 samples in,
        stream_id -> wire packet bytes out (b"" for DTX noise hops)."""
        _no_inflight_tick(self, "a synchronous tick")
        missing = self._by_id.keys() - audio.keys()
        if missing:
            # Encoding zeros for an omitted active stream would emit a real
            # packet of silence and advance its conv state with no error —
            # the host's capture pipeline must account for every live call
            # (fail loudly; a DECODER-side missing entry is a loss event,
            # but there is no such thing as "lost" mic audio host-side).
            raise ValueError(
                f"no audio for active streams {sorted(missing, key=repr)!r}")
        # All-int16 hops assemble into an int16 frame buffer so the dict
        # API gets the 2 B/sample upload too; any float hop (legal:
        # non-integral int16-scale values) keeps the f32 contract.
        hops = {sid: np.asarray(hop) for sid, hop in audio.items()}
        dt = (np.int16 if all(h.dtype == np.int16 for h in hops.values())
              else np.float32)
        frames = np.zeros((self.capacity, self.engine.hop_samples), dt)
        for sid, hop in hops.items():
            i = self._by_id.get(sid)
            if i is None:
                raise KeyError(f"unknown stream {sid!r}")
            frames[i] = hop.astype(dt)

        indices, is_noise, self._state = self.engine.step(
            self._state, frames, self._nq)
        indices = np.asarray(indices)
        is_noise = np.asarray(is_noise)

        out: Dict[object, bytes] = {}
        # Group by bitrate so each group packs in one native batch call.
        for bits in np.unique(self._bits[list(self._by_id.values())] if self._by_id else []):
            ids = [sid for sid, i in self._by_id.items()
                   if self._bits[i] == bits and not is_noise[i]]
            if not ids:
                continue
            rows = np.stack([indices[self._by_id[sid]] for sid in ids])
            pkts = packet.pack_indices_batch(rows, int(bits))
            for sid, row in zip(ids, pkts):
                out[sid] = row.tobytes()
        for sid, i in self._by_id.items():
            if is_noise[i]:
                out[sid] = b""
        return out


def _concat_wave_outputs(outs):
    """Concatenate per-wave tick outputs along the stream axis.

    Handles both decoder ticks (one audio array) and encoder ticks
    ((wire, sizes) tuples).  Rows right-pad to the widest wave's width —
    wire tails are zero by the tick_wire contract; audio rows from a
    lower-rate wave of a mixed-rate pool carry their own hop in the
    leading columns and zero padding after (a 16 kHz row in a pool whose
    widest wave is 48 kHz is 320 samples + 640 zeros)."""
    def pad_to(arrays, width):
        # No-op for the common single-rate/single-size pool: np.pad always
        # copies, and these are the fleet's PCM/wire buffers every 20 ms.
        return [a if a.shape[1] == width
                else np.pad(a, ((0, 0), (0, width - a.shape[1])))
                for a in arrays]

    if isinstance(outs[0], tuple):
        wires, sizes = zip(*outs)
        wires = pad_to(wires, max(w.shape[1] for w in wires))
        return np.concatenate(wires), np.concatenate(sizes)
    return np.concatenate(pad_to(outs, max(a.shape[1] for a in outs)))


class ServerPool:
    """Wave-scheduled serving: one fleet split across N identical servers
    whose device programs interleave each tick.

    Why: one program over the whole fleet sits past the HBM working-set
    knee — two waves of 8192 streams run ~15% more streams per chip than
    one 16384-stream program (PERF.md round 3; bench.py serves its
    headline this way).  Streams are row-independent, so the fleet
    partitions freely; the pool preserves the single-server array API with
    global rows = the concatenation of each wave's rows.  The async tick
    is the intended path: submitting wave i+1 before draining wave i's
    previous output keeps the device queue fed across waves.

    The reference has no counterpart (one codec instance per stream,
    reference: lyra/lyra_encoder.h:30-43); this is deployment-scale
    runtime, like the servers it wraps.

    Mixed external sample rates: waves may run at different I/O rates
    (each wave's engine resamples on device, see the servers'
    sample_rate_hz) — a pool of a 16 kHz wave and a 48 kHz wave serves
    both client populations on one chip.  Admission then routes by rate
    (`add_stream(sid, sample_rate_hz=...)`, required once the pool is
    mixed-rate), encoder PCM input is [capacity, max hop] with each row's
    own hop left-aligned, and decoder output rows pad the same way
    (reference: lyra/lyra_config.h:56-57 — per-codec-instance external
    rates, here per wave at serving scale).
    """

    def __init__(self, servers: Sequence):
        servers = list(servers)
        if not servers or len({s.capacity for s in servers}) != 1:
            raise ValueError("pool needs >= 1 servers of equal capacity")
        kinds = {type(s) for s in servers}
        if len(kinds) != 1:
            raise ValueError("pool servers must be all-encoder or all-decoder")
        self.servers = servers
        self.wave_capacity = servers[0].capacity
        self.capacity = self.wave_capacity * len(servers)
        self.rates = tuple(s.sample_rate_hz for s in servers)
        # Mixed-rate pools take/emit PCM at the widest wave's hop; see
        # _wave_args for the per-wave column contract.
        self.hop_samples = max(s.hop_samples for s in servers)
        self._is_encoder = isinstance(servers[0], EncoderServer)

    def sample_rate_of(self, stream_id) -> int:
        _, s = self._locate(stream_id)
        return s.sample_rate_hz

    def hop_samples_of(self, stream_id) -> int:
        """Valid sample count of this stream's rows in pool PCM arrays
        (the rest of the row is padding in a mixed-rate pool)."""
        _, s = self._locate(stream_id)
        return s.hop_samples

    def _candidate_waves(self, sample_rate_hz: Optional[int]):
        """Waves admission may target for this rate.  A mixed-rate pool
        with no explicit rate is refused loudly: 'any wave' would pin the
        caller's PCM to whatever rate the emptiest wave happens to run."""
        if sample_rate_hz is None:
            if len(set(self.rates)) > 1:
                raise ValueError(
                    f"pool serves mixed rates {sorted(set(self.rates))}; "
                    f"admission needs an explicit sample_rate_hz")
            return list(range(len(self.servers)))
        waves = [w for w, r in enumerate(self.rates) if r == sample_rate_hz]
        if not waves:
            raise ValueError(
                f"pool has no {sample_rate_hz} Hz wave "
                f"(rates: {sorted(set(self.rates))})")
        return waves

    @property
    def num_active(self) -> int:
        return sum(s.num_active for s in self.servers)

    @property
    def bad_packets(self) -> np.ndarray:
        return np.concatenate([s.bad_packets for s in self.servers])

    def _locate(self, stream_id):
        for w, s in enumerate(self.servers):
            if stream_id in s._by_id:
                return w, s
        raise KeyError(f"unknown stream {stream_id!r}")

    def add_stream(self, stream_id, sample_rate_hz: Optional[int] = None,
                   **kw) -> int:
        """Admit on the least-loaded (rate-matching) wave; returns the
        global row."""
        for s in self.servers:
            if stream_id in s._by_id:
                raise KeyError(f"stream {stream_id!r} already active")
        waves = self._candidate_waves(sample_rate_hz)
        w = min(waves, key=lambda i: self.servers[i].num_active)
        if self.servers[w].num_active >= self.wave_capacity:
            raise RuntimeError(
                "pool at capacity" if sample_rate_hz is None else
                f"pool at capacity for {sample_rate_hz} Hz waves")
        slot = self.servers[w].add_stream(stream_id, **kw)
        return w * self.wave_capacity + slot

    def add_streams(self, stream_ids, sample_rate_hz: Optional[int] = None,
                    **kw) -> Dict[object, int]:
        """Bulk admission, balanced across (rate-matching) waves
        (all-or-nothing)."""
        ids = list(stream_ids)
        if len(set(ids)) != len(ids):
            raise KeyError("duplicate stream ids in bulk admission")
        waves = self._candidate_waves(sample_rate_hz)
        for s in self.servers:
            for sid in ids:
                if sid in s._by_id:
                    raise KeyError(f"stream {sid!r} already active")
        free = [self.wave_capacity - self.servers[w].num_active
                for w in waves]
        if len(ids) > sum(free):
            raise RuntimeError(
                "pool at capacity" if sample_rate_hz is None else
                f"pool at capacity for {sample_rate_hz} Hz waves")
        # Fill toward balance: each id goes to the emptiest candidate wave.
        assign: Dict[int, List[object]] = {w: [] for w in waves}
        load = {w: self.servers[w].num_active for w in waves}
        for sid in ids:
            w = min(waves, key=lambda i: load[i])
            assign[w].append(sid)
            load[w] += 1
        out: Dict[object, int] = {}
        for w, group in assign.items():
            for sid, slot in self.servers[w].add_streams(group, **kw).items():
                out[sid] = w * self.wave_capacity + slot
        return out

    def remove_stream(self, stream_id) -> None:
        _, s = self._locate(stream_id)
        s.remove_stream(stream_id)

    def set_bitrate(self, stream_id, bitrate: int) -> None:
        _, s = self._locate(stream_id)
        s.set_bitrate(stream_id, bitrate)

    def _wave_args(self, w: int, arrays):
        lo = w * self.wave_capacity
        out = tuple(a[lo: lo + self.wave_capacity] for a in arrays)
        if self._is_encoder:
            # Encoder ticks take one PCM array.  In a mixed-rate pool it is
            # [capacity, max hop] with each row's own hop left-aligned, so a
            # lower-rate wave reads only its leading columns; anything
            # narrower than the pool hop is the caller assembling the wrong
            # buffer (a row's tail would silently decode as dropped audio).
            (audio,) = out
            if audio.ndim != 2 or audio.shape[1] != self.hop_samples:
                raise ValueError(
                    f"pool PCM must be [capacity, {self.hop_samples}] "
                    f"(the widest wave's hop); got {audio.shape}")
            out = (audio[:, : self.servers[w].hop_samples],)
        return out

    def tick_wire(self, *arrays):
        """Synchronous tick over all waves (correctness path; the async
        variant is the throughput path — it keeps the device queue fed)."""
        return _concat_wave_outputs([
            s.tick_wire(*self._wave_args(w, arrays))
            for w, s in enumerate(self.servers)])

    def tick_packed(self, *arrays):
        """Host-codec tick over all waves (the servers' tick_packed,
        sliced/concatenated exactly like tick_wire)."""
        return _concat_wave_outputs([
            s.tick_packed(*self._wave_args(w, arrays))
            for w, s in enumerate(self.servers)])

    def tick_packed_async(self, *arrays):
        return self._merge_async([
            s.tick_packed_async(*self._wave_args(w, arrays))
            for w, s in enumerate(self.servers)])

    def flush_async(self):
        return self._merge_async([s.flush_async() for s in self.servers])

    def tick_wire_async(self, *arrays):
        """Submit every wave's tick back-to-back, then return the
        *previous* tick's concatenated outputs (None on the first call).
        Per-wave submits happen before any drain, so wave i+1's device
        program queues while wave i's prior output is still in flight."""
        outs = [s.tick_wire_async(*self._wave_args(w, arrays))
                for w, s in enumerate(self.servers)]
        return self._merge_async(outs)

    def flush_wire_async(self):
        return self._merge_async([s.flush_wire_async()
                                  for s in self.servers])

    @staticmethod
    def _merge_async(outs):
        """None only when EVERY wave is pipeline-priming; a mix of drained
        and None waves means the pipelines desynchronized (e.g. one wave
        raised on an earlier tick) -- silently returning None would drop
        the drained waves' audio on the floor, so fail loudly instead."""
        pending = [o is None for o in outs]
        if all(pending):
            return None
        if any(pending):
            raise RuntimeError(
                f"pool wave pipelines desynchronized (waves "
                f"{[w for w, p in enumerate(pending) if p]} have nothing "
                f"in flight); flush and re-prime the pool")
        return _concat_wave_outputs(outs)

    def save(self, path: str, transport: Optional[dict] = None) -> None:
        """One snapshot per wave (path.w0, path.w1, ...).  The opaque
        serving-layer `transport` dict spans the whole pool (slot rows are
        pool-wide), so it rides wave 0's snapshot."""
        for w, s in enumerate(self.servers):
            s.save(f"{path}.w{w}", transport if w == 0 else None)

    def restore(self, path: str) -> Optional[dict]:
        """All-or-nothing across waves: the snapshot's wave count must
        match this pool exactly BEFORE any wave is mutated — restoring a
        3-wave snapshot into a 2-wave pool would silently drop wave 2's
        calls, and a partial per-wave restore would leave the pool half
        old, half new (each wave's own restore is atomic; the pool must
        be too)."""
        import os

        for w in range(len(self.servers)):
            if not os.path.exists(f"{path}.w{w}.npz"):
                raise ValueError(
                    f"pool snapshot {path!r} is missing wave {w} "
                    f"(pool has {len(self.servers)} waves)")
            # Header-only peek: catch per-wave capacity mismatches before
            # any wave mutates (each wave's restore re-validates fully).
            extra = checkpoint.peek_extra(f"{path}.w{w}")
            nslots = len(extra.get("slots", ()))
            if nslots != self.wave_capacity:
                raise ValueError(
                    f"pool snapshot wave {w} capacity {nslots} != wave "
                    f"capacity {self.wave_capacity}")
        if os.path.exists(f"{path}.w{len(self.servers)}.npz"):
            raise ValueError(
                f"pool snapshot {path!r} has more waves than this pool's "
                f"{len(self.servers)} — its extra streams would be "
                f"silently dropped")
        # The header peeks above catch shape mismatches, but a wave can
        # still fail mid-loop on deeper problems (wrong snapshot kind,
        # bitrate over this engine's cap, corrupt arrays).  Snapshot every
        # wave's mutable host state first and roll back on any failure so
        # the pool is never left half restored.
        fields = ("_state", "_slots", "_by_id", "_gen", "_active_cache",
                  "_seed", "bad_packets", "_last_comfort", "inactive_drops",
                  "_bits", "_nq")
        saved = [{f: getattr(srv, f) for f in fields if hasattr(srv, f)}
                 for srv in self.servers]
        try:
            transport = None
            for w, s in enumerate(self.servers):
                tr = s.restore(f"{path}.w{w}")
                if w == 0:
                    transport = tr
        except Exception:
            for srv, snap in zip(self.servers, saved):
                for f, v in snap.items():
                    setattr(srv, f, v)
            raise
        return transport
