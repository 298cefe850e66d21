"""Property-based tests (hypothesis) for the wire format and jitter buffer."""

import os

import numpy as np
from hypothesis import given, settings, strategies as st

from lyra_tpu import config, packet


@settings(max_examples=50, deadline=None)
@given(
    st.integers(0, len(config.SUPPORTED_QUANTIZED_BITS) - 1),
    st.integers(1, 33),
    st.integers(0, 2**32 - 1),
)
def test_packet_roundtrip_property(bits_i, batch, seed):
    num_bits = config.SUPPORTED_QUANTIZED_BITS[bits_i]
    n_stages = num_bits // config.BITS_PER_QUANTIZER
    rng = np.random.RandomState(seed)
    idx = rng.randint(0, 16, (batch, n_stages)).astype(np.int32)
    pkts = packet.pack_indices_batch(idx, num_bits)
    assert pkts.shape == (batch, config.packet_size(num_bits))
    back = packet.unpack_indices_batch(pkts, num_bits)
    np.testing.assert_array_equal(back, idx)
    # scalar path agrees with the batch path
    for b in range(min(batch, 4)):
        assert bytes(pkts[b]) == packet.pack_indices(idx[b], num_bits)


class _JitterBufferModel:
    """Python mirror of native/jitter_buffer.cc single-stream semantics:
    playout-delay absorption, in-window filing, dup detection, and the
    out-of-window streak resync on EITHER side.  The streak threshold
    discriminates by class: overflow and FAR-late (a real desync — the
    gap never closes on its own) resync after 3 consecutive inserts;
    NEAR-late (within one ring depth behind head) is ambiguous with a
    transient delay burst and needs 25 — see kNearLateResyncAfter in
    native/jitter_buffer.cc."""

    RESYNC_AFTER = 3
    NEAR_LATE_RESYNC_AFTER = 25

    def __init__(self, depth: int, playout_delay: int):
        self.depth = depth
        self.head = 0
        self.delay = self.delay0 = playout_delay
        self.streak = 0
        self.slots = {}  # seq -> payload (in-window only)

    def insert(self, seq: int, payload: bytes) -> int:
        if seq < 0:
            return 2  # corrupt header: counted late, never a resync target
        if seq < self.head or seq >= self.head + self.depth:
            near_late = self.head - self.depth <= seq < self.head
            limit = (self.NEAR_LATE_RESYNC_AFTER if near_late
                     else self.RESYNC_AFTER)
            self.streak += 1
            if self.streak < limit:
                return 2 if seq < self.head else 4
            self.streak = 0
            self.head = seq
            self.delay = self.delay0
            self.slots = {}
        else:
            self.streak = 0
        if seq in self.slots:
            return 3
        self.slots[seq] = payload
        return 0

    def collect(self):
        if self.delay > 0:
            self.delay -= 1
            return None
        out = self.slots.pop(self.head, None)
        self.head += 1
        return out


@settings(max_examples=60, deadline=None)
@given(st.data())
def test_jitter_buffer_matches_model(data):
    """The native jitter buffer behaves like the python model above for
    arbitrary insert orders with duplicates, gaps, delays, and senders
    whose sequence origin is behind or ahead of the playout schedule
    (exercising both resync directions), insert return codes included."""
    from lyra_tpu.tools.jitter_buffer import JitterBuffer

    depth = 8
    n_seq = data.draw(st.integers(1, 14))
    # The sender's sequence origin vs the receiver's tick 0: 0 is the
    # in-sync case; a large origin means the receiver ran warm before the
    # sender appeared (late side); arrivals may also bunch far ahead of a
    # small origin (overflow side).
    origin = data.draw(st.sampled_from([0, 0, 0, 5, 20]))
    # (seq, arrival_tick) pairs; bounded network delay, causality kept
    arrivals = []
    for k in range(n_seq):
        if data.draw(st.booleans()):  # packet survives the network
            net = data.draw(st.integers(0, 5))
            arrivals.append((origin + k, k + net))
    if data.draw(st.booleans()) and arrivals:
        arrivals.append(arrivals[0])  # a duplicate

    delay = data.draw(st.integers(0, 3))
    jb = JitterBuffer(1, 8, depth=depth)
    jb.add_stream(0, playout_delay=delay)
    model = _JitterBufferModel(depth, delay)

    got, expect = [], []
    for t in range(n_seq + 8):
        for seq, at in arrivals:
            if at == t:
                rc = jb.insert(0, seq, bytes([seq]))
                mrc = model.insert(seq, bytes([seq]))
                assert rc == mrc, f"rc {rc} != model {mrc} at t={t} seq={seq}"
        pkts, received, sizes = jb.collect()
        got.append(bytes(pkts[0, : sizes[0]]) if received[0] else None)
        expect.append(model.collect())
    assert got == expect


@settings(max_examples=40, deadline=None)
@given(
    st.lists(st.sampled_from(config.SUPPORTED_QUANTIZED_BITS),
             min_size=1, max_size=16),
    st.integers(0, 2**32 - 1),
)
def test_mixed_device_wire_property(bits_rows, seed):
    """For ANY per-row bitrate assignment, the mixed device codec must be
    row-wise bit-identical to the host batch codec at each row's own rate,
    zero beyond each row's size, and round-trip exactly."""
    import jax

    rng = np.random.RandomState(seed)
    bits_rows = np.asarray(bits_rows, np.int32)
    nq = bits_rows // config.BITS_PER_QUANTIZER
    max_bits = int(bits_rows.max())
    idx = rng.randint(0, 16, (len(bits_rows), 46)).astype(np.int32)
    for r, n in enumerate(nq):
        idx[r, n:] = -1  # the engine's un-run stage marker

    wire = np.asarray(jax.jit(
        lambda i, q: packet.pack_wire_device_mixed(i, q, max_bits))(idx, nq))
    assert wire.shape == (len(bits_rows), config.packet_size(max_bits))
    for r, bits in enumerate(bits_rows):
        size = config.packet_size(int(bits))
        host = packet.pack_indices_batch(idx[r:r + 1, :nq[r]], int(bits))
        np.testing.assert_array_equal(wire[r, :size], host[0])
        assert not wire[r, size:].any()

    back = np.asarray(jax.jit(packet.unpack_wire_device_mixed)(wire, nq))
    for r, n in enumerate(nq):
        np.testing.assert_array_equal(back[r, :n], idx[r, :n])
        assert (back[r, n:] == -1).all()


@settings(max_examples=40, deadline=None)
@given(st.data())
def test_fleet_journal_replay_equivalence(data):
    """Property: ANY precondition-respecting sequence of fleet routing
    mutations, journaled, replays to an identical router — hosts table,
    every stream's seat, room homes, and seat-token enforcement.  This is
    the journal's core contract (a restarted controller must answer
    exactly as the one that died would have); example-based tests pin
    known shapes, this pins the op algebra."""
    import random as _random
    import tempfile

    from lyra_tpu.tools.fleet import FleetJournal, FleetRouter

    class _Ctl:
        def __init__(self, addr=("10.0.0.1", 1001)):
            self.addr = addr

        def request(self, *a, **k):
            return {"ok": True}

        def drain(self, p):
            return {"ok": True}

        def restore(self, p):
            return {"ok": True}

        def close(self):
            pass

    rng = _random.Random(data.draw(st.integers(0, 2**32 - 1)))
    tmpdir = tempfile.TemporaryDirectory()
    jpath = os.path.join(tmpdir.name, "j.jsonl")
    r = FleetRouter(FleetJournal(jpath, compact_every=25))
    counter = [0]
    live = {}  # sid -> token

    def fresh(prefix):
        counter[0] += 1
        return f"{prefix}{counter[0]}"

    for _ in range(120):
        hosts = r.hosts()
        actives = [n for n, h in hosts.items()
                   if not h["standby"] and not h["busy"]]
        standbys = [n for n, h in hosts.items()
                    if h["standby"] and not h["busy"]]
        op = rng.random()
        try:
            if op < 0.25 or not hosts:
                r.add_host(fresh("h"), ("10.0.0.1", 5620), _Ctl(),
                           rng.choice((2, 4)),
                           standby=rng.random() < 0.4)
            elif op < 0.55:
                tok = fresh("t") if rng.random() < 0.5 else None
                sid = fresh("s")
                r.admit(sid, token=tok)
                live[sid] = tok
            elif op < 0.7 and live:
                sid = rng.choice(sorted(live))
                r.release(sid, token=live.pop(sid))
            elif op < 0.8 and actives and standbys:
                src, dst = rng.choice(actives), rng.choice(standbys)
                if rng.random() < 0.5:
                    r.migrate(src, dst, "/tmp/snap")
                else:  # exercise begin/abort (incl. src_stopped parking)
                    r.begin_handoff(src, dst)
                    r.abort_handoff(src, dst,
                                    src_stopped=rng.random() < 0.5)
            elif op < 0.9:
                empties = [n for n, h in hosts.items()
                           if h["occupied"] == 0 and not h["busy"]]
                if empties:
                    r.remove_host(rng.choice(empties))
            else:
                r.hosts()  # no-op read
        except (RuntimeError, KeyError):
            pass  # precondition refusal (full fleet, mismatch, ...)

    r2, open_hosts = FleetRouter.replay(
        jpath, control_factory=lambda addr: _Ctl(addr))
    assert open_hosts == []  # every handoff above was closed
    assert r2.hosts() == r.hosts()
    for sid, tok in live.items():
        assert r2.locate(sid, token=tok) == r.locate(sid, token=tok)
        if tok is not None:
            import pytest as _pytest

            with _pytest.raises(PermissionError):
                r2.locate(sid)
    # And the rebuilt router keeps routing identically.
    try:
        a = r.admit("probe")
    except RuntimeError:  # fleet full: the rebuilt one must refuse too
        a = None
    try:
        b = r2.admit("probe")
    except RuntimeError:
        b = None
    assert a == b
    r.close()
    r2.close()
    tmpdir.cleanup()


@settings(max_examples=60, deadline=None)
@given(st.data())
def test_control_auth_sign_verify_property(data):
    """Property: any JSON-object command signs and verifies; mutating any
    single field (or dropping one) under the same mac fails; a fresh
    re-sign of the same body verifies independently."""
    from lyra_tpu.tools.control_auth import AuthError, Verifier, sign

    key = bytes(data.draw(st.binary(min_size=16, max_size=64)))
    scalar = st.one_of(st.none(), st.booleans(),
                       st.integers(-2**31, 2**31),
                       st.text(max_size=20))
    body = data.draw(st.dictionaries(
        st.text(min_size=1, max_size=10).filter(
            lambda k: k not in ("mac", "ts", "nonce")),
        st.one_of(scalar, st.lists(scalar, max_size=4)),
        max_size=6))
    body["cmd"] = data.draw(st.text(min_size=1, max_size=10))
    v = Verifier(key)
    msg = sign(body, key)
    v.verify(msg)
    v.verify(dict(msg))  # byte-identical duplicate = the UDP retry

    import json as _json

    # JSON round trip (what the wire does) still verifies.
    Verifier(key).verify(_json.loads(_json.dumps(msg)))

    # Any single-field mutation dies.
    victim = data.draw(st.sampled_from(sorted(msg)))
    mutated = dict(msg)
    if isinstance(mutated[victim], str):
        mutated[victim] = mutated[victim] + "x"
    else:
        mutated[victim] = "tampered"
    with __import__("pytest").raises(AuthError):
        Verifier(key).verify(mutated)
    dropped = {k: x for k, x in msg.items() if k != victim}
    with __import__("pytest").raises(AuthError):
        Verifier(key).verify(dropped)


@settings(max_examples=30, deadline=None)
@given(st.data())
def test_admission_socket_survives_hostile_datagrams(data):
    """Fuzz: arbitrary bytes and arbitrary JSON values thrown at the
    fleet admission socket must never kill the poll loop or corrupt the
    routing tables — every hostile datagram is an error reply or a silent
    drop, and a legitimate admit still works afterward."""
    import json as _json
    import socket as _socket

    from lyra_tpu.tools.fleet import FleetRouter
    from lyra_tpu.tools.fleet_main import _AdmissionService, _Watchdog

    class _Ctl:
        addr = ("127.0.0.1", 1001)

        def request(self, *a, **k):
            return {"ok": True}

        def close(self):
            pass

    r = FleetRouter()
    r.add_host("a", ("127.0.0.1", 1), _Ctl(), 4)
    svc = _AdmissionService(r, _Watchdog(r, None, log=lambda *_: None),
                            0, "127.0.0.1")
    tx = _socket.socket(_socket.AF_INET, _socket.SOCK_DGRAM)
    tx.settimeout(2.0)
    try:
        payloads = data.draw(st.lists(st.one_of(
            st.binary(max_size=200),
            st.text(max_size=100).map(lambda t: t.encode()),
            st.one_of(
                st.none(), st.integers(), st.lists(st.integers(),
                                                   max_size=3),
                st.dictionaries(
                    st.text(max_size=8).filter(lambda k: k != "cmd"),
                    st.one_of(st.none(), st.integers(),
                              st.text(max_size=10)),
                    max_size=4),
            ).map(lambda v: _json.dumps(v).encode()),
        ), min_size=1, max_size=12))
        for pl in payloads:
            tx.sendto(pl, ("127.0.0.1", svc.port))
        for _ in range(50):
            svc.poll(None)  # must never raise
        # The service still serves a legitimate caller.
        req = _json.dumps({"cmd": "admit", "stream": "ok-caller",
                           "req": "rq", "token": "t"}).encode()
        tx.sendto(req, ("127.0.0.1", svc.port))
        reply = None
        for _ in range(200):
            svc.poll(None)
            try:
                cand = _json.loads(tx.recv(65536).decode())
            except _socket.timeout:
                continue
            if cand.get("req") == "rq":
                reply = cand
                break
        assert reply is not None and reply["ok"], reply
        st_hosts = r.hosts()
        assert st_hosts["a"]["occupied"] == 1  # only the legit admit
    finally:
        tx.close()
        svc.close()
        r.close()
