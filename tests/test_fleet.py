"""Fleet composition: admission routing, control plane, drain/migrate.

The scaling unit above one chip is DCN-free (independent batches per
host, SURVEY §5); these tests pin the routing bookkeeping with fake
hosts, then drive the real control plane (serve_main --control) and a
full in-process drain→restore handoff between two server loops.
"""

import json
import os
import socket
import threading
import time

import numpy as np
import pytest

from lyra_tpu.tools.fleet import ControlError, FleetRouter, HostControl


class _FakeControl:
    """Duck-typed HostControl recording calls; dead=True times out like a
    crashed host.  `addr` mirrors HostControl.addr (the journal records
    it for replay)."""

    def __init__(self, dead=False, addr=("127.0.0.1", 1001)):
        self.calls = []
        self.dead = dead
        self.addr = addr

    def request(self, cmd, _timeout=None, _retries=None, **fields):
        self.calls.append((cmd, fields))
        if self.dead:
            raise socket.timeout("host is dead")
        return {"ok": True}

    def drain(self, path):
        self.calls.append(("drain", path))
        return {"ok": True, "ticks": 7}

    def restore(self, path):
        self.calls.append(("restore", path))
        return {"ok": True}

    def close(self):
        pass


def _router(*hosts):
    r = FleetRouter()
    for name, cap, standby in hosts:
        r.add_host(name, ("127.0.0.1", 1000), _FakeControl(), cap,
                   standby=standby)
    return r


def test_router_least_loaded_admission_and_release():
    r = _router(("a", 2, False), ("b", 2, False))
    seats = [r.admit(f"s{i}") for i in range(4)]
    # Least-loaded alternates hosts; slots are dense per host.
    assert [s[0] for s in seats] == ["a", "b", "a", "b"]
    assert [s[2] for s in seats] == [0, 0, 1, 1]
    with pytest.raises(RuntimeError):
        r.admit("overflow")  # fleet full
    r.release("s0")
    name, _, slot = r.admit("s4")  # freed seat is reused
    assert (name, slot) == ("a", 0)
    with pytest.raises(KeyError):
        r.admit("s4")  # duplicate stream id


def test_router_standby_excluded_until_migration():
    r = _router(("a", 2, False), ("b", 2, True))
    assert [r.admit(f"s{i}")[0] for i in range(2)] == ["a", "a"]
    with pytest.raises(RuntimeError):
        r.admit("s2")  # standby does not take admissions
    moved = r.migrate("a", "b", "/tmp/snap")
    assert moved == 2
    # The standby now carries the calls (and is no longer standby); the
    # drained host is empty and can be deregistered.
    assert r.locate("s0") == ("b", ("127.0.0.1", 1000), 0)
    r.remove_host("a")
    with pytest.raises(RuntimeError):
        r.admit("s2")  # b absorbed a's full batch: fleet is full again
    r.release("s1")
    assert r.admit("s2") == ("b", ("127.0.0.1", 1000), 1)


def test_router_migrate_refusals_and_ordering():
    r = _router(("a", 2, False), ("b", 2, False), ("c", 3, False))
    r.admit("s0")
    r.admit("s1")  # lands on b (least loaded)
    with pytest.raises(RuntimeError):
        r.migrate("a", "b", "/tmp/snap")  # destination not empty
    with pytest.raises(RuntimeError):
        r.migrate("a", "c", "/tmp/snap")  # capacity mismatch (positional)
    with pytest.raises(RuntimeError):
        r.remove_host("a")  # still carries a stream
    # Refusals happened before any control traffic.
    assert r._hosts["a"].control.calls == []
    # A valid migration drains src BEFORE restoring dst.
    r.release("s1")
    r.migrate("a", "b", "/tmp/snap")
    assert r._hosts["a"].control.calls == [("drain", "/tmp/snap")]
    assert r._hosts["b"].control.calls == [("restore", "/tmp/snap")]


def test_router_failover_from_dead_host():
    """Crash recovery bookkeeping: a dead host's calls re-home to the
    standby via its last periodic snapshot; a live host is refused
    (failover would fork its calls onto two servers)."""
    r = _router(("a", 2, False), ("b", 2, True))
    r.admit("s0")
    r.admit("s1")
    with pytest.raises(RuntimeError):
        r.failover("a", "b", "/tmp/snap")  # a still answers pings
    r._hosts["a"].control.dead = True  # the crash
    assert not r.alive("a")
    moved = r.failover("a", "b", "/tmp/snap")
    assert moved == 2
    assert r.locate("s0") == ("b", ("127.0.0.1", 1000), 0)
    assert "a" not in r.hosts()  # dead host deregistered
    assert ("restore", "/tmp/snap") in r._hosts["b"].control.calls


def test_room_tiebreak_is_registration_order():
    """Equal-load ties break by REGISTRATION order on both admission
    paths (the FleetRouter docstring's contract) — not alphabetically,
    which would seat the first room on 'alpha' below."""
    r = FleetRouter()
    r.add_host("zeta", ("127.0.0.1", 1), _FakeControl(), 4, room_size=2)
    r.add_host("alpha", ("127.0.0.1", 2), _FakeControl(), 4, room_size=2)
    assert r.admit("x", room="R1")[0] == "zeta"
    assert r.admit("y", room="R2")[0] == "alpha"  # now least-loaded


def test_remove_host_closes_control_socket():
    """Deregistration releases the control fd deterministically (a
    long-running controller cycling hosts through maintenance must not
    accumulate sockets until GC)."""
    ctl = HostControl(("127.0.0.1", 9))  # connect() needs no listener
    r = FleetRouter()
    r.add_host("a", ("127.0.0.1", 1000), ctl, 2)
    r.remove_host("a")
    assert ctl._sock.fileno() == -1  # closed


def test_two_phase_handoff_reserves_both_hosts():
    """begin_handoff's busy marks keep admission, remove_host, and a
    second handoff off both hosts while the blocking RPC phase runs
    outside the fleet lock; abort/commit release them.  A migrate whose
    drain succeeded but restore failed parks the (stopped) source as a
    standby instead of leaving it in the admission pool."""
    r = _router(("a", 2, False), ("b", 2, True), ("c", 2, False))
    src_ctl, dst_ctl = r.begin_handoff("a", "b")
    assert src_ctl is r._hosts["a"].control
    with pytest.raises(RuntimeError, match="in flight"):
        r.begin_handoff("a", "b")
    with pytest.raises(RuntimeError, match="in flight"):
        r.remove_host("a")
    # Admission skips the busy host even though it is the least loaded.
    assert r.admit("s0")[0] == "c"
    assert r.hosts()["a"]["busy"] is True
    r.abort_handoff("a", "b")
    assert r.admit("s1")[0] == "a"  # released

    # Failed-restore abort: the drained source must leave the pool.
    src_ctl, _ = r.begin_handoff("a", "b")
    src_ctl.drain("/tmp/snap")
    r.abort_handoff("a", "b", src_stopped=True)
    assert r.hosts()["a"]["standby"] is True and not r.hosts()["a"]["busy"]

    # Commit re-homes positionally and flips the destination active.
    r2 = _router(("a", 2, False), ("b", 2, True))
    r2.admit("s0")
    r2.begin_handoff("a", "b")
    assert r2.commit_handoff("a", "b", deregister_src=True) == 1
    assert "a" not in r2.hosts()
    assert r2.locate("s0")[0] == "b" and not r2.hosts()["b"]["standby"]


def test_control_request_tolerates_garbage_replies():
    """A garbage or foreign datagram on the control socket (a reused
    port after a crash, a hostile sender) is a non-reply — skipped by
    the matcher, never an exception out of the control client — and the
    real reply is still accepted (the watchdog's probe path relies on
    this: one bad datagram must not kill the sweep thread)."""
    srv = socket.socket(socket.AF_INET, socket.SOCK_DGRAM)
    srv.bind(("127.0.0.1", 0))

    def answer():
        data, addr = srv.recvfrom(64 * 1024)
        req = json.loads(data.decode())["req"]
        srv.sendto(b"\xff\xfe not json", addr)
        srv.sendto(json.dumps(["not", "an", "object"]).encode(), addr)
        srv.sendto(json.dumps({"req": "stale", "ok": True}).encode(), addr)
        srv.sendto(json.dumps({"req": req, "ok": True,
                               "pong": 1}).encode(), addr)

    th = threading.Thread(target=answer)
    th.start()
    ctl = HostControl(srv.getsockname(), timeout=5.0, retries=1)
    try:
        assert ctl.ping()["pong"] == 1
    finally:
        th.join(timeout=10)
        ctl.close()
        srv.close()


def _free_udp_port() -> int:
    s = socket.socket(socket.AF_INET, socket.SOCK_DGRAM)
    s.bind(("127.0.0.1", 0))
    port = s.getsockname()[1]
    s.close()
    return port


def test_control_plane_and_inprocess_migration(model_path, tmp_path):
    """The real control plane end to end, single process, two server
    loops sharing one compiled engine cache: ping/stats on host A, live
    packets decoding, save/restore idempotence, then drain A → restore
    into warm host B → the caller's packets decode on B with A's engine
    state (no re-admission, same wire slots)."""
    from lyra_tpu import packet as pkt
    from lyra_tpu.tools import serve_main

    echo_rx = socket.socket(socket.AF_INET, socket.SOCK_DGRAM)
    echo_rx.bind(("127.0.0.1", 0))
    echo_rx.settimeout(0.05)
    echo_port = echo_rx.getsockname()[1]

    def start_host(extra):
        box = {}
        ready = threading.Event()
        stop = threading.Event()
        ctl_port = _free_udp_port()
        th = threading.Thread(target=serve_main.main, kwargs=dict(
            argv=["--capacity", "2", "--seconds", "0",
                  "--max_bitrate", "3200", "--model_path", model_path,
                  "--playout_delay", "1", "--report_every", "30",
                  "--echo", f"127.0.0.1:{echo_port}",
                  "--control", str(ctl_port)] + extra,
            _on_ready=lambda port: (box.update(port=port), ready.set()),
            _stop=stop))
        th.start()
        assert ready.wait(120), "host never bound its port"
        return th, stop, box["port"], HostControl(("127.0.0.1", ctl_port))

    th_a, stop_a, port_a, ctl_a = start_host([])
    tx = socket.socket(socket.AF_INET, socket.SOCK_DGRAM)
    wire = pkt.pack_indices_batch(np.zeros((2, 16), np.int32), 64)
    seq = 0

    def pump_until_audio(port, deadline_s=180):
        nonlocal seq
        import time

        t_end = time.time() + deadline_s
        while time.time() < t_end:
            for slot in range(2):
                tx.sendto(slot.to_bytes(2, "big") + seq.to_bytes(4, "big")
                          + wire[slot].tobytes(), ("127.0.0.1", port))
            seq += 1
            try:
                return echo_rx.recvfrom(4096)[0]
            except socket.timeout:
                pass
        return None

    th_b = stop_b = ctl_b = None
    try:
        st = ctl_a.wait_ready(120)
        assert st["mode"] == "decode"
        assert pump_until_audio(port_a) is not None, "host A never decoded"

        stats = ctl_a.stats()
        assert stats["capacity"] == 2 and stats["ticks"] > 0
        assert stats["ingest"]["datagrams"] > 0

        # save keeps serving; restore of the same snapshot is accepted.
        snap = str(tmp_path / "snapA")
        assert ctl_a.save(snap)["ticks"] >= 0
        assert os.path.exists(snap + ".npz")  # checkpoint.save_state naming
        # The snapshot carries the transport playout schedule (jb heads),
        # so a restored host locks onto each caller's live sequence
        # immediately instead of via a streak of late drops.
        from lyra_tpu.utils import checkpoint

        heads = checkpoint.peek_extra(snap)["transport"]["jb_heads"]
        assert len(heads) == 2 and all(h >= 0 for h in heads), heads
        ctl_a.restore(snap)
        assert pump_until_audio(port_a) is not None, "host A died after save"

        # A restore that fails validation leaves the host serving.
        with pytest.raises(ControlError):
            ctl_a.restore(str(tmp_path / "missing"))
        assert ctl_a.ping()["ok"]

        # Warm standby B, then the migration: drain A, restore into B.
        th_b, stop_b, port_b, ctl_b = start_host([])
        ctl_b.wait_ready(120)
        ctl_a.drain(snap)
        th_a.join(timeout=60)
        assert not th_a.is_alive(), "drained host kept serving"
        ctl_b.restore(snap)
        assert pump_until_audio(port_b) is not None, (
            "host B never decoded the migrated streams")
        final_stats = ctl_b.stats()
        assert final_stats["active"] == 2  # A's slot table came across
    finally:
        tx.close()
        for stop, th in ((stop_a, th_a), (stop_b, th_b)):
            if stop is not None:
                stop.set()
        for _, th in ((stop_a, th_a), (stop_b, th_b)):
            if th is not None:
                th.join(timeout=120)
                assert not th.is_alive()
        echo_rx.close()
        ctl_a.close()
        if ctl_b is not None:
            ctl_b.close()


def test_periodic_snapshot_is_restorable(model_path, tmp_path):
    """serve_main --snapshot: the loop writes atomic periodic snapshots
    (the crash-failover source) that a standby of the same capacity can
    resume from even after the writer is gone."""
    from lyra_tpu.tools import serve_main
    from lyra_tpu.tools.stream_server import DecoderServer

    snap = str(tmp_path / "auto")
    ready = threading.Event()
    stop = threading.Event()
    th = threading.Thread(target=serve_main.main, kwargs=dict(
        argv=["--capacity", "2", "--seconds", "0", "--max_bitrate", "3200",
              "--model_path", model_path, "--report_every", "30",
              "--snapshot", snap, "--snapshot_every", "0.2"],
        _on_ready=lambda port: ready.set(), _stop=stop))
    th.start()
    try:
        assert ready.wait(120)
        deadline = time.time() + 120  # first tick compiles the program
        while not os.path.exists(snap + ".npz") and time.time() < deadline:
            time.sleep(0.1)
        assert os.path.exists(snap + ".npz"), "no periodic snapshot"
    finally:
        stop.set()
        th.join(timeout=120)
        assert not th.is_alive()

    # No .tmp leftovers once the loop is done: writes are tmp+rename,
    # never in place (a crash mid-save must leave the previous snapshot).
    leftovers = [f for f in os.listdir(tmp_path) if ".tmp" in f]
    assert not leftovers, leftovers

    dec = DecoderServer(2, model_path=model_path)
    dec.restore(snap)  # "the failover": a fresh host resumes the state
    assert dec.num_active == 2


def test_restore_flag_resumes_snapshot(model_path, tmp_path):
    """serve_main --restore: a cold host stands up directly from a
    drained snapshot instead of admitting fresh streams (cold-standby
    resume; capacity mismatch is refused by the server's restore)."""
    from lyra_tpu.tools import serve_main
    from lyra_tpu.tools.stream_server import DecoderServer

    dec = DecoderServer(2, model_path=model_path)
    dec.add_streams(["x"])  # one seat occupied, one free
    snap = str(tmp_path / "snap")
    dec.save(snap)

    ready = threading.Event()
    stop = threading.Event()
    ctl_port = _free_udp_port()
    th = threading.Thread(target=serve_main.main, kwargs=dict(
        argv=["--capacity", "2", "--seconds", "0",
              "--max_bitrate", "3200", "--model_path", model_path,
              "--report_every", "30", "--control", str(ctl_port),
              "--restore", snap],
        _on_ready=lambda port: ready.set(), _stop=stop))
    th.start()
    ctl = HostControl(("127.0.0.1", ctl_port))
    try:
        assert ready.wait(120)
        st = ctl.wait_ready(120)
        assert st["mode"] == "decode"
        # The snapshot's slot table came through: 1 active stream, not
        # the 2 a fresh host would have admitted.
        assert ctl.stats()["active"] == 1
        # Decode hosts follow each packet's wire size; set_bitrate is an
        # encoder-side verb and must be refused loudly, not ignored.
        with pytest.raises(ControlError, match="encoder side"):
            ctl.set_bitrate(0, 6000)
    finally:
        stop.set()
        th.join(timeout=120)
        assert not th.is_alive()
        ctl.close()

    with pytest.raises(ValueError):
        DecoderServer(4, model_path=model_path).restore(snap)

def test_set_bitrate_mid_call(model_path):
    """The congestion-controller knob end to end: an encode host changes
    one stream's downlink bitrate mid-call over the control plane
    (reference: lyra/lyra_encoder.cc:158-166 set_bitrate) — the relayed
    packets shrink from 9.2 kbps (23 B) to 3.2 kbps (8 B) while the other
    slot keeps its rate; bad rates and bad slots are refused loudly."""
    from lyra_tpu import config
    from lyra_tpu.tools import serve_main

    echo_rx = socket.socket(socket.AF_INET, socket.SOCK_DGRAM)
    echo_rx.bind(("127.0.0.1", 0))
    echo_rx.settimeout(0.05)
    echo_port = echo_rx.getsockname()[1]

    ready = threading.Event()
    stop = threading.Event()
    box = {}
    ctl_port = _free_udp_port()
    th = threading.Thread(target=serve_main.main, kwargs=dict(
        argv=["--mode", "encode", "--capacity", "2", "--seconds", "0",
              "--bitrate", "9200", "--max_bitrate", "9200",
              "--model_path", model_path, "--report_every", "30",
              "--ingest", "python", "--echo", f"127.0.0.1:{echo_port}",
              "--control", str(ctl_port)],
        _on_ready=lambda port: (box.update(port=port), ready.set()),
        _stop=stop))
    th.start()
    ctl = HostControl(("127.0.0.1", ctl_port))
    tx = socket.socket(socket.AF_INET, socket.SOCK_DGRAM)
    try:
        assert ready.wait(120), "encode host never bound its port"
        t = np.arange(320) / 16000.0
        hop = (8000 * np.sin(2 * np.pi * 440 * t)).astype(np.int16)
        seq = 0

        def pump_until_size(want, deadline_s=180):
            """Drive PCM into both slots until slot 0 relays a packet of
            `want` bytes; returns the sizes seen for slot 1 meanwhile."""
            nonlocal seq
            other = set()
            t_end = time.time() + deadline_s
            while time.time() < t_end:
                for slot in (0, 1):
                    tx.sendto(slot.to_bytes(2, "big")
                              + seq.to_bytes(4, "big") + hop.tobytes(),
                              ("127.0.0.1", box["port"]))
                seq += 1
                try:
                    got = echo_rx.recvfrom(4096)[0]
                except socket.timeout:
                    continue
                slot = int.from_bytes(got[:2], "big")
                if slot == 1:
                    other.add(len(got) - 6)
                elif len(got) - 6 == want:
                    return other
            raise AssertionError(f"slot 0 never relayed a {want}-byte packet")

        wide = config.packet_size(184)   # 9.2 kbps
        narrow = config.packet_size(64)  # 3.2 kbps
        pump_until_size(wide)  # first tick compiles; both slots at 9.2

        assert ctl.set_bitrate(0, 3200)["ok"]
        other = pump_until_size(narrow)
        assert other == {wide}, f"slot 1 should stay at 9.2 kbps: {other}"

        # Refusals: unsupported rate, slot out of range — the host keeps
        # serving (the next stats call still answers).
        with pytest.raises(ControlError):
            ctl.set_bitrate(0, 1234)
        with pytest.raises(ControlError):
            ctl.set_bitrate(7, 3200)
        assert ctl.stats()["mode"] == "encode"
    finally:
        tx.close()
        stop.set()
        th.join(timeout=120)
        assert not th.is_alive()
        ctl.close()
        echo_rx.close()

def test_router_room_directed_admission_and_rehoming():
    """Bridge fleets: a room's members co-locate in one slot block on one
    host (the mixer's geometry, room = slot // room_size in serve_main);
    full rooms and roomless-vs-bridge mixing are loud refusals; room
    blocks are freed on last-member release and re-homed by whole-host
    moves."""
    r = FleetRouter()
    r.add_host("b1", ("127.0.0.1", 1), _FakeControl(), 4, room_size=2)
    r.add_host("b2", ("127.0.0.1", 2), _FakeControl(), 4, room_size=2)

    n1, _, s1 = r.admit("alice", room="R1")
    n2, _, s2 = r.admit("bob", room="R1")
    assert n1 == n2 and {s1, s2} == {0, 1}  # same host, one block
    with pytest.raises(RuntimeError, match="full"):
        r.admit("carol", room="R1")  # a third seat in a 2-room

    # A new room opens on the least-loaded bridge host.
    n3, _, s3 = r.admit("carol", room="R2")
    assert n3 != n1 and s3 == 0

    # Roomless admission never fragments a bridge host's blocks...
    with pytest.raises(RuntimeError, match="capacity"):
        r.admit("dave")
    # ...and room admission needs a bridge host.
    plain = _router(("a", 2, False))
    with pytest.raises(RuntimeError, match="bridge"):
        plain.admit("x", room="R")

    # Last member out frees the block for a new room.
    r.release("carol")
    n4, _, s4 = r.admit("dan", room="R3")
    assert (n4, s4) == (n3, 0)

    # A whole-host move carries the room: later members land on the
    # destination's same block.
    r.add_host("b3", ("127.0.0.1", 3), _FakeControl(), 4, standby=True,
               room_size=2)
    assert r.migrate(n4, "b3", "/tmp/snap") == 1
    assert r.locate("dan")[0] == "b3"
    n5, _, s5 = r.admit("erin", room="R3")
    assert (n5, s5) == ("b3", 1)

    # Geometry is part of the positional contract.
    r.add_host("plain", ("127.0.0.1", 4), _FakeControl(), 4, standby=True)
    with pytest.raises(RuntimeError, match="geometry"):
        r.migrate("b1", "plain", "/tmp/snap")
    with pytest.raises(ValueError, match="tile"):
        r.add_host("ragged", ("127.0.0.1", 5), _FakeControl(), 5,
                   room_size=2)


def test_room_admission_refuses_mid_handoff_home():
    """An existing room whose home host has a handoff in flight refuses
    new members (like every other admission path on a busy host): seating
    one would mutate the slot table mid-handoff and aim the caller at a
    data address being drained.  After commit the room is re-homed and
    the retried admit lands on the destination's same block."""
    r = FleetRouter()
    r.add_host("b1", ("127.0.0.1", 1), _FakeControl(), 4, room_size=2)
    r.add_host("b2", ("127.0.0.1", 2), _FakeControl(), 4, standby=True,
               room_size=2)
    r.admit("alice", room="R1")
    r.begin_handoff("b1", "b2")
    with pytest.raises(RuntimeError, match="in flight"):
        r.admit("bob", room="R1")
    r.commit_handoff("b1", "b2", deregister_src=False)
    n, _, s = r.admit("bob", room="R1")  # retry lands on the new home
    assert (n, s) == ("b2", 1)


# -- routing journal / controller crash recovery (VERDICT r4 item 1) ------

def _journaled_router(tmp_path, **hosts_kw):
    from lyra_tpu.tools.fleet import FleetJournal

    jpath = os.path.join(str(tmp_path), "journal.jsonl")
    r = FleetRouter(FleetJournal(jpath, **hosts_kw))
    return r, jpath


def _replayed(jpath):
    """Replay with fake controls (recording the addr they were built for)."""
    made = {}

    def factory(addr):
        ctl = _FakeControl(addr=addr)
        made[addr] = ctl
        return ctl

    r2, open_hosts = FleetRouter.replay(jpath, control_factory=factory)
    return r2, open_hosts, made


def test_journal_replay_rebuilds_routing(tmp_path):
    """A restarted controller must answer locate for every pre-existing
    seat: admissions, releases, host-set changes, and a committed
    failover all survive the journal round trip, including control
    addresses (the rebuilt router must be able to reach every host)."""
    r, jpath = _journaled_router(tmp_path)
    r.add_host("a", ("10.0.0.1", 5620), _FakeControl(addr=("10.0.0.1", 5630)), 4)
    r.add_host("b", ("10.0.0.2", 5620), _FakeControl(addr=("10.0.0.2", 5630)), 4)
    r.add_host("spare", ("10.0.0.3", 5620),
               _FakeControl(addr=("10.0.0.3", 5630)), 4, standby=True)
    seats = {sid: r.admit(sid) for sid in ("s0", "s1", "s2", "s3")}
    r.release("s1")
    # Crash-failover of host a onto the standby (commit journaled).
    r._hosts["a"].control.dead = True
    r.failover("a", "spare", "/tmp/snaps/a")

    r2, open_hosts, made = _replayed(jpath)
    assert open_hosts == []
    assert r2.hosts().keys() == r.hosts().keys()
    for name, info in r.hosts().items():
        assert r2.hosts()[name] == info
    for sid in ("s0", "s2", "s3"):
        assert r2.locate(sid) == r.locate(sid)
    with pytest.raises(KeyError):
        r2.locate("s1")  # released before the crash
    # Control clients rebuilt at the journaled addresses.
    assert ("10.0.0.2", 5630) in made and ("10.0.0.3", 5630) in made
    # The rebuilt router keeps routing: new admissions land on free seats.
    name, _, slot = r2.admit("s4")
    assert (name, slot) == r.admit("s4")[0::2]


def test_journal_compaction_preserves_state(tmp_path):
    """Past the compaction threshold the journal is rewritten as one
    full-state record (atomic tmp+rename), and replay of the compacted
    file reproduces the same routing tables — the file stays O(fleet),
    not O(call history)."""
    from lyra_tpu.tools.fleet import FleetJournal

    jpath = os.path.join(str(tmp_path), "journal.jsonl")
    r = FleetRouter(FleetJournal(jpath, compact_every=50))
    r.add_host("a", ("10.0.0.1", 5620), _FakeControl(addr=("10.0.0.1", 5630)), 8)
    for i in range(200):  # far past compact_every: several compactions
        r.admit(f"s{i}")
        r.release(f"s{i}")
    r.admit("live")
    with open(jpath) as f:
        lines = [json.loads(line) for line in f]
    assert len(lines) < 55  # compacted, not 400+ records
    assert lines[0]["op"] == "state"

    r2, open_hosts, _ = _replayed(jpath)
    assert open_hosts == []
    assert r2.locate("live") == r.locate("live")
    assert r2.hosts() == r.hosts()


def test_journal_replay_recovers_open_handoff(tmp_path):
    """A controller that dies mid-handoff (begin journaled, no commit)
    must not leave the rebuilt fleet wedged: replay clears the busy
    reservations, reports the involved hosts for re-judging, and the
    seats still locate to the source (the watchdog decides next)."""
    r, jpath = _journaled_router(tmp_path)
    r.add_host("a", ("10.0.0.1", 5620), _FakeControl(addr=("10.0.0.1", 5630)), 2)
    r.add_host("b", ("10.0.0.2", 5620),
               _FakeControl(addr=("10.0.0.2", 5630)), 2, standby=True)
    r.admit("caller")
    r.begin_handoff("a", "b")  # ...controller dies here

    r2, open_hosts, _ = _replayed(jpath)
    assert sorted(open_hosts) == ["a", "b"]
    assert not any(h["busy"] for h in r2.hosts().values())
    assert r2.locate("caller")[0] == "a"
    assert r2.hosts()["b"]["standby"] is True
    # Admission works immediately (not blocked on the dead handoff)...
    assert r2.admit("caller2")[0] == "a"
    # ...and a fresh failover of the same pair succeeds.
    r2._hosts["a"].control.dead = True
    assert r2.failover("a", "b", "/tmp/snaps/a") == 2
    assert r2.locate("caller")[0] == "b"


def test_journal_replay_preserves_rooms(tmp_path):
    """Bridge fleets: room homes and the members' room membership are
    positional routing state too — a restarted controller must keep
    seating late room members next to their roommates."""
    r, jpath = _journaled_router(tmp_path)
    r.add_host("b1", ("10.0.0.1", 5620),
               _FakeControl(addr=("10.0.0.1", 5630)), 4, room_size=2)
    r.add_host("b2", ("10.0.0.2", 5620),
               _FakeControl(addr=("10.0.0.2", 5630)), 4, room_size=2)
    r.admit("x", room="R1")
    r.admit("y", room="R2")
    r.admit("z", room="R2")

    r2, _, _ = _replayed(jpath)
    assert r2.hosts()["b1"]["room_size"] == 2
    # Late member of R1 lands in R1's block on the same host.
    namex, _, slotx = r2.locate("x")
    name2, _, slot2 = r2.admit("w", room="R1")
    assert name2 == namex and slot2 // 2 == slotx // 2
    with pytest.raises(RuntimeError, match="full"):
        r2.admit("overflow", room="R2")
    # Releasing the last member frees the room block (room_of survived).
    r2.release("y")
    r2.release("z")
    assert r2.admit("fresh", room="R3")[0] in ("b1", "b2")


def test_alive_treats_auth_refusal_as_alive():
    """A keyed host refusing this controller's unsigned ping ANSWERED —
    it is alive.  alive() must return True (not raise ControlError into
    the watchdog thread, and not read 'dead': failing over a live host
    would fork its calls); the misconfiguration surfaces in the host's
    own auth_rejects counter."""
    srv = socket.socket(socket.AF_INET, socket.SOCK_DGRAM)
    srv.bind(("127.0.0.1", 0))

    def answer():
        data, addr = srv.recvfrom(64 * 1024)
        req = json.loads(data.decode())["req"]
        srv.sendto(json.dumps({"req": req, "ok": False,
                               "error": "auth: missing mac"}).encode(),
                   addr)

    th = threading.Thread(target=answer)
    th.start()
    r = FleetRouter()
    r.add_host("keyed", ("127.0.0.1", 1),
               HostControl(srv.getsockname(), timeout=5.0, retries=1), 2)
    try:
        assert r.alive("keyed") is True
    finally:
        th.join(timeout=10)
        r.close()
        srv.close()


def test_journal_tolerates_torn_tail(tmp_path):
    """The crash class the journal exists for tears its own final line
    (power loss / kill mid-append): replay must skip a torn FINAL line,
    reopening for append must truncate it (or the next record would be
    corrupted too), and a torn line anywhere ELSE stays a loud refusal."""
    from lyra_tpu.tools.fleet import FleetJournal

    jpath = os.path.join(str(tmp_path), "journal.jsonl")
    r = FleetRouter(FleetJournal(jpath))
    r.add_host("a", ("10.0.0.1", 5620),
               _FakeControl(addr=("10.0.0.1", 5630)), 4)
    r.admit("s0")
    r.admit("s1")
    with open(jpath, "a") as f:
        f.write('{"op": "admit", "stream": "s2", "hos')  # torn mid-write

    r2, open_hosts, _ = _replayed(jpath)
    assert r2.locate("s0") == r.locate("s0")
    assert r2.locate("s1") == r.locate("s1")
    with pytest.raises(KeyError):
        r2.locate("s2")  # the torn record is the lost OS-buffer tail

    # Reopening the journal repairs the tail, so appends stay parseable.
    j2 = FleetJournal(jpath)
    r3 = FleetRouter(j2)
    # Rebuild-by-replay then continue journaling through the SAME file:
    # the next record must start on a fresh line.
    r3.add_host("b", ("10.0.0.2", 5620),
                _FakeControl(addr=("10.0.0.2", 5630)), 4)
    lines = [json.loads(line) for line in open(jpath)]  # all parse again
    assert lines[-1]["op"] == "add_host" and lines[-1]["name"] == "b"

    # Corruption NOT at the tail is refused loudly.
    with open(jpath) as f:
        good = f.readlines()
    with open(jpath, "w") as f:
        f.write(good[0])
        f.write("GARBAGE NOT JSON\n")
        f.writelines(good[1:])
    with pytest.raises(ValueError, match="corrupt"):
        FleetRouter.replay(jpath,
                           control_factory=lambda a: _FakeControl(addr=a))


def test_journal_replay_preserves_seat_tokens(tmp_path):
    """Seat capability tokens are routing state: a restarted controller
    must keep refusing a guessed-id release exactly as the first life
    did, and honor the owner's token."""
    r, jpath = _journaled_router(tmp_path)
    r.add_host("a", ("10.0.0.1", 5620),
               _FakeControl(addr=("10.0.0.1", 5630)), 4)
    r.admit("guarded", token="tok-1")
    r.admit("open")
    r.admit("churn", token="tok-2")
    r.release("churn", token="tok-2")  # token-checked release journals fine

    r2, _, _ = _replayed(jpath)
    with pytest.raises(PermissionError):
        r2.locate("guarded")
    with pytest.raises(PermissionError):
        r2.release("guarded", token="wrong")
    assert r2.locate("guarded", token="tok-1") == r.locate(
        "guarded", token="tok-1")
    r2.release("guarded", token="tok-1")
    r2.locate("open")  # legacy token-less seat stays open
    # Compaction carries the token table too.
    r._journal.compact(r._state_record())
    r3, _, _ = _replayed(jpath)
    with pytest.raises(PermissionError):
        r3.locate("guarded")


def test_slot_allocation_survives_handoff_round_trip():
    """A maintenance round-trip (migrate A->B, churn on B, migrate back
    into the parked A) bulk-moves slot tables OUTSIDE the allocator;
    admissions on the re-activated host must hand out the real free
    slots, never out-of-range ones (wire slots are positional seat
    identities on a fixed-capacity serve_main host) and never a
    premature 'fleet at capacity'."""
    r = _router(("a", 4, False), ("b", 4, True))
    for i in range(4):
        r.admit(f"s{i}")
    r.migrate("a", "b", "/tmp/snap")  # A parked empty, B carries 4
    r.release("s0")
    r.release("s1")
    r.migrate("b", "a", "/tmp/snap2")  # back into the parked ex-source
    # A is active with slots {2, 3} occupied: the two fresh admissions
    # must land on the REAL free slots 0 and 1.
    assert r.admit("n0") == ("a", ("127.0.0.1", 1000), 0)
    assert r.admit("n1") == ("a", ("127.0.0.1", 1000), 1)
    with pytest.raises(RuntimeError, match="capacity"):
        r.admit("overflow")
    # And the allocator keeps cycling through churn afterward.
    r.release("n0")
    assert r.admit("n2")[2] == 0
