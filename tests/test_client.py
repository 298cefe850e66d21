"""FleetCaller (lyra_tpu/client.py): the caller-side API — admission
with a seat capability, wire framing, downlink parsing, re-resolution
after a host move, and release.

The reference's caller is its Android app loop (reference:
lyra/android_example/MainActivity.java:203-262); this is the
framework-native replacement the examples hand-rolled."""

import json
import os
import socket
import threading
import time

import numpy as np
import pytest

from lyra_tpu import config
from lyra_tpu.client import FleetCaller, SeatError
from lyra_tpu.tools.fleet import FleetRouter
from lyra_tpu.tools.fleet_main import _AdmissionService, _Watchdog


class _FakeControl:
    addr = ("127.0.0.1", 1001)

    def __init__(self):
        self.calls = []

    def request(self, cmd, _timeout=None, _retries=None, **fields):
        self.calls.append((cmd, fields))
        return {"ok": True}

    def drain(self, path):
        return {"ok": True}

    def restore(self, path):
        return {"ok": True}

    def close(self):
        pass


def _service(*hosts):
    r = FleetRouter()
    for name, cap, standby in hosts:
        r.add_host(name, ("127.0.0.1", 40000 + len(r.hosts())),
                   _FakeControl(), cap, standby=standby)
    svc = _AdmissionService(r, _Watchdog(r, None, log=lambda *_: None),
                            0, "127.0.0.1")
    stop = threading.Event()

    def pump():
        while not stop.is_set():
            svc.poll(None)
            time.sleep(0.002)

    th = threading.Thread(target=pump)
    th.start()
    return r, svc, stop, th


def test_fleet_caller_admission_token_and_release():
    r, svc, stop, th = _service(("a", 2, False))
    try:
        with FleetCaller(("127.0.0.1", svc.port), "call-1") as caller:
            assert caller.host == "a" and caller.slot == 0
            assert len(caller.token) == 32  # auto-generated capability
            # The capability guards the seat: a peer who guesses the
            # stream id gets refused on admit/locate/release.
            with pytest.raises(SeatError, match="token"):
                FleetCaller(("127.0.0.1", svc.port), "call-1",
                            token="guess")
            # The owner's re-admission (UDP-retry semantics) is the seat.
            dup = FleetCaller(("127.0.0.1", svc.port), "call-1",
                              token=caller.token)
            assert dup.slot == 0
            dup.close()  # close() without release: the seat stays
            assert r.locate("call-1", token=caller.token)[2] == 0
            caller.release()
            with pytest.raises(SeatError, match="released"):
                caller.send_packet(b"x")
            caller.release()  # idempotent
        assert "call-1" not in r._streams
        # Context-manager exit released cleanly; a fresh caller reuses 0.
        with FleetCaller(("127.0.0.1", svc.port), "call-2") as c2:
            assert c2.slot == 0
    finally:
        stop.set()
        th.join(timeout=10)
        svc.close()
        r.close()


def test_fleet_caller_relocate_after_migration():
    """A host move changes the data address, never the slot; relocate()
    re-aims and resets the silence counter."""
    r, svc, stop, th = _service(("a", 2, False), ("b", 2, True))
    try:
        caller = FleetCaller(("127.0.0.1", svc.port), "mover")
        addr_a, slot = caller.data_addr, caller.slot
        assert caller.recv() == [] and caller.silent_ticks == 1
        r.migrate("a", "b", "/tmp/snap")
        assert caller.relocate() is True
        assert caller.host == "b" and caller.slot == slot
        assert caller.data_addr != addr_a
        assert caller.silent_ticks == 0
        assert caller.relocate() is False  # stable seat: no move
        caller.release()
        caller.close()
    finally:
        stop.set()
        th.join(timeout=10)
        svc.close()
        r.close()


def test_fleet_caller_send_framing_and_recv_filtering():
    """Uplink datagrams carry the 6-byte header over the seat's slot and
    a per-send sequence; recv() parses downlink, drops foreign slots and
    runts, and tracks downlink silence."""
    r, svc, stop, th = _service(("a", 4, False))
    rx = socket.socket(socket.AF_INET, socket.SOCK_DGRAM)
    rx.bind(("127.0.0.1", 0))
    rx.settimeout(5.0)
    try:
        # Point the fleet's host at our receiving socket.
        r._hosts["a"].data_addr = rx.getsockname()
        caller = FleetCaller(("127.0.0.1", svc.port), "framed")
        assert caller.send_packet(b"\xAA" * 8) == 0
        assert caller.send_pcm(np.arange(320, dtype=np.int16)) == 1
        d0, _ = rx.recvfrom(65536)
        d1, src = rx.recvfrom(65536)
        assert d0[:2] == caller.slot.to_bytes(2, "big")
        assert int.from_bytes(d0[2:6], "big") == 0 and d0[6:] == b"\xAA" * 8
        assert int.from_bytes(d1[2:6], "big") == 1 and len(d1) == 6 + 640

        # Downlink back to the caller's source address (--echo reply
        # shape): our slot is parsed, a foreign slot and a runt are not.
        mine = (caller.slot.to_bytes(2, "big") + (7).to_bytes(4, "big")
                + b"pcm")
        foreign = ((caller.slot + 1).to_bytes(2, "big")
                   + (7).to_bytes(4, "big") + b"zzz")
        # An off-path sender (or a stale pre-migration host) spoofing the
        # caller's OWN slot from a different source must be dropped: the
        # slot survives handoffs, so source address is the discriminator.
        spoof_sock = socket.socket(socket.AF_INET, socket.SOCK_DGRAM)
        spoof = (caller.slot.to_bytes(2, "big") + (9).to_bytes(4, "big")
                 + b"inject")
        spoof_sock.sendto(spoof, src)
        spoof_sock.close()
        for payload in (foreign, b"\x00", mine):
            rx.sendto(payload, src)
        deadline = time.time() + 5
        got = []
        while not got and time.time() < deadline:
            got = caller.recv()
        assert got == [(7, b"pcm")]
        assert caller.silent_ticks == 0
        caller.release()
        caller.close()
    finally:
        stop.set()
        th.join(timeout=10)
        rx.close()
        svc.close()
        r.close()


def test_fleet_caller_canonicalizes_hostname_seat_addresses():
    """A --host spec written with a hostname must not kill downlink: the
    source filter compares against recvfrom()'s NUMERIC source, so the
    client resolves the seat address once at seat time.  An unresolvable
    name is a loud SeatError, never a silently dead-air call."""
    r, svc, stop, th = _service(("a", 2, False))
    rx = socket.socket(socket.AF_INET, socket.SOCK_DGRAM)
    rx.bind(("127.0.0.1", 0))
    rx.settimeout(5.0)
    try:
        # The operator wrote a hostname in the host spec.
        r._hosts["a"].data_addr = ("localhost", rx.getsockname()[1])
        caller = FleetCaller(("127.0.0.1", svc.port), "named")
        assert caller.data_addr == rx.getsockname()  # numeric form
        caller.send_packet(b"\xBB" * 8)
        _, src = rx.recvfrom(65536)
        rx.sendto(caller.slot.to_bytes(2, "big")
                  + (3).to_bytes(4, "big") + b"pcm", src)
        deadline = time.time() + 5
        got = []
        while not got and time.time() < deadline:
            got = caller.recv()
        assert got == [(3, b"pcm")]  # accepted despite the hostname spec
        caller.release()
        caller.close()

        r._hosts["a"].data_addr = ("no-such-host.invalid", 1)
        with pytest.raises(SeatError, match="resolve"):
            FleetCaller(("127.0.0.1", svc.port), "unresolvable")
    finally:
        stop.set()
        th.join(timeout=10)
        rx.close()
        svc.close()
        r.close()


@pytest.mark.full
def test_fleet_caller_end_to_end_with_live_migration(model_path, tmp_path):
    """The full caller lifecycle against REAL processes: a serve_main
    decode host with --echo reply behind a fleet_main controller —
    FleetCaller admits, uplinks encoded packets on the 20 ms grid,
    receives its own decoded PCM downlink on the same socket, survives a
    live drain-migration to a warm standby via downlink-silence-triggered
    relocate(), and releases."""
    from lyra_tpu import packet as pkt
    from lyra_tpu.tools import serve_main
    from lyra_tpu.tools.fleet_main import main as fleet_main

    def free_port():
        s = socket.socket(socket.AF_INET, socket.SOCK_DGRAM)
        s.bind(("127.0.0.1", 0))
        port = s.getsockname()[1]
        s.close()
        return port

    snap_dir = str(tmp_path)

    def start_host(name):
        ctl_port = free_port()
        box = {}
        ready = threading.Event()
        stop = threading.Event()
        th = threading.Thread(target=serve_main.main, kwargs=dict(
            argv=["--capacity", "2", "--seconds", "0",
                  "--max_bitrate", "3200", "--model_path", model_path,
                  "--playout_delay", "1", "--report_every", "30",
                  "--echo", "reply", "--control", str(ctl_port)],
            _on_ready=lambda port: (box.update(port=port), ready.set()),
            _stop=stop))
        th.start()
        assert ready.wait(120), f"host {name} never bound"
        return th, stop, box["port"], ctl_port

    th_a, stop_a, port_a, ctl_a = start_host("a")
    th_b, stop_b, port_b, ctl_b = start_host("b")

    fleet_port = free_port()
    fleet_ready = threading.Event()
    fleet_stop = threading.Event()
    th_f = threading.Thread(target=fleet_main, kwargs=dict(
        argv=["--host", f"a=127.0.0.1:{port_a}:{ctl_a}:2",
              "--standby", f"b=127.0.0.1:{port_b}:{ctl_b}:2",
              "--snapshot_dir", snap_dir, "--wait_ready",
              "--port", str(fleet_port), "--watch_every", "0",
              "--report_every", "60", "--seconds", "0"],
        _on_ready=lambda port: fleet_ready.set(), _stop=fleet_stop))
    th_f.start()
    caller = None
    try:
        assert fleet_ready.wait(240)
        caller = FleetCaller(("127.0.0.1", fleet_port), "e2e-caller")
        assert caller.host == "a"
        wire = pkt.pack_indices_batch(np.zeros((1, 16), np.int32), 64)
        payload = wire[0].tobytes()

        def stream_until_pcm(deadline_s):
            deadline = time.time() + deadline_s
            while time.time() < deadline:
                caller.send_packet(payload)
                time.sleep(0.02)
                pcm = caller.recv()
                if pcm:
                    return pcm
            return []

        pcm = stream_until_pcm(180)
        assert pcm, "no downlink PCM within the deadline"
        assert len(pcm[0][1]) == config.num_samples_per_hop(16000) * 2

        # Live maintenance migration A -> B (keyless loopback fleet: the
        # migrate verb needs no MAC here).  The caller keeps streaming at
        # the old address and re-resolves on downlink silence — the
        # production client loop.
        from tests.test_fleet_main import _FleetClient

        op = _FleetClient(("127.0.0.1", fleet_port))
        assert op.request("migrate", src="a", dst="b")["ok"]
        op.close()
        moved_deadline = time.time() + 120
        relocated = False
        while time.time() < moved_deadline:
            caller.send_packet(payload)
            time.sleep(0.02)
            caller.recv()
            if caller.silent_ticks >= 5 and caller.relocate():
                relocated = True
                break
        assert relocated, "caller never re-resolved after the migration"
        assert caller.host == "b"
        pcm = stream_until_pcm(120)
        assert pcm, "no downlink PCM from the standby after relocate"
        caller.release()
    finally:
        if caller is not None:
            caller.close()
        fleet_stop.set()
        stop_a.set()
        stop_b.set()
        for th in (th_f, th_a, th_b):
            th.join(timeout=120)
            assert not th.is_alive()


def test_fleet_caller_red_uplink_framing():
    """red=D clients honor the fleet's RED wire contract: each uplink
    datagram carries the packet from D sends earlier (empty at stream
    start), parseable by the host's packet.parse_red."""
    from lyra_tpu import packet as pkt

    r, svc, stop, th = _service(("a", 4, False))
    rx = socket.socket(socket.AF_INET, socket.SOCK_DGRAM)
    rx.bind(("127.0.0.1", 0))
    rx.settimeout(5.0)
    try:
        r._hosts["a"].data_addr = rx.getsockname()
        with pytest.raises(ValueError, match="red"):
            FleetCaller(("127.0.0.1", svc.port), "bad", red=9)
        caller = FleetCaller(("127.0.0.1", svc.port), "red-caller", red=2)
        sent = [bytes([i]) * 8 for i in range(4)]
        for p in sent:
            caller.send_packet(p)
        got = [rx.recvfrom(65536)[0] for _ in range(4)]
        for t, dgram in enumerate(got):
            assert int.from_bytes(dgram[2:6], "big") == t
            cur, prev = pkt.parse_red(dgram[6:])
            assert cur == sent[t]
            assert prev == (sent[t - 2] if t >= 2 else b"")
        caller.release()
        caller.close()
    finally:
        stop.set()
        th.join(timeout=10)
        rx.close()
        svc.close()
        r.close()
