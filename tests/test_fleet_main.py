"""Fleet controller (tools/fleet_main.py) tests: spec parsing, loud flag
refusals, and the full admission + automatic-failover story in-process —
two real serve_main hosts, the controller's UDP admission endpoint, a
SIGKILL-equivalent host death, and the watchdog moving the caller's seat
to the standby from the periodic snapshot.

The reference has no serving or fleet tier (SURVEY §5: no process-level
fault tolerance; its concealment machinery, lyra/lyra_decoder.cc:228-315,
is what makes these handoffs survivable for the caller)."""

import itertools
import json
import os
import socket
import threading
import time

import numpy as np
import pytest

from lyra_tpu import config
from lyra_tpu.tools.fleet_main import _parse_host, main as fleet_main


def _free_udp_port() -> int:
    s = socket.socket(socket.AF_INET, socket.SOCK_DGRAM)
    s.bind(("127.0.0.1", 0))
    port = s.getsockname()[1]
    s.close()
    return port


class _FleetClient:
    """Minimal caller-side client for the admission endpoint (same
    req-token envelope as HostControl).  `key` signs every request (for
    keyed fleets' admin verbs; caller verbs ignore the extra fields)."""

    _req = itertools.count(1)

    def __init__(self, addr, key=None):
        self._key = key
        self._addr = addr
        self._sock = socket.socket(socket.AF_INET, socket.SOCK_DGRAM)
        self._sock.connect(addr)
        self._sock.settimeout(2.0)

    def request(self, cmd, **fields):
        req = f"t{next(self._req)}"
        body = {"cmd": cmd, "req": req, **fields}
        if self._key is not None:
            from lyra_tpu.tools.control_auth import sign

            body["aud"] = f"{self._addr[0]}:{self._addr[1]}"
            body = sign(body, self._key)
        for _ in range(5):
            self._sock.send(json.dumps(body).encode())
            try:
                while True:
                    reply = json.loads(self._sock.recv(64 * 1024).decode())
                    if reply.get("req") == req:
                        return reply
            except socket.timeout:
                continue
        raise socket.timeout(f"no reply to {cmd!r}")

    def close(self):
        self._sock.close()


def test_parse_host_specs():
    assert _parse_host("a=10.0.0.1:5620:5630") == (
        "a", "10.0.0.1", 5620, 5630, None)
    assert _parse_host("b=127.0.0.1:1:2:4096") == (
        "b", "127.0.0.1", 1, 2, 4096)
    import argparse

    for bad in ("a", "a=1.2.3.4:5", "=1.2.3.4:5:6", "a=1.2.3.4:5:6:7:8",
                # names become snapshot filenames and add_host is
                # reachable from the admission socket: path separators
                # and dot-leading names are refused (traversal)
                "../evil=1.2.3.4:5:6", "a/b=1.2.3.4:5:6",
                ".hidden=1.2.3.4:5:6"):
        with pytest.raises(argparse.ArgumentTypeError):
            _parse_host(bad)


def test_fleet_main_flag_refusals():
    """Misconfiguration fails loudly at parse time (repo convention)."""
    for argv in (
        [],  # no hosts at all
        ["--host", "a=127.0.0.1:1:2"],  # no capacity anywhere
        ["--host", "a=127.0.0.1:1:2:4", "--watch_every", "-1"],
        # duplicate names would shadow each other's snapshots/routes
        ["--host", "a=127.0.0.1:1:2:4", "--standby", "a=127.0.0.2:1:2:4"],
    ):
        with pytest.raises(SystemExit):
            fleet_main(argv=argv)


def test_fleet_admission_and_auto_failover(model_path, tmp_path):
    """End to end in one process: admit a caller through the controller,
    kill the active host, and the watchdog fails its seat over to the
    standby from the periodic snapshot — locate() then points the caller
    at the standby's data address and its packets decode there."""
    from lyra_tpu import packet as pkt
    from lyra_tpu.tools import serve_main

    snap_dir = str(tmp_path)
    echo_rx = socket.socket(socket.AF_INET, socket.SOCK_DGRAM)
    echo_rx.bind(("127.0.0.1", 0))
    echo_rx.settimeout(0.05)
    echo_port = echo_rx.getsockname()[1]

    def start_host(name, extra):
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
        assert ready.wait(120), f"host {name} never bound its port"
        return th, stop, box["port"], ctl_port

    th_a, stop_a, port_a, ctl_a = start_host(
        "a", ["--snapshot", os.path.join(snap_dir, "a"),
              "--snapshot_every", "0.3"])
    th_b, stop_b, port_b, ctl_b = start_host("spare", [])

    fleet_box = {}
    fleet_ready = threading.Event()
    fleet_stop = threading.Event()
    th_f = threading.Thread(target=fleet_main, kwargs=dict(
        argv=["--host", f"a=127.0.0.1:{port_a}:{ctl_a}:2",
              "--standby", f"spare=127.0.0.1:{port_b}:{ctl_b}:2",
              "--snapshot_dir", snap_dir, "--watch_every", "0.3",
              "--wait_ready", "--report_every", "60", "--seconds", "0",
              "--stats", os.path.join(snap_dir, "fleet_stats.jsonl")],
        _on_ready=lambda port: (fleet_box.update(port=port),
                                fleet_ready.set()),
        _stop=fleet_stop))
    th_f.start()
    cli = None
    try:
        assert fleet_ready.wait(180), "controller never came up"
        cli = _FleetClient(("127.0.0.1", fleet_box["port"]))

        # Admission: a seat on the only active host.
        seat = cli.request("admit", stream="caller1")
        assert seat["ok"] and seat["host"] == "a"
        assert seat["addr"] == ["127.0.0.1", port_a]
        slot = seat["slot"]
        # admit is idempotent per stream id (the envelope's UDP-retry
        # contract): a retransmitted admit gets the same seat back, not a
        # duplicate error, and the seat counts once.
        again = cli.request("admit", stream="caller1")
        assert again["ok"] and again["slot"] == slot
        assert again["host"] == "a"
        st = cli.request("stats")["stats"]
        assert st["admitted"] == 1
        assert st["hosts"]["a"]["occupied"] == 1
        assert st["hosts"]["spare"]["standby"] is True

        # Drive real packets at host A until it decodes (first tick
        # compiles), which also guarantees a periodic snapshot cycle ran.
        tx = socket.socket(socket.AF_INET, socket.SOCK_DGRAM)
        wire = pkt.pack_indices_batch(np.zeros((1, 16), np.int32), 64)
        got = None
        deadline = time.time() + 180
        seq = 0
        while got is None and time.time() < deadline:
            tx.sendto(slot.to_bytes(2, "big") + seq.to_bytes(4, "big")
                      + wire[0].tobytes(), ("127.0.0.1", port_a))
            seq += 1
            try:
                got = echo_rx.recvfrom(4096)[0]
            except socket.timeout:
                pass
        assert got is not None, "host A never decoded"
        deadline = time.time() + 30
        while (not os.path.exists(os.path.join(snap_dir, "a.npz"))
               and time.time() < deadline):
            time.sleep(0.05)
        assert os.path.exists(os.path.join(snap_dir, "a.npz"))

        # Host A dies (stop event = the in-process SIGKILL; its control
        # socket closes, so pings get ICMP-refused in microseconds).
        stop_a.set()
        th_a.join(timeout=120)
        assert not th_a.is_alive()

        # The watchdog notices and fails over to the standby.
        deadline = time.time() + 60
        st = None
        while time.time() < deadline:
            st = cli.request("stats")["stats"]
            if st["failovers"] == 1:
                break
            time.sleep(0.2)
        assert st is not None and st["failovers"] == 1, st
        assert st["failover_errors"] == 0, st
        assert "a" not in st["hosts"]  # dead host deregistered
        assert st["hosts"]["spare"]["standby"] is False  # carries calls

        # The caller re-resolves and lands on the standby, same slot.
        loc = cli.request("locate", stream="caller1")
        assert loc["host"] == "spare"
        assert loc["addr"] == ["127.0.0.1", port_b]
        assert loc["slot"] == slot

        # And its packets decode on the standby.
        got = None
        deadline = time.time() + 60
        while got is None and time.time() < deadline:
            tx.sendto(slot.to_bytes(2, "big") + seq.to_bytes(4, "big")
                      + wire[0].tobytes(), ("127.0.0.1", port_b))
            seq += 1
            try:
                got = echo_rx.recvfrom(4096)[0]
            except socket.timeout:
                pass
        tx.close()
        assert got is not None, "standby never decoded after failover"
        assert len(got) == 6 + 320 * 2

        # Release frees the seat; quit stops the controller.
        assert cli.request("release", stream="caller1")["ok"]
        assert cli.request("quit")["ok"]
        th_f.join(timeout=60)
        assert not th_f.is_alive()

        # The --stats sink got at least the final record, and it carries
        # the failover the run performed.
        with open(os.path.join(snap_dir, "fleet_stats.jsonl")) as f:
            lines = [json.loads(line) for line in f]
        assert lines and lines[-1]["final"] is True
        assert lines[-1]["failovers"] == 1
        assert "spare" in lines[-1]["hosts"]
    finally:
        if cli is not None:
            cli.close()
        fleet_stop.set()
        for stop, th in ((stop_a, th_a), (stop_b, th_b)):
            stop.set()
        for th in (th_f, th_a, th_b):
            th.join(timeout=120)
            assert not th.is_alive()
        echo_rx.close()

class _FakeControl:
    """Duck-typed HostControl for watchdog unit tests (same pattern as
    tests/test_fleet.py); dead=True times out like a crashed process,
    fail_restore=True makes the standby reject the snapshot."""

    def __init__(self, dead=False, fail_restore=False):
        self.dead = dead
        self.fail_restore = fail_restore
        self.calls = []

    def request(self, cmd, _timeout=None, _retries=None, **fields):
        self.calls.append((cmd, fields))
        if self.dead:
            raise socket.timeout("host is dead")
        return {"ok": True}

    def restore(self, path):
        self.calls.append(("restore", path))
        if self.fail_restore:
            from lyra_tpu.tools.fleet import ControlError

            raise ControlError("snapshot capacity mismatch")
        return {"ok": True}

    def drain(self, path):
        self.calls.append(("drain", path))
        if self.dead:
            raise socket.timeout("host is dead")
        return {"ok": True, "ticks": 7}

    def close(self):
        pass


def _watchdog_fixture(snapshot_dir="/tmp/snaps", fail_restore=False):
    """A router with active host a (1 caller) + standby spare, and a
    quiet-logging watchdog over it."""
    from lyra_tpu.tools.fleet import FleetRouter
    from lyra_tpu.tools.fleet_main import _Watchdog

    r = FleetRouter()
    ctls = {"a": _FakeControl(),
            "spare": _FakeControl(fail_restore=fail_restore)}
    r.add_host("a", ("127.0.0.1", 1), ctls["a"], 2)
    r.add_host("spare", ("127.0.0.1", 2), ctls["spare"], 2, standby=True)
    r.admit("caller")
    logs = []
    wd = _Watchdog(r, snapshot_dir, log=logs.append)
    return r, ctls, wd, logs


def test_watchdog_healthy_sweep_is_quiet():
    r, ctls, wd, logs = _watchdog_fixture()
    wd.sweep()
    assert wd.failovers == 0 and wd.failover_errors == 0
    assert not wd.dead_unrecovered and not logs


def test_watchdog_fails_over_dead_active_host_once():
    r, ctls, wd, logs = _watchdog_fixture()
    ctls["a"].dead = True
    wd.sweep()
    assert wd.failovers == 1 and wd.failover_errors == 0
    assert r.locate("caller")[0] == "spare"
    assert "a" not in r.hosts()
    assert ("restore", os.path.join("/tmp/snaps", "a")) in ctls["spare"].calls
    # Next sweeps see a healthy fleet (spare active, a gone): no churn.
    wd.sweep()
    assert wd.failovers == 1 and len(logs) == 1


def test_watchdog_dead_standby_is_reported_not_failed_over():
    r, ctls, wd, logs = _watchdog_fixture()
    ctls["spare"].dead = True
    wd.sweep()
    assert wd.failovers == 0 and wd.failover_errors == 0
    assert wd.dead_unrecovered == ["spare"]
    assert any("standby" in line for line in logs)
    wd.sweep()  # reported once, not every sweep
    assert len(logs) == 1
    # The dead standby is excluded as a failover target: when a also
    # dies, the sweep counts an error instead of restoring into a corpse.
    ctls["a"].dead = True
    wd.sweep()
    assert wd.failovers == 0 and wd.failover_errors == 1
    assert ("restore", os.path.join("/tmp/snaps", "a")) not in ctls["spare"].calls


def test_watchdog_without_snapshot_dir_counts_the_error():
    r, ctls, wd, logs = _watchdog_fixture(snapshot_dir=None)
    ctls["a"].dead = True
    wd.sweep()
    assert wd.failovers == 0 and wd.failover_errors == 1
    assert wd.dead_unrecovered == ["a"]
    assert any("snapshot_dir" in line for line in logs)
    # The host stays registered (operator action needed), but the sweep
    # never retries a reported host.
    wd.sweep()
    assert wd.failover_errors == 1


def test_watchdog_failed_restore_is_counted_and_not_retried():
    r, ctls, wd, logs = _watchdog_fixture(fail_restore=True)
    ctls["a"].dead = True
    wd.sweep()
    assert wd.failovers == 0 and wd.failover_errors == 1
    assert wd.dead_unrecovered == ["a"]
    assert any("failed" in line for line in logs)
    wd.sweep()
    assert wd.failover_errors == 1  # no retry storm against a bad snapshot

def test_watchdog_survives_host_removed_mid_sweep():
    """An operator's remove_host can land between the sweep's host-list
    snapshot and its unlocked probe; the probe's KeyError must be a
    skipped host, not an exception that kills the watchdog thread."""
    r, ctls, wd, logs = _watchdog_fixture()
    real_alive = r.alive

    def racy_alive(name, **kw):
        if name == "a":
            raise KeyError(name)  # removed while the sweep probed
        return real_alive(name, **kw)

    r.alive = racy_alive
    wd.sweep()  # must not raise
    assert wd.failovers == 0 and wd.failover_errors == 0
    assert not wd.dead_unrecovered


def test_watchdog_flap_aborts_failover_without_suppression():
    """A host that answers pings again at the pre-restore recheck (flap,
    or a replacement re-registered under the same name) is NOT failed
    over — that would fork its calls — and is NOT suppressed either: it
    keeps full watchdog protection for a later real death."""
    r, ctls, wd, logs = _watchdog_fixture()

    flaps = {"remaining": 1}
    real_request = ctls["a"].request

    def flappy_request(cmd, _timeout=None, _retries=None, **fields):
        if flaps["remaining"] > 0:
            flaps["remaining"] -= 1
            raise socket.timeout("flap")
        return real_request(cmd, _timeout=_timeout, _retries=_retries,
                            **fields)

    ctls["a"].request = flappy_request
    wd.sweep()
    assert wd.failovers == 0 and wd.failover_errors == 0
    assert not wd.dead_unrecovered  # still watched
    assert "a" in r.hosts() and not r.hosts()["a"]["busy"]
    assert r.hosts()["spare"]["standby"] is True  # untouched
    assert not any(c[0] == "restore" for c in ctls["spare"].calls)
    assert any("answers pings again" in line for line in logs)
    # The real death later is still handled.
    ctls["a"].dead = True
    ctls["a"].request = _FakeControl.__dict__["request"].__get__(ctls["a"])
    wd.sweep()
    assert wd.failovers == 1 and r.locate("caller")[0] == "spare"


def test_watchdog_stale_verdict_does_not_suppress():
    """A verdict reached before a fleet change (generation bump) must not
    suppress a host the verdict was never about — the re-added
    replacement would silently lose watchdog protection."""
    r, ctls, wd, logs = _watchdog_fixture()
    with wd._lock:
        gen0 = wd._gen
    wd.notify_fleet_changed()
    with wd._lock:
        wd._suppress("a", gen0)
    assert not wd.dead_unrecovered


def test_watchdog_recovered_host_resumes_watch_and_unsticks_failover():
    """A suppressed host that answers pings again (operator restarted the
    process in place, or a standby that was slow to come up) is a fleet
    premise change like add_host: suppression resets, the recovered
    standby becomes a failover target, and the host itself regains
    watchdog protection for a later real death."""
    r, ctls, wd, logs = _watchdog_fixture()
    # Both hosts look dead at startup (e.g. still compiling first tick).
    ctls["a"].dead = True
    ctls["spare"].dead = True
    wd.sweep()
    assert sorted(wd.dead_unrecovered) == ["a", "spare"]
    assert wd.failovers == 0 and wd.failover_errors == 1
    wd.sweep()  # suppressed: no retry storm while nothing changed
    assert wd.failover_errors == 1
    # The standby comes up: suppression clears, the stuck failover of the
    # (still dead) active host completes on the next sweep.
    ctls["spare"].dead = False
    wd.sweep()
    assert wd.dead_unrecovered != ["a", "spare"]
    wd.sweep()
    assert wd.failovers == 1 and r.locate("caller")[0] == "spare"
    assert any("answers pings again" in line for line in logs)


def test_fleet_churn_soak():
    """Long mixed workload against the fleet bookkeeping: admit/release
    churn interleaved with migrations, crashes + watchdog failovers, and
    runtime host replacement.  Invariants checked every round: seat
    accounting matches the stream table, every stream locates to a live
    registered host, and no busy reservation is left behind (a stuck
    reservation would silently shrink the admission pool forever)."""
    import random

    from lyra_tpu.tools.fleet import FleetRouter
    from lyra_tpu.tools.fleet_main import _Watchdog

    rng = random.Random(7)
    r = FleetRouter()
    ctls = {}
    counter = itertools.count()

    def new_host(name, standby):
        ctls[name] = _FakeControl()
        r.add_host(name, ("127.0.0.1", 1), ctls[name], 8, standby=standby)

    new_host("h0", False)
    new_host("h1", False)
    new_host("spare0", True)
    new_host("spare1", True)
    wd = _Watchdog(r, "/tmp/snaps", log=lambda s: None)
    live = set()

    def check_invariants():
        hosts = r.hosts()
        assert sum(h["occupied"] for h in hosts.values()) == len(live)
        assert not any(h["busy"] for h in hosts.values())
        for sid in live:
            name, _, _ = r.locate(sid)
            assert name in hosts and not hosts[name]["standby"]

    for round_no in range(120):
        # Churn seats.
        for _ in range(rng.randrange(4)):
            sid = f"s{next(counter)}"
            try:
                r.admit(sid)
                live.add(sid)
            except RuntimeError:
                break  # fleet full this round
        for sid in rng.sample(sorted(live), k=min(len(live),
                                                  rng.randrange(3))):
            r.release(sid)
            live.discard(sid)
        op = rng.random()
        hosts = r.hosts()
        actives = [n for n, h in hosts.items() if not h["standby"]]
        standbys = [n for n, h in hosts.items()
                    if h["standby"] and not ctls[n].dead]
        if op < 0.25 and actives and standbys:
            # Maintenance migration into a warm standby, then replace
            # the drained (stopped) source with a fresh spare.
            src, dst = rng.choice(actives), rng.choice(standbys)
            r.migrate(src, dst, "/tmp/snaps/x")
            r.remove_host(src)
            new_host(f"spare{next(counter)}", True)
            wd.notify_fleet_changed()
        elif op < 0.45 and actives and standbys:
            # Crash + autonomous watchdog failover + replacement.
            victim = rng.choice(actives)
            ctls[victim].dead = True
            wd.sweep()
            assert victim not in r.hosts()
            new_host(f"spare{next(counter)}", True)
            wd.notify_fleet_changed()
        check_invariants()

    assert wd.failovers > 0  # the crash branch actually ran
    assert not wd.dead_unrecovered


def test_admission_with_bitrate_relays_and_rolls_back():
    """admit+bitrate relays set_bitrate to the seat's host; a refused
    rate frees the seat (all-or-nothing), and the standalone set_bitrate
    verb reaches the stream's current host mid-call."""
    from lyra_tpu.tools.fleet import ControlError, FleetRouter
    from lyra_tpu.tools.fleet_main import _AdmissionService, _Watchdog

    class _RateControl(_FakeControl):
        def set_bitrate(self, slot, bitrate):
            self.calls.append(("set_bitrate", slot, bitrate))
            if bitrate not in (3200, 6000, 9200):
                raise ControlError("ValueError: unsupported bitrate")
            return {"ok": True}

    r = FleetRouter()
    ctl = _RateControl()
    r.add_host("a", ("127.0.0.1", 1), ctl, 2)
    svc = _AdmissionService(r, _Watchdog(r, None, log=lambda *_: None),
                            0, "127.0.0.1")
    stop = threading.Event()

    def pump():
        while not stop.is_set():
            svc.poll(None)
            time.sleep(0.002)

    th = threading.Thread(target=pump)
    th.start()
    cli = _FleetClient(("127.0.0.1", svc.port))
    try:
        seat = cli.request("admit", stream="c1", bitrate=6000)
        assert seat["ok"] and seat["slot"] == 0
        assert ("set_bitrate", 0, 6000) in ctl.calls

        # Mid-call change through the controller.
        assert cli.request("set_bitrate", stream="c1", bitrate=9200)["ok"]
        assert ("set_bitrate", 0, 9200) in ctl.calls
        bad = cli.request("set_bitrate", stream="c1", bitrate=1234)
        assert not bad["ok"] and "bitrate" in bad["error"]

        # A refused rate at admission frees the seat again.
        refused = cli.request("admit", stream="c2", bitrate=1234)
        assert not refused["ok"]
        retry = cli.request("admit", stream="c2", bitrate=3200)
        assert retry["ok"] and retry["slot"] == 1
        # A retried admit of an EXISTING seat never relays its bitrate
        # field (the seat predates the datagram, its rate was set on the
        # fresh attempt) — otherwise a keyless admit could retune
        # someone else's call, bypassing the keyed set_bitrate verb.
        n_rate_calls = sum(c[0] == "set_bitrate" for c in ctl.calls)
        re_admit = cli.request("admit", stream="c2", bitrate=9200)
        assert re_admit["ok"] and re_admit["slot"] == 1  # locate semantics
        assert cli.request("locate", stream="c2")["slot"] == 1
        assert sum(c[0] == "set_bitrate"
                   for c in ctl.calls) == n_rate_calls  # not relayed

        # release is idempotent: the retry of a completed release is ok.
        assert cli.request("release", stream="c2")["ok"]
        assert cli.request("release", stream="c2")["ok"]

        # The admit "room" field reaches the router: this fleet has no
        # bridge hosts, so a room-directed admit is refused loudly.
        roomless = cli.request("admit", stream="c9", room="R1")
        assert not roomless["ok"] and "bridge" in roomless["error"]
    finally:
        stop.set()
        th.join(timeout=10)
        cli.close()
        svc.close()
        r.close()

def test_runtime_add_host_unsticks_a_failed_failover(monkeypatch):
    """The operator story for a stuck failover: host a dies with NO
    standby registered (error counted, retries suppressed); adding a
    standby at runtime via the add_host verb resets the suppression and
    the next sweep fails a's callers over to it.  remove_host refuses
    while a host carries streams and works once it is empty."""
    from lyra_tpu.tools import fleet_main
    from lyra_tpu.tools.fleet import FleetRouter
    from lyra_tpu.tools.fleet_main import _AdmissionService, _Watchdog

    r = FleetRouter()
    ctl_a = _FakeControl()
    r.add_host("a", ("127.0.0.1", 1), ctl_a, 2)
    r.admit("caller")
    logs = []
    wd = _Watchdog(r, "/tmp/snaps", log=logs.append)
    svc = _AdmissionService(r, wd, 0, "127.0.0.1")

    # The runtime-added host's HostControl must be a fake too: intercept
    # construction (the admission service builds it from the spec).
    spare_ctl = _FakeControl()
    monkeypatch.setattr(fleet_main, "HostControl",
                        lambda addr, **kw: spare_ctl)

    stop = threading.Event()

    def pump():
        while not stop.is_set():
            svc.poll(None)
            time.sleep(0.002)

    th = threading.Thread(target=pump)
    th.start()
    cli = _FleetClient(("127.0.0.1", svc.port))
    try:
        # a dies; no standby -> failover error, retries suppressed.
        ctl_a.dead = True
        wd.sweep()
        assert wd.failover_errors == 1 and wd.dead_unrecovered == ["a"]
        wd.sweep()
        assert wd.failover_errors == 1  # suppressed

        # Spec without capacity is refused; malformed spec is refused.
        bad = cli.request("add_host", spec="spare=127.0.0.1:3:4")
        assert not bad["ok"] and "CAP" in bad["error"]
        assert not cli.request("add_host", spec="nonsense")["ok"]

        # Runtime standby registration resets the suppression...
        ok = cli.request("add_host", spec="spare=127.0.0.1:3:4:2",
                         standby=True)
        assert ok["ok"]
        assert wd.dead_unrecovered == []
        # ...and the next sweep completes the stuck failover.
        wd.sweep()
        assert wd.failovers == 1 and r.locate("caller")[0] == "spare"
        assert ("restore", os.path.join("/tmp/snaps", "a")) in spare_ctl.calls

        # remove_host: refused while carrying streams, works when empty.
        busy = cli.request("remove_host", host="spare")
        assert not busy["ok"] and "streams" in busy["error"]
        r.release("caller")
        assert cli.request("remove_host", host="spare")["ok"]
        assert "spare" not in cli.request("stats")["stats"]["hosts"]
        # Duplicate add is refused (and must not leak the control).
        cli.request("add_host", spec="x=127.0.0.1:5:6:2")
        dup = cli.request("add_host", spec="x=127.0.0.1:5:6:2")
        assert not dup["ok"] and "registered" in dup["error"]
    finally:
        stop.set()
        th.join(timeout=10)
        cli.close()
        svc.close()
        r.close()


@pytest.mark.full
def test_controller_restart_mid_call_then_failover(model_path, tmp_path):
    """The controller is no longer a single point of failure with amnesia
    (VERDICT r4 item 1): kill fleet_main mid-call with a caller
    streaming, restart it on the same --snapshot_dir, and the resumed
    controller (a) answers locate for the pre-existing seat without
    re-admission, (b) refuses a duplicate admit of that stream id the
    same way the first life did, and (c) still fails the seat over to
    the standby when the host later dies — the round-4 availability
    machinery survives its own driver's crash.

    The whole topology runs KEYED (serve_main --control_key + fleet_main
    --key on one shared file): every control RPC the controller sends —
    including the restore the watchdog issues during failover, and the
    RPCs of the SECOND life whose HostControls were rebuilt from the
    journal — must carry a valid MAC or the hosts refuse it."""
    from lyra_tpu import packet as pkt
    from lyra_tpu.tools import serve_main

    snap_dir = str(tmp_path)
    key_file = os.path.join(snap_dir, "fleet.key")
    with open(key_file, "wb") as f:
        f.write(os.urandom(32))
    echo_rx = socket.socket(socket.AF_INET, socket.SOCK_DGRAM)
    echo_rx.bind(("127.0.0.1", 0))
    echo_rx.settimeout(0.05)
    echo_port = echo_rx.getsockname()[1]

    def start_host(name, extra):
        box = {}
        ready = threading.Event()
        stop = threading.Event()
        ctl_port = _free_udp_port()
        th = threading.Thread(target=serve_main.main, kwargs=dict(
            argv=["--capacity", "2", "--seconds", "0",
                  "--max_bitrate", "3200", "--model_path", model_path,
                  "--playout_delay", "1", "--report_every", "30",
                  "--echo", f"127.0.0.1:{echo_port}",
                  "--control", str(ctl_port),
                  "--control_key", key_file] + extra,
            _on_ready=lambda port: (box.update(port=port), ready.set()),
            _stop=stop))
        th.start()
        assert ready.wait(120), f"host {name} never bound its port"
        return th, stop, box["port"], ctl_port

    th_a, stop_a, port_a, ctl_a = start_host(
        "a", ["--snapshot", os.path.join(snap_dir, "a"),
              "--snapshot_every", "0.3"])
    th_b, stop_b, port_b, ctl_b = start_host("spare", [])

    fleet_port = _free_udp_port()  # same front door for both lives
    fleet_argv = [
        "--host", f"a=127.0.0.1:{port_a}:{ctl_a}:2",
        "--standby", f"spare=127.0.0.1:{port_b}:{ctl_b}:2",
        "--snapshot_dir", snap_dir, "--watch_every", "0.3",
        "--wait_ready", "--key", key_file,
        "--port", str(fleet_port), "--report_every", "60", "--seconds", "0"]

    def start_controller():
        ready = threading.Event()
        stop = threading.Event()
        th = threading.Thread(target=fleet_main, kwargs=dict(
            argv=fleet_argv, _on_ready=lambda port: ready.set(),
            _stop=stop))
        th.start()
        assert ready.wait(180), "controller never came up"
        return th, stop

    th_f, stop_f = start_controller()
    cli = tx = None
    th_f2 = stop_f2 = None
    try:
        from lyra_tpu.tools.control_auth import load_key

        cli = _FleetClient(("127.0.0.1", fleet_port),
                           key=load_key(key_file))
        seat = cli.request("admit", stream="caller1")
        assert seat["ok"] and seat["host"] == "a"
        slot = seat["slot"]

        # The caller streams against host A until packets decode.
        tx = socket.socket(socket.AF_INET, socket.SOCK_DGRAM)
        wire = pkt.pack_indices_batch(np.zeros((1, 16), np.int32), 64)
        got, seq = None, 0
        deadline = time.time() + 180
        while got is None and time.time() < deadline:
            tx.sendto(slot.to_bytes(2, "big") + seq.to_bytes(4, "big")
                      + wire[0].tobytes(), ("127.0.0.1", port_a))
            seq += 1
            try:
                got = echo_rx.recvfrom(4096)[0]
            except socket.timeout:
                pass
        assert got is not None, "host A never decoded"

        # Controller dies mid-call.  The caller's audio is untouched
        # (data plane is host-direct); only admission/locate go dark.
        stop_f.set()
        th_f.join(timeout=60)
        assert not th_f.is_alive()

        # Restart on the same snapshot_dir: the journal replays.
        th_f2, stop_f2 = start_controller()

        # (a) The pre-existing seat re-resolves with no re-admission.
        loc = cli.request("locate", stream="caller1")
        assert loc["ok"] and loc["host"] == "a"
        assert loc["addr"] == ["127.0.0.1", port_a] and loc["slot"] == slot
        # (b) Seat accounting survived: the slot is not double-granted.
        seat2 = cli.request("admit", stream="caller2")
        assert seat2["ok"] and (seat2["host"], seat2["slot"]) != ("a", slot)
        st = cli.request("stats")["stats"]
        assert st["hosts"]["a"]["occupied"] == 2
        assert st["hosts"]["spare"]["standby"] is True

        # (c) A subsequent host death still fails over.
        stop_a.set()
        th_a.join(timeout=120)
        assert not th_a.is_alive()
        deadline = time.time() + 120
        st = None
        while time.time() < deadline:
            st = cli.request("stats")["stats"]
            if st["failovers"] == 1:
                break
            time.sleep(0.2)
        assert st is not None and st["failovers"] == 1, st
        loc = cli.request("locate", stream="caller1")
        assert loc["host"] == "spare" and loc["slot"] == slot

        # And the caller's packets decode on the standby.
        got = None
        deadline = time.time() + 60
        while got is None and time.time() < deadline:
            tx.sendto(slot.to_bytes(2, "big") + seq.to_bytes(4, "big")
                      + wire[0].tobytes(), ("127.0.0.1", port_b))
            seq += 1
            try:
                got = echo_rx.recvfrom(4096)[0]
            except socket.timeout:
                pass
        assert got is not None, "standby never decoded after failover"

        assert cli.request("quit")["ok"]
        th_f2.join(timeout=60)
        assert not th_f2.is_alive()
    finally:
        if cli is not None:
            cli.close()
        if tx is not None:
            tx.close()
        for ev in (stop_f, stop_a, stop_b) + (
                (stop_f2,) if stop_f2 is not None else ()):
            ev.set()
        for th in (th_f, th_a, th_b) + (
                (th_f2,) if th_f2 is not None else ()):
            th.join(timeout=120)
            assert not th.is_alive()
        echo_rx.close()


class _FakeServeHost:
    """A UDP control endpoint speaking serve_main's --control protocol
    (ping/stats/save/restore/drain/quit, req-echo envelope) without the
    engine — the controller-tier soak drives the REAL fleet_main process
    machinery (admission service, watchdog, journal) against many of
    these.  kill() closes the socket, so pings get ICMP-refused like a
    crashed process."""

    def __init__(self, snap_dir, name):
        self.name = name
        self._snap = os.path.join(snap_dir, name)
        open(self._snap, "w").write("snapshot")  # serve_main --snapshot twin
        self._sock = socket.socket(socket.AF_INET, socket.SOCK_DGRAM)
        self._sock.bind(("127.0.0.1", 0))
        self._sock.settimeout(0.1)
        self.port = self._sock.getsockname()[1]
        self.restores = 0
        self._stop = threading.Event()
        self._th = threading.Thread(target=self._serve, daemon=True)
        self._th.start()

    def _serve(self):
        while not self._stop.is_set():
            try:
                data, addr = self._sock.recvfrom(64 * 1024)
            except socket.timeout:
                continue
            except OSError:
                return  # killed
            try:
                cmd = json.loads(data.decode())
            except ValueError:
                continue
            reply = {"req": cmd.get("req"), "ok": True}
            name = cmd.get("cmd")
            if name == "stats":
                reply["stats"] = {"mode": "decode", "ticks": 1}
            elif name in ("save", "drain"):
                open(cmd["path"], "w").write("snapshot")
            elif name == "restore":
                if not os.path.exists(cmd["path"]):
                    reply = {"req": cmd.get("req"), "ok": False,
                             "error": "no snapshot"}
                else:
                    self.restores += 1
            elif name == "set_bitrate":
                pass
            elif name not in ("ping", "quit"):
                reply = {"req": cmd.get("req"), "ok": False,
                         "error": f"unknown {name!r}"}
            try:
                self._sock.sendto(json.dumps(reply).encode(), addr)
            except OSError:
                return

    def kill(self):
        """The crash: stop answering, release the port (ICMP-refused)."""
        self._stop.set()
        self._sock.close()
        self._th.join(timeout=10)


def _rss_kb() -> int:
    with open("/proc/self/statm") as f:
        return int(f.read().split()[1]) * os.sysconf("SC_PAGESIZE") // 1024


@pytest.mark.full
def test_fleet_main_process_soak(tmp_path):
    """Controller-tier soak (VERDICT r4 item 6) through the REAL
    fleet_main process machinery: seat churn, maintenance migrations,
    host crashes with autonomous watchdog failover, runtime host
    replacement, and TWO controller crash-restarts mid-soak — every seat
    accounted at each checkpoint, flat RSS, and the routing journal
    bounded by compaction."""
    snap_dir = str(tmp_path)
    hosts = {}
    counter = itertools.count()

    def new_host(name):
        hosts[name] = _FakeServeHost(snap_dir, name)
        return hosts[name]

    for n in ("h0", "h1", "s0", "s1"):
        new_host(n)

    fleet_port = _free_udp_port()

    def controller_argv(initial):
        argv = ["--snapshot_dir", snap_dir, "--watch_every", "0.15",
                "--port", str(fleet_port), "--report_every", "300",
                "--seconds", "0"]
        if initial:  # restarts resume purely from the journal
            for n in ("h0", "h1"):
                argv += ["--host", f"{n}=127.0.0.1:1:{hosts[n].port}:8"]
            for n in ("s0", "s1"):
                argv += ["--standby", f"{n}=127.0.0.1:1:{hosts[n].port}:8"]
        return argv

    def start_controller(initial=False):
        ready = threading.Event()
        stop = threading.Event()
        th = threading.Thread(target=fleet_main, kwargs=dict(
            argv=controller_argv(initial), _on_ready=lambda p: ready.set(),
            _stop=stop))
        th.start()
        assert ready.wait(60), "controller never came up"
        return th, stop

    th, stop = start_controller(initial=True)
    cli = _FleetClient(("127.0.0.1", fleet_port))
    import random

    rng = random.Random(11)
    live = set()
    tokens = {}
    failovers_seen = 0
    rss0 = None
    try:
        for round_no in range(60):
            # Seat churn (half the seats token-guarded: the capability
            # must hold through migrations, failovers, and restarts).
            for _ in range(rng.randrange(5)):
                sid = f"s{next(counter)}"
                tok = f"tok-{sid}" if rng.random() < 0.5 else None
                r = cli.request("admit", stream=sid,
                                **({"token": tok} if tok else {}))
                if r["ok"]:
                    live.add(sid)
                    tokens[sid] = tok
            for sid in rng.sample(sorted(live),
                                  k=min(len(live), rng.randrange(4))):
                tok = tokens.get(sid)
                if tok is not None:
                    # The guessed-id teardown must stay refused.
                    naked = cli.request("release", stream=sid)
                    assert not naked["ok"] and "token" in naked["error"]
                assert cli.request(
                    "release", stream=sid,
                    **({"token": tok} if tok else {}))["ok"]
                live.discard(sid)
                tokens.pop(sid, None)

            st = cli.request("stats")["stats"]
            actives = [n for n, h in st["hosts"].items()
                       if not h["standby"] and not h["busy"]
                       and n in hosts and not hosts[n]._stop.is_set()]
            standbys = [n for n, h in st["hosts"].items()
                        if h["standby"] and n in hosts
                        and not hosts[n]._stop.is_set()]
            op = rng.random()
            if op < 0.18 and actives and standbys:
                # Maintenance migration; drained source then removed and
                # replaced by a fresh runtime standby.
                src, dst = rng.choice(actives), rng.choice(standbys)
                r = cli.request("migrate", src=src, dst=dst)
                assert r["ok"], r
                assert cli.request("remove_host", host=src)["ok"]
                hosts[src].kill()
                nh = new_host(f"r{next(counter)}")
                assert cli.request(
                    "add_host", spec=f"{nh.name}=127.0.0.1:1:{nh.port}:8",
                    standby=True)["ok"]
            elif op < 0.36 and actives and standbys:
                # Crash: the watchdog must fail the victim over.  The
                # target count is captured BEFORE the kill — a 0.15 s
                # sweep can complete the failover before our next stats.
                want = cli.request("stats")["stats"]["failovers"] + 1
                victim = rng.choice(actives)
                hosts[victim].kill()
                deadline = time.time() + 30
                while time.time() < deadline:
                    st = cli.request("stats")["stats"]
                    if st["failovers"] >= want:
                        break
                    time.sleep(0.1)
                assert st["failovers"] >= want, st
                failovers_seen += 1
                nh = new_host(f"r{next(counter)}")
                assert cli.request(
                    "add_host", spec=f"{nh.name}=127.0.0.1:1:{nh.port}:8",
                    standby=True)["ok"]
            elif round_no in (20, 40):
                # Controller crash + journal-resume restart (flagless).
                stop.set()
                th.join(timeout=60)
                assert not th.is_alive()
                th, stop = start_controller(initial=False)

            # Invariants every round: seat accounting matches, every live
            # stream locates to a live non-standby host.
            st = cli.request("stats")["stats"]
            occupied = sum(h["occupied"] for h in st["hosts"].values())
            assert occupied == len(live), (occupied, len(live), round_no)
            assert not any(h["busy"] for h in st["hosts"].values())
            for sid in rng.sample(sorted(live), k=min(len(live), 3)):
                tok = tokens.get(sid)
                loc = cli.request("locate", stream=sid,
                                  **({"token": tok} if tok else {}))
                assert loc["ok"], (loc, round_no)
                assert not st["hosts"][loc["host"]]["standby"]
                if tok is not None:  # the guard survives every handoff
                    naked = cli.request("locate", stream=sid)
                    assert not naked["ok"], (sid, round_no)
            if round_no == 10:
                rss0 = _rss_kb()

        assert failovers_seen >= 2, "the crash branch barely ran"
        # Flat RSS: the fleet tier must not leak per-event memory.
        growth = _rss_kb() - rss0
        assert growth < 40 * 1024, f"RSS grew {growth} kB over the soak"
        # The journal stays bounded (compaction) and resumable.
        jsize = os.path.getsize(os.path.join(snap_dir,
                                             ".fleet_journal.jsonl"))
        assert jsize < 4 * 1024 * 1024, jsize
        assert cli.request("quit")["ok"]
        th.join(timeout=60)
        assert not th.is_alive()
    finally:
        stop.set()
        th.join(timeout=60)
        cli.close()
        for h in hosts.values():
            if not h._stop.is_set():
                h.kill()


def test_seat_tokens_guard_locate_and_release():
    """Caller-chosen seat tokens: a token-guarded seat answers only its
    owner — a reachable peer who guesses the stream id can neither trace
    (locate) nor tear down (release) the call, while the owner's own
    UDP-retried admit (same token) still gets locate semantics.
    Token-less seats keep the legacy open contract."""
    from lyra_tpu.tools.fleet import FleetRouter
    from lyra_tpu.tools.fleet_main import _AdmissionService, _Watchdog

    r = FleetRouter()
    r.add_host("a", ("127.0.0.1", 1), _FakeControl(), 4)
    svc = _AdmissionService(r, _Watchdog(r, None, log=lambda *_: None),
                            0, "127.0.0.1")
    stop = threading.Event()

    def pump():
        while not stop.is_set():
            svc.poll(None)
            time.sleep(0.002)

    th = threading.Thread(target=pump)
    th.start()
    cli = _FleetClient(("127.0.0.1", svc.port))
    try:
        seat = cli.request("admit", stream="victim", token="s3cret")
        assert seat["ok"] and seat["slot"] == 0

        # Guessed-id attacks: all refused, seat untouched.
        for attack in (
            {"cmd": "locate", "stream": "victim"},
            {"cmd": "locate", "stream": "victim", "token": "wrong"},
            {"cmd": "release", "stream": "victim"},
            {"cmd": "release", "stream": "victim", "token": "wrong"},
            {"cmd": "admit", "stream": "victim", "token": "wrong"},
            {"cmd": "admit", "stream": "victim"},
        ):
            got = cli.request(**{("cmd" if k == "cmd" else k): v
                                 for k, v in attack.items()})
            assert not got["ok"] and "token" in got["error"], (attack, got)
        # Oversized/non-string tokens are refused before touching tables.
        bad = cli.request("admit", stream="x", token="t" * 200)
        assert not bad["ok"] and "128" in bad["error"]

        # The owner: retried admit (same token) = locate semantics.
        again = cli.request("admit", stream="victim", token="s3cret")
        assert again["ok"] and again["slot"] == 0
        assert cli.request("locate", stream="victim",
                           token="s3cret")["ok"]
        assert cli.request("release", stream="victim",
                           token="s3cret")["ok"]
        # Seat actually freed; token-less seats stay open-contract.
        free = cli.request("admit", stream="open1")
        assert free["ok"]
        assert cli.request("locate", stream="open1")["ok"]
        assert cli.request("release", stream="open1")["ok"]
    finally:
        stop.set()
        th.join(timeout=10)
        cli.close()
        svc.close()
        r.close()
