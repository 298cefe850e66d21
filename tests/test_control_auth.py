"""Management-plane trust boundary: HMAC signing, replay rules, and the
routable-needs-key startup policy (VERDICT r4 item 2 — the boundary is
enforced, not documented).

The reference has no control plane (its nearest gate is the
weights/version check, reference: lyra/lyra_config.h:131-167); these
tests pin the deployment tier's own authentication contract."""

import json
import socket
import threading
import time

import pytest

from lyra_tpu.tools.control_auth import (AuthError, Verifier, load_key,
                                         require_key_for_routable, sign)

KEY = b"0123456789abcdef0123456789abcdef"
OTHER_KEY = b"fedcba9876543210fedcba9876543210"


def test_sign_verify_roundtrip_and_udp_retry_duplicate():
    v = Verifier(KEY)
    msg = sign({"cmd": "drain", "req": "r1", "path": "/tmp/x"}, KEY)
    v.verify(msg)  # fresh: accepted
    # The UDP-retry contract: the IDENTICAL datagram is accepted again
    # (HostControl signs once per request and retransmits the same bytes;
    # every verb is idempotent by design).
    v.verify(json.loads(json.dumps(msg)))


def test_tampered_messages_are_refused():
    v = Verifier(KEY)
    msg = sign({"cmd": "quit", "req": "r1"}, KEY)
    with pytest.raises(AuthError, match="mac"):
        v.verify({**msg, "mac": "0" * 64})
    with pytest.raises(AuthError, match="mac"):
        v.verify({**msg, "cmd": "drain"})  # body edited under the mac
    with pytest.raises(AuthError, match="mac"):
        v.verify({k: x for k, x in msg.items() if k != "mac"})
    with pytest.raises(AuthError, match="mac"):
        Verifier(OTHER_KEY).verify(msg)  # wrong key


def test_stale_timestamp_is_refused():
    now = [1000.0]
    v = Verifier(KEY, window_s=30.0, clock=lambda: now[0])
    msg = sign({"cmd": "quit", "req": "r1"}, KEY, _now=1000.0)
    v.verify(msg)
    now[0] = 1031.0  # past the window: a captured datagram replayed later
    with pytest.raises(AuthError, match="stale"):
        v.verify(msg)
    # Too far in the future is refused too (clock-skew splice).
    late = sign({"cmd": "quit", "req": "r2"}, KEY, _now=1100.0)
    with pytest.raises(AuthError, match="stale"):
        v.verify(late)


def test_spliced_nonce_is_refused():
    """A captured nonce/ts glued onto a different command must die even
    inside the window — only the byte-identical retry passes."""
    v = Verifier(KEY)
    msg = sign({"cmd": "stats", "req": "r1"}, KEY)
    v.verify(msg)
    spliced = {**msg, "cmd": "quit"}
    body = {k: x for k, x in spliced.items() if k != "mac"}
    import hashlib
    import hmac as hmac_mod

    spliced["mac"] = hmac_mod.new(
        KEY, json.dumps(body, sort_keys=True,
                        separators=(",", ":")).encode(),
        hashlib.sha256).hexdigest()
    # Even correctly re-signed (attacker WITH the key is out of scope,
    # but a reused nonce from a leaked log is not): same nonce, new body.
    with pytest.raises(AuthError, match="replay"):
        v.verify(spliced)


def test_nonce_cache_is_bounded():
    v = Verifier(KEY, max_nonces=8)
    for i in range(64):
        v.verify(sign({"cmd": "stats", "req": f"r{i}"}, KEY))
    assert len(v._seen) <= 8


def test_load_key_refuses_short_keys(tmp_path):
    p = tmp_path / "short.key"
    p.write_bytes(b"tiny\n")
    with pytest.raises(ValueError, match="16"):
        load_key(str(p))
    p2 = tmp_path / "good.key"
    p2.write_bytes(KEY + b"\n")
    assert load_key(str(p2)) == KEY


def test_routable_bind_requires_key():
    require_key_for_routable("127.0.0.1", None, "x")  # loopback: keyless ok
    require_key_for_routable("0.0.0.0", "/some/key", "x")
    with pytest.raises(SystemExit, match="routable"):
        require_key_for_routable("0.0.0.0", None, "x")
    with pytest.raises(SystemExit, match="routable"):
        require_key_for_routable("10.0.0.5", None, "x")


def test_serve_main_refuses_keyless_routable_control():
    from lyra_tpu.tools import serve_main

    with pytest.raises(SystemExit):
        serve_main.main(argv=["--control", "0",
                              "--control_bind", "0.0.0.0"])
    # --control_key without --control keys nothing: loud, not silent.
    with pytest.raises(SystemExit):
        serve_main.main(argv=["--control_key", "/nonexistent"])


def test_fleet_main_refuses_keyless_routable_bind():
    from lyra_tpu.tools.fleet_main import main as fleet_main

    with pytest.raises(SystemExit):
        fleet_main(argv=["--host", "a=127.0.0.1:1:2:4",
                         "--bind", "0.0.0.0"])


class _FakeServer:
    """Duck-typed server for _Control.poll."""

    def __init__(self):
        self.calls = []

    def flush_async(self):
        self.calls.append("flush")

    def save(self, path, transport=None):
        self.calls.append(("save", path))

    def restore(self, path):
        self.calls.append(("restore", path))
        return None


def _drive_control(key, message_makers):
    """Bind a keyed _Control, deliver messages built for its audience
    (each maker takes the endpoint's "ip:port" identity), poll, and
    return (replies, control, server)."""
    from lyra_tpu.tools.serve_main import _Control

    ctl = _Control(0, "127.0.0.1", key=key)
    aud = f"127.0.0.1:{ctl.port}"
    messages = [mk(aud) for mk in message_makers]
    srv = _FakeServer()
    tx = socket.socket(socket.AF_INET, socket.SOCK_DGRAM)
    tx.bind(("127.0.0.1", 0))
    tx.settimeout(5.0)
    for m in messages:
        tx.sendto(json.dumps(m).encode(), ("127.0.0.1", ctl.port))
    deadline = time.time() + 10
    replies = []
    while len(replies) < len(messages) and time.time() < deadline:
        ctl.poll(srv, lambda: {"mode": "fake", "ticks": 0})
        try:
            while True:
                replies.append(json.loads(tx.recv(64 * 1024).decode()))
        except socket.timeout:
            break
    tx.close()
    out = (replies, ctl, srv)
    ctl.close()
    return out


def test_keyed_control_accepts_signed_and_counts_rejects():
    """serve_main's keyed control endpoint: a signed command executes, a
    keyless or tampered one is a counted ok=false reply (never fatal),
    and the counter lands in auth_rejects."""
    makers = [
        lambda aud: sign({"cmd": "ping", "req": "r-ok", "aud": aud}, KEY),
        lambda aud: {"cmd": "quit", "req": "r-naked"},
        lambda aud: {**sign({"cmd": "ping", "req": "r-bad", "aud": aud},
                            KEY), "cmd": "quit"},
        # Valid MAC signed for ANOTHER host's audience: a captured
        # datagram replayed across hosts sharing the fleet key.
        lambda aud: sign({"cmd": "quit", "req": "r-xhost",
                          "aud": "10.9.9.9:5630"}, KEY),
    ]
    replies, ctl, srv = _drive_control(KEY, makers)
    by_req = {r.get("req"): r for r in replies}
    assert by_req["r-ok"]["ok"] and by_req["r-ok"]["mode"] == "fake"
    assert not by_req["r-naked"]["ok"]
    assert "auth" in by_req["r-naked"]["error"]
    assert not by_req["r-bad"]["ok"]
    assert not by_req["r-xhost"]["ok"]
    assert "audience" in by_req["r-xhost"]["error"]
    assert ctl.auth_rejects == 3
    assert srv.calls == []  # nothing destructive executed


def test_hostcontrol_signs_against_keyed_control():
    """The signing client (HostControl key=...) interoperates with the
    verifying server end to end, including retries reusing the one
    signature; a keyless client is refused by the same server."""
    from lyra_tpu.tools.fleet import HostControl
    from lyra_tpu.tools.serve_main import _Control

    ctl = _Control(0, "127.0.0.1", key=KEY)
    srv = _FakeServer()
    stop = threading.Event()

    def pump():
        while not stop.is_set():
            ctl.poll(srv, lambda: {"mode": "fake", "ticks": 3})
            time.sleep(0.002)

    th = threading.Thread(target=pump)
    th.start()
    hc = HostControl(("127.0.0.1", ctl.port), key=KEY)
    naked = HostControl(("127.0.0.1", ctl.port))
    try:
        assert hc.ping()["mode"] == "fake"
        assert hc.save("/tmp/x")["ticks"] == 3
        assert ("save", "/tmp/x") in srv.calls
        from lyra_tpu.tools.fleet import ControlError

        with pytest.raises(ControlError, match="auth"):
            naked.ping()
    finally:
        stop.set()
        th.join(timeout=10)
        hc.close()
        naked.close()
        ctl.close()


def test_fleet_admin_verbs_gated_callers_keyless():
    """fleet_main's admission socket with a key: admit/release/locate/
    stats stay keyless (caller-facing), admin verbs need the mac; a
    spoofed keyless drain-the-host datagram is a counted reject."""
    from lyra_tpu.tools.fleet import FleetRouter
    from lyra_tpu.tools.fleet_main import _AdmissionService, _Watchdog

    class _Ctl:
        addr = ("127.0.0.1", 1001)

        def request(self, cmd, **kw):
            return {"ok": True}

        def close(self):
            pass

    r = FleetRouter()
    r.add_host("a", ("127.0.0.1", 1), _Ctl(), 2)
    wd = _Watchdog(r, None, log=lambda *_: None)
    svc = _AdmissionService(r, wd, 0, "127.0.0.1", key=KEY)
    tx = socket.socket(socket.AF_INET, socket.SOCK_DGRAM)
    tx.bind(("127.0.0.1", 0))
    tx.settimeout(5.0)

    def rpc(msg):
        tx.sendto(json.dumps(msg).encode(), ("127.0.0.1", svc.port))
        deadline = time.time() + 10
        while time.time() < deadline:
            svc.poll(None)
            try:
                reply = json.loads(tx.recv(64 * 1024).decode())
            except socket.timeout:
                continue
            if reply.get("req") == msg.get("req"):
                return reply
        raise AssertionError("no reply")

    try:
        # Caller verbs: keyless.
        seat = rpc({"cmd": "admit", "stream": "c1", "req": "a1"})
        assert seat["ok"] and seat["host"] == "a"
        assert rpc({"cmd": "locate", "stream": "c1", "req": "a2"})["ok"]
        assert rpc({"cmd": "stats", "req": "a3"})["ok"]
        # Admin verb, keyless: refused + counted.
        naked = rpc({"cmd": "remove_host", "host": "a", "req": "a4"})
        assert not naked["ok"] and "auth" in naked["error"]
        assert "a" in r.hosts()
        # Admin verb, signed: accepted (remove refused on occupancy — the
        # auth layer passed it through to the real refusal).
        signed = rpc(sign({"cmd": "remove_host", "host": "a", "req": "a5",
                           "aud": f"127.0.0.1:{svc.port}"}, KEY))
        assert not signed["ok"] and "streams" in signed["error"]
        st = rpc({"cmd": "stats", "req": "a6"})["stats"]
        assert st["auth_rejects"] == 1
    finally:
        tx.close()
        svc.close()
        r.close()
