"""Shared-key authentication for the management plane.

The control endpoints (serve_main --control, fleet_main's admin verbs)
can stop a host, swap engine state, or drain a fleet; round 4 documented
the trust boundary ("firewall it", DEPLOYMENT.md) — this module enforces
it instead.  Every signed command carries:

    {"cmd": ..., "req": ..., ..., "ts": <unix seconds>,
     "nonce": <16 hex chars>, "mac": <hmac-sha256 hex>}

where `mac` is HMAC-SHA256(key, canonical-JSON of the message without
the mac field).  Verification refuses (loudly, as a counted ok=false
reply — never an exception out of a serving tick):

- a missing or mismatching mac (tampered message, wrong key),
- a timestamp outside the replay window (default 30 s — a captured
  datagram replayed later is dead even if the nonce cache was lost to a
  restart),
- a seen nonce with DIFFERENT message bytes (splicing a captured
  nonce/mac onto a new command).

A byte-identical duplicate within the window is ACCEPTED: the control
envelope's UDP-retry contract (fleet.py HostControl retransmits the same
datagram on a lost reply) must keep working, and every verb is
idempotent by design, so re-execution is exactly what a legitimate retry
asks for.  An attacker replaying the identical datagram in-window gains
nothing a retry wouldn't — **at the original recipient**.  Cross-host
replay (one shared fleet key, a captured "drain" re-aimed at every other
host's control port, each with its own fresh nonce cache) is killed by
the audience field: signing clients put the recipient's dialed address
in `"aud"` ("ip:port"), each Verifier is constructed with its own
identity, and a valid-MAC datagram for someone else is refused.  A keyed
endpoint must therefore know its identity — wildcard binds are refused
at startup when keyed — and keyed host specs must dial the same literal
address the host bound (IPs, not DNS names that resolve differently).

Key file: raw bytes (>= 16 after stripping trailing newlines), e.g.
`head -c 32 /dev/urandom > fleet.key`.  Both ends read the same file.

The binding policy lives with the flags (serve_main/fleet_main): a
loopback bind stays keyless; binding a routable address without a key is
refused at startup.  The reference has no control plane (its nearest
gate is the weights/version check, reference: lyra/lyra_config.h:131-167);
this is the deployment tier's own trust boundary.
"""

from __future__ import annotations

import hashlib
import hmac
import json
import os
import time
from typing import Optional


class AuthError(ValueError):
    """A control message failed authentication (tampered, stale, or a
    spliced replay).  Callers turn this into a counted ok=false reply."""


def load_key(path: str) -> bytes:
    """Read a shared key file; short keys are refused at startup (a
    guessable key is worse than the loud refusal)."""
    with open(path, "rb") as f:
        key = f.read().rstrip(b"\r\n")
    if len(key) < 16:
        raise ValueError(
            f"control key {path!r} is {len(key)} bytes; need >= 16 "
            "(e.g. head -c 32 /dev/urandom > key)")
    return key


def _canonical(body: dict) -> bytes:
    return json.dumps(body, sort_keys=True, separators=(",", ":")).encode()


def sign(msg: dict, key: bytes, _now: Optional[float] = None) -> dict:
    """Return a copy of `msg` carrying ts/nonce/mac.  Sign ONCE per
    request, not per retry attempt: the retry must be byte-identical so
    the far side's replay rule recognizes it as the same request."""
    body = {k: v for k, v in msg.items() if k != "mac"}
    body["ts"] = round(time.time() if _now is None else _now, 3)
    body["nonce"] = os.urandom(8).hex()
    mac = hmac.new(key, _canonical(body), hashlib.sha256).hexdigest()
    return {**body, "mac": mac}


class Verifier:
    """Server-side check with a replay window.

    The nonce cache is bounded by the window (entries expire) plus a hard
    cap — a flood of unique signed datagrams must not grow host memory
    without bound (cap eviction drops the OLDEST entries: their ts check
    still guards them for the rest of the window in the common case, and
    an attacker who can flood the cache could also just deliver its own
    datagrams).
    """

    def __init__(self, key: bytes, window_s: float = 30.0,
                 clock=time.time, max_nonces: int = 65536,
                 audience: Optional[str] = None):
        self._key = key
        self._window = window_s
        self._clock = clock
        self._max = max_nonces
        self._audience = audience
        self._seen: dict = {}  # nonce -> (expiry, canonical bytes)

    def verify(self, msg: dict) -> None:
        """Raise AuthError unless `msg` is authentic, fresh, and — when
        this verifier knows its identity — addressed to it."""
        mac = msg.get("mac")
        if not isinstance(mac, str):
            raise AuthError("missing mac")
        body = {k: v for k, v in msg.items() if k != "mac"}
        canon = _canonical(body)
        expect = hmac.new(self._key, canon, hashlib.sha256).hexdigest()
        if not hmac.compare_digest(mac, expect):
            raise AuthError("bad mac")
        if self._audience is not None and body.get("aud") != self._audience:
            # Valid MAC, wrong recipient: a captured command replayed at
            # another host sharing the fleet key.
            raise AuthError(
                f"wrong audience {body.get('aud')!r} "
                f"(this endpoint is {self._audience!r})")
        now = self._clock()
        ts = body.get("ts")
        if not isinstance(ts, (int, float)) or abs(now - ts) > self._window:
            raise AuthError("stale timestamp")
        nonce = body.get("nonce")
        if not isinstance(nonce, str) or not nonce:
            raise AuthError("missing nonce")
        hit = self._seen.get(nonce)
        if hit is not None and hit[1] != canon:
            raise AuthError("replayed nonce")  # spliced onto a new body
        self._purge(now)
        self._seen[nonce] = (now + self._window, canon)

    def _purge(self, now: float) -> None:
        if len(self._seen) < self._max:
            return
        self._seen = {n: v for n, v in self._seen.items() if v[0] > now}
        while len(self._seen) >= self._max:  # still full: drop oldest
            self._seen.pop(next(iter(self._seen)))


def require_key_for_routable(bind: str, key_path: Optional[str],
                             what: str) -> None:
    """The startup policy: loopback stays keyless; anything routable
    without a key is refused before a socket ever binds."""
    if key_path is not None:
        return
    if bind in ("127.0.0.1", "localhost", "::1"):
        return
    raise SystemExit(
        f"{what} binds routable address {bind!r} without a key; give "
        "--*key FILE (shared HMAC key) or bind loopback — an "
        "unauthenticated routable management plane can stop serving "
        "or swap engine state (DEPLOYMENT.md, Trust boundary)")
