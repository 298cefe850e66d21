"""Native UDP ingest pump tests: real datagrams through the C++ receiver
thread into the jitter buffer, equivalence vs direct inserts, and the
counted-drop policy for malformed/transport events."""

import socket
import time

import numpy as np
import pytest

from lyra_tpu.tools.jitter_buffer import JitterBuffer
from lyra_tpu.tools.udp_ingest import UdpIngest, blast


def _dgram(slot: int, seq: int, payload: bytes) -> bytes:
    return slot.to_bytes(2, "big") + seq.to_bytes(4, "big") + payload


def _wait_for(pump, n, timeout=5.0):
    """Poll until the pump has filed n datagrams (receiver is async)."""
    deadline = time.time() + timeout
    while time.time() < deadline:
        if pump.stats()["datagrams"] >= n:
            return
        time.sleep(0.005)
    raise AssertionError(
        f"pump saw {pump.stats()['datagrams']} datagrams, wanted {n}")


def test_pump_matches_direct_inserts():
    """The same packet sequence through real UDP datagrams and through
    direct JitterBuffer.insert calls must drain identically (reorder,
    duplicate, and loss semantics are the jitter buffer's own)."""
    events = [  # (slot, seq, payload) — reorder on slot 1, dup on slot 0
        (0, 0, b"\x01" * 8), (1, 1, b"\x12" * 8), (1, 0, b"\x11" * 8),
        (0, 0, b"\x01" * 8), (2, 0, b"\x21" * 8),
    ]
    direct = JitterBuffer(capacity=4, packet_size=23, depth=8)
    for s in range(3):
        direct.add_stream(s)
    for slot, seq, payload in events:
        direct.insert(slot, seq, payload)

    with UdpIngest(JitterBuffer(capacity=4, packet_size=23, depth=8)) as pump:
        for s in range(3):
            pump.add_stream(s)
        tx = socket.socket(socket.AF_INET, socket.SOCK_DGRAM)
        for slot, seq, payload in events:
            tx.sendto(_dgram(slot, seq, payload), ("127.0.0.1", pump.port))
        tx.close()
        _wait_for(pump, len(events))

        for _ in range(3):  # drain several ticks; both must agree exactly
            pkts_p, recv_p, sizes_p = pump.collect()
            pkts_d, recv_d, sizes_d = direct.collect()
            np.testing.assert_array_equal(recv_p, recv_d)
            np.testing.assert_array_equal(sizes_p, sizes_d)
            np.testing.assert_array_equal(pkts_p, pkts_d)
        assert pump.stats()["insert_drops"] == 1  # the duplicate
        assert pump.jb_stats()["dup_drops"] == 1


def test_pump_counts_malformed_and_inactive():
    """Transport junk is a counted drop, never an exception: datagrams
    shorter than the header, kernel-truncated oversized datagrams, and
    packets for a never-admitted stream."""
    with UdpIngest(JitterBuffer(capacity=2, packet_size=23, depth=8)) as pump:
        pump.add_stream(0)
        tx = socket.socket(socket.AF_INET, socket.SOCK_DGRAM)
        tx.sendto(b"\x00", ("127.0.0.1", pump.port))  # short: no header
        tx.sendto(_dgram(0, 5, b"z" * 100), ("127.0.0.1", pump.port))  # trunc
        tx.sendto(_dgram(1, 0, b"x" * 8), ("127.0.0.1", pump.port))  # inactive
        tx.sendto(_dgram(0, 0, b"y" * 8), ("127.0.0.1", pump.port))  # good
        tx.close()
        _wait_for(pump, 2)  # short/truncated never count as filed
        deadline = time.time() + 5.0
        while pump.stats()["malformed_drops"] < 2 and time.time() < deadline:
            time.sleep(0.005)
        st = pump.stats()
        assert st == {"datagrams": 2, "malformed_drops": 2,
                      "insert_drops": 1}
        assert pump.jb_stats()["inactive_drops"] == 1
        pkts, received, sizes = pump.collect()
        assert received[0] and sizes[0] == 8 and pkts[0, 0] == ord("y")
        assert not received[1]

    # A buffer sized for packets the pump's receive buffers can't hold
    # intact is misconfiguration: loud, at construction.
    with pytest.raises(ValueError, match="max payload"):
        UdpIngest(JitterBuffer(capacity=2, packet_size=64, depth=8))


def test_pump_closed_is_loud_and_jb_survives():
    jb = JitterBuffer(capacity=2, packet_size=23, depth=8)
    pump = UdpIngest(jb)
    pump.add_stream(0)
    pump.close()
    pump.close()  # idempotent
    with pytest.raises(RuntimeError, match="closed"):
        pump.collect()
    # The underlying buffer is single-thread-usable again after close.
    jb.insert(0, 0, b"z" * 8)
    pkts, received, sizes = jb.collect()
    assert received[0] and pkts[0, 0] == ord("z")


def test_blast_feeds_the_pump():
    """The native sendmmsg sender drives the pump at benchmark rates; every
    stream slot receives its round-robin share."""
    streams = 8
    with UdpIngest(JitterBuffer(capacity=streams, packet_size=23,
                                depth=32)) as pump:
        for s in range(streams):
            pump.add_stream(s)
        n = streams * 32  # exactly fills each stream's ring, no overflow
        sent = blast(pump.port, n, payload_size=8, streams=streams)
        assert sent == n
        # Loopback under load may still shed packets; demand most arrive
        # and everything that arrived was filed.
        deadline = time.time() + 10.0
        while pump.stats()["datagrams"] < n and time.time() < deadline:
            time.sleep(0.01)
        st = pump.stats()
        assert st["datagrams"] >= n * 0.9
        assert st["malformed_drops"] == 0 and st["insert_drops"] == 0
        pkts, received, sizes = pump.collect()
        assert received.all() and (sizes == 8).all()

        # A payload past the codec pump's receive buffer is legal to send
        # (the PCM pump takes hop-sized payloads) but lands kernel-
        # truncated here: a counted malformed drop, never filed.
        assert blast(pump.port, 1, payload_size=999, streams=streams) == 1
        deadline = time.time() + 5.0
        while (pump.stats()["malformed_drops"] < 1
               and time.time() < deadline):
            time.sleep(0.01)
        assert pump.stats()["malformed_drops"] == 1

        with pytest.raises(ValueError):  # past the UDP maximum
            blast(pump.port, 1, payload_size=70000, streams=streams)


def test_pump_admission_churn_under_load():
    """Admission/removal and collects race the receiver thread while the
    blaster floods the socket: everything serializes on the pump lock, so
    nothing crashes, counters stay consistent, and a re-admitted slot
    starts clean at its new start_seq."""
    import threading

    streams = 16
    with UdpIngest(JitterBuffer(capacity=streams, packet_size=23,
                                depth=64)) as pump:
        for s in range(streams):
            pump.add_stream(s)
        n = streams * 64  # fits the rings exactly
        sender = threading.Thread(
            target=blast, args=(pump.port, n, 8, streams))
        sender.start()
        # Churn the last slot and collect ticks while datagrams flood in.
        for _ in range(50):
            pump.remove_stream(streams - 1)
            pump.add_stream(streams - 1, start_seq=10**6)
            pump.collect()
        sender.join()
        deadline = time.time() + 10.0
        while pump.stats()["datagrams"] < n and time.time() < deadline:
            time.sleep(0.01)
        st = pump.stats()
        assert st["datagrams"] >= n * 0.9  # loopback may shed under load
        assert st["malformed_drops"] == 0
        # The churned slot was re-admitted at a far-future start_seq, so
        # every datagram that reached it after a re-admission is a counted
        # late-drop; drop accounting must balance exactly: everything filed
        # either sits in/drained from a ring or is in a drop counter.
        jb = pump.jb_stats()
        assert st["insert_drops"] == (jb["late_drops"] + jb["dup_drops"]
                                      + jb["overflow_drops"]
                                      + jb["inactive_drops"])
        # Steady state after the storm: ticks drain cleanly.
        for _ in range(64 + 1):
            pkts, received, sizes = pump.collect()
        assert not received.any()  # rings fully drained


def test_egress_routes_per_slot_with_exact_payloads():
    """Native egress: per-slot routing, header layout, zero-copy payload
    exactness, inactive slots skipped, and loud geometry refusal."""
    from lyra_tpu.tools.udp_egress import UdpEgress

    rx_a = socket.socket(socket.AF_INET, socket.SOCK_DGRAM)
    rx_b = socket.socket(socket.AF_INET, socket.SOCK_DGRAM)
    for rx in (rx_a, rx_b):
        rx.bind(("127.0.0.1", 0))
        rx.settimeout(2.0)

    eg = UdpEgress(6)
    for slot in (0, 2, 4):
        eg.set_dest(slot, "127.0.0.1", rx_a.getsockname()[1])
    for slot in (1, 3):
        eg.set_dest(slot, "127.0.0.1", rx_b.getsockname()[1])
    # slot 5 has no destination: active traffic to it is a counted drop.

    rng = np.random.RandomState(2)
    wire = rng.randint(0, 256, (6, 23), np.int32).astype(np.uint8)
    sizes = np.array([8, 23, 0, 7, 1, 9], np.int32)
    n = eg.send(wire, sizes, seq=7)
    assert n == 4  # slots 0,1,3,4 (2 inactive, 5 unrouted)

    def drain(rx, want):
        got = {}
        while len(got) < want:
            d = rx.recvfrom(2048)[0]
            got[int.from_bytes(d[:2], "big")] = d
        return got

    got_a, got_b = drain(rx_a, 2), drain(rx_b, 2)
    assert set(got_a) == {0, 4} and set(got_b) == {1, 3}
    for slot, d in {**got_a, **got_b}.items():
        assert int.from_bytes(d[2:6], "big") == 7
        assert d[6:] == wire[slot, : sizes[slot]].tobytes()

    st = eg.stats()
    assert st == {"sent": 4, "no_dest_drops": 1, "kernel_drops": 0}

    # Loud refusals: oversize row, bad shapes, closed handle.
    with pytest.raises(ValueError, match="exceeds the wire stride"):
        eg.send(wire, np.full(6, 24, np.int32), 0)
    with pytest.raises(ValueError, match="does not match"):
        eg.send(wire, np.zeros(5, np.int32), 0)
    with pytest.raises(ValueError, match="bad egress destination"):
        eg.set_dest(99, "127.0.0.1", rx_a.getsockname()[1])
    eg.close()
    with pytest.raises(RuntimeError, match="closed"):
        eg.send(wire, sizes, 0)
    rx_a.close()
    rx_b.close()


def test_egress_int16_pcm_rows_reinterpret_as_bytes():
    """The decode server emits int16 PCM hops; egress views rows as bytes
    (the serve_main decode-mode downlink path)."""
    from lyra_tpu.tools.udp_egress import UdpEgress

    rx = socket.socket(socket.AF_INET, socket.SOCK_DGRAM)
    rx.bind(("127.0.0.1", 0))
    rx.settimeout(2.0)
    eg = UdpEgress(2, dest=("127.0.0.1", rx.getsockname()[1]))
    pcm = np.array([[-32768, -1, 0, 1, 32767],
                    [5, 6, 7, 8, 9]], np.int16)
    n = eg.send(pcm, np.full(2, 10, np.int32), seq=3)
    assert n == 2
    for _ in range(2):
        d = rx.recvfrom(2048)[0]
        slot = int.from_bytes(d[:2], "big")
        assert d[6:] == pcm[slot].tobytes()
    eg.close()
    rx.close()


def test_egress_reply_routing_from_pump_sources():
    """route_from_pump copies each slot's last uplink source into the
    egress table: downlink goes back where the uplink came from, sources
    update when a caller re-homes, and silent slots stay unrouted."""
    from lyra_tpu.tools.udp_egress import UdpEgress

    jb = JitterBuffer(capacity=4, packet_size=23, depth=4)
    with UdpIngest(jb) as pump:
        for s in range(4):
            pump.add_stream(s)
        # Two caller sockets; slot 3 never speaks.
        a = socket.socket(socket.AF_INET, socket.SOCK_DGRAM)
        b = socket.socket(socket.AF_INET, socket.SOCK_DGRAM)
        for sock in (a, b):
            sock.bind(("127.0.0.1", 0))
            sock.settimeout(2.0)
        for slot, sock in ((0, a), (1, b), (2, a)):
            sock.sendto(slot.to_bytes(2, "big") + (0).to_bytes(4, "big")
                        + b"\x00" * 8, ("127.0.0.1", pump.port))
        deadline = time.time() + 5
        while pump.stats()["datagrams"] < 3 and time.time() < deadline:
            time.sleep(0.01)

        eg = UdpEgress(4)
        assert eg.route_from_pump(pump) == 3
        wire = np.arange(4 * 5, dtype=np.uint8).reshape(4, 5)
        sizes = np.full(4, 5, np.int32)
        assert eg.send(wire, sizes, seq=9) == 3  # slot 3 unrouted
        got = {}
        for sock in (a, b):
            try:
                while True:
                    d = sock.recvfrom(2048)[0]
                    got[int.from_bytes(d[:2], "big")] = sock
            except socket.timeout:
                pass
        assert {s: got[s] for s in got} == {0: a, 1: b, 2: a}
        assert eg.stats()["no_dest_drops"] == 1

        # Caller 2 re-homes to socket b; the route follows.
        b.sendto((2).to_bytes(2, "big") + (1).to_bytes(4, "big")
                 + b"\x00" * 8, ("127.0.0.1", pump.port))
        deadline = time.time() + 5
        while pump.stats()["datagrams"] < 4 and time.time() < deadline:
            time.sleep(0.01)
        eg.route_from_pump(pump)
        eg.send(wire, np.array([0, 0, 5, 0], np.int32), seq=10)
        d = b.recvfrom(2048)[0]
        assert int.from_bytes(d[:2], "big") == 2
        eg.close()
        a.close()
        b.close()


def test_reply_route_cleared_on_slot_churn_and_rejected_sources_ignored():
    """Slot churn must not leak the new occupant's downlink to the
    departed caller, and datagrams the jitter buffer rejects must not
    repoint a route."""
    from lyra_tpu.tools.udp_egress import UdpEgress

    jb = JitterBuffer(capacity=2, packet_size=23, depth=4)
    with UdpIngest(jb) as pump:
        pump.add_stream(0)
        a = socket.socket(socket.AF_INET, socket.SOCK_DGRAM)
        b = socket.socket(socket.AF_INET, socket.SOCK_DGRAM)
        for sock in (a, b):
            sock.bind(("127.0.0.1", 0))
            sock.settimeout(0.5)

        def speak(sock, slot, seq):
            sock.sendto(slot.to_bytes(2, "big") + seq.to_bytes(4, "big")
                        + b"\x00" * 8, ("127.0.0.1", pump.port))

        speak(a, 0, 0)
        deadline = time.time() + 5
        while pump.stats()["datagrams"] < 1 and time.time() < deadline:
            time.sleep(0.01)
        eg = UdpEgress(2)
        assert eg.route_from_pump(pump) == 1

        # Slot 0 changes hands: A's route must die with the eviction even
        # though the new occupant hasn't spoken yet.
        pump.remove_stream(0)
        pump.add_stream(0)
        assert eg.route_from_pump(pump) == 0
        wire = np.ones((2, 4), np.uint8)
        assert eg.send(wire, np.array([4, 0], np.int32), seq=1) == 0
        assert eg.stats()["no_dest_drops"] == 1
        with pytest.raises(socket.timeout):
            a.recvfrom(2048)

        # A datagram the jitter buffer rejects (inactive slot 1) must not
        # create a route for it.
        speak(b, 1, 0)
        deadline = time.time() + 5
        while pump.stats()["datagrams"] < 2 and time.time() < deadline:
            time.sleep(0.01)
        assert pump.stats()["insert_drops"] == 1
        assert eg.route_from_pump(pump) == 0
        eg.close()
        a.close()
        b.close()

    # Capacity is bounded by the 2-byte wire slot field.
    with pytest.raises(ValueError, match="slot field"):
        UdpEgress(65537)


def test_egress_on_pump_sends_from_the_pump_port():
    """Reply-mode downlink must leave from the socket the uplink was sent
    to (NAT mappings are per 5-tuple)."""
    from lyra_tpu.tools.udp_egress import UdpEgress

    jb = JitterBuffer(capacity=1, packet_size=23, depth=4)
    with UdpIngest(jb) as pump:
        pump.add_stream(0)
        caller = socket.socket(socket.AF_INET, socket.SOCK_DGRAM)
        caller.bind(("127.0.0.1", 0))
        caller.settimeout(2.0)
        caller.sendto((0).to_bytes(2, "big") + (0).to_bytes(4, "big")
                      + b"\x00" * 8, ("127.0.0.1", pump.port))
        deadline = time.time() + 5
        while pump.stats()["datagrams"] < 1 and time.time() < deadline:
            time.sleep(0.01)
        eg = UdpEgress.on_pump(pump, 1)
        eg.route_from_pump(pump)
        assert eg.send(np.ones((1, 4), np.uint8),
                       np.array([4], np.int32), seq=2) == 1
        dgram, src = caller.recvfrom(2048)
        assert src[1] == pump.port  # the 5-tuple a NAT would have mapped
        assert dgram[6:] == b"\x01" * 4
        eg.close()  # before the pump: it borrows the pump's fd
        caller.close()


# ---------------------------------------------------------------------------
# PCM pump (the encode relay's native ingest: latest hop wins per slot)


def _pcm_dgram(slot: int, seq: int, val: int, n: int = 8) -> bytes:
    return _dgram(slot, seq, np.full(n, val, np.int16).tobytes())


def _wait_pcm(pump, n, timeout=5.0):
    deadline = time.time() + timeout
    while time.time() < deadline:
        if pump.stats()["datagrams"] >= n:
            return
        time.sleep(0.005)
    raise AssertionError(
        f"pcm pump saw {pump.stats()['datagrams']} datagrams, wanted {n}")


def test_pcm_pump_latest_wins_and_counts_drops():
    """Freshest hop per slot wins; a superseded (older-sequence) hop is a
    stale drop, a wrong-size hop or out-of-range slot is malformed, and
    collect_into only touches fresh rows and clears flags on delivery."""
    from lyra_tpu.tools.udp_ingest import PcmIngest

    with PcmIngest(4, 16) as pump:  # 8 int16 samples per hop
        tx = socket.socket(socket.AF_INET, socket.SOCK_DGRAM)
        for d in (_pcm_dgram(0, 1, 100), _pcm_dgram(1, 5, 200),
                  _pcm_dgram(1, 4, 150),       # stale: 5 already landed
                  _pcm_dgram(2, 7, 300, n=7),  # short hop: malformed
                  _pcm_dgram(9, 1, 1)):        # slot past capacity
            tx.sendto(d, ("127.0.0.1", pump.port))
        tx.close()
        _wait_pcm(pump, 3)

        audio = np.full((4, 8), -7, np.int16)
        fresh = pump.collect_into(audio)
        assert list(fresh) == [True, True, False, False]
        assert audio[0, 0] == 100 and audio[1, 0] == 200
        assert audio[2, 0] == -7  # non-fresh rows are left untouched
        assert pump.stats() == {"datagrams": 3, "malformed_drops": 2,
                                "stale_drops": 1, "resyncs": 0}
        # A hop is delivered to exactly one tick.
        assert not pump.collect_into(audio).any()


def test_pcm_pump_resyncs_after_stale_run():
    """A sender restarting at a lower sequence origin must not be deaf
    forever: after 3 consecutive stale hops the pump adopts the new
    origin (the jitter buffer's overflow-resync rule, PCM flavor)."""
    from lyra_tpu.tools.udp_ingest import PcmIngest

    with PcmIngest(2, 16) as pump:
        tx = socket.socket(socket.AF_INET, socket.SOCK_DGRAM)
        tx.sendto(_pcm_dgram(0, 1000, 1), ("127.0.0.1", pump.port))
        _wait_pcm(pump, 1)
        for seq, val in ((1, 9), (2, 10), (3, 11)):  # restarted sender
            tx.sendto(_pcm_dgram(0, seq, val), ("127.0.0.1", pump.port))
        tx.close()
        _wait_pcm(pump, 4)
        audio = np.zeros((2, 8), np.int16)
        fresh = pump.collect_into(audio)
        assert fresh[0] and audio[0, 0] == 11  # seqs 1,2 dropped; 3 lands
        st = pump.stats()
        assert st["resyncs"] == 1 and st["stale_drops"] == 2


def test_pcm_pump_reset_slot_clears_clock_and_route():
    """Slot churn on the encode relay: the next occupant must inherit
    neither the sequence clock, nor a pending hop, nor the reply route."""
    from lyra_tpu.tools.udp_egress import UdpEgress
    from lyra_tpu.tools.udp_ingest import PcmIngest

    with PcmIngest(2, 16) as pump:
        caller = socket.socket(socket.AF_INET, socket.SOCK_DGRAM)
        caller.bind(("127.0.0.1", 0))
        caller.settimeout(0.5)
        caller.sendto(_pcm_dgram(0, 500, 1), ("127.0.0.1", pump.port))
        _wait_pcm(pump, 1)
        eg = UdpEgress(2)
        assert eg.route_from_pump(pump) == 1

        pump.reset_slot(0)
        assert eg.route_from_pump(pump) == 0  # route died with the churn
        audio = np.zeros((2, 8), np.int16)
        assert not pump.collect_into(audio).any()  # pending hop cleared

        # Sequence clock restarts at zero without burning the resync run.
        caller.sendto(_pcm_dgram(0, 0, 77), ("127.0.0.1", pump.port))
        _wait_pcm(pump, 2)
        fresh = pump.collect_into(audio)
        assert fresh[0] and audio[0, 0] == 77
        assert pump.stats()["stale_drops"] == 0
        eg.close()
        caller.close()


def test_pcm_pump_reply_routing_round_trip():
    """The encode relay's reply shape: egress rides the PCM pump's socket
    and routes each slot's packets back to its last uplink source."""
    from lyra_tpu.tools.udp_egress import UdpEgress
    from lyra_tpu.tools.udp_ingest import PcmIngest

    with PcmIngest(2, 16) as pump:
        caller = socket.socket(socket.AF_INET, socket.SOCK_DGRAM)
        caller.bind(("127.0.0.1", 0))
        caller.settimeout(2.0)
        caller.sendto(_pcm_dgram(1, 0, 5), ("127.0.0.1", pump.port))
        _wait_pcm(pump, 1)
        eg = UdpEgress.on_pump(pump, 2)
        assert eg.route_from_pump(pump) == 1
        wire = np.arange(2 * 4, dtype=np.uint8).reshape(2, 4)
        assert eg.send(wire, np.array([0, 4], np.int32), seq=3) == 1
        dgram, src = caller.recvfrom(2048)
        assert src[1] == pump.port  # reply leaves from the uplink socket
        assert int.from_bytes(dgram[:2], "big") == 1
        assert dgram[6:] == bytes(wire[1])
        eg.close()  # before the pump: it borrows the pump's fd
        caller.close()


def test_pcm_pump_validation_is_loud():
    """Bad geometry / misuse fails at the call site, never silently."""
    from lyra_tpu.tools.udp_ingest import PcmIngest

    for capacity, payload in ((0, 16), (2, 0), (2, 70000)):
        with pytest.raises(ValueError, match="PCM pump"):
            PcmIngest(capacity, payload)
    pump = PcmIngest(2, 16)
    with pytest.raises(ValueError, match="C-contiguous"):
        pump.collect_into(np.zeros((2, 4), np.int16))  # wrong byte count
    with pytest.raises(ValueError, match="bad stream slot"):
        pump.reset_slot(5)
    pump.close()
    with pytest.raises(RuntimeError, match="closed"):
        pump.collect_into(np.zeros((2, 8), np.int16))


def test_blast_drives_pcm_payload_sizes():
    """The native bench sender handles PCM-hop payloads (past the codec
    pump's 58-byte cap) — the egress bench's sender-side twin."""
    from lyra_tpu.tools.udp_ingest import PcmIngest, blast

    with PcmIngest(4, 640) as pump:  # a real 16 kHz hop: 320 int16
        assert blast(pump.port, 200, 640, 4, seq0=0) == 200
        deadline = time.time() + 5
        audio = np.zeros((4, 320), np.int16)
        while time.time() < deadline:
            if pump.collect_into(audio).sum() == 4:
                break
            time.sleep(0.01)
        else:
            raise AssertionError("blast hops never landed on all slots")
        assert pump.stats()["malformed_drops"] == 0


def test_sink_pump_counts_and_files_nothing():
    """The measurement sink (benchmarks/ingest_bench.py --decompose) runs
    the real receive machinery but files nothing: every well-formed
    datagram is a counted drop, short/truncated ones are malformed, and
    validation is loud."""
    from lyra_tpu.tools.udp_ingest import SinkIngest

    with SinkIngest(max_payload=8) as sink:
        tx = socket.socket(socket.AF_INET, socket.SOCK_DGRAM)
        tx.sendto(_dgram(3, 7, b"\x01" * 8), ("127.0.0.1", sink.port))
        tx.sendto(b"\x00", ("127.0.0.1", sink.port))          # short: malformed
        tx.sendto(_dgram(0, 0, b"\x02" * 40), ("127.0.0.1", sink.port))  # trunc
        tx.close()
        deadline = time.time() + 5
        while time.time() < deadline:
            st = sink.stats()
            if st["datagrams"] + st["malformed_drops"] >= 3:
                break
            time.sleep(0.005)
        assert sink.stats() == {"datagrams": 1, "malformed_drops": 2,
                                "insert_drops": 1}
    with pytest.raises(RuntimeError, match="closed"):
        sink.stats()
    with pytest.raises(ValueError, match="sink pump"):
        SinkIngest(max_payload=70000)


def test_red_framing_heals_lost_datagrams():
    """RED wire mode end to end: datagram t carries packet t-1, the
    network eats one datagram entirely, and every sequence still plays —
    the successor's redundant copy heals the hole (counted as a
    red_heal), with zero pollution of the late/dup transport counters."""
    from lyra_tpu import packet as pkt

    with UdpIngest(JitterBuffer(capacity=2, packet_size=23, depth=8)) as pump:
        pump.set_red(1)
        pump.add_stream(0, playout_delay=2)  # >= offset+1 for the heal
        tx = socket.socket(socket.AF_INET, socket.SOCK_DGRAM)
        packets = [bytes([0x10 + t]) * 8 for t in range(5)]
        sent = 0
        for t in range(5):
            if t == 2:
                continue  # the network eats datagram 2
            payload = pkt.build_red(packets[t],
                                    packets[t - 1] if t else b"")
            tx.sendto(_dgram(0, t, payload), ("127.0.0.1", pump.port))
            sent += 1
        tx.close()
        _wait_for(pump, sent)
        got = []
        for _ in range(2 + 5):
            out, received, sizes = pump.collect()
            if received[0]:
                got.append(bytes(out[0, :sizes[0]]))
        assert got == packets  # all 5 played, incl. the eaten sequence 2
        assert pump.red_heals == 1
        st = pump.jb_stats()
        assert st["late_drops"] == 0 and st["dup_drops"] == 0
        assert pump.stats()["insert_drops"] == 0


def test_red_ragged_payload_is_malformed():
    """A RED datagram whose blocks don't tile the payload is garbage —
    a counted malformed drop, never filed, never an exception."""
    with UdpIngest(JitterBuffer(capacity=2, packet_size=23, depth=8)) as pump:
        pump.set_red(1)
        pump.add_stream(0)
        tx = socket.socket(socket.AF_INET, socket.SOCK_DGRAM)
        tx.sendto(_dgram(0, 0, b"\x08" + b"x" * 4), ("127.0.0.1", pump.port))
        tx.sendto(_dgram(0, 0, b""), ("127.0.0.1", pump.port))  # no prefixes
        from lyra_tpu import packet as pkt
        tx.sendto(_dgram(0, 0, pkt.build_red(b"y" * 8)),
                  ("127.0.0.1", pump.port))  # one good one
        tx.close()
        _wait_for(pump, 1)
        deadline = time.time() + 5.0
        while pump.stats()["malformed_drops"] < 2 and time.time() < deadline:
            time.sleep(0.005)
        st = pump.stats()
        assert st["datagrams"] == 1 and st["malformed_drops"] == 2
        _, received, sizes = pump.collect()
        assert received[0] and sizes[0] == 8
        with pytest.raises(ValueError):
            pump.set_red(9)  # out of range, refused loudly
