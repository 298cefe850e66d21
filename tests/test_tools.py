"""Packet-loss model and CLI tests.

Mirrors the reference's statistical Gilbert test (reference:
lyra/gilbert_model_test.cc:39 with a fixed seed), the fixed-pattern
rounding tests (lyra/fixed_packet_loss_model_test.cc), and the
encoder/decoder CLI round-trip tests (lyra/cli_example/*_test.cc).
"""

import os

import numpy as np
import pytest

from lyra_tpu import config
from lyra_tpu.tools.packet_loss import (
    FixedPacketLossModel,
    GilbertModel,
    PacketLossPattern,
)


def test_gilbert_rejects_bad_params():
    assert GilbertModel.create(-0.1, 2.0) is None
    assert GilbertModel.create(0.5, 0.5) is None
    assert GilbertModel.create(0.95, 2.0) is None  # > burst/(burst+1)


def test_gilbert_statistics_converge():
    rate, burst = 0.2, 2.0
    m = GilbertModel.create(rate, burst, seed=1234)
    n = 200_000
    outcomes = np.array([m.is_packet_received() for _ in range(n)])
    measured_rate = 1.0 - outcomes.mean()
    assert abs(measured_rate - rate) < 0.01

    # Mean length of loss bursts ~ average_burst_length.
    losses = np.flatnonzero(~outcomes)
    if losses.size:
        burst_breaks = np.flatnonzero(np.diff(losses) > 1)
        num_bursts = burst_breaks.size + 1
        assert abs(losses.size / num_bursts - burst) < 0.1


def test_gilbert_no_loss_with_zero_rate():
    m = GilbertModel.create(0.0, 1.0)
    assert all(m.is_packet_received() for _ in range(1000))


def test_fixed_pattern_rounds_to_packet_boundaries():
    # 16 kHz, 320-sample hops => packets are 20 ms. A burst at 0.03 s lasting
    # 0.03 s covers packets ceil(1.5)=2 .. ceil(3)=3 (exclusive), i.e. just #2.
    m = FixedPacketLossModel(16000, 320, [0.03], [0.03])
    got = [m.is_packet_received() for _ in range(5)]
    assert got == [True, True, False, True, True]


def test_fixed_pattern_multiple_bursts():
    m = FixedPacketLossModel(16000, 320, [0.0, 0.08], [0.02, 0.04])
    got = [m.is_packet_received() for _ in range(8)]
    assert got == [False, True, True, True, False, False, True, True]


def test_packet_loss_pattern_parse_roundtrip():
    p = PacketLossPattern.parse("0.5,1.5:0.2,0.25")
    assert p.starts == [0.5, 1.5] and p.durations == [0.2, 0.25]
    assert PacketLossPattern.parse(str(p)).starts == p.starts
    assert PacketLossPattern.parse("").starts == []
    with pytest.raises(ValueError):
        PacketLossPattern.parse("1,2:3")


@pytest.mark.parametrize("bitrate", [3200])
def test_cli_encode_decode_roundtrip(tmp_path, model_path, testdata_path, bitrate):
    from lyra_tpu.tools import decoder_main, encoder_main

    wav_in = os.path.join(testdata_path, "sample1_16kHz.wav")
    rc = encoder_main.main([
        "--input_path", wav_in,
        "--output_dir", str(tmp_path),
        "--bitrate", str(bitrate),
        "--model_path", model_path,
    ])
    assert rc == 0
    lyra_path = tmp_path / "sample1_16kHz.lyra"
    size = lyra_path.stat().st_size
    assert size > 0 and size % config.bitrate_to_packet_size(bitrate) == 0

    rc = decoder_main.main([
        "--encoded_path", str(lyra_path),
        "--output_dir", str(tmp_path),
        "--bitrate", str(bitrate),
        "--fixed_packet_loss_pattern", "0.5:0.1",
        "--model_path", model_path,
    ])
    assert rc == 0
    from lyra_tpu.utils import wav as wavmod

    out = wavmod.read_wav_int16(str(tmp_path / "sample1_16kHz_decoded.wav"))
    assert out.sample_rate_hz == 16000
    n_packets = size // config.bitrate_to_packet_size(bitrate)
    assert out.samples.size == n_packets * 320


def test_decode_reference_golden_bitstreams(tmp_path, model_path, testdata_path):
    """Wire compatibility: packets encoded by the reference C++ encoder
    (shipped golden fixtures, reference: lyra/testdata/*.lyra +
    lyra/cli_example/decoder_main_lib_test.cc:77-165) must decode in this
    framework.  The fixtures carry stray trailing bytes that must be
    trimmed, matching the reference CLI's behavior."""
    from lyra_tpu.tools import decoder_main
    from lyra_tpu.utils import wav as wavmod

    cases = {"one_encoded_packet_16khz": 1, "two_encoded_packets_16khz": 2}
    for stem, n_packets in cases.items():
        rc = decoder_main.main([
            "--encoded_path", os.path.join(testdata_path, stem + ".lyra"),
            "--output_dir", str(tmp_path),
            "--bitrate", "6000",
            "--randomize_num_samples_requested",
            "--model_path", model_path,
        ])
        assert rc == 0
        out = wavmod.read_wav_int16(str(tmp_path / (stem + "_decoded.wav")))
        assert out.samples.size == n_packets * 320
        assert out.sample_rate_hz == 16000

    rc = decoder_main.main([
        "--encoded_path", os.path.join(testdata_path, "incomplete_encoded_packet.lyra"),
        "--output_dir", str(tmp_path),
        "--bitrate", "6000",
        "--model_path", model_path,
    ])
    assert rc == 1  # 9 bytes < one packet -> empty after trimming

    rc = decoder_main.main([
        "--encoded_path", os.path.join(testdata_path, "no_encoded_packet.lyra"),
        "--output_dir", str(tmp_path),
        "--bitrate", "6000",
        "--model_path", model_path,
    ])
    assert rc == 1


def test_encoder_main_rejects_invalid_wav(tmp_path, model_path, testdata_path):
    from lyra_tpu.tools import encoder_main

    rc = encoder_main.main([
        "--input_path", os.path.join(testdata_path, "invalid.wav"),
        "--output_dir", str(tmp_path),
        "--model_path", model_path,
    ])
    assert rc == 1


def test_encoder_dtx_emits_empty_packets_on_noise(model_path):
    """DTX mechanics end to end (reference: lyra/lyra_encoder.cc:131-141):
    when the noise estimator classifies a hop as noise the encoder emits a
    0-byte packet and the SoundStream conv state freezes.  The noise
    decision itself is pinned by its own estimator tests (the reference
    never guarantees raw white noise trips the gate either — its tests warm
    the estimator through a gate-bypassing peer,
    lyra/noise_estimator_test.cc:171-196)."""
    import jax.numpy as jnp

    from lyra_tpu.codec.encoder import LyraEncoder

    rng = np.random.RandomState(7)
    enc = LyraEncoder(16000, bitrate=3200, enable_dtx=True,
                      model_path=model_path)
    hop = (rng.uniform(-1, 1, 320) * 1000).astype(np.int16)

    pkt = enc.encode(hop)
    assert len(pkt) == config.packet_size(64)  # speech at first

    # Force the classifier into "everything is noise" and observe DTX.
    state = enc._engine._state_with_bound(enc._state, 1e6)
    enc._state = state
    ss_before = {k: np.asarray(v)
                 for k, v in enc._state["soundstream"].items()}
    pkt = enc.encode(hop)
    assert pkt == b""
    for k, v in enc._state["soundstream"].items():
        np.testing.assert_array_equal(np.asarray(v), ss_before[k])

    # Collapse the bound again: back to normal packets + state advancing.
    enc._state = enc._engine._state_with_bound(enc._state, 0.0)
    pkt = enc.encode(hop)
    assert len(pkt) == config.packet_size(64)


def test_decoder_main_rejects_empty_file(tmp_path, model_path):
    from lyra_tpu.tools import decoder_main

    empty = tmp_path / "empty.lyra"
    empty.write_bytes(b"\x01\x02")  # < one packet -> truncates to empty
    rc = decoder_main.main([
        "--encoded_path", str(empty),
        "--output_dir", str(tmp_path),
        "--model_path", model_path,
    ])
    assert rc == 1


@pytest.mark.full
def test_examples_run_end_to_end(tmp_path, monkeypatch, model_path,
                                 testdata_path):
    del model_path, testdata_path  # gate: skip when assets are absent
    """Both examples complete on tiny configurations: the loopback call
    (network sim + jitter buffer + PLC) and the drain/migrate demo (whose
    own exit code asserts bit-exact post-migration audio)."""
    import importlib

    examples = os.path.join(os.path.dirname(__file__), "..", "examples")
    monkeypatch.syspath_prepend(examples)
    loopback = importlib.import_module("loopback_call")
    migrate = importlib.import_module("drain_migrate")

    assert loopback.main(["--seconds", "0.2", "--callers", "1",
                          "--out_dir", str(tmp_path / "call")]) == 0
    assert (tmp_path / "call" / "caller0.wav").exists()

    assert migrate.main(["--callers", "1", "--ticks_before_drain", "4",
                         "--ticks_after", "4",
                         "--out_dir", str(tmp_path / "mig")]) == 0
    assert (tmp_path / "mig" / "caller0.wav").exists()


def test_udp_call_example(tmp_path, monkeypatch, model_path, testdata_path,
                          capsys):
    del model_path, testdata_path  # gate: skip when assets are absent
    """The real-transport example (UDP datagrams → jitter buffer → async
    device wire decode) completes and reports a measured latency figure."""
    import importlib

    examples = os.path.join(os.path.dirname(__file__), "..", "examples")
    monkeypatch.syspath_prepend(examples)
    udp_call = importlib.import_module("udp_call")

    assert udp_call.main(["--seconds", "0.4", "--callers", "2",
                          "--loss", "0.0",
                          "--out_dir", str(tmp_path / "udp")]) == 0
    out = capsys.readouterr().out
    assert (tmp_path / "udp" / "caller1.wav").exists()
    assert "wire-send→playout latency" in out
    # Zero network loss on loopback: every sent hop's latency is matched.
    assert "0 dropped" in out

    # Mixed-bitrate fleet rides the same transport (device wire path with
    # per-row sizes through the jitter buffer).
    assert udp_call.main(["--seconds", "0.4", "--callers", "3",
                          "--loss", "0.0", "--mixed",
                          "--out_dir", str(tmp_path / "udpm")]) == 0
    assert (tmp_path / "udpm" / "caller2.wav").exists()


def test_serve_main_end_to_end(model_path, tmp_path):
    """The serve CLI stood up in-process: real lyra packets over UDP in,
    decoded PCM hops echoed over UDP out (native ingest path).  Also the
    operator stats exit: --stats appends machine-readable JSON lines
    (tick percentiles, occupancy, drop counters by cause) and a final
    record at shutdown."""
    import json
    import socket
    import threading
    import time

    from lyra_tpu import packet as pkt
    from lyra_tpu.tools import serve_main

    stats_path = tmp_path / "serve_stats.jsonl"

    echo_rx = socket.socket(socket.AF_INET, socket.SOCK_DGRAM)
    echo_rx.bind(("127.0.0.1", 0))
    echo_rx.settimeout(0.05)
    echo_port = echo_rx.getsockname()[1]

    port_box = {}
    ready = threading.Event()
    stop = threading.Event()

    def on_ready(port):
        port_box["port"] = port
        ready.set()

    th = threading.Thread(target=serve_main.main, kwargs=dict(
        argv=["--capacity", "4", "--seconds", "0", "--max_bitrate", "3200",
              "--model_path", model_path, "--playout_delay", "1",
              "--echo", f"127.0.0.1:{echo_port}", "--report_every", "30",
              "--stats", str(stats_path), "--adaptive", "1:6:25"],
        _on_ready=on_ready, _stop=stop))
    th.start()
    try:
        assert ready.wait(60), "server never bound its port"
        tx = socket.socket(socket.AF_INET, socket.SOCK_DGRAM)
        wire = pkt.pack_indices_batch(np.zeros((4, 16), np.int32), 64)

        got = None
        deadline = time.time() + 180  # first tick compiles the program
        seq = 0
        while got is None and time.time() < deadline:
            for slot in range(4):
                tx.sendto(slot.to_bytes(2, "big") + seq.to_bytes(4, "big")
                          + wire[slot].tobytes(),
                          ("127.0.0.1", port_box["port"]))
            seq += 1
            try:
                got = echo_rx.recvfrom(4096)[0]
            except socket.timeout:
                pass
        tx.close()
        assert got is not None, "no decoded PCM echoed within the deadline"
        assert len(got) == 6 + 320 * 2  # header + one int16 hop @16 kHz
        hop = np.frombuffer(got[6:], np.int16)
        assert hop.shape == (320,)
    finally:
        stop.set()
        th.join(timeout=120)
        assert not th.is_alive(), "serve loop failed to stop"
        echo_rx.close()

    # The stats exit: at least the final shutdown record, every field an
    # operator needs, all JSON-parseable.
    records = [json.loads(line)
               for line in stats_path.read_text().splitlines()]
    assert records, "no stats records written"
    final = records[-1]
    assert final["final"] is True and final["mode"] == "decode"
    assert final["ticks"] > 0 and final["capacity"] == 4
    assert final["budget_ms"] == 20.0 and final["tick_ms_p95"] > 0
    assert 0 <= final["occupied"] <= 4
    for group, key in (("ingest", "datagrams"), ("jb", "late_drops"),
                       ("egress", "sent")):
        assert key in final[group], f"missing {group}.{key}: {final}"
    assert final["ingest"]["datagrams"] > 0  # we really sent packets
    assert final["egress"]["sent"] > 0  # and PCM really left the host
    # --adaptive surfaces the playout-latency position to the operator.
    assert final["adapt"]["active_streams"] == 4
    assert 1 <= final["adapt"]["delay_min"] <= final["adapt"]["delay_max"] <= 6


@pytest.mark.parametrize("ingest", ["native", "python"])
def test_serve_main_encode_relay(model_path, ingest):
    """The encode relay in-process: PCM hops over UDP in, lyra packets out
    at the configured bitrate; a slot with no fresh PCM is a counted gap,
    not an error.  Both receive paths: the native PCM pump (latest hop
    wins, C++ recvmmsg) and the per-datagram Python drain."""
    import socket
    import threading
    import time

    from lyra_tpu import packet as pkt
    from lyra_tpu.tools import serve_main

    echo_rx = socket.socket(socket.AF_INET, socket.SOCK_DGRAM)
    echo_rx.bind(("127.0.0.1", 0))
    echo_rx.settimeout(0.05)
    echo_port = echo_rx.getsockname()[1]

    port_box = {}
    ready = threading.Event()
    stop = threading.Event()
    th = threading.Thread(target=serve_main.main, kwargs=dict(
        argv=["--mode", "encode", "--capacity", "2", "--seconds", "0",
              "--bitrate", "3200", "--max_bitrate", "3200",
              "--model_path", model_path, "--report_every", "30",
              "--ingest", ingest, "--echo", f"127.0.0.1:{echo_port}"],
        _on_ready=lambda port: (port_box.update(port=port), ready.set()),
        _stop=stop))
    th.start()
    try:
        assert ready.wait(60), "encode server never bound its port"
        tx = socket.socket(socket.AF_INET, socket.SOCK_DGRAM)
        t = np.arange(320) / 16000.0
        hop = (8000 * np.sin(2 * np.pi * 440 * t)).astype(np.int16)

        got = None
        deadline = time.time() + 180  # first tick compiles the program
        seq = 0
        while got is None and time.time() < deadline:
            tx.sendto((0).to_bytes(2, "big") + seq.to_bytes(4, "big")
                      + hop.tobytes(), ("127.0.0.1", port_box["port"]))
            # slot 1 gets nothing: silence + pcm_gap, never an exception
            seq += 1
            try:
                got = echo_rx.recvfrom(4096)[0]
            except socket.timeout:
                pass
        tx.close()
        assert got is not None, "no packet relayed within the deadline"
        assert len(got) == 6 + config.packet_size(64)  # 3.2 kbps packet
        indices = pkt.unpack_indices(got[6:])  # well-formed on the wire
        assert indices.shape == (16,)
    finally:
        stop.set()
        th.join(timeout=120)
        assert not th.is_alive(), "encode loop failed to stop"
        echo_rx.close()


def test_serve_main_external_rate_relay(model_path):
    """--sample_rate_hz on the encode relay: inbound hops are external-
    rate-sized (8 kHz → 160 int16 samples), the engine resamples to
    16 kHz on device, and the native PCM pump's datagram size follows.
    Bridge mode refuses the flag — its I/O is packets both ways."""
    import socket
    import threading
    import time

    from lyra_tpu import packet as pkt
    from lyra_tpu.tools import serve_main

    with pytest.raises(SystemExit):
        serve_main.main(["--mode", "bridge", "--sample_rate_hz", "8000",
                         "--model_path", model_path])

    echo_rx = socket.socket(socket.AF_INET, socket.SOCK_DGRAM)
    echo_rx.bind(("127.0.0.1", 0))
    echo_rx.settimeout(0.05)
    echo_port = echo_rx.getsockname()[1]

    port_box = {}
    ready = threading.Event()
    stop = threading.Event()
    th = threading.Thread(target=serve_main.main, kwargs=dict(
        argv=["--mode", "encode", "--capacity", "2", "--seconds", "0",
              "--bitrate", "3200", "--max_bitrate", "3200",
              "--sample_rate_hz", "8000", "--model_path", model_path,
              "--report_every", "30", "--ingest", "native",
              "--echo", f"127.0.0.1:{echo_port}"],
        _on_ready=lambda port: (port_box.update(port=port), ready.set()),
        _stop=stop))
    th.start()
    try:
        assert ready.wait(60), "encode server never bound its port"
        tx = socket.socket(socket.AF_INET, socket.SOCK_DGRAM)
        t = np.arange(160) / 8000.0  # one 20 ms hop at the external rate
        hop = (8000 * np.sin(2 * np.pi * 440 * t)).astype(np.int16)

        got = None
        deadline = time.time() + 180
        seq = 0
        while got is None and time.time() < deadline:
            tx.sendto((0).to_bytes(2, "big") + seq.to_bytes(4, "big")
                      + hop.tobytes(), ("127.0.0.1", port_box["port"]))
            seq += 1
            try:
                got = echo_rx.recvfrom(4096)[0]
            except socket.timeout:
                pass
        tx.close()
        assert got is not None, "no packet relayed within the deadline"
        assert len(got) == 6 + config.packet_size(64)
        assert pkt.unpack_indices(got[6:]).shape == (16,)
    finally:
        stop.set()
        th.join(timeout=120)
        assert not th.is_alive(), "encode loop failed to stop"
        echo_rx.close()


def test_serve_main_encode_reply_routing(model_path):
    """--echo reply on the encode relay: each slot's packets go back to
    the socket its PCM uplink came from, leaving from the PCM pump's own
    port (the NAT 5-tuple), with no --echo destination configured."""
    import socket
    import threading
    import time

    from lyra_tpu import packet as pkt
    from lyra_tpu.tools import serve_main

    port_box = {}
    ready = threading.Event()
    stop = threading.Event()
    th = threading.Thread(target=serve_main.main, kwargs=dict(
        argv=["--mode", "encode", "--capacity", "2", "--seconds", "0",
              "--bitrate", "3200", "--max_bitrate", "3200",
              "--model_path", model_path, "--report_every", "30",
              "--ingest", "native", "--egress", "native", "--echo",
              "reply"],
        _on_ready=lambda port: (port_box.update(port=port), ready.set()),
        _stop=stop))
    th.start()
    try:
        assert ready.wait(60), "encode server never bound its port"
        caller = socket.socket(socket.AF_INET, socket.SOCK_DGRAM)
        caller.bind(("127.0.0.1", 0))
        caller.settimeout(0.05)
        t = np.arange(320) / 16000.0
        hop = (8000 * np.sin(2 * np.pi * 330 * t)).astype(np.int16)

        got = src = None
        deadline = time.time() + 180  # first tick compiles the program
        seq = 0
        while got is None and time.time() < deadline:
            caller.sendto((1).to_bytes(2, "big") + seq.to_bytes(4, "big")
                          + hop.tobytes(), ("127.0.0.1", port_box["port"]))
            seq += 1
            try:
                got, src = caller.recvfrom(4096)
            except socket.timeout:
                pass
        assert got is not None, "no reply packet within the deadline"
        assert src[1] == port_box["port"]  # left from the uplink socket
        assert int.from_bytes(got[:2], "big") == 1
        assert len(got) == 6 + config.packet_size(64)
        assert pkt.unpack_indices(got[6:]).shape == (16,)
        caller.close()
    finally:
        stop.set()
        th.join(timeout=120)
        assert not th.is_alive(), "encode loop failed to stop"


def test_serve_main_duplex_chain(model_path):
    """The two serve modes chained over real UDP — the full transcode
    path as two independent servers: PCM hops -> encode relay -> lyra
    packets -> decode server -> PCM hops.  The encode relay's output
    datagrams are exactly the decode server's input format, so --echo
    simply points one at the other."""
    import socket
    import threading
    import time

    from lyra_tpu.tools import serve_main

    sink = socket.socket(socket.AF_INET, socket.SOCK_DGRAM)
    sink.bind(("127.0.0.1", 0))
    sink.settimeout(0.05)
    sink_port = sink.getsockname()[1]

    stop = threading.Event()
    threads, boxes = [], []

    def start(argv):
        box, ready = {}, threading.Event()
        th = threading.Thread(target=serve_main.main, kwargs=dict(
            argv=argv,
            _on_ready=lambda port: (box.update(port=port), ready.set()),
            _stop=stop))
        th.start()
        threads.append(th)
        boxes.append(box)
        assert ready.wait(60), "server never bound its port"
        return box

    try:
        dec_box = start(["--capacity", "2", "--seconds", "0",
                         "--max_bitrate", "3200", "--playout_delay", "1",
                         "--model_path", model_path, "--report_every", "30",
                         "--echo", f"127.0.0.1:{sink_port}"])
        enc_box = start(["--mode", "encode", "--capacity", "2",
                         "--seconds", "0", "--bitrate", "3200",
                         "--max_bitrate", "3200", "--model_path", model_path,
                         "--report_every", "30",
                         "--echo", f"127.0.0.1:{dec_box['port']}"])

        tx = socket.socket(socket.AF_INET, socket.SOCK_DGRAM)
        t = np.arange(320) / 16000.0
        hop = (8000 * np.sin(2 * np.pi * 440 * t)).astype(np.int16)
        got = None
        deadline = time.time() + 240
        seq = 0
        while got is None and time.time() < deadline:
            for slot in range(2):
                tx.sendto(slot.to_bytes(2, "big") + seq.to_bytes(4, "big")
                          + hop.tobytes(), ("127.0.0.1", enc_box["port"]))
            seq += 1
            try:
                got = sink.recvfrom(4096)[0]
            except socket.timeout:
                pass
        tx.close()
        assert got is not None, "no PCM made it through the duplex chain"
        assert len(got) == 6 + 320 * 2
        out_hop = np.frombuffer(got[6:], np.int16)
        assert out_hop.shape == (320,)
    finally:
        stop.set()
        for th in threads:
            th.join(timeout=120)
            assert not th.is_alive(), "a serve loop failed to stop"
        sink.close()


def test_serve_main_bridge_mode(model_path):
    """The conference bridge stood up in-process: uplink lyra packets over
    UDP in, per-participant mixed downlink lyra packets echoed out (rooms
    are consecutive --room_size groups; mix semantics are pinned in
    tests/test_conference.py — this drives the runnable server shell)."""
    import socket
    import threading
    import time

    from lyra_tpu import packet as pkt
    from lyra_tpu.tools import serve_main

    echo_rx = socket.socket(socket.AF_INET, socket.SOCK_DGRAM)
    echo_rx.bind(("127.0.0.1", 0))
    echo_rx.settimeout(0.05)
    echo_port = echo_rx.getsockname()[1]

    port_box = {}
    ready = threading.Event()
    stop = threading.Event()
    th = threading.Thread(target=serve_main.main, kwargs=dict(
        argv=["--mode", "bridge", "--capacity", "4", "--room_size", "2",
              "--seconds", "0", "--bitrate", "3200", "--max_bitrate", "3200",
              "--model_path", model_path, "--playout_delay", "1",
              "--ingest", "python", "--report_every", "30",
              "--echo", f"127.0.0.1:{echo_port}"],
        _on_ready=lambda port: (port_box.update(port=port), ready.set()),
        _stop=stop))
    th.start()
    try:
        assert ready.wait(120), "bridge never bound its port"
        tx = socket.socket(socket.AF_INET, socket.SOCK_DGRAM)
        wire = pkt.pack_indices_batch(np.zeros((4, 16), np.int32), 64)

        got = {}
        deadline = time.time() + 240  # first tick compiles three programs
        seq = 0
        while len(got) < 4 and time.time() < deadline:
            for slot in range(4):
                tx.sendto(slot.to_bytes(2, "big") + seq.to_bytes(4, "big")
                          + wire[slot].tobytes(),
                          ("127.0.0.1", port_box["port"]))
            seq += 1
            try:
                dgram = echo_rx.recvfrom(4096)[0]
                got[int.from_bytes(dgram[:2], "big")] = dgram
            except socket.timeout:
                pass
        tx.close()
        assert len(got) == 4, f"downlink only reached slots {sorted(got)}"
        for slot, dgram in got.items():
            assert len(dgram) == 6 + config.packet_size(64)
            assert pkt.unpack_indices(dgram[6:]).shape == (16,)
    finally:
        stop.set()
        th.join(timeout=120)
        assert not th.is_alive(), "bridge loop failed to stop"
        echo_rx.close()


def test_serve_main_bridge_sharded_over_mesh(model_path):
    """--devices 8: the same bridge shell with the stream batch sharded
    over the virtual mesh (ShardedEngine pair + shard-local mixer).  Rooms
    tile the per-shard seats, so the consecutive partition is shard-local
    by construction; geometry that does not tile is refused up front."""
    import socket
    import threading
    import time

    from lyra_tpu import packet as pkt
    from lyra_tpu.tools import serve_main

    # Error path first: 16 seats / 8 shards = 2 per shard; rooms of 3
    # cannot tile that.
    with pytest.raises(ValueError, match="does not tile"):
        serve_main.main(["--mode", "bridge", "--capacity", "16",
                         "--room_size", "3", "--devices", "8",
                         "--model_path", model_path])

    echo_rx = socket.socket(socket.AF_INET, socket.SOCK_DGRAM)
    echo_rx.bind(("127.0.0.1", 0))
    echo_rx.settimeout(0.05)
    echo_port = echo_rx.getsockname()[1]

    port_box = {}
    ready = threading.Event()
    stop = threading.Event()
    th = threading.Thread(target=serve_main.main, kwargs=dict(
        argv=["--mode", "bridge", "--capacity", "16", "--room_size", "2",
              "--devices", "8", "--seconds", "0", "--bitrate", "3200",
              "--max_bitrate", "3200", "--model_path", model_path,
              "--playout_delay", "1", "--ingest", "python",
              "--report_every", "30", "--echo", f"127.0.0.1:{echo_port}"],
        _on_ready=lambda port: (port_box.update(port=port), ready.set()),
        _stop=stop))
    th.start()
    try:
        assert ready.wait(180), "sharded bridge never bound its port"
        tx = socket.socket(socket.AF_INET, socket.SOCK_DGRAM)
        wire = pkt.pack_indices_batch(np.zeros((16, 16), np.int32), 64)

        got = {}
        deadline = time.time() + 300  # first tick compiles on the mesh
        seq = 0
        while len(got) < 16 and time.time() < deadline:
            for slot in range(16):
                tx.sendto(slot.to_bytes(2, "big") + seq.to_bytes(4, "big")
                          + wire[slot].tobytes(),
                          ("127.0.0.1", port_box["port"]))
            seq += 1
            try:
                dgram = echo_rx.recvfrom(4096)[0]
                got[int.from_bytes(dgram[:2], "big")] = dgram
            except socket.timeout:
                pass
        tx.close()
        assert len(got) == 16, f"downlink only reached slots {sorted(got)}"
        for slot, dgram in got.items():
            assert len(dgram) == 6 + config.packet_size(64)
    finally:
        stop.set()
        th.join(timeout=120)
        assert not th.is_alive(), "sharded bridge loop failed to stop"
        echo_rx.close()


def test_serve_main_bridge_reply_routing(model_path):
    """--echo reply: each caller's downlink comes back to the socket their
    uplink left from (per-slot reply routing via the native pump's source
    table); without a native pump to hold that table the flag is refused
    loudly.  (Encode mode routes replies too, via the PCM pump —
    test_serve_main_encode_reply_routing.)"""
    import socket
    import threading
    import time

    from lyra_tpu import packet as pkt
    from lyra_tpu.tools import serve_main

    # Python-ingest reply is refused at parse time in every mode, before
    # any model/engine construction.
    with pytest.raises(SystemExit):
        serve_main.main(["--mode", "encode", "--echo", "reply",
                         "--ingest", "python", "--model_path", model_path])
    with pytest.raises(SystemExit):
        serve_main.main(["--mode", "bridge", "--echo", "reply",
                         "--ingest", "python", "--capacity", "4",
                         "--model_path", model_path])

    stop = threading.Event()
    ready = threading.Event()
    box = {}
    th = threading.Thread(target=serve_main.main, kwargs=dict(
        argv=["--mode", "bridge", "--capacity", "4", "--room_size", "2",
              "--seconds", "0", "--bitrate", "3200", "--max_bitrate",
              "3200", "--model_path", model_path, "--playout_delay", "1",
              "--ingest", "native", "--egress", "native",
              "--report_every", "30", "--echo", "reply"],
        _on_ready=lambda port: (box.update(port=port), ready.set()),
        _stop=stop))
    th.start()
    try:
        assert ready.wait(120), "bridge never bound its port"
        callers = []
        for _ in range(4):
            s = socket.socket(socket.AF_INET, socket.SOCK_DGRAM)
            s.bind(("127.0.0.1", 0))
            s.settimeout(0.05)
            callers.append(s)
        wire = pkt.pack_indices_batch(np.zeros((4, 16), np.int32), 64)
        got = set()
        deadline = time.time() + 240
        seq = 0
        while len(got) < 4 and time.time() < deadline:
            for slot, s in enumerate(callers):
                s.sendto(slot.to_bytes(2, "big") + seq.to_bytes(4, "big")
                         + wire[slot].tobytes(), ("127.0.0.1", box["port"]))
            seq += 1
            for slot, s in enumerate(callers):
                try:
                    d = s.recvfrom(2048)[0]
                    # The downlink on MY socket must be MY slot's.
                    assert int.from_bytes(d[:2], "big") == slot
                    got.add(slot)
                except socket.timeout:
                    pass
        for s in callers:
            s.close()
        assert got == {0, 1, 2, 3}, f"reply routing reached only {got}"
    finally:
        stop.set()
        th.join(timeout=120)
        assert not th.is_alive(), "bridge loop failed to stop"


def test_serve_main_sharded_transport_flags_are_loud():
    """Shard-group flags fail at parse time when the combination cannot
    work (repo convention: misconfiguration never silently falls back)."""
    from lyra_tpu.tools import serve_main

    base = ["--capacity", "2", "--seconds", "1", "--max_bitrate", "3200"]
    for extra in (
        ["--ingest_shards", "2", "--ingest", "python"],
        ["--ingest_shards", "0"],
        ["--egress_threads", "2", "--egress", "python",
         "--echo", "127.0.0.1:9"],
        ["--egress_threads", "2", "--ingest", "native",
         "--egress", "native", "--echo", "reply"],
        ["--egress_threads", "2"],  # no destination: sends nothing
    ):
        with pytest.raises(SystemExit):
            serve_main.main(argv=base + extra)


def test_serve_main_sharded_decode_reply_routing(model_path, tmp_path):
    """The multi-core transport tier stood up through the real CLI:
    --ingest_shards 2 (SO_REUSEPORT shard group) + --echo reply
    (owner-partitioned ShardedReplyEgress).  Two callers on distinct
    flows each get their PCM back on their own socket, from the serve
    port (every shard binds the same port); group counters ride the
    operator stats exit."""
    import json
    import socket
    import threading
    import time

    from lyra_tpu import packet as pkt
    from lyra_tpu.tools import serve_main

    stats_path = tmp_path / "sharded_stats.jsonl"
    port_box = {}
    ready = threading.Event()
    stop = threading.Event()
    th = threading.Thread(target=serve_main.main, kwargs=dict(
        argv=["--capacity", "2", "--seconds", "0", "--max_bitrate", "3200",
              "--model_path", model_path, "--playout_delay", "1",
              "--report_every", "30", "--ingest", "native",
              "--ingest_shards", "2", "--egress", "native",
              "--echo", "reply", "--stats", str(stats_path)],
        _on_ready=lambda port: (port_box.update(port=port), ready.set()),
        _stop=stop))
    th.start()
    try:
        assert ready.wait(60), "sharded server never bound its port"
        wire = pkt.pack_indices_batch(np.zeros((2, 16), np.int32), 64)
        callers = []
        for slot in range(2):
            c = socket.socket(socket.AF_INET, socket.SOCK_DGRAM)
            c.bind(("127.0.0.1", 0))
            c.settimeout(0.05)
            callers.append(c)

        got = {0: None, 1: None}
        deadline = time.time() + 180  # first tick compiles the program
        seq = 0
        while None in got.values() and time.time() < deadline:
            for slot, c in enumerate(callers):
                c.sendto(slot.to_bytes(2, "big") + seq.to_bytes(4, "big")
                         + wire[slot].tobytes(),
                         ("127.0.0.1", port_box["port"]))
            seq += 1
            for slot, c in enumerate(callers):
                if got[slot] is None:
                    try:
                        got[slot] = c.recvfrom(4096)
                    except socket.timeout:
                        pass
        for slot, c in enumerate(callers):
            data, src = got[slot] or (None, None)
            assert data is not None, f"caller {slot} got no PCM back"
            assert src[1] == port_box["port"]  # the group's shared port
            assert int.from_bytes(data[:2], "big") == slot
            assert len(data) == 6 + 320 * 2
            c.close()
    finally:
        stop.set()
        th.join(timeout=120)
        assert not th.is_alive(), "sharded serve loop failed to stop"

    final = [json.loads(line)
             for line in stats_path.read_text().splitlines()][-1]
    assert final["final"] is True
    assert final["ingest"]["datagrams"] > 0  # summed across shards
    assert final["egress"]["sent"] > 0
    assert "no_route_drops" in final["egress"]  # the group-level counter


def test_serve_main_sharded_pcm_encode_with_multiegress(model_path):
    """--mode encode --ingest_shards 2 --egress_threads 2: PCM shard-group
    ingest (merged latest-wins) feeding striped multi-socket egress, end
    to end through the real CLI."""
    import socket
    import threading
    import time

    from lyra_tpu import packet as pkt
    from lyra_tpu.tools import serve_main

    echo_rx = socket.socket(socket.AF_INET, socket.SOCK_DGRAM)
    echo_rx.bind(("127.0.0.1", 0))
    echo_rx.settimeout(0.05)
    echo_port = echo_rx.getsockname()[1]

    port_box = {}
    ready = threading.Event()
    stop = threading.Event()
    th = threading.Thread(target=serve_main.main, kwargs=dict(
        argv=["--mode", "encode", "--capacity", "2", "--seconds", "0",
              "--bitrate", "3200", "--max_bitrate", "3200",
              "--model_path", model_path, "--report_every", "30",
              "--ingest", "native", "--ingest_shards", "2",
              "--egress", "native", "--egress_threads", "2",
              "--echo", f"127.0.0.1:{echo_port}"],
        _on_ready=lambda port: (port_box.update(port=port), ready.set()),
        _stop=stop))
    th.start()
    try:
        assert ready.wait(60), "encode server never bound its port"
        tx = socket.socket(socket.AF_INET, socket.SOCK_DGRAM)
        t = np.arange(320) / 16000.0
        hop = (8000 * np.sin(2 * np.pi * 330 * t)).astype(np.int16)

        got = None
        deadline = time.time() + 180
        seq = 0
        while got is None and time.time() < deadline:
            for slot in range(2):
                tx.sendto(slot.to_bytes(2, "big") + seq.to_bytes(4, "big")
                          + hop.tobytes(), ("127.0.0.1", port_box["port"]))
            seq += 1
            try:
                got = echo_rx.recvfrom(4096)[0]
            except socket.timeout:
                pass
        tx.close()
        assert got is not None, "no packet within the deadline"
        assert len(got) == 6 + config.packet_size(64)
        assert pkt.unpack_indices(got[6:]).shape == (16,)
    finally:
        stop.set()
        th.join(timeout=120)
        assert not th.is_alive(), "encode loop failed to stop"
        echo_rx.close()


@pytest.mark.full
def test_rate_adapt_example(monkeypatch, model_path, testdata_path, capsys):
    del model_path, testdata_path  # gate: skip when assets are absent
    """The congestion loop end to end: an oversubscribed token-bucket
    link drives the controller to walk the fleet down the bitrate ladder
    via control-plane set_bitrate until the loss clears (the example's
    own exit code asserts convergence)."""
    import importlib

    examples = os.path.join(os.path.dirname(__file__), "..", "examples")
    monkeypatch.syspath_prepend(examples)
    rate_adapt = importlib.import_module("rate_adapt_call")

    assert rate_adapt.main(["--callers", "2", "--seconds", "5",
                            "--window_s", "0.4"]) == 0
    out = capsys.readouterr().out
    assert "ADAPT OK" in out
    assert "rates s0:9200 s1:9200" in out  # started high...
    assert "rates s0:3200 s1:3200" in out  # ...converged low


@pytest.mark.parametrize("ingest", ("native", "python"))
def test_serve_main_decode_red_heals_losses(model_path, ingest, tmp_path):
    """--red on the decode server end to end (both ingest paths): callers
    send RED-framed datagrams (packet t + packet t-1), the test drops a
    third of slot 0's datagrams entirely, and the server still plays the
    lost sequences from the redundant copies — counted as red_heals in
    the operator stats."""
    import json
    import socket
    import threading
    import time

    from lyra_tpu import packet as pkt
    from lyra_tpu.tools import serve_main

    stats_path = tmp_path / "red_stats.jsonl"
    echo_rx = socket.socket(socket.AF_INET, socket.SOCK_DGRAM)
    echo_rx.bind(("127.0.0.1", 0))
    echo_rx.settimeout(0.05)

    port_box = {}
    ready = threading.Event()
    stop = threading.Event()
    th = threading.Thread(target=serve_main.main, kwargs=dict(
        argv=["--capacity", "2", "--seconds", "0", "--max_bitrate", "3200",
              "--model_path", model_path, "--playout_delay", "2",
              "--red", "1", "--ingest", ingest,
              "--echo", f"127.0.0.1:{echo_rx.getsockname()[1]}",
              "--report_every", "30", "--stats", str(stats_path)],
        _on_ready=lambda port: (port_box.update(port=port), ready.set()),
        _stop=stop))
    th.start()
    try:
        assert ready.wait(60), "server never bound its port"
        tx = socket.socket(socket.AF_INET, socket.SOCK_DGRAM)
        wire = pkt.pack_indices_batch(np.zeros((2, 16), np.int32), 64)
        rows = [wire[s].tobytes() for s in range(2)]

        def send(slot, seq):
            payload = pkt.build_red(rows[slot], rows[slot] if seq else b"")
            tx.sendto(slot.to_bytes(2, "big") + seq.to_bytes(4, "big")
                      + payload, ("127.0.0.1", port_box["port"]))

        # Phase 1: no loss, until the first decoded hop echoes back
        # (first tick compiles the program).
        seq = 0
        got = None
        deadline = time.time() + 180
        while got is None and time.time() < deadline:
            for slot in range(2):
                send(slot, seq)
            seq += 1
            try:
                got = echo_rx.recvfrom(4096)[0]
            except socket.timeout:
                pass
        assert got is not None, "no decoded PCM echoed within the deadline"

        # Phase 2: the network eats every third datagram on slot 0; the
        # successor's redundant copy must heal each hole.
        for k in range(45):
            if k % 3:
                send(0, seq)
            send(1, seq)
            seq += 1
            try:
                echo_rx.recvfrom(4096)
            except socket.timeout:
                pass
        tx.close()
        time.sleep(0.3)  # let the last redundant copies land and play
    finally:
        stop.set()
        th.join(timeout=120)
        assert not th.is_alive(), "serve loop failed to stop"
        echo_rx.close()

    final = [json.loads(line)
             for line in stats_path.read_text().splitlines()][-1]
    assert final["final"] is True and final["mode"] == "decode"
    # ~15 eaten datagrams; allow slop for ticks racing the sender, but
    # healing must clearly have happened and not read as dup anomalies.
    assert final["red_heals"] >= 5, final
    assert final["jb"]["dup_drops"] == 0, final


def test_serve_main_red_flag_refusals():
    """--red misconfiguration is loud at argparse time: a playout delay
    too short for the redundancy distance would silently play sequences
    before their copy could land."""
    from lyra_tpu.tools import serve_main

    for argv in (
        ["--red", "1", "--playout_delay", "1"],
        ["--red", "9", "--playout_delay", "12"],
        ["--red", "2", "--playout_delay", "3", "--adaptive", "1:6:25"],
    ):
        with pytest.raises(SystemExit):
            serve_main.main(argv=argv + ["--capacity", "2", "--seconds",
                                         "0.1"])
