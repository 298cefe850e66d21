"""Sanitizer fuzz gate for the native host tier (native/fuzz_native.cc).

The native components parse bytes that arrive from the network (wire
headers, RED framing, payloads) behind a ctypes FFI where a bounds bug is
a segfault, not an exception.  The other test files pin their semantics;
this gate pins memory safety (ASan+UBSan) and the pump-lock discipline
(TSan) by running the deterministic fuzz harness, which drives every
extern "C" entry point with adversarial inputs — including raw datagrams
through real loopback sockets.

The reference has no transport tier to harden (its inputs are local
files, reference: lyra/cli_example/decoder_main_lib.cc:86-219); this is
deployment-scale hardening for the serving runtime.
"""

import os
import shutil
import subprocess

import pytest

NATIVE_DIR = os.path.join(os.path.dirname(__file__), "..", "native")


def _build(target: str) -> str:
    """Builds one fuzz binary via the native Makefile; skips when the
    toolchain (or the sanitizer runtime) is unavailable on this box."""
    if shutil.which("g++") is None and shutil.which("c++") is None:
        pytest.skip("no C++ toolchain")
    proc = subprocess.run(
        ["make", "-s", target],
        cwd=NATIVE_DIR,
        capture_output=True,
        text=True,
    )
    if proc.returncode != 0:
        pytest.skip(f"cannot build {target}: {proc.stderr[-500:]}")
    return os.path.join(NATIVE_DIR, target)


def _run(binary: str, seed: int, scale: int, env_extra: dict) -> None:
    env = dict(os.environ, **env_extra)
    proc = subprocess.run(
        [binary, str(seed), str(scale)],
        capture_output=True,
        text=True,
        timeout=600,
        env=env,
    )
    assert proc.returncode == 0, (
        f"fuzz gate failed (seed={seed} scale={scale}):\n"
        f"{proc.stdout[-2000:]}\n{proc.stderr[-4000:]}"
    )
    assert "fuzz_native: OK" in proc.stdout


@pytest.fixture(scope="module")
def asan_binary():
    return _build("fuzz_native")


@pytest.fixture(scope="module")
def tsan_binary():
    return _build("fuzz_native_tsan")


@pytest.mark.parametrize("seed", [1, 2])
def test_asan_ubsan_fuzz(asan_binary, seed):
    """Every native entry point survives adversarial inputs under
    ASan+UBSan (any report aborts: -fno-sanitize-recover=all)."""
    _run(asan_binary, seed, 1,
         {"ASAN_OPTIONS": "detect_stack_use_after_return=1"})


def test_tsan_pump_lock_discipline(tsan_binary):
    """The pump receiver thread vs collect/admission/stats interleavings
    are race-free under TSan (the harness fuzzes them concurrently)."""
    _run(tsan_binary, 1, 1, {"TSAN_OPTIONS": "halt_on_error=1"})


@pytest.mark.full
@pytest.mark.parametrize("seed", [3, 4, 5, 6])
def test_asan_ubsan_fuzz_soak(asan_binary, seed):
    _run(asan_binary, seed, 4,
         {"ASAN_OPTIONS": "detect_stack_use_after_return=1"})


@pytest.mark.full
@pytest.mark.parametrize("seed", [2, 3])
def test_tsan_fuzz_soak(tsan_binary, seed):
    _run(tsan_binary, seed, 4, {"TSAN_OPTIONS": "halt_on_error=1"})


def test_sequence_ceiling_is_loud():
    """The overflow guards the fuzzer motivated: absurd sequences and
    geometry are refused/counted, never head-arithmetic UB
    (native/jitter_buffer.cc kMaxSeq)."""
    from lyra_tpu.tools.jitter_buffer import JitterBuffer

    try:
        jb = JitterBuffer(capacity=4, packet_size=23, depth=8)
    except RuntimeError:
        pytest.skip("native library unavailable")
    # add_stream refuses a start_seq in overflow range...
    with pytest.raises(ValueError):
        jb.add_stream(0, start_seq=2**62)
    # ...but accepts anything a real wire (4-byte seq) or snapshot carries.
    jb.add_stream(0, start_seq=2**32)
    # An absurd insert sequence is a counted overflow drop, and must never
    # resync (3x the streak bar, head unmoved).
    for _ in range(9):
        assert jb.insert(0, 2**62 + 5, b"x" * 8) == 4
    assert jb.stats()["overflow_drops"] == 9
    assert jb.stats()["resyncs"] == 0
    assert jb.heads()[0] == 2**32
    # Geometry ceilings: absurd rings are a loud refusal, not an
    # overflowing allocation.
    for cap, pkt, depth in [(2**23, 23, 8), (4, 23, 2**21),
                            (2**20, 23, 2**10)]:
        with pytest.raises(RuntimeError):
            JitterBuffer(capacity=cap, packet_size=pkt, depth=depth)
