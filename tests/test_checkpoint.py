"""Stream-state checkpoint/restore round-trip."""

import numpy as np
import pytest

from lyra_tpu import config
from lyra_tpu.utils import checkpoint


def test_roundtrip_nested_tree(tmp_path):
    state = {
        "gan": {"var_a": np.arange(6, dtype=np.float32).reshape(2, 3)},
        "fade": np.array([0, 640], np.int32),
        "nested": {"deep": {"leaf": np.ones((2, 2), bool)}},
    }
    path = str(tmp_path / "state.npz")
    checkpoint.save_state(path, state, extra={"tick": 42})
    restored, extra = checkpoint.load_state(path)
    assert extra == {"tick": 42}
    np.testing.assert_array_equal(restored["gan"]["var_a"], state["gan"]["var_a"])
    np.testing.assert_array_equal(restored["fade"], state["fade"])
    np.testing.assert_array_equal(
        restored["nested"]["deep"]["leaf"], state["nested"]["deep"]["leaf"])


def test_version_gate(tmp_path, monkeypatch):
    path = str(tmp_path / "state.npz")
    checkpoint.save_state(path, {"x": np.zeros(3)})
    monkeypatch.setattr(config, "VERSION_MINOR", 99)
    with pytest.raises(ValueError, match="incompatible"):
        checkpoint.load_state(path)


def test_engine_state_resume_equivalence(model_path):
    """Decoding resumed from a checkpoint must continue the exact stream."""
    from lyra_tpu.codec.engine import DecoderEngine

    eng = DecoderEngine(16000, model_path)
    rng = np.random.RandomState(0)
    idx = rng.randint(0, 16, (1, eng.rvq.num_stages)).astype(np.int32)
    received = np.array([True])

    st = eng.init_state(1, seed=0)
    for _ in range(3):
        _, _, st = eng.step(st, idx, received)
    a1, _, st_cont = eng.step(st, idx, received)

    import tempfile

    with tempfile.NamedTemporaryFile(suffix=".npz") as f:
        checkpoint.save_state(f.name, st)
        restored, _ = checkpoint.load_state(f.name)
    a2, _, _ = eng.step(restored, idx, received)
    np.testing.assert_array_equal(np.asarray(a1), np.asarray(a2))


def test_roundtrip_reserved_key_names(tmp_path):
    # Keys that collide with np.savez's positional parameter or the header
    # entry must still round-trip (data keys are namespaced on disk).
    state = {
        "file": np.arange(4, dtype=np.int32),
        "__lyra_tpu_header__": np.ones(2, np.float32),
    }
    path = str(tmp_path / "reserved.npz")
    checkpoint.save_state(path, state)
    restored, _ = checkpoint.load_state(path)
    assert set(restored) == set(state)
    for k in state:
        np.testing.assert_array_equal(restored[k], state[k])


def test_sharded_state_checkpoint_migrates_to_local(model_path, tmp_path):
    """Host-drain scenario: snapshot a mesh-sharded decoder's state and
    resume on a single device — the stream continues bit-identically."""
    from lyra_tpu.codec.engine import DecoderEngine
    from lyra_tpu.parallel.sharding import ShardedEngine, make_mesh

    eng = DecoderEngine(16000, model_path)
    sharded = ShardedEngine(eng, make_mesh())
    b = 8
    rng = np.random.default_rng(4)
    idx = rng.integers(0, 16, (b, eng.rvq.num_stages)).astype(np.int32)
    received = np.ones(b, bool)

    st = sharded.init_state(b)
    for _ in range(2):
        _, _, st = sharded.step(st, idx, received)
    path = str(tmp_path / "drain.npz")
    checkpoint.save_state(path, st)
    a_sharded, _, _ = sharded.step(st, idx, received)

    restored, _ = checkpoint.load_state(path)
    a_local, _, _ = eng.step(
        restored, np.asarray(idx), np.asarray(received))
    np.testing.assert_allclose(
        np.asarray(a_sharded), np.asarray(a_local), atol=1)


def test_legacy_unprefixed_snapshot_loads(tmp_path):
    """Snapshots written before data-key namespacing (bare flattened keys)
    must still restore, not silently come back as an empty tree."""
    import json

    path = str(tmp_path / "legacy.npz")
    header = json.dumps({"version": config.version_string(),
                         "identifier": config.VERSION_MINOR, "extra": {}})
    sep = checkpoint._SEP
    np.savez(path,
             **{f"gan{sep}var_a": np.arange(4, dtype=np.float32),
                "fade": np.array([0, 640], np.int32),
                checkpoint._HEADER_KEY: np.frombuffer(header.encode(),
                                                      dtype=np.uint8)})
    restored, extra = checkpoint.load_state(path)
    np.testing.assert_array_equal(restored["gan"]["var_a"],
                                  np.arange(4, dtype=np.float32))
    np.testing.assert_array_equal(restored["fade"], [0, 640])


def test_compressed_state_snapshot_halves_bytes_and_resumes(model_path,
                                                            tmp_path):
    """state_compression='int8' exists for serving migration: the drained
    per-stream snapshot must be roughly half the uncompressed bytes and
    resume into a bit-identical continuation."""
    from lyra_tpu.codec.engine import DecoderEngine

    rng = np.random.RandomState(7)

    def run(eng, n, state=None):
        st = eng.init_state(2) if state is None else state
        out = None
        for _ in range(n):
            idx = rng.randint(0, 16, (2, eng.rvq.num_stages)).astype(np.int32)
            out, _, st = eng.step(st, idx, np.array([True, False]))
        return out, st

    sizes = {}
    for comp in (None, "int8"):
        eng = DecoderEngine(16000, model_path, state_compression=comp)
        _, st = run(eng, 3)
        path = str(tmp_path / f"snap_{comp}.npz")
        checkpoint.save_state(path, checkpoint.jax_to_numpy(st))
        sizes[comp] = (tmp_path / f"snap_{comp}.npz").stat().st_size

        restored, _ = checkpoint.load_state(path)
        rng_save = rng.get_state()
        out_resumed, _ = run(eng, 2, state=restored)
        rng.set_state(rng_save)
        out_direct, _ = run(eng, 2, state=st)
        np.testing.assert_array_equal(np.asarray(out_resumed),
                                      np.asarray(out_direct))
    # GAN conv contexts dominate the decoder state; int8+scale vs f32 cuts
    # the snapshot to ~47% (the remainder is CNG/noise/estimator state and
    # sub-threshold leaves, which stay uncompressed; npz is uncompressed).
    assert sizes["int8"] < 0.55 * sizes[None], sizes


def test_server_drain_and_restore_continues_calls(model_path, tmp_path):
    """Full serving migration: snapshot Encoder/DecoderServer mid-call
    (engine state + slot table + bitrates + counters), restore into fresh
    servers, and the calls continue bit-exactly — the drain-for-maintenance
    story the checkpoint subsystem exists for."""
    from lyra_tpu.tools.stream_server import DecoderServer, EncoderServer

    enc = EncoderServer(3, model_path=model_path, bitrate=3200)
    dec = DecoderServer(3, model_path=model_path)
    enc.add_stream("a")
    enc.add_stream("b", bitrate=9200)
    dec.add_streams(["a", "b"])

    rng = np.random.RandomState(3)
    hops = rng.randint(-8000, 8000, (6, 320)).astype(np.int16)
    for t in range(3):
        pkts = enc.tick({"a": hops[t], "b": hops[t]})
        dec.tick(pkts)

    enc.save(str(tmp_path / "enc"))
    dec.save(str(tmp_path / "dec"))

    enc2 = EncoderServer(3, model_path=model_path, bitrate=3200)
    dec2 = DecoderServer(3, model_path=model_path)
    enc2.restore(str(tmp_path / "enc"))
    dec2.restore(str(tmp_path / "dec"))
    assert enc2.num_active == 2 and dec2.num_active == 2

    for t in range(3, 6):
        pkts1 = enc.tick({"a": hops[t], "b": hops[t]})
        pkts2 = enc2.tick({"a": hops[t], "b": hops[t]})
        assert pkts1 == pkts2  # incl. per-stream bitrates surviving
        assert len(pkts2["b"]) == 23  # "b" kept its 9.2 kbps config
        out1 = dec.tick(pkts1)
        out2 = dec2.tick(pkts2)
        for sid in ("a", "b"):
            np.testing.assert_array_equal(out1[sid], out2[sid])

    # Slot-admission machinery survives: evict + re-admit on the restored
    # server lands in the freed slot with fresh state.
    enc2.remove_stream("a")
    assert enc2.add_stream("c") == 0

    # Saving with an unflushed async pipeline would lose a tick: refused.
    enc2.tick_packed_async(np.zeros((3, 320), np.int16))
    with pytest.raises(RuntimeError, match="in flight"):
        enc2.save(str(tmp_path / "enc3"))
    enc2.flush_async()
    enc2.save(str(tmp_path / "enc3"))


def test_restore_validates_before_mutating(model_path, tmp_path):
    """Wrong-kind, over-cap-bitrate, or mid-pipeline restores must leave the
    target server untouched; numpy-scalar stream ids must save cleanly."""
    from lyra_tpu.codec.engine import EncoderEngine
    from lyra_tpu.tools.stream_server import DecoderServer, EncoderServer

    enc = EncoderServer(2, model_path=model_path, bitrate=9200)
    enc.add_streams(np.arange(2))  # np.int64 ids: coerced, not a crash
    enc.save(str(tmp_path / "enc"))

    # Wrong kind: decoder refuses an encoder snapshot and is unchanged.
    dec = DecoderServer(2, model_path=model_path)
    dec.add_stream("x")
    with pytest.raises(ValueError, match="decoder-server"):
        dec.restore(str(tmp_path / "enc"))
    assert dec.num_active == 1 and "x" in dec._by_id

    # Bitrate over the target engine's cap: refused before any mutation.
    capped = EncoderServer(2, engine=EncoderEngine(
        16000, model_path, max_bitrate=3200), bitrate=3200)
    capped.add_stream("y")
    with pytest.raises(ValueError, match="stage cap"):
        capped.restore(str(tmp_path / "enc"))
    assert capped.num_active == 1 and capped._bits[0] == 64

    # Restore with a tick in flight: refused (a stale drain would run
    # against the restored slot/gen tables).
    enc2 = EncoderServer(2, model_path=model_path, bitrate=9200)
    enc2.tick_packed_async(np.zeros((2, 320), np.int16))
    with pytest.raises(RuntimeError, match="in flight"):
        enc2.restore(str(tmp_path / "enc"))
    enc2.flush_async()
    enc2.restore(str(tmp_path / "enc"))
    assert enc2.num_active == 2

    # Decoder seed survives migration for post-restore admissions.
    d7 = DecoderServer(2, model_path=model_path, seed=7)
    d7.add_stream("a")
    d7.save(str(tmp_path / "dec7"))
    d0 = DecoderServer(2, model_path=model_path)  # default seed 0
    d0.restore(str(tmp_path / "dec7"))
    assert d0._seed == 7


def test_empty_dict_subtree_roundtrips(tmp_path):
    """Empty-dict subtrees are part of the pytree structure and must
    survive a save/load cycle (a dropped key surfaces as a KeyError deep
    inside engine.step on resume, far from the cause)."""
    state = {"a": {}, "b": np.ones(3, np.float32),
             "nested": {"empty": {}, "leaf": np.zeros(2, np.int32)}}
    path = str(tmp_path / "empty.npz")
    checkpoint.save_state(path, state)
    restored, _ = checkpoint.load_state(path)
    assert restored["a"] == {}
    assert restored["nested"]["empty"] == {}
    np.testing.assert_array_equal(restored["b"], state["b"])
    with pytest.raises(TypeError, match="dict"):
        checkpoint.save_state(str(tmp_path / "x.npz"), np.ones(4))


def test_snapshot_transport_roundtrip(model_path, tmp_path):
    """The serving layer's opaque transport dict (serve_main: the jitter
    buffer playout schedule) rides the same atomic snapshot and comes
    back from restore; snapshots saved without one return None.  The
    server never interprets it — it is the channel that makes migration
    lock-on immediate (serve_main._transport_state)."""
    from lyra_tpu.tools.stream_server import DecoderServer

    dec = DecoderServer(2, model_path=model_path)
    dec.add_streams(["a"])
    tr = {"jb_heads": [7, -1]}
    dec.save(str(tmp_path / "snap"), transport=tr)

    dec2 = DecoderServer(2, model_path=model_path)
    assert dec2.restore(str(tmp_path / "snap")) == tr
    dec2.save(str(tmp_path / "plain"))
    assert dec2.restore(str(tmp_path / "plain")) is None
