"""Stream-axis sharding tests on the virtual 8-device CPU mesh.

Validates the mesh/sharding plumbing (lyra_tpu/parallel/sharding.py): fast
mechanics tests use a lightweight stand-in engine; one test runs the full
DecoderEngine sharded-vs-local to pin that batch-axis partitioning cannot
change results. The driver's multichip dry-run exercises the same path in
__graft_entry__.dryrun_multichip.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from lyra_tpu.parallel.sharding import (
    ShardedEngine,
    batch_sharding,
    make_mesh,
    shard_batch_tree,
)


class _ToyEngine:
    """Minimal engine contract: init_state + _step_impl over [B] rows."""

    def init_state(self, batch_size):
        return {
            "acc": jnp.zeros((batch_size, 4), jnp.float32),
            "count": jnp.zeros((batch_size,), jnp.int32),
        }

    def _step_impl(self, state, x, gain):
        acc = state["acc"] + x * gain
        return acc.sum(-1), {"acc": acc, "count": state["count"] + 1}


def test_mesh_spans_8_devices():
    mesh = make_mesh()
    assert mesh.devices.size == 8


def test_sharded_state_placement():
    mesh = make_mesh()
    state = shard_batch_tree(_ToyEngine().init_state(16), mesh)
    sh = batch_sharding(mesh)
    for leaf in jax.tree.leaves(state):
        assert leaf.sharding.is_equivalent_to(sh, leaf.ndim)


def test_sharded_step_matches_local():
    mesh = make_mesh()
    eng = _ToyEngine()
    sharded = ShardedEngine(eng, mesh)
    b = 16
    x = np.arange(b * 4, dtype=np.float32).reshape(b, 4)

    st = sharded.init_state(b)
    out1, st = sharded.step(st, x, np.float32(2.0))
    out2, st = sharded.step(st, x, np.float32(2.0))

    ref = eng.init_state(b)
    r1, ref = eng._step_impl(ref, jnp.asarray(x), 2.0)
    r2, ref = eng._step_impl(ref, jnp.asarray(x), 2.0)

    np.testing.assert_allclose(np.asarray(out1), np.asarray(r1))
    np.testing.assert_allclose(np.asarray(out2), np.asarray(r2))
    # Output of the sharded step stays sharded over streams.
    assert out2.sharding.is_equivalent_to(batch_sharding(mesh), out2.ndim)


def test_real_decoder_engine_sharded_matches_local(model_path):
    """The full DecoderEngine step sharded over the 8-device mesh must equal
    the single-device run (stream rows are independent, so partitioning the
    batch axis cannot change results)."""
    from lyra_tpu.codec.engine import DecoderEngine

    eng = DecoderEngine(16000, model_path)
    mesh = make_mesh()
    sharded = ShardedEngine(eng, mesh)
    b = 8
    rng = np.random.default_rng(0)
    idx = rng.integers(0, 16, (b, eng.rvq.num_stages)).astype(np.int32)
    received = np.ones(b, bool)
    received[3] = False

    st = sharded.init_state(b)
    audio_s, cn_s, st = sharded.step(st, idx, received)
    audio_s2, cn_s2, st = sharded.step(st, idx, received)

    lst = eng.init_state(b)
    audio_l, cn_l, lst = eng.step(lst, jnp.asarray(idx), jnp.asarray(received))
    audio_l2, cn_l2, lst = eng.step(lst, jnp.asarray(idx), jnp.asarray(received))

    np.testing.assert_allclose(np.asarray(audio_s), np.asarray(audio_l), atol=1)
    np.testing.assert_allclose(np.asarray(audio_s2), np.asarray(audio_l2), atol=1)
    np.testing.assert_array_equal(np.asarray(cn_s2), np.asarray(cn_l2))


def test_uneven_batch_rejected():
    sharded = ShardedEngine(_ToyEngine(), make_mesh())
    with pytest.raises(ValueError):
        sharded.init_state(12)  # 12 % 8 != 0


def test_real_encoder_engine_sharded_matches_local(model_path):
    """EncoderEngine sharded over the mesh must equal the local run —
    indices are integer so equality is exact."""
    from lyra_tpu.codec.engine import EncoderEngine

    eng = EncoderEngine(16000, model_path)
    mesh = make_mesh()
    sharded = ShardedEngine(eng, mesh)
    b = 8
    rng = np.random.default_rng(1)
    audio = rng.integers(-8000, 8000, (b, eng.hop_samples)).astype(np.float32)
    nq = np.full(b, 30, np.int32)

    st = sharded.init_state(b)
    lst = eng.init_state(b)
    for _ in range(3):
        idx_s, noise_s, st = sharded.step(st, audio, nq)
        idx_l, noise_l, lst = eng.step(lst, jnp.asarray(audio), jnp.asarray(nq))
        np.testing.assert_array_equal(np.asarray(idx_s), np.asarray(idx_l))
        np.testing.assert_array_equal(np.asarray(noise_s), np.asarray(noise_l))


def test_wire_roundtrip_around_sharded_tick(model_path):
    """Full wire path around a sharded encode→decode tick: pack the sharded
    encoder's indices to bytes (native C++ batch codec), unpack, and feed a
    sharded decoder — i.e. exactly what a serving host does per 20 ms, with
    the device work partitioned over the 8-device mesh."""
    from lyra_tpu import config, packet
    from lyra_tpu.codec.engine import DecoderEngine, EncoderEngine

    mesh = make_mesh()
    enc = ShardedEngine(EncoderEngine(16000, model_path), mesh)
    dec = ShardedEngine(DecoderEngine(16000, model_path), mesh)
    b = 16
    bits = 120
    nq = np.full(b, bits // config.BITS_PER_QUANTIZER, np.int32)
    rng = np.random.default_rng(2)
    audio = rng.integers(-8000, 8000, (b, 320)).astype(np.float32)

    est = enc.init_state(b)
    dst = dec.init_state(b)
    for t in range(3):
        idx, _, est = enc.step(est, audio, nq)
        idx = np.asarray(idx)

        pkts = packet.pack_indices_batch(idx[:, : nq[0]], bits)
        assert pkts.shape == (b, config.packet_size(bits))
        back = packet.unpack_indices_batch(pkts, bits)
        np.testing.assert_array_equal(back, idx[:, : nq[0]])

        received = np.ones(b, bool)
        received[t::5] = False  # sprinkle loss through the PLC branch
        padded = np.full((b, idx.shape[1]), -1, np.int32)
        padded[:, : nq[0]] = back
        out, _, dst = dec.step(dst, padded, received)
        assert np.asarray(out).shape == (b, 320)


@pytest.mark.full
def test_stream_servers_over_sharded_engines(model_path):
    """The serving runtime runs unmodified over mesh-sharded engines:
    admission, packed encode/decode ticks, and eviction all work with
    state sharded across the 8 virtual devices, and the audio equals the
    single-device servers'."""
    from lyra_tpu.codec.engine import DecoderEngine, EncoderEngine
    from lyra_tpu.tools.stream_server import DecoderServer, EncoderServer

    mesh = make_mesh()
    cap = 8
    enc_s = EncoderServer(cap, engine=ShardedEngine(
        EncoderEngine(16000, model_path), mesh), bitrate=3200)
    dec_s = DecoderServer(cap, engine=ShardedEngine(
        DecoderEngine(16000, model_path), mesh))
    enc_l = EncoderServer(cap, engine=EncoderEngine(16000, model_path),
                          bitrate=3200)
    dec_l = DecoderServer(cap, engine=DecoderEngine(16000, model_path))

    for s in (enc_s, dec_s, enc_l, dec_l):
        for sid in range(6):  # partial occupancy: 2 slots stay empty
            s.add_stream(sid)

    rng = np.random.default_rng(11)
    for t in range(3):
        audio = rng.integers(-8000, 8000, (cap, 320)).astype(np.int16)
        pkts_s, sizes_s = enc_s.tick_packed(audio)
        pkts_l, sizes_l = enc_l.tick_packed(audio)
        np.testing.assert_array_equal(pkts_s, pkts_l)
        np.testing.assert_array_equal(sizes_s, sizes_l)

        received = np.ones(cap, bool)
        received[t % 6] = False
        out_s = dec_s.tick_packed(pkts_s, received, sizes_s)
        out_l = dec_l.tick_packed(pkts_l, received, sizes_l)
        np.testing.assert_allclose(out_s, out_l, atol=1)

    # Evict + re-admit on the sharded servers only: state reset must not
    # disturb other rows (next tick still matches the local servers, which
    # get the same reset).
    for s in (enc_s, enc_l, dec_s, dec_l):
        s.remove_stream(3)
        s.add_stream("fresh")
    audio = rng.integers(-8000, 8000, (cap, 320)).astype(np.int16)
    pkts_s, sizes_s = enc_s.tick_packed(audio)
    pkts_l, sizes_l = enc_l.tick_packed(audio)
    np.testing.assert_array_equal(pkts_s, pkts_l)


def test_compressed_state_decoder_sharded_matches_local(model_path):
    """state_compression='int8' under the mesh: the nested {q,s} leaves must
    shard over the stream axis like every other state leaf, with results
    identical to the single-device compressed run."""
    from lyra_tpu.codec.engine import DecoderEngine

    eng = DecoderEngine(16000, model_path, state_compression="int8")
    mesh = make_mesh()
    sharded = ShardedEngine(eng, mesh)
    b = 8
    rng = np.random.default_rng(3)
    idx = rng.integers(0, 16, (b, eng.rvq.num_stages)).astype(np.int32)
    received = np.ones(b, bool)
    received[5] = False

    st = sharded.init_state(b)
    sh = batch_sharding(mesh)
    for leaf in jax.tree.leaves(st):
        assert leaf.sharding.is_equivalent_to(sh, leaf.ndim)
    lst = eng.init_state(b)
    for _ in range(4):
        audio_s, cn_s, st = sharded.step(st, idx, received)
        audio_l, cn_l, lst = eng.step(lst, jnp.asarray(idx),
                                      jnp.asarray(received))
        # Unlike the float engines, compressed state amplifies 1-ulp
        # compilation differences between the sharded and local programs to
        # whole int8 steps, so equality is bounded, not exact: a few LSBs of
        # int16 audio (measured: max 4, rms 0.2 against signal rms ~5500).
        d = np.abs(np.asarray(audio_s) - np.asarray(audio_l))
        assert d.max() <= 16 and np.sqrt((d ** 2).mean()) < 1.0
        np.testing.assert_array_equal(np.asarray(cn_s), np.asarray(cn_l))


def test_tick_wire_over_sharded_engines(model_path):
    """The device-side wire codec path composes with mesh-sharded engines:
    the jitted unpack/pack+step programs inherit the state's shardings, and
    the wire bytes equal the single-device servers' byte for byte."""
    from lyra_tpu.codec.engine import DecoderEngine, EncoderEngine
    from lyra_tpu.tools.stream_server import DecoderServer, EncoderServer

    mesh = make_mesh()
    cap = 8
    enc_s = EncoderServer(cap, engine=ShardedEngine(
        EncoderEngine(16000, model_path), mesh), bitrate=6000)
    dec_s = DecoderServer(cap, engine=ShardedEngine(
        DecoderEngine(16000, model_path), mesh))
    enc_l = EncoderServer(cap, engine=EncoderEngine(16000, model_path),
                          bitrate=6000)
    dec_l = DecoderServer(cap, engine=DecoderEngine(16000, model_path))
    for s in (enc_s, dec_s, enc_l, dec_l):
        s.add_streams(range(cap - 1))  # one slot stays empty

    rng = np.random.default_rng(12)
    for t in range(2):
        audio = rng.integers(-8000, 8000, (cap, 320)).astype(np.int16)
        wire_s, sizes_s = enc_s.tick_wire(audio)
        wire_l, sizes_l = enc_l.tick_wire(audio)
        np.testing.assert_array_equal(wire_s, wire_l)
        np.testing.assert_array_equal(sizes_s, sizes_l)
        received = (sizes_s > 0)
        received[t] = False
        out_s = dec_s.tick_wire(wire_s, received)
        out_l = dec_l.tick_wire(wire_l, received)
        np.testing.assert_allclose(out_s, out_l, atol=1)


def test_server_restore_lands_sharded(model_path, tmp_path):
    """Restoring a snapshot into a server backed by a mesh-sharded engine
    must place the state sharded over the stream axis (and a single-device
    snapshot migrates onto the mesh, continuing the same calls)."""
    from lyra_tpu.codec.engine import DecoderEngine
    from lyra_tpu.tools.stream_server import DecoderServer

    cap = 8
    dec = DecoderServer(cap, model_path=model_path)
    dec.add_streams(range(cap))
    pkts = np.zeros((cap, 8), np.uint8)
    rec = np.ones(cap, bool)
    for _ in range(2):
        out_local = dec.tick_wire(pkts, rec)
    dec.save(str(tmp_path / "snap"))

    mesh = make_mesh()
    dec_s = DecoderServer(cap, engine=ShardedEngine(
        DecoderEngine(16000, model_path), mesh))
    dec_s.restore(str(tmp_path / "snap"))
    sh = batch_sharding(mesh)
    for leaf in jax.tree.leaves(dec_s._state):
        assert leaf.sharding.is_equivalent_to(sh, leaf.ndim)
    out_s = dec_s.tick_wire(pkts, rec)
    out_l = dec.tick_wire(pkts, rec)
    np.testing.assert_allclose(out_s, out_l, atol=1)


# ---------------------------------------------------------------------------
# Machine-checks of the sharding layer's performance thesis: the module-level
# claim "no collectives in the frame path" (parallel/sharding.py:8-11) is
# verified against the optimized SPMD HLO, and weak scaling is verified as
# constant per-device compiled cost 1->2->4->8 devices at fixed per-device
# batch.  (Wall-clock weak scaling is not measurable here: the 8 "devices"
# are threads on a single host core, so step time scales with TOTAL work by
# construction; per-device FLOPs from compiled.cost_analysis() is the
# deterministic equivalent.)
# ---------------------------------------------------------------------------

_COLLECTIVE_OPS = ("all-reduce", "all-gather", "collective-permute",
                   "all-to-all", "reduce-scatter", "collective-broadcast")


def _compile_sharded_roundtrip(model_path, n_devices, per_device_batch,
                               sample_rate_hz=16000):
    """Compile the full encode+decode lockstep tick over an n-device mesh
    (stream-axis batch sharding, exactly what ShardedEngine runs) and return
    the compiled artifact."""
    from lyra_tpu import config
    from lyra_tpu.codec.engine import DecoderEngine, EncoderEngine

    enc = EncoderEngine(sample_rate_hz, model_path, max_bitrate=3200)
    dec = DecoderEngine(sample_rate_hz, model_path, max_bitrate=3200)
    mesh = make_mesh(jax.devices()[:n_devices])
    b = per_device_batch * n_devices

    enc_state = shard_batch_tree(enc.init_state(b), mesh)
    dec_state = shard_batch_tree(dec.init_state(b), mesh)
    audio = shard_batch_tree(jnp.zeros((b, enc.hop_samples), jnp.float32), mesh)
    received = shard_batch_tree(jnp.ones((b,), bool), mesh)
    nq = shard_batch_tree(
        jnp.full((b,), 64 // config.BITS_PER_QUANTIZER, jnp.int32), mesh)

    def roundtrip(es, ds, a, r, n):
        indices, _, es = enc._step_impl(es, a, n)
        out, is_cn, ds = dec._step_impl(ds, indices, r)
        return out, is_cn, es, ds

    return (jax.jit(roundtrip)
            .lower(enc_state, dec_state, audio, received, nq)
            .compile())


def _assert_no_tensor_collectives(hlo: str, ctx: str = ""):
    """Every collective in the optimized HLO must be a scalar pred[]
    all-reduce (the fleet-wide CNG idle gate's `any(run_cng)` — one
    predicate bit over ICI per tick); any collective moving tensor data
    would break the sharding layer's performance thesis."""
    import re

    for op in _COLLECTIVE_OPS:
        for line in (l for l in hlo.splitlines() if f"{op}(" in l
                     or f"{op} = " in l or f"{op}-start" in l):
            m = re.search(rf"=\s*(\S+)\s+{op}", line)
            assert m, f"unparseable collective at {ctx}: {line.strip()[:160]}"
            shape = m.group(1)
            assert shape == "pred[]", (
                f"tensor collective '{op}' of shape {shape} in the frame "
                f"path HLO {ctx}: {line.strip()[:160]}")


def test_sharded_roundtrip_hlo_has_no_tensor_collectives(model_path):
    """GSPMD must partition the full frame path row-wise with zero
    cross-device tensor communication — grep the optimized HLO for every
    XLA collective op and verify the only survivor is the scalar idle-gate
    predicate reduction."""
    compiled = _compile_sharded_roundtrip(model_path, 8, 2)
    hlo = compiled.as_text()
    assert "fusion" in hlo or "convolution" in hlo  # sanity: real module
    _assert_no_tensor_collectives(hlo, "(n=8)")


def test_sharded_48k_roundtrip_has_no_tensor_collectives(model_path):
    """External-rate engines resample inside the step as a strided conv
    over [B, 1, W] (dsp/resampler.py); the batch dim must stay row-sharded
    with zero tensor collectives, like every other stage."""
    compiled = _compile_sharded_roundtrip(model_path, 8, 2,
                                          sample_rate_hz=48000)
    _assert_no_tensor_collectives(compiled.as_text(), "(48 kHz, n=8)")


@pytest.mark.full
def test_weak_scaling_constant_per_device_cost(model_path):
    """Fixed per-device batch, growing mesh: the per-device compiled module
    must stay the same size (same FLOPs, same HBM traffic) — i.e. adding
    chips adds capacity at zero marginal cost per chip."""
    flops, bytes_ = {}, {}
    for n in (1, 2, 4, 8):
        compiled = _compile_sharded_roundtrip(model_path, n, 2)
        cost = compiled.cost_analysis()
        cost = cost[0] if isinstance(cost, (list, tuple)) else cost
        flops[n] = float(cost.get("flops", 0.0))
        bytes_[n] = float(cost.get("bytes accessed", 0.0))
        _assert_no_tensor_collectives(compiled.as_text(), f"(n={n})")
    assert flops[1] > 0
    for n in (2, 4, 8):
        assert flops[n] == pytest.approx(flops[1], rel=0.02), flops
        if bytes_[1] > 0:
            assert bytes_[n] == pytest.approx(bytes_[1], rel=0.02), bytes_


def test_sharded_int8_roundtrip_has_no_tensor_collectives(model_path):
    """The int8 arithmetic mode lowers its own conv path (_int8_conv_acc);
    it must share the grouped-conv decomposition or GSPMD all-gathers the
    stream axis there too (the round-3 float fix, applied to both)."""
    from lyra_tpu import config
    from lyra_tpu.codec.engine import DecoderEngine, EncoderEngine

    enc = EncoderEngine(16000, model_path, mode="int8", max_bitrate=3200)
    dec = DecoderEngine(16000, model_path, mode="int8", max_bitrate=3200)
    mesh = make_mesh()
    b = 16
    enc_state = shard_batch_tree(enc.init_state(b), mesh)
    dec_state = shard_batch_tree(dec.init_state(b), mesh)
    audio = shard_batch_tree(jnp.zeros((b, enc.hop_samples), jnp.float32),
                             mesh)
    received = shard_batch_tree(jnp.ones((b,), bool), mesh)
    nq = shard_batch_tree(
        jnp.full((b,), 64 // config.BITS_PER_QUANTIZER, jnp.int32), mesh)

    def roundtrip(es, ds, a, r, n):
        indices, _, es = enc._step_impl(es, a, n)
        out, is_cn, ds = dec._step_impl(ds, indices, r)
        return out, is_cn, es, ds

    compiled = (jax.jit(roundtrip)
                .lower(enc_state, dec_state, audio, received, nq)
                .compile())
    _assert_no_tensor_collectives(compiled.as_text(), "(int8)")


def _make_bridge(model_path, cap, mesh=None, seed=7):
    from lyra_tpu.codec.engine import DecoderEngine, EncoderEngine
    from lyra_tpu.tools.conference import ConferenceBridge

    dec_e = enc_e = None
    if mesh is not None:
        dec_e = ShardedEngine(
            DecoderEngine(16000, model_path, max_bitrate=3200), mesh)
        enc_e = ShardedEngine(
            EncoderEngine(16000, model_path, max_bitrate=3200), mesh)
    return ConferenceBridge(cap, model_path=model_path, bitrate=3200,
                            seed=seed, dec_engine=dec_e, enc_engine=enc_e)


@pytest.mark.full
def test_sharded_bridge_matches_unsharded(model_path):
    """The conference bridge over ShardedEngines (shard-local mixer under
    shard_map) must be bit-identical to the unsharded bridge given the same
    shard-affine placement — across rooms, loss-driven CN exclusion, and
    room sizes up to a full shard."""
    from lyra_tpu.tools.stream_server import EncoderServer

    cap = 32
    mesh = make_mesh()
    sharded = _make_bridge(model_path, cap, mesh)
    plain = _make_bridge(model_path, cap)
    assert sharded.num_shards == 8 and plain.num_shards == 1

    # 3 rooms: one full-shard (4 = cap/ndev seats), one 3, one 2.
    rooms = {f"p{i}": "R0" for i in range(4)}
    rooms.update({f"q{i}": "R1" for i in range(3)})
    rooms.update({f"r{i}": "R2" for i in range(2)})
    slots = sharded.shard_affine_slots(rooms)
    per = cap // 8
    by_room = {}
    for sid, room in rooms.items():
        by_room.setdefault(room, set()).add(slots[sid] // per)
    assert all(len(s) == 1 for s in by_room.values())  # rooms shard-local
    sharded.add_participants(rooms, slots=slots)
    plain.add_participants(rooms, slots=slots)  # identical placement

    client = EncoderServer(cap, model_path=model_path, bitrate=3200)
    client.add_streams(list(rooms), slots=slots)
    rng = np.random.RandomState(11)
    for t in range(10):
        audio = rng.randint(-9000, 9000, (cap, 320)).astype(np.int16)
        pkts, sizes = client.tick_wire(audio)
        received = sizes > 0
        if t >= 1:
            received[slots["q1"]] = False  # sustained loss: PLC -> CN
        ws, ss = sharded.tick_wire(pkts, received, sizes)
        wp, sp = plain.tick_wire(pkts, received, sizes)
        assert np.array_equal(ss, sp), f"tick {t} sizes diverged"
        assert np.array_equal(ws, wp), f"tick {t} wire bytes diverged"
    # The loss actually drove the CN-exclusion branch of both mixers.
    assert sharded.is_comfort_noise("q1") and plain.is_comfort_noise("q1")


def test_sharded_mixer_hlo_has_zero_collectives(model_path):
    """The shard-local mixer must compile to ZERO collectives of any kind
    (not even the scalar idle-gate pred[] the engines are allowed): each
    shard mixes its own rooms from its own rows."""
    from lyra_tpu.tools.conference import _mix_step_sharded

    mesh = make_mesh()
    cap, hop = 32, 320
    fn = _mix_step_sharded(cap, mesh, "streams")
    pcm = shard_batch_tree(jnp.zeros((cap, hop), jnp.int16), mesh)
    excl = shard_batch_tree(jnp.zeros((cap,), bool), mesh)
    rooms = shard_batch_tree(jnp.zeros((cap,), jnp.int32), mesh)
    active = shard_batch_tree(jnp.ones((cap,), bool), mesh)
    hlo = fn.lower(pcm, excl, rooms, active).compile().as_text()
    for op in _COLLECTIVE_OPS:
        assert op not in hlo, f"collective '{op}' in the shard-local mixer"


def test_sharded_bridge_refuses_straddling_room(model_path):
    """A room placed across a shard boundary would silently mis-mix under
    the shard-local mixer; the tick must refuse it loudly."""
    cap = 16
    mesh = make_mesh()
    bridge = _make_bridge(model_path, cap, mesh)
    # Directed placement that straddles: seats 1 and 2 sit in different
    # 2-seat shards.
    bridge.add_participants({"a": "R", "b": "R"}, slots={"a": 1, "b": 2})
    pkts = np.zeros((cap, 8), np.uint8)
    with pytest.raises(ValueError, match="straddles mesh shards"):
        bridge.tick_wire(pkts, np.zeros(cap, bool))


def test_sharded_bridge_rejects_mismatched_meshes(model_path):
    """One sharded server and one plain (or two different meshes) cannot
    mix device-resident PCM coherently; construction must refuse."""
    from lyra_tpu.codec.engine import DecoderEngine
    from lyra_tpu.tools.conference import ConferenceBridge

    mesh = make_mesh()
    dec_e = ShardedEngine(
        DecoderEngine(16000, model_path, max_bitrate=3200), mesh)
    with pytest.raises(ValueError, match="share one mesh"):
        ConferenceBridge(16, model_path=model_path, dec_engine=dec_e)
