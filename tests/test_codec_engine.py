"""Batched lockstep engine vs single-stream facade equivalence.

The DecoderEngine vectorizes the PLC machine over streams; the LyraDecoder
facade implements it at sample granularity. Fed the same packets in hop
lockstep they must produce the same audio — this pins the vectorized
`jnp.where` state machine to the reference-shaped scalar one.
"""

import numpy as np
import pytest

from lyra_tpu import config, packet
from lyra_tpu.codec.decoder import LyraDecoder
from lyra_tpu.codec.encoder import LyraEncoder
from lyra_tpu.codec.engine import DecoderEngine, EncoderEngine, INTERNAL_HOP
from lyra_tpu.utils import wav

# Loss pattern exercising every PLC state: normal, concealment (4), fade to
# CNG (2), pure CNG, fade back, normal again.
LOSS_PATTERN = ([True] * 3 + [False] * 9 + [True] * 4)


@pytest.fixture(scope="module")
def speech(testdata_path):
    data = wav.read_wav_int16(f"{testdata_path}/sample1_16kHz.wav")
    n = len(LOSS_PATTERN) * INTERNAL_HOP
    return data.samples[:n].reshape(len(LOSS_PATTERN), INTERNAL_HOP)


def test_engine_matches_facade_under_loss(model_path, speech):
    num_bits = 120
    nq = num_bits // config.BITS_PER_QUANTIZER

    # Encode every hop with the batched encoder engine (B=1).
    enc = EncoderEngine(16000, model_path)
    es = enc.init_state(1)
    packets = []
    for t in range(speech.shape[0]):
        idx, _, es = enc.step(es, speech[t][None].astype(np.float32), nq)
        packets.append(packet.pack_indices(np.asarray(idx)[0], num_bits))

    # Path A: single-stream facade.
    dec = LyraDecoder(16000, model_path=model_path, seed=0)
    out_a = []
    for t, received in enumerate(LOSS_PATTERN):
        if received:
            assert dec.set_encoded_packet(packets[t])
        out_a.append(dec.decode_samples(INTERNAL_HOP))
    out_a = np.concatenate(out_a)

    # Path B: lockstep engine (B=1, same CNG seed).
    eng = DecoderEngine(16000, model_path)
    st = eng.init_state(1, seed=0)
    out_b, comfort = [], []
    for t, received in enumerate(LOSS_PATTERN):
        idx = packet.unpack_indices(packets[t])
        padded = np.full((1, eng.rvq.num_stages), -1, np.int32)
        padded[0, : idx.size] = idx
        audio, is_cn, st = eng.step(st, padded, np.array([received]))
        out_b.append(np.asarray(audio)[0])
        comfort.append(bool(np.asarray(is_cn)[0]))
    out_b = np.concatenate(out_b).astype(np.int16)

    # f32-vs-f64 cos in the crossfade can differ by 1 LSB after truncation.
    np.testing.assert_allclose(out_a.astype(int), out_b.astype(int), atol=1)

    # Comfort-noise flag: 4 concealment hops (ticks 3-6) then the fade
    # completes at tick 8; CNG holds until the first received packet (tick
    # 12) starts fading it back out.
    expected_comfort = [False] * 8 + [True] * 4 + [False] * 4
    assert comfort == expected_comfort


def test_engine_batch_rows_independent(model_path, speech):
    """Streams in different PLC states must not interact: a B=2 batch where
    row 1 loses packets must equal the same streams run separately."""
    nq = 120 // config.BITS_PER_QUANTIZER
    enc = EncoderEngine(16000, model_path)
    es = enc.init_state(1)
    indices = []
    for t in range(8):
        idx, _, es = enc.step(es, speech[t][None].astype(np.float32), nq)
        indices.append(np.asarray(idx)[0])

    eng = DecoderEngine(16000, model_path)
    recv_b = [True, True, False, False, False, False, False, True]

    # Batched run: row0 receives everything, row1 follows recv_b.
    st = eng.init_state(2, seed=0)
    got0, got1 = [], []
    for t in range(8):
        batch_idx = np.stack([indices[t], indices[t]])
        received = np.array([True, recv_b[t]])
        audio, _, st = eng.step(st, batch_idx, received)
        got0.append(np.asarray(audio)[0])
        got1.append(np.asarray(audio)[1])

    # Single-stream runs. Row seeds differ inside a batch (per-row RNG
    # split), so compare only through the concealment hops for row1 (no CNG
    # content until fade begins at tick 6).
    st = eng.init_state(1, seed=0)
    solo0 = []
    for t in range(8):
        audio, _, st = eng.step(st, indices[t][None], np.array([True]))
        solo0.append(np.asarray(audio)[0])

    np.testing.assert_allclose(
        np.concatenate(got0), np.concatenate(solo0), atol=1)

    # Row 1's concealment ticks (2..5) are CNG-free -> deterministic.
    st = eng.init_state(1, seed=0)
    solo1 = []
    for t in range(8):
        audio, _, st = eng.step(st, indices[t][None], np.array([recv_b[t]]))
        solo1.append(np.asarray(audio)[0])
    for t in range(6):
        np.testing.assert_allclose(got1[t], solo1[t], atol=1)


def test_bf16_mode_meets_lsd_bar(model_path, speech):
    """The TPU throughput mode (bf16 conv compute) must stay within the
    reference quality bar (LSD < 2.0, lyra/lyra_integration_test.cc:141)."""
    from lyra_tpu.dsp import melspec
    from lyra_tpu.dsp import utils as dsp_utils

    enc = EncoderEngine(16000, model_path, mode="bf16")
    dec = DecoderEngine(16000, model_path, mode="bf16")
    es, ds = enc.init_state(1), dec.init_state(1)
    n = speech.shape[0]
    outs = []
    for t in range(n):
        idx, _, es = enc.step(es, speech[t][None].astype(np.float32), 46)
        audio, _, ds = dec.step(ds, np.asarray(idx), np.array([True]))
        outs.append(np.asarray(audio)[0])
    cfg = melspec.MelConfig.for_rate(16000, config.NUM_FEATURES)
    ein, edec = melspec.LogMelExtractorRef(cfg), melspec.LogMelExtractorRef(cfg)
    lsds = [dsp_utils.log_spectral_distance(
        ein.extract(speech[t]), edec.extract(outs[t])) for t in range(n)]
    assert float(np.mean(lsds[3:])) < 2.0


def test_int8_state_compression_meets_lsd_bar(model_path, speech):
    """state_compression='int8' (conv contexts stored int8+scale in HBM,
    models/streaming.py) must also hold the reference quality bar, through
    a full PLC cycle so requantization error is exercised across every
    state regime, and the compressed state must actually be int8."""
    from lyra_tpu.dsp import melspec
    from lyra_tpu.dsp import utils as dsp_utils

    enc = EncoderEngine(16000, model_path, mode="bf16",
                        state_compression="int8")
    dec = DecoderEngine(16000, model_path, mode="bf16",
                        state_compression="int8")
    es, ds = enc.init_state(1), dec.init_state(1)
    big = [k for k, v in ds["gan"].items() if isinstance(v, dict)]
    assert big, "no compressed leaves in the GAN state"
    assert all(ds["gan"][k]["q"].dtype == np.int8 for k in big)
    n = speech.shape[0]
    outs = []
    for t in range(n):
        idx, _, es = enc.step(es, speech[t][None].astype(np.float32), 46)
        audio, _, ds = dec.step(ds, np.asarray(idx),
                                np.array([LOSS_PATTERN[t]]))
        outs.append(np.asarray(audio)[0])
    cfg = melspec.MelConfig.for_rate(16000, config.NUM_FEATURES)
    ein, edec = melspec.LogMelExtractorRef(cfg), melspec.LogMelExtractorRef(cfg)
    lsds = [dsp_utils.log_spectral_distance(
        ein.extract(speech[t]), edec.extract(outs[t]))
        for t in range(n) if LOSS_PATTERN[t]]
    assert float(np.mean(lsds[1:])) < 2.0

    # Admission still works on the compressed representation.
    fresh = dec.reset_rows(ds, np.array([True]))
    for k in big:
        assert fresh["gan"][k]["q"].dtype == np.int8
        np.testing.assert_array_equal(np.asarray(fresh["gan"][k]["q"]), 0)


def test_encoder_facade_packet_bytes(model_path, speech):
    enc = LyraEncoder(16000, bitrate=6000, model_path=model_path)
    pkt = enc.encode(speech[0])
    assert isinstance(pkt, bytes) and len(pkt) == config.packet_size(120)
    assert enc.set_bitrate(9200) and enc.bitrate == 9200
    pkt = enc.encode(speech[1])
    assert len(pkt) == config.packet_size(184)
    assert not enc.set_bitrate(1234)
    assert enc.encode(speech[0][:100]) is None


def test_last_frame_estimator_conditions_concealment(model_path, speech):
    """feature_estimator='last_frame' carries the last received features into
    concealment conditioning; 'zero' (the reference's shipped estimator)
    conditions on zeros."""
    nq = 120 // config.BITS_PER_QUANTIZER
    enc = EncoderEngine(16000, model_path)
    es = enc.init_state(1)
    idx, _, es = enc.step(es, speech[5][None].astype(np.float32), nq)
    idx = np.asarray(idx)

    for est, expect_last in (("zero", False), ("last_frame", True)):
        dec = DecoderEngine(16000, model_path, feature_estimator=est)
        st = dec.init_state(1)
        audio, _, st = dec.step(st, idx, np.array([True]))
        lossy = np.asarray(dec.rvq.decode(idx))
        est_feats = np.asarray(dec.estimator.estimate(st["est"]))
        if expect_last:
            np.testing.assert_allclose(est_feats, lossy, atol=1e-5)
        else:
            np.testing.assert_array_equal(est_feats, 0.0)
        # The concealment tick consumes the estimate; different estimators
        # must produce different concealment audio on non-trivial features.
        a1, _, _ = dec.step(st, idx, np.array([False]))
        if est == "zero":
            zero_audio = np.asarray(a1)
        else:
            assert np.abs(np.asarray(a1) - zero_audio).max() > 0


def test_decaying_estimator_fades(model_path, speech):
    nq = 120 // config.BITS_PER_QUANTIZER
    enc = EncoderEngine(16000, model_path)
    es = enc.init_state(1)
    idx, _, es = enc.step(es, speech[5][None].astype(np.float32), nq)
    idx = np.asarray(idx)

    dec = DecoderEngine(16000, model_path, feature_estimator="decaying")
    st = dec.init_state(1)
    _, _, st = dec.step(st, idx, np.array([True]))
    lossy = np.asarray(dec.rvq.decode(idx))
    for k in range(1, 4):
        _, _, st = dec.step(st, idx, np.array([False]))
        np.testing.assert_allclose(
            np.asarray(st["est"]), lossy * dec.estimator.decay ** k,
            rtol=1e-5, atol=1e-5)


def test_engines_with_max_bitrate_match_default(model_path):
    """The single-bitrate serving specialization cannot change results for
    traffic within the cap."""
    from lyra_tpu.codec.engine import DecoderEngine, EncoderEngine

    rng = np.random.default_rng(9)
    audio = rng.integers(-8000, 8000, (4, 320)).astype(np.float32)
    nq = np.full(4, 16, np.int32)

    enc_a = EncoderEngine(16000, model_path)
    enc_b = EncoderEngine(16000, model_path, max_bitrate=3200)
    sa, sb = enc_a.init_state(4), enc_b.init_state(4)
    idx_a, _, sa = enc_a.step(sa, audio, nq)
    idx_b, _, sb = enc_b.step(sb, audio, nq)
    np.testing.assert_array_equal(np.asarray(idx_a), np.asarray(idx_b))

    dec_a = DecoderEngine(16000, model_path)
    dec_b = DecoderEngine(16000, model_path, max_bitrate=3200)
    da, db = dec_a.init_state(4), dec_b.init_state(4)
    received = np.array([True, True, False, True])
    out_a, cn_a, da = dec_a.step(da, np.asarray(idx_a), received)
    out_b, cn_b, db = dec_b.step(db, np.asarray(idx_b), received)
    np.testing.assert_allclose(np.asarray(out_a), np.asarray(out_b), atol=1e-3)
    np.testing.assert_array_equal(np.asarray(cn_a), np.asarray(cn_b))


def test_engine_matches_facade_mixed_loss_per_stream(model_path, speech):
    """Batched engine with per-stream loss patterns vs one facade per
    stream: streams in different PLC states must not bleed into each other
    through the vectorized where-masks."""
    num_bits = 64
    nq = num_bits // config.BITS_PER_QUANTIZER
    ticks = speech.shape[0]
    patterns = [
        [True] * ticks,                                   # clean
        [True] * 2 + [False] * 10 + [True] * 4,           # deep burst → CNG
        [t % 3 != 2 for t in range(ticks)],               # scattered loss
    ]
    b = len(patterns)

    enc = EncoderEngine(16000, model_path)
    es = enc.init_state(1)
    packets = []
    for t in range(ticks):
        idx, _, es = enc.step(es, speech[t][None].astype(np.float32), nq)
        packets.append(packet.pack_indices(np.asarray(idx)[0], num_bits))

    # Path A: independent single-stream facades.
    facade_out = []
    for pattern in patterns:
        dec = LyraDecoder(16000, model_path=model_path, seed=0)
        hops = []
        for t, received in enumerate(pattern):
            if received:
                assert dec.set_encoded_packet(packets[t])
            hops.append(dec.decode_samples(INTERNAL_HOP))
        facade_out.append(np.concatenate(hops))

    # Path B: one batched engine advancing all three patterns at once.
    eng = DecoderEngine(16000, model_path)
    st = eng.init_state(b, seed=0)
    engine_out = [[] for _ in range(b)]
    for t in range(ticks):
        idx = packet.unpack_indices(packets[t])
        padded = np.full((b, eng.rvq.num_stages), -1, np.int32)
        padded[:, : idx.size] = idx
        received = np.array([p[t] for p in patterns])
        audio, _, st = eng.step(st, padded, received)
        for i in range(b):
            engine_out[i].append(np.asarray(audio)[i])

    # Streams 0 and 2 never reach the CNG fade (scattered losses stay in
    # concealment), so they must match the facade sample-exactly even while
    # batched next to a stream deep in comfort noise — the strongest
    # cross-stream-isolation check.
    for i in (0, 2):
        np.testing.assert_allclose(
            np.concatenate(engine_out[i]), facade_out[i], atol=1.0,
            err_msg=f"stream {i} pattern diverged")

    # Stream 1 enters comfort noise: its CNG phases come from its *row*'s
    # RNG lineage (row 1 ≠ the facade's row 0 — per-stream noise must
    # differ by design), so compare sample-exactly outside CNG involvement
    # (ticks 0-5 concealment, 14-15 recovered) and by spectral envelope
    # during the fade/CNG span (same noise estimate ⇒ same log-mel shape).
    from lyra_tpu.dsp import melspec
    from lyra_tpu.dsp import utils as dsp_utils

    for t in list(range(6)) + [14, 15]:
        np.testing.assert_allclose(
            engine_out[1][t], facade_out[1][t * INTERNAL_HOP:(t + 1) * INTERNAL_HOP],
            atol=1.0, err_msg=f"stream 1 tick {t} diverged")
    cfg = melspec.MelConfig.for_rate(16000, config.NUM_FEATURES)
    ea, eb = melspec.LogMelExtractorRef(cfg), melspec.LogMelExtractorRef(cfg)
    for t in range(6, 14):
        fa = ea.extract(np.concatenate(engine_out[1])[t * INTERNAL_HOP:(t + 1) * INTERNAL_HOP])
        fb = eb.extract(facade_out[1][t * INTERNAL_HOP:(t + 1) * INTERNAL_HOP])
        assert dsp_utils.log_spectral_distance(fa, fb) < 1.0, f"tick {t}"


def test_idle_stage_gating_is_bit_identical(model_path, speech):
    """The lax.cond fast path (skip CNG synthesis when no stream is fading
    or in comfort noise) must be indistinguishable from the always-run step.

    Drives both engines through every gate combination: all-received steady
    state, partial loss, a full-fleet outage deep enough to saturate comfort
    noise (concealment 4 hops + fade 2 hops), and recovery.
    """
    num_bits = 120
    nq = num_bits // config.BITS_PER_QUANTIZER
    batch = 3
    # Per-stream loss patterns: row 0 healthy until the outage, row 1 loses
    # early (enters CN alone), row 2 sporadic single losses.
    pattern = np.ones((16, batch), bool)
    pattern[2:11, 1] = False            # row 1: 9-tick burst -> saturated CN
    pattern[5, 2] = pattern[9, 2] = False  # row 2: sporadic
    pattern[11:14, :] = False           # ticks 11-13: full-fleet outage

    enc = EncoderEngine(16000, model_path)
    es = enc.init_state(batch)
    gated = DecoderEngine(16000, model_path)
    plain = DecoderEngine(16000, model_path, gate_idle_stages=False)
    assert gated._gate_idle and not plain._gate_idle
    sg = gated.init_state(batch, seed=0)
    sp = plain.init_state(batch, seed=0)

    rng = np.random.RandomState(7)
    for t in range(pattern.shape[0]):
        hop = speech[t % speech.shape[0]][None] + rng.randint(
            -50, 50, (batch, INTERNAL_HOP))
        idx, _, es = enc.step(es, hop.astype(np.float32), nq)
        idx = np.asarray(idx)
        a_g, cn_g, sg = gated.step(sg, idx, pattern[t])
        a_p, cn_p, sp = plain.step(sp, idx, pattern[t])
        np.testing.assert_array_equal(np.asarray(cn_g), np.asarray(cn_p), err_msg=f"tick {t}")
        np.testing.assert_allclose(
            np.asarray(a_g), np.asarray(a_p), atol=0, rtol=0,
            err_msg=f"tick {t}")
    # States converge too (same trees, same values).
    import jax
    for lg, lp in zip(jax.tree.leaves(sg), jax.tree.leaves(sp)):
        np.testing.assert_allclose(np.asarray(lg), np.asarray(lp),
                                   atol=0, rtol=0)


def test_engine_config_errors_are_clear(model_path):
    """Misconfiguration must fail loudly with the real cause, not fall back
    silently or surface an internal-arithmetic error."""
    with pytest.raises(ValueError, match="feature_estimator"):
        DecoderEngine(16000, model_path, feature_estimator="decay")  # typo
    with pytest.raises(ValueError, match="bitrate 3000 is not supported"):
        DecoderEngine(16000, model_path, max_bitrate=3000)
    with pytest.raises(ValueError, match="bitrate 3000 is not supported"):
        EncoderEngine(16000, model_path, max_bitrate=3000)


def test_hop_generator_rejects_before_advancing_state(model_path):
    """An oversized generate_samples request must not advance the streaming
    model state: a retry with a valid size must produce the same audio an
    un-poked generator would (reference validates before generating,
    generative_model_interface.h:84-89)."""
    from lyra_tpu.codec.decoder import LyraDecoder

    d1 = LyraDecoder(16000, model_path=model_path, seed=0)
    d2 = LyraDecoder(16000, model_path=model_path, seed=0)
    pkt = bytes(config.packet_size(64))
    assert d1.set_encoded_packet(pkt) and d2.set_encoded_packet(pkt)
    gen1, gen2 = d1._model, d2._model
    assert gen1.generate_samples(400) is None  # oversized: must be a no-op
    a1 = gen1.generate_samples(320)
    a2 = gen2.generate_samples(320)
    np.testing.assert_array_equal(np.asarray(a1), np.asarray(a2))


def test_engine_dtx_freezes_conv_state_per_stream(model_path, speech):
    """Engine-level DTX: a noise-classified hop emits is_noise and leaves
    that stream's SoundStream conv state untouched (the reference's early
    return, lyra/lyra_encoder.cc:131-141) while other streams in the same
    batch advance normally."""
    nq = 64 // config.BITS_PER_QUANTIZER
    enc = EncoderEngine(16000, model_path, enable_dtx=True)
    es = enc.init_state(2)
    x0 = np.stack([speech[0], speech[0]]).astype(np.float32)

    # Huge forced bound => everything classifies as noise this step.
    forced = enc._state_with_bound(es, 1e9)
    idx, is_noise, es_after = enc.step(forced, x0, nq)
    assert bool(np.asarray(is_noise)[0]) and bool(np.asarray(is_noise)[1])
    for k, v in es_after["soundstream"].items():
        np.testing.assert_array_equal(  # conv state frozen on noise hops
            np.asarray(v), np.asarray(forced["soundstream"][k]), err_msg=k)

    # Negative bound => everything is speech: state advances, no DTX.
    forced = enc._state_with_bound(es, -1.0)
    idx, is_noise, es_after = enc.step(forced, x0, nq)
    assert not np.asarray(is_noise).any()
    moved = any(
        not np.array_equal(np.asarray(v),
                           np.asarray(forced["soundstream"][k]))
        for k, v in es_after["soundstream"].items())
    assert moved

    # Per-stream independence: a stream whose hop was DTX-suppressed then
    # encodes the next speech hop exactly like a stream that never saw the
    # suppressed hop's state advance.
    idx_ref, _, _ = enc.step(
        enc._state_with_bound(es, -1.0), x0, nq)  # fresh state, speech hop
    noise_first = enc._state_with_bound(es, 1e9)
    _, _, st = enc.step(noise_first, x0, nq)      # suppressed hop
    idx_after, _, _ = enc.step(
        enc._state_with_bound(st, -1.0), x0, nq)  # same speech hop
    np.testing.assert_array_equal(np.asarray(idx_after),
                                  np.asarray(idx_ref))
