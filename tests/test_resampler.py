import itertools

import numpy as np
import pytest

from lyra_tpu import config
from lyra_tpu.dsp.resampler import Resampler

RATES = config.SUPPORTED_SAMPLE_RATES


@pytest.mark.parametrize("in_rate,out_rate", list(itertools.product(RATES, [16000])))
def test_lengths_hop_aligned(in_rate, out_rate):
    r = Resampler(in_rate, out_rate)
    hop_in = in_rate // 50
    assert r.output_length(hop_in) == out_rate // 50


@pytest.mark.parametrize("in_rate,out_rate", [(8000, 16000), (16000, 48000),
                                              (48000, 16000), (32000, 16000),
                                              (16000, 8000)])
def test_sine_preserved(in_rate, out_rate):
    """A mid-band sine survives resampling with correct frequency/amplitude."""
    r = Resampler(in_rate, out_rate)
    f = 400.0
    n = in_rate // 10  # 100 ms
    t_in = np.arange(n) / in_rate
    x = (10000 * np.sin(2 * np.pi * f * t_in)).astype(np.float32)
    y, _ = r.resample(r.init_state(1), x[None])
    y = np.asarray(y)[0]
    # skip transient, compare against delayed sine
    skip = r.samples_until_steady_state() + out_rate // 100
    seg = y[skip:-skip] if skip else y
    # amplitude should be ~10000
    amp = np.sqrt(2) * np.sqrt((seg.astype(np.float64) ** 2).mean())
    assert abs(amp - 10000) / 10000 < 0.03
    # frequency via zero crossings
    crossings = np.sum(np.diff(np.signbit(seg)))
    dur = len(seg) / out_rate
    est_freq = crossings / (2 * dur)
    assert abs(est_freq - f) / f < 0.02


def test_streaming_matches_single_shot():
    r = Resampler(48000, 16000)
    rng = np.random.default_rng(0)
    x = rng.normal(0, 5000, size=960 * 6).astype(np.float32)
    whole, _ = r.resample(r.init_state(1), x[None])
    state = r.init_state(1)
    parts = []
    for i in range(6):
        y, state = r.resample(state, x[None, i * 960 : (i + 1) * 960])
        parts.append(np.asarray(y)[0])
    np.testing.assert_allclose(np.concatenate(parts), np.asarray(whole)[0], atol=1e-3)


def test_batched_matches_single():
    r = Resampler(16000, 48000)
    rng = np.random.default_rng(1)
    x = rng.normal(0, 5000, size=(3, 320)).astype(np.float32)
    yb, _ = r.resample(r.init_state(3), x)
    for b in range(3):
        ys, _ = r.resample(r.init_state(1), x[b : b + 1])
        np.testing.assert_allclose(np.asarray(yb)[b], np.asarray(ys)[0], rtol=1e-5, atol=1e-3)


def test_downsample_antialiases():
    """Energy above the target Nyquist must be strongly attenuated."""
    r = Resampler(48000, 16000)
    n = 4800 * 2
    t = np.arange(n) / 48000
    x = (10000 * np.sin(2 * np.pi * 11000 * t)).astype(np.float32)  # >8 kHz
    y, _ = r.resample(r.init_state(1), x[None])
    y = np.asarray(y)[0][200:]
    out_rms = np.sqrt((y.astype(np.float64) ** 2).mean())
    assert out_rms < 200  # >30 dB attenuation


def test_steady_state_latency_value():
    assert Resampler(16000, 16000).samples_until_steady_state() == 34
    assert Resampler(48000, 16000).samples_until_steady_state() == 11
    assert Resampler(8000, 16000).samples_until_steady_state() == 68


def test_filter_and_buffer_failure_preserves_leftovers():
    """A generator failure must not consume banked leftover samples: the
    reference generates first and banks after (buffered_resampler.cc:63-90),
    so a transient decode failure retried later loses no playout samples."""
    from lyra_tpu.dsp.buffered_resampler import BufferedResampler

    br = BufferedResampler(16000, 48000)
    feed = np.arange(320, dtype=np.int16)
    out1 = br.filter_and_buffer(lambda n: feed[:n], 950)  # 317 in -> 951 out
    assert out1 is not None and br._leftover.size == 1

    leftovers_before = br._leftover.copy()
    assert br.filter_and_buffer(lambda n: None, 500) is None
    np.testing.assert_array_equal(br._leftover, leftovers_before)

    # Retry succeeds and the stream continues where it left off.
    out2 = br.filter_and_buffer(lambda n: feed[:n], 500)
    assert out2 is not None
    np.testing.assert_array_equal(out2[:1], leftovers_before)


def test_fused_backend_call_contract(model_path):
    """The fused backend must honor the BatchedStreamingModel call surface
    (model(state, x)) and reject modes its kernel cannot honor."""
    from lyra_tpu.models.streaming import SoundStreamEncoder

    enc = SoundStreamEncoder(model_path, backend="fused", block_streams=8)
    enc._fused._kernel.interpret = True  # pallas on the CPU test backend
    st = enc.init_state(8)
    x = np.zeros((8, 1, 320), np.float32)
    feats, st = enc(st, x)  # class-level __call__ routed through the kernel
    assert np.asarray(feats).shape[0] == 8
    with pytest.raises(NotImplementedError):
        enc.single(None, None)
    with pytest.raises(ValueError, match="fused"):
        SoundStreamEncoder(model_path, backend="fused", mode="int8")


def test_golden_vectors_pinned():
    """Pinned streaming outputs for every supported rate pair (reference:
    lyra/resampler.cc:31-49, resampler_test.cc:45-48 oracle strategy).

    The property tests above bound behavior; this bounds the *kernel*: a
    change that preserves sine amplitude/anti-aliasing but shifts the
    Kaiser-sinc design would still move these samples by far more than the
    tolerance (0.05 on an int16 scale ~= half an LSB of float noise).
    Regenerate with tests/golden/generate_resampler_goldens.py only for an
    intentional kernel change, and note it in PARITY.md."""
    import os

    import jax

    from lyra_tpu.dsp.resampler import Resampler

    path = os.path.join(os.path.dirname(__file__), "golden",
                        "resampler_goldens.npz")
    data = np.load(path)
    pairs = sorted({k[len("in_"):] for k in data.files if k.startswith("in_")})
    assert len(pairs) == 6
    for key in pairs:
        in_rate, out_rate = (int(v) for v in key.split("_"))
        r = Resampler(in_rate, out_rate)
        x = data[f"in_{key}"]
        want = data[f"out_{key}"]
        block = in_rate * 20 // 1000
        state = r.init_state(x.shape[0])
        fn = jax.jit(r.resample)
        got = []
        for b in range(x.shape[1] // block):
            y, state = fn(state, x[:, b * block:(b + 1) * block])
            got.append(np.asarray(y))
        got = np.concatenate(got, axis=1)
        assert got.shape == want.shape, key
        dev = np.abs(got - want).max()
        assert dev <= 0.05, f"{key}: max deviation {dev}"
        # The host-side streaming twin must pin to the same goldens.
        host = np.concatenate([
            r.resample_stream_np(np.zeros(2 * r.radius, np.float32),
                                 x[row])[0][None]
            for row in range(x.shape[0])])
        host_dev = np.abs(host - want).max()
        assert host_dev <= 0.05, f"{key} host path: max deviation {host_dev}"


@pytest.mark.parametrize("rates", [(8000, 16000), (16000, 8000),
                                   (16000, 32000), (32000, 16000),
                                   (16000, 48000), (48000, 16000)])
def test_conv_lowering_matches_gather_path(rates):
    """Pure up/down ratios lower as a strided conv (the serving-speed path,
    PERF.md round 3); the general-ratio gather formulation is the oracle —
    same taps, same windows, different only in reduction order."""
    import jax.numpy as jnp

    r = Resampler(*rates)
    assert r.up == 1 or r.down == 1  # all supported pairs are pure ratios
    rng = np.random.RandomState(3)
    n_in = (r.input_rate // 50) * 2  # two hops
    x = jnp.asarray(rng.uniform(-20000, 20000, (3, n_in)), jnp.float32)
    state = jnp.asarray(rng.uniform(-20000, 20000, (3, 2 * r.radius)),
                        jnp.float32)
    y_conv, st_conv = r.resample(state, x)

    # Inline gather oracle (the pre-round-3 lowering, verbatim math).
    n_out = r.output_length(n_in)
    ext = np.concatenate([np.asarray(state), np.asarray(x)], axis=1)
    n = np.arange(n_out)
    offs = (n * r.down) // r.up
    phase = (n * r.down) % r.up
    taps = r._taps[phase]
    idx = offs[:, None] + np.arange(r._taps.shape[1])[None, :]
    y_ref = np.einsum("bnk,nk->bn", ext[:, idx], taps)

    np.testing.assert_allclose(np.asarray(y_conv), y_ref,
                               rtol=1e-5, atol=2e-2)  # int16-scale inputs
    np.testing.assert_array_equal(np.asarray(st_conv), ext[:, -2 * r.radius:])
