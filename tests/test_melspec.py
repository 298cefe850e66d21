import numpy as np
import pytest

from lyra_tpu import config
from lyra_tpu.dsp import melspec
from lyra_tpu.utils import wav


def test_silence_value():
    assert np.isclose(melspec.silence_value(), np.log(500.0) / 10.0)


def test_silence_gives_floor():
    cfg = melspec.MelConfig.for_rate(16000, 64)
    ext = melspec.LogMelExtractorRef(cfg)
    feats = ext.extract(np.zeros(cfg.hop, np.int16))
    np.testing.assert_allclose(feats, melspec.silence_value(), rtol=1e-6)


def test_spectrogram_matches_tf_audio_spectrogram():
    """Window/FFT/magnitude² parity with audio_dsp::Spectrogram via the TF op
    that wraps the same C++ class (tf.raw_ops.AudioSpectrogram)."""
    tf = pytest.importorskip("tensorflow")
    rng = np.random.default_rng(5)
    n = 640 * 4
    x = rng.integers(-20000, 20000, size=n).astype(np.int16)

    cfg = melspec.MelConfig(16000, 320, 640, 64)
    # TF op: input float in [-1,1] convention is not required — it windows raw
    # values; feed int16-scale floats to match the reference usage.
    spec_tf = tf.raw_ops.AudioSpectrogram(
        input=x.astype(np.float32).reshape(-1, 1),
        window_size=640, stride=320, magnitude_squared=True,
    ).numpy()[0]

    # Our math: same window position when no zero-priming (first TF slice
    # covers samples [0, 640)).
    win = melspec.hann_window(640)
    ours = []
    for start in range(0, n - 640 + 1, 320):
        frame = x[start : start + 640].astype(np.float64)
        ours.append(np.abs(np.fft.rfft(frame * win, n=1024)) ** 2)
    ours = np.stack(ours)
    assert spec_tf.shape == ours.shape
    np.testing.assert_allclose(spec_tf, ours, rtol=2e-4, atol=1.0)


def test_jax_matches_numpy_reference():
    rng = np.random.default_rng(6)
    cfg = melspec.MelConfig.for_rate(16000, config.NUM_MEL_BINS)
    hops = rng.integers(-30000, 30000, size=(10, cfg.hop)).astype(np.int16)

    ref = melspec.LogMelExtractorRef(cfg)
    ref_feats = np.stack([ref.extract(h) for h in hops])

    ext = melspec.LogMelExtractor(cfg)
    state = ext.init_state(1)
    got = []
    for h in hops:
        f, state = ext.extract(state, h[None].astype(np.float32))
        got.append(np.asarray(f)[0])
    got = np.stack(got)
    np.testing.assert_allclose(got, ref_feats, atol=5e-3)


def test_streaming_priming():
    """First hop's window is [zeros, hop] — matches the create-time zero
    priming of the reference (log_mel_spectrogram_extractor_impl.cc:69-77)."""
    rng = np.random.default_rng(7)
    cfg = melspec.MelConfig.for_rate(16000, 64)
    hop = rng.integers(-30000, 30000, size=cfg.hop).astype(np.int16)
    ref = melspec.LogMelExtractorRef(cfg)
    f1 = ref.extract(hop)
    # manual: window = [320 zeros, hop]
    win = melspec.hann_window(cfg.window)
    frame = np.concatenate([np.zeros(cfg.hop), hop.astype(np.float64)])
    spec = np.abs(np.fft.rfft(frame * win, n=cfg.fft_size)) ** 2
    mel = np.sqrt(spec) @ melspec.mel_weight_matrix(cfg.num_fft_bins, 16000, 64)
    expect = np.log(np.maximum(mel, 500.0)) / 10.0
    np.testing.assert_allclose(f1, expect, rtol=1e-6)


def test_mel_matrix_properties():
    m = melspec.mel_weight_matrix(513, 16000, 160)
    assert m.shape == (513, 160)
    assert (m >= 0).all()
    # every mel channel receives some energy
    assert (m.sum(0) > 0).all()
    # DC bin excluded
    assert (m[0] == 0).all()


def test_wav_roundtrip(tmp_path):
    rng = np.random.default_rng(8)
    samples = rng.integers(-32768, 32768, size=1000).astype(np.int16)
    p = str(tmp_path / "t.wav")
    wav.write_wav_int16(p, samples, 16000)
    back = wav.read_wav_int16(p)
    assert back.sample_rate_hz == 16000
    assert back.num_channels == 1
    np.testing.assert_array_equal(back.samples, samples)


def test_read_reference_testdata(testdata_path):
    d = wav.read_wav_int16(f"{testdata_path}/sample1_16kHz.wav")
    assert d.sample_rate_hz == 16000
    assert d.num_channels == 1
    assert len(d.samples) > 16000
