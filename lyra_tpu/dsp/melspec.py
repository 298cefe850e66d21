"""Streaming log-mel spectrogram extraction.

Parity target: the reference's LogMelSpectrogramExtractorImpl
(reference: lyra/log_mel_spectrogram_extractor_impl.cc:44-126), which wraps
audio_dsp::Spectrogram + audio_dsp::MelFilterbank:

* Hann window of `window_length` (periodic: 0.5 − 0.5·cos(2πi/N)), FFT size =
  next power of two, squared-magnitude spectrum, no normalization.
* Streaming: the spectrogram is primed with one window of zeros at create
  time, so each Extract() of one hop yields exactly one slice whose window
  spans [t·hop − (window − hop), t·hop + hop).
* Mel filterbank (HTK mel = 1127·ln(1 + f/700)) over
  [0, 0.495·sample_rate], band-edge triangles built per FFT bin with the
  band_mapper/weights construction of audio_dsp; Compute() takes sqrt of the
  squared-magnitude input (magnitude-domain mel).
* Features = log(max(mel, 500)) / 10, input at int16 scale.

Two implementations: a float64 numpy reference (host/tests) and a batched
f32 JAX version whose carried state is the previous `window − hop` samples
per stream.
"""

from __future__ import annotations

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np

from lyra_tpu import config

LOG_FLOOR = 500.0
NORM = 10.0
UPPER_FREQ_FACTOR = 0.495
LOWER_FREQ_LIMIT = 0.0


def silence_value() -> float:
    """Feature value of pure silence (reference: GetSilenceValue)."""
    return float(np.log(LOG_FLOOR) / NORM)


def _freq_to_mel(freq):
    return 1127.0 * np.log1p(np.asarray(freq, np.float64) / 700.0)


def next_power_of_two(n: int) -> int:
    p = 1
    while p < n:
        p *= 2
    return p


def mel_weight_matrix(
    num_fft_bins: int, sample_rate: int, num_mel_bins: int,
    lower_limit: float = LOWER_FREQ_LIMIT,
    upper_limit: float | None = None,
) -> np.ndarray:
    """audio_dsp::MelFilterbank weights as a dense [num_fft_bins, mels] matrix.

    Applied to the *magnitude* spectrum (caller takes sqrt of squared-mag).
    Construction mirrors the band_mapper/weights code of audio_dsp (same code
    as TF's MfccMelFilterbank, which was ported from it).
    """
    if upper_limit is None:
        upper_limit = UPPER_FREQ_FACTOR * sample_rate
    mel_low = _freq_to_mel(lower_limit)
    mel_hi = _freq_to_mel(upper_limit)
    mel_span = mel_hi - mel_low
    spacing = mel_span / (num_mel_bins + 1)
    # center_frequencies_[i] = mel_low + spacing * (i + 1), i in [0, mels]
    centers = mel_low + spacing * (np.arange(num_mel_bins + 1) + 1)

    hz_per_bin = 0.5 * sample_rate / (num_fft_bins - 1)
    start_index = int(1.5 + lower_limit / hz_per_bin)
    end_index = int(upper_limit / hz_per_bin)

    a = np.zeros((num_fft_bins, num_mel_bins), np.float64)
    channel = 0
    for i in range(num_fft_bins):
        if i < start_index or i > end_index:
            continue
        melf = _freq_to_mel(i * hz_per_bin)
        while channel < num_mel_bins and centers[channel] < melf:
            channel += 1
        band = channel - 1  # may be -1
        if band >= 0:
            w = (centers[band + 1] - melf) / (centers[band + 1] - centers[band])
        else:
            w = (centers[0] - melf) / (centers[0] - mel_low)
        if band >= 0:
            a[i, band] += w
        if band + 1 < num_mel_bins:
            a[i, band + 1] += 1.0 - w
    return a


def hann_window(n: int) -> np.ndarray:
    return 0.5 - 0.5 * np.cos(2.0 * np.pi * np.arange(n) / n)


@dataclasses.dataclass
class MelConfig:
    sample_rate: int
    hop: int
    window: int
    num_mel_bins: int

    @classmethod
    def for_rate(cls, sample_rate: int, num_mel_bins: int = config.NUM_MEL_BINS):
        hop = config.num_samples_per_hop(sample_rate)
        return cls(sample_rate, hop, config.OVERLAP_FACTOR * hop, num_mel_bins)

    @property
    def fft_size(self) -> int:
        return next_power_of_two(self.window)

    @property
    def num_fft_bins(self) -> int:
        return self.fft_size // 2 + 1


class LogMelExtractorRef:
    """Float64 numpy reference implementation (single stream, stateful)."""

    def __init__(self, cfg: MelConfig):
        self.cfg = cfg
        self._win = hann_window(cfg.window)
        self._mel = mel_weight_matrix(cfg.num_fft_bins, cfg.sample_rate, cfg.num_mel_bins)
        self._prev = np.zeros(cfg.window - cfg.hop, np.float64)

    def reset(self):
        self._prev[:] = 0.0

    def extract(self, hop_samples: np.ndarray) -> np.ndarray:
        """hop_samples: [hop] int16-scale values → [num_mel_bins] features."""
        x = np.asarray(hop_samples, np.float64)
        frame = np.concatenate([self._prev, x])
        self._prev = frame[self.cfg.hop :].copy()
        spec = np.abs(np.fft.rfft(frame * self._win, n=self.cfg.fft_size)) ** 2
        mel = np.sqrt(spec) @ self._mel
        return (np.log(np.maximum(mel, LOG_FLOOR)) / NORM).astype(np.float32)


def dft_matrices(window: int, fft_size: int) -> tuple[np.ndarray, np.ndarray]:
    """Real-DFT as two matmul matrices [window, bins]: X = x@C + i·x@S.

    On TPU a [B, window] @ [window, bins] matmul is an order of magnitude
    faster than the FFT custom call for these sizes, and it fuses with the
    surrounding window/mel math.
    """
    bins = fft_size // 2 + 1
    n = np.arange(window)[:, None]
    k = np.arange(bins)[None, :]
    ang = 2.0 * np.pi * n * k / fft_size
    return (np.cos(ang).astype(np.float32), (-np.sin(ang)).astype(np.float32))


def idft_matrices(fft_size: int) -> tuple[np.ndarray, np.ndarray]:
    """Inverse real-DFT matmul matrices [bins, fft_size]:
    x = re@Ci + im@Si (the exact `irfft`)."""
    bins = fft_size // 2 + 1
    k = np.arange(bins)[:, None]
    n = np.arange(fft_size)[None, :]
    ang = 2.0 * np.pi * k * n / fft_size
    w = np.full((bins, 1), 2.0 / fft_size)
    w[0] = w[-1] = 1.0 / fft_size
    return ((np.cos(ang) * w).astype(np.float32),
            (-np.sin(ang) * w).astype(np.float32))


def num_used_fft_bins(weights: np.ndarray, num_fft_bins: int) -> int:
    """Last FFT bin carrying nonzero mel mass, as a bin count.

    Tail bins with zero weight (e.g. Nyquist) contribute nothing to
    analysis or synthesis; truncating to this count is exact and
    lane-aligns the DFT matmuls on TPU (512 tiles where 513 pads to 640).
    Shared by the extractor and the CNG inverse so the analysis and
    synthesis bin ranges can never drift apart."""
    nz = np.flatnonzero(np.abs(np.asarray(weights)).sum(axis=1) > 0)
    return int(nz[-1]) + 1 if nz.size else num_fft_bins


class LogMelExtractor:
    """Batched f32 JAX implementation over [num_streams, hop] frames.

    `precision` sets the DFT/mel matmul passes: HIGH (3-pass bf16,
    ~1e-6 rel — the default, matches the float64 host reference within
    test tolerances) or DEFAULT (1-pass bf16, ~4e-3 rel) for consumers
    whose downstream is insensitive (probe knob; see benchmarks/).
    """

    def __init__(self, cfg: MelConfig, precision=None):
        self.cfg = cfg
        self._precision = (jax.lax.Precision.HIGH if precision is None
                           else precision)
        self._win = jnp.asarray(hann_window(cfg.window), jnp.float32)
        self._mel = jnp.asarray(
            mel_weight_matrix(cfg.num_fft_bins, cfg.sample_rate, cfg.num_mel_bins),
            jnp.float32,
        )
        self._num_used_bins = num_used_fft_bins(
            np.asarray(self._mel), cfg.num_fft_bins)
        self._mel = self._mel[: self._num_used_bins]
        c, s = dft_matrices(cfg.window, cfg.fft_size)
        self._dft_cos = jnp.asarray(c[:, : self._num_used_bins])
        self._dft_sin = jnp.asarray(s[:, : self._num_used_bins])

    def init_state(self, batch_size: int) -> jnp.ndarray:
        return jnp.zeros((batch_size, self.cfg.window - self.cfg.hop), jnp.float32)

    def extract(self, state: jnp.ndarray, frames: jnp.ndarray):
        """frames [B, hop] int16-scale → ([B, mels], new_state)."""
        x = frames.astype(jnp.float32)
        full = jnp.concatenate([state, x], axis=1)  # [B, window]
        new_state = full[:, self.cfg.hop :]
        xw = full * self._win[None]
        hp = self._precision
        re = jnp.matmul(xw, self._dft_cos, precision=hp)
        im = jnp.matmul(xw, self._dft_sin, precision=hp)
        mag = jnp.sqrt(re * re + im * im)
        mel = jnp.matmul(mag, self._mel, precision=hp)
        feats = jnp.log(jnp.maximum(mel, LOG_FLOOR)) / NORM
        return feats, new_state
