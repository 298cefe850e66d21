"""Rational polyphase resampler (streaming, batched).

Functional equivalent of the reference's QResampler wrapper (reference:
lyra/resampler.cc:31-82, audio_dsp::QResampler): Kaiser-windowed-sinc
polyphase filtering with a kernel radius of 17 input samples
(`filter_radius_factor` math at lyra/resampler.cc:36-40), cutoff at 0.9 of
the lower Nyquist, and fully-primed reset semantics (2·radius input samples
of latency, reference: lyra/resampler.cc:75-81).

audio_dsp's exact kernel isn't vendored in the reference tree, so the filter
here is an independent Kaiser-sinc design with the same parameters; the
behavioral oracles are signal-preservation tests and the end-to-end LSD bar
at 8/32/48 kHz.

The compute path is a strided grouped convolution over `[B, T]` sample
blocks — one XLA conv per phase — so thousands of streams resample in one
kernel launch.
"""

from __future__ import annotations

from fractions import Fraction

import jax
import jax.numpy as jnp
import numpy as np

from lyra_tpu.dsp import utils

KERNEL_RADIUS_INPUT_SAMPLES = 17
CUTOFF_PROPORTION = 0.9
KAISER_BETA = 5.658


def _kaiser(tau: np.ndarray, radius: float, beta: float) -> np.ndarray:
    x = np.clip(tau / radius, -1.0, 1.0)
    return np.i0(beta * np.sqrt(np.maximum(0.0, 1.0 - x * x))) / np.i0(beta)


def design_polyphase_taps(up: int, down: int) -> np.ndarray:
    """Taps [up, 2R+1] for phases p: y[n] uses input window at offset
    floor(n*down/up) with fractional shift (n*down mod up)/up."""
    radius = KERNEL_RADIUS_INPUT_SAMPLES
    # cutoff in cycles/input-sample: 0.45 for upsampling, 0.45*up/down for
    # downsampling (anti-aliasing at the output Nyquist).
    cutoff = 0.5 * CUTOFF_PROPORTION * min(1.0, up / down)
    j = np.arange(-radius, radius + 1, dtype=np.float64)
    taps = np.zeros((up, 2 * radius + 1), np.float64)
    for p in range(up):
        frac = p / up
        tau = j - frac  # kernel sample positions relative to window start
        h = 2 * cutoff * np.sinc(2 * cutoff * tau) * _kaiser(tau, radius + 1.0, KAISER_BETA)
        taps[p] = h / h.sum()  # unit DC gain per phase
    return taps.astype(np.float32)


class Resampler:
    """Streaming rational resampler over a stream batch.

    State is the trailing 2·R input samples per stream (zeros = fully
    primed reset, reference: lyra/resampler.cc:58).
    """

    def __init__(self, input_rate: int, target_rate: int):
        if input_rate <= 0 or target_rate <= 0:
            raise ValueError("rates must be positive")
        self.input_rate = input_rate
        self.target_rate = target_rate
        frac = Fraction(target_rate, input_rate)
        self.up, self.down = frac.numerator, frac.denominator
        self._taps = design_polyphase_taps(self.up, self.down)  # [L, K]
        self.radius = KERNEL_RADIUS_INPUT_SAMPLES
        self._hist = 2 * self.radius

    @property
    def identity(self) -> bool:
        return self.up == 1 and self.down == 1

    def samples_until_steady_state(self) -> int:
        """2·radius input samples expressed at the output rate — the exact
        value the reference API reports (reference: lyra/resampler.cc:75-81,
        QResampler's fully-primed reset delay).  Note the filter's physical
        group delay is `radius` input samples (taps are center-designed);
        callers aligning waveforms sample-accurately should offset by
        radius, while this API mirrors the reference's conservative bound
        for discarding converter warmup."""
        return int(2.0 * self.radius * self.target_rate / self.input_rate)

    def init_state(self, batch_size: int) -> jnp.ndarray:
        return jnp.zeros((batch_size, self._hist), jnp.float32)

    def output_length(self, num_input: int) -> int:
        n = num_input * self.up
        if n % self.down != 0:
            raise ValueError(
                f"block of {num_input} samples not aligned to ratio "
                f"{self.up}/{self.down}"
            )
        return n // self.down

    def resample(self, state: jnp.ndarray, x: jnp.ndarray):
        """x [B, n_in] float samples → ([B, n_out], new_state)."""
        b, n_in = x.shape
        n_out = self.output_length(n_in)
        ext = jnp.concatenate([state, x.astype(jnp.float32)], axis=1)
        new_state = ext[:, -self._hist :]
        if self.up == 1 or self.down == 1:
            # Pure down/up ratios (every supported external rate vs 16 kHz)
            # run as a strided conv: XLA keeps the polyphase windows
            # implicit, where the general-ratio gather below materializes
            # [B, n_out, K] in HBM — at serving batch sizes that gather
            # made a 48 kHz fleet 3.3x slower than 16 kHz on TPU
            # (benchmarks/rate_cost_probe.py; fixed by this path).
            taps = jnp.asarray(self._taps)  # [up, K]
            out = jax.lax.conv_general_dilated(
                ext[:, None, :], taps[:, None, :],
                window_strides=(self.down if self.up == 1 else 1,),
                padding="VALID", dimension_numbers=("NCH", "OIH", "NCH"))
            if self.up == 1:
                return out[:, 0, :n_out], new_state
            m = n_out // self.up  # phase p of window m lands at m*up + p
            y = jnp.swapaxes(out[:, :, :m], 1, 2).reshape(b, n_out)
            return y, new_state
        k = self._taps.shape[1]
        n = np.arange(n_out)
        offs = (n * self.down) // self.up  # window start in ext coords
        phase = (n * self.down) % self.up
        taps = jnp.asarray(self._taps)[phase]  # [n_out, K]
        # windows: [B, n_out, K] via dynamic slice gather
        idx = offs[:, None] + np.arange(k)[None, :]  # [n_out, K] static
        windows = ext[:, idx]  # [B, n_out, K]
        y = jnp.einsum("bnk,nk->bn", windows, taps)
        return y, new_state

    def resample_np(self, x: np.ndarray) -> np.ndarray:
        """Single-shot numpy path for host-side/CLI use (stateless, primed)."""
        state = np.zeros(self._hist, np.float32)
        y, _ = self.resample_stream_np(state, np.asarray(x, np.float32))
        return y

    def resample_stream_np(self, state: np.ndarray, x: np.ndarray):
        """Host-side streaming resample of one variable-length block.

        Same math as `resample` but single-stream numpy, so host control
        paths (the pull-style BufferedResampler, CLIs) can push arbitrary
        block sizes without triggering XLA recompilation.
        state: [2R] trailing input samples; returns (y [n_out], new_state).
        """
        x = np.asarray(x, np.float32)
        n_out = self.output_length(x.shape[0])
        ext = np.concatenate([state, x])
        new_state = ext[-self._hist:].copy()
        if n_out == 0:
            return np.zeros(0, np.float32), new_state
        n = np.arange(n_out)
        offs = (n * self.down) // self.up
        phase = (n * self.down) % self.up
        taps = self._taps[phase]  # [n_out, K]
        idx = offs[:, None] + np.arange(self._taps.shape[1])[None, :]
        y = np.einsum("nk,nk->n", ext[idx], taps).astype(np.float32)
        return y, new_state


class StreamingResampler:
    """Push-style single-stream facade over `Resampler` (host-side).

    Mirrors the reference Resampler object API (reference:
    lyra/resampler.cc:31-82): int16-in/int16-out with clipping, carried FIR
    state, and a fully-primed `reset`.
    """

    def __init__(self, input_rate: int, target_rate: int):
        self._r = Resampler(input_rate, target_rate)
        self._state = np.zeros(self._r._hist, np.float32)

    def reset(self):
        self._state[:] = 0.0

    def samples_until_steady_state(self) -> int:
        return self._r.samples_until_steady_state()

    def resample(self, audio: np.ndarray) -> np.ndarray:
        if self._r.identity:
            return np.asarray(audio, np.int16)
        y, self._state = self._r.resample_stream_np(
            self._state, np.asarray(audio, np.float32))
        return utils.clip_to_int16_np(y)
