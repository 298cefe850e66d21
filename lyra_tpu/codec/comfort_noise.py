"""Comfort-noise generation from log-mel noise features, batched.

Functional parity with the reference ComfortNoiseGenerator (reference:
lyra/comfort_noise_generator.cc:38-119): 160 log-mel features → exp →
mel-to-linear-spectrum estimate → random phase → inverse FFT →
overlap-added hop of int16-scale samples.

The mel pseudo-inverse here normalizes each mel channel by its filterbank
mass before interpolating back to FFT bins (audio_dsp's EstimateInverse is
not vendored in the reference tree; this construction makes
Extract(CNG(f)) ≈ f, which is exactly the property the reference's quality
bar asserts — LSD < 0.7 after 10 hops, reference:
lyra/comfort_noise_generator_test.cc:100-139).

Streaming state per stream: the inverse-FFT overlap-add carry
(fft_size − hop samples) and a PRNG key for the random phases.
"""

from __future__ import annotations

from typing import Dict

import jax
import jax.numpy as jnp
import numpy as np

from lyra_tpu import config
from lyra_tpu.dsp import melspec

State = Dict[str, jnp.ndarray]


class ComfortNoiseGenerator:
    def __init__(self, sample_rate_hz: int, num_mel_bins: int = config.NUM_MEL_BINS):
        self.cfg = melspec.MelConfig.for_rate(sample_rate_hz, num_mel_bins)
        a = melspec.mel_weight_matrix(
            self.cfg.num_fft_bins, sample_rate_hz, num_mel_bins
        )  # [bins, mels], magnitude-domain triangles
        mass = a.sum(axis=0)  # [mels]
        inv_mass = np.where(mass > 0, 1.0 / np.maximum(mass, 1e-12), 0.0)
        inv = a * inv_mass[None, :]  # [bins, mels]
        # Bins with zero mel mass (e.g. Nyquist) synthesize zero magnitude;
        # same truncation as the analysis side (melspec.num_used_fft_bins).
        self._num_used_bins = melspec.num_used_fft_bins(
            inv, self.cfg.num_fft_bins)
        self._inverse = jnp.asarray(inv[: self._num_used_bins], jnp.float32)
        ci, si = melspec.idft_matrices(self.cfg.fft_size)
        self._idft_cos = jnp.asarray(ci[: self._num_used_bins])  # [bins, fft]
        self._idft_sin = jnp.asarray(si[: self._num_used_bins])

    def init_state(self, batch_size: int, seed: int = 0) -> State:
        carry_len = self.cfg.fft_size - self.cfg.hop
        # Per-stream phase-RNG counters: a counter-based integer hash beats
        # vmapped threefry by ~20x on TPU while keeping per-stream
        # determinism, row-resettability and checkpointability.
        ctr = (jnp.arange(batch_size, dtype=jnp.uint32) * jnp.uint32(0x9E3779B9)
               + jnp.uint32(seed))
        return {
            "carry": jnp.zeros((batch_size, carry_len), jnp.float32),
            "ctr": ctr,
        }

    @staticmethod
    def _random_phases(ctr: jnp.ndarray, num_bins: int) -> jnp.ndarray:
        """[B] uint32 counters → [B, num_bins] uniform phases in [0, 2pi).

        murmur3-finalizer style mixing — full-avalanche integer hash, pure
        VPU ops.  The reference draws absl::Uniform(0, 2pi) per bin
        (lyra/comfort_noise_generator.cc:104-109); any independent uniform
        source is behaviorally equivalent for comfort noise.
        """
        k = jnp.arange(num_bins, dtype=jnp.uint32)[None, :]
        x = ctr[:, None] ^ (k * jnp.uint32(0x85EBCA6B) + jnp.uint32(0xC2B2AE35))
        x = (x ^ (x >> 16)) * jnp.uint32(0x85EBCA6B)
        x = (x ^ (x >> 13)) * jnp.uint32(0xC2B2AE35)
        x = x ^ (x >> 16)
        return x.astype(jnp.float32) * np.float32(2.0 * np.pi / 4294967296.0)

    def generate_hop(self, state: State, features: jnp.ndarray):
        """features [B, mels] log-mel noise estimate → ([B, hop] samples, state).

        Output is float at int16 scale (caller clips, reference:
        lyra/comfort_noise_generator.cc:114 uses ClipToInt16).
        """
        b = features.shape[0]
        mel = jnp.exp(features * melspec.NORM)  # undo log/10
        mag = mel @ self._inverse.T  # [B, bins]

        ctr = state["ctr"]
        phases = self._random_phases(ctr, self._num_used_bins)
        new_ctr = ctr + jnp.uint32(0x6A09E667)
        # Inverse real-DFT as two matmuls (exact irfft; the TPU FFT custom
        # call is an order of magnitude slower at these sizes).  Default
        # matmul precision: bf16 mantissa noise is immaterial in noise.
        re = mag * jnp.cos(phases)
        im = mag * jnp.sin(phases)
        frame = (jnp.matmul(re, self._idft_cos)
                 + jnp.matmul(im, self._idft_sin))  # [B, fft]

        hop = self.cfg.hop
        carry = state["carry"]  # [B, fft - hop]
        ola = frame.at[:, : carry.shape[1]].add(carry)
        out = ola[:, :hop]
        new_carry = ola[:, hop:]  # [B, fft - hop]
        return out, {"carry": new_carry, "ctr": new_ctr}
