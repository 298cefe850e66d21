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

from typing import Dict, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from lyra_tpu import config
from lyra_tpu.dsp import melspec

State = Dict[str, jnp.ndarray]


class ComfortNoiseGenerator:
    def __init__(self, sample_rate_hz: int, num_mel_bins: int = config.NUM_MEL_BINS):
        hop = config.num_samples_per_hop(sample_rate_hz)
        self.cfg = melspec.MelConfig(
            sample_rate_hz, hop, config.OVERLAP_FACTOR * hop, num_mel_bins
        )
        a = melspec.mel_weight_matrix(
            self.cfg.num_fft_bins, sample_rate_hz, num_mel_bins
        )  # [bins, mels], magnitude-domain triangles
        mass = a.sum(axis=0)  # [mels]
        inv_mass = np.where(mass > 0, 1.0 / np.maximum(mass, 1e-12), 0.0)
        # mag ≈ A @ (mel / mass): unit gain for smooth spectra.
        self._inverse = jnp.asarray(a * inv_mass[None, :], jnp.float32)  # [bins, mels]
        ci, si = melspec.idft_matrices(self.cfg.fft_size)
        self._idft_cos = jnp.asarray(ci)  # [bins, fft]
        self._idft_sin = jnp.asarray(si)

    def init_state(self, batch_size: int, seed: int = 0) -> State:
        carry_len = self.cfg.fft_size - self.cfg.hop
        # Raw uint32[2] keys (not typed key arrays) so per-stream state stays
        # a plain serializable pytree for checkpoints.
        keys = jax.random.split(jax.random.PRNGKey(seed), batch_size)
        return {
            "carry": jnp.zeros((batch_size, carry_len), jnp.float32),
            "key": keys,
        }

    def generate_hop(self, state: State, features: jnp.ndarray):
        """features [B, mels] log-mel noise estimate → ([B, hop] samples, state).

        Output is float at int16 scale (caller clips, reference:
        lyra/comfort_noise_generator.cc:114 uses ClipToInt16).
        """
        b = features.shape[0]
        mel = jnp.exp(features * melspec.NORM)  # undo log/10
        mag = mel @ self._inverse.T  # [B, bins]

        def sample_phase(key):
            k1, k2 = jax.random.split(key)
            return k1, jax.random.uniform(
                k2, (self.cfg.num_fft_bins,), minval=0.0, maxval=2.0 * np.pi
            )

        new_keys, phases = jax.vmap(sample_phase)(state["key"])
        # Inverse real-DFT as two matmuls (exact irfft; the TPU FFT custom
        # call is an order of magnitude slower at these sizes).
        re = mag * jnp.cos(phases)
        im = mag * jnp.sin(phases)
        hp = jax.lax.Precision.HIGHEST
        frame = (jnp.matmul(re, self._idft_cos, precision=hp)
                 + jnp.matmul(im, self._idft_sin, precision=hp))  # [B, fft]

        hop = self.cfg.hop
        carry = state["carry"]  # [B, fft - hop]
        ola = frame.at[:, : carry.shape[1]].add(carry)
        out = ola[:, :hop]
        new_carry = ola[:, hop:]  # [B, fft - hop]
        return out, {"carry": new_carry, "key": new_keys}
