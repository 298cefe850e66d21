"""Sample-format conversions and spectral metrics.

Parity with the reference conversions (reference: lyra/dsp_utils.h:53-120,
lyra/dsp_utils.cc:27-41): unit-float ↔ int16 scaling uses the *negative
int16 minimum* (32768) as the scale, clamps to [-32768, 32767], and quantizes
with C-style truncation toward zero (not rounding).

Each helper has a numpy flavor (host-side I/O paths) and a jnp flavor
(inside jitted per-frame steps, so the conversion fuses into the model).
"""

from __future__ import annotations

import jax.numpy as jnp
import numpy as np

_INT16_SCALE = 32768.0
_INT16_MIN = -32768.0
_INT16_MAX = 32767.0


def int16_to_unit_np(samples: np.ndarray) -> np.ndarray:
    return np.asarray(samples, np.float32) / np.float32(_INT16_SCALE)


def unit_to_int16_np(values: np.ndarray) -> np.ndarray:
    scaled = np.asarray(values, np.float32) * np.float32(_INT16_SCALE)
    clipped = np.clip(scaled, _INT16_MIN, _INT16_MAX)
    return np.trunc(clipped).astype(np.int16)


def clip_to_int16_np(values: np.ndarray) -> np.ndarray:
    clipped = np.clip(np.asarray(values, np.float32), _INT16_MIN, _INT16_MAX)
    return np.trunc(clipped).astype(np.int16)


def int16_to_unit(samples) -> jnp.ndarray:
    return samples.astype(jnp.float32) / _INT16_SCALE


def unit_to_int16(values) -> jnp.ndarray:
    scaled = values.astype(jnp.float32) * _INT16_SCALE
    clipped = jnp.clip(scaled, _INT16_MIN, _INT16_MAX)
    return jnp.trunc(clipped).astype(jnp.int16)


def clip_to_int16(values) -> jnp.ndarray:
    clipped = jnp.clip(values.astype(jnp.float32), _INT16_MIN, _INT16_MAX)
    return jnp.trunc(clipped).astype(jnp.int16)


def convert_num_samples(source_num: int, source_rate: int, target_rate: int) -> int:
    """ceil(source_num * target/source) using f32 arithmetic like the reference."""
    return int(np.ceil(np.float32(source_num) * np.float32(target_rate) / np.float32(source_rate)))


def log_spectral_distance(a, b):
    """10 * sqrt(mean((a-b)^2)) over log-spectra; works on numpy or jnp.

    Reference metric: lyra/dsp_utils.cc:27-41.  Last axis is the spectrum.
    """
    if isinstance(a, np.ndarray) or isinstance(b, np.ndarray):
        a = np.asarray(a, np.float32)
        b = np.asarray(b, np.float32)
        return 10.0 * np.sqrt(np.mean(np.square(a - b), axis=-1))
    return 10.0 * jnp.sqrt(jnp.mean(jnp.square(a - b), axis=-1))
