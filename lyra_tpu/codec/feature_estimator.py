"""Feature estimators: conditioning features for packet-loss concealment.

The reference models this as a strategy interface whose only shipped
implementation returns zeros and ignores updates (reference:
lyra/zero_feature_estimator.h:40-59, lyra/feature_estimator_interface.h).
Here an estimator is a trio of pure functions over a `[B, num_features]`
state array so it batches over streams and lives inside the jitted decoder
step; the factory seam (reference: lyra/lyra_components.cc:62-65) maps to
picking a different estimator class at engine construction.
"""

from __future__ import annotations

import jax.numpy as jnp

from lyra_tpu import config


class ZeroFeatureEstimator:
    """Estimate() == zeros; Update() is ignored."""

    def __init__(self, num_features: int = config.NUM_FEATURES):
        self.num_features = num_features

    def init_state(self, batch_size: int) -> jnp.ndarray:
        return jnp.zeros((batch_size, self.num_features), jnp.float32)

    def update(self, state: jnp.ndarray, features: jnp.ndarray,
               mask: jnp.ndarray) -> jnp.ndarray:
        """Update per-stream memory with real features where `mask` is set."""
        del features, mask  # zeros regardless of history
        return state

    def estimate(self, state: jnp.ndarray) -> jnp.ndarray:
        return state


class LastFrameFeatureEstimator(ZeroFeatureEstimator):
    """Repeats the last received frame's features during concealment.

    Not present in the reference (its factory only builds the zero
    estimator) but the seam exists exactly for this kind of upgrade.
    """

    def update(self, state: jnp.ndarray, features: jnp.ndarray,
               mask: jnp.ndarray) -> jnp.ndarray:
        return jnp.where(mask[:, None], features, state)


class DecayingFeatureEstimator(ZeroFeatureEstimator):
    """Geometrically fades the last received features during concealment.

    Repeating a frame verbatim sounds robotic on long losses; decaying it
    toward zero each lost hop gives a natural fade-out before comfort noise
    takes over (concealment lasts 4 hops, so decay=0.6 reaches ~13% by the
    crossfade).
    """

    def __init__(self, decay: float = 0.6,
                 num_features: int = config.NUM_FEATURES):
        super().__init__(num_features)
        self.decay = float(decay)

    def update(self, state: jnp.ndarray, features: jnp.ndarray,
               mask: jnp.ndarray) -> jnp.ndarray:
        return jnp.where(mask[:, None], features, state * self.decay)
