"""Minimum-statistics noise estimation in the log-mel domain, batched.

Functional parity with the reference NoiseEstimator (reference:
lyra/noise_estimator.cc:98-245): per 20 ms hop it extracts 160 log-mel
features, decides noise/speech against `noise_estimate ± noise_bound`,
tracks element-wise running minima of smoothed power with a 1 s update
period, and exponentially decays the bound during sustained noise.

The reference is scalar per stream; here every quantity is a `[B, ...]`
array and the speech/noise branch is resolved with `jnp.where` masks, so
streams in different states advance together in one launch.  Drives DTX on
the encoder (reference: lyra/lyra_encoder.cc:131-141) and conditions CNG on
the decoder.
"""

from __future__ import annotations

from typing import Dict

import jax.numpy as jnp
import numpy as np

from lyra_tpu import config
from lyra_tpu.dsp import melspec

# Constants from reference: lyra/noise_estimator.cc:74-94 and :115-120.
_POW_DIFF = 0.3
_BOUND_FACTOR = 0.9
_MAX_SMOOTHING_HALFLIFE_SECS = 0.7
_UPDATE_TIME_SECS = 1.0
_BOUND_HALFLIFE_SECS = 1.0

State = Dict[str, jnp.ndarray]


class NoiseEstimator:
    def __init__(self, sample_rate_hz: int, num_features: int = config.NUM_MEL_BINS,
                 mel_precision=None):
        hop = config.num_samples_per_hop(sample_rate_hz)
        self.num_features = num_features
        self.cfg = melspec.MelConfig.for_rate(sample_rate_hz, num_features)
        self._mel = melspec.LogMelExtractor(self.cfg, precision=mel_precision)
        secs_per_hop = hop / sample_rate_hz
        self.num_hops_per_update = int(round(_UPDATE_TIME_SECS / secs_per_hop))
        self.max_smoothing = 0.5 ** (secs_per_hop / _MAX_SMOOTHING_HALFLIFE_SECS)
        self.bound_decay = 0.5 ** (secs_per_hop / _BOUND_HALFLIFE_SECS)

    def init_state(self, batch_size: int) -> State:
        b, f = batch_size, self.num_features
        z = jnp.zeros((b, f), jnp.float32)
        return {
            "mel": self._mel.init_state(batch_size),
            "smoothed": z,
            "squared_smoothed": z,
            "tmp_min": z,
            "noise_estimate": z,
            "noise_bound": z,
            "is_noise": jnp.ones((b,), bool),
            "hops_received": jnp.zeros((b,), jnp.int32),
            "initialized": jnp.zeros((b,), bool),
        }

    def receive_hop(self, state: State, hop_samples: jnp.ndarray) -> State:
        """Consume one hop of int16-scale samples per stream.

        Mirrors ReceiveSamples at hop granularity (the codec core always
        feeds whole hops; reference: lyra/noise_estimator.cc:142-173).
        """
        feats, mel_state = self._mel.extract(state["mel"], hop_samples)
        state = self.receive_features(state, feats)
        return {**state, "mel": mel_state}

    def compute_is_noise(self, state: State, cur: jnp.ndarray) -> jnp.ndarray:
        """Noise iff every bin lies within `estimate ± bound`
        (reference: lyra/noise_estimator.cc:226-237)."""
        return jnp.all(
            jnp.abs(cur - state["noise_estimate"]) <= state["noise_bound"], axis=-1
        )

    def receive_features(self, state: State, cur: jnp.ndarray) -> State:
        """Feature-level step: classify, then update estimate or decay bound."""
        # -- ComputeIsNoise against the *previous* estimate/bound --
        is_noise = self.compute_is_noise(state, cur)

        # -- speech branch: UpdateNoiseEstimate --
        init_mask = ~state["initialized"]
        m = init_mask[:, None]
        smoothed = jnp.where(m, cur, state["smoothed"])
        squared = jnp.where(m, cur * cur, state["squared_smoothed"])
        tmp_min = jnp.where(m, cur, state["tmp_min"])

        correction = jnp.exp(
            -jnp.square(
                (smoothed.mean(-1) - cur.mean(-1)) / _POW_DIFF
            )
        )[:, None]
        sf = (
            self.max_smoothing
            * correction
            * jnp.exp(-jnp.square((smoothed - state["noise_estimate"]) / _POW_DIFF))
        )
        new_smoothed = sf * smoothed + (1.0 - sf) * cur
        new_squared = sf * squared + (1.0 - sf) * cur * cur

        at_update = state["hops_received"] == 0
        au = at_update[:, None]
        new_noise_est = jnp.where(
            au,
            jnp.minimum(tmp_min, new_smoothed),
            jnp.minimum(state["noise_estimate"], new_smoothed),
        )
        new_tmp = jnp.where(au, new_smoothed, jnp.minimum(tmp_min, new_smoothed))

        variance = jnp.maximum(0.0, new_squared - jnp.square(new_smoothed))
        new_bound = _BOUND_FACTOR * jnp.sqrt(
            variance * np.log(float(self.num_features))
        )
        new_hops = (state["hops_received"] + 1) % self.num_hops_per_update

        # -- noise branch: DecayBounds --
        decayed_bound = state["noise_bound"] * self.bound_decay

        n = is_noise[:, None]
        return {
            "mel": state["mel"],
            "smoothed": jnp.where(n, smoothed, new_smoothed),
            "squared_smoothed": jnp.where(n, squared, new_squared),
            "tmp_min": jnp.where(n, tmp_min, new_tmp),
            "noise_estimate": jnp.where(n, state["noise_estimate"], new_noise_est),
            "noise_bound": jnp.where(n, decayed_bound, new_bound),
            "is_noise": is_noise,
            "hops_received": jnp.where(is_noise, state["hops_received"], new_hops),
            "initialized": state["initialized"] | ~is_noise,
        }

    def update_noise_estimate(self, state: State, cur: jnp.ndarray) -> State:
        """Unconditional minimum-statistics update (reference:
        lyra/noise_estimator.cc:175-209), bypassing the noise gate — used by
        tests mirroring the reference's NoiseEstimatorPeer."""
        forced = dict(state)
        forced["noise_bound"] = jnp.full_like(state["noise_bound"], -1.0)
        out = self.receive_features(forced, cur)
        out["is_noise"] = state["is_noise"]
        return out

    @staticmethod
    def noise_estimate(state: State) -> jnp.ndarray:
        return state["noise_estimate"]

    @staticmethod
    def is_noise(state: State) -> jnp.ndarray:
        return state["is_noise"]
