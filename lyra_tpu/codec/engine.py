"""Batched lockstep codec engines — the TPU-native heart of the framework.

The reference codec advances one stream at a time through virtual-interface
calls and a per-stream packet-loss-concealment (PLC) state machine
(reference: lyra/lyra_encoder.cc:113-156, lyra/lyra_decoder.cc:228-315).
Here the same state machine is *vectorized*: every per-stream scalar
(`concealment_progress_`, `fade_progress_`, `fade_direction_`) becomes a
`[B]` array, every branch becomes a `jnp.where` mask, and one jitted step
advances B streams by one 20 ms hop in a single XLA program.  Streams in
different PLC states (normal / concealment / fading / comfort noise) batch
together; the convolutional stacks run on the MXU for all streams at once.

Lockstep protocol (the real-time serving shape): per 20 ms tick each stream
is given either its received packet's RVQ indices (`received=True`) or
nothing (`received=False` — lost or DTX-suppressed), and emits one hop of
audio.  At this granularity the reference's sample-level bookkeeping
(negative concealment progress, sub-hop cursors — lyra/lyra_decoder.cc:65-91,
186-196) collapses: queues drain every tick, so those paths are host-side
concerns handled by the single-stream facade in `decoder.py`.

Both engines keep *all* streaming state (conv contexts, mel windows, PLC
counters, RNG keys) in an explicit pytree, so the step is a pure function:
shardable with `jax.sharding` over the stream axis, checkpointable by
serializing the pytree, and resettable per stream by masking rows back to
their initial values (stream admission/eviction without recompilation).
"""

from __future__ import annotations

from typing import Any, Dict

import jax
import jax.numpy as jnp
import numpy as np

from lyra_tpu import config
from lyra_tpu.codec.comfort_noise import ComfortNoiseGenerator
from lyra_tpu.codec.feature_estimator import (
    DecayingFeatureEstimator,
    LastFrameFeatureEstimator,
    ZeroFeatureEstimator,
)
from lyra_tpu.codec.noise_estimator import NoiseEstimator
from lyra_tpu.dsp import utils as dsp_utils
from lyra_tpu.dsp.resampler import Resampler
from lyra_tpu.models.rvq import ResidualVectorQuantizer
from lyra_tpu.models.streaming import LyraGanModel, SoundStreamEncoder

State = Dict[str, Any]

# PLC timing (reference: lyra/lyra_decoder.cc:42-61): 0.08 s of pure
# concealment, then a 0.04 s cos^2 fade into comfort noise.
CONCEALMENT_DURATION_SECONDS = 0.08
FADE_DURATION_SECONDS = 0.04
INTERNAL_HOP = config.num_samples_per_hop(config.INTERNAL_SAMPLE_RATE)
CONCEALMENT_SAMPLES = int(CONCEALMENT_DURATION_SECONDS * config.INTERNAL_SAMPLE_RATE)
FADE_SAMPLES = int(FADE_DURATION_SECONDS * config.INTERNAL_SAMPLE_RATE)
assert CONCEALMENT_SAMPLES % INTERNAL_HOP == 0
assert FADE_SAMPLES % INTERNAL_HOP == 0

# fade_direction_ encoding, matching the reference enum values which are used
# directly as per-sample increments (reference: lyra/lyra_decoder.h fade enum).
FADE_TO_CNG = 1
FADE_FROM_CNG = -1


def _checked_bits(bitrate: int) -> int:
    bits = config.bitrate_to_num_quantized_bits(bitrate)
    if bits < 0:  # the -1 sentinel would surface as a cryptic stage error
        raise ValueError(
            f"bitrate {bitrate} is not supported "
            f"(choose from {config.SUPPORTED_BITRATES})")
    return bits


def _mask_tree(mask_b: jnp.ndarray, new_tree, old_tree):
    """Per-leaf `where` with a [B] mask broadcast over trailing dims."""

    def pick(new, old):
        m = mask_b.reshape((-1,) + (1,) * (new.ndim - 1))
        return jnp.where(m, new, old)

    return jax.tree.map(pick, new_tree, old_tree)


def fade_weights(fade_progress: jnp.ndarray, fade_direction: jnp.ndarray,
                 num_samples: int) -> jnp.ndarray:
    """Per-sample cos^2 crossfade weights for the generative model's hop.

    weight[i] = (1 + cos((fade + dir*i) * pi / FADE_SAMPLES)) / 2, the exact
    overlap math of the reference (reference: lyra/lyra_decoder.cc:365-371).
    fade_progress/fade_direction are [B]; result is [B, num_samples].
    """
    i = jnp.arange(num_samples, dtype=jnp.float32)[None, :]
    p = fade_progress.astype(jnp.float32)[:, None] + \
        fade_direction.astype(jnp.float32)[:, None] * i
    return (1.0 + jnp.cos(p * jnp.pi / FADE_SAMPLES)) / 2.0


class DecoderEngine:
    """Batched hop-lockstep Lyra decoder over `[B]` concurrent streams.

    One `step()` = the reference's SetEncodedPacket + DecodeSamples(hop)
    for every stream, fused into one XLA program.
    """

    def __init__(self, sample_rate_hz: int = config.INTERNAL_SAMPLE_RATE,
                 model_path: str = config.DEFAULT_MODEL_PATH,
                 mode: str = "float", backend: str = "xla",
                 feature_estimator: str = "zero",
                 max_bitrate: int | None = None,
                 gate_idle_stages: bool = True,
                 state_compression: str | None = None,
                 boundary_store: str | None = None,
                 emit_dtype: str = "float32"):
        config.check_params_supported(sample_rate_hz, config.NUM_CHANNELS, model_path)
        self.sample_rate_hz = sample_rate_hz
        # emit_dtype="int16": step() returns audio as int16 instead of
        # int16-valued float32.  Bit-exact (the hop is clip_to_int16'd
        # either way — the reference's public unit is int16 samples,
        # reference: lyra/lyra_decoder.h:88-104); halves the PCM bytes a
        # serving host pulls over PCIe per tick.
        if emit_dtype not in ("float32", "int16"):
            raise ValueError(
                f"emit_dtype must be 'float32' or 'int16', got {emit_dtype!r}")
        self._emit_int16 = emit_dtype == "int16"
        # state_compression="int8": store the GAN's streaming conv contexts
        # int8-compressed between ticks (models/streaming.py
        # `_quantize_leaf`) — halves per-stream checkpoint/drain bytes for
        # serving migration; not a step-time win on TPU (PERF.md).
        # boundary_store="f8": store layer-boundary activations fp8 e4m3
        # inside the step (tflite/executor.py _BoundaryEnv).  Measured
        # regression for serving — XLA does not fuse the converts into
        # conv operands, so the fp8 copies ADD traffic (1.67x slower,
        # PERF.md round 4); kept opt-in as the probe reproducer.
        self.gan = LyraGanModel(model_path, mode=mode, backend=backend,
                                state_dtype=state_compression,
                                boundary_store=boundary_store)
        self.rvq = ResidualVectorQuantizer.from_model_path(model_path)
        # Static serving specialization: a fleet capped at one bitrate skips
        # RVQ stage work the wire format can never carry (the engine stays
        # fully general when max_bitrate is None).
        self._max_stages = (None if max_bitrate is None else
                            self.rvq.num_bits_to_stages(
                                _checked_bits(max_bitrate)))
        self.cng = ComfortNoiseGenerator(config.INTERNAL_SAMPLE_RATE)
        self.noise = NoiseEstimator(config.INTERNAL_SAMPLE_RATE)
        self._decode_dtype = jnp.bfloat16 if mode == "bf16" else None
        # Concealment conditioning strategy: "zero" is the reference's
        # shipped estimator; "last_frame" repeats the last received features;
        # "decaying" fades them out geometrically (the upgrades the
        # reference's factory seam anticipates, lyra/lyra_components.cc:62-65).
        estimators = {
            "zero": ZeroFeatureEstimator,
            "last_frame": LastFrameFeatureEstimator,
            "decaying": DecayingFeatureEstimator,
        }
        if feature_estimator not in estimators:
            raise ValueError(
                f"unknown feature_estimator {feature_estimator!r}; "
                f"choose from {sorted(estimators)}")
        self.estimator = estimators[feature_estimator]()
        self.resampler = (
            None if sample_rate_hz == config.INTERNAL_SAMPLE_RATE
            else Resampler(config.INTERNAL_SAMPLE_RATE, sample_rate_hz)
        )
        self.hop_samples = config.num_samples_per_hop(sample_rate_hz)
        # lax.cond-skip CNG synthesis when no stream needs it this tick (see
        # _step_impl); False forces the always-run path (the gating's oracle).
        self._gate_idle = gate_idle_stages
        self._step = jax.jit(self._step_impl)
        self._reset = jax.jit(self._reset_impl, static_argnums=(2,))

    # -- state ----------------------------------------------------------------
    def init_state(self, batch_size: int, seed: int = 0) -> State:
        b = batch_size
        state = {
            "gan": self.gan.init_state(b),
            "cng": self.cng.init_state(b, seed=seed),
            "noise": self.noise.init_state(b),
            "est": self.estimator.init_state(b),
            "concealment": jnp.zeros((b,), jnp.int32),  # samples, [0, 1280]
            "fade": jnp.zeros((b,), jnp.int32),  # samples, [0, 640]
            "fade_dir": jnp.full((b,), FADE_FROM_CNG, jnp.int32),
        }
        if self.resampler is not None:
            state["resampler"] = self.resampler.init_state(b)
        return state

    def reset_rows(self, state: State, mask: jnp.ndarray,
                   seed: int = 0) -> State:
        """Re-initialize streams where `mask` is set (stream admission).
        `seed` must match the one used for init_state so re-admitted slots
        keep the server's per-stream RNG lineage.

        Jitted: the fresh values (mostly zeros, plus the counter-hash RNG
        rows) are generated inside the program and fused straight into the
        per-leaf select — one dispatch and one state read+write instead of
        materializing a second full state tree and issuing ~50 eager
        `where` ops per admission (the call-setup hot path,
        tools/stream_server.py add_stream/add_streams)."""
        return self._reset(state, mask.astype(bool), seed)

    def _reset_impl(self, state: State, mask: jnp.ndarray,
                    seed: int) -> State:
        fresh = self.init_state(mask.shape[0], seed=seed)
        return _mask_tree(mask, fresh, state)

    # -- one lockstep tick -----------------------------------------------------
    def step(self, state: State, indices: jnp.ndarray, received: jnp.ndarray):
        """Advance every stream by one 20 ms hop.

        indices:  [B, num_stages] int32 RVQ stage indices, -1-padded beyond
                  the stream's bitrate (contents ignored where not received).
        received: [B] bool — False means packet lost (or DTX empty packet).

        Returns (audio [B, hop_samples] at int16 scale — float32, or int16
                 when the engine was built with emit_dtype="int16";
                 is_comfort_noise [B] bool, new_state).
        """
        return self._step(state, indices, received)

    def _step_impl(self, state: State, indices: jnp.ndarray,
                   received: jnp.ndarray):
        received = received.astype(bool)

        # SetEncodedPacket: unquantize + condition the feature estimator
        # (reference: lyra/lyra_decoder.cc:198-208).
        lossy = self.rvq.decode(indices, dtype=self._decode_dtype,
                                max_stages=self._max_stages)  # [B, F]
        est_state = self.estimator.update(state["est"], lossy, received)

        # PLC state update (reference: lyra/lyra_decoder.cc:249-265).
        conceal_sat = state["concealment"] >= CONCEALMENT_SAMPLES
        fade_dir = jnp.where(
            received,
            FADE_FROM_CNG,
            jnp.where(conceal_sat, FADE_TO_CNG, state["fade_dir"]),
        )
        concealment = jnp.where(
            received,
            0,
            jnp.where(conceal_sat, state["concealment"],
                      state["concealment"] + INTERNAL_HOP),
        )

        # Saturation gates (reference: lyra/lyra_decoder.cc:267-282).
        run_model = ~((fade_dir == FADE_TO_CNG) & (state["fade"] == FADE_SAMPLES))
        run_cng = ~((fade_dir == FADE_FROM_CNG) & (state["fade"] == 0))

        # Generative model on real or estimated features; conv state advances
        # only for streams that actually ran it.
        feats = jnp.where(received[:, None], lossy,
                          self.estimator.estimate(est_state))
        model_unit, gan_state = self.gan.decode_hop(state["gan"], feats)
        gan_state = _mask_tree(run_model, gan_state, state["gan"])
        model_hop = dsp_utils.unit_to_int16(model_unit).astype(jnp.float32)

        # Comfort noise conditioned on the decoder-side noise estimate.
        # Skipped wholesale (lax.cond) when NO stream is fading or in comfort
        # noise — the steady serving state never pays for the mel-inverse +
        # IDFT synthesis.  This is the one PLC stage where a conditional
        # wins: its branch outputs (one hop + the small OLA/RNG state) are
        # tiny, so the cond's branch-result materialization costs ~nothing
        # next to the ~1 ms of synthesis it skips.  The conv stacks get no
        # such gate on purpose: routing their multi-hundred-MB state trees
        # through a conditional forces XLA to copy them every tick (+6 ms/
        # step at B=16k, measured — PERF.md round 2), far more than any
        # masked-select it would save.  Each branch is exactly the masked
        # update it replaces, so results are bit-identical either way.
        def _cng_on(_):
            hop, cng_state = self.cng.generate_hop(
                state["cng"], self.noise.noise_estimate(state["noise"]))
            hop = dsp_utils.clip_to_int16(hop).astype(jnp.float32)
            return hop, _mask_tree(run_cng, cng_state, state["cng"])

        def _cng_off(_):
            # The synthesized hop would be discarded by the crossfade and
            # the OLA/RNG state frozen by the mask.
            return (jnp.zeros((feats.shape[0], INTERNAL_HOP), jnp.float32),
                    state["cng"])

        if self._gate_idle:
            cng_hop, cng_state = jax.lax.cond(
                jnp.any(run_cng), _cng_on, _cng_off, None)
        else:
            cng_hop, cng_state = _cng_on(None)

        # cos^2 crossfade (reference: lyra/lyra_decoder.cc:342-373).
        w = fade_weights(state["fade"], fade_dir, INTERNAL_HOP)
        blended = w * model_hop + (1.0 - w) * cng_hop
        both = run_model & run_cng
        audio = jnp.where(both[:, None], blended,
                          jnp.where(run_model[:, None], model_hop, cng_hop))
        audio = dsp_utils.clip_to_int16(audio).astype(jnp.float32)

        fade = jnp.clip(
            state["fade"] + fade_dir * INTERNAL_HOP, 0, FADE_SAMPLES)

        # The decoder-side noise estimator listens to the raw generative
        # output of received hops only (reference: lyra/lyra_decoder.cc:306-311).
        noise_state = self.noise.receive_hop(state["noise"], model_hop)
        noise_state = _mask_tree(received, noise_state, state["noise"])

        new_state = {
            "gan": gan_state,
            "cng": cng_state,
            "noise": noise_state,
            "est": est_state,
            "concealment": concealment,
            "fade": fade,
            "fade_dir": fade_dir,
        }

        if self.resampler is not None:
            audio, new_state["resampler"] = self.resampler.resample(
                state["resampler"], audio)
            audio = dsp_utils.clip_to_int16(audio).astype(jnp.float32)

        is_comfort_noise = fade == FADE_SAMPLES
        if self._emit_int16:
            # Exact: audio is integral int16-scale after clip_to_int16, and
            # XLA folds the f32->int16 convert into the producing fusion.
            audio = audio.astype(jnp.int16)
        return audio, is_comfort_noise, new_state


class EncoderEngine:
    """Batched hop-lockstep Lyra encoder over `[B]` concurrent streams.

    One `step()` = the reference's LyraEncoder::Encode for every stream
    (reference: lyra/lyra_encoder.cc:113-156): resample → (DTX noise
    gate) → SoundStream features → RVQ stage indices.  Bit-packing of the
    indices into wire bytes is host-side (`lyra_tpu.packet`).
    """

    def __init__(self, sample_rate_hz: int = config.INTERNAL_SAMPLE_RATE,
                 model_path: str = config.DEFAULT_MODEL_PATH,
                 enable_dtx: bool = False, mode: str = "float",
                 backend: str = "xla", max_bitrate: int | None = None,
                 state_compression: str | None = None,
                 boundary_store: str | None = None):
        config.check_params_supported(sample_rate_hz, config.NUM_CHANNELS, model_path)
        self.sample_rate_hz = sample_rate_hz
        self.enable_dtx = enable_dtx
        # See DecoderEngine: int8 storage of the streaming conv contexts
        # (state_compression) and fp8 layer-boundary storage
        # (boundary_store).
        self.soundstream = SoundStreamEncoder(model_path, mode=mode,
                                              backend=backend,
                                              state_dtype=state_compression,
                                              boundary_store=boundary_store)
        self.rvq = ResidualVectorQuantizer.from_model_path(model_path)
        # See DecoderEngine: static single-bitrate serving specialization.
        self._max_stages = (None if max_bitrate is None else
                            self.rvq.num_bits_to_stages(
                                _checked_bits(max_bitrate)))
        self.noise = NoiseEstimator(config.INTERNAL_SAMPLE_RATE) if enable_dtx else None
        self.resampler = (
            None if sample_rate_hz == config.INTERNAL_SAMPLE_RATE
            else Resampler(sample_rate_hz, config.INTERNAL_SAMPLE_RATE)
        )
        self.hop_samples = config.num_samples_per_hop(sample_rate_hz)
        self._step = jax.jit(self._step_impl)
        self._reset = jax.jit(self._reset_impl)

    def init_state(self, batch_size: int) -> State:
        b = batch_size
        state = {"soundstream": self.soundstream.init_state(b)}
        if self.noise is not None:
            state["noise"] = self.noise.init_state(b)
        if self.resampler is not None:
            state["resampler"] = self.resampler.init_state(b)
        return state

    def reset_rows(self, state: State, mask: jnp.ndarray) -> State:
        """Jitted for the same reason as DecoderEngine.reset_rows."""
        return self._reset(state, mask.astype(bool))

    def _reset_impl(self, state: State, mask: jnp.ndarray) -> State:
        fresh = self.init_state(mask.shape[0])
        return _mask_tree(mask, fresh, state)

    def _state_with_bound(self, state: State, bound: float) -> State:
        """Test seam: force the DTX classifier's noise bound, the analog of
        the reference's NoiseEstimatorPeer (lyra/noise_estimator_test.cc)."""
        if self.noise is None:
            raise ValueError("DTX not enabled")
        noise = dict(state["noise"])
        noise["noise_bound"] = jnp.full_like(noise["noise_bound"], bound)
        return {**state, "noise": noise}

    def step(self, state: State, audio: jnp.ndarray,
             num_quantizers: jnp.ndarray):
        """audio [B, hop_samples] at int16 scale; num_quantizers scalar or [B].

        Returns (indices [B, num_stages] int32 (-1 beyond each stream's
        bitrate), is_noise [B] bool, new_state).  When DTX marks a hop as
        noise the host emits an empty packet and the SoundStream conv state
        is left untouched, exactly like the reference's early return
        (reference: lyra/lyra_encoder.cc:131-141).
        """
        return self._step(state, audio, jnp.asarray(num_quantizers, jnp.int32))

    def _step_impl(self, state: State, audio: jnp.ndarray,
                   num_quantizers: jnp.ndarray):
        new_state = dict(state)
        x = audio.astype(jnp.float32)
        if self.resampler is not None:
            x, new_state["resampler"] = self.resampler.resample(
                state["resampler"], x)
            x = dsp_utils.clip_to_int16(x).astype(jnp.float32)

        if self.noise is not None:
            noise_state = self.noise.receive_hop(state["noise"], x)
            is_noise = self.noise.is_noise(noise_state)
            new_state["noise"] = noise_state
        else:
            is_noise = jnp.zeros((x.shape[0],), bool)

        feats, ss_state = self.soundstream.extract(
            state["soundstream"], dsp_utils.int16_to_unit(x))
        # No all-noise lax.cond skip here: routing the SoundStream state tree
        # through a conditional's outputs copies it every tick (see the
        # DecoderEngine CNG gate comment), costing an active DTX fleet more
        # than an idle one would save.  The per-stream mask below is the
        # reference semantics (lyra/lyra_encoder.cc:131-141) and the fast path.
        new_state["soundstream"] = _mask_tree(
            ~is_noise, ss_state, state["soundstream"])

        indices = self.rvq.quantize(feats, num_quantizers, method="fast",
                                    max_stages=self._max_stages)
        return indices, is_noise, new_state
