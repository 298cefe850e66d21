"""Batched streaming-model wrappers for the learned codec networks.

The reference runs one TFLite interpreter per codec instance per frame
(reference: lyra/soundstream_encoder.cc:36-64, lyra/lyra_gan_model.cc:36-64).
Here each network is a pure jitted function over a `[num_streams, ...]` batch:
`jax.vmap` lifts the single-stream graph (with its per-stream conv-state
pytree) over the stream axis, so one kernel launch advances every stream by
one 20 ms hop.  Per-stream state is ~110 KB, so tens of thousands of streams
fit in HBM (SURVEY.md §2.1).
"""

from __future__ import annotations

import os
from typing import Any, Dict, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from lyra_tpu import config
from lyra_tpu.tflite.executor import GraphFn, load_graph

State = Dict[str, jnp.ndarray]


class BatchedStreamingModel:
    """Wraps a stateful single-stream GraphFn as a batched pure function."""

    def __init__(self, graph: GraphFn, input_name: str, output_name: str):
        self._graph = graph
        self._input_name = input_name
        self._output_name = output_name
        single_state = graph._init_state

        def _single(state: State, x: jnp.ndarray):
            outputs, new_state = graph(state, **{input_name: x})
            return outputs[output_name], new_state

        self._single = _single
        self._batched = jax.vmap(_single)
        self._single_state_template = single_state

    def init_state(self, batch_size: int) -> State:
        """Zero/init streaming state replicated over `batch_size` streams.

        Maps to the reference's ResetVariableTensors
        (reference: lyra/tflite_model_wrapper.cc:111-113).
        """
        return {
            k: jnp.broadcast_to(jnp.asarray(v), (batch_size,) + v.shape)
            for k, v in self._single_state_template.items()
        }

    def reset_rows(self, state: State, mask: jnp.ndarray) -> State:
        """Reset state to initial values where `mask` ([B] bool) is set."""
        out = {}
        for k, v in state.items():
            init = jnp.asarray(self._single_state_template[k])
            m = mask.reshape((-1,) + (1,) * init.ndim)
            out[k] = jnp.where(m, init[None], v)
        return out

    def __call__(self, state: State, x: jnp.ndarray) -> Tuple[jnp.ndarray, State]:
        """x: [B, *single_input_shape] → ([B, *single_output_shape], state)."""
        return self._batched(state, x)

    def single(self, state: State, x: jnp.ndarray):
        return self._single(state, x)


class SoundStreamEncoder(BatchedStreamingModel):
    """320 samples @16 kHz → 64 features, per stream.

    Reference: lyra/soundstream_encoder.{h,cc} + soundstream_encoder.tflite.
    Input  [B, 320] unit-float audio; output [B, 64] features.
    """

    def __init__(self, model_path: str, mode: str = "float"):
        graph = load_graph(
            os.path.join(model_path, "soundstream_encoder.tflite"), mode=mode
        )
        super().__init__(graph, "input_audio", "output_0")

    def extract(self, state: State, frames: jnp.ndarray):
        feats, state = self(state, frames[:, None, :])  # [B, 1, 320]
        return feats[:, 0, 0, :], state  # [B, 64]


class LyraGanModel(BatchedStreamingModel):
    """64 features → 320 samples @16 kHz, per stream.

    Reference: lyra/lyra_gan_model.{h,cc} + lyragan.tflite.
    Input  [B, 64] features; output [B, 320] unit-float audio.
    """

    def __init__(self, model_path: str, mode: str = "float"):
        graph = load_graph(os.path.join(model_path, "lyragan.tflite"), mode=mode)
        super().__init__(graph, "input_audio", "output_0")

    def decode_hop(self, state: State, features: jnp.ndarray):
        samples, state = self(state, features[:, None, None, :])  # [B, 1, 1, 64]
        return samples[:, 0, :], state  # [B, 320]
