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
from typing import Dict, Tuple

import jax
import jax.numpy as jnp
import numpy as np

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


class _FusedModel:
    """Streaming model backed by the pallas megakernel (ops/fused_stack.py).

    Same init_state/reset_rows/call contract as BatchedStreamingModel, but
    the whole conv stack runs in VMEM per stream block instead of one XLA
    op per layer — the HBM-traffic-optimal serving path.
    """

    def __init__(self, path: str, mode: str, block_streams: int):
        from lyra_tpu.ops.fused_stack import FusedStackKernel

        self._kernel = FusedStackKernel(
            path, mode=mode if mode in ("float", "bf16") else "float",
            block_streams=block_streams)

    def init_state(self, batch_size: int) -> State:
        return self._kernel.init_state(batch_size)

    def reset_rows(self, state: State, mask: jnp.ndarray) -> State:
        fresh = self._kernel.init_state(int(mask.shape[0]))

        def pick(new, old):
            m = mask.reshape((-1,) + (1,) * (new.ndim - 1))
            return jnp.where(m, new, old)

        return jax.tree.map(pick, fresh, state)

    def __call__(self, state: State, x: jnp.ndarray):
        return self._kernel(state, x)


class SoundStreamEncoder(BatchedStreamingModel):
    """320 samples @16 kHz → 64 features, per stream.

    Reference: lyra/soundstream_encoder.{h,cc} + soundstream_encoder.tflite.
    Input  [B, 320] unit-float audio; output [B, 64] features.
    backend="fused" runs the pallas megakernel instead of the per-op XLA
    lowering (identical math; see tests/test_fused_stack.py).
    """

    def __init__(self, model_path: str, mode: str = "float",
                 backend: str = "xla", block_streams: int = 64):
        path = os.path.join(model_path, "soundstream_encoder.tflite")
        if backend == "fused":
            fused = _FusedModel(path, mode, block_streams)
            self._fused = fused
            self.init_state = fused.init_state
            self.reset_rows = fused.reset_rows

            def extract(state, frames):
                feats, state = fused(state, frames)  # [B, 320] -> [B, 1, 64]
                return feats[:, 0, :], state

            self.extract = extract
            return
        graph = load_graph(path, mode=mode)
        super().__init__(graph, "input_audio", "output_0")

    def extract(self, state: State, frames: jnp.ndarray):
        feats, state = self(state, frames[:, None, :])  # [B, 1, 320]
        return feats[:, 0, 0, :], state  # [B, 64]


class LyraGanModel(BatchedStreamingModel):
    """64 features → 320 samples @16 kHz, per stream.

    Reference: lyra/lyra_gan_model.{h,cc} + lyragan.tflite.
    Input  [B, 64] features; output [B, 320] unit-float audio.
    backend="fused" runs the pallas megakernel.
    """

    def __init__(self, model_path: str, mode: str = "float",
                 backend: str = "xla", block_streams: int = 64):
        path = os.path.join(model_path, "lyragan.tflite")
        if backend == "fused":
            fused = _FusedModel(path, mode, block_streams)
            self._fused = fused
            self.init_state = fused.init_state
            self.reset_rows = fused.reset_rows

            def decode_hop(state, features):
                samples, state = fused(state, features[:, None, :])
                return samples, state  # [B, 320]

            self.decode_hop = decode_hop
            return
        graph = load_graph(path, mode=mode)
        super().__init__(graph, "input_audio", "output_0")

    def decode_hop(self, state: State, features: jnp.ndarray):
        samples, state = self(state, features[:, None, None, :])  # [B, 1, 1, 64]
        return samples[:, 0, :], state  # [B, 320]
