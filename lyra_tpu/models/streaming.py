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

# Streaming-state leaves below this element count are kept uncompressed when
# state compression is on: the per-stream scale would cost more than it saves.
_COMPRESS_MIN_SIZE = 256


def _quantize_leaf(x: jnp.ndarray) -> Dict[str, jnp.ndarray]:
    """Symmetric per-stream int8 quantization of one [B, ...] state buffer.

    The scale is dynamic (recomputed each tick from the buffer's amax), so
    no calibration is needed and silence stays exactly zero.  Note this
    does NOT speed up the serving step on TPU (XLA materializes conv
    operands, so the dequantized state round-trips HBM anyway — measured
    regression, PERF.md "Probed and rejected"); its use is halving
    per-stream state bytes for checkpoint/drain-based serving migration
    (utils/checkpoint.py).
    """
    flat = jnp.abs(x.astype(jnp.float32).reshape(x.shape[0], -1))
    amax = jnp.max(flat, axis=1)
    scale = jnp.where(amax > 0, amax / 127.0, 1.0)
    q = jnp.round(x.astype(jnp.float32)
                  / scale.reshape((-1,) + (1,) * (x.ndim - 1)))
    return {"q": jnp.clip(q, -127, 127).astype(jnp.int8),
            "s": scale}


def _dequantize_leaf(packed: Dict[str, jnp.ndarray], dtype) -> jnp.ndarray:
    q = packed["q"]
    s = packed["s"].reshape((-1,) + (1,) * (q.ndim - 1))
    return (q.astype(jnp.float32) * s).astype(dtype)


class BatchedStreamingModel:
    """Wraps a stateful single-stream GraphFn as a batched pure function.

    state_dtype="int8" stores the large streaming-state buffers compressed
    in HBM (int8 + per-stream dynamic scale, see `_quantize_leaf`); the
    graph itself still computes in its own dtype — only the *storage* of
    state between ticks changes.  Opt-in: it trades a small re-quantization
    error on the conv contexts for ~half the state HBM traffic.
    """

    def __init__(self, graph: GraphFn, input_name: str, output_name: str,
                 state_dtype: str | None = None):
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
        if state_dtype not in (None, "int8"):
            raise ValueError(f"unsupported state_dtype {state_dtype!r}")
        self._compress_keys = frozenset(
            k for k, v in single_state.items()
            if np.asarray(v).size >= _COMPRESS_MIN_SIZE
        ) if state_dtype == "int8" else frozenset()

    def _compress(self, raw: State) -> State:
        return {k: _quantize_leaf(v) if k in self._compress_keys else v
                for k, v in raw.items()}

    def _decompress(self, state: State) -> State:
        return {
            k: _dequantize_leaf(v, self._single_state_template[k].dtype)
            if k in self._compress_keys else v
            for k, v in state.items()
        }

    def init_state(self, batch_size: int) -> State:
        """Zero/init streaming state replicated over `batch_size` streams.

        Maps to the reference's ResetVariableTensors
        (reference: lyra/tflite_model_wrapper.cc:111-113).
        """
        raw = {
            k: jnp.broadcast_to(jnp.asarray(v), (batch_size,) + v.shape)
            for k, v in self._single_state_template.items()
        }
        return self._compress(raw)

    def reset_rows(self, state: State, mask: jnp.ndarray) -> State:
        """Reset state to initial values where `mask` ([B] bool) is set."""
        fresh = self.init_state(int(mask.shape[0]))

        def pick(new, old):
            m = mask.reshape((-1,) + (1,) * (new.ndim - 1))
            return jnp.where(m, new, old)

        return jax.tree.map(pick, fresh, state)

    def __call__(self, state: State, x: jnp.ndarray) -> Tuple[jnp.ndarray, State]:
        """x: [B, *single_input_shape] → ([B, *single_output_shape], state)."""
        if self._compress_keys:
            out, new_raw = self._batched(self._decompress(state), x)
            return out, self._compress(new_raw)
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

        if mode not in ("float", "bf16"):  # same loudness as load_graph's
            raise ValueError(  # unknown-mode error on the xla path
                f"backend='fused' supports mode 'float'/'bf16', not {mode!r}")
        self._kernel = FusedStackKernel(path, mode=mode,
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


def _wire_fused(model: "BatchedStreamingModel", fused: _FusedModel) -> None:
    """Point a fused-backend instance's base-class surface at the kernel:
    init_state/reset_rows delegate, __call__ (looked up on the class, so it
    runs BatchedStreamingModel.__call__) routes through _batched, and
    single() fails loudly instead of with a bare AttributeError."""
    model._fused = fused
    model.init_state = fused.init_state
    model.reset_rows = fused.reset_rows
    model._compress_keys = frozenset()
    model._batched = fused.__call__

    def _no_single(state, x):
        raise NotImplementedError(
            "backend='fused' has no single-stream path; use the batched call")

    model._single = _no_single


class SoundStreamEncoder(BatchedStreamingModel):
    """320 samples @16 kHz → 64 features, per stream.

    Reference: lyra/soundstream_encoder.{h,cc} + soundstream_encoder.tflite.
    Input  [B, 320] unit-float audio; output [B, 64] features.
    backend="fused" runs the pallas megakernel instead of the per-op XLA
    lowering (identical math; see tests/test_fused_stack.py).
    """

    def __init__(self, model_path: str, mode: str = "float",
                 backend: str = "xla", block_streams: int = 64,
                 state_dtype: str | None = None,
                 boundary_store: str | None = None):
        path = os.path.join(model_path, "soundstream_encoder.tflite")
        if backend == "fused":
            if state_dtype is not None:
                raise ValueError("state_dtype requires backend='xla' "
                                 "(the fused kernel manages its own state)")
            if boundary_store is not None:
                raise ValueError("boundary_store requires backend='xla' "
                                 "(the fused kernel holds boundaries in "
                                 "VMEM; there is nothing to compress)")
            fused = _FusedModel(path, mode, block_streams)
            _wire_fused(self, fused)

            def extract(state, frames):
                feats, state = fused(state, frames)  # [B, 320] -> [B, 1, 64]
                return feats[:, 0, :], state

            self.extract = extract
            return
        # boundary_scale 0.5: the encoder's depthwise-conv context concats
        # peak at amax 628 > fp8 e4m3's 448; a half pre-scale (exact power
        # of two) brings the measured range to 314
        # (benchmarks/boundary_range_probe.py).
        graph = load_graph(path, mode=mode, boundary_store=boundary_store,
                           boundary_scale=0.5)
        super().__init__(graph, "input_audio", "output_0",
                         state_dtype=state_dtype)

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
                 backend: str = "xla", block_streams: int = 64,
                 state_dtype: str | None = None,
                 boundary_store: str | None = None):
        path = os.path.join(model_path, "lyragan.tflite")
        if backend == "fused":
            if state_dtype is not None:
                raise ValueError("state_dtype requires backend='xla' "
                                 "(the fused kernel manages its own state)")
            if boundary_store is not None:
                raise ValueError("boundary_store requires backend='xla' "
                                 "(the fused kernel holds boundaries in "
                                 "VMEM; there is nothing to compress)")
            fused = _FusedModel(path, mode, block_streams)
            _wire_fused(self, fused)

            def decode_hop(state, features):
                samples, state = fused(state, features[:, None, :])
                return samples, state  # [B, 320]

            self.decode_hop = decode_hop
            return
        # boundary_scale 1.0: lyragan activations peak at amax 31, far
        # inside fp8 e4m3's 448 (benchmarks/boundary_range_probe.py).
        graph = load_graph(path, mode=mode, boundary_store=boundary_store,
                           boundary_scale=1.0)
        super().__init__(graph, "input_audio", "output_0",
                         state_dtype=state_dtype)

    def decode_hop(self, state: State, features: jnp.ndarray):
        samples, state = self(state, features[:, None, None, :])  # [B, 1, 1, 64]
        return samples[:, 0, :], state  # [B, 320]
