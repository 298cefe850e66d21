"""Pallas megakernel: run a streaming conv stack's hot core in VMEM.

Why: the per-op XLA lowering of SoundStream/LyraGAN
(lyra_tpu/tflite/executor.py) materializes every inter-layer activation to
HBM — ~1-2 MB of HBM traffic per stream per 20 ms hop, which leaves the
codec HBM-bandwidth-bound at a few percent MXU utilization.  Here the
multi-channel core of the graph (30-50 conv/elementwise ops) executes for a
block of streams inside one `pl.pallas_call`: weights (~1 MB bf16) and the
block's activations (a few hundred KB) stay in VMEM across the whole stack,
so HBM traffic collapses to inputs + outputs + streaming state.

Partitioning: Mosaic cannot relayout sub-32-bit vectors across size-1 minor
dims, and lane<->sublane reshapes (audio windowing) are unsupported shape
casts — so the *channel-1 audio edges* of each graph (SoundStream's first
strided conv with its input context state; LyraGAN's final transpose conv
with its overlap-add state) run as ordinary vmapped XLA ops outside the
kernel.  The partition is computed from dataflow: any op touching a
channel-1 activation is an "edge" op; edge ops ahead of the core form the
prologue, the rest the epilogue.  Entry/exit tensors between the XLA side
and the kernel are the C>=16 activations, which cost only KB/stream.

In-kernel op lowering (covers the full op vocabulary of the shipped Lyra
models, SURVEY.md §2.1):

* CONV_2D        — temporal, dilation 1, any stride, grouped: per-tap
                   matmuls accumulated on the MXU; strided taps gather their
                   rows as concats of unit slices (Mosaic supports neither
                   lane/sublane reshape splits nor >1-stride slices).
* DEPTHWISE      — K=3, dilation d: shifted elementwise FMAs (VPU).
* TRANSPOSE_CONV — stride s | kernel K: single matmul `x @ W[I, K*O]`
                   scattered by q = K/s shifted adds.
* CONCAT / STRIDED_SLICE / RESHAPE / SPLIT / ADD / SUB / LEAKY_RELU;
  QUANTIZE/DEQUANTIZE as identity (float/bf16 modes).
* READ/ASSIGN_VARIABLE — streaming conv state, block refs in/out.
"""

from __future__ import annotations

import functools
from typing import Any, Callable, Dict, List, Optional, Sequence, Set, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from lyra_tpu.tflite import model as tfl
from lyra_tpu.tflite.executor import (
    _conv2d,
    _depthwise_conv2d,
    _strided_slice,
    _transpose_conv,
    GraphLowering,
)

Array = Any

_EDGE_OPS = {
    "RESHAPE", "CONCATENATION", "STRIDED_SLICE", "ADD", "SUB", "MUL", "DIV",
    "CONV_2D", "DEPTHWISE_CONV_2D", "TRANSPOSE_CONV", "LEAKY_RELU",
    "QUANTIZE", "DEQUANTIZE", "READ_VARIABLE", "ASSIGN_VARIABLE",
}


def _mapped_shape(shape: Sequence[int]) -> Tuple[int, ...]:
    """Graph tensor shape (leading batch 1) → in-kernel shape sans batch."""
    shape = list(shape)
    if not shape or shape[0] != 1:
        raise ValueError(f"expected leading batch dim 1, got {shape}")
    rest = shape[1:]
    if len(rest) == 3 and rest[1] == 1:  # [T, 1, C] -> [T, C]
        return (rest[0], rest[2])
    return tuple(rest)


def _is_c1(shape: Sequence[int]) -> bool:
    """Channel-1 / channel-less tensors are kept on the XLA side."""
    m = _mapped_shape(shape)
    return len(m) < 2 or m[-1] == 1


class FusedStackKernel:
    """Partitioned executor: XLA audio edges around one pallas core call."""

    def __init__(self, path: str, signature: str = "serving_default",
                 mode: str = "bf16", block_streams: int = 64,
                 interpret: bool = False):
        mdef = tfl.load(path)
        gl = GraphLowering(mdef, signature,
                           mode="float" if mode == "bf16" else mode)
        if gl.mode != "float":
            raise NotImplementedError("fused stack supports float/bf16 modes")
        self.dtype = jnp.bfloat16 if mode == "bf16" else jnp.float32
        self._np_dt = np.dtype(self.dtype)
        self.block = block_streams
        self.interpret = interpret
        self.sg = gl.sg
        self._consts = gl.consts
        if len(gl.sig_inputs) != 1 or len(gl.sig_outputs) != 1:
            raise NotImplementedError("fused stack expects 1 input / 1 output")
        self.input_idx = next(iter(gl.sig_inputs.values()))
        self.output_idx = next(iter(gl.sig_outputs.values()))

        # State vars: name -> init value; split into edge (graph-shape f32)
        # and core (mapped shape, compute dtype).
        self._var_of_handle: Dict[int, str] = {}
        for op in self.sg.ops:
            if op.name == "VAR_HANDLE":
                self._var_of_handle[op.outputs[0]] = op.options["shared_name"]
        self._state_shapes = self._find_state_shapes()
        self._partition(gl.init_state_vals)
        self._validate_core()
        self._collect_weights()
        self._call = functools.lru_cache(maxsize=8)(self._build_call)

    def _validate_core(self) -> None:
        """Refuse at build time what the kernel body would get silently
        wrong: fused activations (the per-op lowerings return the raw
        accumulation), read-after-assign of a state var inside one tick
        (READ always reads the *input* state ref), and core vars that are
        read but never assigned (their output ref would be returned
        uninitialized and carried into the next tick)."""
        # Fused activations are dropped by BOTH the pallas core lowerings
        # and the XLA edge interpreter (_edge_fn), so sweep every op in the
        # subgraph, not just the core.
        for op in self.sg.ops:
            if (op.name in ("CONV_2D", "DEPTHWISE_CONV_2D", "TRANSPOSE_CONV",
                            "ADD", "SUB", "MUL", "DIV", "CONCATENATION")
                    and op.options.get("activation") is not None):
                raise NotImplementedError(
                    f"fused kernel: {op.name} with fused activation "
                    f"{op.options['activation']!r} is not supported")
        assigned = set()
        for i in self._core:
            op = self.sg.ops[i]
            if op.name == "READ_VARIABLE":
                name = self._var_of_handle[op.inputs[0]]
                if name in assigned:
                    raise NotImplementedError(
                        f"fused kernel: state var {name!r} read after "
                        f"assign within one tick is not supported")
            elif op.name == "ASSIGN_VARIABLE":
                assigned.add(self._var_of_handle[op.inputs[0]])
        read_only = set(self._core_state_names) - assigned
        if read_only:
            raise NotImplementedError(
                f"fused kernel: core state vars {sorted(read_only)} are "
                f"read but never assigned — their carried state would be "
                f"uninitialized")

    # -- graph analysis --------------------------------------------------------
    def _find_state_shapes(self) -> Dict[str, Tuple[int, ...]]:
        shapes = {}
        for op in self.sg.ops:
            if op.name == "READ_VARIABLE":
                shapes[self._var_of_handle[op.inputs[0]]] = tuple(
                    self.sg.tensors[op.outputs[0]].shape)
        return shapes

    def _op_is_edge(self, op) -> bool:
        if op.name in ("CALL_ONCE", "VAR_HANDLE", "SPLIT"):
            return False
        if op.name == "READ_VARIABLE":
            return _is_c1(self._state_shapes[self._var_of_handle[op.inputs[0]]])
        if op.name == "ASSIGN_VARIABLE":
            return _is_c1(self.sg.tensors[op.inputs[1]].shape)
        for t in list(op.inputs) + list(op.outputs):
            if t < 0 or t in self._consts:
                continue
            if _is_c1(self.sg.tensors[t].shape):
                return True
        return False

    def _partition(self, init_state_vals: Dict[str, np.ndarray]):
        sg = self.sg
        producer: Dict[int, int] = {}
        for i, op in enumerate(sg.ops):
            for o in op.outputs:
                producer[o] = i
        edge = [self._op_is_edge(op) for op in sg.ops]
        core_idx = [i for i, op in enumerate(sg.ops)
                    if not edge[i] and op.name not in ("CALL_ONCE", "VAR_HANDLE")]
        core_set = set(core_idx)

        # reaches_core: does this edge op's output feed the core (transitively)?
        consumers: Dict[int, List[int]] = {}
        for i, op in enumerate(sg.ops):
            for t in op.inputs:
                consumers.setdefault(t, []).append(i)
        reaches: Dict[int, bool] = {}

        def op_reaches(i) -> bool:
            if i in reaches:
                return reaches[i]
            reaches[i] = False
            for o in sg.ops[i].outputs:
                for c in consumers.get(o, []):
                    if c in core_set or (edge[c] and op_reaches(c)):
                        reaches[i] = True
            return reaches[i]

        prologue: Set[int] = {i for i, op in enumerate(sg.ops)
                              if edge[i] and op_reaches(i)}
        # Attach state-maintenance ops (slice/assign of prologue outputs).
        changed = True
        while changed:
            changed = False
            for i, op in enumerate(sg.ops):
                if not edge[i] or i in prologue:
                    continue
                ins = [t for t in op.inputs
                       if t >= 0 and t not in self._consts and t in producer
                       and sg.ops[producer[t]].name != "VAR_HANDLE"]
                if ins and all(producer[t] in prologue for t in ins):
                    prologue.add(i)
                    changed = True
        epilogue = [i for i, op in enumerate(sg.ops) if edge[i]
                    and i not in prologue]
        self._prologue = sorted(prologue)
        self._epilogue = sorted(epilogue)
        self._core = core_idx

        # Sanity: core must not consume epilogue outputs.
        epi_outs = {o for i in self._epilogue for o in sg.ops[i].outputs}
        for i in self._core:
            for t in sg.ops[i].inputs:
                if t in epi_outs:
                    raise AssertionError("core op consumes epilogue output")

        # Entry/exit tensors.
        pro_outs = {o for i in self._prologue for o in sg.ops[i].outputs}
        core_outs = {o for i in self._core for o in sg.ops[i].outputs}
        entry: Set[int] = set()
        for i in self._core:
            for t in sg.ops[i].inputs:
                if t in pro_outs or t == self.input_idx:
                    if t == self.input_idx and not _is_c1(
                            sg.tensors[t].shape):
                        entry.add(t)
                    elif t in pro_outs:
                        entry.add(t)
        exit_: Set[int] = set()
        for i in self._epilogue:
            for t in sg.ops[i].inputs:
                if t in core_outs:
                    exit_.add(t)
        self._entry = sorted(entry)
        self._exit = sorted(exit_)
        self._output_in_core = self.output_idx in core_outs
        self._input_in_core = self.input_idx in self._entry

        # Which state vars are touched by edge vs core ops.
        edge_states: Set[str] = set()
        core_states: Set[str] = set()
        for i, op in enumerate(sg.ops):
            if op.name in ("READ_VARIABLE", "ASSIGN_VARIABLE"):
                name = self._var_of_handle[op.inputs[0]]
                (edge_states if (i in prologue or i in set(self._epilogue))
                 else core_states).add(name)
        if edge_states & core_states:
            raise AssertionError("state var shared between edge and core")
        self._edge_state_names = sorted(edge_states)
        self._core_state_names = sorted(core_states)
        self._init_state: Dict[str, np.ndarray] = {}
        for k, v in init_state_vals.items():
            if k in edge_states:
                # graph shape minus leading batch dim, f32
                self._init_state[k] = np.asarray(v, np.float32)[0]
            else:
                self._init_state[k] = np.asarray(v, self._np_dt).reshape(
                    _mapped_shape(v.shape))

    # -- weights ---------------------------------------------------------------
    def _weight(self, tensor_idx: int, transform, kind: str = "") -> int:
        # One slot per const tensor, but the layout transform is consumer-
        # specific: a tensor consumed by two different op types would get
        # the first consumer's layout for both — refuse instead of reading
        # a mis-laid-out weight (no shipped graph shares consts that way).
        if tensor_idx in self._weight_slot:
            slot, prev_kind = self._weight_slot[tensor_idx]
            if prev_kind != kind:
                raise NotImplementedError(
                    f"const tensor {tensor_idx} shared across op kinds "
                    f"({prev_kind!r} vs {kind!r}) — unsupported in the "
                    f"fused kernel")
            return slot
        w = np.asarray(self._consts[tensor_idx], np.float32)
        slot = len(self._weights)
        self._weight_slot[tensor_idx] = (slot, kind)
        t = np.ascontiguousarray(transform(w))
        self._weights.append(t.astype(self._np_dt))
        return slot

    def _collect_weights(self):
        self._weights: List[np.ndarray] = []
        self._weight_slot: Dict[int, Tuple[int, str]] = {}
        for i in self._core:
            op = self.sg.ops[i]
            nm = op.name
            if nm == "CONV_2D":
                # [O, K, 1, I_f] -> [K, I_f, O]
                self._weight(op.inputs[1], lambda w: np.transpose(
                    w[:, :, 0, :], (1, 2, 0)), kind="conv_w")
                if len(op.inputs) > 2 and op.inputs[2] >= 0:
                    self._weight(op.inputs[2], lambda b: b.reshape(1, -1),
                                 kind="row")
            elif nm == "DEPTHWISE_CONV_2D":
                self._weight(op.inputs[1], lambda w: w[0, :, 0, :],
                             kind="dw_w")
                if len(op.inputs) > 2 and op.inputs[2] >= 0:
                    self._weight(op.inputs[2], lambda b: b.reshape(1, -1),
                                 kind="row")
            elif nm == "TRANSPOSE_CONV":
                # [O, K, 1, I] -> [I, K*O]
                self._weight(op.inputs[1], lambda w: np.transpose(
                    w[:, :, 0, :], (2, 1, 0)).reshape(w.shape[3], -1),
                    kind="tc_w")
                if len(op.inputs) > 3 and op.inputs[3] >= 0:
                    self._weight(op.inputs[3], lambda b: b.reshape(1, -1),
                                 kind="row")
            elif nm in ("ADD", "SUB", "MUL", "DIV"):
                for t in op.inputs:
                    if t in self._consts:
                        self._weight(t, lambda b: np.asarray(b).reshape(1, -1),
                                     kind="row")
            elif nm == "CONCATENATION":
                for t in op.inputs:
                    if t in self._consts:
                        shape = _mapped_shape(self.sg.tensors[t].shape)
                        self._weight(t, lambda b, s=shape: np.asarray(
                            b).reshape(s), kind=f"shape{shape}")

    # -- public API ------------------------------------------------------------
    def init_state(self, batch_size: int) -> Dict[str, jnp.ndarray]:
        return {
            k: jnp.broadcast_to(jnp.asarray(v), (batch_size,) + v.shape)
            for k, v in self._init_state.items()
        }

    def __call__(self, state: Dict[str, Array], x: Array):
        """x: [B, *mapped_input_shape] → ([B, *mapped_output_shape], state)."""
        b = x.shape[0]
        blk = min(self.block, b)
        if b % blk != 0:
            raise ValueError(f"batch {b} not divisible by block {blk}")
        return self._call(b, blk)(state, x)

    # -- XLA edge interpreter --------------------------------------------------
    def _edge_fn(self, op_indices: List[int], seed_tensors: List[int],
                 out_tensors: List[int]):
        """Single-example interpreter over edge ops, to be vmapped.

        Seeds: values in graph shape minus leading batch dim.
        Returns (outputs in graph-minus-batch shape, state updates).
        """
        sg, consts = self.sg, self._consts
        var_of_handle = self._var_of_handle
        state_names = self._edge_state_names

        def fn(seeds: List[Array], state: Dict[str, Array]):
            env: Dict[int, Array] = {}
            for t, v in zip(seed_tensors, seeds):
                env[t] = v[None]  # restore leading batch dim
            new_state = dict(state)

            def get(t):
                if t in env:
                    return env[t]
                if t in consts:
                    return consts[t]
                raise KeyError(f"edge tensor {t} undefined")

            for i in op_indices:
                op = sg.ops[i]
                nm = op.name
                o0 = op.outputs[0] if op.outputs else -1
                if nm == "READ_VARIABLE":
                    env[o0] = new_state[var_of_handle[op.inputs[0]]][None]
                elif nm == "ASSIGN_VARIABLE":
                    new_state[var_of_handle[op.inputs[0]]] = get(
                        op.inputs[1])[0]
                elif nm == "RESHAPE":
                    env[o0] = jnp.reshape(
                        get(op.inputs[0]), list(sg.tensors[o0].shape))
                elif nm == "CONCATENATION":
                    env[o0] = jnp.concatenate(
                        [jnp.broadcast_to(get(t), sg.tensors[t].shape)
                         for t in op.inputs], axis=op.options["axis"])
                elif nm == "STRIDED_SLICE":
                    x = get(op.inputs[0])
                    env[o0] = _strided_slice(
                        x, consts[op.inputs[1]], consts[op.inputs[2]],
                        consts[op.inputs[3]], op.options, x.shape)
                elif nm == "CONV_2D":
                    x = get(op.inputs[0])
                    w = consts[op.inputs[1]]
                    b = consts.get(op.inputs[2]) if len(op.inputs) > 2 else None
                    env[o0] = _conv2d(x, w, b, op.options,
                                      (x.shape[-1], w.shape[-1]))
                elif nm == "DEPTHWISE_CONV_2D":
                    x = get(op.inputs[0])
                    env[o0] = _depthwise_conv2d(
                        x, consts[op.inputs[1]],
                        consts.get(op.inputs[2]) if len(op.inputs) > 2 else None,
                        op.options)
                elif nm == "TRANSPOSE_CONV":
                    out_shape = [int(v) for v in consts[op.inputs[0]]]
                    env[o0] = _transpose_conv(
                        get(op.inputs[2]), consts[op.inputs[1]],
                        consts.get(op.inputs[3]) if len(op.inputs) > 3 else None,
                        op.options, out_shape)
                elif nm == "LEAKY_RELU":
                    xv = get(op.inputs[0])
                    env[o0] = jnp.where(xv >= 0, xv,
                                        xv * op.options["alpha"])
                elif nm in ("ADD", "SUB", "MUL", "DIV"):
                    a, b = get(op.inputs[0]), get(op.inputs[1])
                    env[o0] = {"ADD": lambda: a + b, "SUB": lambda: a - b,
                               "MUL": lambda: a * b, "DIV": lambda: a / b}[nm]()
                elif nm in ("QUANTIZE", "DEQUANTIZE"):
                    env[o0] = get(op.inputs[0])
                else:
                    raise NotImplementedError(f"edge op {nm}")
            outs = [env[t][0] for t in out_tensors]
            return outs, {k: new_state[k] for k in state_names}

        return fn

    # -- composition -----------------------------------------------------------
    def _build_call(self, batch: int, blk: int):
        sg = self.sg
        grid = (batch // blk,)
        core_states = self._core_state_names
        edge_states = self._edge_state_names

        def m_shape(t):
            return _mapped_shape(sg.tensors[t].shape)

        # prologue: graph input (+edge states) -> entry tensors
        pro_out_tensors = [t for t in self._entry if t != self.input_idx]
        pro_fn = self._edge_fn(self._prologue, [self.input_idx],
                               pro_out_tensors) if (
            self._prologue or pro_out_tensors) else None

        # epilogue: exit tensors (+edge states) -> graph output
        epi_out_tensors = ([] if self._output_in_core else [self.output_idx])
        epi_fn = self._edge_fn(self._epilogue, self._exit,
                               epi_out_tensors) if self._epilogue else None

        # ---- pallas core ----
        kernel_entry = list(self._entry)
        kernel_exit = list(self._exit)
        if self._output_in_core:
            kernel_exit = kernel_exit + [self.output_idx]

        def block_spec(shape):
            nd = len(shape)
            return pl.BlockSpec((blk,) + tuple(shape),
                                lambda i, nd=nd: (i,) + (0,) * nd,
                                memory_space=pltpu.VMEM)

        def full_spec(shape):
            nd = len(shape)
            return pl.BlockSpec(tuple(shape),
                                lambda i, nd=nd: (0,) * nd,
                                memory_space=pltpu.VMEM)

        in_specs = (
            [block_spec(m_shape(t)) for t in kernel_entry]
            + [block_spec(self._init_state[k].shape) for k in core_states]
            + [full_spec(w.shape) for w in self._weights]
        )
        out_specs = (
            [block_spec(m_shape(t)) for t in kernel_exit]
            + [block_spec(self._init_state[k].shape) for k in core_states]
        )
        out_shapes = (
            [jax.ShapeDtypeStruct(
                (batch,) + m_shape(t),
                jnp.float32 if (self._output_in_core and t == self.output_idx)
                else self.dtype)
             for t in kernel_exit]
            + [jax.ShapeDtypeStruct((batch,) + self._init_state[k].shape,
                                    self.dtype) for k in core_states]
        )
        kernel = self._make_kernel(blk, kernel_entry, kernel_exit)
        core_call = pl.pallas_call(
            kernel, grid=grid, in_specs=in_specs, out_specs=out_specs,
            out_shape=out_shapes, interpret=self.interpret,
            compiler_params=pltpu.CompilerParams(
                vmem_limit_bytes=100 * 1024 * 1024),
        )
        weights = [jnp.asarray(w) for w in self._weights]
        n_exit = len(kernel_exit)

        def run(state, x):
            new_state = dict(state)
            edge_st = {k: state[k].astype(jnp.float32) for k in edge_states}
            # Prologue (vmapped XLA)
            entry_vals: Dict[int, Array] = {}
            if self._input_in_core:
                entry_vals[self.input_idx] = x.astype(self.dtype)
            if pro_fn is not None:
                outs, pro_state = jax.vmap(pro_fn)(
                    [x.astype(jnp.float32)], edge_st)
                for t, v in zip(pro_out_tensors, outs):
                    entry_vals[t] = v.reshape((batch,) + m_shape(t)).astype(
                        self.dtype)
                for k, v in pro_state.items():
                    new_state[k] = v
                    edge_st[k] = v
            # Core (pallas)
            args = (
                [entry_vals[t] for t in kernel_entry]
                + [state[k].astype(self.dtype) for k in core_states]
                + weights
            )
            outs = core_call(*args)
            exit_vals = {t: v for t, v in zip(kernel_exit, outs[:n_exit])}
            for k, v in zip(core_states, outs[n_exit:]):
                new_state[k] = v
            # Epilogue (vmapped XLA)
            if epi_fn is not None:
                seeds = [
                    exit_vals[t].astype(jnp.float32).reshape(
                        (batch,) + tuple(sg.tensors[t].shape[1:]))
                    for t in self._exit
                ]
                outs, epi_state = jax.vmap(epi_fn)(seeds, edge_st)
                for k, v in epi_state.items():
                    new_state[k] = v
                if not self._output_in_core:
                    y = outs[0].reshape(
                        (batch,) + _mapped_shape(sg.tensors[self.output_idx].shape))
                else:
                    y = exit_vals[self.output_idx]
            else:
                y = exit_vals[self.output_idx]
            return y.astype(jnp.float32), new_state

        return jax.jit(run)

    # -- core kernel -----------------------------------------------------------
    def _make_kernel(self, blk: int, kernel_entry: List[int],
                     kernel_exit: List[int]):
        sg = self.sg
        dtype = self.dtype
        core_states = self._core_state_names
        weight_slot = self._weight_slot
        consts = self._consts
        var_of_handle = self._var_of_handle
        n_entry, n_state = len(kernel_entry), len(core_states)
        n_w = len(self._weights)
        core_ops = self._core

        def kernel(*refs):
            entry_refs = refs[:n_entry]
            state_refs = {k: refs[n_entry + i]
                          for i, k in enumerate(core_states)}
            w_refs = refs[n_entry + n_state : n_entry + n_state + n_w]
            exit_refs = refs[n_entry + n_state + n_w :
                             n_entry + n_state + n_w + len(kernel_exit)]
            out_state_refs = {
                k: refs[n_entry + n_state + n_w + len(kernel_exit) + i]
                for i, k in enumerate(core_states)
            }

            env: Dict[int, Array] = {
                t: r[:] for t, r in zip(kernel_entry, entry_refs)
            }

            def wv(tensor_idx: int) -> Array:
                return w_refs[weight_slot[tensor_idx][0]][:]

            def get(i: int) -> Array:
                if i in env:
                    return env[i]
                if i in weight_slot:  # const data operand (zeros block)
                    w = wv(i)
                    return jnp.broadcast_to(w[None], (blk,) + w.shape)
                raise KeyError(f"tensor {i} ({sg.tensors[i].name}) undefined")

            def static(i: int) -> np.ndarray:
                return np.asarray(consts[i])

            for idx in core_ops:
                op = sg.ops[idx]
                nm = op.name
                o0 = op.outputs[0] if op.outputs else -1
                if nm == "READ_VARIABLE":
                    env[o0] = state_refs[var_of_handle[op.inputs[0]]][:]
                elif nm == "ASSIGN_VARIABLE":
                    ref = out_state_refs[var_of_handle[op.inputs[0]]]
                    ref[:] = get(op.inputs[1]).astype(ref.dtype)
                elif nm == "RESHAPE":
                    target = _mapped_shape(list(sg.tensors[o0].shape))
                    env[o0] = get(op.inputs[0]).reshape((blk,) + target)
                elif nm == "CONCATENATION":
                    axis = op.options["axis"]
                    nd_graph = len(sg.tensors[o0].shape)
                    env[o0] = jnp.concatenate(
                        [get(t) for t in op.inputs],
                        axis=self._map_axis(axis, nd_graph))
                elif nm == "STRIDED_SLICE":
                    env[o0] = self._mapped_strided_slice(
                        get(op.inputs[0]), static(op.inputs[1]),
                        static(op.inputs[2]), static(op.inputs[3]),
                        op.options, sg.tensors[op.inputs[0]].shape)
                elif nm == "CONV_2D":
                    env[o0] = self._conv(get(op.inputs[0]), op, wv)
                elif nm == "DEPTHWISE_CONV_2D":
                    env[o0] = self._depthwise(get(op.inputs[0]), op, wv)
                elif nm == "TRANSPOSE_CONV":
                    env[o0] = self._tconv(get(op.inputs[2]), op, wv)
                elif nm == "LEAKY_RELU":
                    xv = get(op.inputs[0])
                    alpha = xv.dtype.type(op.options["alpha"])
                    zero = xv.dtype.type(0)
                    # max/min form: some targets lack vector compares for
                    # sub-32-bit types (jnp.where would need one).
                    env[o0] = (jnp.maximum(xv, zero)
                               + alpha * jnp.minimum(xv, zero))
                elif nm in ("ADD", "SUB", "MUL", "DIV"):
                    def operand(t):
                        if t not in env and t in weight_slot:
                            return wv(t)  # [1, C] broadcast
                        return get(t)
                    a, bb = operand(op.inputs[0]), operand(op.inputs[1])
                    env[o0] = {"ADD": lambda: a + bb, "SUB": lambda: a - bb,
                               "MUL": lambda: a * bb,
                               "DIV": lambda: a / bb}[nm]()
                elif nm == "SPLIT":
                    axis = int(static(op.inputs[0]))
                    nd_graph = len(sg.tensors[op.inputs[1]].shape)
                    parts = jnp.split(
                        get(op.inputs[1]), op.options["num_splits"],
                        axis=self._map_axis(axis, nd_graph))
                    for oi, part in zip(op.outputs, parts):
                        env[oi] = part
                elif nm in ("QUANTIZE", "DEQUANTIZE"):
                    env[o0] = get(op.inputs[0])
                else:
                    raise NotImplementedError(f"fused stack core op {nm}")

            for t, ref in zip(kernel_exit, exit_refs):
                ref[:] = get(t).astype(ref.dtype)

        return kernel

    # -- core op lowering helpers ----------------------------------------------
    @staticmethod
    def _map_axis(axis: int, nd_graph: int) -> int:
        if axis < 0:
            axis += nd_graph
        if nd_graph == 4:
            return {0: 0, 1: 1, 3: 2}[axis]
        return axis

    def _mapped_strided_slice(self, x, begin, end, strides, opts, graph_shape):
        if opts.get("shrink_axis_mask", 0) or opts.get("ellipsis_mask", 0) \
                or opts.get("new_axis_mask", 0):
            raise NotImplementedError("slice masks not used by Lyra graphs")
        bm, em = opts.get("begin_mask", 0), opts.get("end_mask", 0)
        nd = len(graph_shape)
        sl = [slice(None)] * x.ndim
        for g_axis in range(1, nd):
            if nd == 4 and g_axis == 2:
                continue
            m_axis = self._map_axis(g_axis, nd)
            b = None if bm & (1 << g_axis) else int(begin[g_axis])
            e = None if em & (1 << g_axis) else int(end[g_axis])
            s = int(strides[g_axis])
            if b is not None and b < 0:
                b += graph_shape[g_axis]
            if e is not None and e < 0:
                e += graph_shape[g_axis]
            sl[m_axis] = slice(b, e, s if s != 1 else None)
        return x[tuple(sl)]

    def _conv(self, x, op, wv):
        o0 = op.outputs[0]
        t_out = self.sg.tensors[o0].shape[1]
        w_shape = tuple(self.sg.tensors[op.inputs[1]].shape)  # [O, K, 1, I_f]
        o_ch, k, i_f = w_shape[0], w_shape[1], w_shape[3]
        stride = op.options["stride_h"]
        if op.options.get("dilation_h", 1) != 1:
            raise NotImplementedError("dilated dense conv not in Lyra graphs")
        blk, _, c_in = x.shape
        groups = c_in // i_f
        o_g = o_ch // groups
        w3 = wv(op.inputs[1])  # [K, I_f, O]

        def mm(a2d, w2d):
            return jax.lax.dot_general(
                a2d, w2d, dimension_numbers=(((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32)

        if stride == 1:
            # K <= 3 here: per-tap matmul accumulation avoids window
            # materialization (and Mosaic's size-1 middle-dim reshape limit).
            outs = []
            for g in range(groups):
                x_g = x[:, :, g * i_f : (g + 1) * i_f]
                acc_g = None
                for j in range(k):
                    a = x_g[:, j : j + t_out, :].reshape(blk * t_out, i_f)
                    term = mm(a, w3[j, :, g * o_g : (g + 1) * o_g])
                    acc_g = term if acc_g is None else acc_g + term
                outs.append(acc_g)
        else:
            # Strided conv (t_out <= 4 in these graphs).  Mosaic supports
            # neither >1-stride slices nor non-power-of-two sublane splits,
            # so per tap gather the strided rows as a concat of unit slices
            # (all no-op layout moves), then one matmul per tap.
            outs = []
            for g in range(groups):
                x_g = x[:, :, g * i_f : (g + 1) * i_f]
                acc_g = None
                for j in range(k):
                    rows = jnp.concatenate(
                        [x_g[:, t * stride + j : t * stride + j + 1, :]
                         for t in range(t_out)], axis=1)
                    a = rows.reshape(blk * t_out, i_f)
                    term = mm(a, w3[j, :, g * o_g : (g + 1) * o_g])
                    acc_g = term if acc_g is None else acc_g + term
                outs.append(acc_g)
        acc = outs[0] if groups == 1 else jnp.concatenate(outs, axis=-1)
        if len(op.inputs) > 2 and op.inputs[2] >= 0:
            acc = acc + wv(op.inputs[2]).astype(jnp.float32)
        return acc.reshape(blk, t_out, o_ch).astype(self.dtype)

    def _depthwise(self, x, op, wv):
        o0 = op.outputs[0]
        t_out = self.sg.tensors[o0].shape[1]
        dil = op.options.get("dilation_h", 1)
        if op.options["stride_h"] != 1:
            raise NotImplementedError("strided depthwise not in Lyra graphs")
        w = wv(op.inputs[1])  # [K, C]
        k = w.shape[0]
        acc = None
        for j in range(k):
            term = x[:, j * dil : j * dil + t_out, :] * w[j][None, None, :]
            acc = term if acc is None else acc + term
        acc = acc.astype(jnp.float32)
        if len(op.inputs) > 2 and op.inputs[2] >= 0:
            acc = acc + wv(op.inputs[2]).astype(jnp.float32)
        return acc.astype(self.dtype)

    def _tconv(self, x, op, wv):
        """VALID fractionally-strided conv: one matmul + q shifted adds."""
        o0 = op.outputs[0]
        t_out = self.sg.tensors[o0].shape[1]
        w_meta = tuple(self.sg.tensors[op.inputs[1]].shape)  # [O, K, 1, I]
        o_ch, k = w_meta[0], w_meta[1]
        stride = op.options["stride_h"]
        if k % stride != 0:
            raise NotImplementedError("transpose conv needs stride | kernel")
        q = k // stride
        blk, t_in, _ = x.shape
        wmat = wv(op.inputs[1])  # [I, K*O], tap-major columns
        x2 = x.reshape(blk * t_in, x.shape[2])
        zero = jnp.zeros((blk, 1, o_ch), jnp.float32)
        # Per output phase r: out[j*s + r] = sum_a x[j - a] @ W[a*s + r].
        phases = []
        for r in range(stride):
            acc = None
            for a in range(q):
                kk = a * stride + r
                term = jax.lax.dot_general(
                    x2, wmat[:, kk * o_ch : (kk + 1) * o_ch],
                    dimension_numbers=(((1,), (0,)), ((), ())),
                    preferred_element_type=jnp.float32,
                ).reshape(blk, t_in, o_ch)
                padded = jnp.concatenate(
                    [zero] * a + [term] + [zero] * (q - a), axis=1)
                acc = padded if acc is None else acc + padded
            phases.append(acc)  # [blk, t_in + q, O] float32
        # Interleave phases: out rows j*s + r (f32 middle-dim ops only).
        inter = jnp.stack(phases, axis=2)  # [blk, t_in + q, s, O]
        full = inter.reshape(blk, (t_in + q) * stride, o_ch)[:, :t_out, :]
        if len(op.inputs) > 3 and op.inputs[3] >= 0:
            full = full + wv(op.inputs[3]).astype(jnp.float32)
        return full.astype(self.dtype)
