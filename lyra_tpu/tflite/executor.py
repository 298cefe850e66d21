"""Lower a parsed TFLite graph to a pure JAX function with explicit state.

This is the TPU-native replacement for the reference's per-frame TFLite
interpreter (reference: lyra/tflite_model_wrapper.cc:36-95).  Instead of an
interpreter invoked per stream per frame, each model graph is lowered once to
a pure function

    outputs, new_state = fn(state, **inputs)

whose streaming conv-state variables (reference models carry ~27k floats of
per-stream state, see SURVEY.md §2.1) are an explicit pytree.  The function is
trace-compatible: `jax.jit` compiles it into a single fused XLA program, and
`jax.vmap` lifts it over a stream-batch axis so thousands of concurrent
streams run as one kernel launch on the MXU.

Quantization modes:
  * ``float``      — int8 islands are dequantized; everything runs in f32 (or
                     bf16).  Fastest; highest fidelity to the unquantized
                     network.  The TPU production path.
  * ``fakequant``  — float compute but activations are snapped to the int8
                     grid at every QUANTIZE / quantized-op boundary.  Tracks
                     the TFLite interpreter closely (divergence only from
                     requantization rounding edge cases).
  * ``int8``       — exact TFLite integer-kernel semantics for the quantized
                     islands: int8 tensors stay int8, convs accumulate in
                     int32 (MXU int8 path on TPU), requantization uses the
                     per-kernel fixed-point pipelines of the builtin TFLite
                     kernels with per-channel multipliers (see _INT8_ROUNDING
                     for the probed per-kernel rounding modes).  Bit-exact
                     against tf.lite.Interpreter with builtin kernels over
                     50+ streaming frames; note the XNNPACK delegate the
                     reference enables (lyra/tflite_model_wrapper.cc:63-84)
                     itself diverges from those builtin kernels by several
                     quantization steps (fp32 requantization), so builtin
                     kernels are the canonical oracle.
"""

from __future__ import annotations

import dataclasses
from typing import Any, Callable, Dict, List, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from lyra_tpu.tflite import model as tfl

Array = Any


def _np_dtype(t: tfl.TensorDef):
    return np.dtype(t.dtype)


def _dequantize_const(t: tfl.TensorDef) -> np.ndarray:
    """Constant int8/int32 tensor → float32 with per-channel scales applied."""
    data = t.data
    q = t.quant
    if q is None or data is None or data.dtype.kind == "f":
        return data
    scale = q.scale.astype(np.float32)
    zp = q.zero_point.astype(np.float32) if q.zero_point.size else np.zeros_like(scale)
    if q.per_channel:
        shape = [1] * data.ndim
        shape[q.quantized_dimension] = scale.size
        scale = scale.reshape(shape)
        zp = zp.reshape(shape)
    return (data.astype(np.float32) - zp) * scale


def _fq(x: Array, t: tfl.TensorDef) -> Array:
    """Fake-quantize `x` onto tensor `t`'s int8 grid (clamp + round)."""
    q = t.quant
    if q is None or t.dtype != np.int8:
        return x
    scale = float(q.scale[0])
    zp = float(q.zero_point[0]) if q.zero_point.size else 0.0
    qv = jnp.clip(jnp.round(x / scale + zp), -128.0, 127.0)
    return (qv - zp) * scale


_ACT_FNS = {
    None: lambda x: x,
    "RELU": lambda x: jnp.maximum(x, 0.0),
    "RELU6": lambda x: jnp.clip(x, 0.0, 6.0),
    "RELU_N1_TO_1": lambda x: jnp.clip(x, -1.0, 1.0),
    "TANH": jnp.tanh,
}


# ---- exact TFLite integer-kernel arithmetic (mode="int8") -------------------
#
# TFLite expresses every real-valued rescale `acc * m` (m = s_in*s_w/s_out,
# 0 < m) as a fixed-point multiplier q = round(frexp-mantissa * 2^31) plus a
# base-2 exponent.  How that product is then rounded back to int32 differs
# per kernel (single rounding vs two gemmlowp/ruy legacy pipelines);
# reproducing each kernel's variant exactly (see _INT8_ROUNDING) is what
# makes this mode bit-exact against the interpreter's integer islands
# instead of the ~6 quantization steps float emulation drifts.


# Which MultiplyByQuantizedMultiplier rounding each interpreter kernel uses,
# probed op-by-op against tf.lite.Interpreter(BUILTIN_WITHOUT_DEFAULT_
# DELEGATES, experimental_preserve_all_tensors=True) on the shipped Lyra
# graphs (tools/probe_int8_rounding.py).  Elementwise int8 kernels use
# TFLITE_SINGLE_ROUNDING; depthwise/transpose-conv requantize with ruy's
# RoundingRightShift (half up); ruy-backed CONV_2D picks its microkernel by
# filter depth — gemmlowp double rounding below 256 input channels, ruy
# rounding at ≥256 (each conv instance in the Lyra graphs is bit-exact
# under exactly one variant; see the probe tool's per-instance mode).
_INT8_ROUNDING = {
    "DEPTHWISE_CONV_2D": "ruy",
    "TRANSPOSE_CONV": "ruy",
    "LEAKY_RELU": "single",
    "ADD": "single",
    "QUANTIZE": "single",
}


def _conv_rounding(filter_in_channels: int) -> str:
    return "ruy" if filter_in_channels >= 256 else "double"


def _quantize_multiplier(m: float) -> Tuple[int, int]:
    """Real multiplier → (int32 fixed-point multiplier, base-2 shift)."""
    if m == 0.0:
        return 0, 0
    import math

    mant, shift = math.frexp(m)
    q = int(math.floor(mant * (1 << 31) + 0.5))  # TfLiteRound: half away
    if q == (1 << 31):
        q //= 2
        shift += 1
    if shift < -31:  # underflow: TFLite flushes to zero
        return 0, 0
    if shift > 30:  # saturate (single-rounding limit)
        return (1 << 31) - 1, 30
    assert q <= (1 << 31) - 1, f"multiplier {m} out of range"
    return q, shift


def _mbqm(acc: Array, qmult, shift, rounding: str = "single") -> Array:
    """MultiplyByQuantizedMultiplier: int32 acc × fixed-point multiplier.

    qmult/shift may be scalars or per-channel int32 arrays broadcastable
    against `acc`.  Two exact int64 emulations, because the interpreter's
    kernels mix them (probed per op kind, see _INT8_ROUNDING):

    * ``single`` — TFLITE_SINGLE_ROUNDING (default since TF ~2.9):
      result = (acc * qmult + 2^(30 - shift)) >> (31 - shift), floor shift.
    * ``double`` — legacy gemmlowp pipeline still used by the ruy conv
      path: SaturatingRoundingDoublingHighMul (truncating division by 2^31
      with an asymmetric nudge) followed by RoundingDivideByPOT (round half
      away from zero).
    """
    # The products need true 64-bit integers; scope x64 to this helper so
    # the rest of the framework keeps the default 32-bit types.
    with jax.enable_x64(True):
        qmult = jnp.asarray(np.asarray(qmult, np.int64))
        if rounding == "single":
            total_shift = jnp.asarray(31 - np.asarray(shift, np.int64))
            rnd = jnp.int64(1) << (total_shift - 1)
            result = (acc.astype(jnp.int64) * qmult + rnd) >> total_shift
            return jnp.clip(result, -(1 << 31), (1 << 31) - 1).astype(jnp.int32)
        assert rounding in ("double", "ruy"), rounding
        shift = jnp.asarray(np.asarray(shift, np.int64))
        left = jnp.maximum(shift, 0)
        right = jnp.maximum(-shift, 0)
        ab = (acc.astype(jnp.int64) << left) * qmult
        nudge = jnp.where(ab >= 0, jnp.int64(1) << 30,
                          jnp.int64(1) - (jnp.int64(1) << 30))
        # gemmlowp divides by 2^31 with C truncation-toward-zero (the
        # asymmetric nudge matches); an arithmetic shift would floor.
        x = jax.lax.div(ab + nudge, jnp.int64(1) << 31)
        mask = (jnp.int64(1) << right) - 1
        rem = jnp.bitwise_and(x, mask)
        # "double" = gemmlowp RoundingDivideByPOT (half away from zero);
        # "ruy" = ruy::RoundingRightShift (half up — no negative nudge).
        neg = jnp.where(x < 0, 1, 0).astype(jnp.int64) if rounding == "double" else 0
        thresh = (mask >> 1) + neg
        return ((x >> right) + (rem > thresh).astype(jnp.int64)).astype(jnp.int32)


def _tensor_qparams(t: tfl.TensorDef) -> Tuple[float, int]:
    q = t.quant
    scale = float(q.scale[0])
    zp = int(q.zero_point[0]) if q.zero_point.size else 0
    return scale, zp


def _per_channel_requant_params(t_in, t_w, t_out, out_channels: int):
    """(qmult[C], shift[C]) int32 arrays for s_in*s_w[c]/s_out."""
    s_in, _ = _tensor_qparams(t_in)
    s_out, _ = _tensor_qparams(t_out)
    w_scales = t_w.quant.scale.astype(np.float64)
    if w_scales.size == 1:
        w_scales = np.full(out_channels, w_scales[0])
    qm = np.empty(out_channels, np.int32)
    sh = np.empty(out_channels, np.int32)
    for c in range(out_channels):
        qm[c], sh[c] = _quantize_multiplier(float(s_in) * w_scales[c] / s_out)
    return qm, sh


def _int8_quantize(x: Array, t_out: tfl.TensorDef) -> Array:
    """f32 → int8 (TfLiteRound = half away from zero, then clamp)."""
    scale, zp = _tensor_qparams(t_out)
    v = x.astype(jnp.float32) / scale
    v = jnp.sign(v) * jnp.floor(jnp.abs(v) + 0.5)  # round half away
    return jnp.clip(v + zp, -128, 127).astype(jnp.int8)


def _int8_requantize(x: Array, t_in, t_out) -> Array:
    """int8 → int8 rescale (QUANTIZE op with int8 input)."""
    s_in, zp_in = _tensor_qparams(t_in)
    s_out, zp_out = _tensor_qparams(t_out)
    qm, sh = _quantize_multiplier(s_in / s_out)
    v = _mbqm(x.astype(jnp.int32) - zp_in, qm, sh,
              _INT8_ROUNDING["QUANTIZE"]) + zp_out
    return jnp.clip(v, -128, 127).astype(jnp.int8)


def _int8_dequantize(x: Array, t_in: tfl.TensorDef) -> Array:
    scale, zp = _tensor_qparams(t_in)
    return (x.astype(jnp.float32) - zp) * scale


def _int8_no_fused_activation(op) -> None:
    """The int8 kernels implement activation=NONE only (all the shipped Lyra
    graphs').  A fused RELU* would need the interpreter's quantized clamp
    range; silently dropping it yields wrong audio, so refuse at trace time
    (same convention as the hybrid-quantization guard in get_weight)."""
    act = op.options.get("activation")
    if act is not None:
        raise NotImplementedError(
            f"int8 {op.name} with fused activation {act!r} is not supported")


def _int8_conv_out(acc: Array, bias, t_in, t_w, t_out, kind: str) -> Array:
    """Shared conv epilogue: +bias, per-channel requant, +zp_out, clamp."""
    if bias is not None:
        acc = acc + jnp.asarray(bias, jnp.int32)
    qm, sh = _per_channel_requant_params(t_in, t_w, t_out, acc.shape[-1])
    _, zp_out = _tensor_qparams(t_out)
    rounding = _INT8_ROUNDING.get(kind)
    if rounding is None:  # CONV_2D: ruy microkernel choice by filter depth
        rounding = _conv_rounding(int(t_w.shape[-1]))
    out = _mbqm(acc, qm, sh, rounding) + zp_out
    return jnp.clip(out, -128, 127).astype(jnp.int8)


def _int8_leaky_relu(x: Array, alpha: float, t_in, t_out) -> Array:
    s_in, zp_in = _tensor_qparams(t_in)
    s_out, zp_out = _tensor_qparams(t_out)
    qm_id, sh_id = _quantize_multiplier(s_in / s_out)
    qm_al, sh_al = _quantize_multiplier(s_in * alpha / s_out)
    v = x.astype(jnp.int32) - zp_in
    rounding = _INT8_ROUNDING["LEAKY_RELU"]
    pos = _mbqm(v, qm_id, sh_id, rounding)
    neg = _mbqm(v, qm_al, sh_al, rounding)
    out = jnp.where(v >= 0, pos, neg) + zp_out
    return jnp.clip(out, -128, 127).astype(jnp.int8)


def _int8_add(a: Array, b: Array, t_a, t_b, t_out) -> Array:
    """TFLite quantized ADD: rescale both inputs into a 2^20 headroom domain
    relative to twice the larger input scale, add, requantize."""
    s_a, zp_a = _tensor_qparams(t_a)
    s_b, zp_b = _tensor_qparams(t_b)
    s_out, zp_out = _tensor_qparams(t_out)
    left_shift = 20
    twice_max = 2.0 * max(s_a, s_b)
    qm_a, sh_a = _quantize_multiplier(s_a / twice_max)
    qm_b, sh_b = _quantize_multiplier(s_b / twice_max)
    qm_o, sh_o = _quantize_multiplier(twice_max / ((1 << left_shift) * s_out))
    rounding = _INT8_ROUNDING["ADD"]
    va = (a.astype(jnp.int32) - zp_a) << left_shift
    vb = (b.astype(jnp.int32) - zp_b) << left_shift
    s = _mbqm(va, qm_a, sh_a, rounding) + _mbqm(vb, qm_b, sh_b, rounding)
    out = _mbqm(s, qm_o, sh_o, rounding) + zp_out
    return jnp.clip(out, -128, 127).astype(jnp.int8)


def _strided_slice(x, begin, end, strides, opts, x_shape):
    """TF strided-slice with begin/end/shrink-axis masks (static operands)."""
    begin = [int(v) for v in begin]
    end = [int(v) for v in end]
    strides = [int(v) for v in strides]
    bm, em, sm = opts.get("begin_mask", 0), opts.get("end_mask", 0), opts.get("shrink_axis_mask", 0)
    if opts.get("ellipsis_mask", 0) or opts.get("new_axis_mask", 0):
        raise NotImplementedError("ellipsis/new-axis masks not used by Lyra graphs")
    slices = []
    shrink = []
    for i in range(len(begin)):
        if sm & (1 << i):
            b = begin[i]
            if b < 0:
                b += x_shape[i]
            slices.append(slice(b, b + 1, 1))
            shrink.append(i)
            continue
        b = None if bm & (1 << i) else begin[i]
        e = None if em & (1 << i) else end[i]
        slices.append(slice(b, e, strides[i]))
    out = x[tuple(slices)]
    if shrink:
        out = out.reshape([s for j, s in enumerate(out.shape) if j not in shrink])
    return out


def _grouped_conv(x, w, groups: int, conv):
    """Apply `conv(x_group, w_group, fgc)` with grouped convs lowered as
    per-group dense convs.  XLA's SPMD partitioner cannot batch-partition a
    feature_group_count>1 convolution: under a sharded stream axis it
    all-gathers the batch dim and runs everything downstream replicated
    (verified against the optimized HLO, tests/test_sharding.py).
    Per-group dense convs are mathematically identical (same taps, same
    accumulation order per output channel) and partition row-wise like
    every other conv.  Used by BOTH the float and int8 CONV_2D lowerings so
    sharded int8 engines keep the same property."""
    if 1 < groups < x.shape[-1]:
        xs = jnp.split(x, groups, axis=-1)
        ws = jnp.split(w, groups, axis=0)  # output channels are group-major
        return jnp.concatenate(
            [conv(xg, wg, 1) for xg, wg in zip(xs, ws)], axis=-1)
    return conv(x, w, groups)


def _conv2d(x, w, b, opts, groups_from: Tuple[int, int]):
    in_c, filt_in_c = groups_from
    groups = in_c // filt_in_c

    def conv(xg, wg, fgc):
        return jax.lax.conv_general_dilated(
            xg,
            jnp.transpose(wg, (1, 2, 3, 0)),  # [O,KH,KW,I] -> HWIO
            window_strides=(opts["stride_h"], opts["stride_w"]),
            padding=opts["padding"],
            rhs_dilation=(opts.get("dilation_h", 1), opts.get("dilation_w", 1)),
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
            feature_group_count=fgc,
        )

    out = _grouped_conv(x, w, groups, conv)
    if b is not None:
        out = out + b
    return _ACT_FNS[opts.get("activation")](out)


def _depthwise_conv2d(x, w, b, opts):
    # w: [1, KH, KW, O] with O = C * depth_multiplier -> HWIO [KH, KW, 1, O]
    c = x.shape[-1]
    w = jnp.transpose(w, (1, 2, 0, 3))
    out = jax.lax.conv_general_dilated(
        x,
        w,
        window_strides=(opts["stride_h"], opts["stride_w"]),
        padding=opts["padding"],
        rhs_dilation=(opts.get("dilation_h", 1), opts.get("dilation_w", 1)),
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
        feature_group_count=c,
    )
    if b is not None:
        out = out + b
    return _ACT_FNS[opts.get("activation")](out)


def _transpose_conv(x, w, b, opts, out_shape):
    """TFLite TRANSPOSE_CONV (VALID): fractionally-strided conv.

    Implemented as lhs-dilated conv with the spatially-flipped kernel, which
    XLA lowers onto the MXU directly: out_t = (in_t - 1) * stride + K.
    """
    if opts["padding"] != "VALID":
        raise NotImplementedError("only VALID transpose conv appears in Lyra graphs")
    kh, kw = w.shape[1], w.shape[2]
    w_flip = w[:, ::-1, ::-1, :]  # flip spatial dims of [O,KH,KW,I]
    out = jax.lax.conv_general_dilated(
        x,
        jnp.transpose(w_flip, (1, 2, 3, 0)),  # HWIO, I -> O
        window_strides=(1, 1),
        padding=((kh - 1, kh - 1), (kw - 1, kw - 1)),
        lhs_dilation=(opts["stride_h"], opts["stride_w"]),
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
    )
    if b is not None:
        out = out + b
    return _ACT_FNS[opts.get("activation")](out)


def _int8_conv_acc(x, w, opts, groups_from, t_in):
    """Integer CONV_2D accumulation: (x - zp_in) ⊛ w in int32.

    Out-of-range taps contribute zero in the TFLite integer kernel, which is
    exactly zero-padding of the already zp-subtracted input (all Lyra convs
    are VALID anyway)."""
    _, zp_in = _tensor_qparams(t_in)
    in_c, filt_in_c = groups_from
    x32 = x.astype(jnp.int32) - zp_in

    def conv(xg, wg, fgc):
        return jax.lax.conv_general_dilated(
            xg,
            jnp.transpose(jnp.asarray(wg, jnp.int32), (1, 2, 3, 0)),
            window_strides=(opts["stride_h"], opts["stride_w"]),
            padding=opts["padding"],
            rhs_dilation=(opts.get("dilation_h", 1), opts.get("dilation_w", 1)),
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
            feature_group_count=fgc,
            preferred_element_type=jnp.int32,
        )

    return _grouped_conv(x32, jnp.asarray(w), in_c // filt_in_c, conv)


def _int8_depthwise_acc(x, w, opts, t_in):
    _, zp_in = _tensor_qparams(t_in)
    c = x.shape[-1]
    x32 = x.astype(jnp.int32) - zp_in
    return jax.lax.conv_general_dilated(
        x32,
        jnp.transpose(jnp.asarray(w, jnp.int32), (1, 2, 0, 3)),
        window_strides=(opts["stride_h"], opts["stride_w"]),
        padding=opts["padding"],
        rhs_dilation=(opts.get("dilation_h", 1), opts.get("dilation_w", 1)),
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
        feature_group_count=c,
        preferred_element_type=jnp.int32,
    )


def _int8_transpose_conv_acc(x, w, opts, t_in):
    _, zp_in = _tensor_qparams(t_in)
    kh, kw = w.shape[1], w.shape[2]
    x32 = x.astype(jnp.int32) - zp_in
    w_flip = np.asarray(w)[:, ::-1, ::-1, :]
    return jax.lax.conv_general_dilated(
        x32,
        jnp.transpose(jnp.asarray(w_flip, jnp.int32), (1, 2, 3, 0)),
        window_strides=(1, 1),
        padding=((kh - 1, kh - 1), (kw - 1, kw - 1)),
        lhs_dilation=(opts["stride_h"], opts["stride_w"]),
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
        preferred_element_type=jnp.int32,
    )


# Layer-boundary fp8 storage (GraphLowering boundary_store="f8"): float
# intermediates below this element count stay in the compute dtype — the
# convert pair would cost more than the bytes it saves.
_BOUNDARY_MIN_ELEMS = 1024


class _BoundaryEnv(dict):
    """Tensor environment that stores large float intermediates as fp8.

    The serving tick is HBM-bound on layer-boundary activation traffic
    (PERF.md stage_roofline: conv stacks at 85-100% of the byte bound), so
    halving the materialized boundary bytes looked like the one lever
    left under the XLA layer-materialization floor.  Unlike the rejected
    dynamic-scale int8 variants (extra amax pass) and the rejected
    exact-int8 mode (int32 requant pipelines), an fp8 convert is a pure
    elementwise dtype cast — IF the compiler fuses it into the producing
    and consuming fusions.  **Measured on TPU: it does not** — conv
    operands still materialize the dequantized bf16 copy, so each
    boundary costs fp8(w+r) ON TOP of bf16(w+r): 13.0 → 18.6 HLO GB/tick,
    8.30 → 13.83 ms/tick at the 2x8192 wave schedule (PERF.md round 4,
    benchmarks/boundary_store_bench.py — kept as the reproducer; do not
    re-probe).  e4m3 max is 448; the global power-of-two `scale` (exact
    in both directions) folds graphs whose activations exceed it
    (benchmarks/boundary_range_probe.py measured amax: soundstream 628 →
    scale 0.5, lyragan 31 → scale 1.0).
    """

    def __init__(self, wrap: frozenset, scale: float):
        super().__init__()
        self._wrap = wrap
        self._scale = scale

    def __setitem__(self, i, v):
        if i in self._wrap:
            v = jnp.asarray(v)
            if (jnp.issubdtype(v.dtype, jnp.floating)
                    and v.dtype != jnp.float8_e4m3fn):
                if self._scale != 1.0:
                    v = v * jnp.asarray(self._scale, v.dtype)
                v = v.astype(jnp.float8_e4m3fn)
        super().__setitem__(i, v)


@dataclasses.dataclass
class GraphFn:
    """A lowered TFLite subgraph: pure function + initial streaming state."""

    subgraph_name: str
    input_names: List[str]
    output_names: List[str]
    _fn: Callable
    _init_state: Dict[str, np.ndarray]

    def init_state(self) -> Dict[str, jnp.ndarray]:
        return {k: jnp.asarray(v) for k, v in self._init_state.items()}

    @property
    def stateful(self) -> bool:
        return bool(self._init_state)

    def __call__(self, state: Dict[str, Array], **inputs) -> Tuple[Dict[str, Array], Dict[str, Array]]:
        return self._fn(state, inputs)


class GraphLowering:
    """Lowers one subgraph of a ModelDef into a GraphFn."""

    def __init__(self, mdef: tfl.ModelDef, signature: str, mode: str = "float",
                 compute_dtype=jnp.float32, boundary_store: str | None = None,
                 boundary_scale: float = 1.0):
        if mode == "bf16":
            # Shorthand: float dequantization with bfloat16 compute — the TPU
            # throughput mode (MXU bf16 passes, half the HBM traffic for
            # activations/state).  Weights came from an int8-quantized model,
            # so bf16's 8-bit mantissa costs little fidelity (validated by
            # the LSD oracle in tests/test_integration.py).
            mode = "float"
            compute_dtype = jnp.bfloat16
        if mode not in ("float", "fakequant", "int8"):
            raise ValueError(f"unknown mode {mode}")
        if mode == "int8" and compute_dtype != jnp.float32:
            raise ValueError("int8 mode requires float32 for the float ops")
        if boundary_store not in (None, "f8"):
            raise ValueError(
                f"unsupported boundary_store {boundary_store!r} "
                "(None or 'f8')")
        if boundary_store is not None and mode != "float":
            # fakequant/int8 already define their own boundary storage;
            # stacking fp8 on top would silently change their oracles.
            raise ValueError("boundary_store requires mode 'float'/'bf16'")
        if boundary_scale <= 0 or (boundary_scale != 1.0 and
                                   np.log2(boundary_scale) % 1 != 0):
            raise ValueError(
                f"boundary_scale must be a positive power of two (exact in "
                f"both directions), got {boundary_scale}")
        self.boundary_store = boundary_store
        self.boundary_scale = float(boundary_scale)
        self.mdef = mdef
        self.mode = mode
        self.compute_dtype = compute_dtype
        sig = mdef.signatures[signature]
        self.sg = mdef.subgraphs[sig["subgraph"]]
        self.sig_inputs: Dict[str, int] = dict(sig["inputs"])
        self.sig_outputs: Dict[str, int] = dict(sig["outputs"])
        # Pre-dequantized constants (float mode folds int8 weights to f32).
        # int8 mode keeps constants raw: the graph's own DEQUANTIZE ops mark
        # where float ops consume them, and the quantized islands want the
        # integer values.
        self.consts: Dict[int, np.ndarray] = {}
        for t in self.sg.tensors:
            if t.data is not None:
                if mode != "int8" and (t.dtype in (np.int8, np.uint8) or (
                    t.dtype == np.int32 and t.quant is not None and t.quant.scale.size
                )):
                    self.consts[t.index] = _dequantize_const(t)
                else:
                    self.consts[t.index] = t.data
        if self.compute_dtype != jnp.float32:
            cd = np.dtype(self.compute_dtype)
            self.consts = {
                i: (c.astype(cd) if isinstance(c, np.ndarray)
                    and c.dtype.kind == "f" else c)
                for i, c in self.consts.items()
            }
        self.init_state_vals = self._run_init_subgraphs()
        if self.compute_dtype != jnp.float32:
            cd = np.dtype(self.compute_dtype)
            self.init_state_vals = {
                k: (v.astype(cd) if v.dtype.kind == "f" else v)
                for k, v in self.init_state_vals.items()
            }

    # -- init: interpret CALL_ONCE subgraphs (VAR_HANDLE/ASSIGN of constants) --
    def _run_init_subgraphs(self) -> Dict[str, np.ndarray]:
        state: Dict[str, np.ndarray] = {}
        for op in self.sg.ops:
            if op.name != "CALL_ONCE":
                continue
            init_sg = self.mdef.subgraphs[op.options["init_subgraph_index"]]
            handles: Dict[int, str] = {}
            for iop in init_sg.ops:
                if iop.name == "VAR_HANDLE":
                    handles[iop.outputs[0]] = iop.options["shared_name"]
                elif iop.name == "ASSIGN_VARIABLE":
                    name = handles[iop.inputs[0]]
                    val = init_sg.tensors[iop.inputs[1]].data
                    if val is None:
                        raise ValueError(f"non-constant init for variable {name}")
                    state[name] = np.array(val)
                else:
                    raise NotImplementedError(f"init subgraph op {iop.name}")
        return state

    def lower(self, capture_env: bool = False) -> GraphFn:
        """capture_env=True makes the lowered fn also return the full
        tensor-index → value environment (parity debugging against
        `tf.lite.Interpreter(experimental_preserve_all_tensors=True)`)."""
        sg, consts, mode = self.sg, self.consts, self.mode
        compute_dtype = self.compute_dtype
        tensors_meta = sg.tensors
        sig_inputs, sig_outputs = self.sig_inputs, self.sig_outputs
        init_state = self.init_state_vals
        # boundary_store="f8": every large float intermediate materializes
        # as fp8 e4m3 (see _BoundaryEnv); graph inputs/outputs keep their
        # contract dtypes, and VAR_HANDLE state stays in compute_dtype
        # (ASSIGN reads back through get(), which dequantizes).
        boundary_wrap = frozenset(
            t.index for t in tensors_meta
            if self.boundary_store == "f8"
            and t.data is None and t.dtype == np.float32
            and int(np.prod(t.shape or (0,))) >= _BOUNDARY_MIN_ELEMS
            and t.index not in set(sig_outputs.values())
            and t.index not in set(sig_inputs.values()))
        boundary_inv = 1.0 / self.boundary_scale
        boundary_scale = self.boundary_scale

        def fn(state: Dict[str, Array], inputs: Dict[str, Array]):
            env: Dict[int, Array] = (
                _BoundaryEnv(boundary_wrap, boundary_scale)
                if boundary_wrap else {})
            var_names: Dict[int, str] = {}  # handle tensor idx -> variable name
            new_state = dict(state)

            def get(i: int) -> Array:
                if i < 0:
                    return None
                if i in env:
                    v = env[i]
                    if (boundary_wrap
                            and getattr(v, "dtype", None) == jnp.float8_e4m3fn):
                        v = v.astype(compute_dtype)
                        if boundary_inv != 1.0:
                            v = v * jnp.asarray(boundary_inv, compute_dtype)
                    return v
                if i in consts:
                    return consts[i]
                raise KeyError(
                    f"tensor {i} ({tensors_meta[i].name}) used before defined"
                )

            def static(i: int) -> np.ndarray:
                v = get(i)
                if isinstance(v, np.ndarray):
                    return v
                raise ValueError(
                    f"tensor {i} ({tensors_meta[i].name}) must be a static constant"
                )

            def get_weight(i: int) -> Array:
                """Operand for a *float* kernel. int8 mode keeps quantized
                constants raw (integer values), relying on the graph's own
                DEQUANTIZE ops to mark float consumers; a float op reading
                one directly (hybrid/dynamic-range quantization) would
                silently compute on raw ints scaled ~100x off — refuse at
                trace time instead."""
                if i < 0:
                    return None
                t = tensors_meta[i]
                if (mode == "int8" and i in consts and t.quant is not None
                        and t.quant.scale.size
                        and t.dtype in (np.int8, np.uint8, np.int32)):
                    raise NotImplementedError(
                        f"float op consumes raw quantized constant "
                        f"{t.name} in int8 mode (hybrid quantization is "
                        f"not supported)")
                return get(i)

            for name, idx in sig_inputs.items():
                x = inputs[name]
                if compute_dtype != jnp.float32 and jnp.issubdtype(
                        jnp.asarray(x).dtype, jnp.floating):
                    x = jnp.asarray(x).astype(compute_dtype)
                env[idx] = x

            for op in sg.ops:
                nm = op.name
                o0 = op.outputs[0] if op.outputs else -1
                if nm == "CALL_ONCE":
                    continue
                elif nm == "VAR_HANDLE":
                    var_names[o0] = op.options["shared_name"]
                elif nm == "READ_VARIABLE":
                    env[o0] = new_state[var_names[op.inputs[0]]]
                elif nm == "ASSIGN_VARIABLE":
                    new_state[var_names[op.inputs[0]]] = get(op.inputs[1])
                elif nm == "RESHAPE":
                    # `or` would misread a legitimate empty new_shape
                    # ([] = reshape to scalar) as absent.
                    shape = op.options.get("new_shape")
                    if shape is None:
                        shape = [int(v) for v in static(op.inputs[1])]
                    env[o0] = jnp.reshape(get(op.inputs[0]), shape)
                elif nm == "CONCATENATION":
                    if mode == "int8" and tensors_meta[o0].dtype == np.int8:
                        # The interpreter requantizes concat inputs whose
                        # qparams differ from the output's; we implement the
                        # (Lyra-graph) equal-qparams case only — refuse the
                        # rest rather than concatenate silently wrong bytes.
                        qp = [_tensor_qparams(tensors_meta[i])
                              for i in (*op.inputs, o0)]
                        if any(q != qp[0] for q in qp[1:]):
                            raise NotImplementedError(
                                "int8 CONCATENATION with differing "
                                "quantization params is not supported")
                    parts = [get(i) for i in op.inputs]
                    out = jnp.concatenate(parts, axis=op.options["axis"])
                    env[o0] = _ACT_FNS[op.options.get("activation")](out)
                elif nm == "STRIDED_SLICE":
                    x = get(op.inputs[0])
                    env[o0] = _strided_slice(
                        x, static(op.inputs[1]), static(op.inputs[2]),
                        static(op.inputs[3]), op.options, x.shape,
                    )
                elif nm == "CONV_2D":
                    x = get(op.inputs[0])
                    if mode == "int8" and tensors_meta[o0].dtype == np.int8:
                        _int8_no_fused_activation(op)
                        w = get(op.inputs[1])
                        b = get(op.inputs[2]) if len(op.inputs) > 2 else None
                        acc = _int8_conv_acc(
                            x, w, op.options, (x.shape[-1], w.shape[-1]),
                            tensors_meta[op.inputs[0]])
                        env[o0] = _int8_conv_out(
                            acc, b, tensors_meta[op.inputs[0]],
                            tensors_meta[op.inputs[1]], tensors_meta[o0],
                            "CONV_2D")
                        continue
                    w = get_weight(op.inputs[1])
                    b = get_weight(op.inputs[2]) if len(op.inputs) > 2 else None
                    out = _conv2d(x, w, b, op.options, (x.shape[-1], w.shape[-1]))
                    if mode == "fakequant":
                        out = _fq(out, tensors_meta[o0])
                    env[o0] = out
                elif nm == "DEPTHWISE_CONV_2D":
                    x = get(op.inputs[0])
                    if mode == "int8" and tensors_meta[o0].dtype == np.int8:
                        _int8_no_fused_activation(op)
                        acc = _int8_depthwise_acc(
                            x, get(op.inputs[1]), op.options,
                            tensors_meta[op.inputs[0]])
                        b = get(op.inputs[2]) if len(op.inputs) > 2 else None
                        env[o0] = _int8_conv_out(
                            acc, b, tensors_meta[op.inputs[0]],
                            tensors_meta[op.inputs[1]], tensors_meta[o0],
                            "DEPTHWISE_CONV_2D")
                        continue
                    out = _depthwise_conv2d(
                        x, get_weight(op.inputs[1]),
                        get_weight(op.inputs[2]) if len(op.inputs) > 2 else None,
                        op.options,
                    )
                    if mode == "fakequant":
                        out = _fq(out, tensors_meta[o0])
                    env[o0] = out
                elif nm == "TRANSPOSE_CONV":
                    out_shape = [int(v) for v in static(op.inputs[0])]
                    x = get(op.inputs[2])
                    if mode == "int8" and tensors_meta[o0].dtype == np.int8:
                        _int8_no_fused_activation(op)
                        w = get(op.inputs[1])
                        b = get(op.inputs[3]) if len(op.inputs) > 3 else None
                        acc = _int8_transpose_conv_acc(
                            x, w, op.options, tensors_meta[op.inputs[2]])
                        if list(acc.shape) != out_shape:
                            # The int8 lowering implements the full-
                            # correlation (VALID) output the Lyra graphs
                            # declare; anything else would silently
                            # misalign, so refuse at trace time.
                            raise NotImplementedError(
                                f"int8 TRANSPOSE_CONV output {acc.shape} != "
                                f"declared {out_shape} (unsupported padding)")
                        env[o0] = _int8_conv_out(
                            acc, b, tensors_meta[op.inputs[2]],
                            tensors_meta[op.inputs[1]], tensors_meta[o0],
                            "TRANSPOSE_CONV")
                        continue
                    w = get_weight(op.inputs[1])
                    b = get_weight(op.inputs[3]) if len(op.inputs) > 3 else None
                    out = _transpose_conv(x, w, b, op.options, out_shape)
                    if mode == "fakequant":
                        out = _fq(out, tensors_meta[o0])
                    env[o0] = out
                elif nm == "LEAKY_RELU":
                    x = get(op.inputs[0])
                    if mode == "int8" and tensors_meta[o0].dtype == np.int8:
                        env[o0] = _int8_leaky_relu(
                            x, op.options["alpha"],
                            tensors_meta[op.inputs[0]], tensors_meta[o0])
                        continue
                    out = jnp.where(x >= 0, x, x * op.options["alpha"])
                    if mode == "fakequant":
                        out = _fq(out, tensors_meta[o0])
                    env[o0] = out
                elif nm in ("ADD", "SUB", "MUL", "DIV"):
                    a, b = get(op.inputs[0]), get(op.inputs[1])
                    if (mode == "int8" and nm != "ADD"
                            and tensors_meta[o0].dtype == np.int8):
                        # Raw integer a-b / a*b would ignore scales and
                        # zero-points — refuse at trace time (only the ADD
                        # kernel's requantization is implemented; the Lyra
                        # graphs use nothing else in their int8 islands).
                        raise NotImplementedError(
                            f"int8 {nm} is not supported")
                    if (mode == "int8" and nm == "ADD"
                            and tensors_meta[o0].dtype == np.int8):
                        _int8_no_fused_activation(op)
                        env[o0] = _int8_add(
                            a, b, tensors_meta[op.inputs[0]],
                            tensors_meta[op.inputs[1]], tensors_meta[o0])
                        continue
                    out = {
                        "ADD": lambda: a + b,
                        "SUB": lambda: a - b,
                        "MUL": lambda: a * b,
                        "DIV": lambda: a / b,
                    }[nm]()
                    out = _ACT_FNS[op.options.get("activation")](out)
                    if mode == "fakequant" and tensors_meta[o0].dtype == np.int8:
                        out = _fq(out, tensors_meta[o0])
                    env[o0] = out
                elif nm == "SPLIT":
                    axis = int(static(op.inputs[0]))
                    parts = jnp.split(get(op.inputs[1]), op.options["num_splits"], axis=axis)
                    for out_idx, part in zip(op.outputs, parts):
                        env[out_idx] = part
                elif nm == "QUANTIZE":
                    x = get(op.inputs[0])
                    if mode == "int8":
                        t_in = tensors_meta[op.inputs[0]]
                        if t_in.dtype == np.int8:
                            env[o0] = _int8_requantize(x, t_in, tensors_meta[o0])
                        else:
                            env[o0] = _int8_quantize(x, tensors_meta[o0])
                    else:
                        env[o0] = _fq(x, tensors_meta[o0]) if mode == "fakequant" else x
                elif nm == "DEQUANTIZE":
                    if mode == "int8":
                        t_in = tensors_meta[op.inputs[0]]
                        if op.inputs[0] in consts:
                            # Constant weights: per-channel dequantization.
                            env[o0] = _dequantize_const(t_in)
                        else:
                            env[o0] = _int8_dequantize(
                                get(op.inputs[0]), t_in)
                    else:
                        env[o0] = get(op.inputs[0])
                elif nm == "GATHER":
                    if op.options.get("batch_dims", 0):
                        raise NotImplementedError(
                            "GATHER with batch_dims > 0 is not supported")
                    env[o0] = jnp.take(
                        get(op.inputs[0]), get(op.inputs[1]),
                        axis=op.options.get("axis", 0),
                    )
                elif nm == "NOT_EQUAL":
                    env[o0] = get(op.inputs[0]) != get(op.inputs[1])
                elif nm == "EQUAL":
                    env[o0] = get(op.inputs[0]) == get(op.inputs[1])
                elif nm == "LESS":
                    env[o0] = get(op.inputs[0]) < get(op.inputs[1])
                elif nm == "MAXIMUM":
                    env[o0] = jnp.maximum(get(op.inputs[0]), get(op.inputs[1]))
                elif nm == "MINIMUM":
                    env[o0] = jnp.minimum(get(op.inputs[0]), get(op.inputs[1]))
                elif nm == "CAST":
                    env[o0] = jnp.asarray(get(op.inputs[0])).astype(
                        _np_dtype(tensors_meta[o0])
                    )
                elif nm == "SUM":
                    axes = tuple(int(v) for v in np.atleast_1d(static(op.inputs[1])))
                    env[o0] = jnp.sum(
                        get(op.inputs[0]), axis=axes,
                        keepdims=op.options.get("keep_dims", False),
                    )
                elif nm == "SQUARED_DIFFERENCE":
                    d = get(op.inputs[0]) - get(op.inputs[1])
                    env[o0] = d * d
                elif nm in ("ARG_MIN", "ARG_MAX"):
                    axis = int(static(op.inputs[1]))
                    f = jnp.argmin if nm == "ARG_MIN" else jnp.argmax
                    env[o0] = f(get(op.inputs[0]), axis=axis).astype(
                        _np_dtype(tensors_meta[o0])
                    )
                elif nm == "ONE_HOT":
                    depth = int(static(op.inputs[1]))
                    on_v = get(op.inputs[2])
                    off_v = get(op.inputs[3])
                    idx = get(op.inputs[0])
                    axis = op.options.get("axis", -1)
                    oh = jax.nn.one_hot(idx, depth, axis=axis, dtype=jnp.float32)
                    out = oh * on_v + (1.0 - oh) * off_v
                    env[o0] = out.astype(_np_dtype(tensors_meta[o0]))
                elif nm == "PACK":
                    env[o0] = jnp.stack(
                        [get(i) for i in op.inputs], axis=op.options.get("axis", 0)
                    )
                else:
                    raise NotImplementedError(f"TFLite op {nm} not supported")

            def to_f32(v):
                v = jnp.asarray(v)
                if compute_dtype != jnp.float32 and jnp.issubdtype(
                        v.dtype, jnp.floating):
                    return v.astype(jnp.float32)
                return v

            outputs = {name: to_f32(get(idx)) for name, idx in sig_outputs.items()}
            if capture_env:
                return outputs, new_state, env
            return outputs, new_state

        return GraphFn(
            subgraph_name=self.sg.name,
            input_names=list(sig_inputs),
            output_names=list(sig_outputs),
            _fn=fn,
            _init_state=init_state,
        )


def load_graph(path: str, signature: str = "serving_default",
               mode: str = "float", boundary_store: str | None = None,
               boundary_scale: float = 1.0) -> GraphFn:
    """Parse `path` and lower `signature` to a pure JAX function.

    boundary_store="f8" stores large layer-boundary activations as fp8
    e4m3 (half the bf16 HBM traffic on the materialization-bound conv
    stacks; see _BoundaryEnv).  boundary_scale is a power-of-two global
    pre-scale for graphs whose activation range exceeds e4m3's 448
    (benchmarks/boundary_range_probe.py measures it per graph)."""
    mdef = tfl.load(path)
    return GraphLowering(mdef, signature, mode=mode,
                         boundary_store=boundary_store,
                         boundary_scale=boundary_scale).lower()
