"""Probe which requantization rounding each TFLite kernel actually uses.

The interpreter mixes MultiplyByQuantizedMultiplier implementations per
kernel (the ruy-backed CONV_2D still uses the legacy gemmlowp double
rounding; most other int8 kernels use TFLITE_SINGLE_ROUNDING).  This tool
feeds every int8 op in the shipped Lyra graphs its *exact* interpreter
input tensors (experimental_preserve_all_tensors) and counts, per op kind,
how many elements each rounding variant mismatches.  The winners are
recorded in `lyra_tpu.tflite.executor._INT8_ROUNDING`.

Usage: python -m lyra_tpu.tools.probe_int8_rounding [model_coeffs_dir]
"""

from __future__ import annotations

import sys
from collections import defaultdict

import numpy as np

from lyra_tpu import config


def probe(model_dir: str = config.DEFAULT_MODEL_PATH, frames: int = 8):
    import jax
    import jax.numpy as jnp
    import tensorflow as tf

    from lyra_tpu.tflite import executor, model as tfl

    totals = defaultdict(lambda: defaultdict(int))

    # The probe mutates the module-global rounding table; restore the real
    # defaults however the probe exits, so a mid-probe failure can't leave
    # arbitrary probe values corrupting later int8 graph loads.
    saved_rounding = dict(executor._INT8_ROUNDING)
    try:
        return _probe(model_dir, frames, totals, executor, tfl, tf, jnp, np)
    finally:
        executor._INT8_ROUNDING.clear()
        executor._INT8_ROUNDING.update(saved_rounding)


def _probe(model_dir, frames, totals, executor, tfl, tf, jnp, np):
    for model, sig, make_input in (
        ("soundstream_encoder", "serving_default",
         lambda r: {"input_audio": r.uniform(-0.5, 0.5, (1, 320)).astype(np.float32)}),
        ("lyragan", "serving_default",
         lambda r: {"input_audio": r.normal(0, 5, (1, 1, 64)).astype(np.float32)}),
    ):
        path = f"{model_dir}/{model}.tflite"
        ip = tf.lite.Interpreter(
            model_path=path,
            experimental_op_resolver_type=tf.lite.experimental.OpResolverType
            .BUILTIN_WITHOUT_DEFAULT_DELEGATES,
            experimental_preserve_all_tensors=True)
        runner = ip.get_signature_runner(sig)
        sg = tfl.load(path).subgraphs[0]
        rng = np.random.default_rng(0)
        for _ in range(frames):
            runner(**make_input(rng))
            probe_ops = ("CONV_2D", "DEPTHWISE_CONV_2D", "TRANSPOSE_CONV",
                         "LEAKY_RELU", "ADD", "QUANTIZE")
            for op in sg.ops:
                if not op.outputs:
                    continue
                o0 = op.outputs[0]
                t_out = sg.tensors[o0]
                if t_out.dtype != np.int8 or op.name not in probe_ops:
                    continue
                try:
                    ref = ip.get_tensor(o0)
                except Exception:
                    continue
                # CONV_2D's rounding is chosen per instance by filter depth
                # (executor._conv_rounding): bucket its results by input
                # channels so the table validates that threshold directly.
                key = op.name
                if op.name == "CONV_2D":
                    cin = int(sg.tensors[op.inputs[1]].shape[-1])
                    key = f"CONV_2D:cin={cin}"
                for rounding in ("single", "double", "ruy"):
                    executor._INT8_ROUNDING[op.name] = rounding
                    got = _run_op(executor, sg, op, ip, jnp)
                    if got is None:
                        continue
                    totals[key][rounding] += int(
                        (np.asarray(got) != ref).sum())

    print(f"{'op kind':20s} {'single':>10s} {'double':>10s} {'ruy':>10s}   winner")
    for kind, counts in sorted(totals.items()):
        if not counts:  # every attempt for this kind failed to run
            print(f"{kind:20s} {'(no runs)':>34s}")
            continue
        winner = min(counts, key=counts.get)
        print(f"{kind:20s} {counts.get('single', -1):10d} "
              f"{counts.get('double', -1):10d} {counts.get('ruy', -1):10d}"
              f"   {winner}")
    return totals


def _run_op(executor, sg, op, ip, jnp):
    """Run one int8 op through our kernels with the interpreter's inputs."""
    t_out = sg.tensors[op.outputs[0]]
    nm = op.name
    try:
        if nm in ("CONV_2D", "DEPTHWISE_CONV_2D"):
            x = ip.get_tensor(op.inputs[0])
            w = sg.tensors[op.inputs[1]].data
            b = sg.tensors[op.inputs[2]].data if len(op.inputs) > 2 else None
            t_in, t_w = sg.tensors[op.inputs[0]], sg.tensors[op.inputs[1]]
            if nm == "CONV_2D":
                acc = executor._int8_conv_acc(
                    jnp.asarray(x), w, op.options, (x.shape[-1], w.shape[-1]), t_in)
            else:
                acc = executor._int8_depthwise_acc(jnp.asarray(x), w, op.options, t_in)
            return executor._int8_conv_out(acc, b, t_in, t_w, t_out, nm)
        if nm == "TRANSPOSE_CONV":
            x = ip.get_tensor(op.inputs[2])
            w = sg.tensors[op.inputs[1]].data
            b = sg.tensors[op.inputs[3]].data if len(op.inputs) > 3 else None
            t_in, t_w = sg.tensors[op.inputs[2]], sg.tensors[op.inputs[1]]
            acc = executor._int8_transpose_conv_acc(jnp.asarray(x), w, op.options, t_in)
            return executor._int8_conv_out(acc, b, t_in, t_w, t_out, nm)
        if nm == "LEAKY_RELU":
            x = ip.get_tensor(op.inputs[0])
            return executor._int8_leaky_relu(
                jnp.asarray(x), op.options["alpha"],
                sg.tensors[op.inputs[0]], t_out)
        if nm == "ADD":
            a, b = ip.get_tensor(op.inputs[0]), ip.get_tensor(op.inputs[1])
            return executor._int8_add(
                jnp.asarray(a), jnp.asarray(b),
                sg.tensors[op.inputs[0]], sg.tensors[op.inputs[1]], t_out)
        if nm == "QUANTIZE":
            t_in = sg.tensors[op.inputs[0]]
            x = ip.get_tensor(op.inputs[0])
            if t_in.dtype == np.int8:
                return executor._int8_requantize(jnp.asarray(x), t_in, t_out)
            return executor._int8_quantize(jnp.asarray(x), t_out)
    except (ValueError, KeyError):
        return None
    return None


if __name__ == "__main__":
    probe(*(sys.argv[1:2] or [config.DEFAULT_MODEL_PATH]))
