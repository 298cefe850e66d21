"""Probe: dynamic range of layer-boundary activations in both codec nets.

Decides whether fp8(e4m3, max 448) can STORE the materialized layer
boundaries without per-tensor scaling (the int8-boundary idea from
VERDICT r3 item 5, done the scale-free way: a pure dtype convert fuses
into producer/consumer fusions, unlike the rejected dynamic-scale
variants that added an amax reduction pass).

Runs the float32 lowering with capture_env over real speech and reports,
for every float intermediate >= 2 KB/stream, its running amax across all
frames.  Run from the repo root (CPU):

    LYRA_TPU_PLATFORM=cpu python benchmarks/boundary_range_probe.py
"""

import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax.numpy as jnp
import numpy as np

from lyra_tpu import config
from lyra_tpu.tflite import model as tfl
from lyra_tpu.tflite.executor import GraphLowering
from lyra_tpu.utils import wav

MIN_ELEMS = 1024  # per-stream elements; below this a boundary is noise


def run_graph(path, input_name, feeds):
    mdef = tfl.load(path)
    low = GraphLowering(mdef, "serving_default", mode="float")
    gf = low.lower(capture_env=True)
    state = {k: jnp.asarray(v) for k, v in gf._init_state.items()}
    amax, nelem = {}, {}
    outs = []
    for x in feeds:
        outputs, state, env = gf._fn(state, {input_name: jnp.asarray(x)})
        outs.append(np.asarray(next(iter(outputs.values()))))
        for i, v in env.items():
            v = np.asarray(v)
            if v.dtype.kind != "f" or v.size < MIN_ELEMS:
                continue
            amax[i] = max(amax.get(i, 0.0), float(np.abs(v).max()))
            nelem[i] = v.size
    meta = low.sg.tensors
    rows = [(i, meta[i].name, nelem[i], amax[i]) for i in sorted(amax)]
    return rows, outs


def report(tag, rows):
    total = sum(n for (_, _, n, _) in rows)
    over_448 = [(i, nm, n, a) for (i, nm, n, a) in rows if a > 448.0]
    over_240 = sum(1 for (*_, a) in rows if a > 240.0)
    print(f"\n== {tag}: {len(rows)} boundary tensors, "
          f"{total} elems/stream ({total * 2 / 1024:.0f} KB bf16, "
          f"{total / 1024:.0f} KB fp8)")
    worst = sorted(rows, key=lambda r: -r[3])[:12]
    for i, nm, n, a in worst:
        print(f"  t{i:<4} {nm[-60:]:<60} {n:>8} elems  amax {a:10.2f}")
    print(f"  amax > 448 (fp8 e4m3 clips): {len(over_448)} tensors; "
          f"> 240: {over_240}")


def main():
    data = wav.read_wav_int16(
        "/root/reference/lyra/testdata/sample1_16kHz.wav")
    frames = (data.samples[: 50 * 320].reshape(-1, 320)
              .astype(np.float32) / 32768.0)

    enc_rows, feats = run_graph(
        os.path.join(config.DEFAULT_MODEL_PATH, "soundstream_encoder.tflite"),
        "input_audio", [f[None, :] for f in frames])
    report("soundstream_encoder", enc_rows)

    gan_rows, _ = run_graph(
        os.path.join(config.DEFAULT_MODEL_PATH, "lyragan.tflite"),
        "input_audio",
        [np.asarray(f).reshape(1, 1, 64) for f in feats])
    report("lyragan", gan_rows)


if __name__ == "__main__":
    main()
