"""Log-mel extractor micro-benchmark.

Analog of the reference's google-benchmark for the feature extractor
(reference: lyra/log_mel_spectrogram_extractor_impl_benchmark.cc:27-71,
which sweeps hop sizes); on TPU the relevant axis is the stream batch, so
this sweeps hop sizes AND batch sizes of the jitted batched extractor.

Usage: python -m lyra_tpu.tools.melspec_benchmark [--iters=200]
"""

from __future__ import annotations

import argparse
import sys
import time

import numpy as np

from lyra_tpu import config


def main(argv=None) -> int:
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--iters", type=int, default=200)
    p.add_argument("--sample_rate_hz", type=int, default=16000)
    args = p.parse_args(argv)

    import jax
    import jax.numpy as jnp

    from lyra_tpu.dsp import melspec

    rng = np.random.RandomState(0)
    for hop in (160, 320, 640):
        for batch in (1, 256, 4096):
            cfg = melspec.MelConfig(
                args.sample_rate_hz, hop, 2 * hop, config.NUM_MEL_BINS)
            ex = melspec.LogMelExtractor(cfg)
            extract = jax.jit(ex.extract)
            state = ex.init_state(batch)
            frames = jnp.asarray(
                rng.uniform(-32768, 32767, (batch, hop)), jnp.float32)
            feats, state = extract(state, frames)  # compile
            jax.block_until_ready(feats)
            t0 = time.perf_counter()
            for _ in range(args.iters):
                feats, state = extract(state, frames)
            jax.block_until_ready(feats)
            dt = (time.perf_counter() - t0) / args.iters
            print(f"hop={hop:5d} batch={batch:5d}: {dt*1e6:10.1f} us/step  "
                  f"({batch/dt:12.0f} frames/s)")
    return 0


if __name__ == "__main__":
    sys.exit(main())
