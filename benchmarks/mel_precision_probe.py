"""A/B probe: noise-estimator DFT precision HIGH (3-pass) vs DEFAULT (1-pass).

The decoder-side noise estimator extracts log-mel features of the GAN
output every tick (CNG synthesis is lax.cond-gated, but the estimate must
track continuously — reference: lyra/lyra_decoder.cc:306-311), so its DFT
matmuls are on the steady-state critical path.  HIGH precision is needed
where features feed the wire (encoder DTX parity); the decoder-side
estimate only conditions comfort noise, where ~4e-3 relative error is
inaudible — candidate for 1-pass bf16.  Measured result (v5e via axon):
**no win** — 10.13 (HIGH) vs 10.31 (DEFAULT) ms/step at B=16384: the mel
DFTs are HBM-bound on their operands, not MXU-pass-bound.  HIGH stays the
default; kept as the reproducer for PERF.md "Probed and rejected".

Usage: python benchmarks/mel_precision_probe.py [B]
"""

import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))
sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from _ab_harness import ab_probe  # noqa: E402


def _with_mel_precision(prec):
    def mutate(enc, dec):
        from lyra_tpu.codec.noise_estimator import NoiseEstimator

        dec.noise = NoiseEstimator(16000, mel_precision=prec)

    return mutate


def main():
    import jax

    B = int(sys.argv[1]) if len(sys.argv) > 1 else 16384
    ab_probe([
        ("mel_precision=HIGH", {},
         _with_mel_precision(jax.lax.Precision.HIGH)),
        ("mel_precision=DEFAULT", {},
         _with_mel_precision(jax.lax.Precision.DEFAULT)),
    ], B=B)


if __name__ == "__main__":
    main()
