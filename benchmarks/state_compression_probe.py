"""A/B probe: int8 streaming-state storage vs bf16 state.

Hypothesis: the lockstep tick is HBM-state-traffic bound (PERF.md: GAN
12,912 + SoundStream ~13k floats/stream round-tripped every 20 ms), so
storing conv contexts as int8 + per-stream scale should halve that
traffic.  Measured result (v5e via axon, B=16384 bf16): **regression** —

    state_compression=None : 9.90 ms/step (33,101 streams)
    state_compression=int8 : 12.07 ms/step (27,154 streams)

XLA materializes convolution operands, so the dequantized bf16 state is
written+read from HBM in addition to the int8 copy; the amax reduction
adds another pass.  Kept as the reproducer for PERF.md "Probed and
rejected"; the mode's real use is halving checkpoint/drain bytes.

Usage: python benchmarks/state_compression_probe.py [B]
"""

import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))
sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from _ab_harness import ab_probe  # noqa: E402


def main():
    B = int(sys.argv[1]) if len(sys.argv) > 1 else 16384
    ab_probe([("state_compression=None", {"state_compression": None}),
              ("state_compression=int8", {"state_compression": "int8"})], B=B)


if __name__ == "__main__":
    main()
