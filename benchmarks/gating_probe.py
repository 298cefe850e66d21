"""A/B probe: idle-stage lax.cond gating vs the always-run masked step.

Measures the full encode+decode lockstep tick at B=16384 bf16 (the bench
configuration) with DecoderEngine's CNG idle gate on and off.  Round-2
results on one v5e through the axon tunnel (PERF.md "Idle-stage gating"):

    gate=True : 10.26 ms/step  (31,945 streams)
    gate=False: 11.14 ms/step  (29,424 streams)

Also the negative result that shaped the design: gating the conv stacks or
their freeze-masks the same way regressed to ~17 ms/step, because every
state tree routed through a conditional's branch results is copied each
tick, whichever branch executes.

Usage: python benchmarks/gating_probe.py [B]
"""

import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))
sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from _ab_harness import ab_probe  # noqa: E402


def main():
    B = int(sys.argv[1]) if len(sys.argv) > 1 else 16384
    ab_probe([("gate=True", {"gate_idle_stages": True}),
              ("gate=False", {"gate_idle_stages": False})], B=B)


if __name__ == "__main__":
    main()
