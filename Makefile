# lyra_tpu build/test gate. `make check` is the CI entry point
# (.github/workflows/ci.yml invokes the same targets), runnable locally on
# any box with the baked-in Python deps.
#
# The reference gates on build only (/root/reference/.github/workflows/
# ci.yml); this gate also runs the full CPU test suite and the driver
# entry-point compile checks.

PYTHON ?= python

.PHONY: check native test test-full test-shard goldens entry clean

check: native test entry

native:
	$(MAKE) -C native

# Quick tier (~6:40 warm-cache / ~12 min cold, single-process; PERF.md
# round 5 "persistent XLA compile cache"): everything except the heaviest
# sweeps/soaks (pytest marker `full`; every marked test has a lighter
# sibling covering the same seam here).  CI runs the FULL suite via
# `make test-shard SHARD=<name>` (ci/shards.json), as does `make
# test-full` / plain `pytest tests/`.
test: native
	$(PYTHON) -m pytest tests/ -q -m "not full"

# The whole suite, full tier included (~25-30 min single-process).
test-full: native
	$(PYTHON) -m pytest tests/ -q

# SHARD is required and must name a shard in ci/shards.json — an unknown
# name fails loudly (listing the valid ones) rather than silently running
# something else, per the repo's no-silent-fallback convention.
test-shard: native
	$(PYTHON) -c "import json, subprocess, sys; \
	  shards = json.load(open('ci/shards.json'))['shards']; \
	  files = shards.get('$(SHARD)') or sys.exit( \
	      'unknown shard \'$(SHARD)\'; pass SHARD=<name>, one of: ' \
	      + ', '.join(sorted(shards))); \
	  sys.exit(subprocess.call( \
	      [sys.executable, '-m', 'pytest', '-q'] + files))"

# Fast wire-format / parity subset (~2 min): bitstream + kernel goldens.
goldens: native
	$(PYTHON) -m pytest -q tests/test_packet.py tests/test_golden_packets.py \
	  tests/test_config.py tests/test_resampler.py tests/test_ci_shards.py

# Driver entry points: single-chip jittable forward + multi-chip dryrun on
# the virtual CPU mesh at 8 devices (the driver's shape) AND 32 (pins
# mesh-size independence: the zero-tensor-collective machine check inside
# dryrun_multichip must hold at every mesh size, or GSPMD is partitioning
# the frame path differently as the fleet grows).
entry:
	XLA_FLAGS="--xla_force_host_platform_device_count=32" \
	LYRA_TPU_PLATFORM=cpu $(PYTHON) -c "import __graft_entry__ as g; import jax; \
	  g.dryrun_multichip(8); print('dryrun 8 ok'); \
	  g.dryrun_multichip(32); print('dryrun 32 ok'); \
	  fn, args = g.entry(); jax.block_until_ready(jax.jit(fn)(*args)); print('entry ok')"

clean:
	$(MAKE) -C native clean
