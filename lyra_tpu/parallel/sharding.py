"""Multi-chip scaling: shard the stream batch across a device mesh.

The reference is single-threaded per codec instance (reference:
lyra/tflite_model_wrapper.cc:51,68 pins interpreters to one thread) — its
scaling model is "one phone core per stream".  The TPU-native scaling model
is stream-batch data parallelism (SURVEY.md §2 "Parallelism"): the lockstep
engines already treat streams as a leading `[B]` axis with zero cross-stream
communication, so sharding that axis over a 1-D `jax.sharding.Mesh` scales
to a full ICI pod with **no tensor collectives in the frame path** — XLA
partitions every conv/matmul row-wise and never inserts an all-gather.  The
single collective GSPMD emits is a scalar `pred[]` all-reduce (one bit over
ICI per tick) implementing the fleet-wide CNG idle gate's `any(run_cng)`;
this is machine-checked against the optimized HLO, along with constant
per-device compiled FLOPs/bytes for 1→2→4→8 devices at fixed per-device
batch (tests/test_sharding.py::test_sharded_roundtrip_hlo_has_no_tensor_collectives
and ::test_weak_scaling_constant_per_device_cost).

DCN enters only for scale-out of independent batches; model weights are
replicated (a few MB) and per-stream state (~110 KB) lives sharded in HBM.
"""

from __future__ import annotations

from typing import Any, Optional, Sequence

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

STREAM_AXIS = "streams"

_DONATION_SUPPORTED: Optional[bool] = None


def donation_supported() -> bool:
    """Whether the active backend accepts jit buffer donation.

    Probed once with a trivial kernel; tunneled dev PJRT plugins can reject
    donation with INVALID_ARGUMENT at dispatch time.
    """
    global _DONATION_SUPPORTED
    if _DONATION_SUPPORTED is None:
        try:
            f = jax.jit(lambda x: x + 1, donate_argnums=(0,))
            f(jnp.zeros(8, jnp.float32)).block_until_ready()
            _DONATION_SUPPORTED = True
        except Exception:
            _DONATION_SUPPORTED = False
    return _DONATION_SUPPORTED


def make_mesh(devices: Optional[Sequence] = None,
              axis_name: str = STREAM_AXIS) -> Mesh:
    """1-D mesh over all (or the given) devices, stream axis only."""
    devices = list(devices) if devices is not None else jax.devices()
    return Mesh(np.asarray(devices), (axis_name,))


def batch_sharding(mesh: Mesh, axis_name: str = STREAM_AXIS) -> NamedSharding:
    """Shard the leading (stream) dimension, replicate the rest."""
    return NamedSharding(mesh, P(axis_name))


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def shard_batch_tree(tree: Any, mesh: Mesh,
                     axis_name: str = STREAM_AXIS) -> Any:
    """Place every leaf of a `[B, ...]` pytree with dim-0 sharded on the mesh."""
    sh = batch_sharding(mesh, axis_name)
    return jax.tree.map(lambda x: jax.device_put(x, sh), tree)


class ShardedEngine:
    """Wraps an Encoder/DecoderEngine so state and per-tick IO are sharded
    over the stream axis of `mesh`, with state buffers donated between ticks
    (no HBM churn in steady state)."""

    def __init__(self, engine, mesh: Optional[Mesh] = None,
                 axis_name: str = STREAM_AXIS, donate: bool = False):
        self.engine = engine
        self.mesh = mesh if mesh is not None else make_mesh()
        self.axis_name = axis_name
        self._sh = batch_sharding(self.mesh, axis_name)
        # Donating the state buffers lets steady-state serving rewrite state
        # in place (no HBM churn).  Default off: some PJRT plugins (e.g.
        # tunneled dev backends) reject donation on large fused programs with
        # INVALID_ARGUMENT even though small-kernel donation probes pass
        # (probe with donation_supported() before enabling).
        self._step = jax.jit(
            engine._step_impl, donate_argnums=(0,) if donate else ())

    @property
    def num_devices(self) -> int:
        return self.mesh.devices.size

    def _check_batch(self, batch_size: int):
        if batch_size % self.num_devices != 0:
            raise ValueError(
                f"batch size {batch_size} must divide evenly over "
                f"{self.num_devices} devices")

    def __getattr__(self, name):
        # Delegate engine metadata (rvq, hop_samples, ...) so a ShardedEngine
        # drops into every seam a plain engine fits — notably the stream
        # servers (tools/stream_server.py), which makes the serving runtime
        # multi-chip without code changes there.  Dunders are excluded so
        # protocol probes (copy/pickle) see this object, not the engine.
        if name.startswith("__") or name == "engine":
            raise AttributeError(name)
        return getattr(self.engine, name)

    def init_state(self, batch_size: int, **kw):
        self._check_batch(batch_size)
        return shard_batch_tree(
            self.engine.init_state(batch_size, **kw), self.mesh, self.axis_name)

    def reset_rows(self, state, mask, **kw):
        """Stream admission/eviction on the mesh: re-initialize the masked
        rows, keeping every leaf sharded over the stream axis.

        The fresh init-state template is cached (one entry: servers admit
        at a fixed capacity/seed) — without it every single-stream admission
        would rebuild and reshard the full ~MB-per-stream state tree across
        the mesh, at call-arrival rates."""
        mask = np.asarray(mask)
        key = (int(mask.shape[0]), tuple(sorted(kw.items())))
        cached = getattr(self, "_fresh_cache", None)
        if cached is None or cached[0] != key:
            fresh = shard_batch_tree(
                self.engine.init_state(int(mask.shape[0]), **kw),
                self.mesh, self.axis_name)
            self._fresh_cache = cached = (key, fresh)
        fresh = cached[1]
        mask_dev = jax.device_put(mask, self._sh)

        def pick(new, old):
            m = mask_dev.reshape((-1,) + (1,) * (new.ndim - 1))
            return jnp.where(m, new, old)

        return jax.tree.map(pick, fresh, state)

    def step(self, state, *args):
        def put(a):
            if isinstance(a, jax.Array):
                # Already on device (e.g. another engine's output): don't
                # bounce it through the host every tick — leave placement
                # to GSPMD propagation from the sharded state.
                return a
            a = np.asarray(a)
            if a.ndim >= 1 and a.shape[0] % self.num_devices == 0:
                return jax.device_put(a, self._sh)
            return jax.device_put(a, replicated(self.mesh))

        return self._step(state, *map(put, args))
