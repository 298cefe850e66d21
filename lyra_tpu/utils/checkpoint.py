"""Stream-state checkpoint/restore for the batched engines.

The reference has no checkpointing (inference-only; its nearest mechanism
is the weights/version compatibility gate, reference: lyra/lyra_config.h:
131-167).  A TPU serving deployment does need one: draining a host for
maintenance without dropping thousands of live calls means snapshotting the
per-stream state pytree (~110 KB/stream) and restoring it on another chip.

State pytrees are flat dicts of arrays (possibly nested), saved as an .npz
with separator-joined keys (unit separator, since model state names themselves contain `/`) plus a version/codec-identifier header that is checked
on restore — the runtime analog of the weights gate.
"""

from __future__ import annotations

import json
import os
from typing import Any, Dict

import numpy as np

from lyra_tpu import config

_HEADER_KEY = "__lyra_tpu_header__"
_SEP = "\x1f"
_EMPTY_DIR = "\x1e.empty"  # marker leaf name preserving empty-dict subtrees
# (\x1e can't occur in real state keys; NUL would be truncated by zip names)
# Data keys are namespaced so no state-dict key can collide with np.savez's
# positional `file` parameter or with the header entry.
_DATA_PREFIX = "d" + _SEP


def _flatten(tree: Any, prefix: str = "") -> Dict[str, np.ndarray]:
    out: Dict[str, np.ndarray] = {}
    if isinstance(tree, dict):
        if not tree and prefix:
            # Preserve empty-dict subtrees: dropping them would restore a
            # different pytree structure than was saved, failing later deep
            # inside engine.step instead of here.
            out[prefix + _EMPTY_DIR] = np.zeros(0, np.uint8)
        for k, v in tree.items():
            out.update(_flatten(v, f"{prefix}{k}{_SEP}"))
    else:
        out[prefix[:-1]] = np.asarray(tree)
    return out


def _unflatten(flat: Dict[str, np.ndarray]) -> Any:
    tree: Dict[str, Any] = {}
    for key, value in flat.items():
        parts = key.split(_SEP)
        node = tree
        if parts[-1] == _EMPTY_DIR:
            for p in parts[:-1]:
                node = node.setdefault(p, {})
            continue
        for p in parts[:-1]:
            node = node.setdefault(p, {})
        node[parts[-1]] = value
    return tree


def _canonical(path: str) -> str:
    # np.savez appends ".npz" itself; keep save/load agreeing on the name.
    return path if path.endswith(".npz") else path + ".npz"


def save_state(path: str, state: Any, extra: Dict[str, Any] | None = None) -> None:
    """Snapshot an engine state pytree (host transfer + .npz).

    The write is atomic (tmp file + rename): a periodic serving snapshot
    (serve_main --snapshot_every) is a crash-FAILOVER source, so a host
    dying mid-save must leave the previous complete snapshot in place,
    never a truncated one."""
    path = _canonical(path)
    if not isinstance(state, dict):
        raise TypeError("save_state expects a dict state pytree at the root")
    flat = _flatten(jax_to_numpy(state))
    header = json.dumps({
        "version": config.version_string(),
        "identifier": config.VERSION_MINOR,
        "extra": extra or {},
    })
    tmp = path + ".tmp.npz"  # explicit suffix so np.savez cannot re-append
    np.savez(tmp, **{_DATA_PREFIX + k: v for k, v in flat.items()},
             **{_HEADER_KEY: np.frombuffer(header.encode(), dtype=np.uint8)})
    os.replace(tmp, path)


def load_state(path: str) -> tuple[Any, Dict[str, Any]]:
    """Restore a state pytree; raises on codec-version mismatch."""
    path = _canonical(path)
    with np.load(path) as data:
        flat = {k[len(_DATA_PREFIX):]: data[k] for k in data.files
                if k.startswith(_DATA_PREFIX)}
        if not flat:
            # Legacy snapshot (pre key-namespacing): data keys are bare.
            # Restoring as an empty tree would surface as a KeyError deep
            # inside engine.step, far from the cause — read them instead.
            flat = {k: data[k] for k in data.files if k != _HEADER_KEY}
        header = json.loads(bytes(data[_HEADER_KEY]).decode())
    if header["identifier"] != config.VERSION_MINOR:
        raise ValueError(
            f"checkpoint identifier {header['identifier']} incompatible with "
            f"codec identifier {config.VERSION_MINOR}")
    return _unflatten(flat), header.get("extra", {})


def peek_extra(path: str) -> Dict[str, Any]:
    """Read ONLY a snapshot's extra header (no state arrays): np.load is a
    lazy zip reader, so this stays cheap even for multi-GB snapshots.
    Lets callers validate a multi-part restore (e.g. ServerPool waves)
    before mutating anything."""
    path = _canonical(path)
    with np.load(path) as data:
        header = json.loads(bytes(data[_HEADER_KEY]).decode())
    if header["identifier"] != config.VERSION_MINOR:
        raise ValueError(
            f"checkpoint identifier {header['identifier']} incompatible with "
            f"codec identifier {config.VERSION_MINOR}")
    return header.get("extra", {})


def jax_to_numpy(tree: Any) -> Any:
    """Device → host copy of every leaf."""
    if isinstance(tree, dict):
        return {k: jax_to_numpy(v) for k, v in tree.items()}
    return np.asarray(tree)
