"""Per-call buffer-count probe: 47 state leaves vs 5 dtype-grouped buffers.

The round-3 wave ablation (PERF.md) shows ~72% of the tick is state
movement + per-call dispatch, with buffer donation rejected by this PJRT.
One untested lever: the roundtrip crosses the jit boundary with ~47 state
arrays per wave (94 buffers/tick at 2 waves).  If the un-donated output
copy or the tunnel dispatch pays a per-BUFFER cost on top of per-byte,
carrying the state as a handful of dtype-grouped [B, N] buffers
(slice/reshape inside the program, concat on the way out) would reclaim
it; if the cost is purely per-byte, the packed form should be a wash or
lose to the extra concat materialization.

Variants (all 2 waves x B, steady state, interleaved dispatch):
  skel-leaves  read+write every leaf (+1 / ~mask), 47 buffers  [ablation
               skeleton — the number PERF.md decomposes]
  skel-flat    +1 on the 5 grouped buffers — the ideal grouped bound
  skel-packed  unpack -> touch -> repack — packed-form overhead isolated
  real-leaves  the shipping roundtrip step
  real-packed  roundtrip with pack/unpack inside the program

Usage: python benchmarks/dispatch_probe.py [B_per_wave] [iters]
"""

import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


def make_codec(tree_example):
    """Static pack/unpack for a fixed pytree: one [B, N] buffer per dtype.

    NOT a byte-level packing: a uint8 bitcast form was tried first and the
    TPU compiler padded its `[.., itemsize]` trailing-dim layout to a 32 GB
    allocation at B=8192 (tiling (8,128)(4,1) on a rank-6 u8 array).
    Grouping by dtype keeps every buffer a natively-tiled 2-D array and
    still collapses 47 jit-boundary buffers into 5.
    """
    import jax
    import jax.numpy as jnp

    leaves, treedef = jax.tree_util.tree_flatten(tree_example)
    b = leaves[0].shape[0]
    assert all(l.shape[:1] == (b,) for l in leaves), "leading dim must be B"
    specs = [(l.shape, jnp.dtype(l.dtype)) for l in leaves]
    dtypes = sorted({d for _, d in specs}, key=str)

    def pack(tree):
        groups = {}
        for leaf in jax.tree_util.tree_leaves(tree):
            groups.setdefault(jnp.dtype(leaf.dtype), []).append(
                leaf.reshape(leaf.shape[0], -1))
        return tuple(jnp.concatenate(groups[d], axis=1) for d in dtypes)

    def unpack(bufs):
        by_dtype = dict(zip(dtypes, bufs))
        offs = {d: 0 for d in dtypes}
        out = []
        for shape, dtype in specs:
            n = int(np.prod(shape[1:]))
            off = offs[dtype]
            seg = by_dtype[dtype][:, off:off + n]
            offs[dtype] = off + n
            out.append(seg.reshape(shape))
        return jax.tree_util.tree_unflatten(treedef, out)

    return pack, unpack


def main():
    import jax
    import jax.numpy as jnp

    jax.config.update("jax_compilation_cache_dir", "/tmp/lyra_tpu_jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

    from lyra_tpu.codec.engine import DecoderEngine, EncoderEngine

    B = int(sys.argv[1]) if len(sys.argv) > 1 else 8192
    iters = int(sys.argv[2]) if len(sys.argv) > 2 else 20
    n_waves = 2
    enc = EncoderEngine(16000, mode="bf16", max_bitrate=3200)
    dec = DecoderEngine(16000, mode="bf16", max_bitrate=3200)
    rng = np.random.RandomState(0)
    audio = jnp.asarray(rng.randint(-16000, 16000, (B, 320)), jnp.float32)
    received = jnp.ones((B,), bool)
    nq = jnp.full((B,), 4, jnp.int32)

    example = (enc.init_state(B), dec.init_state(B))
    pack, unpack = make_codec(example)
    n_leaves = len(jax.tree_util.tree_leaves(example))
    packed_example = jax.jit(pack)(example)
    flat_bytes = sum(x.size * x.dtype.itemsize for x in packed_example)
    print(f"{n_leaves} state leaves -> {len(packed_example)} grouped "
          f"buffers, {flat_bytes / 1e6:.1f} MB packed per wave (B={B})")

    def touch_leaf(x):
        if x.dtype == jnp.bool_:
            return jnp.logical_not(x)
        return x + jnp.ones((), x.dtype)

    @jax.jit
    def skel_leaves(es, ds):
        return jax.tree_util.tree_map(touch_leaf, (es, ds))

    @jax.jit
    def skel_flat(flat):
        return tuple(touch_leaf(x) for x in flat)

    @jax.jit
    def skel_packed(flat):
        return pack(jax.tree_util.tree_map(touch_leaf, unpack(flat)))

    @jax.jit
    def real_leaves(es, ds, a, r, n):
        idx, _, es = enc._step_impl(es, a, n)
        out, cn, ds = dec._step_impl(ds, idx, r)
        return out, cn, es, ds

    @jax.jit
    def real_packed(flat, a, r, n):
        es, ds = unpack(flat)
        idx, _, es = enc._step_impl(es, a, n)
        out, cn, ds = dec._step_impl(ds, idx, r)
        return out, cn, pack((es, ds))

    # Middle ground: group only the small leaves (per-stream bytes below a
    # threshold — PLC counters, cursors, RNG keys), leaving the conv
    # context buffers' layouts alone.  Cuts buffer count without touching
    # the tensors whose fusion the full packing broke.
    small_thresh = 256  # bytes/stream
    leaves0, treedef0 = jax.tree_util.tree_flatten(example)
    is_small = [l.size // B * jnp.dtype(l.dtype).itemsize <= small_thresh
                for l in leaves0]
    small_example = [l for l, s in zip(leaves0, is_small) if s]
    packs, unpacks = make_codec(small_example)
    n_small = sum(is_small)

    def split_tree(tree):
        ls = jax.tree_util.tree_leaves(tree)
        return ([l for l, s in zip(ls, is_small) if s],
                [l for l, s in zip(ls, is_small) if not s])

    def join_tree(small, big):
        si, bi = iter(small), iter(big)
        ls = [next(si) if s else next(bi) for s in is_small]
        return jax.tree_util.tree_unflatten(treedef0, ls)

    @jax.jit
    def real_smallpack(spk, big, a, r, n):
        es, ds = join_tree(unpacks(spk), big)
        idx, _, es = enc._step_impl(es, a, n)
        out, cn, ds = dec._step_impl(ds, idx, r)
        sm2, big2 = split_tree((es, ds))
        return out, cn, packs(sm2), big2

    # Correctness gate: packed roundtrip must be numerically equivalent.
    # (Not bit-identical: the pack/unpack ops change XLA's fusion choices,
    # which shifts f32 rounding by ~1 ulp — same as any recompile.)
    o1 = real_leaves(*example, audio, received, nq)
    o2 = real_packed(jax.jit(pack)(example), audio, received, nq)
    np.testing.assert_allclose(np.asarray(o1[0]), np.asarray(o2[0]),
                               atol=1e-4, rtol=0)
    es1, ds1 = o1[2], o1[3]
    es2, ds2 = jax.jit(unpack)(o2[2])
    for a, b in zip(jax.tree_util.tree_leaves((es1, ds1)),
                    jax.tree_util.tree_leaves((es2, ds2))):
        a32 = np.asarray(a, np.float32)
        b32 = np.asarray(b, np.float32)
        scale = max(1.0, float(np.max(np.abs(a32), initial=0.0)))
        np.testing.assert_allclose(a32, b32, atol=2e-2 * scale, rtol=0)
    print("packed roundtrip numerically equivalent: ok")

    def small_leaf(o):
        # Block on one (small) buffer per call: enough to catch lost waits
        # without keeping every iteration's full state tree alive on HBM
        # (retaining the whole outputs OOMs at 2 x 500 MB x iters).
        return min(jax.tree_util.tree_leaves(o),
                   key=lambda x: x.size * x.dtype.itemsize)

    def bench(name, fn, make_wave_args, out_to_args):
        waves = [make_wave_args() for _ in range(n_waves)]
        for i, w in enumerate(waves):  # warmup/compile
            waves[i] = out_to_args(fn(*w), w)
        jax.block_until_ready(waves)
        best = None
        for _ in range(3):
            outs = []
            t0 = time.perf_counter()
            for _ in range(iters):
                for i, w in enumerate(waves):
                    o = fn(*w)
                    waves[i] = out_to_args(o, w)
                    outs.append(small_leaf(o))
            jax.block_until_ready(outs)
            dt = (time.perf_counter() - t0) / iters * 1e3
            best = dt if best is None else min(best, dt)
        print(f"{name:12s} {best:7.2f} ms/tick "
              f"({n_waves * B * 0.02 / (best / 1e3):8.0f} streams)")
        return best

    bench("skel-leaves", skel_leaves,
          lambda: [enc.init_state(B), dec.init_state(B)],
          lambda o, w: list(o))
    bench("skel-flat", skel_flat,
          lambda: [jax.jit(pack)((enc.init_state(B), dec.init_state(B)))],
          lambda o, w: [o])
    bench("skel-packed", skel_packed,
          lambda: [jax.jit(pack)((enc.init_state(B), dec.init_state(B)))],
          lambda o, w: [o])
    bench("real-leaves", real_leaves,
          lambda: [enc.init_state(B), dec.init_state(B),
                   audio, received, nq],
          lambda o, w: [o[2], o[3], audio, received, nq])
    bench("real-packed", real_packed,
          lambda: [jax.jit(pack)((enc.init_state(B), dec.init_state(B))),
                   audio, received, nq],
          lambda o, w: [o[2], audio, received, nq])

    print(f"real-smallpack groups {n_small} leaves "
          f"(<= {small_thresh} B/stream) into {len(packs(small_example))} "
          f"buffers; {len(is_small) - n_small} big leaves stay native")

    def make_smallpack_args():
        sm, big = split_tree((enc.init_state(B), dec.init_state(B)))
        return [jax.jit(packs)(sm), big, audio, received, nq]

    bench("real-smallpk", real_smallpack, make_smallpack_args,
          lambda o, w: [o[2], o[3], audio, received, nq])


if __name__ == "__main__":
    main()
