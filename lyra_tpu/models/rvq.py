"""Residual vector quantizer — native batched JAX implementation.

Replaces the reference's TFLite-signature-runner RVQ (reference:
lyra/residual_vector_quantizer.cc:36-168, model: quantizer.tflite) with a
vectorized implementation over the stream-batch axis.  The 46 stage codebooks
(16 codewords × 64 dims, 4 bits/stage) are extracted from the shipped
quantizer weights; the arithmetic mirrors the unrolled TFLite encode graph
exactly (squared-difference → sum → argmin → residual update), which makes
stage indices bit-exact against the reference interpreter (verified in
tests/test_rvq.py).

Encode masks stages ≥ num_quantizers to -1, matching the wire convention
where unused decode stages are passed as -1 (reference:
lyra/residual_vector_quantizer.cc:155-157).  `num_quantizers` may be a traced
per-stream array, so streams at different bitrates batch together.
"""

from __future__ import annotations


import jax
import jax.numpy as jnp
import numpy as np

from lyra_tpu import config
from lyra_tpu.tflite import model as tfl


def extract_codebooks(quantizer_path: str) -> np.ndarray:
    """Pull per-stage codebooks out of the quantizer weights.

    Returns [num_stages, 16, 64] float32.  Stage order follows the encode
    graph's op order (stage 0 = coarsest, carried in the packet MSBs).
    """
    mdef = tfl.load(quantizer_path)
    encode_sg = mdef.subgraphs[mdef.signatures["encode"]["subgraph"]]
    cbs = []
    for op in encode_sg.ops:
        if op.name == "SQUARED_DIFFERENCE":
            cb = encode_sg.tensors[op.inputs[1]].data
            cbs.append(np.asarray(cb, np.float32).reshape(16, config.NUM_FEATURES))
    if len(cbs) != config.MAX_NUM_QUANTIZERS:
        raise ValueError(f"expected {config.MAX_NUM_QUANTIZERS} stages, got {len(cbs)}")
    return np.stack(cbs)


class ResidualVectorQuantizer:
    """Batched RVQ over `[num_streams, 64]` feature frames."""

    def __init__(self, codebooks: np.ndarray):
        self.codebooks = jnp.asarray(codebooks)  # [S, 16, F]
        self.num_stages = codebooks.shape[0]
        self.bits_per_stage = int(np.log2(codebooks.shape[1]))
        self._pallas_kernel = None

    @classmethod
    def from_model_path(cls, model_path: str) -> "ResidualVectorQuantizer":
        import os

        return cls(extract_codebooks(os.path.join(model_path, "quantizer.tflite")))

    def quantize(self, features: jnp.ndarray, num_quantizers,
                 method: str = "exact", max_stages: int | None = None
                 ) -> jnp.ndarray:
        """features [B, F] → stage indices [B, S] (−1 beyond num_quantizers).

        `num_quantizers` is a scalar or [B] int array; it only masks the
        output — the residual recursion itself is bitrate-independent, exactly
        as in the reference encode graph.

        method="exact" mirrors the TFLite encode graph arithmetic
        (squared-difference distances) so stage indices are bit-exact
        against the reference interpreter.  method="fast" is the TPU serving
        path: MXU inner-product scores (argmin of ||c||² − 2·r·c) and
        one-hot residual updates — mathematically the same nearest-neighbor
        search, so only float near-ties can pick a different (equally
        near) codeword.

        `max_stages` (static) caps the residual recursion itself (for the
        exact/fast paths; the pallas kernel always computes all stages and
        only the output is capped): a fleet
        pinned at one bitrate (e.g. 3.2 kbps → 16 stages) skips the ~65% of
        stage work the wire format can never carry.  Stages ≥ max_stages
        come back −1; per-stream num_quantizers may be anything ≤ max_stages.
        Computed stage indices are identical to the full run — stage s never
        depends on later stages.
        """
        cbs = self.codebooks
        run_stages = self.num_stages if max_stages is None else int(max_stages)
        if not 1 <= run_stages <= self.num_stages:
            raise ValueError(f"max_stages {max_stages} out of range")
        if method not in ("exact", "fast", "pallas"):
            raise ValueError(f"unknown quantize method {method!r}")

        if method == "pallas":
            # Whole 46-stage search in VMEM (lyra_tpu/ops/rvq_kernel.py).
            if self._pallas_kernel is None:
                from lyra_tpu.ops.rvq_kernel import RvqEncodeKernel

                self._pallas_kernel = RvqEncodeKernel(np.asarray(self.codebooks))
            indices = self._pallas_kernel(features)
        elif method == "fast":
            cbs_t = jnp.swapaxes(cbs, 1, 2)  # [S, F, 16]
            c2 = jnp.sum(jnp.square(cbs), axis=-1)  # [S, 16]
            residual = features
            idx_list = []
            for s in range(run_stages):  # unrolled: XLA pipelines stages
                scores = c2[s][None, :] - 2.0 * jax.lax.dot_general(
                    residual, cbs_t[s],
                    dimension_numbers=(((1,), (0,)), ((), ())),
                    preferred_element_type=jnp.float32)
                idx = jnp.argmin(scores, axis=-1).astype(jnp.int32)
                oh = jax.nn.one_hot(idx, cbs.shape[1], dtype=residual.dtype)
                residual = residual - jax.lax.dot_general(
                    oh, cbs[s], dimension_numbers=(((1,), (0,)), ((), ())),
                    preferred_element_type=jnp.float32)
                idx_list.append(idx)
            indices = jnp.stack(idx_list, axis=1)  # [B, run_stages]
        else:
            def stage(residual, cb):
                # [B, 1, F] vs [16, F] → distances [B, 16]
                d = jnp.sum(jnp.square(residual[:, None, :] - cb[None]), axis=-1)
                idx = jnp.argmin(d, axis=-1).astype(jnp.int32)  # [B]
                q = cb[idx]  # [B, F]
                return residual - q, idx

            _, indices = jax.lax.scan(stage, features, cbs[:run_stages])
            indices = indices.T  # [B, run_stages]
        if indices.shape[1] < self.num_stages:
            indices = jnp.pad(indices,
                              ((0, 0), (0, self.num_stages - indices.shape[1])),
                              constant_values=-1)
        nq = jnp.asarray(num_quantizers, jnp.int32)
        nq = jnp.minimum(nq, run_stages)  # pallas computes all stages; cap
        nq = jnp.broadcast_to(nq, indices.shape[:1])  # [B]
        stage_ids = jnp.arange(self.num_stages, dtype=jnp.int32)[None, :]
        return jnp.where(stage_ids < nq[:, None], indices, -1)

    def decode(self, indices: jnp.ndarray, dtype=None,
               max_stages: int | None = None) -> jnp.ndarray:
        """stage indices [B, S] (−1 = unused) → lossy features [B, F].

        One-hot contraction instead of a gather: `jax.nn.one_hot(-1)` is the
        all-zero row, which implements the unused-stage masking for free,
        and the whole decode is a single [B, S·16] @ [S·16, F] matmul (MXU)
        — gathers are pathologically slow on TPU.

        dtype=jnp.bfloat16 halves the one-hot HBM traffic (~0.2% feature
        error, far below the quantizer's own error) — the bf16-mode engines
        use it; default is f32-accurate.

        `max_stages` (static) contracts only the first max_stages stages —
        exact when the wire format caps the bitrate (later indices are −1,
        i.e. all-zero one-hot rows anyway).
        """
        s, k, f = self.codebooks.shape
        if max_stages is not None:
            s = int(max_stages)
            if not 1 <= s <= self.num_stages:  # same guard as quantize()
                raise ValueError(f"max_stages {max_stages} out of range")
            indices = indices[:, :s]
        cbs = self.codebooks[:s]
        if dtype is not None and dtype != jnp.float32:
            oh = jax.nn.one_hot(indices, k, dtype=dtype)
            return jax.lax.dot_general(
                oh.reshape(-1, s * k),
                cbs.astype(dtype).reshape(s * k, f),
                dimension_numbers=(((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32)
        oh = jax.nn.one_hot(indices, k, dtype=cbs.dtype)  # [B,S,16]
        return jax.lax.dot_general(
            oh.reshape(-1, s * k), cbs.reshape(s * k, f),
            dimension_numbers=(((1,), (0,)), ((), ())),
            precision=jax.lax.Precision.HIGH,
            preferred_element_type=jnp.float32)

    def num_bits_to_stages(self, num_bits: int) -> int:
        if num_bits % self.bits_per_stage != 0:
            raise ValueError(
                f"num_bits {num_bits} not divisible by {self.bits_per_stage}"
            )
        return num_bits // self.bits_per_stage
