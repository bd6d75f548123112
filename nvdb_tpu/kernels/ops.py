"""Pure-jnp scan / top-k / rerank ops.

These are (a) the semantic oracle every Pallas kernel is tested against — the role
the single-thread FlatIndex plays in the reference (flat_index.cpp:16-48) — and
(b) the CPU-backend fallback so the whole framework runs without a TPU.

Design notes (TPU-first, not a C++ translation):
- The scan is a ``lax.scan`` over row chunks with a carried running top-k, so peak
  memory is O(B * chunk) instead of materializing [B, N] scores in HBM.
- Scoring is one MXU matmul per chunk with f32 accumulation
  (``preferred_element_type``), replacing the reference's AVX2 dot kernels
  (simd_dot.cpp:27-199).
- The running top-k merge (concat + ``lax.top_k``) replaces TopKBuffer
  (topK.h:23-49) and the per-thread-heap k-way merges (flat_index_omp.cpp:67-75).
"""

from __future__ import annotations

import functools
from typing import Optional, Tuple

import jax
import jax.numpy as jnp

# plain float so importing this module never initializes a backend
NEG_INF = float("-inf")


def _pick_chunk(n_padded: int, row_block: int, target: int) -> int:
    """Largest chunk that divides n_padded, is a multiple of gcd(row_block,
    n_padded), and is <= target. The gcd clamp handles shards smaller than the
    nominal row_block (e.g. a 512-row shard of a store built with row_block
    1024)."""
    import math

    row_block = math.gcd(row_block, n_padded)
    m = n_padded // row_block
    best = 1
    t = 1
    while t * t <= m:
        if m % t == 0:
            for c in (t, m // t):
                if c * row_block <= target and c > best:
                    best = c
        t += 1
    return best * row_block


def score_chunk(
    q: jax.Array,            # [B, D] f32 (or int8 with q_scales)
    chunk: jax.Array,        # [T, D] f32 | bf16 | int8
    scales: Optional[jax.Array],  # [T] f32 for int8
    q_scales: Optional[jax.Array] = None,  # [B] f32 for int8 queries
) -> jax.Array:
    """Dot-product scores [B, T] with f32 accumulation — the ``score_query_base_at``
    dispatch seam (score_dispatch.h:25-48) collapsed into one batched MXU matmul."""
    cdt = chunk.dtype
    if q.dtype == jnp.int8 and cdt == jnp.int8:
        # quantized-query fast path: int8 x int8 -> int32 (exact), both scales
        # applied to the f32 result
        s = jnp.dot(q, chunk.T, preferred_element_type=jnp.int32).astype(jnp.float32)
        if scales is not None:
            s = s * scales[None, :]
        if q_scales is not None:
            s = s * q_scales[:, None]
        return s
    if cdt == jnp.float32:
        # HIGHEST: true f32 matmul (on the TPU MXU this is the multi-pass bf16
        # decomposition). The default single-pass precision loses ~1e-1 abs error
        # on unit vectors, which breaks exact-scan semantics.
        s = jnp.dot(q, chunk.T, preferred_element_type=jnp.float32,
                    precision=jax.lax.Precision.HIGHEST)
    elif cdt == jnp.bfloat16:
        s = jnp.dot(q.astype(jnp.bfloat16), chunk.T, preferred_element_type=jnp.float32)
    elif cdt == jnp.int8:
        # int8 payload dequantized into the matmul: bf16 holds all int8 values
        # exactly; per-row scale applied to the f32 accumulator afterwards
        # (the reference applies scale once per row too, simd_dot.cpp:161-199).
        s = jnp.dot(q.astype(jnp.bfloat16), chunk.T.astype(jnp.bfloat16),
                    preferred_element_type=jnp.float32)
        s = s * scales[None, :]
    else:
        raise ValueError(f"unsupported store dtype {cdt}")
    return s


def merge_topk(vals_a, ids_a, vals_b, ids_b, k: int) -> Tuple[jax.Array, jax.Array]:
    """Merge two top-k candidate sets per query row: [B, ka] + [B, kb] -> [B, k]."""
    vals = jnp.concatenate([vals_a, vals_b], axis=1)
    ids = jnp.concatenate([ids_a, ids_b], axis=1)
    top_vals, idx = jax.lax.top_k(vals, k)
    return top_vals, jnp.take_along_axis(ids, idx, axis=1)


@functools.partial(jax.jit, static_argnames=("k", "row_block", "chunk_target",
                                              "metric"))
def scan_topk(
    queries: jax.Array,           # [B, Dp] f32 (dims already padded)
    vectors: jax.Array,           # [Np, Dp]
    scales: Optional[jax.Array],  # [Np] f32 or None
    n_valid,                      # scalar int: rows >= n_valid are padding
    k: int,
    row_block: int = 1024,
    chunk_target: int = 131072,
    query_scales: Optional[jax.Array] = None,  # [B] f32 for int8 queries
    metric: str = "dot",
) -> Tuple[jax.Array, jax.Array]:
    """Exact flat-scan top-k. Returns (scores [B,k], ids [B,k]) sorted
    descending. The jnp oracle for the Pallas fused scan kernel.

    ``metric="dot"`` ranks by the dot product (the reference's default,
    gtbin metric DotEquivalentL2 — identical L2 rank on normalized rows);
    ``metric="l2"`` ranks by 2 q.r - ||r||^2 (monotone in -L2, exact on
    UN-normalized corpora too) — the EXACT_METRIC=L2 analogue
    (nvdb_ivf_eval.cpp:353,436). L2 scores fold the per-row i8 scale as
    s^2 * ||codes||^2; int8 QUERIES are dot-only (query quantization is a
    rank approximation already)."""
    if metric not in ("dot", "l2"):
        raise ValueError(f"unknown metric {metric!r}")
    if metric == "l2" and query_scales is not None:
        raise ValueError("metric='l2' requires f32 queries")
    B = queries.shape[0]
    Np, Dp = vectors.shape
    chunk = _pick_chunk(Np, row_block, chunk_target)
    n_chunks = Np // chunk

    vecs = vectors.reshape(n_chunks, chunk, Dp)
    scls = scales.reshape(n_chunks, chunk) if scales is not None else None
    chunk_starts = jnp.arange(n_chunks, dtype=jnp.int32) * chunk
    col_ids = jnp.arange(chunk, dtype=jnp.int32)

    init = (jnp.full((B, k), NEG_INF), jnp.full((B, k), -1, dtype=jnp.int32))

    def step(carry, xs):
        vals, ids = carry
        if scls is not None:
            tile, s_tile, start = xs
        else:
            (tile, start), s_tile = xs, None
        scores = score_chunk(queries, tile, s_tile, query_scales)
        if metric == "l2":
            n2 = jnp.sum(tile.astype(jnp.float32) ** 2, axis=1)   # [T]
            if s_tile is not None:
                n2 = n2 * s_tile * s_tile
            scores = 2.0 * scores - n2[None, :]
        gids = start + col_ids
        scores = jnp.where((gids < n_valid)[None, :], scores, NEG_INF)
        new_vals, new_ids = merge_topk(
            vals, ids, scores, jnp.broadcast_to(gids[None, :], scores.shape), k)
        return (new_vals, new_ids), None

    xs = (vecs, scls, chunk_starts) if scls is not None else (vecs, chunk_starts)
    (vals, ids), _ = jax.lax.scan(step, init, xs)
    return vals, ids


@functools.partial(jax.jit, static_argnames=("k", "metric"))
def exact_rerank(
    queries: jax.Array,        # [B, Dp] f32
    cand_vectors: jax.Array,   # [B, R, Dp] f32 (already gathered + dequantized)
    cand_ids: jax.Array,       # [B, R] int32 (may contain -1 padding)
    k: int,
    metric: str = "l2",
) -> Tuple[jax.Array, jax.Array]:
    """Exact re-rank of gathered ANN candidates — the role of cuda_l2_topk_batch
    (cuda_refine.cu:839-1175) with no H2D/D2H stage: candidates are already in HBM.

    Returns (scores [B,k], ids [B,k]); for metric="l2" scores are negated squared
    L2 (so larger is better and merge logic is shared); invalid (-1) candidates
    rank last.
    """
    prec = (jax.lax.Precision.HIGHEST
            if cand_vectors.dtype == jnp.float32 else jax.lax.Precision.DEFAULT)
    if metric == "l2":
        # ||q - c||^2 = ||q||^2 - 2 q.c + ||c||^2 ; rank by -(||c||^2 - 2 q.c)
        dots = jnp.einsum("bd,brd->br", queries, cand_vectors,
                          preferred_element_type=jnp.float32, precision=prec)
        cnorm = jnp.sum(cand_vectors.astype(jnp.float32) ** 2, axis=-1)
        scores = 2.0 * dots - cnorm
    elif metric == "dot":
        scores = jnp.einsum("bd,brd->br", queries, cand_vectors,
                            preferred_element_type=jnp.float32, precision=prec)
    else:
        raise ValueError(f"unknown metric {metric}")
    scores = jnp.where(cand_ids >= 0, scores, NEG_INF)
    top_vals, idx = jax.lax.top_k(scores, k)
    return top_vals, jnp.take_along_axis(cand_ids, idx, axis=1)


def dedup_topk(vals: jax.Array, ids: jax.Array, k: int
               ) -> Tuple[jax.Array, jax.Array]:
    """Collapse duplicate ids in a [B, W] candidate set (keeping each id's
    best score), then re-select the top k. Needed by replicated-assignment
    indexes (IVFPQIndex.repack replicas>1) on the jnp path — the Pallas
    merge (_merge_topk_sorted) removes copies by construction, this keeps
    the oracle path's semantics identical. W is small (<= a few hundred)."""
    # sort by (id asc, val desc): the first row of each id group is its best
    order = jnp.lexsort((-vals, ids), axis=1)
    sv = jnp.take_along_axis(vals, order, axis=1)
    si = jnp.take_along_axis(ids, order, axis=1)
    dup = jnp.concatenate(
        [jnp.zeros_like(si[:, :1], dtype=bool), si[:, 1:] == si[:, :-1]],
        axis=1)
    sv = jnp.where(dup, NEG_INF, sv)
    si = jnp.where(dup, -1, si)
    top_vals, idx = jax.lax.top_k(sv, k)
    return top_vals, jnp.take_along_axis(si, idx, axis=1)
