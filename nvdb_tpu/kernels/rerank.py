"""Pallas exact-rerank kernel: candidate row gather + L2 top-k, fused in VMEM.

The TPU re-design of ``cuda_l2_topk_batch`` (cuda_refine.cu:839-1175). The
reference stages H2D(queries+ids) -> distance kernel -> D2H; on TPU the
base already lives in HBM, so the whole refine is one kernel: per grid step
a chunk of candidate rows is pulled HBM->VMEM by manually issued async
copies whose source offsets come from the scalar-prefetched candidate-id
table (the DMA engine does the pointer chasing; no [B, R, Dp] gather slab is
ever materialized in HBM, which is 2x less traffic than the jnp
take+einsum path in ops.exact_rerank, its oracle).

Mosaic alignment: dynamic dim-0 slices of a tiled HBM memref must be
aligned to the dtype's sublane tile (8 rows f32 / 16 bf16 / 32 int8), so a
single candidate row cannot be DMA'd directly. The store is viewed as
[Np/blk, blk, Dp] (dim 0 untiled), the aligned blk-row block containing
each candidate is copied, all blk rows are scored on the MXU and the wrong
ones are masked by comparing each lane's block position to ``cid % blk`` —
branch-free, no relayouts, and it removes the round-1 scalar id-select
loop entirely (candidate ids/scales arrive as normal VMEM vector inputs
instead).

Scoring matches the reference refine semantics: exact L2 against the
full-precision store, rank by  2*q.row - ||row||^2  (== -L2 + const ||q||^2,
monotone), f32 accumulation, int8 rows dequantized by per-row scale
(applied to the score: dot(q, s*r) = s*dot(q, r), ||s*r||^2 = s^2*||r||^2).
"""

from __future__ import annotations

import functools
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from nvdb_tpu.kernels.flat_scan import _merge_topk_sorted, NEG_INF

# HBM sublane tile per dtype — the smallest alignable row-block. f32 tiles
# at (8, 128), bf16 at (16, 128), int8 at (32, 128): viewing the store as
# [Np/blk, blk, Dp] is only layout-free when blk matches the dtype's tile
# (a too-small blk makes Mosaic pad or copy the whole store).
_BLK_OF = {"float32": 8, "bfloat16": 16, "int8": 32}


def _make_kernel(k: int, chunk: int, blk: int, has_scales: bool):
    def kernel(ids_ref, q_ref, idv_ref, *rest):
        rest = list(rest)
        sc_ref = rest.pop(0) if has_scales else None
        v_hbm, vals_out, ids_out, rows_vmem, svals_scr, sids_scr, sem = rest

        b = pl.program_id(0)
        j = pl.program_id(1)

        @pl.when(j == 0)
        def _init():
            svals_scr[:] = jnp.full(svals_scr.shape, NEG_INF, jnp.float32)
            sids_scr[:] = jnp.full(sids_scr.shape, -1, jnp.int32)

        # issue the chunk's block DMAs (invalid ids clamp to row 0; masked
        # later). Each copies the aligned blk-row block holding candidate c.
        for c in range(chunk):
            cid = ids_ref[b, j * chunk + c]
            bi = jnp.maximum(cid, 0) // blk
            pltpu.make_async_copy(
                v_hbm.at[pl.ds(bi, 1)], rows_vmem.at[pl.ds(c, 1)], sem
            ).start()
        for c in range(chunk):
            pltpu.make_async_copy(
                v_hbm.at[pl.ds(0, 1)], rows_vmem.at[pl.ds(0, 1)], sem).wait()

        w = chunk * blk
        rows = rows_vmem[:].reshape(w, rows_vmem.shape[-1]).astype(jnp.float32)
        q = q_ref[0]                                         # [1, Dp]
        dots = jax.lax.dot_general(
            q, rows, (((1,), (1,)), ((), ())),
            precision=jax.lax.Precision.HIGHEST,
            preferred_element_type=jnp.float32)              # [1, w]
        r2 = jnp.sum(rows * rows, axis=1)[None, :]           # [1, w]

        idrep = idv_ref[0, 0]                                # [1, w]
        lane = jax.lax.broadcasted_iota(jnp.int32, (1, w), 1)
        keep = ((lane % blk) == (idrep % blk)) & (idrep >= 0)
        if sc_ref is not None:
            sc = sc_ref[0, 0]                                # [1, w]
            s = 2.0 * sc * dots - (sc * sc) * r2
        else:
            s = 2.0 * dots - r2
        s = jnp.where(keep, s, NEG_INF)
        idm = jnp.where(keep, idrep, -1)  # merge needs unique live ids

        cvals = jnp.concatenate([svals_scr[0:1], s], axis=1)
        cids = jnp.concatenate([sids_scr[0:1], idm], axis=1)
        nv, ni = _merge_topk_sorted(cvals, cids, k)
        svals_scr[0:1] = nv
        sids_scr[0:1] = ni

        @pl.when(j == pl.num_programs(1) - 1)
        def _emit():
            vals_out[0] = svals_scr[0:1]
            ids_out[0] = sids_scr[0:1]

    return kernel


@functools.partial(jax.jit, static_argnames=("k", "chunk", "interpret"))
def pallas_rerank(
    queries: jax.Array,     # [B, Dp] f32
    cand_ids: jax.Array,    # [B, R] int32 (-1 padded)
    vectors: jax.Array,     # [Np, Dp] f32 | bf16 | int8
    scales,                 # [Np] f32 | None (int8 stores)
    k: int,
    chunk: int = 32,
    interpret: Optional[bool] = None,
) -> Tuple[jax.Array, jax.Array]:
    """Exact L2 top-k over each query's candidate rows. Scores use the
    2*dot - ||row||^2 convention (monotone in -L2). Oracle: ops.exact_rerank
    (which returns 2*dot - ||row||^2 as well)."""
    B, Dp = queries.shape
    R = cand_ids.shape[1]
    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    r_pad = ((R + chunk - 1) // chunk) * chunk
    if r_pad != R:
        cand_ids = jnp.pad(cand_ids, ((0, 0), (0, r_pad - R)),
                           constant_values=-1)
    cand_ids = cand_ids.astype(jnp.int32)
    nj = r_pad // chunk

    blk = _BLK_OF[str(vectors.dtype)]
    np_pad = ((vectors.shape[0] + blk - 1) // blk) * blk
    if np_pad != vectors.shape[0]:
        # stores pad capacity generously already; this copy hits tiny tests
        vectors = jnp.pad(vectors, ((0, np_pad - vectors.shape[0]), (0, 0)))
    v_blocks = vectors.reshape(np_pad // blk, blk, Dp)

    # candidate ids pre-expanded blk-x (lane p of candidate c holds cid_c, so
    # the kernel masks by lane%blk == cid%blk with zero in-kernel relayouts);
    # for int8 stores the per-candidate scale rides the same way. [B, R]
    # scalar gathers/repeats are XLA-side and tiny next to the row DMAs.
    w = chunk * blk
    idv = jnp.repeat(cand_ids, blk, axis=1).reshape(B, nj, 1, w)
    kernel = _make_kernel(k, chunk, blk, scales is not None)

    in_specs = [
        pl.BlockSpec((1, 1, Dp), lambda b, j, ids: (b, 0, 0),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((1, 1, 1, w), lambda b, j, ids: (b, j, 0, 0),
                     memory_space=pltpu.VMEM),
    ]
    args = [queries.reshape(B, 1, Dp), idv]
    if scales is not None:
        sc = jnp.take(scales, jnp.maximum(cand_ids, 0)).astype(jnp.float32)
        sc = jnp.repeat(sc, blk, axis=1)
        in_specs.append(
            pl.BlockSpec((1, 1, 1, w), lambda b, j, ids: (b, j, 0, 0),
                         memory_space=pltpu.VMEM))
        args.append(sc.reshape(B, nj, 1, w))
    in_specs.append(pl.BlockSpec(memory_space=pl.ANY))
    args.append(v_blocks)

    scratch = [
        pltpu.VMEM((chunk, blk, Dp), vectors.dtype),
        pltpu.VMEM((8, k), jnp.float32),
        pltpu.VMEM((8, k), jnp.int32),
        pltpu.SemaphoreType.DMA,
    ]

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(B, nj),
        in_specs=in_specs,
        out_specs=[
            pl.BlockSpec((1, 1, k), lambda b, j, ids: (b, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, k), lambda b, j, ids: (b, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        scratch_shapes=scratch,
    )
    out = pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=[
            jax.ShapeDtypeStruct((B, 1, k), jnp.float32),
            jax.ShapeDtypeStruct((B, 1, k), jnp.int32),
        ],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary", "arbitrary"),
        ),
        interpret=interpret,
    )(cand_ids, *args)
    return out[0].reshape(B, k), out[1].reshape(B, k)
