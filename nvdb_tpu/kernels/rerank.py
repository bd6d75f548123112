"""Pallas exact-rerank kernel: candidate row gather + L2 top-k, fused in VMEM.

The TPU re-design of ``cuda_l2_topk_batch`` (cuda_refine.cu:839-1175). The
reference stages H2D(queries+ids) -> distance kernel -> D2H; on TPU the
base already lives in HBM, so the whole refine is one kernel: per grid step
a chunk of candidate rows is pulled HBM->VMEM by manually issued async
copies whose source offsets come from the scalar-prefetched candidate-id
table (the DMA engine does the pointer chasing; no [B, R, Dp] gather slab is
ever materialized in HBM, which is 2x less traffic than the jnp
take+einsum path in ops.exact_rerank, its oracle).

Scoring matches the reference refine semantics: exact L2 against the
full-precision store, rank by  2*q.row - ||row||^2  (== -L2 + const ||q||^2,
monotone), f32 accumulation, int8 rows dequantized by per-row scale.
"""

from __future__ import annotations

import functools
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from nvdb_tpu.kernels.flat_scan import _merge_topk_sorted, NEG_INF


def _make_kernel(k: int, chunk: int, r_pad: int, has_scales: bool):
    def kernel(ids_ref, q_ref, v_hbm, *rest):
        rest = list(rest)
        s_hbm = rest.pop(0) if has_scales else None
        vals_out, ids_out = rest[0], rest[1]
        rows_vmem, scale_vmem, svals_scr, sids_scr, sem, ssem = rest[2:]

        b = pl.program_id(0)
        j = pl.program_id(1)

        @pl.when(j == 0)
        def _init():
            svals_scr[:] = jnp.full(svals_scr.shape, NEG_INF, jnp.float32)
            sids_scr[:] = jnp.full(sids_scr.shape, -1, jnp.int32)

        # issue the chunk's row DMAs (invalid ids clamp to row 0; masked later)
        for c in range(chunk):
            cid = ids_ref[b, j * chunk + c]
            safe = jnp.maximum(cid, 0)
            pltpu.make_async_copy(
                v_hbm.at[pl.ds(safe, 1)], rows_vmem.at[pl.ds(c, 1)], sem
            ).start()
            if s_hbm is not None:
                pltpu.make_async_copy(
                    s_hbm.at[0, pl.ds(safe, 1)], scale_vmem.at[0, pl.ds(c, 1)],
                    ssem).start()
        for c in range(chunk):
            pltpu.make_async_copy(
                v_hbm.at[pl.ds(0, 1)], rows_vmem.at[pl.ds(0, 1)], sem).wait()
            if s_hbm is not None:
                pltpu.make_async_copy(
                    s_hbm.at[0, pl.ds(0, 1)], scale_vmem.at[0, pl.ds(0, 1)],
                    ssem).wait()

        rows = rows_vmem[:].astype(jnp.float32)              # [C, Dp]
        if s_hbm is not None:
            rows = rows * scale_vmem[0][:, None]             # dequant int8
        q = q_ref[0]                                         # [1, Dp]
        dots = jax.lax.dot_general(
            q, rows, (((1,), (1,)), ((), ())),
            precision=jax.lax.Precision.HIGHEST,
            preferred_element_type=jnp.float32)              # [1, C]
        r2 = jnp.sum(rows * rows, axis=1)[None, :]           # [1, C]
        s = 2.0 * dots - r2

        lane = jax.lax.broadcasted_iota(jnp.int32, (1, chunk), 1)
        # read the chunk's ids into a vector: SMEM scalars -> per-lane select
        # (chunk is small; the final merge dominates anyway)
        idvec = jnp.zeros((1, chunk), jnp.int32)
        for c in range(chunk):
            idvec = jnp.where(lane == c, ids_ref[b, j * chunk + c], idvec)
        s = jnp.where(idvec >= 0, s, NEG_INF)

        cvals = jnp.concatenate([svals_scr[0:1], s], axis=1)
        cids = jnp.concatenate([sids_scr[0:1], idvec], axis=1)
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

    kernel = _make_kernel(k, chunk, r_pad, scales is not None)

    in_specs = [
        pl.BlockSpec((1, 1, Dp), lambda b, j, ids: (b, 0, 0),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec(memory_space=pltpu.ANY),
    ]
    args = [queries.reshape(B, 1, Dp), vectors]
    scratch = [
        pltpu.VMEM((chunk, Dp), vectors.dtype),
        pltpu.VMEM((1, chunk), jnp.float32),
        pltpu.VMEM((8, k), jnp.float32),
        pltpu.VMEM((8, k), jnp.int32),
        pltpu.SemaphoreType.DMA,
        pltpu.SemaphoreType.DMA,
    ]
    if scales is not None:
        in_specs.append(pl.BlockSpec(memory_space=pltpu.ANY))
        args.append(scales.reshape(1, -1))

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(B, r_pad // chunk),
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
    )(cand_ids.astype(jnp.int32), *args)
    return out[0].reshape(B, k), out[1].reshape(B, k)
