"""Pallas IVF probe kernel: data-dependent list-slab DMA via scalar prefetch.

The jnp IVF path (index/ivf_flat.py) materializes gathered slabs
``[B, nprobe, Lcap, Dp]`` in HBM and re-reads them for the einsum — 2x traffic
plus writes. This kernel uses ``PrefetchScalarGridSpec``: the probe table
[B, nprobe] is prefetched to SMEM, and each grid step's BlockSpec index_map
looks up ``probes[b, j]`` to DMA exactly that packed list slab HBM->VMEM once,
score it on the MXU against query b, and fold it into a VMEM running top-k.
This is the TPU replacement for FAISS's per-list scan loop
(nvdb_ivf_eval.cpp:478-489) — the probe loop is the grid, the DMA engine does
the pointer chasing.

Optimized for the small-batch / low-latency regime: probing reads
nprobe*Lcap rows per query, so at large B a batched flat scan (which shares
one base stream across the whole batch) reads less — same economics as the
reference's IVF-vs-flat trade."""

from __future__ import annotations

import functools
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from nvdb_tpu.kernels.flat_scan import (_merge_topk_sorted, NEG_INF,
                                        POS_INF, K_LANES)


def _make_kernel(k: int, lcap: int, has_scales: bool):
    def kernel(probes_ref, q_ref, slab_ref, sids_ref, *rest):
        if has_scales:
            scale_ref, vals_out, ids_out, vals_scr, ids_scr = rest
        else:
            vals_out, ids_out, vals_scr, ids_scr = rest
            scale_ref = None

        j = pl.program_id(1)

        @pl.when(j == 0)
        def _init():
            vals_scr[:] = jnp.full(vals_scr.shape, NEG_INF, dtype=jnp.float32)
            ids_scr[:] = jnp.full(ids_scr.shape, -1, dtype=jnp.int32)

        q = q_ref[0]                       # [1, Dp]
        slab = slab_ref[0]                 # [Lcap, Dp]
        dims = (((1,), (1,)), ((), ()))
        if slab.dtype == jnp.float32:
            s = jax.lax.dot_general(q, slab, dims,
                                    precision=jax.lax.Precision.HIGHEST,
                                    preferred_element_type=jnp.float32)
        else:
            s = jax.lax.dot_general(q.astype(jnp.bfloat16),
                                    slab.astype(jnp.bfloat16), dims,
                                    preferred_element_type=jnp.float32)
        # ids/scales are pre-laid-out as [1, 1, L] blocks (in-kernel
        # sublane->lane relayout costs ~2us per step)
        if scale_ref is not None:
            s = s * scale_ref[0]                  # [1, Lcap]
        sids = sids_ref[0]                        # [1, Lcap]
        s = jnp.where(sids >= 0, s, NEG_INF)

        # slot-buffer merge with improver count + dynamic extraction (the
        # flat-scan "extract" / ADC gen-2 strategy): a fixed k-round sorted
        # merge per (query, probe) step made every probe pay O(k) VPU
        # passes; with the count only the FIRST probed list (which seeds
        # most of the final top-k) pays ~k rounds, later lists pay their
        # improver count (~1-3). Slot ids are unique across probed lists
        # (each row is packed in exactly one list), so no dup handling.
        lane = jax.lax.broadcasted_iota(jnp.int32, (1, K_LANES), 1)
        live = lane < k
        theta0 = jnp.min(jnp.where(live, vals_scr[0:1], POS_INF), axis=1,
                         keepdims=True)
        cnt = jnp.sum((s > theta0).astype(jnp.int32))
        c = jnp.minimum(cnt, k)

        def body(_, carry):
            s_c, vals_c, ids_c = carry
            mx = jnp.max(s_c, axis=1, keepdims=True)
            idv = jnp.max(jnp.where(s_c == mx, sids, -1), axis=1,
                          keepdims=True)
            s_c = jnp.where(sids == idv, NEG_INF, s_c)
            vmin = jnp.min(jnp.where(live, vals_c, POS_INF), axis=1,
                           keepdims=True)
            ins = mx > vmin
            slot = jnp.max(jnp.where(live & (vals_c == vmin), lane, -1),
                           axis=1, keepdims=True)
            do = ins & (lane == slot)
            vals_c = jnp.where(do, mx, vals_c)
            ids_c = jnp.where(do, idv, ids_c)
            return s_c, vals_c, ids_c

        _, v1, i1 = jax.lax.fori_loop(
            0, c, body, (s, vals_scr[0:1], ids_scr[0:1]))
        vals_scr[0:1] = v1
        ids_scr[0:1] = i1

        @pl.when(j == pl.num_programs(1) - 1)
        def _emit():
            # one-time sort of the slot buffer, descending
            sv, si = _merge_topk_sorted(vals_scr[0:1], ids_scr[0:1], k)
            vals_out[0] = sv
            ids_out[0] = si

    return kernel


@functools.partial(jax.jit, static_argnames=("k", "interpret"))
def pallas_ivf_probe_topk(
    queries: jax.Array,       # [B, Dp] f32
    probes: jax.Array,        # [B, P] int32 list ids to probe, per query
    packed: jax.Array,        # [nlist, Lcap, Dp] f32|bf16|int8
    slot_ids: jax.Array,      # [nlist, Lcap] int32 (-1 padding)
    slot_scales,              # [nlist, Lcap] f32 | None
    k: int,
    interpret: Optional[bool] = None,
) -> Tuple[jax.Array, jax.Array]:
    """Per-query probe of its nprobe packed lists -> exact top-k over the
    probed slabs (dot metric). Same contract as the slab part of
    ivf_flat._ivf_search_block (its oracle)."""
    B, Dp = queries.shape
    nlist, lcap, _ = packed.shape
    P = probes.shape[1]
    if interpret is None:
        interpret = jax.default_backend() != "tpu"

    kernel = _make_kernel(k, lcap, slot_scales is not None)

    in_specs = [
        # queries as [B, 1, Dp] so the (1, 1, Dp) block's trailing dims equal
        # the array dims (Mosaic block-shape rule)
        pl.BlockSpec((1, 1, Dp), lambda b, j, pr: (b, 0, 0),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((1, lcap, Dp), lambda b, j, pr: (pr[b, j], 0, 0),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((1, 1, lcap), lambda b, j, pr: (pr[b, j], 0, 0),
                     memory_space=pltpu.VMEM),
    ]
    args = [queries.reshape(B, 1, Dp), packed, slot_ids.reshape(nlist, 1, lcap)]
    if slot_scales is not None:
        in_specs.append(pl.BlockSpec((1, 1, lcap),
                                     lambda b, j, pr: (pr[b, j], 0, 0),
                                     memory_space=pltpu.VMEM))
        args.append(slot_scales.reshape(nlist, 1, lcap))

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(B, P),
        in_specs=in_specs,
        out_specs=[
            pl.BlockSpec((1, 1, k), lambda b, j, pr: (b, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, k), lambda b, j, pr: (b, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        scratch_shapes=[
            pltpu.VMEM((8, K_LANES), jnp.float32),
            pltpu.VMEM((8, K_LANES), jnp.int32),
        ],
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
    )(probes.astype(jnp.int32), *args)
    return out[0].reshape(B, k), out[1].reshape(B, k)
