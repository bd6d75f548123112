"""Pallas IVF-PQ ADC scan: gather-free table lookups via nibble one-hot matmuls.

The jnp ADC path (pq.adc_scores) materializes [B, P, M, L] gathered LUT slabs
with ``take_along_axis`` — the "gathers are the make-or-break for IVF-PQ
latency" risk SURVEY.md §7 flagged, and the reason round-1 IVF-PQ ran at
13-25 ms. The reference spent its deepest kernel engineering on the same
stage (cuda_refine.cu:326-838); this kernel is the TPU re-design:

- Grid = (query b, probe j). Scalar-prefetched probe table drives the
  BlockSpec index maps, so each step DMAs exactly one packed list's codes
  [M, Lcap] HBM->VMEM (the DMA engine does the pointer chasing).
- The 8-bit code lookup ``lut[m, code]`` is factorized into nibbles
  (code = hi*16 + lo):  score[l] = sum_m  oh_hi[m,:,l]^T @ LUT3[m] @ oh_lo[m,:,l]
  where LUT3 = lut reshaped [M, 16(hi), 16(lo)]. The lo contraction is ONE
  batched-over-M MXU matmul [M,16,16] x [M,16,L]; the hi contraction is an
  elementwise multiply-reduce on the VPU. Building two 16-wide one-hots
  costs 16x fewer vector compares than a direct 256-wide one-hot — the
  construction, not the matmul, is where ADC time goes on a TPU.
- No gathers, no relayouts: codes are stored [nlist, M, Lcap] (list-major,
  subspace rows, slot lanes) so the one-hot broadcast-compare is layout-
  native; the LUT arrives pre-split as [B, P, M, 16, 16].

Precision: the one-hot is exact in bf16; LUT entries are rounded to bf16
for the matmul (~3 decimal digits). ADC scores only rank candidates — the
exact refine stage re-scores survivors in f32 — so the tests gate on
ranking agreement, not bitwise equality, vs the f32 jnp oracle.
"""

from __future__ import annotations

import functools
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from nvdb_tpu.kernels.flat_scan import (_merge_topk_sorted, NEG_INF, POS_INF,
                                        K_LANES)


def _score_list(codes_u8, lut3_bf16, m, lcap, slim: bool = False):
    """ADC scores of one packed list: [M, L] codes x [M, 16, 16] LUT ->
    [1, L] negated L2 (max-is-best), via the nibble one-hot matmul.

    ``slim`` was the ADC generation-3 precision attempt (VERDICT r2 next
    #5): round the one-hot mask and product slabs to bf16 (the matmul
    accumulator must stay f32 — Mosaic rejects bf16 accs). MEASURED
    SLOWER: +3.1 +/- 0.09 ms paired at the flagship shape (B=64, P=64,
    m=96, lcap=1024) — the extra f32->bf16 conversion pass on t
    materializes through VMEM and outweighs the slab savings, and bf16
    elementwise ops are not half-cost on the 32-bit-lane VPU. Kept as an
    A/B flag; default stays the round-2 mixed path."""
    codes = codes_u8.astype(jnp.int32)                       # [M, L]
    lo = (codes & 15)[:, None, :]                            # [M, 1, L]
    hi = (codes >> 4)[:, None, :]
    nib = jax.lax.broadcasted_iota(jnp.int32, (m, 16, lcap), 1)
    oh_lo = (lo == nib).astype(jnp.bfloat16)                 # [M, 16, L]
    if slim:
        # Mosaic requires a 32-bit matmul accumulator (bf16
        # preferred_element_type fails to lower — caught by tpu_smoke), so
        # t stays f32; the one-hot mask and the product round to bf16,
        # halving those two slabs, and the final reduce accumulates f32.
        oh_hi = (hi == nib).astype(jnp.bfloat16)
        t = jax.lax.dot_general(
            lut3_bf16, oh_lo, (((2,), (1,)), ((0,), (0,))),
            preferred_element_type=jnp.float32)              # [M, 16, L]
        prod = (oh_hi * t.astype(jnp.bfloat16)).reshape(m * 16, lcap)
        return -jnp.sum(prod, axis=0, keepdims=True,
                        dtype=jnp.float32)                   # [1, L]
    oh_hi = (hi == nib).astype(jnp.float32)
    # batched over M: t[m, a, l] = sum_b lut3[m, a, b] * oh_lo[m, b, l]
    t = jax.lax.dot_general(
        lut3_bf16, oh_lo, (((2,), (1,)), ((0,), (0,))),
        preferred_element_type=jnp.float32)                  # [M, 16, L]
    # reduce to [1, L] in one sublane reduction over the merged [M*16, L]
    # view — reducing the middle axis of the 3D form makes Mosaic emit a
    # replicated-layout [M, L] intermediate it then fails to relayout
    prod = (oh_hi * t).reshape(m * 16, lcap)
    return -jnp.sum(prod, axis=0, keepdims=True)             # [1, L]


def _make_kernel(k: int, m: int, lcap: int, g: int, slim: bool = False,
                 nch: int = 1, kr: int = 1):
    """g probed lists per grid step: their codes/slot-ids are DMA'd into
    VMEM scratch by scalar-prefetch-driven async copies (aligned: dim 0 of a
    3D HBM ref is untiled), scored one by one, and folded with ONE
    count+extract merge over the concatenated [1, g*L] lane vector — the
    per-step vector->scalar sync and fori_loop setup amortize g-fold.

    ``nch > 1`` is ADC generation 4 (chunk-skipping): the packed-list slab
    trades capacity against spill (§4 of BENCHMARKS), so on repacked
    indexes most slots are padding (flagship p4s8: probed lists average
    16% live). The list is scored in nch chunks of lcap/nch lanes; chunks
    whose start lies beyond the list's fill (1 + last live slot, from the
    second scalar-prefetch operand) skip the one-hot construction and
    matmul entirely under @pl.when — dead lanes keep the NEG_INF the
    score scratch was initialized with, so results are bit-identical to
    the full-width scan."""
    lc = lcap // nch
    def kernel(probes_ref, fills_ref, lut_ref, codes_hbm, sids_hbm,
               vals_out, ids_out, vals_scr, ids_scr, s_scr,
               codes_vmem, sids_vmem, csem, ssem):
        b = pl.program_id(0)
        j = pl.program_id(1)

        @pl.when(j == 0)
        def _init():
            vals_scr[:] = jnp.full(vals_scr.shape, NEG_INF, dtype=jnp.float32)
            ids_scr[:] = jnp.full(ids_scr.shape, -1, dtype=jnp.int32)

        for gi in range(g):
            li = probes_ref[b, j * g + gi]
            pltpu.make_async_copy(codes_hbm.at[pl.ds(li, 1)],
                                  codes_vmem.at[pl.ds(gi, 1)], csem).start()
            pltpu.make_async_copy(sids_hbm.at[pl.ds(li, 1)],
                                  sids_vmem.at[pl.ds(gi, 1)], ssem).start()
        for gi in range(g):
            pltpu.make_async_copy(codes_hbm.at[pl.ds(0, 1)],
                                  codes_vmem.at[pl.ds(0, 1)], csem).wait()
            pltpu.make_async_copy(sids_hbm.at[pl.ds(0, 1)],
                                  sids_vmem.at[pl.ds(0, 1)], ssem).wait()

        if nch == 1:
            parts_s = []
            parts_i = []
            for gi in range(g):
                lut3 = lut_ref[0, 0, gi].astype(jnp.bfloat16)  # [M, 16, 16]
                sg = _score_list(codes_vmem[gi], lut3, m, lcap, slim)  # [1, L]
                sid_g = sids_vmem[gi]                          # [1, L]
                parts_s.append(jnp.where(sid_g >= 0, sg, NEG_INF))
                parts_i.append(sid_g)
            s = jnp.concatenate(parts_s, axis=1)               # [1, g*L]
            sids = jnp.concatenate(parts_i, axis=1)
        else:
            s_scr[:] = jnp.full(s_scr.shape, NEG_INF, dtype=jnp.float32)
            parts_i = []
            for gi in range(g):
                li = probes_ref[b, j * g + gi]
                fill = fills_ref[li]
                lut3 = lut_ref[0, 0, gi].astype(jnp.bfloat16)  # [M, 16, 16]
                for ci in range(nch):
                    @pl.when(ci * lc < fill)
                    def _score_chunk(gi=gi, ci=ci, lut3=lut3):
                        cods = codes_vmem[gi, :, ci * lc:(ci + 1) * lc]
                        sg = _score_list(cods, lut3, m, lc, slim)  # [1, lc]
                        sid_c = sids_vmem[gi, :, ci * lc:(ci + 1) * lc]
                        s_scr[0:1, gi * lcap + ci * lc:
                              gi * lcap + (ci + 1) * lc] = jnp.where(
                                  sid_c >= 0, sg, NEG_INF)
                parts_i.append(sids_vmem[gi])
            s = s_scr[0:1]                                     # [1, g*L]
            sids = jnp.concatenate(parts_i, axis=1)

        _fold_into_slots(s, sids, vals_scr, ids_scr, k, kr)

        @pl.when(j == pl.num_programs(1) - 1)
        def _emit():
            if kr == 1:
                # one-time O(k * K_LANES) sort of the slot buffer, descending
                sv, si = _merge_topk_sorted(vals_scr[0:1], ids_scr[0:1], k)
                vals_out[0] = sv
                ids_out[0] = si
            else:
                # deep-k: emit the UNSORTED [kr, 128] slot rows; the caller
                # top_k's them in XLA (a k-round in-kernel sort at k=256
                # would double the one cost the kr-row design left flat)
                vals_out[0] = vals_scr[0:kr]
                ids_out[0] = ids_scr[0:kr]

    return kernel


def _fold_into_slots(s, sids, vals_scr, ids_scr, k, kr: int = 1):
    """Slot-buffer merge with count + dynamic extraction (the flat-scan
    "extract" strategy, flat_scan.py merge_scr): a fixed k-round sorted
    merge per probe made the per-(b,probe) step cost O(k) VPU passes —
    6400 extraction rounds for P=64, refine_k=100, measured ~35 ms of
    a 39 ms B=8 ANN batch at 1M. With the unsorted buffer + improver
    count, only the FIRST probed list (the coarse-nearest, which seeds
    most of the final top-k) pays ~k rounds; later lists pay ~their
    improver count (1-3 in steady state).

    ``kr > 1`` widens the buffer to kr 128-lane SUBLANE rows (k up to
    kr*128 — the deep-k refine-depth path, VERDICT r3 #2): every
    reduction/select runs over the [kr, 128] tile instead of one lane
    row, the winning slot is addressed by its flattened (row*128+lane)
    position, and the k-th-best threshold / min-slot reduce over both
    axes. Steady-state cost is unchanged (improver counts don't grow
    with buffer width); only the seed list's initial fill pays ~k
    rounds."""
    lane = jax.lax.broadcasted_iota(jnp.int32, (kr, K_LANES), 1)
    pos = lane if kr == 1 else (
        jax.lax.broadcasted_iota(jnp.int32, (kr, K_LANES), 0) * K_LANES
        + lane)
    live = pos < k
    theta0 = jnp.min(jnp.where(live, vals_scr[0:kr], POS_INF),
                     axis=(0, 1), keepdims=True)         # [1, 1]
    cnt = jnp.sum((s > theta0).astype(jnp.int32))
    c = jnp.minimum(cnt, k)                              # traced scalar

    def body(_, carry):
        s_c, vals_c, ids_c = carry
        mx = jnp.max(s_c, axis=1, keepdims=True)         # [1, 1]
        idv = jnp.max(jnp.where(s_c == mx, sids, -1), axis=1,
                      keepdims=True)
        s_c = jnp.where(sids == idv, NEG_INF, s_c)
        # replicated indexes: a copy of idv inserted by an EARLIER probe
        # step may already hold a slot — absorb it (keep the better
        # score, free its slot) instead of occupying a second slot,
        # which would evict a genuine candidate and make the final
        # id-collapsing sort emit -1 filler. idv == -1 (exhausted
        # round) matches only empty slots: zapping them is a no-op and
        # keep below is False.
        dup = ids_c == idv
        old = jnp.max(jnp.where(dup, vals_c, NEG_INF), axis=(0, 1),
                      keepdims=True)
        mx = jnp.maximum(mx, old)
        vals_c = jnp.where(dup, NEG_INF, vals_c)
        ids_c = jnp.where(dup, -1, ids_c)
        vmin = jnp.min(jnp.where(live, vals_c, POS_INF), axis=(0, 1),
                       keepdims=True)
        keep = mx > vmin
        slot = jnp.max(jnp.where(live & (vals_c == vmin), pos, -1),
                       axis=(0, 1), keepdims=True)
        do = keep & (pos == slot)
        vals_c = jnp.where(do, mx, vals_c)
        ids_c = jnp.where(do, idv, ids_c)
        return s_c, vals_c, ids_c

    _, vals1, ids1 = jax.lax.fori_loop(
        0, c, body, (s, vals_scr[0:kr], ids_scr[0:kr]))
    vals_scr[0:kr] = vals1
    ids_scr[0:kr] = ids1


# plain ints: module-level jnp scalars are device arrays, which a pallas
# kernel closure may not capture ("captures constants" trace error) —
# as Python ints they fold into the trace as immediates
IMIN = -2147483648
KMASK = -65536                                    # 0xFFFF0000


def _enc(x):
    """Monotone f32 -> i32 transform (radix-sort sign fix, 3 select-free
    ops — flat_scan.py key merge): non-negatives keep their bits,
    negatives flip their low 31 so the int order equals the float order."""
    b = jax.lax.bitcast_convert_type(x, jnp.int32)
    return jnp.bitwise_xor(
        b, jnp.bitwise_and(jnp.right_shift(b, 31), jnp.int32(0x7FFFFFFF)))


def _dec(kk):
    """Invert _enc on a key's score bits; low 16 id bits are zeroed for
    non-negatives / saturated for negatives first, so the result is the
    TRUNCATED (bf16-precision) score."""
    ksd = jnp.where(kk >= 0, jnp.bitwise_and(kk, KMASK),
                    jnp.bitwise_or(kk, jnp.int32(0xFFFF)))
    bd = jnp.where(ksd >= 0, ksd,
                   jnp.bitwise_not(jnp.bitwise_xor(ksd, IMIN)))
    return jax.lax.bitcast_convert_type(bd, jnp.float32)


def _fold_keys_scr(e, vals_scr, ids_scr, k, coord_base, kr: int = 1):
    """Count + dynamic-extraction fold of packed ``(mono16(score)|lane)``
    int32 keys into the slot buffer (shared by the gen-5 key kernel and the
    gen-6 gathered kernel). Each round is a bare max-reduce + zap — 2
    full-width passes — and the winner's id costs ZERO passes: its packed
    coordinate ``coord_base + (key & 0xFFFF)`` is rebuilt arithmetically
    from the max key and remapped to a row id OUTSIDE the kernel.

    ``kr > 1``: kr-sublane-row slot buffer for k up to kr*128 (deep-k
    candidate generation) — see _fold_into_slots."""
    lane128 = jax.lax.broadcasted_iota(jnp.int32, (kr, K_LANES), 1)
    pos = lane128 if kr == 1 else (
        jax.lax.broadcasted_iota(jnp.int32, (kr, K_LANES), 0) * K_LANES
        + lane128)
    live = pos < k
    theta0 = jnp.min(jnp.where(live, vals_scr[0:kr], POS_INF),
                     axis=(0, 1), keepdims=True)
    tkey = jnp.bitwise_or(jnp.bitwise_and(_enc(theta0), KMASK),
                          jnp.int32(0xFFFF))
    cnt = jnp.sum((e > tkey).astype(jnp.int32))
    c = jnp.minimum(cnt, k)                          # traced scalar

    def body(_, carry):
        e_c, vals_c, ids_c = carry
        kmax = jnp.max(e_c, axis=1, keepdims=True)   # [1, 1]
        e_c = jnp.where(e_c == kmax, IMIN, e_c)
        mval = _dec(kmax)
        coord = jnp.bitwise_and(kmax, jnp.int32(0xFFFF)) + coord_base
        vmin = jnp.min(jnp.where(live, vals_c, POS_INF), axis=(0, 1),
                       keepdims=True)
        ins = (mval > vmin) & (kmax > IMIN)
        slotl = jnp.max(jnp.where(live & (vals_c == vmin),
                                  pos, -1),
                        axis=(0, 1), keepdims=True)
        do = ins & (pos == slotl)
        vals_c = jnp.where(do, mval, vals_c)
        ids_c = jnp.where(do, coord, ids_c)
        return e_c, vals_c, ids_c

    _, v1, i1 = jax.lax.fori_loop(
        0, c, body, (e, vals_scr[0:kr], ids_scr[0:kr]))
    vals_scr[0:kr] = v1
    ids_scr[0:kr] = i1


def _make_kernel_keys(k: int, m: int, lcap: int, g: int, nch: int,
                      total: int, p_orig: int, diag: str = "", kr: int = 1):
    """ADC generation 5: derived slot keys + double-buffered codes DMA.

    Gen-4 profiling bounded scoring at ~1/5 of kernel time at the flagship
    shape (fill-frac 0.01 floor: 27.7 of 31.4 ms); the diag decomposition
    then split the residual into extraction merge 14.1 ms / DMA+grid+LUT
    floor 9.9 ms / scoring 3.8 ms. This variant attacks all three:

    - **No slot-id DMA.** On a prefix-packed index (every packer emits
      prefix-packed lists) the live lanes of list ``li`` are exactly
      ``lane < fill[li]``, so slot ids never enter the kernel: the merge
      tracks (step, lane) COORDINATES and the caller remaps the k winners
      to row ids through probes/slot_ids with one tiny gather. Halves the
      DMA count. Requires unique rows per (list, lane) — the caller must
      fall back to the DMA kernel for replicated indexes.
    - **Cross-step double buffering.** Step t issues the g copies for step
      t+1 into buffer (t+1)%2 BEFORE waiting on its own buffer t%2 (per-
      buffer DMA semaphores), so transfer latency hides under scoring and
      the scalar core's issue stream overlaps the VPU instead of
      serializing with it.
    - **Packed extraction merge.** Scores are packed (mono16(score)|lane)
      into one int32 at chunk-write time; each extraction round is a bare
      max-reduce + zap (2 full-width passes vs 4), and the winner's id is
      arithmetic on the max key — no id-select pass, no id vector at all.
      Ranking precision is bf16 (documented; the bf16 LUT matmul already
      imposes the same granularity, and refine re-scores in f32).

    Chunk gating (gen-4 ``nch``) is kept: chunks beyond the fill skip
    construction+matmul under pl.when."""
    lc = lcap // nch

    def kernel(probes_ref, fills_ref, lut_ref, codes_hbm,
               vals_out, ids_out, vals_scr, ids_scr, s_scr,
               codes_vmem, csem):
        b = pl.program_id(0)
        j = pl.program_id(1)
        nj = pl.num_programs(1)
        t = b * nj + j
        slot = jax.lax.rem(t, 2)

        def issue(tn):
            bn = jax.lax.div(tn, nj)
            jn = jax.lax.rem(tn, nj)
            sn = jax.lax.rem(tn, 2)
            for gi in range(g):
                li = probes_ref[bn, jn * g + gi]
                pltpu.make_async_copy(
                    codes_hbm.at[pl.ds(li, 1)],
                    codes_vmem.at[pl.ds(sn * g + gi, 1)],
                    csem.at[sn]).start()

        @pl.when(t == 0)
        def _warm():
            issue(t)

        @pl.when(t + 1 < total)
        def _ahead():
            issue(t + 1)

        for _ in range(g):
            pltpu.make_async_copy(codes_hbm.at[pl.ds(0, 1)],
                                  codes_vmem.at[pl.ds(0, 1)],
                                  csem.at[slot]).wait()

        @pl.when(j == 0)
        def _init():
            vals_scr[:] = jnp.full(vals_scr.shape, NEG_INF, dtype=jnp.float32)
            ids_scr[:] = jnp.full(ids_scr.shape, -1, dtype=jnp.int32)

        # ---- packed scoring: s_scr holds (mono16(score) | lane) i32 keys.
        # The gen-5 diag decomposition put the extraction merge at 14.1 of
        # 27.8 ms (nomerge 13.6, noscore 9.9 — bench_artifacts/
        # adc_gen5_diag.txt); packing score+lane into one int32 (the
        # flat-scan "key" idea) halves each round's full-width passes to
        # max-reduce + zap, and the winner's id costs ZERO passes: its
        # coordinate j*W+lane is rebuilt arithmetically from the max key
        # and remapped to a row id OUTSIDE the kernel via probes/slot_ids.
        # Ranking precision is bf16 (score truncated to 16 bits) — the
        # same granularity the bf16 LUT matmul already imposes; refine
        # re-scores survivors in f32.
        pad_gate = (p_orig % g != 0)
        s_scr[:] = jnp.full(s_scr.shape, IMIN, dtype=jnp.int32)
        for gi in range(g):
            li = probes_ref[b, j * g + gi]
            fill = fills_ref[li]
            lut3 = lut_ref[0, 0, gi].astype(jnp.bfloat16)    # [M, 16, 16]
            if diag == "noscore":
                continue
            for ci in range(nch):
                # pad columns (duplicated last probe when P % g != 0) are
                # statically masked: packed coordinates are unique per
                # (step, lane), so a pad duplicate would occupy a second
                # slot — unlike the DMA kernel's id-equality absorption
                cond = (ci * lc < fill)
                if pad_gate:
                    cond = cond & (j * g + gi < p_orig)

                @pl.when(cond)
                def _score_chunk(gi=gi, ci=ci, lut3=lut3, fill=fill):
                    cods = codes_vmem[slot * g + gi, :,
                                      ci * lc:(ci + 1) * lc]
                    sg = _score_list(cods, lut3, m, lc)      # [1, lc]
                    lane = jax.lax.broadcasted_iota(
                        jnp.int32, (1, lc), 1) + ci * lc
                    keyv = jnp.bitwise_or(
                        jnp.bitwise_and(_enc(sg), KMASK),
                        gi * lcap + lane)
                    s_scr[0:1, gi * lcap + ci * lc:
                          gi * lcap + (ci + 1) * lc] = jnp.where(
                              lane < fill, keyv, IMIN)
        e = s_scr[0:1]                                       # [1, W] keys

        if diag == "nomerge":
            # diagnostic: consume the keys without the slot-buffer merge
            # (measures the merge's share of kernel time; results WRONG by
            # design — reachable only through the explicit diag= argument,
            # never the serving path)
            vals_scr[0:1] = jnp.maximum(
                vals_scr[0:1],
                _dec(jnp.max(e)) + 0.0 * vals_scr[0:1])
        else:
            _fold_keys_scr(e, vals_scr, ids_scr, k, j * (g * lcap), kr)

        @pl.when(j == nj - 1)
        def _emit():
            if kr == 1:
                sv, si = _merge_topk_sorted(vals_scr[0:1], ids_scr[0:1], k)
                vals_out[0] = sv
                ids_out[0] = si
            else:
                vals_out[0] = vals_scr[0:kr]   # unsorted; caller top_k's
                ids_out[0] = ids_scr[0:kr]

    return kernel


def _make_kernel_gather(k: int, m: int, lcap: int, g: int, nch: int,
                        p_orig: int, diag: str = "", kr: int = 1):
    """ADC generation 6: XLA-gathered codes, zero in-kernel DMA issue.

    The gen-5 diag decomposition left a ~10 ms "DMA+grid floor" at the
    flagship shape (B=64, P=64, g=4): ~4096 scalar-issued per-list copies
    at ~2.4 us each — per-COPY issue cost on the scalar core, not bytes
    (the 402 MB of probed slabs stream in ~0.5 ms at nameplate; measured
    g=8 ~= g=4 ruled out per-STEP overhead). This variant moves the
    pointer-chasing out of the kernel entirely: the caller gathers the
    probed slabs into a contiguous ``[B*P, M, Lcap]`` array with ONE XLA
    gather (measured ~1.5 ms fitted at the flagship shape — 98 KB
    contiguous rows gather at memcpy speed), and the kernel becomes a
    plain Mosaic-pipelined grid: one contiguous [g, M, Lcap] block DMA
    per step, issued and double-buffered by the pipeline prologue — g
    times fewer, g times larger transfers, and no scalar-core address
    computation from the probe table.

    Scoring, chunk gating, and the packed-key extraction merge are the
    gen-5 body unchanged (``_score_list`` / ``_fold_keys_scr``); ids are
    derived coordinates remapped outside, so the same preconditions apply
    (prefix-packed index, replicas == 1)."""
    lc = lcap // nch

    def kernel(probes_ref, fills_ref, lut_ref, codes_ref,
               vals_out, ids_out, vals_scr, ids_scr, s_scr):
        b = pl.program_id(0)
        j = pl.program_id(1)
        nj = pl.num_programs(1)

        @pl.when(j == 0)
        def _init():
            vals_scr[:] = jnp.full(vals_scr.shape, NEG_INF, dtype=jnp.float32)
            ids_scr[:] = jnp.full(ids_scr.shape, -1, dtype=jnp.int32)

        pad_gate = (p_orig % g != 0)
        s_scr[:] = jnp.full(s_scr.shape, IMIN, dtype=jnp.int32)
        for gi in range(g):
            li = probes_ref[b, j * g + gi]
            fill = fills_ref[li]
            lut3 = lut_ref[0, 0, gi].astype(jnp.bfloat16)    # [M, 16, 16]
            if diag == "noscore":
                continue
            for ci in range(nch):
                cond = (ci * lc < fill)
                if pad_gate:
                    cond = cond & (j * g + gi < p_orig)

                @pl.when(cond)
                def _score_chunk(gi=gi, ci=ci, lut3=lut3, fill=fill):
                    cods = codes_ref[gi, :, ci * lc:(ci + 1) * lc]
                    sg = _score_list(cods, lut3, m, lc)      # [1, lc]
                    lane = jax.lax.broadcasted_iota(
                        jnp.int32, (1, lc), 1) + ci * lc
                    keyv = jnp.bitwise_or(
                        jnp.bitwise_and(_enc(sg), KMASK),
                        gi * lcap + lane)
                    s_scr[0:1, gi * lcap + ci * lc:
                          gi * lcap + (ci + 1) * lc] = jnp.where(
                              lane < fill, keyv, IMIN)
        e = s_scr[0:1]                                       # [1, W] keys

        if diag == "nomerge":
            vals_scr[0:1] = jnp.maximum(
                vals_scr[0:1],
                _dec(jnp.max(e)) + 0.0 * vals_scr[0:1])
        else:
            _fold_keys_scr(e, vals_scr, ids_scr, k, j * (g * lcap), kr)

        @pl.when(j == nj - 1)
        def _emit():
            if kr == 1:
                sv, si = _merge_topk_sorted(vals_scr[0:1], ids_scr[0:1], k)
                vals_out[0] = sv
                ids_out[0] = si
            else:
                vals_out[0] = vals_scr[0:kr]   # unsorted; caller top_k's
                ids_out[0] = ids_scr[0:kr]

    return kernel


def is_prefix_packed(slot_ids: jax.Array) -> jax.Array:
    """True iff every list's live slots are exactly a prefix — the
    contract the gen-5 key kernel's ``lane < fill`` masking relies on.
    All packers emit prefix-packed lists; this is the cheap runtime
    guard callers use before selecting ids_mode='key'."""
    live = slot_ids >= 0
    fills = list_fills(slot_ids)
    lane = jnp.arange(slot_ids.shape[1], dtype=jnp.int32)[None, :]
    return jnp.all(live == (lane < fills[:, None]))


def list_fills(slot_ids: jax.Array) -> jax.Array:
    """Per-list fill = 1 + index of the LAST live slot (0 if none). Robust
    to interior holes: chunk-skipping only assumes live slots lie below
    fill, not that they are prefix-packed (the packers do prefix-pack)."""
    live = slot_ids >= 0
    last = slot_ids.shape[1] - jnp.argmax(live[:, ::-1], axis=1)
    return jnp.where(live.any(axis=1), last, 0).astype(jnp.int32)


def _auto_chunk(lcap: int) -> int:
    """Chunk width for the gen-4 skip loop: 256 lanes when the capacity
    splits into >=2 chunks, else full width (no skipping possible)."""
    return 256 if (lcap % 256 == 0 and lcap >= 512) else lcap


@functools.partial(jax.jit,
                   static_argnames=("k", "g", "slim", "chunk", "ids_mode",
                                    "diag", "interpret"))
def pallas_adc_topk(
    lut: jax.Array,        # [B, P, M, 16, 16] f32 ADC tables (hi, lo split)
    probes: jax.Array,     # [B, P] int32 probed list ids
    codes_t: jax.Array,    # [nlist, M, Lcap] uint8 (transposed PQ codes)
    slot_ids: jax.Array,   # [nlist, Lcap] int32 (-1 padding)
    k: int,
    g: int = 4,            # probed lists folded per grid step
    slim: bool = False,    # bf16 intermediates: measured SLOWER, A/B only
    fills: Optional[jax.Array] = None,  # [nlist] int32 (list_fills)
    chunk: Optional[int] = None,  # skip-chunk lanes; 0 = full width; None = auto
    ids_mode: str = "dma",  # "dma": DMA slot_ids; "key": gen-5 derived keys
    diag: str = "",        # "nomerge"/"noscore": WRONG-result timing probes
    interpret: Optional[bool] = None,
) -> Tuple[jax.Array, jax.Array]:
    """Top-k ADC candidates over each query's probed lists. Scores are
    negated L2 ADC distances (larger is better). Oracle: pq.adc_scores.

    ``ids_mode='key'`` (generation 5) requires a PREFIX-PACKED index
    (``is_prefix_packed``) with globally unique slot ids (replicas == 1);
    callers must guard. It skips the slot-id DMA (ids derived in-kernel as
    ``list*lcap + lane`` and remapped here after the call) and
    double-buffers the codes DMA across grid steps.

    ``ids_mode='gather'`` (generation 6) keeps gen-5's derived ids and
    packed merge but replaces the in-kernel per-list DMAs with one XLA
    gather of the probed slabs into ``[B*P, M, Lcap]`` — zero scalar-core
    DMA issue in the kernel (see ``_make_kernel_gather``). Same
    preconditions as 'key'."""
    B, P = probes.shape
    nlist, m, lcap = codes_t.shape
    # k > 128 widens the slot buffer to ceil(k/128) sublane rows (the
    # scratch allocates 8 = the VPU tile height, so k caps at 1024); the
    # kernels then emit UNSORTED slots and the top-k sort happens here in
    # XLA. Deep k exists for CANDIDATE GENERATION past the refine-depth
    # ceiling (VERDICT r3 #2) — extraction stays count-driven, so only the
    # seed list's fill pays the deeper buffer.
    kr = -(-k // K_LANES)
    if kr > 8:
        raise ValueError(f"k={k} exceeds the 8x{K_LANES}-slot ADC buffer")
    if ids_mode not in ("dma", "key", "gather"):
        raise ValueError(
            f"ids_mode must be 'dma', 'key' or 'gather', got {ids_mode}")
    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    if chunk is None:
        chunk = _auto_chunk(lcap)
    if chunk <= 0 or chunk > lcap or lcap % chunk != 0:
        chunk = lcap
    nch = lcap // chunk
    if fills is None:
        fills = (list_fills(slot_ids) if (nch > 1 or ids_mode != "dma")
                 else jnp.zeros((nlist,), jnp.int32))
    if nch == 1 and ids_mode == "dma":
        # full-width scan never reads fills; pin them so the cache key of
        # the jitted wrapper doesn't churn on caller-provided variants
        fills = jnp.zeros((nlist,), jnp.int32)

    g = max(1, min(g, P))
    p_orig = P
    if P % g != 0:
        # pad the probe axis by repeating the last probe: a duplicated list
        # contributes duplicate (id, score) pairs, which the DMA kernel's
        # extraction merge collapses by id; the key kernel instead masks
        # the pad columns statically (packed coordinates are unique)
        pad = g - P % g
        probes = jnp.concatenate(
            [probes, jnp.repeat(probes[:, -1:], pad, axis=1)], axis=1)
        lut = jnp.concatenate(
            [lut, jnp.repeat(lut[:, -1:], pad, axis=1)], axis=1)
        P += pad

    # validate diag/ids_mode BEFORE the pinlut branch clears diag: with the
    # default ids_mode='dma', diag='pinlut' used to slip past the guard
    # below and silently return wrong results (ADVICE r3)
    if diag and ids_mode == "dma":
        raise ValueError("diag timing probes exist only for the key/gather "
                         "derived-id kernels")
    if diag == "pinlut":
        # timing probe: pin the LUT block index so Mosaic's revisit
        # optimization skips the per-step [1,1,g,M,16,16] copy (~196 KB
        # bf16 per grid step). Results are WRONG by design — every step
        # scores against step (0,0)'s tables; the arm isolates the LUT
        # operand pipeline's share of kernel time (adc_ab --diag pinlut).
        lut_spec = pl.BlockSpec((1, 1, g, m, 16, 16),
                                lambda b, j, *pr: (0, 0, 0, 0, 0, 0),
                                memory_space=pltpu.VMEM)
        diag = ""
    else:
        lut_spec = pl.BlockSpec((1, 1, g, m, 16, 16),
                                lambda b, j, *pr: (b, j, 0, 0, 0, 0),
                                memory_space=pltpu.VMEM)
    ow = k if kr == 1 else K_LANES   # kr>1: raw [kr, 128] slot rows out
    out_specs = [
        pl.BlockSpec((1, kr, ow), lambda b, j, *pr: (b, 0, 0),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((1, kr, ow), lambda b, j, *pr: (b, 0, 0),
                     memory_space=pltpu.VMEM),
    ]
    out_shape = [
        jax.ShapeDtypeStruct((B, kr, ow), jnp.float32),
        jax.ShapeDtypeStruct((B, kr, ow), jnp.int32),
    ]

    def _finish(vals_raw, ids_raw):
        """kr==1: kernels emit sorted [B, 1, k] already. kr>1: top-k the
        raw slot rows (empty slots carry -inf/-1 and sort last, preserving
        the scarce-candidates filler contract)."""
        if kr == 1:
            return vals_raw.reshape(B, k), ids_raw.reshape(B, k)
        v, sel = jax.lax.top_k(vals_raw.reshape(B, kr * K_LANES), k)
        i = jnp.take_along_axis(ids_raw.reshape(B, kr * K_LANES), sel,
                                axis=1)
        return v, jnp.where(v > NEG_INF, i, -1)
    params = pltpu.CompilerParams(
        dimension_semantics=("arbitrary", "arbitrary"))

    if ids_mode in ("key", "gather"):
        if ids_mode == "key":
            kernel = _make_kernel_keys(k, m, lcap, g, nch, B * (P // g),
                                       p_orig, diag, kr)
            grid_spec = pltpu.PrefetchScalarGridSpec(
                num_scalar_prefetch=2,
                grid=(B, P // g),
                in_specs=[lut_spec, pl.BlockSpec(memory_space=pl.ANY)],
                out_specs=out_specs,
                scratch_shapes=[
                    pltpu.VMEM((8, K_LANES), jnp.float32),
                    pltpu.VMEM((8, K_LANES), jnp.int32),
                    pltpu.VMEM((1, g * lcap), jnp.int32),    # packed keys
                    pltpu.VMEM((2 * g, m, lcap), jnp.uint8),
                    pltpu.SemaphoreType.DMA((2,)),
                ],
            )
            out = pl.pallas_call(
                kernel, grid_spec=grid_spec, out_shape=out_shape,
                compiler_params=params, interpret=interpret,
            )(probes.astype(jnp.int32), fills.astype(jnp.int32),
              lut.reshape(B, P // g, g, m, 16, 16), codes_t)
        else:
            # gen-6: ONE XLA gather replaces B*P scalar-issued list copies;
            # the kernel reads plain pipelined [g, M, Lcap] blocks
            gcodes = jnp.take(codes_t, probes.reshape(-1).astype(jnp.int32),
                              axis=0)                  # [B*P, M, Lcap]
            npg = P // g
            codes_spec = pl.BlockSpec(
                (g, m, lcap), lambda b, j, *pr: (b * npg + j, 0, 0),
                memory_space=pltpu.VMEM)
            kernel = _make_kernel_gather(k, m, lcap, g, nch, p_orig, diag,
                                         kr)
            grid_spec = pltpu.PrefetchScalarGridSpec(
                num_scalar_prefetch=2,
                grid=(B, npg),
                in_specs=[lut_spec, codes_spec],
                out_specs=out_specs,
                scratch_shapes=[
                    pltpu.VMEM((8, K_LANES), jnp.float32),
                    pltpu.VMEM((8, K_LANES), jnp.int32),
                    pltpu.VMEM((1, g * lcap), jnp.int32),    # packed keys
                ],
            )
            out = pl.pallas_call(
                kernel, grid_spec=grid_spec, out_shape=out_shape,
                compiler_params=params, interpret=interpret,
            )(probes.astype(jnp.int32), fills.astype(jnp.int32),
              lut.reshape(B, P // g, g, m, 16, 16), gcodes)
        # coordinates (j*W + w) -> row ids: one [B, k] remap through the
        # probe table and the flat slot-id array (no in-kernel id DMA)
        vals_k, keys = _finish(out[0], out[1])
        W = g * lcap
        kk_ = jnp.clip(keys, 0)
        w = kk_ % W
        p = (kk_ // W) * g + w // lcap
        li = jnp.take_along_axis(probes.astype(jnp.int32), p, axis=1)
        ids = jnp.where(
            keys >= 0,
            jnp.take(slot_ids.reshape(-1).astype(jnp.int32),
                     li * lcap + w % lcap, axis=0),
            -1)
        return vals_k, ids

    kernel = _make_kernel(k, m, lcap, g, slim, nch, kr)
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,
        grid=(B, P // g),
        in_specs=[
            lut_spec,
            pl.BlockSpec(memory_space=pl.ANY),
            pl.BlockSpec(memory_space=pl.ANY),
        ],
        out_specs=out_specs,
        scratch_shapes=[
            pltpu.VMEM((8, K_LANES), jnp.float32),
            pltpu.VMEM((8, K_LANES), jnp.int32),
            pltpu.VMEM((1, g * lcap), jnp.float32),
            pltpu.VMEM((g, m, lcap), jnp.uint8),
            pltpu.VMEM((g, 1, lcap), jnp.int32),
            pltpu.SemaphoreType.DMA,
            pltpu.SemaphoreType.DMA,
        ],
    )
    out = pl.pallas_call(
        kernel, grid_spec=grid_spec, out_shape=out_shape,
        compiler_params=params, interpret=interpret,
    )(probes.astype(jnp.int32), fills.astype(jnp.int32),
      lut.reshape(B, P // g, g, m, 16, 16), codes_t,
      slot_ids.reshape(nlist, 1, lcap).astype(jnp.int32))
    return _finish(out[0], out[1])
