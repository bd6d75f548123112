"""Real-TPU smoke gate: tiny fixed configs through every Pallas kernel,
asserting oracle agreement — run BEFORE committing kernel changes.

All 154 CPU tests run Pallas in interpret mode, which does NOT check
Mosaic block/layout rules (CLAUDE.md); a kernel edit can pass the suite
and still fail to lower on TPU (round-3 example: the extract16 merge
passed interpret fuzz and died in Mosaic relayout). This script is the
automated lowering + correctness gate (VERDICT r2 next #6): shapes are
FIXED so after the first run everything hits the persistent compile
cache (<2 min); exit code 0 = all kernels lower and agree with their
jnp oracles.

Usage: PYTHONPATH=/root/repo python scripts/tpu_smoke.py
"""

import sys
import time

import numpy as np

T0 = time.time()


def ok(name, cond, detail=""):
    stamp = f"[{time.time()-T0:6.1f}s]"
    if cond:
        print(f"{stamp} PASS {name} {detail}", flush=True)
    else:
        print(f"{stamp} FAIL {name} {detail}", flush=True)
        sys.exit(1)


def main():
    import argparse
    ap = argparse.ArgumentParser()
    ap.add_argument("--cpu", action="store_true",
                    help="interpret-mode dry run (lowering check VOID)")
    args = ap.parse_args()

    import jax
    if args.cpu:
        jax.config.update("jax_platforms", "cpu")
    jax.config.update("jax_compilation_cache_dir", "/tmp/nvdb_jax_bench_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    import jax.numpy as jnp

    from nvdb_tpu.kernels import ops
    from nvdb_tpu.kernels.flat_scan import pallas_flat_topk
    from nvdb_tpu.kernels.rerank import pallas_rerank, store_norms2

    on_tpu = jax.default_backend() == "tpu"
    print(f"backend={jax.default_backend()} devices={jax.devices()}",
          flush=True)
    if not on_tpu:
        print("WARNING: not on TPU — kernels run in interpret mode, the "
              "lowering check this script exists for is VOID", flush=True)

    rng = np.random.default_rng(0)
    N, D, B, k = 16384, 256, 8, 10
    base = rng.standard_normal((N, D)).astype(np.float32)
    base /= np.linalg.norm(base, axis=1, keepdims=True)
    q = jnp.asarray(base[:B] + 0.01 * rng.standard_normal((B, D)).astype(
        np.float32))

    # ---- flat scan: dtype ladder x merge modes ---------------------------
    bf = jnp.asarray(base).astype(jnp.bfloat16)
    amax = np.abs(base).max(axis=1)
    sc = (amax / 127).astype(np.float32)
    i8 = jnp.asarray(np.clip(np.round(base / sc[:, None]), -127, 127
                             ).astype(np.int8))
    scj = jnp.asarray(sc)

    jv, ji = ops.scan_topk(q, jnp.asarray(base), None, N, k)
    ji = np.asarray(ji)

    # score-REGRET gate (VERDICT r3 weak #7): bare id-overlap thresholds
    # pass a genuine ranking regression that stays inside the tolerance
    # band. Instead: re-score the returned ids under the mode's EFFECTIVE
    # store in f64 and require achieved-score-at-rank >= oracle-score-at-
    # rank - tol, where tol is the mode's score granularity (0 for f32
    # paths, ~1 bf16 ulp of the ~1.0 score scale for bf16-granular modes).
    # A deliberate off-by-one tile id returns ids whose true scores sit far
    # below the oracle's — regret catches it at any overlap level.
    q64 = np.asarray(q, np.float64)

    def regret(ids, eff64, q_eff=None):
        s64 = (q64 if q_eff is None else q_eff) @ eff64.T      # [B, N]
        ach = -np.sort(-np.take_along_axis(
            s64, np.asarray(ids, np.int64), axis=1), axis=1)   # [B, k]
        ref = -np.sort(-s64, axis=1)[:, :k]
        return float((ref - ach).max())

    eff_f32 = base.astype(np.float64)
    eff_bf16 = np.asarray(bf, np.float64)
    eff_i8 = (np.asarray(i8, np.float64) * sc[:, None].astype(np.float64))

    for name, (qq, vecs, s, merge, eff, tol) in {
        # f32 path ranks exactly: zero regret up to f32 summation noise
        "flat_f32_extract": (q, jnp.asarray(base), None, "extract",
                             eff_f32, 1e-5),
        # bf16 store, f32 accumulate: regret <= ~1 bf16 ulp at |s|~1
        "flat_bf16_extract": (q, bf, None, "extract", eff_bf16, 4.5e-3),
        "flat_bf16_key": (q, bf, None, "key", eff_bf16, 4.5e-3),
        # i8 store: kernel scores q(bf16) x dequant rows — bf16 granular
        "flat_i8_extract": (q, i8, scj, "extract", eff_i8, 4.5e-3),
    }.items():
        pv, pi = pallas_flat_topk(qq, vecs, s, N, k, tile_rows=2048,
                                  merge=merge)
        r = regret(pi, eff)
        ok(name, r <= tol, f"score_regret={r:.2e} (tol {tol:.0e})")

    # qi8 (int8 queries, int8 store): oracle uses the QUANTIZED queries too
    qa = jnp.max(jnp.abs(q), axis=1)
    qs = jnp.where(qa > 0, qa / 127.0, 1.0)
    qi = jnp.clip(jnp.round(q / qs[:, None]), -127, 127).astype(jnp.int8)
    pv, pi = pallas_flat_topk(qi, i8, scj, N, k, tile_rows=2048,
                              query_scales=qs)
    q_eff = (np.asarray(qi, np.float64) * np.asarray(qs, np.float64)[:, None])
    r = regret(pi, eff_i8, q_eff=q_eff)
    ok("flat_qi8_extract", r <= 4.5e-3, f"score_regret={r:.2e}")

    # ---- rerank kernel ---------------------------------------------------
    R = 64
    cand = np.stack([rng.choice(N, R, replace=False) for _ in range(B)]
                    ).astype(np.int32)
    n2 = jax.jit(store_norms2)(bf)
    pv, pi = pallas_rerank(q, jnp.asarray(cand), bf, None, k, norms2=n2)
    eff = np.asarray(bf, dtype=np.float32)
    rows = jnp.asarray(eff[cand])
    jv2, ji2 = ops.exact_rerank(q, rows, jnp.asarray(cand), k)
    m = np.mean(np.asarray(pi) == np.asarray(ji2))
    ok("rerank_bf16", m == 1.0, f"id_match={m:.3f}")

    # rerank over a RESIDUAL-i8 store: the affine fold adds q.cent via
    # boff — new XLA-side coefficients + the same kernel; compare against
    # the jnp dequant oracle over cent + s*codes
    kc = 64
    rngr = np.random.default_rng(3)
    cent_of = rngr.integers(0, kc, N).astype(np.int32)
    r_cents = base[rngr.choice(N, kc, replace=False)].astype(np.float32) * 0.9
    resid = base - r_cents[cent_of]
    ram = np.abs(resid).max(axis=1)
    rsc = (np.maximum(ram, 1e-12) / 127).astype(np.float32)
    rcodes = np.clip(np.round(resid / rsc[:, None]), -127, 127).astype(np.int8)
    deq = r_cents[cent_of] + rcodes.astype(np.float32) * rsc[:, None]
    from nvdb_tpu.store.store import _residual_norms2
    n2r = _residual_norms2(jnp.asarray(rcodes), jnp.asarray(rsc),
                           jnp.asarray(r_cents), jnp.asarray(cent_of))
    pv, pi = pallas_rerank(q, jnp.asarray(cand), jnp.asarray(rcodes),
                           jnp.asarray(rsc), k, norms2=n2r, metric="l2",
                           res_cents=jnp.asarray(r_cents),
                           res_ids=jnp.asarray(cent_of))
    jv3, ji3 = ops.exact_rerank(q, jnp.asarray(deq[cand]), jnp.asarray(cand),
                                k, metric="l2")
    m = np.mean(np.asarray(pi) == np.asarray(ji3))
    ok("rerank_residual_i8", m == 1.0, f"id_match={m:.3f}")

    # ---- IVF probe kernel ------------------------------------------------
    from nvdb_tpu.index.ivf_flat import IVFFlatIndex

    ivf = IVFFlatIndex.build(base, nlist=16, dtype="bf16", train_size=N,
                             n_iters=3, seed=1)
    qp = np.zeros((B, ivf.centroids.shape[1]), np.float32)
    qp[:, :D] = np.asarray(q)
    vj, ij = ivf.search_device(jnp.asarray(qp), k, nprobe=16, backend="jnp")
    vp, ip = ivf.search_device(jnp.asarray(qp), k, nprobe=16,
                               backend="pallas")
    # same probes, same bf16 payload: the pallas kernel's achieved true
    # scores may trail the jnp block's only by its bf16 query rounding
    sj = -np.sort(-np.take_along_axis(
        q64 @ eff_bf16.T, np.asarray(ij, np.int64), axis=1), axis=1)
    sp = -np.sort(-np.take_along_axis(
        q64 @ eff_bf16.T, np.asarray(ip, np.int64), axis=1), axis=1)
    r = float((sj - sp).max())
    ok("ivf_probe_bf16", r <= 4.5e-3, f"score_regret={r:.2e}")

    # ---- ADC kernel (+ fused refine path) --------------------------------
    from nvdb_tpu.index.ivf_pq import IVFPQIndex
    from nvdb_tpu.store import VectorStore

    pqi = IVFPQIndex.build(base, nlist=16, m=16, use_opq=False,
                           train_size=N, n_iters=3, seed=2)
    vj, ij = pqi.search_device(jnp.asarray(qp), k, nprobe=16, backend="jnp")
    vp, ip = pqi.search_device(jnp.asarray(qp), k, nprobe=16,
                               backend="pallas")
    # ADC rankings agree modulo bf16 LUT rounding near ties
    m = np.mean(np.asarray(ip) == np.asarray(ij))
    ok("adc_scan", m >= 0.8, f"id_match={m:.3f}")

    # gen-4 chunk-skip: chunked scan must be BIT-identical to full width
    # (skipped chunks are padding lanes the full scan masks to NEG_INF)
    from nvdb_tpu.kernels import adc_scan
    from nvdb_tpu.kernels import pq as pqk
    q_rot = (jnp.asarray(qp) @ pqi.rotation if pqi.rotation is not None
             else jnp.asarray(qp))
    qc = jnp.dot(q_rot, pqi.centroids.T)
    c2 = jnp.sum(pqi.centroids * pqi.centroids, axis=1)[None, :]
    _, probes = jax.lax.top_k(2.0 * qc - c2, 8)
    cents_p = jnp.take(pqi.centroids, probes, axis=0)
    lut = pqk.adc_lut((q_rot[:, None, :] - cents_p).reshape(-1,
                                                           q_rot.shape[1]),
                      pqi.codebooks, pqi.m)
    lut = lut.reshape(B, 8, pqi.m, 16, 16)
    lc = pqi.lcap
    ch = max(lc // 4, 8)
    fv, fi = adc_scan.pallas_adc_topk(lut, probes, pqi.codes, pqi.slot_ids,
                                      k, g=4, chunk=lc)
    cv, ci = adc_scan.pallas_adc_topk(lut, probes, pqi.codes, pqi.slot_ids,
                                      k, g=4, chunk=ch, fills=pqi.fills())
    bit = (np.array_equal(np.asarray(fv), np.asarray(cv))
           and np.array_equal(np.asarray(fi), np.asarray(ci)))
    ok("adc_chunk_skip", bit, f"lcap={lc} chunk={ch}")

    # f64 ADC oracle over the COVERED (probed) slots — the regret yardstick
    # for every ids_mode (VERDICT r4 #5: the old overlap>=0.9 /
    # bit-identical-to-key gates inherit a 5% id-churn band a genuine merge
    # bug can hide inside; achieved-score regret vs the exact oracle
    # catches e.g. a deliberate _fold_keys_scr mis-ranking at ANY overlap).
    # The kernels' only legitimate approximations are bf16 LUT rounding
    # (all modes) + bf16 score packing (key/gather); both are O(1 bf16 ulp)
    # of the ~1-scale ADC score, so the tolerance is a tight 1.5e-2.
    lut64 = np.asarray(lut, np.float64)
    probes_np = np.asarray(probes)
    codes_np = np.asarray(pqi.codes)
    sids_np = np.asarray(pqi.slot_ids)
    adc64 = np.full((B, N), -np.inf)
    marange = np.arange(pqi.m)[:, None]
    for b in range(B):
        for p in range(probes_np.shape[1]):
            li = int(probes_np[b, p])
            cl = codes_np[li]  # [M, Lcap]
            # lut entries are per-subspace L2 distances; the kernels rank by
            # NEGATED sums (larger-better, kernels/pq.py adc_scores)
            s_bp = -lut64[b, p, marange, cl >> 4, cl & 15].sum(0)
            live = sids_np[li] >= 0
            adc64[b, sids_np[li][live]] = s_bp[live]

    def adc_regret(ids):
        ids = np.asarray(ids, np.int64)
        ach = -np.sort(-np.take_along_axis(adc64, ids, axis=1), axis=1)
        ref = -np.sort(-adc64, axis=1)[:, : ids.shape[1]]
        return float((ref - ach).max())

    r = adc_regret(ci)
    ok("adc_dma_regret", r <= 1.5e-2, f"ids_mode=dma score_regret={r:.2e}")

    # gen-5 key mode: packed score|lane keys + double-buffered codes DMA.
    # Exercises dynamic-slot scratch reads, DMA semaphore arrays,
    # cross-step prefetch, packed extraction — none checkable off-TPU.
    kv2, ki2 = adc_scan.pallas_adc_topk(lut, probes, pqi.codes,
                                        pqi.slot_ids, k, g=4, chunk=ch,
                                        fills=pqi.fills(), ids_mode="key")
    kv2, ki2 = np.asarray(kv2), np.asarray(ki2)
    uniq = all(len(set(ki2[r].tolist())) == k and (ki2[r] >= 0).all()
               for r in range(B))
    r = adc_regret(ki2)
    close = np.allclose(kv2, np.asarray(cv), rtol=1e-2, atol=1e-2)
    ok("adc_key_mode", r <= 1.5e-2 and uniq and close,
       f"ids_mode=key score_regret={r:.2e} lcap={lc} chunk={ch}")

    # gen-6 gather mode: XLA-gathered codes + plain pipelined block DMA.
    # Judged against the oracle in its own right (not merely
    # bit-identical-to-key); exercises the gathered BlockSpec index map.
    gv, gi = adc_scan.pallas_adc_topk(lut, probes, pqi.codes,
                                      pqi.slot_ids, k, g=4, chunk=ch,
                                      fills=pqi.fills(), ids_mode="gather")
    gi = np.asarray(gi)
    uniq = all(len(set(gi[r].tolist())) == k and (gi[r] >= 0).all()
               for r in range(B))
    r = adc_regret(gi)
    ok("adc_gather_mode", r <= 1.5e-2 and uniq,
       f"ids_mode=gather score_regret={r:.2e}")

    # deep-k (kr=2 slot rows, k=256): the widened merge's [2, 128]
    # reductions/selects and the raw-slot emit + XLA top_k are new Mosaic
    # surface interpret mode can't validate. Contract: top-128 of the
    # k=128 scan is a PREFIX-equal subset, ids unique, jnp overlap high.
    jv256, ji256 = pqi.search_device(jnp.asarray(qp), 256, nprobe=16,
                                     backend="jnp", for_refine=True)
    for mode in ("dma", "key"):
        dv, di = adc_scan.pallas_adc_topk(lut, probes, pqi.codes,
                                          pqi.slot_ids, 256, g=4, chunk=ch,
                                          fills=pqi.fills(), ids_mode=mode)
        dv, di = np.asarray(dv), np.asarray(di)
        s128 = adc_scan.pallas_adc_topk(lut, probes, pqi.codes,
                                        pqi.slot_ids, 128, g=4, chunk=ch,
                                        fills=pqi.fills(), ids_mode=mode)[1]
        incl = all(set(np.asarray(s128)[r].tolist()) <= set(di[r].tolist())
                   for r in range(B))
        uniq = all(len(set(di[r].tolist())) == 256 for r in range(B))
        srt = bool((np.diff(dv, axis=1) <= 1e-6).all())
        ok(f"adc_deep256_{mode}", incl and uniq and srt,
           "incl(top128)+uniq+sorted")

    # pallas ADC inside shard_map on a 1-device mesh (the --shards N
    # serving path, VERDICT r3 weak #1): composition must lower on TPU
    from nvdb_tpu.dist import mesh as meshmod
    from nvdb_tpu.dist.sharded_ivf import ShardedIVFPQIndex
    shq = ShardedIVFPQIndex.from_index(pqi, meshmod.row_mesh(1))
    vs1, is1 = shq.search_device(jnp.asarray(qp), k, nprobe=16,
                                 backend="pallas")
    m = np.mean([len(set(np.asarray(is1)[r].tolist())
                     & set(np.asarray(ip)[r].tolist())) / k
                 for r in range(B)])
    ok("adc_sharded1_pallas", m >= 0.95, f"overlap_vs_single={m:.3f}")

    # refine must convert candidate coverage into recall (recall ==
    # cand_recall is the invariant ivf_eval checks; absolute recall here is
    # corpus-limited — iid gaussian is ADC's worst case)
    store = VectorStore.from_numpy(base, "bf16", row_block=4096)
    vr, ir = pqi.search_device(jnp.asarray(qp), k, nprobe=16, refine_k=64,
                               refine_store=store, backend="pallas")
    _, icand = pqi.search_device(jnp.asarray(qp), 64, nprobe=16,
                                 backend="pallas")
    s64 = np.asarray(q, np.float64) @ base.T.astype(np.float64)
    ref_ids = np.argsort(-s64, axis=1)[:, :k]
    def _ov(ids):
        return float(np.mean([len(set(a.tolist()) & set(b.tolist())) / k
                              for a, b in zip(np.asarray(ids), ref_ids)]))
    rec, crec = _ov(ir), _ov(icand)
    ok("adc_refine_fused", rec >= crec - 1e-6,
       f"recall={rec:.3f} cand_recall={crec:.3f}")

    print(f"[{time.time()-T0:6.1f}s] ALL PASS", flush=True)


if __name__ == "__main__":
    main()
