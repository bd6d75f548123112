"""Batched Lloyd k-means on the MXU.

Replaces FAISS's coarse-quantizer / PQ-codebook training (nvdb_ivf_build.cpp:59-95,
nvdb_ivfpq_build.cpp:78-96) with a TPU-first design:

- assignment = one [chunk, D] x [D, K] matmul per chunk (argmin of
  ||x||^2 - 2 x.c + ||c||^2, with ||x||^2 dropped as rank-invariant),
- centroid update = one-hot [chunk, K]^T x [chunk, D] matmul accumulated in a
  ``lax.scan`` carry — sums and counts come out of the MXU, no scatter-adds,
- empty clusters re-seeded from the data (FAISS does the same reassign trick).

Everything is static-shaped and jit-friendly; the same code runs on CPU for tests.
"""

from __future__ import annotations

import functools
from typing import Tuple

import jax
import jax.numpy as jnp


def _assign_chunk(chunk: jax.Array, cents: jax.Array) -> jax.Array:
    """[T, D], [K, D] -> [T] int32 nearest-centroid (L2)."""
    # HIGHEST: assignment must rank centroids identically to the search-time
    # coarse ranking (see ivf_flat._topS_centroids)
    dots = jnp.dot(chunk, cents.T, preferred_element_type=jnp.float32,
                   precision=jax.lax.Precision.HIGHEST)
    c2 = jnp.sum(cents * cents, axis=1)[None, :]
    return jnp.argmin(c2 - 2.0 * dots, axis=1).astype(jnp.int32)


@functools.partial(jax.jit, static_argnames=("n_clusters", "chunk"))
def assign(data: jax.Array, centroids: jax.Array, n_clusters: int = 0,
           chunk: int = 65536) -> jax.Array:
    """Nearest-centroid assignment for all rows, chunked to bound memory."""
    n, d = data.shape
    c = min(chunk, n)
    while n % c != 0:
        c //= 2
    xs = data.reshape(n // c, c, d)
    return jax.lax.map(lambda t: _assign_chunk(t, centroids), xs).reshape(n)


def _lloyd_step(data_chunks: jax.Array, cents: jax.Array, k: int
                ) -> Tuple[jax.Array, jax.Array, jax.Array]:
    """One full Lloyd iteration. data_chunks: [C, T, D]. Returns
    (sums [K, D], counts [K], mean squared distance proxy)."""

    def body(carry, chunk):
        sums, counts, obj = carry
        a = _assign_chunk(chunk, cents)                       # [T]
        onehot = jax.nn.one_hot(a, k, dtype=chunk.dtype)      # [T, K]
        sums = sums + jnp.dot(onehot.T, chunk, preferred_element_type=jnp.float32)
        counts = counts + jnp.sum(onehot, axis=0)
        picked = jnp.take(cents, a, axis=0)
        obj = obj + jnp.sum((chunk - picked) ** 2)
        return (sums, counts, obj), None

    k_, d = cents.shape
    init = (jnp.zeros((k, d), jnp.float32), jnp.zeros((k,), jnp.float32),
            jnp.float32(0.0))
    (sums, counts, obj), _ = jax.lax.scan(body, init, data_chunks)
    return sums, counts, obj


def _kmeanspp_init(key: jax.Array, sub: jax.Array, k: int) -> jax.Array:
    """k-means++ seeding over a subsample: each next seed drawn with probability
    proportional to its squared distance from the chosen set. O(k * m * D), run
    on a subsample of m ~ 32k rows so it stays cheap even for nlist=4096."""
    m, d = sub.shape
    key0, key_loop = jax.random.split(key)
    first = jnp.take(sub, jax.random.randint(key0, (), 0, m), axis=0)
    cents = jnp.zeros((k, d), jnp.float32).at[0].set(first)
    d2 = jnp.sum((sub - first[None, :]) ** 2, axis=1)

    def body(i, carry):
        cents, d2, key = carry
        key, kc = jax.random.split(key)
        idx = jax.random.categorical(kc, jnp.log(jnp.maximum(d2, 1e-30)))
        c = jnp.take(sub, idx, axis=0)
        cents = cents.at[i].set(c)
        d2 = jnp.minimum(d2, jnp.sum((sub - c[None, :]) ** 2, axis=1))
        return cents, d2, key

    cents, _, _ = jax.lax.fori_loop(1, k, body, (cents, d2, key_loop))
    return cents


@functools.partial(jax.jit, static_argnames=("n_clusters", "n_iters", "chunk"))
def kmeans_fit(
    key: jax.Array,
    data: jax.Array,          # [N, D] f32 (train subset; see IVF_TRAIN analogue)
    n_clusters: int,
    n_iters: int = 10,
    chunk: int = 16384,
) -> Tuple[jax.Array, jax.Array]:
    """Lloyd k-means. Returns (centroids [K, D] f32, objective trace [n_iters])."""
    n, d = data.shape
    k = n_clusters
    c = min(chunk, n)
    while n % c != 0:
        c //= 2
    chunks = data.reshape(n // c, c, d)

    # k-means++ init on a subsample (random init merges nearby clusters)
    key, k_sub, k_pp = jax.random.split(key, 3)
    m = min(n, max(32 * k, 4096))
    sub_idx = jax.random.choice(k_sub, n, shape=(m,), replace=False)
    sub = jnp.take(data, sub_idx, axis=0).astype(jnp.float32)
    cents0 = _kmeanspp_init(k_pp, sub, k)

    mean_count = n / k
    # pool of candidate split points (first rows are as good as random here)
    split_pool = data[: min(n, 8192)].astype(jnp.float32)

    def iteration(cents, xs):
        it_key, allow_split = xs
        sums, counts, obj = _lloyd_step(chunks, cents, k)
        new = sums / jnp.maximum(counts, 1.0)[:, None]

        # Split-largest refinement (the FAISS redo-empty/split trick): a
        # centroid serving far fewer rows than average is dead weight — usually
        # a duplicate inside an already-covered cluster while another centroid
        # is serving several merged clusters. Teleport each underpopulated
        # centroid next to the center of one of the LARGEST clusters (one
        # victim each, slightly perturbed); the next Lloyd step splits the
        # victim. Without this, k-means on many tight clusters converges with
        # ~40% of clusters merged (measured: 625/1024 covered -> recall cap).
        # donors: centroids serving well under their share (duplicates inside a
        # covered cluster sit near 0.5x mean); victims: centroids serving well
        # over their share (two merged clusters sit near 2x mean). Move the
        # i-th smallest donor next to the i-th largest victim, but only while
        # the victim really is oversized (pair i qualifies only if both sides
        # cross their thresholds).
        order_small = jnp.argsort(counts)
        order_big = jnp.argsort(-counts)
        donor_ok = jnp.take(counts, order_small) < 0.55 * mean_count
        victim_ok = jnp.take(counts, order_big) > 1.6 * mean_count
        pair_ok = jnp.logical_and(jnp.logical_and(donor_ok, victim_ok), allow_split)
        # The donor must land on an actual DATA POINT of the victim's cluster:
        # center+jitter splits fail in high dim (a random direction has ~1/sqrt(D)
        # component along the true separation axis, so Lloyd can't pull the two
        # copies apart). A member point is ~cluster-radius off the mixture mean
        # along a real data direction, so the next Lloyd step snaps donor and
        # victim onto the two merged sub-clusters.
        sub_a = _assign_chunk(split_pool, cents)                     # [m]
        m_pool = split_pool.shape[0]
        first_row = jnp.full((k,), m_pool, jnp.int32).at[sub_a].min(
            jnp.arange(m_pool, dtype=jnp.int32))
        pick = jnp.take(first_row, order_big)                        # [k]
        have_pt = pick < m_pool
        donor_pos = jnp.take(split_pool, jnp.minimum(pick, m_pool - 1), axis=0)
        donor_pos = jnp.where(have_pt[:, None], donor_pos,
                              jnp.take(new, order_big, axis=0))
        new = new.at[order_small].set(
            jnp.where(pair_ok[:, None], donor_pos,
                      jnp.take(new, order_small, axis=0)))
        return new, obj / n

    keys = jax.random.split(key, n_iters)
    # let the last two iterations run pure Lloyd so splits settle
    allow = jnp.arange(n_iters) < max(n_iters - 2, 1)
    cents, objs = jax.lax.scan(iteration, cents0, (keys, allow))
    return cents, objs


@functools.partial(jax.jit, static_argnames=("k", "inner"))
def _corpus_partial(sums, counts, cents, chunk, k: int, inner: int = 8192):
    """Accumulate one corpus chunk's Lloyd statistics ON DEVICE (the relay's
    D2H path is MB/s-slow — downloading per-chunk [K, D] sums would dominate
    the build; only the final centroids ever leave the device). The one-hot
    update matmul runs over ``inner``-row sub-chunks so the [T, K] one-hot
    slab stays VMEM/HBM-friendly at nlist=16K."""
    n, d = chunk.shape
    c = min(inner, n)
    while n % c != 0:
        c //= 2
    xs = chunk.reshape(n // c, c, d)

    def body(carry, sub):
        sums, counts = carry
        a = _assign_chunk(sub, cents)
        onehot = jax.nn.one_hot(a, k, dtype=jnp.bfloat16)     # [c, K]
        sums = sums + jax.lax.dot_general(
            onehot, sub, (((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)
        counts = counts + jnp.sum(onehot, axis=0, dtype=jnp.float32)
        return (sums, counts), None

    (sums, counts), _ = jax.lax.scan(body, (sums, counts), xs)
    return sums, counts


@functools.partial(jax.jit, static_argnames=("k", "reseed"))
def _corpus_update(cents, sums, counts, pool, k: int, reseed: bool):
    """Finalize one corpus Lloyd pass: means where populated, and (when
    ``reseed``) teleport DEAD centroids onto member points of the largest
    clusters — the split-largest trick (kmeans_fit) re-run against the FULL
    corpus counts instead of the training subsample's (VERDICT r3 #3: 11%
    of the 8M coarse quantizer was dead weight the subsample couldn't
    see)."""
    new = jnp.where(counts[:, None] > 0.5,
                    sums / jnp.maximum(counts, 1.0)[:, None], cents)
    if not reseed:
        return new
    mean_count = jnp.sum(counts) / k
    order_small = jnp.argsort(counts)
    order_big = jnp.argsort(-counts)
    # donors: corpus-dead (or starved far under their share); victims must
    # be genuinely oversized so the split pays for itself
    donor_ok = jnp.take(counts, order_small) < 0.05 * mean_count
    victim_ok = jnp.take(counts, order_big) > 1.5 * mean_count
    pair_ok = donor_ok & victim_ok
    m_pool = pool.shape[0]
    pool_a = _assign_chunk(pool, new)
    first_row = jnp.full((k,), m_pool, jnp.int32).at[pool_a].min(
        jnp.arange(m_pool, dtype=jnp.int32))
    pick = jnp.take(first_row, order_big)
    have_pt = pick < m_pool
    donor_pos = jnp.take(pool, jnp.minimum(pick, m_pool - 1), axis=0)
    ok2 = pair_ok & have_pt
    return new.at[order_small].set(
        jnp.where(ok2[:, None], donor_pos,
                  jnp.take(new, order_small, axis=0)))


def corpus_refine(
    data: "np.ndarray | jax.Array",   # [N, Dp] host (streamed) or device
    cents: jax.Array,                 # [K, Dp] f32, from kmeans_fit
    n_iters: int = 2,
    chunk: int = 262144,
    pool_rows: int = 65536,
    seed: int = 17,
    log=None,
) -> jax.Array:
    """Corpus-scale Lloyd refinement of a subsample-trained coarse quantizer
    (VERDICT r3 #3). Streams the FULL corpus through ``n_iters`` exact Lloyd
    passes (host chunks -> device, statistics accumulated on device), and
    after every pass but the last reseeds corpus-dead centroids onto member
    points of the largest clusters, so the final pass settles pure-Lloyd.

    Rationale: kmeans_fit's split-largest runs on the training subsample; at
    8M/nlist=16384 a 1M subsample leaves 11% of lists empty on the full
    corpus (BENCHMARKS §4d) — capacity the probe ranking must mask and the
    live lists absorb as overfullness, which feeds the nprobe-dilution
    effect. Cost: one corpus upload per pass (the build already streams the
    corpus twice); only [K, D] centroids ever come back down."""
    import numpy as np

    k, d = cents.shape
    n = data.shape[0]
    rng = np.random.default_rng(seed)
    pool_idx = np.sort(rng.choice(n, size=min(pool_rows, n), replace=False))
    pool = jnp.asarray(np.asarray(data[pool_idx], np.float32))

    for it in range(n_iters):
        sums = jnp.zeros((k, d), jnp.float32)
        counts = jnp.zeros((k,), jnp.float32)
        for s in range(0, n, chunk):
            sums, counts = _corpus_partial(
                sums, counts, cents, jnp.asarray(
                    np.asarray(data[s : s + chunk], np.float32)), k)
        # reseed between passes so the last pass settles pure-Lloyd; with
        # a single pass, reseed anyway — an unsettled reseed onto a data
        # point still reclaims the dead list (the point is its own nearest
        # row), which is the whole purpose of the pass
        cents = _corpus_update(cents, sums, counts, pool, k,
                               reseed=(n_iters == 1 or it < n_iters - 1))
        if log is not None:
            dead = int(jnp.sum(counts < 0.5))
            log(f"corpus_refine pass {it + 1}/{n_iters}: dead={dead} "
                f"({100.0 * dead / k:.2f}%)")
    return cents
