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
