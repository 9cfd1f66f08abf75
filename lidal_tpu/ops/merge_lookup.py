"""Merge-rank lookup of SORTED queries in a sorted key table (bitonic merge).

The generic ``hashing.lookup`` does an 18-round vectorized binary search — 18
serial passes of random gathers per query, the dominant cost of kernel-map
construction on TPU.  But every rulebook query stream is itself *sorted*: a
kernel offset adds a constant to the packed (hi, lo) key (field-independent
packing => no carries), which preserves order.  Looking up M sorted queries in an
N-entry sorted table is a *merge*, not M independent searches.

Algorithm (bitonic merge rank — replaces round 1's all-pairs merge-path tiling,
which cost O((N+M)·D) VPU compares for tile size D plus window gathers):

1. Concatenate ``ascending table ++ reversed queries`` — a *bitonic* sequence.
   The element's role (table vs query) is packed into the low bit of the lo key
   (queries sort before equal table keys — the lower-bound tie rule), so the
   merge carries exactly two int32 arrays.
2. Run the bitonic-merge network: log2(N+M) compare-exchange stages, each
   expressed as rolls + parity selects (contiguous slices, no gathers).
   Layout-aware staging keeps every roll on the cheap sublane axis: strides
   >= 128 run on a [G, L/128, 128] view; ONE transpose moves lanes onto
   sublanes for the seven small strides (64..1).
3. In the merged order, a query's lower bound is the number of table elements
   before it (one triangular-matmul prefix sum, ``ops.prefix``), its original
   index is its rank among queries (``iota - table_prefix``), and — when query
   keys are unique — a *hit* means the next merged element is a table entry
   with an equal key (queries sort immediately before their equal table key).
   Everything is computed in the post-merge layout; one disjoint scatter
   writes results back.  No per-query gathers anywhere.

All G streams batch on a leading axis (the compare-exchange stages vectorize
across streams).

Key-range contract: real (non-sentinel) ``lo`` keys must be < 2**30 (the flag
bit shifts lo left by one).  Both producers satisfy this: voxel packing has
lo = z + 1 (grid coords, ``hashing.pack_keys``) and the NN hash grid packs
|y|,|z| cell fields into 27 bits (``active/nn_match.py``).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from lidal_tpu.ops.gather import take_values
from lidal_tpu.ops.hashing import SENTINEL_KEY


def _cmpx(eh: jnp.ndarray, el: jnp.ndarray, axis: int, bit: int):
    """One bitonic compare-exchange stage: partner = index XOR ``bit`` along
    ``axis``.  Expressed with rolls + parity selects (contiguous slices —
    interleaving reshapes at small strides compile pathologically on TPU).
    Rolls never wrap across a 2*bit block for the positions that use them, so
    wrap-around values are never selected."""
    pos_shape = [1] * eh.ndim
    pos_shape[axis] = -1
    pos = ((jnp.arange(eh.shape[axis], dtype=jnp.int32) & bit) == 0).reshape(pos_shape)
    ph = jnp.where(pos, jnp.roll(eh, -bit, axis=axis), jnp.roll(eh, bit, axis=axis))
    pl_ = jnp.where(pos, jnp.roll(el, -bit, axis=axis), jnp.roll(el, bit, axis=axis))
    part_less = (ph < eh) | ((ph == eh) & (pl_ < el))
    self_less = (eh < ph) | ((eh == ph) & (el < pl_))
    take = jnp.where(pos, part_less, self_less)
    return jnp.where(take, ph, eh), jnp.where(take, pl_, el)


# tri-state override for the Pallas merge kernel: None = auto (TPU + big enough)
USE_PALLAS: bool | None = None


def _pallas_ok(lp: int) -> bool:
    if USE_PALLAS is not None:
        return USE_PALLAS
    return jax.default_backend() == "tpu" and lp >= 1024


def _merge_rank(t_hi, t_lo, q_hi, q_lo, with_found: bool):
    """Lower-bound positions [G, m] of G sorted query streams; when
    ``with_found`` additionally folds the hit check (valid only for
    strictly-increasing real query keys) and returns ``n`` for misses.

    Tables may be shared ([n] — broadcast over streams) or per-stream
    ([G, n] — e.g. the same kernel offsets over B frames, or one query set
    against many neighbor grids)."""
    n = t_hi.shape[-1]
    g, m = q_hi.shape
    length = n + m
    lp = max(256, 1 << (length - 1).bit_length())
    pad = lp - length

    # Packed lo2 = (lo << 1) | is_table; sentinels keep order: query-sentinel
    # (S, S-1) < table-sentinel (S, S).  Pads are query-sentinels: they absorb
    # tail query ranks >= the first sentinel query's rank, where every slot
    # receives the same value — bit-identical results either way.
    t_sent = t_hi == SENTINEL_KEY
    tl2 = jnp.where(t_sent, SENTINEL_KEY, (t_lo << 1) | 1)
    q_sent = q_hi == SENTINEL_KEY
    ql2 = jnp.where(q_sent, SENTINEL_KEY - 1, q_lo << 1)

    th2 = t_hi if t_hi.ndim == 2 else jnp.broadcast_to(t_hi[None, :], (g, n))
    tl2 = tl2 if tl2.ndim == 2 else jnp.broadcast_to(tl2[None, :], (g, n))
    eh = jnp.concatenate(
        [th2, jnp.full((g, pad), SENTINEL_KEY, jnp.int32), q_hi[:, ::-1]],
        axis=1,
    )
    el = jnp.concatenate(
        [tl2, jnp.full((g, pad), SENTINEL_KEY - 1, jnp.int32), ql2[:, ::-1]],
        axis=1,
    )

    if _pallas_ok(lp):
        # one kernel per stream: merge stages + prefix + rank + dense
        # compaction all in VMEM — no scatter (an XLA scatter here cost ~16 ms,
        # 13x the whole kernel).  Also keeps the stage chain out of XLA's
        # fusion passes, whose compile time explodes when this graph embeds in
        # larger programs (e.g. the scanned multi-level plan builder).
        from lidal_tpu.ops.pallas_merge import merge_rank_pallas

        r = lp // 128
        return merge_rank_pallas(
            eh.reshape(g, r, 128), el.reshape(g, r, 128), n=n, m=m, with_found=with_found
        )

    # --- bitonic merge, layout-aware (rolls stay on the sublane axis) ---
    r = lp // 128
    eh3 = eh.reshape(g, r, 128)
    el3 = el.reshape(g, r, 128)
    s = lp >> 1
    while s >= 128:
        eh3, el3 = _cmpx(eh3, el3, axis=1, bit=s // 128)
        s >>= 1
    eh3 = eh3.swapaxes(1, 2)  # [G, 128, r]: flat merged index = axis2*128 + axis1
    el3 = el3.swapaxes(1, 2)
    while s >= 1:
        eh3, el3 = _cmpx(eh3, el3, axis=1, bit=s)
        s >>= 1

    # --- ranks in the post-merge (transposed) layout; no un-transpose needed ---
    is_t = el3 & 1  # 1 for table elements (incl. table sentinels)
    # exclusive prefix over the flat merged order: triangular matmul along the
    # 128-wide flat rows (axis 1) + a short cumsum of per-row totals (axis 2)
    tri = jnp.triu(jnp.ones((128, 128), jnp.float32), k=1)  # tri[k, l] = 1 for k < l
    in_row = jnp.einsum("kl,gkr->glr", tri, is_t.astype(jnp.float32)).astype(jnp.int32)
    row_tot = is_t.sum(axis=1)  # [G, r]
    row_pre = jnp.cumsum(row_tot, axis=1) - row_tot
    tpre = in_row + row_pre[:, None, :]  # table count strictly before, [G, 128, r]

    iota_k = jax.lax.broadcasted_iota(jnp.int32, (g, 128, r), 1)
    iota_r = jax.lax.broadcasted_iota(jnp.int32, (g, 128, r), 2)
    qrank = iota_r * 128 + iota_k - tpre  # rank among queries == original index

    if with_found:
        # hit <=> the NEXT merged element is a table entry with an equal key
        # (with unique query keys, a query sorts immediately before its match).
        nh = jnp.roll(eh3, -1, axis=1)
        nl = jnp.roll(el3, -1, axis=1)
        bh = jnp.roll(eh3[:, 0:1, :], -1, axis=2)  # flat-row boundary: tiny lane roll
        bl = jnp.roll(el3[:, 0:1, :], -1, axis=2)
        at127 = iota_k == 127
        nh = jnp.where(at127, bh, nh)
        nl = jnp.where(at127, bl, nl)
        found = (
            ((nl & 1) == 1)
            & (nh == eh3)
            & ((nl >> 1) == (el3 >> 1))
            & (eh3 != SENTINEL_KEY)
        )
        val = jnp.where(found, tpre, n)
    else:
        val = tpre

    okq = (is_t == 0) & (qrank < m)
    row_base = (jnp.arange(g, dtype=jnp.int32) * m)[:, None, None]
    flat_tgt = jnp.where(okq, row_base + qrank, g * m)
    out = (
        jnp.zeros((g * m,), jnp.int32)
        .at[flat_tgt.reshape(-1)]
        .set(jnp.where(okq, val, 0).reshape(-1), mode="drop")
    )
    return out.reshape(g, m)


def lookup_sorted(t_hi, t_lo, q_hi, q_lo, tile: int | None = None):
    """Find each sorted query key in the sorted sentinel-padded table.

    Args:
      t_hi/t_lo: [n] sorted table keys (invalid tail = SENTINEL_KEY).
      q_hi/q_lo: [m] sorted query keys (invalid = SENTINEL_KEY, at the end);
        duplicates allowed.
      tile: unused (kept for API compat).

    Returns:
      int32 [m]: table index of each query, or ``n`` when absent/sentinel.
      Bit-identical to ``hashing.lookup`` on sorted queries.
    """
    return lookup_sorted_many(t_hi, t_lo, q_hi[None, :], q_lo[None, :], tile)[0]


def lower_bound_sorted_many(t_hi, t_lo, q_hi, q_lo, tile: int | None = None):
    """Raw lower-bound POSITIONS [G, m] (insertion points) of G sorted query
    streams, without the found/sentinel check — used by the hash-grid NN
    matcher to locate candidate runs.  Duplicate query keys allowed (equal
    queries receive equal positions)."""
    del tile
    return _merge_rank(t_hi, t_lo, q_hi, q_lo, with_found=False)


def lookup_sorted_many(
    t_hi, t_lo, q_hi, q_lo, tile: int | None = None, unique_queries: bool = False
):
    """G sorted query streams against ONE sorted table, fully batched.

    Semantically ``stack([lookup_sorted(t, q[g]) for g])`` — the 26-offset
    rulebook builder's hot path.

    Args:
      t_hi/t_lo: [n] sorted table keys (sentinel tail).
      q_hi/q_lo: [G, m] sorted query streams (sentinels at each row's end).
      tile: unused (kept for API compat).
      unique_queries: promise that real query keys are strictly increasing
        within each stream (true for rulebook streams: constant offsets of a
        unique sorted table).  Enables the gather-free in-merge hit check.

    Returns: int32 [G, m] table indices (n where absent).
    """
    del tile
    if unique_queries:
        return _merge_rank(t_hi, t_lo, q_hi, q_lo, with_found=True)
    n = t_hi.shape[0]
    g, m = q_hi.shape
    out = _merge_rank(t_hi, t_lo, q_hi, q_lo, with_found=False)
    pos = jnp.minimum(out, n - 1)
    hit_hi = take_values(t_hi, pos.reshape(-1), sorted_unique=False).reshape(g, m)
    hit_lo = take_values(t_lo, pos.reshape(-1), sorted_unique=False).reshape(g, m)
    found = (hit_hi == q_hi) & (hit_lo == q_lo) & (q_hi != SENTINEL_KEY)
    return jnp.where(found, out, n).astype(jnp.int32)


def lookup_sorted_grouped(t_hi, t_lo, q_hi, q_lo, unique_queries: bool = True):
    """S independent (table, query-stream) pairs in ONE fused merge — one
    Pallas launch for e.g. all B frames x 26 kernel offsets of a batch, or one
    query set against 24 neighbor grids.

    Args:
      t_hi/t_lo: [S, n] per-stream sorted tables (sentinel tails).
      q_hi/q_lo: [S, m] sorted query streams.
      unique_queries: as in :func:`lookup_sorted_many` (in-merge hit check).

    Returns: int32 [S, m] per-stream table indices (n where absent).
    """
    if unique_queries:
        return _merge_rank(t_hi, t_lo, q_hi, q_lo, with_found=True)
    s, n = t_hi.shape
    m = q_hi.shape[1]
    out = _merge_rank(t_hi, t_lo, q_hi, q_lo, with_found=False)
    pos = jnp.minimum(out, n - 1) + (jnp.arange(s, dtype=jnp.int32) * n)[:, None]
    hit_hi = take_values(t_hi.reshape(-1), pos.reshape(-1), sorted_unique=False).reshape(s, m)
    hit_lo = take_values(t_lo.reshape(-1), pos.reshape(-1), sorted_unique=False).reshape(s, m)
    found = (hit_hi == q_hi) & (hit_lo == q_lo) & (q_hi != SENTINEL_KEY)
    return jnp.where(found, out, n).astype(jnp.int32)


def lower_bound_sorted_grouped(t_hi, t_lo, q_hi, q_lo):
    """Per-stream lower bounds for S (table, queries) pairs — [S, m]."""
    return _merge_rank(t_hi, t_lo, q_hi, q_lo, with_found=False)
