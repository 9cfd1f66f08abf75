"""Point<->voxel transfer ops for the SPVCNN point branch.

TPU-native equivalents of torchsparse ``voxel_to_point`` (8-corner trilinear
devoxelize via ``get_kernel_offsets(2,..)`` + ``calc_ti_weights`` + ``spdevoxelize``,
reference ``network/utils.py:66-102``) and ``point_to_voxel`` (hash-match +
``spvoxelize`` average, reference ``network/utils.py:38-61``).

A modeling note baked into this design: with the reference data pipeline, SPVCNN's
"points" are exactly the level-0 voxels — ``initial_voxelize`` is called with
pres == vres on already-integer coords, making it an identity re-hash (reference
``network/spvcnn.py:114-116``, ``network/utils.py:13-33``; SURVEY.md quirk 6).  So
the point set here *is* the level-0 voxel table, point float coords are the integer
level-0 coords, and stride-1 transfers are identities.  All cross-stride maps are
precomputed into a :class:`PointPlan` once per batch.
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp

from lidal_tpu.ops.kernel_map import OFFSETS2, UNetPlan
from lidal_tpu.ops.voxelize import append_zero_row


class TriMap(NamedTuple):
    """Trilinear devoxelize map from level-0 "points" to one coarser level."""

    idx8: jnp.ndarray  # [cap0, 8] int32 into the target level (sentinel = cap_l)
    w8: jnp.ndarray  # [cap0, 8] float32 trilinear weights (0 where corner missing)


class AvgMap(NamedTuple):
    """Point->voxel average map from level-0 "points" to one coarser level."""

    anc: jnp.ndarray  # [cap0] int32 ancestor voxel at the target level (sentinel)
    counts: jnp.ndarray  # [cap_l] int32 number of points per target voxel


class PointPlan(NamedTuple):
    """Cross-stride transfer maps used by SPVCNN (levels 2 and 4)."""

    tri2: TriMap
    tri4: TriMap
    avg2: AvgMap
    avg4: AvgMap


# Corner offsets {0,1}^3 as tap indices into the x-major OFFSETS3 ({-1,0,1}^3)
# enumeration: tap(d) = (dx+1)*9 + (dy+1)*3 + (dz+1).
_TAP8 = tuple((dx + 1) * 9 + (dy + 1) * 3 + (dz + 1) for dx, dy, dz in OFFSETS2)


def _build_tri(coords0, valid0, anc, level_nbr3, lshift: int) -> TriMap:
    """Corners floor(c / 2^l) + delta, weights prod(delta ? u : 1-u), u = frac(c / 2^l).

    The corner at offset d of point p is a kernel-3 neighbor of p's level-l
    ancestor voxel (base coords == the ancestor's coords), so ``idx8`` composes
    the ancestor chain with the level's existing submanifold rulebook —
    ``nbr3[anc[p], tap(d)]`` — instead of 8 hash lookups per point (the
    binary-search formulation cost ~1.7 s/batch, 80% of SPVCNN's runtime).
    """
    s = 1 << lshift
    u = (coords0 & (s - 1)).astype(jnp.float32) / float(s)  # [cap0, 3]
    cap_l = level_nbr3.shape[0]
    # sentinel ancestor (== cap_l) gathers the appended all-sentinel row
    nbr_ext = jnp.concatenate(
        [level_nbr3, jnp.full((1, level_nbr3.shape[1]), cap_l, jnp.int32)]
    )
    idx8 = nbr_ext[anc][:, jnp.asarray(_TAP8, jnp.int32)]  # [cap0, 8]
    offs_f = jnp.asarray(OFFSETS2, jnp.float32)  # [8, 3], d = (dx<<2)|(dy<<1)|dz
    w = jnp.prod(
        jnp.where(offs_f[None] > 0, u[:, None, :], 1.0 - u[:, None, :]), axis=-1
    )  # [cap0, 8]
    w = jnp.where((idx8 < cap_l) & valid0[:, None], w, 0.0)
    return TriMap(idx8=idx8.astype(jnp.int32), w8=w.astype(jnp.float32))


def build_point_plan_frame(plan_levels, plan_downs) -> PointPlan:
    """Build the SPVCNN transfer maps for ONE frame from its UNet plan."""
    lv0 = plan_levels[0]
    coords0, valid0 = lv0.coords, lv0.valid

    # Ancestor chains: compose parent maps with sentinel-propagating padded gathers.
    anc = jnp.arange(coords0.shape[0], dtype=jnp.int32)
    anc = jnp.where(valid0, anc, coords0.shape[0])
    ancs = {}
    cur = anc
    for l, down in enumerate(plan_downs):
        cap_next = plan_levels[l + 1].coords.shape[0]
        parent_ext = jnp.concatenate([down.parent, jnp.array([cap_next], jnp.int32)])
        cur = parent_ext[jnp.minimum(cur, down.parent.shape[0])]
        ancs[l + 1] = cur

    def avg_map(l):
        cap_l = plan_levels[l].coords.shape[0]
        counts = (
            jnp.zeros(cap_l, jnp.int32).at[ancs[l]].add(valid0.astype(jnp.int32), mode="drop")
        )
        return AvgMap(anc=ancs[l], counts=counts)

    tri2 = _build_tri(coords0, valid0, ancs[2], plan_levels[2].nbr3, 2)
    tri4 = _build_tri(coords0, valid0, ancs[4], plan_levels[4].nbr3, 4)
    return PointPlan(tri2=tri2, tri4=tri4, avg2=avg_map(2), avg4=avg_map(4))


def build_point_plan(plan: UNetPlan) -> PointPlan:
    """Batched: static per-frame unroll over a batched UNetPlan (ops/batching.py)."""
    from lidal_tpu.ops.batching import map_frames

    return map_frames(build_point_plan_frame, plan.levels, plan.downs)


def devoxelize_trilinear(voxel_feats: jnp.ndarray, tri: TriMap) -> jnp.ndarray:
    """spdevoxelize: out[p] = sum_d w8[p, d] * voxel_feats[idx8[p, d]] (missing -> 0).

    voxel_feats: [cap_l, c]; returns [cap0, c].
    """
    fx = append_zero_row(voxel_feats)
    g = fx[tri.idx8]  # [cap0, 8, c]
    return jnp.einsum("pd,pdc->pc", tri.w8.astype(voxel_feats.dtype), g)


def _pallas_gather8_ok(n: int, m: int) -> bool:
    import jax

    from lidal_tpu.ops.conv import USE_PALLAS

    if USE_PALLAS is not None:
        return USE_PALLAS
    return jax.default_backend() == "tpu" and n % 256 == 0 and m % 256 == 0


def devoxelize_trilinear_batched(voxel_feats: jnp.ndarray, tri: TriMap) -> jnp.ndarray:
    """Batched spdevoxelize [B, cap_l, c] -> [B, cap0, c]; one banded Pallas
    weighted-gather launch on TPU (the XLA ``fx[idx8]`` gather moved ~1 GB per
    frame at c=256 and made SPVCNN 9x slower than MinkUNet)."""
    b, cap_l, c = voxel_feats.shape
    m = tri.idx8.shape[1]
    if _pallas_gather8_ok(b * cap_l, b * m):
        from lidal_tpu.ops.conv import _flatten_nbr
        from lidal_tpu.ops.pallas_gather8 import gather8

        nbr = _flatten_nbr(tri.idx8, cap_l)
        out = gather8(
            voxel_feats.reshape(b * cap_l, c),
            nbr,
            tri.w8.reshape(b * m, 8).astype(jnp.float32),
        )
        return out.reshape(b, m, c).astype(voxel_feats.dtype)
    from lidal_tpu.ops.batching import map_frames

    return map_frames(devoxelize_trilinear, voxel_feats, tri)


def _child_sum(x: jnp.ndarray, child: jnp.ndarray, parent: jnp.ndarray) -> jnp.ndarray:
    """One down-tree level of the voxel sum: out[o] = sum_d x[child[o, d]].

    Custom VJP: every fine row has exactly one parent, so the backward is the
    plain row gather dx[f] = dy[parent[f]] — no scatter in either direction
    (gather8's generic VJP scatter-adds an [m, 8, c] cotangent)."""
    b, cap_f, c = x.shape

    @jax.custom_vjp
    def run(x):
        from lidal_tpu.ops.conv import _flatten_nbr
        from lidal_tpu.ops.pallas_gather8 import gather8

        nbr = _flatten_nbr(child, cap_f)
        ones = jnp.ones(nbr.shape, jnp.float32)
        return gather8(x.reshape(b * cap_f, c), nbr, ones).reshape(b, child.shape[1], c)

    def fwd(x):
        return run(x), None

    def bwd(_, dy):
        from lidal_tpu.ops.gather import take_rows
        from lidal_tpu.ops.voxelize import append_zero_row

        def one(dy_f, parent_f):
            return take_rows(append_zero_row(dy_f), parent_f, sorted_unique=False)

        return (jax.vmap(one)(dy, parent).astype(dy.dtype),)

    run.defvjp(fwd, bwd)
    return run(x)


def point_to_voxel_avg_batched(
    point_feats: jnp.ndarray, downs, avg: AvgMap, levels: int
) -> jnp.ndarray:
    """Batched spvoxelize average [B, cap0, c] -> [B, cap_l, c].

    On TPU the sum decomposes over the down-tree — ``levels`` chained 8-tap
    child sums (sorted child maps -> banded weighted-gather kernel, weights 1)
    — replacing the XLA scatter-add; the final divide uses the precomputed
    ancestor counts.  Off-TPU: the per-frame scatter-add path."""
    b, cap0, c = point_feats.shape
    if _pallas_gather8_ok(b * cap0, b * downs[0].child.shape[1]):
        x = point_feats
        for l in range(levels):
            x = _child_sum(x, downs[l].child, downs[l].parent)
        denom = jnp.maximum(avg.counts, 1).astype(x.dtype)[..., None]
        return (x / denom).astype(point_feats.dtype)
    from lidal_tpu.ops.batching import map_frames

    return map_frames(point_to_voxel_avg, point_feats, avg)


def point_to_voxel_avg(point_feats: jnp.ndarray, avg: AvgMap) -> jnp.ndarray:
    """spvoxelize: average point features into their ancestor voxels.

    point_feats: [cap0, c] (invalid rows must be zero); returns [cap_l, c].
    """
    cap_l = avg.counts.shape[0]
    sums = jnp.zeros((cap_l, point_feats.shape[-1]), point_feats.dtype).at[avg.anc].add(
        point_feats, mode="drop"
    )
    denom = jnp.maximum(avg.counts, 1).astype(point_feats.dtype)[:, None]
    return sums / denom
