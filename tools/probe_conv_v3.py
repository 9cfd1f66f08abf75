"""A/B probe: gather-first block-sum hoisting + software-pipelined one-hot
vs the production banded conv kernel.

Variant A (production): per block, fold weights (bw = blk @ w per tap) then
one-hot-gather-contract; both matmuls run per (tile, group, block).

Variant B (gather-first): per block only the one-hot gather runs
(onehot @ blk -> [gsize, T, cin]); the per-row one-hots of different blocks
are disjoint, so the block sum assembles the full gather EXACTLY in bf16.
The weight contraction then runs ONCE per (tile, group) — the per-block
weight-fold matmul disappears.

Variant C (B + pipelined one-hot): the body builds block bi+1's one-hot
while the MXU contracts block bi's (no data dependency), letting Mosaic
overlap VPU build with MXU work.
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import functools

import numpy as np
import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from lidal_tpu.tpu_init import setup

setup()

from lidal_tpu.ops.pallas_conv import TILE_M, TILE_N, _VMEM_LIMIT, band_bounds, subm_conv_pallas
from tools.bench_suite import device_time


def _make_kernel_v3(k: int, cin: int, cout: int, groups: int, pipelined: bool):
    gsize = k // groups

    def _kernel(lo_ref, nb_ref, nbr_ref, w_ref, feats_hbm, out_ref, heads, tails, hsem, tsem):
        t = pl.program_id(0)
        nt = pl.num_programs(0)
        nbr_tile = nbr_ref[:]
        iota_n = jax.lax.broadcasted_iota(jnp.int32, (TILE_M, TILE_N), 1)
        acc = jnp.zeros((TILE_M, cout), jnp.float32)

        def head_dma(g, tt):
            return pltpu.make_async_copy(
                feats_hbm.at[pl.ds(lo_ref[g, tt] * TILE_N, TILE_N)],
                heads.at[g, jax.lax.rem(tt, 2)],
                hsem.at[g, jax.lax.rem(tt, 2)],
            )

        @pl.when(t == 0)
        def _():
            for g0 in range(groups):

                @pl.when(nb_ref[g0, 0] > 0)
                def _(g0=g0):
                    head_dma(g0, 0).start()

        for g in range(groups):
            lo = lo_ref[g, t]
            nblocks = nb_ref[g, t]
            locals_g = nbr_tile[:, g * gsize : (g + 1) * gsize]
            wg = w_ref[g * gsize : (g + 1) * gsize].astype(jnp.bfloat16)
            tnext = jnp.minimum(t + 1, nt - 1)

            @pl.when((t + 1 < nt) & (nb_ref[g, tnext] > 0))
            def _(g=g, tnext=tnext):
                head_dma(g, tnext).start()

            def tail_dma(bi, lo=lo):
                slot = (bi - 1) & 1
                return pltpu.make_async_copy(
                    feats_hbm.at[pl.ds((lo + bi) * TILE_N, TILE_N)],
                    tails.at[slot],
                    tsem.at[slot],
                )

            @pl.when(nblocks > 1)
            def _(tail_dma=tail_dma):
                tail_dma(1).start()

            def build_onehot(bi, locals_g=locals_g, lo=lo):
                return jnp.stack(
                    [
                        (locals_g[:, j][:, None] - (lo + bi) * TILE_N == iota_n).astype(
                            jnp.bfloat16
                        )
                        for j in range(gsize)
                    ],
                    axis=0,
                )  # [gsize, T, TN]

            if pipelined:

                def body(bi, carry, g=g, nblocks=nblocks, tail_dma=tail_dma, build_onehot=build_onehot):
                    gath, onehot_cur = carry

                    @pl.when((bi >= 1) & (bi + 1 < nblocks))
                    def _():
                        tail_dma(bi + 1).start()

                    # next block's one-hot: VPU work independent of this
                    # block's MXU contraction below (clamped on the last
                    # iteration: a redundant rebuild, never consumed)
                    onehot_next = build_onehot(jnp.minimum(bi + 1, nblocks - 1))

                    @pl.when(bi == 0)
                    def _():
                        head_dma(g, t).wait()

                    @pl.when(bi > 0)
                    def _():
                        tail_dma(bi).wait()

                    hblk = heads[g, jax.lax.rem(t, 2)][:, :cin]
                    tblk = tails[(bi - 1) & 1][:, :cin]
                    blk = jnp.where(bi == 0, hblk, tblk)
                    part = jax.lax.dot_general(
                        onehot_cur,
                        jnp.broadcast_to(blk[None], (gsize, TILE_N, cin)),
                        dimension_numbers=(((2,), (1,)), ((0,), (0,))),
                        preferred_element_type=jnp.float32,
                    ).astype(jnp.bfloat16)
                    return gath + part, onehot_next

                gath, _ = jax.lax.fori_loop(
                    0,
                    nblocks,
                    body,
                    (
                        jnp.zeros((gsize, TILE_M, cin), jnp.bfloat16),
                        build_onehot(0),
                    ),
                )
            else:

                def body(bi, gath, g=g, nblocks=nblocks, tail_dma=tail_dma, build_onehot=build_onehot):
                    @pl.when((bi >= 1) & (bi + 1 < nblocks))
                    def _():
                        tail_dma(bi + 1).start()

                    @pl.when(bi == 0)
                    def _():
                        head_dma(g, t).wait()

                    @pl.when(bi > 0)
                    def _():
                        tail_dma(bi).wait()

                    hblk = heads[g, jax.lax.rem(t, 2)][:, :cin]
                    tblk = tails[(bi - 1) & 1][:, :cin]
                    blk = jnp.where(bi == 0, hblk, tblk)
                    onehot = build_onehot(bi)
                    part = jax.lax.dot_general(
                        onehot,
                        jnp.broadcast_to(blk[None], (gsize, TILE_N, cin)),
                        dimension_numbers=(((2,), (1,)), ((0,), (0,))),
                        preferred_element_type=jnp.float32,
                    ).astype(jnp.bfloat16)
                    return gath + part

                gath = jax.lax.fori_loop(
                    0, nblocks, body, jnp.zeros((gsize, TILE_M, cin), jnp.bfloat16)
                )

            # ONE weight contraction per (tile, group): [gsize, T, cin] x
            # [gsize, cin, cout] batched over taps, f32 accumulate
            part = jax.lax.dot_general(
                gath,
                wg,
                dimension_numbers=(((2,), (1,)), ((0,), (0,))),
                preferred_element_type=jnp.float32,
            )
            acc = acc + part.sum(axis=0)
        out_ref[:] = acc

    return _kernel


@functools.partial(jax.jit, static_argnames=("groups", "pipelined", "interpret"))
def subm_conv_v3(feats, w, nbr, groups=3, pipelined=False, interpret=False):
    n, cin = feats.shape
    m, k = nbr.shape
    tiles = m // TILE_M
    cout = w.shape[2]
    lo, nb = band_bounds(nbr, n, groups)
    feats = feats.astype(jnp.bfloat16)
    w = w.astype(jnp.bfloat16)
    cin_pad = -(-cin // 128) * 128
    if cin_pad != cin:
        feats = jnp.pad(feats, ((0, 0), (0, cin_pad - cin)))
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,
        grid=(tiles,),
        in_specs=[
            pl.BlockSpec((TILE_M, k), lambda t, *_: (t, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pl.ANY),
        ],
        out_specs=pl.BlockSpec((TILE_M, cout), lambda t, *_: (t, 0), memory_space=pltpu.VMEM),
        scratch_shapes=[
            pltpu.VMEM((groups, 2, TILE_N, cin_pad), feats.dtype),
            pltpu.VMEM((2, TILE_N, cin_pad), feats.dtype),
            pltpu.SemaphoreType.DMA((groups, 2)),
            pltpu.SemaphoreType.DMA((2,)),
        ],
    )
    kernel = _make_kernel_v3(k, cin, cout, groups, pipelined)
    return pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((m, cout), jnp.float32),
        compiler_params=_VMEM_LIMIT,
        interpret=interpret,
    )(lo, nb, nbr, w, feats)


rng = np.random.default_rng(0)


def make_nbr(n, k, rows_per_x):
    base = np.arange(n)
    cols = []
    for kk in range(k):
        xoff = kk // (k // 3) - 1 if k == 27 else kk // 4
        shift = xoff * rows_per_x + (kk % 9) - 4
        idx = base + shift + rng.integers(-40, 40, n)
        bad = (idx < 0) | (idx >= n) | (rng.random(n) < 0.12)
        idx = np.where(bad, n, idx)
        idx.sort()
        cols.append(idx)
    return np.stack(cols, 1).astype(np.int32)


def oracle(feats, w, nbr):
    fx = np.concatenate([feats, np.zeros((1, feats.shape[1]), feats.dtype)])
    k = nbr.shape[1]
    return sum(fx[nbr[:, j]] @ w[j] for j in range(k))


for n, cin, cout, label in [
    (131072, 4, 32, "stem1"),
    (131072, 32, 32, "stem2"),
    (131072, 96, 96, "dec-L0"),
    (49152, 96, 96, "dec-L1"),
    (16384, 128, 128, "enc-L2"),
    (6144, 256, 256, "enc-L3"),
]:
    nbr = make_nbr(n, 27, max(300, n // 40))
    feats = rng.standard_normal((n, cin)).astype(np.float32)
    w = (rng.standard_normal((27, cin, cout)) * 0.05).astype(np.float32)

    # correctness vs f32 oracle (bf16 tolerances)
    ref = oracle(feats, w, nbr)
    for name, fn in [
        ("B", lambda f, ww, nb: subm_conv_v3(f, ww, nb, pipelined=False)),
        ("C", lambda f, ww, nb: subm_conv_v3(f, ww, nb, pipelined=True)),
    ]:
        got = np.asarray(fn(feats, w, nbr))
        err = np.abs(got - ref).max() / (np.abs(ref).max() + 1e-9)
        assert err < 0.03, (label, name, err)

    def f_prod(i, f, w, nb):
        return subm_conv_pallas(f + (i & 1).astype(f.dtype) * 1e-30, w, nb)

    def f_b(i, f, w, nb):
        return subm_conv_v3(f + (i & 1).astype(f.dtype) * 1e-30, w, nb, pipelined=False)

    def f_c(i, f, w, nb):
        return subm_conv_v3(f + (i & 1).astype(f.dtype) * 1e-30, w, nb, pipelined=True)

    ms_a = device_time(f_prod, (feats, w, nbr), iters=20)
    ms_b = device_time(f_b, (feats, w, nbr), iters=20)
    ms_c = device_time(f_c, (feats, w, nbr), iters=20)
    print(
        f"{label:8s} n={n:6d} c{cin:3d}->c{cout:3d}  prod {ms_a:6.2f}  "
        f"gather-first {ms_b:6.2f}  +pipelined {ms_c:6.2f} ms",
        flush=True,
    )
