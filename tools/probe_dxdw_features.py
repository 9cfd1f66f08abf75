"""Feature-bisect the Mosaic compile hang: start from the known-good fwd kernel
structure and add dx_dw features one at a time (tiny shapes, 60s verdicts)."""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import functools

import numpy as np
import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from lidal_tpu.tpu_init import setup

setup()
from lidal_tpu.ops.pallas_conv import band_bounds

TM = TN = 256
rng = np.random.default_rng(0)
n = m = 512
c = 8
k = 8
groups = 2
gsize = k // groups

nbr_np = np.full((m, k), n, np.int32)
for j in range(k):
    rows = np.sort(rng.choice(m, size=400, replace=False))
    vals = np.sort(rng.choice(n, size=400, replace=False))
    nbr_np[rows, j] = vals
nbr = jnp.asarray(nbr_np)
src = jnp.asarray(rng.standard_normal((n, 128)).astype(np.float32)[:, :c])
w2 = jnp.asarray(rng.standard_normal((k, c, c)).astype(np.float32))
f = jnp.asarray(rng.standard_normal((m, c)).astype(np.float32))
lo, nb = band_bounds(nbr, n, groups)


def launch(kernel, n_outs, with_f, label):
    out_shape = [jax.ShapeDtypeStruct((m, c), jnp.float32)]
    out_specs = [pl.BlockSpec((TM, c), lambda t, *_: (t, 0), memory_space=pltpu.VMEM)]
    if n_outs == 2:
        out_shape.append(jax.ShapeDtypeStruct((k, c, c), jnp.float32))
        out_specs.append(pl.BlockSpec((k, c, c), lambda t, *_: (0, 0, 0), memory_space=pltpu.VMEM))
    in_specs = [
        pl.BlockSpec((TM, k), lambda t, *_: (t, 0), memory_space=pltpu.VMEM),
        pl.BlockSpec(memory_space=pltpu.VMEM),
    ]
    args = [nbr, w2.astype(jnp.bfloat16)]
    if with_f:
        in_specs.append(pl.BlockSpec((c, TM), lambda t, *_: (0, t), memory_space=pltpu.VMEM))
        args.append(f.astype(jnp.bfloat16).T)
    in_specs.append(pl.BlockSpec(memory_space=pltpu.ANY))
    args.append(src.astype(jnp.bfloat16))

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,
        grid=(m // TM,),
        in_specs=in_specs,
        out_specs=out_specs if n_outs == 2 else out_specs[0],
        scratch_shapes=[
            pltpu.VMEM((groups, 2, TN, 128), jnp.bfloat16),
            pltpu.VMEM((2, TN, 128), jnp.bfloat16),
            pltpu.SemaphoreType.DMA((groups, 2)),
            pltpu.SemaphoreType.DMA((2,)),
        ],
    )
    fn = pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=out_shape if n_outs == 2 else out_shape[0],
        compiler_params=pltpu.CompilerParams(vmem_limit_bytes=64 * 1024 * 1024),
    )
    t0 = time.perf_counter()
    out = fn(lo, nb, *args)
    for leaf in jax.tree_util.tree_leaves(out):
        float(jnp.asarray(leaf).ravel()[0])
    print(f"{label:44s} ok {time.perf_counter() - t0:6.1f} s", flush=True)


def body_common(lo_ref, nb_ref, nbr_ref, w_ref, src_hbm, heads, tails, hsem, tsem, use_dw, f_ref=None):
    """Returns (acc_dx, acc_dw_total or None)."""
    t = pl.program_id(0)
    nbr_tile = nbr_ref[:]
    iota_n = jax.lax.broadcasted_iota(jnp.int32, (TM, TN), 1)
    acc = jnp.zeros((TM, c), jnp.float32)
    dw_total = []

    @pl.when(t == 0)
    def _():
        for g0 in range(groups):

            @pl.when(nb_ref[g0, 0] > 0)
            def _(g0=g0):
                pltpu.make_async_copy(
                    src_hbm.at[pl.ds(lo_ref[g0, 0] * TN, TN)], heads.at[g0, 0], hsem.at[g0, 0]
                ).start()

    for g in range(groups):
        lo_g = lo_ref[g, t]
        nblocks = nb_ref[g, t]
        locals_g = nbr_tile[:, g * gsize : (g + 1) * gsize]
        wg = w_ref[g * gsize : (g + 1) * gsize]
        tnext = jnp.minimum(t + 1, pl.num_programs(0) - 1)

        @pl.when((t + 1 < pl.num_programs(0)) & (nb_ref[g, tnext] > 0))
        def _(g=g, tnext=tnext):
            pltpu.make_async_copy(
                src_hbm.at[pl.ds(lo_ref[g, tnext] * TN, TN)],
                heads.at[g, jax.lax.rem(tnext, 2)],
                hsem.at[g, jax.lax.rem(tnext, 2)],
            ).start()

        def tail_dma(bi, lo_g=lo_g):
            slot = (bi - 1) & 1
            return pltpu.make_async_copy(
                src_hbm.at[pl.ds((lo_g + bi) * TN, TN)], tails.at[slot], tsem.at[slot]
            )

        @pl.when(nblocks > 1)
        def _(tail_dma=tail_dma):
            tail_dma(1).start()

        def body(bi, carry, g=g, lo_g=lo_g, nblocks=nblocks, locals_g=locals_g, wg=wg, tail_dma=tail_dma):
            if use_dw:
                acc, acc_dw = carry
            else:
                acc = carry

            @pl.when((bi >= 1) & (bi + 1 < nblocks))
            def _():
                tail_dma(bi + 1).start()

            @pl.when(bi == 0)
            def _():
                pltpu.make_async_copy(
                    src_hbm.at[pl.ds(lo_ref[g, t] * TN, TN)],
                    heads.at[g, jax.lax.rem(t, 2)],
                    hsem.at[g, jax.lax.rem(t, 2)],
                ).wait()

            @pl.when(bi > 0)
            def _():
                tail_dma(bi).wait()

            hblk = heads[g, jax.lax.rem(t, 2)][:, :c]
            tblk = tails[(bi - 1) & 1][:, :c]
            blk = jnp.where(bi == 0, hblk, tblk)
            onehot = jnp.stack(
                [
                    (locals_g[:, j][:, None] - (lo_g + bi) * TN == iota_n).astype(jnp.bfloat16)
                    for j in range(gsize)
                ],
                axis=0,
            )
            gathered = jax.lax.dot_general(
                onehot,
                jnp.broadcast_to(blk[None], (gsize, TN, c)),
                dimension_numbers=(((2,), (1,)), ((0,), (0,))),
                preferred_element_type=jnp.float32,
            ).astype(jnp.bfloat16)
            part = jax.lax.dot_general(
                gathered, wg, dimension_numbers=(((2,), (1,)), ((0,), (0,))),
                preferred_element_type=jnp.float32,
            )
            if not use_dw:
                return acc + part.sum(axis=0)
            f_t = f_ref[:]
            f_b = jnp.broadcast_to(f_t[None], (gsize, c, TM))
            dwp = jax.lax.dot_general(
                f_b, gathered, dimension_numbers=(((2,), (1,)), ((0,), (0,))),
                preferred_element_type=jnp.float32,
            )
            return acc + part.sum(axis=0), acc_dw + dwp

        if use_dw:
            acc, acc_dw = jax.lax.fori_loop(
                0, nblocks, body, (acc, jnp.zeros((gsize, c, c), jnp.float32))
            )
            dw_total.append((g, acc_dw))
        else:
            acc = jax.lax.fori_loop(0, nblocks, body, acc)
    return acc, dw_total


# variant A: fwd structure only (sanity: known good)
def kA(lo_ref, nb_ref, nbr_ref, w_ref, src_hbm, dx_ref, heads, tails, hsem, tsem):
    acc, _ = body_common(lo_ref, nb_ref, nbr_ref, w_ref, src_hbm, heads, tails, hsem, tsem, False)
    dx_ref[:] = acc


launch(kA, 1, False, "A fwd-only")


# variant B: + second revisited output, written CONSTANT (no dw math)
def kB(lo_ref, nb_ref, nbr_ref, w_ref, src_hbm, dx_ref, dw_ref, heads, tails, hsem, tsem):
    t = pl.program_id(0)
    acc, _ = body_common(lo_ref, nb_ref, nbr_ref, w_ref, src_hbm, heads, tails, hsem, tsem, False)

    @pl.when(t == 0)
    def _():
        dw_ref[:] = jnp.zeros((k, c, c), jnp.float32)

    dx_ref[:] = acc


launch(kB, 2, False, "B + revisited dw out (zeros)")


# variant C: + tuple carry with dw math, accumulate into dw_ref
def kC(lo_ref, nb_ref, nbr_ref, w_ref, f_ref, src_hbm, dx_ref, dw_ref, heads, tails, hsem, tsem):
    t = pl.program_id(0)

    @pl.when(t == 0)
    def _():
        dw_ref[:] = jnp.zeros((k, c, c), jnp.float32)

    acc, dw_total = body_common(
        lo_ref, nb_ref, nbr_ref, w_ref, src_hbm, heads, tails, hsem, tsem, True, f_ref
    )
    for g, acc_dw in dw_total:
        dw_ref[g * gsize : (g + 1) * gsize] += acc_dw
    dx_ref[:] = acc


launch(kC, 2, True, "C + dw math, carry, RMW")
