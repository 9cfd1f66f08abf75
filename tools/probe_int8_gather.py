"""Probe: EXACT int8 byte-gather for the banded conv kernel.

Idea: the conv kernel's dominant MXU cost is the one-hot gather matmul in
bf16 ([T, TN] @ [TN, ...]).  An int8 one-hot contracting against the bf16
feature block REINTERPRETED as two int8 byte planes ([TN, 2*cin]) selects the
exact byte values (one-hot rows have a single 1), runs at the MXU's 2x int8
rate, and the bf16 value is reconstructed bit-exactly from the two bytes:

    v_i32 = ((hi & 0xFF) << 8) | (lo & 0xFF)      # the bf16 bit pattern
    f32   = bitcast(v_i32 << 16)                  # bf16 bits -> f32 value

No quantization anywhere — this is a lossless re-encoding of the gather.

Questions this probe answers on the real chip:
1. does `dot_general(int8, int8, preferred_element_type=int32)` lower in
   Mosaic at all?
2. is it actually ~2x the bf16 rate inside this kernel shape?
3. does the byte reconstruction (mask/shift/bitcast) cost less than the
   MXU saving?

Compares a gather-first int8 variant of `subm_conv_pallas` against the
production kernel for (a) bitwise output parity, (b) device time.
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

from lidal_tpu.ops.pallas_conv import TILE_M, TILE_N, band_bounds, subm_conv_pallas, _VMEM_LIMIT
from tools.bench_suite import device_time


def _make_kernel_i8(k: int, cin: int, cin_pad: int, cout: int, groups: int):
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
            wg = w_ref[g * gsize : (g + 1) * gsize].astype(jnp.bfloat16)  # [gsize, cin_pad, cout]
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

            def body(bi, acc, g=g, lo=lo, nblocks=nblocks, locals_g=locals_g, wg=wg, tail_dma=tail_dma):
                @pl.when((bi >= 1) & (bi + 1 < nblocks))
                def _():
                    tail_dma(bi + 1).start()

                @pl.when(bi == 0)
                def _():
                    head_dma(g, t).wait()

                @pl.when(bi > 0)
                def _():
                    tail_dma(bi).wait()

                hblk = heads[g, jax.lax.rem(t, 2)]
                tblk = tails[(bi - 1) & 1]
                blk = jnp.where(bi == 0, hblk, tblk)  # [TN, 2*cin_pad] int8 (lo | hi planes)
                onehot = jnp.stack(
                    [
                        (locals_g[:, j][:, None] - (lo + bi) * TILE_N == iota_n).astype(jnp.int8)
                        for j in range(gsize)
                    ],
                    axis=0,
                )  # [gsize, T, TN] int8
                picked = jax.lax.dot_general(
                    onehot,
                    jnp.broadcast_to(blk[None], (gsize, TILE_N, 2 * cin_pad)),
                    dimension_numbers=(((2,), (1,)), ((0,), (0,))),
                    preferred_element_type=jnp.int32,
                )  # [gsize, T, 2*cin_pad] i32: exact byte values (or 0 when no match)
                lo_b = picked[:, :, :cin_pad] & 0xFF
                hi_b = picked[:, :, cin_pad:] & 0xFF
                bits = (hi_b << 24) | (lo_b << 16)  # bf16 bits in the f32 high half
                gathered = jax.lax.bitcast_convert_type(bits, jnp.float32).astype(jnp.bfloat16)
                part = jax.lax.dot_general(
                    gathered,
                    wg,
                    dimension_numbers=(((2,), (1,)), ((0,), (0,))),
                    preferred_element_type=jnp.float32,
                )  # [gsize, T, cout]
                return acc + part.sum(axis=0)

            acc = jax.lax.fori_loop(0, nblocks, body, acc)
        out_ref[:] = acc

    return _kernel


@functools.partial(jax.jit, static_argnames=("groups",))
def subm_conv_i8(feats, w, nbr, groups: int = 3):
    n, cin = feats.shape
    m, k = nbr.shape
    tiles = m // TILE_M
    cout = w.shape[2]
    lo, nb = band_bounds(nbr, n, groups)

    fb = feats.astype(jnp.bfloat16)
    cin_pad = -(-cin // 128) * 128
    if cin_pad != cin:
        fb = jnp.pad(fb, ((0, 0), (0, cin_pad - cin)))
    u16 = jax.lax.bitcast_convert_type(fb, jnp.uint16)  # [n, cin_pad]
    lo_plane = (u16 & 0xFF).astype(jnp.int8)
    hi_plane = (u16 >> 8).astype(jnp.int8)
    bytes_tbl = jnp.concatenate([lo_plane, hi_plane], axis=1)  # [n, 2*cin_pad] int8

    wpad = jnp.pad(w.astype(jnp.bfloat16), ((0, 0), (0, cin_pad - cin), (0, 0)))

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
            pltpu.VMEM((groups, 2, TILE_N, 2 * cin_pad), jnp.int8),
            pltpu.VMEM((2, TILE_N, 2 * cin_pad), jnp.int8),
            pltpu.SemaphoreType.DMA((groups, 2)),
            pltpu.SemaphoreType.DMA((2,)),
        ],
    )
    kernel = _make_kernel_i8(k, cin, cin_pad, cout, groups)
    return pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((m, cout), jnp.float32),
        compiler_params=_VMEM_LIMIT,
    )(lo, nb, nbr, wpad, bytes_tbl)


def make_nbr(rng, n, k, rows_per_x):
    """Banded synthetic rulebook shaped like a real frame's (see bench_conv_scan)."""
    base = np.arange(n, dtype=np.int64)
    cols = []
    for j in range(k):
        off = (j // 9 - 1) * rows_per_x + (j % 9 - 4) * max(1, rows_per_x // 18)
        idx = base + off + rng.integers(-3, 4, n)
        idx = np.where((idx < 0) | (idx >= n) | (rng.random(n) < 0.25), n, idx)
        cols.append(np.sort(idx))
    return np.stack(cols, 1).astype(np.int32)


def main():
    rng = np.random.default_rng(0)
    n = 131072
    for cin, cout in ((96, 96), (32, 32)):
        feats = jnp.asarray(rng.standard_normal((n, cin)), jnp.float32)
        w = jnp.asarray(0.1 * rng.standard_normal((27, cin, cout)), jnp.float32)
        nbr = jnp.asarray(make_nbr(rng, n, 27, max(300, n // 40)))

        ref = subm_conv_pallas(feats, w, nbr, groups=3)
        got = subm_conv_i8(feats, w, nbr, groups=3)
        diff = float(jnp.max(jnp.abs(ref - got)))
        print(f"c{cin}->{cout}: max |ref - i8| = {diff:g} (bitwise={diff == 0.0})", flush=True)

        def f_ref(i, f):
            return subm_conv_pallas(f + (i & 1).astype(f.dtype) * 1e-30, w, nbr, groups=3)

        def f_i8(i, f):
            return subm_conv_i8(f + (i & 1).astype(f.dtype) * 1e-30, w, nbr, groups=3)

        t_ref = device_time(f_ref, (feats,), iters=20)
        t_i8 = device_time(f_i8, (feats,), iters=20)
        print(f"c{cin}->{cout}: bf16 {t_ref:.2f} ms  int8-bytes {t_i8:.2f} ms", flush=True)


if __name__ == "__main__":
    main()
