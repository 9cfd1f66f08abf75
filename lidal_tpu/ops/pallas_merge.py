"""Pallas bitonic merge-rank kernel (the kernel-map / NN-match lookup core).

One grid step per query stream.  The stream's bitonic sequence (table ++
reversed queries, flag in the lo-key's low bit — see ``merge_lookup``) lives in
VMEM as [r, 128] with flat merged index = row * 128 + lane.  The kernel:

1. runs all log2(L) compare-exchange stages in VMEM — strides >= 128 are
   sublane rolls, strides < 128 are native lane rotations (``pltpu.roll``);
   no HBM traffic between stages;
2. computes the table-count prefix over the flat order: ONE triangular matmul
   on the MXU for the in-row (128-lane) part + a log-step Hillis-Steele scan
   of per-row totals on the sublane axis;
3. emits, per merged slot, the looked-up value (lower bound, or ``n`` on a
   miss when ``with_found``) and the target query index (``m`` for table
   slots) — one XLA scatter outside the kernel writes the [G, m] result.

This replaces an 18-stage XLA roll chain that ran ~10x slower and blew up
XLA compile time when embedded in the (scanned) multi-level plan builder.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

# Python int (not the jnp scalar in ops.hashing — kernels may not capture
# traced constants)
_SENT = 2**31 - 1

# Dense-output strategy: the serial per-row masked-store loop (False) costs
# ~0.3 ms of the ~0.42 ms per stream (r sequential iterations); the vectorized
# path (True) rotates ALL rows at once (one lane dynamic_gather) and places
# them with a one-hot row-assignment MATMUL — exact, since packed values fit
# 23 bits < f32's 24-bit mantissa and one-hot rows sum disjoint slots.
MATMUL_STORE = True


def _roll(x, shift: int, axis: int):
    """Static roll.  Sublane (axis 0) rolls lower as two static slices + a
    concat; lane (axis 1) rolls use the native VPU rotation."""
    if axis == 0:
        s = shift % x.shape[0]
        if s == 0:
            return x
        return jnp.concatenate([x[-s:], x[:-s]], axis=0)
    return pltpu.roll(x, shift, axis)


def _stage(eh, el, axis: int, bit: int):
    """Compare-exchange with partner = index XOR ``bit`` along ``axis``."""
    size = eh.shape[axis]
    idx = jax.lax.broadcasted_iota(jnp.int32, eh.shape, axis)
    pos = (idx & bit) == 0
    fwd, bwd = size - bit, bit  # roll shifts: -bit and +bit (mod size)
    ph = jnp.where(pos, _roll(eh, fwd, axis), _roll(eh, bwd, axis))
    pl_ = jnp.where(pos, _roll(el, fwd, axis), _roll(el, bwd, axis))
    part_less = (ph < eh) | ((ph == eh) & (pl_ < el))
    self_less = (eh < ph) | ((eh == ph) & (el < pl_))
    # boolean logic, not select: Mosaic cannot select between i1 vectors
    take = (pos & part_less) | (~pos & self_less)
    return jnp.where(take, ph, eh), jnp.where(take, pl_, el)


def _make_kernel(r: int, n: int, m_pad: int, with_found: bool, matmul_store: bool):
    lp = r * 128
    vbits = max(1, n.bit_length())  # val in [0, n] fits (n < 2**bit_length)
    assert vbits + 8 <= 31, n  # (is_table, lane, val) packs into int32

    def _kernel(eh_ref, el_ref, out_ref, vals_scr, pre_scr):
        eh = eh_ref[0]  # [r, 128]
        el = el_ref[0]

        s = lp >> 1
        while s >= 128:
            eh, el = _stage(eh, el, axis=0, bit=s // 128)
            s >>= 1
        while s >= 1:
            eh, el = _stage(eh, el, axis=1, bit=s)
            s >>= 1

        is_t_i = el & 1  # 1 for table elements (incl. table sentinels)
        is_t = is_t_i.astype(jnp.float32)
        tri = jnp.triu(jnp.ones((128, 128), jnp.float32), k=1)  # tri[k,l]=1 for k<l
        in_row = jnp.dot(is_t, tri, preferred_element_type=jnp.float32)  # exclusive
        row_tot = jnp.sum(is_t, axis=1, keepdims=True)  # [r, 1]
        row_idx = jax.lax.broadcasted_iota(jnp.int32, (r, 1), 0)
        pre = row_tot
        k = 1
        while k < r:
            rolled = _roll(pre, k, 0)
            pre = pre + jnp.where(row_idx >= k, rolled, 0.0)
            k <<= 1
        row_pre = pre - row_tot  # exclusive over rows
        tpre = (in_row + row_pre).astype(jnp.int32)  # [r, 128]

        lane = jax.lax.broadcasted_iota(jnp.int32, (r, 128), 1)

        if with_found:
            # hit <=> next merged element is a table entry with an equal key
            nh = _roll(eh, 127, 1)  # next-in-row (lane l <- l+1)
            nl = _roll(el, 127, 1)
            bh = _roll(eh[:, 0:1], r - 1, 0)  # first lane of the next row
            bl = _roll(el[:, 0:1], r - 1, 0)
            at_last = lane == 127
            nh = jnp.where(at_last, bh, nh)
            nl = jnp.where(at_last, bl, nl)
            found = (
                ((nl & 1) == 1)
                & (nh == eh)
                & ((nl >> 1) == (el >> 1))
                & (eh != _SENT)
            )
            val = jnp.where(found, tpre, n)
        else:
            val = tpre

        # ---- in-kernel compaction: queries to row front, then dense rows ----
        # Pack (is_table, lane, val) and bitonic-sort each 128-lane row: query
        # slots land at the row front in lane (== query-rank) order, values
        # ride in the low bits.  An XLA scatter for this cost ~16 ms; this
        # whole sort is a few dozen lane-roll stages in VMEM.
        pk = (is_t_i << (vbits + 7)) | (lane << vbits) | val
        for p in range(1, 8):
            up = (lane & (1 << p)) == 0  # ascending block (p=7: single asc run)
            for q in range(p - 1, -1, -1):
                bit = 1 << q
                pos = (lane & bit) == 0
                partner = jnp.where(
                    pos, pltpu.roll(pk, 128 - bit, 1), pltpu.roll(pk, bit, 1)
                )
                part_less = partner < pk
                self_less = pk < partner
                sel_min = ~(pos ^ up)  # keep the smaller here?
                take = (sel_min & part_less) | (~sel_min & self_less)
                pk = jnp.where(take, partner, pk)

        vals = pk & ((1 << vbits) - 1)  # [r, 128]; row-front in rank order

        # Row r's queries start at flat position qs = r*128 - table_prefix(r);
        # rows holding only pad/sentinel query ranks (>= m) clamp into the
        # margin rows and never touch real slots.
        r_iota = jax.lax.broadcasted_iota(jnp.int32, (r, 1), 0)
        qs = jnp.minimum(r_iota * 128 - row_pre.astype(jnp.int32), m_pad - 256)
        a = qs >> 7  # [r, 1] first output row
        b = qs - (a << 7)  # [r, 1] lane offset within it
        cntq = (128.0 - row_tot).astype(jnp.int32)  # [r, 1] queries in the row

        if matmul_store:
            # Rotate every row by its own b in ONE lane gather (value index i
            # -> lane (i + b) % 128), mask to the exact per-row valid spans
            # (flat slots are globally unique, so masked pieces are disjoint
            # and may be SUMMED), then place rows with a one-hot assignment
            # matmul: out[o] = sum_r (a[r] == o) * loPart[r] + (a[r]+1 == o)
            # * hiPart[r].  Exact: vals < 2**23 <= f32 mantissa.
            idx = (lane - b) & 127  # [r, 128]; also the pre-rotation index
            rolled = jnp.take_along_axis(vals, idx, axis=1)
            valid = idx < cntq
            m1 = jnp.where(valid & (lane >= b), rolled, 0).astype(jnp.float32)
            m2 = jnp.where(valid & (lane < b), rolled, 0).astype(jnp.float32)
            a_t = jnp.swapaxes(a, 0, 1).astype(jnp.float32)  # [1, r]
            rows_out = m_pad // 128
            chunk = 256
            o0 = 0
            while o0 < rows_out:
                oc = min(chunk, rows_out - o0)
                oid = (
                    jax.lax.broadcasted_iota(jnp.int32, (oc, 1), 0) + o0
                ).astype(jnp.float32)
                p1 = (a_t == oid).astype(jnp.float32)  # [oc, r]
                p2 = (a_t == oid - 1.0).astype(jnp.float32)
                outc = jax.lax.dot_general(
                    p1, m1, dimension_numbers=(((1,), (0,)), ((), ())),
                    preferred_element_type=jnp.float32,
                ) + jax.lax.dot_general(
                    p2, m2, dimension_numbers=(((1,), (0,)), ((), ())),
                    preferred_element_type=jnp.float32,
                )
                out_ref[0, o0 : o0 + oc, :] = outc.astype(jnp.int32)
                o0 += oc
            return

        vals_scr[:, :] = vals
        pre_scr[:, :] = qs

        # Serial fallback: each row rotates by qs%128 and lands as TWO masked
        # row-aligned stores; the garbage tail past the row's query count is
        # overwritten by the following rows' stores (sequential loop).
        lane1 = jax.lax.broadcasted_iota(jnp.int32, (1, 128), 1)

        def store_row(r_, _):
            qs_r = pre_scr[r_, 0]
            a_r = qs_r // 128
            b_r = qs_r - a_r * 128
            row = vals_scr[pl.ds(r_, 1), :]  # [1, 128]
            rot = pltpu.roll(row, b_r, 1)  # value i -> lane (i + b) % 128
            first = lane1 >= b_r
            pltpu.store(out_ref.at[0, pl.ds(a_r, 1), :], rot, mask=first)
            pltpu.store(out_ref.at[0, pl.ds(a_r + 1, 1), :], rot, mask=~first)
            return 0

        jax.lax.fori_loop(0, r, store_row, 0)

    return _kernel


@functools.partial(jax.jit, static_argnames=("n", "m", "with_found", "interpret"))
def merge_rank_pallas(
    eh3: jnp.ndarray,  # [G, r, 128] bitonic (hi) keys
    el3: jnp.ndarray,  # [G, r, 128] bitonic (lo<<1 | is_table) keys
    n: int,
    m: int,
    with_found: bool,
    interpret: bool = False,
):
    """Returns the dense per-query results [G, m]: the lower bound of each
    query in the table (or, with ``with_found``, the matching table index and
    ``n`` for misses).  Queries are identified by their rank in the merged
    order, which equals their original index — no scatter needed anywhere."""
    g, r, _ = eh3.shape
    m_pad = -(-m // 128) * 128 + 256  # two rows of store margin
    kernel = _make_kernel(r, n, m_pad, with_found, MATMUL_STORE)
    out = pl.pallas_call(
        kernel,
        grid=(g,),
        in_specs=[
            pl.BlockSpec((1, r, 128), lambda i: (i, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, r, 128), lambda i: (i, 0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec(
            (1, m_pad // 128, 128), lambda i: (i, 0, 0), memory_space=pltpu.VMEM
        ),
        out_shape=jax.ShapeDtypeStruct((g, m_pad // 128, 128), jnp.int32),
        scratch_shapes=[
            pltpu.VMEM((r, 128), jnp.int32),
            pltpu.VMEM((r, 1), jnp.int32),
        ],
        # B=8 batches push the per-step stack allocation just past the 16 MiB
        # default scoped-vmem budget (16.07M at [208, 1026, 128] s32); v5e has
        # 128 MiB of VMEM, so give this kernel the same headroom as the convs.
        compiler_params=pltpu.CompilerParams(vmem_limit_bytes=64 * 1024 * 1024),
        interpret=interpret,
    )(eh3, el3)
    return out.reshape(g, m_pad)[:, :m]
