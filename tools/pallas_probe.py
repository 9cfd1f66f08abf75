"""Probe Mosaic/Pallas capabilities on this chip: dynamic VMEM gather support."""
import sys, os, time
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import numpy as np
import jax, jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

def trivial():
    def kernel(x_ref, o_ref):
        o_ref[:] = x_ref[:] * 2.0
    x = jnp.ones((256, 128), jnp.float32)
    out = pl.pallas_call(kernel, out_shape=jax.ShapeDtypeStruct(x.shape, x.dtype),
                         in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)],
                         out_specs=pl.BlockSpec(memory_space=pltpu.VMEM))(x)
    print("trivial pallas:", float(out[0,0]), flush=True)

def vmem_row_gather():
    # gather rows of a VMEM-resident table by an index vector
    N, M, C = 2048, 512, 128
    def kernel(tab_ref, idx_ref, o_ref):
        idx = idx_ref[:]                      # [M] int32
        o_ref[:] = tab_ref[idx]               # dynamic row gather from VMEM
    tab = jnp.asarray(np.random.default_rng(0).normal(size=(N, C)).astype(np.float32))
    idx = jnp.asarray(np.sort(np.random.default_rng(1).integers(0, N, M)).astype(np.int32))
    out = pl.pallas_call(kernel, out_shape=jax.ShapeDtypeStruct((M, C), jnp.float32),
                         in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM),
                                   pl.BlockSpec(memory_space=pltpu.VMEM)],
                         out_specs=pl.BlockSpec(memory_space=pltpu.VMEM))(tab, idx)
    expect = np.asarray(tab)[np.asarray(idx)]
    ok = np.allclose(np.asarray(out), expect)
    print("vmem row gather works:", ok, flush=True)

def vmem_value_gather():
    # 1D value gather
    N, M = 4096, 1024
    def kernel(tab_ref, idx_ref, o_ref):
        o_ref[:] = tab_ref[idx_ref[:]]
    tab = jnp.arange(N, dtype=jnp.float32)
    idx = jnp.asarray(np.random.default_rng(2).integers(0, N, M).astype(np.int32))
    out = pl.pallas_call(kernel, out_shape=jax.ShapeDtypeStruct((M,), jnp.float32),
                         in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM),
                                   pl.BlockSpec(memory_space=pltpu.VMEM)],
                         out_specs=pl.BlockSpec(memory_space=pltpu.VMEM))(tab, idx)
    ok = np.allclose(np.asarray(out), np.asarray(tab)[np.asarray(idx)])
    print("vmem 1d value gather works:", ok, flush=True)

def take_along_axis_kernel():
    # jnp.take_along_axis inside kernel
    N, M, C = 2048, 512, 128
    def kernel(tab_ref, idx_ref, o_ref):
        o_ref[:] = jnp.take(tab_ref[:], idx_ref[:], axis=0)
    tab = jnp.asarray(np.random.default_rng(0).normal(size=(N, C)).astype(np.float32))
    idx = jnp.asarray(np.random.default_rng(1).integers(0, N, M).astype(np.int32))
    out = pl.pallas_call(kernel, out_shape=jax.ShapeDtypeStruct((M, C), jnp.float32),
                         in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM),
                                   pl.BlockSpec(memory_space=pltpu.VMEM)],
                         out_specs=pl.BlockSpec(memory_space=pltpu.VMEM))(tab, idx)
    ok = np.allclose(np.asarray(out), np.asarray(tab)[np.asarray(idx)])
    print("jnp.take in kernel works:", ok, flush=True)

for name, fn in [("trivial", trivial), ("vmem_row_gather", vmem_row_gather),
                 ("vmem_value_gather", vmem_value_gather), ("take_along_axis", take_along_axis_kernel)]:
    try:
        fn()
    except Exception as e:
        print(f"{name} FAILED: {type(e).__name__}: {str(e)[:300]}", flush=True)
