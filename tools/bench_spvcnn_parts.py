"""SPVCNN end-to-end decomposition with on-device scan timing (B=4)."""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import numpy as np
import jax
import jax.numpy as jnp

from lidal_tpu.tpu_init import setup

setup()
from lidal_tpu.data.pipeline import prepare_eval_batch
from lidal_tpu.models import SPVCNN
from lidal_tpu.ops.devoxelize import (
    build_point_plan,
    devoxelize_trilinear_batched,
    point_to_voxel_avg_batched,
)
from tools.bench_suite import device_time


def synth(rng, n=120_000):
    n_g = int(n * 0.6)
    n_w = n - n_g
    r = 2 + 78 * rng.random(n_g) ** 1.5
    th = rng.uniform(0, 2 * np.pi, n_g)
    ground = np.stack([r * np.cos(th), r * np.sin(th), 0.05 * rng.standard_normal(n_g)], 1)
    cx, cy = rng.uniform(-60, 60, (2, 24))
    wi = rng.integers(0, 24, n_w)
    walls = np.stack(
        [
            cx[wi] + rng.normal(scale=2.0, size=n_w),
            cy[wi] + rng.normal(scale=2.0, size=n_w),
            rng.uniform(0, 4, n_w),
        ],
        1,
    )
    return np.concatenate([ground, walls]).astype(np.float32)

def main():
    B, P = 4, 131072
    caps = (131072, 49152, 16384, 6144, 2048)
    rng = np.random.default_rng(0)
    xyz = np.zeros((B, P, 3), np.float32)
    sig = np.zeros((B, P), np.float32)
    valid = np.zeros((B, P), bool)
    for b in range(B):
        f = synth(rng)
        xyz[b, : len(f)] = f
        sig[b, : len(f)] = rng.random(len(f))
        valid[b, : len(f)] = True
    xyz_j, sig_j, valid_j = jnp.asarray(xyz), jnp.asarray(sig), jnp.asarray(valid)
    
    keys0 = jax.random.split(jax.random.PRNGKey(0), B)
    eb0 = prepare_eval_batch(keys0, xyz_j, sig_j, valid_j, level_caps=caps, with_points=True)
    
    spv = SPVCNN(num_classes=19)
    vars_spv = jax.jit(spv.init, static_argnames=("train",))(
        jax.random.PRNGKey(1), eb0.feats, eb0.plan, eb0.pplan, train=False
    )
    def p(name, ms):
        print(f"{name:44s} {ms:8.2f} ms/batch", flush=True)
    
    
    def keys_of(i):
        return jax.random.split(jax.random.fold_in(jax.random.PRNGKey(7), i), B)
    
    
    # 1. prepare without points (aug + voxelize + plan)
    def prep_novox(i, xyz, sig, valid):
        eb = prepare_eval_batch(keys_of(i), xyz, sig, valid, level_caps=caps)
        return eb.plan.levels[0].nbr3[:, :, :2], eb.feats
    
    
    p("prepare (no pplan)", device_time(prep_novox, (xyz_j, sig_j, valid_j), iters=8))
    
    
    # 2. prepare WITH point plan
    def prep_points(i, xyz, sig, valid):
        eb = prepare_eval_batch(keys_of(i), xyz, sig, valid, level_caps=caps, with_points=True)
        return eb.pplan.tri2.idx8[:, :2], eb.pplan.avg4.anc[:2], eb.feats
    
    
    p("prepare (with pplan)", device_time(prep_points, (xyz_j, sig_j, valid_j), iters=8))
    
    
    # 3. pplan build alone from a fixed plan
    def pplan_only(i, plan_levels, plan_downs):
        import dataclasses
    
        lv0 = plan_levels[0]
        lv0 = type(lv0)(*( (lv0.coords + (i & 1),) + tuple(lv0[1:]) ))
        pp = build_point_plan(type(eb0.plan)(levels=(lv0,) + tuple(plan_levels[1:]), downs=plan_downs))
        return pp.tri2.idx8[:, :2], pp.tri4.idx8[:, :2]
    
    
    p(
        "pplan build alone",
        device_time(pplan_only, (eb0.plan.levels, eb0.plan.downs), iters=8),
    )
    
    
    # 4. SPVCNN forward on fixed prepared batch
    def fwd_spv(i, feats, plan, pplan):
        return spv.apply(vars_spv, feats + (i & 1) * 1e-6, plan, pplan, train=False)[0]
    
    
    p("SPVCNN forward", device_time(fwd_spv, (eb0.feats, eb0.plan, eb0.pplan), iters=8))
    
    
    # 6. point ops alone (the gather8 paths): tri4 + tri2 + p2v4 + p2v2
    cs = 256
    vf4 = jnp.asarray(np.random.default_rng(1).standard_normal((B, caps[4], cs)), jnp.float32)
    vf2 = jnp.asarray(np.random.default_rng(2).standard_normal((B, caps[2], 96)), jnp.float32)
    pf = jnp.asarray(np.random.default_rng(3).standard_normal((B, caps[0], cs)), jnp.float32)
    
    
    def tri_ops(i, vf4, vf2):
        a = devoxelize_trilinear_batched(vf4 + (i & 1) * 1e-6, eb0.pplan.tri4)
        b2 = devoxelize_trilinear_batched(vf2 + (i & 1) * 1e-6, eb0.pplan.tri2)
        return a[:, :2, :2], b2[:, :2, :2]
    
    
    p("tri4 (c256) + tri2 (c96)", device_time(tri_ops, (vf4, vf2), iters=8))
    
    
    def p2v_ops(i, pf):
        a = point_to_voxel_avg_batched(pf + (i & 1) * 1e-6, eb0.plan.downs, eb0.pplan.avg4, levels=4)
        b2 = point_to_voxel_avg_batched(pf + (i & 1) * 1e-6, eb0.plan.downs, eb0.pplan.avg2, levels=2)
        return a[:, :2, :2], b2[:, :2, :2]
    
    
    p("p2v avg4 + avg2 (c256)", device_time(p2v_ops, (pf,), iters=8))


if __name__ == "__main__":
    main()
