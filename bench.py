"""Benchmark: MinkUNet inference points/sec on SemanticKITTI-scale synthetic frames.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.

The timed quantity is end-to-end single-chip inference of new frames — on-device
augment + voxelize + multi-level kernel-map (plan) build + MinkUNet forward —
i.e. the same work the reference does per frame with torchsparse (which also
rebuilds kernel maps per batch).  ``vs_baseline`` is measured against an estimated
reference GPU throughput of 1.2e6 points/s (MinkUNet + torchsparse 1.4 on a
2080Ti-class GPU runs SemanticKITTI val at ~10 frames/s x ~120k pts; the repo
publishes no numbers — BASELINE.md).  North star: >= 5x => vs_baseline >= 5.
"""

from __future__ import annotations

import json
import time

import numpy as np

REFERENCE_POINTS_PER_SEC = 1.2e6


def synthetic_sk_frame(rng, n=120_000):
    """Surface-like LiDAR frame (ground rings + structures) at SemanticKITTI scale."""
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
    xyz = np.concatenate([ground, walls]).astype(np.float32)
    sig = rng.random(n).astype(np.float32)
    return xyz, sig


def main() -> None:
    import jax

    from lidal_tpu.tpu_init import setup as _setup

    _setup()
    import jax.numpy as jnp

    from lidal_tpu.data.pipeline import prepare_eval_batch
    from lidal_tpu.models import MinkUNet

    rng = np.random.default_rng(0)
    B, P = 4, 131072
    caps = (131072, 49152, 16384, 6144, 2048)
    xyz = np.zeros((B, P, 3), np.float32)
    sig = np.zeros((B, P), np.float32)
    valid = np.zeros((B, P), bool)
    n_pts = 120_000
    for b in range(B):
        x, s = synthetic_sk_frame(rng, n_pts)
        xyz[b, :n_pts], sig[b, :n_pts], valid[b, :n_pts] = x, s, True

    xyz_j, sig_j, valid_j = jnp.asarray(xyz), jnp.asarray(sig), jnp.asarray(valid)

    model = MinkUNet(num_classes=19)

    def infer(variables, keys):
        eb = prepare_eval_batch(keys, xyz_j, sig_j, valid_j, level_caps=caps)
        logits, _ = model.apply(variables, eb.feats, eb.plan, train=False)
        return logits

    keys = jax.random.split(jax.random.PRNGKey(0), B)
    eb0 = prepare_eval_batch(keys, xyz_j, sig_j, valid_j, level_caps=caps)
    variables = jax.jit(model.init, static_argnames=("train",))(
        jax.random.PRNGKey(1), eb0.feats, eb0.plan, train=False
    )

    iters = 8

    # The measured loop lives ON DEVICE (lax.scan over iterations): per-call
    # graph dispatch through the tunneled backend costs ~1s for graphs this
    # size, which is orchestration overhead, not inference throughput.  A host
    # pull of the accumulated scalar is the only trustworthy completion fence
    # here (block_until_ready can return early on this backend).
    @jax.jit
    def run_iters(variables, seed):
        def step(carry, i):
            k = jax.random.split(jax.random.fold_in(seed, i), B)
            out = infer(variables, k)
            return carry + out.sum(), None

        acc, _ = jax.lax.scan(step, jnp.zeros(()), jnp.arange(iters))
        return acc

    acc = float(run_iters(variables, jax.random.PRNGKey(2)))  # compile + drain
    t0 = time.perf_counter()
    acc = float(run_iters(variables, jax.random.PRNGKey(3)))
    assert acc == acc  # finite
    dt = time.perf_counter() - t0

    pts_per_sec = B * n_pts * iters / dt

    # ---- second headline metric: LiDAL inter-frame scoring (frames/s) ----
    # One frame vs 24 pose-registered neighbors, production pattern: neighbor
    # grids + prob maps device-resident (the runner's sliding-window LRU).
    from lidal_tpu.active import lidal

    NEI, C = 24, 19
    q_xyz = np.zeros((P, 3), np.float32)
    q_xyz[:n_pts] = synthetic_sk_frame(rng, n_pts)[0]
    q_prob = np.zeros((P, C), np.float32)
    q_prob[:n_pts] = rng.dirichlet(np.ones(C), n_pts).astype(np.float32)
    nei_probs, nei_grids = [], []
    for i in range(NEI):
        nxyz, _ = synthetic_sk_frame(rng, n_pts)
        nxyz = nxyz + np.array([0.8 * (i - NEI // 2), 0.0, 0.0], np.float32)
        nprob = np.zeros((P, C), np.float32)
        nprob[:n_pts] = rng.dirichlet(np.ones(C), n_pts).astype(np.float32)
        nei_probs.append(jnp.asarray(nprob))
        nei_grids.append(lidal.make_neighbor_grid(nxyz, cap=P))
    lidal.score_frame(q_prob, q_xyz, nei_probs, nei_grids)  # compile + drain
    best = None
    for _ in range(2):
        t0 = time.perf_counter()
        interd, _ = lidal.score_frame(q_prob, q_xyz, nei_probs, nei_grids)
        assert np.isfinite(interd[:n_pts]).all()
        best = min(best or 1e9, time.perf_counter() - t0)
    frames_per_sec = 1.0 / best

    print(
        json.dumps(
            {
                "metric": "points/sec MinkUNet inference (SemanticKITTI); LiDAL scoring frames/sec",
                "value": round(pts_per_sec, 1),
                "unit": "points/s",
                "vs_baseline": round(pts_per_sec / REFERENCE_POINTS_PER_SEC, 3),
                "lidal_scoring_frames_per_sec": round(frames_per_sec, 3),
                "lidal_scoring_s_per_frame": round(best, 3),
            }
        )
    )


if __name__ == "__main__":
    main()
