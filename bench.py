"""Benchmark: MinkUNet inference points/sec on SemanticKITTI-scale synthetic frames.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.

The timed quantity is end-to-end single-chip inference of new frames — on-device
augment + voxelize + multi-level kernel-map (plan) build + MinkUNet forward —
i.e. the same work the reference does per frame with torchsparse (which also
rebuilds kernel maps per batch).  A second line reports SPVCNN (BASELINE
config 2) and a third the LiDAL scoring stage.

``vs_baseline`` divides by an ESTIMATED reference GPU throughput of 1.2e6
points/s.  Provenance + error bar (the repo publishes no numbers, BASELINE.md):
public MinkUNet/SPVCNN benchmarks on torchsparse 1.4-era CUDA report ~80-140 ms
per SemanticKITTI val batch of ~120k-point frames on a 2080Ti-class GPU
(~8-15 frames/s), i.e. ~1.0e6-1.8e6 points/s depending on GPU and measurement
scope; 1.2e6 is the midpoint of the conservative end.  Treat vs_baseline with
a +-30% error bar; the s/frame LiDAL scoring line is measured, not estimated.
North star: >= 5x => vs_baseline >= 5.
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

    import os

    rng = np.random.default_rng(0)
    B, P = int(os.environ.get("LIDAL_BENCH_B", "4")), 131072
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

    # Optional activation dtype for the inference A/B (the conv kernels stage
    # features in bf16 internally either way; this propagates bf16 BETWEEN
    # layers too, halving inter-conv HBM traffic).  Default f32 = parity path.
    act_dtype = jnp.bfloat16 if os.environ.get("LIDAL_BENCH_DTYPE") == "bfloat16" else None

    def infer(variables, keys):
        eb = prepare_eval_batch(keys, xyz_j, sig_j, valid_j, level_caps=caps)
        feats = eb.feats.astype(act_dtype) if act_dtype else eb.feats
        logits, _ = model.apply(variables, feats, eb.plan, train=False)
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

    if os.environ.get("LIDAL_BENCH_ONLY") == "mink":  # focused A/B runs
        print(json.dumps({"metric": "points/sec MinkUNet inference", "value": round(pts_per_sec, 1), "unit": "points/s", "vs_baseline": round(pts_per_sec / REFERENCE_POINTS_PER_SEC, 3)}))
        return

    # ---- second line: SPVCNN e2e inference (BASELINE config 2) ----
    from lidal_tpu.models import SPVCNN

    spv = SPVCNN(num_classes=19)

    def infer_spv(variables, keys):
        eb = prepare_eval_batch(keys, xyz_j, sig_j, valid_j, level_caps=caps, with_points=True)
        logits, _ = spv.apply(variables, eb.feats, eb.plan, eb.pplan, train=False)
        return logits

    eb0s = prepare_eval_batch(keys, xyz_j, sig_j, valid_j, level_caps=caps, with_points=True)
    vars_spv = jax.jit(spv.init, static_argnames=("train",))(
        jax.random.PRNGKey(1), eb0s.feats, eb0s.plan, eb0s.pplan, train=False
    )

    @jax.jit
    def run_iters_spv(variables, seed):
        def step(carry, i):
            k = jax.random.split(jax.random.fold_in(seed, i), B)
            return carry + infer_spv(variables, k).sum(), None

        acc, _ = jax.lax.scan(step, jnp.zeros(()), jnp.arange(iters))
        return acc

    float(run_iters_spv(vars_spv, jax.random.PRNGKey(2)))  # compile + drain
    t0 = time.perf_counter()
    acc = float(run_iters_spv(vars_spv, jax.random.PRNGKey(3)))
    assert acc == acc
    spv_pts_per_sec = B * n_pts * iters / (time.perf_counter() - t0)

    # ---- third headline metric: LiDAL inter-frame scoring (frames/s) ----
    # Production (ring-runner) pattern on ONE chip: neighbor grids + grid-sorted
    # prob maps device-resident in a 24-slot ring; per frame the sliding window
    # replaces 2 slots (in-place donated writes) and scoring is one band-NN
    # kernel launch + KL accumulation.  Steady state measured over K frames
    # including the 2 ring writes + query upload each.
    from lidal_tpu.active import lidal
    from lidal_tpu.active.lidal_runner import NeighborRing

    NEI, C, K = 24, 19, 4
    n_frames = NEI + 2 + 3 * K

    def synth_entry(i):
        nxyz = synthetic_sk_frame(rng, n_pts)[0] + np.array(
            [0.8 * (i - NEI // 2), 0.0, 0.0], np.float32
        )
        nprob = rng.dirichlet(np.ones(C), n_pts).astype(np.float32)
        return nxyz, nprob

    frames = [synth_entry(i) for i in range(n_frames)]
    ring = NeighborRing(NEI + 2, P)

    def warm(fi):
        ring.ensure([fi] + lidal.neighbor_ids(fi, n_frames), lambda k: frames[k])

    def dispatch(fi):
        """Steady-state frame: the query is ring-resident (zero upload);
        ensure() transfers only the one frame entering the window."""
        warm(fi)
        w = jnp.asarray(ring.weights(lidal.neighbor_ids(fi, n_frames)))
        return lidal.score_slot(ring.state, ring.key2slot[fi], w)

    f0 = NEI // 2
    interd, _ = dispatch(f0)  # compile + warm the ring
    assert np.isfinite(np.asarray(interd)[:n_pts]).all()
    best = None
    for rep in range(2):
        # the window keeps sliding forward: every measured frame does the
        # production steady-state work (1 new-neighbor upload + 1 ring write +
        # 1 score dispatch + 1 result pull), pipelined one frame deep
        t0 = time.perf_counter()
        pending = None
        for fi in range(f0 + 1 + rep * K, f0 + 1 + (rep + 1) * K):
            out = dispatch(fi)
            if pending is not None:
                np.asarray(pending[0])
            pending = out
        interd = np.asarray(pending[0])
        assert np.isfinite(interd[:n_pts]).all()
        best = min(best or 1e9, (time.perf_counter() - t0) / K)
    frames_per_sec = 1.0 / best

    print(
        json.dumps(
            {
                "metric": "points/sec MinkUNet inference (SemanticKITTI); LiDAL scoring frames/sec",
                "value": round(pts_per_sec, 1),
                "unit": "points/s",
                "vs_baseline": round(pts_per_sec / REFERENCE_POINTS_PER_SEC, 3),
                "spvcnn_points_per_sec": round(spv_pts_per_sec, 1),
                "lidal_scoring_frames_per_sec": round(frames_per_sec, 3),
                "lidal_scoring_s_per_frame": round(best, 3),
            }
        )
    )


if __name__ == "__main__":
    main()
