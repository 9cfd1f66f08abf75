"""Benchmark: MinkUNet inference points/sec on SemanticKITTI-scale synthetic frames.

Prints an accumulating JSON line PER SECTION, flushed the moment each headline
is measured, so a timeout anywhere still leaves the driver a parseable record
(the LAST complete JSON line is always the most complete snapshot):

1. MinkUNet e2e inference (the headline ``value``) — on-device augment +
   voxelize + multi-level kernel-map (plan) build + forward, i.e. the same
   per-frame work the reference does with torchsparse (which also rebuilds
   kernel maps per batch).
2. LiDAL inter-frame scoring, steady-state s/frame (ring runner pattern).
3. SPVCNN e2e inference (BASELINE config 2).
4. Training-step throughput (fwd + combined dX/dW Pallas backward + Adam).
5. Multi-device aggregate: the PRODUCTION drivers (`run_prob_inference` +
   `run_lidal_round`, plus the FUSED single-pass round
   `run_fused_lidal_round` that computes both stages per frame without the
   prob-map host round trip) over all ``jax.local_devices()`` — aggregate
   points/s and scoring frames/s (scales with chip count; 1 on this rig).

A wall-clock budget (``LIDAL_BENCH_BUDGET_S``, default 1200 s) gates each
section: when the budget runs short the remaining sections are SKIPPED (listed
in the ``skipped`` field) instead of risking an unparseable timeout.  Each
section is also exception-isolated: a failure is recorded in ``errors`` and
the next section still runs.

``vs_baseline`` divides by an ESTIMATED reference GPU throughput of 1.2e6
points/s.  Provenance + error bar (the repo publishes no numbers, BASELINE.md):
public MinkUNet/SPVCNN benchmarks on torchsparse 1.4-era CUDA report ~80-140 ms
per SemanticKITTI val batch of ~120k-point frames on a 2080Ti-class GPU
(~8-15 frames/s), i.e. ~1.0e6-1.8e6 points/s depending on GPU and measurement
scope; 1.2e6 is the midpoint of the conservative end.  Treat vs_baseline with
a +-30% error bar; the s/frame LiDAL scoring line is measured, not estimated.
North star: >= 5x => vs_baseline >= 5.

Backend watchdog: a wedged TPU tunnel hangs *inside* ``make_c_api_client`` —
no in-process timeout can interrupt it (round-3 postmortem: the driver's whole
bench run died rc=124 with nothing printed).  So the default backend is probed
in a SUBPROCESS with a hard deadline first; if the probe dies or times out the
bench falls back to CPU on tiny shapes and says so in the ``backend``/``note``
fields — a small honest record beats an unparseable timeout.  A ``status``
line is also emitted before any compile starts so even a mid-compile kill
leaves the driver one parseable line.

Env knobs: LIDAL_BENCH_B (batch, int >= 1, default 4); LIDAL_BENCH_DTYPE
(``bfloat16`` to propagate bf16 activations between layers — opt-in lossy);
LIDAL_BENCH_ONLY=mink (stop after section 1, for focused A/B runs);
LIDAL_BENCH_BUDGET_S (section gate, seconds); LIDAL_BENCH_PROBE_S (backend
probe deadline, default 150 s, 0 disables the probe);
LIDAL_BENCH_PROBE_TRIES (probe attempts before the CPU fallback, default 2 —
tunnel wedges are often transient).
"""

from __future__ import annotations

import json
import os
import sys
import time

import numpy as np

REFERENCE_POINTS_PER_SEC = 1.2e6
METRIC_LABEL = "points/sec MinkUNet inference (SemanticKITTI); LiDAL scoring frames/sec"

_T0 = time.monotonic()
_RECORD: dict = {}
_BUDGET_S = 1200.0  # set from LIDAL_BENCH_BUDGET_S in main()


def _emit(**fields) -> None:
    """Merge fields into the running record and print it NOW (flushed)."""
    _RECORD.update(fields)
    print(json.dumps(_RECORD))
    sys.stdout.flush()


def _env_int(name: str, default: int, minimum: int = 1) -> int:
    raw = os.environ.get(name)
    if raw is None:
        return default
    try:
        val = int(raw)
    except ValueError:
        raise SystemExit(f"{name} must be an integer, got {raw!r}")
    if val < minimum:
        raise SystemExit(f"{name} must be >= {minimum}, got {val}")
    return val


def _env_float(name: str, default: float) -> float:
    raw = os.environ.get(name)
    if raw is None:
        return default
    try:
        return float(raw)
    except ValueError:
        raise SystemExit(f"{name} must be a number, got {raw!r}")


def _remaining(budget_s: float) -> float:
    return budget_s - (time.monotonic() - _T0)


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


N_PTS = 120_000
P_CAP = 131072
CAPS = (131072, 49152, 16384, 6144, 2048)
ITERS = 8


def _probe_backend(deadline_s: float) -> str | None:
    """Probe the default JAX backend in a subprocess with a hard deadline.

    Returns the platform name (``"tpu"``/``"cpu"``/...) or None if the probe
    crashed or hung past the deadline (e.g. a wedged axon tunnel, which hangs
    uninterruptibly inside client bring-up).
    """
    import subprocess

    code = (
        "import jax, sys; d = jax.devices(); "
        "import jax.numpy as jnp; jnp.ones(8).sum().block_until_ready(); "
        "sys.stdout.write(d[0].platform)"
    )
    try:
        res = subprocess.run(
            [sys.executable, "-c", code],
            timeout=deadline_s,
            capture_output=True,
            text=True,
        )
    except subprocess.TimeoutExpired:
        return None
    if res.returncode != 0:
        return None
    plat = res.stdout.strip().splitlines()[-1] if res.stdout.strip() else ""
    return plat or None


def _cpu_fallback_shapes() -> None:
    """Shrink the bench to CPU-compilable sizes (honest but tiny record)."""
    global N_PTS, P_CAP, CAPS, ITERS
    N_PTS = 6_000
    P_CAP = 8192
    CAPS = (8192, 4096, 2048, 1024, 512)
    ITERS = 2


def _frame_stack(rng, b: int):
    xyz = np.zeros((b, P_CAP, 3), np.float32)
    sig = np.zeros((b, P_CAP), np.float32)
    valid = np.zeros((b, P_CAP), bool)
    for i in range(b):
        x, s = synthetic_sk_frame(rng, N_PTS)
        xyz[i, :N_PTS], sig[i, :N_PTS], valid[i, :N_PTS] = x, s, True
    return xyz, sig, valid


def _bench_mink(rng, B: int):
    """Section 1: MinkUNet e2e inference points/s (the headline value)."""
    import jax
    import jax.numpy as jnp

    from lidal_tpu.data.pipeline import prepare_eval_batch
    from lidal_tpu.models import MinkUNet

    xyz, sig, valid = _frame_stack(rng, B)
    xyz_j, sig_j, valid_j = jnp.asarray(xyz), jnp.asarray(sig), jnp.asarray(valid)

    model = MinkUNet(num_classes=19)
    # Optional activation dtype for the inference A/B (the conv kernels stage
    # features in bf16 internally either way; this propagates bf16 BETWEEN
    # layers too, halving inter-conv HBM traffic).  Default f32 = parity path.
    act_dtype = jnp.bfloat16 if os.environ.get("LIDAL_BENCH_DTYPE") == "bfloat16" else None

    def infer(variables, keys):
        eb = prepare_eval_batch(keys, xyz_j, sig_j, valid_j, level_caps=CAPS)
        feats = eb.feats.astype(act_dtype) if act_dtype else eb.feats
        logits, _ = model.apply(variables, feats, eb.plan, train=False)
        return logits

    keys = jax.random.split(jax.random.PRNGKey(0), B)
    eb0 = prepare_eval_batch(keys, xyz_j, sig_j, valid_j, level_caps=CAPS)
    variables = jax.jit(model.init, static_argnames=("train",))(
        jax.random.PRNGKey(1), eb0.feats, eb0.plan, train=False
    )

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

        acc, _ = jax.lax.scan(step, jnp.zeros(()), jnp.arange(ITERS))
        return acc

    acc = float(run_iters(variables, jax.random.PRNGKey(2)))  # compile + drain
    t0 = time.perf_counter()
    acc = float(run_iters(variables, jax.random.PRNGKey(3)))
    assert acc == acc  # finite
    dt = time.perf_counter() - t0
    pts_per_sec = B * N_PTS * ITERS / dt
    return pts_per_sec, (xyz_j, sig_j, valid_j), variables


def _bench_lidal_ring(rng, B: int):
    """Section 2: LiDAL scoring steady-state s/frame (production ring pattern:
    neighbor grids + grid-sorted prob maps device-resident in a 24-slot ring;
    per frame the sliding window replaces 2 slots (in-place donated writes)
    and scoring is one band-NN kernel launch + KL accumulation).  Like the
    production ``run_lidal_round`` worker, the next frame's ring upload runs
    on an IO thread while the current frame scores, and the result pull of
    frame i-1 overlaps frame i's dispatch."""
    from concurrent.futures import ThreadPoolExecutor

    import jax.numpy as jnp

    from lidal_tpu.active import lidal
    from lidal_tpu.active.lidal_runner import NeighborRing

    NEI, C, K = 24, 19, 4
    n_frames = NEI + 2 + 3 * K

    def synth_entry(i):
        nxyz = synthetic_sk_frame(rng, N_PTS)[0] + np.array(
            [0.8 * (i - NEI // 2), 0.0, 0.0], np.float32
        )
        nprob = rng.dirichlet(np.ones(C), N_PTS).astype(np.float32)
        return nxyz, nprob

    frames = [synth_entry(i) for i in range(n_frames)]
    ring = NeighborRing(NEI + 2, P_CAP)
    io = ThreadPoolExecutor(max_workers=1)

    def prefetch(fi):
        """Warm the ring for frame fi (the one new window entrant uploads)."""
        ring.ensure([fi] + lidal.neighbor_ids(fi, n_frames), lambda k: frames[k])

    def dispatch(fi):
        """Steady-state frame: the query is ring-resident (zero upload)."""
        w = jnp.asarray(ring.weights(lidal.neighbor_ids(fi, n_frames)))
        return lidal.score_slot(ring.state, ring.key2slot[fi], w)

    f0 = NEI // 2
    prefetch(f0)
    scores = np.asarray(dispatch(f0))  # compile + warm the ring; [2, cap]
    assert np.isfinite(scores[0, :N_PTS]).all()
    best = None
    for rep in range(2):
        # the window keeps sliding forward: every measured frame does the
        # production steady-state work (1 new-neighbor upload on the IO
        # thread + 1 ring write + 1 score dispatch + 1 result pull),
        # pipelined one frame deep exactly like run_lidal_round's worker
        lo = f0 + 1 + rep * K
        nxt = io.submit(prefetch, lo)
        t0 = time.perf_counter()
        pending = None
        for fi in range(lo, lo + K):
            nxt.result()
            out = dispatch(fi)
            if fi + 1 < lo + K:
                nxt = io.submit(prefetch, fi + 1)
            if pending is not None:
                np.asarray(pending)  # one stacked [2, cap] pull per frame
            pending = out
        interd = np.asarray(pending)[0]
        assert np.isfinite(interd[:N_PTS]).all()
        best = min(best or 1e9, (time.perf_counter() - t0) / K)
    io.shutdown(wait=False)
    return best


def _bench_spvcnn(rng, B: int, frame_arrays):
    """Section 3: SPVCNN e2e inference points/s (BASELINE config 2)."""
    import jax
    import jax.numpy as jnp

    from lidal_tpu.data.pipeline import prepare_eval_batch
    from lidal_tpu.models import SPVCNN

    xyz_j, sig_j, valid_j = frame_arrays
    spv = SPVCNN(num_classes=19)

    def infer_spv(variables, keys):
        eb = prepare_eval_batch(keys, xyz_j, sig_j, valid_j, level_caps=CAPS, with_points=True)
        logits, _ = spv.apply(variables, eb.feats, eb.plan, eb.pplan, train=False)
        return logits

    keys = jax.random.split(jax.random.PRNGKey(0), B)
    eb0s = prepare_eval_batch(keys, xyz_j, sig_j, valid_j, level_caps=CAPS, with_points=True)
    vars_spv = jax.jit(spv.init, static_argnames=("train",))(
        jax.random.PRNGKey(1), eb0s.feats, eb0s.plan, eb0s.pplan, train=False
    )

    @jax.jit
    def run_iters_spv(variables, seed):
        def step(carry, i):
            k = jax.random.split(jax.random.fold_in(seed, i), B)
            return carry + infer_spv(variables, k).sum(), None

        acc, _ = jax.lax.scan(step, jnp.zeros(()), jnp.arange(ITERS))
        return acc

    float(run_iters_spv(vars_spv, jax.random.PRNGKey(2)))  # compile + drain
    t0 = time.perf_counter()
    acc = float(run_iters_spv(vars_spv, jax.random.PRNGKey(3)))
    assert acc == acc
    return B * N_PTS * ITERS / (time.perf_counter() - t0)


def _bench_train(rng, B: int):
    """Section 5: training-step throughput (MinkUNet forward + combined dX/dW
    Pallas backward + Adam, prebuilt batch — the per-iteration cost of the
    reference's 20k-step rounds).  4 chained steps under one on-device scan."""
    import jax
    import jax.numpy as jnp

    from lidal_tpu.data.pipeline import prepare_train_batch
    from lidal_tpu.models import MinkUNet
    from lidal_tpu.runtime.train import init_state, make_optimizer, make_train_step

    xyz = np.zeros((B, P_CAP, 3), np.float32)
    sig = np.zeros((B, P_CAP), np.float32)
    valid = np.zeros((B, P_CAP), bool)
    labels = np.full((B, P_CAP), 255, np.int32)
    for i in range(B):
        x, s = synthetic_sk_frame(rng, N_PTS)
        xyz[i, :N_PTS], sig[i, :N_PTS], valid[i, :N_PTS] = x, s, True
        labels[i, :N_PTS] = rng.integers(0, 19, N_PTS)
    keys = jax.random.split(jax.random.PRNGKey(0), B)
    tb = prepare_train_batch(
        keys, jnp.asarray(xyz), jnp.asarray(sig), jnp.asarray(valid),
        jnp.asarray(labels), level_caps=CAPS,
    )
    model = MinkUNet(num_classes=19)
    tx = make_optimizer()
    state = init_state(model, jax.random.PRNGKey(1), tb, tx)
    step = make_train_step(model, tx, with_points=False)
    n_steps = 4

    @jax.jit
    def run_steps(state, seed):
        def body(s, i):
            s2, loss = step(s, tb, jax.random.fold_in(seed, i))
            return s2, loss

        s, losses = jax.lax.scan(body, state, jnp.arange(n_steps))
        return losses.sum()

    float(run_steps(state, jax.random.PRNGKey(2)))  # compile + drain
    t0 = time.perf_counter()
    loss = float(run_steps(state, jax.random.PRNGKey(3)))
    assert loss == loss
    dt = time.perf_counter() - t0
    return {"train_points_per_sec": round(B * N_PTS * n_steps / dt, 1)}


def _bench_multidevice(rng, mink_variables):
    """Section 4: PRODUCTION drivers over all local devices.

    (a) ``run_prob_inference`` (the per-round multi-view dump, 8 views/frame,
    frames sharded contiguously over devices with per-device pipeline threads)
    -> aggregate forward points/s across the rig;
    (b) ``run_lidal_round`` (full scoring + greedy selection round writing flag
    files) -> aggregate scoring frames/s.  Both scale with device count.
    """
    import dataclasses
    import tempfile

    import jax

    from lidal_tpu.config import RunConfig, SK_CONFIG
    from lidal_tpu.runtime.prob_inference import run_prob_inference

    devices = jax.local_devices()
    nd = len(devices)
    out: dict = {"devices": nd}

    cfg = RunConfig(metric_name="LiDAL", label_unit="sv", r_id=1, inf_reps=8)

    # Each sub-measurement emits IMMEDIATELY (same crash-safety contract as
    # the top-level sections: a timeout mid-(c) must not lose (a) and (b)).

    # ---- (a) run_prob_inference: aggregate multi-view inference points/s ----
    from lidal_tpu.models import MinkUNet

    model = MinkUNet(num_classes=19)

    def eval_step(variables, feats, plan):
        return model.apply(variables, feats, plan, train=False)

    n_warm = nd  # one frame per device compiles + fills each pipeline
    # two dispatch blocks per device so the block pipeline (device computes
    # block i+1 while the host pulls block i) is actually exercised
    n_timed = 2 * cfg.frames_per_dispatch * nd
    frames = [synthetic_sk_frame(rng, N_PTS) for _ in range(max(n_warm, 2))]

    def read_fn(idx):
        x, s = frames[idx % len(frames)]
        return x, s, None

    def frame_id_fn(idx):
        return "00", f"{idx:06d}"

    run_prob_inference(
        cfg, eval_step, mink_variables, list(range(n_warm)), read_fn, frame_id_fn,
        save=False, devices=devices,
    )  # compile + warm every device
    t0 = time.perf_counter()
    run_prob_inference(
        cfg, eval_step, mink_variables, list(range(n_timed)), read_fn, frame_id_fn,
        save=False, devices=devices,
    )
    dt = time.perf_counter() - t0
    out["prob_inference_frames_per_sec"] = round(n_timed / dt, 3)
    # each of the 8 views is a full e2e forward of the frame
    out["aggregate_points_per_sec"] = round(n_timed * N_PTS * cfg.inf_reps / dt, 1)
    _emit(**out)
    out = {}

    # ---- (b) run_lidal_round: aggregate scoring frames/s -------------------
    from lidal_tpu.active.lidal_runner import run_lidal_round
    from lidal_tpu.data.selection import save_sv_info
    from lidal_tpu.runtime.paths import Paths, ensure_dir

    n_frames, n_sv = 8 * nd + 24, 20
    with tempfile.TemporaryDirectory() as tmp:
        lcfg = dataclasses.replace(
            cfg, processing_root=os.path.join(tmp, "proc"),
            checkpoint_root=os.path.join(tmp, "ckpt"),
        )
        p0 = Paths(dataclasses.replace(lcfg, r_id=0, label_unit="fr"))
        paths = Paths(lcfg)
        seq = "00"
        ensure_dir(p0.prob_dir(seq))
        grid_dir = ensure_dir(paths.grid_dir(seq))
        svi_dir = ensure_dir(paths.supervoxel_dir(seq, "KMeans"))
        svf_dir = ensure_dir(paths.sv_flag_dir(seq, r_id=0))
        gid = 0
        for fi in range(n_frames):
            name = f"{fi:06d}"
            xyz = frames[fi % len(frames)][0] + np.array([0.8 * fi, 0, 0], np.float32)
            np.savez(os.path.join(grid_dir, f"{name}.npz"), xyz=xyz)
            prob = rng.random((N_PTS, 19), np.float32) + 1e-3
            prob /= prob.sum(1, keepdims=True)
            np.save(os.path.join(p0.prob_dir(seq), f"{name}.npy"), prob)
            point2sv = (np.arange(N_PTS, dtype=np.int32) * n_sv) // N_PTS
            sv_gid = np.arange(gid, gid + n_sv, dtype=np.int64)
            gid += n_sv
            save_sv_info(os.path.join(svi_dir, f"{name}.npz"), point2sv, sv_gid)
            np.save(
                os.path.join(svf_dir, f"{name}.npy"),
                np.full(n_sv, 1 if fi == 0 else 0, np.int32),
            )
        t0 = time.perf_counter()
        res = run_lidal_round(lcfg, train_split=(seq,), devices=devices)
        dt = time.perf_counter() - t0
        assert res.sv_flags.shape == (n_frames * n_sv,)
        out["lidal_round_frames_per_sec"] = round(n_frames / dt, 3)
        _emit(**out)
        out = {}

        # ---- (c) FUSED single-pass round: inference feeds scoring on device,
        # replacing (a)+(b)'s per-frame prob-map download + npy + re-upload.
        # Each frame here pays the full 8-view inference AND the scoring, so
        # compare fused_round_frames_per_sec against the SERIAL combination
        # 1 / (1/prob_inference_fps + 1/lidal_round_fps).
        from lidal_tpu.active.lidal_runner import run_fused_lidal_round

        if _remaining(_BUDGET_S) < 240.0:
            out["skipped_fused"] = True
            return out

        def read_raw(s, name):
            x, sg = frames[int(name) % len(frames)]
            return x, sg

        frame_index = {(seq, f"{fi:06d}"): fi for fi in range(n_frames)}
        best = None
        for rep in range(2):  # first run pays the frames=1 graph compile
            t0 = time.perf_counter()
            resf = run_fused_lidal_round(
                lcfg, eval_step, mink_variables, read_raw, train_split=(seq,),
                devices=devices, save_prob=False, frame_index=frame_index,
            )
            dt = time.perf_counter() - t0
            best = dt if best is None else min(best, dt)
            assert resf.sv_flags.shape == (n_frames * n_sv,)
            # emit after EVERY rep: the cold number survives a timeout mid-warm
            _emit(fused_round_frames_per_sec=round(n_frames / best, 3),
                  fused_round_rep=rep)
    return out


def main() -> None:
    global _BUDGET_S
    B = _env_int("LIDAL_BENCH_B", 4)
    budget_s = _env_float("LIDAL_BENCH_BUDGET_S", 1200.0)
    _BUDGET_S = budget_s

    # ---- backend watchdog (BEFORE any in-process jax backend init) ----------
    probe_s = _env_float("LIDAL_BENCH_PROBE_S", 150.0)
    tries = _env_int("LIDAL_BENCH_PROBE_TRIES", 2)
    backend = None
    if probe_s > 0:
        # Retry hung probes: tunnel wedges are often transient (a remote
        # compile queue drains) and a recovered TPU record is worth a couple
        # of probe windows out of the budget.
        for attempt in range(tries):
            backend = _probe_backend(probe_s)
            if backend is not None:
                break
            if attempt + 1 < tries and _remaining(budget_s) > probe_s + 120.0:
                time.sleep(30.0)
            else:
                break
    else:
        backend = "unprobed"
    if backend is None:
        # Wedged/unreachable accelerator: fall back to CPU in-process (must
        # happen before the first backend use; env vars alone cannot switch
        # backends here — sitecustomize re-pins them at interpreter start).
        import jax

        jax.config.update("jax_platforms", "cpu")
        _cpu_fallback_shapes()
        backend = "cpu-fallback"

    from lidal_tpu.tpu_init import setup as _setup

    _setup()

    rng = np.random.default_rng(0)
    errors: list = []
    skipped: list = []

    # One parseable line before any compile starts: a mid-compile kill then
    # still leaves the driver a record (status flips to "ok" on completion).
    _emit(
        metric=METRIC_LABEL,
        value=0.0,
        unit="points/s",
        vs_baseline=0.0,
        status="startup",
        backend=backend,
        batch=B,
    )
    if backend == "cpu-fallback":
        _emit(note=(
            "accelerator probe failed or timed out; CPU fallback on tiny "
            f"shapes (n={N_PTS}, iters={ITERS}) — values not comparable to "
            "TPU rounds"
        ))

    # ---- section 1: the headline (always attempted) -------------------------
    pts_per_sec, frame_arrays, mink_vars = _bench_mink(rng, B)
    _emit(
        value=round(pts_per_sec, 1),
        vs_baseline=round(pts_per_sec / REFERENCE_POINTS_PER_SEC, 3),
        status="ok",
    )
    if os.environ.get("LIDAL_BENCH_ONLY") == "mink":  # focused A/B runs
        return

    # ---- remaining sections: budget-gated, exception-isolated ---------------
    # train runs LAST: its backward-kernel compile is the most expensive in
    # the suite on a cold remote cache, and an overrun there must not cost
    # the multidevice/fused lines (every section emits incrementally anyway).
    sections = (
        ("lidal_scoring", 240.0, lambda: _ring_fields(rng, B)),
        ("spvcnn", 180.0, lambda: {"spvcnn_points_per_sec": round(_bench_spvcnn(rng, B, frame_arrays), 1)}),
        ("multidevice", 300.0, lambda: _bench_multidevice(rng, mink_vars)),
        ("train", 300.0, lambda: _bench_train(rng, B)),
    )
    for name, est_s, fn in sections:
        if _remaining(budget_s) < est_s:
            skipped.append(name)
            _emit(skipped=skipped)
            continue
        try:
            _emit(**fn())
        except Exception as e:  # keep later sections alive
            errors.append(f"{name}: {type(e).__name__}: {e}")
            _emit(errors=errors)


def _ring_fields(rng, B: int) -> dict:
    best = _bench_lidal_ring(rng, B)
    return {
        "lidal_scoring_frames_per_sec": round(1.0 / best, 3),
        "lidal_scoring_s_per_frame": round(best, 3),
    }


if __name__ == "__main__":
    main()
