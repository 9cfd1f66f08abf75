"""Profiling, determinism audit, loader, and host-shard utilities."""

import time

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from lidal_tpu.data.loader import FrameBatchLoader
from lidal_tpu.parallel.mesh import process_shard, sync_hosts
from lidal_tpu.utils.determinism import check_deterministic, tree_fingerprint
from lidal_tpu.utils.profiling import PhaseTimer, ThroughputMeter, device_trace


def test_phase_timer_accumulates():
    t = PhaseTimer()
    with t.phase("a"):
        time.sleep(0.01)
    with t.phase("a"):
        time.sleep(0.01)
    with t.phase("b"):
        pass
    assert t.counts["a"] == 2 and t.counts["b"] == 1
    assert t.totals["a"] >= 0.02
    rep = t.report()
    assert "a" in rep and "ms/call" in rep
    d = t.as_dict()
    assert d["a"]["calls"] == 2


def test_throughput_meter():
    m = ThroughputMeter(alpha=1.0)
    m.tick(10)
    time.sleep(0.01)
    r = m.tick(10)
    assert r > 0


def test_device_trace_noop():
    with device_trace(None):
        pass  # no-op path


def test_determinism_audit():
    def good():
        return {"x": jnp.arange(4), "y": {"z": jnp.ones(3)}}

    ok, bad = check_deterministic(good)
    assert ok and not bad

    state = {"n": 0}

    def flaky():
        state["n"] += 1
        return jnp.full((3,), state["n"])

    ok, bad = check_deterministic(flaky)
    assert not ok and len(bad) == 1

    fp = tree_fingerprint({"a": np.ones(3)})
    assert len(fp) == 1


def test_loader_epoch_shuffle_and_sharding():
    files = [f"f{i}" for i in range(10)]

    def read(f):
        i = int(f[1:])
        xyz = np.full((5, 3), i, np.float32)
        return xyz, np.zeros(5, np.float32), np.zeros(5, np.int32)

    loader = FrameBatchLoader(files, read, point_cap=8, batch_size=3, shuffle=True, seed=0)
    loader.set_epoch(0)
    order0 = [f for b in loader for f in b["files"]]
    loader.set_epoch(0)
    order0b = [f for b in loader for f in b["files"]]
    assert order0 == order0b  # same epoch -> same order
    loader.set_epoch(1)
    order1 = [f for b in loader for f in b["files"]]
    assert sorted(order1) == sorted(order0) and order1 != order0

    # contiguous sharding (score-loader parity)
    l0 = FrameBatchLoader(files, read, 8, 2, rank=0, world=2, contiguous_shard=True)
    l1 = FrameBatchLoader(files, read, 8, 2, rank=1, world=2, contiguous_shard=True)
    f0 = [f for b in l0 for f in b["files"]]
    f1 = [f for b in l1 for f in b["files"]]
    assert f0 == files[:5] and f1 == files[5:]
    # ragged final batch is padded with invalid frames
    lb = FrameBatchLoader(files, read, 8, 3)
    last = list(lb)[-1]
    assert last["n_frames"] == 1 and last["xyz"].shape == (3, 8, 3)
    assert not last["valid"][1:].any()


def test_loader_read_failure_raises_not_hangs():
    """A read_fn failure dies on the producer thread; it must RAISE in the
    consuming iterator, not leave it blocked on the queue forever (regression:
    the producer exception was swallowed and __iter__ hung)."""

    def bad_read(f):
        raise OSError(f"corrupt frame {f}")

    loader = FrameBatchLoader(["a", "b"], bad_read, point_cap=8, batch_size=2)
    with pytest.raises(OSError, match="corrupt frame"):
        list(loader)

    # num_workers=0 (synchronous intent) must not kill the producer either
    def read(f):
        return np.zeros((4, 3), np.float32), np.zeros(4, np.float32), np.zeros(4, np.int32)

    l0 = FrameBatchLoader(["a", "b"], read, point_cap=8, batch_size=2, num_workers=0)
    assert len(list(l0)) == 1


def test_process_shard_and_sync_single_host():
    assert process_shard(10) == (0, 10, 1)
    sync_hosts()  # no-op single process
