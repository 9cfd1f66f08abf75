"""Determinism auditing.

The reference has no race detection or reproducibility tooling (SURVEY.md §5.2);
its safety is by construction (rank-0 writes + barriers).  Our concurrency model
(async host prefetch + device collectives) is also race-free by construction, but
the *selection rankings* additionally require bitwise-deterministic compute
(BASELINE north star).  This module provides the audit: run a pipeline stage
twice and compare content hashes of every output leaf.
"""

from __future__ import annotations

import hashlib
from typing import Any, Callable, Dict, Tuple

import jax
import numpy as np


def tree_fingerprint(tree: Any) -> Dict[str, str]:
    """Stable content hash per leaf (path -> sha256 of raw bytes)."""
    out: Dict[str, str] = {}
    leaves = jax.tree_util.tree_flatten_with_path(tree)[0]
    for path, leaf in leaves:
        arr = np.asarray(jax.device_get(leaf))
        key = jax.tree_util.keystr(path)
        out[key] = hashlib.sha256(arr.tobytes() + str(arr.dtype).encode() + str(arr.shape).encode()).hexdigest()
    return out


def check_deterministic(
    fn: Callable[[], Any], runs: int = 2
) -> Tuple[bool, Dict[str, Tuple[str, str]]]:
    """Run ``fn`` ``runs`` times; returns (ok, {leaf_path: (hash_a, hash_b)} for
    mismatching leaves)."""
    base = tree_fingerprint(fn())
    bad: Dict[str, Tuple[str, str]] = {}
    for _ in range(runs - 1):
        cur = tree_fingerprint(fn())
        for k, h in base.items():
            if cur.get(k) != h:
                bad[k] = (h, cur.get(k, "<missing>"))
    return (not bad), bad
