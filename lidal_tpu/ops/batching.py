"""Per-frame mapping for gather-heavy ops.

``jax.vmap`` lowers contiguous-slice loads and sorted/unique gathers into
generic batched gathers, losing the TPU fast paths this engine is built around.
``map_frames`` runs the per-frame function under ``lax.scan`` instead: the body
is traced/compiled ONCE with single-frame shapes (fast-path lowerings intact,
no graph duplication across the batch), outputs stack automatically, and
reverse-mode AD works through the scan.
"""

from __future__ import annotations

from typing import Any, Callable, Optional

import jax

# override for tests: 'vmap' | 'scan' | None (auto: scan on TPU, vmap on CPU,
# where generic batched gathers are fine and compile is 3x faster)
FORCE_MODE: Optional[str] = None


def map_frames(fn: Callable, *args: Any):
    """Apply ``fn`` to each leading-axis slice of the args (pytrees allowed);
    stack results.  Semantics of ``jax.vmap(fn)(*args)`` for pure per-frame
    functions; lowered as a scan on TPU (keeps fast-path gathers, compiles the
    body once) and as vmap on CPU."""
    mode = FORCE_MODE or ("vmap" if jax.default_backend() == "cpu" else "scan")
    if mode == "vmap":
        return jax.vmap(fn)(*args)

    def body(carry, sliced):
        return carry, fn(*sliced)

    _, out = jax.lax.scan(body, None, args)
    return out
