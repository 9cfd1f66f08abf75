"""Dense numpy oracle of the REFERENCE network semantics.

Implements the torchsparse-1.4 call surface the reference models are written
against — coordinate-hash kernel maps, gather-GEMM-scatter sparse convolution
(submanifold / strided / transposed), BatchNorm1d inference, the SPVCNN
point<->voxel transfer ops — and the full MinkUNet / SPVCNN forward passes
(reference ``network/minkunet.py:97-122``, ``network/spvcnn.py:112-155``,
``network/utils.py:13-172``), driven DIRECTLY by a torch-layout state dict
(reference module names, torchsparse tap enumeration, [out, in] linears).

This module is written against the reference call stack, NOT against
``lidal_tpu.ops`` — it shares no code or conventions with the framework's
engine, so a logits match between ``minkunet_forward`` here and the flax model
fed through ``runtime/import_torch.py`` validates tap order, gather direction,
stride semantics, BN layout, residual/skip wiring, and the state-dict name map
end to end (the round-trip tests alone cannot catch a systematic error shared
by export and import).

Conventions (torchsparse 1.4):

* coords are [N, 4] int ``(x, y, z, batch)`` (reference ``sk_dataset.py:207-209``
  appends the batch index as the 4th column);
* kernel offsets: odd kernels enumerate x-fastest/z-slowest over
  ``arange(-k//2+1, k//2+1) * stride``; EVEN kernels z-fastest over the same
  range ({0, stride} for k=2) — torchsparse 1.4 ``get_kernel_offsets``;
* ``out[p] = sum_k  in[p + offset_k] @ W[k]`` (cross-correlation, like dense
  torch convs; missing neighbors contribute zero);
* strided conv output sites: ``unique(coords // (stride*s) * (stride*s))``
  (torchsparse ``spdownsample``); transposed conv replays the cached
  downsample pairing in reverse: ``out[fine] = in[parent(fine)] @ W[delta(fine)]``;
* trilinear devoxelize weights ``prod(d ? u : 1-u)`` of the fractional offsets,
  zeroed where the corner voxel is absent (torchsparse ``calc_ti_weights``;
  see TI_NORMALIZE below).
"""

from __future__ import annotations

from typing import Dict, List, Tuple

import numpy as np

# torchsparse-1.4 get_kernel_offsets enumerations (same provenance as
# lidal_tpu/runtime/import_torch.py TS14_OFFSETS_*; duplicated here on purpose
# so the oracle does not import framework code).
ODD3: Tuple[Tuple[int, int, int], ...] = tuple(
    (x, y, z) for z in (-1, 0, 1) for y in (-1, 0, 1) for x in (-1, 0, 1)
)
EVEN2: Tuple[Tuple[int, int, int], ...] = tuple(
    (x, y, z) for x in (0, 1) for y in (0, 1) for z in (0, 1)
)

# torchsparse 1.4 calc_ti_weights masks absent corners to weight 0.  Whether it
# ALSO renormalizes by the remaining weight sum is not verifiable in this
# environment (torchsparse is not installable; the reference only calls the
# function).  The framework (ops/devoxelize.py) implements mask-without-
# renormalize; the oracle matches so the parity test pins every OTHER semantic.
TI_NORMALIZE = False

BN_EPS = 1e-5  # torch BatchNorm1d default


def _index(coords: np.ndarray) -> Dict[Tuple[int, int, int, int], int]:
    return {tuple(int(v) for v in c): i for i, c in enumerate(coords)}


def _kmap(offsets, query_coords: np.ndarray, table_index, stride: int) -> np.ndarray:
    """[K, Nq] index of ``query + offset*stride`` in the table (-1 if absent)."""
    out = np.full((len(offsets), len(query_coords)), -1, np.int64)
    for k, (dx, dy, dz) in enumerate(offsets):
        for i, c in enumerate(query_coords):
            key = (int(c[0]) + dx * stride, int(c[1]) + dy * stride,
                   int(c[2]) + dz * stride, int(c[3]))
            out[k, i] = table_index.get(key, -1)
    return out


def _gather_gemm(feats: np.ndarray, kmap: np.ndarray, W: np.ndarray, n_out: int) -> np.ndarray:
    """out[i] = sum_k feats[kmap[k, i]] @ W[k] over present pairs."""
    out = np.zeros((n_out, W.shape[-1]), np.float64)
    for k in range(kmap.shape[0]):
        m = kmap[k] >= 0
        if m.any():
            out[m] += feats[kmap[k][m]].astype(np.float64) @ W[k].astype(np.float64)
    return out


class Level:
    """One resolution level: coord table + cached kernel maps (the oracle's
    analog of torchsparse's SparseTensor.cmaps/kmaps caches)."""

    def __init__(self, coords: np.ndarray, stride: int):
        self.coords = coords
        self.stride = stride
        self.idx = _index(coords)
        self._subm = None

    def subm_kmap(self) -> np.ndarray:
        if self._subm is None:
            self._subm = _kmap(ODD3, self.coords, self.idx, self.stride)
        return self._subm


def downsample(level: Level) -> Tuple[Level, np.ndarray]:
    """torchsparse spdownsample + the k=2 s=2 kernel map.

    Returns (coarse level at 2*stride, kmap [8, Nc] into the fine level)."""
    ns = 2 * level.stride
    ds = np.concatenate(
        [level.coords[:, :3] // ns * ns, level.coords[:, 3:]], axis=1
    )
    coarse_coords = np.unique(ds, axis=0)
    coarse = Level(coarse_coords, ns)
    kmap = _kmap([(dx * 1, dy * 1, dz * 1) for dx, dy, dz in EVEN2],
                 coarse_coords, level.idx, level.stride)
    return coarse, kmap


class Oracle:
    """Runs reference forwards from a torch-layout state dict."""

    def __init__(self, sd: Dict[str, np.ndarray]):
        self.sd = {k: np.asarray(v, np.float64) for k, v in sd.items()}

    # ---- primitive layers ------------------------------------------------------

    def bn(self, x: np.ndarray, prefix: str) -> np.ndarray:
        sd = self.sd
        inv = 1.0 / np.sqrt(sd[f"{prefix}.running_var"] + BN_EPS)
        return (x - sd[f"{prefix}.running_mean"]) * inv * sd[f"{prefix}.weight"] + sd[
            f"{prefix}.bias"
        ]

    def linear(self, x: np.ndarray, prefix: str) -> np.ndarray:
        return x @ self.sd[f"{prefix}.weight"].T + self.sd[f"{prefix}.bias"]

    def conv3(self, x: np.ndarray, level: Level, name: str) -> np.ndarray:
        return _gather_gemm(x, level.subm_kmap(), self.sd[name], len(level.coords))

    def conv1(self, x: np.ndarray, name: str) -> np.ndarray:
        w = self.sd[name]
        if w.ndim == 3:  # some exports store ks=1 as [1, cin, cout]
            w = w[0]
        return x @ w

    def conv2_down(self, x: np.ndarray, kmap: np.ndarray, n_out: int, name: str) -> np.ndarray:
        return _gather_gemm(x, kmap, self.sd[name], n_out)

    def conv2_up(self, x: np.ndarray, kmap: np.ndarray, n_fine: int, name: str) -> np.ndarray:
        """Transposed k=2 s=2: replay the cached down pairing in reverse —
        for each down pair (coarse o <- fine f via tap k): out[f] += x[o] @ W[k]."""
        W = self.sd[name]
        out = np.zeros((n_fine, W.shape[-1]), np.float64)
        for k in range(kmap.shape[0]):
            m = kmap[k] >= 0
            if m.any():
                out[kmap[k][m]] += x[m].astype(np.float64) @ W[k].astype(np.float64)
        return out

    # ---- reference blocks (network/utils.py:105-172) ---------------------------

    def residual(self, x: np.ndarray, level: Level, prefix: str) -> np.ndarray:
        y = self.conv3(x, level, f"{prefix}.net.0.kernel")
        y = np.maximum(self.bn(y, f"{prefix}.net.1"), 0.0)
        y = self.conv3(y, level, f"{prefix}.net.3.kernel")
        y = self.bn(y, f"{prefix}.net.4")
        if f"{prefix}.downsample.0.kernel" in self.sd:
            sc = self.bn(self.conv1(x, f"{prefix}.downsample.0.kernel"),
                         f"{prefix}.downsample.1")
        else:
            sc = x
        return np.maximum(y + sc, 0.0)

    # ---- trunk (shared by MinkUNet and SPVCNN) ----------------------------------

    def _trunk(self, coords0: np.ndarray, feats0: np.ndarray):
        """Runs stem/stages/ups; returns (levels, per-level activations needed
        downstream, final y4 features at level 0)."""
        levels: List[Level] = [Level(coords0.astype(np.int64), 1)]
        x = np.maximum(self.bn(self.conv3(feats0, levels[0], "stem.0.kernel"), "stem.1"), 0.0)
        x0 = np.maximum(self.bn(self.conv3(x, levels[0], "stem.3.kernel"), "stem.4"), 0.0)

        down_kmaps = []
        skips = [x0]
        x = x0
        for i in range(4):
            coarse, kmap = downsample(levels[-1])
            levels.append(coarse)
            down_kmaps.append(kmap)
            t = f"stage{i + 1}"
            x = self.conv2_down(x, kmap, len(coarse.coords), f"{t}.0.net.0.kernel")
            x = np.maximum(self.bn(x, f"{t}.0.net.1"), 0.0)
            x = self.residual(x, coarse, f"{t}.1")
            x = self.residual(x, coarse, f"{t}.2")
            skips.append(x)
        return levels, down_kmaps, skips

    def _up(self, x: np.ndarray, j: int, levels, down_kmaps, skips) -> np.ndarray:
        """One decoder stage up{j+1}: deconv to level 3-j, cat skip, 2 residuals."""
        t = f"up{j + 1}"
        lvl = levels[3 - j]
        y = self.conv2_up(x, down_kmaps[3 - j], len(lvl.coords), f"{t}.0.net.0.kernel")
        y = np.maximum(self.bn(y, f"{t}.0.net.1"), 0.0)
        y = np.concatenate([y, skips[3 - j]], axis=1)  # torchsparse.cat
        y = self.residual(y, lvl, f"{t}.1.0")
        y = self.residual(y, lvl, f"{t}.1.1")
        return y

    def minkunet_forward(self, coords0: np.ndarray, feats0: np.ndarray):
        """(logits, y4 feats) at the level-0 sites, in coords0 order
        (reference minkunet.py:97-122)."""
        levels, down_kmaps, skips = self._trunk(coords0, feats0)
        y = skips[4]
        for j in range(4):
            y = self._up(y, j, levels, down_kmaps, skips)
        logits = self.linear(y, "classifier.0")
        return logits, y

    # ---- SPVCNN point branch (network/utils.py:13-102, spvcnn.py:112-155) -------

    def voxel_to_point(self, xf: np.ndarray, level: Level, z_coords: np.ndarray) -> np.ndarray:
        """Trilinear devoxelize: 8 corners at floor(zC/s)*s + {0,s}^3 (EVEN2
        order), weights from the fractional offsets (calc_ti_weights)."""
        s = level.stride
        base = np.floor(z_coords[:, :3] / s) * s
        frac = (z_coords[:, :3] - base) / s  # in [0, 1)
        out = None
        for k, (dx, dy, dz) in enumerate(EVEN2):
            w = (frac[:, 0] if dx else 1 - frac[:, 0]) * (
                frac[:, 1] if dy else 1 - frac[:, 1]
            ) * (frac[:, 2] if dz else 1 - frac[:, 2])
            idx = np.array(
                [
                    level.idx.get(
                        (int(b[0]) + dx * s, int(b[1]) + dy * s, int(b[2]) + dz * s,
                         int(c[3])),
                        -1,
                    )
                    for b, c in zip(base, z_coords)
                ],
                np.int64,
            )
            w = np.where(idx >= 0, w, 0.0)
            contrib = np.zeros((len(z_coords), xf.shape[1]), np.float64)
            m = idx >= 0
            contrib[m] = xf[idx[m]] * w[m, None]
            out = contrib if out is None else out + contrib
        return out

    def point_to_voxel(self, zf: np.ndarray, level: Level, z_coords: np.ndarray) -> np.ndarray:
        """spvoxelize average of point features into the level's sites."""
        s = level.stride
        vox = np.concatenate(
            [np.floor(z_coords[:, :3] / s) * s, z_coords[:, 3:]], axis=1
        ).astype(np.int64)
        idx = np.array([level.idx[tuple(int(v) for v in c)] for c in vox], np.int64)
        out = np.zeros((len(level.coords), zf.shape[1]), np.float64)
        cnt = np.zeros(len(level.coords), np.float64)
        np.add.at(out, idx, zf)
        np.add.at(cnt, idx, 1.0)
        return out / np.maximum(cnt[:, None], 1.0)

    def point_transform(self, zf: np.ndarray, i: int) -> np.ndarray:
        t = f"point_transforms.{i}"
        return np.maximum(self.bn(self.linear(zf, f"{t}.0"), f"{t}.1"), 0.0)

    def spvcnn_forward(self, coords0: np.ndarray, feats0: np.ndarray):
        """(logits, z3 feats) per POINT in coords0 order (spvcnn.py:112-155).

        ``initial_voxelize`` with pres == vres on integer coords is an identity
        re-hash when coords0 is already unique (SURVEY quirk 6) — asserted, so
        points == level-0 voxels and stride-1 transfers are identities, exactly
        the regime the reference operates in."""
        assert len(np.unique(coords0, axis=0)) == len(coords0), "coords must be unique"
        z_coords = coords0.astype(np.float64)
        levels, down_kmaps, skips = self._trunk(coords0, feats0)

        # z0 = voxel_to_point(x0, z) at stride 1 == identity gather of x0
        z0 = self.voxel_to_point(skips[0], levels[0], z_coords)
        # x1 = point_to_voxel(x0, z0) at stride 1 == identity, then stages run in
        # _trunk; the trunk above already consumed x0 directly, which is equal.
        np.testing.assert_allclose(z0, skips[0], rtol=1e-12)

        z1 = self.voxel_to_point(skips[4], levels[4], z_coords)
        z1 = z1 + self.point_transform(z0, 0)

        y1 = self.point_to_voxel(z1, levels[4], z_coords)
        # dropout is identity in eval mode (spvcnn.py:136)
        y1 = self._up(y1, 0, levels, down_kmaps, skips)
        y2 = self._up(y1, 1, levels, down_kmaps, skips)
        z2 = self.voxel_to_point(y2, levels[2], z_coords)
        z2 = z2 + self.point_transform(z1, 1)

        y3 = self.point_to_voxel(z2, levels[2], z_coords)
        y3 = self._up(y3, 2, levels, down_kmaps, skips)
        y4 = self._up(y3, 3, levels, down_kmaps, skips)
        z3 = self.voxel_to_point(y4, levels[0], z_coords)
        z3 = z3 + self.point_transform(z2, 2)

        logits = self.linear(z3, "classifier.0")
        return logits, z3


# ----- random torch-layout state dicts (reference constructor shapes) ------------


def _rand_bn(rng, sd, prefix: str, c: int) -> None:
    sd[f"{prefix}.weight"] = rng.uniform(0.5, 1.5, c).astype(np.float32)
    sd[f"{prefix}.bias"] = rng.normal(scale=0.1, size=c).astype(np.float32)
    sd[f"{prefix}.running_mean"] = rng.normal(scale=0.1, size=c).astype(np.float32)
    sd[f"{prefix}.running_var"] = rng.uniform(0.5, 1.5, c).astype(np.float32)


def _rand_conv(rng, sd, name: str, k: int, cin: int, cout: int) -> None:
    b = 1.0 / np.sqrt(k * cin)
    shape = (cin, cout) if k == 1 else (k, cin, cout)  # ks=1 stored 2-D (1.4)
    sd[name] = rng.uniform(-b, b, shape).astype(np.float32)


def _rand_res(rng, sd, prefix: str, cin: int, cout: int) -> None:
    _rand_conv(rng, sd, f"{prefix}.net.0.kernel", 27, cin, cout)
    _rand_bn(rng, sd, f"{prefix}.net.1", cout)
    _rand_conv(rng, sd, f"{prefix}.net.3.kernel", 27, cout, cout)
    _rand_bn(rng, sd, f"{prefix}.net.4", cout)
    if cin != cout:
        _rand_conv(rng, sd, f"{prefix}.downsample.0.kernel", 1, cin, cout)
        _rand_bn(rng, sd, f"{prefix}.downsample.1", cout)


def random_minkunet_state_dict(rng, num_classes: int = 19) -> Dict[str, np.ndarray]:
    """Random weights with the reference MinkUNet's exact module names/shapes
    (network/minkunet.py:22-89), generated in TORCH layout."""
    cs = [32, 32, 64, 128, 256, 256, 128, 96, 96]
    sd: Dict[str, np.ndarray] = {}
    _rand_conv(rng, sd, "stem.0.kernel", 27, 4, cs[0])
    _rand_bn(rng, sd, "stem.1", cs[0])
    _rand_conv(rng, sd, "stem.3.kernel", 27, cs[0], cs[0])
    _rand_bn(rng, sd, "stem.4", cs[0])
    enc = [(cs[0], cs[1]), (cs[1], cs[2]), (cs[2], cs[3]), (cs[3], cs[4])]
    for i, (cin, cout) in enumerate(enc):
        t = f"stage{i + 1}"
        _rand_conv(rng, sd, f"{t}.0.net.0.kernel", 8, cin, cin)
        _rand_bn(rng, sd, f"{t}.0.net.1", cin)
        _rand_res(rng, sd, f"{t}.1", cin, cout)
        _rand_res(rng, sd, f"{t}.2", cout, cout)
    dec = [(cs[4], cs[5], cs[3]), (cs[5], cs[6], cs[2]), (cs[6], cs[7], cs[1]),
           (cs[7], cs[8], cs[0])]
    for j, (cin, cout, cskip) in enumerate(dec):
        t = f"up{j + 1}"
        _rand_conv(rng, sd, f"{t}.0.net.0.kernel", 8, cin, cout)
        _rand_bn(rng, sd, f"{t}.0.net.1", cout)
        _rand_res(rng, sd, f"{t}.1.0", cout + cskip, cout)
        _rand_res(rng, sd, f"{t}.1.1", cout, cout)
    b = 1.0 / np.sqrt(cs[8])
    sd["classifier.0.weight"] = rng.uniform(-b, b, (num_classes, cs[8])).astype(np.float32)
    sd["classifier.0.bias"] = rng.uniform(-b, b, num_classes).astype(np.float32)
    return sd


def random_spvcnn_state_dict(rng, num_classes: int = 19) -> Dict[str, np.ndarray]:
    """Reference SPVCNN names/shapes = MinkUNet trunk + 3 point transforms
    (network/spvcnn.py:87-104)."""
    cs = [32, 32, 64, 128, 256, 256, 128, 96, 96]
    sd = random_minkunet_state_dict(rng, num_classes)
    for i, (cin, cout) in enumerate([(cs[0], cs[4]), (cs[4], cs[6]), (cs[6], cs[8])]):
        t = f"point_transforms.{i}"
        b = 1.0 / np.sqrt(cin)
        sd[f"{t}.0.weight"] = rng.uniform(-b, b, (cout, cin)).astype(np.float32)
        sd[f"{t}.0.bias"] = rng.uniform(-b, b, cout).astype(np.float32)
        _rand_bn(rng, sd, f"{t}.1", cout)
    return sd
