"""Import the reference's released torch checkpoints into the flax MinkUNet.

The reference publishes four round-0 ``current.pt`` files "for benchmarking
purposes" (reference ``README.md:88-92``); loading them is the accuracy-parity
anchor.  A ``current.pt`` holds ``{model_state_dict, iteration, ep_id}``
(reference ``train.py:151-155``) with torchsparse-1.4 module names
(``network/minkunet.py:22-89``, ``network/utils.py:105-172``).

Layout conversions:

* spnn.Conv3d kernels are ``[K, cin, cout]`` like ours, but torchsparse
  enumerates kernel offsets z-major (x fastest; ``get_kernel_offsets``),
  while our rulebooks are x-major (``ops/kernel_map.OFFSETS3/OFFSETS2``) —
  taps are permuted accordingly.  ks=1 kernels may be stored as [cin, cout].
* spnn.BatchNorm == torch BatchNorm1d: weight/bias -> scale/bias params,
  running_mean/var -> batch_stats.
* nn.Linear stores ``[out, in]`` -> transposed.

DDP checkpoints prefix every name with ``module.`` — stripped transparently.
"""

from __future__ import annotations

from typing import Dict, Tuple

import numpy as np


def _perm3() -> list:
    """ours[k] = theirs[perm[k]] for the 27 kernel-3 taps."""
    perm = []
    for ix in range(3):  # our order: x-major (z fastest)
        for iy in range(3):
            for iz in range(3):
                perm.append(ix + 3 * iy + 9 * iz)  # torchsparse: x fastest
    return perm


def _perm2() -> list:
    perm = []
    for ix in range(2):
        for iy in range(2):
            for iz in range(2):
                perm.append(ix + 2 * iy + 4 * iz)
    return perm


def _conv_w(sd, name: str, k: int) -> np.ndarray:
    w = np.asarray(sd[name], np.float32)
    if k == 1:
        if w.ndim == 2:
            w = w[None]
        return w
    assert w.shape[0] == k, (name, w.shape)
    perm = _perm3() if k == 27 else _perm2()
    return w[perm]


def _bn(sd, prefix: str) -> Tuple[dict, dict]:
    params = {
        "scale": np.asarray(sd[f"{prefix}.weight"], np.float32),
        "bias": np.asarray(sd[f"{prefix}.bias"], np.float32),
    }
    stats = {
        "mean": np.asarray(sd[f"{prefix}.running_mean"], np.float32),
        "var": np.asarray(sd[f"{prefix}.running_var"], np.float32),
    }
    return params, stats


def convert_minkunet_state_dict(sd: Dict[str, np.ndarray]):
    """torch ``model_state_dict`` (tensors or numpy arrays) -> flax variables
    {"params": ..., "batch_stats": ...} for ``models.MinkUNet``."""
    sd = {k[len("module.") :] if k.startswith("module.") else k: v for k, v in sd.items()}
    params: dict = {}
    stats: dict = {}

    def conv_block(flax_name, t_conv, t_bn, k):
        bn_p, bn_s = _bn(sd, t_bn)
        sub = "SubMConv3_0" if k == 27 else ("DownConv2_0" if k == 8 else "Conv1x1_0")
        params[flax_name] = {sub: {"w": _conv_w(sd, f"{t_conv}.kernel", k)},
                            "MaskedBatchNorm_0": bn_p}
        stats[flax_name] = {"MaskedBatchNorm_0": bn_s}

    def residual_block(flax_name, t):
        p: dict = {}
        s: dict = {}
        p["SubMConv3_0"] = {"w": _conv_w(sd, f"{t}.net.0.kernel", 27)}
        p["MaskedBatchNorm_0"], s["MaskedBatchNorm_0"] = _bn(sd, f"{t}.net.1")
        p["SubMConv3_1"] = {"w": _conv_w(sd, f"{t}.net.3.kernel", 27)}
        p["MaskedBatchNorm_1"], s["MaskedBatchNorm_1"] = _bn(sd, f"{t}.net.4")
        if f"{t}.downsample.0.kernel" in sd:
            p["Conv1x1_0"] = {"w": _conv_w(sd, f"{t}.downsample.0.kernel", 1)}
            p["MaskedBatchNorm_2"], s["MaskedBatchNorm_2"] = _bn(sd, f"{t}.downsample.1")
        params[flax_name] = p
        stats[flax_name] = s

    # stem -> ConvBlock_0/1
    conv_block("ConvBlock_0", "stem.0", "stem.1", 27)
    conv_block("ConvBlock_1", "stem.3", "stem.4", 27)

    # encoder stages
    for i in range(4):
        t = f"stage{i + 1}"
        bn_p, bn_s = _bn(sd, f"{t}.0.net.1")
        params[f"DownBlock_{i}"] = {
            "DownConv2_0": {"w": _conv_w(sd, f"{t}.0.net.0.kernel", 8)},
            "MaskedBatchNorm_0": bn_p,
        }
        stats[f"DownBlock_{i}"] = {"MaskedBatchNorm_0": bn_s}
        residual_block(f"ResidualBlock_{2 * i}", f"{t}.1")
        residual_block(f"ResidualBlock_{2 * i + 1}", f"{t}.2")

    # decoder stages
    for j in range(4):
        t = f"up{j + 1}"
        bn_p, bn_s = _bn(sd, f"{t}.0.net.1")
        params[f"UpBlock_{j}"] = {
            "UpConv2_0": {"w": _conv_w(sd, f"{t}.0.net.0.kernel", 8)},
            "MaskedBatchNorm_0": bn_p,
        }
        stats[f"UpBlock_{j}"] = {"MaskedBatchNorm_0": bn_s}
        residual_block(f"ResidualBlock_{8 + 2 * j}", f"{t}.1.0")
        residual_block(f"ResidualBlock_{8 + 2 * j + 1}", f"{t}.1.1")

    params["TorchLinear_0"] = {
        "w": np.asarray(sd["classifier.0.weight"], np.float32).T,
        "b": np.asarray(sd["classifier.0.bias"], np.float32),
    }
    return {"params": params, "batch_stats": stats}


def export_minkunet_state_dict(variables) -> Dict[str, np.ndarray]:
    """Inverse of :func:`convert_minkunet_state_dict` (round-trip testing and
    torch-side interop)."""
    import jax

    params = jax.tree_util.tree_map(np.asarray, variables["params"])
    stats = jax.tree_util.tree_map(np.asarray, variables["batch_stats"])
    sd: Dict[str, np.ndarray] = {}
    inv3 = np.argsort(_perm3())
    inv2 = np.argsort(_perm2())

    def put_conv(t_name, w):
        k = w.shape[0]
        if k == 27:
            sd[f"{t_name}.kernel"] = w[inv3]
        elif k == 8:
            sd[f"{t_name}.kernel"] = w[inv2]
        else:
            sd[f"{t_name}.kernel"] = w[0]

    def put_bn(t_name, p, s):
        sd[f"{t_name}.weight"] = p["scale"]
        sd[f"{t_name}.bias"] = p["bias"]
        sd[f"{t_name}.running_mean"] = s["mean"]
        sd[f"{t_name}.running_var"] = s["var"]

    def put_res(t, name):
        p, s = params[name], stats[name]
        put_conv(f"{t}.net.0", p["SubMConv3_0"]["w"])
        put_bn(f"{t}.net.1", p["MaskedBatchNorm_0"], s["MaskedBatchNorm_0"])
        put_conv(f"{t}.net.3", p["SubMConv3_1"]["w"])
        put_bn(f"{t}.net.4", p["MaskedBatchNorm_1"], s["MaskedBatchNorm_1"])
        if "Conv1x1_0" in p:
            put_conv(f"{t}.downsample.0", p["Conv1x1_0"]["w"])
            put_bn(f"{t}.downsample.1", p["MaskedBatchNorm_2"], s["MaskedBatchNorm_2"])

    put_conv("stem.0", params["ConvBlock_0"]["SubMConv3_0"]["w"])
    put_bn("stem.1", params["ConvBlock_0"]["MaskedBatchNorm_0"], stats["ConvBlock_0"]["MaskedBatchNorm_0"])
    put_conv("stem.3", params["ConvBlock_1"]["SubMConv3_0"]["w"])
    put_bn("stem.4", params["ConvBlock_1"]["MaskedBatchNorm_0"], stats["ConvBlock_1"]["MaskedBatchNorm_0"])
    for i in range(4):
        t = f"stage{i + 1}"
        put_conv(f"{t}.0.net.0", params[f"DownBlock_{i}"]["DownConv2_0"]["w"])
        put_bn(f"{t}.0.net.1", params[f"DownBlock_{i}"]["MaskedBatchNorm_0"], stats[f"DownBlock_{i}"]["MaskedBatchNorm_0"])
        put_res(f"{t}.1", f"ResidualBlock_{2 * i}")
        put_res(f"{t}.2", f"ResidualBlock_{2 * i + 1}")
    for j in range(4):
        t = f"up{j + 1}"
        put_conv(f"{t}.0.net.0", params[f"UpBlock_{j}"]["UpConv2_0"]["w"])
        put_bn(f"{t}.0.net.1", params[f"UpBlock_{j}"]["MaskedBatchNorm_0"], stats[f"UpBlock_{j}"]["MaskedBatchNorm_0"])
        put_res(f"{t}.1.0", f"ResidualBlock_{8 + 2 * j}")
        put_res(f"{t}.1.1", f"ResidualBlock_{8 + 2 * j + 1}")
    sd["classifier.0.weight"] = params["TorchLinear_0"]["w"].T
    sd["classifier.0.bias"] = params["TorchLinear_0"]["b"]
    return sd


def load_torch_checkpoint(path: str):
    """Read a reference ``current.pt`` -> (flax variables, iteration, ep_id).

    Uses torch (CPU wheels are available here) purely as a pickle reader."""
    import torch

    blob = torch.load(path, map_location="cpu", weights_only=False)
    sd = {k: v.numpy() if hasattr(v, "numpy") else np.asarray(v)
          for k, v in blob["model_state_dict"].items()}
    variables = convert_minkunet_state_dict(sd)
    return variables, int(blob.get("iteration", 0)), int(blob.get("ep_id", 0))
