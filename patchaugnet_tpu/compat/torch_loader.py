"""Load reference torch checkpoints into flax variable trees.

The reference saves ``{'epoch', 'iter', 'optimizer', 'state_dict_encoder'}``
per epoch (train_place_recognition.py:172-189) and its eval loader also
accepts bare state dicts (evaluate.py:150-158). This module maps those
state-dict names onto this framework's parameter/batch-stats trees so
reference-trained weights transfer directly.

Weight-layout conversions (torch -> flax channels-last):
  - ``Conv2d(in, out, (1, 1))`` / ``Conv1d(in, out, 1)``: weight
    ``(out, in, 1[, 1])`` -> Dense kernel ``(in, out)``;
  - ``Conv2d(1, out, (1, 3))`` (coordinate-consuming convs, e.g.
    PointNetVlad conv1/STN conv1): ``(out, 1, 1, 3)`` -> ``(3, out)``;
  - ``Linear``: ``(out, in)`` -> ``(in, out)``;
  - grouped ``Conv1d(C, C, 1, groups=g)``: ``(C, C/g, 1)`` ->
    ``(g, C/g_in, C/g_out)`` block-diagonal kernel;
  - BatchNorm: weight/bias -> scale/bias (params), running_mean/var ->
    mean/var (batch_stats).
"""
from __future__ import annotations

from typing import Any, Callable, Dict, Optional, Tuple

import numpy as np


def _t_linear(w):
    return np.ascontiguousarray(np.asarray(w).T)


def _t_conv1x1(w):
    w = np.asarray(w)
    return np.ascontiguousarray(w.reshape(w.shape[0], w.shape[1]).T)


def _t_conv_coords(w):
    # (out, 1, 1, k) -> (k, out)
    w = np.asarray(w)
    return np.ascontiguousarray(w.reshape(w.shape[0], -1).T)


def _t_grouped_conv(w, gp: int):
    # (C_out, C_in/g, 1) -> (g, C_in/g, C_out/g): kernel[g, i, o] = w[g*cg+o, i, 0]
    w = np.asarray(w)[..., 0]                              # (C, cg)
    c, cg = w.shape
    return np.ascontiguousarray(
        w.reshape(gp, c // gp, cg).transpose(0, 2, 1)      # (g, cg_in, cg_out)
    )


def _identity(w):
    return np.asarray(w)


class StateDict:
    """Thin consuming view over a torch state dict (tracks unused keys)."""

    def __init__(self, sd: Dict[str, Any]):
        self.sd = {k: np.asarray(v) for k, v in sd.items()}
        self.used = set()

    def take(self, key: str, transform: Callable = _identity):
        if key not in self.sd:
            raise KeyError(f"torch state dict missing: {key}")
        self.used.add(key)
        return transform(self.sd[key])

    def unused(self):
        return sorted(set(self.sd) - self.used)


def _bn(sd: StateDict, prefix: str):
    """-> (params {scale, bias}, stats {mean, var})."""
    return (
        {"scale": sd.take(f"{prefix}.weight"), "bias": sd.take(f"{prefix}.bias")},
        {"mean": sd.take(f"{prefix}.running_mean"), "var": sd.take(f"{prefix}.running_var")},
    )


def _stn(sd: StateDict, prefix: str, use_bn: bool):
    """Reference STN3d (PointNetVlad.py:124-177) -> flax STN3D tree."""
    p: Dict[str, Any] = {}
    stats: Dict[str, Any] = {}
    # conv1 consumes the coordinate axis ((out, ch, 1, ksize)); convs 2-3
    # are 1x1
    w1 = np.asarray(sd.take(f"{prefix}.conv1.weight", _identity))
    if w1.shape[1] == 1:                                   # k==3 variant
        kernel1 = w1.reshape(w1.shape[0], -1).T
    else:                                                  # k==64: (out, in, 1, 1)
        kernel1 = w1.reshape(w1.shape[0], w1.shape[1]).T
    p["conv1"] = {"kernel": np.ascontiguousarray(kernel1),
                  "bias": sd.take(f"{prefix}.conv1.bias")}
    for i in (2, 3):
        p[f"conv{i}"] = {
            "kernel": sd.take(f"{prefix}.conv{i}.weight", _t_conv1x1),
            "bias": sd.take(f"{prefix}.conv{i}.bias"),
        }
    for i in (1, 2, 3):
        p[f"fc{i}"] = {
            "kernel": sd.take(f"{prefix}.fc{i}.weight", _t_linear),
            "bias": sd.take(f"{prefix}.fc{i}.bias"),
        }
    if use_bn:
        for i, name in [(1, "conv1_bn"), (2, "conv2_bn"), (3, "conv3_bn"),
                        (4, "fc1_bn"), (5, "fc2_bn")]:
            p[name], stats[name] = _bn(sd, f"{prefix}.bn{i}")
    return p, stats


def _netvlad_loupe(sd: StateDict, prefix: str):
    """Reference NetVLADLoupe (PointNetVlad.py:12-81) -> flax tree."""
    p = {
        "base": {
            "cluster_weights": sd.take(f"{prefix}.cluster_weights"),
            "cluster_weights2": sd.take(f"{prefix}.cluster_weights2"),
        },
        "hidden1_weights": sd.take(f"{prefix}.hidden1_weights"),
    }
    stats: Dict[str, Any] = {"base": {}}
    p["base"]["bn1"], stats["base"]["bn1"] = _bn(sd, f"{prefix}.bn1")
    p["bn2"], stats["bn2"] = _bn(sd, f"{prefix}.bn2")
    if f"{prefix}.context_gating.gating_weights" in sd.sd:
        g = {"gating_weights": sd.take(f"{prefix}.context_gating.gating_weights")}
        gs = {}
        g["bn1"], gs["bn1"] = _bn(sd, f"{prefix}.context_gating.bn1")
        p["context_gating"] = g
        stats["context_gating"] = gs
    return p, stats


def convert_pointnet_vlad(state_dict: Dict[str, Any]):
    """Reference ``PointNetVlad`` state dict -> flax variables.

    Covers the shipped configuration (feature_transform=True,
    max_pool=False, use_bn conv stack, BN-free STNs).
    """
    sd = StateDict(state_dict)
    params: Dict[str, Any] = {"point_net": {}, "net_vlad": {}}
    stats: Dict[str, Any] = {"point_net": {}, "net_vlad": {}}

    pn_p, pn_s = params["point_net"], stats["point_net"]
    pn_p["stn"], _ = _stn(sd, "point_net.stn", use_bn=False)
    pn_p["feature_trans"], _ = _stn(sd, "point_net.feature_trans", use_bn=False)
    for i in range(1, 6):
        w = np.asarray(sd.take(f"point_net.conv{i}.weight", _identity))
        kernel = w.reshape(w.shape[0], -1).T if i == 1 else w.reshape(
            w.shape[0], w.shape[1]
        ).T
        pn_p[f"conv{i}"] = {
            "kernel": np.ascontiguousarray(kernel),
            "bias": sd.take(f"point_net.conv{i}.bias"),
        }
        pn_p[f"conv{i}_bn"], pn_s[f"conv{i}_bn"] = _bn(sd, f"point_net.bn{i}")

    params["net_vlad"], stats["net_vlad"] = _netvlad_loupe(sd, "net_vlad")
    return {"params": params, "batch_stats": stats}, sd.unused()


def _shared_mlp(sd: StateDict, prefix: str, n_layers: int):
    """pt_util.SharedMLP stack (conv 1x1 no-bias + BN per layer)."""
    p, stats = {}, {}
    for j in range(n_layers):
        p[f"layer{j}"] = {
            "kernel": sd.take(f"{prefix}.layer{j}.conv.weight", _t_conv1x1)
        }
        p[f"bn{j}"], stats[f"bn{j}"] = _bn(sd, f"{prefix}.layer{j}.bn.bn")
    return p, stats


def _count_mlp_layers(sd: StateDict, prefix: str) -> int:
    n = 0
    while f"{prefix}.layer{n}.conv.weight" in sd.sd:
        n += 1
    return n


def _vlad_base(sd: StateDict, prefix: str):
    """NetVLADBase used inside SPVLAD: only cluster weights + bn1 feed
    the forward (loupe.py:191-222); per-vlad hidden1_weights / bn2 /
    context_gating are constructed but dead — left unused."""
    p = {
        "cluster_weights": sd.take(f"{prefix}.cluster_weights"),
        "cluster_weights2": sd.take(f"{prefix}.cluster_weights2"),
    }
    stats = {}
    p["bn1"], stats["bn1"] = _bn(sd, f"{prefix}.bn1")
    return p, stats


def _gating(sd: StateDict, prefix: str):
    p = {"gating_weights": sd.take(f"{prefix}.gating_weights")}
    stats = {}
    p["bn1"], stats["bn1"] = _bn(sd, f"{prefix}.bn1")
    return p, stats


def _afa(sd: StateDict, prefix: str):
    """AdaptiveFeatureAggregator: mlpa (first conv only — trans_conv /
    after_norm are the dead 'way 1' path, loupe.py:34-38), fc, bn."""
    p = {
        "mlpa": {"mlp0": {"kernel": sd.take(f"{prefix}.mlpa.mlps.0.weight", _t_conv1x1)}},
        "fc": {
            "kernel": sd.take(f"{prefix}.fc.weight", _t_linear),
            "bias": sd.take(f"{prefix}.fc.bias"),
        },
    }
    stats = {}
    p["bn"], stats["bn"] = _bn(sd, f"{prefix}.bn")
    return p, stats


def _group_sa(sd: StateDict, prefix: str, gp: int):
    """SA_Layer/GroupSALayer with tied q/k grouped convs."""
    p = {
        "qk_conv": {"kernel": sd.take(f"{prefix}.q_conv.weight",
                                      lambda w: _t_grouped_conv(w, gp))},
        "v_conv": {
            "kernel": sd.take(f"{prefix}.v_conv.weight", _t_conv1x1),
            "bias": sd.take(f"{prefix}.v_conv.bias"),
        },
        "trans_conv": {
            "kernel": sd.take(f"{prefix}.trans_conv.weight", _t_conv1x1),
            "bias": sd.take(f"{prefix}.trans_conv.bias"),
        },
    }
    # k_conv.weight aliases q_conv.weight (tied); mark consumed
    if f"{prefix}.k_conv.weight" in sd.sd:
        sd.take(f"{prefix}.k_conv.weight")
    stats = {}
    p["after_norm"], stats["after_norm"] = _bn(sd, f"{prefix}.after_norm")
    return p, stats


def _backbone(sd: StateDict, n_sa: int, n_fp: int, gp: Optional[int] = None):
    """SA + FP stacks shared by PPT-Net / PatchAugNet."""
    p: Dict[str, Any] = {}
    stats: Dict[str, Any] = {}
    for i in range(n_sa):
        pref = f"backbone.SA_modules.{i}.mlps.0"
        n_layers = _count_mlp_layers(sd, pref)
        mp, ms = _shared_mlp(sd, pref, n_layers)
        p[f"sa{i}"] = {"mlp": mp}
        stats[f"sa{i}"] = {"mlp": ms}
        if gp is not None:
            sp, ss = _group_sa(sd, f"backbone.SA_modules.{i}.sas.0", gp)
            p[f"sa{i}"]["sa"] = sp
            stats[f"sa{i}"]["sa"] = ss
    for i in range(n_fp):
        pref = f"backbone.FP_modules.{i}.mlp"
        n_layers = _count_mlp_layers(sd, pref)
        mp, ms = _shared_mlp(sd, pref, n_layers)
        p[f"fp{i}"] = {"mlp": mp}
        stats[f"fp{i}"] = {"mlp": ms}
    return p, stats


def convert_patch_aug_net(state_dict: Dict[str, Any]):
    """Reference patch_aug_net.Network (AGGREGATION_TYPE=2, use_a2a_recon)."""
    sd = StateDict(state_dict)
    params, stats = _backbone(sd, n_sa=3, n_fp=3)
    agg_p: Dict[str, Any] = {}
    agg_s: Dict[str, Any] = {}
    for i in range(3):
        agg_p[f"vlad{i}"], agg_s[f"vlad{i}"] = _vlad_base(sd, f"aggregation.vlads.{i}")
    agg_p["afa"], agg_s["afa"] = _afa(sd, "aggregation.afa")
    if "aggregation.context_gating.gating_weights" in sd.sd:
        agg_p["context_gating"], agg_s["context_gating"] = _gating(
            sd, "aggregation.context_gating"
        )
    params["aggregation"] = agg_p
    stats["aggregation"] = agg_s
    if "decoder.fc1.weight" in sd.sd:
        dec_p: Dict[str, Any] = {}
        dec_s: Dict[str, Any] = {}
        for i in (1, 2, 3):
            dec_p[f"fc{i}"] = {
                "kernel": sd.take(f"decoder.fc{i}.weight", _t_linear),
                "bias": sd.take(f"decoder.fc{i}.bias"),
            }
        for i in (1, 2):
            dec_p[f"bn{i}"], dec_s[f"bn{i}"] = _bn(sd, f"decoder.bn{i}")
        params["decoder"] = dec_p
        stats["decoder"] = dec_s
    return {"params": params, "batch_stats": stats}, sd.unused()


def convert_pptnet(state_dict: Dict[str, Any], gp: int = 8):
    """Reference pptnet.Network (4 SA levels with grouped attention)."""
    sd = StateDict(state_dict)
    params, stats = _backbone(sd, n_sa=4, n_fp=4, gp=gp)
    agg_p: Dict[str, Any] = {}
    agg_s: Dict[str, Any] = {}
    for i in range(4):
        agg_p[f"vlad{i}"], agg_s[f"vlad{i}"] = _vlad_base(sd, f"aggregation.vlad{i}")
    agg_p["hidden_weights"] = sd.take("aggregation.hidden_weights")
    agg_p["bn2"], agg_s["bn2"] = _bn(sd, "aggregation.bn2")
    if "aggregation.context_gating.gating_weights" in sd.sd:
        agg_p["context_gating"], agg_s["context_gating"] = _gating(
            sd, "aggregation.context_gating"
        )
    params["aggregation"] = agg_p
    stats["aggregation"] = agg_s
    return {"params": params, "batch_stats": stats}, sd.unused()


def _t_me_kernel(w, k: int):
    """MinkowskiConvolution kernel ``(K^3, Cin, Cout)`` -> flax conv
    kernel ``(K, K, K, Cin, Cout)``.

    ME's hypercube kernel region iterates the FIRST coordinate fastest,
    so linear index ``l = x + K*y + K^2*z``; a C-order reshape therefore
    yields ``[z][y][x]`` and the spatial axes must be reversed to match
    the dense grid's ``(x, y, z)`` layout. (Numerically unverifiable in
    this environment — MinkowskiEngine is not installable — so the
    orientation is documented rather than oracle-tested; shapes, names
    and channel mapping are exact.)"""
    w = np.asarray(w)
    v, cin, cout = w.shape
    assert v == k ** 3, (w.shape, k)
    return np.ascontiguousarray(
        w.reshape(k, k, k, cin, cout).transpose(2, 1, 0, 3, 4)
    )


def _t_me_1x1(w):
    """ME 1x1 conv kernel ``(Cin, Cout)`` -> flax ``(1, 1, 1, Cin, Cout)``."""
    w = np.asarray(w)
    return np.ascontiguousarray(w.reshape(1, 1, 1, *w.shape))


def _t_me_tconv_kernel(w, k: int):
    """MinkowskiConvolutionTranspose kernel ``(K^3, Cin, Cout)`` -> flax
    ``nn.ConvTranspose`` kernel ``(K, K, K, Cin, Cout)``.

    ME/torch transposed convs SCATTER with the unflipped kernel
    (``out[s*p + q] += W[l(q)] @ in[p]``, the transpose of the forward
    kernel map), while flax ``nn.ConvTranspose`` applies
    ``K[k-1-q]`` at fine offset q (probed empirically — see
    minkloc_sparse.upsample_parent_table).  The conversion therefore
    needs a full spatial REVERSAL on top of :func:`_t_me_kernel`'s
    axis-order transpose.  Found by the round-4 shim-ME full-forward
    diff (tests/test_minkloc_ref_parity.py): with the plain transpose,
    tconv outputs diverged at 20-25x the feature scale while every
    bottom-up stage matched to noise."""
    return np.ascontiguousarray(_t_me_kernel(w, k)[::-1, ::-1, ::-1])


def _me_conv_bn(sd: StateDict, conv_key: str, bn_prefix: str, k: int):
    """-> the _Conv3dBN tree {conv:{kernel}, bn:{scale,bias}} + stats."""
    kernel = (
        sd.take(conv_key, _t_me_1x1)
        if k == 1
        else sd.take(conv_key, lambda w: _t_me_kernel(w, k))
    )
    bn_p, bn_s = _bn(sd, bn_prefix)
    return {"conv": {"kernel": kernel}, "bn": bn_p}, {"bn": bn_s}


def convert_minkloc3dv2(
    state_dict: Dict[str, Any],
    planes=(64, 128, 64, 32),
    layers=(1, 1, 1, 1),
    num_top_down: int = 2,
    conv0_kernel_size: int = 5,
    block: str = "ECABasicBlock",
    pooling: str = "GeM",
):
    """Reference MinkLoc (MinkFPN backbone + PoolingWrapper) state dict
    -> the dense-voxel :class:`~..models.minkloc3dv2.MinkLocDense` tree.

    Name map (attribute names -> torch keys, minkfpn.py:31-62):
      conv0/bn0; convs.{i}/bn.{i} stride-2 downsamples;
      blocks.{i}.{j} residual blocks (conv1/norm1/conv2/norm2
      [+eca.conv, +downsample.0/1]); conv1x1.{i} laterals;
      tconvs.{i} top-down transposed convs; pooling.pooling.p (GeM) or
      pooling.pooling.net_vlad.* (netvlad/netvladgc).
    Valid because the dense branch is sparse-equivalent (masked BN +
    mask-zeroed convs, models/minkloc3dv2.py docstring): each dense site
    computes exactly the sparse convolution's sum at that site.
    """
    sd = StateDict(state_dict)
    p: Dict[str, Any] = {}
    s: Dict[str, Any] = {}
    p["conv0"], s["conv0"] = _me_conv_bn(
        sd, "backbone.conv0.kernel", "backbone.bn0.bn", conv0_kernel_size
    )
    num_bottom_up = len(layers)
    for i in range(num_bottom_up):
        p[f"down{i}"], s[f"down{i}"] = _me_conv_bn(
            sd, f"backbone.convs.{i}.kernel", f"backbone.bn.{i}.bn", 2
        )
        for j in range(layers[i]):
            pref = f"backbone.blocks.{i}.{j}"
            bp: Dict[str, Any] = {}
            bs: Dict[str, Any] = {}
            bp["conv1"], bs["conv1"] = _me_conv_bn(
                sd, f"{pref}.conv1.kernel", f"{pref}.norm1.bn", 3
            )
            bp["conv2"], bs["conv2"] = _me_conv_bn(
                sd, f"{pref}.conv2.kernel", f"{pref}.norm2.bn", 3
            )
            if block == "ECABasicBlock":
                # torch Conv1d(1, 1, k) weight (1, 1, k) -> flax (k, 1, 1)
                bp["eca"] = {"conv": {"kernel": sd.take(
                    f"{pref}.eca.conv.weight",
                    lambda w: np.ascontiguousarray(
                        np.asarray(w).reshape(1, 1, -1).transpose(2, 1, 0)
                    ),
                )}}
            if f"{pref}.downsample.0.kernel" in sd.sd:
                bp["downsample"], bs["downsample"] = _me_conv_bn(
                    sd, f"{pref}.downsample.0.kernel", f"{pref}.downsample.1.bn", 1
                )
            p[f"block{i}_{j}"] = bp
            s[f"block{i}_{j}"] = bs
    p["lateral0"] = {"kernel": sd.take("backbone.conv1x1.0.kernel", _t_me_1x1)}
    for i in range(num_top_down):
        p[f"tconv{i}"] = {
            "kernel": sd.take(
                f"backbone.tconvs.{i}.kernel", lambda w: _t_me_tconv_kernel(w, 2)
            )
        }
        p[f"lateral{i + 1}"] = {
            "kernel": sd.take(f"backbone.conv1x1.{i + 1}.kernel", _t_me_1x1)
        }
    params: Dict[str, Any] = {"backbone": p}
    stats: Dict[str, Any] = {"backbone": s}
    if pooling == "GeM":
        params["pooling"] = {"p": sd.take("pooling.pooling.p")}
    elif pooling in ("netvlad", "netvladgc"):
        nv_p, nv_s = _netvlad_loupe(sd, "pooling.pooling.net_vlad")
        params["pooling"] = {"net_vlad": nv_p}
        stats["pooling"] = {"net_vlad": nv_s}
    # MAC / SPoC are parameter-free
    return {"params": params, "batch_stats": stats}, sd.unused()


def _convert_minkloc_from_cfg(state_dict: Dict[str, Any], cfg: Dict[str, Any]):
    return convert_minkloc3dv2(
        state_dict,
        planes=tuple(cfg.get("planes", (64, 128, 64, 32))),
        layers=tuple(cfg.get("layers", (1, 1, 1, 1))),
        num_top_down=cfg.get("num_top_down", 2),
        conv0_kernel_size=cfg.get("conv0_kernel_size", 5),
        block=cfg.get("block", "ECABasicBlock"),
        pooling=cfg.get("pooling", "GeM"),
    )


_CONVERTERS = {
    "pointnet_vlad": convert_pointnet_vlad,
    "patch_aug_net": convert_patch_aug_net,
    "pptnet": convert_pptnet,
    "pptnet_l2_norm": convert_pptnet,
    "minkloc3dv2": convert_minkloc3dv2,
}


def load_torch_checkpoint(
    path: str,
    model_type: str,
    cfg: Dict[str, Any],
    template_variables=None,
    strict_shapes: bool = True,
):
    """Load a reference .pth into flax variables.

    Accepts both the wrapped ``state_dict_encoder`` dict and bare state
    dicts (evaluate.py:150-158). ``template_variables`` (when given) is
    used to verify tree/shape agreement.
    """
    import torch

    obj = torch.load(path, map_location="cpu", weights_only=False)
    state_dict = obj.get("state_dict_encoder", obj) if isinstance(obj, dict) else obj
    state_dict = {k: v.numpy() for k, v in state_dict.items()}
    if model_type not in _CONVERTERS:
        raise NotImplementedError(
            f"torch checkpoint import not yet wired for model_type={model_type}; "
            f"available: {sorted(_CONVERTERS)}"
        )
    if model_type == "minkloc3dv2":
        variables, unused = _convert_minkloc_from_cfg(state_dict, cfg)
    else:
        variables, unused = _CONVERTERS[model_type](state_dict)
    if template_variables is not None and strict_shapes:
        import jax

        def check(path_, a, b):
            assert tuple(np.shape(a)) == tuple(np.shape(b)), (
                f"shape mismatch at {path_}: torch {np.shape(b)} vs flax {np.shape(a)}"
            )

        jax.tree_util.tree_map_with_path(
            lambda p, a, b: check(p, a, b),
            template_variables["params"],
            variables["params"],
        )
    return variables
