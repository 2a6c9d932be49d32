#!/usr/bin/env python
"""Stage-wise diff of shim-ME reference MinkLoc vs MinkLocSparse."""
import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), "tests"))

import jax
import jax.numpy as jnp
import torch

import ref_minkowski_shim
from tests.test_minkloc_ref_parity import _load_ref, _build_ref_net, _clouds, STEP

mf, ml, eca, pw, qz = _load_ref()
net = _build_ref_net(mf, ml, eca, pw)

from patchaugnet_tpu.compat.torch_loader import convert_minkloc3dv2
from patchaugnet_tpu.models.minkloc_sparse import MinkLocSparse
from patchaugnet_tpu.models import minkloc_sparse as ms

variables, unused = convert_minkloc3dv2(
    {k: v.numpy() for k, v in net.state_dict().items()}
)

clouds = _clouds()
pc = clouds[0]
quantizer = qz.CartesianQuantizer(quant_step=STEP)
coords, _ = quantizer(torch.from_numpy(pc))
bcoords = ref_minkowski_shim.batched_coordinates([coords])
feats = torch.ones((bcoords.shape[0], 1), dtype=torch.float32)

captured = {}


def hook(name):
    def fn(mod, args, out):
        captured[name] = out
    return fn


bb = net.backbone
bb.bn0.register_forward_hook(hook("conv0bn"))
for i in range(4):
    bb.bn[i].register_forward_hook(hook(f"down{i}bn"))
    bb.blocks[i].register_forward_hook(hook(f"block{i}"))
for i, m in enumerate(bb.conv1x1):
    m.register_forward_hook(hook(f"lateral{i}"))
for i, m in enumerate(bb.tconvs):
    m.register_forward_hook(hook(f"tconv{i}"))

with torch.no_grad():
    x = ref_minkowski_shim.SparseTensor(feats, coordinates=bcoords)
    ref_back = bb(x)

# ours
pts = jnp.asarray(pc)[None]
qcoords, valid, dims = ms.quantize_cartesian(pts, STEP)
half = dims[0] // 2
pyr = ms.build_pyramid(qcoords, valid, dims, num_levels=4, num_top_down=2,
                       conv0_kernel_size=5)
fpn = ms.SparseVoxelFPN(out_channels=256, planes=(64, 128, 64, 32),
                        layers=(1, 1, 1, 1), num_top_down=2,
                        conv0_kernel_size=5, block="ECABasicBlock")
bb_vars = {"params": variables["params"]["backbone"],
           "batch_stats": variables["batch_stats"]["backbone"]}
(our_x, out_mask), inter = fpn.apply(
    bb_vars, None, pyr, train=False, capture_intermediates=True
)
inter = inter["intermediates"]


def at_level(ref_sparse, lvl):
    """Map shim rows -> (our slot order, ref features)."""
    ref_c = ref_sparse.coordinate_manager.coords(ref_sparse.coordinate_map_key)
    f = ref_sparse.F.numpy()
    keys = np.asarray(pyr.tables[lvl].keys[0])
    shift = half // (2 ** lvl)
    rk = ms.compose_keys(
        jnp.asarray(ref_c[:, 1:] // (2 ** lvl) + shift, jnp.int32),
        pyr.dims[lvl],
    )
    rk = np.asarray(rk)
    slot = np.searchsorted(keys, rk)
    ok = (keys[np.clip(slot, 0, len(keys) - 1)] == rk).all()
    return slot, f, ok


def diff(name, ours_arr, ref_sparse, lvl):
    slot, f, ok = at_level(ref_sparse, lvl)
    if not ok:
        print(f"{name}: COORD SET MISMATCH at level {lvl}")
        return
    o = np.asarray(ours_arr[0])[slot]
    d = np.abs(o - f)
    print(f"{name:12s} lvl{lvl} rows {f.shape} max|diff| {d.max():.3e} "
          f"scale {np.abs(f).mean():.3e}")


def find(tree, path):
    node = tree
    for p in path.split("/"):
        node = node[p]
    return node["__call__"][0]


# conv0+bn0 output (pre-relu): ours captures _SparseConvBN 'conv0' output
diff("conv0+bn", find(inter, "conv0"), captured["conv0bn"], 0)
for i in range(4):
    diff(f"down{i}+bn", find(inter, f"down{i}"), captured[f"down{i}bn"], i + 1)
    diff(f"block{i}", find(inter, f"block{i}_0"), captured[f"block{i}"], i + 1)
print("laterals/tconvs (levels 4,3,2):")
diff("lateral0", find(inter, "lateral0"), captured["lateral0"], 4)
diff("tconv0", find(inter, "tconv0"), captured["tconv0"], 3)
diff("lateral1", find(inter, "lateral1"), captured["lateral1"], 3)
diff("tconv1", find(inter, "tconv1"), captured["tconv1"], 2)
diff("lateral2", find(inter, "lateral2"), captured["lateral2"], 2)
slot, f, ok = at_level(ref_back, 2)
o = np.asarray(our_x[0])[slot]
print("backbone out max|diff|", np.abs(o - f).max())
