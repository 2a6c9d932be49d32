"""Functional CPU shim for MinkowskiEngine — enough of the ME API to run
the reference MinkLoc3Dv2 forward end to end.

VERDICT r3 missing #1: MinkLoc was the one family whose reference
forward had never been executed and diffed (MinkowskiEngine needs CUDA
and is not installable here).  This module mirrors the round-3
``ref_pointops_shim`` move: a functional stand-in installed under
``sys.modules['MinkowskiEngine']`` *before* the reference modules
import, reproducing the small ME surface that
``place_recognition/Minkloc3D_V2/models/{minkfpn.py:9-93,
minkloc.py:20-39, resnet.py:31-96, layers/eca_block.py:12-72,
layers/pooling.py:11-85}`` actually touch:

  - ``ME.SparseTensor`` with a dict/sorted-key coordinate manager
    (construction from batched coordinates, reconstruction at an
    existing ``coordinate_map_key``, ``+`` on matching maps,
    ``.F/.C/.coordinate_manager/.coordinate_map_key``),
  - ``MinkowskiConvolution`` (kernel sizes 1/2/3/5, strides 1/2),
    ``MinkowskiConvolutionTranspose`` (k=2 s=2, reusing the cached
    bottom-up coordinate map at the output stride),
  - ``MinkowskiBatchNorm`` / ``MinkowskiReLU`` / global avg & max
    poolings / ``MinkowskiBroadcastMultiplication``,
  - ``MinkowskiEngine.modules.resnet_block.BasicBlock/Bottleneck``
    (reproduced from the public ME module the reference subclasses),
  - ``ME.utils.sparse_quantize / batched_coordinates /
    kaiming_normal_``.

Semantics pinned here (ME conventions, documented where this
environment cannot execute real ME to probe them):

  * Hypercube kernel region: per-axis offsets
    ``{-(k-1)/2 .. (k-1)/2} * tensor_stride`` for odd k and
    ``{0 .. k-1} * tensor_stride`` for even k, with the linear kernel
    index iterating the FIRST coordinate fastest
    (``l = ix + k*iy + k^2*iz``) — the same reading of ME's kernel
    region that ``compat.torch_loader._t_me_kernel`` documents.
  * Convolution gathers input at ``out_coord + offset`` (cross-
    correlation, like torch/flax convs).
  * Stride-s convolution output coordinates:
    ``floor(c / (s*t)) * (s*t)`` (true floor, negatives included).
  * ConvolutionTranspose is the transpose of that map: fine output
    coordinate ``f`` receives ``x[f - q*t_out] @ kernel[l(q)]`` with
    ``q = (f / t_out) mod 2`` per axis — i.e. the kernel index is NOT
    flipped (torch ``ConvTranspose3d`` scatter semantics).
"""
import sys
import types
from typing import Dict, List, Optional, Tuple

import numpy as np
import torch
import torch.nn as nn

_OFF = np.int64(1) << 20          # coordinate offset (coords may be negative)
_SPAN = np.int64(1) << 21


def _compose(coords: np.ndarray) -> np.ndarray:
    """(M, 4) int coords [b, x, y, z] -> sortable int64 keys."""
    c = coords.astype(np.int64)
    k = c[:, 0]
    for d in range(1, 4):
        k = k * _SPAN + (c[:, d] + _OFF)
    return k


class CoordinateMapKey:
    __slots__ = ("id", "tensor_stride")

    def __init__(self, key_id: int, tensor_stride: int):
        self.id = key_id
        self.tensor_stride = tensor_stride

    def get_tensor_stride(self):
        return (self.tensor_stride,) * 3


class CoordinateManager:
    """Maps key-id -> (coords, sorted keys, argsort perm)."""

    def __init__(self):
        self._maps: Dict[int, Tuple[np.ndarray, np.ndarray, np.ndarray]] = {}
        self._strides: Dict[int, int] = {}
        self._next = 0

    def insert(self, coords: np.ndarray, tensor_stride: int) -> CoordinateMapKey:
        keys = _compose(coords)
        perm = np.argsort(keys, kind="stable")
        self._maps[self._next] = (coords, keys[perm], perm)
        self._strides[self._next] = tensor_stride
        self._next += 1
        return CoordinateMapKey(self._next - 1, tensor_stride)

    def coords(self, key: CoordinateMapKey) -> np.ndarray:
        return self._maps[key.id][0]

    def lookup(self, key: CoordinateMapKey, queries: np.ndarray):
        """-> (row indices into the map's coords, found mask)."""
        _, skeys, perm = self._maps[key.id]
        q = _compose(queries)
        pos = np.searchsorted(skeys, q)
        pos_c = np.clip(pos, 0, len(skeys) - 1)
        found = (pos < len(skeys)) & (skeys[pos_c] == q)
        return perm[pos_c], found

    def map_at_stride(self, tensor_stride: int) -> CoordinateMapKey:
        """The cached coordinate map at a given tensor stride (the
        bottom-up map a ConvolutionTranspose reuses). All maps this
        model creates at one stride share the same coordinate set."""
        for kid, s in self._strides.items():
            if s == tensor_stride:
                return CoordinateMapKey(kid, s)
        raise KeyError(f"no coordinate map at tensor_stride {tensor_stride}")


class SparseTensor:
    def __init__(
        self,
        features: torch.Tensor,
        coordinates: Optional[torch.Tensor] = None,
        coordinate_manager: Optional[CoordinateManager] = None,
        coordinate_map_key: Optional[CoordinateMapKey] = None,
        tensor_stride: int = 1,
    ):
        self.F = features
        if coordinates is not None:
            assert coordinate_map_key is None
            cm = coordinate_manager or CoordinateManager()
            self.coordinate_manager = cm
            self.coordinate_map_key = cm.insert(
                np.asarray(coordinates.cpu().numpy(), np.int64), tensor_stride
            )
        else:
            assert coordinate_manager is not None and coordinate_map_key is not None
            self.coordinate_manager = coordinate_manager
            self.coordinate_map_key = coordinate_map_key

    @property
    def C(self) -> torch.Tensor:
        return torch.from_numpy(
            self.coordinate_manager.coords(self.coordinate_map_key).copy()
        )

    @property
    def tensor_stride(self):
        return self.coordinate_map_key.tensor_stride

    @property
    def shape(self):
        return self.F.shape

    @property
    def decomposed_features(self) -> List[torch.Tensor]:
        c = self.coordinate_manager.coords(self.coordinate_map_key)
        return [self.F[c[:, 0] == b] for b in np.unique(c[:, 0])]

    def _same_map(self, other: "SparseTensor") -> bool:
        return (
            self.coordinate_manager is other.coordinate_manager
            and self.coordinate_map_key.id == other.coordinate_map_key.id
        )

    def __add__(self, other: "SparseTensor") -> "SparseTensor":
        assert self._same_map(other), "SparseTensor add: coordinate maps differ"
        return SparseTensor(
            self.F + other.F,
            coordinate_manager=self.coordinate_manager,
            coordinate_map_key=self.coordinate_map_key,
        )

    __radd__ = __add__

    def __iadd__(self, other):          # `out += residual` in the blocks
        return self.__add__(other)


def _kernel_offsets(kernel_size: int, t: int) -> np.ndarray:
    """(K^3, 3) hypercube offsets, FIRST coordinate fastest."""
    if kernel_size % 2:
        rng = [(i - (kernel_size - 1) // 2) * t for i in range(kernel_size)]
    else:
        rng = [i * t for i in range(kernel_size)]
    res = np.zeros((kernel_size ** 3, 3), np.int64)
    l = 0
    for iz in range(kernel_size):
        for iy in range(kernel_size):
            for ix in range(kernel_size):
                res[l] = (rng[ix], rng[iy], rng[iz])
                l += 1
    return res


class MinkowskiConvolution(nn.Module):
    def __init__(self, in_channels, out_channels, kernel_size=3, stride=1,
                 dilation=1, bias=False, dimension=3):
        super().__init__()
        assert dimension == 3 and dilation == 1 and not bias
        self.in_channels = in_channels
        self.out_channels = out_channels
        self.kernel_size = kernel_size
        self.stride = stride
        kv = kernel_size ** 3
        shape = (in_channels, out_channels) if kv == 1 else (kv, in_channels, out_channels)
        self.kernel = nn.Parameter(torch.randn(*shape) * 0.02)

    def forward(self, x: SparseTensor) -> SparseTensor:
        cm = x.coordinate_manager
        t = x.tensor_stride
        in_key = x.coordinate_map_key
        coords = cm.coords(in_key)
        if self.kernel_size == 1 and self.stride == 1:
            return SparseTensor(x.F @ self.kernel, coordinate_manager=cm,
                                coordinate_map_key=in_key)
        if self.stride == 1:
            out_coords, out_key = coords, in_key
        else:
            st = self.stride * t
            sp = np.floor_divide(coords[:, 1:], st) * st
            cand = np.concatenate([coords[:, :1], sp], axis=1)
            _, first = np.unique(_compose(cand), return_index=True)
            out_coords = cand[np.sort(first)]
            out_key = cm.insert(out_coords, st)
        offs = _kernel_offsets(self.kernel_size, t)
        acc = torch.zeros((len(out_coords), self.out_channels), dtype=x.F.dtype)
        w = self.kernel if self.kernel.dim() == 3 else self.kernel[None]
        for l in range(len(offs)):
            q = out_coords.copy()
            q[:, 1:] += offs[l]
            rows, found = cm.lookup(in_key, q)
            if not found.any():
                continue
            acc[found] += x.F[rows[found]] @ w[l]
        return SparseTensor(acc, coordinate_manager=cm, coordinate_map_key=out_key)


class MinkowskiConvolutionTranspose(nn.Module):
    def __init__(self, in_channels, out_channels, kernel_size=2, stride=2,
                 dilation=1, bias=False, dimension=3):
        super().__init__()
        assert dimension == 3 and kernel_size == 2 and stride == 2 and not bias
        self.in_channels = in_channels
        self.out_channels = out_channels
        self.kernel = nn.Parameter(torch.randn(8, in_channels, out_channels) * 0.02)

    def forward(self, x: SparseTensor) -> SparseTensor:
        cm = x.coordinate_manager
        t_out = x.tensor_stride // 2
        out_key = cm.map_at_stride(t_out)
        out_coords = cm.coords(out_key)
        q = np.floor_divide(out_coords[:, 1:], t_out)
        qmod = ((q % 2) + 2) % 2                       # per-axis offset bit
        l = qmod[:, 0] + 2 * qmod[:, 1] + 4 * qmod[:, 2]   # first axis fastest
        parent = out_coords.copy()
        parent[:, 1:] -= qmod * t_out
        rows, found = cm.lookup(x.coordinate_map_key, parent)
        feats = x.F[rows] * torch.from_numpy(found[:, None].astype(np.float32))
        w = self.kernel[torch.from_numpy(l)]           # (M, in, out)
        out = torch.einsum("mi,mio->mo", feats, w)
        return SparseTensor(out, coordinate_manager=cm, coordinate_map_key=out_key)


class MinkowskiBatchNorm(nn.Module):
    def __init__(self, num_features, eps=1e-5, momentum=0.1):
        super().__init__()
        self.bn = nn.BatchNorm1d(num_features, eps=eps, momentum=momentum)

    def forward(self, x: SparseTensor) -> SparseTensor:
        return SparseTensor(self.bn(x.F), coordinate_manager=x.coordinate_manager,
                            coordinate_map_key=x.coordinate_map_key)


class MinkowskiReLU(nn.Module):
    def __init__(self, inplace=False):
        super().__init__()

    def forward(self, x: SparseTensor) -> SparseTensor:
        return SparseTensor(torch.relu(x.F), coordinate_manager=x.coordinate_manager,
                            coordinate_map_key=x.coordinate_map_key)


def _global_pool(x: SparseTensor, reduce: str) -> SparseTensor:
    c = x.coordinate_manager.coords(x.coordinate_map_key)
    batches = np.unique(c[:, 0])
    rows = []
    for b in batches:
        f = x.F[c[:, 0] == b]
        rows.append(f.max(0).values if reduce == "max" else f.mean(0))
    out_coords = np.zeros((len(batches), 4), np.int64)
    out_coords[:, 0] = batches
    cm = x.coordinate_manager
    # tensor_stride 0 = "origin map" sentinel so map_at_stride (the
    # tconv's cached-bottom-up lookup) never matches a pooling map
    key = cm.insert(out_coords, 0)
    return SparseTensor(torch.stack(rows), coordinate_manager=cm,
                        coordinate_map_key=key)


class MinkowskiGlobalPooling(nn.Module):
    def forward(self, x):
        return _global_pool(x, "mean")


class MinkowskiGlobalAvgPooling(nn.Module):
    def forward(self, x):
        return _global_pool(x, "mean")


class MinkowskiGlobalMaxPooling(nn.Module):
    def forward(self, x):
        return _global_pool(x, "max")


class MinkowskiBroadcastMultiplication(nn.Module):
    def forward(self, x: SparseTensor, y: SparseTensor) -> SparseTensor:
        cx = x.coordinate_manager.coords(x.coordinate_map_key)
        cy = y.coordinate_manager.coords(y.coordinate_map_key)
        order = {int(b): i for i, b in enumerate(cy[:, 0])}
        sel = torch.from_numpy(
            np.array([order[int(b)] for b in cx[:, 0]], np.int64)
        )
        return SparseTensor(x.F * y.F[sel], coordinate_manager=x.coordinate_manager,
                            coordinate_map_key=x.coordinate_map_key)


class MinkowskiLinear(nn.Module):
    def __init__(self, in_features, out_features, bias=True):
        super().__init__()
        self.linear = nn.Linear(in_features, out_features, bias=bias)

    def forward(self, x: SparseTensor) -> SparseTensor:
        return SparseTensor(self.linear(x.F), coordinate_manager=x.coordinate_manager,
                            coordinate_map_key=x.coordinate_map_key)


class MinkowskiAvgPooling(nn.Module):
    def __init__(self, kernel_size=2, stride=2, dimension=3):
        super().__init__()

    def forward(self, x):
        raise NotImplementedError("not used by MinkLoc3Dv2")


# ----------------------------------------------------------------- blocks
class BasicBlock(nn.Module):
    """MinkowskiEngine.modules.resnet_block.BasicBlock (public ME)."""

    expansion = 1

    def __init__(self, inplanes, planes, stride=1, dilation=1, downsample=None,
                 bn_momentum=0.1, dimension=3):
        super().__init__()
        self.conv1 = MinkowskiConvolution(inplanes, planes, kernel_size=3,
                                          stride=stride, dilation=dilation,
                                          dimension=dimension)
        self.norm1 = MinkowskiBatchNorm(planes, momentum=bn_momentum)
        self.conv2 = MinkowskiConvolution(planes, planes, kernel_size=3,
                                          stride=1, dilation=dilation,
                                          dimension=dimension)
        self.norm2 = MinkowskiBatchNorm(planes, momentum=bn_momentum)
        self.relu = MinkowskiReLU(inplace=True)
        self.downsample = downsample

    def forward(self, x):
        residual = x
        out = self.conv1(x)
        out = self.norm1(out)
        out = self.relu(out)
        out = self.conv2(out)
        out = self.norm2(out)
        if self.downsample is not None:
            residual = self.downsample(x)
        out = out + residual
        out = self.relu(out)
        return out


class Bottleneck(nn.Module):
    expansion = 4

    def __init__(self, inplanes, planes, stride=1, dilation=1, downsample=None,
                 bn_momentum=0.1, dimension=3):
        super().__init__()
        self.conv1 = MinkowskiConvolution(inplanes, planes, kernel_size=1,
                                          dimension=dimension)
        self.norm1 = MinkowskiBatchNorm(planes, momentum=bn_momentum)
        self.conv2 = MinkowskiConvolution(planes, planes, kernel_size=3,
                                          stride=stride, dilation=dilation,
                                          dimension=dimension)
        self.norm2 = MinkowskiBatchNorm(planes, momentum=bn_momentum)
        self.conv3 = MinkowskiConvolution(planes, planes * self.expansion,
                                          kernel_size=1, dimension=dimension)
        self.norm3 = MinkowskiBatchNorm(planes * self.expansion,
                                        momentum=bn_momentum)
        self.relu = MinkowskiReLU(inplace=True)
        self.downsample = downsample

    def forward(self, x):
        residual = x
        out = self.relu(self.norm1(self.conv1(x)))
        out = self.relu(self.norm2(self.conv2(out)))
        out = self.norm3(self.conv3(out))
        if self.downsample is not None:
            residual = self.downsample(x)
        out = out + residual
        return self.relu(out)


# ------------------------------------------------------------------ utils
def sparse_quantize(pc, quantization_size=1.0, return_index=False):
    """floor(p / qs), unique rows (first occurrence)."""
    p = pc.numpy() if isinstance(pc, torch.Tensor) else np.asarray(pc)
    q = np.floor(p / quantization_size).astype(np.int32)
    _, first = np.unique(
        _compose(np.concatenate([np.zeros((len(q), 1), np.int64), q], axis=1)),
        return_index=True,
    )
    first = np.sort(first)
    coords = torch.from_numpy(q[first])
    if return_index:
        return coords, torch.from_numpy(first)
    return coords


def batched_coordinates(coord_list):
    out = []
    for b, c in enumerate(coord_list):
        c = c.numpy() if isinstance(c, torch.Tensor) else np.asarray(c)
        bc = np.concatenate(
            [np.full((len(c), 1), b, c.dtype), c], axis=1
        )
        out.append(bc)
    return torch.from_numpy(np.concatenate(out).astype(np.int32))


def kaiming_normal_(tensor, mode="fan_out", nonlinearity="relu"):
    with torch.no_grad():
        return nn.init.kaiming_normal_(tensor, mode=mode, nonlinearity=nonlinearity)


def install():
    """Install under sys.modules['MinkowskiEngine'] (idempotent)."""
    here = sys.modules[__name__]
    me = sys.modules.get("MinkowskiEngine")
    if me is None:
        me = types.ModuleType("MinkowskiEngine")
        sys.modules["MinkowskiEngine"] = me
    for name in dir(here):
        if name.startswith("Minkowski") or name in (
            "SparseTensor", "CoordinateManager", "CoordinateMapKey",
        ):
            setattr(me, name, getattr(here, name))
    utils = types.ModuleType("MinkowskiEngine.utils")
    utils.sparse_quantize = sparse_quantize
    utils.batched_coordinates = batched_coordinates
    utils.kaiming_normal_ = kaiming_normal_
    me.utils = utils
    sys.modules["MinkowskiEngine.utils"] = utils
    modules = types.ModuleType("MinkowskiEngine.modules")
    resnet_block = types.ModuleType("MinkowskiEngine.modules.resnet_block")
    resnet_block.BasicBlock = BasicBlock
    resnet_block.Bottleneck = Bottleneck
    modules.resnet_block = resnet_block
    me.modules = modules
    sys.modules["MinkowskiEngine.modules"] = modules
    sys.modules["MinkowskiEngine.modules.resnet_block"] = resnet_block
    return me
