"""Monocular depth + segmentation network for semantic reconstruction.

TPU-native stand-in for the fork's vendored inference models (reference:
depth_estimate/predict_depth.py runs ZoeDepth for metric mono-depth;
image_segmentation/oneformer/oneformer_model.py runs OneFormer for semantic
masks; both feed mono_semantic / mono_depth_seg, README.md:247-267). The
reference models are ~100M-parameter torch networks run offline; this is a
small flax U-Net trained on the synthetic renderer's exact depth/mask
ground truth (utils/synthetic_dataset.render_textured_scene_with_depth) —
the same *interface* (gray image -> metric depth map, image -> class map)
at a size that ships inside the package and runs in one jit on TPU or CPU.

Outputs:
- depth head: softplus -> metric depth in meters,
- seg head: per-pixel class logits (default 2 classes: background=0,
  surface=1), colored through recon.cloud.load_colormap downstream.
"""
from __future__ import annotations

import os

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np


class _ConvBlock(nn.Module):
    ch: int

    @nn.compact
    def __call__(self, x):
        x = nn.Conv(self.ch, (3, 3), padding="SAME")(x)
        x = nn.gelu(x)
        x = nn.Conv(self.ch, (3, 3), padding="SAME")(x)
        return nn.gelu(x)


class DepthSegNet(nn.Module):
    """Tiny U-Net: 3 down levels + skips; joint depth + seg heads."""

    base: int = 16
    n_classes: int = 2
    max_depth: float = 30.0

    @nn.compact
    def __call__(self, x):
        # x: (B, H, W, 1) in [0, 1]; H, W multiples of 8
        e0 = _ConvBlock(self.base)(x)
        e1 = _ConvBlock(self.base * 2)(nn.avg_pool(e0, (2, 2), (2, 2)))
        e2 = _ConvBlock(self.base * 4)(nn.avg_pool(e1, (2, 2), (2, 2)))
        b = _ConvBlock(self.base * 8)(nn.avg_pool(e2, (2, 2), (2, 2)))

        def up(z, skip, ch):
            zh = jax.image.resize(
                z, (z.shape[0], skip.shape[1], skip.shape[2], z.shape[3]),
                "bilinear",
            )
            return _ConvBlock(ch)(jnp.concatenate([zh, skip], axis=-1))

        d2 = up(b, e2, self.base * 4)
        d1 = up(d2, e1, self.base * 2)
        d0 = up(d1, e0, self.base)
        inv = nn.Conv(1, (3, 3), padding="SAME")(d0)
        # inverse-depth parameterization (near resolution where it matters)
        inv_depth = nn.softplus(inv[..., 0]) + 1.0 / self.max_depth
        depth = 1.0 / inv_depth
        seg = nn.Conv(self.n_classes, (3, 3), padding="SAME")(d0)
        return depth, seg


def save_depth_model(path: str, params, meta: dict | None = None) -> None:
    from flax import serialization

    blob = serialization.msgpack_serialize(
        jax.tree_util.tree_map(np.asarray, params)
    )
    arrs = {"blob": np.frombuffer(blob, np.uint8)}
    if meta:
        arrs["meta"] = np.array(
            [f"{k}={v}" for k, v in sorted(meta.items())]
        )
    np.savez_compressed(path, **arrs)


def load_depth_model(path: str):
    """Returns (params pytree, meta dict)."""
    from flax import serialization

    d = np.load(path)
    params = serialization.msgpack_restore(d["blob"].tobytes())
    meta = {}
    if "meta" in d.files:
        for kv in d["meta"]:
            k, v = str(kv).split("=", 1)
            meta[k] = v
    return params, meta


def _run_at_train_res(net, params, img, train_hw):
    """Resize to the net's training resolution, run, resize maps back.

    The net is trained at one (H, W) with matched intrinsics (a 512-wide
    fx~330 or 752-wide fx~458 camera downsampled to 128 wide lands within
    a few percent of the training fx=80); running native-res would silently
    change the per-pixel field of view the depth head learned."""
    th, tw = train_hw
    h, w = img.shape[-2], img.shape[-1]
    x = jnp.asarray(img, jnp.float32)[None, :, :, None] / 255.0
    x = jax.image.resize(x, (1, th, tw, 1), "bilinear")
    depth, seg = net.apply({"params": params}, x)
    depth = jax.image.resize(depth[0], (h, w), "bilinear")
    seg = jax.image.resize(seg[0], (h, w, seg.shape[-1]), "bilinear")
    return depth, seg


def make_depth_fn(net: DepthSegNet, params, train_hw=(96, 128)):
    """image (H, W) uint8/float -> metric depth (H, W) float32.

    The callable shape recon.cloud.semantic_cloud expects for its
    depth_fn plug (reference: predict_depth.py batch inference)."""

    @jax.jit
    def run(img):
        return _run_at_train_res(net, params, img, train_hw)[0]

    return lambda img: np.asarray(run(img))


def make_seg_fn(net: DepthSegNet, params, train_hw=(96, 128)):
    """image (H, W) -> class map (H, W) int32."""

    @jax.jit
    def run(img):
        seg = _run_at_train_res(net, params, img, train_hw)[1]
        return jnp.argmax(seg, axis=-1).astype(jnp.int32)

    return lambda img: np.asarray(run(img))


def default_depth_model():
    """The package-shipped trained model (scripts/train_depth_net.py), or
    None if the asset is absent. Returns (net, params, meta)."""
    path = os.path.join(
        os.path.dirname(os.path.dirname(__file__)), "assets", "depth_seg_net.npz"
    )
    if not os.path.exists(path):
        return None
    params, meta = load_depth_model(path)
    net = DepthSegNet(
        base=int(meta.get("base", 16)),
        n_classes=int(meta.get("n_classes", 2)),
        max_depth=float(meta.get("max_depth", 30.0)),
    )
    return net, params, meta
