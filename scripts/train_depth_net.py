"""Train the package's mono depth+segmentation net on synthetic scenes.

Role parity: the reference's semantic pipeline assumes externally-trained
depth (ZoeDepth) and segmentation (OneFormer) checkpoints
(depth_estimate/predict_depth.py, image_segmentation/oneformer/). This
trainer produces the package-shipped equivalent from the synthetic
renderer's exact depth/mask ground truth, so mono_semantic reconstruction
runs end-to-end with a REAL inference model rather than a stub callable.

Usage: python scripts/train_depth_net.py            (TPU if free)
       JAX_PLATFORMS=cpu python scripts/train_depth_net.py
"""
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import numpy as np

import orb_slam3_modified_tpu  # noqa: F401  (precision config)
import jax
import jax.numpy as jnp
import optax


H, W = 96, 128  # training resolution (inference upsamples if needed)
BATCH = 8
STEPS = 1200
MAX_DEPTH = 30.0


def make_dataset(n_scenes=64, views_per=6, seed=0):
    import cv2

    from orb_slam3_modified_tpu.cameras import Camera
    from orb_slam3_modified_tpu.utils.synthetic_dataset import (
        camera_rays,
        orbit_state,
        render_textured_scene_with_depth,
    )

    cam = Camera.pinhole(80.0, 80.0, W / 2, H / 2, width=W, height=H)
    rays = camera_rays(cam)
    rng = np.random.default_rng(seed)
    imgs, depths, masks = [], [], []
    for s in range(n_scenes):
        size = int(rng.integers(48, 160))
        tex = cv2.resize(
            rng.uniform(0, 255, (size, size)).astype(np.float32), (1024, 1024),
            interpolation=cv2.INTER_CUBIC,
        )
        radius = float(rng.uniform(2.0, 6.0))
        plane_z = float(rng.uniform(1.0, 4.0))
        for v in range(views_per):
            R_cw, p, _, _ = orbit_state(
                v + rng.uniform(0, 1), views_per, radius, 2 * np.pi, ring=True
            )
            T = np.eye(4)
            T[:3, :3] = R_cw
            T[:3, 3] = -R_cw @ p
            img, depth, mask = render_textured_scene_with_depth(
                T, cam, tex, plane_z=plane_z, plane_half=10.0, rays_c=rays
            )
            imgs.append(img)
            depths.append(depth)
            masks.append(mask)
    return (
        np.stack(imgs)[..., None],
        np.stack(depths),
        np.stack(masks).astype(np.int32),
    )


def main():
    from orb_slam3_modified_tpu.models.depth import DepthSegNet, save_depth_model

    t0 = time.perf_counter()
    imgs, depths, masks = make_dataset()
    n = len(imgs)
    print(f"[depth] dataset {n} views ({time.perf_counter()-t0:.0f}s)",
          file=sys.stderr)

    net = DepthSegNet(base=16, n_classes=2, max_depth=MAX_DEPTH)
    rng = jax.random.PRNGKey(0)
    params = net.init(rng, jnp.zeros((1, H, W, 1)))["params"]
    tx = optax.adam(3e-4)
    opt_state = tx.init(params)

    @jax.jit
    def step(params, opt_state, img, depth, mask):
        def loss_fn(p):
            pred_d, seg = net.apply({"params": p}, img / 255.0)
            valid = mask > 0
            # scale-invariant-ish log-depth loss over the surface
            ld = jnp.log(jnp.maximum(pred_d, 1e-3)) - jnp.log(
                jnp.maximum(depth, 1e-3)
            )
            ld = jnp.where(valid, ld, 0.0)
            nv = jnp.maximum(valid.sum(), 1)
            l_depth = (ld**2).sum() / nv - 0.5 * (ld.sum() / nv) ** 2
            l_seg = optax.softmax_cross_entropy_with_integer_labels(
                seg, mask
            ).mean()
            return l_depth + l_seg, (l_depth, l_seg)

        (loss, (ld, ls)), g = jax.value_and_grad(loss_fn, has_aux=True)(params)
        upd, opt_state = tx.update(g, opt_state)
        params = optax.apply_updates(params, upd)
        return params, opt_state, loss, ld, ls

    rng_np = np.random.default_rng(1)
    for it in range(STEPS):
        sel = rng_np.integers(0, n, BATCH)
        params, opt_state, loss, ld, ls = step(
            params, opt_state,
            jnp.asarray(imgs[sel]), jnp.asarray(depths[sel]),
            jnp.asarray(masks[sel]),
        )
        if it % 100 == 0:
            print(
                f"[depth] it {it}: loss {float(loss):.4f} "
                f"(depth {float(ld):.4f} seg {float(ls):.4f}) "
                f"{time.perf_counter()-t0:.0f}s",
                file=sys.stderr,
            )

    # held-out sanity: relative depth error on fresh scenes
    imgs_v, depths_v, masks_v = make_dataset(n_scenes=4, views_per=4, seed=99)
    pred, seg = jax.jit(lambda x: net.apply({"params": params}, x))(
        jnp.asarray(imgs_v) / 255.0
    )
    pred = np.asarray(pred)
    seg_cls = np.argmax(np.asarray(seg), axis=-1)
    v = masks_v > 0
    rel = np.abs(pred[v] - depths_v[v]) / depths_v[v]
    iou = ((seg_cls == 1) & v).sum() / max(((seg_cls == 1) | v).sum(), 1)
    print(
        f"[depth] holdout: mean rel depth err {rel.mean():.3f} "
        f"(p90 {np.percentile(rel, 90):.3f}) surface IoU {iou:.3f}",
        file=sys.stderr,
    )
    out = os.path.join(
        os.path.dirname(__file__), "..", "orb_slam3_modified_tpu", "assets",
        "depth_seg_net.npz",
    )
    save_depth_model(
        out, params,
        meta={"base": 16, "n_classes": 2, "max_depth": MAX_DEPTH,
              "train_res": f"{H}x{W}",
              "holdout_rel_err": f"{rel.mean():.4f}"},
    )
    print(
        f"[depth] saved {os.path.abspath(out)} "
        f"({os.path.getsize(out)/1024:.0f} KB, {time.perf_counter()-t0:.0f}s)",
        file=sys.stderr,
    )


if __name__ == "__main__":
    main()
