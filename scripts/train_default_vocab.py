"""Train the package's default BoW vocabulary from rendered-scene ORB
descriptors.

The reference ships no vocabulary (build.sh expects an external ORBvoc.txt,
SURVEY.md §2.2); upstream ORBvoc was trained offline on a large image
corpus (TemplatedVocabulary::create). This script is that offline trainer
for the TPU build: it renders a diverse set of textured scenes, extracts
real ORB descriptors with the production frontend, and trains the
hierarchical binary k-medians tree (bow/vocabulary.build_vocabulary),
writing orb_slam3_modified_tpu/assets/default_vocab.npz.

Usage: JAX_PLATFORMS=cpu python scripts/train_default_vocab.py
"""
import os
import sys
import time

sys.path.insert(0, ".")

import jax

jax.config.update("jax_platforms", "cpu")

import jax.numpy as jnp
import numpy as np


def main():
    from orb_slam3_modified_tpu.bow.vocabulary import (
        build_vocabulary,
        save_vocabulary_npz,
    )
    from orb_slam3_modified_tpu.cameras import Camera
    from orb_slam3_modified_tpu.features.extractor import ExtractorConfig, extract
    from orb_slam3_modified_tpu.utils.synthetic_dataset import (
        camera_rays,
        orbit_state,
        render_textured_scene,
    )

    cam = Camera.pinhole(330.0, 330.0, 256.0, 192.0, width=512, height=384)
    ecfg = ExtractorConfig(n_features=512, n_levels=4)
    rays = camera_rays(cam)
    rng = np.random.default_rng(7)
    import cv2

    def make_texture(s):
        """Diverse 1024x1024 textures: the upstream ORBvoc was trained on
        real imagery with structure at many scales; pure white noise
        produces descriptors with near-uniform bit statistics, so mix
        texture families (multi-octave noise, geometric shapes, stripes,
        blended structure) to widen the descriptor distribution."""
        kind = s % 4
        if kind == 0:  # multi-octave noise: coarse + mid + fine
            tex = np.zeros((1024, 1024), np.float32)
            for size, amp in ((24, 0.5), (96, 0.3), (384, 0.2)):
                small = rng.uniform(0, 255, (size, size)).astype(np.float32)
                tex += amp * cv2.resize(
                    small, (1024, 1024), interpolation=cv2.INTER_CUBIC
                )
            return tex
        if kind == 1:  # geometric shapes on gradient background
            gx = np.linspace(40, 200, 1024, dtype=np.float32)
            tex = np.tile(gx, (1024, 1)).copy()
            img8 = tex.astype(np.uint8)
            for _ in range(120):
                c = int(rng.integers(0, 255))
                x, y = rng.integers(0, 1024, 2)
                which = rng.integers(0, 3)
                if which == 0:
                    cv2.circle(img8, (int(x), int(y)), int(rng.integers(8, 80)),
                               c, -1)
                elif which == 1:
                    w, h = rng.integers(10, 120, 2)
                    cv2.rectangle(img8, (int(x), int(y)),
                                  (int(x + w), int(y + h)), c, -1)
                else:
                    x2, y2 = rng.integers(0, 1024, 2)
                    cv2.line(img8, (int(x), int(y)), (int(x2), int(y2)), c,
                             int(rng.integers(1, 6)))
            return img8.astype(np.float32)
        if kind == 2:  # oriented stripes + checker mix
            yy, xx = np.mgrid[0:1024, 0:1024].astype(np.float32)
            th = float(rng.uniform(0, np.pi))
            f1 = float(rng.uniform(0.02, 0.12))
            tex = 127 + 60 * np.sin(f1 * (np.cos(th) * xx + np.sin(th) * yy))
            n_cells = int(rng.integers(12, 40))
            checker = (
                ((xx // (1024 // n_cells) + yy // (1024 // n_cells)) % 2) * 70
            )
            return (0.6 * tex + 0.4 * checker).astype(np.float32)
        # kind 3: noise modulated by smooth mask (patchy structure)
        base = cv2.resize(
            rng.uniform(0, 255, (128, 128)).astype(np.float32), (1024, 1024),
            interpolation=cv2.INTER_CUBIC,
        )
        mask = cv2.resize(
            rng.uniform(0, 1, (12, 12)).astype(np.float32), (1024, 1024),
            interpolation=cv2.INTER_CUBIC,
        )
        return base * mask + (1 - mask) * 127

    descs = []
    t0 = time.perf_counter()
    n_scenes, n_views = 24, 12
    for s in range(n_scenes):
        texture = np.clip(make_texture(s), 0, 255)
        radius = float(rng.uniform(2.0, 5.0))
        plane_z = float(rng.uniform(1.0, 3.5))
        gamma = float(rng.uniform(0.7, 1.4))
        for v in range(n_views):
            R_cw, p, _, _ = orbit_state(
                v / 2.0, n_views / 2.0, radius, 2 * np.pi, ring=True
            )
            T = np.eye(4)
            T[:3, :3] = R_cw
            T[:3, 3] = -R_cw @ p
            img = render_textured_scene(
                T, cam, texture, plane_z=plane_z, plane_half=10.0, rays_c=rays
            )
            img = 255.0 * (np.clip(img, 0, 255) / 255.0) ** gamma
            f = extract(jnp.asarray(img), ecfg)
            valid = np.asarray(f.valid)
            descs.append(np.asarray(f.desc)[valid])
        print(
            f"[vocab] scene {s + 1}/{n_scenes}: {sum(len(d) for d in descs)} "
            f"descriptors ({time.perf_counter() - t0:.0f}s)",
            file=sys.stderr,
        )
    corpus = np.concatenate(descs).astype(np.uint32)
    print(f"[vocab] training on {len(corpus)} descriptors", file=sys.stderr)
    voc = build_vocabulary(corpus, k=10, depth=5, seed=0)
    out = os.path.join("orb_slam3_modified_tpu", "assets", "default_vocab.npz")
    os.makedirs(os.path.dirname(out), exist_ok=True)
    save_vocabulary_npz(out, voc)
    print(
        f"[vocab] {voc.n_words} words, {len(voc.node_desc)} nodes -> {out} "
        f"({os.path.getsize(out) / 1024:.0f} KB, {time.perf_counter() - t0:.0f}s)",
        file=sys.stderr,
    )


if __name__ == "__main__":
    main()
