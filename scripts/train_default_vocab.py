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

    descs = []
    t0 = time.perf_counter()
    n_scenes, n_views = 8, 10
    for s in range(n_scenes):
        tex_small = rng.uniform(0, 255, (96 + 16 * s, 96 + 16 * s)).astype(
            np.float32
        )
        texture = cv2.resize(tex_small, (1024, 1024), interpolation=cv2.INTER_CUBIC)
        for v in range(n_views):
            R_cw, p, _, _ = orbit_state(
                v / 2.0, n_views / 2.0, 3.0, 2 * np.pi, ring=True
            )
            T = np.eye(4)
            T[:3, :3] = R_cw
            T[:3, 3] = -R_cw @ p
            img = render_textured_scene(
                T, cam, texture, plane_z=2.0, plane_half=10.0, rays_c=rays
            )
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
    voc = build_vocabulary(corpus, k=10, depth=4, seed=0)
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
