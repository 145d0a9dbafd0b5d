"""Distributed-BA scaling benchmark (BASELINE.json scaling target).

Measures BA iterations/s of parallel/dist_ba on a realistic whole-map
problem (100 KFs / 20k points / 100k observations — the scale of a
post-loop global BA, reference: src/LoopClosing.cc:1197 caps GBA at 200
KFs) across mesh sizes on the virtual CPU device mesh.

HONESTY NOTE: this host has 2 physical cores, so wall-clock speedup
saturates at 2x regardless of mesh size — the 1->2 device number is the
only physically meaningful wall-clock efficiency here; larger meshes
validate the layout (per-device memory/compute shrink ~1/n, collective
volume stays O((6K)^2) per iteration). See DIST_SCALING.md for the
projection to real multi-chip ICI.

Usage: JAX_PLATFORMS=cpu XLA_FLAGS=--xla_force_host_platform_device_count=8 \
       python scripts/bench_dist_ba.py
"""
import json
import sys
import time

sys.path.insert(0, ".")

import jax

jax.config.update("jax_platforms", "cpu")

import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh


def build_problem(K=100, Pn=20000, obs_per_pt=5, seed=0):
    from orb_slam3_modified_tpu.cameras import Camera, project
    from orb_slam3_modified_tpu.lie import se3
    from orb_slam3_modified_tpu.lie.se3 import SE3
    from orb_slam3_modified_tpu.optim.ba import BAProblem

    cam = Camera.pinhole(458.654, 457.296, 367.215, 248.375, width=752, height=480)
    rng = np.random.default_rng(seed)
    pts = np.concatenate(
        [rng.uniform(-10, 10, (Pn, 2)), rng.uniform(4, 12, (Pn, 1))], 1
    ).astype(np.float32)
    Rs, ts = [], []
    for k in range(K):
        Rs.append(np.eye(3, dtype=np.float32))
        ts.append(np.array([0.05 * k, 0.01 * (k % 7), 0.0], np.float32))
    Rk = np.stack(Rs)
    tk = np.stack(ts)
    # each point observed by obs_per_pt consecutive cameras
    obs_cam, obs_pt = [], []
    for p in range(Pn):
        k0 = rng.integers(0, K - obs_per_pt)
        for j in range(obs_per_pt):
            obs_cam.append(k0 + j)
            obs_pt.append(p)
    obs_cam = np.array(obs_cam, np.int32)
    obs_pt = np.array(obs_pt, np.int32)
    pc = np.einsum("oij,oj->oi", Rk[obs_cam], pts[obs_pt]) + tk[obs_cam]
    uv = np.array(project(cam, jnp.asarray(pc)))
    uv += rng.normal(0, 0.5, uv.shape).astype(np.float32)
    # perturb the state so the solver has work to do
    xi = rng.normal(0, 0.005, (K, 6)).astype(np.float32)
    xi[0] = 0
    T_noisy = se3.exp(jnp.asarray(xi)) @ SE3(jnp.asarray(Rk), jnp.asarray(tk))
    prob = BAProblem(
        T_cw=T_noisy,
        cam_fixed=jnp.zeros(K, bool).at[0].set(True),
        points=jnp.asarray(pts + rng.normal(0, 0.05, pts.shape).astype(np.float32)),
        pt_valid=jnp.ones(Pn, bool),
        obs_cam=jnp.asarray(obs_cam),
        obs_pt=jnp.asarray(obs_pt),
        obs_uv=jnp.asarray(uv.astype(np.float32)),
        obs_inv_s2=jnp.ones(len(obs_cam), jnp.float32),
        obs_valid=jnp.ones(len(obs_cam), bool),
    )
    return prob, cam


def time_mesh(prob, cam, n_dev, iters=10):
    from orb_slam3_modified_tpu.parallel.dist_ba import (
        PartitionedProblem,
        make_dist_ba_step,
    )

    devs = np.array(jax.devices()[:n_dev])
    mesh = Mesh(devs, ("ba",))
    part = PartitionedProblem(prob, n_dev)
    K = prob.T_cw.t.shape[0]
    step = make_dist_ba_step(mesh, cam, K, part.P_l)
    lam = jnp.asarray(1e-4, jnp.float32)
    args = (
        part.obs_cam, part.obs_pt, part.obs_uv, part.obs_inv_s2,
        part.obs_valid, part.pt_valid, prob.cam_fixed,
    )
    Rk, tk, pts = prob.T_cw.R, prob.T_cw.t, part.points
    # compile + one warm iteration
    Rk1, tk1, pts1, lam1 = step(Rk, tk, pts, *args[:5], args[5], args[6], lam)
    jax.block_until_ready(tk1)
    t0 = time.perf_counter()
    R, t, p, l = Rk, tk, pts, lam
    for _ in range(iters):
        R, t, p, l = step(R, t, p, *args[:5], args[5], args[6], l)
    jax.block_until_ready(t)
    dt = time.perf_counter() - t0
    return iters / dt


def main():
    n_avail = len(jax.devices())
    prob, cam = build_problem()
    O = prob.obs_cam.shape[0]
    print(
        f"[dist-ba] problem: K=100 P=20000 O={O} devices={n_avail}",
        file=sys.stderr,
    )
    results = {}
    for n in [1, 2, 4, 8]:
        if n > n_avail:
            break
        ips = time_mesh(prob, cam, n)
        results[n] = ips
        print(f"[dist-ba] mesh={n}: {ips:.2f} BA iters/s", file=sys.stderr)
    eff2 = results.get(2, 0) / results[1] / 2 if 1 in results and 2 in results else 0
    out = {
        "metric": "dist_ba_iters_per_s",
        "value": round(results.get(max(results), 0), 2),
        "unit": "iters/s",
        "mesh_sizes": {str(k): round(v, 2) for k, v in results.items()},
        "efficiency_1_to_2": round(eff2, 3),
        "note": "2 physical cores; >=2-device wall-clock capped by host, "
                "see DIST_SCALING.md",
    }
    print(json.dumps(out))
    with open("BENCH_DIST.json", "w") as f:
        json.dump(out, f, indent=1)


if __name__ == "__main__":
    main()
