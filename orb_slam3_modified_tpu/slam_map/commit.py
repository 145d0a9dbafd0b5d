"""Commit a whole-map (or whole-chain) solve back into the arena, with
correction propagation to keyframes/points created while the solve ran.

This is the write-back half of every asynchronous global solve: the
post-loop global BA, the joint VI global BA, and the staged IMU init's
full visual-inertial BA all solve over a snapshot on a worker thread while
the tracker keeps extending the map; on completion, keyframes that were
born during the solve are corrected through the spanning-tree parent
chain: T_new = (T_child T_parent_pre^-1) T_parent_opt.

Reference: LoopClosing::RunGlobalBundleAdjustment's post-GBA propagation
(/root/reference/src/LoopClosing.cc:2330-2500); the staged-init analog is
LocalMapping::InitializeIMU, which corrects the keyframes that queued up
during the solve (/root/reference/src/LocalMapping.cc:1300-1360 region).

Caller holds the map lock.
"""
from __future__ import annotations

import numpy as np


def commit_whole_map_solve(m, kfs, kfs_fid, mps, R_opt, t_opt, pts_opt,
                           pre_R, pre_t):
    """Write back solved keyframe poses + point positions and propagate the
    correction to keyframes/points created during the solve.

    kfs: (K,) keyframe slots in the solve; kfs_fid: their frame ids at
    snapshot time (slots are free-listed, so identity = slot AND frame id);
    mps: (P,) point slots in the solve; R_opt/t_opt/pts_opt: solved states;
    pre_R/pre_t: the keyframe poses at snapshot time (for the relative
    child-correction).
    """
    # keyframes culled/replaced during the solve keep their state
    alive = m.kf_valid[kfs] & (m.kf_frame_id[kfs] == kfs_fid)
    m.kf_R[kfs[alive]] = R_opt[alive]
    m.kf_t[kfs[alive]] = t_opt[alive]
    mp_alive = m.mp_valid[mps]
    m.mp_pos[mps[mp_alive]] = pts_opt[mp_alive]
    if m.kf_parent is None:
        return
    # propagate to keyframes created during the solve through the
    # parent chain: T_new = (T_child T_parent_pre^-1) T_parent_opt
    in_solve = np.zeros(m.kf_valid.shape[0], bool)
    in_solve[kfs[alive]] = True
    pos_of = {int(k): i for i, k in enumerate(kfs)}
    new_kfs = np.flatnonzero(m.kf_valid & ~in_solve)
    corrected_R = {int(k): R_opt[pos_of[int(k)]] for k in kfs[alive]}
    corrected_t = {int(k): t_opt[pos_of[int(k)]] for k in kfs[alive]}
    pre_R_of = {int(k): pre_R[pos_of[int(k)]] for k in kfs[alive]}
    pre_t_of = {int(k): pre_t[pos_of[int(k)]] for k in kfs[alive]}
    for k in sorted(new_kfs, key=lambda x: int(m.kf_frame_id[x])):
        p = int(m.kf_parent[k])
        if p < 0 or p not in corrected_R:
            continue
        T_c = np.eye(4)
        T_c[:3, :3] = m.kf_R[k]
        T_c[:3, 3] = m.kf_t[k]
        T_pp = np.eye(4)
        T_pp[:3, :3] = pre_R_of[p]
        T_pp[:3, 3] = pre_t_of[p]
        T_po = np.eye(4)
        T_po[:3, :3] = corrected_R[p]
        T_po[:3, 3] = corrected_t[p]
        T_new = (T_c @ np.linalg.inv(T_pp)) @ T_po
        # late kfs become "corrected" parents for their children
        pre_R_of[int(k)] = m.kf_R[k].copy()
        pre_t_of[int(k)] = m.kf_t[k].copy()
        corrected_R[int(k)] = T_new[:3, :3].astype(np.float32)
        corrected_t[int(k)] = T_new[:3, 3].astype(np.float32)
        m.kf_R[k] = T_new[:3, :3]
        m.kf_t[k] = T_new[:3, 3]
    # points created during the solve: correct via their first kf
    in_solve_pt = np.zeros(m.mp_valid.shape[0], bool)
    in_solve_pt[mps] = True
    new_pts = np.flatnonzero(m.mp_valid & ~in_solve_pt)
    for mp in new_pts:
        r = int(m.mp_first_kf[mp])
        if r not in corrected_R or r not in pre_R_of:
            continue
        p_cam = pre_R_of[r] @ m.mp_pos[mp] + pre_t_of[r]
        Rn, tn = corrected_R[r], corrected_t[r]
        m.mp_pos[mp] = (Rn.T @ (p_cam - tn)).astype(np.float32)
