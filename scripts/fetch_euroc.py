#!/usr/bin/env python
"""Fetch EuRoC MAV sequences into the layout run.py consumes.

The reference validates itself on EuRoC (reference:
Examples/Monocular-Inertial/mono_inertial_euroc.cc LoadImages/LoadIMU;
evaluation/evaluate_ate_scale.py + GT at
evaluation/Ground_truth/EuRoC_left_cam/). This environment has no network
egress, so the CI gates run on rendered synthetic sequences instead
(tests/test_e2e_cli.py); on any network-enabled host this script downloads
the real dataset and README.md §"EuRoC runbook" gives the exact commands +
expected ATE envelopes.

Usage:
  python scripts/fetch_euroc.py --out /data/euroc [--seqs MH01 MH02 V101]

Each sequence unpacks to <out>/<SEQ>/mav0/{cam0,cam1,imu0,...} — pass
`--path <out>/MH01 --dataset euroc` to run.py.
"""
from __future__ import annotations

import argparse
import os
import sys
import urllib.error
import urllib.request
import zipfile

BASE = "http://robotics.ethz.ch/~asl-datasets/ijrr_euroc_mav_dataset"
SEQS = {
    "MH01": "machine_hall/MH_01_easy/MH_01_easy.zip",
    "MH02": "machine_hall/MH_02_easy/MH_02_easy.zip",
    "MH03": "machine_hall/MH_03_medium/MH_03_medium.zip",
    "MH04": "machine_hall/MH_04_difficult/MH_04_difficult.zip",
    "MH05": "machine_hall/MH_05_difficult/MH_05_difficult.zip",
    "V101": "vicon_room1/V1_01_easy/V1_01_easy.zip",
    "V102": "vicon_room1/V1_02_medium/V1_02_medium.zip",
    "V103": "vicon_room1/V1_03_difficult/V1_03_difficult.zip",
    "V201": "vicon_room2/V2_01_easy/V2_01_easy.zip",
    "V202": "vicon_room2/V2_02_medium/V2_02_medium.zip",
    "V203": "vicon_room2/V2_03_difficult/V2_03_difficult.zip",
}


def fetch(seq: str, out_dir: str) -> bool:
    url = f"{BASE}/{SEQS[seq]}"
    dest = os.path.join(out_dir, seq)
    if os.path.isdir(os.path.join(dest, "mav0")):
        print(f"[fetch_euroc] {seq}: already present, skipping")
        return True
    os.makedirs(dest, exist_ok=True)
    zpath = os.path.join(dest, os.path.basename(url))
    print(f"[fetch_euroc] {seq}: downloading {url}")
    try:
        with urllib.request.urlopen(url, timeout=60) as r, open(
            zpath, "wb"
        ) as f:
            while True:
                buf = r.read(1 << 20)
                if not buf:
                    break
                f.write(buf)
                f.flush()
                print(
                    f"\r[fetch_euroc] {seq}: {f.tell() / 1e6:.0f} MB",
                    end="", file=sys.stderr,
                )
    except (urllib.error.URLError, OSError) as e:
        print(
            f"\n[fetch_euroc] {seq}: download failed ({e}). This host has "
            "no route to the EuRoC server (common in sandboxed CI); run "
            "this script on a network-enabled machine and copy the result.",
            file=sys.stderr,
        )
        return False
    print(f"\n[fetch_euroc] {seq}: unpacking")
    with zipfile.ZipFile(zpath) as z:
        z.extractall(dest)
    os.remove(zpath)
    return True


def main(argv=None):
    p = argparse.ArgumentParser(description=__doc__.splitlines()[0])
    p.add_argument("--out", required=True, help="dataset root directory")
    p.add_argument(
        "--seqs", nargs="+", default=["MH01", "MH02", "MH03", "MH04", "MH05"],
        choices=sorted(SEQS), help="sequences to fetch",
    )
    args = p.parse_args(argv)
    ok = all(fetch(s, args.out) for s in args.seqs)
    return 0 if ok else 1


if __name__ == "__main__":
    sys.exit(main())
