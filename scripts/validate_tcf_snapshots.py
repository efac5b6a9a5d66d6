"""Snapshot-based wall-unit validation of a bundled TCF dataset (CPU-only).

Complements scripts/validate_upper_tiers.py (which time-averages a fresh
on-device run): here the ensemble of bundled snapshots stands in for the
time average — spatial x-z averaging over each 64-cube snapshot plus the
bundled wall-stress statistics give realized Re_tau, peak u'+, and U+ at
the centerline without touching the TPU.  Anchors are the same
Moser-Kim-Mansour / Hoyas-Jimenez interpolations used by the on-device
validator; expect the documented coarse-64-cube LES biases (Re_tau 3-8%
low, u'+ peak 10-30% high — docs/environments.md).

Usage:  python scripts/validate_tcf_snapshots.py \
            fluidgym_tpu/data/initial_domains/channel_flow3D_L3.14_Re330_Res64_Ref1
"""

from __future__ import annotations

import json
import sys
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(REPO))

import numpy as np

from fluidgym_tpu.core.domain_io import load_domain

sys.path.insert(0, str(REPO / "scripts"))
from _tcf_anchors import DNS_ANCHORS  # noqa: E402


def validate(base: Path) -> dict:
    stats = json.load(open(base / "domain_statistics.json"))
    U_sum = UU_sum = None
    n = 0
    nu = yc = None
    for f in sorted(base.glob("*.json")):
        if f.name == "domain_statistics.json":
            continue
        _topo, geoms, state = load_domain(base / f.stem)
        u = np.asarray(state.blocks[0].velocity)       # (3, nx, ny, nz)
        if U_sum is None:
            nu = float(np.asarray(state.viscosity))
            yc = np.asarray(geoms[0].centers[1]).mean(axis=(0, 2))
            U_sum = np.zeros_like(u.mean(axis=(1, 3)))
            UU_sum = np.zeros_like(U_sum)
        U_sum += u.mean(axis=(1, 3))                   # x-z avg -> (3, ny)
        UU_sum += (u ** 2).mean(axis=(1, 3))
        n += 1
    if n == 0:
        raise FileNotFoundError(
            f"no snapshot .json files under {base} (only "
            f"domain_statistics.json?) — wrong or pruned dataset dir")
    U, UU = U_sum / n, UU_sum / n
    uprime = np.sqrt(np.maximum(UU - U ** 2, 0.0))

    ws = stats["wall_stress"]
    tau_w = float(np.mean(ws["mean"] if isinstance(ws, dict) else ws))
    u_tau = float(np.sqrt(abs(tau_w)))
    out = {
        "dataset": base.name,
        "snapshots": n,
        "Re_tau_realized": round(u_tau / nu, 1),       # half-height h = 1
        "u'+_max": round(float(uprime[0].max()) / u_tau, 3),
        "U+_centerline": round(float(U[0][len(yc) // 2]) / u_tau, 2),
    }
    for nominal, anchors in DNS_ANCHORS.items():
        if f"Re{nominal}" in base.name:
            out["Re_tau_nominal"] = nominal
            out["dns_gap_pct"] = {
                "Re_tau": round(100.0 * (out["Re_tau_realized"] - nominal)
                                / nominal, 1),
                **{k: round(100.0 * (out[k] - v) / v, 1)
                   for k, v in anchors.items()},
            }
    return out


if __name__ == "__main__":
    for arg in sys.argv[1:]:
        print(json.dumps(validate(Path(arg))))
