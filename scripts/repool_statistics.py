"""Re-pool bundled domain statistics with the round-3 screening rules.

Datasets bundled before the screened pooling landed (round 2) had their
``domain_statistics.json`` pooled from RAW episode rows — including steps
where the pressure solve failed and robust-sigma outliers — which skews the
reward zero-point exactly as the round-2 advisor flagged for
Airfoil2D-medium (ADVICE.md, medium).  This maintenance pass re-pools every
bundled config through ``FluidEnv._pool_statistics_rows``'s screening masks
and rewrites the bundled JSON in place only when a statistic moves by more
than a relative tolerance.

Usage: python scripts/repool_statistics.py [--apply] [--skip DIR ...]
"""

from __future__ import annotations

import argparse
import csv
import json
from pathlib import Path

import numpy as np

from fluidgym_tpu.envs.fluid_env import FluidEnv, Stats
from fluidgym_tpu.utils.data_utils import BUNDLED_DATA


def pool_dir(dirpath: Path) -> dict[str, dict] | None:
    """Screened statistics for one bundled dataset directory (all modes'
    episode rows pooled together, mirroring ``FluidEnv.init`` stage 3)."""
    all_rows: list[dict] = []
    for f in sorted(dirpath.glob("*_uncontrolled_episode.csv")):
        with open(f, newline="") as fh:
            all_rows.extend(dict(r) for r in csv.DictReader(fh))
    if not all_rows:
        return None
    converged, inlier = FluidEnv._episode_row_masks(all_rows)
    # mirror _pool_statistics_rows: a mass-flagging outlier mask is reading
    # multi-modal physics, not contamination — trust it only when sparse
    if float((converged & ~inlier).mean()) > FluidEnv._EPISODE_MAX_BAD_FRACTION:
        inlier = np.ones(len(all_rows), bool)
    keep = converged & inlier
    if not keep.any():
        keep = np.ones(len(all_rows), bool)
    kept = [r for r, k in zip(all_rows, keep) if k]
    keys = [k for k in kept[0] if all(k in r for r in kept)]
    values = {k: np.asarray([float(r[k]) for r in kept]) for k in keys}
    stats = {k: Stats.from_values(v)._asdict() for k, v in values.items()}
    return {
        "stats": stats,
        "dropped": int((~keep).sum()),
        "total": len(all_rows),
        "non_converged": int((~converged).sum()),
        "outliers": int((converged & ~inlier).sum()),
    }


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--apply", action="store_true",
                    help="rewrite changed domain_statistics.json in place")
    ap.add_argument("--skip", nargs="*", default=[],
                    help="dataset dir names to leave untouched")
    ap.add_argument("--rtol", type=float, default=0.01,
                    help="relative change in mean/std that counts as drift")
    args = ap.parse_args()

    root = BUNDLED_DATA / "initial_domains"
    for dirpath in sorted(root.iterdir()):
        if not dirpath.is_dir() or dirpath.name in args.skip:
            continue
        pooled = pool_dir(dirpath)
        stats_path = dirpath / "domain_statistics.json"
        if pooled is None or not stats_path.exists():
            print(f"{dirpath.name}: no episodes/statistics, skipped")
            continue
        old = json.load(open(stats_path))
        drift = []
        for k, new in pooled["stats"].items():
            if k not in old:
                continue
            for field in ("mean", "p5", "p95"):
                o, n = float(old[k][field]), float(new[field])
                denom = max(abs(o), abs(n), 1e-9)
                if abs(o - n) / denom > args.rtol:
                    drift.append(f"{k}.{field} {o:.4g}->{n:.4g}")
        tag = (f"dropped {pooled['dropped']}/{pooled['total']} rows "
               f"({pooled['non_converged']} non-conv, "
               f"{pooled['outliers']} outliers)")
        if not drift:
            print(f"{dirpath.name}: clean ({tag})")
            continue
        print(f"{dirpath.name}: DRIFT ({tag}): " + "; ".join(drift[:6])
              + (" ..." if len(drift) > 6 else ""))
        if args.apply:
            with open(stats_path, "w") as fh:
                json.dump(pooled["stats"], fh, indent=1)
            print(f"  -> rewrote {stats_path}")


if __name__ == "__main__":
    main()
