"""Sync repaired uncontrolled-episode CSVs from the user data dir into the
repo bundle and re-pool statistics — the recovery path for a chain step
that was cap-killed mid-repair (the per-attempt best-so-far persistence
writes to the user dir; bundling normally happens at the stage-2
checkpoint, which a timeout can skip).

Only copies CSVs that IMPROVE on the bundled copy under the episode
sanity screen (fewer violations, then fewer bad rows), then re-pools
domain_statistics.json from the final bundled set.

Run: PYTHONPATH=/root/repo python -u scripts/sync_user_repairs.py \
        Airfoil2D-medium-v0 [--apply]
"""
from __future__ import annotations

import argparse
import shutil
import sys
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(REPO))


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("env_id")
    ap.add_argument("--apply", action="store_true")
    args = ap.parse_args()

    import fluidgym_tpu
    from fluidgym_tpu.config import config
    from fluidgym_tpu.utils import data_utils

    env = fluidgym_tpu.make(args.env_id, load_initial_domain=False,
                            load_domain_statistics=False)
    did = env.initial_domain_id
    user = config.data_path / "initial_domains" / did
    bundle = data_utils.BUNDLED_DATA / "initial_domains" / did
    if not user.exists():
        print(f"no user dir {user}; nothing to sync")
        return 0

    def score(path: Path):
        import csv

        rows = [{k: float(v) for k, v in r.items()}
                for r in csv.DictReader(open(path))]
        if not rows:
            return (99, 1.0)
        violations = env.episode_sanity_violations(rows)
        conv, inlier = env._episode_row_masks(rows)
        return (len(violations), 1.0 - float((conv & inlier).mean()))

    synced = []
    for f in sorted(user.glob("*_uncontrolled_episode.csv")):
        dst = bundle / f.name
        s_user = score(f)
        s_bund = score(dst) if dst.exists() else (999, 1.0)
        verdict = "IMPROVES" if s_user < s_bund else "keeps bundle"
        print(f"{f.name}: user {s_user} vs bundle {s_bund} -> {verdict}")
        if s_user < s_bund and args.apply:
            shutil.copy2(f, dst)
            synced.append(f.name)
    # also sync extended-burn-in snapshots (same stems as episode CSVs)
    if args.apply:
        for name in synced:
            stem = name.replace("_uncontrolled_episode.csv", "")
            src_snap = user / stem
            dst_snap = bundle / stem
            if src_snap.is_dir():
                if dst_snap.exists():
                    shutil.rmtree(dst_snap)
                shutil.copytree(src_snap, dst_snap)
                print(f"synced snapshot dir {stem}")
    if args.apply and synced:
        import csv

        all_rows = []
        for f in sorted(bundle.glob("*_uncontrolled_episode.csv")):
            all_rows.extend({k: float(v) for k, v in r.items()}
                            for r in csv.DictReader(open(f)))
        stats = env._pool_statistics_rows(all_rows)
        env._save_domain_statistics(stats)
        src = (config.data_path / "initial_domains" / did
               / "domain_statistics.json")
        if src.exists():
            shutil.copy2(src, bundle / "domain_statistics.json")
            print("re-pooled + bundled domain_statistics.json")
    print(f"synced {len(synced)} episodes" if args.apply else "(dry run)")
    return 0


if __name__ == "__main__":
    sys.exit(main())
