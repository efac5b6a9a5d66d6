"""Initial-domain dataset management and per-domain statistics.

Mirrors the reference data distribution layer
(``/root/reference/src/fluidgym/util/data_utils.py:23-136``): precomputed
initial domains live under ``<data_path>/initial_domains/<domain_id>/`` with
per-domain ``domain_statistics.json`` and ``{mode}_uncontrolled_episode.csv``;
missing datasets are fetched from a HuggingFace dataset repo when network and
``huggingface_hub`` are available (they are not in air-gapped deployments, in
which case domains are generated locally via ``env.init()``).
"""

from __future__ import annotations

import csv
import json
import logging
from pathlib import Path

from fluidgym_tpu.config import config

_LOG = logging.getLogger("fluidgym_tpu.data")

__all__ = [
    "initial_domain_dir",
    "prepare_initial_domains",
    "save_statistics",
    "load_statistics",
    "save_uncontrolled_episode",
    "load_uncontrolled_episode",
]


#: datasets bundled with the package (checked after the user data path)
BUNDLED_DATA = Path(__file__).resolve().parent.parent / "data"


def initial_domain_dir(initial_domain_id: str, write: bool = False,
                       user_only: bool = False) -> Path:
    """Directory of an initial-domain dataset.

    Reads fall back to datasets bundled under ``fluidgym_tpu/data/`` when the
    user data path has no copy; writes (``env.init()``) always target the
    user data path.  ``user_only=True`` disables the bundled fallback --
    ``env.init()`` uses it so generation never mixes bundled reads with
    user-path writes (the resolution would flip mid-run after the first
    file is written)."""
    user = config.data_path / "initial_domains" / initial_domain_id
    if write or user_only or (user.exists() and any(user.iterdir())):
        return user
    bundled = BUNDLED_DATA / "initial_domains" / initial_domain_id
    if bundled.exists() and any(bundled.iterdir()):
        return bundled
    return user


def prepare_initial_domains(initial_domain_id: str) -> Path:
    """Ensure the initial-domain directory exists, downloading it from the
    configured HF dataset repo if possible (reference data_utils.py:23-63)."""
    target = initial_domain_dir(initial_domain_id)
    if target.exists() and any(target.iterdir()):
        return target
    try:
        from huggingface_hub import snapshot_download  # type: ignore

        snapshot_download(
            repo_id=config.hf_repo_id,
            repo_type="dataset",
            allow_patterns=[f"initial_domains/{initial_domain_id}/**"],
            local_dir=config.data_path,
        )
    except Exception as err:  # offline / hub unavailable
        _LOG.warning(
            "Could not download initial domains for %s (%s). Generate them "
            "locally with env.init() or construct the env with "
            "load_initial_domain=False.",
            initial_domain_id,
            err,
        )
    return target


def save_statistics(initial_domain_id: str, statistics: dict) -> None:
    """Write per-domain metric statistics (reference data_utils.py:66-99)."""
    target = initial_domain_dir(initial_domain_id, write=True)
    target.mkdir(parents=True, exist_ok=True)
    with open(target / "domain_statistics.json", "w") as fh:
        json.dump(statistics, fh, indent=1)


def load_statistics(initial_domain_id: str) -> dict:
    path = initial_domain_dir(initial_domain_id) / "domain_statistics.json"
    if not path.exists():
        raise FileNotFoundError(f"no domain statistics at {path}")
    with open(path) as fh:
        return json.load(fh)


def save_uncontrolled_episode(
    initial_domain_id: str, mode: str, idx: int, rows: list[dict]
) -> None:
    """CSV of per-step metrics of an uncontrolled episode
    (reference data_utils.py:101-136)."""
    target = initial_domain_dir(initial_domain_id, write=True)
    target.mkdir(parents=True, exist_ok=True)
    path = target / f"{mode}_{idx:02d}_uncontrolled_episode.csv"
    if not rows:
        return
    with open(path, "w", newline="") as fh:
        writer = csv.DictWriter(fh, fieldnames=list(rows[0].keys()))
        writer.writeheader()
        writer.writerows(rows)


def load_uncontrolled_episode(initial_domain_id: str, mode: str, idx: int) -> list[dict]:
    path = initial_domain_dir(initial_domain_id) / f"{mode}_{idx:02d}_uncontrolled_episode.csv"
    if not path.exists():
        raise FileNotFoundError(f"no uncontrolled episode at {path}")
    with open(path, newline="") as fh:
        return [dict(r) for r in csv.DictReader(fh)]
