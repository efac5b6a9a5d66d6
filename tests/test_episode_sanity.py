"""Episode-trace screening and robust statistics pooling.

Round-2 advisor finding: bundled Airfoil2D-medium episodes contained
non-converged and outlier steps that skewed the pooled domain statistics
(the reward zero-point).  These tests pin the screening added in response:
``FluidEnv.episode_sanity_violations`` (with the airfoil physics bounds)
and ``FluidEnv._pool_statistics_rows``.
"""

import numpy as np
import pytest

import fluidgym_tpu
from fluidgym_tpu.envs.fluid_env import FluidEnv


def _rows(n=100, drag=0.33, lift=0.9, converged=1.0, seed=0):
    rng = np.random.default_rng(seed)
    return [
        {
            "drag": drag + 0.01 * rng.standard_normal(),
            "lift": lift + 0.05 * rng.standard_normal(),
            "reward": -0.1 + 0.02 * rng.standard_normal(),
            "pressure_converged": converged,
        }
        for _ in range(n)
    ]


@pytest.fixture(scope="module")
def rbc():
    return fluidgym_tpu.make(
        "RBC2D-easy-v0", n_heaters=4, resolution=4,
        load_initial_domain=False, load_domain_statistics=False,
        randomize_initial_state=False)


@pytest.fixture(scope="module")
def airfoil():
    # construction only -- no reset/step; the screen is pure numpy
    return fluidgym_tpu.make(
        "Airfoil2D-easy-v0", load_initial_domain=False,
        load_domain_statistics=False, randomize_initial_state=False)


def test_clean_trace_passes(rbc):
    assert rbc.episode_sanity_violations(_rows()) == []


def test_empty_trace_flagged(rbc):
    assert rbc.episode_sanity_violations([]) == ["episode trace is empty"]


def test_nonconverged_steps_flagged(rbc):
    rows = _rows()
    for r in rows[:20]:  # 20% failures, over the 5% budget
        r["pressure_converged"] = 0.0
    out = rbc.episode_sanity_violations(rows)
    assert any("pressure solver failed" in v for v in out)


def test_outlier_steps_flagged(rbc):
    rows = _rows()
    for r in rows[:15]:  # 15% wild rows, over the 10% budget
        r["lift"] = 60.0
        r["drag"] = -10.0
    out = rbc.episode_sanity_violations(rows)
    assert any("outlier" in v for v in out)


def test_airfoil_thrust_flagged(airfoil):
    """Sustained negative drag on a stationary airfoil = not developed
    (the exact contamination found in the round-2 Re3000 test snapshots)."""
    rows = _rows()
    for r in rows[:48]:
        r["drag"] = -10.1
    out = airfoil.episode_sanity_violations(rows)
    assert any("net thrust" in v for v in out)


def test_airfoil_lift_excursions_flagged(airfoil):
    rows = _rows()
    for r in rows[:30]:
        r["lift"] = 64.8
    out = airfoil.episode_sanity_violations(rows)
    assert any("lift" in v for v in out)


def test_airfoil_clean_trace_passes(airfoil):
    assert airfoil.episode_sanity_violations(_rows()) == []


def test_pooling_drops_nonconverged_and_outliers(rbc):
    rows = _rows(n=200)
    for r in rows[:10]:
        r["pressure_converged"] = 0.0
        r["drag"] = 50.0      # failed solves carry junk forces
    for r in rows[10:16]:
        r["lift"] = -46.8     # converged but wildly transient
    pooled = rbc._pool_statistics_rows(rows)
    assert len(pooled["drag"]) == 200 - 16
    # the pooled mean reflects the stationary flow, not the junk
    assert abs(float(pooled["drag"].mean()) - 0.33) < 0.02
    assert abs(float(pooled["lift"].mean()) - 0.9) < 0.05


def test_pooling_keeps_clean_rows_intact(rbc):
    rows = _rows(n=150)
    pooled = rbc._pool_statistics_rows(rows)
    assert len(pooled["reward"]) == 150


def test_pooling_survives_all_bad(rbc):
    """Pathological all-failed pool must not produce empty statistics."""
    rows = _rows(n=50, converged=0.0)
    pooled = rbc._pool_statistics_rows(rows)
    assert len(pooled["drag"]) == 50


def test_pooling_ignores_solver_diagnostic_columns(rbc):
    """Quantized iteration counts have near-zero MAD, so screening them
    turns the 8-sigma clip into a few-iteration band that rejects healthy
    rows (measured: up to 60% of RBC rows dropped).  Diagnostics carry no
    physics and must be excluded from the outlier screen."""
    rows = _rows(n=200)
    for i, r in enumerate(rows):
        # restart-chunk-quantized iterations: most at 500, a tail at 840
        r["pressure_iterations"] = 840.0 if i % 10 == 0 else 500.0
        r["pressure_residual"] = 9e-6 if i % 7 == 0 else 2e-8
    assert rbc.episode_sanity_violations(rows) == []
    pooled = rbc._pool_statistics_rows(rows)
    assert len(pooled["drag"]) == 200


def test_pooling_keeps_multimodal_physics(rbc, caplog):
    """A mass-flagging outlier mask is distribution structure (e.g. nusselt
    levels differing across snapshots), not contamination — pooling must
    keep every converged row rather than crush the spread the reward
    normalization depends on (measured on the bundled RBC NH24 configs).

    The split is deliberately IMBALANCED (140/60): with a 50/50 split the
    median lands between the modes and the MAD spans both, so nothing
    flags and the mass-flag branch is never exercised (round-3 advisor
    finding).  Here the median/MAD collapse into the dominant mode, the
    minority mode mass-flags (30% > the 10% budget), and pooling must
    take the keep-all-converged path."""
    import logging

    rng = np.random.default_rng(3)
    rows = []
    for level, count in ((5.0, 140), (9.0, 60)):
        for _ in range(count):
            rows.append({
                "nusselt": level + 0.05 * rng.standard_normal(),
                "reward": -0.1 + 0.02 * rng.standard_normal(),
                "pressure_converged": 1.0,
            })
    # precondition: the raw screen really does mass-flag the minority mode
    conv, inlier = rbc._episode_row_masks(rows)
    assert float((conv & ~inlier).mean()) > 0.10, \
        "test setup must trigger the mass-flag guard"
    with caplog.at_level(logging.WARNING):
        pooled = rbc._pool_statistics_rows(rows)
    assert len(pooled["nusselt"]) == 200
    span = pooled["nusselt"].max() - pooled["nusselt"].min()
    assert span > 3.5, "both modes must survive pooling"
    assert "multi-modal" in caplog.text, \
        "the keep-all-converged branch must have fired"


def test_record_episode_ships_best_attempt(rbc, monkeypatch, tmp_path):
    """When every repair attempt still violates the sanity screen, the
    attempt with the FEWEST bad rows ships — never simply the last one
    (round-3 review finding)."""
    import fluidgym_tpu.envs.fluid_env as fe
    from fluidgym_tpu.types import EnvMode

    n = 20

    def ep(bad_count, seed):
        rows = _rows(n, seed=seed)
        for r in rows[:bad_count]:
            r["pressure_converged"] = 0.0
        return rows

    # attempt 0: 30% non-converged; attempt 1: 8% (best); attempt 2: 40%
    script = ep(6, 1) + [_rows(1)[0]] + ep(2, 2) + [_rows(1)[0]] + ep(8, 3)
    feed = iter(script)

    monkeypatch.setattr(rbc, "load_initial_domain",
                        lambda *a, **k: None, raising=False)
    monkeypatch.setattr(rbc, "seed", lambda *a, **k: None)
    monkeypatch.setattr(rbc, "_save_initial_domain", lambda *a, **k: None)
    monkeypatch.setattr(rbc, "_initial_domain_steps", 2, raising=False)
    monkeypatch.setattr(
        rbc, "step", lambda a: (None, None, None, None, next(feed)))

    saved = {}
    monkeypatch.setattr(
        fe.data_utils, "save_uncontrolled_episode",
        lambda domain_id, mode, idx, rows: saved.update(rows=rows))

    out = rbc._record_uncontrolled_episode(
        EnvMode.TRAIN, 0, episode_steps=n, verbose=False)

    bad = sum(1 for r in saved["rows"]
              if float(r["pressure_converged"]) < 0.5)
    assert bad == 2, "the 8%-bad attempt (fewest bad rows) must ship"
    assert out is saved["rows"]


def test_short_traces_skip_outlier_screen():
    conv, inlier = FluidEnv._episode_row_masks(_rows(n=5))
    assert inlier.all()
