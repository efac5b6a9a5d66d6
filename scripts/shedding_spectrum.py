"""Vortex-shedding spectrum at the bench's 256^2-class cylinder grid.

North-star check (BASELINE.md: "matched vortex-shedding spectra"): record the
lift/drag coefficient time series at developed flow (bench asset snapshot),
compute the lift PSD, and report the Strouhal peak, its harmonic, cl_rms and
mean cd.  Literature for Re=100: St ~0.295-0.305 (fine grids), cd ~3.22-3.24
(Schaefer-Turek 2D-2), with first-order grids reading St low.

Run (TPU): PYTHONPATH=/root/repo python scripts/shedding_spectrum.py [res]
"""

from __future__ import annotations

import json
import sys
import time
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(REPO))

import jax
import jax.numpy as jnp
import numpy as np

import fluidgym_tpu
from fluidgym_tpu.core.domain_io import load_domain

RES = int(sys.argv[1]) if len(sys.argv) > 1 else 56
STEP_LENGTH = 0.05          # sampling interval in sim time units
N_SAMPLES = 1200            # ~60 time units ~ 18 shedding periods at St 0.3


def main() -> None:
    env = fluidgym_tpu.make(
        "CylinderJet2D-easy-v0", resolution=RES, step_length=STEP_LENGTH,
        load_initial_domain=False, load_domain_statistics=False,
        randomize_initial_state=False, episode_length=10**9)
    env.reset(seed=0)
    asset = REPO / "bench_assets" / f"cyl2d_res{RES}_developed"
    if asset.with_suffix(".json").exists():
        topo, _g, state = load_domain(asset, dtype=env._dtype)
        assert topo == env._topo
        env._state = state
        print(f"loaded developed asset {asset.name}", flush=True)

    fn = jax.jit(env._pure_step)
    carry = env._pure_carry()
    action = jnp.zeros((1,), jnp.float32)
    cl = np.zeros(N_SAMPLES)
    cd = np.zeros(N_SAMPLES)
    t0 = time.time()
    for i in range(N_SAMPLES):
        carry, _obs, _r, info = fn(carry, action)
        cl[i] = float(np.asarray(info["lift"]).reshape(()))
        cd[i] = float(np.asarray(info["drag"]).reshape(()))
        if (i + 1) % 200 == 0:
            print(f"  {i+1}/{N_SAMPLES} ({(i+1)/(time.time()-t0):.1f} steps/s)",
                  flush=True)

    # discard the first quarter (settling after any snapshot mismatch)
    sl = slice(N_SAMPLES // 4, None)
    sig = cl[sl] - cl[sl].mean()
    w = np.hanning(len(sig))
    P = np.abs(np.fft.rfft(sig * w)) ** 2
    f = np.fft.rfftfreq(len(sig), d=STEP_LENGTH)
    i_pk = 1 + int(np.argmax(P[1:]))
    St = float(f[i_pk])
    # harmonic content: drag oscillates at 2*St for symmetric shedding
    sig_d = cd[sl] - cd[sl].mean()
    Pd = np.abs(np.fft.rfft(sig_d * w)) ** 2
    St_d = float(f[1 + int(np.argmax(Pd[1:]))])
    # peak sharpness: energy within +-1 bin of the peak over total
    conc = float(P[max(1, i_pk - 1):i_pk + 2].sum() / P[1:].sum())

    out = {
        "resolution": RES,
        "St_lift_peak": round(St, 4),
        "St_drag_peak": round(St_d, 4),
        "drag_to_lift_freq_ratio": round(St_d / St, 3),
        "peak_energy_fraction": round(conc, 3),
        "cl_rms": round(float(np.sqrt((sig ** 2).mean())), 4),
        "cd_mean": round(float(cd[sl].mean()), 4),
        "n_samples": N_SAMPLES,
        "dt_sample": STEP_LENGTH,
    }
    print(json.dumps(out))


if __name__ == "__main__":
    main()
