"""2D airfoil aerodynamic-efficiency environment.

Mirrors ``/root/reference/src/fluidgym/envs/airfoil/airfoil_env_2d.py``:
three independently-scaled synthetic jets on the upper surface, zero-mean
max-normalized action (:169-191), reward ``cl/cd - cl_cd_ref``.
"""

from __future__ import annotations

import numpy as np
from gymnasium import spaces

from fluidgym_tpu.envs.airfoil.airfoil_env_base import AirfoilEnvBase

# reference airfoil_env_2d.py:10-24
AIRFOIL_2D_DEFAULT_CONFIG = {
    "reynolds_number": 3e3,
    "dt": 0.05,
    "step_length": 0.25,
    "adaptive_cfl": 0.8,
    "episode_length": 300,
    "attack_angle_deg": 10.0,
    "use_marl": False,
    "load_initial_domain": True,
    "load_domain_statistics": True,
    "randomize_initial_state": True,
    "enable_actions": True,
    "differentiable": False,
}


class AirfoilEnv2D(AirfoilEnvBase):
    """2D NACA 0012 with three upper-surface synthetic jets."""

    def __init__(self, **kwargs):
        super().__init__(ndims=2, **kwargs)

    def _get_action_space(self) -> spaces.Box:
        return spaces.Box(low=-1.0, high=1.0, shape=(self._n_jets,),
                          dtype=np.float32)

    def _get_observation_space(self) -> spaces.Dict:
        n = self._sensor_locations.shape[-1]
        return spaces.Dict({
            "velocity": spaces.Box(-np.inf, np.inf, (n, self._ndims), np.float32),
            "pressure": spaces.Box(-np.inf, np.inf, (n,), np.float32),
        })
