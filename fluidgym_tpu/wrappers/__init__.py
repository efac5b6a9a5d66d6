"""Environment wrappers (reference src/fluidgym/wrappers/)."""

from fluidgym_tpu.wrappers.action_noise import ActionNoise
from fluidgym_tpu.wrappers.flatten_obs import FlattenObservation
from fluidgym_tpu.wrappers.fluid_wrapper import FluidWrapper
from fluidgym_tpu.wrappers.obs_extraction import ObsExtraction
from fluidgym_tpu.wrappers.sensor_noise import SensorNoise

__all__ = [
    "ActionNoise",
    "FlattenObservation",
    "FluidWrapper",
    "ObsExtraction",
    "SensorNoise",
]
