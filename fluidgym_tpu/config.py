"""Global configuration singleton.

TPU-native re-expression of the reference config
(``/root/reference/src/fluidgym/config.py:13-157``): a process-global
``Config`` object holding the default dtype, the local data path used for
initial-domain datasets, and the (optional) HuggingFace repo id used for
dataset distribution.  The torch dtype switch becomes a jnp dtype switch.
"""

from __future__ import annotations

import os
from pathlib import Path

import jax.numpy as jnp

_VALID_DTYPES = ("float32", "float64")


class Config:
    """Process-global configuration (dtype, data paths, dataset repo)."""

    def __init__(self) -> None:
        self._dtype = jnp.float32
        self._hf_repo_id = "fluidgym/fluidgym-initial-domains"
        self._data_path: Path | None = None
        # Default color palette used by plotting utilities (kept for parity
        # with reference config.py's `palette` property).
        self.palette = [
            "#4C72B0",
            "#DD8452",
            "#55A868",
            "#C44E52",
            "#8172B3",
            "#937860",
        ]

    # -- dtype -------------------------------------------------------------
    @property
    def dtype(self):
        """Default floating dtype for simulation arrays."""
        return self._dtype

    @dtype.setter
    def dtype(self, value) -> None:
        name = str(jnp.dtype(value))
        if name not in _VALID_DTYPES:
            raise ValueError(f"dtype must be one of {_VALID_DTYPES}, got {name}")
        self._dtype = jnp.float32 if name == "float32" else jnp.float64

    def use_fp64(self) -> None:
        """Switch default dtype to float64 (also enables x64 in JAX)."""
        import jax

        jax.config.update("jax_enable_x64", True)
        self._dtype = jnp.float64

    def use_fp32(self) -> None:
        """Switch default dtype to float32."""
        self._dtype = jnp.float32

    # -- data path ---------------------------------------------------------
    @property
    def data_path(self) -> Path:
        """Local directory holding initial-domain datasets and statistics."""
        if self._data_path is not None:
            return self._data_path
        env = os.environ.get("FLUIDGYM_TPU_DATA")
        if env:
            return Path(env)
        return Path.home() / ".cache" / "fluidgym_tpu"

    @data_path.setter
    def data_path(self, value) -> None:
        self._data_path = Path(value)

    # -- dataset repo ------------------------------------------------------
    @property
    def hf_repo_id(self) -> str:
        """HuggingFace dataset repo for precomputed initial domains."""
        return self._hf_repo_id

    @hf_repo_id.setter
    def hf_repo_id(self, value: str) -> None:
        self._hf_repo_id = str(value)


config = Config()
