"""Device management — the JAX counterpart of the reference's DeviceManager.

The reference's ``utils/device_manager.py`` abstracts CPU/CUDA/XLA device
selection for torch (`to_device`, `to_numpy`, `synchronize`, memory info,
global singleton). JAX makes most of that implicit, but the surface is kept
so reference users find the same affordances:

- ``DeviceManager(device=...)`` with "auto"/"tpu"/"cpu" selection
- ``to_device`` / ``to_numpy`` / ``synchronize``
- ``get_memory_info`` (HBM stats where the backend exposes them)
- ``get_device_manager()`` global singleton (ref :286-310)
"""

from __future__ import annotations

import logging
from typing import Any

import jax
import numpy as np

logger = logging.getLogger(__name__)

_GLOBAL: "DeviceManager | None" = None


class DeviceManager:
    def __init__(self, device: str = "auto"):
        self.requested = device
        self.device = self._select(device)
        self.platform = self.device.platform
        logger.info("DeviceManager: using %s (%s)", self.device, self.platform)

    @staticmethod
    def _select(device: str):
        if device in ("auto", None):
            return jax.devices()[0]
        for d in jax.devices():
            if d.platform == device or str(d) == device:
                return d
        try:
            return jax.devices(device)[0]
        except RuntimeError as exc:
            raise ValueError(
                f"no device matching {device!r}; have "
                f"{[d.platform for d in jax.devices()]}"
            ) from exc

    @property
    def is_tpu(self) -> bool:
        return self.platform == "tpu"

    def to_device(self, x: Any):
        """Host array/pytree → device array(s) on the managed device."""
        return jax.device_put(x, self.device)

    def to_numpy(self, x: Any):
        """Device pytree → host numpy (blocks until computed, like the
        reference's mark_step + .cpu() path)."""
        return jax.tree.map(lambda a: np.asarray(jax.device_get(a)), x)

    def synchronize(self) -> None:
        """Barrier on outstanding work (ref synchronize :246-258)."""
        jax.block_until_ready(
            jax.device_put(jax.numpy.zeros(()), self.device)
        )

    def get_memory_info(self) -> dict[str, float]:
        stats = {}
        try:
            raw = self.device.memory_stats() or {}
            stats = {
                "bytes_in_use": float(raw.get("bytes_in_use", 0)),
                "bytes_limit": float(raw.get("bytes_limit", 0)),
                "peak_bytes_in_use": float(raw.get("peak_bytes_in_use", 0)),
            }
        except Exception:
            pass
        try:
            import psutil

            vm = psutil.virtual_memory()
            stats["host_ram_used_frac"] = vm.percent / 100.0
        except Exception:
            pass
        return stats

    def device_count(self, platform: str | None = None) -> int:
        return len(jax.devices(platform) if platform else jax.devices())


def get_device_manager(device: str = "auto") -> DeviceManager:
    """Global singleton accessor (ref :286-310)."""
    global _GLOBAL
    if _GLOBAL is None or (
        device != "auto" and _GLOBAL.requested != device
    ):
        _GLOBAL = DeviceManager(device)
    return _GLOBAL
