"""Utilities: device-transfer helpers, timers, structured solver records."""

from optimal_control_paradiag_tpu.utils.constants import to_device

__all__ = ["to_device"]
