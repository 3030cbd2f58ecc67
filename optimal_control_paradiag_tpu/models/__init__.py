"""Problem definitions (the reference's L2 layer,
``Optimal_Control_Wave_Equation``, ``Control_Wave_PC.py:13-333``)."""

from optimal_control_paradiag_tpu.models.wave import WaveControlProblem

__all__ = ["WaveControlProblem"]
