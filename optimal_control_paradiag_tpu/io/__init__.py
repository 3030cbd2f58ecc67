"""Solution output: npz archives and legacy-VTK series (the reference's
``VTKFile`` + ``np.savetxt`` layer, ``Control_Wave_PC.py:247-333``)."""

from optimal_control_paradiag_tpu.io.writers import write_solution

__all__ = ["write_solution"]
