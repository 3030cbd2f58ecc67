"""Plotting layer (the reference's ``plot.py`` equivalent)."""
