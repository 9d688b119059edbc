"""Measured-but-not-adopted kernel experiments.

Code here is correct (tested) but lost its on-chip bake-off to the
production implementation; kept for the measurement record and as a
starting point for future formulations. Nothing imports this package from
the training path.
"""
