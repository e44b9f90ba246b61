"""Wavefront renderer: ray generation, bounce-scan integrator, host pipeline."""
