"""Process-level runtime knobs shared by the CLIs."""

from __future__ import annotations

import os


def apply_platform_override() -> None:
    """Honor ``FEDFR_PLATFORM`` (e.g. ``cpu``) before any jax use.

    Call this first in every CLI main.  Needed because some environments
    (the tunneled dev rig) force ``JAX_PLATFORMS`` back to their
    accelerator for every interpreter, so a subprocess cannot opt out via
    the standard env var — and an unwanted TPU attach from a "CPU" helper
    process contends the device with the real workload.
    """
    plat = os.environ.get("FEDFR_PLATFORM")
    if plat:
        import jax

        jax.config.update("jax_platforms", plat)
