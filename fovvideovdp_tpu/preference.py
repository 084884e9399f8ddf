"""JOD differences -> preference probabilities.

Port of the MATLAB-only helper (matlab/fvvdp_preference.m:17-21): under the
JOD definition, a 1-JOD quality difference corresponds to 75%/25% preference
in a pairwise comparison experiment.
"""
from __future__ import annotations

import jax.scipy.stats as jstats
import jax.numpy as jnp

# Standard deviation of the JOD preference mapping: probit slope chosen so
# that delta JOD = 1 -> 75% preference.
_SIGMA_JOD = 1.4826


def fvvdp_preference(jod_diff):
    """Probability (in %) that content A is preferred over B given
    ``jod_diff = JOD_A - JOD_B``."""
    return jstats.norm.cdf(jnp.asarray(jod_diff), 0.0, _SIGMA_JOD) * 100.0
