"""Core jittable math ops (the reference's Numba-kernel layer, rebuilt for TPU).

Every `@njit` kernel in the reference (`demethify/deconvolution.py`) has a
jitted XLA/Pallas equivalent here, plus the Gram-form refactorings that make
the inner loops bandwidth-optimal on TPU.
"""

from demethify_tpu.ops.simplex import project_columns_to_simplex  # noqa: F401
from demethify_tpu.ops.cost import weighted_cost, weighted_cost_gram  # noqa: F401
from demethify_tpu.ops.gram import (  # noqa: F401
    sample_grams,
    site_curvature,
    u_constant_term,
)
from demethify_tpu.ops.nnls import nnls, wls_intercept  # noqa: F401
