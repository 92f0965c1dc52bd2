"""MCMC training-object re-export (compat layer).

Counterpart of ``cpp_wrappers/log_likelihood_mcmc.py``: the class lives in
cornell_moe_tpu.models.mcmc; this module provides the reference import
path.
"""

from cornell_moe_tpu.models.mcmc import (  # noqa: F401
    GaussianProcessLogLikelihoodMCMC)
from cornell_moe_tpu.compat.knowledge_gradient_mcmc import (  # noqa: F401
    GaussianProcessMCMC)
