"""cornell_moe_tpu — a TPU-native Bayesian-optimization engine.

A from-scratch JAX/XLA/Pallas rebuild of the capabilities of
wujian16/Cornell-MOE: Gaussian-process surrogates (with derivative
observations), MC acquisition functions (q-EI, q-KG, d-KG,
continuous-fidelity KG, PES), MCMC hyperparameter inference, and multistart
stochastic-gradient acquisition optimization — all as jitted, differentiable,
shardable programs.
"""

__version__ = "0.1.0"
