"""Reference-API compatibility layer.

Mirrors the public Python surface of the reference's
``moe.optimal_learning.python`` package (interfaces + cpp_wrappers):
class names, constructor signatures, and method names follow
SURVEY.md sections 2.3/2.4/2.9, so code written against Cornell-MOE ports
with import changes only.  Everything delegates to the functional JAX core
(cornell_moe_tpu.models / .acquisition / .ops).
"""
