"""Exception hierarchy.

Counterpart of ``gpp_exception.{hpp,cpp}`` and the Python-side translation
table in the reference (``gpp_python.cpp:432-445``): the C++ core throws
typed exceptions (bounds violations, invalid values, singular matrices)
that surface in Python with structured payloads.  Under jit, failures
manifest as NaN/Inf arrays instead of thrown exceptions, so the API layer
checks results at the device boundary and raises these.
"""

from __future__ import annotations


class OptimalLearningError(Exception):
    """Base error (OptimalLearningException counterpart)."""


class BoundsError(OptimalLearningError):
    """A value fell outside [min, max] (BoundsException<T>)."""

    def __init__(self, message, value=None, min_bound=None, max_bound=None):
        super().__init__(
            f"{message} (value={value}, bounds=[{min_bound}, {max_bound}])")
        self.value, self.min_bound, self.max_bound = value, min_bound, \
            max_bound


class InvalidValueError(OptimalLearningError):
    """A value didn't match what was expected (InvalidValueException<T>)."""

    def __init__(self, message, value=None, truth=None):
        super().__init__(f"{message} (value={value}, expected={truth})")
        self.value, self.truth = value, truth


class SingularMatrixError(OptimalLearningError):
    """Cholesky factorization failed (SingularMatrixException).

    Raised when a covariance factorization produces non-finite entries —
    typically duplicate sampled points with zero noise or extreme
    hyperparameters (gpp_math.cpp:492-495 semantics).
    """

    def __init__(self, message, matrix=None, leading_minor_index=None):
        super().__init__(message)
        self.matrix = matrix
        self.leading_minor_index = leading_minor_index


def check_finite_cholesky(chol, context: str):
    """Raise SingularMatrixError if a device-computed factor has NaNs."""
    import numpy as np
    arr = np.asarray(chol)
    if not np.all(np.isfinite(arr)):
        raise SingularMatrixError(
            f"{context}: covariance matrix singular. Check for duplicate "
            f"points (with 0 noise) and/or extreme hyperparameter values.",
            matrix=arr)
    return chol
