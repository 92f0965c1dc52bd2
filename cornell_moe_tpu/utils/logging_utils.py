"""Logging and observability.

Counterpart of ``cpp/gpp_logging.{hpp,cpp}`` (compile-gated
OL_ERROR/WARNING/VERBOSE printf macros) and the reference's driver-side
wall-clock prints (SURVEY.md section 5).  TPU-native additions: a phase
timer that records per-phase wall clock into a run report, and a profiler
context that captures a device trace via jax.profiler for xprof analysis.
"""

from __future__ import annotations

import contextlib
import json
import logging
import time
from typing import Dict, List, Optional

import numpy as np

LOGGER_NAME = "cornell_moe_tpu"
logger = logging.getLogger(LOGGER_NAME)


def configure_logging(verbose: bool = False) -> logging.Logger:
    """OL_VERBOSE_PRINT-style switch: INFO by default, DEBUG if verbose."""
    handler = logging.StreamHandler()
    handler.setFormatter(logging.Formatter(
        "[%(asctime)s %(levelname).1s %(name)s] %(message)s", "%H:%M:%S"))
    logger.handlers[:] = [handler]
    logger.setLevel(logging.DEBUG if verbose else logging.INFO)
    return logger


def error_printf(msg, *args):
    logger.error(msg, *args)


def warning_printf(msg, *args):
    logger.warning(msg, *args)


def verbose_printf(msg, *args):
    logger.debug(msg, *args)


def print_matrix(matrix, name: str = "matrix"):
    """PrintMatrix counterpart (gpp_logging.hpp)."""
    logger.info("%s =\n%s", name, np.array2string(
        np.asarray(matrix), precision=6, suppress_small=True))


class PhaseTimer:
    """Accumulates per-phase wall-clock timings across a run.

    The reference prints raw time.time() deltas in its driver
    (examples/main.py:166-272); this records them structurally so runs are
    comparable and reportable.
    """

    def __init__(self):
        self.records: List[Dict] = []

    @contextlib.contextmanager
    def phase(self, name: str, **attrs):
        start = time.time()
        try:
            yield
        finally:
            self.records.append(
                {"phase": name, "seconds": time.time() - start, **attrs})
            logger.info("%s took %.2fs", name, self.records[-1]["seconds"])

    def summary(self) -> Dict[str, Dict[str, float]]:
        out: Dict[str, Dict[str, float]] = {}
        for r in self.records:
            agg = out.setdefault(
                r["phase"], {"total": 0.0, "count": 0, "max": 0.0})
            agg["total"] += r["seconds"]
            agg["count"] += 1
            agg["max"] = max(agg["max"], r["seconds"])
        return out

    def dump(self, path: str) -> None:
        with open(path, "w") as f:
            json.dump({"records": self.records,
                       "summary": self.summary()}, f, indent=2)


@contextlib.contextmanager
def device_trace(log_dir: Optional[str] = None):
    """Capture a device profile (JAX profiler / xprof) around a block.

    The TPU-native analogue of the reference's (absent) tracing subsystem;
    traces open in xprof / tensorboard-profile.
    """
    import jax

    log_dir = log_dir or f"/tmp/cornell_moe_trace_{int(time.time())}"
    with jax.profiler.trace(log_dir):
        yield log_dir
    logger.info("device trace written to %s", log_dir)
