"""Structured logging + tracing for the framework (SURVEY.md §5 metrics/
observability: the reference threads an optional console-shaped Logger
through all APIs, js/src/types.ts:305; tracing is named there as a
greenfield requirement for the TPU build).

Two pieces:
  - Logger: a tiny structured logger protocol (debug/info/warn/error with
    key-value fields), default writes one JSON line per event to stderr
    when ZKSC_LOG is set (silent otherwise, like the reference default).
  - trace_span: wall-clock span timing that also drives the JAX profiler
    when ZKSC_TRACE_DIR is set (jax.profiler.trace -> xprof/tensorboard
    trace files), so prover hot paths can be profiled without code edits.
"""
from __future__ import annotations

import contextlib
import json
import os
import sys
import time


class Logger:
    """Console-shaped structured logger. Subclass or pass a custom instance
    anywhere a `logger=` parameter is accepted."""

    LEVELS = ("debug", "info", "warn", "error")

    def __init__(self, min_level: str = "debug", stream=None):
        self._min = self.LEVELS.index(min_level)
        self._stream = stream

    def log(self, level: str, msg: str, **fields):
        if self.LEVELS.index(level) < self._min:
            return
        rec = {"ts": round(time.time(), 3), "level": level, "msg": msg}
        rec.update(fields)
        print(json.dumps(rec, default=str),
              file=self._stream or sys.stderr, flush=True)

    def debug(self, msg, **f):
        self.log("debug", msg, **f)

    def info(self, msg, **f):
        self.log("info", msg, **f)

    def warn(self, msg, **f):
        self.log("warn", msg, **f)

    def error(self, msg, **f):
        self.log("error", msg, **f)


class _SilentLogger(Logger):
    def log(self, level, msg, **fields):
        pass


def default_logger() -> Logger:
    """ZKSC_LOG=debug|info|warn|error enables stderr JSON logging; unset
    keeps the library silent (reference default: no logger supplied)."""
    lvl = os.environ.get("ZKSC_LOG", "")
    if lvl in Logger.LEVELS:
        return Logger(min_level=lvl)
    return _SilentLogger()


@contextlib.contextmanager
def trace_span(name: str, logger: Logger | None = None, **fields):
    """Time a span; if ZKSC_TRACE_DIR is set, also wrap it in a JAX profiler
    trace so device kernels land in an xprof trace viewable in tensorboard."""
    logger = logger or default_logger()
    trace_dir = os.environ.get("ZKSC_TRACE_DIR")
    t0 = time.time()
    if trace_dir:
        import jax
        with jax.profiler.trace(os.path.join(trace_dir, name)):
            with jax.profiler.TraceAnnotation(name):
                yield
    else:
        yield
    logger.debug("span", span=name, seconds=round(time.time() - t0, 4),
                 **fields)
