"""Logging helpers (waimak-core/.../log/Logging.scala): the Python
``logging`` module supplies the lazy level guards; what the reference adds
on top is ``logAndReturn`` (Logging.scala:96-118) — log a value (or a
message derived from it) and pass it through, for fluent pipelines like
``flow.map(lambda f: log_and_return(f, "prepared"))``."""

from __future__ import annotations

import logging
from typing import Callable, TypeVar, Union

A = TypeVar("A")

_logger = logging.getLogger("waimak_spark")


def log_and_return(value: A,
                   message: Union[str, Callable[[A], str]],
                   level: int = logging.INFO,
                   logger: logging.Logger | None = None) -> A:
    """Log ``message`` (a string, or a function of the value) at ``level``
    and return ``value`` unchanged."""
    log = logger or _logger
    if log.isEnabledFor(level):
        log.log(level, message(value) if callable(message) else message)
    return value
