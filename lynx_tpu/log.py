"""Structured logging for lynx-tpu (SURVEY.md §5 metrics/logging row).

The reference has no logging at all — converter diagnostics are bare
``print`` calls (reference ``converters/ocelot.py:139-141,175-179``,
``bmad.py:632-635``).  Here everything goes through a standard
:mod:`logging` logger under the ``lynx_tpu`` namespace, so applications
and tests can route, filter and capture it (``caplog`` in pytest,
``absl.logging`` interop via the stdlib root handlers).
"""

from __future__ import annotations

import logging
from typing import Optional

logger = logging.getLogger("lynx_tpu")


def get_logger(name: Optional[str] = None) -> logging.Logger:
    """Return the package logger, or a child of it (e.g.
    ``get_logger("converters.bmad")``)."""
    return logger if name is None else logger.getChild(name)
