"""Console logging (replaces loguru, reference helpers/help.py:1-6)."""

from __future__ import annotations

import logging
import sys

_LOGGER = None


def get_logger(name: str = "s_volsdf_tpu") -> logging.Logger:
    global _LOGGER
    if _LOGGER is None:
        logger = logging.getLogger(name)
        logger.setLevel(logging.INFO)
        if not logger.handlers:
            h = logging.StreamHandler(sys.stderr)
            h.setFormatter(logging.Formatter(
                "%(asctime)s | %(levelname)s | %(message)s", "%H:%M:%S"))
            logger.addHandler(h)
        logger.propagate = False
        _LOGGER = logger
    return _LOGGER
