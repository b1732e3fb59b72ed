"""Framework logger, env-gated like the reference's RNNTLogger
(reference: models/utils.py:11-21, env RNNT_LOG_LEVEL)."""

from __future__ import annotations

import logging
import os

LOG_LEVEL = int(os.environ.get("RNNT_LOG_LEVEL", logging.INFO))
LOG_FORMAT = logging.Formatter("[%(filename)s:%(lineno)d %(levelname)s] %(message)s")

logger = logging.getLogger("RNNTLogger")
if not logger.handlers:
    logger.setLevel(LOG_LEVEL)
    _handler = logging.StreamHandler()
    _handler.setFormatter(LOG_FORMAT)
    logger.addHandler(_handler)
