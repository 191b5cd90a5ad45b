"""Single named logger (reference: main/utils/logger.py:1-3)."""

import logging
import os
import sys

LOGGER = logging.getLogger("IRW_TPU")

if not LOGGER.handlers:
    _handler = logging.StreamHandler(sys.stdout)
    _handler.setFormatter(
        logging.Formatter("[%(asctime)s %(levelname)s %(name)s] %(message)s", "%H:%M:%S")
    )
    LOGGER.addHandler(_handler)
    LOGGER.setLevel(os.environ.get("IRW_LOG_LEVEL", "INFO").upper())
    LOGGER.propagate = False
