"""Logging shim with a loguru-like interface (loguru is not installed
in this image; the reference uses it everywhere)."""

import logging
import sys

_handler = logging.StreamHandler(sys.stderr)
_handler.setFormatter(
    logging.Formatter("%(asctime)s | %(levelname)-7s | %(message)s", "%H:%M:%S")
)
logger = logging.getLogger("d3ga_tpu")
if not logger.handlers:
    logger.addHandler(_handler)
logger.setLevel(logging.INFO)
logger.propagate = False
