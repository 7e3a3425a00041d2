"""Logging facade.

Same contract as the reference logger (`/root/reference/logger/logger.py:1-11`):
`get_logger(name)` returns a module-level INFO logger with a
`[%(asctime)s] %(message)s` format.
"""

import logging

_FORMAT = "[%(asctime)s] %(message)s"
_configured = False


def _configure() -> None:
    global _configured
    if not _configured:
        logging.basicConfig(format=_FORMAT, level=logging.INFO)
        _configured = True


def get_logger(name: str) -> logging.Logger:
    _configure()
    return logging.getLogger(name)
