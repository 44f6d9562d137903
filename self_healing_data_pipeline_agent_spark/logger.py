"""Console logger, reference parity (/root/reference/src/logger.py:1-18).

The reference wraps ``logging`` in a ``rich.RichHandler``; this container
has no ``rich``, so the same contract — ``get_logger(name)`` returning a
configured-once INFO logger with timestamped, level-tagged output — is met
with a stdlib handler that colorizes levels when stderr is a TTY and
degrades to plain text otherwise (so executor/cron logs stay grep-able).
If ``rich`` IS importable, it is used, matching the reference exactly.
"""

from __future__ import annotations

import logging
import sys

_COLORS = {
    "DEBUG": "\x1b[36m",     # cyan
    "INFO": "\x1b[32m",      # green
    "WARNING": "\x1b[33m",   # yellow
    "ERROR": "\x1b[31m",     # red
    "CRITICAL": "\x1b[1;31m",
}
_RESET = "\x1b[0m"


class _ConsoleFormatter(logging.Formatter):
    def __init__(self, color: bool) -> None:
        super().__init__("%(asctime)s - %(name)s - %(levelname)s - %(message)s")
        self._color = color

    def format(self, record: logging.LogRecord) -> str:
        if self._color and record.levelname in _COLORS:
            record = logging.makeLogRecord(record.__dict__)
            record.levelname = (
                f"{_COLORS[record.levelname]}{record.levelname}{_RESET}"
            )
        return super().format(record)


def get_logger(name: str) -> logging.Logger:
    logger = logging.getLogger(name)
    if logger.handlers:
        return logger  # already configured (reference behavior)

    logger.setLevel(logging.INFO)
    try:
        from rich.logging import RichHandler

        handler: logging.Handler = RichHandler(rich_tracebacks=True, markup=True)
        handler.setFormatter(
            logging.Formatter("%(asctime)s - %(name)s - %(levelname)s - %(message)s")
        )
    except ImportError:
        handler = logging.StreamHandler()
        handler.setFormatter(_ConsoleFormatter(color=sys.stderr.isatty()))
    logger.addHandler(handler)
    return logger
