"""ANSI-colored log formatter (role of reference ``blvm/utils/logger.py:4``)."""

import logging

_COLORS = {
    logging.DEBUG: "\x1b[38;21m",
    logging.INFO: "\x1b[36m",
    logging.WARNING: "\x1b[33;21m",
    logging.ERROR: "\x1b[31;21m",
    logging.CRITICAL: "\x1b[31;1m",
}
_RESET = "\x1b[0m"
_FORMAT = "%(asctime)s %(levelname)s %(name)s | %(message)s"


class ColoredLogsFormatter(logging.Formatter):
    def format(self, record: logging.LogRecord) -> str:
        color = _COLORS.get(record.levelno, "")
        formatter = logging.Formatter(color + _FORMAT + _RESET, datefmt="%H:%M:%S")
        return formatter.format(record)
