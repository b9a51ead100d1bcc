"""Framework exceptions with actionable messages.

Parity: /root/reference/src/caliscope/exceptions.py:1-13.
"""


class CalibrationError(Exception):
    """Raised when calibration cannot proceed; message says what to fix."""


class CalibrationWarning(UserWarning):
    """Non-fatal calibration quality concern."""


class PersistenceError(Exception):
    """Raised when an artifact cannot be read or written."""
