"""Engine error types.

The reference maps empty point-lookups and missing files to
``stac_fastapi.types.errors.NotFoundError`` (reference
``database_logic.py:179-183,940-944``) and silently DROPS invalid
filters (``database_logic.py:516-519,622-624``) — a fail-open we
deliberately replace with fail-closed ``InvalidQueryError`` (SURVEY §4.4).
"""

from __future__ import annotations


class EngineError(Exception):
    """Base class for engine errors."""


class NotFoundError(EngineError):
    """Item / collection does not exist (HTTP 404 analog)."""


class InvalidQueryError(EngineError):
    """Malformed search parameter (HTTP 400 analog).

    Raised where the reference would fail open (unsupported CQL2 op →
    ``1=1``, bad datetime silently ignored).
    """
