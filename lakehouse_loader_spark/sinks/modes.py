"""Write-mode resolution matching the reference's flag semantics.

Reference: (overwrite, append) → CreateExclusive / Overwrite / Append, with
both flags together an error (src/iceberg_destination.rs:32-37, 159-168),
and the Delta path refusing a non-empty target without overwrite
(src/delta_destination.rs:421-427).
"""

from __future__ import annotations

from enum import Enum


class WriteMode(Enum):
    CREATE_EXCLUSIVE = "errorifexists"
    OVERWRITE = "overwrite"
    APPEND = "append"


class WriteModeError(ValueError):
    pass


def resolve_write_mode(overwrite: bool = False, append: bool = False) -> WriteMode:
    """(overwrite, append) flag pair → WriteMode; both set is an error,
    exactly the reference's matrix."""
    if overwrite and append:
        raise WriteModeError("cannot combine overwrite and append")
    if overwrite:
        return WriteMode.OVERWRITE
    if append:
        return WriteMode.APPEND
    return WriteMode.CREATE_EXCLUSIVE


class TargetExistsError(FileExistsError):
    """Raised when the target table exists and mode is CREATE_EXCLUSIVE
    (reference: IoError 'delta table already exists',
    src/delta_destination.rs:424-426)."""
