from .errors import (
    CommitConflictError,
    CommitStateError,
    MergeConflictError,
    NamespaceAlreadyExistsError,
    NamespaceNotEmptyError,
    NoSuchNamespaceError,
    NoSuchTableError,
    PathSandboxError,
    SchemaMismatchError,
    TableAlreadyExistsError,
    UnsupportedOperationError,
)
from .catalog import VersionedCatalog

__all__ = [
    "VersionedCatalog",
    "CommitConflictError",
    "CommitStateError",
    "MergeConflictError",
    "NamespaceAlreadyExistsError",
    "NamespaceNotEmptyError",
    "NoSuchNamespaceError",
    "NoSuchTableError",
    "PathSandboxError",
    "SchemaMismatchError",
    "TableAlreadyExistsError",
    "UnsupportedOperationError",
]
