"""Catalog error taxonomy — mirrors the exception semantics the reference
surfaces (SURVEY.md §2.1/§2.3) without its Java class hierarchy."""


class CatalogError(Exception):
    pass


class NoSuchNamespaceError(CatalogError):
    pass


class NamespaceAlreadyExistsError(CatalogError):
    pass


class NamespaceNotEmptyError(CatalogError):
    """Dropping a namespace that still holds tables/children
    (LakeFSCatalog.java:311-312, asserted TestLakeFSCatalogSpark.java:91-92)."""


class NoSuchTableError(CatalogError):
    pass


class TableAlreadyExistsError(CatalogError):
    pass


class CommitConflictError(CatalogError):
    """Lost the optimistic create-if-absent race for v(N+1)
    (LakeFSTableOperations.java:137-139 — AlreadyExistsException on duplicate
    write, proven at TestLakeFSTableOperations.java:62-63). Caller must
    refresh and retry."""


class CommitStateError(CatalogError):
    """Stale base metadata / table UUID changed / relocation attempted
    (LakeFSTableOperations.java:116-131, 267-277)."""


class MergeConflictError(CatalogError):
    """Both source and destination branch changed the same table since the
    merge base — no automatic resolution (lakeFS merge conflict semantics)."""


class PathSandboxError(CatalogError):
    """File access outside the repo/ref scope
    (LakeFSFileIO.verifyPath, LakeFSFileIO.java:26-33)."""


class SchemaMismatchError(CatalogError):
    """Incoming DataFrame columns cannot be aligned to the table schema
    (missing/extra/misnamed columns on a by-name write path)."""


class UnsupportedOperationError(CatalogError):
    """Operations the reference deliberately refuses (SURVEY.md §2.3):
    rename, custom location, top-level namespace listing, ns property
    mutation."""
