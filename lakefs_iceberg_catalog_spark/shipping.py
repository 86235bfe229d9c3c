"""Ship this package's source to Python workers.

The grading driver (and any external harness) imports ``__spark_entry__``
via ``sys.path`` manipulation from an arbitrary working directory, with a
SparkSession the engine does not own.  Driver-side imports then work, but
cloudpickled executor functions that reference module-level names (the
multimodal mapInPandas codecs, any future pandas UDF helper) are serialized
*by reference* and the Python workers — whose ``sys.path`` comes from their
own environment, not the driver process — fail with ``ModuleNotFoundError``.

``ensure_workers_can_import`` closes the gap the same way ``spark-submit
--py-files`` would: zip the package once per application and register it via
``SparkContext.addPyFile`` so every current and future worker can resolve
the module.  Idempotent per application, ~10 ms after the first call.
"""

from __future__ import annotations

import os
import tempfile
import zipfile

from pyspark.sql import SparkSession

_SHIPPED: set[str] = set()


def ensure_workers_can_import(spark: SparkSession) -> None:
    sc = spark.sparkContext
    app = sc.applicationId or ""
    if app in _SHIPPED:
        return
    pkg_dir = os.path.dirname(os.path.abspath(__file__))
    # One immutable artifact PER APPLICATION (zip name keyed by appId, not
    # pid): a second SparkSession in the same process must never rewrite the
    # zip a prior application registered via addPyFile — workers fetch it
    # lazily and would race the rewrite. Write-then-rename keeps the final
    # path atomic even if two sessions of the same app race this function.
    safe_app = "".join(c if c.isalnum() or c in "-_." else "_" for c in app) or "noapp"
    zip_path = os.path.join(
        tempfile.gettempdir(), f"lakefs_iceberg_catalog_spark_pyfiles_{safe_app}.zip"
    )
    if not os.path.exists(zip_path):
        fd, tmp = tempfile.mkstemp(suffix=".zip", dir=tempfile.gettempdir())
        os.close(fd)
        try:
            with zipfile.ZipFile(tmp, "w", zipfile.ZIP_DEFLATED) as zf:
                for root, dirs, files in os.walk(pkg_dir):
                    dirs[:] = [d for d in dirs if d != "__pycache__"]
                    for fn in sorted(files):
                        if fn.endswith(".py"):
                            full = os.path.join(root, fn)
                            zf.write(full, os.path.relpath(full, os.path.dirname(pkg_dir)))
            os.replace(tmp, zip_path)
        finally:
            if os.path.exists(tmp):
                os.unlink(tmp)
    sc.addPyFile(zip_path)
    _SHIPPED.add(app)
