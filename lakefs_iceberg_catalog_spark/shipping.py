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
    zip_path = os.path.join(
        tempfile.gettempdir(), f"lakefs_iceberg_catalog_spark_pyfiles_{os.getpid()}.zip"
    )
    with zipfile.ZipFile(zip_path, "w", zipfile.ZIP_DEFLATED) as zf:
        for root, dirs, files in os.walk(pkg_dir):
            dirs[:] = [d for d in dirs if d != "__pycache__"]
            for fn in sorted(files):
                if fn.endswith(".py"):
                    full = os.path.join(root, fn)
                    zf.write(full, os.path.relpath(full, os.path.dirname(pkg_dir)))
    sc.addPyFile(zip_path)
    _SHIPPED.add(app)
