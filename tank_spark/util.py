"""Session utilities."""

from __future__ import annotations

import os
import tempfile
import zipfile

from pyspark.sql import SparkSession

_SHIPPED: set[str] = set()


def ensure_workers_have_package(spark: SparkSession) -> None:
    """Ship tank_spark to Spark Python workers via addPyFile.

    Python-side kernels (applyInPandas / mapInPandas) are pickled by
    reference: workers import ``tank_spark.*`` at execution time. When the
    package is importable only through the driver's cwd (repo checkout,
    not pip-installed), worker processes cannot resolve it — observed as
    ``ModuleNotFoundError: tank_spark`` inside the kernel. Zipping the
    package once per session and ``addPyFile``-ing it makes every kernel
    location-independent. No-op after the first call per session.
    """
    key = spark.sparkContext.applicationId
    if key in _SHIPPED:
        return
    import tank_spark

    pkg_dir = os.path.dirname(tank_spark.__file__)
    zpath = os.path.join(tempfile.gettempdir(), f"tank_spark_pkg_{os.getpid()}.zip")
    if not os.path.exists(zpath):
        with zipfile.ZipFile(zpath, "w") as zf:
            for root, _dirs, files in os.walk(pkg_dir):
                for f in files:
                    if not f.endswith(".py"):
                        continue
                    full = os.path.join(root, f)
                    rel = os.path.join(
                        "tank_spark", os.path.relpath(full, pkg_dir)
                    )
                    zf.write(full, rel)
    spark.sparkContext.addPyFile(zpath)
    _SHIPPED.add(key)
