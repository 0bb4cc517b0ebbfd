"""Worker-import bootstrap.

Arrow-batched operators (mapInPandas / pandas UDFs) pickle their Python
functions BY REFERENCE — executors must be able to import
``trialstreamer_spark`` themselves. When the driver process was launched
from outside the repo (the driver harness, a notebook, spark-submit
without --py-files), workers would fail with ModuleNotFoundError.

``ensure_worker_imports`` zips the package and registers it via
``SparkContext.addPyFile`` — callable at runtime, idempotent per session,
and equivalent to shipping a wheel with --py-files on a real cluster.
Every Python-on-worker entry point calls it first.
"""

from __future__ import annotations

import os
import tempfile
import zipfile

from pyspark.sql import SparkSession

_FLAG = "_trialstreamer_pyfile_added"


def ensure_worker_imports(spark: SparkSession) -> None:
    sc = spark.sparkContext
    if getattr(sc, _FLAG, False):
        return
    import trialstreamer_spark

    pkg_dir = os.path.dirname(os.path.abspath(trialstreamer_spark.__file__))
    zpath = os.path.join(
        tempfile.gettempdir(),
        f"trialstreamer_spark_pkg_{abs(hash(pkg_dir))}.zip",
    )
    if not os.path.exists(zpath):
        tmp = zpath + ".tmp"
        with zipfile.ZipFile(tmp, "w") as z:
            for root, _dirs, files in os.walk(pkg_dir):
                for f in files:
                    if f.endswith(".py"):
                        full = os.path.join(root, f)
                        rel = os.path.join(
                            "trialstreamer_spark",
                            os.path.relpath(full, pkg_dir),
                        )
                        z.write(full, rel)
        os.replace(tmp, zpath)
    sc.addPyFile(zpath)
    setattr(sc, _FLAG, True)
