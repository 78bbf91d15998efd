"""Package shipping: make ``sparkfeat`` importable on executors.

Arrow UDF / applyInPandas closures are cloudpickled *by reference*
(module + qualname), so Python workers must be able to import
``sparkfeat`` — on a real cluster that's ``spark-submit --py-files
sparkfeat.zip`` (north rule); for a SparkSession we didn't launch
(driver harness, notebooks) :func:`ensure_shipped` builds the zip on
the fly and registers it with ``addPyFile``, which distributes it and
prepends it to every worker's sys.path.
"""

from __future__ import annotations

import os
import tempfile
import zipfile

_SHIPPED_ATTR = "_sparkfeat_shipped"


def build_zip(out_path: str | None = None) -> str:
    """Zip the sparkfeat package (sources only) for --py-files/addPyFile."""
    pkg_dir = os.path.dirname(os.path.abspath(__file__))
    if out_path is None:
        out_path = os.path.join(tempfile.gettempdir(), f"sparkfeat-{os.getpid()}.zip")
    with zipfile.ZipFile(out_path, "w", zipfile.ZIP_DEFLATED) as zf:
        for root, _dirs, files in os.walk(pkg_dir):
            if "__pycache__" in root:
                continue
            for f in files:
                if f.endswith(".py"):
                    full = os.path.join(root, f)
                    rel = os.path.join("sparkfeat", os.path.relpath(full, pkg_dir))
                    zf.write(full, rel)
    return out_path


def ensure_shipped(spark) -> None:
    """Idempotently register the package zip with the session's context."""
    sc = spark.sparkContext
    if getattr(sc, _SHIPPED_ATTR, False):
        return
    sc.addPyFile(build_zip())
    setattr(sc, _SHIPPED_ATTR, True)
