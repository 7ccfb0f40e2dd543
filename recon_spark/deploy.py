"""Code distribution: make the recon_spark package importable on executors.

The production launch story is ``spark-submit --py-files recon_spark.zip``
(BASELINE.json north_star). When we're handed an already-running
SparkSession (the driver harness does this), we replicate that by zipping
the package and calling ``sc.addPyFile`` — idempotent per session.
Without this, Arrow UDF closures that reference module-level kernels
fail to unpickle on workers started from a different cwd.
"""

from __future__ import annotations

import os
import zipfile

from pyspark.sql import SparkSession

_PKG_DIR = os.path.dirname(os.path.abspath(__file__))
_SENT_KEY = "recon_spark.pyfiles.shipped"


def build_pyfiles_zip(dest: str | None = None) -> str:
    """Zip the recon_spark package (sources only) for --py-files/addPyFile."""
    if not os.path.isdir(_PKG_DIR):
        raise RuntimeError(
            "recon_spark is already running from a --py-files archive; "
            "nothing to zip"
        )
    dest = dest or os.path.join("/tmp", f"recon_spark_pyfiles_{os.getpid()}.zip")
    with zipfile.ZipFile(dest, "w", zipfile.ZIP_DEFLATED) as zf:
        for root, _dirs, files in os.walk(_PKG_DIR):
            if "__pycache__" in root:
                continue
            for f in files:
                # .dat: the Public Suffix List data file — read at
                # import time by queries' oracle builders, so it must
                # travel with the sources under --py-files
                if not f.endswith((".py", ".dat")):
                    continue
                full = os.path.join(root, f)
                rel = os.path.join(
                    "recon_spark", os.path.relpath(full, _PKG_DIR)
                )
                zf.write(full, rel)
    return dest


def ensure_pyfiles(spark: SparkSession) -> None:
    """Ship the package to this session's executors exactly once.

    No-op when the package itself was imported from a zip — that means
    we were launched via spark-submit --py-files and the archive is
    already on every executor's path."""
    if not os.path.isdir(_PKG_DIR):
        return
    sc = spark.sparkContext
    conf_flag = sc.environment.get(_SENT_KEY)
    if conf_flag:
        return
    sc.addPyFile(build_pyfiles_zip())
    sc.environment[_SENT_KEY] = "1"
