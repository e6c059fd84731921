"""Package shipping: make ``crawspark`` importable on every executor.

This is the ``spark-submit --py-files crawspark.zip`` story
(BASELINE.json:L6) made self-serve: when the driver process didn't launch
via spark-submit (e.g. an external harness created the SparkSession),
``ensure_shipped(spark)`` zips the package and registers it with
``sc.addPyFile`` so Python workers can unpickle our UDFs regardless of the
driver's cwd/sys.path.
"""

from __future__ import annotations

import os
import pathlib
import tempfile
import zipfile

_SHIPPED_APPS: set[str] = set()


def build_zip(dest: str | None = None) -> str:
    """Zip the crawspark package (source only, deterministic order)."""
    pkg_root = pathlib.Path(__file__).resolve().parent
    # pid-scoped default: concurrent driver processes must not clobber
    # each other's bundle mid-upload
    dest = dest or os.path.join(tempfile.gettempdir(),
                                f"crawspark-bundle-{os.getpid()}.zip")
    with zipfile.ZipFile(dest, "w", zipfile.ZIP_DEFLATED) as zf:
        for py in sorted(pkg_root.rglob("*.py")):
            zf.write(py, arcname=str(py.relative_to(pkg_root.parent)))
    return dest


def ensure_shipped(spark) -> None:
    """Idempotent per-session: addPyFile the package zip once."""
    app_id = spark.sparkContext.applicationId
    if app_id in _SHIPPED_APPS:
        return
    # Also cover locally-forked workers that inherit the environment.
    repo = str(pathlib.Path(__file__).resolve().parent.parent)
    existing = os.environ.get("PYTHONPATH", "")
    if repo not in existing.split(os.pathsep):
        os.environ["PYTHONPATH"] = (
            repo + (os.pathsep + existing if existing else ""))
    spark.sparkContext.addPyFile(build_zip())
    _SHIPPED_APPS.add(app_id)
