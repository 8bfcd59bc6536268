"""Ship this package to Spark Python workers.

Python-UDF operators (mapInPandas in operators/multimodal.py) are
serialized by reference: workers must be able to import
`python_sql_datawarehouse_project_spark`.  That holds only when the
driver's cwd/PYTHONPATH happens to include the repo root — NOT
guaranteed for an external driver that built its own SparkSession
(the verify gate runs from a non-repo cwd and real clusters submit
from anywhere).  `ensure_package_on_workers` zips the package and
`addPyFile`s it once per SparkContext, which distributes the zip and
prepends it to every worker's sys.path — the same mechanism
spark-submit --py-files uses on a 1000-executor cluster.
"""

from __future__ import annotations

import os
import tempfile
import zipfile

from pyspark.sql import SparkSession

_PKG_DIR = os.path.dirname(os.path.abspath(__file__))
_PKG_NAME = os.path.basename(_PKG_DIR)
_shipped: set[str] = set()


def ensure_package_on_workers(spark: SparkSession) -> None:
    sc = spark.sparkContext
    key = sc.applicationId
    if key in _shipped:
        return
    zip_path = os.path.join(
        tempfile.gettempdir(), f"{_PKG_NAME}-{os.getpid()}.zip"
    )
    with zipfile.ZipFile(zip_path, "w", zipfile.ZIP_DEFLATED) as zf:
        for root, _dirs, files in os.walk(_PKG_DIR):
            for f in files:
                if not f.endswith(".py"):
                    continue
                full = os.path.join(root, f)
                rel = os.path.join(_PKG_NAME, os.path.relpath(full, _PKG_DIR))
                zf.write(full, rel)
    sc.addPyFile(zip_path)
    _shipped.add(key)
