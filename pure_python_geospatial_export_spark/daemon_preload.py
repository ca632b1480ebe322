"""Python-worker daemon with preloaded scientific stack.

PySpark forks UDF workers from a daemon process; each fork then imports
pyspark.worker + numpy + pandas + pyarrow from scratch (~1.5-2s). A
32-slot local run launching a fresh Python stage pays that 32 times —
measured as executor threads parked for tens of seconds while the
machine burns system time in fork/import storms.

Importing the stack HERE, before the daemon starts serving forks, makes
every worker inherit the already-initialized modules through fork
copy-on-write: worker start drops to milliseconds.

Fork safety: BLAS thread pools must not exist pre-fork; session config
pins OPENBLAS/OMP/MKL threads to 1 for worker processes (also the right
setting for task-parallel executors).

Enable with: spark.python.daemon.module=
    pure_python_geospatial_export_spark.daemon_preload
"""

import os

os.environ.setdefault("OPENBLAS_NUM_THREADS", "1")
os.environ.setdefault("OMP_NUM_THREADS", "1")
os.environ.setdefault("MKL_NUM_THREADS", "1")

import numpy  # noqa: F401,E402
import pandas  # noqa: F401,E402
import pyarrow  # noqa: F401,E402
import pyspark.serializers  # noqa: F401,E402
import pyspark.sql.pandas.serializers  # noqa: F401,E402
import pyspark.worker  # noqa: F401,E402
from pyspark.daemon import manager  # noqa: E402

if __name__ == "__main__":
    manager()
