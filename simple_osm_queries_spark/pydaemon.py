"""Python worker daemon with preloaded heavy imports.

Spark's Unix worker model forks workers from one long-lived daemon
process (``python -m pyspark.daemon``); a forked worker inherits every
module the daemon imported (copy-on-write), but the stock daemon only
has pyspark itself loaded, so the FIRST task of every Python stage pays
a fresh ``import pandas`` + ``import pyarrow`` (+ numpy) in each of the
N concurrent workers — measured ~9 s of first-Python-stage overhead at
local[32] (1M-doc minhash signature stage: 13.8 s first use vs 4.2 s
once workers are warm).

Pointing ``spark.python.daemon.module`` here (session.py) makes the
daemon import the heavy libraries ONCE before any fork, so every worker
starts warm. Behavior is otherwise identical — ``manager()`` is the
stock pyspark daemon loop. On a real cluster the same conf ships in
``--conf`` and the package just has to be importable on executors (it
already must be: operator UDF bodies import from this package).
"""

import numpy  # noqa: F401  (preload: inherited by forked workers)
import pandas  # noqa: F401
import pyarrow  # noqa: F401
import pyspark.sql  # noqa: F401
import pyspark.worker  # noqa: F401  (the per-worker main loop)
from pyspark.daemon import manager

if __name__ == "__main__":
    manager()
