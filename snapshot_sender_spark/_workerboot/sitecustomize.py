"""Worker bootstrap, injected via PYTHONPATH by ``session.get_spark``.

CPython imports ``sitecustomize`` at interpreter start (soft-fail: ``site``
swallows import errors), so every Python process the Spark JVM launches —
the ``pyspark.daemon`` (whose forked task workers inherit the patch) and the
``pyspark.sql.worker.*`` data-source planners — gets the zipimport
invalidate guard installed *before* its first task, removing the ~0.2 s
per-task ``importlib.invalidate_caches()`` zip re-parse documented in
``snapshot_sender_spark/pyboundary.py``.

This file lives in its own directory so that putting it on PYTHONPATH adds
nothing else to ``sys.path``. It is self-locating: the package root is two
levels up, appended (not prepended) so an already-importable installation of
the package wins.
"""

import os
import sys

_root = os.path.dirname(os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
if _root not in sys.path:
    sys.path.append(_root)
try:
    from snapshot_sender_spark.pyboundary import install_zipimport_guard

    install_zipimport_guard()
except Exception:  # never break interpreter startup for an optimization
    pass
