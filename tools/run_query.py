"""Shim kept for existing docs/scripts: ``python -m tools.run_query``.

The real CLI lives in spark_ml_helper_spark/cli.py (installed as the
``smh-run`` console script by pyproject.toml); this module just forwards
so both invocations stay equivalent. Run ``smh-run --help`` (or
``python -m tools.run_query --help``) for usage.
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from spark_ml_helper_spark.cli import main

if __name__ == "__main__":
    main()
