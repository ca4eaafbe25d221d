"""Dump .explain("formatted") for HEADLINE queries to plans/<tag>/.

Usage: python tools/dump_plans.py <out_dir> [name ...]

Each query's final DataFrame plan is written to <out_dir>/<name>.txt.
Queries whose construction itself runs jobs (stored-artifact builds,
streaming drains) still produce their final plan; construction cost is
not captured here — the bench times it.
"""

from __future__ import annotations

import os
import sys
import traceback

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from __spark_entry__ import queries  # noqa: E402
from bench import HEADLINE  # noqa: E402
from local_vectordb_spark.session import get_spark  # noqa: E402


def main() -> None:
    out_dir = sys.argv[1]
    only = sys.argv[2:]
    names = only or HEADLINE
    os.makedirs(out_dir, exist_ok=True)
    spark = get_spark("dump_plans")
    spark.sparkContext.setLogLevel("ERROR")
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    qs = queries()
    for name in names:
        if name not in qs:
            print(f"skip {name}: not in registry")
            continue
        try:
            plan = qs[name](spark, sf_dir)._jdf.queryExecution().explainString(
                spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString(
                    "formatted"
                )
            )
        except Exception:  # noqa: BLE001
            plan = traceback.format_exc()
        with open(os.path.join(out_dir, f"{name}.txt"), "w") as f:
            f.write(plan)
        print(f"wrote {name}")


if __name__ == "__main__":
    main()
