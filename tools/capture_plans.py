"""Capture .explain("formatted") for declared queries into
plans/$SPARK_GRAFT_PLANS_ROUND/ (default r16).

Usage:
    python tools/capture_plans.py before q1 q2 ...   # plans/<round>/<q>_before.txt
    python tools/capture_plans.py after  q1 q2 ...   # plans/<round>/<q>_after.txt

With no query names, captures every query in the registry.  The suffix
argument is mandatory so before/after pairs can't be overwritten by
accident.  Plans are captured at $SPARK_GRAFT_SF_DIR (default sf0.1) —
the scale the bench times — after one untimed warm run so session-staged
artifacts (signature tables, IVF index, parity event dirs) exist and the
captured plan is the WARM-path plan the bench measures, not the one-off
staging build.
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, "/root/repo")


def main() -> None:
    suffix = sys.argv[1]
    assert suffix in ("before", "after"), "first arg must be before|after"
    names = sys.argv[2:]
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")

    from lakehouse_loader_spark import get_spark
    from lakehouse_loader_spark.queries import REGISTRY, _ensure_loaded

    _ensure_loaded()
    if not names:
        names = sorted(REGISTRY)
    out_dir = os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        "plans",
        os.environ.get("SPARK_GRAFT_PLANS_ROUND", "r16"),
    )
    os.makedirs(out_dir, exist_ok=True)

    spark = get_spark("capture-plans")
    for name in names:
        spec = REGISTRY[name]
        try:
            # warm run: build staged artifacts so the captured plan is the
            # steady-state one (same reason bench.py warms before timing)
            spec.fn(spark, sf_dir).count()
            df = spec.fn(spark, sf_dir)
            plan = df._sc._jvm.PythonSQLUtils.explainString(
                df._jdf.queryExecution(), "formatted"
            )
        except Exception as exc:  # noqa: BLE001 - record the failure, keep going
            plan = f"ERROR: {type(exc).__name__}: {exc}"
        path = os.path.join(out_dir, f"{name}_{suffix}.txt")
        with open(path, "w") as f:
            f.write(plan)
        print(f"wrote {path} ({len(plan)} chars)", file=sys.stderr)
    spark.stop()


if __name__ == "__main__":
    main()
