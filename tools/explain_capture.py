"""Capture .explain("formatted") for registry queries into
plans/$PLANS_ROUND/ (default plans/r13/).

Usage: python tools/explain_capture.py <tag> <query> [query ...]
       python tools/explain_capture.py <tag> --all

Writes plans/<round>/<query>_<tag>.txt per query (tag = before|after).
Queries that drive a streaming drain or pull the plan through a
localCheckpoint (the plan is then a checkpoint scan, not the operator
tree) still get captured — the file records whatever plan the registry
entry returns, which is exactly what the bench times.
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from activity_classifier_spark_cassandra_spark.session import get_spark  # noqa: E402

import __spark_entry__ as E  # noqa: E402

OUT_DIR = os.path.join(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
    "plans",
    os.environ.get("PLANS_ROUND", "r13"),
)

USAGE = (
    "usage: python tools/explain_capture.py <tag> <query> [query ...]\n"
    "       python tools/explain_capture.py <tag> --all\n"
    "env:   PLANS_ROUND (default r13) selects plans/<round>/"
)


def main() -> None:
    if len(sys.argv) < 3:
        print(USAGE, file=sys.stderr)
        raise SystemExit(2)
    tag = sys.argv[1]
    names = sys.argv[2:]
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    qs = E.queries()
    if names == ["--all"]:
        names = list(qs)
    os.makedirs(OUT_DIR, exist_ok=True)
    spark = get_spark(app_name="explain_capture")
    for name in names:
        try:
            df = qs[name](spark, sf_dir)
            # py4j explainString is absent in this build (verify-skill
            # gotcha) — capture the Python explain()'s stdout instead.
            import contextlib
            import io

            buf = io.StringIO()
            with contextlib.redirect_stdout(buf):
                df.explain("formatted")
            plan = buf.getvalue()
        except Exception as e:  # noqa: BLE001 - record the failure
            plan = f"EXPLAIN FAILED: {e}"
        path = os.path.join(OUT_DIR, f"{name}_{tag}.txt")
        with open(path, "w") as fh:
            fh.write(plan)
        print(f"wrote {path} ({len(plan)} bytes)")
    spark.stop()


if __name__ == "__main__":
    main()
