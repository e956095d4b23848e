"""Capture .explain("formatted") for headline queries into plans/<tag>/.

Usage:
    python tools/capture_plans.py <outdir> <suffix> [name ...]

e.g. ``python tools/capture_plans.py plans/r14 after`` writes
``plans/r14/<query>_after.txt`` for every headline query (or just the
names given).  Explain-only: no query is executed, so this is safe to run
on any tree without touching scratch state (mutate/lifecycle queries are
excluded by default — calling their fn performs writes).
"""
import contextlib
import io
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from bench import HEADLINE  # noqa: E402
from sql_query_optimizer_cpp_spark.inventory import all_queries  # noqa: E402
from sql_query_optimizer_cpp_spark.session import get_session  # noqa: E402

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


def main() -> None:
    outdir, suffix = sys.argv[1], sys.argv[2]
    names = sys.argv[3:] or list(HEADLINE)
    os.makedirs(outdir, exist_ok=True)
    spark = get_session(app_name="capture-plans")
    registry = all_queries()
    for name in names:
        spec = registry[name]
        df = spec.fn(spark, SF_DIR)
        buf = io.StringIO()
        with contextlib.redirect_stdout(buf):
            df.explain("formatted")
        plan = buf.getvalue()
        path = os.path.join(outdir, f"{name}_{suffix}.txt")
        with open(path, "w") as f:
            f.write(plan)
        print(f"wrote {path}", flush=True)
    spark.stop()


if __name__ == "__main__":
    main()
