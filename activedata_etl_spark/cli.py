"""Command-line query runner: the ActiveData service's POST /query as a
spark-submit-able job.

    python -m activedata_etl_spark.cli --query q.json \
        --data /root/testdata/sf0.01 [--format table] [--output out.json]

The query file is a jx JSON query (see JX.md); tables in ``--data`` are
registered as views. Output is the formatted result as JSON on stdout
(or ``--output``).
"""

from __future__ import annotations

import argparse
import datetime as dt
import json
import sys


def _default(o):
    if isinstance(o, (dt.datetime, dt.date)):
        return o.isoformat()
    raise TypeError(f"not JSON-serializable: {type(o)}")


def main(argv: list[str] | None = None) -> int:
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--query", required=True, help="path to jx query JSON")
    ap.add_argument("--data", required=True, help="directory of <table>.parquet files")
    ap.add_argument("--output", default=None, help="write JSON here (default stdout)")
    ap.add_argument("--format", dest="fmt", default=None,
                    help="override the query's format (list|table|cube|"
                         "parquet — parquet writes DISTRIBUTED to "
                         "--output, never collecting: the bulk path)")
    args = ap.parse_args(argv)

    from .io import register_views
    from .plans.query import run_formatted
    from .session import get_spark

    try:
        with open(args.query) as f:
            q = json.load(f)
    except OSError as e:
        print(f"error: cannot read query file: {e}", file=sys.stderr)
        return 2
    except json.JSONDecodeError as e:
        print(f"error: query file is not valid JSON: {e}", file=sys.stderr)
        return 2
    if args.fmt:
        q["format"] = args.fmt

    from .plans.validate import validate

    # format=parquet is CLI-only (a write destination, not a response
    # shape) — validate the query as its collected equivalent
    to_check = {**q, "format": "list"} if q.get("format") == "parquet" else q
    if problems := validate(to_check):
        for p in problems:
            print(f"error: invalid query at {p['path']}: {p['reason']}",
                  file=sys.stderr)
        return 2

    if q.get("format") == "parquet" and not args.output:
        print("error: format=parquet needs --output <dir>", file=sys.stderr)
        return 2

    spark = get_spark("jx-cli")
    register_views(spark, args.data)
    if q.get("format") == "parquet":
        # bulk extract: the result DataFrame writes straight to parquet,
        # every executor writing its own partitions — nothing collects
        # on the driver, so this scales to any result size (the
        # list/table/cube formats are the interactive, human-sized path)
        from .plans.query import run as run_plan

        try:
            df = run_plan(spark, {k: v for k, v in q.items()
                                  if k != "format"})
            df.write.mode("overwrite").parquet(args.output)
        except Exception as e:
            msg = str(e).split("\n")[0]
            print(f"error: query failed to plan/execute: {msg}",
                  file=sys.stderr)
            return 3
        print(json.dumps({"written": args.output}))
        return 0
    try:
        result = run_formatted(spark, q)
    except ValueError as e:
        print(f"error: bad query: {e}", file=sys.stderr)
        return 2
    except Exception as e:  # analysis errors: surface the first line, not py4j guts
        msg = str(e).split("\n")[0]
        print(f"error: query failed to plan/execute: {msg}", file=sys.stderr)
        return 3

    out = json.dumps(result, default=_default, indent=2)
    if args.output:
        with open(args.output, "w") as f:
            f.write(out)
    else:
        print(out)
    return 0


if __name__ == "__main__":
    sys.exit(main())
