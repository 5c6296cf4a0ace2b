"""Engine CLI — the query catalog as a user surface.

    python -m sales_data_pipeline_gcp_spark.cli list [--tag dedup]
    python -m sales_data_pipeline_gcp_spark.cli explain q_agg_group [--sf-dir D]
    python -m sales_data_pipeline_gcp_spark.cli run q_agg_group [--sf-dir D] [-n 20]
    python -m sales_data_pipeline_gcp_spark.cli oracle q_agg_group

`list` needs no Spark session; `explain`/`run` start one lazily.
"""

from __future__ import annotations

import argparse

from sales_data_pipeline_gcp_spark.io import DEFAULT_SF_DIR
from sales_data_pipeline_gcp_spark.plans import registry


def cmd_list(args) -> None:
    for name, q in sorted(registry.all_queries().items()):
        if args.tag and args.tag not in q.tags:
            continue
        kind = "oracle" if q.oracle else "rows-only"
        doc = " ".join((q.doc or "").split())
        print(f"{name:28s} [{kind:9s}] {doc[:90]}")


def cmd_explain(args) -> None:
    from sales_data_pipeline_gcp_spark.session import get_spark

    q = registry.all_queries()[args.name]
    q.fn(get_spark("cli"), args.sf_dir).explain(args.mode)


def cmd_run(args) -> None:
    from sales_data_pipeline_gcp_spark.session import get_spark

    q = registry.all_queries()[args.name]
    q.fn(get_spark("cli"), args.sf_dir).show(args.n, truncate=False)


def cmd_oracle(args) -> None:
    q = registry.all_queries()[args.name]
    print(q.oracle if q.oracle else f"-- {args.name} is rows-only (no SQL oracle)")


def main(argv: list[str] | None = None) -> None:
    p = argparse.ArgumentParser(prog="sales_data_pipeline_gcp_spark.cli", description=__doc__)
    sub = p.add_subparsers(dest="cmd", required=True)

    p_list = sub.add_parser("list", help="list declared queries")
    p_list.add_argument("--tag", default=None)
    p_list.set_defaults(fn=cmd_list)

    for cmd, fn in (("explain", cmd_explain), ("run", cmd_run)):
        sp = sub.add_parser(cmd)
        sp.add_argument("name", choices=sorted(registry.all_queries()))
        sp.add_argument("--sf-dir", default=DEFAULT_SF_DIR)
        if cmd == "explain":
            sp.add_argument("--mode", default="formatted")
        else:
            sp.add_argument("-n", type=int, default=20)
        sp.set_defaults(fn=fn)

    p_oracle = sub.add_parser("oracle", help="print a query's DuckDB oracle SQL")
    p_oracle.add_argument("name", choices=sorted(registry.all_queries()))
    p_oracle.set_defaults(fn=cmd_oracle)

    args = p.parse_args(argv)
    args.fn(args)


if __name__ == "__main__":
    main()
