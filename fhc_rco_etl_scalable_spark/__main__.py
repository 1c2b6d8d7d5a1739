"""Command-line surface: run, list, or explain any catalog query.

    python -m fhc_rco_etl_scalable_spark list
    python -m fhc_rco_etl_scalable_spark run co_sessionize --sf /root/testdata/sf0.01 -n 20
    python -m fhc_rco_etl_scalable_spark explain minhash_lsh
    python -m fhc_rco_etl_scalable_spark site --sf /root/testdata/sf0.01

``site`` runs the full 8-output site pipeline and prints per-output
row counts — the reference's `rco_main` equivalent over the harness
fixtures.
"""

from __future__ import annotations

import argparse
import sys


def main(argv: list[str] | None = None) -> int:
    ap = argparse.ArgumentParser(prog="fhc_rco_etl_scalable_spark")
    sub = ap.add_subparsers(dest="cmd", required=True)

    p_list = sub.add_parser("list", help="list catalog queries")
    p_list.add_argument("--filter", default="", help="substring filter")

    p_run = sub.add_parser("run", help="run one catalog query")
    p_run.add_argument("name")
    p_run.add_argument("--sf", default="/root/testdata/sf0.01")
    p_run.add_argument("-n", type=int, default=10, help="rows to show")

    p_exp = sub.add_parser("explain", help="formatted physical plan")
    p_exp.add_argument("name")
    p_exp.add_argument("--sf", default="/root/testdata/sf0.01")

    p_site = sub.add_parser("site", help="full 8-output site pipeline")
    p_site.add_argument("--sf", default="/root/testdata/sf0.01")

    p_state = sub.add_parser(
        "state",
        help="inspect a streaming checkpoint's state stores "
        "(operators inventory, or one store's rows)",
    )
    p_state.add_argument("checkpoint", help="checkpoint directory")
    p_state.add_argument("--operator", type=int, default=None,
                         help="operatorId: dump that store's rows "
                         "(default: list operator metadata)")
    p_state.add_argument("--batch", type=int, default=None,
                         help="historical batchId snapshot (time travel)")
    p_state.add_argument("-n", type=int, default=20, help="rows to show")

    args = ap.parse_args(argv)

    from .plans import harness_queries as hq

    if args.cmd == "list":
        for name in hq.QUERIES:
            if args.filter in name:
                oracle = "oracle" if name in hq.ORACLES else "rows-only"
                print(f"{name}  [{oracle}]")
        return 0

    if args.cmd in ("run", "explain") and args.name not in hq.QUERIES:
        print(f"unknown query {args.name!r} — see `list`", file=sys.stderr)
        return 2

    from .session import get_spark

    spark = get_spark("cli")
    spark.sparkContext.setLogLevel("ERROR")

    if args.cmd == "state":
        from .streaming.state_inspect import read_state, state_operators

        if args.operator is None:
            state_operators(spark, args.checkpoint).show(truncate=False)
        else:
            read_state(
                spark, args.checkpoint, operator_id=args.operator,
                batch_id=args.batch,
            ).show(args.n, truncate=80)
        return 0

    if args.cmd == "site":
        from .plans.harness_queries import harness_downtime_log
        from .plans.rco_pipeline import SiteParams
        from .plans.site_etl import site_etl

        downtime = harness_downtime_log(spark, args.sf)
        outs = site_etl(downtime, None, SiteParams(server="CLI"))
        for name, df in sorted(outs.items()):
            print(f"{name}: {df.count()} rows")
        return 0

    df = hq.QUERIES[args.name](spark, args.sf)
    if args.cmd == "explain":
        df.explain("formatted")
    else:
        # Bounded driver memory: fetch only n+1 rows (enough to know
        # whether output was truncated) — never collect() the full
        # result, which for a large catalog query could exhaust the
        # driver heap.
        rows = df.limit(args.n + 1).collect()
        truncated = len(rows) > args.n
        spark.createDataFrame(rows[: args.n], df.schema).show(args.n, truncate=80)
        print(f"[showing {min(len(rows), args.n)} rows"
              + (", more exist — raise -n for more]" if truncated else "]"))
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
