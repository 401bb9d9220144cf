"""Run any registered engine query (or ad-hoc SQL) from the command line.

Usage:
    python tools/run_query.py flagship_last3_rolling
    python tools/run_query.py dedup_minhash_lsh --sf-dir /root/testdata/sf0.1
    python tools/run_query.py --list
    python tools/run_query.py --sql "SELECT count(*) FROM lineitem" --show 5
    python tools/run_query.py join_topk_orders --explain

Tables region/nation/customer/supplier/part/orders/lineitem/events/
documents/embeddings are registered as temp views for --sql.
"""

from __future__ import annotations

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from streaming_data_pipeline_capstone_spark.registry import all_oracles, all_queries
from streaming_data_pipeline_capstone_spark.session import get_spark
from streaming_data_pipeline_capstone_spark.sources.readers import register_views


def main() -> None:
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("name", nargs="?", help="registered query name")
    ap.add_argument("--sf-dir", default=os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.01"))
    ap.add_argument("--sql", help="run this SQL against the registered table views instead")
    ap.add_argument("--show", type=int, default=20, help="rows to display (0 = count only)")
    ap.add_argument("--explain", action="store_true", help="print the formatted physical plan")
    ap.add_argument("--list", action="store_true", help="list registered queries and exit")
    args = ap.parse_args()

    if args.list:
        oracles = all_oracles()
        for name in sorted(all_queries()):
            print(f"{name}{'' if name in oracles else '  [no-oracle]'}")
        return

    spark = get_spark(app_name="run-query")
    if args.sql:
        register_views(spark, args.sf_dir)
        df = spark.sql(args.sql)
    elif args.name:
        qs = all_queries()
        if args.name not in qs:
            sys.exit(f"unknown query {args.name!r} — try --list")
        df = qs[args.name](spark, args.sf_dir)
    else:
        sys.exit("give a query name, --sql, or --list")

    if args.explain:
        df.explain("formatted")
    t0 = time.perf_counter()
    n = df.count()
    dt = time.perf_counter() - t0
    if args.show:
        df.show(args.show, truncate=False)
    print(f"{n} rows in {dt:.2f}s  (sf_dir={args.sf_dir})")
    spark.stop()


if __name__ == "__main__":
    main()
