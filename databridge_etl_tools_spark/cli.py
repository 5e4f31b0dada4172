"""CLI surface mirroring the reference's command-group UX
(databridge_etl_tools/cli.py registers click groups ``postgres,
carto, ago, …`` with subcommands extract/load/upsert). Here the
groups collapse onto the engine's store-agnostic pipelines; argparse
keeps the container dependency-free.

    python -m databridge_etl_tools_spark table extract --store WH --table t --out OUT
    python -m databridge_etl_tools_spark table load    --store WH --table t --csv IN --schema S.json [--mode truncate|append|rename_replace]
    python -m databridge_etl_tools_spark table upsert  --store WH --table t --csv IN --schema S.json [--delete-stale]
    python -m databridge_etl_tools_spark query run --name pricing_summary --sf-dir /root/testdata/sf0.01
    python -m databridge_etl_tools_spark query list
"""

from __future__ import annotations

import argparse
import json
import sys


def _build_parser() -> argparse.ArgumentParser:
    p = argparse.ArgumentParser(prog="databridge_etl_tools_spark")
    sub = p.add_subparsers(dest="group", required=True)

    t = sub.add_parser("table", help="store-backed table lifecycle")
    tsub = t.add_subparsers(dest="cmd", required=True)

    def common(sp):
        sp.add_argument("--store", required=True, help="table-store root dir")
        sp.add_argument("--table", required=True)

    ext = tsub.add_parser("extract")
    common(ext)
    ext.add_argument("--out", required=True, help="output CSV dir")
    ext.add_argument("--exclude", nargs="*", default=None)
    ext.add_argument("--no-localize", action="store_true")

    for name in ("load", "upsert"):
        sp = tsub.add_parser(name)
        common(sp)
        sp.add_argument("--csv", required=True)
        sp.add_argument("--schema", required=True, help="JSON Table Schema file")
        if name == "load":
            sp.add_argument(
                "--mode", default="truncate", choices=["truncate", "append", "rename_replace"]
            )
            sp.add_argument("--column-mapping", default=None, help="JSON dict old->new")
        else:
            sp.add_argument("--delete-stale", action="store_true")

    mnt = tsub.add_parser("maintain", help="compact + vacuum a table")
    common(mnt)
    mnt.add_argument("--target-partitions", type=int, default=None)

    hst = tsub.add_parser("history", help="list the table's commit log")
    common(hst)

    rst = tsub.add_parser("restore", help="roll back to a logged commit")
    common(rst)
    rst.add_argument("--commit", type=int, required=True,
                     help="0-based commit index; negative counts from the end")

    q = sub.add_parser("query", help="registry queries")
    qsub = q.add_subparsers(dest="cmd", required=True)
    qsub.add_parser("list")
    run = qsub.add_parser("run")
    run.add_argument("--name", required=True)
    run.add_argument("--sf-dir", default="/root/testdata/sf0.01")
    run.add_argument("--limit", type=int, default=20)
    run.add_argument(
        "--layout",
        action="store_true",
        help="serve the query from the optimized physical layouts",
    )
    exp = qsub.add_parser("explain", help="print a query's physical plan")
    exp.add_argument("--name", required=True)
    exp.add_argument("--sf-dir", default="/root/testdata/sf0.01")
    exp.add_argument(
        "--mode",
        default="formatted",
        choices=["simple", "extended", "codegen", "cost", "formatted"],
    )
    exp.add_argument(
        "--layout",
        action="store_true",
        help="plan against the optimized physical layouts",
    )

    lay = sub.add_parser("layout", help="optimized physical layouts")
    lsub = lay.add_subparsers(dest="cmd", required=True)
    lb = lsub.add_parser("build")
    lb.add_argument("--sf-dir", default="/root/testdata/sf0.01")
    lb.add_argument("--out-dir", default=None)
    lz = lsub.add_parser(
        "zorder", help="write a z-order-clustered copy of a parquet table"
    )
    lz.add_argument("--input", required=True)
    lz.add_argument("--out", required=True)
    lz.add_argument("--cols", required=True, help="comma-separated cluster columns")
    lz.add_argument("--files", type=int, default=16)
    lz.add_argument("--normalize", choices=("width", "quantile"), default="width")
    lz.add_argument(
        "--curve",
        choices=("morton", "hilbert"),
        default="morton",
        help="hilbert (2 columns only) gives tighter per-file boxes",
    )
    return p


def main(argv: list[str] | None = None) -> int:
    args = _build_parser().parse_args(argv)

    from .registry import QUERIES, load_all

    if args.group == "layout":
        from .session import get_session

        if args.cmd == "zorder":
            from .operators.zorder import file_column_ranges, write_zordered

            spark = get_session("cli")
            cols = [c.strip() for c in args.cols.split(",") if c.strip()]
            df = spark.read.parquet(args.input)
            write_zordered(
                df,
                args.out,
                cols,
                n_files=args.files,
                normalize=args.normalize,
                curve=args.curve,
            )
            print(
                json.dumps(
                    {"out": args.out, "cols": cols,
                     "files": len(file_column_ranges(args.out, cols))}
                )
            )
            return 0
        from . import layout

        layout.build_all(get_session("cli"), args.sf_dir, args.out_dir)
        print(json.dumps({"built": args.sf_dir, "cached_reuse": True}))
        return 0

    if args.group == "query":
        load_all()
        if args.cmd == "list":
            for name in sorted(QUERIES):
                print(name)
            return 0
        from .session import get_session

        spark = get_session("cli")
        if getattr(args, "layout", False):
            from . import layout

            layout.build_all(spark, args.sf_dir)
        df = QUERIES[args.name](spark, args.sf_dir)
        if args.cmd == "explain":
            df.explain(mode=args.mode)
            return 0
        out = [r.asDict() for r in df.limit(args.limit).collect()]
        print(json.dumps(out, default=str, indent=2))
        return 0

    from .plans import pipelines as P
    from .schema import TableSchema
    from .session import get_session
    from .sources.table_store import TableStore

    spark = get_session("cli")
    store = TableStore(spark, args.store)

    if args.cmd == "history":
        print(json.dumps(store.history(args.table), indent=2))
        return 0

    if args.cmd == "restore":
        store.restore(args.table, args.commit)
        print(json.dumps({"restored": args.table, "commit": args.commit,
                          "rows": store.read(args.table).count()}))
        return 0

    if args.cmd == "maintain":
        parts = store.compact(args.table, args.target_partitions)
        removed = store.vacuum(args.table)
        print(json.dumps({"partitions": parts, "vacuumed": removed}))
        return 0

    if args.cmd == "extract":
        res = P.extract_pipeline(
            spark,
            store,
            args.table,
            args.out,
            exclude_fields=args.exclude,
            localize_timestamps=not args.no_localize,
        )
        print(json.dumps({"rows": res.rows, "csv": res.csv_path}))
        schema_path = args.out.rstrip("/") + ".schema.json"
        with open(schema_path, "w") as f:
            f.write(res.schema_json)
        return 0

    schema = TableSchema.from_json(open(args.schema).read())
    if args.cmd == "load":
        mapping = json.loads(args.column_mapping) if args.column_mapping else None
        res = P.load_pipeline(
            spark, args.csv, schema, store, args.table, mode=args.mode, column_mapping=mapping
        )
        print(json.dumps({"rows_loaded": res.rows_loaded, "recreated": res.recreated}))
        return 0
    if args.cmd == "upsert":
        res = P.upsert_pipeline(
            spark, args.csv, schema, store, args.table, delete_stale_rows=args.delete_stale
        )
        print(json.dumps({"staged": res.staged, "final_count": res.final_count}))
        return 0
    return 2


if __name__ == "__main__":
    sys.exit(main())
