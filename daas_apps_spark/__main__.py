"""Engine CLI — the operational front-end a reference user drives.

    python -m daas_apps_spark list [--tag TAG]
    python -m daas_apps_spark show NAME
    python -m daas_apps_spark run NAME [--sf DIR] [--limit N]
    python -m daas_apps_spark verify [NAME ...] [--sf DIR]
    python -m daas_apps_spark table \
        history|read|optimize|compact-vectors|vacuum|delete|update|clone|... PATH

`list`/`show` are metadata-only (no Spark session). `run` executes one
registered query and prints rows; `verify` runs queries on BOTH engines
(PySpark + DuckDB oracle) and reports per-query pass/fail — the same
canonicalized comparison the t2 test suite and the round driver use.

Reference analogy: SparkCaller.main's flag-driven stage selection
(SparkCaller.java:388-426) — here the "stages" are the declared queries
and validation is built into the binary instead of a separate tool run.
"""

from __future__ import annotations

import argparse
import sys

DEFAULT_SF = "/root/testdata/sf0.01"


def _specs():
    from daas_apps_spark.registry import REGISTRY, _load_all

    _load_all()
    return REGISTRY


def cmd_list(args: argparse.Namespace) -> int:
    specs = _specs()
    for name, spec in sorted(specs.items()):
        if args.tag and args.tag not in spec.tags:
            continue
        kind = "oracle" if spec.oracle else "rows-only"
        tags = ",".join(spec.tags)
        print(f"{name:32s} [{kind}] {tags}")
    return 0


def cmd_show(args: argparse.Namespace) -> int:
    specs = _specs()
    if args.name not in specs:
        print(f"unknown query: {args.name}", file=sys.stderr)
        return 2
    spec = specs[args.name]
    print(f"# {spec.name}  tags={','.join(spec.tags)}")
    print(spec.doc or "(no docstring)")
    if spec.oracle:
        print("\n-- DuckDB oracle SQL --")
        print(spec.oracle)
    else:
        print("\n(no oracle: rows-only check)")
    return 0


def cmd_run(args: argparse.Namespace) -> int:
    specs = _specs()
    if args.name not in specs:
        print(f"unknown query: {args.name}", file=sys.stderr)
        return 2
    from daas_apps_spark.session import get_spark

    spark = get_spark(f"daas-run-{args.name}")
    spark.sparkContext.setLogLevel("ERROR")
    df = specs[args.name].fn(spark, args.sf)
    df.show(args.limit, truncate=False)
    return 0


def cmd_explain(args: argparse.Namespace) -> int:
    """Print the optimized logical + executed physical plan of a query —
    the plan-review step a performance engineer runs before shipping a
    new operator (the interactive form of tests/test_plans.py's pinned
    assertions and tools/gen_explain.py's bulk dump)."""
    specs = _specs()
    if args.name not in specs:
        print(f"unknown query: {args.name}", file=sys.stderr)
        return 2
    from daas_apps_spark.operators.partitioning import physical_plan
    from daas_apps_spark.session import get_spark

    spark = get_spark(f"daas-explain-{args.name}")
    spark.sparkContext.setLogLevel("ERROR")
    df = specs[args.name].fn(spark, args.sf)
    if args.mode == "formatted":
        df.explain("formatted")
    else:
        # executed AQE-final plan (runs the query)
        print(physical_plan(df))
    return 0


def cmd_verify(args: argparse.Namespace) -> int:
    from daas_apps_spark.session import get_spark
    from daas_apps_spark.verify import verify_queries

    specs = _specs()
    names = args.names or None
    unknown = [n for n in (names or []) if n not in specs]
    if unknown:
        print(f"unknown queries: {unknown}", file=sys.stderr)
        return 2
    spark = get_spark("daas-verify")
    spark.sparkContext.setLogLevel("ERROR")
    results = verify_queries(spark, args.sf, names)
    n_fail = 0
    for name, err in results.items():
        if err is None:
            print(f"PASS {name}")
        else:
            n_fail += 1
            print(f"FAIL {name}: {err}")
    print(f"{len(results) - n_fail}/{len(results)} passed")
    return 1 if n_fail else 0


def cmd_table(args: argparse.Namespace) -> int:
    """Operate on a versioned table (sources/table_format.py): inspect
    the commit log, read a snapshot (optionally time-traveled), compact,
    or reclaim storage — the lakehouse maintenance surface as CLI."""
    from daas_apps_spark.sources.table_format import VersionedTable

    if args.op == "history":
        from daas_apps_spark.sources.table_format import read_log

        import datetime

        for c in read_log(args.path):
            meta = c.get("metadata") or {}
            extra = f" metadata={meta}" if meta else ""
            when = (
                datetime.datetime.fromtimestamp(
                    c["ts"], tz=datetime.timezone.utc
                ).strftime("%Y-%m-%d %H:%M:%SZ")
                if c.get("ts")
                else " " * 20
            )
            print(
                f"v{c['version']:<4d} {when} {c['operation']:<9s} "
                f"+{len(c['add'])} -{len(c['remove'])}{extra}"
            )
        return 0

    from daas_apps_spark.session import get_spark

    spark = get_spark("daas-table")
    spark.sparkContext.setLogLevel("ERROR")
    vt = VersionedTable(spark, args.path)
    if args.op == "detail":
        for k, v in vt.detail(version=args.version).items():
            print(f"{k}: {v}")
        return 0
    if args.op == "read":
        vt.read(
            version=args.version, as_of=args.as_of, ref=args.ref
        ).show(args.limit, truncate=False)
    elif args.op == "optimize":
        v = vt.optimize(target_partitions=args.target)
        print(f"optimized -> v{v}")
    elif args.op == "restore":
        if args.version is None and not args.ref:
            print("restore requires --version or --ref")
            return 2
        v = vt.restore(version=args.version, ref=args.ref or None)
        print(f"restored to v{args.version or vt.refs()[args.ref]} -> v{v}")
    elif args.op == "compact-vectors":
        v = vt.compact_vectors()
        print(f"vectors compacted -> v{v}")
    elif args.op == "vacuum":
        deleted = vt.vacuum(
            keep_versions=args.keep,
            min_age_seconds=args.min_age,
            dry_run=args.dry_run,
        )
        verb = "would vacuum" if args.dry_run else "vacuumed"
        print(f"{verb} {len(deleted)} dirs: {deleted}")
    elif args.op == "delete":
        if not args.where:
            print("delete requires --where <sql predicate>")
            return 2
        v = vt.delete(args.where, mode=args.mode)
        print(f"deleted ({args.mode}) -> v{v}")
    elif args.op == "update":
        if not args.where or not args.set:
            print("update requires --where <predicate> and --set col=expr")
            return 2
        assignments = dict(kv.split("=", 1) for kv in args.set)
        v = vt.update(args.where, assignments, mode=args.mode)
        print(f"updated ({args.mode}) -> v{v}")
    elif args.op == "clone":
        if not args.dest:
            print("clone requires --dest <path>")
            return 2
        clone = vt.clone_to(args.dest, version=args.version)
        print(f"cloned {args.path}@v{args.version or vt.latest_version()} -> "
              f"{clone.path} (zero-copy)")
    elif args.op == "vacuum-report":
        report = vt.vacuum_report(
            keep_versions=args.keep, min_age_seconds=args.min_age
        )
        for name in report["dirs"]:
            print(f"{report['per_dir'][name]:>14,d} B  {name}")
        print(
            f"would reclaim {report['total_bytes']:,d} bytes across "
            f"{len(report['dirs'])} dirs (nothing deleted)"
        )
    elif args.op == "rename-column":
        if not args.old or not args.new:
            print("rename-column requires --old <name> and --new <name>")
            return 2
        v = vt.rename_column(args.old, args.new)
        print(f"renamed {args.old} -> {args.new} (metadata commit v{v})")
    elif args.op == "drop-column":
        if not args.name:
            print("drop-column requires --name <column>")
            return 2
        v = vt.drop_column(args.name)
        print(f"dropped {args.name} (metadata commit v{v})")
    elif args.op == "widen-column":
        if not args.name or not args.new_type:
            print("widen-column requires --name <column> and --type <ddl>")
            return 2
        v = vt.widen_column(args.name, args.new_type)
        print(f"widened {args.name} -> {args.new_type} (metadata commit v{v})")
    elif args.op == "count":
        # manifest-only: zero data-file opens (A35)
        print(vt.manifest_count(version=args.version))
    elif args.op == "minmax":
        if not args.name:
            print("minmax requires --name <column>")
            return 2
        lo, hi = vt.manifest_min_max(args.name, version=args.version)
        print(f"min={lo} max={hi}  (manifest-only, exact)")
    elif args.op == "sql":
        if not args.statement:
            print("sql requires --statement '<DML or SELECT>'")
            return 2
        from daas_apps_spark.sources.sql_dml import run_sql

        out = run_sql(spark, args.statement, {"t": vt})
        if isinstance(out, int):
            print(f"committed -> v{out}")
        else:
            out.show(args.limit, truncate=False)
    elif args.op == "set-layout":
        if args.clear:
            v = vt.set_layout(None)
            print(f"layout cleared (commit v{v})")
        elif not args.cluster_by:
            print("set-layout requires --cluster-by col[,col...] or --clear")
            return 2
        else:
            cols = [
                c.strip()
                for part in args.cluster_by
                for c in part.split(",")
                if c.strip()
            ]
            v = vt.set_layout(cols, target_files=args.target_files)
            print(f"layout cluster_by={cols} (metadata commit v{v})")
    elif args.op == "protocol":
        print(f"writer features required: {sorted(vt.writer_features())}")
        m = vt.column_mapping()
        if m:
            for f in m["fields"]:
                tail = (
                    ""
                    if f["name"] == f["physical"]
                    else f"  (physical: {f['physical']})"
                )
                print(f"column: {f['name']}{tail}")
            if m.get("dropped"):
                print(f"dropped physicals: {m['dropped']}")
        else:
            print("column mapping: not activated (logical == physical)")
        print(f"layout: {vt.layout()}")
        print(f"stats columns: {vt.stats_columns()}")
    elif args.op == "constraints":
        for name, expr in sorted(vt.constraints().items()):
            print(f"{name}: CHECK ({expr})")
    elif args.op == "tag":
        if not args.name:
            print("tag requires --name")
            return 2
        v = vt.set_ref(args.name, version=args.version)
        print(f"tagged {args.name} -> "
              f"v{args.version or vt.refs()[args.name]} (commit v{v})")
    elif args.op == "refs":
        for name, v in sorted(vt.refs().items()):
            print(f"{name} -> v{v}")
    return 0


def main(argv: list[str] | None = None) -> int:
    p = argparse.ArgumentParser(prog="python -m daas_apps_spark")
    sub = p.add_subparsers(dest="cmd", required=True)

    p_list = sub.add_parser("list", help="list registered queries")
    p_list.add_argument("--tag", help="filter by SURVEY §2 tag (e.g. K3)")
    p_list.set_defaults(fn=cmd_list)

    p_show = sub.add_parser("show", help="docstring + oracle SQL")
    p_show.add_argument("name")
    p_show.set_defaults(fn=cmd_show)

    p_run = sub.add_parser("run", help="execute one query and print rows")
    p_run.add_argument("name")
    p_run.add_argument("--sf", default=DEFAULT_SF)
    p_run.add_argument("--limit", type=int, default=20)
    p_run.set_defaults(fn=cmd_run)

    p_exp = sub.add_parser("explain", help="print a query's physical plan")
    p_exp.add_argument("name")
    p_exp.add_argument("--sf", default=DEFAULT_SF)
    p_exp.add_argument(
        "--mode",
        choices=("formatted", "executed"),
        default="formatted",
        help="formatted = static plan; executed = AQE-final (runs the query)",
    )
    p_exp.set_defaults(fn=cmd_explain)

    p_ver = sub.add_parser("verify", help="compare queries to their oracles")
    p_ver.add_argument("names", nargs="*")
    p_ver.add_argument("--sf", default=DEFAULT_SF)
    p_ver.set_defaults(fn=cmd_verify)

    p_tbl = sub.add_parser("table", help="versioned-table maintenance")
    p_tbl.add_argument(
        "op",
        choices=(
            "history",
            "detail",
            "read",
            "optimize",
            "restore",
            "compact-vectors",
            "vacuum",
            "vacuum-report",
            "delete",
            "update",
            "clone",
            "constraints",
            "protocol",
            "rename-column",
            "drop-column",
            "widen-column",
            "set-layout",
            "count",
            "minmax",
            "sql",
            "tag",
            "refs",
        ),
    )
    p_tbl.add_argument("path")
    p_tbl.add_argument(
        "--dest", default=None, help="destination path for the clone op"
    )
    p_tbl.add_argument(
        "--name", default=None, help="ref name for the tag op"
    )
    p_tbl.add_argument(
        "--ref", default=None, help="read at a named tag (set by tag op)"
    )
    p_tbl.add_argument(
        "--as-of",
        dest="as_of",
        default=None,
        help="read TIMESTAMP AS OF (ISO datetime or epoch seconds)",
    )
    p_tbl.add_argument("--version", type=int, default=None)
    p_tbl.add_argument("--limit", type=int, default=20)
    p_tbl.add_argument("--target", type=int, default=1)
    p_tbl.add_argument(
        "--keep",
        type=int,
        default=2,
        help="versions of time travel to retain (default 2; 0 = latest only)",
    )
    p_tbl.add_argument(
        "--where",
        default=None,
        help="SQL predicate for the delete op (rows matching are removed)",
    )
    p_tbl.add_argument(
        "--set",
        action="append",
        default=None,
        metavar="COL=EXPR",
        help="SET assignment for the update op (repeatable; EXPR is SQL "
        "evaluated against the row's old values)",
    )
    p_tbl.add_argument(
        "--mode",
        choices=("cow", "mor"),
        default="cow",
        help="delete/update strategy: cow rewrites files; mor records a "
        "deletion vector (plus, for update, one new dir of updated rows) "
        "and touches no existing data file (OPTIMIZE purges vectors)",
    )
    p_tbl.add_argument(
        "--dry-run",
        action="store_true",
        help="vacuum: report reclaimable dirs without deleting anything",
    )
    p_tbl.add_argument(
        "--min-age",
        type=float,
        default=3600.0,
        help="spare unreferenced dirs younger than this many seconds "
        "(concurrent-writer safety window; default 1h)",
    )
    p_tbl.add_argument(
        "--old", default=None, help="rename-column: current logical name"
    )
    p_tbl.add_argument(
        "--type",
        dest="new_type",
        default=None,
        help="widen-column: the wider Spark DDL type (e.g. bigint, double)",
    )
    p_tbl.add_argument(
        "--statement",
        default=None,
        help="sql: one DML/query statement; the table binds as name 't' "
        "(MERGE INTO t ... / UPDATE t ... / DELETE FROM t ... / "
        "SELECT ... FROM t [VERSION AS OF n])",
    )
    p_tbl.add_argument(
        "--new", default=None, help="rename-column: new logical name"
    )
    p_tbl.add_argument(
        "--cluster-by",
        action="append",
        default=None,
        metavar="COL[,COL...]",
        help="set-layout: clustering axes for future writes (repeatable)",
    )
    p_tbl.add_argument(
        "--target-files",
        type=int,
        default=None,
        help="set-layout: files per clustered write (default: keep the "
        "incoming partition count)",
    )
    p_tbl.add_argument(
        "--clear",
        action="store_true",
        help="set-layout: clear the declared layout",
    )
    p_tbl.set_defaults(fn=cmd_table)

    args = p.parse_args(argv)
    return args.fn(args)


if __name__ == "__main__":  # pragma: no cover
    sys.exit(main())
