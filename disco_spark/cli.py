"""Thin CLI entry points (SURVEY §2.9): the reference's `bin/disco` and
`bin/ddfs` utilities (bin/discocli.py, bin/ddfscli.py) re-expressed over
this engine's surfaces.

Mapping — only verbs with engine-level meaning get code; cluster
lifecycle (start/stop/restart/nodaemon/nodeinfo) is the Spark cluster
manager's job and `disco status` reports the live session instead:

    disco jobs                  -> registered query list (joblist)
    disco run <query> [sf_dir]  -> execute + print rows (run/results/wait)
    disco oracle <query>        -> print the query's DuckDB oracle SQL
    disco status                -> session + statusTracker snapshot
    disco kill <job-group>      -> ops.kill_job (cancelJobGroup)

    ddfs ls [prefix]            -> TagCatalog.list/findtags
    ddfs push <tag> <parquet>   -> TagCatalog.push (spark.read.parquet)
    ddfs cat <tag> [n]          -> TagCatalog.get + show
    ddfs rm <tag>               -> TagCatalog.delete
    ddfs exists <tag>           -> exit code 0/1 (ddfscli.py:206)
    ddfs find <prefix>          -> TagCatalog.findtags
    ddfs link <tag> <child...>  -> TagCatalog.link
    ddfs walk <tag>             -> TagCatalog.walk
    ddfs attrs/setattr/getattr/delattr <tag> ...  -> tag attributes

Both mains accept an injected SparkSession (tests) and build one
lazily otherwise.
"""

from __future__ import annotations

import argparse
import sys


def _spark(injected=None):
    if injected is not None:
        return injected
    from disco_spark.session import get_spark

    return get_spark("disco_spark_cli")


def main_disco(argv: list[str] | None = None, spark=None, out=None) -> int:
    out = out or sys.stdout
    p = argparse.ArgumentParser(prog="disco", description=__doc__.splitlines()[0])
    sub = p.add_subparsers(dest="cmd", required=True)
    sub.add_parser("jobs", help="list registered queries")
    run = sub.add_parser("run", help="execute a registered query and print rows")
    run.add_argument("query")
    run.add_argument("sf_dir", nargs="?", default="/root/testdata/sf0.01")
    run.add_argument("-n", "--rows", type=int, default=20)
    orc = sub.add_parser("oracle", help="print a query's DuckDB oracle SQL")
    orc.add_argument("query")
    sub.add_parser("status", help="live session snapshot")
    kill = sub.add_parser("kill", help="cancel a running job group")
    kill.add_argument("job_group")
    args = p.parse_args(argv)

    from disco_spark.registry import ORACLES, QUERIES, load_all

    load_all()
    if args.cmd == "jobs":
        for name in QUERIES:
            print(f"{name}{'' if name in ORACLES else '  [rows-only]'}", file=out)
        return 0
    if args.cmd == "oracle":
        if args.query not in ORACLES:
            print(f"no oracle for {args.query!r}", file=out)
            return 1
        print(ORACLES[args.query].strip(), file=out)
        return 0
    if args.cmd == "run":
        if args.query not in QUERIES:
            print(f"unknown query {args.query!r} (see `disco jobs`)", file=out)
            return 1
        df = QUERIES[args.query](_spark(spark), args.sf_dir)
        print("\t".join(df.columns), file=out)
        for row in df.limit(args.rows).collect():
            print("\t".join(str(v) for v in row), file=out)
        return 0
    if args.cmd == "status":
        s = _spark(spark)
        tracker = s.sparkContext.statusTracker()
        print(f"appId: {s.sparkContext.applicationId}", file=out)
        print(f"master: {s.sparkContext.master}", file=out)
        print(f"active jobs: {len(tracker.getActiveJobsIds())}", file=out)
        return 0
    if args.cmd == "kill":
        from disco_spark.ops import kill_job

        kill_job(_spark(spark), args.job_group)
        print(f"cancelled job group {args.job_group!r}", file=out)
        return 0
    return 2


def main_ddfs(argv: list[str] | None = None, spark=None, out=None) -> int:
    out = out or sys.stdout
    p = argparse.ArgumentParser(prog="ddfs", description="DDFS tag catalog CLI")
    sub = p.add_subparsers(dest="cmd", required=True)
    ls = sub.add_parser("ls")
    ls.add_argument("prefix", nargs="?", default="")
    push = sub.add_parser("push")
    push.add_argument("tag")
    push.add_argument("paths", nargs="+")
    cat = sub.add_parser("cat")
    cat.add_argument("tag")
    cat.add_argument("-n", "--rows", type=int, default=20)
    for verb in ("rm", "exists", "walk", "attrs"):
        sp = sub.add_parser(verb)
        sp.add_argument("tag")
    find = sub.add_parser("find")
    find.add_argument("prefix")
    link = sub.add_parser("link")
    link.add_argument("tag")
    link.add_argument("children", nargs="+")
    sa = sub.add_parser("setattr")
    sa.add_argument("tag")
    sa.add_argument("key")
    sa.add_argument("value")
    ga = sub.add_parser("getattr")
    ga.add_argument("tag")
    ga.add_argument("key")
    da = sub.add_parser("delattr")
    da.add_argument("tag")
    da.add_argument("key")
    args = p.parse_args(argv)

    from disco_spark.sources.catalog import TagCatalog

    cat_ = TagCatalog(_spark(spark))
    if args.cmd == "ls":
        for t in (cat_.findtags(args.prefix) if args.prefix else cat_.list()):
            print(t, file=out)
    elif args.cmd == "push":
        s = _spark(spark)
        for path in args.paths:
            cat_.push(args.tag, s.read.parquet(path))
        print(f"pushed {len(args.paths)} blob set(s) to {args.tag}", file=out)
    elif args.cmd == "cat":
        df = cat_.get(args.tag)
        print("\t".join(df.columns), file=out)
        for row in df.limit(args.rows).collect():
            print("\t".join(str(v) for v in row), file=out)
    elif args.cmd == "rm":
        cat_.delete(args.tag)
    elif args.cmd == "exists":
        return 0 if cat_.exists(args.tag) else 1
    elif args.cmd == "find":
        for t in cat_.findtags(args.prefix):
            print(t, file=out)
    elif args.cmd == "link":
        cat_.link(args.tag, args.children)
    elif args.cmd == "walk":
        for t in cat_.walk(args.tag):
            print(t, file=out)
    elif args.cmd == "attrs":
        for k, v in cat_.attrs(args.tag).items():
            print(f"{k}\t{v}", file=out)
    elif args.cmd == "setattr":
        cat_.setattr(args.tag, args.key, args.value)
    elif args.cmd == "getattr":
        v = cat_.getattr(args.tag, args.key)
        if v is None:
            return 1
        print(v, file=out)
    elif args.cmd == "delattr":
        cat_.delattr(args.tag, args.key)
    return 0
