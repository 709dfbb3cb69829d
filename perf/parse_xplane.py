"""Summarize a jax.profiler trace (xplane.pb) into top HLO ops by self-time.

Usage: python perf/parse_xplane.py /tmp/prof_r3 [--tool hlo_stats] [--top 40]

Runs entirely on the host (no JAX import); uses the installed `xprof`
converter to turn the raw XSpace into the hlo_stats / op_profile table and
prints an aggregated view: total device time, top ops by self-time, and a
category rollup (fusion / convolution / custom-call / copy / etc.) with
launch counts — the launch count is the number we care about on this
runtime, where per-kernel dispatch is ~40-180us.
"""

from __future__ import annotations

import argparse
import collections
import csv
import glob
import io
import json
import os
import sys


def find_xplanes(root: str):
    hits = glob.glob(os.path.join(root, "**", "*.xplane.pb"), recursive=True)
    if not hits:
        sys.exit(f"no *.xplane.pb under {root}")
    return sorted(hits)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("trace_dir")
    ap.add_argument("--tool", default="hlo_stats")
    ap.add_argument("--top", type=int, default=40)
    ap.add_argument("--raw", action="store_true", help="dump raw converter output")
    args = ap.parse_args()

    from xprof.convert import raw_to_tool_data as r2t

    paths = find_xplanes(args.trace_dir)
    print(f"# xplanes: {paths}")
    data, _ = r2t.xspace_to_tool_data(paths, args.tool, {})
    if isinstance(data, bytes):
        data = data.decode("utf-8", "replace")
    if args.raw:
        print(data)
        return

    # hlo_stats returns gviz-style JSON ({cols:[...], rows:[...]}) or CSV
    # depending on version; handle both.
    rows, cols = [], []
    try:
        obj = json.loads(data)
        cols = [c["label"] for c in obj["cols"]]
        for row in obj["rows"]:
            rows.append([c.get("v") if isinstance(c, dict) else c for c in row["c"]])
    except Exception:
        rdr = csv.reader(io.StringIO(data))
        cols = next(rdr)
        rows = list(rdr)
    print(f"# columns: {cols}")

    def col(*names):
        for n in names:
            for i, c in enumerate(cols):
                if n.lower() in str(c).lower():
                    return i
        return None

    i_name = col("hlo op name", "op name", "name")
    i_cat = col("category")
    i_self = col("total self time (us)", "self time (us)", "self-time", "self time")
    i_occ = col("#occurrences", "occurrences", "count")
    # jax autodiff leaves its trail in the framework op path ("Framework op
    # name" column): backward ops live under a "transpose(jvp(Module))"
    # scope, remat recomputes under "rematted_computation", and the
    # optimizer update carries the optax op names. Used by the train-step
    # rollup below; absent in some xprof versions (falls back gracefully).
    i_expr = col("framework op name", "tf op name", "op expression")
    if i_self is None or i_name is None:
        print(data[:4000])
        sys.exit("could not locate name/self-time columns; raw dump above")

    def fnum(v):
        try:
            return float(v)
        except Exception:
            return 0.0

    total = sum(fnum(r[i_self]) for r in rows)
    print(f"# rows: {len(rows)}  total self time: {total/1e3:.2f} ms")

    by_cat = collections.Counter()
    occ_by_cat = collections.Counter()
    for r in rows:
        cat = r[i_cat] if i_cat is not None else "?"
        by_cat[cat] += fnum(r[i_self])
        occ_by_cat[cat] += int(fnum(r[i_occ])) if i_occ is not None else 1
    print("\n== category rollup (self us, launches) ==")
    for cat, us in by_cat.most_common():
        print(f"{us/1e3:10.2f} ms  {occ_by_cat[cat]:8d} launches  {cat}")

    # semantic rollup: attribute self-time to the model-level subsystem so
    # the README's MFU accounting can itemize >=90% of step time
    def bucket(name: str, cat: str) -> str:
        n = name.lower()
        c = str(cat).lower()
        if "fwd_kernel" in n or "flash" in n:
            return "flash-attention kernel"
        if "geglu" in n:
            return "geglu-ffn kernel"
        if "stats_kernel" in n or "apply_kernel" in n or "group_norm" in n:
            return "group-norm kernel"
        if "unpack_rows" in n:
            return "emb-row unpack kernel"
        if "convolution" in c or n.startswith(("conv", "%conv")) or "conv" in n:
            return "convolution (+fused elementwise)"
        if "copy" in c or "copy" in n:
            return "layout copy"
        if "custom-call" in c:
            return "other custom-call"
        if "all-reduce" in c or "collective" in c:
            return "collective"
        if "dot" in n or "gemm" in n or "matmul" in n:
            return "matmul (+fused elementwise)"
        return "other fusion/elementwise"

    by_bucket = collections.Counter()
    occ_by_bucket = collections.Counter()
    for r in rows:
        b = bucket(str(r[i_name]), r[i_cat] if i_cat is not None else "?")
        by_bucket[b] += fnum(r[i_self])
        occ_by_bucket[b] += int(fnum(r[i_occ])) if i_occ is not None else 1
    print("\n== semantic rollup (self us, launches) ==")
    for b, us in by_bucket.most_common():
        print(f"{us/1e3:10.2f} ms  {100*us/max(total,1):5.1f}%  "
              f"{occ_by_bucket[b]:8d} launches  {b}")

    # train-step rollup (VERDICT r4 next #4): split every semantic bucket by
    # autodiff direction and by model module using the framework op path.
    # "transpose(jvp(M))" marks M's VJP cotangent graph, ops additionally
    # under "rematted_computation" are jax.checkpoint recomputes, and
    # optax/adam names mark the optimizer update.
    def direction(expr: str) -> str:
        e = expr.lower()
        if any(s in e for s in ("adamw", "adam/", "scale_by_adam", "optax",
                                "apply_updates", "update_moment", "lamb/")):
            return "optimizer"
        if "transpose(" in e:
            if "rematted_computation" in e:
                return "bwd-remat"
            return "bwd"
        return "fwd"

    def module(expr: str) -> str:
        # innermost jvp(Module) scope names the subsystem
        last = None
        for part in expr.split("/"):
            if "jvp(" in part:
                last = part[part.rindex("jvp(") + 4:].rstrip(")")
        return last or "glue"

    if i_expr is not None:
        by_dir = collections.Counter()
        by_mod = collections.Counter()
        for r in rows:
            b = bucket(str(r[i_name]), r[i_cat] if i_cat is not None else "?")
            e = str(r[i_expr])
            d = direction(e)
            by_dir[(d, b)] += fnum(r[i_self])
            by_mod[(direction(e), module(e))] += fnum(r[i_self])
        print("\n== train-direction x bucket rollup (self us) ==")
        for (d, b), us in by_dir.most_common():
            print(f"{us/1e3:10.2f} ms  {100*us/max(total,1):5.1f}%  {d:10s} {b}")
        print("\n== train-direction x module rollup (self us) ==")
        for (d, m), us in by_mod.most_common():
            print(f"{us/1e3:10.2f} ms  {100*us/max(total,1):5.1f}%  {d:10s} {m}")

    print(f"\n== top {args.top} ops by self time ==")
    srt = sorted(rows, key=lambda r: -fnum(r[i_self]))
    for r in srt[: args.top]:
        occ = int(fnum(r[i_occ])) if i_occ is not None else -1
        cat = r[i_cat] if i_cat is not None else "?"
        name = str(r[i_name])[:110]
        print(f"{fnum(r[i_self])/1e3:10.2f} ms  x{occ:<6d} {cat:<18} {name}")


if __name__ == "__main__":
    main()
