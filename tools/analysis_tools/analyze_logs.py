"""Analyze training logs: timing stats and metric curves.

Counterpart of reference ``tools/analysis_tools/analyze_logs.py`` over this
framework's ``train.log`` format.

Usage:
  python tools/analysis_tools/analyze_logs.py cal_train_time LOG
  python tools/analysis_tools/analyze_logs.py plot_curve LOG --keys loss --out out.png
"""

import argparse
import re
from collections import defaultdict


def parse_log(path):
    """Yield dicts of scalar values per logged train iteration."""
    pattern = re.compile(r"(\w+): ([-+eE0-9.]+)")
    epoch_pat = re.compile(r"Epoch \[(\d+)\]\[(\d+)/(\d+)\]")
    for line in open(path):
        m = epoch_pat.search(line)
        if not m:
            continue
        record = dict(epoch=int(m.group(1)), iter=int(m.group(2)))
        for key, value in pattern.findall(line):
            try:
                record[key] = float(value)
            except ValueError:
                pass
        yield record


def cal_train_time(args):
    times = defaultdict(list)
    for rec in parse_log(args.log):
        if "step_time" in rec:
            times[rec["epoch"]].append(rec["step_time"])
    all_times = [t for v in times.values() for t in v]
    if not all_times:
        print("no timing records found")
        return
    for epoch, vals in sorted(times.items()):
        print(f"epoch {epoch}: mean step_time {sum(vals) / len(vals):.4f}s")
    print(f"overall: mean {sum(all_times) / len(all_times):.4f}s over {len(all_times)} records")


def plot_curve(args):
    import matplotlib

    matplotlib.use("Agg")
    import matplotlib.pyplot as plt

    records = list(parse_log(args.log))
    plt.figure(figsize=(8, 5))
    for key in args.keys:
        xs = [i for i, r in enumerate(records) if key in r]
        ys = [r[key] for r in records if key in r]
        plt.plot(xs, ys, label=key)
    plt.xlabel("log step")
    plt.legend()
    plt.grid(True, alpha=0.3)
    out = args.out or "curve.png"
    plt.savefig(out, dpi=120, bbox_inches="tight")
    print(f"saved {out}")


def main():
    parser = argparse.ArgumentParser()
    sub = parser.add_subparsers(dest="task", required=True)
    p1 = sub.add_parser("cal_train_time")
    p1.add_argument("log")
    p2 = sub.add_parser("plot_curve")
    p2.add_argument("log")
    p2.add_argument("--keys", nargs="+", default=["loss"])
    p2.add_argument("--out", default=None)
    args = parser.parse_args()
    if args.task == "cal_train_time":
        cal_train_time(args)
    else:
        plot_curve(args)


if __name__ == "__main__":
    main()
