"""Training-log analysis (reference tools/analyze_logs.py): parses the
runner's train.log, prints per-key stats and optionally plots curves.

Usage: python tools/analyze_logs.py LOG [--keys loss loss_mask] [--out f.png]
"""

from __future__ import annotations

import argparse
import re
from collections import defaultdict


LINE_RE = re.compile(r"Epoch \[(\d+)\]\[(\d+)\] time: ([\d.]+)s, (.*)")


def parse_log(path):
    runs = defaultdict(list)
    with open(path) as f:
        for line in f:
            m = LINE_RE.search(line)
            if not m:
                continue
            epoch, it, t = int(m.group(1)), int(m.group(2)), float(m.group(3))
            runs["epoch"].append(epoch)
            runs["iter"].append(it)
            runs["time"].append(t)
            for kv in m.group(4).split(", "):
                k, v = kv.split(": ")
                runs[k].append(float(v))
    return runs


def main():
    p = argparse.ArgumentParser()
    p.add_argument("log")
    p.add_argument("--keys", nargs="+", default=["loss"])
    p.add_argument("--out", default=None)
    args = p.parse_args()
    runs = parse_log(args.log)
    if not runs:
        print("no train iterations found")
        return
    n = len(runs["time"])
    print(f"{n} logged iterations, avg iter time {sum(runs['time']) / n:.3f}s")
    for k in args.keys:
        if k not in runs:
            print(f"{k}: not logged")
            continue
        v = runs[k]
        print(f"{k}: first {v[0]:.4f}  last {v[-1]:.4f}  min {min(v):.4f}")
    if args.out:
        import matplotlib

        matplotlib.use("Agg")
        import matplotlib.pyplot as plt

        for k in args.keys:
            if k in runs:
                plt.plot(runs[k], label=k)
        plt.legend()
        plt.xlabel("logged step")
        plt.savefig(args.out)
        print(f"saved {args.out}")


if __name__ == "__main__":
    main()
