"""Summarize a measured acceptance run (tools/acceptance_run.sh) for PERF.md.

Parses the train log's per-step `X.XXs/it` stamps (host wall-clock between
optimizer steps, remesh + preload + logging included), splits them by stage
boundary (epoch lines), and projects the FULL reference schedule
(config.conf: medium @6, fine @12, 200 epochs; train.py:29-61) from the
measured per-stage rates.  Also echoes errors.txt / Chamfer if present.

Usage: python tools/accept_report.py DATA_ROOT [--epochs-total 200]
"""
from __future__ import annotations

import argparse
import os.path as osp
import re
import sys

import numpy as np

STEP_RE = re.compile(r"([0-9.]+)s/it")
EPOCH_RE = re.compile(r"\((\d+)/(\d+)\): loss")


def parse_log(path: str):
    """-> list of (epoch, s_per_it) in log order (epoch = current epoch idx)."""
    out = []
    epoch = 0
    with open(path) as f:
        for line in f:
            m = EPOCH_RE.search(line)
            if m:
                epoch = int(m.group(1))
            m = STEP_RE.search(line)
            if m:
                out.append((epoch, float(m.group(1))))
    return out


def stage_of(epoch: int, medium: int, fine: int) -> str:
    if epoch < medium:
        return "coarse"
    if epoch < fine:
        return "medium"
    return "fine"


def main(argv=None):
    ap = argparse.ArgumentParser()
    ap.add_argument("root")
    ap.add_argument("--epochs-total", type=int, default=200)
    ap.add_argument("--medium", type=int, default=6)
    ap.add_argument("--fine", type=int, default=12)
    ap.add_argument("--frames", type=int, default=450)
    a = ap.parse_args(argv)

    log = osp.join(a.root, "train.log")
    samples = parse_log(log)
    if not samples:
        print("no s/it samples found in", log)
        return 1

    stages = {"coarse": [], "medium": [], "fine": []}
    for ep, s in samples:
        stages[stage_of(ep, a.medium, a.fine)].append(s)

    # steps per epoch at the reference batch sizes 3/2/1
    batch = {"coarse": 3, "medium": 2, "fine": 1}
    spe = {k: int(np.ceil(a.frames / b)) for k, b in batch.items()}
    total_s = 0.0
    print(f"{'stage':8s} {'steps':>7s} {'mean s/it':>10s} {'median':>8s} "
          f"{'p90':>8s}  measured-from")
    for st in ("coarse", "medium", "fine"):
        xs = np.array(stages[st])
        n_ep = ({"coarse": a.medium, "medium": a.fine - a.medium,
                 "fine": a.epochs_total - a.fine}[st])
        n_steps = n_ep * spe[st]
        if xs.size:
            # drop compile steps: anything > 20x the median is a (re)compile
            med = np.median(xs)
            steady = xs[xs < 20 * med]
            mean = steady.mean()
            total_s += n_steps * mean
            print(f"{st:8s} {xs.size:7d} {mean:10.3f} {np.median(steady):8.3f} "
                  f"{np.percentile(steady, 90):8.3f}  {xs.size} measured steps"
                  f" ({xs.size - steady.size} compile-spike excluded)")
        else:
            print(f"{st:8s} {0:7d} {'--':>10s} {'--':>8s} {'--':>8s}  "
                  "NOT MEASURED (schedule truncated before this stage)")
            total_s = float("nan")
    print(f"\nfull {a.epochs_total}-epoch schedule at measured rates: "
          f"{total_s / 3600.0:.2f} h "
          f"({a.medium}x{spe['coarse']} + {a.fine - a.medium}x{spe['medium']}"
          f" + {a.epochs_total - a.fine}x{spe['fine']} steps)")

    err = osp.join(a.root, "rec", "errors.txt")
    if osp.exists(err):
        with open(err) as f:
            lines = f.read().strip().splitlines()
        print("\nerrors.txt:", lines[-1] if lines else "(empty)")
    return 0


if __name__ == "__main__":
    sys.exit(main())
