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
EPOCH_TOOK_RE = re.compile(r"epoch (\d+) took ([0-9.]+)s")


def parse_log(path: str):
    """-> (steps, epochs): steps = [(epoch, s_per_it)...] deduped per
    (epoch, step) — resumed runs append (tee -a) and redo part of an epoch,
    so the LAST sample for a given (epoch, step) wins — and
    epochs = {epoch: wall_s} (same last-wins rule)."""
    samples = {}
    epochs = {}
    epoch, di = 0, -1
    with open(path) as f:
        for line in f:
            m = EPOCH_RE.search(line)
            if m:
                epoch, di = int(m.group(1)), int(m.group(2))
            m = EPOCH_TOOK_RE.search(line)
            if m:
                epochs[int(m.group(1))] = float(m.group(2))
                continue
            m = STEP_RE.search(line)
            if m:
                samples[(epoch, di)] = float(m.group(1))
    return [(e, s) for (e, _), s in sorted(samples.items())], epochs


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
    samples, epoch_wall = parse_log(log)
    if not samples:
        print("no s/it samples found in", log)
        return 1

    stages = {"coarse": [], "medium": [], "fine": []}
    for ep, s in samples:
        stages[stage_of(ep, a.medium, a.fine)].append(s)
    ewall = {"coarse": [], "medium": [], "fine": []}
    for ep, s in sorted(epoch_wall.items()):
        ewall[stage_of(ep, a.medium, a.fine)].append((ep, s))

    # steps per epoch at the reference batch sizes 3/2/1.  floor, not ceil:
    # the device-cached iterator drops partial groups (cli/train.py
    # `len(g) == bs`).
    batch = {"coarse": 3, "medium": 2, "fine": 1}
    spe = {k: a.frames // b for k, b in batch.items()}
    # the trainer loop is range(start, nepoch + 1) -> nepoch + 1 epochs total
    n_epochs = {"coarse": a.medium, "medium": a.fine - a.medium,
                "fine": a.epochs_total + 1 - a.fine}
    total_s = 0.0
    print(f"{'stage':8s} {'epochs':>7s} {'wall s/step':>12s} "
          f"{'dt-mean':>8s} {'dt-med':>8s}  notes")
    for st in ("coarse", "medium", "fine"):
        xs = np.array(stages[st])
        ew = ewall[st]
        n_steps = n_epochs[st] * spe[st]
        if ew:
            # epoch wall-clock is the honest rate (remesh + rejits + ckpt
            # saves included).  median epoch = steady rate; one-time overhead
            # counts ONLY clear outlier epochs (> 1.5x steady: compiles and
            # rejits), not ordinary variance — attributing ALL above-median
            # mass to compile double-counted noise.
            walls = np.array([s for _, s in ew])
            steady_epoch = float(np.median(walls))
            rate = steady_epoch / spe[st]
            rejit = walls[walls > 1.5 * steady_epoch]
            one_time = float((rejit - steady_epoch).sum())
            total_s += n_steps * rate + one_time
            dts = (f"{xs.mean():8.3f} {np.median(xs):8.3f}" if xs.size
                   else f"{'--':>8s} {'--':>8s}")
            print(f"{st:8s} {len(ew):7d} {rate:12.3f} {dts}  "
                  f"{spe[st]} steps/epoch, one-time (compile) ~{one_time:.0f}s"
                  f" over {rejit.size} epochs")
        else:
            print(f"{st:8s} {0:7d} {'--':>12s} {'--':>8s} {'--':>8s}  "
                  "NOT MEASURED (schedule truncated before this stage)")
            total_s = float("nan")
    print(f"\nfull {a.epochs_total + 1}-epoch schedule at measured rates: "
          f"{total_s / 3600.0:.2f} h "
          f"({n_epochs['coarse']}x{spe['coarse']} + "
          f"{n_epochs['medium']}x{spe['medium']} + "
          f"{n_epochs['fine']}x{spe['fine']} steps)")

    err = osp.join(a.root, "rec", "errors.txt")
    if osp.exists(err):
        with open(err) as f:
            lines = f.read().strip().splitlines()
        print("\nerrors.txt:", lines[-1] if lines else "(empty)")
    return 0


if __name__ == "__main__":
    sys.exit(main())
