#!/usr/bin/env python
"""Supervisor for the train CLI: restart-from-checkpoint on wedged transport.

Completes the failure-recovery loop that --hang_watchdog_secs starts
(train/loop.py HangWatchdog): the watchdog exits 66 when the device
transport drops a dispatched call (in-process recovery is impossible —
any device op would itself hang); this supervisor relaunches the SAME
training command with --resume_from <output_dir>/checkpoints so the run
continues from the last rotated checkpoint. The reference has no
equivalent: train_hybrid.py blocks forever on a dropped CUDA call and
its README tells the user to restart by hand.

Policy:
  - exit 0: training finished; supervisor exits 0.
  - exit 66 (HangWatchdog.EXIT_CODE): relaunch with --resume_from, up to
    --max_restarts times, after --backoff_secs (a wedged relay needs time
    to recover; observed ~minutes on this host).
  - any other exit: a real error (bad flags, data, OOM) — restarting
    would loop forever on the same failure; propagate it.

Usage: python tools/supervise_train.py [--max_restarts 5]
           [--backoff_secs 60] -- <train CLI args...>
e.g.   python tools/supervise_train.py -- --data_dir corpus
           --output_dir runs/x --hang_watchdog_secs 900 ...
(--hang_watchdog_secs is required in the train args: without it a wedged
run never exits, and the supervisor — by design — only watches exit
codes, it does not duplicate the in-process heartbeat.)
"""

from __future__ import annotations

import argparse
import subprocess
import sys
import time

HANG_EXIT = 66  # train/loop.py HangWatchdog.EXIT_CODE


def split_args(argv):
    if "--" not in argv:
        raise SystemExit("usage: supervise_train.py [opts] -- <train args>")
    i = argv.index("--")
    return argv[:i], argv[i + 1:]


def train_flag(train_args, name):
    """Value of --name in the train arg list (both '--k v' and '--k=v')."""
    for j, a in enumerate(train_args):
        if a == f"--{name}" and j + 1 < len(train_args):
            return train_args[j + 1]
        if a.startswith(f"--{name}="):
            return a.split("=", 1)[1]
    return None


def main(argv=None) -> int:
    sup_argv, train_args = split_args(
        sys.argv[1:] if argv is None else argv)
    ap = argparse.ArgumentParser()
    ap.add_argument("--max_restarts", type=int, default=5)
    ap.add_argument("--backoff_secs", type=float, default=60.0)
    opts = ap.parse_args(sup_argv)

    out_dir = train_flag(train_args, "output_dir")
    if out_dir is None:
        raise SystemExit("train args must include --output_dir (the "
                         "supervisor resumes from <output_dir>/checkpoints)")
    if train_flag(train_args, "hang_watchdog_secs") in (None, "0", "0.0"):
        raise SystemExit("train args must arm --hang_watchdog_secs; without "
                         "it a wedged run never exits and the supervisor "
                         "has nothing to act on")

    cmd_base = [sys.executable, "-m", "lunaris_orion_tpu.cli.train"]
    restarts = 0
    args = list(train_args)
    while True:
        rc = subprocess.call(cmd_base + args)
        if rc != HANG_EXIT:
            return rc
        restarts += 1
        if restarts > opts.max_restarts:
            print(f"supervise_train: hang-exit {HANG_EXIT} again after "
                  f"{opts.max_restarts} restarts — giving up", file=sys.stderr)
            return HANG_EXIT
        print(f"supervise_train: watchdog exit {HANG_EXIT}; restart "
              f"{restarts}/{opts.max_restarts} from {out_dir}/checkpoints "
              f"in {opts.backoff_secs:.0f}s", file=sys.stderr, flush=True)
        time.sleep(opts.backoff_secs)
        # Resume from the run's own checkpoints; drop any prior
        # --resume_from so the SECOND restart doesn't resume from the
        # original (stale) source.
        stripped, skip = [], False
        for a in args:
            if skip:
                skip = False
                continue
            if a == "--resume_from":
                skip = True
                continue
            if a.startswith("--resume_from="):
                continue
            stripped.append(a)
        args = stripped + ["--resume_from", f"{out_dir}/checkpoints"]


if __name__ == "__main__":
    sys.exit(main())
