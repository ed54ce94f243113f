"""TPU job runner: multihost init + elastic requeue loop.

The Slurm-equivalent of the reference's scripts/slurm/submit_train.py (sbatch
with SIGUSR1@120 + Lightning auto_requeue, SURVEY.md §5.3): on TPU pods each
host runs the same command; jax.distributed.initialize() picks coordinates
from the TPU metadata.  This wrapper:

  * enables multi-host jax.distributed.initialize() in the child trainer
    (FAST3R_TPU_DISTRIBUTED=1) when TPU pod env vars exist;
  * runs the training CLI, forwarding SIGTERM so the trainer checkpoints;
  * restarts (requeues) the run up to --max-restarts times on nonzero exit,
    resuming from the last checkpoint — the elastic-recovery loop.

Usage (same on every host of the slice):
  python scripts/tpu_run.py --max-restarts 100 -- \
      --experiment super_long_training [overrides...]
"""

import argparse
import os
import signal
import subprocess
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--max-restarts", type=int, default=100)
    ap.add_argument("--restart-delay", type=float, default=10.0)
    ap.add_argument("train_args", nargs=argparse.REMAINDER)
    args = ap.parse_args()
    train_args = [a for a in args.train_args if a != "--"]

    cmd = [sys.executable, "-m", "fast3r_tpu.cli.train"] + train_args
    env = os.environ.copy()
    # TPU pod slices expose worker metadata; tell the trainer to join the
    # jax.distributed coordination service (it must happen in the child,
    # before its first device op)
    if any(k in env for k in ("TPU_WORKER_ID", "CLOUD_TPU_TASK_ID",
                              "MEGASCALE_COORDINATOR_ADDRESS")):
        env.setdefault("FAST3R_TPU_DISTRIBUTED", "1")

    for attempt in range(args.max_restarts + 1):
        print(f"[tpu_run] attempt {attempt}: {' '.join(cmd)}", flush=True)
        proc = subprocess.Popen(cmd, env=env)

        def forward(signum, frame):
            # give the trainer its checkpoint-and-exit window (the sbatch
            # --signal=SIGUSR1@120 analog)
            proc.send_signal(signal.SIGUSR1)

        signal.signal(signal.SIGTERM, forward)
        signal.signal(signal.SIGUSR1, forward)
        code = proc.wait()
        if code == 0:
            print("[tpu_run] training finished")
            return 0
        print(f"[tpu_run] exited with {code}; requeueing in "
              f"{args.restart_delay}s", flush=True)
        time.sleep(args.restart_delay)
    print("[tpu_run] max restarts exceeded")
    return 1


if __name__ == "__main__":
    raise SystemExit(main())
