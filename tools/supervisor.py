"""Training supervisor: stall detection + automatic resume.

Runs `msgs.apps.train` as a subprocess, watches its log for progress, and on
a stall (no log growth for --stall_sec) kills the process group and restarts
from the newest checkpoint in the model dir. This is the failure-detection /
elastic-recovery layer the reference lacks (SURVEY.md §5) — needed here
because the TPU tunnel occasionally drops a device response, leaving the
host blocked forever on a transfer.

  python tools/supervisor.py --stall_sec 300 -- \
      -s data/synth1 -m data/run_ms --iterations 4000 ...

Everything after `--` is passed to the trainer verbatim;
--checkpoint_iterations should include regular points for resume to work.
"""
import argparse
import glob
import os
import re
import signal
import subprocess
import sys
import time


def latest_checkpoint(model_path: str):
    cands = glob.glob(os.path.join(model_path, "chkpnt*.npz"))
    if not cands:
        return None
    return max(cands, key=lambda p: int(re.search(r"chkpnt(\d+)", p).group(1)))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--stall_sec", type=int, default=300)
    ap.add_argument("--max_restarts", type=int, default=10)
    ap.add_argument("--log", default=None)
    ap.add_argument("train_args", nargs=argparse.REMAINDER)
    args = ap.parse_args()
    train_args = [a for a in args.train_args if a != "--"]

    model_path = None
    for i, a in enumerate(train_args):
        if a in ("-m", "--model_path") and i + 1 < len(train_args):
            model_path = train_args[i + 1]
    assert model_path, "trainer args must include -m <model_path>"
    log_path = args.log or os.path.join(model_path, "supervisor_train.log")
    os.makedirs(model_path, exist_ok=True)

    restarts = 0
    while restarts <= args.max_restarts:
        cmd = [sys.executable, "-m", "msgs.apps.train"] + train_args
        ckpt = latest_checkpoint(model_path)
        if ckpt:
            cmd += ["--start_checkpoint", ckpt]
            print(f"[supervisor] resuming from {ckpt}")
        print(f"[supervisor] launch: {' '.join(cmd)}", flush=True)
        with open(log_path, "ab") as lf:
            proc = subprocess.Popen(cmd, stdout=lf, stderr=lf,
                                    start_new_session=True)
        last_size = -1
        last_progress = time.time()
        while True:
            time.sleep(20)
            ret = proc.poll()
            if ret is not None:
                if ret == 0:
                    print("[supervisor] training finished")
                    return 0
                print(f"[supervisor] trainer exited {ret}; restarting")
                break
            size = os.path.getsize(log_path) if os.path.exists(log_path) else 0
            if size != last_size:
                last_size = size
                last_progress = time.time()
            elif time.time() - last_progress > args.stall_sec:
                print(f"[supervisor] stall > {args.stall_sec}s — killing "
                      f"pgid {proc.pid}", flush=True)
                try:
                    os.killpg(proc.pid, signal.SIGUSR1)  # stack dump to log
                    time.sleep(3)
                    os.killpg(proc.pid, signal.SIGKILL)
                except ProcessLookupError:
                    pass
                proc.wait()
                break
        restarts += 1
        time.sleep(5)
    print(f"[supervisor] giving up after {restarts} restarts")
    return 1


if __name__ == "__main__":
    sys.exit(main())
