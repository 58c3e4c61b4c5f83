#!/usr/bin/env python
"""Batch driver for the zflip method-comparison runs.

Port of reference scenes/run.py (the zoharl3 fork's experiment driver:
clears the output root, runs zflip.py once per method index, tees each
run's log next to its outputs, and stops early when a run exits without
leaving a log). The Windows-only pieces (copy_log.bat, keyboard pauses,
ConEmu color plumbing, MATLAB log relocation) have no TPU-host analog and
are dropped; the contract kept is: methods list -> one zflip run each,
per-run log file, graceful-exit check, nonzero exit on failure.

Usage:
    python scenes/run.py [out_dir] [frames] [res] [obstacle] [mesh]

obstacle (default 1=moving; 0=none, 2=static) and mesh (default 1 =
per-frame upres .bobj.gz surfaces next to each run's log) are forwarded
to zflip.py — the flagship configuration of the reference scene
(zflip.py:255-262 b_fluid_mesh/bSaveMesh defaults, moving obstacle).

Method indices match run.py:10-13 / zflip.py: 0=FLIP, 1=FIXED_VOL,
2=CORRECT19 (DE_GOES22 / MATLAB_FLIP are not shipped by the fork's binary
either; see PARITY.md §2.14).
"""
import os
import shutil
import subprocess
import sys
from pathlib import Path

#   0       1          2
# FLIP, FIXED_VOL, CORRECT19   (reference run.py:10-13)
methods = [0, 2, 1]   # all shipped methods (reference default is [1])

HERE = Path(__file__).resolve().parent
script = HERE / "zflip.py"


def run(method: int, out_dir: Path, frames: int, res: int,
        obstacle: int = 1, mesh: int = 1) -> bool:
    """One zflip run; returns True if it ended gracefully (exit 0 AND the
    teed log holds zflip's final summary line — the tee itself creates the
    file, so mere existence can't signal a graceful exit)."""
    out_dir.mkdir(parents=True, exist_ok=True)
    log = out_dir / "_log.txt"   # reference: _log.ans (ANSI tee)
    cmd = [sys.executable, str(script), str(method), str(frames), str(res),
           str(obstacle), str(mesh)]
    print(" ".join(cmd))
    with open(log, "w") as f:
        # cwd=out_dir so any files zflip grows later land next to its log
        proc = subprocess.Popen(cmd, stdout=subprocess.PIPE,
                                stderr=subprocess.STDOUT, text=True,
                                cwd=out_dir)
        for line in proc.stdout:
            sys.stdout.write(line)
            f.write(line)
        proc.wait()
    print()
    graceful = "zflip method=" in log.read_text()  # zflip.py's last line
    return proc.returncode == 0 and graceful


def main() -> int:
    out_root = Path(sys.argv[1] if len(sys.argv) > 1 else HERE / "out")
    frames = int(sys.argv[2]) if len(sys.argv) > 2 else 20
    res = int(sys.argv[3]) if len(sys.argv) > 3 else 32
    obstacle = int(sys.argv[4]) if len(sys.argv) > 4 else 1
    mesh = int(sys.argv[5]) if len(sys.argv) > 5 else 1

    names = {0: "flip", 1: "fixed_vol", 2: "correct19"}

    # clear previous results under the output root (reference run.py:52-68),
    # but ONLY entries this driver itself creates (<method>_<name> dirs and
    # their logs) — a mistyped out_dir must not destroy unrelated data
    ours = {f"{m}_{n}" for m, n in names.items()}
    if out_root.exists():
        for path in out_root.iterdir():
            if path.is_dir() and path.name in ours:
                shutil.rmtree(path)
            elif not path.is_dir() and path.name.startswith("_log"):
                path.unlink()
            else:
                print(f"leaving unrecognized entry alone: '{path}'")
    for method in methods:
        out_dir = out_root / f"{method}_{names.get(method, 'method')}"
        ok = run(method, out_dir, frames, res, obstacle, mesh)
        log = out_dir / "_log.txt"
        if not ok or not log.exists():
            print(f"log doesn't exist or run failed (premature exit): "
                  f"'{log}'")
            return -1

    print("run.py is done")
    return 0


if __name__ == "__main__":
    sys.exit(main())
