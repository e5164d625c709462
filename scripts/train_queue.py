#!/usr/bin/env python3
"""Sequential TPU training queue with crash-resume.

Runs `python -m tfpnp_tpu` jobs one at a time (the tunneled chip is
exclusive; CLAUDE.md), retrying through chip-wedge windows. On a failed
attempt it resumes from the NEWEST checkpoint the crashed run left
behind (step_*.pkl / interrupted.pkl / best.pkl — a crashed run never
writes final.pkl, so probing only for final.pkl would silently retrain
from scratch).

Usage:
  python scripts/train_queue.py JOB [JOB ...] [--bench] [--ship]
where JOB is task:solver[:scale][:steps], e.g.
  python scripts/train_queue.py deblur:admm sr:admm:2 --bench --ship
--ship extracts each finished job's best checkpoint into the shipped
policy registry (scripts/ship_policy.py naming).
"""

import argparse
import subprocess
import sys
import time
from pathlib import Path

ROOT = Path(__file__).resolve().parent.parent

COMMON = ["--env_batch", "48", "--rmsize", "480", "--warmup", "20",
          "--max_episode_step", "6", "--action_pack", "5",
          "--episode_train_times", "10", "--validate_interval", "50",
          "--save_freq", "300", "-lp", "0.05", "-le", "0.05"]


def newest_checkpoint(exp: str):
    ckpt_dir = ROOT / "logs" / exp / "ckpt"
    if not ckpt_dir.is_dir():
        return None
    cands = [p for p in ckpt_dir.iterdir()
             if p.name.startswith(("step_", "interrupted", "best"))]
    return max(cands, key=lambda p: p.stat().st_mtime) if cands else None


def run_watched(cmd, log_file, stall_timeout: float) -> int:
    """Failure detection: run ``cmd``, watching the job's own log for
    progress. The tunneled chip can stall a transfer for ~20 min and
    recover (CLAUDE.md), so only a log silent for ``stall_timeout``
    seconds counts as hung — then the exact child PID is terminated
    (never pattern-kills) and the caller resumes from its newest
    checkpoint. SIGTERM first so the trainer writes interrupted.pkl."""
    proc = subprocess.Popen(cmd, cwd=ROOT)
    while True:
        try:
            return proc.wait(timeout=60)
        except subprocess.TimeoutExpired:
            pass
        try:
            age = time.time() - log_file.stat().st_mtime
        except OSError:
            age = 0.0
        if age > stall_timeout:
            print(f"=== watchdog: log silent {age / 60:.0f} min; "
                  f"terminating pid {proc.pid} ===", flush=True)
            proc.terminate()
            try:
                proc.wait(timeout=120)
            except subprocess.TimeoutExpired:
                proc.kill()
                proc.wait()
            return 124


def run_job(spec: str, ship: bool = False,
            stall_timeout: float = 2400.0, warm: bool = False,
            denoiser_ckpt: str = None, exp_suffix: str = "",
            lp: float = None) -> bool:
    parts = spec.split(":")
    task, solver = parts[0], parts[1]
    scale = parts[2] if len(parts) > 2 and parts[2] else None
    steps = parts[3] if len(parts) > 3 else "2400"
    # SPI follows the reference's 1-action-pack, 10-step protocol
    # (tasks/spi/script.sh); everything else is 5x6
    pack, ep = ("1", "10") if task == "spi" else ("5", "6")
    exp = (f"{task}{scale if task == 'sr' and scale else ''}"
           f"_{solver}_{pack}x{ep}_48{exp_suffix}")
    cmd = [sys.executable, "-m", "tfpnp_tpu", "--task", task,
           "--solver", solver, "--exp", exp, "--train_steps", steps] + COMMON
    cmd += ["--action_pack", pack, "--max_episode_step", ep]
    if lp is not None:
        # stronger stopping pressure for band-straggler retrains: the
        # loop penalty enters q_cont, so a higher lp opens the stop head
        # earlier (trainer.py exact two-action target); appended AFTER
        # COMMON so it overrides the default -lp 0.05
        cmd += ["-lp", str(lp)]
    if task == "sr" and scale:
        cmd += ["--scale", scale]
    if warm:
        # warm-start the actor from the currently shipped policy: quality
        # is already converged, so the run only has to learn stopping.
        # 100 critic-only episodes first — a fresh critic's V-gradients
        # otherwise degrade the donor ~1.5 dB before converging
        cmd += ["--init_actor", "auto", "--actor_warmup", "100"]
    if denoiser_ckpt:
        cmd += ["--denoiser_ckpt", denoiser_ckpt]
    log_file = ROOT / "logs" / exp / "log.txt"
    for attempt in (1, 2, 3):
        resume = newest_checkpoint(exp) if attempt > 1 else None
        extra = ["-r", str(resume)] if resume else []
        print(f"=== {exp} attempt {attempt}"
              + (f" (resume {resume.name})" if resume else "") + " ===",
              flush=True)
        if run_watched(cmd + extra, log_file, stall_timeout) == 0:
            print(f"=== {exp} OK ===", flush=True)
            if ship:
                best = ROOT / "logs" / exp / "ckpt" / "best.pkl"
                if best.exists():
                    # registry convention (tasks/sr.py solver_name_for):
                    # x2 is the plain sr family, x3/x4 are suffixed
                    fam = task if not (task == "sr" and scale
                                       and scale != "2") else f"sr{scale}"
                    name = f"{fam}_{solver}_{pack}x{ep}"
                    subprocess.run(
                        [sys.executable, "scripts/ship_policy.py",
                         str(best), name], cwd=ROOT)
            return True
        print(f"=== {exp} failed; waiting out possible chip wedge ===",
              flush=True)
        time.sleep(300)
    print(f"=== {exp} FAILED after 3 attempts ===", flush=True)
    return False


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("jobs", nargs="+", help="task:solver[:scale][:steps]")
    ap.add_argument("--bench", action="store_true",
                    help="run bench.py after the queue")
    ap.add_argument("--ship", action="store_true",
                    help="ship each job's best checkpoint to the registry")
    ap.add_argument("--stall_timeout", type=float, default=2400.0,
                    help="seconds of log silence before a run counts as "
                         "hung (tunnel stalls of ~20 min self-recover)")
    ap.add_argument("--warm", action="store_true",
                    help="warm-start each actor from its shipped policy "
                         "(--init_actor auto): stop-head retrains need a "
                         "fraction of the from-scratch steps")
    ap.add_argument("--denoiser_ckpt", type=str, default=None,
                    help="prior checkpoint for training (e.g. the "
                         "TPU-shaped s2d denoiser)")
    ap.add_argument("--exp_suffix", type=str, default="",
                    help="log-dir suffix so retrains never collide with "
                         "(or crash-resume from) a previous era's ckpts")
    ap.add_argument("--lp", type=float, default=None,
                    help="override the loop penalty (default 0.05): "
                         "higher values push band-straggler stop heads "
                         "to open earlier")
    args = ap.parse_args()
    for spec in args.jobs:
        run_job(spec, ship=args.ship, stall_timeout=args.stall_timeout,
                warm=args.warm, denoiser_ckpt=args.denoiser_ckpt,
                exp_suffix=args.exp_suffix, lp=args.lp)
    if args.bench:
        subprocess.run([sys.executable, "bench.py"], cwd=ROOT)
    print("=== queue complete ===", flush=True)


if __name__ == "__main__":
    main()
