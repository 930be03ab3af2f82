"""End-to-end remote-fleet data-plane measurement (QPS + the knee).

The reference's reason to exist is batched remote inference ("up to a
million QPS", grpc/README.md:7). scripts/bench_batcher.py isolates the
C++ batcher with a trivial handler; this measures the FULL fleet path on
one box: N `--run_mode=actor` processes stepping synthetic Atari-shaped
host envs, blocking per-step inference over the unix-socket transport,
the native dynamic batcher, the jitted policy on the accelerator, unroll
accumulation and V-trace training on streamed batches.

For each actor count it runs `deploy/run_fleet.py` to a fixed frame
budget and reports env frames/s (one inference ITEM per env frame) and
transport calls/s (one CALL per actor env-batch), timed from the
learner's first logged training step (compile + connect excluded; warm
the persistent compile cache with a small run first).

Usage: python scripts/bench_fleet.py [frame_budget] [actor_counts_csv]
Prints one JSON line per configuration.
"""

import json
import os
import re
import subprocess
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def run_fleet(actors, envs_per_actor, frames, unroll=20):
    cmd = [
        sys.executable, os.path.join(REPO, "deploy", "run_fleet.py"),
        "--agent=vtrace", "--env=synthetic_atari_host",
        "--workers=1", f"--actors_per_worker={actors}",
        f"--envs_per_actor={envs_per_actor}",
        "--",
        f"--unroll_length={unroll}",
        f"--total_environment_frames={frames}",
        "--log_every_steps=5",
    ]
    t_first_step = None
    frames_first = 0
    proc = subprocess.Popen(
        cmd, stdout=subprocess.PIPE, stderr=subprocess.STDOUT,
        text=True, cwd=REPO,
    )
    for line in proc.stdout:
        m = re.search(r"step=\d+ frames=(\d+)", line)
        if m and t_first_step is None:
            t_first_step = time.perf_counter()
            frames_first = int(m.group(1))
    proc.wait()
    t_end = time.perf_counter()
    if proc.returncode != 0 or t_first_step is None:
        raise RuntimeError(
            f"fleet run failed rc={proc.returncode} "
            f"saw_step={t_first_step is not None}"
        )
    elapsed = t_end - t_first_step
    return (frames - frames_first) / elapsed, elapsed


def main():
    frames = int(sys.argv[1]) if len(sys.argv) > 1 else 120_000
    counts = (
        [int(x) for x in sys.argv[2].split(",")]
        if len(sys.argv) > 2
        else [1, 2, 4]
    )
    envs_per_actor = 8
    # Warm the compile cache so measured runs exclude XLA builds.
    run_fleet(1, envs_per_actor, frames=4000)
    for actors in counts:
        fps, elapsed = run_fleet(actors, envs_per_actor, frames)
        print(
            json.dumps(
                {
                    "metric": "fleet_env_frames_per_sec",
                    "actors": actors,
                    "envs_per_actor": envs_per_actor,
                    "value": round(fps, 1),
                    "calls_per_sec": round(fps / envs_per_actor, 1),
                    "window_secs": round(elapsed, 1),
                }
            ),
            flush=True,
        )


if __name__ == "__main__":
    main()
