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


def run_fleet(actors, envs_per_actor, frames, unroll=16, platform=None,
              run_id=0):
    # MuJoCo-class fleet (MLP policy, small payloads): the workload shape
    # of the reference's QPS claim. A conv policy turns this into a
    # policy-compute benchmark on a 2-CPU box (measured: 18 fps), and the
    # tunneled TPU adds ~1.6 s per remote execution — neither measures
    # the data plane.
    logdir = f"/tmp/seed_rl_tpu/fleet_bench/{platform}_{actors}a_{run_id}"
    cmd = [
        sys.executable, os.path.join(REPO, "deploy", "run_fleet.py"),
        "--agent=vtrace", "--env=mujoco",
        "--workers=1", f"--actors_per_worker={actors}",
        f"--envs_per_actor={envs_per_actor}",
        f"--logdir={logdir}",
        "--",
        "--env_name=HalfCheetah-v5",
        f"--unroll_length={unroll}",
        f"--total_environment_frames={frames}",
        "--log_every_steps=5",
    ]
    env = dict(os.environ)
    if platform:
        # platform="cpu" measures the transport + batcher + policy
        # pipeline without the tunneled TPU's ~1.6 s per-execution
        # round-trip (measured round 4; a host-attached chip serves an
        # inference batch in single-digit ms, the relay cannot).
        env["JAX_PLATFORMS"] = platform
    t_first_step = None
    t_last_step = None
    frames_first = 0
    frames_last = 0
    total_batches = 0.0
    proc = subprocess.Popen(
        cmd, stdout=subprocess.PIPE, stderr=subprocess.STDOUT,
        text=True, cwd=REPO, env=env,
    )
    line_frames = 0
    for line in proc.stdout:
        m = re.search(r"step=\d+ frames=(\d+)", line)
        if m:
            # Window = first..last training log line, so learner/actor
            # teardown (reconnect backoff, thread joins) after the final
            # frame does not deflate the fps.
            if t_first_step is None:
                t_first_step = time.perf_counter()
                frames_first = int(m.group(1))
            t_last_step = time.perf_counter()
            frames_last = int(m.group(1))
        # NOTE: the logger prints metric values with {:.4g}, so
        # total_batches appears as e.g. '1.234e+04' past 10k — parse as
        # float, not (\d+).
        b = re.search(r"server/total_batches=([0-9.e+]+)", line)
        if m and b:
            # frames and batches from the SAME line: cumulative at the
            # same instant, so their ratio is the exact mean fill (to
            # the logger's 4 significant digits).
            line_frames = int(m.group(1))
            total_batches = float(b.group(1))
    proc.wait()
    t_proc_end = time.perf_counter()
    if proc.returncode != 0 or t_first_step is None:
        raise RuntimeError(
            f"fleet run failed rc={proc.returncode} "
            f"saw_step={t_first_step is not None}"
        )
    if frames_last > frames_first:
        elapsed = t_last_step - t_first_step
        moved = frames_last - frames_first
    else:
        # Only one throttled console line landed (short run): fall back
        # to the process-exit window. Includes teardown — use a frame
        # budget large enough for >= 2 log lines (>60 s) for clean fps.
        elapsed = t_proc_end - t_first_step
        moved = frames - frames_first
    # Mean batcher fill (occupancy): env frames == inference items.
    occupancy = line_frames / total_batches if total_batches else None
    return moved / elapsed, elapsed, occupancy


def main():
    frames = int(sys.argv[1]) if len(sys.argv) > 1 else 120_000
    counts = (
        [int(x) for x in sys.argv[2].split(",")]
        if len(sys.argv) > 2
        else [1, 2, 4]
    )
    platform = os.environ.get("FLEET_BENCH_PLATFORM", "cpu")
    envs_per_actor = 8
    # Warm the compile cache so measured runs exclude XLA builds.
    run_fleet(1, envs_per_actor, frames=4000, platform=platform)
    for i, actors in enumerate(counts):
        fps, elapsed, occupancy = run_fleet(
            actors, envs_per_actor, frames, platform=platform,
            run_id=i + 1,
        )
        print(
            json.dumps(
                {
                    "metric": "fleet_env_frames_per_sec",
                    "platform": platform,
                    "actors": actors,
                    "envs_per_actor": envs_per_actor,
                    "value": round(fps, 1),
                    # One transport call per env frame (actors issue
                    # concurrent per-env calls), so inference QPS == fps.
                    "inference_qps": round(fps, 1),
                    "batcher_mean_fill": (
                        round(occupancy, 1) if occupancy else None
                    ),
                    "window_secs": round(elapsed, 1),
                }
            ),
            flush=True,
        )


if __name__ == "__main__":
    main()
