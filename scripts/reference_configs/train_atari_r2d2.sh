#!/bin/bash
# The reference's R2D2 Atari cloud config (gcp/train_atari.sh:24-111),
# mapped onto this framework's CLI.
#
# Reference knobs: 640 envs (32 workers x 20 actors), batch 64, unroll 80,
# burn-in 40, replay 100k unrolls (min 5k), replay_ratio 0.75, lr 1e-4,
# clip_norm 80, 50e9 frames, 30 eval actors, eval epsilon 1e-3.
#
# --env=atari runs the host pipeline: thread-pooled ALE stepping, host-RAM
# replay at the full 100k-unroll scale (>85 GB — the reference's learner-RAM
# buffer, gcp/train_atari.sh:28-33), and the replay-ratio contract applied
# directly (--replay_ratio=0.75 = reference insertion_batch
# batch/replay_ratio, r2d2 learner.py:113-117).
#
# Needs ale_py for real Atari; substitute --env=synthetic_atari_host to
# exercise the identical host pipeline on synthetic frames (or
# --env=synthetic_atari for the fused on-device path, where
# train_batches_per_step expresses the ratio instead).
set -euo pipefail
GAME=${1:-Pong}
LOGDIR=${LOGDIR:-/tmp/seed_rl_tpu/atari_r2d2_${GAME}}

exec python -m seed_rl_tpu.train \
    --agent=r2d2 --env=atari --game="$GAME" \
    --num_envs=640 --num_eval_envs=30 \
    --unroll_length=80 --burn_in=40 \
    --batch_size=64 --replay_ratio=0.75 \
    --replay_buffer_size=100000 --replay_buffer_min_size=5000 \
    --learning_rate=1e-4 --clip_norm=80 \
    --discounting=0.997 --n_steps=5 \
    --update_target_every_n_step=2500 \
    --total_environment_frames=50000000000 \
    --logdir="$LOGDIR" "${@:2}"
