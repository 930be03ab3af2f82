#!/bin/bash
# The reference's R2D2 Atari cloud config (gcp/train_atari.sh:24-111),
# mapped onto this framework's CLI.
#
# Reference knobs: 640 envs (32 workers x 20 actors), batch 64, unroll 80,
# burn-in 40, replay 100k unrolls (min 5k), replay_ratio 0.75, lr 1e-4,
# clip_norm 80, 50e9 frames, 30 eval actors, eval epsilon 1e-3.
#
# replay_ratio mapping: the reference inserts batch/replay_ratio unrolls per
# training batch; here replay_ratio = train_batches_per_step * batch_size /
# num_training_envs. With 640 training envs + batch 64:
#   train_batches_per_step = ceil(0.75 * (640-30) / 64) ~= 7.
#
# Needs ale_py for real Atari; substitute --env=synthetic_atari to exercise
# the identical device path on synthetic frames.
set -euo pipefail
GAME=${1:-Pong}
LOGDIR=${LOGDIR:-/tmp/seed_rl_tpu/atari_r2d2_${GAME}}

exec python -m seed_rl_tpu.train \
    --agent=r2d2 --env=atari --game="$GAME" \
    --num_envs=640 --num_eval_envs=30 \
    --unroll_length=80 --burn_in=40 \
    --batch_size=64 --train_batches_per_step=7 \
    --replay_buffer_size=100000 --replay_buffer_min_size=5000 \
    --learning_rate=1e-4 --clip_norm=80 \
    --discounting=0.997 --n_steps=5 \
    --update_target_every_n_step=2500 \
    --total_environment_frames=50000000000 \
    --logdir="$LOGDIR" "${@:2}"
