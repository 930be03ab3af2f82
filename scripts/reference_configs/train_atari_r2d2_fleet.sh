#!/bin/bash
# The reference's R2D2 Atari cloud DATA-PLANE shape (gcp/train_atari.sh:
# 24-111): one learner serving inference + training, 32 workers x 20
# actors = 640 envs stepping ALE in separate processes — mapped onto this
# framework's fleet orchestrator and the off-policy remote learner
# (--run_mode=learner serves epsilon-by-env-id inference, stores
# burn-in-overlapped unrolls of training envs into host-RAM replay at the
# 100k-unroll scale, trains under replay_ratio 0.75).
#
# The sibling train_atari_r2d2.sh steps all 640 envs in ONE process
# (config parity, simplest launch); this script is data-plane parity: env
# stepping scales across actor processes so the learner's chip never
# starves behind Python env stepping.
#
# Needs ale_py for real Atari; substitute --env=synthetic_atari_host to
# exercise the identical fleet on synthetic frames.
set -euo pipefail
GAME=${1:-Pong}
LOGDIR=${LOGDIR:-/tmp/seed_rl_tpu/atari_r2d2_fleet_${GAME}}
WORKERS=${WORKERS:-32}
ACTORS_PER_WORKER=${ACTORS_PER_WORKER:-4}
ENVS_PER_ACTOR=${ENVS_PER_ACTOR:-5}

exec python deploy/run_fleet.py \
    --agent=r2d2 --env=atari \
    --workers="$WORKERS" --actors_per_worker="$ACTORS_PER_WORKER" \
    --envs_per_actor="$ENVS_PER_ACTOR" \
    --logdir="$LOGDIR" \
    -- \
    --game="$GAME" \
    --num_eval_envs=30 \
    --unroll_length=80 --burn_in=40 \
    --batch_size=64 --replay_ratio=0.75 \
    --replay_buffer_size=100000 --replay_buffer_min_size=5000 \
    --learning_rate=1e-4 --clip_norm=80 \
    --discounting=0.997 --n_steps=5 \
    --update_target_every_n_step=2500 \
    --total_environment_frames=50e9 \
    "${@:2}"
