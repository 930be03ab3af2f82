#!/bin/bash
# The reference's DmLab V-trace/IMPALA config (gcp/train_dmlab.sh; SEED
# paper §A.1 hyperparameters), mapped onto this framework's CLI.
# Uses the ImpalaDeep resnet torso (models/resnets.py). Needs deepmind_lab.
set -euo pipefail
LEVEL=${1:-explore_goal_locations_small}
LOGDIR=${LOGDIR:-/tmp/seed_rl_tpu/dmlab_vtrace_${LEVEL}}

exec python -m seed_rl_tpu.train \
    --agent=vtrace --env=dmlab --game="$LEVEL" \
    --num_envs=512 --unroll_length=32 \
    --learning_rate=4e-4 --clip_norm=40 \
    --lr_decay_multiplier=0 --adam_beta1=0 --adam_epsilon=3.125e-7 \
    --discounting=0.99 --entropy_cost=0.0025 \
    --total_environment_frames=10000000000 \
    --logdir="$LOGDIR" "${@:2}"
