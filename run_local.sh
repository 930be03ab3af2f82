#!/bin/bash
# Local launcher — the equivalent of the reference's run_local.sh
# (/root/reference/run_local.sh: "./run_local.sh <env> <agent> <num_actors>
# <envs_per_actor>"). The TPU-native design needs no actor fleet or tmux:
# envs are vectorized on device (or in a host thread pool), so one process
# is the whole system. num_envs plays the role of num_actors *
# envs_per_actor.
#
# Usage: ./run_local.sh <environment> <agent> [num_envs] [extra train.py flags...]
#   environment: toy | toy_memory | discrete_match | bit_flipping |
#                synthetic_atari | mujoco | atari
#   agent:       vtrace | ppo | r2d2 | sac
#
# Examples:
#   ./run_local.sh toy vtrace 256
#   ./run_local.sh mujoco ppo 128 --env_name=HalfCheetah-v5 --unroll_length=16
#   ./run_local.sh synthetic_atari r2d2 64 --unroll_length=80 --burn_in=40
set -euo pipefail

ENVIRONMENT=${1:?usage: run_local.sh <environment> <agent> [num_envs] [flags...]}
AGENT=${2:?usage: run_local.sh <environment> <agent> [num_envs] [flags...]}
NUM_ENVS=${3:-64}
shift $(( $# < 3 ? 2 : 3 ))

LOGDIR=${LOGDIR:-/tmp/seed_rl_tpu/${ENVIRONMENT}_${AGENT}}
mkdir -p "$LOGDIR"
echo "Logs/checkpoints/TensorBoard events -> $LOGDIR"

exec python -m seed_rl_tpu.train \
    --agent="$AGENT" \
    --env="$ENVIRONMENT" \
    --num_envs="$NUM_ENVS" \
    --logdir="$LOGDIR" \
    "$@"
