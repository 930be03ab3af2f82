"""Training entry point: ``python -m seed_rl_tpu.train --agent=... --env=...``.

Replaces the reference's per-env mains ({atari,dmlab,football,mujoco}/
{vtrace,r2d2,sac,ppo}_main.py + run_local.sh): one typed-config CLI covering
every agent × environment combination, with factory-injection seams
(create_env / create_agent / create_optimizer) preserved for programmatic
use. The learner is the single source of configuration truth (the
reference's serialize_config/update_config push to actors applies only to
the external-actor runtime).

Examples:
  # PR-1 reference config (BASELINE.json): toy env + V-trace MLP (CPU ok).
  python -m seed_rl_tpu.train --agent=vtrace --env=toy \
      --num_envs=64 --unroll_length=10 --total_environment_frames=200000

  # HalfCheetah PPO, tuned ppo.gin equivalents (MuJoCo on host CPU).
  python -m seed_rl_tpu.train --agent=ppo --env=mujoco \
      --env_name=HalfCheetah-v5 --num_envs=128 --unroll_length=16 \
      --epochs_per_step=10 --batches_per_step=32 --learning_rate=3e-4 \
      --clip_norm=0.5 --total_environment_frames=2000000

  # Synthetic-Atari R2D2 on device (throughput/learning harness).
  python -m seed_rl_tpu.train --agent=r2d2 --env=synthetic_atari \
      --num_envs=64 --unroll_length=80 --burn_in=40
"""

import argparse
import functools
import math
import os

import jax

# Honor an explicit JAX_PLATFORMS env var even when a container
# sitecustomize pre-forced a platform through jax.config at interpreter
# start (config normally wins over the env var, which silently reroutes
# "CPU" runs to remote hardware).
if os.environ.get("JAX_PLATFORMS"):
    try:
        import jax._src.xla_bridge as _xb

        if not _xb.backends_are_initialized():
            jax.config.update(
                "jax_platforms", os.environ["JAX_PLATFORMS"]
            )
    except Exception:  # pragma: no cover - private API drift
        pass

import jax.numpy as jnp
import numpy as np
import optax


def parse_args(argv=None):
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--agent", required=True,
                   choices=["vtrace", "ppo", "r2d2", "sac"])
    p.add_argument("--run_mode", default="train",
                   choices=["train", "eval", "profile", "actor", "learner"],
                   help="eval = restore from --logdir/--init_checkpoint and "
                        "run deterministic-policy evaluation (reference "
                        "run_eval / eval actors); profile = capture a "
                        "jax.profiler device trace of the hot training loop "
                        "into <logdir>/profile (reference profiling "
                        "subsystem, SURVEY.md §5); actor = env-stepping "
                        "process calling a remote learner's socket server "
                        "(reference --run_mode=actor); learner = serve "
                        "inference at --server_address and train on "
                        "streamed unrolls (reference --run_mode=learner)")
    p.add_argument("--server_address", default="/tmp/seed_rl_tpu.sock",
                   help="unix socket path for actor/learner run modes")
    p.add_argument("--env_id_offset", type=int, default=0,
                   help="actor mode: first env id of this process "
                        "(reference env_id = task*env_batch_size+i)")
    p.add_argument("--num_actor_steps", type=int, default=0,
                   help="actor mode: stop after N env steps (0 = forever)")
    p.add_argument("--inference_batch_size", type=int, default=0,
                   help="learner mode: dynamic batch size; 0 = reference "
                        "auto-tune max(1, num_envs/2)")
    p.add_argument("--eval_episodes", type=int, default=32)
    p.add_argument("--profile_calls", type=int, default=5,
                   help="train_many calls captured by --run_mode=profile")
    p.add_argument("--env", required=True,
                   choices=["toy", "toy_memory", "discrete_match",
                            "bit_flipping", "synthetic_atari",
                            "synthetic_atari_host", "catch",
                            "catch_continuous", "mujoco",
                            "atari", "dmlab", "football"],
                   help="synthetic_atari_host = Atari-shaped host gym envs "
                        "(exercises the full host pipeline: thread-pooled "
                        "stepping, host-RAM replay) without ale_py")
    p.add_argument("--env_name", default="HalfCheetah-v5")
    p.add_argument("--game", default="Pong")
    p.add_argument("--logdir", default=None)
    # Scientific notation tolerant: deploy docs and reference launch
    # scripts pass frame budgets like 1e9 (gcp/train_atari.sh uses 50e9).
    p.add_argument("--total_environment_frames",
                   type=lambda s: int(float(s)), default=1_000_000)
    p.add_argument("--num_envs", type=int, default=64)
    p.add_argument("--unroll_length", type=int, default=20)
    p.add_argument("--learning_rate", type=float, default=3e-4)
    p.add_argument("--lr_decay_multiplier", type=float, default=1.0,
                   help="linear lr decay to lr_decay_multiplier*lr over "
                        "the frame budget (reference PolynomialDecay, "
                        "dmlab/vtrace_main.py:46-50, mujoco/ppo_main.py:"
                        "86-91; 1.0 = constant lr)")
    p.add_argument("--adam_beta1", type=float, default=0.9,
                   help="reference dmlab V-trace uses 0")
    p.add_argument("--adam_epsilon", type=float, default=1e-8,
                   help="reference dmlab V-trace uses 3.125e-7")
    p.add_argument("--clip_norm", type=float, default=40.0)
    p.add_argument("--discounting", type=float, default=0.99)
    p.add_argument("--entropy_cost", type=float, default=2.5e-4)
    p.add_argument("--lambda_", type=float, default=0.95)
    p.add_argument("--save_checkpoint_secs", type=float, default=1800)
    p.add_argument("--init_checkpoint", default=None)
    p.add_argument("--checkpoint_replay", action="store_true",
                   help="host-env off-policy agents: snapshot the host-RAM "
                        "replay buffer under <logdir>/replay on the "
                        "checkpoint cadence and restore it on resume. The "
                        "reference cannot do this (its buffer is RAM-only; "
                        "a restart refills from current-policy data, "
                        "gcp/train_atari.sh:28-33)")
    p.add_argument("--steps_per_call", type=int, default=10)
    p.add_argument("--log_every_steps", type=int, default=20)
    p.add_argument("--num_replicas", type=int, default=0,
                   help="0 = all local devices (data parallelism)")
    p.add_argument("--debug_asserts", action="store_true",
                   help="enable on-device contract checks in the fused "
                        "paths (replay index bounds, priority validity) "
                        "via jax.experimental.checkify; compiled out "
                        "entirely when off (SURVEY §5 race-detection row)")
    p.add_argument("--conv_net", default="auto",
                   choices=["auto", "atari", "impala_deep"],
                   help="conv torso for pixel envs under --agent=vtrace: "
                        "auto picks the env's reference net (Nature-DQN "
                        "for Atari-class, ImpalaDeep for DmLab); "
                        "impala_deep forces the DmLab-class deep resnet "
                        "(reference dmlab/networks.py:63-171) on any "
                        "pixel env, e.g. --env=catch for a real on-device "
                        "learning curve with the DmLab net")
    p.add_argument("--remat_torso", action="store_true",
                   help="rematerialize the ImpalaDeep resnet torso in the "
                        "backward pass (jax.checkpoint): ~8x smaller "
                        "activation footprint for ~1/3 extra torso FLOPs, "
                        "so one chip trains 2-4x larger env batches "
                        "(measured: [33,512] DmLab batch needs 17.5 GB "
                        "without remat, fits 1024 envs with it)")
    # PPO.
    p.add_argument("--epochs_per_step", type=int, default=10)
    p.add_argument("--batch_mode", default=None,
                   choices=[None, "repeat", "shuffle", "split",
                            "split_with_advantage_recomputation"],
                   help="default: split for stateless nets, shuffle for "
                        "recurrent ones (split modes forbid recurrent "
                        "state — reference ppo_training_step_utils)")
    p.add_argument("--batches_per_step", type=int, default=32)
    p.add_argument("--policy_loss", default="ppo",
                   choices=["ppo", "vmpo", "awr", "pg", "vtrace"],
                   help="on-policy loss family (reference policy_losses.py "
                        "factories: ppo epsilon-mask, V-MPO top-half "
                        "softmax + Lagrange temperature, AWR exp "
                        "transform, plain PG, V-trace IS weights)")
    p.add_argument("--ppo_epsilon", type=float, default=0.2)
    p.add_argument("--awr_beta", type=float, default=1.0)
    p.add_argument("--awr_w_max", type=float, default=20.0)
    p.add_argument("--vmpo_e_n", type=float, default=0.1,
                   help="V-MPO temperature constraint threshold")
    p.add_argument("--ppo_entropy_cost", type=float, default=0.0,
                   help="entropy bonus in the PPO-family regularizer "
                        "(reference ppo.gin uses 0)")
    p.add_argument("--advantage_estimator", default="gae",
                   choices=["gae", "vtrace"],
                   help="reference modules/advantages.py: GAE or "
                        "abandoned-aware V-trace")
    # Count-based action points on a frame linspace (reference PPO
    # learner.py:436-471); 0 disables (time-based cadence still applies).
    p.add_argument("--num_checkpoints", type=int, default=0)
    p.add_argument("--num_saved_models", type=int, default=0)
    p.add_argument("--num_snapshots", type=int, default=0)
    # R2D2.
    p.add_argument("--burn_in", type=int, default=40)
    p.add_argument("--n_steps", type=int, default=5)
    p.add_argument("--target", default="nstep",
                   choices=["nstep", "retrace"],
                   help="R2D2 target estimator: n-step Bellman (the "
                        "reference's only option, r2d2 learner.py:195-255) "
                        "or Retrace(lambda) clipped-trace targets")
    p.add_argument("--retrace_lambda", type=float, default=0.95)
    p.add_argument("--replay_buffer_size",
                   type=lambda s: int(float(s)), default=10_000,
                   help="unrolls (R2D2) / windows (SAC). Device envs keep "
                        "the buffer in HBM (fused path; default sized for "
                        "~16 GB chips); host envs use the host-RAM backend "
                        "where the reference Atari config (100000 unrolls, "
                        ">85 GB) fits — gcp/train_atari.sh:28-33")
    p.add_argument("--replay_buffer_min_size", type=int, default=500,
                   help="buffer fill before training starts (reference "
                        "Atari config: 5000)")
    p.add_argument("--replay_ratio", type=float, default=0.75,
                   help="host-env off-policy agents: expected times each "
                        "stored item is trained on (reference r2d2 0.75, "
                        "sac 4; insertion_batch = batch_size/replay_ratio, "
                        "r2d2 learner.py:113-117)")
    p.add_argument("--batch_size", type=int, default=64)
    p.add_argument("--update_target_every_n_step", type=int, default=2500)
    p.add_argument("--train_batches_per_step", type=int, default=1,
                   help="R2D2 optimization batches per rollout cycle: the "
                        "replay-ratio lever (reference replay_ratio = "
                        "train_batches_per_step * batch_size / num_envs)")
    p.add_argument("--num_eval_envs", type=int, default=0)
    # SAC.
    p.add_argument("--her_window_length", type=int, default=0)
    p.add_argument("--polyak", type=float, default=0.9)
    p.add_argument("--sac_entropy_cost", type=float, default=0.01,
                   help="initial entropy cost alpha (reference "
                        "agents/sac/learner.py:75)")
    p.add_argument("--target_entropy", default=None,
                   help="if set, alpha is auto-adjusted toward this policy "
                        "entropy (reference learner.py:76-79); 'auto' = "
                        "-action_dim (the standard SAC heuristic)")
    p.add_argument("--entropy_cost_adjustment_speed", type=float,
                   default=1.0)
    p.add_argument("--bootstrap_net", default="v", choices=["v", "q"],
                   help="bootstrap from target V (original SAC) or target "
                        "min-Q + entropy (arXiv:1812.05905)")
    p.add_argument("--sac_net", default="mlp", choices=["mlp", "lstm"],
                   help="mlp = ActorCriticMLP; lstm = recurrent "
                        "ActorCriticLSTM (LSTM + feed-forward branch)")
    p.add_argument("--pipeline_host_rollouts", action="store_true",
                   help="overlap host env stepping with the device update "
                        "(one-step-stale behaviour params, reference actor "
                        "concurrency semantics)")
    p.add_argument("--normalize_observations", action="store_true",
                   help="streaming mean/std observation normalization for "
                        "vtrace/sac (reference NormalizeObservationsWrapper)")
    p.add_argument("--agent_module", default=None,
                   help="path to a Python file (or dotted module) whose "
                        "configure(args, env, components) freely recomposes "
                        "the agent stack — net x distribution x loss x "
                        "optimizer x config — before the learner is built. "
                        "The gin-composition equivalent (reference "
                        "mujoco/ppo_main.py:37-107 + gin/ppo.gin) as plain "
                        "Python: mutate or replace entries in `components` "
                        "and return it. See "
                        "scripts/examples/custom_ppo_composition.py")
    return p.parse_args(argv)


def _apply_agent_module(args, env, components: dict) -> dict:
    """Free composition hook (the reference's gin seam, TPU-native style).

    Loads ``--agent_module`` (file path or dotted module name) and calls its
    ``configure(args, env, components)``. ``components`` holds the
    agent-branch pieces about to be assembled (keys vary by agent:
    net/dist/agent/loss/config/optimizer for PPO; net/agent/config/
    optimizer for vtrace/r2d2/sac); whatever the hook returns replaces
    them. Returning None keeps in-place mutations.
    """
    if not args.agent_module:
        return components
    import importlib
    import importlib.util

    if os.path.exists(args.agent_module):
        spec = importlib.util.spec_from_file_location(
            "seed_rl_tpu_agent_module", args.agent_module
        )
        module = importlib.util.module_from_spec(spec)
        spec.loader.exec_module(module)
    else:
        module = importlib.import_module(args.agent_module)
    configure = getattr(module, "configure", None)
    assert configure is not None, (
        f"--agent_module={args.agent_module} must define "
        "configure(args, env, components)"
    )
    result = configure(args, env, components)
    return components if result is None else result


def make_env(args):
    from seed_rl_tpu import envs

    if args.env == "toy":
        return envs.BatchedEnv(envs.ToyEnv(), args.num_envs), "device"
    if args.env == "toy_memory":
        return envs.BatchedEnv(envs.ToyMemoryEnv(), args.num_envs), "device"
    if args.env == "discrete_match":
        return (
            envs.BatchedEnv(envs.DiscreteMatchEnv(), args.num_envs),
            "device",
        )
    if args.env == "bit_flipping":
        return (
            envs.BatchedEnv(envs.BitFlippingEnv(), args.num_envs),
            "device",
        )
    if args.env == "synthetic_atari":
        from seed_rl_tpu.envs.synthetic import SyntheticAtariEnv

        return (
            envs.BatchedEnv(SyntheticAtariEnv(), args.num_envs),
            "device",
        )
    if args.env == "catch":
        # Real visual control fully on device (no ALE needed): bsuite-style
        # Catch rendered to Atari-shaped 84x84 frames.
        from seed_rl_tpu.envs.catch import CatchEnv

        return (
            envs.BatchedEnv(CatchEnv(), args.num_envs),
            "device",
        )
    if args.env == "catch_continuous":
        # The SAC visual-curve variant: continuous paddle velocity,
        # otherwise identical Catch episode structure (envs/catch.py).
        from seed_rl_tpu.envs.catch import ContinuousCatchEnv

        return (
            envs.BatchedEnv(ContinuousCatchEnv(), args.num_envs),
            "device",
        )
    if args.env == "synthetic_atari_host":
        from seed_rl_tpu.envs.host import HostBatchedEnv
        from seed_rl_tpu.envs.synthetic import SyntheticAtariGymEnv

        return (
            HostBatchedEnv(
                lambda i: SyntheticAtariGymEnv(),
                args.num_envs,
                num_threads=min(args.num_envs, 16),
            ),
            "host",
        )
    if args.env == "mujoco":
        from seed_rl_tpu.envs.host import HostBatchedEnv
        from seed_rl_tpu.envs.mujoco import create_environment

        return (
            HostBatchedEnv(
                lambda i: create_environment(args.env_name),
                args.num_envs,
                num_threads=min(args.num_envs, 16),
            ),
            "host",
        )
    if args.env == "atari":
        from seed_rl_tpu.envs.atari import create_environment
        from seed_rl_tpu.envs.host import HostBatchedEnv

        return (
            HostBatchedEnv(
                lambda i: create_environment(args.game, task=i),
                args.num_envs,
                num_threads=min(args.num_envs, 16),
            ),
            "host",
        )
    if args.env == "dmlab":
        from seed_rl_tpu.envs.dmlab import create_environment
        from seed_rl_tpu.envs.host import HostBatchedEnv

        return (
            HostBatchedEnv(
                lambda i: create_environment(args.game, task=i),
                args.num_envs,
                num_threads=min(args.num_envs, 16),
            ),
            "host",
        )
    if args.env == "football":
        from seed_rl_tpu.envs.football import create_environment
        from seed_rl_tpu.envs.host import HostBatchedEnv

        return (
            HostBatchedEnv(
                lambda i: create_environment(args.game),
                args.num_envs,
                num_threads=min(args.num_envs, 16),
            ),
            "host",
        )
    raise ValueError(args.env)


def _action_space_of(env):
    return env.action_space


def _replay_dir(args):
    """Replay snapshot directory for --checkpoint_replay (None = off)."""
    if not getattr(args, "checkpoint_replay", False):
        return None
    if not args.logdir:
        raise ValueError("--checkpoint_replay requires --logdir")
    import os

    return os.path.join(os.path.abspath(args.logdir), "replay")


def _maybe_eval(args, env, agent, learner, checkpoint, rng, location) -> bool:
    """``--run_mode=eval``: restore + deterministic evaluation, one JSON line.

    Capability parity with the reference's eval modes (PPO run_eval /
    dedicated eval actors): deterministic inference, no unroll storage, no
    training.
    """
    if args.run_mode != "eval":
        return False
    import json

    from seed_rl_tpu.evaluation import run_eval

    if getattr(learner, "init_needs_env", False):
        # Host off-policy learners initialize from an example env output.
        from seed_rl_tpu.rollout import _zero_action_for_space

        env_output = jax.tree.map(jnp.asarray, env.reset(seed=0))
        zero = _zero_action_for_space(env.action_space)
        prev_action = jax.tree.map(
            lambda x: jnp.broadcast_to(x, (env.num_envs,) + x.shape), zero
        )
        state = jax.jit(learner.init)(rng, prev_action, env_output)
    else:
        state = jax.jit(learner.init)(rng)
    state = checkpoint.restore_or(state)
    metrics = run_eval(
        env,
        agent,
        learner.rollout_params(state),
        jax.random.PRNGKey(1234),
        args.eval_episodes,
        unroll_length=args.unroll_length,
        host=(location == "host"),
    )
    metrics["eval/restored_step"] = int(state.step)
    print(json.dumps(metrics))
    return True


def _maybe_profile(args, learner, rng, location) -> bool:
    """``--run_mode=profile``: trace the jitted training loop.

    Captures a ``jax.profiler`` trace (xplane + trace.json, viewable in
    TensorBoard's profile plugin / Perfetto) of ``--profile_calls``
    compiled ``train_many`` calls after a warmup call, and prints one JSON
    line with the trace directory and the measured throughput. This is the
    rebuild's equivalent of the reference's tracing subsystem
    (profiler::TraceMe around RPC calls + actor timers, SURVEY.md §5);
    stage-isolating switches live in utils.profiling.InferenceReturn.
    """
    if args.run_mode != "profile":
        return False
    assert location == "device", (
        "--run_mode=profile traces the on-device engine; host-env agents "
        "are profiled via the actor-side ExportingTimer summaries"
    )
    import json
    import time

    state = jax.jit(learner.init)(rng)
    if hasattr(learner, "warmup_step"):  # replay agents need a filled buffer
        warmup = jax.jit(learner.warmup_step)
        min_size = learner.config.replay_buffer_min_size
        while int(state.replay.num_inserted) < min_size:
            state = warmup(state)
    run = jax.jit(
        functools.partial(learner.train_many, num_steps=args.steps_per_call)
    )
    state, _ = run(state)  # compile + one warm execution
    _ = int(state.step)
    outdir = (args.logdir or "/tmp/seed_rl_tpu") + "/profile"
    t0 = time.perf_counter()
    with jax.profiler.trace(outdir):
        for _ in range(args.profile_calls):
            state, _ = run(state)
        _ = int(state.step)  # force completion inside the trace window
    dt = time.perf_counter() - t0
    frames = (
        args.profile_calls * args.steps_per_call * learner.frames_per_step
    )
    print(
        json.dumps(
            {
                "profile_dir": outdir,
                "frames_per_sec": round(frames / dt, 1),
                "calls": args.profile_calls,
                "steps_per_call": args.steps_per_call,
            }
        )
    )
    return True


def main(argv=None):
    from seed_rl_tpu import distributions as pd
    from seed_rl_tpu.utils.checkpoint import CheckpointManager
    from seed_rl_tpu.utils.metrics import MetricsLogger

    args = parse_args(argv)
    result_snapshots = None  # in-memory LearnerState snapshots (PPO)

    if args.debug_asserts:
        from seed_rl_tpu.utils import debug_asserts

        debug_asserts.enable()

    # Restarts (preemption recovery, eval jobs, re-runs) reload compiled
    # executables from disk instead of re-paying minutes of XLA builds.
    from seed_rl_tpu.utils.compilation_cache import enable_persistent_cache

    enable_persistent_cache()

    if args.run_mode == "actor":
        # Env-stepping process against a remote learner's socket server
        # (reference common/actor.py:45-185 + gcp/run.py fleet shape).
        from seed_rl_tpu.remote import run_actor

        def create_env_fn():
            actor_env, actor_location = make_env(args)
            assert actor_location == "host", "actor mode steps host envs"
            return actor_env

        run_actor(
            create_env_fn,
            args.server_address,
            num_steps=args.num_actor_steps or None,
            env_id_offset=args.env_id_offset,
        )
        return

    # --run_mode=learner serves every agent to remote actor fleets, like
    # the reference (vtrace learner.py:350-405, r2d2 learner.py:765-822,
    # sac learner.py:539-556, policy_gradient learner.py:1114-1121): the
    # per-agent branches below switch to their remote loop when set.
    env, location = make_env(args)
    logger = MetricsLogger(args.logdir)
    checkpoint = CheckpointManager(
        args.logdir,
        save_checkpoint_secs=args.save_checkpoint_secs,
        init_checkpoint=args.init_checkpoint,
    )
    rng = jax.random.PRNGKey(0)

    # Linear decay over optimizer updates, the reference's PolynomialDecay
    # (power=1) to lr_decay_multiplier*lr at final_iteration
    # (agents/vtrace/learner.py:240, mujoco/ppo_main.py:86-91). Update
    # counts per rollout step differ per agent: PPO applies
    # epochs*batches updates, R2D2 train_batches_per_step, V-trace/SAC
    # ~steps_per_call-independent one per step.
    frames_per_rollout = max(1, args.num_envs * args.unroll_length)
    rollouts = max(1, args.total_environment_frames // frames_per_rollout)
    if args.agent == "ppo":
        updates_per_rollout = max(
            1, args.epochs_per_step * args.batches_per_step
        )
    elif args.agent == "r2d2":
        updates_per_rollout = max(1, getattr(args, "train_batches_per_step", 1))
    elif args.agent == "sac":
        # Mirror host_offpolicy's owed-batches arithmetic: each rollout
        # cycle inserts one unroll item per training env and owes
        # replay_ratio * inserted / batch_size optimizer updates, so the
        # schedule ends at total_environment_frames, not a fraction of it.
        updates_per_rollout = max(
            1.0, args.replay_ratio * args.num_envs / args.batch_size
        )
    else:
        updates_per_rollout = 1
    if args.lr_decay_multiplier != 1.0:
        learning_rate = optax.linear_schedule(
            init_value=args.learning_rate,
            end_value=args.lr_decay_multiplier * args.learning_rate,
            transition_steps=int(rollouts * updates_per_rollout),
        )
    else:
        learning_rate = args.learning_rate
    optimizer = optax.chain(
        optax.clip_by_global_norm(args.clip_norm),
        optax.adam(
            learning_rate, b1=args.adam_beta1, eps=args.adam_epsilon
        ),
    )

    if args.agent == "vtrace":
        from seed_rl_tpu.agent import PolicyAgent
        from seed_rl_tpu.agents import vtrace as vtrace_agent
        from seed_rl_tpu.models import MLPAndLSTM
        from seed_rl_tpu.models.atari import AtariPolicyNet

        dist = pd.get_parametric_distribution_for_action_space(
            _action_space_of(env)
        )
        if (
            args.conv_net == "impala_deep"
            and args.env in ("synthetic_atari", "synthetic_atari_host",
                             "atari", "catch")
        ):
            from seed_rl_tpu.models.resnets import ImpalaDeep

            net = ImpalaDeep(num_actions=int(_action_space_of(env).n),
                             remat=args.remat_torso)
        elif args.env in ("synthetic_atari", "synthetic_atari_host", "atari",
                          "catch"):
            net = AtariPolicyNet(
                parametric_distribution_param_size=dist.param_size,
                stack_size=4,
                lstm_size=256,
            )
        elif args.env == "dmlab":
            from seed_rl_tpu.models.resnets import ImpalaDeep

            net = ImpalaDeep(num_actions=int(_action_space_of(env).n),
                             remat=args.remat_torso)
        elif args.env == "football":
            from seed_rl_tpu.models.resnets import GFootball

            net = GFootball(
                parametric_distribution_param_size=dist.param_size
            )
        else:
            net = MLPAndLSTM(
                parametric_distribution_param_size=dist.param_size
            )
        agent = PolicyAgent(net, dist)
        if args.normalize_observations:
            from seed_rl_tpu.agent import NormalizingObservationsAgent

            agent = NormalizingObservationsAgent(agent)
        config = vtrace_agent.VTraceConfig(
            discounting=args.discounting,
            entropy_cost=args.entropy_cost,
        )
        components = _apply_agent_module(args, env, {
            "net": net, "dist": dist, "agent": agent, "config": config,
            "optimizer": optimizer,
        })
        net, dist, agent, config, optimizer = (
            components["net"], components["dist"], components["agent"],
            components["config"], components["optimizer"],
        )
        if args.run_mode == "learner":
            # Serve inference to remote actor processes over the unix
            # socket; the env above is used for spec inference only
            # (reference vtrace learner docstring, learner.py:174-178).
            from seed_rl_tpu.remote import SpecHostEnv, run_remote_learner
            from seed_rl_tpu.rollout_host import HostRolloutEngine

            obs_spec = env.observation_spec()
            spec_env = SpecHostEnv(
                obs_spec, _action_space_of(env), args.num_envs
            )
            if hasattr(env, "close"):
                env.close()
            engine = HostRolloutEngine(spec_env, agent, args.unroll_length)
            learner = vtrace_agent.VTraceLearner(
                engine, agent, config, optimizer
            )
            run_remote_learner(
                agent,
                learner,
                obs_spec,
                args.server_address,
                args.total_environment_frames,
                args.unroll_length,
                args.num_envs,
                inference_batch_size=args.inference_batch_size,
                logger=logger,
                checkpoint=checkpoint,
                log_every_steps=args.log_every_steps,
                config_push={
                    "unroll_length": args.unroll_length,
                    "num_envs": args.num_envs,
                },
                rng=rng,
            )
            logger.flush()
            checkpoint.close()
            return result_snapshots
        if location == "device":
            from seed_rl_tpu.rollout import RolloutEngine

            engine = RolloutEngine(env, agent, args.unroll_length)
            learner = vtrace_agent.VTraceLearner(
                engine, agent, config, optimizer
            )
            if _maybe_eval(args, env, agent, learner, checkpoint, rng,
                           location):
                return
            if _maybe_profile(args, learner, rng, location):
                return
            if args.num_replicas != 1:
                from seed_rl_tpu.parallel import DistributedLearner, make_mesh

                n = args.num_replicas or len(jax.devices())
                if n > 1:
                    learner = DistributedLearner(learner, make_mesh(n))
            vtrace_agent.learner_loop(
                learner,
                rng,
                args.total_environment_frames,
                logger=logger,
                checkpoint=checkpoint,
                log_every_steps=args.log_every_steps,
                steps_per_call=args.steps_per_call,
            )
        else:
            from seed_rl_tpu.host_loop import host_learner_loop
            from seed_rl_tpu.rollout_host import HostRolloutEngine

            engine = HostRolloutEngine(env, agent, args.unroll_length)
            learner = vtrace_agent.VTraceLearner(
                engine, agent, config, optimizer
            )
            if _maybe_eval(args, env, agent, learner, checkpoint, rng,
                           location):
                return
            host_learner_loop(
                learner,
                engine,
                rng,
                args.total_environment_frames,
                logger=logger,
                checkpoint=checkpoint,
                log_every_steps=args.log_every_steps,
                pipeline=args.pipeline_host_rollouts,
            )
    elif args.agent == "ppo":
        from seed_rl_tpu.agents.ppo import policy_losses
        from seed_rl_tpu.agents.ppo.continuous_control_agent import (
            ContinuousControlNet,
            NormalizingPolicyAgent,
        )
        from seed_rl_tpu.agents.ppo.generalized_onpolicy_loss import (
            GeneralizedOnPolicyLoss,
        )
        from seed_rl_tpu.agents.ppo.input_normalization import (
            InputNormalization,
        )
        from seed_rl_tpu.agents.ppo.learner import PPOConfig, PPOLearner
        from seed_rl_tpu.agents.ppo.policy_regularizers import (
            KLPolicyRegularizer,
        )
        from seed_rl_tpu.ops.advantages import GAE
        from seed_rl_tpu.ops.popart import PopArt
        from seed_rl_tpu.ops.running_statistics import AverageMeanStd

        import gymnasium as gym

        from seed_rl_tpu.ops.advantages import VTrace as VTraceAdvantage

        space = _action_space_of(env)
        discrete = isinstance(
            space, (gym.spaces.Discrete, gym.spaces.MultiDiscrete)
        )
        recurrent = False
        if discrete:
            # Discrete PPO family (the reference's DmLab PPO shape:
            # discrete actions + ImpalaDeep / conv nets via gin).
            dist = pd.get_parametric_distribution_for_action_space(space)
            if args.env in (
                "synthetic_atari", "synthetic_atari_host", "atari", "catch"
            ):
                from seed_rl_tpu.models.atari import AtariPolicyNet

                net = AtariPolicyNet(
                    parametric_distribution_param_size=dist.param_size,
                    stack_size=4,
                    lstm_size=256,
                )
                recurrent = True
            elif args.env == "dmlab":
                from seed_rl_tpu.models.resnets import ImpalaDeep

                net = ImpalaDeep(num_actions=int(space.n),
                                 remat=args.remat_torso)
                recurrent = True
            elif args.env == "football":
                from seed_rl_tpu.models.resnets import GFootball

                net = GFootball(
                    parametric_distribution_param_size=dist.param_size
                )
            else:
                from seed_rl_tpu.models import MLPAndLSTM

                net = MLPAndLSTM(
                    parametric_distribution_param_size=dist.param_size
                )
                recurrent = True
            from seed_rl_tpu.agent import PolicyAgent

            agent = PolicyAgent(net, dist)
        else:
            dist = pd.get_parametric_distribution_for_action_space(
                space,
                pd.continuous_action_config(
                    action_gaussian_std_fn="safe_exp"
                ),
            )
            obs_spec = env.observation_spec()
            obs_size = int(np.prod(jax.tree.leaves(obs_spec)[0].shape))
            net = ContinuousControlNet(
                parametric_distribution_param_size=dist.param_size,
                num_layers_policy=2,
                num_layers_value=2,
                num_units_policy=64,
                num_units_value=64,
                activation=jnp.tanh,
                kernel_init_gain=float(np.sqrt(2.0)),
                last_kernel_init_policy_gain=0.01,
                last_kernel_init_value_gain=1.0,
                std_independent_of_input=True,
            )
            agent = NormalizingPolicyAgent(
                net,
                dist,
                input_normalization=InputNormalization(
                    AverageMeanStd(), input_size=obs_size
                ),
                input_clipping=10.0,
            )
        policy_loss = {
            "ppo": lambda: policy_losses.ppo(epsilon=args.ppo_epsilon),
            "vmpo": lambda: policy_losses.vmpo(e_n=args.vmpo_e_n),
            "awr": lambda: policy_losses.awr(
                beta=args.awr_beta, w_max=args.awr_w_max
            ),
            "pg": policy_losses.pg,
            "vtrace": policy_losses.vtrace_is,
        }[args.policy_loss]()
        advantage_estimator = (
            GAE(lambda_=args.lambda_)
            if args.advantage_estimator == "gae"
            else VTraceAdvantage(lambda_=args.lambda_)
        )
        loss = GeneralizedOnPolicyLoss(
            agent=agent,
            reward_normalizer=PopArt(AverageMeanStd(), compensate=False),
            parametric_action_distribution=dist,
            advantage_estimator=advantage_estimator,
            policy_loss=policy_loss,
            discount_factor=args.discounting,
            regularizer=KLPolicyRegularizer(entropy=args.ppo_entropy_cost),
            baseline_cost=1.0,
        )
        # Split modes flatten time into batch and forbid recurrent state
        # (reference ppo_training_step_utils.py:105-220).
        batch_mode = args.batch_mode or (
            "shuffle" if recurrent else "split"
        )
        config = PPOConfig(
            epochs_per_step=args.epochs_per_step,
            batch_mode=batch_mode,
            batches_per_step=args.batches_per_step,
        )
        components = _apply_agent_module(args, env, {
            "net": net, "dist": dist, "agent": agent, "loss": loss,
            "config": config, "optimizer": optimizer,
        })
        net, dist, agent, loss, config, optimizer = (
            components["net"], components["dist"], components["agent"],
            components["loss"], components["config"],
            components["optimizer"],
        )
        if args.run_mode == "learner":
            # Remote actor fleets for PPO (reference policy_gradient
            # learner.py:1114-1121 serves inference + the PPO RPC surface):
            # the learner stores streamed timesteps into unrolls and runs
            # the full epochs/minibatch pass per collected batch.
            from seed_rl_tpu.remote import SpecHostEnv, run_remote_learner
            from seed_rl_tpu.rollout_host import HostRolloutEngine

            obs_spec = env.observation_spec()
            spec_env = SpecHostEnv(
                obs_spec, _action_space_of(env), args.num_envs
            )
            if hasattr(env, "close"):
                env.close()
            engine = HostRolloutEngine(spec_env, agent, args.unroll_length)
            learner = PPOLearner(engine, agent, loss, config, optimizer)
            run_remote_learner(
                agent,
                learner,
                obs_spec,
                args.server_address,
                args.total_environment_frames,
                args.unroll_length,
                args.num_envs,
                inference_batch_size=args.inference_batch_size,
                logger=logger,
                checkpoint=checkpoint,
                log_every_steps=args.log_every_steps,
                config_push={
                    "unroll_length": args.unroll_length,
                    "num_envs": args.num_envs,
                },
                rng=rng,
            )
            logger.flush()
            checkpoint.close()
            return result_snapshots
        if location == "device":
            from seed_rl_tpu.rollout import RolloutEngine

            engine = RolloutEngine(env, agent, args.unroll_length)
            learner = PPOLearner(engine, agent, loss, config, optimizer)
            if _maybe_eval(args, env, agent, learner, checkpoint, rng,
                           location):
                return
            if _maybe_profile(args, learner, rng, location):
                return
            if args.num_replicas != 1:
                from seed_rl_tpu.parallel import DistributedLearner, make_mesh

                n = args.num_replicas or len(jax.devices())
                if n > 1:
                    learner = DistributedLearner(learner, make_mesh(n))
            if getattr(learner, "jit_compiled", False):
                state = learner.init(rng)
                run = functools.partial(
                    learner.train_many, num_steps=args.steps_per_call
                )
            else:
                state = jax.jit(learner.init)(rng)
                run = jax.jit(
                    functools.partial(
                        learner.train_many, num_steps=args.steps_per_call
                    )
                )
            state = checkpoint.restore_or(state)
            from seed_rl_tpu.utils import episode_stats
            from seed_rl_tpu.utils.action_points import (
                ActionPointSchedule,
                snapshot_ppo_state,
            )

            schedule = ActionPointSchedule(
                args.total_environment_frames,
                {
                    "checkpoint": args.num_checkpoints,
                    "saved_model": args.num_saved_models,
                    "snapshot": args.num_snapshots,
                },
            )
            snapshots = []
            while (
                int(state.step) * learner.frames_per_step
                < args.total_environment_frames
            ):
                state, metrics = run(state)
                step = int(state.step)
                frames = step * learner.frames_per_step
                if step % args.log_every_steps < args.steps_per_call:
                    stats = state.stats
                    n = float(stats.num_episodes)
                    metrics = dict(metrics)
                    if n > 0:
                        metrics["episodes/mean_return"] = (
                            float(stats.sum_return) / n
                        )
                        state = state._replace(
                            stats=episode_stats.reset_window(stats)
                        )
                    logger.log(step, metrics, frames=frames)
                fired = schedule.due(frames)
                # Jumped marks repeat in `fired`; identical state saved
                # twice is pointless, so checkpoint/export dedupe per call
                # while snapshots honour the requested count.
                if "checkpoint" in fired:
                    checkpoint.maybe_save(step, state, force=True)
                if "saved_model" in fired and args.logdir:
                    from seed_rl_tpu.utils.export import export_policy

                    export_policy(
                        f"{args.logdir}/saved_models/{frames}",
                        agent,
                        learner.rollout_params(state),
                        state.rollout.prev_action,
                        state.rollout.env_output,
                    )
                snapshots.extend(
                    snapshot_ppo_state(state, frames)
                    for _ in range(fired.count("snapshot"))
                )
                checkpoint.maybe_save(step, state)
            checkpoint.maybe_save(int(state.step), state, force=True)
            result_snapshots = snapshots
        else:
            from seed_rl_tpu.host_loop import host_learner_loop
            from seed_rl_tpu.rollout_host import HostRolloutEngine

            engine = HostRolloutEngine(env, agent, args.unroll_length)
            learner = PPOLearner(engine, agent, loss, config, optimizer)
            if _maybe_eval(args, env, agent, learner, checkpoint, rng,
                           location):
                return
            host_learner_loop(
                learner,
                engine,
                rng,
                args.total_environment_frames,
                logger=logger,
                checkpoint=checkpoint,
                log_every_steps=args.log_every_steps,
                pipeline=args.pipeline_host_rollouts,
            )
    elif args.agent == "r2d2":
        from seed_rl_tpu.agents import r2d2
        from seed_rl_tpu.models.atari import DuelingLSTMDQNNet
        from seed_rl_tpu.models.dueling_mlp import VectorDuelingDQNNet

        space = _action_space_of(env)
        num_actions = int(space.n)
        if args.env in ("synthetic_atari", "synthetic_atari_host", "atari",
                        "catch"):
            net = DuelingLSTMDQNNet(num_actions=num_actions)
        else:
            net = VectorDuelingDQNNet(num_actions=num_actions)
        num_training = args.num_envs - args.num_eval_envs
        epsilons = jnp.concatenate(
            [
                r2d2.training_env_epsilons(num_training),
                jnp.full((args.num_eval_envs,), 1e-3),
            ]
        )
        agent = r2d2.R2D2Agent(net, epsilons)
        config = r2d2.R2D2Config(
            discounting=args.discounting,
            n_steps=args.n_steps,
            burn_in=args.burn_in,
            replay_buffer_size=args.replay_buffer_size,
            replay_buffer_min_size=args.replay_buffer_min_size,
            batch_size=args.batch_size,
            update_target_every_n_step=args.update_target_every_n_step,
            num_eval_envs=args.num_eval_envs,
            train_batches_per_step=args.train_batches_per_step,
            target=args.target,
            retrace_lambda=args.retrace_lambda,
        )
        components = _apply_agent_module(args, env, {
            "net": net, "agent": agent, "config": config,
            "optimizer": optimizer,
        })
        net, agent, config, optimizer = (
            components["net"], components["agent"], components["config"],
            components["optimizer"],
        )
        if args.run_mode == "learner":
            # Remote actor fleets (reference r2d2 learner.py:765-822 +
            # gcp/train_atari.sh: 32 workers x 20 actors): serve
            # epsilon-by-env-id inference, store burn-in-overlapped unrolls
            # of training envs only, train from host-RAM replay under the
            # replay-ratio contract.
            import dataclasses as _dc

            from seed_rl_tpu.remote import run_remote_offpolicy_learner
            from seed_rl_tpu.replay_host import HostReplayBuffer

            obs_spec = env.observation_spec()
            if hasattr(env, "close"):
                env.close()
            insertion_batch = max(
                1, int(round(args.batch_size / args.replay_ratio))
            )
            host_learner = r2d2.R2D2HostLearner(
                agent,
                _dc.replace(config, num_eval_envs=0),
                optimizer,
                insertion_batch,
                args.unroll_length,
            )
            replay = HostReplayBuffer(
                args.replay_buffer_size,
                config.importance_sampling_exponent,
            )
            run_remote_offpolicy_learner(
                agent,
                host_learner,
                replay,
                obs_spec,
                args.server_address,
                args.total_environment_frames,
                args.unroll_length,
                args.num_envs,
                replay_ratio=args.replay_ratio,
                replay_buffer_min_size=args.replay_buffer_min_size,
                example_action=np.zeros((), np.int32),
                num_training_envs=num_training,
                num_overlapping_steps=args.burn_in,
                inference_batch_size=args.inference_batch_size,
                logger=logger,
                checkpoint=checkpoint,
                replay_dir=_replay_dir(args),
                log_every_cycles=args.log_every_steps,
                config_push={
                    "unroll_length": args.unroll_length,
                    "num_envs": args.num_envs,
                },
                rng=rng,
            )
            logger.flush()
            checkpoint.close()
            return result_snapshots
        if location == "host":
            # Reference-scale path: host envs (Atari/ALE), host-RAM replay
            # (100k-unroll buffers), split rollout-insert / sample-train
            # halves under the replay-ratio contract.
            from seed_rl_tpu.host_offpolicy import host_offpolicy_loop
            from seed_rl_tpu.replay_host import HostReplayBuffer
            from seed_rl_tpu.rollout_host import HostRolloutEngine

            host_engine = HostRolloutEngine(
                env, agent, args.unroll_length,
                num_overlapping_steps=args.burn_in,
            )
            host_learner = r2d2.R2D2HostLearner(
                agent, config, optimizer, args.num_envs, args.unroll_length
            )
            if _maybe_eval(args, env, agent, host_learner, checkpoint, rng,
                           location):
                return
            replay = HostReplayBuffer(
                args.replay_buffer_size,
                config.importance_sampling_exponent,
            )
            host_offpolicy_loop(
                host_learner,
                host_engine,
                replay,
                rng,
                args.total_environment_frames,
                replay_ratio=args.replay_ratio,
                replay_buffer_min_size=args.replay_buffer_min_size,
                logger=logger,
                checkpoint=checkpoint,
                log_every_cycles=args.log_every_steps,
                pipeline=args.pipeline_host_rollouts,
                replay_dir=_replay_dir(args),
            )
        else:
            from seed_rl_tpu.rollout import RolloutEngine

            engine = RolloutEngine(
                env, agent, args.unroll_length,
                num_overlapping_steps=args.burn_in,
            )
            learner = r2d2.R2D2Learner(engine, agent, config, optimizer)
            if _maybe_eval(args, env, agent, learner, checkpoint, rng,
                           location):
                return
            if _maybe_profile(args, learner, rng, location):
                return
            if args.num_replicas != 1:
                from seed_rl_tpu.parallel import DistributedLearner, make_mesh

                n = args.num_replicas or len(jax.devices())
                if n > 1:
                    learner = DistributedLearner(learner, make_mesh(n))
            r2d2.learner_loop(
                learner,
                rng,
                args.total_environment_frames,
                logger=logger,
                checkpoint=checkpoint,
                log_every_steps=args.log_every_steps,
                steps_per_call=args.steps_per_call,
            )
    elif args.agent == "sac":
        from seed_rl_tpu.agents import sac
        from seed_rl_tpu.models.sac_nets import (
            ActorCriticLSTM,
            ActorCriticMLP,
        )
        from seed_rl_tpu.rollout import RolloutEngine

        space = _action_space_of(env)
        dist = pd.get_parametric_distribution_for_action_space(space)
        import gymnasium as gym

        action_dim = 1 if isinstance(space, gym.spaces.Discrete) else None
        if args.env in ("catch_continuous", "catch"):
            from seed_rl_tpu.models.sac_nets import VisualActorCritic

            net = VisualActorCritic(
                parametric_distribution_param_size=dist.param_size,
                n_critics=2,
                action_dim=action_dim,
            )
        elif args.sac_net == "lstm":
            net = ActorCriticLSTM(
                parametric_distribution_param_size=dist.param_size,
                n_critics=2,
                action_dim=action_dim,
            )
        else:
            net = ActorCriticMLP(
                parametric_distribution_param_size=dist.param_size,
                n_critics=2,
                action_dim=action_dim,
            )
        agent = sac.SACAgent(
            net, dist,
            normalize_observations=args.normalize_observations,
        )
        her_window = args.her_window_length or None
        target_entropy = args.target_entropy
        if target_entropy == "auto":
            # Standard SAC heuristic: -dim(action space).
            dim = (
                1 if isinstance(space, gym.spaces.Discrete)
                else int(np.prod(space.shape))
            )
            target_entropy = -float(dim)
        elif target_entropy is not None:
            target_entropy = float(target_entropy)
        config = sac.SACConfig(
            discounting=args.discounting,
            entropy_cost=args.sac_entropy_cost,
            target_entropy=target_entropy,
            entropy_cost_adjustment_speed=(
                args.entropy_cost_adjustment_speed
            ),
            bootstrap_net=args.bootstrap_net,
            batch_size=args.batch_size,
            replay_buffer_size=args.replay_buffer_size,
            replay_buffer_min_size=args.replay_buffer_min_size,
            unroll_length=args.unroll_length,
            her_window_length=her_window,
            polyak=args.polyak,
        )
        components = _apply_agent_module(args, env, {
            "net": net, "dist": dist, "agent": agent, "config": config,
            "optimizer": optimizer,
        })
        net, dist, agent, config, optimizer = (
            components["net"], components["dist"], components["agent"],
            components["config"], components["optimizer"],
        )
        if args.run_mode == "learner":
            # Remote actor fleets (reference sac learner.py:539-556):
            # uniform host-RAM replay, replay-ratio train cadence, policy
            # served over the socket transport.
            assert her_window is None, "HER uses the fused device path"
            from seed_rl_tpu.remote import run_remote_offpolicy_learner
            from seed_rl_tpu.replay_host import HostReplayBuffer

            obs_spec = env.observation_spec()
            if hasattr(env, "close"):
                env.close()
            insertion_batch = max(
                1, int(round(args.batch_size / args.replay_ratio))
            )
            host_learner = sac.SACHostLearner(
                agent, config, optimizer, insertion_batch,
                args.unroll_length,
            )
            replay = HostReplayBuffer(
                args.replay_buffer_size, importance_sampling_exponent=0.0
            )
            example_action = np.zeros(
                (1,) if isinstance(space, gym.spaces.Discrete)
                else tuple(space.shape),
                np.float32,
            )
            run_remote_offpolicy_learner(
                agent,
                host_learner,
                replay,
                obs_spec,
                args.server_address,
                args.total_environment_frames,
                args.unroll_length,
                args.num_envs,
                replay_ratio=args.replay_ratio,
                replay_buffer_min_size=args.replay_buffer_min_size,
                example_action=example_action,
                inference_batch_size=args.inference_batch_size,
                logger=logger,
                checkpoint=checkpoint,
                replay_dir=_replay_dir(args),
                log_every_cycles=args.log_every_steps,
                config_push={
                    "unroll_length": args.unroll_length,
                    "num_envs": args.num_envs,
                },
                rng=rng,
            )
            logger.flush()
            checkpoint.close()
            return result_snapshots
        if location == "host":
            # Reference SAC is a MuJoCo/Gym agent
            # (/root/reference/mujoco/sac_main.py): host envs + host-RAM
            # uniform replay under the replay-ratio contract (default 4).
            assert her_window is None, "HER uses the fused device path"
            from seed_rl_tpu.host_offpolicy import host_offpolicy_loop
            from seed_rl_tpu.replay_host import HostReplayBuffer
            from seed_rl_tpu.rollout_host import HostRolloutEngine

            host_engine = HostRolloutEngine(env, agent, args.unroll_length)
            host_learner = sac.SACHostLearner(
                agent, config, optimizer, args.num_envs, args.unroll_length
            )
            if _maybe_eval(args, env, agent, host_learner, checkpoint, rng,
                           location):
                return
            replay = HostReplayBuffer(
                args.replay_buffer_size, importance_sampling_exponent=0.0
            )
            host_offpolicy_loop(
                host_learner,
                host_engine,
                replay,
                rng,
                args.total_environment_frames,
                replay_ratio=args.replay_ratio,
                replay_buffer_min_size=args.replay_buffer_min_size,
                logger=logger,
                checkpoint=checkpoint,
                log_every_cycles=args.log_every_steps,
                pipeline=args.pipeline_host_rollouts,
                replay_dir=_replay_dir(args),
            )
            logger.flush()
            checkpoint.close()
            return result_snapshots
        engine = RolloutEngine(
            env, agent, her_window or args.unroll_length
        )
        compute_reward_fn = None
        if her_window:
            from seed_rl_tpu.envs.toy import BitFlippingEnv

            compute_reward_fn = BitFlippingEnv.compute_reward
        learner = sac.SACLearner(
            engine, agent, config, optimizer,
            compute_reward_fn=compute_reward_fn,
        )
        if _maybe_eval(args, env, agent, learner, checkpoint, rng, location):
            return
        if _maybe_profile(args, learner, rng, location):
            return
        if args.num_replicas != 1:
            from seed_rl_tpu.parallel import DistributedLearner, make_mesh

            n = args.num_replicas or len(jax.devices())
            if n > 1:
                learner = DistributedLearner(learner, make_mesh(n))
        state = (
            learner.init(rng)
            if getattr(learner, "jit_compiled", False)
            else jax.jit(learner.init)(rng)
        )
        state = checkpoint.restore_or(state)
        if getattr(learner, "jit_compiled", False):
            warmup = learner.warmup_step
            run = functools.partial(
                learner.train_many, num_steps=args.steps_per_call
            )
        else:
            from seed_rl_tpu.utils import debug_asserts

            warmup = debug_asserts.checkify_jit(learner.warmup_step)
            run = debug_asserts.checkify_jit(
                functools.partial(
                    learner.train_many, num_steps=args.steps_per_call
                )
            )
        while (
            int(state.replay.num_inserted) < config.replay_buffer_min_size
        ):
            state = warmup(state)
        from seed_rl_tpu.utils import episode_stats

        while (
            int(state.step) * learner.frames_per_step
            < args.total_environment_frames
        ):
            state, metrics = run(state)
            step = int(state.step)
            if step % args.log_every_steps < args.steps_per_call:
                stats = state.stats
                n = float(stats.num_episodes)
                metrics = dict(metrics)
                if n > 0:
                    metrics["episodes/mean_return"] = (
                        float(stats.sum_return) / n
                    )
                    state = state._replace(
                        stats=episode_stats.reset_window(stats)
                    )
                logger.log(
                    step, metrics, frames=step * learner.frames_per_step
                )
            checkpoint.maybe_save(step, state)
        checkpoint.maybe_save(int(state.step), state, force=True)
    logger.flush()
    checkpoint.close()
    # Programmatic callers get the in-memory snapshots (the reference
    # returns LearnerState snapshots for warm-starting other learners).
    return result_snapshots


if __name__ == "__main__":
    main()
