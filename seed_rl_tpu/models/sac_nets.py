"""SAC actor-critic networks.

Parity with /root/reference/agents/sac/networks.py:
- ``ActorCriticMLP`` (:32-140): an actor MLP producing distribution
  parameters, ``n_critics`` Q-MLPs over concat(obs, action), and a V-MLP.
  Dict observations are flattened by key order.
- ``ActorCriticLSTM`` (:224-382) built on ``LSTMwithFeedForwardBranch``
  (:143-221, arXiv:1710.06537): each of actor/V/Q owns a pre-MLP → stacked
  LSTM (done-masked reset *before* the step) plus a parallel feed-forward
  branch, concatenated into a post-MLP. GoalEnv dict observations withhold
  ``desired_goal`` from the recurrent branch (it is inconsistent across
  HER-relabelled rollouts, reference :269-276); Q-nets feed concat(obs,
  action) to the FF branch, actor/V feed the raw observation.

Exposed as one flax module with method-based application:
``net.apply(params, ..., method=net.get_q)`` etc., so a single parameter
tree serves all heads (matching the reference's single tf.Module). The
recurrent net's ``get_*`` methods are time-major ``[T, B, ...]``; the
single-step rollout path is ``step`` (a length-1 scan, so parameters and
reset semantics are shared with the training path by construction).
"""

from typing import Any, Callable, Optional, Sequence, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp

from seed_rl_tpu.models.core import LSTMStack, lstm_initial_state


def _concat_obs(observation):
    if isinstance(observation, dict):
        return jnp.concatenate(
            [
                jnp.asarray(v, jnp.float32)
                for _, v in sorted(observation.items())
            ],
            axis=-1,
        )
    return jnp.asarray(observation, jnp.float32)


class _MLP(nn.Module):
    sizes: Sequence[int]
    hidden_activation: Callable = nn.relu
    last_activation: Optional[Callable] = None

    @nn.compact
    def __call__(self, x):
        for i, size in enumerate(self.sizes):
            x = nn.Dense(size)(x)
            if i < len(self.sizes) - 1:
                x = self.hidden_activation(x)
            elif self.last_activation is not None:
                x = self.last_activation(x)
        return x


class ActorCriticMLP(nn.Module):
    parametric_distribution_param_size: int
    n_critics: int = 2
    mlp_sizes: Sequence[int] = (256, 256)
    # Width of the action vector fed to the critics. Defaults to
    # param_size // 2 (loc/scale continuous distributions); discrete actions
    # are scalar, so pass action_dim=1 for categorical policies.
    action_dim: Optional[int] = None

    @property
    def stateless(self) -> bool:
        return True

    def initial_state(self, batch_size: int):
        del batch_size
        return ()

    def setup(self):
        self.actor_mlp = _MLP(
            tuple(self.mlp_sizes)
            + (self.parametric_distribution_param_size,),
            name="actor",
        )
        self.q_mlps = [
            _MLP(tuple(self.mlp_sizes) + (1,), name=f"q_{i}")
            for i in range(self.n_critics)
        ]
        self.v_mlp = _MLP(tuple(self.mlp_sizes) + (1,), name="v")

    def get_action_params(self, prev_action, env_output, state):
        del prev_action, state
        return self.actor_mlp(_concat_obs(env_output.observation))

    def get_v(self, prev_action, env_output, state):
        del prev_action, state
        return jnp.squeeze(
            self.v_mlp(_concat_obs(env_output.observation)), axis=-1
        )

    def get_q(self, prev_action, env_output, state, action):
        del prev_action, state
        obs = _concat_obs(env_output.observation)
        action = jnp.asarray(action, jnp.float32)
        if action.ndim < obs.ndim:
            action = action[..., None]
        inputs = jnp.concatenate([obs, action], axis=-1)
        return jnp.concatenate(
            [critic(inputs) for critic in self.q_mlps], axis=-1
        )

    def __call__(self, prev_action, env_output, state):
        """Step/init entry: returns ((action_params, v), state)."""
        action_params = self.get_action_params(prev_action, env_output, state)
        v = self.get_v(prev_action, env_output, state)
        # Touch the critics so a single init creates every head's params.
        action_dim = (
            self.action_dim
            if self.action_dim is not None
            else self.parametric_distribution_param_size // 2
        )
        zero_action = jnp.zeros(
            action_params.shape[:-1] + (action_dim,), jnp.float32
        )
        _ = self.get_q(prev_action, env_output, state, zero_action)
        return (action_params, v), state


class VisualActorCritic(nn.Module):
    """SAC actor-critic over uint8 frames: shared conv encoder + MLP heads.

    The visual-control SAC net (no reference counterpart — its SAC is
    MLP/LSTM-only over vector observations, agents/sac/networks.py): a
    Nature-DQN conv torso (models/atari.py AtariConvTorso) shared by the
    actor, the V head and the ``n_critics`` Q heads (the standard shared-
    encoder visual-SAC layout); Q heads concatenate the action with the
    embedding. Stateless, so it plugs into SACAgent/SACLearner exactly
    like ActorCriticMLP — all ``get_*`` methods accept arbitrary leading
    batch dims ([B] rollout and [T, B] training).
    """

    parametric_distribution_param_size: int
    n_critics: int = 2
    head_sizes: Sequence[int] = (256,)
    conv_dtype: Any = jnp.float32
    action_dim: Optional[int] = None

    @property
    def stateless(self) -> bool:
        return True

    def initial_state(self, batch_size: int):
        del batch_size
        return ()

    def setup(self):
        from seed_rl_tpu.models.atari import AtariConvTorso

        self.torso = AtariConvTorso(dtype=self.conv_dtype, name="torso")
        self.actor_mlp = _MLP(
            tuple(self.head_sizes)
            + (self.parametric_distribution_param_size,),
            name="actor",
        )
        self.q_mlps = [
            _MLP(tuple(self.head_sizes) + (1,), name=f"q_{i}")
            for i in range(self.n_critics)
        ]
        self.v_mlp = _MLP(tuple(self.head_sizes) + (1,), name="v")

    def _embed(self, observation):
        # Fold any leading dims into one batch dim for the conv stack.
        lead = observation.shape[:-3]
        folded = observation.reshape((-1,) + observation.shape[-3:])
        emb = self.torso(folded)
        return emb.reshape(lead + emb.shape[-1:])

    def get_embedding(self, prev_action, env_output, state):
        """Shared conv embedding, computed once and reused by all heads
        (SACAgent.embed / the ``embedding=`` head kwargs). Re-running the
        torso per head call costs ~3x the necessary conv work per trained
        sample — measured round 5 on the visual-Catch bench."""
        del prev_action, state
        return self._embed(env_output.observation)

    def get_action_params_from_embedding(self, emb):
        return self.actor_mlp(emb)

    def get_v_from_embedding(self, emb):
        return jnp.squeeze(self.v_mlp(emb), axis=-1)

    def get_q_from_embedding(self, emb, action):
        action = jnp.asarray(action, jnp.float32)
        if action.ndim < emb.ndim:
            action = action[..., None]
        inputs = jnp.concatenate([emb, action], axis=-1)
        return jnp.concatenate(
            [critic(inputs) for critic in self.q_mlps], axis=-1
        )

    def get_action_params(self, prev_action, env_output, state):
        del prev_action, state
        return self.actor_mlp(self._embed(env_output.observation))

    def get_v(self, prev_action, env_output, state):
        del prev_action, state
        return jnp.squeeze(
            self.v_mlp(self._embed(env_output.observation)), axis=-1
        )

    def get_q(self, prev_action, env_output, state, action):
        del prev_action, state
        return self.get_q_from_embedding(
            self._embed(env_output.observation), action
        )

    def __call__(self, prev_action, env_output, state):
        """Step/init entry: returns ((action_params, v), state)."""
        action_params = self.get_action_params(
            prev_action, env_output, state
        )
        v = self.get_v(prev_action, env_output, state)
        action_dim = (
            self.action_dim
            if self.action_dim is not None
            else self.parametric_distribution_param_size // 2
        )
        zero_action = jnp.zeros(
            action_params.shape[:-1] + (action_dim,), jnp.float32
        )
        _ = self.get_q(prev_action, env_output, state, zero_action)
        return (action_params, v), state


def _recurrent_obs(observation):
    """Observation fed to the recurrent branch: no desired_goal (HER)."""
    if isinstance(observation, dict):
        assert {"achieved_goal", "desired_goal", "observation"} <= set(
            observation.keys()
        ), "GoalEnv observations need achieved/desired_goal + observation"
        observation = {
            k: v for k, v in observation.items() if k != "desired_goal"
        }
    return _concat_obs(observation)


class _ScanCore(nn.Module):
    """(state, (x, done)) -> (state, out) wrapper so nn.scan can drive it."""

    lstm_sizes: Sequence[int]

    @nn.compact
    def __call__(self, state, xs):
        x, done = xs
        out, state = LSTMStack(self.lstm_sizes, name="core")(x, state, done)
        return state, out


class LSTMWithFeedForwardBranch(nn.Module):
    """pre-MLP → LSTM stack ∥ ff-MLP → post-MLP (reference :143-221).

    All MLPs have linear last layers (reference ``create_mlp`` with
    ``last_layer_activation=None``). ``done[t]`` resets the carry *before*
    consuming timestep t. Inputs are time-major ``[T, B, ...]``.
    """

    output_size: int
    lstm_sizes: Sequence[int] = (256,)
    pre_mlp_sizes: Sequence[int] = (256,)
    post_mlp_sizes: Sequence[int] = (256,)
    ff_mlp_sizes: Sequence[int] = (256,)

    def initial_state(self, batch_size: int):
        return lstm_initial_state(self.lstm_sizes, batch_size)

    @nn.compact
    def __call__(
        self, ff_input, recurrent_input, state, done,
        only_return_new_state: bool = False,
    ):
        lstm_input = _MLP(self.pre_mlp_sizes, name="pre_mlp")(recurrent_input)
        scan = nn.scan(
            _ScanCore,
            variable_broadcast="params",
            split_rngs={"params": False},
            in_axes=0,
            out_axes=0,
        )
        state, lstm_output = scan(self.lstm_sizes, name="lstm")(
            state, (lstm_input, done)
        )
        if only_return_new_state:
            return state
        ff_output = _MLP(self.ff_mlp_sizes, name="ff_mlp")(ff_input)
        post_input = jnp.concatenate([ff_output, lstm_output], axis=-1)
        output = _MLP(
            tuple(self.post_mlp_sizes) + (self.output_size,), name="post_mlp"
        )(post_input)
        return output, state


class ActorCriticLSTM(nn.Module):
    """Recurrent SAC net (reference ActorCriticLSTM, networks.py:224-382).

    State layout mirrors the reference: ``(actor, v, q_0, ..)`` — one LSTM
    carry per net. ``get_*`` methods consume time-major inputs with the
    state at the first timestep and return outputs only; ``step`` advances
    every net one timestep (reference ``_unroll``'s
    ``only_return_new_state`` pass, :374-382) and returns the actor's
    distribution parameters.
    """

    parametric_distribution_param_size: int
    n_critics: int = 2
    lstm_sizes: Sequence[int] = (256,)
    pre_mlp_sizes: Sequence[int] = (256,)
    post_mlp_sizes: Sequence[int] = (256,)
    ff_mlp_sizes: Sequence[int] = (256,)
    action_dim: Optional[int] = None

    @property
    def stateless(self) -> bool:
        return False

    def initial_state(self, batch_size: int):
        per_net = lstm_initial_state(self.lstm_sizes, batch_size)
        return tuple(per_net for _ in range(2 + self.n_critics))

    def setup(self):
        def create_net(output_size, name):
            return LSTMWithFeedForwardBranch(
                output_size=output_size,
                lstm_sizes=tuple(self.lstm_sizes),
                pre_mlp_sizes=tuple(self.pre_mlp_sizes),
                post_mlp_sizes=tuple(self.post_mlp_sizes),
                ff_mlp_sizes=tuple(self.ff_mlp_sizes),
                name=name,
            )

        self.actor_net = create_net(
            self.parametric_distribution_param_size, "actor"
        )
        self.v_net = create_net(1, "v")
        self.q_nets = [
            create_net(1, f"q_{i}") for i in range(self.n_critics)
        ]

    def _recurrent_input(self, prev_action, env_output):
        obs = _recurrent_obs(env_output.observation)
        prev_action = jnp.asarray(prev_action, jnp.float32)
        if prev_action.ndim < obs.ndim:
            prev_action = prev_action[..., None]
        return jnp.concatenate([obs, prev_action], axis=-1)

    def get_action_params(self, prev_action, env_output, state):
        out, _ = self.actor_net(
            ff_input=_concat_obs(env_output.observation),
            recurrent_input=self._recurrent_input(prev_action, env_output),
            state=state[0],
            done=env_output.done,
        )
        return out

    def get_v(self, prev_action, env_output, state):
        v, _ = self.v_net(
            ff_input=_concat_obs(env_output.observation),
            recurrent_input=self._recurrent_input(prev_action, env_output),
            state=state[1],
            done=env_output.done,
        )
        return jnp.squeeze(v, axis=-1)

    def get_q(self, prev_action, env_output, state, action):
        obs = _concat_obs(env_output.observation)
        action = jnp.asarray(action, jnp.float32)
        if action.ndim < obs.ndim:
            action = action[..., None]
        ff_input = jnp.concatenate([obs, action], axis=-1)
        recurrent_input = self._recurrent_input(prev_action, env_output)
        qs = [
            net(
                ff_input=ff_input,
                recurrent_input=recurrent_input,
                state=net_state,
                done=env_output.done,
            )[0]
            for net, net_state in zip(self.q_nets, state[2:])
        ]
        return jnp.concatenate(qs, axis=-1)

    def step(self, prev_action, env_output, state) -> Tuple[jnp.ndarray, Tuple]:
        """One rollout step on batch-major [B, ...] inputs.

        Returns (action_params, new_state) with every net's carry advanced.
        """
        t_env = jax.tree.map(lambda x: x[None], env_output)
        t_prev = jax.tree.map(lambda x: x[None], prev_action)
        recurrent_input = self._recurrent_input(t_prev, t_env)
        ff_obs = _concat_obs(t_env.observation)
        action_params, actor_state = self.actor_net(
            ff_input=ff_obs,
            recurrent_input=recurrent_input,
            state=state[0],
            done=t_env.done,
        )
        new_states = [actor_state]
        for net, net_state in zip([self.v_net] + list(self.q_nets), state[1:]):
            new_states.append(
                net(
                    ff_input=None,
                    recurrent_input=recurrent_input,
                    state=net_state,
                    done=t_env.done,
                    only_return_new_state=True,
                )
            )
        return jnp.squeeze(action_params, axis=0), tuple(new_states)

    def __call__(self, prev_action, env_output, state):
        """Init entry on batch-major [B, ...] inputs; touches every head."""
        action_params, new_state = self.step(prev_action, env_output, state)
        t_env = jax.tree.map(lambda x: x[None], env_output)
        t_prev = jax.tree.map(lambda x: x[None], prev_action)
        v = self.get_v(t_prev, t_env, state)
        action_dim = (
            self.action_dim
            if self.action_dim is not None
            else self.parametric_distribution_param_size // 2
        )
        zero_action = jnp.zeros(
            action_params.shape[:-1] + (action_dim,), jnp.float32
        )
        _ = self.get_q(t_prev, t_env, state, zero_action[None])
        return (action_params, jnp.squeeze(v, axis=0)), new_state
