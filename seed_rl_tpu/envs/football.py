"""Google Research Football adapter + bit-packed observation codec.

Parity with /root/reference/football/:
- ``PackedBitsObservation`` (observation.py:22-43): bool SMM planes packed
  to uint16 on the host (8-16x transfer savings),
- ``unpackbits`` (observation.py:46-63): device-side unpack back to
  {0, 255} float planes, implemented in JAX with the same bit order
  (uint8-msb-first within each uint16's low/high byte),
- ``create_environment`` (env.py:35-49): SMM representation factory, gated
  on the ``gfootball`` package.
"""

from typing import Optional

import gymnasium as gym
import numpy as np

try:
    import jax.numpy as jnp

    _BIT_PATTERNS = [
        2**7, 2**6, 2**5, 2**4, 2**3, 2**2, 2**1, 2**0,
        2**15, 2**14, 2**13, 2**12, 2**11, 2**10, 2**9, 2**8,
    ]
except ImportError:  # pragma: no cover
    jnp = None


class PackedBitsObservation(gym.ObservationWrapper):
    """Packs boolean observation planes into uint16 along the last axis."""

    def __init__(self, env):
        super().__init__(env)
        shape = env.observation_space.shape
        self.observation_space = gym.spaces.Box(
            low=0,
            high=np.iinfo(np.uint16).max,
            shape=shape[:-1] + ((shape[-1] + 15) // 16,),
            dtype=np.uint16,
        )

    def observation(self, observation):
        data = np.packbits(observation, axis=-1)  # packs to uint8
        if data.shape[-1] % 2 == 1:
            data = np.pad(
                data, [(0, 0)] * (data.ndim - 1) + [(0, 1)], "constant"
            )
        return data.view(np.uint16)


def unpackbits(frame):
    """Device-side inverse of PackedBitsObservation: uint16 -> {0,255} f32."""
    patterns = jnp.asarray(_BIT_PATTERNS, jnp.uint16)
    bits = jnp.bitwise_and(frame[..., None], patterns)
    planes = (bits != 0).astype(jnp.float32) * 255.0
    return planes.reshape(
        planes.shape[:-2] + (planes.shape[-2] * planes.shape[-1],)
    )


def create_environment(
    level: str = "academy_empty_goal_close",
    representation: str = "extracted",
    rewards: str = "scoring",
    pack_bits: bool = True,
):
    """GFootball SMM env; requires the ``gfootball`` package."""
    try:
        import gfootball.env as football_env
    except ImportError as e:
        raise ImportError(
            "Football environments need the gfootball package; the "
            "PackedBitsObservation codec and GFootball network are testable "
            "without it."
        ) from e
    env = football_env.create_environment(
        env_name=level,
        representation=representation,
        rewards=rewards,
        stacked=True,
    )
    if pack_bits:
        env = PackedBitsObservation(env)
    return env
