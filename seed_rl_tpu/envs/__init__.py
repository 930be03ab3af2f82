from seed_rl_tpu.envs.core import (  # noqa: F401
    BatchedEnv,
    BatchedEnvState,
    JaxEnv,
    StepResult,
    TimeLimit,
)
from seed_rl_tpu.envs.toy import (  # noqa: F401
    BitFlippingEnv,
    DiscreteMatchEnv,
    ToyEnv,
    ToyMemoryEnv,
)
