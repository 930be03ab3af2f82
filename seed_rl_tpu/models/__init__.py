from seed_rl_tpu.models.policy import (  # noqa: F401
    MLPAndLSTM,
    MLPPolicyNetwork,
)
