from seed_rl_tpu.ops import advantages, value_ops, vtrace  # noqa: F401
