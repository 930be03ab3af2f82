from seed_rl_tpu.parallel.mesh import init_multi_host, make_mesh  # noqa: F401
from seed_rl_tpu.parallel.dp import DistributedLearner  # noqa: F401
