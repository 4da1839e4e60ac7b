from raocp_tpu.ops import cones, operator, prox  # noqa: F401
