from raocp_tpu.models.examples import (
    demo_problem,
    demo_mpc_controller,
    lqr_binary_problem,
    mass_spring_problem,
    network_mpc_controller,
    random_network_problem,
    soc_network_problem,
)

__all__ = [
    "demo_problem",
    "demo_mpc_controller",
    "lqr_binary_problem",
    "mass_spring_problem",
    "network_mpc_controller",
    "random_network_problem",
    "soc_network_problem",
]
