from raocp_tpu.core.constraints.base import Constraint
from raocp_tpu.core.constraints.ball import Ball
from raocp_tpu.core.constraints.no_constraint import No
from raocp_tpu.core.constraints.rectangle import Rectangle
from raocp_tpu.core.constraints.cones import (
    Real,
    Zero,
    NonnegativeOrthant,
    SecondOrderCone,
    Cartesian,
)

__all__ = [
    "Constraint",
    "Ball",
    "No",
    "Rectangle",
    "Real",
    "Zero",
    "NonnegativeOrthant",
    "SecondOrderCone",
    "Cartesian",
]
