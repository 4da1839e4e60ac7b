from raocp_tpu.core.constraints.sets import Ball, Constraint, No, Rectangle
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
