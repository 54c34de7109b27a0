from .dynamics import (  # noqa: F401
    Kin,
    SimParams,
    SimState,
    bias_force,
    forward_dynamics,
    forward_kinematics,
    integrate_positions,
    mass_matrix,
)
from .contacts import ContactData, contact_data, solve_contacts  # noqa: F401
from .step import StepOut, physics_step  # noqa: F401
