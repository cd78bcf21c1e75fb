from .brownian import VirtualBrownianTree
from .solve import SDESolution, sdesolve
from .step import (
    SDEStepResult,
    lamba_euler_heun_step,
    milstein_commute_step,
    sri_step,
)
from .tableaus import SOSRITableau, SRIW1Tableau

__all__ = [
    "VirtualBrownianTree",
    "SDESolution",
    "sdesolve",
    "SDEStepResult",
    "lamba_euler_heun_step",
    "milstein_commute_step",
    "sri_step",
    "SOSRITableau",
    "SRIW1Tableau",
]
