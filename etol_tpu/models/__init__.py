"""Model library: vehicle dynamics and canonical VGP builders.

The reference ships its problems as example programs
(``src/Examples/{GLPK,Gurobi,SCIP,PSOPT,Dymos,OMPL}``, SURVEY.md §2
C10-C15); here the same problem families are reusable builders that return
``(VGP, NLP)`` pairs ready for the batched solver, plus the scaling
configurations from BASELINE.json (2D UAS, 3D point mass with moving
obstacles, nonlinear fixed-wing, fleet MPC).
"""

from . import dynamics
from .problems import (
    canonical_mip_2d,
    canonical_ocp_2d,
    composed_exact_demo,
    double_integrator_2d,
    fixed_wing_3dof,
    point_mass_3d,
    uas_2d,
)
from .tuned import tuned_config, warm_config

__all__ = [
    "dynamics",
    "canonical_mip_2d",
    "canonical_ocp_2d",
    "composed_exact_demo",
    "double_integrator_2d",
    "point_mass_3d",
    "uas_2d",
    "fixed_wing_3dof",
    "tuned_config",
    "warm_config",
]
