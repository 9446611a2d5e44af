"""Benchmark-system zoo: the reference's example systems re-declared in the
dompc_tpu API (physics per the cited reference templates; fresh code).

The reference ships these as ``examples/*/template_{model,mpc,simulator}.py``
and its tests import them by sys.path hacking (SURVEY.md §4); here they are
first-class library code shared by ``examples/``, ``tests/`` and users.
"""
from ._classic import (
    oscillating_masses_model, oscillating_masses_mpc,
    cstr_model, cstr_mpc, cstr_simulator,
    batch_reactor_model, batch_reactor_mpc,
    lotka_volterra_model,
)
from ._lotka_volterra import lotka_volterra_model_integer, lotka_volterra_mpc
from ._dip import dip_model, dip_mpc, dip_simulator, DIP_OBSTACLES
from ._rotating_masses import (
    rotating_masses_model, rotating_masses_mpc,
    rotating_masses_simulator, rotating_masses_mhe,
)
from ._triple_tank import triple_tank_model
from ._kite import kite_model, kite_mpc, kite_simulator
from ._bicycle import (
    kinematic_bicycle_model, kinematic_bicycle_mpc,
    kinematic_bicycle_simulator,
    dynamic_bicycle_model, dynamic_bicycle_mpc, dynamic_bicycle_simulator,
)
from ._industrial_poly import (
    industrial_poly_model, industrial_poly_mpc, industrial_poly_simulator,
    industrial_poly_x0,
)

__all__ = [
    "oscillating_masses_model", "oscillating_masses_mpc",
    "cstr_model", "cstr_mpc", "cstr_simulator",
    "batch_reactor_model", "batch_reactor_mpc",
    "lotka_volterra_model", "lotka_volterra_model_integer",
    "lotka_volterra_mpc",
    "dip_model", "dip_mpc", "dip_simulator", "DIP_OBSTACLES",
    "rotating_masses_model", "rotating_masses_mpc",
    "rotating_masses_simulator", "rotating_masses_mhe",
    "triple_tank_model",
    "kite_model", "kite_mpc", "kite_simulator",
    "industrial_poly_model", "industrial_poly_mpc",
    "industrial_poly_simulator", "industrial_poly_x0",
    "kinematic_bicycle_model", "kinematic_bicycle_mpc",
    "kinematic_bicycle_simulator",
    "dynamic_bicycle_model", "dynamic_bicycle_mpc",
    "dynamic_bicycle_simulator",
]
