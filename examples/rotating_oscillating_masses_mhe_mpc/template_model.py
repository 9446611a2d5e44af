"""Three rotating discs on torsion springs driven by two motors through a
fast actuator lag (mirrors reference
examples/rotating_oscillating_masses_mhe_mpc/template_model.py).
Inertias Theta_1..3 are model parameters; Theta_1 is estimated by the MHE.
Measurements: disc angles and motor setpoints."""
import sys
import os

sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", ".."))

import numpy as np
import dompc_tpu as dm
from dompc_tpu import sym


def template_model():
    model = dm.model.Model("continuous")

    phi_1 = model.set_variable("_x", "phi_1")
    phi_2 = model.set_variable("_x", "phi_2")
    phi_3 = model.set_variable("_x", "phi_3")
    phi = sym.vertcat(phi_1, phi_2, phi_3)
    dphi = model.set_variable("_x", "dphi", shape=(3, 1))
    phi_m_set = model.set_variable("_u", "phi_m_set", shape=(2, 1))
    phi_m = model.set_variable("_x", "phi_m", shape=(2, 1))

    # setpoint + MHE weight matrices enter as tvp / parameters
    model.set_variable("_tvp", "phi_2_set")
    model.set_variable("_p", "P_p")
    model.set_variable("_tvp", "P_v", shape=(5, 5))

    model.set_meas("phi_1_meas", phi)
    model.set_meas("phi_m_set_meas", phi_m_set)

    Theta_1 = model.set_variable("_p", "Theta_1")
    Theta_2 = model.set_variable("_p", "Theta_2")
    Theta_3 = model.set_variable("_p", "Theta_3")

    c = np.array([2.697, 2.66, 3.05, 2.86]) * 1e-3
    d = np.array([6.78, 8.01, 8.82]) * 1e-5

    model.set_rhs("phi_1", dphi[0])
    model.set_rhs("phi_2", dphi[1])
    model.set_rhs("phi_3", dphi[2])
    dphi_next = sym.vertcat(
        -c[0] / Theta_1 * (phi[0] - phi_m[0])
        - c[1] / Theta_1 * (phi[0] - phi[1]) - d[0] / Theta_1 * dphi[0],
        -c[1] / Theta_2 * (phi[1] - phi[0])
        - c[2] / Theta_2 * (phi[1] - phi[2]) - d[1] / Theta_2 * dphi[1],
        -c[2] / Theta_3 * (phi[2] - phi[1])
        - c[3] / Theta_3 * (phi[2] - phi_m[1]) - d[2] / Theta_3 * dphi[2],
    )
    model.set_rhs("dphi", dphi_next)
    tau = 1e-2
    model.set_rhs("phi_m", 1 / tau * (phi_m_set - phi_m))

    model.setup()
    return model
