"""Erhard-Strauch kite on a fixed tether (mirrors reference
examples/kite/template_model.py): zenith theta, azimuth phi, orientation
psi; steering input u_tilde; uncertain glide ratio E_0 and wind v_0.
Tether force T_F and kite height are aux expressions."""
import sys
import os

sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", ".."))

import numpy as np
import dompc_tpu as dm
from dompc_tpu import sym


def template_model():
    model = dm.model.Model("continuous")

    L_tether = 400.0   # tether length [m]
    A = 300.0          # kite area [m^2]
    rho = 1.0          # air density
    beta = 0.0         # base angle
    c_tilde = 0.028    # turn-rate law coefficient

    theta = model.set_variable("_x", "theta")
    phi = model.set_variable("_x", "phi")
    psi = model.set_variable("_x", "psi")
    u_tilde = model.set_variable("_u", "u_tilde")
    E_0 = model.set_variable("_p", "E_0")
    v_0 = model.set_variable("_p", "v_0")

    model.set_expression("E_0", E_0)
    model.set_expression("v_0", v_0)

    E = E_0 - c_tilde * u_tilde ** 2
    v_a = v_0 * E * sym.cos(theta)
    P_D = (rho * v_0 ** 2) / 2.0
    T_F = (P_D * A * sym.cos(theta) ** 2 * (E + 1.0)
           * sym.sqrt(E ** 2 + 1.0)) * (
        sym.cos(theta) * np.cos(beta)
        + sym.sin(theta) * np.sin(beta) * sym.sin(phi))
    model.set_expression("T_F", T_F)
    model.set_expression("height_kite",
                         L_tether * sym.sin(theta) * sym.cos(phi))

    dphi = -v_a / (L_tether * sym.sin(theta)) * sym.sin(psi)
    model.set_rhs("theta", v_a / L_tether * (sym.cos(psi)
                                             - sym.tan(theta) / E))
    model.set_rhs("phi", dphi)
    model.set_rhs("psi", v_a / L_tether * u_tilde + dphi * sym.cos(theta))

    model.setup()
    return model
