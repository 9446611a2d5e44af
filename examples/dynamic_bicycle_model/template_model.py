"""Dynamic bicycle model with Pacejka lateral tire forces (mirrors
reference examples/dynamic_bicycle_model/template_model.py:46-101,
Cataffo et al. 2022 scale racing vehicle): 6 states — position, yaw,
body-frame velocities, yaw rate; inputs are steering Delta and PWM
duty-cycle d."""
import sys
import os

sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", ".."))

import dompc_tpu as dm
from dompc_tpu import sym


def template_model():
    model = dm.model.Model("continuous")

    mass, I_z = 5.692, 0.204
    lf, lr = 0.178, 0.147
    # Pacejka magic-formula coefficients, front/rear
    D_f, D_r = 134.585, 159.919
    C_f, C_r = 0.085, 0.133
    B_f, B_r = 9.242, 17.716
    # longitudinal force map coefficients
    c_m1, c_m2, c_m3, c_m4 = 20.0, 6.92e-7, 3.99, 0.67

    X_p = model.set_variable("_x", "X_p")
    Y_p = model.set_variable("_x", "Y_p")
    Psi = model.set_variable("_x", "Psi")
    V_x = model.set_variable("_x", "V_x")
    V_y = model.set_variable("_x", "V_y")
    W = model.set_variable("_x", "W")
    Delta = model.set_variable("_u", "Delta")
    d = model.set_variable("_u", "d")

    model.set_expression("Vel", sym.sqrt(V_x ** 2 + V_y ** 2))

    alpha_f = -sym.atan2(W * lf + V_y, V_x) + Delta
    alpha_r = sym.atan2(W * lr - V_y, V_x)
    F_f_y = D_f * sym.sin(C_f * sym.atan(B_f * alpha_f))
    F_r_y = D_r * sym.sin(C_r * sym.atan(B_r * alpha_r))
    F_x = (c_m1 - c_m2 * V_x) * d - c_m4 * V_x ** 2 - c_m3

    model.set_rhs("X_p", V_x * sym.cos(Psi) - V_y * sym.sin(Psi))
    model.set_rhs("Y_p", V_x * sym.sin(Psi) + V_y * sym.cos(Psi))
    model.set_rhs("Psi", W)
    model.set_rhs("V_x", (F_x - F_f_y * sym.sin(Delta) + mass * V_y * W)
                  / mass)
    model.set_rhs("V_y", (F_r_y + F_f_y * sym.cos(Delta) - mass * V_x * W)
                  / mass)
    model.set_rhs("W", (F_f_y * lf * sym.cos(Delta)
                        - lf * F_x * sym.sin(Delta) - lr * F_r_y) / I_z)

    model.setup()
    return model
