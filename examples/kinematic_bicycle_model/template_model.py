"""Kinematic bicycle model (mirrors reference
examples/kinematic_bicycle_model/template_model.py:44-74): miniature-car
slip-angle kinematics — position (X_p, Y_p), yaw Psi, speed V; inputs are
steering angle Delta and acceleration Acc."""
import sys
import os

sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", ".."))

import dompc_tpu as dm
from dompc_tpu import sym


def template_model():
    model = dm.model.Model("continuous")

    lf = 0.3  # front axle to CoG
    lr = 0.3  # rear axle to CoG

    X_p = model.set_variable("_x", "X_p")
    Y_p = model.set_variable("_x", "Y_p")
    Psi = model.set_variable("_x", "Psi")
    V = model.set_variable("_x", "V")
    Delta = model.set_variable("_u", "Delta")
    Acc = model.set_variable("_u", "Acc")

    beta = sym.atan((lr / (lr + lf)) * sym.tan(Delta))

    model.set_rhs("X_p", V * sym.cos(Psi + beta))
    model.set_rhs("Y_p", V * sym.sin(Psi + beta))
    model.set_rhs("Psi", (V / lr) * sym.sin(beta))
    model.set_rhs("V", Acc)

    model.setup()
    return model
