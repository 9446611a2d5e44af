"""Triple-tank system, discrete (mirrors reference
examples/triple_tank_ekf/template_model.py): three coupled tanks with
sign/sqrt orifice flows, one measured level x3, an uncertain outflow
parameter p1 and a time-varying valve factor tvp1."""
import sys
import os

sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", ".."))

import dompc_tpu as dm
from dompc_tpu import sym


def template_model():
    model = dm.model.Model("discrete")

    x1 = model.set_variable("_x", "x1")
    x2 = model.set_variable("_x", "x2")
    x3 = model.set_variable("_x", "x3")
    u1 = model.set_variable("_u", "u1")
    u2 = model.set_variable("_u", "u2")
    model.set_meas("x3_meas", x3)
    p1 = model.set_variable("_p", "p1")
    tvp1 = model.set_variable("_tvp", "tvp1")

    A, g, Ts = 0.00154, 9.81, 1
    r1, r2, r3, sp = 1, 0.8, 1, 5e-5

    q13 = r1 * sp * sym.sign(x1 - x3) * sym.sqrt(2 * g * sym.fabs(x1 - x3))
    q32 = r3 * sp * sym.sign(x3 - x2) * sym.sqrt(2 * g * sym.fabs(x3 - x2))
    q20 = r2 * sp * sym.sqrt(2 * g * x2) * tvp1 * p1

    model.set_rhs("x1", x1 + (Ts / A) * (-q13 + u1))
    model.set_rhs("x2", x2 + (Ts / A) * (q32 - q20 + u2))
    model.set_rhs("x3", x3 + (Ts / A) * (q13 - q32))

    model.setup()
    return model
