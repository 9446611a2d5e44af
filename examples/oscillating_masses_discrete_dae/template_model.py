"""Discrete oscillating masses posed as a DAE (mirrors reference
examples/oscillating_masses_discrete_dae/template_model.py:34-75): the
successor state x_next is an algebraic variable defined implicitly by
set_alg, and the discrete rhs simply returns it."""
import sys
import os

sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", ".."))

import numpy as np
import dompc_tpu as dm
from dompc_tpu import sym


def template_model():
    model = dm.model.Model("discrete")

    x = model.set_variable("_x", "x", (4, 1))
    u = model.set_variable("_u", "u", (1, 1))

    model.set_expression("cost", sym.sum1(x ** 2))

    A = np.array([[0.763, 0.460, 0.115, 0.020],
                  [-0.899, 0.763, 0.420, 0.115],
                  [0.115, 0.020, 0.763, 0.460],
                  [0.420, 0.115, -0.899, 0.763]])
    B = np.array([[0.014], [0.063], [0.221], [0.367]])

    x_next = model.set_variable("_z", "x_next", (4, 1))
    model.set_rhs("x", x_next)
    model.set_alg("x_next", x_next - A @ x - B @ u)

    model.setup()
    return model
