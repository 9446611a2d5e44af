"""Lotka-Volterra predator-prey model with an INTEGER control input
(mirrors reference examples/Lotka_Volterra/template_model.py): harvesting
is on/off, making the OCP a mixed-integer NLP."""
import sys
import os

sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", ".."))

import dompc_tpu as dm


def template_model():
    model = dm.model.Model("continuous")

    c0, c1 = 0.4, 0.2

    x_0 = model.set_variable("_x", "x_0")  # prey
    x_1 = model.set_variable("_x", "x_1")  # predator
    inp = model.set_variable("_u", "inp", input_type_integer=True)

    model.set_rhs("x_0", x_0 - x_0 * x_1 - c0 * x_0 * inp)
    model.set_rhs("x_1", -x_1 + x_0 * x_1 - c1 * x_1 * inp)

    model.setup()
    return model
