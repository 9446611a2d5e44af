"""Real mass-spring-damper plant (mirrors reference
examples/tools/pytorch_2_do-mpc/template_model.py)."""
import sys
import os

sys.path.insert(0, os.path.join(os.path.dirname(__file__),
                                "..", "..", ".."))

import dompc_tpu as dm


def template_model():
    model = dm.model.Model("continuous")

    position = model.set_variable("_x", "position")
    velocity = model.set_variable("_x", "velocity")
    f_external = model.set_variable("_u", "f_external")

    k = 10      # spring constant
    c = 2       # damping constant
    mass = 0.1  # mass of the object

    model.set_rhs("position", velocity)
    model.set_rhs("velocity",
                  (-k * position - c * velocity + f_external) / mass)

    model.setup()
    return model
