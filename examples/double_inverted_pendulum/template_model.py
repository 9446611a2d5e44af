"""Double inverted pendulum on a cart as an index-1 DAE via Euler-Lagrange
(mirrors reference examples/double_inverted_pendulum/template_model.py
:69-100): differential states pos/theta/velocities, algebraic states the
accelerations, obstacle distances as aux expressions."""
import sys
import os

sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", ".."))

import numpy as np
import dompc_tpu as dm
from dompc_tpu import sym


def template_model(obstacles=({"x": 0.0, "y": 0.6, "r": 0.3},)):
    model = dm.model.Model("continuous")

    m0 = 0.6    # cart mass [kg]
    m1 = 0.2    # first rod [kg]
    m2 = 0.2    # second rod [kg]
    L1 = 0.5    # first rod length [m]
    L2 = 0.5    # second rod length [m]
    l1, l2 = L1 / 2, L2 / 2
    J1 = (m1 * l1 ** 2) / 3
    J2 = (m2 * l2 ** 2) / 3
    g = 9.80665

    h1 = m0 + m1 + m2
    h2 = m1 * l1 + m2 * L1
    h3 = m2 * l2
    h4 = m1 * l1 ** 2 + m2 * L1 ** 2 + J1
    h5 = m2 * l2 * L1
    h6 = m2 * l2 ** 2 + J2
    h7 = (m1 * l1 + m2 * L1) * g
    h8 = m2 * l2 * g

    pos = model.set_variable("_x", "pos")
    theta = model.set_variable("_x", "theta", (2, 1))
    dpos = model.set_variable("_x", "dpos")
    dtheta = model.set_variable("_x", "dtheta", (2, 1))
    ddpos = model.set_variable("_z", "ddpos")
    ddtheta = model.set_variable("_z", "ddtheta", (2, 1))
    u = model.set_variable("_u", "force")

    model.set_rhs("pos", dpos)
    model.set_rhs("theta", dtheta)
    model.set_rhs("dpos", ddpos)
    model.set_rhs("dtheta", ddtheta)

    euler_lagrange = sym.vertcat(
        h1 * ddpos + h2 * ddtheta[0] * sym.cos(theta[0])
        + h3 * ddtheta[1] * sym.cos(theta[1])
        - (h2 * dtheta[0] ** 2 * sym.sin(theta[0])
           + h3 * dtheta[1] ** 2 * sym.sin(theta[1]) + u),
        h2 * sym.cos(theta[0]) * ddpos + h4 * ddtheta[0]
        + h5 * sym.cos(theta[0] - theta[1]) * ddtheta[1]
        - (h7 * sym.sin(theta[0])
           - h5 * dtheta[1] ** 2 * sym.sin(theta[0] - theta[1])),
        h3 * sym.cos(theta[1]) * ddpos
        + h5 * sym.cos(theta[0] - theta[1]) * ddtheta[0]
        + h6 * ddtheta[1]
        - (h5 * dtheta[0] ** 2 * sym.sin(theta[0] - theta[1])
           + h8 * sym.sin(theta[1])),
    )
    model.set_alg("euler_lagrange", euler_lagrange)

    E_kin_cart = 0.5 * m0 * dpos ** 2
    E_kin_p1 = 0.5 * m1 * (
        (dpos + l1 * dtheta[0] * sym.cos(theta[0])) ** 2
        + (l1 * dtheta[0] * sym.sin(theta[0])) ** 2) \
        + 0.5 * J1 * dtheta[0] ** 2
    E_kin_p2 = 0.5 * m2 * (
        (dpos + L1 * dtheta[0] * sym.cos(theta[0])
         + l2 * dtheta[1] * sym.cos(theta[1])) ** 2
        + (L1 * dtheta[0] * sym.sin(theta[0])
           + l2 * dtheta[1] * sym.sin(theta[1])) ** 2) \
        + 0.5 * J2 * dtheta[0] ** 2
    model.set_expression("E_kin", E_kin_cart + E_kin_p1 + E_kin_p2)

    E_pot = m1 * g * l1 * sym.cos(theta[0]) + m2 * g * (
        L1 * sym.cos(theta[0]) + l2 * sym.cos(theta[1]))
    model.set_expression("E_pot", E_pot)

    # obstacle distances for every rod node
    node1_x = pos + L1 * sym.sin(theta[0])
    node1_y = np.array([0]) + L1 * sym.cos(theta[0])
    node2_x = node1_x + L2 * sym.sin(theta[1])
    node2_y = node1_y + L2 * sym.cos(theta[1])
    dists = []
    for obs in obstacles:
        d0 = sym.sqrt((pos - obs["x"]) ** 2
                      + (0.0 - obs["y"]) ** 2) - obs["r"] * 1.05
        d1 = sym.sqrt((node1_x - obs["x"]) ** 2
                      + (node1_y - obs["y"]) ** 2) - obs["r"] * 1.05
        d2 = sym.sqrt((node2_x - obs["x"]) ** 2
                      + (node2_y - obs["y"]) ** 2) - obs["r"] * 1.05
        dists.extend([d0, d1, d2])
    model.set_expression("obstacle_distance", sym.vertcat(*dists))

    model.setup()
    return model
