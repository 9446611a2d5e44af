"""Fed-batch bioreactor model (mirrors reference
examples/batch_reactor/template_model.py): biomass X_s, substrate S_s,
product P_s, volume V_s; substrate inflow as input; uncertain yield Y_x
and inlet concentration S_in."""
import sys
import os

sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", ".."))

import dompc_tpu as dm


def template_model():
    model = dm.model.Model("continuous")

    mu_m = 0.02
    K_m = 0.05
    K_i = 5.0
    v_par = 0.004
    Y_p = 1.2

    X_s = model.set_variable("_x", "X_s")
    S_s = model.set_variable("_x", "S_s")
    P_s = model.set_variable("_x", "P_s")
    V_s = model.set_variable("_x", "V_s")
    inp = model.set_variable("_u", "inp")
    Y_x = model.set_variable("_p", "Y_x")
    S_in = model.set_variable("_p", "S_in")

    mu_S = mu_m * S_s / (K_m + S_s + (S_s ** 2 / K_i))

    model.set_rhs("X_s", mu_S * X_s - inp / V_s * X_s)
    model.set_rhs("S_s", -mu_S * X_s / Y_x - v_par * X_s / Y_p
                  + inp / V_s * (S_in - S_s))
    model.set_rhs("P_s", v_par * X_s - inp / V_s * P_s)
    model.set_rhs("V_s", inp)

    model.setup()
    return model
